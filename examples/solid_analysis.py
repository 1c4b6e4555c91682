#!/usr/bin/env python3
"""3D solid (hex8) family demo: a loaded column and a bending bar.

The third continuum dimension — what no truss, frame, or plane family
can express (triaxial stress states, Poisson coupling in all three
directions, 3D mode shapes) — on two textbook configurations:

1. UNIAXIAL COLUMN: a box under top traction with symmetry supports.
   The stress state is homogeneous, so every printed number is an
   EXACT closed-form identity (u_z = sigma L / E, lateral contraction
   -nu sigma / E, von Mises = sigma) — machine precision, not an
   approximation (tests/test_solid.py pins them).
2. CANTILEVER BAR: end shear load; the tip deflection approaches the
   Timoshenko beam value under refinement (full-integration hex8
   shear-locks, so the convergence is printed, not assumed).
3. MODAL: the axially-constrained rod's frequencies against
   f_k = (2k-1)c/4L.

Above DENSE_DOF_LIMIT the statics switch to the banded DIA device
tier (solve_solid_static_banded) — the same call pattern, one jitted
program.  Run: python examples/solid_analysis.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pinn_fem_tpu.models.solid import (SolidProblem, boundary_quads,
                                       box_mesh, solid_modal,
                                       solve_solid_static,
                                       solve_solid_static_banded,
                                       surface_load)

E, NU, RHO = 200.0, 0.3, 2.0


def uniaxial_column(sigma=5.0, nx=2, ny=2, nz=8):
    nodes, elems = box_mesh(1.0, 1.0, 4.0, nx, ny, nz)
    n = nodes.shape[0]
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    x0 = np.flatnonzero(np.abs(nodes[:, 0]) < 1e-12)
    y0 = np.flatnonzero(np.abs(nodes[:, 1]) < 1e-12)
    fixed = np.concatenate([3 * bot + 2, 3 * x0, 3 * y0 + 1])
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=NU,
                     density=RHO, loads=np.zeros(3 * n),
                     fixed_dofs=fixed)
    loads = surface_load(nodes, boundary_quads(p, 2, +1),
                         [0.0, 0.0, sigma])
    return SolidProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, density=RHO, loads=loads,
                        fixed_dofs=fixed)


def main():
    print("=" * 64)
    print("1) Uniaxial hex8 column (2x2x8 box, sigma = 5, L = 4)")
    sigma = 5.0
    p = uniaxial_column(sigma)
    r = solve_solid_static(p)
    uz_exact = sigma / E * 4.0
    print(f"   max u_z      = {np.abs(r.displacements[2::3]).max():.9f}"
          f"   (exact {uz_exact:.9f})")
    print(f"   max |u_x|    = "
          f"{np.abs(r.displacements[0::3]).max():.9f}"
          f"   (exact {NU * sigma / E:.9f})")
    print(f"   von Mises    = [{r.von_mises.min():.9f}, "
          f"{r.von_mises.max():.9f}]   (exact {sigma:.1f})")
    print(f"   sum reactions = {r.reactions.sum():+.9f}"
          f"   (exact {-sigma:.1f})")

    print("=" * 64)
    print("2) End-loaded cantilever bar: hex8 vs Timoshenko")
    P, L, h = 1.0, 8.0, 1.0
    inertia = h ** 4 / 12.0
    g_mod = E / (2.0 * (1.0 + NU))
    w_timo = P * L ** 3 / (3.0 * E * inertia) \
        + P * L / ((5.0 / 6.0) * g_mod * h * h)
    for nxy in (2, 4):
        nodes, elems = box_mesh(h, h, L, nxy, nxy, 4 * nxy)
        n = nodes.shape[0]
        bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
        fixed = (3 * bot[:, None] + np.arange(3)).reshape(-1)
        p = SolidProblem(nodes=nodes, elements=elems, young=E,
                         poisson=NU, density=RHO,
                         loads=np.zeros(3 * n), fixed_dofs=fixed)
        loads = surface_load(nodes, boundary_quads(p, 2, +1),
                             [P / (h * h), 0.0, 0.0])
        p = SolidProblem(nodes=nodes, elements=elems, young=E,
                         poisson=NU, density=RHO, loads=loads,
                         fixed_dofs=fixed)
        res, iters, rel = solve_solid_static_banded(p, tol=1e-9)
        tip = np.flatnonzero(np.abs(nodes[:, 2] - L) < 1e-12)
        w_tip = float(np.mean(res.displacements[3 * tip]))
        print(f"   {nxy}x{nxy}x{4 * nxy} mesh ({p.ndof:5d} DOFs, "
              f"{iters:4d} PCG iters): tip = {w_tip:.4f}  "
              f"(Timoshenko {w_timo:.4f}, "
              f"err {abs(w_tip - w_timo) / w_timo:.1%})")

    print("=" * 64)
    print("3) Axial-rod modal: f_k = (2k-1)c/4L")
    nodes, elems = box_mesh(1.0, 1.0, 4.0, 1, 1, 16)
    n = nodes.shape[0]
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    fixed = np.unique(np.concatenate(
        [3 * bot + 2, 3 * np.arange(n), 3 * np.arange(n) + 1]))
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=0.0,
                     density=RHO, loads=np.zeros(3 * n),
                     fixed_dofs=fixed)
    res = solid_modal(p, n_modes=3)
    c = np.sqrt(E / RHO)
    for k, f in enumerate(res.frequencies_hz, start=1):
        exact = (2 * k - 1) * c / (4.0 * 4.0)
        print(f"   f_{k} = {f:.5f} Hz   (exact {exact:.5f}, "
              f"err {abs(f - exact) / exact:.2%})")
    print("=" * 64)


if __name__ == "__main__":
    main()
