"""3D J2 elastoplasticity (ops/solid_plastic.py +
solvers/solid_plasticity.py) vs closed forms.

Anchors: the uniaxial bar against the EXACT bilinear law (3D J2 with
free lateral contraction reproduces sigma = sigma_y + H_iso eps_p and
tangent E H/(E + H) identically — the plane-stress anchor without any
condensation), elastic sub-yield == linear solver, host == device
tier, residual plastic state after unloading, and the extruded
thick-wall cylinder limit pressure p_lim = (2/sqrt 3) sigma_y ln(b/a)
with B-bar (fully-integrated hex8 locks and overshoots it).
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.solid import (SolidProblem, boundary_quads,
                                       box_mesh, extrude_mesh,
                                       solve_solid_static,
                                       surface_load)
from pinn_fem_tpu.solvers.solid_plasticity import solve_solid_plastic

E, NU, RHO = 200.0, 0.3, 2.0


def _bar(sigma=1.0, nz=4):
    """Uniaxial box with symmetry supports: homogeneous stress state,
    so the gp-level law IS the element response."""
    nodes, elems = box_mesh(1.0, 1.0, 2.0, 1, 1, nz)
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


def test_uniaxial_bilinear_exact():
    """sigma = sigma_y + H eps_p, tip u = L (sigma/E + eps_p): the 3D
    J2 model with free lateral contraction reproduces the 1D bilinear
    law EXACTLY (Simo & Hughes) — machine precision at every step."""
    sy, h = 1.0, 0.1 * E
    p = _bar(sigma=1.5)
    lfs = np.linspace(0.1, 1.0, 10)          # sigma = 1.5 lf
    res = solve_solid_plastic(p, sy, hardening_iso=h,
                              load_factors=lfs, tol=1e-11)
    assert res.converged
    top = np.flatnonzero(np.abs(p.nodes[:, 2] - 2.0) < 1e-12)
    uz = res.displacements[:, 3 * top + 2].mean(axis=1)
    sig = 1.5 * lfs
    eps_p = np.maximum(sig - sy, 0.0) / h
    u_exact = 2.0 * (sig / E + eps_p)
    np.testing.assert_allclose(uz, u_exact, rtol=1e-8)
    # gp stresses: pure sigma_zz, von Mises == |sigma|.
    np.testing.assert_allclose(res.von_mises[-1], sig[-1], rtol=1e-8)
    np.testing.assert_allclose(res.stresses[-1][:, 2], sig[-1],
                               rtol=1e-8)
    np.testing.assert_allclose(res.stresses[-1][:, [0, 1, 3, 4, 5]],
                               0.0, atol=1e-9)
    # Elastic steps report zero plastic activity; plastic steps all.
    assert res.n_plastic[sig <= sy].max(initial=0) == 0
    assert np.all(res.n_plastic[sig > sy + 1e-9] == p.nelm)


def test_subyield_matches_linear_solver():
    p = _bar(sigma=0.5)
    res = solve_solid_plastic(p, sigma_y=10.0, n_steps=3,
                              target_load_factor=1.0, tol=1e-12)
    lin = solve_solid_static(p)
    np.testing.assert_allclose(res.displacements[-1],
                               lin.displacements, atol=1e-10)
    assert res.n_plastic.max() == 0
    assert res.eq_plastic.max() == 0.0


def test_unloading_leaves_residual_state():
    """Load past yield then back to zero: permanent set remains, the
    final stress state self-equilibrates (residual ~ 0 against a zero
    load), alpha persists."""
    sy, h = 1.0, 0.1 * E
    p = _bar(sigma=1.5)
    lfs = np.concatenate([np.linspace(0.2, 1.0, 5),
                          np.linspace(0.8, 0.0, 5)])
    res = solve_solid_plastic(p, sy, hardening_iso=h,
                              load_factors=lfs, tol=1e-11)
    assert res.converged
    top = np.flatnonzero(np.abs(p.nodes[:, 2] - 2.0) < 1e-12)
    uz_final = res.displacements[-1, 3 * top + 2].mean()
    eps_p = (1.5 - sy) / h
    np.testing.assert_allclose(uz_final, 2.0 * eps_p, rtol=1e-7)
    assert res.eq_plastic[-1].min() > 0
    np.testing.assert_allclose(res.von_mises[-1], 0.0, atol=1e-8)


def test_host_matches_device_tier():
    """host=False forces the jitted scan driver — same physics to f32
    drift (the plane family's mirror bound)."""
    sy, h = 1.0, 0.1 * E
    p = _bar(sigma=1.4, nz=2)
    lfs = np.linspace(0.25, 1.0, 4)
    rh = solve_solid_plastic(p, sy, hardening_iso=h,
                             load_factors=lfs, tol=1e-11)
    rd = solve_solid_plastic(p, sy, hardening_iso=h,
                             load_factors=lfs, host=False)
    assert rd.converged
    scale = np.abs(rh.displacements[-1]).max()
    np.testing.assert_allclose(rd.displacements[-1] / scale,
                               rh.displacements[-1] / scale, atol=2e-4)
    np.testing.assert_allclose(rd.von_mises[-1], rh.von_mises[-1],
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(rd.eq_plastic[-1], rh.eq_plastic[-1],
                               rtol=5e-3, atol=1e-7)


def test_json_tier_plastic():
    """The document surface routes analysis.type == "plastic" to the
    solid J2 driver: the uniaxial-bar bilinear anchor reproduced
    through run_solid_document, with the plane family's result
    contract (final fields, n_plastic, yielded_elements)."""
    from pinn_fem_tpu.io.solid_io import run_solid_document

    sy, h = 1.0, 0.1 * E
    doc = {
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 2.0,
                 "nx": 1, "ny": 1, "nz": 2},
        "material": {"young": E, "poisson": NU, "density": RHO},
        "fixed_z_nodes": "z_min",
        "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0.0, 0.0, 1.5]}],
        "analysis": {"type": "plastic", "sigma_y": sy, "hardening": h,
                     "load_factors": [0.4, 0.8, 1.0],
                     "tolerance": 1e-11},
    }
    out = run_solid_document(doc)
    assert out["success"]
    assert out["analysis"] == "plastic"
    sig = 1.5 * np.asarray(out["load_factors"])
    # Exact bilinear check on the final step's stress.
    eps_p = (sig[-1] - sy) / h
    np.testing.assert_allclose(out["max_von_mises"][-1], sig[-1],
                               rtol=1e-8)
    u_final = np.asarray(out["final"]["displacements"])
    uz_max = np.abs(u_final).max()
    np.testing.assert_allclose(uz_max, 2.0 * (sig[-1] / E + eps_p),
                               rtol=1e-7)
    assert out["n_plastic"][0] == 0
    assert out["n_plastic"][-1] == 2
    assert len(out["yielded_elements"]) == 2


def test_json_tier_plastic_validation():
    from pinn_fem_tpu.io.solid_io import run_solid_document

    doc = {
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 1.0,
                 "nx": 1, "ny": 1, "nz": 1},
        "material": {"young": E, "poisson": NU, "density": RHO},
        "fixed_nodes": "z_min",
        "analysis": {"type": "plastic"},
    }
    with pytest.raises(ValueError, match="sigma_y"):
        run_solid_document(doc)


def test_extruded_cylinder_limit_load_bbar():
    """Extruded thick-wall von Mises cylinder (plane-strain BCs: all z
    DOFs fixed) under internal pressure: with B-bar the response
    survives to 0.99 p_lim with the plastic front spread but not
    collapsed, and bore displacement grows super-elastically; the
    textbook limit is p_lim = (2/sqrt 3) sigma_y ln(b/a).  Cross-
    validates the 3D kernel against the 2D B-bar family on the SAME
    physics (tests/test_plane_plastic.py's anchor)."""
    from pinn_fem_tpu.models.plane import annulus_mesh, pressure_load

    sy = 1.0
    a, b = 1.0, 2.0
    p_lim = (2.0 / np.sqrt(3.0)) * sy * np.log(b / a)
    nodes2d, quads = annulus_mesh(a, b, 6, 8)
    n2d = nodes2d.shape[0]
    nodes, elems = extrude_mesh(nodes2d, quads, 0.25, nz=1)
    n = nodes.shape[0]
    # Plane strain: every z DOF fixed; quarter-symmetry rollers on the
    # x = 0 and y = 0 planes (annulus_mesh sweeps a quarter).
    fixed = [3 * np.arange(n) + 2]
    x0 = np.flatnonzero(np.abs(nodes[:, 0]) < 1e-9)
    y0 = np.flatnonzero(np.abs(nodes[:, 1]) < 1e-9)
    fixed += [3 * x0, 3 * y0 + 1]
    # Bore pressure: the 2D consistent edge load on both layers via
    # pressure_load, half weight per layer... simpler: build the bore
    # FACE quads (inner radius) and use surface_load per face normal.
    r2d = np.linalg.norm(nodes2d, axis=1)
    bore2d = np.flatnonzero(np.abs(r2d - a) < 1e-9)
    order = bore2d[np.argsort(np.arctan2(nodes2d[bore2d, 1],
                                         nodes2d[bore2d, 0]))]
    f2d = pressure_load(nodes2d, order, -0.25, 1.0, ndof=2 * n2d)
    # (material lies OUTWARD of the bore path; sign chosen so the net
    # force points radially outward, checked below)
    if (f2d[0::2] @ nodes2d[:, 0]) < 0:
        f2d = -f2d
    loads = np.zeros(3 * n)
    for layer in (0, 1):
        off = layer * n2d
        loads[3 * (np.arange(n2d) + off) + 0] += 0.5 * f2d[0::2]
        loads[3 * (np.arange(n2d) + off) + 1] += 0.5 * f2d[1::2]
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=0.3,
                     density=RHO, loads=loads,
                     fixed_dofs=np.unique(np.concatenate(fixed)))
    lfs = np.array([0.5, 0.9, 0.99]) * p_lim
    res = solve_solid_plastic(p, sy, load_factors=lfs, tol=1e-9,
                              max_iter=60)
    assert res.converged
    assert res.n_plastic[0] > 0 or res.n_plastic[1] > 0
    assert res.n_plastic[-1] < p.nelm        # front has not collapsed
    # Perfect plasticity: von Mises capped at sigma_y.
    assert res.von_mises[-1].max() <= sy * 1.001
    # Bore displacement super-elastic: above the elastic extrapolation.
    bore3d = np.flatnonzero(
        np.abs(np.linalg.norm(nodes[:, :2], axis=1) - a) < 1e-9)
    ur = np.linalg.norm(
        res.displacements[:, :][:, (3 * bore3d[:, None]
                                    + np.arange(2)).reshape(-1)]
        .reshape(lfs.size, -1, 2), axis=2).mean(axis=1)
    assert ur[-1] > ur[0] * (lfs[-1] / lfs[0]) * 1.05


def test_force_only_map_mirrors_full():
    """vm_return_map_6_force: identical stress and state as the
    full-tangent map (the plane family's force-only mirror pin)."""
    from pinn_fem_tpu.ops.plane_plastic import lame
    from pinn_fem_tpu.ops.solid_plastic import (vm_return_map_6,
                                                vm_return_map_6_force)

    rng = np.random.default_rng(4)
    m, gp = 5, 8
    eps6 = 0.02 * rng.standard_normal((m, gp, 6))
    ep = 0.005 * rng.standard_normal((m, gp, 6))
    al = np.abs(0.01 * rng.standard_normal((m, gp)))
    bk = 0.002 * rng.standard_normal((m, gp, 6))
    mu, lam, _ = lame(np.full(m, 200.0), np.full(m, 0.3))
    args = (mu[:, None], lam[:, None], np.full((m, 1), 1.0),
            np.full((m, 1), 20.0), np.full((m, 1), 5.0))
    s_f, ep_f, al_f, bk_f = vm_return_map_6_force(eps6, ep, al, bk,
                                                  *args)
    s, _, ep2, al2, bk2 = vm_return_map_6(eps6, ep, al, bk, *args)
    np.testing.assert_array_equal(s_f, s)
    np.testing.assert_array_equal(ep_f, ep2)
    np.testing.assert_array_equal(al_f, al2)
    np.testing.assert_array_equal(bk_f, bk2)
