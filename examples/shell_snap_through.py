#!/usr/bin/env python3
"""Geometrically nonlinear shallow shells: the snap-through gallery.

Two canonical cases on the Marguerre / von Kármán tier
(solvers/shell_nonlinear.py), both traced by Crisfield arc length:

1. The HALF-SINE ARCH strip under a half-sine load — sine modes make
   the membrane force spatially constant, so the continuum path is
   EXACTLY the single-mode cubic
       λ(a) = −(D k⁴ a + EA k⁴ (e a/2 + a²/4)(e + a))
   and every FE point is checked against it (both limit points, the
   unstable negative-λ branch and the inverted hardened branch).
2. The SABIR-LOCK / CRISFIELD hinged cylindrical panel (R = 2540,
   508×508 planform, t = 12.7, central point load) — THE published
   nonlinear-shell benchmark: limit load ≈ 2.22 kN at w_c ≈ 11; the
   t = 6.35 panel adds SNAP-BACK (the deflection itself reverses
   along the path — the case load- and displacement-control both
   fail on).

Run: python examples/shell_snap_through.py
(saves shell_snap_through.png; ~1 min on one CPU core).

Reference citation: the reference's only nonlinearity is a dead
Green-Lagrange truss kernel (/root/reference/FEM/python/fem/
element.py, SURVEY §2.1) — no continuum geometric nonlinearity exists
there at all.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pinn_fem_tpu import (ShellProblem, arch_strip_mesh,
                          solve_shell_riks)

E, T = 200e3, 0.1
L, W = 4.0, 1.0
D = E * T**3 / 12.0
K1 = np.pi / L
RISE = 0.15


def arch_case():
    nodes, elems = arch_strip_mesh(L, W, RISE, 32)
    n = len(nodes)
    xs = np.linspace(0.0, L, 33)
    fixed = []
    for nd in np.flatnonzero((nodes[:, 0] < 1e-9)
                             | (np.abs(nodes[:, 0] - L) < 1e-9)):
        fixed += [6 * nd + 0, 6 * nd + 1, 6 * nd + 2]
    for nd in range(n):
        fixed += [6 * nd + 3]
    h = L / 32
    loads = np.zeros(6 * n)
    for i, x in enumerate(xs):
        wt = h if 0 < i < 32 else h / 2.0
        for row in (0, 33):
            loads[6 * (i + row) + 2] = -np.sin(K1 * x) * wt * (W / 2)
    p = ShellProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=T, density=1.0,
                     loads=loads,
                     fixed_dofs=np.array(sorted(set(fixed))))
    r = solve_shell_riks(p, n_steps=60, dl0=0.02, tol=1e-9,
                         max_dl=0.08)
    a = r.displacements[:, 6 * 16 + 2]
    lam = r.load_factors

    def lam_exact(aa):
        return -(D * K1**4 * aa
                 + E * T * K1**4 * (RISE * aa / 2.0 + aa**2 / 4.0)
                 * (RISE + aa))

    sel = a > -2.2 * RISE
    err = np.abs(lam[sel] - lam_exact(a[sel]))
    lim = lam_exact(np.linspace(-RISE, 0.0, 200001)).max()
    print(f"[arch] traced {lam.size} arc points through both folds; "
          f"max |λ_FE − λ_cubic| = {err.max():.2e} "
          f"({err.max() / lim:.1e} of the limit load {lim:.4f})")
    return a, lam, lam_exact


def panel_case(t):
    r_cyl, th = 2540.0, 0.1
    nq = 8
    phis = np.linspace(0.0, th, nq + 1)
    ys = np.linspace(0.0, 254.0, nq + 1)
    nodes = np.array([[r_cyl * np.sin(ph), y, r_cyl * np.cos(ph)]
                      for y in ys for ph in phis])
    na = nq + 1
    elems = np.asarray([[j * na + i, j * na + i + 1,
                         j * na + i + 1 + na, j * na + i + na]
                        for j in range(nq) for i in range(nq)])
    fixed = []
    xmax = r_cyl * np.sin(th)
    for nd in range(len(nodes)):
        x, y = nodes[nd, 0], nodes[nd, 1]
        if abs(x - xmax) < 1e-6:
            fixed += [6 * nd + 0, 6 * nd + 1, 6 * nd + 2]
        if abs(x) < 1e-9:
            fixed += [6 * nd + 0, 6 * nd + 4, 6 * nd + 5]
        if abs(y - 254.0) < 1e-9:
            fixed += [6 * nd + 1, 6 * nd + 3, 6 * nd + 5]
    loads = np.zeros(6 * len(nodes))
    cen = np.flatnonzero((np.abs(nodes[:, 0]) < 1e-9)
                         & (np.abs(nodes[:, 1] - 254.0) < 1e-9))[0]
    loads[6 * cen + 2] = -1000.0 / 4.0
    p = ShellProblem(nodes=nodes, elements=elems, young=3102.75,
                     poisson=0.3, thickness=t, density=1.0,
                     loads=loads,
                     fixed_dofs=np.array(sorted(set(fixed))))
    kw = (dict(n_steps=150, dl0=0.3, max_dl=2.0) if t > 10.0
          else dict(n_steps=160, dl0=0.2, max_dl=1.0))
    r = solve_shell_riks(p, tol=1e-7, **kw)
    w = -r.displacements[:, 6 * cen + 2]
    lam = r.load_factors
    i = next(i for i in range(1, len(lam) - 1)
             if lam[i] > lam[i - 1] and lam[i] >= lam[i + 1])
    snapback = bool(np.any(np.diff(w) < -1e-6))
    print(f"[panel t={t}] limit P = {lam[i]:.4f} kN at w_c = "
          f"{w[i]:.2f} (published ≈ {'2.22' if t > 10 else '0.59'}); "
          f"snap-back: {snapback}")
    return w, lam


def main():
    a, lam, lam_exact = arch_case()
    w1, p1 = panel_case(12.7)
    w2, p2 = panel_case(6.35)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.2))
    aa = np.linspace(a.min(), 0.0, 600)
    ax1.plot(-aa, lam_exact(aa), "k-", lw=1,
             label="exact single-mode cubic")
    ax1.plot(-a, lam, "o", ms=3, label="Marguerre + arc length")
    ax1.set_xlabel("midspan deflection −a")
    ax1.set_ylabel("load amplitude λ")
    ax1.set_title("Half-sine arch: both folds on the exact cubic")
    ax1.legend()
    ax2.plot(w1, p1, "-o", ms=3, label="t = 12.7 (limit ≈ 2.22 kN)")
    ax2.plot(w2, p2, "-s", ms=3, label="t = 6.35 (snap-back)")
    ax2.set_xlabel("center deflection w_c")
    ax2.set_ylabel("P (kN)")
    ax2.set_title("Crisfield hinged cylindrical panel")
    ax2.legend()
    fig.tight_layout()
    fig.savefig("shell_snap_through.png", dpi=110)
    print("saved shell_snap_through.png")


if __name__ == "__main__":
    main()
