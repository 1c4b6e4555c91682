#!/usr/bin/env python3
"""Sizing-optimization demo: minimum-mass member areas from load paths.

The reference's flagship inverse recovers material from measured
displacements (SURVEY §3.2); this is the DESIGN-side mirror on the same
machinery.  Three panels on the classic 10-bar cantilever
(solvers/sizing.py):

1. Stress-constrained minimum mass — the FSD fixpoint (exact for the
   force paths a determinate analysis would give) vs the
   augmented-Lagrangian gradient method (reverse-mode AD through the
   dense masked static solve: one backward pass = the adjoint for all
   ten members).  They tie to a fraction of a percent, with the
   textbook result: loaded diagonals at A = sqrt(2)/2, the zero-force
   verticals on the gauge.
2. A displacement-constrained design (tip deflection limit) — the case
   FSD structurally cannot handle.
3. Minimum compliance at fixed volume: the optimality criterion
   (equal strain-energy density per unit volume) emerges from descent.

Run: python examples/sizing_optimization.py  (saves
sizing_optimization.png; ~20 s on CPU).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import os

import numpy as np

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.sizing import (_host_area_solve,
                                         fully_stressed_design,
                                         optimize_sizing)

N_ITERS = int(os.environ.get("SIZING_ITERS", 300))
STRESS_LIMIT = 2.0
MIN_AREA = 1e-3


def ten_bar():
    """The classic 10-bar cantilever (two 1x1 cells, tip + mid loads)."""
    nodes = np.array([[0.0, 1.0], [1.0, 1.0], [2.0, 1.0],
                      [0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    elements = np.array([[0, 1], [1, 2], [3, 4], [4, 5],
                         [1, 4], [2, 5], [0, 4], [1, 3], [1, 5], [2, 4]])
    loads = np.zeros(12)
    loads[9] = loads[11] = -1.0
    return TrussProblem(nodes, elements, Material(1.0, 2.0, 1.0),
                        loads, np.array([0, 1, 6, 7]), 2)


def main():
    p = ten_bar()

    # --- 1. stress-constrained minimum mass: FSD vs the adjoint ---
    fsd = fully_stressed_design(p, STRESS_LIMIT, min_area=MIN_AREA)
    opt = optimize_sizing(p, objective="mass", stress_limit=STRESS_LIMIT,
                          min_area=MIN_AREA, n_iter=N_ITERS,
                          outer_rounds=4, learning_rate=0.08)
    print(f"FSD fixpoint:    mass {fsd.mass:.4f}  "
          f"(converged in {fsd.n_iter} iterations)")
    print(f"AL gradient:     mass {opt.mass:.4f}  "
          f"(= FSD x {opt.mass / fsd.mass:.4f}, "
          f"max |sigma|/limit = {opt.max_stress_ratio:.4f})")
    print(f"mass saving:     {100 * (1 - opt.mass / opt.mass_initial):.1f}%"
          f"  (start {opt.mass_initial:.3f})")
    print(f"areas:           {np.array2string(opt.areas, precision=3)}")

    # --- 2. displacement-constrained (FSD cannot do this) ---
    u0, _ = _host_area_solve(p, np.full(10, 2.0))
    tip = 11                                  # tip vertical DOF
    d_lim = 2.0 * abs(u0[tip])
    opt_d = optimize_sizing(p, objective="mass",
                            displacement_limit=d_lim,
                            probe_dofs=np.array([tip]),
                            min_area=MIN_AREA, n_iter=N_ITERS,
                            outer_rounds=4, learning_rate=0.08)
    print(f"\ndisplacement-limited: mass {opt_d.mass:.4f}, "
          f"|u_tip|/limit = {opt_d.max_displacement_ratio:.4f} "
          f"(active constraint pins the design)")

    # --- 3. minimum compliance at fixed volume ---
    lengths = np.linalg.norm(
        p.nodes[p.elements[:, 1]] - p.nodes[p.elements[:, 0]], axis=1)
    vol = float(np.sum(2.0 * lengths)) / 2.0          # half the start
    opt_c = optimize_sizing(p, objective="compliance", volume=vol,
                            min_area=MIN_AREA, n_iter=N_ITERS,
                            outer_rounds=1, learning_rate=0.05)
    dens = opt_c.stress ** 2                           # sigma^2/2E, E=1
    # KKT: equal density holds for members OFF the vanishing bound;
    # bound members sit at LOWER density (they'd shed volume if free).
    active = opt_c.areas > 0.05 * opt_c.areas.max()
    spread = (dens[active].max() - dens[active].min()) / dens[active].max()
    print(f"\ncompliance @ volume {vol:.3f}: f.u = "
          f"{float(np.dot(p.loads, opt_c.displacements)):.4f}; "
          f"energy-density spread over active members {100 * spread:.1f}% "
          f"(optimality criterion: equal)")

    # --- plot ---
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(15, 4))
    idx = np.arange(10)
    w = 0.38
    ax1.bar(idx - w / 2, fsd.areas, w, label="FSD (exact paths)")
    ax1.bar(idx + w / 2, opt.areas, w, label="AL gradient")
    ax1.set_xlabel("member"), ax1.set_ylabel("area")
    ax1.set_title("stress-constrained optimum"), ax1.legend()
    ax2.semilogy(opt.history)
    ax2.set_xlabel("ADAM iteration"), ax2.set_ylabel("AL loss")
    ax2.set_title("augmented-Lagrangian descent")
    for (i, j), a in zip(p.elements, opt_c.areas):
        ax3.plot([p.nodes[i, 0], p.nodes[j, 0]],
                 [p.nodes[i, 1], p.nodes[j, 1]],
                 lw=1 + 6 * a / opt_c.areas.max(), color="tab:blue")
    ax3.set_title("compliance design (line width = area)")
    ax3.set_aspect("equal")
    fig.tight_layout()
    fig.savefig("sizing_optimization.png", dpi=110)
    print("\nsaved sizing_optimization.png")


if __name__ == "__main__":
    main()
