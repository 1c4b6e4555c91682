#!/usr/bin/env python3
"""Snap-through of the von Mises two-bar truss by arc-length continuation.

Load control dies at the limit point (singular tangent — asserted in
tests/test_riks.py); the Riks solver traces the COMPLETE equilibrium
path through both folds to the inverted state, and every computed point
sits on the exact Green-Lagrange curve lambda(w) = 2 E A g(w) / L0^3,
g(w) = h^2 w - 1.5 h w^2 + 0.5 w^3.

Run: python examples/snap_through.py  (saves snap_through.png; ~15 s).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from pinn_fem_tpu import Material, TrussProblem, solve_riks

A_HALF, H = 1.0, 1.0


def main():
    nodes = np.array([[-A_HALF, 0.0], [A_HALF, 0.0], [0.0, H]])
    p = TrussProblem(
        nodes=nodes, elements=np.array([[0, 2], [1, 2]]),
        material=Material(young=1.0, area=1.0, density=1.0),
        loads=np.array([0, 0, 0, 0, 0, -1.0]),
        fixed_dofs=np.array([0, 1, 2, 3, 4]), dimension=2)

    res = solve_riks(p, n_steps=400, initial_dlambda=0.01,
                     stop_fn=lambda u, lam: -u[5] > 2.4 * H)
    w = -res.displacements[:, 5]
    lam = res.load_factors
    l0_3 = (A_HALF**2 + H**2) ** 1.5
    w_fine = np.linspace(0, w.max(), 400)
    lam_exact = 2.0 * (H * H * w_fine - 1.5 * H * w_fine**2
                       + 0.5 * w_fine**3) / l0_3
    lam_crit = lam[w < H].max()
    print(f"path points: {len(w)}; limit load {lam_crit:.5f} "
          f"(exact {2.0 * (H**2 * H * (1 - 1 / np.sqrt(3)) - 1.5 * H * (H * (1 - 1 / np.sqrt(3)))**2 + 0.5 * (H * (1 - 1 / np.sqrt(3)))**3) / l0_3:.5f})")
    print(f"max |path - analytic|: "
          f"{np.abs(lam - np.interp(w, w_fine, lam_exact)).max():.2e}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.2))
    ax1.plot(w_fine, lam_exact, "k-", lw=1, label="analytic λ(w)")
    ax1.plot(w, lam, "C1o", ms=3.5, label="Riks path")
    ax1.axhline(0, color="0.8", lw=0.8)
    ax1.set_xlabel("apex displacement w")
    ax1.set_ylabel("load factor λ")
    ax1.set_title("Snap-through traced through both folds")
    ax1.legend()

    # Deformed shapes at a few path points.
    for i, c in zip(np.linspace(0, len(w) - 1, 6).astype(int),
                    plt.cm.viridis(np.linspace(0, 1, 6))):
        xy = p.nodes + res.displacements[i].reshape(-1, 2)
        for a, b in p.elements:
            ax2.plot(xy[[a, b], 0], xy[[a, b], 1], "-", color=c, lw=1.5)
    ax2.plot(p.nodes[:, 0], p.nodes[:, 1], "k^", ms=6)
    ax2.set_title("Configurations along the path")
    ax2.set_aspect("equal")
    fig.tight_layout()
    out = Path.cwd() / "snap_through.png"
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
