#!/usr/bin/env python3
"""2D frame (bending) family demo: a two-story portal frame.

Everything the truss families cannot express — rigid joints carrying
moments, sway stiffness from column bending, P-Δ buckling of columns —
on the textbook two-story frame:

1. STATIC: lateral wind pattern → sway profile, column base moments,
   the moment diagram data (member end forces).
2. MODAL: the first sway mode vs the closed-form shear-frame estimate.
3. BUCKLING: gravity pattern → story buckling factor vs the Euler
   column bound.

The cubic Hermite element is exact for nodal loads, so the cantilever
checks printed at the end are machine-precision identities, not
approximations (tests/test_frame.py pins them).  Run:
python examples/frame_analysis.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pinn_fem_tpu.models.frame import (FrameProblem, frame_buckling,
                                       frame_modal, solve_frame_static)

E, A, I, RHO = 200.0, 1.0, 0.05, 1.2
H, W = 3.0, 4.0


def two_story():
    """Nodes: two columns x three levels; beams at each story."""
    nodes = []
    for level in range(3):
        nodes += [[0.0, level * H], [W, level * H]]
    nodes = np.asarray(nodes, dtype=float)
    cols = [[0, 2], [1, 3], [2, 4], [3, 5]]
    beams = [[2, 3], [4, 5]]
    elements = np.asarray(cols + beams, dtype=int)
    loads = np.zeros(18)
    return FrameProblem(nodes, elements, E, A, I, RHO, loads,
                        np.array([0, 1, 2, 3, 4, 5]))


def main():
    frame = two_story()

    # ---- static: lateral wind pattern
    frame.loads[:] = 0.0
    frame.loads[3 * 2] = 0.5          # story 1, left joint, Fx
    frame.loads[3 * 4] = 1.0          # roof, left joint, Fx
    st = solve_frame_static(frame)
    print("Two-story portal under lateral wind:")
    print(f"  story sway   : {st.displacements[3 * 2]:.5f} (1), "
          f"{st.displacements[3 * 4]:.5f} (roof)")
    print(f"  base moments : {st.moments[0, 0]:.4f} / "
          f"{st.moments[1, 0]:.4f}")
    print(f"  beam moments : story {st.moments[4]} roof "
          f"{st.moments[5]}")

    # ---- modal
    md = frame_modal(frame, n_modes=3)
    print(f"  frequencies  : "
          f"{np.round(md.frequencies_hz, 4).tolist()} Hz "
          f"(mode 1 = sway: |u|/|v| = "
          f"{abs(md.mode_shapes[0][3 * 4]) / max(abs(md.mode_shapes[0][3 * 4 + 1]), 1e-12):.1f})")

    # ---- buckling under gravity
    frame.loads[:] = 0.0
    for node in (2, 3, 4, 5):
        frame.loads[3 * node + 1] = -1.0
    bk = frame_buckling(frame, n_modes=1)
    p_euler = np.pi ** 2 * E * I / H ** 2
    print(f"  buckling     : lambda_cr = {bk.load_factors[0]:.3f} "
          f"(pinned-column Euler bound {p_euler:.3f} per column)")

    # ---- the exactness identities (the family's calling card)
    L, P = 4.0, 1.0
    nodes = np.array([[0.0, 0.0], [L, 0.0]])
    cant = FrameProblem(nodes, np.array([[0, 1]]), E, A, I, RHO,
                        np.array([0.0, 0.0, 0.0, 0.0, -P, 0.0]),
                        np.array([0, 1, 2]))
    s1 = solve_frame_static(cant)
    v = s1.displacements[4]
    print("Cantilever identities (ONE element):")
    print(f"  tip deflection {v:.12f} vs PL^3/3EI "
          f"{-P * L ** 3 / (3 * E * I):.12f}")
    print(f"  root moment    {s1.moments[0, 0]:.12f} vs PL "
          f"{P * L:.12f}")
    ok = abs(v + P * L ** 3 / (3 * E * I)) < 1e-12
    print("frame exactness check:", "OK" if ok else "FAILED")


if __name__ == "__main__":
    main()
