#!/usr/bin/env python3
"""3D lattice pylon under a lateral tip load.

Demonstrates the 3D truss support (an extension beyond the reference,
which is 1D/2D only — its FEMModel validates dimension in {1, 2},
reference model.py:53-77): four legs on a square footprint, ring beams
and face cross-bracing per story, solved with incremental Newton-Raphson.
The same element kernel, assembly, solvers and JSON schema serve all
dimensions — ke = s g g^T with a length-6 g vector is the only change.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve


def build_pylon(stories=8, width=1.0, story_height=1.5):
    """4-leg square lattice tower: ring beams + X-braced faces."""
    nodes = []
    for s in range(stories + 1):
        z = s * story_height
        for cx, cy in ((0, 0), (width, 0), (width, width), (0, width)):
            nodes.append([cx, cy, z])
    nodes = np.array(nodes, dtype=float)

    def nid(story, corner):
        return 4 * story + corner

    elements = []
    for s in range(stories):
        lo = [nid(s, c) for c in range(4)]
        hi = [nid(s + 1, c) for c in range(4)]
        for c in range(4):
            elements.append([lo[c], hi[c]])                    # legs
            elements.append([hi[c], hi[(c + 1) % 4]])          # ring beam
            # X-bracing on each face
            elements.append([lo[c], hi[(c + 1) % 4]])
            elements.append([lo[(c + 1) % 4], hi[c]])
    return nodes, np.array(elements)


def main():
    nodes, elements = build_pylon()
    nnode = len(nodes)
    loads = np.zeros(3 * nnode)
    for c in range(4):  # lateral (+x) load shared by the four top nodes
        loads[3 * (nnode - 4 + c)] = 2.5e3
    fixed = np.arange(12)  # all DOFs of the four ground nodes

    problem = TrussProblem(
        nodes=nodes,
        elements=elements,
        material=Material(young=210e9, area=0.002, density=7850.0),
        loads=loads,
        fixed_dofs=fixed,
        dimension=3,
    )

    result = solve(problem, SolverConfig(method="nr", n_increments=5),
                   verbose=False)
    tip = result.displacements[-4:]
    print(f"Pylon: {nnode} nodes, {len(elements)} elements, "
          f"{problem.ndof} DOFs (3 per node)")
    print(f"converged: {result.converged}")
    print(f"tip sway (x) per top corner: {tip[:, 0]}")
    # Global equilibrium: reactions balance the applied load exactly.
    rx = result.reactions[:, 0].sum()
    print(f"sum of x reactions: {rx:.1f} (applied: {loads.sum():.1f})")
    assert abs(rx + loads.sum()) < 1e-2 * abs(loads.sum())
    return result


if __name__ == "__main__":
    main()
