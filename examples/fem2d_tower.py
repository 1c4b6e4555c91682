#!/usr/bin/env python3
"""Procedural 2D tower + span truss (the working equivalent of the
reference's stale fem2d_like.py, which crashes on a renamed history key —
fem2d_like.py:111 reads 'max_e_gl' but the solver emits 'max_strain').

Builds a 20-story tower of cross-braced panels with a horizontal span,
loads the tip, and solves with incremental Newton-Raphson.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import numpy as np

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.legacy import LegacySolverConfig, solve_incremental_newton


def build_tower(stories=20, width=1.0, story_height=1.0):
    nodes = []
    for s in range(stories + 1):
        nodes.append([0.0, s * story_height])
        nodes.append([width, s * story_height])
    nodes = np.array(nodes)

    elements = []
    for s in range(stories):
        a, b = 2 * s, 2 * s + 1        # bottom pair
        c, d = 2 * s + 2, 2 * s + 3    # top pair
        elements += [[a, c], [b, d],   # columns
                     [c, d],           # beam
                     [a, d], [b, c]]   # cross braces
    elements.append([0, 1])            # ground beam
    return nodes, np.array(elements)


def main():
    nodes, elements = build_tower()
    nnode = len(nodes)
    loads = np.zeros(2 * nnode)
    loads[2 * (nnode - 1)] = 1e4  # horizontal tip load on the top-right node

    problem = TrussProblem(
        nodes=nodes,
        elements=elements,
        material=Material(young=210e9, area=0.005, density=7850.0),
        loads=loads,
        fixed_dofs=np.array([0, 1, 2, 3]),  # both ground nodes pinned
        dimension=2,
    )

    result = solve_incremental_newton(
        problem, LegacySolverConfig(n_increments=10, max_iterations=50)
    )
    tip = result.displacements[-1]
    print(f"Tower: {nnode} nodes, {len(elements)} elements, "
          f"{problem.ndof} DOFs")
    print(f"Converged: {result.converged}")
    print(f"Tip displacement: ux={tip[0]:.6e} m, uy={tip[1]:.6e} m")
    for h in result.history:
        print(f"  inc {int(h['increment']):2d}  lf={h['load_factor']:.1f}  "
              f"iters={int(h['iterations'])}  max_strain={h['max_strain']:.3e}")
    assert result.converged


if __name__ == "__main__":
    main()
