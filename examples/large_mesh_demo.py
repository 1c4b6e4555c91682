#!/usr/bin/env python3
"""Large-mesh workflow demo: the pieces the reference (4 nodes, 8 DOFs)
never needed, sized here to finish in seconds on CPU — scale ROWS/COLS up
on TPU (benchmarks/scaling.py runs the 40k-DOF version).

1. Build a cross-braced grid strip and RANDOMLY renumber its nodes (the
   worst case for a banded solver: bandwidth ~ n).
2. Recover a banded numbering with reverse Cuthill-McKee
   (ops/reorder.py; native C++ when built, numpy otherwise).
3. Solve with matrix-free Newton over the banded DIA operator
   (solvers/newton.py linear_solver="cg-dia") and map the solution back
   to the original numbering.
4. Solve a whole batch of load cases at once with the dp-parallel
   vmap'd solver (parallel/batched.py).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from pinn_fem_tpu import Material, SolverConfig, TrussProblem
from pinn_fem_tpu.ops.reorder import reorder_problem, restore_field
from pinn_fem_tpu.parallel.batched import solve_nr_batched
from pinn_fem_tpu.solvers.newton import solve_nr

ROWS = int(os.environ.get("DEMO_ROWS", "12"))
COLS = int(os.environ.get("DEMO_COLS", "24"))


def braced_grid(rows, cols, shuffle_seed=None):
    nnode = rows * cols
    renum = (np.random.default_rng(shuffle_seed).permutation(nnode)
             if shuffle_seed is not None else np.arange(nnode))
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    nodes = np.zeros((nnode, 2))
    nodes[renum] = np.stack([xs.ravel(), ys.ravel()], axis=1)
    nid = lambda r, c: renum[r * cols + c]
    elements = []
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                elements.append([nid(r, c), nid(r, c + 1)])
            if r + 1 < rows:
                elements.append([nid(r, c), nid(r + 1, c)])
            if c + 1 < cols and r + 1 < rows:
                elements.append([nid(r, c), nid(r + 1, c + 1)])
                elements.append([nid(r, c + 1), nid(r + 1, c)])
    loads = np.zeros(2 * nnode)
    fixed = []
    for r in range(rows):
        fixed += [2 * nid(r, 0), 2 * nid(r, 0) + 1]
        loads[2 * nid(r, cols - 1)] = 1.0
    return TrussProblem(
        nodes=nodes, elements=np.array(elements),
        material=Material(young=1.0, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array(sorted(fixed)), dimension=2,
    )


def main():
    p = braced_grid(ROWS, COLS, shuffle_seed=0)
    e = np.asarray(p.elements)
    bw = int(np.max(np.abs(e[:, 0] - e[:, 1]))) * 2 + 1
    print(f"mesh: {p.nnode} nodes / {p.nelm} elements, "
          f"shuffled bandwidth {bw}")

    p_rcm, order = reorder_problem(p)
    e2 = np.asarray(p_rcm.elements)
    bw2 = int(np.max(np.abs(e2[:, 0] - e2[:, 1]))) * 2 + 1
    print(f"after RCM: bandwidth {bw2} "
          f"({bw / bw2:.0f}x narrower -> banded DIA path eligible)")

    t0 = time.time()
    result = solve_nr(p_rcm, SolverConfig(max_iterations=20, tolerance=1e-5),
                      1.0, linear_solver="cg-dia")
    u = restore_field(result.displacements.reshape(-1), order, 2)
    print(f"banded NR solve: converged={result.converged} "
          f"({time.time() - t0:.1f}s incl. compile), "
          f"tip ux = {u[np.argmax(np.asarray(p.loads))]:.3f}")

    # Batched load sweep (dp-parallel, one dispatch).
    scales = np.linspace(0.5, 2.0, 8)
    loads_b = scales[:, None] * np.asarray(p_rcm.loads)[None, :]
    t0 = time.time()
    out = solve_nr_batched(p_rcm, loads_b, SolverConfig(tolerance=1e-5))
    n_conv = int(np.sum(np.asarray(out["converged"])))
    print(f"batched sweep: {n_conv}/{len(scales)} load cases converged "
          f"in one dispatch ({time.time() - t0:.1f}s incl. compile)")


if __name__ == "__main__":
    main()
