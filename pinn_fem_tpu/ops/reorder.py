"""Bandwidth-reducing node reordering (reverse Cuthill-McKee).

The banded DIA fast path (ops/dia.py; Pallas stencil matvec at ~1.2 TB/s)
requires the stiffness to be BANDED under the given node numbering;
arbitrarily-numbered meshes otherwise fall back to the gather operator,
which runs near scalar rate on TPU (~90x slower at 1M elements).  RCM is
the classic fix: BFS from a minimum-degree seed with neighbors visited in
ascending-degree order, reversed — O(E) host preprocessing that buys the
banded device path.

The native C++ implementation (native/mesh_preprocess.cpp: rcm_order,
single allocation, insertion-sorted adjacency) is used when built; the
numpy/Python fallback below is always available and bit-identical
(tests/test_reorder.py asserts so).

No counterpart exists in the reference (its meshes are 4 nodes); this is
framework infrastructure for production meshes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..models.problem import TrussProblem


def rcm_permutation_numpy(elements: np.ndarray, nnode: int) -> np.ndarray:
    """order[new] = old node id, reverse Cuthill-McKee."""
    elements = np.asarray(elements, dtype=np.int64)
    degree = np.zeros(nnode, dtype=np.int64)
    np.add.at(degree, elements[:, 0], 1)
    np.add.at(degree, elements[:, 1], 1)
    offset = np.zeros(nnode + 1, dtype=np.int64)
    np.cumsum(degree, out=offset[1:])
    adj = np.empty(offset[-1], dtype=np.int64)
    cursor = offset[:-1].copy()
    for a, b in elements:
        adj[cursor[a]] = b
        cursor[a] += 1
        adj[cursor[b]] = a
        cursor[b] += 1
    # Sort each adjacency list by (degree, id) — matches the native pass.
    for n in range(nnode):
        seg = adj[offset[n]:offset[n + 1]]
        seg_sorted = seg[np.lexsort((seg, degree[seg]))]
        adj[offset[n]:offset[n + 1]] = seg_sorted

    visited = np.zeros(nnode, dtype=bool)
    order = np.empty(nnode, dtype=np.int32)
    tail = 0
    while tail < nnode:
        unvisited = np.flatnonzero(~visited)
        seed = unvisited[np.argmin(degree[unvisited])]
        visited[seed] = True
        order[tail] = seed
        head = tail
        tail += 1
        while head < tail:
            n = order[head]
            head += 1
            for m in adj[offset[n]:offset[n + 1]]:
                if not visited[m]:
                    visited[m] = True
                    order[tail] = m
                    tail += 1
    return order[::-1].copy()


def rcm_permutation(elements: np.ndarray, nnode: int) -> np.ndarray:
    """order[new] = old node id; native C++ when available, numpy fallback."""
    from ..utils.native import rcm_order_native

    order = rcm_order_native(elements, nnode)
    if order is not None:
        return order
    return rcm_permutation_numpy(elements, nnode)


def reorder_problem(
    problem: TrussProblem, order: Optional[np.ndarray] = None
) -> Tuple[TrussProblem, np.ndarray]:
    """RCM-renumbered copy of a problem plus the node permutation used.

    Returns (reordered_problem, order) with order[new] = old.  Map DOF
    quantities between the numberings with dof_permutation(); solution
    fields come back via restore_field().
    """
    if order is None:
        order = rcm_permutation(np.asarray(problem.elements), problem.nnode)
    order = np.asarray(order, dtype=np.int64)
    new_of_old = np.empty_like(order)
    new_of_old[order] = np.arange(problem.nnode, dtype=np.int64)

    dim = problem.dimension
    nodes = np.asarray(problem.nodes).reshape(problem.nnode, -1)[order]
    if dim == 1:
        nodes = nodes.reshape(-1)
    elements = new_of_old[np.asarray(problem.elements, dtype=np.int64)]
    dof_perm = dof_permutation(order, dim)               # dof_new -> dof_old
    loads = np.asarray(problem.loads)[dof_perm]
    new_dof_of_old = np.empty_like(dof_perm)
    new_dof_of_old[dof_perm] = np.arange(dof_perm.size)
    fixed = np.sort(new_dof_of_old[np.asarray(problem.fixed_dofs, dtype=np.int64)])

    reordered = TrussProblem(
        nodes=nodes,
        elements=elements,
        material=problem.material,
        loads=loads,
        fixed_dofs=fixed,
        dimension=dim,
    )
    return reordered, order


def dof_permutation(order: np.ndarray, dimension: int) -> np.ndarray:
    """perm[dof_new] = dof_old for a node permutation order[new] = old."""
    order = np.asarray(order, dtype=np.int64)
    return (dimension * order[:, None]
            + np.arange(dimension)[None, :]).reshape(-1)


def restore_field(field_new: np.ndarray, order: np.ndarray,
                  dimension: int) -> np.ndarray:
    """Map a per-DOF field from the reordered numbering back to the
    original: field_old[dof_old] = field_new[dof_new]."""
    perm = dof_permutation(order, dimension)
    out = np.empty_like(np.asarray(field_new).reshape(-1))
    out[perm] = np.asarray(field_new).reshape(-1)
    return out
