"""RCM bandwidth-reducing reordering (ops/reorder.py + native rcm_order):
native/numpy agreement, permutation round-trips, and the capability it
exists for — a shuffled mesh that the banded DIA path rejects becomes
banded after RCM and solves to the same answer."""

import numpy as np
import pytest

from pinn_fem_tpu import Material, SolverConfig, TrussProblem
from pinn_fem_tpu.ops.reorder import (
    dof_permutation,
    rcm_permutation,
    rcm_permutation_numpy,
    reorder_problem,
    restore_field,
)


def shuffled_grid(rows, cols, seed=0):
    """Cross-braced grid with RANDOMLY RENUMBERED nodes (bandwidth ~ n)."""
    rng = np.random.default_rng(seed)
    nnode = rows * cols
    shuffle = rng.permutation(nnode)
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    nodes = np.zeros((nnode, 2))
    nodes[shuffle] = np.stack([xs.ravel(), ys.ravel()], axis=1)
    nid = lambda r, c: shuffle[r * cols + c]
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


def test_native_matches_numpy_rcm():
    from pinn_fem_tpu.utils import native

    p = shuffled_grid(8, 12)
    ref = rcm_permutation_numpy(np.asarray(p.elements), p.nnode)
    if not native.available():
        native.build()
    if native.available():
        got = native.rcm_order_native(np.asarray(p.elements), p.nnode)
        np.testing.assert_array_equal(got, ref)
    else:
        pytest.skip("native library unavailable (no g++)")


def test_rcm_reduces_bandwidth_and_enables_dia():
    from pinn_fem_tpu.ops.dia import dia_layout

    p = shuffled_grid(10, 16)

    def bandwidth(problem):
        e = np.asarray(problem.elements)
        d = problem.dimension
        # max |dof_i - dof_j| = d * max node offset + (d - 1)
        return int(np.max(np.abs(e[:, 0] - e[:, 1]))) * d + d - 1

    bw_before = bandwidth(p)
    p2, order = reorder_problem(p)
    bw_after = bandwidth(p2)
    assert bw_after * 3 < bw_before, (bw_before, bw_after)
    # The reordered mesh qualifies for the banded layout.  RCM numberings
    # are banded but not grid-regular, so they carry more DISTINCT offsets
    # than a natural grid ordering (~79 here vs ~13) — still dramatically
    # cheaper than the gather fallback; raise the layout's diagonal budget.
    layout = dia_layout(np.asarray(p2.to_device().dof_map), p2.ndof,
                        max_diags=128)
    assert layout.bandwidth == bw_after
    with pytest.raises(ValueError):
        dia_layout(np.asarray(p.to_device().dof_map), p.ndof)  # pre-RCM: no


def test_reordered_solve_matches_original():
    from pinn_fem_tpu.solvers.newton import solve_nr

    p = shuffled_grid(6, 9)
    ref = solve_nr(p, SolverConfig(tolerance=1e-8), 1.0,
                   linear_solver="dense")

    p_shuf = shuffled_grid(6, 9)
    p2, order = reorder_problem(p_shuf)
    r2 = solve_nr(p2, SolverConfig(tolerance=1e-8), 1.0,
                  linear_solver="dense")
    u_back = restore_field(r2.displacements.reshape(-1), order, 2)
    np.testing.assert_allclose(
        u_back, ref.displacements.reshape(-1), atol=1e-5
    )
    # Reactions map back the same way.
    reac_back = restore_field(r2.reactions.reshape(-1), order, 2)
    np.testing.assert_allclose(reac_back, ref.reactions.reshape(-1), atol=1e-4)


def test_dof_permutation_roundtrip():
    rng = np.random.default_rng(3)
    order = rng.permutation(10)
    perm = dof_permutation(order, 2)
    assert sorted(perm.tolist()) == list(range(20))
    field_old = rng.normal(size=20)
    field_new = field_old[perm]
    np.testing.assert_array_equal(restore_field(field_new, order, 2), field_old)


def test_rcm_handles_disconnected_components():
    # Two separate chains; every node must appear exactly once.
    elements = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    order = rcm_permutation(elements, 6)
    assert sorted(order.tolist()) == list(range(6))
