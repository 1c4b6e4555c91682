"""Matrix-free PCG: agreement with the dense path and large-mesh solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve_nr
from pinn_fem_tpu.ops.assembly import assemble_system
from pinn_fem_tpu.ops.cg import (
    apply_stiffness,
    cg_solve,
    stiffness_coefficients,
    stiffness_diagonal,
)


def chain(n_nodes, young=1.0, area=1.0, tip_load=1.0):
    nodes = np.stack(
        [np.arange(n_nodes, dtype=float), np.zeros(n_nodes)], axis=1
    )
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], axis=1)
    loads = np.zeros(2 * n_nodes)
    loads[2 * (n_nodes - 1)] = tip_load
    fixed = [0, 1] + [2 * i + 1 for i in range(1, n_nodes)]
    mat = Material(young=young, area=area, density=1.0)
    return TrussProblem(nodes, elements, mat, loads, np.array(fixed), 2)


def test_apply_stiffness_matches_dense():
    p = chain(12, young=3.0, area=0.5)
    data = p.to_device()
    s = stiffness_coefficients(data, p.material)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=p.ndof), jnp.float32)
    k, _, _ = assemble_system(data, p.material, u)
    np.testing.assert_allclose(
        np.asarray(apply_stiffness(data, s, u)), np.asarray(k @ u), atol=1e-4
    )


def test_diagonal_matches_dense():
    p = chain(9, young=2.0)
    data = p.to_device()
    s = stiffness_coefficients(data, p.material)
    k, _, _ = assemble_system(data, p.material, jnp.zeros(p.ndof))
    np.testing.assert_allclose(
        np.asarray(stiffness_diagonal(data, s)), np.diag(np.asarray(k)),
        atol=1e-5,
    )


def test_cg_matches_dense_solve():
    p = chain(40)
    data = p.to_device()
    s = stiffness_coefficients(data, p.material)
    x, it, rel = cg_solve(data, s, data.loads, tol=1e-8)
    # Analytic: u_x,i = i for the unit chain under unit tip load.
    ux = np.asarray(x)[0::2]
    np.testing.assert_allclose(ux, np.arange(40), rtol=1e-4, atol=1e-4)
    assert float(rel) < 1e-6


def test_nr_cg_equals_nr_dense():
    p1 = chain(50)
    r_dense = solve_nr(p1, SolverConfig(), 1.0, linear_solver="dense")
    p2 = chain(50)
    r_cg = solve_nr(p2, SolverConfig(), 1.0, linear_solver="cg")
    assert r_cg.converged
    np.testing.assert_allclose(
        r_cg.displacements, r_dense.displacements, rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("n_nodes", [5001])
def test_large_mesh_cg_solve(n_nodes):
    """10k-DOF chain, matrix-free: dense K would be 400 MB; PCG needs O(ndof).

    A 5000-element chain has cond ~ n^2 ~ 2.5e7, so the float32-achievable
    force residual sits near 1e-3 relative; tolerance 1e-4 lets the solver
    accept the float32 floor (stall detection) while the solution is still
    checked against the analytic profile."""
    p = chain(n_nodes, tip_load=1.0)
    result = solve_nr(p, SolverConfig(max_iterations=20, tolerance=1e-3), 1.0,
                      linear_solver="cg")
    assert result.converged
    ux = result.displacements[:, 0]
    # Spot-check the analytic linear profile u_x,i = i.
    for idx in (1, n_nodes // 2, n_nodes - 1):
        assert ux[idx] == pytest.approx(idx, rel=5e-3)
