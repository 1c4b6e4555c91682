"""Newton-Raphson solver tests against analytic solutions and the
reference's convergence semantics."""

import numpy as np
import pytest

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve, solve_nr, to_field


def chain_problem(n_nodes=4, young=1.0, area=1.0, load=1.0):
    nodes = np.stack([np.arange(n_nodes, dtype=float), np.zeros(n_nodes)], axis=1)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], axis=1)
    loads = np.zeros(2 * n_nodes)
    loads[2 * (n_nodes - 1)] = load
    fixed = [0, 1] + [2 * i + 1 for i in range(1, n_nodes)]
    mat = Material(young=to_field(young), area=to_field(area), density=to_field(1.0))
    return TrussProblem(nodes, elements, mat, loads, np.array(fixed), dimension=2)


def test_example1_analytic_solution():
    """The benchmark mesh: u_x = [0, 1, 2, 3] under unit load
    (examples/json/README.md:19-22)."""
    p = chain_problem()
    result = solve(p, SolverConfig(method="nr"), verbose=False)
    assert result.converged
    ux = result.displacements[:, 0]
    np.testing.assert_allclose(ux, [0, 1, 2, 3], atol=2e-5)
    np.testing.assert_allclose(result.displacements[:, 1], 0.0, atol=1e-6)
    # Reaction at the fixed end balances the load.
    assert np.isclose(result.reactions[0, 0], -1.0, atol=1e-5)


def test_nr_history_contract():
    p = chain_problem()
    result = solve_nr(p, SolverConfig(), target_load_factor=0.5)
    assert len(result.history) == 1
    entry = result.history[0]
    assert set(entry) == {"load_factor", "iterations", "residual", "max_strain",
                          "converged"}
    assert entry["load_factor"] == 0.5
    assert entry["converged"] == 1.0


def test_nr_scales_linearly_with_load_factor():
    p = chain_problem(young=2.0, area=0.5)
    r1 = solve_nr(p, SolverConfig(), target_load_factor=0.3)
    r2 = solve_nr(p, SolverConfig(), target_load_factor=0.6)
    np.testing.assert_allclose(
        2 * r1.displacements, r2.displacements, rtol=1e-4, atol=1e-6
    )


def test_nr_warm_start_converges_faster():
    p = chain_problem()
    cold = solve_nr(p, SolverConfig(), target_load_factor=1.0)
    warm = solve_nr(
        p, SolverConfig(), target_load_factor=1.0,
        u_initial=cold.displacements.flatten(),
    )
    assert warm.converged
    np.testing.assert_allclose(warm.displacements, cold.displacements, atol=1e-5)
    assert warm.history[0]["iterations"] <= cold.history[0]["iterations"]


def test_nr_rejects_nn_materials():
    import jax

    from pinn_fem_tpu import make_mlp_field

    p = chain_problem()
    p.material = Material(
        young=make_mlp_field(jax.random.PRNGKey(0), input_dim=3, scale=1.0),
        area=to_field(1.0),
        density=to_field(1.0),
    )
    with pytest.raises(ValueError, match="NN materials"):
        solve_nr(p, SolverConfig())


def test_nr_detects_singular_system():
    """A free-floating chain (no BCs) has a singular stiffness."""
    p = chain_problem()
    p.fixed_dofs = np.array([1, 3, 5, 7])  # only y fixed: x translation free
    with pytest.raises(RuntimeError, match="singular"):
        solve_nr(p, SolverConfig(max_iterations=3))


def test_1d_bar_both_ends_fixed():
    """1D 4-node bar, both ends fixed, point load at node 2: reactions split
    by stiffness ratio (reference examples/truss1d_simple.py)."""
    mat = Material(young=210e9, area=0.01, density=0.0)
    length = 3.0
    nodes = np.linspace(0.0, length, 4)
    p = TrussProblem(
        nodes=nodes,
        elements=np.array([[0, 1], [1, 2], [2, 3]]),
        material=mat,
        loads=np.array([0.0, 0.0, 1000.0, 0.0]),
        fixed_dofs=np.array([0, 3]),
        dimension=1,
    )
    result = solve(p, SolverConfig(method="nr"), verbose=False)
    assert result.converged
    # Analytic: load at x=2 of a clamped-clamped bar; R_left = -F*(L-a)/L,
    # R_right = -F*a/L with a=2, L=3.
    np.testing.assert_allclose(result.reactions[0, 0], -1000.0 / 3, rtol=1e-3)
    np.testing.assert_allclose(result.reactions[3, 0], -2000.0 / 3, rtol=1e-3)
    total = result.reactions.sum() + 1000.0
    assert abs(total) < 1.0
