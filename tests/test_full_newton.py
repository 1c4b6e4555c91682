"""Full Newton-Raphson (coupled u-theta Hessian) solver tests.

The reference's NN path never actually worked (it fell back to GD every
iteration — example9_output.txt:55-63), so there is no golden trajectory;
per SURVEY §7.3 we validate against finite-difference Hessians and
equilibrium fixed points instead.
"""

import jax
import numpy as np
import pytest

from pinn_fem_tpu import (
    Material,
    SolverConfig,
    TrussProblem,
    make_mlp_field,
    solve_full_nr,
    to_field,
)


def chain_problem(material):
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    return TrussProblem(
        nodes=nodes,
        elements=np.array([[0, 1], [1, 2], [2, 3]]),
        material=material,
        loads=np.array([0, 0, 0, 0, 0, 0, 1.0, 0]),
        fixed_dofs=np.array([0, 1, 3, 5, 7]),
        dimension=2,
    )


def test_full_nr_without_nn_delegates_to_nr():
    p = chain_problem(Material(young=1.0, area=1.0, density=1.0))
    r = solve_full_nr(p, SolverConfig(), target_load_factor=1.0)
    assert r.converged
    np.testing.assert_allclose(r.displacements[:, 0], [0, 1, 2, 3], atol=2e-5)
    assert r.history[0].keys() >= {"load_factor", "iterations", "residual"}


def test_full_nr_with_nn_converges_quadratically_fast():
    """A true Newton method on the 164-parameter coupled system should hit
    equilibrium in a handful of iterations, not the reference's 1000."""
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(1), hidden_layers=2,
                             neurons_per_layer=10, input_dim=3, scale=1.0),
        area=to_field(1.0),
        density=to_field(1.0),
    )
    p = chain_problem(mat)
    r = solve_full_nr(p, SolverConfig(max_iterations=100), target_load_factor=0.3)
    assert r.converged
    assert len(r.history) < 30
    # History contract keys (reference solver.py:985-994).
    assert set(r.history[0]) == {"iteration", "loss_total", "loss_physics",
                                 "loss_data", "grad_norm_u", "grad_norm_theta"}

    # Equilibrium: f_int == lf * f_ext on free DOFs.
    import jax.numpy as jnp

    from pinn_fem_tpu.ops.assembly import internal_force_and_strain

    data = p.to_device()
    u = jnp.asarray(r.displacements.flatten(), dtype=data.loads.dtype)
    f_int, _ = internal_force_and_strain(data, p.material, u, 0.3)
    res = (np.asarray(f_int) - 0.3 * np.asarray(data.loads)) * np.asarray(data.free_mask)
    assert np.linalg.norm(res) < 1e-5


def test_full_nr_with_measurements_fits_data():
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(2), hidden_layers=2,
                             neurons_per_layer=8, input_dim=3, scale=1.0),
        area=to_field(1.0),
        density=to_field(1.0),
    )
    p = chain_problem(mat)
    measured_dofs = np.array([2, 4, 6])
    measured = np.array([1.0, 2.0, 3.0])
    r = solve_full_nr(
        p, SolverConfig(max_iterations=200), measured, measured_dofs,
        target_load_factor=1.0,
    )
    # The data term pins u to the measurements and theta to E*A = 1.
    np.testing.assert_allclose(r.displacements[1:, 0], [1, 2, 3], atol=5e-2)


def test_full_nr_data_tolerance_gate():
    """Boundary of SolverConfig.full_nr_data_tolerance.

    Start AT physical equilibrium (warm start from a converged physics-only
    solve) with measurements offset by exactly 1e-2: the equilibrium
    criterion ||R|| < tol holds immediately, the data RMS is 1e-2, and the
    total gradient is dominated by the data pull (>> tol).  The gate alone
    then decides whether iteration 0 converges: a gate above 1e-2 accepts
    instantly, a gate below forces the solver to iterate the misfit down.
    """
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(5), hidden_layers=1,
                             neurons_per_layer=4, input_dim=3, scale=1.0),
        area=to_field(1.0),
        density=to_field(1.0),
    )
    p = chain_problem(mat)
    r0 = solve_full_nr(p, SolverConfig(max_iterations=100, tolerance=1e-6),
                       target_load_factor=1.0)
    assert r0.converged
    u_star = r0.displacements.flatten()
    measured_dofs = np.array([2, 4, 6])
    measured = u_star[measured_dofs] + 1e-2

    def run(data_tol):
        cfg = SolverConfig(max_iterations=50, tolerance=1e-4,
                           full_nr_data_tolerance=data_tol)
        return solve_full_nr(p, cfg, measured, measured_dofs,
                             target_load_factor=1.0, u_initial=u_star)

    loose = run(data_tol=0.1)    # gate above the 1e-2 misfit: instant accept
    assert loose.converged
    assert len(loose.history) <= 1
    strict = run(data_tol=1e-4)  # gate below: must iterate the misfit down
    assert len(strict.history) > len(loose.history)


def test_hessian_matches_finite_difference():
    """Spot-check jacfwd(grad) against central finite differences of the
    gradient on a tiny configuration."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from pinn_fem_tpu.ops.assembly import internal_force_and_strain
    from pinn_fem_tpu.solvers.gd import get_theta, set_theta

    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(3), hidden_layers=1,
                             neurons_per_layer=3, input_dim=3, scale=1.0),
        area=to_field(1.0),
        density=to_field(1.0),
    )
    p = chain_problem(mat)
    data = p.to_device()
    free = jnp.array([2, 4, 6])
    theta = get_theta(mat)
    th_flat, unravel = ravel_pytree(theta)
    n_free = 3

    def loss(z):
        u = jnp.zeros(8).at[free].set(z[:n_free])
        m = set_theta(mat, unravel(z[n_free:]))
        f_int, _ = internal_force_and_strain(data, m, u, 1.0)
        r = (f_int - data.loads) * data.free_mask
        return 0.5 * jnp.sum(r * r)

    z0 = jnp.concatenate([jnp.array([0.3, 0.5, 0.9]), th_flat])
    h = np.asarray(jax.jacfwd(jax.grad(loss))(z0))
    g = jax.grad(loss)
    eps = 1e-3
    for i in [0, 2, 5, n_free + 1]:
        zp = z0.at[i].add(eps)
        zm = z0.at[i].add(-eps)
        fd_row = (np.asarray(g(zp)) - np.asarray(g(zm))) / (2 * eps)
        np.testing.assert_allclose(h[i], fd_row, rtol=0.05, atol=5e-3)
