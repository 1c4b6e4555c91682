"""Global assembly tests: closed forms, identity f_int = K u, and
differentiability of the assembled system w.r.t. material parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from pinn_fem_tpu import (
    Material,
    TrussProblem,
    assemble_system,
    compute_residual_and_jacobian,
    internal_force_and_strain,
    make_mlp_field,
    to_field,
)
from pinn_fem_tpu.solvers.gd import get_theta, set_theta


def three_bar_problem(young=1.0, area=1.0):
    mat = Material(young=to_field(young), area=to_field(area), density=to_field(1.0))
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    return TrussProblem(
        nodes=nodes,
        elements=np.array([[0, 1], [1, 2], [2, 3]]),
        material=mat,
        loads=np.array([0, 0, 0, 0, 0, 0, 1.0, 0]),
        fixed_dofs=np.array([0, 1, 3, 5, 7]),
        dimension=2,
    )


def test_three_bar_stiffness_matches_hand_assembly():
    p = three_bar_problem()
    data = p.to_device()
    k, f_int, max_strain = assemble_system(data, p.material, jnp.zeros(8))
    k = np.asarray(k)
    # x-DOF sub-block (dofs 0,2,4,6) must be the standard chain matrix.
    chain = np.array([
        [1, -1, 0, 0],
        [-1, 2, -1, 0],
        [0, -1, 2, -1],
        [0, 0, -1, 1],
    ], dtype=float)
    np.testing.assert_allclose(k[np.ix_([0, 2, 4, 6], [0, 2, 4, 6])], chain, atol=1e-6)
    # y DOFs carry no stiffness for a horizontal chain.
    np.testing.assert_allclose(k[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(f_int), 0.0, atol=1e-7)
    assert float(max_strain) == 0.0


def test_f_int_equals_K_u_for_linear_elements():
    p = three_bar_problem(young=3.0, area=0.5)
    data = p.to_device()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=8), dtype=jnp.float32)
    k, f_int, _ = assemble_system(data, p.material, u)
    np.testing.assert_allclose(np.asarray(f_int), np.asarray(k @ u), atol=1e-4)
    f2, _ = internal_force_and_strain(data, p.material, u)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f_int), atol=1e-5)


def test_residual_zero_at_analytic_solution():
    """u = [0,1,2,3] on the x DOFs solves the unit-load chain
    (reference test_torch_element.py:79-187 and examples/json/README.md:19-22)."""
    p = three_bar_problem()
    data = p.to_device()
    u = jnp.zeros(8).at[jnp.array([2, 4, 6])].set(jnp.array([1.0, 2.0, 3.0]))
    f_int, _ = internal_force_and_strain(data, p.material, u)
    r = (np.asarray(f_int) - np.asarray(data.loads)) * np.asarray(data.free_mask)
    np.testing.assert_allclose(r, 0.0, atol=1e-6)


def test_assembly_1d_problem():
    mat = Material(young=to_field(2.0), area=to_field(3.0), density=to_field(0.0))
    p = TrussProblem(
        nodes=np.array([0.0, 1.0, 3.0]),
        elements=np.array([[0, 1], [1, 2]]),
        material=mat,
        loads=np.array([0.0, 0.0, 1.0]),
        fixed_dofs=np.array([0]),
        dimension=1,
    )
    data = p.to_device()
    k, _, _ = assemble_system(data, p.material, jnp.zeros(3))
    ea = 6.0
    expected = np.array([
        [ea / 1, -ea / 1, 0],
        [-ea / 1, ea / 1 + ea / 2, -ea / 2],
        [0, -ea / 2, ea / 2],
    ])
    np.testing.assert_allclose(np.asarray(k), expected, rtol=1e-6)


def test_gradient_wrt_nn_material_matches_finite_difference():
    key = jax.random.PRNGKey(42)
    field = make_mlp_field(key, hidden_layers=2, neurons_per_layer=5,
                           input_dim=3, scale=1.0)
    mat = Material(young=field, area=to_field(1.0), density=to_field(1.0))
    p = three_bar_problem()
    p.material = mat
    data = p.to_device()
    u = jnp.zeros(8).at[jnp.array([2, 4, 6])].set(jnp.array([0.5, 1.0, 1.5]))
    theta = get_theta(mat)

    def loss(th):
        m = set_theta(mat, th)
        f_int, _ = internal_force_and_strain(data, m, u, 0.7)
        r = (f_int - 0.7 * data.loads) * data.free_mask
        return 0.5 * jnp.sum(r * r)

    g = jax.grad(loss)(theta)
    w0 = theta[0][0][0]
    gw0 = np.asarray(g[0][0][0])
    eps = 1e-3
    idx = (1, 2)
    th_p = jax.tree_util.tree_map(lambda x: x, theta)
    w_plus = w0.at[idx].add(eps)
    w_minus = w0.at[idx].add(-eps)
    lp = loss([[(w_plus, theta[0][0][1])] + theta[0][1:]])
    lm = loss([[(w_minus, theta[0][0][1])] + theta[0][1:]])
    fd = (float(lp) - float(lm)) / (2 * eps)
    assert np.isclose(gw0[idx], fd, rtol=5e-2, atol=1e-6)


def test_compute_residual_and_jacobian_contract():
    """Exported helper parity with reference nn_assembly.py:234-261:
    R_free = (f_int - f_ext)[free], K_ff = K[free][:, free] = dR/du."""
    p = three_bar_problem(young=2.0, area=0.5)
    data = p.to_device()
    free_idx, _ = p.free_fixed()
    free_idx = jnp.asarray(free_idx, jnp.int32)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=8) * 0.1, dtype=data.loads.dtype)
    f_ext = jnp.asarray(data.loads)

    r, j = compute_residual_and_jacobian(data, p.material, u, f_ext, free_idx)
    assert r.shape == (3,) and j.shape == (3, 3)

    # Contract: residual equals the free rows of f_int - f_ext.
    k, f_int, _ = assemble_system(data, p.material, u)
    np.testing.assert_allclose(
        np.asarray(r), (np.asarray(f_int) - np.asarray(f_ext))[np.asarray(free_idx)],
        atol=1e-6,
    )
    # Jacobian equals dR/du restricted to the free block (finite differences).
    def r_of_u(uf):
        ufull = u.at[free_idx].set(uf)
        rr, _ = compute_residual_and_jacobian(data, p.material, ufull, f_ext, free_idx)
        return rr

    uf0 = u[free_idx]
    eps = 1e-3
    for col in range(3):
        rp = np.asarray(r_of_u(uf0.at[col].add(eps)))
        rm = np.asarray(r_of_u(uf0.at[col].add(-eps)))
        np.testing.assert_allclose(
            np.asarray(j)[:, col], (rp - rm) / (2 * eps), rtol=1e-3, atol=1e-4
        )


def test_density_never_enters_stiffness():
    """Reference behavior: density is physics-inert (assembly.py:39-41,
    SURVEY §7.3) — changing it must not change K or f_int."""
    p1 = three_bar_problem()
    p2 = three_bar_problem()
    p2.material = Material(
        young=to_field(1.0), area=to_field(1.0), density=to_field(123.0)
    )
    u = jnp.ones(8)
    k1, f1, _ = assemble_system(p1.to_device(), p1.material, u)
    k2, f2, _ = assemble_system(p2.to_device(), p2.material, u)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_mlp_field_input_adaptation():
    """models/fields.MLPField._adapt_inputs: narrow nets receive spatial
    columns first (fixed reference defect — its legacy input_dim=1 nets
    crash on the 3-column assembly dict); full-width nets keep the
    reference's (load_factor, x, y) order; wider nets are zero-padded."""
    from pinn_fem_tpu.models.fields import assembly_inputs

    mid = jnp.array([[0.5, 0.0], [1.5, 2.0]])
    x = assembly_inputs(mid, 2, jnp.asarray(0.3, jnp.float32))  # (lf, x, y)
    np.testing.assert_allclose(np.asarray(x),
                               [[0.3, 0.5, 0.0], [0.3, 1.5, 2.0]], atol=1e-6)

    def field(input_dim):
        return make_mlp_field(jax.random.PRNGKey(0), 1, 4,
                              input_dim=input_dim, scale=1.0)

    # input_dim=1 -> x column only.
    f1 = field(1)
    adapted = f1._adapt_inputs(x)
    np.testing.assert_allclose(np.asarray(adapted), [[0.5], [1.5]], atol=1e-6)
    # input_dim=2 -> (x, y).
    f2 = field(2)
    np.testing.assert_allclose(np.asarray(f2._adapt_inputs(x)),
                               [[0.5, 0.0], [1.5, 2.0]], atol=1e-6)
    # input_dim=3 -> untouched (parity order).
    f3 = field(3)
    np.testing.assert_allclose(np.asarray(f3._adapt_inputs(x)), np.asarray(x))
    # input_dim=4 -> zero-padded (reference properties.py:139-142).
    f4 = field(4)
    a4 = np.asarray(f4._adapt_inputs(x))
    assert a4.shape == (2, 4)
    np.testing.assert_allclose(a4[:, 3], 0.0)
    # And every variant evaluates without shape errors.
    for f in (f1, f2, f3, f4):
        v = np.asarray(f.eval_batch(x))
        assert v.shape == (2,) and np.all(np.isfinite(v)) and np.all(v > 0)
