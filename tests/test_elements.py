"""Element kernel unit tests against closed forms.

Mirrors the intent of the reference's hand-rolled parity script
(/root/reference/FEM/python/test_torch_element.py) with real pytest:
stiffness/force closed forms, the 45-degree bar check, and autodiff
gradients (replacing the NumPy<->torch parity check, since there is only
one implementation here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_fem_tpu.ops.elements import (
    truss1d_linear_element,
    truss2d_element_state,
    truss2d_green_lagrange_batch,
    truss2d_linear_element,
    truss_linear_batch,
)


def test_truss1d_stiffness_closed_form():
    e, a, l = 210e9, 0.01, 2.0
    out = truss1d_linear_element(0.0, l, 0.0, 0.001, e, a)
    k = e * a / l
    np.testing.assert_allclose(
        np.asarray(out.ke), k * np.array([[1, -1], [-1, 1]]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.fe_int), k * np.array([-0.001, 0.001]), rtol=1e-6
    )
    assert np.isclose(float(out.strain), 0.001 / l, rtol=1e-6)


def test_truss2d_horizontal_bar_matches_1d():
    e, a = 1.0, 1.0
    out = truss2d_linear_element(
        np.array([0.0, 0.0]), np.array([1.0, 0.0]),
        np.array([0.0, 0.0]), np.array([0.5, 0.0]), e, a,
    )
    ke = np.asarray(out.ke)
    # x-DOF block is the 1D pattern; y rows/cols are zero for horizontal bar.
    np.testing.assert_allclose(ke[np.ix_([0, 2], [0, 2])],
                               np.array([[1, -1], [-1, 1]]), atol=1e-7)
    np.testing.assert_allclose(ke[1], 0.0, atol=1e-7)
    assert np.isclose(float(out.strain), 0.5, rtol=1e-6)


def test_truss2d_45_degree_bar_axial_force():
    """45-degree bar with axial elongation delta: F = (EA/L) * delta
    (reference test_torch_element.py:190-244)."""
    e, a = 210e9, 0.01
    xj = np.array([1.0, 1.0])
    l0 = np.sqrt(2.0)
    delta = 1e-3
    u_j = delta * xj / l0  # elongation along the bar axis
    out = truss2d_linear_element(np.zeros(2), xj, np.zeros(2), u_j, e, a)
    f_axial = np.linalg.norm(np.asarray(out.fe_int)[2:])
    assert np.isclose(f_axial, e * a / l0 * delta, rtol=1e-5)


def test_green_lagrange_strain_definition():
    out = truss2d_element_state(
        np.array([0.0, 0.0]), np.array([1.0, 0.0]),
        np.array([0.0, 0.0]), np.array([0.1, 0.0]), 1.0, 1.0,
    )
    l, l0 = 1.1, 1.0
    e_gl = (l * l - l0 * l0) / (2 * l0 * l0)
    assert np.isclose(float(out.strain), e_gl, rtol=1e-5)


def test_green_lagrange_reduces_to_linear_for_small_disp():
    x0 = np.array([[0.0, 0.0], [2.0, 1.0]])
    u = np.array([1e-5, -2e-5, 3e-5, 1e-5])
    gl = truss2d_element_state(x0[0], x0[1], u[:2], u[2:], 1.0, 1.0)
    lin = truss2d_linear_element(x0[0], x0[1], u[:2], u[2:], 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(gl.ke), np.asarray(lin.ke), atol=1e-3)
    assert np.isclose(float(gl.strain), float(lin.strain), rtol=1e-3)


def test_batch_kernel_is_differentiable_wrt_material():
    gvec = jnp.array([[-1.0, 1.0], [-1.0, 1.0]])
    inv_len = jnp.array([1.0, 0.5])
    u_e = jnp.array([[0.0, 0.2], [0.2, 0.5]])

    def energy(young):
        out = truss_linear_batch(gvec, inv_len, u_e, young, jnp.ones(2))
        return jnp.sum(out.fe_int ** 2)

    g = jax.grad(energy)(jnp.array([1.0, 2.0]))
    # Finite-difference check.
    eps = 1e-4
    for i in range(2):
        e_plus = np.array([1.0, 2.0]); e_plus[i] += eps
        e_minus = np.array([1.0, 2.0]); e_minus[i] -= eps
        fd = (energy(jnp.asarray(e_plus)) - energy(jnp.asarray(e_minus))) / (2 * eps)
        assert np.isclose(float(g[i]), float(fd), rtol=1e-2)


def test_zero_length_element_rejected_at_problem_build():
    from pinn_fem_tpu import Material, TrussProblem, to_field

    mat = Material(young=to_field(1.0), area=to_field(1.0), density=to_field(0.0))
    p = TrussProblem(
        nodes=np.array([[0.0, 0.0], [0.0, 0.0]]),
        elements=np.array([[0, 1]]),
        material=mat,
        loads=np.zeros(4),
        fixed_dofs=np.array([0, 1]),
        dimension=2,
    )
    with pytest.raises(ValueError, match="zero initial length"):
        p.to_device()
