"""Modal analysis (solvers/modal.py) vs exact discrete spectra.

For the fixed-fixed 1D chain of n elements (h = 1, EA = E A), the free
block of K is (EA/h) tridiag(-1, 2, -1) whose eigenvalues are exactly
2 - 2 cos(j pi / n); with lumped mass rho A h the discrete eigenvalues are

    omega_j^2 = (E / (rho h^2)) (2 - 2 cos(j pi / n)),

and with CONSISTENT mass (rho A h / 6) tridiag(1, 4, 1) they are

    omega_j^2 = (E / (rho h^2)) * 6 (1 - cos t_j) / (2 + cos t_j).

Both closed forms are asserted, plus differentiability of the spectrum
w.r.t. material parameters (the density-identification signal) and the
banded subspace-iteration path against the dense one."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.modal import (modal_analysis, modal_eigenvalues)


def fixed_fixed_chain(n_elm=12, young=3.0, area=0.7, density=2.0):
    n = n_elm + 1
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    return TrussProblem(nodes, elements,
                        Material(young=young, area=area, density=density),
                        np.zeros(n), np.array([0, n - 1]), 1)


def exact_lambdas(n_elm, young, density, lumped=True, k=None):
    theta = np.pi * np.arange(1, n_elm) / n_elm
    if lumped:
        lam = (young / density) * (2.0 - 2.0 * np.cos(theta))
    else:
        lam = (young / density) * 6.0 * (1.0 - np.cos(theta)) \
            / (2.0 + np.cos(theta))
    lam = np.sort(lam)
    return lam[:k] if k else lam


@pytest.mark.parametrize("lumped", [True, False])
def test_chain_spectrum_exact(lumped):
    p = fixed_fixed_chain()
    res = modal_analysis(p, n_modes=5, lumped=lumped)
    expect = exact_lambdas(12, 3.0, 2.0, lumped=lumped, k=5)
    np.testing.assert_allclose(res.eigenvalues, expect, rtol=1e-4)
    assert np.all(res.residuals < 1e-3)
    # First mode shape ~ sin profile (up to sign), zeros on fixed DOFs.
    phi = res.shapes[:, 0]
    assert phi[0] == 0.0 and phi[-1] == 0.0
    x = np.arange(13) / 12.0
    target = np.sin(np.pi * x)
    phi_n = phi / np.abs(phi).max() * np.sign(phi[6])
    np.testing.assert_allclose(phi_n, target / np.abs(target).max(),
                               atol=0.02)


def test_area_cancels_in_spectrum():
    """omega^2 = E/(rho h^2) * (...) is independent of the area."""
    a = modal_analysis(fixed_fixed_chain(area=0.1), n_modes=3).eigenvalues
    b = modal_analysis(fixed_fixed_chain(area=10.0), n_modes=3).eigenvalues
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_density_scaling():
    a = modal_analysis(fixed_fixed_chain(density=1.0), n_modes=3).eigenvalues
    b = modal_analysis(fixed_fixed_chain(density=4.0), n_modes=3).eigenvalues
    np.testing.assert_allclose(a, 4.0 * b, rtol=1e-4)


def test_spectrum_differentiable_wrt_density_params():
    """A density MLP receives nonzero gradients through the spectrum —
    the signal static PINN solves cannot provide (density is inert in the
    static residual, reference assembly.py:39-41)."""
    from pinn_fem_tpu.models.fields import make_mlp_field
    from pinn_fem_tpu.solvers.gd import get_theta, set_theta

    p = fixed_fixed_chain()
    material = Material(
        young=3.0, area=0.7,
        density=make_mlp_field(jax.random.PRNGKey(1), hidden_layers=2,
                               neurons_per_layer=8, input_dim=1, scale=2.0,
                               enforce_positive=True),
    )
    problem = TrussProblem(p.nodes, p.elements, material, p.loads,
                           p.fixed_dofs, 1)
    data = problem.to_device()
    theta0 = get_theta(material)

    def loss(theta):
        mat = set_theta(material, theta)
        w = modal_eigenvalues(problem, n_modes=3, data=data, material=mat)
        return jnp.sum(w)

    g = jax.grad(loss)(theta0)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves
    gnorm = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in leaves)
    assert np.isfinite(gnorm) and gnorm > 0


def test_eigenpairs_match_analysis_and_are_m_orthonormal():
    """modal_eigenpairs agrees with modal_analysis and returns shapes
    M-orthonormal on the free block (lumped mass)."""
    from pinn_fem_tpu.ops.mass import lumped_mass
    from pinn_fem_tpu.solvers.modal import modal_eigenpairs

    p = fixed_fixed_chain()
    w, phi = jax.device_get(modal_eigenpairs(p, n_modes=4))
    res = modal_analysis(p, n_modes=4)
    np.testing.assert_allclose(w, res.eigenvalues, rtol=1e-5)
    m = np.asarray(jax.device_get(lumped_mass(p.to_device(), p.material)))
    gram = phi.T @ (m[:, None] * phi)
    np.testing.assert_allclose(gram, np.eye(4), atol=1e-4)
    # Fixed DOFs carry zero shape.
    assert np.all(phi[0] == 0.0) and np.all(phi[-1] == 0.0)


def test_banded_subspace_matches_dense():
    """The large-mesh inverse-subspace path agrees with dense eigh."""
    import pinn_fem_tpu.solvers.newton as newton

    p = fixed_fixed_chain(n_elm=120)
    dense = modal_analysis(p, n_modes=4)
    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 16
        banded = modal_analysis(p, n_modes=4, n_iter=30)
    finally:
        newton.DENSE_DOF_LIMIT = orig
    np.testing.assert_allclose(banded.eigenvalues, dense.eigenvalues,
                               rtol=1e-3)
    assert np.all(banded.residuals < 1e-2)


def test_tripod_modal_3d():
    """3D sanity: 3 free DOFs -> 3 modes, all positive, the vertical mode
    matches the closed-form apex stiffness k_z = 3/(2 sqrt 2) with lumped
    apex mass 3 * (rho A L)/2 = 3 sqrt(2)/2."""
    base = np.array([[1.0, 0.0, 0.0],
                     [-0.5, np.sqrt(3) / 2, 0.0],
                     [-0.5, -np.sqrt(3) / 2, 0.0]])
    nodes = np.vstack([base, [[0.0, 0.0, 1.0]]])
    elements = np.array([[0, 3], [1, 3], [2, 3]])
    p = TrussProblem(nodes, elements,
                     Material(young=1.0, area=1.0, density=1.0),
                     np.zeros(12), np.arange(9), 3)
    res = modal_analysis(p, n_modes=3)
    assert np.all(res.eigenvalues > 0)
    m_apex = 3.0 * np.sqrt(2.0) / 2.0
    k_z = 3.0 / (2.0 * np.sqrt(2.0))
    # The z mode is decoupled by symmetry; one eigenvalue equals k_z/m.
    assert np.min(np.abs(res.eigenvalues - k_z / m_apex)) < 1e-5


def test_rayleigh_coefficients_calibration():
    """Calibrated (alpha, beta) reproduce the target ratios at both
    frequencies and the exact modal damping in solve_transient's model."""
    from pinn_fem_tpu.solvers.modal import rayleigh_coefficients

    w1, w2, z = 2.0, 10.0, 0.03
    alpha, beta = rayleigh_coefficients(w1, z, w2, z)
    np.testing.assert_allclose(alpha, 2 * z * w1 * w2 / (w1 + w2))
    np.testing.assert_allclose(beta, 2 * z / (w1 + w2))
    for w, zt in ((w1, z), (w2, z)):
        np.testing.assert_allclose(alpha / (2 * w) + beta * w / 2, zt)
    # Distinct targets too.
    alpha, beta = rayleigh_coefficients(1.0, 0.02, 8.0, 0.05)
    np.testing.assert_allclose(alpha / 2.0 + beta / 2.0, 0.02)
    np.testing.assert_allclose(alpha / 16.0 + 4.0 * beta, 0.05)


def test_mac_identity_and_orthogonal():
    from pinn_fem_tpu.solvers.modal import mac

    p = fixed_fixed_chain()
    res = modal_analysis(p, n_modes=4)
    m = mac(res.shapes, res.shapes)
    # Same set: unit diagonal; distinct chain modes are near-orthogonal.
    np.testing.assert_allclose(np.diag(m), 1.0, rtol=1e-6)
    off = m - np.diag(np.diag(m))
    assert off.max() < 0.05
    # Sign/scale invariance.
    m2 = mac(res.shapes, -3.7 * res.shapes)
    np.testing.assert_allclose(np.diag(m2), 1.0, rtol=1e-6)
