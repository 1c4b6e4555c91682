"""Frequency-domain identification (solvers/frequency_inverse.py).

The forward FRF model is cross-validated against harmonic_response's
independent host path (full-eigh modal superposition vs the block LU
sweep); then material AND Rayleigh damping are recovered from amplitude
sweeps — the model-updating workflow the time-domain route complements.
"""

import numpy as np
import pytest

import jax

from pinn_fem_tpu import Material, TrussProblem, harmonic_response
from pinn_fem_tpu.solvers.frequency_inverse import (
    frf_probe_amplitudes, identify_from_frf)


def chain(young=2.0, density=3.0, n_nodes=5):
    nodes = np.arange(n_nodes, dtype=float)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    loads = np.zeros(n_nodes)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=young, area=1.0, density=density),
                        loads, np.array([0]), 1)


OM = np.linspace(0.05, 1.2, 120)
PROBE = np.array([2, 4])


def test_forward_matches_harmonic_host_path():
    """The differentiable block-solve FRF equals harmonic_response's
    host tier (full-eigh modal superposition — an INDEPENDENT
    formulation) at every frequency and probe."""
    p = chain()
    amp = np.asarray(jax.device_get(frf_probe_amplitudes(
        p, p.material, OM, (0.08, 0.02), PROBE)))
    ref = harmonic_response(p, OM, damping=(0.08, 0.02),
                            method="direct", probe_dofs=PROBE, host=True)
    np.testing.assert_allclose(amp, ref.amplitude, rtol=2e-4, atol=1e-7)


def test_identify_all_four_from_frf():
    """E, rho, alpha and beta all recovered from one amplitude sweep:
    resonance positions pin stiffness/mass (the amplitude scale breaks
    the K~M degeneracy), peak widths pin the damping."""
    truth = chain(young=2.0, density=3.0)
    meas = np.asarray(jax.device_get(frf_probe_amplitudes(
        truth, truth.material, OM, (0.08, 0.02), PROBE)))

    guess = chain(young=1.0, density=1.0)
    ident, hist = identify_from_frf(
        guess, meas, OM, PROBE,
        params=("young", "density", "alpha", "beta"),
        damping=(0.02, 0.005), n_iter=800, learning_rate=0.08)
    assert hist[-1] < 1e-8 * hist[0], (hist[0], hist[-1])
    np.testing.assert_allclose(ident["young"], 2.0, rtol=0.01)
    np.testing.assert_allclose(ident["density"], 3.0, rtol=0.01)
    np.testing.assert_allclose(ident["alpha"], 0.08, rtol=0.02)
    np.testing.assert_allclose(ident["beta"], 0.02, rtol=0.02)


def test_identify_from_noisy_frf():
    """2% multiplicative noise (the twin-data convention): parameters
    still land within a few percent."""
    truth = chain(young=2.0, density=3.0)
    meas = np.asarray(jax.device_get(frf_probe_amplitudes(
        truth, truth.material, OM, (0.08, 0.02), PROBE)))
    rng = np.random.default_rng(0)
    meas = np.abs(meas * (1.0 + 0.02 * rng.standard_normal(meas.shape)))

    guess = chain(young=1.0, density=1.0)
    ident, _ = identify_from_frf(
        guess, meas, OM, PROBE,
        params=("young", "density", "alpha", "beta"),
        damping=(0.02, 0.005), n_iter=800, learning_rate=0.08)
    np.testing.assert_allclose(ident["young"], 2.0, rtol=0.05)
    np.testing.assert_allclose(ident["density"], 3.0, rtol=0.05)
    np.testing.assert_allclose(ident["alpha"], 0.08, rtol=0.15)
    np.testing.assert_allclose(ident["beta"], 0.02, rtol=0.15)


def test_time_and_frequency_domains_agree():
    """The consistency check of experimental model updating: the SAME
    truth identified from two independent data domains (a transient
    trajectory and an FRF amplitude sweep) must yield the same
    parameters."""
    from pinn_fem_tpu.solvers.transient_inverse import (
        identify_from_transient, transient_probe_response)

    truth = chain(young=2.0, density=3.0)
    damp = (0.08, 0.02)

    meas_t = np.asarray(jax.device_get(transient_probe_response(
        truth, truth.material, 0.05, 800, np.ones(800), PROBE,
        damping=damp)))
    ident_t, _ = identify_from_transient(
        chain(1.0, 3.0), meas_t, 0.05, 800, PROBE,
        params=("young", "alpha", "beta"), damping=(0.02, 0.005),
        n_iter=600, learning_rate=0.08)

    meas_f = np.asarray(jax.device_get(frf_probe_amplitudes(
        truth, truth.material, OM, damp, PROBE)))
    # restarts=3: from E=1.0 with the mass pinned at truth, the
    # single-start fit locks onto the wrong resonance (see
    # test_restarts_escape_mode_swap); the multi-start picks the basin.
    ident_f, _ = identify_from_frf(
        chain(1.0, 3.0), meas_f, OM, PROBE,
        params=("young", "alpha", "beta"), damping=(0.02, 0.005),
        n_iter=800, learning_rate=0.08, restarts=3)

    for k in ("young", "alpha", "beta"):
        np.testing.assert_allclose(ident_t[k], ident_f[k], rtol=0.02)


def test_restarts_escape_mode_swap():
    """FRF fitting is multi-modal: starting at half the true stiffness
    with the mass fixed locks onto the wrong resonance (measured:
    converges to E=0.80, loss stuck at 0.69).  restarts=3 spans the
    basin and recovers the truth."""
    truth = chain(young=2.0, density=3.0)
    meas = np.asarray(jax.device_get(frf_probe_amplitudes(
        truth, truth.material, OM, (0.08, 0.02), PROBE)))

    single, hist1 = identify_from_frf(
        chain(1.0, 3.0), meas, OM, PROBE,
        params=("young", "alpha", "beta"), damping=(0.02, 0.005),
        n_iter=800, learning_rate=0.08)
    assert hist1[-1] > 1e-3          # stuck in the wrong basin

    multi, hist3 = identify_from_frf(
        chain(1.0, 3.0), meas, OM, PROBE,
        params=("young", "alpha", "beta"), damping=(0.02, 0.005),
        n_iter=800, learning_rate=0.08, restarts=3)
    assert hist3[-1] < 1e-8
    np.testing.assert_allclose(multi["young"], 2.0, rtol=0.01)


def test_input_errors():
    p = chain()
    with pytest.raises(ValueError, match="unknown parameter"):
        identify_from_frf(p, np.zeros((10, 2)), OM[:10], PROBE,
                          params=("poisson",))
    with pytest.raises(ValueError, match="measured_amp must be"):
        identify_from_frf(p, np.zeros((7, 2)), OM[:10], PROBE)
    with pytest.raises(ValueError, match="initial"):
        identify_from_frf(p, np.zeros((10, 2)), OM[:10], PROBE,
                          params=("beta",), damping=(0.0, 0.0))
