"""Random-vibration response (solvers/random_response.py) vs the SDOF
white-noise closed form sigma^2 = pi S0 / (2 k c)."""

import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.random_response import random_response


def sdof_bar(young=4.0, density=2.0):
    return TrussProblem(
        nodes=np.array([0.0, 1.0]), elements=np.array([[0, 1]]),
        material=Material(young=young, area=1.0, density=density),
        loads=np.array([0.0, 1.0]), fixed_dofs=np.array([0]), dimension=1)


def test_sdof_white_noise_rms():
    p = sdof_bar()
    k, m = 4.0, 1.0
    alpha = 0.5                 # c = alpha m
    c = alpha * m
    w0 = np.sqrt(k / m)
    s0 = 0.37
    # Grid: dense through the peak, extended tail (the integrand decays
    # like 1/w^4 past resonance).
    om = np.concatenate([np.linspace(1e-3, 3 * w0, 4000),
                         np.linspace(3 * w0, 40 * w0, 4000)[1:]])
    res = random_response(p, s0, om, damping=(alpha, 0.0),
                          probe_dofs=np.array([1]))
    sigma2_exact = np.pi * s0 / (2.0 * k * c)
    np.testing.assert_allclose(res.rms[0] ** 2, sigma2_exact, rtol=2e-2)
    # PSD peaks at the damped resonance.
    peak = om[np.argmax(res.psd[:, 0])]
    np.testing.assert_allclose(peak, w0, rtol=0.05)


def test_callable_psd_band_limited():
    """Band-limited input: only the in-band FRF contributes; halving the
    band around a flat FRF region roughly halves the variance."""
    p = sdof_bar()
    w0 = 2.0

    def band(lo, hi):
        return lambda w: np.where((w > lo) & (w < hi), 1.0, 0.0)

    om = np.linspace(1e-3, 1.0, 3000)   # well below resonance: flat |H|
    full = random_response(p, band(0.1, 0.9), om, damping=(0.5, 0.0),
                           probe_dofs=np.array([1]))
    half = random_response(p, band(0.1, 0.5), om, damping=(0.5, 0.0),
                           probe_dofs=np.array([1]))
    ratio = half.rms[0] ** 2 / full.rms[0] ** 2
    assert 0.4 < ratio < 0.6


def test_rejects_bad_inputs():
    p = sdof_bar()
    with pytest.raises(ValueError, match="increasing"):
        random_response(p, 1.0, [2.0, 1.0])
    with pytest.raises(ValueError, match="negative"):
        random_response(p, lambda w: -np.ones_like(w),
                        np.linspace(0.1, 1.0, 10), damping=(0.1, 0.0))
    with pytest.raises(ValueError, match="damping"):
        random_response(p, 1.0, np.linspace(0.1, 1.0, 10))


def test_random_member_force_rms_sdof_closed_form():
    """Single bar: N = k u exactly, so the force RMS is k times the
    displacement RMS (and the white-noise SDOF sigma_N^2 =
    k^2 pi S0/(2 k c) closed form follows)."""
    from pinn_fem_tpu.io.analysis import run_random

    k, m, c = 4.0, 2.0, 0.2                  # E=A=L=1 -> k=E A/L
    p = TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(young=k, area=1.0, density=2.0 * m),
                     np.array([0.0, 1.0]), np.array([0]), 1)
    wn = np.sqrt(k / m)
    om = np.linspace(1e-3, 12.0 * wn, 6000)
    s0 = 0.7
    res = random_response(p, s0, om, damping=(c / m, 0.0),
                          probe_dofs=np.array([1]),
                          probe_elements=np.array([0]))
    sigma_u2 = np.pi * s0 / (2.0 * k * c)
    np.testing.assert_allclose(res.rms[0] ** 2, sigma_u2, rtol=2e-2)
    np.testing.assert_allclose(res.force_rms[0], k * res.rms[0],
                               rtol=1e-10)
    # JSON tier.
    out = run_random(p, {"psd": s0, "omegas": om.tolist(),
                         "damping": [c / m, 0.0], "probe_nodes": [1],
                         "probe_elements": [0]})
    np.testing.assert_allclose(out["force_rms"], [res.force_rms[0]],
                               rtol=1e-10)
