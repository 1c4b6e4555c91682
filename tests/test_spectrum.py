"""Response-spectrum analysis (solvers/spectrum.py) vs closed forms.

SDOF: one free DOF -> the combined peak is exactly Gamma^2 Sa/omega^2 =
Sa/omega^2 times the mass... more precisely u = Gamma phi Sa/omega^2 with
Gamma = phi m r and phi = 1/sqrt(m): u = Sa m / k.  Effective modal mass
must equal the full direction mass (100% participation with all modes)."""

import numpy as np
import pytest

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


# ------------------------------------- spectrum GENERATION (from a_g(t))


def test_spectrum_from_history_resonance_and_zpa():
    """Closed forms of the SDOF sweep: at resonance the peak equals the
    steady-state amplitude A/(2 zeta w^2) (the transient only ever
    approaches it from below there), and the rigid-oscillator limit
    recovers the peak ground acceleration (ZPA)."""
    from pinn_fem_tpu.solvers.spectrum import spectrum_from_history

    A, Om, z = 1.3, 2.0, 0.05
    dt = 0.005
    t = dt * np.arange(40000)              # 200 s >> 1/(z w) settle time
    ag = A * np.sin(Om * t)
    cur = spectrum_from_history(ag, dt, np.array([Om, 60.0]),
                                damping_ratio=z)
    np.testing.assert_allclose(cur.sd[0], A / (2 * z * Om * Om),
                               rtol=1e-3)
    np.testing.assert_allclose(cur.psa[1], A, rtol=5e-3)     # ZPA
    np.testing.assert_allclose(cur.sa_abs[1], A, rtol=5e-3)
    # Pseudo-spectra identities.
    np.testing.assert_allclose(cur.psv, cur.omegas * cur.sd, rtol=1e-12)
    np.testing.assert_allclose(cur.psa, cur.omegas ** 2 * cur.sd,
                               rtol=1e-12)


def test_spectrum_from_history_matches_transient_integrator():
    """Independent cross-check: the SDOF Newmark sweep's Sd equals the
    peak relative displacement of the full base-excitation transient
    (central difference, relative-coordinate -M iota a_g) on a matched
    tip-mass oscillator — two implementations, one physics."""
    from pinn_fem_tpu.io.analysis import run_transient
    from pinn_fem_tpu.solvers.spectrum import spectrum_from_history

    m_tip, k = 2.0, 1.0                    # w = sqrt(k/m)
    w = np.sqrt(k / m_tip)
    z = 0.04
    p = TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(young=1.0, area=1.0, density=1e-7),
                     np.array([0.0, 0.0]), np.array([0]), 1,
                     point_masses=np.array([0.0, m_tip]))
    dt, n = 0.02, 6000
    hist = {"type": "sine", "frequency_hz": 0.9 * w / (2 * np.pi)}
    out = run_transient(p, {
        "type": "transient", "dt": dt, "n_steps": n,
        "damping": [2.0 * z * w, 0.0],     # alpha-only: zeta(w) = z
        "load": {"type": "base_acceleration", "history": hist,
                 "direction": [1.0]},
        "probe_nodes": [1], "record_every": 1})
    peak_transient = np.max(np.abs(np.asarray(out["displacements"])))
    t = dt * np.arange(n)
    ag = np.sin(2.0 * np.pi * float(hist["frequency_hz"]) * t)
    cur = spectrum_from_history(ag, dt, np.array([w]), damping_ratio=z)
    np.testing.assert_allclose(cur.sd[0], peak_transient, rtol=5e-3)


def test_spectrum_block_from_history_json():
    """The "sa": {"history": ...} contract end-to-end: generated Sa at
    the modal frequencies + the optional returned curve, and for the
    SDOF structure the combined peak equals the curve's Sd exactly."""
    from pinn_fem_tpu.io.analysis import run_spectrum
    from pinn_fem_tpu.solvers.spectrum import spectrum_from_history

    m_tip = 2.0
    w = np.sqrt(1.0 / m_tip)
    p = TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(young=1.0, area=1.0, density=1e-7),
                     np.array([0.0, 0.0]), np.array([0]), 1,
                     point_masses=np.array([0.0, m_tip]))
    dt, n = 0.02, 4000
    spec = {"history": {"type": "sine",
                        "frequency_hz": 0.8 * w / (2 * np.pi)},
            "dt": dt, "n_steps": n, "damping_ratio": 0.05,
            "curve_omegas": {"start": 0.3, "stop": 3.0, "num": 12}}
    out = run_spectrum(p, {"sa": spec, "direction": [1.0],
                           "n_modes": 1, "damping_ratio": 0.05})
    assert out["success"] and out["sa_source"] == "history"
    assert out["mass_fraction"] > 0.999999   # SDOF: one mode is all
    # sa_at_modes is the generated curve at the modal frequency.
    t = dt * np.arange(n)
    ag = np.sin(0.8 * w * t)
    cur = spectrum_from_history(ag, dt, np.asarray(out["omegas"]), 0.05)
    np.testing.assert_allclose(out["sa_at_modes"], cur.psa, rtol=1e-9)
    # SDOF: combined peak displacement == Sd(w1) (Gamma*phi = 1).
    np.testing.assert_allclose(np.max(out["displacements"]),
                               cur.sd[0], rtol=1e-4)
    assert len(out["spectrum_curve"]["psa"]) == 12
    # Error paths.
    with pytest.raises(ValueError, match='"dt"'):
        run_spectrum(p, {"sa": {"history": [0.0, 1.0]}})
    with pytest.raises(ValueError, match="n_steps"):
        run_spectrum(p, {"sa": {"history": {"type": "sine",
                                            "frequency_hz": 1.0},
                                "dt": 0.01}})


def test_spectrum_member_forces_combined_per_quantity():
    """Member forces are combined PER RESPONSE QUANTITY.  SDOF: one
    mode, so the combined |N| equals the force at the modal peak
    exactly.  Two modes: the naive force-of-combined-displacements is
    provably different (and wrong) wherever modal forces carry opposite
    signs."""
    from pinn_fem_tpu.io.analysis import run_spectrum
    from pinn_fem_tpu.ops.host import host_axial_forces

    # SDOF exactness.
    m_tip = 2.0
    p = TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(young=1.0, area=1.0, density=1e-7),
                     np.array([0.0, 0.0]), np.array([0]), 1,
                     point_masses=np.array([0.0, m_tip]))
    res = response_spectrum(p, 0.4, direction=[1.0], n_modes=1)
    n_exact = np.abs(host_axial_forces(p, res.modal_peaks[0]))
    np.testing.assert_allclose(res.axial_forces, n_exact, rtol=1e-12)

    # Multi-mode chain: per-quantity SRSS of modal forces differs from
    # the force of the SRSS displacement field.
    n_nodes = 6
    pc = TrussProblem(np.arange(float(n_nodes)),
                      np.stack([np.arange(n_nodes - 1),
                                np.arange(1, n_nodes)], 1),
                      Material(3.0, 0.7, 2.0),
                      np.zeros(n_nodes), np.array([0]), 1)
    rc = response_spectrum(pc, 1.0, direction=[1.0], n_modes=4)
    srss_of_forces = np.sqrt(np.sum(
        np.stack([host_axial_forces(pc, rc.modal_peaks[j])
                  for j in range(4)]) ** 2, axis=0))
    np.testing.assert_allclose(rc.axial_forces, srss_of_forces,
                               rtol=1e-12)
    wrong = np.abs(host_axial_forces(pc, rc.displacements))
    assert np.max(np.abs(wrong - rc.axial_forces)
                  / np.maximum(rc.axial_forces, 1e-30)) > 0.03

    # JSON tier carries it.
    out = run_spectrum(pc, {"sa": 1.0, "direction": [1.0],
                            "n_modes": 4})
    np.testing.assert_allclose(out["axial_forces"], rc.axial_forces,
                               rtol=1e-10)


def corner_fan():
    """Free corner node tied by x, y and diagonal bars — invariant under
    the x<->y swap (the diagonal maps to itself), and NOT a mechanism
    (a lone diagonal truss bar would carry a zero-frequency transverse
    mode whose Sa/omega^2 response is garbage — caught live, kept here
    as the counterexample shape to avoid)."""
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    elements = np.array([[0, 1], [0, 2], [0, 3]])
    return TrussProblem(nodes, elements, Material(1.0, 1.0, 2.0),
                        np.zeros(8), np.arange(2, 8), 2)


def test_directional_combination_symmetry_closed_forms():
    """x<->y symmetry gives exact factors on the DIAGONAL member (it
    responds identically to both directions): SRSS = sqrt(2) x single,
    100-30 = 1.3 x single; displacement fields swap under the symmetry
    and combine by the stated formulas."""
    from pinn_fem_tpu.solvers.spectrum import directional_combination

    p = corner_fan()
    sx = response_spectrum(p, 0.5, direction=[1.0, 0.0], n_modes=2)
    sy = response_spectrum(p, 0.5, direction=[0.0, 1.0], n_modes=2)
    # Symmetry: the y-excitation response is the x one with DOFs and
    # the x/y bars swapped.
    np.testing.assert_allclose(sy.displacements[0], sx.displacements[1],
                               rtol=1e-9)
    np.testing.assert_allclose(sy.axial_forces[[1, 0, 2]],
                               sx.axial_forces, rtol=1e-9)
    srss = directional_combination(p, 0.5, [[1, 0], [0, 1]],
                                   rule="srss", n_modes=2)
    pct = directional_combination(p, 0.5, [[1, 0], [0, 1]],
                                  rule="100-30", n_modes=2)
    # Exact symmetry factors on the diagonal member.
    np.testing.assert_allclose(srss.axial_forces[2],
                               np.sqrt(2.0) * sx.axial_forces[2],
                               rtol=1e-9)
    np.testing.assert_allclose(pct.axial_forces[2],
                               1.3 * sx.axial_forces[2], rtol=1e-9)
    # And the stated formulas hold per quantity across the board.
    np.testing.assert_allclose(
        srss.displacements,
        np.sqrt(sx.displacements ** 2 + sy.displacements ** 2),
        rtol=1e-12)
    np.testing.assert_allclose(
        pct.axial_forces,
        np.maximum(sx.axial_forces + 0.3 * sy.axial_forces,
                   sy.axial_forces + 0.3 * sx.axial_forces),
        rtol=1e-12)
    with pytest.raises(ValueError, match=">= 2 directions"):
        directional_combination(p, 0.5, [[1, 0]])
    with pytest.raises(ValueError, match="directional rule"):
        directional_combination(p, 0.5, [[1, 0], [0, 1]], rule="abs")


def test_directional_combination_json_tier():
    from pinn_fem_tpu.io.analysis import run_spectrum

    p = corner_fan()
    out = run_spectrum(p, {"sa": 0.5, "directions": [[1, 0], [0, 1]],
                           "directional_rule": "100-30", "n_modes": 2})
    one = run_spectrum(p, {"sa": 0.5, "direction": [1, 0],
                           "n_modes": 2})
    # Exact 1.3 factor on the diagonal member (x<->y symmetry).
    np.testing.assert_allclose(out["axial_forces"][2],
                               1.3 * one["axial_forces"][2], rtol=1e-9)
    assert out["directional_rule"] == "100-30"
    assert len(out["per_direction"]) == 2
    for d in out["per_direction"]:
        assert 0.0 < d["mass_fraction"] <= 1.0 + 1e-6
    with pytest.raises(ValueError, match="not both"):
        run_spectrum(p, {"sa": 0.5, "direction": [1, 0],
                         "directions": [[1, 0], [0, 1]]})


def test_spectrum_mechanism_guard():
    """A lone diagonal truss bar is a transverse mechanism: the
    zero-frequency mode's Sa/omega^2 peak is unbounded, and the
    combination must refuse loudly instead of returning 1e59 garbage
    (which it silently did before the guard — caught live)."""
    p = TrussProblem(np.array([[0.0, 0.0], [1.0, 1.0]]),
                     np.array([[0, 1]]),
                     Material(1.0, 1.0, 2.0),
                     np.zeros(4), np.array([0, 1]), 2)
    with pytest.raises(ValueError, match="mechanism"):
        response_spectrum(p, 0.5, direction=[1.0, 0.0], n_modes=2)
    # The Gershgorin-scaled guard sees it even when the mechanism is
    # the ONLY computed mode (a relative-to-omega_max test cannot).
    with pytest.raises(ValueError, match="mechanism"):
        response_spectrum(p, 0.5, direction=[1.0, 0.0], n_modes=1)
    # A braced (well-posed) structure passes untouched.
    res = response_spectrum(corner_fan(), 0.5, direction=[1.0, 0.0],
                            n_modes=2)
    assert np.all(np.isfinite(res.displacements))
    assert res.displacements.max() < 1e3
