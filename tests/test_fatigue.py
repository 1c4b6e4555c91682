"""Fatigue post-processing (solvers/fatigue.py) against its closed-form
anchors, plus the JSON exposure on the random and transient blocks.

Anchors (module docstring): the ASTM E1049 worked example, exact
sinusoid rainflow damage, the SDOF white-noise moments (m0 = pi S0/2kc,
nu_0 = f_n exactly), the Dirlik -> narrow-band limit, and the
time-vs-frequency cross-validation on a synthesized Gaussian path."""

import math

import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.io.analysis import run_analysis
from pinn_fem_tpu.solvers.fatigue import (
    crossing_rates,
    davenport_peak_factor,
    dirlik_damage_rate,
    narrowband_damage_rate,
    rainflow_cycles,
    rainflow_damage,
    spectral_fatigue,
    spectral_moments,
    synthesize_gaussian_history,
)


def sdof_bar(young=4.0, density=2.0):
    return TrussProblem(
        nodes=np.array([0.0, 1.0]), elements=np.array([[0, 1]]),
        material=Material(young=young, area=1.0, density=density),
        loads=np.array([0.0, 1.0]), fixed_dofs=np.array([0]), dimension=1)


# ---------------------------------------------------------------- rainflow

def test_rainflow_astm_example():
    """The ASTM E1049-85 Fig. 6 series counts to the standard's table:
    ranges 3, 4, 6, 8, 9 with counts 0.5, 1.5, 0.5, 1.0, 0.5."""
    c = rainflow_cycles([-2, 1, -3, 5, -1, 3, -4, 4, -2])
    by_range = {}
    for rng, _mean, cnt in c:
        by_range[rng] = by_range.get(rng, 0.0) + cnt
    assert by_range == {3.0: 0.5, 4.0: 1.5, 6.0: 0.5, 8.0: 1.0, 9.0: 0.5}
    # Total reversal bookkeeping: counts sum to (n_reversals - 1)/2.
    assert np.isclose(c[:, 2].sum(), 4.0)


def test_rainflow_sinusoid_exact():
    """A sinusoid of amplitude A at f Hz is f cycles/s of amplitude A:
    damage rate f A^m / C (up to the two edge half-cycles)."""
    f, amp, m, c_sn, t_end = 5.0, 3.0, 3.0, 1e6, 20.0
    t = np.arange(int(t_end / 1e-3)) * 1e-3
    rate, n = rainflow_damage(amp * np.sin(2 * np.pi * f * t),
                              t_end, m, c_sn)
    np.testing.assert_allclose(rate, f * amp ** m / c_sn, rtol=1e-2)
    np.testing.assert_allclose(n, f * t_end, rtol=1e-2)


def test_rainflow_plateaus_and_empty():
    assert rainflow_cycles([1.0, 1.0, 1.0]).shape == (0, 3)
    rate, n = rainflow_damage(np.zeros(100), 1.0, 3.0, 1.0)
    assert rate == 0.0 and n == 0.0
    # A plateau inside a cycle must not split it.
    c = rainflow_cycles([0, 2, 2, 2, -2, 2, -2, 0])
    assert np.isclose(c[:, 0].max(), 4.0)


# ------------------------------------------------------- spectral moments

def test_sdof_white_noise_moments_and_crossings():
    """m0 = pi S0 / (2 k c) and nu_0 = f_n EXACTLY (m2/m0 = k/m for any
    damping — the velocity-variance closed form pi S0/(2 m c))."""
    k, m, alpha, s0 = 100.0, 1.0, 0.5, 1.0
    c = alpha * m
    om = np.linspace(1e-3, 200.0, 200001)
    h2 = 1.0 / ((k - m * om ** 2) ** 2 + (c * om) ** 2)
    m0, m1, m2, m4 = spectral_moments(om, h2 * s0)
    np.testing.assert_allclose(m0, np.pi * s0 / (2 * k * c), rtol=1e-4)
    np.testing.assert_allclose(m2, np.pi * s0 / (2 * m * c), rtol=2e-2)
    nu0, _nup, alpha2 = crossing_rates(m0, m2, m4)
    np.testing.assert_allclose(nu0, np.sqrt(k / m) / (2 * np.pi),
                               rtol=1e-2)
    assert 0.0 < alpha2 < 1.0   # band-limited m4 makes it broad-band


def test_moments_vectorize_over_quantities():
    om = np.linspace(0.1, 10.0, 1001)
    psd = np.stack([np.ones_like(om), 2.0 * np.ones_like(om)], axis=1)
    m = spectral_moments(om, psd)
    assert m.shape == (4, 2)
    np.testing.assert_allclose(m[:, 1], 2.0 * m[:, 0], rtol=1e-12)


# ----------------------------------------------------------- damage rates

def test_dirlik_reduces_to_narrowband():
    """alpha_2 -> 1 (a spectral line) makes Dirlik's pdf collapse onto
    the Rayleigh: rates agree to a fraction of a percent."""
    om = np.linspace(8.0, 12.0, 2001)
    psd = np.exp(-0.5 * ((om - 10.0) / 0.05) ** 2)
    m0, m1, m2, m4 = spectral_moments(om, psd)
    nu0 = crossing_rates(m0, m2, m4)[0]
    nb = narrowband_damage_rate(m0, nu0, 3.0, 1e6)
    dk = dirlik_damage_rate(m0, m1, m2, m4, 3.0, 1e6)
    np.testing.assert_allclose(dk, nb, rtol=5e-3)


def test_narrowband_bounds_dirlik_broadband():
    """For a broad-band PSD the narrow-band rate is the conservative
    upper bound (the textbook ordering Dirlik corrects)."""
    om = np.linspace(0.5, 60.0, 4001)
    psd = 1.0 / (1.0 + 0.02 * om ** 2)
    m0, m1, m2, m4 = spectral_moments(om, psd)
    nu0 = crossing_rates(m0, m2, m4)[0]
    nb = narrowband_damage_rate(m0, nu0, 4.0, 1e8)
    dk = dirlik_damage_rate(m0, m1, m2, m4, 4.0, 1e8)
    assert dk < nb


def test_rainflow_vs_dirlik_on_synthesized_gaussian():
    """The loop closed: PSD -> Gaussian sample path -> rainflow damage
    matches the Dirlik rate (finite-sample scatter bounded by averaging
    seeds; m = 3 damage variance is large)."""
    om = np.linspace(5.0, 15.0, 801)
    psd = 4.0 * np.exp(-0.5 * ((om - 10.0) / 0.8) ** 2)
    m0, m1, m2, m4 = spectral_moments(om, psd)
    dk = dirlik_damage_rate(m0, m1, m2, m4, 3.0, 1e6)
    t_end, dt = 400.0, 0.02
    rates = []
    for seed in range(3):
        x = synthesize_gaussian_history(om, psd, dt, int(t_end / dt),
                                        seed=seed)
        rates.append(rainflow_damage(x, t_end, 3.0, 1e6)[0])
    np.testing.assert_allclose(np.mean(rates), dk, rtol=0.25)


def test_synthesis_reproduces_variance():
    om = np.linspace(5.0, 15.0, 801)
    psd = 4.0 * np.exp(-0.5 * ((om - 10.0) / 0.8) ** 2)
    m0 = spectral_moments(om, psd)[0]
    x = synthesize_gaussian_history(om, psd, 0.02, 40000, seed=7)
    np.testing.assert_allclose(x.var(), m0, rtol=0.1)


def test_davenport_peak_factor():
    n = 1000.0
    g = davenport_peak_factor(1.0, n)
    root = math.sqrt(2 * math.log(n))
    np.testing.assert_allclose(g, root + 0.5772156649 / root, rtol=1e-6)
    # Monotone in duration; clamped (finite) for absurdly short records.
    assert davenport_peak_factor(1.0, 1e6) > g
    assert np.isfinite(davenport_peak_factor(1.0, 1e-3))


def test_spectral_fatigue_validation():
    om = np.linspace(0.1, 10.0, 101)
    with pytest.raises(ValueError, match="method"):
        spectral_fatigue(om, np.ones_like(om), 3.0, 1.0, method="welch")
    with pytest.raises(ValueError, match="variance"):
        spectral_fatigue(om, np.zeros_like(om), 3.0, 1.0)
    with pytest.raises(ValueError, match="both"):
        spectral_fatigue(om, np.ones_like(om), 3.0, None)
    # Statistics-only: no S-N curve, no damage fields.
    sf = spectral_fatigue(om, np.ones_like(om))
    assert sf.damage_rate is None and sf.life is None
    assert sf.nu0 > 0


# ------------------------------------------------------------ JSON tiers

def test_random_block_fatigue_e2e():
    """The random block's fatigue output equals spectral_fatigue run on
    its own stress PSDs (area = 1 here, so stress = force), and the
    narrow-band method reports a HIGHER damage rate than Dirlik."""
    p = sdof_bar(young=4.0, density=2.0)
    w0 = np.sqrt(4.0 / 1.0)
    om = np.concatenate([np.linspace(1e-3, 3 * w0, 1500),
                         np.linspace(3 * w0, 30 * w0, 1500)[1:]])
    base = {"type": "random", "psd": 0.37, "omegas": om.tolist(),
            "damping": [0.5, 0.0], "probe_dofs": [1],
            "probe_elements": [0]}
    sn = {"exponent": 3.0, "coefficient": 1e6}
    out = run_analysis(p, {**base, "fatigue": {"sn": sn,
                                               "duration": 3600.0}})
    f = out["fatigue"]
    sf = spectral_fatigue(np.asarray(out["omegas"]),
                          np.asarray(out["force_psd"]),
                          3.0, 1e6, method="dirlik", duration=3600.0)
    np.testing.assert_allclose(f["damage_rate"], sf.damage_rate,
                               rtol=1e-12)
    np.testing.assert_allclose(f["stress_rms"], out["force_rms"],
                               rtol=1e-12)
    np.testing.assert_allclose(f["expected_peak_stress"],
                               sf.expected_peak, rtol=1e-12)
    out_nb = run_analysis(p, {**base, "fatigue": {"sn": sn,
                                                  "method": "narrowband"}})
    sf_nb = spectral_fatigue(np.asarray(out["omegas"]),
                             np.asarray(out["force_psd"]),
                             3.0, 1e6, method="narrowband")
    np.testing.assert_allclose(out_nb["fatigue"]["damage_rate"],
                               sf_nb.damage_rate, rtol=1e-12)
    assert out_nb["fatigue"]["method"] == "narrowband"
    assert "peak_factor" not in out_nb["fatigue"]   # no duration given
    # nu_0 lands on the natural frequency (the SDOF closed form).
    np.testing.assert_allclose(f["nu0_hz"][0], w0 / (2 * np.pi),
                               rtol=2e-2)


def test_random_block_fatigue_needs_probe_elements():
    p = sdof_bar()
    with pytest.raises(ValueError, match="probe_elements"):
        run_analysis(p, {"type": "random", "psd": 1.0,
                         "omegas": np.linspace(0.1, 10, 50).tolist(),
                         "damping": [0.5, 0.0], "probe_dofs": [1],
                         "fatigue": {"sn": {"exponent": 3,
                                            "coefficient": 1e6}}})
    with pytest.raises(ValueError, match="sn"):
        run_analysis(p, {"type": "random", "psd": 1.0,
                         "omegas": np.linspace(0.1, 10, 50).tolist(),
                         "damping": [0.5, 0.0], "probe_dofs": [1],
                         "probe_elements": [0], "fatigue": {"sn": {}}})


def test_random_block_fatigue_statistics_only():
    """Without an S-N curve the fatigue key returns the statistical
    summary (no material constants needed — what a UI shows by
    default); damage keys are absent."""
    p = sdof_bar()
    out = run_analysis(p, {"type": "random", "psd": 1.0,
                           "omegas": np.linspace(0.1, 10, 400).tolist(),
                           "damping": [0.5, 0.0], "probe_dofs": [1],
                           "probe_elements": [0],
                           "fatigue": {"duration": 600.0}})
    f = out["fatigue"]
    assert "damage_rate" not in f and "sn" not in f
    np.testing.assert_allclose(f["stress_rms"], out["force_rms"],
                               rtol=1e-12)
    assert f["nu0_hz"][0] > 0 and 0 < f["alpha2"][0] <= 1
    assert f["expected_peak_stress"][0] > 2 * f["stress_rms"][0]


def test_transient_force_histories_quasi_static():
    """Far below resonance the member force tracks the static value:
    N(t) ~= amplitude(t) * N_static — and rainflow damage is the exact
    sinusoid closed form on that force."""
    p = sdof_bar(young=4.0, density=2.0)    # w0 = 2 rad/s
    f_load = 0.01                            # 0.0628 rad/s << w0
    dt, n_steps = 0.5, 4000                  # 10 load cycles per run
    t = np.arange(n_steps) * dt
    amp = np.sin(2 * np.pi * f_load * t)
    out = run_analysis(p, {
        "type": "transient", "dt": dt, "n_steps": n_steps,
        "method": "newmark", "damping": [0.5, 0.0],
        "amplitude": amp.tolist(), "probe_dofs": [1],
        "probe_elements": [0],
        "fatigue": {"sn": {"exponent": 3.0, "coefficient": 1e6}}})
    n_hist = np.asarray(out["force_histories"])[:, 0]
    assert n_hist.shape == (n_steps,)
    # Static tip force under unit load is the load itself (determinate);
    # recorded snapshots live at the SOLVER's times (first record is the
    # state after step 1), so evaluate the load there.
    t_rec = np.asarray(out["times"])
    tail = slice(n_steps // 2, None)         # past the start-up transient
    np.testing.assert_allclose(
        n_hist[tail], np.sin(2 * np.pi * f_load * t_rec)[tail], atol=0.02)
    fat = out["fatigue"]
    np.testing.assert_allclose(fat["damage_rate"][0],
                               f_load * 1.0 ** 3 / 1e6, rtol=0.1)
    # The user's displacement probe is untouched by the internal
    # element-DOF recording (sliced back out).
    out_plain = run_analysis(p, {
        "type": "transient", "dt": dt, "n_steps": n_steps,
        "method": "newmark", "damping": [0.5, 0.0],
        "amplitude": amp.tolist(), "probe_dofs": [1]})
    np.testing.assert_allclose(out["displacements"],
                               out_plain["displacements"], rtol=1e-12)


def test_transient_force_history_payload_policy():
    """The JSON guard protects the payload, not the compute: a long
    full-rate record + fatigue auto-drops the serialized histories (the
    summary survives); without fatigue it refuses with guidance;
    explicit include_force_histories is trusted either way."""
    p = sdof_bar()
    big = {"type": "transient", "dt": 0.01, "n_steps": 20000,
           "method": "newmark", "damping": [0.5, 0.0],
           "amplitude": {"type": "sine", "frequency_hz": 0.16},
           "probe_dofs": [1], "probe_elements": [0]}
    sn = {"sn": {"exponent": 3.0, "coefficient": 1e6}}
    out = run_analysis(p, {**big, "fatigue": sn})
    assert "force_histories" not in out        # auto-dropped (too big)
    assert out["fatigue"]["cycle_count"][0] > 0
    with pytest.raises(ValueError, match="fatigue.*block|serializes"):
        run_analysis(p, big)                   # no fatigue, no point
    out2 = run_analysis(p, {**big, "include_force_histories": True,
                            "fatigue": sn})    # explicit: trusted
    assert len(out2["force_histories"]) == 20000
    out3 = run_analysis(p, {**big, "n_steps": 100,
                            "include_force_histories": False})
    assert "force_histories" not in out3 and "fatigue" not in out3


def test_transient_fatigue_validation():
    p = sdof_bar()
    base = {"type": "transient", "dt": 0.01, "n_steps": 16,
            "method": "newmark", "probe_dofs": [1]}
    with pytest.raises(ValueError, match="rainflow"):
        run_analysis(p, {**base, "probe_elements": [0],
                         "fatigue": {"sn": {"exponent": 3,
                                            "coefficient": 1e6},
                                     "method": "dirlik"}})
    with pytest.raises(ValueError, match="ensemble|single-run"):
        run_analysis(p, {**base, "probe_elements": [0],
                         "amplitudes": [[1.0] * 16, [2.0] * 16]})


def test_transient_force_history_geometric_nonlinear():
    """The Green-Lagrange quadratic term is included for nonlinear runs:
    a 2D bar displaced transversely (zero linear elongation) still
    reports the second-order tension EA * d^2 / (2 L^2)."""
    prob = TrussProblem(
        nodes=np.array([[0.0, 0.0], [1.0, 0.0]]),
        elements=np.array([[0, 1]]),
        material=Material(young=100.0, area=1.0, density=1.0),
        loads=np.array([0.0, 0.0, 0.0, 1.0]),
        fixed_dofs=np.array([0, 1, 2]), dimension=2)
    out = run_analysis(prob, {
        "type": "transient", "dt": 0.002, "n_steps": 50,
        "method": "newmark", "geometric_nonlinear": True,
        "amplitude": [1.0] * 50, "probe_dofs": [3],
        "probe_elements": [0]})
    v = np.asarray(out["displacements"])[:, 0]
    n_hist = np.asarray(out["force_histories"])[:, 0]
    np.testing.assert_allclose(n_hist, 100.0 * v ** 2 / 2.0,
                               rtol=1e-8, atol=1e-12)


def test_first_passage_vs_sample_paths():
    """Rice/Poisson first-passage against brute-force counting on
    synthesized Gaussian sample paths: a band-limited PSD, |x| barrier
    at 2.5 sigma, duration chosen for pf ~ 0.2.  The Poisson model is
    asymptotically exact for rare independent crossings and
    conservative for clumped (narrow-band) ones — so assert agreement
    within the binomial band PLUS a one-sided conservative allowance."""
    from pinn_fem_tpu.solvers.fatigue import (first_passage_probability,
                                              synthesize_gaussian_history)

    om = np.linspace(0.5, 12.0, 240)
    psd = 1.0 / (1.0 + ((om - 5.0) / 2.5) ** 4)     # broad hump
    m0, = spectral_moments(om, psd, orders=(0,))
    sigma = math.sqrt(float(m0))
    b = 2.5 * sigma
    T = 40.0
    dt = 0.01
    n_steps = int(T / dt)
    nu_b, pf = first_passage_probability(om, psd, b, T)
    hits = 0
    n_paths = 300
    for seed in range(n_paths):
        x = synthesize_gaussian_history(om, psd, dt, n_steps, seed=seed)
        hits += bool(np.any(np.abs(x) >= b))
    pf_mc = hits / n_paths
    se = math.sqrt(max(pf_mc * (1 - pf_mc), 1e-6) / n_paths)
    # Poisson >= truth (conservative) up to sampling noise; and not
    # absurdly conservative at this bandwidth (within 40%).
    assert pf >= pf_mc - 3.0 * se
    assert pf <= pf_mc * 1.4 + 3.0 * se
    # Rate sanity: nu(b) < nu0 and the one-sided rate is half.
    nu1, _ = first_passage_probability(om, psd, b, T, two_sided=False)
    np.testing.assert_allclose(nu1, nu_b / 2.0, rtol=1e-12)


def test_first_passage_validation_and_api():
    from pinn_fem_tpu.solvers.fatigue import first_passage_probability

    om = np.linspace(0.5, 12.0, 60)
    psd = np.ones_like(om)
    with pytest.raises(ValueError, match="barrier"):
        first_passage_probability(om, psd, -1.0, 10.0)
    with pytest.raises(ValueError, match="duration"):
        first_passage_probability(om, psd, 1.0, 0.0)
    with pytest.raises(ValueError, match="variance"):
        first_passage_probability(om, np.zeros_like(om), 1.0, 10.0)

    # JSON tier: the first_passage block rides the random analysis.
    nodes = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]
    elements = [[0, 2], [1, 3], [2, 3], [1, 2], [0, 3]]
    loads = np.zeros(8)
    loads[4] = 1.0
    p = TrussProblem(np.asarray(nodes, dtype=float),
                     np.asarray(elements, dtype=int),
                     Material(young=200.0, area=1.0, density=1.0),
                     loads, np.array([0, 1, 2, 3]), 2)
    out = run_analysis(p, {
        "type": "random", "psd": 0.01,
        "omegas": {"start": 1.0, "stop": 40.0, "num": 200},
        "damping": [0.3, 0.002], "probe_nodes": [2],
        "first_passage": {"barrier": 0.01, "duration": 3600.0}})
    fp = out["first_passage"]
    assert len(fp["pf"]) == 2 and len(fp["crossing_rate_hz"]) == 2
    assert all(0.0 <= v <= 1.0 for v in fp["pf"])
    assert fp["two_sided"] is True
    # Independent recompute from the returned PSD.
    from pinn_fem_tpu.solvers.fatigue import first_passage_probability \
        as fpp

    nu, pf2 = fpp(np.asarray(out["omegas"]),
                  np.asarray(out["psd"], dtype=float), 0.01, 3600.0)
    np.testing.assert_allclose(fp["pf"], pf2, rtol=1e-9)
    with pytest.raises(ValueError, match="first_passage"):
        run_analysis(p, {
            "type": "random", "psd": 0.01,
            "omegas": {"start": 1.0, "stop": 40.0, "num": 50},
            "damping": [0.3, 0.002], "probe_nodes": [2],
            "first_passage": {"barrier": 0.01}})
