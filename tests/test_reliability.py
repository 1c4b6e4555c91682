"""FORM reliability: solvers/reliability.py.

Validation strategy: EXACT closed forms where the limit-state surface
is linear in the standard normals (determinate trusses make member
force ∝ load scale, so normal R-S and lognormal R/S both have textbook
β), crude Monte Carlo on the same traced response as the ground truth
for the nonlinear/indeterminate cases, and contract checks through the
JSON tier.
"""

import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.reliability import form_reliability
from pinn_fem_tpu.solvers.sizing import _host_area_solve


def two_bar():
    """Symmetric determinate 2-bar, unit downward tip load: each member
    carries |N| = 1/sqrt(2) regardless of areas."""
    nodes = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 1.0]])
    elements = np.array([[0, 2], [1, 2]])
    loads = np.array([0.0, 0.0, 0.0, 0.0, 0.0, -1.0])
    return TrussProblem(nodes, elements,
                        Material(young=1.0, area=1.0, density=1.0),
                        loads, np.arange(4), 2)


def three_bar():
    nodes = np.array([[-1.0, 1.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]])
    elements = np.array([[0, 3], [1, 3], [2, 3]])
    loads = np.zeros(8)
    loads[6], loads[7] = 0.6, -1.0
    return TrussProblem(nodes, elements,
                        Material(young=1.0, area=1.0, density=1.0),
                        loads, np.arange(6), 2)


def test_form_normal_rs_closed_form():
    """Determinate member: sigma = c*S exactly, so normal R vs normal S
    has beta = (mu_R - c mu_S)/sqrt(s_R^2 + c^2 s_S^2) EXACTLY (FORM is
    invariant to the g-parameterization of the same surface)."""
    p = two_bar()
    _, sig = _host_area_solve(p, np.ones(2))
    c = abs(sig[0])
    muR, sR, muS, sS = 2.0, 0.2, 1.0, 0.25
    res = form_reliability(
        p,
        variables=[{"name": "S", "kind": "load_scale",
                    "distribution": "normal", "mean": muS, "std": sS},
                   {"name": "R", "kind": "resistance",
                    "distribution": "normal", "mean": muR, "std": sR}],
        limit_state={"type": "stress", "variable": "R",
                     "elements": [0]})
    beta_exact = (muR - c * muS) / np.hypot(sR, c * sS)
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-5)
    assert res.converged[0]
    # alpha points the failure direction: load UP (positive u_S), R
    # DOWN (negative u_R).
    assert res.alpha[0, 0] > 0 > res.alpha[0, 1]
    np.testing.assert_allclose(np.linalg.norm(res.alpha[0]), 1.0,
                               rtol=1e-6)
    # The MPP sits on the surface in physical space: |sigma(x*)| = R*.
    s_star, r_star = res.design_point[0]
    np.testing.assert_allclose(c * s_star, r_star, rtol=1e-4)


def test_form_lognormal_rs_closed_form():
    """Lognormal R / lognormal S: ln R - ln(cS) is linear in the
    standard normals, so beta = (lam_R - lam_S - ln c)/
    sqrt(zeta_R^2 + zeta_S^2) exactly."""
    import math

    p = two_bar()
    _, sig = _host_area_solve(p, np.ones(2))
    c = abs(sig[0])
    muR, dR, muS, dS = 2.0, 0.1, 1.0, 0.2
    zR = math.sqrt(math.log1p(dR * dR))
    lR = math.log(muR) - zR * zR / 2.0
    zS = math.sqrt(math.log1p(dS * dS))
    lS = math.log(muS) - zS * zS / 2.0
    beta_exact = (lR - lS - math.log(c)) / math.hypot(zR, zS)
    res = form_reliability(
        p,
        variables=[{"name": "S", "kind": "load_scale",
                    "distribution": "lognormal", "mean": muS,
                    "cov": dS},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": muR,
                    "cov": dR}],
        limit_state={"type": "stress", "variable": "R",
                     "elements": [0]})
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-5)


def test_form_monte_carlo_cross_check():
    """Indeterminate 3-bar with random E field + load + resistance:
    FORM's system bounds against 40000-sample crude MC on the same
    traced response (pf ~ 2e-2 keeps the MC standard error at 7e-4)."""
    p = three_bar()
    res = form_reliability(
        p,
        variables=[{"name": "E", "kind": "young",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.15},
                   {"name": "S", "kind": "load_scale",
                    "distribution": "normal", "mean": 1.0,
                    "std": 0.25},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": 1.15,
                    "cov": 0.1}],
        limit_state={"type": "stress", "variable": "R"},
        mc_samples=40000, mc_seed=7)
    assert np.all(res.converged)
    lo, hi = res.system_pf_lower, res.system_pf_upper
    assert 1e-4 < lo <= hi < 0.5
    # FORM linearization error + 3-sigma MC noise.
    band = 3.0 * res.mc_std_error
    assert 0.6 * lo - band <= res.mc_pf <= 1.4 * hi + band
    # Per-limit-state: FORM pf within 30% + noise of its MC estimate
    # for the dominant mode.
    worst = int(np.argmin(res.beta))
    pf_mc = res.mc_pf_per_ls[worst]
    assert abs(res.pf[worst] - pf_mc) < 0.3 * max(pf_mc, 1e-3) + band


def test_form_displacement_limit_state():
    """Displacement limit state on the 3-bar tip: beta must match the
    equivalent hand-built scalar reliability (u_tip is proportional to
    S/E when only those two are random — exact lognormal/lognormal
    closed form again)."""
    import math

    p = three_bar()
    u0, _ = _host_area_solve(p, np.ones(3))
    u_tip = abs(u0[7])                      # tip y DOF at mean
    limit = 2.0 * u_tip
    dE, dS = 0.1, 0.2
    # u = u0 * S / E: ln u linear in ln S, ln E.
    zE = math.sqrt(math.log1p(dE * dE))
    lE = math.log(1.0) - zE * zE / 2.0
    zS = math.sqrt(math.log1p(dS * dS))
    lS = math.log(1.0) - zS * zS / 2.0
    beta_exact = ((math.log(limit) - math.log(u_tip)) - lS + lE) \
        / math.hypot(zE, zS)
    res = form_reliability(
        p,
        variables=[{"name": "E", "kind": "young",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": dE},
                   {"name": "S", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": dS}],
        limit_state={"type": "displacement", "limit": limit,
                     "probe_dofs": [7]})
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-4)


def test_reliability_validation():
    p = two_bar()
    S = {"name": "S", "kind": "load_scale", "distribution": "normal",
         "mean": 1.0, "std": 0.2}
    ls = {"type": "stress", "limit": 2.0}
    with pytest.raises(ValueError, match="random"):
        form_reliability(p, [], ls)
    with pytest.raises(ValueError, match="unique"):
        form_reliability(p, [S, dict(S)], ls)
    with pytest.raises(ValueError, match="kind"):
        form_reliability(p, [{**S, "kind": "nope"}], ls)
    with pytest.raises(ValueError, match="distribution"):
        form_reliability(p, [{**S, "distribution": "uniform"}], ls)
    with pytest.raises(ValueError, match="std"):
        form_reliability(p, [{"name": "S", "kind": "load_scale",
                              "mean": 1.0}], ls)
    with pytest.raises(ValueError, match="positive"):
        form_reliability(p, [{**S, "std": -1.0}], ls)
    with pytest.raises(ValueError, match="limit"):
        form_reliability(p, [S], {"type": "stress"})
    with pytest.raises(ValueError, match="resistance"):
        form_reliability(p, [S], {"type": "stress", "variable": "S"})
    with pytest.raises(ValueError, match="not defined"):
        form_reliability(p, [S], {"type": "stress", "variable": "X"})
    with pytest.raises(ValueError, match="probe_dofs"):
        form_reliability(p, [S], {"type": "displacement",
                                  "limit": 0.5})


def test_reliability_json_tier():
    """The "reliability" block through run_analysis: probe_nodes
    resolution, output keys, and the dispatch registration."""
    from pinn_fem_tpu.io.analysis import run_analysis

    p = three_bar()
    out = run_analysis(p, {
        "type": "reliability",
        "variables": [
            {"name": "E", "kind": "young", "distribution": "lognormal",
             "mean": 1.0, "cov": 0.1},
            {"name": "S", "kind": "load_scale",
             "distribution": "lognormal", "mean": 1.0, "cov": 0.2}],
        "limit_state": {"type": "displacement", "limit": 5.0,
                        "probe_nodes": [3]}})
    assert out["success"] and out["analysis"] == "reliability"
    assert len(out["beta"]) == 2                 # node 3: x and y DOFs
    assert out["labels"] == ["displacement dof6", "displacement dof7"]
    assert all(out["converged"])
    assert out["beta_min"] == min(out["beta"])
    lo, hi = out["system_pf_bounds"]
    assert 0 <= lo <= hi <= 1
    assert np.asarray(out["alpha_correlation"]).shape == (2, 2)
    assert "mc" not in out                       # not requested


def test_form_fatigue_lognormal_closed_form():
    """Fatigue limit state: D = D0 S^m / C for lognormal load scale S
    and Basquin C, so ln r is LINEAR in the standard normals and
    beta = (-(1/m) ln(D0 T) - lam_S + lam_C/m) / sqrt(z_S^2 + z_C^2/m^2)
    EXACTLY, with D0 the deterministic damage rate at S = C = 1 — the
    whole traced chain (FRF sweep -> stress PSD -> Dirlik) sits inside
    g and must still land on the closed form."""
    import math

    import jax
    import jax.numpy as jnp

    from pinn_fem_tpu.solvers.fatigue import spectral_fatigue
    from pinn_fem_tpu.solvers.sizing import member_force_frf_sq

    p = three_bar()
    om = np.linspace(0.05, 6.0, 120)
    S0, mexp, T = 1e-3, 3.0, 1e4
    damp = (0.3, 1e-3)
    data = p.to_device()
    dt = data.loads.dtype
    h2 = np.asarray(jax.device_get(member_force_frf_sq(
        data, 1.0, jnp.ones(3, dt), 1.0, jnp.asarray(om, dt), *damp)))
    d0 = spectral_fatigue(om, h2 * S0, mexp, 1.0,
                          method="dirlik").damage_rate
    crit = int(np.argmax(d0))
    muS, dS, muC, dC = 1.0, 0.2, 1.2, 0.3
    zS = math.sqrt(math.log1p(dS * dS))
    lS = math.log(muS) - zS * zS / 2.0
    zC = math.sqrt(math.log1p(dC * dC))
    lC = math.log(muC) - zC * zC / 2.0
    beta_exact = (-(1.0 / mexp) * math.log(d0[crit] * T) - lS
                  + lC / mexp) / math.hypot(zS, zC / mexp)
    res = form_reliability(
        p,
        variables=[{"name": "S", "kind": "load_scale",
                    "distribution": "lognormal", "mean": muS,
                    "cov": dS},
                   {"name": "C", "kind": "resistance",
                    "distribution": "lognormal", "mean": muC,
                    "cov": dC}],
        limit_state={"type": "fatigue", "variable": "C",
                     "min_life_s": T,
                     "fatigue": {"psd": S0, "omegas": om,
                                 "damping": list(damp),
                                 "sn": {"exponent": mexp}}},
        mc_samples=4000, mc_seed=5)
    assert res.labels[crit] == f"fatigue e{crit}"
    np.testing.assert_allclose(res.beta[crit], beta_exact, rtol=1e-4)
    assert np.all(res.converged)
    # MC agreement at a beta ~ 2 level: 3-sigma band around the FORM
    # system bounds (the limit states are strongly correlated through
    # S and C, so pf_sys ~ pf_max).
    band = 3.0 * res.mc_std_error
    assert res.system_pf_lower - band <= res.mc_pf \
        <= 1.5 * res.system_pf_upper + band


def test_form_fatigue_validation_and_json_tier():
    from pinn_fem_tpu.io.analysis import run_analysis

    p = three_bar()
    om = {"start": 0.05, "stop": 6.0, "num": 60}
    S = {"name": "S", "kind": "load_scale", "distribution": "lognormal",
         "mean": 1.0, "cov": 0.2}
    base_ls = {"type": "fatigue", "min_life_s": 1e4,
               "fatigue": {"psd": 1e-3, "omegas": np.linspace(
                   0.05, 6.0, 60), "damping": [0.3, 1e-3],
                   "sn": {"exponent": 3.0, "coefficient": 14.5}}}
    with pytest.raises(ValueError, match="min_life_s"):
        form_reliability(p, [S], {**base_ls, "min_life_s": None})
    with pytest.raises(ValueError, match="exponent"):
        form_reliability(p, [S], {**base_ls, "fatigue": {
            **base_ls["fatigue"], "sn": {}}})
    with pytest.raises(ValueError, match="coefficient"):
        form_reliability(p, [S], {**base_ls, "fatigue": {
            **base_ls["fatigue"], "sn": {"exponent": 3.0}}})
    with pytest.raises(ValueError, match="omegas"):
        form_reliability(p, [S], {**base_ls, "fatigue": {
            **base_ls["fatigue"], "omegas": [1.0]}})
    # JSON tier: omegas spec dict + min_life_hours convenience.
    out = run_analysis(p, {
        "type": "reliability",
        "variables": [S],
        "limit_state": {"type": "fatigue", "min_life_hours": 1e4 / 3600,
                        "fatigue": {"psd": 1e-3, "omegas": om,
                                    "damping": [0.3, 1e-3],
                                    "sn": {"exponent": 3.0,
                                           "coefficient": 14.5}},
                        "elements": [1]}})
    assert out["success"]
    assert out["labels"] == ["fatigue e1"]
    assert out["converged"] == [True]
    assert 0.5 < out["beta"][0] < 10.0


def test_sorm_linear_noop_and_importance_sampling_small_pf():
    """On a surface LINEAR in u (normal R-S), the Breitung factor is
    exactly 1 (SORM == FORM), and importance sampling centered on the
    MPP recovers pf = Phi(-beta) ~ 6.4e-7 from 4000 samples — a
    probability crude MC cannot see below ~10^7 samples."""
    from pinn_fem_tpu.solvers.reliability import _norm_cdf

    p = two_bar()
    _, sig = _host_area_solve(p, np.ones(2))
    c = abs(sig[0])
    muR, sR, muS, sS = 2.0, 0.2, 1.0, 0.25
    res = form_reliability(
        p,
        variables=[{"name": "S", "kind": "load_scale",
                    "distribution": "normal", "mean": muS, "std": sS},
                   {"name": "R", "kind": "resistance",
                    "distribution": "normal", "mean": muR, "std": sR}],
        limit_state={"type": "stress", "variable": "R",
                     "elements": [0]},
        sorm=True, mc_samples=4000, mc_method="importance", mc_seed=2)
    np.testing.assert_allclose(res.pf_sorm[0], res.pf[0], rtol=1e-4)
    pf_exact = float(_norm_cdf(-(muR - c * muS) / np.hypot(sR, c * sS)))
    assert res.mc_method == "importance"
    # 5-sigma IS band around the exact answer, and the IS error bar
    # itself must be tight (< 10% of pf at 4000 samples).
    assert abs(res.mc_pf - pf_exact) <= 5.0 * res.mc_std_error
    assert res.mc_std_error < 0.1 * pf_exact


def test_sorm_improves_on_curved_surface():
    """3-bar with a NORMAL load scale (the surface is curved in u):
    SORM must land closer to the 100k-sample crude-MC ground truth
    than FORM on the dominant limit state (measured: FORM err 9.9e-4,
    SORM err 2.4e-4)."""
    res = form_reliability(
        three_bar(),
        variables=[{"name": "E", "kind": "young",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.15},
                   {"name": "S", "kind": "load_scale",
                    "distribution": "normal", "mean": 1.0,
                    "std": 0.25},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": 1.15,
                    "cov": 0.1}],
        limit_state={"type": "stress", "variable": "R"},
        sorm=True, mc_samples=100000, mc_seed=9)
    worst = int(np.argmin(res.beta))
    pf_mc = res.mc_pf_per_ls[worst]
    err_form = abs(res.pf[worst] - pf_mc)
    err_sorm = abs(res.pf_sorm[worst] - pf_mc)
    assert err_sorm < 0.6 * err_form
    # The correction is in the physically right direction here (the
    # failure set is convex-ish: SORM < FORM) and modest (< 10%).
    assert 0.9 * res.pf[worst] < res.pf_sorm[worst] < res.pf[worst]


def test_importance_vs_crude_agreement():
    """IS and crude MC estimate the same number at beta ~ 2 (both
    visible): agreement within combined 4-sigma."""
    variables = [{"name": "S", "kind": "load_scale",
                  "distribution": "lognormal", "mean": 1.0, "cov": 0.25},
                 {"name": "R", "kind": "resistance",
                  "distribution": "lognormal", "mean": 1.3, "cov": 0.1}]
    ls = {"type": "stress", "variable": "R"}
    crude = form_reliability(three_bar(), variables, ls,
                             mc_samples=40000, mc_seed=3)
    imp = form_reliability(three_bar(), variables, ls,
                           mc_samples=4000, mc_method="importance",
                           mc_seed=4)
    tol = 4.0 * np.hypot(crude.mc_std_error, imp.mc_std_error)
    assert abs(crude.mc_pf - imp.mc_pf) <= tol
    # Variance reduction: IS at 1/10th the samples is at least as
    # tight as crude.
    assert imp.mc_std_error <= crude.mc_std_error * 1.5


def test_sorm_and_is_json_tier():
    from pinn_fem_tpu.io.analysis import run_analysis

    p = two_bar()
    out = run_analysis(p, {
        "type": "reliability",
        "variables": [
            {"name": "S", "kind": "load_scale",
             "distribution": "normal", "mean": 1.0, "std": 0.25},
            {"name": "R", "kind": "resistance",
             "distribution": "normal", "mean": 2.0, "std": 0.2}],
        "limit_state": {"type": "stress", "variable": "R"},
        "sorm": True, "validate_mc": 2000,
        "mc_method": "importance", "seed": 1})
    assert out["success"]
    assert len(out["pf_sorm"]) == 2
    lo, hi = out["system_pf_sorm_bounds"]
    assert 0 <= lo <= hi <= 1
    assert out["mc"]["method"] == "importance"
    with pytest.raises(ValueError, match="mc_method"):
        form_reliability(p, [{"name": "S", "kind": "load_scale",
                              "distribution": "normal", "mean": 1.0,
                              "std": 0.25}],
                         {"type": "stress", "limit": 2.0},
                         mc_samples=10, mc_method="quasi")


def test_nataf_correlated_closed_forms():
    """Nataf dependence model, exact anchors: (a) correlated normal
    R-S has Var[M] = s_R^2 + c^2 s_S^2 - 2 rho c s_R s_S; (b)
    correlated lognormal R/S stays log-linear with the CLOSED-FORM
    Gaussian-space rho_z = ln(1 + rho dR dS)/(zR zS); (c) rho = 0
    reproduces the independent result exactly."""
    import math

    p = two_bar()
    _, sig = _host_area_solve(p, np.ones(2))
    c = abs(sig[0])
    muR, sR, muS, sS, rho = 2.0, 0.2, 1.0, 0.25, 0.5
    vs_n = [{"name": "S", "kind": "load_scale",
             "distribution": "normal", "mean": muS, "std": sS},
            {"name": "R", "kind": "resistance",
             "distribution": "normal", "mean": muR, "std": sR}]
    ls = {"type": "stress", "variable": "R", "elements": [0]}
    res = form_reliability(p, vs_n, ls,
                           correlation=[["S", "R", rho]])
    var_m = sR ** 2 + (c * sS) ** 2 - 2.0 * rho * c * sR * sS
    beta_exact = (muR - c * muS) / math.sqrt(var_m)
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-5)
    # Positive R-S correlation REDUCES risk: beta above independent.
    res0 = form_reliability(p, vs_n, ls)
    assert res.beta[0] > res0.beta[0]

    dR, dS = 0.1, 0.2
    vs_ln = [{"name": "S", "kind": "load_scale",
              "distribution": "lognormal", "mean": muS, "cov": dS},
             {"name": "R", "kind": "resistance",
              "distribution": "lognormal", "mean": muR, "cov": dR}]
    zR = math.sqrt(math.log1p(dR * dR))
    lR = math.log(muR) - zR * zR / 2.0
    zS = math.sqrt(math.log1p(dS * dS))
    lS = math.log(muS) - zS * zS / 2.0
    rho_z = math.log1p(rho * dR * dS) / (zR * zS)
    beta_ln = (lR - lS - math.log(c)) / math.sqrt(
        zR * zR + zS * zS - 2.0 * rho_z * zR * zS)
    res_ln = form_reliability(p, vs_ln, ls,
                              correlation=[["S", "R", rho]])
    np.testing.assert_allclose(res_ln.beta[0], beta_ln, rtol=1e-5)
    # rho = 0 == independent.
    r_zero = form_reliability(p, vs_ln, ls,
                              correlation=[["S", "R", 0.0]])
    r_ind = form_reliability(p, vs_ln, ls)
    np.testing.assert_allclose(r_zero.beta[0], r_ind.beta[0],
                               rtol=1e-6)


def test_nataf_monte_carlo_consistency():
    """Correlated 3-bar at beta ~ 2: FORM bounds vs crude MC through
    the SAME z = L·u model (dependence reaches the sampler through the
    one shared transform)."""
    res = form_reliability(
        three_bar(),
        variables=[{"name": "S", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.25},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": 1.35,
                    "cov": 0.12}],
        limit_state={"type": "stress", "variable": "R"},
        correlation=[["S", "R", -0.4]],     # adverse: amplifies risk
        mc_samples=40000, mc_seed=11)
    assert np.all(res.converged)
    band = 3.0 * res.mc_std_error
    assert 0.6 * res.system_pf_lower - band <= res.mc_pf \
        <= 1.4 * res.system_pf_upper + band


def test_nataf_validation():
    p = two_bar()
    vs = [{"name": "S", "kind": "load_scale", "distribution": "normal",
           "mean": 1.0, "std": 0.25},
          {"name": "R", "kind": "resistance", "distribution": "normal",
           "mean": 2.0, "std": 0.2}]
    ls = {"type": "stress", "variable": "R"}
    with pytest.raises(ValueError, match="pair"):
        form_reliability(p, vs, ls, correlation=[["S", "X", 0.3]])
    with pytest.raises(ValueError, match="pair"):
        form_reliability(p, vs, ls, correlation=[["S", "S", 0.3]])
    with pytest.raises(ValueError, match=r"\(-1, 1\)"):
        form_reliability(p, vs, ls, correlation=[["S", "R", 1.0]])
    with pytest.raises(ValueError, match="name_i"):
        form_reliability(p, vs, ls, correlation=[["S", 0.3]])


def test_output_is_strict_json_with_infinite_betas():
    """Review regression: a result whose limit states are unreachable
    (zero-force member) must serialize as STRICT JSON — json.dump's
    NaN/Infinity tokens would break JSON.parse in the Node backend and
    both browser UIs."""
    import json

    from pinn_fem_tpu.io.analysis import run_analysis

    # Vertical 2-bar where the diagonal is zero-force: its stress limit
    # state is unreachable -> beta = inf end to end.
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    elements = np.array([[0, 2], [1, 2]])
    loads = np.array([0.0, 0.0, 0.0, 0.0, 0.0, -1.0])
    p = TrussProblem(nodes, elements, Material(1.0, 1.0, 1.0),
                     loads, np.arange(4), 2)
    out = run_analysis(p, {
        "type": "reliability",
        "variables": [
            {"name": "S", "kind": "load_scale",
             "distribution": "normal", "mean": 1.0, "std": 0.2},
            {"name": "R", "kind": "resistance",
             "distribution": "lognormal", "mean": 2.0, "cov": 0.1}],
        "limit_state": {"type": "stress", "variable": "R"},
        "sorm": True})
    json.dumps(out, allow_nan=False)        # raises on NaN/Infinity
    assert out["beta"][0] is None           # unreachable -> null
    assert out["pf"][0] == 0.0
    assert all(out["converged"])
    # The unreachable design point is the mean, not a NaN vector.
    assert all(np.isfinite(v) for v in out["design_points"][0])


def test_random_field_limits_and_mc():
    """Spatially correlated E field ({"field": {"correlation_length"}},
    midpoint stochastic-FEM discretization): (a) L -> inf reproduces
    the single shared-E model EXACTLY (rho -> 1); (b) L -> 0 decouples
    the elements and spatial averaging RAISES beta (displacement limit
    state: u depends on both members' E); (c) the decoupled case's
    FORM pf agrees with 40000-sample crude MC through the same
    z = L*u transform."""
    p = two_bar()
    u0, _ = _host_area_solve(p, np.ones(2))
    limit = 2.0 * abs(u0[5])
    base = {"kind": "young", "distribution": "lognormal",
            "mean": 1.0, "cov": 0.15}
    S = {"name": "S", "kind": "load_scale",
         "distribution": "lognormal", "mean": 1.0, "cov": 0.2}
    ls = {"type": "displacement", "limit": limit, "probe_dofs": [5]}
    shared = form_reliability(p, [{**base, "name": "E"}, S], ls)
    field_inf = form_reliability(
        p, [{**base, "name": "E",
             "field": {"correlation_length": 1e9}}, S], ls)
    np.testing.assert_allclose(field_inf.beta[0], shared.beta[0],
                               rtol=1e-5)
    assert field_inf.variables == ["E#e0", "E#e1", "S"]
    field_0 = form_reliability(
        p, [{**base, "name": "E",
             "field": {"correlation_length": 1e-6}}, S], ls,
        mc_samples=40000, mc_seed=13)
    assert field_0.beta[0] > shared.beta[0] + 0.2    # averaging helps
    band = 3.0 * field_0.mc_std_error
    assert abs(field_0.mc_pf - field_0.pf[0]) <= band + 0.3 * \
        field_0.pf[0]


def test_random_field_validation():
    p = two_bar()
    S = {"name": "S", "kind": "load_scale", "distribution": "normal",
         "mean": 1.0, "std": 0.2}
    ls = {"type": "stress", "limit": 2.0}
    with pytest.raises(ValueError, match="material kind"):
        form_reliability(p, [{**S, "field":
                              {"correlation_length": 1.0}}], ls)
    with pytest.raises(ValueError, match="correlation_length"):
        form_reliability(p, [{"name": "E", "kind": "young",
                              "distribution": "lognormal", "mean": 1.0,
                              "cov": 0.1, "field": {}}, S], ls)
    # A user correlation pair may not name a field variable (the name
    # no longer exists after per-element expansion).
    with pytest.raises(ValueError, match="pair"):
        form_reliability(p, [{"name": "E", "kind": "young",
                              "distribution": "lognormal", "mean": 1.0,
                              "cov": 0.1,
                              "field": {"correlation_length": 1.0}},
                             S], ls, correlation=[["E", "S", 0.3]])
    # And the sizing/RBDO path rejects field specs outright.
    from pinn_fem_tpu.solvers.sizing import optimize_sizing

    with pytest.raises(ValueError, match="reliability analysis only"):
        optimize_sizing(p, reliability={
            "variables": [{"name": "E", "kind": "young",
                           "distribution": "lognormal", "mean": 1.0,
                           "cov": 0.1,
                           "field": {"correlation_length": 1.0}}, S],
            "target_beta": 2.0,
            "limit_state": {"type": "stress", "limit": 2.0}})


def test_phi2_against_scipy_and_ditlevsen_anchors():
    """Phi2 pinned against scipy's bivariate normal; Ditlevsen bounds
    hit two exact anchors: (a) duplicated limit states (rho = 1)
    collapse both bounds onto the single-event pf; (b) the 3-bar
    system bounds are at least as tight as the simple bounds and
    contain the 40000-sample MC estimate."""
    import scipy.stats

    from pinn_fem_tpu.solvers.reliability import _phi2

    rng = np.random.default_rng(0)
    for _ in range(12):
        a, b = rng.normal(size=2) * 2.0
        rho = rng.uniform(-0.95, 0.95)
        want = scipy.stats.multivariate_normal(
            mean=[0.0, 0.0],
            cov=[[1.0, rho], [rho, 1.0]]).cdf([a, b])
        np.testing.assert_allclose(_phi2(a, b, rho), want,
                                   rtol=1e-8, atol=1e-12)

    # (a) identical events: elements [0, 0] -> rho = 1 exactly.
    p = two_bar()
    res_dup = form_reliability(
        p,
        variables=[{"name": "S", "kind": "load_scale",
                    "distribution": "normal", "mean": 1.0, "std": 0.3},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": 1.2,
                    "cov": 0.1}],
        limit_state={"type": "stress", "variable": "R",
                     "elements": [0, 0]})
    # 1e-5: the duplicated lanes' f32 HL-RF betas agree to ~1e-7 rel.
    np.testing.assert_allclose(res_dup.system_pf_ditlevsen_lower,
                               res_dup.pf[0], rtol=1e-5)
    np.testing.assert_allclose(res_dup.system_pf_ditlevsen_upper,
                               res_dup.pf[0], rtol=1e-5)

    # (b) 3-bar: tighter than simple, contains MC.
    res = form_reliability(
        three_bar(),
        variables=[{"name": "E", "kind": "young",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.15},
                   {"name": "S", "kind": "load_scale",
                    "distribution": "normal", "mean": 1.0,
                    "std": 0.25},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": 1.15,
                    "cov": 0.1}],
        limit_state={"type": "stress", "variable": "R"},
        mc_samples=40000, mc_seed=7)
    lo, hi = res.system_pf_ditlevsen_lower, res.system_pf_ditlevsen_upper
    assert res.system_pf_lower - 1e-12 <= lo <= hi \
        <= res.system_pf_upper + 1e-12
    assert (hi - lo) < (res.system_pf_upper - res.system_pf_lower)
    band = 3.0 * res.mc_std_error
    # FORM linearization bias allowance (the same slack the simple-
    # bounds check uses) + MC noise.
    assert 0.9 * lo - band <= res.mc_pf <= 1.1 * hi + band


def test_frequency_limit_state_closed_form():
    """f1 floor as a limit state: for the tip-mass bar lam1 is
    PROPORTIONAL to E (stiffness-only scatter, payload-dominated
    mass), so the surface is ln E = 2 ln(f_req/f1) and lognormal E
    gives an exact beta — through the traced generalized eigensolve."""
    import math

    from pinn_fem_tpu import modal_analysis
    from pinn_fem_tpu.io.analysis import run_analysis

    E0, L, m_tip = 1.0, 1.0, 2.0
    p = TrussProblem(np.array([0.0, L]), np.array([[0, 1]]),
                     Material(young=E0, area=0.05, density=1e-6),
                     np.array([0.0, 0.0]), np.array([0]), 1,
                     point_masses=np.array([0.0, m_tip]))
    f1 = float(modal_analysis(p, n_modes=1).frequencies[0])
    f_req = 0.8 * f1
    dE = 0.12
    zE = math.sqrt(math.log1p(dE * dE))
    lE = -zE * zE / 2.0
    beta_exact = (lE - 2.0 * math.log(0.8)) / zE
    res = form_reliability(
        p,
        variables=[{"name": "E", "kind": "young",
                    "distribution": "lognormal", "mean": E0,
                    "cov": dE}],
        limit_state={"type": "frequency", "min_frequency_hz": f_req},
        mc_samples=20000, mc_seed=3)
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-4)
    assert res.labels == [f"frequency f1>={f_req:g}Hz"]
    band = 3.0 * max(res.mc_std_error, 1e-6)
    assert abs(res.mc_pf - res.pf[0]) <= band + 0.2 * res.pf[0]
    # JSON tier + validation.
    out = run_analysis(p, {
        "type": "reliability",
        "variables": [{"name": "E", "kind": "young",
                       "distribution": "lognormal", "mean": E0,
                       "cov": dE}],
        "limit_state": {"type": "frequency",
                        "min_frequency_hz": f_req}})
    np.testing.assert_allclose(out["beta"][0], beta_exact, rtol=1e-4)
    with pytest.raises(ValueError, match="min_frequency_hz"):
        form_reliability(p, [{"name": "E", "kind": "young",
                              "distribution": "lognormal", "mean": E0,
                              "cov": dE}], {"type": "frequency"})


def test_form_works_in_3d():
    """The whole FORM machinery is dimension-agnostic: a 3D tripod
    under vertical load has symmetric leg stresses c·S, and the
    lognormal R/S closed form holds to 1e-5 — same code path, third
    dimension."""
    import math

    nodes = np.array([[1.0, 0.0, 0.0], [-0.5, 0.866, 0.0],
                      [-0.5, -0.866, 0.0], [0.0, 0.0, 1.5]])
    elements = np.array([[0, 3], [1, 3], [2, 3]])
    loads = np.zeros(12)
    loads[11] = -1.0
    p = TrussProblem(nodes, elements, Material(1.0, 1.0, 1.0), loads,
                     np.arange(9), 3)
    _, sig = _host_area_solve(p, np.ones(3))
    c = abs(sig[0])
    muR, dR, dS = 2.0 * c, 0.1, 0.2
    zR = math.sqrt(math.log1p(dR * dR))
    zS = math.sqrt(math.log1p(dS * dS))
    beta_exact = (math.log(muR / c) - zR * zR / 2 + zS * zS / 2) \
        / math.hypot(zR, zS)
    res = form_reliability(
        p,
        variables=[{"name": "S", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": dS},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": muR,
                    "cov": dR}],
        limit_state={"type": "stress", "variable": "R"})
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-5)
    # Symmetry: all three legs carry the same beta.
    np.testing.assert_allclose(res.beta, res.beta[0], rtol=1e-4)
