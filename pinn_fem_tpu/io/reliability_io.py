"""Reliability ("analysis": {"type": "reliability"}) JSON runner —
FORM/SORM failure probability under uncertain material / load /
resistance, with Nataf correlation, random fields, and Monte-Carlo
validation (solvers/reliability.py).  Split out of io/analysis.py
(which keeps the dispatch facade)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ._common import (_SHAPES_JSON_DOF_LIMIT, _json_finite,
                      _local_cpu_ctx, _omega_array, _probe_dofs)


def run_reliability(problem, analysis: Dict) -> Dict:
    """Execute a reliability (FORM) block — failure probability of the
    design under uncertain material/load/resistance
    (solvers/reliability.py).

    Contract:

        "analysis": {"type": "reliability",
                     "variables": [
                        {"name": "E", "kind": "young",      # | "area"
                         "distribution": "lognormal",       # | "density"
                         "mean": 500.0, "cov": 0.1,         # or "std"
                         "elements": [..],                  # optional
                         "field": {"correlation_length": 2.0}},
                                        # optional: spatially correlated
                                        # RANDOM FIELD (one variable per
                                        # element, exp(-d/L) model)
                        {"name": "S", "kind": "load_scale",
                         "distribution": "normal",
                         "mean": 1.0, "std": 0.2},
                        {"name": "R", "kind": "resistance",
                         "distribution": "lognormal",
                         "mean": 2.0, "cov": 0.08}],
                     "limit_state":
                        {"type": "stress",
                         "limit": 2.0 | "variable": "R",
                         "elements": [..]}                  # default all
                      | {"type": "displacement", "limit": 0.5,
                         "probe_nodes"/"probe_dofs": [..]}
                      | {"type": "frequency",     # f1 floor under
                         "min_frequency_hz": 2.0}   # stiffness/mass
                                                    # scatter
                      | {"type": "fatigue",       # life under random
                         "min_life_s": T | "min_life_hours": h,
                         "variable": "C",         # Basquin C random, or
                                                  # sn.coefficient fixed
                         "fatigue": {"psd": S, "omegas": [..] | {..},
                                     "damping": [a, b],
                                     "sn": {"exponent": m},
                                     "method": "dirlik"},
                         "elements": [..]},
                     "n_iter": 50,
                     "correlation": [["S", "R", -0.3], ..],  # Nataf
                     "sorm": false,             # Breitung correction
                     "validate_mc": 20000, "seed": 0,
                     "mc_method": "crude" | "importance"}

    One limit state per member (or probed DOF); the response reports
    per-limit-state beta / p_f / MPP plus the series-system bounds and
    the alpha correlation matrix.  Runs on the LOCAL CPU tier like the
    rest of the inverse family ("on_device": true opts out); dense-only
    by the same guard.
    """
    from ..solvers.reliability import form_reliability

    ls = dict(analysis.get("limit_state") or {})
    if ls.get("type", "stress") == "displacement" \
            and ("probe_nodes" in ls or "probe_dofs" in ls):
        ls["probe_dofs"] = _probe_dofs(ls, problem).tolist()
    if ls.get("type") == "fatigue":
        if isinstance(ls.get("fatigue"), dict):
            ls["fatigue"] = dict(ls["fatigue"])
            if "omegas" in ls["fatigue"]:
                ls["fatigue"]["omegas"] = \
                    _omega_array(ls["fatigue"]["omegas"])
        if ls.get("min_life_s") is None \
                and ls.get("min_life_hours") is not None:
            ls["min_life_s"] = 3600.0 * float(ls.pop("min_life_hours"))
    with _local_cpu_ctx(analysis):
        res = form_reliability(
            problem, analysis.get("variables"), ls,
            n_iter=int(analysis.get("n_iter", 50)),
            mc_samples=int(analysis.get("validate_mc", 0)),
            mc_seed=int(analysis.get("seed", 0)),
            mc_method=analysis.get("mc_method", "crude"),
            sorm=bool(analysis.get("sorm", False)),
            correlation=analysis.get("correlation"))
    worst = int(np.argmin(res.beta)) if res.beta.size else -1
    out = {
        "success": True,
        "analysis": "reliability",
        "labels": res.labels,
        "variables": res.variables,
        "beta": [None if not np.isfinite(v) else float(v)
                 for v in res.beta],     # inf = unreachable surface
        "pf": res.pf.tolist(),
        "alpha": res.alpha.tolist(),
        "design_points": res.design_point.tolist(),
        "converged": [bool(v) for v in res.converged],
        "critical_limit_state": worst,
        "beta_min": float(res.beta[worst]) if worst >= 0 else None,
        "system_pf_bounds": [res.system_pf_lower, res.system_pf_upper],
        "system_pf_ditlevsen_bounds": [res.system_pf_ditlevsen_lower,
                                       res.system_pf_ditlevsen_upper],
    }
    if analysis.get("include_correlation",
                    len(res.labels) <= _SHAPES_JSON_DOF_LIMIT):
        out["alpha_correlation"] = res.alpha_correlation.tolist()
    if res.pf_sorm is not None:
        out["pf_sorm"] = res.pf_sorm.tolist()
        out["system_pf_sorm_bounds"] = [res.system_pf_sorm_lower,
                                        res.system_pf_sorm_upper]
    if res.mc_pf is not None:
        out["mc"] = {"pf": res.mc_pf, "std_error": res.mc_std_error,
                     "n_samples": res.mc_n, "method": res.mc_method,
                     "pf_per_limit_state": res.mc_pf_per_ls.tolist()}
    return _json_finite(out)

