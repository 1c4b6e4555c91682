"""Sizing ("analysis": {"type": "sizing"}) JSON runner — the
design-side inverse: member areas from load paths (solvers/sizing.py:
augmented-Lagrangian ADAM, fully-stressed-design fixpoint, and the
large-mesh banded optimality-criteria compliance path).  Split out of
io/analysis.py (which keeps the dispatch facade)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ._common import (_SHAPES_JSON_DOF_LIMIT, _json_finite,
                      _local_cpu_ctx, _omega_array, _probe_dofs)


def run_sizing(problem, analysis: Dict) -> Dict:
    """Execute a sizing (design-optimization) block — the design-side
    inverse: member areas from load paths (solvers/sizing.py).

    Contract (module docstring):

        "analysis": {"type": "sizing",
                     "objective": "mass" | "compliance",
                     "method": "adam" | "fsd" | "oc",
                     "stress_limit": s, "displacement_limit": d,
                     "min_frequency_hz": f,     # adam only
                     "fatigue": {"psd": S, "omegas": [..] | {..},
                                 "damping": [a, b], "sn": {..},
                                 "min_life_s": T | "min_life_hours": h,
                                 "method": "dirlik"},   # adam only
                     "reliability": {"variables": [..],
                                     "target_beta": 3.0,
                                     "limit_state": {..}},  # adam only
                     "probe_nodes"/"probe_dofs": [..],   # where d applies
                     "volume": V, "min_area": a0, "max_area": a1,
                     "load_cases": [[..], ..],  # (C, ndof) envelope
                     "case_weights": [..],      # compliance weighting
                     "initial_areas": [..], "n_iter": 300,
                     "outer_rounds": 4, "learning_rate": 0.05,
                     "penalty": 10.0, "polish": true}

    "fsd" is the classic fully-stressed-design fixpoint — float64 host,
    zero device programs, exact for statically determinate trusses, but
    stress-constrained mass only.  "adam" (default) is the augmented-
    Lagrangian gradient method and handles displacement constraints and
    compliance/volume objectives; like the identification family it is
    dense-only and runs on the LOCAL CPU tier ("on_device": true opts
    back into the accelerator).  "oc" is the LARGE-MESH compliance path
    (optimality criteria on the banded DIA/PCG machinery — one banded
    solve per iteration): the only method allowed past DENSE_DOF_LIMIT,
    compliance objective + volume only, and it runs on the default
    accelerator (its solves are the large-mesh statics' solves)."""
    from ..solvers.newton import DENSE_DOF_LIMIT
    from ..solvers.sizing import (fully_stressed_design,
                                  optimize_compliance_oc, optimize_sizing)

    method = analysis.get("method", "adam")
    if problem.ndof > DENSE_DOF_LIMIT and method != "oc":
        raise ValueError(
            f"sizing methods adam/fsd are dense-only ({problem.ndof} "
            f"DOFs > {DENSE_DOF_LIMIT}); use method \"oc\" (banded "
            f"optimality-criteria compliance) or size on a coarser "
            f"model")
    objective = analysis.get("objective", "mass")
    stress_limit = analysis.get("stress_limit")
    stress_limit = None if stress_limit is None else float(stress_limit)
    buckling_c = analysis.get("buckling_shape_factor")
    buckling_c = None if buckling_c is None else float(buckling_c)
    disp_limit = analysis.get("displacement_limit")
    disp_limit = None if disp_limit is None else float(disp_limit)
    volume = analysis.get("volume")
    volume = None if volume is None else float(volume)
    min_area = float(analysis.get("min_area", 1e-6))
    max_area = analysis.get("max_area")
    max_area = None if max_area is None else float(max_area)
    probe = None
    if "probe_dofs" in analysis or "probe_nodes" in analysis:
        probe = _probe_dofs(analysis, problem)
    initial_areas = analysis.get("initial_areas")
    if initial_areas is not None:
        initial_areas = np.asarray(initial_areas, dtype=float)
    load_cases = analysis.get("load_cases")
    if load_cases is not None:
        # A real structure is sized for an ENVELOPE: (C, ndof) rows,
        # each a full load vector; constraints hold for every case.
        load_cases = np.asarray(load_cases, dtype=float)
    fatigue = analysis.get("fatigue")
    if fatigue is not None:
        if method != "adam":
            raise ValueError('a fatigue life floor needs method "adam" '
                             '(it differentiates the member-force FRF '
                             'sweep)')
        fatigue = dict(fatigue)
        if "omegas" in fatigue:
            fatigue["omegas"] = _omega_array(fatigue["omegas"])
        if fatigue.get("min_life_s") is None \
                and fatigue.get("min_life_hours") is not None:
            fatigue["min_life_s"] = \
                3600.0 * float(fatigue.pop("min_life_hours"))

    reliability = analysis.get("reliability")
    if reliability is not None and method != "adam":
        raise ValueError('an RBDO reliability target needs method '
                         '"adam" (the PMA constraint rides the '
                         'differentiable solve)')

    if method == "fsd":
        if objective != "mass" or disp_limit is not None \
                or volume is not None:
            raise ValueError(
                'method "fsd" solves the stress-constrained mass '
                'problem only; use method "adam" for displacement '
                'limits or compliance objectives')
        if stress_limit is None:
            raise ValueError('method "fsd" needs stress_limit')
        res = fully_stressed_design(
            problem, stress_limit, min_area=min_area, max_area=max_area,
            n_iter=int(analysis.get("n_iter", 50)),
            load_cases=load_cases,
            buckling_shape_factor=buckling_c)
    elif method == "oc":
        if objective != "compliance":
            raise ValueError('method "oc" is the compliance path; set '
                             '"objective": "compliance" (use "adam"/'
                             '"fsd" for stress/displacement-constrained '
                             'mass)')
        if volume is None:
            raise ValueError('method "oc" needs the volume budget '
                             '("volume": ...)')
        if load_cases is not None:
            raise ValueError('method "oc" sizes for the problem\'s own '
                             'load vector; load_cases needs method '
                             '"adam"')
        if buckling_c is not None \
                or analysis.get("min_frequency_hz") is not None:
            raise ValueError('method "oc" solves the pure compliance/'
                             'volume problem; buckling and frequency '
                             'constraints need method "adam"')
        res = optimize_compliance_oc(
            problem, volume, min_area=min_area, max_area=max_area,
            initial_areas=initial_areas,
            n_iter=int(analysis.get("n_iter", 40)),
            move=float(analysis.get("move", 0.2)),
            tol=float(analysis.get("tolerance", 1e-3)),
            cg_tol=float(analysis.get("cg_tol", 1e-6)),
            # Large-mesh knobs (same contract as the statics' banded
            # path): the Pallas stencil matvec and the MG V-cycle.
            use_pallas=bool(analysis.get("use_pallas", False)),
            precond=analysis.get("precond", "jacobi"))
    elif method == "adam":
        with _local_cpu_ctx(analysis):
            res = optimize_sizing(
                problem, objective=objective, stress_limit=stress_limit,
                buckling_shape_factor=buckling_c,
                displacement_limit=disp_limit, probe_dofs=probe,
                min_frequency_hz=(
                    None if analysis.get("min_frequency_hz") is None
                    else float(analysis["min_frequency_hz"])),
                fatigue=fatigue, reliability=reliability,
                volume=volume, min_area=min_area, max_area=max_area,
                initial_areas=initial_areas,
                load_cases=load_cases,
                case_weights=analysis.get("case_weights"),
                n_iter=int(analysis.get("n_iter", 300)),
                outer_rounds=int(analysis.get("outer_rounds", 4)),
                penalty=float(analysis.get("penalty", 10.0)),
                learning_rate=float(analysis.get("learning_rate", 0.05)),
                polish=bool(analysis.get("polish", True)))
    else:
        raise ValueError(f'sizing method must be "adam" or "fsd", '
                         f'got {method!r}')

    out = {
        "success": True,
        "analysis": "sizing",
        "method": method,
        "objective": objective,
        "converged": bool(res.converged),
        "mass": float(res.mass),
        "mass_initial": float(res.mass_initial),
        "mass_reduction": float(1.0 - res.mass / res.mass_initial)
        if res.mass_initial else 0.0,
        "n_iter": int(res.n_iter),
    }
    # Per-element tables can be huge on the OC large-mesh path — same
    # payload-size gate as mode shapes.
    if analysis.get("include_areas",
                    res.areas.size <= 4 * _SHAPES_JSON_DOF_LIMIT):
        out["areas"] = res.areas.tolist()
        out["stress"] = res.stress.tolist()
        out["axial_forces"] = res.axial_forces.tolist()
    out["area_range"] = [float(res.areas.min()), float(res.areas.max())]
    if load_cases is not None:
        out["n_load_cases"] = int(load_cases.shape[0])
    if stress_limit is not None:
        out["stress_limit"] = stress_limit
        out["max_stress_ratio"] = float(res.max_stress_ratio)
    if buckling_c is not None:
        out["buckling_shape_factor"] = buckling_c
        out["max_buckling_ratio"] = float(res.max_buckling_ratio)
    if analysis.get("min_frequency_hz") is not None:
        out["min_frequency_hz"] = float(analysis["min_frequency_hz"])
        out["fundamental_frequency_hz"] = \
            float(res.fundamental_frequency_hz)
    if reliability is not None:
        # Achieved betas at the returned design (full HL-RF authority
        # recompute — see SizingResult.reliability_beta).
        out["target_beta"] = float(reliability["target_beta"])
        out["min_reliability_beta"] = float(res.min_reliability_beta)
        out["reliability_beta"] = [
            None if not np.isfinite(v) else float(v)
            for v in res.reliability_beta]   # None = never stressed
    if fatigue is not None:
        # Achieved lives at the returned design (host-authority recompute
        # — see SizingResult.fatigue_life_s).
        out["fatigue_min_life_s"] = float(fatigue["min_life_s"])
        out["min_fatigue_life_s"] = float(res.min_fatigue_life_s)
        life = np.asarray(res.fatigue_life_s, dtype=float)
        out["fatigue_life_s"] = [
            None if not np.isfinite(v) else float(v) for v in life]
        out["fatigue_critical_element"] = int(np.argmin(life))
        out["fatigue_method"] = fatigue.get("method", "dirlik")
    if disp_limit is not None:
        out["displacement_limit"] = disp_limit
        out["max_displacement_ratio"] = float(res.max_displacement_ratio)
    if volume is not None:
        out["volume"] = volume
    if analysis.get("include_history", True):
        out["history"] = res.history.tolist()
    if analysis.get("include_displacements",
                    problem.ndof <= _SHAPES_JSON_DOF_LIMIT):
        out["displacements"] = res.displacements.tolist()
    return _json_finite(out)

