"""Dynamic-analysis JSON contract: `"analysis"` block -> modal/transient run.

An extension of the problem-JSON schema beyond the reference (which is
statics-only; its parser is /root/reference/FEM/python/examples/json/
generic.py and has no analysis concept).  The same problem JSON that
drives a static solve gains:

    "analysis": {"type": "modal", "n_modes": 6, "lumped": true,
                 "include_shapes": true,
                 "prestress": true | {"loads": [..], "scale": s}
                            | {"u": [..]}}    # initial-stress K_g(u0)

    "analysis": {"type": "buckling", "n_modes": 4}

    "analysis": {"type": "reduction", "method": "guyan"|"craig_bampton",
                 "master_nodes": [..] | "master_dofs": [..],
                 "n_modes": 4, "compare_full": true}

    "analysis": {"type": "spectrum", "sa": 2.5 | {"omegas": [..],
                                                  "values": [..]}
                     | {"history": <amplitude contract>, "dt": 0.01,
                        "n_steps": 4000, "damping_ratio": 0.05,
                        "curve_omegas": [..]},   # GENERATE Sa from an
                                                 # accelerogram (exact
                                                 # at modal frequencies)
                 "direction": [1, 0], "n_modes": 6,
                 "directions": [[1,0], [0,1]],    # multi-direction
                 "directional_rule": "srss" | "100-30",
                 "combination": "srss" | "cqc", "damping_ratio": 0.05}

    "analysis": {"type": "continuation", "n_steps": 200,
                 "initial_dlambda": 0.02, "stop_lambda_abs": 5.0,
                 "probe_nodes": [..] | "probe_dofs": [..]}

    "analysis": {"type": "plastic",           # elastoplastic statics
                 "sigma_y": 1.5 | [..],       # yield stress (per element)
                 "hardening": H,              # linear isotropic modulus
                 "kinematic_hardening": Hk,   # linear kinematic modulus
                 "target": 1.5, "n_steps": 20 # proportional ramp, or an
                 | "load_factors": [..],      # explicit (cyclic) history
                 "include_history": true,     # per-step stress/eps_p
                 "probe_nodes": [..] | "probe_dofs": [..]}
                                              # radial return, combined
                                              # hardening
                                              # (solvers/plasticity)

    "analysis": {"type": "random",            # + optional
                                              # "first_passage":
                                              # {"barrier": b,
                                              #  "duration": T} —
                                              # Rice/Poisson survival
                 "psd": S0 | {"omegas": [..],
                                                "values": [..]},
                 "omegas": {..}, "damping": [alpha, beta],
                 "probe_nodes": [..]}

    "analysis": {"type": "harmonic", "damping": [alpha, beta],
                 "method": "direct" | "modal", "n_modes": 12,
                 "omegas": [..] | {"start": w0, "stop": w1, "num": 100,
                                   "spacing": "linear" | "log"},
                 "prestress": true | {..},   # K_g(u0), same contract as
                                             # modal (also on spectrum
                                             # and random blocks)
                 "probe_nodes": [..] | "probe_dofs": [..]}

    "analysis": {"type": "transient", "dt": "auto" | seconds,
                 "n_steps": 2000, "method": "central" | "newmark",
                 "amplitudes": [[..], ..],   # (B, n_steps) ENSEMBLE mode:
                                             # B histories integrate as one
                                             # vmapped program with
                                             # per-element |stress|
                                             # envelopes per row
                 "damping": [alpha, beta],            # Rayleigh
                 "amplitude": [..] | {"type": "step"}
                             | {"type": "sine", "frequency_hz": f,
                                "phase": 0.0}
                             | {"type": "pulse", "t_end": seconds}
                             | {"type": "trapezoid", "t_rise": s,
                                "t_hold": 0.0, "t_fall": s,
                                "peak": 1.0},  # quasi-static
                                               # ramp/hold/unload
                 "load": {"type": "moving", "path_nodes": [..],
                          "speed": v, "magnitude": F, "component": 1}
                        | {"type": "base_acceleration",
                           "history": <amplitude contract>,
                           "direction": [..], "scale": 1.0},
                 "prestress": true | {..},   # same contract as modal
                 "checkpoint": {"dir": p, "every": n, "resume": true},
                 "record_every": 10, "geometric_nonlinear": false,
                 "include_stress_envelope": false,
                 "plasticity": {"sigma_y": 1.5 | [..],   # explicit elasto-
                                "hardening": H,          # plastic transient
                                "kinematic_hardening": Hk},
                                             # radial return committed per
                                             # step; plain amplitude
                                             # contract only (see
                                             # _run_transient_plastic)
                 "probe_nodes": [..] | "probe_dofs": [..]}

    "analysis": {"type": "sizing",
                 "objective": "mass" | "compliance",
                 "method": "adam" | "fsd" | "oc",  # fsd: stress-only host
                                              # fixpoint (exact for
                                              # determinate trusses)
                 "stress_limit": 0.8,
                 "buckling_shape_factor": 0.0796,  # c in I = c A^2:
                                              # Euler compression check
                                              # sigma_cr = pi^2 E c A/L^2
                 "displacement_limit": 0.5,
                 "min_frequency_hz": 2.0,     # f1 floor (needs payload
                                              # "point_masses" to be
                                              # enforceable — frequencies
                                              # are scale-invariant when
                                              # all mass is structural)
                 "reliability": {             # RBDO: every member keeps
                     "variables": [..],       # a FORM beta >= target
                     "target_beta": 3.0,      # (PMA/AMV inner loop;
                     "limit_state": {..}},    # see solvers/sizing.py)
                 "fatigue": {                 # fatigue-life floor under
                     "psd": S_p,              # stationary random load
                     "omegas": [..] | {..},   # (scalar white noise or a
                     "damping": [a, b],       # curve on the sweep); see
                     "sn": {"exponent": m,    # solvers/sizing.py
                            "coefficient": C},
                     "min_life_s": T,         # | "min_life_hours"
                     "method": "dirlik"},
                 "probe_nodes": [..] | "probe_dofs": [..],
                 "volume": V,                 # compliance objective
                 "load_cases": [[..ndof..], ..],   # envelope sizing:
                                              # constraints hold for
                                              # EVERY case (multi-RHS
                                              # batch per iteration)
                 "case_weights": [..],        # compliance Σ w_c f_c·u_c
                 "min_area": 1e-6, "max_area": 10.0,
                 "initial_areas": [..],
                 "n_iter": 300, "outer_rounds": 4,
                 "learning_rate": 0.05, "penalty": 10.0,
                 "polish": true}              # design-side inverse:
                                              # member areas from load
                                              # paths (solvers/sizing)

    "analysis": {"type": "reliability",       # FORM failure probability
                 "variables": [{"name": "S", "kind": "load_scale",
                                "distribution": "normal",
                                "mean": 1.0, "std": 0.2}, ..],
                 "limit_state": {"type": "stress",
                                 "limit": R | "variable": "R",
                                 "elements": [..]}
                             | {"type": "displacement", "limit": d,
                                "probe_nodes": [..]},
                 "validate_mc": 20000, "seed": 0}
                                              # per-member beta / p_f,
                                              # series bounds, MC check
                                              # (solvers/reliability)

    "analysis": {"type": "identification",
                 "dt": 0.05, "n_steps": 400,
                 "params": ["young", "density"],
                 "measured": [[..], ..]       # (n_rec, n_probe) history
                   | "synthetic": {"young": E, "density": rho,
                                   "noise": 0.02, "seed": 0},
                 "probe_nodes": [..] | "probe_dofs": [..],
                 "amplitude": <transient contract>, "damping": [a, b],
                 "n_iter": 300, "learning_rate": 0.05,
                 "initial": {"young": 1.0},
                 "field": {"name": "young", "hidden_layers": 1,
                           "neurons_per_layer": 8}}
                                              # time-domain PINN
                                              # identification (discrete
                                              # adjoint through the
                                              # integrator); with "field"
                                              # a spatial MLP profile is
                                              # recovered instead of
                                              # scalars

Routed identically through the CLI (cli/generic.py), the HTTP tier
(serve/server.py: /api/fem/{modal,transient,buckling,harmonic,spectrum,
continuation,random,reduction,identification}) and the Node backend
(backend/src/routes/fem.js).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..solvers.buckling import buckling_analysis
from ..solvers.harmonic import harmonic_response
from ..solvers.modal import modal_analysis

# Shared helpers + the split-out runner families (io/_common.py,
# io/sizing_io.py, io/reliability_io.py, io/identification_io.py —
# the frame_io/plane_io pattern).  Re-exported here: this module is
# the analysis contract's single import surface.
from ._common import (_SHAPES_JSON_DOF_LIMIT, _amplitude_array,
                      _element_areas, _json_finite, _local_cpu_ctx,
                      _omega_array, _prestress_state, _probe_dofs,
                      _sn_params)
from .identification_io import run_identification  # noqa: F401
from .reliability_io import run_reliability  # noqa: F401
from .sizing_io import run_sizing  # noqa: F401
from .transient_io import run_transient  # noqa: F401


def run_modal(problem, analysis: Dict) -> Dict:
    """Execute a modal analysis block; JSON-serializable result dict."""
    # Clamp to the free-DOF count (UIs ask for a fixed mode count that
    # small models cannot supply).
    n_modes = min(int(analysis.get("n_modes", 6)),
                  problem.free_fixed()[0].size)
    lumped = bool(analysis.get("lumped", True))
    prestress_u = _prestress_state(problem, analysis.get("prestress"))
    res = modal_analysis(problem, n_modes=n_modes, lumped=lumped,
                         n_iter=int(analysis.get("n_iter", 25)),
                         prestress_u=prestress_u)
    out = {
        "success": True,
        "analysis": "modal",
        "n_modes": n_modes,
        "lumped": lumped,
        "prestressed": prestress_u is not None,
        # False: float32 could not resolve these modes (solvers/modal.py
        # docstring) — consumers must not trust the frequencies.
        "ok": bool(res.ok),
        "eigenvalues": res.eigenvalues.tolist(),
        "omegas": res.omegas.tolist(),
        "frequencies_hz": res.frequencies.tolist(),
        "residuals": res.residuals.tolist(),
    }
    include = analysis.get("include_shapes",
                           problem.ndof <= _SHAPES_JSON_DOF_LIMIT)
    if include:
        # (n_modes, ndof) rows for readability in JSON.
        out["mode_shapes"] = res.shapes.T.tolist()
    cal = analysis.get("damping_calibration")
    if cal is not None:
        # Rayleigh (alpha, beta) from target damping ratios at two of
        # the COMPUTED modes — the calibration every transient analysis
        # needs, now answerable in the same request
        # (solvers/modal.rayleigh_coefficients):
        #   "damping_calibration": {"zeta": 0.02}            same ratio
        #   ... {"zeta": [z1, z2], "modes": [1, 4]}          per mode
        from ..solvers.modal import rayleigh_coefficients

        zeta = cal.get("zeta", 0.05)
        if isinstance(zeta, (list, tuple)):
            if len(zeta) != 2:
                raise ValueError("damping_calibration.zeta must be a "
                                 "number or a [zeta_1, zeta_2] pair")
            z1, z2 = float(zeta[0]), float(zeta[1])
        else:
            z1 = z2 = float(zeta)
        modes = cal.get("modes", [1, n_modes])
        if (not isinstance(modes, (list, tuple)) or len(modes) != 2
                or any(int(m) != m for m in modes)):
            raise ValueError("damping_calibration.modes must be two "
                             "integer 1-based mode indices")
        m1, m2 = int(modes[0]), int(modes[1])
        if not (1 <= m1 < m2 <= n_modes):
            raise ValueError("damping_calibration.modes must be two "
                             f"distinct 1-based indices within the "
                             f"{n_modes} computed modes")
        alpha, beta = rayleigh_coefficients(
            float(res.omegas[m1 - 1]), z1, float(res.omegas[m2 - 1]), z2)
        out["rayleigh_damping"] = {
            "alpha": alpha, "beta": beta,
            "calibrated_at": {"omegas": [float(res.omegas[m1 - 1]),
                                         float(res.omegas[m2 - 1])],
                              "zeta": [z1, z2]},
        }
    ref_shapes = analysis.get("compare_shapes")
    if ref_shapes is not None:
        # Test-vs-model shape correlation in the response: MAC matrix
        # between the computed shapes and supplied (n_ref, ndof) rows —
        # measured mode shapes from an experimental modal analysis
        # (solvers/modal.mac; scale/sign invariant).
        from ..solvers.modal import mac

        ref = np.asarray(ref_shapes, dtype=float)
        if ref.ndim != 2 or ref.shape[1] != problem.ndof:
            raise ValueError(f"compare_shapes must be (n_ref, "
                             f"{problem.ndof}) rows")
        out["mac"] = mac(res.shapes, ref.T).tolist()
    return out


def run_buckling(problem, analysis: Dict) -> Dict:
    """Execute a linearized-buckling block; the problem's loads define the
    base pattern and load_factors scale it (solvers/buckling.py)."""
    n_modes = int(analysis.get("n_modes", 4))
    res = buckling_analysis(problem, n_modes=n_modes)
    lam = [None if not np.isfinite(v) else float(v)
           for v in res.load_factors]    # inf -> null in JSON
    out = {
        "success": True,
        "analysis": "buckling",
        "n_modes": len(lam),
        # False: the banded float32 path could not converge the Ritz
        # values (solvers/buckling.py) — consumers must not trust the
        # factors.
        "ok": bool(res.ok),
        "load_factors": lam,
        "axial_forces": res.axial_forces.tolist(),
        "u_base": res.u_base.tolist(),
    }
    include = analysis.get("include_shapes",
                           problem.ndof <= _SHAPES_JSON_DOF_LIMIT)
    if include:
        out["buckling_modes"] = res.modes.T.tolist()
    return out


def run_harmonic(problem, analysis: Dict) -> Dict:
    """Execute a harmonic (frequency-response) block."""
    omegas = _omega_array(analysis["omegas"])
    damping = analysis.get("damping", [0.0, 0.0])
    method = analysis.get("method", "direct")
    probe = _probe_dofs(analysis, problem)
    if (probe.size * omegas.size > 4 * _SHAPES_JSON_DOF_LIMIT
            and "probe_dofs" not in analysis
            and "probe_nodes" not in analysis):
        raise ValueError(
            f"harmonic response would serialize 4 x {probe.size} DOFs x "
            f"{omegas.size} frequencies to JSON; give "
            "probe_nodes/probe_dofs to bound the payload")
    prestress_u = _prestress_state(problem, analysis.get("prestress"))
    probe_elements = analysis.get("probe_elements")
    if probe_elements is not None:
        probe_elements = np.asarray(probe_elements, dtype=int)
        if probe_elements.size * omegas.size > 4 * _SHAPES_JSON_DOF_LIMIT:
            raise ValueError(
                f"member-force FRFs would serialize "
                f"{probe_elements.size} elements x {omegas.size} "
                "frequencies to JSON; probe fewer elements")
    res = harmonic_response(
        problem, omegas, damping=(float(damping[0]), float(damping[1])),
        method=method, n_modes=int(analysis.get("n_modes", 12)),
        probe_dofs=probe, probe_elements=probe_elements,
        prestress_u=prestress_u,
        residual_tol=float(analysis.get("residual_tol", 1e-3)))
    flagged = np.flatnonzero(res.flagged)
    out = {
        "success": True,
        "analysis": "harmonic",
        "method": method,
        "prestressed": prestress_u is not None,
        "omegas": res.omegas.tolist(),
        "probe_dofs": probe.tolist(),
        "real": res.real.tolist(),
        "imag": res.imag.tolist(),
        "amplitude": res.amplitude.tolist(),
        "phase": res.phase.tolist(),
        # Honesty guard (round-4 VERDICT #6): per-frequency relative
        # residual of the returned solution and the indices whose
        # residual exceeds residual_tol — near-resonant f32 drift is
        # REPORTED, never silently returned as clean data.
        "residual": res.residual.tolist(),
        "flagged_indices": flagged.tolist(),
        "flagged_omegas": res.omegas[flagged].tolist(),
        "residual_tol": float(analysis.get("residual_tol", 1e-3)),
    }
    if probe_elements is not None:
        # Member-force FRFs (the fatigue design quantity).
        out["probe_elements"] = probe_elements.tolist()
        out["force_real"] = res.force_real.tolist()
        out["force_imag"] = res.force_imag.tolist()
        out["force_amplitude"] = res.force_amplitude.tolist()
    return out


def run_continuation(problem, analysis: Dict) -> Dict:
    """Execute an arc-length continuation block (solvers/riks.py): the
    equilibrium path lambda(u), traced through limit points."""
    from ..solvers.riks import solve_riks

    stop_lam = analysis.get("stop_lambda_abs")
    stop_fn = ((lambda u, lam: abs(lam) > float(stop_lam))
               if stop_lam is not None else None)
    res = solve_riks(
        problem,
        n_steps=int(analysis.get("n_steps", 200)),
        initial_dlambda=float(analysis.get("initial_dlambda", 0.02)),
        tol=float(analysis.get("tolerance", 1e-8)),
        stop_fn=stop_fn)
    probe = _probe_dofs(analysis, problem)
    return {
        "success": bool(res.converged),
        "analysis": "continuation",
        "n_points": int(res.load_factors.size),
        "load_factors": res.load_factors.tolist(),
        "probe_dofs": probe.tolist(),
        "displacements": res.displacements[:, probe].tolist(),
        "iterations": res.iterations.tolist(),
        "max_residual": float(res.residuals.max()) if res.residuals.size
        else None,
    }


def run_plastic(problem, analysis: Dict) -> Dict:
    """Execute an elastoplastic-statics block (solvers/plasticity.py):
    incremental radial-return solve along a load-factor history."""
    from ..solvers.plasticity import solve_elastoplastic

    if "sigma_y" not in analysis:
        raise ValueError('plastic analysis requires "sigma_y"')
    kwargs = dict(
        sigma_y=analysis["sigma_y"],
        hardening_iso=analysis.get("hardening", 0.0),
        hardening_kin=analysis.get("kinematic_hardening", 0.0),
        tol=float(analysis.get("tolerance", 1e-9)),
        max_iter=int(analysis.get("max_iterations", 30)),
    )
    if "load_factors" in analysis:
        kwargs["load_factors"] = np.asarray(analysis["load_factors"],
                                            dtype=float)
    else:
        kwargs["target_load_factor"] = float(analysis.get("target", 1.0))
        kwargs["n_steps"] = int(analysis.get("n_steps", 20))
    res = solve_elastoplastic(problem, **kwargs)

    probe = _probe_dofs(analysis, problem)
    yielded = np.flatnonzero(res.alpha[-1] > 0.0)
    out = {
        "success": bool(res.converged),
        "analysis": "plastic",
        "n_steps": int(res.load_factors.size),
        "load_factors": res.load_factors.tolist(),
        "probe_dofs": probe.tolist(),
        "displacements": res.displacements[:, probe].tolist(),
        "iterations": res.iterations.tolist(),
        "max_residual": float(res.residuals.max()),
        "n_plastic": res.n_plastic.tolist(),
        "yielded_elements": yielded.tolist(),
        "max_abs_stress": np.abs(res.stresses).max(axis=1).tolist(),
        "final": {
            "stresses": res.stresses[-1].tolist(),
            "plastic_strain": res.plastic_strain[-1].tolist(),
            "accumulated_plastic_strain": res.alpha[-1].tolist(),
            "back_stress": res.back_stress[-1].tolist(),
            "displacements": res.displacements[-1].tolist(),
        },
    }
    if analysis.get("include_history"):
        out["history"] = {
            "stresses": res.stresses.tolist(),
            "plastic_strain": res.plastic_strain.tolist(),
        }
    return _json_finite(out)


def run_random(problem, analysis: Dict) -> Dict:
    """Execute a random-vibration block (solvers/random_response.py)."""
    from ..solvers.random_response import random_response

    omegas = _omega_array(analysis["omegas"])
    damping = analysis.get("damping", [0.0, 0.0])
    probe = _probe_dofs(analysis, problem)
    if (probe.size * omegas.size > 4 * _SHAPES_JSON_DOF_LIMIT
            and "probe_dofs" not in analysis
            and "probe_nodes" not in analysis):
        raise ValueError(
            "random-response PSDs would serialize "
            f"{probe.size} DOFs x {omegas.size} frequencies to JSON; "
            "give probe_nodes/probe_dofs to bound the payload")
    psd_spec = analysis.get("psd", 1.0)
    if isinstance(psd_spec, dict):
        om_tab = np.asarray(psd_spec["omegas"], dtype=float)
        val_tab = np.asarray(psd_spec["values"], dtype=float)

        def load_psd(om):
            return np.interp(om, om_tab, val_tab)
    else:
        load_psd = float(psd_spec)
    prestress_u = _prestress_state(problem, analysis.get("prestress"))
    probe_elements = analysis.get("probe_elements")
    if probe_elements is not None:
        probe_elements = np.asarray(probe_elements, dtype=int)
        if probe_elements.size * omegas.size > 4 * _SHAPES_JSON_DOF_LIMIT:
            raise ValueError(
                f"member-force PSDs would serialize "
                f"{probe_elements.size} elements x {omegas.size} "
                "frequencies to JSON; probe fewer elements")
    res = random_response(
        problem, load_psd, omegas,
        damping=(float(damping[0]), float(damping[1])),
        method=analysis.get("method", "direct"),
        n_modes=int(analysis.get("n_modes", 12)),
        probe_dofs=probe, probe_elements=probe_elements,
        prestress_u=prestress_u)
    out = {
        "success": True,
        "analysis": "random",
        "prestressed": prestress_u is not None,
        "omegas": res.omegas.tolist(),
        "probe_dofs": probe.tolist(),
        "psd": res.psd.tolist(),
        "rms": res.rms.tolist(),
    }
    if probe_elements is not None:
        # Member-force statistics (fatigue inputs).
        out["probe_elements"] = probe_elements.tolist()
        out["force_psd"] = res.force_psd.tolist()
        out["force_rms"] = res.force_rms.tolist()
    fp = analysis.get("first_passage")
    if fp is not None:
        # Barrier-crossing survival: Rice rate + Poisson approximation
        # on the PROBE-DOF displacement PSDs (solvers/fatigue.py).
        # Contract: "first_passage": {"barrier": b | [b per probe],
        #                             "duration": T,
        #                             "two_sided": true}
        from ..solvers.fatigue import first_passage_probability

        if fp.get("barrier") is None or fp.get("duration") is None:
            raise ValueError('first_passage needs "barrier" and '
                             '"duration"')
        nu_b, pf_fp = first_passage_probability(
            res.omegas, np.asarray(res.psd, dtype=float),
            fp["barrier"], float(fp["duration"]),
            two_sided=bool(fp.get("two_sided", True)))
        out["first_passage"] = {
            "barrier": np.broadcast_to(
                np.asarray(fp["barrier"], dtype=float),
                np.atleast_1d(nu_b).shape).tolist(),
            "duration": float(fp["duration"]),
            "two_sided": bool(fp.get("two_sided", True)),
            "crossing_rate_hz": np.atleast_1d(nu_b).tolist(),
            "pf": np.atleast_1d(pf_fp).tolist(),
        }
    fat = analysis.get("fatigue")
    if fat is not None:
        # Frequency-domain fatigue: stress PSDs S_sigma = S_N / A^2
        # through Dirlik (default) or the narrow-band bound.
        # Contract: "fatigue": {"sn": {"exponent": m, "coefficient": C},
        #                       "method": "dirlik" | "narrowband",
        #                       "duration": T}   # optional: adds the
        #                                        # Davenport peak estimate
        from ..solvers.fatigue import spectral_fatigue

        if probe_elements is None:
            raise ValueError("random-block fatigue needs probe_elements "
                             "(damage is computed from member-STRESS "
                             "PSDs)")
        # "sn" is optional: without it the summary is statistics-only
        # (stress RMS, crossing rates, peak factor — no material curve
        # needed, so UIs can show it with zero configuration).
        m = c = None
        if fat.get("sn") is not None:
            m, c = _sn_params(fat)
        duration = fat.get("duration")
        areas = _element_areas(problem, probe_elements)
        stress_psd = np.asarray(res.force_psd, dtype=float) \
            / (areas ** 2)[None, :]
        sf = spectral_fatigue(
            res.omegas, stress_psd, m, c,
            method=fat.get("method", "dirlik"),
            duration=None if duration is None else float(duration))
        out["fatigue"] = {
            "method": sf.method,
            "probe_elements": probe_elements.tolist(),
            "stress_rms": sf.rms.tolist(),
            "nu0_hz": sf.nu0.tolist(),
            "nu_peak_hz": sf.nu_peak.tolist(),
            "alpha2": sf.alpha2.tolist(),
        }
        if m is not None:
            out["fatigue"]["sn"] = {"exponent": m, "coefficient": c}
            out["fatigue"]["damage_rate"] = sf.damage_rate.tolist()
            out["fatigue"]["life_s"] = [
                None if not np.isfinite(v) else float(v)
                for v in sf.life]
        if duration is not None:
            out["fatigue"]["duration"] = float(duration)
            out["fatigue"]["peak_factor"] = sf.peak_factor.tolist()
            out["fatigue"]["expected_peak_stress"] = \
                sf.expected_peak.tolist()
    return out


def run_spectrum(problem, analysis: Dict) -> Dict:
    """Execute a response-spectrum block (solvers/spectrum.py).

    Three Sa sources:
        "sa": 2.5                              flat
        "sa": {"omegas": [..], "values": [..]} tabulated (interpolated)
        "sa": {"history": <amplitude contract>,   # a_g(t) RECORD
               "dt": 0.01, "n_steps": 4000,    # n_steps optional for a
                                               # literal list
               "scale": 1.0,
               "damping_ratio": 0.05,          # default: the block's
               "curve_omegas": [..] | {..}}    # optionally return the
                                               # generated curve
    The history form GENERATES the spectrum from the record
    (spectrum_from_history: vectorized SDOF Newmark sweep, float64
    host) and evaluates it EXACTLY at the modal frequencies — no
    interpolation between the generation and the combination."""
    from ..solvers.spectrum import response_spectrum

    sa = analysis.get("sa", 1.0)
    curve_request = None
    if isinstance(sa, dict) and "history" in sa:
        from ..solvers.spectrum import spectrum_from_history

        if "dt" not in sa:
            raise ValueError('a history spectrum needs its record "dt"')
        dt_h = float(sa["dt"])
        hist_spec = sa["history"]
        n = int(sa.get("n_steps",
                       len(hist_spec)
                       if isinstance(hist_spec, (list, tuple)) else 0))
        if n <= 0:
            raise ValueError('a synthetic history spectrum needs '
                             '"n_steps"')
        accel = (_amplitude_array(hist_spec, n, dt_h)
                 * float(sa.get("scale", 1.0)))
        zeta_g = float(sa.get("damping_ratio",
                              analysis.get("damping_ratio", 0.05)))
        curve_request = sa.get("curve_omegas")

        def spectrum(om):
            return spectrum_from_history(accel, dt_h, om, zeta_g).psa
    elif isinstance(sa, dict):
        om_tab = np.asarray(sa["omegas"], dtype=float)
        val_tab = np.asarray(sa["values"], dtype=float)

        def spectrum(om):
            return np.interp(om, om_tab, val_tab)
    else:
        spectrum = float(sa)
    prestress_u = _prestress_state(problem, analysis.get("prestress"))
    kw = dict(n_modes=int(analysis.get("n_modes", 6)),
              combination=analysis.get("combination", "srss"),
              damping_ratio=float(analysis.get("damping_ratio", 0.05)),
              prestress_u=prestress_u)
    if "directions" in analysis:
        # Multi-direction combination (codes: SRSS over orthogonal
        # components or the 100-30 rule), per response quantity:
        #   "directions": [[1,0],[0,1]],
        #   "directional_rule": "srss" | "100-30"
        from ..solvers.spectrum import directional_combination

        if "direction" in analysis:
            raise ValueError('give "direction" (single) or '
                             '"directions" (combined), not both')
        mres = directional_combination(
            problem, spectrum, analysis["directions"],
            rule=analysis.get("directional_rule", "srss"), **kw)
        first = mres.per_direction[0]
        return {
            "success": True,
            "analysis": "spectrum",
            "prestressed": prestress_u is not None,
            "combination": first.combination,
            "directional_rule": mres.rule,
            "modal_ok": bool(mres.modal_ok),
            "omegas": first.omegas.tolist(),
            "displacements": mres.displacements.tolist(),
            "axial_forces": mres.axial_forces.tolist(),
            "per_direction": [
                {"direction": list(map(float, np.asarray(d).reshape(-1))),
                 "participation": r.participation.tolist(),
                 "effective_mass": r.effective_mass.tolist(),
                 "mass_fraction": r.mass_fraction}
                for d, r in zip(analysis["directions"],
                                mres.per_direction)],
            **({"sa_at_modes": np.asarray(
                spectrum(first.omegas), dtype=float).tolist()}
               if callable(spectrum) else {}),
        }
    res = response_spectrum(
        problem, spectrum,
        direction=analysis.get("direction"), **kw)
    out = {
        "success": True,
        "analysis": "spectrum",
        "prestressed": prestress_u is not None,
        "combination": res.combination,
        "modal_ok": bool(res.modal_ok),
        "omegas": res.omegas.tolist(),
        "participation": res.participation.tolist(),
        "effective_mass": res.effective_mass.tolist(),
        "mass_fraction": res.mass_fraction,
        "displacements": res.displacements.tolist(),
        # Combined PER RESPONSE QUANTITY (modal member forces combined
        # directly — the force of the combined displacement field would
        # be wrong; solvers/spectrum.py).
        "axial_forces": res.axial_forces.tolist(),
    }
    if callable(spectrum):
        out["sa_at_modes"] = np.asarray(
            spectrum(res.omegas), dtype=float).tolist()
    if isinstance(sa, dict) and "history" in sa:
        out["sa_source"] = "history"
        if curve_request is not None:
            from ..solvers.spectrum import spectrum_from_history

            om_c = _omega_array(curve_request)
            curve = spectrum_from_history(
                accel, dt_h, om_c,
                float(sa.get("damping_ratio",
                             analysis.get("damping_ratio", 0.05))))
            out["spectrum_curve"] = {
                "omegas": om_c.tolist(),
                "sd": curve.sd.tolist(),
                "psv": curve.psv.tolist(),
                "psa": curve.psa.tolist(),
                "sa_abs": curve.sa_abs.tolist(),
                "damping_ratio": curve.damping_ratio,
            }
    return out


def run_reduction(problem, analysis: Dict) -> Dict:
    """Execute a model-order-reduction block (solvers/reduction.py).

    Contract (round-3 VERDICT #2):

        "analysis": {"type": "reduction",
                     "method": "guyan" | "craig_bampton",
                     "master_nodes": [..] | "master_dofs": [..],
                     "n_modes": 4,          # CB fixed-interface modes
                     "compare_full": true}  # full-model frequency check

    Returns the reduced natural frequencies (the quantity a
    substructuring user validates first), the reduced matrices when
    small, and — with compare_full — the full-model frequencies and
    per-mode relative errors."""
    import scipy.linalg

    from ..solvers.reduction import craig_bampton, guyan_reduce

    method = analysis.get("method", "guyan")
    if "master_dofs" in analysis:
        masters = np.asarray(analysis["master_dofs"], dtype=int)
    elif "master_nodes" in analysis:
        nodes = np.asarray(analysis["master_nodes"], dtype=int)
        d = problem.dimension
        cand = (d * nodes[:, None] + np.arange(d)[None, :]).reshape(-1)
        free = set(problem.free_fixed()[0].tolist())
        masters = np.asarray([c for c in cand if int(c) in free],
                             dtype=int)
        if masters.size == 0:
            raise ValueError("master_nodes resolve to no free DOFs")
    else:
        raise ValueError("reduction needs master_nodes or master_dofs")

    if method == "guyan":
        model = guyan_reduce(problem, masters)
    elif method == "craig_bampton":
        model = craig_bampton(problem, masters,
                              n_modes=int(analysis.get("n_modes", 4)))
    else:
        raise ValueError('reduction method must be "guyan" or '
                         '"craig_bampton"')

    w2 = scipy.linalg.eigh(model.k_red, model.m_red, eigvals_only=True)
    w2 = np.maximum(w2, 0.0)
    omegas = np.sqrt(w2)
    n_red = int(model.k_red.shape[0])
    out = {
        "success": True,
        "analysis": "reduction",
        "method": method,
        "master_dofs": masters.tolist(),
        "n_reduced_dofs": n_red,
        "reduced_omegas": omegas.tolist(),
        "reduced_frequencies_hz": (omegas / (2.0 * np.pi)).tolist(),
    }
    if analysis.get("include_matrices", n_red <= 64):
        out["k_red"] = model.k_red.tolist()
        out["m_red"] = model.m_red.tolist()
    if analysis.get("compare_full", True):
        n_cmp = min(n_red, problem.free_fixed()[0].size,
                    int(analysis.get("compare_modes", min(n_red, 6))))
        full = modal_analysis(problem, n_modes=n_cmp)
        rel = np.abs(omegas[:n_cmp] - full.omegas)
        rel = rel / np.maximum(full.omegas, 1e-30)
        out["full_omegas"] = full.omegas.tolist()
        out["full_frequencies_hz"] = full.frequencies.tolist()
        out["frequency_rel_error"] = rel.tolist()
    return out


def run_analysis(problem, analysis: Dict) -> Dict:
    """Dispatch an `"analysis"` block (see module docstring)."""
    kind = analysis.get("type")
    if kind == "modal":
        return run_modal(problem, analysis)
    if kind == "transient":
        return run_transient(problem, analysis)
    if kind == "buckling":
        return run_buckling(problem, analysis)
    if kind == "harmonic":
        return run_harmonic(problem, analysis)
    if kind == "spectrum":
        return run_spectrum(problem, analysis)
    if kind == "continuation":
        return run_continuation(problem, analysis)
    if kind == "plastic":
        return run_plastic(problem, analysis)
    if kind == "random":
        return run_random(problem, analysis)
    if kind == "reduction":
        return run_reduction(problem, analysis)
    if kind == "identification":
        return run_identification(problem, analysis)
    if kind == "sizing":
        return run_sizing(problem, analysis)
    if kind == "reliability":
        return run_reliability(problem, analysis)
    raise ValueError(f'analysis.type must be "modal", "transient", '
                     f'"buckling", "harmonic", "spectrum", '
                     f'"continuation", "plastic", "random", "reduction", '
                     f'"identification", "sizing" or "reliability", '
                     f'got {kind!r}')
