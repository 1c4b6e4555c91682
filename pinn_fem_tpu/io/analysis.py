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
                             | {"type": "pulse", "t_end": seconds},
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
from ..solvers.dynamics import solve_transient, stable_dt
from ..solvers.harmonic import harmonic_response
from ..solvers.modal import modal_analysis

# Shapes above this DOF count are omitted from JSON output unless
# explicitly requested (payload size, not compute, is the constraint).
_SHAPES_JSON_DOF_LIMIT = 4096


def _amplitude_array(spec, n_steps: int, dt: float) -> np.ndarray:
    """Load-scale history a(t_i), i = 0..n_steps-1."""
    if spec is None or spec == "step":
        return np.ones(n_steps)
    if isinstance(spec, (list, tuple)):
        arr = np.asarray(spec, dtype=float)
        if arr.shape != (n_steps,):
            raise ValueError(
                f"amplitude list must have n_steps={n_steps} entries, "
                f"got {arr.shape}")
        return arr
    if isinstance(spec, dict):
        kind = spec.get("type", "step")
        t = dt * np.arange(n_steps)
        if kind == "step":
            return np.ones(n_steps)
        if kind == "sine":
            f = float(spec["frequency_hz"])
            phase = float(spec.get("phase", 0.0))
            return np.sin(2.0 * np.pi * f * t + phase)
        if kind == "pulse":
            t_end = float(spec["t_end"])
            return (t < t_end).astype(float)
        raise ValueError(f"unknown amplitude type: {kind!r}")
    raise ValueError(f"bad amplitude spec: {spec!r}")


def _probe_dofs(analysis: Dict, problem) -> np.ndarray:
    if "probe_dofs" in analysis:
        return np.asarray(analysis["probe_dofs"], dtype=int)
    if "probe_nodes" in analysis:
        nodes = np.asarray(analysis["probe_nodes"], dtype=int)
        d = problem.dimension
        return (d * nodes[:, None] + np.arange(d)[None, :]).reshape(-1)
    return np.arange(problem.ndof)


def _prestress_state(problem, spec):
    """Resolve a `"prestress"` spec to a static displacement state u0.

    Contract (round-3 VERDICT #2 — every capability reachable from the
    JSON tier down):

        "prestress": true                      static solve at the
                                               problem's own loads
        "prestress": {"scale": s}              s * that state
        "prestress": {"loads": [..], "scale"}  static solve at the given
                                               load vector instead
        "prestress": {"fix_dofs": [..]}        EXTRA DOFs fixed during
                                               the static solve only —
                                               a taut string's
                                               transverse DOFs have no
                                               stiffness until the
                                               tension exists, so the
                                               pretension state must be
                                               solved with them held
                                               (cf. tests/
                                               test_buckling.py's
                                               p_static pattern)
        "prestress": {"u": [..]}               an explicit state

    The static solve runs on the HOST below DENSE_DOF_LIMIT (zero device
    programs) and through solve_nr's banded path above it.
    """
    if spec in (None, False):
        return None
    loads = None
    scale = 1.0
    fix_extra = None
    if isinstance(spec, dict):
        if "u" in spec:
            u = np.asarray(spec["u"], dtype=float).reshape(-1)
            if u.size != problem.ndof:
                raise ValueError(f"prestress.u must have {problem.ndof} "
                                 f"entries, got {u.size}")
            return float(spec.get("scale", 1.0)) * u
        if "loads" in spec:
            loads = np.asarray(spec["loads"], dtype=float).reshape(-1)
            if loads.size != problem.ndof:
                raise ValueError(f"prestress.loads must have "
                                 f"{problem.ndof} entries")
        if "fix_dofs" in spec:
            fix_extra = np.asarray(spec["fix_dofs"], dtype=int)
        scale = float(spec.get("scale", 1.0))
    elif spec is not True:
        raise ValueError(f"bad prestress spec: {spec!r}")

    from ..models.problem import TrussProblem
    from ..solvers.newton import DENSE_DOF_LIMIT

    p = problem
    if fix_extra is not None:
        fixed = np.union1d(problem.fixed_dofs, fix_extra)
        p = TrussProblem(problem.nodes, problem.elements,
                         problem.material, problem.loads, fixed,
                         problem.dimension)
    if problem.ndof <= DENSE_DOF_LIMIT:
        from ..ops.host import host_static_solve

        u = host_static_solve(p, loads=loads)
    else:
        from ..config import SolverConfig
        from ..solvers.newton import solve_nr

        if loads is not None:
            p = TrussProblem(p.nodes, p.elements, p.material, loads,
                             p.fixed_dofs, p.dimension)
        res = solve_nr(p, SolverConfig(max_iterations=30,
                                       tolerance=1e-10), 1.0)
        u = np.asarray(res.displacements).reshape(-1)
    return scale * u


def _transient_force_fn(problem, analysis, dt):
    """Resolve a `"load"` spec to a force_fn.

        "load": {"type": "moving", "path_nodes": [..], "speed": v,
                 "magnitude": F, "component": 1}
        "load": {"type": "base_acceleration",
                 "history": [..] | {"type": "sine", ...},  # a_g(t),
                                       # the amplitude contract
                 "direction": [1, 0],  # shaking direction (default x)
                 "scale": 1.0}

    -> solvers.dynamics.moving_load_force_fn /
    base_excitation_force_fn (central method only; the returned
    closures carry a .host_eval twin so the host tier serves them too).
    Base acceleration solves in RELATIVE coordinates (f_eff =
    -M iota a_g), the seismic time-history complement of the response-
    spectrum block."""
    spec = analysis.get("load")
    if spec is None:
        return None
    kind = spec.get("type") if isinstance(spec, dict) else None
    if kind not in ("moving", "base_acceleration"):
        raise ValueError('load spec must be {"type": "moving", ...} or '
                         '{"type": "base_acceleration", ...}')
    if "amplitude" in analysis or "amplitudes" in analysis:
        raise ValueError(f"a {kind} load replaces the amplitude "
                         "contract; give one or the other")
    if kind == "moving":
        from ..solvers.dynamics import moving_load_force_fn

        return moving_load_force_fn(
            problem,
            path_nodes=np.asarray(spec["path_nodes"], dtype=int),
            speed=float(spec["speed"]),
            magnitude=float(spec["magnitude"]),
            dt=float(dt),
            component=int(spec.get("component",
                                   1 if problem.dimension > 1 else 0)))
    from ..solvers.dynamics import base_excitation_force_fn

    history = _amplitude_array(spec.get("history"),
                               int(analysis["n_steps"]), float(dt))
    history = float(spec.get("scale", 1.0)) * history
    return base_excitation_force_fn(
        problem, history, direction=spec.get("direction"))


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


def _run_transient_ensemble(problem, analysis, dt, n_steps, method,
                            damping, record_every, probe) -> Dict:
    """(B, n_steps) amplitude histories as one vmapped program
    (parallel/batched.solve_transient_batched): per-row probe records and
    whole-history per-element |stress| envelopes."""
    from ..parallel.batched import solve_transient_batched

    if method != "central":
        raise ValueError("ensemble transient supports method='central'")
    amps = np.asarray(analysis["amplitudes"], dtype=float)
    if amps.ndim != 2 or amps.shape[1] != n_steps:
        raise ValueError(f"amplitudes must be (B, n_steps={n_steps})")
    nonlinear = bool(analysis.get("geometric_nonlinear", False))
    out = solve_transient_batched(
        problem, dt, n_steps, amplitudes=amps,
        damping=(float(damping[0]), float(damping[1])),
        probe_dofs=np.asarray(probe), record_every=record_every,
        geometric_nonlinear=nonlinear)
    import jax

    traj, env = jax.device_get((out["displacements"], out["max_stress"]))
    return {
        "success": True,
        "analysis": "transient",
        "ensemble": True,
        "geometric_nonlinear": nonlinear,
        "batch": int(amps.shape[0]),
        "dt": float(dt),
        "n_steps": n_steps,
        "record_every": record_every,
        "probe_dofs": np.asarray(probe).tolist(),
        "times": (dt * record_every
                  * np.arange(1, n_steps // record_every + 1)).tolist(),
        "displacements": np.asarray(traj).tolist(),
        "max_stress": np.asarray(env).tolist(),
    }


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


def _omega_array(spec) -> np.ndarray:
    if isinstance(spec, (list, tuple)):
        return np.asarray(spec, dtype=float)
    if isinstance(spec, dict):
        num = int(spec.get("num", 50))
        start, stop = float(spec["start"]), float(spec["stop"])
        if spec.get("spacing", "linear") == "log":
            return np.logspace(np.log10(start), np.log10(stop), num)
        return np.linspace(start, stop, num)
    raise ValueError(f"bad omegas spec: {spec!r}")


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
        prestress_u=prestress_u)
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


def _sn_params(fat: Dict):
    """Basquin S-N parameters from a "fatigue" spec: {"sn": {"exponent":
    m, "coefficient": C}} with N S^m = C, S = stress amplitude."""
    sn = fat.get("sn")
    if not isinstance(sn, dict) or "exponent" not in sn \
            or "coefficient" not in sn:
        raise ValueError('fatigue spec needs "sn": {"exponent": m, '
                         '"coefficient": C} (Basquin N S^m = C)')
    m = float(sn["exponent"])
    c = float(sn["coefficient"])
    if m <= 0.0 or c <= 0.0:
        raise ValueError("S-N exponent and coefficient must be positive")
    return m, c


def _element_areas(problem, elm_sel):
    """Cross-section areas of the selected elements (stress = N/A)."""
    from ..ops.host import material_values_host

    return material_values_host(problem, 1.0)[1][elm_sel]


def _transient_fatigue(problem, fat: Dict, elm_sel, n_hist, times) -> Dict:
    """Rainflow/Miner damage per probed element from force histories.

    Contract: "fatigue": {"sn": {"exponent": m, "coefficient": C}} on a
    transient block with probe_elements.  Stress history is N_e(t)/A_e;
    damage is the ASTM E1049 rainflow count through the Basquin curve
    (solvers/fatigue.py) — the time-domain ground truth the random
    block's spectral methods approximate."""
    from ..solvers.fatigue import rainflow_damage

    m, c = _sn_params(fat)
    if fat.get("method", "rainflow") != "rainflow":
        raise ValueError('transient fatigue is time-domain: method must '
                         'be "rainflow" (spectral methods live on the '
                         'random block)')
    t = np.asarray(times, dtype=float)
    duration = float(t[-1] - t[0])
    if duration <= 0.0:
        raise ValueError("fatigue needs a transient spanning > 0 s")
    areas = _element_areas(problem, elm_sel)
    stress = np.asarray(n_hist, dtype=float) / areas[None, :]
    rates, counts = zip(*(rainflow_damage(stress[:, e], duration, m, c)
                          for e in range(stress.shape[1])))
    rates = np.asarray(rates, dtype=float)
    with np.errstate(divide="ignore"):
        life = np.where(rates > 0.0, 1.0 / np.maximum(rates, 1e-300),
                        np.inf)
    return {
        "method": "rainflow",
        "sn": {"exponent": m, "coefficient": c},
        "duration": duration,
        "probe_elements": elm_sel.tolist(),
        "stress_rms": np.std(stress, axis=0).tolist(),
        "cycle_count": list(counts),
        "damage_rate": rates.tolist(),
        "life_s": [None if not np.isfinite(v) else float(v)
                   for v in life],
    }


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


def _run_transient_plastic(problem, analysis: Dict) -> Dict:
    """Execute a transient block carrying a "plasticity" material spec
    (solvers/plasticity.solve_transient_plastic): explicit central-
    difference integration with the radial return committed every step.

    Composes with the plain amplitude contract only.  The elastoplastic
    integrator carries committed internal state (eps_p, alpha, back
    stress) through the scan, so prestress K_g(u0), moving loads,
    checkpoint/resume, ensembles and linear member-force recovery
    (which would misreport a yielded member's force) are rejected
    loudly rather than returned silently wrong; the integrator reports
    its own exact per-element |stress| envelope instead.
    """
    from ..solvers.plasticity import solve_transient_plastic

    spec = analysis["plasticity"]
    if not isinstance(spec, dict) or "sigma_y" not in spec:
        raise ValueError('transient "plasticity" spec must be a dict '
                         'with "sigma_y"')
    for key, why in (
            ("prestress", "initial-stress K_g"),
            ("load", "moving/base-acceleration loads"),
            ("checkpoint", "checkpoint/resume"),
            ("amplitudes", "ensemble mode"),
            ("probe_elements", "linear member-force recovery"),
            ("include_stress_envelope", "the linear batched envelope — "
                                        "stress_envelope is always "
                                        "reported"),
            ("geometric_nonlinear", "the Green-Lagrange kernel")):
        if analysis.get(key):
            raise ValueError(f'"plasticity" does not compose with '
                             f'"{key}" ({why})')
    method = analysis.get("method", "central")
    if method != "central":
        raise ValueError('"plasticity" supports method="central" only '
                         "(explicit integration commits one radial "
                         "return per step)")
    n_steps = int(analysis["n_steps"])
    damping = analysis.get("damping", [0.0, 0.0])
    dt_spec = analysis.get("dt", "auto")
    if dt_spec == "auto":
        # The ELASTIC damped bound applies: yielding only LOWERS the
        # tangent modulus, so the elastic Courant estimate stays
        # conservative (solve_transient_plastic docstring).
        dt = stable_dt(problem, damping=(float(damping[0]),
                                         float(damping[1])))
    else:
        dt = float(dt_spec)
    record_every = int(analysis.get("record_every", 1))
    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    probe = _probe_dofs(analysis, problem)
    if (probe.size * (n_steps // record_every) > 4 * _SHAPES_JSON_DOF_LIMIT
            and "probe_dofs" not in analysis
            and "probe_nodes" not in analysis):
        raise ValueError(
            "transient history would serialize "
            f"{probe.size} DOFs x {n_steps // record_every} snapshots to "
            "JSON; give probe_nodes/probe_dofs (or a larger record_every) "
            "to bound the payload")
    amplitude = _amplitude_array(analysis.get("amplitude"), n_steps, dt)
    res = solve_transient_plastic(
        problem,
        sigma_y=spec["sigma_y"],
        hardening_iso=spec.get("hardening", 0.0),
        hardening_kin=spec.get("kinematic_hardening", 0.0),
        dt=dt, n_steps=n_steps, amplitude=amplitude,
        damping=(float(damping[0]), float(damping[1])),
        record_every=record_every, probe_dofs=probe)
    yielded = np.flatnonzero(res.final_alpha > 0.0)
    return _json_finite({
        "success": True,
        "analysis": "transient",
        "plastic": True,
        "method": "central",
        "dt": float(res.dt),
        "n_steps": n_steps,
        "record_every": record_every,
        "probe_dofs": probe.tolist(),
        "times": res.times.tolist(),
        "displacements": res.displacements.tolist(),
        "velocities": res.velocities.tolist(),
        "kinetic_energy": res.kinetic_energy.tolist(),
        "strain_energy": res.strain_energy.tolist(),
        "plastic_work": res.plastic_work.tolist(),
        "external_work": res.external_work.tolist(),
        "stress_envelope": res.stress_envelope.tolist(),
        "yielded_elements": yielded.tolist(),
        "final": {
            "displacements": res.final_displacement.tolist(),
            "plastic_strain": res.final_plastic_strain.tolist(),
            "accumulated_plastic_strain": res.final_alpha.tolist(),
        },
    })


def run_transient(problem, analysis: Dict) -> Dict:
    """Execute a transient analysis block; JSON-serializable result dict."""
    if "plasticity" in analysis:
        return _run_transient_plastic(problem, analysis)
    n_steps = int(analysis["n_steps"])
    method = analysis.get("method", "central")
    dt_spec = analysis.get("dt", "auto")
    damping = analysis.get("damping", [0.0, 0.0])
    # Prestress must be resolved BEFORE the dt="auto" bound: tension
    # raises omega_max, and integrating K + K_g at the unstressed
    # critical step blows up (stable_dt docstring — pass the SAME
    # prestress you integrate with).
    prestress_u = _prestress_state(problem, analysis.get("prestress"))
    if dt_spec == "auto":
        if method not in ("central",):
            raise ValueError('dt="auto" (Gershgorin critical step) is for '
                             'method="central"; give dt explicitly')
        # The DAMPED bound: beta damping shrinks the stability limit far
        # below the undamped 2/omega_max (blows up otherwise).
        dt = stable_dt(problem,
                       damping=(float(damping[0]), float(damping[1])),
                       prestress_u=prestress_u)
    else:
        dt = float(dt_spec)
    record_every = int(analysis.get("record_every", 1))
    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    probe = _probe_dofs(analysis, problem)
    if (probe.size * (n_steps // record_every) > 4 * _SHAPES_JSON_DOF_LIMIT
            and "probe_dofs" not in analysis
            and "probe_nodes" not in analysis):
        raise ValueError(
            "transient history would serialize "
            f"{probe.size} DOFs x {n_steps // record_every} snapshots to "
            "JSON; give probe_nodes/probe_dofs (or a larger record_every) "
            "to bound the payload")
    # Member-force histories (the time-domain fatigue quantity): record
    # the probed elements' DOFs alongside the user's probe and recover
    # N_e(t) on the host afterwards — same per-quantity principle as the
    # harmonic force FRFs (linear g.u recovery; the Green-Lagrange
    # quadratic term is added for geometric_nonlinear runs so the
    # reported force is the one the integrator actually applied).
    probe_elements = analysis.get("probe_elements")
    elm_sel = s_sel = gvec_sel = dm_sel = inv_len_sel = None
    rec_probe = probe
    if probe_elements is not None:
        from ..ops.host import _geometry
        from ..solvers.harmonic import _element_frf_constants

        elm_sel = np.asarray(probe_elements, dtype=int).reshape(-1)
        # Payload policy: the guard protects the JSON, not the compute —
        # fatigue wants the FULL-RATE history (decimation destroys
        # cycles), so "include_force_histories": false computes damage
        # on the full record and serializes only the summary.
        hist_fits = (elm_sel.size * (n_steps // record_every)
                     <= 4 * _SHAPES_JSON_DOF_LIMIT)
        include_hist = analysis.get("include_force_histories")
        if include_hist is None:
            include_hist = hist_fits
            if not hist_fits and "fatigue" not in analysis:
                raise ValueError(
                    f"member-force histories would serialize "
                    f"{elm_sel.size} elements x "
                    f"{n_steps // record_every} snapshots to JSON; "
                    "probe fewer elements, raise record_every, or add a "
                    '"fatigue" block (the summary serializes without '
                    "the histories)")
        else:
            # Explicit is trusted either way (same philosophy as an
            # explicit probe_dofs overriding the displacement guard).
            include_hist = bool(include_hist)
        if "amplitudes" in analysis:
            raise ValueError("probe_elements composes with single-run "
                             "transients; the ensemble path reports the "
                             "stress envelope instead "
                             "(include_stress_envelope)")
        elm_sel, s_sel, gvec_sel, dm_sel = _element_frf_constants(
            problem, elm_sel)
        inv_len_sel = _geometry(problem)[2][elm_sel]
        rec_probe = np.unique(np.concatenate([probe,
                                              dm_sel.reshape(-1)]))
    force_fn = _transient_force_fn(problem, analysis, dt)
    checkpoint = analysis.get("checkpoint")
    if analysis.get("include_stress_envelope", False):
        # Validate the envelope's compatibility BEFORE integrating: the
        # batched envelope core carries neither K_g(u0) nor a moving
        # load, and a checkpointed response holds only the resumed
        # segments — rejecting after a minutes-long solve would burn
        # the whole run on an input error knowable up front.
        if method != "central":
            raise ValueError("include_stress_envelope supports the "
                             "central method")
        if prestress_u is not None or force_fn is not None \
                or checkpoint is not None:
            raise ValueError("include_stress_envelope supports the plain "
                             "amplitude contract only (no prestress, "
                             "moving load or checkpointing — the batched "
                             "envelope core integrates K u under "
                             "amplitude * loads)")
    if "amplitudes" in analysis:         # ensemble mode
        if prestress_u is not None or force_fn is not None or checkpoint:
            raise ValueError("ensemble transient composes with "
                             "geometric_nonlinear only; run prestress/"
                             "moving-load/checkpoint cases unbatched")
        b = len(analysis["amplitudes"])
        if (b * probe.size * (n_steps // record_every)
                > 4 * _SHAPES_JSON_DOF_LIMIT):
            raise ValueError(
                f"ensemble history would serialize {b} x {probe.size} "
                f"DOFs x {n_steps // record_every} snapshots to JSON; "
                "reduce the batch, give probe_nodes/probe_dofs, or raise "
                "record_every")
        return _run_transient_ensemble(problem, analysis, dt, n_steps,
                                       method, damping, record_every,
                                       probe)
    amplitude = _amplitude_array(analysis.get("amplitude"), n_steps, dt)

    kw = dict(
        amplitude=amplitude,
        damping=(float(damping[0]), float(damping[1])),
        method=method, record_every=record_every, probe_dofs=rec_probe,
        newmark_beta=float(analysis.get("newmark_beta", 0.25)),
        newmark_gamma=float(analysis.get("newmark_gamma", 0.5)),
        geometric_nonlinear=bool(analysis.get("geometric_nonlinear",
                                              False)),
        n_modes=int(analysis.get("n_modes", 32)),
        prestress_u=prestress_u,
        force_fn=force_fn,
    )
    if checkpoint is not None:
        # Preemption-safe JSON contract (round-3 VERDICT #2):
        # "checkpoint": {"dir": path, "every": steps, "resume": true}.
        # A rerun of the same request continues from the last persisted
        # segment and returns the full stitched history.
        if not isinstance(checkpoint, dict) or "dir" not in checkpoint \
                or "every" not in checkpoint:
            raise ValueError('checkpoint spec must be {"dir": ..., '
                             '"every": ..., "resume": bool?}')
        from ..solvers.dynamics import solve_transient_checkpointed

        res = solve_transient_checkpointed(
            problem, dt, n_steps,
            checkpoint_dir=checkpoint["dir"],
            checkpoint_every=int(checkpoint["every"]),
            resume=bool(checkpoint.get("resume", True)), **kw)
    else:
        res = solve_transient(problem, dt=dt, n_steps=n_steps, **kw)
    out = {
        "success": True,
        "analysis": "transient",
        "method": method,
        "dt": float(dt),
        "n_steps": n_steps,
        "record_every": record_every,
        "prestressed": prestress_u is not None,
        # The load kind when a "load" spec drove the run ("moving" |
        # "base_acceleration"); "moving_load" kept for back-compat.
        "load_type": (analysis["load"].get("type")
                      if force_fn is not None else None),
        "moving_load": (force_fn is not None
                        and analysis["load"].get("type") == "moving"),
        "checkpointed": checkpoint is not None,
        "probe_dofs": probe.tolist(),
        "times": res.times.tolist(),
        "kinetic_energy": res.kinetic_energy.tolist(),
        "strain_energy": res.strain_energy.tolist(),
    }
    disp = np.asarray(res.displacements, dtype=float)
    velo = np.asarray(res.velocities, dtype=float)
    if probe_elements is None:
        out["displacements"] = disp.tolist()
        out["velocities"] = velo.tolist()
    else:
        # The solver recorded the UNION of the user's probe and the
        # probed elements' DOFs; slice the user's view back out and
        # recover the member forces from the element columns.
        pos = np.searchsorted(rec_probe, probe)
        out["displacements"] = disp[:, pos].tolist()
        out["velocities"] = velo[:, pos].tolist()
        u_e = disp[:, np.searchsorted(rec_probe, dm_sel)]  # (n_rec, n_e, 2d)
        n_hist = s_sel[None, :] * np.sum(gvec_sel[None] * u_e, axis=-1)
        if bool(analysis.get("geometric_nonlinear", False)):
            d = problem.dimension
            du_rel = u_e[:, :, d:] - u_e[:, :, :d]
            n_hist = n_hist + 0.5 * s_sel[None, :] * inv_len_sel[None, :] \
                * np.sum(du_rel * du_rel, axis=-1)
        out["probe_elements"] = elm_sel.tolist()
        if include_hist:
            out["force_histories"] = n_hist.tolist()
        fat = analysis.get("fatigue")
        if fat is not None:
            out["fatigue"] = _transient_fatigue(problem, fat, elm_sel,
                                                n_hist, res.times)
    if analysis.get("include_stress_envelope", False):
        # Per-element |stress| envelope over EVERY step (the design-check
        # quantity) via the batched core with B = 1 — compatibility was
        # validated BEFORE the integration above.
        from ..parallel.batched import solve_transient_batched

        env = solve_transient_batched(
            problem, dt, n_steps, amplitudes=amplitude[None, :n_steps],
            damping=(float(damping[0]), float(damping[1])),
            probe_dofs=probe, record_every=record_every,
            geometric_nonlinear=bool(analysis.get("geometric_nonlinear",
                                                  False)))["max_stress"]
        import jax

        out["max_stress"] = np.asarray(
            jax.device_get(env))[0].tolist()
    if analysis.get("include_final",
                    problem.ndof <= _SHAPES_JSON_DOF_LIMIT):
        out["u_final"] = res.u_final.tolist()
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


def _local_cpu_ctx(analysis: Dict):
    """Context manager for the identification family's LOCAL-CPU tier
    (run_identification docstring): jit on the host CPU backend unless
    "on_device" opts back into the default accelerator.  Falls back to a
    null context when no cpu backend exists."""
    import contextlib

    import jax as _jax

    if analysis.get("on_device", False):
        return contextlib.nullcontext()
    try:
        return _jax.default_device(_jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def _run_field_identification(problem, analysis: Dict, n_steps: int,
                              record_every: int, n_rec: int, damping,
                              synthetic_spec) -> Dict:
    """Field-mode identification: a spatially-varying material profile
    (an MLP field, the reference's NN-property parameterization) trained
    against the transient probe history instead of a static deflection
    (solvers/transient_inverse.identify_field_from_transient).

    Contract (extends the scalar identification block):

        "analysis": {"type": "identification",
                     "field": {"name": "young",        # | "area" | "density"
                               "hidden_layers": 1,
                               "neurons_per_layer": 8,
                               "input_dim": <problem dim>,  # spatial net
                               "scale": <mean of current field>,
                               "seed": 0},
                     "dt": 0.02 | "auto", "n_steps": 600,
                     "probe_nodes": [..] | "probe_dofs": [..],
                     "measured": [[..], ..]
                       | "synthetic": {"young": [..nelm true values..] | E,
                                       "noise": 0.01, "seed": 0},
                     ...}   # amplitude/damping/n_iter/learning_rate as
                            # in scalar mode

    In twin-data mode the truth is a PER-ELEMENT value array (a tabulated
    profile needs no Field object — transient_probe_response_elem feeds
    it to the element kernel directly); the response reports the
    recovered field at the nodes and element centroids in the
    identified_properties "at_nodes"/"at_elements" shape (io/results.py)
    plus per-element relative errors against the truth."""

    import jax as _jax

    from ..models.fields import make_mlp_field, point_inputs_dict_order
    from ..ops.host import _assembly_inputs, eval_field_host
    from ..solvers.transient_inverse import (
        _PARAM_ORDER, identify_field_from_transient,
        transient_probe_response, transient_probe_response_elem)

    spec = analysis["field"]
    if isinstance(spec, str):
        spec = {"name": spec}
    if not isinstance(spec, dict):
        raise ValueError('"field" must be an object (or a field name)')
    name = spec.get("name", "young")
    if name not in _PARAM_ORDER:
        raise ValueError(f'field.name must be among {list(_PARAM_ORDER)}, '
                         f'got {name!r}')
    unknown = set(spec) - {"name", "hidden_layers", "neurons_per_layer",
                           "input_dim", "scale", "seed"}
    if unknown:
        raise ValueError(f"unknown field keys: {sorted(unknown)}")

    nelm = len(problem.elements)
    x_mid = _assembly_inputs(problem, 1.0)
    cur = {p: np.asarray(eval_field_host(getattr(problem.material, p),
                                         x_mid), dtype=float)
           for p in _PARAM_ORDER}

    measured = analysis.get("measured")
    if (measured is None) == (synthetic_spec is None):
        raise ValueError('identification needs exactly one of "measured" '
                         'or "synthetic"')
    true_e = None
    if synthetic_spec is not None:
        unknown = set(synthetic_spec) - {name, "noise", "seed"}
        if unknown:
            raise ValueError(
                f'field-mode synthetic takes only "{name}", "noise" and '
                f'"seed"; got {sorted(unknown)}')
        if name not in synthetic_spec:
            raise ValueError(f'field-mode synthetic must provide the true '
                             f'"{name}" profile (per-element values or a '
                             f'constant)')
        tv = synthetic_spec[name]
        true_e = (np.full(nelm, float(tv)) if np.isscalar(tv)
                  else np.asarray(tv, dtype=float))
        if true_e.shape != (nelm,):
            raise ValueError(f"true {name} profile must have one value "
                             f"per element ({nelm}), got {true_e.shape}")
        if not (np.all(np.isfinite(true_e)) and np.all(true_e > 0)):
            raise ValueError(f"true {name} values must be positive finite")

    dt_spec = analysis["dt"]
    if dt_spec == "auto":
        if true_e is None:
            raise ValueError('dt="auto" needs "synthetic" twin data; a '
                             'measured history fixes its own dt')
        from ..models.fields import ScalarField as _SF
        from ..models.problem import TrussProblem as _TP

        # Gershgorin bound of the TRUE profile: omega_max grows with
        # stiffness (young/area) and shrinks with mass (density), so the
        # critical dt comes from the stiffest/lightest element.
        bound = (np.max if name in ("young", "area") else np.min)(true_e)
        true_problem = _TP(
            problem.nodes, problem.elements,
            problem.material.replace(**{name: _SF(value=float(bound))}),
            problem.loads, problem.fixed_dofs, problem.dimension)
        # Same safety=0.45 rationale as scalar mode: the optimizer
        # integrates every profile it visits, including overshoots.
        dt = stable_dt(true_problem, damping=damping, safety=0.45)
    else:
        dt = float(dt_spec)
    probe = _probe_dofs(analysis, problem)
    amplitude = _amplitude_array(analysis.get("amplitude"), n_steps, dt)

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        if true_e is not None:
            vals = dict(cur)
            vals[name] = true_e
            meas = np.asarray(_jax.device_get(transient_probe_response_elem(
                problem, vals["young"], vals["area"], vals["density"],
                dt, n_steps, amplitude, probe, record_every=record_every,
                damping=damping)))
            noise_rel = float(synthetic_spec.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(
                    int(synthetic_spec.get("seed", 0)))
                meas = meas + noise_rel * np.max(np.abs(meas)) \
                    * rng.standard_normal(meas.shape)
        else:
            meas = np.asarray(measured, dtype=float)
            if meas.ndim != 2 or meas.shape != (n_rec, probe.size):
                raise ValueError(
                    f"measured must be (n_steps/record_every={n_rec}, "
                    f"n_probe={probe.size}) rows, got {meas.shape}")

        nn = make_mlp_field(
            _jax.random.PRNGKey(int(spec.get("seed", 0))),
            hidden_layers=int(spec.get("hidden_layers", 1)),
            neurons_per_layer=int(spec.get("neurons_per_layer", 8)),
            input_dim=int(spec.get("input_dim", problem.dimension)),
            scale=float(spec.get("scale",
                                 max(float(np.mean(cur[name])), 1e-12))))
        trained, hist = identify_field_from_transient(
            problem, meas, dt, n_steps, probe, field=name, nn_field=nn,
            amplitude=amplitude, record_every=record_every,
            damping=damping, n_iter=int(analysis.get("n_iter", 600)),
            learning_rate=float(analysis.get("learning_rate", 0.05)))

        # Field evaluation uses the SAME column convention assembly
        # trained it under: dict-order (load_factor, x[, y]) rows at
        # lf=1, narrowed spatially-first by MLPField._adapt_inputs.
        dim = problem.dimension
        centroids = problem.element_midpoints()
        node_coords = problem.node_coords_2d
        vals_e = np.asarray(trained.eval_batch(
            point_inputs_dict_order(centroids, dim, 1.0)), dtype=float)
        vals_n = np.asarray(trained.eval_batch(
            point_inputs_dict_order(node_coords, dim, 1.0)), dtype=float)

        def _coords(c):
            c = np.asarray(c)
            return (c.reshape(-1).tolist() if dim == 1 else c.tolist())

        out = {
            "success": True,
            "analysis": "identification",
            "mode": "field",
            "field": name,
            "identified_field": {
                "at_nodes": {"coords": _coords(problem.nodes if dim == 1
                                               else node_coords),
                             "values": vals_n.tolist()},
                "at_elements": {"centroids": _coords(centroids),
                                "values": vals_e.tolist()},
                "type": "nn",
                "input_dim": nn.input_dim,
            },
            "dt": dt,
            "n_steps": n_steps,
            "record_every": record_every,
            "probe_dofs": probe.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_e is not None:
            rel = np.abs(vals_e - true_e) / np.abs(true_e)
            out["synthetic"] = True
            out["true_values"] = true_e.tolist()
            out["noise"] = noise_rel
            out["field_max_rel_error"] = float(np.max(rel))
            out["field_rmse_rel"] = float(np.sqrt(np.mean(rel * rel)))
        if analysis.get("include_fit",
                        probe.size * n_rec <= 4 * _SHAPES_JSON_DOF_LIMIT):
            fit_mat = problem.material.replace(**{name: trained})
            fit = np.asarray(_jax.device_get(transient_probe_response(
                problem, fit_mat, dt, n_steps, amplitude, probe,
                record_every=record_every, damping=damping)))
            scale = max(float(np.max(np.abs(meas))), 1e-30)
            out["fitted_displacements"] = fit.tolist()
            out["measured_displacements"] = meas.tolist()
            out["fit_rmse_rel"] = float(
                np.sqrt(np.mean((fit - meas) ** 2)) / scale)
    return out


def _run_modal_field_identification(problem, analysis: Dict) -> Dict:
    """Field mode of the modal-domain block
    (solvers/modal_inverse.identify_field_from_modal): a spatial MLP
    profile — canonically rho(x), which no static method sees at all —
    recovered from natural frequencies plus phi^2 sensor rows
    (examples/modal_identification.py's workflow, productized).

    Contract (the modal sibling of the transient field mode):

        "analysis": {"type": "identification", "domain": "modal",
                     "field": {"name": "density", "hidden_layers": 1,
                               "neurons_per_layer": 8,
                               "input_dim": <problem dim>,
                               "scale": <mean of current field>,
                               "seed": 0},
                     "sensor_nodes": [..] | "sensor_dofs": [..],  # REQUIRED
                     "measured_frequencies_hz": [..k..]
                       + "measured_shapes2": [[..], ..]  # (n_sensor, k)
                       | "synthetic": {"density":
                                           [..nelm true values..] | rho,
                                       "n_modes": 6, "noise": 0.0,
                                       "seed": 0},
                     "n_iter": 800, "learning_rate": 0.02}
    """

    import jax as _jax

    from ..models.fields import make_mlp_field, point_inputs_dict_order
    from ..ops.host import _assembly_inputs, eval_field_host
    from ..solvers.modal_inverse import (identify_field_from_modal,
                                         modal_observables,
                                         modal_observables_elem)
    from ..solvers.transient_inverse import _PARAM_ORDER

    spec = analysis["field"]
    if isinstance(spec, str):
        spec = {"name": spec}
    if not isinstance(spec, dict):
        raise ValueError('"field" must be an object (or a field name)')
    name = spec.get("name", "density")
    if name not in _PARAM_ORDER:
        raise ValueError(f'field.name must be among {list(_PARAM_ORDER)}, '
                         f'got {name!r}')
    unknown = set(spec) - {"name", "hidden_layers", "neurons_per_layer",
                           "input_dim", "scale", "seed"}
    if unknown:
        raise ValueError(f"unknown field keys: {sorted(unknown)}")

    sensors = None
    if "sensor_dofs" in analysis or "sensor_nodes" in analysis:
        sensors = _probe_dofs({"probe_dofs": analysis["sensor_dofs"]}
                              if "sensor_dofs" in analysis
                              else {"probe_nodes":
                                    analysis["sensor_nodes"]}, problem)
    if sensors is None:
        raise ValueError(
            "modal field identification needs sensor_nodes/sensor_dofs "
            "(frequencies alone underdetermine a spatial profile)")

    nelm = len(problem.elements)
    x_mid = _assembly_inputs(problem, 1.0)
    cur = {p: np.asarray(eval_field_host(getattr(problem.material, p),
                                         x_mid), dtype=float)
           for p in _PARAM_ORDER}

    measured = analysis.get("measured_frequencies_hz")
    synthetic = analysis.get("synthetic")
    if synthetic is not None and not isinstance(synthetic, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if (measured is None) == (synthetic is None):
        raise ValueError('modal identification needs exactly one of '
                         '"measured_frequencies_hz" or "synthetic"')

    true_e = None
    if synthetic is not None:
        unknown = set(synthetic) - {name, "n_modes", "noise", "seed"}
        if unknown:
            raise ValueError(
                f'field-mode synthetic takes only "{name}", "n_modes", '
                f'"noise" and "seed"; got {sorted(unknown)}')
        if name not in synthetic:
            raise ValueError(f'field-mode synthetic must provide the '
                             f'true "{name}" profile')
        tv = synthetic[name]
        true_e = (np.full(nelm, float(tv)) if np.isscalar(tv)
                  else np.asarray(tv, dtype=float))
        if true_e.shape != (nelm,):
            raise ValueError(f"true {name} profile must have one value "
                             f"per element ({nelm}), got {true_e.shape}")
        if not (np.all(np.isfinite(true_e)) and np.all(true_e > 0)):
            raise ValueError(f"true {name} values must be positive finite")

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        if true_e is not None:
            vals = dict(cur)
            vals[name] = true_e
            n_modes = int(synthetic.get("n_modes", 6))
            lam, s2 = modal_observables_elem(
                problem, vals["young"], vals["area"], vals["density"],
                n_modes, sensor_dofs=sensors)
            lam = np.asarray(_jax.device_get(lam))
            f_meas = np.sqrt(np.maximum(lam, 0.0)) / (2.0 * np.pi)
            shapes2 = np.asarray(_jax.device_get(s2))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                f_meas = f_meas * (1.0 + noise_rel
                                   * rng.standard_normal(f_meas.shape))
                shapes2 = np.abs(shapes2 * (
                    1.0 + noise_rel
                    * rng.standard_normal(shapes2.shape)))
        else:
            f_meas = np.asarray(measured, dtype=float).reshape(-1)
            shapes2 = analysis.get("measured_shapes2")
            if shapes2 is None:
                raise ValueError('modal field identification needs '
                                 '"measured_shapes2" alongside the '
                                 'measured frequencies')
            shapes2 = np.asarray(shapes2, dtype=float)

        nn = make_mlp_field(
            _jax.random.PRNGKey(int(spec.get("seed", 0))),
            hidden_layers=int(spec.get("hidden_layers", 1)),
            neurons_per_layer=int(spec.get("neurons_per_layer", 8)),
            input_dim=int(spec.get("input_dim", problem.dimension)),
            scale=float(spec.get("scale",
                                 max(float(np.mean(cur[name])), 1e-12))))
        trained, hist = identify_field_from_modal(
            problem, f_meas, sensor_dofs=sensors,
            measured_shapes2=shapes2, field=name, nn_field=nn,
            n_iter=int(analysis.get("n_iter", 800)),
            learning_rate=float(analysis.get("learning_rate", 0.02)))

        dim = problem.dimension
        centroids = problem.element_midpoints()
        node_coords = problem.node_coords_2d
        vals_e = np.asarray(trained.eval_batch(
            point_inputs_dict_order(centroids, dim, 1.0)), dtype=float)
        vals_n = np.asarray(trained.eval_batch(
            point_inputs_dict_order(node_coords, dim, 1.0)), dtype=float)

        def _coords(c):
            c = np.asarray(c)
            return (c.reshape(-1).tolist() if dim == 1 else c.tolist())

        out = {
            "success": True,
            "analysis": "identification",
            "domain": "modal",
            "mode": "field",
            "field": name,
            "identified_field": {
                "at_nodes": {"coords": _coords(problem.nodes if dim == 1
                                               else node_coords),
                             "values": vals_n.tolist()},
                "at_elements": {"centroids": _coords(centroids),
                                "values": vals_e.tolist()},
                "type": "nn",
                "input_dim": nn.input_dim,
            },
            "measured_frequencies_hz": np.asarray(f_meas).tolist(),
            "sensor_dofs": sensors.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_e is not None:
            rel = np.abs(vals_e - true_e) / np.abs(true_e)
            out["synthetic"] = True
            out["true_values"] = true_e.tolist()
            out["noise"] = noise_rel
            out["field_max_rel_error"] = float(np.max(rel))
            out["field_rmse_rel"] = float(np.sqrt(np.mean(rel * rel)))
        # Fitted spectrum with the trained field in place.
        fit_mat = problem.material.replace(**{name: trained})
        lam_fit, _ = modal_observables(problem, fit_mat, len(f_meas),
                                       sensor_dofs=None)
        lam_fit = np.asarray(_jax.device_get(lam_fit))
        f_fit = np.sqrt(np.maximum(lam_fit, 0.0)) / (2.0 * np.pi)
        out["fitted_frequencies_hz"] = f_fit.tolist()
        out["frequency_rel_error"] = (
            np.abs(f_fit - f_meas) / np.maximum(np.abs(f_meas), 1e-30)
        ).tolist()
    return out


def _run_modal_identification(problem, analysis: Dict) -> Dict:
    """Modal-domain identification block (solvers/modal_inverse.py):
    parameters fitted to extracted natural frequencies — the
    experimental-modal-analysis workflow.

    Contract:

        "analysis": {"type": "identification", "domain": "modal",
                     "params": ["young"],   # any of young/area/density;
                                            # a stiffness param TOGETHER
                                            # with density needs sensor
                                            # shape data (omega^2 ~
                                            # EA/rho: a spectrum alone
                                            # sees only the ratio)
                     "measured_frequencies_hz": [..k lowest..]
                       | "synthetic": {"young": E, "density": rho,
                                       "n_modes": 4, "noise": 0.01,
                                       "seed": 0},
                     "sensor_nodes": [..] | "sensor_dofs": [..],
                     "measured_shapes2": [[..], ..],  # (n_sensor, k)
                                            # phi^2, M-orthonormal
                                            # (synthetic mode generates
                                            # it when sensors are given)
                     "n_iter": 300, "learning_rate": 0.05,
                     "initial": {..}}

    Twin-data noise is relative on the frequencies (and on phi^2).
    Rayleigh damping is invisible to undamped frequencies — use the
    time-domain or FRF routes for alpha/beta."""

    import jax as _jax

    from ..solvers.modal_inverse import (identify_from_modal,
                                         modal_observables)
    from ..solvers.newton import DENSE_DOF_LIMIT
    from ..solvers.transient_inverse import _PARAM_ORDER

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(
            f"modal-domain identification is dense-only "
            f"({problem.ndof} DOFs > {DENSE_DOF_LIMIT}); identify on a "
            f"coarser model of the structure")
    if analysis.get("field") is not None:
        # Field mode: a spatial MLP profile (canonically rho(x)) from
        # frequencies + phi^2 sensors (see
        # _run_modal_field_identification).
        if "params" in analysis:
            raise ValueError('"params" and "field" are mutually '
                             'exclusive: field mode recovers one spatial '
                             'profile, not scalar parameters')
        return _run_modal_field_identification(problem, analysis)
    params = tuple(analysis.get("params", ["young"]))
    for p in params:
        if p not in _PARAM_ORDER:
            raise ValueError(
                f"modal identification params must be among "
                f"{list(_PARAM_ORDER)} (damping is invisible to "
                f"undamped frequencies), got {p!r}")

    sensors = None
    if "sensor_dofs" in analysis or "sensor_nodes" in analysis:
        sensors = _probe_dofs({"probe_dofs": analysis["sensor_dofs"]}
                              if "sensor_dofs" in analysis
                              else {"probe_nodes":
                                    analysis["sensor_nodes"]}, problem)

    measured = analysis.get("measured_frequencies_hz")
    synthetic = analysis.get("synthetic")
    if synthetic is not None and not isinstance(synthetic, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if (measured is None) == (synthetic is None):
        raise ValueError('modal identification needs exactly one of '
                         '"measured_frequencies_hz" or "synthetic" '
                         '(true parameter values for twin data)')
    shapes2 = analysis.get("measured_shapes2")
    if shapes2 is not None and sensors is None:
        raise ValueError('"measured_shapes2" needs "sensor_nodes" or '
                         '"sensor_dofs"')

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        true_vals = None
        if synthetic is not None:
            true_vals = {k: float(v) for k, v in synthetic.items()
                         if k in _PARAM_ORDER}
            unknown = (set(synthetic) - set(_PARAM_ORDER)
                       - {"n_modes", "noise", "seed"})
            if unknown:
                raise ValueError(f"unknown synthetic keys: "
                                 f"{sorted(unknown)}")
            from ..models.fields import ScalarField as _SF

            true_mat = problem.material.replace(
                **{k: _SF(value=v) for k, v in true_vals.items()})
            n_modes = int(synthetic.get("n_modes", 4))
            lam, s2 = modal_observables(problem, true_mat, n_modes,
                                        sensor_dofs=sensors)
            lam = np.asarray(_jax.device_get(lam))
            f_meas = np.sqrt(np.maximum(lam, 0.0)) / (2.0 * np.pi)
            if sensors is not None:
                shapes2 = np.asarray(_jax.device_get(s2))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                f_meas = f_meas * (1.0 + noise_rel
                                   * rng.standard_normal(f_meas.shape))
                if shapes2 is not None:
                    shapes2 = np.abs(shapes2 * (
                        1.0 + noise_rel
                        * rng.standard_normal(shapes2.shape)))
        else:
            f_meas = np.asarray(measured, dtype=float).reshape(-1)
            if shapes2 is not None:
                shapes2 = np.asarray(shapes2, dtype=float)

        initial = {k: float(v)
                   for k, v in (analysis.get("initial") or {}).items()}
        for p in params:
            from ..models.fields import ScalarField

            if p not in initial and not isinstance(
                    getattr(problem.material, p), ScalarField):
                from ..ops.host import _assembly_inputs, eval_field_host

                vals = eval_field_host(getattr(problem.material, p),
                                       _assembly_inputs(problem, 1.0))
                initial[p] = max(float(np.mean(vals)), 1e-12)
        initial = initial or None
        ident, hist = identify_from_modal(
            problem, f_meas, sensor_dofs=sensors,
            measured_shapes2=shapes2, params=params,
            n_iter=int(analysis.get("n_iter", 300)),
            learning_rate=float(analysis.get("learning_rate", 0.05)),
            initial=initial)

        out = {
            "success": True,
            "analysis": "identification",
            "domain": "modal",
            "params": list(params),
            "identified": ident,
            "measured_frequencies_hz": np.asarray(f_meas).tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if sensors is not None:
            out["sensor_dofs"] = sensors.tolist()
        if true_vals is not None:
            out["synthetic"] = True
            out["true_values"] = true_vals
            out["noise"] = noise_rel
            out["relative_errors"] = {
                k: abs(ident[k] - true_vals[k]) / abs(true_vals[k])
                for k in ident if k in true_vals}
        # The fitted spectrum (and its relative error) always fits in
        # JSON — a handful of modes.
        from ..models.fields import ScalarField

        fit_mat = problem.material.replace(
            **{k: ScalarField(value=v) for k, v in ident.items()})
        lam_fit, _ = modal_observables(problem, fit_mat, len(f_meas),
                                       sensor_dofs=None)
        lam_fit = np.asarray(_jax.device_get(lam_fit))
        f_fit = np.sqrt(np.maximum(lam_fit, 0.0)) / (2.0 * np.pi)
        out["fitted_frequencies_hz"] = f_fit.tolist()
        out["frequency_rel_error"] = (
            np.abs(f_fit - f_meas) / np.maximum(np.abs(f_meas), 1e-30)
        ).tolist()
    return out


def _run_frf_identification(problem, analysis: Dict) -> Dict:
    """Frequency-domain identification block
    (solvers/frequency_inverse.py): material and Rayleigh damping fitted
    to measured FRF amplitudes — the classic model-updating workflow
    (shaker sweep in, parameters out).

    Contract:

        "analysis": {"type": "identification", "domain": "frequency",
                     "omegas": [..] | {"start": w0, "stop": w1,
                                       "num": 120},
                     "params": ["young", "density", "alpha", "beta"],
                     "damping": [a0, b0],   # fixed values / start guess
                     "probe_nodes": [..] | "probe_dofs": [..],
                     "measured_amplitude": [[..], ..]  # (n_freq, n_probe)
                       | "synthetic": {"young": E, "density": rho,
                                       "alpha": a, "beta": b,
                                       "noise": 0.02, "seed": 0},
                     "n_iter": 400, "learning_rate": 0.08,
                     "restarts": 3,   # multi-start (FRF fitting is
                                      # multi-modal; see
                                      # identify_from_frf)
                     "initial": {..}, "include_fit": true}

    Twin-data noise is MULTIPLICATIVE (per-point relative,
    amp * (1 + noise * randn)): an FRF spans decades between
    anti-resonances and peaks, so additive noise at a fraction of the
    peak would swamp the low-amplitude structure the log-loss fits.
    Runs on the local CPU tier like the time-domain block (the program
    is a differentiated frequency sweep the numpy host tier cannot
    mirror)."""

    import jax as _jax

    from ..models.fields import ScalarField
    from ..solvers.frequency_inverse import (frf_probe_amplitudes,
                                             identify_from_frf)
    from ..solvers.newton import DENSE_DOF_LIMIT
    from ..solvers.transient_inverse import _DAMP_PARAMS, _PARAM_ORDER

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(
            f"frequency-domain identification is dense-only "
            f"({problem.ndof} DOFs > {DENSE_DOF_LIMIT}); identify on a "
            f"coarser model of the structure")
    omegas = _omega_array(analysis["omegas"])
    damping = analysis.get("damping", [0.0, 0.0])
    damping = (float(damping[0]), float(damping[1]))
    params = tuple(analysis.get("params", ["young", "density"]))
    for p in params:
        if p not in _PARAM_ORDER + _DAMP_PARAMS:
            raise ValueError(f"identification params must be among "
                             f"{list(_PARAM_ORDER + _DAMP_PARAMS)}, "
                             f"got {p!r}")
    probe = _probe_dofs(analysis, problem)

    measured = analysis.get("measured_amplitude")
    synthetic = analysis.get("synthetic")
    if synthetic is not None and not isinstance(synthetic, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if (measured is None) == (synthetic is None):
        raise ValueError('frequency-domain identification needs exactly '
                         'one of "measured_amplitude" (an '
                         '(n_freq, n_probe) |X| table) or "synthetic" '
                         '(true parameter values for twin data)')

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        true_vals = None
        if synthetic is not None:
            true_vals = {k: float(v) for k, v in synthetic.items()
                         if k in _PARAM_ORDER + _DAMP_PARAMS}
            unknown = (set(synthetic) - set(_PARAM_ORDER)
                       - set(_DAMP_PARAMS) - {"noise", "seed"})
            if unknown:
                raise ValueError(f"unknown synthetic keys: "
                                 f"{sorted(unknown)}")
            true_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in true_vals.items()
                   if k in _PARAM_ORDER})
            true_damp = (true_vals.get("alpha", damping[0]),
                         true_vals.get("beta", damping[1]))
            meas = np.asarray(_jax.device_get(frf_probe_amplitudes(
                problem, true_mat, omegas, true_damp, probe)))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                meas = meas * (1.0 + noise_rel
                               * rng.standard_normal(meas.shape))
                meas = np.abs(meas)       # amplitudes stay nonnegative
        else:
            meas = np.asarray(measured, dtype=float)
            if meas.ndim != 2 or meas.shape != (omegas.size, probe.size):
                raise ValueError(
                    f"measured_amplitude must be (n_freq={omegas.size}, "
                    f"n_probe={probe.size}), got {meas.shape}")

        initial = {k: float(v)
                   for k, v in (analysis.get("initial") or {}).items()}
        for p in params:
            if p not in _PARAM_ORDER:
                continue
            if p not in initial and not isinstance(
                    getattr(problem.material, p), ScalarField):
                from ..ops.host import _assembly_inputs, eval_field_host

                vals = eval_field_host(getattr(problem.material, p),
                                       _assembly_inputs(problem, 1.0))
                initial[p] = max(float(np.mean(vals)), 1e-12)
        initial = initial or None
        ident, hist = identify_from_frf(
            problem, meas, omegas, probe, params=params, damping=damping,
            n_iter=int(analysis.get("n_iter", 400)),
            learning_rate=float(analysis.get("learning_rate", 0.08)),
            initial=initial,
            # Multi-start by default: FRF fitting is multi-modal (a far
            # starting stiffness locks onto the wrong resonance), and a
            # JSON caller has no cheap way to probe the basin.
            restarts=int(analysis.get("restarts", 3)))

        out = {
            "success": True,
            "analysis": "identification",
            "domain": "frequency",
            "params": list(params),
            "identified": ident,
            "omegas": omegas.tolist(),
            "probe_dofs": probe.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_vals is not None:
            out["synthetic"] = True
            out["true_values"] = true_vals
            out["noise"] = noise_rel
            out["relative_errors"] = {
                k: abs(ident[k] - true_vals[k]) / abs(true_vals[k])
                for k in ident if k in true_vals}
        if analysis.get("include_fit",
                        probe.size * omegas.size
                        <= 4 * _SHAPES_JSON_DOF_LIMIT):
            fit_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in ident.items()
                   if k in _PARAM_ORDER})
            fit_damp = (ident.get("alpha", damping[0]),
                        ident.get("beta", damping[1]))
            fit = np.asarray(_jax.device_get(frf_probe_amplitudes(
                problem, fit_mat, omegas, fit_damp, probe)))
            floor = 1e-12 * max(float(np.max(meas)), 1e-30)
            out["fitted_amplitude"] = fit.tolist()
            out["measured_amplitude"] = meas.tolist()
            # Log-space RMS, the quantity the fit minimizes.
            out["fit_rms_log"] = float(np.sqrt(np.mean(
                (np.log(fit + floor) - np.log(meas + floor)) ** 2)))
    return out


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


def run_identification(problem, analysis: Dict) -> Dict:
    """Execute a time-domain identification block
    (solvers/transient_inverse.py): scalar material parameters recovered
    from a measured probe displacement history by reverse-mode AD through
    the central-difference integrator (the discrete adjoint).

    Contract (the round-3 tier-gap closure: every capability reachable
    from the JSON tier down, io/analysis.py:49-51 standard):

        "analysis": {"type": "identification",
                     "dt": 0.05 | "auto",   # auto: synthetic mode only
                                            # (a measurement fixes its
                                            # own grid); Gershgorin
                                            # critical step of the TRUE
                                            # material
                     "n_steps": 400,
                     "params": ["young", "density"],
                         # any of young/area/density and the Rayleigh
                         # damping coefficients alpha/beta (identified
                         # through the decay envelope; their starting
                         # guess is the "damping" entry — a zero start
                         # needs "initial", log parameterization)
                     "probe_nodes": [..] | "probe_dofs": [..],
                     "measured": [[..], ..],    # (n_rec, n_probe) rows
                       | "synthetic": {"young": E, "density": rho,
                                       "alpha": a, "beta": b,
                                       "noise": 0.02, "seed": 0},
                         # twin-data mode: generate the measurement from
                         # these true values (+ relative Gaussian noise),
                         # identify starting from the problem's own
                         # material — the standard validation workflow
                     "amplitude": <same contract as transient>,
                     "damping": [alpha, beta],
                     "record_every": 1,
                     "n_iter": 300, "learning_rate": 0.05,
                     "initial": {"young": 1.0},
                     "include_fit": true}       # fitted probe trajectory

    With a "field" key the block switches to FIELD mode — a spatially-
    varying MLP profile (the reference's NN-property parameterization)
    trained against the trajectory instead of scalar parameters; see
    _run_field_identification for that contract.  With
    "domain": "frequency" the measurement is an FRF amplitude sweep
    instead of a trajectory (model updating from shaker data); see
    _run_frf_identification.

    The model problem's own material supplies the starting guess unless
    `initial` overrides it.  E and A are not separately identifiable from
    displacements (only EA is) — identify one of them at a time.

    Identification meshes are small (dense traced K) but the program is a
    differentiated `lax.scan` the host tier cannot mirror in numpy, so
    below DENSE_DOF_LIMIT the whole run executes on the LOCAL CPU backend
    (jax.default_device): compiles are local milliseconds instead of the
    attachment's minutes-long remote helper, which keeps the HTTP route
    inside its timeout.  `"on_device": true` opts back into the default
    accelerator (e.g. to keep a large study TPU-resident).
    """
    import jax as _jax

    from ..models.fields import ScalarField
    from ..solvers.transient_inverse import (_DAMP_PARAMS, _PARAM_ORDER,
                                             identify_from_transient,
                                             transient_probe_response)

    domain = analysis.get("domain", "time")
    if domain == "frequency":
        if analysis.get("field") is not None:
            raise ValueError("field mode supports the time and modal "
                             "domains, not FRF fitting")
        # FRF-amplitude fitting (see _run_frf_identification).
        return _run_frf_identification(problem, analysis)
    if domain == "modal":
        # Extracted-frequency fitting, scalar or field (see
        # _run_modal_identification).
        return _run_modal_identification(problem, analysis)
    if domain != "time":
        raise ValueError(f'identification domain must be "time", '
                         f'"frequency" or "modal", got {domain!r}')

    n_steps = int(analysis["n_steps"])
    record_every = int(analysis.get("record_every", 1))
    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    n_rec = n_steps // record_every
    damping = analysis.get("damping", [0.0, 0.0])
    damping = (float(damping[0]), float(damping[1]))
    from ..solvers.newton import DENSE_DOF_LIMIT

    if problem.ndof > DENSE_DOF_LIMIT:
        # The forward model traces a DENSE (ndof, ndof) K through the
        # scan (transient_inverse._probe_history) — fine for the small
        # meshes identification targets, quadratic memory past the dense
        # limit. Fail the request up front instead of OOMing mid-solve.
        raise ValueError(
            f"time-domain identification is dense-only "
            f"({problem.ndof} DOFs > {DENSE_DOF_LIMIT}); identify on a "
            f"coarser model of the structure")
    synthetic_spec = analysis.get("synthetic")
    if synthetic_spec is not None and not isinstance(synthetic_spec, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if analysis.get("field") is not None:
        # Field mode: a spatial MLP profile instead of scalar parameters
        # (see _run_field_identification for the contract).
        if "params" in analysis:
            raise ValueError('"params" and "field" are mutually exclusive: '
                             'field mode recovers one spatial profile, not '
                             'scalar parameters')
        return _run_field_identification(problem, analysis, n_steps,
                                         record_every, n_rec, damping,
                                         synthetic_spec)
    dt_spec = analysis["dt"]
    if dt_spec == "auto":
        # Only meaningful in twin-data mode (a real measurement fixes its
        # own grid); the Gershgorin critical step of the TRUE material
        # keeps the synthetic integration stable whatever values the
        # block asks to recover.
        if synthetic_spec is None:
            raise ValueError('dt="auto" needs "synthetic" twin data; a '
                             'measured history fixes its own dt')
        from ..models.fields import ScalarField as _SF
        from ..models.problem import TrussProblem as _TP

        syn = {k: float(v) for k, v in analysis["synthetic"].items()
               if k in _PARAM_ORDER}
        true_problem = _TP(
            problem.nodes, problem.elements,
            problem.material.replace(
                **{k: _SF(value=v) for k, v in syn.items()}),
            problem.loads, problem.fixed_dofs, problem.dimension)
        # safety=0.45, not the transient default 0.9: the OPTIMIZER
        # integrates at every parameter value it visits, and a log-space
        # ADAM overshoot past the true stiffness (or under the true
        # density) raises omega_max above the truth's — a dt at the
        # truth's critical step then blows up mid-descent and the loss
        # goes NaN. 0.45 keeps a 2x stiffness overshoot stable.
        # The truth integrates with ITS damping (synthetic alpha/beta
        # override the guesses), and damping SHRINKS the critical step.
        dt_damp = (float(analysis["synthetic"].get("alpha", damping[0])),
                   float(analysis["synthetic"].get("beta", damping[1])))
        dt = stable_dt(true_problem, damping=dt_damp, safety=0.45)
    else:
        dt = float(dt_spec)
    params = tuple(analysis.get("params", ["young", "density"]))
    for p in params:
        if p not in _PARAM_ORDER + _DAMP_PARAMS:
            raise ValueError(f"identification params must be among "
                             f"{list(_PARAM_ORDER + _DAMP_PARAMS)}, "
                             f"got {p!r}")
    probe = _probe_dofs(analysis, problem)
    amplitude = _amplitude_array(analysis.get("amplitude"), n_steps, dt)

    measured = analysis.get("measured")
    synthetic = synthetic_spec
    if (measured is None) == (synthetic is None):
        raise ValueError('identification needs exactly one of "measured" '
                         '(a (n_rec, n_probe) history) or "synthetic" '
                         '(true parameter values for twin data)')

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        true_vals = None
        if synthetic is not None:
            true_vals = {k: float(v) for k, v in synthetic.items()
                         if k in _PARAM_ORDER + _DAMP_PARAMS}
            unknown = (set(synthetic) - set(_PARAM_ORDER)
                       - set(_DAMP_PARAMS) - {"noise", "seed"})
            if unknown:
                raise ValueError(f"unknown synthetic keys: "
                                 f"{sorted(unknown)}")
            true_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in true_vals.items()
                   if k in _PARAM_ORDER})
            # The truth integrates with ITS damping: synthetic alpha/beta
            # override the block's (which stays the starting guess).
            true_damp = (true_vals.get("alpha", damping[0]),
                         true_vals.get("beta", damping[1]))
            meas = np.asarray(_jax.device_get(transient_probe_response(
                problem, true_mat, dt, n_steps, amplitude, probe,
                record_every=record_every, damping=true_damp)))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                meas = meas + noise_rel * np.max(np.abs(meas)) \
                    * rng.standard_normal(meas.shape)
        else:
            meas = np.asarray(measured, dtype=float)
            if meas.ndim != 2 or meas.shape != (n_rec, probe.size):
                raise ValueError(
                    f"measured must be (n_steps/record_every={n_rec}, "
                    f"n_probe={probe.size}) rows, got {meas.shape}")

        initial = {k: float(v)
                   for k, v in (analysis.get("initial") or {}).items()}
        for p in params:
            # A non-scalar base field (e.g. the UI's young-NN) has no
            # single value to start from; use its mean over the element
            # midpoints — identification then REPLACES the field with
            # the recovered scalar, as identify_from_transient documents.
            # (Damping coefficients start from the block's "damping".)
            if p not in _PARAM_ORDER:
                continue
            if p not in initial and not isinstance(
                    getattr(problem.material, p), ScalarField):
                from ..ops.host import _assembly_inputs, eval_field_host

                vals = eval_field_host(getattr(problem.material, p),
                                       _assembly_inputs(problem, 1.0))
                initial[p] = max(float(np.mean(vals)), 1e-12)
        initial = initial or None
        ident, hist = identify_from_transient(
            problem, meas, dt, n_steps, probe,
            amplitude=amplitude, params=params,
            record_every=record_every, damping=damping,
            n_iter=int(analysis.get("n_iter", 300)),
            learning_rate=float(analysis.get("learning_rate", 0.05)),
            initial=initial)

        out = {
            "success": True,
            "analysis": "identification",
            "params": list(params),
            "identified": ident,
            "dt": dt,
            "n_steps": n_steps,
            "record_every": record_every,
            "probe_dofs": probe.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_vals is not None:
            out["synthetic"] = True
            out["true_values"] = true_vals
            out["noise"] = noise_rel
            out["relative_errors"] = {
                k: abs(ident[k] - true_vals[k]) / abs(true_vals[k])
                for k in ident if k in true_vals}
        if analysis.get("include_fit",
                        probe.size * n_rec <= 4 * _SHAPES_JSON_DOF_LIMIT):
            fit_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in ident.items()
                   if k in _PARAM_ORDER})
            fit_damp = (ident.get("alpha", damping[0]),
                        ident.get("beta", damping[1]))
            fit = np.asarray(_jax.device_get(transient_probe_response(
                problem, fit_mat, dt, n_steps, amplitude, probe,
                record_every=record_every, damping=fit_damp)))
            scale = max(float(np.max(np.abs(meas))), 1e-30)
            out["fitted_displacements"] = fit.tolist()
            out["measured_displacements"] = meas.tolist()
            out["fit_rmse_rel"] = float(
                np.sqrt(np.mean((fit - meas) ** 2)) / scale)
    return out


def _json_finite(obj):
    """Replace non-finite floats with None, recursively.  json.dump's
    default allow_nan=True would emit NaN/Infinity tokens that strict
    JSON.parse (the Node backend's pythonRunner, both browser UIs'
    resp.json()) rejects — one stray inf would make an otherwise
    successful response unreadable at every downstream tier."""
    if isinstance(obj, float):
        return obj if np.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: _json_finite(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_json_finite(v) for v in obj]
    return obj


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
