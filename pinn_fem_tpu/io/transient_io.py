"""Transient ("analysis": {"type": "transient"}) JSON runners — the
explicit/Newmark time integration block with its ensemble, plasticity,
moving-load / base-excitation and fatigue-post-processing variants.
Split out of io/analysis.py (which keeps the dispatch facade and the
full contract reference in its module docstring).

The reference is statics-only (/root/reference/FEM/python/examples/
json/generic.py has no time axis at all); this family extends the same
problem JSON with lumped-mass central-difference / Newmark integration
(solvers/dynamics.py), explicit elastoplastic stepping
(solvers/plasticity.py) and vmapped history ensembles
(parallel/batched.py)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..solvers.dynamics import solve_transient, stable_dt
from ._common import (_SHAPES_JSON_DOF_LIMIT, _amplitude_array,
                      _element_areas, _json_finite, _prestress_state,
                      _probe_dofs, _sn_params)


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


