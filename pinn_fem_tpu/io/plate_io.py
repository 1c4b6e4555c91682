"""JSON tier for the Mindlin plate bending family (models/plate.py).

A plate document is self-describing via `"element_type": "plate"` —
the frame/plane/solid pattern; the CLI and servers peek at that key
and route here:

    {"element_type": "plate",
     "nodes": [[x, y], ..],                # midsurface
     "elements": [[i, j, k, l], ..]        # Q4 (CCW)
       | "mesh": {"type": "rect", "width": W, "height": H,
                  "nx": 16, "ny": 16},
     "material": {"young": E, "poisson": nu, "thickness": t,
                  "density": rho},         # scalars or per-element
     "loads": [Fz0, Mx0, My0, ..],         # 3 per node (optional)
     "pressure": q,                        # uniform transverse
                                           # (force/area; consistent
                                           # nodal loads)
     "supports": {"clamped": ["left", ..],         # w = βx = βy = 0
                  "simply_supported": ["top", ..], # HARD SS (w + the
                                           # edge-tangential rotation)
                  "free": [..]}            # accepted, adds nothing
       | "fixed_dofs": [..]                # raw 3n-DOF indices
       | "fixed_nodes": [..],              # all three DOFs
     "point_masses": [[node, m], ..] | [..per node..],
     "thermal": {"alpha": a, "delta_t": dT}   # through-thickness
       | material "alpha" + "temperature",    # TOP−BOTTOM face ΔT:
                                              # κ_th = α ΔT / t
                                              # (static load case only)
     "analysis": {"type": "static"}
               | {"type": "modal", "n_modes": 6,
                  "include_shapes": true,
                  "membrane_force": [Nxx, Nyy, Nxy]}  # optional
                                           # in-plane prestress
                                           # (force/length, tension
                                           # positive): K_g added
               | {"type": "buckling", "n_modes": 4,
                  "membrane_force": [Nxx, Nyy, Nxy]}  # REQUIRED:
                                           # λ_cr scales this state
               | {"type": "transient", "dt": 0.01, "n_steps": 500,
                  "damping": [a, b], "probe_nodes": [..],
                  "amplitude": {"type": "step" | "sine"} | [..],
                  "record_every": 1}
               | {"type": "harmonic", "omegas": [..] | {"start": w0,
                  "stop": w1, "num": 50}, "damping": [a, b],
                  "probe_nodes": [..]}
               | {"type": "spectrum", ...}     # transverse (z) base
                                  # excitation; run_continuum_spectrum
                                  # contract (io/_common.py) with
                                  # extreme-fiber σ = 6M/t² components
               | {"type": "random", ...}       # run_continuum_random
                                  # contract incl. spectral fatigue
               | {"type": "reduction", ...}    # Guyan/Craig-Bampton
                                  # (run_continuum_reduction contract)
               | {"type": "identification", ...}   # E from measured
                                  # deflections (the plane family's
                                  # contract: measured_dofs/measured_u
                                  # or synthetic twin data, zones,
                                  # field MLP, banded adjoint past
                                  # DENSE_DOF_LIMIT; E at KNOWN t —
                                  # bending sees only D ~ E t³)
               | {"type": "plastic", "sigma_y": sy,
                  "hardening": H_iso, "kinematic_hardening": H_kin,
                  "n_layers": 20,          # even through-thickness
                                           # midpoint layers
                  "load_factors": [..] | "target" + "n_steps",
                  "probe_nodes": [..],
                  "include_history": true}}  # layered J2 bending
                                  # (solvers/plate_plasticity.py);
                                  # the plane family's plastic block
                                  # with moments for stresses and
                                  # extreme-fiber von Mises

Static results carry centroid bending moments (Voigt [Mxx, Myy,
Mxy]), transverse shear forces, extreme-fiber von Mises σ = 6M/t²
and reactions; modal/transient/harmonic mirror the other families'
result shapes.  Everything runs on the HOST tier below
DENSE_DOF_LIMIT (models/plate.py doctrine)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..models.plate import (PlateProblem, plate_harmonic, plate_modal,
                            plate_supports, rect_mesh,
                            solve_plate_static, solve_plate_transient)


def is_plate_document(doc: Dict) -> bool:
    return isinstance(doc, dict) \
        and doc.get("element_type") == "plate"


def _probe_dofs(analysis: Dict, problem: PlateProblem):
    probe = analysis.get("probe_dofs")
    if probe is None and analysis.get("probe_nodes") is not None:
        pn = np.asarray(analysis["probe_nodes"], dtype=int).reshape(-1)
        probe = 3 * pn                       # the w DOF per node
    return probe


def parse_plate_document(doc: Dict) -> Tuple[PlateProblem, Dict]:
    mesh = doc.get("mesh")
    if mesh is not None:
        if mesh.get("type", "rect") != "rect":
            raise ValueError('plate mesh.type must be "rect"')
        nodes, elements = rect_mesh(
            float(mesh["width"]), float(mesh["height"]),
            int(mesh["nx"]), int(mesh["ny"]), "quad")
    else:
        if "nodes" not in doc or "elements" not in doc:
            raise ValueError('plate document needs "nodes" + '
                             '"elements" or a "mesh" spec')
        nodes = np.asarray(doc["nodes"], dtype=float)
        elements = np.asarray(doc["elements"], dtype=int)
    mat = doc.get("material", {})
    for key in ("poisson", "thickness"):
        if mat.get(key) is None:
            raise ValueError(f'plate material needs "{key}" — the '
                             "bending rigidity Et³/12(1−ν²) is the "
                             "point")
    nnode = nodes.shape[0]
    loads = np.asarray(doc.get("loads", np.zeros(3 * nnode)),
                       dtype=float).reshape(-1)

    fixed_parts = []
    sup = doc.get("supports")
    if sup is not None:
        for kind, edges in sup.items():
            fixed_parts.append(plate_supports(nodes, edges, kind))
    if "fixed_dofs" in doc:
        fixed_parts.append(np.asarray(doc["fixed_dofs"], dtype=int))
    if "fixed_nodes" in doc:
        fn = np.asarray(doc["fixed_nodes"], dtype=int).reshape(-1)
        fixed_parts.append(np.concatenate([3 * fn, 3 * fn + 1,
                                           3 * fn + 2]))
    fixed_parts = [f for f in fixed_parts if np.asarray(f).size]
    if not fixed_parts:
        raise ValueError('plate document needs supports: "supports" '
                         '(clamped/simply_supported edge lists), '
                         '"fixed_nodes" or "fixed_dofs"')
    fixed = np.unique(np.concatenate(fixed_parts))

    pm = doc.get("point_masses")
    if pm is not None:
        arr = np.asarray(pm, dtype=float)
        if arr.ndim == 2:                        # [[node, mass], ...]
            full = np.zeros(nnode)
            for node, mass in arr:
                full[int(node)] += float(mass)
            pm = full
        else:
            pm = arr

    # Through-thickness thermal gradient: the shared thermal contract
    # (plane_io._thermal_block) with "delta_t"/"temperature" read as
    # the TOP-minus-BOTTOM face difference ΔT (κ_th = α ΔT / t).
    from .plane_io import _thermal_block

    th_alpha, th_temp = _thermal_block(doc, mat)

    problem = PlateProblem(
        nodes=nodes, elements=elements,
        young=mat.get("young", 1.0), poisson=mat["poisson"],
        thickness=mat["thickness"], density=mat.get("density", 1.0),
        loads=loads, fixed_dofs=fixed,
        pressure=doc.get("pressure"), point_masses=pm,
        alpha_cte=th_alpha, temperature=th_temp)
    return problem, dict(doc.get("analysis") or {"type": "static"})


def _amplitude(analysis: Dict, n_steps: int, dt: float):
    amp = analysis.get("amplitude")
    if amp is None or isinstance(amp, (list, tuple, np.ndarray)):
        return None if amp is None else np.asarray(amp, dtype=float)
    kind = amp.get("type", "step")
    t = (np.arange(n_steps) + 1) * dt
    if kind == "step":
        return np.ones(n_steps)
    if kind == "sine":
        return np.sin(float(amp["omega"]) * t)
    raise ValueError('plate amplitude type must be "step" or "sine"')


def run_plate_analysis(problem: PlateProblem, analysis: Dict) -> Dict:
    kind = analysis.get("type", "static")
    if kind == "plate":
        # The Node /api/fem/plate route convention (plane_io twin).
        kind = "static"
    if kind == "static":
        from ..solvers.newton import DENSE_DOF_LIMIT

        large = problem.ndof > DENSE_DOF_LIMIT
        iterations = residual = None
        if large:
            # Device tier: banded DIA + PCG (the plane family's
            # contract — full-field serialization is also intractable
            # here, so the payload carries probes + summaries).
            from ..models.plate import solve_plate_static_banded

            res, iterations, residual = solve_plate_static_banded(
                problem,
                tol=float(analysis.get("tolerance", 1e-7)),
                max_iter=int(analysis.get("max_iterations", 50000)),
                use_pallas=bool(analysis.get("use_pallas", False)),
                precond=analysis.get("precond", "auto"))
        else:
            res = solve_plate_static(problem)
        worst = int(np.argmax(res.von_mises)) if res.von_mises.size \
            else -1
        w = res.displacements[0::3]
        out = {
            "success": True,
            "analysis": "static",
            "element_type": "plate",
            "max_deflection": float(np.abs(w).max()),
            "max_deflection_node": int(np.argmax(np.abs(w))),
            "max_von_mises": (float(res.von_mises[worst])
                              if worst >= 0 else None),
            "max_von_mises_element": worst,
        }
        if large:
            probe = _probe_dofs(analysis, problem)
            out.update({
                "tier": "banded",
                "iterations": int(iterations),
                "relative_residual": float(residual),
                "moment_range": [float(res.moments.min()),
                                 float(res.moments.max())],
            })
            if probe is not None:
                probe = np.asarray(probe, dtype=int).reshape(-1)
                out["probe_dofs"] = probe.tolist()
                out["displacements"] = res.displacements[
                    probe].tolist()
        else:
            out.update({
                "displacements": res.displacements.tolist(),
                "moments": res.moments.tolist(),
                "shear_forces": res.shear_forces.tolist(),
                "von_mises": res.von_mises.tolist(),
                "reactions": res.reactions.tolist(),
            })
        return out
    if kind in ("modal", "transient", "harmonic", "buckling",
                "spectrum", "random", "reduction") \
            and problem.ndof > 4 * 2048:
        raise ValueError(
            f"plate {kind} runs on the dense host tier; "
            f"{problem.ndof} DOFs exceeds its 8192-DOF budget — "
            "coarsen the mesh; only statics has a banded large-mesh "
            "path so far")
    if kind == "spectrum":
        from ._common import run_continuum_spectrum

        return run_continuum_spectrum(problem, analysis, "plate")
    if kind == "random":
        from ._common import run_continuum_random

        return run_continuum_random(problem, analysis, "plate",
                                    _probe_dofs(analysis, problem))
    if kind == "reduction":
        from ._common import run_continuum_reduction

        return run_continuum_reduction(problem, analysis, "plate")
    if kind == "identification":
        return _run_plate_identification(problem, analysis)
    if kind == "reliability":
        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"plate reliability runs dense traced solves per "
                f"HL-RF iteration; {problem.ndof} DOFs exceeds its "
                "8192-DOF budget — coarsen the mesh")
        from ._common import run_continuum_reliability

        return run_continuum_reliability(problem, analysis, "plate")
    if kind == "sizing":
        # Minimum-weight slab-depth field under a deflection limit
        # (solvers/continuum_sizing.py — the t^3 bending design).
        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"plate sizing runs dense traced solves per ADAM "
                f"iteration; {problem.ndof} DOFs exceeds its "
                "8192-DOF budget — coarsen the mesh")
        from ..solvers.continuum_sizing import optimize_plate_thickness

        if analysis.get("displacement_limit") is None:
            raise ValueError('plate sizing needs "displacement_limit" '
                             '(deflection-governed slab depth)')
        t_e, weight, hist = optimize_plate_thickness(
            problem, float(analysis["displacement_limit"]),
            probe_dofs=analysis.get("probe_dofs"),
            probe_nodes=analysis.get("probe_nodes"),
            min_thickness=float(analysis.get("min_thickness", 1e-6)),
            n_iter=int(analysis.get("n_iter", 300)),
            outer_rounds=int(analysis.get("outer_rounds", 4)),
            learning_rate=float(analysis.get("learning_rate", 0.05)))
        return {
            "success": True,
            "analysis": "sizing",
            "element_type": "plate",
            "thickness": t_e.tolist(),
            "weight": weight,
            "displacement_limit": float(analysis[
                "displacement_limit"]),
            "history": hist.tolist(),
        }
    if kind == "plastic":
        # Layered through-thickness J2 (solvers/plate_plasticity.py):
        # the plane family's plastic block, moments instead of
        # stresses, extreme-fiber von Mises.
        from ..solvers.plate_plasticity import solve_plate_plastic

        if "sigma_y" not in analysis:
            raise ValueError('plastic analysis requires "sigma_y"')
        kwargs = dict(
            sigma_y=analysis["sigma_y"],
            hardening_iso=analysis.get("hardening", 0.0),
            hardening_kin=analysis.get("kinematic_hardening", 0.0),
            n_layers=int(analysis.get("n_layers", 20)),
            tol=float(analysis.get("tolerance", 1e-9)),
            max_iter=int(analysis.get("max_iterations", 30)),
        )
        if "load_factors" in analysis:
            kwargs["load_factors"] = np.asarray(
                analysis["load_factors"], dtype=float)
        else:
            kwargs["target_load_factor"] = float(
                analysis.get("target", 1.0))
            kwargs["n_steps"] = int(analysis.get("n_steps", 20))
        res = solve_plate_plastic(problem, **kwargs)
        probe = _probe_dofs(analysis, problem)
        if probe is None:
            probe = np.arange(problem.ndof)
        probe = np.asarray(probe, dtype=int).reshape(-1)
        yielded = np.flatnonzero(res.eq_plastic[-1] > 0.0)
        out = {
            "success": bool(res.converged),
            "analysis": "plastic",
            "element_type": "plate",
            "n_layers": int(kwargs["n_layers"]),
            "n_steps": int(res.load_factors.size),
            "load_factors": res.load_factors.tolist(),
            "probe_dofs": probe.tolist(),
            "displacements": res.displacements[:, probe].tolist(),
            "iterations": res.iterations.tolist(),
            "max_residual": float(res.residuals.max()),
            "n_plastic": res.n_plastic.tolist(),
            "yielded_elements": yielded.tolist(),
            "max_von_mises": res.von_mises.max(axis=1).tolist(),
            "final": {
                "moments": res.moments[-1].tolist(),
                "von_mises": res.von_mises[-1].tolist(),
                "eq_plastic_strain": res.eq_plastic[-1].tolist(),
                "displacements": res.displacements[-1].tolist(),
            },
        }
        if analysis.get("include_history"):
            out["history"] = {
                "von_mises": res.von_mises.tolist(),
                "eq_plastic_strain": res.eq_plastic.tolist(),
            }
        return out
    if kind == "modal":
        nf = analysis.get("membrane_force")
        res = plate_modal(problem,
                          n_modes=int(analysis.get("n_modes", 6)),
                          membrane_force=nf)
        out = {
            "success": True,
            "analysis": "modal",
            "element_type": "plate",
            "prestressed": nf is not None,
            "frequencies_hz": res.frequencies_hz.tolist(),
            "omegas": res.omegas.tolist(),
        }
        if analysis.get("include_shapes"):
            out["mode_shapes"] = res.mode_shapes.tolist()
        return out
    if kind == "buckling":
        from ..models.plate import plate_buckling

        if "membrane_force" not in analysis:
            raise ValueError(
                'plate buckling needs "membrane_force": [Nxx, Nyy, '
                "Nxy] (force/length, tension positive; scalars or "
                "per-element rows) — the bending model carries no "
                "membrane DOFs, so the in-plane state is an input")
        res = plate_buckling(
            problem, analysis["membrane_force"],
            n_modes=int(analysis.get("n_modes", 4)))
        out = {
            "success": True,
            "analysis": "buckling",
            "element_type": "plate",
            "load_factors": res.load_factors.tolist(),
        }
        if analysis.get("include_shapes", True):
            out["buckling_modes"] = res.modes.tolist()
        return out
    if kind == "transient":
        dt = float(analysis["dt"])
        n_steps = int(analysis["n_steps"])
        res = solve_plate_transient(
            problem, dt, n_steps,
            damping=analysis.get("damping", (0.0, 0.0)),
            amplitude=_amplitude(analysis, n_steps, dt),
            probe_dofs=_probe_dofs(analysis, problem),
            record_every=int(analysis.get("record_every", 1)))
        return {
            "success": True,
            "analysis": "transient",
            "element_type": "plate",
            "method": "newmark",
            "dt": res.dt,
            "n_steps": res.n_steps,
            "times": res.times.tolist(),
            "displacements": res.displacements.tolist(),
            "velocities": res.velocities.tolist(),
        }
    if kind == "harmonic":
        om = analysis.get("omegas")
        if om is None:
            raise ValueError('plate harmonic needs "omegas"')
        if isinstance(om, dict):
            om = np.linspace(float(om["start"]), float(om["stop"]),
                             int(om.get("num", 50)))
        res = plate_harmonic(
            problem, om, damping=analysis.get("damping", (0.0, 0.0)),
            probe_dofs=_probe_dofs(analysis, problem))
        return {
            "success": True,
            "analysis": "harmonic",
            "element_type": "plate",
            "method": "direct",
            "omegas": res.omegas.tolist(),
            "amplitude": res.amplitude.tolist(),
        }
    raise ValueError(f"unknown plate analysis type: {kind!r} — "
                     'supported: "static", "modal", "buckling", '
                     '"transient", "harmonic", "spectrum", "random", '
                     '"reduction", "identification", "plastic", '
                     '"reliability", "sizing"')


def _run_plate_identification(problem: PlateProblem,
                              analysis: Dict) -> Dict:
    """Young's-modulus identification from measured deflections — the
    plane family's JSON contract (io/plane_io.py) on the bending
    family: "measured_dofs" + "measured_u" (or "synthetic" twin data
    with "zone_young"/"young"), "zones" bbox/id lists, "field" MLP,
    banded adjoint past DENSE_DOF_LIMIT.  E is identified at KNOWN
    thickness (bending data sees only D ~ E t³ — the models/plate.py
    identifiability note)."""
    from ..models.plate import (identify_plate_young,
                                identify_plate_young_banded)
    from ..solvers.newton import DENSE_DOF_LIMIT
    from .plane_io import _resolve_zones

    zones = analysis.get("zones")
    if zones is not None:
        zones = _resolve_zones(problem, zones)
    synthetic = analysis.get("synthetic")
    true_young = None
    if synthetic is not None:
        if "measured_u" in analysis:
            raise ValueError('give "measured_u" or "synthetic", '
                             'not both')
        md = analysis.get("measured_dofs")
        if md is None:
            md = _probe_dofs(analysis, problem)
        if md is None:
            raise ValueError('synthetic plate identification needs '
                             '"measured_dofs" or "probe_nodes"')
        measured_dofs = np.asarray(md, dtype=int).reshape(-1)
        if "zone_young" in synthetic:
            if zones is None:
                raise ValueError('"zone_young" needs "zones"')
            true_young = np.broadcast_to(
                np.asarray(problem.young, dtype=float),
                (problem.nelm,)).copy()
            for ids, e in zip(zones, synthetic["zone_young"]):
                true_young[ids] = float(e)
        else:
            tv = synthetic["young"]
            true_young = (np.full(problem.nelm, float(tv))
                          if np.isscalar(tv)
                          else np.asarray(tv, dtype=float))
        from ..models.plate import solve_plate_static_banded

        p_true = PlateProblem(
            nodes=problem.nodes, elements=problem.elements,
            young=true_young, poisson=problem.poisson,
            thickness=problem.thickness, density=problem.density,
            loads=problem.loads, fixed_dofs=problem.fixed_dofs,
            pressure=problem.pressure,
            point_masses=problem.point_masses)
        r_true, _, _ = solve_plate_static_banded(
            p_true, tol=float(analysis.get("tolerance", 1e-7)) * 0.01)
        measured_u = r_true.displacements[measured_dofs]
        noise = float(synthetic.get("noise", 0.0))
        if noise:
            rng = np.random.default_rng(int(synthetic.get("seed", 0)))
            measured_u = measured_u + noise * np.max(
                np.abs(measured_u)) * rng.standard_normal(
                    measured_u.shape)
        analysis = dict(analysis,
                        measured_dofs=measured_dofs.tolist(),
                        measured_u=measured_u.tolist())
    if "measured_dofs" not in analysis or "measured_u" not in analysis:
        raise ValueError('plate identification needs "measured_dofs" '
                         'and "measured_u" (or "synthetic" twin data)')
    banded = analysis.get("banded")
    if banded is None:
        banded = problem.ndof > DENSE_DOF_LIMIT or zones is not None
    if banded:
        # Identification-family doctrine: the ADAM loop runs on the
        # LOCAL CPU tier unless "on_device": true opts in (per-step
        # attachment round trips dominate millisecond solves).
        from ._common import _local_cpu_ctx

        with _local_cpu_ctx(analysis):
            vals, hist, fld = identify_plate_young_banded(
                problem,
                analysis["measured_dofs"], analysis["measured_u"],
                n_iter=int(analysis.get("n_iter", 300)),
                learning_rate=float(analysis.get("learning_rate",
                                                 0.05)),
                tol=float(analysis.get("tolerance", 1e-7)),
                max_iter=int(analysis.get("max_iter", 20000)),
                zones=zones,
                field=bool(analysis.get("field", False)),
                seed=int(analysis.get("seed", 0)),
                hidden_layers=int(analysis.get("hidden_layers", 2)),
                neurons_per_layer=int(
                    analysis.get("neurons_per_layer", 16)))
    else:
        if zones is not None:
            raise ValueError('"zones" rides the banded tier; drop '
                             '"banded": false')
        vals, hist, fld = identify_plate_young(
            problem,
            analysis["measured_dofs"], analysis["measured_u"],
            n_iter=int(analysis.get("n_iter", 800)),
            learning_rate=float(analysis.get("learning_rate", 0.05)),
            field=bool(analysis.get("field", False)),
            seed=int(analysis.get("seed", 0)),
            hidden_layers=int(analysis.get("hidden_layers", 2)),
            neurons_per_layer=int(analysis.get("neurons_per_layer",
                                               16)))
    centroids = problem.coords().mean(axis=1)
    out = {
        "success": True,
        "analysis": "identification",
        "element_type": "plate",
        "parameter": "young",
        "method": "banded" if banded else "dense",
        "field": bool(analysis.get("field", False)),
        "young": vals.tolist(),
        "centroids": centroids.tolist(),
        "loss_history": hist[:: max(1, hist.size // 200)].tolist(),
        "final_loss": float(hist[-1]) if hist.size else None,
    }
    if zones is not None:
        out["zones"] = [np.asarray(z, dtype=int).tolist()
                        for z in zones]
        out["zone_young"] = [
            float(np.mean(vals[np.asarray(z, dtype=int)]))
            for z in zones]
    if true_young is not None:
        out["synthetic"] = True
        rel = np.abs(vals - true_young) / np.abs(true_young)
        out["max_rel_error"] = float(rel.max())
        if zones is not None and "zone_young" in synthetic:
            out["true_zone_young"] = [float(v) for v in
                                      synthetic["zone_young"]]
            out["zone_rel_error"] = [
                abs(zy - ty) / abs(ty) for zy, ty in
                zip(out["zone_young"], out["true_zone_young"])]
    return out


def run_plate_document(doc: Dict) -> Dict:
    problem, analysis = parse_plate_document(doc)
    return run_plate_analysis(problem, analysis)
