"""JSON tier for the 2D plane-stress/strain family (models/plane.py).

A plane document is self-describing via `"element_type": "plane"` —
like frames (io/frame_io.py), the truss schema cannot carry it, so
the CLI and servers peek at that key and route here:

    {"element_type": "plane",
     "nodes": [[x, y], ..],
     "elements": [[i, j, k], ..]         # CST triangles
                | [[i, j, k, l], ..],    # Q4 quads (CCW)
       | "mesh": {"type": "rect", "width": W, "height": H,
                  "nx": 8, "ny": 4, "element": "quad" | "tri"}
       | "mesh": {"type": "annulus", "r_inner": a, "r_outer": b,
                  "nr": 8, "nt": 12, "sweep": 1.5707963},
     "material": {"young": E, "poisson": nu, "thickness": t,
                  "density": rho},       # scalars or per-element
     "plane_strain": false,
     "loads": [Fx0, Fy0, Fx1, ..],       # 2 per node (optional)
     "edge_loads": [{"nodes": [..path..],          # uniform traction
                     "traction": [tx, ty]}         # (force/area)
                  | {"nodes": [..path..],          # normal pressure
                     "pressure": p}, ..],  # (material on path's left)
     "body_force": [bx, by],             # force/volume (e.g. [0,-ρg])
     "fixed_nodes": [..]                 # both DOFs clamped
       | "fixed_dofs": [..],             # raw 2n-DOF indices
     "fixed_x_nodes": [..], "fixed_y_nodes": [..],  # rollers/symmetry
     "prescribed": [[dof, value], ..],   # settlement / driven supports
     "point_masses": [[node, m], ..] | [..per node..],
     "analysis": {"type": "static"}
               | {"type": "modal", "n_modes": 6,
                  "include_shapes": true}
               | {"type": "transient", "dt": 0.01, "n_steps": 500,
                  "damping": [a, b], "probe_nodes": [..],
                  "amplitude": {"type": "step" | "sine"} | [..],
                  "record_every": 1}
               | {"type": "harmonic", "omegas": [..] | {"start": w0,
                  "stop": w1, "num": 50}, "damping": [a, b],
                  "probe_nodes": [..]}
               | {"type": "plastic", "sigma_y": sy,  # J2 von Mises
                  "hardening": Hi, "kinematic_hardening": Hk,
                  "load_factors": [..] | "target"+"n_steps",
                  "bbar": true,      # mean-dilatation (plane strain)
                  "tolerance": 1e-9, "max_iterations": 30,
                  "probe_nodes": [..], "include_history": false}
               | {"type": "identification",       # recover E from
                  "measured_dofs": [..],          # measured static
                  "measured_u": [..],             # displacements
                  "field": false,     # true: E(x, y) MLP (PINN form)
                  "n_iter": 800, "learning_rate": 0.05,
                  "hidden_layers": 2, "neurons_per_layer": 16,
                  "seed": 0}}

Static results carry centroid stresses (Voigt [xx, yy, xy]), von
Mises, principal stresses and reactions; modal/transient mirror the
frame family's result shapes.  Everything runs on the HOST tier
(models/plane.py doctrine): zero device programs, import-bound cold
latency.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..models.plane import (PlaneProblem, edge_load, plane_modal,
                            rect_mesh, solve_plane_static,
                            solve_plane_transient)


def is_plane_document(doc: Dict) -> bool:
    return isinstance(doc, dict) \
        and doc.get("element_type") == "plane"


def parse_plane_document(doc: Dict) -> Tuple[PlaneProblem, Dict]:
    mesh = doc.get("mesh")
    if mesh is not None:
        mtype = mesh.get("type", "rect")
        if mtype == "rect":
            nodes, elements = rect_mesh(
                float(mesh["width"]), float(mesh["height"]),
                int(mesh["nx"]), int(mesh["ny"]),
                mesh.get("element", "quad"))
        elif mtype == "annulus":
            from ..models.plane import annulus_mesh

            nodes, elements = annulus_mesh(
                float(mesh["r_inner"]), float(mesh["r_outer"]),
                int(mesh["nr"]), int(mesh["nt"]),
                sweep=float(mesh.get("sweep", 0.5 * np.pi)))
        else:
            raise ValueError('mesh.type must be "rect" or "annulus"')
    else:
        if "nodes" not in doc or "elements" not in doc:
            raise ValueError('plane document needs "nodes" + '
                             '"elements" or a "mesh" spec')
        nodes = np.asarray(doc["nodes"], dtype=float)
        elements = np.asarray(doc["elements"], dtype=int)
    mat = doc.get("material", {})
    if mat.get("poisson") is None:
        raise ValueError('plane material needs "poisson" — the 2D '
                         "constitutive law is the point")
    nnode = nodes.shape[0]
    loads = np.asarray(doc.get("loads", np.zeros(2 * nnode)),
                       dtype=float).reshape(-1)
    thickness = mat.get("thickness", 1.0)
    for spec in doc.get("edge_loads", []):
        has_traction = "traction" in spec
        has_pressure = "pressure" in spec
        if "nodes" not in spec or has_traction == has_pressure:
            raise ValueError('edge_loads entries need "nodes" (path '
                             'order) and exactly one of "traction" '
                             '[tx, ty] or "pressure" p (normal, '
                             'material on the path\'s left)')
        t_arr = np.asarray(thickness, dtype=float).reshape(-1)
        if t_arr.size != 1:
            raise ValueError("edge_loads need a scalar material "
                             "thickness (per-element thickness makes "
                             "the edge share ambiguous)")
        if has_traction:
            loads = loads + edge_load(nodes, spec["nodes"],
                                      spec["traction"], float(t_arr[0]),
                                      ndof=2 * nnode)
        else:
            from ..models.plane import pressure_load

            loads = loads + pressure_load(nodes, spec["nodes"],
                                          float(spec["pressure"]),
                                          float(t_arr[0]),
                                          ndof=2 * nnode)

    fixed_parts = []
    if "fixed_dofs" in doc:
        fixed_parts.append(np.asarray(doc["fixed_dofs"], dtype=int))
    if "fixed_nodes" in doc:
        fn = np.asarray(doc["fixed_nodes"], dtype=int).reshape(-1)
        fixed_parts.append(np.concatenate([2 * fn, 2 * fn + 1]))
    if "fixed_x_nodes" in doc:
        fn = np.asarray(doc["fixed_x_nodes"], dtype=int).reshape(-1)
        fixed_parts.append(2 * fn)
    if "fixed_y_nodes" in doc:
        fn = np.asarray(doc["fixed_y_nodes"], dtype=int).reshape(-1)
        fixed_parts.append(2 * fn + 1)
    prescribed_pairs = doc.get("prescribed")
    if prescribed_pairs is not None:
        arr = np.asarray(prescribed_pairs, dtype=float)
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise ValueError('prescribed must be [[dof, value], ..]')
        fixed_parts.append(arr[:, 0].astype(int))
    if not fixed_parts:
        raise ValueError('plane document needs supports: "fixed_nodes",'
                         ' "fixed_dofs", "fixed_x_nodes"/"fixed_y_nodes"'
                         ' or "prescribed"')
    fixed = np.unique(np.concatenate(fixed_parts))
    prescribed = None
    if prescribed_pairs is not None:
        arr = np.asarray(prescribed_pairs, dtype=float)
        prescribed = np.zeros(fixed.size)
        idx = np.searchsorted(fixed, arr[:, 0].astype(int))
        prescribed[idx] = arr[:, 1]

    pm = doc.get("point_masses")
    if pm is not None:
        arr = np.asarray(pm, dtype=float)
        if arr.ndim == 2:                       # [[node, mass], ...]
            full = np.zeros(nnode)
            for node, mass in arr:
                full[int(node)] += float(mass)
            pm = full
        else:
            pm = arr

    problem = PlaneProblem(
        nodes=nodes, elements=elements,
        young=mat.get("young", 1.0), poisson=mat["poisson"],
        thickness=thickness, density=mat.get("density", 1.0),
        loads=loads, fixed_dofs=fixed,
        plane_strain=bool(doc.get("plane_strain", False)),
        prescribed=prescribed,
        body_force=doc.get("body_force"),
        point_masses=pm)
    return problem, dict(doc.get("analysis") or {"type": "static"})


def _probe_dofs(analysis: Dict, problem: PlaneProblem):
    probe = analysis.get("probe_dofs")
    if probe is None and analysis.get("probe_nodes") is not None:
        pn = np.asarray(analysis["probe_nodes"], dtype=int).reshape(-1)
        probe = np.stack([2 * pn, 2 * pn + 1], axis=1).reshape(-1)
    return probe


def run_plane_analysis(problem: PlaneProblem, analysis: Dict) -> Dict:
    kind = analysis.get("type", "static")
    if kind == "plane":
        # The Node /api/fem/plane route injects type="plane" when the
        # document carries no analysis block — that means "statics".
        kind = "static"
    if kind == "static":
        from ..solvers.newton import DENSE_DOF_LIMIT

        large = problem.ndof > DENSE_DOF_LIMIT
        iterations = residual = None
        if large:
            # Device tier: banded DIA + PCG (models/plane.py) — the
            # dense O(n^3) solve is intractable here, and so is
            # serializing the full field to JSON; the payload carries
            # probe displacements + stress summaries instead.
            from ..models.plane import solve_plane_static_banded

            res, iterations, residual = solve_plane_static_banded(
                problem,
                tol=float(analysis.get("tolerance", 1e-7)),
                max_iter=int(analysis.get("max_iterations", 20000)),
                use_pallas=bool(analysis.get("use_pallas", False)),
                precond=analysis.get("precond", "auto"))
        else:
            res = solve_plane_static(problem)
        worst = int(np.argmax(res.von_mises)) if res.von_mises.size \
            else -1
        out = {
            "success": True,
            "analysis": "static",
            "element_type": "plane",
            "plane_strain": bool(problem.plane_strain),
            "max_von_mises": (float(res.von_mises[worst])
                              if worst >= 0 else None),
            "max_von_mises_element": worst,
        }
        if large:
            u = res.displacements
            probe = _probe_dofs(analysis, problem)
            i_max = int(np.argmax(np.abs(u)))
            out.update({
                "tier": "banded",
                "iterations": int(iterations),
                "relative_residual": float(residual),
                "max_abs_displacement": float(np.abs(u[i_max])),
                "max_abs_displacement_dof": i_max,
                "principal_range": [float(res.principal[:, 1].min()),
                                    float(res.principal[:, 0].max())],
            })
            if probe is not None:
                probe = np.asarray(probe, dtype=int).reshape(-1)
                out["probe_dofs"] = probe.tolist()
                out["displacements"] = u[probe].tolist()
        else:
            out.update({
                "displacements": res.displacements.tolist(),
                "stresses": res.stresses.tolist(),
                "von_mises": res.von_mises.tolist(),
                "principal": res.principal.tolist(),
                "strains": res.strains.tolist(),
                "reactions": res.reactions.tolist(),
            })
        return out
    if kind in ("modal", "transient", "harmonic", "identification",
                "plastic") and problem.ndof > 4 * 2048:
        raise ValueError(
            f"plane {kind} runs on the dense host tier; {problem.ndof} "
            "DOFs exceeds its 8192-DOF budget (minutes of O(n^3) work "
            "on one core) — coarsen the mesh; only statics has a "
            "banded large-mesh path so far")
    if kind == "plastic":
        from ..solvers.plane_plasticity import solve_plane_plastic

        if "sigma_y" not in analysis:
            raise ValueError('plastic analysis requires "sigma_y"')
        kwargs = dict(
            sigma_y=analysis["sigma_y"],
            hardening_iso=analysis.get("hardening", 0.0),
            hardening_kin=analysis.get("kinematic_hardening", 0.0),
            tol=float(analysis.get("tolerance", 1e-9)),
            max_iter=int(analysis.get("max_iterations", 30)),
        )
        if analysis.get("bbar") is not None:
            kwargs["bbar"] = bool(analysis["bbar"])
        if "load_factors" in analysis:
            kwargs["load_factors"] = np.asarray(
                analysis["load_factors"], dtype=float)
        else:
            kwargs["target_load_factor"] = float(
                analysis.get("target", 1.0))
            kwargs["n_steps"] = int(analysis.get("n_steps", 20))
        res = solve_plane_plastic(problem, **kwargs)
        probe = _probe_dofs(analysis, problem)
        if probe is None:
            probe = np.arange(problem.ndof)
        probe = np.asarray(probe, dtype=int).reshape(-1)
        yielded = np.flatnonzero(res.eq_plastic[-1] > 0.0)
        out = {
            "success": bool(res.converged),
            "analysis": "plastic",
            "element_type": "plane",
            "plane_strain": bool(problem.plane_strain),
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
                "stresses": res.stresses[-1].tolist(),
                "sigma_zz": res.sigma_zz[-1].tolist(),
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
        res = plane_modal(problem,
                          n_modes=int(analysis.get("n_modes", 6)))
        out = {
            "success": True,
            "analysis": "modal",
            "element_type": "plane",
            "frequencies_hz": res.frequencies_hz.tolist(),
            "omegas": res.omegas.tolist(),
            "eigenvalues": res.eigenvalues.tolist(),
        }
        if analysis.get("include_shapes", True):
            out["mode_shapes"] = res.mode_shapes.tolist()
        return out
    if kind == "transient":
        if analysis.get("dt") is None or analysis.get("n_steps") is None:
            raise ValueError('plane transient needs "dt" and '
                             '"n_steps"')
        n_steps = int(analysis["n_steps"])
        amp = analysis.get("amplitude")
        if isinstance(amp, dict):
            t = np.arange(n_steps) * float(analysis["dt"])
            if amp.get("type", "step") == "step":
                amp = np.ones(n_steps)
            elif amp.get("type") == "sine":
                f_hz = float(amp.get("frequency_hz", 1.0))
                amp = np.sin(2.0 * np.pi * f_hz * t)
            else:
                raise ValueError('plane amplitude type must be '
                                 '"step" or "sine" (or a list)')
        res = solve_plane_transient(
            problem, float(analysis["dt"]), n_steps,
            damping=analysis.get("damping", (0.0, 0.0)),
            amplitude=amp, probe_dofs=_probe_dofs(analysis, problem),
            record_every=int(analysis.get("record_every", 1)))
        return {
            "success": True,
            "analysis": "transient",
            "element_type": "plane",
            "times": res.times.tolist(),
            "displacements": res.displacements.tolist(),
            "velocities": res.velocities.tolist(),
            "dt": res.dt,
            "n_steps": res.n_steps,
        }
    if kind == "harmonic":
        from ..models.plane import plane_harmonic

        om = analysis.get("omegas")
        if om is None:
            raise ValueError('plane harmonic needs "omegas"')
        if isinstance(om, dict):
            om = np.linspace(float(om["start"]), float(om["stop"]),
                             int(om.get("num", 50)))
        res = plane_harmonic(
            problem, om, damping=analysis.get("damping", (0.0, 0.0)),
            probe_dofs=_probe_dofs(analysis, problem))
        return {
            "success": True,
            "analysis": "harmonic",
            "element_type": "plane",
            "omegas": res.omegas.tolist(),
            "amplitude": res.amplitude.tolist(),
        }
    if kind == "identification":
        from ..models.plane import identify_plane_young

        if "measured_dofs" not in analysis \
                or "measured_u" not in analysis:
            raise ValueError('plane identification needs '
                             '"measured_dofs" and "measured_u"')
        vals, hist, fld = identify_plane_young(
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
        return {
            "success": True,
            "analysis": "identification",
            "element_type": "plane",
            "parameter": "young",
            "field": bool(analysis.get("field", False)),
            "young": vals.tolist(),
            "centroids": centroids.tolist(),
            "loss_history": hist[:: max(1, hist.size // 200)].tolist(),
            "final_loss": float(hist[-1]) if hist.size else None,
        }
    raise ValueError(f'plane analysis.type must be "static", "modal", '
                     f'"transient", "harmonic", "plastic" or '
                     f'"identification", got {kind!r}')


def run_plane_document(doc: Dict) -> Dict:
    problem, analysis = parse_plane_document(doc)
    return run_plane_analysis(problem, analysis)
