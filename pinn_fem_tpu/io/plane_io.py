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
                  "density": rho,        # scalars or per-element
                  "alpha": a},           # CTE (thermal load case)
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
     "temperature": dT | [..per element..],  # thermal load case
         # (needs material alpha; STATIC analyses only — dynamics
         # refuse it; modal/buckling prestress inherit it through
         # the static state: heated-clamped thermal buckling works)
     "analysis": {"type": "static"}
               | {"type": "modal", "n_modes": 6,
                  "include_shapes": true,
                  "prestress": true | {"scale": s} | {"u": [..]}}
                     # adds K_g(σ(u0)) — tension stiffens, compression
                     # softens toward the buckling factor
               | {"type": "transient", "dt": 0.01, "n_steps": 500,
                  "damping": [a, b], "probe_nodes": [..],
                  "amplitude": {"type": "step" | "sine"} | [..],
                  "record_every": 1,
                  "plasticity": {"sigma_y": sy, "hardening": Hi,
                                 "kinematic_hardening": Hk},
                     # explicit central difference with the J2 radial
                     # return committed every step (solvers/
                     # continuum_transient_plastic); dt may be "auto"
                     # (damped Gershgorin bound); adds energy books,
                     # von Mises envelope and final ε_p to the result;
                     # optional "bbar" as in the static plastic block
                  }
               | {"type": "harmonic", "omegas": [..] | {"start": w0,
                  "stop": w1, "num": 50}, "damping": [a, b],
                  "probe_nodes": [..]}
               | {"type": "buckling", "n_modes": 4,
                  "include_shapes": true}   # (K + λ K_g(σ)) φ = 0
               | {"type": "spectrum",       # seismic peak response by
                  "sa": 2.5 | {"omegas", "values"}   # modal SRSS/CQC
                      | {"history": .., "dt": ..},   # (solvers/
                  "direction": [1, 0],      # continuum_spectrum; the
                  "n_modes": 6,             # truss run_spectrum Sa
                  "combination": "srss",    # contract, single
                  "damping_ratio": 0.05}    # direction)
               | {"type": "random",         # stationary PSD response
                  "omegas": [..] | {"start", "stop", "num"},
                  "psd": S0 | {"omegas", "values"},
                  "damping": [a, b],        # must be nonzero
                  "probe_nodes": [..]}
               | {"type": "reduction", "method": "guyan" |
                  "craig_bampton", "master_nodes": [..] |
                  "master_dofs": [..], "n_modes": 4,
                  "compare_full": true}   # consistent-mass Guyan/CB
                                          # (solvers/reduction dense
                                          # cores)
               | {"type": "plastic", "sigma_y": sy,  # J2 von Mises
                  "hardening": Hi, "kinematic_hardening": Hk,
                  "load_factors": [..] | "target"+"n_steps",
                  "bbar": true,      # mean-dilatation (plane strain)
                  "tolerance": 1e-9, "max_iterations": 30,
                  "probe_nodes": [..], "include_history": false}
               | {"type": "identification",       # recover E from
                  "measured_dofs": [..],          # measured static
                  "measured_u": [..],             # displacements
                    | "synthetic": {"young": E | [..per element..]
                                    | "zone_young": [..per zone..],
                                    "noise": 0.0, "seed": 0},
                                      # twin data generated on the
                                      # banded tier; probes via
                                      # "measured_dofs"/"probe_nodes"
                  "field": false,     # true: E(x, y) MLP (PINN form)
                  "zones": [[elem ids..]           # one E per zone
                            | {"y_max": 2.0, ..}, ..],  # centroid box
                                      # (damage localization; banded)
                  "banded": null,     # force the banded adjoint tier;
                                      # default: auto above
                                      # DENSE_DOF_LIMIT or with zones
                  "tolerance": 1e-7, "max_iter": 20000,  # banded PCG
                  "n_iter": 800, "learning_rate": 0.05,
                  "hidden_layers": 2, "neurons_per_layer": 16,
                  "seed": 0}}

    Every node-selecting key (fixed_nodes, fixed_x/y_nodes,
    edge_loads[].nodes, probe_nodes, measured filters) also accepts a
    named boundary edge "left"/"right"/"bottom"/"top" (resolved on
    coordinates, path-ordered) — generated meshes never hard-code the
    generator's node numbering.

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


def _named_nodes(nodes: np.ndarray, name):
    """Boundary-edge selector: "left"/"right" (x extreme) or
    "bottom"/"top" (y extreme) -> node ids on that edge, ordered ALONG
    it (path order, as edge_loads requires).  Id lists pass through —
    every node-selecting key accepts either form, so documents with
    generated meshes never hard-code generator numbering."""
    if not isinstance(name, str):
        return np.asarray(name, dtype=int).reshape(-1)
    axis, pick = {"left": (0, np.min), "right": (0, np.max),
                  "bottom": (1, np.min), "top": (1, np.max)}.get(
                      name, (None, None))
    if axis is None:
        raise ValueError(f'named node selector must be "left", '
                         f'"right", "bottom" or "top", got {name!r}')
    coord = nodes[:, axis]
    span = max(float(coord.max() - coord.min()), 1.0)
    ids = np.flatnonzero(np.abs(coord - pick(coord)) <= 1e-9 * span)
    return ids[np.argsort(nodes[ids, 1 - axis])]


def _thermal_block(doc, mat):
    """Unified thermal contract: the truss families' extension block
    {"thermal": {"alpha": a, "delta_t": dT}} (io/schema.py:196) is
    accepted on every element family alongside the native
    material-"alpha" + document-"temperature" keys; giving both forms
    at once is ambiguous and refused.  Returns (alpha, temperature)."""
    th = doc.get("thermal")
    if th is None:
        return mat.get("alpha"), doc.get("temperature")
    if "temperature" in doc or "alpha" in mat:
        raise ValueError('give EITHER the "thermal" block OR '
                         'material "alpha" + "temperature", not both')
    if "delta_t" not in th:
        raise ValueError('"thermal" block needs "delta_t"')
    return th.get("alpha", 1.0), th["delta_t"]


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
        path = _named_nodes(nodes, spec["nodes"])
        if has_traction:
            loads = loads + edge_load(nodes, path,
                                      spec["traction"], float(t_arr[0]),
                                      ndof=2 * nnode)
        else:
            from ..models.plane import pressure_load

            loads = loads + pressure_load(nodes, path,
                                          float(spec["pressure"]),
                                          float(t_arr[0]),
                                          ndof=2 * nnode)

    fixed_parts = []
    if "fixed_dofs" in doc:
        fixed_parts.append(np.asarray(doc["fixed_dofs"], dtype=int))
    if "fixed_nodes" in doc:
        fn = _named_nodes(nodes, doc["fixed_nodes"])
        fixed_parts.append(np.concatenate([2 * fn, 2 * fn + 1]))
    if "fixed_x_nodes" in doc:
        fn = _named_nodes(nodes, doc["fixed_x_nodes"])
        fixed_parts.append(2 * fn)
    if "fixed_y_nodes" in doc:
        fn = _named_nodes(nodes, doc["fixed_y_nodes"])
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
        point_masses=pm,
        alpha_cte=_thermal_block(doc, mat)[0],
        temperature=_thermal_block(doc, mat)[1])
    return problem, dict(doc.get("analysis") or {"type": "static"})


def _resolve_zones(problem: PlaneProblem, zones):
    """Zone specs -> element-id arrays.  Each entry is an explicit id
    list or a centroid bounding box {"x_min", "x_max", "y_min",
    "y_max"} (any subset) — the JSON-friendly way to mark a damage
    region on a generated mesh."""
    cent = problem.coords().mean(axis=1)
    out = []
    for z in zones:
        if isinstance(z, dict):
            unknown = set(z) - {"x_min", "x_max", "y_min", "y_max"}
            if unknown:
                raise ValueError(f"unknown zone keys: {sorted(unknown)}")
            sel = np.ones(problem.nelm, dtype=bool)
            if "x_min" in z:
                sel &= cent[:, 0] >= float(z["x_min"])
            if "x_max" in z:
                sel &= cent[:, 0] <= float(z["x_max"])
            if "y_min" in z:
                sel &= cent[:, 1] >= float(z["y_min"])
            if "y_max" in z:
                sel &= cent[:, 1] <= float(z["y_max"])
            out.append(np.flatnonzero(sel))
        else:
            out.append(np.asarray(z, dtype=int).reshape(-1))
        if out[-1].size == 0:
            raise ValueError(f"zone {len(out) - 1} selects no elements")
    return out


def _probe_dofs(analysis: Dict, problem: PlaneProblem):
    probe = analysis.get("probe_dofs")
    if probe is None and analysis.get("probe_nodes") is not None:
        pn = _named_nodes(problem.nodes, analysis["probe_nodes"])
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
                "plastic", "buckling", "spectrum", "random",
                "reduction", "reliability", "sizing") \
            and problem.ndof > 4 * 2048:
        raise ValueError(
            f"plane {kind} runs on the dense host tier; {problem.ndof} "
            "DOFs exceeds its 8192-DOF budget (minutes of O(n^3) work "
            "on one core) — coarsen the mesh; only statics has a "
            "banded large-mesh path so far")
    if kind == "reduction":
        from ._common import run_continuum_reduction

        return run_continuum_reduction(problem, analysis, "plane")
    if kind == "reliability":
        from ._common import run_continuum_reliability

        return run_continuum_reliability(problem, analysis, "plane")
    if kind == "sizing":
        # Minimum-weight thickness field (solvers/continuum_sizing.py)
        # — the frame sizing block's contract with thickness for
        # inertia; stress and/or displacement limits.
        from ..solvers.continuum_sizing import optimize_plane_thickness

        t_e, weight, hist = optimize_plane_thickness(
            problem,
            stress_limit=(None if analysis.get("stress_limit") is None
                          else float(analysis["stress_limit"])),
            displacement_limit=(
                None if analysis.get("displacement_limit") is None
                else float(analysis["displacement_limit"])),
            probe_dofs=_probe_dofs(analysis, problem),
            min_thickness=float(analysis.get("min_thickness", 1e-6)),
            n_iter=int(analysis.get("n_iter", 300)),
            outer_rounds=int(analysis.get("outer_rounds", 4)),
            learning_rate=float(analysis.get("learning_rate", 0.05)))
        out = {
            "success": True,
            "analysis": "sizing",
            "element_type": "plane",
            "thickness": t_e.tolist(),
            "weight": weight,
            "history": hist.tolist(),
        }
        for key in ("stress_limit", "displacement_limit"):
            if analysis.get(key) is not None:
                out[key] = float(analysis[key])
        return out
    if kind == "spectrum":
        from ._common import run_continuum_spectrum

        return run_continuum_spectrum(problem, analysis, "plane")
    if kind == "random":
        from ._common import run_continuum_random

        return run_continuum_random(problem, analysis, "plane",
                                    _probe_dofs(analysis, problem))
    if kind == "buckling":
        from ..models.plane import plane_buckling

        res = plane_buckling(problem,
                             n_modes=int(analysis.get("n_modes", 4)))
        out = {
            "success": True,
            "analysis": "buckling",
            "element_type": "plane",
            "load_factors": res.load_factors.tolist(),
            "von_mises": res.von_mises.tolist(),
        }
        if analysis.get("include_shapes", True):
            out["buckling_modes"] = res.modes.tolist()
        return out
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
        pres = None
        if analysis.get("prestress") is not None:
            # NOTE: do NOT re-import solve_plane_static here — a local
            # import anywhere in this function makes the name
            # function-local and breaks the static branch above
            # (UnboundLocalError; it is module-imported already).
            from ._common import _continuum_prestress_u

            pres = _continuum_prestress_u(
                problem, analysis["prestress"],
                lambda pp: solve_plane_static(pp).displacements)
        res = plane_modal(problem,
                          n_modes=int(analysis.get("n_modes", 6)),
                          prestress_u=pres)
        out = {
            "success": True,
            "analysis": "modal",
            "element_type": "plane",
            "prestressed": pres is not None,
            "frequencies_hz": res.frequencies_hz.tolist(),
            "omegas": res.omegas.tolist(),
            "eigenvalues": res.eigenvalues.tolist(),
        }
        if analysis.get("include_shapes", True):
            out["mode_shapes"] = res.mode_shapes.tolist()
        return out
    if kind == "transient":
        if "plasticity" in analysis:
            # Explicit elastoplastic transient (solvers/
            # continuum_transient_plastic) — the truss "plasticity"
            # transient contract on the continuum family; dt="auto"
            # (default) applies the damped Gershgorin bound.
            from ..solvers.continuum_transient_plastic import \
                solve_plane_transient_plastic
            from ._common import run_continuum_transient_plastic

            if analysis.get("n_steps") is None:
                raise ValueError('plane transient needs "n_steps"')
            extra = {}
            if analysis.get("bbar") is not None:
                extra["bbar"] = bool(analysis["bbar"])
            out = run_continuum_transient_plastic(
                problem, analysis, "plane",
                solve_plane_transient_plastic,
                _probe_dofs(analysis, problem), **extra)
            out["plane_strain"] = bool(problem.plane_strain)
            return out
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
        from ..models.plane import (identify_plane_young,
                                    identify_plane_young_banded)
        from ..solvers.newton import DENSE_DOF_LIMIT

        zones = analysis.get("zones")
        if zones is not None:
            zones = _resolve_zones(problem, zones)
        synthetic = analysis.get("synthetic")
        true_young = None
        if synthetic is not None:
            # Twin-data mode (the truss identification family's
            # contract): generate the measurement from the given true
            # field on the BANDED tier, then identify from the
            # problem's own (wrong) material.
            if "measured_u" in analysis:
                raise ValueError('give "measured_u" or "synthetic", '
                                 'not both')
            md = analysis.get("measured_dofs")
            if md is None:
                md = _probe_dofs(analysis, problem)
            if md is None:
                raise ValueError('synthetic plane identification needs '
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
            from ..models.plane import (PlaneProblem as _PP,
                                        solve_plane_static_banded)

            p_true = _PP(nodes=problem.nodes, elements=problem.elements,
                         young=true_young, poisson=problem.poisson,
                         thickness=problem.thickness,
                         density=problem.density, loads=problem.loads,
                         fixed_dofs=problem.fixed_dofs,
                         plane_strain=problem.plane_strain,
                         body_force=problem.body_force)
            r_true, _, _ = solve_plane_static_banded(
                p_true, tol=float(analysis.get("tolerance", 1e-7)) * 0.01)
            measured_u = r_true.displacements[measured_dofs]
            noise = float(synthetic.get("noise", 0.0))
            if noise:
                rng = np.random.default_rng(int(synthetic.get("seed",
                                                              0)))
                measured_u = measured_u + noise * np.max(
                    np.abs(measured_u)) * rng.standard_normal(
                        measured_u.shape)
            analysis = dict(analysis,
                            measured_dofs=measured_dofs.tolist(),
                            measured_u=measured_u.tolist())
        if "measured_dofs" not in analysis \
                or "measured_u" not in analysis:
            raise ValueError('plane identification needs '
                             '"measured_dofs" and "measured_u" (or '
                             '"synthetic" twin data)')
        # The banded adjoint tier (round-4 VERDICT #5) is the ONLY
        # path past DENSE_DOF_LIMIT (the dense path traces an
        # (ndof, ndof) K through the optimizer) and the natural one
        # for zone parameterizations at any size.
        banded = analysis.get("banded")
        if banded is None:
            banded = problem.ndof > DENSE_DOF_LIMIT or zones is not None
        if banded:
            # Identification-family doctrine (io/identification_io.py):
            # the ADAM loop runs on the LOCAL CPU tier unless
            # "on_device": true opts into the accelerator — per-step
            # device round trips through the attachment would dominate
            # a 90-iteration loop whose solves are milliseconds.
            from ._common import _local_cpu_ctx

            with _local_cpu_ctx(analysis):
                vals, hist, fld = identify_plane_young_banded(
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
            vals, hist, fld = identify_plane_young(
                problem,
                analysis["measured_dofs"], analysis["measured_u"],
                n_iter=int(analysis.get("n_iter", 800)),
                learning_rate=float(analysis.get("learning_rate",
                                                 0.05)),
                field=bool(analysis.get("field", False)),
                seed=int(analysis.get("seed", 0)),
                hidden_layers=int(analysis.get("hidden_layers", 2)),
                neurons_per_layer=int(analysis.get("neurons_per_layer",
                                                   16)))
        centroids = problem.coords().mean(axis=1)
        out = {
            "success": True,
            "analysis": "identification",
            "element_type": "plane",
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
    raise ValueError(f'plane analysis.type must be "static", "modal", '
                     f'"transient", "harmonic", "buckling", "plastic", '
                     f'"spectrum", "random", "reduction", '
                     f'"reliability", "sizing" or "identification", '
                     f'got {kind!r}')


def run_plane_document(doc: Dict) -> Dict:
    problem, analysis = parse_plane_document(doc)
    return run_plane_analysis(problem, analysis)
