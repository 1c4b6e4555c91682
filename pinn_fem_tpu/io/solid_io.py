"""JSON tier for the 3D solid hex8 family (models/solid.py).

A solid document is self-describing via `"element_type": "solid"` —
the CLI and servers peek at that key and route here (the frame_io /
plane_io pattern):

    {"element_type": "solid",
     "nodes": [[x, y, z], ..],
     "elements": [[n0..n7], ..]            # hex8, bottom quad CCW
       | "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 4.0,
                  "nx": 2, "ny": 2, "nz": 8},
     "material": {"young": E, "poisson": nu, "density": rho, "alpha": a},
     "loads": [Fx0, Fy0, Fz0, ..],         # 3 per node (optional)
     "surface_loads": [{"face": "z_max" | [[quad node ids], ..],
                        "traction": [tx, ty, tz]}, ..],  # force/area
     "body_force": [bx, by, bz],           # force/volume
     "fixed_nodes": [..] | "z_min" | ..,   # all three DOFs clamped
       | "fixed_dofs": [..],               # raw 3n-DOF indices
     "fixed_x_nodes"/"fixed_y_nodes"/"fixed_z_nodes": [..] | "x_min",
                                           # single-component rollers
     "prescribed": [[dof, value], ..],
     "point_masses": [[node, m], ..] | [..per node..],
     "temperature": dT | [..per element..],  # thermal load case
         # (needs material alpha; STATIC analyses only — dynamics
         # refuse it; modal/buckling prestress inherit it through
         # the static state)
     "analysis": {"type": "static",
                  "banded": null,     # force the DIA device tier;
                                      # default auto > DENSE_DOF_LIMIT
                  "tolerance": 1e-7, "max_iter": 50000}
               | {"type": "modal", "n_modes": 6,
                  "include_shapes": true,
                  "prestress": true | {"scale": s} | {"u": [..]},
                                      # K_g(σ(u0)); dense tier only
                  "banded": null,     # subspace iteration on the DIA
                                      # tier (lumped mass); default
                                      # auto > DENSE_DOF_LIMIT
                  "n_iter": 30, "cg_tol": 1e-7}
               | {"type": "transient", "dt": 0.01 | "auto",
                  "n_steps": 500,
                  "damping": [a, b], "probe_nodes": [..],
                  "amplitude": {"type": "step" | "sine"} | [..],
                  "banded": null,     # explicit central difference on
                                      # the DIA matvec (lumped mass);
                                      # default auto > DENSE_DOF_LIMIT;
                                      # dt "auto" = Gershgorin step
                  "record_every": 1,
                  "plasticity": {"sigma_y": sy, "hardening": Hi,
                                 "kinematic_hardening": Hk}}
                     # explicit central difference with the J2 radial
                     # return committed every step (solvers/
                     # continuum_transient_plastic); adds energy books,
                     # von Mises envelope and final ε_p to the result;
                     # does not compose with "banded"
               | {"type": "buckling", "n_modes": 4,
                  "include_shapes": true}   # (K + λ K_g(σ)) φ = 0
               | {"type": "harmonic", "omegas": [..] | {"start": w0,
                  "stop": w1, "num": 50}, "damping": [a, b],
                  "probe_nodes": [..]}   # dense host FRF sweep
               | {"type": "spectrum", "sa": 2.5 | {..}, "direction":
                  [0, 0, 1], "n_modes": 6, "combination": "srss",
                  "damping_ratio": 0.05}  # seismic modal combination
                                          # (solvers/continuum_spectrum)
               | {"type": "random", "omegas": [..] | {..},
                  "psd": S0 | {"omegas", "values"}, "damping": [a, b],
                  "probe_nodes": [..]}    # stationary PSD response
               | {"type": "reduction", "method": "guyan" |
                  "craig_bampton", "master_nodes": [..],
                  "n_modes": 4}           # consistent-mass Guyan/CB
               | {"type": "plastic", "sigma_y": sy,  # J2 von Mises
                  "hardening": Hi, "kinematic_hardening": Hk,
                  "load_factors": [..] | "target"+"n_steps",
                  "bbar": true,      # mean-dilatation B-bar (hex8
                                     # locks in incompressible flow)
                  "tolerance": 1e-9, "max_iterations": 30,
                  "probe_nodes": [..], "include_history": false}
                                      # host f64 below DENSE_DOF_LIMIT,
                                      # jitted scan device tier above
               | {"type": "identification",  # recover E from static
                  "measured_dofs": [..], "measured_u": [..]
                    | "synthetic": {"young": E | [..]
                                    | "zone_young": [..per zone..],
                                    "noise": 0.0, "seed": 0},
                  "zones": [[elem ids..]
                            | {"z_max": 2.0, ..}, ..],  # centroid box
                  "field": false,     # true: E(x, y, z) MLP
                  "tolerance": 1e-7, "max_iter": 20000,
                  "n_iter": 300, "learning_rate": 0.05,
                  "seed": 0}}         # banded adjoint (solvers/
                                      # banded_inverse), local-CPU
                                      # tier unless "on_device"

    Every node-selecting key also accepts a named boundary FACE
    "x_min"/"x_max"/"y_min"/"y_max"/"z_min"/"z_max" (resolved on
    coordinates) — generated box meshes never hard-code node
    numbering.  surface_loads with a named face resolve to the
    element boundary quads on that plane (consistent 2x2 Gauss
    integration, models/solid.py:surface_load).

Static results carry centroid stresses (Voigt [xx, yy, zz, yz, xz,
xy]), von Mises, principal stresses and reactions; modal/transient
mirror the plane family's result shapes.  Dense analyses run on the
HOST tier (float64, zero device programs); statics above
DENSE_DOF_LIMIT rides the banded DIA device tier.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..models.solid import (SolidProblem, boundary_quads, box_mesh,
                            solid_modal, solve_solid_static,
                            solve_solid_static_banded,
                            solve_solid_transient, surface_load)

_FACE_NAMES = {"x_min": (0, -1), "x_max": (0, +1),
               "y_min": (1, -1), "y_max": (1, +1),
               "z_min": (2, -1), "z_max": (2, +1)}


def is_solid_document(doc: Dict) -> bool:
    return isinstance(doc, dict) \
        and doc.get("element_type") == "solid"


def _named_face_nodes(nodes: np.ndarray, name):
    """Node ids on a named boundary plane (or an id list verbatim)."""
    if not isinstance(name, str):
        return np.asarray(name, dtype=int).reshape(-1)
    if name not in _FACE_NAMES:
        raise ValueError(f"named face must be one of "
                         f"{sorted(_FACE_NAMES)}, got {name!r}")
    axis, side = _FACE_NAMES[name]
    coord = nodes[:, axis]
    target = coord.min() if side < 0 else coord.max()
    span = max(float(coord.max() - coord.min()), 1.0)
    return np.flatnonzero(np.abs(coord - target) <= 1e-9 * span)


def parse_solid_document(doc: Dict) -> Tuple[SolidProblem, Dict]:
    mesh = doc.get("mesh")
    if mesh is not None:
        if mesh.get("type", "box") != "box":
            raise ValueError('solid mesh.type must be "box"')
        nodes, elements = box_mesh(
            float(mesh["lx"]), float(mesh["ly"]), float(mesh["lz"]),
            int(mesh["nx"]), int(mesh["ny"]), int(mesh["nz"]))
    else:
        if "nodes" not in doc or "elements" not in doc:
            raise ValueError('solid document needs "nodes" + '
                             '"elements" or a "mesh" spec')
        nodes = np.asarray(doc["nodes"], dtype=float)
        elements = np.asarray(doc["elements"], dtype=int)
    mat = doc.get("material", {})
    if mat.get("poisson") is None:
        raise ValueError('solid material needs "poisson"')
    nnode = nodes.shape[0]
    loads = np.asarray(doc.get("loads", np.zeros(3 * nnode)),
                       dtype=float).reshape(-1)

    fixed_parts = []
    if "fixed_dofs" in doc:
        fixed_parts.append(np.asarray(doc["fixed_dofs"], dtype=int))
    if "fixed_nodes" in doc:
        fn = _named_face_nodes(nodes, doc["fixed_nodes"])
        fixed_parts.append(
            (3 * fn[:, None] + np.arange(3)).reshape(-1))
    for key, comp in (("fixed_x_nodes", 0), ("fixed_y_nodes", 1),
                      ("fixed_z_nodes", 2)):
        if key in doc:
            fn = _named_face_nodes(nodes, doc[key])
            fixed_parts.append(3 * fn + comp)
    prescribed_pairs = doc.get("prescribed")
    if prescribed_pairs is not None:
        arr = np.asarray(prescribed_pairs, dtype=float)
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise ValueError('prescribed must be [[dof, value], ..]')
        fixed_parts.append(arr[:, 0].astype(int))
    if not fixed_parts:
        raise ValueError('solid document needs supports: '
                         '"fixed_nodes", "fixed_dofs", '
                         '"fixed_*_nodes" or "prescribed"')
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
        if arr.ndim == 2:
            full = np.zeros(nnode)
            for node, mass in arr:
                full[int(node)] += float(mass)
            pm = full
        else:
            pm = arr

    from .plane_io import _thermal_block
    _th_alpha, _th_temp = _thermal_block(doc, mat)
    problem = SolidProblem(
        nodes=nodes, elements=elements,
        young=mat.get("young", 1.0), poisson=mat["poisson"],
        density=mat.get("density", 1.0),
        loads=loads, fixed_dofs=fixed, prescribed=prescribed,
        body_force=doc.get("body_force"), point_masses=pm,
        alpha_cte=_th_alpha,
        temperature=_th_temp)

    # Surface loads resolve AFTER the problem exists (named faces need
    # the element boundary quads).
    for spec in doc.get("surface_loads", []):
        if "face" not in spec or "traction" not in spec:
            raise ValueError('surface_loads entries need "face" (a '
                             'named plane or explicit quads) and '
                             '"traction" [tx, ty, tz]')
        face = spec["face"]
        if isinstance(face, str):
            if face not in _FACE_NAMES:
                raise ValueError(f"named face must be one of "
                                 f"{sorted(_FACE_NAMES)}, got {face!r}")
            axis, side = _FACE_NAMES[face]
            quads = boundary_quads(problem, axis, side)
        else:
            quads = np.asarray(face, dtype=int)
        problem.loads = problem.loads + surface_load(
            nodes, quads, spec["traction"], ndof=3 * nnode)
    return problem, dict(doc.get("analysis") or {"type": "static"})


def _resolve_zones(problem: SolidProblem, zones):
    """Zone specs -> element-id arrays: explicit id lists or centroid
    bounding boxes {"x_min".."z_max"} (any subset) — the plane
    family's contract in 3D."""
    cent = problem.coords().mean(axis=1)
    out = []
    keys = {"x_min": (0, +1), "x_max": (0, -1), "y_min": (1, +1),
            "y_max": (1, -1), "z_min": (2, +1), "z_max": (2, -1)}
    for z in zones:
        if isinstance(z, dict):
            unknown = set(z) - set(keys)
            if unknown:
                raise ValueError(f"unknown zone keys: "
                                 f"{sorted(unknown)}")
            sel = np.ones(problem.nelm, dtype=bool)
            for k, (axis, sign) in keys.items():
                if k in z:
                    if sign > 0:
                        sel &= cent[:, axis] >= float(z[k])
                    else:
                        sel &= cent[:, axis] <= float(z[k])
            out.append(np.flatnonzero(sel))
        else:
            out.append(np.asarray(z, dtype=int).reshape(-1))
        if out[-1].size == 0:
            raise ValueError(f"zone {len(out) - 1} selects no "
                             f"elements")
    return out


def _probe_dofs(analysis: Dict, problem: SolidProblem):
    probe = analysis.get("probe_dofs")
    if probe is None and analysis.get("probe_nodes") is not None:
        pn = _named_face_nodes(problem.nodes, analysis["probe_nodes"])
        probe = (3 * pn[:, None] + np.arange(3)).reshape(-1)
    return probe


def run_solid_analysis(problem: SolidProblem, analysis: Dict) -> Dict:
    kind = analysis.get("type", "static")
    if kind == "solid":
        # The Node /api/fem/solid route injects type="solid" when the
        # document carries no analysis block — that means statics.
        kind = "static"
    if kind == "static":
        from ..solvers.newton import DENSE_DOF_LIMIT

        banded = analysis.get("banded")
        if banded is None:
            banded = problem.ndof > DENSE_DOF_LIMIT
        if banded:
            res, iters, rel = solve_solid_static_banded(
                problem, tol=float(analysis.get("tolerance", 1e-7)),
                max_iter=int(analysis.get("max_iter", 50000)))
        else:
            res = solve_solid_static(problem)
            iters = rel = None
        out = {
            "success": True,
            "analysis": "static",
            "element_type": "solid",
            "method": "banded" if banded else "dense",
            "max_displacement": float(
                np.abs(res.displacements).max()),
            "max_von_mises": float(res.von_mises.max()),
        }
        if banded:
            out["iterations"] = iters
            out["relative_residual"] = rel
        # Payload gate: full fields only below the JSON size limit
        # (io/_common._SHAPES_JSON_DOF_LIMIT doctrine).
        from ._common import _SHAPES_JSON_DOF_LIMIT, _json_finite

        if analysis.get("include_fields",
                        problem.ndof <= _SHAPES_JSON_DOF_LIMIT):
            out["displacements"] = res.displacements.tolist()
            out["stresses"] = res.stresses.tolist()
            out["von_mises"] = res.von_mises.tolist()
            out["principal"] = res.principal.tolist()
            out["reactions"] = res.reactions.tolist()
        return _json_finite(out)
    if kind == "modal":
        from ..solvers.newton import DENSE_DOF_LIMIT

        n_modes = int(analysis.get("n_modes", 6))
        banded = analysis.get("banded")
        if banded is None:
            banded = problem.ndof > DENSE_DOF_LIMIT
        pres = None
        if analysis.get("prestress") is not None:
            if banded:
                raise ValueError("prestressed solid modal runs on the "
                                 "dense host tier; drop banded")
            from ._common import _continuum_prestress_u

            pres = _continuum_prestress_u(
                problem, analysis["prestress"],
                lambda pp: solve_solid_static(pp).displacements)
        if banded:
            from ..models.solid import solid_modal_banded

            res = solid_modal_banded(
                problem, n_modes=n_modes,
                n_iter=int(analysis.get("n_iter", 30)),
                cg_tol=float(analysis.get("cg_tol", 1e-7)))
        else:
            res = solid_modal(problem, n_modes=n_modes,
                              prestress_u=pres)
        out = {
            "success": True,
            "analysis": "modal",
            "element_type": "solid",
            "method": "banded" if banded else "dense",
            "prestressed": pres is not None,
            "frequencies_hz": res.frequencies_hz.tolist(),
            "omegas": res.omegas.tolist(),
            "eigenvalues": res.eigenvalues.tolist(),
        }
        from ._common import _SHAPES_JSON_DOF_LIMIT

        if analysis.get("include_shapes",
                        problem.ndof <= _SHAPES_JSON_DOF_LIMIT):
            out["mode_shapes"] = res.mode_shapes.tolist()
        return out
    if kind == "transient":
        from ..solvers.newton import DENSE_DOF_LIMIT

        if "plasticity" in analysis:
            # Explicit elastoplastic transient (solvers/
            # continuum_transient_plastic) — the truss "plasticity"
            # transient contract on the solid family; dt="auto"
            # (default) applies the damped Gershgorin bound.
            from ..solvers.continuum_transient_plastic import \
                solve_solid_transient_plastic
            from ._common import run_continuum_transient_plastic

            if analysis.get("banded"):
                raise ValueError('"plasticity" carries committed '
                                 'Gauss-point state through its own '
                                 'scan — it does not compose with the '
                                 'linear banded tier; drop "banded"')
            if analysis.get("n_steps") is None:
                raise ValueError('solid transient needs "n_steps"')
            return run_continuum_transient_plastic(
                problem, analysis, "solid",
                solve_solid_transient_plastic,
                _probe_dofs(analysis, problem))
        if "dt" not in analysis or "n_steps" not in analysis:
            raise ValueError('solid transient needs "dt" and '
                             '"n_steps"')
        n_steps = int(analysis["n_steps"])
        damping = tuple(analysis.get("damping", (0.0, 0.0)))
        banded = analysis.get("banded")
        if banded is None:
            banded = problem.ndof > DENSE_DOF_LIMIT
        dt_spec = analysis["dt"]
        if dt_spec == "auto":
            if not banded:
                raise ValueError('dt="auto" (Gershgorin critical step) '
                                 'applies to the banded explicit tier; '
                                 'the dense Newmark path is '
                                 'unconditionally stable — give dt')
            from ..models.solid import solid_stable_dt

            dt = solid_stable_dt(problem, damping=damping)
        else:
            dt = float(dt_spec)
        amp_spec = analysis.get("amplitude")
        amp = None
        if amp_spec is not None:
            from ._common import _amplitude_array

            amp = _amplitude_array(amp_spec, n_steps, dt)
        probe = _probe_dofs(analysis, problem)
        record_every = int(analysis.get("record_every", 1))
        if banded:
            from ..models.solid import solve_solid_transient_banded

            res = solve_solid_transient_banded(
                problem, dt, n_steps, damping=damping, amplitude=amp,
                probe_dofs=probe, record_every=record_every)
        else:
            res = solve_solid_transient(
                problem, dt, n_steps, damping=damping, amplitude=amp,
                probe_dofs=probe, record_every=record_every)
        return {
            "success": True,
            "analysis": "transient",
            "element_type": "solid",
            "method": ("central-banded" if banded else "newmark"),
            "dt": res.dt,
            "n_steps": res.n_steps,
            "times": res.times.tolist(),
            "displacements": res.displacements.tolist(),
            "velocities": res.velocities.tolist(),
        }
    if kind == "reduction":
        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"solid reduction condenses a dense (K, M) pair; "
                f"{problem.ndof} DOFs exceeds its 8192-DOF budget — "
                "condense a substructure, not the full large mesh")
        from ._common import run_continuum_reduction

        return run_continuum_reduction(problem, analysis, "solid")
    if kind in ("spectrum", "random"):
        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"solid {kind} runs on the dense host modal/FRF tier; "
                f"{problem.ndof} DOFs exceeds its 8192-DOF budget — "
                "coarsen the mesh")
        if kind == "spectrum":
            from ._common import run_continuum_spectrum

            return run_continuum_spectrum(problem, analysis, "solid")
        from ._common import run_continuum_random

        return run_continuum_random(problem, analysis, "solid",
                                    _probe_dofs(analysis, problem))
    if kind == "buckling":
        from ..models.solid import solid_buckling

        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"solid buckling runs a dense symmetric pencil; "
                f"{problem.ndof} DOFs exceeds its 8192-DOF budget — "
                "coarsen the mesh")
        res = solid_buckling(problem,
                             n_modes=int(analysis.get("n_modes", 4)))
        out = {
            "success": True,
            "analysis": "buckling",
            "element_type": "solid",
            "load_factors": res.load_factors.tolist(),
            "von_mises": res.von_mises.tolist(),
        }
        if analysis.get("include_shapes", True):
            out["buckling_modes"] = res.modes.tolist()
        return out
    if kind == "harmonic":
        from ..models.solid import solid_harmonic

        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"solid harmonic runs dense complex solves per "
                f"frequency; {problem.ndof} DOFs exceeds its 8192-DOF "
                "budget — coarsen the mesh")
        om = analysis.get("omegas")
        if om is None:
            raise ValueError('solid harmonic needs "omegas"')
        if isinstance(om, dict):
            om = np.linspace(float(om["start"]), float(om["stop"]),
                             int(om.get("num", 50)))
        res = solid_harmonic(
            problem, om, damping=analysis.get("damping", (0.0, 0.0)),
            probe_dofs=_probe_dofs(analysis, problem))
        return {
            "success": True,
            "analysis": "harmonic",
            "element_type": "solid",
            "omegas": res.omegas.tolist(),
            "amplitude": res.amplitude.tolist(),
        }
    if kind == "plastic":
        from ..solvers.solid_plasticity import solve_solid_plastic

        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"solid plastic runs dense Newton per load step; "
                f"{problem.ndof} DOFs exceeds its 8192-DOF budget "
                "(dense LU per iteration) — coarsen the mesh")
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
        res = solve_solid_plastic(problem, **kwargs)
        probe = _probe_dofs(analysis, problem)
        if probe is None:
            probe = np.arange(problem.ndof)
        probe = np.asarray(probe, dtype=int).reshape(-1)
        yielded = np.flatnonzero(res.eq_plastic[-1] > 0.0)
        out = {
            "success": bool(res.converged),
            "analysis": "plastic",
            "element_type": "solid",
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
    if kind == "reliability":
        if problem.ndof > 4 * 2048:
            raise ValueError(
                f"solid reliability runs dense traced solves per "
                f"HL-RF iteration; {problem.ndof} DOFs exceeds its "
                "8192-DOF budget — coarsen the mesh")
        from ._common import run_continuum_reliability

        return run_continuum_reliability(problem, analysis, "solid")
    if kind == "identification":
        from ..models.solid import identify_solid_young_banded
        from ._common import _local_cpu_ctx

        zones = analysis.get("zones")
        if zones is not None:
            zones = _resolve_zones(problem, zones)
        synthetic = analysis.get("synthetic")
        true_young = None
        if synthetic is not None:
            # Twin-data mode (the plane family's contract in 3D):
            # generate the measurement on the banded tier from the
            # given true field.
            if "measured_u" in analysis:
                raise ValueError('give "measured_u" or "synthetic", '
                                 'not both')
            md = analysis.get("measured_dofs")
            if md is None:
                md = _probe_dofs(analysis, problem)
            if md is None:
                raise ValueError('synthetic solid identification '
                                 'needs "measured_dofs" or '
                                 '"probe_nodes"')
            measured_dofs = np.asarray(md, dtype=int).reshape(-1)
            if "zone_young" in synthetic:
                if zones is None:
                    raise ValueError('"zone_young" needs "zones"')
                true_young = problem.young.copy()
                for ids, e in zip(zones, synthetic["zone_young"]):
                    true_young[ids] = float(e)
            else:
                tv = synthetic["young"]
                true_young = (np.full(problem.nelm, float(tv))
                              if np.isscalar(tv)
                              else np.asarray(tv, dtype=float))
            p_true = SolidProblem(
                nodes=problem.nodes, elements=problem.elements,
                young=true_young, poisson=problem.poisson,
                density=problem.density, loads=problem.loads,
                fixed_dofs=problem.fixed_dofs,
                body_force=problem.body_force)
            r_true, _, _ = solve_solid_static_banded(
                p_true,
                tol=float(analysis.get("tolerance", 1e-7)) * 0.01)
            measured_u = r_true.displacements[measured_dofs]
            noise = float(synthetic.get("noise", 0.0))
            if noise:
                rng = np.random.default_rng(
                    int(synthetic.get("seed", 0)))
                measured_u = measured_u + noise * np.max(
                    np.abs(measured_u)) * rng.standard_normal(
                        measured_u.shape)
            analysis = dict(analysis,
                            measured_dofs=measured_dofs.tolist(),
                            measured_u=measured_u.tolist())
        if "measured_dofs" not in analysis \
                or "measured_u" not in analysis:
            raise ValueError('solid identification needs '
                             '"measured_dofs" and "measured_u" (or '
                             '"synthetic" twin data)')
        with _local_cpu_ctx(analysis):
            vals, hist, fld = identify_solid_young_banded(
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
                neurons_per_layer=int(analysis.get("neurons_per_layer",
                                                   16)))
        out = {
            "success": True,
            "analysis": "identification",
            "element_type": "solid",
            "parameter": "young",
            "method": "banded",
            "field": bool(analysis.get("field", False)),
            "young": vals.tolist(),
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
        from ._common import _json_finite

        return _json_finite(out)
    raise ValueError(f'solid analysis.type must be "static", "modal", '
                     f'"transient", "harmonic", "buckling", "plastic", '
                     f'"spectrum", "random", "reduction", '
                     f'"reliability" or "identification", got '
                     f'{kind!r}')


def run_solid_document(doc: Dict) -> Dict:
    problem, analysis = parse_solid_document(doc)
    return run_solid_analysis(problem, analysis)
