"""JSON tier for the flat-facet shell family (models/shell.py).

A shell document is self-describing via `"element_type": "shell"` —
3D midsurface nodes with six DOFs each (the frame3d routing
convention):

    {"element_type": "shell",
     "nodes": [[x, y, z], ..], "elements": [[a, b, c, d], ..]
       # or a generated curved midsurface:
     "mesh": {"type": "cylinder_panel", "radius": R, "length": L,
              "half_angle_deg": phi, "nx": n, "ny": n}
           | {"type": "hemisphere", "radius": R, "hole_deg": 18,
              "n": n}
           | {"type": "arch_strip", "length": L, "width": W,
              "rise": e, "nx": n},   # half-sine shallow arch (the
                                     # Marguerre snap-through case)
     "material": {"young": E, "poisson": nu, "thickness": t,
                  "density": rho},          # scalars or per-element
     "loads": [6 per node ..],              # optional
     "point_loads": [[node, dof, value], ..],  # dof 0-5, accumulated
     "sine_load": Q,   # arch_strip only: downward half-sine load of
                       # amplitude Q per unit projected area (the
                       # trapezoid nodal pattern whose continuum
                       # snap-through path is the exact single-mode
                       # cubic — solvers/shell_nonlinear.py)
     "fixed_nodes": [..] | "fixed_dofs": [..],
     "supports": [{"nodes": [..] | "y_min", "dofs": [..]}, ..],
         # per-group DOF constraints (diaphragms, symmetry planes) —
         # dofs index u,v,w,thx,thy,thz per node; "x_min".."z_max"
         # name a coordinate extreme of the (generated) midsurface
     "pressure": q,                         # + along facet normals
     "body_force": [gx, gy, gz],            # force / unit area
     "point_masses": [[node, m], ..] | [..per node..],
     "temperature": dT | [..per element..],   # uniform midsurface ΔT
     "temperature_gradient": dTg | [..],      # TOP−BOTTOM face ΔT
         # thermoelastic STATIC load case (needs material "alpha"):
         # ΔT stretches the membrane (ε_th = αΔT), ΔT_g bends it
         # (κ_th = αΔT_g/t — the plate-family convention); dynamic
         # analyses refuse it loudly, buckling inherits the thermal
         # membrane forces through the document's own static state
     "analysis": {"type": "static"}         # default
               | {"type": "modal", "n_modes": 6}
               | {"type": "buckling", "n_modes": 4,
                  "membrane_force": [N11, N22, N12]}
                     # linearized (K + λ K_g) φ = 0; membrane_force
                     # (LOCAL facet axes, tension positive, scalars
                     # or per-element rows) is optional — omitted,
                     # K_g comes from the document's OWN static
                     # solution, so λ scales the applied loads
               | {"type": "transient", "dt": 0.01, "n_steps": 500,
                  "damping": [a, b], "probe_nodes": [..] |
                  "probe_dofs": [..],
                  "amplitude": {"type": "step"} | [..],
                  "record_every": 1}
               | {"type": "harmonic", "omegas": [..] |
                  {"start": w0, "stop": w1, "num": n},
                  "damping": [a, b], "probe_nodes": [..] |
                  "probe_dofs": [..]}
               | {"type": "spectrum", "sa": 2.5 | {..},
                  "direction": [x, y, z], "n_modes": 6,
                  "combination": "srss" | "cqc",
                  "damping_ratio": 0.05}
                     # seismic modal combination; governing
                     # extreme-fiber vM of the combined [N, M]
                     # resultants (solvers/continuum_spectrum)
               | {"type": "random", "omegas": [..] | {..},
                  "psd": S0 | {..}, "damping": [a, b],
                  "probe_nodes": [..],
                  "fatigue": {"sn": {..}, "duration": T},
                  "probe_elements": [..]}
                     # spectral fatigue assesses BOTH extreme fibers
                     # σ± = N/t ± 6M/t² per facet and keeps the
                     # governing one (shell_fiber_stress_frf)
               | {"type": "reduction", "method": "guyan" |
                  "craig_bampton", "master_nodes": [..],
                  "n_modes": 4}
               | {"type": "plastic", "sigma_y": sy,
                  "hardening": H, "kinematic_hardening": Hk,
                  "n_layers": 20, "n_steps": 20, "target": 1.0,
                  "load_factors": [..], "probe_nodes": [..],
                  "include_history": false}
                     # layered J2 with membrane+bending kinematics
                     # (solvers/shell_plasticity.py) — the N-M
                     # interaction family; thermoelastic refused
               | {"type": "nonlinear", "load_factors": [..] |
                  "target"/"n_steps", "probe_nodes": [..]}
                     # geometrically nonlinear von Kármán/Marguerre
                     # statics on flat/shallow midsurfaces (membrane
                     # stiffening, bifurcation); fails AT limit
                     # points — use "continuation" for snap-through
               | {"type": "continuation", "n_steps": 60,
                  "dl0": 0.05, "max_dl": dl, "probe_nodes": [..]}
                     # arc-length (Riks) on the Marguerre assembly:
                     # snap-through of shallow arches/panels traced
                     # THROUGH both limit points (the truss
                     # continuation contract on shells)
               | {"type": "identification", ..}    # per-facet/zone/
                     # MLP-field E from measured displacements — the
                     # plane-family contract (synthetic twin data,
                     # zones as 3D bboxes, banded adjoint past
                     # DENSE_DOF_LIMIT); see _run_shell_identification
               | {"type": "sizing", ..}            # minimum-weight
                     # plating thickness under extreme-fiber vM /
                     # displacement limits (continuum_sizing.
                     # optimize_shell_thickness, t AND t³ traced)
               | {"type": "reliability", ..}}      # FORM on the
                     # traced facet twin (continuum_reliability,
                     # family="shell"; thickness variables carry the
                     # cubed-t sensitivity)

The obstacle-course geometries run through the `mesh` generators; the
corpus document dyn-shell.json is the Scordelis-Lo roof gated on the
measured 16×16 midside deflection (tests/test_shell.py pins the same
value against the published 0.3024 target).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..models.shell import (ShellProblem, cylinder_panel_mesh,
                            hemisphere_mesh, shell_modal,
                            solve_shell_static)


def is_shell_document(doc: Dict) -> bool:
    return isinstance(doc, dict) \
        and doc.get("element_type") == "shell"


def _resolve_nodes(nodes: np.ndarray, spec) -> np.ndarray:
    """Support-group node spec: an index list, or a named coordinate
    extreme "x_min" .. "z_max" resolved against the (generated)
    midsurface — the solid family's named-face convention."""
    if isinstance(spec, str):
        axis = {"x": 0, "y": 1, "z": 2}.get(spec[:1])
        if axis is None or spec[1:] not in ("_min", "_max"):
            raise ValueError(f'unknown shell node group {spec!r} '
                             '(use "x_min" .. "z_max" or indices)')
        coord = nodes[:, axis]
        ref = coord.min() if spec.endswith("_min") else coord.max()
        span = max(coord.max() - coord.min(), 1e-300)
        return np.flatnonzero(np.abs(coord - ref) < 1e-9 * span)
    return np.asarray(spec, dtype=int).reshape(-1)


def parse_shell_document(doc: Dict) -> Tuple[ShellProblem, Dict]:
    mesh = doc.get("mesh")
    if mesh is not None:
        kind = mesh.get("type")
        if kind == "cylinder_panel":
            nodes, elements = cylinder_panel_mesh(
                float(mesh["radius"]), float(mesh["length"]),
                float(mesh["half_angle_deg"]), int(mesh["nx"]),
                int(mesh["ny"]))
        elif kind == "hemisphere":
            nodes, elements = hemisphere_mesh(
                float(mesh["radius"]),
                float(mesh.get("hole_deg", 18.0)), int(mesh["n"]))
        elif kind == "arch_strip":
            from ..models.shell import arch_strip_mesh

            nodes, elements = arch_strip_mesh(
                float(mesh["length"]), float(mesh.get("width", 1.0)),
                float(mesh["rise"]), int(mesh["nx"]))
        else:
            raise ValueError('shell mesh.type must be '
                             '"cylinder_panel", "hemisphere" or '
                             '"arch_strip"')
    else:
        nodes = np.asarray(doc["nodes"], dtype=float)
        elements = np.asarray(doc["elements"], dtype=int)
    nnode = nodes.shape[0]
    mat = doc.get("material", {})
    if mat.get("thickness") is None:
        raise ValueError('shell material needs "thickness"')
    loads = np.asarray(doc.get("loads", np.zeros(6 * nnode)),
                       dtype=float)
    for row in doc.get("point_loads", ()):
        node, dof, value = row
        loads[6 * int(node) + int(dof)] += float(value)
    if "sine_load" in doc:
        # Downward half-sine line-load amplitude per unit projected
        # area on an arch_strip midsurface (trapezoid nodal pattern —
        # the load whose continuum snap-through path is the exact
        # single-mode cubic, solvers/shell_nonlinear.py).  Built
        # server-side so UI/corpus documents stay small and
        # float-exact.
        if mesh is None or mesh.get("type") != "arch_strip":
            raise ValueError('"sine_load" needs the arch_strip '
                             "generated mesh (x-fastest two-row "
                             "numbering)")
        amp = float(doc["sine_load"])
        nx = int(mesh["nx"])
        length = float(mesh["length"])
        width = float(mesh.get("width", 1.0))
        xs = np.linspace(0.0, length, nx + 1)
        h = length / nx
        for i, x in enumerate(xs):
            wt = h if 0 < i < nx else h / 2.0
            val = -amp * np.sin(np.pi * x / length) * wt * (width / 2)
            for row_off in (0, nx + 1):
                loads[6 * (i + row_off) + 2] += val
    fixed = []
    if "fixed_dofs" in doc:
        fixed.append(np.asarray(doc["fixed_dofs"],
                                dtype=int).reshape(-1))
    if "fixed_nodes" in doc:
        fn = np.asarray(doc["fixed_nodes"], dtype=int).reshape(-1)
        fixed.append((6 * fn[:, None]
                      + np.arange(6)[None, :]).reshape(-1))
    for grp in doc.get("supports", ()):
        gn = _resolve_nodes(nodes, grp["nodes"])
        gd = np.asarray(grp["dofs"], dtype=int).reshape(-1)
        if gd.size and (gd.min() < 0 or gd.max() > 5):
            raise ValueError("supports dofs index 0..5 per node")
        fixed.append((6 * gn[:, None] + gd[None, :]).reshape(-1))
    if not fixed:
        raise ValueError('shell document needs "fixed_nodes", '
                         '"fixed_dofs" or "supports"')
    fixed = np.unique(np.concatenate(fixed))
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
    problem = ShellProblem(
        nodes=nodes, elements=elements,
        young=np.asarray(mat.get("young", 1.0), dtype=float),
        poisson=np.asarray(mat.get("poisson", 0.3), dtype=float),
        thickness=np.asarray(mat["thickness"], dtype=float),
        density=np.asarray(mat.get("density", 1.0), dtype=float),
        loads=loads, fixed_dofs=fixed,
        pressure=(None if doc.get("pressure") is None
                  else np.asarray(doc["pressure"], dtype=float)),
        body_force=(None if doc.get("body_force") is None
                    else np.asarray(doc["body_force"], dtype=float)),
        point_masses=pm,
        alpha_cte=(None if mat.get("alpha") is None
                   else np.asarray(mat["alpha"], dtype=float)),
        temperature=(None if doc.get("temperature") is None
                     else np.asarray(doc["temperature"],
                                     dtype=float)),
        temperature_gradient=(
            None if doc.get("temperature_gradient") is None
            else np.asarray(doc["temperature_gradient"],
                            dtype=float)))
    return problem, (doc.get("analysis") or {"type": "static"})


def run_shell_analysis(problem: ShellProblem, analysis: Dict) -> Dict:
    kind = analysis.get("type", "static")
    if kind == "shell":
        # Route-injected type (the Node /api/fem convention).
        kind = "static"
    from ..solvers.newton import DENSE_DOF_LIMIT

    large = problem.ndof > DENSE_DOF_LIMIT
    if kind == "static":
        if large:
            # Device tier: banded DIA + PCG (models/shell.py) with
            # probe + summary payloads (the frame3d convention).
            from ..models.shell import solve_shell_static_banded

            res, iterations, residual = solve_shell_static_banded(
                problem,
                tol=float(analysis.get("tolerance", 1e-7)),
                max_iter=int(analysis.get("max_iterations", 40000)),
                use_pallas=bool(analysis.get("use_pallas", False)),
                precond=analysis.get("precond", "auto"))
            u = res.displacements
            i_max = int(np.argmax(np.abs(u)))
            out = {
                "success": True,
                "analysis": "static",
                "element_type": "shell",
                "tier": "banded",
                "iterations": int(iterations),
                "relative_residual": float(residual),
                "max_displacement": float(np.abs(u[i_max])),
                "max_displacement_dof": i_max,
                "max_abs_membrane_force": float(
                    np.abs(res.membrane_forces).max()),
                "max_abs_moment": float(np.abs(res.moments).max()),
            }
            probe = analysis.get("probe_dofs")
            if probe is None \
                    and analysis.get("probe_nodes") is not None:
                probe = _probe6(analysis, problem)
            if probe is not None:
                probe = np.asarray(probe, dtype=int).reshape(-1)
                out["probe_dofs"] = probe.tolist()
                out["probe_displacements"] = u[probe].tolist()
            return out
        res = solve_shell_static(problem)
        u = res.displacements
        i_max = int(np.argmax(np.abs(u)))
        out = {
            "success": True,
            "analysis": "static",
            "element_type": "shell",
            "max_displacement": float(np.abs(u[i_max])),
            "max_displacement_dof": i_max,
            "membrane_forces": res.membrane_forces.tolist(),
            "moments": res.moments.tolist(),
        }
        probe = analysis.get("probe_dofs")
        if probe is None and analysis.get("probe_nodes") is not None:
            pn = np.asarray(analysis["probe_nodes"],
                            dtype=int).reshape(-1)
            probe = (6 * pn[:, None] + np.arange(6)[None, :]) \
                .reshape(-1)
        if probe is not None:
            probe = np.asarray(probe, dtype=int).reshape(-1)
            out["probe_dofs"] = probe.tolist()
            out["probe_displacements"] = u[probe].tolist()
        if problem.ndof <= 6 * 600:
            out["displacements"] = u.tolist()
            out["reactions"] = res.reactions.tolist()
        return out
    if kind == "buckling":
        if large:
            raise ValueError(
                f"shell buckling is dense-host-only ({problem.ndof} "
                f"DOFs > {DENSE_DOF_LIMIT}): the thin-shell "
                "eigen-pencil sits below the f32 floor of the banded "
                "device tier (the shell-modal rationale, "
                "models/shell.py); reduce the mesh")
        from ..models.shell import shell_buckling

        res = shell_buckling(
            problem,
            membrane_force=analysis.get("membrane_force"),
            n_modes=int(analysis.get("n_modes", 4)))
        out = {
            "success": True,
            "analysis": "buckling",
            "element_type": "shell",
            "load_factors": res.load_factors.tolist(),
            "max_abs_membrane_force": float(
                np.abs(res.membrane_forces).max()),
        }
        if analysis.get("include_shapes", True) \
                and problem.ndof <= 6 * 600:
            out["buckling_modes"] = res.modes.tolist()
        return out
    if kind == "modal":
        if large:
            # Honest refusal (not a silent wrong answer): the
            # thin-shell pencil sits below the f32 eigen floor on the
            # banded device tier — measured 3-10% Ritz noise
            # (models/shell.py, the no-banded-modal rationale).
            raise ValueError(
                f"shell modal is dense-host-only ({problem.ndof} "
                f"DOFs > {DENSE_DOF_LIMIT}): the thin-shell pencil's "
                "lambda_1/lambda_max ~ 3e-7 sits below the f32 "
                "eigen-pencil floor of the banded device tier "
                "(measured 3-10% Ritz noise); reduce the mesh or "
                "condense a substructure")
        res = shell_modal(problem,
                          n_modes=int(analysis.get("n_modes", 6)))
        out = {
            "success": True,
            "analysis": "modal",
            "element_type": "shell",
            "n_modes": int(res.frequencies_hz.size),
            "frequencies_hz": res.frequencies_hz.tolist(),
            "omegas": res.omegas.tolist(),
            "eigenvalues": res.eigenvalues.tolist(),
        }
        if problem.ndof <= 6 * 600:
            out["mode_shapes"] = res.mode_shapes.tolist()
        return out
    if kind == "nonlinear":
        # Load-controlled von Kármán / Marguerre statics
        # (solvers/shell_nonlinear.py): membrane stiffening and
        # bifurcation on flat/shallow midsurfaces; fails AT a limit
        # point by construction — snap-through runs under
        # "continuation".  Above DENSE_DOF_LIMIT (or "banded": true)
        # the banded DIA device tier serves with its measured f32
        # residual floor as the default tolerance.
        kwargs = dict(
            max_iter=int(analysis.get("max_iterations", 40)),
        )
        if "load_factors" in analysis:
            kwargs["load_factors"] = np.asarray(
                analysis["load_factors"], dtype=float)
        else:
            kwargs["target_load_factor"] = float(
                analysis.get("target", 1.0))
            kwargs["n_steps"] = int(analysis.get("n_steps", 10))
        banded = analysis.get("banded")
        if banded is None:
            banded = large
        if banded:
            from ..solvers.shell_nonlinear import \
                solve_shell_nonlinear_banded

            res = solve_shell_nonlinear_banded(
                problem,
                tol=float(analysis.get("tolerance", 5e-4)),
                cg_tol=float(analysis.get("cg_tolerance", 1e-6)),
                **kwargs)
        else:
            from ..solvers.shell_nonlinear import \
                solve_shell_nonlinear

            res = solve_shell_nonlinear(
                problem,
                tol=float(analysis.get("tolerance", 1e-9)),
                **kwargs)
        probe = _probe6(analysis, problem)
        explicit_probe = ("probe_dofs" in analysis
                          or "probe_nodes" in analysis)
        out = {
            "success": bool(res.converged),
            "analysis": "nonlinear",
            "element_type": "shell",
            "tier": "banded" if banded else "dense",
            "n_steps": int(res.load_factors.size),
            "load_factors": res.load_factors.tolist(),
            "iterations": res.iterations.tolist(),
            "max_residual": float(res.residuals.max()),
            "max_displacement": float(
                np.abs(res.displacements[-1]).max()),
            "max_abs_membrane_force": float(
                np.abs(res.membrane_forces[-1]).max()),
            "max_abs_moment": float(np.abs(res.moments[-1]).max()),
        }
        if explicit_probe or problem.ndof <= 6 * 600:
            out["probe_dofs"] = probe.tolist()
            out["displacements"] = \
                res.displacements[:, probe].tolist()
        if problem.ndof <= 6 * 600:
            out["final"] = {
                "membrane_forces": res.membrane_forces[-1].tolist(),
                "moments": res.moments[-1].tolist(),
                "displacements": res.displacements[-1].tolist(),
            }
        return out
    if kind == "continuation":
        # Arc-length (Riks) continuation on the Marguerre assembly —
        # the truss family's "continuation" contract
        # (io/analysis.py:run_continuation) carried to shallow
        # shells: snap-through of arches and panels traced THROUGH
        # limit points.
        from ..solvers.shell_nonlinear import solve_shell_riks

        res = solve_shell_riks(
            problem,
            n_steps=int(analysis.get("n_steps", 60)),
            dl0=float(analysis.get("dl0",
                                   analysis.get("initial_dlambda",
                                                0.05))),
            tol=float(analysis.get("tolerance", 1e-8)),
            max_arc_iter=int(analysis.get("max_iterations", 25)),
            max_dl=(float(analysis["max_dl"])
                    if "max_dl" in analysis else None))
        probe = _probe6(analysis, problem)
        return {
            "success": bool(res.converged),
            "analysis": "continuation",
            "element_type": "shell",
            "n_points": int(res.load_factors.size),
            "load_factors": res.load_factors.tolist(),
            "probe_dofs": probe.tolist(),
            "displacements": res.displacements[:, probe].tolist(),
            "iterations": res.iterations.tolist(),
            "max_residual": float(res.residuals.max())
            if res.residuals.size else None,
        }
    if kind == "plastic":
        # Layered through-thickness J2 with MEMBRANE + BENDING
        # kinematics (solvers/shell_plasticity.py): the plate
        # family's plastic block plus the membrane coupling — the
        # N-M interaction family (ops/shell_plastic.py).
        from ..solvers.shell_plasticity import solve_shell_plastic

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
        res = solve_shell_plastic(problem, **kwargs)
        probe = _probe6(analysis, problem)
        yielded = np.flatnonzero(res.eq_plastic[-1] > 0.0)
        out = {
            "success": bool(res.converged),
            "analysis": "plastic",
            "element_type": "shell",
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
                "membrane_forces": res.membrane_forces[-1].tolist(),
                "moments": res.moments[-1].tolist(),
                "von_mises": res.von_mises[-1].tolist(),
                "eq_plastic_strain": res.eq_plastic[-1].tolist(),
                "displacements": res.displacements[-1].tolist(),
            },
        }
        if analysis.get("include_history"):
            out["membrane_forces"] = res.membrane_forces.tolist()
            out["moments"] = res.moments.tolist()
            out["von_mises"] = res.von_mises.tolist()
        return out
    if kind == "transient":
        from ..models.shell import solve_shell_transient

        dt = float(analysis["dt"])
        n_steps = int(analysis["n_steps"])
        damping = analysis.get("damping", [0.0, 0.0])
        amp = analysis.get("amplitude")
        if isinstance(amp, dict):
            if amp.get("type") != "step":
                raise ValueError('shell amplitude dict supports '
                                 '{"type": "step"}; give an explicit '
                                 'array otherwise')
            amp = None
        probe = _probe6(analysis, problem)
        res = solve_shell_transient(
            problem, dt, n_steps,
            damping=(float(damping[0]), float(damping[1])),
            amplitude=amp, probe_dofs=probe,
            record_every=int(analysis.get("record_every", 1)))
        return {
            "success": True,
            "analysis": "transient",
            "element_type": "shell",
            "dt": res.dt,
            "n_steps": res.n_steps,
            "times": res.times.tolist(),
            "probe_dofs": probe.tolist(),
            "displacements": res.displacements.tolist(),
        }
    if kind == "harmonic":
        from ..models.shell import shell_harmonic

        om = analysis["omegas"]
        if isinstance(om, dict):
            om = np.linspace(float(om["start"]), float(om["stop"]),
                             int(om["num"]))
        om = np.asarray(om, dtype=float).reshape(-1)
        damping = analysis.get("damping", [0.0, 0.0])
        probe = _probe6(analysis, problem)
        res = shell_harmonic(
            problem, om,
            damping=(float(damping[0]), float(damping[1])),
            probe_dofs=probe)
        return {
            "success": True,
            "analysis": "harmonic",
            "element_type": "shell",
            "omegas": res.omegas.tolist(),
            "probe_dofs": probe.tolist(),
            "amplitude": res.amplitude.tolist(),
            "real": res.real.tolist(),
            "imag": res.imag.tolist(),
        }
    if kind == "spectrum":
        from ._common import run_continuum_spectrum

        return run_continuum_spectrum(problem, analysis, "shell")
    if kind == "random":
        from ._common import run_continuum_random

        probe = analysis.get("probe_dofs")
        if probe is None and analysis.get("probe_nodes") is not None:
            probe = _probe6(analysis, problem)
        return run_continuum_random(problem, analysis, "shell",
                                    probe)
    if kind == "reduction":
        from ._common import run_continuum_reduction

        return run_continuum_reduction(problem, analysis, "shell")
    if kind == "identification":
        return _run_shell_identification(problem, analysis)
    if kind == "sizing":
        # Minimum-weight plating-thickness field under extreme-fiber
        # stress and/or displacement limits (solvers/
        # continuum_sizing.optimize_shell_thickness — membrane t AND
        # bending t³ physics through the traced facet twin).
        if problem.ndof > 8192:
            raise ValueError(
                f"shell sizing runs dense traced solves per ADAM "
                f"iteration; {problem.ndof} DOFs exceeds its "
                "8192-DOF budget — coarsen the midsurface")
        from ..solvers.continuum_sizing import (
            optimize_shell_thickness)

        if analysis.get("stress_limit") is None \
                and analysis.get("displacement_limit") is None:
            raise ValueError('shell sizing needs "stress_limit" '
                             'and/or "displacement_limit"')
        probe = analysis.get("probe_dofs")
        if probe is None and analysis.get("probe_nodes") is not None:
            probe = _probe6(analysis, problem).tolist()
        sl = analysis.get("stress_limit")
        dl = analysis.get("displacement_limit")
        t_e, weight, hist = optimize_shell_thickness(
            problem,
            stress_limit=None if sl is None else float(sl),
            displacement_limit=None if dl is None else float(dl),
            probe_dofs=probe,
            min_thickness=float(analysis.get("min_thickness", 1e-6)),
            n_iter=int(analysis.get("n_iter", 300)),
            outer_rounds=int(analysis.get("outer_rounds", 4)),
            learning_rate=float(analysis.get("learning_rate", 0.05)))
        out = {
            "success": True,
            "analysis": "sizing",
            "element_type": "shell",
            "thickness": t_e.tolist(),
            "weight": weight,
            "history": hist.tolist(),
        }
        if sl is not None:
            out["stress_limit"] = float(sl)
        if dl is not None:
            out["displacement_limit"] = float(dl)
        return out
    if kind == "reliability":
        if problem.ndof > 8192:
            raise ValueError(
                f"shell reliability runs dense traced solves per "
                f"HL-RF iteration; {problem.ndof} DOFs exceeds its "
                "8192-DOF budget — coarsen the midsurface")
        from ._common import run_continuum_reliability

        return run_continuum_reliability(problem, analysis, "shell")
    raise ValueError('shell analysis type must be "static", "modal", '
                     '"buckling", "transient", "harmonic", '
                     '"spectrum", "random", "reduction", "plastic", '
                     '"nonlinear", "continuation", '
                     '"identification", "sizing" or "reliability"')


def _probe6(analysis: Dict, problem: ShellProblem) -> np.ndarray:
    if "probe_dofs" in analysis:
        return np.asarray(analysis["probe_dofs"],
                          dtype=int).reshape(-1)
    if "probe_nodes" in analysis:
        pn = np.asarray(analysis["probe_nodes"],
                        dtype=int).reshape(-1)
        return (6 * pn[:, None] + np.arange(6)[None, :]).reshape(-1)
    return np.arange(problem.ndof)


def run_shell_document(doc: Dict) -> Dict:
    problem, analysis = parse_shell_document(doc)
    return run_shell_analysis(problem, analysis)


def _resolve_zones_shell(problem: ShellProblem, zones):
    """Zone specs -> facet-id arrays: explicit id lists or a 3D
    centroid bounding box {"x_min".."z_max"} (any subset) — the
    plane family's damage-region contract lifted to midsurfaces."""
    cent = problem.nodes[problem.elements].mean(axis=1)
    keys = ("x_min", "x_max", "y_min", "y_max", "z_min", "z_max")
    out = []
    for z in zones:
        if isinstance(z, dict):
            unknown = set(z) - set(keys)
            if unknown:
                raise ValueError(f"unknown zone keys: "
                                 f"{sorted(unknown)}")
            sel = np.ones(problem.nelm, dtype=bool)
            for ax, name in enumerate(("x", "y", "z")):
                if f"{name}_min" in z:
                    sel &= cent[:, ax] >= float(z[f"{name}_min"])
                if f"{name}_max" in z:
                    sel &= cent[:, ax] <= float(z[f"{name}_max"])
            out.append(np.flatnonzero(sel))
        else:
            out.append(np.asarray(z, dtype=int).reshape(-1))
        if out[-1].size == 0:
            raise ValueError(f"zone {len(out) - 1} selects no "
                             f"facets")
    return out


def _run_shell_identification(problem: ShellProblem,
                              analysis: Dict) -> Dict:
    """Young's-modulus identification from measured shell
    displacements — the plane/plate JSON contract on curved
    midsurfaces: "measured_dofs" + "measured_u" (or "synthetic" twin
    data with "zone_young"/"young"), "zones" 3D-bbox/id lists,
    "field" MLP, banded adjoint past DENSE_DOF_LIMIT (or whenever
    zones are given).  E at KNOWN thickness (the identifiability
    note in models/shell.identify_shell_young)."""
    from ..models.shell import (identify_shell_young,
                                identify_shell_young_banded,
                                solve_shell_static)
    from ..solvers.newton import DENSE_DOF_LIMIT

    zones = analysis.get("zones")
    if zones is not None:
        zones = _resolve_zones_shell(problem, zones)
    synthetic = analysis.get("synthetic")
    if synthetic is not None:
        if "measured_u" in analysis:
            raise ValueError('give "measured_u" or "synthetic", '
                             'not both')
        md = analysis.get("measured_dofs")
        if md is None:
            md = analysis.get("probe_nodes")
            if md is not None:
                md = _probe6({"probe_nodes": md}, problem).tolist()
        if md is None:
            raise ValueError('synthetic shell identification needs '
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
        p_true = ShellProblem(
            nodes=problem.nodes, elements=problem.elements,
            young=true_young, poisson=problem.poisson,
            thickness=problem.thickness, density=problem.density,
            loads=problem.loads, fixed_dofs=problem.fixed_dofs,
            pressure=problem.pressure,
            body_force=problem.body_force,
            point_masses=problem.point_masses)
        if problem.ndof > DENSE_DOF_LIMIT:
            from ..models.shell import solve_shell_static_banded

            r_true, _, _ = solve_shell_static_banded(
                p_true,
                tol=float(analysis.get("tolerance", 1e-7)) * 0.01)
        else:
            r_true = solve_shell_static(p_true)   # f64 host truth
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
    if ("measured_dofs" not in analysis
            or "measured_u" not in analysis):
        raise ValueError('shell identification needs "measured_dofs"'
                         ' and "measured_u" (or "synthetic" twin '
                         'data)')
    banded = analysis.get("banded")
    if banded is None:
        banded = problem.ndof > DENSE_DOF_LIMIT or zones is not None
    if banded:
        # Identification-family doctrine: the ADAM loop runs on the
        # LOCAL CPU tier unless "on_device": true opts in (per-step
        # attachment round trips dominate millisecond solves).
        from ._common import _local_cpu_ctx

        with _local_cpu_ctx(analysis):
            vals, hist, fld = identify_shell_young_banded(
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
        from ._common import _local_cpu_ctx

        with _local_cpu_ctx(analysis):
            vals, hist, fld = identify_shell_young(
                problem,
                analysis["measured_dofs"], analysis["measured_u"],
                n_iter=int(analysis.get("n_iter", 800)),
                learning_rate=float(analysis.get("learning_rate",
                                                 0.05)),
                field=bool(analysis.get("field", False)),
                seed=int(analysis.get("seed", 0)),
                hidden_layers=int(analysis.get("hidden_layers", 2)),
                neurons_per_layer=int(
                    analysis.get("neurons_per_layer", 16)))
    centroids = problem.nodes[problem.elements].mean(axis=1)
    out = {
        "success": True,
        "analysis": "identification",
        "element_type": "shell",
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
    from ._common import _json_finite

    return _json_finite(out)
