"""JSON tier for the 3D space-frame family (models/frame3d.py).

A space-frame document is self-describing via
`"element_type": "frame3d"` — six DOFs per node change every array
contract, so the CLI and servers PEEK at that key and route here
(the frame/plane/solid/plate routing convention):

    {"element_type": "frame3d",
     "nodes": [[x, y, z], ..],
     "elements": [[i, j], ..],
     "material": {"young": E,
                  "shear_modulus": G | "poisson": nu,  # G = E/2(1+nu)
                  "area": A,
                  "inertia_y": Iy,        # bending in local x-z
                  "inertia_z": Iz,        # bending in local x-y
                  "torsion": J,           # St-Venant constant
                  "polar_inertia": Ip,    # optional (default J)
                  "density": rho,         # scalars or per-element
                  "alpha": a},            # CTE (thermal load case)
     "loads": [Fx0, Fy0, Fz0, Mx0, My0, Mz0, Fx1, ..],  # 6 per node
     "fixed_nodes": [..]                  # fully clamped nodes
       | "fixed_dofs": [..],              # or raw 6n-DOF indices
     "point_masses": [[node, m], ..] | [..per node..],
     "member_loads": [[elem, wx, wy, wz], ..]  # uniform distributed
       | [[wx, wy, wz] per element],           # loads, GLOBAL axes
     "temperature": dT | [..per element..],    # uniform member ΔT
     "temperature_gradient_y": g | [..],       # dT/dy' (local) —
     "temperature_gradient_z": g | [..],       # dT/dz'; all three
         # need material alpha, STATIC analyses only (dynamics
         # refuse; buckling inherits ΔT through its static state)
     "ref_vectors": [[elem, ax, ay, az], ..],  # optional local x-y
         # plane vectors (webs of inclined members); unlisted members
         # keep the global-Z / vertical-fallback convention
     "analysis": {"type": "static"}       # default
               | {"type": "modal", "n_modes": 6}
               | {"type": "transient", "dt": 0.01, "n_steps": 500,
                  "damping": [a, b], "probe_nodes": [..] |
                  "probe_dofs": [..],
                  "amplitude": {"type": "step"} | [..],
                  "record_every": 1}
               | {"type": "harmonic", "omegas": [..] |
                  {"start": w0, "stop": w1, "num": n},
                  "damping": [a, b], "probe_nodes": [..] |
                  "probe_dofs": [..]}
               | {"type": "buckling", "n_modes": 2}
                     # linearized P-Δ buckling, FLEXURAL modes in both
                     # bending planes (models/frame3d._kg_local3d —
                     # torsional/Wagner buckling out of scope)
               | {"type": "spectrum", "sa": 2.5 | {..},
                  "direction": [x, y, z], "n_modes": 6,
                  "combination": "srss" | "cqc",
                  "damping_ratio": 0.05}
                     # seismic modal combination on the 6-DOF pencil
                     # (solvers/continuum_spectrum; member end forces
                     # combined per quantity, governing |N|/A stress)
               | {"type": "random", "omegas": [..] | {..},
                  "psd": S0 | {..}, "damping": [a, b],
                  "probe_nodes": [..]}
               | {"type": "reduction", "method": "guyan" |
                  "craig_bampton", "master_nodes": [..],
                  "n_modes": 4}}

Outputs mirror the 2D frame family's result shapes; the static block
adds torque and both end-moment planes (the actions only this family
carries).  Above DENSE_DOF_LIMIT, static and modal ride the banded
DIA device tier (models/frame3d.solve_space_frame_static_banded /
space_frame_modal_banded — 12×12 T'KT blocks on the MXU, Jacobi-PCG,
HRZ-lumped subspace modal) with probe + summary payloads instead of
full fields; both carry an optional `mesh=` tp-sharded multi-chip
path proven in the dryrun (__graft_entry__.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..models.frame3d import (SpaceFrameProblem, solve_space_frame_static,
                              solve_space_frame_transient,
                              space_frame_harmonic, space_frame_modal)


def is_frame3d_document(doc: Dict) -> bool:
    return isinstance(doc, dict) \
        and doc.get("element_type") == "frame3d"


def parse_frame3d_document(doc: Dict
                           ) -> Tuple[SpaceFrameProblem, Dict]:
    nodes = np.asarray(doc["nodes"], dtype=float)
    elements = np.asarray(doc["elements"], dtype=int)
    mat = doc.get("material", {})
    for key in ("inertia_y", "inertia_z", "torsion"):
        if mat.get(key) is None:
            raise ValueError(f'space-frame material needs "{key}"')
    nnode = nodes.shape[0]
    nelm = elements.shape[0]
    loads = np.asarray(doc.get("loads", np.zeros(6 * nnode)),
                       dtype=float)
    if "fixed_dofs" in doc:
        fixed = np.asarray(doc["fixed_dofs"], dtype=int)
    elif "fixed_nodes" in doc:
        fn = np.asarray(doc["fixed_nodes"], dtype=int).reshape(-1)
        fixed = (6 * fn[:, None] + np.arange(6)).reshape(-1)
    else:
        raise ValueError('space-frame document needs "fixed_nodes" '
                         'or "fixed_dofs"')
    pm = doc.get("point_masses")
    if pm is not None:
        arr = np.asarray(pm, dtype=float)
        if arr.ndim == 2:                      # [[node, mass], ...]
            full = np.zeros(nnode)
            for node, mass in arr:
                full[int(node)] += float(mass)
            pm = full
        else:
            pm = arr
    ml = doc.get("member_loads")
    if ml is not None:
        arr = np.asarray(ml, dtype=float)
        if arr.ndim != 2:
            raise ValueError("member_loads must be a table")
        if arr.shape[1] == 4:              # [[elem, wx, wy, wz], ...]
            full = np.zeros((nelm, 3))
            for e, wx, wy, wz in arr:
                full[int(e)] += (wx, wy, wz)
            ml = full
        elif arr.shape[1] == 3:
            ml = arr
        else:
            raise ValueError("member_loads rows must be "
                             "[elem, wx, wy, wz] or [wx, wy, wz]")
    rv = doc.get("ref_vectors")
    if rv is not None:
        arr = np.asarray(rv, dtype=float)
        if arr.ndim != 2 or arr.shape[1] != 4:
            raise ValueError("ref_vectors rows must be "
                             "[elem, ax, ay, az]")
        full = np.zeros((nelm, 3))             # zero row = default
        for row in arr:
            full[int(row[0])] = row[1:]
        rv = full
    problem = SpaceFrameProblem(
        nodes=nodes, elements=elements,
        young=np.asarray(mat.get("young", 1.0), dtype=float),
        area=np.asarray(mat.get("area", 1.0), dtype=float),
        inertia_y=np.asarray(mat["inertia_y"], dtype=float),
        inertia_z=np.asarray(mat["inertia_z"], dtype=float),
        torsion_j=np.asarray(mat["torsion"], dtype=float),
        density=np.asarray(mat.get("density", 1.0), dtype=float),
        loads=loads, fixed_dofs=fixed,
        shear_modulus=(None if mat.get("shear_modulus") is None
                       else np.asarray(mat["shear_modulus"],
                                       dtype=float)),
        poisson=(None if mat.get("poisson") is None
                 else float(mat["poisson"])),
        point_masses=pm, ref_vector=rv,
        polar_inertia=(None if mat.get("polar_inertia") is None
                       else np.asarray(mat["polar_inertia"],
                                       dtype=float)),
        member_loads=ml,
        alpha_cte=(None if mat.get("alpha") is None
                   else np.asarray(mat["alpha"], dtype=float)),
        temperature=(None if doc.get("temperature") is None
                     else np.asarray(doc["temperature"],
                                     dtype=float)),
        temperature_gradient_y=(
            None if doc.get("temperature_gradient_y") is None
            else np.asarray(doc["temperature_gradient_y"],
                            dtype=float)),
        temperature_gradient_z=(
            None if doc.get("temperature_gradient_z") is None
            else np.asarray(doc["temperature_gradient_z"],
                            dtype=float)))
    return problem, (doc.get("analysis") or {"type": "static"})


def _probe_dofs6(analysis: Dict, problem: SpaceFrameProblem):
    if "probe_dofs" in analysis:
        return np.asarray(analysis["probe_dofs"],
                          dtype=int).reshape(-1)
    if "probe_nodes" in analysis:
        pn = np.asarray(analysis["probe_nodes"],
                        dtype=int).reshape(-1)
        return (6 * pn[:, None] + np.arange(6)).reshape(-1)
    return np.arange(problem.ndof)


def run_frame3d_analysis(problem: SpaceFrameProblem,
                         analysis: Dict) -> Dict:
    kind = analysis.get("type", "static")
    if kind == "frame3d":
        # Route-injected type (the Node /api/fem convention) means
        # "statics".
        kind = "static"
    from ..solvers.newton import DENSE_DOF_LIMIT

    large = problem.ndof > DENSE_DOF_LIMIT
    if kind == "static":
        if large:
            # Device tier: banded DIA + PCG (models/frame3d.py) — the
            # dense O(n³) solve is intractable and so is a full-field
            # JSON payload; probes + member-force summaries instead
            # (the frame-family convention).
            from ..models.frame3d import solve_space_frame_static_banded

            res, iterations, residual = \
                solve_space_frame_static_banded(
                    problem,
                    tol=float(analysis.get("tolerance", 1e-7)),
                    max_iter=int(analysis.get("max_iterations",
                                              20000)),
                    use_pallas=bool(analysis.get("use_pallas", False)),
                    precond=analysis.get("precond", "auto"))
            u = res.displacements
            i_max = int(np.argmax(np.abs(u)))
            out = {
                "success": True,
                "analysis": "static",
                "element_type": "frame3d",
                "tier": "banded",
                "iterations": int(iterations),
                "relative_residual": float(residual),
                "max_abs_displacement": float(np.abs(u[i_max])),
                "max_abs_displacement_dof": i_max,
                "max_abs_axial": float(np.abs(res.axial).max()),
                "max_abs_torque": float(np.abs(res.torque).max()),
                "max_abs_moment": float(
                    max(np.abs(res.moments_y).max(),
                        np.abs(res.moments_z).max())),
            }
            probe = analysis.get("probe_dofs")
            if probe is None \
                    and analysis.get("probe_nodes") is not None:
                probe = _probe_dofs6(analysis, problem)
            if probe is not None:
                probe = np.asarray(probe, dtype=int).reshape(-1)
                out["probe_dofs"] = probe.tolist()
                out["displacements"] = u[probe].tolist()
            return out
        res = solve_space_frame_static(problem)
        u = res.displacements
        i_max = int(np.argmax(np.abs(u)))
        return {
            "success": True,
            "analysis": "static",
            "element_type": "frame3d",
            "displacements": u.tolist(),
            "member_end_forces": res.member_end_forces.tolist(),
            "axial_forces": res.axial.tolist(),
            "torques": res.torque.tolist(),
            "end_moments_y": res.moments_y.tolist(),
            "end_moments_z": res.moments_z.tolist(),
            "reactions": res.reactions.tolist(),
            "max_displacement": float(np.abs(u[i_max])),
            "max_displacement_dof": i_max,
        }
    if kind == "modal":
        if large:
            from ..models.frame3d import space_frame_modal_banded

            res = space_frame_modal_banded(
                problem, n_modes=int(analysis.get("n_modes", 4)),
                n_iter=int(analysis.get("n_iter", 30)),
                cg_tol=float(analysis.get("cg_tolerance", 1e-7)))
            out = {
                "success": True,
                "analysis": "modal",
                "element_type": "frame3d",
                "tier": "banded",
                "mass": "lumped",
                "frequencies_hz": res.frequencies_hz.tolist(),
                "omegas": res.omegas.tolist(),
                "eigenvalues": res.eigenvalues.tolist(),
            }
            pn = analysis.get("probe_nodes")
            if pn is not None:
                dofs = _probe_dofs6(analysis, problem)
                out["probe_nodes"] = np.asarray(
                    pn, dtype=int).reshape(-1).tolist()
                out["mode_shapes"] = res.mode_shapes[:, dofs].tolist()
            return out
        n_modes = int(analysis.get("n_modes", 6))
        res = space_frame_modal(problem, n_modes=n_modes)
        return {
            "success": True,
            "analysis": "modal",
            "element_type": "frame3d",
            "n_modes": int(res.frequencies_hz.size),
            "frequencies_hz": res.frequencies_hz.tolist(),
            "omegas": res.omegas.tolist(),
            "eigenvalues": res.eigenvalues.tolist(),
            "mode_shapes": res.mode_shapes.tolist(),
        }
    if kind == "transient":
        dt = float(analysis["dt"])
        n_steps = int(analysis["n_steps"])
        damping = analysis.get("damping", [0.0, 0.0])
        amp = analysis.get("amplitude")
        if isinstance(amp, dict):
            if amp.get("type") != "step":
                raise ValueError('space-frame amplitude dict supports '
                                 '{"type": "step"}; give an explicit '
                                 'array otherwise')
            amp = None                          # unit step IS default
        probe = _probe_dofs6(analysis, problem)
        res = solve_space_frame_transient(
            problem, dt, n_steps,
            damping=(float(damping[0]), float(damping[1])),
            amplitude=amp, probe_dofs=probe,
            record_every=int(analysis.get("record_every", 1)))
        return {
            "success": True,
            "analysis": "transient",
            "element_type": "frame3d",
            "dt": res.dt,
            "n_steps": res.n_steps,
            "times": res.times.tolist(),
            "probe_dofs": probe.tolist(),
            "displacements": res.displacements.tolist(),
        }
    if kind == "harmonic":
        om = analysis["omegas"]
        if isinstance(om, dict):
            om = np.linspace(float(om["start"]), float(om["stop"]),
                             int(om["num"]))
        om = np.asarray(om, dtype=float).reshape(-1)
        damping = analysis.get("damping", [0.0, 0.0])
        probe = _probe_dofs6(analysis, problem)
        res = space_frame_harmonic(
            problem, om,
            damping=(float(damping[0]), float(damping[1])),
            probe_dofs=probe)
        return {
            "success": True,
            "analysis": "harmonic",
            "element_type": "frame3d",
            "omegas": res.omegas.tolist(),
            "probe_dofs": probe.tolist(),
            "amplitude": res.amplitude.tolist(),
            "real": res.real.tolist(),
            "imag": res.imag.tolist(),
        }
    if kind == "buckling":
        from ..models.frame3d import space_frame_buckling

        res = space_frame_buckling(
            problem, n_modes=int(analysis.get("n_modes", 2)))
        return {
            "success": True,
            "analysis": "buckling",
            "element_type": "frame3d",
            "n_modes": int(res.load_factors.size),
            "load_factors": res.load_factors.tolist(),
            "axial_forces": res.axial.tolist(),
            "buckling_modes": res.modes.tolist(),
        }
    if kind == "spectrum":
        from ._common import run_continuum_spectrum

        return run_continuum_spectrum(problem, analysis, "frame3d")
    if kind == "random":
        from ._common import run_continuum_random

        probe = analysis.get("probe_dofs")
        if probe is None and analysis.get("probe_nodes") is not None:
            probe = _probe_dofs6(analysis, problem)
        return run_continuum_random(problem, analysis, "frame3d",
                                    probe)
    if kind == "reduction":
        from ._common import run_continuum_reduction

        return run_continuum_reduction(problem, analysis, "frame3d")
    raise ValueError('space-frame analysis type must be "static", '
                     '"modal", "transient", "harmonic", "buckling", '
                     '"spectrum", "random" or "reduction"')


def run_frame3d_document(doc: Dict) -> Dict:
    problem, analysis = parse_frame3d_document(doc)
    return run_frame3d_analysis(problem, analysis)
