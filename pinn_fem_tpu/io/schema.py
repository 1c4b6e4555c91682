"""Problem-JSON parsing: the framework's public configuration contract.

Byte-level capability parity with the reference's canonical CLI parser
(/root/reference/FEM/python/examples/json/generic.py:145-444), covering all
input format variants:

  * nodes as coordinate lists (incl. true-1D [[x], ...] flattening,
    generic.py:155-164) or dicts with x/y + fixed/fixed_x/fixed_y
    (generic.py:167, 194-205);
  * elements as [[i, j], ...] or [{"nodes": [i, j]}, ...]
    (generic.py:176-183);
  * fixed_dofs directly, else derived from dict-node BC flags;
  * three measured-displacement formats (generic.py:319-362):
    {"global_dof", "measured_u"}, legacy {"nodes","ux","uy"}, and per-node
    measured_ux/measured_uy (nonzero entries only);
  * nn_config per property with hidden_layers/hiddenLayers and
    neurons_per_layer/neuronsPerLayer aliases (generic.py:234-312);
  * method precedence: solver_config.method > solver_type mapping
    (generic.py:384-397); pinn_config vs solver_config key precedence
    exactly as generic.py:399-428 (note learning rates prefer solver_config,
    everything else prefers pinn_config).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import numpy as np

from ..config import SolverConfig
from ..models.fields import Material, make_mlp_field, to_field
from ..models.problem import TrussProblem

_PROPERTY_DEFAULTS = {"young": 210e9, "area": 0.01, "density": 7850.0}


@dataclass
class ParsedProblem:
    problem: TrussProblem
    config: SolverConfig
    measured_disp: Optional[np.ndarray] = None
    measured_dofs: Optional[np.ndarray] = None
    meta: Dict = field(default_factory=dict)
    prescribed: Optional[np.ndarray] = None  # (ndof,) nonzero-Dirichlet
                                             # values (support settlement)


def _parse_nodes(nodes_list):
    """Returns (nodes array for TrussProblem, problem_dim, is_dict_format).

    Coordinate-list width sets the dimension (1, 2 or 3; true-1D [[x], ...]
    flattens as in the reference).  Dict nodes are 2D unless any carries a
    "z" key (a 3D extension beyond the reference's 2D-only dict format)."""
    if nodes_list and isinstance(nodes_list[0], list):
        arr = np.array(nodes_list, dtype=float)
        dim = arr.shape[1]
        if dim == 1:
            return arr.flatten(), 1, False
        return arr, dim, False
    three_d = any("z" in n for n in nodes_list)
    if three_d:
        nodes = np.array(
            [[n["x"], n["y"], n.get("z", 0.0)] for n in nodes_list], dtype=float
        )
        return nodes, 3, True
    nodes = np.array([[n["x"], n["y"]] for n in nodes_list], dtype=float)
    return nodes, 2, True


def _parse_elements(elements_data):
    if elements_data and isinstance(elements_data[0], list):
        return np.array(elements_data, dtype=int)
    return np.array([[e["nodes"][0], e["nodes"][1]] for e in elements_data], dtype=int)


def _parse_fixed_dofs(data, nodes_list, dim: int = 2):
    fixed = data.get("fixed_dofs", [])
    if fixed:
        return np.array(fixed, dtype=int)
    out = []
    if nodes_list and isinstance(nodes_list[0], dict):
        for i, node in enumerate(nodes_list):
            if node.get("fixed", False):
                out.extend(dim * i + c for c in range(dim))
            else:
                for c, axis in enumerate(("x", "y", "z")[:dim]):
                    if node.get(f"fixed_{axis}", False):
                        out.append(dim * i + c)
    return np.array(out, dtype=int)


def _parse_measured(data, nodes_list, dim: int = 2):
    dofs, values = [], []
    axes = ("x", "y", "z")[:dim]
    measured = data.get("measured_displacements", None)
    if measured:
        if "global_dof" in measured and "measured_u" in measured:
            dofs = list(measured["global_dof"])
            values = list(measured["measured_u"])
        else:
            m_nodes = measured.get("nodes", [])
            for idx, node_id in enumerate(m_nodes):
                for c, axis in enumerate(axes):
                    comp = measured.get(f"u{axis}", [])
                    if idx < len(comp):
                        dofs.append(dim * node_id + c)
                        values.append(comp[idx])
    else:
        for i, node in enumerate(nodes_list):
            if not isinstance(node, dict):
                continue
            for c, axis in enumerate(axes):
                v = node.get(f"measured_u{axis}", 0)
                if v != 0:
                    dofs.append(dim * i + c)
                    values.append(v)
    return np.array(dofs, dtype=int), np.array(values, dtype=float)


def _build_material(data, seed: int) -> Material:
    material_data = data.get("material", {})
    nn_config = data.get("nn_config", {})
    fields = {}
    for k, prop in enumerate(("young", "area", "density")):
        base = material_data.get(prop, _PROPERTY_DEFAULTS[prop])
        cfg = nn_config.get(prop, {})
        if cfg.get("enabled", False):
            input_dim = cfg.get("input_dim", 1)
            fields[prop] = make_mlp_field(
                jax.random.PRNGKey(seed * 1000 + k),
                hidden_layers=cfg.get("hidden_layers", cfg.get("hiddenLayers", 2)),
                neurons_per_layer=cfg.get(
                    "neurons_per_layer", cfg.get("neuronsPerLayer", 20)
                ),
                input_dim=input_dim,
                scale=base,
                enforce_positive=True,
            )
        else:
            fields[prop] = to_field(base)
    return Material(**fields)


def parse_problem_dict(data: Dict, seed: int = 0) -> ParsedProblem:
    nodes_list = data.get("nodes", [])
    nodes, problem_dim, _ = _parse_nodes(nodes_list)
    elements = _parse_elements(data.get("elements", []))
    fixed_dofs = _parse_fixed_dofs(data, nodes_list, problem_dim)

    n_nodes = len(nodes_list)
    n_dofs = n_nodes * problem_dim
    loads = np.array(data.get("loads", [0.0] * n_dofs), dtype=float)

    material = _build_material(data, seed)
    solver_type = data.get("solver_type", "auto")

    measured_disp = measured_dofs = None
    if solver_type.startswith("pinn"):
        mdofs, mvals = _parse_measured(data, nodes_list, problem_dim)
        measured_dofs, measured_disp = mdofs, mvals

    # Payload-mass extension: non-structural point masses for the
    # dynamics family (models/problem.py point_masses).  Two forms:
    #   "point_masses": [m_0, ..., m_{nnode-1}]      full per-node table
    #   "point_masses": [[node, m], [node, m], ...]  sparse pairs
    point_masses = None
    pm_spec = data.get("point_masses")
    if pm_spec is not None:
        arr = np.asarray(pm_spec, dtype=float)
        if arr.ndim == 2 and arr.shape[1] == 2:
            point_masses = np.zeros(n_nodes)
            idx = arr[:, 0]
            if np.any(idx != np.round(idx)) or np.any(idx < 0) \
                    or np.any(idx >= n_nodes):
                raise ValueError("point_masses pairs need valid node "
                                 "indices")
            np.add.at(point_masses, idx.astype(int), arr[:, 1])
        elif arr.ndim == 1:
            point_masses = arr
        else:
            raise ValueError("point_masses must be a per-node list or "
                             "[node, mass] pairs")

    problem = TrussProblem(
        nodes=nodes,
        elements=elements,
        material=material,
        loads=loads,
        fixed_dofs=fixed_dofs,
        dimension=problem_dim,
        point_masses=point_masses,
    )

    # Thermal loading extension: {"thermal": {"alpha": a, "delta_t": dT}}
    # (dT scalar, per-element or per-node) adds the equivalent nodal
    # forces E A alpha dT g (ops/thermal.py; exact for linear
    # kinematics) to the load vector at parse time.
    thermal = data.get("thermal")
    if thermal:
        if material.has_trainable_params:
            # f_th is baked into the load vector HERE, evaluated at the
            # material's current (random-init) field values — an inverse
            # solve would then identify against a stale thermal load
            # that never tracks the evolving E/A.  Refuse rather than
            # silently bias the identification.
            raise ValueError(
                "thermal loading with trainable (NN) material fields is "
                "not supported: the equivalent loads E A alpha dT would "
                "be frozen at the initial field values")
        import jax as _jax

        from ..ops.thermal import element_delta_t, thermal_loads

        tdata = problem.to_device()
        dt_e = element_delta_t(tdata, thermal["delta_t"], n_nodes)
        f_th = np.asarray(_jax.device_get(thermal_loads(
            tdata, material, thermal.get("alpha", 1.0), dt_e)))
        problem.loads = problem.loads + f_th

    # Support-settlement extension: nonzero prescribed displacements at
    # (or added to) fixed DOFs — {"prescribed_displacements":
    # {"dofs": [..], "values": [..]}}; served by the NR path
    # (solve_nr(prescribed_u=...), inhomogeneous Dirichlet).
    prescribed = None
    pd = data.get("prescribed_displacements")
    if pd:
        pdofs = np.asarray(pd["dofs"], dtype=int)
        pvals = np.asarray(pd["values"], dtype=float)
        if pdofs.shape != pvals.shape:
            raise ValueError("prescribed dofs/values length mismatch")
        prescribed = np.zeros(n_dofs)
        prescribed[pdofs] = pvals
        extra = np.setdiff1d(pdofs, problem.fixed_dofs)
        if extra.size:  # prescribing a DOF fixes it
            problem.fixed_dofs = np.sort(
                np.concatenate([problem.fixed_dofs, extra]))

    sc = data.get("solver_config", {})
    pc = data.get("pinn_config", {})

    explicit = sc.get("method", None)
    if explicit:
        method = explicit
    elif solver_type == "fem":
        method = "nr"
    elif solver_type in ("pinn-gd", "pinn"):
        method = "gd"
    elif solver_type == "pinn-hybrid":
        method = "hybrid"
    else:
        method = "auto"

    config = SolverConfig(
        max_iterations=pc.get("max_iterations", sc.get("max_iterations", 1000)),
        tolerance=pc.get("tolerance", sc.get("tolerance", 1e-6)),
        print_every=pc.get("print_every", 10),
        n_increments=sc.get("n_increments", 10),
        min_denominator=sc.get("min_denominator", 1e-10),
        learning_rate_u=sc.get("learning_rate_u", pc.get("learning_rate_u", 1e-7)),
        learning_rate_theta=sc.get(
            "learning_rate_theta", pc.get("learning_rate_theta", 1e-4)
        ),
        alpha_physics=pc.get("alpha_physics", 1.0),
        alpha_data=pc.get("alpha_data", 100.0),
        preconditioning=pc.get("preconditioning", sc.get("preconditioning", False)),
        method=method,
        seed=seed,
    )

    return ParsedProblem(
        problem=problem,
        config=config,
        measured_disp=measured_disp,
        measured_dofs=measured_dofs,
        prescribed=prescribed,
        meta={
            "solver_type": solver_type,
            "description": data.get("description", ""),
            # Dynamic-analysis extension (io/analysis.py); None for the
            # reference's statics-only problems.
            "analysis": data.get("analysis"),
            "thermal": thermal,
        },
    )


def parse_problem_file(path, seed: int = 0) -> ParsedProblem:
    import json

    with open(path, "r") as f:
        return parse_problem_dict(json.load(f), seed=seed)
