"""Result serialization and identified-property extraction.

Output-contract parity with the reference CLI
(/root/reference/FEM/python/examples/json/generic.py):

  * solve output dict {success, converged, iterations=len(history),
    displacements, reactions, history, nn_parameters?,
    identified_properties?} (generic.py:476-495) — note `iterations` is
    len(history), NOT the summed NR iteration count (a reference quirk the
    contract preserves; SURVEY §7.4);
  * identified_properties evaluates every NN field at the nodes and element
    centroids; when input_dim > problem dimension the field is
    load-factor-aware and is evaluated at load factors [0.2, 0.5, 1.0]
    under "load_factor_variations" (generic.py:498-799).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..config import SolverResult
from ..models.fields import (
    MLPField,
    ScalarField,
    point_inputs_dict_order,
    point_inputs_direct,
)
from ..models.problem import TrussProblem

_LOAD_FACTORS = (0.2, 0.5, 1.0)


def _eval_field_values(field: MLPField, x) -> List[float]:
    return [float(v) for v in np.asarray(field.eval_batch(x))]


def _coords_tolist(coords: np.ndarray, dimension: int):
    if dimension == 1:
        return [float(c) for c in np.asarray(coords).reshape(-1)]
    return np.asarray(coords).tolist()


def extract_identified_properties(
    problem: TrussProblem, load_factors=None
) -> Dict:
    load_factors = load_factors or _LOAD_FACTORS
    dim = problem.dimension
    node_coords = problem.node_coords_2d                        # (nnode, dim)
    centroids = problem.element_midpoints()                     # (nelm, dim)

    props: Dict = {}
    for name in ("young", "area", "density"):
        field = getattr(problem.material, name)
        if isinstance(field, ScalarField):
            props[name] = {"value": field.eval_scalar(), "type": "scalar"}
            continue

        if field.input_dim > dim:
            # Load-factor-aware: dict-order inputs (load_factor, x[, y]).
            variations = {}
            for lf in load_factors:
                xn = point_inputs_dict_order(node_coords, dim, lf)
                xe = point_inputs_dict_order(centroids, dim, lf)
                variations[f"load_factor_{lf:.1f}"] = {
                    "at_nodes": {
                        "coords": _coords_tolist(
                            problem.nodes if dim == 1 else node_coords, dim
                        ),
                        "values": _eval_field_values(field, xn),
                    },
                    "at_elements": {
                        "centroids": _coords_tolist(centroids, dim),
                        "values": _eval_field_values(field, xe),
                    },
                }
            props[name] = {
                "load_factor_variations": variations,
                "type": "nn_load_dependent",
                "input_dim": field.input_dim,
            }
        else:
            # Spatial-only: direct coordinate inputs, zero-padded.
            xn = point_inputs_direct(node_coords, field.input_dim)
            xe = point_inputs_direct(centroids, field.input_dim)
            props[name] = {
                "at_nodes": {
                    "coords": _coords_tolist(
                        problem.nodes if dim == 1 else node_coords, dim
                    ),
                    "values": _eval_field_values(field, xn),
                },
                "at_elements": {
                    "centroids": _coords_tolist(centroids, dim),
                    "values": _eval_field_values(field, xe),
                },
                "type": "nn",
                "input_dim": field.input_dim,
            }
    return props


def result_to_output_dict(
    result: SolverResult, problem: Optional[TrussProblem] = None
) -> Dict:
    output = {
        "success": result.converged,
        "converged": result.converged,
        "iterations": len(result.history),
        "displacements": np.asarray(result.displacements).flatten().tolist(),
        "reactions": (
            np.asarray(result.reactions).flatten().tolist()
            if result.reactions is not None
            else []
        ),
        "history": result.history,
    }
    if result.nn_parameters:
        output["nn_parameters"] = {
            k: np.asarray(v).tolist() for k, v in result.nn_parameters.items()
        }
        if problem is not None:
            output["identified_properties"] = extract_identified_properties(problem)
    return output
