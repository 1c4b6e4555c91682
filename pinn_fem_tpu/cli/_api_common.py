"""Shared parsing/output helpers for the api_* process entry points.

These CLIs replicate the reference's Node-facing JSON protocols
(/root/reference/FEM/python/api_fem_solver.py, api_pinn_*.py): argv
[input.json, output.json], dict-format 2D nodes, element stress/strain from
deformed geometry, and {error, type} + exit 1 on failure.
"""

from __future__ import annotations

import json
import sys
from typing import Dict, Tuple

import numpy as np

from ..models.fields import Material, to_field
from ..models.problem import TrussProblem


def parse_nodes_2d(input_data: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """Dict-format nodes -> (coords (n,2), fixed_dofs).

    Preserves the reference's elif quirk: a node with BOTH fixed_x and
    fixed_y (but not "fixed") only locks x (api_fem_solver.py:46-55).
    """
    nodes = np.array([[n["x"], n["y"]] for n in input_data["nodes"]], dtype=float)
    fixed = []
    for i, node in enumerate(input_data["nodes"]):
        if node.get("fixed", False):
            fixed.extend([2 * i, 2 * i + 1])
        elif node.get("fixed_x", False):
            fixed.append(2 * i)
        elif node.get("fixed_y", False):
            fixed.append(2 * i + 1)
    return nodes, np.array(fixed, dtype=int)


def parse_elements_obj(input_data: Dict) -> np.ndarray:
    return np.array(
        [[e["nodes"][0], e["nodes"][1]] for e in input_data["elements"]], dtype=int
    )


def build_problem_2d(input_data: Dict, young: float, area: float,
                     density: float = 7850.0) -> TrussProblem:
    nodes, fixed_dofs = parse_nodes_2d(input_data)
    elements = parse_elements_obj(input_data)
    loads = np.array(
        input_data.get("loads", [0.0] * (2 * len(nodes))), dtype=float
    )
    material = Material(
        young=to_field(young), area=to_field(area), density=to_field(density)
    )
    return TrussProblem(nodes, elements, material, loads, fixed_dofs, dimension=2)


def element_stresses_2d(nodes: np.ndarray, elements: np.ndarray,
                        u_flat: np.ndarray, young: float):
    """Engineering strain/stress from deformed geometry
    (api_fem_solver.py:78-118): eps = (L - L0)/L0, sigma = E * eps."""
    stresses, strains = [], []
    for i, j in elements:
        xi, yi = nodes[i]
        xj, yj = nodes[j]
        ui = u_flat[2 * i:2 * i + 2]
        uj = u_flat[2 * j:2 * j + 2]
        l0 = float(np.hypot(xj - xi, yj - yi))
        l_def = float(np.hypot((xj + uj[0]) - (xi + ui[0]),
                               (yj + uj[1]) - (yi + ui[1])))
        eps = (l_def - l0) / l0
        strains.append(float(eps))
        stresses.append(float(young * eps))
    return stresses, strains


def api_main(parse_and_solve, argv=None, usage: str = "") -> int:
    """argv protocol + error-JSON contract shared by the api_* scripts."""
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(usage)
        return 1
    input_file, output_file = argv
    print(f"Reading input from {input_file}")
    try:
        with open(input_file, "r") as f:
            input_data = json.load(f)
        output = parse_and_solve(input_data)
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        print(f"[OK] Results written to {output_file}")
        return 0
    except Exception as e:
        with open(output_file, "w") as f:
            json.dump({"error": str(e), "type": type(e).__name__}, f, indent=2)
        print(f"[ERROR] {e}")
        import traceback

        traceback.print_exc()
        return 1
