"""PINN gradient-descent JSON API: scalar (E, A) identification.

    python -m pinn_fem_tpu.cli.api_pinn_gd input.json output.json

Implements the DOCUMENTED contract of the reference's broken
api_pinn_gradient_descent.py (its import at line 19 targets a function
that never existed; SURVEY §7.4): parse measured_disp/measured_dofs +
bounds/config (api_pinn_gradient_descent.py:53-71), identify scalar E and
A, output {displacements, stresses, strains, identified_params,
convergence_history (every 10th entry), final_loss}
(api_pinn_gradient_descent.py:671-681).
"""

from __future__ import annotations

import sys

import numpy as np

from ..solvers.scalar_inverse import identify_scalars_gd
from ..utils.runtime import configure
from ._api_common import api_main, build_problem_2d, element_stresses_2d


def parse_and_solve(input_data):
    configure()
    material = input_data.get("material", {})
    young_init = material.get("young", 210e9)
    area_init = material.get("area", 0.01)

    measured_disp = input_data.get("measured_disp", [])
    measured_dofs = input_data.get("measured_dofs", [])
    if not measured_disp or not measured_dofs:
        raise ValueError(
            "PINN requires measured_disp and measured_dofs for inverse problem"
        )

    sc = input_data.get("solver_config", {})
    problem = build_problem_2d(input_data, young_init, area_init)

    print("Starting PINN Gradient Descent solver...")
    print(f"  Measured DOFs: {len(measured_dofs)}")
    print(f"  Initial Young's modulus: {young_init:.3e} Pa")
    print(f"  Initial Area: {area_init:.6f} m^2")

    result = identify_scalars_gd(
        problem,
        f_ext=problem.loads,
        u_measured=np.asarray(measured_disp, dtype=float),
        measured_dofs=np.asarray(measured_dofs, dtype=int),
        young_init=young_init,
        area_init=area_init,
        n_iterations=sc.get("max_iterations", 500),
        learning_rate=sc.get("learning_rate", 0.001),
        alpha=sc.get("alpha", 1.0),
        beta=sc.get("beta", 100.0),
        young_bounds=tuple(sc.get("young_bounds", [1e9, 500e9])),
        area_bounds=tuple(sc.get("area_bounds", [0.001, 0.1])),
    )

    u_final = result["u_final"]
    young_final = result["young_final"]
    area_final = result["area_final"]
    history = result["history"]

    stresses, strains = element_stresses_2d(
        problem.node_coords_2d, problem.elements, u_final, young_final
    )
    convergence_history = [
        {
            "iteration": h["iteration"],
            "loss_total": h["loss_total"],
            "loss_physics": h["loss_physics"],
            "loss_data": h["loss_data"],
            "young": h["young"],
            "area": h["area"],
        }
        for h in history[::10]  # every 10th iteration, like the reference
    ]
    return {
        "displacements": u_final.tolist(),
        "stresses": stresses,
        "strains": strains,
        "identified_params": {
            "young": float(young_final),
            "area": float(area_final),
        },
        "convergence_history": convergence_history,
        "final_loss": float(history[-1]["loss_total"]) if history else None,
    }


def main(argv=None) -> int:
    return api_main(
        parse_and_solve, argv,
        usage="Usage: python -m pinn_fem_tpu.cli.api_pinn_gd input.json output.json",
    )


if __name__ == "__main__":
    sys.exit(main())
