"""PINN Newton-Raphson (Gauss-Newton/LM) JSON API: scalar (E, A)
identification.

    python -m pinn_fem_tpu.cli.api_pinn_nr input.json output.json

Implements the DOCUMENTED contract of the reference's broken
api_pinn_newton_raphson.py (stale import at line 19; SURVEY §7.4):
parse measured data + lambda_lm (api_pinn_newton_raphson.py:66), solve
with Gauss-Newton + LM, output {displacements, stresses, strains,
identified_params, convergence_history, final_residual}
(api_pinn_newton_raphson.py:825-835).
"""

from __future__ import annotations

import sys

import numpy as np

from ..solvers.scalar_inverse import identify_scalars_gn
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

    print("Starting PINN Newton-Raphson solver...")
    print(f"  Measured DOFs: {len(measured_dofs)}")
    print(f"  LM damping: {sc.get('lambda_lm', 1e-3):.3e}")

    result = identify_scalars_gn(
        problem,
        f_ext=problem.loads,
        u_measured=np.asarray(measured_disp, dtype=float),
        measured_dofs=np.asarray(measured_dofs, dtype=int),
        young_init=young_init,
        area_init=area_init,
        max_iterations=sc.get("max_iterations", 50),
        tolerance=sc.get("tolerance", 1e-6),
        lambda_lm=sc.get("lambda_lm", 1e-3),
    )

    u_final = result["u_final"]
    young_final = result["young_final"]
    area_final = result["area_final"]

    stresses, strains = element_stresses_2d(
        problem.node_coords_2d, problem.elements, u_final, young_final
    )
    return {
        "displacements": u_final.tolist(),
        "stresses": stresses,
        "strains": strains,
        "identified_params": {
            "young": float(young_final),
            "area": float(area_final),
        },
        "convergence_history": result["history"],
        "final_residual": (
            float(result["history"][-1]["residual"]) if result["history"] else None
        ),
    }


def main(argv=None) -> int:
    return api_main(
        parse_and_solve, argv,
        usage="Usage: python -m pinn_fem_tpu.cli.api_pinn_nr input.json output.json",
    )


if __name__ == "__main__":
    sys.exit(main())
