"""Hybrid GD -> NR solver.

Capability parity with /root/reference/FEM/python/fem/solver.py:520-692
(solve_hybrid):

  Phase 1 (only if config.preconditioning): GD with the capped budget
  min(300, max//3) at the relaxed tolerance max(1e-4, 10*tol); early-exit if
  it already satisfies the tight tolerance (solver.py:552-586).

  Phase 2: with trainable NN materials -> a second GD at the tight tolerance
  and the remaining iteration budget, warm-started ("GD->GD",
  solver.py:594-651); with scalar materials -> true Newton-Raphson
  finalization warm-started from phase 1 (solver.py:653-692).

History merging preserves the reference's formats: GD entries keep their
keys; the NR phase contributes its single increment entry re-stamped with
the unified iteration count (solver.py:678-686).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import SolverConfig, SolverResult
from ..models.problem import ProblemData, TrussProblem
from .gd import solve_gd
from .newton import solve_nr


def solve_hybrid(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    target_load_factor: float = 1.0,
    u_initial: Optional[np.ndarray] = None,
    data: Optional[ProblemData] = None,
) -> SolverResult:
    config = config or SolverConfig()
    data = data if data is not None else problem.to_device()

    gd_result = None
    gd_budget = 0
    if config.preconditioning:
        gd_config = config.with_(
            max_iterations=min(300, config.max_iterations // 3),
            tolerance=max(1e-4, config.tolerance * 10),
        )
        gd_budget = gd_config.max_iterations
        try:
            gd_result = solve_gd(
                problem, gd_config, measured_disp, measured_dofs,
                target_load_factor, u_initial, skip_preconditioning=True,
                data=data,
            )
            last = gd_result.history[-1] if gd_result.history else {}
            if gd_result.converged and last.get("residual_norm", 1.0) < config.tolerance:
                return gd_result
        except Exception as e:  # reference: proceed with cold NR (solver.py:584-586)
            import logging

            logging.getLogger("pinn_fem_tpu.solvers").warning(
                "hybrid GD phase failed: %s, proceeding with cold NR", e
            )
            gd_result = None

    u_warm = gd_result.displacements.flatten() if gd_result is not None else u_initial
    gd_iters = (
        gd_result.history[-1].get("iteration", 0.0)
        if gd_result is not None and gd_result.history
        else 0.0
    )

    if problem.material.has_trainable_params:
        # GD finalization at the tight tolerance with the remaining budget.
        final_config = config.with_(
            max_iterations=config.max_iterations - (gd_budget if gd_result else 0),
        )
        final_result = solve_gd(
            problem, final_config, measured_disp, measured_dofs,
            target_load_factor, u_warm, skip_preconditioning=True, data=data,
        )
        if gd_result is not None:
            unified = list(gd_result.history)
            for entry in final_result.history:
                e = dict(entry)
                e["iteration"] = entry.get("iteration", 0.0) + gd_iters
                unified.append(e)
            final_result.history = unified
        return final_result

    # Scalar materials: true Newton-Raphson finalization.
    nr_result = solve_nr(problem, config, target_load_factor, u_warm, data=data)
    nr_iters = nr_result.history[-1].get("iterations", 1.0) if nr_result.history else 1.0
    if gd_result is not None:
        total = gd_iters + nr_iters
        unified = list(gd_result.history)
        if nr_result.history:
            nr_entry = dict(nr_result.history[-1])
            nr_entry["iteration"] = total
            unified.append(nr_entry)
        nr_result.history = unified
    return nr_result
