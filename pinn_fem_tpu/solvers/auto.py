"""Execution-path selection shared by the CLI and HTTP tiers.

On TPU the host-stepped driver pays one remote dispatch per increment and
phase; the fused on-device driver is semantically identical for
nr/gd/hybrid (tests/test_fused.py) and roughly an order of magnitude
faster end-to-end.  PINN_FEM_TPU_FUSED=1/0 overrides the automatic choice.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import SolverConfig, SolverResult
from ..models.problem import TrussProblem
from .driver import resolve_method, solve


def solve_auto(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    verbose: bool = False,
) -> SolverResult:
    import jax

    config = config or SolverConfig()
    method = resolve_method(problem, config, measured_disp, measured_dofs)
    fused_env = os.environ.get("PINN_FEM_TPU_FUSED")
    use_fused = (
        fused_env == "1"
        or (fused_env is None and jax.default_backend() == "tpu")
    ) and method in ("nr", "gd", "hybrid", "full-nr", "full_nr", "gn")

    if use_fused:
        from .fused import solve_fused

        return solve_fused(
            problem, config, measured_disp, measured_dofs, verbose=verbose
        )
    return solve(problem, config, measured_disp, measured_dofs, verbose=verbose)
