"""Universal incremental-loading driver.

Capability parity with /root/reference/FEM/python/fem/solver.py:1045-1167
(solve): method resolution (explicit config.method, else auto: no NN & no
measurements -> "nr", otherwise -> "gd"), load stepping
lf_i = lf0 + (i/n)(lf1 - lf0), warm-start threading of the displacement
vector between increments (solver.py:1101-1116), full-nr always cold
(solver.py:1141-1148), early abort on a non-converged increment
(solver.py:1161-1165), and returning the LAST increment's result.

The device problem arrays are built once and shared by every increment, so
each increment is a cached-program invocation — the reference re-entered
Python/torch from scratch per increment.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from ..config import SolverConfig, SolverResult
from ..models.problem import TrussProblem
from ..utils.progress import log_gd_progress
from .full_newton import solve_full_nr
from .gd import solve_gd
from .hybrid import solve_hybrid
from .newton import solve_nr

logger = logging.getLogger("pinn_fem_tpu.solvers")


def resolve_method(
    problem: TrussProblem,
    config: SolverConfig,
    measured_disp=None,
    measured_dofs=None,
) -> str:
    if config.method != "auto":
        return config.method.lower()
    has_nn = problem.material.has_trainable_params
    has_meas = measured_disp is not None and measured_dofs is not None
    if not has_nn and not has_meas:
        return "nr"
    return "gd"


def solve(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SolverResult:
    """Universal incremental solve.

    checkpoint_dir / resume extend the reference (which had no cross-process
    persistence, SURVEY §5): with checkpoint_dir set, (u, theta) is saved
    after every converged increment; with resume=True, a previous run's
    state is restored and completed increments are skipped.
    """
    config = config or SolverConfig()
    method = resolve_method(problem, config, measured_disp, measured_dofs)
    data = problem.to_device()

    if verbose:
        from ..utils.progress import ensure_console_logging

        ensure_console_logging()

    result: Optional[SolverResult] = None
    u_current: Optional[np.ndarray] = None
    start_increment = 1

    if checkpoint_dir and resume:
        from ..utils.checkpoint import load_increment_state
        from .gd import get_theta, set_theta

        restored = load_increment_state(checkpoint_dir, get_theta(problem.material))
        if restored is not None:
            done_inc, u_np, theta = restored
            u_current = u_np
            if theta:
                problem.material = set_theta(problem.material, theta)
            start_increment = done_inc + 1
            if verbose:
                logger.info("[resume] restored checkpoint after increment %d", done_inc)
            if start_increment > config.n_increments:
                start_increment = config.n_increments  # re-run the last one

    for iinc in range(start_increment, config.n_increments + 1):
        load_factor = config.load_factor_initial + (iinc / config.n_increments) * (
            config.load_factor_final - config.load_factor_initial
        )
        if verbose:
            start = "WARM_START" if u_current is not None else "COLD_START"
            logger.info("%4d | %12.4f | %10s", iinc, load_factor, start)

        if method == "gd":
            result = solve_gd(
                problem, config, measured_disp, measured_dofs,
                target_load_factor=load_factor, u_initial=u_current, data=data,
            )
        elif method == "nr":
            result = solve_nr(
                problem, config, target_load_factor=load_factor,
                u_initial=u_current, data=data,
            )
        elif method == "hybrid":
            result = solve_hybrid(
                problem, config, measured_disp, measured_dofs,
                target_load_factor=load_factor, u_initial=u_current, data=data,
            )
        elif method in ("full-nr", "full_nr"):
            # The reference never warm-starts full-nr (solver.py:1141-1148);
            # we pass the warm start and let config.nr_warm_start decide.
            # Warm starting matters here: with a physics-only loss the
            # (u, theta) equilibrium manifold is degenerate, and cold
            # u=0 restarts push theta away from its init every increment.
            result = solve_full_nr(
                problem, config, measured_disp, measured_dofs,
                target_load_factor=load_factor, data=data,
                u_initial=u_current if config.nr_warm_start else None,
            )
        elif method == "gn":
            from .gauss_newton import solve_gauss_newton

            result = solve_gauss_newton(
                problem, config, measured_disp, measured_dofs,
                target_load_factor=load_factor, u_initial=u_current, data=data,
            )
        else:
            raise ValueError(f"Unknown solver method: {method}")

        u_current = result.displacements.flatten()
        if verbose:
            # Per-iteration progress table (reference solver.py:325-333),
            # emitted post-hoc from the history buffer at print_every cadence.
            log_gd_progress(result.history, config.print_every)
            status = "CONVERGED" if result.converged else "FAILED"
            logger.info("%4d | %12.6f | %10s", iinc, load_factor, status)

        if checkpoint_dir and result.converged:
            from ..utils.checkpoint import save_increment_state
            from .gd import get_theta

            save_increment_state(
                checkpoint_dir, iinc, u_current, get_theta(problem.material),
                meta={"method": method, "load_factor": load_factor},
            )

        if not result.converged:
            if verbose:
                logger.warning("Increment %d did not converge, stopping.", iinc)
            break

    return result
