"""Legacy solver API surface.

The reference keeps three older, self-contained solvers alongside the
unified one, all still exported from its package root (fem/__init__.py):

  * solve_incremental_newton — fem/core.py:10-79, used by api_fem_solver;
  * solve_pinn_gradient_descent — fem/nn_solver_gd.py:42-197;
  * solve_pinn_newton_raphson — fem/nn_solver.py:138-426 (Gauss-Newton+LM).

This module provides the same API surface with the same result shapes and
history formats, implemented on the shared jitted phases.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverResult
from ..models.problem import ProblemData, TrussProblem
from ..ops.assembly import assemble_system, internal_force_and_strain
from .gd import export_nn_parameters, get_theta, set_theta
from .phases import ADAM, nr_phase


# ---------------------------------------------------------------------------
# Legacy configs / results (reference model.py:94-107, nn_solver.py:27-46,
# nn_solver_gd.py:18-39)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LegacySolverConfig:
    n_increments: int = 10
    max_iterations: int = 80
    tolerance: float = 1e-6
    min_denominator: float = 1e-12


@dataclass
class PINNSolverConfig:
    max_iterations: int = 50
    tolerance: float = 1e-6
    alpha_physics: float = 1.0
    alpha_data: float = 1.0
    min_denominator: float = 1e-12
    max_step_u: float = 1e-3
    max_step_theta: float = 0.1
    line_search: bool = True


@dataclass
class PINNGradientDescentConfig:
    max_iterations: int = 1000
    tolerance: float = 1e-6
    learning_rate_u: float = 1e-7
    learning_rate_theta: float = 1e-4
    alpha_physics: float = 1.0
    alpha_data: float = 100.0
    print_every: int = 10


@dataclass
class PINNSolverResult:
    displacements: np.ndarray
    nn_parameters: Dict[str, np.ndarray]
    converged: bool
    history: List[Dict[str, float]] = field(default_factory=list)


# ---------------------------------------------------------------------------
# solve_incremental_newton (reference core.py:10-79)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_increments",))
def _incremental_nr_core(data: ProblemData, material, max_iter, tol, min_denom,
                         n_increments: int):
    """lax.scan over increments, NR while_loop inside; the displacement
    vector persists across increments (core.py never resets u)."""

    def inc(u, i):
        lf = (i + 1).astype(u.dtype) / n_increments
        out = nr_phase(data, material, u, lf, max_iter, tol, min_denom)
        return out.u, (lf, out.n_iters, out.residual, out.max_strain,
                       out.converged)

    u0 = jnp.zeros(data.ndof, data.loads.dtype)
    u, scans = jax.lax.scan(inc, u0, jnp.arange(n_increments))

    # Reactions vs the FULL loads, not the last load factor (core.py:63-65).
    k_final, _, _ = assemble_system(data, material, u, 1.0)
    reactions = (k_final @ u - data.loads) * data.fixed_mask
    return u, reactions, scans


def solve_incremental_newton(
    problem: TrussProblem,
    config: Optional[LegacySolverConfig] = None,
) -> SolverResult:
    """Classic incremental NR with the legacy history/result contract:
    one history entry PER INCREMENT ({increment, load_factor, iterations,
    residual, max_strain, converged}, core.py:51-60), converged =
    all-increments-converged.

    Unlike the unified solve_nr (which refuses trainable materials,
    solver.py:437-441), this legacy path evaluates NN material fields
    FROZEN — matching the reference's core.py, which assembles with
    whatever Property.value returns (used by truss1d_nn_property.py).
    """
    config = config or LegacySolverConfig()

    data = problem.to_device()
    dtype = data.loads.dtype
    u, reactions, scans = _incremental_nr_core(
        data, problem.material,
        jnp.asarray(config.max_iterations, jnp.int32),
        jnp.asarray(config.tolerance, dtype),
        jnp.asarray(config.min_denominator, dtype),
        n_increments=config.n_increments,
    )
    u_np = np.asarray(u, dtype=float)
    if not np.all(np.isfinite(u_np)):
        raise RuntimeError("Tangent stiffness became singular during solve")

    lfs, iters, residuals, strains, convs = (np.asarray(x) for x in scans)
    history = [
        {
            "increment": float(i + 1),
            "load_factor": float(lfs[i]),
            "iterations": float(iters[i]),
            "residual": float(residuals[i]),
            "max_strain": float(strains[i]),
            "converged": 1.0 if convs[i] else 0.0,
        }
        for i in range(len(lfs))
    ]
    shape = (-1, 1) if problem.dimension == 1 else (problem.nnode, problem.dimension)
    return SolverResult(
        displacements=u_np.reshape(shape),
        reactions=np.asarray(reactions, dtype=float).reshape(shape),
        converged=bool(np.all(convs)),
        history=history,
    )


# ---------------------------------------------------------------------------
# solve_pinn_gradient_descent (reference nn_solver_gd.py:42-197)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("has_meas", "hist_cap"))
def _legacy_gd_core(data, material, theta, f_ext, mvals, mdofs,
                    max_iter, tol, lr_u, lr_theta, a_p, a_d,
                    has_meas: bool, hist_cap: int):
    dtype = data.loads.dtype

    def loss_fn(u, th):
        mat = set_theta(material, th)
        f_int, _ = internal_force_and_strain(data, mat, u, 1.0)
        # Legacy loss: MEAN of squared free-DOF residual (nn_solver_gd.py:113)
        r = (f_int - f_ext) * data.free_mask
        n_free = jnp.sum(data.free_mask)
        loss_p = jnp.sum(r * r) / n_free
        if has_meas:
            rd = mvals - u[mdofs]
            loss_d = jnp.mean(rd * rd)
        else:
            loss_d = jnp.zeros((), dtype)
        return a_p * loss_p + a_d * loss_d, (loss_p, loss_d)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def cond(c):
        it, _, _, _, _, conv, _ = c
        return jnp.logical_and(it < max_iter, jnp.logical_not(conv))

    def body(c):
        it, u, th, opt_u, opt_th, _, hist = c
        (loss, (lp, ld)), (gu, gth) = grad_fn(u, th)
        du, opt_u = ADAM.update(gu, opt_u)
        u = (u - lr_u * du) * data.free_mask
        dth, opt_th = ADAM.update(gth, opt_th)
        th = jax.tree_util.tree_map(lambda p, d: p - lr_theta * d, th, dth)
        row = jnp.stack([
            (it + 1).astype(dtype), loss.astype(dtype), lp.astype(dtype),
            ld.astype(dtype), jnp.linalg.norm(u).astype(dtype),
        ])
        hist = hist.at[it].set(row)
        # Legacy convergence: loss < tol after iteration 10 only
        # (nn_solver_gd.py:167-170).
        conv = jnp.logical_and(it > 10, loss < tol)
        return (it + 1, u, th, opt_u, opt_th, conv, hist)

    u0 = jnp.zeros(data.ndof, dtype)
    init = (jnp.zeros((), jnp.int32), u0, theta, ADAM.init(u0),
            ADAM.init(theta), jnp.zeros((), bool),
            jnp.zeros((hist_cap, 5), dtype))
    it, u, th, _, _, conv, hist = jax.lax.while_loop(cond, body, init)
    return u, th, it, conv, hist


def solve_pinn_gradient_descent(
    problem: TrussProblem,
    f_ext: np.ndarray,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    config: Optional[PINNGradientDescentConfig] = None,
) -> PINNSolverResult:
    """Legacy PINN GD (dual Adam, mean-squared losses, loss-only
    convergence after iteration 10)."""
    config = config or PINNGradientDescentConfig()
    if not problem.material.has_trainable_params:
        raise ValueError("Model must have trainable NN parameters (use an MLP field)")

    data = problem.to_device()
    dtype = data.loads.dtype
    theta = get_theta(problem.material)

    has_meas = measured_disp is not None and measured_dofs is not None
    if has_meas:
        mvals = jnp.asarray(np.asarray(measured_disp, dtype=float), dtype=dtype)
        mdofs = jnp.asarray(np.asarray(measured_dofs, dtype=int), jnp.int32)
        has_meas = mdofs.shape[0] > 0
    if not has_meas:
        mvals = jnp.zeros((0,), dtype)
        mdofs = jnp.zeros((0,), jnp.int32)

    hist_cap = 1024
    while hist_cap < config.max_iterations:
        hist_cap *= 2

    u, th, it, conv, hist = _legacy_gd_core(
        data, problem.material, theta,
        jnp.asarray(np.asarray(f_ext, dtype=float), dtype=dtype),
        mvals, mdofs,
        jnp.asarray(min(config.max_iterations, hist_cap), jnp.int32),
        jnp.asarray(config.tolerance, dtype),
        jnp.asarray(config.learning_rate_u, dtype),
        jnp.asarray(config.learning_rate_theta, dtype),
        jnp.asarray(config.alpha_physics, dtype),
        jnp.asarray(config.alpha_data, dtype),
        has_meas=bool(has_meas),
        hist_cap=hist_cap,
    )
    problem.material = set_theta(problem.material, jax.device_get(th))

    hist_np = np.asarray(hist)
    history = []
    for k in range(int(it)):
        row = hist_np[k]
        history.append({
            "iteration": float(row[0]),
            "loss_total": float(row[1]),
            "loss_physics": float(row[2]),
            "loss_data": float(row[3]) if has_meas else 0.0,
            "u_norm": float(row[4]),
        })

    shape = (-1, 1) if problem.dimension == 1 else (problem.nnode, problem.dimension)
    return PINNSolverResult(
        displacements=np.asarray(u, dtype=float).reshape(shape),
        nn_parameters=export_nn_parameters(get_theta(problem.material)),
        converged=bool(conv),
        history=history,
    )


# ---------------------------------------------------------------------------
# solve_pinn_newton_raphson (reference nn_solver.py:138-426)
# ---------------------------------------------------------------------------


def solve_pinn_newton_raphson(
    problem: TrussProblem,
    f_ext: np.ndarray,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    config: Optional[PINNSolverConfig] = None,
) -> PINNSolverResult:
    """Legacy Gauss-Newton + LM + Armijo PINN solver (see gauss_newton.py)."""
    from ..config import SolverConfig
    from .gauss_newton import solve_gauss_newton

    config = config or PINNSolverConfig()
    if not problem.material.has_trainable_params:
        raise ValueError("Model must have trainable NN parameters (use an MLP field)")

    loads_backup = problem.loads
    problem.loads = np.asarray(f_ext, dtype=float).reshape(-1)
    try:
        result = solve_gauss_newton(
            problem,
            SolverConfig(
                max_iterations=config.max_iterations,
                tolerance=config.tolerance,
                min_denominator=config.min_denominator,
            ),
            measured_disp, measured_dofs,
            target_load_factor=1.0,
            alpha_physics=config.alpha_physics,
            alpha_data=config.alpha_data,
        )
    finally:
        problem.loads = loads_backup

    return PINNSolverResult(
        displacements=result.displacements,
        nn_parameters=result.nn_parameters or {},
        converged=result.converged,
        history=result.history,
    )
