"""Full Newton-Raphson over the coupled (u, theta) unknowns.

Capability parity with /root/reference/FEM/python/fem/solver.py:753-1037
(solve_full_nr), implemented AS SPECIFIED rather than as the reference
behaves: the reference's NN path throws inside its row-by-row Hessian loop
every iteration and silently degrades to gradient descent (see the captured
run examples/json/example9_output.txt:55-63 and SURVEY §3.5); this module
builds the TRUE coupled Hessian

    H = d^2 L / d(u_free, theta)^2,   L = 0.5 ||R_free||^2 + mean_data

with jax.jacfwd(jax.grad(L)) — forward-over-reverse, i.e. batched
Hessian-vector products that XLA vectorizes on the MXU — and takes
Levenberg-Marquardt-damped Newton steps solved by Cholesky on device.

Contracts preserved:
  * without trainable parameters, delegates to classic NR (solver.py:787-790;
    example8.json validates full-nr == nr);
  * convergence on the total gradient norm sqrt(|g_u|^2 + |g_th|^2) < tol
    (solver.py:874-899);
  * history rows {iteration, loss_total, loss_physics, loss_data,
    grad_norm_u, grad_norm_theta} with 0-based iteration (solver.py:985-994);
  * loss_total = loss_physics + loss_data, unweighted (solver.py:845).

Documented divergence: the physics residual is restricted to FREE DOFs.
The reference's full-NR loss includes fixed-DOF residual rows (= reaction
forces, solver.py:724-729), which penalizes nonzero reactions — a physics
bug that its own fallback path never actually exercised to convergence.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig, SolverResult
from ..models.problem import ProblemData, TrussProblem
from .gd import export_nn_parameters, get_theta, set_theta
from .newton import solve_nr


@partial(jax.jit, static_argnames=("has_meas", "hist_cap", "n_free"))
def _full_nr_core(
    data: ProblemData,
    material,
    theta,
    free_idx: jnp.ndarray,
    u0_free: jnp.ndarray,
    load_factor,
    measured_vals,
    measured_dofs,
    max_iter,
    tol,
    data_tol,
    lr_u,
    lr_theta,
    has_meas: bool,
    hist_cap: int,
    n_free: int,
):
    from .phases import full_nr_phase, reactions_of

    dtype = u0_free.dtype
    u0 = jnp.zeros(data.ndof, dtype).at[free_idx].set(u0_free)
    out = full_nr_phase(
        data, material, set_theta, u0, theta, free_idx, load_factor,
        measured_vals, measured_dofs, has_meas,
        max_iter, tol, data_tol, lr_u, lr_theta, hist_cap,
    )
    mat = set_theta(material, out.theta)
    reactions = reactions_of(data, mat, out.u, load_factor)
    return out.u, out.theta, reactions, out.converged, out.hist, out.n_rows


def solve_full_nr(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    target_load_factor: float = 1.0,
    u_initial: Optional[np.ndarray] = None,
    data: Optional[ProblemData] = None,
) -> SolverResult:
    config = config or SolverConfig()

    if not problem.material.has_trainable_params:
        # Full NR == classic NR without parameters (solver.py:787-790).
        return solve_nr(problem, config, target_load_factor, u_initial, data=data)

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    free_idx_np, _ = problem.free_fixed()
    free_idx = jnp.asarray(free_idx_np, jnp.int32)
    n_free = int(free_idx_np.size)

    provided = measured_disp is not None and measured_dofs is not None
    has_meas = provided and len(np.asarray(measured_dofs).reshape(-1)) > 0
    if has_meas:
        mvals = jnp.asarray(np.asarray(measured_disp, dtype=float), dtype=dtype)
        mdofs = jnp.asarray(np.asarray(measured_dofs, dtype=int), dtype=jnp.int32)
    else:
        mvals = jnp.zeros((0,), dtype)
        mdofs = jnp.zeros((0,), jnp.int32)

    if u_initial is not None:
        u0 = np.asarray(u_initial, dtype=float).reshape(-1)[free_idx_np]
    else:
        u0 = np.zeros(n_free)

    theta = get_theta(problem.material)
    hist_cap = 1024
    while hist_cap < config.max_iterations:
        hist_cap *= 2

    u, th, reactions, conv, hist, n_rows = _full_nr_core(
        data,
        problem.material,
        theta,
        free_idx,
        jnp.asarray(u0, dtype),
        jnp.asarray(target_load_factor, dtype),
        mvals,
        mdofs,
        jnp.asarray(min(config.max_iterations, hist_cap), jnp.int32),
        jnp.asarray(config.tolerance, dtype),
        jnp.asarray(config.full_nr_data_tolerance, dtype),
        jnp.asarray(config.learning_rate_u, dtype),
        jnp.asarray(config.learning_rate_theta, dtype),
        has_meas=bool(has_meas),
        hist_cap=hist_cap,
        n_free=n_free,
    )

    problem.material = set_theta(problem.material, jax.device_get(th))

    hist_np = np.asarray(hist)
    history = []
    for k in range(int(n_rows)):
        row = hist_np[k]
        history.append({
            "iteration": int(row[0]),
            "loss_total": float(row[1]),
            "loss_physics": float(row[2]),
            "loss_data": float(row[3]),
            "grad_norm_u": float(row[4]),
            "grad_norm_theta": float(row[5]),
        })

    shape = (-1, 1) if problem.dimension == 1 else (problem.nnode, problem.dimension)
    return SolverResult(
        displacements=np.asarray(u, dtype=float).reshape(shape),
        reactions=np.asarray(reactions, dtype=float).reshape(shape),
        converged=bool(conv),
        history=history,
        nn_parameters=export_nn_parameters(get_theta(problem.material)),
    )
