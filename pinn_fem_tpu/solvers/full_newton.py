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
from jax.flatten_util import ravel_pytree

from ..config import SolverConfig, SolverResult
from ..models.problem import ProblemData, TrussProblem
from ..ops.assembly import internal_force_and_strain
from .gd import export_nn_parameters, get_theta, set_theta
from .newton import solve_nr

_HIST_COLS = 6
_LM_TRIES = 16  # lambda escalations per iteration before falling back to GD


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
    dtype = u0_free.dtype
    theta_flat0, unravel = ravel_pytree(theta)
    n_theta = theta_flat0.shape[0]
    z0 = jnp.concatenate([u0_free, theta_flat0])
    n_z = n_free + n_theta

    def loss_parts(z):
        u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
        th = unravel(z[n_free:])
        mat = set_theta(material, th)
        f_int, _ = internal_force_and_strain(data, mat, u, load_factor)
        r = (f_int - load_factor * data.loads) * data.free_mask
        lp = 0.5 * jnp.sum(r * r)
        if has_meas:
            rd = u[measured_dofs] - measured_vals
            ld = jnp.mean(rd * rd)
        else:
            ld = jnp.zeros((), dtype)
        return lp + ld, (lp, ld)

    loss_fn = lambda z: loss_parts(z)[0]
    grad_fn = jax.grad(loss_fn)
    hess_fn = jax.jacfwd(grad_fn)  # batched HVPs: one fwd pass per column

    eye = jnp.eye(n_z, dtype=dtype)

    def newton_step(z, g, h, loss0):
        """LM-damped Newton: escalate lambda until the step decreases L."""
        lam0 = 1e-6 * jnp.trace(h) / n_z  # nn_solver.py:266-277 damping scale
        lam0 = jnp.maximum(lam0, jnp.asarray(1e-12, dtype))

        def try_body(carry):
            lam, _, _, _ = carry
            chol, _ = jax.scipy.linalg.cho_factor(h + lam * eye, lower=True)
            dz = -jax.scipy.linalg.cho_solve((chol, True), g)
            z_new = z + dz
            l_new = loss_fn(z_new)
            ok = jnp.logical_and(jnp.all(jnp.isfinite(z_new)), l_new < loss0)
            return lam * 10.0, z_new, l_new, ok

        def try_cond(carry):
            lam, _, _, ok = carry
            return jnp.logical_and(jnp.logical_not(ok), lam < lam0 * (10.0 ** _LM_TRIES))

        _, z_new, _, ok = jax.lax.while_loop(
            try_cond, try_body, (lam0, z, loss0, jnp.zeros((), bool))
        )
        # Fallback: plain gradient step (reference fallback, solver.py:966-982).
        lr = jnp.concatenate([
            jnp.full((n_free,), lr_u, dtype), jnp.full((n_theta,), lr_theta, dtype)
        ])
        return jnp.where(ok, z_new, z - lr * g)

    def cond(carry):
        it, _, conv, _, _ = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(conv))

    def body(carry):
        it, z, _, hist, _ = carry
        loss, (lp, ld) = loss_parts(z)
        g = grad_fn(z)
        gnu = jnp.linalg.norm(g[:n_free])
        gnt = jnp.linalg.norm(g[n_free:])
        total = jnp.sqrt(gnu * gnu + gnt * gnt)
        # Primary criterion: total gradient norm (reference solver.py:874-899).
        # Documented divergence: secondary criterion ||R_free|| < tol
        # (physical equilibrium, same as the GD solver's residual check) —
        # in float32 the gradient norm has a noise floor of a few 1e-6 even
        # at the exact fixed point, so grad-only convergence is unreachable
        # at tol=1e-6 on TPU.  ||R|| = sqrt(2 * loss_physics).  The data gate
        # is SolverConfig.full_nr_data_tolerance (RMS misfit of measured DOFs).
        rnorm = jnp.sqrt(2.0 * lp)
        data_ok = jnp.asarray(True) if not has_meas else (jnp.sqrt(ld) < data_tol)
        conv = jnp.logical_or(total < tol, jnp.logical_and(rnorm < tol, data_ok))

        def do_step(z):
            h = hess_fn(z)
            return newton_step(z, g, h, loss)

        z_new = jax.lax.cond(conv, lambda z: z, do_step, z)
        row = jnp.stack([
            it.astype(dtype), loss.astype(dtype), lp.astype(dtype),
            ld.astype(dtype), gnu.astype(dtype), gnt.astype(dtype),
        ])
        hist = jax.lax.cond(
            conv, lambda h_: h_, lambda h_: h_.at[it].set(row), hist
        )
        n_rows = jnp.where(conv, it, it + 1)
        return (it + 1, z_new, conv, hist, n_rows)

    init = (
        jnp.zeros((), jnp.int32), z0, jnp.zeros((), bool),
        jnp.zeros((hist_cap, _HIST_COLS), dtype), jnp.zeros((), jnp.int32),
    )
    it, z, conv, hist, n_rows = jax.lax.while_loop(cond, body, init)

    u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
    th = unravel(z[n_free:])
    mat = set_theta(material, th)
    f_int, _ = internal_force_and_strain(data, mat, u, load_factor)
    reactions = (f_int - load_factor * data.loads) * data.fixed_mask
    return u, th, reactions, conv, hist, n_rows


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
