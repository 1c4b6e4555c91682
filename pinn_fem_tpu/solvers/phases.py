"""Traceable solver phases — the building blocks shared by the per-increment
host-stepped solvers (gd.py, newton.py) and the fully-fused on-device
incremental driver (fused.py).

Each phase is a pure function of traced values that runs one optimization
loop inside lax.while_loop and returns the final state plus a preallocated
history buffer.  No jit here; callers decide the jit boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.fields import Material
from ..models.problem import ProblemData
from ..ops.assembly import assemble_system, internal_force_and_strain
from ..ops.linalg import masked_solve

# GD history buffer columns (reference solve_gd history keys,
# solver.py:308-322).
GD_HIST_COLS = 7  # iteration, loss_total, loss_physics, loss_data, u_norm,
                  # residual_norm, theta_norm

# torch.optim.Adam defaults (solver.py:234-238).
ADAM = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)


class GDPhaseOut(NamedTuple):
    u: jnp.ndarray
    theta: list
    hist: jnp.ndarray      # (hist_cap, GD_HIST_COLS)
    n_iters: jnp.ndarray   # int32
    converged: jnp.ndarray  # bool
    rnorm: jnp.ndarray     # last residual norm


class NRPhaseOut(NamedTuple):
    u: jnp.ndarray
    n_iters: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray
    max_strain: jnp.ndarray


def _theta_param_norm(theta: list, dtype) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(theta)
    if not leaves:
        return jnp.zeros((), dtype)
    return sum(jnp.linalg.norm(p) for p in leaves)


def gd_phase(
    data: ProblemData,
    material: Material,
    set_theta_fn,
    u0: jnp.ndarray,
    theta0: list,
    load_factor,
    measured_vals: jnp.ndarray,
    measured_dofs: jnp.ndarray,
    has_meas: bool,
    max_iter,
    tol,
    lr_u,
    lr_theta,
    alpha_physics,
    alpha_data,
    hist_cap: int,
) -> GDPhaseOut:
    """One GD optimization phase (reference solve_gd inner loop,
    solver.py:252-355): dual Adam, BC projection, iteration>10 convergence
    gate on residual_norm < tol OR loss < tol."""
    dtype = u0.dtype

    def loss_fn(u, th):
        mat = set_theta_fn(material, th)
        f_int, _ = internal_force_and_strain(data, mat, u, load_factor)
        r = (f_int - load_factor * data.loads) * data.free_mask
        loss_p = 0.5 * jnp.sum(r * r)
        if has_meas:
            rd = measured_vals - u[measured_dofs]
            loss_d = jnp.mean(rd * rd)
            loss = alpha_physics * loss_p + alpha_data * loss_d
        else:
            loss_d = jnp.zeros((), dtype)
            loss = alpha_physics * loss_p
        return loss, (loss_p, loss_d, jnp.linalg.norm(r))

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def cond(carry):
        it, _, _, _, _, conv, _, _ = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(conv))

    def body(carry):
        it, u, th, opt_u, opt_th, _, hist, _ = carry
        (loss, (lp, ld, rnorm)), (gu, gth) = grad_fn(u, th)

        dir_u, opt_u = ADAM.update(gu, opt_u)
        u_new = (u - lr_u * dir_u) * data.free_mask  # step + BC projection
        dir_th, opt_th = ADAM.update(gth, opt_th)
        th_new = jax.tree_util.tree_map(lambda p, d: p - lr_theta * d, th, dir_th)

        row = jnp.stack([
            (it + 1).astype(dtype), loss.astype(dtype), lp.astype(dtype),
            ld.astype(dtype), jnp.linalg.norm(u_new).astype(dtype),
            rnorm.astype(dtype), _theta_param_norm(th_new, dtype),
        ])
        hist = hist.at[it].set(row)

        loss_ok = jnp.logical_and(jnp.logical_not(jnp.isnan(loss)), loss < tol)
        conv = jnp.logical_and(it > 10, jnp.logical_or(rnorm < tol, loss_ok))
        return (it + 1, u_new, th_new, opt_u, opt_th, conv, hist, rnorm)

    init = (
        jnp.zeros((), jnp.int32),
        u0,
        theta0,
        ADAM.init(u0),
        ADAM.init(theta0),
        jnp.zeros((), bool),
        jnp.zeros((hist_cap, GD_HIST_COLS), dtype),
        jnp.asarray(jnp.inf, dtype),
    )
    it, u, th, _, _, conv, hist, rnorm = jax.lax.while_loop(cond, body, init)
    return GDPhaseOut(u=u, theta=th, hist=hist, n_iters=it, converged=conv,
                      rnorm=rnorm)


def nr_phase(
    data: ProblemData,
    material: Material,
    u0: jnp.ndarray,
    load_factor,
    max_iter,
    tol,
    min_denom,
    nonlinear: bool = False,
) -> NRPhaseOut:
    """One Newton-Raphson phase (reference solve_nr loop, solver.py:456-491).

    nonlinear=True uses the Green-Lagrange kernel (2D, opt-in)."""
    if nonlinear:
        from ..ops.assembly import assemble_system_nonlinear as assemble
    else:
        assemble = assemble_system

    def cond(carry):
        it, _, _, conv, _ = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(conv))

    def body(carry):
        it, u, _, _, _ = carry
        k, f_int, max_strain = assemble(data, material, u, load_factor)
        rhs = load_factor * data.loads - f_int
        du = masked_solve(k, rhs, data.free_mask)
        u_new = u + du
        res = jnp.linalg.norm(du) / jnp.maximum(jnp.linalg.norm(u_new), min_denom)
        return (it + 1, u_new, res, res <= tol, max_strain)

    init = (
        jnp.zeros((), jnp.int32),
        u0,
        jnp.asarray(jnp.inf, u0.dtype),
        jnp.zeros((), bool),
        jnp.zeros((), u0.dtype),
    )
    it, u, res, conv, max_strain = jax.lax.while_loop(cond, body, init)
    return NRPhaseOut(u=u, n_iters=it, residual=res, converged=conv,
                      max_strain=max_strain)


def reactions_of(
    data: ProblemData, material: Material, u: jnp.ndarray, load_factor
) -> jnp.ndarray:
    """f_int - lf * f_ext with free DOFs zeroed (solver.py:373-385)."""
    f_int, _ = internal_force_and_strain(data, material, u, load_factor)
    return (f_int - load_factor * data.loads) * data.fixed_mask
