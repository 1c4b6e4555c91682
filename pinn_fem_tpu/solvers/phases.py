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
from jax.flatten_util import ravel_pytree

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


class ZPhaseOut(NamedTuple):
    """Output of the coupled-(u, theta) phases (full-NR, Gauss-Newton)."""

    u: jnp.ndarray          # (ndof,) full displacement vector
    theta: list
    hist: jnp.ndarray       # (hist_cap, GD_HIST_COLS) — 6 used cols + pad
    n_rows: jnp.ndarray     # int32 valid history rows
    converged: jnp.ndarray  # bool


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


_LM_TRIES = 16   # full-NR lambda escalations before the GD fallback
_LS_TRIES = 15   # GN Armijo backtracking attempts (nn_solver.py:290-355)
_ARMIJO_C = 1e-4
_LS_SHRINK = 0.7


def full_nr_phase(
    data: ProblemData,
    material: Material,
    set_theta_fn,
    u0: jnp.ndarray,
    theta0: list,
    free_idx: jnp.ndarray,
    load_factor,
    measured_vals: jnp.ndarray,
    measured_dofs: jnp.ndarray,
    has_meas: bool,
    max_iter,
    tol,
    data_tol,
    lr_u,
    lr_theta,
    hist_cap: int,
) -> ZPhaseOut:
    """One full-Newton phase over the coupled z = [u_free, theta] unknowns
    (reference solve_full_nr as SPECIFIED, solver.py:753-1037; see
    solvers/full_newton.py for the design rationale and documented
    divergences).  True coupled Hessian via jacfwd(grad) — batched HVPs —
    and LM-damped Newton steps solved by Cholesky.

    History row columns (6 used, padded to GD_HIST_COLS):
    [iteration(0-based), loss_total, loss_physics, loss_data, grad_norm_u,
    grad_norm_theta, 0].
    """
    dtype = u0.dtype
    n_free = free_idx.shape[0]
    theta_flat0, unravel = ravel_pytree(theta0)
    n_theta = theta_flat0.shape[0]
    z0 = jnp.concatenate([u0[free_idx], theta_flat0])
    n_z = n_free + n_theta

    def loss_parts(z):
        u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
        th = unravel(z[n_free:])
        mat = set_theta_fn(material, th)
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
            return jnp.logical_and(
                jnp.logical_not(ok), lam < lam0 * (10.0 ** _LM_TRIES)
            )

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
        # Secondary (documented divergence): physical equilibrium
        # ||R_free|| < tol, gated by the data RMS when measurements exist —
        # the f32 gradient-norm noise floor makes grad-only convergence
        # unreachable at tol=1e-6 on TPU.  ||R|| = sqrt(2 * loss_physics).
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
            jnp.zeros((), dtype),
        ])
        hist = jax.lax.cond(
            conv, lambda h_: h_, lambda h_: h_.at[it].set(row), hist
        )
        n_rows = jnp.where(conv, it, it + 1)
        return (it + 1, z_new, conv, hist, n_rows)

    init = (
        jnp.zeros((), jnp.int32), z0, jnp.zeros((), bool),
        jnp.zeros((hist_cap, GD_HIST_COLS), dtype), jnp.zeros((), jnp.int32),
    )
    it, z, conv, hist, n_rows = jax.lax.while_loop(cond, body, init)
    u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
    return ZPhaseOut(u=u, theta=unravel(z[n_free:]), hist=hist, n_rows=n_rows,
                     converged=conv)


def gn_phase(
    data: ProblemData,
    material: Material,
    set_theta_fn,
    u0: jnp.ndarray,
    theta0: list,
    free_idx: jnp.ndarray,
    load_factor,
    measured_vals: jnp.ndarray,
    measured_dofs: jnp.ndarray,
    has_meas: bool,
    max_iter,
    tol,
    alpha_physics,
    alpha_data,
    min_denom,
    hist_cap: int,
) -> ZPhaseOut:
    """One Gauss-Newton/LM/Armijo phase over z = [u_free, theta]
    (reference solve_pinn_newton_raphson, nn_solver.py:138-426; see
    solvers/gauss_newton.py for the documented double-theta-step divergence).

    History row columns (6 used, padded to GD_HIST_COLS):
    [iteration(1-based), r_physics, r_data, r_total, relative_error,
    step_size, 0].
    """
    dtype = u0.dtype
    n_free = free_idx.shape[0]
    theta_flat0, unravel = ravel_pytree(theta0)
    z0 = jnp.concatenate([u0[free_idx], theta_flat0])
    n_z = z0.shape[0]
    eye = jnp.eye(n_z, dtype=dtype)

    def residual(z):
        u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
        mat = set_theta_fn(material, unravel(z[n_free:]))
        f_int, _ = internal_force_and_strain(data, mat, u, load_factor)
        rp = (f_int - load_factor * data.loads)[free_idx]
        if has_meas:
            rd = measured_vals - u[measured_dofs]
            r = jnp.concatenate([alpha_physics * rp, alpha_data * rd])
        else:
            rd = jnp.zeros((0,), dtype)
            r = alpha_physics * rp
        return r, (jnp.linalg.norm(rp), jnp.linalg.norm(rd))

    res_fn = lambda z: residual(z)[0]
    jac_fn = jax.jacrev(res_fn)

    def line_search(z, dz, r_norm):
        """Backtracking: accept |R(z+s dz)| < r_norm (1 - c s), s *= 0.7."""
        def cond(carry):
            k, _, accepted = carry
            return jnp.logical_and(k < _LS_TRIES, jnp.logical_not(accepted))

        def body(carry):
            k, step, _ = carry
            r_test = jnp.linalg.norm(res_fn(z + step * dz))
            ok = jnp.logical_and(
                jnp.isfinite(r_test),
                r_test < r_norm * (1.0 - _ARMIJO_C * step),
            )
            step_next = jnp.where(ok, step, step * _LS_SHRINK)
            return (k + 1, step_next, ok)

        _, step, accepted = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), jnp.ones((), dtype),
                         jnp.zeros((), bool))
        )
        return step, accepted

    def cond(carry):
        it, _, conv, stalled, _ = carry
        return jnp.logical_and(
            it < max_iter,
            jnp.logical_and(jnp.logical_not(conv), jnp.logical_not(stalled)),
        )

    def body(carry):
        it, z, _, _, hist = carry
        r, (rp_n, rd_n) = residual(z)
        j = jac_fn(z)
        jtj = j.T @ j
        damping = 1e-6 * jnp.trace(jtj) / n_z
        dz = jnp.linalg.solve(jtj + damping * eye, -(j.T @ r))
        r_norm = jnp.linalg.norm(r)

        step, accepted = line_search(z, dz, r_norm)
        z_new = z + step * dz

        rel_err = r_norm / jnp.maximum(
            jnp.linalg.norm(z_new[:n_free]), min_denom
        )
        row = jnp.stack([
            (it + 1).astype(dtype), rp_n.astype(dtype), rd_n.astype(dtype),
            r_norm.astype(dtype), rel_err.astype(dtype), step.astype(dtype),
            jnp.zeros((), dtype),
        ])
        hist = hist.at[it].set(row)

        conv = jnp.logical_and(rel_err < tol, step > 0)
        # Stall: line search never accepted AND the un-accepted step didn't
        # reduce the residual (the reference stops when step collapses).
        stalled = jnp.logical_and(
            jnp.logical_not(accepted),
            jnp.linalg.norm(res_fn(z_new)) >= r_norm,
        )
        return (it + 1, z_new, conv, stalled, hist)

    init = (
        jnp.zeros((), jnp.int32), z0, jnp.zeros((), bool), jnp.zeros((), bool),
        jnp.zeros((hist_cap, GD_HIST_COLS), dtype),
    )
    it, z, conv, stalled, hist = jax.lax.while_loop(cond, body, init)
    u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
    return ZPhaseOut(u=u, theta=unravel(z[n_free:]), hist=hist, n_rows=it,
                     converged=conv)
