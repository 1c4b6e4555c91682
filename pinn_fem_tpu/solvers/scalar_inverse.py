"""Scalar material identification: recover (young, area) from measured
displacements.

This implements the DOCUMENTED contract of the reference's two broken API
scripts (/root/reference/FEM/python/api_pinn_gradient_descent.py and
api_pinn_newton_raphson.py import solver functions that do not exist —
api_pinn_gradient_descent.py:19, api_pinn_newton_raphson.py:19; SURVEY
§7.4 directs implementing the documented parse -> solve -> stresses /
identified_params contract with working internals).

Two methods, matching the scripts' intent:
  * gradient descent with Adam on (u, log E, log A), loss
    alpha * mean(R_free^2) + beta * mean((u_meas - u)^2), parameter bounds
    enforced by projection;
  * Gauss-Newton with LM damping lambda_lm on the stacked residual over
    (u_free, log E, log A), Armijo backtracking.

Log-parameterization keeps the identification well-conditioned across the
~11 orders of magnitude between E (~2e11 Pa) and A (~1e-2 m^2), and both
residual blocks are NORMALIZED (physics by max|F_ext|, data by
max|u_measured|) so the force-unit physics rows (~1e6 N) cannot drown the
meter-unit data rows (~1e-4 m) — without this the documented loss can only
ever reproduce the initial guess, which is one reason the reference's
scripts never worked.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fields import Material, ScalarField
from ..models.problem import ProblemData, TrussProblem
from ..ops.assembly import internal_force_and_strain
from .phases import ADAM


def _with_scalars(material: Material, young, area) -> Material:
    return material.replace(
        young=ScalarField(value=young), area=ScalarField(value=area)
    )


@partial(jax.jit, static_argnames=("hist_cap",))
def _scalar_gd_core(data: ProblemData, material: Material, f_ext,
                    mvals, mdofs, log_e0, log_a0, bounds,
                    n_iter, lr, alpha, beta, hist_cap: int):
    dtype = data.loads.dtype
    log_lo = jnp.log(bounds[:, 0])
    log_hi = jnp.log(bounds[:, 1])

    f_scale = jnp.maximum(jnp.max(jnp.abs(f_ext)), 1e-30)
    u_scale = jnp.maximum(jnp.max(jnp.abs(mvals)), 1e-30)

    def loss_fn(u, p):
        mat = _with_scalars(material, jnp.exp(p[0]), jnp.exp(p[1]))
        f_int, _ = internal_force_and_strain(data, mat, u, 1.0)
        r = (f_int - f_ext) * data.free_mask / f_scale
        loss_p = jnp.sum(r * r) / jnp.sum(data.free_mask)
        rd = (mvals - u[mdofs]) / u_scale
        loss_d = jnp.mean(rd * rd)
        return alpha * loss_p + beta * loss_d, (loss_p, loss_d)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def body(it, c):
        u, p, opt_u, opt_p, hist = c
        (loss, (lp, ld)), (gu, gp) = grad_fn(u, p)
        du, opt_u = ADAM.update(gu, opt_u)
        u = (u - lr * du) * data.free_mask
        dp, opt_p = ADAM.update(gp, opt_p)
        p = jnp.clip(p - lr * dp, log_lo, log_hi)  # projected bounds
        row = jnp.stack([
            (it + 1).astype(dtype), loss.astype(dtype), lp.astype(dtype),
            ld.astype(dtype), jnp.exp(p[0]), jnp.exp(p[1]),
        ])
        hist = jax.lax.cond(
            it < hist_cap, lambda h: h.at[it].set(row), lambda h: h, hist
        )
        return (u, p, opt_u, opt_p, hist)

    u0 = jnp.zeros(data.ndof, dtype)
    p0 = jnp.stack([log_e0, log_a0])
    init = (u0, p0, ADAM.init(u0), ADAM.init(p0),
            jnp.zeros((hist_cap, 6), dtype))
    u, p, _, _, hist = jax.lax.fori_loop(0, n_iter, body, init)
    return u, jnp.exp(p[0]), jnp.exp(p[1]), hist


def identify_scalars_gd(
    problem: TrussProblem,
    f_ext: np.ndarray,
    u_measured: np.ndarray,
    measured_dofs: np.ndarray,
    young_init: float,
    area_init: float,
    n_iterations: int = 500,
    learning_rate: float = 1e-3,
    alpha: float = 1.0,
    beta: float = 100.0,
    young_bounds: Tuple[float, float] = (1e9, 500e9),
    area_bounds: Tuple[float, float] = (1e-3, 0.1),
) -> Dict:
    """Gradient-descent identification of scalar (E, A)."""
    data = problem.to_device()
    dtype = data.loads.dtype
    hist_cap = 16384
    while hist_cap < n_iterations:
        hist_cap *= 2

    bounds = jnp.asarray(
        np.array([list(young_bounds), list(area_bounds)]), dtype
    )
    u, young, area, hist = _scalar_gd_core(
        data, problem.material,
        jnp.asarray(np.asarray(f_ext, dtype=float), dtype),
        jnp.asarray(np.asarray(u_measured, dtype=float), dtype),
        jnp.asarray(np.asarray(measured_dofs, dtype=int), jnp.int32),
        jnp.asarray(np.log(young_init), dtype),
        jnp.asarray(np.log(area_init), dtype),
        bounds,
        jnp.asarray(min(n_iterations, hist_cap), jnp.int32),
        jnp.asarray(learning_rate, dtype),
        jnp.asarray(alpha, dtype),
        jnp.asarray(beta, dtype),
        hist_cap=hist_cap,
    )

    hist_np = np.asarray(hist)
    history = [
        {
            "iteration": float(hist_np[k, 0]),
            "loss_total": float(hist_np[k, 1]),
            "loss_physics": float(hist_np[k, 2]),
            "loss_data": float(hist_np[k, 3]),
            "young": float(hist_np[k, 4]),
            "area": float(hist_np[k, 5]),
        }
        for k in range(min(n_iterations, hist_cap))
    ]
    return {
        "u_final": np.asarray(u, dtype=float),
        "young_final": float(young),
        "area_final": float(area),
        "history": history,
    }


@partial(jax.jit, static_argnames=("hist_cap", "n_free"))
def _scalar_gn_core(data: ProblemData, material: Material, f_ext, free_idx,
                    mvals, mdofs, log_e0, log_a0,
                    max_iter, tol, lambda_lm, hist_cap: int, n_free: int):
    dtype = data.loads.dtype

    f_scale = jnp.maximum(jnp.max(jnp.abs(f_ext)), 1e-30)
    u_scale = jnp.maximum(jnp.max(jnp.abs(mvals)), 1e-30)

    def residual(z):
        u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
        mat = _with_scalars(material, jnp.exp(z[n_free]), jnp.exp(z[n_free + 1]))
        f_int, _ = internal_force_and_strain(data, mat, u, 1.0)
        rp = (f_int - f_ext)[free_idx] / f_scale
        rd = (mvals - u[mdofs]) / u_scale
        return jnp.concatenate([rp, rd])

    jac_fn = jax.jacrev(residual)
    n_z = n_free + 2
    eye = jnp.eye(n_z, dtype=dtype)

    def cond(c):
        it, _, conv, _ = c
        return jnp.logical_and(it < max_iter, jnp.logical_not(conv))

    def body(c):
        it, z, _, hist = c
        r = residual(z)
        j = jac_fn(z)
        jtj = j.T @ j
        dz = jnp.linalg.solve(jtj + lambda_lm * eye, -(j.T @ r))

        # Backtracking: shrink until the residual decreases.
        def ls_cond(s):
            k, step, ok = s
            return jnp.logical_and(k < 12, jnp.logical_not(ok))

        def ls_body(s):
            k, step, _ = s
            r_new = jnp.linalg.norm(residual(z + step * dz))
            ok = jnp.logical_and(jnp.isfinite(r_new),
                                 r_new < jnp.linalg.norm(r))
            return (k + 1, jnp.where(ok, step, step * 0.5), ok)

        _, step, ok = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.zeros((), jnp.int32), jnp.ones((), dtype),
                               jnp.zeros((), bool))
        )
        z_new = jnp.where(ok, z + step * dz, z)
        r_norm = jnp.linalg.norm(r)
        row = jnp.stack([
            (it + 1).astype(dtype), r_norm.astype(dtype),
            jnp.exp(z_new[n_free]), jnp.exp(z_new[n_free + 1]),
        ])
        hist = hist.at[it].set(row)
        conv = jnp.logical_or(r_norm < tol, jnp.logical_not(ok))
        return (it + 1, z_new, conv, hist)

    z0 = jnp.concatenate([
        jnp.zeros(n_free, dtype), jnp.stack([log_e0, log_a0])
    ])
    init = (jnp.zeros((), jnp.int32), z0, jnp.zeros((), bool),
            jnp.zeros((hist_cap, 4), dtype))
    it, z, conv, hist = jax.lax.while_loop(cond, body, init)
    u = jnp.zeros(data.ndof, dtype).at[free_idx].set(z[:n_free])
    return u, jnp.exp(z[n_free]), jnp.exp(z[n_free + 1]), it, conv, hist


def identify_scalars_gn(
    problem: TrussProblem,
    f_ext: np.ndarray,
    u_measured: np.ndarray,
    measured_dofs: np.ndarray,
    young_init: float,
    area_init: float,
    max_iterations: int = 50,
    tolerance: float = 1e-6,
    lambda_lm: float = 1e-3,
) -> Dict:
    """Gauss-Newton/LM identification of scalar (E, A)."""
    data = problem.to_device()
    dtype = data.loads.dtype
    free_idx_np, _ = problem.free_fixed()
    hist_cap = 256
    while hist_cap < max_iterations:
        hist_cap *= 2

    u, young, area, it, conv, hist = _scalar_gn_core(
        data, problem.material,
        jnp.asarray(np.asarray(f_ext, dtype=float), dtype),
        jnp.asarray(free_idx_np, jnp.int32),
        jnp.asarray(np.asarray(u_measured, dtype=float), dtype),
        jnp.asarray(np.asarray(measured_dofs, dtype=int), jnp.int32),
        jnp.asarray(np.log(young_init), dtype),
        jnp.asarray(np.log(area_init), dtype),
        jnp.asarray(min(max_iterations, hist_cap), jnp.int32),
        jnp.asarray(tolerance, dtype),
        jnp.asarray(lambda_lm, dtype),
        hist_cap=hist_cap,
        n_free=int(free_idx_np.size),
    )
    hist_np = np.asarray(hist)
    history = [
        {
            "iteration": float(hist_np[k, 0]),
            "residual": float(hist_np[k, 1]),
            "young": float(hist_np[k, 2]),
            "area": float(hist_np[k, 3]),
        }
        for k in range(int(it))
    ]
    return {
        "u_final": np.asarray(u, dtype=float),
        "young_final": float(young),
        "area_final": float(area),
        "converged": bool(conv),
        "history": history,
    }
