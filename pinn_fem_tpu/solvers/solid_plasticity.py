"""Incremental elastoplastic statics for the 3D solid family: load
stepping + Newton with the consistent tangent over the batched J2
hex8 Gauss-point kernel (ops/solid_plastic.py).

The plane continuum driver (solvers/plane_plasticity.py) carried to
3D — same incremental doctrine (trial state = COMMITTED previous step,
state commits only at step convergence), same residual normalization
by |f_ext|, same damped-Newton guards (the consistent tangent is
discontinuous at the yield surface; Armijo backtracking restores
global convergence on load/unload histories), same tiers:

  * HOST (numpy float64, zero device programs) below DENSE_DOF_LIMIT;
    the xp=np|jnp kernel means the host runs the LITERAL SAME return
    map as the device tier.
  * DEVICE: ONE jitted program — lax.scan over the (power-of-two
    padded) load schedule with an inner Newton lax.while_loop, the
    (m, 8) return map and (m, 24, 24) tangent contractions batched on
    the MXU, dense masked LU per iteration.

B-bar (mean dilatation) is the DEFAULT: fully-integrated hex8 locks
volumetrically in incompressible J2 flow exactly like plane-strain Q4
(ops/solid_plastic.py:gp_geometry3_bbar).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..models.solid import SolidProblem, _body_force_vectors3
from ..ops.plastic import params_arrays
from ..ops.solid_plastic import (SolidPlasticState, gp_geometry3,
                                 gp_geometry3_bbar, initial_solid_state,
                                 solid_plastic_blocks, von_mises_6)


class SolidPlasticResult(NamedTuple):
    load_factors: np.ndarray     # (n_steps,)
    displacements: np.ndarray    # (n_steps, ndof)
    stresses: np.ndarray         # (n_steps, m, 6) gp-avg Voigt
    von_mises: np.ndarray        # (n_steps, m) gp-avg
    eq_plastic: np.ndarray       # (n_steps, m) gp-avg alpha
    iterations: np.ndarray       # (n_steps,)
    residuals: np.ndarray        # (n_steps,) final |R|/|f_ext|
    converged: bool
    n_plastic: np.ndarray        # (n_steps,) elements actively yielding


def _host_solve(problem: SolidProblem, sy, hi, hk, lfs, tol, max_iter,
                tangent_floor, min_denom, bbar: bool):
    dm = problem.dof_map()
    mask = problem.free_mask()
    f_ext = (problem.loads + _body_force_vectors3(problem)) * mask
    fnorm = max(float(np.linalg.norm(f_ext)), min_denom)
    km_fix = np.diag(1.0 - mask)
    young, poisson = problem.young, problem.poisson

    b, wdet = (gp_geometry3_bbar(problem) if bbar
               else gp_geometry3(problem))

    def system(u, state):
        ke, fe, sig6, st_new = solid_plastic_blocks(
            b, wdet, u[dm], state, young, poisson, sy, hi, hk,
            tangent_floor)
        k = np.zeros((problem.ndof, problem.ndof))
        np.add.at(k, (dm[:, :, None], dm[:, None, :]), ke)
        f_int = np.zeros(problem.ndof)
        np.add.at(f_int, dm, fe)
        return k, f_int, sig6, st_new

    def resid_norm(u, state, lf):
        _, f_int, _, _ = system(u, state)
        return float(np.linalg.norm((lf * f_ext - f_int) * mask)) \
            / fnorm

    u = np.zeros(problem.ndof)
    state = initial_solid_state(problem.nelm)
    rows = {k: [] for k in ("u", "sig", "vm", "al", "it", "res", "np_")}
    all_ok = True
    for lf in lfs:
        alpha_prev = state.alpha
        ok = False
        res = np.inf
        it_used = max_iter
        for it in range(max_iter):
            k_t, f_int, sig6, st = system(u, state)
            r = (lf * f_ext - f_int) * mask
            res = float(np.linalg.norm(r)) / fnorm
            if res <= tol:
                ok = True
                it_used = it
                break
            km = mask[:, None] * k_t * mask[None, :] + km_fix
            du = np.linalg.solve(km, r) * mask
            # Damped Newton (the plane driver's measured guard: the
            # consistent tangent is discontinuous at the yield
            # surface).
            s = 1.0
            best_s, best_res = 1.0, np.inf
            for _ in range(11):
                res_try = resid_norm(u + s * du, state, lf)
                if res_try < best_res:
                    best_s, best_res = s, res_try
                if res_try <= (1.0 - 1e-4 * s) * res:
                    break
                s *= 0.5
            u = u + best_s * du
        all_ok &= ok
        if not ok:
            # Pin (sigma, state) to the FINAL u (truss host rule).
            _, f_int, sig6, st = system(u, state)
            res = float(np.linalg.norm((lf * f_ext - f_int) * mask)) \
                / fnorm
        state = st
        vm = von_mises_6(sig6)
        rows["u"].append(u.copy())
        rows["sig"].append(sig6.mean(axis=1))
        rows["vm"].append(vm.mean(axis=1))
        rows["al"].append(state.alpha.mean(axis=1))
        rows["it"].append(it_used)
        rows["res"].append(res)
        rows["np_"].append(int(np.count_nonzero(
            np.any(state.alpha > alpha_prev, axis=1))))
    return SolidPlasticResult(
        load_factors=np.asarray(lfs, dtype=float),
        displacements=np.asarray(rows["u"]),
        stresses=np.asarray(rows["sig"]),
        von_mises=np.asarray(rows["vm"]),
        eq_plastic=np.asarray(rows["al"]),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
        n_plastic=np.asarray(rows["np_"], dtype=int),
    )


_DEVICE_CORE_CACHE: dict = {}


def _device_core(n_steps: int, ndof: int, nelm: int):
    """Jitted scan-over-steps driver, cached per structural signature
    (schedule bucket + sizes); schedule values, material, hardening
    and tolerances all traced (CLAUDE.md cache rule)."""
    key = (n_steps, ndof, nelm)
    core = _DEVICE_CORE_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    from ..ops.linalg import masked_solve

    @jax.jit
    def core(b, wdet, dm, mask, f_ext, lfs, young, poisson,
             sy, hi, hk, tol, max_iter, tangent_floor, min_denom):
        dtype = f_ext.dtype
        fnorm = jnp.maximum(jnp.linalg.norm(f_ext), min_denom)

        def system(u, state):
            ke, fe, sig6, st_new = solid_plastic_blocks(
                b, wdet, u[dm], state, young, poisson, sy, hi, hk,
                tangent_floor, xp=jnp)
            k = jnp.zeros((ndof, ndof), dtype).at[
                dm[:, :, None], dm[:, None, :]].add(ke)
            f_int = jnp.zeros(ndof, dtype).at[dm].add(fe)
            return k, f_int, sig6, st_new

        def newton_cond(carry):
            it, _, _, _, done = carry
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        def step(carry, lf):
            u0, state0 = carry

            def resid_of(u):
                _, f_int, _, _ = system(u, state0)
                return jnp.linalg.norm((lf * f_ext - f_int) * mask) \
                    / fnorm

            def newton_body(carry):
                it, u, st, res_prev, _ = carry
                k_t, f_int, _, st_new = system(u, state0)
                r = (lf * f_ext - f_int) * mask
                res = jnp.linalg.norm(r) / fnorm
                stalled = jnp.logical_and(res >= res_prev,
                                          res_prev <= jnp.sqrt(tol))
                done = jnp.logical_or(res <= tol, stalled)
                du = masked_solve(k_t, r, mask, assume_spd=False)

                def ls_cond(c):
                    s, res_try, _, _ = c
                    return jnp.logical_and(
                        res_try > (1.0 - 1e-4 * s) * res,
                        s > 2.0**-10)

                def ls_body(c):
                    s, _, best_s, best_res = c
                    s = s * 0.5
                    res_try = resid_of(u + s * du)
                    better = res_try < best_res
                    return (s, res_try,
                            jnp.where(better, s, best_s),
                            jnp.where(better, res_try, best_res))

                res1 = resid_of(u + du)
                s, res_try, best_s, best_res = jax.lax.while_loop(
                    ls_cond, ls_body,
                    (jnp.asarray(1.0, dtype), res1,
                     jnp.asarray(1.0, dtype), res1))
                accepted = res_try <= (1.0 - 1e-4 * s) * res
                s_use = jnp.where(accepted, s, best_s)
                u_new = jnp.where(done, u, u + s_use * du)
                return (it + jnp.where(done, 0, 1), u_new, st_new,
                        jnp.minimum(res, res_prev), done)

            init = (jnp.zeros((), jnp.int32), u0, state0,
                    jnp.asarray(jnp.inf, dtype), jnp.zeros((), bool))
            it, u, st, res, done = jax.lax.while_loop(
                newton_cond, newton_body, init)
            _, f_int, sig6, st = system(u, state0)
            res = jnp.linalg.norm((lf * f_ext - f_int) * mask) / fnorm
            vm = von_mises_6(sig6, xp=jnp)
            n_pl = jnp.sum(jnp.any(st.alpha > state0.alpha,
                                   axis=1).astype(jnp.int32))
            out = (u, sig6.mean(axis=1), vm.mean(axis=1),
                   st.alpha.mean(axis=1), it, res, res <= tol, n_pl)
            return (u, st), out

        state0 = initial_solid_state(nelm, xp=jnp, dtype=dtype)
        u0 = jnp.zeros(ndof, dtype)
        _, outs = jax.lax.scan(step, (u0, state0), lfs)
        return outs

    _DEVICE_CORE_CACHE[key] = core
    return core


def solve_solid_plastic(
    problem: SolidProblem,
    sigma_y,
    hardening_iso=0.0,
    hardening_kin=0.0,
    load_factors: Optional[Sequence[float]] = None,
    n_steps: int = 20,
    target_load_factor: float = 1.0,
    tol: float = 1e-9,
    max_iter: int = 30,
    tangent_floor: float = 1e-8,
    min_denom: float = 1e-12,
    host: Optional[bool] = None,
    bbar: bool = True,
) -> SolidPlasticResult:
    """Trace the elastoplastic 3D response along a load-factor history
    (see module docstring; args mirror solve_plane_plastic).  bbar
    defaults True — fully-integrated hex8 locks in J2 flow."""
    from .newton import DENSE_DOF_LIMIT
    from .plane_plasticity import _schedule

    lfs = _schedule(load_factors, target_load_factor, n_steps)
    sy, hi, hk = params_arrays(problem.nelm, sigma_y, hardening_iso,
                               hardening_kin)
    if host is None:
        host = problem.ndof <= DENSE_DOF_LIMIT
    if host:
        return _host_solve(problem, sy, hi, hk, lfs, tol, max_iter,
                           tangent_floor, min_denom, bool(bbar))

    import jax
    import jax.numpy as jnp

    dtype = jnp.asarray(1.0).dtype
    tol_dev = max(float(tol), 1e-5) if dtype == jnp.float32 \
        else float(tol)
    n = lfs.size
    n_pad = 1 << (n - 1).bit_length()
    lfs_pad = np.concatenate([lfs, np.full(n_pad - n, lfs[-1])])
    b, wdet = (gp_geometry3_bbar(problem) if bbar
               else gp_geometry3(problem))
    core = _device_core(n_pad, problem.ndof, problem.nelm)
    f_np = (problem.loads + _body_force_vectors3(problem)) \
        * problem.free_mask()
    outs = jax.device_get(core(
        jnp.asarray(b, dtype), jnp.asarray(wdet, dtype),
        jnp.asarray(problem.dof_map()),
        jnp.asarray(problem.free_mask(), dtype),
        jnp.asarray(f_np, dtype), jnp.asarray(lfs_pad, dtype),
        jnp.asarray(problem.young, dtype),
        jnp.asarray(problem.poisson, dtype),
        jnp.asarray(sy, dtype), jnp.asarray(hi, dtype),
        jnp.asarray(hk, dtype), jnp.asarray(tol_dev, dtype),
        jnp.asarray(max_iter, jnp.int32),
        jnp.asarray(tangent_floor, dtype),
        jnp.asarray(min_denom, dtype)))
    (u, sig, vm, al, iters, res, conv, n_pl) = (
        np.asarray(o)[:n] for o in outs)
    return SolidPlasticResult(
        load_factors=lfs,
        displacements=u.astype(float),
        stresses=sig.astype(float),
        von_mises=vm.astype(float),
        eq_plastic=al.astype(float),
        iterations=iters.astype(int),
        residuals=res.astype(float),
        converged=bool(np.all(conv)),
        n_plastic=n_pl.astype(int),
    )
