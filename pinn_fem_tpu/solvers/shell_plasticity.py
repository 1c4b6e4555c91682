"""Incremental elastoplastic statics for the flat-facet shell family:
load stepping + damped Newton with the consistent layered tangent
over the batched kernel of ops/shell_plastic.py.

This is solvers/plate_plasticity.py carried to MEMBRANE + BENDING
kinematics: eps(z) = eps_m + z*kappa at every facet Gauss point, so
yield couples the stress resultants N and M (the rectangular-section
interaction m + n^2 = 1 — ops/shell_plastic.py for the exact layered
algebra).  The SAME incremental doctrine (trial state from the
COMMITTED previous step, internal variables commit at step
convergence, residuals normalized by |f_ext|), the SAME damped-Newton
Armijo guard (the consistent tangent is discontinuous at the yield
surface), and the SAME two tiers:

  * HOST (numpy float64, zero device programs) below DENSE_DOF_LIMIT —
    the analysis-family serving doctrine (CLAUDE.md).
  * DEVICE: ONE jitted program — lax.scan over the load schedule with
    an inner Newton lax.while_loop; the (m, 4*N_layers) return-map
    batch and (m, 24, 24) tangent contractions tile onto the MXU; the
    schedule is padded to a power-of-two bucket so one compiled
    program serves every schedule length of a shape class.

Verification anchors (tests/test_shell_plastic.py): the closed-form
N-M interaction m + n^2 = 1 at the kernel level (machine precision
for even layers with the neutral axis on a layer boundary), flat-mesh
1:1 agreement with the plate family (pure bending never engages the
membrane), pure-membrane agreement with the plane family, the
combined-action capacity bracket at solver level, and host-device
agreement.

Reference citation: the reference has no shells and no material
nonlinearity (linear-elastic truss library, /root/reference/FEM/
python/fem/element.py); the JSON contract mirrors this framework's
own plate plastic block (io/plate_io.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..models.shell import (ShellProblem, _load_vectors_shell,
                            _require_no_thermal_shell)
from ..ops.plastic import params_arrays
from ..ops.shell_plastic import (initial_shell_state,
                                 shell_gp_geometry,
                                 shell_plastic_blocks)


class ShellPlasticResult(NamedTuple):
    load_factors: np.ndarray      # (n_steps,)
    displacements: np.ndarray     # (n_steps, ndof)
    membrane_forces: np.ndarray   # (n_steps, m, 3) gp-avg local N
    moments: np.ndarray           # (n_steps, m, 3) gp-avg local M
    von_mises: np.ndarray         # (n_steps, m) extreme-fiber/layer max
    eq_plastic: np.ndarray        # (n_steps, m) layer/gp-avg alpha
    iterations: np.ndarray        # (n_steps,)
    residuals: np.ndarray         # (n_steps,) final |R|/|f_ext|
    converged: bool
    n_plastic: np.ndarray         # (n_steps,) elements actively yielding


def _f_ext(problem: ShellProblem) -> np.ndarray:
    _require_no_thermal_shell(problem, "plasticity")
    return (problem.loads + _load_vectors_shell(problem)) \
        * problem.free_mask()


def _host_solve(problem: ShellProblem, sy, hi, hk, lfs, tol, max_iter,
                n_layers, tangent_floor, min_denom):
    dm = problem.dof_map()
    mask = problem.free_mask()
    f_ext = _f_ext(problem)
    fnorm = max(float(np.linalg.norm(f_ext)), min_denom)
    km_fix = np.diag(1.0 - mask)
    geo = shell_gp_geometry(problem)
    young, poisson, thick = (problem.young, problem.poisson,
                             problem.thickness)

    def system(u, state):
        ke, fe, nres, mom, vmf, st_new = shell_plastic_blocks(
            *geo, thick, u[dm], state, young, poisson, sy, hi, hk,
            n_layers, tangent_floor)
        k = np.zeros((problem.ndof, problem.ndof))
        np.add.at(k, (dm[:, :, None], dm[:, None, :]), ke)
        f_int = np.zeros(problem.ndof)
        np.add.at(f_int, dm, fe)
        return k, f_int, nres, mom, vmf, st_new

    def resid_norm(u, state, lf):
        _, f_int, _, _, _, _ = system(u, state)
        return float(np.linalg.norm((lf * f_ext - f_int) * mask)) \
            / fnorm

    u = np.zeros(problem.ndof)
    state = initial_shell_state(problem.nelm, n_layers)
    rows = {k: [] for k in ("u", "nf", "mom", "vm", "al", "it", "res",
                            "np_")}
    all_ok = True
    for lf in lfs:
        alpha_prev = state.alpha
        ok = False
        res = np.inf
        it_used = max_iter
        for it in range(max_iter):
            k_t, f_int, nres, mom, vmf, st = system(u, state)
            r = (lf * f_ext - f_int) * mask
            res = float(np.linalg.norm(r)) / fnorm
            if res <= tol:
                ok = True
                it_used = it
                break
            km = mask[:, None] * k_t * mask[None, :] + km_fix
            du = np.linalg.solve(km, r) * mask
            # Damped Newton (Armijo on |r|) — the yield-surface
            # tangent-discontinuity rule (solvers/plane_plasticity.py
            # for the measured rationale).
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
            # Pin (resultants, state) to the FINAL u (family rule).
            _, f_int, nres, mom, vmf, st = system(u, state)
            res = float(np.linalg.norm((lf * f_ext - f_int) * mask)) \
                / fnorm
        state = st
        rows["u"].append(u.copy())
        rows["nf"].append(nres)
        rows["mom"].append(mom)
        rows["vm"].append(vmf)
        rows["al"].append(state.alpha.mean(axis=1))
        rows["it"].append(it_used)
        rows["res"].append(res)
        rows["np_"].append(int(np.count_nonzero(
            np.any(state.alpha > alpha_prev, axis=1))))
    return ShellPlasticResult(
        load_factors=np.asarray(lfs, dtype=float),
        displacements=np.asarray(rows["u"]),
        membrane_forces=np.asarray(rows["nf"]),
        moments=np.asarray(rows["mom"]),
        von_mises=np.asarray(rows["vm"]),
        eq_plastic=np.asarray(rows["al"]),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
        n_plastic=np.asarray(rows["np_"], dtype=int),
    )


_DEVICE_CORE_CACHE: dict = {}


def _device_core(n_steps: int, ndof: int, nelm: int, n_layers: int):
    """Jitted scan-over-steps driver, cached per structural signature
    (schedule bucket + sizes) — material, hardening, schedule values
    and tolerances are all traced (CLAUDE.md: never key a jit cache
    on closure identity)."""
    key = (n_steps, ndof, nelm, n_layers)
    core = _DEVICE_CORE_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    from ..ops.linalg import masked_solve

    @jax.jit
    def core(t24, bm, bb, det, ks_e, kd_e, dm, mask, f_ext, lfs,
             young, poisson, thick, sy, hi, hk, tol, max_iter,
             tangent_floor, min_denom):
        dtype = f_ext.dtype
        fnorm = jnp.maximum(jnp.linalg.norm(f_ext), min_denom)

        def system(u, state):
            ke, fe, nres, mom, vmf, st_new = shell_plastic_blocks(
                t24, bm, bb, det, ks_e, kd_e, thick, u[dm], state,
                young, poisson, sy, hi, hk, n_layers, tangent_floor,
                xp=jnp)
            k = jnp.zeros((ndof, ndof), dtype).at[
                dm[:, :, None], dm[:, None, :]].add(ke)
            f_int = jnp.zeros(ndof, dtype).at[dm].add(fe)
            return k, f_int, nres, mom, vmf, st_new

        def newton_cond(carry):
            it, _, _, _, done = carry
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        def step(carry, lf):
            u0, state0 = carry

            def resid_of(u):
                _, f_int, _, _, _, _ = system(u, state0)
                return jnp.linalg.norm((lf * f_ext - f_int) * mask) \
                    / fnorm

            def newton_body(carry):
                it, u, st, res_prev, _ = carry
                k_t, f_int, _, _, _, st_new = system(u, state0)
                r = (lf * f_ext - f_int) * mask
                res = jnp.linalg.norm(r) / fnorm
                stalled = jnp.logical_and(res >= res_prev,
                                          res_prev <= jnp.sqrt(tol))
                done = jnp.logical_or(res <= tol, stalled)
                du = masked_solve(k_t, r, mask, assume_spd=False)

                def ls_cond(c):
                    s, res_try, _, _ = c
                    return jnp.logical_and(
                        res_try > (1.0 - 1e-4 * s) * res, s > 2.0**-10)

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
            _, f_int, nres, mom, vmf, st = system(u, state0)
            res = jnp.linalg.norm((lf * f_ext - f_int) * mask) / fnorm
            n_pl = jnp.sum(jnp.any(st.alpha > state0.alpha,
                                   axis=1).astype(jnp.int32))
            out = (u, nres, mom, vmf, st.alpha.mean(axis=1), it, res,
                   res <= tol, n_pl)
            return (u, st), out

        state0 = initial_shell_state(nelm, n_layers, xp=jnp,
                                     dtype=dtype)
        u0 = jnp.zeros(ndof, dtype)
        _, outs = jax.lax.scan(step, (u0, state0), lfs)
        return outs

    _DEVICE_CORE_CACHE[key] = core
    return core


def solve_shell_plastic(
    problem: ShellProblem,
    sigma_y,
    hardening_iso=0.0,
    hardening_kin=0.0,
    n_layers: int = 20,
    load_factors: Optional[Sequence[float]] = None,
    n_steps: int = 20,
    target_load_factor: float = 1.0,
    tol: float = 1e-9,
    max_iter: int = 30,
    tangent_floor: float = 1e-8,
    min_denom: float = 1e-12,
    host: Optional[bool] = None,
) -> ShellPlasticResult:
    """Trace the layered elastoplastic shell response along a
    load-factor history.

    Args:
        sigma_y, hardening_iso, hardening_kin: scalar or (nelm,) von
            Mises yield stress and linear hardening moduli (shared
            across Gauss points and layers).
        n_layers: through-thickness midpoint layers (EVEN — odd
            counts waste the z = 0 layer and lose the exact fully-
            plastic moment; ops/plate_plastic.py module docstring).
            The elastic bending rigidity is (1 - 1/N^2) D_b; the
            membrane rigidity is EXACT (Σ w = t for any N).
        load_factors: explicit history (cyclic, unloading —
            anything); default `ramp_schedule(target, n_steps)`.
        tol: force-residual tolerance relative to |f_ext|.
        host: run the float64 host tier.  Default: True below
            DENSE_DOF_LIMIT (the family serving doctrine).
    """
    from .newton import DENSE_DOF_LIMIT
    from .plane_plasticity import _schedule

    if int(n_layers) < 2 or int(n_layers) % 2:
        raise ValueError("n_layers must be an even count >= 2 "
                         "(ops/plate_plastic.py: midpoint layers give "
                         "the exact plastic moment only for even N)")
    lfs = _schedule(load_factors, target_load_factor, n_steps)
    sy, hi, hk = params_arrays(problem.nelm, sigma_y, hardening_iso,
                               hardening_kin)
    if host is None:
        host = problem.ndof <= DENSE_DOF_LIMIT
    if host:
        return _host_solve(problem, sy, hi, hk, lfs, tol, max_iter,
                           int(n_layers), tangent_floor, min_denom)

    import jax
    import jax.numpy as jnp

    dtype = jnp.asarray(1.0).dtype
    tol_dev = max(float(tol), 1e-5) if dtype == jnp.float32 \
        else float(tol)

    n = lfs.size
    n_pad = 1 << (n - 1).bit_length()
    lfs_pad = np.concatenate([lfs, np.full(n_pad - n, lfs[-1])])

    t24, bm, bb, det, ks_e, kd_e = shell_gp_geometry(problem)
    core = _device_core(n_pad, problem.ndof, problem.nelm,
                        int(n_layers))
    outs = jax.device_get(core(
        jnp.asarray(t24, dtype), jnp.asarray(bm, dtype),
        jnp.asarray(bb, dtype), jnp.asarray(det, dtype),
        jnp.asarray(ks_e, dtype), jnp.asarray(kd_e, dtype),
        jnp.asarray(problem.dof_map()),
        jnp.asarray(problem.free_mask(), dtype),
        jnp.asarray(_f_ext(problem), dtype),
        jnp.asarray(lfs_pad, dtype),
        jnp.asarray(problem.young, dtype),
        jnp.asarray(problem.poisson, dtype),
        jnp.asarray(problem.thickness, dtype),
        jnp.asarray(sy, dtype), jnp.asarray(hi, dtype),
        jnp.asarray(hk, dtype), jnp.asarray(tol_dev, dtype),
        jnp.asarray(max_iter, jnp.int32),
        jnp.asarray(tangent_floor, dtype),
        jnp.asarray(min_denom, dtype)))
    (u, nf, mom, vm, al, iters, res, conv, n_pl) = (
        np.asarray(o)[:n] for o in outs)
    return ShellPlasticResult(
        load_factors=lfs,
        displacements=u.astype(float),
        membrane_forces=nf.astype(float),
        moments=mom.astype(float),
        von_mises=vm.astype(float),
        eq_plastic=al.astype(float),
        iterations=iters.astype(int),
        residuals=res.astype(float),
        converged=bool(np.all(conv)),
        n_plastic=n_pl.astype(int),
    )
