"""Incremental elastoplastic statics for the plane continuum family:
load stepping + Newton with the consistent tangent over the batched
J2 Gauss-point kernel (ops/plane_plastic.py).

This is the truss family's incremental driver (solvers/plasticity.py)
carried to 2D continua — round-3 VERDICT item #1.  The reference has
no plasticity of any kind (linear-elastic element library,
/root/reference/FEM/python/fem/element.py).  Tiers:

  * HOST (numpy float64, zero device programs) below DENSE_DOF_LIMIT —
    the serving default for small dense analyses (ops/host.py
    doctrine).  Because the constitutive kernel takes xp=np|jnp, the
    host tier runs the LITERAL SAME return-map code as the device
    tier; tests/test_plane_plastic.py pins the two 1:1 anyway.
  * DEVICE: ONE jitted program — lax.scan over the load schedule with
    an inner Newton lax.while_loop, the (m, ngp) return map and
    (m, 2nen, 2nen) tangent contractions batched onto the MXU, dense
    masked LU per iteration.  The schedule is padded to a power-of-two
    bucket (repeating the final factor, which converges in ~1
    iteration) so one compiled program serves every schedule length of
    a shape class (CLAUDE.md bucket rule).

Path dependence follows the standard backward-Euler incremental
doctrine: within a load step the trial state is the COMMITTED state of
the previous step, Newton iterates the displacement with return-mapped
stress + consistent tangent, internal variables commit only at step
convergence.  Residuals are normalized by the LOAD-PATTERN norm
|f_ext| (an unloading step ends at lf = 0 with residual self-stress —
the point of plasticity — and a step-scaled norm would be 0/0 there;
same rule as the truss driver).

Newton robustness: the plastic active set can flip within a step, so
the loop accepts non-monotone residuals until they are already small
(the sqrt(tol) stall guard measured on the truss family), and the
tangent solve uses LU — a perfectly-plastic tangent at a collapse
mechanism is singular up to the tangent_floor regularization and
float32 can render it indefinite.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..models.plane import PlaneProblem, _body_force_vectors
from ..ops.plane_plastic import (PlanePlasticState, gp_geometry,
                                 initial_plane_state,
                                 plane_plastic_blocks, von_mises_4)
from ..ops.plastic import params_arrays


class PlanePlasticResult(NamedTuple):
    load_factors: np.ndarray     # (n_steps,)
    displacements: np.ndarray    # (n_steps, ndof)
    stresses: np.ndarray         # (n_steps, m, 3) gp-avg Voigt
    sigma_zz: np.ndarray         # (n_steps, m) gp-avg out-of-plane
    von_mises: np.ndarray        # (n_steps, m) gp-avg
    eq_plastic: np.ndarray       # (n_steps, m) gp-avg alpha
    iterations: np.ndarray       # (n_steps,)
    residuals: np.ndarray        # (n_steps,) final |R|/|f_ext|
    converged: bool
    n_plastic: np.ndarray        # (n_steps,) elements actively yielding


def _schedule(load_factors, target, n_steps):
    from .plasticity import ramp_schedule

    if load_factors is None:
        load_factors = ramp_schedule(float(target), int(n_steps))
    lfs = np.asarray(load_factors, dtype=float).reshape(-1)
    if lfs.size == 0:
        raise ValueError("load_factors must be non-empty")
    return lfs


def _host_solve(problem: PlaneProblem, sy, hi, hk, lfs, tol, max_iter,
                tangent_floor, min_denom, bbar: bool):
    from ..ops.plane_plastic import (gp_geometry_bbar,
                                     plane_plastic_blocks_bbar)

    ngp = 1 if problem.nen == 3 else 4
    dm = problem.dof_map()
    mask = problem.free_mask()
    f_ext = (problem.loads + _body_force_vectors(problem)) * mask
    fnorm = max(float(np.linalg.norm(f_ext)), min_denom)
    km_fix = np.diag(1.0 - mask)
    young, poisson, thick = (problem.young, problem.poisson,
                             problem.thickness)

    if bbar:
        b, wdet = gp_geometry_bbar(problem)

        def blocks(u_e, state):
            return plane_plastic_blocks_bbar(
                b, wdet, thick, u_e, state, young, poisson, sy, hi,
                hk, tangent_floor)
    else:
        b, wdet = gp_geometry(problem)

        def blocks(u_e, state):
            return plane_plastic_blocks(
                b, wdet, thick, u_e, state, young, poisson, sy, hi,
                hk, problem.plane_strain, tangent_floor)

    def system(u, state):
        ke, fe, sig3, szz, st_new = blocks(u[dm], state)
        k = np.zeros((problem.ndof, problem.ndof))
        np.add.at(k, (dm[:, :, None], dm[:, None, :]), ke)
        f_int = np.zeros(problem.ndof)
        np.add.at(f_int, dm, fe)
        return k, f_int, sig3, szz, st_new

    def resid_norm(u, state, lf):
        """|lf f_ext - f_int(u)| / |f_ext| — the line-search probe
        (reuses system; the tangent blocks it also builds are ~the
        same O(m ngp 64) einsum cost, acceptable at host-tier
        sizes)."""
        _, f_int, _, _, _ = system(u, state)
        return float(np.linalg.norm((lf * f_ext - f_int) * mask)) / fnorm

    u = np.zeros(problem.ndof)
    state = initial_plane_state(problem.nelm, ngp)
    rows = {k: [] for k in ("u", "sig", "szz", "vm", "al", "it", "res",
                            "np_")}
    all_ok = True
    for lf in lfs:
        alpha_prev = state.alpha
        ok = False
        res = np.inf
        it_used = max_iter
        for it in range(max_iter):
            k_t, f_int, sig3, szz, st = system(u, state)
            r = (lf * f_ext - f_int) * mask
            res = float(np.linalg.norm(r)) / fnorm
            if res <= tol:
                ok = True
                it_used = it
                break
            km = mask[:, None] * k_t * mask[None, :] + km_fix
            du = np.linalg.solve(km, r) * mask
            # Damped Newton (Armijo on |r|): the consistent tangent is
            # DISCONTINUOUS at the yield surface — a step that starts
            # exactly on it (every converged plastic step does) picks
            # the much-softer plastic branch, and an undamped elastic-
            # unloading update overshoots to REVERSE yield and
            # zig-zags without converging (measured on the uniaxial
            # strip's load/unload history).  K is the exact Jacobian
            # a.e., so backtracking restores global convergence; the
            # full step is kept as fallback for the legitimate
            # residual-must-rise active-set flips.
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
            # Pin (sigma, state) to the FINAL u — the loop updates u
            # after assembling (the truss host tier's rule, ADVICE r3).
            _, f_int, sig3, szz, st = system(u, state)
            res = float(np.linalg.norm((lf * f_ext - f_int) * mask)) \
                / fnorm
        state = st
        vm = von_mises_4(sig3, szz)
        rows["u"].append(u.copy())
        rows["sig"].append(sig3.mean(axis=1))
        rows["szz"].append(szz.mean(axis=1))
        rows["vm"].append(vm.mean(axis=1))
        rows["al"].append(state.alpha.mean(axis=1))
        rows["it"].append(it_used)
        rows["res"].append(res)
        rows["np_"].append(int(np.count_nonzero(
            np.any(state.alpha > alpha_prev, axis=1))))
    return PlanePlasticResult(
        load_factors=np.asarray(lfs, dtype=float),
        displacements=np.asarray(rows["u"]),
        stresses=np.asarray(rows["sig"]),
        sigma_zz=np.asarray(rows["szz"]),
        von_mises=np.asarray(rows["vm"]),
        eq_plastic=np.asarray(rows["al"]),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
        n_plastic=np.asarray(rows["np_"], dtype=int),
    )


_DEVICE_CORE_CACHE: dict = {}


def _device_core(n_steps: int, nen: int, ndof: int, nelm: int,
                 plane_strain: bool, bbar: bool):
    """Jitted scan-over-steps driver, cached per structural signature
    (schedule bucket + element class + sizes) — shapes are static
    under jit; schedule values, material, hardening and tolerances are
    all traced (CLAUDE.md: never key a jit cache on closure
    identity)."""
    key = (n_steps, nen, ndof, nelm, plane_strain, bbar)
    core = _DEVICE_CORE_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    from ..ops.linalg import masked_solve
    from ..ops.plane_plastic import plane_plastic_blocks_bbar

    ngp = 1 if nen == 3 else 4

    @jax.jit
    def core(b, wdet, dm, mask, f_ext, lfs, young, poisson, thick,
             sy, hi, hk, tol, max_iter, tangent_floor, min_denom):
        dtype = f_ext.dtype
        fnorm = jnp.maximum(jnp.linalg.norm(f_ext), min_denom)

        def system(u, state):
            if bbar:
                ke, fe, sig3, szz, st_new = plane_plastic_blocks_bbar(
                    b, wdet, thick, u[dm], state, young, poisson, sy,
                    hi, hk, tangent_floor, xp=jnp)
            else:
                ke, fe, sig3, szz, st_new = plane_plastic_blocks(
                    b, wdet, thick, u[dm], state, young, poisson, sy,
                    hi, hk, plane_strain, tangent_floor, xp=jnp)
            k = jnp.zeros((ndof, ndof), dtype).at[
                dm[:, :, None], dm[:, None, :]].add(ke)
            f_int = jnp.zeros(ndof, dtype).at[dm].add(fe)
            return k, f_int, sig3, szz, st_new

        def newton_cond(carry):
            it, _, _, _, done = carry
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        def step(carry, lf):
            u0, state0 = carry

            def resid_of(u):
                # f_int-only probe: XLA dead-code-eliminates the
                # unused tangent blocks, so this costs one strain
                # sweep + return map + scatter.
                _, f_int, _, _, _ = system(u, state0)
                return jnp.linalg.norm((lf * f_ext - f_int) * mask) \
                    / fnorm

            def newton_body(carry):
                it, u, st, res_prev, _ = carry
                k_t, f_int, _, _, st_new = system(u, state0)
                r = (lf * f_ext - f_int) * mask
                res = jnp.linalg.norm(r) / fnorm
                # Stall stop only inside sqrt(tol) (the truss
                # driver's measured float32-floor rule).
                stalled = jnp.logical_and(res >= res_prev,
                                          res_prev <= jnp.sqrt(tol))
                done = jnp.logical_or(res <= tol, stalled)
                du = masked_solve(k_t, r, mask, assume_spd=False)

                # Damped Newton (Armijo backtracking on |r|): the
                # consistent tangent is discontinuous at the yield
                # surface — a step starting exactly on it (every
                # converged plastic step) picks the softer plastic
                # branch and an undamped elastic-unloading update
                # overshoots to reverse yield and zig-zags (measured;
                # same guard as the host tier).
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
            # Final evaluation pins (sigma, state) to the FINAL u.
            _, f_int, sig3, szz, st = system(u, state0)
            res = jnp.linalg.norm((lf * f_ext - f_int) * mask) / fnorm
            vm = von_mises_4(sig3, szz, xp=jnp)
            n_pl = jnp.sum(jnp.any(st.alpha > state0.alpha,
                                   axis=1).astype(jnp.int32))
            out = (u, sig3.mean(axis=1), szz.mean(axis=1),
                   vm.mean(axis=1), st.alpha.mean(axis=1), it, res,
                   res <= tol, n_pl)
            return (u, st), out

        state0 = initial_plane_state(nelm, ngp, xp=jnp, dtype=dtype)
        u0 = jnp.zeros(ndof, dtype)
        _, outs = jax.lax.scan(step, (u0, state0), lfs)
        return outs

    _DEVICE_CORE_CACHE[key] = core
    return core


def solve_plane_plastic(
    problem: PlaneProblem,
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
    bbar: Optional[bool] = None,
) -> PlanePlasticResult:
    """Trace the elastoplastic plane-continuum response along a
    load-factor history.

    Args:
        sigma_y, hardening_iso, hardening_kin: scalar or (nelm,) von
            Mises yield stress and linear hardening moduli (shared
            across the element's Gauss points).
        load_factors: explicit history (cyclic, unloading — anything);
            default `ramp_schedule(target_load_factor, n_steps)`.
        tol: force-residual tolerance relative to |f_ext| (module
            docstring for why not the step-scaled load).
        host: run the float64 host tier.  Default: True below
            DENSE_DOF_LIMIT — the serving convention of every small
            dense analysis.
        bbar: mean-dilatation B-bar elements (plane-strain Q4 only).
            Default True there — fully-integrated Q4 locks
            volumetrically in incompressible J2 flow and overshoots
            limit loads unboundedly (ops/plane_plastic.py:
            gp_geometry_bbar for the measured evidence); sub-yield
            elastic results then differ O(h^2) from the fully-
            integrated linear element, converging to the same
            continuum solution.  Plane stress never locks (sigma_zz =
            0 relieves the constraint) and ignores the flag.
    """
    from .newton import DENSE_DOF_LIMIT

    lfs = _schedule(load_factors, target_load_factor, n_steps)
    sy, hi, hk = params_arrays(problem.nelm, sigma_y, hardening_iso,
                               hardening_kin)
    if bbar is None:
        bbar = problem.plane_strain and problem.nen == 4
    bbar = bool(bbar) and problem.plane_strain
    if bbar and problem.nen != 4:
        raise ValueError("B-bar needs Q4 elements — CST has a single "
                         "strain point (use a quad mesh for "
                         "incompressible plane-strain plasticity)")
    if host is None:
        host = problem.ndof <= DENSE_DOF_LIMIT
    if host:
        return _host_solve(problem, sy, hi, hk, lfs, tol, max_iter,
                           tangent_floor, min_denom, bbar)

    import jax
    import jax.numpy as jnp

    dtype = jnp.asarray(1.0).dtype
    # float32 device floor (the truss driver's measured ~5e-6 rule).
    tol_dev = max(float(tol), 1e-5) if dtype == jnp.float32 else float(tol)

    n = lfs.size
    n_pad = 1 << (n - 1).bit_length()
    lfs_pad = np.concatenate([lfs, np.full(n_pad - n, lfs[-1])])

    if bbar:
        from ..ops.plane_plastic import gp_geometry_bbar

        b, wdet = gp_geometry_bbar(problem)
    else:
        b, wdet = gp_geometry(problem)
    core = _device_core(n_pad, problem.nen, problem.ndof, problem.nelm,
                        problem.plane_strain, bbar)
    f_np = (problem.loads + _body_force_vectors(problem)) \
        * problem.free_mask()
    outs = jax.device_get(core(
        jnp.asarray(b, dtype), jnp.asarray(wdet, dtype),
        jnp.asarray(problem.dof_map()),
        jnp.asarray(problem.free_mask(), dtype),
        jnp.asarray(f_np, dtype), jnp.asarray(lfs_pad, dtype),
        jnp.asarray(problem.young, dtype),
        jnp.asarray(problem.poisson, dtype),
        jnp.asarray(problem.thickness, dtype),
        jnp.asarray(sy, dtype), jnp.asarray(hi, dtype),
        jnp.asarray(hk, dtype), jnp.asarray(tol_dev, dtype),
        jnp.asarray(max_iter, jnp.int32),
        jnp.asarray(tangent_floor, dtype),
        jnp.asarray(min_denom, dtype)))
    (u, sig, szz, vm, al, iters, res, conv, n_pl) = (
        np.asarray(o)[:n] for o in outs)
    return PlanePlasticResult(
        load_factors=lfs,
        displacements=u.astype(float),
        stresses=sig.astype(float),
        sigma_zz=szz.astype(float),
        von_mises=vm.astype(float),
        eq_plastic=al.astype(float),
        iterations=iters.astype(int),
        residuals=res.astype(float),
        converged=bool(np.all(conv)),
        n_plastic=n_pl.astype(int),
    )
