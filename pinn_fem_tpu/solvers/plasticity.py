"""Incremental elastoplastic statics: load stepping + Newton with the
algorithmic tangent, over the radial-return truss kernel (ops/plastic.py).

Material nonlinearity does not exist in the reference in any form (its
element library is linear elastic, /root/reference/FEM/python/fem/
element.py); this family extends the framework exactly like the dynamics
family did, on both execution tiers:

  * HOST tier (numpy float64, zero device programs) below
    DENSE_DOF_LIMIT — the serving default, like every small dense
    analysis (see ops/host.py's module docstring for why: per-program
    remote TPU compiles cost minutes while the FLOPs cost microseconds).
  * DEVICE tier: ONE jitted program — lax.scan over the load schedule
    with an inner Newton lax.while_loop — so a 100-step cyclic history
    is a single XLA launch.  The load schedule is padded to a power-of-
    two bucket (repeating the final factor, which converges in zero
    iterations) so one compiled program serves every schedule length of
    a shape class (CLAUDE.md bucket rule).

Path dependence is handled the standard backward-Euler way: within a load
step the trial state is the COMMITTED state of the previous step, Newton
iterates on the displacement with the return-mapped stress and consistent
tangent, and the internal variables commit only at step convergence.
Because the consistent tangent of linear hardening is piecewise constant,
Newton converges in 1 iteration per elastic/plastic regime and needs one
extra iteration per element set that changes regime within a step.

Residuals are normalized by the LOAD PATTERN norm |f_ext|, not the step's
|lf * f_ext|: an unloading step ends at lf = 0 with residual self-stress
(the whole point of plasticity) and a step-scaled norm would be 0/0 there.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import TrussProblem
from ..ops.linalg import masked_solve
from ..ops.plastic import (PlasticParams, PlasticState,
                           assemble_plastic_system, params_arrays)


class PlasticStaticResult(NamedTuple):
    load_factors: np.ndarray    # (n_steps,)
    displacements: np.ndarray   # (n_steps, ndof)
    stresses: np.ndarray        # (n_steps, nelm) return-mapped axial stress
    plastic_strain: np.ndarray  # (n_steps, nelm) eps_p
    alpha: np.ndarray           # (n_steps, nelm) accumulated plastic strain
    back_stress: np.ndarray     # (n_steps, nelm) kinematic center q
    iterations: np.ndarray      # (n_steps,) Newton iterations per step
    residuals: np.ndarray       # (n_steps,) final |R|/|f_ext| per step
    converged: bool             # every step converged
    n_plastic: np.ndarray       # (n_steps,) elements actively yielding


def ramp_schedule(target: float, n_steps: int) -> np.ndarray:
    """Proportional ramp 0 -> target in n_steps equal increments."""
    return np.linspace(target / n_steps, target, n_steps)


def _host_solve(problem, sy, hi, hk, lfs, tol, max_iter, tangent_floor,
                min_denom):
    from ..ops import host as H

    mask = H.host_masks(problem)
    f_ext = np.asarray(problem.loads, dtype=np.float64) * mask
    fnorm = max(float(np.linalg.norm(f_ext)), min_denom)
    km_fix = np.diag(1.0 - mask)
    nelm = problem.nelm

    u = np.zeros(problem.ndof)
    eps_p = np.zeros(nelm)
    alpha = np.zeros(nelm)
    back = np.zeros(nelm)

    rows = {k: [] for k in ("u", "sig", "ep", "al", "bk", "it", "res", "np_")}
    all_ok = True
    for lf in lfs:
        alpha_prev = alpha
        ok = False
        sigma = None
        st = (eps_p, alpha, back)
        res = np.inf
        it_used = max_iter
        for it in range(max_iter):
            k_t, f_int, sigma, st = H.host_plastic_system(
                problem, u, eps_p, alpha, back, sy, hi, hk,
                load_factor=lf, tangent_floor=tangent_floor)
            r = (lf * f_ext - f_int) * mask
            res = float(np.linalg.norm(r)) / fnorm
            if res <= tol:
                ok = True
                it_used = it
                break
            km = mask[:, None] * k_t * mask[None, :] + km_fix
            u = u + np.linalg.solve(km, r) * mask
        all_ok &= ok
        if not ok:
            # The loop body updates u AFTER assembling, so on max_iter
            # exhaustion sigma/st lag the final u by one update.  Re-pin
            # them at the final u — the device tier (_device_core) does
            # the same final evaluation, and the 1:1 host/device mirror
            # must agree on non-converged steps too (ADVICE r3).
            _, f_int, sigma, st = H.host_plastic_system(
                problem, u, eps_p, alpha, back, sy, hi, hk,
                load_factor=lf, tangent_floor=tangent_floor)
            res = float(np.linalg.norm((lf * f_ext - f_int) * mask)) / fnorm
        # Commit: st/sigma were evaluated at the CURRENT u (top of the
        # loop body), so on break they are the converged-state values.
        eps_p, alpha, back = st
        rows["u"].append(u.copy())
        rows["sig"].append(sigma.copy())
        rows["ep"].append(eps_p.copy())
        rows["al"].append(alpha.copy())
        rows["bk"].append(back.copy())
        rows["it"].append(it_used)
        rows["res"].append(res)
        rows["np_"].append(int(np.count_nonzero(alpha > alpha_prev)))
    return PlasticStaticResult(
        load_factors=np.asarray(lfs, dtype=float),
        displacements=np.asarray(rows["u"]),
        stresses=np.asarray(rows["sig"]),
        plastic_strain=np.asarray(rows["ep"]),
        alpha=np.asarray(rows["al"]),
        back_stress=np.asarray(rows["bk"]),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
        n_plastic=np.asarray(rows["np_"], dtype=int),
    )


class PlasticTransientResult(NamedTuple):
    times: np.ndarray           # (n_rec,) record instants
    displacements: np.ndarray   # (n_rec, n_probe)
    velocities: np.ndarray      # (n_rec, n_probe)
    kinetic_energy: np.ndarray  # (n_rec,)
    strain_energy: np.ndarray   # (n_rec,) ELASTIC stored energy
    plastic_work: np.ndarray    # (n_rec,) cumulative int sigma deps_p dV
    external_work: np.ndarray   # (n_rec,) cumulative f_ext . du
    stress_envelope: np.ndarray  # (nelm,) max |sigma| over all steps
    final_displacement: np.ndarray   # (ndof,)
    final_plastic_strain: np.ndarray  # (nelm,)
    final_alpha: np.ndarray     # (nelm,)
    dt: float


def solve_transient_plastic(
    problem: TrussProblem,
    sigma_y,
    hardening_iso=0.0,
    hardening_kin=0.0,
    dt: Optional[float] = None,
    n_steps: int = 1000,
    amplitude: Optional[np.ndarray] = None,
    damping=(0.0, 0.0),
    record_every: int = 1,
    probe_dofs: Optional[np.ndarray] = None,
    tangent_floor: float = 1e-8,
    host: Optional[bool] = None,
    data=None,
) -> PlasticTransientResult:
    """Explicit central-difference transient with elastoplastic elements.

    Each step IS a committed strain increment (explicit integration
    evaluates internal force once per step), so the radial return runs
    from the previous step's committed state and commits unconditionally
    — the standard explicit elastoplastic update.  The elastic stable-dt
    bound applies unchanged: yielding only LOWERS the tangent modulus,
    so the elastic Courant estimate (dynamics.stable_dt) is conservative.

    Rayleigh damping: alpha on the mass, beta on the INITIAL elastic
    stiffness K0 (the standard explicit-dynamics convention for
    nonlinear materials — the tangent K would make damping jump
    discontinuously at yield; cf. solvers/dynamics.py's identical
    convention for geometric nonlinearity).

    Energy bookkeeping (the test invariant): KE + SE_elastic +
    W_plastic = W_external to integrator accuracy, where W_plastic =
    int sigma deps_p dV is the total plastic work (dissipation plus the
    energy stored in hardening) and W_external accumulates
    f(t_n) . (u_{n+1} - u_n) at the force of the step being advanced.

    Returns probe histories, cumulative energies, the per-element
    |stress| envelope, and the final internal-variable state (residual
    deformation = final_displacement at zero load).
    """
    from .dynamics import stable_dt
    from ..ops import host as H

    alpha_c, beta_c = (float(damping[0]), float(damping[1]))
    if dt is None:
        # Forward the damping: stiffness-proportional (beta) Rayleigh
        # damping SHRINKS the central-difference limit and an undamped
        # bound would be unstable (stable_dt's docstring; ADVICE r3).
        dt = stable_dt(problem, data=data, damping=(alpha_c, beta_c))
    dt = float(dt)
    n_steps = int(n_steps)
    record_every = int(record_every)
    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    n_rec = n_steps // record_every

    if amplitude is None:
        amp = np.ones(n_steps)
    else:
        amp = np.asarray(amplitude, dtype=float).reshape(-1)
        if amp.size != n_steps:
            raise ValueError(f"amplitude must have n_steps={n_steps} "
                             f"entries, got {amp.size}")
    sy, hi, hk = params_arrays(problem.nelm, sigma_y, hardening_iso,
                               hardening_kin)
    probe = (np.arange(problem.ndof) if probe_dofs is None
             else np.asarray(probe_dofs, dtype=int).reshape(-1))
    times = dt * record_every * (np.arange(n_rec) + 1.0)

    from .newton import DENSE_DOF_LIMIT

    if host is None:
        host = problem.ndof <= DENSE_DOF_LIMIT and data is None

    if host:
        dof_map, gvec, inv_len, _ = H._geometry(problem)
        young, area = H.material_values_host(problem)
        mask = H.host_masks(problem)
        m = H.host_lumped_mass(problem) * mask + (1.0 - mask)
        inv_m = np.where(m > 0, 1.0 / m, 0.0)
        k0 = H.host_stiffness(problem) if beta_c else None
        loads = H.loads_of(problem, data) * mask
        vol = area / inv_len                      # A * L0 per element

        u = np.zeros(problem.ndof)
        eps_p = np.zeros(problem.nelm)
        al = np.zeros(problem.nelm)
        bk = np.zeros(problem.nelm)
        w_p = w_ext = 0.0
        env = np.zeros(problem.nelm)
        dt2 = dt * dt

        def f_int_of(u_v, ep, a_v, b_v):
            eps = np.sum(gvec * u_v[dof_map], axis=-1) * inv_len
            sig, _, ep_n, a_n, b_n = H.host_return_map(
                eps, ep, a_v, b_v, young, sy, hi, hk)
            f = np.zeros(problem.ndof)
            np.add.at(f, dof_map, (area * sig)[:, None] * gvec)
            return f, sig, eps, ep_n, a_n, b_n

        # Consistent u_{-1} = u0 - dt v0 + dt^2/2 a0 with u0 = v0 = 0
        # (the same start as dynamics._central_run): the first update
        # then gives u_1 = dt^2/2 a0, the exact constant-acceleration
        # small-time limit.
        a0 = inv_m * (amp[0] * loads) * mask
        u_prev = 0.5 * dt2 * a0

        recs = {k: [] for k in ("u", "v", "ke", "se", "wp", "we")}
        for i in range(n_steps):
            f, sig, eps, ep_n, a_n, b_n = f_int_of(u, eps_p, al, bk)
            w_p += float(np.sum(sig * (ep_n - eps_p) * vol))
            env = np.maximum(env, np.abs(sig))
            eps_p, al, bk = ep_n, a_n, b_n
            v_lag = (u - u_prev) / dt
            cu = alpha_c * (m * v_lag)
            if beta_c:
                cu = cu + beta_c * (k0 @ v_lag)
            fi = amp[i] * loads
            u_next = (2.0 * u - u_prev + dt2 * inv_m * (fi - f - cu)) * mask
            w_ext += float(fi @ (u_next - u))
            u_prev, u = u, u_next
            if (i + 1) % record_every == 0:
                v = (u - u_prev) / dt
                se = 0.5 * float(np.sum(
                    young * (np.sum(gvec * u[dof_map], axis=-1) * inv_len
                             - eps_p) ** 2 * vol))
                recs["u"].append(u[probe].copy())
                recs["v"].append(v[probe].copy())
                recs["ke"].append(0.5 * float(np.sum(m * v * v)))
                recs["se"].append(se)
                recs["wp"].append(w_p)
                recs["we"].append(w_ext)
        return PlasticTransientResult(
            times=times,
            displacements=np.asarray(recs["u"]),
            velocities=np.asarray(recs["v"]),
            kinetic_energy=np.asarray(recs["ke"]),
            strain_energy=np.asarray(recs["se"]),
            plastic_work=np.asarray(recs["wp"]),
            external_work=np.asarray(recs["we"]),
            stress_envelope=env,
            final_displacement=u,
            final_plastic_strain=eps_p,
            final_alpha=al,
            dt=dt,
        )

    # ---- device tier: one jitted scan program -------------------------
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    core = _transient_device_core(n_rec, record_every, beta_c != 0.0)
    outs = jax.device_get(core(
        data, problem.material, jnp.asarray(amp, dtype),
        jnp.asarray(sy, dtype), jnp.asarray(hi, dtype),
        jnp.asarray(hk, dtype), jnp.asarray(dt, dtype),
        jnp.asarray(alpha_c, dtype), jnp.asarray(beta_c, dtype),
        jnp.asarray(probe, jnp.int32)))
    (us, vs, kes, ses, wps, wes, env, u_f, ep_f, al_f) = (
        np.asarray(o) for o in outs)
    return PlasticTransientResult(
        times=times,
        displacements=us.astype(float),
        velocities=vs.astype(float),
        kinetic_energy=kes.astype(float),
        strain_energy=ses.astype(float),
        plastic_work=wps.astype(float),
        external_work=wes.astype(float),
        stress_envelope=env.astype(float),
        final_displacement=u_f.astype(float),
        final_plastic_strain=ep_f.astype(float),
        final_alpha=al_f.astype(float),
        dt=dt,
    )


_TRANSIENT_CORE_CACHE: dict = {}


def _transient_device_core(n_rec: int, record_every: int, use_beta: bool):
    """Jitted explicit elastoplastic integrator, cached per
    (record count, chunk, beta-damping) signature."""
    key = (n_rec, record_every, use_beta)
    core = _TRANSIENT_CORE_CACHE.get(key)
    if core is not None:
        return core

    from ..ops.assembly import material_values
    from ..ops.plastic import return_map
    from ..ops.scatter import segment_sum_dofs

    @jax.jit
    def core(data, material, amp, sy, hi, hk, dt, alpha_c, beta_c, probe):
        params = PlasticParams(sigma_y=sy, h_iso=hi, h_kin=hk)
        young, area = material_values(data, material, jnp.asarray(1.0,
                                                                  amp.dtype))
        from ..ops.mass import lumped_mass

        mask = data.free_mask
        m = lumped_mass(data, material) * mask + (1.0 - mask)
        inv_m = jnp.where(m > 0, 1.0 / m, 0.0)
        loads = data.loads * mask
        vol = area / data.inv_len
        s0 = young * area * data.inv_len          # elastic K0 coefficients
        dt2 = dt * dt
        n_total = amp.shape[0]

        def strain(u):
            return (jnp.sum(data.gvec * u[data.dof_map], axis=-1)
                    * data.inv_len)

        def k0_apply(v):
            gu = jnp.sum(data.gvec * v[data.dof_map], axis=-1)
            fe = (s0 * gu)[:, None] * data.gvec
            return segment_sum_dofs(fe, data.gather_map, data.dof_map)

        def one_step(i, u, u_prev, state, w_p, w_ext, env):
            eps = strain(u)
            sig, _, st_new = return_map(eps, state, young, params)
            fe = (area * sig)[:, None] * data.gvec
            f_int = segment_sum_dofs(fe, data.gather_map, data.dof_map)
            w_p = w_p + jnp.sum(sig * (st_new.eps_p - state.eps_p) * vol)
            env = jnp.maximum(env, jnp.abs(sig))
            v_lag = (u - u_prev) / dt
            cu = alpha_c * (m * v_lag)
            if use_beta:
                cu = cu + beta_c * k0_apply(v_lag)
            fi = amp[jnp.minimum(i, n_total - 1)] * loads
            u_next = (2.0 * u - u_prev
                      + dt2 * inv_m * (fi - f_int - cu)) * mask
            w_ext = w_ext + jnp.dot(fi, u_next - u)
            return u_next, u, st_new, w_p, w_ext, env

        def chunk(carry, _):
            u, u_prev, state, w_p, w_ext, env, i0 = carry

            def body(j, c):
                u, u_prev, st, w_p, w_ext, env = c
                return one_step(i0 + j, u, u_prev, st, w_p, w_ext, env)

            u, u_prev, state, w_p, w_ext, env = jax.lax.fori_loop(
                0, record_every, body,
                (u, u_prev, state, w_p, w_ext, env))
            v = (u - u_prev) / dt
            ke = 0.5 * jnp.sum(m * v * v)
            se = 0.5 * jnp.sum(young * (strain(u) - state.eps_p) ** 2 * vol)
            i_next = i0 + record_every
            return ((u, u_prev, state, w_p, w_ext, env, i_next),
                    (u[probe], v[probe], ke, se, w_p, w_ext))

        ndof = data.ndof
        nelm = data.nelm
        dtype = loads.dtype
        z = jnp.zeros(nelm, dtype=dtype)
        state0 = PlasticState(eps_p=z, alpha=z, back=z)
        u0 = jnp.zeros(ndof, dtype=dtype)
        # Consistent u_{-1} = u0 - dt v0 + dt^2/2 a0 with u0 = v0 = 0.
        a0 = inv_m * (amp[0] * loads) * mask
        u_prev0 = 0.5 * dt2 * a0
        zero = jnp.zeros((), dtype)
        (u, _, state, _, _, env, _), recs = jax.lax.scan(
            chunk,
            (u0, u_prev0, state0, zero, zero, jnp.zeros(nelm, dtype),
             jnp.zeros((), jnp.int32)),
            None, length=n_rec)
        us, vs, kes, ses, wps, wes = recs
        return us, vs, kes, ses, wps, wes, env, u, state.eps_p, state.alpha

    _TRANSIENT_CORE_CACHE[key] = core
    return core


_DEVICE_CORE_CACHE: dict = {}


def _device_core(n_steps: int):
    """Jitted scan-over-steps elastoplastic driver, cached per padded
    schedule length (shapes are static under jit; everything else —
    schedule values, hardening, tolerances — is traced)."""
    core = _DEVICE_CORE_CACHE.get(n_steps)
    if core is not None:
        return core

    @jax.jit
    def core(data, material, lfs, sy, hi, hk, tol, max_iter, tangent_floor,
             min_denom):
        params = PlasticParams(sigma_y=sy, h_iso=hi, h_kin=hk)
        mask = data.free_mask
        f_ext = data.loads * mask
        fnorm = jnp.maximum(jnp.linalg.norm(f_ext), min_denom)
        dtype = f_ext.dtype
        nelm = data.nelm

        def newton_cond(carry):
            it, _, _, res, done = carry
            return jnp.logical_and(it < max_iter, jnp.logical_not(done))

        def step(carry, lf):
            u0, state0 = carry

            def newton_body(carry):
                it, u, st, res_prev, _ = carry
                k_t, f_int, _, st_new = assemble_plastic_system(
                    data, material, u, state0, params, lf, tangent_floor)
                r = (lf * f_ext - f_int) * mask
                res = jnp.linalg.norm(r) / fnorm
                # Float32-floor stall stop, but ONLY once the residual is
                # already small (inside sqrt(tol)): plastic Newton is
                # legitimately non-monotone while the active set is still
                # changing — the residual RISES on the iteration where
                # elements first switch regime, and a blanket monotone-
                # acceptance rule (the elastic _nr_core_cg pattern) was
                # measured to abandon those steps at res ~ 0.7.
                stalled = jnp.logical_and(res >= res_prev,
                                          res_prev <= jnp.sqrt(tol))
                done = jnp.logical_or(res <= tol, stalled)
                # LU, not Cholesky: a near-floor plastic tangent can be
                # numerically indefinite in float32.
                du = masked_solve(k_t, r, mask, assume_spd=False)
                u_new = jnp.where(done, u, u + du)
                res_keep = jnp.minimum(res, res_prev)
                return (it + jnp.where(done, 0, 1), u_new, st_new,
                        res_keep, done)

            init = (jnp.zeros((), jnp.int32), u0, state0,
                    jnp.asarray(jnp.inf, dtype), jnp.zeros((), bool))
            it, u, st, res, done = jax.lax.while_loop(
                newton_cond, newton_body, init)
            # One final evaluation pins (sigma, state) to the FINAL u —
            # the loop's st lags u by one update on non-converged exits.
            _, f_int, sigma, st = assemble_plastic_system(
                data, material, u, state0, params, lf, tangent_floor)
            res = jnp.linalg.norm((lf * f_ext - f_int) * mask) / fnorm
            n_pl = jnp.sum((st.alpha > state0.alpha).astype(jnp.int32))
            out = (u, sigma, st.eps_p, st.alpha, st.back, it, res,
                   res <= tol, n_pl)
            return (u, st), out

        z = jnp.zeros(nelm, dtype=dtype)
        state0 = PlasticState(eps_p=z, alpha=z, back=z)
        u0 = jnp.zeros(data.ndof, dtype=dtype)
        _, outs = jax.lax.scan(step, (u0, state0), lfs)
        return outs

    _DEVICE_CORE_CACHE[n_steps] = core
    return core


def solve_elastoplastic(
    problem: TrussProblem,
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
    data=None,
) -> PlasticStaticResult:
    """Trace the elastoplastic response along a load-factor history.

    Args:
        sigma_y, hardening_iso, hardening_kin: scalar or (nelm,) yield
            stress and linear hardening moduli (ops/plastic.py for the
            constitutive model).
        load_factors: explicit history (cyclic loading, unloading —
            anything); default is a proportional ramp
            `ramp_schedule(target_load_factor, n_steps)`.
        tol: force-residual tolerance relative to the load-pattern norm
            |f_ext| (NOT the step's scaled load — see module docstring).
        host: run on the host tier (float64). Default: True below
            DENSE_DOF_LIMIT, matching the serving convention of every
            small dense analysis.
    """
    from .newton import DENSE_DOF_LIMIT

    if load_factors is None:
        load_factors = ramp_schedule(float(target_load_factor), int(n_steps))
    lfs = np.asarray(load_factors, dtype=float).reshape(-1)
    if lfs.size == 0:
        raise ValueError("load_factors must be non-empty")

    sy, hi, hk = params_arrays(problem.nelm, sigma_y, hardening_iso,
                               hardening_kin)
    if host is None:
        host = problem.ndof <= DENSE_DOF_LIMIT and data is None
    if host:
        # float64 host tolerance can be meaningfully tighter than the
        # device default; honor the caller's value as-is.
        return _host_solve(problem, sy, hi, hk, lfs, tol, max_iter,
                           tangent_floor, min_denom)

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    # float32 device floor: the force residual itself bottoms out near
    # eps32 * |K u| / |f| (measured ~5e-6 on the 10-bar cyclic history);
    # don't demand more than ~1e-5 relative.
    tol_dev = max(float(tol), 1e-5) if dtype == jnp.float32 else float(tol)

    n = lfs.size
    n_pad = 1 << (n - 1).bit_length()
    lfs_pad = np.concatenate([lfs, np.full(n_pad - n, lfs[-1])])

    core = _device_core(n_pad)
    outs = jax.device_get(core(
        data, problem.material, jnp.asarray(lfs_pad, dtype),
        jnp.asarray(sy, dtype), jnp.asarray(hi, dtype),
        jnp.asarray(hk, dtype),
        jnp.asarray(tol_dev, dtype), jnp.asarray(max_iter, jnp.int32),
        jnp.asarray(tangent_floor, dtype), jnp.asarray(min_denom, dtype)))
    (u, sigma, eps_p, alpha, back, iters, res, conv, n_pl) = (
        np.asarray(o)[:n] for o in outs)
    return PlasticStaticResult(
        load_factors=lfs,
        displacements=u.astype(float),
        stresses=sigma.astype(float),
        plastic_strain=eps_p.astype(float),
        alpha=alpha.astype(float),
        back_stress=back.astype(float),
        iterations=iters.astype(int),
        residuals=res.astype(float),
        converged=bool(np.all(conv)),
        n_plastic=n_pl.astype(int),
    )
