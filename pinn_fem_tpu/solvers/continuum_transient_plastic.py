"""Explicit elastoplastic transient dynamics for the CONTINUUM
families: central difference with the radial return committed every
step, over the plane (CST/Q4, ops/plane_plastic.py) and solid (hex8,
ops/solid_plastic.py) Gauss-point kernels — the truss integrator
(solvers/plasticity.solve_transient_plastic) generalized to 2D/3D.

Same doctrine as the truss family, because it is the same algorithm:

  * each explicit step IS a committed strain increment (internal force
    is evaluated once per step), so the return map runs from the
    previous step's committed state and commits unconditionally;
  * the ELASTIC stable-dt bound applies unchanged — yielding only
    LOWERS the tangent modulus, so the elastic Gershgorin estimate is
    conservative;
  * Rayleigh damping: alpha on the (row-sum lumped) mass, beta on the
    INITIAL elastic stiffness K0 (tangent-K damping would jump
    discontinuously at yield);
  * energy bookkeeping is the test invariant:
    KE + SE_elastic + W_plastic = W_external to integrator accuracy.
    SE_elastic integrates the COMPLIANCE form 0.5 sigma : C^-1 : sigma
    at the Gauss points — it needs only the stress state, so one
    formula serves plane stress (sigma_zz = 0), plane strain / B-bar
    (sigma_zz from the return map) and the full 3D state.  W_plastic
    accumulates sigma . d(eps_p) in engineering Voigt (shear stress
    times engineering shear increment counts the tensor pair once —
    exactly the plastic power).

Tiers (the family convention): HOST float64 below DENSE_DOF_LIMIT,
one jitted lax.scan DEVICE program above (or host=False), both running
the LITERAL SAME xp-generic return-map kernels.  Yield/hardening
parameters are TRACED arguments of the device program (the geometry
arrays are closed over — they are fixed at problem construction), so
one compiled program serves every material of a shape class without
the stale-closure trap (CLAUDE.md cache rule).  The dense elastic K0
is only materialized when beta damping asks for it.

Sub-yield, the integrator must reproduce the ELASTIC central
difference exactly — tests/test_continuum_transient_plastic.py pins
that against an independent elastic recurrence, plus the energy
invariant and plastic dissipation positivity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..ops.plastic import params_arrays


class ContinuumPlasticTransientResult(NamedTuple):
    times: np.ndarray            # (n_rec,)
    displacements: np.ndarray    # (n_rec, n_probe)
    velocities: np.ndarray       # (n_rec, n_probe)
    kinetic_energy: np.ndarray   # (n_rec,)
    strain_energy: np.ndarray    # (n_rec,) ELASTIC (compliance form)
    plastic_work: np.ndarray     # (n_rec,) cumulative
    external_work: np.ndarray    # (n_rec,) cumulative
    von_mises_envelope: np.ndarray   # (nelm,) max gp vM over all steps
    final_displacement: np.ndarray   # (ndof,)
    final_eq_plastic: np.ndarray     # (nelm,) gp-mean alpha
    dt: float


def _se_compliance_plane(sig3, szz, young, poisson, wq, xp):
    """0.5 sigma : C^-1 : sigma integrated over the elements: plane
    stress and plane strain share it (szz is whatever the constraint
    produced)."""
    e = young[:, None]
    nu = poisson[:, None]
    sxx, syy, sxy = sig3[..., 0], sig3[..., 1], sig3[..., 2]
    g = e / (2.0 * (1.0 + nu))
    dens = (sxx ** 2 + syy ** 2 + szz ** 2
            - 2.0 * nu * (sxx * syy + syy * szz + szz * sxx)) \
        / (2.0 * e) + sxy ** 2 / (2.0 * g)
    return xp.sum(dens * wq)


def _se_compliance_solid(sig6, young, poisson, wq, xp):
    e = young[:, None]
    nu = poisson[:, None]
    sxx, syy, szz = sig6[..., 0], sig6[..., 1], sig6[..., 2]
    syz, sxz, sxy = sig6[..., 3], sig6[..., 4], sig6[..., 5]
    g = e / (2.0 * (1.0 + nu))
    dens = (sxx ** 2 + syy ** 2 + szz ** 2
            - 2.0 * nu * (sxx * syy + syy * szz + szz * sxx)) \
        / (2.0 * e) + (sxy ** 2 + syz ** 2 + sxz ** 2) / (2.0 * g)
    return xp.sum(dens * wq)


class _Family(NamedTuple):
    """Geometry/material arrays + xp-generic closures shared by the
    host loop and the jitted device core.  `force`, `wp_inc`, `se_of`,
    `vm_of` take xp-arrays and an (sy, hi, hk) mats tuple where
    relevant — material parameters stay TRACED on device."""

    tag: str
    ndof: int
    nelm: int
    dof_map: np.ndarray
    mask: np.ndarray
    loads: np.ndarray
    k0: np.ndarray               # dense elastic K (beta damping only)
    m_diag: np.ndarray           # row-sum lumped mass
    force: object                # (u_e, state, mats, xp) -> (fe, sig, st)
    wp_inc: object               # (sig, st_new, st_old, xp) -> scalar
    se_of: object                # (sig, xp) -> scalar
    vm_of: object                # (sig, xp) -> (nelm,)
    init_state: object           # (xp, dtype) -> state


def _plane_family(problem, bbar: Optional[bool]) -> _Family:
    """Standard or B-bar plane geometry (the statics default rule:
    B-bar for plane-strain Q4, where fully-integrated elements lock in
    incompressible flow)."""
    from ..models.plane import _body_force_vectors, plane_matrices
    from ..ops.plane_plastic import (gp_geometry, gp_geometry_bbar,
                                     initial_plane_state,
                                     plane_plastic_force,
                                     plane_plastic_force_bbar,
                                     von_mises_4)

    if bbar is None:
        bbar = problem.plane_strain and problem.nen == 4
    bbar = bool(bbar) and problem.plane_strain
    if bbar and problem.nen != 4:
        raise ValueError("B-bar needs Q4 elements — use a quad mesh "
                         "for incompressible plane-strain plasticity")
    b, wdet = (gp_geometry_bbar(problem) if bbar
               else gp_geometry(problem))
    b, wdet = np.asarray(b), np.asarray(wdet)
    ngp = wdet.shape[1]
    wq = problem.thickness[:, None] * wdet
    k, m = plane_matrices(problem)
    loads = problem.loads + _body_force_vectors(problem)
    young, poisson = problem.young, problem.poisson
    thick = problem.thickness
    ps = problem.plane_strain

    def force(u_e, state, mats, xp):
        sy, hi, hk = mats
        if bbar:
            fe, sig3, szz, st = plane_plastic_force_bbar(
                xp.asarray(b), xp.asarray(wdet), xp.asarray(thick),
                u_e, state, xp.asarray(young), xp.asarray(poisson),
                sy, hi, hk, xp=xp)
        else:
            fe, sig3, szz, st = plane_plastic_force(
                xp.asarray(b), xp.asarray(wdet), xp.asarray(thick),
                u_e, state, xp.asarray(young), xp.asarray(poisson),
                sy, hi, hk, ps, xp=xp)
        return fe, (sig3, szz), st

    def wp_inc(sig, st_new, st_old, xp):
        sig3, szz = sig
        sig4 = xp.concatenate(
            [sig3[..., :2], szz[..., None], sig3[..., 2:]], axis=-1)
        return xp.sum(sig4 * (st_new.eps_p - st_old.eps_p)
                      * xp.asarray(wq)[..., None])

    def se_of(sig, xp):
        sig3, szz = sig
        return _se_compliance_plane(sig3, szz, xp.asarray(young),
                                    xp.asarray(poisson),
                                    xp.asarray(wq), xp)

    def vm_of(sig, xp):
        sig3, szz = sig
        return von_mises_4(sig3, szz, xp=xp).max(axis=1)

    return _Family(
        tag=("plane-bbar" if bbar else f"plane-{problem.nen}-{ps}"),
        ndof=problem.ndof, nelm=problem.nelm,
        dof_map=problem.dof_map(), mask=problem.free_mask(),
        loads=loads, k0=k, m_diag=np.asarray(m).sum(axis=1),
        force=force, wp_inc=wp_inc, se_of=se_of, vm_of=vm_of,
        init_state=lambda xp, dtype: initial_plane_state(
            problem.nelm, ngp, xp=xp, dtype=dtype))


def _solid_family(problem) -> _Family:
    from ..models.solid import _body_force_vectors3, solid_matrices
    from ..ops.solid_plastic import (gp_geometry3, initial_solid_state,
                                     solid_plastic_force, von_mises_6)

    b, wdet = gp_geometry3(problem)
    b, wdet = np.asarray(b), np.asarray(wdet)
    wq = wdet
    k, m = solid_matrices(problem)
    loads = problem.loads + _body_force_vectors3(problem)
    young, poisson = problem.young, problem.poisson

    def force(u_e, state, mats, xp):
        sy, hi, hk = mats
        fe, sig6, st = solid_plastic_force(
            xp.asarray(b), xp.asarray(wdet), u_e, state,
            xp.asarray(young), xp.asarray(poisson), sy, hi, hk, xp=xp)
        return fe, sig6, st

    def wp_inc(sig6, st_new, st_old, xp):
        return xp.sum(sig6 * (st_new.eps_p - st_old.eps_p)
                      * xp.asarray(wq)[..., None])

    def se_of(sig6, xp):
        return _se_compliance_solid(sig6, xp.asarray(young),
                                    xp.asarray(poisson),
                                    xp.asarray(wq), xp)

    def vm_of(sig6, xp):
        return von_mises_6(sig6, xp=xp).max(axis=1)

    return _Family(
        tag="solid", ndof=problem.ndof, nelm=problem.nelm,
        dof_map=problem.dof_map(), mask=problem.free_mask(),
        loads=loads, k0=k, m_diag=np.asarray(m).sum(axis=1),
        force=force, wp_inc=wp_inc, se_of=se_of, vm_of=vm_of,
        init_state=lambda xp, dtype: initial_solid_state(
            problem.nelm, xp=xp, dtype=dtype))


def _host_run(fam: _Family, mats, dt, n_steps, amp, alpha_c, beta_c,
              record_every, probe):
    mask = fam.mask
    m = fam.m_diag * mask + (1.0 - mask)
    inv_m = np.where(m > 0, 1.0 / m, 0.0)
    loads = fam.loads * mask
    k0 = fam.k0 if beta_c else None
    dm = fam.dof_map
    dt2 = dt * dt

    u = np.zeros(fam.ndof)
    state = fam.init_state(np, None)
    w_p = w_ext = 0.0
    env = np.zeros(fam.nelm)
    a0 = inv_m * (amp[0] * loads) * mask
    u_prev = 0.5 * dt2 * a0

    recs = {k: [] for k in ("u", "v", "ke", "se", "wp", "we")}
    for i in range(n_steps):
        fe, sig, st_new = fam.force(u[dm], state, mats, np)
        f_int = np.zeros(fam.ndof)
        np.add.at(f_int, dm, fe)
        w_p += float(fam.wp_inc(sig, st_new, state, np))
        env = np.maximum(env, fam.vm_of(sig, np))
        state = st_new
        v_lag = (u - u_prev) / dt
        cu = alpha_c * (m * v_lag)
        if beta_c:
            cu = cu + beta_c * (k0 @ v_lag)
        fi = amp[i] * loads
        u_next = (2.0 * u - u_prev + dt2 * inv_m * (fi - f_int - cu)) \
            * mask
        w_ext += float(fi @ (u_next - u))
        u_prev, u = u, u_next
        if (i + 1) % record_every == 0:
            v = (u - u_prev) / dt
            # SE at the RECORDED u: one extra stress evaluation from
            # the committed state (not committed again).
            _, sig_r, _ = fam.force(u[dm], state, mats, np)
            recs["u"].append(u[probe].copy())
            recs["v"].append(v[probe].copy())
            recs["ke"].append(0.5 * float(np.sum(m * v * v)))
            recs["se"].append(float(fam.se_of(sig_r, np)))
            recs["wp"].append(w_p)
            recs["we"].append(w_ext)
    return recs, env, u, state


_DEVICE_CORE_CACHE: dict = {}


def _device_core(fam: _Family, problem, n_rec, record_every,
                 use_beta, mesh=None):
    """One jitted scan program per (problem identity, record
    signature).  Geometry and elastic-material arrays are closed over
    — fixed at problem construction; yield/hardening parameters, dt,
    damping and the amplitude history are TRACED.  The cache HOLDS the
    problem and its material arrays so a GC-recycled id can never
    alias a stale program onto a different problem (CLAUDE.md cache
    rule), and mutating young/poisson makes a fresh entry.

    mesh: optional jax.sharding.Mesh — ELEMENT-parallel SPMD: the
    Gauss-point force/return-map batch (the per-step FLOPs) is
    constrained to the mesh's "dp" axis via with_sharding_constraint;
    GSPMD partitions the geometry constants and the committed plastic
    state to match and inserts ONE psum per step for the scatter-add
    into the replicated displacement recurrence (the proof:
    __graft_entry__.dryrun_multichip, n-dev == 1-dev)."""
    mesh_key = None if mesh is None else (id(mesh),
                                          tuple(mesh.shape.items()))
    key = (fam.tag, id(problem), id(problem.young),
           id(problem.poisson), n_rec, record_every, use_beta,
           mesh_key)
    hit = _DEVICE_CORE_CACHE.get(key)
    if hit is not None:
        return hit[0]

    import jax
    import jax.numpy as jnp

    if mesh is None:
        def shard_elems(x):
            return x
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]
        n_shards = mesh.shape[axis]
        if fam.nelm % n_shards:
            raise ValueError(
                f"element count {fam.nelm} is not divisible by the "
                f"{n_shards}-way '{axis}' mesh axis — pad the mesh or "
                "pick a divisible element count")

        def shard_elems(x):
            spec = PartitionSpec(axis, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))

    # Structured fast path (ops/structured.py): on the canonical
    # rect/box grids both hot movements of the step — the element
    # gather and the force scatter — decompose into 2^d dense SLICES,
    # where the general random-index forms run near scalar rate on
    # TPU (measured 14.9 ms/step at 4096 elements before this).
    # Kept off the SPMD path: the grid slices assume the whole node
    # grid, while mesh= shards the element axis.
    gather = scatter = None
    if mesh is None:
        from ..ops.structured import (box_grid_of, make_plane_grid_ops,
                                      make_solid_grid_ops,
                                      rect_grid_of)

        nnode = problem.nodes.shape[0]
        if fam.dof_map.shape[1] == 8:
            g = rect_grid_of(problem.elements, nnode)
            if g is not None:
                gather, scatter = make_plane_grid_ops(*g)
        elif fam.dof_map.shape[1] == 24:
            g = box_grid_of(problem.elements, nnode)
            if g is not None:
                gather, scatter = make_solid_grid_ops(*g)

    dtype = jnp.asarray(1.0).dtype
    mask = jnp.asarray(fam.mask, dtype)
    m = jnp.asarray(fam.m_diag, dtype) * mask + (1.0 - mask)
    inv_m = jnp.where(m > 0, 1.0 / m, 0.0)
    loads = jnp.asarray(fam.loads, dtype) * mask
    k0 = jnp.asarray(fam.k0, dtype) if use_beta else None
    dm = jnp.asarray(fam.dof_map)
    ndof, nelm = fam.ndof, fam.nelm
    force, wp_inc = fam.force, fam.wp_inc
    se_of, vm_of, init_state = fam.se_of, fam.vm_of, fam.init_state

    @jax.jit
    def core(amp, sy, hi, hk, dt, alpha_c, beta_c, probe):
        dt2 = dt * dt
        n_total = amp.shape[0]
        mats = (sy, hi, hk)

        def f_int_of(u, state):
            u_e = (gather(u) if gather is not None
                   else shard_elems(u[dm]))
            fe, sig, st = force(u_e, state, mats, jnp)
            f = (scatter(fe) if scatter is not None
                 else jnp.zeros(ndof, dtype).at[dm].add(fe))
            return f, sig, st

        def one_step(i, carry):
            u, u_prev, state, w_p, w_ext, env = carry
            f_int, sig, st_new = f_int_of(u, state)
            w_p = w_p + wp_inc(sig, st_new, state, jnp)
            env = jnp.maximum(env, vm_of(sig, jnp))
            v_lag = (u - u_prev) / dt
            cu = alpha_c * (m * v_lag)
            if use_beta:
                cu = cu + beta_c * (k0 @ v_lag)
            fi = amp[jnp.minimum(i, n_total - 1)] * loads
            u_next = (2.0 * u - u_prev
                      + dt2 * inv_m * (fi - f_int - cu)) * mask
            w_ext = w_ext + jnp.dot(fi, u_next - u)
            return (u_next, u, st_new, w_p, w_ext, env)

        def chunk(carry, _):
            u, u_prev, state, w_p, w_ext, env, i0 = carry

            def body(j, c):
                return one_step(i0 + j, c)

            u, u_prev, state, w_p, w_ext, env = jax.lax.fori_loop(
                0, record_every, body,
                (u, u_prev, state, w_p, w_ext, env))
            v = (u - u_prev) / dt
            ke = 0.5 * jnp.sum(m * v * v)
            _, sig_r, _ = f_int_of(u, state)
            se = se_of(sig_r, jnp)
            return ((u, u_prev, state, w_p, w_ext, env,
                     i0 + record_every),
                    (u[probe], v[probe], ke, se, w_p, w_ext))

        state0 = jax.tree_util.tree_map(shard_elems,
                                        init_state(jnp, dtype))
        u0 = jnp.zeros(ndof, dtype)
        a0 = inv_m * (amp[0] * loads) * mask
        u_prev0 = 0.5 * dt2 * a0
        zero = jnp.zeros((), dtype)
        (u, _, state, _, _, env, _), recs = jax.lax.scan(
            chunk,
            (u0, u_prev0, state0, zero, zero,
             shard_elems(jnp.zeros(nelm, dtype)),
             jnp.zeros((), jnp.int32)),
            None, length=n_rec)
        us, vs, kes, ses, wps, wes = recs
        return (us, vs, kes, ses, wps, wes, env, u,
                state.alpha.mean(axis=1))

    _DEVICE_CORE_CACHE[key] = (core, (problem, problem.young,
                                      problem.poisson))
    return core


def _solve(fam: _Family, problem, sigma_y, hardening_iso,
           hardening_kin, dt, n_steps, amplitude, damping,
           record_every, probe_dofs, host, stable_dt_fn, mesh=None):
    from .newton import DENSE_DOF_LIMIT

    alpha_c, beta_c = (float(damping[0]), float(damping[1]))
    if dt is None:
        dt = stable_dt_fn(problem, damping=(alpha_c, beta_c))
    dt = float(dt)
    n_steps = int(n_steps)
    record_every = int(record_every)
    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    if problem.prescribed is not None and np.any(problem.prescribed):
        raise ValueError("transient supports homogeneous supports only")
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
    probe = (np.arange(fam.ndof) if probe_dofs is None
             else np.asarray(probe_dofs, dtype=int).reshape(-1))
    times = dt * record_every * (np.arange(n_rec) + 1.0)

    if host is None:
        host = mesh is None and fam.ndof <= DENSE_DOF_LIMIT
    if mesh is not None and host:
        raise ValueError("mesh= is the element-parallel DEVICE tier; "
                         "drop host=True")
    if host:
        recs, env, u, state = _host_run(
            fam, (sy, hi, hk), dt, n_steps, amp, alpha_c, beta_c,
            record_every, probe)
        return ContinuumPlasticTransientResult(
            times=times,
            displacements=np.asarray(recs["u"]),
            velocities=np.asarray(recs["v"]),
            kinetic_energy=np.asarray(recs["ke"]),
            strain_energy=np.asarray(recs["se"]),
            plastic_work=np.asarray(recs["wp"]),
            external_work=np.asarray(recs["we"]),
            von_mises_envelope=env,
            final_displacement=u,
            final_eq_plastic=state.alpha.mean(axis=1),
            dt=dt)

    import jax
    import jax.numpy as jnp

    core = _device_core(fam, problem, n_rec, record_every,
                        beta_c != 0.0, mesh=mesh)
    dtype = jnp.asarray(1.0).dtype
    outs = jax.device_get(core(
        jnp.asarray(amp, dtype), jnp.asarray(sy, dtype),
        jnp.asarray(hi, dtype), jnp.asarray(hk, dtype),
        jnp.asarray(dt, dtype), jnp.asarray(alpha_c, dtype),
        jnp.asarray(beta_c, dtype), jnp.asarray(probe, jnp.int32)))
    (us, vs, kes, ses, wps, wes, env, u_f, al_f) = (
        np.asarray(o) for o in outs)
    return ContinuumPlasticTransientResult(
        times=times,
        displacements=us.astype(float),
        velocities=vs.astype(float),
        kinetic_energy=kes.astype(float),
        strain_energy=ses.astype(float),
        plastic_work=wps.astype(float),
        external_work=wes.astype(float),
        von_mises_envelope=env.astype(float),
        final_displacement=u_f.astype(float),
        final_eq_plastic=al_f.astype(float),
        dt=dt)


def solve_plane_transient_plastic(
    problem,
    sigma_y,
    hardening_iso=0.0,
    hardening_kin=0.0,
    dt: Optional[float] = None,
    n_steps: int = 1000,
    amplitude: Optional[np.ndarray] = None,
    damping=(0.0, 0.0),
    record_every: int = 1,
    probe_dofs: Optional[np.ndarray] = None,
    host: Optional[bool] = None,
    bbar: Optional[bool] = None,
    mesh=None,
) -> ContinuumPlasticTransientResult:
    """Explicit elastoplastic transient on the plane continuum (module
    docstring).  bbar follows the statics default (True for
    plane-strain Q4); mesh= runs the element-parallel SPMD device
    tier (_device_core docstring)."""
    from ..models.plane import plane_stable_dt

    fam = _plane_family(problem, bbar)
    return _solve(fam, problem, sigma_y, hardening_iso, hardening_kin,
                  dt, n_steps, amplitude, damping, record_every,
                  probe_dofs, host, plane_stable_dt, mesh=mesh)


def solve_solid_transient_plastic(
    problem,
    sigma_y,
    hardening_iso=0.0,
    hardening_kin=0.0,
    dt: Optional[float] = None,
    n_steps: int = 1000,
    amplitude: Optional[np.ndarray] = None,
    damping=(0.0, 0.0),
    record_every: int = 1,
    probe_dofs: Optional[np.ndarray] = None,
    host: Optional[bool] = None,
    mesh=None,
) -> ContinuumPlasticTransientResult:
    """Explicit elastoplastic transient on the 3D solid (module
    docstring); mesh= runs the element-parallel SPMD device tier
    (_device_core docstring)."""
    from ..models.solid import solid_stable_dt

    fam = _solid_family(problem)
    return _solve(fam, problem, sigma_y, hardening_iso, hardening_kin,
                  dt, n_steps, amplitude, damping, record_every,
                  probe_dofs, host, solid_stable_dt, mesh=mesh)
