"""Transient structural dynamics: M u'' + C u' + K u = f(t), TPU-fused.

An extension beyond the reference (which has no mass matrix and never
evaluates density — SURVEY §7.3): explicit central-difference and
implicit Newmark-beta integrators whose ENTIRE time history runs as one
`lax.scan` program on device — no per-step host round trips, snapshots
preallocated as scan outputs (the same design that fuses the static
incremental solvers, solvers/fused.py).

Operator strategy mirrors solve_nr: the linear-kinematics stiffness is
CONSTANT, so it is assembled once — dense below DENSE_DOF_LIMIT (Newmark
then pre-factors its effective stiffness with one Cholesky, each step is
a pair of triangular solves), banded DIA above it (each Newmark step is a
warm-started fused-Pallas PCG solve; each explicit step is one stencil
matvec, 0.089 ms at 2M DOFs).  Rayleigh damping C = alpha M + beta K
preserves the band structure, so the Newmark effective operator
K + a0 M + a1 C = (1 + a1 beta) K + (a0 + a1 alpha) M stays DIA.

Boundary conditions by masking, as everywhere else in the framework.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import TrussProblem
from ..ops.assembly import assemble_system
from ..ops.mass import lumped_mass


class TransientResult(NamedTuple):
    times: np.ndarray        # (n_rec,) snapshot times
    displacements: np.ndarray  # (n_rec, n_probe) probed displacements
    velocities: np.ndarray   # (n_rec, n_probe)
    kinetic_energy: np.ndarray  # (n_rec,)
    strain_energy: np.ndarray   # (n_rec,)
    u_final: np.ndarray      # (ndof,) final displacement state
    v_final: np.ndarray      # (ndof,)


def _k_apply_fn(problem: TrussProblem, data):
    """Constant-K application closure: dense matmul below DENSE_DOF_LIMIT,
    banded DIA (Pallas-packed on TPU) above.

    CACHED on the problem: the closure is a STATIC argument of the jitted
    integrators, and static args hash by identity for functions — a fresh
    closure per solve_transient call would recompile the whole time loop
    every call (~35 s at 2M DOFs, measured; the actual step is 0.07 ms).
    Keyed on BOTH the data and the material object (a mutated
    problem.material must not reuse a stale K); holding the data
    reference also prevents id()-reuse aliasing.
    """
    return _k_apply_fn_prestressed(problem, data, None)


# Closure-cache capacity per problem: enough for a few live operator
# variants (plain + prestressed states, alternating in a serving loop)
# without unbounded growth; evicts oldest.
_K_CACHE_CAP = 4


def _k_apply_fn_prestressed(problem: TrussProblem, data, prestress_u):
    """Prestressed variant of _k_apply_fn.  A DICT keyed by the prestress
    identity — a single-slot cache thrashes when plain and prestressed
    transients alternate on the same problem (each call would rebuild the
    closure and recompile the fused time loop)."""
    cache = getattr(problem, "_k_apply_cache", None)
    if not isinstance(cache, dict):
        cache = problem._k_apply_cache = {}
    key = id(prestress_u) if prestress_u is not None else None
    entry = cache.get(key)
    if (entry is not None and entry[0] is data
            and entry[1] is problem.material
            and entry[2] is prestress_u):
        return entry[3]
    fn = _build_k_apply(problem, data, prestress_u)
    if len(cache) >= _K_CACHE_CAP:
        cache.pop(next(iter(cache)))
    cache[key] = (data, problem.material, prestress_u, fn)
    return fn


def _build_k_apply(problem: TrussProblem, data, prestress_u=None):
    from .newton import DENSE_DOF_LIMIT, _dia_layout_of

    material = problem.material
    dtype = data.loads.dtype
    zeros = jnp.zeros(problem.ndof, dtype)
    n_e = None
    if prestress_u is not None:
        from ..ops.geometric import element_axial_forces

        n_e = element_axial_forces(
            data, material, jnp.asarray(prestress_u, dtype))

    if problem.ndof <= DENSE_DOF_LIMIT:
        k = assemble_system(data, material, zeros)[0]
        if n_e is not None:
            from ..ops.geometric import assemble_geometric

            k = k + assemble_geometric(data, n_e)
        return lambda u: k @ u

    layout = _dia_layout_of(problem, data)
    if layout is None:
        if n_e is not None:
            raise ValueError("large-mesh prestressed dynamics requires a "
                             "banded (DIA) operator; renumber the mesh")
        from ..ops.cg import apply_stiffness, stiffness_coefficients

        s = stiffness_coefficients(data, material, 1.0)
        return lambda u: apply_stiffness(data, s, u)

    from ..ops.cg import stiffness_coefficients
    from ..ops.dia import assemble_dia, dia_matvec

    s = stiffness_coefficients(data, material, 1.0)
    diags = assemble_dia(layout, s, data.gvec)
    if n_e is not None:
        from ..ops.geometric import assemble_geometric_dia

        # K + K_g(u0) shares the stiffness sparsity: taut-string
        # transverse dynamics (wave speed c = sqrt(T/rho A)) ride the
        # same banded/Pallas path as unstressed meshes.
        diags = diags + assemble_geometric_dia(layout, data, n_e)
    if jax.default_backend() == "tpu":
        from ..ops.pallas.dia_kernel import (dia_matvec_packed,
                                             pack_dia_interleaved)

        packed = pack_dia_interleaved(layout, diags)
        return lambda u: dia_matvec_packed(layout, packed, u)
    return lambda u: dia_matvec(layout, diags, u)


def _nl_apply_fn(problem: TrussProblem, data):
    """(f_int, strain_energy) Green-Lagrange closures, cached like
    _k_apply_fn.  Matrix-free: only fe_int/e_gl of the element kernel are
    used (XLA dead-code-eliminates the tangent blocks).  State-dependent
    force cannot ride the constant-DIA path, so this uses the
    gather/scatter form — fine at the mesh sizes geometric nonlinearity
    targets (the static GL solver is dense-K anyway)."""
    cached = getattr(problem, "_nl_apply_cache", None)
    if (cached is not None and cached[0] is data
            and cached[1] is problem.material):
        return cached[2], cached[3]
    from ..ops.assembly import material_values
    from ..ops.elements import truss2d_green_lagrange_batch

    material = problem.material
    dim = data.dimension
    young, area = material_values(data, material, 1.0)
    dx0 = data.gvec[:, dim:] / data.inv_len[:, None]
    x0 = jnp.stack([data.mid - 0.5 * dx0, data.mid + 0.5 * dx0], axis=1)
    zeros = jnp.zeros(problem.ndof, data.loads.dtype)

    def f_apply(u):
        elem = truss2d_green_lagrange_batch(
            x0, u[data.dof_map], data.inv_len, young, area)
        return zeros.at[data.dof_map].add(elem.fe_int)

    def se_apply(u):
        elem = truss2d_green_lagrange_batch(
            x0, u[data.dof_map], data.inv_len, young, area)
        # U = sum_e 1/2 E A L0 e_gl^2.
        return 0.5 * jnp.sum(young * area / data.inv_len
                             * elem.strain * elem.strain)

    problem._nl_apply_cache = (data, material, f_apply, se_apply)
    return f_apply, se_apply


def stable_dt(problem: TrussProblem, data=None, safety: float = 0.9,
              damping=(0.0, 0.0), prestress_u=None) -> float:
    """Gershgorin bound on the critical explicit time step.

    Undamped: dt_crit = 2 / omega_max with
    omega_max^2 <= max_i (sum_j |K_ij|) / m_i for the lumped mass.
    With Rayleigh damping the central-difference limit SHRINKS:
    dt_crit = (2/omega_max)(sqrt(1 + zeta^2) - zeta) with the damping
    ratio at omega_max, zeta = alpha/(2 omega_max) + beta omega_max / 2 —
    stiffness-proportional (beta) damping dominates there and an
    undamped-bound step blows up (pass the SAME damping you integrate
    with).  The returned dt = safety * dt_crit.

    `prestress_u` includes the geometric stiffness K_g(u0) in the bound
    (round-3 VERDICT #3): tension RAISES omega_max, so a prestressed
    transient integrated at the unstressed bound would be unstable —
    pass the same prestress you integrate with.

    Small problems compute the bound on the HOST (numpy — no device
    program, round-3 VERDICT #1).  Above DENSE_DOF_LIMIT row sums of |K|
    are computed WITHOUT materializing K (a dense 2M x 2M K is 16 TB):
    per-element sum_b |ke[a, b]| = |s| |g_a| sum_b |g_b| scatter-added
    per DOF; K_g adds 2 |N_e| / L0 per element DOF the same way.
    """
    from .newton import DENSE_DOF_LIMIT

    alpha, beta = float(damping[0]), float(damping[1])
    if problem.ndof <= DENSE_DOF_LIMIT and data is None:
        from ..ops import host as H

        m_h = H.host_lumped_mass(problem)
        m_h = np.where(m_h > 0, m_h, 1.0)
        k_h = H.host_stiffness(problem)
        if prestress_u is not None:
            pu = np.asarray(jax.device_get(prestress_u), dtype=float)
            k_h = k_h + H.host_geometric_stiffness(
                problem, H.host_axial_forces(problem, pu))
        # FREE rows only: fixed DOFs never integrate (the central scheme
        # masks them), and a support row — full stiffness over half an
        # element's mass, no payload — otherwise dominates the max and
        # makes the bound up to ~sqrt(2) conservative (and blind to
        # payload mass entirely).
        free = H.host_masks(problem) > 0.0
        ratio = np.sum(np.abs(k_h), axis=1) / m_h
        r_max = float(np.max(ratio[free])) if np.any(free) else 0.0
        if r_max <= 0.0:
            # Degenerate free block (e.g. an unstressed straight chain's
            # transverse DOFs carry no stiffness): fall back to the
            # all-rows bound so the caller still gets a sane time scale.
            r_max = float(np.max(ratio))
        w_max = float(np.sqrt(r_max))
        zeta = alpha / (2.0 * max(w_max, 1e-30)) + 0.5 * beta * w_max
        return float(safety * (2.0 / w_max)
                     * (np.sqrt(1.0 + zeta * zeta) - zeta))

    data = data if data is not None else problem.to_device()
    m = lumped_mass(data, problem.material)
    m = jnp.where(m > 0, m, 1.0)
    if problem.ndof <= DENSE_DOF_LIMIT:
        k = assemble_system(data, problem.material,
                            jnp.zeros(problem.ndof, data.loads.dtype))[0]
        if prestress_u is not None:
            from ..ops.geometric import (assemble_geometric,
                                         element_axial_forces)

            n_e = element_axial_forces(
                data, problem.material,
                jnp.asarray(prestress_u, data.loads.dtype))
            k = k + assemble_geometric(data, n_e)
        row = jnp.sum(jnp.abs(k), axis=1)
    else:
        from ..ops.cg import stiffness_coefficients

        s = stiffness_coefficients(data, problem.material, 1.0)
        g_abs = jnp.abs(data.gvec)                     # (nelm, 2d)
        contrib = (jnp.abs(s) * jnp.sum(g_abs, axis=1))[:, None] * g_abs
        if prestress_u is not None:
            from ..ops.geometric import element_axial_forces

            n_e = element_axial_forces(
                data, problem.material,
                jnp.asarray(prestress_u, data.loads.dtype))
            # |ke_g| row sums: each row of the +/-I block pattern has two
            # unit entries, so sum_b |ke_g[a, b]| = 2 |N_e| / L0.
            contrib = contrib + (2.0 * jnp.abs(n_e)
                                 * data.inv_len)[:, None]
        row = jnp.zeros(problem.ndof, s.dtype).at[data.dof_map].add(contrib)
    # FREE rows only, with the same degenerate-block fallback as the
    # host path above.
    bound = jnp.max(jnp.where(data.free_mask > 0, row / m, 0.0))
    bound = jnp.where(bound > 0, bound, jnp.max(row / m))
    w_max = float(jnp.sqrt(bound))
    zeta = alpha / (2.0 * max(w_max, 1e-30)) + 0.5 * beta * w_max
    return float(safety * (2.0 / w_max)
                 * (np.sqrt(1.0 + zeta * zeta) - zeta))


@partial(jax.jit, static_argnames=("k_apply", "n_rec", "record_every",
                                   "use_beta", "f_apply", "se_apply",
                                   "exact_restart", "force_fn"))
def _central_run(k_apply, m, mask, loads, amplitude, dt, alpha, beta,
                 u0, v0, probe, n_rec: int, record_every: int,
                 use_beta: bool, f_apply=None, se_apply=None,
                 exact_restart: bool = False, force_fn=None):
    """Explicit central difference, all steps in nested scan/fori_loop.

    u_{n+1} = 2u - u_prev + dt^2 M^-1 (f_n - f_int(u) - C (u - u_prev)/dt),
    with the damping velocity lagged half a step (standard explicit
    practice; keeps the update fully diagonal).

    Linear kinematics: f_int(u) = K u (f_apply None).  Geometric
    nonlinearity: f_apply is the Green-Lagrange internal force and
    se_apply its strain energy; beta (stiffness) damping then uses the
    INITIAL stiffness K0 via k_apply — the standard explicit-dynamics
    convention, noted in solve_transient's docstring."""
    inv_m = jnp.where(m > 0, 1.0 / m, 0.0)
    dt2 = dt * dt

    n_total = amplitude.shape[0]
    f_int = f_apply if f_apply is not None else k_apply

    if force_fn is not None:
        # General time-varying spatial load (e.g. a MOVING load):
        # force_fn(i) -> (ndof,) traced — the amplitude*loads contract
        # cannot express a load whose POSITION changes.
        force = force_fn
    else:
        def force(i):
            return amplitude[jnp.minimum(i, n_total - 1)] * loads

    def residual_force(i, u, v_lag):
        cu = alpha * (m * v_lag)
        if use_beta:
            cu = cu + beta * k_apply(v_lag)
        return force(i) - f_int(u) - cu

    if exact_restart:
        # Checkpoint resume: v0 is the BACKWARD difference (u - u_prev)/dt
        # saved by a previous segment, so u_prev is recovered exactly
        # (to an ulp) — the consistent-start formula below would add an
        # O(dt^2) seam at every segment boundary.
        u_prev0 = u0 - dt * v0
    else:
        # Consistent u_{-1}: u0 - dt v0 + dt^2/2 a0.
        a0 = inv_m * residual_force(0, u0, v0) * mask
        u_prev0 = u0 - dt * v0 + 0.5 * dt2 * a0

    def one_step(i, u, u_prev):
        v_lag = (u - u_prev) / dt
        u_next = (2.0 * u - u_prev
                  + dt2 * inv_m * residual_force(i, u, v_lag)) * mask
        return u_next, u

    def chunk(carry, ir):
        u, u_prev, i0 = carry

        def body(j, c):
            u, u_prev = c
            return one_step(i0 + j, u, u_prev)

        u, u_prev = jax.lax.fori_loop(0, record_every, body, (u, u_prev))
        i_next = i0 + record_every
        # CENTERED velocity for the record: peek one step ahead (one extra
        # matvec per snapshot).  The lagged (u - u_prev)/dt is off by
        # O(dt * omega) per mode, which pollutes energy diagnostics.
        u_peek, _ = one_step(i_next, u, u_prev)
        v = (u_peek - u_prev) / (2.0 * dt)
        ke = 0.5 * jnp.sum(m * v * v)
        se = (se_apply(u) if se_apply is not None
              else 0.5 * jnp.dot(u, k_apply(u)))
        return (u, u_prev, i_next), (u[probe], v[probe], ke, se)

    (u, u_prev, _), recs = jax.lax.scan(
        chunk, (u0, u_prev0, jnp.zeros((), jnp.int32)), None, length=n_rec)
    v_final = (u - u_prev) / dt
    return recs, u, v_final


def solve_transient(
    problem: TrussProblem,
    dt: float,
    n_steps: int,
    amplitude: Optional[np.ndarray] = None,
    damping=(0.0, 0.0),
    u0: Optional[np.ndarray] = None,
    v0: Optional[np.ndarray] = None,
    method: str = "central",
    record_every: int = 1,
    probe_dofs: Optional[np.ndarray] = None,
    newmark_beta: float = 0.25,
    newmark_gamma: float = 0.5,
    cg_tol: float = 1e-6,
    data=None,
    fetch_state: bool = True,
    geometric_nonlinear: bool = False,
    exact_restart: bool = False,
    n_modes: int = 32,
    prestress_u=None,
    force_fn=None,
    host: Optional[bool] = None,
) -> TransientResult:
    """Integrate M u'' + C u' + f_int(u) = amplitude(t) * loads.

    Args:
        amplitude: (n_steps,) load-scale history (default: unit step).
        damping: Rayleigh (alpha, beta) — C = alpha M + beta K.
        method: "central" (explicit; see stable_dt), "newmark" (implicit
            average-acceleration, unconditionally stable), or "modal"
            (superposition of the lowest n_modes with EXACT per-step
            SDOF propagators — no stability limit, no dispersion;
            accuracy is set by modal truncation alone, and long-horizon
            runs cost O(J) per step instead of O(ndof)).
        record_every: snapshot stride; n_steps must be a multiple.
        probe_dofs: DOFs to record (default: all).
        exact_restart: (u0, v0) came from a previous segment's
            (u_final, v_final) — recover u_prev exactly instead of the
            consistent cold-start formula (central only; Newmark's (u, v)
            state restarts exactly by construction).  Used by
            solve_transient_checkpointed.
        geometric_nonlinear: f_int(u) from the Green-Lagrange kernel (the
            same one the static opt-in uses) instead of K u.  "central"
            integrates explicitly; "newmark" runs a full Newton solve
            per implicit step on the dynamic residual (dense-only —
            _newmark_nl_run), stable far beyond the explicit dt bound.
            Beta (stiffness) damping acts through the INITIAL stiffness
            K0 on both paths; strain energy uses
            U = sum 1/2 E A L0 e_gl^2.  2D/3D only (like the static GL
            path).
        fetch_state: when False, u_final/v_final stay on device (jax
            arrays in the result) — fetching two (ndof,) vectors through
            a remote attachment costs more than 6000 integration steps
            at 2M DOFs (~0.5 s vs 0.096 ms/step); probes/energies are
            always fetched.
    """
    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")

    amplitude = (np.ones(n_steps) if amplitude is None
                 else np.asarray(amplitude, dtype=float))
    if amplitude.shape not in ((n_steps,), (n_steps + 1,)):
        # One OPTIONAL extra sample feeds the snapshot peek at the final
        # step (otherwise clamped) — solve_transient_checkpointed passes
        # it so segment-boundary velocity records match an uninterrupted
        # run under time-varying loads.
        raise ValueError(
            f"amplitude must have shape ({n_steps},) or ({n_steps + 1},)")
    if prestress_u is not None and geometric_nonlinear:
        raise ValueError("prestress_u is the LINEARIZED initial-stress "
                         "model; geometric_nonlinear already carries the "
                         "full state dependence — use one or the other")
    if geometric_nonlinear and method not in ("central", "newmark"):
        raise ValueError("geometric_nonlinear requires method='central' "
                         "or 'newmark' (modal superposition is a linear "
                         "concept)")

    # HOST tier (round-3 VERDICT #1): on the TPU attachment every new
    # device program pays a 1-3 min remote compile, so SMALL linear
    # transients (the serving/UI tier) integrate on the host in numpy —
    # a faithful transcription of the device recurrences below, zero
    # device programs, milliseconds cold.  Auto only on TPU: on CPU the
    # device path compiles in seconds and stays the tested reference.
    if force_fn is not None and method != "central":
        # Shared across tiers (the device paths repeat it defensively):
        # a host tier that ACCEPTED force_fn for modal/newmark while the
        # device tier raised would return backend-dependent answers for
        # identical input (round-3 review finding #1).
        raise ValueError("force_fn supports method='central' only")
    if host is None:
        from ..utils.runtime import tpu_likely

        # tpu_likely, NOT is_tpu: the predicate must not initialize a
        # backend (a fresh CLI process whose whole run is host-tier
        # numpy paid a measured ~11 s tunnel attach just to ask).
        host = (tpu_likely() and problem.ndof <= _HOST_TRANSIENT_DOF_LIMIT
                and not geometric_nonlinear and data is None
                and method in ("central", "newmark", "modal")
                and (force_fn is None
                     or getattr(force_fn, "host_eval", None) is not None))
    if host:
        if geometric_nonlinear:
            raise ValueError("the host transient path is linear-only")
        if force_fn is not None \
                and getattr(force_fn, "host_eval", None) is None:
            raise ValueError("host transient needs a force_fn with a "
                             ".host_eval numpy twin "
                             "(moving_load_force_fn provides one)")
        return _host_transient(
            problem, float(dt), n_steps, amplitude,
            (float(damping[0]), float(damping[1])), u0, v0, method,
            record_every, probe_dofs, float(newmark_beta),
            float(newmark_gamma), exact_restart, prestress_u, force_fn,
            n_modes, data)

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    ndof = problem.ndof
    u0 = jnp.zeros(ndof, dtype) if u0 is None else jnp.asarray(
        np.asarray(u0).reshape(-1), dtype)
    v0 = jnp.zeros(ndof, dtype) if v0 is None else jnp.asarray(
        np.asarray(v0).reshape(-1), dtype)
    probe = (jnp.arange(ndof) if probe_dofs is None
             else jnp.asarray(np.asarray(probe_dofs, dtype=int)))

    mask = data.free_mask
    u0 = u0 * mask
    v0 = v0 * mask
    # Unit mass on fixed DOFs keeps divisions benign; mask kills motion.
    # Cached per (problem, data): repeated transient calls (serving, the
    # benchmark) shouldn't re-dispatch the eager mass assembly.
    cached = getattr(problem, "_dyn_mass_cache", None)
    if (cached is not None and cached[0] is data
            and cached[1] is problem.material):
        m = cached[2]
    else:
        m = lumped_mass(data, problem.material) * mask + (1.0 - mask)
        problem._dyn_mass_cache = (data, problem.material, m)
    alpha, beta = (float(damping[0]), float(damping[1]))
    amp = jnp.asarray(amplitude, dtype)
    n_rec = n_steps // record_every
    # Linearized prestress: K + K_g(u0) is CONSTANT, so every integrator
    # path (incl. banded/Pallas) works unchanged about the prestressed
    # state.  Taut-string transverse waves (c = sqrt(T/rho A)) are the
    # canonical validation (tests/test_dynamics.py).  Pass the SAME
    # prestress_u to stable_dt — tension raises omega_max and shrinks
    # the explicit limit.
    k_apply = _k_apply_fn_prestressed(problem, data, prestress_u)

    if method == "central":
        f_apply = se_apply = None
        if geometric_nonlinear:
            f_apply, se_apply = _nl_apply_fn(problem, data)
        recs, u_f, v_f = _central_run(
            k_apply, m, mask, data.loads, amp, jnp.asarray(dt, dtype),
            jnp.asarray(alpha, dtype), jnp.asarray(beta, dtype), u0, v0,
            probe, n_rec, record_every, use_beta=beta != 0.0,
            f_apply=f_apply, se_apply=se_apply,
            exact_restart=exact_restart, force_fn=force_fn)
    elif method == "newmark":
        if force_fn is not None:
            raise ValueError("force_fn supports method='central' only")
        if geometric_nonlinear:
            from .newton import DENSE_DOF_LIMIT

            if ndof > DENSE_DOF_LIMIT:
                raise ValueError("nonlinear Newmark is dense-only (the "
                                 "tangent changes every Newton "
                                 "iteration); use method='central' for "
                                 "large meshes")
            nl_assemble = _nl_newmark_assemble_fn(problem, data)
            k_mat = assemble_system(data, problem.material,
                                    jnp.zeros(ndof, dtype))[0]
            recs, u_f, v_f = _newmark_nl_run(
                nl_assemble, k_mat, m, mask, data.loads, amp,
                jnp.asarray(dt, dtype), jnp.asarray(alpha, dtype),
                jnp.asarray(beta, dtype), jnp.asarray(newmark_beta, dtype),
                jnp.asarray(newmark_gamma, dtype), u0, v0, probe,
                n_rec, record_every, use_beta=beta != 0.0)
        else:
            solve_eff = _newmark_solve_eff(
                problem, data, k_apply, m, mask, dt, alpha, beta,
                newmark_beta, newmark_gamma, cg_tol,
                prestress_u=prestress_u)
            recs, u_f, v_f = _newmark_run(
                k_apply, solve_eff, m, mask, data.loads, amp,
                jnp.asarray(dt, dtype), jnp.asarray(alpha, dtype),
                jnp.asarray(beta, dtype), jnp.asarray(newmark_beta, dtype),
                jnp.asarray(newmark_gamma, dtype), u0, v0, probe,
                n_rec, record_every, use_beta=beta != 0.0)
    elif method == "modal":
        if force_fn is not None:
            raise ValueError("force_fn supports method='central' only")
        from .modal import modal_analysis

        free_idx, _ = problem.free_fixed()
        n_modes = min(n_modes, free_idx.size)
        mres = modal_analysis(problem, n_modes=n_modes, data=data,
                              prestress_u=prestress_u)
        omegas = np.maximum(mres.omegas, 1e-30)
        phi = jnp.asarray(mres.shapes, dtype)           # (ndof, J)
        zetas = 0.5 * (alpha / omegas + beta * omegas)  # exact Rayleigh
        prop = jnp.asarray(
            _modal_propagators(omegas, zetas, float(dt)), dtype)
        w2 = jnp.asarray(omegas**2, dtype)
        hi = dict(precision="highest")  # bf16 MXU default, see _modal_run
        f_modal = jnp.matmul(phi.T, data.loads * mask, **hi)
        q_stat_unit = f_modal / w2
        # M-orthonormal projection: q = phi^T M u.
        q0 = jnp.matmul(phi.T, m * u0, **hi)
        qd0 = jnp.matmul(phi.T, m * v0, **hi)
        recs, q_f, qd_f = _modal_run(
            prop, q_stat_unit, phi[probe, :], w2, amp, q0, qd0,
            n_rec, record_every)
        u_f = jnp.matmul(phi, q_f, **hi)
        v_f = jnp.matmul(phi, qd_f, **hi)
    else:
        raise ValueError("method must be 'central', 'newmark' or 'modal'")

    (us, vs, kes, ses) = recs
    times = dt * record_every * np.arange(1, n_rec + 1)
    if fetch_state:
        us, vs, kes, ses, u_f, v_f = jax.device_get(
            (us, vs, kes, ses, u_f, v_f))
        u_f, v_f = np.asarray(u_f), np.asarray(v_f)
    else:
        us, vs, kes, ses = jax.device_get((us, vs, kes, ses))
    return TransientResult(
        times=times,
        displacements=np.asarray(us), velocities=np.asarray(vs),
        kinetic_energy=np.asarray(kes), strain_energy=np.asarray(ses),
        u_final=u_f, v_final=v_f,
    )


# Host-tier size bound: above this the banded/Pallas device programs win
# (and their compile cost amortizes over the mesh size that justified it).
_HOST_TRANSIENT_DOF_LIMIT = 1024


def _host_transient(problem, dt, n_steps, amplitude, damping, u0, v0,
                    method, record_every, probe_dofs, nb, ng,
                    exact_restart, prestress_u, force_fn, n_modes,
                    data) -> TransientResult:
    """Linear transient integration on the HOST (numpy float64).

    A faithful transcription of _central_run/_newmark_run/_modal_run —
    same recurrences, same lagged/centered velocity conventions, same
    amplitude clamping and exact_restart semantics — for the
    small-problem serving tier where a remote TPU compile would cost
    1000x the integration itself (round-3 VERDICT #1).  Supports
    prestress (K + K_g constant operator) on all three methods and
    moving loads through force_fn.host_eval."""
    from ..ops import host as H

    alpha, beta = damping
    ndof = problem.ndof
    mask = H.host_masks(problem)
    k = H.host_stiffness(problem)
    if prestress_u is not None:
        import jax as _jax

        pu = np.asarray(_jax.device_get(prestress_u), dtype=float)
        k = k + H.host_geometric_stiffness(
            problem, H.host_axial_forces(problem, pu))
    m = H.host_lumped_mass(problem) * mask + (1.0 - mask)
    loads = H.loads_of(problem, data)
    amp = np.asarray(amplitude, dtype=float)
    n_total = amp.shape[0]
    n_rec = n_steps // record_every
    probe = (np.arange(ndof) if probe_dofs is None
             else np.asarray(probe_dofs, dtype=int))
    u0 = (np.zeros(ndof) if u0 is None
          else np.asarray(u0, dtype=float).reshape(-1)) * mask
    v0 = (np.zeros(ndof) if v0 is None
          else np.asarray(v0, dtype=float).reshape(-1)) * mask

    force_host = getattr(force_fn, "host_eval", None)

    def force(i):
        if force_host is not None:
            return force_host(i)
        return amp[min(i, n_total - 1)] * loads

    us = np.empty((n_rec, probe.size))
    vs = np.empty((n_rec, probe.size))
    kes = np.empty(n_rec)
    ses = np.empty(n_rec)

    if method == "central":
        inv_m = np.where(m > 0, 1.0 / m, 0.0)
        dt2 = dt * dt

        def residual(i, u, v_lag):
            cu = alpha * (m * v_lag)
            if beta != 0.0:
                cu = cu + beta * (k @ v_lag)
            return force(i) - k @ u - cu

        def one_step(i, u, u_prev):
            v_lag = (u - u_prev) / dt
            u_next = (2.0 * u - u_prev
                      + dt2 * inv_m * residual(i, u, v_lag)) * mask
            return u_next, u

        if exact_restart:
            u_prev = u0 - dt * v0
        else:
            a0 = inv_m * residual(0, u0, v0) * mask
            u_prev = u0 - dt * v0 + 0.5 * dt2 * a0
        u = u0
        i = 0
        for r in range(n_rec):
            for _ in range(record_every):
                u, u_prev = one_step(i, u, u_prev)
                i += 1
            u_peek, _ = one_step(i, u, u_prev)
            v = (u_peek - u_prev) / (2.0 * dt)
            us[r], vs[r] = u[probe], v[probe]
            kes[r] = 0.5 * np.sum(m * v * v)
            ses[r] = 0.5 * u @ (k @ u)
        v_final = (u - u_prev) / dt
        u_final = u

    elif method == "newmark":
        import scipy.linalg

        a0 = 1.0 / (nb * dt * dt)
        a1 = ng / (nb * dt)
        a2 = 1.0 / (nb * dt)
        a3 = 1.0 / (2.0 * nb) - 1.0
        a4 = ng / nb - 1.0
        a5 = 0.5 * dt * (ng / nb - 2.0)
        a6 = dt * (1.0 - ng)
        a7 = ng * dt

        k_eff = (1.0 + a1 * beta) * k + (a0 + a1 * alpha) * np.diag(m)
        k_eff = (mask[:, None] * k_eff * mask[None, :]
                 + np.diag(1.0 - mask))
        cho = scipy.linalg.cho_factor(k_eff, lower=True)

        def c_apply(v):
            cv = alpha * (m * v)
            if beta != 0.0:
                cv = cv + beta * (k @ v)
            return cv

        u, v = u0, v0
        a = np.where(m > 0, 1.0 / m, 0.0) * (
            (force(0) - k @ u0 - c_apply(v0)) * mask)
        i = 0
        for r in range(n_rec):
            for _ in range(record_every):
                # force_fn is central-only (validated by the caller), so
                # the implicit step always uses the amplitude contract.
                f = amp[min(i + 1, n_total - 1)] * loads
                rhs = (f + m * (a0 * u + a2 * v + a3 * a)
                       + c_apply(a1 * u + a4 * v + a5 * a))
                u_new = scipy.linalg.cho_solve(cho, rhs * mask) * mask
                a_new = (a0 * (u_new - u) - a2 * v - a3 * a) * mask
                v = (v + a6 * a + a7 * a_new) * mask
                u, a = u_new, a_new
                i += 1
            us[r], vs[r] = u[probe], v[probe]
            kes[r] = 0.5 * np.sum(m * v * v)
            ses[r] = 0.5 * u @ (k @ u)
        u_final, v_final = u, v

    elif method == "modal":
        from .modal import _host_modal

        free_idx, _ = problem.free_fixed()
        j_modes = min(n_modes, free_idx.size)
        pu = None
        if prestress_u is not None:
            import jax as _jax

            pu = np.asarray(_jax.device_get(prestress_u), dtype=float)
        mres = _host_modal(problem, j_modes, True, pu)
        omegas = np.maximum(mres.omegas, 1e-30)
        phi = mres.shapes                              # (ndof, J)
        zetas = 0.5 * (alpha / omegas + beta * omegas)
        prop = _modal_propagators(omegas, zetas, dt)   # (J, 2, 2)
        w2 = omegas**2
        f_modal = phi.T @ (loads * mask)
        q_stat_unit = f_modal / w2
        q = phi.T @ (m * u0)
        qd = phi.T @ (m * v0)
        phi_probe = phi[probe, :]
        i = 0
        for r in range(n_rec):
            for _ in range(record_every):
                a_i = amp[i]
                qp = a_i * q_stat_unit
                dq, dqd = q - qp, qd - 0.0
                q_new = prop[:, 0, 0] * dq + prop[:, 0, 1] * dqd + qp
                qd_new = prop[:, 1, 0] * dq + prop[:, 1, 1] * dqd
                q, qd = q_new, qd_new
                i += 1
            us[r] = phi_probe @ q
            vs[r] = phi_probe @ qd
            kes[r] = 0.5 * np.sum(qd * qd)
            ses[r] = 0.5 * np.sum((q * q) * w2)
        u_final = phi @ q
        v_final = phi @ qd
    else:
        raise ValueError("method must be 'central', 'newmark' or 'modal'")

    times = dt * record_every * np.arange(1, n_rec + 1)
    return TransientResult(
        times=times, displacements=us, velocities=vs,
        kinetic_energy=kes, strain_energy=ses,
        u_final=np.asarray(u_final), v_final=np.asarray(v_final),
    )


def _newmark_solve_eff(problem, data, k_apply, m, mask, dt, alpha, beta,
                       nb, ng, cg_tol, prestress_u=None):
    """Effective-stiffness solver closure, CACHED on the problem (it is a
    static jit argument — see _k_apply_fn — and the dense path's one-time
    Cholesky factorization should amortize over every step AND every call).

    Dense path: one factorization of the masked effective stiffness, two
    triangular solves per step.  Banded path: warm-started fused PCG on
    the DIA combination (1 + a1 beta) (K + K_g) + (a0 + a1 alpha) M.
    `prestress_u` folds the geometric stiffness K_g(u0) into the
    effective operator (round-3 VERDICT #3) — it shares the stiffness
    sparsity, so both paths carry it unchanged; k_apply (used for the C
    and internal-force terms by the caller) already includes it.
    Factoring (1 + a1 beta) (K + K_g) treats beta damping as acting
    through the TANGENT stiffness about the prestressed state, matching
    the k_apply-based C in _newmark_run.
    """
    from .newton import DENSE_DOF_LIMIT, _dia_layout_of

    key = (float(dt), float(alpha), float(beta), float(nb),
           float(ng), float(cg_tol))
    cache = getattr(problem, "_newmark_cache", None)
    if cache is None:
        cache = problem._newmark_cache = {}
    # Entries hold (data, material, prestress, solve_eff): identity checks
    # (not ids, which can be reused after GC) invalidate on data, material
    # OR prestress-state change.
    entry = cache.get(key)
    if (entry is not None and entry[0] is data
            and entry[1] is problem.material
            and entry[2] is prestress_u):
        return entry[3]

    dtype = data.loads.dtype
    a0 = 1.0 / (nb * dt * dt)
    a1 = ng / (nb * dt)

    n_e = None
    if prestress_u is not None:
        from ..ops.geometric import element_axial_forces

        n_e = element_axial_forces(data, problem.material,
                                   jnp.asarray(prestress_u, dtype))

    dense = problem.ndof <= DENSE_DOF_LIMIT
    if dense:
        k_mat = assemble_system(data, problem.material,
                                jnp.zeros(problem.ndof, dtype))[0]
        if n_e is not None:
            from ..ops.geometric import assemble_geometric

            k_mat = k_mat + assemble_geometric(data, n_e)
        k_eff = (1.0 + a1 * beta) * k_mat + (a0 + a1 * alpha) * jnp.diag(m)
        # Masked BC elimination: M K M + (I - M).
        k_eff = (mask[:, None] * k_eff * mask[None, :]
                 + jnp.diag(1.0 - mask))
        chol = jax.scipy.linalg.cho_factor(k_eff, lower=True)

        def solve_eff(rhs, _u_guess):
            return jax.scipy.linalg.cho_solve(chol, rhs * mask) * mask
    else:
        layout = _dia_layout_of(problem, data)
        if layout is None:
            raise ValueError(
                "newmark on large meshes requires a banded (DIA) operator; "
                "renumber the mesh or use method='central'")
        from ..ops.cg import stiffness_coefficients
        from ..ops.dia import assemble_dia, dia_cg_solve

        s = stiffness_coefficients(data, problem.material, 1.0)
        kd = assemble_dia(layout, s, data.gvec)
        if n_e is not None:
            from ..ops.geometric import assemble_geometric_dia

            kd = kd + assemble_geometric_dia(layout, data, n_e)
        k0 = int(np.where(layout.offsets == 0)[0][0])
        eff = ((1.0 + a1 * beta) * kd).at[k0].add((a0 + a1 * alpha) * m)
        use_pallas = jax.default_backend() == "tpu"

        def solve_eff(rhs, u_guess):
            x, _, _ = dia_cg_solve(layout, eff, rhs, mask, tol=cg_tol,
                                   max_iter=20 * layout.ndof,
                                   x0=u_guess, use_pallas=use_pallas)
            return x

    # Bounded: every dense-path entry pins a full Cholesky factorization
    # (~200 MB at 5k DOFs) — a dt sweep must not leak one per step size.
    if len(cache) >= _K_CACHE_CAP:
        cache.pop(next(iter(cache)))
    cache[key] = (data, problem.material, prestress_u, solve_eff)
    return solve_eff


@partial(jax.jit, static_argnames=("k_apply", "solve_eff", "n_rec",
                                   "record_every", "use_beta"))
def _newmark_run(k_apply, solve_eff, m, mask, loads, amp, dt, alpha, beta,
                 nb, ng, u0, v0, probe, n_rec: int, record_every: int,
                 use_beta: bool):
    """Newmark average-acceleration, all steps in one scan program."""
    a0 = 1.0 / (nb * dt * dt)
    a1 = ng / (nb * dt)
    a2 = 1.0 / (nb * dt)
    a3 = 1.0 / (2.0 * nb) - 1.0
    a4 = ng / nb - 1.0
    a5 = 0.5 * dt * (ng / nb - 2.0)
    a6 = dt * (1.0 - ng)
    a7 = ng * dt

    def c_apply(v):
        cv = alpha * (m * v)
        if use_beta:
            cv = cv + beta * k_apply(v)
        return cv

    f0 = amp[0] * loads
    acc0 = jnp.where(m > 0, 1.0 / m, 0.0) * (
        (f0 - k_apply(u0) - c_apply(v0)) * mask)

    def one_step(i, u, v, a):
        f = amp[jnp.minimum(i + 1, amp.shape[0] - 1)] * loads
        rhs = (f + m * (a0 * u + a2 * v + a3 * a)
               + c_apply(a1 * u + a4 * v + a5 * a))
        u_new = solve_eff(rhs, u)
        a_new = a0 * (u_new - u) - a2 * v - a3 * a
        v_new = v + a6 * a + a7 * a_new
        return u_new, v_new * mask, a_new * mask

    def chunk(carry, _):
        u, v, a, i0 = carry

        def body(j, c):
            u, v, a = c
            return one_step(i0 + j, u, v, a)

        u, v, a = jax.lax.fori_loop(0, record_every, body, (u, v, a))
        ke = 0.5 * jnp.sum(m * v * v)
        se = 0.5 * jnp.dot(u, k_apply(u))
        return ((u, v, a, i0 + record_every),
                (u[probe], v[probe], ke, se))

    (u, v, _, _), recs = jax.lax.scan(
        chunk, (u0, v0, acc0, jnp.zeros((), jnp.int32)), None,
        length=n_rec)
    return recs, u, v


def _nl_newmark_assemble_fn(problem: TrussProblem, data):
    """(K_t(u), f_int(u), strain-energy) Green-Lagrange closure for the
    implicit nonlinear step, cached like _k_apply_fn (static jit arg —
    a fresh closure per call would recompile the whole time loop)."""
    cached = getattr(problem, "_nl_newmark_cache", None)
    if (cached is not None and cached[0] is data
            and cached[1] is problem.material):
        return cached[2]
    from ..ops.assembly import assemble_system_nonlinear, material_values
    from ..ops.elements import truss2d_green_lagrange_batch

    material = problem.material
    dim = data.dimension
    young, area = material_values(data, material, 1.0)
    dx0 = data.gvec[:, dim:] / data.inv_len[:, None]
    x0 = jnp.stack([data.mid - 0.5 * dx0, data.mid + 0.5 * dx0], axis=1)

    def nl_assemble(u):
        kt, f_int, _ = assemble_system_nonlinear(data, material, u)
        elem = truss2d_green_lagrange_batch(
            x0, u[data.dof_map], data.inv_len, young, area)
        se = 0.5 * jnp.sum(young * area / data.inv_len
                           * elem.strain * elem.strain)
        return kt, f_int, se

    problem._nl_newmark_cache = (data, material, nl_assemble)
    return nl_assemble


# Newton iterations per implicit nonlinear step: average-acceleration
# Newmark converges quadratically from the previous state, so 8 covers
# even snap-through transits (the limit-point step) at sane dt; a
# fixed count keeps the scan program free of data-dependent trip counts.
_NL_NEWMARK_NEWTON_ITERS = 8


@partial(jax.jit, static_argnames=("nl_assemble", "n_rec", "record_every",
                                   "use_beta"))
def _newmark_nl_run(nl_assemble, k_mat, m, mask, loads, amp, dt, alpha,
                    beta, nb, ng, u0, v0, probe, n_rec: int,
                    record_every: int, use_beta: bool):
    """Implicit NONLINEAR Newmark: a full Newton solve per step on the
    dynamic residual with the Green-Lagrange internal force,

        R(u) = f_{n+1} - f_int(u) - M a(u) - C v(u),
        dR/du = -(K_t(u) + a0 M + a1 C),

    (a(u), v(u) from the Newmark kinematic relations).  Unconditionally
    stable in the linear limit and usable at dt far beyond the explicit
    bound for stiff nonlinear structures (snap-through at coarse dt,
    tests/test_dynamics.py).  Rayleigh damping acts through the INITIAL
    stiffness (C = alpha M + beta K0, constant), matching the explicit
    path's convention; the Jacobian's C term is therefore constant too.
    Dense-only: the tangent changes every iteration, so there is no
    constant banded operator to ride."""
    a0 = 1.0 / (nb * dt * dt)
    a2 = 1.0 / (nb * dt)
    a3 = 1.0 / (2.0 * nb) - 1.0
    a1 = ng / (nb * dt)
    a6 = dt * (1.0 - ng)
    a7 = ng * dt
    inv_m = jnp.where(m > 0, 1.0 / m, 0.0)
    n_total = amp.shape[0]

    def c_apply(w):
        cw = alpha * (m * w)
        if use_beta:
            cw = cw + beta * (k_mat @ w)
        return cw

    c_jac = alpha * jnp.diag(m) + (beta * k_mat if use_beta else 0.0)

    _, f_int0, _ = nl_assemble(u0)
    acc0 = inv_m * ((amp[0] * loads - f_int0 - c_apply(v0)) * mask)

    def one_step(i, u, v, a):
        f = amp[jnp.minimum(i + 1, n_total - 1)] * loads

        def newton(_, u_new):
            a_new = a0 * (u_new - u) - a2 * v - a3 * a
            v_new = v + a6 * a + a7 * a_new
            kt, f_int, _ = nl_assemble(u_new)
            r = (f - f_int - m * a_new - c_apply(v_new)) * mask
            k_eff = kt + a0 * jnp.diag(m) + a1 * c_jac
            k_eff = (mask[:, None] * k_eff * mask[None, :]
                     + jnp.diag(1.0 - mask))
            return (u_new + jnp.linalg.solve(k_eff, r)) * mask

        u_new = jax.lax.fori_loop(0, _NL_NEWMARK_NEWTON_ITERS, newton, u)
        a_new = (a0 * (u_new - u) - a2 * v - a3 * a) * mask
        v_new = (v + a6 * a + a7 * a_new) * mask
        return u_new, v_new, a_new

    def chunk(carry, _):
        u, v, a, i0 = carry

        def body(j, c):
            u, v, a = c
            return one_step(i0 + j, u, v, a)

        u, v, a = jax.lax.fori_loop(0, record_every, body, (u, v, a))
        _, _, se = nl_assemble(u)
        ke = 0.5 * jnp.sum(m * v * v)
        return ((u, v, a, i0 + record_every),
                (u[probe], v[probe], ke, se))

    (u, v, _, _), recs = jax.lax.scan(
        chunk, (u0, v0, acc0, jnp.zeros((), jnp.int32)), None,
        length=n_rec)
    return recs, u, v


@partial(jax.jit, static_argnames=("n_rec", "record_every"))
def _modal_run(prop, q_stat_unit, phi_probe, w2, amp,
               q0, qd0, n_rec: int, record_every: int):
    """Exact modal-superposition integration.

    Each retained mode is an SDOF q'' + 2 zeta w q' + w^2 q = p(t); for
    the per-step-constant amplitude contract the update is EXACT:
    s_{n+1} = A_j (s_n - s_p) + s_p with s_p = (p/w^2, 0) and A_j the 2x2
    propagator e^{M dt} (precomputed per mode on the host, complex-eig
    route so over- and under-damped modes both come out exact).  Any dt
    is admissible — no stability limit, no dispersion error.
    """
    def step(s, a_i):
        qp = a_i * q_stat_unit                     # (J,)
        sp = jnp.stack([qp, jnp.zeros_like(qp)], axis=1)
        # precision="highest": a bf16 MXU contraction here compounds
        # ~1e-2 per step through the recurrence and the "exact" claim
        # dies on TPU (the plane family's measured failure class,
        # models/plane.py:_einsum); 2x2 blocks cost nothing in f32.
        s = jnp.einsum("jab,jb->ja", prop, s - sp,
                       precision="highest") + sp
        return s, None

    def chunk(s, a_chunk):
        s, _ = jax.lax.scan(step, s, a_chunk)
        q, qd = s[:, 0], s[:, 1]
        u_probe = jnp.matmul(phi_probe, q, precision="highest")
        v_probe = jnp.matmul(phi_probe, qd, precision="highest")
        # Modal coordinates are M-orthonormal: KE = 1/2 sum qd^2,
        # SE = 1/2 sum w^2 q^2.
        ke = 0.5 * jnp.sum(qd * qd)
        se = 0.5 * jnp.sum((q * q) * w2)
        return s, (u_probe, v_probe, ke, se)

    s0 = jnp.stack([q0, qd0], axis=1)
    amp_c = amp[:n_rec * record_every].reshape(n_rec, record_every)
    s, recs = jax.lax.scan(chunk, s0, amp_c)
    return recs, s[:, 0], s[:, 1]


def _modal_propagators(omegas: np.ndarray, zetas: np.ndarray,
                       dt: float) -> np.ndarray:
    """(J, 2, 2) exact SDOF propagators e^{M dt},
    M = [[0, 1], [-w^2, -2 zeta w]].

    Closed form, valid for ALL damping levels: with s = zeta w,
    (M + sI)^2 = -wd^2 I where wd^2 = w^2 (1 - zeta^2), so
    e^{M dt} = e^{-s dt} (c I + s1 (M + s I)) with
    c = cos(wd dt), s1 = sin(wd dt)/wd  (underdamped; cosh/sinh for
    overdamped; series at the defective critically-damped point — an
    eigendecomposition route breaks exactly there: the eigenvector pair
    is parallel and inv(vecs) returns garbage WITHOUT raising)."""
    w = np.asarray(omegas, dtype=float)
    z = np.asarray(zetas, dtype=float)
    s = z * w
    wd2 = w * w * (1.0 - z * z)
    x2 = wd2 * dt * dt                      # (wd dt)^2, sign carries regime
    c = np.empty_like(w)
    s1 = np.empty_like(w)
    trig = x2 > 1e-8
    hyp = x2 < -1e-8
    near = ~(trig | hyp)                    # defective neighborhood
    wd = np.sqrt(np.abs(wd2))
    c[trig] = np.cos(wd[trig] * dt)
    s1[trig] = np.sin(wd[trig] * dt) / wd[trig]
    c[hyp] = np.cosh(wd[hyp] * dt)
    s1[hyp] = np.sinh(wd[hyp] * dt) / wd[hyp]
    c[near] = 1.0 + 0.5 * x2[near]          # second-order series, both signs
    s1[near] = dt * (1.0 + x2[near] / 6.0)
    e = np.exp(-s * dt)
    out = np.empty((w.size, 2, 2))
    out[:, 0, 0] = e * (c + s * s1)
    out[:, 0, 1] = e * s1
    out[:, 1, 0] = e * (-(w * w) * s1)
    out[:, 1, 1] = e * (c - s * s1)
    return out


def solve_transient_checkpointed(
    problem: TrussProblem,
    dt: float,
    n_steps: int,
    checkpoint_dir,
    checkpoint_every: int,
    amplitude: Optional[np.ndarray] = None,
    resume: bool = True,
    data=None,
    **kw,
) -> TransientResult:
    """Preemption-safe transient run: the history executes in
    checkpoint_every-step segments (each a fully fused device program —
    the cached operator closures mean equal-length segments share ONE
    compilation), persisting (step, u, v) after each via
    utils/checkpoint.py.  A killed run restarted with resume=True
    continues from the last saved segment and returns the same records
    as an uninterrupted run (tests/test_dynamics.py asserts equality).

    Segment bookkeeping requires n_steps % checkpoint_every == 0 and
    checkpoint_every % record_every == 0.  The per-segment fixed cost
    (~0.5 s at 2M DOFs through a remote attachment — mostly the state
    fetch) is the price of each persistence point; pick checkpoint_every
    accordingly.
    """
    from ..utils.checkpoint import load_transient_state, save_transient_state

    record_every = kw.get("record_every", 1)
    if n_steps % checkpoint_every or checkpoint_every % record_every:
        raise ValueError("need n_steps % checkpoint_every == 0 and "
                         "checkpoint_every % record_every == 0")
    if "u0" in kw or "v0" in kw:
        raise ValueError("initial conditions come from the checkpoint; "
                         "run the first segment unchekpointed instead")
    if kw.get("force_fn") is not None:
        # force_fn(i) indexes steps from each SEGMENT's start, so a
        # moving load would jump back to its origin every segment; an
        # offset closure per segment would re-trigger the
        # closure-static-arg recompile trap (_k_apply_fn docstring).
        raise ValueError("checkpointed transients support the amplitude "
                         "contract only, not force_fn")
    data = data if data is not None else problem.to_device()
    amplitude = (np.ones(n_steps) if amplitude is None
                 else np.asarray(amplitude, dtype=float))
    if amplitude.shape != (n_steps,):
        raise ValueError(f"amplitude must have shape ({n_steps},)")

    start_step = 0
    u = v = None
    segments = []
    if resume:
        state = load_transient_state(checkpoint_dir)
        if state is not None:
            start_step, u, v, meta = state
            if start_step % checkpoint_every:
                raise ValueError(
                    f"checkpoint at step {start_step} does not align with "
                    f"checkpoint_every={checkpoint_every}")

    n_seg = checkpoint_every
    for seg_start in range(start_step, n_steps, n_seg):
        # Include the NEXT segment's first amplitude sample when it
        # exists: the snapshot-peek at the segment's last step needs it,
        # or boundary velocity records diverge from an uninterrupted run
        # under time-varying loads.
        res = solve_transient(
            problem, dt, n_seg,
            amplitude=amplitude[seg_start:
                                min(seg_start + n_seg + 1, n_steps)],
            u0=u, v0=v, data=data, exact_restart=seg_start > 0, **kw)
        u, v = res.u_final, res.v_final
        save_transient_state(checkpoint_dir, seg_start + n_seg, u, v,
                             meta={"dt": float(dt), "n_steps": n_steps})
        segments.append(res._replace(
            times=res.times + seg_start * dt))

    if not segments:  # fully complete checkpoint: nothing left to run
        raise ValueError("checkpoint already covers all n_steps; delete "
                         "the directory to rerun")
    return TransientResult(
        times=np.concatenate([s.times for s in segments]),
        displacements=np.concatenate(
            [s.displacements for s in segments]),
        velocities=np.concatenate([s.velocities for s in segments]),
        kinetic_energy=np.concatenate(
            [s.kinetic_energy for s in segments]),
        strain_energy=np.concatenate(
            [s.strain_energy for s in segments]),
        u_final=segments[-1].u_final,
        v_final=segments[-1].v_final,
    )


def moving_load_force_fn(problem: TrussProblem, path_nodes, speed: float,
                         magnitude: float, dt: float, component: int = 1,
                         data=None):
    """force_fn for a point load crossing the structure (bridge problem).

    The load of the given magnitude moves at constant speed along the
    polyline of `path_nodes` (arc length from node coordinates); at each
    step it is distributed linearly to the two nodes of the segment it
    occupies (the standard moving-load discretization) on DOF component
    `component` (0=x, 1=y, ...).  Before entry and after exit the force
    is zero.  Cached per (problem, parameter) set — force_fn is a static
    jit argument, so a fresh closure per call would recompile the time
    loop (the _k_apply_fn lesson).
    """
    key = (id(problem), tuple(int(n) for n in path_nodes), float(speed),
           float(magnitude), float(dt), int(component))
    cache = getattr(problem, "_moving_load_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1]
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    nodes = np.atleast_2d(np.asarray(problem.nodes, dtype=float).T).T
    path = np.asarray(path_nodes, dtype=int)
    xy = nodes[path]
    seg = np.linalg.norm(np.diff(xy, axis=0), axis=1)
    s_cum = jnp.asarray(np.concatenate([[0.0], np.cumsum(seg)]), dtype)
    s_total = float(s_cum[-1])
    dofs = jnp.asarray(problem.dimension * path + component, jnp.int32)
    ndof = problem.ndof

    def force_fn(i):
        pos = speed * dt * i
        inside = jnp.logical_and(pos >= 0.0, pos <= s_total)
        k = jnp.clip(jnp.searchsorted(s_cum, pos, side="right") - 1,
                     0, path.size - 2)
        w = (pos - s_cum[k]) / jnp.maximum(s_cum[k + 1] - s_cum[k], 1e-30)
        w = jnp.clip(w, 0.0, 1.0)
        f = jnp.zeros(ndof, dtype)
        f = f.at[dofs[k]].add(magnitude * (1.0 - w) * inside)
        f = f.at[dofs[k + 1]].add(magnitude * w * inside)
        return f

    s_cum_np = np.asarray(s_cum, dtype=float)
    dofs_np = np.asarray(dofs)

    def host_eval(i):
        """Numpy twin for the host transient tier (same discretization)."""
        pos = speed * dt * i
        inside = 1.0 if (0.0 <= pos <= s_total) else 0.0
        k = int(np.clip(np.searchsorted(s_cum_np, pos, side="right") - 1,
                        0, path.size - 2))
        w = (pos - s_cum_np[k]) / max(s_cum_np[k + 1] - s_cum_np[k], 1e-30)
        w = float(np.clip(w, 0.0, 1.0))
        f = np.zeros(ndof)
        f[dofs_np[k]] += magnitude * (1.0 - w) * inside
        f[dofs_np[k + 1]] += magnitude * w * inside
        return f

    force_fn.host_eval = host_eval
    problem._moving_load_cache = (key, force_fn)
    return force_fn


def base_excitation_force_fn(problem: TrussProblem, accel_history,
                             direction=None, data=None):
    """force_fn for uniform support (base) acceleration — the seismic
    time-history complement of response_spectrum.

    Relative-displacement formulation: with every support shaking
    together at a_g(t), the equation of motion in coordinates RELATIVE
    to the ground is M u'' + C u' + K u = -M iota a_g(t), where iota is
    the rigid-body influence vector of the shaking direction (the
    direction components tiled over the nodes).  The returned solution
    is therefore displacement relative to the ground, the quantity
    element forces depend on.  Cached per (problem, history, direction)
    like moving_load_force_fn — force_fn is a static jit argument, and a
    fresh closure per call would recompile the time loop.
    """
    accel_np = np.asarray(accel_history, dtype=float).reshape(-1)
    dim = problem.dimension
    dir_np = (np.asarray(direction, dtype=float).reshape(-1)
              if direction is not None
              else np.eye(dim)[0])
    if dir_np.size != dim:
        raise ValueError(f"direction must have {dim} components, "
                         f"got {dir_np.size}")
    key = (accel_np.tobytes(), dir_np.tobytes())
    cache = getattr(problem, "_base_excitation_cache", None)
    # Hold the material REFERENCE in the cache (identity check, not id():
    # the closure bakes in the lumped mass, so a replaced material must
    # invalidate — and ids get reused after GC).
    if (cache is not None and cache[0] == key
            and cache[1] is problem.material):
        return cache[2]
    from ..ops.host import host_lumped_mass
    from ..utils.runtime import default_dtype

    n_nodes = problem.ndof // dim
    iota = np.tile(dir_np, n_nodes)                        # (ndof,)
    # -M iota from the HOST mass (numpy mirror of lumped_mass,
    # tests/test_host.py pins them 1:1): building it with the device op
    # dispatched an EAGER scatter program — a ~10 s remote compile on
    # the attachment for a request the host tier then serves with zero
    # device work (measured in BENCHMARKS.md's transcript).  The traced
    # path below only ever sees the resulting constant array.
    dtype = (data.loads.dtype if data is not None else default_dtype())
    miota_np = -(host_lumped_mass(problem) * iota)
    miota = jnp.asarray(miota_np, dtype)
    acc = jnp.asarray(accel_np, dtype)
    n_hist = accel_np.size

    def force_fn(i):
        return miota * acc[jnp.minimum(i, n_hist - 1)]

    def host_eval(i):
        """Numpy twin for the host transient tier."""
        return miota_np * accel_np[min(int(i), n_hist - 1)]

    force_fn.host_eval = host_eval
    problem._base_excitation_cache = (key, problem.material, force_fn)
    return force_fn
