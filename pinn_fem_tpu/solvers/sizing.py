"""Sizing (design) optimization: member areas from load paths.

The reference's flagship inverse recovers *material* from *measured
displacements* (SURVEY §3.2 — PINN property identification).  This
module is the DESIGN-side mirror of that inverse: the structure and the
loads are known, and the unknown per-element areas are chosen to carry
the load at minimum mass (or minimum compliance at fixed volume).  The
machinery is the same machinery the identification family runs on —
reverse-mode AD through a dense masked static solve gives exact
gradients of mass/stress/displacement w.r.t. every area at once (the
discrete adjoint; one backward solve, not nelm forward differences).

Two methods:

- `fully_stressed_design` — the classic FSD fixpoint A ← |N(A)|/σ_max
  on the float64 HOST tier (zero device programs).  For statically
  determinate trusses member forces do not depend on the areas, so FSD
  is the exact stress-constrained optimum in one step; for
  indeterminate trusses it is the standard engineering heuristic
  (optimal when the design is fully stressed).
- `optimize_sizing` — gradient descent (log/box-parameterized areas,
  ADAM, penalty continuation) on the traced solve.  Handles what FSD
  cannot: displacement constraints, indeterminate load redistribution,
  and compliance/volume objectives.  A feasibility polish pass scales
  any overstressed member up so the returned design always satisfies
  the stress limit.

Identification meshes are small (dense traced K below DENSE_DOF_LIMIT,
like the rest of the inverse family) and the run executes on the local
CPU tier when routed through `io/analysis.py`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import TrussProblem
from ..ops.elements import truss_linear_batch
from .phases import ADAM


@dataclass
class SizingResult:
    """Optimized design + the checks a designer validates first."""
    areas: np.ndarray              # (nelm,) optimized areas
    mass: float                    # final sum(rho A L)
    mass_initial: float            # mass at the starting areas
    displacements: np.ndarray      # (ndof,) at the optimized areas
    #                                ((n_cases, ndof) with load_cases)
    stress: np.ndarray             # (nelm,) sigma = E eps (the signed
    #                                governing case with load_cases)
    axial_forces: np.ndarray       # (nelm,) N = sigma A
    max_stress_ratio: float        # max |sigma| / stress_limit (nan if none)
    max_displacement_ratio: float  # max |u_probe| / limit (nan if none)
    history: np.ndarray            # per-iteration loss (or mass for FSD)
    converged: bool
    n_iter: int
    # max (-sigma) / sigma_cr over compression members, sigma_cr =
    # pi^2 E c A / L^2 (Euler, I = c A^2); nan when no buckling factor.
    max_buckling_ratio: float = float("nan")
    # Achieved fundamental frequency of the optimized design [Hz];
    # nan unless a min_frequency_hz floor was active (the designer's
    # first validation: did the design land ON the floor?).
    fundamental_frequency_hz: float = float("nan")
    # Achieved fatigue lives of the optimized design [s] per element
    # (inf for zero-stress members) and their minimum; None/nan unless
    # a `fatigue` life floor was active.  Recomputed at the final areas
    # through the float64 HOST spectral path (solvers/fatigue.py) — the
    # authority the traced constraint mirrors.
    fatigue_life_s: Optional[np.ndarray] = None
    min_fatigue_life_s: float = float("nan")
    # Achieved FORM reliability indices of the optimized design (one
    # per limit state) and their minimum; None/nan unless an RBDO
    # `reliability` block was active.  Recomputed at the final areas by
    # the full HL-RF search (solvers/reliability.form_reliability) —
    # the authority the PMA constraint approximates from inside.
    reliability_beta: Optional[np.ndarray] = None
    min_reliability_beta: float = float("nan")


def _host_area_solve(problem: TrussProblem, areas: np.ndarray,
                     loads: Optional[np.ndarray] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(u, sigma) at the given per-element areas — float64 host mirror
    of `static_response_elem` (ops/host.py machinery).  With a
    (C, ndof) `loads` table, u is (C, ndof) and sigma (C, nelm)."""
    from ..ops.host import (_geometry, _scatter_blocks, host_masks,
                            material_values_host)

    dof_map, gvec, inv_len, _ = _geometry(problem)
    young, _ = material_values_host(problem, 1.0)
    s = young * areas * inv_len
    ke = s[:, None, None] * gvec[:, :, None] * gvec[:, None, :]
    k = _scatter_blocks(problem, ke)
    mask = host_masks(problem)
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    f = np.asarray(problem.loads if loads is None else loads, dtype=float)
    batched = f.ndim == 2
    # One multi-RHS factorization serves every load case.
    u = (np.linalg.solve(km, (f * mask).T).T * mask
         if batched else np.linalg.solve(km, f * mask) * mask)
    strain = np.sum(gvec * u[..., dof_map], axis=-1) * inv_len
    return u, young * strain


def _host_mass(problem: TrussProblem, areas: np.ndarray) -> float:
    from ..ops.host import _geometry, density_values_host

    _, _, inv_len, _ = _geometry(problem)
    return float(np.sum(density_values_host(problem) * areas / inv_len))


def fully_stressed_design(
    problem: TrussProblem,
    stress_limit: float,
    min_area: float = 1e-6,
    max_area: Optional[float] = None,
    n_iter: int = 50,
    tol: float = 1e-12,
    load_cases=None,
    buckling_shape_factor: Optional[float] = None,
) -> SizingResult:
    """FSD fixpoint A ← clip(max_c |N_c(A)| / σ_max, min, max), host tier.

    Exact for statically determinate trusses (forces independent of
    areas: converges in one step); the standard heuristic otherwise.
    Members carrying no force go to `min_area` (the gauge constraint).
    With a (C, ndof) `load_cases` table each member is sized by its
    governing case (the classic envelope FSD — one multi-RHS
    factorization per iteration serves every case).

    `buckling_shape_factor` (c in I = c A², e.g. 1/4π for a solid
    circle) adds the Euler compression check: σ_cr = π² E c A / L², so
    a compression member additionally needs A ≥ √(|N| L²/(π² E c)) —
    the stress-ratio resizing classic.  Exact for determinate trusses
    like the strength branch (both targets depend only on |N|).
    """
    if stress_limit <= 0.0:
        raise ValueError("stress_limit must be positive")
    if buckling_shape_factor is not None and buckling_shape_factor <= 0.0:
        raise ValueError("buckling_shape_factor must be positive")
    from ..ops.host import _geometry, material_values_host

    loads = _load_cases_array(problem, load_cases)
    young_np, areas = material_values_host(problem, 1.0)
    areas = np.clip(np.asarray(areas, dtype=float), min_area, max_area)
    _, _, inv_len_np, _ = _geometry(problem)
    mass_init = _host_mass(problem, areas)
    c_b = buckling_shape_factor
    hist = []
    converged = False
    it = 0
    for it in range(1, n_iter + 1):
        _, sigma = _host_area_solve(problem, areas, loads=loads)
        env = np.max(np.abs(sigma), axis=0) if sigma.ndim == 2 \
            else np.abs(sigma)
        target = env * areas / stress_limit        # |N| / sigma_max
        if c_b is not None:
            comp = np.max(-sigma, axis=0) if sigma.ndim == 2 else -sigma
            n_comp = np.maximum(comp, 0.0) * areas       # |N| compression
            a_buck = np.sqrt(n_comp / (np.pi ** 2 * young_np * c_b)
                             ) / inv_len_np
            target = np.maximum(target, a_buck)
        new = np.clip(target, min_area, max_area)
        hist.append(_host_mass(problem, new))
        step = float(np.max(np.abs(new - areas) / np.maximum(areas, 1e-30)))
        areas = new
        if step < tol:
            converged = True
            break
    u, sigma = _host_area_solve(problem, areas, loads=loads)
    env = _signed_envelope(sigma)
    buck_ratio = float("nan")
    if c_b is not None:
        comp = np.maximum(-sigma, 0.0)
        sig_cr = np.pi ** 2 * young_np * c_b * areas * inv_len_np ** 2
        buck_ratio = float(np.max(comp / sig_cr))
    return SizingResult(
        areas=areas,
        mass=_host_mass(problem, areas),
        mass_initial=mass_init,
        displacements=u,
        stress=env,
        axial_forces=env * areas,
        max_stress_ratio=float(np.max(np.abs(sigma)) / stress_limit),
        max_displacement_ratio=float("nan"),
        history=np.asarray(hist, dtype=float),
        converged=converged,
        n_iter=it,
        max_buckling_ratio=buck_ratio,
    )


def _signed_envelope(sigma: np.ndarray) -> np.ndarray:
    """(nelm,) stress of each member's GOVERNING case — the signed value
    whose magnitude is the envelope.  Pass-through for a single case."""
    if sigma.ndim == 1:
        return sigma
    idx = np.argmax(np.abs(sigma), axis=0)
    return sigma[idx, np.arange(sigma.shape[1])]


def _load_cases_array(problem: TrussProblem, load_cases):
    """None (use the problem's own loads) or a validated (C, ndof)
    float table."""
    if load_cases is None:
        return None
    arr = np.asarray(load_cases, dtype=float)
    if arr.ndim != 2 or arr.shape[1] != problem.ndof:
        raise ValueError(f"load_cases must be (n_cases, {problem.ndof}) "
                         f"rows, got {arr.shape}")
    if arr.shape[0] < 1:
        raise ValueError("load_cases needs at least one case")
    return arr


def static_response_elem(problem: TrussProblem, area_e, data=None,
                         young_e=None, rho_e=None, loads=None):
    """Traced, differentiable static solve with PER-ELEMENT areas.

    Returns (u, sigma, n_axial, mass): the dense masked solve
    K(A) u = f (masked-BC contract of ops/linalg.masked_solve), element
    stresses σ = E ε, axial forces N = σ A, and the design mass
    Σ ρ A L — every output differentiable w.r.t. `area_e` (and the
    optional traced `young_e`/`rho_e` overrides), so one reverse pass
    is the adjoint solve for all members at once.  A (C, ndof) `loads`
    table solves every case against ONE factorization (a multi-RHS
    triangular solve — an MXU batch, not C separate programs); u and
    sigma then carry a leading case axis."""
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    nelm = data.dof_map.shape[0]
    if young_e is None or rho_e is None:
        from ..ops.host import density_values_host, material_values_host

        if young_e is None:
            young_e = material_values_host(problem, 1.0)[0]
        if rho_e is None:
            rho_e = density_values_host(problem, 1.0)
    young_e = jnp.broadcast_to(jnp.asarray(young_e, dtype), (nelm,))
    rho_e = jnp.broadcast_to(jnp.asarray(rho_e, dtype), (nelm,))
    area_e = jnp.broadcast_to(jnp.asarray(area_e, dtype), (nelm,))

    u_e0 = jnp.zeros(data.dof_map.shape, dtype)
    elem = truss_linear_batch(data.gvec, data.inv_len, u_e0, young_e,
                              area_e)
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    k = jnp.zeros((data.ndof, data.ndof), dtype).at[rows, cols].add(elem.ke)

    mask = data.free_mask
    km = mask[:, None] * k * mask[None, :] + jnp.diag(1.0 - mask)
    f = data.loads if loads is None else jnp.asarray(loads, dtype)
    if f.ndim == 2:
        u = (jnp.linalg.solve(km, (f * mask).T).T * mask)
    else:
        u = jnp.linalg.solve(km, f * mask) * mask

    strain = jnp.sum(data.gvec * u[..., data.dof_map],
                     axis=-1) * data.inv_len
    sigma = young_e * strain
    mass = jnp.sum(rho_e * area_e / data.inv_len)
    return u, sigma, sigma * area_e, mass


def member_force_frf_sq(data, young_e, area_e, rho_e, omegas,
                        alpha, beta):
    """(n_freq, nelm) |H_N(ω)|² member-force FRF magnitude squared under
    the problem's load pattern — traced and differentiable w.r.t. the
    per-element areas (through K(A), the lumped M(A), AND the E·A/L
    force recovery).

    Same real 2n×2n block form as frequency_inverse._frf_amplitudes
    (identity rows keep fixed DOFs nonsingular), same lumped-mass
    assembly as modal_inverse.modal_observables_elem (point masses
    included).  Sizing meshes are dense-tier small, so a plain vmap
    over the sweep is the whole scheduling story.
    """
    dtype = data.loads.dtype
    nelm = data.dof_map.shape[0]
    young_e = jnp.broadcast_to(jnp.asarray(young_e, dtype), (nelm,))
    area_e = jnp.broadcast_to(jnp.asarray(area_e, dtype), (nelm,))
    rho_e = jnp.broadcast_to(jnp.asarray(rho_e, dtype), (nelm,))

    u_e0 = jnp.zeros(data.dof_map.shape, dtype)
    elem = truss_linear_batch(data.gvec, data.inv_len, u_e0, young_e,
                              area_e)
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    k = jnp.zeros((data.ndof, data.ndof), dtype).at[rows, cols].add(
        elem.ke)
    mask = data.free_mask
    k = mask[:, None] * k * mask[None, :]
    m_e = rho_e * area_e / data.inv_len
    contrib = jnp.broadcast_to((0.5 * m_e)[:, None], data.dof_map.shape)
    m = jnp.zeros(data.ndof, dtype).at[data.dof_map].add(contrib)
    if data.point_mass is not None:
        m = m + data.point_mass
    m = m * mask
    f = data.loads * mask
    n = f.shape[0]
    om = jnp.asarray(omegas, dtype)
    alpha = jnp.asarray(alpha, dtype)
    beta = jnp.asarray(beta, dtype)
    ea_invl = young_e * area_e * data.inv_len

    def solve_one(w):
        a = k - (w * w) * jnp.diag(m) + jnp.diag(1.0 - mask)
        b = w * (alpha * jnp.diag(m) + beta * k)
        z = jnp.block([[a, -b], [b, a]])
        x = jnp.linalg.solve(z, jnp.concatenate([f, jnp.zeros_like(f)]))
        xr, xi = x[:n] * mask, x[n:] * mask
        nr = ea_invl * jnp.sum(data.gvec * xr[data.dof_map], axis=-1)
        ni = ea_invl * jnp.sum(data.gvec * xi[data.dof_map], axis=-1)
        return nr * nr + ni * ni

    return jax.vmap(solve_one)(om)


def _trapz(y, x, axis=0):
    """Trapezoid rule, traced (explicit — no jnp version dependence)."""
    dx = jnp.diff(x)
    sl = [slice(None)] * y.ndim
    sl[axis] = slice(1, None)
    hi = y[tuple(sl)]
    sl[axis] = slice(None, -1)
    lo = y[tuple(sl)]
    shape = [1] * y.ndim
    shape[axis] = dx.shape[0]
    return jnp.sum(0.5 * (hi + lo) * dx.reshape(shape), axis=axis)


def fatigue_life_ratio(omegas, stress_psd, sn_exponent, sn_coefficient,
                       life_s, method: str = "dirlik"):
    """(n_q,) per-quantity r = (E[D]/T_unit · T_req)^(1/m): the fatigue
    analogue of a stress ratio (r ≤ 1 ⟺ life ≥ T_req; scales ~1/A at
    fixed force, so AL multipliers and the feasibility polish treat it
    exactly like |σ|/σ_allow).

    `sn_coefficient` may be a TRACED scalar (fatigue-reliability
    treats the Basquin C as a random variable); the exponent stays
    static (it parameterizes Gamma functions).

    Traced jnp MIRROR of the host authority chain
    fatigue.spectral_moments → dirlik/narrowband_damage_rate —
    tests/test_sizing.py pins the two paths 1:1, the same mirror
    discipline ops/host.py lives under.  Zero-PSD quantities (members
    the load pattern never stresses) get r = 0 through a double-where,
    so reverse-mode AD sees a constant there instead of d(x^(1/m))/dx
    at x = 0.
    """
    mexp = float(sn_exponent)
    om = jnp.asarray(omegas)
    m0 = _trapz(stress_psd, om)
    m2 = _trapz((om ** 2)[:, None] * stress_psd, om)
    active = m0 > 0.0
    m0s = jnp.where(active, m0, 1.0)
    m2s = jnp.where(active, m2, 1.0)
    if method == "narrowband":
        nu0 = jnp.sqrt(m2s / m0s) / (2.0 * jnp.pi)
        rate = (nu0 / jnp.asarray(sn_coefficient)
                * jnp.sqrt(2.0 * m0s) ** mexp
                * math.gamma(1.0 + mexp / 2.0))
    elif method == "dirlik":
        m1 = _trapz(om[:, None] * stress_psd, om)
        m4 = _trapz((om ** 4)[:, None] * stress_psd, om)
        m1s = jnp.where(active, m1, 1.0)
        m4s = jnp.where(active, m4, 1.0)
        xm = m1s / m0s * jnp.sqrt(m2s / m4s)
        alpha2 = m2s / jnp.sqrt(m0s * m4s)
        d1 = 2.0 * (xm - alpha2 ** 2) / (1.0 + alpha2 ** 2)
        r = ((alpha2 - xm - d1 ** 2)
             / (1.0 - alpha2 - d1 + d1 ** 2))
        d2 = (1.0 - alpha2 - d1 + d1 ** 2) / (1.0 - r)
        d3 = 1.0 - d1 - d2
        q = 1.25 * (alpha2 - d3 - d2 * r) / d1
        nup = jnp.sqrt(m4s / m2s) / (2.0 * jnp.pi)
        rate = (nup / jnp.asarray(sn_coefficient)
                * jnp.sqrt(m0s) ** mexp
                * (d1 * q ** mexp * math.gamma(1.0 + mexp)
                   + jnp.sqrt(2.0) ** mexp
                   * math.gamma(1.0 + mexp / 2.0)
                   * (d2 * jnp.abs(r) ** mexp + d3)))
    else:
        raise ValueError('fatigue method must be "dirlik" or '
                         '"narrowband"')
    return jnp.where(active, (rate * float(life_s)) ** (1.0 / mexp), 0.0)


def pma_stress_ratios(problem, data, young_e, rho_e, area_e, varspecs,
                      res_var, limit_c, target_beta, ls_idx,
                      n_amv: int = 10, chol=None):
    """(n_ls,) PMA stress ratios at the target-β design points — the
    RBDO constraint in the Performance Measure Approach.

    For each limit state, the Advanced Mean Value fixpoint
    u ← −β_t·∇_u g/‖∇_u g‖ finds the worst point u* on the β_t-sphere
    (the inverse-FORM problem), and the constraint becomes the plain
    stress ratio |σ(A, x(u*))| / R(u*) ≤ 1 — "the member must survive
    the β_t-quantile realization".  Because u* is an argmin over a
    FIXED sphere, Danskin's theorem says d(ratio)/dA needs no
    differentiation of u*(A): u* is stop-gradded, so the outer ADAM
    sees only the cheap ∂g/∂A at the design point — no second-order AD
    through the inner fixpoint.  PMA is the standard efficient RBDO
    formulation precisely because of this structure (and AMV converges
    in a handful of iterations where the RIA/HL-RF inner loop can
    oscillate).

    Variables follow reliability._parse_variables (young / load_scale /
    resistance; "area" is the DESIGN vector here and is rejected
    upstream).  Shares the solve with `static_response_elem`; one
    vmapped program covers every limit state.
    """
    from .reliability import _physical

    dtype = data.loads.dtype
    n_vars = len(varspecs)
    masks = {i: jnp.asarray(v["mask"], dtype)
             for i, v in enumerate(varspecs) if v["mask"] is not None}
    ls_idx_d = jnp.asarray(np.asarray(ls_idx, dtype=int))
    bt = jnp.asarray(float(target_beta), dtype)
    chol_d = None if chol is None else jnp.asarray(chol, dtype)

    def demand_resistance(u, i):
        # Nataf dependence: z = L·u feeds the marginals (the same one
        # shared transform form_reliability uses).
        z = u if chol_d is None else chol_d @ u
        young = young_e
        rho = rho_e
        scale = jnp.asarray(1.0, dtype)
        for k, v in enumerate(varspecs):
            x = _physical(v, z[k])
            if v["kind"] == "load_scale":
                scale = scale * x
            elif v["kind"] == "young":
                m = masks[k]
                young = young * (1.0 - m) + x * m
        _, sigma, _, _ = static_response_elem(
            problem, area_e, data=data, young_e=young, rho_e=rho,
            loads=data.loads * scale)
        demand = jnp.abs(sigma)[ls_idx_d[i]]
        if res_var is not None:
            r = _physical(varspecs[res_var], z[res_var])
        else:
            r = jnp.asarray(limit_c, dtype)
        return demand, r

    def g_of(u, i):
        demand, r = demand_resistance(u, i)
        return 1.0 - demand / r

    g_grad = jax.grad(g_of)

    def amv(i):
        u0 = jnp.zeros((n_vars,), dtype)

        def body(_, u):
            dg = g_grad(u, i)
            nrm = jnp.maximum(jnp.linalg.norm(dg), 1e-30)
            return -bt * dg / nrm

        u_star = jax.lax.fori_loop(0, n_amv, body, u0)
        # Danskin: the constraint gradient w.r.t. the DESIGN needs only
        # the partial at the fixed design point.
        u_star = jax.lax.stop_gradient(u_star)
        demand, r = demand_resistance(u_star, i)
        return demand / r

    return jax.vmap(amv)(jnp.arange(ls_idx_d.shape[0]))


def optimize_compliance_oc(
    problem: TrussProblem,
    volume: float,
    n_iter: int = 40,
    min_area: float = 1e-6,
    max_area: Optional[float] = None,
    move: float = 0.2,
    eta: float = 0.5,
    tol: float = 1e-3,
    cg_tol: float = 1e-6,
    cg_max_iter: int = 20000,
    initial_areas=None,
    data=None,
    use_pallas: bool = False,
    precond: str = "jacobi",
) -> SizingResult:
    """Large-mesh compliance sizing by OPTIMALITY CRITERIA on the banded
    DIA/PCG path — design optimization past DENSE_DOF_LIMIT.

    The dense `optimize_sizing` traces a (ndof, ndof) solve and stops at
    the dense limit.  Compliance-at-fixed-volume has a classical
    structure that needs no global AD at all: at the optimum every
    non-bound member carries equal strain-energy density per unit
    volume, and the OC fixpoint

        A ← clip(A · (d_e/Λ)^η,  move and gauge bounds),
        d_e = σ_e²/2E   (energy density at the CURRENT solve),
        Λ from bisection so Σ A L = V exactly

    converges to it with one banded PCG solve per iteration — the same
    assemble_dia + dia_cg_solve machinery (and optional Pallas kernel /
    MG preconditioner) the large-mesh statics ride, warm-started from
    the previous iterate's displacement field.  The whole iteration
    (assembly, solve, energies, 60-step Λ bisection, clamped update) is
    ONE jitted program; the Python loop just re-dispatches it.

    Unlike the dense compliance mode, the gauge bounds here are HARD:
    the Λ bisection redistributes volume among free members with the
    clamp in place, so Σ A L = V and min ≤ A ≤ max hold simultaneously.

    Irregular meshes must be banded first (ops/reorder.rcm_permutation)
    — dia_layout raises otherwise, same contract as the large-mesh
    statics.

    Returns a SizingResult: history carries per-iteration compliance,
    converged means the last relative area move fell below `tol` (with
    a healthy final CG solve).
    """
    if volume is None or volume <= 0.0:
        raise ValueError("optimize_compliance_oc needs a positive volume")
    if min_area <= 0.0:
        raise ValueError("min_area must be positive (a zero-area member "
                         "makes K singular)")
    if max_area is not None and max_area <= min_area:
        raise ValueError("max_area must exceed min_area")
    if not (0.0 < move <= 1.0):
        raise ValueError("move must be in (0, 1]")

    from ..ops.dia import assemble_dia, dia_cg_solve, dia_layout
    from ..ops.host import (_geometry, density_values_host,
                            material_values_host)

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    nelm = data.dof_map.shape[0]
    young_np, area0_np = material_values_host(problem, 1.0)
    rho_np = density_values_host(problem, 1.0)
    _, _, inv_len_np, _ = _geometry(problem)
    lengths_np = 1.0 / inv_len_np
    if initial_areas is not None:
        area0_np = np.broadcast_to(
            np.asarray(initial_areas, dtype=float), (nelm,)).copy()
    # Feasible start: project onto the volume, then clamp to the gauge.
    area0_np = area0_np * float(volume) / float(
        np.sum(area0_np * lengths_np))
    area0_np = np.clip(area0_np, min_area, max_area)
    if float(np.sum(np.full(nelm, min_area) * lengths_np)) > volume:
        raise ValueError("volume is below the min_area gauge volume — "
                         "infeasible")

    layout = dia_layout(np.asarray(data.dof_map), problem.ndof)
    young_e = jnp.asarray(young_np, dtype)
    lengths = jnp.asarray(lengths_np, dtype)
    f = data.loads
    mask = data.free_mask
    vol_t = jnp.asarray(float(volume), dtype)

    def oc_iteration(areas, u_prev):
        s = young_e * areas * data.inv_len
        diags = assemble_dia(layout, s, data.gvec)
        u, cg_its, cg_res = dia_cg_solve(
            layout, diags, f, mask, tol=cg_tol, max_iter=cg_max_iter,
            x0=u_prev, use_pallas=use_pallas, precond=precond)
        strain = jnp.sum(data.gvec * u[data.dof_map],
                         axis=-1) * data.inv_len
        dens = 0.5 * young_e * strain * strain      # sigma^2 / 2E
        compliance = jnp.dot(f, u)

        lower = jnp.maximum(min_area, (1.0 - move) * areas)
        upper = (1.0 + move) * areas
        if max_area is not None:
            upper = jnp.minimum(max_area, upper)

        def clamped(lam):
            b = (dens / lam) ** eta
            return jnp.clip(areas * b, lower, upper)

        # Λ bisection in log space: Σ A(Λ) L is monotone decreasing.
        d_max = jnp.maximum(jnp.max(dens), 1e-30)
        lo0 = 1e-9 * d_max
        hi0 = 1e9 * d_max

        def bisect(_, c):
            lo, hi = c
            mid = jnp.sqrt(lo * hi)
            too_big = jnp.sum(clamped(mid) * lengths) > vol_t
            return (jnp.where(too_big, mid, lo),
                    jnp.where(too_big, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 60, bisect, (lo0, hi0))
        new = clamped(jnp.sqrt(lo * hi))
        change = jnp.max(jnp.abs(new - areas)
                         / jnp.maximum(areas, 1e-30))
        return new, u, compliance, change, cg_its, cg_res

    oc_jit = jax.jit(oc_iteration)
    areas_d = jnp.asarray(area0_np, dtype)
    u_d = jnp.zeros_like(f)
    hist, changes, resids = [], [], []
    for _ in range(n_iter):
        areas_d, u_d, c, ch, _, res = oc_jit(areas_d, u_d)
        hist.append(c)
        changes.append(ch)
        resids.append(res)
    # ONE device fetch for the whole run.
    areas, u, hist, changes, resids = jax.device_get(
        (areas_d, u_d, hist, changes, resids))
    areas = np.asarray(areas, dtype=float)
    u = np.asarray(u, dtype=float)

    # Final element state at the returned design (device quantities; the
    # dense host mirror would not scale to the meshes this serves).
    strain = np.sum(np.asarray(data.gvec) * u[np.asarray(data.dof_map)],
                    axis=-1) * inv_len_np
    sigma = young_np * strain
    return SizingResult(
        areas=areas,
        mass=float(np.sum(rho_np * areas * lengths_np)),
        mass_initial=float(np.sum(rho_np * area0_np * lengths_np)),
        displacements=u,
        stress=sigma,
        axial_forces=sigma * areas,
        max_stress_ratio=float("nan"),
        max_displacement_ratio=float("nan"),
        history=np.asarray(hist, dtype=float),
        converged=bool(changes[-1] < tol and resids[-1] <= 2.0 * cg_tol),
        n_iter=n_iter,
    )


def optimize_sizing(
    problem: TrussProblem,
    objective: str = "mass",
    stress_limit: Optional[float] = None,
    buckling_shape_factor: Optional[float] = None,
    displacement_limit: Optional[float] = None,
    probe_dofs=None,
    min_frequency_hz: Optional[float] = None,
    fatigue: Optional[Dict] = None,
    reliability: Optional[Dict] = None,
    volume: Optional[float] = None,
    load_cases=None,
    case_weights=None,
    min_area: float = 1e-6,
    max_area: Optional[float] = None,
    initial_areas=None,
    n_iter: int = 300,
    outer_rounds: int = 4,
    penalty: float = 10.0,
    learning_rate: float = 0.05,
    polish: bool = True,
    data=None,
) -> SizingResult:
    """Gradient-based sizing: ADAM on parameterized areas with penalty
    continuation.

    objective="mass":  minimize Σ ρ A L subject to |σ_e| ≤ stress_limit
        and/or |u_p| ≤ displacement_limit on `probe_dofs` (default: all
        free DOFs).  At least one constraint is required — unconstrained
        mass minimization just hits the gauge.  Constraints enter
        through an AUGMENTED LAGRANGIAN (Rockafellar's inequality form
        μ·max(0, g + λ/2μ)²) with multiplier updates between the
        `outer_rounds`: the multipliers carry the constraint force at
        moderate μ, so no steep penalty wall is needed — a plain ×10
        penalty ramp was measured to spike ADAM's second moment on the
        first boundary overshoot and stall the descent far inside the
        feasible region.  The learning rate halves each round so the
        iterate settles onto the boundary.  With `polish` (default)
        overstressed members are then scaled up on the float64 host
        until the stress limit holds, so the returned design is always
        feasible.

    objective="compliance":  minimize f·u at fixed material `volume`
        Σ A L = V (the volume projection A ← A·V/ΣAL is exact and
        differentiable, so no equality penalty is needed).  At the
        optimum every active member carries equal strain-energy density
        per unit volume (the classic optimality criterion — tested in
        tests/test_sizing.py); members the load path does not need sink
        toward zero.  NOTE: the projection rescales the whole design,
        so in this mode `min_area` floors only the pre-projection
        parameterization (a soft gauge) — useless members may end below
        it, though never at zero (K stays SPD).  `stress_limit` may be
        added as a penalty on top.

    Areas are box-parameterized (min + (max−min)·sigmoid(t), or
    min + exp(t) when unbounded above) so the bounds hold exactly at
    every iterate, not just at convergence.

    buckling_shape_factor: optional c in I = c A² (geometrically
        similar sections; 1/4π for a solid circle) — adds the Euler
        compression constraint (−σ_e) ≤ σ_cr = π² E c A_e / L_e².
        Unlike the strength limit it is AREA-DEPENDENT (σ_cr grows with
        A), which is exactly why compression members come out heavier
        than tension members of equal force.  Requires stress_limit
        (the tension side still needs an allowable).

    min_frequency_hz: optional lowest-natural-frequency floor — the
        classic dynamic design requirement (keep the structure's f₁
        above an excitation band).  The constraint
        g = 1 − λ₁/(2π f_min)² differentiates through the dense
        generalized eigensolve with K(A) AND M(A) traced (the
        identification family's modal_observables_elem), so mass added
        for stiffness is charged against the very frequency it buys.
        NOTE: frequencies are invariant under uniform area scaling when
        ALL mass is structural (K and M both scale with A) — a
        frequency floor is only meaningfully enforceable on structures
        carrying non-structural `point_masses` (models/problem.py), the
        standard setting for this problem class.

    fatigue: optional fatigue-life floor under stationary random
        loading — minimum-mass design against the OTHER dynamic failure
        mode (damage accumulation, not strength).  Dict:
        {"psd": S_p,              # load PSD: scalar white noise or a
                                  # (n_freq,) curve on `omegas`
         "omegas": [..],          # (n_freq,) ascending sweep [rad/s] —
                                  # must bracket the modes that matter
         "damping": [α, β],       # Rayleigh
         "sn": {"exponent": m, "coefficient": C},   # Basquin N S^m = C
         "min_life_s": T,         # required life of EVERY member
         "method": "dirlik"}      # | "narrowband" (conservative)
        The load pattern is the problem's own load vector (the PSD
        scales it).  Each iteration re-sweeps the member-force FRFs at
        the CURRENT areas (member_force_frf_sq: K(A), M(A) and the
        E·A/L recovery all traced), divides by A² for stress PSDs, and
        closes the Dirlik/narrow-band damage rate in spectral-moment
        form (fatigue_life_ratio) — so the AL multipliers push each
        member toward life = T along the exact gradient, through
        resonance shifts the redesign itself causes.  The returned
        design's lives are recomputed on the float64 HOST authority
        path (solvers/fatigue.py) into `fatigue_life_s` /
        `min_fatigue_life_s`.

    reliability: optional RBDO block — minimum mass subject to every
        member keeping a FORM reliability index of at least
        `target_beta` under uncertain stiffness/load/resistance (the
        design-under-uncertainty loop: the `fatigue`/`stress` limits
        bound the DETERMINISTIC response; this bounds the FAILURE
        PROBABILITY).  Dict:
        {"variables": [..],        # reliability.py specs; kinds
                                   # young / load_scale / resistance
                                   # ("area" IS the design vector)
         "target_beta": 3.0,       # beta floor (pf ~ Phi(-beta))
         "limit_state": {"type": "stress",
                         "limit": R | "variable": "R",
                         "elements": [..]}}    # default: all members
        Implemented by the Performance Measure Approach: an inner AMV
        fixpoint finds each member's worst point on the target-beta
        sphere and the constraint becomes the stress ratio AT that
        design point (pma_stress_ratios — Danskin's theorem makes the
        outer gradient need no differentiation of the inner argmin).
        The returned design's achieved betas are recomputed by the full
        HL-RF search (`reliability_beta` / `min_reliability_beta`).

    load_cases: optional (C, ndof) table — a real structure is sized
        for an ENVELOPE, not one load.  Constraints then hold for every
        case simultaneously; each iteration solves all cases against
        one factorization (a multi-RHS MXU batch, see
        static_response_elem).  The compliance objective becomes the
        weighted sum Σ_c w_c f_c·u_c (`case_weights`, default equal).
        The result's stress/axial_forces report each member's governing
        case (signed envelope) and displacements carry the (C, ndof)
        case axis.
    """
    if objective not in ("mass", "compliance"):
        raise ValueError('objective must be "mass" or "compliance"')
    if objective == "mass" and stress_limit is None \
            and displacement_limit is None and min_frequency_hz is None \
            and fatigue is None and reliability is None:
        raise ValueError("mass minimization needs stress_limit, "
                         "displacement_limit, min_frequency_hz, a "
                         "fatigue life floor and/or a reliability "
                         "target (otherwise the optimum is the gauge "
                         "minimum everywhere)")
    if min_frequency_hz is not None and min_frequency_hz <= 0.0:
        raise ValueError("min_frequency_hz must be positive")
    if buckling_shape_factor is not None:
        if buckling_shape_factor <= 0.0:
            raise ValueError("buckling_shape_factor must be positive")
        if stress_limit is None:
            raise ValueError("buckling_shape_factor needs stress_limit "
                             "(the tension side still needs an "
                             "allowable)")
    if objective == "compliance" and volume is None:
        raise ValueError("compliance minimization needs the volume "
                         "budget (volume=...)")
    if stress_limit is not None and stress_limit <= 0.0:
        raise ValueError("stress_limit must be positive")
    if displacement_limit is not None and displacement_limit <= 0.0:
        raise ValueError("displacement_limit must be positive")
    if min_area <= 0.0:
        raise ValueError("min_area must be positive (a zero-area member "
                         "makes K singular)")
    if max_area is not None and max_area <= min_area:
        raise ValueError("max_area must exceed min_area")
    fat = None
    if fatigue is not None:
        if fatigue.get("sn") is None:
            raise ValueError('fatigue needs "sn": {"exponent": m, '
                             '"coefficient": C}')
        f_m = float(fatigue["sn"]["exponent"])
        f_c = float(fatigue["sn"]["coefficient"])
        if f_m <= 0.0 or f_c <= 0.0:
            raise ValueError("fatigue S-N exponent and coefficient "
                             "must be positive")
        if fatigue.get("min_life_s") is None:
            raise ValueError('fatigue needs "min_life_s" (the required '
                             'life of every member, seconds)')
        f_life = float(fatigue["min_life_s"])
        if f_life <= 0.0:
            raise ValueError("fatigue min_life_s must be positive")
        f_om = np.asarray(fatigue.get("omegas", ()),
                          dtype=float).reshape(-1)
        if f_om.size < 4 or np.any(np.diff(f_om) <= 0.0) \
                or f_om[0] <= 0.0:
            raise ValueError('fatigue needs an ascending positive '
                             '"omegas" sweep (>= 4 points) bracketing '
                             'the structure\'s modes')
        f_psd = np.broadcast_to(
            np.asarray(fatigue.get("psd", 1.0), dtype=float),
            f_om.shape).copy()
        if np.any(f_psd < 0.0) or not np.any(f_psd > 0.0):
            raise ValueError("fatigue psd must be nonnegative with "
                             "some positive band")
        f_damp = fatigue.get("damping", (0.0, 0.0))
        f_method = fatigue.get("method", "dirlik")
        if f_method not in ("dirlik", "narrowband"):
            raise ValueError('fatigue method must be "dirlik" or '
                             '"narrowband"')
        fat = {"m": f_m, "c": f_c, "life": f_life, "om": f_om,
               "psd": f_psd, "alpha": float(f_damp[0]),
               "beta": float(f_damp[1]), "method": f_method}
    rel = None
    if reliability is not None:
        from .reliability import _parse_variables

        if reliability.get("target_beta") is None:
            raise ValueError('reliability (RBDO) needs "target_beta"')
        beta_t = float(reliability["target_beta"])
        if beta_t <= 0.0:
            raise ValueError("target_beta must be positive")
        nelm_ = problem.nelm
        r_vars = _parse_variables(reliability.get("variables"), nelm_)
        for v in r_vars:
            if v["kind"] in ("area", "density"):
                raise ValueError(
                    'RBDO variables must be young / load_scale / '
                    'resistance ("area" is the design vector; '
                    '"density" does not enter the static limit state)')
        r_names = [v["name"] for v in r_vars]
        r_ls = dict(reliability.get("limit_state") or {})
        if r_ls.get("type", "stress") != "stress":
            raise ValueError("RBDO supports the stress limit state")
        r_res = None
        r_limit = None
        if r_ls.get("variable") is not None:
            rn = r_ls["variable"]
            if rn not in r_names:
                raise ValueError(f"RBDO resistance variable {rn!r} is "
                                 f"not defined")
            r_res = r_names.index(rn)
            if r_vars[r_res]["kind"] != "resistance":
                raise ValueError(f'{rn!r} must have kind "resistance"')
        elif r_ls.get("limit") is not None:
            r_limit = float(r_ls["limit"])
        else:
            raise ValueError('RBDO limit_state needs "limit" or '
                             '"variable"')
        r_elems = r_ls.get("elements")
        r_idx = (np.arange(nelm_) if r_elems is None
                 else np.asarray(r_elems, dtype=int).reshape(-1))
        if np.any(r_idx < 0) or np.any(r_idx >= nelm_):
            raise ValueError("RBDO limit-state elements out of range")
        from .reliability import _nataf_cholesky

        r_chol = _nataf_cholesky(r_vars, reliability.get("correlation"))
        rel = {"varspecs": r_vars, "res_var": r_res, "limit_c": r_limit,
               "beta_t": beta_t, "ls_idx": r_idx, "chol": r_chol}

    from ..ops.host import (_geometry, density_values_host,
                            material_values_host)

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    nelm = data.dof_map.shape[0]
    young_np, area0_np = material_values_host(problem, 1.0)
    rho_np = density_values_host(problem, 1.0)
    _, _, inv_len_np, _ = _geometry(problem)
    lengths_np = 1.0 / inv_len_np
    if initial_areas is not None:
        area0_np = np.broadcast_to(
            np.asarray(initial_areas, dtype=float), (nelm,)).copy()
    area0_np = np.clip(area0_np, min_area * (1.0 + 1e-9),
                       None if max_area is None
                       else max_area * (1.0 - 1e-9))

    young_e = jnp.asarray(young_np, dtype)
    rho_e = jnp.asarray(rho_np, dtype)
    lengths = jnp.asarray(lengths_np, dtype)

    if probe_dofs is None:
        probe_np = problem.free_fixed()[0]
    else:
        probe_np = np.asarray(probe_dofs, dtype=int).reshape(-1)
    probe = jnp.asarray(probe_np)

    # Box parameterization: bounds hold at every iterate.
    if max_area is None:
        t0 = np.log(area0_np - min_area)

        def areas_of(t):
            return min_area + jnp.exp(t)
    else:
        p = (area0_np - min_area) / (max_area - min_area)
        p = np.clip(p, 1e-9, 1.0 - 1e-9)
        t0 = np.log(p / (1.0 - p))

        def areas_of(t):
            return min_area + (max_area - min_area) * jax.nn.sigmoid(t)

    cases_np = _load_cases_array(problem, load_cases)
    n_cases = 1 if cases_np is None else cases_np.shape[0]
    loads_dev = (None if cases_np is None
                 else jnp.asarray(cases_np, dtype))
    if case_weights is not None and cases_np is None:
        raise ValueError("case_weights needs load_cases")
    w_np = (np.ones(n_cases) if case_weights is None
            else np.asarray(case_weights, dtype=float).reshape(-1))
    if w_np.shape != (n_cases,):
        raise ValueError(f"case_weights must have one weight per case "
                         f"({n_cases}), got {w_np.shape}")
    if np.any(w_np < 0.0) or not np.any(w_np > 0.0):
        raise ValueError("case_weights must be nonnegative with at "
                         "least one positive entry")
    weights = jnp.asarray(w_np, dtype)

    mass0 = float(np.sum(rho_np * area0_np * lengths_np))
    # Reference scales keep the penalty ratio meaningful across unit
    # systems: the loss is dimensionless throughout.
    compliance0 = None
    if objective == "compliance":
        a_proj0 = area0_np * float(volume) / float(
            np.sum(area0_np * lengths_np))
        u0, _ = _host_area_solve(problem, a_proj0, loads=cases_np)
        f0 = (np.asarray(problem.loads, dtype=float) if cases_np is None
              else cases_np)
        compliance0 = max(abs(float(np.sum(w_np * np.atleast_1d(
            np.sum(np.atleast_2d(f0 * u0), axis=-1))))), 1e-30)

    lam_req = (None if min_frequency_hz is None
               else float((2.0 * np.pi * min_frequency_hz) ** 2))

    n_con = n_cases * ((nelm if stress_limit is not None else 0)
                       + (nelm if buckling_shape_factor is not None
                          else 0)
                       + (int(probe_np.size)
                          if displacement_limit is not None else 0)) \
        + (1 if lam_req is not None else 0) \
        + (nelm if fat is not None else 0) \
        + (int(rel["ls_idx"].size) if rel is not None else 0)
    pi2c = (None if buckling_shape_factor is None
            else np.pi ** 2 * float(buckling_shape_factor))
    if fat is not None:
        fat_om = jnp.asarray(fat["om"], dtype)
        fat_psd = jnp.asarray(fat["psd"], dtype)

        def fatigue_ratio_of(a):
            """r_e = (D_e·T_req)^(1/m) at areas `a` (traced)."""
            h2 = member_force_frf_sq(data, young_e, a, rho_e, fat_om,
                                     fat["alpha"], fat["beta"])
            s_sigma = h2 * fat_psd[:, None] / (a * a)
            return fatigue_life_ratio(fat_om, s_sigma, fat["m"],
                                      fat["c"], fat["life"],
                                      method=fat["method"])

        fatigue_ratio_jit = jax.jit(fatigue_ratio_of)
    if rel is not None:
        def rbdo_ratio_of(a):
            """PMA stress ratios at the target-beta design points."""
            return pma_stress_ratios(
                problem, data, young_e, rho_e, a, rel["varspecs"],
                rel["res_var"], rel["limit_c"], rel["beta_t"],
                rel["ls_idx"], chol=rel["chol"])

        rbdo_ratio_jit = jax.jit(rbdo_ratio_of)

    def objective_and_constraints(t):
        """(objective, g) with g the stacked constraint values — g ≤ 0
        feasible, in ratio units (|σ|/limit − 1, |u|/limit − 1)."""
        a = areas_of(t)
        if objective == "compliance":
            a = a * (volume / jnp.sum(a * lengths))
        u, sigma, _, mass = static_response_elem(
            problem, a, data=data, young_e=young_e, rho_e=rho_e,
            loads=loads_dev)
        if objective == "compliance":
            f = data.loads if loads_dev is None else loads_dev
            # Σ_c w_c f_c·u_c (a plain dot for the single-case path).
            obj = jnp.sum(weights * jnp.atleast_1d(
                jnp.sum(jnp.atleast_2d(f * u), axis=-1))) / compliance0
        else:
            obj = mass / mass0
        gs = []
        if stress_limit is not None:
            gs.append((jnp.abs(sigma) / stress_limit - 1.0).reshape(-1))
        if pi2c is not None:
            # Euler: (-sigma) <= pi^2 E c A / L^2 per member (tension
            # rows go deeply negative — inactive by construction).
            sig_cr = pi2c * young_e * a * data.inv_len ** 2
            gs.append(((-sigma) / sig_cr - 1.0).reshape(-1))
        if displacement_limit is not None:
            gs.append((jnp.abs(u[..., probe]) / displacement_limit
                       - 1.0).reshape(-1))
        if lam_req is not None:
            # λ₁ ≥ (2π f_min)² through the differentiable generalized
            # eigensolve — K(A) and M(A) both traced (see docstring).
            from .modal_inverse import modal_observables_elem

            lam, _ = modal_observables_elem(problem, young_e, a, rho_e,
                                            1, data=data)
            gs.append((1.0 - lam[0] / lam_req).reshape(1))
        if fat is not None:
            # Life floor per member: (D_e·T_req)^(1/m) ≤ 1, the fatigue
            # stress-ratio analogue (see `fatigue` in the docstring).
            gs.append((fatigue_ratio_of(a) - 1.0).reshape(-1))
        if rel is not None:
            # RBDO (PMA): the stress ratio at each member's target-beta
            # design point (see `reliability` in the docstring).
            gs.append((rbdo_ratio_of(a) - 1.0).reshape(-1))
        g = (jnp.concatenate(gs) if gs
             else jnp.zeros((0,), dtype))
        return obj, g

    def loss_fn(t, lam, mu):
        obj, g = objective_and_constraints(t)
        if n_con == 0:
            return obj
        # Rockafellar augmented Lagrangian for inequalities (constant
        # -λ²/4μ term dropped — it does not affect the gradient):
        # at an active constraint (g = 0, λ > 0) the gradient is λ·∇g,
        # the multiplier force, with no steep wall required.
        return obj + mu * jnp.sum(jnp.maximum(g + lam / (2.0 * mu),
                                              0.0) ** 2)

    @jax.jit
    def gd_step(t, opt, lam, mu, lr):
        loss, g = jax.value_and_grad(loss_fn)(t, lam, mu)
        d, opt = ADAM.update(g, opt)
        return t - lr * d, opt, loss

    @jax.jit
    def lam_update(t, lam, mu):
        _, g = objective_and_constraints(t)
        return jnp.maximum(lam + 2.0 * mu * g, 0.0)

    t = jnp.asarray(t0, dtype)
    lam = jnp.zeros((n_con,), dtype)
    mu = jnp.asarray(penalty, dtype)
    hist = []
    for r in range(outer_rounds):
        # The landscape changed (new λ, μ, lr): fresh optimizer state.
        lr = jnp.asarray(learning_rate * 0.5 ** r, dtype)
        opt = ADAM.init(t)
        for _ in range(n_iter):
            t, opt, loss = gd_step(t, opt, lam, mu, lr)
            hist.append(loss)      # device scalar: no per-iteration sync
        if n_con:
            lam = lam_update(t, lam, mu)
            mu = 2.0 * mu          # mild ramp — λ does the exact work
    # ONE device fetch (the identification family's round-trip rule).
    t, hist = jax.device_get((t, hist))

    areas = np.asarray(jax.device_get(areas_of(jnp.asarray(t, dtype))),
                       dtype=float)
    if not np.all(np.isfinite(areas)):
        # A silent NaN design (observed: a document that lost its
        # supports made K singular and the nan rode ADAM to the end,
        # reporting SUCCESS) must fail loudly instead.
        raise ValueError("sizing diverged to non-finite areas — check "
                         "supports (fixed_dofs), units and "
                         "learning_rate")
    if objective == "compliance":
        areas = areas * float(volume) / float(np.sum(areas * lengths_np))

    polish_viol = None
    if polish and objective != "compliance" \
            and (stress_limit is not None or fat is not None
                 or rel is not None):
        # Feasibility polish (float64 host): scale members up until the
        # limits hold.  Monotone — areas only grow — and for
        # near-optimal designs the added mass is the penalty method's
        # remaining violation, a fraction of a percent.  Stress/buckling
        # scale PER MEMBER (|sigma| ~ 1/A at fixed force); the fatigue
        # ratio scales UNIFORMLY: under A -> sA with structural mass
        # K, M and C = alpha M + beta K all scale by s, so the
        # member-force FRFs are exactly invariant and every stress
        # ratio falls as 1/s — whereas growing ONE member attracts
        # force to it and can make ITS ratio worse (measured: a braced
        # tower's per-member fatigue polish diverged 1.0008 -> 1.88 in
        # 20 passes; uniform converges in one).  The best evaluated
        # iterate is kept, so polish never returns a design worse than
        # it measured.  Compliance mode SKIPS polish: growing members
        # would break the exact volume budget, which is that mode's
        # hard constraint (its stress_limit is a soft penalty by
        # contract).
        best_viol, best_areas = float("inf"), areas.copy()
        # NOTE the uniform-scaling invariance is EXACT only with all-
        # structural mass: point_masses do not scale with A, so FRFs
        # shift under A -> sA and the fatigue/PMA ratio is only ~1/s.
        # The loop iterates to absorb that, the best evaluated iterate
        # is kept, and the RETURNED `converged` flag reports whether
        # feasibility was actually reached (no silent failure).
        for it_polish in range(21):
            ratio = np.zeros(nelm)
            if stress_limit is not None:
                _, sigma = _host_area_solve(problem, areas,
                                            loads=cases_np)
                ratio = np.abs(sigma) / stress_limit
                if pi2c is not None:
                    # Buckling ratio falls as 1/A^2 at fixed force, so
                    # the corrective scale is its square root.
                    sig_cr = pi2c * young_np * areas * inv_len_np ** 2
                    rb = np.maximum(-sigma, 0.0) / sig_cr
                    ratio = np.maximum(ratio, np.sqrt(rb))
                if ratio.ndim == 2:
                    ratio = np.max(ratio, axis=0)  # envelope per member
            fat_viol = 0.0
            if fat is not None:
                fat_viol = float(np.max(np.asarray(jax.device_get(
                    fatigue_ratio_jit(jnp.asarray(areas, dtype))),
                    dtype=float)))
            rel_viol = 0.0
            if rel is not None:
                # PMA ratio is a stress ratio at a FIXED u*-quantile
                # point: exactly 1/s under uniform scaling, same
                # uniform-polish argument as fatigue.
                rel_viol = float(np.max(np.asarray(jax.device_get(
                    rbdo_ratio_jit(jnp.asarray(areas, dtype))),
                    dtype=float)))
            viol = max(float(np.max(ratio)), fat_viol, rel_viol)
            if viol < best_viol:
                best_viol, best_areas = viol, areas.copy()
            if viol <= 1.0 + 1e-9 or it_polish == 20:
                break
            scale = np.maximum(ratio, 1.0)
            if fat is not None:
                scale = np.maximum(scale, fat_viol)   # uniform (above)
            if rel is not None:
                scale = np.maximum(scale, rel_viol)   # uniform (above)
            if max_area is not None:
                areas = np.minimum(areas * scale, max_area)
                if np.all((areas >= max_area - 1e-15) | (scale <= 1.0)):
                    break          # bound-limited: cannot polish further
            else:
                areas = areas * scale
        areas = best_areas
        polish_viol = best_viol

    u, sigma = _host_area_solve(problem, areas, loads=cases_np)
    env = _signed_envelope(sigma)
    abs_sigma = float(np.max(np.abs(sigma))) if nelm else 0.0
    buck_ratio = float("nan")
    if pi2c is not None:
        sig_cr = pi2c * young_np * areas * inv_len_np ** 2
        buck_ratio = float(np.max(np.maximum(-sigma, 0.0) / sig_cr))
    f1_hz = float("nan")
    if lam_req is not None:
        # Achieved f1 of the FINAL areas (polish may have grown members)
        # through the same eigensolve the constraint differentiated.
        from .modal_inverse import modal_observables_elem

        lam1 = np.asarray(jax.device_get(modal_observables_elem(
            problem, young_e, jnp.asarray(areas, dtype), rho_e, 1,
            data=data)[0]), dtype=float)[0]
        f1_hz = float(np.sqrt(max(lam1, 0.0)) / (2.0 * np.pi))
    fat_life = None
    min_life = float("nan")
    if fat is not None:
        # Achieved lives of the FINAL areas through the float64 HOST
        # authority (spectral_fatigue) — only the FRF sweep itself runs
        # traced (there is no host per-element-area FRF; the two damage
        # chains are pinned against each other in tests/test_sizing.py).
        from .fatigue import spectral_fatigue

        h2 = np.asarray(jax.device_get(member_force_frf_sq(
            data, young_e, jnp.asarray(areas, dtype), rho_e,
            jnp.asarray(fat["om"], dtype), fat["alpha"], fat["beta"])),
            dtype=float)
        s_sigma = h2 * fat["psd"][:, None] / (areas ** 2)[None, :]
        # spectral_fatigue refuses zero-variance PSDs by contract;
        # members the load pattern never stresses simply live forever.
        active = np.trapezoid(s_sigma, fat["om"], axis=0) > 0.0
        fat_life = np.full(nelm, np.inf)
        if np.any(active):
            sf = spectral_fatigue(fat["om"], s_sigma[:, active],
                                  fat["m"], fat["c"],
                                  method=fat["method"])
            fat_life[active] = np.atleast_1d(sf.life)
        min_life = float(np.min(fat_life)) if fat_life.size else float(
            "inf")
    rel_beta = None
    min_rel_beta = float("nan")
    if rel is not None:
        # Achieved betas of the FINAL areas by the FULL HL-RF search —
        # the authority the inner PMA/AMV loop approximates.
        from .reliability import form_reliability

        rres = form_reliability(
            problem, reliability["variables"],
            dict(reliability.get("limit_state") or {}),
            correlation=reliability.get("correlation"),
            data=data, areas=areas)
        rel_beta = np.asarray(rres.beta, dtype=float)
        min_rel_beta = float(np.min(rel_beta)) if rel_beta.size \
            else float("inf")
    return SizingResult(
        areas=areas,
        mass=_host_mass(problem, areas),
        mass_initial=mass0,
        displacements=u,
        stress=env,
        axial_forces=env * areas,
        max_stress_ratio=(abs_sigma / stress_limit
                          if stress_limit is not None else float("nan")),
        max_displacement_ratio=(
            float(np.max(np.abs(u[..., probe_np])) / displacement_limit)
            if displacement_limit is not None else float("nan")),
        history=np.asarray(hist, dtype=float),
        converged=bool(polish_viol is None
                       or polish_viol <= 1.0 + 1e-6),
        n_iter=len(hist),
        max_buckling_ratio=buck_ratio,
        fundamental_frequency_hz=f1_hz,
        fatigue_life_s=fat_life,
        min_fatigue_life_s=min_life,
        reliability_beta=rel_beta,
        min_reliability_beta=min_rel_beta,
    )
