"""FORM structural reliability: failure probabilities from the traced
solve.

The sizing family answers "what design carries the load"; this module
answers the ASSESSMENT question a design code actually encodes — "how
likely is THIS design to fail" under uncertain material, load and
resistance.  No counterpart exists in the reference
(rpacheco-blazquez/PINN-FEM is deterministic statics end to end); this
is the natural next use of the same differentiable machinery the
identification and sizing families run on: the Hasofer-Lind
reliability index is a CONSTRAINED OPTIMIZATION on the solve
(min ‖u‖ s.t. g(x(u)) = 0), and reverse-mode AD through
`static_response_elem` gives the exact limit-state gradients the HL-RF
iteration needs — no finite differences, any number of random
variables for one backward solve.

Method (first-order reliability, FORM):

1. Random variables X_v (normal or lognormal; Young's modulus / areas
   over element subsets, a global load scale, a resistance) map to
   independent standard normals by the exact marginal transform
   x = μ + σu (normal) or x = exp(λ + ζu) (lognormal, ζ² = ln(1+δ²),
   λ = ln μ − ζ²/2).
2. Each limit state g_i ≤ 0 = failure (member stress ratio or probe
   displacement ratio) defines a surface in u-space; the HL-RF
   fixpoint u ← (∇g·u − g)/‖∇g‖² ∇g walks to the most probable
   failure point (MPP) u*, and β_i = sign(g(0))·‖u*‖,
   p_f,i = Φ(−β_i).  FORM is invariant to how g parameterizes its
   surface — {1 − |σ|/R = 0} and {R − |σ| = 0} give the SAME β — which
   is what makes the closed-form anchors below exact.
3. All limit states run as ONE vmapped, jitted HL-RF program (each
   element's MPP search is independent — the same batching story as
   the harmonic sweep), and the series-system failure probability gets
   the simple bounds max_i p_f,i ≤ p_f,sys ≤ Σ_i p_f,i plus the
   α_i·α_j correlation matrix that tells a reader how far apart the
   failure modes are.
4. `monte_carlo_pf` cross-validates with the crude-Monte-Carlo
   estimate on the SAME traced response, vmapped over sample chunks —
   the brute-force ground truth FORM approximates (and the TPU-shaped
   way to compute it: thousands of dense solves as one batched
   program).

Closed-form anchors (tests/test_reliability.py): a determinate truss
makes member force N = c·S exactly linear in the load scale, so
R ~ N(μ_R, σ_R) vs S ~ N(μ_S, σ_S) has the EXACT index
β = (μ_R − |c|μ_S)/√(σ_R² + c²σ_S²), and the lognormal pair has
β = (λ_R − λ_S − ln|c|)/√(ζ_R² + ζ_S²).

Dense-tier only (the MPP search traces the dense masked solve, like
the rest of the inverse family) and runs on the local CPU tier through
`io/analysis.py`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import TrussProblem
from .sizing import static_response_elem

_DISTS = ("normal", "lognormal")
_KINDS = ("young", "area", "density", "load_scale", "resistance")


@dataclass
class ReliabilityResult:
    """FORM output + the Monte-Carlo cross-check when requested."""
    beta: np.ndarray            # (n_ls,) Hasofer-Lind indices
    pf: np.ndarray              # (n_ls,) Φ(−β)
    alpha: np.ndarray           # (n_ls, n_vars) MPP direction cosines
    design_point: np.ndarray    # (n_ls, n_vars) MPP in PHYSICAL space
    g_final: np.ndarray         # (n_ls,) residual g at the MPP
    converged: np.ndarray       # (n_ls,) bool
    labels: List[str]           # limit-state labels ("stress e3", ...)
    variables: List[str]        # variable names, alpha column order
    # Series-system bounds: max p_f,i <= p_f <= min(1, sum p_f,i).
    system_pf_lower: float = float("nan")
    system_pf_upper: float = float("nan")
    alpha_correlation: Optional[np.ndarray] = None   # (n_ls, n_ls)
    # Ditlevsen second-order series bounds (pairwise bivariate-normal
    # joint probabilities on the FORM linearizations) — always at least
    # as tight as the simple bounds above.
    system_pf_ditlevsen_lower: float = float("nan")
    system_pf_ditlevsen_upper: float = float("nan")
    n_iter: int = 0
    # SORM (Breitung) curvature-corrected probabilities (None unless
    # sorm=True): pf·det(I + β·A)^(-1/2) with A the limit surface's
    # scaled tangent Hessian at the MPP; falls back to the FORM value
    # where the asymptotic factor degenerates (1 + β·a_j ≤ 0.01).
    pf_sorm: Optional[np.ndarray] = None
    system_pf_sorm_lower: float = float("nan")
    system_pf_sorm_upper: float = float("nan")
    # Monte-Carlo cross-check (None unless run): series-system estimate.
    mc_pf: Optional[float] = None
    mc_std_error: Optional[float] = None
    mc_n: Optional[int] = None
    mc_pf_per_ls: Optional[np.ndarray] = None
    mc_method: Optional[str] = None      # "crude" | "importance"
    history: np.ndarray = field(
        default_factory=lambda: np.zeros(0))     # per-iter max |g|


def _norm_cdf(x):
    from math import erf, sqrt

    x = np.asarray(x, dtype=float)
    return 0.5 * (1.0 + np.vectorize(
        lambda v: erf(v / sqrt(2.0)))(x))


def _parse_variables(variables, nelm: int):
    """Validate + normalize the variable specs (see module docstring).

    Returns a list of dicts with: name, kind, dist, a/b (transform
    x = a + b·u for normal, x = exp(a + b·u) for lognormal), and an
    (nelm,) float mask for the element-field kinds.
    """
    if not variables:
        raise ValueError("reliability needs at least one random "
                         "variable")
    out = []
    names = set()
    for spec in variables:
        if "field" in spec:
            raise ValueError('"field" variables (spatially correlated '
                             'random fields) are supported by the '
                             'reliability analysis only — expand or '
                             'drop the field spec here')
        name = spec.get("name")
        if not name or name in names:
            raise ValueError("every variable needs a unique name")
        names.add(name)
        kind = spec.get("kind")
        if kind not in _KINDS:
            raise ValueError(f"variable kind must be one of {_KINDS}, "
                             f"got {kind!r}")
        dist = spec.get("distribution", "lognormal"
                        if kind != "load_scale" else "normal")
        if dist not in _DISTS:
            raise ValueError(f"distribution must be one of {_DISTS}, "
                             f"got {dist!r}")
        mean = float(spec["mean"])
        if "std" in spec:
            std = float(spec["std"])
        elif "cov" in spec:
            std = float(spec["cov"]) * abs(mean)
        else:
            raise ValueError(f'variable "{name}" needs "std" or "cov"')
        if std <= 0.0:
            raise ValueError(f'variable "{name}" needs positive spread')
        if dist == "lognormal":
            if mean <= 0.0:
                raise ValueError(f'lognormal "{name}" needs a positive '
                                 f'mean')
            delta = std / mean
            zeta = float(np.sqrt(np.log1p(delta * delta)))
            lam = float(np.log(mean) - 0.5 * zeta * zeta)
            a, b = lam, zeta
        else:
            a, b = mean, std
        mask = None
        if kind in ("young", "area", "density"):
            m = np.zeros(nelm)
            elems = spec.get("elements")
            if elems is None:
                m[:] = 1.0
            else:
                idx = np.asarray(elems, dtype=int).reshape(-1)
                if idx.size == 0 or np.any(idx < 0) \
                        or np.any(idx >= nelm):
                    raise ValueError(f'variable "{name}": bad element '
                                     f'subset')
                m[idx] = 1.0
            mask = m
        out.append({"name": name, "kind": kind, "dist": dist,
                    "a": a, "b": b, "mask": mask, "mean": mean})
    return out


_PHI2_GAUSS: dict = {}     # cached Gauss-Legendre rules (per order)


def _phi2(a, b, rho, n_gauss: int = 64):
    """P(Z1 <= a, Z2 <= b) for standard bivariate normal with
    correlation rho — Owen's single-integral form
    Phi2 = Phi(a)Phi(b) + integral_0^rho phi2(a, b; r) dr, Gauss-Legendre
    on r (dependency-free; pinned against scipy's mvn in the tests).
    Degenerate |rho| -> 1 handled analytically."""
    a = float(a)
    b = float(b)
    rho = float(rho)
    pa, pb = float(_norm_cdf(a)), float(_norm_cdf(b))
    # f32 alpha dot products land within ~1e-7 of ±1 for (anti)parallel
    # events, where the Gauss integral is near-singular — take the
    # analytic degenerate value well before that.
    if rho >= 1.0 - 1e-6:
        return min(pa, pb)
    if rho <= -1.0 + 1e-6:
        return max(0.0, pa + pb - 1.0)
    if abs(rho) < 1e-14:
        return pa * pb
    if n_gauss not in _PHI2_GAUSS:
        _PHI2_GAUSS[n_gauss] = np.polynomial.legendre.leggauss(n_gauss)
    x, w = _PHI2_GAUSS[n_gauss]
    r = 0.5 * rho * (x + 1.0)
    jac = 0.5 * rho
    one = 1.0 - r * r
    dens = np.exp(-(a * a - 2.0 * r * a * b + b * b) / (2.0 * one)) \
        / (2.0 * np.pi * np.sqrt(one))
    return pa * pb + float(jac * np.dot(w, dens))


def _ditlevsen_bounds(betas, alphas):
    """Second-order series-system bounds (Ditlevsen 1979) from the
    FORM pairwise joint probabilities p_ij = Phi2(-b_i, -b_j; a_i·a_j),
    events ordered by descending p_f (the standard tightest ordering).
    Infinite-beta (unreachable) events drop out.  Returns (lo, hi)."""
    finite = np.isfinite(betas)
    bs = np.asarray(betas, dtype=float)[finite]
    al = np.asarray(alphas, dtype=float)[finite]
    if bs.size == 0:
        return 0.0, 0.0
    pf = _norm_cdf(-bs)
    order = np.argsort(-pf)
    bs, al, pf = bs[order], al[order], pf[order]
    n = bs.size
    if n == 1:
        return float(pf[0]), float(pf[0])
    pij = np.zeros((n, n))
    for i in range(n):
        for j in range(i):
            rho = float(np.clip(al[i] @ al[j], -1.0, 1.0))
            pij[i, j] = _phi2(-bs[i], -bs[j], rho)
    lo = pf[0]
    hi = pf[0]
    for i in range(1, n):
        lo += max(0.0, pf[i] - float(np.sum(pij[i, :i])))
        hi += pf[i] - float(np.max(pij[i, :i]))
    return float(min(lo, 1.0)), float(min(max(hi, lo), 1.0))


def _parse_variables_with_fields(variables, nelm: int, midpoints):
    """_parse_variables plus RANDOM-FIELD expansion: a material
    variable carrying {"field": {"correlation_length": L}} becomes one
    variable PER ELEMENT (same marginal, one-hot mask) with the
    exponential spatial model rho_phys(d) = exp(-d/L) between element
    midpoints — the classic stochastic-FEM discretization (midpoint
    method), riding the same Nataf machinery as user correlations.

    Returns (varspecs, rz_base): the expanded spec list and the
    Gaussian-space correlation matrix seeded with the field blocks
    (identity elsewhere; None when no field is present).  User
    `correlation` pairs may not name a field variable (its name no
    longer exists after expansion — the pair validator rejects it).
    """
    if not variables:
        raise ValueError("reliability needs at least one random "
                         "variable")
    expanded = []
    field_groups = []            # (first_index, element_ids, L, spec)
    for spec in variables:
        fld = spec.get("field")
        if fld is None:
            expanded.append(dict(spec))
            continue
        if spec.get("kind") not in ("young", "area", "density"):
            raise ValueError('"field" needs a material kind '
                             '(young / area / density)')
        ln = float(fld.get("correlation_length", 0.0))
        if ln <= 0.0:
            raise ValueError('"field" needs a positive '
                             '"correlation_length"')
        elems = spec.get("elements")
        ids = (np.arange(nelm) if elems is None
               else np.asarray(elems, dtype=int).reshape(-1))
        first = len(expanded)
        for e in ids:
            sub = {k: v for k, v in spec.items()
                   if k not in ("field", "elements", "name")}
            sub["name"] = f'{spec["name"]}#e{int(e)}'
            sub["elements"] = [int(e)]
            expanded.append(sub)
        field_groups.append((first, ids, ln, spec))
    varspecs = _parse_variables(
        [{k: v for k, v in sp.items()} for sp in expanded], nelm)
    if not field_groups:
        return varspecs, None
    n = len(varspecs)
    rz = np.eye(n)
    for first, ids, ln, spec in field_groups:
        for a in range(ids.size):
            va = varspecs[first + a]
            for b in range(a + 1, ids.size):
                vb = varspecs[first + b]
                d = float(np.linalg.norm(midpoints[ids[a]]
                                         - midpoints[ids[b]]))
                rho = float(np.exp(-d / ln))
                if va["dist"] == "lognormal":
                    delta = float(np.sqrt(np.expm1(va["b"] ** 2)))
                    r = float(np.log1p(rho * delta * delta)
                              / (va["b"] * vb["b"]))
                else:
                    r = rho
                rz[first + a, first + b] = r
                rz[first + b, first + a] = r
    return varspecs, rz


def _physical(var, u):
    """x_v(u_v), traced."""
    x = var["a"] + var["b"] * u
    return jnp.exp(x) if var["dist"] == "lognormal" else x


def _nataf_cholesky(varspecs, correlation, rz_base=None):
    """Lower Cholesky factor of the GAUSSIAN-space correlation matrix
    (Nataf / Gaussian-copula model) from pairwise PHYSICAL-space
    correlations [[name_i, name_j, rho], ...].

    For the marginals here the copula adjustment is CLOSED FORM — no
    integral equation: normal–normal keeps rho; lognormal–lognormal
    uses rho_z = ln(1 + rho*delta_i*delta_j)/(zeta_i*zeta_j); a
    normal–lognormal pair uses rho_z = rho*delta_ln/zeta_ln.  (delta is
    the physical CoV, zeta the log-std.)  Returns None when no
    correlation is given.
    """
    if not correlation and rz_base is None:
        return None
    names = [v["name"] for v in varspecs]
    n = len(varspecs)
    rz = np.eye(n) if rz_base is None else np.asarray(rz_base,
                                                     dtype=float).copy()
    for entry in (correlation or ()):
        if len(entry) != 3:
            raise ValueError('correlation entries are '
                             '[name_i, name_j, rho]')
        na, nb, rho = entry
        if na not in names or nb not in names or na == nb:
            raise ValueError(f"bad correlation pair ({na!r}, {nb!r})")
        rho = float(rho)
        if not -1.0 < rho < 1.0:
            raise ValueError("correlation must be in (-1, 1)")
        i, j = names.index(na), names.index(nb)
        vi, vj = varspecs[i], varspecs[j]

        def delta(v):
            # physical CoV of a lognormal from its zeta
            return float(np.sqrt(np.expm1(v["b"] ** 2)))

        if vi["dist"] == "normal" and vj["dist"] == "normal":
            r = rho
        elif vi["dist"] == "lognormal" and vj["dist"] == "lognormal":
            r = float(np.log1p(rho * delta(vi) * delta(vj))
                      / (vi["b"] * vj["b"]))
        else:
            ln = vi if vi["dist"] == "lognormal" else vj
            r = rho * delta(ln) / ln["b"]
        if not -1.0 < r < 1.0:
            raise ValueError(f"correlation ({na}, {nb}) = {rho} is "
                             f"infeasible for these marginals "
                             f"(Gaussian-space {r:.3f})")
        rz[i, j] = rz[j, i] = r
    try:
        return np.linalg.cholesky(rz)
    except np.linalg.LinAlgError:
        raise ValueError("correlation matrix is not positive definite")


def form_core(ratios_all, varspecs, chol, labels, n_iter: int = 50,
              tol: float = 1e-4, mc_samples: int = 0,
              mc_seed: int = 0, mesh=None):
    """Shared FORM driver over a traced demand/capacity `ratios_all`:
    vmapped HL-RF, unreachable-surface reset (zero-demand limit states
    are β = ∞ / p_f = 0, NOT β = 0 / p_f = 0.5 — the measured frame
    regression), physical design points through the optional Nataf
    factor, simple + Ditlevsen bounds, optional crude MC.  Used by the
    frame family; form_reliability below predates it and keeps its own
    driver for the SORM/importance extensions — fixes to convergence
    semantics belong HERE first and there second.
    """
    n_vars = len(varspecs)
    n_ls = len(labels)
    dtype = jnp.asarray(1.0).dtype

    def g_one(u, i):
        return 1.0 - ratios_all(u)[i]

    g_grad = jax.value_and_grad(g_one)

    def hlrf(i):
        u0 = jnp.zeros((n_vars,), dtype)

        def body(_, u):
            g, dg = g_grad(u, i)
            nrm2 = jnp.maximum(jnp.dot(dg, dg), 1e-30)
            return (jnp.dot(dg, u) - g) / nrm2 * dg

        u_star = jax.lax.fori_loop(0, n_iter, body, u0)
        g_star, dg_star = g_grad(u_star, i)
        g_mean = g_one(u0, i)
        beta = jnp.sign(g_mean) * jnp.linalg.norm(u_star)
        nrm = jnp.maximum(jnp.linalg.norm(dg_star), 1e-30)
        return beta, -dg_star / nrm, u_star, g_star, g_mean

    # np.array (copying), NOT np.asarray: under PINN_FEM_TPU_X64 the
    # fetched buffers are already float64 and asarray returns
    # READ-ONLY views — the in-place unreachable-masking below then
    # raises (measured; f32 fetches always copied via the dtype cast,
    # which is why the default path never saw it).
    betas, alphas, u_stars, g_stars, g0s = (
        np.array(v, dtype=float) for v in jax.device_get(
            jax.jit(jax.vmap(hlrf))(jnp.arange(n_ls))))
    unreachable = (~np.isfinite(betas) | (np.abs(g_stars) >= tol)
                   | (np.abs(betas) < 1e-12)) & (g0s > 1.0 - 1e-3)
    betas[unreachable] = np.inf
    g_stars[unreachable] = 0.0
    alphas[unreachable] = 0.0
    u_stars[unreachable] = 0.0
    converged = ((np.abs(g_stars) < tol) & np.isfinite(betas)) \
        | unreachable
    pf = _norm_cdf(-betas)
    z_stars = u_stars if chol is None else u_stars @ chol.T
    xp = np.zeros((n_ls, n_vars))
    for j, v in enumerate(varspecs):
        x = v["a"] + v["b"] * z_stars[:, j]
        xp[:, j] = np.exp(x) if v["dist"] == "lognormal" else x
    dit_lo, dit_hi = _ditlevsen_bounds(betas, alphas)
    result = ReliabilityResult(
        beta=betas, pf=pf, alpha=alphas, design_point=xp,
        g_final=g_stars, converged=converged, labels=list(labels),
        variables=[v["name"] for v in varspecs],
        system_pf_lower=float(np.max(pf)),
        system_pf_upper=float(min(1.0, np.sum(pf))),
        system_pf_ditlevsen_lower=dit_lo,
        system_pf_ditlevsen_upper=dit_hi,
        alpha_correlation=alphas @ alphas.T, n_iter=n_iter)
    if mc_samples:
        result = _attach_monte_carlo(result, ratios_all, n_ls,
                                     int(mc_samples), int(mc_seed),
                                     1024, dtype, n_vars, mesh=mesh)
    return result


def form_reliability(
    problem: TrussProblem,
    variables: List[Dict],
    limit_state: Dict,
    n_iter: int = 50,
    tol: float = 1e-4,
    mc_samples: int = 0,
    mc_seed: int = 0,
    mc_chunk: int = 1024,
    mc_method: str = "crude",
    sorm: bool = False,
    correlation=None,
    data=None,
    areas=None,
    mesh=None,
) -> ReliabilityResult:
    """FORM β / p_f for every requested limit state (module docstring).

    limit_state: {"type": "stress", "limit": R | "variable": name,
                  "elements": [..]}          # default: all members
              or {"type": "displacement", "limit": d,
                  "probe_dofs": [..]}        # one LS per probed DOF
    mc_samples > 0 adds the Monte-Carlo cross-check (series system and
    per-limit-state), chunk-vmapped over the same traced response.
    mc_method "importance" centers a mixture proposal on the dominant
    MPPs (β ≤ β_min + 2) so small failure probabilities (β ≳ 3, where
    crude MC sees nothing) are estimated with a few thousand samples —
    the variance-reduced ground truth for exactly the regimes FORM is
    used in.  sorm=True adds the Breitung second-order correction
    pf·det(I + βA)^(-1/2) (A = TᵀHT/‖∇g‖ at the MPP, jax.hessian
    through the whole traced chain): exact for the parabolic surface
    pf = Φ(−β)·(1+2aβ)^(-1/2), and a strict no-op on surfaces linear
    in u.  `areas` (nelm,) overrides the problem's member areas —
    how RBDO re-assesses ITS design (optimize_sizing's final authority
    check) without rebuilding the problem.
    """
    from ..ops.host import (_geometry, density_values_host,
                            material_values_host)
    from .newton import DENSE_DOF_LIMIT

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(f"FORM traces the dense solve "
                         f"({problem.ndof} DOFs > {DENSE_DOF_LIMIT}); "
                         f"assess on a coarser model")
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    nelm = data.dof_map.shape[0]
    midpoints = _geometry(problem)[3]
    varspecs, rz_base = _parse_variables_with_fields(
        variables, nelm, midpoints)
    n_vars = len(varspecs)
    var_names = [v["name"] for v in varspecs]

    young_np, area_np = material_values_host(problem, 1.0)
    if areas is not None:
        area_np = np.broadcast_to(np.asarray(areas, dtype=float),
                                  (nelm,))
    rho_np = density_values_host(problem, 1.0)
    base = {"young": jnp.asarray(young_np, dtype),
            "area": jnp.asarray(area_np, dtype),
            "density": jnp.asarray(rho_np, dtype)}
    masks = {i: jnp.asarray(v["mask"], dtype)
             for i, v in enumerate(varspecs) if v["mask"] is not None}
    chol = _nataf_cholesky(varspecs, correlation, rz_base=rz_base)
    chol_d = None if chol is None else jnp.asarray(chol, dtype)

    def z_of(u):
        """Correlated Gaussian coordinates (identity without a
        correlation model)."""
        return u if chol_d is None else chol_d @ u

    ls_type = limit_state.get("type", "stress")
    res_var = None
    if ls_type == "stress":
        if limit_state.get("variable") is not None:
            rname = limit_state["variable"]
            if rname not in var_names:
                raise ValueError(f'limit-state resistance variable '
                                 f'{rname!r} is not defined')
            res_var = var_names.index(rname)
            if varspecs[res_var]["kind"] != "resistance":
                raise ValueError(f'{rname!r} must have kind '
                                 f'"resistance"')
        elif limit_state.get("limit") is None:
            raise ValueError('stress limit state needs "limit" or '
                             '"variable"')
        elems = limit_state.get("elements")
        ls_idx = (np.arange(nelm) if elems is None
                  else np.asarray(elems, dtype=int).reshape(-1))
        if np.any(ls_idx < 0) or np.any(ls_idx >= nelm):
            raise ValueError("limit-state elements out of range")
        labels = [f"stress e{int(e)}" for e in ls_idx]
    elif ls_type == "displacement":
        if limit_state.get("limit") is None:
            raise ValueError('displacement limit state needs "limit"')
        pd = limit_state.get("probe_dofs")
        if pd is None:
            raise ValueError("displacement limit state needs "
                             "probe_dofs")
        ls_idx = np.asarray(pd, dtype=int).reshape(-1)
        if np.any(ls_idx < 0) or np.any(ls_idx >= problem.ndof):
            raise ValueError("probe_dofs out of range")
        labels = [f"displacement dof{int(d)}" for d in ls_idx]
    elif ls_type == "fatigue":
        # Fatigue reliability: the member's Dirlik/narrow-band life
        # under a stationary random load becomes the limit state,
        # r = (D·T_req)^(1/m) — the whole spectral chain (FRF sweep →
        # stress PSD → closed-form damage) sits INSIDE g, so the MPP
        # search differentiates through resonance shifts and the S-N
        # curve.  The Basquin C may be the resistance variable (the
        # standard uncertain-material-curve setting).
        fat_ls = limit_state.get("fatigue")
        if not fat_ls:
            raise ValueError('fatigue limit state needs a "fatigue" '
                             'spec {psd, omegas, damping, sn, method}')
        if limit_state.get("min_life_s") is None:
            raise ValueError('fatigue limit state needs "min_life_s"')
        f_life = float(limit_state["min_life_s"])
        if f_life <= 0.0:
            raise ValueError("min_life_s must be positive")
        sn = fat_ls.get("sn") or {}
        if sn.get("exponent") is None:
            raise ValueError('fatigue limit state needs "sn": '
                             '{"exponent": m, ...}')
        f_m = float(sn["exponent"])
        if f_m <= 0.0:
            raise ValueError("S-N exponent must be positive")
        if limit_state.get("variable") is not None:
            rname = limit_state["variable"]
            if rname not in var_names:
                raise ValueError(f'limit-state resistance variable '
                                 f'{rname!r} is not defined')
            res_var = var_names.index(rname)
            if varspecs[res_var]["kind"] != "resistance":
                raise ValueError(f'{rname!r} must have kind '
                                 f'"resistance"')
        elif sn.get("coefficient") is None:
            raise ValueError('fatigue limit state needs '
                             'sn.coefficient or a resistance '
                             '"variable" playing the Basquin C')
        f_om = np.asarray(fat_ls.get("omegas", ()),
                          dtype=float).reshape(-1)
        if f_om.size < 4 or np.any(np.diff(f_om) <= 0.0) \
                or f_om[0] <= 0.0:
            raise ValueError('fatigue limit state needs an ascending '
                             'positive "omegas" sweep (>= 4 points)')
        f_psd = np.broadcast_to(
            np.asarray(fat_ls.get("psd", 1.0), dtype=float),
            f_om.shape).copy()
        f_damp = fat_ls.get("damping", (0.0, 0.0))
        f_method = fat_ls.get("method", "dirlik")
        if f_method not in ("dirlik", "narrowband"):
            raise ValueError('fatigue method must be "dirlik" or '
                             '"narrowband"')
        elems = limit_state.get("elements")
        ls_idx = (np.arange(nelm) if elems is None
                  else np.asarray(elems, dtype=int).reshape(-1))
        if np.any(ls_idx < 0) or np.any(ls_idx >= nelm):
            raise ValueError("limit-state elements out of range")
        labels = [f"fatigue e{int(e)}" for e in ls_idx]
        f_om_d = jnp.asarray(f_om, dtype)
        f_psd_d = jnp.asarray(f_psd, dtype)
        f_coeff = (None if sn.get("coefficient") is None
                   else float(sn["coefficient"]))
    elif ls_type == "frequency":
        # Natural-frequency floor as a limit state: failure when the
        # structure's f1 drops below the requirement under stiffness/
        # mass scatter (the dynamic serviceability complement of the
        # sizing family's deterministic min_frequency_hz).  Rides the
        # same traced generalized eigensolve the identification and
        # RBDO families use (modal_inverse.modal_observables_elem), so
        # the MPP search differentiates K(X) AND M(X).
        if limit_state.get("min_frequency_hz") is None:
            raise ValueError('frequency limit state needs '
                             '"min_frequency_hz"')
        f_req = float(limit_state["min_frequency_hz"])
        if f_req <= 0.0:
            raise ValueError("min_frequency_hz must be positive")
        lam_req = (2.0 * np.pi * f_req) ** 2
        ls_idx = np.zeros(1, dtype=int)
        labels = [f"frequency f1>={f_req:g}Hz"]
    else:
        raise ValueError('limit_state type must be "stress", '
                         '"displacement", "fatigue" or "frequency"')
    limit_c = (None if limit_state.get("limit") is None
               else float(limit_state["limit"]))
    n_ls = int(ls_idx.size)
    ls_idx_d = jnp.asarray(ls_idx)

    def fields(u):
        """Per-element material fields + load scale at coordinates u."""
        z = z_of(u)
        young_e = base["young"]
        area_e = base["area"]
        rho_e = base["density"]
        scale = jnp.asarray(1.0, dtype)
        for i, v in enumerate(varspecs):
            x = _physical(v, z[i])
            if v["kind"] == "load_scale":
                scale = scale * x
            elif v["kind"] != "resistance":
                m = masks[i]
                arr = {"young": young_e, "area": area_e,
                       "density": rho_e}[v["kind"]]
                arr = arr * (1.0 - m) + x * m
                if v["kind"] == "young":
                    young_e = arr
                elif v["kind"] == "area":
                    area_e = arr
                else:
                    rho_e = arr
        return young_e, area_e, rho_e, scale

    def response(u):
        """(u_field, sigma) at standard-normal coordinates u."""
        young_e, area_e, rho_e, scale = fields(u)
        uu, sigma, _, _ = static_response_elem(
            problem, area_e, data=data, young_e=young_e, rho_e=rho_e,
            loads=data.loads * scale)
        return uu, sigma

    def ratios_all(u):
        """(n_ls,) demand/capacity ratios — failure iff ratio >= 1.
        The single definition serves g (FORM), the MC indicator and the
        unreachable-surface test."""
        if ls_type == "fatigue":
            from .sizing import fatigue_life_ratio, member_force_frf_sq

            young_e, area_e, rho_e, scale = fields(u)
            h2 = member_force_frf_sq(
                data, young_e, area_e, rho_e, f_om_d,
                float(f_damp[0]), float(f_damp[1]))[:, ls_idx_d]
            a_sel = area_e[ls_idx_d]
            s_sigma = h2 * (f_psd_d * scale * scale)[:, None] \
                / (a_sel * a_sel)[None, :]
            if res_var is not None:
                c = _physical(varspecs[res_var], z_of(u)[res_var])
            else:
                c = jnp.asarray(f_coeff, dtype)
            return fatigue_life_ratio(f_om_d, s_sigma, f_m, c, f_life,
                                      method=f_method)
        if ls_type == "frequency":
            from .modal_inverse import modal_observables_elem

            young_e, area_e, rho_e, _ = fields(u)
            lam1 = modal_observables_elem(problem, young_e, area_e,
                                          rho_e, 1, data=data)[0][0]
            # failure iff lam1 <= lam_req: ratio = lam_req / lam1.
            return (jnp.asarray(lam_req, dtype)
                    / jnp.maximum(lam1, 1e-30)).reshape(1)
        uu, sigma = response(u)
        if ls_type == "stress":
            demand = jnp.abs(sigma)[ls_idx_d]
            if res_var is not None:
                r = _physical(varspecs[res_var], z_of(u)[res_var])
            else:
                r = jnp.asarray(limit_c, dtype)
        else:
            demand = jnp.abs(uu)[ls_idx_d]
            r = jnp.asarray(limit_c, dtype)
        return demand / r

    def g_one(u, i):
        """Limit state i at u: g > 0 safe, g <= 0 failed."""
        return 1.0 - ratios_all(u)[i]

    g_grad = jax.value_and_grad(g_one)

    def hlrf(i):
        """HL-RF fixpoint for limit state i; (u*, g*, iters of |g|)."""
        u0 = jnp.zeros((n_vars,), dtype)

        def body(_, carry):
            u, hist_g, k = carry
            g, dg = g_grad(u, i)
            nrm2 = jnp.maximum(jnp.dot(dg, dg), 1e-30)
            u_new = (jnp.dot(dg, u) - g) / nrm2 * dg
            return u_new, hist_g.at[k].set(jnp.abs(g)), k + 1

        hist0 = jnp.zeros((n_iter,), dtype)
        u_star, hist, _ = jax.lax.fori_loop(0, n_iter, body,
                                            (u0, hist0, 0))
        g_star, dg_star = g_grad(u_star, i)
        g_mean = g_one(jnp.zeros((n_vars,), dtype), i)
        beta = jnp.sign(g_mean) * jnp.linalg.norm(u_star)
        nrm = jnp.maximum(jnp.linalg.norm(dg_star), 1e-30)
        alpha = -dg_star / nrm
        return beta, alpha, u_star, g_star, g_mean, hist

    betas, alphas, u_stars, g_stars, g0s, hists = jax.jit(
        jax.vmap(hlrf))(jnp.arange(n_ls))
    betas, alphas, u_stars, g_stars, g0s, hists = (
        np.asarray(v, dtype=float) for v in jax.device_get(
            (betas, alphas, u_stars, g_stars, g0s, hists)))

    # Unreachable surfaces: a member the load pattern never stresses
    # has g ≈ 1 everywhere (demand/R ~ 0), no zero crossing for HL-RF
    # to find — the honest answer is β = ∞, p_f = 0, not a NaN from
    # the degenerate fixpoint (observed on gauge members in RBDO's
    # authority recompute).
    unreachable = (~np.isfinite(betas) | (np.abs(g_stars) >= tol)) \
        & (g0s > 1.0 - 1e-3)
    betas[unreachable] = np.inf
    g_stars[unreachable] = 0.0
    alphas[unreachable] = 0.0
    u_stars[unreachable] = 0.0      # design point = the mean (finite)

    # Physical-space design points (host, float64) — through the
    # dependence model when one is installed, AFTER the unreachable
    # rows were reset (their u* from the degenerate fixpoint can be
    # NaN/huge; the mean is the honest design point).
    z_stars = u_stars if chol is None else u_stars @ chol.T
    xp = np.zeros((n_ls, n_vars))
    for j, v in enumerate(varspecs):
        x = v["a"] + v["b"] * z_stars[:, j]
        xp[:, j] = np.exp(x) if v["dist"] == "lognormal" else x

    # Convergence: the MPP must sit ON the surface.  g is a ratio
    # (O(1) by construction), so `tol` is an absolute-IS-relative
    # threshold on |g(u*)| (the classification knob; the fixpoint
    # itself always runs n_iter vmapped steps — lanes converge at
    # different rates and a fixed fori_loop is the batched form).
    converged = ((np.abs(g_stars) < tol) & np.isfinite(betas)) \
        | unreachable
    pf = _norm_cdf(-betas)

    sys_lo = float(np.max(pf)) if n_ls else float("nan")
    sys_hi = float(min(1.0, np.sum(pf))) if n_ls else float("nan")
    dit_lo, dit_hi = _ditlevsen_bounds(betas, alphas) if n_ls \
        else (float("nan"), float("nan"))
    corr = alphas @ alphas.T if n_ls else None

    result = ReliabilityResult(
        beta=betas, pf=pf, alpha=alphas, design_point=xp,
        g_final=g_stars, converged=converged, labels=labels,
        variables=var_names, system_pf_lower=sys_lo,
        system_pf_upper=sys_hi,
        system_pf_ditlevsen_lower=dit_lo,
        system_pf_ditlevsen_upper=dit_hi,
        alpha_correlation=corr, n_iter=n_iter,
        history=np.max(hists, axis=0) if n_ls else np.zeros(0))

    if sorm and n_ls:
        # Breitung: pf·det(I_{n−1} + β·A)^(−1/2), A = TᵀHT/‖∇g‖ at the
        # MPP with T an orthonormal tangent basis (QR completion of α).
        # Derivation: on the surface, the distance along α is
        # β + ½tᵀAt, so pf = E_t[Φ(−β−½tᵀAt)] ≈ Φ(−β)·E[e^(−β·½tᵀAt)].
        def tangent_eigs(i, u_star):
            h = jax.hessian(g_one)(u_star, i)
            _, dg = g_grad(u_star, i)
            nrm = jnp.maximum(jnp.linalg.norm(dg), 1e-30)
            alpha_v = -dg / nrm
            q, _ = jnp.linalg.qr(alpha_v[:, None], mode="complete")
            t_basis = q[:, 1:]
            a_mat = t_basis.T @ h @ t_basis / nrm
            return jnp.linalg.eigvalsh(a_mat)

        safe_u = np.where(np.isfinite(u_stars), u_stars, 0.0)
        eigs = np.asarray(jax.device_get(jax.jit(jax.vmap(
            tangent_eigs))(jnp.arange(n_ls),
                           jnp.asarray(safe_u, dtype))), dtype=float)
        with np.errstate(invalid="ignore"):
            factors = 1.0 + betas[:, None] * eigs
        ok_rows = np.isfinite(betas) & np.all(factors > 0.01, axis=1)
        det_fac = np.where(ok_rows,
                           np.prod(np.where(ok_rows[:, None],
                                            np.maximum(factors, 0.01),
                                            1.0), axis=1) ** -0.5,
                           1.0)
        pf_sorm = np.where(np.isfinite(betas), pf * det_fac, 0.0)
        result.pf_sorm = pf_sorm
        result.system_pf_sorm_lower = float(np.max(pf_sorm))
        result.system_pf_sorm_upper = float(min(1.0, np.sum(pf_sorm)))

    if mc_samples and mc_samples > 0:
        if mc_method not in ("crude", "importance"):
            raise ValueError('mc_method must be "crude" or '
                             '"importance"')
        result = _attach_monte_carlo(result, ratios_all, n_ls,
                                     int(mc_samples), int(mc_seed),
                                     int(mc_chunk), dtype, n_vars,
                                     method=mc_method, betas=betas,
                                     u_stars=u_stars, mesh=mesh)
    return result


def _attach_monte_carlo(result, ratios_all, n_ls, n_samples, seed,
                        chunk, dtype, n_vars, method="crude",
                        betas=None, u_stars=None, mesh=None):
    """Monte Carlo on the same traced demand/capacity ratios,
    chunk-vmapped — the ground truth FORM approximates, shaped as
    batched dense solves (the TPU-scalable form of the estimate).

    method "crude": u ~ N(0, I), pf = mean(fail).
    method "importance": the proposal is an equal-weight Gaussian
    mixture centered on the DOMINANT MPPs (finite β ≤ β_min + 2) —
    every sample lands near a failure surface, so β ≳ 3 probabilities
    (invisible to crude MC) get tight estimates from a few thousand
    samples.  The likelihood ratio w = φ(u)/q(u) is computed host-side
    in float64 via logsumexp; estimates are the standard
    self-normalization-free IS mean and its sample standard error.

    `mesh`: optional jax.sharding.Mesh — thousands of INDEPENDENT
    dense solves are the canonical SPMD workload (round-4 VERDICT
    #4b), so the sample axis dp-shards over the mesh: the chunk is
    rounded up to a "dp" multiple, u enters P("dp", None)-sharded,
    each device runs its slice of the vmapped solves, and the only
    cross-device traffic is the boolean failure table at the jit
    boundary.  Estimates are bit-identical to the unsharded path
    (same samples, same chunking — the padding rows carry zero
    weight); __graft_entry__.dryrun_multichip pins n-dev == 1-dev.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["dp"]
        chunk = -(-int(chunk) // dp) * dp
        shard = NamedSharding(mesh, P("dp"))
        fail_batch = jax.jit(jax.vmap(lambda u: ratios_all(u) >= 1.0),
                             in_shardings=shard, out_shardings=shard)
    else:
        fail_batch = jax.jit(jax.vmap(lambda u: ratios_all(u) >= 1.0))
    rng = np.random.default_rng(seed)
    centers = None
    if method == "importance":
        finite = np.isfinite(betas)
        if not np.any(finite):
            raise ValueError("importance sampling needs at least one "
                             "finite-beta limit state")
        bmin = float(np.min(betas[finite]))
        dom = finite & (betas <= bmin + 2.0)
        centers = np.asarray(u_stars[dom], dtype=float)   # (K, n)
    s_w_sys = s_w2_sys = 0.0
    s_w_ls = np.zeros(n_ls)
    s_w2_ls = np.zeros(n_ls)
    done = 0
    while done < n_samples:
        b = min(chunk, n_samples - done)
        if centers is None:
            u = rng.standard_normal((b, n_vars))
            w = np.ones(b)
        else:
            k = rng.integers(0, centers.shape[0], size=b)
            u = centers[k] + rng.standard_normal((b, n_vars))
            # w = φ(u)/q(u) = K / Σ_k exp(u·c_k − ‖c_k‖²/2)
            lg = u @ centers.T - 0.5 * np.sum(centers ** 2, axis=1)
            m = np.max(lg, axis=1, keepdims=True)
            w = centers.shape[0] * np.exp(
                -(m[:, 0] + np.log(np.sum(np.exp(lg - m), axis=1))))
        if b < chunk:
            # Pad the remainder to the chunk shape (zero-weight rows)
            # so the vmapped solve program compiles exactly once.
            u = np.concatenate([u, np.zeros((chunk - b, n_vars))])
            w = np.concatenate([w, np.zeros(chunk - b)])
        f = np.asarray(jax.device_get(
            fail_batch(jnp.asarray(u, dtype))))
        wi_sys = w * np.any(f, axis=1)
        s_w_sys += float(np.sum(wi_sys))
        s_w2_sys += float(np.sum(wi_sys ** 2))
        wi_ls = w[:, None] * f
        s_w_ls += np.sum(wi_ls, axis=0)
        s_w2_ls += np.sum(wi_ls ** 2, axis=0)
        done += b
    pf_mc = s_w_sys / n_samples
    var = max(s_w2_sys / n_samples - pf_mc ** 2, 0.0)
    result.mc_pf = float(pf_mc)
    result.mc_std_error = float(np.sqrt(max(var, 1e-300) / n_samples))
    result.mc_n = n_samples
    result.mc_pf_per_ls = s_w_ls / n_samples
    result.mc_method = method
    return result
