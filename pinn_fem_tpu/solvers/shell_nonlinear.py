"""Geometrically nonlinear shallow-shell statics: Marguerre / von
Kármán kinematics on the projected midsurface, load-stepped full
Newton and Crisfield arc-length (Riks) continuation — membrane
stiffening, bifurcation and SNAP-THROUGH for the plate/shell family,
carrying the truss family's geometric nonlinearity (solvers/riks.py)
to continua.

Kinematics (the classical shallow-shell model): the midsurface is an
ELEVATION z = w0(x, y) over the global x-y base plane (flat w0 ≡ const
is exactly von Kármán).  In-plane membrane strain picks up the
quadratic transverse terms

    ε_m = B_m u_m + ½ (∇(w0+w) ⊗ ∇(w0+w) − ∇w0 ⊗ ∇w0)   (Voigt)
        = B_m u_m + [G_x² − g0_x², G_y² − g0_y², 2(G_xG_y − g0_xg0_y)]/2

with G = ∇(w0 + w), while curvature stays the LINEAR Mindlin
κ = B_b u_β and the MITC4 assumed shear and drilling stabilization
stay linear — rotations are moderate (O(√ε)), the Marguerre regime,
valid to O(slope²) with the slope guard below refusing deep
midsurfaces loudly.  All blocks are evaluated on the PROJECTED
corner coordinates; for a FLAT mesh every operator equals the facet
shell's (frames = identity), so the linear limit is exact against
solve_shell_static.

Internal force and consistent tangent (the standard von Kármán
blocks, per 2×2 Gauss point with N = t·D_m ε_m the membrane force):

    f_u = ∫ B_mᵀ N          f_w = ∫ B_w(G)ᵀ N,  B_w(G) = A(G) G_w
    K_uu = ∫ B_mᵀ D B_m     K_uw = ∫ B_mᵀ D B_w
    K_ww = ∫ B_wᵀ D B_w + ∫ G_wᵀ N̂ G_w          (N̂ the 2×2 stress)

— the second K_ww term IS the plate family's geometric stiffness
(models/plate.py:_gw_blocks algebra), here live inside Newton instead
of a linearized pencil.

Verification anchors (tests/test_shell_nonlinear.py):
  * flat linear limit exact vs solve_shell_static;
  * f_int is the exact gradient of the assembled strain energy
    (central finite differences at a random large-deflection state);
  * immovable-edge SS strip under pressure lands on the exact von
    Kármán BEAM solution (the w(x; N) cosh closed form + the scalar
    membrane-force fixpoint, solved to machine precision in-test);
  * compressed flat SS plate amplifies a transverse perturbation by
    1/(1 − λ/λ_cr) with λ_cr the plate family's own buckling factor;
  * the half-sine shallow arch under a half-sine load follows the
    EXACT single-mode cubic D k⁴ a + N(a) k² (e + a) = Q
    (N = E t k² (e a/2 + a²/4); sine modes make N spatially constant,
    so the continuum solution is exactly single-mode) — both limit
    points and the snapped-through branch traced by arc length;
  * the PUBLISHED benchmark: the Sabir-Lock / Crisfield hinged
    cylindrical panel under a central point load — t = 12.7 limit
    load 2.2325 kN at w_c = 10.85 on the 8×8 quarter model vs the
    published ≈ 2.22 at ≈ 11, and the t = 6.35 panel's SNAP-BACK
    (center deflection reverses along the path, λ goes negative,
    limit 0.597 vs published ≈ 0.59) — the case load- and
    displacement-control both fail on and arc length exists for.

Reference citation: the reference's ONLY nonlinearity is the
Green-Lagrange truss kernel (/root/reference/FEM/python/fem/
element.py, dead code per SURVEY §2.1); this module is that
capability made real for the continuum families, TPU-first: batched
(m, 24, 24) Gauss-point einsum blocks, masked dense solves, no
per-element Python.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..models.shell import (_MEM_IDX, _BND_IDX, _DRL_IDX, _Q_BETA,
                            _DRILL_ALPHA, _DRILL_EPS, ShellProblem)

__all__ = [
    "ShellNonlinearResult",
    "solve_shell_nonlinear",
    "solve_shell_nonlinear_banded",
    "solve_shell_riks",
    "marguerre_energy",
]

# Positions of the w DOFs inside the 12-wide (w, θx, θy)-per-node
# bending sub-vector.
_W_IN_BND = np.array([0, 3, 6, 9])

# Marguerre validity guard: |∇w0| beyond this is not "shallow" —
# the dropped O(slope²) membrane terms reach ~10%.  Refuse loudly
# (the family-wide honest-refusal doctrine) rather than silently
# extrapolating a shallow theory onto a deep shell.
_MAX_SLOPE = 0.45


class ShellNonlinearResult(NamedTuple):
    load_factors: np.ndarray      # (n_steps,)
    displacements: np.ndarray     # (n_steps, ndof)
    membrane_forces: np.ndarray   # (n_steps, m, 3) centroid N
    moments: np.ndarray           # (n_steps, m, 3) centroid M
    iterations: np.ndarray        # (n_steps,)
    residuals: np.ndarray         # (n_steps,) |R|/max(|f_ext|,1)
    converged: bool


class _Geometry(NamedTuple):
    c2: np.ndarray        # (m, 4, 2) projected corner coords
    bm: np.ndarray        # (m, 4, 3, 8) membrane B per GP
    gw: np.ndarray        # (m, 4, 2, 4) ∇ operator on w nodes per GP
    g0: np.ndarray        # (m, 4, 2) initial slope ∇w0 per GP
    det: np.ndarray       # (m, 4) Jacobians per GP
    kb: np.ndarray        # (m, 12, 12) linear bending+shear (θ order)
    kd: np.ndarray        # (m, 4, 4) drilling stabilization
    dm: np.ndarray        # (m, 3, 3) t·D_m membrane rigidity
    db: np.ndarray        # (m, 3, 3) bending rigidity D_b
    dof_map: np.ndarray   # (m, 24)


def _marguerre_geometry(problem: ShellProblem,
                        drill_eps: float = _DRILL_EPS) -> _Geometry:
    from ..models.plane import _GP, _dmat, _q4_point
    from ..models.plate import (_bend_b, _dmats, _mitc_rows,
                                _shape_grads, _shear_b_mitc)

    xe = problem.nodes[problem.elements]          # (m, 4, 3)
    c2 = xe[:, :, :2]
    w0e = xe[:, :, 2]                             # (m, 4) elevations
    m = c2.shape[0]

    bm_l, gw_l, g0_l, det_l = [], [], [], []
    kp = None
    rows = _mitc_rows(c2)
    db, ds = _dmats(problem.young, problem.poisson,
                    problem.thickness)
    for xi, eta in _GP:
        bmem, det = _q4_point(c2, xi, eta)
        if np.any(det <= 0.0):
            raise ValueError(
                "shallow-shell projection is degenerate (a facet "
                "projects with non-positive area onto the x-y base "
                "plane) — the Marguerre formulation needs a one-to-one "
                "elevation z = w0(x, y); use the faceted linear shell "
                "for deep midsurfaces")
        _, dx, dy, _ = _shape_grads(c2, xi, eta)
        gw = np.stack([dx, dy], axis=1)           # (m, 2, 4)
        bm_l.append(bmem)
        gw_l.append(gw)
        g0_l.append(np.einsum("mca,ma->mc", gw, w0e))
        det_l.append(det)
        # Linear bending + MITC shear blocks (β basis), accumulated.
        bb = _bend_b(dx, dy)
        kg = det[:, None, None] * np.einsum(
            "mia,mij,mjb->mab", bb, db, bb)
        bs, dets_s = _shear_b_mitc(c2, rows, xi, eta)
        kg = kg + (ds * dets_s)[:, None, None] * np.einsum(
            "mia,mib->mab", bs, bs)
        kp = kg if kp is None else kp + kg
    g0 = np.stack(g0_l, axis=1)                   # (m, 4, 2)
    # Gradient MAGNITUDE, not the component max — a 45°-oriented
    # steep direction would otherwise pass at √2× the bound.
    slope = (float(np.linalg.norm(g0, axis=-1).max())
             if g0.size else 0.0)
    if slope > _MAX_SLOPE:
        raise ValueError(
            f"midsurface slope |∇w0| = {slope:.3f} exceeds the "
            f"Marguerre shallow-shell validity bound {_MAX_SLOPE} — "
            "the dropped O(slope²) membrane terms are no longer "
            "negligible; this solver serves shallow panels/arches "
            "(use the linear faceted shell for deep geometry)")
    # β -> θ conjugation (the shell family's _Q_BETA map).
    kb = np.einsum("ij,mjk,kl->mil", _Q_BETA.T, kp, _Q_BETA)

    from ..models.shell import _facet_area
    area = _facet_area(c2)
    g = problem.young / (2.0 * (1.0 + problem.poisson))
    kd = (_DRILL_ALPHA * g * problem.thickness * area)[:, None, None] \
        * ((np.eye(4) - 0.25) + drill_eps * np.eye(4))

    dmat = _dmat(problem.young, problem.poisson, False) \
        * problem.thickness[:, None, None]
    return _Geometry(c2=c2, bm=np.stack(bm_l, axis=1),
                     gw=np.stack(gw_l, axis=1), g0=g0,
                     det=np.stack(det_l, axis=1), kb=kb, kd=kd,
                     dm=dmat, db=db, dof_map=problem.dof_map())


def _f_ext_marguerre(problem: ShellProblem) -> np.ndarray:
    """Nodal loads + VERTICAL pressure per unit PROJECTED area (the
    shallow-shell load convention — a shallow panel's normal is z up
    to O(slope), and Marguerre equilibrium is written per projected
    area; the faceted linear shell's normal-pressure convention
    differs by O(slope²), inside the theory's own error)."""
    if problem.temperature is not None \
            or problem.temperature_gradient is not None:
        raise ValueError(
            "the nonlinear shallow-shell solver does not carry the "
            "thermoelastic load case — drop temperature/"
            "temperature_gradient (run thermoelasticity on the "
            'linear "static" analysis)')
    f = problem.loads.copy()
    if problem.pressure is not None or problem.body_force is not None:
        from ..models.plane import _GP
        from ..models.plate import _shape_grads

        xe = problem.nodes[problem.elements]
        c2 = xe[:, :, :2]
        fe = np.zeros((problem.nelm, 4))
        for xi, eta in _GP:
            n, _, _, det = _shape_grads(c2, xi, eta)
            fe += det[:, None] * n[None, :]
        if problem.pressure is not None:
            np.add.at(f, 6 * problem.elements + 2,
                      problem.pressure[:, None] * fe)
        if problem.body_force is not None:
            for d in range(3):
                np.add.at(f, 6 * problem.elements + d,
                          problem.body_force[d] * fe)
    return f


def _marguerre_blocks(bm_g, gw_g, g0_g, det_g, kb, kd, dm, u_e,
                      xp=np):
    """Batched Marguerre element tangent + internal force at element
    displacements u_e (m, 24): (ke (m, 24, 24), fe (m, 24),
    n_gp (m, ngp, 3) membrane forces per GP, energy).  xp-generic
    (np host float64 | jnp traced — the banded device tier runs this
    under jit with the same code path, the family's one-implementation
    doctrine)."""
    m = u_e.shape[0]
    u_m = u_e[:, _MEM_IDX]
    u_b = u_e[:, _BND_IDX]
    u_d = u_e[:, _DRL_IDX]
    w_e = u_b[:, _W_IN_BND]                       # (m, 4)
    wb = _BND_IDX[_W_IN_BND]

    fe = xp.zeros((m, 24), dtype=u_e.dtype)
    ke = xp.zeros((m, 24, 24), dtype=u_e.dtype)
    energy = xp.zeros((), dtype=u_e.dtype)
    f_m_acc = f_w_acc = k_mm_acc = k_mw_acc = k_ww_acc = None
    n_gp = []
    for gidx in range(bm_g.shape[1]):
        bm = bm_g[:, gidx]                        # (m, 3, 8)
        gw = gw_g[:, gidx]                        # (m, 2, 4)
        g0 = g0_g[:, gidx]                        # (m, 2)
        det = det_g[:, gidx]                      # (m,)
        g = xp.einsum("mca,ma->mc", gw, w_e)      # (m, 2) ∇w
        gt = g0 + g                               # total slope G
        eps = (xp.einsum("mia,ma->mi", bm, u_m)
               + 0.5 * xp.stack([gt[:, 0]**2 - g0[:, 0]**2,
                                 gt[:, 1]**2 - g0[:, 1]**2,
                                 2.0 * (gt[:, 0] * gt[:, 1]
                                        - g0[:, 0] * g0[:, 1])],
                                axis=-1))
        nf = xp.einsum("mij,mj->mi", dm, eps)     # (m, 3) N
        n_gp.append(nf)
        energy = energy + 0.5 * xp.einsum("mi,mi,m->", eps, nf, det)
        # B_w(G) = A(G) G_w : (m, 3, 4) on the w nodes.
        zr = xp.zeros_like(gt[:, 0])
        a_g = xp.stack([
            xp.stack([gt[:, 0], zr], axis=-1),
            xp.stack([zr, gt[:, 1]], axis=-1),
            xp.stack([gt[:, 1], gt[:, 0]], axis=-1)], axis=1)
        bw = xp.einsum("mic,mca->mia", a_g, gw)
        nhat = xp.stack([
            xp.stack([nf[:, 0], nf[:, 2]], axis=-1),
            xp.stack([nf[:, 2], nf[:, 1]], axis=-1)], axis=1)
        f_m = det[:, None] * xp.einsum("mia,mi->ma", bm, nf)
        f_w = det[:, None] * xp.einsum("mia,mi->ma", bw, nf)
        k_mm = det[:, None, None] * xp.einsum(
            "mia,mij,mjb->mab", bm, dm, bm)
        k_mw = det[:, None, None] * xp.einsum(
            "mia,mij,mjb->mab", bm, dm, bw)
        k_ww = det[:, None, None] * (
            xp.einsum("mia,mij,mjb->mab", bw, dm, bw)
            + xp.einsum("mca,mcd,mdb->mab", gw, nhat, gw))
        f_m_acc = f_m if f_m_acc is None else f_m_acc + f_m
        f_w_acc = f_w if f_w_acc is None else f_w_acc + f_w
        k_mm_acc = k_mm if k_mm_acc is None else k_mm_acc + k_mm
        k_mw_acc = k_mw if k_mw_acc is None else k_mw_acc + k_mw
        k_ww_acc = k_ww if k_ww_acc is None else k_ww_acc + k_ww
    f_b = xp.einsum("mab,mb->ma", kb, u_b)
    f_d = xp.einsum("mab,mb->ma", kd, u_d)
    if xp is np:
        fe[:, _MEM_IDX] += f_m_acc
        fe[:, wb] += f_w_acc
        fe[:, _BND_IDX] += f_b
        fe[:, _DRL_IDX] += f_d
        ke[:, _MEM_IDX[:, None], _MEM_IDX[None, :]] += k_mm_acc
        ke[:, _MEM_IDX[:, None], wb[None, :]] += k_mw_acc
        ke[:, wb[:, None], _MEM_IDX[None, :]] += np.swapaxes(
            k_mw_acc, 1, 2)
        ke[:, wb[:, None], wb[None, :]] += k_ww_acc
        ke[:, _BND_IDX[:, None], _BND_IDX[None, :]] += kb
        ke[:, _DRL_IDX[:, None], _DRL_IDX[None, :]] += kd
    else:
        fe = fe.at[:, _MEM_IDX].add(f_m_acc)
        fe = fe.at[:, wb].add(f_w_acc)
        fe = fe.at[:, _BND_IDX].add(f_b)
        fe = fe.at[:, _DRL_IDX].add(f_d)
        ke = ke.at[:, _MEM_IDX[:, None], _MEM_IDX[None, :]].add(
            k_mm_acc)
        ke = ke.at[:, _MEM_IDX[:, None], wb[None, :]].add(k_mw_acc)
        ke = ke.at[:, wb[:, None], _MEM_IDX[None, :]].add(
            xp.swapaxes(k_mw_acc, 1, 2))
        ke = ke.at[:, wb[:, None], wb[None, :]].add(k_ww_acc)
        ke = ke.at[:, _BND_IDX[:, None], _BND_IDX[None, :]].add(kb)
        ke = ke.at[:, _DRL_IDX[:, None], _DRL_IDX[None, :]].add(kd)
    energy = energy + 0.5 * (
        xp.einsum("ma,mab,mb->", u_b, kb, u_b)
        + xp.einsum("ma,mab,mb->", u_d, kd, u_d))
    return ke, fe, xp.stack(n_gp, axis=1), energy


def _element_state(geo: _Geometry, u: np.ndarray):
    """Batched element internal force + tangent + centroid recovery
    at displacement state u: (ke (m, 24, 24), fe (m, 24),
    n_c (m, 3), m_c (m, 3), energy)."""
    u_e = u[geo.dof_map]                          # (m, 24)
    u_b = u_e[:, _BND_IDX]
    ke, fe, n_gp, energy = _marguerre_blocks(
        geo.bm, geo.gw, geo.g0, geo.det, geo.kb, geo.kd, geo.dm, u_e)
    n_c = np.mean(n_gp, axis=1)
    # Centroid moments from the linear curvature (β basis).
    from ..models.plate import _bend_b, _shape_grads
    _, dx, dy, _ = _shape_grads(geo.c2, 0.0, 0.0)
    bb = _bend_b(dx, dy)
    kap = np.einsum("mia,ma->mi", bb,
                    np.einsum("ab,mb->ma", _Q_BETA, u_b))
    m_c = np.einsum("mij,mj->mi", geo.db, kap)
    return ke, fe, n_c, m_c, energy


def _assemble(problem: ShellProblem, geo: _Geometry, u: np.ndarray):
    ke, fe, n_c, m_c, energy = _element_state(geo, u)
    ndof = problem.ndof
    k = np.zeros((ndof, ndof))
    np.add.at(k, (geo.dof_map[:, :, None], geo.dof_map[:, None, :]),
              ke)
    f_int = np.zeros(ndof)
    np.add.at(f_int, geo.dof_map, fe)
    return k, f_int, n_c, m_c, energy


def marguerre_energy(problem: ShellProblem, u: np.ndarray) -> float:
    """Total strain energy at state u (membrane von Kármán + linear
    bending/shear/drilling) — the functional whose exact gradient the
    internal force must be (tests/test_shell_nonlinear.py pins it by
    central differences)."""
    geo = _marguerre_geometry(problem)
    _, _, _, _, energy = _assemble(problem, geo, u)
    return float(energy)


def solve_shell_nonlinear(
    problem: ShellProblem,
    load_factors: Optional[Sequence[float]] = None,
    n_steps: int = 10,
    target_load_factor: float = 1.0,
    tol: float = 1e-9,
    max_iter: int = 40,
    min_denom: float = 1e-12,
) -> ShellNonlinearResult:
    """Load-controlled von Kármán / Marguerre statics: full Newton
    with the consistent tangent and an Armijo backtracking guard per
    load step (the plasticity-family doctrine — the tangent softens
    toward limit points and undamped Newton overshoots).  Fails
    (converged=False) AT a limit point by construction — trace
    snap-through with solve_shell_riks."""
    from .plane_plasticity import _schedule

    lfs = _schedule(load_factors, target_load_factor, n_steps)
    geo = _marguerre_geometry(problem)
    f_ext = _f_ext_marguerre(problem) * problem.free_mask()
    mask = problem.free_mask()
    fnorm = max(float(np.linalg.norm(f_ext)), min_denom)
    km_fix = np.diag(1.0 - mask)

    u = np.zeros(problem.ndof)
    rows = {k: [] for k in ("u", "nf", "mom", "it", "res")}
    all_ok = True
    for lf in lfs:
        ok = False
        res = np.inf
        it_used = max_iter
        for it in range(max_iter):
            k_t, f_int, n_c, m_c, _ = _assemble(problem, geo, u)
            r = (lf * f_ext - f_int) * mask
            res = float(np.linalg.norm(r)) / fnorm
            if res <= tol:
                ok = True
                it_used = it
                break
            km = mask[:, None] * k_t * mask[None, :] + km_fix
            du = np.linalg.solve(km, r) * mask
            s = 1.0
            best_s, best_res = 1.0, np.inf
            for _ in range(12):
                _, f_try, _, _, _ = _assemble(problem, geo,
                                              u + s * du)
                res_try = float(np.linalg.norm(
                    (lf * f_ext - f_try) * mask)) / fnorm
                if res_try < best_res:
                    best_s, best_res = s, res_try
                if res_try <= (1.0 - 1e-4 * s) * res:
                    break
                s *= 0.5
            u = u + best_s * du
        all_ok &= ok
        if not ok:
            _, f_int, n_c, m_c, _ = _assemble(problem, geo, u)
            res = float(np.linalg.norm(
                (lf * f_ext - f_int) * mask)) / fnorm
        rows["u"].append(u.copy())
        rows["nf"].append(n_c)
        rows["mom"].append(m_c)
        rows["it"].append(it_used)
        rows["res"].append(res)
    return ShellNonlinearResult(
        load_factors=np.asarray(lfs, dtype=float),
        displacements=np.asarray(rows["u"]),
        membrane_forces=np.asarray(rows["nf"]),
        moments=np.asarray(rows["mom"]),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
    )


def solve_shell_riks(
    problem: ShellProblem,
    n_steps: int = 60,
    dl0: float = 0.1,
    tol: float = 1e-8,
    max_arc_iter: int = 25,
    desired_iters: int = 5,
    max_dl: Optional[float] = None,
    min_denom: float = 1e-12,
) -> ShellNonlinearResult:
    """Crisfield cylindrical arc-length continuation on the Marguerre
    assembly — traces the shallow-shell equilibrium path THROUGH
    limit points (snap-through of arches and panels), the
    solvers/riks.py doctrine carried to continua: LU on the masked
    tangent (it is INDEFINITE past the fold — that region is the
    point), quadratic constraint |Δu + du_r + dλ du_t|² = dl², root
    picked to continue the current increment, step size adapting as
    dl ← dl·√(desired/used).  A step whose corrector fails is NEVER
    committed (the solvers/riks.py failure doctrine): the arc length
    quarters and the step retries from the last converged state, up
    to 4 shrinks; if it still fails, the trace stops with
    converged=False and the path points collected so far intact —
    a diverged iterate never contaminates the arrays."""
    geo = _marguerre_geometry(problem)
    f_ext = _f_ext_marguerre(problem) * problem.free_mask()
    mask = problem.free_mask()
    fnorm = max(float(np.linalg.norm(f_ext)), min_denom)
    km_fix = np.diag(1.0 - mask)

    def tangent_and_resid(u, lam):
        k_t, f_int, n_c, m_c, _ = _assemble(problem, geo, u)
        km = mask[:, None] * k_t * mask[None, :] + km_fix
        r = (lam * f_ext - f_int) * mask
        return km, r, n_c, m_c

    u = np.zeros(problem.ndof)
    lam = 0.0
    dl = float(dl0)
    max_dl = float(max_dl) if max_dl is not None else 10.0 * dl
    prev_du = None
    prev_dlam = 1.0
    rows = {k: [] for k in ("lam", "u", "nf", "mom", "it", "res")}
    all_ok = True
    pending = None     # (lam, it_used, res) of the committed step
                       # whose centroid recovery the NEXT step-top
                       # assembly provides (one assembly per step).

    def corrector(du_t, dl_try):
        """One predictor + corrector attempt from the committed
        (u, lam) at arc length dl_try: (ok, delta_u, delta_lam,
        it_used, res)."""
        denom = np.sqrt(1.0 + float(du_t @ du_t))
        dlam = dl_try / denom
        if prev_du is not None:
            sign = np.sign(prev_du @ du_t + prev_dlam)
            dlam *= 1.0 if sign == 0 else sign
        delta_u = dlam * du_t
        delta_lam = dlam
        res = np.inf
        for it in range(int(max_arc_iter)):
            km, r, _, _ = tangent_and_resid(u + delta_u,
                                            lam + delta_lam)
            res = float(np.linalg.norm(r)) / fnorm
            if res <= tol:
                return True, delta_u, delta_lam, it, res
            du_r = np.linalg.solve(km, r) * mask
            du_c = np.linalg.solve(km, f_ext) * mask
            # |delta_u + du_r + x du_c|^2 = dl^2  (cylindrical).
            a = float(du_c @ du_c)
            base = delta_u + du_r
            b = 2.0 * float(base @ du_c)
            c = float(base @ base) - dl_try * dl_try
            disc = b * b - 4.0 * a * c
            if disc < 0.0 or a <= 0.0:
                # fall back to the normal-plane linearized constraint
                x = -c / b if b != 0.0 else 0.0
            else:
                r1 = (-b + np.sqrt(disc)) / (2.0 * a)
                r2 = (-b - np.sqrt(disc)) / (2.0 * a)
                # pick the root continuing the increment direction
                t1 = float((base + r1 * du_c) @ delta_u)
                t2 = float((base + r2 * du_c) @ delta_u)
                x = r1 if t1 >= t2 else r2
            delta_u = base + x * du_c
            delta_lam = delta_lam + x
        return False, delta_u, delta_lam, int(max_arc_iter), res

    for _ in range(int(n_steps)):
        km, r, n_c, m_c = tangent_and_resid(u, lam)
        if pending is not None:
            # Centroid recovery of the PREVIOUS committed step, from
            # this step's own tangent assembly — no duplicate.
            lam_c, it_c, res_c = pending
            rows["lam"].append(lam_c)
            rows["u"].append(u.copy())
            rows["nf"].append(n_c)
            rows["mom"].append(m_c)
            rows["it"].append(it_c)
            rows["res"].append(res_c)
            pending = None
        du_t = np.linalg.solve(km, f_ext) * mask
        # The solvers/riks.py failure doctrine: a step that does not
        # converge is NEVER committed — quarter the arc length and
        # retry from the last converged state; give up (honestly,
        # with the path traced so far intact) after 4 shrinks.
        ok = False
        for _attempt in range(4):
            ok, delta_u, delta_lam, it_used, res = corrector(du_t, dl)
            if ok:
                break
            dl *= 0.25
        if not ok:
            all_ok = False
            break
        u = u + delta_u
        lam = lam + delta_lam
        prev_du, prev_dlam = delta_u, delta_lam
        pending = (lam, it_used, res)
        dl = min(max_dl,
                 dl * np.sqrt(desired_iters / max(it_used, 1)))
    if pending is not None:
        _, _, n_c, m_c = tangent_and_resid(u, lam)
        lam_c, it_c, res_c = pending
        rows["lam"].append(lam_c)
        rows["u"].append(u.copy())
        rows["nf"].append(n_c)
        rows["mom"].append(m_c)
        rows["it"].append(it_c)
        rows["res"].append(res_c)
    return ShellNonlinearResult(
        load_factors=np.asarray(rows["lam"], dtype=float),
        displacements=np.asarray(rows["u"]),
        membrane_forces=np.asarray(rows["nf"]),
        moments=np.asarray(rows["mom"]),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
    )


# ---------------------------------------------------------------------
# Banded DEVICE tier: large-mesh load-controlled Marguerre Newton on
# the DIA pipeline — the (m, 24, 24) tangent blocks contract on the
# MXU through the SAME xp-generic _marguerre_blocks the host tier
# runs, one scatter into diagonal storage, Jacobi-PCG per Newton
# iteration (ops/dia.py; the shell statics tier's machinery with the
# tangent rebuilt each iteration).  PCG needs an SPD tangent, so this
# tier serves PRE-LIMIT stiffening analyses (membrane stiffening,
# pre-buckling paths — the common large-mesh nonlinear use); at or
# past a limit point the tangent is indefinite, PCG stalls, and the
# solver raises loudly advising the dense arc-length tier (the
# CLAUDE.md indefinite-needs-LU rule).

_BANDED_CORE_CACHE: dict = {}


def _banded_cores(layout, nelm: int, max_cg: int,
                  use_pallas: bool = False):
    """Jitted per-iteration programs, cached per structural signature
    (never per problem object — the closure recompile trap)."""
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.bandwidth, nelm, max_cg, use_pallas)
    cores = _BANDED_CORE_CACHE.get(key)
    if cores is not None:
        return cores

    import jax
    import jax.numpy as jnp

    from ..ops.dia import assemble_dia_blocks, dia_cg_solve
    from .banded_inverse import DiaLayoutView

    ndof = layout.ndof

    @jax.jit
    def newton_iter(bm, gw, g0, det, kb, kd, dm, dmap, entry_slot,
                    u, lf, f_ext, mask, fnorm, cg_tol):
        dtype = f_ext.dtype
        ke, fe, _, _ = _marguerre_blocks(bm, gw, g0, det, kb, kd,
                                         dm, u[dmap], xp=jnp)
        f_int = jnp.zeros(ndof, dtype).at[dmap].add(fe)
        r = (lf * f_ext - f_int) * mask
        res = jnp.linalg.norm(r) / fnorm
        diags = assemble_dia_blocks(DiaLayoutView(layout, entry_slot),
                                    ke)
        du, iters, rel = dia_cg_solve(layout, diags, r, mask,
                                      tol=cg_tol, max_iter=max_cg,
                                      use_pallas=use_pallas,
                                      precond="jacobi", components=6)
        du = du * mask
        return du, res, iters, rel, jnp.linalg.norm(du)

    @jax.jit
    def diags_and_resid(bm, gw, g0, det, kb, kd, dm, dmap,
                        entry_slot, u, lf, f_ext, mask, fnorm):
        dtype = f_ext.dtype
        ke, fe, _, _ = _marguerre_blocks(bm, gw, g0, det, kb, kd,
                                         dm, u[dmap], xp=jnp)
        f_int = jnp.zeros(ndof, dtype).at[dmap].add(fe)
        r = (lf * f_ext - f_int) * mask
        diags = assemble_dia_blocks(DiaLayoutView(layout, entry_slot),
                                    ke)
        return diags, r, jnp.linalg.norm(r) / fnorm

    @jax.jit
    def resid_only(bm, gw, g0, det, kb, kd, dm, dmap, u, lf, f_ext,
                   mask, fnorm):
        """(relative residual, |u|) at the trial state — the second
        output feeds the scale-free increment test without a
        separate unjitted-norm round trip (the CLAUDE.md one-fetch
        rule)."""
        dtype = f_ext.dtype
        _, fe, _, _ = _marguerre_blocks(bm, gw, g0, det, kb, kd,
                                        dm, u[dmap], xp=jnp)
        f_int = jnp.zeros(ndof, dtype).at[dmap].add(fe)
        return (jnp.linalg.norm((lf * f_ext - f_int) * mask) / fnorm,
                jnp.linalg.norm(u))

    cores = (newton_iter, diags_and_resid, resid_only)
    _BANDED_CORE_CACHE[key] = cores
    return cores


def solve_shell_nonlinear_banded(
    problem: ShellProblem,
    load_factors: Optional[Sequence[float]] = None,
    n_steps: int = 5,
    target_load_factor: float = 1.0,
    tol: float = 5e-4,
    du_tol: float = 2e-4,
    stall_accept: float = 1e-2,
    max_iter: int = 20,
    cg_tol: float = 1e-6,
    max_cg: int = 40000,
    min_denom: float = 1e-12,
    use_pallas: bool = False,
    mesh=None,
    dtype=None,
) -> ShellNonlinearResult:
    """Large-mesh load-controlled von Kármán / Marguerre statics on
    the banded DIA device tier: per Newton iteration ONE jitted
    program rebuilds the (m, 24, 24) tangent blocks (the same
    xp-generic _marguerre_blocks as the host tier), scatters them
    into DIA diagonals and runs Jacobi-PCG — structured shallow
    midsurfaces are banded under grid numbering exactly like the
    linear shell statics tier (models/shell.py).  `mesh`
    row-block-shards the CG over "tp" (parallel/dia_sharded).

    CONVERGENCE is declared on either of two criteria: the relative
    force residual reaching `tol`, or the Newton increment reaching
    `du_tol` (|Δu|/|u| ≤ 2e-4 default).  The residual alone cannot
    serve on f32: the internal-force entries carry the membrane
    stiffness scale while the residual is their near-exact
    cancellation against a much smaller transverse load, so the f32
    relative residual stalls at eps32·(element force scale)/|f_ext|
    — a PROBLEM-DEPENDENT floor (measured 2.6e-4 on the calibration
    strip, 4.3e-4 on the shallow panel, and ∝ 1/λ on partial load
    steps) below which the SOLUTION is already at its f32 accuracy
    (measured 1e-4 against the f64 host tier).  The increment test
    is scale-free: at the floor |Δu|/|u| is PCG noise (measured
    7e-5) while true convergence passes through it monotonically.
    A third acceptance handles the floor's mesh growth (the noise
    scales with element count: measured 2.8e-3 on a 52k-DOF strip's
    λ = 0.25 step whose SOLUTION is still 8e-4 against the exact
    ODE): three consecutive iterations without a 10% residual
    improvement declare the floor reached, accepted as converged
    while the stalled residual is under `stall_accept` (1e-2) — a
    sanity cap, not an accuracy claim; the residuals array reports
    the honest value.  The Newton loop also breaks early when the
    Armijo guard can't improve the residual at any step length.
    The drilling ε uses the banded tier's 1e-3
    (models/shell.py:_DRILL_EPS_BANDED — κ(K) control for the inner
    f32 solves; physical pollution ~1e-6 of membrane stiffness).
    Raises at an indefinite tangent (PCG stall) — pre-limit analyses
    only; snap-through needs the dense solve_shell_riks."""
    import jax
    import jax.numpy as jnp

    from ..models.shell import _DRILL_EPS_BANDED, _shell_dia_layout
    from .plane_plasticity import _schedule

    lfs = _schedule(load_factors, target_load_factor, n_steps)
    dtype = dtype or jnp.asarray(1.0).dtype
    geo = _marguerre_geometry(problem,
                              drill_eps=_DRILL_EPS_BANDED)
    layout = _shell_dia_layout(problem)
    f_ext_np = _f_ext_marguerre(problem) * problem.free_mask()
    fnorm_np = max(float(np.linalg.norm(f_ext_np)), min_denom)

    args_geo = (jnp.asarray(geo.bm, dtype), jnp.asarray(geo.gw, dtype),
                jnp.asarray(geo.g0, dtype),
                jnp.asarray(geo.det, dtype),
                jnp.asarray(geo.kb, dtype), jnp.asarray(geo.kd, dtype),
                jnp.asarray(geo.dm, dtype))
    dmap = jnp.asarray(geo.dof_map)
    entry_slot = problem._dia_entry_slot_dev
    f_ext = jnp.asarray(f_ext_np, dtype)
    mask = jnp.asarray(problem.free_mask(), dtype)
    fnorm = jnp.asarray(fnorm_np, dtype)
    cg_tol_t = jnp.asarray(cg_tol, dtype)

    newton_iter, diags_and_resid, resid_only = _banded_cores(
        layout, problem.nelm, int(max_cg), use_pallas=bool(use_pallas))

    if mesh is not None:
        from ..parallel.dia_sharded import dia_cg_solve_sharded

    u = jnp.zeros(problem.ndof, dtype)
    rows = {k: [] for k in ("u", "it", "res")}
    all_ok = True
    for lf_val in lfs:
        lf = jnp.asarray(lf_val, dtype)
        ok = False
        res_val = np.inf
        it_used = max_iter
        growth_left = 4
        res_min = np.inf
        no_prog = 0
        for it in range(max_iter):
            du_norm_val = None
            if mesh is None:
                du, res, cg_it, cg_rel, du_norm = newton_iter(
                    *args_geo, dmap, entry_slot, u, lf, f_ext, mask,
                    fnorm, cg_tol_t)
                res_val, cg_rel_val, du_norm_val = map(
                    float, jax.device_get((res, cg_rel, du_norm)))
            else:
                diags, r, res = diags_and_resid(
                    *args_geo, dmap, entry_slot, u, lf, f_ext, mask,
                    fnorm)
                res_val = float(jax.device_get(res))
                if res_val <= tol:
                    ok = True
                    it_used = it
                    break
                du, cg_it, cg_rel = dia_cg_solve_sharded(
                    layout, diags, r, mask, mesh, tol=float(cg_tol),
                    max_iter=int(max_cg))
                du = du * mask
                cg_rel_val = float(jax.device_get(cg_rel))
            if res_val <= tol:
                ok = True
                it_used = it
                break
            if not np.isfinite(cg_rel_val) \
                    or cg_rel_val > 100.0 * float(cg_tol):
                raise ValueError(
                    f"banded PCG stalled (rel={cg_rel_val:.2e}) — the "
                    "tangent is likely indefinite (at/past a limit "
                    "point).  The banded tier serves PRE-LIMIT "
                    "stiffening analyses; trace snap-through with the "
                    "dense arc-length tier (solve_shell_riks) on a "
                    "mesh under DENSE_DOF_LIMIT")
            # NONMONOTONE acceptance with a growth budget: the
            # Marguerre residual along the Newton path is not
            # monotone (measured on the shallow panel: full steps
            # spike the residual 1 → 126 → 0.78 → ... and converge
            # in 6 iterations, while a strict Armijo guard locks
            # onto s = 1/16 and crawls for 20+).  Accept the full
            # step while growth stays bounded (≤ growth_cap, at most
            # growth_budget consecutive growth steps); only then
            # fall back to strict backtracking.
            res1, un1 = map(float, jax.device_get(resid_only(
                *args_geo, dmap, u + du, lf, f_ext, mask, fnorm)))
            u_norm_val = un1
            grew = False
            if res1 <= (1.0 - 1e-4) * res_val:
                best_s, best_res = 1.0, res1
                growth_left = 4
            elif res1 <= 100.0 * res_val and growth_left > 0:
                best_s, best_res = 1.0, res1
                growth_left -= 1
                grew = True
            else:
                s = 0.5
                best_s, best_res = 1.0, res1
                for _ in range(7):
                    res_try, un_try = map(float, jax.device_get(
                        resid_only(*args_geo, dmap, u + s * du, lf,
                                   f_ext, mask, fnorm)))
                    if res_try < best_res:
                        best_s, best_res = s, res_try
                        u_norm_val = un_try
                    if res_try <= (1.0 - 1e-4 * s) * res_val:
                        break
                    s *= 0.5
                growth_left = 4
            if best_res < res_val or grew:
                u = u + best_s * du
                if not grew:
                    # Scale-free increment from the already-fetched
                    # norms (|s·du| = s·|du|; |u_new| came back with
                    # the accepted resid_only evaluation — no extra
                    # device round trip, the CLAUDE.md fetch rule).
                    # The sharded path has no jitted du norm; fall
                    # back to a device norm fetch there.
                    if du_norm_val is None:
                        du_norm_val = float(jax.device_get(
                            jnp.linalg.norm(du)))
                    du_rel = best_s * du_norm_val \
                        / max(u_norm_val, min_denom)
                    if du_rel <= du_tol:
                        # Increment in the PCG noise — converged to
                        # the f32 floor (docstring: the scale-free
                        # test).
                        ok = True
                        it_used = it + 1
                        res_val = best_res
                        break
                # Mesh-dependent f32 floor (docstring): stagnation
                # over three non-growth iterations with the stalled
                # residual under the sanity cap is the floor, not
                # divergence.  Growth steps reset the counter — the
                # nonmonotone transient is progress, not a stall.
                if grew:
                    no_prog = 0
                elif best_res > 0.9 * res_min:
                    no_prog += 1
                else:
                    no_prog = 0
                res_min = min(res_min, best_res)
                if no_prog >= 3:
                    ok = res_min <= stall_accept
                    it_used = it + 1
                    res_val = res_min
                    break
            else:
                # The f32 residual floor: no step direction improves
                # the residual any further — stop burning iterations
                # (the measured-floor rationale in the docstring).
                it_used = it + 1
                ok = best_res <= tol or res_val <= tol
                res_val = min(res_val, best_res)
                break
        all_ok &= ok
        if not ok:
            res_val = float(jax.device_get(resid_only(
                *args_geo, dmap, u, lf, f_ext, mask, fnorm)[0]))
        rows["u"].append(np.asarray(jax.device_get(u), dtype=float))
        rows["it"].append(it_used)
        rows["res"].append(res_val)
    # Centroid recovery on the host from the fetched fields (f64 —
    # ONE geometry, the honest recovery; same as the statics tier).
    geo_f64 = _marguerre_geometry(problem)
    nf_l, mom_l = [], []
    for u_np in rows["u"]:
        _, _, n_c, m_c, _ = _element_state(geo_f64, u_np)
        nf_l.append(n_c)
        mom_l.append(m_c)
    return ShellNonlinearResult(
        load_factors=np.asarray(lfs, dtype=float),
        displacements=np.asarray(rows["u"]),
        membrane_forces=np.asarray(nf_l),
        moments=np.asarray(mom_l),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
    )
