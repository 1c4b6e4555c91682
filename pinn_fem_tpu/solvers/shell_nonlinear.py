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


def _marguerre_geometry(problem: ShellProblem) -> _Geometry:
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
    slope = np.abs(g0).max() if g0.size else 0.0
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
        * ((np.eye(4) - 0.25) + _DRILL_EPS * np.eye(4))

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


def _element_state(geo: _Geometry, u: np.ndarray):
    """Batched element internal force + tangent + centroid recovery
    at displacement state u: (ke (m, 24, 24), fe (m, 24),
    n_c (m, 3), m_c (m, 3), energy)."""
    m = geo.c2.shape[0]
    u_e = u[geo.dof_map]                          # (m, 24)
    u_m = u_e[:, _MEM_IDX]
    u_b = u_e[:, _BND_IDX]
    u_d = u_e[:, _DRL_IDX]
    w_e = u_b[:, _W_IN_BND]                       # (m, 4)

    fe = np.zeros((m, 24))
    ke = np.zeros((m, 24, 24))
    energy = 0.0
    n_gp = []
    for gidx in range(geo.bm.shape[1]):
        bm = geo.bm[:, gidx]                      # (m, 3, 8)
        gw = geo.gw[:, gidx]                      # (m, 2, 4)
        g0 = geo.g0[:, gidx]                      # (m, 2)
        det = geo.det[:, gidx]                    # (m,)
        g = np.einsum("mca,ma->mc", gw, w_e)      # (m, 2) ∇w
        gt = g0 + g                               # total slope G
        eps = (np.einsum("mia,ma->mi", bm, u_m)
               + 0.5 * np.stack([gt[:, 0]**2 - g0[:, 0]**2,
                                 gt[:, 1]**2 - g0[:, 1]**2,
                                 2.0 * (gt[:, 0] * gt[:, 1]
                                        - g0[:, 0] * g0[:, 1])],
                                axis=-1))
        nf = np.einsum("mij,mj->mi", geo.dm, eps)     # (m, 3) N
        n_gp.append(nf)
        energy += 0.5 * np.einsum("mi,mi,m->", eps, nf, det)
        # B_w(G) = A(G) G_w : (m, 3, 4) on the w nodes.
        a_g = np.zeros((m, 3, 2))
        a_g[:, 0, 0] = gt[:, 0]
        a_g[:, 1, 1] = gt[:, 1]
        a_g[:, 2, 0] = gt[:, 1]
        a_g[:, 2, 1] = gt[:, 0]
        bw = np.einsum("mic,mca->mia", a_g, gw)
        f_m = det[:, None] * np.einsum("mia,mi->ma", bm, nf)
        f_w = det[:, None] * np.einsum("mia,mi->ma", bw, nf)
        k_mm = det[:, None, None] * np.einsum(
            "mia,mij,mjb->mab", bm, geo.dm, bm)
        k_mw = det[:, None, None] * np.einsum(
            "mia,mij,mjb->mab", bm, geo.dm, bw)
        k_ww = det[:, None, None] * (
            np.einsum("mia,mij,mjb->mab", bw, geo.dm, bw)
            + np.einsum("mca,mcd,mdb->mab",
                        gw, _nhat(nf), gw))
        fe[:, _MEM_IDX] += f_m
        fe[:, _BND_IDX[_W_IN_BND]] += f_w
        ke[:, _MEM_IDX[:, None], _MEM_IDX[None, :]] += k_mm
        ke[:, _MEM_IDX[:, None], _BND_IDX[_W_IN_BND][None, :]] += k_mw
        ke[:, _BND_IDX[_W_IN_BND][:, None], _MEM_IDX[None, :]] += \
            np.swapaxes(k_mw, 1, 2)
        ke[:, _BND_IDX[_W_IN_BND][:, None],
           _BND_IDX[_W_IN_BND][None, :]] += k_ww
    # Linear bending + shear + drilling.
    fe[:, _BND_IDX] += np.einsum("mab,mb->ma", geo.kb, u_b)
    fe[:, _DRL_IDX] += np.einsum("mab,mb->ma", geo.kd, u_d)
    ke[:, _BND_IDX[:, None], _BND_IDX[None, :]] += geo.kb
    ke[:, _DRL_IDX[:, None], _DRL_IDX[None, :]] += geo.kd
    energy += 0.5 * (np.einsum("ma,mab,mb->", u_b, geo.kb, u_b)
                     + np.einsum("ma,mab,mb->", u_d, geo.kd, u_d))

    n_c = np.mean(np.stack(n_gp, axis=1), axis=1)
    # Centroid moments from the linear curvature (β basis).
    from ..models.plate import _bend_b, _shape_grads
    _, dx, dy, _ = _shape_grads(geo.c2, 0.0, 0.0)
    bb = _bend_b(dx, dy)
    kap = np.einsum("mia,ma->mi", bb,
                    np.einsum("ab,mb->ma", _Q_BETA, u_b))
    m_c = np.einsum("mij,mj->mi", geo.db, kap)
    return ke, fe, n_c, m_c, energy


def _nhat(nf: np.ndarray) -> np.ndarray:
    """(m, 2, 2) membrane-force matrix from Voigt [Nxx, Nyy, Nxy]."""
    m = nf.shape[0]
    nmat = np.empty((m, 2, 2))
    nmat[:, 0, 0] = nf[:, 0]
    nmat[:, 1, 1] = nf[:, 1]
    nmat[:, 0, 1] = nmat[:, 1, 0] = nf[:, 2]
    return nmat


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
    dl ← dl·√(desired/used)."""
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
    for _ in range(int(n_steps)):
        km, r, _, _ = tangent_and_resid(u, lam)
        du_t = np.linalg.solve(km, f_ext) * mask
        # Predictor: direction continuing the previous increment.
        denom = np.sqrt(1.0 + float(du_t @ du_t))
        dlam = dl / denom
        if prev_du is not None:
            sign = np.sign(prev_du @ du_t + prev_dlam)
            dlam *= 1.0 if sign == 0 else sign
        delta_u = dlam * du_t
        delta_lam = dlam
        ok = False
        res = np.inf
        it_used = max_arc_iter
        for it in range(int(max_arc_iter)):
            km, r, _, _ = tangent_and_resid(u + delta_u,
                                            lam + delta_lam)
            res = float(np.linalg.norm(r)) / fnorm
            if res <= tol:
                ok = True
                it_used = it
                break
            du_r = np.linalg.solve(km, r) * mask
            du_t = np.linalg.solve(km, f_ext) * mask
            # |delta_u + du_r + x du_t|^2 = dl^2  (cylindrical).
            a = float(du_t @ du_t)
            base = delta_u + du_r
            b = 2.0 * float(base @ du_t)
            c = float(base @ base) - dl * dl
            disc = b * b - 4.0 * a * c
            if disc < 0.0 or a <= 0.0:
                # fall back to the normal-plane linearized constraint
                x = -c / b if b != 0.0 else 0.0
            else:
                r1 = (-b + np.sqrt(disc)) / (2.0 * a)
                r2 = (-b - np.sqrt(disc)) / (2.0 * a)
                # pick the root continuing the increment direction
                t1 = float((base + r1 * du_t) @ delta_u)
                t2 = float((base + r2 * du_t) @ delta_u)
                x = r1 if t1 >= t2 else r2
            delta_u = base + x * du_t
            delta_lam = delta_lam + x
        all_ok &= ok
        u = u + delta_u
        lam = lam + delta_lam
        prev_du, prev_dlam = delta_u, delta_lam
        _, _, n_c, m_c = tangent_and_resid(u, lam)
        rows["lam"].append(lam)
        rows["u"].append(u.copy())
        rows["nf"].append(n_c)
        rows["mom"].append(m_c)
        rows["it"].append(it_used)
        rows["res"].append(res)
        dl = min(max_dl,
                 dl * np.sqrt(desired_iters / max(it_used, 1)))
    return ShellNonlinearResult(
        load_factors=np.asarray(rows["lam"], dtype=float),
        displacements=np.asarray(rows["u"]),
        membrane_forces=np.asarray(rows["nf"]),
        moments=np.asarray(rows["mom"]),
        iterations=np.asarray(rows["it"], dtype=int),
        residuals=np.asarray(rows["res"]),
        converged=bool(all_ok),
    )
