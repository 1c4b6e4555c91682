"""Reissner-Mindlin plate bending — flexure joins the framework.

The reference (rpacheco-blazquez/PINN-FEM) is axial-truss only; this
build already carries membranes (models/plane.py), bricks
(models/solid.py) and beams (models/frame.py).  Plates are the last
classic structural element type: floor slabs, bridge decks, ship
panels, pressure-vessel heads — 2D geometry carrying TRANSVERSE load
by bending, which neither the membrane (in-plane only) nor a beam
grid (no twist coupling) represents.

Element: 4-node MITC4 (Bathe-Dvorkin) Mindlin quadrilateral —
bending 2×2 Gauss on the displacement curvatures, transverse shear
2×2 Gauss on an ASSUMED covariant shear field sampled at the edge
midpoints (γ̃_ξ at (0, ±1) interpolated linearly in η, γ̃_η at
(±1, 0) in ξ).  Full displacement-based shear locks catastrophically
in the thin limit (the bilinear field cannot represent γ ≡ 0, so
spurious shear energy scales like (a/t)² — at t/a = 0.01 it is off
by ~100×); the edge-midpoint sampling removes exactly the parasitic
constraints while keeping full rank.

Why MITC4 and not selective reduced integration (1-point shear): SRI
is equally locking-free for STATICS, but it leaves near-soft zigzag
w-modes (β matches w,x at the single sample point, killing the shear
energy of a mesh-scale alternating deflection).  Measured here on
the buckling pencil: the 16×16 SRI square at t/a = 0.1 "buckles" in
the zigzag at 0.53× the exact Mindlin critical load — the geometric
stiffness destabilizes the spurious mode first.  MITC4's four
independent samples leave no such mode: the same mesh lands 0.5%
from the exact closed form at both thicknesses.

Kinematics (w, βx, βy per node — β are the rotations of the normal,
u = −z·βx, v = −z·βy):

    curvature κ = [βx,x;  βy,y;  βx,y + βy,x]
    shear     γ = [w,x − βx;  w,y − βy]
    K_e = ∫ B_bᵀ D_b B_b dA  +  ∫ B̄_sᵀ D_s B̄_s dA   (both 2×2;
          B̄_s the MITC4 assumed shear interpolation)
    D_b = E t³/12(1−ν²) · [[1, ν, 0], [ν, 1, 0], [0, 0, (1−ν)/2]]
    D_s = κ_s G t I₂,  κ_s = 5/6  (Reissner's parabolic-shear factor)

Verification anchors (tests/test_plate.py) are exact Mindlin/Navier
series — hard simply supported rectangle under uniform q:

    w(x,y) = Σ_mn q_mn sin(mπx/a) sin(nπy/b) ·
             [1/(D k⁴) + 1/(κ_s G t k²)],   k² = (mπ/a)² + (nπ/b)²

valid for ANY thickness (the shear term is the Mindlin correction),
plus the thin-limit Kirchhoff coefficients (α = 0.00406 qa⁴/D simply
supported, 0.00126 clamped) under refinement, and SS-plate
frequencies ω_mn = k²√(D/ρt) in the thin limit (consistent mass with
ρt³/12 rotary inertia).

Execution tiers follow the family doctrine: dense host float64 below
DENSE_DOF_LIMIT; the banded DIA device tier rides ops/dia.py
unchanged (dia_layout is dof_map-generic — 3 DOFs/node like frames).
All element math is batched (m, 12, 12) einsum contractions with an
xp parameter, so the traced jnp twin reuses the same closed forms
(models/plane.py doctrine — no second implementation to drift).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .plane import _CORNERS, _GP, _einsum, _q4_dn, rect_mesh  # noqa: F401

_SHEAR_K = 5.0 / 6.0


@dataclass
class PlateProblem:
    """Mindlin plate: nodes (n, 2) midsurface coordinates; elements
    (m, 4) Q4 (CCW); per-element material (scalars broadcast); nodal
    loads (3n,) as [Fz, Mx, My]*n on the 3-DOF numbering w_i = 3i,
    βx_i = 3i+1, βy_i = 3i+2; optional uniform transverse pressure
    (force/area, consistent nodal loads) and per-node point masses."""
    nodes: np.ndarray
    elements: np.ndarray
    young: np.ndarray            # (m,) or scalar
    poisson: np.ndarray
    thickness: np.ndarray
    density: np.ndarray
    loads: np.ndarray            # (3n,)
    fixed_dofs: np.ndarray
    pressure: Optional[np.ndarray] = None       # (m,) or scalar q
    point_masses: Optional[np.ndarray] = None   # (n,)
    # Through-thickness thermal gradient load case: temperature is the
    # TOP-minus-BOTTOM face difference ΔT (per-element, broadcast),
    # producing the thermal curvature κ_th = α ΔT / t [1, 1, 0] —
    # the bending twin of the plane family's in-plane ΔT case.
    alpha_cte: Optional[np.ndarray] = None      # (m,) or scalar α
    temperature: Optional[np.ndarray] = None    # (m,) or scalar ΔT

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=float)
        if self.nodes.ndim != 2 or self.nodes.shape[1] != 2:
            raise ValueError("plate nodes must be (n, 2)")
        self.elements = np.asarray(self.elements, dtype=int)
        if self.elements.ndim != 2 or self.elements.shape[1] != 4:
            raise ValueError("plate elements must be (m, 4) Q4 — the "
                             "MITC4 Mindlin element is quadrilateral")
        n, m = self.nodes.shape[0], self.elements.shape[0]
        if self.elements.min(initial=0) < 0 \
                or self.elements.max(initial=-1) >= n:
            raise ValueError("element connectivity out of node range")
        for name in ("young", "poisson", "thickness", "density"):
            v = np.broadcast_to(
                np.asarray(getattr(self, name), dtype=float), (m,))
            setattr(self, name, np.array(v))
        if np.any(self.young <= 0) or np.any(self.thickness <= 0):
            raise ValueError("young and thickness must be positive")
        if np.any(self.poisson < 0) or np.any(self.poisson >= 0.5):
            raise ValueError("poisson must lie in [0, 0.5)")
        self.loads = np.asarray(self.loads, dtype=float).reshape(-1)
        if self.loads.size != 3 * n:
            raise ValueError(f"loads must have 3*nnode = {3 * n} "
                             f"entries, got {self.loads.size}")
        self.fixed_dofs = np.unique(np.asarray(self.fixed_dofs,
                                               dtype=int).reshape(-1))
        if self.fixed_dofs.size and (self.fixed_dofs.min() < 0
                                     or self.fixed_dofs.max() >= 3 * n):
            raise ValueError("fixed_dofs out of range")
        if self.pressure is not None:
            self.pressure = np.broadcast_to(
                np.asarray(self.pressure, dtype=float), (m,)).copy()
        if self.point_masses is not None:
            self.point_masses = np.broadcast_to(
                np.asarray(self.point_masses, dtype=float), (n,)).copy()
        if self.temperature is not None:
            if self.alpha_cte is None:
                raise ValueError("a plate temperature gradient needs "
                                 "the thermal expansion coefficient "
                                 "alpha_cte (κ_th = α ΔT / t)")
            self.temperature = np.broadcast_to(
                np.asarray(self.temperature, dtype=float), (m,)).copy()
        if self.alpha_cte is not None:
            self.alpha_cte = np.broadcast_to(
                np.asarray(self.alpha_cte, dtype=float), (m,)).copy()
        from .plane import _q4_detj
        if np.any(_q4_detj(self.coords()) <= 0.0):
            raise ValueError("plate quadrilaterals must be CCW and "
                             "convex enough for positive Jacobians")

    @property
    def nnode(self) -> int:
        return self.nodes.shape[0]

    @property
    def nelm(self) -> int:
        return self.elements.shape[0]

    @property
    def ndof(self) -> int:
        return 3 * self.nnode

    def coords(self) -> np.ndarray:
        return self.nodes[self.elements]          # (m, 4, 2)

    def dof_map(self) -> np.ndarray:
        return (3 * self.elements[:, :, None]
                + np.arange(3)).reshape(self.nelm, 12)

    def free_mask(self) -> np.ndarray:
        mask = np.ones(self.ndof)
        mask[self.fixed_dofs] = 0.0
        return mask


# --------------------------------------------------------------------
# Element closed forms (batched, xp-parameterized: numpy host = jnp
# traced twin share one implementation — models/plane.py doctrine)


def _shape_grads(coords, xi, eta, xp=np):
    """(N (4,), dN/dx (m, 4), dN/dy (m, 4), detJ (m,)) at one natural
    point — the bilinear isoparametric map (plane.py's _q4_point
    without the membrane Voigt packing; plates need N itself for the
    shear and mass terms)."""
    xa, ea = _CORNERS[:, 0], _CORNERS[:, 1]
    n = 0.25 * (1.0 + xa * xi) * (1.0 + ea * eta)           # (4,)
    dn = _q4_dn(xi, eta)                                    # (2, 4)
    jac = _einsum(xp, "an,mnc->mac", xp.asarray(dn), coords)
    det = jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0]
    inv = xp.stack([
        xp.stack([jac[:, 1, 1], -jac[:, 0, 1]], axis=-1),
        xp.stack([-jac[:, 1, 0], jac[:, 0, 0]], axis=-1)],
        axis=-2) / det[:, None, None]
    dxy = _einsum(xp, "mab,bn->man", inv, xp.asarray(dn))   # (m, 2, 4)
    return n, dxy[:, 0], dxy[:, 1], det


def _bend_b(dx, dy, xp=np):
    """(m, 3, 12) curvature-displacement matrix at one point, DOF
    order (w, βx, βy) per node: κ = [βx,x; βy,y; βx,y + βy,x]."""
    m = dx.shape[0]
    z = xp.zeros_like(dx)
    cols = []
    for i in range(4):
        cols.append(xp.stack([z[:, i], z[:, i], z[:, i]], axis=-1))
        cols.append(xp.stack([dx[:, i], z[:, i], dy[:, i]], axis=-1))
        cols.append(xp.stack([z[:, i], dy[:, i], dx[:, i]], axis=-1))
    return xp.stack(cols, axis=-1)                 # (m, 3, 12)


def _shear_b(n, dx, dy, xp=np):
    """(m, 2, 12) DISPLACEMENT-BASED shear matrix at one point:
    γ = [w,x − βx; w,y − βy].  Kept for reference/diagnostics; the
    stiffness uses the MITC4 assumed shear field below (see the
    module docstring for the measured failure that forced the
    upgrade)."""
    z = xp.zeros_like(dx)
    nn = xp.broadcast_to(xp.asarray(n), dx.shape)
    cols = []
    for i in range(4):
        cols.append(xp.stack([dx[:, i], dy[:, i]], axis=-1))
        cols.append(xp.stack([-nn[:, i], z[:, i]], axis=-1))
        cols.append(xp.stack([z[:, i], -nn[:, i]], axis=-1))
    return xp.stack(cols, axis=-1)                 # (m, 2, 12)


# MITC4 (Bathe-Dvorkin) assumed transverse shear: the covariant
# shears are SAMPLED at the edge midpoints and interpolated —
# γ̃_ξ linear in η from samples at (0, ±1), γ̃_η linear in ξ from
# samples at (±1, 0) — then rotated to cartesian with J⁻¹ at the
# integration point.  Locking-free AND rank-sufficient: unlike
# one-point (SRI) shear it leaves no soft zigzag w-modes for the
# geometric stiffness to destabilize (module docstring).

_MITC_XI = ((0.0, 1.0), (0.0, -1.0))    # γ̃_ξ sample points
_MITC_ETA = ((1.0, 0.0), (-1.0, 0.0))   # γ̃_η sample points


def _cov_shear_row(coords, xi, eta, comp, xp=np):
    """(m, 12) covariant transverse shear row at one natural point:
    γ̃ = w,ξᶜ − N_i(ξ,η)(x,ξᶜ βx + y,ξᶜ βy), comp 0 → ξ, 1 → η."""
    xa, ea = _CORNERS[:, 0], _CORNERS[:, 1]
    n = 0.25 * (1.0 + xa * xi) * (1.0 + ea * eta)           # (4,)
    dn = _q4_dn(xi, eta)[comp]                              # (4,)
    tang = _einsum(xp, "n,mnc->mc", xp.asarray(dn), coords)  # (m, 2)
    ones = xp.ones_like(tang[:, 0])
    cols = []
    for i in range(4):
        cols.append(float(dn[i]) * ones)
        cols.append(-float(n[i]) * tang[:, 0])
        cols.append(-float(n[i]) * tang[:, 1])
    return xp.stack(cols, axis=-1)                          # (m, 12)


def _mitc_rows(coords, xp=np):
    """The four covariant sample rows (each (m, 12)) of the MITC4
    field: (γ̃_ξ @ (0,+1), γ̃_ξ @ (0,−1), γ̃_η @ (+1,0),
    γ̃_η @ (−1,0))."""
    a1 = _cov_shear_row(coords, *_MITC_XI[0], 0, xp)
    a2 = _cov_shear_row(coords, *_MITC_XI[1], 0, xp)
    b1 = _cov_shear_row(coords, *_MITC_ETA[0], 1, xp)
    b2 = _cov_shear_row(coords, *_MITC_ETA[1], 1, xp)
    return a1, a2, b1, b2


def _shear_b_mitc(coords, rows, xi, eta, xp=np):
    """((m, 2, 12) cartesian MITC4 shear matrix, (m,) detJ) at one
    natural point: interpolate the covariant samples, rotate with
    J⁻¹(ξ, η)."""
    a1, a2, b1, b2 = rows
    bxi = 0.5 * (1.0 + eta) * a1 + 0.5 * (1.0 - eta) * a2
    bet = 0.5 * (1.0 + xi) * b1 + 0.5 * (1.0 - xi) * b2
    btil = xp.stack([bxi, bet], axis=-2)                    # (m, 2, 12)
    dn = _q4_dn(xi, eta)
    jac = _einsum(xp, "an,mnc->mac", xp.asarray(dn), coords)
    det = jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0]
    inv = xp.stack([
        xp.stack([jac[:, 1, 1], -jac[:, 0, 1]], axis=-1),
        xp.stack([-jac[:, 1, 0], jac[:, 0, 0]], axis=-1)],
        axis=-2) / det[:, None, None]
    return _einsum(xp, "mab,mbk->mak", inv, btil), det


def _dmats(young, poisson, thickness, xp=np):
    """(D_b (m, 3, 3), D_s scalar (m,)): bending rigidity matrix and
    the isotropic shear stiffness κ_s G t (D_s is D_s·I₂)."""
    e, nu, t = young, poisson, thickness
    d = e * t ** 3 / (12.0 * (1.0 - nu * nu))
    z = xp.zeros_like(d)
    db = xp.stack([
        xp.stack([d, d * nu, z], axis=-1),
        xp.stack([d * nu, d, z], axis=-1),
        xp.stack([z, z, d * (1.0 - nu) / 2.0], axis=-1)], axis=-2)
    g = e / (2.0 * (1.0 + nu))
    return db, _SHEAR_K * g * t


def _k_blocks_plate(coords, young, poisson, thickness, xp=np):
    """(m, 12, 12) MITC4 Mindlin stiffness blocks: bending 2×2 Gauss
    on the displacement curvatures, transverse shear 2×2 Gauss on the
    ASSUMED (edge-midpoint-sampled) shear field — locking-free with
    no soft modes (module docstring)."""
    db, ds = _dmats(young, poisson, thickness, xp)
    rows = _mitc_rows(coords, xp)
    k = None
    for xi, eta in _GP:                     # 2×2 (weights 1)
        _, dx, dy, det = _shape_grads(coords, xi, eta, xp)
        bb = _bend_b(dx, dy, xp)
        kg = det[:, None, None] * _einsum(xp, "mia,mij,mjb->mab",
                                          bb, db, bb)
        bs, dets = _shear_b_mitc(coords, rows, xi, eta, xp)
        kg = kg + (ds * dets)[:, None, None] \
            * _einsum(xp, "mia,mib->mab", bs, bs)
        k = kg if k is None else k + kg
    return k


def _m_blocks_plate(coords, density, thickness, xp=np):
    """(m, 12, 12) CONSISTENT mass blocks: ρt translational (w) +
    ρt³/12 rotary inertia (βx, βy), 2×2 Gauss."""
    m = None
    for xi, eta in _GP:
        n, _, _, det = _shape_grads(coords, xi, eta, xp)
        nn = np.outer(n, n)                                 # (4, 4)
        mw = (density * thickness * det)                    # (m,)
        mr = (density * thickness ** 3 / 12.0 * det)
        blk = np.zeros((coords.shape[0], 12, 12))
        blk[:, 0::3, 0::3] = mw[:, None, None] * nn
        blk[:, 1::3, 1::3] = mr[:, None, None] * nn
        blk[:, 2::3, 2::3] = mr[:, None, None] * nn
        m = blk if m is None else m + blk
    return m


def _pressure_vectors(problem: PlateProblem) -> np.ndarray:
    """(3n,) consistent nodal loads of a uniform transverse pressure
    q (force/area) on the w DOFs: ∫ N q dA, 2×2 Gauss."""
    f = np.zeros(problem.ndof)
    if problem.pressure is None:
        return f
    coords = problem.coords()
    fe = np.zeros((problem.nelm, 12))
    for xi, eta in _GP:
        n, _, _, det = _shape_grads(coords, xi, eta)
        fe[:, 0::3] += (problem.pressure * det)[:, None] * n[None, :]
    np.add.at(f, problem.dof_map(), fe)
    return f


def _thermal_curvature(problem: PlateProblem):
    """(m, 3) Voigt thermal curvature of the through-thickness ΔT
    load case, or None: a linear profile T(z) = T_m + z ΔT/t bends the
    midsurface with κ_th = α ΔT / t [1, 1, 0] (the membrane mean T_m
    has no bending-DOF coupling — this model carries no membrane).
    Thermoelasticity is a STATIC load case (models/plane.py doctrine):
    the dynamic solvers refuse a temperature field loudly."""
    if problem.temperature is None:
        return None
    k = problem.alpha_cte * problem.temperature / problem.thickness
    z = np.zeros_like(k)
    return np.stack([k, k, z], axis=-1)


def _thermal_load_vectors(problem: PlateProblem) -> np.ndarray:
    """(3n,) consistent thermal nodal loads f_th = ∫ B_bᵀ D_b κ_th dΩ
    (2×2 Gauss).  Two exact discrete anchors (tests/test_plate.py):
    a FREE plate under uniform κ_th bends into the stress-free
    spherical cap (the MITC4 constant-curvature patch state — moments
    vanish to machine precision), and a fully CLAMPED plate stays
    flat with M = −D_b κ_th, σ = E α ΔT / (2(1−ν)) exactly (constant
    M_th self-equilibrates at interior nodes by the divergence
    theorem, so u ≡ 0 is the discrete solution)."""
    f = np.zeros(problem.ndof)
    kap_th = _thermal_curvature(problem)
    if kap_th is None:
        return f
    coords = problem.coords()
    db, _ = _dmats(problem.young, problem.poisson, problem.thickness)
    m_th = np.einsum("mij,mj->mi", db, kap_th)              # (m, 3)
    fe = np.zeros((problem.nelm, 12))
    for xi, eta in _GP:
        _, dx, dy, det = _shape_grads(coords, xi, eta)
        bb = _bend_b(dx, dy)
        fe += det[:, None] * np.einsum("mia,mi->ma", bb, m_th)
    np.add.at(f, problem.dof_map(), fe)
    return f


def _require_no_thermal(problem: PlateProblem, kind: str):
    """Dynamic paths refuse a ΔT gradient: the forcing is amplitude-
    scaled in time and a thermal load is a constant static case —
    oscillating it would be silently wrong physics (the plane
    family's rule, models/plane.py:_require_no_thermal)."""
    if problem.temperature is not None:
        raise ValueError(
            f"plate {kind} does not take a temperature-gradient load "
            "case — thermoelastic bending is static; use analysis "
            'type "static"')


def _assemble(problem: PlateProblem, blocks: np.ndarray) -> np.ndarray:
    dm = problem.dof_map()
    k = np.zeros((problem.ndof, problem.ndof))
    np.add.at(k, (dm[:, :, None], dm[:, None, :]), blocks)
    return k


def plate_matrices(problem: PlateProblem, with_mass: bool = True):
    """(K, M) dense global matrices (M None unless with_mass) — host
    float64, shared by every dense plate solver."""
    coords = problem.coords()
    k = _assemble(problem, _k_blocks_plate(
        coords, problem.young, problem.poisson, problem.thickness))
    mmat = None
    if with_mass:
        mmat = _assemble(problem, _m_blocks_plate(
            coords, problem.density, problem.thickness))
        if problem.point_masses is not None:
            pm = np.zeros(problem.ndof)
            pm[0::3] += problem.point_masses
            mmat = mmat + np.diag(pm)
    return k, mmat


def recover_moments(problem: PlateProblem, u: np.ndarray):
    """Centroid bending moments (m, 3) Voigt [Mxx, Myy, Mxy]
    (force·length/length), shear forces (m, 2) [Qx, Qy], and the
    extreme-fiber von Mises stress (m,) at z = ±t/2:
    σ = 6M/t² (+ the small transverse-shear term is omitted at the
    surface, where it vanishes — Reissner's parabolic profile)."""
    coords = problem.coords()
    db, ds = _dmats(problem.young, problem.poisson, problem.thickness)
    n, dx, dy, _ = _shape_grads(coords, 0.0, 0.0)
    u_e = u[problem.dof_map()]
    kap = np.einsum("mia,ma->mi", _bend_b(dx, dy), u_e)
    kap_th = _thermal_curvature(problem)
    if kap_th is not None:
        # physical stress resultant: M = D_b (κ − κ_th) — the free
        # thermal cap is moment-free, the clamped flat plate carries
        # M = −D_b κ_th (the two exact anchors, tests/test_plate.py)
        kap = kap - kap_th
    mom = np.einsum("mij,mj->mi", db, kap)
    bs, _ = _shear_b_mitc(coords, _mitc_rows(coords), 0.0, 0.0)
    gam = np.einsum("mia,ma->mi", bs, u_e)
    q = ds[:, None] * gam
    s = 6.0 * mom / problem.thickness[:, None] ** 2
    sxx, syy, sxy = s[:, 0], s[:, 1], s[:, 2]
    vm = np.sqrt(sxx ** 2 - sxx * syy + syy ** 2 + 3.0 * sxy ** 2)
    return mom, q, vm


@dataclass
class PlateStaticResult:
    displacements: np.ndarray    # (3n,) [w, βx, βy]*n
    moments: np.ndarray          # (m, 3) centroid [Mxx, Myy, Mxy]
    shear_forces: np.ndarray     # (m, 2) centroid [Qx, Qy]
    von_mises: np.ndarray        # (m,) extreme-fiber
    reactions: np.ndarray        # (3n,) K u − f on fixed DOFs


def solve_plate_static(problem: PlateProblem) -> PlateStaticResult:
    """Dense masked static solve + centroid moment recovery (host
    float64 — the family doctrine below DENSE_DOF_LIMIT)."""
    k, _ = plate_matrices(problem, with_mass=False)
    mask = problem.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    f = problem.loads + _pressure_vectors(problem) \
        + _thermal_load_vectors(problem)
    u = np.linalg.solve(km, f * mask) * mask
    mom, q, vm = recover_moments(problem, u)
    reactions = (k @ u - f) * (1.0 - mask)
    return PlateStaticResult(displacements=u, moments=mom,
                             shear_forces=q, von_mises=vm,
                             reactions=reactions)


@dataclass
class PlateModalResult:
    frequencies_hz: np.ndarray
    omegas: np.ndarray
    eigenvalues: np.ndarray
    mode_shapes: np.ndarray      # (n_modes, 3n)


def plate_modal(problem: PlateProblem,
                n_modes: int = 6,
                membrane_force=None) -> PlateModalResult:
    """Generalized K φ = λ M φ on the free block (consistent mass
    with rotary inertia) — dense host eigensolve, the family
    pattern.

    membrane_force: optional in-plane force state [Nxx, Nyy, Nxy]
    (force/length, per-element broadcast) — adds the geometric
    stiffness K_g(N) (plate_geometric_stiffness), so tension raises
    the frequencies and compression lowers them; ω₁ → 0 exactly at
    the state's own buckling factor (the vibration-buckling link,
    tests/test_plate.py)."""
    import scipy.linalg

    k, m = plate_matrices(problem)
    if membrane_force is not None:
        k = k + plate_geometric_stiffness(problem, membrane_force)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    n_modes = min(n_modes, lam.size)
    lam = np.maximum(lam[:n_modes], 0.0)
    shapes = np.zeros((n_modes, problem.ndof))
    shapes[:, free] = vec[:, :n_modes].T
    om = np.sqrt(lam)
    return PlateModalResult(frequencies_hz=om / (2.0 * np.pi),
                            omegas=om, eigenvalues=lam,
                            mode_shapes=shapes)


# --------------------------------------------------------------------
# Initial-stress (geometric) stiffness and linearized plate buckling.
# The bending model carries no membrane DOFs, so the membrane force
# state N = [Nxx, Nyy, Nxy] (force/length, tension positive) is an
# INPUT — the classic "initial stress" plate buckling problem (the
# reference rpacheco-blazquez/PINN-FEM has no stability analysis at
# all; this mirrors the framework's own plane/solid/frame K_g tier,
# models/plane.py:plane_geometric_stiffness).


def _membrane_force_array(problem: PlateProblem,
                          membrane_force) -> np.ndarray:
    n = np.asarray(membrane_force, dtype=float)
    if n.ndim <= 1:
        n = np.broadcast_to(n.reshape(-1), (3,))
        n = np.broadcast_to(n, (problem.nelm, 3))
    if n.shape != (problem.nelm, 3):
        raise ValueError("membrane_force must be [Nxx, Nyy, Nxy] or "
                         f"(nelm, 3); got shape {n.shape}")
    return np.array(n, dtype=float)


def _gw_blocks(dx, dy, xp=np):
    """(m, 2, 12) transverse-deflection gradient matrix at one point:
    ∇w = [w,x; w,y] — only the w columns (0::3) carry entries."""
    z = xp.zeros_like(dx)
    cols = []
    for i in range(4):
        cols.append(xp.stack([dx[:, i], dy[:, i]], axis=-1))
        cols.append(xp.stack([z[:, i], z[:, i]], axis=-1))
        cols.append(xp.stack([z[:, i], z[:, i]], axis=-1))
    return xp.stack(cols, axis=-1)                 # (m, 2, 12)


def plate_geometric_stiffness(problem: PlateProblem,
                              membrane_force) -> np.ndarray:
    """Dense geometric stiffness of a membrane force state:
    K_g = ∫ ∇wᵀ N ∇w dA (2×2 Gauss), N the 2×2 in-plane force tensor
    [[Nxx, Nxy], [Nxy, Nyy]].  Exact for the linearized (von Kármán)
    plate buckling pencil; the w-gradient term needs no reduced
    integration (no constraint to lock on)."""
    nf = _membrane_force_array(problem, membrane_force)
    nmat = np.empty((problem.nelm, 2, 2))
    nmat[:, 0, 0] = nf[:, 0]
    nmat[:, 1, 1] = nf[:, 1]
    nmat[:, 0, 1] = nmat[:, 1, 0] = nf[:, 2]
    coords = problem.coords()
    kg = None
    for xi, eta in _GP:
        _, dx, dy, det = _shape_grads(coords, xi, eta)
        gw = _gw_blocks(dx, dy)
        blk = det[:, None, None] * np.einsum("mia,mij,mjb->mab",
                                             gw, nmat, gw)
        kg = blk if kg is None else kg + blk
    return _assemble(problem, kg)


@dataclass
class PlateBucklingResult:
    load_factors: np.ndarray     # (n_modes,) ascending positive λ
    modes: np.ndarray            # (n_modes, 3n)


def plate_buckling(problem: PlateProblem, membrane_force,
                   n_modes: int = 4) -> PlateBucklingResult:
    """Linearized plate buckling: (K + λ K_g(N)) φ = 0 on the free
    block — λ_cr scales the GIVEN membrane force state (a compressive
    state must be passed with negative N; tension stiffens).  Solved
    as the SYMMETRIC pencil −K_g φ = μ K φ (K SPD on a supported
    mesh), λ = 1/μ for the largest positive μ — the plane-family
    pattern (models/plane.py:plane_buckling).

    Anchored on the EXACT hard-SS Mindlin closed form
    N_cr(m, n) = D k⁴ / [(1 + D k²/κGt)(mπ/a)²] (the Navier modes
    diagonalize bending, shear AND the geometric operator, so the
    formula is thickness-valid — mindlin_ss_buckling_nx below;
    tests/test_plate.py)."""
    import scipy.linalg

    kg = plate_geometric_stiffness(problem, membrane_force)
    k, _ = plate_matrices(problem, with_mass=False)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf = k[np.ix_(free, free)]
    gf = kg[np.ix_(free, free)]
    mu, vec = scipy.linalg.eigh(-gf, kf)
    pos = np.flatnonzero(mu > 1e-12 * np.abs(mu).max())
    if pos.size == 0:
        raise ValueError("the membrane force state destabilizes no "
                         "mode (all-tension N?) — plate buckling "
                         "needs a compressive component")
    order = pos[np.argsort(mu[pos])[::-1]][:n_modes]  # largest μ first
    lam = 1.0 / mu[order]
    modes = np.zeros((order.size, problem.ndof))
    modes[:, free] = vec[:, order].T
    return PlateBucklingResult(load_factors=lam, modes=modes)


def mindlin_ss_buckling_nx(a: float, b: float, young: float,
                           poisson: float, thickness: float,
                           m_max: int = 8, n_max: int = 8) -> float:
    """EXACT critical uniaxial compression |Nx| of the hard-SS Mindlin
    rectangle (any thickness): min over (m, n) of
    D k⁴ / [(1 + D k²/κGt)(mπ/a)²], k² = (mπ/a)² + (nπ/b)².
    D k⁴/(1 + D k²/c) is the static condensation of the elastic
    operator onto the (m, n) Navier mode (the same 1/(Dk⁴) + 1/(ck²)
    compliance as mindlin_navier_w); the geometric operator adds
    Nx (mπ/a)² on w alone.  Thin limit: the Kirchhoff k-factor
    (k = 4 for the square).  The buckling test anchor."""
    d = young * thickness ** 3 / (12.0 * (1.0 - poisson ** 2))
    c = _SHEAR_K * young / (2.0 * (1.0 + poisson)) * thickness
    best = np.inf
    for mm in range(1, m_max + 1):
        for nn in range(1, n_max + 1):
            k2 = (mm * np.pi / a) ** 2 + (nn * np.pi / b) ** 2
            ncr = d * k2 ** 2 / ((1.0 + d * k2 / c)
                                 * (mm * np.pi / a) ** 2)
            best = min(best, ncr)
    return float(best)


# --------------------------------------------------------------------
# Boundary helpers: the classic plate supports on generated meshes.


def plate_supports(nodes: np.ndarray, edges, kind: str,
                   tol: float = 1e-9):
    """Fixed-DOF list for the classic plate boundary conditions on the
    named rectangle edges ("left"/"right"/"bottom"/"top").

    "clamped"            w = βx = βy = 0
    "simply_supported"   HARD simple support: w = 0 AND the rotation
                         component ALONG the edge = 0 (βy on x-normal
                         edges, βx on y-normal edges) — the condition
                         the Navier/Mindlin series solves; soft SS
                         (w only) differs at the corners
    "free"               (accepted, adds nothing)
    """
    if isinstance(edges, str):
        edges = [edges]
    span_x = max(float(nodes[:, 0].max() - nodes[:, 0].min()), 1.0)
    span_y = max(float(nodes[:, 1].max() - nodes[:, 1].min()), 1.0)
    sel = {
        "left": np.abs(nodes[:, 0] - nodes[:, 0].min()) <= tol * span_x,
        "right": np.abs(nodes[:, 0] - nodes[:, 0].max()) <= tol * span_x,
        "bottom": np.abs(nodes[:, 1] - nodes[:, 1].min()) <= tol * span_y,
        "top": np.abs(nodes[:, 1] - nodes[:, 1].max()) <= tol * span_y,
    }
    fixed = []
    for e in edges:
        if e not in sel:
            raise ValueError(f'plate edge must be one of {sorted(sel)},'
                             f' got {e!r}')
        ids = np.flatnonzero(sel[e])
        if kind == "clamped":
            fixed += [3 * ids, 3 * ids + 1, 3 * ids + 2]
        elif kind == "simply_supported":
            tangent_rot = 2 if e in ("left", "right") else 1
            fixed += [3 * ids, 3 * ids + tangent_rot]
        elif kind == "free":
            pass
        else:
            raise ValueError('plate support kind must be "clamped", '
                             '"simply_supported" or "free"')
    return (np.unique(np.concatenate(fixed)) if fixed
            else np.zeros(0, dtype=int))


def mindlin_navier_w(a: float, b: float, x: float, y: float, q: float,
                     young: float, poisson: float, thickness: float,
                     n_terms: int = 60) -> float:
    """EXACT hard-SS Mindlin deflection under uniform q (the module
    docstring's series) — the test anchor, valid for any thickness."""
    d = young * thickness ** 3 / (12.0 * (1.0 - poisson ** 2))
    c = _SHEAR_K * young / (2.0 * (1.0 + poisson)) * thickness
    w = 0.0
    for mm in range(1, n_terms, 2):
        for nn in range(1, n_terms, 2):
            k2 = (mm * np.pi / a) ** 2 + (nn * np.pi / b) ** 2
            qmn = 16.0 * q / (np.pi ** 2 * mm * nn)
            w += qmn * (1.0 / (d * k2 ** 2) + 1.0 / (c * k2)) \
                * np.sin(mm * np.pi * x / a) * np.sin(nn * np.pi * y / b)
    return w


@dataclass
class PlateTransientResult:
    times: np.ndarray
    displacements: np.ndarray    # (n_rec, probe)
    velocities: np.ndarray
    dt: float
    n_steps: int


def solve_plate_transient(problem: PlateProblem, dt: float,
                          n_steps: int, damping=(0.0, 0.0),
                          amplitude=None, probe_dofs=None,
                          record_every: int = 1
                          ) -> PlateTransientResult:
    """Newmark (average acceleration) on the dense plate K/M — one LU
    factorization serves every step (the plane/frame/solid family's
    integrator with (w, βx, βy) nodes; same t = (step+1)·dt forcing
    convention).  amplitude: (n_steps,) load-scale history multiplying
    nodal + pressure loads (None = unit step); Rayleigh C = αM + βK.
    Cross-validated against exact modal superposition of the undamped
    step response (tests/test_plate.py)."""
    import scipy.linalg

    _require_no_thermal(problem, "transient")
    if dt <= 0.0 or n_steps <= 0:
        raise ValueError("transient needs positive dt and n_steps")
    k, m = plate_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _pressure_vectors(problem)
    amp = (np.ones(n_steps) if amplitude is None
           else np.broadcast_to(np.asarray(amplitude, dtype=float),
                                (n_steps,)))
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf = k[np.ix_(free, free)]
    mf = m[np.ix_(free, free)]
    cf = c[np.ix_(free, free)]
    ff = f0[free]
    a0 = 4.0 / dt ** 2
    a1 = 2.0 / dt
    lu = scipy.linalg.lu_factor(kf + a0 * mf + a1 * cf)

    probe = (np.arange(problem.ndof) if probe_dofs is None
             else np.asarray(probe_dofs, dtype=int).reshape(-1))
    n = free.size
    u = np.zeros(n)
    v = np.zeros(n)
    a_acc = (np.linalg.solve(mf, ff * amp[0]) if n else np.zeros(0))
    rec_t, rec_u, rec_v = [], [], []
    full_u = np.zeros(problem.ndof)
    full_v = np.zeros(problem.ndof)
    for step in range(n_steps):
        f_t = ff * amp[min(step + 1, n_steps - 1)]
        rhs = f_t + mf @ (a0 * u + 2.0 * a1 * v + a_acc) \
            + cf @ (a1 * u + v)
        u_new = scipy.linalg.lu_solve(lu, rhs)
        v_new = a1 * (u_new - u) - v
        a_new = a0 * (u_new - u) - 2.0 * a1 * v - a_acc
        u, v, a_acc = u_new, v_new, a_new
        if (step + 1) % record_every == 0:
            full_u[free] = u
            full_v[free] = v
            rec_t.append((step + 1) * dt)
            rec_u.append(full_u[probe].copy())
            rec_v.append(full_v[probe].copy())
    return PlateTransientResult(
        times=np.asarray(rec_t), displacements=np.asarray(rec_u),
        velocities=np.asarray(rec_v), dt=float(dt),
        n_steps=int(n_steps))


@dataclass
class PlateHarmonicResult:
    omegas: np.ndarray
    amplitude: np.ndarray        # (n_omega, probe) |X|
    real: np.ndarray
    imag: np.ndarray


def plate_harmonic(problem: PlateProblem, omegas,
                   damping=(0.0, 0.0), probe_dofs=None
                   ) -> PlateHarmonicResult:
    """Steady-state X(ω) to the plate load pattern: direct dense
    complex solves (K − ω²M + iωC) X = f per frequency, host float64;
    Rayleigh C = αM + βK (the plane/solid/frame family's sweep with
    (w, βx, βy) nodes; same ALL-modes-superposition exactness
    cross-check, tests/test_plate.py)."""
    _require_no_thermal(problem, "harmonic")
    om = np.asarray(omegas, dtype=float).reshape(-1)
    k, m = plate_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _pressure_vectors(problem)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf = k[np.ix_(free, free)]
    mf = m[np.ix_(free, free)]
    cf = c[np.ix_(free, free)]
    ff = f0[free]
    probe = (np.arange(problem.ndof) if probe_dofs is None
             else np.asarray(probe_dofs, dtype=int).reshape(-1))
    full = np.zeros(problem.ndof, dtype=complex)
    xs = np.zeros((om.size, probe.size), dtype=complex)
    for i, w in enumerate(om):
        z = kf - (w * w) * mf + 1j * w * cf
        full[:] = 0.0
        full[free] = np.linalg.solve(z, ff)
        xs[i] = full[probe]
    return PlateHarmonicResult(omegas=om, amplitude=np.abs(xs),
                               real=xs.real, imag=xs.imag)


# --------------------------------------------------------------------
# Banded DIA device tier (the family doctrine: large meshes ride
# ops/dia.py — dia_layout is dof_map-generic, 3 DOFs/node like frames)


def _plate_dia_layout(problem: PlateProblem):
    """DIA layout cached on the instance (the plane-family rule: the
    host layout build depends only on connectivity, fixed at
    construction)."""
    import jax.numpy as jnp

    from ..ops.dia import dia_layout

    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        layout = dia_layout(problem.dof_map(), problem.ndof)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    return layout


_PLATE_BANDED_CACHE: dict = {}


def _plate_banded_core(layout, precond: str, use_pallas: bool,
                       max_iter: int, nelm: int):
    """Jitted banded plate statics, cached per structural signature
    (never per problem object — the closure recompile trap,
    CLAUDE.md)."""
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.bandwidth, nelm, precond, use_pallas, max_iter)
    core = _PLATE_BANDED_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    from ..ops.dia import assemble_dia_blocks, dia_cg_solve, dia_matvec
    from ..solvers.banded_inverse import DiaLayoutView

    @jax.jit
    def core(coords, young, poisson, thickness, entry_slot, f, mask,
             tol):
        blocks = _k_blocks_plate(coords, young, poisson, thickness,
                                 xp=jnp)
        diags = assemble_dia_blocks(
            DiaLayoutView(layout, entry_slot), blocks)
        # Jacobi scaling is load-bearing: the w / rotation DOF scales
        # differ by (a/t)² on thin plates (the frame family's mixed-
        # scale lesson).
        x, iters, rel = dia_cg_solve(layout, diags, f, mask, tol=tol,
                                     max_iter=max_iter,
                                     use_pallas=use_pallas,
                                     precond=precond, components=3)
        reac = (dia_matvec(layout, diags, x) - f) * (1.0 - mask)
        return x, reac, iters, rel

    _PLATE_BANDED_CACHE[key] = core
    return core


def solve_plate_static_banded(problem: PlateProblem,
                              tol: float = 1e-7,
                              max_iter: int = 50000,
                              use_pallas: bool = False,
                              precond: str = "auto", dtype=None,
                              mesh=None):
    """Large-mesh plate statics on the DEVICE tier.

    Floor slabs and decks mesh structurally (grids), so the Mindlin
    stiffness is banded under nodal numbering — the same DIA pipeline
    the truss/plane/frame/solid families ride (ops/dia.py): batched
    (m, 12, 12) MITC4 blocks contracted on the MXU, one scatter into
    diagonal storage, Jacobi-PCG at streaming rate.  mesh= runs the
    sharded CG (parallel/dia_sharded) with the DOF axis row-block-
    sharded over "tp".

    Returns (PlateStaticResult, iterations, relative_residual); moment
    recovery runs on the host from the fetched field (ONE device_get).
    Pinned against solve_plate_static in tests/test_plate.py."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.asarray(1.0).dtype
    if precond == "auto":
        precond = "jacobi"        # mixed w/rotation DOF scales
    layout = _plate_dia_layout(problem)
    f_np = problem.loads + _pressure_vectors(problem) \
        + _thermal_load_vectors(problem)
    if mesh is not None:
        from ..ops.dia import assemble_dia_blocks, dia_matvec
        from ..parallel.dia_sharded import dia_cg_solve_sharded
        from ..solvers.banded_inverse import DiaLayoutView

        blocks = _k_blocks_plate(
            jnp.asarray(problem.coords(), dtype),
            jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.poisson, dtype),
            jnp.asarray(problem.thickness, dtype), xp=jnp)
        diags = assemble_dia_blocks(
            DiaLayoutView(layout, problem._dia_entry_slot_dev), blocks)
        f_dev = jnp.asarray(f_np, dtype)
        mask_dev = jnp.asarray(problem.free_mask(), dtype)
        x, iters, rel = dia_cg_solve_sharded(
            layout, diags, f_dev, mask_dev, mesh, tol=float(tol),
            max_iter=int(max_iter))
        reac = (dia_matvec(layout, diags, x) - f_dev) \
            * (1.0 - mask_dev)
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    else:
        core = _plate_banded_core(layout, precond, use_pallas,
                                  int(max_iter), problem.nelm)
        x, reac, iters, rel = core(
            jnp.asarray(problem.coords(), dtype),
            jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.poisson, dtype),
            jnp.asarray(problem.thickness, dtype),
            problem._dia_entry_slot_dev,
            jnp.asarray(f_np, dtype),
            jnp.asarray(problem.free_mask(), dtype),
            jnp.asarray(tol, dtype))
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    u = np.asarray(u, dtype=float)
    mom, q, vm = recover_moments(problem, u)
    res = PlateStaticResult(displacements=u, moments=mom,
                            shear_forces=q, von_mises=vm,
                            reactions=np.asarray(reac, dtype=float))
    return res, int(iters), float(rel)


# --------------------------------------------------------------------
# Differentiable statics + Young's-modulus identification — the
# reference's flagship inverse (PINN material identification,
# /root/reference/FEM/python/examples/pinn_inverse_problem.py:96-230)
# carried to the plate bending family (models/plane.py pattern).
# Note the bending-rigidity ambiguity: E and t enter statics only
# through D ~ E t³ (plus the matching shear term), so identify E at
# KNOWN thickness — identifying both from bending data alone is
# structurally unidentifiable.


def plate_static_response(problem: PlateProblem, young_e=None,
                          thickness_e=None, loads=None,
                          load_scale=None, dtype=None):
    """Traced, differentiable plate statics with per-element
    properties: (u, moments, von_mises) from the masked dense solve
    K(E, t) u = f + centroid recovery — every output differentiable
    w.r.t. the traced property arrays (plane_static_response twin).
    Thermal loads are rebuilt TRACED (κ_th and M_th depend on t and
    E), so thermoelastic identification gradients stay exact."""
    import jax.numpy as jnp

    dtype = dtype or jnp.asarray(1.0).dtype
    m = problem.nelm
    coords = jnp.asarray(problem.coords(), dtype)
    young = jnp.broadcast_to(jnp.asarray(
        problem.young if young_e is None else young_e, dtype), (m,))
    poisson = jnp.broadcast_to(jnp.asarray(problem.poisson, dtype),
                               (m,))
    thickness = jnp.broadcast_to(jnp.asarray(
        problem.thickness if thickness_e is None else thickness_e,
        dtype), (m,))
    blocks = _k_blocks_plate(coords, young, poisson, thickness,
                             xp=jnp)
    dm = jnp.asarray(problem.dof_map())
    k = jnp.zeros((problem.ndof, problem.ndof), dtype).at[
        dm[:, :, None], dm[:, None, :]].add(blocks)

    db, _ = _dmats(young, poisson, thickness, xp=jnp)
    kap_th = None
    if problem.temperature is not None:
        kt = jnp.asarray(problem.alpha_cte * problem.temperature,
                         dtype) / thickness
        kap_th = jnp.stack([kt, kt, jnp.zeros_like(kt)], axis=-1)
    if loads is None:
        f = jnp.asarray(problem.loads + _pressure_vectors(problem),
                        dtype)
        if kap_th is not None:
            m_th = _einsum(jnp, "mij,mj->mi", db, kap_th)
            fe = jnp.zeros((m, 12), dtype)
            for xi, eta in _GP:
                _, dx, dy, det = _shape_grads(coords, xi, eta, xp=jnp)
                bb = _bend_b(dx, dy, xp=jnp)
                fe = fe + det[:, None] * _einsum(jnp, "mia,mi->ma",
                                                 bb, m_th)
            f = f + jnp.zeros(problem.ndof, dtype).at[dm.reshape(-1)
                                                      ].add(fe.reshape(-1))
    else:
        f = jnp.asarray(loads, dtype)
    if load_scale is not None:
        f = f * jnp.asarray(load_scale, dtype)
    mask = jnp.asarray(problem.free_mask(), dtype)
    km = mask[:, None] * k * mask[None, :] + jnp.diag(1.0 - mask)
    u = jnp.linalg.solve(km, f * mask) * mask

    _, dx, dy, _ = _shape_grads(coords, 0.0, 0.0, xp=jnp)
    kap = _einsum(jnp, "mia,ma->mi", _bend_b(dx, dy, xp=jnp), u[dm])
    if kap_th is not None:
        kap = kap - kap_th
    mom = _einsum(jnp, "mij,mj->mi", db, kap)
    s = 6.0 * mom / thickness[:, None] ** 2
    vm = jnp.sqrt(s[:, 0] ** 2 - s[:, 0] * s[:, 1] + s[:, 1] ** 2
                  + 3.0 * s[:, 2] ** 2)
    return u, mom, vm


def identify_plate_young(problem: PlateProblem, measured_dofs,
                         measured_disp, n_iter: int = 800,
                         learning_rate: float = 0.05,
                         field: bool = False, seed: int = 0,
                         hidden_layers: int = 2,
                         neurons_per_layer: int = 16):
    """Recover Young's modulus from measured plate deflections —
    identify_plane_young's contract on the bending family.

    field=False: per-element log-E ADAM; field=True: a smooth E(x, y)
    MLP (models/fields.py) at element centroids trained through the
    traced solve.  Returns (young (m,), loss_history, field|None)."""
    import jax
    import jax.numpy as jnp
    import optax

    meas_idx = jnp.asarray(np.asarray(measured_dofs,
                                      dtype=int).reshape(-1))
    meas = jnp.asarray(np.asarray(measured_disp,
                                  dtype=float).reshape(-1))
    centroids = jnp.asarray(problem.coords().mean(axis=1))
    # Measurement-scale-normalized loss: unit-invariant, so SI-unit
    # micrometre deflections don't stall ADAM at its eps floor
    # (solvers/banded_inverse.py — the measured failure).
    meas_scale = float(max(np.mean(np.asarray(measured_disp,
                                              dtype=float) ** 2),
                           1e-300))

    def u_of(young_e):
        u, _, _ = plate_static_response(problem, young_e=young_e)
        return u

    if field:
        from .fields import make_mlp_field

        params0 = make_mlp_field(jax.random.PRNGKey(seed),
                                 hidden_layers=hidden_layers,
                                 neurons_per_layer=neurons_per_layer,
                                 input_dim=2,
                                 scale=float(np.mean(problem.young)))

        def loss_fn(fld):
            u = u_of(fld.eval_batch(centroids))
            return jnp.mean((u[meas_idx] - meas) ** 2) / meas_scale
    else:
        params0 = jnp.log(jnp.asarray(problem.young))

        def loss_fn(log_e):
            u = u_of(jnp.exp(log_e))
            return jnp.mean((u[meas_idx] - meas) ** 2) / meas_scale

    opt = optax.adam(learning_rate)
    state = opt.init(params0)
    params = params0
    hist = []

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(int(n_iter)):
        params, state, loss = step(params, state)
        hist.append(float(loss))
    if field:
        return (np.asarray(params.eval_batch(centroids)),
                np.asarray(hist), params)
    return np.asarray(jnp.exp(params)), np.asarray(hist), None


def identify_plate_young_banded(problem: PlateProblem, measured_dofs,
                                measured_disp, n_iter: int = 300,
                                learning_rate: float = 0.05,
                                tol: float = 1e-7,
                                max_iter: int = 20000,
                                zones=None, field: bool = False,
                                seed: int = 0, hidden_layers: int = 2,
                                neurons_per_layer: int = 16):
    """identify_plate_young past DENSE_DOF_LIMIT: the forward model is
    the banded PCG solve (ops/dia.dia_solve_diff — Jacobi-scaled for
    the plate's mixed (a/t)² DOF scales), the reverse pass one adjoint
    PCG (solvers/banded_inverse.identify_young_banded, shared with the
    plane/solid families; only the MITC4 block builder is plate-
    specific).  zones=[[ids..]|bbox, ..] gives one log-E per zone —
    slab damage localization.  Returns (young, hist, field|None)."""
    import jax.numpy as jnp

    from ..solvers.banded_inverse import identify_young_banded

    _require_no_thermal(problem, "banded identification")
    layout = _plate_dia_layout(problem)
    m = problem.nelm
    dtype = jnp.asarray(1.0).dtype
    coords = jnp.asarray(problem.coords(), dtype)
    poisson = jnp.broadcast_to(jnp.asarray(problem.poisson, dtype),
                               (m,))
    thickness = jnp.broadcast_to(jnp.asarray(problem.thickness,
                                             dtype), (m,))

    def blocks_of(young_e):
        return _k_blocks_plate(coords, young_e, poisson, thickness,
                               xp=jnp)

    return identify_young_banded(
        layout, problem._dia_entry_slot_dev, blocks_of,
        np.broadcast_to(np.asarray(problem.young, dtype=float),
                        (m,)).copy(),
        problem.coords().mean(axis=1),
        problem.loads + _pressure_vectors(problem),
        problem.free_mask(), measured_dofs, measured_disp,
        n_iter=n_iter, learning_rate=learning_rate, tol=tol,
        max_iter=max_iter, zones=zones, field=field, seed=seed,
        hidden_layers=hidden_layers,
        neurons_per_layer=neurons_per_layer, input_dim=2)
