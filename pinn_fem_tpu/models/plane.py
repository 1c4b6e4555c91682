"""2D plane-stress / plane-strain continuum elements — membranes join
the framework.

The reference (rpacheco-blazquez/PINN-FEM) and every family above it
are LINE elements: truss (two force DOFs, axial only,
/root/reference/FEM/python/fem/element.py:15-133) and this build's
Euler-Bernoulli frames (models/frame.py).  Real 2D components — shear
walls, gusset plates, dam cross-sections, membrane skins — are
continua, so this module adds the two classic isoparametric membrane
elements:

    CST  3-node constant-strain triangle: B constant, closed-form
         K_e = t A Bᵀ D B (6×6) — exact for any constant-strain field
         on any (non-degenerate) mesh, the patch-test anchor.
    Q4   4-node bilinear quadrilateral, 2×2 Gauss quadrature:
         K_e = Σ_g w_g t Bᵀ(ξ_g) D B(ξ_g) |J(ξ_g)| (8×8) — the
         workhorse element, one order better than CST per DOF in
         bending-dominated fields.

Constitutive matrices (σ = D ε, Voigt [σxx, σyy, σxy]):

    plane stress  D = E/(1−ν²) [[1, ν, 0], [ν, 1, 0],
                                [0, 0, (1−ν)/2]]
    plane strain  D = E/((1+ν)(1−2ν)) [[1−ν, ν, 0], [ν, 1−ν, 0],
                                       [0, 0, (1−2ν)/2]]

Execution tier: like frames, plane meshes in the interactive regime
run on the HOST tier (numpy float64, zero device programs — the
doctrine ops/host.py set for everything below DENSE_DOF_LIMIT).  All
element math is BATCHED over elements ((m, nen, 2) coordinate blocks,
einsum contractions, one scatter-add), so the traced jnp twin
(plane_static_response below) reuses the same closed forms verbatim —
batched (m, 8, 8) blocks are exactly the shape XLA tiles onto the MXU
when the identification families trace through it.

Verification anchors (tests/test_plane.py) are textbook closed forms:
the constant-stress patch test on distorted meshes (CST and Q4, exact
to machine precision), uniaxial plane stress u_x = qx/E with lateral
contraction −νqy/E, plane-strain uniaxial ε_xx = q(1−ν²)/E, the
end-loaded cantilever vs the 2D elasticity (Timoshenko) closed form
under mesh refinement, axial rod frequencies f_k = (2k−1)c/(4L) with
consistent-mass convergence from above, and Newmark-vs-modal
cross-validation of the step response.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

# 2×2 Gauss points / weights on [-1, 1]²; corner order is CCW
# (-1,-1), (1,-1), (1,1), (-1,1) — node ordering must match.
_GP = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]
               ) / np.sqrt(3.0)
_CORNERS = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0],
                     [-1.0, 1.0]])


@dataclass
class PlaneProblem:
    """2D membrane: nodes (n, 2); elements (m, 3) CST triangles or
    (m, 4) Q4 quadrilaterals (counterclockwise); per-element material
    (scalars broadcast); nodal loads (2n,) as [Fx, Fy]*n; fixed DOFs
    on the 2-DOF numbering u_i = 2i, v_i = 2i+1.  Optional: prescribed
    nonzero values at fixed DOFs (settlement / patch-test driving),
    a global body-force density [bx, by] (force/volume, e.g. ρg),
    per-node point masses."""
    nodes: np.ndarray
    elements: np.ndarray
    young: np.ndarray            # (m,) or scalar
    poisson: np.ndarray
    thickness: np.ndarray
    density: np.ndarray
    loads: np.ndarray            # (2n,)
    fixed_dofs: np.ndarray
    plane_strain: bool = False
    prescribed: Optional[np.ndarray] = None     # (len(fixed_dofs),)
    body_force: Optional[np.ndarray] = None     # (2,)
    point_masses: Optional[np.ndarray] = None   # (n,)
    alpha_cte: Optional[np.ndarray] = None      # (m,) or scalar CTE
    temperature: Optional[np.ndarray] = None    # (m,) or scalar ΔT

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=float)
        if self.nodes.ndim != 2 or self.nodes.shape[1] != 2:
            raise ValueError("plane nodes must be (n, 2)")
        self.elements = np.asarray(self.elements, dtype=int)
        if self.elements.ndim != 2 or self.elements.shape[1] not in (3, 4):
            raise ValueError("plane elements must be (m, 3) triangles "
                             "or (m, 4) quadrilaterals")
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
        nu_max = 0.5 if self.plane_strain else 1.0
        if np.any(self.poisson < 0) or np.any(self.poisson >= nu_max):
            raise ValueError(f"poisson must lie in [0, {nu_max})")
        self.loads = np.asarray(self.loads, dtype=float).reshape(-1)
        if self.loads.size != 2 * n:
            raise ValueError(f"loads must have 2*nnode = {2 * n} "
                             f"entries, got {self.loads.size}")
        self.fixed_dofs = np.asarray(self.fixed_dofs,
                                     dtype=int).reshape(-1)
        if self.fixed_dofs.size and (self.fixed_dofs.min() < 0
                                     or self.fixed_dofs.max() >= 2 * n):
            raise ValueError("fixed_dofs out of range")
        if self.prescribed is not None:
            self.prescribed = np.asarray(self.prescribed,
                                         dtype=float).reshape(-1)
            if self.prescribed.size != self.fixed_dofs.size:
                raise ValueError("prescribed must pair one value per "
                                 "fixed DOF")
        if self.body_force is not None:
            self.body_force = np.asarray(self.body_force,
                                         dtype=float).reshape(2)
        if self.point_masses is not None:
            self.point_masses = np.broadcast_to(
                np.asarray(self.point_masses, dtype=float), (n,)).copy()
        if self.temperature is not None and self.alpha_cte is None:
            raise ValueError('a "temperature" load case needs the '
                             'thermal expansion coefficient (material '
                             '"alpha")')
        for name in ("alpha_cte", "temperature"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, np.broadcast_to(
                    np.asarray(v, dtype=float), (m,)).copy())
        # Orientation/degeneracy is a hard input error: detJ ≤ 0
        # silently flips stiffness signs otherwise.
        if self.nen == 3:
            if np.any(_tri_area(self.coords()) <= 0.0):
                raise ValueError("triangles must be counterclockwise "
                                 "with positive area")
        else:
            if np.any(_q4_detj(self.coords()) <= 0.0):
                raise ValueError("quadrilaterals must be "
                                 "counterclockwise and convex enough "
                                 "for positive Jacobians at all Gauss "
                                 "points")

    @property
    def nnode(self) -> int:
        return self.nodes.shape[0]

    @property
    def nelm(self) -> int:
        return self.elements.shape[0]

    @property
    def nen(self) -> int:
        return self.elements.shape[1]

    @property
    def ndof(self) -> int:
        return 2 * self.nnode

    def coords(self) -> np.ndarray:
        """(m, nen, 2) element corner coordinates."""
        return self.nodes[self.elements]

    def dof_map(self) -> np.ndarray:
        """(m, 2*nen) global DOFs, [u1 v1 u2 v2 ...] per element."""
        e = self.elements
        dm = np.empty((self.nelm, 2 * self.nen), dtype=int)
        dm[:, 0::2] = 2 * e
        dm[:, 1::2] = 2 * e + 1
        return dm

    def free_mask(self) -> np.ndarray:
        mask = np.ones(self.ndof)
        mask[self.fixed_dofs] = 0.0
        return mask


# --------------------------------------------------------------------
# Element closed forms (batched over elements; numpy = jnp compatible
# primitives only so the traced twin reuses them)


def _dmat(young, poisson, plane_strain: bool, xp=np):
    """(m, 3, 3) constitutive matrices, Voigt [xx, yy, xy]."""
    e, nu = young, poisson
    z = xp.zeros_like(e)
    if plane_strain:
        c = e / ((1.0 + nu) * (1.0 - 2.0 * nu))
        rows = [[c * (1.0 - nu), c * nu, z],
                [c * nu, c * (1.0 - nu), z],
                [z, z, c * (1.0 - 2.0 * nu) / 2.0]]
    else:
        c = e / (1.0 - nu * nu)
        rows = [[c, c * nu, z],
                [c * nu, c, z],
                [z, z, c * (1.0 - nu) / 2.0]]
    return xp.stack([xp.stack(r, axis=-1) for r in rows], axis=-2)


def _einsum(xp, spec, *ops):
    """Contraction with full-f32 accumulation under jnp.

    TPU dot_general defaults to bf16 inputs on the MXU; with ~1e-2
    relative rounding the (a, b)/(b, a) stiffness contributions round
    differently, K loses symmetry, and banded PCG breaks down (first
    real-TPU run of the banded plane tier returned rel=nan while CPU
    f32 converged in 2695 iterations).  The contraction dims here are
    tiny (≤ 8), so precision="highest" costs nothing."""
    if xp is np:
        return np.einsum(spec, *ops)
    return xp.einsum(spec, *ops, precision="highest")


def _tri_area(coords, xp=np):
    """(m,) signed triangle areas (positive = counterclockwise)."""
    d1 = coords[:, 1] - coords[:, 0]
    d2 = coords[:, 2] - coords[:, 0]
    return 0.5 * (d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])


def _cst_b(coords, xp=np):
    """CST strain-displacement matrices: (m, 3, 6) B with constant
    entries b_i = (y_j − y_k)/2A, c_i = (x_k − x_j)/2A, plus (m,)
    areas."""
    x, y = coords[..., 0], coords[..., 1]
    area = _tri_area(coords, xp)
    j, k = [1, 2, 0], [2, 0, 1]
    b = (y[:, j] - y[:, k]) / (2.0 * area)[:, None]   # (m, 3) dN/dx
    c = (x[:, k] - x[:, j]) / (2.0 * area)[:, None]   # (m, 3) dN/dy
    z = xp.zeros_like(b)
    row1 = xp.stack([b[:, 0], z[:, 0], b[:, 1], z[:, 0],
                     b[:, 2], z[:, 0]], axis=-1)
    row2 = xp.stack([z[:, 0], c[:, 0], z[:, 0], c[:, 1],
                     z[:, 0], c[:, 2]], axis=-1)
    row3 = xp.stack([c[:, 0], b[:, 0], c[:, 1], b[:, 1],
                     c[:, 2], b[:, 2]], axis=-1)
    return xp.stack([row1, row2, row3], axis=-2), area


def _q4_dn(xi, eta):
    """(2, 4) bilinear shape derivatives in natural coords."""
    xa, ea = _CORNERS[:, 0], _CORNERS[:, 1]
    return np.stack([0.25 * xa * (1.0 + ea * eta),
                     0.25 * ea * (1.0 + xa * xi)])


def _q4_point(coords, xi, eta, xp=np):
    """B (m, 3, 8) and detJ (m,) at one natural point."""
    dn = _q4_dn(xi, eta)                        # (2, 4) constant
    jac = _einsum(xp, "an,mnc->mac", xp.asarray(dn), coords)  # (m, 2, 2)
    det = jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0]
    inv = xp.stack([
        xp.stack([jac[:, 1, 1], -jac[:, 0, 1]], axis=-1),
        xp.stack([-jac[:, 1, 0], jac[:, 0, 0]], axis=-1)],
        axis=-2) / det[:, None, None]
    dxy = _einsum(xp, "mab,bn->man", inv, xp.asarray(dn))  # (m, 2, 4)
    dx, dy = dxy[:, 0], dxy[:, 1]               # (m, 4) each
    z = xp.zeros_like(dx)
    row1 = xp.stack([dx[:, 0], z[:, 0], dx[:, 1], z[:, 0],
                     dx[:, 2], z[:, 0], dx[:, 3], z[:, 0]], axis=-1)
    row2 = xp.stack([z[:, 0], dy[:, 0], z[:, 0], dy[:, 1],
                     z[:, 0], dy[:, 2], z[:, 0], dy[:, 3]], axis=-1)
    row3 = xp.stack([dy[:, 0], dx[:, 0], dy[:, 1], dx[:, 1],
                     dy[:, 2], dx[:, 2], dy[:, 3], dx[:, 3]], axis=-1)
    return xp.stack([row1, row2, row3], axis=-2), det


def _q4_detj(coords):
    """(m, 4) Jacobian determinants at the Gauss points (validation)."""
    return np.stack([_q4_point(coords, xi, eta)[1]
                     for xi, eta in _GP], axis=-1)


def _k_blocks(coords, dmat, thickness, nen: int, xp=np):
    """(m, 2nen, 2nen) stiffness blocks (CST closed form or Q4 2×2
    Gauss) — shared by the host assembly and the traced twin."""
    if nen == 3:
        b, area = _cst_b(coords, xp)
        scale = (thickness * area)[:, None, None]
        return scale * _einsum(xp, "mia,mij,mjb->mab", b, dmat, b)
    k = None
    for xi, eta in _GP:                 # weights are 1.0 for 2×2
        b, det = _q4_point(coords, xi, eta, xp)
        kg = (thickness * det)[:, None, None] \
            * _einsum(xp, "mia,mij,mjb->mab", b, dmat, b)
        k = kg if k is None else k + kg
    return k


def _m_blocks(coords, density, thickness, nen: int):
    """(m, 2nen, 2nen) CONSISTENT mass blocks."""
    if nen == 3:
        area = _tri_area(coords)
        scal = density * thickness * area / 12.0
        base = np.array([[2.0, 1.0, 1.0],
                         [1.0, 2.0, 1.0],
                         [1.0, 1.0, 2.0]])
        m = np.zeros((coords.shape[0], 6, 6))
        m[:, 0::2, 0::2] = scal[:, None, None] * base
        m[:, 1::2, 1::2] = scal[:, None, None] * base
        return m
    m = np.zeros((coords.shape[0], 8, 8))
    for xi, eta in _GP:
        xa, ea = _CORNERS[:, 0], _CORNERS[:, 1]
        n = 0.25 * (1.0 + xa * xi) * (1.0 + ea * eta)   # (4,)
        _, det = _q4_point(coords, xi, eta)
        scal = density * thickness * det
        nn = np.outer(n, n)
        m[:, 0::2, 0::2] += scal[:, None, None] * nn
        m[:, 1::2, 1::2] += scal[:, None, None] * nn
    return m


def _body_force_vectors(problem: PlaneProblem) -> np.ndarray:
    """(2n,) consistent nodal loads of a uniform body-force density
    [bx, by]: ∫ N b t dΩ — CST gets t·A·b/3 per node (exact), Q4 the
    2×2 Gauss sum (exact for bilinear geometry)."""
    f = np.zeros(problem.ndof)
    if problem.body_force is None:
        return f
    bx, by = problem.body_force
    coords = problem.coords()
    dm = problem.dof_map()
    if problem.nen == 3:
        share = problem.thickness * _tri_area(coords) / 3.0   # (m,)
        fe = np.zeros((problem.nelm, 6))
        fe[:, 0::2] = share[:, None] * bx
        fe[:, 1::2] = share[:, None] * by
    else:
        fe = np.zeros((problem.nelm, 8))
        xa, ea = _CORNERS[:, 0], _CORNERS[:, 1]
        for xi, eta in _GP:
            n = 0.25 * (1.0 + xa * xi) * (1.0 + ea * eta)
            _, det = _q4_point(coords, xi, eta)
            w = problem.thickness * det
            fe[:, 0::2] += w[:, None] * n[None, :] * bx
            fe[:, 1::2] += w[:, None] * n[None, :] * by
    np.add.at(f, dm, fe)
    return f


def _thermal_strain(problem: PlaneProblem):
    """(m, 3) Voigt thermal strain of the ΔT load case, or None.

    Plane stress: ε_th = αΔT [1, 1, 0].  Plane strain carries the
    standard (1 + ν) factor: suppressing ε_zz = αΔT puts ν's worth of
    extra in-plane stress on the section, and folding it into an
    effective in-plane thermal strain keeps σ = D(ε − ε_th*) exact
    with the 3×3 plane-strain D (σ_zz is recovered separately in
    recover_stresses).  Thermoelasticity is a STATIC load case here:
    the dynamic solvers refuse a temperature field loudly rather than
    oscillate it with the forcing amplitude."""
    if problem.temperature is None:
        return None
    a = problem.alpha_cte * problem.temperature            # (m,)
    if problem.plane_strain:
        a = (1.0 + problem.poisson) * a
    z = np.zeros_like(a)
    return np.stack([a, a, z], axis=-1)


def _thermal_load_vectors(problem: PlaneProblem) -> np.ndarray:
    """(2n,) consistent thermal nodal loads f_th = ∫ Bᵀ D ε_th t dΩ
    (CST closed form; Q4 2×2 Gauss with the element-constant ε_th)."""
    f = np.zeros(problem.ndof)
    eps_th = _thermal_strain(problem)
    if eps_th is None:
        return f
    coords = problem.coords()
    dmat = _dmat(problem.young, problem.poisson, problem.plane_strain)
    s_th = np.einsum("mij,mj->mi", dmat, eps_th)           # (m, 3)
    if problem.nen == 3:
        b, area = _cst_b(coords)
        fe = (problem.thickness * area)[:, None] \
            * np.einsum("mia,mi->ma", b, s_th)
    else:
        fe = np.zeros((problem.nelm, 8))
        for xi, eta in _GP:
            b, det = _q4_point(coords, xi, eta)
            fe += (problem.thickness * det)[:, None] \
                * np.einsum("mia,mi->ma", b, s_th)
    np.add.at(f, problem.dof_map(), fe)
    return f


def _require_no_thermal(problem: PlaneProblem, kind: str):
    """Dynamic paths refuse a ΔT field: the forcing here is
    amplitude-scaled in time, and a thermal load is a constant static
    case — oscillating it would be silently wrong physics.  Run a
    static (or prestressed modal/buckling) analysis instead."""
    if problem.temperature is not None:
        raise ValueError(
            f"plane {kind} does not take a temperature load case — "
            "thermoelastic loads are static; use analysis type "
            '"static" (or "modal"/"buckling" with prestress, which '
            "inherit ΔT through the static state)")


def _assemble(problem: PlaneProblem, blocks: np.ndarray) -> np.ndarray:
    """(m, 2nen, 2nen) blocks -> dense (ndof, ndof)."""
    dm = problem.dof_map()
    k = np.zeros((problem.ndof, problem.ndof))
    np.add.at(k, (dm[:, :, None], dm[:, None, :]), blocks)
    return k


def plane_matrices(problem: PlaneProblem, with_mass: bool = True):
    """(K, M) dense global matrices (M None unless with_mass) — the
    one assembly every plane solver shares (host float64)."""
    coords = problem.coords()
    dmat = _dmat(problem.young, problem.poisson, problem.plane_strain)
    k = _assemble(problem, _k_blocks(coords, dmat, problem.thickness,
                                     problem.nen))
    mmat = None
    if with_mass:
        mmat = _assemble(problem, _m_blocks(coords, problem.density,
                                            problem.thickness,
                                            problem.nen))
        if problem.point_masses is not None:
            pm = np.zeros(problem.ndof)
            pm[0::2] += problem.point_masses
            pm[1::2] += problem.point_masses
            mmat = mmat + np.diag(pm)
    return k, mmat


def _centroid_b(problem: PlaneProblem):
    """(m, 3, 2nen) strain-displacement at element centroids (CST: the
    constant B; Q4: ξ = η = 0, the superconvergent stress point)."""
    coords = problem.coords()
    if problem.nen == 3:
        return _cst_b(coords)[0]
    return _q4_point(coords, 0.0, 0.0)[0]


def recover_stresses(problem: PlaneProblem, u: np.ndarray,
                     thermal: bool = False):
    """Centroid stresses from a displacement field: (m, 3) Voigt
    [σxx, σyy, σxy], von Mises (m,), principal (m, 2) [σ1 ≥ σ2].
    Plane strain includes σzz = ν(σxx + σyy) in the von Mises.

    thermal=True subtracts the ΔT load case's thermal strain,
    σ = D(ε − ε_th) — only for displacement fields SOLVED with the
    thermal load (the static tiers); mode shapes / FRF states keep
    the default (continuum_spectrum.py calls this on mode shapes)."""
    b = _centroid_b(problem)
    dmat = _dmat(problem.young, problem.poisson, problem.plane_strain)
    u_e = u[problem.dof_map()]
    eps = np.einsum("mia,ma->mi", b, u_e)
    eps_mech = eps
    eps_th = _thermal_strain(problem) if thermal else None
    if eps_th is not None:
        eps_mech = eps - eps_th
    sig = np.einsum("mij,mj->mi", dmat, eps_mech)
    sxx, syy, sxy = sig[:, 0], sig[:, 1], sig[:, 2]
    if problem.plane_strain:
        szz = problem.poisson * (sxx + syy)
        if eps_th is not None:
            # ε_zz ≡ 0 with ΔT ≠ 0 adds the out-of-plane thermal
            # suppression stress −EαΔT (σ_zz = ν(σxx+σyy) − EαΔT).
            szz = szz - problem.young * problem.alpha_cte \
                * problem.temperature
        vm = np.sqrt(0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2
                            + (szz - sxx) ** 2) + 3.0 * sxy ** 2)
    else:
        vm = np.sqrt(sxx ** 2 - sxx * syy + syy ** 2 + 3.0 * sxy ** 2)
    mean = 0.5 * (sxx + syy)
    rad = np.sqrt((0.5 * (sxx - syy)) ** 2 + sxy ** 2)
    principal = np.stack([mean + rad, mean - rad], axis=-1)
    return sig, vm, principal


@dataclass
class PlaneStaticResult:
    displacements: np.ndarray    # (2n,)
    stresses: np.ndarray         # (m, 3) centroid Voigt [xx, yy, xy]
    von_mises: np.ndarray        # (m,)
    principal: np.ndarray        # (m, 2) [σ1, σ2]
    strains: np.ndarray          # (m, 3) centroid Voigt
    reactions: np.ndarray        # (2n,) K u − f on fixed DOFs


def solve_plane_static(problem: PlaneProblem) -> PlaneStaticResult:
    """Dense masked static solve + centroid stress recovery.

    Prescribed nonzero fixed-DOF values enter as the standard
    inhomogeneous-Dirichlet lift: solve the masked system for
    f − K u_p on the free block, then add u_p back."""
    k, _ = plane_matrices(problem, with_mass=False)
    mask = problem.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    f = problem.loads + _body_force_vectors(problem) \
        + _thermal_load_vectors(problem)
    u_p = np.zeros(problem.ndof)
    if problem.prescribed is not None:
        u_p[problem.fixed_dofs] = problem.prescribed
        rhs = (f - k @ u_p) * mask
    else:
        rhs = f * mask
    u = np.linalg.solve(km, rhs) * mask + u_p
    sig, vm, principal = recover_stresses(problem, u, thermal=True)
    b = _centroid_b(problem)
    eps = np.einsum("mia,ma->mi", b, u[problem.dof_map()])
    reactions = (k @ u - f) * (1.0 - mask)
    return PlaneStaticResult(displacements=u, stresses=sig,
                             von_mises=vm, principal=principal,
                             strains=eps, reactions=reactions)


@dataclass
class PlaneModalResult:
    frequencies_hz: np.ndarray
    omegas: np.ndarray
    eigenvalues: np.ndarray
    mode_shapes: np.ndarray      # (n_modes, 2n)


def plane_modal(problem: PlaneProblem,
                n_modes: int = 6,
                prestress_u=None) -> PlaneModalResult:
    """Generalized K φ = λ M φ on the free block (consistent mass) —
    dense host-tier eigensolve, the frame/truss analysis pattern.

    prestress_u: optional displacement state u0 — the Gauss-point
    Cauchy stress of u0 adds the geometric stiffness K_g(σ(u0))
    (plane_geometric_stiffness), so tension stiffens and compression
    softens; at the buckling load factor the fundamental λ reaches
    zero (ω²(s) ≈ ω²(0)(1 − s/λ_cr), the vibration-buckling link
    pinned in tests/test_continuum_prestress.py)."""
    import scipy.linalg

    k, m = plane_matrices(problem)
    if prestress_u is not None:
        k = k + plane_geometric_stiffness(
            problem, np.asarray(prestress_u, dtype=float))
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    n_modes = min(n_modes, lam.size)
    lam = np.maximum(lam[:n_modes], 0.0)
    shapes = np.zeros((n_modes, problem.ndof))
    shapes[:, free] = vec[:, :n_modes].T
    om = np.sqrt(lam)
    return PlaneModalResult(frequencies_hz=om / (2.0 * np.pi),
                            omegas=om, eigenvalues=lam,
                            mode_shapes=shapes)


def plane_stable_dt(problem: PlaneProblem, safety: float = 0.9,
                    damping=(0.0, 0.0)) -> float:
    """Gershgorin bound on the explicit critical step for the plane
    mesh: omega_max^2 <= max_i sum_j |K_ij| / m_i over FREE rows with
    row-sum lumped mass (solid_stable_dt's estimator with 2-DOF
    nodes; support rows would be up to sqrt(2) conservative — the
    truss lesson).  Rayleigh damping SHRINKS the limit:
    dt = (2/w)(sqrt(1+zeta^2) - zeta), zeta = alpha/2w + beta w/2."""
    k, m = plane_matrices(problem)
    md = np.asarray(m).sum(axis=1)
    row = np.abs(k).sum(axis=1) / np.maximum(md, 1e-300)
    free = problem.free_mask() > 0
    w2 = float(row[free].max()) if free.any() and row[free].max() > 0 \
        else float(row.max())
    w = np.sqrt(max(w2, 1e-30))
    alpha, beta = float(damping[0]), float(damping[1])
    zeta = 0.5 * alpha / w + 0.5 * beta * w
    return safety * (2.0 / w) * (np.sqrt(1.0 + zeta * zeta) - zeta)


def plane_geometric_stiffness(problem: PlaneProblem,
                              u: np.ndarray) -> np.ndarray:
    """Dense geometric (initial-stress) stiffness K_g(σ(u)): the
    continuum form  ∫ t ∇N_a · σ · ∇N_b dA  on each displacement
    component (the 2×2 in-plane Cauchy stress at the element Gauss
    points; σ_zz of plane strain does no in-plane work).  The
    continuum counterpart of the frame's P-Δ K_g
    (models/frame.py:_kg_local) — exact for the linearized
    (von Kármán) buckling pencil, cross-checked against the Euler
    column closed form in tests/test_plane.py."""
    from ..ops.plane_plastic import gp_geometry

    b, wdet = gp_geometry(problem)       # (m, ngp, 3, 2nen), (m, ngp)
    dmat = _dmat(problem.young, problem.poisson, problem.plane_strain)
    u_e = u[problem.dof_map()]
    eps = np.einsum("mgia,ma->mgi", b, u_e)
    sig = np.einsum("mij,mgj->mgi", dmat, eps)     # [xx, yy, xy]
    # Shape gradients sit inside B: row 0 holds dN/dx at even columns,
    # row 1 dN/dy at odd columns (the _q4_point/_cst_b layout).
    g = np.stack([b[:, :, 0, 0::2], b[:, :, 1, 1::2]],
                 axis=2)                            # (m, ngp, 2, nen)
    sigm = np.empty(sig.shape[:2] + (2, 2))
    sigm[..., 0, 0] = sig[..., 0]
    sigm[..., 1, 1] = sig[..., 1]
    sigm[..., 0, 1] = sigm[..., 1, 0] = sig[..., 2]
    w = wdet * problem.thickness[:, None]
    s_ab = np.einsum("mgia,mgij,mgjb,mg->mab", g, sigm, g, w)
    nen = problem.nen
    kg = np.zeros((problem.nelm, 2 * nen, 2 * nen))
    kg[:, 0::2, 0::2] = s_ab
    kg[:, 1::2, 1::2] = s_ab
    return _assemble(problem, kg)


@dataclass
class PlaneBucklingResult:
    load_factors: np.ndarray     # (n_modes,) ascending positive λ
    modes: np.ndarray            # (n_modes, 2n)
    von_mises: np.ndarray        # (m,) base-state centroid vM


def plane_buckling(problem: PlaneProblem,
                   n_modes: int = 4) -> PlaneBucklingResult:
    """Linearized continuum buckling: statics gives the base stress
    state σ, K_g(σ) is assembled, and (K + λ K_g) φ = 0 on the free
    block — λ_cr scales the APPLIED LOAD PATTERN.  Solved as the
    SYMMETRIC pencil −K_g φ = μ K φ (K is SPD on the free block), so
    λ = 1/μ for the largest positive μ — no complex general
    eigensolve.  A slender compressed strip hits the Euler load
    π²EI/(KL)² with mesh refinement (tests/test_plane.py)."""
    import scipy.linalg

    stat = solve_plane_static(problem)
    kg = plane_geometric_stiffness(problem, stat.displacements)
    k, _ = plane_matrices(problem, with_mass=False)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf = k[np.ix_(free, free)]
    gf = kg[np.ix_(free, free)]
    mu, vec = scipy.linalg.eigh(-gf, kf)
    pos = np.flatnonzero(mu > 1e-12 * np.abs(mu).max())
    order = pos[np.argsort(mu[pos])[::-1]][:n_modes]  # largest μ first
    lam = 1.0 / mu[order]
    modes = np.zeros((order.size, problem.ndof))
    modes[:, free] = vec[:, order].T
    return PlaneBucklingResult(load_factors=lam, modes=modes,
                               von_mises=stat.von_mises)


@dataclass
class PlaneTransientResult:
    times: np.ndarray
    displacements: np.ndarray    # (n_rec, n_probe)
    velocities: np.ndarray       # (n_rec, n_probe)
    dt: float
    n_steps: int


def solve_plane_transient(problem: PlaneProblem, dt: float,
                          n_steps: int, damping=(0.0, 0.0),
                          amplitude=None, probe_dofs=None,
                          record_every: int = 1
                          ) -> PlaneTransientResult:
    """Newmark (average acceleration) on the dense plane K/M — one LU
    factorization serves every step; the frame family's integrator
    with 2-DOF nodes.  amplitude: (n_steps,) load-scale history
    multiplying nodal + body-force loads (None = unit step); Rayleigh
    C = αM + βK.  Cross-validated against exact modal superposition
    of the undamped step response (tests/test_plane.py)."""
    import scipy.linalg

    if dt <= 0.0 or n_steps <= 0:
        raise ValueError("transient needs positive dt and n_steps")
    if problem.prescribed is not None and np.any(problem.prescribed):
        raise ValueError("transient supports homogeneous supports only")
    _require_no_thermal(problem, "transient")
    k, m = plane_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _body_force_vectors(problem)
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
    keff = kf + a0 * mf + a1 * cf
    lu = scipy.linalg.lu_factor(keff)

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
        # State advances to t = (step+1)·dt; the forcing is
        # a((step+1)·dt) — the frame/truss Newmark convention
        # (solvers/dynamics.py); the final step holds the last value.
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
    return PlaneTransientResult(
        times=np.asarray(rec_t), displacements=np.asarray(rec_u),
        velocities=np.asarray(rec_v), dt=float(dt), n_steps=int(n_steps))


# --------------------------------------------------------------------
# Structured-mesh generator: the convergence studies and the corpus
# problems all need rectangular grids; one canonical builder keeps
# node ordering (and therefore DOF numbering) consistent everywhere.


def rect_mesh(width: float, height: float, nx: int, ny: int,
              element: str = "quad"):
    """Structured (nx × ny)-element rectangle on [0, W] × [0, H].

    Returns (nodes (n, 2), elements (m, 3|4)).  Node (i, j) sits at
    index j*(nx+1)+i (x fastest), so the left edge is i = 0 — the
    cantilever anchors clamp it.  "quad" gives CCW Q4s; "tri" splits
    each cell along its SW-NE diagonal into two CCW CSTs."""
    if nx < 1 or ny < 1:
        raise ValueError("rect_mesh needs nx, ny >= 1")
    xs = np.linspace(0.0, float(width), nx + 1)
    ys = np.linspace(0.0, float(height), ny + 1)
    gx, gy = np.meshgrid(xs, ys)                # (ny+1, nx+1)
    nodes = np.stack([gx.ravel(), gy.ravel()], axis=-1)

    def nid(i, j):
        return j * (nx + 1) + i

    elems = []
    for j in range(ny):
        for i in range(nx):
            n00, n10 = nid(i, j), nid(i + 1, j)
            n11, n01 = nid(i + 1, j + 1), nid(i, j + 1)
            if element == "quad":
                elems.append([n00, n10, n11, n01])
            elif element == "tri":
                elems.append([n00, n10, n11])
                elems.append([n00, n11, n01])
            else:
                raise ValueError('element must be "quad" or "tri"')
    return nodes, np.asarray(elems, dtype=int)


def annulus_mesh(r_inner: float, r_outer: float, nr: int, nt: int,
                 sweep: float = 0.5 * np.pi):
    """Structured quarter-annulus (or `sweep`-radian sector) Q4 mesh.

    The thick-wall-cylinder verification family (Lame elastic field,
    von Mises limit pressure) lives on this geometry; one canonical
    builder keeps node ordering consistent between the tests, the
    corpus problems and the JSON tier (the rect_mesh doctrine).

    Node (i, j) = (radial, angular) sits at index j*(nr+1)+i, so the
    inner arc is i = 0 (`np.arange(0, nnode, nr+1)`), the theta=0 edge
    is j = 0 (`np.arange(nr+1)`) and the theta=sweep edge is j = nt.
    Elements are CCW Q4s."""
    if nr < 1 or nt < 1:
        raise ValueError("annulus_mesh needs nr, nt >= 1")
    if not 0.0 < r_inner < r_outer:
        raise ValueError("annulus_mesh needs 0 < r_inner < r_outer")
    rs = np.linspace(float(r_inner), float(r_outer), nr + 1)
    ts = np.linspace(0.0, float(sweep), nt + 1)
    rg, tg = np.meshgrid(rs, ts)                  # (nt+1, nr+1)
    nodes = np.stack([(rg * np.cos(tg)).ravel(),
                      (rg * np.sin(tg)).ravel()], axis=-1)

    def nid(i, j):
        return j * (nr + 1) + i

    elems = []
    for j in range(nt):
        for i in range(nr):
            elems.append([nid(i, j), nid(i + 1, j),
                          nid(i + 1, j + 1), nid(i, j + 1)])
    return nodes, np.asarray(elems, dtype=int)


def pressure_load(nodes: np.ndarray, node_ids: np.ndarray,
                  pressure: float, thickness: float,
                  ndof: Optional[int] = None) -> np.ndarray:
    """(2n,) consistent nodal loads of a NORMAL pressure along the
    polyline through `node_ids`: each straight segment P1 -> P2
    contributes p·t·(dy, -dx)/2 to both ends — the exact integral of
    a constant pressure on a straight edge, with the normal the
    -90-degree rotation of the path direction.  Walk the path so the
    material lies on its LEFT and a positive pressure pushes INTO the
    material (an inner-bore arc walked counterclockwise gets the
    radially-outward push a contained fluid exerts)."""
    nodes = np.asarray(nodes, dtype=float)
    ids = np.asarray(node_ids, dtype=int).reshape(-1)
    f = np.zeros(2 * nodes.shape[0] if ndof is None else ndof)
    p = float(pressure) * float(thickness)
    for i, j in zip(ids[:-1], ids[1:]):
        d = nodes[j] - nodes[i]
        fx, fy = p * d[1], -p * d[0]
        f[2 * i] += 0.5 * fx
        f[2 * i + 1] += 0.5 * fy
        f[2 * j] += 0.5 * fx
        f[2 * j + 1] += 0.5 * fy
    return f


def edge_load(nodes: np.ndarray, node_ids: np.ndarray, traction,
              thickness: float, ndof: Optional[int] = None
              ) -> np.ndarray:
    """(2n,) consistent nodal loads of a uniform traction [tx, ty]
    (force/area) applied along the polyline through `node_ids` (in
    path order): each segment contributes t·L·t_vec/2 to both ends —
    exact for the linear edge shapes both CST and Q4 have."""
    nodes = np.asarray(nodes, dtype=float)
    ids = np.asarray(node_ids, dtype=int).reshape(-1)
    tx, ty = np.asarray(traction, dtype=float).reshape(2)
    f = np.zeros(2 * nodes.shape[0] if ndof is None else ndof)
    seg = np.linalg.norm(np.diff(nodes[ids], axis=0), axis=1)
    for a, (i, j) in enumerate(zip(ids[:-1], ids[1:])):
        w = 0.5 * thickness * seg[a]
        f[2 * i] += w * tx
        f[2 * i + 1] += w * ty
        f[2 * j] += w * tx
        f[2 * j + 1] += w * ty
    return f


# --------------------------------------------------------------------
# Traced twin (jnp): the differentiable plane statics the inverse
# family rides.  The HOST numpy path above is the authority; this
# mirrors it 1:1 (tests/test_plane.py pins them) by REUSING the same
# closed-form kernels through their xp parameter — there is no second
# implementation of the element math to drift.


def plane_static_response(problem: "PlaneProblem", young_e=None,
                          poisson_e=None, thickness_e=None, loads=None,
                          load_scale=None, dtype=None):
    """Traced, differentiable plane statics with per-element
    properties.

    Returns (u, stresses, von_mises): the masked dense solve
    K(E, ν, t) u = f plus centroid stress recovery — every output
    differentiable w.r.t. the traced property arrays, so one reverse
    pass is the adjoint for all elements (the truss/frame sizing and
    identification machinery's pattern).  Batched (m, 2nen, 2nen)
    block construction contracts on the MXU when jitted on TPU."""
    import jax.numpy as jnp

    dtype = dtype or jnp.asarray(1.0).dtype
    m = problem.nelm
    coords = jnp.asarray(problem.coords(), dtype)
    young = jnp.broadcast_to(jnp.asarray(
        problem.young if young_e is None else young_e, dtype), (m,))
    poisson = jnp.broadcast_to(jnp.asarray(
        problem.poisson if poisson_e is None else poisson_e, dtype),
        (m,))
    thickness = jnp.broadcast_to(jnp.asarray(
        problem.thickness if thickness_e is None else thickness_e,
        dtype), (m,))
    dmat = _dmat(young, poisson, problem.plane_strain, xp=jnp)
    blocks = _k_blocks(coords, dmat, thickness, problem.nen, xp=jnp)
    dm = jnp.asarray(problem.dof_map())
    k = jnp.zeros((problem.ndof, problem.ndof), dtype).at[
        dm[:, :, None], dm[:, None, :]].add(blocks)

    if loads is None:
        f = jnp.asarray(problem.loads + _body_force_vectors(problem),
                        dtype)
    else:
        f = jnp.asarray(loads, dtype)
    if load_scale is not None:
        f = f * jnp.asarray(load_scale, dtype)
    mask = jnp.asarray(problem.free_mask(), dtype)
    km = mask[:, None] * k * mask[None, :] + jnp.diag(1.0 - mask)
    if problem.prescribed is not None:
        u_p = np.zeros(problem.ndof)
        u_p[problem.fixed_dofs] = problem.prescribed
        u_p = jnp.asarray(u_p, dtype)
        u = jnp.linalg.solve(km, (f - k @ u_p) * mask) * mask + u_p
    else:
        u = jnp.linalg.solve(km, f * mask) * mask

    b = jnp.asarray(_centroid_b(problem), dtype)
    eps = _einsum(jnp, "mia,ma->mi", b, u[dm])
    sig = _einsum(jnp, "mij,mj->mi", dmat, eps)
    sxx, syy, sxy = sig[:, 0], sig[:, 1], sig[:, 2]
    if problem.plane_strain:
        szz = poisson * (sxx + syy)
        vm = jnp.sqrt(0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2
                             + (szz - sxx) ** 2) + 3.0 * sxy ** 2)
    else:
        vm = jnp.sqrt(sxx ** 2 - sxx * syy + syy ** 2
                      + 3.0 * sxy ** 2)
    return u, sig, vm


def identify_plane_young(problem: "PlaneProblem", measured_dofs,
                         measured_disp, n_iter: int = 800,
                         learning_rate: float = 0.05,
                         field: bool = False, seed: int = 0,
                         hidden_layers: int = 2,
                         neurons_per_layer: int = 16):
    """Recover Young's modulus from measured static displacements —
    the reference's flagship inverse (PINN material identification,
    /root/reference/FEM/python/examples/pinn_inverse_problem.py:96-230)
    carried to CONTINUUM structures.

    field=False: per-element log-E ADAM — m independent values, the
    direct parameterization (exactly identifiable when every element
    carries strain under the applied load).

    field=True: a smooth E(x, y) MLP (models/fields.py — the
    reference's SimpleNN architecture + softplus·scale positivity,
    input_dim=2) evaluated at element centroids, trained through the
    traced solve — the PINN form, regularizing by smoothness where
    per-element values would be underdetermined.

    Returns (young (m,), loss_history, mlp_field_or_None)."""
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
        u, _, _ = plane_static_response(problem, young_e=young_e)
        return u

    if field:
        from .fields import make_mlp_field

        fld0 = make_mlp_field(jax.random.PRNGKey(seed),
                              hidden_layers=hidden_layers,
                              neurons_per_layer=neurons_per_layer,
                              input_dim=2,
                              scale=float(np.mean(problem.young)))

        def loss_fn(fld):
            young_e = fld.eval_batch(centroids)
            u = u_of(young_e)
            return jnp.mean((u[meas_idx] - meas) ** 2) / meas_scale

        params0 = fld0
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
        young = np.asarray(params.eval_batch(centroids))
        return young, np.asarray(hist), params
    return np.asarray(jnp.exp(params)), np.asarray(hist), None


def identify_plane_young_banded(problem: "PlaneProblem", measured_dofs,
                                measured_disp, n_iter: int = 300,
                                learning_rate: float = 0.05,
                                tol: float = 1e-7,
                                max_iter: int = 20000,
                                zones=None, field: bool = False,
                                seed: int = 0, hidden_layers: int = 2,
                                neurons_per_layer: int = 16):
    """identify_plane_young past DENSE_DOF_LIMIT (round-4 VERDICT #5):
    the forward model is the BANDED PCG solve (ops/dia.dia_solve_diff),
    so the reverse pass is one adjoint PCG with the same SPD operator —
    memory O(band·ndof) instead of the dense path's traced
    (ndof, ndof) K.  The generic ADAM-over-banded-adjoint loop lives in
    solvers/banded_inverse.identify_young_banded (shared with the solid
    hex8 family); only the Q4/CST block builder is plane-specific here.

    Parameterizations: zones=[[elem ids..], ..] (one log-E per zone —
    damage localization), field=True (smooth E(x, y) MLP at centroids),
    default per-element log-E.

    Returns (young (m,), loss_history, mlp_field_or_None)."""
    import jax.numpy as jnp

    from ..ops.dia import dia_layout
    from ..solvers.banded_inverse import identify_young_banded

    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        layout = dia_layout(problem.dof_map(), problem.ndof)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)

    m = problem.nelm
    dtype = jnp.asarray(1.0).dtype
    coords = jnp.asarray(problem.coords(), dtype)
    poisson = jnp.broadcast_to(jnp.asarray(problem.poisson, dtype),
                               (m,))
    thickness = jnp.broadcast_to(jnp.asarray(problem.thickness, dtype),
                                 (m,))
    nen, plane_strain = problem.nen, problem.plane_strain

    def blocks_of(young_e):
        dmat = _dmat(young_e, poisson, plane_strain, xp=jnp)
        return _k_blocks(coords, dmat, thickness, nen, xp=jnp)

    return identify_young_banded(
        layout, problem._dia_entry_slot_dev, blocks_of,
        np.broadcast_to(np.asarray(problem.young, dtype=float),
                        (m,)).copy(),
        problem.coords().mean(axis=1),
        problem.loads + _body_force_vectors(problem),
        problem.free_mask(), measured_dofs, measured_disp,
        n_iter=n_iter, learning_rate=learning_rate, tol=tol,
        max_iter=max_iter, zones=zones, field=field, seed=seed,
        hidden_layers=hidden_layers,
        neurons_per_layer=neurons_per_layer, input_dim=2)


# Back-compat alias: the shared proxy moved to solvers/banded_inverse
# (models/solid.py and the banded cores import it from here).
from ..solvers.banded_inverse import DiaLayoutView as _DiaLayoutView  # noqa: E402,E501


def solve_plane_static_banded(problem: "PlaneProblem", tol: float = 1e-7,
                              max_iter: int = 20000,
                              use_pallas: bool = False,
                              precond: str = "auto", dtype=None,
                              mesh=None):
    """Large-mesh plane statics on the DEVICE tier.

    Structured 2D continuum meshes are the banded-operator sweet spot:
    a Q4 grid's stiffness has ≤ 27 distinct diagonals (9 node
    neighbours × 3 DOF offsets under interleaved numbering), so the
    whole solve rides the truss family's DIA pipeline — element blocks
    built BATCHED on device ((m, 8, 8) einsum contractions on the
    MXU), one scatter into diagonal storage (ops/dia.assemble_dia_
    blocks), then streaming-rate PCG (ops/dia.dia_cg_solve).
    use_pallas selects the fused stencil kernel for the matvec.

    precond: "auto"/"jacobi" or "mg" (banded smoothed-aggregation
    multigrid, components=2 keeps u/v aggregation nodal).  Measured
    on the 64x16 uniaxial grid (2210 DOFs, CPU backend): jacobi
    compiles in 1.4 s and solves warm in 11 ms at 278 iterations; the
    jitted MG V-cycle sends XLA's algebraic simplifier into a
    circular-rewrite loop and compiles in ~400 s for a 13-iteration,
    237 ms warm solve.  "auto" therefore picks jacobi — the same
    tradeoff solve_nr's cg_precond documents for the truss family —
    and mg stays opt-in for slender/ill-conditioned meshes where the
    Jacobi iteration count grows like cond ~ n^2 and the one-off
    compile amortizes.

    Host-tier mirror: tests/test_plane.py pins this against
    solve_plane_static 1:1 on small grids; above DENSE_DOF_LIMIT this
    is the only tractable path (the dense solve is O(n³)).

    Returns (PlaneStaticResult, iterations, relative_residual) — the
    stress recovery runs on the host from the fetched displacement
    field (ONE device_get, the corpus-benchmark lesson).

    The whole device portion — block build, diagonal scatter, PCG,
    reaction matvec — is ONE jitted program, cached at module level
    keyed by the layout/material SIGNATURE (never by closure identity
    — the recompile trap documented on solve_transient) with the big
    arrays (coords, entry_slot, loads) as traced arguments, so the
    1M-element index table never gets baked into the HLO as a
    constant and a second mesh of the same shape class reuses the
    compiled program."""
    import jax
    import jax.numpy as jnp

    from ..ops.dia import dia_layout

    if problem.prescribed is not None and np.any(problem.prescribed):
        raise ValueError("the banded path supports homogeneous "
                         "supports only (lift the prescribed field "
                         "into loads, or use the dense tier)")
    dtype = dtype or jnp.asarray(1.0).dtype
    if precond == "auto":
        precond = "jacobi"  # see docstring for the measured tradeoff
    # Layout cached on the instance: the host build is O(nelm·(2nen)²)
    # numpy work (~3 s at 65k Q4s on this box — it dominated the warm
    # call before caching) and depends only on connectivity, which
    # PlaneProblem fixes at construction.
    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        layout = dia_layout(problem.dof_map(), problem.ndof)
        problem._dia_layout_cache = layout
        # The slot table is the one big transfer (nelm·(2nen)² int32 =
        # 67 MB at 65k Q4s): push it once and keep the device handle.
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    f_np = problem.loads + _body_force_vectors(problem) \
        + _thermal_load_vectors(problem)
    if mesh is not None:
        # Multi-chip path (round-4 VERDICT #4a): the banded solve IS
        # parallel/dia_sharded.dia_cg_solve_sharded — the DOF axis
        # row-block-shards over the mesh's "tp" axis with ppermute
        # halo exchanges; only the diagonal assembly and the reaction
        # matvec stay single-program.  n-dev == 1-dev is pinned by
        # tests/test_parallel.py and __graft_entry__.dryrun_multichip.
        from ..ops.dia import dia_matvec
        from ..parallel.dia_sharded import dia_cg_solve_sharded

        diags_core = _banded_diags_core(layout, problem.nen,
                                        problem.plane_strain)
        diags = diags_core(
            jnp.asarray(problem.coords(), dtype),
            jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.poisson, dtype),
            jnp.asarray(problem.thickness, dtype),
            problem._dia_entry_slot_dev)
        f_dev = jnp.asarray(f_np, dtype)
        mask_dev = jnp.asarray(problem.free_mask(), dtype)
        x, iters, rel = dia_cg_solve_sharded(
            layout, diags, f_dev, mask_dev, mesh, tol=float(tol),
            max_iter=int(max_iter))
        reac = (dia_matvec(layout, diags, x) - f_dev) * (1.0 - mask_dev)
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    else:
        core = _banded_static_core(layout, problem.nen,
                                   problem.plane_strain, precond,
                                   use_pallas, int(max_iter))
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
    sig, vm, principal = recover_stresses(problem, u, thermal=True)
    b = _centroid_b(problem)
    eps = np.einsum("mia,ma->mi", b, u[problem.dof_map()])
    res = PlaneStaticResult(displacements=u, stresses=sig,
                            von_mises=vm, principal=principal,
                            strains=eps,
                            reactions=np.asarray(reac, dtype=float))
    return res, int(iters), float(rel)


_BANDED_CORE_CACHE: dict = {}


def _banded_static_core(layout, nen: int, plane_strain: bool,
                        precond: str, use_pallas: bool, max_iter: int):
    """Jitted banded-statics program, cached per structural signature
    (diagonal offsets + sizes + element/material class), NOT per
    problem object."""
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.bandwidth, layout.entry_slot.shape, nen,
           plane_strain, precond, use_pallas, max_iter)
    core = _BANDED_CORE_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    from ..ops.dia import dia_cg_solve, dia_matvec

    @jax.jit
    def core(coords, young, poisson, thickness, entry_slot, f, mask,
             tol):
        dmat = _dmat(young, poisson, plane_strain, xp=jnp)
        blocks = _k_blocks(coords, dmat, thickness, nen, xp=jnp)
        flat = jnp.zeros((layout.n_diags * layout.ndof,), blocks.dtype)
        diags = flat.at[entry_slot].add(blocks).reshape(
            layout.n_diags, layout.ndof)
        x, iters, rel = dia_cg_solve(layout, diags, f, mask, tol=tol,
                                     max_iter=max_iter,
                                     use_pallas=use_pallas,
                                     precond=precond, components=2)
        reac = (dia_matvec(layout, diags, x) - f) * (1.0 - mask)
        return x, reac, iters, rel

    _BANDED_CORE_CACHE[key] = core
    return core


def _banded_diags_core(layout, nen: int, plane_strain: bool):
    """Jitted diagonal-assembly program (blocks -> DIA storage) for
    the SHARDED path, cached per structural signature like the full
    core above."""
    key = ("diags", tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.entry_slot.shape, nen, plane_strain)
    core = _BANDED_CORE_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    @jax.jit
    def core(coords, young, poisson, thickness, entry_slot):
        dmat = _dmat(young, poisson, plane_strain, xp=jnp)
        blocks = _k_blocks(coords, dmat, thickness, nen, xp=jnp)
        flat = jnp.zeros((layout.n_diags * layout.ndof,), blocks.dtype)
        return flat.at[entry_slot].add(blocks).reshape(
            layout.n_diags, layout.ndof)

    _BANDED_CORE_CACHE[key] = core
    return core


@dataclass
class PlaneHarmonicResult:
    omegas: np.ndarray
    amplitude: np.ndarray          # (n_freq, n_probe) |X|
    real: np.ndarray
    imag: np.ndarray


def plane_harmonic(problem: PlaneProblem, omegas,
                   damping=(0.0, 0.0), probe_dofs=None
                   ) -> PlaneHarmonicResult:
    """Steady-state X(ω) to the plane load pattern: direct dense
    complex solves (K − ω²M + iωC) X = f per frequency, host float64;
    Rayleigh C = αM + βK.  With proportional damping this equals the
    ALL-modes superposition exactly — the same 1e-8 cross-check as the
    frame family (tests/test_plane.py)."""
    om = np.asarray(omegas, dtype=float).reshape(-1)
    if problem.prescribed is not None and np.any(problem.prescribed):
        # A driven-support FRF needs the support-motion participation
        # term; silently returning the homogeneous-support response
        # would be wrong (ADVICE r3 — match solve_plane_transient).
        raise ValueError("harmonic supports homogeneous supports only")
    _require_no_thermal(problem, "harmonic")
    k, m = plane_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _body_force_vectors(problem)
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
    return PlaneHarmonicResult(omegas=om, amplitude=np.abs(xs),
                               real=xs.real, imag=xs.imag)
