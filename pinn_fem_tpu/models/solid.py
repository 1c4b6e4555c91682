"""3D solid continuum: trilinear hex8 bricks, small strain, isotropic.

The third element family (after 1D/3D truss and the 2D plane
continuum), extending the reference far beyond its scope — the
reference (rpacheco-blazquez/PINN-FEM, FEM/python/fem/element.py) has
axial truss kernels only; this module carries full 3D elasticity
through the framework's established tier doctrine:

  * HOST tier (numpy float64, zero device programs) below
    DENSE_DOF_LIMIT: statics, modal, Newmark transient — the serving
    default (ops/host.py doctrine: no attach, no remote compile).
  * DEVICE banded tier above it: the hex8 stiffness on a structured
    box grid has ~135 distinct diagonals (27 node neighbours x 5 DOF
    offsets under interleaved [u,v,w] numbering), so large meshes ride
    the SAME DIA pipeline as truss/plane/frame (ops/dia.py): batched
    (m, 24, 24) B^T D B contractions on the MXU, one scatter into
    diagonal storage, streaming-rate PCG.
  * All element closed forms take an `xp` module parameter (numpy =
    jnp compatible primitives only) so the traced device twin REUSES
    the host kernels — one implementation, no drift (the plane
    family's pattern, models/plane.py:172).

Verification anchors (tests/test_solid.py): the 3D patch test (a
linear displacement field reproduced exactly on a distorted mesh),
uniaxial stretch closed form u = FL/EA with exact Poisson contraction,
axial-rod natural frequencies f_k = (2k-1)c/4L (consistent mass,
convergence from above), cantilever tip deflection converging to
Euler-Bernoulli under refinement, banded == dense mirror.

Voigt order [xx, yy, zz, yz, xz, xy] with engineering shear strains.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

# 2x2x2 Gauss abscissa and the hex8 corner signs (node order: bottom
# quad CCW then top quad CCW — matches box_mesh connectivity).
_G3 = 1.0 / np.sqrt(3.0)
_CORNERS3 = np.array([[-1.0, -1.0, -1.0], [1.0, -1.0, -1.0],
                      [1.0, 1.0, -1.0], [-1.0, 1.0, -1.0],
                      [-1.0, -1.0, 1.0], [1.0, -1.0, 1.0],
                      [1.0, 1.0, 1.0], [-1.0, 1.0, 1.0]])
_GP3 = [(sx * _G3, sy * _G3, sz * _G3)
        for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)]
# Local node ids of the six hex faces, outward-CCW, keyed by the
# natural axis and side they sit on (used by boundary_quads).
_FACES3 = {
    (0, -1): [0, 4, 7, 3], (0, +1): [1, 2, 6, 5],
    (1, -1): [0, 1, 5, 4], (1, +1): [3, 7, 6, 2],
    (2, -1): [0, 3, 2, 1], (2, +1): [4, 5, 6, 7],
}


@dataclass
class SolidProblem:
    """3D solid: nodes (n, 3); elements (m, 8) hex8 connectivity
    (bottom quad CCW viewed from +z, then the top quad above it);
    per-element material (scalars broadcast); nodal loads (3n,) as
    [Fx, Fy, Fz]*n; fixed DOFs on the 3-DOF numbering u_i = 3i,
    v_i = 3i+1, w_i = 3i+2.  Optional: prescribed nonzero values at
    fixed DOFs, a global body-force density [bx, by, bz], per-node
    point masses."""
    nodes: np.ndarray
    elements: np.ndarray
    young: np.ndarray            # (m,) or scalar
    poisson: np.ndarray
    density: np.ndarray
    loads: np.ndarray            # (3n,)
    fixed_dofs: np.ndarray
    prescribed: Optional[np.ndarray] = None     # (len(fixed_dofs),)
    body_force: Optional[np.ndarray] = None     # (3,)
    point_masses: Optional[np.ndarray] = None   # (n,)
    alpha_cte: Optional[np.ndarray] = None      # (m,) or scalar CTE
    temperature: Optional[np.ndarray] = None    # (m,) or scalar ΔT

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=float)
        if self.nodes.ndim != 2 or self.nodes.shape[1] != 3:
            raise ValueError("solid nodes must be (n, 3)")
        self.elements = np.asarray(self.elements, dtype=int)
        if self.elements.ndim != 2 or self.elements.shape[1] != 8:
            raise ValueError("solid elements must be (m, 8) hex8")
        n, m = self.nodes.shape[0], self.elements.shape[0]
        if self.elements.min() < 0 or self.elements.max() >= n:
            raise ValueError("element connectivity out of range")
        for name in ("young", "poisson", "density"):
            v = np.broadcast_to(
                np.asarray(getattr(self, name), dtype=float), (m,)
            ).copy()
            setattr(self, name, v)
        if np.any(self.young <= 0) or np.any(self.density <= 0):
            raise ValueError("young and density must be positive")
        if np.any(self.poisson >= 0.5) or np.any(self.poisson < 0):
            raise ValueError("poisson must be in [0, 0.5) — 3D "
                             "elasticity is singular at 0.5")
        self.loads = np.asarray(self.loads, dtype=float).reshape(-1)
        if self.loads.size != 3 * n:
            raise ValueError(f"loads must have 3n = {3 * n} entries")
        self.fixed_dofs = np.unique(
            np.asarray(self.fixed_dofs, dtype=int))
        if self.fixed_dofs.size and (self.fixed_dofs.min() < 0
                                     or self.fixed_dofs.max() >= 3 * n):
            raise ValueError("fixed_dofs out of range")
        if self.prescribed is not None:
            self.prescribed = np.asarray(self.prescribed, dtype=float)
            if self.prescribed.shape != self.fixed_dofs.shape:
                raise ValueError("prescribed must match fixed_dofs")
        if self.body_force is not None:
            self.body_force = np.asarray(self.body_force,
                                         dtype=float).reshape(3)
        if self.point_masses is not None:
            self.point_masses = np.asarray(self.point_masses,
                                           dtype=float).reshape(n)
        if self.temperature is not None and self.alpha_cte is None:
            raise ValueError('a "temperature" load case needs the '
                             'thermal expansion coefficient (material '
                             '"alpha")')
        for name in ("alpha_cte", "temperature"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, np.broadcast_to(
                    np.asarray(v, dtype=float), (m,)).copy())
        det = _hex_point(self.coords(), *_GP3[0])[1]
        if np.any(det <= 0):
            raise ValueError("hex8 elements must be positively "
                             "oriented (bottom quad CCW from +z, top "
                             "quad above)")

    @property
    def nelm(self) -> int:
        return self.elements.shape[0]

    @property
    def ndof(self) -> int:
        return 3 * self.nodes.shape[0]

    def coords(self) -> np.ndarray:
        return self.nodes[self.elements]         # (m, 8, 3)

    def dof_map(self) -> np.ndarray:
        return (3 * self.elements[:, :, None]
                + np.arange(3)).reshape(self.nelm, 24)

    def free_mask(self) -> np.ndarray:
        mask = np.ones(self.ndof)
        mask[self.fixed_dofs] = 0.0
        return mask


# --------------------------------------------------------------------
# Element closed forms (batched; numpy = jnp compatible primitives so
# the traced device twin reuses them — models/plane.py doctrine)


def _einsum(xp, spec, *ops):
    """Full-f32 accumulation under jnp: the TPU MXU's bf16 default
    breaks K symmetry and with it PCG (measured on the plane family,
    models/plane.py:_einsum)."""
    if xp is np:
        return np.einsum(spec, *ops)
    return xp.einsum(spec, *ops, precision="highest")


def _dmat3(young, poisson, xp=np):
    """(m, 6, 6) isotropic constitutive matrices, Voigt
    [xx, yy, zz, yz, xz, xy] (engineering shear: G on the diagonal)."""
    e, nu = young, poisson
    lam = e * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = e / (2.0 * (1.0 + nu))
    d = lam + 2.0 * mu
    z = xp.zeros_like(e)
    rows = [[d, lam, lam, z, z, z],
            [lam, d, lam, z, z, z],
            [lam, lam, d, z, z, z],
            [z, z, z, mu, z, z],
            [z, z, z, z, mu, z],
            [z, z, z, z, z, mu]]
    return xp.stack([xp.stack(r, axis=-1) for r in rows], axis=-2)


def _hex_dn(xi, eta, zeta):
    """(3, 8) trilinear shape derivatives in natural coordinates."""
    xa, ea, za = _CORNERS3[:, 0], _CORNERS3[:, 1], _CORNERS3[:, 2]
    return np.stack([
        0.125 * xa * (1.0 + ea * eta) * (1.0 + za * zeta),
        0.125 * ea * (1.0 + xa * xi) * (1.0 + za * zeta),
        0.125 * za * (1.0 + xa * xi) * (1.0 + ea * eta)])


def _hex_n(xi, eta, zeta):
    """(8,) trilinear shape functions."""
    xa, ea, za = _CORNERS3[:, 0], _CORNERS3[:, 1], _CORNERS3[:, 2]
    return 0.125 * (1.0 + xa * xi) * (1.0 + ea * eta) * (1.0 + za * zeta)


def _inv3(jac, xp=np):
    """Batched closed-form 3x3 inverse + determinant (adjugate/det —
    no LAPACK call, so it traces on device and stays f32-exact)."""
    a, b, c = jac[:, 0, 0], jac[:, 0, 1], jac[:, 0, 2]
    d, e, f = jac[:, 1, 0], jac[:, 1, 1], jac[:, 1, 2]
    g, h, i = jac[:, 2, 0], jac[:, 2, 1], jac[:, 2, 2]
    co00 = e * i - f * h
    co01 = f * g - d * i
    co02 = d * h - e * g
    det = a * co00 + b * co01 + c * co02
    inv = xp.stack([
        xp.stack([co00, c * h - b * i, b * f - c * e], axis=-1),
        xp.stack([co01, a * i - c * g, c * d - a * f], axis=-1),
        xp.stack([co02, b * g - a * h, a * e - b * d], axis=-1)],
        axis=-2) / det[:, None, None]
    return inv, det


def _hex_point(coords, xi, eta, zeta, xp=np):
    """B (m, 6, 24) and detJ (m,) at one natural point."""
    dn = xp.asarray(_hex_dn(xi, eta, zeta))       # (3, 8) constant
    jac = _einsum(xp, "an,mnc->mac", dn, coords)  # (m, 3, 3)
    inv, det = _inv3(jac, xp)
    dxyz = _einsum(xp, "mab,bn->man", inv, dn)    # (m, 3, 8)
    dx, dy, dz = dxyz[:, 0], dxyz[:, 1], dxyz[:, 2]
    z = xp.zeros_like(dx)
    m = dx.shape[0]

    def row(cu, cv, cw):
        return xp.stack([cu, cv, cw], axis=-1).reshape(m, 24)

    b = xp.stack([
        row(dx, z, z),            # eps_xx
        row(z, dy, z),            # eps_yy
        row(z, z, dz),            # eps_zz
        row(z, dz, dy),           # gamma_yz
        row(dz, z, dx),           # gamma_xz
        row(dy, dx, z),           # gamma_xy
    ], axis=-2)
    return b, det


def _k_blocks3(coords, dmat, xp=np):
    """(m, 24, 24) hex8 stiffness blocks, 2x2x2 Gauss (weights 1)."""
    k = None
    for xi, eta, zeta in _GP3:
        b, det = _hex_point(coords, xi, eta, zeta, xp)
        kg = det[:, None, None] * _einsum(xp, "mia,mij,mjb->mab",
                                          b, dmat, b)
        k = kg if k is None else k + kg
    return k


def _m_blocks3(coords, density):
    """(m, 24, 24) CONSISTENT mass blocks (host only)."""
    m = np.zeros((coords.shape[0], 24, 24))
    for xi, eta, zeta in _GP3:
        n = _hex_n(xi, eta, zeta)                 # (8,)
        _, det = _hex_point(coords, xi, eta, zeta)
        scal = density * det
        nn = np.outer(n, n)
        for c in range(3):
            m[:, c::3, c::3] += scal[:, None, None] * nn
    return m


def _body_force_vectors3(problem: SolidProblem) -> np.ndarray:
    """(3n,) consistent nodal loads of a uniform body-force density."""
    f = np.zeros(problem.ndof)
    if problem.body_force is None:
        return f
    coords = problem.coords()
    fe = np.zeros((problem.nelm, 24))
    for xi, eta, zeta in _GP3:
        n = _hex_n(xi, eta, zeta)
        _, det = _hex_point(coords, xi, eta, zeta)
        for c in range(3):
            fe[:, c::3] += det[:, None] * n[None, :] \
                * problem.body_force[c]
    np.add.at(f, problem.dof_map(), fe)
    return f


def _thermal_strain3(problem: SolidProblem):
    """(m, 6) Voigt thermal strain αΔT [1,1,1,0,0,0] of the ΔT load
    case, or None.  Like the plane family, thermoelasticity is a
    STATIC load case: the dynamic solvers refuse a temperature field
    loudly rather than oscillate it with the forcing amplitude."""
    if problem.temperature is None:
        return None
    a = problem.alpha_cte * problem.temperature            # (m,)
    z = np.zeros_like(a)
    return np.stack([a, a, a, z, z, z], axis=-1)


def _thermal_load_vectors3(problem: SolidProblem) -> np.ndarray:
    """(3n,) consistent thermal nodal loads f_th = ∫ Bᵀ D ε_th dV
    (2×2×2 Gauss with the element-constant ε_th)."""
    f = np.zeros(problem.ndof)
    eps_th = _thermal_strain3(problem)
    if eps_th is None:
        return f
    coords = problem.coords()
    dmat = _dmat3(problem.young, problem.poisson)
    s_th = np.einsum("mij,mj->mi", dmat, eps_th)           # (m, 6)
    fe = np.zeros((problem.nelm, 24))
    for xi, eta, zeta in _GP3:
        b, det = _hex_point(coords, xi, eta, zeta)
        fe += det[:, None] * np.einsum("mia,mi->ma", b, s_th)
    np.add.at(f, problem.dof_map(), fe)
    return f


def _require_no_thermal3(problem: SolidProblem, kind: str):
    """models/plane.py:_require_no_thermal, 3D twin."""
    if problem.temperature is not None:
        raise ValueError(
            f"solid {kind} does not take a temperature load case — "
            "thermoelastic loads are static; use analysis type "
            '"static" (or "modal"/"buckling" with prestress, which '
            "inherit ΔT through the static state)")


def _assemble3(problem: SolidProblem, blocks: np.ndarray) -> np.ndarray:
    dm = problem.dof_map()
    k = np.zeros((problem.ndof, problem.ndof))
    np.add.at(k, (dm[:, :, None], dm[:, None, :]), blocks)
    return k


def solid_matrices(problem: SolidProblem, with_mass: bool = True):
    """(K, M) dense global matrices (M None unless with_mass) — host
    float64, shared by every dense solid solver."""
    coords = problem.coords()
    dmat = _dmat3(problem.young, problem.poisson)
    k = _assemble3(problem, _k_blocks3(coords, dmat))
    mmat = None
    if with_mass:
        mmat = _assemble3(problem, _m_blocks3(coords, problem.density))
        if problem.point_masses is not None:
            pm = np.repeat(problem.point_masses, 3)
            mmat = mmat + np.diag(pm)
    return k, mmat


def _centroid_b3(problem: SolidProblem):
    """(m, 6, 24) strain-displacement at element centroids (the hex8
    superconvergent stress point xi = eta = zeta = 0)."""
    return _hex_point(problem.coords(), 0.0, 0.0, 0.0)[0]


def recover_stresses3(problem: SolidProblem, u: np.ndarray,
                      thermal: bool = False):
    """Centroid stresses: (m, 6) Voigt [xx, yy, zz, yz, xz, xy], von
    Mises (m,), principal (m, 3) [s1 >= s2 >= s3].

    thermal=True subtracts the ΔT load case's thermal strain,
    σ = D(ε − ε_th) — only for displacement fields SOLVED with the
    thermal load (the static tiers); mode shapes / FRF states keep
    the default (continuum_spectrum.py calls this on mode shapes)."""
    b = _centroid_b3(problem)
    dmat = _dmat3(problem.young, problem.poisson)
    eps = np.einsum("mia,ma->mi", b, u[problem.dof_map()])
    eps_mech = eps
    eps_th = _thermal_strain3(problem) if thermal else None
    if eps_th is not None:
        eps_mech = eps - eps_th
    sig = np.einsum("mij,mj->mi", dmat, eps_mech)
    sxx, syy, szz = sig[:, 0], sig[:, 1], sig[:, 2]
    syz, sxz, sxy = sig[:, 3], sig[:, 4], sig[:, 5]
    vm = np.sqrt(0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2
                        + (szz - sxx) ** 2)
                 + 3.0 * (sxy ** 2 + syz ** 2 + sxz ** 2))
    tens = np.empty((sig.shape[0], 3, 3))
    tens[:, 0, 0], tens[:, 1, 1], tens[:, 2, 2] = sxx, syy, szz
    tens[:, 0, 1] = tens[:, 1, 0] = sxy
    tens[:, 0, 2] = tens[:, 2, 0] = sxz
    tens[:, 1, 2] = tens[:, 2, 1] = syz
    principal = np.linalg.eigvalsh(tens)[:, ::-1]
    return sig, vm, principal, eps


@dataclass
class SolidStaticResult:
    displacements: np.ndarray    # (3n,)
    stresses: np.ndarray         # (m, 6) centroid Voigt
    von_mises: np.ndarray        # (m,)
    principal: np.ndarray        # (m, 3)
    strains: np.ndarray          # (m, 6)
    reactions: np.ndarray        # (3n,) K u − f on fixed DOFs


def solve_solid_static(problem: SolidProblem) -> SolidStaticResult:
    """Dense masked static solve + centroid stress recovery (HOST
    float64; inhomogeneous Dirichlet via the standard lift)."""
    k, _ = solid_matrices(problem, with_mass=False)
    mask = problem.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    f = problem.loads + _body_force_vectors3(problem) \
        + _thermal_load_vectors3(problem)
    u_p = np.zeros(problem.ndof)
    if problem.prescribed is not None:
        u_p[problem.fixed_dofs] = problem.prescribed
        rhs = (f - k @ u_p) * mask
    else:
        rhs = f * mask
    u = np.linalg.solve(km, rhs) * mask + u_p
    sig, vm, principal, eps = recover_stresses3(problem, u,
                                                thermal=True)
    reactions = (k @ u - f) * (1.0 - mask)
    return SolidStaticResult(displacements=u, stresses=sig,
                             von_mises=vm, principal=principal,
                             strains=eps, reactions=reactions)


def solid_static_response(problem: SolidProblem, young_e=None,
                          poisson_e=None, loads=None,
                          load_scale=None, dtype=None):
    """Traced, differentiable solid statics with per-element
    properties: (u, stresses, von_mises) from the masked dense solve
    K(E, nu) u = f + centroid recovery — every output differentiable
    w.r.t. the traced property arrays (the plane family's
    plane_static_response twin, models/plane.py:844; used by the
    continuum reliability family).  Thermal load cases are refused —
    f_th depends on E and would need a traced rebuild (the plate twin
    carries one; add it here when a consumer needs it)."""
    import jax.numpy as jnp

    if problem.temperature is not None:
        raise ValueError("solid_static_response does not take a "
                         "temperature load case (traced f_th not "
                         "implemented — run the host static instead)")
    dtype = dtype or jnp.asarray(1.0).dtype
    m = problem.nelm
    young = jnp.broadcast_to(jnp.asarray(
        problem.young if young_e is None else young_e, dtype), (m,))
    poisson = jnp.broadcast_to(jnp.asarray(
        problem.poisson if poisson_e is None else poisson_e, dtype),
        (m,))
    coords = jnp.asarray(problem.coords(), dtype)
    dmat = _dmat3(young, poisson, xp=jnp)
    blocks = _k_blocks3(coords, dmat, xp=jnp)
    dm = jnp.asarray(problem.dof_map())
    k = jnp.zeros((problem.ndof, problem.ndof), dtype).at[
        dm[:, :, None], dm[:, None, :]].add(blocks)

    if loads is None:
        f = jnp.asarray(problem.loads + _body_force_vectors3(problem),
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

    b = jnp.asarray(_centroid_b3(problem), dtype)
    eps = _einsum(jnp, "mia,ma->mi", b, u[dm])
    sig = _einsum(jnp, "mij,mj->mi", dmat, eps)
    sxx, syy, szz = sig[:, 0], sig[:, 1], sig[:, 2]
    syz, sxz, sxy = sig[:, 3], sig[:, 4], sig[:, 5]
    vm = jnp.sqrt(0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2
                         + (szz - sxx) ** 2)
                  + 3.0 * (sxy ** 2 + syz ** 2 + sxz ** 2))
    return u, sig, vm


@dataclass
class SolidModalResult:
    frequencies_hz: np.ndarray
    omegas: np.ndarray
    eigenvalues: np.ndarray
    mode_shapes: np.ndarray      # (n_modes, 3n)


def solid_modal(problem: SolidProblem,
                n_modes: int = 6,
                prestress_u=None) -> SolidModalResult:
    """Generalized K phi = lambda M phi on the free block (consistent
    mass) — dense host eigensolve, the plane/frame pattern.

    prestress_u: optional displacement state u0 adding the geometric
    stiffness K_g(sigma(u0)) (solid_geometric_stiffness) — the
    plane_modal prestress contract in 3D."""
    import scipy.linalg

    k, m = solid_matrices(problem)
    if prestress_u is not None:
        k = k + solid_geometric_stiffness(
            problem, np.asarray(prestress_u, dtype=float))
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    n_modes = min(n_modes, lam.size)
    lam = np.maximum(lam[:n_modes], 0.0)
    shapes = np.zeros((n_modes, problem.ndof))
    shapes[:, free] = vec[:, :n_modes].T
    om = np.sqrt(lam)
    return SolidModalResult(frequencies_hz=om / (2.0 * np.pi),
                            omegas=om, eigenvalues=lam,
                            mode_shapes=shapes)


@dataclass
class SolidTransientResult:
    times: np.ndarray
    displacements: np.ndarray    # (n_rec, n_probe)
    velocities: np.ndarray
    dt: float
    n_steps: int


def solve_solid_transient(problem: SolidProblem, dt: float,
                          n_steps: int, damping=(0.0, 0.0),
                          amplitude=None, probe_dofs=None,
                          record_every: int = 1
                          ) -> SolidTransientResult:
    """Newmark (average acceleration) on the dense solid K/M — one LU
    factorization serves every step (the plane family's integrator
    with 3-DOF nodes; same t = (step+1)*dt forcing convention)."""
    import scipy.linalg

    if dt <= 0.0 or n_steps <= 0:
        raise ValueError("transient needs positive dt and n_steps")
    if problem.prescribed is not None and np.any(problem.prescribed):
        raise ValueError("transient supports homogeneous supports only")
    _require_no_thermal3(problem, "transient")
    k, m = solid_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _body_force_vectors3(problem)
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
    a_acc = np.linalg.solve(mf, ff * amp[0]) if n else np.zeros(0)
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
    return SolidTransientResult(
        times=np.asarray(rec_t), displacements=np.asarray(rec_u),
        velocities=np.asarray(rec_v), dt=float(dt), n_steps=int(n_steps))


@dataclass
class SolidHarmonicResult:
    omegas: np.ndarray
    amplitude: np.ndarray          # (n_freq, n_probe) |X|
    real: np.ndarray
    imag: np.ndarray


def solid_harmonic(problem: SolidProblem, omegas,
                   damping=(0.0, 0.0), probe_dofs=None
                   ) -> SolidHarmonicResult:
    """Steady-state X(ω) to the solid load pattern: direct dense
    complex solves (K − ω²M + iωC) X = f per frequency, host float64;
    Rayleigh C = αM + βK — plane_harmonic with 3-DOF nodes (same
    ALL-modes-superposition exactness cross-check,
    tests/test_solid.py)."""
    om = np.asarray(omegas, dtype=float).reshape(-1)
    if problem.prescribed is not None and np.any(problem.prescribed):
        # Driven-support FRFs need the support-motion participation
        # term; silently returning the homogeneous-support response
        # would be wrong (the plane family's guard).
        raise ValueError("harmonic supports homogeneous supports only")
    _require_no_thermal3(problem, "harmonic")
    k, m = solid_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _body_force_vectors3(problem)
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
    return SolidHarmonicResult(omegas=om, amplitude=np.abs(xs),
                               real=xs.real, imag=xs.imag)


def solid_geometric_stiffness(problem: SolidProblem,
                              u: np.ndarray) -> np.ndarray:
    """Dense geometric (initial-stress) stiffness K_g(σ(u)): the
    continuum form  ∫ ∇N_a · σ · ∇N_b dV  on each displacement
    component, with the full 3×3 Cauchy stress at the 2×2×2 Gauss
    points — models/plane.plane_geometric_stiffness in 3D, anchored to
    the same Euler-column closed form (tests/test_solid.py)."""
    from ..ops.solid_plastic import gp_geometry3

    b, wdet = gp_geometry3(problem)      # (m, 8, 6, 24), (m, 8)
    dmat = _dmat3(problem.young, problem.poisson)
    u_e = u[problem.dof_map()]
    eps = np.einsum("mgia,ma->mgi", b, u_e)
    sig = np.einsum("mij,mgj->mgi", dmat, eps)  # [xx,yy,zz,yz,xz,xy]
    # Shape gradients sit inside B: row 0 holds dN/dx at columns 3a,
    # row 1 dN/dy at 3a+1, row 2 dN/dz at 3a+2 (_hex_point layout).
    g = np.stack([b[:, :, 0, 0::3], b[:, :, 1, 1::3],
                  b[:, :, 2, 2::3]], axis=2)      # (m, 8, 3, 8)
    sigm = np.empty(sig.shape[:2] + (3, 3))
    sigm[..., 0, 0] = sig[..., 0]
    sigm[..., 1, 1] = sig[..., 1]
    sigm[..., 2, 2] = sig[..., 2]
    sigm[..., 1, 2] = sigm[..., 2, 1] = sig[..., 3]
    sigm[..., 0, 2] = sigm[..., 2, 0] = sig[..., 4]
    sigm[..., 0, 1] = sigm[..., 1, 0] = sig[..., 5]
    s_ab = np.einsum("mgia,mgij,mgjb,mg->mab", g, sigm, g, wdet)
    kg = np.zeros((problem.nelm, 24, 24))
    kg[:, 0::3, 0::3] = s_ab
    kg[:, 1::3, 1::3] = s_ab
    kg[:, 2::3, 2::3] = s_ab
    return _assemble3(problem, kg)


@dataclass
class SolidBucklingResult:
    load_factors: np.ndarray     # (n_modes,) ascending positive λ
    modes: np.ndarray            # (n_modes, 3n)
    von_mises: np.ndarray        # (m,) base-state centroid vM


def solid_buckling(problem: SolidProblem,
                   n_modes: int = 4) -> SolidBucklingResult:
    """Linearized continuum buckling (K + λ K_g) φ = 0, solved as the
    SYMMETRIC pencil −K_g φ = μ K φ on the free block (λ = 1/μ for the
    largest positive μ) — plane_buckling with hex8 kinematics; a
    square-section Euler column yields a DOUBLE lowest eigenvalue (one
    per lateral direction)."""
    import scipy.linalg

    stat = solve_solid_static(problem)
    kg = solid_geometric_stiffness(problem, stat.displacements)
    k, _ = solid_matrices(problem, with_mass=False)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf = k[np.ix_(free, free)]
    gf = kg[np.ix_(free, free)]
    mu, vec = scipy.linalg.eigh(-gf, kf)
    pos = np.flatnonzero(mu > 1e-12 * np.abs(mu).max())
    order = pos[np.argsort(mu[pos])[::-1]][:n_modes]
    lam = 1.0 / mu[order]
    modes = np.zeros((order.size, problem.ndof))
    modes[:, free] = vec[:, order].T
    return SolidBucklingResult(load_factors=lam, modes=modes,
                               von_mises=stat.von_mises)


# --------------------------------------------------------------------
# Mesh generation + surface loading


def box_mesh(lx: float, ly: float, lz: float,
             nx: int, ny: int, nz: int):
    """Structured hex8 box: nodes ((nx+1)(ny+1)(nz+1), 3) with
    x-fastest numbering (id = ix + (nx+1)(iy + (ny+1) iz) — the
    banded-friendly order), elements (nx ny nz, 8)."""
    xs = np.linspace(0.0, lx, nx + 1)
    ys = np.linspace(0.0, ly, ny + 1)
    zs = np.linspace(0.0, lz, nz + 1)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    # x-fastest flattening: index (ix, iy, iz) -> ix + (nx+1)*(iy + ...)
    nodes = np.stack([gx, gy, gz], axis=-1).transpose(2, 1, 0, 3
                                                      ).reshape(-1, 3)

    def nid(ix, iy, iz):
        return ix + (nx + 1) * (iy + (ny + 1) * iz)

    elems = []
    for iz in range(nz):
        for iy in range(ny):
            for ix in range(nx):
                elems.append([
                    nid(ix, iy, iz), nid(ix + 1, iy, iz),
                    nid(ix + 1, iy + 1, iz), nid(ix, iy + 1, iz),
                    nid(ix, iy, iz + 1), nid(ix + 1, iy, iz + 1),
                    nid(ix + 1, iy + 1, iz + 1),
                    nid(ix, iy + 1, iz + 1)])
    return nodes, np.asarray(elems, dtype=int)


def boundary_quads(problem: SolidProblem, axis: int, side: int,
                   tol: float = 1e-9) -> np.ndarray:
    """(q, 4) node-id quads of the element faces lying on the domain
    boundary plane axis = min/max (side = -1/+1): every node of the
    face template must sit on the plane.  Works for any hex mesh whose
    boundary is axis-aligned on that side (the box_mesh case)."""
    coord = problem.nodes[:, axis]
    target = coord.min() if side < 0 else coord.max()
    span = max(float(coord.max() - coord.min()), 1.0)
    on_plane = np.abs(coord - target) <= tol * span
    local = _FACES3[(axis, -1 if side < 0 else +1)]
    face_nodes = problem.elements[:, local]      # (m, 4)
    sel = np.all(on_plane[face_nodes], axis=1)
    return face_nodes[sel]


def surface_load(nodes: np.ndarray, quads: np.ndarray, traction,
                 ndof: Optional[int] = None) -> np.ndarray:
    """(3n,) consistent nodal loads of a uniform traction [tx, ty, tz]
    (force/area) over bilinear quad facets: 2x2 Gauss on each face
    with |dA| = |x_xi x x_eta| (exact for planar faces)."""
    quads = np.asarray(quads, dtype=int)
    t = np.asarray(traction, dtype=float).reshape(3)
    f = np.zeros(3 * nodes.shape[0] if ndof is None else ndof)
    xq = nodes[quads]                            # (q, 4, 3)
    xa, ea = _CORNERS3[:4, 0], _CORNERS3[:4, 1]  # quad corner signs
    g = 1.0 / np.sqrt(3.0)
    for xi, eta in [(-g, -g), (g, -g), (g, g), (-g, g)]:
        n = 0.25 * (1.0 + xa * xi) * (1.0 + ea * eta)        # (4,)
        dnx = 0.25 * xa * (1.0 + ea * eta)
        dne = 0.25 * ea * (1.0 + xa * xi)
        tx = np.einsum("n,qnc->qc", dnx, xq)     # (q, 3) x_xi
        te = np.einsum("n,qnc->qc", dne, xq)     # (q, 3) x_eta
        da = np.linalg.norm(np.cross(tx, te), axis=1)        # (q,)
        fe = da[:, None, None] * n[None, :, None] * t[None, None, :]
        np.add.at(f, (3 * quads[:, :, None]
                      + np.arange(3)).reshape(-1),
                  fe.reshape(-1))
    return f


# --------------------------------------------------------------------
# DEVICE banded tier (large meshes): the DIA pipeline with hex8 blocks


_SOLID_CORE_CACHE: dict = {}


def _solid_banded_core(layout, max_iter: int, precond: str):
    """Jitted banded-statics program (block build -> diagonal scatter
    -> PCG -> reaction matvec), cached per structural signature — the
    plane family's cache discipline (models/plane.py:921)."""
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.bandwidth, layout.entry_slot.shape, precond, max_iter)
    core = _SOLID_CORE_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    from ..ops.dia import dia_cg_solve, dia_matvec

    @jax.jit
    def core(coords, young, poisson, entry_slot, f, mask, tol):
        dmat = _dmat3(young, poisson, xp=jnp)
        blocks = _k_blocks3(coords, dmat, xp=jnp)
        flat = jnp.zeros((layout.n_diags * layout.ndof,), blocks.dtype)
        diags = flat.at[entry_slot].add(blocks).reshape(
            layout.n_diags, layout.ndof)
        x, iters, rel = dia_cg_solve(layout, diags, f, mask, tol=tol,
                                     max_iter=max_iter,
                                     precond=precond, components=3)
        reac = (dia_matvec(layout, diags, x) - f) * (1.0 - mask)
        return x, reac, iters, rel

    _SOLID_CORE_CACHE[key] = core
    return core


def solve_solid_static_banded(problem: SolidProblem, tol: float = 1e-7,
                              max_iter: int = 50000,
                              precond: str = "jacobi", dtype=None,
                              mesh=None):
    """Large-mesh solid statics on the DEVICE tier.

    A structured hex8 grid's stiffness has ~135 distinct diagonals
    (27 node neighbours x 5 DOF offsets under interleaved numbering),
    so the whole solve rides the DIA pipeline exactly like
    solve_plane_static_banded: batched (m, 24, 24) B^T D B on the MXU,
    one scatter, streaming PCG.  `mesh` shards the DOF axis over "tp"
    through parallel/dia_sharded.dia_cg_solve_sharded (the plane
    family's multi-chip pattern).

    Returns (SolidStaticResult, iterations, relative_residual)."""
    import jax
    import jax.numpy as jnp

    from ..ops.dia import dia_layout

    if problem.prescribed is not None and np.any(problem.prescribed):
        raise ValueError("the banded path supports homogeneous "
                         "supports only")
    dtype = dtype or jnp.asarray(1.0).dtype
    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        # 3D needs a bigger diagonal budget than the 2D default of 64
        # (27 node neighbours instead of 9).
        layout = dia_layout(problem.dof_map(), problem.ndof,
                            max_diags=160)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    f_np = problem.loads + _body_force_vectors3(problem) \
        + _thermal_load_vectors3(problem)
    if mesh is not None:
        from ..ops.dia import assemble_dia_blocks, dia_matvec
        from ..parallel.dia_sharded import dia_cg_solve_sharded
        from ..solvers.banded_inverse import \
            DiaLayoutView as _DiaLayoutView

        view = _DiaLayoutView(layout, problem._dia_entry_slot_dev)
        dmat = _dmat3(jnp.asarray(problem.young, dtype),
                      jnp.asarray(problem.poisson, dtype), xp=jnp)
        blocks = _k_blocks3(jnp.asarray(problem.coords(), dtype), dmat,
                            xp=jnp)
        diags = assemble_dia_blocks(view, blocks)
        f_dev = jnp.asarray(f_np, dtype)
        mask_dev = jnp.asarray(problem.free_mask(), dtype)
        x, iters, rel = dia_cg_solve_sharded(
            layout, diags, f_dev, mask_dev, mesh, tol=float(tol),
            max_iter=int(max_iter))
        reac = (dia_matvec(layout, diags, x) - f_dev) * (1.0 - mask_dev)
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    else:
        core = _solid_banded_core(layout, int(max_iter), precond)
        x, reac, iters, rel = core(
            jnp.asarray(problem.coords(), dtype),
            jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.poisson, dtype),
            problem._dia_entry_slot_dev,
            jnp.asarray(f_np, dtype),
            jnp.asarray(problem.free_mask(), dtype),
            jnp.asarray(tol, dtype))
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    u = np.asarray(u, dtype=float)
    sig, vm, principal, eps = recover_stresses3(problem, u,
                                                thermal=True)
    res = SolidStaticResult(displacements=u, stresses=sig,
                            von_mises=vm, principal=principal,
                            strains=eps,
                            reactions=np.asarray(reac, dtype=float))
    return res, int(iters), float(rel)


def solid_lumped_mass_diag(problem: SolidProblem) -> np.ndarray:
    """(3n,) row-sum (partition-of-unity) lumped mass: for trilinear
    shapes sum_b N_a N_b = N_a, so the row sum of the consistent block
    is the exact integral of density N_a — positive for every hex8,
    total mass preserved.  Point masses add per node."""
    m_node = np.zeros(problem.nodes.shape[0])
    coords = problem.coords()
    for xi, eta, zeta in _GP3:
        n = _hex_n(xi, eta, zeta)
        _, det = _hex_point(coords, xi, eta, zeta)
        np.add.at(m_node, problem.elements,
                  (problem.density * det)[:, None] * n[None, :])
    if problem.point_masses is not None:
        m_node = m_node + problem.point_masses
    return np.repeat(m_node, 3)


def solid_modal_banded(problem: SolidProblem, n_modes: int = 4,
                       n_iter: int = 30, cg_tol: float = 1e-7,
                       seed: int = 0, dtype=None,
                       mesh=None) -> SolidModalResult:
    """Large-mesh 3D modal analysis: inverse subspace iteration on the
    banded hex8 operator with row-sum-lumped mass — the truss family's
    _subspace_iteration (solvers/modal.py) riding the solid DIA
    diagonals unchanged (it is layout-generic; the frame family set
    the pattern, models/frame.py:frame_modal_banded).  Lumped-mass
    frequencies converge from BELOW under refinement while the
    consistent host tier converges from above; tests pin banded
    against a dense eigensolve of the SAME lumped discrete problem.
    `mesh` distributes the block solves (parallel/dia_sharded.py)."""
    import jax
    import jax.numpy as jnp

    from ..ops.dia import assemble_dia_blocks, dia_layout
    from ..solvers.modal import _subspace_iteration
    from ..solvers.banded_inverse import \
            DiaLayoutView as _DiaLayoutView

    dtype = dtype or jnp.asarray(1.0).dtype
    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        layout = dia_layout(problem.dof_map(), problem.ndof,
                            max_diags=160)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    dmat = _dmat3(jnp.asarray(problem.young, dtype),
                  jnp.asarray(problem.poisson, dtype), xp=jnp)
    blocks = _k_blocks3(jnp.asarray(problem.coords(), dtype), dmat,
                        xp=jnp)
    diags = assemble_dia_blocks(
        _DiaLayoutView(layout, problem._dia_entry_slot_dev), blocks)
    mask = jnp.asarray(problem.free_mask(), dtype)
    m_diag = jnp.asarray(solid_lumped_mass_diag(problem), dtype)
    m_diag = m_diag * mask + (1.0 - mask)
    w, y, _change = _subspace_iteration(
        layout, diags, m_diag, mask, int(n_modes), int(n_iter),
        cg_tol, int(seed), mesh=mesh)
    lam, shapes = jax.device_get((w, (y * mask[:, None]).T))
    lam = np.maximum(np.asarray(lam, dtype=float), 0.0)
    om = np.sqrt(lam)
    return SolidModalResult(frequencies_hz=om / (2.0 * np.pi),
                            omegas=om, eigenvalues=lam,
                            mode_shapes=np.asarray(shapes, dtype=float))


def solid_stable_dt(problem: SolidProblem, safety: float = 0.9,
                    damping=(0.0, 0.0)) -> float:
    """Gershgorin bound on the explicit critical step for the hex8
    mesh: omega_max^2 <= max_i sum_j |K_ij| / m_i over FREE rows
    (support rows carry full stiffness over partial tributary mass and
    would be up to sqrt(2) conservative — the truss stable_dt lesson,
    solvers/dynamics.py:177), with the all-rows fallback for
    degenerate free blocks.  Rayleigh damping SHRINKS the limit:
    dt = (2/w)(sqrt(1+zeta^2) - zeta), zeta = alpha/2w + beta w/2."""
    k, _ = solid_matrices(problem, with_mass=False)
    m = solid_lumped_mass_diag(problem)
    row = np.abs(k).sum(axis=1) / m
    free = problem.free_mask() > 0
    w2 = float(row[free].max()) if free.any() and row[free].max() > 0 \
        else float(row.max())
    w = np.sqrt(max(w2, 1e-30))
    alpha, beta = float(damping[0]), float(damping[1])
    zeta = 0.5 * alpha / w + 0.5 * beta * w
    return safety * (2.0 / w) * (np.sqrt(1.0 + zeta * zeta) - zeta)


_SOLID_TRANSIENT_CACHE: dict = {}


def solve_solid_transient_banded(problem: SolidProblem, dt: float,
                                 n_steps: int, amplitude=None,
                                 damping=(0.0, 0.0), probe_dofs=None,
                                 record_every: int = 1,
                                 dtype=None) -> SolidTransientResult:
    """Large-mesh 3D explicit dynamics: central difference on the
    banded hex8 operator with row-sum-lumped mass — the truss family's
    _central_run (solvers/dynamics.py:277) riding the solid DIA
    matvec unchanged (it is k_apply-generic), whole history as ONE
    lax.scan, probes + energies fetched in one device_get.

    The marginal step cost is one banded matvec plus pointwise
    updates, so 3D explicit dynamics runs at the DIA streaming bound
    like the 2M-DOF truss transient (BENCHMARKS.md
    transient_central_step).  Program cached per (layout signature,
    n_steps/record_every, damping shape) — dt, damping values and the
    amplitude history stay traced, so one compiled program serves
    every load case of a shape class."""
    import jax
    import jax.numpy as jnp

    from ..ops.dia import assemble_dia_blocks, dia_layout, dia_matvec
    from ..solvers.banded_inverse import \
            DiaLayoutView as _DiaLayoutView

    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    if problem.prescribed is not None and np.any(problem.prescribed):
        raise ValueError("transient supports homogeneous supports only")
    _require_no_thermal3(problem, "transient")
    dtype = dtype or jnp.asarray(1.0).dtype
    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        layout = dia_layout(problem.dof_map(), problem.ndof,
                            max_diags=160)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    dmat = _dmat3(jnp.asarray(problem.young, dtype),
                  jnp.asarray(problem.poisson, dtype), xp=jnp)
    blocks = _k_blocks3(jnp.asarray(problem.coords(), dtype), dmat,
                        xp=jnp)
    diags = assemble_dia_blocks(
        _DiaLayoutView(layout, problem._dia_entry_slot_dev), blocks)
    mask = jnp.asarray(problem.free_mask(), dtype)
    m_diag = jnp.asarray(solid_lumped_mass_diag(problem), dtype)
    m_diag = m_diag * mask + (1.0 - mask)
    f0 = jnp.asarray(problem.loads + _body_force_vectors3(problem),
                     dtype)
    amp = (np.ones(n_steps) if amplitude is None
           else np.broadcast_to(np.asarray(amplitude, dtype=float),
                                (n_steps,)))
    probe_np = (np.arange(problem.ndof) if probe_dofs is None
                else np.asarray(probe_dofs, dtype=int).reshape(-1))
    n_rec = n_steps // record_every
    alpha, beta = float(damping[0]), float(damping[1])
    use_beta = beta != 0.0

    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.entry_slot.shape, n_rec, record_every, use_beta,
           probe_np.size)
    core = _SOLID_TRANSIENT_CACHE.get(key)
    if core is None:
        from ..solvers.dynamics import _central_run

        @jax.jit
        def core(diags, m, mask, loads, amplitude, probe, dt_t,
                 alpha_t, beta_t):
            def k_apply(u):
                return dia_matvec(layout, diags, u * mask) * mask

            zeros = jnp.zeros_like(loads)
            return _central_run(k_apply, m, mask, loads, amplitude,
                                dt_t, alpha_t, beta_t, zeros, zeros,
                                probe, n_rec, record_every, use_beta)

        _SOLID_TRANSIENT_CACHE[key] = core
    recs, _u_f, _v_f = core(
        diags, m_diag, mask, f0, jnp.asarray(amp, dtype),
        jnp.asarray(probe_np), jnp.asarray(dt, dtype),
        jnp.asarray(alpha, dtype), jnp.asarray(beta, dtype))
    u_rec, v_rec, _ke, _se = jax.device_get(recs)   # ONE fetch
    times = dt * record_every * np.arange(1, n_rec + 1)
    return SolidTransientResult(
        times=times, displacements=np.asarray(u_rec, dtype=float),
        velocities=np.asarray(v_rec, dtype=float), dt=float(dt),
        n_steps=int(n_steps))


def identify_solid_young_banded(problem: SolidProblem, measured_dofs,
                                measured_disp, n_iter: int = 300,
                                learning_rate: float = 0.05,
                                tol: float = 1e-7,
                                max_iter: int = 20000,
                                zones=None, field: bool = False,
                                seed: int = 0, hidden_layers: int = 2,
                                neurons_per_layer: int = 16):
    """Young-modulus identification on the 3D hex8 family through the
    banded adjoint — the generic ADAM-over-banded-adjoint loop
    (solvers/banded_inverse.identify_young_banded, shared with the
    plane family); only the hex8 block builder is solid-specific.
    Parameterizations: zones (one log-E per zone — 3D damage
    localization), field=True (E(x, y, z) MLP at centroids,
    input_dim=3), default per-element log-E.

    Returns (young (m,), loss_history, mlp_field_or_None)."""
    import jax.numpy as jnp

    from ..ops.dia import dia_layout
    from ..solvers.banded_inverse import identify_young_banded

    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        layout = dia_layout(problem.dof_map(), problem.ndof,
                            max_diags=160)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)

    m = problem.nelm
    dtype = jnp.asarray(1.0).dtype
    coords = jnp.asarray(problem.coords(), dtype)
    poisson = jnp.broadcast_to(jnp.asarray(problem.poisson, dtype),
                               (m,))

    def blocks_of(young_e):
        return _k_blocks3(coords, _dmat3(young_e, poisson, xp=jnp),
                          xp=jnp)

    return identify_young_banded(
        layout, problem._dia_entry_slot_dev, blocks_of,
        problem.young.copy(), problem.coords().mean(axis=1),
        problem.loads + _body_force_vectors3(problem),
        problem.free_mask(), measured_dofs, measured_disp,
        n_iter=n_iter, learning_rate=learning_rate, tol=tol,
        max_iter=max_iter, zones=zones, field=field, seed=seed,
        hidden_layers=hidden_layers,
        neurons_per_layer=neurons_per_layer, input_dim=3)


def extrude_mesh(nodes2d: np.ndarray, quads: np.ndarray,
                 thickness: float, nz: int = 1):
    """Extrude a 2D quad mesh (models/plane.rect_mesh / annulus_mesh
    output, CCW quads) into `nz` hex8 layers of total `thickness`
    along +z.  Node l * n2d + i is 2D node i at layer l, so 2D DOF k
    of node i maps to 3D DOF 3*(l*n2d + i) + k — the plane-strain
    cross-validation (fix all z DOFs) needs no index gymnastics.
    CCW-in-plane quads become positively-oriented bricks (bottom quad
    CCW viewed from +z, models/solid.py convention)."""
    nodes2d = np.asarray(nodes2d, dtype=float)
    quads = np.asarray(quads, dtype=int)
    if quads.ndim != 2 or quads.shape[1] != 4:
        raise ValueError("extrude_mesh needs (m, 4) quads")
    n2d = nodes2d.shape[0]
    zs = np.linspace(0.0, float(thickness), nz + 1)
    nodes = np.concatenate([
        np.concatenate([nodes2d, np.full((n2d, 1), z)], axis=1)
        for z in zs])
    elems = []
    for l in range(nz):
        lo, hi = l * n2d, (l + 1) * n2d
        elems.append(np.concatenate([quads + lo, quads + hi], axis=1))
    return nodes, np.concatenate(elems, axis=0)
