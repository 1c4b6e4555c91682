"""3D space-frame family: two-node beam elements with 6 DOFs per node
(u, v, w, θx, θy, θz) — axial EA, St-Venant torsion GJ, and cubic-
Hermite bending in BOTH principal planes (EIz in the local x–y plane,
EIy in the local x–z plane).  Towers, grillages, and space structures,
which neither the 2D frame (no out-of-plane action, no torsion) nor
the truss family (no moments at all) can carry.

Reference scope: rpacheco-blazquez/PINN-FEM has no bending elements at
all (SURVEY §2: 1D/2D truss only) — this family is an original
extension following the same layered design as models/frame.py
(dataclass problem → batched local closed forms → masked dense host
solve → JSON tier in io/frame3d_io.py).

Numerics
--------
Local DOF order per node: [u, v, w, φx, φy, φz] with the STANDARD sign
conventions (e.g. McGuire, Gallagher & Ziemian, "Matrix Structural
Analysis" ch. 4-5):

- axial (rows 0, 6):        EA/L   [[1, −1], [−1, 1]]
- torsion (rows 3, 9):      GJ/L   [[1, −1], [−1, 1]]   (linear twist —
  EXACT for end torques, like the axial bar)
- bending x–y (1, 5, 7, 11): EIz Hermite block, +6L coupling signs
- bending x–z (2, 4, 8, 10): EIy Hermite block, −6L coupling signs
  (a positive rotation about local y tips the +z face toward +x:
  w′ = −θy, which flips every v–θ coupling term of the x–y block)

Element orientation: local x̂ along the member; local ŷ = â × x̂ and
ẑ = x̂ × ŷ with the auxiliary vector â = global Z (so a member along
global X gets local y = Y, z = Z), falling back to â = global X for
members within 1e-8 of vertical; an optional per-element `ref_vector`
overrides â (webs of inclined members).  The 12×12 transformation is
block-diag(R, R, R, R) with R rows = (x̂, ŷ, ẑ).

Consistent mass: axial and torsional ρAL/6 (ρ I_p L/6) two-point
blocks plus the ρAL/420 Hermite blocks per bending plane (same sign
flips as the stiffness).  `polar_inertia` defaults to J — exact for
circular sections, the standard shaft idealization otherwise; pass
I_p = Iy + Iz explicitly for thin-walled open sections where J ≪ I_p.

Verification anchors (tests/test_frame3d.py)
--------------------------------------------
- one-element cantilever along x: tip Fy → PL³/3EIz, Fz → PL³/3EIy,
  torque → TL/GJ, axial → PL/EA, ALL to machine precision (Hermite /
  linear shapes are exact for nodal loads);
- the same member re-oriented along an arbitrary direction: identical
  local response (objectivity — u rotates with R exactly);
- right-angle grillage closed form
  δ_C = P L₁³/3EI_AB + P L₂³/3EI_BC + P L₂² L₁ / (G J_AB)
  (bending of both legs + the torsion of leg AB driven by the lever
  moment P L₂) to machine precision with two elements;
- consistent-mass modal: axial f_k = (2k−1)c/4L and torsional
  f_k = (2k−1)/(4L)·√(G/ρ) rod series from above, and the two
  INTERLEAVED simply-supported bending families (βL)²√(EI_{y,z}/ρA)/2πL²
  when I_y ≠ I_z.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = [
    "SpaceFrameProblem",
    "SpaceFrameStaticResult",
    "SpaceFrameModalResult",
    "SpaceFrameTransientResult",
    "SpaceFrameHarmonicResult",
    "space_frame_matrices",
    "solve_space_frame_static",
    "space_frame_modal",
    "solve_space_frame_transient",
    "space_frame_harmonic",
    "SpaceFrameBucklingResult",
    "space_frame_buckling",
    "space_frame_end_forces",
    "solve_space_frame_static_banded",
    "space_frame_modal_banded",
    "space_frame_lumped_mass_diag",
]

_VERT_TOL = 1e-8


@dataclass
class SpaceFrameProblem:
    """3D space frame: nodes (n, 3), elements (m, 2), per-element
    section/material values (scalars broadcast), nodal loads (6n,) as
    [Fx, Fy, Fz, Mx, My, Mz]*n, fixed DOFs on the 6-DOF-per-node
    numbering; optional per-node translational point masses."""
    nodes: np.ndarray
    elements: np.ndarray
    young: np.ndarray            # (m,) or scalar
    area: np.ndarray
    inertia_y: np.ndarray        # bending in the local x–z plane
    inertia_z: np.ndarray        # bending in the local x–y plane
    torsion_j: np.ndarray        # St-Venant torsion constant
    density: np.ndarray
    loads: np.ndarray            # (6n,)
    fixed_dofs: np.ndarray
    # Shear modulus G (m,) or scalar; derived from poisson when absent.
    shear_modulus: Optional[np.ndarray] = None
    poisson: Optional[float] = None
    # (n,) translational lumped masses added to the u/v/w diagonal.
    point_masses: Optional[np.ndarray] = None
    # (m, 3) auxiliary vectors spanning the local x–y plane with x̂
    # (row of zeros -> the global-Z/global-X default convention).
    ref_vector: Optional[np.ndarray] = None
    # (m,) polar second moment I_p for the torsional consistent mass
    # (defaults to torsion_j — exact for circular sections).
    polar_inertia: Optional[np.ndarray] = None
    # (m, 3) uniform distributed member loads [wx, wy, wz] in GLOBAL
    # axes (force/length) — converted to consistent nodal loads and
    # the fixed-end corrections the member-force recovery needs.
    member_loads: Optional[np.ndarray] = None
    # Thermal load case (STATIC only — dynamic paths refuse it):
    # alpha_cte (m,) CTE; temperature (m,) uniform member ΔT (axial
    # expansion); temperature_gradient_y / _z (m,) through-depth
    # dT/dy', dT/dz' in LOCAL section axes (thermal curvature
    # κ = α·g — bowing in the matching bending plane / restraint
    # moments when clamped).
    alpha_cte: Optional[np.ndarray] = None
    temperature: Optional[np.ndarray] = None
    temperature_gradient_y: Optional[np.ndarray] = None
    temperature_gradient_z: Optional[np.ndarray] = None

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=float)
        if self.nodes.ndim != 2 or self.nodes.shape[1] != 3:
            raise ValueError("space-frame nodes must be (n, 3)")
        self.elements = np.asarray(self.elements, dtype=int)
        if self.elements.ndim != 2 or self.elements.shape[1] != 2:
            raise ValueError("space-frame elements must be (m, 2)")
        m = self.elements.shape[0]
        for name in ("young", "area", "inertia_y", "inertia_z",
                     "torsion_j", "density"):
            setattr(self, name, np.broadcast_to(
                np.asarray(getattr(self, name), dtype=float),
                (m,)).copy())
            if np.any(getattr(self, name) <= 0.0):
                raise ValueError(f"{name} must be positive")
        if self.shear_modulus is None:
            if self.poisson is None:
                raise ValueError('space frame needs "shear_modulus" '
                                 'or "poisson" (G = E/2(1+ν))')
            self.shear_modulus = self.young \
                / (2.0 * (1.0 + float(self.poisson)))
        self.shear_modulus = np.broadcast_to(
            np.asarray(self.shear_modulus, dtype=float), (m,)).copy()
        if np.any(self.shear_modulus <= 0.0):
            raise ValueError("shear_modulus must be positive")
        self.loads = np.asarray(self.loads, dtype=float).reshape(-1)
        if self.loads.size != self.ndof:
            raise ValueError(f"loads must have {self.ndof} entries "
                             f"(6 per node), got {self.loads.size}")
        self.fixed_dofs = np.asarray(self.fixed_dofs,
                                     dtype=int).reshape(-1)
        if self.point_masses is not None:
            self.point_masses = np.broadcast_to(
                np.asarray(self.point_masses, dtype=float),
                (self.nnode,)).copy()
        if self.ref_vector is not None:
            self.ref_vector = np.broadcast_to(
                np.asarray(self.ref_vector, dtype=float),
                (m, 3)).copy()
        if self.polar_inertia is None:
            self.polar_inertia = self.torsion_j.copy()
        else:
            self.polar_inertia = np.broadcast_to(
                np.asarray(self.polar_inertia, dtype=float),
                (m,)).copy()
        if self.member_loads is not None:
            self.member_loads = np.broadcast_to(
                np.asarray(self.member_loads, dtype=float),
                (m, 3)).copy()
        if (self.temperature is not None
                or self.temperature_gradient_y is not None
                or self.temperature_gradient_z is not None) \
                and self.alpha_cte is None:
            raise ValueError('a thermal load case needs the thermal '
                             'expansion coefficient (material '
                             '"alpha")')
        for name in ("alpha_cte", "temperature",
                     "temperature_gradient_y",
                     "temperature_gradient_z"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, np.broadcast_to(
                    np.asarray(v, dtype=float), (m,)).copy())
        if np.any(_geometry3d(self)[0] <= 0.0):
            raise ValueError("zero-length space-frame element")

    @property
    def nnode(self) -> int:
        return self.nodes.shape[0]

    @property
    def nelm(self) -> int:
        return self.elements.shape[0]

    @property
    def ndof(self) -> int:
        return 6 * self.nnode

    def free_mask(self) -> np.ndarray:
        m = np.ones(self.ndof)
        m[self.fixed_dofs] = 0.0
        return m

    def dof_map(self) -> np.ndarray:
        """(m, 12) global DOF indices per element."""
        i, j = self.elements[:, 0], self.elements[:, 1]
        return np.stack([6 * i + d for d in range(6)]
                        + [6 * j + d for d in range(6)], axis=1)


def _geometry3d(problem: SpaceFrameProblem):
    """(length (m,), R (m, 3, 3)) — R rows are the local axes."""
    d = problem.nodes[problem.elements[:, 1]] \
        - problem.nodes[problem.elements[:, 0]]
    length = np.linalg.norm(d, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        xh = np.where(length[:, None] > 0.0, d / length[:, None],
                      np.array([1.0, 0.0, 0.0]))
    # Auxiliary vector: global Z, global X for near-vertical members,
    # the per-element ref_vector where given (a zero row keeps the
    # default — the JSON tier's "only some members need a web
    # direction" convention).
    aux = np.tile(np.array([0.0, 0.0, 1.0]), (problem.nelm, 1))
    vertical = np.abs(np.abs(xh[:, 2]) - 1.0) < _VERT_TOL
    aux[vertical] = (1.0, 0.0, 0.0)
    if problem.ref_vector is not None:
        rv = problem.ref_vector
        given = np.linalg.norm(rv, axis=1) > 0.0
        aux[given] = rv[given]
    yh = np.cross(aux, xh)
    ny = np.linalg.norm(yh, axis=1)
    if np.any(ny < _VERT_TOL):
        raise ValueError("ref_vector parallel to a member axis")
    yh = yh / ny[:, None]
    zh = np.cross(xh, yh)
    r = np.stack([xh, yh, zh], axis=1)            # rows = local axes
    return length, r


def _transformation3d(r: np.ndarray) -> np.ndarray:
    """(m, 12, 12) local <- global: block-diag(R, R, R, R)."""
    m = r.shape[0]
    t = np.zeros((m, 12, 12))
    for off in (0, 3, 6, 9):
        t[:, off:off + 3, off:off + 3] = r
    return t


# Bending DOF quadruples (v-like, θ-like, v-like, θ-like) per plane.
_BEND_XY = (1, 5, 7, 11)     # v, θz — EIz, +6L coupling
_BEND_XZ = (2, 4, 8, 10)     # w, θy — EIy, −6L coupling (w′ = −θy)


def _fill4(mat, rows, block):
    for a, ia in enumerate(rows):
        for b, ib in enumerate(rows):
            mat[:, ia, ib] += block[:, a, b]


def _hermite_k(ei, length, sign):
    """(m, 4, 4) Hermite bending stiffness; sign flips the v–θ
    coupling terms (+1 for the x–y plane, −1 for x–z)."""
    b12 = 12.0 * ei / length ** 3
    b6 = sign * 6.0 * ei / length ** 2
    b4 = 4.0 * ei / length
    b2 = 2.0 * ei / length
    return np.stack([
        np.stack([b12, b6, -b12, b6], axis=-1),
        np.stack([b6, b4, -b6, b2], axis=-1),
        np.stack([-b12, -b6, b12, -b6], axis=-1),
        np.stack([b6, b2, -b6, b4], axis=-1)], axis=-2)


def _hermite_m(rho_al, length, sign):
    """(m, 4, 4) consistent Hermite mass (ρAL/420), same sign rule."""
    f = rho_al / 420.0
    l1 = sign * length
    return np.stack([
        np.stack([156.0 * f, 22.0 * f * l1, 54.0 * f,
                  -13.0 * f * l1], axis=-1),
        np.stack([22.0 * f * l1, 4.0 * f * length ** 2,
                  13.0 * f * l1, -3.0 * f * length ** 2], axis=-1),
        np.stack([54.0 * f, 13.0 * f * l1, 156.0 * f,
                  -22.0 * f * l1], axis=-1),
        np.stack([-13.0 * f * l1, -3.0 * f * length ** 2,
                  -22.0 * f * l1, 4.0 * f * length ** 2],
                 axis=-1)], axis=-2)


def _k_local3d(problem: SpaceFrameProblem, length: np.ndarray):
    """(m, 12, 12) local stiffness (module docstring)."""
    m = length.shape[0]
    k = np.zeros((m, 12, 12))
    ea = problem.young * problem.area / length
    k[:, 0, 0] = k[:, 6, 6] = ea
    k[:, 0, 6] = k[:, 6, 0] = -ea
    gj = problem.shear_modulus * problem.torsion_j / length
    k[:, 3, 3] = k[:, 9, 9] = gj
    k[:, 3, 9] = k[:, 9, 3] = -gj
    _fill4(k, _BEND_XY,
           _hermite_k(problem.young * problem.inertia_z, length, 1.0))
    _fill4(k, _BEND_XZ,
           _hermite_k(problem.young * problem.inertia_y, length, -1.0))
    return k


def _m_local3d(problem: SpaceFrameProblem, length: np.ndarray):
    """(m, 12, 12) local consistent mass (module docstring)."""
    m = length.shape[0]
    mm = np.zeros((m, 12, 12))
    rho_al = problem.density * problem.area * length
    ax = rho_al / 6.0
    mm[:, 0, 0] = mm[:, 6, 6] = 2.0 * ax
    mm[:, 0, 6] = mm[:, 6, 0] = ax
    tor = problem.density * problem.polar_inertia * length / 6.0
    mm[:, 3, 3] = mm[:, 9, 9] = 2.0 * tor
    mm[:, 3, 9] = mm[:, 9, 3] = tor
    _fill4(mm, _BEND_XY, _hermite_m(rho_al, length, 1.0))
    _fill4(mm, _BEND_XZ, _hermite_m(rho_al, length, -1.0))
    return mm


def _assemble3d(problem: SpaceFrameProblem,
                blocks: np.ndarray) -> np.ndarray:
    dm = problem.dof_map()
    k = np.zeros((problem.ndof, problem.ndof))
    np.add.at(k, (dm[:, :, None], dm[:, None, :]), blocks)
    return k


def _member_load_vectors3(problem: SpaceFrameProblem):
    """(f_nodal (6n,), f_fixed_local (m, 12)) for uniform member loads.

    Global [wx, wy, wz] resolve to local (axial q, transverse wy′,
    wz′) through the direction-cosine rows; each transverse component
    gives the classic consistent vector [wL/2, wL²/12] in ITS bending
    plane with the plane's sign convention (the x–z quadruple is the
    x–y one conjugated by diag(1, −1, 1, −1), so the fixed-end moment
    pair flips with it).  Hermite exact-at-nodes: one-element
    cantilever tips hit wL⁴/8EI per plane (tests/test_frame3d.py).
    Member-force recovery subtracts f_fixed_local from k_local·T·u."""
    if problem.member_loads is None:
        return np.zeros(problem.ndof), np.zeros((problem.nelm, 12))
    length, r = _geometry3d(problem)
    w_loc = np.einsum("mij,mj->mi", r, problem.member_loads)
    q, wy, wz = w_loc[:, 0], w_loc[:, 1], w_loc[:, 2]
    f_loc = np.zeros((problem.nelm, 12))
    f_loc[:, 0] = f_loc[:, 6] = q * length / 2.0
    f_loc[:, 1] = f_loc[:, 7] = wy * length / 2.0
    f_loc[:, 5] = wy * length ** 2 / 12.0
    f_loc[:, 11] = -wy * length ** 2 / 12.0
    f_loc[:, 2] = f_loc[:, 8] = wz * length / 2.0
    f_loc[:, 4] = -wz * length ** 2 / 12.0      # x–z sign conjugation
    f_loc[:, 10] = wz * length ** 2 / 12.0
    t = _transformation3d(r)
    f_glob = np.einsum("mji,mj->mi", t, f_loc)      # Tᵀ f_local
    f = np.zeros(problem.ndof)
    np.add.at(f, problem.dof_map(), f_glob)
    return f, f_loc


def _thermal_member_vectors3(problem: SpaceFrameProblem):
    """(f_nodal (6n,), f_fixed_local (m, 12)) of the thermal load
    case (the 2D frame family's contract in both bending planes).

    Uniform ΔT: ends pushed OUTWARD by EAαΔT — a fully restrained
    member recovers the textbook compression N = −EAαΔT exactly.
    Gradient dT/dy′: curvature in the x–y plane, end-moment pair
    ±EI_z·α·g_y on the θz DOFs; gradient dT/dz′: x–z plane, the pair
    lands on θy WITH the plane's sign conjugation (clamped-clamped
    recovers |M| = EIακ with u ≡ 0, a free cantilever bows
    stress-free)."""
    if problem.temperature is None \
            and problem.temperature_gradient_y is None \
            and problem.temperature_gradient_z is None:
        return np.zeros(problem.ndof), np.zeros((problem.nelm, 12))
    length, r = _geometry3d(problem)
    f_loc = np.zeros((problem.nelm, 12))
    if problem.temperature is not None:
        na = problem.young * problem.area * problem.alpha_cte \
            * problem.temperature                       # EAαΔT (m,)
        f_loc[:, 0] -= na
        f_loc[:, 6] += na
    if problem.temperature_gradient_y is not None:
        mk = problem.young * problem.inertia_z * problem.alpha_cte \
            * problem.temperature_gradient_y            # EI_z·κ (m,)
        f_loc[:, 5] -= mk
        f_loc[:, 11] += mk
    if problem.temperature_gradient_z is not None:
        mk = problem.young * problem.inertia_y * problem.alpha_cte \
            * problem.temperature_gradient_z            # EI_y·κ (m,)
        f_loc[:, 4] += mk                       # x–z sign conjugation
        f_loc[:, 10] -= mk
    t = _transformation3d(r)
    f_glob = np.einsum("mji,mj->mi", t, f_loc)
    f = np.zeros(problem.ndof)
    np.add.at(f, problem.dof_map(), f_glob)
    return f, f_loc


def _require_no_thermal3(problem: SpaceFrameProblem, kind: str):
    """models/frame.py:_require_no_thermal_frame, 3D twin."""
    if problem.temperature is not None \
            or problem.temperature_gradient_y is not None \
            or problem.temperature_gradient_z is not None:
        raise ValueError(
            f"space-frame {kind} does not take a thermal load case — "
            "thermoelastic loads are static; use analysis type "
            '"static" (buckling inherits ΔT through its static '
            "state)")


def space_frame_matrices(problem: SpaceFrameProblem,
                         with_mass: bool = True):
    """(K, M) dense global matrices (M None unless with_mass) — the
    one assembly every space-frame solver shares (host float64)."""
    length, r = _geometry3d(problem)
    t = _transformation3d(r)
    kl = _k_local3d(problem, length)
    k = _assemble3d(problem, np.einsum("mji,mjk,mkl->mil", t, kl, t))
    mmat = None
    if with_mass:
        ml = _m_local3d(problem, length)
        mmat = _assemble3d(problem,
                           np.einsum("mji,mjk,mkl->mil", t, ml, t))
        if problem.point_masses is not None:
            pm = np.zeros(problem.ndof)
            for d in range(3):                     # translational DOFs
                pm[d::6] += problem.point_masses
            mmat = mmat + np.diag(pm)
    return k, mmat


@dataclass
class SpaceFrameStaticResult:
    displacements: np.ndarray      # (6n,)
    member_end_forces: np.ndarray  # (m, 12) LOCAL
    #                                [N, Vy, Vz, T, My, Mz] per end
    axial: np.ndarray              # (m,) axial force (tension +)
    torque: np.ndarray             # (m,) St-Venant torque
    moments_y: np.ndarray          # (m, 2) end moments, local y
    moments_z: np.ndarray          # (m, 2) end moments, local z
    reactions: np.ndarray          # (6n,) K u − f on fixed DOFs


def solve_space_frame_static(
        problem: SpaceFrameProblem) -> SpaceFrameStaticResult:
    """Dense masked static solve + local member end-force recovery.

    Hermite bending, linear axial and linear torsion shapes are all
    EXACT for nodal loading, so the cantilever and grillage anchors
    hold to machine precision with one element per member
    (tests/test_frame3d.py)."""
    k, _ = space_frame_matrices(problem, with_mass=False)
    mask = problem.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    f_member, f_fixed = _member_load_vectors3(problem)
    f_th, f_th_fixed = _thermal_member_vectors3(problem)
    f_member, f_fixed = f_member + f_th, f_fixed + f_th_fixed
    f = problem.loads + f_member
    u = np.linalg.solve(km, f * mask) * mask

    length, r = _geometry3d(problem)
    t = _transformation3d(r)
    kl = _k_local3d(problem, length)
    u_loc = np.einsum("mij,mj->mi", t, u[problem.dof_map()])
    f_loc = np.einsum("mij,mj->mi", kl, u_loc) - f_fixed
    reactions = (k @ u - f) * (1.0 - mask)
    return SpaceFrameStaticResult(
        displacements=u,
        member_end_forces=f_loc,
        axial=-f_loc[:, 0],            # node-1 local x force: tension +
        torque=-f_loc[:, 3],
        moments_y=f_loc[:, [4, 10]],
        moments_z=f_loc[:, [5, 11]],
        reactions=reactions)


@dataclass
class SpaceFrameModalResult:
    frequencies_hz: np.ndarray
    omegas: np.ndarray
    eigenvalues: np.ndarray
    mode_shapes: np.ndarray        # (n_modes, 6n)


def space_frame_modal(problem: SpaceFrameProblem,
                      n_modes: int = 6) -> SpaceFrameModalResult:
    """Generalized K φ = λ M φ on the free block (consistent mass) —
    dense host-tier eigensolve (frame_modal's pattern in 3D)."""
    import scipy.linalg

    k, m = space_frame_matrices(problem)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    n_modes = min(n_modes, lam.size)
    lam = np.maximum(lam[:n_modes], 0.0)
    shapes = np.zeros((n_modes, problem.ndof))
    shapes[:, free] = vec[:, :n_modes].T
    om = np.sqrt(lam)
    return SpaceFrameModalResult(frequencies_hz=om / (2.0 * np.pi),
                                 omegas=om, eigenvalues=lam,
                                 mode_shapes=shapes)


@dataclass
class SpaceFrameTransientResult:
    times: np.ndarray
    displacements: np.ndarray      # (n_rec, n_probe)
    dt: float
    n_steps: int


def solve_space_frame_transient(problem: SpaceFrameProblem, dt: float,
                                n_steps: int, damping=(0.0, 0.0),
                                amplitude=None, probe_dofs=None,
                                record_every: int = 1
                                ) -> SpaceFrameTransientResult:
    """Newmark (average acceleration, unconditionally stable) on the
    dense space-frame K/M — one LU factorization of the effective
    operator serves every step (host float64, the family's tier;
    solve_frame_transient's recipe in 3D).

    amplitude: (n_steps,) load-scale history a(t) multiplying the
    problem's nodal loads (None = unit step).  Rayleigh C = αM + βK.
    Cross-validated against exact modal superposition of the undamped
    step response (tests/test_frame3d.py)."""
    import scipy.linalg

    if dt <= 0.0 or n_steps <= 0:
        raise ValueError("transient needs positive dt and n_steps")
    _require_no_thermal3(problem, "transient")
    k, m = space_frame_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _member_load_vectors3(problem)[0]
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
    a_acc = (np.linalg.solve(mf, ff * amp[0] - cf @ v - kf @ u)
             if n else np.zeros(0))
    rec_t, rec_u = [], []
    full = np.zeros(problem.ndof)
    for step in range(n_steps):
        # Forcing at t = (step+1)·dt — the amp[i+1] convention of
        # solvers/dynamics.py; the final step holds the last value.
        f_t = ff * amp[min(step + 1, n_steps - 1)]
        rhs = f_t + mf @ (a0 * u + 2.0 * a1 * v + a_acc) \
            + cf @ (a1 * u + v)
        u_new = scipy.linalg.lu_solve(lu, rhs)
        v_new = a1 * (u_new - u) - v
        a_new = a0 * (u_new - u) - 2.0 * a1 * v - a_acc
        u, v, a_acc = u_new, v_new, a_new
        if step % record_every == 0:
            full[free] = u
            rec_t.append((step + 1) * dt)
            rec_u.append(full[probe].copy())
    return SpaceFrameTransientResult(
        times=np.asarray(rec_t), displacements=np.asarray(rec_u),
        dt=float(dt), n_steps=int(n_steps))


@dataclass
class SpaceFrameHarmonicResult:
    omegas: np.ndarray
    amplitude: np.ndarray          # (n_freq, n_probe) |X|
    real: np.ndarray
    imag: np.ndarray


def space_frame_harmonic(problem: SpaceFrameProblem, omegas,
                         damping=(0.0, 0.0), probe_dofs=None
                         ) -> SpaceFrameHarmonicResult:
    """Steady-state X(ω) to the space frame's load pattern: direct
    dense complex solves (K − ω²M + iωC) X = f per frequency, host
    float64, Rayleigh C = αM + βK.  With proportional damping this
    equals the ALL-modes superposition exactly — the cross-check in
    tests/test_frame3d.py (frame_harmonic's recipe in 3D)."""
    om = np.asarray(omegas, dtype=float).reshape(-1)
    _require_no_thermal3(problem, "harmonic")
    k, m = space_frame_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _member_load_vectors3(problem)[0]
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
    return SpaceFrameHarmonicResult(omegas=om, amplitude=np.abs(xs),
                                    real=xs.real, imag=xs.imag)


def _kg_local3d(axial_n, length):
    """(m, 12, 12) geometric stiffness from member axial force N
    (tension positive): the N/(30L)·[36, 3L, 4L², −L²] Hermite blocks
    in BOTH bending planes (sign-conjugated for x–z like the
    stiffness).  FLEXURAL buckling only — torsional /
    flexural-torsional buckling needs Wagner/warping terms this
    element does not carry (documented out of scope)."""
    m = length.shape[0]
    kg = np.zeros((m, 12, 12))
    for rows, sign in ((_BEND_XY, 1.0), (_BEND_XZ, -1.0)):
        f = axial_n / (30.0 * length)
        l1 = sign * length
        bb = np.stack([
            np.stack([36.0 * f, 3.0 * f * l1, -36.0 * f,
                      3.0 * f * l1], axis=-1),
            np.stack([3.0 * f * l1, 4.0 * f * length ** 2,
                      -3.0 * f * l1, -f * length ** 2], axis=-1),
            np.stack([-36.0 * f, -3.0 * f * l1, 36.0 * f,
                      -3.0 * f * l1], axis=-1),
            np.stack([3.0 * f * l1, -f * length ** 2, -3.0 * f * l1,
                      4.0 * f * length ** 2], axis=-1)], axis=-2)
        _fill4(kg, rows, bb)
    return kg


@dataclass
class SpaceFrameBucklingResult:
    load_factors: np.ndarray       # ascending positive λ_cr
    modes: np.ndarray              # (n_modes, 6n)
    axial: np.ndarray              # (m,) member N at unit load


def space_frame_buckling(problem: SpaceFrameProblem,
                         n_modes: int = 2
                         ) -> SpaceFrameBucklingResult:
    """Linearized (P-Δ) buckling: statics gives member axial forces N,
    K_g(N) is assembled in both bending planes, and (K + λ K_g) φ = 0
    on the free block — λ_cr scales the APPLIED LOAD PATTERN.  A
    column with I_y ≠ I_z buckles about the WEAK axis first and the
    two flexural families sit at exactly I_strong/I_weak
    (tests/test_frame3d.py; frame_buckling's recipe in 3D, flexural
    modes only — see _kg_local3d)."""
    import scipy.linalg

    stat = solve_space_frame_static(problem)
    length, r = _geometry3d(problem)
    t = _transformation3d(r)
    kgl = _kg_local3d(stat.axial, length)
    kg = _assemble3d(problem, np.einsum("mji,mjk,mkl->mil", t, kgl, t))
    k, _ = space_frame_matrices(problem, with_mass=False)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf = k[np.ix_(free, free)]
    gf = kg[np.ix_(free, free)]
    lam, vec = scipy.linalg.eig(kf, -gf)
    good = np.isfinite(lam) & (np.abs(np.imag(lam))
                               <= 1e-8 * np.abs(lam)) \
        & (np.real(lam) > 1e-9)
    lam_r = np.real(lam[good])
    order = np.argsort(lam_r)[:n_modes]
    modes = np.zeros((order.size, problem.ndof))
    modes[:, free] = np.real(vec[:, good][:, order]).T
    return SpaceFrameBucklingResult(load_factors=lam_r[order],
                                    modes=modes, axial=stat.axial)


def space_frame_end_forces(problem: SpaceFrameProblem,
                           u: np.ndarray) -> np.ndarray:
    """(m, 12) LOCAL member end forces k_local·T·u_e of a displacement
    state (no fixed-end corrections — mode shapes and combined states;
    the continuum-spectrum family adapter's stress quantity)."""
    length, r = _geometry3d(problem)
    t = _transformation3d(r)
    kl = _k_local3d(problem, length)
    u_loc = np.einsum("mij,mj->mi", t,
                      np.asarray(u, dtype=float)[problem.dof_map()])
    return np.einsum("mij,mj->mi", kl, u_loc)


# --------------------------------------------------------------------
# Banded DEVICE tier: DIA + PCG statics and subspace-iteration modal,
# so a 40k-DOF lattice tower solves on chip — solve_frame_static_banded
# (models/frame.py) with 12x12 blocks; the DIA pipeline (ops/dia.py)
# is layout-generic, so everything below is block assembly.


def _frame3d_blocks_jnp(length, r, young, area, inertia_y, inertia_z,
                        torsion_gj):
    """(m, 12, 12) traced GLOBAL stiffness blocks from traced
    length/properties and the (m, 3, 3) direction-cosine array.
    precision="highest" on the T'KT contraction: TPU einsum defaults
    to bf16 on the MXU and the rounding asymmetry breaks PCG
    (models/plane.py:_einsum, CLAUDE.md)."""
    import jax.numpy as jnp

    m = length.shape[0]
    dtype = length.dtype
    z = jnp.zeros_like(length)
    ea = young * area / length
    gj = torsion_gj / length

    def herm(ei, sign):
        b12 = 12.0 * ei / length ** 3
        b6 = sign * 6.0 * ei / length ** 2
        b4 = 4.0 * ei / length
        b2 = 2.0 * ei / length
        return b12, b6, b4, b2

    kl = jnp.zeros((m, 12, 12), dtype)
    kl = kl.at[:, 0, 0].set(ea)
    kl = kl.at[:, 6, 6].set(ea)
    kl = kl.at[:, 0, 6].set(-ea)
    kl = kl.at[:, 6, 0].set(-ea)
    kl = kl.at[:, 3, 3].set(gj)
    kl = kl.at[:, 9, 9].set(gj)
    kl = kl.at[:, 3, 9].set(-gj)
    kl = kl.at[:, 9, 3].set(-gj)
    for rows, ei, sign in (((1, 5, 7, 11), young * inertia_z, 1.0),
                           ((2, 4, 8, 10), young * inertia_y, -1.0)):
        b12, b6, b4, b2 = herm(ei, sign)
        blk = jnp.stack([
            jnp.stack([b12, b6, -b12, b6], axis=-1),
            jnp.stack([b6, b4, -b6, b2], axis=-1),
            jnp.stack([-b12, -b6, b12, -b6], axis=-1),
            jnp.stack([b6, b2, -b6, b4], axis=-1)], axis=-2)
        for a_, ia in enumerate(rows):
            for b_, ib in enumerate(rows):
                kl = kl.at[:, ia, ib].add(blk[:, a_, b_])

    t = jnp.zeros((m, 12, 12), dtype)
    for off in (0, 3, 6, 9):
        t = t.at[:, off:off + 3, off:off + 3].set(r)
    kg_blocks = jnp.einsum("mji,mjk,mkl->mil", t, kl, t,
                           precision="highest")
    return kl, t, kg_blocks


def _frame3d_dia_layout(problem: SpaceFrameProblem):
    """DIA layout cached on the instance (connectivity-only, fixed at
    construction — the plane-family rule)."""
    import jax.numpy as jnp

    from ..ops.dia import dia_layout

    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        # A 3D space grid has up to 7 node-neighbour classes (self,
        # ±story, ±two plan directions) × 11 block diagonals each —
        # more than the 2D default budget of 64 (the solid family's
        # rationale, models/solid.py).
        layout = dia_layout(problem.dof_map(), problem.ndof,
                            max_diags=160)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    return layout


_FRAME3D_BANDED_CACHE: dict = {}


def _frame3d_banded_core(layout, precond: str, use_pallas: bool,
                         max_iter: int, nelm: int):
    """Jitted banded space-frame statics, cached per structural
    signature (never per problem object — the closure recompile trap,
    CLAUDE.md)."""
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.bandwidth, nelm, precond, use_pallas, max_iter)
    core = _FRAME3D_BANDED_CACHE.get(key)
    if core is not None:
        return core

    import jax

    from ..ops.dia import assemble_dia_blocks, dia_cg_solve, dia_matvec
    from ..solvers.banded_inverse import DiaLayoutView

    @jax.jit
    def core(length, r, young, area, iy, iz, gj, entry_slot, f, mask,
             tol):
        _, _, kg_blocks = _frame3d_blocks_jnp(length, r, young, area,
                                              iy, iz, gj)
        diags = assemble_dia_blocks(
            DiaLayoutView(layout, entry_slot), kg_blocks)
        x, iters, rel = dia_cg_solve(layout, diags, f, mask, tol=tol,
                                     max_iter=max_iter,
                                     use_pallas=use_pallas,
                                     precond=precond, components=6)
        reac = (dia_matvec(layout, diags, x) - f) * (1.0 - mask)
        return x, reac, iters, rel

    _FRAME3D_BANDED_CACHE[key] = core
    return core


def solve_space_frame_static_banded(problem: SpaceFrameProblem,
                                    tol: float = 1e-7,
                                    max_iter: int = 20000,
                                    use_pallas: bool = False,
                                    precond: str = "auto", dtype=None,
                                    mesh=None):
    """Large-mesh space-frame statics on the DEVICE tier.

    Regular 3D lattices (towers, grids) are banded under nodal
    numbering: 12 DOFs couple per node pair, so the stiffness has a
    few dozen distinct diagonals and the whole solve rides the DIA
    pipeline (ops/dia.py): batched (m, 12, 12) T'KT blocks contracted
    on the MXU, one scatter into diagonal storage, Jacobi-PCG (the
    mixed axial/flexural/torsional DOF scales make Jacobi scaling
    load-bearing — the 2D frame family's measured tradeoff).  `mesh`
    row-block-shards the DOF axis over "tp"
    (parallel/dia_sharded.dia_cg_solve_sharded).

    Returns (SpaceFrameStaticResult, iterations, relative_residual);
    member end-force recovery runs on the host from the fetched field
    (ONE device_get).  Pinned 1:1 against solve_space_frame_static in
    tests/test_frame3d.py."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.asarray(1.0).dtype
    if precond == "auto":
        precond = "jacobi"
    layout = _frame3d_dia_layout(problem)
    length_np, r_np = _geometry3d(problem)
    f_member, f_fixed = _member_load_vectors3(problem)
    f_th, f_th_fixed = _thermal_member_vectors3(problem)
    f_member, f_fixed = f_member + f_th, f_fixed + f_th_fixed
    f_np = problem.loads + f_member
    gj_np = problem.shear_modulus * problem.torsion_j
    args = (jnp.asarray(length_np, dtype), jnp.asarray(r_np, dtype),
            jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.area, dtype),
            jnp.asarray(problem.inertia_y, dtype),
            jnp.asarray(problem.inertia_z, dtype),
            jnp.asarray(gj_np, dtype))
    if mesh is not None:
        from ..ops.dia import assemble_dia_blocks, dia_matvec
        from ..parallel.dia_sharded import dia_cg_solve_sharded
        from ..solvers.banded_inverse import DiaLayoutView

        _, _, kg_blocks = _frame3d_blocks_jnp(*args)
        diags = assemble_dia_blocks(
            DiaLayoutView(layout, problem._dia_entry_slot_dev),
            kg_blocks)
        f_dev = jnp.asarray(f_np, dtype)
        mask_dev = jnp.asarray(problem.free_mask(), dtype)
        x, iters, rel = dia_cg_solve_sharded(
            layout, diags, f_dev, mask_dev, mesh, tol=float(tol),
            max_iter=int(max_iter))
        reac = (dia_matvec(layout, diags, x) - f_dev) \
            * (1.0 - mask_dev)
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    else:
        core = _frame3d_banded_core(layout, precond, use_pallas,
                                    int(max_iter), problem.nelm)
        x, reac, iters, rel = core(
            *args, problem._dia_entry_slot_dev,
            jnp.asarray(f_np, dtype),
            jnp.asarray(problem.free_mask(), dtype),
            jnp.asarray(tol, dtype))
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    u = np.asarray(u, dtype=float)

    length, r = _geometry3d(problem)
    t = _transformation3d(r)
    kl = _k_local3d(problem, length)
    u_loc = np.einsum("mij,mj->mi", t, u[problem.dof_map()])
    f_loc = np.einsum("mij,mj->mi", kl, u_loc) - f_fixed
    res = SpaceFrameStaticResult(
        displacements=u,
        member_end_forces=f_loc,
        axial=-f_loc[:, 0],
        torque=-f_loc[:, 3],
        moments_y=f_loc[:, [4, 10]],
        moments_z=f_loc[:, [5, 11]],
        reactions=np.asarray(reac, dtype=float))
    return res, int(iters), float(rel)


def space_frame_lumped_mass_diag(
        problem: SpaceFrameProblem) -> np.ndarray:
    """(6n,) HRZ-lumped mass diagonal: ρAL/2 per end translation; the
    rotational block is ISOTROPIZED to its trace mean
    (ρ I_p L/2 + 2·ρAL³/78)/3 per rotation DOF — the local rotary
    diagonal (torsion ρI_pL/2, bending ρAL³/78 twice) is anisotropic,
    and only an isotropic per-node block keeps the GLOBAL diagonal
    rotation-invariant (R'·cI·R = cI).  Trace-preserving, positive on
    every DOF (the banded modal M-inner product needs that); point
    masses add translationally."""
    length, _ = _geometry3d(problem)
    rho = problem.density
    rho_al = rho * problem.area * length
    tr = 0.5 * rho_al
    rot = (0.5 * rho * problem.polar_inertia * length
           + 2.0 * rho_al * length ** 2 / 78.0) / 3.0
    diag = np.zeros(problem.ndof)
    dm = problem.dof_map()
    fe = np.stack([tr, tr, tr, rot, rot, rot,
                   tr, tr, tr, rot, rot, rot], axis=-1)
    np.add.at(diag, dm, fe)
    if problem.point_masses is not None:
        for d in range(3):
            diag[d::6] += problem.point_masses
    return diag


def space_frame_modal_banded(problem: SpaceFrameProblem,
                             n_modes: int = 4, n_iter: int = 30,
                             cg_tol: float = 1e-7, seed: int = 0,
                             dtype=None, mesh=None
                             ) -> SpaceFrameModalResult:
    """Large-mesh space-frame modal analysis: inverse subspace
    iteration on the banded operator with the HRZ-lumped mass — the
    truss family's _subspace_iteration (solvers/modal.py) riding the
    frame3d DIA diagonals unchanged (it is layout-generic).
    Lumped-mass frequencies differ from the consistent host tier's;
    tests pin banded-vs-dense on the SAME lumped discrete problem."""
    import jax
    import jax.numpy as jnp

    from ..ops.dia import assemble_dia_blocks
    from ..solvers.banded_inverse import DiaLayoutView
    from ..solvers.modal import _subspace_iteration

    dtype = dtype or jnp.asarray(1.0).dtype
    layout = _frame3d_dia_layout(problem)
    length_np, r_np = _geometry3d(problem)
    gj_np = problem.shear_modulus * problem.torsion_j
    _, _, kg_blocks = _frame3d_blocks_jnp(
        jnp.asarray(length_np, dtype), jnp.asarray(r_np, dtype),
        jnp.asarray(problem.young, dtype),
        jnp.asarray(problem.area, dtype),
        jnp.asarray(problem.inertia_y, dtype),
        jnp.asarray(problem.inertia_z, dtype),
        jnp.asarray(gj_np, dtype))
    diags = assemble_dia_blocks(
        DiaLayoutView(layout, problem._dia_entry_slot_dev), kg_blocks)
    mask = jnp.asarray(problem.free_mask(), dtype)
    m_diag = jnp.asarray(space_frame_lumped_mass_diag(problem), dtype)
    m_diag = m_diag * mask + (1.0 - mask)
    w, y, change = _subspace_iteration(
        layout, diags, m_diag, mask, int(n_modes), int(n_iter),
        cg_tol, int(seed), mesh=mesh)
    lam, shapes = jax.device_get((w, (y * mask[:, None]).T))
    lam = np.maximum(np.asarray(lam, dtype=float), 0.0)
    om = np.sqrt(lam)
    return SpaceFrameModalResult(
        frequencies_hz=om / (2.0 * np.pi), omegas=om,
        eigenvalues=lam,
        mode_shapes=np.asarray(shapes, dtype=float))
