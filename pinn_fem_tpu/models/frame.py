"""2D Euler-Bernoulli frame elements — bending joins the framework.

The reference (and every family above) is truss-only: two force DOFs
per node, axial stiffness, no moments.  Real structures carry BENDING
— portal frames, beams, towers with rigid joints — so this module adds
the classic 2D frame element: three DOFs per node (u, v, θ), cubic
Hermite bending + linear axial interpolation, exact within
Euler-Bernoulli theory for nodal loads (a single element reproduces
the PL³/3EI cantilever tip deflection to machine precision — the
anchor tests/test_frame.py opens with).

Execution tier: frames serve the same small-model regime as the dense
analysis family, so everything here runs on the HOST tier (numpy
float64, zero device programs — the design doctrine ops/host.py set:
below DENSE_DOF_LIMIT the analysis family stays off the accelerator
entirely, making cold CLI/HTTP latency import-bound).  The batched
(nelm, 6, 6) block construction + one scatter-add mirrors the truss
stack's shape so a traced jnp twin can follow the established
host-mirror pattern when a differentiable frame path is needed.

Element matrices (local axes, DOFs [u1 v1 θ1 u2 v2 θ2], standard
closed forms):

    axial     EA/L  ·  [[1, −1], [−1, 1]]                 on (u1, u2)
    bending   EI/L³ ·  [[ 12,  6L, −12,  6L],
                        [ 6L, 4L², −6L, 2L²],
                        [−12, −6L,  12, −6L],
                        [ 6L, 2L², −6L, 4L²]]     on (v1, θ1, v2, θ2)
    mass      ρAL/420 · consistent (156/22L/54/−13L …) + axial 2/1 ρAL/6
    geometric N/(30L) · (36/3L/−36/3L …)          (P-Δ, buckling)

Verification anchors are ALL textbook closed forms: cantilever
PL³/3EI and PL²/2EI (exact, one element), simply-supported PL³/48EI,
the cantilever frequency (β₁L)² = 1.8751² with consistent-mass
convergence from above, and Euler column buckling π²EI/(KL)² for
pinned-pinned (K=1) and clamped-free (K=2) columns.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class FrameProblem:
    """2D frame: nodes (n, 2), elements (m, 2), per-element E/A/I/rho
    (scalars broadcast), nodal loads (3n,) as [Fx, Fy, M]*n, fixed
    DOFs on the 3-DOF-per-node numbering u_i = 3i, v_i = 3i+1,
    θ_i = 3i+2; optional per-node translational point masses."""
    nodes: np.ndarray
    elements: np.ndarray
    young: np.ndarray          # (m,) or scalar
    area: np.ndarray
    inertia: np.ndarray        # second moment I
    density: np.ndarray
    loads: np.ndarray          # (3n,)
    fixed_dofs: np.ndarray
    point_masses: Optional[np.ndarray] = None   # (n,) translational
    # (m, 2) uniform distributed member loads [wx, wy] in GLOBAL axes
    # (force/length) — converted to consistent nodal loads and the
    # fixed-end corrections the member-force recovery needs.
    member_loads: Optional[np.ndarray] = None
    # (m,) elastic section modulus S = I/c (scalar broadcast) — enables
    # extreme-fiber stress recovery sigma = |N|/A + |M|/S.
    section_modulus: Optional[np.ndarray] = None
    # Thermal load case (STATIC only — dynamic paths refuse it):
    # alpha_cte (m,) CTE; temperature (m,) uniform member ΔT (axial
    # expansion); temperature_gradient (m,) through-depth dT/dy
    # (thermal curvature κ = α dT/dy — bowing / restraint moments).
    alpha_cte: Optional[np.ndarray] = None
    temperature: Optional[np.ndarray] = None
    temperature_gradient: Optional[np.ndarray] = None

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=float)
        self.elements = np.asarray(self.elements, dtype=int)
        m = self.elements.shape[0]
        for name in ("young", "area", "inertia", "density"):
            v = np.broadcast_to(
                np.asarray(getattr(self, name), dtype=float), (m,))
            setattr(self, name, np.array(v))
        self.loads = np.asarray(self.loads, dtype=float)
        self.fixed_dofs = np.asarray(self.fixed_dofs,
                                     dtype=int).reshape(-1)
        if self.nodes.ndim != 2 or self.nodes.shape[1] != 2:
            raise ValueError("frame nodes must be (n, 2)")
        if self.loads.shape != (3 * self.nnode,):
            raise ValueError(f"frame loads must be (3*{self.nnode},)")
        if self.fixed_dofs.size and (self.fixed_dofs.min() < 0
                                     or self.fixed_dofs.max()
                                     >= self.ndof):
            raise ValueError("fixed_dofs out of range")
        if self.point_masses is not None:
            self.point_masses = np.broadcast_to(
                np.asarray(self.point_masses, dtype=float),
                (self.nnode,)).copy()
        if self.member_loads is not None:
            self.member_loads = np.broadcast_to(
                np.asarray(self.member_loads, dtype=float),
                (self.nelm, 2)).copy()
        if self.section_modulus is not None:
            self.section_modulus = np.broadcast_to(
                np.asarray(self.section_modulus, dtype=float),
                (self.nelm,)).copy()
            if np.any(self.section_modulus <= 0.0):
                raise ValueError("section_modulus must be positive")
        if (self.temperature is not None
                or self.temperature_gradient is not None) \
                and self.alpha_cte is None:
            raise ValueError('a thermal load case needs the thermal '
                             'expansion coefficient (material '
                             '"alpha")')
        for name in ("alpha_cte", "temperature",
                     "temperature_gradient"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, np.broadcast_to(
                    np.asarray(v, dtype=float), (self.nelm,)).copy())
        if np.any(_geometry(self)[0] <= 0.0):
            raise ValueError("zero-length frame element")

    @property
    def nnode(self) -> int:
        return self.nodes.shape[0]

    @property
    def nelm(self) -> int:
        return self.elements.shape[0]

    @property
    def ndof(self) -> int:
        return 3 * self.nnode

    def free_mask(self) -> np.ndarray:
        m = np.ones(self.ndof)
        m[self.fixed_dofs] = 0.0
        return m

    def dof_map(self) -> np.ndarray:
        """(m, 6) global DOF indices per element."""
        i, j = self.elements[:, 0], self.elements[:, 1]
        return np.stack([3 * i, 3 * i + 1, 3 * i + 2,
                         3 * j, 3 * j + 1, 3 * j + 2], axis=1)


def _geometry(problem: FrameProblem):
    d = problem.nodes[problem.elements[:, 1]] \
        - problem.nodes[problem.elements[:, 0]]
    length = np.hypot(d[:, 0], d[:, 1])
    with np.errstate(invalid="ignore", divide="ignore"):
        c = np.where(length > 0.0, d[:, 0] / length, 1.0)
        s = np.where(length > 0.0, d[:, 1] / length, 0.0)
    return length, c, s


def _rotation(c, s):
    """(m, 6, 6) local <- global transformation."""
    m = c.shape[0]
    t = np.zeros((m, 6, 6))
    for off in (0, 3):
        t[:, off + 0, off + 0] = c
        t[:, off + 0, off + 1] = s
        t[:, off + 1, off + 0] = -s
        t[:, off + 1, off + 1] = c
        t[:, off + 2, off + 2] = 1.0
    return t


_BEND = (1, 2, 4, 5)      # (v1, θ1, v2, θ2) rows/cols


def _fill_bending(mat, block):
    for a, ia in enumerate(_BEND):
        for b, ib in enumerate(_BEND):
            mat[:, ia, ib] += block[:, a, b]


def _k_local(young, area, inertia, length):
    """(m, 6, 6) local stiffness (standard closed form)."""
    m = length.shape[0]
    ea = young * area / length
    ei = young * inertia
    k = np.zeros((m, 6, 6))
    k[:, 0, 0] = k[:, 3, 3] = ea
    k[:, 0, 3] = k[:, 3, 0] = -ea
    b12 = 12.0 * ei / length ** 3
    b6 = 6.0 * ei / length ** 2
    b4 = 4.0 * ei / length
    b2 = 2.0 * ei / length
    bb = np.stack([
        np.stack([b12, b6, -b12, b6], axis=-1),
        np.stack([b6, b4, -b6, b2], axis=-1),
        np.stack([-b12, -b6, b12, -b6], axis=-1),
        np.stack([b6, b2, -b6, b4], axis=-1)], axis=-2)
    _fill_bending(k, bb)
    return k


def _m_local(density, area, length):
    """(m, 6, 6) consistent mass (ρAL/420 closed form + axial ρAL/6)."""
    m = length.shape[0]
    rho_al = density * area * length
    mm = np.zeros((m, 6, 6))
    ax = rho_al / 6.0
    mm[:, 0, 0] = mm[:, 3, 3] = 2.0 * ax
    mm[:, 0, 3] = mm[:, 3, 0] = ax
    f = rho_al / 420.0
    l1 = length
    bb = np.stack([
        np.stack([156.0 * f, 22.0 * f * l1, 54.0 * f,
                  -13.0 * f * l1], axis=-1),
        np.stack([22.0 * f * l1, 4.0 * f * l1 ** 2, 13.0 * f * l1,
                  -3.0 * f * l1 ** 2], axis=-1),
        np.stack([54.0 * f, 13.0 * f * l1, 156.0 * f,
                  -22.0 * f * l1], axis=-1),
        np.stack([-13.0 * f * l1, -3.0 * f * l1 ** 2, -22.0 * f * l1,
                  4.0 * f * l1 ** 2], axis=-1)], axis=-2)
    _fill_bending(mm, bb)
    return mm


def _kg_local(axial_n, length):
    """(m, 6, 6) geometric stiffness from member axial force N
    (tension positive; N/(30L) closed form)."""
    m = length.shape[0]
    f = axial_n / (30.0 * length)
    l1 = length
    kg = np.zeros((m, 6, 6))
    bb = np.stack([
        np.stack([36.0 * f, 3.0 * f * l1, -36.0 * f,
                  3.0 * f * l1], axis=-1),
        np.stack([3.0 * f * l1, 4.0 * f * l1 ** 2, -3.0 * f * l1,
                  -f * l1 ** 2], axis=-1),
        np.stack([-36.0 * f, -3.0 * f * l1, 36.0 * f,
                  -3.0 * f * l1], axis=-1),
        np.stack([3.0 * f * l1, -f * l1 ** 2, -3.0 * f * l1,
                  4.0 * f * l1 ** 2], axis=-1)], axis=-2)
    _fill_bending(kg, bb)
    return kg


def _member_load_vectors(problem: FrameProblem):
    """(f_nodal (3n,), f_fixed_local (m, 6)) for uniform member loads.

    A uniform local transverse load w gives the classic consistent
    (fixed-end) vector [wL/2, wL²/12] at each end (moments opposing),
    and a uniform local axial load q gives qL/2 axially.  The HERMITE
    exact-at-nodes property makes the resulting NODAL displacements
    exact for uniform loads too — wL⁴/8EI with one element
    (tests/test_frame.py).  Member end forces then need the fixed-end
    correction f_local = k_local T u_e − f_fixed_local."""
    if problem.member_loads is None:
        return np.zeros(problem.ndof), np.zeros((problem.nelm, 6))
    length, c, s_ = _geometry(problem)
    wx, wy = problem.member_loads[:, 0], problem.member_loads[:, 1]
    # Global (wx, wy) -> local (axial q, transverse w).
    q = c * wx + s_ * wy
    w = -s_ * wx + c * wy
    f_loc = np.zeros((problem.nelm, 6))
    f_loc[:, 0] = q * length / 2.0
    f_loc[:, 3] = q * length / 2.0
    f_loc[:, 1] = w * length / 2.0
    f_loc[:, 4] = w * length / 2.0
    f_loc[:, 2] = w * length ** 2 / 12.0
    f_loc[:, 5] = -w * length ** 2 / 12.0
    t = _rotation(c, s_)
    f_glob = np.einsum("mji,mj->mi", t, f_loc)     # Tᵀ f_local
    f = np.zeros(problem.ndof)
    np.add.at(f, problem.dof_map(), f_glob)
    return f, f_loc


def _thermal_member_vectors(problem: FrameProblem):
    """(f_nodal (3n,), f_fixed_local (m, 6)) of the thermal load case.

    Uniform member ΔT: free axial expansion ε_th = αΔT gives the
    equivalent nodal pair EAαΔT [−1, 0, 0, +1, 0, 0] (ends pushed
    OUTWARD); a fully restrained member then recovers the textbook
    compression N = −EAαΔT, a free one expands stress-free — both
    exact with one element (Hermite/linear shapes, nodal loading).

    Through-depth gradient dT/dy: thermal curvature κ = α dT/dy gives
    the end-moment pair EIκ [0, 0, −1, 0, 0, +1]; clamped-clamped
    recovers the uniform restraint moment |M| = EIκ with zero
    deflection, a cantilever bows to v(L) = κL²/2 stress-free.

    Same contract as _member_load_vectors: the recovery subtracts
    f_fixed_local from k_local T u_e."""
    if problem.temperature is None \
            and problem.temperature_gradient is None:
        return np.zeros(problem.ndof), np.zeros((problem.nelm, 6))
    length, c, s_ = _geometry(problem)
    f_loc = np.zeros((problem.nelm, 6))
    if problem.temperature is not None:
        na = problem.young * problem.area * problem.alpha_cte \
            * problem.temperature                       # EAαΔT (m,)
        f_loc[:, 0] -= na
        f_loc[:, 3] += na
    if problem.temperature_gradient is not None:
        mk = problem.young * problem.inertia * problem.alpha_cte \
            * problem.temperature_gradient              # EIκ (m,)
        f_loc[:, 2] -= mk
        f_loc[:, 5] += mk
    t = _rotation(c, s_)
    f_glob = np.einsum("mji,mj->mi", t, f_loc)     # Tᵀ f_local
    f = np.zeros(problem.ndof)
    np.add.at(f, problem.dof_map(), f_glob)
    return f, f_loc


def _require_no_thermal_frame(problem: FrameProblem, kind: str):
    """models/plane.py:_require_no_thermal, frame twin."""
    if problem.temperature is not None \
            or problem.temperature_gradient is not None:
        raise ValueError(
            f"frame {kind} does not take a thermal load case — "
            "thermoelastic loads are static; use analysis type "
            '"static" (or "modal"/"buckling" with prestress, which '
            "inherit ΔT through the static state)")


def _assemble(problem: FrameProblem, blocks: np.ndarray) -> np.ndarray:
    """(m, 6, 6) global-axes blocks -> dense (ndof, ndof)."""
    dm = problem.dof_map()
    k = np.zeros((problem.ndof, problem.ndof))
    np.add.at(k, (dm[:, :, None], dm[:, None, :]), blocks)
    return k


def frame_matrices(problem: FrameProblem, with_mass: bool = True):
    """(K, M) dense global matrices (M None unless with_mass) — the
    one assembly every frame solver shares (host float64)."""
    length, c, s = _geometry(problem)
    t = _rotation(c, s)
    kl = _k_local(problem.young, problem.area, problem.inertia, length)
    kg = np.einsum("mji,mjk,mkl->mil", t, kl, t)
    k = _assemble(problem, kg)
    mmat = None
    if with_mass:
        ml = _m_local(problem.density, problem.area, length)
        mg = np.einsum("mji,mjk,mkl->mil", t, ml, t)
        mmat = _assemble(problem, mg)
        if problem.point_masses is not None:
            pm = np.zeros(problem.ndof)
            pm[0::3] += problem.point_masses
            pm[1::3] += problem.point_masses
            mmat = mmat + np.diag(pm)
    return k, mmat


@dataclass
class FrameStaticResult:
    displacements: np.ndarray      # (3n,)
    member_end_forces: np.ndarray  # (m, 6) LOCAL [N1,V1,M1,N2,V2,M2]
    axial: np.ndarray              # (m,) axial force (tension +)
    moments: np.ndarray            # (m, 2) end bending moments
    reactions: np.ndarray          # (3n,) K u − f on fixed DOFs
    # (m,) extreme-fiber combined stress |N|/A + max|M|/S (None unless
    # the problem carries a section_modulus).
    max_stress: Optional[np.ndarray] = None


def solve_frame_static(problem: FrameProblem) -> FrameStaticResult:
    """Dense masked static solve + local member end-force recovery.

    Euler-Bernoulli with cubic Hermite shapes is EXACT for nodal
    loads, so the cantilever anchors hold to machine precision with
    one element (tests/test_frame.py)."""
    k, _ = frame_matrices(problem, with_mass=False)
    mask = problem.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    f_member, f_fixed = _member_load_vectors(problem)
    f_th, f_th_fixed = _thermal_member_vectors(problem)
    f_member, f_fixed = f_member + f_th, f_fixed + f_th_fixed
    f = problem.loads + f_member
    u = np.linalg.solve(km, f * mask) * mask

    length, c, s = _geometry(problem)
    t = _rotation(c, s)
    kl = _k_local(problem.young, problem.area, problem.inertia, length)
    u_loc = np.einsum("mij,mj->mi", t, u[problem.dof_map()])
    f_loc = np.einsum("mij,mj->mi", kl, u_loc) - f_fixed
    reactions = (k @ u - f) * (1.0 - mask)
    max_stress = None
    if problem.section_modulus is not None:
        # Extreme-fiber combined stress at the governing end: the end
        # moments bound |M(x)| for nodal loading (M is linear between
        # ends); with member loads the parabolic interior can exceed
        # them slightly — the standard end-check convention.
        axial_n = -f_loc[:, 0]
        m_max = np.max(np.abs(f_loc[:, [2, 5]]), axis=1)
        max_stress = np.abs(axial_n) / problem.area \
            + m_max / problem.section_modulus
    return FrameStaticResult(
        displacements=u,
        member_end_forces=f_loc,
        axial=-f_loc[:, 0],           # node-1 local x force: tension +
        moments=f_loc[:, [2, 5]],
        reactions=reactions,
        max_stress=max_stress)


@dataclass
class FrameModalResult:
    frequencies_hz: np.ndarray
    omegas: np.ndarray
    eigenvalues: np.ndarray
    mode_shapes: np.ndarray        # (n_modes, 3n)


def frame_geometric_stiffness(problem: FrameProblem,
                              u: np.ndarray) -> np.ndarray:
    """Dense P-Δ geometric stiffness K_g(N(u)): member axial forces
    recovered from the displacement state u (the solve_frame_static
    recovery), then the standard cubic-Hermite K_g blocks
    (frame_buckling's assembly exposed for prestressed modal)."""
    length, c, s = _geometry(problem)
    t = _rotation(c, s)
    kl = _k_local(problem.young, problem.area, problem.inertia,
                  length)
    _, f_fixed = _member_load_vectors(problem)
    f_fixed = f_fixed + _thermal_member_vectors(problem)[1]
    u_loc = np.einsum("mij,mj->mi", t,
                      np.asarray(u, dtype=float)[problem.dof_map()])
    f_loc = np.einsum("mij,mj->mi", kl, u_loc) - f_fixed
    kgl = _kg_local(-f_loc[:, 0], length)
    return _assemble(problem,
                     np.einsum("mji,mjk,mkl->mil", t, kgl, t))


def frame_modal(problem: FrameProblem,
                n_modes: int = 4,
                prestress_u=None) -> FrameModalResult:
    """Generalized K φ = λ M φ on the free block (consistent mass) —
    dense host-tier eigensolve, like the truss analysis family below
    DENSE_DOF_LIMIT.

    prestress_u: optional displacement state u0 adding the P-Δ
    geometric stiffness K_g(N(u0)) — tension stiffens, compression
    softens toward the frame_buckling factor."""
    import scipy.linalg

    k, m = frame_matrices(problem)
    if prestress_u is not None:
        k = k + frame_geometric_stiffness(problem, prestress_u)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    n_modes = min(n_modes, lam.size)
    lam = np.maximum(lam[:n_modes], 0.0)
    shapes = np.zeros((n_modes, problem.ndof))
    shapes[:, free] = vec[:, :n_modes].T
    om = np.sqrt(lam)
    return FrameModalResult(frequencies_hz=om / (2.0 * np.pi),
                            omegas=om, eigenvalues=lam,
                            mode_shapes=shapes)


@dataclass
class FrameBucklingResult:
    load_factors: np.ndarray       # ascending positive λ_cr
    modes: np.ndarray              # (n_modes, 3n)
    axial: np.ndarray              # (m,) member N at unit load


def frame_buckling(problem: FrameProblem,
                   n_modes: int = 2) -> FrameBucklingResult:
    """Linearized (P-Δ) buckling: statics gives member axial forces N,
    K_g(N) is assembled, and (K + λ K_g) φ = 0 on the free block —
    λ_cr scales the APPLIED LOAD PATTERN (Euler columns hit
    π²EI/(KL)² with mesh refinement, tests/test_frame.py)."""
    import scipy.linalg

    stat = solve_frame_static(problem)
    length, c, s = _geometry(problem)
    t = _rotation(c, s)
    kgl = _kg_local(stat.axial, length)
    kg = _assemble(problem, np.einsum("mji,mjk,mkl->mil", t, kgl, t))
    k, _ = frame_matrices(problem, with_mass=False)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf = k[np.ix_(free, free)]
    gf = kg[np.ix_(free, free)]
    # K φ = λ (−K_g) φ: positive λ are the destabilizing factors.
    lam, vec = scipy.linalg.eig(kf, -gf)
    good = np.isfinite(lam) & (np.abs(np.imag(lam))
                               <= 1e-8 * np.abs(lam)) \
        & (np.real(lam) > 1e-9)
    lam_r = np.real(lam[good])
    order = np.argsort(lam_r)[:n_modes]
    modes = np.zeros((order.size, problem.ndof))
    modes[:, free] = np.real(vec[:, good][:, order]).T
    return FrameBucklingResult(load_factors=lam_r[order], modes=modes,
                               axial=stat.axial)


@dataclass
class FrameTransientResult:
    times: np.ndarray
    displacements: np.ndarray      # (n_rec, n_probe)
    dt: float
    n_steps: int


def solve_frame_transient(problem: FrameProblem, dt: float,
                          n_steps: int, damping=(0.0, 0.0),
                          amplitude=None, probe_dofs=None,
                          record_every: int = 1
                          ) -> FrameTransientResult:
    """Newmark (average acceleration, unconditionally stable) on the
    dense frame K/M — one LU factorization of the effective operator
    serves every step (host float64, the frame family's tier).

    amplitude: (n_steps,) load-scale history a(t) multiplying the
    problem's nodal + member loads (None = unit step).  Rayleigh
    C = αM + βK.  Cross-validated against exact modal superposition
    of the undamped step response (tests/test_frame.py).
    """
    import scipy.linalg

    if dt <= 0.0 or n_steps <= 0:
        raise ValueError("transient needs positive dt and n_steps")
    _require_no_thermal_frame(problem, "transient")
    k, m = frame_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f_member, _ = _member_load_vectors(problem)
    f0 = problem.loads + f_member
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
    a_acc = np.linalg.solve(mf + 1e-300 * np.eye(n),
                            ff * amp[0] - cf @ v - kf @ u)         if n else np.zeros(0)
    rec_t, rec_u = [], []
    full = np.zeros(problem.ndof)
    for step in range(n_steps):
        # State advances to t = (step+1)·dt, so the forcing is
        # a((step+1)·dt) — the truss Newmark's amp[i+1] convention
        # (solvers/dynamics.py); the final step holds the last value.
        f_t = ff * amp[min(step + 1, n_steps - 1)]
        rhs = f_t + mf @ (a0 * u + 2.0 * a1 * v + a_acc)             + cf @ (a1 * u + v)
        u_new = scipy.linalg.lu_solve(lu, rhs)
        v_new = a1 * (u_new - u) - v
        a_new = a0 * (u_new - u) - 2.0 * a1 * v - a_acc
        u, v, a_acc = u_new, v_new, a_new
        if step % record_every == 0:
            full[free] = u
            rec_t.append((step + 1) * dt)
            rec_u.append(full[probe].copy())
    return FrameTransientResult(
        times=np.asarray(rec_t), displacements=np.asarray(rec_u),
        dt=float(dt), n_steps=int(n_steps))


# --------------------------------------------------------------------
# Traced twin (jnp): the differentiable frame statics the inverse
# families ride — the same host-mirror discipline as ops/host.py, in
# the opposite direction (here the HOST numpy path above is the
# authority and the traced path mirrors it; tests/test_frame.py pins
# them 1:1).


def frame_static_response(problem: "FrameProblem", young_e=None,
                          area_e=None, inertia_e=None, loads=None,
                          load_scale=None, dtype=None):
    """Traced, differentiable frame statics with per-element
    properties.

    Returns (u, end_moments, axial): the masked dense solve
    K(E, A, I) u = f plus the local member-force recovery — every
    output differentiable w.r.t. the traced property arrays, so one
    reverse pass is the adjoint for all members (the truss sizing/
    identification machinery's pattern).  Distributed member loads are
    folded in exactly like the host path (consistent vector +
    fixed-end correction).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.asarray(1.0).dtype
    m = problem.nelm
    length_np, c_np, s_np = _geometry(problem)
    length = jnp.asarray(length_np, dtype)
    c = jnp.asarray(c_np, dtype)
    s = jnp.asarray(s_np, dtype)
    young = jnp.broadcast_to(jnp.asarray(
        problem.young if young_e is None else young_e, dtype), (m,))
    area = jnp.broadcast_to(jnp.asarray(
        problem.area if area_e is None else area_e, dtype), (m,))
    inertia = jnp.broadcast_to(jnp.asarray(
        problem.inertia if inertia_e is None else inertia_e, dtype),
        (m,))

    # local stiffness blocks (jnp mirror of _k_local)
    ea = young * area / length
    ei = young * inertia
    z = jnp.zeros_like(length)
    b12 = 12.0 * ei / length ** 3
    b6 = 6.0 * ei / length ** 2
    b4 = 4.0 * ei / length
    b2 = 2.0 * ei / length
    rows = []
    rows.append(jnp.stack([ea, z, z, -ea, z, z], axis=-1))
    rows.append(jnp.stack([z, b12, b6, z, -b12, b6], axis=-1))
    rows.append(jnp.stack([z, b6, b4, z, -b6, b2], axis=-1))
    rows.append(jnp.stack([-ea, z, z, ea, z, z], axis=-1))
    rows.append(jnp.stack([z, -b12, -b6, z, b12, -b6], axis=-1))
    rows.append(jnp.stack([z, b6, b2, z, -b6, b4], axis=-1))
    kl = jnp.stack(rows, axis=-2)                    # (m, 6, 6)

    # rotation (jnp mirror of _rotation)
    one = jnp.ones_like(c)
    r3 = jnp.stack([
        jnp.stack([c, s, z], axis=-1),
        jnp.stack([-s, c, z], axis=-1),
        jnp.stack([z, z, one], axis=-1)], axis=-2)
    t = jnp.zeros((m, 6, 6), dtype)
    t = t.at[:, :3, :3].set(r3)
    t = t.at[:, 3:, 3:].set(r3)

    # precision="highest": TPU dot_general defaults to bf16 on the
    # MXU; ~1e-2 rounding makes T' K T lose symmetry (measured
    # PCG breakdown on the plane family, models/plane.py:_einsum).
    kg_blocks = jnp.einsum("mji,mjk,mkl->mil", t, kl, t,
                           precision="highest")
    dm = jnp.asarray(problem.dof_map())
    k = jnp.zeros((problem.ndof, problem.ndof), dtype).at[
        dm[:, :, None], dm[:, None, :]].add(kg_blocks)

    f_member_np, f_fixed_np = _member_load_vectors(problem)
    if loads is None:
        f = jnp.asarray(problem.loads + f_member_np, dtype)
        f_fixed = jnp.asarray(f_fixed_np, dtype)
    else:
        # An explicit override REPLACES the load model entirely — the
        # member-load consistent vector is not applied, so its
        # fixed-end correction must not be subtracted either.
        f = jnp.asarray(loads, dtype)
        f_fixed = jnp.zeros((m, 6), dtype)
    if load_scale is not None:
        # A traced scalar scaling the WHOLE load model — nodal loads,
        # member consistent vector AND its fixed-end correction stay
        # consistent (the reliability load_scale variable's route; an
        # explicit `loads` override with a separate scale would lose
        # the correction, the measured non-conservative-stress bug).
        scale = jnp.asarray(load_scale, dtype)
        f = f * scale
        f_fixed = f_fixed * scale
    mask = jnp.asarray(problem.free_mask(), dtype)
    km = mask[:, None] * k * mask[None, :] + jnp.diag(1.0 - mask)
    u = jnp.linalg.solve(km, f * mask) * mask

    u_loc = jnp.einsum("mij,mj->mi", t, u[dm], precision="highest")
    f_loc = jnp.einsum("mij,mj->mi", kl, u_loc,
                       precision="highest") - f_fixed
    return u, f_loc[:, jnp.array([2, 5])], -f_loc[:, 0]


def identify_frame_properties(problem: "FrameProblem", measured_dofs,
                              measured_disp, param: str = "inertia",
                              n_iter: int = 400,
                              learning_rate: float = 0.05):
    """Recover per-element frame properties from measured static
    displacements — the reference's flagship inverse (material from
    displacements) carried to BENDING structures.

    param "inertia" recovers the per-element I profile (with E fixed:
    bending response determines only the PRODUCT EI, the frame
    counterpart of the truss EA degeneracy — recovering I at known E
    is that product); "young" recovers E per element (A, I fixed).
    ADAM on log-parameters through the traced solve; returns
    (values (m,), loss_history).
    """
    import jax
    import jax.numpy as jnp
    import optax

    if param not in ("inertia", "young"):
        raise ValueError('param must be "inertia" or "young"')
    meas_np = np.asarray(measured_disp, dtype=float)
    meas_idx = jnp.asarray(np.asarray(measured_dofs, dtype=int))
    meas = jnp.asarray(meas_np)
    # Normalize the loss by the measurement scale (the framework-wide
    # ADAM-stall fix, cf. identify_plate_young: SI-unit micro-scale
    # deflections put raw-MSE gradients under ADAM's eps and the
    # optimizer crawls instead of converging).
    scale = float(np.max(np.abs(meas_np))) or 1.0
    base = getattr(problem, param)
    log0 = jnp.log(jnp.asarray(base))

    def loss_fn(log_p):
        vals = jnp.exp(log_p)
        kw = {f"{param}_e": vals}
        u, _, _ = frame_static_response(problem, **kw)
        return jnp.mean(((u[meas_idx] - meas) / scale) ** 2)

    opt = optax.adam(learning_rate)
    state = opt.init(log0)
    log_p = log0
    hist = []

    @jax.jit
    def step(log_p, state):
        loss, g = jax.value_and_grad(loss_fn)(log_p)
        updates, state = opt.update(g, state)
        return optax.apply_updates(log_p, updates), state, loss

    for _ in range(n_iter):
        log_p, state, loss = step(log_p, state)
        hist.append(float(loss))
    return np.asarray(jnp.exp(log_p)), np.asarray(hist)


@dataclass
class FrameHarmonicResult:
    omegas: np.ndarray
    amplitude: np.ndarray          # (n_freq, n_probe) |X|
    real: np.ndarray
    imag: np.ndarray


def frame_harmonic(problem: FrameProblem, omegas,
                   damping=(0.0, 0.0), probe_dofs=None
                   ) -> FrameHarmonicResult:
    """Steady-state X(ω) to the frame's load pattern: direct dense
    complex solves (K − ω²M + iωC) X = f per frequency, host float64.
    Rayleigh C = αM + βK.  With proportional damping this equals the
    ALL-modes superposition Σ φφᵀf/(m_j(ω_j²−ω²+iω(α+βω_j²)))
    EXACTLY — the 1e-8 cross-check in tests/test_frame.py."""
    om = np.asarray(omegas, dtype=float).reshape(-1)
    _require_no_thermal_frame(problem, "harmonic")
    k, m = frame_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f_member, _ = _member_load_vectors(problem)
    f0 = problem.loads + f_member
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
    return FrameHarmonicResult(omegas=om, amplitude=np.abs(xs),
                               real=xs.real, imag=xs.imag)


def _al_minimize(obj_g, t0, n_con, n_iter, outer_rounds, penalty,
                 learning_rate):
    """Shared augmented-Lagrangian ADAM driver (Rockafellar
    multipliers, fresh optimizer state + halved lr per outer round —
    the truss sizing family's measured recipe).  obj_g(t) returns
    (objective, constraint vector g ≤ 0).  Returns (t, history)."""
    import jax
    import jax.numpy as jnp
    import optax

    def loss_fn(t, lam, mu):
        obj, g = obj_g(t)
        return obj + mu * jnp.sum(
            jnp.maximum(g + lam / (2.0 * mu), 0.0) ** 2)

    opt = optax.adam(1.0)

    @jax.jit
    def gd_step(t, state, lam, mu, lr):
        loss, grad = jax.value_and_grad(loss_fn)(t, lam, mu)
        updates, state = opt.update(grad, state)
        return t + lr * jnp.asarray(updates), state, loss

    @jax.jit
    def lam_update(t, lam, mu):
        _, g = obj_g(t)
        return jnp.maximum(lam + 2.0 * mu * g, 0.0)

    lam = jnp.zeros(n_con)
    mu = jnp.asarray(float(penalty))
    t = t0
    hist = []
    for r in range(outer_rounds):
        lr = jnp.asarray(learning_rate * 0.5 ** r)
        state = opt.init(t)
        for _ in range(n_iter):
            t, state, loss = gd_step(t, state, lam, mu, lr)
            hist.append(float(loss))
        lam = lam_update(t, lam, mu)
        mu = 2.0 * mu
    return t, np.asarray(hist)


def optimize_frame_inertia(problem: FrameProblem,
                           displacement_limit: float,
                           probe_dofs,
                           weight_exponent: float = 0.5,
                           min_inertia: float = 1e-8,
                           n_iter: int = 300, outer_rounds: int = 4,
                           penalty: float = 10.0,
                           learning_rate: float = 0.05):
    """Minimum-weight inertia profile under a deflection limit — the
    sizing family's augmented-Lagrangian recipe on the traced frame
    twin.

    Weight model: section area ∝ I^q (q = `weight_exponent`; 0.5 for
    geometrically similar solid sections where I ∝ A², matching the
    truss family's buckling_shape_factor convention), so the objective
    is Σ I_e^q L_e.  Constraint |u_p| ≤ limit on `probe_dofs` via
    Rockafellar multipliers (the measured truss lesson: no penalty
    ramp), log-parameterized I ≥ min_inertia.

    Anchors (tests/test_frame.py): a single design variable has the
    closed form I* = PL³/(3E·v_lim) (the constraint is monotone and
    binds), and the per-element profile ties scipy SLSQP with exact
    constraints.  Returns (inertia (m,), weight, history).
    """
    import jax
    import jax.numpy as jnp
    import optax

    if displacement_limit <= 0.0:
        raise ValueError("displacement_limit must be positive")
    probe = jnp.asarray(np.asarray(probe_dofs, dtype=int).reshape(-1))
    length_np = _geometry(problem)[0]
    lengths = jnp.asarray(length_np)
    q = float(weight_exponent)
    # Clamp the start ABOVE the gauge (an initial I below min_inertia
    # would make log(I − min) NaN and poison the whole run).
    i_start = np.maximum(np.asarray(problem.inertia),
                         min_inertia * (1.0 + 1e-9))
    t0 = jnp.log(jnp.asarray(i_start) - min_inertia)
    w0 = float(np.sum(i_start ** q * length_np))

    def weight_of(i_e):
        return jnp.sum(i_e ** q * lengths) / w0

    def obj_g(t):
        i_e = min_inertia + jnp.exp(t)
        u, _, _ = frame_static_response(problem, inertia_e=i_e)
        g = jnp.abs(u[probe]) / displacement_limit - 1.0
        return weight_of(i_e), g

    t, hist = _al_minimize(obj_g, t0, int(probe.shape[0]), n_iter,
                           outer_rounds, penalty, learning_rate)
    i_e = np.asarray(jax.device_get(min_inertia + jnp.exp(t)),
                     dtype=float)
    # Feasibility polish: the deflection is monotone decreasing in a
    # UNIFORM inertia scale (stiffer everywhere -> smaller u), so scale
    # up by the worst ratio until the limit holds (host f64 check).
    for _ in range(20):
        st = solve_frame_static(FrameProblem(
            problem.nodes, problem.elements, problem.young,
            problem.area, i_e, problem.density, problem.loads,
            problem.fixed_dofs, problem.point_masses,
            problem.member_loads))
        ratio = float(np.max(np.abs(
            st.displacements[np.asarray(probe_dofs, dtype=int)]))
            / displacement_limit)
        if ratio <= 1.0 + 1e-9:
            break
        i_e = i_e * ratio
    else:
        # Axial (inertia-independent) deformation sets a deflection
        # floor the I-scaling cannot cross — fail loudly instead of
        # returning an infeasible design.
        raise ValueError(
            f"displacement_limit {displacement_limit} unreachable by "
            f"inertia scaling (residual ratio {ratio:.3f}) — the "
            f"probe deflection has an axial component EA cannot "
            f"reduce; raise the limit or size areas too")
    weight = float(np.sum(i_e ** q * length_np))
    return i_e, weight, np.asarray(hist)


def frame_reliability(problem: FrameProblem, variables, limit_state,
                      n_iter: int = 50, tol: float = 1e-4,
                      mc_samples: int = 0, mc_seed: int = 0,
                      correlation=None):
    """FORM on the FRAME family: displacement and extreme-fiber stress
    limit states through the traced frame twin, delegating to the
    reliability module's shared `form_core` driver (marginal
    transforms, Nataf copula, HL-RF, unreachable-surface reset,
    Ditlevsen bounds, crude MC).

    Variable kinds: young / inertia / area over element subsets
    ("inertia" is frame-specific; "density" is rejected — it does not
    enter frame statics), a global load_scale, and a resistance for
    stress limit states.  Limit states:
    {"type": "displacement", "limit": d, "probe_dofs": [..]} or
    {"type": "stress", "limit": R | "variable": name,
     "elements": [..]} (needs the problem's section_modulus).

    EXACT anchors (tests/test_frame.py): the cantilever tip deflection
    v = PL³/(3EI) makes the three-variable lognormal (E, I, S) β
    closed-form, and the determinate root stress (PL/S)·scale drops E
    and I entirely for the textbook log-linear R−S β.
    """
    import jax.numpy as jnp

    from ..solvers.reliability import (_nataf_cholesky, _physical,
                                       form_core)
    from ..solvers.reliability import _parse_variables as _pv

    m = problem.nelm
    # Reuse the truss parser by aliasing "inertia" onto its "density"
    # slot (same shape: a per-element material field with an optional
    # element subset); the alias is purely internal.  True "density"
    # is rejected — it does not enter frame statics.
    alias = []
    kinds = []
    for spec in variables or ():
        sp = dict(spec)
        if sp.get("kind") == "density":
            raise ValueError('"density" does not enter frame statics '
                             '— use young / inertia / area / '
                             'load_scale / resistance')
        kinds.append(sp.get("kind"))
        if sp.get("kind") == "inertia":
            sp["kind"] = "density"
        alias.append(sp)
    varspecs = _pv(alias, m)
    for v, orig_kind in zip(varspecs, kinds):
        v["kind"] = orig_kind
    n_vars = len(varspecs)
    chol = _nataf_cholesky(varspecs, correlation)
    dtype = jnp.asarray(1.0).dtype
    chol_d = None if chol is None else jnp.asarray(chol, dtype)
    masks = {i: jnp.asarray(v["mask"], dtype)
             for i, v in enumerate(varspecs) if v["mask"] is not None}

    ls = dict(limit_state or {})
    ls_type = ls.get("type", "displacement")
    var_names = [v["name"] for v in varspecs]
    res_var = None
    if ls_type == "displacement":
        if ls.get("limit") is None or ls.get("probe_dofs") is None:
            raise ValueError('frame displacement limit state needs '
                             '"limit" and "probe_dofs"')
        limit = float(ls["limit"])
        probe = np.asarray(ls["probe_dofs"], dtype=int).reshape(-1)
        if probe.size and (probe.min() < 0
                           or probe.max() >= problem.ndof):
            raise ValueError("probe_dofs out of range")
        labels = [f"displacement dof{int(d)}" for d in probe]
    elif ls_type == "stress":
        # Extreme-fiber combined stress |N|/A + |M|/S per member — the
        # section_modulus unlocks it (solve_frame_static's recovery).
        if problem.section_modulus is None:
            raise ValueError("frame stress limit state needs the "
                             "problem's section_modulus")
        if ls.get("variable") is not None:
            rn = ls["variable"]
            if rn not in var_names:
                raise ValueError(f"resistance variable {rn!r} is not "
                                 f"defined")
            res_var = var_names.index(rn)
            if varspecs[res_var]["kind"] != "resistance":
                raise ValueError(f'{rn!r} must have kind "resistance"')
            limit = None
        elif ls.get("limit") is not None:
            limit = float(ls["limit"])
        else:
            raise ValueError('frame stress limit state needs "limit" '
                             'or "variable"')
        elems = ls.get("elements")
        probe = (np.arange(m) if elems is None
                 else np.asarray(elems, dtype=int).reshape(-1))
        if probe.size and (probe.min() < 0 or probe.max() >= m):
            raise ValueError("limit-state elements out of range")
        labels = [f"stress e{int(e)}" for e in probe]
    else:
        raise ValueError('frame limit_state type must be '
                         '"displacement" or "stress"')
    probe_d = jnp.asarray(probe)

    def ratios_all(u):
        z = u if chol_d is None else chol_d @ u
        young = jnp.asarray(problem.young, dtype)
        area = jnp.asarray(problem.area, dtype)
        inertia = jnp.asarray(problem.inertia, dtype)
        scale = jnp.asarray(1.0, dtype)
        for i, v in enumerate(varspecs):
            x = _physical(v, z[i])
            if v["kind"] == "load_scale":
                scale = scale * x
            elif v["kind"] == "resistance":
                pass
            else:
                mk = masks[i]
                if v["kind"] == "young":
                    young = young * (1.0 - mk) + x * mk
                elif v["kind"] == "inertia":
                    inertia = inertia * (1.0 - mk) + x * mk
                elif v["kind"] == "area":
                    area = area * (1.0 - mk) + x * mk
        # load_scale= keeps the member-load fixed-end correction
        # consistent with the scaled loads (a plain `loads` override
        # would drop it and misreport member stresses).
        uu, mom, ax = frame_static_response(
            problem, young_e=young, area_e=area, inertia_e=inertia,
            load_scale=scale)
        if ls_type == "stress":
            s_mod = jnp.asarray(problem.section_modulus, dtype)
            sigma = jnp.abs(ax) / area \
                + jnp.max(jnp.abs(mom), axis=1) / s_mod
            demand = sigma[probe_d]
            if res_var is not None:
                r = _physical(varspecs[res_var], z[res_var])
            else:
                r = jnp.asarray(limit, dtype)
            return demand / r
        return jnp.abs(uu)[probe_d] / limit

    return form_core(ratios_all, varspecs, chol, labels,
                     n_iter=n_iter, tol=tol, mc_samples=mc_samples,
                     mc_seed=mc_seed)


def optimize_frame_inertia_rbdo(problem: FrameProblem, variables,
                                limit: float, probe_dofs,
                                target_beta: float,
                                weight_exponent: float = 0.5,
                                min_inertia: float = 1e-8,
                                n_iter: int = 300,
                                outer_rounds: int = 4,
                                penalty: float = 10.0,
                                learning_rate: float = 0.05,
                                n_amv: int = 10):
    """RBDO on frames: minimum-weight inertia profile such that every
    probed displacement keeps a FORM index β ≥ target under uncertain
    E / load — the truss RBDO's PMA recipe on the frame twin.

    The inner AMV fixpoint finds each probe's worst point on the
    target-β sphere (variables: young / load_scale specs from the
    reliability family; "inertia" variables are rejected — I is the
    DESIGN vector), the constraint is the displacement ratio AT that
    point, and Danskin's stop_gradient keeps the outer ADAM gradient
    first-order.  Achieved betas are recomputed by frame_reliability
    (the full HL-RF authority).

    EXACT anchor (tests/test_frame.py): one design variable with
    lognormal (E, S) has ln v linear, so β(I) is closed-form and
    β(I*) = β_t solves to I* = I_det·exp(β_t·√(ζ_E²+ζ_S²) − ζ_E²/2
    − ζ_S²/2)-scaled — pinned to 1e-3.  Returns
    (inertia, weight, achieved_betas, history).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..solvers.reliability import _physical
    from ..solvers.reliability import _parse_variables as _pv

    if limit <= 0.0 or target_beta <= 0.0:
        raise ValueError("limit and target_beta must be positive")
    for spec in variables or ():
        if spec.get("kind") in ("inertia", "density", "area",
                                "resistance"):
            raise ValueError('frame RBDO variables must be young or '
                             'load_scale ("inertia" is the design '
                             'vector; a resistance cannot bind a '
                             'displacement limit state)')
    varspecs = _pv(variables, problem.nelm)
    n_vars = len(varspecs)
    dtype = jnp.asarray(1.0).dtype
    masks = {i: jnp.asarray(v["mask"], dtype)
             for i, v in enumerate(varspecs) if v["mask"] is not None}
    probe = np.asarray(probe_dofs, dtype=int).reshape(-1)
    if probe.size and (probe.min() < 0 or probe.max() >= problem.ndof):
        raise ValueError("probe_dofs out of range")
    probe_d = jnp.asarray(probe)
    bt = jnp.asarray(float(target_beta), dtype)
    length_np = _geometry(problem)[0]
    lengths = jnp.asarray(length_np)
    q = float(weight_exponent)
    w0 = float(np.sum(np.maximum(np.asarray(problem.inertia),
                                 min_inertia) ** q * length_np))

    def ratio_one(i_e, u, p_idx):
        young = jnp.asarray(problem.young, dtype)
        scale = jnp.asarray(1.0, dtype)
        for k, v in enumerate(varspecs):
            x = _physical(v, u[k])
            if v["kind"] == "load_scale":
                scale = scale * x
            elif v["kind"] == "young":
                mk = masks[k]
                young = young * (1.0 - mk) + x * mk
        uu, _, _ = frame_static_response(
            problem, young_e=young, inertia_e=i_e, load_scale=scale)
        return jnp.abs(uu)[probe_d[p_idx]] / limit

    def pma_ratios(i_e):
        def amv(p_idx):
            def g_of(u):
                return 1.0 - ratio_one(i_e, u, p_idx)

            def body(_, u):
                dg = jax.grad(g_of)(u)
                nrm = jnp.maximum(jnp.linalg.norm(dg), 1e-30)
                return -bt * dg / nrm

            u_star = jax.lax.fori_loop(0, n_amv, body,
                                       jnp.zeros((n_vars,), dtype))
            u_star = jax.lax.stop_gradient(u_star)   # Danskin
            return ratio_one(i_e, u_star, p_idx)

        return jax.vmap(amv)(jnp.arange(probe.size))

    i_start = np.maximum(np.asarray(problem.inertia),
                         min_inertia * (1.0 + 1e-9))
    t0 = jnp.log(jnp.asarray(i_start) - min_inertia)

    def obj_g(t):
        i_e = min_inertia + jnp.exp(t)
        g = pma_ratios(i_e) - 1.0
        return jnp.sum(i_e ** q * lengths) / w0, g

    t, hist = _al_minimize(obj_g, t0, int(probe.size), n_iter,
                           outer_rounds, penalty, learning_rate)
    i_e = np.asarray(jax.device_get(min_inertia + jnp.exp(t)),
                     dtype=float)
    # Uniform PMA polish: the displacement ratio at the FIXED design
    # point falls ~1/s under a uniform inertia scale — and if 20
    # scalings cannot reach it, an inertia-independent (axial)
    # deflection floor makes the target unreachable: fail loudly like
    # the deterministic sibling.
    pma_jit = jax.jit(lambda ii: pma_ratios(ii))
    for _ in range(20):
        r_max = float(np.max(np.asarray(jax.device_get(
            pma_jit(jnp.asarray(i_e, dtype))))))
        if r_max <= 1.0 + 1e-6:
            break
        i_e = i_e * r_max
    else:
        raise ValueError(
            f"target_beta {target_beta} at limit {limit} unreachable "
            f"by inertia scaling (residual PMA ratio {r_max:.3f}) — "
            f"the probe deflection has an axial component EA cannot "
            f"reduce; raise the limit or size areas too")
    p_final = FrameProblem(problem.nodes, problem.elements,
                           problem.young, problem.area, i_e,
                           problem.density, problem.loads,
                           problem.fixed_dofs, problem.point_masses,
                           problem.member_loads,
                           problem.section_modulus)
    rres = frame_reliability(
        p_final, variables,
        {"type": "displacement", "limit": limit,
         "probe_dofs": probe.tolist()})
    weight = float(np.sum(i_e ** q * length_np))
    return i_e, weight, np.asarray(rres.beta, dtype=float), \
        np.asarray(hist)


# --------------------------------------------------------------------
# Banded DEVICE tier (round-4 VERDICT #2): DIA + PCG statics and
# subspace-iteration modal, so a 50-story / 40k-DOF frame solves on
# chip — the solve_plane_static_banded pattern with 6x6 bending blocks.


def _frame_blocks_jnp(length, c, s, young, area, inertia):
    """(kl, t, kg_blocks) traced jnp element matrices from traced
    geometry/property arrays — the block builder
    frame_static_response inlines, factored so the banded tier builds
    them INSIDE its jitted program.  precision="highest" on the T'KT
    contraction: TPU einsum defaults to bf16 on the MXU and the
    rounding asymmetry breaks PCG (models/plane.py:_einsum,
    CLAUDE.md)."""
    import jax.numpy as jnp

    m = length.shape[0]
    dtype = length.dtype
    ea = young * area / length
    ei = young * inertia
    z = jnp.zeros_like(length)
    b12 = 12.0 * ei / length ** 3
    b6 = 6.0 * ei / length ** 2
    b4 = 4.0 * ei / length
    b2 = 2.0 * ei / length
    rows = [jnp.stack([ea, z, z, -ea, z, z], axis=-1),
            jnp.stack([z, b12, b6, z, -b12, b6], axis=-1),
            jnp.stack([z, b6, b4, z, -b6, b2], axis=-1),
            jnp.stack([-ea, z, z, ea, z, z], axis=-1),
            jnp.stack([z, -b12, -b6, z, b12, -b6], axis=-1),
            jnp.stack([z, b6, b2, z, -b6, b4], axis=-1)]
    kl = jnp.stack(rows, axis=-2)

    one = jnp.ones_like(c)
    r3 = jnp.stack([
        jnp.stack([c, s, z], axis=-1),
        jnp.stack([-s, c, z], axis=-1),
        jnp.stack([z, z, one], axis=-1)], axis=-2)
    t = jnp.zeros((m, 6, 6), dtype)
    t = t.at[:, :3, :3].set(r3)
    t = t.at[:, 3:, 3:].set(r3)
    kg_blocks = jnp.einsum("mji,mjk,mkl->mil", t, kl, t,
                           precision="highest")
    return kl, t, kg_blocks


def _frame_dia_layout(problem: "FrameProblem"):
    """DIA layout cached on the instance (the plane-family rule: the
    host layout build is O(nelm*36) numpy work and depends only on
    connectivity, fixed at construction)."""
    import jax.numpy as jnp

    from ..ops.dia import dia_layout

    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        layout = dia_layout(problem.dof_map(), problem.ndof)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    return layout


_FRAME_BANDED_CACHE: dict = {}


def _frame_banded_core(layout, precond: str, use_pallas: bool,
                       max_iter: int, nelm: int):
    """Jitted banded frame statics, cached per structural signature
    (never per problem object — the closure recompile trap,
    CLAUDE.md)."""
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.bandwidth, nelm, precond, use_pallas, max_iter)
    core = _FRAME_BANDED_CACHE.get(key)
    if core is not None:
        return core

    import jax
    import jax.numpy as jnp

    from ..ops.dia import assemble_dia_blocks, dia_cg_solve, dia_matvec

    @jax.jit
    def core(length, c, s, young, area, inertia, entry_slot, f, mask,
             tol):
        _, _, kg_blocks = _frame_blocks_jnp(length, c, s, young, area,
                                            inertia)
        diags = assemble_dia_blocks(
            DiaLayoutView(layout, entry_slot), kg_blocks)
        x, iters, rel = dia_cg_solve(layout, diags, f, mask, tol=tol,
                                     max_iter=max_iter,
                                     use_pallas=use_pallas,
                                     precond=precond, components=3)
        reac = (dia_matvec(layout, diags, x) - f) * (1.0 - mask)
        return x, reac, iters, rel

    _FRAME_BANDED_CACHE[key] = core
    return core


# The traced-entry-slot layout proxy is shared across families
# (solvers/banded_inverse.DiaLayoutView).
from ..solvers.banded_inverse import DiaLayoutView  # noqa: E402


def solve_frame_static_banded(problem: "FrameProblem",
                              tol: float = 1e-7,
                              max_iter: int = 20000,
                              use_pallas: bool = False,
                              precond: str = "auto", dtype=None,
                              mesh=None):
    """Large-mesh frame statics on the DEVICE tier.

    Tall regular frames (story grids, lattice towers) are banded under
    nodal numbering: 6 DOFs couple per node pair, so the stiffness has
    a few dozen distinct diagonals and the whole solve rides the DIA
    pipeline the truss and plane families built (ops/dia.py):
    batched (m, 6, 6) T'KT blocks contracted on the MXU, one scatter
    into diagonal storage, streaming-rate Jacobi-PCG.  The mixed
    axial/flexural/rotational DOF scales make Jacobi scaling (not no
    preconditioning) load-bearing here.

    Returns (FrameStaticResult, iterations, relative_residual); member
    end-force recovery runs on the host from the fetched displacement
    field (ONE device_get, the corpus-benchmark rule).  Pinned 1:1
    against solve_frame_static on refinement sequences in
    tests/test_frame.py; above DENSE_DOF_LIMIT this is the only
    tractable path."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.asarray(1.0).dtype
    if precond == "auto":
        precond = "jacobi"  # the measured plane-family tradeoff
    layout = _frame_dia_layout(problem)
    length_np, c_np, s_np = _geometry(problem)
    f_member, f_fixed = _member_load_vectors(problem)
    f_th, f_th_fixed = _thermal_member_vectors(problem)
    f_member, f_fixed = f_member + f_th, f_fixed + f_th_fixed
    f_np = problem.loads + f_member
    if mesh is not None:
        # Multi-chip path: the banded solve rides parallel/
        # dia_sharded.dia_cg_solve_sharded with the DOF axis
        # row-block-sharded over "tp" (the plane family's pattern,
        # round-4 VERDICT #4).
        from ..ops.dia import assemble_dia_blocks, dia_matvec
        from ..parallel.dia_sharded import dia_cg_solve_sharded

        _, _, kg_blocks = _frame_blocks_jnp(
            jnp.asarray(length_np, dtype), jnp.asarray(c_np, dtype),
            jnp.asarray(s_np, dtype),
            jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.area, dtype),
            jnp.asarray(problem.inertia, dtype))
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
        core = _frame_banded_core(layout, precond, use_pallas,
                                  int(max_iter), problem.nelm)
        x, reac, iters, rel = core(
            jnp.asarray(length_np, dtype), jnp.asarray(c_np, dtype),
            jnp.asarray(s_np, dtype), jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.area, dtype),
            jnp.asarray(problem.inertia, dtype),
            problem._dia_entry_slot_dev,
            jnp.asarray(f_np, dtype),
            jnp.asarray(problem.free_mask(), dtype),
            jnp.asarray(tol, dtype))
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    u = np.asarray(u, dtype=float)

    length, c, s = _geometry(problem)
    t = _rotation(c, s)
    kl = _k_local(problem.young, problem.area, problem.inertia, length)
    u_loc = np.einsum("mij,mj->mi", t, u[problem.dof_map()])
    f_loc = np.einsum("mij,mj->mi", kl, u_loc) - f_fixed
    max_stress = None
    if problem.section_modulus is not None:
        axial_n = -f_loc[:, 0]
        m_max = np.max(np.abs(f_loc[:, [2, 5]]), axis=1)
        max_stress = np.abs(axial_n) / problem.area \
            + m_max / problem.section_modulus
    res = FrameStaticResult(
        displacements=u,
        member_end_forces=f_loc,
        axial=-f_loc[:, 0],
        moments=f_loc[:, [2, 5]],
        reactions=np.asarray(reac, dtype=float),
        max_stress=max_stress)
    return res, int(iters), float(rel)


def frame_lumped_mass_diag(problem: "FrameProblem") -> np.ndarray:
    """(3n,) HRZ-lumped mass diagonal: scale the consistent diagonal
    so each member's translational total is preserved — rho A L / 2
    per end translation and rho A L^3 / 78 rotary inertia (the
    4 L^2/420 consistent diagonal through the 420/312 HRZ factor).
    Nonsingular on every DOF, which the banded modal M-inner product
    needs; point masses add translationally."""
    length, _, _ = _geometry(problem)
    rho_al = problem.density * problem.area * length
    tr = 0.5 * rho_al
    rot = rho_al * length ** 2 / 78.0
    diag = np.zeros(problem.ndof)
    dm = problem.dof_map()
    fe = np.stack([tr, tr, rot, tr, tr, rot], axis=-1)
    np.add.at(diag, dm, fe)
    if problem.point_masses is not None:
        diag[0::3] += problem.point_masses
        diag[1::3] += problem.point_masses
    return diag


def frame_modal_banded(problem: "FrameProblem", n_modes: int = 4,
                       n_iter: int = 30, cg_tol: float = 1e-7,
                       seed: int = 0, dtype=None,
                       mesh=None) -> FrameModalResult:
    """Large-mesh frame modal analysis: inverse subspace iteration on
    the banded operator with HRZ-lumped mass — the truss family's
    _subspace_iteration (solvers/modal.py) riding the frame DIA
    diagonals unchanged (it is layout-generic).  Lumped-mass
    frequencies converge from BELOW under refinement while the
    consistent host tier converges from above; tests pin banded-vs-
    dense on the SAME lumped discrete problem instead.  `mesh`
    distributes the block solves (parallel/dia_sharded.py)."""
    import jax
    import jax.numpy as jnp

    from ..ops.dia import assemble_dia_blocks
    from ..solvers.modal import _subspace_iteration

    dtype = dtype or jnp.asarray(1.0).dtype
    layout = _frame_dia_layout(problem)
    length_np, c_np, s_np = _geometry(problem)
    _, _, kg_blocks = _frame_blocks_jnp(
        jnp.asarray(length_np, dtype), jnp.asarray(c_np, dtype),
        jnp.asarray(s_np, dtype), jnp.asarray(problem.young, dtype),
        jnp.asarray(problem.area, dtype),
        jnp.asarray(problem.inertia, dtype))
    diags = assemble_dia_blocks(
        DiaLayoutView(layout, problem._dia_entry_slot_dev), kg_blocks)
    mask = jnp.asarray(problem.free_mask(), dtype)
    m_diag = jnp.asarray(frame_lumped_mass_diag(problem), dtype)
    m_diag = m_diag * mask + (1.0 - mask)
    w, y, change = _subspace_iteration(
        layout, diags, m_diag, mask, int(n_modes), int(n_iter),
        cg_tol, int(seed), mesh=mesh)
    lam, shapes = jax.device_get((w, (y * mask[:, None]).T))
    lam = np.maximum(np.asarray(lam, dtype=float), 0.0)
    om = np.sqrt(lam)
    return FrameModalResult(frequencies_hz=om / (2.0 * np.pi),
                            omegas=om, eigenvalues=lam,
                            mode_shapes=np.asarray(shapes, dtype=float))
