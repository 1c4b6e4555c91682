"""Flat-facet shell elements: general curved thin-walled structures
(roofs, cylinders, pressure vessels, box girders) join the framework.

A shell carries load by MEMBRANE action and BENDING simultaneously —
the structural regime none of the existing families reach: the
membrane family (models/plane.py) is flat and in-plane only, the
plate family (models/plate.py) is flat and transverse only, and the
curved-geometry coupling between the two (a cylinder carrying
pressure as hoop tension, a roof shedding load to its edge beams) is
exactly what makes shells the canonical hard case of structural FEM.

Element: the classical FLAT-FACET quadrilateral — the Q4 plane-stress
membrane (models/plane._k_blocks, 2×2 Gauss) superposed with the
MITC4 Mindlin bending element (models/plate._k_blocks_plate,
Bathe-Dvorkin assumed shear) in a per-element local frame, plus a
rank-correcting drilling stiffness.  Curvature is represented by the
faceting itself (geometry converges O(h²)); both constituent
elements are the framework's own verified kernels, REUSED at their
call sites with local 2D coordinates — no second implementation to
drift (the xp-parameterized closed-form doctrine).

Local frame (per element, warp-tolerant): normal ẑ from the cross
product of the DIAGONALS d₁ = x₃−x₁, d₂ = x₄−x₂ (symmetric in the
corners, standard for warped quads), ê₁ the 1→2 edge projected onto
the plane, ê₂ = ẑ × ê₁; corners project onto the plane through the
centroid (the facet approximation — out-of-plane warp is dropped at
O(warp²), tests pin flat and gently-warped patches).

DOF mapping: 6 DOFs per node (u, v, w, θx, θy, θz — GLOBAL axes).
In the local frame the membrane block takes (u, v), the bending
block takes (w, βx, βy) with the plate module's normal-rotation
convention u = −z·βx ⇒ βx = −θy, βy = +θx (the sign conjugation is
applied per node when scattering the 12×12 plate block into the
24×24 facet matrix).

Drilling DOF: the local θz has no stiffness in either constituent —
the classical rank deficiency of flat-facet shells.  Stabilization is
the standard fictitious drilling stiffness

    K_drill = α·G·t·A_e · (I₄ − ¼·𝟙𝟙ᵀ + ε·I₄)

on the four local θz DOFs: the (I − ¼𝟙𝟙ᵀ) part penalizes only
DIFFERENCES of drilling rotations (a rigid rotation about the facet
normal gives EQUAL θz at all four nodes and is annihilated exactly),
and the tiny ε·I₄ removes the one remaining global null mode of
COPLANAR meshes (uniform θz everywhere costs zero energy in every
other term); the objectivity error it introduces is bounded by
α·ε ~ 1e-9 of the membrane stiffness — invisible against bending
energy, pinned by the flat-patch exactness tests.

Verification anchors (tests/test_shell.py)
------------------------------------------
- FLAT EXACTNESS: on a flat mesh the shell REPRODUCES the plane
  membrane and the MITC4 plate solutions to machine precision (same
  kernels, θz ≡ 0 in both load cases — the drilling term never
  engages), including plate modal frequencies;
- objectivity: a rigidly rotated problem rotates the solution
  exactly;
- the SHELL OBSTACLE COURSE (MacNeal-Harder / Belytschko):
  Scordelis-Lo barrel roof under self-weight (midside-edge
  deflection 0.3024), pinched cylinder with end diaphragms
  (1.8248e-5 under the load), hemispherical shell with 18° hole
  (0.0940 radial at the loads) — faceted-geometry convergence to
  the published targets under refinement.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .plane import _dmat as _plane_dmat
from .plane import _k_blocks as _membrane_k
from .plane import _m_blocks as _membrane_m
from .plate import _k_blocks_plate, _m_blocks_plate

__all__ = [
    "ShellProblem",
    "ShellStaticResult",
    "ShellModalResult",
    "ShellBucklingResult",
    "shell_matrices",
    "solve_shell_static",
    "shell_modal",
    "shell_geometric_stiffness",
    "shell_buckling",
    "ShellTransientResult",
    "ShellHarmonicResult",
    "solve_shell_transient",
    "shell_harmonic",
    "solve_shell_static_banded",
    "shell_static_response",
    "shell_fiber_vm",
    "identify_shell_young",
    "identify_shell_young_banded",
    "cylinder_panel_mesh",
    "hemisphere_mesh",
    "arch_strip_mesh",
]

_DRILL_ALPHA = 1e-3
_DRILL_EPS = 1e-6


@dataclass
class ShellProblem:
    """Flat-facet shell: nodes (n, 3) midsurface coordinates,
    elements (m, 4) quads (CCW seen from the +normal side), scalars
    broadcast per element; loads (6n,) as [Fx, Fy, Fz, Mx, My, Mz]*n;
    optional uniform NORMAL pressure per element (+ along the facet
    normal) and global body force per unit area (self-weight)."""
    nodes: np.ndarray
    elements: np.ndarray
    young: np.ndarray
    poisson: np.ndarray
    thickness: np.ndarray
    density: np.ndarray
    loads: np.ndarray              # (6n,)
    fixed_dofs: np.ndarray
    pressure: Optional[np.ndarray] = None      # (m,) normal q
    body_force: Optional[np.ndarray] = None    # (3,) force / area
    point_masses: Optional[np.ndarray] = None  # (n,) translational
    # Thermoelastic load case (STATIC only, the plane/plate doctrine):
    # uniform midsurface ΔT stretches the membrane (ε_th = αΔT[1,1,0])
    # and a TOP−BOTTOM through-thickness difference bends it
    # (κ_th = αΔT_g/t [1,1,0]).
    alpha_cte: Optional[np.ndarray] = None            # (m,) or scalar
    temperature: Optional[np.ndarray] = None          # (m,) mid ΔT
    temperature_gradient: Optional[np.ndarray] = None  # (m,) ΔT_g

    def __post_init__(self):
        self.nodes = np.asarray(self.nodes, dtype=float)
        if self.nodes.ndim != 2 or self.nodes.shape[1] != 3:
            raise ValueError("shell nodes must be (n, 3)")
        self.elements = np.asarray(self.elements, dtype=int)
        if self.elements.ndim != 2 or self.elements.shape[1] != 4:
            raise ValueError("shell elements must be (m, 4) quads")
        m = self.elements.shape[0]
        for name in ("young", "poisson", "thickness", "density"):
            setattr(self, name, np.broadcast_to(
                np.asarray(getattr(self, name), dtype=float),
                (m,)).copy())
        if np.any(self.thickness <= 0.0) or np.any(self.young <= 0.0):
            raise ValueError("young and thickness must be positive")
        self.loads = np.asarray(self.loads, dtype=float).reshape(-1)
        if self.loads.size != self.ndof:
            raise ValueError(f"loads must have {self.ndof} entries "
                             f"(6 per node), got {self.loads.size}")
        self.fixed_dofs = np.asarray(self.fixed_dofs,
                                     dtype=int).reshape(-1)
        if self.pressure is not None:
            self.pressure = np.broadcast_to(
                np.asarray(self.pressure, dtype=float), (m,)).copy()
        if self.body_force is not None:
            self.body_force = np.asarray(self.body_force,
                                         dtype=float).reshape(3)
        if self.point_masses is not None:
            self.point_masses = np.broadcast_to(
                np.asarray(self.point_masses, dtype=float),
                (self.nnode,)).copy()
        if (self.temperature is not None
                or self.temperature_gradient is not None):
            if self.alpha_cte is None:
                raise ValueError("a shell temperature load needs "
                                 "alpha_cte (the expansion "
                                 "coefficient)")
        for name in ("alpha_cte", "temperature",
                     "temperature_gradient"):
            val = getattr(self, name)
            if val is not None:
                setattr(self, name, np.broadcast_to(
                    np.asarray(val, dtype=float), (m,)).copy())

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
        """(m, 24) global DOF indices per element."""
        e = self.elements
        return np.concatenate(
            [6 * e[:, a:a + 1] + np.arange(6)[None, :]
             for a in range(4)], axis=1)


def _facet_frames(problem: ShellProblem):
    """(r (m, 3, 3) local triads (rows = ê₁, ê₂, ẑ),
    coords2d (m, 4, 2) in-plane corner coordinates, warp (m,) the
    max out-of-plane corner offset / diagonal length)."""
    x = problem.nodes[problem.elements]            # (m, 4, 3)
    d1 = x[:, 2] - x[:, 0]
    d2 = x[:, 3] - x[:, 1]
    zh = np.cross(d1, d2)
    nz = np.linalg.norm(zh, axis=1)
    if np.any(nz <= 0.0):
        raise ValueError("degenerate shell facet (zero normal)")
    zh = zh / nz[:, None]
    e12 = x[:, 1] - x[:, 0]
    e1 = e12 - (np.einsum("mi,mi->m", e12, zh))[:, None] * zh
    n1 = np.linalg.norm(e1, axis=1)
    if np.any(n1 <= 0.0):
        raise ValueError("degenerate shell facet (zero edge)")
    e1 = e1 / n1[:, None]
    e2 = np.cross(zh, e1)
    r = np.stack([e1, e2, zh], axis=1)
    c = x.mean(axis=1)
    rel = x - c[:, None, :]
    coords2d = np.stack([np.einsum("mai,mi->ma", rel, e1),
                         np.einsum("mai,mi->ma", rel, e2)], axis=-1)
    off = np.abs(np.einsum("mai,mi->ma", rel, zh)).max(axis=1)
    warp = off / np.maximum(np.linalg.norm(d1, axis=1), 1e-300)
    return r, coords2d, warp


# Per-node map from local (w, θx, θy) to the plate module's
# (w, βx, βy):  βx = −θy, βy = +θx  (module docstring).
_BETA_OF_THETA = np.array([[1.0, 0.0, 0.0],
                           [0.0, 0.0, -1.0],
                           [0.0, 1.0, 0.0]])


def _facet_blocks(problem: ShellProblem):
    """(m, 24, 24) LOCAL stiffness and mass blocks in the
    (u, v, w, θx, θy, θz)-per-node ordering."""
    r, c2, _ = _facet_frames(problem)
    m = problem.nelm
    dmat = _plane_dmat(problem.young, problem.poisson, False)
    km = _membrane_k(c2, dmat, problem.thickness, 4)      # (m, 8, 8)
    kp = _k_blocks_plate(c2, problem.young, problem.poisson,
                         problem.thickness)               # (m, 12, 12)
    mm = _membrane_m(c2, problem.density, problem.thickness, 4)
    mp = _m_blocks_plate(c2, problem.density, problem.thickness)

    # Conjugate the plate blocks from (w, βx, βy) to (w, θx, θy).
    q = np.zeros((12, 12))
    for a in range(4):
        q[3 * a:3 * a + 3, 3 * a:3 * a + 3] = _BETA_OF_THETA
    kp = np.einsum("ij,mjk,kl->mil", q.T, kp, q)
    mp = np.einsum("ij,mjk,kl->mil", q.T, mp, q)

    k = np.zeros((m, 24, 24))
    mass = np.zeros((m, 24, 24))
    mem = np.array([6 * a + d for a in range(4) for d in (0, 1)])
    bnd = np.array([6 * a + d for a in range(4) for d in (2, 3, 4)])
    k[:, mem[:, None], mem[None, :]] += km
    k[:, bnd[:, None], bnd[None, :]] += kp
    mass[:, mem[:, None], mem[None, :]] += mm
    mass[:, bnd[:, None], bnd[None, :]] += mp

    # Drilling stabilization (module docstring): differences of the
    # four local θz, plus ε·I to pin the coplanar-mesh null mode.
    area = _facet_area(c2)
    g = problem.young / (2.0 * (1.0 + problem.poisson))
    kd = _DRILL_ALPHA * g * problem.thickness * area      # (m,)
    pen = (np.eye(4) - 0.25) + _DRILL_EPS * np.eye(4)
    dr = np.array([6 * a + 5 for a in range(4)])
    k[:, dr[:, None], dr[None, :]] += kd[:, None, None] * pen
    return k, mass, r, c2


def _facet_area(c2: np.ndarray) -> np.ndarray:
    """(m,) quad areas by the shoelace formula on the local coords."""
    x, y = c2[..., 0], c2[..., 1]
    return 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1)
               - np.roll(x, -1, axis=1) * y, axis=1))


def _transformation_shell(r: np.ndarray) -> np.ndarray:
    """(m, 24, 24) local <- global: block-diag(R, R) per node."""
    m = r.shape[0]
    t = np.zeros((m, 24, 24))
    for off in range(0, 24, 3):
        t[:, off:off + 3, off:off + 3] = r
    return t


def _load_vectors_shell(problem: ShellProblem):
    """(6n,) consistent nodal loads from normal pressure and global
    body force per unit area (bilinear tributary via the 2×2 Gauss
    shape products — the plate _pressure_vectors recipe, lifted to
    the facet frame)."""
    if problem.pressure is None and problem.body_force is None:
        return np.zeros(problem.ndof)
    from .plane import _CORNERS, _GP
    from .plate import _shape_grads

    r, c2, _ = _facet_frames(problem)
    fe = np.zeros((problem.nelm, 4))           # scalar per corner
    for xi, eta in _GP:
        n, _, _, det = _shape_grads(c2, xi, eta)
        fe += det[:, None] * n[None, :]
    f = np.zeros(problem.ndof)
    enodes = problem.elements
    if problem.pressure is not None:
        # q along the facet normal ẑ (global components).
        fz = problem.pressure[:, None] * fe                # (m, 4)
        for d in range(3):
            np.add.at(f, 6 * enodes + d,
                      fz * r[:, 2, d][:, None])
    if problem.body_force is not None:
        for d in range(3):
            np.add.at(f, 6 * enodes + d,
                      problem.body_force[d] * fe)
    return f


def _shell_thermal_fields(problem: ShellProblem):
    """(ε_th (m, 3) or None, κ_th (m, 3) or None) of the thermoelastic
    load case: a uniform midsurface ΔT stretches the membrane with the
    plane-stress thermal strain ε_th = αΔT [1, 1, 0]
    (models/plane.py:_thermal_strain — facets ARE plane-stress
    membranes through the thickness), and a TOP−BOTTOM face difference
    ΔT_g (linear profile T(z) = T_m + z ΔT_g/t) bends it with
    κ_th = α ΔT_g / t [1, 1, 0] (models/plate.py:_thermal_curvature).
    Thermoelasticity is a STATIC load case — the family doctrine."""
    if problem.temperature is None \
            and problem.temperature_gradient is None:
        return None, None
    eps_th = None
    kap_th = None
    if problem.temperature is not None:
        a = problem.alpha_cte * problem.temperature
        eps_th = np.stack([a, a, np.zeros_like(a)], axis=-1)
    if problem.temperature_gradient is not None:
        k = problem.alpha_cte * problem.temperature_gradient \
            / problem.thickness
        kap_th = np.stack([k, k, np.zeros_like(k)], axis=-1)
    return eps_th, kap_th


def _thermal_load_vectors_shell(problem: ShellProblem) -> np.ndarray:
    """(6n,) consistent thermal nodal loads, assembled per facet in
    the LOCAL frame and rotated Tᵀ to global like every other facet
    quantity: membrane ∫ B_memᵀ D ε_th t dΩ on the local (u, v) rows
    plus bending ∫ B_bᵀ D_b κ_th dΩ conjugated from the plate
    (w, βx, βy) basis to (w, θx, θy) (the _facet_blocks Q map).

    Exact anchors (tests/test_shell.py): a uniformly heated faceted
    midsurface with one clamped node expands as the stress-free
    homothety u = αΔT (x − x₀) — per flat facet the in-plane gradient
    is αΔT·I (ε = ε_th), the local normal offset w is CONSTANT (every
    point of a plane shares ẑ·x), and facet normals stay parallel
    (θ = 0), so membrane, bending AND MITC shear strains all vanish —
    on cylinders exactly as on flat meshes; and flat meshes reproduce
    the plane/plate family thermal solutions to roundoff (same
    kernels)."""
    eps_th, kap_th = _shell_thermal_fields(problem)
    if eps_th is None and kap_th is None:
        return np.zeros(problem.ndof)
    from .plane import _GP, _q4_point
    from .plate import _bend_b, _dmats, _shape_grads

    r, c2, _ = _facet_frames(problem)
    m = problem.nelm
    fe_loc = np.zeros((m, 24))
    if eps_th is not None:
        dmat = _plane_dmat(problem.young, problem.poisson, False)
        s_th = np.einsum("mij,mj->mi", dmat, eps_th)       # (m, 3)
        fe_mem = np.zeros((m, 8))
        for xi, eta in _GP:
            b, det = _q4_point(c2, xi, eta)
            fe_mem += (problem.thickness * det)[:, None] \
                * np.einsum("mia,mi->ma", b, s_th)
        fe_loc[:, _MEM_IDX] += fe_mem
    if kap_th is not None:
        db, _ = _dmats(problem.young, problem.poisson,
                       problem.thickness)
        m_th = np.einsum("mij,mj->mi", db, kap_th)          # (m, 3)
        fe_bnd = np.zeros((m, 12))
        for xi, eta in _GP:
            _, dx, dy, det = _shape_grads(c2, xi, eta)
            bb = _bend_b(dx, dy)
            fe_bnd += det[:, None] * np.einsum("mia,mi->ma", bb, m_th)
        fe_loc[:, _BND_IDX] += np.einsum("ji,mj->mi", _Q_BETA, fe_bnd)
    t = _transformation_shell(r)
    fg = np.einsum("mji,mj->mi", t, fe_loc)
    f = np.zeros(problem.ndof)
    np.add.at(f, problem.dof_map(), fg)
    return f


def _require_no_thermal_shell(problem: ShellProblem, kind: str):
    """Dynamic paths refuse a temperature load: the forcing is
    amplitude-scaled in time and a thermal load is a constant static
    case — oscillating it would be silently wrong physics (the
    family-wide rule, models/plane.py:_require_no_thermal)."""
    if problem.temperature is not None \
            or problem.temperature_gradient is not None:
        raise ValueError(
            f"shell {kind} does not take a temperature load case — "
            "thermoelastic loads are static; use analysis type "
            '"static" (or "buckling", which inherits ΔT membrane '
            "forces through the static state)")


def shell_matrices(problem: ShellProblem, with_mass: bool = True):
    """(K, M) dense global matrices — the one assembly every shell
    solver shares (host float64)."""
    k_loc, m_loc, r, _ = _facet_blocks(problem)
    t = _transformation_shell(r)
    kg = np.einsum("mji,mjk,mkl->mil", t, k_loc, t)
    dm = problem.dof_map()
    k = np.zeros((problem.ndof, problem.ndof))
    np.add.at(k, (dm[:, :, None], dm[:, None, :]), kg)
    mmat = None
    if with_mass:
        mg = np.einsum("mji,mjk,mkl->mil", t, m_loc, t)
        mmat = np.zeros((problem.ndof, problem.ndof))
        np.add.at(mmat, (dm[:, :, None], dm[:, None, :]), mg)
        if problem.point_masses is not None:
            pm = np.zeros(problem.ndof)
            for d in range(3):
                pm[d::6] += problem.point_masses
            mmat = mmat + np.diag(pm)
    return k, mmat


@dataclass
class ShellStaticResult:
    displacements: np.ndarray      # (6n,)
    # (m, 3) centroid membrane forces [Nxx, Nyy, Nxy] (force/length,
    # LOCAL facet axes) and (m, 3) bending moments [Mxx, Myy, Mxy].
    membrane_forces: np.ndarray
    moments: np.ndarray
    reactions: np.ndarray          # (6n,)


def solve_shell_static(problem: ShellProblem) -> ShellStaticResult:
    """Dense masked static solve + centroid membrane-force / moment
    recovery in the local facet axes."""
    k, _ = shell_matrices(problem, with_mass=False)
    mask = problem.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    f = problem.loads + _load_vectors_shell(problem) \
        + _thermal_load_vectors_shell(problem)
    u = np.linalg.solve(km, f * mask) * mask
    reactions = (k @ u - f) * (1.0 - mask)
    nf, mom = _recover_shell(problem, u)
    return ShellStaticResult(displacements=u, membrane_forces=nf,
                             moments=mom, reactions=reactions)


def shell_fiber_vm(nf, mom, thickness, xp=np):
    """Governing extreme-fiber von Mises of membrane-force + moment
    resultants: σ± = N/t ± 6M/t² (Voigt [xx, yy, xy], local facet
    axes), plane-stress vM at both fibers z = ±t/2, elementwise max.
    The ONE implementation of the shell demand convention — shared by
    the traced static twin (shell_static_response), the thickness-
    sizing feasibility polish (solvers/continuum_sizing.py) and the
    spectrum adapter (solvers/continuum_spectrum.py), so the three
    tiers cannot drift.  xp-generic (np | jnp); `thickness` may be
    traced — t-sensitivities carry the 1/t membrane and 6/t² bending
    algebra exactly."""
    t = thickness[:, None]
    sm = nf / t
    sb = 6.0 * mom / t ** 2

    def _vm(s):
        return xp.sqrt(s[:, 0] ** 2 - s[:, 0] * s[:, 1]
                       + s[:, 1] ** 2 + 3.0 * s[:, 2] ** 2)

    return xp.maximum(_vm(sm + sb), _vm(sm - sb))


def _recover_shell(problem: ShellProblem, u: np.ndarray):
    """Centroid membrane forces and bending moments (local axes)."""
    from .plane import _q4_point
    from .plate import _bend_b, _shape_grads

    r, c2, _ = _facet_frames(problem)
    t = _transformation_shell(r)
    u_loc = np.einsum("mij,mj->mi", t,
                      np.asarray(u, dtype=float)[problem.dof_map()])
    # Membrane strain at the centroid.
    bmem, _ = _q4_point(c2, 0.0, 0.0)
    mem = np.array([6 * a + d for a in range(4) for d in (0, 1)])
    eps = np.einsum("mia,ma->mi", bmem, u_loc[:, mem])
    eps_th, kap_th = _shell_thermal_fields(problem)
    if eps_th is not None:
        eps = eps - eps_th
    dmat = _plane_dmat(problem.young, problem.poisson, False)
    nf = problem.thickness[:, None] \
        * np.einsum("mij,mj->mi", dmat, eps)
    # Bending curvature at the centroid (plate (w, βx, βy) basis).
    bnd = np.array([6 * a + d for a in range(4) for d in (2, 3, 4)])
    q = np.zeros((12, 12))
    for a in range(4):
        q[3 * a:3 * a + 3, 3 * a:3 * a + 3] = _BETA_OF_THETA
    u_plate = np.einsum("ij,mj->mi", q, u_loc[:, bnd])
    _, dx, dy, _ = _shape_grads(c2, 0.0, 0.0)
    bb = _bend_b(dx, dy)
    kap = np.einsum("mia,ma->mi", bb, u_plate)
    if kap_th is not None:
        kap = kap - kap_th
    e, nu, tt = problem.young, problem.poisson, problem.thickness
    d0 = e * tt ** 3 / (12.0 * (1.0 - nu * nu))
    mom = np.stack([d0 * (kap[:, 0] + nu * kap[:, 1]),
                    d0 * (kap[:, 1] + nu * kap[:, 0]),
                    d0 * (1.0 - nu) / 2.0 * kap[:, 2]], axis=-1)
    return nf, mom


@dataclass
class ShellModalResult:
    frequencies_hz: np.ndarray
    omegas: np.ndarray
    eigenvalues: np.ndarray
    mode_shapes: np.ndarray        # (n_modes, 6n)


def shell_modal(problem: ShellProblem, n_modes: int = 6,
                membrane_force=None) -> ShellModalResult:
    """Generalized K φ = λ M φ on the free block (consistent mass,
    rotary inertia from the plate block; drilling DOFs carry the
    stabilization stiffness and ~zero mass, so their pencil modes sit
    far above the physical band).  A membrane force state
    [N11, N22, N12] (local axes, per-element broadcast) adds the
    geometric stiffness K_g(N) — tension raises frequencies,
    compression lowers them, and ω₁² hits zero at the state's own
    shell_buckling factor (the vibration-buckling link the
    plane/plate families pin)."""
    import scipy.linalg

    k, m = shell_matrices(problem)
    if membrane_force is not None:
        k = k + shell_geometric_stiffness(problem, membrane_force)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    # The local drilling rotation carries zero consistent mass, and
    # on a CURVED midsurface that null direction is not axis-aligned
    # (it mixes into every global rotation DOF), so a diagonal floor
    # cannot see it — regularize the whole pencil with a uniform
    # ridge 1e-10·max(diag)·I instead: physical frequencies move by
    # ~1e-7 relative (pinned in tests/test_shell.py) while the
    # drilling artifacts land at ω² ~ K_drill/ridge, far above the
    # physical band.
    m = m + 1e-10 * np.diag(m).max() * np.eye(m.shape[0])
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    n_modes = min(n_modes, lam.size)
    lam = np.maximum(lam[:n_modes], 0.0)
    shapes = np.zeros((n_modes, problem.ndof))
    shapes[:, free] = vec[:, :n_modes].T
    om = np.sqrt(lam)
    return ShellModalResult(frequencies_hz=om / (2.0 * np.pi),
                            omegas=om, eigenvalues=lam,
                            mode_shapes=shapes)


# --------------------------------------------------------------------
# Initial-stress (geometric) stiffness and linearized shell buckling.
# The membrane force state N = [N11, N22, N12] (force/length, LOCAL
# facet axes, tension positive) either comes from the problem's own
# static solution (the usual "buckling under the applied loads" run)
# or is prescribed directly (the plate-family contract,
# models/plate.py:plate_buckling).


def shell_geometric_stiffness(problem: ShellProblem,
                              membrane_force) -> np.ndarray:
    """Dense geometric stiffness of a membrane force state on the
    faceted midsurface:

        K_g = Σ_facets ∫ Σ_{k∈{u,v,w}} (∇u_k)ᵀ N (∇u_k) dA

    with ∇ the in-plane facet gradient and u_k the LOCAL displacement
    components — the full Green-Lagrange initial-stress term of a
    membrane stress resultant, all three components kept.  Why all
    three and not just the transverse w of the plate operator
    (models/plate.py:_gw_blocks):

    * within one facet the frame is constant and Σ_k (∂u_k/∂s)² =
      |∂u/∂s|² is frame-invariant, so the assembled form is OBJECTIVE
      on curved midsurfaces (a rotated problem buckles at the same λ);
    * the continuum limit is ∫ N |∂u/∂s|² ds — on a ring with hoop
      compression the tangential component's gradient contributes
      (v' + w) alongside the plate-like (w' − v), and the classical
      inextensional energy balance gives λ_n = D·n²/R² (n = 2 →
      4D/R², the dead-load ring buckling value; Timoshenko's
      hydrostatic 3D/R³·R differs by the pressure-follower load
      stiffness, which a linear eigen-pencil deliberately omits) —
      the w-only operator misses the tangential term and lands on
      the wrong ring constant;
    * on a FLAT mesh the u, v rows face the membrane stiffness E·t
      (their pencil modes sit at λ ~ E·t/N, decades above the plate
      band), so the plate family's buckling factors are reproduced
      exactly (tests/test_shell.py pins machine-precision agreement
      with models/plate.py:plate_buckling).

    2×2 Gauss, rotated TᵀK_gT to global axes like every other facet
    block.  The reference rpacheco-blazquez/PINN-FEM has no stability
    analysis at all (SURVEY §2); this mirrors the framework's own
    plane/solid/frame/plate K_g tier."""
    from .plane import _GP
    from .plate import _shape_grads

    nf = np.asarray(membrane_force, dtype=float)
    if nf.ndim <= 1:
        nf = np.broadcast_to(nf.reshape(-1), (3,))
        nf = np.broadcast_to(nf, (problem.nelm, 3))
    if nf.shape != (problem.nelm, 3):
        raise ValueError("membrane_force must be [N11, N22, N12] or "
                         f"(nelm, 3); got shape {nf.shape}")
    nmat = np.empty((problem.nelm, 2, 2))
    nmat[:, 0, 0] = nf[:, 0]
    nmat[:, 1, 1] = nf[:, 1]
    nmat[:, 0, 1] = nmat[:, 1, 0] = nf[:, 2]
    r, c2, _ = _facet_frames(problem)
    blk = None
    for xi, eta in _GP:
        _, dx, dy, det = _shape_grads(c2, xi, eta)
        g = np.stack([dx, dy], axis=1)                  # (m, 2, 4)
        b = det[:, None, None] * np.einsum("mia,mij,mjb->mab",
                                           g, nmat, g)  # (m, 4, 4)
        blk = b if blk is None else blk + b
    kg_loc = np.zeros((problem.nelm, 24, 24))
    for k in range(3):
        idx = 6 * np.arange(4) + k
        kg_loc[:, idx[:, None], idx[None, :]] += blk
    t = _transformation_shell(r)
    kg_glob = np.einsum("mji,mjk,mkl->mil", t, kg_loc, t)
    dm = problem.dof_map()
    kg = np.zeros((problem.ndof, problem.ndof))
    np.add.at(kg, (dm[:, :, None], dm[:, None, :]), kg_glob)
    return kg


@dataclass
class ShellBucklingResult:
    load_factors: np.ndarray       # (n_modes,) ascending positive λ
    modes: np.ndarray              # (n_modes, 6n)
    membrane_forces: np.ndarray    # (m, 3) the N state that was scaled


def shell_buckling(problem: ShellProblem, membrane_force=None,
                   n_modes: int = 4) -> ShellBucklingResult:
    """Linearized shell buckling (K + λ K_g(N)) φ = 0 on the free
    block.  N comes from the problem's OWN static solution under its
    applied loads/pressure when membrane_force is None (so λ directly
    scales the applied load), or is prescribed [N11, N22, N12] /
    (nelm, 3) in local facet axes.  Solved as the symmetric pencil
    −K_g φ = μ K φ, λ = 1/μ for the largest positive μ (the
    plane/plate pattern — K is SPD on a supported mesh, the drilling
    stabilization carrying the otherwise-null θz block)."""
    import scipy.linalg

    if membrane_force is None:
        membrane_force = solve_shell_static(problem).membrane_forces
    nf = np.asarray(membrane_force, dtype=float)
    kg = shell_geometric_stiffness(problem, nf)
    k, _ = shell_matrices(problem, with_mass=False)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    mu, vec = scipy.linalg.eigh(-kg[np.ix_(free, free)],
                                k[np.ix_(free, free)])
    pos = np.flatnonzero(mu > 1e-12 * np.abs(mu).max())
    if pos.size == 0:
        raise ValueError("the membrane force state destabilizes no "
                         "mode (all-tension N?) — shell buckling "
                         "needs a compressive component")
    order = pos[np.argsort(mu[pos])[::-1]][:n_modes]
    lam = 1.0 / mu[order]
    modes = np.zeros((order.size, problem.ndof))
    modes[:, free] = vec[:, order].T
    if nf.ndim <= 1:
        nf = np.broadcast_to(np.reshape(nf, -1), (3,))
        nf = np.broadcast_to(nf, (problem.nelm, 3))
    return ShellBucklingResult(load_factors=lam, modes=modes,
                               membrane_forces=np.array(nf))


# --------------------------------------------------------------------
# Curved-geometry mesh generators (the obstacle-course cases).


def cylinder_panel_mesh(radius: float, length: float,
                        half_angle_deg: float, nx: int, ny: int):
    """(nodes (n, 3), elements (m, 4)) faceted cylindrical panel:
    axis along y, arc ±half_angle about the CROWN (x = 0, z = R),
    y ∈ [0, length].  Node numbering arc-fastest."""
    phi = np.deg2rad(half_angle_deg)
    arcs = np.linspace(-phi, phi, nx + 1)
    ys = np.linspace(0.0, length, ny + 1)
    nodes = np.array([[radius * np.sin(a), y, radius * np.cos(a)]
                      for y in ys for a in arcs])
    elems = []
    na = nx + 1
    for j in range(ny):
        for i in range(nx):
            n0 = j * na + i
            elems.append([n0, n0 + 1, n0 + 1 + na, n0 + na])
    return nodes, np.asarray(elems, dtype=int)


def arch_strip_mesh(length: float, width: float, rise: float,
                    nx: int):
    """(nodes (n, 3), elements (m, 4)) half-sine shallow arch strip:
    elevation z = rise·sin(πx/length) over x ∈ [0, length], two node
    rows at y = 0 and y = width (nx quads).  The canonical
    snap-through geometry of the Marguerre nonlinear tier
    (solvers/shell_nonlinear.py) — under a half-sine load the
    continuum solution is EXACTLY single-mode and the whole
    equilibrium path is a closed-form cubic; x-fastest numbering."""
    xs = np.linspace(0.0, length, nx + 1)
    nodes = np.array([[x, y, rise * np.sin(np.pi * x / length)]
                      for y in (0.0, width) for x in xs])
    elems = np.array([[i, i + 1, i + 1 + (nx + 1), i + (nx + 1)]
                      for i in range(nx)], dtype=int)
    return nodes, elems


def hemisphere_mesh(radius: float, hole_deg: float, n: int):
    """(nodes, elements) one QUARTER of a hemisphere with a polar
    hole: longitude 0..90°, colatitude hole_deg..90° (the standard
    MacNeal-Harder hemispherical-shell-with-18°-hole geometry), n×n
    quads, longitude-fastest numbering."""
    lons = np.deg2rad(np.linspace(0.0, 90.0, n + 1))
    lats = np.deg2rad(np.linspace(hole_deg, 90.0, n + 1))
    nodes = np.array([[radius * np.sin(t) * np.cos(p),
                       radius * np.sin(t) * np.sin(p),
                       radius * np.cos(t)]
                      for t in lats for p in lons])
    elems = []
    npl = n + 1
    for j in range(n):
        for i in range(n):
            n0 = j * npl + i
            elems.append([n0, n0 + 1, n0 + 1 + npl, n0 + npl])
    return nodes, np.asarray(elems, dtype=int)


@dataclass
class ShellTransientResult:
    times: np.ndarray
    displacements: np.ndarray      # (n_rec, n_probe)
    dt: float
    n_steps: int


def solve_shell_transient(problem: ShellProblem, dt: float,
                          n_steps: int, damping=(0.0, 0.0),
                          amplitude=None, probe_dofs=None,
                          record_every: int = 1
                          ) -> ShellTransientResult:
    """Newmark (average acceleration) on the dense shell K/M — one LU
    of the effective operator serves every step (host float64; the
    frame-family recipe).  The mass pencil carries the same 1e-10
    drilling ridge as shell_modal (the acceleration solve needs a
    definite M).  Cross-validated against exact modal superposition
    in tests/test_shell.py."""
    import scipy.linalg

    _require_no_thermal_shell(problem, "transient")
    if dt <= 0.0 or n_steps <= 0:
        raise ValueError("transient needs positive dt and n_steps")
    k, m = shell_matrices(problem)
    m = m + 1e-10 * np.diag(m).max() * np.eye(m.shape[0])
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _load_vectors_shell(problem)
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
    a_acc = (np.linalg.solve(mf, ff * amp[0] - cf @ v - kf @ u)
             if n else np.zeros(0))
    rec_t, rec_u = [], []
    full = np.zeros(problem.ndof)
    for step in range(n_steps):
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
    return ShellTransientResult(
        times=np.asarray(rec_t), displacements=np.asarray(rec_u),
        dt=float(dt), n_steps=int(n_steps))


@dataclass
class ShellHarmonicResult:
    omegas: np.ndarray
    amplitude: np.ndarray          # (n_freq, n_probe) |X|
    real: np.ndarray
    imag: np.ndarray


def shell_harmonic(problem: ShellProblem, omegas,
                   damping=(0.0, 0.0), probe_dofs=None
                   ) -> ShellHarmonicResult:
    """Steady-state X(ω): direct dense complex solves per frequency,
    Rayleigh C = αM + βK, host float64 (the frame-family recipe; equal
    to the all-modes superposition for proportional damping —
    tests/test_shell.py)."""
    _require_no_thermal_shell(problem, "harmonic")
    om = np.asarray(omegas, dtype=float).reshape(-1)
    k, m = shell_matrices(problem)
    m = m + 1e-10 * np.diag(m).max() * np.eye(m.shape[0])
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * m + beta * k
    f0 = problem.loads + _load_vectors_shell(problem)
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
    return ShellHarmonicResult(omegas=om, amplitude=np.abs(xs),
                               real=xs.real, imag=xs.imag)


# --------------------------------------------------------------------
# Banded DEVICE tier: DIA + PCG statics and subspace-iteration modal
# for large curved meshes — the frame3d pattern with 24x24 facet
# blocks.  The membrane/plate kernels are xp-parameterized closed
# forms, so the traced builder reuses them verbatim with xp=jnp;
# facet frames and local coordinates are CONNECTIVITY+GEOMETRY data
# computed once on the host and passed as traced arrays.

_MEM_IDX = np.array([6 * a + d for a in range(4) for d in (0, 1)])
_BND_IDX = np.array([6 * a + d for a in range(4) for d in (2, 3, 4)])
_DRL_IDX = np.array([6 * a + 5 for a in range(4)])
_Q_BETA = np.zeros((12, 12))
for _a in range(4):
    _Q_BETA[3 * _a:3 * _a + 3, 3 * _a:3 * _a + 3] = _BETA_OF_THETA
del _a


# The BANDED tier's drilling ε (vs the dense tier's 1e-6): the inner
# f32 PCG (statics) and the inverse-iteration block solves (modal)
# both operate on K ALONE, whose near-null drilling subspace sits at
# α·G·t·A·ε — at ε = 1e-6 that puts κ(K) near 1e9 and the f32 solves
# collapse (measured: the subspace iteration returned a spurious
# zero Ritz value on the 12×12 panel).  ε = 1e-3 lifts the subspace
# three decades while the physical pollution stays α·ε = 1e-6 of the
# membrane stiffness — banded-vs-dense agreement still sits at the
# ordinary f32 floor (tests/test_shell.py).
_DRILL_EPS_BANDED = 1e-3


def _shell_blocks_jnp(c2, r, young, poisson, thickness, area,
                      drill_eps: float = _DRILL_EPS_BANDED):
    """(m, 24, 24) traced GLOBAL stiffness blocks from traced local
    coordinates/triads/properties.  precision="highest" on every MXU
    contraction (the bf16 symmetry rule, models/plane.py)."""
    import jax.numpy as jnp

    m = c2.shape[0]
    dtype = c2.dtype
    dmat = _plane_dmat(young, poisson, False, xp=jnp)
    km = _membrane_k(c2, dmat, thickness, 4, xp=jnp)
    kp = _k_blocks_plate(c2, young, poisson, thickness, xp=jnp)
    q = jnp.asarray(_Q_BETA, dtype)
    kp = jnp.einsum("ij,mjk,kl->mil", q.T, kp, q,
                    precision="highest")
    k = jnp.zeros((m, 24, 24), dtype)
    k = k.at[:, _MEM_IDX[:, None], _MEM_IDX[None, :]].add(km)
    k = k.at[:, _BND_IDX[:, None], _BND_IDX[None, :]].add(kp)
    g = young / (2.0 * (1.0 + poisson))
    kd = _DRILL_ALPHA * g * thickness * area
    pen = jnp.asarray((np.eye(4) - 0.25)
                      + drill_eps * np.eye(4), dtype)
    k = k.at[:, _DRL_IDX[:, None], _DRL_IDX[None, :]].add(
        kd[:, None, None] * pen)
    t = jnp.zeros((m, 24, 24), dtype)
    for off in range(0, 24, 3):
        t = t.at[:, off:off + 3, off:off + 3].set(r)
    return jnp.einsum("mji,mjk,mkl->mil", t, k, t,
                      precision="highest")


def _shell_dia_layout(problem: ShellProblem):
    """DIA layout cached on the instance (connectivity-only)."""
    import jax.numpy as jnp

    from ..ops.dia import dia_layout

    layout = getattr(problem, "_dia_layout_cache", None)
    if layout is None:
        # A structured quad midsurface has up to 9 node-neighbour
        # classes x 11 block diagonals (the solid family's budget
        # rationale).
        layout = dia_layout(problem.dof_map(), problem.ndof,
                            max_diags=224)
        problem._dia_layout_cache = layout
        problem._dia_entry_slot_dev = jnp.asarray(layout.entry_slot)
    return layout


_SHELL_BANDED_CACHE: dict = {}


def _shell_banded_core(layout, precond: str, use_pallas: bool,
                       max_iter: int, nelm: int):
    """Jitted banded shell statics, cached per structural signature
    (never per problem object — the closure recompile trap)."""
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           layout.bandwidth, nelm, precond, use_pallas, max_iter)
    core = _SHELL_BANDED_CACHE.get(key)
    if core is not None:
        return core

    import jax

    from ..ops.dia import assemble_dia_blocks, dia_cg_solve, dia_matvec
    from ..solvers.banded_inverse import DiaLayoutView

    @jax.jit
    def core(c2, r, young, poisson, thickness, area, entry_slot, f,
             mask, tol):
        kg_blocks = _shell_blocks_jnp(c2, r, young, poisson,
                                      thickness, area)
        diags = assemble_dia_blocks(
            DiaLayoutView(layout, entry_slot), kg_blocks)
        x, iters, rel = dia_cg_solve(layout, diags, f, mask, tol=tol,
                                     max_iter=max_iter,
                                     use_pallas=use_pallas,
                                     precond=precond, components=6)
        reac = (dia_matvec(layout, diags, x) - f) * (1.0 - mask)
        return x, reac, iters, rel

    _SHELL_BANDED_CACHE[key] = core
    return core


def solve_shell_static_banded(problem: ShellProblem,
                              tol: float = 1e-7,
                              max_iter: int = 40000,
                              use_pallas: bool = False,
                              precond: str = "auto", dtype=None,
                              mesh=None):
    """Large-mesh shell statics on the DEVICE tier.

    Structured curved midsurfaces (cylinders, vaults, vessels) are
    banded under grid numbering, so the whole solve rides the DIA
    pipeline (ops/dia.py): batched (m, 24, 24) facet blocks
    contracted on the MXU, one scatter into diagonal storage,
    Jacobi-PCG (the mixed membrane/bending/drilling DOF scales make
    Jacobi scaling load-bearing).  `mesh` row-block-shards the DOF
    axis over "tp" (parallel/dia_sharded).

    Returns (ShellStaticResult, iterations, relative_residual);
    resultant recovery runs on the host from the fetched field (ONE
    device_get).  Pinned against solve_shell_static at the f32 floor
    in tests/test_shell.py."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.asarray(1.0).dtype
    if precond == "auto":
        precond = "jacobi"
    layout = _shell_dia_layout(problem)
    r_np, c2_np, _ = _facet_frames(problem)
    area_np = _facet_area(c2_np)
    f_np = problem.loads + _load_vectors_shell(problem) \
        + _thermal_load_vectors_shell(problem)
    args = (jnp.asarray(c2_np, dtype), jnp.asarray(r_np, dtype),
            jnp.asarray(problem.young, dtype),
            jnp.asarray(problem.poisson, dtype),
            jnp.asarray(problem.thickness, dtype),
            jnp.asarray(area_np, dtype))
    if mesh is not None:
        from ..ops.dia import assemble_dia_blocks, dia_matvec
        from ..parallel.dia_sharded import dia_cg_solve_sharded
        from ..solvers.banded_inverse import DiaLayoutView

        kg_blocks = _shell_blocks_jnp(*args)
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
        core = _shell_banded_core(layout, precond, use_pallas,
                                  int(max_iter), problem.nelm)
        x, reac, iters, rel = core(
            *args, problem._dia_entry_slot_dev,
            jnp.asarray(f_np, dtype),
            jnp.asarray(problem.free_mask(), dtype),
            jnp.asarray(tol, dtype))
        u, reac, iters, rel = jax.device_get((x, reac, iters, rel))
    u = np.asarray(u, dtype=float)
    nf, mom = _recover_shell(problem, u)
    res = ShellStaticResult(displacements=u, membrane_forces=nf,
                            moments=mom,
                            reactions=np.asarray(reac, dtype=float))
    return res, int(iters), float(rel)


# A banded MODAL tier is deliberately NOT shipped for shells: the
# realistic thin-shell pencil has lambda_1/lambda_max(K) ~ 3e-7 (the
# 12x12 t=2.5 panel measured 13417 / 5.2e10), below the f32
# eigen-pencil floor eps32*kappa (solvers/buckling.py, CLAUDE.md) —
# inverse subspace iteration on the f32 DIA operator returned Ritz
# values wobbling 3-10% even with the explicit y'Ky Rayleigh-Ritz
# form and 1e-7 inner recurrence residuals (measured; the implicit
# y'rhs form, accurate for the truss/frame/plate pencils, is fully
# swamped here because lambda/||K|| ~ 2e-5 < the 1e-4 true inner-solve
# error).  Below DENSE_DOF_LIMIT the host f64 shell_modal serves;
# above it, thin-shell modal needs f64 or a shift-invert
# factorization the DIA pipeline does not carry.

def shell_static_response(problem: ShellProblem, young_e=None,
                          thickness_e=None, load_scale=None,
                          dtype=None, drill_eps=_DRILL_EPS_BANDED):
    """Traced, differentiable shell statics with per-element
    properties: (u, resultants (m, 6) [Nxx, Nyy, Nxy, Mxx, Myy, Mxy]
    in local facet axes, governing extreme-fiber von Mises (m,)) from
    the masked dense solve K(E, t) u = f + traced centroid recovery —
    the plane/plate `*_static_response` twin for the shell family, so
    FORM reliability and thickness sizing reach curved midsurfaces.

    The demand quantity is the EXTREME-FIBER von Mises at z = ±t/2:
    σ± = N/t ± 6M/t², vM at both fibers, elementwise max — the same
    governing-fiber convention as the shell spectrum adapter, with
    the thickness TRACED so t-sensitivities carry both the 1/t
    membrane and the 1/t²-of-(t³-stiff) bending physics exactly.

    Facet frames and consistent pressure/body-force loads depend on
    GEOMETRY only (not on E or t) and are built once in numpy; the
    drilling stabilization uses the banded tier's ε = 1e-3 (the dense
    1e-6 leaves κ(K) ~ 1e9 — beyond the default-f32 LU; physical
    pollution stays ~1e-6 of membrane stiffness, and the flat-mesh
    anchors are ε-independent because θz never engages there).
    Thermoelastic documents are refused — their consistent loads
    depend on (E, t) and the inverse families do not carry them."""
    import jax.numpy as jnp

    from .plane import _einsum, _q4_point
    from .plate import _bend_b, _shape_grads

    if problem.temperature is not None \
            or problem.temperature_gradient is not None:
        raise ValueError("the traced shell twin does not carry the "
                         "thermoelastic load case — drop temperature/"
                         "temperature_gradient for reliability or "
                         "sizing blocks")
    dtype = dtype or jnp.asarray(1.0).dtype
    m = problem.nelm
    r_np, c2_np, _ = _facet_frames(problem)
    c2 = jnp.asarray(c2_np, dtype)
    r = jnp.asarray(r_np, dtype)
    area = jnp.asarray(_facet_area(c2_np), dtype)
    young = jnp.broadcast_to(jnp.asarray(
        problem.young if young_e is None else young_e, dtype), (m,))
    poisson = jnp.broadcast_to(jnp.asarray(problem.poisson, dtype),
                               (m,))
    thickness = jnp.broadcast_to(jnp.asarray(
        problem.thickness if thickness_e is None else thickness_e,
        dtype), (m,))
    blocks = _shell_blocks_jnp(c2, r, young, poisson, thickness,
                               area, drill_eps=drill_eps)
    dm = jnp.asarray(problem.dof_map())
    k = jnp.zeros((problem.ndof, problem.ndof), dtype).at[
        dm[:, :, None], dm[:, None, :]].add(blocks)
    f = jnp.asarray(problem.loads + _load_vectors_shell(problem),
                    dtype)
    if load_scale is not None:
        f = f * jnp.asarray(load_scale, dtype)
    mask = jnp.asarray(problem.free_mask(), dtype)
    km = mask[:, None] * k * mask[None, :] + jnp.diag(1.0 - mask)
    u = jnp.linalg.solve(km, f * mask) * mask

    # Traced centroid recovery in the local facet axes
    # (_recover_shell's algebra on jnp).
    t24 = jnp.zeros((m, 24, 24), dtype)
    for off in range(0, 24, 3):
        t24 = t24.at[:, off:off + 3, off:off + 3].set(r)
    u_loc = _einsum(jnp, "mij,mj->mi", t24, u[dm])
    bmem, _ = _q4_point(c2, 0.0, 0.0, xp=jnp)
    eps = _einsum(jnp, "mia,ma->mi", bmem,
                  u_loc[:, jnp.asarray(_MEM_IDX)])
    dmat = _plane_dmat(young, poisson, False, xp=jnp)
    nf = thickness[:, None] * _einsum(jnp, "mij,mj->mi", dmat, eps)
    q = jnp.asarray(_Q_BETA, dtype)
    u_plate = _einsum(jnp, "ij,mj->mi", q,
                      u_loc[:, jnp.asarray(_BND_IDX)])
    _, dx, dy, _ = _shape_grads(c2, 0.0, 0.0, xp=jnp)
    kap = _einsum(jnp, "mia,ma->mi", _bend_b(dx, dy, xp=jnp),
                  u_plate)
    d0 = young * thickness ** 3 / (12.0 * (1.0 - poisson ** 2))
    mom = jnp.stack([d0 * (kap[:, 0] + poisson * kap[:, 1]),
                     d0 * (kap[:, 1] + poisson * kap[:, 0]),
                     d0 * (1.0 - poisson) / 2.0 * kap[:, 2]],
                    axis=-1)
    vm = shell_fiber_vm(nf, mom, thickness, xp=jnp)
    return u, jnp.concatenate([nf, mom], axis=-1), vm

def identify_shell_young(problem: ShellProblem, measured_dofs,
                         measured_disp, n_iter: int = 800,
                         learning_rate: float = 0.05,
                         field: bool = False, seed: int = 0,
                         hidden_layers: int = 2,
                         neurons_per_layer: int = 16):
    """Recover Young's modulus from measured shell displacements —
    the plane/plate identification contract on curved midsurfaces
    (damage localization on roofs / vessels from survey points).

    field=False: per-facet log-E ADAM; field=True: a smooth E(x,y,z)
    MLP (models/fields.py, input_dim=3) at facet centroids trained
    through the traced solve (shell_static_response).  Identification
    is at KNOWN thickness — shell data sees E t (membrane) and E t³
    (bending), so (E, t) are only jointly identifiable (the plate
    family's identifiability note, with the membrane adding one
    ratio).  Returns (young (m,), loss_history, field|None)."""
    import jax
    import jax.numpy as jnp
    import optax

    meas_idx = jnp.asarray(np.asarray(measured_dofs,
                                      dtype=int).reshape(-1))
    meas = jnp.asarray(np.asarray(measured_disp,
                                  dtype=float).reshape(-1))
    centroids = jnp.asarray(
        problem.nodes[problem.elements].mean(axis=1))
    # Measurement-scale-normalized loss (the framework-wide ADAM
    # stall fix — solvers/banded_inverse.py).
    meas_scale = float(max(np.mean(np.asarray(measured_disp,
                                              dtype=float) ** 2),
                           1e-300))

    def u_of(young_e):
        u, _, _ = shell_static_response(problem, young_e=young_e)
        return u

    if field:
        from .fields import make_mlp_field

        params0 = make_mlp_field(jax.random.PRNGKey(seed),
                                 hidden_layers=hidden_layers,
                                 neurons_per_layer=neurons_per_layer,
                                 input_dim=3,
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


def identify_shell_young_banded(problem: ShellProblem, measured_dofs,
                                measured_disp, n_iter: int = 300,
                                learning_rate: float = 0.05,
                                tol: float = 1e-7,
                                max_iter: int = 20000,
                                zones=None, field: bool = False,
                                seed: int = 0, hidden_layers: int = 2,
                                neurons_per_layer: int = 16):
    """identify_shell_young past DENSE_DOF_LIMIT: forward = the
    Jacobi-scaled banded PCG (the shell's mixed membrane/bending/
    drilling DOF scales), reverse = one adjoint PCG through the
    shared solvers/banded_inverse.identify_young_banded — only the
    (m, 24, 24) facet block builder is shell-specific.
    zones=[[ids..], ..] gives one log-E per zone (patch damage
    localization on a curved roof)."""
    import jax.numpy as jnp

    from ..solvers.banded_inverse import identify_young_banded

    _require_no_thermal_shell(problem, "banded identification")
    layout = _shell_dia_layout(problem)
    m = problem.nelm
    dtype = jnp.asarray(1.0).dtype
    r_np, c2_np, _ = _facet_frames(problem)
    c2 = jnp.asarray(c2_np, dtype)
    r = jnp.asarray(r_np, dtype)
    area = jnp.asarray(_facet_area(c2_np), dtype)
    poisson = jnp.broadcast_to(jnp.asarray(problem.poisson, dtype),
                               (m,))
    thickness = jnp.broadcast_to(jnp.asarray(problem.thickness,
                                             dtype), (m,))

    def blocks_of(young_e):
        return _shell_blocks_jnp(c2, r, young_e, poisson, thickness,
                                 area)

    return identify_young_banded(
        layout, problem._dia_entry_slot_dev, blocks_of,
        np.broadcast_to(np.asarray(problem.young, dtype=float),
                        (m,)).copy(),
        problem.nodes[problem.elements].mean(axis=1),
        problem.loads + _load_vectors_shell(problem),
        problem.free_mask(), measured_dofs, measured_disp,
        n_iter=n_iter, learning_rate=learning_rate, tol=tol,
        max_iter=max_iter, zones=zones, field=field, seed=seed,
        hidden_layers=hidden_layers,
        neurons_per_layer=neurons_per_layer, input_dim=3)
