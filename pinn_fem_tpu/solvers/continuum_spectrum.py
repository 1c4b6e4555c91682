"""Response-spectrum and random-vibration analysis for the CONTINUUM
and FRAME families (plane CST/Q4, solid hex8, Euler-Bernoulli frames)
— the truss seismic/stochastic machinery (solvers/spectrum.py,
solvers/random_response.py) on the consistent-mass modal data of
models/plane.py / models/solid.py / models/frame.py.

Response spectrum (single excitation direction d, design spectrum
Sa(omega)):

    Gamma_j = phi_j^T M r          (phi M-orthonormal, r = unit rigid
                                    motion along d on the FREE DOFs)
    peak     u_j = Gamma_j phi_j Sa(omega_j) / omega_j^2
    combined SRSS / CQC (Der Kiureghian rho, equal damping) — reusing
    the truss _cqc_rho so the two families can never drift.

Stress combination follows the per-QUANTITY rule: each Voigt stress
component is combined across modes (SRSS/CQC of the MODAL centroid
stresses — combining the stress of the combined displacement field
would be wrong, since the combination destroys the modal sign
structure), and the reported von Mises is computed FROM the combined
components.  That von Mises is the standard design-code estimate: it
is conservative for in-phase components and is NOT a strict bound —
the docstring of the result field says so, and so does the JSON tier.

Random vibration: S_u(omega) = |H(omega)|^2 S_p(omega) on the families'
own dense FRF sweeps (plane_harmonic / solid_harmonic — direct complex
solves, float64 host), RMS by trapezoid over the omega grid.  The grid
must resolve the resonance peaks (half-power bandwidth 2 zeta omega_n);
zero damping is rejected because the variance integral diverges
(solvers/random_response.py doctrine).

Closed-form anchors (tests/test_continuum_spectrum.py): a single-free-
DOF Q4/hex8 is EXACTLY the SDOF textbook case — spectrum peak
u = Gamma phi Sa / omega^2 by hand, white-noise variance
sigma^2 = F^2 pi S0 / (2 k c).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Union

import numpy as np

from .spectrum import _cqc_rho


class _Family(NamedTuple):
    dim: int             # spatial dimension of the excitation
    modal: object        # (problem, n_modes) -> (omegas, shapes (J, ndof))
    mass: object         # (problem) -> dense consistent M (ndof, ndof)
    stresses: object     # (problem, u) -> (m, q) signed modal quantities
    vm: object           # (problem, comb (m, q)) -> (m,) governing stress
    influence: object    # (problem, d) -> unmasked rigid-motion vector
    lam_bound: object    # (problem) -> upper bound on lambda (Gershgorin)
    harmonic: object     # (problem, omegas, damping, probe) -> result


def _tile_influence(problem, dim):
    def influence(p, d):
        return np.tile(d, p.ndof // dim)
    return influence


def _family_of(problem) -> _Family:
    from ..models.plane import PlaneProblem

    if isinstance(problem, PlaneProblem):
        from ..models import plane as P

        return _Family(
            dim=2,
            modal=lambda p, n: _unpack_modal(P.plane_modal(p, n)),
            mass=lambda p: P.plane_matrices(p)[1],
            stresses=lambda p, u: P.recover_stresses(p, u)[0],
            vm=lambda p, s: _vm_of_components(p, 2, s),
            influence=_tile_influence(problem, 2),
            lam_bound=lambda p: (2.0 / P.plane_stable_dt(
                p, safety=1.0)) ** 2,
            harmonic=P.plane_harmonic)
    from ..models.solid import SolidProblem

    if isinstance(problem, SolidProblem):
        from ..models import solid as S

        return _Family(
            dim=3,
            modal=lambda p, n: _unpack_modal(S.solid_modal(p, n)),
            mass=lambda p: S.solid_matrices(p)[1],
            stresses=lambda p, u: S.recover_stresses3(p, u)[0],
            vm=lambda p, s: _vm_of_components(p, 3, s),
            influence=_tile_influence(problem, 3),
            lam_bound=lambda p: (2.0 / S.solid_stable_dt(
                p, safety=1.0)) ** 2,
            harmonic=S.solid_harmonic)
    from ..models.frame import FrameProblem

    if isinstance(problem, FrameProblem):
        from ..models import frame as F

        def frame_end_forces(p, u):
            # LOCAL member end forces [N1,V1,M1,N2,V2,M2] of a modal
            # displacement state (no member loads in a mode shape).
            length, c, s = F._geometry(p)
            t = F._rotation(c, s)
            kl = F._k_local(p.young, p.area, p.inertia, length)
            u_loc = np.einsum("mij,mj->mi", t, u[p.dof_map()])
            return np.einsum("mij,mj->mi", kl, u_loc)

        def frame_stress(p, comb):
            # Extreme-fiber |N|/A + max-end |M|/S of the COMBINED end
            # forces (per-quantity rule); axial-only without a
            # section_modulus.
            n_comb = np.maximum(comb[:, 0], comb[:, 3])
            sig = n_comb / p.area
            if p.section_modulus is not None:
                sig = sig + np.maximum(comb[:, 2], comb[:, 5]) \
                    / p.section_modulus
            return sig

        def frame_influence(p, d):
            # 3 DOFs per node (x, y, theta): ground motion excites the
            # translations; rotations carry no rigid-body component.
            r = np.zeros(p.ndof)
            r[0::3] = d[0]
            r[1::3] = d[1]
            return r

        def frame_lam_bound(p):
            k, _ = F.frame_matrices(p)
            m = F.frame_lumped_mass_diag(p)
            mask = p.free_mask() > 0
            row = np.abs(k).sum(axis=1) / np.maximum(m, 1e-300)
            return float(row[mask].max() if mask.any() else row.max())

        return _Family(
            dim=2,
            modal=lambda p, n: _unpack_modal(F.frame_modal(p, n)),
            mass=lambda p: F.frame_matrices(p)[1],
            stresses=frame_end_forces,
            vm=frame_stress,
            influence=frame_influence,
            lam_bound=frame_lam_bound,
            harmonic=F.frame_harmonic)
    from ..models.plate import PlateProblem

    if isinstance(problem, PlateProblem):
        from ..models import plate as PL

        def plate_stress(p, u):
            # Signed extreme-fiber bending stress components
            # σ = 6M/t² (Voigt [xx, yy, xy]) of a modal displacement
            # state — the per-quantity combination rule's inputs.
            mom, _, _ = PL.recover_moments(p, u)
            return 6.0 * mom / p.thickness[:, None] ** 2

        def plate_vm(p, s):
            sxx, syy, sxy = s[:, 0], s[:, 1], s[:, 2]
            return np.sqrt(sxx ** 2 - sxx * syy + syy ** 2
                           + 3.0 * sxy ** 2)

        def plate_influence(p, d):
            # Transverse (z) base excitation: the w DOFs carry the
            # rigid-body motion; the rotations carry none.
            r = np.zeros(p.ndof)
            r[0::3] = d[0]
            return r

        def plate_lam_bound(p):
            # Gershgorin over the FREE w ROWS only: the rotation
            # rows' rotary inertia ~ρt³/12 pushes the all-rows bound
            # up as 1/t² (the thickness-shear cutoff), so a healthy
            # thin plate's first bending mode sits at λ₁/λ_bound ~ t⁴
            # and would trip the mechanism guard (measured: 2.7e-8 on
            # a t=0.1 strip).  The transverse rows — shear stiffness
            # over ρt·(tributary area) — share the other families'
            # ~1e-5 margin while a true mechanism still lands at
            # ~eps·λ_bound.
            k, m = PL.plate_matrices(p)
            md = np.abs(np.asarray(m).sum(axis=1))
            mask = p.free_mask() > 0
            sel = mask.copy()
            sel[1::3] = sel[2::3] = False
            if not sel.any():
                sel = mask if mask.any() else ~mask
            row = np.abs(k).sum(axis=1) / np.maximum(md, 1e-300)
            return float(row[sel].max())

        return _Family(
            dim=1,
            modal=lambda p, n: _unpack_modal(PL.plate_modal(p, n)),
            mass=lambda p: PL.plate_matrices(p)[1],
            stresses=plate_stress,
            vm=plate_vm,
            influence=plate_influence,
            lam_bound=plate_lam_bound,
            harmonic=PL.plate_harmonic)
    from ..models.frame3d import SpaceFrameProblem

    if isinstance(problem, SpaceFrameProblem):
        from ..models import frame3d as F3

        def sf_stress(p, comb):
            # Combined-quantity governing stress: axial |N|/A per
            # member end maximum (the 2D frame family's axial-only
            # convention — SpaceFrameProblem carries no
            # section_modulus field).
            n_comb = np.maximum(comb[:, 0], comb[:, 6])
            return n_comb / p.area

        def sf_influence(p, d):
            # 6 DOFs per node: ground motion excites the three
            # translations; rotations carry no rigid-body component.
            r = np.zeros(p.ndof)
            for ax in range(3):
                r[ax::6] = d[ax]
            return r

        def sf_lam_bound(p):
            # Dense exact top generalized eigenvalue — the family is
            # dense-tier, so the O(n³) eigh IS affordable and the
            # bound is tight (no lumped-diagonal Gershgorin heuristic
            # over the mixed translation/rotation scales).
            import scipy.linalg

            k, m = F3.space_frame_matrices(p)
            free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
            lam = scipy.linalg.eigh(k[np.ix_(free, free)],
                                    m[np.ix_(free, free)],
                                    eigvals_only=True)
            return float(lam[-1])

        return _Family(
            dim=3,
            modal=lambda p, n: _unpack_modal(
                F3.space_frame_modal(p, n)),
            mass=lambda p: F3.space_frame_matrices(p)[1],
            stresses=lambda p, u: F3.space_frame_end_forces(p, u),
            vm=sf_stress,
            influence=sf_influence,
            lam_bound=sf_lam_bound,
            harmonic=F3.space_frame_harmonic)
    from ..models.shell import ShellProblem

    if isinstance(problem, ShellProblem):
        from ..models import shell as SH

        def shell_stress(p, u):
            # Per-element stress resultants of a displacement state:
            # [Nxx, Nyy, Nxy, Mxx, Myy, Mxy] (local facet axes) — the
            # per-quantity combination rule's inputs.
            nf, mom = SH._recover_shell(p, u)
            return np.concatenate([nf, mom], axis=1)

        def shell_vm(p, comb):
            # Governing extreme-fiber von Mises of the COMBINED
            # resultants — the shared demand convention
            # (models/shell.py:shell_fiber_vm).
            return SH.shell_fiber_vm(comb[:, :3], comb[:, 3:],
                                     p.thickness)

        def shell_influence(p, d):
            r = np.zeros(p.ndof)
            for ax in range(3):
                r[ax::6] = d[ax]
            return r

        def shell_lam_bound(p):
            # Dense exact top generalized eigenvalue on the
            # ridge-regularized pencil (the frame3d rationale).
            import scipy.linalg

            k, m = SH.shell_matrices(p)
            m = m + 1e-10 * np.diag(m).max() * np.eye(m.shape[0])
            free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
            lam = scipy.linalg.eigh(k[np.ix_(free, free)],
                                    m[np.ix_(free, free)],
                                    eigvals_only=True)
            return float(lam[-1])

        return _Family(
            dim=3,
            modal=lambda p, n: _unpack_modal(SH.shell_modal(p, n)),
            mass=lambda p: SH.shell_matrices(p)[1],
            stresses=shell_stress,
            vm=shell_vm,
            influence=shell_influence,
            lam_bound=shell_lam_bound,
            harmonic=SH.shell_harmonic)
    raise TypeError("continuum spectrum/random needs a PlaneProblem, "
                    "SolidProblem, FrameProblem, SpaceFrameProblem, "
                    f"ShellProblem or PlateProblem, got "
                    f"{type(problem).__name__}")


def _unpack_modal(res):
    return np.asarray(res.omegas), np.asarray(res.mode_shapes)


class ContinuumSpectrumResult(NamedTuple):
    displacements: np.ndarray    # (ndof,) combined peak |u| (>= 0)
    modal_peaks: np.ndarray      # (J, ndof) signed per-mode peaks
    omegas: np.ndarray           # (J,)
    participation: np.ndarray    # (J,) Gamma_j
    effective_mass: np.ndarray   # (J,) Gamma_j^2
    mass_fraction: float         # sum / total directional mass
    combination: str
    stresses: np.ndarray         # (m, ncomp) per-component combined
    # von Mises OF the combined components — the design-code estimate,
    # conservative for in-phase modes, NOT a strict bound.
    von_mises: np.ndarray        # (m,)
    modal_stresses: np.ndarray   # (J, m, ncomp) signed


def continuum_response_spectrum(
    problem,
    spectrum: Union[Callable[[np.ndarray], np.ndarray], float],
    direction: Optional[Sequence[float]] = None,
    n_modes: int = 6,
    combination: str = "srss",
    damping_ratio: float = 0.05,
) -> ContinuumSpectrumResult:
    """Peak seismic response of a plane/solid mesh by modal
    combination (module docstring)."""
    fam = _family_of(problem)
    d = np.zeros(fam.dim)
    if direction is None:
        d[0] = 1.0
    else:
        arr = np.asarray(direction, dtype=float).reshape(-1)
        if arr.size != fam.dim:
            raise ValueError(
                f"direction must have {fam.dim} component(s) for "
                f"{type(problem).__name__}"
                + (" (plates are excited transversely — omit "
                   '"direction" or pass [1])' if fam.dim == 1 else ""))
        d[:] = arr
        nrm = np.linalg.norm(d)
        if nrm == 0:
            raise ValueError("direction must be nonzero")
        d /= nrm

    omegas, phi = fam.modal(problem, int(n_modes))
    # Mechanism guard (the truss lesson, solvers/spectrum.py:110): a
    # near-zero frequency makes Sa/omega^2 unbounded; the absolute
    # scale is the Gershgorin bound, not omega_max.
    lam_bound = fam.lam_bound(problem)
    if omegas.size and float(omegas.min()) ** 2 < 1e-6 * lam_bound:
        raise ValueError(
            "the mesh carries a (near-)zero-frequency mechanism mode "
            f"(lambda_min/lambda_bound = "
            f"{omegas.min() ** 2 / lam_bound:.1e}); its Sa/omega^2 "
            "peak response is unbounded — check the supports")

    m = fam.mass(problem)
    mask = problem.free_mask()
    r = fam.influence(problem, d) * mask
    mr = m @ r
    gamma = phi @ mr                                  # (J,)
    sa = (spectrum(omegas) if callable(spectrum)
          else float(spectrum) * np.ones_like(omegas))
    peaks = (gamma * sa / omegas**2)[:, None] * phi   # (J, ndof)

    sig_modal = np.stack([fam.stresses(problem, peaks[j])
                          for j in range(peaks.shape[0])]) \
        if peaks.shape[0] else np.zeros((0, problem.nelm, 1))

    if combination == "srss":
        combined = np.sqrt(np.sum(peaks**2, axis=0))
        sig_comb = np.sqrt(np.sum(sig_modal**2, axis=0))
    elif combination == "cqc":
        rho = _cqc_rho(omegas, float(damping_ratio))
        combined = np.sqrt(np.maximum(
            np.einsum("ij,ik,jk->k", rho, peaks, peaks), 0.0))
        sig_comb = np.sqrt(np.maximum(
            np.einsum("ij,ikc,jkc->kc", rho, sig_modal, sig_modal),
            0.0))
    else:
        raise ValueError('combination must be "srss" or "cqc"')

    # Governing stress OF the combined components (docstring caveat):
    # continuum von Mises, frame extreme-fiber |N|/A + |M|/S.
    vm = fam.vm(problem, sig_comb)
    total = float(r @ mr)
    eff = gamma**2
    return ContinuumSpectrumResult(
        displacements=combined, modal_peaks=peaks, omegas=omegas,
        participation=gamma, effective_mass=eff,
        mass_fraction=float(eff.sum() / max(total, 1e-30)),
        combination=combination, stresses=sig_comb, von_mises=vm,
        modal_stresses=sig_modal)


def _vm_of_components(problem, dim: int, sig: np.ndarray) -> np.ndarray:
    if dim == 2:
        sxx, syy, sxy = sig[:, 0], sig[:, 1], sig[:, 2]
        if problem.plane_strain:
            szz = problem.poisson * (sxx + syy)
            return np.sqrt(0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2
                                  + (szz - sxx) ** 2) + 3.0 * sxy ** 2)
        return np.sqrt(sxx**2 - sxx * syy + syy**2 + 3.0 * sxy**2)
    sxx, syy, szz = sig[:, 0], sig[:, 1], sig[:, 2]
    syz, sxz, sxy = sig[:, 3], sig[:, 4], sig[:, 5]
    return np.sqrt(0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2
                          + (szz - sxx) ** 2)
                   + 3.0 * (sxy**2 + syz**2 + sxz**2))


class ContinuumRandomResult(NamedTuple):
    omegas: np.ndarray          # (n_freq,)
    psd: np.ndarray             # (n_freq, n_probe) one-sided S_u
    rms: np.ndarray             # (n_probe,)
    frf_amplitude: np.ndarray   # (n_freq, n_probe) |H|


def continuum_random_response(
    problem,
    load_psd: Union[Callable[[np.ndarray], np.ndarray], float],
    omegas,
    damping=(0.0, 0.0),
    probe_dofs: Optional[np.ndarray] = None,
) -> ContinuumRandomResult:
    """Displacement PSDs and RMS of a plane/solid mesh under a
    stationary random multiplier of its load pattern (module
    docstring)."""
    fam = _family_of(problem)
    om = np.asarray(omegas, dtype=float).reshape(-1)
    if om.size < 2 or np.any(np.diff(om) <= 0):
        raise ValueError("omegas must be an increasing grid "
                         "(>= 2 points)")
    if float(damping[0]) == 0.0 and float(damping[1]) == 0.0:
        raise ValueError("random response needs nonzero damping — the "
                         "undamped variance integral diverges")
    h = fam.harmonic(problem, om, damping=damping,
                     probe_dofs=probe_dofs)
    sp = (load_psd(om) if callable(load_psd)
          else float(load_psd) * np.ones_like(om))
    sp = np.broadcast_to(np.asarray(sp, dtype=float), om.shape)
    if np.any(sp < 0):
        raise ValueError("a PSD cannot be negative")
    amp = np.asarray(h.amplitude, dtype=float)
    s_u = amp**2 * sp[:, None]
    var = np.trapezoid(s_u, om, axis=0)
    return ContinuumRandomResult(omegas=om, psd=s_u,
                                 rms=np.sqrt(var),
                                 frf_amplitude=amp)


# ---------------------------------------------------------------------
# Frequency-domain fatigue for the continuum families: complex stress
# FRFs + Preumont's EQUIVALENT VON MISES SPECTRUM.  For a single
# scalar load multiplier with PSD S_p, the stress cross-PSD matrix is
# rank-one — S_sig(omega) = sigma(omega) sigma(omega)^H S_p — so the
# equivalent uniaxial PSD has the closed form
#
#     S_eq(omega) = sigma(omega)^H Q sigma(omega) * S_p(omega)
#
# with Q the von Mises quadratic form (vM^2 = sigma^T Q sigma for real
# stresses).  S_eq is the standard multiaxial reduction for spectral
# fatigue (Preumont & Piefort 1994); for a uniaxial stress state it
# reduces EXACTLY to the single-component PSD — the test anchor.

_VM_Q6 = np.array([
    [1.0, -0.5, -0.5, 0.0, 0.0, 0.0],
    [-0.5, 1.0, -0.5, 0.0, 0.0, 0.0],
    [-0.5, -0.5, 1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 3.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 3.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 0.0, 3.0],
])


def continuum_stress_frf(problem, omegas, damping=(0.0, 0.0),
                         probe_elements=None) -> np.ndarray:
    """Complex centroid stress FRFs to the problem's load pattern:
    (n_freq, n_probe_elm, 6) full Voigt [xx, yy, zz, yz, xz, xy]
    (plane stress: zz = 0; plane strain: zz = nu (xx + yy)).  Dense
    float64 host sweep — the harmonic-family tier."""
    from ..models.plane import PlaneProblem
    from ..models.solid import SolidProblem

    om = np.asarray(omegas, dtype=float).reshape(-1)
    prescribed = getattr(problem, "prescribed", None)  # plates: none
    if prescribed is not None and np.any(prescribed):
        raise ValueError("stress FRFs support homogeneous supports "
                         "only (the harmonic-family guard)")
    if isinstance(problem, PlaneProblem):
        from ..models import plane as P

        k, mm = P.plane_matrices(problem)
        b = P._centroid_b(problem)
        dmat = P._dmat(problem.young, problem.poisson,
                       problem.plane_strain)
        f0 = problem.loads + P._body_force_vectors(problem)
        dm = problem.dof_map()
        nu = np.broadcast_to(np.asarray(problem.poisson, dtype=float),
                             (problem.nelm,))
        ps = problem.plane_strain

        def sig6_of(u):
            eps = np.einsum("mia,ma->mi", b, u[dm])
            s3 = np.einsum("mij,mj->mi", dmat, eps)
            out = np.zeros((s3.shape[0], 6), dtype=s3.dtype)
            out[:, 0], out[:, 1], out[:, 5] = s3[:, 0], s3[:, 1], \
                s3[:, 2]
            if ps:
                out[:, 2] = nu * (s3[:, 0] + s3[:, 1])
            return out
    elif isinstance(problem, SolidProblem):
        from ..models import solid as S

        k, mm = S.solid_matrices(problem)
        b = S._centroid_b3(problem)
        dmat = S._dmat3(problem.young, problem.poisson)
        f0 = problem.loads + S._body_force_vectors3(problem)
        dm = problem.dof_map()

        def sig6_of(u):
            eps = np.einsum("mia,ma->mi", b, u[dm])
            return np.einsum("mij,mj->mi", dmat, eps)
    else:
        from ..models.plate import PlateProblem

        if isinstance(problem, PlateProblem):
            # Plates: EXTREME-FIBER bending stress σ = 6M/t² at
            # z = ±t/2 (where Reissner's parabolic transverse shear
            # vanishes) — a linear functional of the response, so a
            # legitimate complex FRF; padded to Voigt-6 plane stress.
            from ..models import plate as PL

            PL._require_no_thermal(problem, "stress FRFs")
            k, mm = PL.plate_matrices(problem)
            coords = problem.coords()
            db, _ = PL._dmats(problem.young, problem.poisson,
                              problem.thickness)
            _, dx, dy, _ = PL._shape_grads(coords, 0.0, 0.0)
            bb = PL._bend_b(dx, dy)
            f0 = problem.loads + PL._pressure_vectors(problem)
            dm = problem.dof_map()
            t2 = problem.thickness ** 2

            def sig6_of(u):
                kap = np.einsum("mia,ma->mi", bb, u[dm])
                s3 = 6.0 * np.einsum("mij,mj->mi", db, kap) \
                    / t2[:, None]
                out = np.zeros((s3.shape[0], 6), dtype=s3.dtype)
                out[:, 0], out[:, 1], out[:, 5] = (s3[:, 0], s3[:, 1],
                                                   s3[:, 2])
                return out
        else:
            raise TypeError(
                "stress FRFs cover the plane/solid/plate continuum "
                "families; for trusses use random_response's force "
                "PSDs and for frames the member-force FRF path, got "
                f"{type(problem).__name__}")

    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * mm + beta * k
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf, mf, cf, ff = (k[np.ix_(free, free)], mm[np.ix_(free, free)],
                      c[np.ix_(free, free)], f0[free])
    probe = (np.arange(problem.nelm) if probe_elements is None
             else np.asarray(probe_elements, dtype=int).reshape(-1))
    out = np.zeros((om.size, probe.size, 6), dtype=complex)
    full = np.zeros(problem.ndof, dtype=complex)
    for i, w in enumerate(om):
        a = kf - (w * w) * mf + 1j * w * cf
        full[free] = np.linalg.solve(a, ff)
        out[i] = sig6_of(full)[probe]
    return out


class ContinuumFatigueResult(NamedTuple):
    omegas: np.ndarray        # (n_freq,)
    eq_psd: np.ndarray        # (n_freq, n_elm) equivalent vM PSD
    eq_rms: np.ndarray        # (n_elm,)
    fatigue: object           # solvers.fatigue.SpectralFatigue
    probe_elements: np.ndarray


def continuum_spectral_fatigue(
    problem,
    load_psd,
    omegas,
    damping=(0.0, 0.0),
    probe_elements=None,
    sn_exponent=None,
    sn_coefficient=None,
    method: str = "dirlik",
    duration=None,
) -> ContinuumFatigueResult:
    """Frequency-domain fatigue of a plane/solid mesh under a
    stationary load-multiplier PSD: Preumont equivalent von Mises
    PSDs per element through spectral_fatigue (Dirlik / narrowband)."""
    from .fatigue import spectral_fatigue

    om = np.asarray(omegas, dtype=float).reshape(-1)
    if om.size < 2 or np.any(np.diff(om) <= 0):
        raise ValueError("omegas must be an increasing grid "
                         "(>= 2 points)")
    if float(damping[0]) == 0.0 and float(damping[1]) == 0.0:
        raise ValueError("spectral fatigue needs nonzero damping — "
                         "the undamped variance integral diverges")
    sp = (load_psd(om) if callable(load_psd)
          else float(load_psd) * np.ones_like(om))
    sp = np.broadcast_to(np.asarray(sp, dtype=float), om.shape)
    if np.any(sp < 0):
        raise ValueError("a PSD cannot be negative")
    probe = (np.arange(problem.nelm) if probe_elements is None
             else np.asarray(probe_elements, dtype=int).reshape(-1))
    from ..models.frame import FrameProblem

    if isinstance(problem, FrameProblem):
        # Frames: the von Mises reduction is quadratic and has no
        # member counterpart; assess ALL FOUR extreme-fiber stress
        # FRFs (each linear, so a true FRF) and keep the GOVERNING
        # fiber per member — max damage rate with an S-N curve, max
        # RMS for the statistics-only summary.
        frf = frame_fiber_stress_frf(problem, om, damping=damping,
                                     probe_elements=probe)
        psd4 = np.abs(frf) ** 2 * sp[:, None, None]
        flat = psd4.reshape(om.size, -1)
        sf4 = spectral_fatigue(om, flat, sn_exponent, sn_coefficient,
                               method=method,
                               duration=(None if duration is None
                                         else float(duration)))
        score = (sf4.damage_rate if sn_exponent is not None
                 else sf4.rms).reshape(probe.size, 4)
        pick = np.argmax(score, axis=1)
        sf = _select_fatigue_rows(sf4,
                                  np.arange(probe.size) * 4 + pick)
        eq_psd = psd4[:, np.arange(probe.size), pick]
        return ContinuumFatigueResult(
            omegas=om, eq_psd=eq_psd, eq_rms=np.asarray(sf.rms),
            fatigue=sf, probe_elements=probe)
    from ..models.shell import ShellProblem

    if isinstance(problem, ShellProblem):
        # Shells: both extreme fibers z = ±t/2 carry a full Voigt
        # stress FRF σ± = N/t ± 6M/t² (each linear, so a true FRF);
        # the Preumont equivalent-vM reduction runs PER FIBER and the
        # GOVERNING fiber per facet is kept — the frame family's
        # 4-fiber doctrine with 2 membrane+bending fibers.
        frf = shell_fiber_stress_frf(problem, om, damping=damping,
                                     probe_elements=probe)
        quad = np.einsum("fmki,ij,fmkj->fmk", frf.conj(), _VM_Q6,
                         frf).real
        psd2 = quad * sp[:, None, None]
        flat = psd2.reshape(om.size, -1)
        sf2 = spectral_fatigue(om, flat, sn_exponent, sn_coefficient,
                               method=method,
                               duration=(None if duration is None
                                         else float(duration)))
        score = (sf2.damage_rate if sn_exponent is not None
                 else sf2.rms).reshape(probe.size, 2)
        pick = np.argmax(score, axis=1)
        sf = _select_fatigue_rows(sf2,
                                  np.arange(probe.size) * 2 + pick)
        eq_psd = psd2[:, np.arange(probe.size), pick]
        return ContinuumFatigueResult(
            omegas=om, eq_psd=eq_psd, eq_rms=np.asarray(sf.rms),
            fatigue=sf, probe_elements=probe)
    frf = continuum_stress_frf(problem, om, damping=damping,
                               probe_elements=probe)
    quad = np.einsum("fmi,ij,fmj->fm", frf.conj(), _VM_Q6, frf).real
    eq_psd = quad * sp[:, None]
    sf = spectral_fatigue(om, eq_psd, sn_exponent, sn_coefficient,
                          method=method,
                          duration=(None if duration is None
                                    else float(duration)))
    return ContinuumFatigueResult(
        omegas=om, eq_psd=eq_psd, eq_rms=np.asarray(sf.rms),
        fatigue=sf, probe_elements=probe)


def _select_fatigue_rows(sf_all, sel):
    """Select the governing-fiber rows out of a flat spectral-fatigue
    result (dataclass or NamedTuple) — shared by the frame 4-fiber
    and shell 2-fiber paths."""
    import dataclasses as _dc

    def take(v):
        if v is None:
            return None
        arr = np.asarray(v)
        return arr.reshape(-1)[sel] if arr.ndim else arr

    if _dc.is_dataclass(sf_all):
        return _dc.replace(
            sf_all, **{f.name: take(getattr(sf_all, f.name))
                       for f in _dc.fields(sf_all)
                       if isinstance(getattr(sf_all, f.name),
                                     np.ndarray)})
    return sf_all._replace(**{k2: take(v) for k2, v in
                              sf_all._asdict().items()
                              if isinstance(v, np.ndarray)})


def shell_fiber_stress_frf(problem, omegas, damping=(0.0, 0.0),
                           probe_elements=None) -> np.ndarray:
    """Complex EXTREME-FIBER stress FRFs of a shell's facets:
    (n_freq, n_probe, 2, 6) full Voigt [xx, yy, zz, yz, xz, xy]
    (local facet axes, zz = 0 — each fiber is a plane-stress state)
    for the two fibers z = ±t/2: σ± = N/t ± 6M/t², each a LINEAR
    functional of the complex response.  The centroid N/M recovery is
    models/shell.py:_recover_shell's algebra on the complex field;
    dense float64 host sweep with the family's 1e-10 drilling mass
    ridge (shell_modal's rationale)."""
    from ..models import shell as SH
    from ..models.plane import _dmat as _plane_dmat
    from ..models.plane import _q4_point
    from ..models.plate import _bend_b, _shape_grads

    if not isinstance(problem, SH.ShellProblem):
        raise TypeError("shell_fiber_stress_frf needs a "
                        f"ShellProblem, got {type(problem).__name__}")
    SH._require_no_thermal_shell(problem, "stress FRFs")
    om = np.asarray(omegas, dtype=float).reshape(-1)
    k, mm = SH.shell_matrices(problem)
    mm = mm + 1e-10 * np.diag(mm).max() * np.eye(mm.shape[0])
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * mm + beta * k
    f0 = problem.loads + SH._load_vectors_shell(problem)
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf, mf, cf, ff = (k[np.ix_(free, free)], mm[np.ix_(free, free)],
                      c[np.ix_(free, free)], f0[free])

    r, c2, _ = SH._facet_frames(problem)
    t24 = SH._transformation_shell(r)
    dm = problem.dof_map()
    bmem, _ = _q4_point(c2, 0.0, 0.0)
    dmat = _plane_dmat(problem.young, problem.poisson, False)
    _, dx, dy, _ = _shape_grads(c2, 0.0, 0.0)
    bb = _bend_b(dx, dy)
    e, nu, tt = problem.young, problem.poisson, problem.thickness
    d0 = e * tt ** 3 / (12.0 * (1.0 - nu * nu))
    probe = (np.arange(problem.nelm) if probe_elements is None
             else np.asarray(probe_elements, dtype=int).reshape(-1))
    out = np.zeros((om.size, probe.size, 2, 6), dtype=complex)
    full = np.zeros(problem.ndof, dtype=complex)
    for i, w in enumerate(om):
        a = kf - (w * w) * mf + 1j * w * cf
        full[:] = 0.0
        full[free] = np.linalg.solve(a, ff)
        u_loc = np.einsum("mij,mj->mi", t24, full[dm])
        eps = np.einsum("mia,ma->mi", bmem,
                        u_loc[:, SH._MEM_IDX])
        nf = tt[:, None] * np.einsum("mij,mj->mi", dmat, eps)
        u_plate = np.einsum("ab,mb->ma", SH._Q_BETA,
                            u_loc[:, SH._BND_IDX])
        kap = np.einsum("mia,ma->mi", bb, u_plate)
        mom = np.stack([d0 * (kap[:, 0] + nu * kap[:, 1]),
                        d0 * (kap[:, 1] + nu * kap[:, 0]),
                        d0 * (1.0 - nu) / 2.0 * kap[:, 2]], axis=-1)
        sm = (nf / tt[:, None])[probe]
        sb = (6.0 * mom / tt[:, None] ** 2)[probe]
        for fib, sgn in enumerate((1.0, -1.0)):
            s3 = sm + sgn * sb
            out[i, :, fib, 0] = s3[:, 0]
            out[i, :, fib, 1] = s3[:, 1]
            out[i, :, fib, 5] = s3[:, 2]
    return out


def frame_fiber_stress_frf(problem, omegas, damping=(0.0, 0.0),
                           probe_elements=None) -> np.ndarray:
    """Complex EXTREME-FIBER stress FRFs of a frame's members:
    (n_freq, n_probe, 4) for the four fiber candidates
    [end1 N/A + M1/S, end1 N/A − M1/S, end2 +, end2 −] — each a LINEAR
    functional of the complex response, so a legitimate FRF (the von
    Mises reduction the continuum families use is quadratic and has
    no frame counterpart; fatigue assesses all four fibers and keeps
    the governing one).  Needs the problem's section_modulus."""
    from ..models.frame import (FrameProblem, _geometry, _k_local,
                                _member_load_vectors, _rotation,
                                frame_matrices)

    if not isinstance(problem, FrameProblem):
        raise TypeError("frame_fiber_stress_frf needs a FrameProblem, "
                        f"got {type(problem).__name__}")
    if problem.section_modulus is None:
        raise ValueError("fiber stress FRFs need the problem's "
                         "section_modulus (sigma = N/A + M/S)")
    om = np.asarray(omegas, dtype=float).reshape(-1)
    k, mm = frame_matrices(problem)
    alpha, beta = (float(damping[0]), float(damping[1]))
    c = alpha * mm + beta * k
    f_member, f_fixed = _member_load_vectors(problem)
    f0 = problem.loads + f_member
    free = np.setdiff1d(np.arange(problem.ndof), problem.fixed_dofs)
    kf, mf, cf, ff = (k[np.ix_(free, free)], mm[np.ix_(free, free)],
                      c[np.ix_(free, free)], f0[free])
    length, co, si = _geometry(problem)
    t = _rotation(co, si)
    kl = _k_local(problem.young, problem.area, problem.inertia,
                  length)
    dm = problem.dof_map()
    area = np.broadcast_to(np.asarray(problem.area, dtype=float),
                           (problem.nelm,))
    smod = np.broadcast_to(np.asarray(problem.section_modulus,
                                      dtype=float), (problem.nelm,))
    probe = (np.arange(problem.nelm) if probe_elements is None
             else np.asarray(probe_elements, dtype=int).reshape(-1))
    out = np.zeros((om.size, probe.size, 4), dtype=complex)
    full = np.zeros(problem.ndof, dtype=complex)
    for i, w in enumerate(om):
        a = kf - (w * w) * mf + 1j * w * cf
        full[:] = 0.0
        full[free] = np.linalg.solve(a, ff)
        u_loc = np.einsum("mij,mj->mi", t, full[dm])
        # end forces at unit load multiplier: the member loads
        # oscillate with the same multiplier, so the static fixed-end
        # correction rides along.
        f_loc = np.einsum("mij,mj->mi", kl, u_loc) - f_fixed
        n_ax = -f_loc[probe, 0] / area[probe]
        m1 = f_loc[probe, 2] / smod[probe]
        m2 = f_loc[probe, 5] / smod[probe]
        out[i, :, 0] = n_ax + m1
        out[i, :, 1] = n_ax - m1
        out[i, :, 2] = n_ax + m2
        out[i, :, 3] = n_ax - m2
    return out
