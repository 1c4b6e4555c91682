"""Frame plastic-hinge pushover — rigid-plastic collapse analysis of
2D frames by the classic hinge-by-hinge incremental method.

Closes the last family × capability asymmetry: trusses, planes and
solids all carry elastoplasticity (ops/plastic.py radial return,
solvers/plane_plasticity.py, solvers/solid_plasticity.py); frames —
where plastic design actually originated (Baker's plastic theory,
portal-frame mechanisms) — had none.  The reference
(rpacheco-blazquez/PINN-FEM) has no frame elements and no material
nonlinearity at all (SURVEY §2: axial truss, linear elastic).

Model: elastic-perfectly-plastic CONCENTRATED hinges in BENDING at
member ends — the standard first-order plastic frame idealization:

  * a member end hinges when its local end moment reaches ±Mp (the
    per-member plastic moment, an input section property);
  * a hinged end carries exactly Mp while the mechanism rotates
    (EPP — no hardening, no unloading check: hinge rotations are
    assumed monotone, valid for PROPORTIONAL pushover, which is the
    contract — the docstring of frame_pushover says so);
  * axial-moment interaction is neglected (pure bending hinge; the
    N/Np reduction is a documented scope cut, as in classic plastic
    theory before Heyman's interaction diagrams).

Mechanics: with hinge state h (m, 2) the member tangent stiffness is
the STATIC CONDENSATION of the released end-rotation DOFs out of the
exact 6×6 Euler-Bernoulli local matrix,

    K_c = K_kk − K_kr K_rr⁻¹ K_rk      (r = hinged θ rows, zeroed
                                         rows/cols in the 6×6 frame)

so a hinged end's moment RATE is identically zero, shear and axial
still transmit, and a doubly hinged member degenerates exactly to the
axial truss bar (its condensed bending block vanishes — the beam
pinned at both ends has no transverse stiffness).  Each increment
solves the tangent system for the unit-load-pattern rate du/dλ,
scales to the FIRST end reaching ±Mp (simultaneous hinges within a
relative tolerance all form together — the fixed-fixed beam's three
hinges are the test), commits, and repeats until the tangent system
is a MECHANISM (smallest free-block eigenvalue below a relative
floor).  The load factor there is the collapse factor.

Exactness: cubic Hermite frame elements are exact for nodal loads,
and the incremental solution between hinge events is piecewise
linear-elastic, so the whole capacity curve is EXACT (machine
precision) for nodal loading — the anchors are textbook plastic
theory (tests/test_frame_plastic.py):

  * fixed-fixed beam, midspan load: elastic |M_end| = |M_center| =
    PL/8 → all three hinges form simultaneously and the beam
    collapses at P = 8 Mp/L with zero prior redistribution;
  * propped cantilever, midspan load: first hinge at the fixed end
    at P₁ = 16 Mp/(3L) (elastic 3PL/16), the propped span then
    redistributes (center rate L/4) and collapses at P = 6 Mp/L;
  * rectangular portal, top-level sway load: H_c = 4 Mp/h.

Host float64 tier: the event loop is inherently sequential with O(10)
increments on structures below DENSE_DOF_LIMIT — the analysis-family
doctrine (CLAUDE.md).  Reference citation for the JSON contract shape
this mirrors: the truss plastic block (io/analysis.py run_plastic).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..models.frame import (FrameProblem, _geometry, _k_local,
                            _rotation)

_THETA = (2, 5)                  # local end-rotation rows (θ1, θ2)


def _condensed_local(kl: np.ndarray, hinges: np.ndarray) -> np.ndarray:
    """(m, 6, 6) local tangent stiffness with the hinged end-rotation
    DOFs statically condensed out (zeroed rows/cols keep the 6×6
    assembly shape; the global node rotation then only tracks the
    still-elastic members at that joint)."""
    out = kl.copy()
    for state in (1, 2, 3):          # bit 0: end 1 hinged, bit 1: end 2
        sel = np.flatnonzero(hinges[:, 0] * 1 + hinges[:, 1] * 2
                             == state)
        if sel.size == 0:
            continue
        rel = [t for b, t in enumerate(_THETA) if state & (1 << b)]
        keep = [i for i in range(6) if i not in rel]
        k = kl[sel]
        kkk = k[:, keep][:, :, keep]
        kkr = k[:, keep][:, :, rel]
        krr = k[:, rel][:, :, rel]
        kc = kkk - np.einsum("mab,mbc,mdc->mad", kkr,
                             np.linalg.inv(krr), kkr)
        blk = np.zeros((sel.size, 6, 6))
        blk[:, np.asarray(keep)[:, None], np.asarray(keep)[None, :]] \
            = kc
        out[sel] = blk
    return out


@dataclass
class FramePushoverResult:
    """Capacity curve + hinge history of a proportional pushover."""
    collapse_factor: Optional[float]   # λ at mechanism (None: capped)
    mechanism: bool                    # True if collapse was reached
    load_factors: np.ndarray           # (k,) committed λ after events
    displacements: np.ndarray          # (k, n_probe) probe history
    hinge_members: np.ndarray          # (n_h,) member of each hinge
    hinge_ends: np.ndarray             # (n_h,) 0 | 1 local end
    hinge_factors: np.ndarray          # (n_h,) λ at formation
    end_moments: np.ndarray            # (m, 2) final local end moments
    axial: np.ndarray                  # (m,) final axial (tension +)
    u: np.ndarray                      # (ndof,) final displacements


def frame_pushover(problem: FrameProblem, plastic_moment,
                   max_load_factor: Optional[float] = None,
                   probe_dofs=None,
                   max_hinges: Optional[int] = None,
                   rtol_simultaneous: float = 1e-9
                   ) -> FramePushoverResult:
    """Proportional pushover of the problem's load pattern to plastic
    collapse (module docstring: EPP bending hinges at ±Mp, exact
    piecewise-elastic increments, mechanism detection on the tangent).

    plastic_moment: (m,) or scalar Mp > 0.  max_load_factor: stop the
    ramp there if no mechanism forms first (collapse_factor is then
    None, mechanism False).  Monotone (no-unloading) assumption —
    proportional load patterns only, which is what a pushover is.
    """
    mp = np.broadcast_to(np.asarray(plastic_moment, dtype=float),
                         (problem.nelm,)).copy()
    if np.any(mp <= 0.0):
        raise ValueError("plastic_moment must be positive")
    if problem.member_loads is not None and \
            np.any(problem.member_loads):
        raise ValueError(
            "frame pushover supports nodal load patterns only — the "
            "hinge-event scaling needs end moments linear in λ, and "
            "member-load fixed-end corrections break that; lump the "
            "distributed load to the nodes")
    if problem.temperature is not None \
            or problem.temperature_gradient is not None:
        raise ValueError("frame pushover does not take a thermal load "
                         "case — thermoelastic loads are not "
                         "proportional (run them as a separate static)")
    f_ref = problem.loads.copy()
    if not np.any(f_ref):
        raise ValueError("the pushover needs a nonzero load pattern")

    length, c, s = _geometry(problem)
    t = _rotation(c, s)
    kl = _k_local(problem.young, problem.area, problem.inertia,
                  length)
    # global 6×6 blocks are Tᵀ K_c T per member, assembled dense
    dm = problem.dof_map()
    base_mask = problem.free_mask()
    probe = (np.arange(problem.ndof) if probe_dofs is None
             else np.asarray(probe_dofs, dtype=int).reshape(-1))

    hinges = np.zeros((problem.nelm, 2), dtype=bool)
    lam = 0.0
    u = np.zeros(problem.ndof)
    m_end = np.zeros((problem.nelm, 2))
    axial = np.zeros(problem.nelm)
    lam_hist, u_hist = [0.0], [u[probe].copy()]
    h_mem, h_end, h_lam = [], [], []
    mechanism = False
    cap = 2 * problem.nelm if max_hinges is None else int(max_hinges)

    for _ in range(cap + 1):
        kc_loc = _condensed_local(kl, hinges)
        blocks = np.einsum("mji,mjk,mkl->mil", t, kc_loc, t)
        k = np.zeros((problem.ndof, problem.ndof))
        np.add.at(k, (dm[:, :, None], dm[:, None, :]), blocks)
        # Floating DOFs (every attached member end hinged / doubly
        # hinged chains): zero tangent diagonal on a free DOF.  They
        # leave the load pattern unbalanceable if loaded there.
        diag = np.diag(k)
        scale = diag.max() if diag.size else 1.0
        floating = (base_mask > 0) & (diag <= 1e-12 * scale)
        if np.any(floating & (np.abs(f_ref) > 0)):
            # a load on a fully released DOF IS the mechanism
            mechanism = True
            break
        mask = base_mask.copy()
        mask[floating] = 0.0
        km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
        free = np.flatnonzero(mask > 0)
        if free.size == 0:
            mechanism = True
            break
        kff = k[np.ix_(free, free)]
        w = np.linalg.eigvalsh(kff)
        if w[0] <= 1e-10 * max(w[-1], 1e-300):
            mechanism = True
            break
        du = np.linalg.solve(km, f_ref * mask) * mask

        du_loc = np.einsum("mij,mj->mi", t, du[dm])
        df_loc = np.einsum("mij,mj->mi", kc_loc, du_loc)
        dm_end = df_loc[:, [2, 5]]                      # (m, 2)
        dn = -df_loc[:, 0]

        # distance to ±Mp on every still-elastic end
        with np.errstate(divide="ignore", invalid="ignore"):
            room = np.where(dm_end > 0.0,
                            (mp[:, None] - m_end) / dm_end,
                            (-mp[:, None] - m_end) / dm_end)
        room[~np.isfinite(room)] = np.inf
        room[np.abs(dm_end) <= 1e-14 * mp[:, None]] = np.inf
        room[hinges] = np.inf
        d_lam = float(room.min())
        if not np.isfinite(d_lam) or d_lam <= 0.0:
            # no end can ever yield under this pattern: elastic forever
            if max_load_factor is None:
                raise ValueError(
                    "no member end moves toward its plastic moment "
                    "under this load pattern (pure axial pattern?) — "
                    "give max_load_factor to run a capped elastic ramp")
            d_lam = np.inf

        capped = (max_load_factor is not None
                  and lam + d_lam >= float(max_load_factor))
        if capped:
            d_lam = float(max_load_factor) - lam
        lam += d_lam
        u = u + d_lam * du
        m_end = m_end + d_lam * dm_end
        axial = axial + d_lam * dn
        lam_hist.append(lam)
        u_hist.append(u[probe].copy())
        if capped:
            break
        new = room <= d_lam * (1.0 + rtol_simultaneous)
        new &= ~hinges
        for mm, ee in np.argwhere(new):
            h_mem.append(int(mm))
            h_end.append(int(ee))
            h_lam.append(lam)
        hinges |= new

    return FramePushoverResult(
        collapse_factor=(lam if mechanism else None),
        mechanism=mechanism,
        load_factors=np.asarray(lam_hist),
        displacements=np.asarray(u_hist),
        hinge_members=np.asarray(h_mem, dtype=int),
        hinge_ends=np.asarray(h_end, dtype=int),
        hinge_factors=np.asarray(h_lam),
        end_moments=m_end, axial=axial, u=u)
