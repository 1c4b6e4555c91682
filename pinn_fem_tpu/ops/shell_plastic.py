"""Layered through-thickness J2 elastoplasticity for the flat-facet
shell family: the plane-stress radial return of ops/plane_plastic.py
stacked over thickness layers at the facet Gauss points, with
MEMBRANE + BENDING kinematics

    eps(z) = eps_m + z * kappa

(the plate family's ops/plate_plastic.py carries eps(z) = z*kappa
only).  This is the constitutive model that owns pressure-vessel and
roof collapse: the membrane strain SHIFTS the neutral axis, so yield
couples the stress resultants N and M — the rectangular-section
interaction m + n² = 1 that no uncoupled family reproduces.

Model (the classic layered shell plasticity):

  * at every 2×2 facet Gauss point the in-plane LOCAL strain varies
    linearly through the thickness; each of N midpoint layers carries
    a PLANE-STRESS J2 state evaluated by the exact constrained return
    map `plane_return_map` — the literal same kernel the plane and
    plate families use (host f64 and traced device tiers share one
    implementation);
  * stress resultants and the consistent tangent are midpoint sums
    with weights w = t/N:
        N  = Σ w σ_l          D_mm = Σ w C_l
        M  = Σ w z_l σ_l      D_mb = Σ w z_l C_l   (the COUPLING)
                              D_bb = Σ w z_l² C_l
    — D_mb vanishes identically while every layer is elastic
    (symmetric z sums), so the elastic limit IS the uncoupled
    membrane ⊕ plate facet of models/shell.py; it switches on exactly
    when yield breaks the through-thickness symmetry;
  * TRANSVERSE SHEAR and the DRILLING stabilization stay elastic
    (the thin-shell layered idealization + the rank-correction whose
    energy is fictitious by construction).

The N-M interaction algebra the tests pin (even N, nu = 0): for a
UNIAXIAL ±σ_y layer profile whose zero crossing z₀ sits ON a layer
boundary, every layer center is strictly on one side and the
fully-yielded resultants are the closed-form midpoint sums

    n = N/(σ_y t) = -2 z₀/t,    m = M/Mp = 1 - n²,   Mp = σ_y t²/4

— the rectangular-section interaction surface.  The return map
reaches that uniaxial state ASYMPTOTICALLY, not in one shot: a
single radial return from a lateral-contraction-consistent strain
profile ε(z) ∝ (1, −1/2, 0) leaves a residual σ_yy = O(σ_y²/(E·ε))
(measured: σ_yy/σ_y = 1.3e-3 at 500× yield strain; a profile WITHOUT
the −1/2 contraction converges to the plane-strain point 2σ_y/√3
instead), so tests/test_shell_plastic.py pins m + n² = 1 at the
kernel level with the measured O(1/scale) convergence rate, and pins
the capacity bracket at n = 0.5 (m_cap between 0.75 and 0.78 on the
4-element clamped strip — the discrete limit's usual small overshoot,
converging onto 1 − n² from above) at the solver level.

Reference citation: the reference has no shells and no material
nonlinearity (linear-elastic truss library, /root/reference/FEM/
python/fem/element.py); within THIS framework this closes the last
element family without a plastic analysis (truss 1D, plane/solid
continuum J2, frame hinges, plate layers — now shell layers).
"""

from __future__ import annotations

import numpy as np

from .plane_plastic import (PlanePlasticState, initial_plane_state,
                            plane_return_map, von_mises_4)
from .plate_plastic import layer_centers

__all__ = [
    "initial_shell_state", "shell_gp_geometry", "shell_plastic_blocks",
]


def initial_shell_state(nelm: int, n_layers: int, xp=np,
                        dtype=None) -> PlanePlasticState:
    """Committed layer states, Gauss axis merged: (m, 4*N, ...)."""
    return initial_plane_state(nelm, 4 * int(n_layers), xp=xp,
                               dtype=dtype)


def shell_gp_geometry(problem, xp=np):
    """Hoisted facet geometry for the layered elastoplastic shell.

    Returns:
        t24:  (m, 24, 24) local <- global transformation blocks.
        bm:   (m, 4, 3, 8) membrane strain-displacement stacks at the
              2×2 Gauss points (local in-plane (u, v) DOFs).
        bb:   (m, 4, 3, 12) curvature stacks there, CONJUGATED to the
              local (w, θx, θy) ordering (βx = -θy, βy = +θx).
        det:  (m, 4) Jacobian determinants.
        ks_e: (m, 12, 12) elastic MITC4 assumed-shear blocks in the
              (w, θx, θy) ordering.
        kd_e: (m, 4, 4) elastic drilling stabilization blocks on the
              four local θz DOFs.
    """
    from ..models.plane import _einsum, _q4_point
    from ..models.shell import (_DRILL_ALPHA, _DRILL_EPS, _Q_BETA,
                                _facet_area, _facet_frames)
    from ..models.plate import (_bend_b, _dmats, _mitc_rows,
                                _shape_grads, _shear_b_mitc)
    from ..models.plane import _GP

    r_np, c2_np, _ = _facet_frames(problem)
    area_np = _facet_area(c2_np)
    c2 = xp.asarray(c2_np)
    young = xp.asarray(problem.young)
    poisson = xp.asarray(problem.poisson)
    thickness = xp.asarray(problem.thickness)
    q = xp.asarray(_Q_BETA)

    _, ds = _dmats(young, poisson, thickness, xp)
    rows = _mitc_rows(c2, xp)
    bms, bbs, dets = [], [], []
    ks = None
    for xi, eta in _GP:
        bmem, det = _q4_point(c2, xi, eta, xp)
        bms.append(bmem)
        dets.append(det)
        _, dx, dy, _ = _shape_grads(c2, xi, eta, xp)
        # curvature B in the (w, θx, θy) basis: κ = B_β u_β with
        # u_β = Q u_θ  ->  B_θ = B_β Q.
        bbs.append(_einsum(xp, "mia,ab->mib", _bend_b(dx, dy, xp), q))
        bs, dets_s = _shear_b_mitc(c2, rows, xi, eta, xp)
        kg = (ds * dets_s)[:, None, None] \
            * _einsum(xp, "mia,mib->mab", bs, bs)
        ks = kg if ks is None else ks + kg
    ks = _einsum(xp, "ab,mbc,cd->mad", q.T, ks, q)

    g = young / (2.0 * (1.0 + poisson))
    kd = _DRILL_ALPHA * g * thickness * xp.asarray(area_np)
    pen = xp.asarray((np.eye(4) - 0.25) + _DRILL_EPS * np.eye(4))
    kd_e = kd[:, None, None] * pen[None]

    m = c2_np.shape[0]
    t24 = xp.zeros((m, 24, 24))
    r = xp.asarray(r_np)
    if xp is np:
        for off in range(0, 24, 3):
            t24[:, off:off + 3, off:off + 3] = r
    else:
        for off in range(0, 24, 3):
            t24 = t24.at[:, off:off + 3, off:off + 3].set(r)
    return (t24, xp.stack(bms, axis=1), xp.stack(bbs, axis=1),
            xp.stack(dets, axis=1), ks, kd_e)


# Local DOF index groups in the 24-wide (u,v,w,θx,θy,θz)-per-node
# ordering (models/shell.py constants, re-derived here to keep the
# op importable standalone).
_MEM = np.array([6 * a + d for a in range(4) for d in (0, 1)])
_BND = np.array([6 * a + d for a in range(4) for d in (2, 3, 4)])
_DRL = np.array([6 * a + 5 for a in range(4)])


def shell_plastic_blocks(t24, bm, bb, det, ks_e, kd_e, thickness,
                         u_e, state: PlanePlasticState, young,
                         poisson, sigma_y, h_iso, h_kin,
                         n_layers: int,
                         tangent_floor: float = 1e-8, xp=np):
    """One Newton iteration's GLOBAL element quantities, batched over
    (facet, gauss point, layer).

    Args:
        t24..kd_e: shell_gp_geometry output (hoisted once).
        u_e: (m, 24) GLOBAL element displacements.
        state: (m, 4*N, ...) merged layer states.

    Returns:
        (ke, fe, nres, mom, vm_fiber, new_state): global tangent
        blocks (m, 24, 24), global internal force (m, 24),
        Gauss-averaged LOCAL membrane forces (m, 3) and moments
        (m, 3), the per-facet extreme-fiber von Mises (m,), and the
        would-be-committed state (commit at step convergence only).

    tangent_floor blends `floor` of the exact elastic membrane and
    bending rigidities into D_mm / D_bb (perfect plasticity cannot
    hand Newton a singular tangent at the mechanism — the family
    rule); the residual always uses the return-mapped resultants.
    The coupling D_mb takes no floor (its elastic value is zero)."""
    from ..models.plane import _dmat as _plane_dmat
    from ..models.plane import _einsum
    from ..models.plate import _dmats

    m, ngp = bm.shape[0], bm.shape[1]
    nl = int(n_layers)

    u_loc = _einsum(xp, "mij,mj->mi", t24, u_e)
    u_m = u_loc[:, _MEM]                                    # (m, 8)
    u_b = u_loc[:, _BND]                                    # (m, 12)
    u_d = u_loc[:, _DRL]                                    # (m, 4)

    eps_m = _einsum(xp, "mgia,ma->mgi", bm, u_m)            # (m,4,3)
    kap = _einsum(xp, "mgia,ma->mgi", bb, u_b)              # (m,4,3)
    z, w = layer_centers(thickness, nl, xp)                 # (m,N),(m,)
    eps = eps_m[:, :, None, :] \
        + z[:, None, :, None] * kap[:, :, None, :]          # (m,4,N,3)
    eps3 = eps.reshape(m, ngp * nl, 3)

    sig3, d3, szz, new_state = plane_return_map(
        eps3, state, young, poisson, sigma_y, h_iso, h_kin,
        plane_strain=False, xp=xp)

    sig_l = sig3.reshape(m, ngp, nl, 3)
    d_l = d3.reshape(m, ngp, nl, 3, 3)
    wz = w[:, None] * z                                     # (m, N)
    nres = xp.sum(w[:, None, None, None] * sig_l, axis=2)   # (m,4,3)
    mom = xp.sum(wz[:, None, :, None] * sig_l, axis=2)      # (m,4,3)
    dmm = xp.sum(w[:, None, None, None, None] * d_l, axis=2)
    dmb = xp.sum(wz[:, None, :, None, None] * d_l, axis=2)
    dbb = xp.sum((wz * z)[:, None, :, None, None] * d_l, axis=2)
    # Elastic floors (exact rigidities; no floor on the coupling).
    dm_e = _plane_dmat(young, poisson, False, xp=xp) \
        * thickness[:, None, None]
    db_e, _ = _dmats(young, poisson, thickness, xp)
    dmm = dmm + tangent_floor * dm_e[:, None]
    dbb = dbb + tangent_floor * db_e[:, None]

    fm = _einsum(xp, "mgia,mgi,mg->ma", bm, nres, det)      # (m, 8)
    fb = _einsum(xp, "mgia,mgi,mg->ma", bb, mom, det) \
        + _einsum(xp, "mab,mb->ma", ks_e, u_b)              # (m, 12)
    fd = _einsum(xp, "mab,mb->ma", kd_e, u_d)               # (m, 4)

    kmm = _einsum(xp, "mgia,mgij,mgjb,mg->mab", bm, dmm, bm, det)
    kmb = _einsum(xp, "mgia,mgij,mgjb,mg->mab", bm, dmb, bb, det)
    kbb = _einsum(xp, "mgia,mgij,mgjb,mg->mab", bb, dbb, bb, det) \
        + ks_e

    fl = xp.zeros((m, 24), dtype=fm.dtype)
    kl = xp.zeros((m, 24, 24), dtype=fm.dtype)
    if xp is np:
        fl[:, _MEM] = fm
        fl[:, _BND] = fb
        fl[:, _DRL] = fd
        kl[:, _MEM[:, None], _MEM[None, :]] = kmm
        kl[:, _MEM[:, None], _BND[None, :]] = kmb
        kl[:, _BND[:, None], _MEM[None, :]] = np.swapaxes(kmb, 1, 2)
        kl[:, _BND[:, None], _BND[None, :]] = kbb
        kl[:, _DRL[:, None], _DRL[None, :]] = kd_e
    else:
        fl = fl.at[:, _MEM].set(fm).at[:, _BND].set(fb) \
            .at[:, _DRL].set(fd)
        kl = kl.at[:, _MEM[:, None], _MEM[None, :]].set(kmm)
        kl = kl.at[:, _MEM[:, None], _BND[None, :]].set(kmb)
        kl = kl.at[:, _BND[:, None], _MEM[None, :]].set(
            xp.swapaxes(kmb, 1, 2))
        kl = kl.at[:, _BND[:, None], _BND[None, :]].set(kbb)
        kl = kl.at[:, _DRL[:, None], _DRL[None, :]].set(kd_e)

    fe = _einsum(xp, "mji,mj->mi", t24, fl)
    ke = _einsum(xp, "mji,mjk,mkl->mil", t24, kl, t24)

    vm = von_mises_4(sig3, szz, xp=xp)                      # (m, 4N)
    vm_fiber = xp.max(vm, axis=1)
    return (ke, fe, nres.mean(axis=1), mom.mean(axis=1), vm_fiber,
            new_state)
