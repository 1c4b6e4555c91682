"""Layered through-thickness J2 elastoplasticity for the Mindlin
plate family: the plane-stress radial return of ops/plane_plastic.py
stacked over thickness layers at the MITC4 bending Gauss points.

The reference (rpacheco-blazquez/PINN-FEM) has no plates and no
material nonlinearity (linear-elastic truss library,
/root/reference/FEM/python/fem/element.py); within THIS framework the
plate was the last element family without a plastic analysis (truss
1D return map, plane/solid continuum J2, frame concentrated hinges).

Model — the classic LAYERED (through-the-thickness integrated) shell
plasticity:

  * at every bending Gauss point the in-plane strain varies linearly
    through the thickness, eps(z) = z * kappa (Mindlin kinematics,
    u = -z beta); each of N layers carries a PLANE-STRESS J2 state at
    its midpoint z_l = t*((l+1/2)/N - 1/2), evaluated by the exact
    constrained return map `plane_return_map` (sigma_zz = 0 via the
    nested zz-Newton + static condensation) — the literal same kernel
    the plane family uses, so host f64 and traced device tiers share
    one implementation (no mirror to drift);
  * stress resultants and the consistent bending tangent are midpoint
    sums,  M = sum_l w_l z_l sigma_l,  D_b = sum_l w_l z_l^2 C_l,
    w_l = t/N;
  * TRANSVERSE SHEAR STAYS ELASTIC (the standard thin-shell layered
    idealization: the parabolic shear stress is O(t/a) of the bending
    stress and its yield interaction is neglected), so the MITC4
    assumed-shear stiffness is hoisted once and added unchanged.

Midpoint-rule facts that shape the tests (exact algebra, even N):

    sum_l w_l |z_l|  = t^2/4          -> the fully plastic moment is
                                         EXACT: Mp_N = sigma_y t^2/4;
    sum_l w_l z_l^2  = (t^3/12)(1 - 1/N^2)
                                      -> the ELASTIC layered rigidity
                                         is (1 - 1/N^2) D: 0.25% low
                                         at the default N = 20, and a
                                         pinned band in the tests, not
                                         a bug to "fix" (no midpoint
                                         rule is exact for both z^2
                                         and the plastic |z|).

So capacity curves converge O(1/N^2) in the elastic branch and hit
the rigid-plastic limit loads exactly in N: the one-way beam-
mechanism anchors (SS strip q_u = 8 Mp/L^2, clamped strip
q_u = 16 Mp/L^2 after end-to-midspan redistribution, nu = 0 so
cylindrical plate bending IS the beam) gate the whole path in
tests/test_plate_plastic.py.

Batched shapes: the layer state rides PlanePlasticState with the
Gauss axis MERGED over (gauss point, layer) -> (m, 4*N, ...); the
(m*4*N, 4, 4) tangent algebra is the small-contraction shape XLA
tiles onto the MXU, and one lax.scan step touches it all at once.
"""

from __future__ import annotations

import numpy as np

from .plane_plastic import (PlanePlasticState, initial_plane_state,
                            plane_return_map, von_mises_4)

__all__ = [
    "PlanePlasticState", "initial_plane_state", "initial_plate_state",
    "plate_gp_geometry", "layer_centers", "plate_plastic_blocks",
]


def initial_plate_state(nelm: int, n_layers: int, xp=np,
                        dtype=None) -> PlanePlasticState:
    """Committed layer states, Gauss axis merged: (m, 4*N, ...)."""
    return initial_plane_state(nelm, 4 * int(n_layers), xp=xp,
                               dtype=dtype)


def plate_gp_geometry(problem, xp=np):
    """Hoisted element geometry for the layered elastoplastic plate.

    Returns:
        bb:   (m, 4, 3, 12) curvature-displacement stacks at the 2x2
              bending Gauss points (weights 1).
        det:  (m, 4) Jacobian determinants there.
        ks_e: (m, 12, 12) ELASTIC MITC4 assumed-shear stiffness blocks
              (transverse shear is not layered — module docstring).
    """
    from ..models.plane import _einsum
    from ..models.plate import (_GP, _bend_b, _dmats, _mitc_rows,
                                _shape_grads, _shear_b_mitc)

    coords = xp.asarray(problem.coords())
    _, ds = _dmats(xp.asarray(problem.young),
                   xp.asarray(problem.poisson),
                   xp.asarray(problem.thickness), xp)
    rows = _mitc_rows(coords, xp)
    bbs, dets, ks = [], [], None
    for xi, eta in _GP:
        _, dx, dy, det = _shape_grads(coords, xi, eta, xp)
        bbs.append(_bend_b(dx, dy, xp))
        dets.append(det)
        bs, dets_s = _shear_b_mitc(coords, rows, xi, eta, xp)
        kg = (ds * dets_s)[:, None, None] \
            * _einsum(xp, "mia,mib->mab", bs, bs)
        ks = kg if ks is None else ks + kg
    return xp.stack(bbs, axis=1), xp.stack(dets, axis=1), ks


def layer_centers(thickness, n_layers: int, xp=np):
    """((m, N) midpoint layer centers z_l, (m,) layer weight t/N)."""
    u = (xp.arange(n_layers) + 0.5) / n_layers - 0.5        # (N,)
    t = xp.asarray(thickness)
    return t[:, None] * u[None, :], t / n_layers


def plate_plastic_blocks(bb, det, ks_e, thickness, u_e,
                         state: PlanePlasticState, young, poisson,
                         sigma_y, h_iso, h_kin, n_layers: int,
                         tangent_floor: float = 1e-8, xp=np):
    """One Newton iteration's element quantities, batched over
    (element, gauss point, layer).

    Args:
        bb, det, ks_e: plate_gp_geometry output (hoisted once).
        u_e: (m, 12) element displacements (w, bx, by per node).
        state: (m, 4*N, ...) merged layer states.
        young/poisson/sigma_y/h_iso/h_kin: (m,) material arrays.

    Returns:
        (ke, fe, mom, vm_fiber, new_state): tangent blocks
        (m, 12, 12), internal force (m, 12), Gauss-point stress-
        resultant moments (m, 4, 3), the per-element EXTREME-FIBER
        von Mises (m,) = max over layers and gauss points, and the
        would-be-committed state (commit at step convergence only —
        the incremental doctrine of solvers/plasticity.py).

    tangent_floor blends in `floor` of the exact elastic bending
    rigidity so perfect plasticity cannot hand Newton a singular
    tangent at the collapse mechanism (the family-wide rule); the
    residual always uses the return-mapped resultants.
    """
    from ..models.plane import _einsum
    from ..models.plate import _dmats

    m, ngp = bb.shape[0], bb.shape[1]
    nl = int(n_layers)
    kap = _einsum(xp, "mgia,ma->mgi", bb, u_e)                # (m, 4, 3)
    z, w = layer_centers(thickness, nl, xp)                 # (m,N),(m,)
    eps = z[:, None, :, None] * kap[:, :, None, :]          # (m,4,N,3)
    eps3 = eps.reshape(m, ngp * nl, 3)

    sig3, d3, szz, new_state = plane_return_map(
        eps3, state, young, poisson, sigma_y, h_iso, h_kin,
        plane_strain=False, xp=xp)

    sig_l = sig3.reshape(m, ngp, nl, 3)
    d_l = d3.reshape(m, ngp, nl, 3, 3)
    wz = w[:, None] * z                                     # (m, N)
    mom = xp.sum(wz[:, None, :, None] * sig_l, axis=2)      # (m, 4, 3)
    wzz = wz * z                                            # (m, N)
    db_t = xp.sum(wzz[:, None, :, None, None] * d_l, axis=2)
    db_e, _ = _dmats(young, poisson, thickness, xp)         # exact D
    db_t = db_t + tangent_floor * db_e[:, None]

    fe = _einsum(xp, "mgia,mgi,mg->ma", bb, mom, det) \
        + _einsum(xp, "mab,mb->ma", ks_e, u_e)
    ke = _einsum(xp, "mgia,mgij,mgjb,mg->mab", bb, db_t, bb, det) \
        + ks_e

    vm = von_mises_4(sig3, szz, xp=xp)                      # (m, 4N)
    vm_fiber = xp.max(vm, axis=1)                           # (m,)
    return ke, fe, mom, vm_fiber, new_state
