"""Von Mises (J2) elastoplasticity for the 3D solid family: radial
return + consistent tangent on the FULL 6-component engineering Voigt
state, batched over hex8 Gauss points.

The unconstrained 3D case of ops/plane_plastic.py (which condenses the
same model onto 2D constraints): textbook J2 flow with combined linear
isotropic + kinematic hardening (Simo & Hughes Box 3.2),

    f = ||dev(sigma) - beta|| - sqrt(2/3)(sigma_y + H_iso alpha)
    dgamma = <f_trial> / (2 mu + (2/3)(H_iso + H_kin))
    C_ep = kappa 1x1 + 2 mu theta I_dev - 2 mu theta_bar n x n

Voigt order [xx, yy, zz, yz, xz, xy], engineering shear strains (the
shear columns absorb the tensor factor 2, so n x n uses the raw
6-vector on both sides exactly as the 4-component map documents).

Volumetric locking: fully-integrated hex8 locks in incompressible J2
flow exactly like plane-strain Q4 — gp_geometry3_bbar provides the
mean-dilatation B-bar (Hughes): the volumetric (divergence) part of B
is replaced by its element volume average, B_bar = B +
(1/3)(b_mean - b) on the three normal rows.  Sub-yield elastic results
then differ O(h^2) from the fully-integrated element; limit loads stop
overshooting (the measured plane-strain evidence,
ops/plane_plastic.py:gp_geometry_bbar, carries over).

Everything is elementwise xp.where over an (m, 8) Gauss batch with the
xp=np|jnp switch — the float64 HOST tier and the traced DEVICE tier
run the LITERAL SAME code (the plane family's kernel-sharing
doctrine).

Verification anchors (tests/test_solid_plastic.py): the uniaxial bar
against the EXACT bilinear curve (elastoplastic tangent
E H_iso/(E + H_iso) — lateral contraction free, so 3D J2 reproduces
the 1D law identically), elastic sub-yield runs matching the linear
solver, and the extruded thick-wall cylinder limit pressure
p_lim = (2/sqrt 3) sigma_y ln(b/a) with B-bar.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

_SQ23 = np.sqrt(2.0 / 3.0)


class SolidPlasticState(NamedTuple):
    """Committed internal variables per Gauss point.

    eps_p: (m, 8, 6) plastic strain, ENGINEERING Voigt.
    alpha: (m, 8) accumulated equivalent plastic strain.
    back:  (m, 8, 6) back-stress (stress-like Voigt).
    """

    eps_p: np.ndarray
    alpha: np.ndarray
    back: np.ndarray


def initial_solid_state(nelm: int, xp=np, dtype=None
                        ) -> SolidPlasticState:
    kw = {} if dtype is None else {"dtype": dtype}
    return SolidPlasticState(
        eps_p=xp.zeros((nelm, 8, 6), **kw),
        alpha=xp.zeros((nelm, 8), **kw),
        back=xp.zeros((nelm, 8, 6), **kw))


def _dev6(sig, xp):
    tr3 = (sig[..., 0] + sig[..., 1] + sig[..., 2]) / 3.0
    return sig - tr3[..., None] * xp.asarray([1.0, 1.0, 1.0,
                                              0.0, 0.0, 0.0])


def _norm6(s, xp):
    """Tensor norm of a deviatoric Voigt 6-vector: each shear
    component represents TWO symmetric tensor entries."""
    return xp.sqrt(s[..., 0] ** 2 + s[..., 1] ** 2 + s[..., 2] ** 2
                   + 2.0 * (s[..., 3] ** 2 + s[..., 4] ** 2
                            + s[..., 5] ** 2))


def vm_return_map_6(eps6, state_ep, state_al, state_bk, mu, lam,
                    sigma_y, h_iso, h_kin, xp=np):
    """J2 radial return on the 6-component engineering Voigt state.

    Returns (sigma6, c_ep (..., 6, 6), ep_new, al_new, bk_new); callers
    commit state only at load-step convergence (the incremental
    doctrine of solvers/plasticity.py)."""
    dv = xp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    half = xp.asarray([1.0, 1.0, 1.0, 0.5, 0.5, 0.5])
    tiny = xp.asarray(1e-300 if xp is np else 1e-30)

    e = eps6 - state_ep
    tr_e = e[..., 0] + e[..., 1] + e[..., 2]
    sig_tr = lam[..., None] * tr_e[..., None] * dv \
        + 2.0 * mu[..., None] * (half * e)
    xi = _dev6(sig_tr, xp) - state_bk
    nxi = _norm6(xi, xp)
    f_tr = nxi - _SQ23 * (sigma_y + h_iso * state_al)
    plastic = f_tr > 0.0
    denom = 2.0 * mu + (2.0 / 3.0) * (h_iso + h_kin)
    dgamma = xp.where(plastic, f_tr, 0.0) / denom
    n = xi / xp.maximum(nxi, tiny)[..., None]

    sigma = sig_tr - (2.0 * mu * dgamma)[..., None] * n
    ep_new = state_ep + dgamma[..., None] * n \
        * xp.asarray([1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    al_new = state_al + _SQ23 * dgamma
    bk_new = state_bk + ((2.0 / 3.0) * h_kin * dgamma)[..., None] * n

    theta = xp.where(plastic,
                     1.0 - 2.0 * mu * dgamma / xp.maximum(nxi, tiny),
                     1.0)
    theta_bar = xp.where(
        plastic,
        1.0 / (1.0 + (h_iso + h_kin) / (3.0 * mu)) - (1.0 - theta),
        0.0)
    jmat = dv[:, None] * dv[None, :]
    third = 1.0 / 3.0
    idev = xp.asarray(
        [[2 * third, -third, -third, 0.0, 0.0, 0.0],
         [-third, 2 * third, -third, 0.0, 0.0, 0.0],
         [-third, -third, 2 * third, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.5, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.0, 0.5, 0.0],
         [0.0, 0.0, 0.0, 0.0, 0.0, 0.5]])
    kappa = lam + 2.0 * mu / 3.0
    c_ep = (kappa[..., None, None] * jmat
            + (2.0 * mu * theta)[..., None, None] * idev
            - (2.0 * mu * theta_bar)[..., None, None]
            * n[..., :, None] * n[..., None, :])
    return sigma, c_ep, ep_new, al_new, bk_new


def vm_return_map_6_force(eps6, state_ep, state_al, state_bk, mu,
                          lam, sigma_y, h_iso, h_kin, xp=np):
    """Force-only vm_return_map_6: identical stress/state, no
    (..., 6, 6) consistent tangent — the explicit integrators never
    need it and the tangent outer products dominate their hot path
    (the plane family's vm_return_map_4_force lesson)."""
    dv = xp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    half = xp.asarray([1.0, 1.0, 1.0, 0.5, 0.5, 0.5])
    tiny = xp.asarray(1e-300 if xp is np else 1e-30)

    e = eps6 - state_ep
    tr_e = e[..., 0] + e[..., 1] + e[..., 2]
    sig_tr = lam[..., None] * tr_e[..., None] * dv \
        + 2.0 * mu[..., None] * (half * e)
    xi = _dev6(sig_tr, xp) - state_bk
    nxi = _norm6(xi, xp)
    f_tr = nxi - _SQ23 * (sigma_y + h_iso * state_al)
    plastic = f_tr > 0.0
    denom = 2.0 * mu + (2.0 / 3.0) * (h_iso + h_kin)
    dgamma = xp.where(plastic, f_tr, 0.0) / denom
    n = xi / xp.maximum(nxi, tiny)[..., None]

    sigma = sig_tr - (2.0 * mu * dgamma)[..., None] * n
    ep_new = state_ep + dgamma[..., None] * n \
        * xp.asarray([1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    al_new = state_al + _SQ23 * dgamma
    bk_new = state_bk + ((2.0 / 3.0) * h_kin * dgamma)[..., None] * n
    return sigma, ep_new, al_new, bk_new


def solid_return_map(eps6, state: SolidPlasticState, young, poisson,
                     sigma_y, h_iso, h_kin, xp=np):
    """(m, 8, 6) strain -> (sigma6, 6x6 tangent, new state); per-
    element material broadcast over the Gauss axis."""
    from .plane_plastic import lame

    mu, lam, _ = lame(young, poisson)
    sigma, c_ep, ep, al, bk = vm_return_map_6(
        eps6, state.eps_p, state.alpha, state.back,
        mu[..., None], lam[..., None], sigma_y[..., None],
        h_iso[..., None], h_kin[..., None], xp=xp)
    return sigma, c_ep, SolidPlasticState(eps_p=ep, alpha=al, back=bk)


def gp_geometry3(problem, xp=np):
    """(b, wdet): B stack (m, 8, 6, 24) and weighted Jacobians (m, 8)
    for the 2x2x2 rule (weights 1).  Geometry is fixed at
    construction, so callers hoist this once."""
    from ..models.solid import _GP3, _hex_point

    coords = xp.asarray(problem.coords()
                        if hasattr(problem, "coords") else problem)
    bs, ds = [], []
    for xi, eta, zeta in _GP3:
        b, det = _hex_point(coords, xi, eta, zeta, xp)
        bs.append(b)
        ds.append(det)
    return xp.stack(bs, axis=1), xp.stack(ds, axis=1)


def gp_geometry3_bbar(problem, xp=np):
    """Mean-dilatation B-bar geometry: the divergence row of B at each
    Gauss point is replaced by its element volume average on the three
    NORMAL strain rows, B_bar = B + (1/3) m (b_mean - b) with
    m = [1, 1, 1, 0, 0, 0] — the standard Hughes treatment of
    near-incompressible J2 flow in fully-integrated bricks."""
    b, wdet = gp_geometry3(problem, xp)
    # Divergence row per gp: column a holds dN/dx, dN/dy or dN/dz
    # depending on a's component, i.e. the sum of the three normal
    # rows (each column is nonzero in exactly one of them).
    div = b[..., 0, :] + b[..., 1, :] + b[..., 2, :]   # (m, 8gp, 24)
    w = wdet[..., None]
    div_mean = (div * w).sum(axis=1, keepdims=True) \
        / w.sum(axis=1, keepdims=True)                 # (m, 1, 24)
    corr = (div_mean - div) / 3.0                      # (m, 8gp, 24)
    if xp is np:
        b_bar = b.copy()
        b_bar[..., 0, :] += corr
        b_bar[..., 1, :] += corr
        b_bar[..., 2, :] += corr
    else:
        b_bar = b.at[..., 0, :].add(corr)
        b_bar = b_bar.at[..., 1, :].add(corr)
        b_bar = b_bar.at[..., 2, :].add(corr)
    return b_bar, wdet


def solid_plastic_blocks(b, wdet, u_e, state: SolidPlasticState,
                         young, poisson, sigma_y, h_iso, h_kin,
                         tangent_floor=1e-8, xp=np):
    """One Newton iteration's element quantities, batched.

    Returns (ke (m, 24, 24), fe (m, 24), sig6 (m, 8, 6), new_state).
    tangent_floor blends in `floor` of the elastic operator so perfect
    plasticity cannot hand Newton an exactly singular tangent (the
    plane family's rule)."""
    from ..models.solid import _dmat3, _einsum

    eps6 = _einsum(xp, "mgia,ma->mgi", b, u_e)
    sig6, d6, new_state = solid_return_map(
        eps6, state, young, poisson, sigma_y, h_iso, h_kin, xp=xp)
    de = _dmat3(young, poisson, xp=xp)
    d6 = d6 + tangent_floor * de[:, None]
    fe = _einsum(xp, "mgia,mgi,mg->ma", b, sig6, wdet)
    ke = _einsum(xp, "mgia,mgij,mgjb,mg->mab", b, d6, b, wdet)
    return ke, fe, sig6, new_state


def solid_plastic_force(b, wdet, u_e, state: SolidPlasticState,
                        young, poisson, sigma_y, h_iso, h_kin, xp=np):
    """Force-only variant of solid_plastic_blocks for explicit
    integration (no consistent tangent — the ke einsum is the
    dominant cost and explicit steps never need it).

    Returns (fe (m, 24), sig6 (m, 8, 6), new_state)."""
    from ..models.solid import _einsum
    from .plane_plastic import lame

    mu, lam, _ = lame(young, poisson)
    eps6 = _einsum(xp, "mgia,ma->mgi", b, u_e)
    sig6, ep, al, bk = vm_return_map_6_force(
        eps6, state.eps_p, state.alpha, state.back, mu[..., None],
        lam[..., None], sigma_y[..., None], h_iso[..., None],
        h_kin[..., None], xp=xp)
    new_state = SolidPlasticState(eps_p=ep, alpha=al, back=bk)
    fe = _einsum(xp, "mgia,mgi,mg->ma", b, sig6, wdet)
    return fe, sig6, new_state


def von_mises_6(sig6, xp=np):
    """(.., 8, 6) gp stresses -> von Mises (same shape minus Voigt)."""
    s = _dev6(sig6, xp)
    return xp.sqrt(1.5) * _norm6(s, xp)
