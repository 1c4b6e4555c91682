"""1D rate-independent elastoplasticity for truss elements: radial return
mapping with combined linear isotropic + kinematic hardening.

Material nonlinearity is absent from the reference in any form (its element
library is linear-elastic only, /root/reference/FEM/python/fem/element.py;
even its dead Green-Lagrange kernel is hyperelastic).  This module extends
the framework the same way the dynamics family did: a batched, jit-friendly
elementwise kernel that every tier (solver, JSON, HTTP, UI) builds on.

The constitutive model is the textbook 1D combined-hardening plasticity
(Simo & Hughes, "Computational Inelasticity", §1.2-1.4, Box 1.4):

    yield      f(sigma, q, alpha) = |sigma - q| - (sigma_y + H_iso alpha)
    flow       deps_p = dgamma * sign(sigma - q)
    hardening  dalpha = dgamma,   dq = H_kin dgamma sign(sigma - q)

Backward-Euler return map over a strain increment (trial state from the
COMMITTED previous step, so the incremental problem is well-posed and
path-dependence is integrated exactly for proportional straining):

    sigma_tr = E (eps - eps_p_n);  xi = sigma_tr - q_n
    f_tr     = |xi| - (sigma_y + H_iso alpha_n)
    dgamma   = max(f_tr, 0) / (E + H_iso + H_kin)
    sigma    = sigma_tr - E dgamma sign(xi)

The ALGORITHMIC (consistent) tangent — the exact derivative of the return-
mapped stress w.r.t. the total strain, which gives Newton its quadratic
convergence — is piecewise constant for linear hardening:

    E_t = E                                    (elastic / unloading)
    E_t = E (H_iso + H_kin) / (E + H_iso + H_kin)   (plastic loading)

Everything is elementwise `jnp.where` over the element batch: one fused
vector program on TPU, transparent to both AD modes (the same requirement
the shared elastic ops carry for full-NR, see CLAUDE.md), and identical in
structure to the float64 host mirror (ops/host.py: host_plastic_system)
that serves the small-problem tier.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class PlasticParams(NamedTuple):
    """Per-element hardening parameters (broadcastable (nelm,) arrays)."""

    sigma_y: jnp.ndarray  # initial yield stress (> 0)
    h_iso: jnp.ndarray    # linear isotropic hardening modulus (>= 0)
    h_kin: jnp.ndarray    # linear kinematic hardening modulus (>= 0)


class PlasticState(NamedTuple):
    """Committed internal variables, one per element."""

    eps_p: jnp.ndarray  # plastic strain
    alpha: jnp.ndarray  # accumulated (equivalent) plastic strain, >= 0
    back: jnp.ndarray   # back stress q (kinematic hardening center)


def initial_state(nelm: int, dtype=jnp.float32) -> PlasticState:
    """Virgin material: zero plastic strain, zero back stress."""
    z = jnp.zeros(nelm, dtype=dtype)
    return PlasticState(eps_p=z, alpha=z, back=z)


def params_arrays(nelm: int, sigma_y, h_iso=0.0, h_kin=0.0,
                  dtype=np.float64) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """Broadcast scalar-or-per-element specs to (nelm,) numpy arrays.

    Shared by the JSON parser and both solver tiers so a scalar
    `"sigma_y": 1.5` and a per-element list mean the same thing
    everywhere.
    """
    def _arr(v, name, minimum):
        a = np.broadcast_to(np.asarray(v, dtype=dtype), (nelm,)).copy()
        if not np.all(np.isfinite(a)) or np.any(a < minimum):
            raise ValueError(f"plasticity: {name} must be finite and "
                             f">= {minimum}")
        return a

    return (_arr(sigma_y, "sigma_y", np.finfo(float).tiny),
            _arr(h_iso, "hardening (isotropic)", 0.0),
            _arr(h_kin, "hardening (kinematic)", 0.0))


def return_map(
    eps: jnp.ndarray,
    state: PlasticState,
    young: jnp.ndarray,
    params: PlasticParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, PlasticState]:
    """Radial return over an element batch.

    Args:
        eps: (nelm,) TOTAL axial strain at the trial displacement.
        state: committed internal variables from the previous step.
        young: (nelm,) elastic moduli.
        params: hardening parameters.

    Returns:
        (sigma, e_tan, new_state): return-mapped stress, algorithmic
        tangent modulus, and the would-be-committed state.  Callers
        commit `new_state` only once the step's Newton loop converges.
    """
    sigma_tr = young * (eps - state.eps_p)
    xi = sigma_tr - state.back
    # sign(0) = 0 would zero the flow direction exactly at the (measure-
    # zero) xi == 0 point; with f_tr <= 0 there dgamma is 0 anyway, so the
    # plain sign is safe AND keeps the kernel branch-free.
    sgn = jnp.sign(xi)
    f_tr = jnp.abs(xi) - (params.sigma_y + params.h_iso * state.alpha)
    denom = young + params.h_iso + params.h_kin
    dgamma = jnp.maximum(f_tr, 0.0) / denom
    plastic = f_tr > 0.0

    sigma = sigma_tr - young * dgamma * sgn
    e_tan = jnp.where(
        plastic, young * (params.h_iso + params.h_kin) / denom, young)
    new_state = PlasticState(
        eps_p=state.eps_p + dgamma * sgn,
        alpha=state.alpha + dgamma,
        back=state.back + params.h_kin * dgamma * sgn,
    )
    return sigma, e_tan, new_state


def plastic_element_batch(
    data,
    u: jnp.ndarray,
    state: PlasticState,
    young: jnp.ndarray,
    area: jnp.ndarray,
    params: PlasticParams,
    tangent_floor: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           PlasticState]:
    """Strain -> return map -> element force/tangent, batched.

    Small-strain kinematics: eps = g.u_e / L0 — the same measure the
    linear elastic kernel uses (ops/elements.py: truss_linear_batch), so
    an unyielded plastic solve is bit-comparable to the elastic one.

    Returns:
        (s_tan, fe, sigma, eps, new_state) where
        s_tan: (nelm,) tangent stiffness coefficients E_t A / L0 —
            exactly the elastic `stiffness_coefficients` contract, so the
            dense, CG and DIA operators all consume it unchanged;
        fe: (nelm, 2d) element internal force A sigma g.

    tangent_floor: K uses max(E_t, floor * E) so perfect plasticity
        (H_iso = H_kin = 0) cannot hand Newton an exactly singular
        tangent at a plastic mechanism; the RESIDUAL always uses the
        exact return-mapped sigma, so converged solutions are unaffected.
    """
    u_e = u[data.dof_map]
    eps = jnp.sum(data.gvec * u_e, axis=-1) * data.inv_len
    sigma, e_tan, new_state = return_map(eps, state, young, params)
    e_stab = jnp.maximum(e_tan, tangent_floor * young)
    s_tan = e_stab * area * data.inv_len
    fe = (area * sigma)[:, None] * data.gvec
    return s_tan, fe, sigma, eps, new_state


def assemble_plastic_system(
    data,
    material,
    u: jnp.ndarray,
    state: PlasticState,
    params: PlasticParams,
    load_factor=1.0,
    tangent_floor: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, PlasticState]:
    """Dense tangent assembly for the elastoplastic truss.

    Same global scatter as the elastic ops/assembly.assemble_system;
    only the element coefficient (E_t, not E) and the internal force
    (A sigma, not EA eps) differ.

    Returns:
        (K_t, f_int, sigma, new_state).
    """
    from .assembly import material_values

    young, area = material_values(data, material, load_factor)
    s_tan, fe, sigma, _, new_state = plastic_element_batch(
        data, u, state, young, area, params, tangent_floor)
    ke = s_tan[:, None, None] * data.gvec[:, :, None] * data.gvec[:, None, :]
    ndof = data.ndof
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    k_t = jnp.zeros((ndof, ndof), dtype=u.dtype).at[rows, cols].add(ke)
    f_int = jnp.zeros(ndof, dtype=u.dtype).at[data.dof_map].add(fe)
    return k_t, f_int, sigma, new_state
