"""Vectorized truss element kernels.

API-surface parity with the reference element library
(/root/reference/FEM/python/fem/element.py: truss1d_linear_element:15-42,
truss2d_linear_element:45-102, truss2d_element_state:105-133) — but each
kernel here is written over BATCHES of elements so a whole mesh is one
vector program.  Single-element wrappers are provided for unit testing and
for API familiarity.

Note: as in the reference, the Green-Lagrange geometrically-nonlinear kernel
is exposed API surface but is NOT used by the default assembly path (the
reference imports it at assembly.py:10 and never calls it; its 2D solve path
uses the LINEAR kernel, assembly.py:52-73).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ElementBatch(NamedTuple):
    """Batched equivalent of the reference's ElementState (element.py:8-12)."""

    ke: jnp.ndarray      # (nelm, 2d, 2d) element stiffness
    fe_int: jnp.ndarray  # (nelm, 2d) internal force
    strain: jnp.ndarray  # (nelm,) axial strain measure


def truss_linear_batch(
    gvec: jnp.ndarray,
    inv_len: jnp.ndarray,
    u_e: jnp.ndarray,
    young: jnp.ndarray,
    area: jnp.ndarray,
) -> ElementBatch:
    """Linear truss kernel (1D and 2D unified) over a batch of elements.

    ke = s g g^T, fe = s (g.u) g, eps = (g.u) / L0, with s = E A / L0.
    Matches the closed forms at element.py:15-42 (1D) and element.py:45-102
    (2D: the c^2/cs/s^2 pattern is exactly g g^T).

    Args:
        gvec: (nelm, 2d) signed direction vectors.
        inv_len: (nelm,) reciprocal rest lengths.
        u_e: (nelm, 2d) element displacement vectors.
        young, area: (nelm,) material values at element midpoints.
    """
    s = young * area * inv_len                      # (nelm,)
    gu = jnp.sum(gvec * u_e, axis=-1)               # (nelm,) axial elongation
    ke = s[:, None, None] * gvec[:, :, None] * gvec[:, None, :]
    fe = (s * gu)[:, None] * gvec
    strain = gu * inv_len
    return ElementBatch(ke=ke, fe_int=fe, strain=strain)


def truss2d_green_lagrange_batch(
    x0: jnp.ndarray,
    u_e: jnp.ndarray,
    inv_len: jnp.ndarray,
    young: jnp.ndarray,
    area: jnp.ndarray,
) -> ElementBatch:
    """Geometrically nonlinear truss (Green-Lagrange), batched.

    Dimension-generic (the spatial dimension is read from x0's last axis;
    the reference kernel was 2D-only): 1D/2D/3D all use the same forms.

    Strain matches the reference kernel (element.py:105-133):
    e_gl = (L^2 - L0^2) / (2 L0^2).  Forces and tangent are the
    VARIATIONALLY CONSISTENT ones derived from the strain energy
    U = 1/2 E A L0 e_gl^2:

        f_e  = E A L0 e_gl  de/du              = (EA/L0) e_gl d
        K_e  = E A L0 (de/du de/du^T + e_gl d2e/du2)
             = (EA/L0^3) d d^T + (EA/L0) e_gl [[I, -I], [-I, I]]

    with d = [-dx, +dx] built from the DEFORMED chord.  (Documented
    divergence: the reference's never-called kernel signs d the opposite
    way — inconsistent with its own linear kernel — and evaluates the
    material tangent at the rest chord; as dead code the defect was
    invisible.  A wired solve path needs the consistent form.)

    Args:
        x0: (nelm, 2, dim) rest coordinates of the two element nodes (i, j).
        u_e: (nelm, 2*dim) displacements ordered [u_i..., u_j...].
    """
    dim = x0.shape[-1]
    dx0 = x0[:, 1, :] - x0[:, 0, :]                       # (nelm, dim)
    u2 = u_e.reshape(u_e.shape[0], 2, dim)
    delta = u2[:, 1, :] - u2[:, 0, :]                     # relative disp
    dx = dx0 + delta

    # e_gl = (L^2 - L0^2) / (2 L0^2), computed cancellation-free as
    # (dx0.delta + |delta|^2 / 2) / L0^2 — the naive difference of squares
    # loses all precision in float32 for small displacements.
    inv_l0_sq = inv_len * inv_len
    e_gl = (jnp.sum(dx0 * delta, axis=-1)
            + 0.5 * jnp.sum(delta * delta, axis=-1)) * inv_l0_sq

    d = jnp.concatenate([-dx, dx], axis=1)                # (nelm, 2*dim)

    ea_invl = young * area * inv_len                      # EA / L0
    ke_mat = (ea_invl * inv_len * inv_len)[:, None, None] * (
        d[:, :, None] * d[:, None, :]
    )
    eye_d = jnp.eye(dim, dtype=u_e.dtype)
    b_geo = jnp.block([[eye_d, -eye_d], [-eye_d, eye_d]])  # (2*dim, 2*dim)
    ke_geo = (ea_invl * e_gl)[:, None, None] * b_geo[None, :, :]
    fe = (ea_invl * e_gl)[:, None] * d
    return ElementBatch(ke=ke_mat + ke_geo, fe_int=fe, strain=e_gl)


# ---------------------------------------------------------------------------
# Single-element convenience wrappers (reference API shape, for tests/demos)
# ---------------------------------------------------------------------------


def truss1d_linear_element(x_i0, x_j0, u_i, u_j, young, area) -> ElementBatch:
    l0 = jnp.abs(jnp.asarray(x_j0) - jnp.asarray(x_i0))
    g = jnp.array([[-1.0, 1.0]])
    out = truss_linear_batch(
        g,
        (1.0 / l0)[None] if jnp.ndim(l0) else jnp.array([1.0 / l0]),
        jnp.array([[u_i, u_j]]),
        jnp.array([young]),
        jnp.array([area]),
    )
    return ElementBatch(ke=out.ke[0], fe_int=out.fe_int[0], strain=out.strain[0])


def truss2d_linear_element(x_i0, x_j0, u_i, u_j, young, area) -> ElementBatch:
    dx0 = jnp.asarray(x_j0, dtype=jnp.result_type(float)) - jnp.asarray(x_i0)
    l0 = jnp.linalg.norm(dx0)
    c = dx0 / l0
    g = jnp.concatenate([-c, c])[None, :]
    u_e = jnp.concatenate([jnp.asarray(u_i), jnp.asarray(u_j)])[None, :]
    out = truss_linear_batch(g, jnp.array([1.0 / l0]), u_e, jnp.array([young]), jnp.array([area]))
    return ElementBatch(ke=out.ke[0], fe_int=out.fe_int[0], strain=out.strain[0])


def truss2d_element_state(x_i0, x_j0, u_i, u_j, young, area) -> ElementBatch:
    x0 = jnp.stack([jnp.asarray(x_i0), jnp.asarray(x_j0)])[None, :, :]
    u_e = jnp.concatenate([jnp.asarray(u_i), jnp.asarray(u_j)])[None, :]
    l0 = jnp.linalg.norm(x0[0, 1] - x0[0, 0])
    out = truss2d_green_lagrange_batch(
        x0, u_e, jnp.array([1.0 / l0]), jnp.array([young]), jnp.array([area])
    )
    return ElementBatch(ke=out.ke[0], fe_int=out.fe_int[0], strain=out.strain[0])
