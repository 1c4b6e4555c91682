"""Geometric (initial-stress) stiffness: prestress effects and buckling.

For a truss element carrying axial force N (positive = tension), the
initial-stress stiffness is

    ke_g = (N / L0) [[ I, -I],
                     [-I,  I]]          (I = dim x dim identity)

— exactly the `ke_geo` term of the wired Green-Lagrange tangent
(ops/elements.py:truss2d_green_lagrange_batch, where N = EA e_gl), here
linearized about a static equilibrium state u0.  Tension stiffens
transverse motion (taut string); compression softens it until
K + lambda K_g goes singular — the linearized buckling criterion.

The block pattern has the same (dof_map x dof_map) sparsity as the
material stiffness, so the DIA layout's entry_slot scatter map transfers
unchanged (as it does for the consistent mass, ops/mass.py).

No counterpart exists in the reference (statics-only, and its own
Green-Lagrange kernel is dead code — SURVEY §2.1/§7.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.fields import Material, assembly_inputs
from ..models.problem import ProblemData


def element_axial_forces(
    data: ProblemData, material: Material, u: jnp.ndarray, load_factor=1.0
) -> jnp.ndarray:
    """(nelm,) axial forces N_e = E A eps_e at the state u (linear strain,
    material at element midpoints — consistent with ops/assembly.py)."""
    x = assembly_inputs(data.mid, data.dimension, load_factor)
    young = material.young.eval_batch(x)
    area = material.area.eval_batch(x)
    u_e = u.reshape(-1)[data.dof_map]                    # (nelm, 2d)
    strain = jnp.sum(data.gvec * u_e, axis=-1) * data.inv_len
    return young * area * strain


def _geo_pattern(dim: int, dtype) -> jnp.ndarray:
    eye_d = jnp.eye(dim, dtype=dtype)
    return jnp.block([[eye_d, -eye_d], [-eye_d, eye_d]])  # (2d, 2d)


def assemble_geometric(
    data: ProblemData, n_e: jnp.ndarray
) -> jnp.ndarray:
    """Dense (ndof, ndof) geometric stiffness from element axial forces."""
    coef = n_e * data.inv_len                            # (nelm,)
    pattern = _geo_pattern(data.dimension, coef.dtype)
    ke = coef[:, None, None] * pattern[None, :, :]
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    ndof = data.ndof
    return jnp.zeros((ndof, ndof), ke.dtype).at[rows, cols].add(ke)


def assemble_geometric_dia(
    layout, data: ProblemData, n_e: jnp.ndarray
) -> jnp.ndarray:
    """Geometric stiffness in the banded DIA layout of the material K
    (same sparsity => same entry_slot scatter map)."""
    coef = n_e * data.inv_len
    pattern = _geo_pattern(data.dimension, coef.dtype)
    ke = coef[:, None, None] * pattern[None, :, :]
    flat = jnp.zeros((layout.n_diags * layout.ndof,), ke.dtype)
    flat = flat.at[jnp.asarray(layout.entry_slot)].add(ke)
    return flat.reshape(layout.n_diags, layout.ndof)
