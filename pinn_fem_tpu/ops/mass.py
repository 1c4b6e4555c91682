"""Mass matrices for truss meshes: the missing half of the dynamics story.

The reference parses a density property and then never evaluates it — no
mass matrix, no dynamics, no modal analysis exist anywhere in it (its
assembly uses only young/area, reference assembly.py:39-41; SURVEY §7.3
documents density as physics-inert).  This module is therefore an
extension: it gives density its physical meaning and feeds the transient
(solvers/dynamics.py) and modal (solvers/modal.py) solvers.

Forms:
  * lumped (diagonal): each element's mass m_e = rho A L0 splits half to
    each end node, identically on every translational DOF.  Diagonal M is
    what the explicit integrator wants (M^-1 is pointwise) and is exact
    enough for the low modes (second-order convergent, like consistent).
  * consistent: me = (rho A L0 / 6) * [[2I, I], [I, 2I]] per element —
    the variationally exact Galerkin mass of linear interpolation.
    Assembled dense or into the banded DIA layout (same sparsity as K, so
    the same entry_slot scatter map applies).

Everything is differentiable w.r.t. material parameters: a density MLP
finally receives nonzero gradients — through frequencies and transient
trajectories instead of the static residual (see
examples/modal_identification.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.fields import Material, assembly_inputs
from ..models.problem import ProblemData


def element_masses(
    data: ProblemData, material: Material, load_factor=1.0
) -> jnp.ndarray:
    """(nelm,) element masses rho * A * L0, material at element midpoints
    (the same midpoint rule the stiffness uses)."""
    x = assembly_inputs(data.mid, data.dimension, load_factor)
    rho = material.density.eval_batch(x)
    area = material.area.eval_batch(x)
    return rho * area / data.inv_len


def lumped_mass(
    data: ProblemData, material: Material, load_factor=1.0
) -> jnp.ndarray:
    """Diagonal (ndof,) lumped mass vector.

    Half of each element's mass lands on every translational DOF of each
    of its two end nodes; non-structural payload mass
    (data.point_mass, models/problem.py) adds directly per DOF.
    """
    m_e = element_masses(data, material, load_factor)       # (nelm,)
    contrib = jnp.broadcast_to(
        (0.5 * m_e)[:, None], data.dof_map.shape
    )                                                        # (nelm, 2d)
    m = jnp.zeros(data.ndof, m_e.dtype).at[data.dof_map].add(contrib)
    if data.point_mass is not None:
        m = m + data.point_mass
    return m


def _consistent_me(data: ProblemData, m_e: jnp.ndarray) -> jnp.ndarray:
    """(nelm, 2d, 2d) consistent element mass blocks."""
    d = data.dimension
    eye_d = jnp.eye(d, dtype=m_e.dtype)
    pattern = jnp.block([[2.0 * eye_d, eye_d],
                         [eye_d, 2.0 * eye_d]]) / 6.0        # (2d, 2d)
    return m_e[:, None, None] * pattern[None, :, :]


def consistent_mass(
    data: ProblemData, material: Material, load_factor=1.0
) -> jnp.ndarray:
    """Dense (ndof, ndof) consistent mass matrix (payload point mass on
    the diagonal — a lumped payload stays lumped under any shape
    functions)."""
    me = _consistent_me(data, element_masses(data, material, load_factor))
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    ndof = data.ndof
    m = jnp.zeros((ndof, ndof), me.dtype).at[rows, cols].add(me)
    if data.point_mass is not None:
        m = m + jnp.diag(data.point_mass)
    return m


def consistent_mass_dia(
    layout, data: ProblemData, material: Material, load_factor=1.0
) -> jnp.ndarray:
    """Consistent mass in the banded DIA layout of the stiffness.

    The element mass block has the same (dof_map x dof_map) sparsity as
    the stiffness block, so the stiffness layout's entry_slot scatter map
    applies unchanged.
    """
    me = _consistent_me(data, element_masses(data, material, load_factor))
    flat = jnp.zeros((layout.n_diags * layout.ndof,), me.dtype)
    flat = flat.at[jnp.asarray(layout.entry_slot)].add(me)
    diags = flat.reshape(layout.n_diags, layout.ndof)
    if data.point_mass is not None:
        import numpy as _np

        k0 = int(_np.where(_np.asarray(layout.offsets) == 0)[0][0])
        diags = diags.at[k0].add(data.point_mass)
    return diags


def total_mass(data: ProblemData, material: Material) -> jnp.ndarray:
    """Scalar structural mass (sanity invariant: lumped and consistent
    row-sums both integrate to this)."""
    return jnp.sum(element_masses(data, material))
