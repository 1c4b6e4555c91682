"""Thermal (free-strain) loading: equivalent nodal forces for alpha dT.

An extension beyond the reference (which has no load types other than
direct nodal forces).  With free strain eps0 = alpha dT per element, the
element energy is U = 1/2 E A L (eps - eps0)^2, so equilibrium solves

    K u = f_ext + f_th,   f_th = sum_e E A alpha dT_e g_e

(g_e the signed direction pair — a heated element pushes its end nodes
apart).  Exact for linear kinematics.  Closed-form anchors
(tests/test_thermal.py): a fully constrained bar stays at u = 0 with
support reactions E A alpha dT, a free bar elongates alpha dT L
stress-free, and ANY statically determinate truss heated uniformly
displaces as pure scaling about its support, u = alpha dT (x - x_fix),
with zero member stress.

Mechanical stress recovery must subtract the free strain:
sigma = E (eps - alpha dT); `thermal_free_strains` supplies the eps0
vector for that correction.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.fields import Material, assembly_inputs
from ..models.problem import ProblemData


def _per_element(values, nelm: int, name: str, dtype):
    arr = jnp.asarray(values, dtype)
    if arr.ndim == 0:
        return jnp.broadcast_to(arr, (nelm,))
    if arr.shape == (nelm,):
        return arr
    raise ValueError(f"{name} must be a scalar or length-nelm list")


def element_delta_t(data: ProblemData, delta_t, nnode: int) -> jnp.ndarray:
    """Element temperature changes from a scalar, per-NODE (nnode,) or
    per-element (nelm,) spec (per-node averages the two end nodes).

    When nelm == nnode (e.g. a closed ring) the shapes are ambiguous;
    PER-NODE wins — the problem-JSON schema is node-centric (BCs, loads
    and measurements are all per node), so a list the length of the node
    table means node temperatures."""
    arr = jnp.asarray(delta_t, data.loads.dtype)
    if arr.ndim == 0:
        return jnp.broadcast_to(arr, (data.nelm,))
    if arr.shape == (nnode,):
        conn = data.dof_map[:, ::data.dimension] // data.dimension
        return 0.5 * (arr[conn[:, 0]] + arr[conn[:, 1]])
    if arr.shape == (data.nelm,):
        return arr
    raise ValueError("delta_t must be scalar, (nnode,) or (nelm,)")


def thermal_free_strains(data: ProblemData, alpha, dt_e) -> jnp.ndarray:
    """(nelm,) free strains eps0 = alpha dT."""
    a = _per_element(alpha, data.nelm, "alpha", data.loads.dtype)
    return a * dt_e


def thermal_loads(
    data: ProblemData, material: Material, alpha, dt_e, load_factor=1.0
) -> jnp.ndarray:
    """(ndof,) equivalent nodal forces f_th = sum_e E A alpha dT g_e."""
    x = assembly_inputs(data.mid, data.dimension, load_factor)
    young = material.young.eval_batch(x)
    area = material.area.eval_batch(x)
    eps0 = thermal_free_strains(data, alpha, dt_e)
    coef = young * area * eps0                          # (nelm,)
    contrib = coef[:, None] * data.gvec                 # (nelm, 2d)
    return jnp.zeros(data.ndof, coef.dtype).at[data.dof_map].add(contrib)
