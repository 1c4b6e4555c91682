"""Global system assembly: one fused gather/outer-product/scatter program.

Capability parity with BOTH reference assembly paths —
/root/reference/FEM/python/fem/assembly.py:16-75 (NumPy, element loop with
np.ix_ scatter) and nn_assembly.py:105-231 (torch, scalar-indexed scatter to
preserve autograd) — replaced by a single differentiable JAX function.
Because everything is jnp, gradients w.r.t. BOTH displacements and material
parameters flow through automatically; no second "autograd-preserving"
implementation is needed.

Behavioral contracts preserved:
  * material evaluated at ELEMENT MIDPOINTS (assembly.py:36-38, 58-61);
  * NN material inputs are (load_factor, x[, y]) columns —
    see models/fields.assembly_inputs;
  * density is never evaluated during assembly (only young/area enter the
    stiffness), matching the reference (assembly.py:39-41; SURVEY §7.3).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..models.fields import Material, assembly_inputs
from ..models.problem import ProblemData
from .elements import truss_linear_batch


def material_values(
    data: ProblemData, material: Material, load_factor
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate (young, area) at all element midpoints in one batch."""
    x = assembly_inputs(data.mid, data.dimension, load_factor)
    return material.young.eval_batch(x), material.area.eval_batch(x)


def assemble_system(
    data: ProblemData,
    material: Material,
    u: jnp.ndarray,
    load_factor=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble dense global stiffness, internal force and max strain.

    Args:
        data: device problem arrays.
        material: material field pytree (differentiable parameters inside).
        u: (ndof,) current displacements.
        load_factor: traced scalar, forwarded to load-factor-aware NN fields.

    Returns:
        (K, f_int, max_abs_strain):
            K (ndof, ndof), f_int (ndof,), max_abs_strain scalar —
            same contract as reference assemble_system (assembly.py:16,75).
    """
    young, area = material_values(data, material, load_factor)
    u_e = u[data.dof_map]                                  # (nelm, 2d) gather
    elem = truss_linear_batch(data.gvec, data.inv_len, u_e, young, area)

    ndof = data.ndof
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    k_global = jnp.zeros((ndof, ndof), dtype=u.dtype).at[rows, cols].add(elem.ke)
    f_int = jnp.zeros(ndof, dtype=u.dtype).at[data.dof_map].add(elem.fe_int)
    max_abs_strain = jnp.max(jnp.abs(elem.strain)) if data.nelm else jnp.zeros((), u.dtype)
    return k_global, f_int, max_abs_strain


def assemble_system_nonlinear(
    data: ProblemData,
    material: Material,
    u: jnp.ndarray,
    load_factor=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Geometrically nonlinear (Green-Lagrange) assembly (2D/3D).

    The reference ships this kernel as exposed-but-unwired API surface
    (element.py:105-133 imported at assembly.py:10 but never called); here
    it is a first-class opt-in: solve_nr(..., geometric_nonlinear=True).
    Returns (K_tangent, f_int, max_abs_strain) like assemble_system.
    """
    if data.dimension not in (2, 3):
        raise ValueError("geometric nonlinearity requires a 2D or 3D truss")
    from .elements import truss2d_green_lagrange_batch

    young, area = material_values(data, material, load_factor)
    dim = data.dimension
    # Rest chord vectors and nodal rest coordinates from the SoA fields.
    dx0 = data.gvec[:, dim:] / data.inv_len[:, None]
    x_i0 = data.mid - 0.5 * dx0
    x_j0 = data.mid + 0.5 * dx0
    x0 = jnp.stack([x_i0, x_j0], axis=1)                  # (nelm, 2, 2)
    u_e = u[data.dof_map]                                  # (nelm, 4)

    elem = truss2d_green_lagrange_batch(x0, u_e, data.inv_len, young, area)

    ndof = data.ndof
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    k_global = jnp.zeros((ndof, ndof), dtype=u.dtype).at[rows, cols].add(elem.ke)
    f_int = jnp.zeros(ndof, dtype=u.dtype).at[data.dof_map].add(elem.fe_int)
    return k_global, f_int, jnp.max(jnp.abs(elem.strain))


def internal_force_and_strain(
    data: ProblemData,
    material: Material,
    u: jnp.ndarray,
    load_factor=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Matrix-free internal force: never materializes K.

    This is the hot path for the gradient-descent/PINN solvers — the
    reference assembled the full K every iteration (nn_assembly.py:105) even
    though only f_int enters the loss; skipping K halves the scatter work
    and removes an O(ndof^2) buffer from the training loop.
    """
    from .scatter import segment_sum_dofs

    young, area = material_values(data, material, load_factor)
    u_e = u[data.dof_map]
    s = young * area * data.inv_len
    gu = jnp.sum(data.gvec * u_e, axis=-1)
    fe = (s * gu)[:, None] * data.gvec
    # Gather-based segment sum (ops/scatter.py): bandwidth-bound on TPU with
    # an explicit gather backward pass and deterministic accumulation order.
    f_int = segment_sum_dofs(fe, data.gather_map, data.dof_map)
    return f_int, gu * data.inv_len


def compute_residual_and_jacobian(
    data: ProblemData,
    material: Material,
    u: jnp.ndarray,
    f_ext: jnp.ndarray,
    free_idx: jnp.ndarray,
    load_factor=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual and tangent restricted to the free DOFs.

    Capability parity with the reference's exported helper
    /root/reference/FEM/python/fem/nn_assembly.py:234-261
    (compute_residual_and_jacobian), which its legacy examples consume:

        R_free = (f_int(u) - f_ext)[free]
        K_ff   = K(u)[free, :][:, free]     (= dR/du on the free block)

    Args:
        data: device problem arrays (``TrussProblem.to_device()``).
        material: material field pytree.
        u: (ndof,) current displacements.
        f_ext: (ndof,) external force vector (caller applies any load
            factor, exactly like the reference where f_ext is passed in).
        free_idx: (n_free,) integer indices of the free DOFs
            (``TrussProblem.free_fixed()[0]``).
        load_factor: forwarded to load-factor-aware NN material fields
            (the reference's torch assembly takes the same optional arg).

    Returns:
        (R_free, K_ff) with shapes (n_free,) and (n_free, n_free).
        Differentiable w.r.t. both ``u`` and material parameters.
    """
    k_global, f_int, _ = assemble_system(data, material, u, load_factor)
    residual = (f_int - f_ext)[free_idx]
    jacobian = k_global[jnp.ix_(free_idx, free_idx)]
    return residual, jacobian


def element_strain_stress(
    data: ProblemData,
    material: Material,
    u: jnp.ndarray,
    engineering: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-element engineering strain/stress from deformed geometry.

    Matches api_fem_solver.compute_element_stresses
    (api_fem_solver.py:78-118): eps = (L - L0)/L0 on the DEFORMED chord,
    sigma = E * eps.
    """
    u_e = u[data.dof_map]                                   # (nelm, 2d)
    dim = data.dimension
    du = u_e[:, dim:] - u_e[:, :dim]                        # (nelm, dim)
    # Rest chord vector = direction cosines * L0 = gvec[:, dim:] / inv_len.
    dx0 = data.gvec[:, dim:] / data.inv_len[:, None]
    if engineering:
        l_def = jnp.linalg.norm(dx0 + du, axis=1)
        eps = (l_def - 1.0 / data.inv_len) * data.inv_len
    else:
        eps = jnp.sum(data.gvec * u_e, axis=-1) * data.inv_len
    x = assembly_inputs(data.mid, dim, jnp.asarray(1.0, u.dtype))
    young = material.young.eval_batch(x)
    return eps, young * eps
