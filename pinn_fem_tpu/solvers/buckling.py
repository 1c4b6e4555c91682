"""Linearized (eigenvalue) buckling: K phi = -lambda K_g phi.

Procedure (classic linear buckling, absent from the statics-only
reference):

  1. linear static solve at the problem's loads -> u0;
  2. element axial forces N_e at u0 -> geometric stiffness K_g
     (ops/geometric.py — the same initial-stress operator the wired
     Green-Lagrange tangent carries);
  3. smallest load multipliers lambda with (K + lambda K_g) phi = 0.

Reduction: on the free block, K_ff is SPD, so with K_ff = L L^T the
pencil becomes a STANDARD symmetric eigenproblem
A = L^{-1} (-K_g,ff) L^{-T}, whose eigenvalues mu relate by
lambda = 1 / mu.  Positive mu are destabilizing directions; the largest
mu gives the critical load factor.  Everything is eigh-based and
therefore differentiable — critical load factors can serve as
optimization/identification signals just like natural frequencies
(solvers/modal.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import TrussProblem
from ..ops.assembly import assemble_system
from ..ops.geometric import assemble_geometric, element_axial_forces


class BucklingResult(NamedTuple):
    load_factors: np.ndarray   # (n_modes,) ascending positive multipliers
                               # (inf where fewer destabilizing modes exist)
    modes: np.ndarray          # (ndof, n_modes) buckling shapes, zeros on
                               # fixed DOFs, K-orthonormal on the free block
    axial_forces: np.ndarray   # (nelm,) N_e of the base state (tension > 0)
    u_base: np.ndarray         # (ndof,) the linear static base state


def buckling_eigenvalues(problem: TrussProblem, n_modes: int = 4,
                         data=None, material=None,
                         u_base: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Traced smallest positive buckling load factors (differentiable core).

    `material` overrides problem.material for traced parameter pytrees;
    `u_base` skips the internal static solve when the base state is known.
    Entries are +inf when the pencil has fewer destabilizing directions
    than n_modes."""
    lam, _, _, _ = _buckling_traced(problem, n_modes, data, material, u_base)
    return lam


def _buckling_traced(problem, n_modes, data, material, u_base):
    from ..ops.linalg import masked_solve
    from .newton import DENSE_DOF_LIMIT

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(
            f"buckling analysis is dense-only ({problem.ndof} DOFs > "
            f"{DENSE_DOF_LIMIT}); a 2M-DOF dense K is 16 TB — reduce the "
            "mesh or track compression via modal_analysis(prestress_u=...) "
            "on the banded path")
    data = data if data is not None else problem.to_device()
    material = material if material is not None else problem.material
    dtype = data.loads.dtype
    free_idx = jnp.asarray(problem.free_fixed()[0])

    k = assemble_system(data, material, jnp.zeros(problem.ndof, dtype))[0]
    if u_base is None:
        u_base = masked_solve(k, data.loads, data.free_mask)
    n_e = element_axial_forces(data, material, u_base)
    kg = assemble_geometric(data, n_e)

    k_ff = k[jnp.ix_(free_idx, free_idx)]
    kg_ff = kg[jnp.ix_(free_idx, free_idx)]
    lo = jnp.linalg.cholesky(k_ff)
    b = jax.scipy.linalg.solve_triangular(lo, -kg_ff, lower=True)
    a = jax.scipy.linalg.solve_triangular(lo, b.T, lower=True).T
    a = 0.5 * (a + a.T)
    mu, y = jnp.linalg.eigh(a)                    # ascending
    mu_desc = mu[::-1]                            # largest destabilizing 1st
    y_desc = y[:, ::-1]
    lam = jnp.where(mu_desc > 0, 1.0 / mu_desc, jnp.inf)[:n_modes]
    v = jax.scipy.linalg.solve_triangular(
        lo.T, y_desc[:, :n_modes], lower=False)   # K-orthonormal
    return lam, v, n_e, u_base


def buckling_analysis(problem: TrussProblem, n_modes: int = 4,
                      data=None) -> BucklingResult:
    """Critical load factors and buckling modes (see module docstring).

    The mesh's loads define the base load pattern; load_factors scale it:
    the structure loses stability at loads = load_factors[0] * loads."""
    data = data if data is not None else problem.to_device()
    free_idx, _ = problem.free_fixed()
    n_modes = min(n_modes, free_idx.size)
    lam, v, n_e, u_base = _buckling_traced(problem, n_modes, data, None, None)
    shapes = jnp.zeros((problem.ndof, n_modes), v.dtype).at[
        jnp.asarray(free_idx)].set(v)
    lam, shapes, n_e, u_base = jax.device_get((lam, shapes, n_e, u_base))
    return BucklingResult(
        load_factors=np.asarray(lam), modes=np.asarray(shapes),
        axial_forces=np.asarray(n_e), u_base=np.asarray(u_base),
    )
