"""Gauss-Newton + Levenberg-Marquardt + Armijo backtracking solver.

Capability parity with the reference's legacy PINN solver
(/root/reference/FEM/python/fem/nn_solver.py: solve_pinn_newton_raphson,
nn_solver.py:138-426): simultaneous solve of (u, theta) via Gauss-Newton on
the stacked weighted residual

    R(z) = [ alpha_physics * (F_int(u, theta) - lf * F_ext)_free ]
           [ alpha_data    * (u_measured - u[measured_dofs])     ]

with LM damping 1e-6 * tr(J^T J) / n (nn_solver.py:266-277) and a
backtracking line search: accept when |R(z + s dz)| < |R(z)| (1 - 1e-4 s),
else s *= 0.7, 15 tries (nn_solver.py:290-355).  Convergence on
relative_error = |R| / max(|u_free|, min_denom) < tol (nn_solver.py:377-395).
History rows {iteration, r_physics, r_data, r_total, relative_error,
step_size} match nn_solver.py:379-386.

TPU-native: the Jacobian is one jax.jacrev call (the reference built
J_u_theta with a Python loop of per-row backward passes,
nn_solver.py:95-109), and the whole GN iteration incl. line search runs in
a lax.while_loop.

Documented divergence: the reference's line search leaves the trial theta
update applied when it accepts, and then applies the update AGAIN in its
update section (nn_solver.py:307-313 + 366-371) — accepted theta steps
move 2x the accepted step.  We apply the accepted step exactly once.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig, SolverResult
from ..models.problem import ProblemData, TrussProblem
from .gd import export_nn_parameters, get_theta, set_theta


@partial(jax.jit, static_argnames=("has_meas", "hist_cap", "n_free"))
def _gn_core(
    data: ProblemData,
    material,
    theta: list,
    free_idx: jnp.ndarray,
    u0_free: jnp.ndarray,
    load_factor,
    measured_vals,
    measured_dofs,
    max_iter,
    tol,
    alpha_physics,
    alpha_data,
    min_denom,
    has_meas: bool,
    hist_cap: int,
    n_free: int,
):
    from .phases import gn_phase, reactions_of

    dtype = u0_free.dtype
    u0 = jnp.zeros(data.ndof, dtype).at[free_idx].set(u0_free)
    out = gn_phase(
        data, material, set_theta, u0, theta, free_idx, load_factor,
        measured_vals, measured_dofs, has_meas,
        max_iter, tol, alpha_physics, alpha_data, min_denom, hist_cap,
    )
    mat = set_theta(material, out.theta)
    reactions = reactions_of(data, mat, out.u, load_factor)
    return out.u, out.theta, reactions, out.n_rows, out.converged, out.hist


def solve_gauss_newton(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    target_load_factor: float = 1.0,
    u_initial: Optional[np.ndarray] = None,
    data: Optional[ProblemData] = None,
    alpha_physics: Optional[float] = None,
    alpha_data: Optional[float] = None,
) -> SolverResult:
    """Gauss-Newton/LM solve for one load increment (method "gn").

    Works with NN materials (theta = MLP weights) and also as a pure
    displacement solver when the material is scalar (theta empty).
    """
    config = config or SolverConfig()
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype

    free_idx_np, _ = problem.free_fixed()
    free_idx = jnp.asarray(free_idx_np, jnp.int32)
    n_free = int(free_idx_np.size)

    provided = measured_disp is not None and measured_dofs is not None
    has_meas = provided and len(np.asarray(measured_dofs).reshape(-1)) > 0
    if has_meas:
        mvals = jnp.asarray(np.asarray(measured_disp, dtype=float), dtype=dtype)
        mdofs = jnp.asarray(np.asarray(measured_dofs, dtype=int), jnp.int32)
    else:
        mvals = jnp.zeros((0,), dtype)
        mdofs = jnp.zeros((0,), jnp.int32)

    u0 = (
        np.asarray(u_initial, dtype=float).reshape(-1)[free_idx_np]
        if u_initial is not None else np.zeros(n_free)
    )
    theta = get_theta(problem.material)

    hist_cap = 256
    while hist_cap < config.max_iterations:
        hist_cap *= 2

    # The legacy solver weights physics/data at 1.0/1.0 by default
    # (nn_solver.py PINNSolverConfig); driver-style callers pass config's.
    a_p = alpha_physics if alpha_physics is not None else config.alpha_physics
    a_d = alpha_data if alpha_data is not None else config.alpha_data

    u, th, reactions, it, conv, hist = _gn_core(
        data, problem.material, theta, free_idx,
        jnp.asarray(u0, dtype),
        jnp.asarray(target_load_factor, dtype),
        mvals, mdofs,
        jnp.asarray(min(config.max_iterations, hist_cap), jnp.int32),
        jnp.asarray(config.tolerance, dtype),
        jnp.asarray(a_p, dtype),
        jnp.asarray(a_d, dtype),
        jnp.asarray(config.min_denominator, dtype),
        has_meas=bool(has_meas),
        hist_cap=hist_cap,
        n_free=n_free,
    )

    if theta:
        problem.material = set_theta(problem.material, jax.device_get(th))

    hist_np = np.asarray(hist)
    history = []
    for k in range(int(it)):
        row = hist_np[k]
        history.append({
            "iteration": float(row[0]),
            "r_physics": float(row[1]),
            "r_data": float(row[2]),
            "r_total": float(row[3]),
            "relative_error": float(row[4]),
            "step_size": float(row[5]),
        })

    shape = (-1, 1) if problem.dimension == 1 else (problem.nnode, problem.dimension)
    return SolverResult(
        displacements=np.asarray(u, dtype=float).reshape(shape),
        reactions=np.asarray(reactions, dtype=float).reshape(shape),
        converged=bool(conv),
        history=history,
        nn_parameters=export_nn_parameters(get_theta(problem.material)) if theta else None,
    )
