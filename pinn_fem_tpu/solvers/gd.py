"""Gradient-descent / PINN solver — the workhorse, fully on-device.

Capability parity with /root/reference/FEM/python/fem/solver.py:83-400
(solve_gd): dual Adam on displacements u (lr_u) and NN material parameters
theta (lr_theta), loss

    L = alpha_physics * 0.5 ||R_free||^2  (+ alpha_data * mean((u_meas - u)^2))

BC projection u[fixed]=0 after every step, convergence only after iteration
10 on residual_norm < tol OR loss < tol, two-phase "preconditioning" with
the reference's exact budgets (phase 1: min(300, max//3) iterations at
max(1e-4, 10*tol); phase 2: the remaining budget, warm-started), and the
same merged-history iteration renumbering (solver.py:169-195).

TPU-native design: the ENTIRE optimization loop (assembly + autodiff +
both Adam updates + projection + convergence test + history capture) is one
lax.while_loop inside one jitted program.  Per-iteration history rows are
written into a preallocated (HIST_CAP, 7) buffer (in-place under XLA) and
trimmed on host.  The reference pays Python+torch dispatch per iteration
(~450 it/s); this runs at tens of thousands of iterations/s on one TPU core.

Adam semantics match torch.optim.Adam defaults exactly
(optax.scale_by_adam with b1=0.9, b2=0.999, eps=1e-8, eps_root=0) — fresh
optimizer state per phase/increment, like the reference's per-call
torch.optim.Adam construction (solver.py:234-238).  As in the reference,
Adam also steps the fixed DOFs and the projection zeroes them afterwards.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


from ..config import SolverConfig, SolverResult
from ..models.fields import Material, MLPField
from ..models.problem import ProblemData, TrussProblem


# History buffer columns.
_HCOLS = ("iteration", "loss_total", "loss_physics", "loss_data", "u_norm",
          "residual_norm", "theta_norm")
_DEFAULT_HIST_CAP = 16384


# ---------------------------------------------------------------------------
# Material <-> trainable-parameter pytree plumbing
# ---------------------------------------------------------------------------


def get_theta(material: Material) -> list:
    """Trainable parameter pytree: [layers_of_each_MLP_field...] in the
    reference's young -> area -> density order (model.py:36-43)."""
    return [
        f.layers
        for f in (material.young, material.area, material.density)
        if isinstance(f, MLPField)
    ]


def set_theta(material: Material, theta: list) -> Material:
    """Rebuild the material with updated trainable layers."""
    fields = {}
    k = 0
    for name in ("young", "area", "density"):
        f = getattr(material, name)
        if isinstance(f, MLPField):
            f = f.replace(layers=theta[k])
            k += 1
        fields[name] = f
    return Material(**fields)


def theta_param_list(theta: list) -> list:
    """Flat [W1, b1, W2, b2, ...] per field — reference parameter order
    (torch Module.parameters() over Sequential Linear layers)."""
    out = []
    for layers in theta:
        for w, b in layers:
            out.extend([w, b])
    return out


def export_nn_parameters(theta: list) -> dict:
    """nn_parameters dict {param_i: ndarray} with torch-convention weight
    shapes (out, in) for output parity (solver.py:387-392)."""
    params = {}
    i = 0
    for layers in theta:
        for w, b in layers:
            params[f"param_{i}"] = np.asarray(w).T.copy()
            params[f"param_{i+1}"] = np.asarray(b).copy()
            i += 2
    return params


# ---------------------------------------------------------------------------
# Jitted optimization core
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("has_meas", "hist_cap"))
def _gd_core(
    data: ProblemData,
    material: Material,
    theta: list,
    u0: jnp.ndarray,
    load_factor,
    measured_vals: jnp.ndarray,
    measured_dofs: jnp.ndarray,
    max_iter,
    tol,
    lr_u,
    lr_theta,
    alpha_physics,
    alpha_data,
    has_meas: bool,
    hist_cap: int,
):
    from .phases import gd_phase, reactions_of

    out = gd_phase(
        data, material, set_theta, u0, theta, load_factor,
        measured_vals, measured_dofs, has_meas,
        max_iter, tol, lr_u, lr_theta, alpha_physics, alpha_data, hist_cap,
    )
    reactions = reactions_of(data, set_theta(material, out.theta), out.u, load_factor)
    return out.u, out.theta, reactions, out.n_iters, out.converged, out.hist, out.rnorm


# ---------------------------------------------------------------------------
# Host orchestration (phases, history assembly, result packing)
# ---------------------------------------------------------------------------


def _hist_rows_to_dicts(hist: np.ndarray, n: int, has_nn: bool, has_meas: bool) -> List[dict]:
    out = []
    for k in range(n):
        row = hist[k]
        entry = {
            "iteration": float(row[0]),
            "loss_total": float(row[1]),
            "loss_physics": float(row[2]),
            "loss_data": float(row[3]) if has_meas else 0.0,
            "u_norm": float(row[4]),
            "residual_norm": float(row[5]),
        }
        if has_nn:
            entry["theta_norm"] = float(row[6])
        out.append(entry)
    return out


def _hist_cap_for(max_iterations: int) -> int:
    cap = _DEFAULT_HIST_CAP
    while cap < max_iterations:
        cap *= 2
    return cap


def _run_gd_phase(
    problem: TrussProblem,
    data: ProblemData,
    config: SolverConfig,
    measured_disp,
    measured_dofs,
    target_load_factor: float,
    u_initial,
) -> Tuple[SolverResult, np.ndarray]:
    """One GD phase; updates problem.material in place (reference mutates the
    live torch modules, solver.py:201-202 + optimizer steps)."""
    dtype = data.loads.dtype
    material = problem.material
    theta = get_theta(material)
    has_nn = len(theta) > 0

    # The data term enters the loss iff measurements exist AND alpha_data > 0
    # (reference solver.py:273); loss_data is reported as 0.0 otherwise.
    provided = measured_disp is not None and measured_dofs is not None
    if provided and config.alpha_data == 0.0:
        logging.getLogger("pinn_fem_tpu.solvers").warning(
            "measured_dofs provided but alpha_data=0.0; data term ignored"
        )
    has_meas = (
        provided
        and config.alpha_data > 0.0
        and len(np.asarray(measured_dofs).reshape(-1)) > 0
    )
    if has_meas:
        mvals = jnp.asarray(np.asarray(measured_disp, dtype=float), dtype=dtype)
        mdofs = jnp.asarray(np.asarray(measured_dofs, dtype=int), dtype=jnp.int32)
    else:
        mvals = jnp.zeros((0,), dtype)
        mdofs = jnp.zeros((0,), jnp.int32)

    if u_initial is not None:
        u0 = jnp.asarray(np.asarray(u_initial, dtype=float).reshape(-1), dtype=dtype)
    else:
        u0 = jnp.zeros(problem.ndof, dtype=dtype)

    hist_cap = _hist_cap_for(config.max_iterations)
    u, th, reactions, it, conv, hist, rnorm = _gd_core(
        data,
        material,
        theta,
        u0,
        jnp.asarray(target_load_factor, dtype),
        mvals,
        mdofs,
        jnp.asarray(min(config.max_iterations, hist_cap), jnp.int32),
        jnp.asarray(config.tolerance, dtype),
        jnp.asarray(config.learning_rate_u, dtype),
        jnp.asarray(config.learning_rate_theta, dtype),
        jnp.asarray(config.alpha_physics, dtype),
        jnp.asarray(config.alpha_data, dtype),
        has_meas=bool(has_meas),
        hist_cap=hist_cap,
    )

    n_iters = int(it)
    problem.material = set_theta(material, jax.device_get(th))

    u_np = np.asarray(u, dtype=float)
    shape = (-1, 1) if problem.dimension == 1 else (problem.nnode, problem.dimension)
    history = _hist_rows_to_dicts(np.asarray(hist), n_iters, has_nn, bool(has_meas))

    nn_params = export_nn_parameters(get_theta(problem.material)) if has_nn else None
    result = SolverResult(
        displacements=u_np.reshape(shape),
        reactions=np.asarray(reactions, dtype=float).reshape(shape),
        converged=bool(conv),
        history=history,
        nn_parameters=nn_params,
    )
    return result, float(rnorm)


def solve_gd(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    target_load_factor: float = 1.0,
    u_initial: Optional[np.ndarray] = None,
    skip_preconditioning: bool = False,
    data: Optional[ProblemData] = None,
) -> SolverResult:
    """GD/PINN solve for one load increment (reference solve_gd, solver.py:83).

    With config.preconditioning, runs the reference's two-phase scheme:
    relaxed short phase, early-exit check, then the remaining budget at the
    tight tolerance, warm-started — histories merged with renumbered
    iterations (solver.py:114-195).
    """
    config = config or SolverConfig()
    data = data if data is not None else problem.to_device()

    if config.preconditioning and not skip_preconditioning:
        precon_config = config.with_(
            max_iterations=min(300, config.max_iterations // 3),
            tolerance=max(1e-4, config.tolerance * 10),
            preconditioning=False,
        )
        precon_result, precon_rnorm = _run_gd_phase(
            problem, data, precon_config, measured_disp, measured_dofs,
            target_load_factor, u_initial,
        )
        last = precon_result.history[-1] if precon_result.history else {}
        if precon_result.converged and last.get("residual_norm", 1.0) < config.tolerance:
            return precon_result

        main_config = config.with_(
            max_iterations=config.max_iterations - precon_config.max_iterations,
            preconditioning=False,
        )
        main_result, _ = _run_gd_phase(
            problem, data, main_config, measured_disp, measured_dofs,
            target_load_factor, precon_result.displacements.flatten(),
        )

        precon_iters = last.get("iteration", 0.0) if precon_result.history else 0.0
        unified = list(precon_result.history)
        for entry in main_result.history:
            e = dict(entry)
            e["iteration"] = entry.get("iteration", 0.0) + precon_iters
            unified.append(e)
        main_result.history = unified
        return main_result

    result, _ = _run_gd_phase(
        problem, data, config, measured_disp, measured_dofs,
        target_load_factor, u_initial,
    )
    return result
