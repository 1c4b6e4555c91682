"""Fully-fused incremental solver: the ENTIRE multi-increment solve — load
stepping, warm starts, GD preconditioning phases, early-exit decisions,
hybrid GD->NR hand-off — runs as ONE XLA program on device.

This is the performance engine.  The host-stepped drivers (driver.solve)
replicate the reference's per-increment Python orchestration and pay one
host<->device round trip per phase (~200 ms each through a remote TPU
tunnel, ~20 per solve); this module folds the increment loop into
lax.scan and the phase logic into traced conditionals, so a full solve is
one dispatch.  Semantics are identical to driver.solve for all methods
(nr, gd, hybrid, full-nr, gn) — tests/test_fused.py asserts bit-level
agreement of displacements and history against the host-stepped path.

Reference semantics encoded on device:
  * load stepping lf_i = lf0 + (i/n)(lf1 - lf0), warm-started u
    (solver.py:1094-1116);
  * abort on a failed increment — later increments become no-ops and the
    failing increment's state is returned (solver.py:1161-1165);
  * GD preconditioning budgets min(300, max//3) at max(1e-4, 10*tol), with
    the early-exit check on the phase-1 residual (solver.py:114-167);
  * hybrid: GD precondition then GD-tight (NN) or true NR (scalar)
    finalization (solver.py:520-692);
  * per-phase Adam state resets, matching the reference's fresh
    torch.optim.Adam per solve_gd call.

Only the LAST executed increment's history is materialized (that is all
solve() returns — solver.py:1167), so device->host traffic stays small.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig, SolverResult
from ..models.problem import ProblemData, TrussProblem
from .gd import (
    _hist_cap_for,
    _hist_rows_to_dicts,
    export_nn_parameters,
    get_theta,
    set_theta,
)
from .phases import (
    GD_HIST_COLS,
    full_nr_phase,
    gd_phase,
    gn_phase,
    nr_phase,
    reactions_of,
)


@partial(
    jax.jit,
    static_argnames=(
        "method", "has_meas", "precond", "has_nn", "hist_cap", "n_increments",
        "warm_start",
    ),
)
def _fused_core(
    data: ProblemData,
    material,
    theta: list,
    free_idx: jnp.ndarray,
    measured_vals: jnp.ndarray,
    measured_dofs: jnp.ndarray,
    lf_initial,
    lf_final,
    max_iter,
    tol,
    data_tol,
    lr_u,
    lr_theta,
    alpha_physics,
    alpha_data,
    min_denom,
    precon_cap,
    method: str,
    has_meas: bool,
    precond: bool,
    has_nn: bool,
    hist_cap: int,
    n_increments: int,
    warm_start: bool,
):
    dtype = data.loads.dtype
    ndof = data.ndof
    zero_hist = jnp.zeros((hist_cap, GD_HIST_COLS), dtype)

    relaxed_tol = jnp.maximum(jnp.asarray(1e-4, dtype), tol * 10.0)

    def run_gd(u, th, lf, cap, phase_tol):
        return gd_phase(
            data, material, set_theta, u, th, lf,
            measured_vals, measured_dofs, has_meas,
            cap, phase_tol, lr_u, lr_theta, alpha_physics, alpha_data, hist_cap,
        )

    def gd_with_precond(u, th, lf, alive):
        """solve_gd's two-phase scheme (solver.py:114-195), traced.

        Returns (u, th, hist1, n1, hist2, n2, conv, rnorm, used_phase2).
        When `alive` is False every phase runs 0 iterations.
        """
        budget = jnp.where(alive, max_iter, 0)
        if precond:
            cap1 = jnp.where(alive, precon_cap, 0)
            p1 = run_gd(u, th, lf, cap1, relaxed_tol)
            # Early exit: phase 1 converged AND already under the tight tol.
            skip2 = jnp.logical_and(p1.converged, p1.rnorm < tol)
            cap2 = jnp.where(skip2, 0, budget - precon_cap)
            p2 = run_gd(p1.u, p1.theta, lf, cap2, tol)
            conv = jnp.where(skip2, p1.converged, p2.converged)
            rnorm = jnp.where(skip2, p1.rnorm, p2.rnorm)
            return (p2.u, p2.theta, p1.hist, p1.n_iters, p2.hist, p2.n_iters,
                    conv, rnorm)
        p = run_gd(u, th, lf, budget, tol)
        return (p.u, p.theta, zero_hist, jnp.zeros((), jnp.int32), p.hist,
                p.n_iters, p.converged, p.rnorm)

    def hybrid_inc(u, th, lf, alive):
        """solve_hybrid per increment (solver.py:520-692), traced."""
        if precond:
            cap1 = jnp.where(alive, precon_cap, 0)
            p1 = run_gd(u, th, lf, cap1, relaxed_tol)
            skip2 = jnp.logical_and(p1.converged, p1.rnorm < tol)
            u1, th1 = p1.u, p1.theta
            hist1, n1 = p1.hist, p1.n_iters
            budget2 = max_iter - precon_cap
        else:
            skip2 = jnp.zeros((), bool)
            u1, th1 = u, th
            hist1, n1 = zero_hist, jnp.zeros((), jnp.int32)
            budget2 = max_iter

        if has_nn:
            cap2 = jnp.where(jnp.logical_and(alive, jnp.logical_not(skip2)),
                             budget2, 0)
            p2 = run_gd(u1, th1, lf, cap2, tol)
            conv = jnp.where(skip2, jnp.ones((), bool), p2.converged)
            return (p2.u, p2.theta, hist1, n1, p2.hist, p2.n_iters, conv,
                    jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
                    jnp.zeros((), dtype))
        # Scalar path: NR finalization.  If phase 1 already met the tight
        # tolerance the reference returns the GD result (solver.py:578-582).
        cap_nr = jnp.where(jnp.logical_and(alive, jnp.logical_not(skip2)),
                           max_iter, 0)
        nr = nr_phase(data, material, u1, lf, cap_nr, tol, min_denom)
        u2 = jnp.where(skip2, u1, nr.u)
        conv = jnp.where(skip2, jnp.ones((), bool), nr.converged)
        return (u2, th1, hist1, n1, zero_hist, jnp.zeros((), jnp.int32), conv,
                nr.residual, nr.n_iters, nr.max_strain)

    def inc_body(carry, i):
        u, th, dead, _prev = carry
        lf = lf_initial + ((i + 1).astype(dtype) / n_increments) * (
            lf_final - lf_initial
        )
        alive = jnp.logical_not(dead)

        if method == "nr":
            # Host parity: warm start only under config.nr_warm_start
            # (newton.py:241-244; the reference always restarts from zeros).
            u_start = u if warm_start else jnp.zeros_like(u)
            cap = jnp.where(alive, max_iter, 0)
            nr = nr_phase(data, material, u_start, lf, cap, tol, min_denom)
            u2, th2, conv = nr.u, th, nr.converged
            out = (zero_hist, jnp.zeros((), jnp.int32), zero_hist,
                   jnp.zeros((), jnp.int32), nr.residual, nr.n_iters,
                   nr.max_strain)
        elif method == "full-nr":
            # Coupled (u, theta) Newton per increment (full_newton.py
            # semantics); theta always carries, u per nr_warm_start —
            # driver.py:108-118 passes the warm start under the same flag.
            u_start = u if warm_start else jnp.zeros_like(u)
            cap = jnp.where(alive, max_iter, 0)
            p = full_nr_phase(
                data, material, set_theta, u_start, th, free_idx, lf,
                measured_vals, measured_dofs, has_meas,
                cap, tol, data_tol, lr_u, lr_theta, hist_cap,
            )
            u2, th2, conv = p.u, p.theta, p.converged
            out = (zero_hist, jnp.zeros((), jnp.int32), p.hist, p.n_rows,
                   jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
                   jnp.zeros((), dtype))
        elif method == "gn":
            # Gauss-Newton/LM/Armijo per increment (gauss_newton.py
            # semantics); warm-started unconditionally like gd (driver.py:119-125).
            cap = jnp.where(alive, max_iter, 0)
            p = gn_phase(
                data, material, set_theta, u, th, free_idx, lf,
                measured_vals, measured_dofs, has_meas,
                cap, tol, alpha_physics, alpha_data, min_denom, hist_cap,
            )
            u2, th2, conv = p.u, p.theta, p.converged
            out = (zero_hist, jnp.zeros((), jnp.int32), p.hist, p.n_rows,
                   jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
                   jnp.zeros((), dtype))
        elif method == "gd":
            u2, th2, h1, n1, h2, n2, conv, rnorm = gd_with_precond(u, th, lf, alive)
            out = (h1, n1, h2, n2, rnorm, jnp.zeros((), jnp.int32),
                   jnp.zeros((), dtype))
        elif method == "hybrid":
            (u2, th2, h1, n1, h2, n2, conv, nr_res, nr_it,
             nr_strain) = hybrid_inc(u, th, lf, alive)
            out = (h1, n1, h2, n2, nr_res, nr_it, nr_strain)
        else:
            raise ValueError(f"fused solver does not support method {method!r}")

        # Freeze the carried state on the first failed increment
        # (solver.py:1161-1165: break, return the failing increment result).
        keep = alive
        u_next = jnp.where(keep, u2, u)
        th_next = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep, new, old), th2, th
        )
        snap = (jnp.where(keep, lf, _prev[0]), conv, *out)
        # Only overwrite the increment snapshot while alive.
        snap = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep, new, old), snap, _prev
        )
        dead_next = jnp.logical_or(dead, jnp.logical_not(conv))
        return (u_next, th_next, dead_next, snap), None

    init_snap = (
        jnp.zeros((), dtype),               # load factor
        jnp.zeros((), bool),                # converged
        zero_hist, jnp.zeros((), jnp.int32),
        zero_hist, jnp.zeros((), jnp.int32),
        jnp.zeros((), dtype),               # nr residual / gd rnorm
        jnp.zeros((), jnp.int32),           # nr iterations
        jnp.zeros((), dtype),               # nr max_strain
    )
    u0 = jnp.zeros(ndof, dtype)
    (u, th, dead, snap), _ = jax.lax.scan(
        inc_body, (u0, theta, jnp.zeros((), bool), init_snap),
        jnp.arange(n_increments),
    )

    lf_last, conv, h1, n1, h2, n2, aux_res, aux_it, aux_strain = snap
    reactions = reactions_of(data, set_theta(material, th), u, lf_last)
    return (u, th, reactions, lf_last, conv, h1, n1, h2, n2, aux_res, aux_it,
            aux_strain)


def solve_fused(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    measured_disp: Optional[np.ndarray] = None,
    measured_dofs: Optional[np.ndarray] = None,
    data: Optional[ProblemData] = None,
    verbose: bool = False,
) -> SolverResult:
    """Drop-in replacement for driver.solve for all methods
    (nr / gd / hybrid / full-nr / gn)."""
    from .driver import resolve_method

    config = config or SolverConfig()
    method = resolve_method(problem, config, measured_disp, measured_dofs)
    if method == "full_nr":
        method = "full-nr"
    if method not in ("nr", "gd", "hybrid", "full-nr", "gn"):
        raise ValueError(
            f"solve_fused supports nr/gd/hybrid/full-nr/gn, not {method!r}"
        )

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    theta = get_theta(problem.material)
    has_nn = len(theta) > 0

    if method == "full-nr" and not has_nn:
        # Full NR == classic NR without parameters (solver.py:787-790);
        # mirrors solve_full_nr's delegation so host and fused agree.
        method = "nr"
    if method == "nr" and has_nn:
        raise ValueError(
            "Newton-Raphson solver with NN materials not fully supported yet. "
            "Use solve_gd() for problems with NN parameters."
        )

    provided = measured_disp is not None and measured_dofs is not None
    has_any = provided and len(np.asarray(measured_dofs).reshape(-1)) > 0
    # GD weights the data term by alpha_data, so alpha_data == 0 disables it
    # (solver.py:273); full-NR's loss is unweighted (solver.py:845) and GN
    # applies its own weights inside the stacked residual — both consume
    # measurements regardless of alpha_data, matching the host paths.
    if method in ("full-nr", "gn"):
        has_meas = has_any
    else:
        has_meas = has_any and config.alpha_data > 0.0
    if has_meas:
        mvals = jnp.asarray(np.asarray(measured_disp, dtype=float), dtype=dtype)
        mdofs = jnp.asarray(np.asarray(measured_dofs, dtype=int), dtype=jnp.int32)
    else:
        mvals = jnp.zeros((0,), dtype)
        mdofs = jnp.zeros((0,), jnp.int32)

    free_idx_np, _ = problem.free_fixed()
    free_idx = jnp.asarray(free_idx_np, jnp.int32)

    hist_cap = _hist_cap_for(config.max_iterations)
    precon_cap = min(300, config.max_iterations // 3)

    (u, th, reactions, lf_last, conv, h1, n1, h2, n2, aux_res, aux_it,
     aux_strain) = _fused_core(
        data,
        problem.material,
        theta,
        free_idx,
        mvals,
        mdofs,
        jnp.asarray(config.load_factor_initial, dtype),
        jnp.asarray(config.load_factor_final, dtype),
        jnp.asarray(min(config.max_iterations, hist_cap), jnp.int32),
        jnp.asarray(config.tolerance, dtype),
        jnp.asarray(config.full_nr_data_tolerance, dtype),
        jnp.asarray(config.learning_rate_u, dtype),
        jnp.asarray(config.learning_rate_theta, dtype),
        jnp.asarray(config.alpha_physics, dtype),
        jnp.asarray(config.alpha_data, dtype),
        jnp.asarray(config.min_denominator, dtype),
        jnp.asarray(precon_cap, jnp.int32),
        method=method,
        has_meas=bool(has_meas),
        precond=bool(config.preconditioning),
        has_nn=has_nn,
        hist_cap=hist_cap,
        n_increments=config.n_increments,
        warm_start=bool(config.nr_warm_start),
    )

    # Device->host traffic discipline: every individual fetch pays a ~30 ms
    # round trip through a remote TPU tunnel, and the naive decode below
    # touches ~12 scalars/arrays (= ~0.35 s of pure latency per solve, which
    # dominated the corpus benchmark).  Fetch EVERYTHING in one round trip,
    # with the history buffers opportunistically truncated to 256 rows
    # (covers every corpus solve); only a longer history costs a second trip.
    _HIST_EAGER = 256
    (n1_, n2_, lf_last, conv, aux_res, aux_it, aux_strain,
     u, reactions, th, h1_eager, h2_eager) = jax.device_get(
        (n1, n2, lf_last, conv, aux_res, aux_it, aux_strain,
         u, reactions, th, h1[:_HIST_EAGER], h2[:_HIST_EAGER])
    )
    n1_, n2_ = int(n1_), int(n2_)
    if n1_ <= _HIST_EAGER and n2_ <= _HIST_EAGER:
        h1, h2 = h1_eager[:n1_], h2_eager[:n2_]
    else:
        h1, h2 = jax.device_get((h1[:n1_], h2[:n2_]))
    problem.material = set_theta(problem.material, th)

    # --- Rebuild the last increment's history exactly like the host path ---
    history = []
    if method == "nr":
        history = [{
            "load_factor": float(lf_last),
            "iterations": float(int(aux_it)),
            "residual": float(aux_res),
            "max_strain": float(aux_strain),
            "converged": 1.0 if bool(conv) else 0.0,
        }]
    elif method == "full-nr":
        # Row layout of phases.full_nr_phase; key set matches
        # full_newton.solve_full_nr (reference solver.py:985-994).
        hist_np = np.asarray(h2)
        for k in range(n2_):
            row = hist_np[k]
            history.append({
                "iteration": int(row[0]),
                "loss_total": float(row[1]),
                "loss_physics": float(row[2]),
                "loss_data": float(row[3]),
                "grad_norm_u": float(row[4]),
                "grad_norm_theta": float(row[5]),
            })
    elif method == "gn":
        # Row layout of phases.gn_phase; key set matches
        # gauss_newton.solve_gauss_newton (reference nn_solver.py:379-386).
        hist_np = np.asarray(h2)
        for k in range(n2_):
            row = hist_np[k]
            history.append({
                "iteration": float(row[0]),
                "r_physics": float(row[1]),
                "r_data": float(row[2]),
                "r_total": float(row[3]),
                "relative_error": float(row[4]),
                "step_size": float(row[5]),
            })
    else:
        hist1 = _hist_rows_to_dicts(np.asarray(h1), n1_, has_nn, bool(has_meas))
        hist2 = _hist_rows_to_dicts(np.asarray(h2), n2_, has_nn, bool(has_meas))
        history = list(hist1)
        for e in hist2:
            e = dict(e)
            e["iteration"] = e["iteration"] + float(n1_)
            history.append(e)
        if method == "hybrid" and not has_nn and int(aux_it) > 0:
            nr_entry = {
                "load_factor": float(lf_last),
                "iterations": float(int(aux_it)),
                "residual": float(aux_res),
                "max_strain": float(aux_strain),
                "converged": 1.0 if bool(conv) else 0.0,
            }
            # The unified "iteration" stamp only exists when a GD phase ran
            # before NR (reference solver.py:678-686).
            if config.preconditioning:
                nr_entry["iteration"] = float(n1_) + float(int(aux_it))
            history.append(nr_entry)

    u_np = np.asarray(u, dtype=float)
    if method == "nr" and not np.all(np.isfinite(u_np)):
        raise RuntimeError("Tangent stiffness became singular during solve")

    if verbose:
        # Observability parity: the reference prints a progress table during
        # GD (solver.py:325-333); here the loop ran on device, so the same
        # lines are emitted post-hoc from the last increment's history.
        from ..utils.progress import ensure_console_logging, log_gd_progress

        ensure_console_logging()
        log_gd_progress(history, config.print_every)

    shape = (-1, 1) if problem.dimension == 1 else (problem.nnode, problem.dimension)
    return SolverResult(
        displacements=u_np.reshape(shape),
        reactions=np.asarray(reactions, dtype=float).reshape(shape),
        converged=bool(conv),
        history=history,
        nn_parameters=export_nn_parameters(get_theta(problem.material)) if has_nn else None,
    )
