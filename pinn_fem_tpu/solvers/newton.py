"""Classic Newton-Raphson solver, fully jit-compiled.

Capability parity with /root/reference/FEM/python/fem/solver.py:408-512
(solve_nr) and fem/core.py:10-79 (solve_incremental_newton): same update
rule, same relative-du convergence criterion ||du|| / max(||u||, min_denom),
same reaction computation K u - lf * loads with free DOFs zeroed, same
single-entry history {load_factor, iterations, residual, max_strain,
converged}.

TPU-native differences:
  * the NR iteration runs inside lax.while_loop on device — one compiled
    program per problem signature, reused for every increment and example;
  * boundary conditions via masked in-place elimination (ops/linalg.py), so
    BC patterns don't trigger recompilation;
  * float32 with one iterative-refinement sweep instead of NumPy float64.

Documented divergence: warm starts are honored when config.nr_warm_start
(the reference accepts u_initial but always restarts from zeros,
solver.py:443 — results are identical for converged increments).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig, SolverResult
from ..models.fields import Material
from ..models.problem import ProblemData, TrussProblem
from ..ops.assembly import assemble_system



@partial(jax.jit, static_argnames=("nonlinear",))
def _nr_core(data: ProblemData, material: Material, u0, load_factor, max_iter,
             tol, min_denom, nonlinear: bool = False):
    """One load increment of Newton-Raphson. Everything traced."""
    from .phases import nr_phase

    out = nr_phase(data, material, u0, load_factor, max_iter, tol, min_denom,
                   nonlinear=nonlinear)

    if nonlinear:
        from ..ops.assembly import assemble_system_nonlinear

        _, f_int, _ = assemble_system_nonlinear(data, material, out.u, load_factor)
        reactions = (f_int - load_factor * data.loads) * data.fixed_mask
    else:
        # Reactions: K u - lf * loads, free DOFs zeroed (solver.py:495-497).
        k_final, _, _ = assemble_system(data, material, out.u, load_factor)
        reactions = (k_final @ out.u - load_factor * data.loads) * data.fixed_mask
    return out.u, reactions, out.n_iters, out.residual, out.converged, out.max_strain


# DOF count above which the dense factorization gives way to matrix-free
# Jacobi-PCG (dense K is O(ndof^2) memory; PCG streams gather/scatter).
DENSE_DOF_LIMIT = 2048


def _dia_layout_of(problem: TrussProblem, data: ProblemData):
    """Banded layout cached on the problem (host build is O(nelm) but not
    free at millions of elements); None when the mesh has too many
    distinct diagonals for the memory budget.

    The diagonal budget is memory-aware: RCM-renumbered unstructured
    meshes are banded but irregular (~80-150 distinct offsets vs ~13 for
    a natural grid ordering), so allow up to 192 diagonals as long as the
    diagonal storage stays under ~1 GB."""
    cached = getattr(problem, "_dia_layout_cache", None)
    if cached is not None:
        return cached if cached != "unsupported" else None
    from ..ops.dia import dia_layout

    budget = int(min(192, max(64, (2**30) // max(4 * problem.ndof, 1))))
    try:
        layout = dia_layout(np.asarray(data.dof_map), problem.ndof,
                            max_diags=budget)
    except ValueError:
        problem._dia_layout_cache = "unsupported"
        return None
    problem._dia_layout_cache = layout
    return layout


_DIA_CORE_CACHE: dict = {}


def _nr_dia_core(layout, precond: str = "jacobi", components: int = 1):
    """Jitted NR increment over the banded operator, cached per
    (band structure, preconditioner).

    The cache key is the layout CONTENT (offsets, ndof, and a digest of
    the element->diagonal scatter map, which the closure captures as a
    constant), not object identity: re-tracing the multigrid program costs
    tens of host seconds, and identical meshes built twice must share one
    traced program."""
    slot_digest = getattr(layout, "_slot_digest", None)
    if slot_digest is None:
        # Memoized: hashing a 1M-element scatter map costs ~100 ms on this
        # box and _nr_dia_core runs once per load increment.
        import hashlib

        slot_digest = hashlib.sha1(
            np.ascontiguousarray(layout.entry_slot).view(np.uint8)
        ).hexdigest()
        object.__setattr__(layout, "_slot_digest", slot_digest)
    key = (tuple(int(o) for o in layout.offsets), layout.ndof,
           slot_digest, precond, components)
    core = _DIA_CORE_CACHE.get(key)
    if core is not None:
        return core

    from ..ops.cg import stiffness_coefficients
    from ..ops.dia import assemble_dia, dia_cg_solve, dia_matvec

    # The fused Pallas stencil matvec is bit-exact and ~9x faster on TPU
    # (diag-minor interleaved layout); other backends use XLA slicing.
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def core(data, material, u0, load_factor, max_iter, tol, min_denom,
             cg_tol, cg_max_iter):
        # Force-residual convergence (see _nr_core_cg).
        f_norm = jnp.maximum(
            jnp.linalg.norm(load_factor * data.loads * data.free_mask),
            min_denom,
        )

        def cond(carry):
            it, _, _, conv = carry
            return jnp.logical_and(it < max_iter, jnp.logical_not(conv))

        stall_tol = jnp.sqrt(tol)

        def body(carry):
            it, u, res_prev, _ = carry
            s = stiffness_coefficients(data, material, load_factor)
            diags = assemble_dia(layout, s, data.gvec)
            f_int = dia_matvec(layout, diags, u)
            rhs = load_factor * data.loads - f_int
            du, _, _ = dia_cg_solve(layout, diags, rhs, data.free_mask,
                                    tol=cg_tol, max_iter=cg_max_iter,
                                    use_pallas=use_pallas,
                                    precond=precond, components=components)
            u_new = u + du
            r = (load_factor * data.loads
                 - dia_matvec(layout, diags, u_new)) * data.free_mask
            res = jnp.linalg.norm(r) / f_norm
            # Monotone acceptance: reject steps that do not reduce the true
            # force residual (iterating on float32 noise diverges), and
            # stop at the achievable floor (see _nr_core_cg docstring).
            take = res < res_prev
            u_keep = jnp.where(take, u_new, u)
            res_keep = jnp.where(take, res, res_prev)
            # stop on tolerance or on a rejected step (no further progress
            # is possible); convergence is judged after the loop.
            stop = jnp.logical_or(res_keep <= tol, jnp.logical_not(take))
            return (it + 1, u_keep, res_keep, stop)

        init = (jnp.zeros((), jnp.int32), u0, jnp.asarray(jnp.inf, u0.dtype),
                jnp.zeros((), bool))
        it, u, res, _ = jax.lax.while_loop(cond, body, init)
        # Converged iff the achieved force residual is inside the acceptance
        # band [tol, sqrt(tol)] (float32 floor; see _nr_core_cg docstring).
        conv = res <= stall_tol

        s = stiffness_coefficients(data, material, load_factor)
        diags = assemble_dia(layout, s, data.gvec)
        reactions = (dia_matvec(layout, diags, u)
                     - load_factor * data.loads) * data.fixed_mask
        u_e = u[data.dof_map]
        strain = jnp.sum(data.gvec * u_e, axis=-1) * data.inv_len
        return u, reactions, it, res, conv, jnp.max(jnp.abs(strain))

    _DIA_CORE_CACHE[key] = core
    return core


@jax.jit
def _nr_core_cg(data: ProblemData, material: Material, u0, load_factor,
                max_iter, tol, min_denom, cg_tol, cg_max_iter):
    """Large-mesh NR increment: matrix-free PCG inner solves, K never formed.

    Convergence is on the TRUE force residual |R_free| / |lf F_free| — the
    dense path's ||du||/||u|| criterion is unattainable with iterative
    inner solves, whose solution error is cond(K) * cg_tol and dominates
    du after the first Newton step.  In float32 the measurable force
    residual itself has a floor of ~eps * |K u| / |F|, so a residual that
    stalls below sqrt(tol) is accepted as converged-at-the-float32-floor
    (the achieved value is reported in the history).
    """
    from ..ops.cg import apply_stiffness, cg_solve, stiffness_coefficients

    f_norm = jnp.maximum(
        jnp.linalg.norm(load_factor * data.loads * data.free_mask), min_denom
    )
    stall_tol = jnp.sqrt(tol)

    def cond(carry):
        it, _, _, conv = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(conv))

    def body(carry):
        it, u, res_prev, _ = carry
        s = stiffness_coefficients(data, material, load_factor)
        f_int = apply_stiffness(data, s, u)
        rhs = load_factor * data.loads - f_int
        du, _, _ = cg_solve(data, s, rhs, tol=cg_tol, max_iter=cg_max_iter)
        u_new = u + du
        r = (load_factor * data.loads
             - apply_stiffness(data, s, u_new)) * data.free_mask
        res = jnp.linalg.norm(r) / f_norm
        # Monotone acceptance + stop at the float32 floor (docstring above).
        take = res < res_prev
        u_keep = jnp.where(take, u_new, u)
        res_keep = jnp.where(take, res, res_prev)
        # stop on tolerance or on a rejected step (no further progress
        # is possible); convergence is judged after the loop.
        stop = jnp.logical_or(res_keep <= tol, jnp.logical_not(take))
        return (it + 1, u_keep, res_keep, stop)

    init = (jnp.zeros((), jnp.int32), u0, jnp.asarray(jnp.inf, u0.dtype),
            jnp.zeros((), bool))
    it, u, res, _ = jax.lax.while_loop(cond, body, init)
    conv = res <= stall_tol

    from ..ops.cg import apply_stiffness as _apply, stiffness_coefficients as _coef

    s = _coef(data, material, load_factor)
    reactions = (_apply(data, s, u) - load_factor * data.loads) * data.fixed_mask
    # Max strain from the final state (|g.u_e| / L).
    u_e = u[data.dof_map]
    strain = jnp.sum(data.gvec * u_e, axis=-1) * data.inv_len
    return u, reactions, it, res, conv, jnp.max(jnp.abs(strain))


def solve_nr(
    problem: TrussProblem,
    config: Optional[SolverConfig] = None,
    target_load_factor: float = 1.0,
    u_initial: Optional[np.ndarray] = None,
    data: Optional[ProblemData] = None,
    linear_solver: str = "auto",
    geometric_nonlinear: bool = False,
    cg_precond: str = "auto",
    prescribed_u: Optional[np.ndarray] = None,
) -> SolverResult:
    """Single-increment NR solve (driven by solvers.driver.solve).

    linear_solver: "dense" (Cholesky on the assembled K), "cg" (matrix-free
    Jacobi-PCG; K is never formed), "cg-dia" (banded operator), or "auto"
    (cg above DENSE_DOF_LIMIT, dia when banded).

    cg_precond: preconditioner for the banded PCG — "jacobi" (default /
    "auto") or "mg" (banded smoothed-aggregation multigrid, ops/mg.py).
    Measured guidance: on well-conditioned grids the V-cycle's op count
    makes mg a net LOSS on TPU despite 20-25x fewer iterations (0.6 s vs
    2.8 s at 40k DOFs) — TPU iterations there are op-overhead-bound, not
    bandwidth-bound; on ill-conditioned slender meshes, where Jacobi-PCG
    needs O(n) iterations (cond ~ n^2), mg keeps counts flat
    (47 vs 20,000 on a 20k-DOF chain) and wins outright at scale.

    geometric_nonlinear: opt-in Green-Lagrange kinematics (2D, dense path).
    """
    if geometric_nonlinear and linear_solver not in ("auto", "dense"):
        raise ValueError("geometric_nonlinear requires the dense linear solver")
    config = config or SolverConfig()
    if problem.material.has_trainable_params:
        raise ValueError(
            "Newton-Raphson solver with NN materials not fully supported yet. "
            "Use solve_gd() for problems with NN parameters."
        )

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    if u_initial is not None and config.nr_warm_start:
        u0 = jnp.asarray(np.asarray(u_initial).reshape(-1), dtype=dtype)
    else:
        u0 = jnp.zeros(problem.ndof, dtype=dtype)
    if prescribed_u is not None:
        # Inhomogeneous Dirichlet (support settlement): fixed-DOF entries
        # seeded here PERSIST — every NR update is masked to the free
        # DOFs — so f_int(u) carries the prescribed motion and the free
        # block converges to K_ff u_f = f_f - K_fs u_p exactly.
        up = jnp.asarray(np.asarray(prescribed_u).reshape(-1), dtype)
        u0 = u0 * data.free_mask + up * (1.0 - data.free_mask)

    if geometric_nonlinear:
        linear_solver = "dense"
    elif linear_solver == "auto":
        linear_solver = "cg" if problem.ndof > DENSE_DOF_LIMIT else "dense"

    if linear_solver == "cg":
        # Prefer the banded (DIA) operator when the DOF ordering is banded:
        # slice-based K@u is ~90x faster than gather-based on TPU.
        layout = _dia_layout_of(problem, data)
        if layout is not None:
            linear_solver = "cg-dia"

    if linear_solver == "cg-dia":
        layout = _dia_layout_of(problem, data)
        if layout is None:
            raise ValueError("mesh bandwidth too wide for the DIA operator")
        if cg_precond == "auto":
            cg_precond = "jacobi"  # see docstring for the measured tradeoff
        cg_tol = max(config.tolerance * 0.1, 5e-8)
        u, reactions, it, res, conv, max_strain = _nr_dia_core(
            layout, precond=cg_precond, components=problem.dimension,
        )(
            data,
            problem.material,
            u0,
            jnp.asarray(target_load_factor, dtype),
            jnp.asarray(config.max_iterations, jnp.int32),
            jnp.asarray(config.tolerance, dtype),
            jnp.asarray(config.min_denominator, dtype),
            jnp.asarray(cg_tol, dtype),
            jnp.asarray(min(max(20 * problem.ndof, 1000), 100_000), jnp.int32),
        )
    elif linear_solver == "cg":
        cg_tol = max(config.tolerance * 0.1, 5e-8)
        u, reactions, it, res, conv, max_strain = _nr_core_cg(
            data,
            problem.material,
            u0,
            jnp.asarray(target_load_factor, dtype),
            jnp.asarray(config.max_iterations, jnp.int32),
            jnp.asarray(config.tolerance, dtype),
            jnp.asarray(config.min_denominator, dtype),
            jnp.asarray(cg_tol, dtype),
            jnp.asarray(max(20 * problem.ndof, 1000), jnp.int32),
        )
    else:
        u, reactions, it, res, conv, max_strain = _nr_core(
            data,
            problem.material,
            u0,
            jnp.asarray(target_load_factor, dtype),
            jnp.asarray(config.max_iterations, jnp.int32),
            jnp.asarray(config.tolerance, dtype),
            jnp.asarray(config.min_denominator, dtype),
            nonlinear=geometric_nonlinear,
        )
    # ONE device->host fetch for the whole result: every separate
    # np.asarray/float() on a device value is a ~30 ms tunnel round trip
    # (6 of them cost more than the 40k-DOF CG solve itself).
    u, reactions, it, res, conv, max_strain = jax.device_get(
        (u, reactions, it, res, conv, max_strain)
    )
    u_np = np.asarray(u, dtype=float)
    if not np.all(np.isfinite(u_np)):
        raise RuntimeError("Tangent stiffness became singular during solve")

    history = [
        {
            "load_factor": float(target_load_factor),
            "iterations": float(int(it)),
            "residual": float(res),
            "max_strain": float(max_strain),
            "converged": 1.0 if bool(conv) else 0.0,
        }
    ]
    shape = (-1, 1) if problem.dimension == 1 else (problem.nnode, problem.dimension)
    return SolverResult(
        displacements=u_np.reshape(shape),
        reactions=np.asarray(reactions, dtype=float).reshape(shape),
        converged=bool(conv),
        history=history,
    )
