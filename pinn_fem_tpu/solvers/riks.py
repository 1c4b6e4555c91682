"""Arc-length (Riks/Crisfield) continuation for geometrically nonlinear
trusses: traces equilibrium paths THROUGH limit points.

Load-controlled Newton (solve_nr(geometric_nonlinear=True)) fails at a
limit point — the tangent goes singular and the physical response snaps.
Arc-length control makes the load factor lambda an UNKNOWN and constrains
the step size instead (cylindrical constraint |Delta u|^2 = dl^2), so the
solver walks over the fold: the von Mises two-bar truss snap-through —
THE canonical test, with the exact Green-Lagrange limit load

    lambda_crit P = 2 E A g(w-) / L0^3,   g(w) = h^2 w - 3/2 h w^2 + w^3/2,
    w- = h (1 - 1/sqrt(3))

— is traced through both folds to the inverted stress-free state at
w = 2h (tests/test_riks.py asserts the closed form and path shape).

Crisfield's quadratic corrector: each Newton iteration solves
K_t du_r = r and K_t du_t = f_ext, then picks the root of
|Delta u + du_r + dlam du_t|^2 = dl^2 whose direction best continues the
current increment (anti-doubling-back).  Step size adapts as
dl <- dl * sqrt(desired_iters / iters).  No counterpart exists in the
reference (its Green-Lagrange kernel is dead code, SURVEY §2.1)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import TrussProblem
from ..ops.assembly import assemble_system_nonlinear
from ..ops.linalg import masked_solve


class RiksResult(NamedTuple):
    load_factors: np.ndarray    # (n_steps,) lambda along the path
    displacements: np.ndarray   # (n_steps, ndof)
    iterations: np.ndarray      # (n_steps,) corrector iterations
    converged: bool             # every step converged
    residuals: np.ndarray       # (n_steps,) final |r| per step


@partial(jax.jit, static_argnames=())
def _tangent_solves(data, material, u, f_ext, mask):
    """One assembly + the tangent solve the predictor needs.

    LU, not Cholesky: PAST a limit point the tangent is INDEFINITE —
    that region is the whole reason this solver exists."""
    k, f_int, _ = assemble_system_nonlinear(data, material, u)
    du_t = masked_solve(k, f_ext, mask, assume_spd=False)
    return k, f_int, du_t


@partial(jax.jit, static_argnames=())
def _corrector_solve(data, material, u, lam, f_ext, mask):
    k, f_int, _ = assemble_system_nonlinear(data, material, u)
    r = (lam * f_ext - f_int) * mask
    du_r = masked_solve(k, r, mask, assume_spd=False)
    du_t = masked_solve(k, f_ext, mask, assume_spd=False)
    rnorm = jnp.linalg.norm(r)
    return du_r, du_t, rnorm


def solve_riks(
    problem: TrussProblem,
    n_steps: int = 100,
    initial_dlambda: float = 0.05,
    max_arc_iter: int = 20,
    tol: float = 1e-8,
    desired_iters: int = 4,
    max_dl_growth: float = 4.0,
    stop_fn=None,
    data=None,
    host=None,
) -> RiksResult:
    """Trace the nonlinear equilibrium path lambda(u) by arc length.

    Args:
        n_steps: number of arc-length increments to take.
        initial_dlambda: sets the first arc length (dl = |dlam| * |du_t|);
            pick it WELL below the expected limit-load factor or the first
            predictor overshoots the whole fold region.
        desired_iters: corrector-iteration target for step adaptation.
        stop_fn: optional (u_np, lam) -> bool host callback; returning
            True ends the continuation (e.g. "past snap-through").
        host: run the tangent assembly+LU on the HOST (numpy float64,
            zero device programs) — the small-problem serving default
            below DENSE_DOF_LIMIT (round-3 VERDICT #1: the jitted
            corrector was the last analysis route paying a minutes-long
            remote TPU compile).  The path-control algebra was already
            host-side; only the two solves move.
    """
    from .newton import DENSE_DOF_LIMIT

    if host is None:
        host = problem.ndof <= DENSE_DOF_LIMIT and data is None

    if host:
        import scipy.linalg

        from ..ops import host as H

        mask_h = H.host_masks(problem)
        f_ext_h = np.asarray(problem.loads, dtype=float) * mask_h
        km_fix = np.diag(1.0 - mask_h)

        def _lu_masked(k):
            """ONE LU of the masked tangent, reused for every RHS in the
            same iteration (the corrector needs du_r AND du_t from the
            SAME tangent — two np.linalg.solve calls paid two O(n^3)
            factorizations for nothing).  LU, not Cholesky: the tangent
            is INDEFINITE past a limit point."""
            km = mask_h[:, None] * k * mask_h[None, :] + km_fix
            return scipy.linalg.lu_factor(km)

        def tangent_fn(u_np):
            k, _ = H.host_nonlinear_system(problem, u_np)
            lu = _lu_masked(k)
            return scipy.linalg.lu_solve(lu, f_ext_h) * mask_h

        def corrector_fn(u_np, lam_v):
            k, f_int = H.host_nonlinear_system(problem, u_np)
            r = (lam_v * f_ext_h - f_int) * mask_h
            lu = _lu_masked(k)
            du_r = scipy.linalg.lu_solve(lu, r) * mask_h
            du_t = scipy.linalg.lu_solve(lu, f_ext_h) * mask_h
            return du_r, du_t, float(np.linalg.norm(r))

        fnorm = float(np.linalg.norm(f_ext_h))
    else:
        data = data if data is not None else problem.to_device()
        dtype = data.loads.dtype
        mask = data.free_mask
        f_ext = data.loads * mask
        material = problem.material

        def tangent_fn(u_np):
            _, _, du_t_j = _tangent_solves(
                data, material, jnp.asarray(u_np, dtype), f_ext, mask)
            return np.asarray(jax.device_get(du_t_j))

        def corrector_fn(u_np, lam_v):
            du_r, du_t, rn = (np.asarray(v) for v in jax.device_get(
                _corrector_solve(data, material, jnp.asarray(u_np, dtype),
                                 jnp.asarray(lam_v, dtype), f_ext, mask)))
            return du_r, du_t, float(rn)

        fnorm = float(jnp.linalg.norm(f_ext))
    if fnorm == 0:
        raise ValueError("riks continuation needs a nonzero load pattern")

    u = np.zeros(problem.ndof)
    lam = 0.0
    # First tangent fixes the initial arc length and direction.
    du_t0 = tangent_fn(u)
    dl = float(initial_dlambda) * float(np.linalg.norm(du_t0))
    # Global bounds keep the path RESOLVED: unbounded growth doubles dl
    # every easy step and a single adapted step can then leap across an
    # entire fold region (observed on the von Mises truss).
    dl_max = dl * max_dl_growth
    dl_min = dl * 1e-4
    prev_du = None
    # Path state stays host-side on BOTH tiers: each device solve is ONE
    # round trip (the whole (du_r, du_t, rn) triple fetched together)
    # and the constraint algebra runs in numpy — separate
    # float(jnp.dot(...)) fetches cost ~30 ms EACH through the
    # attachment (CLAUDE.md), which at ~6 per corrector iteration
    # dominated the solver's wall-clock.

    lams, us, iters, rnorms = [], [], [], []
    all_ok = True
    for _ in range(n_steps):
        # Predictor: du = dlam * du_t with |du| = dl; sign continues the
        # previous increment (positive-loading start).
        du_t = tangent_fn(u)
        nt = float(np.linalg.norm(du_t))
        dlam = dl / max(nt, 1e-30)
        # Direction: continue the previous increment — sign(dlam) =
        # sign(du_prev . du_t) (PAST a fold, du_t flips relative to the
        # path tangent and this is what makes lambda correctly descend;
        # an extra sign(prev_dlam) factor here cancels that flip and the
        # path oscillates around the limit point forever).
        if prev_du is not None and float(prev_du @ du_t) < 0:
            dlam = -dlam
        d_u = dlam * du_t
        u_new = u + d_u
        lam_new = lam + dlam

        ok = False
        it = max_arc_iter
        rn = np.inf
        for k_it in range(max_arc_iter):
            du_r, du_t, rn = corrector_fn(u_new, lam_new)
            if rn <= tol * max(fnorm, 1e-30) * max(abs(lam_new), 1.0):
                ok = True
                it = k_it
                break
            # Cylindrical constraint |d_u + du_r + x du_t|^2 = dl^2.
            base = d_u + du_r
            a = float(du_t @ du_t)
            b = 2.0 * float(base @ du_t)
            c = float(base @ base) - dl * dl
            disc = b * b - 4.0 * a * c
            if disc < 0.0 or a == 0.0:
                break  # constraint unreachable: cut the step
            sq = np.sqrt(disc)
            roots = ((-b + sq) / (2 * a), (-b - sq) / (2 * a))
            # Anti-doubling-back: keep the increment best aligned with
            # the current one.
            best = max(roots, key=lambda x: float(
                d_u @ (base + x * du_t)))
            d_u = base + best * du_t
            lam_new = lam_new + best
            u_new = u + d_u
        if not ok:
            # Quarter the arc and retry the step.
            dl *= 0.25
            if dl < dl_min:
                all_ok = False
                break
            continue

        prev_du = d_u
        u, lam = u_new, lam_new
        lams.append(lam)
        us.append(u.copy())
        iters.append(it)
        rnorms.append(rn)
        if stop_fn is not None and stop_fn(u, lam):
            break
        # Adapt toward desired_iters corrector iterations, inside the
        # global [dl_min, dl_max] resolution envelope.
        dl = float(np.clip(
            dl * np.sqrt(desired_iters / max(it, 1)), dl_min, dl_max))

    return RiksResult(
        load_factors=np.asarray(lams),
        displacements=np.asarray(us) if us else np.zeros((0, problem.ndof)),
        iterations=np.asarray(iters, dtype=int),
        converged=all_ok and len(lams) > 0,
        residuals=np.asarray(rnorms),
    )
