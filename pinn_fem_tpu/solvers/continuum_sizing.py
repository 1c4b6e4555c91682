"""Thickness sizing for the continuum families (plane membranes,
plates, shells): minimum-weight per-element thickness under von
Mises stress and/or displacement limits, by augmented-Lagrangian
ADAM on each family's traced static twin.

Extends the design-side inverse across families: trusses size areas
(solvers/sizing.py), frames size inertias (models/frame.py
optimize_frame_inertia) — membranes size the THICKNESS field, the
quantity a plate-girder web or shear-wall designer actually picks.
The reference has no optimization of any kind (SURVEY §2).

Recipe = the family-wide measured one (CLAUDE.md):
  * Rockafellar multipliers at moderate mu, NOT a penalty ramp (the
    ramp spikes ADAM's second moment at the first boundary overshoot
    and the iterate crawls to a stop inside the feasible region);
  * log-parameterized design t_e >= min_thickness;
  * `_al_minimize` (models/frame.py) — fresh optimizer state and
    halved lr per outer round;
  * feasibility polish by UNIFORM scaling, which is exactly monotone
    here: scaling every thickness by s scales K by s, u by 1/s and
    sigma by 1/s (the loads are fixed nodal forces), so EVERY
    displacement and stress ratio falls 1/s together — the coupled-
    constraint lesson from solvers/sizing.py holds with equality;
  * keep the best evaluated iterate — never return a design worse
    than measured.

EXACT anchors (tests/test_continuum_sizing.py): the uniaxial strip
under a fixed end force F has sigma = F/(W t) per element, so a
stress limit binds at t* = F/(W sigma_allow) uniformly; the serial
displacement limit u = sum F l_e/(E W t_e) with equal segments has
the uniform Lagrange optimum t* = F L_tot/(E W u_lim); a tapered
cantilever ties scipy SLSQP on the same traced constraints.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def optimize_plane_thickness(problem, stress_limit: Optional[float]
                             = None,
                             displacement_limit: Optional[float]
                             = None,
                             probe_dofs=None,
                             min_thickness: float = 1e-6,
                             n_iter: int = 300, outer_rounds: int = 4,
                             penalty: float = 10.0,
                             learning_rate: float = 0.05):
    """Minimum-weight thickness field t_e (module docstring).

    Weight = sum t_e A_e (A_e the element plan areas).  Constraints:
    von Mises(centroid) <= stress_limit on every element and/or
    |u| <= displacement_limit on probe_dofs.  Returns
    (thickness (m,), weight, history).
    """
    import jax
    import jax.numpy as jnp

    from ..models.frame import _al_minimize
    from ..models.plane import plane_static_response, solve_plane_static
    from ..ops.plane_plastic import gp_geometry

    if stress_limit is None and displacement_limit is None:
        raise ValueError("thickness sizing needs stress_limit and/or "
                         "displacement_limit")
    if stress_limit is not None and stress_limit <= 0.0:
        raise ValueError("stress_limit must be positive")
    if displacement_limit is not None:
        if displacement_limit <= 0.0:
            raise ValueError("displacement_limit must be positive")
        if probe_dofs is None:
            raise ValueError("a displacement limit needs probe_dofs")
        probe_np = np.asarray(probe_dofs, dtype=int).reshape(-1)
        if probe_np.size == 0 or probe_np.min() < 0 \
                or probe_np.max() >= problem.ndof:
            raise ValueError("probe_dofs out of range")
        probe = jnp.asarray(probe_np)

    # Plan areas from the quadrature weights (CST: the area itself;
    # Q4: sum of the 2x2 |J| with unit weights).
    areas_np = np.asarray(gp_geometry(problem)[1]).sum(axis=1)
    areas = jnp.asarray(areas_np)

    t_start = np.maximum(np.asarray(problem.thickness),
                         min_thickness * (1.0 + 1e-9))
    t0 = jnp.log(jnp.asarray(t_start) - min_thickness)
    w0 = float(np.sum(t_start * areas_np))

    n_con = (problem.nelm if stress_limit is not None else 0) \
        + (int(probe_np.size) if displacement_limit is not None else 0)

    def obj_g(logt):
        t_e = min_thickness + jnp.exp(logt)
        u, _, vm = plane_static_response(problem, thickness_e=t_e)
        gs = []
        if stress_limit is not None:
            gs.append(vm / stress_limit - 1.0)
        if displacement_limit is not None:
            gs.append(jnp.abs(u[probe]) / displacement_limit - 1.0)
        return jnp.sum(t_e * areas) / w0, jnp.concatenate(gs)

    logt, hist = _al_minimize(obj_g, t0, n_con, n_iter, outer_rounds,
                              penalty, learning_rate)
    t_e = np.asarray(jax.device_get(
        min_thickness + jnp.exp(logt)), dtype=float)

    from ..models.plane import PlaneProblem

    def ratios_of(t_arr):
        p2 = PlaneProblem(
            nodes=problem.nodes, elements=problem.elements,
            young=problem.young, poisson=problem.poisson,
            thickness=t_arr, density=problem.density,
            loads=problem.loads, fixed_dofs=problem.fixed_dofs,
            plane_strain=problem.plane_strain)
        st = solve_plane_static(p2)
        r = 0.0
        if stress_limit is not None:
            r = max(r, float(np.max(st.von_mises)) / stress_limit)
        if displacement_limit is not None:
            r = max(r, float(np.max(np.abs(
                st.displacements[probe_np]))) / displacement_limit)
        return r

    # Uniform-scale feasibility polish (exactly monotone: every ratio
    # scales 1/s together — module docstring), keeping the best
    # evaluated iterate.
    best_t, best_w = None, np.inf
    for _ in range(20):
        ratio = ratios_of(t_e)
        if ratio <= 1.0 + 1e-9:
            w = float(np.sum(t_e * areas_np))
            if w < best_w:
                best_t, best_w = t_e.copy(), w
            break
        t_e = t_e * ratio
    else:
        raise ValueError(
            f"limits unreachable by thickness scaling (residual ratio "
            f"{ratio:.3f}) — this cannot happen for fixed nodal loads "
            "(sigma and u scale exactly 1/s); check for zero loads")
    # One tightening pass: if strictly feasible, shrink uniformly onto
    # the boundary (the scale family contains the optimum's ray).
    ratio = ratios_of(best_t)
    if ratio < 1.0 - 1e-9 and ratio > 0.0:
        cand = np.maximum(best_t * ratio, min_thickness)
        if ratios_of(cand) <= 1.0 + 1e-9:
            w = float(np.sum(cand * areas_np))
            if w < best_w:
                best_t, best_w = cand, w
    return best_t, best_w, np.asarray(hist)


def optimize_plate_thickness(problem, displacement_limit: float,
                             probe_dofs=None, probe_nodes=None,
                             min_thickness: float = 1e-6,
                             n_iter: int = 300, outer_rounds: int = 4,
                             penalty: float = 10.0,
                             learning_rate: float = 0.05):
    """Minimum-weight plate thickness field under a deflection limit —
    the slab-depth question, with the t³ bending physics the plane
    family doesn't have.

    Weight = sum t_e A_e; constraint |u| <= displacement_limit on the
    probe DOFs (probe_nodes expands to the w DOF per node).  The
    feasibility polish scales t uniformly: unlike the membrane's exact
    1/s, plate deflections mix the t³ bending and t shear stiffnesses,
    so the polish iterates the bending-dominated estimate s = r^(1/3)
    and re-measures — monotone (stiffer everywhere) and typically
    2-3 passes.  EXACT-ish anchor (tests): a single design variable is
    t* = t_det (w_det/w_lim)^(1/3) up to the O((t/L)²) shear fraction.

    Returns (thickness (m,), weight, history)."""
    import jax
    import jax.numpy as jnp

    from ..models.frame import _al_minimize
    from ..models.plate import (PlateProblem, plate_static_response,
                                solve_plate_static)

    if displacement_limit <= 0.0:
        raise ValueError("displacement_limit must be positive")
    if probe_dofs is None and probe_nodes is not None:
        pn = np.asarray(probe_nodes, dtype=int).reshape(-1)
        probe_dofs = 3 * pn
    if probe_dofs is None:
        raise ValueError("plate sizing needs probe_dofs or "
                         "probe_nodes")
    probe_np = np.asarray(probe_dofs, dtype=int).reshape(-1)
    if probe_np.size == 0 or probe_np.min() < 0 \
            or probe_np.max() >= problem.ndof:
        raise ValueError("probe_dofs out of range")
    probe = jnp.asarray(probe_np)

    from ..models.plate import _shape_grads

    # Plan areas: 2x2 Gauss |J| sums (unit weights).
    from ..models.plane import _GP

    coords = problem.coords()
    areas_np = np.zeros(problem.nelm)
    for xi, eta in _GP:
        areas_np += np.asarray(_shape_grads(coords, xi, eta)[3])
    areas = jnp.asarray(areas_np)

    t_start = np.maximum(np.asarray(problem.thickness),
                         min_thickness * (1.0 + 1e-9))
    t0 = jnp.log(jnp.asarray(t_start) - min_thickness)
    w0 = float(np.sum(t_start * areas_np))

    def obj_g(logt):
        t_e = min_thickness + jnp.exp(logt)
        u, _, _ = plate_static_response(problem, thickness_e=t_e)
        g = jnp.abs(u[probe]) / displacement_limit - 1.0
        return jnp.sum(t_e * areas) / w0, g

    logt, hist = _al_minimize(obj_g, t0, int(probe_np.size), n_iter,
                              outer_rounds, penalty, learning_rate)
    t_e = np.asarray(jax.device_get(
        min_thickness + jnp.exp(logt)), dtype=float)

    def ratio_of(t_arr):
        p2 = PlateProblem(
            nodes=problem.nodes, elements=problem.elements,
            young=problem.young, poisson=problem.poisson,
            thickness=t_arr, density=problem.density,
            loads=problem.loads, fixed_dofs=problem.fixed_dofs,
            pressure=problem.pressure,
            point_masses=problem.point_masses)
        st = solve_plate_static(p2)
        return float(np.max(np.abs(
            st.displacements[probe_np]))) / displacement_limit

    best_t, best_w = None, np.inf
    for _ in range(30):
        ratio = ratio_of(t_e)
        if ratio <= 1.0 + 1e-9:
            w = float(np.sum(t_e * areas_np))
            if w < best_w:
                best_t, best_w = t_e.copy(), w
            # tighten onto the boundary along the same ray
            if ratio < 1.0 - 1e-6:
                t_e = np.maximum(t_e * ratio ** (1.0 / 3.0),
                                 min_thickness)
                continue
            break
        t_e = t_e * ratio ** (1.0 / 3.0)
    else:
        if best_t is None:
            raise ValueError(
                f"displacement_limit {displacement_limit} unreachable "
                f"(residual ratio {ratio:.3f}) after 30 thickness-"
                "scaling passes — check for zero transverse loads")
    return best_t, best_w, np.asarray(hist)


def optimize_shell_thickness(problem, stress_limit: Optional[float]
                             = None,
                             displacement_limit: Optional[float]
                             = None,
                             probe_dofs=None,
                             min_thickness: float = 1e-6,
                             n_iter: int = 300, outer_rounds: int = 4,
                             penalty: float = 10.0,
                             learning_rate: float = 0.05):
    """Minimum-weight facet thickness field on a shell midsurface —
    the vessel/roof plating question, carrying BOTH thickness
    physics at once: membrane stiffness ~ t, bending ~ t³, and the
    governing demand is the extreme-fiber vM of N/t ± 6M/t²
    (models/shell.shell_static_response).

    Weight = sum t_e A_e (A_e the facet areas).  Constraints:
    extreme-fiber vM <= stress_limit per facet and/or
    |u| <= displacement_limit on probe_dofs.

    Feasibility polish: uniform scaling is NOT exactly monotone here
    (scaling t redistributes load between membrane and bending —
    their stiffness ratio shifts by s²), so the polish iterates the
    CUBE-ROOT scale s = r^(1/3) and re-measures: it never overshoots
    (a shrink by f raises deflections at most 1/f³ and stresses at
    most 1/f², so the post-shrink ratio is at most r^(1/3)·.. < 1)
    and under-corrects membrane-dominated violations geometrically
    (ratio falls at least r^(2/3) per pass).  Keep the best evaluated
    iterate — the sizing-family doctrine.

    Returns (thickness (m,), weight, history)."""
    import jax
    import jax.numpy as jnp

    from ..models.frame import _al_minimize
    from ..models.shell import (ShellProblem, _facet_area,
                                _facet_frames, shell_static_response)

    if stress_limit is None and displacement_limit is None:
        raise ValueError("thickness sizing needs stress_limit and/or "
                         "displacement_limit")
    if stress_limit is not None and stress_limit <= 0.0:
        raise ValueError("stress_limit must be positive")
    probe_np = None
    if displacement_limit is not None:
        if displacement_limit <= 0.0:
            raise ValueError("displacement_limit must be positive")
        if probe_dofs is None:
            raise ValueError("a displacement limit needs probe_dofs")
        probe_np = np.asarray(probe_dofs, dtype=int).reshape(-1)
        if probe_np.size == 0 or probe_np.min() < 0 \
                or probe_np.max() >= problem.ndof:
            raise ValueError("probe_dofs out of range")
        probe = jnp.asarray(probe_np)

    areas_np = _facet_area(_facet_frames(problem)[1])
    areas = jnp.asarray(areas_np)

    t_start = np.maximum(np.asarray(problem.thickness),
                         min_thickness * (1.0 + 1e-9))
    t0 = jnp.log(jnp.asarray(t_start) - min_thickness)
    w0 = float(np.sum(t_start * areas_np))

    n_con = (problem.nelm if stress_limit is not None else 0) \
        + (int(probe_np.size) if probe_np is not None else 0)

    def obj_g(logt):
        t_e = min_thickness + jnp.exp(logt)
        u, _, vm = shell_static_response(problem, thickness_e=t_e)
        gs = []
        if stress_limit is not None:
            gs.append(vm / stress_limit - 1.0)
        if displacement_limit is not None:
            gs.append(jnp.abs(u[probe]) / displacement_limit - 1.0)
        return jnp.sum(t_e * areas) / w0, jnp.concatenate(gs)

    logt, hist = _al_minimize(obj_g, t0, n_con, n_iter, outer_rounds,
                              penalty, learning_rate)
    t_e = np.asarray(jax.device_get(
        min_thickness + jnp.exp(logt)), dtype=float)

    from ..models.shell import solve_shell_static

    def ratio_of(t_arr):
        p2 = ShellProblem(
            nodes=problem.nodes, elements=problem.elements,
            young=problem.young, poisson=problem.poisson,
            thickness=t_arr, density=problem.density,
            loads=problem.loads, fixed_dofs=problem.fixed_dofs,
            pressure=problem.pressure,
            body_force=problem.body_force,
            point_masses=problem.point_masses)
        st = solve_shell_static(p2)
        r = 0.0
        if stress_limit is not None:
            from ..models.shell import shell_fiber_vm

            vm = shell_fiber_vm(st.membrane_forces, st.moments, t_arr)
            r = max(r, float(np.max(vm)) / stress_limit)
        if displacement_limit is not None:
            r = max(r, float(np.max(np.abs(
                st.displacements[probe_np]))) / displacement_limit)
        return r

    best_t, best_w = None, np.inf
    ratio = np.inf
    for _ in range(40):
        ratio = ratio_of(t_e)
        if ratio <= 1.0 + 1e-9:
            w = float(np.sum(t_e * areas_np))
            if w < best_w:
                best_t, best_w = t_e.copy(), w
            if ratio < 1.0 - 1e-6:
                t_e = np.maximum(t_e * ratio ** (1.0 / 3.0),
                                 min_thickness)
                continue
            break
        t_e = t_e * ratio ** (1.0 / 3.0)
    else:
        if best_t is None:
            raise ValueError(
                f"limits unreachable (residual ratio {ratio:.3f}) "
                "after 40 thickness-scaling passes — check for zero "
                "loads")
    return best_t, best_w, np.asarray(hist)
