"""FORM reliability for the continuum families (plane / solid /
plate): one family-adapter core riding each family's traced
differentiable static twin, delegating to the shared `form_core`
driver (solvers/reliability.py — marginal transforms, Nataf copula,
vmapped HL-RF, unreachable-surface reset, Ditlevsen bounds, crude MC).

This closes the last probabilistic-family asymmetry: trusses
(solvers/reliability.py) and frames (models/frame.py:890
frame_reliability) carried FORM; the continuum families — where the
demand quantity is a VON MISES stress, not a member force — had none.
The reference (rpacheco-blazquez/PINN-FEM) has no probabilistic
analysis at all (SURVEY §2).

Variable kinds:
  * young       — per-element subsets ("elements": [..]) like the
                  truss/frame families;
  * thickness   — plane, plate and shell only (a solid has no
                  thickness field; rejected there).  Internally aliased onto
                  the truss parser's "area" slot (same shape: a
                  per-element field with an optional subset) — the
                  frame family's inertia-aliasing trick;
  * load_scale  — one global multiplier on the full load pattern
                  (body forces and pressures included: the traced
                  twins scale the consistent load vector);
  * resistance  — capacity side of a stress limit state.
  * density / area / inertia are rejected with the reason (density
    does not enter continuum statics; area/inertia are not continuum
    fields).

Limit states:
  {"type": "displacement", "limit": d, "probe_dofs": [..]}
      |u_dof| / d per probed DOF;
  {"type": "stress", "limit": R | "variable": name,
   "elements": [..]}
      von Mises / R per probed element — centroid vM for plane and
      solid, EXTREME-FIBER vM (6M/t², thickness-traced) for plates,
      and the GOVERNING extreme-fiber vM of N/t ± 6M/t² at both
      fibers for shells (curved midsurfaces carry membrane and
      bending simultaneously — the shell spectrum convention).

EXACT anchors (tests/test_continuum_reliability.py): determinate
uniaxial states make the demand independent of E, so the lognormal
R−S index β = ln(R_med/S_med)/√(ζ_R² + ζ_S²) is closed-form (plane
strip and solid column); the plate cantilever strip's tip deflection
w ∝ q L⁴/(E t³) is log-linear in (E, t, q), giving the textbook
multi-variable lognormal β with the t-sensitivity tripled by the
cube — the t³ physics lands directly in the FORM alpha vector.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

_FAMILIES = ("plane", "solid", "plate", "shell")


def continuum_reliability(problem, variables: Sequence[Dict],
                          limit_state: Dict, family: str,
                          n_iter: int = 50, tol: float = 1e-4,
                          mc_samples: int = 0, mc_seed: int = 0,
                          correlation: Optional[Sequence] = None,
                          mesh=None):
    """FORM on a plane / solid / plate problem (module docstring).

    mesh: optional jax.sharding.Mesh — dp-shards the crude-MC sample
    axis over devices (form_core's machinery; thousands of independent
    dense solves is the canonical SPMD workload).

    Returns the shared reliability result (betas, pf, alphas, design
    points, Ditlevsen system bounds, optional crude-MC check).
    """
    import jax.numpy as jnp

    from .reliability import (_nataf_cholesky, _physical, form_core)
    from .reliability import _parse_variables as _pv

    if family not in _FAMILIES:
        raise ValueError(f"family must be one of {_FAMILIES}")
    m = problem.nelm

    alias = []
    kinds = []
    for spec in variables or ():
        sp = dict(spec)
        kind = sp.get("kind")
        if kind == "density":
            raise ValueError('"density" does not enter continuum '
                             'statics — use young / thickness / '
                             'load_scale / resistance')
        if kind in ("area", "inertia"):
            raise ValueError(f'"{kind}" is not a continuum field — '
                             'use young / thickness / load_scale / '
                             'resistance')
        if kind == "thickness":
            if family == "solid":
                raise ValueError('a solid has no "thickness" field — '
                                 'use young / load_scale / resistance')
            sp["kind"] = "area"          # internal alias (same shape)
        kinds.append(kind)
        alias.append(sp)
    varspecs = _pv(alias, m)
    for v, orig_kind in zip(varspecs, kinds):
        v["kind"] = orig_kind
    chol = _nataf_cholesky(varspecs, correlation)
    dtype = jnp.asarray(1.0).dtype
    chol_d = None if chol is None else jnp.asarray(chol, dtype)
    masks = {i: jnp.asarray(v["mask"], dtype)
             for i, v in enumerate(varspecs) if v["mask"] is not None}
    var_names = [v["name"] for v in varspecs]

    ls = dict(limit_state or {})
    ls_type = ls.get("type", "displacement")
    res_var = None
    if ls_type == "displacement":
        if ls.get("limit") is None or ls.get("probe_dofs") is None:
            raise ValueError('continuum displacement limit state '
                             'needs "limit" and "probe_dofs"')
        limit = float(ls["limit"])
        probe = np.asarray(ls["probe_dofs"], dtype=int).reshape(-1)
        if probe.size and (probe.min() < 0
                           or probe.max() >= problem.ndof):
            raise ValueError("probe_dofs out of range")
        labels = [f"displacement dof{int(d)}" for d in probe]
    elif ls_type == "stress":
        if ls.get("variable") is not None:
            rn = ls["variable"]
            if rn not in var_names:
                raise ValueError(f"resistance variable {rn!r} is not "
                                 f"defined")
            res_var = var_names.index(rn)
            if varspecs[res_var]["kind"] != "resistance":
                raise ValueError(f'{rn!r} must have kind "resistance"')
            limit = None
        elif ls.get("limit") is not None:
            limit = float(ls["limit"])
        else:
            raise ValueError('continuum stress limit state needs '
                             '"limit" or "variable"')
        elems = ls.get("elements")
        probe = (np.arange(m) if elems is None
                 else np.asarray(elems, dtype=int).reshape(-1))
        if probe.size and (probe.min() < 0 or probe.max() >= m):
            raise ValueError("limit-state elements out of range")
        labels = [f"von Mises e{int(e)}" for e in probe]
    else:
        raise ValueError('continuum limit_state type must be '
                         '"displacement" or "stress"')
    probe_d = jnp.asarray(probe)

    def response(young, thickness, scale):
        if family == "plane":
            from ..models.plane import plane_static_response

            return plane_static_response(
                problem, young_e=young, thickness_e=thickness,
                load_scale=scale)
        if family == "plate":
            from ..models.plate import plate_static_response

            # (u, moments, extreme-fiber vM) — vM is 6M/t² with the
            # TRACED thickness, so t-sensitivities are exact.
            return plate_static_response(
                problem, young_e=young, thickness_e=thickness,
                load_scale=scale)
        if family == "shell":
            from ..models.shell import shell_static_response

            # (u, [N, M] resultants, governing extreme-fiber vM) —
            # membrane AND bending enter the demand; thickness traced
            # through both the 1/t and the t³-stiffness physics.
            return shell_static_response(
                problem, young_e=young, thickness_e=thickness,
                load_scale=scale)
        from ..models.solid import solid_static_response

        return solid_static_response(problem, young_e=young,
                                     load_scale=scale)

    def ratios_all(u):
        z = u if chol_d is None else chol_d @ u
        young = jnp.asarray(problem.young, dtype)
        thickness = (None if family == "solid"
                     else jnp.asarray(problem.thickness, dtype))
        scale = jnp.asarray(1.0, dtype)
        for i, v in enumerate(varspecs):
            x = _physical(v, z[i])
            if v["kind"] == "load_scale":
                scale = scale * x
            elif v["kind"] == "resistance":
                pass
            elif v["kind"] == "young":
                mk = masks[i]
                young = young * (1.0 - mk) + x * mk
            else:                       # thickness
                mk = masks[i]
                thickness = thickness * (1.0 - mk) + x * mk
        uu, _, vm = response(young, thickness, scale)
        if ls_type == "stress":
            demand = vm[probe_d]
            if res_var is not None:
                r = _physical(varspecs[res_var], z[res_var])
            else:
                r = jnp.asarray(limit, dtype)
            return demand / r
        return jnp.abs(uu)[probe_d] / limit

    return form_core(ratios_all, varspecs, chol, labels,
                     n_iter=n_iter, tol=tol, mc_samples=mc_samples,
                     mc_seed=mc_seed, mesh=mesh)
