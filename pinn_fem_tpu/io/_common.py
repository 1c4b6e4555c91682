"""Shared helpers for the analysis-JSON runner family.

Hoisted from io/analysis.py when the sizing / reliability /
identification runners moved into sibling modules (the frame_io /
plane_io pattern): every io/*_io.py module imports the amplitude /
probe / omega parsers, the strict-JSON sanitizer and the LOCAL-CPU
execution context from here; io/analysis.py re-exports them so
existing `from .analysis import _json_finite`-style imports keep
working."""

from __future__ import annotations

from typing import Dict

import numpy as np

# Shapes above this DOF count are omitted from JSON output unless
# explicitly requested (payload size, not compute, is the constraint).
_SHAPES_JSON_DOF_LIMIT = 4096


def _amplitude_array(spec, n_steps: int, dt: float) -> np.ndarray:
    """Load-scale history a(t_i), i = 0..n_steps-1."""
    if spec is None or spec == "step":
        return np.ones(n_steps)
    if isinstance(spec, (list, tuple)):
        arr = np.asarray(spec, dtype=float)
        if arr.shape != (n_steps,):
            raise ValueError(
                f"amplitude list must have n_steps={n_steps} entries, "
                f"got {arr.shape}")
        return arr
    if isinstance(spec, dict):
        kind = spec.get("type", "step")
        t = dt * np.arange(n_steps)
        if kind == "step":
            return np.ones(n_steps)
        if kind == "sine":
            f = float(spec["frequency_hz"])
            phase = float(spec.get("phase", 0.0))
            return np.sin(2.0 * np.pi * f * t + phase)
        if kind == "pulse":
            t_end = float(spec["t_end"])
            return (t < t_end).astype(float)
        raise ValueError(f"unknown amplitude type: {kind!r}")
    raise ValueError(f"bad amplitude spec: {spec!r}")



def _probe_dofs(analysis: Dict, problem) -> np.ndarray:
    if "probe_dofs" in analysis:
        return np.asarray(analysis["probe_dofs"], dtype=int)
    if "probe_nodes" in analysis:
        nodes = np.asarray(analysis["probe_nodes"], dtype=int)
        d = problem.dimension
        return (d * nodes[:, None] + np.arange(d)[None, :]).reshape(-1)
    return np.arange(problem.ndof)



def _omega_array(spec) -> np.ndarray:
    if isinstance(spec, (list, tuple)):
        return np.asarray(spec, dtype=float)
    if isinstance(spec, dict):
        num = int(spec.get("num", 50))
        start, stop = float(spec["start"]), float(spec["stop"])
        if spec.get("spacing", "linear") == "log":
            return np.logspace(np.log10(start), np.log10(stop), num)
        return np.linspace(start, stop, num)
    raise ValueError(f"bad omegas spec: {spec!r}")



def _json_finite(obj):
    """Replace non-finite floats with None, recursively.  json.dump's
    default allow_nan=True would emit NaN/Infinity tokens that strict
    JSON.parse (the Node backend's pythonRunner, both browser UIs'
    resp.json()) rejects — one stray inf would make an otherwise
    successful response unreadable at every downstream tier."""
    if isinstance(obj, float):
        return obj if np.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: _json_finite(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_json_finite(v) for v in obj]
    return obj


def _local_cpu_ctx(analysis: Dict):
    """Context manager for the identification family's LOCAL-CPU tier
    (run_identification docstring): jit on the host CPU backend unless
    "on_device" opts back into the default accelerator.  Falls back to a
    null context when no cpu backend exists."""
    import contextlib

    import jax as _jax

    if analysis.get("on_device", False):
        return contextlib.nullcontext()
    try:
        return _jax.default_device(_jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()



def _prestress_state(problem, spec):
    """Resolve a `"prestress"` spec to a static displacement state u0.

    Contract (round-3 VERDICT #2 — every capability reachable from the
    JSON tier down):

        "prestress": true                      static solve at the
                                               problem's own loads
        "prestress": {"scale": s}              s * that state
        "prestress": {"loads": [..], "scale"}  static solve at the given
                                               load vector instead
        "prestress": {"fix_dofs": [..]}        EXTRA DOFs fixed during
                                               the static solve only —
                                               a taut string's
                                               transverse DOFs have no
                                               stiffness until the
                                               tension exists, so the
                                               pretension state must be
                                               solved with them held
                                               (cf. tests/
                                               test_buckling.py's
                                               p_static pattern)
        "prestress": {"u": [..]}               an explicit state

    The static solve runs on the HOST below DENSE_DOF_LIMIT (zero device
    programs) and through solve_nr's banded path above it.
    """
    if spec in (None, False):
        return None
    loads = None
    scale = 1.0
    fix_extra = None
    if isinstance(spec, dict):
        if "u" in spec:
            u = np.asarray(spec["u"], dtype=float).reshape(-1)
            if u.size != problem.ndof:
                raise ValueError(f"prestress.u must have {problem.ndof} "
                                 f"entries, got {u.size}")
            return float(spec.get("scale", 1.0)) * u
        if "loads" in spec:
            loads = np.asarray(spec["loads"], dtype=float).reshape(-1)
            if loads.size != problem.ndof:
                raise ValueError(f"prestress.loads must have "
                                 f"{problem.ndof} entries")
        if "fix_dofs" in spec:
            fix_extra = np.asarray(spec["fix_dofs"], dtype=int)
        scale = float(spec.get("scale", 1.0))
    elif spec is not True:
        raise ValueError(f"bad prestress spec: {spec!r}")

    from ..models.problem import TrussProblem
    from ..solvers.newton import DENSE_DOF_LIMIT

    p = problem
    if fix_extra is not None:
        fixed = np.union1d(problem.fixed_dofs, fix_extra)
        p = TrussProblem(problem.nodes, problem.elements,
                         problem.material, problem.loads, fixed,
                         problem.dimension)
    if problem.ndof <= DENSE_DOF_LIMIT:
        from ..ops.host import host_static_solve

        u = host_static_solve(p, loads=loads)
    else:
        from ..config import SolverConfig
        from ..solvers.newton import solve_nr

        if loads is not None:
            p = TrussProblem(p.nodes, p.elements, p.material, loads,
                             p.fixed_dofs, p.dimension)
        res = solve_nr(p, SolverConfig(max_iterations=30,
                                       tolerance=1e-10), 1.0)
        u = np.asarray(res.displacements).reshape(-1)
    return scale * u


def _sn_params(fat: Dict):
    """Basquin S-N parameters from a "fatigue" spec: {"sn": {"exponent":
    m, "coefficient": C}} with N S^m = C, S = stress amplitude."""
    sn = fat.get("sn")
    if not isinstance(sn, dict) or "exponent" not in sn \
            or "coefficient" not in sn:
        raise ValueError('fatigue spec needs "sn": {"exponent": m, '
                         '"coefficient": C} (Basquin N S^m = C)')
    m = float(sn["exponent"])
    c = float(sn["coefficient"])
    if m <= 0.0 or c <= 0.0:
        raise ValueError("S-N exponent and coefficient must be positive")
    return m, c



def _element_areas(problem, elm_sel):
    """Cross-section areas of the selected elements (stress = N/A)."""
    from ..ops.host import material_values_host

    return material_values_host(problem, 1.0)[1][elm_sel]


