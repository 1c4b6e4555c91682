"""Identification ("analysis": {"type": "identification"}) JSON
runners — the time-domain discrete adjoint, the modal-domain
(frequency + phi^2) fit, the FRF model-updating fit, and the spatial
MLP field modes of the first two.  Split out of io/analysis.py
(which keeps the dispatch facade and the full contract reference in
its module docstring); the per-block contracts live on each runner's
own docstring below.

Extends the reference beyond statics: its only inverse is the static
PINN property fit (/root/reference/FEM/python/examples/json/generic.py
measurement branch); these runners recover scalars, Rayleigh damping
and spatial fields from transient, modal and FRF data instead
(solvers/transient_inverse.py, solvers/modal_inverse.py,
solvers/frequency_inverse.py)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..solvers.dynamics import stable_dt
from ._common import (_SHAPES_JSON_DOF_LIMIT, _amplitude_array,
                      _local_cpu_ctx, _omega_array, _probe_dofs)


def _run_field_identification(problem, analysis: Dict, n_steps: int,
                              record_every: int, n_rec: int, damping,
                              synthetic_spec) -> Dict:
    """Field-mode identification: a spatially-varying material profile
    (an MLP field, the reference's NN-property parameterization) trained
    against the transient probe history instead of a static deflection
    (solvers/transient_inverse.identify_field_from_transient).

    Contract (extends the scalar identification block):

        "analysis": {"type": "identification",
                     "field": {"name": "young",        # | "area" | "density"
                               "hidden_layers": 1,
                               "neurons_per_layer": 8,
                               "input_dim": <problem dim>,  # spatial net
                               "scale": <mean of current field>,
                               "seed": 0},
                     "dt": 0.02 | "auto", "n_steps": 600,
                     "probe_nodes": [..] | "probe_dofs": [..],
                     "measured": [[..], ..]
                       | "synthetic": {"young": [..nelm true values..] | E,
                                       "noise": 0.01, "seed": 0},
                     ...}   # amplitude/damping/n_iter/learning_rate as
                            # in scalar mode

    In twin-data mode the truth is a PER-ELEMENT value array (a tabulated
    profile needs no Field object — transient_probe_response_elem feeds
    it to the element kernel directly); the response reports the
    recovered field at the nodes and element centroids in the
    identified_properties "at_nodes"/"at_elements" shape (io/results.py)
    plus per-element relative errors against the truth."""

    import jax as _jax

    from ..models.fields import make_mlp_field, point_inputs_dict_order
    from ..ops.host import _assembly_inputs, eval_field_host
    from ..solvers.transient_inverse import (
        _PARAM_ORDER, identify_field_from_transient,
        transient_probe_response, transient_probe_response_elem)

    spec = analysis["field"]
    if isinstance(spec, str):
        spec = {"name": spec}
    if not isinstance(spec, dict):
        raise ValueError('"field" must be an object (or a field name)')
    name = spec.get("name", "young")
    if name not in _PARAM_ORDER:
        raise ValueError(f'field.name must be among {list(_PARAM_ORDER)}, '
                         f'got {name!r}')
    unknown = set(spec) - {"name", "hidden_layers", "neurons_per_layer",
                           "input_dim", "scale", "seed"}
    if unknown:
        raise ValueError(f"unknown field keys: {sorted(unknown)}")

    nelm = len(problem.elements)
    x_mid = _assembly_inputs(problem, 1.0)
    cur = {p: np.asarray(eval_field_host(getattr(problem.material, p),
                                         x_mid), dtype=float)
           for p in _PARAM_ORDER}

    measured = analysis.get("measured")
    if (measured is None) == (synthetic_spec is None):
        raise ValueError('identification needs exactly one of "measured" '
                         'or "synthetic"')
    true_e = None
    if synthetic_spec is not None:
        unknown = set(synthetic_spec) - {name, "noise", "seed"}
        if unknown:
            raise ValueError(
                f'field-mode synthetic takes only "{name}", "noise" and '
                f'"seed"; got {sorted(unknown)}')
        if name not in synthetic_spec:
            raise ValueError(f'field-mode synthetic must provide the true '
                             f'"{name}" profile (per-element values or a '
                             f'constant)')
        tv = synthetic_spec[name]
        true_e = (np.full(nelm, float(tv)) if np.isscalar(tv)
                  else np.asarray(tv, dtype=float))
        if true_e.shape != (nelm,):
            raise ValueError(f"true {name} profile must have one value "
                             f"per element ({nelm}), got {true_e.shape}")
        if not (np.all(np.isfinite(true_e)) and np.all(true_e > 0)):
            raise ValueError(f"true {name} values must be positive finite")

    dt_spec = analysis["dt"]
    if dt_spec == "auto":
        if true_e is None:
            raise ValueError('dt="auto" needs "synthetic" twin data; a '
                             'measured history fixes its own dt')
        from ..models.fields import ScalarField as _SF
        from ..models.problem import TrussProblem as _TP

        # Gershgorin bound of the TRUE profile: omega_max grows with
        # stiffness (young/area) and shrinks with mass (density), so the
        # critical dt comes from the stiffest/lightest element.
        bound = (np.max if name in ("young", "area") else np.min)(true_e)
        true_problem = _TP(
            problem.nodes, problem.elements,
            problem.material.replace(**{name: _SF(value=float(bound))}),
            problem.loads, problem.fixed_dofs, problem.dimension)
        # Same safety=0.45 rationale as scalar mode: the optimizer
        # integrates every profile it visits, including overshoots.
        dt = stable_dt(true_problem, damping=damping, safety=0.45)
    else:
        dt = float(dt_spec)
    probe = _probe_dofs(analysis, problem)
    amplitude = _amplitude_array(analysis.get("amplitude"), n_steps, dt)

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        if true_e is not None:
            vals = dict(cur)
            vals[name] = true_e
            meas = np.asarray(_jax.device_get(transient_probe_response_elem(
                problem, vals["young"], vals["area"], vals["density"],
                dt, n_steps, amplitude, probe, record_every=record_every,
                damping=damping)))
            noise_rel = float(synthetic_spec.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(
                    int(synthetic_spec.get("seed", 0)))
                meas = meas + noise_rel * np.max(np.abs(meas)) \
                    * rng.standard_normal(meas.shape)
        else:
            meas = np.asarray(measured, dtype=float)
            if meas.ndim != 2 or meas.shape != (n_rec, probe.size):
                raise ValueError(
                    f"measured must be (n_steps/record_every={n_rec}, "
                    f"n_probe={probe.size}) rows, got {meas.shape}")

        nn = make_mlp_field(
            _jax.random.PRNGKey(int(spec.get("seed", 0))),
            hidden_layers=int(spec.get("hidden_layers", 1)),
            neurons_per_layer=int(spec.get("neurons_per_layer", 8)),
            input_dim=int(spec.get("input_dim", problem.dimension)),
            scale=float(spec.get("scale",
                                 max(float(np.mean(cur[name])), 1e-12))))
        trained, hist = identify_field_from_transient(
            problem, meas, dt, n_steps, probe, field=name, nn_field=nn,
            amplitude=amplitude, record_every=record_every,
            damping=damping, n_iter=int(analysis.get("n_iter", 600)),
            learning_rate=float(analysis.get("learning_rate", 0.05)))

        # Field evaluation uses the SAME column convention assembly
        # trained it under: dict-order (load_factor, x[, y]) rows at
        # lf=1, narrowed spatially-first by MLPField._adapt_inputs.
        dim = problem.dimension
        centroids = problem.element_midpoints()
        node_coords = problem.node_coords_2d
        vals_e = np.asarray(trained.eval_batch(
            point_inputs_dict_order(centroids, dim, 1.0)), dtype=float)
        vals_n = np.asarray(trained.eval_batch(
            point_inputs_dict_order(node_coords, dim, 1.0)), dtype=float)

        def _coords(c):
            c = np.asarray(c)
            return (c.reshape(-1).tolist() if dim == 1 else c.tolist())

        out = {
            "success": True,
            "analysis": "identification",
            "mode": "field",
            "field": name,
            "identified_field": {
                "at_nodes": {"coords": _coords(problem.nodes if dim == 1
                                               else node_coords),
                             "values": vals_n.tolist()},
                "at_elements": {"centroids": _coords(centroids),
                                "values": vals_e.tolist()},
                "type": "nn",
                "input_dim": nn.input_dim,
            },
            "dt": dt,
            "n_steps": n_steps,
            "record_every": record_every,
            "probe_dofs": probe.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_e is not None:
            rel = np.abs(vals_e - true_e) / np.abs(true_e)
            out["synthetic"] = True
            out["true_values"] = true_e.tolist()
            out["noise"] = noise_rel
            out["field_max_rel_error"] = float(np.max(rel))
            out["field_rmse_rel"] = float(np.sqrt(np.mean(rel * rel)))
        if analysis.get("include_fit",
                        probe.size * n_rec <= 4 * _SHAPES_JSON_DOF_LIMIT):
            fit_mat = problem.material.replace(**{name: trained})
            fit = np.asarray(_jax.device_get(transient_probe_response(
                problem, fit_mat, dt, n_steps, amplitude, probe,
                record_every=record_every, damping=damping)))
            scale = max(float(np.max(np.abs(meas))), 1e-30)
            out["fitted_displacements"] = fit.tolist()
            out["measured_displacements"] = meas.tolist()
            out["fit_rmse_rel"] = float(
                np.sqrt(np.mean((fit - meas) ** 2)) / scale)
    return out


def _run_modal_field_identification(problem, analysis: Dict) -> Dict:
    """Field mode of the modal-domain block
    (solvers/modal_inverse.identify_field_from_modal): a spatial MLP
    profile — canonically rho(x), which no static method sees at all —
    recovered from natural frequencies plus phi^2 sensor rows
    (examples/modal_identification.py's workflow, productized).

    Contract (the modal sibling of the transient field mode):

        "analysis": {"type": "identification", "domain": "modal",
                     "field": {"name": "density", "hidden_layers": 1,
                               "neurons_per_layer": 8,
                               "input_dim": <problem dim>,
                               "scale": <mean of current field>,
                               "seed": 0},
                     "sensor_nodes": [..] | "sensor_dofs": [..],  # REQUIRED
                     "measured_frequencies_hz": [..k..]
                       + "measured_shapes2": [[..], ..]  # (n_sensor, k)
                       | "synthetic": {"density":
                                           [..nelm true values..] | rho,
                                       "n_modes": 6, "noise": 0.0,
                                       "seed": 0},
                     "n_iter": 800, "learning_rate": 0.02}
    """

    import jax as _jax

    from ..models.fields import make_mlp_field, point_inputs_dict_order
    from ..ops.host import _assembly_inputs, eval_field_host
    from ..solvers.modal_inverse import (identify_field_from_modal,
                                         modal_observables,
                                         modal_observables_elem)
    from ..solvers.transient_inverse import _PARAM_ORDER

    spec = analysis["field"]
    if isinstance(spec, str):
        spec = {"name": spec}
    if not isinstance(spec, dict):
        raise ValueError('"field" must be an object (or a field name)')
    name = spec.get("name", "density")
    if name not in _PARAM_ORDER:
        raise ValueError(f'field.name must be among {list(_PARAM_ORDER)}, '
                         f'got {name!r}')
    unknown = set(spec) - {"name", "hidden_layers", "neurons_per_layer",
                           "input_dim", "scale", "seed"}
    if unknown:
        raise ValueError(f"unknown field keys: {sorted(unknown)}")

    sensors = None
    if "sensor_dofs" in analysis or "sensor_nodes" in analysis:
        sensors = _probe_dofs({"probe_dofs": analysis["sensor_dofs"]}
                              if "sensor_dofs" in analysis
                              else {"probe_nodes":
                                    analysis["sensor_nodes"]}, problem)
    if sensors is None:
        raise ValueError(
            "modal field identification needs sensor_nodes/sensor_dofs "
            "(frequencies alone underdetermine a spatial profile)")

    nelm = len(problem.elements)
    x_mid = _assembly_inputs(problem, 1.0)
    cur = {p: np.asarray(eval_field_host(getattr(problem.material, p),
                                         x_mid), dtype=float)
           for p in _PARAM_ORDER}

    measured = analysis.get("measured_frequencies_hz")
    synthetic = analysis.get("synthetic")
    if synthetic is not None and not isinstance(synthetic, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if (measured is None) == (synthetic is None):
        raise ValueError('modal identification needs exactly one of '
                         '"measured_frequencies_hz" or "synthetic"')

    true_e = None
    if synthetic is not None:
        unknown = set(synthetic) - {name, "n_modes", "noise", "seed"}
        if unknown:
            raise ValueError(
                f'field-mode synthetic takes only "{name}", "n_modes", '
                f'"noise" and "seed"; got {sorted(unknown)}')
        if name not in synthetic:
            raise ValueError(f'field-mode synthetic must provide the '
                             f'true "{name}" profile')
        tv = synthetic[name]
        true_e = (np.full(nelm, float(tv)) if np.isscalar(tv)
                  else np.asarray(tv, dtype=float))
        if true_e.shape != (nelm,):
            raise ValueError(f"true {name} profile must have one value "
                             f"per element ({nelm}), got {true_e.shape}")
        if not (np.all(np.isfinite(true_e)) and np.all(true_e > 0)):
            raise ValueError(f"true {name} values must be positive finite")

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        if true_e is not None:
            vals = dict(cur)
            vals[name] = true_e
            n_modes = int(synthetic.get("n_modes", 6))
            lam, s2 = modal_observables_elem(
                problem, vals["young"], vals["area"], vals["density"],
                n_modes, sensor_dofs=sensors)
            lam = np.asarray(_jax.device_get(lam))
            f_meas = np.sqrt(np.maximum(lam, 0.0)) / (2.0 * np.pi)
            shapes2 = np.asarray(_jax.device_get(s2))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                f_meas = f_meas * (1.0 + noise_rel
                                   * rng.standard_normal(f_meas.shape))
                shapes2 = np.abs(shapes2 * (
                    1.0 + noise_rel
                    * rng.standard_normal(shapes2.shape)))
        else:
            f_meas = np.asarray(measured, dtype=float).reshape(-1)
            shapes2 = analysis.get("measured_shapes2")
            if shapes2 is None:
                raise ValueError('modal field identification needs '
                                 '"measured_shapes2" alongside the '
                                 'measured frequencies')
            shapes2 = np.asarray(shapes2, dtype=float)

        nn = make_mlp_field(
            _jax.random.PRNGKey(int(spec.get("seed", 0))),
            hidden_layers=int(spec.get("hidden_layers", 1)),
            neurons_per_layer=int(spec.get("neurons_per_layer", 8)),
            input_dim=int(spec.get("input_dim", problem.dimension)),
            scale=float(spec.get("scale",
                                 max(float(np.mean(cur[name])), 1e-12))))
        trained, hist = identify_field_from_modal(
            problem, f_meas, sensor_dofs=sensors,
            measured_shapes2=shapes2, field=name, nn_field=nn,
            n_iter=int(analysis.get("n_iter", 800)),
            learning_rate=float(analysis.get("learning_rate", 0.02)))

        dim = problem.dimension
        centroids = problem.element_midpoints()
        node_coords = problem.node_coords_2d
        vals_e = np.asarray(trained.eval_batch(
            point_inputs_dict_order(centroids, dim, 1.0)), dtype=float)
        vals_n = np.asarray(trained.eval_batch(
            point_inputs_dict_order(node_coords, dim, 1.0)), dtype=float)

        def _coords(c):
            c = np.asarray(c)
            return (c.reshape(-1).tolist() if dim == 1 else c.tolist())

        out = {
            "success": True,
            "analysis": "identification",
            "domain": "modal",
            "mode": "field",
            "field": name,
            "identified_field": {
                "at_nodes": {"coords": _coords(problem.nodes if dim == 1
                                               else node_coords),
                             "values": vals_n.tolist()},
                "at_elements": {"centroids": _coords(centroids),
                                "values": vals_e.tolist()},
                "type": "nn",
                "input_dim": nn.input_dim,
            },
            "measured_frequencies_hz": np.asarray(f_meas).tolist(),
            "sensor_dofs": sensors.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_e is not None:
            rel = np.abs(vals_e - true_e) / np.abs(true_e)
            out["synthetic"] = True
            out["true_values"] = true_e.tolist()
            out["noise"] = noise_rel
            out["field_max_rel_error"] = float(np.max(rel))
            out["field_rmse_rel"] = float(np.sqrt(np.mean(rel * rel)))
        # Fitted spectrum with the trained field in place.
        fit_mat = problem.material.replace(**{name: trained})
        lam_fit, _ = modal_observables(problem, fit_mat, len(f_meas),
                                       sensor_dofs=None)
        lam_fit = np.asarray(_jax.device_get(lam_fit))
        f_fit = np.sqrt(np.maximum(lam_fit, 0.0)) / (2.0 * np.pi)
        out["fitted_frequencies_hz"] = f_fit.tolist()
        out["frequency_rel_error"] = (
            np.abs(f_fit - f_meas) / np.maximum(np.abs(f_meas), 1e-30)
        ).tolist()
    return out


def _run_modal_identification(problem, analysis: Dict) -> Dict:
    """Modal-domain identification block (solvers/modal_inverse.py):
    parameters fitted to extracted natural frequencies — the
    experimental-modal-analysis workflow.

    Contract:

        "analysis": {"type": "identification", "domain": "modal",
                     "params": ["young"],   # any of young/area/density;
                                            # a stiffness param TOGETHER
                                            # with density needs sensor
                                            # shape data (omega^2 ~
                                            # EA/rho: a spectrum alone
                                            # sees only the ratio)
                     "measured_frequencies_hz": [..k lowest..]
                       | "synthetic": {"young": E, "density": rho,
                                       "n_modes": 4, "noise": 0.01,
                                       "seed": 0},
                     "sensor_nodes": [..] | "sensor_dofs": [..],
                     "measured_shapes2": [[..], ..],  # (n_sensor, k)
                                            # phi^2, M-orthonormal
                                            # (synthetic mode generates
                                            # it when sensors are given)
                     "n_iter": 300, "learning_rate": 0.05,
                     "initial": {..}}

    Twin-data noise is relative on the frequencies (and on phi^2).
    Rayleigh damping is invisible to undamped frequencies — use the
    time-domain or FRF routes for alpha/beta."""

    import jax as _jax

    from ..solvers.modal_inverse import (identify_from_modal,
                                         modal_observables)
    from ..solvers.newton import DENSE_DOF_LIMIT
    from ..solvers.transient_inverse import _PARAM_ORDER

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(
            f"modal-domain identification is dense-only "
            f"({problem.ndof} DOFs > {DENSE_DOF_LIMIT}); identify on a "
            f"coarser model of the structure")
    if analysis.get("field") is not None:
        # Field mode: a spatial MLP profile (canonically rho(x)) from
        # frequencies + phi^2 sensors (see
        # _run_modal_field_identification).
        if "params" in analysis:
            raise ValueError('"params" and "field" are mutually '
                             'exclusive: field mode recovers one spatial '
                             'profile, not scalar parameters')
        return _run_modal_field_identification(problem, analysis)
    params = tuple(analysis.get("params", ["young"]))
    for p in params:
        if p not in _PARAM_ORDER:
            raise ValueError(
                f"modal identification params must be among "
                f"{list(_PARAM_ORDER)} (damping is invisible to "
                f"undamped frequencies), got {p!r}")

    sensors = None
    if "sensor_dofs" in analysis or "sensor_nodes" in analysis:
        sensors = _probe_dofs({"probe_dofs": analysis["sensor_dofs"]}
                              if "sensor_dofs" in analysis
                              else {"probe_nodes":
                                    analysis["sensor_nodes"]}, problem)

    measured = analysis.get("measured_frequencies_hz")
    synthetic = analysis.get("synthetic")
    if synthetic is not None and not isinstance(synthetic, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if (measured is None) == (synthetic is None):
        raise ValueError('modal identification needs exactly one of '
                         '"measured_frequencies_hz" or "synthetic" '
                         '(true parameter values for twin data)')
    shapes2 = analysis.get("measured_shapes2")
    if shapes2 is not None and sensors is None:
        raise ValueError('"measured_shapes2" needs "sensor_nodes" or '
                         '"sensor_dofs"')

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        true_vals = None
        if synthetic is not None:
            true_vals = {k: float(v) for k, v in synthetic.items()
                         if k in _PARAM_ORDER}
            unknown = (set(synthetic) - set(_PARAM_ORDER)
                       - {"n_modes", "noise", "seed"})
            if unknown:
                raise ValueError(f"unknown synthetic keys: "
                                 f"{sorted(unknown)}")
            from ..models.fields import ScalarField as _SF

            true_mat = problem.material.replace(
                **{k: _SF(value=v) for k, v in true_vals.items()})
            n_modes = int(synthetic.get("n_modes", 4))
            lam, s2 = modal_observables(problem, true_mat, n_modes,
                                        sensor_dofs=sensors)
            lam = np.asarray(_jax.device_get(lam))
            f_meas = np.sqrt(np.maximum(lam, 0.0)) / (2.0 * np.pi)
            if sensors is not None:
                shapes2 = np.asarray(_jax.device_get(s2))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                f_meas = f_meas * (1.0 + noise_rel
                                   * rng.standard_normal(f_meas.shape))
                if shapes2 is not None:
                    shapes2 = np.abs(shapes2 * (
                        1.0 + noise_rel
                        * rng.standard_normal(shapes2.shape)))
        else:
            f_meas = np.asarray(measured, dtype=float).reshape(-1)
            if shapes2 is not None:
                shapes2 = np.asarray(shapes2, dtype=float)

        initial = {k: float(v)
                   for k, v in (analysis.get("initial") or {}).items()}
        for p in params:
            from ..models.fields import ScalarField

            if p not in initial and not isinstance(
                    getattr(problem.material, p), ScalarField):
                from ..ops.host import _assembly_inputs, eval_field_host

                vals = eval_field_host(getattr(problem.material, p),
                                       _assembly_inputs(problem, 1.0))
                initial[p] = max(float(np.mean(vals)), 1e-12)
        initial = initial or None
        ident, hist = identify_from_modal(
            problem, f_meas, sensor_dofs=sensors,
            measured_shapes2=shapes2, params=params,
            n_iter=int(analysis.get("n_iter", 300)),
            learning_rate=float(analysis.get("learning_rate", 0.05)),
            initial=initial)

        out = {
            "success": True,
            "analysis": "identification",
            "domain": "modal",
            "params": list(params),
            "identified": ident,
            "measured_frequencies_hz": np.asarray(f_meas).tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if sensors is not None:
            out["sensor_dofs"] = sensors.tolist()
        if true_vals is not None:
            out["synthetic"] = True
            out["true_values"] = true_vals
            out["noise"] = noise_rel
            out["relative_errors"] = {
                k: abs(ident[k] - true_vals[k]) / abs(true_vals[k])
                for k in ident if k in true_vals}
        # The fitted spectrum (and its relative error) always fits in
        # JSON — a handful of modes.
        from ..models.fields import ScalarField

        fit_mat = problem.material.replace(
            **{k: ScalarField(value=v) for k, v in ident.items()})
        lam_fit, _ = modal_observables(problem, fit_mat, len(f_meas),
                                       sensor_dofs=None)
        lam_fit = np.asarray(_jax.device_get(lam_fit))
        f_fit = np.sqrt(np.maximum(lam_fit, 0.0)) / (2.0 * np.pi)
        out["fitted_frequencies_hz"] = f_fit.tolist()
        out["frequency_rel_error"] = (
            np.abs(f_fit - f_meas) / np.maximum(np.abs(f_meas), 1e-30)
        ).tolist()
    return out


def _run_frf_identification(problem, analysis: Dict) -> Dict:
    """Frequency-domain identification block
    (solvers/frequency_inverse.py): material and Rayleigh damping fitted
    to measured FRF amplitudes — the classic model-updating workflow
    (shaker sweep in, parameters out).

    Contract:

        "analysis": {"type": "identification", "domain": "frequency",
                     "omegas": [..] | {"start": w0, "stop": w1,
                                       "num": 120},
                     "params": ["young", "density", "alpha", "beta"],
                     "damping": [a0, b0],   # fixed values / start guess
                     "probe_nodes": [..] | "probe_dofs": [..],
                     "measured_amplitude": [[..], ..]  # (n_freq, n_probe)
                       | "synthetic": {"young": E, "density": rho,
                                       "alpha": a, "beta": b,
                                       "noise": 0.02, "seed": 0},
                     "n_iter": 400, "learning_rate": 0.08,
                     "restarts": 3,   # multi-start (FRF fitting is
                                      # multi-modal; see
                                      # identify_from_frf)
                     "initial": {..}, "include_fit": true}

    Twin-data noise is MULTIPLICATIVE (per-point relative,
    amp * (1 + noise * randn)): an FRF spans decades between
    anti-resonances and peaks, so additive noise at a fraction of the
    peak would swamp the low-amplitude structure the log-loss fits.
    Runs on the local CPU tier like the time-domain block (the program
    is a differentiated frequency sweep the numpy host tier cannot
    mirror)."""

    import jax as _jax

    from ..models.fields import ScalarField
    from ..solvers.frequency_inverse import (frf_probe_amplitudes,
                                             identify_from_frf)
    from ..solvers.newton import DENSE_DOF_LIMIT
    from ..solvers.transient_inverse import _DAMP_PARAMS, _PARAM_ORDER

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(
            f"frequency-domain identification is dense-only "
            f"({problem.ndof} DOFs > {DENSE_DOF_LIMIT}); identify on a "
            f"coarser model of the structure")
    omegas = _omega_array(analysis["omegas"])
    damping = analysis.get("damping", [0.0, 0.0])
    damping = (float(damping[0]), float(damping[1]))
    params = tuple(analysis.get("params", ["young", "density"]))
    for p in params:
        if p not in _PARAM_ORDER + _DAMP_PARAMS:
            raise ValueError(f"identification params must be among "
                             f"{list(_PARAM_ORDER + _DAMP_PARAMS)}, "
                             f"got {p!r}")
    probe = _probe_dofs(analysis, problem)

    measured = analysis.get("measured_amplitude")
    synthetic = analysis.get("synthetic")
    if synthetic is not None and not isinstance(synthetic, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if (measured is None) == (synthetic is None):
        raise ValueError('frequency-domain identification needs exactly '
                         'one of "measured_amplitude" (an '
                         '(n_freq, n_probe) |X| table) or "synthetic" '
                         '(true parameter values for twin data)')

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        true_vals = None
        if synthetic is not None:
            true_vals = {k: float(v) for k, v in synthetic.items()
                         if k in _PARAM_ORDER + _DAMP_PARAMS}
            unknown = (set(synthetic) - set(_PARAM_ORDER)
                       - set(_DAMP_PARAMS) - {"noise", "seed"})
            if unknown:
                raise ValueError(f"unknown synthetic keys: "
                                 f"{sorted(unknown)}")
            true_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in true_vals.items()
                   if k in _PARAM_ORDER})
            true_damp = (true_vals.get("alpha", damping[0]),
                         true_vals.get("beta", damping[1]))
            meas = np.asarray(_jax.device_get(frf_probe_amplitudes(
                problem, true_mat, omegas, true_damp, probe)))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                meas = meas * (1.0 + noise_rel
                               * rng.standard_normal(meas.shape))
                meas = np.abs(meas)       # amplitudes stay nonnegative
        else:
            meas = np.asarray(measured, dtype=float)
            if meas.ndim != 2 or meas.shape != (omegas.size, probe.size):
                raise ValueError(
                    f"measured_amplitude must be (n_freq={omegas.size}, "
                    f"n_probe={probe.size}), got {meas.shape}")

        initial = {k: float(v)
                   for k, v in (analysis.get("initial") or {}).items()}
        for p in params:
            if p not in _PARAM_ORDER:
                continue
            if p not in initial and not isinstance(
                    getattr(problem.material, p), ScalarField):
                from ..ops.host import _assembly_inputs, eval_field_host

                vals = eval_field_host(getattr(problem.material, p),
                                       _assembly_inputs(problem, 1.0))
                initial[p] = max(float(np.mean(vals)), 1e-12)
        initial = initial or None
        ident, hist = identify_from_frf(
            problem, meas, omegas, probe, params=params, damping=damping,
            n_iter=int(analysis.get("n_iter", 400)),
            learning_rate=float(analysis.get("learning_rate", 0.08)),
            initial=initial,
            # Multi-start by default: FRF fitting is multi-modal (a far
            # starting stiffness locks onto the wrong resonance), and a
            # JSON caller has no cheap way to probe the basin.
            restarts=int(analysis.get("restarts", 3)))

        out = {
            "success": True,
            "analysis": "identification",
            "domain": "frequency",
            "params": list(params),
            "identified": ident,
            "omegas": omegas.tolist(),
            "probe_dofs": probe.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_vals is not None:
            out["synthetic"] = True
            out["true_values"] = true_vals
            out["noise"] = noise_rel
            out["relative_errors"] = {
                k: abs(ident[k] - true_vals[k]) / abs(true_vals[k])
                for k in ident if k in true_vals}
        if analysis.get("include_fit",
                        probe.size * omegas.size
                        <= 4 * _SHAPES_JSON_DOF_LIMIT):
            fit_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in ident.items()
                   if k in _PARAM_ORDER})
            fit_damp = (ident.get("alpha", damping[0]),
                        ident.get("beta", damping[1]))
            fit = np.asarray(_jax.device_get(frf_probe_amplitudes(
                problem, fit_mat, omegas, fit_damp, probe)))
            floor = 1e-12 * max(float(np.max(meas)), 1e-30)
            out["fitted_amplitude"] = fit.tolist()
            out["measured_amplitude"] = meas.tolist()
            # Log-space RMS, the quantity the fit minimizes.
            out["fit_rms_log"] = float(np.sqrt(np.mean(
                (np.log(fit + floor) - np.log(meas + floor)) ** 2)))
    return out


def run_identification(problem, analysis: Dict) -> Dict:
    """Execute a time-domain identification block
    (solvers/transient_inverse.py): scalar material parameters recovered
    from a measured probe displacement history by reverse-mode AD through
    the central-difference integrator (the discrete adjoint).

    Contract (the round-3 tier-gap closure: every capability reachable
    from the JSON tier down, io/analysis.py:49-51 standard):

        "analysis": {"type": "identification",
                     "dt": 0.05 | "auto",   # auto: synthetic mode only
                                            # (a measurement fixes its
                                            # own grid); Gershgorin
                                            # critical step of the TRUE
                                            # material
                     "n_steps": 400,
                     "params": ["young", "density"],
                         # any of young/area/density and the Rayleigh
                         # damping coefficients alpha/beta (identified
                         # through the decay envelope; their starting
                         # guess is the "damping" entry — a zero start
                         # needs "initial", log parameterization)
                     "probe_nodes": [..] | "probe_dofs": [..],
                     "measured": [[..], ..],    # (n_rec, n_probe) rows
                       | "synthetic": {"young": E, "density": rho,
                                       "alpha": a, "beta": b,
                                       "noise": 0.02, "seed": 0},
                         # twin-data mode: generate the measurement from
                         # these true values (+ relative Gaussian noise),
                         # identify starting from the problem's own
                         # material — the standard validation workflow
                     "amplitude": <same contract as transient>,
                     "damping": [alpha, beta],
                     "record_every": 1,
                     "n_iter": 300, "learning_rate": 0.05,
                     "initial": {"young": 1.0},
                     "include_fit": true}       # fitted probe trajectory

    With a "field" key the block switches to FIELD mode — a spatially-
    varying MLP profile (the reference's NN-property parameterization)
    trained against the trajectory instead of scalar parameters; see
    _run_field_identification for that contract.  With
    "domain": "frequency" the measurement is an FRF amplitude sweep
    instead of a trajectory (model updating from shaker data); see
    _run_frf_identification.

    The model problem's own material supplies the starting guess unless
    `initial` overrides it.  E and A are not separately identifiable from
    displacements (only EA is) — identify one of them at a time.

    Identification meshes are small (dense traced K) but the program is a
    differentiated `lax.scan` the host tier cannot mirror in numpy, so
    below DENSE_DOF_LIMIT the whole run executes on the LOCAL CPU backend
    (jax.default_device): compiles are local milliseconds instead of the
    attachment's minutes-long remote helper, which keeps the HTTP route
    inside its timeout.  `"on_device": true` opts back into the default
    accelerator (e.g. to keep a large study TPU-resident).
    """
    import jax as _jax

    from ..models.fields import ScalarField
    from ..solvers.transient_inverse import (_DAMP_PARAMS, _PARAM_ORDER,
                                             identify_from_transient,
                                             transient_probe_response)

    domain = analysis.get("domain", "time")
    if domain == "frequency":
        if analysis.get("field") is not None:
            raise ValueError("field mode supports the time and modal "
                             "domains, not FRF fitting")
        # FRF-amplitude fitting (see _run_frf_identification).
        return _run_frf_identification(problem, analysis)
    if domain == "modal":
        # Extracted-frequency fitting, scalar or field (see
        # _run_modal_identification).
        return _run_modal_identification(problem, analysis)
    if domain != "time":
        raise ValueError(f'identification domain must be "time", '
                         f'"frequency" or "modal", got {domain!r}')

    n_steps = int(analysis["n_steps"])
    record_every = int(analysis.get("record_every", 1))
    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    n_rec = n_steps // record_every
    damping = analysis.get("damping", [0.0, 0.0])
    damping = (float(damping[0]), float(damping[1]))
    from ..solvers.newton import DENSE_DOF_LIMIT

    if problem.ndof > DENSE_DOF_LIMIT:
        # The forward model traces a DENSE (ndof, ndof) K through the
        # scan (transient_inverse._probe_history) — fine for the small
        # meshes identification targets, quadratic memory past the dense
        # limit. Fail the request up front instead of OOMing mid-solve.
        raise ValueError(
            f"time-domain identification is dense-only "
            f"({problem.ndof} DOFs > {DENSE_DOF_LIMIT}); identify on a "
            f"coarser model of the structure")
    synthetic_spec = analysis.get("synthetic")
    if synthetic_spec is not None and not isinstance(synthetic_spec, dict):
        raise ValueError('"synthetic" must be an object of true '
                         'parameter values')
    if analysis.get("field") is not None:
        # Field mode: a spatial MLP profile instead of scalar parameters
        # (see _run_field_identification for the contract).
        if "params" in analysis:
            raise ValueError('"params" and "field" are mutually exclusive: '
                             'field mode recovers one spatial profile, not '
                             'scalar parameters')
        return _run_field_identification(problem, analysis, n_steps,
                                         record_every, n_rec, damping,
                                         synthetic_spec)
    dt_spec = analysis["dt"]
    if dt_spec == "auto":
        # Only meaningful in twin-data mode (a real measurement fixes its
        # own grid); the Gershgorin critical step of the TRUE material
        # keeps the synthetic integration stable whatever values the
        # block asks to recover.
        if synthetic_spec is None:
            raise ValueError('dt="auto" needs "synthetic" twin data; a '
                             'measured history fixes its own dt')
        from ..models.fields import ScalarField as _SF
        from ..models.problem import TrussProblem as _TP

        syn = {k: float(v) for k, v in analysis["synthetic"].items()
               if k in _PARAM_ORDER}
        true_problem = _TP(
            problem.nodes, problem.elements,
            problem.material.replace(
                **{k: _SF(value=v) for k, v in syn.items()}),
            problem.loads, problem.fixed_dofs, problem.dimension)
        # safety=0.45, not the transient default 0.9: the OPTIMIZER
        # integrates at every parameter value it visits, and a log-space
        # ADAM overshoot past the true stiffness (or under the true
        # density) raises omega_max above the truth's — a dt at the
        # truth's critical step then blows up mid-descent and the loss
        # goes NaN. 0.45 keeps a 2x stiffness overshoot stable.
        # The truth integrates with ITS damping (synthetic alpha/beta
        # override the guesses), and damping SHRINKS the critical step.
        dt_damp = (float(analysis["synthetic"].get("alpha", damping[0])),
                   float(analysis["synthetic"].get("beta", damping[1])))
        dt = stable_dt(true_problem, damping=dt_damp, safety=0.45)
    else:
        dt = float(dt_spec)
    params = tuple(analysis.get("params", ["young", "density"]))
    for p in params:
        if p not in _PARAM_ORDER + _DAMP_PARAMS:
            raise ValueError(f"identification params must be among "
                             f"{list(_PARAM_ORDER + _DAMP_PARAMS)}, "
                             f"got {p!r}")
    probe = _probe_dofs(analysis, problem)
    amplitude = _amplitude_array(analysis.get("amplitude"), n_steps, dt)

    measured = analysis.get("measured")
    synthetic = synthetic_spec
    if (measured is None) == (synthetic is None):
        raise ValueError('identification needs exactly one of "measured" '
                         '(a (n_rec, n_probe) history) or "synthetic" '
                         '(true parameter values for twin data)')

    with _local_cpu_ctx(analysis):
        noise_rel = 0.0
        true_vals = None
        if synthetic is not None:
            true_vals = {k: float(v) for k, v in synthetic.items()
                         if k in _PARAM_ORDER + _DAMP_PARAMS}
            unknown = (set(synthetic) - set(_PARAM_ORDER)
                       - set(_DAMP_PARAMS) - {"noise", "seed"})
            if unknown:
                raise ValueError(f"unknown synthetic keys: "
                                 f"{sorted(unknown)}")
            true_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in true_vals.items()
                   if k in _PARAM_ORDER})
            # The truth integrates with ITS damping: synthetic alpha/beta
            # override the block's (which stays the starting guess).
            true_damp = (true_vals.get("alpha", damping[0]),
                         true_vals.get("beta", damping[1]))
            meas = np.asarray(_jax.device_get(transient_probe_response(
                problem, true_mat, dt, n_steps, amplitude, probe,
                record_every=record_every, damping=true_damp)))
            noise_rel = float(synthetic.get("noise", 0.0))
            if noise_rel:
                rng = np.random.default_rng(int(synthetic.get("seed", 0)))
                meas = meas + noise_rel * np.max(np.abs(meas)) \
                    * rng.standard_normal(meas.shape)
        else:
            meas = np.asarray(measured, dtype=float)
            if meas.ndim != 2 or meas.shape != (n_rec, probe.size):
                raise ValueError(
                    f"measured must be (n_steps/record_every={n_rec}, "
                    f"n_probe={probe.size}) rows, got {meas.shape}")

        initial = {k: float(v)
                   for k, v in (analysis.get("initial") or {}).items()}
        for p in params:
            # A non-scalar base field (e.g. the UI's young-NN) has no
            # single value to start from; use its mean over the element
            # midpoints — identification then REPLACES the field with
            # the recovered scalar, as identify_from_transient documents.
            # (Damping coefficients start from the block's "damping".)
            if p not in _PARAM_ORDER:
                continue
            if p not in initial and not isinstance(
                    getattr(problem.material, p), ScalarField):
                from ..ops.host import _assembly_inputs, eval_field_host

                vals = eval_field_host(getattr(problem.material, p),
                                       _assembly_inputs(problem, 1.0))
                initial[p] = max(float(np.mean(vals)), 1e-12)
        initial = initial or None
        ident, hist = identify_from_transient(
            problem, meas, dt, n_steps, probe,
            amplitude=amplitude, params=params,
            record_every=record_every, damping=damping,
            n_iter=int(analysis.get("n_iter", 300)),
            learning_rate=float(analysis.get("learning_rate", 0.05)),
            initial=initial)

        out = {
            "success": True,
            "analysis": "identification",
            "params": list(params),
            "identified": ident,
            "dt": dt,
            "n_steps": n_steps,
            "record_every": record_every,
            "probe_dofs": probe.tolist(),
            "n_iter": len(hist),
            "final_loss": float(hist[-1]),
            "loss_history": hist.tolist(),
        }
        if true_vals is not None:
            out["synthetic"] = True
            out["true_values"] = true_vals
            out["noise"] = noise_rel
            out["relative_errors"] = {
                k: abs(ident[k] - true_vals[k]) / abs(true_vals[k])
                for k in ident if k in true_vals}
        if analysis.get("include_fit",
                        probe.size * n_rec <= 4 * _SHAPES_JSON_DOF_LIMIT):
            fit_mat = problem.material.replace(
                **{k: ScalarField(value=v) for k, v in ident.items()
                   if k in _PARAM_ORDER})
            fit_damp = (ident.get("alpha", damping[0]),
                        ident.get("beta", damping[1]))
            fit = np.asarray(_jax.device_get(transient_probe_response(
                problem, fit_mat, dt, n_steps, amplitude, probe,
                record_every=record_every, damping=fit_damp)))
            scale = max(float(np.max(np.abs(meas))), 1e-30)
            out["fitted_displacements"] = fit.tolist()
            out["measured_displacements"] = meas.tolist()
            out["fit_rmse_rel"] = float(
                np.sqrt(np.mean((fit - meas) ** 2)) / scale)
    return out

