"""Modal-domain PINN identification: material parameters from extracted
natural frequencies (and optionally mode-shape magnitudes).

The third leg of the identification family (time domain:
transient_inverse.py; FRF amplitudes: frequency_inverse.py): after an
experimental modal analysis the data is a handful of natural
frequencies f_j — and possibly mode-shape components at sensor DOFs.
The forward model is the differentiable generalized eigensolve
(solvers/modal.modal_eigenpairs), so gradients of the frequency
mismatch flow through K AND M into the parameters.

Identifiability (the physics, enforced here): frequencies are invariant
under a UNIFORM scaling of stiffness and mass (omega^2 ~ EA/rho), so a
spectrum alone determines only their ratio — any SINGLE parameter is
identifiable, but a stiffness-like parameter (young/area) TOGETHER with
density needs mode-shape data: M-orthonormal shapes scale as
1/sqrt(rho), so the sign-invariant phi^2 at sensor DOFs
(examples/modal_identification.py uses the same trick for a rho(x)
field) breaks the degeneracy.

Rayleigh damping is invisible to undamped frequencies — identify it
from the time-domain or FRF routes.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fields import Material, ScalarField
from ..models.problem import TrussProblem
from .modal import modal_eigenpairs
from .phases import ADAM
from .transient_inverse import (_PARAM_ORDER, _reject_ea_pair,
                                _scalar_value)

_STIFF_PARAMS = ("young", "area")


def modal_observables(problem: TrussProblem, material: Material,
                      n_modes: int, sensor_dofs=None, data=None,
                      lumped: bool = True):
    """Traced (omega^2 (n_modes,), phi^2 at sensors (n_sensor, n_modes))
    — the differentiable forward model.  phi^2 is sign-invariant
    (eigenvector sign is arbitrary) and rho-sensitive (M-orthonormal
    shapes scale as 1/sqrt(rho)).  sensor_dofs=None skips shapes."""
    data = data if data is not None else problem.to_device()
    lam, phi = modal_eigenpairs(problem, n_modes=n_modes, lumped=lumped,
                                data=data, material=material)
    if sensor_dofs is None:
        return lam, None
    s = jnp.asarray(np.asarray(sensor_dofs, dtype=int))
    return lam, phi[s, :] ** 2


def modal_observables_elem(problem: TrussProblem, young_e, area_e, rho_e,
                           n_modes: int, sensor_dofs=None, data=None):
    """Modal observables with PER-ELEMENT material values — the truth
    model for field-identification twin data (the modal sibling of
    transient_inverse.transient_probe_response_elem: a tabulated
    profile needs no Field object)."""
    from ..ops.elements import truss_linear_batch
    from .modal import _dense_eigensolve

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    nelm = data.dof_map.shape[0]
    young_e = jnp.broadcast_to(jnp.asarray(young_e, dtype), (nelm,))
    area_e = jnp.broadcast_to(jnp.asarray(area_e, dtype), (nelm,))
    rho_e = jnp.broadcast_to(jnp.asarray(rho_e, dtype), (nelm,))

    u_e = jnp.zeros(data.dof_map.shape, dtype)
    elem = truss_linear_batch(data.gvec, data.inv_len, u_e, young_e,
                              area_e)
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    k = jnp.zeros((data.ndof, data.ndof), dtype).at[rows, cols].add(
        elem.ke)
    m_e = rho_e * area_e / data.inv_len
    contrib = jnp.broadcast_to((0.5 * m_e)[:, None], data.dof_map.shape)
    m = jnp.zeros(data.ndof, dtype).at[data.dof_map].add(contrib)
    if data.point_mass is not None:          # payload mass (ops/mass)
        m = m + data.point_mass

    free_idx = jnp.asarray(problem.free_fixed()[0])
    k_ff = k[jnp.ix_(free_idx, free_idx)]
    w, v = _dense_eigensolve(k_ff, m[free_idx], n_modes, lumped=True)
    if sensor_dofs is None:
        return w, None
    phi = jnp.zeros((problem.ndof, n_modes), dtype).at[free_idx].set(v)
    s = jnp.asarray(np.asarray(sensor_dofs, dtype=int))
    return w, phi[s, :] ** 2


def identify_field_from_modal(
    problem: TrussProblem,
    measured_hz,
    sensor_dofs=None,
    measured_shapes2=None,
    field: str = "density",
    nn_field=None,
    n_iter: int = 800,
    learning_rate: float = 0.02,
    lumped: bool = True,
    data=None,
):
    """Recover a SPATIALLY-VARYING material field from extracted modal
    data — a density profile rho(x) from natural frequencies plus phi^2
    sensor rows (the workflow examples/modal_identification.py
    demonstrates, productized; density is the canonical target since no
    static method sees it at all).

    A handful of frequencies alone underdetermines a field profile;
    sign-invariant phi^2 sensor data both regularizes the inversion and
    (for density) breaks the spectrum's stiffness/mass scaling
    degeneracy — REQUIRED here, matching the scalar route's physics
    guard.

    Args:
        field: which material field the network parameterizes.
        nn_field: the MLPField to train (default:
            `getattr(problem.material, field)`, which must then be an
            MLPField).

    Returns:
        (trained MLPField, loss history array).
    """
    from ..models.fields import MLPField

    if field not in _PARAM_ORDER:
        raise ValueError(f"unknown parameter {field!r}")
    if measured_shapes2 is None or sensor_dofs is None:
        raise ValueError(
            "field identification from modal data needs sensor_dofs + "
            "measured_shapes2: a handful of frequencies alone "
            "underdetermines a spatial profile (and for density the "
            "spectrum only sees the stiffness/mass ratio)")
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    base = problem.material
    fld = nn_field if nn_field is not None else getattr(base, field)
    if not isinstance(fld, MLPField):
        raise ValueError(f"{field} must be an MLPField to identify a "
                         "spatial profile; pass nn_field=make_mlp_field(...)")
    f_meas = np.asarray(measured_hz, dtype=float).reshape(-1)
    n_modes = f_meas.size
    lam_meas = jnp.asarray((2.0 * np.pi * f_meas) ** 2, dtype)
    shapes2_meas = jnp.asarray(np.asarray(measured_shapes2), dtype)
    n_sensor = np.asarray(sensor_dofs).size
    if shapes2_meas.shape != (n_sensor, n_modes):
        raise ValueError(
            f"measured_shapes2 must be (n_sensor={n_sensor}, "
            f"n_modes={n_modes}), got {tuple(shapes2_meas.shape)}")
    s2_scale = jnp.maximum(jnp.max(shapes2_meas), 1e-30)

    def loss_fn(layers):
        mat = base.replace(**{field: fld.replace(layers=layers)})
        lam, s2 = modal_observables(problem, mat, n_modes, sensor_dofs,
                                    data, lumped=lumped)
        return (jnp.mean(((lam - lam_meas) / lam_meas) ** 2)
                + jnp.mean(((s2 - shapes2_meas) / s2_scale) ** 2))

    @jax.jit
    def gd_step(layers, opt):
        loss, g = jax.value_and_grad(loss_fn)(layers)
        d, opt = ADAM.update(g, opt)
        layers = jax.tree_util.tree_map(
            lambda p, di: p - learning_rate * di, layers, d)
        return layers, opt, loss

    layers = fld.layers
    opt = ADAM.init(layers)
    hist = []
    for _ in range(n_iter):
        layers, opt, loss = gd_step(layers, opt)
        hist.append(loss)          # device scalar: no per-iteration sync
    layers, hist = jax.device_get((layers, hist))
    trained = fld.replace(layers=jax.tree_util.tree_map(jnp.asarray,
                                                        layers))
    return trained, np.asarray(hist, dtype=float)


def identify_from_modal(
    problem: TrussProblem,
    measured_hz,
    sensor_dofs=None,
    measured_shapes2=None,
    params: Sequence[str] = ("young",),
    n_iter: int = 300,
    learning_rate: float = 0.05,
    initial: Dict[str, float] | None = None,
    lumped: bool = True,
    data=None,
) -> Tuple[Dict[str, float], np.ndarray]:
    """Recover scalar material parameters from extracted modal data.

    Args:
        measured_hz: (k,) measured natural frequencies in Hz (the k
            lowest, in order).
        sensor_dofs / measured_shapes2: optional (n_sensor,) DOFs and
            (n_sensor, k) squared mode-shape components there
            (M-orthonormal convention).  REQUIRED when `params` mixes a
            stiffness-like parameter with density (see module
            docstring); pure-frequency data cannot see the split.
        params: which of ("young", "area", "density") to identify.

    Returns:
        (identified dict, loss history array).
    """
    for p in params:
        if p not in _PARAM_ORDER:
            raise ValueError(f"unknown parameter {p!r} (damping is "
                             "invisible to undamped frequencies)")
    _reject_ea_pair(params)
    has_stiff = any(p in _STIFF_PARAMS for p in params)
    if has_stiff and "density" in params and measured_shapes2 is None:
        raise ValueError(
            "frequencies alone determine only the stiffness/mass RATIO "
            "(omega^2 ~ EA/rho): identifying "
            f"{[p for p in params if p in _STIFF_PARAMS]} together with "
            "density needs measured_shapes2 (sign-invariant phi^2 at "
            "sensor DOFs; M-orthonormal shapes scale as 1/sqrt(rho))")
    if (measured_shapes2 is None) != (sensor_dofs is None):
        raise ValueError("sensor_dofs and measured_shapes2 go together")

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    f_meas = np.asarray(measured_hz, dtype=float).reshape(-1)
    n_modes = f_meas.size
    lam_meas = jnp.asarray((2.0 * np.pi * f_meas) ** 2, dtype)
    shapes2_meas = None
    if measured_shapes2 is not None:
        shapes2_meas = jnp.asarray(np.asarray(measured_shapes2), dtype)
        n_sensor = np.asarray(sensor_dofs).size
        if shapes2_meas.shape != (n_sensor, n_modes):
            raise ValueError(
                f"measured_shapes2 must be (n_sensor={n_sensor}, "
                f"n_modes={n_modes}), got {tuple(shapes2_meas.shape)}")
        # The shape term's natural scale: phi^2 ~ 1/(rho A L), set by
        # the measurement itself.
        s2_scale = jnp.maximum(jnp.max(shapes2_meas), 1e-30)

    base = problem.material
    init = dict(initial or {})
    log_p0 = jnp.asarray(
        [np.log(init[p] if p in init else _scalar_value(base, p))
         for p in params], dtype)

    def with_params(log_p):
        fields = {}
        for i, p in enumerate(params):
            fields[p] = ScalarField(value=jnp.exp(log_p[i]))
        return base.replace(**fields)

    def loss_fn(log_p):
        lam, s2 = modal_observables(problem, with_params(log_p), n_modes,
                                    sensor_dofs, data, lumped=lumped)
        loss = jnp.mean(((lam - lam_meas) / lam_meas) ** 2)
        if shapes2_meas is not None:
            loss = loss + jnp.mean(((s2 - shapes2_meas) / s2_scale) ** 2)
        return loss

    @jax.jit
    def gd_step(log_p, opt):
        loss, g = jax.value_and_grad(loss_fn)(log_p)
        d, opt = ADAM.update(g, opt)
        return log_p - learning_rate * d, opt, loss

    log_p = log_p0
    opt = ADAM.init(log_p0)
    hist = []
    for _ in range(n_iter):
        log_p, opt, loss = gd_step(log_p, opt)
        hist.append(loss)          # device scalar: no per-iteration sync
    # ONE device fetch (the transient route's round-trip rule).
    log_p, hist = jax.device_get((log_p, hist))
    values = np.exp(np.asarray(log_p, dtype=float))
    return dict(zip(params, values.tolist())), np.asarray(hist,
                                                          dtype=float)
