"""Time-domain PINN identification: material parameters from measured
transient response.

Statics cannot see density (it cancels from the equilibrium residual —
the reference never even evaluates it, SURVEY §7.3) and modal
identification needs extracted frequencies/shapes.  Here the measurement
is the raw probe displacement HISTORY u_probe(t) under a known load
history, and the model is the central-difference integrator itself: the
whole time loop is one differentiable `lax.scan`, so reverse-mode AD
through the integrator (discrete adjoint) gives exact gradients of the
trajectory-mismatch loss w.r.t. (log E, log A, log rho) — mass and
stiffness both, in one shot.

This is a capability genuinely unlocked by the JAX design: the reference
stack has no integrator to differentiate, and a torch translation of a
host-stepped loop would build a 10^4-node graph per solve.  Dense-K path
(identification meshes are small); log-parameterization for conditioning,
as in scalar_inverse.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fields import Material, ScalarField
from ..models.problem import TrussProblem
from ..ops.assembly import assemble_system
from ..ops.mass import lumped_mass
from .phases import ADAM

_PARAM_ORDER = ("young", "area", "density")
# Rayleigh damping coefficients, identifiable alongside the material:
# C = alpha M + beta K enters the residual through the lagged velocity,
# so the discrete adjoint reaches both through the decay envelope.
_DAMP_PARAMS = ("alpha", "beta")


def _reject_ea_pair(params):
    """E and A enter the truss physics ONLY as the product EA (stiffness
    s = EA/L0; even the mass is rho*A*L0, so A pairs with rho the same
    way) — identifying both from response data of any domain is exactly
    degenerate, and the optimizer would return an arbitrary split.
    Every identification route refuses the pair up front."""
    if "young" in params and "area" in params:
        raise ValueError(
            "young and area are not separately identifiable (only the "
            "product EA enters the physics); identify one and fix the "
            "other")


@partial(jax.jit, static_argnames=("n_steps", "record_every"))
def _probe_history(k, m, mask, loads, amp, dt, alpha, beta, probe,
                   n_steps: int, record_every: int):
    """(n_rec, n_probe) central-difference displacement history with K as
    a TRACED dense matrix (differentiable w.r.t. k and m)."""
    inv_m = jnp.where(m > 0, 1.0 / m, 0.0)
    dt2 = dt * dt

    def force(i):
        return amp[jnp.minimum(i, amp.shape[0] - 1)] * loads

    def residual(i, u, v_lag):
        return force(i) - k @ u - alpha * (m * v_lag) - beta * (k @ v_lag)

    u0 = jnp.zeros_like(loads)
    a0 = inv_m * residual(0, u0, u0) * mask
    u_prev0 = u0 + 0.5 * dt2 * a0

    def step(carry, i):
        u, u_prev = carry
        v_lag = (u - u_prev) / dt
        u_next = (2.0 * u - u_prev + dt2 * inv_m * residual(i, u, v_lag)
                  ) * mask
        return (u_next, u), u_next[probe]

    _, traj = jax.lax.scan(step, (u0, u_prev0),
                           jnp.arange(n_steps, dtype=jnp.int32))
    return traj[record_every - 1::record_every]


def transient_probe_response(problem: TrussProblem, material: Material,
                             dt, n_steps: int, amplitude, probe_dofs,
                             record_every: int = 1, damping=(0.0, 0.0),
                             data=None):
    """Traced, differentiable probe-displacement history (see module
    docstring).  `material` may carry traced parameter pytrees."""
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    k = assemble_system(data, material, jnp.zeros(problem.ndof, dtype))[0]
    mask = data.free_mask
    m = lumped_mass(data, material) * mask + (1.0 - mask)
    return _probe_history(
        k, m, mask, data.loads, jnp.asarray(amplitude, dtype),
        jnp.asarray(dt, dtype), jnp.asarray(damping[0], dtype),
        jnp.asarray(damping[1], dtype),
        jnp.asarray(np.asarray(probe_dofs, dtype=int)),
        n_steps, record_every)


def identify_from_transient(
    problem: TrussProblem,
    measured: np.ndarray,
    dt: float,
    n_steps: int,
    probe_dofs,
    amplitude=None,
    params: Sequence[str] = ("young", "density"),
    record_every: int = 1,
    damping=(0.0, 0.0),
    n_iter: int = 300,
    learning_rate: float = 0.05,
    initial: Dict[str, float] | None = None,
    data=None,
) -> Tuple[Dict[str, float], np.ndarray]:
    """Recover scalar material parameters from a measured probe history.

    Args:
        measured: (n_rec, n_probe) displacement history (n_rec =
            n_steps // record_every).
        params: which of ("young", "area", "density") — and/or the
            Rayleigh damping coefficients ("alpha", "beta") — to
            identify; material parameters not listed stay at
            problem.material's values, damping coefficients not listed
            stay at the `damping` argument's.  Note E and A are not
            separately identifiable from displacements (only EA is);
            identify one of them at a time.  Damping is observed through
            the decay envelope, so the window must span enough periods
            for the decay to register above the noise.
        damping: fixed Rayleigh (alpha, beta) — and the starting guess
            for whichever of them `params` identifies (a coefficient
            started at exactly 0 needs `initial`: the log
            parameterization has no gradient there).
        initial: starting guesses per identified parameter (default: the
            problem material's / `damping`'s current values).

    Returns:
        (identified dict, loss history array).
    """
    for p in params:
        if p not in _PARAM_ORDER + _DAMP_PARAMS:
            raise ValueError(f"unknown parameter {p!r}")
    _reject_ea_pair(params)
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    amplitude = (np.ones(n_steps) if amplitude is None
                 else np.asarray(amplitude, dtype=float))
    meas = jnp.asarray(np.asarray(measured), dtype)
    u_scale = jnp.maximum(jnp.max(jnp.abs(meas)), 1e-30)

    base = problem.material
    init = dict(initial or {})

    def _start(p):
        if p in init:
            return init[p]
        if p in _DAMP_PARAMS:
            v = float(damping[_DAMP_PARAMS.index(p)])
            if v <= 0.0:
                raise ValueError(
                    f"identifying {p!r} from a zero starting value needs "
                    f"initial={{{p!r}: <positive guess>}} (log "
                    f"parameterization)")
            return v
        return _scalar_value(base, p)

    # Lazy fallback: dict.get(key, default) would evaluate _scalar_value
    # even when `initial` supplies the value — raising for NN base fields
    # the caller deliberately provided a starting guess for.
    log_p0 = jnp.asarray([np.log(_start(p)) for p in params], dtype)

    def with_params(log_p):
        fields = {}
        for i, p in enumerate(params):
            if p in _PARAM_ORDER:
                fields[p] = ScalarField(value=jnp.exp(log_p[i]))
        return base.replace(**fields)

    def damping_of(log_p):
        out = [jnp.asarray(damping[0], dtype), jnp.asarray(damping[1],
                                                           dtype)]
        for i, p in enumerate(params):
            if p in _DAMP_PARAMS:
                out[_DAMP_PARAMS.index(p)] = jnp.exp(log_p[i])
        return tuple(out)

    def loss_fn(log_p):
        traj = transient_probe_response(
            problem, with_params(log_p), dt, n_steps, amplitude, probe_dofs,
            record_every, damping_of(log_p), data)
        return jnp.mean(((traj - meas) / u_scale) ** 2)

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
    # ONE device fetch for everything (a float(loss) per iteration costs
    # ~30 ms of attachment latency EACH and defeats async dispatch —
    # ~9 s of pure round trips at the default n_iter).
    log_p, hist = jax.device_get((log_p, hist))
    values = np.exp(np.asarray(log_p, dtype=float))
    return dict(zip(params, values.tolist())), np.asarray(hist, dtype=float)


def _scalar_value(material: Material, name: str) -> float:
    f = getattr(material, name)
    if not isinstance(f, ScalarField):
        raise ValueError(f"{name} must be a scalar field to initialize "
                         "identification from it; pass initial={...}")
    return float(f.value)


def transient_probe_response_elem(problem: TrussProblem, young_e, area_e,
                                  rho_e, dt, n_steps: int, amplitude,
                                  probe_dofs, record_every: int = 1,
                                  damping=(0.0, 0.0), data=None):
    """Probe history with PER-ELEMENT material values.

    The truth model for field-identification twin data: a tabulated
    E(x_mid) per element needs no Field object — the (nelm,) arrays feed
    the element kernel (ops/elements.truss_linear_batch) and the lumped
    mass split directly, exactly what assemble_system/lumped_mass would
    produce for a field evaluating to these values at the midpoints."""
    from ..ops.elements import truss_linear_batch

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    nelm = data.dof_map.shape[0]
    young_e = jnp.broadcast_to(jnp.asarray(young_e, dtype), (nelm,))
    area_e = jnp.broadcast_to(jnp.asarray(area_e, dtype), (nelm,))
    rho_e = jnp.broadcast_to(jnp.asarray(rho_e, dtype), (nelm,))

    u_e = jnp.zeros(data.dof_map.shape, dtype)
    elem = truss_linear_batch(data.gvec, data.inv_len, u_e, young_e, area_e)
    rows = data.dof_map[:, :, None]
    cols = data.dof_map[:, None, :]
    k = jnp.zeros((data.ndof, data.ndof), dtype).at[rows, cols].add(elem.ke)

    mask = data.free_mask
    m_e = rho_e * area_e / data.inv_len
    contrib = jnp.broadcast_to((0.5 * m_e)[:, None], data.dof_map.shape)
    m = jnp.zeros(data.ndof, dtype).at[data.dof_map].add(contrib)
    if data.point_mass is not None:          # payload mass (ops/mass)
        m = m + data.point_mass
    m = m * mask + (1.0 - mask)

    amplitude = (np.ones(n_steps) if amplitude is None else amplitude)
    return _probe_history(
        k, m, mask, data.loads, jnp.asarray(amplitude, dtype),
        jnp.asarray(dt, dtype), jnp.asarray(damping[0], dtype),
        jnp.asarray(damping[1], dtype),
        jnp.asarray(np.asarray(probe_dofs, dtype=int)),
        n_steps, record_every)


def identify_field_from_transient(
    problem: TrussProblem,
    measured: np.ndarray,
    dt: float,
    n_steps: int,
    probe_dofs,
    field: str = "young",
    nn_field=None,
    amplitude=None,
    record_every: int = 1,
    damping=(0.0, 0.0),
    n_iter: int = 600,
    learning_rate: float = 0.05,
    data=None,
):
    """Recover a SPATIALLY-VARYING material field from a probe history.

    The reference identifies NN property fields from STATIC measured
    displacements (its flagship inverse capability, SURVEY §3.2); here the
    same MLP parameterization (models/fields.MLPField — softplus·scale,
    reference architecture/init) trains against a transient trajectory
    instead: reverse-mode AD through the central-difference `lax.scan`
    gives exact gradients of the trajectory mismatch w.r.t. every network
    weight, through stiffness AND mass simultaneously.  A wave sweeping
    the structure interrogates each element's stiffness in sequence, so a
    few probes' histories constrain the whole profile — information a
    single static deflection cannot carry.

    Args:
        field: which material field the network parameterizes ("young",
            "area" or "density"); the others stay at problem.material's
            values.
        nn_field: the MLPField to train (architecture + starting weights).
            Default: `getattr(problem.material, field)`, which must then
            be an MLPField.

    Returns:
        (trained MLPField, loss history array).
    """
    from ..models.fields import MLPField

    if field not in _PARAM_ORDER:
        raise ValueError(f"unknown parameter {field!r}")
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    base = problem.material
    fld = nn_field if nn_field is not None else getattr(base, field)
    if not isinstance(fld, MLPField):
        raise ValueError(f"{field} must be an MLPField to identify a "
                         "spatial profile; pass nn_field=make_mlp_field(...)")
    amplitude = (np.ones(n_steps) if amplitude is None
                 else np.asarray(amplitude, dtype=float))
    meas = jnp.asarray(np.asarray(measured), dtype)
    u_scale = jnp.maximum(jnp.max(jnp.abs(meas)), 1e-30)

    def loss_fn(layers):
        mat = base.replace(**{field: fld.replace(layers=layers)})
        traj = transient_probe_response(
            problem, mat, dt, n_steps, amplitude, probe_dofs,
            record_every, damping, data)
        return jnp.mean(((traj - meas) / u_scale) ** 2)

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
    # ONE device fetch (identify_from_transient's round-trip rule).
    layers, hist = jax.device_get((layers, hist))
    trained = fld.replace(layers=jax.tree_util.tree_map(jnp.asarray, layers))
    return trained, np.asarray(hist, dtype=float)
