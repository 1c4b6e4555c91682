"""Frequency-domain PINN identification: material and damping from
measured FRF amplitudes.

The classic model-updating workflow: a shaker sweep measures
|X(omega)| at a few probe DOFs, and the model is the harmonic forward
problem itself — (K + i omega C - omega^2 M) X = F in the same real
2x2-block form solvers/harmonic.py batches over the sweep.  The whole
frequency response is differentiable w.r.t. (log E, log A, log rho,
log alpha, log beta), so Adam fits the measured amplitude curve
directly: resonance positions pin stiffness/mass (the amplitude scale
breaks the K~M scaling degeneracy), peak widths pin the damping.

Fitting LOG amplitude is load-bearing: an FRF spans decades between
anti-resonances and peaks, and a linear-amplitude loss sees only the
peaks.  Complement to the time-domain route (transient_inverse.py):
same parameters, independent data domain — agreement between the two
is a strong model check.

Dense-K path (identification meshes are small; the reference stack has
no harmonic solver or any inverse beyond static NN fitting,
SURVEY §3.2).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fields import Material, ScalarField
from ..models.problem import TrussProblem
from ..ops.assembly import assemble_system
from ..ops.mass import lumped_mass
from .phases import ADAM
from .transient_inverse import (_DAMP_PARAMS, _PARAM_ORDER,
                                _reject_ea_pair, _scalar_value)


@jax.jit
def _frf_amplitudes(k, m, mask, f, om, alpha, beta, probe):
    """(n_freq, n_probe) |X(omega)|, differentiable w.r.t. k, m, alpha,
    beta.  Same real block form as harmonic._direct_sweep_jit (identity
    rows keep the fixed DOFs nonsingular); plain vmap over the sweep —
    identification meshes are small, no chunking needed."""
    n = f.shape[0]

    def solve_one(w):
        a = k - (w * w) * jnp.diag(m) + jnp.diag(1.0 - mask)
        b = w * (alpha * jnp.diag(m) + beta * k)
        z = jnp.block([[a, -b], [b, a]])
        rhs = jnp.concatenate([f, jnp.zeros_like(f)])
        x = jnp.linalg.solve(z, rhs)
        return jnp.hypot(x[:n] * mask, x[n:] * mask)[probe]

    return jax.vmap(solve_one)(om)


def frf_probe_amplitudes(problem: TrussProblem, material: Material,
                         omegas, damping, probe_dofs, data=None):
    """Traced, differentiable |X(omega)| at the probe DOFs (see module
    docstring).  `material` and `damping` may carry traced values."""
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    mask = data.free_mask
    k = assemble_system(data, material,
                        jnp.zeros(problem.ndof, dtype))[0]
    k = mask[:, None] * k * mask[None, :]
    m = lumped_mass(data, material) * mask
    return _frf_amplitudes(
        k, m, mask, data.loads * mask, jnp.asarray(omegas, dtype),
        jnp.asarray(damping[0], dtype), jnp.asarray(damping[1], dtype),
        jnp.asarray(np.asarray(probe_dofs, dtype=int)))


def identify_from_frf(
    problem: TrussProblem,
    measured_amp: np.ndarray,
    omegas,
    probe_dofs,
    params: Sequence[str] = ("young", "density"),
    damping=(0.0, 0.0),
    n_iter: int = 400,
    learning_rate: float = 0.08,
    initial: Dict[str, float] | None = None,
    restarts: int = 1,
    data=None,
) -> Tuple[Dict[str, float], np.ndarray]:
    """Recover scalar parameters from a measured FRF amplitude sweep.

    Args:
        measured_amp: (n_freq, n_probe) measured |X(omega)|.
        params: which of ("young", "area", "density") and/or the
            Rayleigh coefficients ("alpha", "beta") to identify — the
            same contract as identify_from_transient (E and A only as a
            product; a zero damping start needs `initial`).
        damping: fixed Rayleigh (alpha, beta) and the starting guess for
            identified coefficients.
        restarts: FRF fitting is multi-modal — a starting stiffness far
            below the truth can lock onto the WRONG resonance (measured
            here: with mass fixed, starts below ~0.65x the true E
            mode-swap; 0.65x..2x converge).  restarts > 1 reruns the fit
            from geometrically spaced starts (2^linspace(-1, 1, r)
            applied up to stiffness-like params, down to density — the
            direction that actually moves the resonances) and keeps the
            lowest final loss.  Each restart reuses the compiled step.

    Returns:
        (identified dict, loss history array of the best start) — the
        loss is mean squared LOG-amplitude mismatch.
    """
    for p in params:
        if p not in _PARAM_ORDER + _DAMP_PARAMS:
            raise ValueError(f"unknown parameter {p!r}")
    _reject_ea_pair(params)
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    om = jnp.asarray(np.asarray(omegas, dtype=float).reshape(-1), dtype)
    meas = jnp.asarray(np.asarray(measured_amp), dtype)
    if meas.ndim != 2 or meas.shape[0] != om.shape[0]:
        raise ValueError(f"measured_amp must be (n_freq={om.shape[0]}, "
                         f"n_probe) amplitudes, got {meas.shape}")
    # Log-loss floor: 1e-12 of the measured peak keeps exact-zero
    # amplitudes (a probe on a node line) finite without distorting the
    # decades the measurement actually spans.
    floor = 1e-12 * jnp.maximum(jnp.max(meas), 1e-30)

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

    log_p0 = jnp.asarray([np.log(_start(p)) for p in params], dtype)

    def unpack(log_p):
        fields = {}
        damp = [jnp.asarray(damping[0], dtype),
                jnp.asarray(damping[1], dtype)]
        for i, p in enumerate(params):
            if p in _PARAM_ORDER:
                fields[p] = ScalarField(value=jnp.exp(log_p[i]))
            else:
                damp[_DAMP_PARAMS.index(p)] = jnp.exp(log_p[i])
        return base.replace(**fields), tuple(damp)

    def loss_fn(log_p):
        mat, damp = unpack(log_p)
        amp = frf_probe_amplitudes(problem, mat, om, damp, probe_dofs,
                                   data)
        return jnp.mean((jnp.log(amp + floor)
                         - jnp.log(meas + floor)) ** 2)

    @jax.jit
    def gd_step(log_p, opt):
        loss, g = jax.value_and_grad(loss_fn)(log_p)
        d, opt = ADAM.update(g, opt)
        return log_p - learning_rate * d, opt, loss

    # Start-offset direction that MOVES the resonances: +log f on
    # stiffness-like params, -log f on density (a uniform scale of all
    # material params cancels out of the frequencies).
    shift_dir = jnp.asarray(
        [0.0 if p in _DAMP_PARAMS else (-1.0 if p == "density" else 1.0)
         for p in params], dtype)
    factors = (np.exp(np.log(2.0) * np.linspace(-1.0, 1.0, restarts))
               if restarts > 1 else np.ones(1))

    best = None
    for f in factors:
        log_p = log_p0 + jnp.asarray(np.log(f), dtype) * shift_dir
        opt = ADAM.init(log_p0)
        hist = []
        for _ in range(n_iter):
            log_p, opt, loss = gd_step(log_p, opt)
            hist.append(loss)      # device scalar: no per-iteration sync
        # ONE device fetch per start (the transient route's round-trip
        # rule).
        log_p, hist = jax.device_get((log_p, hist))
        if best is None or hist[-1] < best[1][-1]:
            best = (log_p, hist)
    log_p, hist = best
    values = np.exp(np.asarray(log_p, dtype=float))
    return dict(zip(params, values.tolist())), np.asarray(hist,
                                                          dtype=float)
