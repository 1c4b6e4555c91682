#!/usr/bin/env python3
"""Time-domain PINN identification demo: recover E and DENSITY from one
measured tip-displacement history.

Density never enters a static residual (the reference parses it and never
evaluates it — SURVEY §7.3), so no static PINN can identify it.  Here the
model is the central-difference integrator itself
(solvers/transient_inverse.py): reverse-mode AD through the whole
`lax.scan` time loop (the discrete adjoint) gives exact gradients of the
trajectory mismatch w.r.t. (log E, log rho), and Adam recovers both from
a single noisy probe trajectory.

A third panel goes further: a SPATIALLY-VARYING E(x) profile (the
reference's MLP property parameterization) recovered element-by-element
from four probes' histories (identify_field_from_transient) — the
static NN inverse, driven by dynamics.

Run: python examples/transient_identification.py  (saves
transient_identification.png; ~50 s on CPU).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import os

import jax
import numpy as np

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.models.fields import make_mlp_field, point_inputs_direct
from pinn_fem_tpu.solvers.transient_inverse import (
    identify_field_from_transient, identify_from_transient,
    transient_probe_response, transient_probe_response_elem)

N_ITERS = int(os.environ.get("TRANS_ID_ITERS", 500))
N_FIELD_ITERS = int(os.environ.get("TRANS_ID_FIELD_ITERS", 800))
E_TRUE, RHO_TRUE = 2.5, 1.8
DT, N_STEPS = 0.04, 600
NOISE = float(os.environ.get("TRANS_ID_NOISE", 0.01))  # 1% of peak


def chain(young, density, n_nodes=6):
    nodes = np.arange(n_nodes, dtype=float)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    loads = np.zeros(n_nodes)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=young, area=1.0, density=density),
                        loads, np.array([0]), 1)


def main():
    probe = np.array([3, 5])
    truth = chain(E_TRUE, RHO_TRUE)
    clean = np.asarray(jax.device_get(transient_probe_response(
        truth, truth.material, DT, N_STEPS, np.ones(N_STEPS), probe,
        damping=(0.05, 0.0))))
    rng = np.random.default_rng(0)
    measured = clean + NOISE * np.abs(clean).max() * rng.standard_normal(
        clean.shape)

    guess = chain(1.0, 1.0)
    ident, hist = identify_from_transient(
        guess, measured, DT, N_STEPS, probe, params=("young", "density"),
        damping=(0.05, 0.0), n_iter=N_ITERS, learning_rate=0.1)
    print(f"identified E   = {ident['young']:.4f}  (true {E_TRUE})")
    print(f"identified rho = {ident['density']:.4f}  (true {RHO_TRUE})")
    print(f"final trajectory loss: {hist[-1]:.3e}")
    err_e = abs(ident["young"] - E_TRUE) / E_TRUE
    err_r = abs(ident["density"] - RHO_TRUE) / RHO_TRUE
    print(f"relative errors: E {err_e:.3f}, rho {err_r:.3f}")

    fitted = np.asarray(jax.device_get(transient_probe_response(
        chain(ident["young"], ident["density"]),
        chain(ident["young"], ident["density"]).material,
        DT, N_STEPS, np.ones(N_STEPS), probe, damping=(0.05, 0.0))))

    # --- field mode: a spatially-varying E(x) profile, not a scalar ---
    # The same discrete adjoint trains the reference's NN-property
    # parameterization (MLPField) against the trajectory: a wave
    # sweeping the chain interrogates each element's stiffness, so four
    # probes pin the whole profile.
    n_f = 9
    nodes_f = np.arange(n_f, dtype=float)
    elems_f = np.stack([np.arange(n_f - 1), np.arange(1, n_f)], 1)
    loads_f = np.zeros(n_f)
    loads_f[-1] = 1.0
    mids = 0.5 * (nodes_f[:-1] + nodes_f[1:])
    e_true = 1.0 + mids / mids.max()               # linear 1 -> 2
    probe_f = np.array([2, 4, 6, 8])
    nn = make_mlp_field(jax.random.PRNGKey(0), hidden_layers=1,
                        neurons_per_layer=8, input_dim=1, scale=1.5)
    prob_f = TrussProblem(nodes_f, elems_f,
                          Material(young=nn, area=1.0, density=1.0),
                          loads_f, np.array([0]), 1)
    meas_f = np.asarray(jax.device_get(transient_probe_response_elem(
        prob_f, e_true, 1.0, 1.0, 0.05, 600, np.ones(600), probe_f,
        damping=(0.05, 0.0))))
    trained, hist_f = identify_field_from_transient(
        prob_f, meas_f, 0.05, 600, probe_f, field="young",
        damping=(0.05, 0.0), n_iter=N_FIELD_ITERS, learning_rate=0.05)
    e_fit = np.asarray(trained.eval_batch(
        point_inputs_direct(mids[:, None], 1)))
    err_f = np.max(np.abs(e_fit - e_true) / e_true)
    print(f"field mode: E(x) recovered over {len(mids)} elements, "
          f"max relative error {err_f:.3f}, final loss {hist_f[-1]:.3e}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = DT * np.arange(1, N_STEPS + 1)
    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(15, 4))
    ax1.plot(t, measured[:, 1], ".", ms=2, color="0.6",
             label="measured (noisy)")
    ax1.plot(t, clean[:, 1], "k-", lw=0.8, label="true")
    ax1.plot(t, fitted[:, 1], "C1--", lw=1.2, label="identified model")
    ax1.set_xlabel("t")
    ax1.set_ylabel("tip displacement")
    ax1.set_title(f"E: {ident['young']:.3f}/{E_TRUE}, "
                  f"rho: {ident['density']:.3f}/{RHO_TRUE}")
    ax1.legend()
    ax2.semilogy(hist)
    ax2.set_xlabel("Adam iteration")
    ax2.set_ylabel("trajectory loss")
    ax2.set_title("Identification convergence")
    x_plot = np.linspace(mids[0], mids[-1], 200)
    e_curve = np.asarray(trained.eval_batch(
        point_inputs_direct(x_plot[:, None], 1)))
    ax3.plot(mids, e_true, "ko", ms=5, label="true E per element")
    ax3.plot(x_plot, e_curve, "C1-", lw=1.5, label="identified MLP field")
    ax3.set_xlabel("x")
    ax3.set_ylabel("E(x)")
    ax3.set_title(f"Field mode: max rel err {err_f:.1%}")
    ax3.legend()
    fig.tight_layout()
    out = Path.cwd() / "transient_identification.png"
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
