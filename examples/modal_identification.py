#!/usr/bin/env python3
"""Identify a spatially-varying DENSITY field from modal measurements —
natural frequencies plus mode-shape amplitudes at a few sensors.

Density is physics-inert in the reference (parsed, never evaluated —
SURVEY §7.3): no static solve can identify it.  The differentiable modal
path (solvers/modal.py: `modal_eigenpairs` reduces K phi = omega^2 M phi
to a standard eigh, which JAX differentiates) finally gives a density MLP
a gradient signal.

A spectrum ALONE under-determines rho(x) — classic Sturm-Liouville
ill-posedness: distinct densities share the first N frequencies, and
training on frequencies only drives the spectral mismatch to ~1e-5 while
rho(x) lands 25-30% off.  Real modal identification therefore also
measures mode SHAPES at sensor locations; here the loss adds phi_j^2 at a
handful of sensor DOFs (squares are sign-invariant — eigenvector sign is
arbitrary — and well defined under M-normalization).  With shape data the
same training run recovers rho(x) to a few percent.

Run: python examples/modal_identification.py  (saves
modal_identification.png; ~1 min on CPU).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pinn_fem_tpu import (
    Material,
    TrussProblem,
    make_mlp_field,
    to_field,
)
from pinn_fem_tpu.solvers.modal import modal_eigenpairs

N_NODES = int(os.environ.get("MODAL_ID_NODES", 21))
N_MODES = int(os.environ.get("MODAL_ID_MODES", 8))
N_ITERS = int(os.environ.get("MODAL_ID_ITERS", 800))
LENGTH = 3.0


def true_density(x):
    """Ground truth: a heavy patch near one third of the bar."""
    return 1.0 + 0.8 * np.exp(-(((x - 1.0) / 0.4) ** 2))


def make_problem(material):
    nodes = np.linspace(0.0, LENGTH, N_NODES)
    elements = np.stack(
        [np.arange(N_NODES - 1), np.arange(1, N_NODES)], axis=1)
    loads = np.zeros(N_NODES)
    return TrussProblem(
        nodes=nodes, elements=elements, material=material, loads=loads,
        fixed_dofs=np.array([0]), dimension=1)


def main():
    # --- synthesize measured frequencies from the true density ---
    x_mid = np.linspace(0.0, LENGTH, N_NODES)
    x_mid = 0.5 * (x_mid[:-1] + x_mid[1:])
    # Piecewise-constant true rho via a fine interpolating MLP would be
    # overkill; instead solve the target spectrum with a per-element
    # ScalarField stand-in: build the problem twice, once per element
    # batch.  Simplest honest route: a tiny custom field.
    class TabulatedDensity:
        """Per-element true density, keyed on the midpoint x column."""
        is_trainable = False

        def eval_batch(self, x):
            # assembly_inputs columns are (load_factor, x); pick x.
            return jnp.asarray(true_density(np.asarray(x[:, 1])))

        def trainable_params(self):
            return []

    truth = Material(young=1.0, area=1.0, density=TabulatedDensity())
    problem_true = make_problem(truth)
    # Sensors: a handful of interior nodes where mode shapes are "measured"
    # (1D problem => DOF index == node index).
    sensors = jnp.asarray(np.linspace(2, N_NODES - 1, 5, dtype=int))
    lam_target, phi_target = modal_eigenpairs(problem_true, n_modes=N_MODES)
    lam_target = jax.lax.stop_gradient(lam_target)
    phi2_target = jax.lax.stop_gradient(phi_target[sensors, :] ** 2)
    print("target omega^2:", np.asarray(lam_target))

    # --- trainable model: MLP density, known E and A ---
    rho_net = make_mlp_field(jax.random.PRNGKey(0), hidden_layers=2,
                             neurons_per_layer=20, input_dim=1, scale=1.0)
    problem = make_problem(Material(young=1.0, area=1.0, density=rho_net))
    data = problem.to_device()
    young = to_field(1.0)
    area = to_field(1.0)

    def loss_fn(net):
        mat = Material(young=young, area=area, density=net)
        lam, phi = modal_eigenpairs(problem, n_modes=N_MODES, data=data,
                                    material=mat)
        spec = jnp.mean(((lam - lam_target) / lam_target) ** 2)
        # Sign-invariant sensor shape data resolves the spectrum-only
        # ill-posedness (see module docstring).
        shape = jnp.mean((phi[sensors, :] ** 2 - phi2_target) ** 2)
        return spec + shape

    opt = optax.adam(2e-2)
    state = opt.init(rho_net)

    @jax.jit
    def step(net, state):
        loss, grad = jax.value_and_grad(loss_fn)(net)
        updates, state = opt.update(grad, state)
        return optax.apply_updates(net, updates), state, loss

    net = rho_net
    for i in range(N_ITERS):
        net, state, loss = step(net, state)
        if i % 50 == 0 or i == N_ITERS - 1:
            print(f"iter {i:4d}  modal loss {float(loss):.3e}")

    # --- compare identified vs true density along the bar ---
    xs = np.linspace(0.0, LENGTH, 200)
    inputs = jnp.stack([jnp.ones_like(jnp.asarray(xs)),
                        jnp.asarray(xs)], axis=1)  # (load_factor, x)
    rho_hat = np.asarray(net.eval_batch(inputs))
    rho_true = true_density(xs)
    err = np.max(np.abs(rho_hat - rho_true) / rho_true)
    print(f"max relative density error: {err:.3f}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(xs, rho_true, "k-", label="true rho(x)")
    ax.plot(xs, rho_hat, "C1--", label="identified (MLP)")
    ax.set_xlabel("x")
    ax.set_ylabel("density")
    ax.set_title(f"Density identified from {N_MODES} natural frequencies")
    ax.legend()
    fig.tight_layout()
    out = Path.cwd() / "modal_identification.png"
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
