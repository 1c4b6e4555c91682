#!/usr/bin/env python3
"""Digital-twin workflow: identify the material, then design with it.

The framework's two inverse families composed end-to-end, the way a
monitoring-driven retrofit actually runs:

1. MEASURE   — a transient probe history of the real structure (here a
   synthetic truth with a spatial stiffness gradient E(x) rising 2x
   across the span, plus measurement noise).
2. IDENTIFY  — recover E(x) as an MLP field by reverse-mode AD through
   the integrator (identify_field_from_transient — the reference's
   NN-property parameterization driven by dynamics).
3. DESIGN    — displacement-limited minimum-mass sizing
   (optimize_sizing) with the IDENTIFIED field, vs the same design
   from the nominal drawing value E = 1.

Why it matters: a displacement-limited design depends on E directly
(A_e* ~ 1/sqrt(E_e) on a series chain), so designing from the nominal
value wastes the stiffness the structure actually has — the identified
twin recovers that margin while staying feasible ON THE TRUTH.

Run: python examples/twin_workflow.py  (saves twin_workflow.png,
~40 s on CPU).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import os

import jax
import numpy as np

from pinn_fem_tpu import Material, TrussProblem, make_mlp_field
from pinn_fem_tpu.solvers.sizing import _host_area_solve, optimize_sizing
from pinn_fem_tpu.solvers.transient_inverse import (
    identify_field_from_transient, transient_probe_response_elem)

N_ELM = 9
N_ID_ITERS = int(os.environ.get("TWIN_ID_ITERS", 800))
N_SZ_ITERS = int(os.environ.get("TWIN_SZ_ITERS", 300))
DT, N_STEPS = 0.04, 600
NOISE = 0.01


def chain(young_field):
    nodes = np.arange(N_ELM + 1, dtype=float)
    elements = np.stack([np.arange(N_ELM), np.arange(1, N_ELM + 1)], 1)
    loads = np.zeros(N_ELM + 1)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=young_field, area=1.0, density=1.0),
                        loads, np.array([0]), 1)


def main():
    # --- 1. the truth: E(x) rising 1 -> 2 across the span ---
    mids = np.arange(N_ELM) + 0.5
    e_true = 1.0 + mids / N_ELM                       # per element
    probe = np.array([3, 6, N_ELM])                   # three sensors
    p_nominal = chain(1.0)
    clean = np.asarray(jax.device_get(transient_probe_response_elem(
        p_nominal, e_true, 1.0, 1.0, DT, N_STEPS, np.ones(N_STEPS),
        probe, damping=(0.05, 0.0))))
    rng = np.random.default_rng(0)
    measured = clean + NOISE * np.abs(clean).max() * rng.standard_normal(
        clean.shape)

    # --- 2. identify E(x) from the noisy histories ---
    nn = make_mlp_field(jax.random.PRNGKey(0), 1, 8, input_dim=1,
                        scale=1.0)
    e_field, hist = identify_field_from_transient(
        p_nominal, measured, DT, N_STEPS, probe, field="young",
        nn_field=nn, damping=(0.05, 0.0), n_iter=N_ID_ITERS,
        learning_rate=0.05)
    from pinn_fem_tpu.models.fields import point_inputs_dict_order

    e_hat = np.asarray(e_field.eval_batch(
        point_inputs_dict_order(mids.reshape(-1, 1), 1, 1.0)),
        dtype=float)
    err = np.max(np.abs(e_hat - e_true) / e_true)
    print(f"identified E(x): max element error {100 * err:.1f}% "
          f"({len(hist)} iters, final loss {hist[-1]:.2e})")

    # --- 3. displacement-limited minimum mass, three ways ---
    u0, _ = _host_area_solve(p_nominal, np.ones(N_ELM))
    d_lim = abs(u0[-1]) / 2.0               # halve the tip deflection
    designs = {}
    for label, field in (("nominal E=1", 1.0),
                         ("identified E(x)", e_field)):
        res = optimize_sizing(chain(field), objective="mass",
                              displacement_limit=d_lim,
                              probe_dofs=np.array([N_ELM]),
                              min_area=1e-4, n_iter=N_SZ_ITERS,
                              outer_rounds=4, learning_rate=0.08)
        designs[label] = res
        print(f"design with {label:16s}: mass {res.mass:.4f} "
              f"(|u_tip|/limit = {res.max_displacement_ratio:.4f} on "
              f"its own model)")

    # Evaluate both designs ON THE TRUTH (the structure that exists).
    from pinn_fem_tpu.models.fields import ScalarField  # noqa: F401

    def tip_on_truth(areas):
        # Host solve with per-element E_true AND the design areas: build
        # the response from the elem truth model's static limit.
        from pinn_fem_tpu.ops.host import (_geometry, _scatter_blocks,
                                           host_masks)

        p = p_nominal
        dof_map, gvec, inv_len, _ = _geometry(p)
        s = e_true * areas * inv_len
        ke = s[:, None, None] * gvec[:, :, None] * gvec[:, None, :]
        k = _scatter_blocks(p, ke)
        mask = host_masks(p)
        km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
        u = np.linalg.solve(km, p.loads * mask) * mask
        return abs(u[-1])

    print(f"displacement limit: {d_lim:.4f}")
    for label, res in designs.items():
        u_truth = tip_on_truth(res.areas)
        print(f"  {label:16s} on the TRUTH: tip {u_truth:.4f} "
              f"({u_truth / d_lim:.3f}x limit), mass {res.mass:.4f}")
    saved = 1.0 - designs["identified E(x)"].mass / designs[
        "nominal E=1"].mass
    print(f"identification recovers {100 * saved:.1f}% of the mass the "
          f"nominal design wastes")

    # --- plot ---
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(14, 3.8))
    ax1.plot(mids, e_true, "ko-", label="truth")
    ax1.plot(mids, e_hat, "C0s--", label="identified MLP")
    ax1.set_title("E(x) from transient probes")
    ax1.set_xlabel("x"), ax1.legend()
    idx = np.arange(N_ELM)
    w = 0.38
    ax2.bar(idx - w / 2, designs["nominal E=1"].areas, w,
            label="nominal design")
    ax2.bar(idx + w / 2, designs["identified E(x)"].areas, w,
            label="identified design")
    ax2.set_title("displacement-limited areas")
    ax2.set_xlabel("member"), ax2.legend()
    ax3.bar(["nominal", "identified"],
            [designs["nominal E=1"].mass,
             designs["identified E(x)"].mass],
            color=["C0", "C1"])
    ax3.set_title(f"design mass ({100 * saved:.1f}% recovered)")
    fig.tight_layout()
    fig.savefig("twin_workflow.png", dpi=110)
    print("saved twin_workflow.png")


if __name__ == "__main__":
    main()
