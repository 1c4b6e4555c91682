#!/usr/bin/env python3
"""Benchmark: example 7-P (hybrid GD->NR, 3 MLP material fields,
preconditioning) — the reference's headline case at ~10.5 s on the
author's CPU (reference README.md:178; BASELINE.md).

Measures the warm wall-clock of the fused on-device solve (median of 5)
after one warmup call that charges/loads the persistent compilation cache.
Prints exactly one JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x}
Correctness is asserted before any number is printed: the solve must
converge and reproduce the analytic displacements u_x = [0, 1, 2, 3].
"""

import json
import sys
import time

import numpy as np

BASELINE_SECONDS = 10.5  # reference example 7-P (README.md:178)


def build_problem():
    from pinn_fem_tpu.io.schema import parse_problem_dict

    spec = {
        "nodes": [
            {"x": 0.0, "y": 0.0, "fixed_x": True, "fixed_y": True},
            {"x": 1.0, "y": 0.0, "fixed_y": True},
            {"x": 2.0, "y": 0.0, "fixed_y": True},
            {"x": 3.0, "y": 0.0, "fixed_y": True},
        ],
        "elements": [[0, 1], [1, 2], [2, 3]],
        "loads": [0, 0, 0, 0, 0, 0, 1.0, 0],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "measured_displacements": {
            "nodes": [1, 2, 3], "ux": [1.0, 2.0, 3.0], "uy": [0.0, 0.0, 0.0],
        },
        "nn_config": {
            "young": {"enabled": True, "hidden_layers": 2,
                      "neurons_per_layer": 20, "input_dim": 3},
            "area": {"enabled": True, "hidden_layers": 2,
                     "neurons_per_layer": 15, "input_dim": 3},
            "density": {"enabled": True, "hidden_layers": 2,
                        "neurons_per_layer": 10, "input_dim": 3},
        },
        "pinn_config": {
            "max_iterations": 5000, "tolerance": 1e-6,
            "learning_rate_u": 0.01, "learning_rate_theta": 0.0005,
            "alpha_physics": 1.0, "alpha_data": 100.0,
            "preconditioning": True,
        },
        "solver_type": "pinn-hybrid",
    }
    return parse_problem_dict(spec)


def run_once():
    from pinn_fem_tpu.solvers.fused import solve_fused

    parsed = build_problem()
    result = solve_fused(
        parsed.problem, parsed.config, parsed.measured_disp, parsed.measured_dofs
    )
    return result


def main():
    import jax

    # Warmup: compiles (or loads from the persistent cache) every program.
    t0 = time.time()
    result = run_once()
    warmup_s = time.time() - t0

    # Correctness gate.
    assert result.converged, "benchmark solve did not converge"
    ux = result.displacements[:, 0]
    err = float(np.max(np.abs(ux - np.array([0.0, 1.0, 2.0, 3.0]))))
    assert err < 5e-3, f"displacement error {err} too large"

    times = []
    for _ in range(5):
        t0 = time.time()
        result = run_once()
        times.append(time.time() - t0)
    median_s = float(np.median(times))

    print(json.dumps({
        "metric": "example7P_hybrid_3nn_time_to_tol",
        "value": round(median_s, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / median_s, 2),
        "extra": {
            "baseline_s": BASELINE_SECONDS,
            "warmup_s": round(warmup_s, 2),
            "times_s": [round(t, 4) for t in times],
            "displacement_err": err,
            "iterations_last_increment": len(result.history),
            "backend": jax.default_backend(),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
