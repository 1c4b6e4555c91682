#!/usr/bin/env python3
"""Headline benchmark: the ENTIRE 18-problem reference corpus, timed warm
through the real execution path (fused on-device driver) on one TPU chip,
against the sum of the reference's published per-example times
(BASELINE.md; reference README.md:164-181 — ~463 s on the author's CPU).

Every example is correctness-gated before timing (convergence status must
match the reference's documented outcome; converged displacement error
< 5e-3 against the analytic solution where it applies).  The original
round-1 headline (example 7-P vs ~10.5 s, target >= 5x) is carried in
`extra` alongside the per-example breakdown.

Prints exactly one JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x, ...}
"""

import json
import sys
import time


def main() -> int:
    from benchmarks.corpus import CORPUS_DIR, bench_one

    # configure() before the first backend query (axon platform stomping).
    from pinn_fem_tpu.utils.runtime import configure

    configure()
    import glob
    import os

    import jax

    t_start = time.time()
    rows = []
    for path in sorted(glob.glob(os.path.join(CORPUS_DIR, "example*.json"))):
        rows.append(bench_one(path, repeats=5))
    wall_s = time.time() - t_start

    # Dynamics headline: marginal explicit-transient step cost at 2M DOFs
    # (differential t(N) - t(N/10), so fixed per-call cost cancels).
    dyn_extra = {}
    try:
        import numpy as np

        from benchmarks.scaling import chain_problem
        from pinn_fem_tpu.solvers.dynamics import solve_transient, stable_dt

        p = chain_problem(1_000_001)
        data = p.to_device()
        dt = stable_dt(p, data)
        n_long, n_short = 4000, 400

        def run(n):
            return solve_transient(
                p, dt=dt, n_steps=n, method="central", record_every=n,
                probe_dofs=np.array([p.ndof - 2]), data=data,
                fetch_state=False).displacements

        run(n_long)
        run(n_short)  # compile both

        def med(n):
            ts = []
            for _ in range(3):
                t0 = time.time()
                run(n)
                ts.append(time.time() - t0)
            return float(np.median(ts))

        t_step = (med(n_long) - med(n_short)) / (n_long - n_short)
        dyn_extra = {
            "transient_step_ms_2M_dofs": round(t_step * 1e3, 4),
            "transient_steps_per_s": round(1.0 / t_step),
        }
    except Exception as e:  # the corpus metric must never be lost to this
        dyn_extra = {"transient_bench_error": str(e)[:200]}

    total = sum(r["value"] for r in rows)
    base_total = sum(r["extra"]["baseline_s"] or 0.0 for r in rows)
    per_example = {
        r["metric"].replace("_time_to_tol", ""): {
            "s": r["value"], "vs_baseline": r["vs_baseline"],
        }
        for r in rows
    }
    sevenp = per_example.get("example7-P", {})

    print(json.dumps({
        "metric": "corpus18_total_time_to_tol",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(base_total / total, 1),
        "extra": {
            "baseline_total_s": round(base_total, 1),
            "examples": len(rows),
            "all_correctness_gated": True,
            "example7P_s": sevenp.get("s"),
            "example7P_vs_baseline": sevenp.get("vs_baseline"),
            "min_vs_baseline": min(
                r["vs_baseline"] for r in rows if r["vs_baseline"]
            ),
            "per_example": per_example,
            "bench_wall_s": round(wall_s, 1),
            "backend": jax.default_backend(),
            **dyn_extra,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
