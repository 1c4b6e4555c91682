#!/usr/bin/env python3
"""TPU benchmark matrix over the FULL problem corpus (18 JSONs).

For every corpus problem this times the real execution path the CLI uses
(solvers.auto.solve_auto — the fused on-device driver on TPU), warm
(median of N after one warmup that charges/loads the persistent compile
cache), gates on correctness, and compares against the reference's
published wall-clock for that example (BASELINE.md, reference
README.md:164-181).

Emits one JSON line per example plus a trailing "corpus_total" line, and
rewrites BENCHMARKS.md with the full table.

Usage:
    python benchmarks/corpus.py [--repeats N] [--out BENCHMARKS.md]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "examples", "json")

# Reference wall-clock baselines (BASELINE.md; reference README.md:164-181).
# status: True = the reference converged; False = it failed (example 6,
# README.md:175,308 — ours is expected to fail the same way).
BASELINES = {
    "example1":   (1.0, True),
    "example1-1": (None, True),   # debug case, no published time
    "example2":   (5.6, True),
    "example2-2": (None, True),   # debug case, no published time
    "example2-P": (3.1, True),
    "example3":   (13.0, True),
    "example3-P": (9.0, True),
    "example4":   (180.0, True),
    "example4-P": (18.0, True),
    "example5":   (0.67, True),
    "example5-P": (2.4, True),
    "example6":   (7.6, False),
    "example6-P": (7.0, True),
    "example7":   (24.2, True),
    "example7-P": (10.5, True),
    "example8":   (0.6, True),
    "example9":   (60.0, True),
    "example10":  (120.0, True),
}

# Physics-only full-NR inverse problems sit on a degenerate (u, theta)
# equilibrium manifold (no measurements pin u) — the analytic u=[0,1,2,3]
# check does not apply; equilibrium convergence is the correctness gate.
ANALYTIC_EXEMPT = {"example9", "example10"}


def run_example(path: str):
    from pinn_fem_tpu.io.schema import parse_problem_file
    from pinn_fem_tpu.solvers.auto import solve_auto

    parsed = parse_problem_file(path)
    result = solve_auto(
        parsed.problem, parsed.config, parsed.measured_disp, parsed.measured_dofs
    )
    return parsed, result


def analytic_error(parsed, result) -> float:
    """Max |u_x - [0,1,2,3]| over the canonical 4-node chain (1D uses all
    DOFs). Debug cases (fewer nodes) compare against the matching prefix of
    the analytic ramp u_x = x."""
    u = np.asarray(result.displacements)
    ux = u[:, 0]
    expected = np.asarray(parsed.problem.nodes).reshape(len(ux), -1)[:, 0]
    return float(np.max(np.abs(ux - expected)))


def bench_one(path: str, repeats: int):
    name = os.path.splitext(os.path.basename(path))[0]
    baseline_s, expect_converged = BASELINES.get(name, (None, True))

    t0 = time.time()
    parsed, result = run_example(path)
    warmup_s = time.time() - t0

    if bool(result.converged) != expect_converged:
        raise AssertionError(
            f"{name}: converged={result.converged}, expected {expect_converged}"
        )
    err = analytic_error(parsed, result)
    if expect_converged and name not in ANALYTIC_EXEMPT and err >= 5e-3:
        raise AssertionError(f"{name}: displacement error {err:.2e} too large")

    times = []
    for _ in range(repeats):
        t0 = time.time()
        _, result = run_example(path)
        times.append(time.time() - t0)
    median_s = float(np.median(times))

    return {
        "metric": f"{name}_time_to_tol",
        "value": round(median_s, 4),
        "unit": "s",
        "vs_baseline": (round(baseline_s / median_s, 1)
                        if baseline_s is not None else None),
        "extra": {
            "baseline_s": baseline_s,
            "warmup_s": round(warmup_s, 2),
            "times_s": [round(t, 4) for t in times],
            "converged": bool(result.converged),
            "displacement_err": err,
            "iterations_last_increment": len(result.history),
        },
    }


def write_markdown(rows, backend: str, out_path: str) -> None:
    lines = [
        "# BENCHMARKS — full-corpus TPU matrix",
        "",
        f"Backend: **{backend}** (one chip). Warm wall-clock of the real CLI "
        "execution path (fused on-device driver), median of repeats after one "
        "cache-charging warmup; `python benchmarks/corpus.py` regenerates "
        "this file. Baselines: the reference's published times "
        "(BASELINE.md; reference README.md:164-181, author's desktop CPU).",
        "",
        "| Example | TPU time (s) | Baseline (s) | Speedup | Converged | max err vs analytic | iters (last inc) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        name = r["metric"].replace("_time_to_tol", "")
        e = r["extra"]
        base = e["baseline_s"]
        speed = f'**{r["vs_baseline"]}x**' if r["vs_baseline"] else "—"
        err = e["displacement_err"]
        err_s = f"{err:.1e}" if name not in ANALYTIC_EXEMPT else f"({err:.1e})*"
        lines.append(
            f'| {name} | {r["value"]:.3f} | {base if base is not None else "—"} '
            f'| {speed} | {"yes" if e["converged"] else "no (matches ref)"} '
            f'| {err_s} | {e["iterations_last_increment"]} |'
        )
    total = sum(r["value"] for r in rows)
    base_total = sum(r["extra"]["baseline_s"] or 0.0 for r in rows)
    lines += [
        "",
        f"**Corpus total: {total:.2f} s vs {base_total:.0f} s baseline "
        f"({base_total / total:.0f}x)** (baseline total counts only the 16 "
        "examples with published times).",
        "",
        "\\* examples 9/10 are physics-only full-NR inverse problems on a "
        "degenerate (u, theta) equilibrium manifold — the analytic ramp does "
        "not pin u; convergence is gated on equilibrium instead.",
        "",
    ]
    # Preserve any hand-maintained content after the scaling marker
    # (the scaling section is produced by benchmarks/scaling.py runs).
    tail = ""
    marker = "<!-- scaling -->"
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = f.read()
        if marker in old:
            tail = old[old.index(marker):]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
        if tail:
            f.write("\n" + tail)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCHMARKS.md"))
    ap.add_argument("--only", default=None,
                    help="comma-separated example names (default: all)")
    args = ap.parse_args()

    # configure() must run before the first backend query: the axon PJRT
    # shim force-overrides jax_platforms at startup and configure()
    # re-applies the JAX_PLATFORMS env var (utils/runtime.py).
    from pinn_fem_tpu.utils.runtime import configure

    configure()
    import jax

    backend = jax.default_backend()
    only = set(args.only.split(",")) if args.only else None

    paths = sorted(
        glob.glob(os.path.join(CORPUS_DIR, "example*.json")),
        key=lambda p: (len(os.path.basename(p)), p),  # 1..10 then -P variants
    )
    rows = []
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        if only and name not in only:
            continue
        row = bench_one(path, args.repeats)
        print(json.dumps(row), flush=True)
        rows.append(row)

    total = sum(r["value"] for r in rows)
    base_total = sum(r["extra"]["baseline_s"] or 0.0 for r in rows)
    print(json.dumps({
        "metric": "corpus_total_time",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(base_total / total, 1) if total else None,
        "extra": {"examples": len(rows), "backend": backend},
    }), flush=True)

    if not only:
        write_markdown(rows, backend, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
