#!/usr/bin/env python3
"""User-facing wall-clock for the dynamics/analysis JSON corpus
(round-3 VERDICT #6: the committed record must show what a
`dyn-*.json` CLI run costs on the chip, not just op microbenchmarks).

Two numbers per problem, both correctness-gated:

  * fresh-process: `python -m pinn_fem_tpu.cli.generic dyn-X.json`
    in a NEW interpreter — the number a CLI user experiences, including
    import + runtime attach + (host-tier: zero) compiles;
  * warm in-process: median run_analysis() latency in a live server —
    the number an HTTP user experiences after the first request.

The small-problem analysis family runs on the HOST tier (ops/host.py),
so both numbers stay in seconds/milliseconds even on a cold XLA cache —
the round-2 failure mode (60 s HTTP timeouts on a 6-node modal) is
structurally gone.  Appends a section to BENCHMARKS.md under the
`<!-- dyn -->` marker.

Usage: python benchmarks/dyn_corpus.py [--repeats N] [--out BENCHMARKS.md]
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CORPUS_DIR = os.path.join(ROOT, "examples", "json")


def _gate(name: str, res: dict) -> None:
    assert res.get("success"), f"{name}: success=False"
    kind = res["analysis"]
    if res.get("element_type") == "shell":
        if kind == "plastic":
            # Combined membrane+bending at n = 0.5 ramped to the
            # interaction capacity m = 1 - n^2: recovered N exactly
            # 0.5*sigma_y*t, EPP fiber vM pinned at sigma_y
            # (tests/test_dyn_corpus.py pins the same gates).
            nf = np.asarray(res["final"]["membrane_forces"])
            np.testing.assert_allclose(nf[:, 0], 15.0, rtol=1e-9)
            np.testing.assert_allclose(max(res["max_von_mises"]),
                                       300.0, rtol=1e-9)
            assert res["n_plastic"][-1] == 4, name
            return
        if kind == "continuation":
            # Half-sine arch snap-through: pre-snap limit on the
            # exact single-mode cubic, both folds traversed
            # (tests/test_dyn_corpus.py pins the same gates).
            ee, tt, ll = 0.15, 0.1, 4.0
            dd = 200e3 * tt**3 / 12.0
            kk = np.pi / ll
            aa = np.linspace(-ee, 0.0, 200001)
            lim = (-(dd * kk**4 * aa + 200e3 * tt * kk**4
                     * (ee * aa / 2.0 + aa**2 / 4.0)
                     * (ee + aa))).max()
            lam = np.asarray(res["load_factors"])
            a_fe = np.asarray(res["displacements"])[:, 2]
            np.testing.assert_allclose(lam[a_fe > -ee].max(), lim,
                                       rtol=1e-2)
            assert lam.min() < -0.5 and a_fe.min() < -2.0 * ee, name
            return
        # Scordelis-Lo midside deflection at the measured 16x16 value
        # (tests/test_dyn_corpus.py pins the same number).
        np.testing.assert_allclose(res["probe_displacements"][2],
                                   -0.29514, rtol=1e-3)
        return
    if res.get("element_type") == "frame3d":
        # Grillage closed form (tests/test_dyn_corpus.py pins the
        # same exact value).
        if kind == "static":
            np.testing.assert_allclose(
                res["displacements"][14],
                -(3.0 ** 3 / (3 * 200.0 * 0.02)
                  + 2.0 ** 3 / (3 * 200.0 * 0.02)
                  + 2.0 ** 2 * 3.0 / (80.0 * 0.03)), rtol=1e-12)
        else:
            assert np.isfinite(np.asarray(
                res.get("frequencies_hz",
                        res.get("displacements", [0.0])),
                dtype=float)).all(), name
        return
    if res.get("element_type") == "frame":
        if kind == "modal":
            f = np.asarray(res["frequencies_hz"], dtype=float)
            assert np.isfinite(f).all() and np.all(np.diff(f) >= -1e-9)
        elif kind == "buckling":
            assert all(np.isfinite(res["load_factors"])), name
        elif kind == "harmonic":
            assert np.isfinite(np.asarray(res["amplitude"],
                                          dtype=float)).all(), name
        elif kind == "identification":
            # Tapered-I twin recovery to 1% (tests/test_dyn_corpus.py
            # pins the same bound).
            assert res["synthetic"] and res["max_rel_error"] < 1e-2, \
                name
        else:
            assert np.isfinite(np.asarray(res["displacements"],
                                          dtype=float)).all(), name
        return
    if res.get("plastic") and kind == "transient":
        # Continuum elastoplastic transient: the exact residual
        # closed form alpha = (sigma_peak - sigma_y)/H = 0.2
        # (the committed doc descriptions; test_dyn_corpus pins it).
        ep = np.asarray(res["final"]["eq_plastic_strain"], dtype=float)
        assert np.allclose(ep, 0.2, rtol=1e-2), name
        tip = 0.8 if res.get("element_type") == "plane" else 0.4
        u = np.abs(np.asarray(res["final"]["displacements"])).max()
        assert abs(u - tip) < 1e-2 * tip, name
        return
    if res.get("element_type") == "plane":
        if kind == "modal":
            f = np.asarray(res["frequencies_hz"], dtype=float)
            assert np.isfinite(f).all() and np.all(f > 0), name
        elif kind == "identification":
            # Two-zone banded twin recovery to 0.5% (round-4 VERDICT
            # #5; tests/test_dyn_corpus.py pins the same bound).
            assert res["method"] == "banded", name
            assert max(res["zone_rel_error"]) < 5e-3, name
        elif kind == "sizing":
            # Uniaxial strip: EXACT t* = 1/sigma_allow = 0.5,
            # weight 2.0.  rtol 1e-4 here vs the CPU suite's 2e-6
            # (tests/test_dyn_corpus.py): the REAL-TPU traced ADAM
            # polish lands ~8e-6 off (measured) — same anchor,
            # f32-device arithmetic.
            np.testing.assert_allclose(res["thickness"], 0.5,
                                       rtol=1e-4)
            np.testing.assert_allclose(res["weight"], 2.0, rtol=1e-4)
        elif kind == "reliability":
            # Determinate strip: the closed-form lognormal R-S index
            # (tests/test_dyn_corpus.py pins the same formula).
            zr = np.sqrt(np.log1p(0.15**2))
            zs = np.sqrt(np.log1p(0.2**2))
            b = np.log((2.0 / np.sqrt(1.0225))
                       / (1.0 / np.sqrt(1.04))) \
                / np.sqrt(zr**2 + zs**2)
            np.testing.assert_allclose(res["beta_min"], b, rtol=1e-4)
        else:
            assert np.isfinite(np.asarray(res["displacements"],
                                          dtype=float)).all(), name
        return
    if res.get("element_type") == "plate":
        if kind == "identification":
            # Slab damage localization through the banded adjoint
            # (tests/test_dyn_corpus.py pins the same bounds).
            assert res["method"] == "banded", name
            np.testing.assert_allclose(res["zone_young"],
                                       [1.2e11, 2.4e11], rtol=2e-3)
        elif kind == "plastic":
            # One-way slab strip toward 8 Mp/L^2: EPP fiber vM
            # pinned at sigma_y (tests/test_dyn_corpus.py).
            np.testing.assert_allclose(max(res["max_von_mises"]),
                                       300.0, rtol=1e-9)
            assert res["n_plastic"][-1] >= 4, name
        else:
            # Mindlin SRI static: center deflection finite and the
            # payload fields the UI consumes present.
            assert np.isfinite(res["max_deflection"]), name
            assert np.isfinite(np.asarray(res["moments"],
                                          dtype=float)).all(), name
        return
    if res.get("element_type") == "solid":
        if kind == "plastic":
            # 3D J2 uniaxial bilinear anchor: exact endpoint tip
            # displacement L (sigma/E + (sigma - sigma_y)/H) = 0.065.
            u = np.abs(np.asarray(res["displacements"][-1],
                                  dtype=float))
            assert abs(u.max() - 0.065) < 1e-8, name
            assert len(res["yielded_elements"]) == 24, name
            return
        # Uniaxial hex8 column through the banded device tier: the
        # EXACT closed form u_z = sigma L / E, von Mises = sigma.
        assert res["method"] == "banded", name
        assert abs(res["max_displacement"] - 0.1) < 1e-4, name
        assert abs(res["max_von_mises"] - 5.0) < 1e-2, name
        return
    if kind == "modal":
        assert res["ok"], f"{name}: modal ok=False"
        assert all(np.isfinite(res["frequencies_hz"])), name
        assert min(res["eigenvalues"]) >= 0, name
    elif kind == "transient":
        d = np.asarray(res["displacements"], dtype=float)
        assert np.isfinite(d).all(), name
        e = (np.asarray(res["kinetic_energy"])
             + np.asarray(res["strain_energy"]))
        assert np.isfinite(e).all(), name
    elif kind == "buckling":
        lams = [v for v in res["load_factors"] if v is not None]
        assert all(np.isfinite(lams)), name
    elif kind in ("harmonic", "random"):
        key = "amplitude" if kind == "harmonic" else "psd"
        assert np.isfinite(np.asarray(res[key], dtype=float)).all(), name
    elif kind == "spectrum":
        assert np.isfinite(np.asarray(res["displacements"])).all(), name
        assert 0.0 < res["mass_fraction"] <= 1.0 + 1e-6, name
    elif kind == "continuation":
        assert res["n_points"] > 0, name
    elif kind == "reduction":
        assert all(np.isfinite(res["reduced_frequencies_hz"])), name
    elif kind == "identification":
        # Twin-data recovery, whatever the mode/domain: the identified
        # values must land on the committed truths.
        if res.get("mode") == "field":
            assert res["field_max_rel_error"] < 0.06, name
        else:
            assert res["synthetic"] is True, name
            assert max(res["relative_errors"].values()) < 0.05, name
        hist = np.asarray(res["loss_history"], dtype=float)
        assert hist[-1] < 1e-2 * hist[0]
    elif kind == "sizing":
        assert res["converged"], name
        if "max_stress_ratio" in res:
            assert res["max_stress_ratio"] <= 1.0 + 1e-6, name
        if "min_fatigue_life_s" in res:           # fatigue-floor sizing
            assert res["min_fatigue_life_s"] >= \
                res["fatigue_min_life_s"] * (1.0 - 1e-3), name
        if "min_reliability_beta" in res:         # RBDO
            assert res["min_reliability_beta"] >= \
                res["target_beta"] * (1.0 - 1e-3), name
        assert res["mass"] < res["mass_initial"], name
        assert np.isfinite(np.asarray(res["areas"], dtype=float)).all(), \
            name
    elif kind == "reliability":
        assert all(res["converged"]), name
        assert res["beta_min"] > 0, name
        lo, hi = res["system_pf_bounds"]
        assert 0 <= lo <= hi <= 1, name
        if "mc" in res:
            assert 0 <= res["mc"]["pf"] <= 1, name
    elif kind == "plastic":
        d = np.asarray(res["displacements"], dtype=float)
        assert np.isfinite(d).all(), name
        assert len(res["yielded_elements"]) > 0, name


def bench_fresh(path: str, env):
    """Fresh-process CLI wall-clock (what a user types) — from a temp
    copy so .res.json/.log outputs never pollute the corpus dir.

    MUST run before the parent initializes JAX: the attachment exposes
    ONE chip, and a parent holding it deadlocks every child (measured —
    the child blocks in attach indefinitely)."""
    import shutil
    import tempfile

    name = os.path.splitext(os.path.basename(path))[0]
    with tempfile.TemporaryDirectory() as td:
        run_path = os.path.join(td, os.path.basename(path))
        shutil.copy(path, run_path)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pinn_fem_tpu.cli.generic", run_path],
            capture_output=True, text=True, timeout=900, cwd=ROOT, env=env)
        fresh_s = time.time() - t0
        assert proc.returncode == 0, f"{name}: {proc.stdout}\n{proc.stderr}"
        with open(os.path.splitext(run_path)[0] + ".res.json") as f:
            res = json.load(f)
    _gate(name, res)
    return fresh_s, res


def bench_warm(path: str, repeats: int):
    """Warm in-process latency (what an HTTP client sees after the
    first request)."""
    from pinn_fem_tpu.io.analysis import run_analysis
    from pinn_fem_tpu.io.schema import parse_problem_file

    name = os.path.splitext(os.path.basename(path))[0]
    with open(path) as f:
        raw = json.load(f)
    if raw.get("element_type") == "frame":
        from pinn_fem_tpu.io.frame_io import (parse_frame_document,
                                              run_frame_analysis)

        problem, analysis = parse_frame_document(raw)

        def once():
            # Parse once outside the timed loop — the truss path's
            # convention, so warm numbers compare like for like.
            return run_frame_analysis(problem, dict(analysis))
    elif raw.get("element_type") == "plane":
        from pinn_fem_tpu.io.plane_io import (parse_plane_document,
                                              run_plane_analysis)

        problem, analysis = parse_plane_document(raw)

        def once():
            return run_plane_analysis(problem, dict(analysis))
    elif raw.get("element_type") == "solid":
        from pinn_fem_tpu.io.solid_io import (parse_solid_document,
                                              run_solid_analysis)

        problem, analysis = parse_solid_document(raw)

        def once():
            return run_solid_analysis(problem, dict(analysis))
    elif raw.get("element_type") == "frame3d":
        from pinn_fem_tpu.io.frame3d_io import (
            parse_frame3d_document, run_frame3d_analysis)

        problem, analysis = parse_frame3d_document(raw)

        def once():
            return run_frame3d_analysis(problem, dict(analysis))
    elif raw.get("element_type") == "plate":
        from pinn_fem_tpu.io.plate_io import (parse_plate_document,
                                              run_plate_analysis)

        problem, analysis = parse_plate_document(raw)

        def once():
            return run_plate_analysis(problem, dict(analysis))
    elif raw.get("element_type") == "shell":
        from pinn_fem_tpu.io.shell_io import (parse_shell_document,
                                              run_shell_analysis)

        problem, analysis = parse_shell_document(raw)

        def once():
            return run_shell_analysis(problem, dict(analysis))
    else:
        parsed = parse_problem_file(path)
        analysis = raw["analysis"]

        def once():
            return run_analysis(parsed.problem, dict(analysis))
    once()                                            # charge caches
    times = []
    t0 = time.time()
    out = once()
    times.append(time.time() - t0)
    # Long optimization loops (identification ADAM runs measure in
    # tens of seconds) get ONE warm sample — the latency is loop-
    # dominated and stable, and 4x70 s would dominate the whole
    # regeneration budget.
    if times[0] < 5.0:
        for _ in range(repeats - 1):
            t0 = time.time()
            out = once()
            times.append(time.time() - t0)
    _gate(name, out)
    return float(np.median(times)), times


def write_markdown(rows, backend: str, out_path: str) -> None:
    marker = "<!-- dyn -->"
    end_marker = "<!-- /dyn -->"
    lines = [
        marker,
        "",
        "## Dynamics corpus — user-facing wall-clock",
        "",
        f"Backend: **{backend}**. `fresh-process` is the full "
        "`python -m pinn_fem_tpu.cli.generic dyn-X.json` wall-clock in a "
        "NEW interpreter (imports + runtime attach included); "
        "`warm in-process` is the median run_analysis() latency in a "
        "live server.  All runs correctness-gated.  The small-problem "
        "analysis family executes on the HOST tier (ops/host.py) — zero "
        "device programs, so cold latency is import-bound, not "
        "compile-bound (the round-2 60 s-timeout failure mode is "
        "structurally gone).  The DEVICE-tier entry (dyn-solid at "
        "6,075 DOFs > DENSE_DOF_LIMIT) pays the runtime attach in its "
        "fresh number by design — the honest cost of a large-mesh run "
        "on this box, amortized away in the warm column; "
        "dyn-plane-identify runs its banded-adjoint ADAM loop on the "
        "pinned local-CPU tier like the rest of the identification "
        "family.  `python benchmarks/dyn_corpus.py` "
        "regenerates this section.  The reference has no dynamics tier "
        "to compare against (SURVEY §7.3).",
        "",
        "| Problem | Analysis | fresh-process CLI (s) | warm in-process (s) |",
        "|---|---|---|---|",
    ]
    for r in rows:
        name = r["metric"].replace("_cli_wall", "")
        e = r["extra"]
        lines.append(f'| {name} | {e["analysis"]} | {r["value"]:.2f} '
                     f'| {e["warm_inprocess_s"]:.4f} |')
    lines.append("")
    lines.append(end_marker)

    old = ""
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = f.read()
    if marker in old:
        head, _, tail = old.partition(marker)
        # Replace ONLY our own section: cut the tail at the closing
        # marker (hand-written evidence sections after it survive; a
        # previous version cut at the next "<!-- " and silently ate
        # everything to EOF when none followed).
        if end_marker in tail:
            tail = tail.partition(end_marker)[2]
        else:
            rest = tail.split("<!-- ", 1)
            tail = ("<!-- " + rest[1]) if len(rest) > 1 else ""
        new = head + "\n".join(lines) + tail
    else:
        new = old + ("\n" if old and not old.endswith("\n") else "") \
            + "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(new)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCHMARKS.md"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("PYTHONPATH", ROOT)
    only = set(args.only.split(",")) if args.only else None
    paths = [p for p in sorted(glob.glob(os.path.join(CORPUS_DIR,
                                                      "dyn-*.json")))
             if ".res." not in p
             and (not only
                  or os.path.splitext(os.path.basename(p))[0] in only)]

    # Phase 1: every fresh-process run BEFORE the parent touches JAX
    # (single-chip attachment — see bench_fresh).  Failures are
    # contained per problem so one wedged attachment doesn't erase the
    # whole matrix.
    fresh = {}
    for p in paths:
        nm = os.path.splitext(os.path.basename(p))[0]
        try:
            fresh[p] = bench_fresh(p, env)
            print(json.dumps({"phase1": nm,
                              "fresh_s": round(fresh[p][0], 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"phase1": nm, "error": str(e)[:300]}),
                  flush=True)
    paths = [p for p in paths if p in fresh]

    # Phase 2: warm in-process latencies (parent attaches now).
    from pinn_fem_tpu.utils.runtime import configure

    configure()
    import jax

    backend = jax.default_backend()
    rows = []
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        fresh_s, res = fresh[path]
        try:
            warm_s, times = bench_warm(path, args.repeats)
        except Exception as e:
            # Containment (the phase-1 doctrine): one failing doc
            # must not erase the whole table.
            print(json.dumps({"phase2": name,
                              "error": str(e)[:300]}), flush=True)
            continue
        row = {
            "metric": f"{name}_cli_wall",
            "value": round(fresh_s, 3),
            "unit": "s",
            "vs_baseline": None,  # the reference has no dynamics at all
            "extra": {
                "analysis": res["analysis"],
                "warm_inprocess_s": round(warm_s, 4),
                "times_s": [round(t, 4) for t in times],
            },
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    if not only:
        write_markdown(rows, backend, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
