#!/usr/bin/env python3
"""Reliability assessment of the classic 10-bar cantilever — the
assessment-side inverse the sizing family's designs feed into.

The question a design code actually encodes is probabilistic: given
scatter in stiffness (lognormal E, 5%), load (normal scale, 25%) and
member resistance (lognormal, 10% around 1.6), how likely is ANY
member of this design to fail?  Three views of the answer:

1. FORM: every member's most-probable-failure point found by the
   vmapped HL-RF fixpoint with exact AD limit-state gradients through
   the static solve — β per member, p_f = Φ(−β), α sensitivities
   (which variable drives each failure mode), and the series-system
   bounds.
2. Crude Monte Carlo on the SAME traced response (chunk-vmapped
   batched dense solves) — the ground truth FORM approximates.
3. The α-correlation matrix — how far apart the failure modes are
   (ρ ≈ 1 means one mode dominates the system probability).

No counterpart exists in the reference (deterministic statics only).
Run: python examples/reliability_assessment.py (~20 s on CPU).
Env knobs for the smoke test: RELIAB_MC (sample count).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from pinn_fem_tpu import Material, TrussProblem, form_reliability


def ten_bar():
    """The classic 10-bar cantilever (the sizing family's benchmark
    structure, examples/json/dyn-sizing.json geometry)."""
    nodes = np.array([[0.0, 1.0], [1.0, 1.0], [2.0, 1.0],
                      [0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    elements = np.array([[0, 1], [1, 2], [3, 4], [4, 5], [1, 4],
                         [2, 5], [0, 4], [1, 3], [1, 5], [2, 4]])
    loads = np.zeros(12)
    loads[7] = -1.0          # node 3... tip loads on the lower chord
    loads[9] = -1.0
    return TrussProblem(nodes, elements,
                        Material(young=10.0, area=1.0, density=1.0),
                        loads, np.array([0, 1, 6, 7]), 2)


def main():
    problem = ten_bar()
    n_mc = int(os.environ.get("RELIAB_MC", 40000))

    res = form_reliability(
        problem,
        variables=[
            {"name": "E", "kind": "young", "distribution": "lognormal",
             "mean": 10.0, "cov": 0.05},
            {"name": "S", "kind": "load_scale",
             "distribution": "normal", "mean": 1.0, "std": 0.25},
            {"name": "R", "kind": "resistance",
             "distribution": "lognormal", "mean": 1.6, "cov": 0.1}],
        limit_state={"type": "stress", "variable": "R"},
        mc_samples=n_mc, mc_seed=1)

    order = np.argsort(res.beta)
    print("FORM reliability, 10-bar cantilever "
          f"({len(res.labels)} stress limit states):")
    print(f"  {'limit state':<14} {'beta':>8} {'pf':>12} "
          f"{'alpha_E':>8} {'alpha_S':>8} {'alpha_R':>8}")
    for i in order[:5]:
        print(f"  {res.labels[i]:<14} {res.beta[i]:>8.3f} "
              f"{res.pf[i]:>12.3e} {res.alpha[i, 0]:>8.3f} "
              f"{res.alpha[i, 1]:>8.3f} {res.alpha[i, 2]:>8.3f}")
    crit = int(np.argmin(res.beta))
    print(f"  critical: {res.labels[crit]} — load scatter carries "
          f"{100 * res.alpha[crit, 1] ** 2:.0f}% of its failure "
          f"direction")
    lo, hi = res.system_pf_lower, res.system_pf_upper
    print(f"  series-system pf in [{lo:.3e}, {hi:.3e}]")
    print(f"  Monte Carlo ({res.mc_n} samples): pf = {res.mc_pf:.3e} "
          f"+/- {res.mc_std_error:.1e}")
    agree = res.mc_pf <= 1.5 * hi + 3 * res.mc_std_error \
        and res.mc_pf >= 0.5 * lo - 3 * res.mc_std_error
    print("FORM/MC cross-validation:", "OK" if agree else "FAILED")

    # ---- the redesign: RBDO to beta >= 3 everywhere (PMA/AMV inner
    # loop; the achieved betas below are the full HL-RF recompute).
    from pinn_fem_tpu import optimize_sizing

    n_rbdo = int(os.environ.get("RELIAB_RBDO_ITERS", 150))
    des = optimize_sizing(
        problem,
        reliability={
            "variables": [
                {"name": "E", "kind": "young",
                 "distribution": "lognormal", "mean": 10.0,
                 "cov": 0.05},
                {"name": "S", "kind": "load_scale",
                 "distribution": "normal", "mean": 1.0, "std": 0.25},
                {"name": "R", "kind": "resistance",
                 "distribution": "lognormal", "mean": 1.6,
                 "cov": 0.1}],
            "target_beta": 3.0,
            "limit_state": {"type": "stress", "variable": "R"}},
        min_area=0.01, n_iter=n_rbdo, outer_rounds=3,
        learning_rate=0.05)
    print(f"RBDO redesign to beta >= 3: mass {des.mass_initial:.2f} -> "
          f"{des.mass:.2f}, achieved min beta "
          f"{des.min_reliability_beta:.4f}")
    ok = des.min_reliability_beta >= 3.0 * (1.0 - 1e-3)
    print("RBDO floor check:", "OK" if ok else "FAILED")

    # ---- plot
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 3, figsize=(13, 4))
    ax[0].bar(np.arange(len(res.beta)), np.minimum(res.beta, 15.0))
    ax[0].axhline(res.beta[crit], color="r", ls="--", lw=0.8)
    ax[0].set_title("β per member (capped at 15)")
    ax[0].set_xlabel("element")
    ax[1].imshow(res.alpha, aspect="auto", cmap="RdBu", vmin=-1, vmax=1)
    ax[1].set_xticks(range(len(res.variables)),
                     labels=res.variables)
    ax[1].set_title("α direction cosines")
    ax[1].set_ylabel("limit state")
    im = ax[2].imshow(res.alpha_correlation, cmap="viridis",
                      vmin=0, vmax=1)
    ax[2].set_title("failure-mode correlation α·αᵀ")
    fig.colorbar(im, ax=ax[2])
    fig.tight_layout()
    fig.savefig("reliability_assessment.png", dpi=110)
    print("saved reliability_assessment.png")


if __name__ == "__main__":
    main()
