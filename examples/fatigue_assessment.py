#!/usr/bin/env python3
"""Fatigue assessment of a braced tower under stochastic (wind-like)
loading — the post-processing loop the member-force quantities feed.

Two independent routes to the same damage number:

1. FREQUENCY DOMAIN: random_response gives every member's stress PSD
   S_sigma(omega) = |H_N|^2 S_p / A^2 in one batched FRF sweep;
   spectral_fatigue turns the critical member's PSD into crossing
   rates, the Davenport expected peak, and the Dirlik (rainflow-
   calibrated) Basquin damage rate — all in closed form.
2. TIME DOMAIN (the ground truth): a Gaussian load history synthesized
   from the SAME input PSD drives a transient; the member-force
   history that `probe_elements` now records is rainflow-counted
   (ASTM E1049) and Miner-summed.

The two rates agree to finite-sample scatter — that agreement is the
validation the spectral shortcut rests on (tests/test_fatigue.py pins
it statistically; this demo shows it on a structure).

No counterpart exists in the reference (statics-only, no dynamics, no
member-force statistics).  Run: python examples/fatigue_assessment.py
(~30 s on CPU).  Env knobs for the smoke test: FATIGUE_STEPS.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from pinn_fem_tpu import (
    Material,
    TrussProblem,
    modal_analysis,
    rainflow_cycles,
    rainflow_damage,
    random_response,
    spectral_fatigue,
    synthesize_gaussian_history,
)
from pinn_fem_tpu.io.analysis import run_analysis

SN_EXPONENT = 3.0        # Basquin N S^m = C (welded-detail slope)
SN_COEFFICIENT = 1e8     # chosen so the demo's life is human-readable


def tower(n_story=3, width=1.0, story=1.0):
    """Cross-braced 2-column tower, lateral white-noise load at the top."""
    nodes, elements = [], []
    for s in range(n_story + 1):
        nodes += [[0.0, s * story], [width, s * story]]
    for s in range(n_story):
        a, b = 2 * s, 2 * s + 1
        c, d = 2 * s + 2, 2 * s + 3
        elements += [[a, c], [b, d], [c, d], [a, d], [b, c]]
    nnode = 2 * (n_story + 1)
    loads = np.zeros(2 * nnode)
    loads[2 * (nnode - 2)] = 0.5
    loads[2 * (nnode - 1)] = 0.5
    return TrussProblem(
        nodes=np.asarray(nodes, dtype=float),
        elements=np.asarray(elements, dtype=int),
        material=Material(young=500.0, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array([0, 1, 2, 3]), dimension=2)


def main():
    problem = tower()
    n_steps = int(os.environ.get("FATIGUE_STEPS", 60000))

    # ---- frequency domain: batched FRF sweep -> stress PSDs -> Dirlik
    modal = modal_analysis(problem, n_modes=4)
    w = np.asarray(modal.omegas)
    om = np.concatenate([np.linspace(0.05 * w[0], 2.0 * w[-1], 1200),
                         np.linspace(2.0 * w[-1], 6.0 * w[-1], 300)[1:]])
    s_p = 0.02                                    # white-noise load PSD
    elements = np.arange(problem.nelm)
    rr = random_response(problem, s_p, om, damping=(0.08, 2e-4),
                         probe_dofs=np.array([problem.ndof - 2]),
                         probe_elements=elements)
    # area = 1 -> stress PSD == force PSD
    sf = spectral_fatigue(om, rr.force_psd, SN_EXPONENT, SN_COEFFICIENT,
                          method="dirlik", duration=3600.0)
    crit = int(np.argmax(sf.damage_rate))
    print(f"natural frequencies [Hz]: "
          f"{np.round(w / (2 * np.pi), 3).tolist()}")
    print(f"critical member: e{crit} "
          f"(nodes {problem.elements[crit].tolist()})")
    print(f"  stress RMS           : {sf.rms[crit]:.4f}")
    print(f"  zero-crossing rate   : {sf.nu0[crit]:.4f} Hz "
          f"(irregularity alpha2 = {sf.alpha2[crit]:.3f})")
    print(f"  expected 1 h peak    : {sf.expected_peak[crit]:.4f} "
          f"(Davenport g = {sf.peak_factor[crit]:.2f})")
    print(f"  Dirlik damage rate   : {sf.damage_rate[crit]:.3e} /s "
          f"-> life {sf.life[crit] / 3600.0:.1f} h")

    # ---- time domain: synthesized load -> transient -> rainflow
    dt = 0.01
    t_end = n_steps * dt
    load_hist = synthesize_gaussian_history(om, s_p * np.ones_like(om),
                                            dt, n_steps, seed=11)
    out = run_analysis(problem, {
        "type": "transient", "dt": dt, "n_steps": n_steps,
        "method": "newmark", "damping": [0.08, 2e-4],
        "amplitude": load_hist.tolist(),
        "probe_dofs": [problem.ndof - 2],
        "probe_elements": [crit],
        "include_force_histories": True,     # full-rate record, plotted
        "fatigue": {"sn": {"exponent": SN_EXPONENT,
                           "coefficient": SN_COEFFICIENT}}})
    n_hist = np.asarray(out["force_histories"])[:, 0]
    rf_rate = out["fatigue"]["damage_rate"][0]
    print(f"  rainflow ground truth: {rf_rate:.3e} /s "
          f"({out['fatigue']['cycle_count'][0]:.0f} cycles over "
          f"{t_end:.0f} s)")
    ratio = rf_rate / sf.damage_rate[crit]
    print(f"  time/frequency ratio : {ratio:.2f} "
          f"(finite-sample scatter; -> 1 as T grows)")
    agreement = 0.2 < ratio < 5.0
    print("fatigue cross-validation:", "OK" if agreement else "FAILED")

    # ---- plot
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(2, 2, figsize=(11, 7))
    ax[0, 0].semilogy(om / (2 * np.pi), rr.force_psd[:, crit])
    ax[0, 0].set_title(f"stress PSD, member e{crit}")
    ax[0, 0].set_xlabel("f [Hz]")
    t_plot = np.asarray(out["times"])[:2000]
    ax[0, 1].plot(t_plot, n_hist[:2000], lw=0.5)
    ax[0, 1].set_title("member stress history (first 20 s)")
    ax[0, 1].set_xlabel("t [s]")
    cyc = rainflow_cycles(n_hist)
    ax[1, 0].hist(0.5 * cyc[:, 0], bins=40, weights=cyc[:, 2])
    ax[1, 0].set_title("rainflow amplitude histogram")
    ax[1, 0].set_xlabel("stress amplitude")
    ax[1, 1].bar(np.arange(problem.nelm), sf.life / 3600.0)
    ax[1, 1].set_yscale("log")
    ax[1, 1].set_title("Dirlik fatigue life per member [h]")
    ax[1, 1].set_xlabel("element")
    fig.tight_layout()
    fig.savefig("fatigue_assessment.png", dpi=110)
    print("saved fatigue_assessment.png")


if __name__ == "__main__":
    main()
