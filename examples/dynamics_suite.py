#!/usr/bin/env python3
"""Dynamics showcase on one structure: modal, transient, harmonic,
random vibration, buckling, seismic base excitation and response
spectrum — the "analysis" capabilities, none of which exist in the
reference (statics-only; density physics-inert, SURVEY §7.3).

A 2D cross-braced tower is (1) modal-analyzed, (2) kicked with a step
load and integrated by both central-difference and Newmark (their tip
histories overlaid), (3) swept over frequency through the first two
resonances (+ the response PSD under white noise), (4) buckled under
axial compression, (5) shaken at the base near resonance
(relative-coordinate time history), (6) checked against the design
response spectrum.  Saves dynamics_suite.png (8 panels).

Run: python examples/dynamics_suite.py  (~1 min on CPU).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from pinn_fem_tpu import (
    Material,
    TrussProblem,
    buckling_analysis,
    harmonic_response,
    modal_analysis,
    solve_transient,
    stable_dt,
)


def tower(n_story=6, width=1.0, story=1.0):
    """Cross-braced 2-column tower, fixed at the base."""
    nodes, elements = [], []
    for s in range(n_story + 1):
        nodes += [[0.0, s * story], [width, s * story]]
    for s in range(n_story):
        a, b = 2 * s, 2 * s + 1
        c, d = 2 * s + 2, 2 * s + 3
        elements += [[a, c], [b, d], [c, d], [a, d], [b, c]]
    elements += [[0, 1]]
    nnode = 2 * (n_story + 1)
    loads = np.zeros(2 * nnode)
    loads[2 * (nnode - 2)] = 0.5          # lateral kick at the top
    loads[2 * (nnode - 1)] = 0.5
    return TrussProblem(
        nodes=np.array(nodes, dtype=float), elements=np.array(elements),
        material=Material(young=500.0, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array([0, 1, 2, 3]), dimension=2)


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = tower()
    tip = p.ndof - 4                      # x-DOF of the top-left node

    # 1) Modal.
    modal = modal_analysis(p, n_modes=4)
    print("natural frequencies (Hz):",
          np.round(modal.frequencies, 4).tolist())

    # 2) Transient: step load, light Rayleigh damping, both integrators.
    dt = stable_dt(p)
    n = 6000
    probe = np.array([tip])
    tr_c = solve_transient(p, dt=dt, n_steps=n, damping=(0.05, 0.0),
                           method="central", record_every=10,
                           probe_dofs=probe)
    tr_n = solve_transient(p, dt=dt, n_steps=n, damping=(0.05, 0.0),
                           method="newmark", record_every=10,
                           probe_dofs=probe)
    print(f"transient: {n} steps (dt={dt:.2e}); "
          f"max tip {tr_c.displacements.max():.4f}")

    # 3) Harmonic sweep through the first resonances.
    w1, w2 = modal.omegas[0], modal.omegas[1]
    om = np.linspace(0.3 * w1, 1.4 * w2, 300)
    har = harmonic_response(p, om, damping=(0.05, 0.001), probe_dofs=probe)

    # 3b) Random vibration: white-noise base load through the FRF.
    from pinn_fem_tpu import random_response

    rnd = random_response(p, 0.01, om, damping=(0.05, 0.001),
                          probe_dofs=probe)
    print(f"random vibration: tip RMS {rnd.rms[0]:.4f}")

    # 5) Seismic: sine base excitation near the first resonance
    # (relative coordinates, f_eff = -M iota a_g), and the design
    # response-spectrum peak for comparison.
    from pinn_fem_tpu import response_spectrum
    from pinn_fem_tpu.solvers.dynamics import base_excitation_force_fn

    w_g = 0.8 * w1
    t_q = dt * np.arange(n)
    a_g = 0.3 * np.sin(w_g * t_q)
    f_quake = base_excitation_force_fn(p, a_g, direction=[1.0, 0.0])
    # Probe the whole left column so the time history yields a peak
    # story profile to compare against the spectrum methods.
    left_x = np.array([2 * (2 * s_) for s_ in range(p.nnode // 2)])
    quake = solve_transient(p, dt=dt, n_steps=n, damping=(0.05, 0.0),
                            method="central", record_every=10,
                            probe_dofs=left_x, force_fn=f_quake)
    spec = response_spectrum(p, 0.3, direction=[1.0, 0.0], n_modes=4,
                             damping_ratio=0.05)
    # (Different loadings: the sine dwells NEAR resonance, so its peak
    # exceeds the broadband design-spectrum value — no contradiction.)
    # 5b) Close the loop: GENERATE the spectrum of the actual record
    # (spectrum_from_history, vectorized SDOF sweep) at the time
    # history's own first-mode damping ratio (alpha-only Rayleigh:
    # zeta_j = alpha / 2 w_j), and combine — the modal-combination peak
    # profile should track the measured time-history envelope.
    from pinn_fem_tpu import spectrum_from_history

    zeta1 = 0.05 / (2.0 * w1)
    spec_gen = response_spectrum(
        p, lambda om_: spectrum_from_history(a_g, dt, om_, zeta1).psa,
        direction=[1.0, 0.0], n_modes=4, combination="cqc",
        damping_ratio=zeta1)
    envelope = np.abs(np.asarray(quake.displacements)).max(axis=0)
    peak_meas = float(envelope[-1])
    peak_gen = float(spec_gen.displacements[tip])
    print(f"base excitation (near-resonant sine): peak relative tip "
          f"{peak_meas:.4f}")
    print(f"generated-spectrum CQC peak tip {peak_gen:.4f} "
          f"({100 * abs(peak_gen - peak_meas) / peak_meas:.1f}% vs the "
          f"measured envelope)")
    print(f"design spectrum (flat Sa=0.3, SRSS): peak tip "
          f"{spec.displacements[tip]:.4f}, "
          f"{100 * spec.mass_fraction:.1f}% modal mass captured")

    # 4) Buckling under axial compression of both columns.
    p_axial = TrussProblem(
        nodes=p.nodes, elements=p.elements, material=p.material,
        loads=_axial_loads(p), fixed_dofs=p.fixed_dofs, dimension=2)
    buck = buckling_analysis(p_axial, n_modes=2)
    print("critical load factors:", np.round(buck.load_factors, 3).tolist())

    fig, axes = plt.subplots(2, 4, figsize=(19, 7))
    ax = axes[0, 0]
    ax.bar(range(1, 5), modal.frequencies, color="C0")
    ax.set_title("Natural frequencies")
    ax.set_xlabel("mode")
    ax.set_ylabel("Hz")

    ax = axes[0, 1]
    ax.plot(tr_c.times, tr_c.displacements[:, 0], "C0-", lw=1,
            label="central")
    ax.plot(tr_n.times, tr_n.displacements[:, 0], "C1--", lw=1,
            label="Newmark")
    ax.set_title("Step response (tip, damped)")
    ax.set_xlabel("t")
    ax.legend()

    ax = axes[1, 0]
    ax.semilogy(har.omegas, har.amplitude[:, 0], "C2-")
    for w in modal.omegas[:2]:
        ax.axvline(w, color="k", ls=":", lw=0.8)
    ax.set_title("Frequency response (tip)")
    ax.set_xlabel("omega (rad/s)")

    ax = axes[0, 2]
    ax.semilogy(rnd.omegas, np.maximum(rnd.psd[:, 0], 1e-18), "C4-")
    ax.set_title(f"Response PSD (tip RMS {rnd.rms[0]:.3f})")
    ax.set_xlabel("omega (rad/s)")
    ax.set_ylabel("S_u")

    ax = axes[1, 2]
    mode1 = modal.shapes[:, 0]
    scale1 = 0.4 / max(np.abs(mode1).max(), 1e-12)
    xym = p.nodes + scale1 * mode1.reshape(-1, 2)
    for i, j in p.elements:
        ax.plot(p.nodes[[i, j], 0], p.nodes[[i, j], 1], "0.85", lw=1)
        ax.plot(xym[[i, j], 0], xym[[i, j], 1], "C0-", lw=1.5)
    ax.set_title(f"Mode 1 ({modal.frequencies[0]:.3f} Hz)")
    ax.set_aspect("equal")

    ax = axes[1, 1]
    scale = 0.4 / max(np.abs(buck.modes[:, 0]).max(), 1e-12)
    xy = p.nodes + scale * buck.modes[:, 0].reshape(-1, 2)
    for i, j in p.elements:
        ax.plot(p.nodes[[i, j], 0], p.nodes[[i, j], 1], "0.8", lw=1)
        ax.plot(xy[[i, j], 0], xy[[i, j], 1], "C3-", lw=1.5)
    ax.set_title(f"Buckling mode 1 (lambda={buck.load_factors[0]:.2f})")
    ax.set_aspect("equal")

    ax = axes[0, 3]
    ax.plot(quake.times, quake.displacements[:, -1], "C5-", lw=0.9)
    ax.set_title(f"Base excitation (a_g sine @ 0.8 w1)")
    ax.set_xlabel("t")
    ax.set_ylabel("tip u relative to ground")

    ax = axes[1, 3]
    # Peak story profile, three ways: the measured time-history
    # envelope, the CQC combination of the spectrum GENERATED from the
    # same record (they must track), and the flat design spectrum.
    heights = [p.nodes[i // 2, 1] for i in left_x]
    ax.plot(envelope, heights, "C5s-", lw=1.2, label="time history")
    ax.plot(spec_gen.displacements[left_x], heights, "C0o--", lw=1.2,
            label="generated-spectrum CQC")
    ax.plot(spec.displacements[left_x], heights, "C6^:", lw=1.0,
            label="flat Sa=0.3 SRSS")
    ax.set_title(f"Peak story profile ({100 * spec.mass_fraction:.0f}%"
                 " mass)")
    ax.set_xlabel("peak |u_x|")
    ax.set_ylabel("height")
    ax.legend(fontsize=8)

    fig.tight_layout()
    out = Path.cwd() / "dynamics_suite.png"
    fig.savefig(out, dpi=120)
    print(f"saved {out}")


def _axial_loads(p):
    loads = np.zeros(p.ndof)
    loads[-1] = -1.0                      # compress the top nodes
    loads[-3] = -1.0
    return loads


if __name__ == "__main__":
    main()
