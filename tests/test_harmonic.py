"""Harmonic response (solvers/harmonic.py) vs closed forms.

SDOF closed form: a 2-node bar (one free axial DOF) is k = EA/L with
lumped mass m = rho A L / 2 and Rayleigh damping c = alpha m + beta k:
|X| = F / sqrt((k - m w^2)^2 + (c w)^2), phase = -atan2(c w, k - m w^2).
"""

import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.harmonic import harmonic_response
from pinn_fem_tpu.solvers.modal import modal_analysis


def sdof_bar(young=4.0, area=1.0, density=2.0):
    nodes = np.array([0.0, 1.0])
    return TrussProblem(
        nodes=nodes, elements=np.array([[0, 1]]),
        material=Material(young=young, area=area, density=density),
        loads=np.array([0.0, 1.0]), fixed_dofs=np.array([0]), dimension=1)


def chain(n_elm=6):
    n = n_elm + 1
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(n)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=3.0, area=0.7, density=2.0),
                        loads, np.array([0]), 1)


@pytest.mark.parametrize("alpha,beta", [(0.0, 0.0), (0.3, 0.05)])
def test_sdof_closed_form(alpha, beta):
    p = sdof_bar()
    k, m = 4.0, 1.0                      # EA/L, rho A L / 2
    w0 = np.sqrt(k / m)
    om = np.linspace(0.2 * w0, 2.0 * w0, 40)
    if alpha == 0.0:
        om = om[np.abs(om - w0) > 0.05 * w0]   # undamped pole
    res = harmonic_response(p, om, damping=(alpha, beta),
                            probe_dofs=np.array([1]))
    c = alpha * m + beta * k
    expect = 1.0 / np.sqrt((k - m * om**2) ** 2 + (c * om) ** 2)
    np.testing.assert_allclose(res.amplitude[:, 0], expect, rtol=1e-4)
    expect_phase = -np.arctan2(c * om, k - m * om**2)
    np.testing.assert_allclose(res.phase[:, 0], expect_phase, atol=1e-4)


def test_zero_frequency_is_static():
    from pinn_fem_tpu import SolverConfig, solve_nr

    p = chain()
    res = harmonic_response(p, [0.0], damping=(0.1, 0.01))
    static = solve_nr(p, SolverConfig(max_iterations=10, tolerance=1e-10),
                      1.0)
    np.testing.assert_allclose(res.real[0],
                               np.asarray(static.displacements).reshape(-1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(res.imag[0], 0.0, atol=1e-6)


def test_direct_vs_modal_all_modes():
    """Retaining every mode makes superposition exact (same operator)."""
    p = chain(n_elm=6)
    om = np.linspace(0.05, 1.2, 25)
    direct = harmonic_response(p, om, damping=(0.2, 0.03))
    modal = harmonic_response(p, om, damping=(0.2, 0.03), method="modal",
                              n_modes=6)
    np.testing.assert_allclose(modal.amplitude, direct.amplitude, rtol=2e-3,
                               atol=1e-7)


def test_resonance_peak_at_natural_frequency():
    p = chain()
    wj = modal_analysis(p, n_modes=1).omegas[0]
    om = np.linspace(0.8 * wj, 1.2 * wj, 81)
    res = harmonic_response(p, om, damping=(0.02, 0.0),
                            probe_dofs=np.array([6]))
    peak = om[np.argmax(res.amplitude[:, 0])]
    np.testing.assert_allclose(peak, wj, rtol=2e-2)


def test_frequency_parallel_sweep_matches():
    """The dp-sharded frequency sweep equals the single-device one on the
    8-virtual-device mesh (frequencies are independent: no collectives)."""
    import jax
    from jax.sharding import Mesh

    p = chain(n_elm=6)
    om = np.linspace(0.05, 1.2, 100)     # non-multiple of dp*chunk: padding
    plain = harmonic_response(p, om, damping=(0.2, 0.03))
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("dp", "tp"))
    shard = harmonic_response(p, om, damping=(0.2, 0.03), mesh=mesh)
    np.testing.assert_allclose(shard.amplitude, plain.amplitude,
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(shard.phase, plain.phase, atol=1e-5)


def test_prestressed_harmonic_taut_string_resonances():
    """prestress_u threads K_g(u0) through the FRF: the pretensioned
    chain's transverse resonances sit at the taut-string spectrum
    omega_j^2 = (T/(rho A h^2))(2 - 2 cos(j pi/n)), on BOTH tiers and
    both methods; without prestress the transverse FRF diverges at
    omega -> 0 (zero stiffness)."""
    from tests.test_buckling import taut_string

    n_elm = 8
    p = taut_string(n_elm=n_elm)
    # Pretension state u_x = (T/EA) x (T=1, EA=1000).
    up = np.zeros(2 * (n_elm + 1))
    up[0::2] = (1.0 / 1000.0) * np.arange(n_elm + 1)
    # Transverse load mid-string.
    loads = np.zeros(2 * (n_elm + 1))
    loads[2 * (n_elm // 2) + 1] = 1.0
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    theta = np.pi * np.arange(1, 3) / n_elm
    w_exact = np.sqrt(2.0 - 2.0 * np.cos(theta))     # T = rho A h = 1
    om = np.linspace(0.8 * w_exact[0], 1.2 * w_exact[0], 81)
    probe = np.array([2 * (n_elm // 2) + 1])
    kw = dict(damping=(0.01, 0.0), probe_dofs=probe, prestress_u=up)
    for host in (True, False):
        res = harmonic_response(p, om, host=host, **kw)
        peak = om[int(np.argmax(res.amplitude[:, 0]))]
        np.testing.assert_allclose(peak, w_exact[0], rtol=0.01)
    # Modal method agrees with direct on the prestressed operator.
    res_m = harmonic_response(p, om, method="modal", n_modes=7,
                              host=False, **kw)
    res_d = harmonic_response(p, om, host=False, **kw)
    np.testing.assert_allclose(res_m.amplitude, res_d.amplitude,
                               rtol=5e-2, atol=1e-6)


def test_prestressed_random_and_spectrum():
    """The prestress pass-through reaches random vibration (PSD peak at
    the taut-string resonance) and response spectrum (nonzero modal
    mass on the transverse modes)."""
    from pinn_fem_tpu.solvers.random_response import random_response
    from pinn_fem_tpu.solvers.spectrum import response_spectrum
    from tests.test_buckling import taut_string

    n_elm = 8
    p = taut_string(n_elm=n_elm)
    up = np.zeros(2 * (n_elm + 1))
    up[0::2] = (1.0 / 1000.0) * np.arange(n_elm + 1)
    loads = np.zeros(2 * (n_elm + 1))
    loads[2 * (n_elm // 2) + 1] = 1.0
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    theta = np.pi / n_elm
    w1 = np.sqrt(2.0 - 2.0 * np.cos(theta))
    om = np.linspace(0.5 * w1, 2.0 * w1, 200)
    probe = np.array([2 * (n_elm // 2) + 1])
    rr = random_response(p, 1.0, om, damping=(0.05, 0.0),
                         probe_dofs=probe, prestress_u=up)
    np.testing.assert_allclose(om[int(np.argmax(rr.psd[:, 0]))], w1,
                               rtol=0.03)
    # Spectrum: transverse (y) excitation of the prestressed string
    # engages the string modes (without prestress the transverse block
    # is singular and the lowest "mode" is spurious near-zero).
    sp = response_spectrum(p, 1.0, direction=[0.0, 1.0], n_modes=4,
                           prestress_u=up)
    assert sp.mass_fraction > 0.8
    np.testing.assert_allclose(sp.omegas[0], w1, rtol=1e-3)


# ----------------------------------------------------- member-force FRFs


def test_harmonic_member_force_frf_static_limit_and_mirror():
    """N_e(omega) = (EA/L) g.u_e(omega): at omega -> 0 it equals the
    static axial force exactly, and the host and device tiers agree."""
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [1.0, 1.0]])
    elements = np.array([[0, 1], [1, 2], [1, 3], [0, 3], [2, 3]])
    loads = np.zeros(8)
    loads[7] = -1.0
    p = TrussProblem(nodes, elements, Material(10.0, 1.0, 1.0),
                     loads, np.array([0, 1, 4, 5]), 2)
    om = np.array([1e-4, 0.5, 1.0])
    sel = np.arange(5)
    res = harmonic_response(p, om, damping=(0.02, 0.001),
                            probe_dofs=np.array([7]),
                            probe_elements=sel)
    assert res.force_amplitude.shape == (3, 5)
    # Static limit: the omega->0 row equals the static member forces.
    from pinn_fem_tpu.ops.host import host_axial_forces, host_static_solve

    n_static = host_axial_forces(p, host_static_solve(p))
    np.testing.assert_allclose(res.force_real[0], n_static,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(res.force_amplitude[0], np.abs(n_static),
                               rtol=1e-6, atol=1e-6)
    # Host vs device tier.
    res_d = harmonic_response(p, om, damping=(0.02, 0.001),
                              probe_dofs=np.array([7]),
                              probe_elements=sel, host=False)
    np.testing.assert_allclose(res_d.force_amplitude,
                               res.force_amplitude, rtol=2e-3,
                               atol=1e-6)
    with pytest.raises(ValueError, match="valid element"):
        harmonic_response(p, om, probe_elements=np.array([7]))


def test_harmonic_member_force_frf_json_tier():
    from pinn_fem_tpu.io.analysis import run_harmonic

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [1.0, 1.0]])
    elements = np.array([[0, 1], [1, 2], [1, 3], [0, 3], [2, 3]])
    loads = np.zeros(8)
    loads[7] = -1.0
    p = TrussProblem(nodes, elements, Material(10.0, 1.0, 1.0),
                     loads, np.array([0, 1, 4, 5]), 2)
    out = run_harmonic(p, {"omegas": [0.2, 0.6], "damping": [0.02, 0.0],
                           "probe_nodes": [3],
                           "probe_elements": [2, 4]})
    assert out["probe_elements"] == [2, 4]
    fa = np.asarray(out["force_amplitude"])
    assert fa.shape == (2, 2) and np.all(np.isfinite(fa))
    with pytest.raises(ValueError, match="probe fewer"):
        run_harmonic(p, {"omegas": {"start": 0.1, "stop": 1.0,
                                    "num": 5000},
                         "probe_nodes": [3],
                         "probe_elements": list(range(5))})


def test_residual_honesty_guard_clean_sweep():
    """Every tier reports the per-frequency relative residual; a
    well-damped off-resonance sweep is clean on all of them (round-4
    VERDICT #6)."""
    p = chain(n_elm=6)
    om = np.linspace(0.05, 1.2, 25)
    host = harmonic_response(p, om, damping=(0.2, 0.03))       # host f64
    dev = harmonic_response(p, om, damping=(0.2, 0.03), host=False)
    modal = harmonic_response(p, om, damping=(0.2, 0.03),
                              method="modal", n_modes=6, host=False)
    for res, bound in [(host, 1e-12), (dev, 1e-5), (modal, 1e-5)]:
        assert res.residual.shape == om.shape
        assert np.all(np.isfinite(res.residual))
        assert res.residual.max() < bound, res.residual.max()
        assert not res.flagged.any()


def test_residual_flags_near_resonant_f32_drift():
    """The device direct tier at f32, driven within 1e-6 of an undamped
    resonance: the solution amplifies by ~1e6, the backward-stable LU
    residual grows with the amplification past eps32 * kappa, and the
    guard must FLAG the point instead of silently returning it — while
    the far-from-resonance points in the same sweep stay unflagged."""
    p = chain(n_elm=6)
    wj = float(modal_analysis(p, n_modes=2, host=True).omegas[1])
    om = np.array([0.3 * wj, wj * (1.0 + 1e-7), 2.0 * wj])
    res = harmonic_response(p, om, damping=(0.0, 0.0), host=False)
    assert res.flagged[1], (res.residual, "near-resonant point unflagged")
    assert not res.flagged[0] and not res.flagged[2], res.residual
    # The host f64 tier resolves the same sweep exactly (full modal
    # basis diagonalizes the undamped pencil) — nothing to flag.
    res_h = harmonic_response(p, om, damping=(0.0, 0.0), host=True)
    assert not res_h.flagged.any()


def test_residual_modal_truncation_reported():
    """Truncated modal superposition reports the EXACT frequency-
    independent load residual ||F - M Phi q||/||F||: dropping modes on
    a mid-chain point load leaves a visible unresolved component, and
    the value matches the host-computed truth."""
    from pinn_fem_tpu.ops import host as H

    p = chain(n_elm=6)
    p.loads[:] = 0.0
    p.loads[3] = 1.0                     # mid-chain: rich modal content
    res = harmonic_response(p, [0.2, 0.5], damping=(0.1, 0.01),
                            method="modal", n_modes=2, host=False)
    assert np.allclose(res.residual[0], res.residual[1])  # w-independent
    # Host truth: project the load on the dropped modes.
    free_idx, _ = p.free_fixed()
    k = H.host_stiffness(p)[np.ix_(free_idx, free_idx)]
    m = H.host_lumped_mass(p)[free_idx]
    d = np.sqrt(m)
    w2, y = np.linalg.eigh(k / d[:, None] / d[None, :])
    v = y / d[:, None]
    f = p.loads[free_idx]
    q = v[:, :2].T @ f
    r_true = np.linalg.norm(f - m * (v[:, :2] @ q)) / np.linalg.norm(f)
    np.testing.assert_allclose(res.residual[0], r_true, rtol=1e-3)
    assert res.residual[0] > 0.05       # truncation is VISIBLE


def test_residual_json_tier_flags():
    """run_harmonic serializes residual + flagged indices/omegas."""
    from pinn_fem_tpu.io.analysis import run_harmonic

    p = chain(n_elm=6)
    out = run_harmonic(p, {"omegas": [0.2, 0.6], "damping": [0.1, 0.01],
                           "probe_nodes": [6]})
    assert len(out["residual"]) == 2
    assert out["flagged_indices"] == [] and out["flagged_omegas"] == []
    assert out["residual_tol"] == 1e-3
