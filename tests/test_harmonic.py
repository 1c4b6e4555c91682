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
