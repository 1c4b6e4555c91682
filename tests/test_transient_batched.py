"""Ensemble transient dynamics (parallel/batched.solve_transient_batched).

Batched rows must agree with the production integrator row by row; the
stress envelope must reproduce the classic dynamic-amplification-of-2
result for an undamped step load; and the dp-sharded run must equal the
unsharded one on the 8-virtual-device mesh."""

import numpy as np

import jax

from pinn_fem_tpu import Material, TrussProblem, solve_transient
from pinn_fem_tpu.parallel.batched import solve_transient_batched


def chain(n_nodes=5):
    nodes = np.arange(n_nodes, dtype=float)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    loads = np.zeros(n_nodes)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=2.0, area=1.0, density=3.0),
                        loads, np.array([0]), 1)


DT, N_STEPS = 0.05, 400


def test_batched_rows_match_sequential():
    p = chain()
    scales = np.array([0.5, 1.0, 2.0])
    amps = scales[:, None] * np.ones((1, N_STEPS))
    out = solve_transient_batched(
        p, DT, N_STEPS, amplitudes=amps, damping=(0.1, 0.02),
        probe_dofs=np.array([4]), record_every=4)
    assert out["displacements"].shape == (3, 100, 1)
    for i, s in enumerate(scales):
        ref = solve_transient(p, dt=DT, n_steps=N_STEPS,
                              amplitude=s * np.ones(N_STEPS),
                              damping=(0.1, 0.02), method="central",
                              record_every=4, probe_dofs=np.array([4]))
        np.testing.assert_allclose(np.asarray(out["displacements"][i]),
                                   ref.displacements, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(out["u_final"][i]),
                                   ref.u_final, rtol=1e-4, atol=1e-7)
    # Linearity: row stresses scale with the load.
    env = np.asarray(out["max_stress"])
    np.testing.assert_allclose(env[2], 4.0 * env[0], rtol=1e-3)


def test_stress_envelope_dynamic_amplification():
    """Undamped step load on an SDOF bar: peak dynamic response (and
    stress) is exactly 2x the static one."""
    nodes = np.array([0.0, 1.0])
    p = TrussProblem(nodes, np.array([[0, 1]]),
                     Material(young=4.0, area=1.0, density=2.0),
                     np.array([0.0, 1.0]), np.array([0]), 1)
    # k = 4, m = 1 -> T = pi; resolve the period well.
    out = solve_transient_batched(p, 0.005, 2000,
                                  amplitudes=np.ones((1, 2000)))
    static_stress = 1.0  # N/A = F L /(A) ... stress = E*strain = F/A = 1
    np.testing.assert_allclose(np.asarray(out["max_stress"])[0, 0],
                               2.0 * static_stress, rtol=2e-3)


def test_sharded_matches_unsharded():
    from jax.sharding import Mesh

    p = chain()
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("dp", "tp"))
    amps = np.linspace(0.5, 2.0, 8)[:, None] * np.ones((1, N_STEPS))
    plain = solve_transient_batched(p, DT, N_STEPS, amplitudes=amps,
                                    probe_dofs=np.array([4]))
    shard = solve_transient_batched(p, DT, N_STEPS, amplitudes=amps,
                                    probe_dofs=np.array([4]), mesh=mesh)
    # float32 reduction-order drift through 400 oscillatory steps.
    np.testing.assert_allclose(np.asarray(shard["displacements"]),
                               np.asarray(plain["displacements"]),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(shard["max_stress"]),
                               np.asarray(plain["max_stress"]),
                               rtol=1e-3)
