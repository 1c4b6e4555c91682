"""Transient dynamics (solvers/dynamics.py) — an extension beyond the
reference (which has no mass matrix; SURVEY §7.3).  Validation against
closed forms: the SDOF oscillator under a step load, energy conservation
of the undamped central-difference scheme, damped decay, explicit/implicit
agreement, and the banded large-mesh path."""

import numpy as np
import pytest

import jax.numpy as jnp

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.ops.mass import (consistent_mass, lumped_mass, total_mass)
from pinn_fem_tpu.solvers.dynamics import solve_transient, stable_dt


def bar_1d(n=2, young=4.0, area=0.5, density=2.0, tip_load=1.0):
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(n)
    loads[-1] = tip_load
    return TrussProblem(nodes, elements,
                        Material(young=young, area=area, density=density),
                        loads, np.array([0]), 1)


def test_mass_matrices_invariants():
    p = bar_1d(5)
    data = p.to_device()
    m_lumped = np.asarray(lumped_mass(data, p.material))
    m_cons = np.asarray(consistent_mass(data, p.material))
    mtot = float(total_mass(data, p.material))
    # rho * A * total length = 2 * 0.5 * 4.
    np.testing.assert_allclose(mtot, 4.0, rtol=1e-6)
    np.testing.assert_allclose(m_lumped.sum(), mtot, rtol=1e-6)
    # Row sums of the consistent mass equal the lumped diagonal.
    np.testing.assert_allclose(m_cons.sum(axis=1), m_lumped, rtol=1e-5)
    # Consistent M is SPD on the free block.
    w = np.linalg.eigvalsh(m_cons[1:, 1:])
    assert w.min() > 0


def sdof_expected(t, k, m, f):
    om = np.sqrt(k / m)
    return (f / k) * (1.0 - np.cos(om * t))


@pytest.mark.parametrize("method", ["central", "newmark"])
def test_sdof_step_load_analytic(method):
    """2-node bar = SDOF oscillator: k = EA/L, m = rho A L / 2.
    Step load F -> u(t) = (F/k)(1 - cos omega t)."""
    p = bar_1d(2)
    k = 4.0 * 0.5 / 1.0
    m = 2.0 * 0.5 * 1.0 / 2.0
    om = np.sqrt(k / m)
    dt = (2 * np.pi / om) / 200.0  # 200 steps per period
    n = 600
    r = solve_transient(p, dt, n, method=method, record_every=1)
    t = r.times
    u_tip = r.displacements[:, 1]
    np.testing.assert_allclose(u_tip, sdof_expected(t, k, m, 1.0),
                               atol=3e-3 * (2.0 / k))


def test_energy_conservation_undamped():
    """Free vibration from an initial displacement: central difference
    conserves total energy to O(dt^2) — drift under 1% over 10 periods."""
    p = bar_1d(6, tip_load=0.0)
    dt = 0.25 * stable_dt(p)
    u0 = np.zeros(6)
    u0[1:] = 0.01 * np.arange(1, 6)
    n = 4000
    r = solve_transient(p, dt, n, u0=u0, record_every=40)
    e = r.kinetic_energy + r.strain_energy
    assert e[0] > 0
    drift = np.abs(e - e[0]) / e[0]
    assert drift.max() < 0.01


def test_damped_energy_decays():
    p = bar_1d(6, tip_load=0.0)
    dt = 0.2 * stable_dt(p)
    u0 = np.zeros(6)
    u0[1:] = 0.01 * np.arange(1, 6)
    r = solve_transient(p, dt, 4000, u0=u0, damping=(0.5, 0.002),
                        record_every=400)
    e = r.kinetic_energy + r.strain_energy
    assert e[-1] < 0.2 * e[0]
    assert np.all(np.diff(e) < 1e-9)


def test_newmark_matches_central_tripod():
    """3D tripod under a suddenly-applied load: the implicit and explicit
    integrators agree at small dt over a short horizon (their dispersion
    errors have opposite sign and would dephase over many periods)."""
    base = np.array([[1.0, 0.0, 0.0],
                     [-0.5, np.sqrt(3) / 2, 0.0],
                     [-0.5, -np.sqrt(3) / 2, 0.0]])
    nodes = np.vstack([base, [[0.0, 0.0, 1.0]]])
    elements = np.array([[0, 3], [1, 3], [2, 3]])
    loads = np.zeros(12)
    loads[11] = -1.0
    p = TrussProblem(nodes, elements,
                     Material(young=1.0, area=1.0, density=1.0),
                     loads, np.arange(9), 3)
    dt = 0.1 * stable_dt(p)
    n = 150
    rc = solve_transient(p, dt, n, method="central", record_every=15)
    rn = solve_transient(p, dt, n, method="newmark", record_every=15)
    scale = np.abs(rc.displacements[:, 11]).max()
    np.testing.assert_allclose(rn.displacements[:, 11],
                               rc.displacements[:, 11], atol=0.03 * scale)


def test_central_step_response_straddles_static():
    """Undamped step response oscillates about the static deflection,
    peaking near twice it."""
    base = np.array([[1.0, 0.0, 0.0],
                     [-0.5, np.sqrt(3) / 2, 0.0],
                     [-0.5, -np.sqrt(3) / 2, 0.0]])
    nodes = np.vstack([base, [[0.0, 0.0, 1.0]]])
    p = TrussProblem(nodes, np.array([[0, 3], [1, 3], [2, 3]]),
                     Material(young=1.0, area=1.0, density=1.0),
                     np.r_[np.zeros(11), -1.0], np.arange(9), 3)
    dt = 0.2 * stable_dt(p)
    r = solve_transient(p, dt, 600, record_every=10)
    uz_static = -2.0 * np.sqrt(2.0) / 3.0
    assert r.displacements[:, 11].min() < 1.8 * uz_static
    assert r.displacements[:, 11].min() > 2.2 * uz_static


def test_banded_path_large_chain():
    """ndof above DENSE_DOF_LIMIT exercises the DIA operator in both
    integrators; a longitudinal wave reaches the far end at speed
    c = sqrt(E/rho)."""
    n = 3000
    p = bar_1d(n, young=1.0, area=1.0, density=1.0, tip_load=0.0)
    loads = np.zeros(n)
    loads[1] = 1.0  # kick near the fixed end
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 1)
    dt = 0.5 * stable_dt(p)
    n_steps = 200
    amp = np.zeros(n_steps)
    amp[:10] = 1.0  # short pulse
    r = solve_transient(p, dt, n_steps, amplitude=amp, record_every=n_steps,
                        probe_dofs=np.arange(n))
    u = r.displacements[-1]
    # Wave front position ~ c * t (c = 1); it must have moved but not
    # passed t * c by much, and far DOFs are still quiet.
    t_end = dt * n_steps
    front = int(np.ceil(t_end)) + 2
    assert np.abs(u[:front]).max() > 1e-6
    assert np.abs(u[min(2 * front, n - 1):]).max() < 1e-8


def test_newmark_banded_matches_dense():
    """Newmark via warm-started banded CG == Newmark via dense Cholesky
    (same mesh, operated through both paths)."""
    from pinn_fem_tpu.solvers import dynamics as dyn

    p = bar_1d(50, tip_load=1.0)
    dt = 2.0 * stable_dt(p)  # implicit: stable above the explicit limit
    n = 100
    r_dense = solve_transient(p, dt, n, method="newmark", record_every=10)
    # Force the banded path by lowering the dense limit.
    import pinn_fem_tpu.solvers.newton as newton

    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 10
        r_band = solve_transient(p, dt, n, method="newmark",
                                 record_every=10)
    finally:
        newton.DENSE_DOF_LIMIT = orig
    # Agreement is float32-limited: two exact solvers round differently
    # and oscillatory dynamics amplify that linearly in time (measured
    # ~4e-4 relative after 100 steps, insensitive to cg_tol below 1e-6).
    scale = np.abs(r_dense.displacements).max()
    np.testing.assert_allclose(r_band.displacements, r_dense.displacements,
                               atol=2e-3 * scale)
