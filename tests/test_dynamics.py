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


# ---------------------------------------------------------------------------
# Geometric nonlinearity (Green-Lagrange f_int in the explicit integrator)
# ---------------------------------------------------------------------------


def _nl_cable(young=100.0):
    from pinn_fem_tpu import Material, TrussProblem

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    elements = np.array([[0, 1], [1, 2]])
    loads = np.zeros(6)
    loads[3] = -1.0  # transverse pull at the center
    return TrussProblem(
        nodes=nodes, elements=elements,
        material=Material(young=young, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array([0, 1, 2, 4, 5]), dimension=2)


def test_nonlinear_cable_stiffening_static_limit():
    """Taut-cable closed form: a 2-bar cable pulled transversely has ZERO
    linear stiffness; the Green-Lagrange restoring force is EA w^3/L^3, so
    the damped transient must settle at w = L (F/EA)^(1/3) — a state
    linear physics cannot produce at all."""
    from pinn_fem_tpu import solve_transient

    p = _nl_cable(young=100.0)
    res = solve_transient(p, dt=0.004, n_steps=50000, damping=(2.0, 0.0),
                          method="central", record_every=1000,
                          probe_dofs=np.array([3]),
                          geometric_nonlinear=True)
    w = -res.displacements[-1, 0]
    w_exact = (1.0 / 100.0) ** (1.0 / 3.0)
    np.testing.assert_allclose(w, w_exact, rtol=2e-2)


def test_nonlinear_small_amplitude_matches_linear():
    """Axially loaded chain at tiny strain: GL and linear trajectories
    agree to the strain order."""
    from pinn_fem_tpu import Material, TrussProblem, solve_transient

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    p = TrussProblem(
        nodes=nodes, elements=np.array([[0, 1], [1, 2]]),
        material=Material(young=1000.0, area=1.0, density=1.0),
        loads=np.array([0, 0, 0, 0, 1e-2, 0]),
        fixed_dofs=np.array([0, 1, 3, 5]), dimension=2)
    kw = dict(dt=0.005, n_steps=2000, record_every=100,
              probe_dofs=np.array([4]), damping=(0.1, 0.0))
    lin = solve_transient(p, method="central", **kw)
    nl = solve_transient(p, method="central", geometric_nonlinear=True,
                         **kw)
    # float32 force-evaluation noise at displacement scale 1e-5.
    np.testing.assert_allclose(nl.displacements, lin.displacements,
                               rtol=1e-2, atol=1e-9)


def test_nonlinear_energy_conserved_free_vibration():
    """UNFORCED undamped large-amplitude oscillation from an initial
    transverse displacement: total energy KE + SE must stay near its
    initial value over 20k steps (a forced system exchanges energy with
    the load, so conservation only holds load-free)."""
    from pinn_fem_tpu import Material, TrussProblem, solve_transient

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    p = TrussProblem(
        nodes=nodes, elements=np.array([[0, 1], [1, 2]]),
        material=Material(young=50.0, area=1.0, density=1.0),
        loads=np.zeros(6), fixed_dofs=np.array([0, 1, 2, 4, 5]),
        dimension=2)
    u_init = np.zeros(6)
    u_init[3] = 0.3  # large transverse pluck at the center
    res = solve_transient(p, dt=0.002, n_steps=20000, damping=(0.0, 0.0),
                          method="central", record_every=500,
                          probe_dofs=np.array([3]), u0=u_init,
                          geometric_nonlinear=True)
    e = res.kinetic_energy + res.strain_energy
    assert np.all(np.isfinite(e))
    e0 = e[0]
    assert e0 > 0
    np.testing.assert_allclose(e, e0, rtol=0.05)


def test_nonlinear_rejects_modal():
    """Modal superposition is a linear concept; round 3 lifted the
    Newmark restriction (implicit Newton per step) but modal must still
    refuse."""
    import pytest

    from pinn_fem_tpu import solve_transient

    p = _nl_cable()
    with pytest.raises(ValueError, match="geometric_nonlinear"):
        solve_transient(p, dt=0.01, n_steps=10, method="modal",
                        geometric_nonlinear=True)


def test_nonlinear_newmark_matches_central():
    """Implicit nonlinear Newmark (Newton per step) at the same fine dt
    tracks the explicit integrator on the cubic-stiffness cable, and at
    a dt far beyond the explicit stability bound it still lands on the
    exact static limit w = L (F/EA)^(1/3)."""
    from pinn_fem_tpu import solve_transient

    p = _nl_cable(young=100.0)
    kw = dict(damping=(2.0, 0.0), probe_dofs=np.array([3]))
    rc = solve_transient(p, dt=0.004, n_steps=10000, record_every=1000,
                         method="central", geometric_nonlinear=True, **kw)
    rn = solve_transient(p, dt=0.004, n_steps=10000, record_every=1000,
                         method="newmark", geometric_nonlinear=True, **kw)
    scale = np.abs(rc.displacements).max()
    np.testing.assert_allclose(rn.displacements, rc.displacements,
                               atol=2e-2 * scale)
    # Coarse dt: ~40x the explicit transverse bound near the settled
    # state (local omega ~ sqrt(3 EA w^2/L^3 / m) ~ 2.6) — explicit
    # would blow up; implicit settles on the closed form.
    rl = solve_transient(p, dt=1.0, n_steps=60, record_every=60,
                         method="newmark", geometric_nonlinear=True, **kw)
    w_exact = (1.0 / 100.0) ** (1.0 / 3.0)
    np.testing.assert_allclose(-rl.displacements[-1, 0], w_exact,
                               rtol=2e-2)


def test_nonlinear_newmark_small_amplitude_matches_linear():
    """At tiny strain the nonlinear implicit step reduces to linear
    Newmark."""
    from pinn_fem_tpu import Material, TrussProblem, solve_transient

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    p = TrussProblem(
        nodes=nodes, elements=np.array([[0, 1], [1, 2]]),
        material=Material(young=1000.0, area=1.0, density=1.0),
        loads=np.array([0, 0, 0, 0, 1e-2, 0]),
        fixed_dofs=np.array([0, 1, 3, 5]), dimension=2)
    kw = dict(dt=0.01, n_steps=800, record_every=80,
              probe_dofs=np.array([4]), damping=(0.1, 0.01))
    lin = solve_transient(p, method="newmark", **kw)
    nl = solve_transient(p, method="newmark", geometric_nonlinear=True,
                         **kw)
    np.testing.assert_allclose(nl.displacements, lin.displacements,
                               rtol=1e-2, atol=1e-9)


def test_checkpointed_transient_resume(tmp_path):
    """Segmented checkpointed run == uninterrupted run, and a 'preempted'
    run (first half only) resumed from disk produces the identical
    remaining records."""
    from pinn_fem_tpu import solve_transient, solve_transient_checkpointed
    from pinn_fem_tpu.utils.checkpoint import load_transient_state

    p = _nl_cable(young=100.0)
    kw = dict(damping=(0.5, 0.0), method="central", record_every=10,
              probe_dofs=np.array([3]), geometric_nonlinear=True)
    n, dt = 400, 0.004

    plain = solve_transient(p, dt=dt, n_steps=n, **kw)
    full = solve_transient_checkpointed(
        p, dt, n, tmp_path / "a", checkpoint_every=100, **kw)
    np.testing.assert_allclose(full.displacements, plain.displacements,
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(full.times, plain.times, rtol=1e-6)
    np.testing.assert_allclose(full.u_final, plain.u_final, rtol=1e-5,
                               atol=1e-8)

    # Simulate preemption: run only the first 200 steps into dir b...
    solve_transient_checkpointed(p, dt, 200, tmp_path / "b",
                                 checkpoint_every=100, **kw)
    st = load_transient_state(tmp_path / "b")
    assert st is not None and st[0] == 200
    # ...then resume the FULL job against the same dir: only the second
    # half runs, and its records must equal the uninterrupted tail.
    resumed = solve_transient_checkpointed(
        p, dt, n, tmp_path / "b", checkpoint_every=100, **kw)
    np.testing.assert_allclose(resumed.displacements,
                               plain.displacements[20:], rtol=1e-5,
                               atol=1e-8)
    np.testing.assert_allclose(resumed.times, plain.times[20:], rtol=1e-6)


# ---------------------------------------------------------------------------
# Modal-superposition integration (exact per-step SDOF propagators)
# ---------------------------------------------------------------------------


def test_modal_integration_exact_at_coarse_dt():
    """The exact-propagator method hits the SDOF closed form at ANY dt —
    here a quarter period per step, far beyond the explicit limit."""
    p = bar_1d(2)
    k, m = 2.0, 0.5
    om = np.sqrt(k / m)
    dt = (2 * np.pi / om) / 4.0
    r = solve_transient(p, dt, 40, method="modal", record_every=1)
    np.testing.assert_allclose(r.displacements[:, 1],
                               sdof_expected(r.times, k, m, 1.0),
                               atol=1e-5 * (2.0 / k))


def test_modal_matches_central_all_modes():
    """All modes retained, fine dt: modal == central (the central error
    is O(dt^2) dispersion, so compare loosely over a short horizon)."""
    p = bar_1d(6)
    dt = 0.05 * stable_dt(p)
    rc = solve_transient(p, dt, 800, method="central", record_every=80,
                         damping=(0.2, 0.01))
    rm = solve_transient(p, dt, 800, method="modal", record_every=80,
                         damping=(0.2, 0.01), n_modes=5)
    scale = np.abs(rc.displacements).max()
    np.testing.assert_allclose(rm.displacements, rc.displacements,
                               atol=2e-3 * scale)
    # Central's snapshot KE uses the centered-peek velocity (O(dt w)
    # residual); compare on the energy scale, not per-entry relative.
    np.testing.assert_allclose(rm.kinetic_energy, rc.kinetic_energy,
                               atol=0.01 * rc.kinetic_energy.max())


def test_modal_damped_closed_form():
    """Damped SDOF step response, exact at coarse dt:
    u = (F/k)[1 - e^{-z w t}(cos wd t + z/sqrt(1-z^2) sin wd t)]."""
    p = bar_1d(2)
    k, m = 2.0, 0.5
    om = np.sqrt(k / m)
    alpha = 0.4  # zeta = alpha/(2 om)
    z = alpha / (2 * om)
    wd = om * np.sqrt(1 - z * z)
    dt = (2 * np.pi / om) / 6.0
    r = solve_transient(p, dt, 60, method="modal", record_every=1,
                        damping=(alpha, 0.0))
    t = r.times
    expect = (1.0 / k) * (1.0 - np.exp(-z * om * t)
                          * (np.cos(wd * t)
                             + z / np.sqrt(1 - z * z) * np.sin(wd * t)))
    np.testing.assert_allclose(r.displacements[:, 1], expect,
                               atol=1e-5 / k)


# ---------------------------------------------------------------------------
# Prestressed (linearized initial-stress) transient dynamics
# ---------------------------------------------------------------------------


def _taut_chain(n_nodes=401, tension=1.0, young=100.0):
    """Pretensioned chain with all axial DOFs fixed (isolates transverse
    motion); prestress state u_x = (T/EA) x gives N = T exactly."""
    nodes = np.stack([np.arange(n_nodes, dtype=float),
                      np.zeros(n_nodes)], 1)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    fixed = [2 * i for i in range(n_nodes)] + [1, 2 * (n_nodes - 1) + 1]
    p = TrussProblem(nodes, elements,
                     Material(young=young, area=1.0, density=1.0),
                     np.zeros(2 * n_nodes), np.array(sorted(fixed)), 2)
    up = np.zeros(2 * n_nodes)
    up[0::2] = (tension / young) * np.arange(n_nodes)
    return p, up


def test_prestressed_wave_speed():
    """Transverse pulse on a taut string travels at c = sqrt(T / rho A)
    (= 1 here); without prestress there is NO transverse stiffness and
    nothing propagates."""
    p, up = _taut_chain()
    n = 401
    dt = 0.02                      # transverse CFL: c dt / h = 0.02
    n_steps = 5000                 # front at c t = 100 of 400 elements
    amp = np.zeros(n_steps)
    amp[:50] = 1.0
    loads = np.zeros(2 * n)
    loads[3] = 1.0                 # y kick at node 1
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    r = solve_transient(p, dt, n_steps, amplitude=amp,
                        record_every=n_steps,
                        probe_dofs=np.arange(1, 2 * n, 2),
                        prestress_u=up)
    uy = r.displacements[-1]
    t_end = dt * n_steps
    front = int(np.ceil(t_end)) + 5          # c = 1
    assert np.abs(uy[:front]).max() > 1e-4   # wave arrived
    assert np.abs(uy[min(2 * front, n - 1):]).max() < 1e-7  # far quiet

    # Control: same kick with NO prestress — zero transverse stiffness,
    # the kicked node moves ballistically and nothing propagates.
    r0 = solve_transient(p, dt, 500, amplitude=amp[:500],
                         record_every=500,
                         probe_dofs=np.arange(1, 2 * n, 2))
    uy0 = r0.displacements[-1]
    assert np.abs(uy0[5:]).max() < 1e-9


def test_prestressed_modal_matches_central():
    """method='modal' with prestress uses the prestressed spectrum; at
    fine dt it matches the prestressed central integrator."""
    p, up = _taut_chain(n_nodes=11)
    loads = np.zeros(22)
    loads[11] = 1.0               # y load mid-string
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    kw = dict(n_steps=2000, record_every=200, damping=(0.1, 0.0),
              probe_dofs=np.array([11]), prestress_u=up)
    rc = solve_transient(p, 0.01, method="central", **kw)
    rm = solve_transient(p, 0.01, method="modal", n_modes=9, **kw)
    scale = np.abs(rc.displacements).max()
    np.testing.assert_allclose(rm.displacements, rc.displacements,
                               atol=5e-3 * scale)


def test_moving_load_quasistatic_influence_line():
    """Bridge problem: a slow transverse point load crossing a taut
    string must trace the STATIC influence line at mid-span,
    u_mid(p) = F min(p, L-p) / (2 T) (discrete-exact for the taut-string
    Laplacian with linear load distribution)."""
    from pinn_fem_tpu.solvers.dynamics import moving_load_force_fn

    n_nodes = 41
    p, up = _taut_chain(n_nodes=n_nodes, tension=1.0, young=100.0)
    L = float(n_nodes - 1)
    speed, dt = 0.05, 0.4          # crossing time 800 >> transverse period
    n_steps = 2200                 # includes post-exit ring-down
    f_fn = moving_load_force_fn(p, path_nodes=np.arange(n_nodes),
                                speed=speed, magnitude=-1.0, dt=dt,
                                component=1)
    mid = 2 * (n_nodes // 2) + 1
    # Near-critical damping of the FIRST transverse mode (w1 ~ 0.078):
    # alpha = 2 w1 makes zeta_1 = 1, relaxation ~ 1/w1 = 13 << the 800 s
    # crossing (alpha = 1 over-damps it 6x and the response lags the
    # influence line by the whole span — measured before this choice).
    r = solve_transient(p, dt, n_steps, method="central",
                        damping=(0.16, 0.0), record_every=20,
                        probe_dofs=np.array([mid]), prestress_u=up,
                        force_fn=f_fn)
    t = r.times
    got = r.displacements[:, 0]
    # A critically damped system tracks a ramp with a first-order lag
    # tau ~ 2/w1 (~26 s here, measured ~30): evaluate the influence line
    # at the LAGGED position.
    tau = 30.0
    pos_lag = speed * (t - tau)
    expect = -np.clip(np.minimum(pos_lag, L - pos_lag), 0.0, None) / 2.0
    sel = (t > 100.0) & (pos_lag <= L)
    scale = np.abs(expect[sel]).max()
    # 8%: the single-lag model is crude exactly at the mid-span slope
    # flip; the peak value is pinned tightly below.
    np.testing.assert_allclose(got[sel], expect[sel], atol=0.08 * scale)
    # Peak: the exact mid-span maximum F L / (4 T) = 10.
    np.testing.assert_allclose(-got.min(), L / 4.0, rtol=0.03)
    # After exit the damped string relaxes back toward zero.
    assert abs(got[-1]) < 0.05 * scale


def test_base_excitation_equals_effective_force():
    """Construction check: the base-acceleration force_fn must integrate
    identically to an explicit run with loads = -M iota and
    amplitude = a_g(t) — the relative-coordinate effective force IS that
    product."""
    from pinn_fem_tpu.ops.mass import lumped_mass
    from pinn_fem_tpu.solvers.dynamics import base_excitation_force_fn

    n = 6
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    mat = Material(young=2.0, area=1.0, density=3.0)
    dt, n_steps = 0.05, 400
    t = dt * np.arange(n_steps)
    a_g = 0.5 * np.sin(0.3 * t)

    p1 = TrussProblem(nodes, elements, mat, np.zeros(n), np.array([0]), 1)
    f_fn = base_excitation_force_fn(p1, a_g)
    r1 = solve_transient(p1, dt, n_steps, method="central",
                         damping=(0.05, 0.0), probe_dofs=np.arange(n),
                         force_fn=f_fn)

    import jax as _jax

    m = np.asarray(_jax.device_get(lumped_mass(p1.to_device(),
                                               p1.material)))
    p2 = TrussProblem(nodes, elements, mat, -m, np.array([0]), 1)
    r2 = solve_transient(p2, dt, n_steps, method="central",
                         damping=(0.05, 0.0), probe_dofs=np.arange(n),
                         amplitude=a_g)
    np.testing.assert_allclose(r1.displacements, r2.displacements,
                               rtol=1e-5, atol=1e-8)


def test_base_excitation_pseudostatic_limit():
    """Physics check: under a slow ramp of ground acceleration the
    relative displacement tracks the pseudo-static solution
    u = -K^{-1} M iota a_g(t)."""
    from pinn_fem_tpu.ops.host import (host_lumped_mass, host_masks,
                                       host_stiffness)
    from pinn_fem_tpu.solvers.dynamics import base_excitation_force_fn

    n = 6
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    mat = Material(young=2.0, area=1.0, density=3.0)
    p = TrussProblem(nodes, elements, mat, np.zeros(n), np.array([0]), 1)

    dt, n_steps = 0.05, 4000
    t = dt * np.arange(n_steps)
    t_ramp = 150.0                     # >> the ~9 s fundamental period
    a_g = 0.4 * np.clip(t / t_ramp, 0.0, 1.0)
    f_fn = base_excitation_force_fn(p, a_g)
    # Near-critical damping of the fundamental kills the transient.
    r = solve_transient(p, dt, n_steps, method="central",
                        damping=(0.6, 0.0), record_every=40,
                        probe_dofs=np.array([n - 1]), force_fn=f_fn)

    k = host_stiffness(p)
    free = np.arange(1, n)
    u_stat = np.zeros(n)
    rhs = -(host_lumped_mass(p) * 1.0)[free] * 0.4
    u_stat[free] = np.linalg.solve(k[np.ix_(free, free)], rhs)
    np.testing.assert_allclose(r.displacements[-1, 0], u_stat[-1],
                               rtol=0.02)
    assert host_masks(p)[0] == 0.0     # fixed base carries no response


def test_prestressed_newmark_matches_modal_any_dt():
    """Round-3 VERDICT #3: the Newmark effective operator carries K_g.
    The implicit taut-string transverse response matches the EXACT
    prestressed modal propagator — at a dt far beyond the explicit
    stability limit (unconditional stability with the prestressed
    operator), and at fine dt to integration accuracy."""
    p, up = _taut_chain(n_nodes=11)
    loads = np.zeros(22)
    loads[11] = 1.0
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    kw = dict(probe_dofs=np.array([11]), prestress_u=up,
              damping=(0.05, 0.0))
    # Fine dt: Newmark ~= exact modal (all 9 transverse modes retained).
    rm = solve_transient(p, 0.01, n_steps=2000, record_every=200,
                         method="modal", n_modes=9, **kw)
    rn = solve_transient(p, 0.01, n_steps=2000, record_every=200,
                         method="newmark", **kw)
    scale = np.abs(rm.displacements).max()
    np.testing.assert_allclose(rn.displacements, rm.displacements,
                               atol=5e-3 * scale)
    # Coarse dt (5x the explicit transverse limit ~ 2/omega_max): stays
    # bounded and lands on the static influence deflection u = F L1 L2 /
    # (T L) as the damped response settles.
    dt_coarse = 5.0
    rl = solve_transient(p, dt_coarse, n_steps=400, record_every=400,
                         method="newmark", **kw)
    u_static = 1.0 * 5.0 * 5.0 / (1.0 * 10.0)   # F a b / (T L)
    np.testing.assert_allclose(rl.displacements[-1, 0], u_static,
                               rtol=0.05)


def test_prestressed_newmark_banded_matches_dense():
    """The DIA Newmark effective operator carries K_g too: force the
    banded path with a patched DENSE_DOF_LIMIT and compare."""
    import pinn_fem_tpu.solvers.newton as newton

    p, up = _taut_chain(n_nodes=41)
    loads = np.zeros(82)
    loads[41] = 1.0
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    kw = dict(n_steps=300, record_every=50, damping=(0.05, 0.0),
              probe_dofs=np.array([41]), prestress_u=up, host=False,
              cg_tol=1e-8)   # PCG accuracy, so only f32 noise separates
    dense = solve_transient(p, 0.05, method="newmark", **kw)
    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 16
        p2 = TrussProblem(p.nodes, p.elements, p.material, p.loads,
                          p.fixed_dofs, 2)   # fresh caches
        banded = solve_transient(p2, 0.05, method="newmark", **kw)
    finally:
        newton.DENSE_DOF_LIMIT = orig
    scale = np.abs(dense.displacements).max()
    # 5e-3: f32 roundoff random-walk between Cholesky and PCG over 300
    # steps (measured 6e-8 relative in float64 — the operators agree;
    # only the arithmetic paths differ).
    np.testing.assert_allclose(banded.displacements, dense.displacements,
                               atol=5e-3 * scale)


def test_stable_dt_includes_prestress():
    """Tension adds transverse stiffness: the prestressed Gershgorin
    bound must SHRINK the explicit step, and integrating at that step is
    stable while the unstressed-bound step may not be for a
    geometric-stiffness-dominated structure."""
    p, up = _taut_chain(n_nodes=21, tension=5.0, young=1.0)
    dt0 = stable_dt(p)
    dtp = stable_dt(p, prestress_u=up)
    assert dtp < dt0
    # Host and device bounds agree.
    dtp_dev = stable_dt(p, data=p.to_device(), prestress_u=up)
    np.testing.assert_allclose(dtp, dtp_dev, rtol=1e-4)
    # The prestressed bound is safe: a kicked string integrated at dtp
    # stays bounded over many periods.
    loads = np.zeros(42)
    loads[21] = 1.0
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    r = solve_transient(p, dtp, n_steps=4000, record_every=4000,
                        probe_dofs=np.array([21]), prestress_u=up)
    assert np.isfinite(r.displacements).all()
    assert np.abs(r.displacements).max() < 100.0
