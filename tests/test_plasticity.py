"""Elastoplastic statics (solvers/plasticity.py) vs closed forms.

The 1D combined-hardening model has exact monotonic/cyclic solutions:

    monotonic:  sigma = E eps                      (E eps <= sigma_y)
                sigma = sigma_y + E H/(E+H) (eps - sigma_y/E)   (beyond)
    unloading:  elastic slope E, residual u = L eps_p
    reversal:   isotropic re-yields at -(sigma_y + H_iso alpha)
                kinematic re-yields at  (back - sigma_y)  (Bauschinger)

Every test below pins the solver to one of these forms.
"""

import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.newton import solve_nr
from pinn_fem_tpu.solvers.plasticity import (ramp_schedule,
                                             solve_elastoplastic)

E, A, L = 100.0, 1.0, 2.0
SY, H = 1.0, 10.0
ET = E * H / (E + H)          # elastoplastic tangent modulus
EY = SY / E                   # yield strain


def bar_1d():
    """Single bar, fixed left end, unit end load pattern."""
    return TrussProblem(
        nodes=np.array([0.0, L]),
        elements=np.array([[0, 1]]),
        material=Material(young=E, area=A, density=1.0),
        loads=np.array([0.0, 1.0]),
        fixed_dofs=np.array([0]),
        dimension=1)


def sigma_monotonic(eps):
    eps = np.asarray(eps, dtype=float)
    return np.where(eps <= EY, E * eps, SY + ET * (eps - EY))


def test_single_bar_bilinear_curve():
    """Monotonic ramp past yield reproduces the exact bilinear response
    at every load step, and the Newton count stays at the theoretical
    1-2 iterations for piecewise-linear hardening."""
    res = solve_elastoplastic(bar_1d(), sigma_y=SY, hardening_iso=H,
                              target_load_factor=1.5, n_steps=15)
    assert res.converged
    sig = res.stresses[:, 0]
    np.testing.assert_allclose(sig, res.load_factors / A, atol=1e-12)
    eps = res.displacements[:, 1] / L
    np.testing.assert_allclose(sig, sigma_monotonic(eps), atol=1e-10)
    # Post-yield plastic strain: eps_p = (sigma - sy) / H.
    post = sig > SY + 1e-9
    np.testing.assert_allclose(res.plastic_strain[post, 0],
                               (sig[post] - SY) / H, rtol=1e-10)
    assert res.iterations.max() <= 3
    # Yield happens exactly once along the ramp (10th step: lf = 1.0).
    assert res.n_plastic.sum() == np.count_nonzero(post)


def test_unload_residual_and_elastic_reload():
    """Load to 1.5 sy, unload to zero, reload: residual displacement
    L eps_p at zero load; the reload is purely elastic (isotropic
    hardening raised the yield stress to the previous maximum)."""
    up = ramp_schedule(1.5, 15)
    down = up[::-1][1:]
    sched = np.concatenate([up, down, [0.0], up])
    res = solve_elastoplastic(bar_1d(), sigma_y=SY, hardening_iso=H,
                              load_factors=sched)
    assert res.converged
    eps_p_max = (1.5 - SY) / H
    i_zero = len(up) + len(down)          # the explicit 0.0 entry
    np.testing.assert_allclose(res.displacements[i_zero, 1],
                               L * eps_p_max, rtol=1e-10)
    np.testing.assert_allclose(res.stresses[i_zero, 0], 0.0, atol=1e-12)
    # No plastic flow anywhere after the first peak.
    assert res.n_plastic[len(up):].sum() == 0
    # Reload endpoint re-joins the first-pass curve exactly.
    np.testing.assert_allclose(res.displacements[-1, 1],
                               res.displacements[len(up) - 1, 1],
                               rtol=1e-12)


def test_bauschinger_kinematic_vs_isotropic():
    """Full reversal to -1.5 sy: kinematic hardening re-yields early
    (at sigma = back - sy = -0.5 sy) and lands on the antisymmetric
    branch; isotropic stays elastic to the expanded surface."""
    sched = np.concatenate([ramp_schedule(1.5, 15),
                            np.linspace(1.3, -1.5, 15)])
    kin = solve_elastoplastic(bar_1d(), sigma_y=SY, hardening_kin=H,
                              load_factors=sched)
    iso = solve_elastoplastic(bar_1d(), sigma_y=SY, hardening_iso=H,
                              load_factors=np.concatenate(
                                  [ramp_schedule(1.5, 15),
                                   np.linspace(1.3, -1.4, 15)]))
    assert kin.converged and iso.converged

    # Kinematic endpoint: antisymmetric state (see closed form in the
    # module docstring of solvers/plasticity.py): eps_p = -(1.5-sy)/H,
    # back = -(1.5 - sy), u = L (sigma/E + eps_p).
    np.testing.assert_allclose(kin.back_stress[-1, 0], -(1.5 - SY),
                               rtol=1e-10)
    np.testing.assert_allclose(kin.plastic_strain[-1, 0], -(1.5 - SY) / H,
                               rtol=1e-10)
    np.testing.assert_allclose(kin.displacements[-1, 1],
                               L * (-1.5 / E - (1.5 - SY) / H), rtol=1e-10)
    # Kinematic DID re-yield on the reversal (Bauschinger)...
    assert kin.n_plastic[15:].sum() > 0
    # ...isotropic did not (surface expanded to 1.5 sy; -1.4 is inside).
    assert iso.n_plastic[15:].sum() == 0
    np.testing.assert_allclose(
        iso.displacements[-1, 1],
        L * (-1.4 / E + (1.5 - SY) / H), rtol=1e-10)


def test_parallel_bars_redistribution():
    """Three coincident bars with staggered yield stresses share a load
    past partial yielding: each stress obeys the monotonic closed form
    at the common strain, and internal forces balance the applied load."""
    sy = np.array([1.0, 2.0, 3.0])
    p = TrussProblem(
        nodes=np.array([0.0, L]),
        elements=np.array([[0, 1], [0, 1], [0, 1]]),
        material=Material(young=E, area=A, density=1.0),
        loads=np.array([0.0, 1.0]),
        fixed_dofs=np.array([0]),
        dimension=1)
    # Target: bars 1-2 plastic, bar 3 elastic. P = sum sigma_i A.
    res = solve_elastoplastic(p, sigma_y=sy, hardening_iso=H,
                              target_load_factor=5.5, n_steps=11)
    assert res.converged
    eps = res.displacements[-1, 1] / L
    expected = np.where(E * eps <= sy, E * eps,
                        sy + ET * (eps - sy / E))
    np.testing.assert_allclose(res.stresses[-1], expected, rtol=1e-10)
    np.testing.assert_allclose(res.stresses[-1].sum() * A, 5.5, rtol=1e-10)
    assert 2.0 < E * eps < 3.0                 # bars 1,2 past yield only
    assert res.plastic_strain[-1, 2] == 0.0


def ten_bar_2d():
    """Small 2D cantilever truss for mirror/elastic-consistency tests."""
    nodes = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0],
                      [2.0, 0.0], [2.0, 1.0]])
    elements = np.array([[0, 2], [2, 4], [1, 3], [3, 5], [2, 3],
                         [4, 5], [0, 3], [1, 2], [2, 5], [3, 4]])
    loads = np.zeros(12)
    loads[9] = -1.0
    loads[5] = -1.0
    return TrussProblem(
        nodes=nodes, elements=elements,
        material=Material(young=E, area=A, density=1.0),
        loads=loads, fixed_dofs=np.array([0, 1, 2, 3]), dimension=2)


def test_elastic_limit_matches_linear_solver():
    """With an unreachable yield stress the elastoplastic path IS the
    linear solve at every step (same kinematics, same assembly)."""
    p = ten_bar_2d()
    res = solve_elastoplastic(p, sigma_y=1e9, target_load_factor=1.0,
                              n_steps=4)
    assert res.converged and res.n_plastic.sum() == 0
    lin = solve_nr(p, target_load_factor=1.0)
    np.testing.assert_allclose(res.displacements[-1],
                               lin.displacements.reshape(-1),
                               rtol=2e-5, atol=1e-9)
    # Proportionality: elastic steps scale linearly with the load factor.
    np.testing.assert_allclose(res.displacements[0],
                               0.25 * res.displacements[-1], rtol=1e-10)


def test_device_matches_host_mirror():
    """The jitted scan/while device program (float32) agrees with the
    float64 host tier on a cyclic 2D history — same contract as
    tests/test_host.py pins for every dense analysis."""
    p = ten_bar_2d()
    sched = np.concatenate([ramp_schedule(3.0, 6),
                            np.linspace(2.0, -1.0, 4), [0.0]])
    kwargs = dict(sigma_y=2.0, hardening_iso=20.0, hardening_kin=10.0,
                  load_factors=sched)
    h = solve_elastoplastic(p, host=True, **kwargs)
    d = solve_elastoplastic(p, host=False, **kwargs)
    assert h.converged and d.converged
    scale = np.abs(h.displacements).max()
    np.testing.assert_allclose(d.displacements, h.displacements,
                               atol=2e-5 * scale)
    np.testing.assert_allclose(d.stresses, h.stresses,
                               atol=1e-4 * np.abs(h.stresses).max())
    np.testing.assert_allclose(d.plastic_strain, h.plastic_strain,
                               atol=1e-5)
    np.testing.assert_allclose(d.n_plastic, h.n_plastic)


def test_perfect_plasticity_plateau():
    """Zero hardening: the single bar's stress saturates at sigma_y and
    the tangent floor keeps Newton finite; a statically determinate bar
    AT the limit load still equilibrates (sigma = sy exactly)."""
    res = solve_elastoplastic(bar_1d(), sigma_y=SY, hardening_iso=0.0,
                              load_factors=[0.5, 0.9, 1.0])
    assert res.converged
    np.testing.assert_allclose(res.stresses[-1, 0], SY, rtol=1e-9)
    # Beyond the limit load no equilibrium exists: the solver must
    # report non-convergence, not a wrong answer.
    over = solve_elastoplastic(bar_1d(), sigma_y=SY, hardening_iso=0.0,
                               load_factors=[0.5, 1.05], max_iter=40)
    assert not over.converged


def test_validation_errors():
    with pytest.raises(ValueError, match="sigma_y"):
        solve_elastoplastic(bar_1d(), sigma_y=0.0)
    with pytest.raises(ValueError, match="hardening"):
        solve_elastoplastic(bar_1d(), sigma_y=1.0, hardening_iso=-1.0)
    with pytest.raises(ValueError, match="non-empty"):
        solve_elastoplastic(bar_1d(), sigma_y=1.0, load_factors=[])


# ---------------------------------------------------------------------------
# Explicit elastoplastic transient (solve_transient_plastic)
# ---------------------------------------------------------------------------

from pinn_fem_tpu.solvers.plasticity import solve_transient_plastic  # noqa: E402


def sdof_bar(rho=2.0):
    """One element, mass lumped at the free node: an elastoplastic SDOF
    oscillator (k = EA/L = 100, m = rho A L / 2 = 1, omega_el = 10)."""
    return TrussProblem(
        nodes=np.array([0.0, 1.0]),
        elements=np.array([[0, 1]]),
        material=Material(young=E, area=A, density=rho),
        loads=np.array([0.0, 1.0]),
        fixed_dofs=np.array([0]),
        dimension=1)


def test_transient_elastic_limit_matches_linear():
    """Unreachable yield stress: the plastic integrator IS the linear
    central-difference host integrator, displacement-for-displacement."""
    from pinn_fem_tpu.solvers.dynamics import solve_transient

    p = sdof_bar()
    n = 400
    res = solve_transient_plastic(p, sigma_y=1e9, n_steps=n,
                                  record_every=10, probe_dofs=[1])
    lin = solve_transient(p, dt=res.dt, n_steps=n, record_every=10,
                          probe_dofs=np.array([1]), method="central",
                          host=True)
    np.testing.assert_allclose(res.displacements, lin.displacements,
                               rtol=1e-12, atol=1e-15)
    assert res.plastic_work[-1] == 0.0


def test_transient_energy_balance_and_shakedown():
    """Step load past yield: (1) KE + SE_el + W_plastic tracks the
    external work to integrator accuracy at EVERY record; (2) after the
    first plastic excursion the response shakes down to elastic
    oscillation (W_plastic constant); (3) it oscillates about the
    bilinear static equilibrium, not the elastic one."""
    p = sdof_bar()
    n = 4000
    res = solve_transient_plastic(p, sigma_y=SY, hardening_iso=H,
                                  n_steps=n, record_every=10,
                                  probe_dofs=[1])
    w_in = res.external_work
    e_sum = res.kinetic_energy + res.strain_energy + res.plastic_work
    scale = np.abs(w_in).max()
    np.testing.assert_allclose(e_sum, w_in, atol=0.02 * scale)
    assert res.plastic_work[-1] > 0.05 * scale
    # Shakedown: essentially no plastic work accumulates over the last
    # three quarters.  After the first excursion the elastic oscillation
    # peak sits exactly ON the expanded yield surface (a step load past
    # yield always shakes down to grazing contact), so explicit steps
    # commit O(eps) micro-increments each cycle — measured 2e-6 relative
    # over 3000 steps; 1e-4 bounds it with margin while still failing on
    # any real ratcheting.
    i_q = len(w_in) // 4
    np.testing.assert_allclose(res.plastic_work[i_q:],
                               res.plastic_work[-1],
                               rtol=1e-4)
    # Oscillation center: after shakedown the bar oscillates ELASTICALLY
    # about the plastic-strain-shifted equilibrium u_c = L (eps_p + s/E)
    # with s = P/A.  (The static bilinear curve is NOT the right center:
    # here P/A = SY exactly, so the static formula has no plastic term,
    # while the dynamic overshoot accumulates eps_p ~ 2.7 EY.)
    u = res.displacements[:, 0]
    u_el = 1.0 / E                  # purely elastic center, L = 1
    u_c = res.final_plastic_strain[0] + u_el
    assert abs(np.mean(u[i_q:]) - u_c) < 0.05 * u_c
    # Plasticity moved the center well above the elastic one, and the
    # motion never returns near the elastic center.
    assert u_c > 2.0 * u_el
    assert u[i_q:].min() > 2.0 * u_el


def test_transient_residual_deformation():
    """A short pulse drives the bar plastic; with mass damping the
    motion settles onto the RESIDUAL state u = L eps_p, zero stress."""
    p = sdof_bar()
    n = 8000
    amp = np.zeros(n)
    amp[:400] = 1.5                 # pulse well past yield
    res = solve_transient_plastic(p, sigma_y=SY, hardening_iso=H,
                                  n_steps=n, amplitude=amp,
                                  damping=(2.0, 0.0), record_every=40,
                                  probe_dofs=[1])
    ep = res.final_plastic_strain[0]
    assert ep > 1e-3                # it DID yield
    np.testing.assert_allclose(res.final_displacement[1], 1.0 * ep,
                               rtol=2e-3)
    np.testing.assert_allclose(res.velocities[-1, 0], 0.0, atol=1e-5)
    # Stress envelope saw the plastic plateau, final state is unloaded.
    assert res.stress_envelope[0] > SY


def test_transient_device_matches_host():
    """f32 device scan vs f64 host loop on a 2D truss pulse past yield —
    the explicit-recurrence mirror bound (tests/test_host.py family)."""
    p = ten_bar_2d()
    n = 400
    amp = np.concatenate([np.linspace(0, 4.0, 200), np.zeros(200)])
    kw = dict(sigma_y=2.0, hardening_iso=20.0, n_steps=n, amplitude=amp,
              damping=(0.5, 0.0), record_every=20, probe_dofs=[9, 11])
    h = solve_transient_plastic(p, host=True, **kw)
    d = solve_transient_plastic(p, host=False, **kw)
    scale = np.abs(h.displacements).max()
    np.testing.assert_allclose(d.displacements, h.displacements,
                               atol=5e-4 * scale)
    np.testing.assert_allclose(d.plastic_work[-1], h.plastic_work[-1],
                               rtol=5e-3, atol=1e-8)
    np.testing.assert_allclose(d.final_plastic_strain,
                               h.final_plastic_strain, atol=1e-6)


def test_transient_validation():
    p = sdof_bar()
    with pytest.raises(ValueError, match="multiple"):
        solve_transient_plastic(p, sigma_y=1.0, n_steps=11, record_every=2)
    with pytest.raises(ValueError, match="amplitude"):
        solve_transient_plastic(p, sigma_y=1.0, n_steps=10,
                                amplitude=[1.0, 2.0])
