"""Regression tests for the round-2 code-review findings (each reproduced
before the fix; see the corresponding commit message)."""

import numpy as np
import pytest

from pinn_fem_tpu import (Material, TrussProblem, harmonic_response,
                          modal_analysis, solve_transient,
                          solve_transient_checkpointed, stable_dt)


def bar_1d(n=2, young=4.0, area=0.5, density=2.0):
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(n)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=young, area=area, density=density),
                        loads, np.array([0]), 1)


def test_harmonic_finite_at_omega_one_undamped():
    """w = 1 rad/s with alpha = 0 made the fixed-DOF block rows exactly
    zero (unit fictitious mass in the -w^2 M term) -> singular solve,
    all-NaN output.  Closed form must come out instead."""
    p = bar_1d()
    k, m = 2.0, 0.5
    res = harmonic_response(p, [1.0], damping=(0.0, 0.0),
                            probe_dofs=np.array([1]))
    assert np.isfinite(res.amplitude).all()
    np.testing.assert_allclose(res.amplitude[0, 0],
                               1.0 / abs(k - m * 1.0**2), rtol=1e-5)


def test_auto_dt_stable_with_beta_damping():
    """dt='auto' composed the UNDAMPED Gershgorin bound with beta
    damping, which shrinks the central-difference limit -> NaN blow-up.
    The damped bound must integrate stably."""
    from pinn_fem_tpu.io.analysis import run_transient

    p = bar_1d(6)
    res = run_transient(p, {"type": "transient", "dt": "auto",
                            "n_steps": 400, "record_every": 40,
                            "damping": [0.0, 0.05],
                            "probe_nodes": [5]})
    d = np.asarray(res["displacements"])
    assert np.isfinite(d).all()
    # Damped bound is strictly below the undamped one.
    assert res["dt"] < stable_dt(p)


def test_checkpoint_boundary_records_with_varying_amplitude():
    """The segment-end snapshot peek clamped the amplitude at the
    segment's last sample, so boundary VELOCITY records diverged from an
    uninterrupted run under time-varying loads (7.4% measured)."""
    p = bar_1d(4)
    dt = 0.5 * stable_dt(p)
    n = 400
    t = dt * np.arange(n)
    amp = np.sin(2.0 * np.pi * t / (n * dt) * 3.0)
    kw = dict(damping=(0.1, 0.0), method="central", record_every=10,
              probe_dofs=np.array([3]))
    plain = solve_transient(p, dt=dt, n_steps=n, amplitude=amp, **kw)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        seg = solve_transient_checkpointed(p, dt, n, d, 100,
                                           amplitude=amp, **kw)
    # Restart reconstructs u_prev = u - dt*v: one float32 rounding per
    # boundary (1e-5 relative observed) — far below the 7.4% pre-fix bug.
    np.testing.assert_allclose(seg.displacements, plain.displacements,
                               rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(seg.velocities, plain.velocities,
                               rtol=1e-4, atol=1e-8)


def test_buckling_large_mesh_routes_to_banded():
    """Round 2 raised above DENSE_DOF_LIMIT; round 3 (VERDICT #5) routes
    to the banded subspace iteration instead — a 1D chain in TENSION has
    no destabilizing direction, so every factor is +inf (the path runs,
    it does not raise)."""
    from pinn_fem_tpu import buckling_analysis
    import pinn_fem_tpu.solvers.newton as newton

    p = bar_1d(50)
    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 10
        res = buckling_analysis(p, n_modes=1, n_iter=5)
    finally:
        newton.DENSE_DOF_LIMIT = orig
    assert np.isinf(res.load_factors[0])      # tension: no buckling
    assert np.isfinite(res.axial_forces).all()


def test_material_change_invalidates_dynamics_caches():
    """Mutating problem.material and re-solving with the SAME data object
    must rebuild K and M (stale caches silently reused the old ones)."""
    p = bar_1d(4)
    data = p.to_device()
    dt = 0.4 * stable_dt(p)
    a = solve_transient(p, dt=dt, n_steps=100, record_every=100,
                        probe_dofs=np.array([3]), data=data)
    p.material = Material(young=16.0, area=0.5, density=2.0)  # 4x stiffer
    b = solve_transient(p, dt=dt, n_steps=100, record_every=100,
                        probe_dofs=np.array([3]), data=data)
    # 4x stiffness -> materially different trajectory (was: identical).
    assert abs(float(a.displacements[-1, 0])
               - float(b.displacements[-1, 0])) > 1e-4
    # And Newmark's cached factorization too.
    p2 = bar_1d(4)
    data2 = p2.to_device()
    an = solve_transient(p2, dt=dt, n_steps=100, record_every=100,
                         method="newmark", probe_dofs=np.array([3]),
                         data=data2)
    p2.material = Material(young=16.0, area=0.5, density=2.0)
    bn = solve_transient(p2, dt=dt, n_steps=100, record_every=100,
                         method="newmark", probe_dofs=np.array([3]),
                         data=data2)
    assert abs(float(an.displacements[-1, 0])
               - float(bn.displacements[-1, 0])) > 1e-4


def test_modal_propagator_exact_at_critical_damping():
    """zeta = 1 exactly: the companion matrix is DEFECTIVE and the old
    eigendecomposition route returned garbage without raising (27%
    error); the closed-form propagator must hit the critically damped
    step response u = (F/k)(1 - e^{-wt}(1 + wt))."""
    p = bar_1d(2)
    k, m = 2.0, 0.5
    w = np.sqrt(k / m)
    alpha = 2.0 * w                  # zeta = alpha/(2w) = 1 exactly
    dt = 0.3
    r = solve_transient(p, dt, 40, method="modal", record_every=1,
                        damping=(alpha, 0.0))
    t = r.times
    expect = (1.0 / k) * (1.0 - np.exp(-w * t) * (1.0 + w * t))
    np.testing.assert_allclose(r.displacements[:, 1], expect, atol=1e-6)


def test_post_buckling_prestress_reports_negative_eigenvalue():
    """Prestress past the critical load: the softened mode's eigenvalue
    must surface as NEGATIVE, not be clamped to a silent 0 Hz."""
    from tests.test_buckling import braced_column

    from pinn_fem_tpu import buckling_analysis

    p = braced_column()
    res = buckling_analysis(p, n_modes=1)
    lam_c = res.load_factors[0]
    modal = modal_analysis(p, n_modes=1,
                           prestress_u=1.5 * lam_c * res.u_base)
    assert modal.eigenvalues[0] < -1e-3
    assert modal.omegas[0] == 0.0


# --- second review batch ---------------------------------------------------


def test_cqc_zero_damping_is_srss():
    """zeta = 0 made the CQC rho diagonal 0/0 -> NaN displacements
    reported as success; it must degenerate exactly to SRSS."""
    from tests.test_spectrum import chain

    from pinn_fem_tpu import response_spectrum

    p = chain()
    srss = response_spectrum(p, 1.0, n_modes=4, combination="srss")
    cqc0 = response_spectrum(p, 1.0, n_modes=4, combination="cqc",
                             damping_ratio=0.0)
    assert np.isfinite(cqc0.displacements).all()
    np.testing.assert_allclose(cqc0.displacements, srss.displacements,
                               rtol=1e-6)


def test_ensemble_geometric_nonlinear_requires_2d():
    """Round 2 rejected nonlinear ensembles outright; round 3 (VERDICT
    #4) batches the Green-Lagrange integrator — but the GL kernel is
    2D/3D only, so a 1D ensemble must still raise rather than silently
    return linear results (the original review finding, one level
    deeper)."""
    from pinn_fem_tpu.io.analysis import run_transient

    p = bar_1d(4)
    with pytest.raises(ValueError, match="2D or 3D"):
        run_transient(p, {"type": "transient", "dt": 0.01, "n_steps": 10,
                          "amplitudes": [[1.0] * 10],
                          "geometric_nonlinear": True})


def test_harmonic_payload_guard():
    from pinn_fem_tpu.io.analysis import run_harmonic

    p = bar_1d(6)
    with pytest.raises(ValueError, match="probe"):
        run_harmonic(p, {"type": "harmonic",
                         "omegas": {"start": 0.1, "stop": 1.0,
                                    "num": 5000}})


def test_thermal_ring_ambiguity_prefers_per_node():
    """Closed ring: nelm == nnode, so a list matches both shapes; the
    node-centric schema semantics must win (end-node averaging)."""
    from pinn_fem_tpu.ops.thermal import element_delta_t

    th = np.array([[np.cos(a), np.sin(a)]
                   for a in 2 * np.pi * np.arange(4) / 4])
    p = TrussProblem(th, np.array([[0, 1], [1, 2], [2, 3], [3, 0]]),
                     Material(1.0, 1.0, 1.0), np.zeros(8),
                     np.array([0, 1]), 2)
    data = p.to_device()
    import jax

    dt_e = np.asarray(jax.device_get(
        element_delta_t(data, np.array([0.0, 10.0, 20.0, 30.0]), 4)))
    np.testing.assert_allclose(dt_e, [5.0, 15.0, 25.0, 15.0])


def test_batch_request_rejects_unresolvable_measurements():
    """measured_batch with a non-pinn template silently became a
    pure-physics solve; it must raise instead."""
    from pinn_fem_tpu.parallel.batched import solve_batch_request

    body = {
        "problem": {
            "nodes": [[0.0], [1.0], [2.0]],
            "elements": [[0, 1], [1, 2]],
            "material": {"young": 1.0, "area": 1.0, "density": 1.0},
            "loads": [0.0, 0.0, 1.0],
            "fixed_dofs": [0],
            "solver_type": "fem",
        },
        "loads_batch": [[0.0, 0.0, 1.0]],
        "measured_batch": [[1.0, 2.0]],
    }
    with pytest.raises(ValueError, match="no measured DOFs"):
        solve_batch_request(body)


def test_modal_json_carries_ok_flag():
    from pinn_fem_tpu.io.analysis import run_modal

    p = bar_1d(4)
    out = run_modal(p, {"type": "modal", "n_modes": 2})
    assert out["ok"] is True


# --- third review batch ----------------------------------------------------


def test_thermal_rejects_trainable_material():
    from pinn_fem_tpu.io.schema import parse_problem_dict

    doc = {
        "nodes": [[0.0], [1.0], [2.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "nn_config": {"young": {"enabled": True}},
        "loads": [0.0, 0.0, 0.0],
        "fixed_dofs": [0],
        "solver_type": "pinn-gd",
        "thermal": {"alpha": 1e-4, "delta_t": 10.0},
    }
    with pytest.raises(ValueError, match="trainable"):
        parse_problem_dict(doc)


def test_analysis_plus_prescribed_rejected(tmp_path):
    import json

    from pinn_fem_tpu.cli.generic import run

    doc = {
        "nodes": [[0.0], [1.0], [2.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 0.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "prescribed_displacements": {"dofs": [2], "values": [0.1]},
        "analysis": {"type": "modal", "n_modes": 1},
    }
    pf = tmp_path / "bad.json"
    pf.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="prescribed"):
        run(str(pf))


def test_random_scalar_callable_and_undamped_guard():
    from tests.test_random_response import sdof_bar

    from pinn_fem_tpu import random_response

    p = sdof_bar()
    om = np.linspace(0.1, 5.0, 200)
    res = random_response(p, lambda w: 0.5, om, damping=(0.3, 0.0),
                          probe_dofs=np.array([1]))
    assert np.isfinite(res.rms).all()
    with pytest.raises(ValueError, match="damping"):
        random_response(p, 1.0, om)


def test_reduction_guards():
    from tests.test_reduction import chain

    from pinn_fem_tpu import guyan_reduce
    import pinn_fem_tpu.solvers.newton as newton

    p = chain()
    with pytest.raises(ValueError, match="duplicates"):
        guyan_reduce(p, master_dofs=[4, 4])
    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 4
        with pytest.raises(ValueError, match="dense-only"):
            guyan_reduce(p, master_dofs=[4])
    finally:
        newton.DENSE_DOF_LIMIT = orig


def test_alternating_prestress_caches_coexist():
    """Alternating plain/prestressed transients must not thrash a
    single-slot operator cache (each thrash = full recompile)."""
    p = bar_1d(4)
    data = p.to_device()
    up = np.zeros(4)
    up[3] = 0.01
    kw = dict(dt=0.05, n_steps=20, record_every=20,
              probe_dofs=np.array([3]), data=data)
    solve_transient(p, **kw)
    solve_transient(p, prestress_u=up, **kw)
    cache = p._k_apply_cache
    assert isinstance(cache, dict) and len(cache) == 2
    fn_plain = cache[None][3]
    solve_transient(p, **kw)          # must HIT, not rebuild
    assert p._k_apply_cache[None][3] is fn_plain


# ---------------------------------------------------------------------------
# Round-3 review findings (inline review of the host-tier round)
# ---------------------------------------------------------------------------


def test_force_fn_rejected_for_noncentral_every_tier():
    """Finding #1: the host tier auto-selected for method='modal' with a
    moving load and silently ignored it — force_fn must raise for
    modal/newmark on BOTH tiers."""
    from pinn_fem_tpu.solvers.dynamics import (moving_load_force_fn,
                                               solve_transient)
    from tests.test_host import tower

    p = tower()
    f_fn = moving_load_force_fn(p, path_nodes=[0, 2, 4], speed=0.5,
                                magnitude=-1.0, dt=0.1, component=1)
    for method in ("modal", "newmark"):
        for host in (True, False, None):
            with pytest.raises(ValueError, match="central"):
                solve_transient(p, 0.1, n_steps=10, method=method,
                                force_fn=f_fn, host=host)


def test_stress_envelope_rejects_prestress_and_moving_load():
    """Finding #2: the envelope recompute integrates amplitude*loads
    under K only — pairing it with prestress or a moving load would
    return an envelope of a DIFFERENT system than the displacements."""
    from pinn_fem_tpu.io.analysis import run_transient
    from tests.test_dynamics import _taut_chain

    p, up = _taut_chain(n_nodes=5)
    base = {"type": "transient", "dt": 0.01, "n_steps": 10,
            "probe_nodes": [2], "include_stress_envelope": True}
    with pytest.raises(ValueError, match="amplitude contract"):
        run_transient(p, {**base, "prestress": {"u": list(up)}})
    with pytest.raises(ValueError, match="amplitude contract"):
        run_transient(p, {**base, "load": {
            "type": "moving", "path_nodes": [0, 1, 2, 3, 4],
            "speed": 0.5, "magnitude": -1.0}})


def test_json_auto_dt_uses_prestressed_bound():
    """Finding #3: dt='auto' with prestress must come from the
    PRESTRESSED Gershgorin bound (tension raises omega_max) — the
    returned dt equals stable_dt(prestress_u=u0), strictly below the
    unstressed bound on a geometric-stiffness-dominated structure."""
    from pinn_fem_tpu.io.analysis import run_transient
    from pinn_fem_tpu.solvers.dynamics import stable_dt
    from tests.test_dynamics import _taut_chain

    p, up = _taut_chain(n_nodes=9, tension=5.0, young=1.0)
    out = run_transient(p, {
        "type": "transient", "dt": "auto", "n_steps": 10,
        "probe_nodes": [4], "prestress": {"u": list(up)}})
    np.testing.assert_allclose(out["dt"], stable_dt(p, prestress_u=up),
                               rtol=1e-6)
    assert out["dt"] < stable_dt(p)


def test_buckling_host_gate_honors_data():
    """Finding #4: an explicitly passed ProblemData may carry replaced
    loads; the host path (problem.loads) must not silently ignore it."""
    from pinn_fem_tpu.solvers.buckling import buckling_analysis
    from tests.test_buckling import braced_column

    p = braced_column()
    data = p.to_device()
    # data given -> traced dense path; doubled loads halve the factors.
    a = buckling_analysis(p, n_modes=1, data=data)
    data2 = data.replace(loads=2.0 * data.loads)
    b = buckling_analysis(p, n_modes=1, data=data2)
    np.testing.assert_allclose(a.load_factors[0],
                               2.0 * b.load_factors[0], rtol=1e-4)
    # host=True + data is contradictory -> explicit error.
    with pytest.raises(ValueError, match="host"):
        buckling_analysis(p, n_modes=1, data=data2, host=True)


def test_harmonic_phase_convention_matches_across_tiers():
    """Finding #5: undamped negative-real FRF points must give -pi on
    BOTH tiers (the zero-damping limit from below), not -pi vs +pi."""
    from pinn_fem_tpu.solvers.harmonic import harmonic_response

    nodes = np.array([0.0, 1.0])
    p = TrussProblem(nodes, np.array([[0, 1]]),
                     Material(young=4.0, area=1.0, density=2.0),
                     np.array([0.0, 1.0]), np.array([0]), 1)
    om = np.array([2.5])                 # above w0 = 2: negative real FRF
    h_host = harmonic_response(p, om, damping=(0.0, 0.0),
                               probe_dofs=np.array([1]), host=True)
    h_dev = harmonic_response(p, om, damping=(0.0, 0.0),
                              probe_dofs=np.array([1]), host=False)
    assert h_host.real[0, 0] < 0 and h_dev.real[0, 0] < 0
    np.testing.assert_allclose(h_host.phase[0, 0], -np.pi, atol=1e-5)
    np.testing.assert_allclose(h_dev.phase[0, 0], h_host.phase[0, 0],
                               atol=1e-4)


def test_reduction_rejects_stale_data_argument():
    """Finding #7: the host rewrite no longer consumes ProblemData —
    passing one must refuse loudly instead of being silently ignored."""
    from pinn_fem_tpu.solvers.reduction import guyan_reduce
    from tests.test_host import tower

    p = tower()
    with pytest.raises(ValueError, match="no longer consumed"):
        guyan_reduce(p, [p.ndof - 2], data=p.to_device())


def test_plastic_transient_auto_dt_forwards_damping():
    """ADVICE r3 (medium): solve_transient_plastic's default dt ignored
    the damping it was about to integrate with; beta-Rayleigh damping
    shrinks the explicit limit, so the undamped bound blows up."""
    from pinn_fem_tpu.solvers.plasticity import solve_transient_plastic

    p = bar_1d(n=4)
    beta = 0.02
    res = solve_transient_plastic(p, sigma_y=1e9, damping=(0.0, beta),
                                  n_steps=400,
                                  probe_dofs=np.array([p.ndof - 1]))
    assert np.isfinite(res.displacements).all()
    assert res.dt <= stable_dt(p, damping=(0.0, beta)) * (1 + 1e-12)
    assert res.dt < stable_dt(p)          # strictly tighter than undamped


def test_plastic_host_nonconverged_state_pinned_to_final_u():
    """ADVICE r3 (low): on a non-converged load step the host tier
    reported sigma at the PRE-update displacement while u included the
    final Newton update; the device tier re-evaluates at the final u.
    With max_iter=1 on a yielding step the two must still agree."""
    from pinn_fem_tpu.solvers.plasticity import solve_elastoplastic

    p = bar_1d(n=3, young=100.0, area=1.0)
    kw = dict(sigma_y=0.5, hardening_iso=10.0, load_factors=[2.0],
              max_iter=1, tol=1e-12)
    h = solve_elastoplastic(p, host=True, **kw)
    d = solve_elastoplastic(p, host=False, **kw)
    assert not h.converged and not d.converged
    np.testing.assert_allclose(h.displacements, d.displacements,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(h.stresses, d.stresses, rtol=1e-4,
                               atol=1e-6)


def test_plane_harmonic_rejects_driven_supports():
    """ADVICE r3 (low): a driven-support plane harmonic document must
    refuse loudly, not return the homogeneous-support FRF."""
    from pinn_fem_tpu.models.plane import PlaneProblem, plane_harmonic

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    elems = np.array([[0, 1, 2, 3]])
    loads = np.zeros(8)
    loads[5] = 1.0
    p = PlaneProblem(nodes=nodes, elements=elems, young=1.0, poisson=0.3,
                     thickness=1.0, density=1.0, loads=loads,
                     fixed_dofs=np.array([0, 1, 6, 7]),
                     prescribed=np.array([0.0, 0.1, 0.0, 0.0]))
    with pytest.raises(ValueError, match="homogeneous"):
        plane_harmonic(p, [1.0])
