"""Non-structural (payload) point masses: models/problem.point_masses.

The reference has no mass concept at all (statics-only — SURVEY §7.3);
payload mass is the natural extension of this framework's dynamics
family.  One ProblemData field feeds every consumer: ops/mass adds it
to lumped/consistent/DIA matrices, the host tier mirrors it 1:1
(tests here pin that), and the identification twins' inline mass
builders carry it too.  Closed forms: the tip-mass oscillator.
"""

import numpy as np
import pytest

from pinn_fem_tpu import (Material, TrussProblem, consistent_mass,
                          lumped_mass, modal_analysis, solve_transient,
                          stable_dt)


def tip_mass_bar(m_tip=2.0, rho=1e-6, young=1.0, area=1.0):
    """1D two-node bar, fixed at 0, payload m at the tip: the canonical
    SDOF oscillator k = EA/L, m ≈ m_tip (rho negligible)."""
    return TrussProblem(
        np.array([0.0, 1.0]), np.array([[0, 1]]),
        Material(young=young, area=area, density=rho),
        np.array([0.0, 1.0]), np.array([0]), 1,
        point_masses=np.array([0.0, m_tip]))


def test_validation():
    with pytest.raises(ValueError, match="one value per node"):
        TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(1.0, 1.0, 1.0), np.array([0.0, 1.0]),
                     np.array([0]), 1, point_masses=np.array([1.0]))
    with pytest.raises(ValueError, match="nonnegative"):
        TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(1.0, 1.0, 1.0), np.array([0.0, 1.0]),
                     np.array([0]), 1, point_masses=np.array([0.0, -1.0]))
    # All-zero collapses to absent (no behavior change anywhere).
    p = TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(1.0, 1.0, 1.0), np.array([0.0, 1.0]),
                     np.array([0]), 1, point_masses=np.array([0.0, 0.0]))
    assert p.point_masses is None


def test_mass_matrices_device_host_mirror():
    """Every mass representation carries the payload identically —
    device lumped/consistent, their host mirrors, and the DIA form."""
    from pinn_fem_tpu.ops.dia import dia_diagonal, dia_layout
    from pinn_fem_tpu.ops.host import (host_consistent_mass,
                                       host_lumped_mass)
    from pinn_fem_tpu.ops.mass import consistent_mass_dia

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    p = TrussProblem(nodes, np.array([[0, 1], [1, 2], [0, 2]]),
                     Material(2.0, 0.7, 1.3),
                     np.zeros(6), np.array([0, 1]), 2,
                     point_masses=np.array([0.5, 0.0, 2.5]))
    data = p.to_device()
    m_dev = np.asarray(lumped_mass(data, p.material))
    m_host = host_lumped_mass(p)
    np.testing.assert_allclose(m_dev, m_host, rtol=1e-6)
    # The payload lands on every translational DOF of its node.
    p0 = TrussProblem(nodes, p.elements, p.material, p.loads,
                      p.fixed_dofs, 2)
    np.testing.assert_allclose(
        m_host - host_lumped_mass(p0),
        [0.5, 0.5, 0.0, 0.0, 2.5, 2.5], atol=1e-12)

    mc_dev = np.asarray(consistent_mass(data, p.material))
    mc_host = host_consistent_mass(p)
    np.testing.assert_allclose(mc_dev, mc_host, rtol=1e-6, atol=1e-7)

    layout = dia_layout(np.asarray(data.dof_map), p.ndof)
    md = consistent_mass_dia(layout, data, p.material)
    np.testing.assert_allclose(np.asarray(dia_diagonal(layout, md)),
                               np.diag(mc_host), rtol=1e-6)


def test_modal_tip_mass_closed_form():
    """SDOF: omega^2 = (EA/L) / (m_tip + rho A L / 2)."""
    m_tip = 2.0
    p = tip_mass_bar(m_tip=m_tip, rho=0.1)
    res = modal_analysis(p, n_modes=1)
    w2_true = 1.0 / (m_tip + 0.5 * 0.1)
    np.testing.assert_allclose(res.eigenvalues[0], w2_true, rtol=1e-5)
    # And the payload actually matters: without it the bar is 40x
    # stiffer-per-mass.
    p0 = tip_mass_bar(m_tip=0.0, rho=0.1)
    assert p0.point_masses is None
    res0 = modal_analysis(p0, n_modes=1)
    assert res0.eigenvalues[0] > 10 * res.eigenvalues[0]


def test_transient_tip_mass_step_response():
    """Undamped step response of the tip-mass oscillator: peak 2 f/k at
    t = T/2, period T = 2 pi sqrt(m/k)."""
    m_tip, k = 2.0, 1.0
    p = tip_mass_bar(m_tip=m_tip, rho=1e-7)
    T = 2.0 * np.pi * np.sqrt(m_tip / k)
    n_steps = 2000
    dt = 2.0 * T / n_steps                 # two full periods
    res = solve_transient(p, dt=dt, n_steps=n_steps,
                          probe_dofs=np.array([1]))
    u = np.asarray(res.displacements)[:, 0]
    np.testing.assert_allclose(u.max(), 2.0 / k, rtol=2e-3)
    # Peak time = T/2 (first peak).
    t_peak = res.times[int(np.argmax(u[: n_steps // 2]))]
    np.testing.assert_allclose(t_peak, T / 2.0, rtol=2e-2)


def test_stable_dt_includes_payload():
    """Payload mass RAISES the critical explicit step (omega_max drops);
    integrating at the heavier bound must stay stable."""
    light = tip_mass_bar(m_tip=0.0, rho=1.0)
    heavy = tip_mass_bar(m_tip=10.0, rho=1.0)
    assert stable_dt(heavy) > 2.0 * stable_dt(light)
    res = solve_transient(heavy, dt=stable_dt(heavy), n_steps=500,
                          probe_dofs=np.array([1]))
    assert np.all(np.isfinite(res.displacements))


def test_identification_twins_carry_payload():
    """The inline mass builders of the identification family (elem
    truth models) must match the first-class mass path, or twin-data
    studies on payload-carrying structures would be silently wrong."""
    import jax

    from pinn_fem_tpu.solvers.modal_inverse import modal_observables_elem

    p = tip_mass_bar(m_tip=2.0, rho=0.1)
    lam, _ = modal_observables_elem(p, 1.0, 1.0, 0.1, 1)
    res = modal_analysis(p, n_modes=1)
    np.testing.assert_allclose(np.asarray(jax.device_get(lam))[0],
                               res.eigenvalues[0], rtol=1e-5)


def test_schema_point_masses_forms(tmp_path):
    """Both JSON forms parse; the modal route sees the payload."""
    import json

    from pinn_fem_tpu.io.analysis import run_modal
    from pinn_fem_tpu.io.schema import parse_problem_dict

    base = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 1.0, "area": 1.0, "density": 0.1},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
    }
    w2_true = 1.0 / (2.0 + 0.05)
    for spec in ([0.0, 2.0], [[1, 2.0]], [[1, 1.5], [1, 0.5]]):
        doc = dict(base, point_masses=spec)
        parsed = parse_problem_dict(doc)
        np.testing.assert_allclose(parsed.problem.point_masses,
                                   [0.0, 2.0], atol=1e-12)
        out = run_modal(parsed.problem, {"n_modes": 1})
        np.testing.assert_allclose(out["eigenvalues"][0], w2_true,
                                   rtol=1e-5)
    with pytest.raises(ValueError, match="valid node"):
        parse_problem_dict(dict(base, point_masses=[[5, 1.0]]))
    with pytest.raises(ValueError, match="per-node list"):
        parse_problem_dict(dict(base, point_masses=[[[1.0]]]))
