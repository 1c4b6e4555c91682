"""Sizing (design) optimization: solvers/sizing.py.

Validation strategy mirrors the identification family's: exact closed
forms where they exist (FSD on statically determinate trusses IS the
stress-constrained optimum; compliance optima equalize strain-energy
density), an independent optimizer (scipy SLSQP with exact constraints)
where they don't, and mirror checks against the float64 host tier.
"""

import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.sizing import (fully_stressed_design,
                                         optimize_sizing,
                                         static_response_elem,
                                         _host_area_solve)


def two_bar(area=1.0, rho=1.0):
    """Symmetric determinate 2-bar: supports (0,0), (2,0), apex (1,1),
    unit downward tip load."""
    nodes = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 1.0]])
    elements = np.array([[0, 2], [1, 2]])
    loads = np.array([0.0, 0.0, 0.0, 0.0, 0.0, -1.0])
    return TrussProblem(nodes, elements,
                        Material(young=1.0, area=area, density=rho),
                        loads, np.arange(4), 2)


def three_bar(area=1.0):
    """Classic indeterminate 3-bar: supports at (-1,1), (0,1), (1,1),
    free node at the origin, skewed load."""
    nodes = np.array([[-1.0, 1.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]])
    elements = np.array([[0, 3], [1, 3], [2, 3]])
    loads = np.zeros(8)
    loads[6], loads[7] = 0.6, -1.0
    return TrussProblem(nodes, elements,
                        Material(young=1.0, area=area, density=1.0),
                        loads, np.arange(6), 2)


def test_static_response_elem_mirrors_host():
    """The traced per-element-area solve matches the float64 host mirror
    at the problem's own areas."""
    p = three_bar(area=0.7)
    areas = np.array([0.4, 0.9, 0.6])
    u_h, sigma_h = _host_area_solve(p, areas)
    u, sigma, n_ax, mass = static_response_elem(p, areas)
    np.testing.assert_allclose(np.asarray(u), u_h, rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sigma), sigma_h,
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n_ax), sigma_h * areas,
                               rtol=2e-5, atol=1e-7)
    lengths = np.array([np.sqrt(2.0), 1.0, np.sqrt(2.0)])
    assert abs(float(mass) - np.sum(areas * lengths)) < 1e-5


def test_fsd_determinate_is_exact():
    """Determinate truss: member forces don't depend on areas, so the
    FSD fixpoint converges immediately and every loaded member sits
    exactly at the stress limit."""
    limit = 0.8
    res = fully_stressed_design(two_bar(area=3.0), stress_limit=limit,
                                min_area=1e-9)
    assert res.converged and res.n_iter <= 3
    # Both bars carry |N| = P/sqrt(2); fully stressed: |sigma| = limit.
    np.testing.assert_allclose(np.abs(res.stress), limit, rtol=1e-9)
    n_true = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(res.areas, n_true / limit, rtol=1e-9)
    # mass = sum rho L |N| / limit.
    mass_true = 2.0 * np.sqrt(2.0) * n_true / limit
    assert abs(res.mass - mass_true) / mass_true < 1e-9
    assert res.mass < res.mass_initial


def test_fsd_zero_force_member_goes_to_gauge():
    """A zero-force member cannot be sized by stress — it lands on the
    min_area gauge."""
    # Vertical bar (1,2) carries the whole vertical load; the diagonal
    # (0,2) is zero-force (no horizontal load component).
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    elements = np.array([[0, 2], [1, 2]])
    loads = np.array([0.0, 0.0, 0.0, 0.0, 0.0, -1.0])
    p = TrussProblem(nodes, elements, Material(1.0, 1.0, 1.0),
                     loads, np.arange(4), 2)
    res = fully_stressed_design(p, stress_limit=0.5, min_area=1e-4)
    assert abs(res.areas[0] - 1e-4) < 1e-12          # zero-force: gauge
    np.testing.assert_allclose(res.areas[1], 2.0, rtol=1e-9)   # |N|=1


def test_optimize_mass_matches_fsd_on_determinate():
    """Gradient sizing reaches the known (FSD) optimum on the
    determinate 2-bar, and the polish pass guarantees feasibility."""
    limit = 0.8
    p = two_bar(area=3.0)
    fsd = fully_stressed_design(p, stress_limit=limit, min_area=1e-6)
    res = optimize_sizing(p, objective="mass", stress_limit=limit,
                          min_area=1e-6, n_iter=250, outer_rounds=3,
                          learning_rate=0.08)
    assert res.max_stress_ratio <= 1.0 + 1e-6        # feasible (polish)
    assert res.mass <= fsd.mass * 1.02               # within 2% of exact
    assert res.mass < res.mass_initial * 0.5         # actually optimized


def test_optimize_mass_indeterminate_not_worse_than_fsd():
    """On the indeterminate 3-bar the gradient method must at least tie
    the FSD heuristic (it can redistribute force paths; FSD cannot)."""
    limit = 0.5
    p = three_bar(area=2.0)
    fsd = fully_stressed_design(p, stress_limit=limit, min_area=1e-5)
    assert fsd.max_stress_ratio <= 1.0 + 1e-9
    res = optimize_sizing(p, objective="mass", stress_limit=limit,
                          min_area=1e-5, n_iter=300, outer_rounds=4,
                          learning_rate=0.08)
    assert res.max_stress_ratio <= 1.0 + 1e-6
    assert res.mass <= fsd.mass * 1.01


def test_optimize_vs_scipy_slsqp():
    """Independent optimizer check: scipy SLSQP with exact constraints
    on the 3-bar problem; our mass within 1.5% of its optimum."""
    import scipy.optimize

    limit = 0.5
    min_area = 1e-5
    p = three_bar(area=2.0)

    def max_ratio(a):
        _, sigma = _host_area_solve(p, np.asarray(a, dtype=float))
        return np.abs(sigma) / limit

    lengths = np.array([np.sqrt(2.0), 1.0, np.sqrt(2.0)])
    sol = scipy.optimize.minimize(
        lambda a: float(np.dot(lengths, a)), np.full(3, 2.0),
        method="SLSQP",
        bounds=[(min_area, None)] * 3,
        constraints=[{"type": "ineq",
                      "fun": lambda a: 1.0 - max_ratio(a)}],
        options={"maxiter": 200, "ftol": 1e-12})
    assert sol.success
    res = optimize_sizing(p, objective="mass", stress_limit=limit,
                          min_area=min_area, n_iter=300, outer_rounds=4,
                          learning_rate=0.08)
    assert res.max_stress_ratio <= 1.0 + 1e-6
    assert res.mass <= float(sol.fun) * 1.015


def test_optimize_displacement_constrained():
    """Stress limit inactive, tip-displacement limit active: mass drops
    until the tip sits at the limit."""
    p = two_bar(area=5.0)
    u0, _ = _host_area_solve(p, np.full(2, 5.0))
    d_lim = 4.0 * abs(u0[5])         # 4x the starting deflection
    res = optimize_sizing(p, objective="mass",
                          displacement_limit=d_lim,
                          probe_dofs=np.array([5]),
                          min_area=1e-6, n_iter=300, outer_rounds=4,
                          learning_rate=0.08)
    # The active constraint pins the optimum: ratio -> 1.
    assert 0.97 <= res.max_displacement_ratio <= 1.03
    # Determinate + symmetric: u scales as 1/A, so the optimal area is
    # a0/4 and the optimal mass a quarter of the start.
    assert abs(res.mass - res.mass_initial / 4.0) \
        < 0.05 * res.mass_initial / 4.0


def test_optimize_compliance_equalizes_energy_density():
    """Compliance at fixed volume: the optimality criterion is equal
    strain-energy density per unit volume across active members."""
    # Asymmetric 2-bar (different lengths and angles).
    nodes = np.array([[0.0, 0.0], [3.0, 0.0], [1.0, 1.2]])
    elements = np.array([[0, 2], [1, 2]])
    loads = np.array([0.0, 0.0, 0.0, 0.0, 0.4, -1.0])
    p = TrussProblem(nodes, elements, Material(1.0, 1.0, 1.0),
                     loads, np.arange(4), 2)
    lengths = np.array([np.linalg.norm([1.0, 1.2]),
                        np.linalg.norm([2.0, 1.2])])
    vol = float(np.sum(lengths))     # the uniform-area volume budget
    res = optimize_sizing(p, objective="compliance", volume=vol,
                          min_area=1e-6, n_iter=400, outer_rounds=1,
                          learning_rate=0.05)
    # Volume projection is exact.
    assert abs(float(np.sum(res.areas * lengths)) - vol) < 1e-6 * vol
    # Energy density sigma^2 / 2E equal across members (E = 1).
    dens = res.stress ** 2
    assert abs(dens[0] - dens[1]) / np.max(dens) < 0.02
    # And the optimized design beats the uniform start.
    u_uni, _ = _host_area_solve(p, np.ones(2))
    c_uni = float(np.dot(p.loads, u_uni))
    c_opt = float(np.dot(p.loads, res.displacements))
    assert c_opt < c_uni


def test_optimize_respects_max_area_bound():
    """The box parameterization keeps every iterate inside the bounds."""
    p = two_bar(area=1.0)
    res = optimize_sizing(p, objective="mass", stress_limit=0.2,
                          min_area=0.05, max_area=3.0,
                          n_iter=150, outer_rounds=2, polish=False,
                          learning_rate=0.1)
    assert np.all(res.areas >= 0.05 - 1e-9)
    assert np.all(res.areas <= 3.0 + 1e-9)


def test_sizing_input_validation():
    p = two_bar()
    with pytest.raises(ValueError, match="gauge minimum"):
        optimize_sizing(p, objective="mass")
    with pytest.raises(ValueError, match="volume"):
        optimize_sizing(p, objective="compliance")
    with pytest.raises(ValueError, match="min_area"):
        optimize_sizing(p, stress_limit=1.0, min_area=0.0)
    with pytest.raises(ValueError, match="max_area"):
        optimize_sizing(p, stress_limit=1.0, min_area=1.0, max_area=0.5)
    with pytest.raises(ValueError, match="objective"):
        optimize_sizing(p, objective="weight", stress_limit=1.0)
    with pytest.raises(ValueError, match="stress_limit"):
        fully_stressed_design(p, stress_limit=-1.0)


# ------------------------------------------------------------ load cases


def two_bar_cases():
    """Mirrored skew loads at the apex: each case governs one bar."""
    p = two_bar(area=3.0)
    ca = np.zeros(6); ca[4], ca[5] = 0.8, -1.0
    cb = np.zeros(6); cb[4], cb[5] = -0.8, -1.0
    return p, np.stack([ca, cb])


def test_fsd_envelope_sizes_each_member_by_its_governing_case():
    limit = 0.8
    p, cases = two_bar_cases()
    res = fully_stressed_design(p, stress_limit=limit, min_area=1e-9,
                                load_cases=cases)
    assert res.converged
    # Symmetric case pair -> symmetric envelope design.
    np.testing.assert_allclose(res.areas[0], res.areas[1], rtol=1e-9)
    # Every member fully stressed by its governing case.
    _, sigma = _host_area_solve(p, res.areas, loads=cases)
    np.testing.assert_allclose(np.max(np.abs(sigma), axis=0), limit,
                               rtol=1e-9)
    assert abs(res.max_stress_ratio - 1.0) < 1e-9


def test_single_case_design_fails_the_envelope():
    """Why envelopes exist: the design for case A alone is overstressed
    under case B."""
    limit = 0.8
    p, cases = two_bar_cases()
    from pinn_fem_tpu.models.problem import TrussProblem as TP

    p_a = TP(p.nodes, p.elements, p.material, cases[0], p.fixed_dofs, 2)
    res_a = fully_stressed_design(p_a, stress_limit=limit, min_area=1e-9)
    _, sigma_b = _host_area_solve(p, res_a.areas, loads=cases[1:])
    assert np.max(np.abs(sigma_b)) / limit > 1.5
    # And the honest envelope design is heavier than the one-case one.
    env = fully_stressed_design(p, stress_limit=limit, min_area=1e-9,
                                load_cases=cases)
    assert env.mass > res_a.mass * 1.2


def test_optimize_envelope_matches_fsd():
    limit = 0.8
    p, cases = two_bar_cases()
    fsd = fully_stressed_design(p, stress_limit=limit, min_area=1e-6,
                                load_cases=cases)
    res = optimize_sizing(p, objective="mass", stress_limit=limit,
                          load_cases=cases, min_area=1e-6,
                          n_iter=250, outer_rounds=4, learning_rate=0.08)
    assert res.max_stress_ratio <= 1.0 + 1e-6     # envelope feasibility
    assert res.mass <= fsd.mass * 1.02
    # Result contract: signed governing stress per member, (C, ndof)
    # displacements.
    assert res.stress.shape == (2,)
    assert res.displacements.shape == (2, 6)
    _, sigma = _host_area_solve(p, res.areas, loads=cases)
    np.testing.assert_allclose(np.abs(res.stress),
                               np.max(np.abs(sigma), axis=0), rtol=1e-12)


def test_compliance_weighted_cases_stay_symmetric():
    """Equal-weight mirrored cases -> the symmetric compliance design."""
    p, cases = two_bar_cases()
    vol = 2.0 * np.sqrt(2.0)
    res = optimize_sizing(p, objective="compliance", volume=vol,
                          load_cases=cases, case_weights=[1.0, 1.0],
                          min_area=1e-6, n_iter=200, outer_rounds=1)
    np.testing.assert_allclose(res.areas[0], res.areas[1], rtol=5e-3)
    lengths = np.full(2, np.sqrt(2.0))
    np.testing.assert_allclose(float(np.sum(res.areas * lengths)), vol,
                               rtol=1e-5)


def test_load_cases_validation():
    p, cases = two_bar_cases()
    with pytest.raises(ValueError, match="load_cases"):
        optimize_sizing(p, stress_limit=1.0, load_cases=[[1.0, 2.0]])
    with pytest.raises(ValueError, match="case_weights"):
        optimize_sizing(p, stress_limit=1.0, case_weights=[1.0])
    with pytest.raises(ValueError, match="one weight per case"):
        optimize_sizing(p, stress_limit=1.0, load_cases=cases,
                        case_weights=[1.0, 2.0, 3.0])


def test_review_fixes_validation_and_compliance_polish():
    """Review-pass pins: nonpositive limits refused up front; negative
    case weights refused; compliance mode never lets the stress polish
    break its exact volume budget."""
    p, cases = two_bar_cases()
    with pytest.raises(ValueError, match="stress_limit"):
        optimize_sizing(p, stress_limit=-1.0)
    with pytest.raises(ValueError, match="displacement_limit"):
        optimize_sizing(p, displacement_limit=0.0)
    with pytest.raises(ValueError, match="nonnegative"):
        optimize_sizing(p, stress_limit=1.0, load_cases=cases,
                        case_weights=[1.0, -1.0])
    # Compliance + a (soft) stress limit the start violates: volume must
    # hold EXACTLY even though some member may stay overstressed.
    vol = 2.0 * np.sqrt(2.0)
    res = optimize_sizing(p, objective="compliance", volume=vol,
                          stress_limit=1e-4, min_area=1e-6,
                          n_iter=60, outer_rounds=2)
    lengths = np.full(2, np.sqrt(2.0))
    np.testing.assert_allclose(float(np.sum(res.areas * lengths)), vol,
                               rtol=1e-6)


# ------------------------------------------------ OC (large-mesh) path


def test_oc_matches_dense_compliance_on_small_problem():
    """The OC fixpoint and the dense AL path converge to the same
    compliance design (equal-energy-density optimum)."""
    from pinn_fem_tpu.solvers.sizing import optimize_compliance_oc

    nodes = np.array([[0.0, 0.0], [3.0, 0.0], [1.0, 1.2]])
    elements = np.array([[0, 2], [1, 2]])
    loads = np.array([0.0, 0.0, 0.0, 0.0, 0.4, -1.0])
    p = TrussProblem(nodes, elements, Material(1.0, 1.0, 1.0),
                     loads, np.arange(4), 2)
    lengths = np.array([np.linalg.norm([1.0, 1.2]),
                        np.linalg.norm([2.0, 1.2])])
    vol = float(np.sum(lengths))
    dense = optimize_sizing(p, objective="compliance", volume=vol,
                            min_area=1e-6, n_iter=400, outer_rounds=1,
                            learning_rate=0.05)
    oc = optimize_compliance_oc(p, vol, n_iter=60, min_area=1e-6)
    assert oc.converged
    np.testing.assert_allclose(oc.areas, dense.areas, rtol=0.01)
    np.testing.assert_allclose(float(np.sum(oc.areas * lengths)), vol,
                               rtol=1e-5)


def test_oc_sizes_a_grid_past_the_dense_limit():
    """The point of the OC path: compliance design on a banded mesh the
    dense tier refuses (2304 DOFs > DENSE_DOF_LIMIT), one PCG solve per
    iteration."""
    from pinn_fem_tpu.solvers.newton import DENSE_DOF_LIMIT
    from pinn_fem_tpu.solvers.sizing import optimize_compliance_oc
    from tests.test_mg import grid_problem

    p = grid_problem(24, 48)
    assert p.ndof > DENSE_DOF_LIMIT
    lengths = np.linalg.norm(
        p.nodes[p.elements[:, 1]] - p.nodes[p.elements[:, 0]], axis=1)
    vol = float(np.sum(lengths))          # uniform-start volume
    res = optimize_compliance_oc(p, vol, n_iter=80, min_area=1e-4,
                                 cg_tol=1e-7)
    assert res.converged
    # Volume held exactly through every clamped OC update.
    np.testing.assert_allclose(float(np.sum(res.areas * lengths)), vol,
                               rtol=1e-4)
    # The optimized design beats the uniform start decisively.
    c0, cN = res.history[0], res.history[-1]
    assert cN < 0.35 * c0
    # Monotone descent (OC with move limits; tiny float32 noise allowed).
    assert np.all(np.diff(res.history) < 1e-3 * abs(c0))
    # KKT structure: the converged design is bipolar — load-path members
    # off the gauge all carry THE SAME energy density (= Λ, measured
    # spread 3e-5), and every gauge member sits below it (it would shed
    # volume if it could).
    dens = res.stress ** 2
    off_gauge = res.areas > 10 * 1e-4
    assert off_gauge.sum() > 100
    lam = dens[off_gauge].mean()
    assert dens[off_gauge].std() / lam < 0.01
    assert dens[~off_gauge].max() <= lam * 1.01


def test_oc_input_validation():
    from pinn_fem_tpu.solvers.sizing import optimize_compliance_oc

    p = two_bar()
    with pytest.raises(ValueError, match="volume"):
        optimize_compliance_oc(p, 0.0)
    with pytest.raises(ValueError, match="move"):
        optimize_compliance_oc(p, 1.0, move=0.0)
    with pytest.raises(ValueError, match="infeasible"):
        optimize_compliance_oc(p, 1e-9, min_area=1.0)


# ------------------------------------------- frequency-constrained mass


def test_optimize_frequency_constrained_closed_form():
    """Tip-mass bar, minimize mass s.t. f1 >= f_req: the SDOF closed
    form A* = w^2 m_tip / (E/L - w^2 rho L / 2) — the frequency
    constraint differentiates through K(A) AND M(A), so the optimizer
    charges added area against the structural mass it brings."""
    E, L, rho, m_tip = 1.0, 1.0, 0.1, 2.0
    w_req = 0.5
    f_req = w_req / (2.0 * np.pi)
    p = TrussProblem(np.array([0.0, L]), np.array([[0, 1]]),
                     Material(young=E, area=0.05, density=rho),
                     np.array([0.0, 0.0]), np.array([0]), 1,
                     point_masses=np.array([0.0, m_tip]))
    a_true = w_req ** 2 * m_tip / (E / L - w_req ** 2 * rho * L / 2.0)
    res = optimize_sizing(p, objective="mass", min_frequency_hz=f_req,
                          min_area=1e-6, n_iter=250, outer_rounds=4,
                          learning_rate=0.08)
    np.testing.assert_allclose(res.areas[0], a_true, rtol=0.01)
    # And the resulting frequency sits on the floor.
    from pinn_fem_tpu import modal_analysis

    p_opt = TrussProblem(p.nodes, p.elements,
                         Material(young=E, area=float(res.areas[0]),
                                  density=rho),
                         p.loads, p.fixed_dofs, 1,
                         point_masses=p.point_masses)
    f1 = modal_analysis(p_opt, n_modes=1).frequencies[0]
    np.testing.assert_allclose(f1, f_req, rtol=0.01)


def test_frequency_constraint_json_tier():
    """min_frequency_hz through run_sizing (adam only)."""
    from pinn_fem_tpu.io.schema import parse_problem_dict
    from pinn_fem_tpu.io.analysis import run_sizing

    doc = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 1.0, "area": 0.05, "density": 0.1},
        "loads": [0.0, 0.0],
        "fixed_dofs": [0],
        "point_masses": [[1, 2.0]],
        "solver_type": "fem",
    }
    w_req = 0.5
    p = parse_problem_dict(doc).problem
    out = run_sizing(p, {"min_frequency_hz": w_req / (2.0 * np.pi),
                         "n_iter": 250, "outer_rounds": 4,
                         "learning_rate": 0.08, "min_area": 1e-6})
    a_true = w_req ** 2 * 2.0 / (1.0 - w_req ** 2 * 0.1 / 2.0)
    np.testing.assert_allclose(out["areas"][0], a_true, rtol=0.01)
    with pytest.raises(ValueError, match="min_frequency_hz"):
        run_sizing(p, {"min_frequency_hz": -1.0})


# --------------------------------------------- Euler buckling constraint


def test_fsd_buckling_governs_compression():
    """Downward load puts both 2-bar members in COMPRESSION; with the
    Euler factor the governing requirement flips from strength to
    stability, with the closed form A = sqrt(|N| L^2 / (pi^2 E c))."""
    limit, c = 0.8, 1.0 / (4.0 * np.pi)       # solid circular section
    p = two_bar(area=3.0)                      # load (0, -1): compression
    n_force = 1.0 / np.sqrt(2.0)
    a_strength = n_force / limit
    a_buckling = np.sqrt(n_force * 2.0 / (np.pi ** 2 * 1.0 * c))
    assert a_buckling > a_strength             # stability governs here
    res = fully_stressed_design(p, stress_limit=limit, min_area=1e-9,
                                buckling_shape_factor=c)
    assert res.converged
    np.testing.assert_allclose(res.areas, a_buckling, rtol=1e-9)
    np.testing.assert_allclose(res.max_buckling_ratio, 1.0, rtol=1e-9)
    assert res.max_stress_ratio < 1.0          # strength now slack
    # Tension members are untouched by the Euler check: flip the load.
    from pinn_fem_tpu.models.problem import TrussProblem as TP

    loads_up = -p.loads
    p_t = TP(p.nodes, p.elements, p.material, loads_up, p.fixed_dofs, 2)
    res_t = fully_stressed_design(p_t, stress_limit=limit, min_area=1e-9,
                                  buckling_shape_factor=c)
    np.testing.assert_allclose(res_t.areas, a_strength, rtol=1e-9)
    assert res_t.max_buckling_ratio == 0.0


def test_optimize_buckling_matches_fsd():
    """The AL path with the area-dependent Euler constraint reaches the
    same stability-governed optimum."""
    limit, c = 0.8, 1.0 / (4.0 * np.pi)
    p = two_bar(area=3.0)
    fsd = fully_stressed_design(p, stress_limit=limit, min_area=1e-9,
                                buckling_shape_factor=c)
    res = optimize_sizing(p, objective="mass", stress_limit=limit,
                          buckling_shape_factor=c, min_area=1e-6,
                          n_iter=250, outer_rounds=4, learning_rate=0.08)
    assert res.max_stress_ratio <= 1.0 + 1e-6
    assert res.max_buckling_ratio <= 1.0 + 1e-6   # polish covers Euler
    assert res.mass <= fsd.mass * 1.02
    with pytest.raises(ValueError, match="needs stress_limit"):
        optimize_sizing(p, buckling_shape_factor=c)
    with pytest.raises(ValueError, match="buckling_shape_factor"):
        optimize_sizing(p, stress_limit=1.0, buckling_shape_factor=-1.0)


def test_buckling_sizing_json_tier():
    from pinn_fem_tpu.io.analysis import run_sizing

    limit, c = 0.8, 1.0 / (4.0 * np.pi)
    p = two_bar(area=3.0)
    out = run_sizing(p, {"method": "fsd", "stress_limit": limit,
                         "buckling_shape_factor": c, "min_area": 1e-9})
    a_buckling = np.sqrt((1.0 / np.sqrt(2.0)) * 2.0 / (np.pi ** 2 * c))
    np.testing.assert_allclose(out["areas"], a_buckling, rtol=1e-9)
    np.testing.assert_allclose(out["max_buckling_ratio"], 1.0,
                               rtol=1e-9)
    with pytest.raises(ValueError, match='method "oc"'):
        run_sizing(p, {"method": "oc", "objective": "compliance",
                       "volume": 1.0, "buckling_shape_factor": c})


def test_oc_mg_preconditioner_path():
    """The OC JSON contract passes the large-mesh knobs through: the MG
    V-cycle preconditioner reaches the same design as Jacobi."""
    from pinn_fem_tpu.io.analysis import run_sizing
    from tests.test_mg import grid_problem

    p = grid_problem(12, 24)
    lengths = np.linalg.norm(
        p.nodes[p.elements[:, 1]] - p.nodes[p.elements[:, 0]], axis=1)
    vol = float(np.sum(lengths))
    kw = {"method": "oc", "objective": "compliance", "volume": vol,
          "n_iter": 25, "min_area": 1e-4, "include_displacements": False}
    jac = run_sizing(p, dict(kw))
    mg = run_sizing(p, dict(kw, precond="mg"))
    np.testing.assert_allclose(mg["areas"], jac["areas"], rtol=5e-3,
                               atol=1e-5)
    np.testing.assert_allclose(mg["history"][-1], jac["history"][-1],
                               rtol=1e-3)


# ----------------------------------------------- fatigue life constraint


def braced_tower(n_story=2, young=500.0):
    """Cross-braced 2-column tower, lateral white-noise load at the top
    (the examples/fatigue_assessment.py structure)."""
    nodes, elements = [], []
    for s in range(n_story + 1):
        nodes += [[0.0, float(s)], [1.0, float(s)]]
    for s in range(n_story):
        a, b, c, d = 2 * s, 2 * s + 1, 2 * s + 2, 2 * s + 3
        elements += [[a, c], [b, d], [c, d], [a, d], [b, c]]
    nnode = 2 * (n_story + 1)
    loads = np.zeros(2 * nnode)
    loads[2 * (nnode - 2)] = 0.5
    loads[2 * (nnode - 1)] = 0.5
    return TrussProblem(np.asarray(nodes, dtype=float),
                        np.asarray(elements, dtype=int),
                        Material(young=young, area=1.0, density=1.0),
                        loads, np.array([0, 1, 2, 3]), 2)


def test_member_force_frf_matches_harmonic():
    """member_force_frf_sq (traced, per-element areas) against the
    harmonic solver's float64 host member-force FRF at uniform areas —
    two independent sweep implementations, one number."""
    import jax
    import jax.numpy as jnp

    from pinn_fem_tpu import harmonic_response
    from pinn_fem_tpu.solvers.sizing import member_force_frf_sq

    p = braced_tower()
    om = np.linspace(0.5, 40.0, 60)
    hr = harmonic_response(p, om, damping=(0.08, 2e-4), host=True,
                           probe_elements=np.arange(p.nelm))
    data = p.to_device()
    dt = data.loads.dtype
    h2 = np.asarray(jax.device_get(member_force_frf_sq(
        data, 500.0, jnp.ones(p.nelm, dt), 1.0, jnp.asarray(om, dt),
        0.08, 2e-4)))
    np.testing.assert_allclose(h2, hr.force_amplitude ** 2,
                               rtol=2e-3, atol=1e-10)


def test_fatigue_ratio_traced_matches_host():
    """fatigue_life_ratio is a 1:1 jnp mirror of the host authority
    chain (spectral_moments -> dirlik/narrowband damage) — the
    ops/host.py mirror discipline."""
    import jax.numpy as jnp

    from pinn_fem_tpu.solvers.fatigue import spectral_fatigue
    from pinn_fem_tpu.solvers.sizing import fatigue_life_ratio

    om = np.linspace(0.3, 50.0, 300)
    # Two broad resonance humps + a flat floor; three quantities, one
    # of them identically zero (the double-where inactive path).
    s = np.stack([
        1e-4 + 2.0 / (1.0 + ((om - 8.0) / 1.5) ** 4),
        5e-5 + 0.7 / (1.0 + ((om - 25.0) / 4.0) ** 2),
        np.zeros_like(om)], axis=1)
    T = 3600.0
    for method in ("dirlik", "narrowband"):
        # The host authority refuses zero-variance PSDs by contract —
        # compare the live columns, and pin the traced double-where's
        # r = 0 on the dead one.
        sf = spectral_fatigue(om, s[:, :2], 3.0, 1e8, method=method)
        want = (sf.damage_rate * T) ** (1.0 / 3.0)
        got = np.asarray(fatigue_life_ratio(
            jnp.asarray(om), jnp.asarray(s), 3.0, 1e8, T,
            method=method))
        np.testing.assert_allclose(got[:2], want, rtol=1e-4)
        assert got[2] == 0.0
    # Narrow-band is the conservative bound for broad-band processes.
    nb = np.asarray(fatigue_life_ratio(jnp.asarray(om), jnp.asarray(s),
                                       3.0, 1e8, T, method="narrowband"))
    dk = np.asarray(fatigue_life_ratio(jnp.asarray(om), jnp.asarray(s),
                                       3.0, 1e8, T, method="dirlik"))
    assert np.all(nb[:2] >= dk[:2])


def test_fatigue_sizing_sdof_closed_form():
    """Tip-mass bar + mass-proportional damping + narrow-band model:
    the fatigue-optimal area has a CLOSED FORM.  One-sided white-noise
    force PSD S0 on an SDOF gives m0_x = pi S0 / (2 k c); with
    sigma = (E/L) x, k = E A / L, c = alpha m_tip (A-independent) and
    nu0 = sqrt(k/m)/2pi, Basquin m = 3 makes

        rate(A) = nu0/C (2 m0_sigma)^{3/2} Gamma(5/2)  ~  1/A,

    so rate(A*) T = 1 is solvable exactly.  (Structural mass ~ 0 keeps
    m and c area-independent; the finite sweep band-limits the moments,
    hence the 3% tolerance.)"""
    E, L, m_tip, alpha, S0, C = 1.0, 1.0, 2.0, 0.12, 1e-4, 1.0
    T = 5000.0
    p = TrussProblem(np.array([0.0, L]), np.array([[0, 1]]),
                     Material(young=E, area=0.05, density=1e-6),
                     np.array([0.0, 1.0]), np.array([0]), 1,
                     point_masses=np.array([0.0, m_tip]))
    import math

    c_damp = alpha * m_tip
    k0 = (np.sqrt(E / (L * m_tip)) / (2.0 * np.pi) / C
          * (np.pi * S0 * E / (L * c_damp)) ** 1.5 * math.gamma(2.5))
    a_true = k0 * T                       # rate = k0 / A, rate*T = 1
    wn = np.sqrt(E * a_true / (L * m_tip))
    om = np.concatenate([np.linspace(0.02 * wn, 3.0 * wn, 400),
                         np.linspace(3.0 * wn, 12.0 * wn, 200)[1:]])
    res = optimize_sizing(
        p, fatigue={"psd": S0, "omegas": om, "damping": [alpha, 0.0],
                    "sn": {"exponent": 3.0, "coefficient": C},
                    "min_life_s": T, "method": "narrowband"},
        min_area=1e-6, n_iter=250, outer_rounds=4, learning_rate=0.08)
    # 5%: the band-limited moments bias the numeric rate ~3% below the
    # infinite-band closed form (zeta ~ 0.46 here — broad tails).
    np.testing.assert_allclose(res.areas[0], a_true, rtol=0.05)
    np.testing.assert_allclose(res.min_fatigue_life_s, T, rtol=0.05)


def test_fatigue_sizing_vs_scipy_slsqp():
    """Independent optimizer check on the indeterminate 3-bar: scipy
    SLSQP with the exact (host-chain) life constraint; our mass within
    2% of its optimum."""
    import jax
    import jax.numpy as jnp
    import scipy.optimize

    from pinn_fem_tpu.solvers.fatigue import spectral_fatigue
    from pinn_fem_tpu.solvers.sizing import member_force_frf_sq

    p = three_bar(area=1.0)
    om = np.linspace(0.05, 6.0, 160)
    S0, mexp, coeff = 1e-3, 3.0, 1.0
    T = 2000.0
    damping = (0.3, 1e-3)
    data = p.to_device()
    dt = data.loads.dtype
    om_d = jnp.asarray(om, dt)

    frf = jax.jit(lambda a: member_force_frf_sq(
        data, 1.0, a, 1.0, om_d, damping[0], damping[1]))

    def lives(a):
        a = np.asarray(a, dtype=float)
        h2 = np.asarray(jax.device_get(frf(jnp.asarray(a, dt))),
                        dtype=float)
        s_sigma = h2 * S0 / (a ** 2)[None, :]
        return spectral_fatigue(om, s_sigma, mexp, coeff,
                                method="dirlik").life

    lengths = np.array([np.sqrt(2.0), 1.0, np.sqrt(2.0)])
    # One smooth inequality per member (a min() kink stalls SLSQP).
    cons = [{"type": "ineq",
             "fun": (lambda a, e=e: lives(a)[e] / T - 1.0)}
            for e in range(3)]
    sol = scipy.optimize.minimize(
        lambda a: float(np.dot(lengths, a)), np.full(3, 0.5),
        method="SLSQP", bounds=[(1e-3, None)] * 3,
        constraints=cons, options={"maxiter": 300, "ftol": 1e-9})
    assert sol.success
    res = optimize_sizing(
        p, fatigue={"psd": S0, "omegas": om, "damping": list(damping),
                    "sn": {"exponent": mexp, "coefficient": coeff},
                    "min_life_s": T},
        min_area=1e-3, n_iter=250, outer_rounds=4, learning_rate=0.08)
    assert res.min_fatigue_life_s >= T * (1.0 - 1e-3)   # feasible
    assert res.mass <= float(sol.fun) * 1.02            # near-optimal
    # The result's achieved lives are the host-authority recompute
    # (1e-6: two separately jitted FRF programs differ at f32 fusion
    # level).
    np.testing.assert_allclose(res.fatigue_life_s, lives(res.areas),
                               rtol=1e-6)


def test_fatigue_sizing_json_tier():
    """The "fatigue" block through run_sizing: omegas spec dict,
    min_life_hours convenience, output keys, and the method guards."""
    from pinn_fem_tpu.io.analysis import run_sizing
    from pinn_fem_tpu.io.schema import parse_problem_dict

    doc = {
        "nodes": [{"x": 0.0, "y": 0.0, "fixed": True},
                  {"x": 1.0, "y": 0.0, "fixed": True},
                  {"x": 0.0, "y": 1.0}, {"x": 1.0, "y": 1.0},
                  {"x": 0.0, "y": 2.0}, {"x": 1.0, "y": 2.0}],
        "elements": [[0, 2], [1, 3], [2, 3], [0, 3], [1, 2],
                     [2, 4], [3, 5], [4, 5], [2, 5], [3, 4]],
        "material": {"young": 500.0, "area": 1.0, "density": 1.0},
        "loads": [0.0] * 8 + [0.5, 0.0, 0.5, 0.0],
        "solver_type": "fem",
    }
    p = parse_problem_dict(doc).problem
    spec = {"fatigue": {"psd": 0.02,
                        "omegas": {"start": 0.5, "stop": 60.0,
                                   "num": 120},
                        "damping": [0.08, 2e-4],
                        "sn": {"exponent": 3.0, "coefficient": 1e8},
                        "min_life_hours": 200.0},
            "min_area": 0.01, "n_iter": 150, "outer_rounds": 3}
    out = run_sizing(p, spec)
    assert out["success"] and out["converged"]
    assert out["fatigue_min_life_s"] == 200.0 * 3600.0
    # Feasible (polish guarantees it) and binding within AL slack.
    assert out["min_fatigue_life_s"] >= 200.0 * 3600.0 * (1.0 - 1e-3)
    assert out["min_fatigue_life_s"] <= 200.0 * 3600.0 * 1.25
    life = out["fatigue_life_s"]
    assert len(life) == 10
    crit = out["fatigue_critical_element"]
    finite = [v for v in life if v is not None]
    assert life[crit] == min(finite)
    assert out["fatigue_method"] == "dirlik"
    with pytest.raises(ValueError, match='method "adam"'):
        run_sizing(p, {"method": "fsd", "stress_limit": 1.0,
                       "fatigue": spec["fatigue"]})


def test_fatigue_input_validation():
    p = braced_tower()
    om = np.linspace(0.5, 40.0, 60)
    base = {"psd": 0.02, "omegas": om, "damping": [0.08, 2e-4],
            "sn": {"exponent": 3.0, "coefficient": 1e8},
            "min_life_s": 100.0}
    with pytest.raises(ValueError, match="sn"):
        optimize_sizing(p, fatigue={k: v for k, v in base.items()
                                    if k != "sn"})
    with pytest.raises(ValueError, match="min_life_s"):
        optimize_sizing(p, fatigue={**base, "min_life_s": None})
    with pytest.raises(ValueError, match="omegas"):
        optimize_sizing(p, fatigue={**base, "omegas": [1.0, 0.5]})
    with pytest.raises(ValueError, match="method"):
        optimize_sizing(p, fatigue={**base, "method": "rainflow"})
    with pytest.raises(ValueError, match="psd"):
        optimize_sizing(p, fatigue={**base, "psd": -1.0})


# -------------------------------------------------- RBDO (reliability)


def test_rbdo_tip_bar_closed_form():
    """Single bar, axial load: sigma = S/A exactly (E drops out), so
    beta(A) = (mu_R - mu_S/A)/sqrt(s_R^2 + (s_S/A)^2) and
    beta(A*) = beta_t is a quadratic in 1/A — an EXACT anchor for the
    whole PMA/AMV + Danskin chain.  The achieved beta (full HL-RF
    authority recompute) must sit on the target."""
    muR, sR, muS, sS, bt = 2.0, 0.2, 1.0, 0.25, 3.0
    p = TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(young=1.0, area=1.0, density=1.0),
                     np.array([0.0, 1.0]), np.array([0]), 1)
    a_q = muS ** 2 - bt ** 2 * sS ** 2
    b_q = -2.0 * muR * muS
    c_q = muR ** 2 - bt ** 2 * sR ** 2
    roots = np.roots([a_q, b_q, c_q])
    q = min(r for r in roots if r > 0)       # the safe-side crossing
    a_true = 1.0 / q
    res = optimize_sizing(
        p,
        reliability={"variables": [
            {"name": "S", "kind": "load_scale",
             "distribution": "normal", "mean": muS, "std": sS},
            {"name": "R", "kind": "resistance",
             "distribution": "normal", "mean": muR, "std": sR}],
            "target_beta": bt,
            "limit_state": {"type": "stress", "variable": "R"}},
        min_area=1e-4, n_iter=200, outer_rounds=3, learning_rate=0.08)
    np.testing.assert_allclose(res.areas[0], a_true, rtol=1e-3)
    np.testing.assert_allclose(res.min_reliability_beta, bt, rtol=1e-3)


def test_rbdo_mass_grows_with_target():
    """More reliability costs more mass — and every returned design's
    authority-recomputed beta respects its own floor."""
    p = three_bar(area=1.0)
    masses = []
    for bt in (1.5, 2.5):
        res = optimize_sizing(
            p,
            reliability={"variables": [
                {"name": "S", "kind": "load_scale",
                 "distribution": "normal", "mean": 1.0, "std": 0.2},
                {"name": "R", "kind": "resistance",
                 "distribution": "lognormal", "mean": 1.0,
                 "cov": 0.1}],
                "target_beta": bt,
                "limit_state": {"type": "stress", "variable": "R"}},
            min_area=1e-3, n_iter=150, outer_rounds=3,
            learning_rate=0.08)
        assert res.min_reliability_beta >= bt * (1.0 - 1e-3)
        masses.append(res.mass)
    assert masses[1] > masses[0] * 1.05


def test_rbdo_validation():
    p = three_bar(area=1.0)
    S = {"name": "S", "kind": "load_scale", "distribution": "normal",
         "mean": 1.0, "std": 0.2}
    with pytest.raises(ValueError, match="target_beta"):
        optimize_sizing(p, reliability={"variables": [S]})
    with pytest.raises(ValueError, match="design vector"):
        optimize_sizing(p, reliability={
            "variables": [S, {"name": "A", "kind": "area",
                              "distribution": "normal", "mean": 1.0,
                              "std": 0.1}],
            "target_beta": 2.0,
            "limit_state": {"type": "stress", "limit": 1.0}})
    with pytest.raises(ValueError, match="stress limit state"):
        optimize_sizing(p, reliability={
            "variables": [S], "target_beta": 2.0,
            "limit_state": {"type": "displacement", "limit": 1.0}})
    with pytest.raises(ValueError, match='"limit" or'):
        optimize_sizing(p, reliability={
            "variables": [S], "target_beta": 2.0})
    with pytest.raises(ValueError, match="non-finite"):
        # A free-floating problem (no supports) must fail loudly, not
        # return a NaN design marked converged (measured regression).
        free = TrussProblem(np.array([[0.0, 0.0], [1.0, 0.0]]),
                            np.array([[0, 1]]),
                            Material(young=1.0, area=1.0, density=1.0),
                            np.array([0.0, 0.0, 1.0, 0.0]),
                            np.zeros(0, dtype=int), 2)
        optimize_sizing(free, stress_limit=1.0, n_iter=20,
                        outer_rounds=1)


def test_rbdo_honors_correlation():
    """Review regression: the RBDO `correlation` key must reach BOTH
    the PMA constraint and the authority recompute.  Tip bar with
    correlated normal R-S: beta(A) has the closed form with the
    -2*rho*sR*sS/A cross term, so the correlated optimum differs from
    the independent one by a computable amount."""
    muR, sR, muS, sS, bt, rho = 2.0, 0.2, 1.0, 0.25, 3.0, 0.5
    p = TrussProblem(np.array([0.0, 1.0]), np.array([[0, 1]]),
                     Material(young=1.0, area=1.0, density=1.0),
                     np.array([0.0, 1.0]), np.array([0]), 1)
    # (muR - q muS)^2 = bt^2 (sR^2 + q^2 sS^2 - 2 rho q sR sS), q = 1/A
    a_q = muS ** 2 - bt ** 2 * sS ** 2
    b_q = -2.0 * muR * muS + 2.0 * bt ** 2 * rho * sR * sS
    c_q = muR ** 2 - bt ** 2 * sR ** 2
    q = min(r for r in np.roots([a_q, b_q, c_q]) if r > 0)
    a_true = 1.0 / q
    rel = {"variables": [
        {"name": "S", "kind": "load_scale",
         "distribution": "normal", "mean": muS, "std": sS},
        {"name": "R", "kind": "resistance",
         "distribution": "normal", "mean": muR, "std": sR}],
        "target_beta": bt,
        "limit_state": {"type": "stress", "variable": "R"},
        "correlation": [["S", "R", rho]]}
    res = optimize_sizing(p, reliability=rel, min_area=1e-4,
                          n_iter=200, outer_rounds=3,
                          learning_rate=0.08)
    np.testing.assert_allclose(res.areas[0], a_true, rtol=1e-3)
    np.testing.assert_allclose(res.min_reliability_beta, bt, rtol=1e-3)
    # Positive R-S correlation helps: less area than independent.
    ind = dict(rel)
    ind.pop("correlation")
    res0 = optimize_sizing(p, reliability=ind, min_area=1e-4,
                           n_iter=200, outer_rounds=3,
                           learning_rate=0.08)
    assert res.areas[0] < res0.areas[0] * 0.98
