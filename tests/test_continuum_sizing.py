"""Thickness sizing for plane membranes and plates
(solvers/continuum_sizing.py) against closed forms and scipy SLSQP.

Anchors (module docstring of continuum_sizing.py):

  * uniaxial strip, fixed end force F: sigma = F/(W t) per element,
    so a stress limit binds uniformly at t* = F/(W sigma_allow) —
    EXACT (the uniform-scale polish lands on the boundary);
  * serial displacement limit u = sum F l_e/(E W t_e) with equal
    segments: the Lagrange optimum is uniform t* = F L/(E W u_lim);
  * a shear-loaded cantilever membrane ties scipy SLSQP on the same
    traced constraints (design, weight, active tip);
  * plate (t^3 bending): a single design variable must land at
    t* = t_det (w_det/w_lim)^(1/3) up to the O((t/L)^2) shear
    fraction; multi-element profiles beat the uniform design and
    taper monotonically toward the free end.
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.plane import (PlaneProblem, edge_load,
                                       rect_mesh, solve_plane_static)
from pinn_fem_tpu.solvers.continuum_sizing import (
    optimize_plane_thickness, optimize_plate_thickness)

E = 200.0


def strip(nx=4):
    nodes, elems = rect_mesh(4.0, 1.0, nx, 1, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    right = np.flatnonzero(nodes[:, 0] == 4.0)
    fixed = np.concatenate([2 * left, [2 * left[0] + 1]])
    loads = edge_load(nodes, right[np.argsort(nodes[right, 1])],
                      [1.0, 0.0], 1.0)
    return PlaneProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=1.0, density=1.0,
                        loads=loads, fixed_dofs=fixed), right


def test_plane_stress_limit_exact():
    """sigma = F/(W t) -> t* = 1/sigma_allow = 0.5, uniform, weight
    on the closed form."""
    p, _ = strip()
    t, w, hist = optimize_plane_thickness(p, stress_limit=2.0)
    np.testing.assert_allclose(t, 0.5, rtol=2e-6)
    np.testing.assert_allclose(w, 0.5 * 4.0, rtol=2e-6)
    assert hist.size > 0


def test_plane_displacement_limit_exact():
    """u_tip = F L/(E W t) with uniform optimum t* = 4/(200*0.01)."""
    p, right = strip()
    t, w, _ = optimize_plane_thickness(
        p, displacement_limit=0.01, probe_dofs=[int(2 * right[0])])
    np.testing.assert_allclose(t, 2.0, rtol=2e-5)
    np.testing.assert_allclose(w, 2.0 * 4.0, rtol=2e-5)


def test_plane_slsqp_tie():
    """Shear-loaded cantilever membrane, tip-deflection limit: the
    AL-ADAM profile ties scipy SLSQP (same traced constraint with
    analytic JAX gradients — scipy's finite differences through the
    f32 traced solve are too noisy for its linesearch, measured as a
    'positive directional derivative' abort) on both the design and
    the weight, tip exactly on the limit, root thickest."""
    import jax
    import jax.numpy as jnp
    import scipy.optimize

    from pinn_fem_tpu.models.plane import plane_static_response

    nodes, elems = rect_mesh(4.0, 1.0, 4, 1, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    right = np.flatnonzero(nodes[:, 0] == 4.0)
    fixed = np.concatenate([2 * left, 2 * left + 1])
    loads = edge_load(nodes, right[np.argsort(nodes[right, 1])],
                      [0.0, -0.05], 1.0)
    p = PlaneProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=1.0, density=1.0,
                     loads=loads, fixed_dofs=fixed)
    tip = int(2 * right[0] + 1)
    u_lim = 0.02

    @jax.jit
    def tip_ratio(x):
        u, _, _ = plane_static_response(p, thickness_e=x)
        return jnp.abs(u[tip]) / u_lim

    r_grad = jax.jit(jax.grad(lambda x: tip_ratio(x)))
    sol = scipy.optimize.minimize(
        lambda x: float(np.sum(x)),       # equal plan areas (1 each)
        np.full(4, 1.0), method="SLSQP", bounds=[(1e-6, None)] * 4,
        jac=lambda x: np.ones_like(x),
        constraints=[{"type": "ineq",
                      "fun": lambda x: 1.0 - float(
                          tip_ratio(jnp.asarray(x))),
                      "jac": lambda x: -np.asarray(
                          r_grad(jnp.asarray(x)), dtype=float)}],
        options={"maxiter": 300, "ftol": 1e-10})
    assert sol.success
    t, w, _ = optimize_plane_thickness(p, displacement_limit=u_lim,
                                       probe_dofs=[tip],
                                       n_iter=400, outer_rounds=4)
    np.testing.assert_allclose(w, float(sol.fun), rtol=2e-3)
    np.testing.assert_allclose(t, sol.x, rtol=2e-2)
    np.testing.assert_allclose(float(tip_ratio(jnp.asarray(t))), 1.0,
                               rtol=1e-5)
    # The root (bending-dominated) element is the thickest.
    assert t[0] == t.max()


def test_plane_combined_limits():
    """Stress + displacement limits together: both hold at the
    returned design and at least one is active (otherwise weight was
    left on the table)."""
    p, right = strip()
    tip = int(2 * right[0])
    t, w, _ = optimize_plane_thickness(
        p, stress_limit=2.0, displacement_limit=0.05,
        probe_dofs=[tip])
    st = solve_plane_static(PlaneProblem(
        nodes=p.nodes, elements=p.elements, young=E, poisson=0.0,
        thickness=t, density=1.0, loads=p.loads,
        fixed_dofs=p.fixed_dofs))
    r_s = float(np.max(st.von_mises)) / 2.0
    r_u = float(np.abs(st.displacements[tip])) / 0.05
    assert r_s <= 1.0 + 1e-8 and r_u <= 1.0 + 1e-8
    assert max(r_s, r_u) > 1.0 - 1e-6


def plate_strip(nx=8, t0=0.25):
    from pinn_fem_tpu.models.plate import (PlateProblem,
                                           plate_supports)

    nodes, elems = rect_mesh(8.0, 1.0, nx, 1, element="quad")
    fixed = plate_supports(nodes, "left", "clamped")
    return PlateProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=t0, density=1.0,
                        loads=np.zeros(3 * len(nodes)),
                        fixed_dofs=fixed, pressure=0.01)


def test_plate_single_variable_cube_root():
    """One element: w ~ 1/t^3 (bending) + 1/t (shear, O((t/L)^2)), so
    halving the allowed deflection thickens by ~2^(1/3)."""
    from pinn_fem_tpu.models.plate import solve_plate_static

    p = plate_strip(nx=1, t0=0.2)
    st = solve_plate_static(p)
    w_det = np.abs(st.displacements[0::3]).max()
    tipn = int(np.argmax(np.abs(st.displacements[0::3])))
    t, w, _ = optimize_plate_thickness(p, w_det / 2.0,
                                       probe_nodes=[tipn])
    np.testing.assert_allclose(t, 0.2 * 2.0 ** (1.0 / 3.0),
                               rtol=2e-3)


def test_plate_profile_beats_uniform():
    """8-element cantilever slab: the optimized profile sits exactly
    on the deflection limit, tapers from root to tip, and beats the
    uniform cube-root design by a measured ~20%+ (bending efficiency
    of root-weighted material)."""
    from pinn_fem_tpu.models.plate import (PlateProblem,
                                           solve_plate_static)

    p = plate_strip()
    st = solve_plate_static(p)
    w_det = np.abs(st.displacements[0::3]).max()
    tipn = int(np.argmax(np.abs(st.displacements[0::3])))
    w_lim = w_det / 4.0
    t, w, _ = optimize_plate_thickness(p, w_lim, probe_nodes=[tipn])
    uniform_w = 0.25 * 4.0 ** (1.0 / 3.0) * 8.0
    assert w < 0.85 * uniform_w
    # active constraint
    p2 = PlateProblem(nodes=p.nodes, elements=p.elements, young=E,
                      poisson=0.0, thickness=t, density=1.0,
                      loads=p.loads, fixed_dofs=p.fixed_dofs,
                      pressure=p.pressure)
    ratio = np.abs(solve_plate_static(p2).displacements[3 * tipn]) \
        / w_lim
    assert 1.0 - 1e-5 <= ratio <= 1.0 + 1e-8
    # monotone taper toward the free end (allowing tiny AL noise)
    assert np.all(np.diff(t) <= 1e-3 * t.max())


def test_json_tier_sizing():
    """The sizing JSON blocks (io/plane_io.py, io/plate_io.py): the
    uniaxial-strip stress design lands on the exact t* = 1/sigma_allow
    through the document runner, and the plate document returns a
    feasible deflection-governed depth field."""
    from pinn_fem_tpu.io.plane_io import run_plane_document
    from pinn_fem_tpu.io.plate_io import run_plate_document

    out = run_plane_document({
        "element_type": "plane",
        "mesh": {"type": "rect", "width": 4, "height": 1,
                 "nx": 4, "ny": 1, "element": "quad"},
        "material": {"young": E, "poisson": 0.0, "thickness": 1.0,
                     "density": 1.0},
        "edge_loads": [{"nodes": [4, 9], "traction": [1.0, 0.0]}],
        "fixed_x_nodes": [0, 5], "fixed_y_nodes": [0],
        "analysis": {"type": "sizing", "stress_limit": 2.0},
    })
    assert out["success"] and out["analysis"] == "sizing"
    assert out["element_type"] == "plane"
    np.testing.assert_allclose(out["thickness"], 0.5, rtol=2e-6)
    np.testing.assert_allclose(out["weight"], 2.0, rtol=2e-6)

    out = run_plate_document({
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 8, "height": 1,
                 "nx": 8, "ny": 1},
        "material": {"young": E, "poisson": 0.0, "thickness": 0.25,
                     "density": 1.0},
        "pressure": 0.01,
        "supports": {"clamped": ["left"]},
        "analysis": {"type": "sizing", "displacement_limit": 5.0,
                     "probe_nodes": [8]},
    })
    assert out["success"] and out["element_type"] == "plate"
    t = np.asarray(out["thickness"])
    assert t.shape == (8,) and np.all(t > 0)
    assert out["weight"] == pytest.approx(float(np.sum(t * 1.0)),
                                          rel=1e-9)


def test_guards():
    p, right = strip()
    with pytest.raises(ValueError, match="stress_limit and/or"):
        optimize_plane_thickness(p)
    with pytest.raises(ValueError, match="probe_dofs"):
        optimize_plane_thickness(p, displacement_limit=0.1)
    with pytest.raises(ValueError, match="positive"):
        optimize_plane_thickness(p, stress_limit=-1.0)
    pp = plate_strip(nx=1)
    with pytest.raises(ValueError, match="probe"):
        optimize_plate_thickness(pp, 0.1)


def shell_strip(nx=4):
    """Determinate flat shell strip (the reliability fixture): u_x
    fixed at the left edge, u_y at one node, every out-of-plane and
    drilling DOF pinned — sigma = F/(W t_e) per facet EXACTLY, both
    fibers tied at the membrane stress."""
    from pinn_fem_tpu.models.shell import ShellProblem

    nodes2d, elems = rect_mesh(4.0, 1.0, nx, 1, "quad")
    n = nodes2d.shape[0]
    left = np.flatnonzero(nodes2d[:, 0] == 0.0)
    right = np.flatnonzero(nodes2d[:, 0] == 4.0)
    loads2 = edge_load(nodes2d, right[np.argsort(nodes2d[right, 1])],
                       [1.0, 0.0], 1.0)
    nodes3d = np.concatenate([nodes2d, np.zeros((n, 1))], axis=1)
    loads6 = np.zeros(6 * n)
    loads6[0::6] = loads2[0::2]
    loads6[1::6] = loads2[1::2]
    fixed = np.concatenate([
        6 * left, [6 * left[0] + 1],
        (6 * np.arange(n)[:, None]
         + np.array([2, 3, 4, 5])[None, :]).reshape(-1)])
    return ShellProblem(nodes=nodes3d, elements=elems, young=E,
                        poisson=0.0, thickness=1.0, density=1.0,
                        loads=loads6, fixed_dofs=fixed), right


def test_shell_membrane_stress_exact():
    """Governing-fiber vM on the determinate strip is F/(W t_e) per
    facet, so the stress limit binds uniformly at t* = 0.5 — the
    plane family's closed form carried to the shell twin (and the
    cube-root polish converging geometrically on the 1/t membrane
    physics)."""
    from pinn_fem_tpu.solvers.continuum_sizing import (
        optimize_shell_thickness)

    p, _ = shell_strip()
    t, w, hist = optimize_shell_thickness(p, stress_limit=2.0)
    np.testing.assert_allclose(t, 0.5, rtol=1e-4)
    np.testing.assert_allclose(w, 0.5 * 4.0, rtol=1e-4)
    assert hist.size > 0


def test_shell_plate_cube_root():
    """Single flat facet under pressure: w ~ 1/t^3 (bending), so
    halving the allowed deflection thickens by 2^(1/3) — the plate
    anchor through the shell twin (membrane never engages)."""
    from pinn_fem_tpu.models.shell import (ShellProblem,
                                           solve_shell_static)
    from pinn_fem_tpu.solvers.continuum_sizing import (
        optimize_shell_thickness)

    nodes2d, elems = rect_mesh(8.0, 1.0, 1, 1, element="quad")
    n = nodes2d.shape[0]
    nodes3d = np.concatenate([nodes2d, np.zeros((n, 1))], axis=1)
    left = np.flatnonzero(nodes2d[:, 0] == 0.0)
    fixed = (6 * left[:, None] + np.arange(6)[None, :]).reshape(-1)
    p = ShellProblem(nodes=nodes3d, elements=elems, young=E,
                     poisson=0.0, thickness=0.2, density=1.0,
                     loads=np.zeros(6 * n), fixed_dofs=fixed,
                     pressure=0.01)
    st = solve_shell_static(p)
    w_all = np.abs(st.displacements[2::6])
    w_det = w_all.max()
    tipn = int(np.argmax(w_all))
    t, w, _ = optimize_shell_thickness(
        p, displacement_limit=w_det / 2.0,
        probe_dofs=[6 * tipn + 2])
    np.testing.assert_allclose(t, 0.2 * 2.0 ** (1.0 / 3.0),
                               rtol=2e-3)


def test_shell_json_tier_sizing():
    """The sizing block on a shell document: contract keys, uniform
    closed-form design through the JSON tier."""
    from pinn_fem_tpu.io.shell_io import run_shell_document

    p, _ = shell_strip()
    out = run_shell_document({
        "element_type": "shell",
        "nodes": p.nodes.tolist(),
        "elements": p.elements.tolist(),
        "material": {"young": E, "poisson": 0.0, "thickness": 1.0,
                     "density": 1.0},
        "loads": p.loads.tolist(),
        "fixed_dofs": p.fixed_dofs.tolist(),
        "analysis": {"type": "sizing", "stress_limit": 2.0},
    })
    assert out["success"] and out["analysis"] == "sizing"
    assert out["element_type"] == "shell"
    np.testing.assert_allclose(out["thickness"], 0.5, rtol=1e-4)
    np.testing.assert_allclose(out["weight"], 2.0, rtol=1e-4)
