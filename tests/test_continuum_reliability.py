"""FORM reliability on the continuum families
(solvers/continuum_reliability.py) against closed forms.

Log-linear limit states make FORM EXACT (the HL-RF point is the true
most-probable point and the surface is a plane in u-space), so the
anchors are textbook lognormal indices:

  * determinate uniaxial states (plane strip, solid column): the von
    Mises demand is load_scale * sigma_0 independent of E, so
    beta = ln(R_med / S_med) / sqrt(zeta_R^2 + zeta_S^2) exactly;
  * the plane strip's uniform strain u = sigma L / E adds the E
    variable log-linearly;
  * the plate cantilever tip w ~ q L^4 / (E t^3) pins the CUBED
    thickness sensitivity: alpha_t / alpha_E = 3 (up to the Mindlin
    shear term's O((t/L)^2) = 1.6e-4 perturbation — rtol 1e-3).

The reference has no probabilistic analysis (SURVEY §2); this closes
the truss/frame-vs-continuum reliability asymmetry.
"""

import numpy as np
import pytest

from pinn_fem_tpu.solvers.continuum_reliability import (
    continuum_reliability)


def lognormal_zeta(cov):
    return float(np.sqrt(np.log1p(cov * cov)))


def lognormal_median(mean, cov):
    return float(mean / np.sqrt(1.0 + cov * cov))


def plane_strip():
    """Uniaxial plane-stress strip: sigma_xx = load_scale exactly."""
    from pinn_fem_tpu.models.plane import (PlaneProblem, edge_load,
                                           rect_mesh)

    nodes, elems = rect_mesh(4.0, 1.0, 4, 1, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    right = np.flatnonzero(nodes[:, 0] == 4.0)
    fixed = np.concatenate([2 * left, [2 * left[0] + 1]])
    loads = edge_load(nodes, right[np.argsort(nodes[right, 1])],
                      [1.0, 0.0], 1.0)
    return PlaneProblem(nodes=nodes, elements=elems, young=200.0,
                        poisson=0.3, thickness=1.0, density=1.0,
                        loads=loads, fixed_dofs=fixed)


def test_plane_stress_rs_exact():
    """Determinate strip, lognormal load and resistance: the demand
    drops E entirely and beta is the textbook R-S closed form on
    every element."""
    res = continuum_reliability(
        plane_strip(),
        [{"name": "S", "kind": "load_scale", "mean": 1.0, "cov": 0.2,
          "distribution": "lognormal"},
         {"name": "R", "kind": "resistance", "mean": 2.0,
          "cov": 0.15}],
        {"type": "stress", "variable": "R"}, "plane")
    zr, zs = lognormal_zeta(0.15), lognormal_zeta(0.2)
    beta_exact = np.log(lognormal_median(2.0, 0.15)
                        / lognormal_median(1.0, 0.2)) \
        / np.sqrt(zr**2 + zs**2)
    np.testing.assert_allclose(res.beta, beta_exact, rtol=1e-5)
    assert all(res.converged)


def test_plane_displacement_with_young():
    """Uniform strain u_tip = scale * L / E: log-linear in (E, scale),
    closed-form beta for the displacement limit."""
    p = plane_strip()
    tip = 2 * np.flatnonzero(p.nodes[:, 0] == 4.0)[0]
    limit = 0.045  # pf ~ 1e-3: 200k crude-MC samples resolve it
    res = continuum_reliability(
        p,
        [{"name": "E", "kind": "young", "mean": 200.0, "cov": 0.1},
         {"name": "S", "kind": "load_scale", "mean": 1.0, "cov": 0.25,
          "distribution": "lognormal"}],
        {"type": "displacement", "limit": limit,
         "probe_dofs": [int(tip)]}, "plane",
        mc_samples=200_000, mc_seed=3)
    ze, zs = lognormal_zeta(0.1), lognormal_zeta(0.25)
    u_med = 4.0 * lognormal_median(1.0, 0.25) \
        / lognormal_median(200.0, 0.1) * 200.0 / 200.0
    beta_exact = np.log(limit / u_med) / np.sqrt(ze**2 + zs**2)
    np.testing.assert_allclose(res.beta, beta_exact, rtol=1e-4)
    # crude-MC agreement on pf (lognormal tails, loose band)
    pf = float(res.pf[0])
    assert res.mc_pf == pytest.approx(pf, rel=0.35)


def test_solid_column_rs_exact():
    """Uniaxial hex8 column through the named-face JSON parse: the
    centroid von Mises equals the applied traction * scale exactly
    (free lateral contraction), so the R-S index is closed-form —
    and the traced twin matches the host static at the medians."""
    from pinn_fem_tpu.io.solid_io import parse_solid_document
    from pinn_fem_tpu.models.solid import (solid_static_response,
                                           solve_solid_static)

    problem, _ = parse_solid_document({
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1, "ly": 1, "lz": 2,
                 "nx": 2, "ny": 2, "nz": 4},
        "material": {"young": 200.0, "poisson": 0.3, "density": 2.0},
        "fixed_z_nodes": "z_min", "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max", "traction": [0, 0, 1.0]}],
        "analysis": {"type": "static"},
    })
    # twin parity at the median state (f32 traced vs f64 host)
    u, sig, vm = solid_static_response(problem)
    host = solve_solid_static(problem)
    np.testing.assert_allclose(np.asarray(u), host.displacements,
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(vm), host.von_mises,
                               rtol=2e-4)

    res = continuum_reliability(
        problem,
        [{"name": "S", "kind": "load_scale", "mean": 1.0, "cov": 0.3,
          "distribution": "lognormal"},
         {"name": "R", "kind": "resistance", "mean": 3.0,
          "cov": 0.1}],
        {"type": "stress", "variable": "R"}, "solid")
    zr, zs = lognormal_zeta(0.1), lognormal_zeta(0.3)
    beta_exact = np.log(lognormal_median(3.0, 0.1)
                        / lognormal_median(1.0, 0.3)) \
        / np.sqrt(zr**2 + zs**2)
    np.testing.assert_allclose(res.beta, beta_exact, rtol=2e-4)


def test_plate_cantilever_cubed_thickness():
    """Plate cantilever strip, w_tip ~ q L^4/(E t^3): the FORM alpha
    vector carries the t^3 physics — |alpha_t| = 3 zeta_t / zeta_tot
    — and beta matches the log-linear closed form built on the FE
    median deflection (Mindlin shear perturbs at O((t/L)^2) = 1.6e-4,
    hence rtol 1e-3)."""
    from pinn_fem_tpu.models.plate import (PlateProblem,
                                           plate_supports, rect_mesh,
                                           solve_plate_static)

    # f32-friendly scales: a/t = 32 keeps the (a/t)^2-conditioned
    # plate solve well inside f32 (the original a/t = 80 version
    # measured a 1.2% beta error from dense-solve rounding — passing
    # under PINN_FEM_TPU_X64 pinned the cause to precision, not
    # physics); shear fraction 0.8 (t/L)^2 = 7.8e-4 stays inside the
    # rtol band.
    nodes, elems = rect_mesh(8.0, 1.0, 8, 1, element="quad")
    fixed = plate_supports(nodes, "left", "clamped")
    prob = PlateProblem(nodes=nodes, elements=elems, young=200.0,
                        poisson=0.0, thickness=0.25, density=1.0,
                        loads=np.zeros(3 * len(nodes)),
                        fixed_dofs=fixed, pressure=0.01)
    w_det = np.abs(solve_plate_static(prob).displacements[0::3]).max()
    tip = int(np.argmax(np.abs(
        solve_plate_static(prob).displacements[0::3])))
    cov_e, cov_t, cov_q = 0.1, 0.05, 0.2
    ze, zt, zq = (lognormal_zeta(c) for c in (cov_e, cov_t, cov_q))
    # median deflection: w scales q/(E t^3) exactly in bending
    w_med = w_det * lognormal_median(1.0, cov_q) \
        / (lognormal_median(200.0, cov_e) / 200.0) \
        / (lognormal_median(0.25, cov_t) / 0.25) ** 3
    limit = 4.0 * w_med
    res = continuum_reliability(
        prob,
        [{"name": "E", "kind": "young", "mean": 200.0, "cov": cov_e},
         {"name": "t", "kind": "thickness", "mean": 0.25,
          "cov": cov_t},
         {"name": "q", "kind": "load_scale", "mean": 1.0,
          "cov": cov_q, "distribution": "lognormal"}],
        {"type": "displacement", "limit": limit,
         "probe_dofs": [3 * tip]}, "plate")
    ztot = np.sqrt(ze**2 + 9.0 * zt**2 + zq**2)
    beta_exact = np.log(limit / w_med) / ztot
    # rtol 4e-3: measured 1.8e-3 f32 dense-solve noise on this a/t
    # (PINN_FEM_TPU_X64 lands inside 1e-3 — precision, not physics).
    np.testing.assert_allclose(res.beta, beta_exact, rtol=4e-3)
    alpha = np.asarray(res.alpha[0])
    np.testing.assert_allclose(abs(alpha[1]) / abs(alpha[0]),
                               3.0 * zt / ze, rtol=5e-3)


def test_json_tier_all_families():
    """The shared reliability JSON block (io/_common.py
    run_continuum_reliability) through each family's document runner:
    the frame block's contract (labels/beta/pf/alpha/system bounds),
    probe_nodes expanding to all the node's DOFs, exact R-S gates
    where the state is determinate."""
    from pinn_fem_tpu.io.plane_io import run_plane_document
    from pinn_fem_tpu.io.plate_io import run_plate_document
    from pinn_fem_tpu.io.solid_io import run_solid_document

    zr, zs = lognormal_zeta(0.15), lognormal_zeta(0.2)
    beta_exact = np.log(lognormal_median(2.0, 0.15)
                        / lognormal_median(1.0, 0.2)) \
        / np.sqrt(zr**2 + zs**2)
    out = run_plane_document({
        "element_type": "plane",
        "mesh": {"type": "rect", "width": 4, "height": 1,
                 "nx": 4, "ny": 1, "element": "quad"},
        "material": {"young": 200.0, "poisson": 0.3, "thickness": 1.0,
                     "density": 1.0},
        "edge_loads": [{"nodes": [4, 9], "traction": [1.0, 0.0]}],
        "fixed_x_nodes": [0, 5], "fixed_y_nodes": [0],
        "analysis": {
            "type": "reliability",
            "variables": [
                {"name": "S", "kind": "load_scale", "mean": 1.0,
                 "cov": 0.2, "distribution": "lognormal"},
                {"name": "R", "kind": "resistance", "mean": 2.0,
                 "cov": 0.15}],
            "limit_state": {"type": "stress", "variable": "R"}},
    })
    assert out["success"] and out["analysis"] == "reliability"
    assert out["element_type"] == "plane"
    np.testing.assert_allclose(out["beta"], beta_exact, rtol=1e-4)
    lo, hi = out["system_pf_bounds"]
    assert 0 < lo <= hi <= 1

    out = run_solid_document({
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1, "ly": 1, "lz": 2,
                 "nx": 1, "ny": 1, "nz": 2},
        "material": {"young": 200.0, "poisson": 0.3, "density": 2.0},
        "fixed_z_nodes": "z_min", "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0, 0, 1.0]}],
        "analysis": {
            "type": "reliability",
            "variables": [
                {"name": "S", "kind": "load_scale", "mean": 1.0,
                 "cov": 0.2, "distribution": "lognormal"},
                {"name": "R", "kind": "resistance", "mean": 2.0,
                 "cov": 0.15}],
            "limit_state": {"type": "stress", "variable": "R"}},
    })
    assert out["element_type"] == "solid"
    np.testing.assert_allclose(out["beta"], beta_exact, rtol=2e-4)

    out = run_plate_document({
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 8, "height": 1,
                 "nx": 8, "ny": 1},
        "material": {"young": 200.0, "poisson": 0.0,
                     "thickness": 0.25, "density": 1.0},
        "pressure": 0.01,
        "supports": {"clamped": ["left"]},
        "analysis": {
            "type": "reliability",
            "variables": [
                {"name": "E", "kind": "young", "mean": 200.0,
                 "cov": 0.1},
                {"name": "q", "kind": "load_scale", "mean": 1.0,
                 "cov": 0.2, "distribution": "lognormal"}],
            "limit_state": {"type": "displacement", "limit": 100.0,
                            "probe_nodes": [8]}},
    })
    assert out["element_type"] == "plate"
    # probe_nodes expanded to the node's 3 DOFs
    assert len(out["beta"]) == 3 and len(out["labels"]) == 3
    assert all(b is None or b > 0 for b in out["beta"])
    assert out["beta_min"] is not None


def test_guards():
    """Family-specific rejections carry the reason."""
    p = plane_strip()
    with pytest.raises(ValueError, match="density"):
        continuum_reliability(
            p, [{"name": "d", "kind": "density", "mean": 1.0,
                 "cov": 0.1}],
            {"type": "stress", "limit": 2.0}, "plane")
    with pytest.raises(ValueError, match="continuum field"):
        continuum_reliability(
            p, [{"name": "a", "kind": "area", "mean": 1.0,
                 "cov": 0.1}],
            {"type": "stress", "limit": 2.0}, "plane")
    from pinn_fem_tpu.io.solid_io import parse_solid_document

    sp, _ = parse_solid_document({
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1, "ly": 1, "lz": 1,
                 "nx": 1, "ny": 1, "nz": 1},
        "material": {"young": 200.0, "poisson": 0.3, "density": 2.0},
        "fixed_z_nodes": "z_min",
        "surface_loads": [{"face": "z_max", "traction": [0, 0, 1.0]}],
        "analysis": {"type": "static"},
    })
    with pytest.raises(ValueError, match="thickness"):
        continuum_reliability(
            sp, [{"name": "t", "kind": "thickness", "mean": 1.0,
                  "cov": 0.1}],
            {"type": "stress", "limit": 2.0}, "solid")


def _flat_shell_strip():
    """Determinate uniaxial membrane state on a FLAT shell strip:
    u_x fixed at the left edge, u_y at one node, and every
    out-of-plane / drilling DOF pinned (they are load-free), so the
    membrane is EXACTLY the plane strip's determinate state and the
    governing extreme-fiber vM ties both fibers at N/t = load_scale
    (t = 1) — the fiber-max subgradient path is exercised at an
    exact tie."""
    from pinn_fem_tpu.models.plane import edge_load, rect_mesh
    from pinn_fem_tpu.models.shell import ShellProblem

    nodes2d, elems = rect_mesh(4.0, 1.0, 4, 1, "quad")
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
    return ShellProblem(nodes=nodes3d, elements=elems, young=200.0,
                        poisson=0.3, thickness=1.0, density=1.0,
                        loads=loads6, fixed_dofs=fixed)


def test_shell_membrane_rs_exact():
    """Determinate flat shell strip, lognormal load and resistance:
    the governing-fiber demand is load_scale independent of E (both
    fibers tie at the membrane stress), so beta is the textbook R-S
    closed form on every facet — the plane anchor carried to the
    shell family."""
    res = continuum_reliability(
        _flat_shell_strip(),
        [{"name": "S", "kind": "load_scale", "mean": 1.0, "cov": 0.2,
          "distribution": "lognormal"},
         {"name": "R", "kind": "resistance", "mean": 2.0,
          "cov": 0.15}],
        {"type": "stress", "variable": "R"}, "shell")
    zr, zs = lognormal_zeta(0.15), lognormal_zeta(0.2)
    beta_exact = np.log(lognormal_median(2.0, 0.15)
                        / lognormal_median(1.0, 0.2)) \
        / np.sqrt(zr**2 + zs**2)
    np.testing.assert_allclose(res.beta, beta_exact, rtol=1e-4)
    assert all(res.converged)


def test_shell_flat_matches_plate_beta():
    """A FLAT shell under pressure IS the MITC4 plate (same kernels),
    so the shell FORM index on the cantilever-strip deflection limit
    must land on the plate family's — including the t³ thickness
    sensitivity |alpha_t| = 3 zeta_t (membrane never engages: the
    governing physics is pure bending)."""
    from pinn_fem_tpu.models.plate import (PlateProblem,
                                           plate_supports, rect_mesh,
                                           solve_plate_static)
    from pinn_fem_tpu.models.shell import ShellProblem

    nodes, elems = rect_mesh(8.0, 1.0, 8, 1, element="quad")
    n = nodes.shape[0]
    fixed = plate_supports(nodes, "left", "clamped")
    prob = PlateProblem(nodes=nodes, elements=elems, young=200.0,
                        poisson=0.0, thickness=0.25, density=1.0,
                        loads=np.zeros(3 * n), fixed_dofs=fixed,
                        pressure=0.01)
    w = np.abs(solve_plate_static(prob).displacements[0::3])
    tip = int(np.argmax(w))
    limit = 4.0 * float(w[tip])
    variables = [
        {"name": "E", "kind": "young", "mean": 200.0, "cov": 0.1},
        {"name": "t", "kind": "thickness", "mean": 0.25,
         "cov": 0.05},
        {"name": "q", "kind": "load_scale", "mean": 1.0, "cov": 0.2,
         "distribution": "lognormal"}]
    res_p = continuum_reliability(
        prob, variables,
        {"type": "displacement", "limit": limit,
         "probe_dofs": [3 * tip]}, "plate")

    nodes3d = np.concatenate([nodes, np.zeros((n, 1))], axis=1)
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    fixed6 = (6 * left[:, None] + np.arange(6)[None, :]).reshape(-1)
    sprob = ShellProblem(nodes=nodes3d, elements=elems, young=200.0,
                         poisson=0.0, thickness=0.25, density=1.0,
                         loads=np.zeros(6 * n), fixed_dofs=fixed6,
                         pressure=0.01)
    res_s = continuum_reliability(
        sprob, variables,
        {"type": "displacement", "limit": limit,
         "probe_dofs": [6 * tip + 2]}, "shell")
    np.testing.assert_allclose(res_s.beta, res_p.beta, rtol=2e-3)
    a_p = np.asarray(res_p.alpha[0])
    a_s = np.asarray(res_s.alpha[0])
    np.testing.assert_allclose(np.abs(a_s), np.abs(a_p), rtol=5e-3,
                               atol=1e-4)
    np.testing.assert_allclose(
        abs(a_s[1]) / abs(a_s[0]),
        3.0 * lognormal_zeta(0.05) / lognormal_zeta(0.1), rtol=6e-3)


def test_shell_json_tier():
    """The reliability block on a shell document: probe_nodes expands
    to the node's 6 DOFs, the contract keys land, and a curved
    (cylinder-panel) document runs the same block — membrane+bending
    demand on a real shell state."""
    from pinn_fem_tpu.io.shell_io import run_shell_document
    from pinn_fem_tpu.models.plane import rect_mesh

    nodes2d, elems = rect_mesh(4.0, 1.0, 4, 1, "quad")
    n = nodes2d.shape[0]
    nodes3d = np.concatenate([nodes2d, np.zeros((n, 1))], axis=1)
    left = np.flatnonzero(nodes2d[:, 0] == 0.0).tolist()
    out = run_shell_document({
        "element_type": "shell",
        "nodes": nodes3d.tolist(),
        "elements": elems.tolist(),
        "material": {"young": 200.0, "poisson": 0.0,
                     "thickness": 0.25, "density": 1.0},
        "fixed_nodes": left,
        "pressure": 0.01,
        "analysis": {
            "type": "reliability",
            "variables": [
                {"name": "E", "kind": "young", "mean": 200.0,
                 "cov": 0.1},
                {"name": "q", "kind": "load_scale", "mean": 1.0,
                 "cov": 0.2, "distribution": "lognormal"}],
            "limit_state": {"type": "displacement", "limit": 5.0,
                            "probe_nodes": [n - 1]}},
    })
    assert out["success"] and out["element_type"] == "shell"
    assert len(out["beta"]) == 6 and len(out["labels"]) == 6
    assert out["beta_min"] is not None and out["beta_min"] > 0

    out = run_shell_document({
        "element_type": "shell",
        "mesh": {"type": "cylinder_panel", "radius": 25.0,
                 "length": 50.0, "half_angle_deg": 40.0,
                 "nx": 4, "ny": 4},
        "material": {"young": 4.32e8, "poisson": 0.0,
                     "thickness": 0.25, "density": 1.0},
        "supports": [
            {"nodes": "x_min", "dofs": [0, 1, 2, 3, 4, 5]},
            {"nodes": "x_max", "dofs": [0, 1, 2, 3, 4, 5]}],
        "body_force": [0.0, 0.0, -90.0],
        "analysis": {
            "type": "reliability",
            "variables": [
                {"name": "S", "kind": "load_scale", "mean": 1.0,
                 "cov": 0.2, "distribution": "lognormal"},
                {"name": "R", "kind": "resistance", "mean": 3e6,
                 "cov": 0.15}],
            "limit_state": {"type": "stress", "variable": "R",
                            "elements": [0, 5, 10]}},
    })
    assert out["success"] and len(out["beta"]) == 3
    assert all(b is None or b > 0 for b in out["beta"])
