"""Plane-continuum J2 elastoplasticity (ops/plane_plastic.py +
solvers/plane_plasticity.py) against closed forms:

* the uniaxial plane-stress strip vs the EXACT bilinear curve
  sigma = sigma_y + H_iso eps_p (the J2 model's uniaxial response is
  identical to the 1D combined-hardening model), through a full
  load / unload / reverse-load cycle;
* elastic sub-yield runs reproduce the linear static solver;
* the thick-wall cylinder limit pressure p_lim = (2/sqrt 3) sigma_y
  ln(b/a) (von Mises, plane strain) — collapse within 2% on coarse
  meshes once B-bar relieves volumetric locking;
* host float64 vs device float32 1:1 mirrors for every element /
  constraint combination;
* the JSON tier (annulus mesh + normal-pressure edge load + plastic
  analysis block).
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.plane import (PlaneProblem, annulus_mesh,
                                       edge_load, pressure_load,
                                       rect_mesh, solve_plane_static)
from pinn_fem_tpu.solvers.plane_plasticity import solve_plane_plastic

E, NU, SY, HI = 200.0, 0.3, 1.0, 20.0


def strip(nx=8, ny=2, element="quad", plane_strain=False):
    """Uniaxial strip: left edge on x-rollers (one corner pinned),
    unit traction on the right edge — homogeneous sigma_xx = lf."""
    nodes, elems = rect_mesh(4.0, 1.0, nx, ny, element)
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    right = np.flatnonzero(nodes[:, 0] == 4.0)
    fixed = np.concatenate([2 * left, [2 * left[0] + 1]])
    loads = edge_load(nodes, right[np.argsort(nodes[right, 1])],
                      [1.0, 0.0], 1.0)
    p = PlaneProblem(nodes=nodes, elements=elems, young=E, poisson=NU,
                     thickness=1.0, density=1.0, loads=loads,
                     fixed_dofs=fixed, plane_strain=plane_strain)
    return p, right


def cylinder(nr, nt, a=1.0, b=2.0, p=1.0):
    """Quarter thick-wall cylinder, plane strain, inner pressure p."""
    nodes, elems = annulus_mesh(a, b, nr, nt)
    nr1 = nr + 1
    bottom = np.arange(nr1)                   # theta = 0: v = 0
    top = nt * nr1 + np.arange(nr1)           # theta = pi/2: u = 0
    fixed = np.concatenate([2 * bottom + 1, 2 * top])
    inner = np.arange(0, nodes.shape[0], nr1)
    loads = pressure_load(nodes, inner, p, 1.0)
    return PlaneProblem(nodes=nodes, elements=elems, young=1000.0,
                        poisson=0.3, thickness=1.0, density=1.0,
                        loads=loads, fixed_dofs=fixed,
                        plane_strain=True)


def test_uniaxial_plane_stress_exact_cycle():
    """Load to 1.1 sy, unload to 0, reverse to -0.5 sy: every state on
    the EXACT bilinear curve, Newton quadratic (<= 5 iterations)."""
    p, right = strip()
    lfs = [0.5, 1.0, 1.1, 0.5, 0.0, -0.5]
    res = solve_plane_plastic(p, sigma_y=SY, hardening_iso=HI,
                              load_factors=lfs, host=True)
    assert res.converged
    assert res.iterations.max() <= 5
    tip = res.displacements[:, 2 * right[1]]
    ep = (1.1 - SY) / HI                      # committed plastic strain
    expect = np.array([0.5 / E, 1.0 / E, 1.1 / E + ep,
                       0.5 / E + ep, ep, -0.5 / E + ep]) * 4.0
    np.testing.assert_allclose(tip, expect, rtol=1e-9, atol=1e-12)
    # homogeneous state: every element at |sigma_xx| = |lf|
    np.testing.assert_allclose(res.stresses[2][:, 0], 1.1, rtol=1e-8)
    np.testing.assert_allclose(res.von_mises[2], 1.1, rtol=1e-8)
    np.testing.assert_allclose(res.stresses[4], 0.0, atol=1e-9)
    np.testing.assert_allclose(res.eq_plastic[-1], ep, rtol=1e-8)
    # plane stress: sigma_zz identically zero through the cycle
    np.testing.assert_allclose(res.sigma_zz, 0.0, atol=1e-10)


def test_kinematic_hardening_bauschinger():
    """Pure kinematic hardening: reverse yield starts at sigma_max -
    2 sy (the Bauschinger effect), isotropic at -sigma_max."""
    p, right = strip(nx=4, ny=1)
    hk = 20.0
    smax = 1.1
    # after loading to smax, back stress q = smax - sy; reverse yield
    # at q - sy = smax - 2 sy = -0.9 -> at lf = -1.0 plastic flow has
    # resumed in compression; alpha grows beyond the loading value.
    res = solve_plane_plastic(p, sigma_y=SY, hardening_kin=hk,
                              load_factors=[smax, 0.0, -1.0],
                              host=True)
    assert res.converged
    al_load = res.eq_plastic[0].max()
    assert res.eq_plastic[1].max() == pytest.approx(al_load)  # elastic
    assert res.eq_plastic[2].max() > al_load * 1.5            # reversed
    # isotropic instead: |sigma| = -1.0 is INSIDE the expanded surface
    res_iso = solve_plane_plastic(p, sigma_y=SY, hardening_iso=hk,
                                  load_factors=[smax, 0.0, -1.0],
                                  host=True)
    assert res_iso.eq_plastic[2].max() == pytest.approx(
        res_iso.eq_plastic[0].max())


@pytest.mark.parametrize("element,plane_strain",
                         [("quad", False), ("tri", False),
                          ("quad", True)])
def test_elastic_subyield_matches_linear(element, plane_strain):
    """Below yield the plastic solver IS the linear solver (B-bar off
    to compare the identical discrete element)."""
    p, _ = strip(nx=6, ny=2, element=element, plane_strain=plane_strain)
    res = solve_plane_plastic(p, sigma_y=SY, hardening_iso=HI,
                              load_factors=[0.5], host=True,
                              bbar=False)
    assert res.converged and res.n_plastic[0] == 0
    lin = solve_plane_static(PlaneProblem(
        nodes=p.nodes, elements=p.elements, young=p.young,
        poisson=p.poisson, thickness=p.thickness, density=p.density,
        loads=0.5 * p.loads, fixed_dofs=p.fixed_dofs,
        plane_strain=plane_strain))
    np.testing.assert_allclose(res.displacements[-1],
                               lin.displacements, atol=1e-12)


@pytest.mark.parametrize("element,plane_strain,bbar",
                         [("quad", False, False), ("tri", False, False),
                          ("quad", True, True)])
def test_host_device_mirror(element, plane_strain, bbar):
    """Device float32 scan program == host float64 loop within the f32
    floor, through a plastic load/unload history."""
    p, _ = strip(nx=4, ny=1, element=element, plane_strain=plane_strain)
    kw = dict(sigma_y=SY, hardening_iso=HI, hardening_kin=5.0,
              load_factors=[0.8, 1.2, 0.2], bbar=bbar)
    h = solve_plane_plastic(p, host=True, **kw)
    d = solve_plane_plastic(p, host=False, **kw)
    assert h.converged and d.converged
    np.testing.assert_allclose(h.displacements, d.displacements,
                               rtol=2e-4, atol=2e-7)
    np.testing.assert_allclose(h.von_mises, d.von_mises, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(h.eq_plastic, d.eq_plastic, rtol=2e-3,
                               atol=2e-7)


def test_cylinder_limit_pressure():
    """Thick-wall cylinder, perfect plasticity: the last converging
    pressure brackets p_lim = (2/sqrt 3) sy ln(b/a) within 2%, and
    B-bar is what makes it so (full integration locks and sails past
    the limit)."""
    sy = 1.0
    plim = 2.0 / np.sqrt(3.0) * sy * np.log(2.0)
    p = cylinder(6, 8)
    lfs = np.concatenate([np.linspace(0.3, 0.9, 4),
                          np.linspace(0.94, 1.10, 9)]) * plim
    res = solve_plane_plastic(p, sigma_y=sy, hardening_iso=0.0,
                              load_factors=lfs, host=True,
                              max_iter=40, tol=1e-8)
    conv = res.residuals <= 1e-8
    last = lfs[np.flatnonzero(conv).max()] / plim
    assert 0.98 <= last <= 1.02, last
    # every pre-collapse step converged
    assert conv[:np.flatnonzero(conv).max() + 1].all()
    # locking control: full integration still "converges" at 1.10 plim
    res_lock = solve_plane_plastic(p, sigma_y=sy, hardening_iso=0.0,
                                   load_factors=[1.10 * plim],
                                   host=True, max_iter=40, tol=1e-8,
                                   bbar=False)
    assert res_lock.residuals[-1] <= 1e-8


def test_cylinder_elastic_lame():
    """Sub-yield cylinder displacement matches the Lame closed form
    u_r = (p a^2 / (2 mu (b^2 - a^2))) ((1 - 2 nu) r + b^2 / r)
    (plane strain) at the inner radius, within FE discretization."""
    a, b, pr = 1.0, 2.0, 0.2
    prob = cylinder(10, 12, p=pr)
    res = solve_plane_plastic(prob, sigma_y=1e9, load_factors=[1.0],
                              host=True)
    assert res.n_plastic[0] == 0
    mu = 1000.0 / (2.0 * 1.3)
    u_exact = pr * a**2 / (2.0 * mu * (b**2 - a**2)) \
        * ((1.0 - 2.0 * 0.3) * a + b**2 / a)
    u_inner = res.displacements[-1][0]        # node 0 = (a, 0), u_x
    np.testing.assert_allclose(u_inner, u_exact, rtol=2e-2)


def test_json_tier_cylinder_plastic():
    """The full JSON contract: annulus mesh + pressure edge load +
    plastic analysis block, running the same cylinder through
    run_plane_document."""
    from pinn_fem_tpu.io.plane_io import run_plane_document

    sy = 1.0
    plim = 2.0 / np.sqrt(3.0) * sy * np.log(2.0)
    nr, nt = 6, 8
    nr1, nnode = nr + 1, (nr + 1) * (nt + 1)
    doc = {
        "element_type": "plane",
        "mesh": {"type": "annulus", "r_inner": 1.0, "r_outer": 2.0,
                 "nr": nr, "nt": nt},
        "material": {"young": 1000.0, "poisson": 0.3,
                     "thickness": 1.0, "density": 1.0},
        "plane_strain": True,
        "edge_loads": [{"nodes": list(range(0, nnode, nr1)),
                        "pressure": 1.0}],
        "fixed_y_nodes": list(range(nr1)),
        "fixed_x_nodes": list(range(nt * nr1, nnode)),
        "analysis": {"type": "plastic", "sigma_y": sy,
                     "load_factors": [0.5 * plim, 0.9 * plim,
                                      0.99 * plim],
                     "tolerance": 1e-8, "max_iterations": 40,
                     "probe_nodes": [0]},
    }
    out = run_plane_document(doc)
    assert out["success"] is True
    assert out["analysis"] == "plastic" and out["plane_strain"]
    assert out["n_plastic"][-1] > 0           # plastic zone spreading
    assert max(out["max_von_mises"]) <= sy * 1.001
    assert len(out["displacements"][0]) == 2  # one probe node
    # unconverged past the limit -> success False, loudly
    doc["analysis"]["load_factors"] = [1.2 * plim]
    out2 = run_plane_document(doc)
    assert out2["success"] is False


def test_guards():
    p, _ = strip(nx=2, ny=1, element="tri", plane_strain=True)
    with pytest.raises(ValueError, match="B-bar needs Q4"):
        solve_plane_plastic(p, sigma_y=SY, load_factors=[0.5],
                            bbar=True)
    with pytest.raises(ValueError, match="sigma_y"):
        solve_plane_plastic(p, sigma_y=-1.0, load_factors=[0.5])
    from pinn_fem_tpu.io.plane_io import run_plane_document
    with pytest.raises(ValueError, match="exactly one"):
        run_plane_document({
            "element_type": "plane",
            "mesh": {"type": "rect", "width": 1, "height": 1,
                     "nx": 1, "ny": 1},
            "material": {"young": 1.0, "poisson": 0.3},
            "fixed_nodes": [0],
            "edge_loads": [{"nodes": [1, 3], "traction": [1, 0],
                            "pressure": 2.0}]})


def test_force_only_map_mirrors_full():
    """vm_return_map_4_force / plane_return_map_force: IDENTICAL
    stress, sigma_zz and state as the full-tangent maps (same zz
    Newton, same iterate count) — the explicit hot path must never
    drift from the static Newton's constitutive law."""
    from pinn_fem_tpu.ops.plane_plastic import (PlanePlasticState,
                                                plane_return_map,
                                                plane_return_map_force)

    rng = np.random.default_rng(3)
    m, gp = 5, 4
    eps3 = 0.02 * rng.standard_normal((m, gp, 3))
    state = PlanePlasticState(
        eps_p=0.005 * rng.standard_normal((m, gp, 4)),
        alpha=np.abs(0.01 * rng.standard_normal((m, gp))),
        back=0.002 * rng.standard_normal((m, gp, 4)))
    young = np.full(m, 200.0)
    poisson = np.full(m, 0.3)
    sy = np.full(m, 1.0)
    hi = np.full(m, 20.0)
    hk = np.full(m, 5.0)
    for ps in (False, True):
        sig_f, szz_f, st_f = plane_return_map_force(
            eps3, state, young, poisson, sy, hi, hk, ps)
        sig, _, szz, st = plane_return_map(
            eps3, state, young, poisson, sy, hi, hk, ps)
        np.testing.assert_array_equal(sig_f, sig)
        np.testing.assert_array_equal(szz_f, szz)
        np.testing.assert_array_equal(st_f.eps_p, st.eps_p)
        np.testing.assert_array_equal(st_f.alpha, st.alpha)
        np.testing.assert_array_equal(st_f.back, st.back)
