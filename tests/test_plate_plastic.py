"""Layered elastoplastic Mindlin plates (ops/plate_plastic.py +
solvers/plate_plasticity.py).

Anchor set (module docstring of ops/plate_plastic.py for the layered
midpoint-rule algebra):

  * ELASTIC layered rigidity is exactly (1 - 1/N^2) D — machine
    precision on the constant-moment cantilever patch state (MITC4
    passes the constant-bending patch test).
  * PURE-BENDING capacity brackets the exact fully plastic moment
    Mp = sigma_y t^2/4 (exact for even N): 0.98 Mp converges,
    1.03 Mp has no equilibrium.  The capacity is NOT expected to
    follow the uniaxial beam M(kappa) exactly on the way up: von
    Mises plastic flow wants the anticlastic rate kappa_yy ->
    -kappa_xx/2 while the elastic core wants -nu kappa_xx, the
    linear-in-z curvature field cannot match the odd nonlinear
    plastic eps_yy(z) profile, and the self-equilibrating sigma_yy
    raises the moment a measured ~1.4% mid-transition (real plate
    physics, not an integration error — the limit itself is still
    Mp because the fully plastic state IS uniaxial).
  * One-way pressure strips (nu = 0 -> cylindrical bending IS the
    beam problem): the DISCRETE limit load sits ABOVE the beam
    mechanism value (weak-form equilibrium lets the bilinear moment
    field spread the midspan peak) and converges onto it from above
    under refinement — measured (1.080, 1.043, 1.031) x q_u at
    nx = (8, 16, 32).  SS strip q_u = 8 Mp/L^2; the clamped strip
    redistributes end hinges to midspan on the way to 16 Mp/L^2.
  * EPP von Mises never exceeds sigma_y (the return map is exact);
    load/unload leaves a self-equilibrated residual state.
  * Host float64 and jitted device tiers agree (same constitutive
    code via xp; f32 tolerances).

The reference (rpacheco-blazquez/PINN-FEM) has no plates and no
plasticity (SURVEY §2 — linear axial trusses only).
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.plate import (PlateProblem, plate_supports,
                                       rect_mesh, solve_plate_static)
from pinn_fem_tpu.solvers.plate_plasticity import solve_plate_plastic

E, T, SY = 200e3, 0.1, 300.0
N = 20
MP = SY * T * T / 4.0
D = E * T**3 / 12.0


def bending_strip(m_end, length=4.0, nx=4):
    """Cantilever strip with nodal end moments: the constant-moment
    MITC4 patch state (nu = 0)."""
    nodes, elems = rect_mesh(length, 1.0, nx, 1, element="quad")
    fixed = plate_supports(nodes, "left", "clamped")
    right = np.flatnonzero(np.abs(nodes[:, 0] - length) < 1e-9)
    loads = np.zeros(3 * len(nodes))
    loads[3 * right + 1] = m_end / right.size
    return PlateProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=1.0,
                        loads=loads, fixed_dofs=fixed), right


def pressure_strip(q, length=8.0, nx=8, support="simply_supported"):
    nodes, elems = rect_mesh(length, 1.0, nx, 1, element="quad")
    fixed = plate_supports(nodes, ["left", "right"], support)
    return PlateProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=1.0,
                        loads=np.zeros(3 * len(nodes)),
                        fixed_dofs=fixed, pressure=q)


def test_elastic_layered_rigidity_exact():
    """Sub-yield constant-moment patch: kappa = M/((1 - 1/N^2) D) to
    machine precision (midpoint layers; exact algebra in the module
    docstring), and moments recover M exactly."""
    m = 0.5 * MP
    p, right = bending_strip(m)
    r = solve_plate_plastic(p, SY, n_layers=N, load_factors=[1.0],
                            tol=1e-12)
    assert r.converged and r.n_plastic[-1] == 0
    kap = r.displacements[-1][3 * right[0] + 1] / 4.0
    np.testing.assert_allclose(kap, m / ((1.0 - 1.0 / N**2) * D),
                               rtol=1e-10)
    np.testing.assert_allclose(r.moments[-1][:, 0], m, rtol=1e-10)
    np.testing.assert_allclose(r.moments[-1][:, 1:], 0.0, atol=1e-12)


def test_elastic_subyield_matches_linear_static():
    """Sub-yield pressure strip vs solve_plate_static: the layered
    tier is (1 - 1/N^2) softer in bending (shear identical), so the
    deflection sits ABOVE the exact-rigidity static solve by a pinned
    O(1/N^2) band — a property of the discretization, not a bug."""
    q = 0.2 * 8.0 * MP / 8.0**2
    r = solve_plate_plastic(pressure_strip(q), SY, n_layers=N,
                            load_factors=[1.0], tol=1e-11)
    s = solve_plate_static(pressure_strip(q))
    wp = np.abs(r.displacements[-1][0::3]).max()
    wl = np.abs(s.displacements[0::3]).max()
    assert r.converged and r.n_plastic[-1] == 0
    rel = (wp - wl) / wl
    assert 0.3 / N**2 < rel < 2.0 / N**2


def test_pure_bending_capacity_brackets_mp():
    """EPP constant-moment strip: equilibrium exists at 0.98 Mp and
    does not at 1.03 Mp — the fully plastic moment sigma_y t^2/4 is
    EXACT for even midpoint layers, mesh-independent on the patch
    state."""
    p, _ = bending_strip(0.98 * MP)
    r = solve_plate_plastic(p, SY, n_layers=N,
                            load_factors=np.linspace(0.2, 1.0, 9),
                            tol=1e-9, max_iter=60)
    assert r.converged
    assert r.n_plastic[-1] == p.nelm
    # EPP: the exact return map never exceeds the yield surface.
    assert r.von_mises.max() <= SY * (1.0 + 1e-9)

    p2, _ = bending_strip(1.03 * MP)
    r2 = solve_plate_plastic(p2, SY, n_layers=N,
                             load_factors=np.linspace(0.2, 1.0, 9),
                             tol=1e-9, max_iter=60)
    assert not r2.converged


def test_ss_strip_discrete_limit_refines_from_above():
    """One-way SS strip (determinate — no redistribution): every mesh
    carries q_u = 8 Mp/L^2 (the discrete limit sits above it), the
    coarse nx=8 mesh still carries 1.06 q_u, and refining to nx=16
    removes that overshoot — the discrete limit converges onto the
    beam mechanism from above (measured bisection brackets in the
    module docstring)."""
    qu = 8.0 * MP / 8.0**2
    lfs = np.linspace(0.2, 1.0, 9)
    for nx in (8, 16):
        r = solve_plate_plastic(pressure_strip(qu, nx=nx), SY,
                                n_layers=N, load_factors=lfs,
                                tol=1e-9, max_iter=40)
        assert r.converged, nx
        assert r.n_plastic[-1] > 0
    lfs_over = np.linspace(0.2, 1.06, 10)
    r8 = solve_plate_plastic(pressure_strip(qu, nx=8), SY, n_layers=N,
                             load_factors=lfs_over, tol=1e-9,
                             max_iter=40)
    r16 = solve_plate_plastic(pressure_strip(qu, nx=16), SY,
                              n_layers=N, load_factors=lfs_over,
                              tol=1e-9, max_iter=40)
    assert r8.converged and not r16.converged


def test_clamped_strip_redistribution():
    """Clamped strip: first yield at the END elements (elastic
    qL^2/12 there vs qL^2/24 midspan), the structure then carries
    ~2x the first-yield load while midspan catches up — the classic
    16 Mp/L^2 redistribution mechanism (vs the SS strip's
    no-redistribution 8 Mp/L^2)."""
    qu = 16.0 * MP / 8.0**2
    nx = 16
    lfs = np.linspace(0.1, 1.0, 12)
    r = solve_plate_plastic(pressure_strip(qu, nx=nx, support="clamped"),
                            SY, n_layers=N, load_factors=lfs,
                            tol=1e-9, max_iter=40)
    assert r.converged
    first_pl = np.flatnonzero(r.n_plastic > 0)[0]
    # First yield happens at the clamped ends...
    yielded0 = np.flatnonzero(r.eq_plastic[first_pl] > 0)
    assert set(yielded0) <= {0, nx - 1}
    # ...and the strip then carries >= 1.4x the first-yield load
    # (continuum elastic-to-collapse ratio 16/12 * Mp/My ~ 2; the
    # end-element Gauss point sits at x = 0.106 where |M| is 8% below
    # the support value and My_N runs (1 + 1/N) high, so the DETECTED
    # first yield lands at lf ~ 0.67 — measured, hence the 1.4 gate).
    assert lfs[-1] / lfs[first_pl] >= 1.4
    # by the end, midspan has yielded too
    mid = np.flatnonzero(r.eq_plastic[-1] > 0)
    assert {nx // 2 - 1, nx // 2} <= set(mid)


def test_load_unload_residual_state():
    """Ramp the SS strip past yield and unload to zero: the committed
    plastic strains persist, the unloaded state converges onto a
    self-equilibrated residual (nonzero w, EPP vm strictly inside the
    yield surface after elastic springback)."""
    qu = 8.0 * MP / 8.0**2
    r = solve_plate_plastic(pressure_strip(qu), SY, n_layers=N,
                            load_factors=[0.4, 0.8, 0.98, 0.0],
                            tol=1e-9, max_iter=40)
    assert r.converged
    assert r.eq_plastic[-1].max() > 0
    np.testing.assert_allclose(r.eq_plastic[-1], r.eq_plastic[-2],
                               rtol=1e-12)    # unloading is elastic
    w_res = np.abs(r.displacements[-1][0::3]).max()
    assert w_res > 1e-4
    assert r.von_mises[-1].max() < 0.8 * SY


def test_host_device_mirror():
    """Host f64 vs jitted device scan through a plastic load/unload
    history — the same xp-parameterized constitutive code, f32
    tolerances (the plane family's pin, carried over)."""
    nodes, elems = rect_mesh(2.0, 1.0, 2, 1, element="quad")
    fixed = plate_supports(nodes, "left", "clamped")
    p = PlateProblem(nodes=nodes, elements=elems, young=200.0,
                     poisson=0.3, thickness=0.5, density=1.0,
                     loads=np.zeros(3 * len(nodes)), fixed_dofs=fixed,
                     pressure=0.6)
    kw = dict(sigma_y=1.0, hardening_iso=20.0, hardening_kin=5.0,
              n_layers=4, load_factors=[0.6, 1.0, 0.2])
    h = solve_plate_plastic(p, host=True, **kw)
    d = solve_plate_plastic(p, host=False, **kw)
    assert h.converged and d.converged
    # atol 2e-5 on displacements: the mixed (w, beta) DOF scales of a
    # plate leave small rotation entries at the f32 accumulation floor
    # of the O(1) deflections (measured 1.2e-5 abs on a -5.8e-3 entry).
    np.testing.assert_allclose(h.displacements, d.displacements,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(h.von_mises, d.von_mises, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(h.eq_plastic, d.eq_plastic, rtol=2e-3,
                               atol=2e-7)


def test_json_tier_plate_plastic():
    """The plate plastic JSON block end-to-end (io/plate_io.py): the
    one-way SS slab strip ramped to 95% of the beam-mechanism limit
    q_u = 8 Mp/L^2 — yield spreads from midspan, EPP fiber stress
    pinned at sigma_y, capacity-curve fields aligned for the UI
    consumers."""
    from pinn_fem_tpu.io.plate_io import run_plate_document

    qu = 8.0 * MP / 8.0**2
    out = run_plate_document({
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 8, "height": 1,
                 "nx": 16, "ny": 1},
        "material": {"young": E, "poisson": 0.0, "thickness": T,
                     "density": 1.0},
        "pressure": qu,
        "supports": {"simply_supported": ["left", "right"]},
        "analysis": {"type": "plastic", "sigma_y": SY, "n_layers": N,
                     "load_factors": [0.2, 0.4, 0.6, 0.7, 0.8, 0.85,
                                      0.9, 0.95],
                     "probe_nodes": [8, 25]},
    })
    assert out["success"] and out["analysis"] == "plastic"
    assert out["element_type"] == "plate" and out["n_layers"] == N
    lf = np.asarray(out["load_factors"])
    d = np.asarray(out["displacements"])
    assert d.shape == (8, 2) and out["max_residual"] < 1e-8
    # Midspan deflections on both edge rows agree (cylindrical).
    np.testing.assert_allclose(d[:, 0], d[:, 1], rtol=1e-9)
    # Secant softens past yield (measured 1.27x at 0.95 q_u — the
    # plastic zone is midspan-local); EPP fiber stress at sigma_y.
    assert d[-1, 0] / lf[-1] > 1.2 * (d[0, 0] / lf[0])
    np.testing.assert_allclose(max(out["max_von_mises"]), SY,
                               rtol=1e-9)
    assert len(out["yielded_elements"]) >= 4
    # Yield starts at the midspan elements (7, 8 of 16).
    al = np.asarray(out["final"]["eq_plastic_strain"])
    assert al[7] > 0 and al[8] > 0 and al[0] == 0 and al[15] == 0


def test_guards():
    """Odd/under layer counts refused (even midpoint layers are what
    make Mp exact); a thermal-gradient load case refused (constant
    static load, not proportional — the family rule)."""
    p, _ = bending_strip(0.5 * MP)
    with pytest.raises(ValueError, match="even"):
        solve_plate_plastic(p, SY, n_layers=5, load_factors=[1.0])
    nodes, elems = rect_mesh(2.0, 1.0, 2, 1, element="quad")
    pt = PlateProblem(nodes=nodes, elements=elems, young=E,
                      poisson=0.0, thickness=T, density=1.0,
                      loads=np.zeros(3 * len(nodes)),
                      fixed_dofs=plate_supports(nodes, "left",
                                                "clamped"),
                      alpha_cte=1e-5, temperature=10.0)
    with pytest.raises(ValueError, match="temperature"):
        solve_plate_plastic(pt, SY, load_factors=[1.0])
