"""Reissner-Mindlin plate family (models/plate.py).

Anchors are exact series / textbook coefficients:
  * hard-SS rectangle under uniform q vs the EXACT Mindlin/Navier
    series (valid for any thickness — both the thick t/a = 0.1 and
    thin t/a = 0.01 regimes are pinned, the latter being the locking
    trap the MITC4 assumed shear field exists to avoid),
  * thin-limit Kirchhoff coefficients α = w D/(q a⁴): 0.00406 simply
    supported, 0.00126 clamped,
  * SS-plate frequencies ω_mn = k²√(D/ρt) in the thin limit
    (consistent mass + rotary inertia converge from above),
  * rank sufficiency: no spurious zero-energy modes on a supported
    mesh (the MITC4 edge-midpoint shear sampling removes locking
    WITHOUT the soft zigzag modes of 1-point shear — the buckling
    test is what forced that choice, models/plate.py docstring),
  * symmetry/objectivity of K, pressure load resultant = q·A.
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.plate import (
    PlateProblem, mindlin_navier_w, mindlin_ss_buckling_nx,
    plate_buckling, plate_geometric_stiffness, plate_matrices,
    plate_modal, plate_supports, rect_mesh, solve_plate_static)

E, NU, RHO = 2.0e11, 0.3, 7850.0
A = B = 1.0
Q = -1000.0


def _ss_plate(t, nmesh):
    nodes, elems = rect_mesh(A, B, nmesh, nmesh)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "simply_supported")
    return PlateProblem(nodes, elems, E, NU, t, RHO,
                        np.zeros(3 * nodes.shape[0]), fixed,
                        pressure=Q)


@pytest.mark.parametrize("t,rtol", [(0.1, 2e-3), (0.01, 2e-3)])
def test_ss_uniform_vs_exact_mindlin_series(t, rtol):
    """The headline anchor: 16×16 MITC4 vs the exact Mindlin series
    at both thicknesses.  A displacement-based-shear element fails the
    thin case by ~100× (locking) — this test is the design's reason."""
    r = solve_plate_static(_ss_plate(t, 16))
    w_fem = r.displacements[0::3].min()
    w_ex = mindlin_navier_w(A, B, A / 2, B / 2, Q, E, NU, t)
    assert abs(w_fem - w_ex) <= rtol * abs(w_ex)


def test_ss_convergence_from_below():
    """Refinement marches monotonically onto the exact value."""
    t = 0.01
    w_ex = mindlin_navier_w(A, B, A / 2, B / 2, Q, E, NU, t)
    errs = []
    for nmesh in (4, 8, 16):
        r = solve_plate_static(_ss_plate(t, nmesh))
        errs.append(abs(r.displacements[0::3].min() - w_ex))
    assert errs[0] > errs[1] > errs[2]
    assert errs[1] / errs[2] > 3.0        # ~O(h²)


def test_clamped_kirchhoff_coefficient():
    t = 0.01
    nodes, elems = rect_mesh(A, B, 16, 16)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "clamped")
    p = PlateProblem(nodes, elems, E, NU, t, RHO,
                     np.zeros(3 * nodes.shape[0]), fixed, pressure=Q)
    r = solve_plate_static(p)
    d = E * t ** 3 / (12.0 * (1.0 - NU ** 2))
    alpha = r.displacements[0::3].min() / (Q * A ** 4 / d)
    assert abs(alpha - 0.00126) < 2e-5


def test_center_moment_ss():
    """Timoshenko table 8: |Mxx| = |Myy| = 0.0479 q a² at the SS-plate
    center (ν = 0.3), recovered at the centroid of the 4 central
    elements (mesh even → average them).  Sign convention: with
    κ = [βx,x, ..] and u = −zβx, a sagging state under downward load
    carries POSITIVE Mxx/Myy (σ = 6M/t² tensile at z = −t/2)."""
    t = 0.01
    p = _ss_plate(t, 16)
    r = solve_plate_static(p)
    cent = p.coords().mean(axis=1)
    d2 = (cent[:, 0] - A / 2) ** 2 + (cent[:, 1] - B / 2) ** 2
    central = np.argsort(d2)[:4]
    want = 0.0479 * abs(Q) * A ** 2
    for col in (0, 1):
        m_c = r.moments[central, col].mean()
        assert m_c > 0.0                      # sagging positive
        assert abs(m_c - want) < 0.02 * want


def test_pressure_resultant_is_qA():
    p = _ss_plate(0.05, 8)
    from pinn_fem_tpu.models.plate import _pressure_vectors
    f = _pressure_vectors(p)
    assert np.isclose(f[0::3].sum(), Q * A * B, rtol=1e-12)
    assert np.abs(f[1::3]).max() == 0.0


def test_stiffness_symmetric_and_rank_sufficient():
    """K symmetric; on the supported mesh every generalized
    eigenvalue is strictly positive — the MITC4 assumed shear leaves
    no spurious zero-energy (hourglass) modes."""
    import scipy.linalg

    p = _ss_plate(0.05, 6)
    k, m = plate_matrices(p)
    assert np.allclose(k, k.T, atol=1e-6 * np.abs(k).max())
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    lam = scipy.linalg.eigh(k[np.ix_(free, free)],
                            m[np.ix_(free, free)],
                            eigvals_only=True)
    assert lam.min() > 0.0


def test_modal_ss_thin_plate():
    """ω_mn = ((mπ/a)² + (nπ/b)²)·√(D/ρt): the first three SS modes
    (1,1), (2,1) = (1,2) degenerate pair — consistent mass converges
    from ABOVE onto the thin-plate values."""
    t = 0.01
    nodes, elems = rect_mesh(A, B, 16, 16)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "simply_supported")
    p = PlateProblem(nodes, elems, E, NU, t, RHO,
                     np.zeros(3 * nodes.shape[0]), fixed)
    md = plate_modal(p, n_modes=3)
    d = E * t ** 3 / (12.0 * (1.0 - NU ** 2))
    scale = np.sqrt(d / (RHO * t))
    k2 = lambda mm, nn: (mm * np.pi / A) ** 2 + (nn * np.pi / B) ** 2
    exact = np.array([k2(1, 1), k2(2, 1), k2(1, 2)]) * scale
    # Mindlin shear flexibility softens vs Kirchhoff while the
    # consistent mass stiffens the discrete model; at t/a = 0.01 the
    # net lands within 2% above.
    assert np.all(md.omegas >= exact * 0.998)
    np.testing.assert_allclose(md.omegas, exact, rtol=2e-2)
    # Degenerate pair exactly equal on the symmetric mesh.
    assert abs(md.omegas[1] - md.omegas[2]) < 1e-6 * md.omegas[1]


@pytest.mark.parametrize("t,rtol", [(0.1, 2e-2), (0.01, 2e-2)])
def test_buckling_ss_uniaxial_vs_exact_mindlin(t, rtol):
    """Hard-SS square under uniaxial compression Nx: the 16×16 MITC4
    factor vs the EXACT Mindlin closed form
    N_cr = min_{m,n} D k⁴/[(1 + D k²/κGt)(mπ/a)²] — thickness-valid
    (thin limit: the Kirchhoff k = 4 coefficient)."""
    p = _ss_plate(t, 16)
    res = plate_buckling(p, [-1.0, 0.0, 0.0], n_modes=2)
    n_ex = mindlin_ss_buckling_nx(A, B, E, NU, t)
    assert abs(res.load_factors[0] - n_ex) <= rtol * n_ex
    assert res.load_factors[1] > res.load_factors[0]


def test_buckling_thin_limit_is_kirchhoff_k4():
    """Sanity on the anchor itself: the exact Mindlin N_cr at
    t/a = 0.001 lands on k π²D/b² with k = 4.000 (square plate)."""
    t = 0.001
    d = E * t ** 3 / (12.0 * (1.0 - NU ** 2))
    n_ex = mindlin_ss_buckling_nx(A, B, E, NU, t)
    assert abs(n_ex - 4.0 * np.pi ** 2 * d / B ** 2) < 1e-3 * n_ex


def test_buckling_tension_only_refused():
    p = _ss_plate(0.01, 4)
    with pytest.raises(ValueError, match="tension"):
        plate_buckling(p, [1.0, 1.0, 0.0])


def test_prestress_vibration_buckling_link():
    """ω₁²(s·N) falls monotonically with compression and hits zero
    exactly at the state's own buckling factor (K + K_g singular
    there) — the framework's continuum-prestress anchor pattern."""
    t = 0.05
    p = _ss_plate(t, 8)
    n_state = [-1.0e5, 0.0, 0.0]
    lam = plate_buckling(p, n_state, n_modes=1).load_factors[0]
    w0 = plate_modal(p, n_modes=1).omegas[0]
    w_half = plate_modal(p, n_modes=1,
                         membrane_force=np.multiply(n_state,
                                                    0.5 * lam)
                         ).omegas[0]
    w_cr = plate_modal(p, n_modes=1,
                       membrane_force=np.multiply(n_state, lam)
                       ).omegas[0]
    assert w_half < w0
    # At the buckling state the fundamental eigenvalue crosses zero:
    # |λ₁(cr)| is tiny on the scale of λ₁(0).
    assert w_cr ** 2 < 1e-6 * w0 ** 2
    # Tension stiffens.
    w_tens = plate_modal(p, n_modes=1,
                         membrane_force=[1.0e5 * lam, 0.0, 0.0]
                         ).omegas[0]
    assert w_tens > w0


def test_geometric_stiffness_symmetric_and_w_only():
    p = _ss_plate(0.05, 4)
    kg = plate_geometric_stiffness(p, [-2.0, -1.0, 0.5])
    np.testing.assert_allclose(kg, kg.T, atol=1e-12 * np.abs(kg).max())
    # Rotation DOFs carry no geometric stiffness.
    rot = np.arange(p.ndof).reshape(-1, 3)[:, 1:].reshape(-1)
    assert np.abs(kg[np.ix_(rot, rot)]).max() == 0.0


def test_supports_helper_validation():
    nodes, _ = rect_mesh(1.0, 1.0, 2, 2)
    with pytest.raises(ValueError, match="edge"):
        plate_supports(nodes, ["diagonal"], "clamped")
    with pytest.raises(ValueError, match="kind"):
        plate_supports(nodes, ["left"], "welded")
    assert plate_supports(nodes, ["left"], "free").size == 0


def test_problem_validation():
    nodes, elems = rect_mesh(1.0, 1.0, 2, 2)
    n = nodes.shape[0]
    with pytest.raises(ValueError, match="Q4"):
        PlateProblem(nodes, np.array([[0, 1, 2]]), E, NU, 0.01, RHO,
                     np.zeros(3 * n), [0])
    with pytest.raises(ValueError, match="positive"):
        PlateProblem(nodes, elems, E, NU, -0.01, RHO,
                     np.zeros(3 * n), [0])


def test_transient_matches_modal_superposition():
    """Undamped step response of a clamped plate strip: Newmark at
    fine dt vs the exact modal superposition
    u(t) = Σ φ (φᵀf/ω²)(1 − cos ωt) over ALL free modes."""
    from pinn_fem_tpu.models.plate import solve_plate_transient

    t = 0.05
    nodes, elems = rect_mesh(A, B, 4, 4)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "simply_supported")
    n = nodes.shape[0]
    loads = np.zeros(3 * n)
    center = np.argmin((nodes[:, 0] - A / 2) ** 2
                       + (nodes[:, 1] - B / 2) ** 2)
    loads[3 * center] = -1e5
    p = PlateProblem(nodes, elems, E, NU, t, RHO, loads, fixed)
    k, m = plate_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    res = plate_modal(p, n_modes=free.size)
    f = p.loads[free]
    period1 = 2.0 * np.pi / res.omegas[0]
    # dt resolves the HIGHEST mode too (rotary-inertia/shear modes
    # reach ~126× ω₁ with the MITC4 shear field; Newmark period error
    # ~ (ω dt)²/12 must stay below the 2e-3 gate for every mode the
    # superposition carries — 16000 steps puts the top mode at 8e-4).
    n_steps = 16000
    dt = 2.0 * period1 / n_steps
    tr = solve_plate_transient(p, dt=dt, n_steps=n_steps,
                               record_every=400)
    phi = res.mode_shapes[:, free]
    q = phi @ f / res.omegas ** 2
    u_exact = np.einsum("kt,kn->tn",
                        q[:, None] * (1.0 - np.cos(
                            np.outer(res.omegas, tr.times))), phi)
    scale = np.abs(u_exact).max()
    np.testing.assert_allclose(tr.displacements[:, free], u_exact,
                               atol=2e-3 * scale)


def test_harmonic_matches_modal_superposition():
    """Proportional (Rayleigh) damping: the direct complex sweep
    equals the ALL-modes superposition exactly — the same 1e-8
    cross-check as the plane/solid/frame families."""
    from pinn_fem_tpu.models.plate import plate_harmonic

    t = 0.05
    nodes, elems = rect_mesh(A, B, 4, 4)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "clamped")
    n = nodes.shape[0]
    loads = np.zeros(3 * n)
    center = np.argmin((nodes[:, 0] - A / 2) ** 2
                       + (nodes[:, 1] - B / 2) ** 2)
    loads[3 * center] = 1e5
    p = PlateProblem(nodes, elems, E, NU, t, RHO, loads, fixed)
    k, m = plate_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    res = plate_modal(p, n_modes=free.size)
    al, be = 5.0, 1e-6
    om = np.linspace(0.3, 1.7, 7) * res.omegas[0]
    hr = plate_harmonic(p, om, damping=(al, be))
    phi = res.mode_shapes[:, free]
    f_mod = phi @ p.loads[free]
    x_exact = np.zeros((om.size, free.size), dtype=complex)
    for i, w in enumerate(om):
        den = res.omegas ** 2 - w ** 2 + 1j * w * (al + be
                                                   * res.omegas ** 2)
        x_exact[i] = (f_mod / den) @ phi
    # atol floor: symmetric loading zeroes antisymmetric-mode
    # responses exactly — rtol alone is undefined at those nodes.
    np.testing.assert_allclose(hr.amplitude[:, free],
                               np.abs(x_exact), rtol=1e-8,
                               atol=1e-12 * np.abs(x_exact).max())


def test_banded_matches_dense():
    """The DIA device tier == the dense host solve (f32 CG on the
    device; the thin plate's (a/t)² conditioning makes Jacobi
    scaling load-bearing — mixed w/rotation DOF scales)."""
    from pinn_fem_tpu.models.plate import solve_plate_static_banded

    p = _ss_plate(0.01, 16)
    dense = solve_plate_static(p)
    banded, iters, rel = solve_plate_static_banded(p, tol=1e-9)
    assert rel < 1e-7 and iters > 0
    wd = dense.displacements[0::3]
    wb = banded.displacements[0::3]
    # Gates sit above the f32 device floor eps32·κ(K_ff) ≈ 1e-3 at
    # (a/t)² = 1e4 (the banded eigen-pencil lesson, CLAUDE.md);
    # measured: w 1.8e-3, moments 2.0e-3 relative.
    assert np.abs(wd - wb).max() < 4e-3 * np.abs(wd).max()
    assert np.allclose(banded.moments, dense.moments,
                       atol=1e-2 * np.abs(dense.moments).max())


def test_json_large_mesh_banded_tier():
    """Above DENSE_DOF_LIMIT the JSON static dispatches to the banded
    device tier: probes + summaries payload, center deflection still
    on the exact Mindlin series (40×40 = 5043 DOFs; the mesh keeps
    the exact center node)."""
    from pinn_fem_tpu.io.plate_io import run_plate_document
    from pinn_fem_tpu.models.plate import mindlin_navier_w

    nx = 40
    center_node = (nx // 2) * (nx + 1) + nx // 2
    out = run_plate_document({
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 1.0, "height": 1.0,
                 "nx": nx, "ny": nx},
        "material": {"young": 2e11, "poisson": 0.3,
                     "thickness": 0.02, "density": 7850.0},
        "pressure": -1000.0,
        "supports": {"simply_supported": ["left", "right", "bottom",
                                          "top"]},
        "analysis": {"type": "static", "tolerance": 1e-9,
                     "probe_nodes": [center_node]},
    })
    assert out["success"] and out["tier"] == "banded"
    assert out["relative_residual"] < 1e-7
    w_ex = mindlin_navier_w(1.0, 1.0, 0.5, 0.5, -1000.0, 2e11, 0.3,
                            0.02)
    np.testing.assert_allclose(out["displacements"][0], w_ex,
                               rtol=2e-3)
    np.testing.assert_allclose(out["max_deflection"], abs(w_ex),
                               rtol=2e-3)


def test_json_buckling_and_prestressed_modal():
    """JSON tier: analysis.type=buckling (membrane_force required —
    λ on the exact Mindlin closed form) and the membrane-prestress
    modal contract (ω₁ drops under the compressive state)."""
    from pinn_fem_tpu.io.plate_io import run_plate_document

    t = 0.05
    doc = {
        "element_type": "plate",
        "mesh": {"type": "rect", "width": A, "height": B,
                 "nx": 12, "ny": 12},
        "material": {"young": E, "poisson": NU,
                     "thickness": t, "density": RHO},
        "supports": {"simply_supported": ["left", "right", "bottom",
                                          "top"]},
        "analysis": {"type": "buckling",
                     "membrane_force": [-1.0, 0.0, 0.0],
                     "n_modes": 2, "include_shapes": False},
    }
    out = run_plate_document(doc)
    assert out["success"] and out["analysis"] == "buckling"
    n_ex = mindlin_ss_buckling_nx(A, B, E, NU, t)
    np.testing.assert_allclose(out["load_factors"][0], n_ex,
                               rtol=2e-2)
    assert "buckling_modes" not in out

    lam = out["load_factors"][0]
    base = dict(doc, analysis={"type": "modal", "n_modes": 1})
    om0 = run_plate_document(base)["omegas"][0]
    pres = dict(doc, analysis={
        "type": "modal", "n_modes": 1,
        "membrane_force": [-0.5 * lam, 0.0, 0.0]})
    outp = run_plate_document(pres)
    assert outp["prestressed"] and outp["omegas"][0] < 0.8 * om0

    with pytest.raises(ValueError, match="membrane_force"):
        run_plate_document(dict(doc, analysis={"type": "buckling"}))


# ---------------------------------------------------------------------------
# Through-thickness thermal gradient (κ_th = α ΔT / t): two EXACT
# discrete anchors + the Boley-Weiner SS membrane-analogy series
# ---------------------------------------------------------------------------

ALPHA_T = 1.2e-5


def test_thermal_free_plate_is_stress_free_cap():
    """A free plate (rigid modes pinned at the origin node) under
    uniform κ_th bends into the spherical cap w = κ(x²+y²)/2,
    β = κ(x, y) EXACTLY — the MITC4 constant-curvature patch state:
    bending energy is zero with β linear, and the assumed shear
    samples vanish because the midpoint slope of the edge-linear w
    interpolant equals the exact quadratic's (midpoint rule).
    Moments, shears and von Mises vanish to machine precision."""
    from pinn_fem_tpu.models.plate import solve_plate_static

    t, dt_th = 0.02, 40.0
    nodes, elems = rect_mesh(A, B, 6, 6)
    p = PlateProblem(nodes, elems, E, NU, t, RHO,
                     np.zeros(3 * nodes.shape[0]),
                     np.array([0, 1, 2]),          # node 0 at (0, 0)
                     alpha_cte=ALPHA_T, temperature=dt_th)
    r = solve_plate_static(p)
    kap = ALPHA_T * dt_th / t
    w_ex = kap * (nodes[:, 0] ** 2 + nodes[:, 1] ** 2) / 2.0
    bx_ex = kap * nodes[:, 0]
    by_ex = kap * nodes[:, 1]
    scale = np.abs(w_ex).max()
    np.testing.assert_allclose(r.displacements[0::3], w_ex,
                               atol=1e-10 * scale)
    np.testing.assert_allclose(r.displacements[1::3], bx_ex,
                               atol=1e-10 * scale)
    np.testing.assert_allclose(r.displacements[2::3], by_ex,
                               atol=1e-10 * scale)
    m_scale = (E * t ** 3 / 12.0) * kap
    assert np.abs(r.moments).max() < 1e-10 * m_scale
    assert np.abs(r.von_mises).max() < 1e-9 * m_scale / t ** 2
    assert np.abs(r.reactions).max() < 1e-9 * m_scale


def test_thermal_clamped_plate_flat_with_exact_stress():
    """A fully clamped plate under uniform κ_th stays FLAT (u ≡ 0 is
    the exact discrete solution: constant M_th self-equilibrates at
    interior nodes by the divergence theorem) with the textbook
    uniform stress σ = E α ΔT / (2(1−ν)) at the faces."""
    from pinn_fem_tpu.models.plate import solve_plate_static

    t, dt_th = 0.02, 40.0
    nodes, elems = rect_mesh(A, B, 5, 7)         # non-square mesh too
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "clamped")
    p = PlateProblem(nodes, elems, E, NU, t, RHO,
                     np.zeros(3 * nodes.shape[0]), fixed,
                     alpha_cte=ALPHA_T, temperature=dt_th)
    r = solve_plate_static(p)
    kap = ALPHA_T * dt_th / t
    d_rig = E * t ** 3 / (12.0 * (1.0 - NU ** 2))
    m_th = d_rig * (1.0 + NU) * kap
    assert np.abs(r.displacements).max() < 1e-12 * kap * A ** 2
    np.testing.assert_allclose(r.moments[:, 0], -m_th, rtol=1e-10)
    np.testing.assert_allclose(r.moments[:, 1], -m_th, rtol=1e-10)
    np.testing.assert_allclose(r.moments[:, 2], 0.0,
                               atol=1e-10 * m_th)
    sigma_ex = E * ALPHA_T * dt_th / (2.0 * (1.0 - NU))
    np.testing.assert_allclose(r.von_mises, sigma_ex, rtol=1e-10)


def test_thermal_ss_matches_membrane_analogy_series():
    """Simply supported square, thin limit: Boley-Weiner reduces the
    thermal Kirchhoff problem to the MEMBRANE Poisson problem
    ∇²w = −M*/D with w = 0 on the boundary (M* = D(1+ν)κ_th), so
    |w_center| = (1+ν)κ_th · u_P(a/2) with u_P the unit-Poisson
    solution (double-sine series, computed here)."""
    from pinn_fem_tpu.models.plate import solve_plate_static

    t, dt_th = 0.01, 40.0
    nodes, elems = rect_mesh(A, B, 16, 16)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "simply_supported")
    p = PlateProblem(nodes, elems, E, NU, t, RHO,
                     np.zeros(3 * nodes.shape[0]), fixed,
                     alpha_cte=ALPHA_T, temperature=dt_th)
    r = solve_plate_static(p)
    kap = ALPHA_T * dt_th / t
    # u_P(center) of −∇²u = 1 on the unit square, u|∂ = 0
    u_p = 0.0
    for m in range(1, 40, 2):
        for n in range(1, 40, 2):
            u_p += (16.0 / np.pi ** 4
                    * np.sin(m * np.pi / 2) * np.sin(n * np.pi / 2)
                    / (m * n * (m ** 2 + n ** 2)))
    w_ex = (1.0 + NU) * kap * u_p * A ** 2
    w_fem = np.abs(r.displacements[0::3]).max()
    # the series is KIRCHHOFF: the Mindlin answer sits slightly above
    # it (shear flexibility ~(t/a)²) on top of O(h²) discretization —
    # measured 4.1e-3 at 16×16, t/a = 0.01
    assert abs(w_fem - w_ex) < 8e-3 * w_ex


def test_thermal_json_banded_and_dynamic_guard():
    """JSON tier: the shared thermal block parses onto the plate
    family, the banded device tier carries the thermal load too, and
    the dynamic kinds refuse a ΔT gradient loudly."""
    from pinn_fem_tpu.io.plate_io import run_plate_document

    doc = {
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 1.0, "height": 1.0,
                 "nx": 5, "ny": 7},
        "material": {"young": E, "poisson": NU, "thickness": 0.02,
                     "density": RHO},
        "supports": {"clamped": ["left", "right", "bottom", "top"]},
        "thermal": {"alpha": ALPHA_T, "delta_t": 40.0},
        "analysis": {"type": "static"},
    }
    out = run_plate_document(doc)
    sigma_ex = E * ALPHA_T * 40.0 / (2.0 * (1.0 - NU))
    np.testing.assert_allclose(out["max_von_mises"], sigma_ex,
                               rtol=1e-10)
    assert out["max_deflection"] < 1e-12
    # both-forms ambiguity refused (the shared contract)
    bad = dict(doc)
    bad["temperature"] = 40.0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="EITHER"):
        run_plate_document(bad)
    # dynamics refuse the static load case
    dyn = dict(doc)
    dyn["analysis"] = {"type": "harmonic",
                       "omegas": {"start": 1.0, "stop": 5.0,
                                  "num": 3},
                       "damping": [0.1, 0.0]}
    with _pytest.raises(ValueError, match="static"):
        run_plate_document(dyn)
    # banded device tier carries the thermal load: SS thermal plate
    # (well-conditioned, nontrivial w), dense-vs-banded inside the
    # family's measured f32 gate (test_banded_matches_dense)
    from pinn_fem_tpu.models.plate import (solve_plate_static,
                                           solve_plate_static_banded)

    t, dt_th = 0.01, 40.0
    nodes, elems = rect_mesh(A, B, 16, 16)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "simply_supported")
    p = PlateProblem(nodes, elems, E, NU, t, RHO,
                     np.zeros(3 * nodes.shape[0]), fixed,
                     alpha_cte=ALPHA_T, temperature=dt_th)
    dense = solve_plate_static(p)
    banded, iters, rel = solve_plate_static_banded(p, tol=1e-9)
    assert rel < 1e-7
    wd, wb = dense.displacements[0::3], banded.displacements[0::3]
    assert np.abs(wd).max() > 0.0           # the load actually acts
    assert np.abs(wd - wb).max() < 4e-3 * np.abs(wd).max()


# ---------------------------------------------------------------------------
# Young's-modulus identification from measured deflections — the
# reference's flagship inverse (PINN material identification) on the
# bending family (identify_plane_young pattern; E at KNOWN thickness,
# since bending sees only D ~ E t³)
# ---------------------------------------------------------------------------


def test_identify_plate_young_per_element():
    """Two-zone SS plate under uniform pressure: per-element E
    recovered from full-field measured deflections through the traced
    dense solve."""
    from pinn_fem_tpu.models.plate import identify_plate_young

    t = 0.05
    nodes, elems = rect_mesh(A, B, 4, 4)
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "simply_supported")
    centroids = nodes[elems].mean(axis=1)
    e_true = np.where(centroids[:, 0] < A / 2.0, 2.0e11, 1.0e11)
    p_true = PlateProblem(nodes, elems, e_true, NU, t, RHO,
                          np.zeros(3 * nodes.shape[0]), fixed,
                          pressure=Q)
    u_true = solve_plate_static(p_true).displacements
    free = np.setdiff1d(np.arange(p_true.ndof), fixed)
    p0 = PlateProblem(nodes, elems, 1.5e11, NU, t, RHO,
                      np.zeros(3 * nodes.shape[0]), fixed, pressure=Q)
    vals, hist, fld = identify_plate_young(
        p0, free, u_true[free], n_iter=1500, learning_rate=0.05)
    assert fld is None
    np.testing.assert_allclose(vals, e_true, rtol=0.03)
    assert hist[-1] < 1e-6 * hist[0]


def test_identify_plate_zone_banded_json():
    """Slab damage localization through the JSON tier: the softened
    half of a simply supported slab recovered by the BANDED adjoint
    (zones parameterization, synthetic twin data generated on the
    banded tier) — the dyn-plane-identify contract on plates."""
    from pinn_fem_tpu.io.plate_io import run_plate_document

    doc = {
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 1.0, "height": 1.0,
                 "nx": 8, "ny": 8},
        "material": {"young": 2.0e11, "poisson": NU,
                     "thickness": 0.1, "density": RHO},
        "supports": {"simply_supported": ["left", "right", "bottom",
                                          "top"]},
        "pressure": Q,
        "analysis": {
            "type": "identification",
            "zones": [{"x_max": 0.5}, {"x_min": 0.5}],
            "synthetic": {"zone_young": [1.2e11, 2.4e11]},
            "probe_nodes": list(range(81)),
            "n_iter": 150, "learning_rate": 0.2,
            "tolerance": 1e-8,
        },
    }
    out = run_plate_document(doc)
    assert out["success"] and out["analysis"] == "identification"
    assert out["element_type"] == "plate"
    assert out["method"] == "banded"
    assert out["synthetic"] is True
    assert max(out["zone_rel_error"]) < 0.02
    assert out["final_loss"] < 1e-6 * out["loss_history"][0]
    # guards: zones need the banded tier; measured data required
    bad = dict(doc, analysis=dict(doc["analysis"], banded=False))
    with pytest.raises(ValueError, match="banded"):
        run_plate_document(bad)
    bare = dict(doc, analysis={"type": "identification"})
    with pytest.raises(ValueError, match="measured"):
        run_plate_document(bare)
