"""Geometrically nonlinear shallow shells (solvers/shell_nonlinear.py):
von Kármán / Marguerre membrane-bending coupling, load-stepped Newton
and Crisfield arc-length continuation.

Anchor set (module docstring of solvers/shell_nonlinear.py):

  * FLAT LINEAR LIMIT: at vanishing load the Marguerre assembly on a
    flat mesh IS the facet shell's (frames = identity), so the
    nonlinear solve reproduces solve_shell_static.
  * ENERGY EXACTNESS: f_int is the exact gradient of the assembled
    strain energy (central differences at a random large-deflection
    state, rel ~ 1e-10 measured) and the consistent tangent is
    symmetric to roundoff — the variational structure, not a
    hand-tuned operator.
  * VON KÁRMÁN STRIP: the immovable-edge SS strip under pressure has
    an EXACT beam solution (w(x; N) cosh closed form + the scalar
    membrane-force fixpoint N = EA/(2L) ∫ w'², solved to machine
    precision in-test with brentq).  At w/t ≈ 1.04 the membrane
    carries 3× of the load (linear w would be 0.311 vs actual 0.104)
    and the FE converges O(h²): measured rel 3.5e-3 / 8.9e-4 /
    2.4e-4 at nx = 8/16/32.
  * BIFURCATION LINK: a compressed flat SS plate amplifies a fixed
    transverse perturbation; the ratio amp(0.8 λ_cr)/amp(0.5 λ_cr)
    matches the single-mode prediction with the plate family's OWN
    discrete buckling factor (plate_buckling) to 0.2% measured —
    the nonlinear tangent and the linearized pencil agree on where
    stiffness dies.
  * SNAP-THROUGH: the half-sine arch under a half-sine load is
    EXACTLY single-mode in the continuum (sine modes make N
    spatially constant), so the whole path is the cubic
    λ(a) = −(D k⁴ a + EA k⁴ (e a/2 + a²/4)(e + a)) — the Riks trace
    follows it through BOTH folds (measured path error 1.9e-3 of the
    limit load at nx = 32, limit 3.0e-3, O(h²) under refinement:
    2.3e-2 / 5.5e-3 at nx = 8/16).

The reference's only nonlinearity is a dead Green-Lagrange truss
kernel (SURVEY §2.1); none of this exists there.
"""

import numpy as np
import pytest
from scipy.optimize import brentq

from pinn_fem_tpu.models.shell import (ShellProblem, arch_strip_mesh,
                                       solve_shell_static)
from pinn_fem_tpu.solvers.shell_nonlinear import (marguerre_energy,
                                                  solve_shell_nonlinear,
                                                  solve_shell_riks)

E, T = 200e3, 0.1
L, W = 4.0, 1.0
D = E * T**3 / 12.0
EA = E * T
K1 = np.pi / L
RISE = 0.15                       # 1.5 t — snaps, stays shallow


def flat_strip(nx, q):
    """Immovable pinned-edge flat strip (ν = 0 → cylindrical bending
    is exactly the von Kármán beam), θx suppressed."""
    nodes, elems = arch_strip_mesh(L, W, 0.0, nx)
    n = len(nodes)
    left = np.flatnonzero(nodes[:, 0] < 1e-9)
    right = np.flatnonzero(np.abs(nodes[:, 0] - L) < 1e-9)
    fixed = []
    for nd in np.concatenate([left, right]):
        fixed += [6 * nd + 0, 6 * nd + 1, 6 * nd + 2]
    for nd in range(n):
        fixed += [6 * nd + 3]
    return ShellProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=1.0,
                        loads=np.zeros(6 * n),
                        fixed_dofs=np.array(sorted(set(fixed))),
                        pressure=q)


def sine_arch(nx, rise=RISE):
    """Half-sine arch strip with the trapezoid-rule half-sine nodal
    load pattern (amplitude 1 per unit projected area at λ = 1)."""
    nodes, elems = arch_strip_mesh(L, W, rise, nx)
    n = len(nodes)
    xs = np.linspace(0.0, L, nx + 1)
    left = np.flatnonzero(nodes[:, 0] < 1e-9)
    right = np.flatnonzero(np.abs(nodes[:, 0] - L) < 1e-9)
    fixed = []
    for nd in np.concatenate([left, right]):
        fixed += [6 * nd + 0, 6 * nd + 1, 6 * nd + 2]
    for nd in range(n):
        fixed += [6 * nd + 3]
    h = L / nx
    loads = np.zeros(6 * n)
    for i, x in enumerate(xs):
        wt = h if 0 < i < nx else h / 2.0
        for row in (0, nx + 1):
            loads[6 * (i + row) + 2] = -np.sin(K1 * x) * wt * (W / 2)
    return ShellProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=1.0,
                        loads=loads,
                        fixed_dofs=np.array(sorted(set(fixed))))


def arch_lambda_exact(a, rise=RISE):
    """The exact single-mode cubic: downward load amplitude λ at
    midspan deflection a (< 0 downward)."""
    return -(D * K1**4 * a
             + EA * K1**4 * (rise * a / 2.0 + a * a / 4.0)
             * (rise + a))


def test_flat_linear_limit_exact():
    p = flat_strip(8, -1e-8)
    r = solve_shell_nonlinear(p, load_factors=[1.0], tol=1e-11)
    st = solve_shell_static(p)
    assert r.converged
    scale = np.abs(st.displacements).max()
    assert np.abs(r.displacements[-1] - st.displacements).max() \
        < 1e-9 * scale


def test_internal_force_is_energy_gradient():
    """The variational pin: at a random large-deflection state the
    assembled internal force equals the central-difference gradient
    of marguerre_energy, and the consistent tangent is symmetric."""
    from pinn_fem_tpu.solvers.shell_nonlinear import (_assemble,
                                                      _marguerre_geometry)

    rng = np.random.default_rng(0)
    p = flat_strip(4, 0.0)
    geo = _marguerre_geometry(p)
    u0 = 0.05 * rng.standard_normal(p.ndof)
    k, f_int, _, _, _ = _assemble(p, geo, u0)
    assert np.abs(k - k.T).max() < 1e-12 * np.abs(k).max()
    for _ in range(3):
        d = rng.standard_normal(p.ndof)
        h = 1e-6
        fd = (marguerre_energy(p, u0 + h * d)
              - marguerre_energy(p, u0 - h * d)) / (2.0 * h)
        an = float(f_int @ d)
        np.testing.assert_allclose(fd, an, rtol=1e-7)


def test_von_karman_strip_matches_exact_ode():
    """Membrane stiffening against the exact von Kármán beam: at
    w/t ≈ 1.04 (the linear answer would be 3× larger) the FE midspan
    deflection and membrane force converge O(h²) onto the cosh
    closed form + N-fixpoint solution."""
    q = 3.0 * 0.15 * 384.0 * D / (5.0 * L**4)

    def exact_mid():
        def resid(nf):
            kk = np.sqrt(nf / D)
            c = np.cosh(kk * L / 2.0)
            xs = np.linspace(-L / 2.0, L / 2.0, 4001)
            wp = (q / nf) * (np.sinh(kk * xs) / (kk * c) - xs)
            return nf - EA / (2.0 * L) * np.trapezoid(wp**2, xs)

        nf = brentq(resid, 1e-3, 5e3, xtol=1e-12, rtol=1e-14)
        kk = np.sqrt(nf / D)
        c = np.cosh(kk * L / 2.0)
        w0 = (q / nf) * ((1.0 - c) / (kk**2 * c) + L**2 / 8.0)
        return w0, nf

    w_ex, n_ex = exact_mid()
    assert 1.0 < w_ex / T < 1.1          # the calibrated regime
    errs = []
    for nx in (8, 16, 32):
        p = flat_strip(nx, -q)
        r = solve_shell_nonlinear(p,
                                  load_factors=np.linspace(0.25, 1.0,
                                                           4),
                                  tol=1e-11)
        assert r.converged
        w_fe = -r.displacements[-1][6 * (nx // 2) + 2]
        errs.append(abs(w_fe - w_ex) / w_ex)
        if nx == 32:
            nf = r.membrane_forces[-1][:, 0].mean()
            np.testing.assert_allclose(nf, n_ex, rtol=1e-3)
    # measured 3.5e-3 / 8.9e-4 / 2.4e-4 — O(h²).
    assert errs[2] < 5e-4
    assert errs[2] < 0.4 * errs[1] < 0.16 * errs[0]


def test_compressed_plate_amplification_matches_buckling():
    """The nonlinear tangent loses stiffness exactly where the plate
    family's linearized pencil says: a fixed transverse perturbation
    on a compressed SS square plate is amplified, and the ratio
    amp(0.8 λ_d)/amp(0.5 λ_d) matches the single-mode prediction
    with the DISCRETE buckling factor λ_d of plate_buckling
    (measured agreement 0.2% — the ratio cancels the multimodal
    offset of the point-load perturbation)."""
    from pinn_fem_tpu.models.plate import (PlateProblem,
                                           plate_buckling,
                                           plate_supports, rect_mesh)

    a_len, nx = 2.0, 8
    nodes2d, elems = rect_mesh(a_len, a_len, nx, nx, element="quad")
    nodes = np.column_stack([nodes2d, np.zeros(len(nodes2d))])
    n = len(nodes)
    xl = np.flatnonzero(nodes[:, 0] < 1e-9)
    xr = np.flatnonzero(np.abs(nodes[:, 0] - a_len) < 1e-9)
    yb = np.flatnonzero(nodes[:, 1] < 1e-9)
    yt = np.flatnonzero(np.abs(nodes[:, 1] - a_len) < 1e-9)
    fixed = []
    for nd in np.concatenate([xl, xr, yb, yt]):
        fixed += [6 * nd + 2]
    for nd in xl:
        fixed += [6 * nd + 0]
    for nd in yb:
        fixed += [6 * nd + 1]
    ncr = 4.0 * np.pi**2 * D / a_len**2
    h = a_len / nx
    loads0 = np.zeros(6 * n)
    for nd in xr:
        wt = h if 1e-9 < nodes[nd, 1] < a_len - 1e-9 else h / 2.0
        loads0[6 * nd + 0] = -ncr * wt
    cen = np.flatnonzero(
        (np.abs(nodes[:, 0] - a_len / 2) < 1e-9)
        & (np.abs(nodes[:, 1] - a_len / 2) < 1e-9))[0]

    def w_center(frac):
        ld = loads0 * frac
        ld[6 * cen + 2] = 1e-4
        p = ShellProblem(nodes=nodes, elements=elems, young=E,
                         poisson=0.3, thickness=T, density=1.0,
                         loads=ld,
                         fixed_dofs=np.array(sorted(set(fixed))))
        r = solve_shell_nonlinear(
            p, load_factors=np.linspace(1.0 / 3.0, 1.0, 3),
            tol=1e-10)
        assert r.converged
        return r.displacements[-1][6 * cen + 2]

    w0, w5, w8 = w_center(0.0), w_center(0.5), w_center(0.8)
    assert w0 > 0 and w5 > 1.5 * w0 and w8 > 1.8 * w5

    pl = PlateProblem(
        nodes=nodes2d, elements=elems, young=E, poisson=0.3,
        thickness=T, density=1.0, loads=np.zeros(3 * n),
        fixed_dofs=plate_supports(
            nodes2d, ["left", "right", "top", "bottom"],
            "simply_supported"))
    lam_d = plate_buckling(pl, membrane_force=[-ncr, 0.0, 0.0],
                           n_modes=1).load_factors[0]
    ratio_pred = (1.0 - 0.5 / lam_d) / (1.0 - 0.8 / lam_d)
    np.testing.assert_allclose((w8 / w0) / (w5 / w0), ratio_pred,
                               rtol=2e-2)


def test_arch_snap_through_exact_cubic():
    """The flagship: arc-length through BOTH folds of the half-sine
    arch, the whole (λ, a) path on the exact cubic."""
    lim_ex = -arch_lambda_exact(
        np.linspace(-RISE, 0.0, 20001)).min()  # ≈ 2.8944
    # local max of λ(a) on the falling branch:
    aa = np.linspace(-RISE, 0.0, 200001)
    lim_ex = arch_lambda_exact(aa).max()
    nx = 32
    p = sine_arch(nx)
    r = solve_shell_riks(p, n_steps=60, dl0=0.02, tol=1e-9,
                         max_dl=0.08)
    assert r.converged
    a_fe = r.displacements[:, 6 * (nx // 2) + 2]
    lam = r.load_factors
    # Both folds traversed: past the inverted rise, negative-λ
    # region visited, and the hardened branch picked back up.
    assert a_fe.min() < -2.0 * RISE
    assert lam.min() < -0.5
    assert lam[-1] > lim_ex
    # The whole shallow window sits on the cubic (measured 1.9e-3).
    sel = a_fe > -2.2 * RISE
    err = np.abs(lam[sel] - arch_lambda_exact(a_fe[sel])) / lim_ex
    assert err.max() < 4e-3
    # Limit load from the pre-snap window (measured 3.0e-3).
    pre = a_fe > -RISE
    assert abs(lam[pre].max() - lim_ex) / lim_ex < 6e-3


def test_arch_limit_load_refines_h2():
    """O(h²) onto the exact cubic limit (measured 2.3e-2 / 5.5e-3 at
    nx = 8/16)."""
    aa = np.linspace(-RISE, 0.0, 200001)
    lim_ex = arch_lambda_exact(aa).max()
    errs = []
    for nx in (8, 16):
        r = solve_shell_riks(sine_arch(nx), n_steps=60, dl0=0.02,
                             tol=1e-9, max_dl=0.08)
        a_fe = r.displacements[:, 6 * (nx // 2) + 2]
        pre = a_fe > -RISE
        errs.append(abs(r.load_factors[pre].max() - lim_ex) / lim_ex)
    assert errs[1] < 0.35 * errs[0]
    assert errs[0] < 4e-2


def test_deep_midsurface_refused():
    nodes, elems = arch_strip_mesh(L, W, 1.2, 8)   # slope ~ 0.94
    p = ShellProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=T, density=1.0,
                     loads=np.zeros(6 * len(nodes)),
                     fixed_dofs=np.array([0, 1, 2]))
    with pytest.raises(ValueError, match="[Ss]hallow|slope"):
        solve_shell_nonlinear(p, load_factors=[1.0])


def test_thermal_refused():
    p = flat_strip(4, -1.0)
    p.alpha_cte = np.full(p.nelm, 1e-5)
    p.temperature = np.full(p.nelm, 10.0)
    with pytest.raises(ValueError, match="thermoelastic|temperature"):
        solve_shell_nonlinear(p, load_factors=[1.0])


def test_json_tier_nonlinear_and_continuation():
    """Both nonlinear kinds end-to-end through io/shell_io.py on the
    generated arch_strip midsurface: the load-controlled run carries
    a sub-limit load, and the continuation run traces the snap with
    the λ range and probe payload aligned."""
    from pinn_fem_tpu.io.shell_io import run_shell_document

    aa = np.linspace(-RISE, 0.0, 200001)
    lim_ex = arch_lambda_exact(aa).max()
    nx = 16
    p = sine_arch(nx)          # for the load pattern + supports
    doc = {
        "element_type": "shell",
        "mesh": {"type": "arch_strip", "length": L, "width": W,
                 "rise": RISE, "nx": nx},
        "material": {"young": E, "poisson": 0.0, "thickness": T,
                     "density": 1.0},
        "loads": p.loads.tolist(),
        "fixed_dofs": p.fixed_dofs.tolist(),
        "analysis": {"type": "continuation", "n_steps": 60,
                     "dl0": 0.02, "max_dl": 0.08,
                     "probe_nodes": [nx // 2]},
    }
    out = run_shell_document(doc)
    assert out["success"] and out["analysis"] == "continuation"
    lam = np.asarray(out["load_factors"])
    d = np.asarray(out["displacements"])
    assert d.shape == (lam.size, 6)
    a_fe = d[:, 2]
    pre = a_fe > -RISE
    np.testing.assert_allclose(lam[pre].max(), lim_ex, rtol=2e-2)
    assert lam.min() < -0.5 and a_fe.min() < -2.0 * RISE

    doc2 = dict(doc, analysis={"type": "nonlinear",
                               "load_factors": [0.25, 0.5],
                               "probe_nodes": [nx // 2]})
    out2 = run_shell_document(doc2)
    assert out2["success"] and out2["analysis"] == "nonlinear"
    d2 = np.asarray(out2["displacements"])
    # λ = 0.5·lim? no: amplitude 0.5 — on the rising branch, the
    # cubic inverts to a unique small-|a| root; check consistency.
    a_half = d2[-1, 2]
    np.testing.assert_allclose(arch_lambda_exact(a_half), 0.5,
                               rtol=2e-2)
    assert "membrane_forces" in out2["final"]


def _hinged_panel(t):
    """Quarter model of the Sabir-Lock / Crisfield hinged cylindrical
    panel: R = 2540, full panel 508x508 (planform), half-angle 0.1
    rad, E = 3102.75, nu = 0.3, central point load (P/4 on the
    quarter).  Hinged (u = v = w = 0) along the straight edges,
    curved edges free, symmetry planes at the crown line and
    midspan."""
    r_cyl, th = 2540.0, 0.1
    nq = 8
    phis = np.linspace(0.0, th, nq + 1)
    ys = np.linspace(0.0, 254.0, nq + 1)
    nodes = np.array([[r_cyl * np.sin(ph), y, r_cyl * np.cos(ph)]
                      for y in ys for ph in phis])
    na = nq + 1
    elems = np.asarray([[j * na + i, j * na + i + 1,
                         j * na + i + 1 + na, j * na + i + na]
                        for j in range(nq) for i in range(nq)])
    fixed = []
    xmax = r_cyl * np.sin(th)
    for nd in range(len(nodes)):
        x, y = nodes[nd, 0], nodes[nd, 1]
        if abs(x - xmax) < 1e-6:
            fixed += [6 * nd + 0, 6 * nd + 1, 6 * nd + 2]
        if abs(x) < 1e-9:
            fixed += [6 * nd + 0, 6 * nd + 4, 6 * nd + 5]
        if abs(y - 254.0) < 1e-9:
            fixed += [6 * nd + 1, 6 * nd + 3, 6 * nd + 5]
    loads = np.zeros(6 * len(nodes))
    cen = np.flatnonzero((np.abs(nodes[:, 0]) < 1e-9)
                         & (np.abs(nodes[:, 1] - 254.0) < 1e-9))[0]
    loads[6 * cen + 2] = -1000.0 / 4.0      # λ in kN of full-panel P
    return ShellProblem(nodes=nodes, elements=elems, young=3102.75,
                        poisson=0.3, thickness=t, density=1.0,
                        loads=loads,
                        fixed_dofs=np.array(sorted(set(fixed)))), cen


def _first_limit(lam):
    for i in range(1, len(lam) - 1):
        if lam[i] > lam[i - 1] and lam[i] >= lam[i + 1]:
            return i
    return None


def test_hinged_cylindrical_panel_crisfield():
    """THE published nonlinear shell benchmark (Sabir & Lock 1973,
    Crisfield 1981): the hinged shallow cylindrical panel under a
    central point load.  t = 12.7: limit load ≈ 2.22 kN at w_c ≈ 11
    (measured 2.2325 at 10.85 on the 8×8 Marguerre quarter model),
    deep valley, then hardening.  t = 6.35: limit ≈ 0.59 kN AND
    SNAP-BACK — the center deflection itself reverses along the
    path, the case load- and displacement-control both fail and
    cylindrical arc length exists for (measured: w reverses, λ goes
    negative, P_lim = 0.597)."""
    p, cen = _hinged_panel(12.7)
    r = solve_shell_riks(p, n_steps=150, dl0=0.3, tol=1e-7,
                         max_dl=2.0)
    assert r.converged
    w = -r.displacements[:, 6 * cen + 2]
    lam = r.load_factors
    i = _first_limit(lam)
    assert i is not None
    np.testing.assert_allclose(lam[i], 2.22, rtol=4e-2)
    np.testing.assert_allclose(w[i], 10.9, rtol=0.1)
    valley = lam[i:i + 60].min()
    assert valley < 1.0                      # deep post-limit valley
    assert lam[-1] > lam[i]                  # hardened branch

    p2, cen2 = _hinged_panel(6.35)
    r2 = solve_shell_riks(p2, n_steps=160, dl0=0.2, tol=1e-7,
                          max_dl=1.0)
    assert r2.converged
    w2 = -r2.displacements[:, 6 * cen2 + 2]
    lam2 = r2.load_factors
    i2 = _first_limit(lam2)
    assert i2 is not None
    np.testing.assert_allclose(lam2[i2], 0.59, rtol=5e-2)
    assert np.any(np.diff(w2) < -1e-6)       # snap-back
    assert lam2.min() < 0.0


def test_banded_device_tier_matches_host():
    """The banded DIA device tier (solve_shell_nonlinear_banded) on
    the f64 host tier's answers: the von Kármán strip and a shallow
    cylinder panel both land at the f32 solution floor (measured
    1.2e-4 / 1.1e-4 rel), converging by the scale-free increment
    test in a handful of Newton iterations (the nonmonotone
    acceptance — a strict Armijo guard crawls at s = 1/16 on the
    panel, measured), and the mesh= tp-sharded path equals the
    single-device run."""
    import jax
    from jax.sharding import Mesh

    from pinn_fem_tpu.models.shell import cylinder_panel_mesh
    from pinn_fem_tpu.solvers.shell_nonlinear import \
        solve_shell_nonlinear_banded

    q = 3.0 * 0.15 * 384.0 * D / (5.0 * L**4)
    p = flat_strip(16, -q)
    rh = solve_shell_nonlinear(p, load_factors=np.linspace(0.25, 1.0,
                                                           4),
                               tol=1e-11)
    rb = solve_shell_nonlinear_banded(
        p, load_factors=np.linspace(0.25, 1.0, 4))
    assert rb.converged
    assert rb.iterations.max() <= 10
    sc = np.abs(rh.displacements[-1]).max()
    assert np.abs(rb.displacements[-1]
                  - rh.displacements[-1]).max() < 5e-4 * sc

    nodes, elems = cylinder_panel_mesh(25.0, 16.0, 15.0, 8, 16)
    n = len(nodes)
    fixed = []
    for i in range(n):
        if nodes[i, 1] in (0.0, 16.0):
            fixed += [6 * i + d for d in range(6)]
    p2 = ShellProblem(nodes=nodes, elements=elems, young=E,
                      poisson=0.3, thickness=T, density=1.0,
                      loads=np.zeros(6 * n),
                      fixed_dofs=np.array(fixed), pressure=-0.15)
    rh2 = solve_shell_nonlinear(p2,
                                load_factors=np.linspace(1.0 / 3.0,
                                                         1.0, 3),
                                tol=1e-10)
    rb2 = solve_shell_nonlinear_banded(
        p2, load_factors=np.linspace(1.0 / 3.0, 1.0, 3))
    assert rh2.converged and rb2.converged
    sc2 = np.abs(rh2.displacements[-1]).max()
    assert np.abs(rb2.displacements[-1]
                  - rh2.displacements[-1]).max() < 5e-4 * sc2
    # Strong nonlinearity actually present (membrane stiffening
    # ~24% below the linear-scaled response — measured).
    w1 = np.abs(rh2.displacements[0][2::6]).max()
    w3 = np.abs(rh2.displacements[-1][2::6]).max()
    assert w3 < 0.85 * 3.0 * w1

    mesh = Mesh(np.array(jax.devices()[:8]), ("tp",))
    rs = solve_shell_nonlinear_banded(
        p2, load_factors=np.linspace(1.0 / 3.0, 1.0, 3), mesh=mesh)
    assert rs.converged
    assert np.abs(rs.displacements[-1]
                  - rb2.displacements[-1]).max() < 3e-4 * sc2


def test_json_banded_nonlinear_opt_in():
    """The JSON nonlinear kind's "banded": true opt-in serves the
    device tier with the size-guarded payload."""
    from pinn_fem_tpu.io.shell_io import run_shell_document

    nx = 16
    p = sine_arch(nx)
    doc = {
        "element_type": "shell",
        "mesh": {"type": "arch_strip", "length": L, "width": W,
                 "rise": RISE, "nx": nx},
        "material": {"young": E, "poisson": 0.0, "thickness": T,
                     "density": 1.0},
        "loads": p.loads.tolist(),
        "fixed_dofs": p.fixed_dofs.tolist(),
        "analysis": {"type": "nonlinear", "banded": True,
                     "load_factors": [0.25, 0.5],
                     "probe_nodes": [nx // 2]},
    }
    out = run_shell_document(doc)
    assert out["success"] and out["tier"] == "banded"
    d = np.asarray(out["displacements"])
    a_half = d[-1, 2]
    # the exact cubic at the f32 floor
    np.testing.assert_allclose(arch_lambda_exact(a_half), 0.5,
                               rtol=5e-2)


def test_riks_never_commits_a_failed_step():
    """The solvers/riks.py failure doctrine on the Marguerre tier: a
    step whose corrector fails is retried at dl/4 from the LAST
    CONVERGED state and never committed.  Hostile settings (dl0 = 5,
    3 corrector iterations) must fail HONESTLY — converged False and
    zero contaminated path points (measured: 0 points); an oversized
    dl0 with a real corrector budget is RESCUED by the shrinks and
    still traces the whole snap on the exact cubic."""
    lim = arch_lambda_exact(np.linspace(-RISE, 0.0, 200001)).max()

    r_bad = solve_shell_riks(sine_arch(16), n_steps=30, dl0=5.0,
                             tol=1e-10, max_arc_iter=3)
    assert not r_bad.converged
    if r_bad.load_factors.size:
        a = r_bad.displacements[:, 6 * 8 + 2]
        err = np.abs(r_bad.load_factors - arch_lambda_exact(a))
        assert err.max() < 5e-3 * lim      # every point equilibrated

    r_ok = solve_shell_riks(sine_arch(16), n_steps=40, dl0=1.0,
                            tol=1e-9, max_arc_iter=25, max_dl=0.08)
    assert r_ok.converged
    a = r_ok.displacements[:, 6 * 8 + 2]
    assert a.min() < -2.0 * RISE           # through both folds
    sel = a > -2.2 * RISE
    err = np.abs(r_ok.load_factors[sel] - arch_lambda_exact(a[sel]))
    assert err.max() < 2e-2 * lim


def test_deep_diagonal_slope_refused():
    """The shallow-validity guard measures the gradient MAGNITUDE: a
    45°-oriented steep direction whose components are each under the
    bound (|∂w0/∂x| = |∂w0/∂y| = 0.38, |∇w0| = 0.54) must refuse."""
    nodes = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.38],
                      [1.0, 1.0, 0.76], [0.0, 1.0, 0.38]])
    p = ShellProblem(nodes=nodes, elements=np.array([[0, 1, 2, 3]]),
                     young=E, poisson=0.0, thickness=T, density=1.0,
                     loads=np.zeros(24), fixed_dofs=np.array([0]))
    with pytest.raises(ValueError, match="[Ss]hallow|slope"):
        solve_shell_nonlinear(p, load_factors=[1.0])
