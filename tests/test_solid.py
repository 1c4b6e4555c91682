"""3D solid hex8 family (models/solid.py) vs closed forms.

Anchors: the 3D patch test (linear field exact on a distorted mesh),
uniaxial stretch u = sigma L / E with exact Poisson contraction,
axial-rod frequencies f_k = (2k-1)c/4L (consistent mass, convergence
from above), cantilever tip deflection converging to Euler-Bernoulli,
banded DIA tier == dense host tier, Newmark vs modal superposition.
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.solid import (
    SolidProblem, SolidStaticResult, boundary_quads, box_mesh,
    solid_matrices, solid_modal, solve_solid_static,
    solve_solid_static_banded, solve_solid_transient, surface_load)

E, NU, RHO = 200.0, 0.3, 2.0


def _uniaxial_problem(nx=2, ny=2, nz=8, nu=NU, sigma=5.0):
    """Box pulled in +z with symmetry supports (bottom w, x=0 u,
    y=0 v): exact homogeneous uniaxial stress state at ANY mesh."""
    nodes, elems = box_mesh(1.0, 1.0, 4.0, nx, ny, nz)
    n = nodes.shape[0]
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    x0 = np.flatnonzero(np.abs(nodes[:, 0]) < 1e-12)
    y0 = np.flatnonzero(np.abs(nodes[:, 1]) < 1e-12)
    fixed = np.concatenate([3 * bot + 2, 3 * x0, 3 * y0 + 1])
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=nu,
                     density=RHO, loads=np.zeros(3 * n),
                     fixed_dofs=fixed)
    loads = surface_load(nodes, boundary_quads(p, 2, +1),
                         [0.0, 0.0, sigma])
    return SolidProblem(nodes=nodes, elements=elems, young=E,
                        poisson=nu, density=RHO, loads=loads,
                        fixed_dofs=fixed)


def test_uniaxial_closed_form_exact():
    sigma = 5.0
    p = _uniaxial_problem(sigma=sigma)
    r = solve_solid_static(p)
    nodes = p.nodes
    top = np.flatnonzero(np.abs(nodes[:, 2] - 4.0) < 1e-12)
    np.testing.assert_allclose(r.displacements[3 * top + 2],
                               sigma / E * 4.0, rtol=1e-9)
    # Exact Poisson contraction on the x = 1 face.
    x1 = np.flatnonzero(np.abs(nodes[:, 0] - 1.0) < 1e-12)
    np.testing.assert_allclose(r.displacements[3 * x1],
                               -NU * sigma / E, rtol=1e-9)
    # Homogeneous stress state: sigma_zz = sigma everywhere, von Mises
    # = sigma, principal = [sigma, 0, 0].
    np.testing.assert_allclose(r.stresses[:, 2], sigma, rtol=1e-9)
    np.testing.assert_allclose(r.von_mises, sigma, rtol=1e-9)
    np.testing.assert_allclose(r.principal[:, 0], sigma, rtol=1e-9)
    np.testing.assert_allclose(r.principal[:, 1:], 0.0, atol=1e-9)
    # Reactions balance the applied load.
    np.testing.assert_allclose(r.reactions.sum(), -sigma * 1.0,
                               rtol=1e-9)


def test_patch_test_distorted_mesh():
    """Linear displacement field u = a + B x reproduced EXACTLY on a
    distorted hex mesh with one interior node pulled off-center —
    the completeness requirement every conforming element must pass."""
    nodes, elems = box_mesh(1.0, 1.0, 1.0, 2, 2, 2)
    # Distort every interior node (here: the center node of the 2x2x2
    # grid plus face centers stay; move the true interior one).
    interior = np.flatnonzero(
        (nodes[:, 0] > 0) & (nodes[:, 0] < 1)
        & (nodes[:, 1] > 0) & (nodes[:, 1] < 1)
        & (nodes[:, 2] > 0) & (nodes[:, 2] < 1))
    nodes = nodes.copy()
    nodes[interior] += np.array([0.07, -0.11, 0.13])
    a = np.array([0.1, -0.05, 0.02])
    bmat = np.array([[0.2, 0.05, -0.03],
                     [0.05, -0.15, 0.08],
                     [-0.03, 0.08, 0.25]])     # symmetric -> valid field
    u_exact = (a[None, :] + nodes @ bmat.T).reshape(-1)
    boundary = np.setdiff1d(np.arange(nodes.shape[0]), interior)
    fixed = (3 * boundary[:, None] + np.arange(3)).reshape(-1)
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=NU,
                     density=RHO, loads=np.zeros(3 * nodes.shape[0]),
                     fixed_dofs=fixed, prescribed=u_exact[fixed])
    r = solve_solid_static(p)
    np.testing.assert_allclose(r.displacements, u_exact, atol=1e-12)
    # Constant strain everywhere = B_sym, constant stress.
    eps_exact = np.array([bmat[0, 0], bmat[1, 1], bmat[2, 2],
                          2 * bmat[1, 2], 2 * bmat[0, 2],
                          2 * bmat[0, 1]])
    np.testing.assert_allclose(r.strains,
                               np.tile(eps_exact, (p.nelm, 1)),
                               atol=1e-12)


def test_banded_matches_dense():
    p = _uniaxial_problem()
    r = solve_solid_static(p)
    rb, iters, rel = solve_solid_static_banded(p, tol=1e-10)
    assert rel < 1e-9 and iters > 0
    scale = np.abs(r.displacements).max()
    np.testing.assert_allclose(rb.displacements / scale,
                               r.displacements / scale, atol=1e-5)
    np.testing.assert_allclose(rb.von_mises, r.von_mises, rtol=1e-4)


def test_banded_sharded_matches_single_device():
    """mesh= shards the solid banded solve over "tp" (the plane
    family's multi-chip pattern) — n-dev == 1-dev."""
    import jax
    from jax.sharding import Mesh

    p = _uniaxial_problem(nz=12)
    r1, _, _ = solve_solid_static_banded(p, tol=1e-9)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4),
                ("dp", "tp"))
    rn, _, rel = solve_solid_static_banded(p, tol=1e-9, mesh=mesh)
    assert rel < 1e-8
    scale = np.abs(r1.displacements).max()
    np.testing.assert_allclose(rn.displacements / scale,
                               r1.displacements / scale, atol=1e-5)


def test_modal_axial_rod_frequencies():
    """All lateral DOFs pinned, nu = 0: the box IS a 1D rod; hex8
    consistent-mass frequencies converge to (2k-1)c/4L from above."""
    nodes, elems = box_mesh(1.0, 1.0, 4.0, 1, 1, 16)
    n = nodes.shape[0]
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    fixed = np.unique(np.concatenate(
        [3 * bot + 2, 3 * np.arange(n), 3 * np.arange(n) + 1]))
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=0.0,
                     density=RHO, loads=np.zeros(3 * n),
                     fixed_dofs=fixed)
    res = solid_modal(p, n_modes=3)
    c = np.sqrt(E / RHO)
    exact = (2.0 * np.arange(1, 4) - 1.0) * c / (4.0 * 4.0)
    assert np.all(res.frequencies_hz >= exact * (1.0 - 1e-9))
    np.testing.assert_allclose(res.frequencies_hz, exact, rtol=1.5e-2)
    np.testing.assert_allclose(res.frequencies_hz[0], exact[0],
                               rtol=1e-3)
    assert res.mode_shapes.shape == (3, 3 * n)


def test_cantilever_converges_to_euler_bernoulli():
    """End-loaded cantilever: hex8 tip deflection approaches
    P L^3 / 3EI + shear term under in-plane refinement.
    Full-integration trilinear bricks SHEAR-LOCK in bending — measured
    errors on this configuration: 31.2% at 2 through-thickness
    elements, 10.8% at 4 — so the anchor is monotone convergence
    toward the Timoshenko value and the measured 4-element band."""
    P, L, h = 1.0, 8.0, 1.0
    inertia = h ** 4 / 12.0
    kappa = 5.0 / 6.0
    g_mod = E / (2.0 * (1.0 + NU))
    w_timo = P * L ** 3 / (3.0 * E * inertia) \
        + P * L / (kappa * g_mod * h * h)
    errs = []
    for nxy in (2, 4):
        nodes, elems = box_mesh(h, h, L, nxy, nxy, 4 * nxy)
        n = nodes.shape[0]
        bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
        fixed = (3 * bot[:, None] + np.arange(3)).reshape(-1)
        p = SolidProblem(nodes=nodes, elements=elems, young=E,
                         poisson=NU, density=RHO,
                         loads=np.zeros(3 * n), fixed_dofs=fixed)
        loads = surface_load(nodes, boundary_quads(p, 2, +1),
                             [P / (h * h), 0.0, 0.0])
        p = SolidProblem(nodes=nodes, elements=elems, young=E,
                         poisson=NU, density=RHO, loads=loads,
                         fixed_dofs=fixed)
        r, _, rel = solve_solid_static_banded(p, tol=1e-9)
        assert rel < 1e-8
        tip = np.flatnonzero(np.abs(nodes[:, 2] - L) < 1e-12)
        w_tip = float(np.mean(r.displacements[3 * tip]))
        errs.append(abs(w_tip - w_timo) / w_timo)
    assert errs[1] < errs[0]          # monotone under refinement
    assert errs[1] < 0.12, errs


def test_transient_matches_modal_superposition():
    """Undamped Newmark step response == exact modal superposition
    q_j(t) = (phi_j . f / w_j^2)(1 - cos w_j t) summed over ALL free
    modes (the plane family's cross-validation, 3-DOF nodes)."""
    import scipy.linalg

    p = _uniaxial_problem(nx=1, ny=1, nz=4, sigma=2.0)
    k, m = solid_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    f = p.loads[free]
    w = np.sqrt(np.maximum(lam, 1e-30))
    dt = 0.02 * 2.0 * np.pi / w[-1]
    n_steps = 400
    probe = np.array([free[-1]])
    res = solve_solid_transient(p, dt, n_steps, probe_dofs=probe)
    q = vec.T @ f
    t = res.times
    u_modal = np.zeros_like(t)
    j = np.flatnonzero(free == probe[0])[0]
    for kk in range(lam.size):
        u_modal += vec[j, kk] * q[kk] / lam[kk] \
            * (1.0 - np.cos(w[kk] * t))
    scale = np.abs(u_modal).max()
    np.testing.assert_allclose(res.displacements[:, 0] / scale,
                               u_modal / scale, atol=2e-3)


def test_validation_guards():
    nodes, elems = box_mesh(1.0, 1.0, 1.0, 1, 1, 1)
    kw = dict(young=E, poisson=NU, density=RHO,
              loads=np.zeros(3 * nodes.shape[0]),
              fixed_dofs=np.array([0]))
    # A true reflection (bottom/top quad swap flips zeta only, so
    # det J < 0; full connectivity reversal is a natural-space
    # rotation and stays positively oriented).
    with pytest.raises(ValueError, match="positively"):
        SolidProblem(nodes=nodes,
                     elements=elems[:, [4, 5, 6, 7, 0, 1, 2, 3]], **kw)
    with pytest.raises(ValueError, match="singular at 0.5"):
        SolidProblem(nodes=nodes, elements=elems,
                     young=E, poisson=0.5, density=RHO,
                     loads=np.zeros(3 * nodes.shape[0]),
                     fixed_dofs=np.array([0]))
    with pytest.raises(ValueError, match="hex8"):
        SolidProblem(nodes=nodes, elements=elems[:, :4], **kw)


def test_solid_json_tier_contract():
    """run_solid_document: named faces, surface loads, box mesh, all
    three analyses — the uniaxial closed form through the JSON tier,
    and the HTTP handler (serve.server._solve_solid) on the same
    body."""
    from pinn_fem_tpu.io.solid_io import run_solid_document
    from pinn_fem_tpu.serve.server import _solve_solid

    doc = {
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 4.0,
                 "nx": 2, "ny": 2, "nz": 8},
        "material": {"young": 200.0, "poisson": 0.3, "density": 2.0},
        "fixed_z_nodes": "z_min",
        "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0.0, 0.0, 5.0]}],
        "analysis": {"type": "static"},
    }
    out = run_solid_document(doc)
    assert out["success"] and out["method"] == "dense"
    np.testing.assert_allclose(out["max_displacement"], 0.1, rtol=1e-9)
    np.testing.assert_allclose(out["max_von_mises"], 5.0, rtol=1e-9)
    u = np.asarray(out["displacements"])
    assert u.shape == (3 * 3 * 3 * 9,)    # (nx+1)(ny+1)(nz+1) nodes

    # Banded override on the same document == dense.
    outb = run_solid_document(
        {**doc, "analysis": {"type": "static", "banded": True,
                             "tolerance": 1e-9}})
    assert outb["method"] == "banded" and outb["iterations"] > 0
    np.testing.assert_allclose(outb["max_displacement"],
                               out["max_displacement"], rtol=1e-5)

    # HTTP handler injects element_type itself.
    body = {k: v for k, v in doc.items() if k != "element_type"}
    outh = _solve_solid(body)
    assert outh["success"]
    np.testing.assert_allclose(outh["max_displacement"], 0.1,
                               rtol=1e-9)

    # Modal + transient reachable from the same document.
    outm = run_solid_document(
        {**doc, "analysis": {"type": "modal", "n_modes": 3}})
    f = np.asarray(outm["frequencies_hz"])
    assert f.shape == (3,) and np.all(f > 0)
    outt = run_solid_document(
        {**doc, "analysis": {"type": "transient", "dt": 0.02,
                             "n_steps": 50,
                             "probe_nodes": "z_max"}})
    d = np.asarray(outt["displacements"])
    assert d.shape[0] == 50 and np.isfinite(d).all()

    # Error contract.
    with pytest.raises(ValueError, match="poisson"):
        run_solid_document({**doc, "material": {"young": 1.0}})
    with pytest.raises(ValueError, match="named face"):
        run_solid_document({**doc, "fixed_z_nodes": "bottom"})
    with pytest.raises(ValueError, match="supports"):
        run_solid_document({k: v for k, v in doc.items()
                            if not k.startswith("fixed")})


def test_solid_modal_banded_matches_dense_lumped():
    """solid_modal_banded (layout-generic subspace iteration on the
    hex8 DIA diagonals, row-sum-lumped mass) == a dense eigensolve of
    the SAME lumped discrete problem — and total lumped mass is exact
    (partition of unity)."""
    import scipy.linalg

    from pinn_fem_tpu.models.solid import (solid_lumped_mass_diag,
                                           solid_modal_banded)

    p = _uniaxial_problem(nx=1, ny=1, nz=10)
    m_diag = solid_lumped_mass_diag(p)
    np.testing.assert_allclose(m_diag.sum() / 3.0,
                               RHO * 1.0 * 1.0 * 4.0, rtol=1e-12)
    k, _ = solid_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    lam_dense = scipy.linalg.eigh(
        k[np.ix_(free, free)], np.diag(m_diag[free]),
        eigvals_only=True)[:3]
    res = solid_modal_banded(p, n_modes=3, n_iter=40, cg_tol=1e-9)
    np.testing.assert_allclose(res.eigenvalues, lam_dense, rtol=2e-3)
    assert res.mode_shapes.shape == (3, p.ndof)
    # Sharded block solves == single device (the frame pattern).
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4),
                ("dp", "tp"))
    res_s = solid_modal_banded(p, n_modes=3, n_iter=40, cg_tol=1e-9,
                               mesh=mesh)
    np.testing.assert_allclose(res_s.eigenvalues, res.eigenvalues,
                               rtol=1e-3)


def test_solid_explicit_banded_matches_newmark():
    """solve_solid_transient_banded (central difference on the DIA
    matvec, lumped mass) vs the host Newmark trajectory with lumped
    point-mass equivalents: both converge to the same physics, and at
    dt << dt_crit the explicit probe trajectory matches the exact
    modal superposition of the SAME lumped discrete problem."""
    import scipy.linalg

    from pinn_fem_tpu.models.solid import (solid_lumped_mass_diag,
                                           solid_stable_dt,
                                           solve_solid_transient_banded)

    p = _uniaxial_problem(nx=1, ny=1, nz=6, sigma=2.0)
    dt_c = solid_stable_dt(p, safety=1.0)
    # 0.05 dt_crit: central-difference period dispersion is
    # O((w dt)^2) per cycle (measured 1.25e-2 at 0.2 dt_crit over this
    # window) — the comparison needs the integrator's error below the
    # 5e-3 gate, not at it.
    dt = 0.05 * dt_c
    n_steps = 600
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    probe = np.array([free[-1]])
    res = solve_solid_transient_banded(p, dt, n_steps,
                                       probe_dofs=probe,
                                       record_every=2)
    assert np.isfinite(res.displacements).all()
    # Exact modal superposition of the lumped discrete problem.
    k, _ = solid_matrices(p)
    m_diag = solid_lumped_mass_diag(p)
    kf = k[np.ix_(free, free)]
    d = np.sqrt(m_diag[free])
    lam, y = scipy.linalg.eigh(kf / d[:, None] / d[None, :])
    v = y / d[:, None]
    q = v.T @ p.loads[free]
    w = np.sqrt(np.maximum(lam, 1e-30))
    j = np.flatnonzero(free == probe[0])[0]
    u_exact = np.zeros(res.times.size)
    for kk in range(lam.size):
        u_exact += v[j, kk] * q[kk] / lam[kk] \
            * (1.0 - np.cos(w[kk] * res.times))
    scale = np.abs(u_exact).max()
    np.testing.assert_allclose(res.displacements[:, 0] / scale,
                               u_exact / scale, atol=5e-3)
    # Stability guard: the Gershgorin step keeps a long run bounded.
    res_long = solve_solid_transient_banded(
        p, solid_stable_dt(p), 2000, probe_dofs=probe,
        record_every=100)
    assert np.abs(res_long.displacements).max() < 10.0 * scale


def test_solid_transient_banded_json_tier():
    """"banded": true + dt "auto" through run_solid_document."""
    from pinn_fem_tpu.io.solid_io import run_solid_document

    out = run_solid_document({
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 3.0,
                 "nx": 1, "ny": 1, "nz": 6},
        "material": {"young": 200.0, "poisson": 0.3, "density": 2.0},
        "fixed_z_nodes": "z_min",
        "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0.0, 0.0, 2.0]}],
        "analysis": {"type": "transient", "dt": "auto",
                     "n_steps": 200, "banded": True,
                     "probe_nodes": "z_max", "record_every": 10}})
    assert out["success"] and out["method"] == "central-banded"
    d = np.asarray(out["displacements"])
    assert d.shape[0] == 20 and np.isfinite(d).all()
    # Step response oscillates about the static closed form 2*3/200.
    u_static = 2.0 * 3.0 / 200.0
    probe_z = np.asarray(out["displacements"])[:, 2::3]
    assert 0.5 * u_static < probe_z.max() < 2.5 * u_static


def test_identify_solid_young_banded_two_zone():
    """3D damage localization through the shared banded-adjoint loop
    (solvers/banded_inverse): a softened lower half of the hex8 column
    recovered to 0.5% from surface probe displacements."""
    from pinn_fem_tpu.models.solid import (identify_solid_young_banded,
                                           solve_solid_static_banded)

    nodes, elems = box_mesh(1.0, 1.0, 4.0, 2, 2, 10)
    n = nodes.shape[0]
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    x0 = np.flatnonzero(np.abs(nodes[:, 0]) < 1e-12)
    y0 = np.flatnonzero(np.abs(nodes[:, 1]) < 1e-12)
    fixed = np.concatenate([3 * bot + 2, 3 * x0, 3 * y0 + 1])
    cent_z = nodes[elems].mean(axis=1)[:, 2]
    zones = [np.flatnonzero(cent_z < 2.0).tolist(),
             np.flatnonzero(cent_z >= 2.0).tolist()]
    true_young = np.where(cent_z < 2.0, 150.0, 250.0)
    kw = dict(poisson=NU, density=RHO, loads=np.zeros(3 * n),
              fixed_dofs=fixed)
    p0 = SolidProblem(nodes=nodes, elements=elems, young=true_young,
                      **kw)
    loads = surface_load(nodes, boundary_quads(p0, 2, +1),
                         [0.0, 0.0, 5.0])
    p_true = SolidProblem(nodes=nodes, elements=elems,
                          young=true_young, poisson=NU, density=RHO,
                          loads=loads, fixed_dofs=fixed)
    r, _, _ = solve_solid_static_banded(p_true, tol=1e-10)
    probe = np.arange(p_true.ndof)[
        np.abs(r.displacements) > 1e-12][::5]
    p_guess = SolidProblem(nodes=nodes, elements=elems, young=200.0,
                           poisson=NU, density=RHO, loads=loads,
                           fixed_dofs=fixed)
    young, hist, _ = identify_solid_young_banded(
        p_guess, probe, r.displacements[probe], zones=zones,
        n_iter=150, learning_rate=0.2, tol=1e-9)
    assert hist[-1] < 1e-3 * hist[0]
    np.testing.assert_allclose(young[zones[0]].mean(), 150.0,
                               rtol=5e-3)
    np.testing.assert_allclose(young[zones[1]].mean(), 250.0,
                               rtol=5e-3)


def test_solid_identification_json_tier():
    """Synthetic zone twin data + z-box zones through
    run_solid_document — the plane contract carried to 3D."""
    from pinn_fem_tpu.io.solid_io import run_solid_document

    out = run_solid_document({
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 4.0,
                 "nx": 2, "ny": 2, "nz": 10},
        "material": {"young": 200.0, "poisson": 0.3, "density": 2.0},
        "fixed_z_nodes": "z_min",
        "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0.0, 0.0, 5.0]}],
        "analysis": {"type": "identification",
                     "zones": [{"z_max": 2.0}, {"z_min": 2.0}],
                     "synthetic": {"zone_young": [150.0, 250.0]},
                     "probe_nodes": "x_max",
                     "n_iter": 150, "learning_rate": 0.2,
                     "tolerance": 1e-9}})
    assert out["success"] and out["method"] == "banded"
    assert out["synthetic"]
    assert max(out["zone_rel_error"]) < 5e-3
    assert sorted(sum(out["zones"], [])) == list(range(2 * 2 * 10))


def test_solid_harmonic_matches_modal_superposition():
    """Direct complex sweep vs the ALL-modes superposition (exact for
    Rayleigh damping): X(w) = sum phi phi^T f / (w_j^2 - w^2
    + i w (alpha + beta w_j^2)) with M-orthonormal shapes — the plane
    family's exactness anchor with 3-DOF nodes."""
    from pinn_fem_tpu.models.solid import solid_harmonic

    p = _uniaxial_problem(nx=1, ny=1, nz=4)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    res = solid_modal(p, n_modes=free.size)
    alpha, beta = 0.02, 1e-3
    om = np.linspace(0.1, 1.5 * res.omegas[1], 30)
    hr = solid_harmonic(p, om, damping=(alpha, beta), probe_dofs=free)
    phi = res.mode_shapes[:, free]
    _, m = solid_matrices(p)
    mf = m[np.ix_(free, free)]
    # scipy.eigh shapes are M-orthonormal already; assert, don't trust.
    np.testing.assert_allclose(phi @ mf @ phi.T, np.eye(free.size),
                               atol=1e-8)
    f = p.loads[free]
    gen = phi @ f
    denom = (res.omegas[:, None] ** 2 - om[None, :] ** 2
             + 1j * om[None, :] * (alpha
                                   + beta * res.omegas[:, None] ** 2))
    x_modal = np.einsum("kw,kn->wn", gen[:, None] / denom, phi)
    np.testing.assert_allclose(hr.real + 1j * hr.imag, x_modal,
                               atol=1e-8 * np.abs(x_modal).max())


def test_solid_harmonic_json_tier():
    """Harmonic through run_solid_document: a resonance peak inside
    the sweep, driven-support guard raising."""
    from pinn_fem_tpu.io.solid_io import run_solid_document

    doc = {
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 4.0,
                 "nx": 1, "ny": 1, "nz": 4},
        "material": {"young": 200.0, "poisson": 0.3, "density": 2.0},
        "fixed_z_nodes": "z_min",
        "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0.0, 0.0, 5.0]}],
        "analysis": {"type": "harmonic",
                     "omegas": {"start": 0.5, "stop": 6.0, "num": 60},
                     "damping": [0.02, 1e-3],
                     "probe_nodes": "z_max"},
    }
    out = run_solid_document(doc)
    assert out["success"] and out["analysis"] == "harmonic"
    amp = np.asarray(out["amplitude"])
    assert amp.shape == (60, 12) and np.isfinite(amp).all()
    # First axial resonance (f1 ~ c/4L -> omega ~ 2pi*0.625/... ): a
    # peak strictly inside the sweep, above the static end.
    zcols = amp[:, 2::3].max(axis=1)
    assert zcols.max() > 3.0 * zcols[0]
    assert 0 < int(np.argmax(zcols)) < 59

    bad = dict(doc)
    bad["prescribed"] = [[2, 0.1]]
    with pytest.raises(ValueError, match="homogeneous"):
        run_solid_document(bad)


def test_solid_buckling_euler_column():
    """Linearized buckling of a clamped square-section column vs the
    Euler load π²EI/(4L²): hex8 converges from above at the h² rate,
    so the two-mesh Richardson extrapolation lands on the closed form
    to 1% (measured: 49.8% and 22.1% raw, 0.2% extrapolated), and the
    square section makes the lowest eigenvalue a DOUBLE root (one
    lateral direction each)."""
    from pinn_fem_tpu.models.solid import solid_buckling

    Ey, w, L = 1000.0, 0.5, 10.0
    p_euler = np.pi ** 2 * Ey * (w * w ** 3 / 12.0) / (4.0 * L ** 2)
    lams = []
    for nx, nz in [(2, 20), (3, 30)]:
        nodes, elems = box_mesh(w, w, L, nx, nx, nz)
        n = nodes.shape[0]
        bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
        fixed = (3 * bot[:, None] + np.arange(3)).reshape(-1)
        p0 = SolidProblem(nodes=nodes, elements=elems, young=Ey,
                          poisson=0.0, density=1.0,
                          loads=np.zeros(3 * n), fixed_dofs=fixed)
        loads = surface_load(nodes, boundary_quads(p0, 2, +1),
                             [0.0, 0.0, -1.0 / w ** 2])  # P_total = 1
        p = SolidProblem(nodes=nodes, elements=elems, young=Ey,
                         poisson=0.0, density=1.0, loads=loads,
                         fixed_dofs=fixed)
        res = solid_buckling(p, n_modes=3)
        lams.append(res.load_factors)
        assert res.load_factors[0] > p_euler          # from above
        # Double root: the two lateral sway directions tie exactly.
        np.testing.assert_allclose(res.load_factors[0],
                                   res.load_factors[1], rtol=1e-9)
    # h² Richardson with mesh ratio 1.5: lam2 + (lam2−lam1)/(1.5²−1).
    extrap = lams[1][0] + (lams[1][0] - lams[0][0]) / 1.25
    np.testing.assert_allclose(extrap, p_euler, rtol=0.01)


def test_solid_buckling_json_tier():
    from pinn_fem_tpu.io.solid_io import run_solid_document

    out = run_solid_document({
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 0.5, "ly": 0.5, "lz": 10.0,
                 "nx": 2, "ny": 2, "nz": 20},
        "material": {"young": 1000.0, "poisson": 0.0, "density": 1.0},
        "fixed_nodes": "z_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0.0, 0.0, -4.0]}],
        "analysis": {"type": "buckling", "n_modes": 2,
                     "include_shapes": False}})
    assert out["success"] and out["analysis"] == "buckling"
    lam = np.asarray(out["load_factors"])
    p_euler = np.pi ** 2 * 1000.0 * (0.5 ** 4 / 12.0) / 400.0
    # Raw 2×2×20 mesh: ~50% above Euler (the solver test owns
    # accuracy); the double root must survive the JSON trip.
    assert p_euler < lam[0] < 1.6 * p_euler
    np.testing.assert_allclose(lam[0], lam[1], rtol=1e-9)
    assert "buckling_modes" not in out
