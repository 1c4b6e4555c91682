"""3D space-frame family (models/frame3d.py): closed-form anchors for
the 12-DOF beam element — biaxial cantilever tips, torsion, the
right-angle grillage, rigid-rotation objectivity, rod/beam modal
series, Newmark vs exact modal superposition, harmonic vs all-modes
superposition."""

import numpy as np
import pytest

from pinn_fem_tpu.models.frame3d import (SpaceFrameProblem,
                                         solve_space_frame_static,
                                         solve_space_frame_transient,
                                         space_frame_harmonic,
                                         space_frame_matrices,
                                         space_frame_modal)

E, G, A, IY, IZ, J, RHO = 200.0, 80.0, 1.0, 0.02, 0.05, 0.03, 1.2
L = 4.0


def cantilever(n=1, **kw):
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1),
                      np.zeros(n + 1)], axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = kw.pop("loads", np.zeros(6 * (n + 1)))
    return SpaceFrameProblem(nodes, elements, E, A, IY, IZ, J, RHO,
                             loads, np.arange(6), shear_modulus=G,
                             **kw)


def tip_load(n, dof, value):
    loads = np.zeros(6 * (n + 1))
    loads[6 * n + dof] = value
    return loads


def test_cantilever_exact_one_element_all_actions():
    """Hermite/linear shapes + nodal loads: PL³/3EIz (local x–y),
    PL³/3EIy (local x–z), TL/GJ, PL/EA — machine precision with ONE
    element, plus the matching local end-force recovery."""
    P = 1.0
    st = solve_space_frame_static(cantilever(loads=tip_load(1, 1, -P)))
    np.testing.assert_allclose(st.displacements[7],
                               -P * L ** 3 / (3.0 * E * IZ), rtol=1e-14)
    np.testing.assert_allclose(st.displacements[11],
                               -P * L ** 2 / (2.0 * E * IZ), rtol=1e-14)
    # End-force convention is the k·u NODAL force (the 2D family's):
    # the clamped-end moment holding the element is +P·L.
    np.testing.assert_allclose(st.moments_z[0, 0], P * L, rtol=1e-12)

    st = solve_space_frame_static(cantilever(loads=tip_load(1, 2, -P)))
    np.testing.assert_allclose(st.displacements[8],
                               -P * L ** 3 / (3.0 * E * IY), rtol=1e-14)
    # w′ = −θy: downward bending means POSITIVE rotation about local y.
    np.testing.assert_allclose(st.displacements[10],
                               P * L ** 2 / (2.0 * E * IY), rtol=1e-14)
    np.testing.assert_allclose(np.abs(st.moments_y[0, 0]), P * L,
                               rtol=1e-12)

    st = solve_space_frame_static(cantilever(loads=tip_load(1, 3, 1.0)))
    np.testing.assert_allclose(st.displacements[9], L / (G * J),
                               rtol=1e-14)
    np.testing.assert_allclose(st.torque, [1.0], rtol=1e-12)

    st = solve_space_frame_static(cantilever(loads=tip_load(1, 0, 1.0)))
    np.testing.assert_allclose(st.displacements[6], L / (E * A),
                               rtol=1e-14)
    np.testing.assert_allclose(st.axial, [1.0], rtol=1e-12)
    # Clamped-end reactions balance the tip load exactly.
    np.testing.assert_allclose(st.reactions[0], -1.0, rtol=1e-12)


def test_objectivity_under_rigid_rotation():
    """Rotating nodes, loads, and the reference vector by a random
    rigid rotation rotates the solution exactly (frame indifference —
    the transformation algebra is the thing being pinned)."""
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1.0
    nodes = np.array([[0.0, 0.0, 0.0], [L, 0.0, 0.0]])
    el = np.array([[0, 1]])
    loads = np.zeros(12)
    loads[7], loads[9] = -1.0, 0.5          # tip force + tip torque
    ref = np.array([[0.0, 0.0, 1.0]])
    p0 = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO, loads,
                           np.arange(6), shear_modulus=G,
                           ref_vector=ref)
    loads_r = loads.copy()
    loads_r[6:9] = q @ loads[6:9]
    loads_r[9:12] = q @ loads[9:12]
    pr = SpaceFrameProblem(nodes @ q.T, el, E, A, IY, IZ, J, RHO,
                           loads_r, np.arange(6), shear_modulus=G,
                           ref_vector=ref @ q.T)
    u0 = solve_space_frame_static(p0).displacements
    ur = solve_space_frame_static(pr).displacements
    u0r = u0.copy()
    u0r[6:9] = q @ u0[6:9]
    u0r[9:12] = q @ u0[9:12]
    np.testing.assert_allclose(ur, u0r, atol=1e-13)
    # Local member forces are rotation-invariant.
    f0 = solve_space_frame_static(p0).member_end_forces
    fr = solve_space_frame_static(pr).member_end_forces
    np.testing.assert_allclose(fr, f0, atol=1e-12)


def test_right_angle_grillage_closed_form():
    """The classic grillage anchor: leg AB along X (clamped at A), leg
    BC along Y, vertical tip load P at C.  BC bends; AB bends under
    the transferred shear AND twists under the lever moment P·L₂:
    δ_C = P L₁³/3EI_y + P L₂³/3EI_y + P L₂² L₁ / (G J) — exact with
    two elements (bending is in each leg's local x–z plane, I_y)."""
    l1, l2, p_ = 3.0, 2.0, 1.0
    nodes = np.array([[0.0, 0.0, 0.0], [l1, 0.0, 0.0],
                      [l1, l2, 0.0]])
    el = np.array([[0, 1], [1, 2]])
    loads = np.zeros(18)
    loads[14] = -p_
    pg = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO, loads,
                           np.arange(6), shear_modulus=G)
    st = solve_space_frame_static(pg)
    exact = -(p_ * l1 ** 3 / (3.0 * E * IY)
              + p_ * l2 ** 3 / (3.0 * E * IY)
              + p_ * l2 ** 2 * l1 / (G * J))
    np.testing.assert_allclose(st.displacements[14], exact, rtol=1e-13)
    # Leg AB carries the full lever torque P·L₂.
    np.testing.assert_allclose(np.abs(st.torque[0]), p_ * l2,
                               rtol=1e-12)


def test_modal_rod_series_and_interleaved_bending_families():
    """Consistent-mass convergence from above onto the clamped-free
    axial and torsional rod series; then a simply supported beam with
    I_y ≠ I_z shows the two INTERLEAVED bending families at exactly
    √(I_z/I_y) frequency ratio per mode pair."""
    n = 16
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1),
                      np.zeros(n + 1)], axis=1)
    el = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    # Axial + torsion only: lock every bending DOF.
    bend = np.concatenate([[6 * k + 1, 6 * k + 2, 6 * k + 4, 6 * k + 5]
                           for k in range(n + 1)])
    fixed = np.unique(np.concatenate([np.arange(6), bend]))
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(6 * (n + 1)), fixed,
                          shear_modulus=G)
    mo = space_frame_modal(p, n_modes=4)
    c_ax = np.sqrt(E / RHO)
    c_tor = np.sqrt(G / RHO)       # I_p = J: wave speed √(GJ/ρI_p)
    ks = np.arange(1, 5)
    exact = np.sort(np.concatenate([
        (2 * ks - 1) * c_ax / (4.0 * L),
        (2 * ks - 1) * c_tor / (4.0 * L)]))[:4]
    assert np.all(mo.frequencies_hz >= exact * (1.0 - 1e-9))
    np.testing.assert_allclose(mo.frequencies_hz, exact, rtol=6e-3)

    # Simply supported, both planes free: interleaved families.
    fixed_ss = np.array([0, 1, 2, 3,              # pin + torsion at 0
                         6 * n + 1, 6 * n + 2])   # v, w at the far end
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(6 * (n + 1)), fixed_ss,
                          shear_modulus=G)
    mo = space_frame_modal(p, n_modes=4)
    fy = (np.pi / L) ** 2 * np.sqrt(E * IY / (RHO * A)) / (2 * np.pi)
    fz = (np.pi / L) ** 2 * np.sqrt(E * IZ / (RHO * A)) / (2 * np.pi)
    np.testing.assert_allclose(mo.frequencies_hz[:2],
                               sorted([fy, fz]), rtol=1e-3)
    np.testing.assert_allclose(mo.frequencies_hz[1]
                               / mo.frequencies_hz[0],
                               np.sqrt(IZ / IY), rtol=1e-6)


def test_transient_matches_modal_superposition():
    """Undamped Newmark step response vs the EXACT modal superposition
    u(t) = Σ φ (φᵀf/ω²m)(1 − cos ωt) on the full consistent-mass
    pencil (the 2D frame family's cross-check in 3D)."""
    n = 4
    p = cantilever(n, loads=tip_load(n, 2, -1.0))
    k, m = space_frame_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    import scipy.linalg

    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    om = np.sqrt(lam)
    f = p.loads[free]
    dt = 2.0 * np.pi / om[-1] / 40.0
    n_steps = 400
    tr = solve_space_frame_transient(p, dt, n_steps,
                                     probe_dofs=[6 * n + 2])
    t = tr.times
    q = (vec.T @ f) / lam
    u_exact = np.zeros_like(t)
    tip_row = np.flatnonzero(free == 6 * n + 2)[0]
    for j in range(lam.size):
        u_exact += vec[tip_row, j] * q[j] * (1.0 - np.cos(om[j] * t))
    scale = np.max(np.abs(u_exact))
    np.testing.assert_allclose(tr.displacements[:, 0], u_exact,
                               atol=2e-3 * scale)


def test_harmonic_matches_all_modes_superposition():
    """Direct complex sweep vs Σ φφᵀf/(m_j(ω_j²−ω²+iω(α+βω_j²))) —
    exact for proportional damping."""
    n = 3
    p = cantilever(n, loads=tip_load(n, 1, 1.0))
    alpha, beta = 0.05, 0.002
    k, m = space_frame_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    import scipy.linalg

    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    omj = np.sqrt(lam)
    f = p.loads[free]
    om = np.linspace(0.1, 2.0 * omj[2], 40)
    hr = space_frame_harmonic(p, om, damping=(alpha, beta),
                              probe_dofs=[6 * n + 1])
    tip_row = np.flatnonzero(free == 6 * n + 1)[0]
    x_exact = np.zeros(om.size, dtype=complex)
    for j in range(lam.size):
        denom = omj[j] ** 2 - om ** 2 \
            + 1j * om * (alpha + beta * omj[j] ** 2)
        x_exact += vec[tip_row, j] * (vec[:, j] @ f) / denom
    np.testing.assert_allclose(hr.real[:, 0], x_exact.real, atol=1e-8)
    np.testing.assert_allclose(hr.imag[:, 0], x_exact.imag, atol=1e-8)
    # Static limit: the ω→0 end approaches the static solve.
    st = solve_space_frame_static(p)
    hr0 = space_frame_harmonic(p, [1e-6], probe_dofs=[6 * n + 1])
    np.testing.assert_allclose(hr0.amplitude[0, 0],
                               np.abs(st.displacements[6 * n + 1]),
                               rtol=1e-8)


def test_validation_errors():
    nodes = np.array([[0.0, 0.0, 0.0], [L, 0.0, 0.0]])
    el = np.array([[0, 1]])
    with pytest.raises(ValueError, match="shear_modulus"):
        SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(12), np.arange(6))
    with pytest.raises(ValueError, match="12 entries|entries"):
        SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(6), np.arange(6), poisson=0.3)
    with pytest.raises(ValueError, match="zero-length"):
        SpaceFrameProblem(np.zeros((2, 3)), el, E, A, IY, IZ, J, RHO,
                          np.zeros(12), np.arange(6), poisson=0.3)
    with pytest.raises(ValueError, match="parallel"):
        solve_space_frame_static(SpaceFrameProblem(
            nodes, el, E, A, IY, IZ, J, RHO, np.zeros(12),
            np.arange(6), poisson=0.3,
            ref_vector=np.array([[1.0, 0.0, 0.0]])))
    # poisson route: G = E/2(1+ν).
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(12), np.arange(6), poisson=0.25)
    np.testing.assert_allclose(p.shear_modulus, E / 2.5)


def test_vertical_member_and_point_masses():
    """The vertical-member auxiliary-vector fallback assembles a
    working column, and tip point masses shift the modal pencil like
    an SDOF: ω² ≈ 3EI/L³ / m_tip for a heavy tip mass."""
    n = 4
    nodes = np.stack([np.zeros(n + 1), np.zeros(n + 1),
                      np.linspace(0.0, L, n + 1)], axis=1)
    el = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(6 * (n + 1))
    loads[6 * n + 0] = 1.0                      # horizontal tip load
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO, loads,
                          np.arange(6), shear_modulus=G)
    st = solve_space_frame_static(p)
    # The column bends about ONE of its principal axes; global X is a
    # principal direction by the vertical-member convention.
    ei = E * np.array([IY, IZ])
    assert np.any(np.isclose(st.displacements[6 * n + 0],
                             L ** 3 / (3.0 * ei), rtol=1e-12))
    pm = np.zeros(n + 1)
    pm[-1] = 1000.0
    p_m = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                            np.zeros(6 * (n + 1)), np.arange(6),
                            shear_modulus=G, point_masses=pm)
    mo = space_frame_modal(p_m, n_modes=1)
    f_sdof = np.sqrt(3.0 * E * min(IY, IZ) / L ** 3 / 1000.0) \
        / (2.0 * np.pi)
    np.testing.assert_allclose(mo.frequencies_hz[0], f_sdof, rtol=2e-3)


def test_frame3d_json_document_all_kinds():
    """io/frame3d_io.py: the self-describing space-frame document
    through parse + all four analysis types, with the grillage
    closed form as the static gate."""
    from pinn_fem_tpu.io.frame3d_io import (is_frame3d_document,
                                            run_frame3d_document)

    l1, l2, p_ = 3.0, 2.0, 1.0
    doc = {
        "element_type": "frame3d",
        "nodes": [[0.0, 0.0, 0.0], [l1, 0.0, 0.0], [l1, l2, 0.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": E, "shear_modulus": G, "area": A,
                     "inertia_y": IY, "inertia_z": IZ, "torsion": J,
                     "density": RHO},
        "loads": [0.0] * 14 + [-p_, 0.0, 0.0, 0.0],
        "fixed_nodes": [0],
        "analysis": {"type": "static"},
    }
    assert is_frame3d_document(doc)
    out = run_frame3d_document(doc)
    assert out["success"] and out["element_type"] == "frame3d"
    exact = -(p_ * l1 ** 3 / (3.0 * E * IY)
              + p_ * l2 ** 3 / (3.0 * E * IY)
              + p_ * l2 ** 2 * l1 / (G * J))
    np.testing.assert_allclose(out["displacements"][14], exact,
                               rtol=1e-12)
    np.testing.assert_allclose(abs(out["torques"][0]), p_ * l2,
                               rtol=1e-12)
    assert len(out["member_end_forces"]) == 2

    out_m = run_frame3d_document({**doc, "analysis":
                                  {"type": "modal", "n_modes": 3}})
    f = np.asarray(out_m["frequencies_hz"])
    assert f.shape == (3,) and np.all(f > 0) \
        and np.all(np.diff(f) >= -1e-9)
    assert np.asarray(out_m["mode_shapes"]).shape == (3, 18)

    out_t = run_frame3d_document({**doc, "analysis": {
        "type": "transient", "dt": 0.5, "n_steps": 150,
        "probe_nodes": [2], "amplitude": {"type": "step"}}})
    d = np.asarray(out_t["displacements"])
    assert d.shape == (150, 6) and np.isfinite(d).all()
    # Undamped step response oscillates about the static solution
    # (the window covers ~3 fundamental periods; the exact Newmark
    # cross-check is test_transient_matches_modal_superposition).
    assert abs(np.mean(d[:, 2]) - exact) < 0.25 * abs(exact)
    assert np.min(d[:, 2]) > 2.2 * exact          # < 2x overshoot

    out_h = run_frame3d_document({**doc, "analysis": {
        "type": "harmonic",
        "omegas": {"start": 1e-6, "stop": 0.5, "num": 5},
        "probe_dofs": [14]}})
    amp = np.asarray(out_h["amplitude"])
    assert amp.shape == (5, 1)
    np.testing.assert_allclose(amp[0, 0], abs(exact), rtol=1e-6)

    with pytest.raises(ValueError, match="inertia_y"):
        run_frame3d_document({**doc, "material":
                              {"young": E, "area": A}})
    with pytest.raises(ValueError, match="analysis type"):
        run_frame3d_document({**doc, "analysis": {"type": "nope"}})
    with pytest.raises(ValueError, match="fixed_nodes"):
        bad = {k: v for k, v in doc.items() if k != "fixed_nodes"}
        run_frame3d_document(bad)


def test_frame3d_ref_vectors_json_and_point_masses():
    """ref_vectors rows [elem, ax, ay, az] override the default
    orientation per element; point-mass tables accumulate."""
    from pinn_fem_tpu.io.frame3d_io import parse_frame3d_document

    doc = {
        "element_type": "frame3d",
        "nodes": [[0.0, 0.0, 0.0], [L, 0.0, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "poisson": 0.25, "area": A,
                     "inertia_y": IY, "inertia_z": IZ, "torsion": J,
                     "density": RHO},
        "fixed_nodes": [0],
        "point_masses": [[1, 2.0], [1, 3.0]],
        "ref_vectors": [[0, 0.0, 1.0, 0.0]],
    }
    p, analysis = parse_frame3d_document(doc)
    assert analysis["type"] == "static"
    np.testing.assert_allclose(p.point_masses, [0.0, 5.0])
    np.testing.assert_allclose(p.ref_vector, [[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(p.shear_modulus, E / 2.5)


def test_buckling_weak_axis_euler_and_exact_plane_ratio():
    """Clamped-free column under axial tip compression: the first
    factor converges onto Euler π²EI_weak/4L² from above, the column
    buckles about the WEAK axis (I_y < I_z), and the second factor is
    the strong-axis twin at EXACTLY I_z/I_y — the two flexural
    families share the same discrete matrices scaled by EI."""
    from pinn_fem_tpu.models.frame3d import space_frame_buckling

    n = 8
    p = cantilever(n, loads=tip_load(n, 0, -1.0))
    res = space_frame_buckling(p, n_modes=2)
    euler = np.pi ** 2 * E * IY / (4.0 * L ** 2)
    assert res.load_factors[0] >= euler * (1.0 - 1e-9)
    np.testing.assert_allclose(res.load_factors[0], euler, rtol=1e-3)
    np.testing.assert_allclose(res.load_factors[1]
                               / res.load_factors[0], IZ / IY,
                               rtol=1e-9)
    np.testing.assert_allclose(res.axial, -1.0, rtol=1e-12)
    # The first mode bends in the weak plane (w), not the strong (v).
    mode = res.modes[0]
    assert np.abs(mode[2::6]).max() > 10.0 * np.abs(mode[1::6]).max()


def test_spectrum_sdof_anchor_and_json_kinds():
    """Space-frame SDOF (one free DOF — the guided tip w of a single
    element, the continuum-spectrum family convention): the spectrum
    peak lands on Sa·m/k exactly with mass_fraction 1; the random
    block hits the white-noise variance πS₀f²/(2kαm); and the JSON
    reduction kind round-trips with a statics-exact CB pencil."""
    from pinn_fem_tpu.io.frame3d_io import run_frame3d_document
    from pinn_fem_tpu.models.frame3d import space_frame_matrices

    i = 8                                 # tip w of a one-element beam
    fixed = np.setdiff1d(np.arange(12), [i])
    loads = np.zeros(12)
    loads[i] = 0.3                        # the random block's pattern
    p = SpaceFrameProblem(
        np.array([[0.0, 0.0, 0.0], [L, 0.0, 0.0]]),
        np.array([[0, 1]]), E, A, IY, IZ, J, RHO, loads, fixed,
        shear_modulus=G)
    k, m = space_frame_matrices(p)
    ki, mi = k[i, i], m[i, i]

    doc = {
        "element_type": "frame3d",
        "nodes": [[0.0, 0.0, 0.0], [L, 0.0, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "shear_modulus": G, "area": A,
                     "inertia_y": IY, "inertia_z": IZ, "torsion": J,
                     "density": RHO},
        "loads": loads.tolist(),
        "fixed_dofs": fixed.tolist(),
        "analysis": {"type": "spectrum", "sa": 2.5,
                     "direction": [0.0, 0.0, 1.0], "n_modes": 3},
    }
    out = run_frame3d_document(doc)
    assert out["success"] and out["element_type"] == "frame3d"
    np.testing.assert_allclose(out["mass_fraction"], 1.0, rtol=1e-12)
    np.testing.assert_allclose(out["max_displacement"],
                               2.5 * mi / ki, rtol=1e-9)
    # governing member stress: the guided-tip shear's axial component
    # is zero, so |N|/A = 0 — pinned as the axial-only convention.
    np.testing.assert_allclose(out["max_von_mises"], 0.0, atol=1e-12)

    wn = np.sqrt(ki / mi)
    alpha = 0.4 * wn
    out_r = run_frame3d_document({**doc, "analysis": {
        "type": "random",
        "omegas": {"start": 1e-3 * wn, "stop": 8.0 * wn, "num": 6000},
        "psd": 0.7, "damping": [alpha, 0.0],
        "probe_dofs": [i]}})
    assert out_r["success"] and out_r["analysis"] == "random"
    exact = loads[i] ** 2 * np.pi * 0.7 / (2.0 * ki * alpha * mi)
    np.testing.assert_allclose(np.asarray(out_r["rms"])[0] ** 2,
                               exact, rtol=2e-2)

    # Reduction on a real multi-DOF tower: CB with the tip master +
    # fixed-interface modes nails f1.
    n = 4
    doc_g = {
        "element_type": "frame3d",
        "nodes": [[L * kk / n, 0.0, 0.0] for kk in range(n + 1)],
        "elements": [[kk, kk + 1] for kk in range(n)],
        "material": {"young": E, "shear_modulus": G, "area": A,
                     "inertia_y": IY, "inertia_z": IZ, "torsion": J,
                     "density": RHO},
        "fixed_nodes": [0],
        "analysis": {"type": "reduction", "method": "craig_bampton",
                     "master_nodes": [n], "n_modes": 4},
    }
    out_g = run_frame3d_document(doc_g)
    assert out_g["success"] and out_g["analysis"] == "reduction"
    assert out_g["n_reduced_dofs"] == 10          # 6 masters + 4 modes
    assert out_g["frequency_rel_errors"][0] < 1e-3


def test_banded_static_and_modal_match_dense():
    """Banded DIA device tier vs the dense host authority on a
    50-element vertical tower (the vertical-member orientation
    convention in the traced builder too): tip lateral load + tip
    torque, displacements to f32-PCG accuracy; banded modal (HRZ
    lumped) vs the dense eigh of the SAME lumped discrete pencil."""
    import scipy.linalg

    from pinn_fem_tpu.models.frame3d import (
        solve_space_frame_static_banded, space_frame_lumped_mass_diag,
        space_frame_modal_banded)

    n = 50
    h = 20.0
    nodes = np.stack([np.zeros(n + 1), np.zeros(n + 1),
                      np.linspace(0.0, h, n + 1)], axis=1)
    el = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(6 * (n + 1))
    loads[6 * n + 0] = 1.0          # lateral tip load
    loads[6 * n + 5] = 0.3          # tip moment about z (= torsion)
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO, loads,
                          np.arange(6), shear_modulus=G)
    dense = solve_space_frame_static(p)
    res, iters, rel = solve_space_frame_static_banded(p, tol=1e-8)
    assert iters > 0 and rel < 1e-6
    scale = np.max(np.abs(dense.displacements))
    # f32 accuracy floor is eps32·κ(K) (CLAUDE.md): the 50-element
    # bending tower's condition number puts the banded-vs-dense gap
    # at a few 1e-3 relative (measured 3.6e-3) even at rel=1e-8
    # recurrence residual.
    np.testing.assert_allclose(res.displacements,
                               dense.displacements,
                               atol=6e-3 * scale)
    np.testing.assert_allclose(res.torque, dense.torque, atol=1e-3)

    # Banded modal vs dense eigh on the SAME lumped pencil.
    k, _ = space_frame_matrices(p, with_mass=False)
    m_diag = space_frame_lumped_mass_diag(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    lam_ref = scipy.linalg.eigh(
        k[np.ix_(free, free)], np.diag(m_diag[free]),
        eigvals_only=True)[:3]
    mo = space_frame_modal_banded(p, n_modes=3, n_iter=40)
    # The banded eigen-pencil accuracy floor is eps32·κ(K_ff)
    # (solvers/buckling.py, CLAUDE.md): the tower's λ₁/λ_max ≈ 2e-7
    # puts the f32 fundamental at ~2% (measured 1.8%); the higher
    # modes sit well inside.
    np.testing.assert_allclose(mo.eigenvalues, lam_ref, rtol=3e-2)
    np.testing.assert_allclose(mo.eigenvalues[1:], lam_ref[1:],
                               rtol=3e-3)


def test_banded_json_tier():
    """Above DENSE_DOF_LIMIT the frame3d JSON static/modal dispatch
    rides the banded device tier with probe + summary payloads."""
    from pinn_fem_tpu.io.frame3d_io import run_frame3d_analysis
    from pinn_fem_tpu.solvers import newton

    n = 12
    nodes = np.stack([np.zeros(n + 1), np.zeros(n + 1),
                      np.linspace(0.0, 6.0, n + 1)], axis=1)
    el = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(6 * (n + 1))
    loads[6 * n + 1] = -1.0
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO, loads,
                          np.arange(6), shear_modulus=G)
    dense = solve_space_frame_static(p)
    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 16
        out = run_frame3d_analysis(p, {"type": "static",
                                       "tolerance": 1e-8,
                                       "probe_nodes": [n]})
        outm = run_frame3d_analysis(p, {"type": "modal", "n_modes": 2,
                                        "probe_nodes": [n]})
    finally:
        newton.DENSE_DOF_LIMIT = orig
    assert out["tier"] == "banded" and out["success"]
    np.testing.assert_allclose(out["displacements"][1],
                               dense.displacements[6 * n + 1],
                               rtol=1e-3)
    assert "member_end_forces" not in out        # summary payload
    assert outm["tier"] == "banded" and outm["mass"] == "lumped"
    assert len(outm["frequencies_hz"]) == 2
    assert np.asarray(outm["mode_shapes"]).shape == (2, 6)


def test_member_loads_both_planes_and_orientation():
    """Uniform distributed loads: the Hermite exact-at-nodes property
    gives wL⁴/8EI cantilever tips in EACH bending plane with one
    element, the root moment carries the wL²/2 fixed-end correction,
    and a beam along global Y maps the global load into its local
    plane through the orientation triad."""
    w = 2.0
    p = cantilever(1, member_loads=np.array([[0.0, -w, 0.0]]))
    st = solve_space_frame_static(p)
    np.testing.assert_allclose(st.displacements[7],
                               -w * L ** 4 / (8.0 * E * IZ),
                               rtol=1e-13)
    np.testing.assert_allclose(np.abs(st.moments_z[0, 0]),
                               w * L ** 2 / 2.0, rtol=1e-12)

    p = cantilever(1, member_loads=np.array([[0.0, 0.0, -w]]))
    st = solve_space_frame_static(p)
    np.testing.assert_allclose(st.displacements[8],
                               -w * L ** 4 / (8.0 * E * IY),
                               rtol=1e-13)
    np.testing.assert_allclose(np.abs(st.moments_y[0, 0]),
                               w * L ** 2 / 2.0, rtol=1e-12)

    # Beam along global Y, global -Z line load: local x–z plane (I_y).
    nodes = np.array([[0.0, 0.0, 0.0], [0.0, L, 0.0]])
    p = SpaceFrameProblem(nodes, np.array([[0, 1]]), E, A, IY, IZ, J,
                          RHO, np.zeros(12), np.arange(6),
                          shear_modulus=G,
                          member_loads=np.array([[0.0, 0.0, -w]]))
    st = solve_space_frame_static(p)
    np.testing.assert_allclose(st.displacements[8],
                               -w * L ** 4 / (8.0 * E * IY),
                               rtol=1e-13)


def test_thermal_restraint_closed_forms_and_free_bow():
    """The thermoelastic contract in 3D: clamped-clamped uniform ΔT
    gives u ≡ 0 and N = −EAαΔT exactly; each through-depth gradient
    gives u ≡ 0 and |M| = EIακ in ITS plane; a free cantilever bows
    stress-free to v = κL²/2."""
    alpha, dt_, gy, gz = 1.2e-5, 40.0, 3.0, 5.0
    nodes = np.array([[0.0, 0.0, 0.0], [L, 0.0, 0.0]])
    el = np.array([[0, 1]])
    both = np.arange(12)                    # clamp both ends

    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(12), both, shear_modulus=G,
                          alpha_cte=alpha, temperature=dt_)
    st = solve_space_frame_static(p)
    assert np.abs(st.displacements).max() < 1e-14
    np.testing.assert_allclose(st.axial, -E * A * alpha * dt_,
                               rtol=1e-12)

    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(12), both, shear_modulus=G,
                          alpha_cte=alpha, temperature_gradient_y=gy)
    st = solve_space_frame_static(p)
    assert np.abs(st.displacements).max() < 1e-14
    np.testing.assert_allclose(np.abs(st.moments_z),
                               E * IZ * alpha * gy, rtol=1e-12)
    assert np.abs(st.moments_y).max() < 1e-12

    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(12), both, shear_modulus=G,
                          alpha_cte=alpha, temperature_gradient_z=gz)
    st = solve_space_frame_static(p)
    assert np.abs(st.displacements).max() < 1e-14
    np.testing.assert_allclose(np.abs(st.moments_y),
                               E * IY * alpha * gz, rtol=1e-12)
    assert np.abs(st.moments_z).max() < 1e-12

    # Free cantilever bow: stress-free curvature κ = α·g_y in x–y.
    p = cantilever(1, alpha_cte=alpha, temperature_gradient_y=gy)
    st = solve_space_frame_static(p)
    kappa = alpha * gy
    np.testing.assert_allclose(np.abs(st.displacements[7]),
                               kappa * L ** 2 / 2.0, rtol=1e-12)
    np.testing.assert_allclose(np.abs(st.displacements[11]),
                               kappa * L, rtol=1e-12)
    assert np.abs(st.member_end_forces).max() < 1e-10

    # Dynamics refuse the (static) thermal load case.
    with pytest.raises(ValueError, match="thermal"):
        solve_space_frame_transient(p, 0.01, 5)
    with pytest.raises(ValueError, match="thermal"):
        space_frame_harmonic(p, [1.0])
    # ...and a thermal case without alpha refuses at construction.
    with pytest.raises(ValueError, match="alpha"):
        SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(12), both, shear_modulus=G,
                          temperature=dt_)


def test_heated_column_thermal_buckling():
    """Clamped-clamped heated column: restraint compression EAαΔT
    drives weak-axis Euler buckling — the critical ΔT satisfies
    λ·EAαΔT = 4π²EI_y/L², the vibration-buckling link of the thermal
    family carried to 3D."""
    from pinn_fem_tpu.models.frame3d import space_frame_buckling

    alpha, dt_ = 1.2e-5, 40.0
    n = 8
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1),
                      np.zeros(n + 1)], axis=1)
    el = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    fixed = np.concatenate([np.arange(6),
                            6 * n + np.arange(6)])
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(6 * (n + 1)), fixed,
                          shear_modulus=G, alpha_cte=alpha,
                          temperature=dt_)
    res = space_frame_buckling(p, n_modes=1)
    np.testing.assert_allclose(res.axial, -E * A * alpha * dt_,
                               rtol=1e-12)
    lam_exact = (4.0 * np.pi ** 2 * E * IY / L ** 2) \
        / (E * A * alpha * dt_)
    np.testing.assert_allclose(res.load_factors[0], lam_exact,
                               rtol=5e-3)


def test_member_loads_and_thermal_json_and_banded():
    """member_loads/temperature through the JSON document, and the
    banded tier carries both (fixed-end corrections included) —
    pinned against the dense authority."""
    from pinn_fem_tpu.io.frame3d_io import run_frame3d_document
    from pinn_fem_tpu.models.frame3d import \
        solve_space_frame_static_banded

    doc = {
        "element_type": "frame3d",
        "nodes": [[0.0, 0.0, 0.0], [L, 0.0, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "shear_modulus": G, "area": A,
                     "inertia_y": IY, "inertia_z": IZ, "torsion": J,
                     "density": RHO, "alpha": 1.2e-5},
        "fixed_nodes": [0],
        "member_loads": [[0, 0.0, -2.0, 0.0]],
        "temperature": 40.0,
        "analysis": {"type": "static"},
    }
    out = run_frame3d_document(doc)
    assert out["success"]
    np.testing.assert_allclose(out["displacements"][7],
                               -2.0 * L ** 4 / (8.0 * E * IZ),
                               rtol=1e-12)
    # Free thermal expansion superposes: tip u_x = αΔT·L, stress-free
    # axially.
    np.testing.assert_allclose(out["displacements"][6],
                               1.2e-5 * 40.0 * L, rtol=1e-12)
    np.testing.assert_allclose(out["axial_forces"], 0.0, atol=1e-10)

    # Banded tier == dense with the same member + thermal loads.
    n = 6
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1),
                      np.zeros(n + 1)], axis=1)
    el = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    p = SpaceFrameProblem(nodes, el, E, A, IY, IZ, J, RHO,
                          np.zeros(6 * (n + 1)), np.arange(6),
                          shear_modulus=G,
                          member_loads=np.array([[0.0, -2.0, 0.0]]
                                                * n),
                          alpha_cte=1.2e-5, temperature=40.0)
    dense = solve_space_frame_static(p)
    res, _, rel = solve_space_frame_static_banded(p, tol=1e-9)
    scale = np.abs(dense.displacements).max()
    np.testing.assert_allclose(res.displacements,
                               dense.displacements,
                               atol=1e-4 * scale)
    np.testing.assert_allclose(res.member_end_forces,
                               dense.member_end_forces,
                               atol=1e-3 * np.abs(
                                   dense.member_end_forces).max())
