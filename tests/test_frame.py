"""2D Euler-Bernoulli frame family: models/frame.py + io/frame_io.py.

Every anchor is a textbook closed form: the cubic Hermite element is
EXACT for nodal loads (machine-precision cantilever with one element),
consistent-mass frequencies converge from above onto (βL)² formulas,
and linearized buckling converges onto Euler's π²EI/(KL)².
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.frame import (FrameProblem, frame_buckling,
                                       frame_matrices, frame_modal,
                                       solve_frame_static)

E, A, I, RHO = 200.0, 1.0, 0.05, 1.2
L = 4.0


def cantilever(n, tip_load=(-1.0, "v")):
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    mag, which = tip_load
    loads[3 * n + {"u": 0, "v": 1, "m": 2}[which]] = mag
    return FrameProblem(nodes, elements, E, A, I, RHO, loads,
                        np.array([0, 1, 2]))


def test_cantilever_exact_with_one_element():
    """Cubic Hermite + nodal load: PL³/3EI, PL²/2EI, root moment PL —
    all to machine precision with a SINGLE element."""
    P = 1.0
    st = solve_frame_static(cantilever(1, (-P, "v")))
    np.testing.assert_allclose(st.displacements[4],
                               -P * L ** 3 / (3 * E * I), rtol=1e-14)
    np.testing.assert_allclose(st.displacements[5],
                               -P * L ** 2 / (2 * E * I), rtol=1e-14)
    np.testing.assert_allclose(st.moments[0, 0], P * L, rtol=1e-12)
    # Reactions balance the load exactly.
    np.testing.assert_allclose(st.reactions[1], P, rtol=1e-12)
    np.testing.assert_allclose(st.reactions[2], P * L, rtol=1e-12)
    # End moment at the tip is zero (free end).
    np.testing.assert_allclose(st.moments[0, 1], 0.0, atol=1e-12)


def test_cantilever_axial_and_end_moment_cases():
    """Axial tip load: u = PL/EA (beam = bar axially); tip moment:
    θ = ML/EI, v = ML²/2EI."""
    st = solve_frame_static(cantilever(3, (2.0, "u")))
    np.testing.assert_allclose(st.displacements[3 * 3],
                               2.0 * L / (E * A), rtol=1e-12)
    np.testing.assert_allclose(st.axial, 2.0, rtol=1e-12)
    st2 = solve_frame_static(cantilever(2, (0.5, "m")))
    np.testing.assert_allclose(st2.displacements[3 * 2 + 2],
                               0.5 * L / (E * I), rtol=1e-12)
    np.testing.assert_allclose(st2.displacements[3 * 2 + 1],
                               0.5 * L ** 2 / (2 * E * I), rtol=1e-12)


def test_simply_supported_midspan():
    """Pinned-pinned beam, midspan point load: v = PL³/48EI (exact —
    nodal load again)."""
    n = 4
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    loads[3 * 2 + 1] = -1.0
    # Pins: translations fixed, rotations free; plus axial symmetry.
    p = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                     np.array([0, 1, 3 * n + 1]))
    st = solve_frame_static(p)
    np.testing.assert_allclose(st.displacements[3 * 2 + 1],
                               -L ** 3 / (48 * E * I), rtol=1e-12)
    # Midspan moment PL/4 appears at the loaded node's element end.
    np.testing.assert_allclose(abs(st.moments[1, 1]), L / 4.0,
                               rtol=1e-10)


def test_cantilever_frequencies_converge_from_above():
    """Consistent mass: f_i -> (β_i L)²√(EI/ρA)/(2πL²) from ABOVE
    (Rayleigh quotient overestimates), 1e-4 at 8 elements for the
    first two bending modes."""
    beta_l = np.array([1.8751040687, 4.6940911330])
    f_exact = beta_l ** 2 * np.sqrt(E * I / (RHO * A)) \
        / (2.0 * np.pi * L ** 2)
    md = frame_modal(cantilever(8), n_modes=4)
    # The first two BENDING modes (the axial mode sits far above).
    f_bend = md.frequencies_hz[:2]
    np.testing.assert_allclose(f_bend, f_exact, rtol=1e-4)
    assert np.all(f_bend >= f_exact * (1.0 - 1e-12))
    # Refinement monotonicity: 4 -> 8 elements tightens f1 downward.
    f4 = frame_modal(cantilever(4), n_modes=1).frequencies_hz[0]
    assert f4 >= f_bend[0] >= f_exact[0]


def test_point_masses_lower_frequencies():
    p = cantilever(4)
    f0 = frame_modal(p, n_modes=1).frequencies_hz[0]
    p_m = FrameProblem(p.nodes, p.elements, E, A, I, RHO, p.loads,
                       p.fixed_dofs,
                       point_masses=np.array([0, 0, 0, 0, 5.0]))
    f1 = frame_modal(p_m, n_modes=1).frequencies_hz[0]
    assert f1 < 0.7 * f0


def column(n, fixed, load_node=None):
    nodes = np.stack([np.zeros(n + 1), np.linspace(0.0, L, n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    loads[3 * (load_node if load_node is not None else n) + 1] = -1.0
    return FrameProblem(nodes, elements, E, A, I, RHO, loads,
                        np.asarray(fixed, dtype=int))


def test_euler_buckling_clamped_free_and_pinned():
    """λ_cr -> π²EI/(KL)²: clamped-free K = 2 and pinned-pinned K = 1,
    both within 1e-4 at 8 elements (linearized K_g converges from
    below... the discretization converges from ABOVE on λ)."""
    bk = frame_buckling(column(8, [0, 1, 2]), n_modes=1)
    p_cf = np.pi ** 2 * E * I / (2.0 * L) ** 2
    np.testing.assert_allclose(bk.load_factors[0], p_cf, rtol=1e-4)
    # Pinned-pinned: translations fixed both ends, rotations free.
    n = 8
    bk2 = frame_buckling(column(n, [0, 1, 3 * n], ), n_modes=1)
    p_pp = np.pi ** 2 * E * I / L ** 2
    np.testing.assert_allclose(bk2.load_factors[0], p_pp, rtol=1e-4)
    # The member axial force under the unit pattern is −1 (compression).
    np.testing.assert_allclose(bk.axial, -1.0, rtol=1e-10)


def test_portal_frame_sway_physics():
    """Portal frame under lateral load: sway displacement matches the
    textbook shear-frame bound ~H³/(24EI) within the frame-action
    band, both column bases carry moment, and the modal fundamental is
    the sway mode (translational, not rotational)."""
    H, W = 3.0, 4.0
    nodes = np.array([[0.0, 0.0], [0.0, H], [W, H], [W, 0.0]])
    elements = np.array([[0, 1], [1, 2], [2, 3]])
    loads = np.zeros(12)
    loads[3 * 1] = 1.0                  # lateral at the top-left joint
    p = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                     np.array([0, 1, 2, 9, 10, 11]))
    st = solve_frame_static(p)
    sway = st.displacements[3]
    # Fixed-base portal: the sway sits between the rigid-beam
    # shear-frame limit H³/(24EI)·(1/2 columns... per-column H³/12EI,
    # two columns sharing -> H³/24EI) and the beamless pair of
    # cantilevers H³/(2·3EI) = H³/6EI.
    lo = H ** 3 / (24.0 * E * I) * 0.9
    hi = H ** 3 / (6.0 * E * I)
    assert lo < sway < hi
    # Both columns bend: base moments nonzero and of the same sign
    # pattern for sway.
    assert abs(st.moments[0, 0]) > 1e-3
    assert abs(st.moments[2, 1]) > 1e-3
    # The top joints differ by exactly the beam's AXIAL shortening
    # N_beam·W/(EA) — frame elements carry axial force too.
    n_beam = st.axial[1]
    np.testing.assert_allclose(
        st.displacements[3] - st.displacements[6],
        -n_beam * W / (E * A), rtol=1e-6)
    md = frame_modal(p, n_modes=1)
    shape = md.mode_shapes[0]
    assert abs(shape[3]) > 5.0 * abs(shape[4])     # x-sway dominates


def test_frame_matrices_symmetric_and_consistent():
    p = cantilever(3)
    k, m = frame_matrices(p)
    np.testing.assert_allclose(k, k.T, atol=1e-9)
    np.testing.assert_allclose(m, m.T, atol=1e-12)
    # Total translational mass: each direction sums to rho A L_total.
    total = RHO * A * L
    ones_x = np.zeros(p.ndof)
    ones_x[0::3] = 1.0
    np.testing.assert_allclose(ones_x @ m @ ones_x, total, rtol=1e-12)
    ones_y = np.zeros(p.ndof)
    ones_y[1::3] = 1.0
    np.testing.assert_allclose(ones_y @ m @ ones_y, total, rtol=1e-12)
    # Rigid-body translation produces zero stiffness force.
    np.testing.assert_allclose(k @ ones_x, 0.0, atol=1e-9)


def test_frame_validation():
    nodes = np.array([[0.0, 0.0], [1.0, 0.0]])
    el = np.array([[0, 1]])
    with pytest.raises(ValueError, match="loads"):
        FrameProblem(nodes, el, 1.0, 1.0, 1.0, 1.0,
                     np.zeros(4), np.array([0]))
    with pytest.raises(ValueError, match="zero-length"):
        FrameProblem(np.array([[0.0, 0.0], [0.0, 0.0]]), el,
                     1.0, 1.0, 1.0, 1.0, np.zeros(6), np.array([0]))
    with pytest.raises(ValueError, match="fixed_dofs"):
        FrameProblem(nodes, el, 1.0, 1.0, 1.0, 1.0,
                     np.zeros(6), np.array([7]))


def test_frame_json_document():
    """io/frame_io.py: the self-describing frame document through
    parse + all three analysis types."""
    from pinn_fem_tpu.io.frame_io import (is_frame_document,
                                          run_frame_document)

    doc = {
        "element_type": "frame",
        "nodes": [[0.0, 0.0], [0.0, 3.0], [4.0, 3.0], [4.0, 0.0]],
        "elements": [[0, 1], [1, 2], [2, 3]],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": RHO},
        "loads": [0, 0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0],
        "fixed_nodes": [0, 3],
        "analysis": {"type": "static"},
    }
    assert is_frame_document(doc)
    out = run_frame_document(doc)
    assert out["success"] and out["element_type"] == "frame"
    assert len(out["displacements"]) == 12
    assert len(out["member_end_forces"]) == 3
    out_m = run_frame_document({**doc, "analysis": {"type": "modal",
                                                    "n_modes": 3}})
    assert len(out_m["frequencies_hz"]) == 3
    assert np.all(np.diff(out_m["frequencies_hz"]) >= -1e-9)
    # Buckling needs a compressive pattern: push down on the beam.
    doc_b = dict(doc)
    doc_b["loads"] = [0, 0, 0, 0, -1.0, 0, 0, -1.0, 0, 0, 0, 0]
    out_b = run_frame_document({**doc_b,
                                "analysis": {"type": "buckling"}})
    assert out_b["load_factors"][0] > 0
    with pytest.raises(ValueError, match="inertia"):
        run_frame_document({**doc, "material": {"young": E,
                                                "area": A}})
    with pytest.raises(ValueError, match="static"):
        run_frame_document({**doc, "analysis": {"type": "nope"}})
    # point_masses table form parses and lowers f1.
    out_pm = run_frame_document({**doc,
                                 "point_masses": [[1, 10.0], [2, 10.0]],
                                 "analysis": {"type": "modal",
                                              "n_modes": 1}})
    assert out_pm["frequencies_hz"][0] < out_m["frequencies_hz"][0]


def test_uniform_member_load_exact():
    """Uniform distributed load through the consistent (fixed-end)
    vector: the Hermite exact-at-nodes property makes the ONE-element
    cantilever hit wL^4/8EI, root moment wL^2/2, root shear wL and a
    ZERO tip moment to machine precision; the clamped-clamped beam
    recovers the textbook wL^2/12 fixed-end moments."""
    w = 0.3
    p = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                     np.array([[0, 1]]), E, A, I, RHO, np.zeros(6),
                     np.array([0, 1, 2]),
                     member_loads=np.array([[0.0, -w]]))
    st = solve_frame_static(p)
    np.testing.assert_allclose(st.displacements[4],
                               -w * L ** 4 / (8 * E * I), rtol=1e-12)
    np.testing.assert_allclose(st.moments[0, 0], w * L ** 2 / 2.0,
                               rtol=1e-12)
    np.testing.assert_allclose(st.reactions[1], w * L, rtol=1e-12)
    np.testing.assert_allclose(st.moments[0, 1], 0.0, atol=1e-12)
    # Clamped-clamped: both ends fixed -> fixed-end moments wL^2/12.
    p2 = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                      np.array([[0, 1]]), E, A, I, RHO, np.zeros(6),
                      np.arange(6),
                      member_loads=np.array([[0.0, -w]]))
    st2 = solve_frame_static(p2)
    np.testing.assert_allclose(np.abs(st2.moments[0]),
                               w * L ** 2 / 12.0, rtol=1e-12)
    # An INCLINED member under gravity decomposes into local axial +
    # transverse: total vertical reaction still equals w * L_member.
    nodes = np.array([[0.0, 0.0], [3.0, 4.0]])    # length 5
    p3 = FrameProblem(nodes, np.array([[0, 1]]), E, A, I, RHO,
                      np.zeros(6), np.array([0, 1, 2, 3, 4, 5]),
                      member_loads=np.array([[0.0, -w]]))
    st3 = solve_frame_static(p3)
    np.testing.assert_allclose(st3.reactions[1] + st3.reactions[4],
                               w * 5.0, rtol=1e-12)


def test_member_loads_json():
    from pinn_fem_tpu.io.frame_io import run_frame_document

    w = 0.3
    doc = {
        "element_type": "frame",
        "nodes": [[0.0, 0.0], [L, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": RHO},
        "loads": [0.0] * 6,
        "fixed_nodes": [0],
        "member_loads": [[0, 0.0, -w]],
        "analysis": {"type": "static"},
    }
    out = run_frame_document(doc)
    np.testing.assert_allclose(out["displacements"][4],
                               -w * L ** 4 / (8 * E * I), rtol=1e-12)
    with pytest.raises(ValueError, match="member_loads"):
        run_frame_document({**doc, "member_loads": [[0.0]]})


def test_frame_transient_matches_modal_superposition():
    """Newmark (average acceleration) vs EXACT modal superposition of
    the undamped tip step response: 0.5% at dt = T1/400, and halving
    dt shrinks the error (2nd-order accuracy)."""
    n = 4
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    loads[3 * n + 1] = -1.0
    p = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                     np.array([0, 1, 2]))
    from pinn_fem_tpu.models.frame import solve_frame_transient

    md = frame_modal(p, n_modes=8)
    k, m = frame_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    tip = 3 * n + 1
    t1 = 1.0 / md.frequencies_hz[0]

    def run(dt_frac):
        dt = t1 / dt_frac
        n_steps = int(2 * t1 / dt)
        tr = solve_frame_transient(p, dt, n_steps, probe_dofs=[tip])
        u_modal = np.zeros_like(tr.times)
        for j in range(len(md.omegas)):
            phi = md.mode_shapes[j][free]
            mj = phi @ m[np.ix_(free, free)] @ phi
            qj = phi @ loads[free]
            wj = md.omegas[j]
            u_modal += md.mode_shapes[j][tip] * (qj / (mj * wj ** 2)) \
                * (1.0 - np.cos(wj * tr.times))
        return np.max(np.abs(tr.displacements[:, 0] - u_modal)) \
            / np.max(np.abs(u_modal))

    e400 = run(400)
    assert e400 < 5e-3
    assert run(800) < 0.5 * e400          # 2nd-order convergence


def test_frame_transient_json_and_validation():
    from pinn_fem_tpu.io.frame_io import run_frame_document

    doc = {
        "element_type": "frame",
        "nodes": [[0.0, 0.0], [L, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": RHO},
        "loads": [0, 0, 0, 0, -1.0, 0],
        "fixed_nodes": [0],
        "analysis": {"type": "transient", "dt": 0.1, "n_steps": 1000,
                     "damping": [0.5, 0.0], "probe_nodes": [1],
                     "record_every": 10},
    }
    out = run_frame_document(doc)
    d = np.asarray(out["displacements"])
    assert d.shape == (100, 2) and np.isfinite(d).all()
    # Heavily damped step response (zeta ~ 0.36) settles onto the
    # static deflection within ~11 fundamental periods.
    from pinn_fem_tpu.models.frame import solve_frame_static

    st = solve_frame_static(FrameProblem(
        np.asarray(doc["nodes"], dtype=float),
        np.asarray(doc["elements"], dtype=int), E, A, I, RHO,
        np.asarray(doc["loads"], dtype=float), np.array([0, 1, 2])))
    np.testing.assert_allclose(d[-1, 1], st.displacements[4],
                               rtol=0.02)
    with pytest.raises(ValueError, match="dt"):
        run_frame_document({**doc, "analysis": {"type": "transient"}})


def test_traced_frame_mirrors_host():
    """frame_static_response (traced f32) against solve_frame_static
    (host f64 authority), u / moments / axial 1:1 at f32 precision."""
    import jax

    from pinn_fem_tpu.models.frame import frame_static_response

    n = 6
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    loads[3 * n + 1] = -1.0
    p = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                     np.array([0, 1, 2]),
                     member_loads=np.tile([[0.0, -0.1]], (n, 1)))
    st = solve_frame_static(p)
    u, mom, ax = (np.asarray(v) for v in
                  jax.device_get(frame_static_response(p)))
    scale = np.max(np.abs(st.displacements))
    np.testing.assert_allclose(u, st.displacements, atol=5e-4 * scale)
    np.testing.assert_allclose(mom, st.moments, atol=1e-3)
    np.testing.assert_allclose(ax, st.axial, atol=1e-3)


def test_identify_frame_inertia_profile():
    """The flagship inverse on a BENDING structure: a tapered I(x)
    profile recovered per element from measured static displacements
    and rotations through the traced solve (E fixed — bending
    determines only the EI product, the frame counterpart of the truss
    EA degeneracy)."""
    from pinn_fem_tpu.models.frame import identify_frame_properties

    n = 6
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    loads[3 * n + 1] = -1.0
    i_true = I * (1.0 + 0.5 * np.linspace(0.0, 1.0, n))
    p_true = FrameProblem(nodes, elements, E, A, i_true, RHO, loads,
                          np.array([0, 1, 2]))
    u_true = solve_frame_static(p_true).displacements
    p0 = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                      np.array([0, 1, 2]))
    vdofs = [3 * k + 1 for k in range(1, n + 1)] \
        + [3 * k + 2 for k in range(1, n + 1)]
    vals, hist = identify_frame_properties(
        p0, vdofs, u_true[vdofs], param="inertia", n_iter=2000,
        learning_rate=0.03)
    np.testing.assert_allclose(vals, i_true, rtol=0.01)
    assert hist[-1] < 1e-4 * hist[0]
    with pytest.raises(ValueError, match="param"):
        identify_frame_properties(p0, vdofs, u_true[vdofs],
                                  param="area")


def test_frame_harmonic_matches_modal_superposition():
    """Direct complex sweep vs the ALL-modes superposition (exact for
    proportional damping): 1e-8, resonance peaks at the modal
    frequencies, and ω -> 0 recovers the static deflection."""
    from pinn_fem_tpu.models.frame import frame_harmonic

    n = 4
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    loads[3 * n + 1] = -1.0
    p = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                     np.array([0, 1, 2]))
    md = frame_modal(p, n_modes=3 * n)       # ALL free modes
    k, m = frame_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    tip = 3 * n + 1
    alpha, beta = 0.2, 1e-3
    om = np.linspace(0.05 * md.omegas[0], 3.0 * md.omegas[1], 160)
    hr = frame_harmonic(p, om, damping=(alpha, beta),
                        probe_dofs=[tip])
    x_modal = np.zeros(om.size, dtype=complex)
    for j in range(len(md.omegas)):
        phi = md.mode_shapes[j][free]
        mj = phi @ m[np.ix_(free, free)] @ phi
        qj = phi @ loads[free]
        wj2 = md.omegas[j] ** 2
        x_modal += md.mode_shapes[j][tip] * qj / (
            mj * (wj2 - om ** 2 + 1j * om * (alpha + beta * wj2)))
    np.testing.assert_allclose(hr.real[:, 0], x_modal.real, rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(hr.imag[:, 0], x_modal.imag, rtol=1e-8,
                               atol=1e-12)
    # omega -> 0 limit: the static deflection.
    st = solve_frame_static(p)
    hr0 = frame_harmonic(p, [1e-6], probe_dofs=[tip])
    np.testing.assert_allclose(hr0.amplitude[0, 0],
                               abs(st.displacements[tip]), rtol=1e-8)
    # A resonance peak near f1.
    peak_om = om[np.argmax(hr.amplitude[:, 0])]
    np.testing.assert_allclose(peak_om, md.omegas[0], rtol=0.05)


def test_optimize_frame_inertia_closed_form_and_slsqp():
    """Minimum-weight inertia sizing on the traced twin: (a) one
    design variable has the closed form I* = PL^3/(3E v_lim) — hit to
    1e-12 (the constraint binds and is monotone); (b) the 4-element
    profile ties scipy SLSQP with exact constraints on both the design
    AND the weight, with the tip exactly on the limit."""
    import scipy.optimize

    from pinn_fem_tpu.models.frame import optimize_frame_inertia

    P, v_lim = 1.0, 1.0
    p1 = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                      np.array([[0, 1]]), E, A, I, RHO,
                      np.array([0, 0, 0, 0, -P, 0.0]),
                      np.array([0, 1, 2]))
    i_e, w, hist = optimize_frame_inertia(p1, v_lim, [4],
                                          n_iter=200, outer_rounds=3)
    np.testing.assert_allclose(i_e[0], P * L ** 3 / (3 * E * v_lim),
                               rtol=1e-12)

    n = 4
    nodes = np.stack([np.linspace(0.0, L, n + 1), np.zeros(n + 1)],
                     axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(3 * (n + 1))
    loads[3 * n + 1] = -P
    p = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                     np.array([0, 1, 2]))
    lengths = np.full(n, L / n)

    def tip(ii):
        st = solve_frame_static(FrameProblem(
            nodes, elements, E, A, ii, RHO, loads,
            np.array([0, 1, 2])))
        return abs(st.displacements[3 * n + 1])

    sol = scipy.optimize.minimize(
        lambda x: float(np.sum(np.sqrt(x) * lengths)),
        np.full(n, I), method="SLSQP", bounds=[(1e-8, None)] * n,
        constraints=[{"type": "ineq",
                      "fun": lambda x: 1.0 - tip(x) / v_lim}],
        options={"maxiter": 300, "ftol": 1e-12})
    assert sol.success
    i_e2, w2, _ = optimize_frame_inertia(p, v_lim, [3 * n + 1],
                                         n_iter=300, outer_rounds=4)
    np.testing.assert_allclose(i_e2, sol.x, rtol=1e-3)
    np.testing.assert_allclose(w2, float(sol.fun), rtol=1e-4)
    np.testing.assert_allclose(tip(i_e2), v_lim, rtol=1e-6)
    with pytest.raises(ValueError, match="displacement_limit"):
        optimize_frame_inertia(p, -1.0, [3 * n + 1])


def test_frame_reliability_exact_three_variable_anchor():
    """FORM on the frame twin: tip deflection v = PL^3/(3EI) makes
    ln v linear in lognormal (E, I, S), so beta is EXACT:
    (ln(limit/v0) + lam_E + lam_I - lam_S)/sqrt(z_E^2+z_I^2+z_S^2) —
    and 40000-sample crude MC through the same transform agrees."""
    import math

    from pinn_fem_tpu.models.frame import frame_reliability

    P = 1.0
    p = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                     np.array([[0, 1]]), E, A, I, RHO,
                     np.array([0, 0, 0, 0, -P, 0.0]),
                     np.array([0, 1, 2]))
    v0 = abs(solve_frame_static(p).displacements[4])
    limit = 2.0 * v0
    dE, dI, dS = 0.08, 0.15, 0.2

    def lz(d):
        return math.sqrt(math.log1p(d * d))

    zE, zI, zS = lz(dE), lz(dI), lz(dS)
    beta_exact = (math.log(limit / v0) - zE * zE / 2 - zI * zI / 2
                  + zS * zS / 2) / math.sqrt(zE ** 2 + zI ** 2
                                             + zS ** 2)
    res = frame_reliability(
        p,
        variables=[
            {"name": "E", "kind": "young",
             "distribution": "lognormal", "mean": E, "cov": dE},
            {"name": "I", "kind": "inertia",
             "distribution": "lognormal", "mean": I, "cov": dI},
            {"name": "S", "kind": "load_scale",
             "distribution": "lognormal", "mean": 1.0, "cov": dS}],
        limit_state={"type": "displacement", "limit": limit,
                     "probe_dofs": [4]},
        mc_samples=40000, mc_seed=17)
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-5)
    assert res.converged[0]
    band = 3.0 * res.mc_std_error
    assert abs(res.mc_pf - res.pf[0]) <= band + 0.1 * res.pf[0]
    # alpha: load pushes toward failure, stiffness variables away.
    assert res.alpha[0, 2] > 0 > res.alpha[0, 0]
    with pytest.raises(ValueError, match="limit_state type"):
        frame_reliability(p, [{"name": "S", "kind": "load_scale",
                               "distribution": "normal", "mean": 1.0,
                               "std": 0.2}],
                          {"type": "fatigue", "limit": 1.0})


def test_section_stress_recovery():
    """Extreme-fiber stress |N|/A + |M|/S: the cantilever root stress
    is PL/S exactly (pure bending) and an added axial load
    superimposes P_ax/A — both to machine precision."""
    P, S = 1.0, 0.25
    p = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                     np.array([[0, 1]]), E, A, I, RHO,
                     np.array([0, 0, 0, 0.5, -P, 0.0]),
                     np.array([0, 1, 2]), section_modulus=S)
    st = solve_frame_static(p)
    np.testing.assert_allclose(st.max_stress[0],
                               P * L / S + 0.5 / A, rtol=1e-12)
    with pytest.raises(ValueError, match="section_modulus"):
        FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                     np.array([[0, 1]]), E, A, I, RHO, np.zeros(6),
                     np.array([0, 1, 2]), section_modulus=-1.0)
    # JSON tier carries it through material.section_modulus.
    from pinn_fem_tpu.io.frame_io import run_frame_document

    out = run_frame_document({
        "element_type": "frame",
        "nodes": [[0.0, 0.0], [L, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": RHO, "section_modulus": S},
        "loads": [0, 0, 0, 0, -P, 0],
        "fixed_nodes": [0],
        "analysis": {"type": "static"}})
    np.testing.assert_allclose(out["max_stress"][0], P * L / S,
                               rtol=1e-12)


def test_frame_stress_limit_state_exact():
    """Frame stress reliability: the determinate cantilever's root
    stress is (PL/S)·scale EXACTLY (E and I drop out), so lognormal
    R vs load scale is the textbook log-linear beta — and crude MC
    through the same transform lands on the FORM pf to its noise."""
    import math

    from pinn_fem_tpu.models.frame import frame_reliability

    P, S = 1.2, 0.25
    p = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                     np.array([[0, 1]]), E, A, I, RHO,
                     np.array([0, 0, 0, 0, -P, 0.0]),
                     np.array([0, 1, 2]), section_modulus=S)
    sig0 = P * L / S
    muR, dR, dS = 1.6 * sig0, 0.1, 0.2
    zR = math.sqrt(math.log1p(dR * dR))
    zS = math.sqrt(math.log1p(dS * dS))
    beta_exact = (math.log(muR / sig0) - zR * zR / 2 + zS * zS / 2) \
        / math.hypot(zR, zS)
    res = frame_reliability(
        p,
        variables=[{"name": "Sc", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": dS},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal", "mean": muR,
                    "cov": dR}],
        limit_state={"type": "stress", "variable": "R"},
        mc_samples=40000, mc_seed=23)
    np.testing.assert_allclose(res.beta[0], beta_exact, rtol=1e-5)
    band = 3.0 * res.mc_std_error
    assert abs(res.mc_pf - res.pf[0]) <= band
    # Guard: stress limit state without a section modulus.
    p2 = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                      np.array([[0, 1]]), E, A, I, RHO,
                      np.array([0, 0, 0, 0, -P, 0.0]),
                      np.array([0, 1, 2]))
    with pytest.raises(ValueError, match="section_modulus"):
        frame_reliability(p2, [{"name": "Sc", "kind": "load_scale",
                                "distribution": "normal", "mean": 1.0,
                                "std": 0.2}],
                          {"type": "stress", "limit": 1.0})


def test_frame_reliability_review_regressions():
    """Three confirmed review bugs pinned: (a) a zero-demand member in
    the default all-members stress probe is beta = inf / pf = 0 (NOT
    beta = 0 / pf = 0.5 poisoning the system bounds); (b) member-load
    stress demand includes the fixed-end correction (the mean-point
    demand ties the host solve exactly); (c) out-of-range probes raise
    instead of silently clamping."""
    from pinn_fem_tpu.models.frame import frame_reliability

    S = 0.25
    # (a) mid-loaded two-element cantilever: outboard member unstressed.
    nodes = np.array([[0.0, 0.0], [L / 2, 0.0], [L, 0.0]])
    elements = np.array([[0, 1], [1, 2]])
    loads = np.zeros(9)
    loads[4] = -1.0
    p = FrameProblem(nodes, elements, E, A, I, RHO, loads,
                     np.array([0, 1, 2]), section_modulus=S)
    res = frame_reliability(
        p,
        variables=[{"name": "Sc", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.2},
                   {"name": "R", "kind": "resistance",
                    "distribution": "lognormal",
                    "mean": 1.6 * 1.0 * (L / 2) / S, "cov": 0.1}],
        limit_state={"type": "stress", "variable": "R"})
    assert np.isinf(res.beta[1]) and res.pf[1] == 0.0
    assert res.converged[1]
    assert res.system_pf_lower < 0.1          # not poisoned to 0.5
    assert np.isfinite(res.beta[0]) and 1.0 < res.beta[0] < 4.0

    # (b) member-loaded cantilever: the mean-point demand equals the
    # host recovery wL^2/2 / S (fixed-end correction included), so a
    # limit BELOW it must report failure at the mean (beta < 0).
    w = 1.0
    p2 = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                      np.array([[0, 1]]), E, A, I, RHO, np.zeros(6),
                      np.array([0, 1, 2]), section_modulus=1.0,
                      member_loads=np.array([[0.0, -w]]))
    sig0 = w * L ** 2 / 2.0
    res2 = frame_reliability(
        p2,
        variables=[{"name": "Sc", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.2}],
        limit_state={"type": "stress", "limit": 0.9 * sig0})
    assert res2.beta[0] < 0                  # mean point already fails
    res3 = frame_reliability(
        p2,
        variables=[{"name": "Sc", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.2}],
        limit_state={"type": "stress", "limit": 1.5 * sig0})
    # Exact log-linear anchor through the member-load demand.
    import math

    zS = math.sqrt(math.log1p(0.04))
    beta_exact = (math.log(1.5) + zS * zS / 2.0) / zS
    np.testing.assert_allclose(res3.beta[0], beta_exact, rtol=1e-5)

    # (c) range validation.
    with pytest.raises(ValueError, match="probe_dofs out of range"):
        frame_reliability(p2, [{"name": "Sc", "kind": "load_scale",
                                "distribution": "normal", "mean": 1.0,
                                "std": 0.2}],
                          {"type": "displacement", "limit": 1.0,
                           "probe_dofs": [99]})
    with pytest.raises(ValueError, match="elements out of range"):
        frame_reliability(p2, [{"name": "Sc", "kind": "load_scale",
                                "distribution": "normal", "mean": 1.0,
                                "std": 0.2}],
                          {"type": "stress", "limit": 1.0,
                           "elements": [5]})
    with pytest.raises(ValueError, match="density"):
        frame_reliability(p2, [{"name": "D", "kind": "density",
                                "distribution": "normal", "mean": 1.0,
                                "std": 0.1}],
                          {"type": "stress", "limit": 1.0})


def test_frame_reliability_and_sizing_json():
    """Frame reliability and sizing through the JSON document tier."""
    from pinn_fem_tpu.io.frame_io import run_frame_document

    P = 1.0
    base = {
        "element_type": "frame",
        "nodes": [[0.0, 0.0], [L, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": RHO},
        "loads": [0, 0, 0, 0, -P, 0],
        "fixed_nodes": [0],
    }
    v0 = P * L ** 3 / (3 * E * I)
    out = run_frame_document({**base, "analysis": {
        "type": "reliability",
        "variables": [
            {"name": "Sc", "kind": "load_scale",
             "distribution": "lognormal", "mean": 1.0, "cov": 0.2}],
        "limit_state": {"type": "displacement", "limit": 2.0 * v0,
                        "probe_dofs": [4]},
        "validate_mc": 2000}})
    assert out["success"] and out["element_type"] == "frame"
    import math

    zS = math.sqrt(math.log1p(0.04))
    beta_exact = (math.log(2.0) + zS * zS / 2.0) / zS
    np.testing.assert_allclose(out["beta"][0], beta_exact, rtol=1e-5)
    assert out["mc"]["n_samples"] == 2000
    import json

    json.dumps(out, allow_nan=False)

    out2 = run_frame_document({**base, "analysis": {
        "type": "sizing", "displacement_limit": v0 / 2.0,
        "probe_dofs": [4], "n_iter": 150, "outer_rounds": 3}})
    # Halving the allowed deflection doubles the required inertia
    # (single variable, v ~ 1/I exactly).
    np.testing.assert_allclose(out2["inertia"][0], 2.0 * I, rtol=1e-6)
    with pytest.raises(ValueError, match="displacement_limit"):
        run_frame_document({**base, "analysis": {"type": "sizing"}})


def test_frame_rbdo_closed_form():
    """RBDO on the frame twin: one design variable with lognormal
    (E, S) has ln v linear, so beta(I) is closed-form and the
    minimum-weight design sits exactly where beta(I*) = beta_t — the
    achieved beta (full HL-RF authority recompute) lands on the
    target."""
    import math

    from pinn_fem_tpu.models.frame import optimize_frame_inertia_rbdo

    P, v_lim, bt, dE, dS = 1.0, 1.0, 2.5, 0.1, 0.2
    p = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                     np.array([[0, 1]]), E, A, I, RHO,
                     np.array([0, 0, 0, 0, -P, 0.0]),
                     np.array([0, 1, 2]))

    def lz(d):
        return math.sqrt(math.log1p(d * d))

    zE, zS = lz(dE), lz(dS)
    lhs = bt * math.hypot(zE, zS) - math.log(v_lim) - math.log(E) \
        + zE * zE / 2 - zS * zS / 2
    i_true = math.exp(lhs) * P * L ** 3 / 3.0
    i_e, w, betas, hist = optimize_frame_inertia_rbdo(
        p, [{"name": "E", "kind": "young",
             "distribution": "lognormal", "mean": E, "cov": dE},
            {"name": "S", "kind": "load_scale",
             "distribution": "lognormal", "mean": 1.0, "cov": dS}],
        v_lim, [4], bt, n_iter=200, outer_rounds=3)
    np.testing.assert_allclose(i_e[0], i_true, rtol=1e-3)
    np.testing.assert_allclose(betas[0], bt, rtol=1e-3)
    # More reliability costs more stiffness than the deterministic
    # design at the same limit.
    det = P * L ** 3 / (3 * E * v_lim)
    assert i_e[0] > 1.5 * det
    with pytest.raises(ValueError, match="design vector"):
        optimize_frame_inertia_rbdo(
            p, [{"name": "I", "kind": "inertia",
                 "distribution": "lognormal", "mean": I, "cov": 0.1}],
            v_lim, [4], bt)


def test_frame_rbdo_json_and_infeasible_raise():
    """Review regressions: (a) the sizing JSON reliability sub-block
    routes to RBDO (silently downgrading it would ship an unmargined
    design as if beta held); (b) an axial deflection floor makes RBDO
    fail loudly like the deterministic sibling."""
    import math

    from pinn_fem_tpu.io.frame_io import run_frame_document
    from pinn_fem_tpu.models.frame import optimize_frame_inertia_rbdo

    P, v_lim, bt, dE, dS = 1.0, 1.0, 2.0, 0.1, 0.2
    doc = {
        "element_type": "frame",
        "nodes": [[0.0, 0.0], [L, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": RHO},
        "loads": [0, 0, 0, 0, -P, 0],
        "fixed_nodes": [0],
        "analysis": {"type": "sizing", "displacement_limit": v_lim,
                     "probe_dofs": [4], "n_iter": 150,
                     "outer_rounds": 3,
                     "reliability": {"variables": [
                         {"name": "E", "kind": "young",
                          "distribution": "lognormal", "mean": E,
                          "cov": dE},
                         {"name": "S", "kind": "load_scale",
                          "distribution": "lognormal", "mean": 1.0,
                          "cov": dS}],
                         "target_beta": bt}},
    }
    out = run_frame_document(doc)
    assert out["target_beta"] == bt
    np.testing.assert_allclose(out["min_reliability_beta"], bt,
                               rtol=2e-3)

    def lz(d):
        return math.sqrt(math.log1p(d * d))

    zE, zS = lz(dE), lz(dS)
    lhs = bt * math.hypot(zE, zS) - math.log(v_lim) - math.log(E) \
        + zE * zE / 2 - zS * zS / 2
    np.testing.assert_allclose(out["inertia"][0],
                               math.exp(lhs) * P * L ** 3 / 3.0,
                               rtol=2e-3)
    bad = {**doc, "analysis": {**doc["analysis"],
                               "reliability": {"target_beta": bt}}}
    with pytest.raises(ValueError, match="variables"):
        run_frame_document(bad)

    # (b) axial tip load: u = PL/EA regardless of I -> loud failure.
    p_ax = FrameProblem(np.array([[0.0, 0.0], [L, 0.0]]),
                        np.array([[0, 1]]), E, A, I, RHO,
                        np.array([0, 0, 0, 100.0, 0.0, 0.0]),
                        np.array([0, 1, 2]))
    with pytest.raises(ValueError, match="unreachable"):
        optimize_frame_inertia_rbdo(
            p_ax, [{"name": "S", "kind": "load_scale",
                    "distribution": "lognormal", "mean": 1.0,
                    "cov": 0.2}],
            0.5 * 100.0 * L / (E * A), [3], 2.0, n_iter=50,
            outer_rounds=2)


# --------------------------------------------------------------------
# Banded DEVICE tier (round-4 VERDICT #2)


def story_frame(n_stories, n_bays, h=3.0, w=5.0, young=200e9,
                area=0.01, inertia=1e-4, density=7850.0):
    """Regular story-grid frame (columns + beams), base clamped,
    triangular lateral load — the tall-building banded-tier demo."""
    from pinn_fem_tpu.models.frame import FrameProblem

    nx, ny = n_bays + 1, n_stories + 1
    nodes = np.array([[i * w, j * h] for j in range(ny)
                      for i in range(nx)])
    elems = []
    for j in range(ny - 1):
        for i in range(nx):
            elems.append([j * nx + i, (j + 1) * nx + i])
    for j in range(1, ny):
        for i in range(nx - 1):
            elems.append([j * nx + i, j * nx + i + 1])
    loads = np.zeros(3 * len(nodes))
    for j in range(1, ny):
        loads[3 * (j * nx)] = 1000.0 * j
    fixed = np.concatenate([[3 * i, 3 * i + 1, 3 * i + 2]
                            for i in range(nx)])
    return FrameProblem(nodes=nodes, elements=np.asarray(elems),
                        young=young, area=area, inertia=inertia,
                        density=density, loads=loads, fixed_dofs=fixed)


def test_frame_banded_static_matches_dense():
    """The DIA + PCG tier reproduces the dense solve (f32 CG against
    f64 LU: conditioning-amplified, so 1e-3 relative on u and member
    forces)."""
    from pinn_fem_tpu.models.frame import (solve_frame_static,
                                           solve_frame_static_banded)

    p = story_frame(8, 2)
    dense = solve_frame_static(p)
    banded, iters, rel = solve_frame_static_banded(p, tol=1e-8)
    assert rel < 1e-7 and iters > 0
    scale = np.abs(dense.displacements).max()
    np.testing.assert_allclose(banded.displacements / scale,
                               dense.displacements / scale, atol=1e-3)
    a_scale = np.abs(dense.axial).max()
    np.testing.assert_allclose(banded.axial / a_scale,
                               dense.axial / a_scale, atol=1e-3)
    # reactions balance the applied load
    np.testing.assert_allclose(-banded.reactions[0::3].sum(),
                               p.loads[0::3].sum(), rtol=1e-3)


def test_frame_banded_static_member_loads_and_stress():
    """Member loads + section modulus ride the banded tier: the
    banded member-force recovery carries the fixed-end correction."""
    from pinn_fem_tpu.models.frame import (FrameProblem,
                                           solve_frame_static,
                                           solve_frame_static_banded)

    p0 = story_frame(4, 2)
    p = FrameProblem(nodes=p0.nodes, elements=p0.elements,
                     young=p0.young, area=p0.area, inertia=p0.inertia,
                     density=p0.density, loads=p0.loads,
                     fixed_dofs=p0.fixed_dofs,
                     member_loads=[0.0, -500.0],
                     section_modulus=1e-3)
    dense = solve_frame_static(p)
    banded, _, _ = solve_frame_static_banded(p, tol=1e-8)
    s = np.abs(dense.max_stress).max()
    np.testing.assert_allclose(banded.max_stress / s,
                               dense.max_stress / s, atol=1e-3)


def test_frame_modal_banded_well_scaled():
    """On a well-scaled frame (||K||/lambda_1 moderate) the banded
    subspace iteration matches the dense eigensolve of the SAME
    lumped discrete problem to 1e-3."""
    import scipy.linalg

    from pinn_fem_tpu.models.frame import (frame_lumped_mass_diag,
                                           frame_matrices,
                                           frame_modal_banded)

    p = story_frame(6, 1, young=1000.0, area=1.0, inertia=0.1,
                    density=1.0)
    md = frame_lumped_mass_diag(p)
    k, _ = frame_matrices(p, with_mass=False)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    lam = scipy.linalg.eigh(k[np.ix_(free, free)],
                            np.diag(md[free]), eigvals_only=True)[:4]
    mb = frame_modal_banded(p, n_modes=4, n_iter=30, cg_tol=1e-8)
    np.testing.assert_allclose(mb.eigenvalues, lam, rtol=1e-3)
    # shapes satisfy the pencil within the f32 floor
    m_full = np.diag(md)
    for i in range(2):
        phi = mb.mode_shapes[i]
        r = k @ phi - mb.eigenvalues[i] * (m_full @ phi)
        assert np.linalg.norm(r[free]) / np.linalg.norm(
            k @ phi) < 1e-3


def test_frame_modal_banded_steel_floor():
    """Realistic steel scaling: the f32 banded pencil carries the
    documented eps32 * ||K||/lambda_1 accuracy floor (CLAUDE.md /
    solvers/buckling.py) — pin physics agreement at 5%, ordering, and
    positivity rather than chasing the floor."""
    import scipy.linalg

    from pinn_fem_tpu.models.frame import (frame_lumped_mass_diag,
                                           frame_matrices,
                                           frame_modal_banded)

    p = story_frame(8, 2)
    md = frame_lumped_mass_diag(p)
    k, _ = frame_matrices(p, with_mass=False)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    lam = scipy.linalg.eigh(k[np.ix_(free, free)],
                            np.diag(md[free]), eigvals_only=True)[:4]
    mb = frame_modal_banded(p, n_modes=4, n_iter=30, cg_tol=1e-8)
    assert np.all(mb.eigenvalues > 0)
    assert np.all(np.diff(mb.eigenvalues) > 0)
    np.testing.assert_allclose(mb.eigenvalues, lam, rtol=5e-2)


def test_frame_banded_json_tier():
    """Above DENSE_DOF_LIMIT the JSON tier routes statics + modal to
    the banded device path with probe/summary payloads."""
    import pinn_fem_tpu.solvers.newton as newton
    from pinn_fem_tpu.io.frame_io import run_frame_analysis
    from pinn_fem_tpu.models.frame import solve_frame_static

    p = story_frame(6, 2)
    dense = solve_frame_static(p)
    roof = p.nnode - 3
    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 16
        out = run_frame_analysis(p, {"type": "static",
                                     "tolerance": 1e-8,
                                     "probe_nodes": [roof]})
        outm = run_frame_analysis(p, {"type": "modal", "n_modes": 2,
                                      "probe_nodes": [roof]})
    finally:
        newton.DENSE_DOF_LIMIT = orig
    assert out["tier"] == "banded" and out["success"]
    np.testing.assert_allclose(out["displacements"][0],
                               dense.displacements[3 * roof],
                               rtol=1e-3)
    assert "member_end_forces" not in out        # summary payload
    assert outm["tier"] == "banded" and outm["mass"] == "lumped"
    assert len(outm["frequencies_hz"]) == 2
    assert np.asarray(outm["mode_shapes"]).shape == (2, 3)


def test_frame_identification_json_tier():
    """The bending inverse through the JSON tier (io/frame_io.py
    "identification"): a two-value E profile recovered from synthetic
    twin deflections, plus the contract's refusal paths."""
    import pytest

    from pinn_fem_tpu.io.frame_io import run_frame_document

    n = 4
    doc = {
        "element_type": "frame",
        "nodes": [[L * k / n, 0.0] for k in range(n + 1)],
        "elements": [[k, k + 1] for k in range(n)],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": RHO},
        "loads": [0.0] * (3 * n) + [0.0, -1.0, 0.0],
        "fixed_nodes": [0],
        "analysis": {
            "type": "identification",
            "parameter": "young",
            "synthetic": {"young": [150.0, 150.0, 250.0, 250.0]},
            "measured_dofs": [3 * k + d for k in range(1, n + 1)
                              for d in (1, 2)],
            "n_iter": 1500,
            "learning_rate": 0.03,
        },
    }
    out = run_frame_document(doc)
    assert out["success"] and out["element_type"] == "frame"
    assert out["parameter"] == "young" and out["synthetic"]
    np.testing.assert_allclose(out["young"],
                               [150.0, 150.0, 250.0, 250.0],
                               rtol=1e-2)
    assert out["max_rel_error"] < 1e-2
    assert len(out["centroids"]) == n
    hist = np.asarray(out["loss_history"])
    assert hist[-1] < 1e-6 * hist[0]

    bad = {**doc, "analysis": {**doc["analysis"], "parameter": "area"}}
    with pytest.raises(ValueError, match="parameter"):
        run_frame_document(bad)
    both = {**doc, "analysis": {**doc["analysis"],
                                "measured_u": [0.0] * 8}}
    with pytest.raises(ValueError, match="not both"):
        run_frame_document(both)
    neither = {**doc, "analysis": {"type": "identification"}}
    with pytest.raises(ValueError, match="measured_dofs"):
        run_frame_document(neither)
    wrong_key = {**doc, "analysis": {**doc["analysis"],
                                     "synthetic": {"inertia": 0.1}}}
    with pytest.raises(ValueError, match='"young"'):
        run_frame_document(wrong_key)
