"""Guyan reduction (solvers/reduction.py).

Static EXACTNESS: for loads at master DOFs (and, via T^T f, anywhere),
the condensed solve reproduces the full solve identically.  Dynamic
approximation: the first reduced frequency approaches the full one."""

import numpy as np
import pytest

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve_nr
from pinn_fem_tpu.solvers.reduction import guyan_reduce, reduce_loads


def chain(n=9):
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(n)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=3.0, area=0.7, density=2.0),
                        loads, np.array([0]), 1)


def test_static_exactness_master_loads():
    p = chain()
    model = guyan_reduce(p, master_dofs=[4, 8])
    f_red = reduce_loads(model, p.loads)
    u_m = np.linalg.solve(model.k_red, f_red)
    u = model.expand(u_m, p.ndof)

    full = solve_nr(p, SolverConfig(max_iterations=10, tolerance=1e-12),
                    1.0)
    u_full = np.asarray(full.displacements).reshape(-1)
    np.testing.assert_allclose(u, u_full, rtol=1e-5, atol=1e-8)


def test_static_exactness_slave_loads():
    """T^T f carries slave loads consistently: master displacements stay
    exact even when the load acts at a CONDENSED DOF."""
    p = chain()
    loads = np.zeros(9)
    loads[3] = 1.0                       # slave DOF
    p2 = TrussProblem(p.nodes, p.elements, p.material, loads,
                      p.fixed_dofs, 1)
    model = guyan_reduce(p2, master_dofs=[4, 8])
    u_m = np.linalg.solve(model.k_red, reduce_loads(model, loads))
    full = solve_nr(p2, SolverConfig(max_iterations=10, tolerance=1e-12),
                    1.0)
    u_full = np.asarray(full.displacements).reshape(-1)
    np.testing.assert_allclose(u_m, u_full[[4, 8]], rtol=1e-5)


def test_guyan_frequency_upper_bound():
    """Guyan mass ignores slave inertia -> reduced frequencies bound the
    true ones from ABOVE and converge as masters are added."""
    from pinn_fem_tpu import modal_analysis

    p = chain()
    full = modal_analysis(p, n_modes=2)
    w_full = full.eigenvalues

    def reduced_lam(masters):
        m = guyan_reduce(p, master_dofs=masters)
        lo = np.linalg.cholesky(m.m_red)       # M_red is FULL (T^T M T)
        b = np.linalg.solve(lo, np.linalg.solve(lo, m.k_red.T).T)
        return np.sort(np.linalg.eigvalsh(0.5 * (b + b.T)))

    lam2 = reduced_lam([4, 8])
    lam4 = reduced_lam([2, 4, 6, 8])
    assert lam2[0] >= w_full[0] - 1e-9
    assert lam4[0] >= w_full[0] - 1e-9
    # Refinement improves the estimate.
    assert abs(lam4[0] - w_full[0]) <= abs(lam2[0] - w_full[0]) + 1e-12
    np.testing.assert_allclose(lam4[0], w_full[0], rtol=0.02)


def test_rejects_fixed_masters():
    import pytest

    p = chain()
    with pytest.raises(ValueError, match="free"):
        guyan_reduce(p, master_dofs=[0, 4])

def test_craig_bampton_beats_guyan():
    """Same masters: CB with 2 interface modes must reproduce the first
    TWO full frequencies far better than Guyan, with statics still
    exact."""
    from pinn_fem_tpu import modal_analysis
    from pinn_fem_tpu.solvers.reduction import craig_bampton

    p = chain()
    full = modal_analysis(p, n_modes=2).eigenvalues

    def lams(model, k=2):
        lo = np.linalg.cholesky(model.m_red)
        b = np.linalg.solve(lo, np.linalg.solve(lo, model.k_red.T).T)
        return np.sort(np.linalg.eigvalsh(0.5 * (b + b.T)))[:k]

    guyan = guyan_reduce(p, master_dofs=[8])
    cb = craig_bampton(p, master_dofs=[8], n_modes=2)
    err_g = abs(lams(guyan, 1)[0] - full[0]) / full[0]
    err_cb0, err_cb1 = np.abs(lams(cb, 2) - full) / full
    assert err_cb0 < 0.1 * err_g          # an order better on mode 1
    assert err_cb0 < 2e-3 and err_cb1 < 2e-2

    # Statics still exact: master load through the CB model.
    f_red = cb.t.T @ p.loads[cb.free_dofs]
    u_red = np.linalg.solve(cb.k_red, f_red)
    u = cb.expand(u_red, p.ndof)
    from pinn_fem_tpu import SolverConfig, solve_nr

    full_static = np.asarray(solve_nr(
        p, SolverConfig(max_iterations=10, tolerance=1e-12),
        1.0).displacements).reshape(-1)
    np.testing.assert_allclose(u, full_static, rtol=1e-4, atol=1e-8)


# ---------------------------------------------------------------------------
# Dense consistent-mass cores + family dispatch (plane/solid/frame):
# solvers/reduction.{guyan_reduce_dense, craig_bampton_dense,
# reduce_model} and the shared JSON runner.
# ---------------------------------------------------------------------------


def _plane_strip(nx=6, ny=2):
    from pinn_fem_tpu.models.plane import PlaneProblem, rect_mesh

    nodes, elems = rect_mesh(3.0, 1.0, nx, ny, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    fixed = np.concatenate([2 * left, 2 * left + 1])
    return PlaneProblem(nodes=nodes, elements=elems, young=200.0,
                        poisson=0.3, thickness=0.5, density=2.0,
                        loads=np.zeros(2 * nodes.shape[0]),
                        fixed_dofs=fixed)


def test_plane_guyan_statics_exact():
    """Guyan is EXACT for statics with master-applied loads: the
    reduced solve reproduces the full solve at the masters to
    machine precision — the defining property, on the consistent
    continuum matrices."""
    from pinn_fem_tpu.models.plane import plane_matrices
    from pinn_fem_tpu.solvers.reduction import (reduce_loads,
                                                reduce_model)

    p = _plane_strip()
    right = np.flatnonzero(p.nodes[:, 0] == 3.0)
    masters = np.concatenate([2 * right, 2 * right + 1])
    model = reduce_model(p, masters, method="guyan")
    loads = np.zeros(p.ndof)
    loads[masters] = np.linspace(1.0, 2.0, masters.size)
    u_m = np.linalg.solve(model.k_red, reduce_loads(model, loads))
    k, _ = plane_matrices(p)
    mask = p.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    u_full = np.linalg.solve(km, loads * mask) * mask
    np.testing.assert_allclose(u_m, u_full[masters], rtol=1e-10)
    # expand(): slaves recovered by static interpolation — exact too
    np.testing.assert_allclose(model.expand(u_m, p.ndof), u_full,
                               rtol=1e-9, atol=1e-13)


def test_plane_craig_bampton_converges_to_modal():
    """CB with a handful of fixed-interface modes nails the low
    consistent-mass frequencies where pure Guyan (same masters) is
    visibly off — the classic substructuring payoff."""
    import scipy.linalg

    from pinn_fem_tpu.models.plane import plane_modal
    from pinn_fem_tpu.solvers.reduction import reduce_model

    p = _plane_strip()
    right = np.flatnonzero(p.nodes[:, 0] == 3.0)
    masters = np.concatenate([2 * right, 2 * right + 1])

    def freqs(model):
        w2 = scipy.linalg.eigh(model.k_red, model.m_red,
                               eigvals_only=True)
        return np.sqrt(np.maximum(w2, 0.0))

    full = plane_modal(p, n_modes=3).omegas
    guyan = freqs(reduce_model(p, masters, method="guyan"))
    cb = freqs(reduce_model(p, masters, method="craig_bampton",
                            n_modes=8))
    rel_g = abs(guyan[0] - full[0]) / full[0]
    rel_cb = abs(cb[0] - full[0]) / full[0]
    assert rel_cb < 2e-5                       # CB nails it
    assert rel_cb < 0.2 * max(rel_g, 1e-12)    # and beats Guyan
    np.testing.assert_allclose(cb[:3], full, rtol=1e-3)
    # reduced frequencies bound the true ones from above (Rayleigh-Ritz)
    assert np.all(cb[:3] >= full * (1.0 - 1e-9))


def test_solid_and_frame_reduction_dispatch():
    """reduce_model dispatches the solid and frame families onto the
    dense cores; Guyan statics exactness holds for both."""
    from pinn_fem_tpu.models.frame import FrameProblem, frame_matrices
    from pinn_fem_tpu.models.solid import (SolidProblem, box_mesh,
                                           solid_matrices)
    from pinn_fem_tpu.solvers.reduction import (reduce_loads,
                                                reduce_model)

    nodes, elems = box_mesh(1.0, 1.0, 2.0, 1, 1, 2)
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    fixed = np.concatenate([3 * bot, 3 * bot + 1, 3 * bot + 2])
    sp = SolidProblem(nodes=nodes, elements=elems, young=200.0,
                      poisson=0.3, density=2.0,
                      loads=np.zeros(3 * nodes.shape[0]),
                      fixed_dofs=fixed)
    top = np.flatnonzero(np.abs(nodes[:, 2] - 2.0) < 1e-12)
    masters = 3 * top + 2
    model = reduce_model(sp, masters, method="guyan")
    loads = np.zeros(sp.ndof)
    loads[masters] = 1.0
    u_m = np.linalg.solve(model.k_red, reduce_loads(model, loads))
    k, _ = solid_matrices(sp)
    mask = sp.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    u_full = np.linalg.solve(km, loads * mask) * mask
    np.testing.assert_allclose(u_m, u_full[masters], rtol=1e-10)

    fr = FrameProblem(
        nodes=np.array([[0.0, float(i)] for i in range(5)]),
        elements=np.stack([np.arange(4), np.arange(1, 5)], 1),
        young=200.0, area=0.4, inertia=0.05, density=2.0,
        loads=np.zeros(15), fixed_dofs=np.array([0, 1, 2]))
    fm = reduce_model(fr, np.array([12, 13]), method="guyan")
    loads = np.zeros(15)
    loads[12] = 3.0
    u_m = np.linalg.solve(fm.k_red, reduce_loads(fm, loads))
    k, _ = frame_matrices(fr)
    mask = fr.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    u_full = np.linalg.solve(km, loads * mask) * mask
    np.testing.assert_allclose(u_m, u_full[[12, 13]], rtol=1e-10)

    with pytest.raises(ValueError, match="method"):
        reduce_model(sp, masters, method="serep")
    with pytest.raises(ValueError, match="duplicates"):
        reduce_model(sp, np.array([masters[0], masters[0]]))
    with pytest.raises(ValueError, match="free"):
        reduce_model(sp, np.array([int(fixed[0])]))


def test_json_reduction_plane_and_frame():
    from pinn_fem_tpu.io.frame_io import run_frame_document
    from pinn_fem_tpu.io.plane_io import run_plane_document

    doc = {
        "element_type": "plane",
        "mesh": {"type": "rect", "width": 3.0, "height": 1.0,
                 "nx": 6, "ny": 2, "element": "quad"},
        "material": {"young": 200.0, "poisson": 0.3, "thickness": 0.5,
                     "density": 2.0},
        "fixed_nodes": "left",
        "analysis": {"type": "reduction", "method": "craig_bampton",
                     "master_nodes": [6, 13, 20], "n_modes": 8,
                     "n_compare": 3},
    }
    out = run_plane_document(doc)
    assert out["success"] and out["analysis"] == "reduction"
    assert out["element_type"] == "plane"
    assert out["n_reduced_dofs"] == 14          # 6 masters + 8 modes
    assert max(out["frequency_rel_errors"]) < 1e-3
    assert "k_red" in out                       # small: matrices in

    fdoc = {
        "element_type": "frame",
        "nodes": [[0, 0], [0, 1], [0, 2], [0, 3]],
        "elements": [[0, 1], [1, 2], [2, 3]],
        "material": {"young": 200.0, "area": 0.4, "inertia": 0.05,
                     "density": 2.0},
        "loads": [0.0] * 12,
        "fixed_nodes": [0],
        "analysis": {"type": "reduction", "method": "guyan",
                     "master_nodes": [3], "n_compare": 2},
    }
    fout = run_frame_document(fdoc)
    assert fout["success"] and fout["n_reduced_dofs"] == 3
    assert np.all(np.isfinite(fout["reduced_frequencies_hz"]))


def test_plate_reduction_dispatch_and_json():
    """reduce_model dispatches the plate family (3-DOF [w, βx, βy]
    nodes) onto the dense cores: Guyan statics exactness on a SS
    plate, plus the JSON reduction block with master_nodes resolving
    to the free w/rotation DOFs."""
    from pinn_fem_tpu.io.plate_io import run_plate_document
    from pinn_fem_tpu.models.plate import (PlateProblem, plate_matrices,
                                           plate_supports)
    from pinn_fem_tpu.models.plane import rect_mesh
    from pinn_fem_tpu.solvers.reduction import reduce_loads, reduce_model

    nodes, elems = rect_mesh(1.0, 1.0, 4, 4, "quad")
    fixed = plate_supports(nodes, ["left", "right", "bottom", "top"],
                           "simply_supported")
    p = PlateProblem(nodes=nodes, elements=elems, young=200.0,
                     poisson=0.3, thickness=0.05, density=2.0,
                     loads=np.zeros(3 * nodes.shape[0]),
                     fixed_dofs=fixed)
    interior = [6, 7, 8, 11, 12, 13, 16, 17, 18]
    masters = 3 * np.asarray(interior)               # the w DOFs
    model = reduce_model(p, masters, method="guyan")
    loads = np.zeros(p.ndof)
    loads[masters] = np.linspace(1.0, 2.0, masters.size)
    u_m = np.linalg.solve(model.k_red, reduce_loads(model, loads))
    k, _ = plate_matrices(p)
    mask = p.free_mask()
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    u_full = np.linalg.solve(km, loads * mask) * mask
    np.testing.assert_allclose(u_m, u_full[masters], rtol=1e-10)

    doc = {
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 1.0, "height": 1.0,
                 "nx": 4, "ny": 4},
        "material": {"young": 200.0, "poisson": 0.3,
                     "thickness": 0.05, "density": 2.0},
        "supports": {"simply_supported": ["left", "right", "bottom",
                                          "top"]},
        "analysis": {"type": "reduction", "method": "craig_bampton",
                     "master_nodes": [12], "n_modes": 10,
                     "n_compare": 2},
    }
    out = run_plate_document(doc)
    assert out["success"] and out["analysis"] == "reduction"
    assert out["element_type"] == "plate"
    assert out["n_reduced_dofs"] == 13          # 3 master DOFs + 10
    assert max(out["frequency_rel_errors"]) < 1e-3
