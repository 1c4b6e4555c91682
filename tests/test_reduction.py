"""Guyan reduction (solvers/reduction.py).

Static EXACTNESS: for loads at master DOFs (and, via T^T f, anywhere),
the condensed solve reproduces the full solve identically.  Dynamic
approximation: the first reduced frequency approaches the full one."""

import numpy as np

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
