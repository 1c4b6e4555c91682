"""Fused driver on 1D problems (the parity suite covers the 2D corpus)."""

import numpy as np

from pinn_fem_tpu import Material, SolverConfig, TrussProblem
from pinn_fem_tpu.solvers.driver import solve
from pinn_fem_tpu.solvers.fused import solve_fused


def bar_1d():
    return TrussProblem(
        nodes=np.array([0.0, 1.0, 2.0, 3.0]),
        elements=np.array([[0, 1], [1, 2], [2, 3]]),
        material=Material(young=2.0, area=1.0, density=0.0),
        loads=np.array([0.0, 0.0, 0.0, 1.0]),
        fixed_dofs=np.array([0]),
        dimension=1,
    )


def test_fused_nr_1d_matches_host():
    host = solve(bar_1d(), SolverConfig(method="nr"), verbose=False)
    fused = solve_fused(bar_1d(), SolverConfig(method="nr"))
    np.testing.assert_allclose(fused.displacements, host.displacements,
                               atol=1e-6)
    assert fused.converged
    # Analytic: u_i = F * x_i / (E A) = x_i / 2.
    np.testing.assert_allclose(
        fused.displacements.reshape(-1), [0, 0.5, 1.0, 1.5], atol=1e-5
    )


def test_fused_gd_1d():
    cfg = SolverConfig(method="gd", max_iterations=4000, learning_rate_u=0.02,
                       alpha_data=0.0, tolerance=1e-6)
    fused = solve_fused(bar_1d(), cfg)
    assert fused.converged
    np.testing.assert_allclose(
        fused.displacements.reshape(-1), [0, 0.5, 1.0, 1.5], atol=5e-3
    )
