"""Opt-in geometrically nonlinear (Green-Lagrange) solve path."""

import numpy as np
import pytest

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve_nr


def single_bar(load):
    """Horizontal bar stretched axially by an end load."""
    return TrussProblem(
        nodes=np.array([[0.0, 0.0], [1.0, 0.0]]),
        elements=np.array([[0, 1]]),
        material=Material(young=1.0, area=1.0, density=0.0),
        loads=np.array([0.0, 0.0, load, 0.0]),
        fixed_dofs=np.array([0, 1, 3]),
        dimension=2,
    )


def test_small_displacement_limit_matches_linear():
    p_lin = single_bar(1e-4)
    r_lin = solve_nr(p_lin, SolverConfig(), 1.0)
    p_gl = single_bar(1e-4)
    r_gl = solve_nr(p_gl, SolverConfig(), 1.0, geometric_nonlinear=True)
    assert r_gl.converged
    np.testing.assert_allclose(
        r_gl.displacements, r_lin.displacements, rtol=1e-3, atol=1e-9
    )


def test_large_stretch_satisfies_gl_equilibrium():
    """Axial bar, large stretch: GL equilibrium is
    EA/L0 * e_gl * (L0 + u) = F with e_gl = ((L0+u)^2 - L0^2) / (2 L0^2)."""
    f = 0.4
    p = single_bar(f)
    r = solve_nr(p, SolverConfig(max_iterations=100), 1.0,
                 geometric_nonlinear=True)
    assert r.converged
    u = float(r.displacements[1, 0])
    e_gl = ((1.0 + u) ** 2 - 1.0) / 2.0
    force = e_gl * (1.0 + u)  # EA = L0 = 1
    assert force == pytest.approx(f, rel=1e-3)
    # Nonlinear answer differs measurably from the linear one (u_lin = 0.4).
    assert abs(u - 0.4) > 0.02


def test_transverse_load_requires_geometric_stiffness():
    """A two-bar shallow 'string' loaded transversely has ZERO linear
    stiffness in the load direction (both bars horizontal); only the
    geometrically nonlinear kinematics can carry the load."""
    p = TrussProblem(
        nodes=np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]),
        elements=np.array([[0, 1], [1, 2]]),
        material=Material(young=1.0, area=1.0, density=0.0),
        loads=np.array([0, 0, 0.0, -0.01, 0, 0]),
        fixed_dofs=np.array([0, 1, 2, 4, 5]),  # only u_y of the mid node free
        dimension=2,
    )
    # The tangent at u = 0 is exactly singular in the transverse direction
    # (no linear stiffness); a small initial sag regularizes the first step.
    u_init = np.array([0, 0, 0.0, -0.05, 0, 0])
    r = solve_nr(p, SolverConfig(max_iterations=200), 1.0,
                 u_initial=u_init, geometric_nonlinear=True)
    assert r.converged
    v = float(r.displacements[1, 1])
    assert v < -1e-3  # sags downward
    # Equilibrium of the taut string: 2 * (EA/L0) * e_gl * |v| = F with
    # e_gl = v^2 / (2 L0^2): transverse force balance of the two bars.
    e_gl = v * v / 2.0
    force = 2.0 * e_gl * (-v)
    assert force == pytest.approx(0.01, rel=5e-2)


def test_nonlinear_requires_2d():
    p = TrussProblem(
        nodes=np.array([0.0, 1.0]),
        elements=np.array([[0, 1]]),
        material=Material(young=1.0, area=1.0, density=0.0),
        loads=np.array([0.0, 0.1]),
        fixed_dofs=np.array([0]),
        dimension=1,
    )
    with pytest.raises(ValueError, match="2D"):
        solve_nr(p, SolverConfig(), 1.0, geometric_nonlinear=True)
