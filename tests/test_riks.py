"""Arc-length continuation (solvers/riks.py) vs the exact von Mises
two-bar snap-through.

With the repo's Green-Lagrange kernel, the apex equilibrium of two bars
(+-a, 0)-(0, h) under a downward load lambda P (P = 1) is exactly

    lambda(w) = 2 E A g(w) / L0^3,  g(w) = h^2 w - 1.5 h w^2 + 0.5 w^3

(w = downward apex displacement).  Limit points at w = h (1 -+ 1/sqrt 3);
the path re-crosses lambda = 0 at w = 2h (the inverted stress-free
state).  Load control CANNOT pass the first fold; arc length must."""

import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.riks import solve_riks

A_HALF, H = 1.0, 1.0
EA = 1.0


def von_mises_truss():
    nodes = np.array([[-A_HALF, 0.0], [A_HALF, 0.0], [0.0, H]])
    elements = np.array([[0, 2], [1, 2]])
    loads = np.zeros(6)
    loads[5] = -1.0                      # downward at the apex
    return TrussProblem(
        nodes=nodes, elements=elements,
        material=Material(young=1.0, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array([0, 1, 2, 3, 4]), dimension=2)


def lam_exact(w):
    l0_3 = (A_HALF**2 + H**2) ** 1.5
    g = H * H * w - 1.5 * H * w * w + 0.5 * w**3
    return 2.0 * EA * g / l0_3


LAM_CRIT = lam_exact(H * (1.0 - 1.0 / np.sqrt(3.0)))


def test_snap_through_full_path():
    p = von_mises_truss()
    res = solve_riks(p, n_steps=400, initial_dlambda=0.01,
                     stop_fn=lambda u, lam: -u[5] > 2.3 * H)
    assert res.converged
    w = -res.displacements[:, 5]          # downward apex displacement
    lam = res.load_factors

    # 1) Every path point ON the analytic curve.
    np.testing.assert_allclose(lam, lam_exact(w), atol=2e-6)
    # 2) The path passes BOTH limit points to the far side.
    assert w.max() > 2.0 * H
    # 3) The pre-fold peak equals the closed-form limit load (compare on
    # the first branch; the post-snap branch rises beyond it).
    lam_fold = lam[w < H].max()
    np.testing.assert_allclose(lam_fold, LAM_CRIT, rtol=2e-3)
    # 4) Between the folds lambda is NEGATIVE, bottoming at -lam_crit
    # (g is odd about w = h), and the interpolated zero re-crossing sits
    # at w = 2h (the inverted stress-free state).
    np.testing.assert_allclose(lam.min(), -LAM_CRIT, rtol=2e-3)
    sel = w > 1.8 * H
    w0 = np.interp(0.0, lam[sel], w[sel])
    np.testing.assert_allclose(w0, 2.0 * H, atol=0.02)
    # 5) Equilibrium residuals tiny everywhere.
    assert res.residuals.max() < 1e-5


def test_load_control_cannot_pass_the_fold():
    """Contrast: geometric-nonlinear load-controlled NR beyond the limit
    load either fails or lands PAST the fold — never a converged point on
    the pre-fold branch (which does not exist there)."""
    from pinn_fem_tpu import SolverConfig, solve_nr

    p = von_mises_truss()
    try:
        r = solve_nr(p, SolverConfig(max_iterations=50, tolerance=1e-10),
                     target_load_factor=1.3 * LAM_CRIT,
                     geometric_nonlinear=True)
    except RuntimeError as e:
        assert "singular" in str(e)       # the tangent went through zero
        return
    w = -np.asarray(r.displacements).reshape(-1)[5]
    assert (not r.converged) or w > H


def test_adaptive_step_recovers():
    """A deliberately large first step forces corrector failures; the
    quarter-cut retry logic must still produce a converged on-curve
    path."""
    p = von_mises_truss()
    res = solve_riks(p, n_steps=80, initial_dlambda=0.2,
                     stop_fn=lambda u, lam: -u[5] > 2.3 * H)
    assert res.converged and len(res.load_factors) >= 3
    np.testing.assert_allclose(res.load_factors,
                               lam_exact(-res.displacements[:, 5]),
                               atol=5e-6)
