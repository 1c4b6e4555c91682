"""Legacy solver APIs (solve_incremental_newton, solve_pinn_gradient_descent,
solve_pinn_newton_raphson), the Gauss-Newton/LM driver method, scalar
identification, and the api_* CLI contracts."""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

from pinn_fem_tpu import (
    LegacySolverConfig,
    Material,
    PINNGradientDescentConfig,
    PINNSolverConfig,
    SolverConfig,
    TrussProblem,
    make_mlp_field,
    solve_gauss_newton,
    solve_incremental_newton,
    solve_pinn_gradient_descent,
    solve_pinn_newton_raphson,
    to_field,
)
from pinn_fem_tpu.solvers.scalar_inverse import identify_scalars_gd, identify_scalars_gn


def chain_problem(material=None):
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    material = material or Material(young=1.0, area=1.0, density=1.0)
    return TrussProblem(
        nodes=nodes,
        elements=np.array([[0, 1], [1, 2], [2, 3]]),
        material=material,
        loads=np.array([0, 0, 0, 0, 0, 0, 1.0, 0]),
        fixed_dofs=np.array([0, 1, 3, 5, 7]),
        dimension=2,
    )


def nn_material(seed=0, width=8):
    return Material(
        young=make_mlp_field(jax.random.PRNGKey(seed), 1, width, input_dim=3,
                             scale=1.0),
        area=to_field(1.0),
        density=to_field(1.0),
    )


# ---------------------------------------------------------------------------
# solve_incremental_newton (core.py contract)
# ---------------------------------------------------------------------------


def test_incremental_newton_history_per_increment():
    result = solve_incremental_newton(chain_problem(), LegacySolverConfig())
    assert result.converged
    assert len(result.history) == 10  # one entry PER increment (core.py:51-60)
    assert set(result.history[0]) == {
        "increment", "load_factor", "iterations", "residual", "max_strain",
        "converged",
    }
    assert result.history[0]["load_factor"] == pytest.approx(0.1)
    assert result.history[-1]["load_factor"] == pytest.approx(1.0)
    np.testing.assert_allclose(result.displacements[:, 0], [0, 1, 2, 3], atol=2e-5)
    # Reactions vs FULL loads (core.py:63-65).
    assert result.reactions[0, 0] == pytest.approx(-1.0, abs=1e-5)


def test_incremental_newton_evaluates_frozen_nn():
    """The legacy path assembles with NN fields FROZEN (reference core.py
    never checks trainability; truss1d_nn_property.py relies on this)."""
    result = solve_incremental_newton(chain_problem(nn_material()))
    assert result.converged
    # Stiffer-than-unit material (softplus(~1) ~ 1.2-1.5) -> tip u below the
    # unit-stiffness value of 3.0.
    assert 1.5 < result.displacements[-1, 0] < 2.95


# ---------------------------------------------------------------------------
# Legacy PINN GD (nn_solver_gd.py contract)
# ---------------------------------------------------------------------------


def test_legacy_pinn_gd_contract():
    p = chain_problem(nn_material())
    result = solve_pinn_gradient_descent(
        p, f_ext=p.loads,
        measured_disp=np.array([1.0, 2.0, 3.0]),
        measured_dofs=np.array([2, 4, 6]),
        config=PINNGradientDescentConfig(
            max_iterations=3000, learning_rate_u=0.01, learning_rate_theta=1e-3,
        ),
    )
    assert set(result.history[0]) == {
        "iteration", "loss_total", "loss_physics", "loss_data", "u_norm",
    }
    assert len(result.history) >= 12  # iteration > 10 gate
    assert result.nn_parameters  # MLP weights exported
    np.testing.assert_allclose(result.displacements[1:, 0], [1, 2, 3], atol=5e-2)


def test_legacy_pinn_gd_requires_nn():
    p = chain_problem()
    with pytest.raises(ValueError, match="trainable"):
        solve_pinn_gradient_descent(p, p.loads)


# ---------------------------------------------------------------------------
# Gauss-Newton / LM (nn_solver.py contract)
# ---------------------------------------------------------------------------


def test_legacy_pinn_newton_raphson_converges_fast():
    p = chain_problem(nn_material(seed=3))
    result = solve_pinn_newton_raphson(
        p, f_ext=p.loads,
        measured_disp=np.array([1.0, 2.0, 3.0]),
        measured_dofs=np.array([2, 4, 6]),
        config=PINNSolverConfig(max_iterations=50, alpha_physics=0.1,
                                alpha_data=10.0),
    )
    assert set(result.history[0]) == {
        "iteration", "r_physics", "r_data", "r_total", "relative_error",
        "step_size",
    }
    # Second-order method: far fewer iterations than GD's hundreds.
    assert len(result.history) <= 50
    np.testing.assert_allclose(result.displacements[1:, 0], [1, 2, 3], atol=1e-2)


def test_gn_method_via_driver():
    from pinn_fem_tpu.solvers.driver import solve

    p = chain_problem(nn_material(seed=4))
    result = solve(
        p, SolverConfig(method="gn", max_iterations=60, alpha_physics=1.0,
                        alpha_data=100.0),
        measured_disp=np.array([1.0, 2.0, 3.0]),
        measured_dofs=np.array([2, 4, 6]),
        verbose=False,
    )
    np.testing.assert_allclose(result.displacements[1:, 0], [1, 2, 3], atol=1e-2)


def test_gn_scalar_material_is_plain_newton():
    p = chain_problem()
    result = solve_gauss_newton(p, SolverConfig(max_iterations=50),
                                target_load_factor=1.0, alpha_physics=1.0,
                                alpha_data=0.0)
    assert result.converged
    np.testing.assert_allclose(result.displacements[:, 0], [0, 1, 2, 3], atol=1e-4)


# ---------------------------------------------------------------------------
# Scalar (E, A) identification
# ---------------------------------------------------------------------------


def _si_problem(young, area):
    mat = Material(young=to_field(young), area=to_field(area), density=to_field(0.0))
    return TrussProblem(
        nodes=np.array([[0.0, 0.0], [1.0, 0.0]]),
        elements=np.array([[0, 1]]),
        material=mat,
        loads=np.array([0.0, 0.0, 1e6, 0.0]),
        fixed_dofs=np.array([0, 1, 3]),
        dimension=2,
    )


def test_identify_scalars_gn_si_units():
    """Recover E*A = F*L/u_meas = 2e9 from a 5e-4 m measurement, starting
    at 1e9 — real SI magnitudes."""
    p = _si_problem(100e9, 0.01)
    out = identify_scalars_gn(
        p, p.loads, u_measured=np.array([5e-4]), measured_dofs=np.array([2]),
        young_init=100e9, area_init=0.01, max_iterations=60, tolerance=1e-10,
    )
    assert out["young_final"] * out["area_final"] == pytest.approx(2e9, rel=1e-4)
    assert out["history"][0].keys() == {"iteration", "residual", "young", "area"}


def test_identify_scalars_gd_si_units():
    p = _si_problem(100e9, 0.01)
    out = identify_scalars_gd(
        p, p.loads, u_measured=np.array([5e-4]), measured_dofs=np.array([2]),
        young_init=100e9, area_init=0.01, n_iterations=2000,
        learning_rate=3e-3, beta=1e3,
    )
    assert out["young_final"] * out["area_final"] == pytest.approx(2e9, rel=1e-2)
    assert out["history"][0].keys() == {
        "iteration", "loss_total", "loss_physics", "loss_data", "young", "area",
    }


# ---------------------------------------------------------------------------
# api_* CLI contracts
# ---------------------------------------------------------------------------

_ENV = {
    "PATH": "/usr/bin:/bin", "HOME": "/root",
    "PYTHONPATH": "/root/repo:/root/.axon_site", "JAX_PLATFORMS": "cpu",
}


def _run_api(module, input_data, tmp_path, timeout=300):
    inp = tmp_path / "in.json"
    outp = tmp_path / "out.json"
    inp.write_text(json.dumps(input_data))
    proc = subprocess.run(
        [sys.executable, "-m", module, str(inp), str(outp)],
        capture_output=True, text=True, timeout=timeout, cwd="/root/repo",
        env=_ENV,
    )
    return proc, json.loads(outp.read_text()) if outp.exists() else None


_FEM_INPUT = {
    "nodes": [
        {"x": 0, "y": 0, "fixed": True},
        {"x": 1, "y": 0, "fixed_y": True},
    ],
    "elements": [{"nodes": [0, 1]}],
    "material": {"young": 210e9, "area": 0.01},
    "loads": [0, 0, 1000, 0],
    "solver_config": {"max_iterations": 50, "tolerance": 1e-6},
}


def test_api_fem_solver_cli(tmp_path):
    proc, out = _run_api("pinn_fem_tpu.cli.api_fem_solver", _FEM_INPUT, tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert set(out) == {"displacements", "stresses", "strains", "converged",
                        "convergence_history"}
    assert out["converged"] is True
    assert out["displacements"][2] == pytest.approx(1000 / 2.1e9, rel=1e-4)
    assert out["strains"][0] == pytest.approx(1000 / 2.1e9, rel=1e-4)
    assert len(out["convergence_history"]) == 10


def test_api_fem_solver_error_contract(tmp_path):
    proc, out = _run_api(
        "pinn_fem_tpu.cli.api_fem_solver", {"nodes": "garbage"}, tmp_path
    )
    assert proc.returncode == 1
    assert set(out) == {"error", "type"}


def test_api_pinn_nr_cli(tmp_path):
    data = {
        "nodes": _FEM_INPUT["nodes"],
        "elements": _FEM_INPUT["elements"],
        "material": {"young": 100e9, "area": 0.01},
        "loads": [0, 0, 1e6, 0],
        "measured_disp": [5e-4],
        "measured_dofs": [2],
        "solver_config": {"max_iterations": 60, "tolerance": 1e-10,
                          "lambda_lm": 1e-3},
    }
    proc, out = _run_api("pinn_fem_tpu.cli.api_pinn_nr", data, tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert set(out) == {"displacements", "stresses", "strains",
                        "identified_params", "convergence_history",
                        "final_residual"}
    ea = out["identified_params"]["young"] * out["identified_params"]["area"]
    assert ea == pytest.approx(2e9, rel=1e-3)


def test_api_pinn_gd_requires_measurements(tmp_path):
    data = dict(_FEM_INPUT)
    proc, out = _run_api("pinn_fem_tpu.cli.api_pinn_gd", data, tmp_path)
    assert proc.returncode == 1
    assert "measured_disp" in out["error"]
