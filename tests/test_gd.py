"""Gradient-descent solver tests, including live-golden parity with the
reference implementation.

The committed golden values below were produced by running the ACTUAL
reference (torch, float32) on this machine:

    cd /tmp && python /root/reference/FEM/python/examples/json/generic.py \
        example2.json
    -> converged, iterations 141 (last increment),
       displacements [0, 0, 0.997832, 0, 1.996116, 0, 2.995173, 0],
       last history {loss_total 9.5e-07, residual_norm 0.00137541,
                     u_norm 3.7351315}

Our GD must reproduce the iteration count exactly and the trajectory
values to float32 tolerance (identical Adam semantics).
"""

import numpy as np
import pytest

from pinn_fem_tpu import SolverConfig, solve, solve_gd
from pinn_fem_tpu.io.schema import parse_problem_file

REF = "/root/reference/FEM/python/examples/json"


@pytest.fixture(scope="module")
def example2_result():
    parsed = parse_problem_file(f"{REF}/example2.json")
    result = solve(
        parsed.problem, parsed.config,
        parsed.measured_disp, parsed.measured_dofs, verbose=False,
    )
    return result


def test_example2_matches_reference_iteration_count(example2_result):
    """Exact trajectory parity with torch on the scalar-material GD path."""
    result = example2_result
    assert result.converged
    assert len(result.history) == 141


def test_example2_matches_reference_displacements(example2_result):
    ref_disp = np.array([0, 0, 0.997832, 0, 1.996116, 0, 2.995173, 0])
    np.testing.assert_allclose(
        example2_result.displacements.flatten(), ref_disp, atol=5e-5
    )


def test_example2_matches_reference_final_history(example2_result):
    last = example2_result.history[-1]
    assert last["iteration"] == 141.0
    assert np.isclose(last["loss_total"], 9.5e-07, rtol=0.05)
    assert np.isclose(last["residual_norm"], 0.00137541, rtol=0.01)
    assert np.isclose(last["u_norm"], 3.7351315, rtol=1e-4)


def test_gd_history_contract(example2_result):
    entry = example2_result.history[0]
    assert set(entry) == {
        "iteration", "loss_total", "loss_physics", "loss_data",
        "u_norm", "residual_norm",
    }
    assert entry["iteration"] == 1.0
    assert entry["loss_data"] == 0.0


def test_gd_convergence_gated_after_iteration_10():
    """The reference only tests convergence for iteration > 10
    (solver.py:341) — even a trivially-converged problem runs >= 12."""
    parsed = parse_problem_file(f"{REF}/example2-2.json")
    result = solve_gd(parsed.problem, parsed.config, target_load_factor=0.1)
    assert len(result.history) >= 12


def test_gd_preconditioning_merged_history():
    parsed = parse_problem_file(f"{REF}/example2-P.json")
    assert parsed.config.preconditioning
    result = solve_gd(
        parsed.problem, parsed.config, target_load_factor=1.0,
    )
    assert result.converged
    iters = [h["iteration"] for h in result.history]
    # Monotone renumbered iterations across the phase boundary.
    assert all(b > a for a, b in zip(iters, iters[1:]))


def test_gd_inverse_problem_identifies_stiffness():
    """PINN inverse: E=NN trained so that E*A ~= 1 at element midpoints
    (example3 physics; identified E*A within 1e-2 here with a short run)."""
    parsed = parse_problem_file(f"{REF}/example3.json")
    result = solve(
        parsed.problem, parsed.config,
        parsed.measured_disp, parsed.measured_dofs, verbose=False,
    )
    assert result.converged
    assert result.nn_parameters is not None
    # Identified E at element midpoints must satisfy equilibrium: E*A = 1.
    from pinn_fem_tpu.models.fields import point_inputs_dict_order

    mids = parsed.problem.element_midpoints()
    x = point_inputs_dict_order(mids, 2, 1.0)
    e_vals = np.asarray(parsed.problem.material.young.eval_batch(x))
    np.testing.assert_allclose(e_vals * 1.0, 1.0, atol=2e-2)
    # Displacements track the measured targets.
    np.testing.assert_allclose(
        result.displacements[1:, 0], [1.0, 2.0, 3.0], atol=5e-3
    )
