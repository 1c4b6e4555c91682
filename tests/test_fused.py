"""Fused on-device incremental driver: semantics must match the host-stepped
driver exactly (same math, same phase budgets, same history contract)."""

import glob
import os

import numpy as np
import pytest

from pinn_fem_tpu.io.schema import parse_problem_file
from pinn_fem_tpu.solvers.driver import resolve_method, solve
from pinn_fem_tpu.solvers.fused import solve_fused

REF = "/root/reference/FEM/python/examples/json"

# Every corpus example: the fused driver covers all methods
# (nr / gd / hybrid / full-nr / gn).
FUSED_EXAMPLES = [
    os.path.basename(_p) for _p in sorted(glob.glob(f"{REF}/example*.json"))
]


@pytest.mark.parametrize("name", FUSED_EXAMPLES)
def test_fused_matches_host_stepped(name):
    parsed_h = parse_problem_file(os.path.join(REF, name))
    host = solve(parsed_h.problem, parsed_h.config,
                 parsed_h.measured_disp, parsed_h.measured_dofs, verbose=False)

    parsed_f = parse_problem_file(os.path.join(REF, name))  # fresh NN init (same seed)
    fused = solve_fused(parsed_f.problem, parsed_f.config,
                        parsed_f.measured_disp, parsed_f.measured_dofs)

    # The two paths are different XLA programs, so float32 reassociation
    # produces ulp-level drift; iteration counts and structure must agree
    # exactly, values to float32 tolerance.
    assert fused.converged == host.converged, name
    np.testing.assert_allclose(
        fused.displacements, host.displacements, atol=5e-6, err_msg=name
    )
    np.testing.assert_allclose(
        fused.reactions, host.reactions, atol=1e-5, err_msg=name
    )
    assert len(fused.history) == len(host.history), name
    for eh, ef in zip(host.history, fused.history):
        assert set(eh) == set(ef), name
        for k in eh:
            if k in ("iteration", "iterations", "converged", "load_factor"):
                assert eh[k] == ef[k], (name, k, eh[k], ef[k])
            else:
                # GD trajectories amplify float32 ulp drift between the two
                # program schedules; values agree to a few percent.
                assert np.isclose(eh[k], ef[k], rtol=5e-2, atol=1e-6), (
                    name, k, eh[k], ef[k])

    if host.nn_parameters is not None:
        assert fused.nn_parameters is not None
        for k in host.nn_parameters:
            np.testing.assert_allclose(
                fused.nn_parameters[k], host.nn_parameters[k],
                atol=1e-6, err_msg=(name, k),
            )


def test_fused_rejects_unknown_method():
    parsed = parse_problem_file(os.path.join(REF, "example8.json"))
    parsed.config.method = "bogus"
    with pytest.raises(ValueError, match="not 'bogus'"):
        solve_fused(parsed.problem, parsed.config)


def test_fused_gn_matches_host_stepped():
    """The gn method (no corpus example uses it) — fused vs host on a
    measured inverse problem."""
    parsed_h = parse_problem_file(os.path.join(REF, "example3.json"))
    parsed_h.config.method = "gn"
    parsed_h.config.max_iterations = 100
    host = solve(parsed_h.problem, parsed_h.config,
                 parsed_h.measured_disp, parsed_h.measured_dofs, verbose=False)

    parsed_f = parse_problem_file(os.path.join(REF, "example3.json"))
    parsed_f.config.method = "gn"
    parsed_f.config.max_iterations = 100
    fused = solve_fused(parsed_f.problem, parsed_f.config,
                        parsed_f.measured_disp, parsed_f.measured_dofs)

    assert fused.converged == host.converged
    np.testing.assert_allclose(fused.displacements, host.displacements, atol=5e-5)
    assert len(fused.history) == len(host.history)
    assert set(fused.history[0]) == {"iteration", "r_physics", "r_data",
                                     "r_total", "relative_error", "step_size"}
