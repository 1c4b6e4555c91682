"""End-to-end sweep of the reference's 16-problem benchmark corpus.

Every problem JSON is parsed and solved in-process; convergence status and
displacement accuracy are asserted against the documented expectations
(SURVEY §2.6/§6, examples/json/README.md:19-22).  example6 is expected to
FAIL exactly like the reference does (README.md:175,308: hybrid + NN
without preconditioning exhausts its iteration budget on increment 1).
"""

import glob
import os

import numpy as np
import pytest

from pinn_fem_tpu.io.results import result_to_output_dict
from pinn_fem_tpu.io.schema import parse_problem_file
from pinn_fem_tpu.solvers.driver import solve

REF = "/root/reference/FEM/python/examples/json"
ALL = sorted(os.path.basename(p) for p in glob.glob(f"{REF}/example*.json"))

# Examples whose final displacements must match u_x = load_factor * [1, 2, 3]
# (or [1] for the single-element variants).  Bounds are the MEASURED
# converged error x ~1.5-2 margin (round-3 VERDICT #8 — regressions in
# Adam/convergence-gate semantics must not hide inside loose 1e-2):
# scalar-GD ex2 family converges at its gate level ~1.6-2.6e-3; the NN
# families at 3-9e-5; 5-P finishes on the NR entry (exact).
_ANALYTIC = {
    "example1.json": 2e-5, "example1-1.json": 2e-5, "example8.json": 2e-5,
    "example5.json": 2e-5, "example5-P.json": 2e-5,
    "example2.json": 4e-3, "example2-P.json": 4e-3, "example2-2.json": 4e-3,
    "example3.json": 2e-4, "example3-P.json": 2e-4,
    "example4.json": 2e-4, "example4-P.json": 2e-4,
    "example6-P.json": 2e-4, "example7.json": 2e-4, "example7-P.json": 2e-4,
}
_EXPECT_FAIL = {"example6.json"}
# Physics-only full-NR problems: any equilibrium is valid; assert R == 0.
_EQUILIBRIUM_ONLY = {"example9.json", "example10.json"}

# Deterministic cases (no NN -> no RNG): the reported iteration count (len
# of the last increment's history) is pinned exactly.  For the GD family
# these counts ALSO match the live torch reference run-for-run (PARITY.md:
# example2 = 141, example2-2 = 33, example2-P = 129 on both stacks).
_PINNED_ITERATIONS = {
    "example1.json": 1,      # one NR summary entry per increment
    "example1-1.json": 1,
    "example5.json": 1,      # hybrid scalar -> pure NR entry
    "example8.json": 1,      # full-nr delegates to NR
    "example2.json": 141,
    "example2-2.json": 33,
    "example2-P.json": 129,
    "example5-P.json": 86,   # precond GD phase + NR finalization entry
    # NN families: deterministic under the fixed reference seed (the
    # seed-matched PARITY runs), so their counts pin too.
    "example3.json": 139, "example3-P.json": 86,
    "example4.json": 114, "example4-P.json": 96,
    "example6-P.json": 86,
    "example7.json": 114, "example7-P.json": 96,
}


@pytest.mark.parametrize("name", ALL)
def test_example_end_to_end(name):
    parsed = parse_problem_file(os.path.join(REF, name))
    result = solve(
        parsed.problem, parsed.config,
        parsed.measured_disp, parsed.measured_dofs, verbose=False,
    )

    if name in _EXPECT_FAIL:
        assert not result.converged, "reference example6 fails; ours must too"
        return

    assert result.converged, name

    if name in _EQUILIBRIUM_ONLY:
        # Verify physical equilibrium at the converged state.
        import jax.numpy as jnp

        from pinn_fem_tpu.ops.assembly import internal_force_and_strain

        data = parsed.problem.to_device()
        u = jnp.asarray(result.displacements.flatten(), dtype=data.loads.dtype)
        f_int, _ = internal_force_and_strain(data, parsed.problem.material, u, 1.0)
        r = (np.asarray(f_int) - np.asarray(data.loads)) * np.asarray(data.free_mask)
        assert np.linalg.norm(r) < 1e-5, name
        return

    if name in _PINNED_ITERATIONS:
        assert len(result.history) == _PINNED_ITERATIONS[name], (
            name, len(result.history)
        )

    tol = _ANALYTIC[name]
    ux = result.displacements[:, 0]
    expected = np.arange(len(ux), dtype=float)
    np.testing.assert_allclose(ux, expected, atol=tol * max(1.0, expected[-1]))

    # Output contract keys.
    out = result_to_output_dict(result, parsed.problem)
    assert set(out) >= {"success", "converged", "iterations", "displacements",
                        "reactions", "history"}
    if parsed.problem.material.has_trainable_params:
        assert "nn_parameters" in out and "identified_properties" in out


def test_example8_equals_example1():
    """full-nr without NN must delegate to classic NR (solver.py:787-790)."""
    r1 = _solve("example1.json")
    r8 = _solve("example8.json")
    np.testing.assert_allclose(r1.displacements, r8.displacements, atol=1e-6)
    np.testing.assert_allclose(r1.reactions, r8.reactions, atol=1e-6)


def _solve(name):
    parsed = parse_problem_file(os.path.join(REF, name))
    return solve(parsed.problem, parsed.config,
                 parsed.measured_disp, parsed.measured_dofs, verbose=False)
