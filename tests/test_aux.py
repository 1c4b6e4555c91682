"""Auxiliary subsystems: checkpoint/resume and profiling utilities."""

import jax
import numpy as np

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, make_mlp_field, solve, to_field
from pinn_fem_tpu.solvers.gd import get_theta
from pinn_fem_tpu.utils.checkpoint import load_increment_state, save_increment_state
from pinn_fem_tpu.utils.profiling import Stopwatch


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


def test_checkpoint_roundtrip(tmp_path):
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(0), 1, 4, input_dim=3, scale=1.0),
        area=to_field(1.0), density=to_field(1.0),
    )
    theta = get_theta(mat)
    u = np.arange(8.0)
    save_increment_state(tmp_path, 7, u, theta, meta={"method": "gd"})
    restored = load_increment_state(tmp_path, get_theta(mat))
    assert restored is not None
    inc, u2, theta2 = restored
    assert inc == 7
    np.testing.assert_array_equal(u2, u)
    for a, b in zip(jax.tree_util.tree_leaves(theta),
                    jax.tree_util.tree_leaves(theta2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_load_missing_checkpoint_returns_none(tmp_path):
    assert load_increment_state(tmp_path / "nope", []) is None


def test_solve_with_checkpoint_and_resume(tmp_path):
    ckpt = tmp_path / "run"
    p1 = chain_problem()
    full = solve(p1, SolverConfig(method="nr"), verbose=False,
                 checkpoint_dir=str(ckpt))
    assert (ckpt / "state.msgpack").exists()

    # Simulate a preempted run: checkpoint says increment 6 done; resuming
    # must produce the same final answer.
    restored = load_increment_state(ckpt, [])
    assert restored[0] == 10

    save_increment_state(ckpt, 6, np.asarray(full.displacements).flatten() * 0.6, [])
    p2 = chain_problem()
    resumed = solve(p2, SolverConfig(method="nr"), verbose=False,
                    checkpoint_dir=str(ckpt), resume=True)
    np.testing.assert_allclose(
        resumed.displacements, full.displacements, atol=1e-5
    )


def test_stopwatch():
    sw = Stopwatch()
    with sw.section("a"):
        pass
    with sw.section("a"):
        pass
    rep = sw.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0


def test_profiler_trace_writes_artifacts(tmp_path):
    import glob

    import jax.numpy as jnp

    from pinn_fem_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path)):
        with annotate("test-section"):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            x.block_until_ready()
    assert glob.glob(str(tmp_path / "**" / "*.pb"), recursive=True) or \
        glob.glob(str(tmp_path / "**" / "*.trace.json.gz"), recursive=True) or \
        glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)


def test_log_gd_progress_emits_reference_table(caplog):
    """print_every wiring (reference solver.py:245-249, 325-333): header +
    iteration 1 + every Nth iteration + the final iteration."""
    import logging

    from pinn_fem_tpu.utils.progress import log_gd_progress

    history = [
        {"iteration": float(i), "loss_total": 1.0 / i, "loss_physics": 1.0 / i,
         "loss_data": 0.0, "u_norm": 0.1 * i, "residual_norm": 0.5 / i,
         "theta_norm": 2.0}
        for i in range(1, 26)
    ]
    with caplog.at_level(logging.INFO, logger="pinn_fem_tpu.solvers"):
        log_gd_progress(history, print_every=10)
    lines = [r.message for r in caplog.records]
    assert any("Iter" in ln and "NN Params" in ln for ln in lines)  # header
    emitted = [int(ln.split("|")[0]) for ln in lines
               if "|" in ln and ln.split("|")[0].strip().isdigit()]
    assert emitted == [1, 10, 20, 25]  # first, cadence, last


def test_solve_verbose_logs_progress(caplog):
    """driver.solve(verbose=True) emits the per-iteration table for GD."""
    import logging

    cfg = SolverConfig(method="gd", learning_rate_u=0.01, alpha_data=0.0,
                       max_iterations=500, n_increments=2, print_every=10)
    with caplog.at_level(logging.INFO, logger="pinn_fem_tpu.solvers"):
        r = solve(chain_problem(), cfg, verbose=True)
    assert r.history  # logging test: rows were produced and emitted
    assert any("Loss Physics" in rec.message for rec in caplog.records)
    # Cadence: iteration-10 row present (print_every=10).
    assert any(rec.message.strip().startswith("10 |") for rec in caplog.records)
