"""End-to-end CLI contract tests (reference generic.py contract)."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/FEM/python/examples/json")


def run_cli(tmp_path, name, timeout=300):
    src = REF / name
    dst = tmp_path / name
    shutil.copy(src, dst)
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(dst)],
        capture_output=True, text=True, timeout=timeout,
        cwd="/root/repo",
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": "/root/repo:/root/.axon_site",
            "JAX_PLATFORMS": "cpu",
        },
    )
    return proc, dst


def test_cli_example1_end_to_end(tmp_path):
    proc, dst = run_cli(tmp_path, "example1.json")
    assert proc.returncode == 0, proc.stderr[-2000:]
    res_file = dst.parent / "example1.res.json"
    log_file = dst.parent / "example1.log"
    assert res_file.exists()
    assert log_file.exists()

    out = json.loads(res_file.read_text())
    assert out["success"] is True
    assert out["converged"] is True
    assert set(out) >= {"success", "converged", "iterations", "displacements",
                        "reactions", "history"}
    np.testing.assert_allclose(
        out["displacements"], [0, 0, 1, 0, 2, 0, 3, 0], atol=2e-5
    )
    assert "nn_parameters" not in out


def test_cli_default_output_path(tmp_path):
    proc, dst = run_cli(tmp_path, "example1-1.json")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads((dst.parent / "example1-1.res.json").read_text())
    np.testing.assert_allclose(out["displacements"], [0, 0, 1, 0], atol=2e-5)


def test_cli_explicit_output_path(tmp_path):
    src = REF / "example1.json"
    dst = tmp_path / "example1.json"
    shutil.copy(src, dst)
    out_path = tmp_path / "custom_out.json"
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(dst), str(out_path)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={
            "PATH": "/usr/bin:/bin", "HOME": "/root",
            "PYTHONPATH": "/root/repo:/root/.axon_site",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out_path.exists()


def test_cli_error_exit_code(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(bad)],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
        env={
            "PATH": "/usr/bin:/bin", "HOME": "/root",
            "PYTHONPATH": "/root/repo:/root/.axon_site",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert proc.returncode == 1


def test_legacy_cli_timestamped_log(tmp_path):
    """Legacy CLI variant (cli.legacy_generic): entry-point parity with the
    reference's examples/generic.py — timestamped log name, same result
    JSON (reference examples/generic.py:68-71)."""
    src = REF / "example1.json"
    dst = tmp_path / "example1.json"
    shutil.copy(src, dst)
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.legacy_generic", str(dst)],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": "/root/repo:/root/.axon_site",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    logs = list(tmp_path.glob("example1_????????_??????.log"))
    assert len(logs) == 1, list(tmp_path.iterdir())
    out = json.loads((tmp_path / "example1.res.json").read_text())
    assert out["converged"]
    np.testing.assert_allclose(
        out["displacements"], [0, 0, 1, 0, 2, 0, 3, 0], atol=2e-5
    )


def test_legacy_web_nn_flow_works(tmp_path):
    """The reference's legacy CLI crashes on any enabled NN in 2D (its
    assembly feeds 3 columns into the input_dim=1 net it builds —
    'mat1 and mat2 shapes cannot be multiplied', verified live).  Ours
    must run that exact payload: narrow nets get the spatial columns
    (models/fields.py _adapt_inputs)."""
    problem = {
        "nodes": [
            {"x": 0, "y": 0, "fixed": True},
            {"x": 1, "y": 0, "fixed_y": True},
            {"x": 2, "y": 0, "fixed_y": True},
            {"x": 3, "y": 0, "fixed_y": True},
        ],
        "elements": [[0, 1], [1, 2], [2, 3]],
        "loads": [0, 0, 0, 0, 0, 0, 1.0, 0],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "measured_displacements": {
            "nodes": [1, 2, 3], "ux": [1.0, 2.0, 3.0], "uy": [0, 0, 0]},
        "nn_config": {
            "young": {"enabled": True, "hiddenLayers": 2,
                      "neuronsPerLayer": 8}},
        "pinn_config": {"max_iterations": 1500, "learning_rate_u": 0.01,
                        "learning_rate_theta": 1e-3, "tolerance": 1e-5},
        "solver_type": "pinn-gd",
    }
    dst = tmp_path / "legacy_nn.json"
    dst.write_text(json.dumps(problem))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.legacy_generic", str(dst)],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "PYTHONPATH": "/root/repo:/root/.axon_site",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads((tmp_path / "legacy_nn.res.json").read_text())
    # input_dim=1 (legacy default): the E(x) field fits the measurements.
    u = np.asarray(out["displacements"])
    np.testing.assert_allclose(u[[2, 4, 6]], [1.0, 2.0, 3.0], atol=1e-2)
    assert "identified_properties" in out


def test_cli_seed_env_var(tmp_path):
    """PINN_FEM_TPU_SEED re-rolls the NN init (extension: the reference is
    unseeded torch, so its init-dependent outcomes cannot be re-rolled)."""
    outs = []
    for seed in ("0", "1"):
        src = REF / "example3.json"
        d = tmp_path / seed
        d.mkdir()
        dst = d / "example3.json"
        shutil.copy(src, dst)
        proc = subprocess.run(
            [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(dst)],
            capture_output=True, text=True, timeout=300,
            cwd="/root/repo",
            env={
                "PATH": "/usr/bin:/bin",
                "HOME": "/root",
                "PYTHONPATH": "/root/repo:/root/.axon_site",
                "JAX_PLATFORMS": "cpu",
                "PINN_FEM_TPU_SEED": seed,
            },
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        outs.append(json.loads((d / "example3.res.json").read_text()))
    # Different inits -> different trained weights; same physics.
    p0 = np.asarray(outs[0]["nn_parameters"]["param_0"])
    p1 = np.asarray(outs[1]["nn_parameters"]["param_0"])
    assert not np.allclose(p0, p1)
    np.testing.assert_allclose(
        outs[0]["displacements"], outs[1]["displacements"], atol=1e-3
    )
