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
