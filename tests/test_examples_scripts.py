"""Smoke tests for the demo scripts in examples/*.py.

The reference rotted exactly here: two of its example scripts crash on
stale keys (SURVEY §2.3 — fem2d_like.py:111 KeyError,
test_torch_element.py:36 TypeError).  Running each of ours in-process per
test run makes that rot impossible.  Plot outputs land in tmp_path
(headless Agg backend is selected inside the scripts themselves).
"""

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).resolve().parent.parent / "examples"

SCRIPTS = [
    "large_mesh_demo",
    "truss1d_simple",
    "truss1d_nn_property",
    "fem2d_tower",
    "truss3d_pylon",
    "pinn_inverse_problem",
    "pinn_newton_raphson",
]


def load_example(name: str):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", EXAMPLES_DIR / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


SCRIPTS.append("modal_identification")
SCRIPTS.append("dynamics_suite")
SCRIPTS.append("transient_identification")
SCRIPTS.append("snap_through")
SCRIPTS.append("sizing_optimization")
SCRIPTS.append("twin_workflow")
SCRIPTS.append("fatigue_assessment")
SCRIPTS.append("reliability_assessment")
SCRIPTS.append("frame_analysis")
SCRIPTS.append("solid_analysis")
SCRIPTS.append("space_frame_analysis")
SCRIPTS.append("shell_obstacle_course")
SCRIPTS.append("shell_snap_through")


@pytest.mark.parametrize("name", SCRIPTS)
def test_example_script_runs(name, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)  # PNG/side outputs land in tmp
    if name == "modal_identification":  # smoke budget, not demo budget
        monkeypatch.setenv("MODAL_ID_ITERS", "30")
        monkeypatch.setenv("MODAL_ID_NODES", "11")
        monkeypatch.setenv("MODAL_ID_MODES", "4")
    if name == "transient_identification":
        monkeypatch.setenv("TRANS_ID_ITERS", "40")
        monkeypatch.setenv("TRANS_ID_FIELD_ITERS", "40")
    if name == "sizing_optimization":
        monkeypatch.setenv("SIZING_ITERS", "60")
    if name == "twin_workflow":
        monkeypatch.setenv("TWIN_ID_ITERS", "60")
        monkeypatch.setenv("TWIN_SZ_ITERS", "60")
    if name == "fatigue_assessment":  # short record for the smoke run
        monkeypatch.setenv("FATIGUE_STEPS", "12000")
    if name == "reliability_assessment":
        monkeypatch.setenv("RELIAB_MC", "8000")
        monkeypatch.setenv("RELIAB_RBDO_ITERS", "60")
    mod = load_example(name)
    assert hasattr(mod, "main"), f"{name}.py must expose main()"
    mod.main()
    out = capsys.readouterr().out
    assert out.strip(), f"{name}.py printed nothing"
    assert "FAILED" not in out
