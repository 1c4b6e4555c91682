"""Problem-JSON schema tests: golden-parse all 16 reference benchmark JSONs
and verify the parsed structures against the documented contract
(SURVEY §2.6: shared mesh, fixed_dofs=[0,1,3,5,7], unit load at node 3)."""

import glob
import json
import os

import numpy as np
import pytest

from pinn_fem_tpu.io.schema import parse_problem_dict, parse_problem_file
from pinn_fem_tpu.models.fields import MLPField, ScalarField

ALL_EXAMPLES = sorted(
    os.path.basename(p)
    for p in glob.glob("/root/reference/FEM/python/examples/json/example*.json")
)


@pytest.mark.parametrize("name", ALL_EXAMPLES)
def test_parse_all_reference_examples(name, reference_json_dir):
    parsed = parse_problem_file(os.path.join(reference_json_dir, name))
    p = parsed.problem
    assert p.dimension == 2
    assert p.ndof == p.nnode * 2
    assert p.nelm == p.nnode - 1
    # Shared benchmark mesh facts (examples/json/README.md:19-22).
    if p.nnode == 4:
        np.testing.assert_array_equal(sorted(p.fixed_dofs), [0, 1, 3, 5, 7])
        assert p.loads[6] == 1.0
    assert parsed.config.method in {"nr", "gd", "hybrid", "full-nr", "auto"}


def test_example_method_mapping(reference_json_dir):
    cases = {
        "example1.json": "nr",
        "example2.json": "gd",
        "example5.json": "hybrid",
        "example8.json": "full-nr",
        "example9.json": "full-nr",
    }
    for name, method in cases.items():
        parsed = parse_problem_file(os.path.join(reference_json_dir, name))
        assert parsed.config.method == method, name


def test_nn_config_parsing(reference_json_dir):
    parsed = parse_problem_file(os.path.join(reference_json_dir, "example7-P.json"))
    m = parsed.problem.material
    assert isinstance(m.young, MLPField) and m.young.input_dim == 3
    assert isinstance(m.area, MLPField)
    assert isinstance(m.density, MLPField)
    # Parameter counts from SimpleNN shapes (SURVEY §2.6): 521 + 316 + 161.
    assert m.young.n_params() == 521
    assert m.area.n_params() == 316
    assert m.density.n_params() == 161
    assert parsed.config.preconditioning is True
    assert parsed.config.learning_rate_theta == 0.0005


def test_measured_displacements_legacy_format(reference_json_dir):
    parsed = parse_problem_file(os.path.join(reference_json_dir, "example3.json"))
    # nodes [1,2,3] with ux=[1,2,3], uy=[0,0,0] -> interleaved dofs.
    np.testing.assert_array_equal(parsed.measured_dofs, [2, 3, 4, 5, 6, 7])
    np.testing.assert_array_equal(parsed.measured_disp, [1, 0, 2, 0, 3, 0])


def test_measured_displacements_global_dof_format():
    data = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "fixed_dofs": [0],
        "loads": [0.0, 1.0],
        "material": {"young": 1.0, "area": 1.0},
        "solver_type": "pinn-gd",
        "measured_displacements": {"global_dof": [1], "measured_u": [0.5]},
    }
    parsed = parse_problem_dict(data)
    assert parsed.problem.dimension == 1
    np.testing.assert_array_equal(parsed.measured_dofs, [1])
    np.testing.assert_array_equal(parsed.measured_disp, [0.5])


def test_per_node_measured_fallback():
    data = {
        "nodes": [
            {"x": 0.0, "y": 0.0, "fixed": True},
            {"x": 1.0, "y": 0.0, "fixed_y": True, "measured_ux": 0.7},
        ],
        "elements": [[0, 1]],
        "material": {"young": 1.0, "area": 1.0},
        "solver_type": "pinn-gd",
    }
    parsed = parse_problem_dict(data)
    np.testing.assert_array_equal(parsed.measured_dofs, [2])
    np.testing.assert_array_equal(parsed.measured_disp, [0.7])
    np.testing.assert_array_equal(sorted(parsed.problem.fixed_dofs), [0, 1, 3])


def test_config_precedence_pinn_over_solver():
    """pinn_config wins for max_iterations/tolerance; solver_config wins for
    learning rates (generic.py:399-428)."""
    data = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "fixed_dofs": [0],
        "loads": [0.0, 1.0],
        "material": {"young": 1.0, "area": 1.0},
        "solver_type": "pinn-gd",
        "solver_config": {"max_iterations": 111, "learning_rate_u": 0.5},
        "pinn_config": {"max_iterations": 222, "learning_rate_u": 0.25},
    }
    cfg = parse_problem_dict(data).config
    assert cfg.max_iterations == 222
    assert cfg.learning_rate_u == 0.5


def test_explicit_method_overrides_solver_type():
    data = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "fixed_dofs": [0],
        "loads": [0.0, 1.0],
        "material": {"young": 1.0, "area": 1.0},
        "solver_type": "fem",
        "solver_config": {"method": "full-nr"},
    }
    assert parse_problem_dict(data).config.method == "full-nr"


def test_1d_coordinate_list_flattening():
    data = {
        "nodes": [[0.0], [1.0], [2.5]],
        "elements": [[0, 1], [1, 2]],
        "fixed_dofs": [0],
        "loads": [0.0, 0.0, 1.0],
        "material": {"young": 1.0, "area": 1.0},
    }
    p = parse_problem_dict(data).problem
    assert p.dimension == 1
    assert p.nodes.ndim == 1
    np.testing.assert_array_equal(p.nodes, [0.0, 1.0, 2.5])


def test_material_defaults():
    data = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "fixed_dofs": [0],
        "loads": [0.0, 1.0],
    }
    m = parse_problem_dict(data).problem.material
    assert isinstance(m.young, ScalarField)
    assert np.isclose(m.young.eval_scalar(), 210e9, rtol=1e-6)
    assert np.isclose(m.area.eval_scalar(), 0.01, rtol=1e-6)
    assert np.isclose(m.density.eval_scalar(), 7850.0, rtol=1e-6)
