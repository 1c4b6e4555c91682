"""identified_properties extraction contract (reference generic.py:498-799):
scalar / spatial-only NN / load-factor-aware NN variants, 1D and 2D."""

import jax
import numpy as np

from pinn_fem_tpu import Material, TrussProblem, make_mlp_field, to_field
from pinn_fem_tpu.io.results import extract_identified_properties, result_to_output_dict
from pinn_fem_tpu.config import SolverResult


def problem_2d(material):
    return TrussProblem(
        nodes=np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]),
        elements=np.array([[0, 1], [1, 2]]),
        material=material,
        loads=np.zeros(6),
        fixed_dofs=np.array([0, 1]),
        dimension=2,
    )


def test_scalar_properties():
    mat = Material(young=to_field(210e9), area=to_field(0.01), density=to_field(7850.0))
    props = extract_identified_properties(problem_2d(mat))
    assert props["young"]["type"] == "scalar"
    assert np.isclose(props["young"]["value"], 210e9, rtol=1e-6)
    assert set(props) == {"young", "area", "density"}


def test_load_dependent_nn_structure():
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(0), 1, 4, input_dim=3, scale=2.0),
        area=to_field(1.0), density=to_field(1.0),
    )
    p = problem_2d(mat)
    props = extract_identified_properties(p)
    y = props["young"]
    assert y["type"] == "nn_load_dependent"
    assert y["input_dim"] == 3
    lf_keys = set(y["load_factor_variations"])
    assert lf_keys == {"load_factor_0.2", "load_factor_0.5", "load_factor_1.0"}
    block = y["load_factor_variations"]["load_factor_1.0"]
    assert len(block["at_nodes"]["values"]) == 3
    assert len(block["at_elements"]["values"]) == 2
    assert len(block["at_elements"]["centroids"]) == 2
    # Values positive (softplus * scale).
    assert all(v > 0 for v in block["at_nodes"]["values"])


def test_spatial_only_nn_structure():
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(1), 1, 4, input_dim=2, scale=1.0),
        area=to_field(1.0), density=to_field(1.0),
    )
    props = extract_identified_properties(problem_2d(mat))
    y = props["young"]
    assert y["type"] == "nn"
    assert "at_nodes" in y and "at_elements" in y
    assert len(y["at_nodes"]["values"]) == 3


def test_1d_problem_extraction():
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(2), 1, 4, input_dim=2, scale=1.0),
        area=to_field(1.0), density=to_field(1.0),
    )
    p = TrussProblem(
        nodes=np.array([0.0, 1.0, 3.0]),
        elements=np.array([[0, 1], [1, 2]]),
        material=mat,
        loads=np.zeros(3),
        fixed_dofs=np.array([0]),
        dimension=1,
    )
    props = extract_identified_properties(p)
    # 1D with input_dim=2 > dim=1 -> load-dependent.
    assert props["young"]["type"] == "nn_load_dependent"
    block = props["young"]["load_factor_variations"]["load_factor_0.5"]
    # 1D coords serialize as flat floats (reference nodes are scalars).
    assert block["at_nodes"]["coords"] == [0.0, 1.0, 3.0]


def test_output_dict_shape_contract():
    result = SolverResult(
        displacements=np.array([[0.0, 0.0], [1.0, 0.0]]),
        reactions=np.array([[-1.0, 0.0], [0.0, 0.0]]),
        converged=True,
        history=[{"iteration": 1.0}],
        nn_parameters=None,
    )
    out = result_to_output_dict(result)
    assert out["displacements"] == [0.0, 0.0, 1.0, 0.0]
    assert out["iterations"] == 1
    assert "nn_parameters" not in out
