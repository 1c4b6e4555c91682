"""Pallas fused material kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem, make_mlp_field, to_field
from pinn_fem_tpu.models.fields import assembly_inputs
from pinn_fem_tpu.ops.cg import stiffness_coefficients
from pinn_fem_tpu.ops.pallas.material_kernel import (
    fused_coefficients_supported,
    fused_material_coefficients,
)


def nn_material(widths=(20, 15, 10), hidden_layers=2, scales=(1.0, 1.0, 1.0)):
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    fields = [
        make_mlp_field(k, hidden_layers=hidden_layers, neurons_per_layer=w,
                       input_dim=3, scale=s)
        for k, w, s in zip(keys, widths, scales)
    ]
    return Material(young=fields[0], area=fields[1], density=fields[2])


def chain(n_nodes, material):
    nodes = np.stack([np.arange(n_nodes, dtype=float),
                      0.1 * np.sin(np.arange(n_nodes))], axis=1)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], axis=1)
    loads = np.zeros(2 * n_nodes)
    loads[-2] = 1.0
    return TrussProblem(nodes, elements, material, loads,
                        np.array([0, 1]), 2)


def test_supported_predicate():
    assert fused_coefficients_supported(nn_material())
    assert fused_coefficients_supported(nn_material(hidden_layers=1))
    scalar_mat = Material(young=to_field(1.0), area=to_field(1.0),
                          density=to_field(1.0))
    assert not fused_coefficients_supported(scalar_mat)
    assert not fused_coefficients_supported(nn_material(widths=(64, 15, 10)))


@pytest.mark.parametrize("hidden_layers", [1, 2])
@pytest.mark.parametrize("lf", [0.3, 1.0])
def test_kernel_matches_xla_path(hidden_layers, lf):
    mat = nn_material(hidden_layers=hidden_layers, scales=(2.0, 0.5, 7.0))
    p = chain(777, mat)  # not a multiple of the tile size on purpose
    data = p.to_device()

    e, a, rho, s = fused_material_coefficients(data, mat, lf, interpret=True)

    x = assembly_inputs(data.mid, 2, jnp.asarray(lf, jnp.float32))
    e_ref = mat.young.eval_batch(x)
    a_ref = mat.area.eval_batch(x)
    rho_ref = mat.density.eval_batch(x)
    s_ref = stiffness_coefficients(data, mat, lf)

    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=3e-5, atol=1e-6)
