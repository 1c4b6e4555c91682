"""Modal-domain identification (solvers/modal_inverse.py): parameters
from extracted natural frequencies, the EMA workflow — including the
enforced physics that a spectrum alone cannot split stiffness from mass
(omega^2 ~ EA/rho) until sign-invariant phi^2 sensor data is added."""

import numpy as np
import pytest

import jax

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.modal_inverse import (identify_from_modal,
                                                modal_observables)


def chain(young=2.0, density=3.0, n_nodes=7):
    nodes = np.arange(n_nodes, dtype=float)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    loads = np.zeros(n_nodes)
    loads[-1] = 1.0
    return TrussProblem(nodes, elements,
                        Material(young=young, area=1.0, density=density),
                        loads, np.array([0]), 1)


SENSORS = [2, 4, 6]


def _truth_data():
    truth = chain()
    lam, s2 = modal_observables(truth, truth.material, 4,
                                sensor_dofs=SENSORS)
    lam, s2 = jax.device_get((lam, s2))
    return np.sqrt(np.asarray(lam)) / (2 * np.pi), np.asarray(s2)


def test_identify_young_from_frequencies():
    f_hz, _ = _truth_data()
    ident, hist = identify_from_modal(chain(young=1.0), f_hz,
                                      params=("young",), n_iter=300)
    assert hist[-1] < 1e-8
    np.testing.assert_allclose(ident["young"], 2.0, rtol=1e-3)


def test_identify_density_from_frequencies():
    f_hz, _ = _truth_data()
    ident, hist = identify_from_modal(chain(density=1.0), f_hz,
                                      params=("density",), n_iter=300)
    assert hist[-1] < 1e-8
    np.testing.assert_allclose(ident["density"], 3.0, rtol=1e-3)


def test_stiffness_and_density_need_shape_data():
    """The enforced scaling degeneracy: E and rho together from a
    spectrum alone must be refused, and phi^2 sensor data unlocks it."""
    f_hz, s2 = _truth_data()
    with pytest.raises(ValueError, match="RATIO"):
        identify_from_modal(chain(1.0, 1.0), f_hz,
                            params=("young", "density"))

    ident, hist = identify_from_modal(
        chain(1.0, 1.0), f_hz, sensor_dofs=SENSORS, measured_shapes2=s2,
        params=("young", "density"), n_iter=600)
    assert hist[-1] < 1e-8
    np.testing.assert_allclose(ident["young"], 2.0, rtol=1e-2)
    np.testing.assert_allclose(ident["density"], 3.0, rtol=1e-2)


def test_identify_density_field_from_modal():
    """rho(x) — invisible to every static method — recovered as an MLP
    field from 6 frequencies + phi^2 sensor rows (the
    examples/modal_identification.py workflow productized; measured
    0.7% worst-case on this exact configuration)."""
    from pinn_fem_tpu.models.fields import (make_mlp_field,
                                            point_inputs_dict_order)
    from pinn_fem_tpu.solvers.modal_inverse import (
        identify_field_from_modal, modal_observables_elem)

    n = 11
    nodes = np.arange(n, dtype=float)
    el = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(n)
    loads[-1] = 1.0
    mids = 0.5 * (nodes[:-1] + nodes[1:])
    true_rho = 1.0 + mids / mids.max()

    nn = make_mlp_field(jax.random.PRNGKey(0), hidden_layers=1,
                        neurons_per_layer=8, input_dim=1, scale=1.5)
    prob = TrussProblem(nodes, el,
                        Material(young=2.0, area=1.0, density=nn),
                        loads, np.array([0]), 1)
    sensors = np.arange(1, n)
    lam, s2 = modal_observables_elem(prob, 2.0, 1.0, true_rho, 6,
                                     sensor_dofs=sensors)
    lam, s2 = jax.device_get((lam, s2))
    f_hz = np.sqrt(np.asarray(lam)) / (2 * np.pi)

    trained, hist = identify_field_from_modal(
        prob, f_hz, sensor_dofs=sensors, measured_shapes2=s2,
        field="density", n_iter=1500, learning_rate=0.02)
    assert hist[-1] < 1e-3 * hist[0], (hist[0], hist[-1])
    vals = np.asarray(trained.eval_batch(
        point_inputs_dict_order(mids[:, None], 1, 1.0)))
    np.testing.assert_allclose(vals, true_rho, rtol=0.05)

    # Frequencies alone must be refused for a field profile.
    with pytest.raises(ValueError, match="underdetermines"):
        identify_field_from_modal(prob, f_hz, field="density")


def test_ea_pair_rejected_in_every_domain():
    """E and A enter the physics only as EA — all three identification
    routes refuse the degenerate pair up front."""
    from pinn_fem_tpu.solvers.frequency_inverse import identify_from_frf
    from pinn_fem_tpu.solvers.transient_inverse import \
        identify_from_transient

    p = chain()
    f_hz, _ = _truth_data()
    for call in (
        lambda: identify_from_modal(p, f_hz, params=("young", "area")),
        lambda: identify_from_frf(p, np.ones((4, 2)),
                                  [0.1, 0.2, 0.3, 0.4], SENSORS[:2],
                                  params=("young", "area")),
        lambda: identify_from_transient(p, np.zeros((10, 2)), 0.05, 10,
                                        np.array([2, 4]),
                                        params=("young", "area")),
    ):
        with pytest.raises(ValueError, match="not separately"):
            call()


def test_input_errors():
    f_hz, s2 = _truth_data()
    p = chain()
    with pytest.raises(ValueError, match="unknown parameter"):
        identify_from_modal(p, f_hz, params=("alpha",))
    with pytest.raises(ValueError, match="go together"):
        identify_from_modal(p, f_hz, measured_shapes2=s2)
    with pytest.raises(ValueError, match="measured_shapes2 must be"):
        identify_from_modal(p, f_hz, sensor_dofs=SENSORS,
                            measured_shapes2=s2[:, :2],
                            params=("density",))
