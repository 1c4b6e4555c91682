"""Thermal loading (ops/thermal.py) vs closed forms.

Constrained bar: u = 0, support reactions -+ E A alpha dT.
Free bar: tip displacement alpha dT L, stress-free (eps == eps0).
Statically determinate truss heated uniformly: pure scaling about the
support, u = alpha dT (x - x_support), zero member force."""

import json
import numpy as np

import jax

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve_nr
from pinn_fem_tpu.ops.thermal import (element_delta_t, thermal_free_strains,
                                      thermal_loads)

ALPHA, DT = 1e-4, 50.0


def heated_bar(n=5, fixed_both=False, young=3.0, area=0.7):
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    fixed = [0, n - 1] if fixed_both else [0]
    p = TrussProblem(nodes, elements,
                     Material(young=young, area=area, density=1.0),
                     np.zeros(n), np.array(fixed), 1)
    data = p.to_device()
    dt_e = element_delta_t(data, DT, n)
    f_th = np.asarray(jax.device_get(
        thermal_loads(data, p.material, ALPHA, dt_e)))
    return TrussProblem(nodes, elements, p.material, f_th,
                        np.array(fixed), 1), data


def test_constrained_bar_zero_displacement():
    p, _ = heated_bar(fixed_both=True)
    r = solve_nr(p, SolverConfig(max_iterations=10, tolerance=1e-12), 1.0)
    u = np.asarray(r.displacements).reshape(-1)
    np.testing.assert_allclose(u, 0.0, atol=1e-9)
    # Support reactions hold the compression E A alpha dT in.
    reac = np.asarray(r.reactions).reshape(-1)
    force = 3.0 * 0.7 * ALPHA * DT
    np.testing.assert_allclose(sorted([reac[0], reac[-1]]),
                               [-force, force], rtol=1e-5)


def test_free_bar_stress_free_expansion():
    p, data = heated_bar(fixed_both=False)
    r = solve_nr(p, SolverConfig(max_iterations=10, tolerance=1e-12), 1.0)
    u = np.asarray(r.displacements).reshape(-1)
    # u(x) = alpha dT x, tip = alpha dT L.
    np.testing.assert_allclose(u, ALPHA * DT * np.arange(5), rtol=1e-4,
                               atol=1e-10)
    # Mechanical strain == free strain -> zero stress.
    eps = np.diff(u)
    eps0 = np.asarray(jax.device_get(thermal_free_strains(
        data, ALPHA, element_delta_t(data, DT, 5))))
    np.testing.assert_allclose(eps, eps0, rtol=1e-4)


def test_determinate_truss_scales_about_support():
    """Pinned triangle (statically determinate): uniform heating scales
    the structure about the pin with zero member stress."""
    nodes = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 1.5]])
    elements = np.array([[0, 1], [1, 2], [0, 2]])
    mat = Material(young=10.0, area=1.0, density=1.0)
    base = TrussProblem(nodes, elements, mat, np.zeros(6),
                        np.array([0, 1, 3]), 2)  # pin node0, roller node1
    data = base.to_device()
    f_th = np.asarray(jax.device_get(thermal_loads(
        data, mat, ALPHA, element_delta_t(data, DT, 3))))
    p = TrussProblem(nodes, elements, mat, f_th, np.array([0, 1, 3]), 2)
    r = solve_nr(p, SolverConfig(max_iterations=10, tolerance=1e-12), 1.0)
    u = np.asarray(r.displacements).reshape(-1, 2)
    expect = ALPHA * DT * (nodes - nodes[0])
    np.testing.assert_allclose(u, expect, rtol=1e-4, atol=1e-9)


def test_per_node_delta_t_averages():
    nodes = np.arange(3, dtype=float)
    elements = np.array([[0, 1], [1, 2]])
    p = TrussProblem(nodes, elements, Material(1.0, 1.0, 1.0),
                     np.zeros(3), np.array([0]), 1)
    data = p.to_device()
    dt_e = np.asarray(jax.device_get(
        element_delta_t(data, np.array([0.0, 100.0, 200.0]), 3)))
    np.testing.assert_allclose(dt_e, [50.0, 150.0])


def test_thermal_through_schema_cli(tmp_path):
    """The {"thermal": ...} block adds equivalent loads at parse time and
    the free-bar expansion comes out of the generic CLI end-to-end."""
    from pinn_fem_tpu.cli.generic import run

    doc = {
        "nodes": [[float(i)] for i in range(5)],
        "elements": [[i, i + 1] for i in range(4)],
        "material": {"young": 3.0, "area": 0.7, "density": 1.0},
        "loads": [0.0] * 5,
        "fixed_dofs": [0],
        "solver_type": "fem",
        "thermal": {"alpha": ALPHA, "delta_t": DT},
    }
    pf = tmp_path / "thermal.json"
    pf.write_text(json.dumps(doc))
    out = run(str(pf))
    u = np.asarray(out["displacements"])
    np.testing.assert_allclose(u, ALPHA * DT * np.arange(5), rtol=1e-4,
                               atol=1e-10)
