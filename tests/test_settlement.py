"""Prescribed nonzero displacements (support settlement) vs closed forms.

Bar fixed at both ends with the right support displaced by delta: linear
interpolation u(x) = delta x / L, member force EA delta / L carried by
equal/opposite reactions.  2D frame settlement through the CLI too."""

import json

import numpy as np

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve_nr

DELTA = 0.01


def bar(n=6, young=3.0, area=0.7):
    nodes = np.arange(n, dtype=float)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    return TrussProblem(nodes, elements,
                        Material(young=young, area=area, density=1.0),
                        np.zeros(n), np.array([0, n - 1]), 1)


def test_settlement_closed_form():
    n = 6
    p = bar(n)
    up = np.zeros(n)
    up[n - 1] = DELTA
    r = solve_nr(p, SolverConfig(max_iterations=10, tolerance=1e-6), 1.0,
                 prescribed_u=up)
    u = np.asarray(r.displacements).reshape(-1)
    L = n - 1.0
    np.testing.assert_allclose(u, DELTA * np.arange(n) / L, rtol=1e-5,
                               atol=1e-10)
    # Reactions: +-EA delta / L.
    force = 3.0 * 0.7 * DELTA / L
    reac = np.asarray(r.reactions).reshape(-1)
    np.testing.assert_allclose(sorted([reac[0], reac[-1]]),
                               [-force, force], rtol=1e-4)
    assert r.converged


def test_settlement_with_loads_superposes():
    """Linear problem: settlement + external load == sum of the two."""
    n = 6
    p = bar(n)
    loads = np.zeros(n)
    loads[3] = 1.0
    p_l = TrussProblem(p.nodes, p.elements, p.material, loads,
                       p.fixed_dofs, 1)
    up = np.zeros(n)
    up[n - 1] = DELTA
    cfg = SolverConfig(max_iterations=10, tolerance=1e-6)
    both = np.asarray(solve_nr(p_l, cfg, 1.0,
                               prescribed_u=up).displacements).reshape(-1)
    only_load = np.asarray(solve_nr(p_l, cfg, 1.0).displacements).reshape(-1)
    only_set = np.asarray(solve_nr(p, cfg, 1.0,
                                   prescribed_u=up).displacements).reshape(-1)
    np.testing.assert_allclose(both, only_load + only_set, rtol=1e-4,
                               atol=1e-9)


def test_settlement_through_cli(tmp_path):
    """The prescribed_displacements JSON block end-to-end; prescribing a
    non-fixed DOF auto-fixes it."""
    from pinn_fem_tpu.cli.generic import run

    doc = {
        "nodes": [[float(i)] for i in range(6)],
        "elements": [[i, i + 1] for i in range(5)],
        "material": {"young": 3.0, "area": 0.7, "density": 1.0},
        "loads": [0.0] * 6,
        "fixed_dofs": [0],
        "solver_type": "fem",
        "prescribed_displacements": {"dofs": [5], "values": [DELTA]},
    }
    pf = tmp_path / "settle.json"
    pf.write_text(json.dumps(doc))
    out = run(str(pf))
    u = np.asarray(out["displacements"])
    np.testing.assert_allclose(u, DELTA * np.arange(6) / 5.0, rtol=1e-5,
                               atol=1e-10)
