#!/usr/bin/env python3
"""Scalar vs. frozen-MLP material field in a forward solve.

Parity with /root/reference/FEM/python/examples/truss1d_nn_property.py:
solve the same 1D bar once with a scalar Young's modulus and once with an
(untrained) MLP field, and compare displacements — the MLP initializes to
softplus(~1) * scale, so the two solutions differ by a known smooth factor.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import jax
import numpy as np

from pinn_fem_tpu import Material, TrussProblem, make_mlp_field
from pinn_fem_tpu.models.fields import point_inputs_dict_order
from pinn_fem_tpu.solvers.legacy import LegacySolverConfig, solve_incremental_newton


def bar(material):
    nodes = np.linspace(0.0, 3.0, 4)
    return TrussProblem(
        nodes=nodes,
        elements=np.array([[0, 1], [1, 2], [2, 3]]),
        material=material,
        loads=np.array([0.0, 0.0, 0.0, 1000.0]),
        fixed_dofs=np.array([0]),
        dimension=1,
    )


def main():
    e0 = 210e9
    scalar_problem = bar(Material(young=e0, area=0.01, density=7850.0))
    r_scalar = solve_incremental_newton(scalar_problem, LegacySolverConfig())

    mlp = make_mlp_field(jax.random.PRNGKey(0), hidden_layers=2,
                         neurons_per_layer=20, input_dim=2, scale=e0)
    nn_problem = bar(Material(young=mlp, area=0.01, density=7850.0))
    # Classic NR evaluates the (frozen) MLP field at element midpoints —
    # the reference does exactly this through its NumPy assembly path.
    r_nn = solve_incremental_newton(nn_problem, LegacySolverConfig())

    u_s = r_scalar.displacements.reshape(-1)
    u_n = r_nn.displacements.reshape(-1)
    print("scalar E solution   :", u_s)
    print("MLP-field solution  :", u_n)

    # Expected per-element stiffness ratio: E_mlp(midpoint) / e0.
    mids = 0.5 * (nn_problem.nodes[:-1] + nn_problem.nodes[1:])
    x = point_inputs_dict_order(mids.reshape(-1, 1), 1, 1.0)
    e_mlp = np.asarray(mlp.eval_batch(x))
    print("E_mlp / E0 at midpoints:", np.round(e_mlp / e0, 4))
    ratio = u_s[-1] / max(abs(u_n[-1]), 1e-30)
    print(f"tip-displacement ratio: {ratio:.4f} "
          f"(harmonic mean of E-ratios: "
          f"{3.0 / np.sum(e0 / e_mlp):.4f})")
    assert np.isclose(ratio, 3.0 / np.sum(e0 / e_mlp), rtol=1e-3)
    print("OK")


if __name__ == "__main__":
    main()
