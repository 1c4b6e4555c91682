#!/usr/bin/env python3
"""End-to-end PINN inverse demo: synthesize measurements from a known
spatially-varying stiffness, train an MLP material field with the legacy
gradient-descent solver, and plot identified vs. true E(x).

Parity with /root/reference/FEM/python/examples/pinn_inverse_problem.py
(synthetic data -> solve_pinn_gradient_descent -> comparison plot saved to
pinn_inverse_problem.png).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import jax
import numpy as np

from pinn_fem_tpu import (
    Material,
    PINNGradientDescentConfig,
    TrussProblem,
    make_mlp_field,
    solve_pinn_gradient_descent,
    to_field,
)
from pinn_fem_tpu.models.fields import point_inputs_dict_order


def true_young(x):
    """Ground-truth stiffness field: stiffer in the middle."""
    return 1.0 + 0.5 * np.exp(-((x - 1.5) ** 2))


def chain(material, n_nodes=4):
    nodes = np.stack([np.arange(n_nodes, dtype=float), np.zeros(n_nodes)], axis=1)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], axis=1)
    loads = np.zeros(2 * n_nodes)
    loads[2 * (n_nodes - 1)] = 1.0
    fixed = [0, 1] + [2 * i + 1 for i in range(1, n_nodes)]
    return TrussProblem(nodes, elements, material, loads, np.array(fixed), 2)


def main():
    mids = 0.5 + np.arange(3)

    # Synthetic measurements: for a unit end load on a series chain of unit
    # elements, each element's elongation is 1 / (E_e A), so the exact nodal
    # displacements are the cumulative element flexibilities.
    flex = 1.0 / true_young(mids)           # element flexibilities
    u_exact = np.concatenate([[0.0], np.cumsum(flex)])
    measured_dofs = np.array([2, 4, 6])
    measured = u_exact[1:]

    # Train an MLP Young field against those measurements.
    material = Material(
        young=make_mlp_field(jax.random.PRNGKey(0), hidden_layers=2,
                             neurons_per_layer=20, input_dim=3, scale=1.0),
        area=to_field(1.0),
        density=to_field(1.0),
    )
    problem = chain(material)
    result = solve_pinn_gradient_descent(
        problem, f_ext=problem.loads,
        measured_disp=measured, measured_dofs=measured_dofs,
        config=PINNGradientDescentConfig(
            max_iterations=8000, learning_rate_u=0.01,
            learning_rate_theta=2e-3, alpha_data=100.0,
        ),
    )

    x_eval = point_inputs_dict_order(
        np.stack([mids, np.zeros(3)], axis=1), 2, 1.0
    )
    e_identified = np.asarray(problem.material.young.eval_batch(x_eval))
    e_true = true_young(mids)

    print("element midpoints:", mids)
    print("true E          :", np.round(e_true, 4))
    print("identified E    :", np.round(e_identified, 4))
    print("measured u      :", np.round(measured, 4))
    print("recovered u     :", np.round(result.displacements[1:, 0], 4))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        xs = np.linspace(0, 3, 100)
        ax1.plot(xs, true_young(xs), label="true E(x)")
        ax1.scatter(mids, e_identified, color="crimson", zorder=3,
                    label="identified (element midpoints)")
        ax1.set_xlabel("x [m]"); ax1.set_ylabel("E"); ax1.legend()
        ax1.set_title("Material identification")

        ax2.plot(np.arange(4), u_exact, "o-", label="measured/true u")
        ax2.plot(np.arange(4), result.displacements[:, 0], "s--",
                 label="PINN solution")
        ax2.set_xlabel("node"); ax2.set_ylabel("u_x [m]"); ax2.legend()
        ax2.set_title("Displacement fit")
        fig.tight_layout()
        fig.savefig("pinn_inverse_problem.png", dpi=120)
        print("plot saved: pinn_inverse_problem.png")
    except Exception as e:  # matplotlib optional
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()
