#!/usr/bin/env python3
"""Generate the 16-problem benchmark corpus.

Reproduces the reference benchmark suite's problem definitions
(/root/reference/FEM/python/examples/json/example*.json; inventory in
SURVEY §2.6) programmatically: every problem shares the 4-node / 3-element
horizontal chain (node 0 pinned, all y DOFs fixed, unit end load,
E = A = rho = 1, analytic solution u_x = [0, 1, 2, 3]) and varies the
solver method, NN material fields, measured data, and preconditioning.

Run:  python examples/json/make_corpus.py  [output_dir]
"""

import copy
import json
import sys
from pathlib import Path


def base_problem(n_nodes=4):
    nodes = [
        {"x": float(i), "y": 0.0, "fixed_x": i == 0, "fixed_y": True}
        for i in range(n_nodes)
    ]
    loads = [0.0] * (2 * n_nodes)
    loads[2 * (n_nodes - 1)] = 1.0
    return {
        "nodes": nodes,
        "elements": [[i, i + 1] for i in range(n_nodes - 1)],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": loads,
        "incremental_loading": {"n_increments": 10, "initial": 0.0, "final": 1.0},
        "nn_config": {
            "young": {"enabled": False, "hidden_layers": 2, "neurons_per_layer": 10},
            "area": {"enabled": False, "hidden_layers": 2, "neurons_per_layer": 10},
            "density": {"enabled": False, "hidden_layers": 2, "neurons_per_layer": 10},
        },
    }


def measured_block():
    return {"nodes": [1, 2, 3], "ux": [1.0, 2.0, 3.0], "uy": [0.0, 0.0, 0.0]}


def pinn_config(precond, lr_theta=0.001, max_iterations=5000):
    return {
        "max_iterations": max_iterations,
        "tolerance": 1e-6,
        "learning_rate_u": 0.01,
        "learning_rate_theta": lr_theta,
        "alpha_physics": 1.0,
        "alpha_data": 100.0,
        "print_every": 100,
        "preconditioning": precond,
    }


def nn(enabled, neurons, input_dim=3):
    return {"enabled": enabled, "hidden_layers": 2,
            "neurons_per_layer": neurons, "input_dim": input_dim}


def build_corpus():
    corpus = {}

    # 1 / 1-1: classic Newton-Raphson.
    ex1 = base_problem()
    ex1.update({
        "description": "Example 1: classic FEM, Newton-Raphson, scalar material",
        "solver_type": "fem",
        "solver_config": {"max_iterations": 50, "tolerance": 1e-6},
    })
    corpus["example1"] = ex1

    ex11 = base_problem(n_nodes=2)
    ex11.update({
        "description": "Example 1-1: single element, Newton-Raphson",
        "solver_type": "fem",
        "solver_config": {"max_iterations": 50, "tolerance": 1e-6},
    })
    del ex11["incremental_loading"]
    corpus["example1-1"] = ex11

    # 2 family: GD without NN.
    def gd_example(precond, n_nodes=4):
        ex = base_problem(n_nodes)
        ex.update({
            "description": f"Example 2{'-P' if precond else ''}: forward solve "
                           "via gradient descent (no NN)",
            "solver_type": "pinn-gd",
            "pinn_config": {**pinn_config(precond, max_iterations=10000),
                            "alpha_data": 0.0, "print_every": 10},
        })
        return ex

    corpus["example2"] = gd_example(False)
    corpus["example2-P"] = gd_example(True)
    ex22 = gd_example(False, n_nodes=2)
    ex22["description"] = "Example 2-2: single element, gradient descent"
    corpus["example2-2"] = ex22

    # 3/4 family: PINN-GD inverse with NN fields.
    def pinn_gd_example(n_nets, precond):
        ex = base_problem()
        ex["nn_config"]["young"] = nn(True, 20)
        if n_nets >= 3:
            ex["nn_config"]["area"] = nn(True, 15)
            ex["nn_config"]["density"] = nn(True, 10)
        ex.update({
            "measured_displacements": measured_block(),
            "solver_type": "pinn-gd",
            "pinn_config": pinn_config(
                precond, lr_theta=0.0005 if n_nets >= 3 else 0.001
            ),
        })
        return ex

    for name, (nets, p) in {
        "example3": (1, False), "example3-P": (1, True),
        "example4": (3, False), "example4-P": (3, True),
    }.items():
        ex = pinn_gd_example(nets, p)
        ex["description"] = (
            f"Example {name[7:]}: PINN inverse, {nets} NN field(s), "
            f"preconditioning={'on' if p else 'off'}"
        )
        corpus[name] = ex

    # 5-7 family: hybrid solver.
    def hybrid_example(n_nets, precond):
        ex = base_problem()
        if n_nets >= 1:
            ex["nn_config"]["young"] = nn(True, 20)
            ex["measured_displacements"] = measured_block()
        if n_nets >= 3:
            ex["nn_config"]["area"] = nn(True, 15)
            ex["nn_config"]["density"] = nn(True, 10)
        ex.update({
            "solver_type": "pinn-hybrid",
            "pinn_config": {
                **pinn_config(precond,
                              lr_theta=0.0005 if n_nets >= 3 else 0.001),
                **({"alpha_data": 0.0, "max_iterations": 10000,
                    "print_every": 10} if n_nets == 0 else {}),
            },
        })
        if n_nets == 1:
            ex["pinn_config"]["max_iterations"] = 2000
        return ex

    for name, (nets, p) in {
        "example5": (0, False), "example5-P": (0, True),
        "example6": (1, False), "example6-P": (1, True),
        "example7": (3, False), "example7-P": (3, True),
    }.items():
        ex = hybrid_example(nets, p)
        ex["description"] = (
            f"Example {name[7:]}: hybrid GD->NR, {nets} NN field(s), "
            f"preconditioning={'on' if p else 'off'}"
        )
        corpus[name] = ex

    # 8-10: full Newton-Raphson.
    def full_nr_example(n_nets):
        ex = base_problem()
        if n_nets >= 1:
            ex["nn_config"]["young"] = nn(True, 10 if n_nets == 1 else 20)
        if n_nets >= 3:
            ex["nn_config"]["young"] = nn(True, 20)
            ex["nn_config"]["area"] = nn(True, 15)
            ex["nn_config"]["density"] = nn(True, 10)
        ex.update({
            "solver_type": "fem",
            "solver_config": {"method": "full-nr", "max_iterations": 1000,
                              "tolerance": 1e-6, "n_increments": 10},
            "pinn_config": {"learning_rate_u": 1e-7,
                            "learning_rate_theta": 1e-4,
                            "alpha_physics": 1.0, "alpha_data": 100.0,
                            "tolerance": 1e-6, "max_iterations": 1000},
        })
        return ex

    for name, nets in {"example8": 0, "example9": 1, "example10": 3}.items():
        ex = full_nr_example(nets)
        ex["description"] = (
            f"Example {name[7:]}: full Newton-Raphson, {nets} NN field(s)"
        )
        corpus[name] = ex

    # --- dynamics extension corpus (no reference counterpart: the
    # "analysis" block contract, pinn_fem_tpu/io/analysis.py) -----------
    def tower_base():
        """Small cross-braced 2-story tower, base fixed, lateral top load."""
        nodes, elements = [], []
        for s in range(3):
            nodes += [{"x": 0.0, "y": float(s)}, {"x": 1.0, "y": float(s)}]
        for s in range(2):
            a, b, c, d = 2 * s, 2 * s + 1, 2 * s + 2, 2 * s + 3
            elements += [[a, c], [b, d], [c, d], [a, d], [b, c]]
        for n in nodes[:2]:
            n["fixed"] = True
        loads = [0.0] * 12
        loads[8] = 0.5
        loads[10] = 0.5
        return {
            "nodes": nodes, "elements": elements, "loads": loads,
            "material": {"young": 200.0, "area": 1.0, "density": 1.0},
            "solver_type": "fem",
        }

    dyn = {
        "dyn-modal": {"type": "modal", "n_modes": 4,
                      "include_shapes": True},
        "dyn-transient": {"type": "transient", "dt": "auto",
                          "n_steps": 2000, "record_every": 20,
                          "damping": [0.05, 0.0],
                          "amplitude": {"type": "step"},
                          "probe_nodes": [4, 5]},
        "dyn-buckling": {"type": "buckling", "n_modes": 2},
        "dyn-harmonic": {"type": "harmonic", "damping": [0.05, 0.001],
                         "omegas": {"start": 0.5, "stop": 12.0,
                                    "num": 120},
                         "probe_nodes": [4]},
        "dyn-spectrum": {"type": "spectrum", "sa": 2.0,
                         "direction": [1.0, 0.0], "n_modes": 4,
                         "combination": "cqc"},
    }
    # Arc-length continuation: the von Mises two-bar snap-through (exact
    # limit load 2 E A g(h(1-1/sqrt3))/L0^3; tests/test_riks.py).
    corpus["dyn-continuation"] = {
        "description": "Dynamics corpus: arc-length snap-through of the "
                       "von Mises two-bar truss (extension)",
        "nodes": [[-1.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
        "elements": [[0, 2], [1, 2]],
        "loads": [0, 0, 0, 0, 0, -1.0],
        "fixed_dofs": [0, 1, 2, 3, 4],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "solver_type": "fem",
        "analysis": {"type": "continuation", "n_steps": 400,
                     "initial_dlambda": 0.01, "stop_lambda_abs": 0.5,
                     "probe_nodes": [2]},
    }

    # Time-domain identification: E and rho recovered from a synthetic
    # tip trajectory (density is invisible to statics; the discrete
    # adjoint through the integrator sees it — tests/test_transient_
    # inverse.py uses the same chain and converges to 2% in 400 iters).
    corpus["dyn-identification"] = {
        "description": "Dynamics corpus: time-domain identification of "
                       "Young's modulus and density from a synthetic "
                       "probe trajectory (extension; discrete adjoint)",
        "nodes": [[0.0], [1.0], [2.0], [3.0], [4.0]],
        "elements": [[0, 1], [1, 2], [2, 3], [3, 4]],
        "loads": [0.0, 0.0, 0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "solver_type": "fem",
        "analysis": {"type": "identification", "dt": 0.05,
                     "n_steps": 400, "params": ["young", "density"],
                     "synthetic": {"young": 2.0, "density": 3.0},
                     "probe_nodes": [2, 4], "damping": [0.05, 0.0],
                     "n_iter": 400, "learning_rate": 0.1},
    }

    # Modal-domain identification: the EMA workflow — E and rho from
    # extracted frequencies + phi^2 sensor data (the spectrum alone only
    # sees EA/rho; the sensors break the scaling degeneracy).
    corpus["dyn-identification-modal"] = {
        "description": "Dynamics corpus: modal-domain identification of "
                       "E and rho from extracted natural frequencies "
                       "plus phi^2 sensor data (extension; "
                       "differentiable eigensolve)",
        "nodes": [[float(i)] for i in range(7)],
        "elements": [[i, i + 1] for i in range(6)],
        "loads": [0.0] * 6 + [1.0],
        "fixed_dofs": [0],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "solver_type": "fem",
        "analysis": {"type": "identification", "domain": "modal",
                     "params": ["young", "density"],
                     "synthetic": {"young": 2.0, "density": 3.0,
                                   "n_modes": 4},
                     "sensor_nodes": [2, 4, 6],
                     "n_iter": 600, "learning_rate": 0.05},
    }

    # Frequency-domain identification: E, rho AND the Rayleigh damping
    # pair fitted to a synthetic FRF amplitude sweep (model updating
    # from shaker data; resonance positions pin stiffness/mass, peak
    # widths pin the damping).
    corpus["dyn-identification-frf"] = {
        "description": "Dynamics corpus: frequency-domain identification "
                       "of E, rho, alpha, beta from an FRF amplitude "
                       "sweep (extension; differentiable harmonic "
                       "forward model)",
        "nodes": [[0.0], [1.0], [2.0], [3.0], [4.0]],
        "elements": [[0, 1], [1, 2], [2, 3], [3, 4]],
        "loads": [0.0, 0.0, 0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "solver_type": "fem",
        "analysis": {"type": "identification", "domain": "frequency",
                     "omegas": {"start": 0.05, "stop": 1.2, "num": 120},
                     "params": ["young", "density", "alpha", "beta"],
                     "synthetic": {"young": 2.0, "density": 3.0,
                                   "alpha": 0.08, "beta": 0.02},
                     "probe_nodes": [2, 4], "damping": [0.02, 0.005],
                     "n_iter": 800, "learning_rate": 0.08},
    }

    # Field-mode identification: a linear E(x) profile recovered as an
    # MLP field from four probes' transient histories (the reference's
    # NN-property inverse driven by dynamics — a wave sweeping the chain
    # interrogates each element's stiffness in sequence).
    n = 9
    mids = [0.5 + i for i in range(n - 1)]
    corpus["dyn-identification-field"] = {
        "description": "Dynamics corpus: spatial E(x) profile identified "
                       "as an MLP field from transient probe histories "
                       "(extension; discrete adjoint, field mode)",
        "nodes": [[float(i)] for i in range(n)],
        "elements": [[i, i + 1] for i in range(n - 1)],
        "loads": [0.0] * (n - 1) + [1.0],
        "fixed_dofs": [0],
        "material": {"young": 1.5, "area": 1.0, "density": 1.0},
        "solver_type": "fem",
        "analysis": {"type": "identification",
                     "field": {"name": "young", "hidden_layers": 1,
                               "neurons_per_layer": 8, "input_dim": 1,
                               "scale": 1.5, "seed": 0},
                     "dt": 0.05, "n_steps": 600,
                     "synthetic": {"young": [1.0 + m / mids[-1]
                                             for m in mids]},
                     "probe_nodes": [2, 4, 6, 8], "damping": [0.05, 0.0],
                     "n_iter": 800, "learning_rate": 0.05,
                     "include_fit": False},
    }

    for name, analysis in dyn.items():
        ex = tower_base()
        if name == "dyn-buckling":
            loads = [0.0] * 12
            loads[9] = -1.0   # axial compression of both columns
            loads[11] = -1.0
            ex["loads"] = loads
        ex["analysis"] = analysis
        ex["description"] = (
            f"Dynamics corpus: {analysis['type']} analysis of a braced "
            "tower (extension; analysis-block contract)"
        )
        corpus[name] = ex

    return corpus


def main():
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(__file__).parent
    out_dir.mkdir(parents=True, exist_ok=True)
    corpus = build_corpus()
    for name, problem in corpus.items():
        path = out_dir / f"{name}.json"
        path.write_text(json.dumps(problem, indent=2))
        print(f"wrote {path}")
    print(f"{len(corpus)} problems")


if __name__ == "__main__":
    main()
