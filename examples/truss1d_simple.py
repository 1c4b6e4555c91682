#!/usr/bin/env python3
"""1D bar, both ends fixed, point load at an interior node.

Parity with /root/reference/FEM/python/examples/truss1d_simple.py: solves a
4-node clamped-clamped bar with F = 1000 N at node 2 and checks the
reactions against the analytic split R_left = -F (L - a)/L, R_right = -F a/L.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import numpy as np

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.solvers.legacy import LegacySolverConfig, solve_incremental_newton


def main():
    length = 3.0
    nodes = np.linspace(0.0, length, 4)
    problem = TrussProblem(
        nodes=nodes,
        elements=np.array([[0, 1], [1, 2], [2, 3]]),
        material=Material(young=210e9, area=0.01, density=7850.0),
        loads=np.array([0.0, 0.0, 1000.0, 0.0]),
        fixed_dofs=np.array([0, 3]),
        dimension=1,
    )

    result = solve_incremental_newton(problem, LegacySolverConfig())
    u = result.displacements.reshape(-1)
    reactions = result.reactions.reshape(-1)

    print("Displacements [m]:", u)
    print("Reactions [N]:   ", reactions)

    a = nodes[2]
    r_left_exact = -1000.0 * (length - a) / length
    r_right_exact = -1000.0 * a / length
    print(f"Analytic reactions: left {r_left_exact:.1f} N, right {r_right_exact:.1f} N")

    balance = reactions.sum() + 1000.0
    print(f"Equilibrium check sum(R) + F = {balance:.3e} N")
    assert abs(balance) < 1.0
    assert np.isclose(reactions[0], r_left_exact, rtol=1e-3)
    assert np.isclose(reactions[3], r_right_exact, rtol=1e-3)
    print("OK")


if __name__ == "__main__":
    main()
