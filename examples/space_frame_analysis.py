#!/usr/bin/env python3
"""3D space-frame family demo: a guyed-mast-style lattice tower and
the textbook grillage.

Everything the 2D families cannot express — torsion, biaxial bending,
out-of-plane action — on two canonical structures:

1. GRILLAGE: right-angle balcony beam under a vertical tip load; the
   deflection splits EXACTLY into bending of both legs plus the
   torsion of the clamped leg driven by the lever moment
   (δ = PL₁³/3EI + PL₂³/3EI + PL₂²L₁/GJ — machine precision with two
   elements, tests/test_frame3d.py pins it).
2. TOWER STATIC: a vertical cantilever mast under lateral wind + an
   antenna eccentricity torque — the weak/strong-axis split and the
   TL/GJ twist, both exact identities.
3. TOWER MODAL + BUCKLING: the interleaved weak/strong bending
   families (frequency ratio √(I_z/I_y)) and the weak-axis Euler
   factor with its strong-axis twin at exactly I_z/I_y.

Run: python examples/space_frame_analysis.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pinn_fem_tpu.models.frame3d import (SpaceFrameProblem,
                                         solve_space_frame_static,
                                         space_frame_buckling,
                                         space_frame_modal)

E, G, A, IY, IZ, J, RHO = 200.0, 80.0, 1.0, 0.02, 0.05, 0.03, 1.2


def grillage():
    l1, l2, p = 3.0, 2.0, 1.0
    nodes = np.array([[0.0, 0.0, 0.0], [l1, 0.0, 0.0], [l1, l2, 0.0]])
    elements = np.array([[0, 1], [1, 2]])
    loads = np.zeros(18)
    loads[14] = -p
    prob = SpaceFrameProblem(nodes, elements, E, A, IY, IZ, J, RHO,
                             loads, np.arange(6), shear_modulus=G)
    st = solve_space_frame_static(prob)
    exact = -(p * l1 ** 3 / (3 * E * IY) + p * l2 ** 3 / (3 * E * IY)
              + p * l2 ** 2 * l1 / (G * J))
    print("== Grillage (bending + lever torsion) ==")
    print(f"  w_C computed {st.displacements[14]:+.9f}")
    print(f"  w_C exact    {exact:+.9f}")
    print(f"  leg-AB torque {st.torque[0]:+.6f} (lever P*L2 = "
          f"{p * l2})")
    assert abs(st.displacements[14] - exact) < 1e-12 * abs(exact)


def tower(n=10, h=8.0):
    nodes = np.stack([np.zeros(n + 1), np.zeros(n + 1),
                      np.linspace(0.0, h, n + 1)], axis=1)
    elements = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    loads = np.zeros(6 * (n + 1))
    return SpaceFrameProblem(nodes, elements, E, A, IY, IZ, J, RHO,
                             loads, np.arange(6), shear_modulus=G), n, h


def tower_static():
    prob, n, h = tower()
    prob.loads[6 * n + 0] = 1.0          # lateral wind resultant
    prob.loads[6 * n + 5] = 0.4          # antenna eccentricity torque
    st = solve_space_frame_static(prob)
    print("== Tower static (wind + eccentric antenna torque) ==")
    tip = st.displacements[6 * n + 0]
    twist = st.displacements[6 * n + 5]
    # The vertical-member convention makes global X a principal
    # direction; the tower bends about ONE principal axis exactly.
    ei = E * np.array([IY, IZ])
    print(f"  tip sway  {tip:.6f} (PL3/3EI candidates "
          f"{h ** 3 / (3 * ei)})")
    print(f"  tip twist {twist:.6f} (TL/GJ = "
          f"{0.4 * h / (G * J):.6f})")
    assert abs(twist - 0.4 * h / (G * J)) < 1e-9
    assert np.any(np.isclose(tip, h ** 3 / (3 * ei), rtol=1e-9))


def tower_dynamics():
    prob, n, h = tower()
    mo = space_frame_modal(prob, n_modes=4)
    print("== Tower modal (interleaved bending families) ==")
    print(f"  f (Hz): {np.round(mo.frequencies_hz, 5)}")
    ratio = mo.frequencies_hz[1] / mo.frequencies_hz[0]
    print(f"  f2/f1 = {ratio:.6f} (sqrt(Iz/Iy) = "
          f"{np.sqrt(IZ / IY):.6f})")
    assert abs(ratio - np.sqrt(IZ / IY)) < 1e-4

    prob.loads[6 * n + 2] = -1.0         # axial gravity resultant
    bk = space_frame_buckling(prob, n_modes=2)
    euler = np.pi ** 2 * E * IY / (4.0 * h ** 2)
    print("== Tower buckling (weak axis first) ==")
    print(f"  lambda = {np.round(bk.load_factors, 4)} "
          f"(Euler weak {euler:.4f}, strong twin x{IZ / IY})")
    assert abs(bk.load_factors[0] - euler) < 2e-3 * euler
    assert abs(bk.load_factors[1] / bk.load_factors[0]
               - IZ / IY) < 1e-6


def main():
    grillage()
    tower_static()
    tower_dynamics()
    print("space-frame demo OK")


if __name__ == "__main__":
    main()
