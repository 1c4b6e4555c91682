"""Prestressed modal analysis on the plane/solid/frame families:
K + K_g(σ(u0)) eigensolves (models/*.py prestress_u).

THE anchor is the vibration-buckling link: K + s·K_g(u0) loses
positive definiteness exactly at the family's own buckling factor
(K_g is linear in the stress of u0), so the fundamental frequency

  * falls monotonically with compressive prestress,
  * crosses zero at s = λ_cr (secant estimate pinned against the
    family's buckling solver),
  * and rises under tension (negative scale here = load reversal).
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.frame import (FrameProblem, frame_buckling,
                                       frame_modal, solve_frame_static)
from pinn_fem_tpu.models.plane import (PlaneProblem, edge_load,
                                       plane_buckling, plane_modal,
                                       rect_mesh, solve_plane_static)
from pinn_fem_tpu.models.solid import (SolidProblem, boundary_quads,
                                       box_mesh, solid_buckling,
                                       solid_modal, solve_solid_static,
                                       surface_load)

E, NU, RHO = 200.0, 0.3, 2.0


def plane_column():
    """Slender plane-stress column, bottom clamped, axial compression
    on the top edge."""
    nodes, elems = rect_mesh(0.5, 6.0, 1, 12, "quad")
    bottom = np.flatnonzero(nodes[:, 1] == 0.0)
    fixed = np.concatenate([2 * bottom, 2 * bottom + 1])
    top = np.flatnonzero(nodes[:, 1] == 6.0)
    loads = edge_load(nodes, top[np.argsort(nodes[top, 0])],
                      [0.0, -0.05], 0.5)
    return PlaneProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, thickness=0.5, density=RHO,
                        loads=loads, fixed_dofs=fixed)


def frame_column():
    nodes = np.array([[0.0, 1.0 * i] for i in range(7)])
    elems = np.stack([np.arange(6), np.arange(1, 7)], 1)
    loads = np.zeros(21)
    loads[3 * 6 + 1] = -0.1
    return FrameProblem(nodes=nodes, elements=elems, young=E,
                        area=0.4, inertia=0.001, density=RHO,
                        loads=loads, fixed_dofs=np.array([0, 1, 2]))


def solid_column():
    nodes, elems = box_mesh(0.5, 0.5, 6.0, 1, 1, 10)
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    fixed = np.concatenate([3 * bot, 3 * bot + 1, 3 * bot + 2])
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=NU,
                     density=RHO, loads=np.zeros(3 * nodes.shape[0]),
                     fixed_dofs=fixed)
    loads = surface_load(nodes, boundary_quads(p, 2, +1),
                         [0.0, 0.0, -0.05])
    return SolidProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, density=RHO, loads=loads,
                        fixed_dofs=fixed)


CASES = [
    ("plane", plane_column, solve_plane_static, plane_modal,
     plane_buckling),
    ("frame", frame_column, solve_frame_static, frame_modal,
     frame_buckling),
    ("solid", solid_column, solve_solid_static, solid_modal,
     solid_buckling),
]


@pytest.mark.parametrize("name,make,static,modal,buckling", CASES)
def test_vibration_buckling_link(name, make, static, modal, buckling):
    p = make()
    u0 = static(p).displacements
    lam_cr = float(buckling(p, n_modes=2).load_factors[0])
    assert lam_cr > 0.0

    def lam1(s):
        return float(modal(p, n_modes=1,
                           prestress_u=s * u0).eigenvalues[0])

    base = lam1(0.0)
    np.testing.assert_allclose(lam1(0.0),
                               float(modal(p, n_modes=1)
                                     .eigenvalues[0]), rtol=1e-12)
    # monotone softening under compression, stiffening under tension
    vals = [lam1(s * lam_cr) for s in (0.0, 0.3, 0.6, 0.9)]
    assert all(a > b > 0.0 for a, b in zip(vals, vals[1:])), vals
    assert lam1(-0.5 * lam_cr) > base
    # the zero crossing of λ₁(s) IS the buckling factor: secant
    # estimate from the two bracketing samples lands on λ_cr.
    s1, s2 = 0.80 * lam_cr, 0.95 * lam_cr
    l1, l2 = lam1(s1), lam1(s2)
    s_zero = s1 - l1 * (s2 - s1) / (l2 - l1)
    np.testing.assert_allclose(s_zero, lam_cr, rtol=5e-2)
    # past the factor the pencil is indefinite — the clamped λ is 0
    assert lam1(1.1 * lam_cr) == 0.0


def test_json_prestressed_modal_all_families():
    from pinn_fem_tpu.io.frame_io import run_frame_document
    from pinn_fem_tpu.io.plane_io import run_plane_document
    from pinn_fem_tpu.io.solid_io import run_solid_document

    pdoc = {
        "element_type": "plane",
        "mesh": {"type": "rect", "width": 0.5, "height": 6.0,
                 "nx": 1, "ny": 12, "element": "quad"},
        "material": {"young": E, "poisson": NU, "thickness": 0.5,
                     "density": RHO},
        "fixed_nodes": "bottom",
        "edge_loads": [{"nodes": "top", "traction": [0.0, -0.05]}],
        "analysis": {"type": "modal", "n_modes": 2,
                     "include_shapes": False,
                     "prestress": {"scale": 0.5}},
    }
    out = run_plane_document(pdoc)
    assert out["success"] and out["prestressed"] is True
    pdoc["analysis"]["prestress"] = None
    base = run_plane_document(pdoc)
    assert base["prestressed"] is False
    # the 0.5-scale state is compressive: f1 must drop
    assert out["frequencies_hz"][0] < base["frequencies_hz"][0]

    sp = solid_column()
    sdoc = {
        "element_type": "solid",
        "nodes": sp.nodes.tolist(), "elements": sp.elements.tolist(),
        "material": {"young": E, "poisson": NU, "density": RHO},
        "fixed_dofs": sp.fixed_dofs.tolist(),
        "loads": sp.loads.tolist(),
        "analysis": {"type": "modal", "n_modes": 1,
                     "include_shapes": False, "prestress": True},
    }
    sout = run_solid_document(sdoc)
    assert sout["success"] and sout["prestressed"] is True
    sdoc["analysis"]["banded"] = True
    with pytest.raises(ValueError, match="dense host"):
        run_solid_document(sdoc)

    fr = frame_column()
    fdoc = {
        "element_type": "frame",
        "nodes": fr.nodes.tolist(), "elements": fr.elements.tolist(),
        "material": {"young": E, "area": 0.4, "inertia": 0.001,
                     "density": RHO},
        "fixed_nodes": [0],
        "loads": fr.loads.tolist(),
        "analysis": {"type": "modal", "n_modes": 1,
                     "include_shapes": False,
                     "prestress": {"u": solve_frame_static(fr)
                                   .displacements.tolist()}},
    }
    fout = run_frame_document(fdoc)
    assert fout["success"] and fout["prestressed"] is True
