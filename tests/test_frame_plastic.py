"""Frame plastic-hinge pushover (solvers/frame_plastic.py).

Anchors are EXACT plastic-collapse theory — cubic Hermite elements
are exact for nodal loads and each increment is piecewise elastic, so
every number below is machine precision:
  * fixed-fixed beam, midspan P: elastic |M_end| = |M_center| = PL/8,
    all hinges simultaneous, collapse P = 8 Mp/L;
  * propped cantilever, midspan P: first hinge at the fixed end at
    P₁ = 16 Mp/(3L) (elastic 3PL/16), redistribution at rate L/4,
    collapse P = 6 Mp/L;
  * rectangular portal, sway load H at beam level: H_c = 4 Mp/h.
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.frame import FrameProblem
from pinn_fem_tpu.solvers.frame_plastic import frame_pushover

E, A, I = 200e9, 0.01, 1e-4
L, MP = 4.0, 500.0


def _beam(fixed_right=True):
    nodes = np.array([[0.0, 0.0], [L / 2, 0.0], [L, 0.0]])
    elems = np.array([[0, 1], [1, 2]])
    loads = np.zeros(9)
    loads[3 * 1 + 1] = -1.0                 # unit midspan P (down)
    fixed = np.array([0, 1, 2, 6, 7, 8]) if fixed_right \
        else np.array([0, 1, 2, 6, 7])      # prop: u, v only
    return FrameProblem(nodes=nodes, elements=elems, young=E, area=A,
                        inertia=I, density=1.0, loads=loads,
                        fixed_dofs=fixed)


def test_fixed_fixed_beam_simultaneous_collapse():
    """PL/8 at ends AND center: zero redistribution — one elastic
    increment, four simultaneous hinge records (both supports + both
    member ends at the center node), collapse exactly 8 Mp/L."""
    r = frame_pushover(_beam(fixed_right=True), MP)
    assert r.mechanism
    np.testing.assert_allclose(r.collapse_factor, 8.0 * MP / L,
                               rtol=1e-12)
    np.testing.assert_allclose(r.hinge_factors, 8.0 * MP / L,
                               rtol=1e-12)
    assert len(r.hinge_factors) == 4
    # elastic end moments at collapse: |M| = Mp everywhere that hinged
    np.testing.assert_allclose(np.abs(r.end_moments), MP, rtol=1e-12)
    # capacity curve: one elastic segment then the mechanism point
    assert r.load_factors[0] == 0.0
    np.testing.assert_allclose(r.load_factors[-1], 8.0 * MP / L,
                               rtol=1e-12)


def test_propped_cantilever_redistribution():
    """The two-stage classic: fixed-end hinge at 16 Mp/(3L), then the
    propped span redistributes to collapse at 6 Mp/L; the capacity
    curve softens at the first hinge (rate of u_center per λ grows)."""
    r = frame_pushover(_beam(fixed_right=False), MP,
                       probe_dofs=[3 * 1 + 1])
    assert r.mechanism
    np.testing.assert_allclose(r.collapse_factor, 6.0 * MP / L,
                               rtol=1e-12)
    # hinge sequence: fixed end (member 0, end 0) strictly first
    assert (r.hinge_members[0], r.hinge_ends[0]) == (0, 0)
    np.testing.assert_allclose(r.hinge_factors[0], 16.0 * MP / (3 * L),
                               rtol=1e-12)
    assert np.all(r.hinge_factors[1:] > r.hinge_factors[0])
    # piecewise-linear capacity curve with a softening knee
    lam, w = r.load_factors, r.displacements[:, 0]
    assert lam.shape[0] == 3                 # 0, first hinge, collapse
    k1 = abs(w[1] - w[0]) / (lam[1] - lam[0])
    k2 = abs(w[2] - w[1]) / (lam[2] - lam[1])
    assert k2 > 1.5 * k1
    # the elastic stage is the exact propped-cantilever stiffness:
    # w(L/2) = 7 P L^3 / (768 EI)
    np.testing.assert_allclose(abs(w[1]),
                               7.0 * lam[1] * L ** 3 / (768.0 * E * I),
                               rtol=1e-12)


def test_portal_sway_mechanism():
    """Rectangular portal (columns h, beam L, uniform Mp), horizontal
    H at beam level: the sway mechanism H_c = 4 Mp/h."""
    h, span = 3.0, 4.0
    nodes = np.array([[0.0, 0.0], [0.0, h], [span, h], [span, 0.0]])
    elems = np.array([[0, 1], [1, 2], [2, 3]])
    loads = np.zeros(12)
    loads[3 * 1] = 1.0                       # unit H at the top-left
    p = FrameProblem(nodes=nodes, elements=elems, young=E, area=A,
                     inertia=I, density=1.0, loads=loads,
                     fixed_dofs=np.array([0, 1, 2, 9, 10, 11]))
    r = frame_pushover(p, MP)
    assert r.mechanism
    np.testing.assert_allclose(r.collapse_factor, 4.0 * MP / h,
                               rtol=1e-12)
    # sway hinges: both column bases among them
    pairs = set(zip(r.hinge_members.tolist(), r.hinge_ends.tolist()))
    assert (0, 0) in pairs and (2, 1) in pairs


def test_capped_ramp_and_guards():
    p = _beam()
    # cap below the first hinge: no mechanism, elastic curve only
    cap = 0.5 * 8.0 * MP / L
    r = frame_pushover(p, MP, max_load_factor=cap)
    assert not r.mechanism and r.collapse_factor is None
    np.testing.assert_allclose(r.load_factors[-1], cap, rtol=1e-12)
    assert len(r.hinge_factors) == 0
    np.testing.assert_allclose(np.abs(r.end_moments).max(),
                               0.5 * MP, rtol=1e-12)
    with pytest.raises(ValueError, match="positive"):
        frame_pushover(p, -1.0)
    # pure axial pattern never yields: loud refusal without a cap
    pa = FrameProblem(nodes=np.array([[0.0, 0.0], [L, 0.0]]),
                      elements=np.array([[0, 1]]), young=E, area=A,
                      inertia=I, density=1.0,
                      loads=np.array([0, 0, 0, 1.0, 0, 0]),
                      fixed_dofs=np.array([0, 1, 2, 4, 5]))
    with pytest.raises(ValueError, match="axial"):
        frame_pushover(pa, MP)
    # member loads break the proportional-event scaling: refused
    pm = FrameProblem(nodes=np.array([[0.0, 0.0], [L, 0.0]]),
                      elements=np.array([[0, 1]]), young=E, area=A,
                      inertia=I, density=1.0, loads=np.zeros(6),
                      fixed_dofs=np.array([0, 1, 2]),
                      member_loads=[[0.0, -1.0]])
    with pytest.raises(ValueError, match="nodal"):
        frame_pushover(pm, MP)


def test_json_frame_pushover():
    """The JSON tier: propped-cantilever document through
    run_frame_document — collapse factor, hinge records and capacity
    curve all on the closed forms."""
    from pinn_fem_tpu.io.frame_io import run_frame_document

    doc = {
        "element_type": "frame",
        "nodes": [[0, 0], [L / 2, 0], [L, 0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": E, "area": A, "inertia": I,
                     "density": 1.0},
        "loads": [0, 0, 0, 0, -1.0, 0, 0, 0, 0],
        "fixed_dofs": [0, 1, 2, 6, 7],
        "analysis": {"type": "plastic", "plastic_moment": MP,
                     "probe_nodes": [1]},
    }
    out = run_frame_document(doc)
    assert out["success"] and out["analysis"] == "plastic"
    assert out["element_type"] == "frame"
    assert out["mechanism"] is True
    np.testing.assert_allclose(out["collapse_factor"], 6.0 * MP / L,
                               rtol=1e-12)
    assert out["hinges"][0]["member"] == 0
    assert out["hinges"][0]["end"] == 0
    np.testing.assert_allclose(out["hinges"][0]["load_factor"],
                               16.0 * MP / (3 * L), rtol=1e-12)
    disp = np.asarray(out["displacements"])
    assert disp.shape == (3, 3)              # 3 events × 3 probe DOFs
    # Mp required
    bad = dict(doc, analysis={"type": "plastic"})
    with pytest.raises(ValueError, match="plastic_moment"):
        run_frame_document(bad)
