"""Layered elastoplastic flat-facet shells (ops/shell_plastic.py +
solvers/shell_plasticity.py).

Anchor set (module docstring of ops/shell_plastic.py for the layered
membrane+bending algebra):

  * ELASTIC exactness: the layered membrane rigidity is EXACT for any
    N (Σ w = t) and the bending rigidity is exactly (1 - 1/N²) D_b —
    machine precision on the constant-strain / constant-curvature
    patch states, with D_mb ≡ 0 while every layer is elastic.
  * FLAT-MESH 1:1 with the plate family: a pure transverse load on a
    flat mesh keeps eps_m = 0, the odd-in-z return map gives N = 0
    and D_mb = 0 at every iterate, so the shell Newton path IS the
    plate Newton path (measured 7e-11 max displacement difference on
    the 0.98 Mp strip) and the 1.03 Mp bracket fails identically.
  * MEMBRANE closed form: a determinate uniaxial strip with linear
    isotropic hardening lands on u = L(σ/E + (σ-σ_y)/H) to machine
    precision (the uniaxial return map is exact; free lateral edges
    make the stress state exactly uniaxial).
  * N-M INTERACTION m + n² = 1 (the coupling no uncoupled family
    reproduces): at the KERNEL level the return map approaches the
    uniaxial ±σ_y profile asymptotically under a lateral-contraction
    -consistent strain profile ε(z) ∝ (1, -1/2, 0) — measured
    m + n² = 0.9870 at 50× yield strain and 0.99867 at 500×, the
    O(1/scale) rate of the ops/shell_plastic.py docstring; at the
    SOLVER level the clamped 4-element strip at n = 0.5 carries
    m = 0.75 (= 1 - n²) and refuses m = 0.80 (the discrete limit's
    usual small overshoot band, ≤ 4% here).
  * Host float64 and jitted device tiers agree (same constitutive
    code via xp; f32 tolerances).

The reference (rpacheco-blazquez/PINN-FEM) has no shells and no
plasticity (SURVEY §2 — linear axial trusses only).
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.plate import (PlateProblem, plate_supports,
                                       rect_mesh)
from pinn_fem_tpu.models.shell import ShellProblem, solve_shell_static
from pinn_fem_tpu.solvers.plate_plasticity import solve_plate_plastic
from pinn_fem_tpu.solvers.shell_plasticity import solve_shell_plastic

E, T, SY = 200e3, 0.1, 300.0
N = 20
MP = SY * T * T / 4.0
NT = SY * T
D = E * T**3 / 12.0

_MEM = np.array([6 * a + d for a in range(4) for d in (0, 1)])
_BND = np.array([6 * a + d for a in range(4) for d in (2, 3, 4)])


def flat_strip(length=4.0, nx=4, width=1.0):
    """Flat x-y strip (z = 0) with a fully clamped left edge: nodes,
    elements, left/right node index arrays, fixed dof list."""
    nodes2d, elems = rect_mesh(length, width, nx, 1, element="quad")
    nodes = np.column_stack([nodes2d, np.zeros(len(nodes2d))])
    left = np.flatnonzero(nodes[:, 0] < 1e-9)
    right = np.flatnonzero(np.abs(nodes[:, 0] - length) < 1e-9)
    fixed = np.concatenate([6 * left + d for d in range(6)])
    return nodes, elems, left, right, fixed


def bending_shell(m_frac, n_frac=0.0, nx=4):
    """Clamped strip with a right-edge moment (about y, the plate
    conjugation sign) and optional axial force — the combined-action
    capacity configuration."""
    nodes, elems, left, right, fixed = flat_strip(nx=nx)
    loads = np.zeros(6 * len(nodes))
    loads[6 * right + 0] = n_frac * NT / right.size
    loads[6 * right + 4] = -m_frac * MP / right.size
    return ShellProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=1.0,
                        loads=loads, fixed_dofs=fixed)


def plate_twin(m_frac, nx=4):
    """The plate family's bending_strip with the same mesh — the
    flat-mesh 1:1 mirror (plate (w, βx, βy) loads with βx = -θy)."""
    nodes, elems = rect_mesh(4.0, 1.0, nx, 1, element="quad")
    fixed = plate_supports(nodes, "left", "clamped")
    right = np.flatnonzero(np.abs(nodes[:, 0] - 4.0) < 1e-9)
    loads = np.zeros(3 * len(nodes))
    loads[3 * right + 1] = m_frac * MP / right.size
    return PlateProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=1.0,
                        loads=loads, fixed_dofs=fixed)


def test_elastic_patch_rigidities_exact():
    """Sub-yield constant-moment strip: layered bending rigidity is
    exactly (1 - 1/N²) D (tip rotation θy = κL to 1e-10), membrane
    forces vanish, moments recover the applied value."""
    m_frac = 0.5
    p = bending_shell(m_frac)
    r = solve_shell_plastic(p, SY, n_layers=N, load_factors=[1.0],
                            tol=1e-12)
    assert r.converged and r.n_plastic[-1] == 0
    right = np.flatnonzero(np.abs(p.nodes[:, 0] - 4.0) < 1e-9)
    kap = -r.displacements[-1][6 * right[0] + 4] / 4.0
    np.testing.assert_allclose(
        kap, m_frac * MP / ((1.0 - 1.0 / N**2) * D), rtol=1e-10)
    np.testing.assert_allclose(np.abs(r.moments[-1][:, 0]),
                               m_frac * MP, rtol=1e-10)
    assert np.abs(r.membrane_forces[-1]).max() < 1e-10 * NT


def test_membrane_hardening_closed_form():
    """Determinate uniaxial strip, linear isotropic hardening
    H = E/10, σ = 1.2 σ_y: tip displacement lands on the uniaxial
    closed form u = L(σ/E + (σ-σ_y)/H) to machine precision, and the
    recovered membrane force is exactly σt.  Minimal supports leave
    the lateral edges FREE so plastic contraction keeps the stress
    state exactly uniaxial (a fully clamped edge would not)."""
    h_iso = E / 10.0
    sig = 1.2 * SY
    nodes = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                      [1.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    elems = np.array([[0, 1, 2, 3]])
    left = np.array([0, 3])
    fixed = (list(6 * left + 0) + list(6 * left + 2)
             + list(6 * left + 3) + list(6 * left + 4)
             + [6 * 0 + 1] + list(6 * left + 5))
    loads = np.zeros(24)
    loads[6 * np.array([1, 2]) + 0] = sig * T / 2.0
    p = ShellProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=T, density=1.0,
                     loads=loads, fixed_dofs=np.array(fixed))
    r = solve_shell_plastic(p, SY, hardening_iso=h_iso, n_layers=N,
                            load_factors=np.linspace(0.25, 1.0, 4),
                            tol=1e-12, max_iter=40)
    assert r.converged
    np.testing.assert_allclose(
        r.displacements[-1][6 * 1 + 0],
        sig / E + (sig - SY) / h_iso, rtol=1e-10)
    np.testing.assert_allclose(r.membrane_forces[-1][0, 0], sig * T,
                               rtol=1e-10)
    # EPP-with-hardening: vm = σ exactly (uniaxial, determinate).
    np.testing.assert_allclose(r.von_mises[-1][0], sig, rtol=1e-10)


def test_flat_bending_matches_plate_family():
    """Pure transverse action on a flat mesh: eps_m stays 0, the
    odd-in-z return map keeps N = 0 and D_mb = 0 at every iterate, so
    the shell traces the plate family's Newton path 1:1 — and the
    1.03 Mp bracket fails in both families."""
    lfs = np.linspace(0.2, 1.0, 9)
    rp = solve_plate_plastic(plate_twin(0.98), SY, n_layers=N,
                             load_factors=lfs, tol=1e-9, max_iter=60)
    rs = solve_shell_plastic(bending_shell(0.98), SY, n_layers=N,
                             load_factors=lfs, tol=1e-9, max_iter=60)
    assert rp.converged and rs.converged
    wp = rp.displacements[-1][0::3]
    ws = rs.displacements[-1][2::6]
    np.testing.assert_allclose(ws, wp, atol=1e-8 * np.abs(wp).max())
    assert np.abs(rs.membrane_forces[-1]).max() < 1e-9 * NT
    # EPP: the exact return map never exceeds the yield surface.
    assert rs.von_mises.max() <= SY * (1.0 + 1e-9)

    rp2 = solve_plate_plastic(plate_twin(1.03), SY, n_layers=N,
                              load_factors=lfs, tol=1e-9, max_iter=60)
    rs2 = solve_shell_plastic(bending_shell(1.03), SY, n_layers=N,
                              load_factors=lfs, tol=1e-9, max_iter=60)
    assert not rp2.converged and not rs2.converged


def test_nm_interaction_kernel_asymptotic():
    """The rectangular-section interaction surface at the kernel
    level: a fully plastic strain profile ε(z) = (ε_m + zκ)(1, -1/2,
    0) with the neutral axis z₀ = -t/4 ON a layer boundary must give
    n = 0.5, m = 1 - n² = 0.75.  The radial return reaches the
    uniaxial state at rate O(1/scale) (ops/shell_plastic.py), so the
    identity is pinned at 500× yield strain with the measured
    tolerance AND the measured rate (the 50× error must shrink ~10×,
    not plateau)."""
    from pinn_fem_tpu.ops.shell_plastic import (initial_shell_state,
                                                shell_gp_geometry,
                                                shell_plastic_blocks)

    nodes = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                      [1.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    p = ShellProblem(nodes=nodes, elements=np.array([[0, 1, 2, 3]]),
                     young=E, poisson=0.0, thickness=T, density=1.0,
                     loads=np.zeros(24), fixed_dofs=np.array([0]))
    geo = shell_gp_geometry(p)
    _, bm, bb, _, _, _ = geo
    ey = SY / E

    def interaction_error(scale):
        kap = scale * ey / (T / 2.0)
        em = kap * T / 4.0                          # z0 = -t/4
        xm, *_ = np.linalg.lstsq(
            bm[0].reshape(12, 8),
            np.tile(em * np.array([1.0, -0.5, 0.0]), 4), rcond=None)
        xb, *_ = np.linalg.lstsq(
            bb[0].reshape(12, 12),
            np.tile(kap * np.array([1.0, -0.5, 0.0]), 4), rcond=None)
        u_e = np.zeros((1, 24))
        u_e[0, _MEM] = xm
        u_e[0, _BND] = xb
        _, _, nres, mom, _, _ = shell_plastic_blocks(
            *geo, p.thickness, u_e, initial_shell_state(1, N),
            p.young, p.poisson, np.full(1, SY), np.zeros(1),
            np.zeros(1), N)
        n_ = nres[0, 0] / NT
        m_ = mom[0, 0] / MP
        return n_, m_, abs(m_ + n_**2 - 1.0)

    n50, m50, err50 = interaction_error(50.0)
    n500, m500, err500 = interaction_error(500.0)
    # measured: err50 = 1.30e-2, err500 = 1.33e-3 (O(1/scale)).
    np.testing.assert_allclose(n500, 0.5, atol=1e-3)
    np.testing.assert_allclose(m500, 0.75, atol=2e-3)
    assert err500 < 2e-3
    assert err500 < 0.15 * err50


def test_nm_interaction_capacity_bracket():
    """Solver-level N-M interaction on the clamped strip: with the
    axial force at n = 0.5 riding the same proportional ramp, the
    section carries the interaction moment m = 1 - n² = 0.75 and
    refuses m = 0.80 (measured capacity between 0.75 and 0.78 — the
    discrete limit's usual small overshoot, converging from above).
    An uncoupled family would carry the full m = 1 at any n < 1."""
    lfs = np.linspace(0.2, 1.0, 9)
    r_in = solve_shell_plastic(bending_shell(0.75, n_frac=0.5), SY,
                               n_layers=N, load_factors=lfs,
                               tol=1e-9, max_iter=60)
    assert r_in.converged
    assert r_in.n_plastic[-1] > 0
    np.testing.assert_allclose(r_in.membrane_forces[-1][:, 0],
                               0.5 * NT, rtol=1e-9)
    r_out = solve_shell_plastic(bending_shell(0.80, n_frac=0.5), SY,
                                n_layers=N, load_factors=lfs,
                                tol=1e-9, max_iter=60)
    assert not r_out.converged


def test_curved_subyield_matches_static():
    """Sub-yield cylinder panel under normal pressure: the layered
    solver reproduces the linear-elastic shell solve within the
    (1 - 1/N²) bending-softening band, with zero plastic activity —
    the elastic limit of the layered kernel IS the uncoupled
    membrane ⊕ plate facet of models/shell.py."""
    from pinn_fem_tpu.models.shell import cylinder_panel_mesh

    nodes, elems = cylinder_panel_mesh(25.0, 10.0, 30.0, 6, 4)
    ymin = np.flatnonzero(nodes[:, 1] < 1e-9)
    fixed = np.concatenate([6 * ymin + d for d in range(6)])
    p = ShellProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=0.25, density=1.0,
                     loads=np.zeros(6 * len(nodes)), fixed_dofs=fixed,
                     pressure=0.5)
    st = solve_shell_static(p)
    r = solve_shell_plastic(p, sigma_y=1e7, n_layers=N,
                            load_factors=[1.0], tol=1e-11)
    assert r.converged and r.n_plastic[-1] == 0
    scale = np.abs(st.displacements).max()
    assert np.abs(r.displacements[-1] - st.displacements).max() \
        < (2.0 / N**2) * scale


def test_load_unload_residual_state():
    """Ramp the clamped strip past yield and unload: committed
    plastic strains persist, unloading is elastic, and the residual
    state is self-equilibrated with vm strictly inside the yield
    surface after springback."""
    lfs = [0.4, 0.8, 0.98, 0.0]
    r = solve_shell_plastic(bending_shell(1.0), SY, n_layers=N,
                            load_factors=lfs, tol=1e-9, max_iter=60)
    assert r.converged
    assert r.eq_plastic[-1].max() > 0
    np.testing.assert_allclose(r.eq_plastic[-1], r.eq_plastic[-2],
                               rtol=1e-12)
    assert np.abs(r.displacements[-1][2::6]).max() > 1e-4
    assert r.von_mises[-1].max() < 0.8 * SY


def test_host_device_mirror():
    """Host f64 vs jitted device scan through a plastic load/unload
    history with combined membrane + bending action — the same
    xp-parameterized constitutive code, f32 tolerances (the plate
    family's pin, carried over with the membrane coupling active)."""
    nodes, elems, left, right, fixed = flat_strip(length=2.0, nx=2)
    loads = np.zeros(6 * len(nodes))
    loads[6 * right + 0] = 0.4 * NT / right.size
    loads[6 * right + 4] = -0.6 * MP / right.size
    p = ShellProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=T, density=1.0,
                     loads=loads, fixed_dofs=fixed)
    kw = dict(sigma_y=SY, hardening_iso=E / 20.0,
              hardening_kin=E / 50.0, n_layers=4,
              load_factors=[0.6, 1.0, 0.2])
    h = solve_shell_plastic(p, host=True, **kw)
    d = solve_shell_plastic(p, host=False, **kw)
    assert h.converged and d.converged
    np.testing.assert_allclose(h.displacements, d.displacements,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(h.von_mises, d.von_mises, rtol=2e-3,
                               atol=2e-5 * SY)
    np.testing.assert_allclose(h.eq_plastic, d.eq_plastic, rtol=2e-3,
                               atol=2e-7)


def test_json_tier_shell_plastic():
    """The shell plastic JSON block end-to-end (io/shell_io.py): the
    clamped flat strip ramped through yield with explicit nodes and
    named supports — membrane coupling fields present, EPP fiber
    stress pinned at sigma_y, probe payload aligned."""
    from pinn_fem_tpu.io.shell_io import run_shell_document

    nodes, elems, left, right, fixed = flat_strip()
    doc = {
        "element_type": "shell",
        "nodes": nodes.tolist(),
        "elements": elems.tolist(),
        "material": {"young": E, "poisson": 0.0, "thickness": T,
                     "density": 1.0},
        "supports": [{"nodes": "x_min",
                      "dofs": [0, 1, 2, 3, 4, 5]}],
        "point_loads": [[int(nd), 4, -0.98 * MP / right.size]
                        for nd in right],
        "analysis": {"type": "plastic", "sigma_y": SY, "n_layers": N,
                     "load_factors": [0.2, 0.5, 0.8, 1.0],
                     "probe_nodes": [int(right[0])]},
    }
    out = run_shell_document(doc)
    assert out["success"] and out["analysis"] == "plastic"
    assert out["element_type"] == "shell" and out["n_layers"] == N
    assert out["max_residual"] < 1e-8
    d = np.asarray(out["displacements"])
    assert d.shape == (4, 6)
    # Fully plastic by the last step; EPP fiber stress at sigma_y.
    assert len(out["yielded_elements"]) == 4
    np.testing.assert_allclose(max(out["max_von_mises"]), SY,
                               rtol=1e-9)
    # Secant softens past yield (the capacity-curve signal).
    lf = np.asarray(out["load_factors"])
    w = np.abs(d[:, 2])
    assert w[-1] / lf[-1] > 1.1 * (w[0] / lf[0])
    assert "membrane_forces" in out["final"]
    assert "moments" in out["final"]


def test_odd_layer_count_refused():
    with pytest.raises(ValueError, match="even"):
        solve_shell_plastic(bending_shell(0.5), SY, n_layers=5)


def test_thermal_refused():
    nodes, elems, left, right, fixed = flat_strip()
    p = ShellProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=T, density=1.0,
                     loads=np.zeros(6 * len(nodes)), fixed_dofs=fixed,
                     alpha_cte=1e-5, temperature=10.0)
    with pytest.raises(ValueError, match="temperature"):
        solve_shell_plastic(p, SY, n_layers=N)
