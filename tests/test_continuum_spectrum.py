"""Response-spectrum and random-vibration analysis on the continuum
families (solvers/continuum_spectrum.py).

Anchors:
  * a single-free-DOF Q4 / hex8 IS the textbook SDOF: spectrum peak
    u = Sa·m/k exactly (Γ = √m, φ = 1/√m), mass fraction 1, and the
    white-noise variance σ² = F²πS₀/(2kc);
  * a multi-mode strip: SRSS/CQC combination mirrored at machine
    precision against an independent scipy eigh computation written
    here, CQC(ζ=0) ≡ SRSS, and all-modes mass fraction → 1.
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.plane import (PlaneProblem, plane_matrices,
                                       rect_mesh)
from pinn_fem_tpu.models.solid import (SolidProblem, box_mesh,
                                       solid_matrices)
from pinn_fem_tpu.solvers.continuum_spectrum import (
    continuum_random_response, continuum_response_spectrum)

E, NU, T, RHO = 200.0, 0.3, 0.5, 2.0


def sdof_plane(load=3.0):
    """Unit-square Q4 with every DOF fixed except node 2's x: the
    free block is literally 1x1 — k = K[i,i], m = M[i,i]."""
    nodes, elems = rect_mesh(1.0, 1.0, 1, 1, "quad")
    i = 2 * 2                       # node 2, x component
    fixed = np.setdiff1d(np.arange(8), [i])
    loads = np.zeros(8)
    loads[i] = load
    return PlaneProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, thickness=T, density=RHO,
                        loads=loads, fixed_dofs=fixed), i


def sdof_solid(load=3.0):
    nodes, elems = box_mesh(1.0, 1.0, 1.0, 1, 1, 1)
    i = 3 * 6 + 2                   # node 6, z component
    fixed = np.setdiff1d(np.arange(24), [i])
    loads = np.zeros(24)
    loads[i] = load
    return SolidProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, density=RHO, loads=loads,
                        fixed_dofs=fixed), i


def rod_strip(nx=8):
    """Axial rod: all y DOFs fixed, left x clamped — well-separated
    longitudinal modes for the combination tests."""
    nodes, elems = rect_mesh(4.0, 1.0, nx, 1, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    fixed = np.unique(np.concatenate(
        [2 * left, 2 * np.arange(nodes.shape[0]) + 1]))
    return PlaneProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=RHO,
                        loads=np.zeros(2 * nodes.shape[0]),
                        fixed_dofs=fixed)


@pytest.mark.parametrize("make,direction", [(sdof_plane, [1.0, 0.0]),
                                            (sdof_solid, [0, 0, 1.0])])
def test_sdof_spectrum_closed_form(make, direction):
    """One free DOF: u_peak = Sa m/k exactly, Γ = √m, fraction 1."""
    p, i = make()
    if p.nodes.shape[1] == 2:
        k, m = plane_matrices(p)
    else:
        k, m = solid_matrices(p)
    ki, mi = k[i, i], m[i, i]
    sa = 2.5
    res = continuum_response_spectrum(p, sa, direction=direction,
                                      n_modes=4)
    assert res.omegas.shape == (1,)
    np.testing.assert_allclose(res.omegas[0], np.sqrt(ki / mi),
                               rtol=1e-12)
    np.testing.assert_allclose(res.displacements[i], sa * mi / ki,
                               rtol=1e-12)
    np.testing.assert_allclose(abs(res.participation[0]), np.sqrt(mi),
                               rtol=1e-12)
    np.testing.assert_allclose(res.mass_fraction, 1.0, rtol=1e-12)
    # off-DOF entries are supported: zero
    assert np.all(res.displacements[np.arange(p.ndof) != i] == 0.0)
    assert res.von_mises.shape == (p.nelm,)
    assert np.all(res.von_mises >= 0.0)


def test_strip_srss_cqc_mirror():
    """Multi-mode rod: the combination mirrors an independent scipy
    computation at machine precision, CQC(ζ=0) ≡ SRSS, CQC(ζ>0)
    differs but stays within the L1 bound, all-modes fraction → 1."""
    import scipy.linalg

    p = rod_strip()
    k, m = plane_matrices(p)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    lam, vec = scipy.linalg.eigh(k[np.ix_(free, free)],
                                 m[np.ix_(free, free)])
    n = 4
    om = np.sqrt(lam[:n])
    phi = np.zeros((n, p.ndof))
    phi[:, free] = vec[:, :n].T
    r = np.zeros(p.ndof)
    r[free[free % 2 == 0]] = 1.0          # x direction on free DOFs
    gamma = phi @ (k * 0 + m) @ r

    def sa_fn(w):
        return 1.0 + 0.1 * w              # frequency-dependent curve

    peaks = (gamma * sa_fn(om) / om**2)[:, None] * phi
    expect_srss = np.sqrt(np.sum(peaks**2, axis=0))

    res = continuum_response_spectrum(p, sa_fn, direction=[1, 0],
                                      n_modes=n, combination="srss")
    np.testing.assert_allclose(res.displacements, expect_srss,
                               rtol=1e-9, atol=1e-15)
    np.testing.assert_allclose(np.abs(res.participation),
                               np.abs(gamma), rtol=1e-9, atol=1e-12)

    cqc0 = continuum_response_spectrum(p, sa_fn, direction=[1, 0],
                                       n_modes=n, combination="cqc",
                                       damping_ratio=0.0)
    np.testing.assert_allclose(cqc0.displacements, expect_srss,
                               rtol=1e-12)
    cqc = continuum_response_spectrum(p, sa_fn, direction=[1, 0],
                                      n_modes=n, combination="cqc",
                                      damping_ratio=0.05)
    l1 = np.sum(np.abs(peaks), axis=0)
    assert np.all(cqc.displacements <= l1 * (1.0 + 1e-9))
    # all-modes completeness: directional mass fully captured
    full = continuum_response_spectrum(p, 1.0, direction=[1, 0],
                                       n_modes=free.size)
    np.testing.assert_allclose(full.mass_fraction, 1.0, rtol=1e-9)
    # truncated fraction is below 1 (consistent mass, rod modes)
    assert res.mass_fraction < 1.0


def test_stress_combination_per_quantity():
    """Per-quantity rule: the combined stress components equal the
    SRSS of the modal stresses, NOT the stress of the combined
    displacement field (signs destroyed)."""
    from pinn_fem_tpu.models.plane import recover_stresses

    p = rod_strip(nx=4)
    res = continuum_response_spectrum(p, 1.0, direction=[1, 0],
                                      n_modes=3)
    expect = np.sqrt(np.sum(res.modal_stresses**2, axis=0))
    np.testing.assert_allclose(res.stresses, expect, rtol=1e-12)
    wrong = recover_stresses(p, res.displacements)[0]
    assert not np.allclose(np.abs(wrong), res.stresses, rtol=1e-3)


@pytest.mark.parametrize("make", [sdof_plane, sdof_solid])
def test_sdof_white_noise_variance(make):
    """White noise S0 on the SDOF: σ² = F²πS₀/(2kc) — the textbook
    integral, resolved on a dense grid over 8 half-power bandwidths."""
    p, i = make()
    if p.nodes.shape[1] == 2:
        k, m = plane_matrices(p)
    else:
        k, m = solid_matrices(p)
    ki, mi = k[i, i], m[i, i]
    wn = np.sqrt(ki / mi)
    alpha = 0.4 * wn                      # mass damping, zeta = 0.2
    c = alpha * mi
    s0 = 0.7
    f = p.loads[i]
    om = np.linspace(1e-3 * wn, 8.0 * wn, 6000)
    res = continuum_random_response(p, s0, om, damping=(alpha, 0.0),
                                    probe_dofs=[i])
    exact = f**2 * np.pi * s0 / (2.0 * ki * c)
    np.testing.assert_allclose(res.rms[0] ** 2, exact, rtol=2e-2)
    # PSD peaks at the (damped) resonance
    assert abs(om[np.argmax(res.psd[:, 0])] - wn) < 0.05 * wn


def test_random_and_spectrum_guards():
    p, _ = sdof_plane()
    with pytest.raises(ValueError, match="damping"):
        continuum_random_response(p, 1.0, np.linspace(1, 10, 50))
    with pytest.raises(ValueError, match="increasing"):
        continuum_random_response(p, 1.0, [3.0, 2.0, 1.0],
                                  damping=(0.1, 0.0))
    with pytest.raises(ValueError, match="negative"):
        continuum_random_response(p, -1.0, np.linspace(1, 10, 50),
                                  damping=(0.1, 0.0))
    with pytest.raises(ValueError, match="combination"):
        continuum_response_spectrum(p, 1.0, combination="abs")
    with pytest.raises(ValueError, match="nonzero"):
        continuum_response_spectrum(p, 1.0, direction=[0.0, 0.0])
    with pytest.raises(TypeError, match="PlaneProblem"):
        continuum_response_spectrum(object(), 1.0)


# ---------------------------------------------------------------------------
# JSON tier: analysis.type "spectrum" / "random" on plane and solid
# documents (io/_common.run_continuum_spectrum / run_continuum_random)
# ---------------------------------------------------------------------------


def test_json_plane_spectrum():
    from pinn_fem_tpu.io.plane_io import run_plane_document

    doc = {
        "element_type": "plane",
        "mesh": {"type": "rect", "width": 4.0, "height": 1.0,
                 "nx": 8, "ny": 1, "element": "quad"},
        "material": {"young": E, "poisson": 0.0, "thickness": T,
                     "density": RHO},
        "fixed_x_nodes": "left",
        "fixed_y_nodes": list(range(18)),
        "analysis": {"type": "spectrum", "sa": 2.5,
                     "direction": [1, 0], "n_modes": 4,
                     "combination": "cqc", "damping_ratio": 0.05},
    }
    out = run_plane_document(doc)
    assert out["success"] and out["analysis"] == "spectrum"
    assert out["element_type"] == "plane"
    assert out["combination"] == "cqc"
    assert 0.7 < out["mass_fraction"] <= 1.0 + 1e-9
    # mirrors the solver exactly
    p = rod_strip()
    res = continuum_response_spectrum(p, 2.5, direction=[1, 0],
                                      n_modes=4, combination="cqc")
    np.testing.assert_allclose(out["max_displacement"],
                               res.displacements.max(), rtol=1e-12)
    np.testing.assert_allclose(out["displacements"],
                               res.displacements, rtol=1e-12)
    np.testing.assert_allclose(out["max_von_mises"],
                               res.von_mises.max(), rtol=1e-12)
    # tabulated Sa form
    doc["analysis"]["sa"] = {"omegas": [0.0, 1e4],
                             "values": [2.5, 2.5]}
    out2 = run_plane_document(doc)
    np.testing.assert_allclose(out2["max_displacement"],
                               out["max_displacement"], rtol=1e-12)
    # multi-direction refused loudly
    doc["analysis"]["directions"] = [[1, 0], [0, 1]]
    with pytest.raises(ValueError, match="single"):
        run_plane_document(doc)


def test_json_solid_random():
    from pinn_fem_tpu.io.solid_io import run_solid_document

    p, i = sdof_solid()
    wn = float(np.sqrt(solid_matrices(p)[0][i, i]
                       / solid_matrices(p)[1][i, i]))
    doc = {
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 1.0,
                 "nx": 1, "ny": 1, "nz": 1},
        "material": {"young": E, "poisson": NU, "density": RHO},
        "fixed_dofs": np.setdiff1d(np.arange(24), [i]).tolist(),
        "loads": np.zeros(24).tolist(),
        "analysis": {"type": "random",
                     "omegas": {"start": 1e-3 * wn, "stop": 8.0 * wn,
                                "num": 3000},
                     "psd": 0.7, "damping": [0.4 * wn, 0.0],
                     "probe_dofs": [int(i)]},
    }
    doc["loads"][i] = 3.0
    out = run_solid_document(doc)
    assert out["success"] and out["analysis"] == "random"
    k, m = solid_matrices(p)
    exact = 3.0**2 * np.pi * 0.7 / (2.0 * k[i, i]
                                    * 0.4 * wn * m[i, i])
    np.testing.assert_allclose(out["rms"][0] ** 2, exact, rtol=2e-2)
    # payload guard: full-field PSD history without probes refused
    del doc["analysis"]["probe_dofs"]
    with pytest.raises(ValueError, match="probe"):
        run_solid_document(doc)


# ---------------------------------------------------------------------------
# Frame family (the same core over models/frame.py's 3-DOF nodes)
# ---------------------------------------------------------------------------


def sdof_frame(load=3.0):
    """Vertical column with everything fixed except the tip x: the
    SDOF anchor on the frame family (rotations carry no influence)."""
    from pinn_fem_tpu.models.frame import FrameProblem

    nodes = np.array([[0.0, 0.0], [0.0, 2.0]])
    elems = np.array([[0, 1]])
    i = 3 * 1
    fixed = np.setdiff1d(np.arange(6), [i])
    loads = np.zeros(6)
    loads[i] = load
    return FrameProblem(nodes=nodes, elements=elems, young=E,
                        area=0.4, inertia=0.05, density=RHO,
                        loads=loads, fixed_dofs=fixed,
                        section_modulus=0.2), i


def test_frame_sdof_spectrum_and_random():
    """Frame SDOF: the spectrum peak, participation and white-noise
    variance all land on the same closed forms as the continuum
    SDOF — plus the member-quantity combination (extreme-fiber
    governing stress from the COMBINED end forces)."""
    from pinn_fem_tpu.models.frame import frame_matrices

    p, i = sdof_frame()
    k, m = frame_matrices(p)
    ki, mi = k[i, i], m[i, i]
    sa = 2.5
    res = continuum_response_spectrum(p, sa, direction=[1, 0],
                                      n_modes=3)
    assert res.omegas.shape == (1,)
    np.testing.assert_allclose(res.displacements[i], sa * mi / ki,
                               rtol=1e-12)
    np.testing.assert_allclose(res.mass_fraction, 1.0, rtol=1e-12)
    # governing stress: tip shear bends the GUIDED cantilever (tip
    # rotation is fixed in this SDOF) — antisymmetric end moments
    # |M| = V L/2, sigma = |N|/A + |M|/S with N = 0 for pure sway.
    f_tip = ki * res.displacements[i]          # peak shear force
    np.testing.assert_allclose(res.von_mises[0],
                               f_tip * (2.0 / 2.0) / 0.2, rtol=1e-9)
    # white noise
    wn = np.sqrt(ki / mi)
    alpha = 0.4 * wn
    om = np.linspace(1e-3 * wn, 8.0 * wn, 6000)
    rr = continuum_random_response(p, 0.7, om, damping=(alpha, 0.0),
                                   probe_dofs=[i])
    exact = p.loads[i] ** 2 * np.pi * 0.7 / (2.0 * ki * alpha * mi)
    np.testing.assert_allclose(rr.rms[0] ** 2, exact, rtol=2e-2)


def test_json_frame_spectrum_and_random():
    from pinn_fem_tpu.io.frame_io import run_frame_document

    doc = {
        "element_type": "frame",
        "nodes": [[0, 0], [0, 3], [4, 3], [4, 0]],
        "elements": [[0, 1], [1, 2], [2, 3]],
        "material": {"young": E, "area": 0.4, "inertia": 0.05,
                     "density": RHO, "section_modulus": 0.2},
        "loads": [0, 0, 0, 1.0, 0, 0, 1.0, 0, 0, 0, 0, 0],
        "fixed_nodes": [0, 3],
        "analysis": {"type": "spectrum", "sa": 2.5,
                     "direction": [1, 0], "n_modes": 4,
                     "combination": "cqc"},
    }
    out = run_frame_document(doc)
    assert out["success"] and out["analysis"] == "spectrum"
    assert out["element_type"] == "frame"
    assert 0.0 < out["mass_fraction"] <= 1.0 + 1e-9
    assert out["max_von_mises"] > 0.0
    doc["analysis"] = {"type": "random",
                       "omegas": {"start": 0.1, "stop": 30.0,
                                  "num": 400},
                       "psd": 1.0, "damping": [0.3, 0.0],
                       "probe_nodes": [1, 2]}
    out2 = run_frame_document(doc)
    assert out2["success"] and out2["analysis"] == "random"
    rms = np.asarray(out2["rms"])
    assert rms.shape == (6,) and np.all(np.isfinite(rms))
    assert rms.max() > 0.0


# ---------------------------------------------------------------------------
# Frequency-domain fatigue: stress FRFs + Preumont equivalent von
# Mises PSDs (continuum_stress_frf / continuum_spectral_fatigue)
# ---------------------------------------------------------------------------


def loaded_rod_strip(nx=6, q=5.0):
    """Rod strip (all y fixed, nu = 0) with a right-edge traction:
    sigma_yy = sigma_xy = 0 IDENTICALLY, so the equivalent von Mises
    PSD must reduce EXACTLY to the sigma_xx component PSD."""
    from pinn_fem_tpu.models.plane import edge_load

    nodes, elems = rect_mesh(4.0, 1.0, nx, 1, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    fixed = np.unique(np.concatenate(
        [2 * left, 2 * np.arange(nodes.shape[0]) + 1]))
    right = np.flatnonzero(nodes[:, 0] == 4.0)
    loads = edge_load(nodes, right[np.argsort(nodes[right, 1])],
                      [q, 0.0], T)
    return PlaneProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=T, density=RHO,
                        loads=loads, fixed_dofs=fixed)


def test_stress_frf_mirror_and_evms_reduction():
    """The stress FRF mirrors an independent per-frequency dense
    complex solve written here, and on the uniaxial rod the EVMS
    equals |sigma_xx|^2 S_p exactly (the Preumont reduction's
    uniaxial limit)."""
    from pinn_fem_tpu.models.plane import _centroid_b, _dmat
    from pinn_fem_tpu.solvers.continuum_spectrum import (
        continuum_spectral_fatigue, continuum_stress_frf)

    p = loaded_rod_strip()
    k, m = plane_matrices(p)
    om = np.linspace(0.5, 12.0, 40)
    alpha = 0.8
    frf = continuum_stress_frf(p, om, damping=(alpha, 0.0))
    assert frf.shape == (40, p.nelm, 6)
    # independent mirror
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    b = _centroid_b(p)
    dmat = _dmat(p.young, p.poisson, False)
    dm = p.dof_map()
    for i in [0, 17, 39]:
        a = (k - om[i] ** 2 * m + 1j * om[i] * alpha * m)
        u = np.zeros(p.ndof, dtype=complex)
        u[free] = np.linalg.solve(a[np.ix_(free, free)],
                                  p.loads[free].astype(complex))
        eps = np.einsum("mia,ma->mi", b, u[dm])
        s3 = np.einsum("mij,mj->mi", dmat, eps)
        np.testing.assert_allclose(frf[i, :, 0], s3[:, 0], rtol=1e-10)
        np.testing.assert_allclose(frf[i, :, 5], s3[:, 2], atol=1e-12)
    # rod: only sigma_xx lives
    assert np.abs(frf[:, :, 1:]).max() < 1e-10 * np.abs(frf).max()
    # EVMS == |sigma_xx|^2 S_p exactly
    s0 = 0.3
    cf = continuum_spectral_fatigue(p, s0, om, damping=(alpha, 0.0),
                                    sn_exponent=3.0,
                                    sn_coefficient=1e6)
    np.testing.assert_allclose(cf.eq_psd,
                               np.abs(frf[:, :, 0]) ** 2 * s0,
                               rtol=1e-12)
    assert np.all(cf.fatigue.damage_rate > 0.0)
    assert np.all(np.isfinite(cf.fatigue.life))
    # the loaded (right) end carries less stress than the support end
    assert cf.eq_rms[0] > cf.eq_rms[-1]


def test_json_random_fatigue_plane_and_guards():
    from pinn_fem_tpu.io.frame_io import run_frame_document
    from pinn_fem_tpu.io.plane_io import run_plane_document

    doc = {
        "element_type": "plane",
        "mesh": {"type": "rect", "width": 4.0, "height": 1.0,
                 "nx": 6, "ny": 1, "element": "quad"},
        "material": {"young": E, "poisson": 0.0, "thickness": T,
                     "density": RHO},
        "fixed_x_nodes": "left",
        "fixed_y_nodes": list(range(14)),
        "edge_loads": [{"nodes": "right", "traction": [5.0, 0.0]}],
        "analysis": {"type": "random",
                     "omegas": {"start": 0.5, "stop": 12.0,
                                "num": 200},
                     "psd": 0.3, "damping": [0.8, 0.0],
                     "probe_nodes": [13],
                     "probe_elements": [0, 5],
                     "fatigue": {"sn": {"exponent": 3.0,
                                        "coefficient": 1e6},
                                 "duration": 3600.0}},
    }
    out = run_plane_document(doc)
    assert out["success"] and "fatigue" in out
    f = out["fatigue"]
    assert f["equivalent"] == "von_mises_preumont"
    assert f["probe_elements"] == [0, 5]
    assert all(v > 0 for v in f["damage_rate"])
    assert all(v is None or v > 0 for v in f["life_s"])
    assert len(f["peak_factor"]) == 2
    # statistics-only without sn
    doc["analysis"]["fatigue"] = {}
    out2 = run_plane_document(doc)
    assert "damage_rate" not in out2["fatigue"]
    assert all(v > 0 for v in out2["fatigue"]["stress_rms"])
    # frames refused loudly
    # frames without a section modulus are refused loudly; with one,
    # the governing-fiber path serves the same contract.
    fdoc = {
        "element_type": "frame",
        "nodes": [[0, 0], [0, 2]],
        "elements": [[0, 1]],
        "material": {"young": E, "area": 0.4, "inertia": 0.05,
                     "density": RHO},
        "loads": [0, 0, 0, 1.0, 0, 0],
        "fixed_nodes": [0],
        "analysis": {"type": "random",
                     "omegas": {"start": 0.5, "stop": 30.0,
                                "num": 300},
                     "psd": 1.0, "damping": [0.3, 0.0],
                     "fatigue": {"sn": {"exponent": 3.0,
                                        "coefficient": 1e6}}},
    }
    with pytest.raises(ValueError, match="section_modulus"):
        run_frame_document(fdoc)
    fdoc["material"]["section_modulus"] = 0.2
    fout = run_frame_document(fdoc)
    assert fout["fatigue"]["equivalent"] == "extreme_fiber_governing"
    assert all(v > 0 for v in fout["fatigue"]["damage_rate"])


def test_frame_fiber_fatigue_sdof_anchor():
    """Guided-cantilever SDOF frame under white noise: pure sway (no
    axial force) makes all four fibers carry |M|/S = |V| L/(2S), so
    the governing-fiber RMS has the closed form (L/2S)·k·σ_u with
    σ_u² = F²πS₀/(2kc) — the frame path's exactness anchor."""
    from pinn_fem_tpu.models.frame import frame_matrices
    from pinn_fem_tpu.solvers.continuum_spectrum import (
        continuum_spectral_fatigue, frame_fiber_stress_frf)

    p, i = sdof_frame()
    k, m = frame_matrices(p)
    ki, mi = k[i, i], m[i, i]
    wn = np.sqrt(ki / mi)
    alpha = 0.4 * wn
    s0 = 0.7
    om = np.linspace(1e-3 * wn, 8.0 * wn, 6000)
    cf = continuum_spectral_fatigue(p, s0, om, damping=(alpha, 0.0),
                                    sn_exponent=3.0,
                                    sn_coefficient=1e6)
    sigma_u2 = p.loads[i] ** 2 * np.pi * s0 / (2.0 * ki * alpha * mi)
    exact_rms = (2.0 / (2.0 * 0.2)) * ki * np.sqrt(sigma_u2)
    np.testing.assert_allclose(cf.eq_rms[0], exact_rms, rtol=2e-2)
    assert cf.fatigue.damage_rate[0] > 0.0
    # all four fibers identical here: the FRF magnitudes must agree
    frf = frame_fiber_stress_frf(p, om[:50], damping=(alpha, 0.0))
    mags = np.abs(frf[:, 0, :])
    np.testing.assert_allclose(mags, np.broadcast_to(mags[:, :1],
                                                     mags.shape),
                               rtol=1e-9)


# ---------------------------------------------------------------------------
# Plate family (Mindlin MITC4, 3-DOF [w, βx, βy] nodes): transverse
# base excitation, extreme-fiber σ = 6M/t² stress quantities
# ---------------------------------------------------------------------------


def sdof_plate(load=3.0, t=0.2):
    """Unit-square MITC4 plate with every DOF fixed except node 2's w:
    the SDOF anchor on the plate family (rotations carry no
    influence — only the w DOFs ride a transverse base motion)."""
    from pinn_fem_tpu.models.plate import PlateProblem

    nodes, elems = rect_mesh(1.0, 1.0, 1, 1, "quad")
    i = 3 * 2                       # node 2, w component
    fixed = np.setdiff1d(np.arange(12), [i])
    loads = np.zeros(12)
    loads[i] = load
    return PlateProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, thickness=t, density=RHO,
                        loads=loads, fixed_dofs=fixed), i


def plate_strip(nx=6, f_tip=2.0):
    """Cylindrical-bending strip: ν = 0 and βy fixed everywhere, so
    Myy = Mxy = 0 IDENTICALLY and the equivalent von Mises PSD must
    reduce exactly to the σxx component PSD (the plate twin of
    loaded_rod_strip)."""
    from pinn_fem_tpu.models.plate import PlateProblem, plate_supports

    nodes, elems = rect_mesh(4.0, 1.0, nx, 1, "quad")
    nnode = nodes.shape[0]
    left = plate_supports(nodes, ["left"], "clamped")
    by = 3 * np.arange(nnode) + 2
    fixed = np.unique(np.concatenate([left, by]))
    loads = np.zeros(3 * nnode)
    right = np.flatnonzero(nodes[:, 0] == 4.0)
    loads[3 * right] = f_tip / right.size
    return PlateProblem(nodes=nodes, elements=elems, young=E,
                        poisson=0.0, thickness=0.1, density=RHO,
                        loads=loads, fixed_dofs=fixed)


def test_plate_sdof_spectrum_and_random():
    """Plate SDOF: the same closed forms as the plane/solid/frame
    anchors — u_peak = Sa·m/k, Γ = √m, fraction 1, white-noise
    σ² = F²πS₀/(2kc) — plus the dim=1 direction guard."""
    from pinn_fem_tpu.models.plate import plate_matrices

    p, i = sdof_plate()
    k, m = plate_matrices(p)
    ki, mi = k[i, i], m[i, i]
    sa = 2.5
    res = continuum_response_spectrum(p, sa, n_modes=4)
    assert res.omegas.shape == (1,)
    np.testing.assert_allclose(res.omegas[0], np.sqrt(ki / mi),
                               rtol=1e-12)
    np.testing.assert_allclose(res.displacements[i], sa * mi / ki,
                               rtol=1e-12)
    np.testing.assert_allclose(abs(res.participation[0]), np.sqrt(mi),
                               rtol=1e-12)
    np.testing.assert_allclose(res.mass_fraction, 1.0, rtol=1e-12)
    assert res.von_mises.shape == (p.nelm,)
    assert np.all(res.von_mises >= 0.0)
    # plates are excited transversely: scalar direction only
    same = continuum_response_spectrum(p, sa, direction=[1.0],
                                       n_modes=4)
    np.testing.assert_allclose(same.displacements, res.displacements,
                               rtol=1e-12)
    with pytest.raises(ValueError, match="component"):
        continuum_response_spectrum(p, sa, direction=[0.0, 0.0, 1.0])
    # white noise on the same SDOF
    wn = np.sqrt(ki / mi)
    alpha = 0.4 * wn
    om = np.linspace(1e-3 * wn, 8.0 * wn, 6000)
    rr = continuum_random_response(p, 0.7, om, damping=(alpha, 0.0),
                                   probe_dofs=[i])
    exact = p.loads[i] ** 2 * np.pi * 0.7 / (2.0 * ki * alpha * mi)
    np.testing.assert_allclose(rr.rms[0] ** 2, exact, rtol=2e-2)


def test_plate_spectrum_stress_is_extreme_fiber_srss():
    """Per-quantity rule on the plate strip: the combined stress
    components equal the SRSS of the modal extreme-fiber stresses
    6M/t², and the reported governing stress is the plane-stress von
    Mises OF those combined components."""
    p = plate_strip(nx=4)
    res = continuum_response_spectrum(p, 1.0, n_modes=3)
    expect = np.sqrt(np.sum(res.modal_stresses ** 2, axis=0))
    np.testing.assert_allclose(res.stresses, expect, rtol=1e-12)
    sxx, syy, sxy = (res.stresses[:, 0], res.stresses[:, 1],
                     res.stresses[:, 2])
    vm = np.sqrt(sxx ** 2 - sxx * syy + syy ** 2 + 3.0 * sxy ** 2)
    np.testing.assert_allclose(res.von_mises, vm, rtol=1e-12)
    # cylindrical bending: only σxx lives
    assert np.abs(res.stresses[:, 1:]).max() \
        < 1e-9 * np.abs(res.stresses).max()


def test_plate_stress_frf_mirror_and_evms_reduction():
    """The plate stress FRF mirrors an independent per-frequency dense
    complex solve through recover_moments (σ = 6M/t², linear in u), and
    on the cylindrical strip the Preumont EVMS equals |σxx|² S_p."""
    from pinn_fem_tpu.models import plate as PL
    from pinn_fem_tpu.solvers.continuum_spectrum import (
        continuum_spectral_fatigue, continuum_stress_frf)

    p = plate_strip()
    k, m = PL.plate_matrices(p)
    w1 = PL.plate_modal(p, 1).omegas[0]
    # sweep BELOW the first resonance: quasi-static, so the clamped
    # root governs (above it the mass-dominated response reorders)
    om = np.linspace(0.01 * w1, 0.6 * w1, 30)
    alpha = 0.8 * w1
    frf = continuum_stress_frf(p, om, damping=(alpha, 0.0))
    assert frf.shape == (30, p.nelm, 6)
    free = np.setdiff1d(np.arange(p.ndof), p.fixed_dofs)
    t2 = p.thickness ** 2
    for i in [0, 15, 29]:
        a = k - om[i] ** 2 * m + 1j * om[i] * alpha * m
        u = np.zeros(p.ndof, dtype=complex)
        u[free] = np.linalg.solve(a[np.ix_(free, free)],
                                  p.loads[free].astype(complex))
        mom_r = PL.recover_moments(p, u.real)[0]
        mom_i = PL.recover_moments(p, u.imag)[0]
        sxx = 6.0 * (mom_r[:, 0] + 1j * mom_i[:, 0]) / t2
        np.testing.assert_allclose(frf[i, :, 0], sxx, rtol=1e-10)
        assert np.abs(frf[i, :, 2:5]).max() == 0.0    # zz, yz, xz
    # cylindrical bending: only σxx lives
    assert np.abs(frf[:, :, 1:]).max() < 1e-9 * np.abs(frf).max()
    # EVMS == |σxx|² S_p exactly
    s0 = 0.3
    cf = continuum_spectral_fatigue(p, s0, om, damping=(alpha, 0.0),
                                    sn_exponent=3.0,
                                    sn_coefficient=1e6)
    np.testing.assert_allclose(cf.eq_psd,
                               np.abs(frf[:, :, 0]) ** 2 * s0,
                               rtol=1e-12)
    assert np.all(cf.fatigue.damage_rate > 0.0)
    # the clamped root carries more stress than the tip
    assert cf.eq_rms[0] > cf.eq_rms[-1]


def test_json_plate_spectrum_random_fatigue():
    from pinn_fem_tpu.io.plate_io import run_plate_document

    doc = {
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 1.0, "height": 1.0,
                 "nx": 6, "ny": 6},
        "material": {"young": E, "poisson": NU, "thickness": 0.05,
                     "density": RHO},
        "supports": {"simply_supported": ["left", "right", "bottom",
                                          "top"]},
        "analysis": {"type": "spectrum", "sa": 2.5, "n_modes": 6,
                     "combination": "cqc", "damping_ratio": 0.05},
    }
    out = run_plate_document(doc)
    assert out["success"] and out["analysis"] == "spectrum"
    assert out["element_type"] == "plate"
    assert 0.0 < out["mass_fraction"] <= 1.0 + 1e-9
    assert out["max_von_mises"] > 0.0
    # mirrors the solver exactly
    from pinn_fem_tpu.io.plate_io import parse_plate_document

    p, _ = parse_plate_document(doc)
    res = continuum_response_spectrum(p, 2.5, n_modes=6,
                                      combination="cqc")
    np.testing.assert_allclose(out["max_displacement"],
                               res.displacements.max(), rtol=1e-12)
    np.testing.assert_allclose(out["max_von_mises"],
                               res.von_mises.max(), rtol=1e-12)
    # random + spectral fatigue through the shared contract
    doc["pressure"] = -100.0
    doc["analysis"] = {"type": "random",
                       "omegas": {"start": 5.0, "stop": 2000.0,
                                  "num": 300},
                       "psd": 0.5, "damping": [2.0, 0.0],
                       "probe_nodes": [24],
                       "probe_elements": [0, 14],
                       "fatigue": {"sn": {"exponent": 3.0,
                                          "coefficient": 1e12},
                                   "duration": 3600.0}}
    out2 = run_plate_document(doc)
    assert out2["success"] and out2["analysis"] == "random"
    assert out2["probe_dofs"] == [72]            # w DOF of node 24
    assert np.asarray(out2["rms"]).shape == (1,)
    f = out2["fatigue"]
    assert f["equivalent"] == "von_mises_preumont"
    assert f["probe_elements"] == [0, 14]
    assert all(v > 0 for v in f["damage_rate"])
    assert len(f["peak_factor"]) == 2
    # the dense host tier's DOF budget guards the new kinds too
    big = dict(doc)
    big["mesh"] = {"type": "rect", "width": 1.0, "height": 1.0,
                   "nx": 52, "ny": 52}
    with pytest.raises(ValueError, match="coarsen"):
        run_plate_document(big)


# ---------------------------------------------------------------------------
# Shell family: two-fiber governing spectral fatigue
# (shell_fiber_stress_frf / the ShellProblem branch of
# continuum_spectral_fatigue)
# ---------------------------------------------------------------------------


def _flat_shell_strip(loads6, poisson=0.3):
    from pinn_fem_tpu.models.plate import rect_mesh
    from pinn_fem_tpu.models.shell import ShellProblem

    nodes2d, elems = rect_mesh(4.0, 1.0, 4, 1, element="quad")
    nodes = np.column_stack([nodes2d, np.zeros(len(nodes2d))])
    left = np.flatnonzero(nodes[:, 0] < 1e-9)
    fixed = np.concatenate([6 * left + d for d in range(6)])
    return ShellProblem(nodes=nodes, elements=elems, young=200e3,
                        poisson=poisson, thickness=0.1, density=1.0,
                        loads=loads6, fixed_dofs=fixed), nodes


def test_shell_fiber_fatigue_matches_plane_and_plate():
    """The two-fiber shell fatigue path lands EXACTLY on the existing
    families where they overlap (the same kernels, the governing-max
    over two equal or signed-mirror fibers is the identity):
    membrane-loaded flat strip == the PLANE family (measured 6e-12),
    transversely loaded flat strip == the PLATE family's 6M/t² path
    (measured 5e-9 — the drilling mass ridge).  No new physics can
    drift in unnoticed between the three implementations."""
    from pinn_fem_tpu.models.plane import PlaneProblem
    from pinn_fem_tpu.models.plate import (PlateProblem,
                                           plate_supports, rect_mesh)
    from pinn_fem_tpu.solvers.continuum_spectrum import \
        continuum_spectral_fatigue

    om = np.linspace(1.0, 80.0, 60)
    damping = (0.4, 1e-4)
    sn = dict(sn_exponent=5.0, sn_coefficient=1e12)
    nodes2d, elems = rect_mesh(4.0, 1.0, 4, 1, element="quad")
    n = len(nodes2d)
    left = np.flatnonzero(nodes2d[:, 0] < 1e-9)
    right = np.flatnonzero(np.abs(nodes2d[:, 0] - 4.0) < 1e-9)

    # membrane: axial tip force — shell == plane
    pl_loads = np.zeros(2 * n)
    pl_loads[2 * right + 0] = 3.0
    pp = PlaneProblem(nodes=nodes2d, elements=elems, young=200e3,
                      poisson=0.3, thickness=0.1, density=1.0,
                      loads=pl_loads,
                      fixed_dofs=np.concatenate([2 * left,
                                                 2 * left + 1]))
    sh_loads = np.zeros(6 * n)
    sh_loads[6 * right + 0] = 3.0
    sp, _ = _flat_shell_strip(sh_loads)
    fa = continuum_spectral_fatigue(pp, 1.0, om, damping=damping,
                                    **sn)
    fb = continuum_spectral_fatigue(sp, 1.0, om, damping=damping,
                                    **sn)
    np.testing.assert_allclose(fb.eq_rms, fa.eq_rms, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(fb.fatigue.damage_rate),
                               np.asarray(fa.fatigue.damage_rate),
                               rtol=1e-8)

    # bending: transverse tip force — shell == plate (6M/t² fibers)
    pt_loads = np.zeros(3 * n)
    pt_loads[3 * right + 0] = -0.5
    pt = PlateProblem(nodes=nodes2d, elements=elems, young=200e3,
                      poisson=0.3, thickness=0.1, density=1.0,
                      loads=pt_loads,
                      fixed_dofs=plate_supports(nodes2d, "left",
                                                "clamped"))
    sh2_loads = np.zeros(6 * n)
    sh2_loads[6 * right + 2] = -0.5
    sp2, _ = _flat_shell_strip(sh2_loads)
    fc = continuum_spectral_fatigue(pt, 1.0, om, damping=damping,
                                    **sn)
    fd = continuum_spectral_fatigue(sp2, 1.0, om, damping=damping,
                                    **sn)
    np.testing.assert_allclose(fd.eq_rms, fc.eq_rms, rtol=1e-6)

    # combined membrane + bending (the membrane scaled 10× so its
    # fiber shift is visible next to the bending RMS): the governing
    # fiber carries MORE than either pure case — the coupling the
    # uncoupled families cannot represent.  Fatigue RMS is linear in
    # the load amplitude, so the pure-membrane comparison point is
    # exactly 10·fb.
    sh3_loads = 10.0 * sh_loads + sh2_loads
    sp3, _ = _flat_shell_strip(sh3_loads)
    fe_ = continuum_spectral_fatigue(sp3, 1.0, om, damping=damping,
                                     **sn)
    assert np.all(fe_.eq_rms >= np.maximum(10.0 * fb.eq_rms,
                                           fd.eq_rms) * (1.0 - 1e-9))
    assert fe_.eq_rms.max() > 1.01 * max(10.0 * fb.eq_rms.max(),
                                         fd.eq_rms.max())


def test_json_shell_random_fatigue():
    """The shell random block's spectral-fatigue extension end-to-end
    (io/_common.run_continuum_random on a shell document): the
    governing-fiber Preumont chain fields arrive with the shared
    contract shape."""
    from pinn_fem_tpu.io.shell_io import run_shell_document

    doc = {
        "element_type": "shell",
        "mesh": {"type": "cylinder_panel", "radius": 25.0,
                 "length": 10.0, "half_angle_deg": 30.0,
                 "nx": 6, "ny": 4},
        "material": {"young": 200e3, "poisson": 0.0,
                     "thickness": 0.25, "density": 1.0},
        "supports": [{"nodes": "y_min",
                      "dofs": [0, 1, 2, 3, 4, 5]}],
        "pressure": 0.5,
        "analysis": {"type": "random",
                     "omegas": {"start": 0.5, "stop": 200.0,
                                "num": 200},
                     "psd": 0.5, "damping": [0.5, 0.0],
                     "probe_nodes": [20],
                     "probe_elements": [0, 10],
                     "fatigue": {"sn": {"exponent": 3.0,
                                        "coefficient": 1e12},
                                 "duration": 3600.0}},
    }
    out = run_shell_document(doc)
    assert out["success"] and out["analysis"] == "random"
    f = out["fatigue"]
    assert f["equivalent"] == "extreme_fiber_von_mises_governing"
    assert f["probe_elements"] == [0, 10]
    assert all(v > 0 for v in f["damage_rate"])
    assert all(v > 0 for v in f["stress_rms"])
    assert len(f["nu0_hz"]) == 2
