"""The dynamics corpus (examples/json/dyn-*.json) end-to-end: every file
through the real CLI run() path, asserting physically meaningful output
(the same rot-prevention the static corpus gets in test_examples_e2e)."""

import glob
import json
import os
from pathlib import Path

import numpy as np
import pytest

CORPUS = Path(__file__).resolve().parent.parent / "examples" / "json"
DYN = sorted(os.path.basename(p) for p in glob.glob(str(CORPUS / "dyn-*.json")))


def run_cli_inprocess(name, tmp_path):
    import shutil

    from pinn_fem_tpu.cli.generic import run

    src = CORPUS / name
    dst = tmp_path / name
    shutil.copy(src, dst)
    out = run(str(dst))
    res_file = tmp_path / f"{Path(name).stem}.res.json"
    assert res_file.exists()
    return json.loads(res_file.read_text()), out


def test_dyn_corpus_complete():
    assert DYN == ["dyn-buckling.json", "dyn-continuation.json",
                   "dyn-fatigue.json", "dyn-frame-identify.json",
                   "dyn-frame-pushover.json",
                   "dyn-frame-thermal.json",
                   "dyn-frame.json", "dyn-frame3d.json",
                   "dyn-harmonic.json",
                   "dyn-identification-field.json",
                   "dyn-identification-frf.json",
                   "dyn-identification-modal.json",
                   "dyn-identification.json", "dyn-modal.json",
                   "dyn-plane-identify.json",
                   "dyn-plane-plastic.json",
                   "dyn-plane-reliability.json",
                   "dyn-plane-sizing.json",
                   "dyn-plane-spectrum.json",
                   "dyn-plane-transient-plastic.json",
                   "dyn-plane.json",
                   "dyn-plastic.json", "dyn-plate-identify.json",
                   "dyn-plate-plastic.json", "dyn-plate.json",
                   "dyn-random.json", "dyn-reduction.json",
                   "dyn-reliability.json",
                   "dyn-shell-plastic.json", "dyn-shell-snap.json",
                   "dyn-shell.json",
                   "dyn-sizing-dynamic.json", "dyn-sizing-fatigue.json",
                   "dyn-sizing-rbdo.json", "dyn-sizing.json",
                   "dyn-solid-plastic.json",
                   "dyn-solid-transient-plastic.json",
                   "dyn-solid.json",
                   "dyn-spectrum.json", "dyn-transient.json"]


@pytest.mark.parametrize("name", DYN)
def test_dyn_corpus_runs(name, tmp_path):
    res, _ = run_cli_inprocess(name, tmp_path)
    assert res["success"]
    kind = res["analysis"]
    if name == "dyn-frame.json":
        # Two-story portal frame sway modes: positive ascending
        # frequencies, translational fundamental (x-sway of the roof
        # dominates its rotation DOF), 3-DOF-per-node shapes.
        f = np.asarray(res["frequencies_hz"])
        assert f.shape == (4,) and np.all(f > 0)
        assert np.all(np.diff(f) >= -1e-9)
        np.testing.assert_allclose(f[0], 0.06535, rtol=1e-3)
        shapes = np.asarray(res["mode_shapes"])
        assert shapes.shape == (4, 18)
        assert abs(shapes[0][3 * 4]) > 5.0 * abs(shapes[0][3 * 4 + 2])
    elif name == "dyn-frame-pushover.json":
        # Portal sway collapse: exact plastic theory H_c = 4 Mp/h
        # (solvers/frame_plastic.py; hinge-by-hinge is piecewise
        # elastic and Hermite elements are exact for nodal loads).
        assert res["element_type"] == "frame"
        assert res["mechanism"] is True
        np.testing.assert_allclose(res["collapse_factor"],
                                   4.0 * 500.0 / 3.0, rtol=1e-12)
        assert {(h["member"], h["end"]) for h in res["hinges"]} \
            >= {(0, 0), (2, 1)}              # both column bases
        lam = np.asarray(res["load_factors"])
        assert lam[0] == 0.0 and np.all(np.diff(lam) > 0)
    elif name == "dyn-frame-identify.json":
        # Tapered-I cantilever twin recovery (the flagship inverse on
        # a bending structure, through the frame JSON identification
        # tier): every element's I to 1%, converged loss.
        assert res["element_type"] == "frame"
        assert res["parameter"] == "inertia" and res["synthetic"]
        assert res["max_rel_error"] < 1e-2
        vals = np.asarray(res["inertia"])
        assert vals.shape == (8,) and np.all(np.diff(vals) < 0)
        hist = np.asarray(res["loss_history"])
        assert hist[-1] < 1e-4 * hist[0]
    elif name == "dyn-frame-thermal.json":
        # Clamped-clamped member, uniform ΔT + through-depth gradient:
        # both thermal-restraint closed forms exact (u ≡ 0,
        # N = −EAαΔT, |M| = EIα·g — tests/test_thermal.py anchors
        # through the JSON tier).
        assert res["element_type"] == "frame"
        assert np.abs(np.asarray(res["displacements"])).max() < 1e-12
        np.testing.assert_allclose(
            res["axial_forces"], -200e9 * 0.01 * 1.2e-5 * 40.0,
            rtol=1e-9)
        np.testing.assert_allclose(
            np.abs(np.asarray(res["end_moments"])),
            200e9 * 1e-5 * 1.2e-5 * 100.0, rtol=1e-9)
    elif name == "dyn-shell-plastic.json":
        # Combined membrane tension + bending at n = 0.5 ramped to
        # the interaction capacity m = 1 - n^2 = 0.75: fully plastic
        # strip at the last step, recovered N exactly the applied
        # 0.5*sigma_y*t (determinate axial path), EPP fiber vM
        # pinned at sigma_y, secant softened (tests/
        # test_shell_plastic.py brackets the capacity).
        assert res["element_type"] == "shell"
        assert res["n_layers"] == 20
        npl = res["n_plastic"]
        assert npl[0] == 0 and npl[-1] == 4
        np.testing.assert_allclose(max(res["max_von_mises"]), 300.0,
                                   rtol=1e-9)
        nf = np.asarray(res["final"]["membrane_forces"])
        np.testing.assert_allclose(nf[:, 0], 0.5 * 300.0 * 0.1,
                                   rtol=1e-9)
        lf = np.asarray(res["load_factors"])
        d = np.asarray(res["displacements"])
        th = np.abs(d[:, 4])                     # tip rotation
        assert th[-1] / lf[-1] > 1.2 * (th[0] / lf[0])
    elif name == "dyn-shell-snap.json":
        # Half-sine shallow arch snap-through (Marguerre tier): the
        # continuum path is the exact single-mode cubic; gate the
        # pre-snap limit load against its closed-form maximum, and
        # require BOTH folds traversed into the hardened branch
        # (tests/test_shell_nonlinear.py pins the full path).
        assert res["element_type"] == "shell"
        ee, tt, ll = 0.15, 0.1, 4.0
        dd = 200e3 * tt**3 / 12.0
        ea = 200e3 * tt
        kk = np.pi / ll
        aa = np.linspace(-ee, 0.0, 200001)
        lam_ex = -(dd * kk**4 * aa
                   + ea * kk**4 * (ee * aa / 2.0 + aa**2 / 4.0)
                   * (ee + aa))
        lim = lam_ex.max()
        lam = np.asarray(res["load_factors"])
        d = np.asarray(res["displacements"])
        a_fe = d[:, 2]
        pre = a_fe > -ee
        np.testing.assert_allclose(lam[pre].max(), lim, rtol=1e-2)
        assert lam.min() < -0.5          # lower fold visited
        assert a_fe.min() < -2.0 * ee    # inverted configuration
        assert lam[-1] > lim             # hardened branch picked up
    elif name == "dyn-shell.json":
        # Scordelis-Lo roof on the 16x16 facet mesh: the midside
        # free-edge deflection at the measured -0.29514 (converging
        # from below onto the published 0.3024; tests/test_shell.py
        # pins the refinement sequence).
        assert res["element_type"] == "shell"
        np.testing.assert_allclose(res["probe_displacements"][2],
                                   -0.29514, rtol=1e-3)
        assert res["max_displacement_dof"] == 6 * 136 + 2
        nf = np.asarray(res["membrane_forces"])
        assert nf.shape == (256, 3) and np.isfinite(nf).all()
    elif name == "dyn-frame3d.json":
        # Right-angle grillage: the exact two-element closed form
        # (bending of both legs + lever torsion of AB) and the full
        # lever torque in leg AB (models/frame3d.py docstring).
        assert res["element_type"] == "frame3d"
        e_, g_, iy, j_ = 200.0, 80.0, 0.02, 0.03
        l1, l2, p_ = 3.0, 2.0, 1.0
        exact = -(p_ * l1 ** 3 / (3 * e_ * iy)
                  + p_ * l2 ** 3 / (3 * e_ * iy)
                  + p_ * l2 ** 2 * l1 / (g_ * j_))
        np.testing.assert_allclose(res["displacements"][14], exact,
                                   rtol=1e-12)
        np.testing.assert_allclose(abs(res["torques"][0]), p_ * l2,
                                   rtol=1e-12)
        assert len(res["member_end_forces"]) == 2
    elif name == "dyn-plane.json":
        # Axial-rod membrane strip (ν = 0, all y DOFs fixed): the Q4
        # consistent-mass frequencies converge to f_k = (2k−1)c/4L from
        # above (models/plane.py verification anchors).
        f = np.asarray(res["frequencies_hz"])
        c = np.sqrt(1000.0 / 1.0)
        exact = (2.0 * np.arange(1, 5) - 1.0) * c / (4.0 * 4.0)
        assert np.all(f >= exact * (1.0 - 1e-9))      # from above
        np.testing.assert_allclose(f, exact, rtol=2.5e-2)
        np.testing.assert_allclose(f[0], exact[0], rtol=1e-3)
        assert np.asarray(res["mode_shapes"]).shape == (4, 102)
    elif name == "dyn-plane-identify.json":
        # Two-zone damage localization past DENSE_DOF_LIMIT (round-4
        # VERDICT #5): 2754 DOFs through the banded adjoint, both zone
        # moduli recovered to 0.5% from right-edge probes.
        assert res["method"] == "banded" and res["synthetic"]
        assert res["true_zone_young"] == [800.0, 1400.0]
        assert max(res["zone_rel_error"]) < 5e-3
        zones = res["zones"]
        assert sorted(zones[0] + zones[1]) == list(range(16 * 80))
        hist = np.asarray(res["loss_history"])
        assert hist[-1] < 1e-2 * hist[0]
    elif name == "dyn-solid.json":
        # 3D hex8 column at 6075 DOFs (> DENSE_DOF_LIMIT) through the
        # banded DIA tier: homogeneous uniaxial closed form, exact.
        assert res["element_type"] == "solid"
        assert res["method"] == "banded" and res["iterations"] > 0
        assert res["relative_residual"] < 1e-8
        np.testing.assert_allclose(res["max_displacement"],
                                   5.0 / 200.0 * 4.0, rtol=1e-4)
        np.testing.assert_allclose(res["max_von_mises"], 5.0,
                                   rtol=1e-4)
    elif name == "dyn-solid-plastic.json":
        # 3D J2 uniaxial bilinear anchor: exact endpoint
        # u_z = L (sigma/E + (sigma - sigma_y)/H) = 0.065, all 24
        # elements yielded, von Mises == sigma at every plastic step.
        assert res["element_type"] == "solid"
        u = np.abs(np.asarray(res["displacements"][-1]))
        np.testing.assert_allclose(u.max(), 0.065, rtol=1e-8)
        sig = 1.5 * np.asarray(res["load_factors"])
        np.testing.assert_allclose(res["max_von_mises"][-1], sig[-1],
                                   rtol=1e-8)
        assert res["n_plastic"][0] == 0        # sigma = 0.6 < sigma_y
        assert res["n_plastic"][-1] == 24
        assert len(res["yielded_elements"]) == 24
    elif name == "dyn-plane-spectrum.json":
        # Shear-wall CQC spectrum: > 80% directional mass in 6 modes,
        # and the JSON payload mirrors the Python API exactly.
        from pinn_fem_tpu.models.plane import PlaneProblem, rect_mesh
        from pinn_fem_tpu.solvers.continuum_spectrum import \
            continuum_response_spectrum

        assert res["element_type"] == "plane" and kind == "spectrum"
        assert res["combination"] == "cqc"
        assert 0.8 < res["mass_fraction"] <= 1.0 + 1e-9
        nodes, elems = rect_mesh(4.0, 8.0, 4, 8, "quad")
        bot = np.flatnonzero(nodes[:, 1] == 0.0)
        p = PlaneProblem(nodes=nodes, elements=elems, young=200.0,
                         poisson=0.3, thickness=0.5, density=2.0,
                         loads=np.zeros(2 * nodes.shape[0]),
                         fixed_dofs=np.concatenate([2 * bot,
                                                    2 * bot + 1]))
        ref = continuum_response_spectrum(p, 2.5, direction=[1, 0],
                                          n_modes=6, combination="cqc")
        np.testing.assert_allclose(res["displacements"],
                                   ref.displacements, rtol=1e-10)
        np.testing.assert_allclose(res["max_von_mises"],
                                   ref.von_mises.max(), rtol=1e-10)
    elif name in ("dyn-plane-transient-plastic.json",
                  "dyn-solid-transient-plastic.json"):
        # Quasi-static trapezoid past yield + settle: the EXACT
        # residual closed form of homogeneous uniaxial J2 flow —
        # alpha = (sigma_peak - sigma_y)/H = 0.2 in every element,
        # stress-free tip u = L alpha (solvers/
        # continuum_transient_plastic; the committed doc descriptions).
        assert res["plastic"] is True and kind == "transient"
        ep = np.asarray(res["final"]["eq_plastic_strain"])
        np.testing.assert_allclose(ep, 0.2, rtol=1e-2)
        tip = 0.8 if "plane" in name else 0.4
        u = np.abs(np.asarray(res["final"]["displacements"])).max()
        np.testing.assert_allclose(u, tip, rtol=1e-2)
        assert max(res["von_mises_envelope"]) > 12.0
        assert res["plastic_work"][-1] > 0.0
        # dissipation is monotone in the serialized history too
        wp = np.asarray(res["plastic_work"])
        assert np.all(np.diff(wp) >= -1e-9 * wp[-1])
    elif name == "dyn-plane-plastic.json":
        # Thick-wall cylinder at 0.99 p_lim: plastic front has spread
        # from the bore but not collapsed; von Mises capped at sigma_y
        # (perfect plasticity); bore displacement above the elastic
        # extrapolation of the first (elastic) step.
        assert res["element_type"] == "plane" and res["plane_strain"]
        npl = res["n_plastic"]
        assert npl[0] == 0 and npl[-1] > 0
        assert max(res["max_von_mises"]) <= 1.0 * 1.001
        u = np.asarray(res["displacements"])     # (4 steps, 4 dofs)
        lf = np.asarray(res["load_factors"])
        assert u[-1, 0] > u[0, 0] * lf[-1] / lf[0] * 1.02
    elif name == "dyn-plate-identify.json":
        # Slab damage localization: both zone moduli recovered from
        # 12 probe deflections through the banded adjoint — SI units,
        # so this also pins the measurement-scale loss normalization
        # (raw-MSE gradients at micrometre deflections sit under
        # ADAM's eps and the optimizer stalls, banded_inverse.py).
        assert res["element_type"] == "plate"
        assert res["method"] == "banded"
        np.testing.assert_allclose(res["zone_young"],
                                   [1.2e11, 2.4e11], rtol=2e-3)
        assert max(res["zone_rel_error"]) < 2e-3
        assert res["final_loss"] < 1e-6 * res["loss_history"][0]
    elif name == "dyn-plate-plastic.json":
        # One-way SS slab strip at 0.95 of the beam-mechanism limit
        # q_u = 8 Mp/L^2 (nu = 0: cylindrical bending IS the beam;
        # Mp = sigma_y t^2/4 EXACT for even midpoint layers): yield
        # spreads from midspan, EPP fiber stress pinned at sigma_y,
        # secant softened (tests/test_plate_plastic.py anchors).
        assert res["element_type"] == "plate"
        assert res["n_layers"] == 20
        npl = res["n_plastic"]
        assert npl[0] == 0 and npl[-1] >= 4
        np.testing.assert_allclose(max(res["max_von_mises"]), 300.0,
                                   rtol=1e-9)
        lf = np.asarray(res["load_factors"])
        d = np.asarray(res["displacements"])
        np.testing.assert_allclose(d[:, 0], d[:, 1], rtol=1e-9)
        assert d[-1, 0] / lf[-1] > 1.2 * (d[0, 0] / lf[0])
        al = np.asarray(res["final"]["eq_plastic_strain"])
        assert al[7] > 0 and al[8] > 0 and al[0] == 0 and al[15] == 0
    elif name == "dyn-plate.json":
        # Mindlin SRI plate: center deflection on the EXACT hard-SS
        # Mindlin/Navier series (any-thickness closed form) to 0.2%,
        # center moment on Timoshenko's 0.0479 qa^2 to 2%.
        from pinn_fem_tpu.models.plate import mindlin_navier_w
        assert res["element_type"] == "plate"
        w_ex = abs(mindlin_navier_w(1.0, 1.0, 0.5, 0.5, -1000.0,
                                    2e11, 0.3, 0.01))
        np.testing.assert_allclose(res["max_deflection"], w_ex,
                                   rtol=2e-3)
        m_arr = np.asarray(res["moments"])
        np.testing.assert_allclose(m_arr[:, 0].max(), 47.9,
                                   rtol=2.5e-2)
    elif name == "dyn-plane-reliability.json":
        # Determinate uniaxial strip: vM demand = load_scale exactly,
        # so the lognormal R-S FORM index is closed-form on every
        # element (log-linear limit states make FORM exact).
        assert res["element_type"] == "plane"
        zr = np.sqrt(np.log1p(0.15**2))
        zs = np.sqrt(np.log1p(0.2**2))
        b = np.log((2.0 / np.sqrt(1.0225)) / (1.0 / np.sqrt(1.04))) \
            / np.sqrt(zr**2 + zs**2)
        np.testing.assert_allclose(res["beta"], b, rtol=1e-4)
        np.testing.assert_allclose(res["beta_min"], b, rtol=1e-4)
        assert all(res["converged"])
        lo, hi = res["system_pf_bounds"]
        assert 0 < lo <= hi <= 1
    elif name == "dyn-plane-sizing.json":
        # Uniaxial strip, fixed end force: sigma = F/(W t) binds the
        # stress limit uniformly at the EXACT t* = 1/sigma_allow
        # (solvers/continuum_sizing.py anchors).
        assert res["element_type"] == "plane"
        np.testing.assert_allclose(res["thickness"], 0.5, rtol=2e-6)
        np.testing.assert_allclose(res["weight"], 2.0, rtol=2e-6)
    elif name == "dyn-plastic.json":
        # Two-bar serial chain, bilinear hardening: exact endpoint
        # u = 2 L_e (σ/E + (σ − σ_y)/H) = 0.13 at σ = 1.5.
        np.testing.assert_allclose(res["displacements"][-1][0], 0.13,
                                   rtol=1e-9)
        np.testing.assert_allclose(res["final"]["plastic_strain"],
                                   [0.05, 0.05], rtol=1e-9)
        assert res["yielded_elements"] == [0, 1]
    elif kind == "modal":
        w = np.asarray(res["eigenvalues"])
        assert w.shape == (4,) and np.all(w > 0)
        assert np.all(np.diff(w) >= -1e-6)            # ascending
        assert np.asarray(res["mode_shapes"]).shape == (4, 12)
    elif kind == "transient":
        d = np.asarray(res["displacements"])
        assert d.shape == (100, 4) and np.isfinite(d).all()
        # Damped step response: late-time lateral displacement near the
        # static solve of the same load.
        assert d[-1, 0] > 0
    elif kind == "buckling":
        lam = res["load_factors"]
        assert lam[0] is not None and lam[0] > 0
        assert np.asarray(res["axial_forces"]).min() < 0  # compression
    elif kind == "harmonic":
        amp = np.asarray(res["amplitude"])
        assert amp.shape == (120, 2) and np.isfinite(amp).all()
        # A resonance peak exists inside the sweep.
        assert amp[:, 0].max() > 3.0 * amp[0, 0]
    elif kind == "continuation":
        lam = np.asarray(res["load_factors"])
        w = -np.asarray(res["displacements"])[:, 1]  # apex y DOF probe
        # Snap-through signature: positive fold peak at the exact von
        # Mises limit load, negative between the folds, far side reached.
        lam_crit = 2.0 * (1.0 * (1 - 1 / np.sqrt(3))
                          - 1.5 * (1 - 1 / np.sqrt(3)) ** 2
                          + 0.5 * (1 - 1 / np.sqrt(3)) ** 3) / 2 ** 1.5
        np.testing.assert_allclose(lam[w < 1.0].max(), lam_crit, rtol=5e-3)
        assert lam.min() < -0.5 * lam_crit
        assert w.max() > 2.0
    elif kind == "spectrum":
        assert 0.9 < res["mass_fraction"] <= 1.0 + 1e-6
        assert np.asarray(res["displacements"]).max() > 0
    elif kind == "random" and name == "dyn-fatigue.json":
        # Braced 3-story tower under white-noise wind: the full fatigue
        # chain (member-stress PSDs -> Dirlik damage -> Basquin life +
        # Davenport peak).  examples/fatigue_assessment.py validates the
        # same numbers against the rainflow-counted transient.
        f = res["fatigue"]
        dr = np.asarray(f["damage_rate"])
        crit = int(np.argmax(dr))
        assert crit == 0                     # first-story column governs
        np.testing.assert_allclose(f["stress_rms"][crit], 3.7527,
                                   rtol=1e-3)
        np.testing.assert_allclose(f["nu0_hz"][crit], 0.6545, rtol=1e-3)
        np.testing.assert_allclose(f["life_s"][crit] / 3600.0, 343.7,
                                   rtol=0.01)
        assert all(v is not None and v > 0 for v in f["life_s"])
        # Internal consistency: the spectral-moment RMS must agree with
        # random_response's own trapezoid RMS (area = 1 -> stress==force).
        np.testing.assert_allclose(f["stress_rms"], res["force_rms"],
                                   rtol=1e-6)
        # Davenport peak factor sits in its physical band for 1 h.
        g = np.asarray(f["peak_factor"])
        assert np.all((g > 2.5) & (g < 6.0))
        assert np.all(np.asarray(f["expected_peak_stress"])
                      > 2.5 * np.asarray(f["stress_rms"]))
    elif kind == "random":
        psd = np.asarray(res["psd"])
        rms = np.asarray(res["rms"])
        assert psd.shape == (200, 4) and np.isfinite(psd).all()
        assert np.all(psd >= 0) and np.all(rms > 0)
        # The lateral (x) tower-top DOFs dominate the RMS under the
        # lateral load pattern.
        assert rms[0] > rms[1] and rms[2] > rms[3]
    elif kind == "identification" and res.get("domain") == "modal":
        # EMA: E and rho from frequencies + phi^2 sensors.
        for k, true in res["true_values"].items():
            np.testing.assert_allclose(res["identified"][k], true,
                                       rtol=0.02)
        assert max(res["frequency_rel_error"]) < 1e-3
    elif kind == "identification" and res.get("domain") == "frequency":
        # FRF model updating: all four parameters from one sweep.
        for k, true in res["true_values"].items():
            np.testing.assert_allclose(res["identified"][k], true,
                                       rtol=0.02)
        assert res["fit_rms_log"] < 1e-3
        hist = np.asarray(res["loss_history"])
        assert hist[-1] < 1e-6 * hist[0]
    elif kind == "identification" and res.get("mode") == "field":
        # Spatial E(x) profile recovered as an MLP field, element by
        # element, to 6% (tests/test_transient_inverse.py measures 2.5%
        # worst-case on this exact configuration).
        vals = np.asarray(res["identified_field"]["at_elements"]["values"])
        true = np.asarray(res["true_values"])
        np.testing.assert_allclose(vals, true, rtol=0.06)
        assert res["field_max_rel_error"] < 0.06
        hist = np.asarray(res["loss_history"])
        assert hist[-1] < 1e-3 * hist[0]
    elif kind == "identification":
        # Twin-data recovery: E and rho to 2% (density is invisible to
        # statics; the discrete adjoint through the integrator sees it).
        np.testing.assert_allclose(res["identified"]["young"],
                                   res["true_values"]["young"], rtol=0.02)
        np.testing.assert_allclose(res["identified"]["density"],
                                   res["true_values"]["density"],
                                   rtol=0.02)
        assert res["final_loss"] < 1e-6
        hist = np.asarray(res["loss_history"])
        assert hist[-1] < 1e-3 * hist[0]               # actually converged
        assert res["fit_rmse_rel"] < 1e-2
    elif kind == "reliability":
        # FORM on the 10-bar: the critical limit state is the most
        # stressed member (e2), its beta is pinned (1.914 measured,
        # seed-free deterministic), and the 20000-sample Monte-Carlo
        # estimate agrees with the FORM system bounds to first order.
        assert all(res["converged"])
        assert res["labels"][res["critical_limit_state"]] == "stress e2"
        np.testing.assert_allclose(res["beta_min"], 1.914, rtol=5e-3)
        lo, hi = res["system_pf_bounds"]
        assert 0 < lo <= hi <= 1
        mc = res["mc"]
        assert mc["n_samples"] == 20000
        # FORM linearization error + MC noise: one-sided slack bands.
        assert 0.6 * lo <= mc["pf"] <= 1.3 * hi
        # alpha rows are unit direction cosines.
        a = np.asarray(res["alpha"])
        np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0,
                                   atol=1e-5)
        # Breitung correction present and mild at these curvatures.
        ps = np.asarray(res["pf_sorm"])
        pf = np.asarray(res["pf"])
        assert ps.shape == pf.shape
        m = pf > 1e-12
        np.testing.assert_allclose(ps[m], pf[m], rtol=0.15)
    elif kind == "sizing" and name == "dyn-sizing-rbdo.json":
        # The assess-then-redesign arc: dyn-reliability measures the
        # uniform design at beta_min 1.91; this doc redesigns the same
        # 10-bar to beta >= 3 everywhere.  The achieved betas are the
        # FULL HL-RF authority recompute, so "on the floor" here means
        # the PMA inner loop and the HL-RF search agree.
        assert res["converged"]
        assert res["target_beta"] == 3.0
        b = res["reliability_beta"]
        finite = [v for v in b if v is not None]
        assert res["min_reliability_beta"] == min(finite)
        assert min(finite) >= 3.0 * (1.0 - 1e-3)
        # Binding: most members sit ON the beta-3 surface (measured:
        # six within 1e-4, the bracing at 4.59-4.75, one gauge member
        # never stressed -> None).
        assert sum(1 for v in finite if v <= 3.0 * 1.001) >= 5
        assert b.count(None) == 1
        # The redesign costs real mass over the beta-1.91 original
        # (uniform areas, mass 23.3 start -> 13.3 optimized).
        np.testing.assert_allclose(res["mass"], 13.32, rtol=0.02)
    elif kind == "sizing" and name == "dyn-sizing-fatigue.json":
        # Fatigue-life-floor sizing of the braced tower: every member
        # must survive 200 h of the white-noise wind.  Feasible (the
        # polish guarantees it), binding within AL slack, and the
        # critical first/second-story members sit ON the floor (the
        # measured design: mass 4.45, lives 200.0-220.5 h).
        assert res["converged"]
        floor = res["fatigue_min_life_s"]
        assert floor == 200.0 * 3600.0
        assert res["min_fatigue_life_s"] >= floor * (1.0 - 1e-3)
        assert res["min_fatigue_life_s"] <= floor * 1.25
        life = res["fatigue_life_s"]
        crit = res["fatigue_critical_element"]
        finite = [v for v in life if v is not None]
        assert life[crit] == min(finite)
        # The constraint really acted: the design is far off the gauge
        # and the two zero-stress panel members live forever.
        assert res["mass"] > 3.0
        assert sum(1 for v in life if v is None) == 0
        assert max(finite) > 1e9 * 3600.0    # unstressed chords
    elif kind == "sizing" and name == "dyn-sizing-dynamic.json":
        # Payload-carrying 10-bar under stress + Euler buckling + an f1
        # floor: all three constraints must be satisfied AND binding
        # (the measured design: mass 14.0 vs 5.5 stress-only, stress
        # ratio 0.98, buckling ratio 0.95, f1 exactly on the floor).
        assert res["converged"]
        assert res["max_stress_ratio"] <= 1.0 + 1e-6
        assert res["max_buckling_ratio"] <= 1.0 + 1e-6
        floor = res["min_frequency_hz"]
        f1 = res["fundamental_frequency_hz"]
        assert floor * (1.0 - 1e-3) <= f1 <= floor * 1.05
        # The dynamic constraints cost real mass over the stress-only
        # optimum (5.51): anything near that would mean they didn't act.
        assert res["mass"] > 2.0 * 5.51
        assert max(res["max_stress_ratio"],
                   res["max_buckling_ratio"]) > 0.9   # binding, not slack
    elif kind == "sizing":
        # 10-bar cantilever: the AL optimum must tie the FSD fixpoint
        # (solver-level exactness is pinned in tests/test_sizing.py).
        from pinn_fem_tpu.io.schema import parse_problem_file
        from pinn_fem_tpu.solvers.sizing import fully_stressed_design

        assert res["converged"]
        assert res["max_stress_ratio"] <= 1.0 + 1e-6
        assert res["mass"] < 0.3 * res["mass_initial"]
        areas = np.asarray(res["areas"])
        assert np.all(areas >= 0.001 - 1e-12)
        p = parse_problem_file(str(CORPUS / name)).problem
        fsd = fully_stressed_design(p, 2.0, min_area=0.001)
        assert res["mass"] <= fsd.mass * 1.01
        # Classic force paths: loaded diagonals at A = sqrt(2)/2 / 1,
        # the unloaded verticals/tip members at the gauge.
        np.testing.assert_allclose(areas[[6, 7, 8]], np.sqrt(2.0) / 2.0,
                                   rtol=0.02)
        assert areas[4] < 0.01 and areas[5] < 0.01
    elif kind == "reduction":
        f_red = np.asarray(res["reduced_frequencies_hz"])
        err = np.asarray(res["frequency_rel_error"])
        assert res["n_reduced_dofs"] == 8          # 4 master DOFs + 4 CB
        assert np.all(np.isfinite(f_red)) and np.all(np.diff(f_red) >= 0)
        # Craig-Bampton with 4 interface modes nails the low modes.
        assert err[0] < 1e-3 and err[:4].max() < 0.05
    else:
        pytest.fail(f"unknown analysis kind {kind}")
