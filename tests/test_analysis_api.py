"""The "analysis" JSON block (io/analysis.py) through CLI and HTTP tiers.

A dynamics extension of the reference's statics-only problem-JSON
contract: the same problem document plus {"analysis": {...}} routes to
modal/transient solvers, via python -m pinn_fem_tpu.cli.generic and the
/api/fem/modal + /api/fem/transient HTTP routes.  Frequencies are checked
against the fixed-fixed chain closed form (tests/test_modal.py derives
it); the transient run against conservation + the static limit."""

import json
import subprocess
import sys
import urllib.request

CLI_ENV = {  # force CPU in subprocesses (the box's one TPU must stay free)
    "PATH": "/usr/bin:/bin",
    "HOME": "/root",
    "PYTHONPATH": "/root/repo:/root/.axon_site",
    "JAX_PLATFORMS": "cpu",
}

import numpy as np
import pytest

from pinn_fem_tpu.serve.server import start_background


def chain_problem_json(n_elm=8, analysis=None):
    n = n_elm + 1
    doc = {
        "description": "fixed-fixed unit chain",
        "nodes": [[float(i)] for i in range(n)],
        "elements": [[i, i + 1] for i in range(n_elm)],
        "material": {"young": 3.0, "area": 0.7, "density": 2.0},
        "loads": [0.0] * n,
        "fixed_dofs": [0, n - 1],
        "solver_type": "fem",
    }
    if analysis:
        doc["analysis"] = analysis
    return doc


def exact_lambdas(n_elm, young=3.0, density=2.0, k=None):
    theta = np.pi * np.arange(1, n_elm) / n_elm
    lam = np.sort((young / density) * (2.0 - 2.0 * np.cos(theta)))
    return lam[:k] if k else lam


@pytest.fixture(scope="module")
def server_port():
    httpd, port = start_background(port=0, quiet=True)
    yield port
    httpd.shutdown()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=360) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_cli_modal_analysis(tmp_path):
    doc = chain_problem_json(analysis={"type": "modal", "n_modes": 4})
    pf = tmp_path / "modal.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "modal.res.json").read_text())
    assert res["success"] and res["analysis"] == "modal"
    np.testing.assert_allclose(res["eigenvalues"],
                               exact_lambdas(8, k=4), rtol=1e-4)
    # omegas/frequencies consistent; shapes included for this small mesh.
    np.testing.assert_allclose(np.array(res["omegas"]) ** 2,
                               res["eigenvalues"], rtol=1e-5)
    shapes = np.array(res["mode_shapes"])
    assert shapes.shape == (4, 9)
    assert np.all(shapes[:, 0] == 0.0) and np.all(shapes[:, -1] == 0.0)
    log = (tmp_path / "modal.log").read_text()
    assert "ANALYSIS SUMMARY (modal)" in log


def test_cli_transient_analysis(tmp_path):
    # Undamped free chain under a step load with auto dt: displacement
    # must oscillate around (and repeatedly cross) the static solution.
    n_elm = 8
    doc = chain_problem_json(n_elm=n_elm)
    doc["fixed_dofs"] = [0]
    doc["loads"] = [0.0] * n_elm + [1.0]
    doc["analysis"] = {
        "type": "transient", "dt": "auto", "n_steps": 4000,
        "record_every": 40, "probe_nodes": [n_elm],
        "amplitude": {"type": "step"},
    }
    pf = tmp_path / "trans.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "trans.res.json").read_text())
    assert res["success"] and res["analysis"] == "transient"
    tip = np.array(res["displacements"])[:, 0]
    assert tip.shape == (100,)
    # Static tip displacement of the fixed-free chain: sum L/(EA) = n/EA.
    u_static = n_elm / (3.0 * 0.7)
    assert 0.8 * u_static < tip.max() < 2.2 * u_static
    crossings = np.sum(np.diff(np.sign(tip - u_static)) != 0)
    assert crossings >= 3
    # Undamped: energy bounded (no blow-up).
    e = np.array(res["kinetic_energy"]) + np.array(res["strain_energy"])
    assert np.isfinite(e).all() and e.max() < 10.0 * e[len(e) // 4]


def test_http_modal_route(server_port):
    doc = chain_problem_json(analysis={"n_modes": 3})  # type from route
    status, body = _post(server_port, "/api/fem/modal", doc)
    assert status == 200, body
    res = body["result"]  # server wraps as {"success", "result"}
    assert body["success"] and res["analysis"] == "modal"
    np.testing.assert_allclose(res["eigenvalues"],
                               exact_lambdas(8, k=3), rtol=1e-4)


def test_http_transient_route(server_port):
    doc = chain_problem_json()
    doc["fixed_dofs"] = [0]
    doc["loads"] = [0.0] * 8 + [1.0]
    doc["analysis"] = {"dt": "auto", "n_steps": 200, "record_every": 20,
                       "probe_nodes": [8]}
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 200, body
    res = body["result"]
    assert body["success"] and res["analysis"] == "transient"
    assert len(res["times"]) == 10
    assert np.isfinite(np.array(res["displacements"])).all()


def test_http_transient_ensemble(server_port):
    """Batched amplitudes through the transient route: per-row probe
    histories scale with the load (linear), stress envelopes included."""
    doc = chain_problem_json()
    doc["fixed_dofs"] = [0]
    doc["loads"] = [0.0] * 8 + [1.0]
    doc["analysis"] = {
        "dt": 0.1, "n_steps": 200, "record_every": 20,
        "probe_nodes": [8], "damping": [0.1, 0.0],
        "amplitudes": [[0.5] * 200, [1.0] * 200],
    }
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 200, body
    res = body["result"]
    assert res["ensemble"] and res["batch"] == 2
    d = np.array(res["displacements"])      # (2, 10, 1)
    assert d.shape == (2, 10, 1)
    np.testing.assert_allclose(d[1], 2.0 * d[0], rtol=1e-4, atol=1e-8)
    env = np.array(res["max_stress"])       # (2, nelm)
    assert env.shape == (2, 8)
    np.testing.assert_allclose(env[1], 2.0 * env[0], rtol=1e-4)


def test_http_buckling_route(server_port):
    """Braced-column closed form through the HTTP tier: lam_1 = k_b L/P
    (tests/test_buckling.py derives it).  Uniform material here, so
    lam_1 = EA (brace stiffness) with an x-sway mode at node 1."""
    doc = {
        "nodes": [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 10.0, "area": 1.0, "density": 1.0},
        "loads": [0, 0, 0, -1.0, 0, 0],
        "fixed_dofs": [0, 1, 4, 5],
        "solver_type": "fem",
        "analysis": {"n_modes": 2},
    }
    status, body = _post(server_port, "/api/fem/buckling", doc)
    assert status == 200, body
    res = body["result"]
    assert res["analysis"] == "buckling"
    np.testing.assert_allclose(res["load_factors"], [10.0, 10.0], rtol=1e-4)
    np.testing.assert_allclose(res["axial_forces"], [-1.0, 0.0], atol=1e-5)


def test_http_harmonic_route(server_port):
    """SDOF closed form through HTTP: 2-node bar, k = EA/L = 4, m = 1,
    |X| = 1/sqrt((k - m w^2)^2 + (c w)^2) (tests/test_harmonic.py)."""
    doc = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 4.0, "area": 1.0, "density": 2.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"damping": [0.3, 0.05],
                     "omegas": {"start": 0.5, "stop": 4.0, "num": 15},
                     "probe_nodes": [1]},
    }
    status, body = _post(server_port, "/api/fem/harmonic", doc)
    assert status == 200, body
    res = body["result"]
    assert res["analysis"] == "harmonic"
    om = np.array(res["omegas"])
    c = 0.3 * 1.0 + 0.05 * 4.0
    expect = 1.0 / np.sqrt((4.0 - om**2) ** 2 + (c * om) ** 2)
    np.testing.assert_allclose(np.array(res["amplitude"])[:, 0], expect,
                               rtol=1e-4)


def test_http_spectrum_route(server_port):
    """SDOF closed form through HTTP: u_peak = Sa m / k (k=4, m=1) with a
    tabulated Sa interpolated at the mode's omega (omega = 2 -> Sa = 2.5
    midway on the table)."""
    doc = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 4.0, "area": 1.0, "density": 2.0},
        "loads": [0.0, 0.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"sa": {"omegas": [1.0, 3.0], "values": [2.0, 3.0]},
                     "n_modes": 1},
    }
    status, body = _post(server_port, "/api/fem/spectrum", doc)
    assert status == 200, body
    res = body["result"]
    assert res["analysis"] == "spectrum"
    np.testing.assert_allclose(res["omegas"], [2.0], rtol=1e-5)
    np.testing.assert_allclose(res["displacements"][1], 2.5 / 4.0,
                               rtol=1e-4)
    np.testing.assert_allclose(res["mass_fraction"], 1.0, rtol=1e-4)


def test_bad_analysis_type_errors(server_port):
    doc = chain_problem_json(analysis={"type": "spectral"})
    status, body = _post(server_port, "/api/fem/modal", doc)
    # analysis.type explicitly set wins over the route default -> error.
    assert status == 500 and body["success"] is False
    assert "spectral" in body["error"]


def test_http_random_route(server_port):
    """White-noise SDOF through HTTP: rms^2 = pi S0 / (2 k c) within
    quadrature tolerance (k = 4, c = alpha m = 0.5)."""
    doc = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 4.0, "area": 1.0, "density": 2.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"psd": 0.37,
                     "omegas": {"start": 0.001, "stop": 60.0,
                                "num": 6000},
                     "damping": [0.5, 0.0], "probe_nodes": [1]},
    }
    status, body = _post(server_port, "/api/fem/random", doc)
    assert status == 200, body
    res = body["result"]
    assert res["analysis"] == "random"
    sigma2 = np.array(res["rms"])[0] ** 2
    np.testing.assert_allclose(sigma2, np.pi * 0.37 / (2 * 4.0 * 0.5),
                               rtol=0.05)


def test_transient_stress_envelope_option():
    """include_stress_envelope adds the per-element |stress| envelope to
    a single-run transient; undamped step response envelope == 2x the
    static stress on an SDOF bar (dynamic amplification)."""
    from pinn_fem_tpu.io.analysis import run_transient

    from pinn_fem_tpu import Material, TrussProblem

    p = TrussProblem(
        nodes=np.array([0.0, 1.0]), elements=np.array([[0, 1]]),
        material=Material(young=4.0, area=1.0, density=2.0),
        loads=np.array([0.0, 1.0]), fixed_dofs=np.array([0]), dimension=1)
    res = run_transient(p, {
        "type": "transient", "dt": 0.005, "n_steps": 2000,
        "record_every": 200, "probe_nodes": [1],
        "include_stress_envelope": True,
    })
    env = np.asarray(res["max_stress"])
    assert env.shape == (1,)
    np.testing.assert_allclose(env[0], 2.0 * 1.0, rtol=2e-3)  # 2x F/A


# ---------------------------------------------------------------------------
# Round-3 VERDICT #2: prestress / moving load / checkpoint / reduction
# reach the JSON + HTTP tiers.
# ---------------------------------------------------------------------------


def taut_chain_json(n_nodes=9, tension=1.0, young=100.0, analysis=None):
    """2D pretensioned chain (axial DOFs fixed): transverse spectrum is
    the taut-string closed form (T/(rho A h^2))(2 - 2 cos(j pi/n)) —
    tests/test_buckling.py derives it."""
    fixed = sorted([2 * i for i in range(n_nodes)]
                   + [1, 2 * (n_nodes - 1) + 1])
    up = [0.0] * (2 * n_nodes)
    for i in range(n_nodes):
        up[2 * i] = (tension / young) * i
    doc = {
        "nodes": [[float(i), 0.0] for i in range(n_nodes)],
        "elements": [[i, i + 1] for i in range(n_nodes - 1)],
        "material": {"young": young, "area": 1.0, "density": 1.0},
        "loads": [0.0] * (2 * n_nodes),
        "fixed_dofs": fixed,
        "dimension": 2,
        "solver_type": "fem",
    }
    if analysis:
        doc["analysis"] = analysis
    return doc, up


def test_http_modal_prestress(server_port):
    """Prestressed modal through HTTP: explicit-u prestress spec gives
    the taut-string spectrum; without prestress the transverse block is
    singular (lowest eigenvalue ~ 0)."""
    n = 9
    doc, up = taut_chain_json(n_nodes=n)
    doc["analysis"] = {"n_modes": 3, "prestress": {"u": up}}
    status, body = _post(server_port, "/api/fem/modal", doc)
    assert status == 200, body
    res = body["result"]
    assert res["prestressed"] is True
    theta = np.pi * np.arange(1, 4) / (n - 1)
    np.testing.assert_allclose(res["eigenvalues"],
                               2.0 - 2.0 * np.cos(theta), rtol=1e-3)
    doc["analysis"] = {"n_modes": 1}
    status, body = _post(server_port, "/api/fem/modal", doc)
    assert status == 200
    assert body["result"]["eigenvalues"][0] < 1e-4


def test_http_modal_prestress_from_own_loads(server_port):
    """"prestress": {"fix_dofs": ...} solves the problem's own loads for
    the base state with the transverse DOFs held (they have no stiffness
    before tension exists): an axial pull T shifts the transverse
    spectrum to T * (2 - 2 cos theta)."""
    n = 9
    doc, _ = taut_chain_json(n_nodes=n, tension=2.0)
    # Free the x DOFs (except the anchored left end) so the pull can
    # stretch the chain; transverse interior DOFs stay free for modes.
    doc["loads"][2 * (n - 1)] = 2.0   # axial pull at the right end
    doc["fixed_dofs"] = [0, 1, 2 * (n - 1) + 1]
    doc["analysis"] = {"n_modes": 2, "prestress": {
        "fix_dofs": [2 * i + 1 for i in range(n)]}}
    status, body = _post(server_port, "/api/fem/modal", doc)
    assert status == 200, body
    assert body["result"]["prestressed"] is True
    theta = np.pi * np.arange(1, 3) / (n - 1)
    # The pulled chain's LOWEST modes are transverse (T=2 string); the
    # axial modes sit far above (E=100).
    np.testing.assert_allclose(body["result"]["eigenvalues"],
                               2.0 * (2.0 - 2.0 * np.cos(theta)),
                               rtol=1e-3)


def test_http_transient_moving_load(server_port):
    """Moving-load JSON contract: the load spec replaces the amplitude
    contract; the probe responds while the load crosses."""
    n = 11
    doc, up = taut_chain_json(n_nodes=n)
    doc["analysis"] = {
        "dt": 0.05, "n_steps": 400, "record_every": 40,
        "probe_nodes": [n // 2], "damping": [0.2, 0.0],
        "prestress": {"u": up},
        "load": {"type": "moving", "path_nodes": list(range(n)),
                 "speed": 0.5, "magnitude": -1.0, "component": 1},
    }
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 200, body
    res = body["result"]
    assert res["moving_load"] is True and res["prestressed"] is True
    uy = np.array(res["displacements"])[:, 1]   # probe y DOF
    assert np.isfinite(uy).all()
    assert np.abs(uy).max() > 1e-3              # the crossing load acts
    # Conflict guard: amplitude + moving load is rejected.
    doc["analysis"]["amplitude"] = {"type": "step"}
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 500 and "moving load" in body["error"]


def test_http_transient_base_excitation(server_port):
    """Seismic base-excitation JSON contract: -M iota a_g(t) effective
    forces (relative coordinates) from a sine ground-acceleration
    history; served from the host tier like every small transient."""
    n = 6
    doc = {
        "nodes": [[float(i)] for i in range(n)],
        "elements": [[i, i + 1] for i in range(n - 1)],
        "material": {"young": 2.0, "area": 1.0, "density": 3.0},
        "loads": [0.0] * n,
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {
            "dt": 0.05, "n_steps": 400, "record_every": 10,
            "probe_nodes": [n - 1], "damping": [0.05, 0.0],
            "load": {"type": "base_acceleration",
                     "history": {"type": "sine",
                                 "frequency_hz": 0.3 / (2 * np.pi)},
                     "scale": 0.5},
        },
    }
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 200, body
    res = body["result"]
    assert res["load_type"] == "base_acceleration"
    assert res["moving_load"] is False
    u = np.array(res["displacements"])[:, 0]
    assert np.isfinite(u).all() and np.abs(u).max() > 1e-3
    # Conflict guard: amplitude + base acceleration is rejected.
    doc["analysis"]["amplitude"] = {"type": "step"}
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 500 and "base_acceleration load" in body["error"]
    # Direction must match the problem dimension.
    del doc["analysis"]["amplitude"]
    doc["analysis"]["load"]["direction"] = [1.0, 0.0]
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 500 and "direction" in body["error"]


def test_transient_checkpoint_resume_api(tmp_path):
    """Checkpoint/resume through the analysis block: a resumed run
    returns exactly the remaining segments of an uninterrupted history."""
    from pinn_fem_tpu.io.analysis import run_analysis
    from pinn_fem_tpu.io.schema import parse_problem_dict

    doc = chain_problem_json()
    doc["fixed_dofs"] = [0]
    doc["loads"] = [0.0] * 8 + [1.0]
    base = {
        "type": "transient", "dt": 0.05, "n_steps": 200,
        "record_every": 20, "probe_nodes": [8], "damping": [0.1, 0.0],
    }
    problem = parse_problem_dict(doc).problem
    full = run_analysis(problem, dict(base))

    # Uninterrupted checkpointed run == plain run.
    d1 = tmp_path / "ck1"
    out = run_analysis(problem, {**base, "checkpoint": {
        "dir": str(d1), "every": 100}})
    assert out["checkpointed"] is True
    np.testing.assert_allclose(out["displacements"],
                               full["displacements"], rtol=1e-5,
                               atol=1e-8)

    # Preempted run: first 100 steps persisted, then a resumed 200-step
    # request returns the SECOND half, equal to the full history's tail.
    d2 = tmp_path / "ck2"
    run_analysis(problem, {**base, "n_steps": 100, "checkpoint": {
        "dir": str(d2), "every": 100}})
    tail = run_analysis(problem, {**base, "checkpoint": {
        "dir": str(d2), "every": 100, "resume": True}})
    np.testing.assert_allclose(
        np.array(tail["displacements"]),
        np.array(full["displacements"])[5:], rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.array(tail["times"]),
                               np.array(full["times"])[5:], rtol=1e-6)


def test_cli_reduction(tmp_path):
    """Guyan / Craig-Bampton through the CLI: reduced frequencies in the
    response, CB strictly better than Guyan on the same masters."""
    doc = chain_problem_json(analysis={
        "type": "reduction", "method": "guyan", "master_nodes": [4],
        "compare_full": True})
    pf = tmp_path / "red.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "red.res.json").read_text())
    assert res["success"] and res["analysis"] == "reduction"
    assert res["n_reduced_dofs"] == 1
    err_guyan = res["frequency_rel_error"][0]
    assert 0.0 < err_guyan < 0.1       # static tent shape vs sine mode
    assert "ANALYSIS SUMMARY (reduction)" in (tmp_path / "red.log").read_text()


def test_http_reduction_route(server_port):
    doc = chain_problem_json()
    doc["analysis"] = {"method": "craig_bampton", "master_nodes": [4],
                      "n_modes": 2, "compare_full": True}
    status, body = _post(server_port, "/api/fem/reduction", doc)
    assert status == 200, body
    res = body["result"]
    assert res["analysis"] == "reduction"
    assert res["n_reduced_dofs"] == 3          # 1 master + 2 CB modes
    # CB refines Guyan: first-mode error far below the Guyan-only one.
    doc["analysis"] = {"method": "guyan", "master_nodes": [4]}
    status, body2 = _post(server_port, "/api/fem/reduction", doc)
    assert status == 200
    assert (res["frequency_rel_error"][0]
            < 0.1 * body2["result"]["frequency_rel_error"][0])


def test_http_transient_nonlinear_ensemble(server_port):
    """Green-Lagrange ensembles through HTTP (round-3 VERDICT #4): a
    taut-cable has zero linear transverse stiffness, so only the
    nonlinear path produces bounded cubic-stiffness responses."""
    doc = {
        "nodes": [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 100.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 0.0, -1.0, 0.0, 0.0],
        "fixed_dofs": [0, 1, 2, 4, 5],
        "dimension": 2,
        "solver_type": "fem",
        "analysis": {
            "type": "transient", "dt": 0.004, "n_steps": 2000,
            "record_every": 200, "probe_nodes": [1],
            "damping": [2.0, 0.0], "geometric_nonlinear": True,
            "amplitudes": [[0.5] * 2000, [1.0] * 2000],
        },
    }
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 200, body
    res = body["result"]
    assert res["ensemble"] is True and res["geometric_nonlinear"] is True
    w = -np.array(res["displacements"])[:, -1, 1]   # settling y at center
    # Cubic stiffness: w ~ (F/EA)^(1/3); doubling F scales w by 2^(1/3)
    # (wide tolerance: 2000 steps is settling, not settled).
    assert 1.1 < w[1] / w[0] < 1.45


def test_http_harmonic_and_random_prestress(server_port):
    """"prestress" on harmonic/random blocks: the taut-string FRF and
    PSD peak at the string's first natural frequency."""
    n = 9
    doc, up = taut_chain_json(n_nodes=n)
    doc["loads"][2 * (n // 2) + 1] = 1.0
    theta = np.pi / (n - 1)
    w1 = np.sqrt(2.0 - 2.0 * np.cos(theta))
    doc["analysis"] = {
        "omegas": {"start": 0.5 * w1, "stop": 2.0 * w1, "num": 120},
        "damping": [0.02, 0.0], "probe_dofs": [2 * (n // 2) + 1],
        "prestress": {"u": up},
    }
    status, body = _post(server_port, "/api/fem/harmonic", doc)
    assert status == 200, body
    res = body["result"]
    assert res["prestressed"] is True
    om = np.array(res["omegas"])
    amp = np.array(res["amplitude"])[:, 0]
    np.testing.assert_allclose(om[amp.argmax()], w1, rtol=0.03)

    doc["analysis"]["psd"] = 1.0
    status, body = _post(server_port, "/api/fem/random", doc)
    assert status == 200, body
    res = body["result"]
    assert res["prestressed"] is True
    psd = np.array(res["psd"])[:, 0]
    np.testing.assert_allclose(np.array(res["omegas"])[psd.argmax()], w1,
                               rtol=0.03)


def test_http_modal_damping_calibration_and_mac(server_port):
    """Rayleigh calibration + MAC reach the JSON tier: the returned
    (alpha, beta) reproduce the target ratios at the calibrated modes,
    and MAC against the model's own shapes is the identity pattern."""
    doc = chain_problem_json(analysis={
        "n_modes": 4,
        "damping_calibration": {"zeta": 0.02, "modes": [1, 4]},
    })
    status, body = _post(server_port, "/api/fem/modal", doc)
    assert status == 200, body
    res = body["result"]
    rd = res["rayleigh_damping"]
    w1, w2 = rd["calibrated_at"]["omegas"]
    np.testing.assert_allclose(res["omegas"][0], w1)
    np.testing.assert_allclose(res["omegas"][3], w2)
    for w in (w1, w2):
        np.testing.assert_allclose(
            rd["alpha"] / (2 * w) + rd["beta"] * w / 2, 0.02, rtol=1e-6)

    # MAC against (scaled, sign-flipped) copies of the model's shapes.
    shapes = np.array(res["mode_shapes"])           # (4, ndof)
    doc["analysis"] = {"n_modes": 2,
                       "compare_shapes": (-2.5 * shapes[:2]).tolist()}
    status, body = _post(server_port, "/api/fem/modal", doc)
    assert status == 200, body
    m = np.array(body["result"]["mac"])             # (2, 2)
    np.testing.assert_allclose(np.diag(m), 1.0, rtol=1e-5)
    assert m[0, 1] < 0.05 and m[1, 0] < 0.05


def test_http_identification_route(server_port):
    """Time-domain identification reaches the HTTP tier: a noisy
    synthetic twin trajectory posted to /api/fem/identification recovers
    Young's modulus and reports the fit."""
    doc = {
        "nodes": [[float(i)] for i in range(5)],
        "elements": [[i, i + 1] for i in range(4)],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"dt": 0.05, "n_steps": 400, "params": ["young"],
                     "synthetic": {"young": 2.0, "noise": 0.01,
                                   "seed": 1},
                     "probe_nodes": [4], "damping": [0.05, 0.0],
                     "n_iter": 250, "learning_rate": 0.1},
    }
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["analysis"] == "identification"
    assert res["synthetic"] is True and res["noise"] == 0.01
    np.testing.assert_allclose(res["identified"]["young"], 2.0, rtol=0.05)
    assert res["relative_errors"]["young"] < 0.05
    # The fit cannot beat the injected noise floor, but must reach it.
    assert res["fit_rmse_rel"] < 0.05
    fit = np.asarray(res["fitted_displacements"])
    meas = np.asarray(res["measured_displacements"])
    assert fit.shape == meas.shape == (400, 1)


def test_http_identification_measured(server_port):
    """The "measured" branch: a user-supplied probe history (generated
    out-of-band here) drives the same recovery."""
    import jax

    from pinn_fem_tpu.io.schema import parse_problem_dict
    from pinn_fem_tpu.solvers.transient_inverse import (
        transient_probe_response)

    doc = {
        "nodes": [[float(i)] for i in range(5)],
        "elements": [[i, i + 1] for i in range(4)],
        "material": {"young": 1.0, "area": 1.0, "density": 3.0},
        "loads": [0.0, 0.0, 0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
    }
    p = parse_problem_dict(doc).problem
    true_mat = p.material.replace(young=type(p.material.young)(value=2.0))
    meas = np.asarray(jax.device_get(transient_probe_response(
        p, true_mat, 0.05, 400, np.ones(400), np.array([4]),
        damping=(0.05, 0.0))))
    doc["analysis"] = {"type": "identification", "dt": 0.05,
                       "n_steps": 400, "params": ["young"],
                       "measured": meas.tolist(), "probe_nodes": [4],
                       "damping": [0.05, 0.0], "n_iter": 250,
                       "learning_rate": 0.1, "include_fit": False}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    np.testing.assert_allclose(res["identified"]["young"], 2.0, rtol=0.02)
    assert "fitted_displacements" not in res


def test_identification_input_errors(server_port):
    base = {
        "nodes": [[0.0], [1.0], [2.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
    }
    # Neither measured nor synthetic.
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "exactly one" in body["error"]
    # Wrong measured shape.
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10,
                                "measured": [[0.0]] * 7,
                                "probe_dofs": [2]}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "measured must be" in body["error"]
    # Unknown parameter.
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10,
                                "params": ["poisson"],
                                "synthetic": {"young": 2.0}}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "params must be among" in body["error"]
    # dt="auto" needs twin data (a measurement fixes its own grid).
    doc = {**base, "analysis": {"dt": "auto", "n_steps": 10,
                                "measured": [[0.0]] * 10,
                                "probe_dofs": [2]}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "synthetic" in body["error"]
    # synthetic must be an object, validated before any solve work.
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10,
                                "synthetic": [2.0, 3.0]}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "must be an object" in body["error"]


def test_identification_rejects_above_dense_limit():
    """The forward model traces a dense (ndof, ndof) K; past
    DENSE_DOF_LIMIT the request must fail up front (clear error)
    instead of OOMing mid-scan."""
    from pinn_fem_tpu.io.schema import parse_problem_dict
    from pinn_fem_tpu.io.analysis import run_identification
    from pinn_fem_tpu.solvers.newton import DENSE_DOF_LIMIT

    n = DENSE_DOF_LIMIT + 2  # 1D chain: ndof == n_nodes
    doc = {
        "nodes": [[float(i)] for i in range(n)],
        "elements": [[i, i + 1] for i in range(n - 1)],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0] * (n - 1) + [1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
    }
    problem = parse_problem_dict(doc).problem
    with pytest.raises(ValueError, match="dense-only"):
        run_identification(problem, {"dt": 0.05, "n_steps": 10,
                                     "synthetic": {"young": 2.0}})


def test_http_identification_damping(server_port):
    """Rayleigh alpha/beta identified alongside E over HTTP: the
    synthetic truth integrates with ITS damping, the block's "damping"
    is the starting guess, and the fit uses the identified values."""
    doc = {
        "nodes": [[float(i)] for i in range(5)],
        "elements": [[i, i + 1] for i in range(4)],
        "material": {"young": 1.0, "area": 1.0, "density": 3.0},
        "loads": [0.0, 0.0, 0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"type": "identification", "dt": 0.05,
                     "n_steps": 800,
                     "params": ["young", "alpha", "beta"],
                     "synthetic": {"young": 2.0, "alpha": 0.08,
                                   "beta": 0.02},
                     "probe_nodes": [2, 4], "damping": [0.02, 0.005],
                     "n_iter": 600, "learning_rate": 0.08},
    }
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"]
    np.testing.assert_allclose(res["identified"]["young"], 2.0, rtol=0.02)
    np.testing.assert_allclose(res["identified"]["alpha"], 0.08,
                               rtol=0.05)
    np.testing.assert_allclose(res["identified"]["beta"], 0.02, rtol=0.05)
    assert res["relative_errors"]["alpha"] < 0.05
    # The fit integrates with the IDENTIFIED damping, so it must land on
    # the noise-free measurement.
    assert res["fit_rmse_rel"] < 1e-3


def test_http_frequency_identification(server_port):
    """Frequency-domain identification over HTTP: E, rho, alpha, beta
    fitted to a synthetic FRF amplitude sweep (model updating from
    shaker data), with the log-space fit metric reported."""
    doc = {
        "nodes": [[float(i)] for i in range(5)],
        "elements": [[i, i + 1] for i in range(4)],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"type": "identification", "domain": "frequency",
                     "omegas": {"start": 0.05, "stop": 1.2, "num": 120},
                     "params": ["young", "density", "alpha", "beta"],
                     "synthetic": {"young": 2.0, "density": 3.0,
                                   "alpha": 0.08, "beta": 0.02},
                     "probe_nodes": [2, 4], "damping": [0.02, 0.005],
                     "n_iter": 800, "learning_rate": 0.08},
    }
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["domain"] == "frequency"
    np.testing.assert_allclose(res["identified"]["young"], 2.0, rtol=0.01)
    np.testing.assert_allclose(res["identified"]["density"], 3.0,
                               rtol=0.01)
    np.testing.assert_allclose(res["identified"]["alpha"], 0.08,
                               rtol=0.02)
    np.testing.assert_allclose(res["identified"]["beta"], 0.02, rtol=0.02)
    assert res["relative_errors"]["young"] < 0.01
    assert res["fit_rms_log"] < 1e-3
    fit = np.asarray(res["fitted_amplitude"])
    assert fit.shape == (120, 2) and np.all(fit > 0)


def test_frequency_identification_input_errors(server_port):
    base = {
        "nodes": [[0.0], [1.0], [2.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
    }
    om = {"start": 0.1, "stop": 1.0, "num": 10}
    # Neither measured_amplitude nor synthetic.
    doc = {**base, "analysis": {"domain": "frequency", "omegas": om}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "exactly one" in body["error"]
    # Wrong amplitude-table shape.
    doc = {**base, "analysis": {"domain": "frequency", "omegas": om,
                                "measured_amplitude": [[1.0]] * 7,
                                "probe_dofs": [2]}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "measured_amplitude must be" in body["error"]
    # field mode does not apply to FRF fitting.
    doc = {**base, "analysis": {"domain": "frequency", "omegas": om,
                                "field": "young",
                                "synthetic": {"young": 2.0}}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "not FRF fitting" in body["error"]
    # Unknown domain.
    doc = {**base, "analysis": {"domain": "laplace", "dt": 0.05,
                                "n_steps": 10,
                                "synthetic": {"young": 2.0}}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "domain must be" in body["error"]


def test_http_modal_identification(server_port):
    """Modal-domain identification over HTTP: E and rho recovered from
    synthetic frequencies + phi^2 sensor data (the EMA workflow; the
    spectrum alone only sees the EA/rho ratio)."""
    doc = {
        "nodes": [[float(i)] for i in range(7)],
        "elements": [[i, i + 1] for i in range(6)],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0] * 6 + [1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"type": "identification", "domain": "modal",
                     "params": ["young", "density"],
                     "synthetic": {"young": 2.0, "density": 3.0,
                                   "n_modes": 4},
                     "sensor_nodes": [2, 4, 6],
                     "n_iter": 600, "learning_rate": 0.05},
    }
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["domain"] == "modal"
    np.testing.assert_allclose(res["identified"]["young"], 2.0, rtol=0.01)
    np.testing.assert_allclose(res["identified"]["density"], 3.0,
                               rtol=0.01)
    assert max(res["frequency_rel_error"]) < 1e-3
    assert len(res["fitted_frequencies_hz"]) == 4
    # Without sensors the same request must refuse with the physics.
    doc["analysis"].pop("sensor_nodes")
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "RATIO" in body["error"]


def test_http_modal_field_identification(server_port):
    """Modal-domain FIELD mode over HTTP: a linear rho(x) profile
    recovered from synthetic frequencies + phi^2 sensors."""
    n = 11
    mids = [0.5 + i for i in range(n - 1)]
    true_rho = [1.0 + m / mids[-1] for m in mids]
    doc = {
        "nodes": [[float(i)] for i in range(n)],
        "elements": [[i, i + 1] for i in range(n - 1)],
        "material": {"young": 2.0, "area": 1.0, "density": 1.5},
        "loads": [0.0] * (n - 1) + [1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"type": "identification", "domain": "modal",
                     "field": {"name": "density", "hidden_layers": 1,
                               "neurons_per_layer": 8, "input_dim": 1,
                               "scale": 1.5, "seed": 0},
                     "sensor_nodes": list(range(1, n)),
                     "synthetic": {"density": true_rho, "n_modes": 6},
                     "n_iter": 1500, "learning_rate": 0.02},
    }
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["domain"] == "modal"
    assert res["mode"] == "field" and res["field"] == "density"
    vals = np.asarray(res["identified_field"]["at_elements"]["values"])
    np.testing.assert_allclose(vals, np.asarray(true_rho), rtol=0.05)
    assert res["field_max_rel_error"] < 0.05
    assert max(res["frequency_rel_error"]) < 5e-3
    # Field mode without sensors must refuse with the physics.
    doc["analysis"].pop("sensor_nodes")
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "underdetermine" in body["error"]


def test_http_field_identification(server_port):
    """Field mode over HTTP: a linear per-element E(x) truth profile
    recovered as an MLP field — the reference's NN-property inverse
    driven by transient twin data instead of a static deflection."""
    n = 9
    mids = [0.5 + i for i in range(n - 1)]
    true_e = [1.0 + m / mids[-1] for m in mids]      # linear 1 -> 2
    doc = {
        "nodes": [[float(i)] for i in range(n)],
        "elements": [[i, i + 1] for i in range(n - 1)],
        "material": {"young": 1.5, "area": 1.0, "density": 1.0},
        "loads": [0.0] * (n - 1) + [1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"type": "identification",
                     "field": {"name": "young", "hidden_layers": 1,
                               "neurons_per_layer": 8, "input_dim": 1,
                               "scale": 1.5, "seed": 0},
                     "dt": 0.05, "n_steps": 600,
                     "synthetic": {"young": true_e},
                     "probe_nodes": [2, 4, 6, 8], "damping": [0.05, 0.0],
                     "n_iter": 800, "learning_rate": 0.05,
                     "include_fit": False},
    }
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["mode"] == "field"
    assert res["field"] == "young" and res["synthetic"] is True
    fld = res["identified_field"]
    assert fld["type"] == "nn" and len(fld["at_nodes"]["values"]) == n
    vals = np.asarray(fld["at_elements"]["values"])
    np.testing.assert_allclose(vals, np.asarray(true_e), rtol=0.06)
    assert res["field_max_rel_error"] < 0.06
    assert res["final_loss"] < 1e-3 * res["loss_history"][0]


def test_field_identification_input_errors(server_port):
    base = {
        "nodes": [[0.0], [1.0], [2.0]],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
    }
    # Unknown field-spec key.
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10,
                                "field": {"name": "young", "depth": 3},
                                "synthetic": {"young": 2.0}}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "unknown field keys" in body["error"]
    # Synthetic must carry the identified field's true profile.
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10,
                                "field": "young",
                                "synthetic": {"density": 2.0}}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "synthetic takes only" in body["error"]
    # Profile length must match the element count.
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10,
                                "field": "young",
                                "synthetic": {"young": [1.0, 2.0, 3.0]}}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "per element" in body["error"]
    # params and field are mutually exclusive (no silent ignoring).
    doc = {**base, "analysis": {"dt": 0.05, "n_steps": 10,
                                "field": "young", "params": ["young"],
                                "synthetic": {"young": 2.0}}}
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 500 and "mutually exclusive" in body["error"]


def test_identification_dt_auto(server_port):
    """dt="auto" (Gershgorin step of the TRUE material) in twin mode:
    stable integration and recovery without a hand-picked step."""
    doc = {
        "nodes": [[float(i)] for i in range(5)],
        "elements": [[i, i + 1] for i in range(4)],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 0.0, 0.0, 0.0, 1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
        "analysis": {"dt": "auto", "n_steps": 800, "params": ["young"],
                     "synthetic": {"young": 2.5},
                     "probe_nodes": [4], "damping": [0.05, 0.0],
                     "n_iter": 250, "learning_rate": 0.1,
                     "include_fit": False},
    }
    status, body = _post(server_port, "/api/fem/identification", doc)
    assert status == 200, body
    res = body["result"]
    assert res["dt"] > 0
    np.testing.assert_allclose(res["identified"]["young"], 2.5, rtol=0.03)


# ---------------------------------------------------------------- sizing


def two_bar_json(analysis=None, area=3.0):
    """Symmetric determinate 2-bar (tests/test_sizing.py geometry)."""
    doc = {
        "description": "symmetric two-bar",
        "nodes": [[0.0, 0.0], [2.0, 0.0], [1.0, 1.0]],
        "elements": [[0, 2], [1, 2]],
        "material": {"young": 1.0, "area": area, "density": 1.0},
        "loads": [0.0, 0.0, 0.0, 0.0, 0.0, -1.0],
        "fixed_dofs": [0, 1, 2, 3],
        "dimension": 2,
        "solver_type": "fem",
    }
    if analysis:
        doc["analysis"] = analysis
    return doc


def test_cli_sizing_fsd(tmp_path):
    """Determinate truss through the CLI: FSD is the exact
    stress-constrained optimum (both bars fully stressed)."""
    limit = 0.8
    doc = two_bar_json(analysis={"type": "sizing", "method": "fsd",
                                 "stress_limit": limit,
                                 "min_area": 1e-9})
    pf = tmp_path / "sizing.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "sizing.res.json").read_text())
    assert res["success"] and res["analysis"] == "sizing"
    assert res["converged"] and res["method"] == "fsd"
    a_true = (1.0 / np.sqrt(2.0)) / limit        # |N| / sigma_max
    np.testing.assert_allclose(res["areas"], a_true, rtol=1e-9)
    np.testing.assert_allclose(res["max_stress_ratio"], 1.0, rtol=1e-9)
    assert res["mass"] < res["mass_initial"]
    assert "sizing" in proc.stdout or (tmp_path / "sizing.log").exists()


def test_http_sizing_adam(server_port):
    """Gradient sizing over HTTP: feasible design near the FSD optimum."""
    limit = 0.8
    doc = two_bar_json(analysis={
        "type": "sizing", "stress_limit": limit, "min_area": 1e-6,
        "n_iter": 120, "outer_rounds": 2, "learning_rate": 0.08})
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["method"] == "adam"
    assert res["max_stress_ratio"] <= 1.0 + 1e-6     # polish guarantees
    mass_fsd = 2.0 * np.sqrt(2.0) * (1.0 / np.sqrt(2.0)) / limit
    assert res["mass"] <= mass_fsd * 1.1
    assert res["mass_reduction"] > 0.4
    assert len(res["history"]) == 240


def test_http_sizing_compliance(server_port):
    """Compliance mode over HTTP: volume held, compliance improves."""
    doc = two_bar_json(area=1.0, analysis={
        "type": "sizing", "objective": "compliance",
        "volume": 2.0 * np.sqrt(2.0), "n_iter": 100, "outer_rounds": 1})
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 200, body
    res = body["result"]
    lengths = np.full(2, np.sqrt(2.0))
    vol = float(np.dot(res["areas"], lengths))
    np.testing.assert_allclose(vol, 2.0 * np.sqrt(2.0), rtol=1e-5)
    # Symmetric problem: the optimum IS the uniform start; the solver
    # must hold it (no drift off the symmetric optimum).
    np.testing.assert_allclose(res["areas"][0], res["areas"][1],
                               rtol=1e-3)


def test_sizing_input_errors(server_port):
    """Invalid sizing specs fail with clear messages, not stack dumps."""
    cases = [
        ({"type": "sizing", "method": "fsd"}, "stress_limit"),
        ({"type": "sizing", "method": "fsd", "stress_limit": 0.5,
          "displacement_limit": 1.0}, "stress-constrained"),
        ({"type": "sizing", "method": "simplex", "stress_limit": 0.5},
         "adam"),
        ({"type": "sizing"}, "gauge minimum"),
        ({"type": "sizing", "objective": "compliance"}, "volume"),
    ]
    for analysis, frag in cases:
        status, body = _post(server_port, "/api/fem/sizing",
                             two_bar_json(analysis=analysis))
        assert status == 500, (analysis, body)
        assert frag in body["error"], (analysis, body["error"])


def test_sizing_rejects_above_dense_limit():
    from pinn_fem_tpu.io.schema import parse_problem_dict
    from pinn_fem_tpu.io.analysis import run_sizing
    from pinn_fem_tpu.solvers.newton import DENSE_DOF_LIMIT

    n = DENSE_DOF_LIMIT + 2
    doc = {
        "nodes": [[float(i)] for i in range(n)],
        "elements": [[i, i + 1] for i in range(n - 1)],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0] * (n - 1) + [1.0],
        "fixed_dofs": [0],
        "solver_type": "fem",
    }
    problem = parse_problem_dict(doc).problem
    with pytest.raises(ValueError, match="dense-only"):
        run_sizing(problem, {"stress_limit": 0.5})


def test_http_sizing_load_cases(server_port):
    """Envelope sizing over HTTP: mirrored skew cases, constraints hold
    for BOTH cases, symmetric design."""
    limit = 0.8
    doc = two_bar_json(area=3.0)
    ca = [0.0] * 4 + [0.8, -1.0]
    cb = [0.0] * 4 + [-0.8, -1.0]
    doc["analysis"] = {
        "type": "sizing", "stress_limit": limit, "min_area": 1e-6,
        "load_cases": [ca, cb],
        "n_iter": 120, "outer_rounds": 3, "learning_rate": 0.08}
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 200, body
    res = body["result"]
    assert res["n_load_cases"] == 2
    assert res["max_stress_ratio"] <= 1.0 + 1e-6
    areas = np.asarray(res["areas"])
    np.testing.assert_allclose(areas[0], areas[1], rtol=1e-3)
    # Per-case displacements: (C, ndof) rows.
    assert np.asarray(res["displacements"]).shape == (2, 6)
    # FSD envelope through the same route must agree.
    doc["analysis"] = {"type": "sizing", "method": "fsd",
                       "stress_limit": limit, "min_area": 1e-6,
                       "load_cases": [ca, cb]}
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 200, body
    fsd = body["result"]
    assert res["mass"] <= fsd["mass"] * 1.02


def test_sizing_oc_past_dense_limit():
    """method "oc": the only sizing method allowed past DENSE_DOF_LIMIT
    (banded optimality criteria; one PCG solve per iteration), with the
    per-element payload gate engaged by include_areas=false."""
    from pinn_fem_tpu.io.analysis import run_sizing
    from pinn_fem_tpu.solvers.newton import DENSE_DOF_LIMIT
    from tests.test_mg import grid_problem

    p = grid_problem(24, 48)
    assert p.ndof > DENSE_DOF_LIMIT
    lengths = np.linalg.norm(
        p.nodes[p.elements[:, 1]] - p.nodes[p.elements[:, 0]], axis=1)
    vol = float(np.sum(lengths))
    # adam/fsd refuse past the dense limit; oc is the documented out.
    with pytest.raises(ValueError, match='method "oc"'):
        run_sizing(p, {"stress_limit": 0.5})
    out = run_sizing(p, {"method": "oc", "objective": "compliance",
                         "volume": vol, "n_iter": 25,
                         "include_areas": False,
                         "include_displacements": False})
    assert out["success"] and out["method"] == "oc"
    assert "areas" not in out and "displacements" not in out
    lo, hi = out["area_range"]
    assert 0 < lo < hi
    hist = np.asarray(out["history"])
    assert hist[-1] < 0.6 * hist[0]          # compliance drops


def test_sizing_oc_input_errors(server_port):
    doc = two_bar_json(analysis={"type": "sizing", "method": "oc",
                                 "stress_limit": 0.5})
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 500 and "compliance" in body["error"]
    doc = two_bar_json(analysis={"type": "sizing", "method": "oc",
                                 "objective": "compliance"})
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 500 and "volume" in body["error"]


def test_http_sizing_fatigue(server_port):
    """Fatigue-life-floor sizing over HTTP: the life keys come back and
    the returned design satisfies the floor (polish guarantees)."""
    doc = two_bar_json(area=1.0, analysis={
        "type": "sizing",
        "fatigue": {"psd": 1e-3,
                    "omegas": {"start": 0.05, "stop": 3.0, "num": 80},
                    "damping": [0.3, 0.001],
                    "sn": {"exponent": 3.0, "coefficient": 1.0},
                    "min_life_hours": 1.0},
        "min_area": 1e-3, "n_iter": 100, "outer_rounds": 2})
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"]
    assert res["fatigue_min_life_s"] == 3600.0
    assert res["min_fatigue_life_s"] >= 3600.0 * (1.0 - 1e-3)
    assert len(res["fatigue_life_s"]) == 2
    assert res["fatigue_method"] == "dirlik"


# ------------------------------------------------------------ reliability


def test_http_reliability_route(server_port):
    """FORM over HTTP: the determinate 2-bar's exact normal R-S beta
    (tests/test_reliability.py closed form) through the full tier."""
    c = (1.0 / np.sqrt(2.0)) / 3.0          # |sigma| at area=3, S=1
    muR, sR, muS, sS = 1.0, 0.1, 1.0, 0.3
    doc = two_bar_json(analysis={
        "type": "reliability",
        "variables": [
            {"name": "S", "kind": "load_scale",
             "distribution": "normal", "mean": muS, "std": sS},
            {"name": "R", "kind": "resistance",
             "distribution": "normal", "mean": muR, "std": sR}],
        "limit_state": {"type": "stress", "variable": "R",
                        "elements": [0]}})
    status, body = _post(server_port, "/api/fem/reliability", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["analysis"] == "reliability"
    beta_exact = (muR - c * muS) / np.hypot(sR, c * sS)
    np.testing.assert_allclose(res["beta"][0], beta_exact, rtol=1e-4)
    assert res["converged"] == [True]
    assert res["labels"] == ["stress e0"]
    lo, hi = res["system_pf_bounds"]
    np.testing.assert_allclose([lo, hi], [res["pf"][0]] * 2, rtol=1e-9)


def test_reliability_input_errors(server_port):
    cases = [
        ({"type": "reliability"}, "random"),
        ({"type": "reliability",
          "variables": [{"name": "S", "kind": "load_scale",
                         "mean": 1.0, "std": 0.1}],
          "limit_state": {"type": "nope"}}, "stress"),
        ({"type": "reliability",
          "variables": [{"name": "S", "kind": "load_scale",
                         "mean": 1.0, "std": 0.1}],
          "limit_state": {"type": "stress", "variable": "R"}},
         "not defined"),
    ]
    for analysis, needle in cases:
        doc = two_bar_json(analysis=analysis)
        status, body = _post(server_port, "/api/fem/reliability", doc)
        assert status == 500 and needle in body["error"], (analysis,
                                                           body)


def test_http_sizing_rbdo(server_port):
    """RBDO over HTTP: the tip-bar closed form through the full tier
    (tests/test_sizing.py test_rbdo_tip_bar_closed_form numbers)."""
    muR, sR, muS, sS, bt = 2.0, 0.2, 1.0, 0.25, 3.0
    doc = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "dimension": 1,
        "solver_type": "fem",
        "analysis": {
            "type": "sizing",
            "reliability": {
                "variables": [
                    {"name": "S", "kind": "load_scale",
                     "distribution": "normal", "mean": muS, "std": sS},
                    {"name": "R", "kind": "resistance",
                     "distribution": "normal", "mean": muR,
                     "std": sR}],
                "target_beta": bt,
                "limit_state": {"type": "stress", "variable": "R"}},
            "min_area": 1e-4, "n_iter": 200, "outer_rounds": 3,
            "learning_rate": 0.08},
    }
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"]
    a_q = muS ** 2 - bt ** 2 * sS ** 2
    roots = np.roots([a_q, -2.0 * muR * muS,
                      muR ** 2 - bt ** 2 * sR ** 2])
    a_true = 1.0 / min(r for r in roots if r > 0)
    np.testing.assert_allclose(res["areas"][0], a_true, rtol=1e-3)
    np.testing.assert_allclose(res["min_reliability_beta"], bt,
                               rtol=1e-3)
    assert res["target_beta"] == bt
    assert len(res["reliability_beta"]) == 1
    # Guard: RBDO is adam-only.
    doc["analysis"]["method"] = "fsd"
    doc["analysis"]["stress_limit"] = 1.0
    status, body = _post(server_port, "/api/fem/sizing", doc)
    assert status == 500 and "adam" in body["error"]


# ----------------------------------------------------------------- frame


def test_http_frame_route(server_port):
    """The 2D frame family over HTTP: the one-element cantilever's
    machine-precision PL^3/3EI identity through the full tier."""
    doc = {
        "nodes": [[0.0, 0.0], [4.0, 0.0]],
        "elements": [[0, 1]],
        "material": {"young": 200.0, "area": 1.0, "inertia": 0.05,
                     "density": 1.0},
        "loads": [0, 0, 0, 0, -1.0, 0],
        "fixed_nodes": [0],
        "analysis": {"type": "static"},
    }
    status, body = _post(server_port, "/api/fem/frame", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["element_type"] == "frame"
    np.testing.assert_allclose(res["displacements"][4],
                               -4.0 ** 3 / (3 * 200.0 * 0.05),
                               rtol=1e-12)
    np.testing.assert_allclose(res["end_moments"][0][0], 4.0,
                               rtol=1e-10)
    # Modal through the same route.
    status, body = _post(server_port, "/api/fem/frame",
                         {**doc, "analysis": {"type": "modal",
                                              "n_modes": 2}})
    assert status == 200 and len(body["result"]["frequencies_hz"]) == 2
    # Error contract: missing inertia -> 500 with a clear message.
    bad = {**doc, "material": {"young": 200.0, "area": 1.0}}
    status, body = _post(server_port, "/api/fem/frame", bad)
    assert status == 500 and "inertia" in body["error"]


def test_cli_plastic_analysis(tmp_path):
    """Elastoplastic statics through the CLI: the single bar's exact
    bilinear endpoint u = L (sigma/E + (sigma - sy)/H) and the residual
    state after an explicit unloading history."""
    doc = {
        "nodes": [[0.0], [2.0]],
        "elements": [[0, 1]],
        "material": {"young": 100.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "analysis": {"type": "plastic", "sigma_y": 1.0, "hardening": 10.0,
                     "target": 1.5, "n_steps": 15, "probe_nodes": [1],
                     "include_history": True},
    }
    pf = tmp_path / "plastic.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "plastic.res.json").read_text())
    assert res["success"] and res["analysis"] == "plastic"
    # Exact bilinear endpoint: u = L (1.5/E + (1.5 - 1)/H) = 0.13.
    np.testing.assert_allclose(res["displacements"][-1][0], 0.13,
                               rtol=1e-9)
    np.testing.assert_allclose(res["final"]["plastic_strain"][0], 0.05,
                               rtol=1e-9)
    assert res["yielded_elements"] == [0]
    assert len(res["history"]["stresses"]) == 15
    # First yield on the ramp happens past lf = 1.0 only.
    lf = np.array(res["load_factors"])
    npl = np.array(res["n_plastic"])
    assert npl[lf <= 1.0].sum() == 0 and npl[lf > 1.0].all()


def test_http_plastic_route(server_port):
    """Cyclic load history over HTTP: residual displacement L eps_p at
    the explicit zero-load step (the plasticity signature)."""
    doc = {
        "nodes": [[0.0], [2.0]],
        "elements": [[0, 1]],
        "material": {"young": 100.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "analysis": {"sigma_y": 1.0, "hardening": 10.0,
                     "load_factors": [0.5, 1.0, 1.25, 1.5, 0.75, 0.0],
                     "probe_nodes": [1]},
    }
    status, body = _post(server_port, "/api/fem/plastic", doc)
    assert status == 200, body
    res = body["result"]
    assert body["success"] and res["analysis"] == "plastic"
    u = np.array(res["displacements"])[:, 0]
    np.testing.assert_allclose(u[-1], 2.0 * 0.05, rtol=1e-9)
    np.testing.assert_allclose(res["final"]["stresses"][0], 0.0,
                               atol=1e-12)
    # Unloading is elastic: same slope as the initial branch.
    np.testing.assert_allclose(u[3] - u[-1], u[1] * 1.5, rtol=1e-9)


def test_plastic_input_errors(server_port):
    doc = {
        "nodes": [[0.0], [2.0]],
        "elements": [[0, 1]],
        "material": {"young": 100.0, "area": 1.0, "density": 1.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "analysis": {"hardening": 10.0},
    }
    status, body = _post(server_port, "/api/fem/plastic", doc)
    assert status == 500 and "sigma_y" in body["error"]
    doc["analysis"] = {"sigma_y": -1.0}
    status, body = _post(server_port, "/api/fem/plastic", doc)
    assert status == 500 and "sigma_y" in body["error"]


def test_cli_transient_plastic(tmp_path):
    """Elastoplastic transient through the CLI ("plasticity" sub-block
    on a transient analysis): a step load past yield on the SDOF bar
    balances KE + SE_el + W_plastic against the external work and
    shakes down to elastic oscillation about the plastic-strain-shifted
    center u_c = L (eps_p + s/E) — the invariants of
    tests/test_plasticity.py, here exercised end-to-end through JSON."""
    doc = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 100.0, "area": 1.0, "density": 2.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "analysis": {"type": "transient", "n_steps": 4000,
                     "record_every": 10, "probe_nodes": [1],
                     "plasticity": {"sigma_y": 1.0, "hardening": 10.0}},
    }
    pf = tmp_path / "tp.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "tp.res.json").read_text())
    assert res["success"] and res["analysis"] == "transient"
    assert res["plastic"] and res["yielded_elements"] == [0]
    w_in = np.array(res["external_work"])
    e_sum = (np.array(res["kinetic_energy"])
             + np.array(res["strain_energy"])
             + np.array(res["plastic_work"]))
    scale = np.abs(w_in).max()
    np.testing.assert_allclose(e_sum, w_in, atol=0.02 * scale)
    assert res["plastic_work"][-1] > 0.05 * scale
    u = np.array(res["displacements"])[:, 0]
    u_c = res["final"]["plastic_strain"][0] + 1.0 / 100.0
    i_q = len(u) // 4
    assert abs(np.mean(u[i_q:]) - u_c) < 0.05 * u_c
    # Envelope: yielded, so above sigma_y but below the elastic
    # overshoot 2 P/A that a linear run would report.
    assert 1.0 < res["stress_envelope"][0] < 2.0


def test_http_transient_plastic_route(server_port):
    """Transient plasticity over HTTP, plus the loud non-composition
    contract (prestress / envelope / non-central methods rejected)."""
    doc = {
        "nodes": [[0.0], [1.0]],
        "elements": [[0, 1]],
        "material": {"young": 100.0, "area": 1.0, "density": 2.0},
        "loads": [0.0, 1.0],
        "fixed_dofs": [0],
        "analysis": {"type": "transient", "n_steps": 800,
                     "record_every": 10, "probe_nodes": [1],
                     "plasticity": {"sigma_y": 1.0, "hardening": 10.0}},
    }
    status, body = _post(server_port, "/api/fem/transient", doc)
    assert status == 200, body
    res = body["result"]
    assert res["plastic"] and res["plastic_work"][-1] > 0.0
    assert res["final"]["accumulated_plastic_strain"][0] > 0.0

    bad = json.loads(json.dumps(doc))
    bad["analysis"]["prestress"] = True
    status, body = _post(server_port, "/api/fem/transient", bad)
    assert status == 500 and "prestress" in body["error"]

    bad = json.loads(json.dumps(doc))
    bad["analysis"]["include_stress_envelope"] = True
    status, body = _post(server_port, "/api/fem/transient", bad)
    assert status == 500 and "envelope" in body["error"]

    bad = json.loads(json.dumps(doc))
    bad["analysis"]["method"] = "newmark"
    bad["analysis"]["dt"] = 0.01
    status, body = _post(server_port, "/api/fem/transient", bad)
    assert status == 500 and "central" in body["error"]


def test_cli_plane_static(tmp_path):
    """Plane-stress uniaxial tension through the CLI (mesh spec +
    edge_loads): the constant-strain closed form u = qx/E,
    v = -nu q y/E is EXACT for Q4, so the JSON tier must hit it to
    round-off."""
    q, w, h = 10.0, 4.0, 2.0
    doc = {
        "element_type": "plane",
        "mesh": {"type": "rect", "width": w, "height": h,
                 "nx": 4, "ny": 2, "element": "quad"},
        "material": {"young": 200.0, "poisson": 0.3, "thickness": 0.5,
                     "density": 1.0},
        # rect_mesh numbering: x fastest, so with nx=4 the left edge is
        # nodes 0,5,10 and the right edge 4,9,14 (bottom row y=0 is 0-4).
        "fixed_x_nodes": [0, 5, 10],
        "fixed_y_nodes": [0, 1, 2, 3, 4],
        "edge_loads": [{"nodes": [4, 9, 14], "traction": [q, 0.0]}],
    }
    pf = tmp_path / "plane.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "plane.res.json").read_text())
    assert res["success"] and res["element_type"] == "plane"
    u = np.array(res["displacements"])
    # Right-top node (index 14): u = qW/E, v = -nu q H / E.
    np.testing.assert_allclose(u[2 * 14], q * w / 200.0, rtol=1e-10)
    np.testing.assert_allclose(u[2 * 14 + 1], -0.3 * q * h / 200.0,
                               rtol=1e-10)
    np.testing.assert_allclose(res["von_mises"], q, rtol=1e-9)
    np.testing.assert_allclose(np.array(res["stresses"])[:, 0], q,
                               rtol=1e-9)


def test_http_plane_route(server_port):
    """Plane family over HTTP: statics + modal through /api/fem/plane,
    plus the error contract (missing poisson -> 500)."""
    doc = {
        "mesh": {"type": "rect", "width": 10.0, "height": 1.0,
                 "nx": 20, "ny": 1, "element": "quad"},
        "material": {"young": 200.0, "poisson": 0.0, "thickness": 0.5,
                     "density": 2.0},
        # Rod limit: clamp left edge x, all y fixed (42 nodes).
        "fixed_x_nodes": [0, 21],
        "fixed_y_nodes": list(range(42)),
        "analysis": {"type": "modal", "n_modes": 2,
                     "include_shapes": False},
    }
    status, body = _post(server_port, "/api/fem/plane", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["element_type"] == "plane"
    # Fixed-free rod: f_1 = c/(4L), c = sqrt(E/rho) = 10 -> 0.25 Hz.
    c = np.sqrt(200.0 / 2.0)
    np.testing.assert_allclose(res["frequencies_hz"][0],
                               c / (4.0 * 10.0), rtol=1e-2)
    # Statics through the same route (type filled in by the route).
    doc2 = {k: v for k, v in doc.items() if k != "analysis"}
    doc2["loads"] = [0.0] * (2 * 42)
    doc2["loads"][2 * 41] = 1.0   # axial tip load on the right edge
    status, body = _post(server_port, "/api/fem/plane", doc2)
    assert status == 200, body
    assert body["result"]["analysis"] == "static"
    bad = {k: v for k, v in doc.items()}
    bad["material"] = {"young": 200.0, "thickness": 0.5}
    status, body = _post(server_port, "/api/fem/plane", bad)
    assert status == 500 and "poisson" in body["error"]


def test_cli_plane_identification(tmp_path):
    """Continuum E identification through the CLI: a soft inclusion
    (one element at half stiffness) recovered per element from
    synthetic full-field measurements."""
    q, w, h = 10.0, 4.0, 2.0
    from pinn_fem_tpu.models.plane import (PlaneProblem, edge_load,
                                           rect_mesh,
                                           solve_plane_static)
    nodes, elems = rect_mesh(w, h, 4, 2, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    bottom = np.flatnonzero(nodes[:, 1] == 0.0)
    fixed = np.concatenate([2 * left, 2 * bottom + 1])
    right = np.flatnonzero(nodes[:, 0] == w)
    order = right[np.argsort(nodes[right, 1])]
    loads = edge_load(nodes, order, [q, 0.0], 0.5)
    e_true = np.full(elems.shape[0], 200.0)
    e_true[3] = 100.0
    u_true = solve_plane_static(PlaneProblem(
        nodes=nodes, elements=elems, young=e_true, poisson=0.3,
        thickness=0.5, density=1.0, loads=loads,
        fixed_dofs=fixed)).displacements
    free = np.setdiff1d(np.arange(u_true.size), fixed)
    doc = {
        "element_type": "plane",
        "nodes": nodes.tolist(), "elements": elems.tolist(),
        "material": {"young": 200.0, "poisson": 0.3, "thickness": 0.5,
                     "density": 1.0},
        "fixed_dofs": fixed.tolist(),
        "loads": loads.tolist(),
        "analysis": {"type": "identification",
                     "measured_dofs": free.tolist(),
                     "measured_u": u_true[free].tolist(),
                     "n_iter": 1500, "learning_rate": 0.05},
    }
    pf = tmp_path / "pid.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "pid.res.json").read_text())
    assert res["success"] and res["analysis"] == "identification"
    np.testing.assert_allclose(res["young"], e_true, rtol=0.03)
    assert res["final_loss"] < 1e-10


def test_cli_plane_banded_large(tmp_path):
    """Above DENSE_DOF_LIMIT the plane static JSON route switches to
    the banded device tier: payload carries probe displacements +
    summaries, and the uniaxial closed form still holds."""
    q, w, h = 10.0, 4.0, 1.0
    nx, ny = 64, 16
    n_right = ny + 1
    right_first = ny * 0 + nx      # rect_mesh: x fastest
    right_nodes = [j * (nx + 1) + nx for j in range(ny + 1)]
    doc = {
        "element_type": "plane",
        "mesh": {"type": "rect", "width": w, "height": h,
                 "nx": nx, "ny": ny, "element": "quad"},
        "material": {"young": 200.0, "poisson": 0.3, "thickness": 0.5,
                     "density": 1.0},
        "fixed_x_nodes": [j * (nx + 1) for j in range(ny + 1)],
        "fixed_y_nodes": list(range(nx + 1)),
        "edge_loads": [{"nodes": right_nodes, "traction": [q, 0.0]}],
        "analysis": {"type": "static", "probe_nodes": [right_nodes[0]],
                     "tolerance": 1e-9},
    }
    pf = tmp_path / "big.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "big.res.json").read_text())
    assert res["success"] and res["tier"] == "banded"
    assert res["relative_residual"] < 1e-8
    # Probe = right-bottom corner: u = qW/E exactly (constant strain).
    np.testing.assert_allclose(res["displacements"][0],
                               q * w / 200.0, rtol=1e-3)
    np.testing.assert_allclose(res["max_von_mises"], q, rtol=2e-3)
    # No full-field payload at this size.
    assert "stresses" not in res and "reactions" not in res
    # Dense-tier analyses refuse loudly past their 8192-DOF budget.
    bad = json.loads(json.dumps(doc))
    bad["mesh"]["nx"], bad["mesh"]["ny"] = 128, 32   # 8514 DOFs
    bad["fixed_x_nodes"] = [j * 129 for j in range(33)]
    bad["fixed_y_nodes"] = list(range(129))
    del bad["edge_loads"]
    bad["analysis"] = {"type": "modal", "n_modes": 2}
    pf2 = tmp_path / "bigmodal.json"
    pf2.write_text(json.dumps(bad))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf2)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode != 0
    log = (tmp_path / "bigmodal.log").read_text()
    assert "8192" in log or "budget" in log


def test_cli_plate_static(tmp_path):
    """Mindlin plate through the CLI (mesh spec + edge supports +
    uniform pressure): center deflection vs the EXACT hard-SS Mindlin
    series (models/plate.py:mindlin_navier_w) to 0.2% at 16×16."""
    from pinn_fem_tpu.models.plate import mindlin_navier_w

    doc = {
        "element_type": "plate",
        "mesh": {"type": "rect", "width": 1.0, "height": 1.0,
                 "nx": 16, "ny": 16},
        "material": {"young": 2e11, "poisson": 0.3,
                     "thickness": 0.01, "density": 7850.0},
        "pressure": -1000.0,
        "supports": {"simply_supported": ["left", "right", "bottom",
                                          "top"]},
        "analysis": {"type": "static"},
    }
    pf = tmp_path / "plate.json"
    pf.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(pf)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=CLI_ENV)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads((tmp_path / "plate.res.json").read_text())
    assert res["success"] and res["element_type"] == "plate"
    w_ex = abs(mindlin_navier_w(1.0, 1.0, 0.5, 0.5, -1000.0,
                                2e11, 0.3, 0.01))
    np.testing.assert_allclose(res["max_deflection"], w_ex, rtol=2e-3)
    assert "PLATE ANALYSIS SUMMARY" in proc.stdout


def test_http_plate_route(server_port):
    """Plate family over HTTP: statics + modal through
    /api/fem/plate, plus the error contract (missing thickness →
    500)."""
    doc = {
        "mesh": {"type": "rect", "width": 1.0, "height": 1.0,
                 "nx": 8, "ny": 8},
        "material": {"young": 2e11, "poisson": 0.3,
                     "thickness": 0.01, "density": 7850.0},
        "supports": {"simply_supported": ["left", "right", "bottom",
                                          "top"]},
        "analysis": {"type": "modal", "n_modes": 1},
    }
    status, body = _post(server_port, "/api/fem/plate", doc)
    assert status == 200, body
    res = body["result"]
    assert res["success"] and res["element_type"] == "plate"
    # SS thin plate: omega_11 = 2 (pi/a)^2 sqrt(D/rho t).
    d = 2e11 * 0.01 ** 3 / (12.0 * (1.0 - 0.09))
    om11 = 2.0 * np.pi ** 2 * np.sqrt(d / (7850.0 * 0.01))
    np.testing.assert_allclose(res["omegas"][0], om11, rtol=2e-2)
    doc2 = {k: v for k, v in doc.items() if k != "analysis"}
    doc2["pressure"] = -1000.0
    status, body = _post(server_port, "/api/fem/plate", doc2)
    assert status == 200, body
    assert body["result"]["analysis"] == "static"
    assert body["result"]["max_deflection"] > 0.0
    bad = dict(doc)
    bad["material"] = {"young": 2e11, "poisson": 0.3}
    status, body = _post(server_port, "/api/fem/plate", bad)
    assert status == 500 and "thickness" in body["error"]
