"""HTTP API server tests: route/wrapper parity with the reference backend
contract (server.js + routes/fem.js), exercised against a live server."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from pinn_fem_tpu.serve.server import start_background


@pytest.fixture(scope="module")
def server_port():
    httpd, port = start_background(port=0, quiet=True)
    yield port
    httpd.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=360) as r:
        return r.status, json.loads(r.read())


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=360) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server_port):
    status, body = _get(server_port, "/api/health")
    assert status == 200
    assert body["status"] == "ok"
    assert "timestamp" in body


def test_info(server_port):
    status, body = _get(server_port, "/api/fem/info")
    assert status == 200
    assert "fem" in body["solvers"] and "pinn" in body["solvers"]


def test_unknown_route_404(server_port):
    status, body = _post(server_port, "/api/fem/nope", {})
    assert status == 404


def test_solve_fem_route(server_port):
    body = {
        "nodes": [
            {"x": 0, "y": 0, "fixed": True},
            {"x": 1, "y": 0, "fixed_y": True},
        ],
        "elements": [{"nodes": [0, 1]}],
        "material": {"young": 210e9, "area": 0.01},
        "loads": [0, 0, 1000, 0],
        "solver_config": {"max_iterations": 50, "tolerance": 1e-6},
    }
    status, resp = _post(server_port, "/api/fem/solve", body)
    assert status == 200
    assert resp["success"] is True
    result = resp["result"]
    assert result["converged"] is True
    assert result["displacements"][2] == pytest.approx(1000 / 2.1e9, rel=1e-4)


def test_solve_generic_route(server_port):
    body = json.load(open(
        "/root/reference/FEM/python/examples/json/example1.json"
    ))
    status, resp = _post(server_port, "/api/fem/solve-generic", body)
    assert status == 200
    assert resp["success"] is True
    np.testing.assert_allclose(
        resp["result"]["displacements"], [0, 0, 1, 0, 2, 0, 3, 0], atol=2e-5
    )


def test_solve_pinn_route(server_port):
    body = {
        "nodes": [
            {"x": 0, "y": 0, "fixed": True},
            {"x": 1, "y": 0, "fixed_y": True},
        ],
        "elements": [{"nodes": [0, 1]}],
        "material": {"young": 100e9, "area": 0.01},
        "loads": [0, 0, 1e6, 0],
        "measured_disp": [5e-4],
        "measured_dofs": [2],
        "solver_type": "newton_raphson",
        "solver_config": {"max_iterations": 60, "tolerance": 1e-10},
    }
    status, resp = _post(server_port, "/api/fem/solve-pinn", body)
    assert status == 200
    ident = resp["result"]["identified_params"]
    assert ident["young"] * ident["area"] == pytest.approx(2e9, rel=1e-3)


def test_error_wrapper_500(server_port):
    status, resp = _post(server_port, "/api/fem/solve", {"nodes": "bad"})
    assert status == 500
    assert resp["success"] is False
    assert "error" in resp and "details" in resp


def test_static_ui_served(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/", timeout=30) as r:
        html = r.read().decode()
    assert "PINN-FEM-TPU" in html
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/app.js", timeout=30
    ) as r:
        assert "solve-generic" in r.read().decode()


def test_concurrent_requests_no_interference(server_port):
    """The reference's only concurrency hazard was same-millisecond temp
    file collisions (pythonRunner.js:75-77, fixed here by serving
    in-process).  Drive N simultaneous solve-generic requests with
    DIFFERENT loads and check each response matches its own input."""
    import threading

    def payload(scale):
        return {
            "nodes": [
                {"x": 0, "y": 0, "fixed": True},
                {"x": 1, "y": 0, "fixed_y": True},
                {"x": 2, "y": 0, "fixed_y": True},
                {"x": 3, "y": 0, "fixed_y": True},
            ],
            "elements": [[0, 1], [1, 2], [2, 3]],
            "loads": [0, 0, 0, 0, 0, 0, scale, 0],
            "material": {"young": 1.0, "area": 1.0, "density": 1.0},
            "solver_type": "fem",
        }

    scales = [0.5, 1.0, 1.5, 2.0]
    results = [None] * len(scales)

    def worker(i, s):
        status, body = _post(server_port, "/api/fem/solve-generic", payload(s))
        results[i] = (status, body)

    threads = [threading.Thread(target=worker, args=(i, s))
               for i, s in enumerate(scales)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for (status, body), s in zip(results, scales):
        assert status == 200 and body["success"], (s, body)
        u = body["result"]["displacements"]
        np.testing.assert_allclose(
            u[2::2], [s * 1.0, s * 2.0, s * 3.0], atol=1e-4,
            err_msg=f"scale {s} got {u}",
        )


def test_solve_batch_route(server_port):
    """Batched serving: B load cases in one request (extension — the
    reference spawns one Python process per request)."""
    template = {
        "nodes": [
            {"x": 0, "y": 0, "fixed": True},
            {"x": 1, "y": 0, "fixed_y": True},
            {"x": 2, "y": 0, "fixed_y": True},
            {"x": 3, "y": 0, "fixed_y": True},
        ],
        "elements": [[0, 1], [1, 2], [2, 3]],
        "loads": [0, 0, 0, 0, 0, 0, 1.0, 0],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "solver_type": "fem",
    }
    scales = [0.5, 1.0, 2.0]
    loads_batch = [[0, 0, 0, 0, 0, 0, s, 0] for s in scales]
    status, body = _post(server_port, "/api/fem/solve-batch",
                         {"problem": template, "loads_batch": loads_batch})
    assert status == 200 and body["success"], body
    r = body["result"]
    assert r["batch"] == 3 and all(r["converged"])
    for row, s in zip(r["displacements"], scales):
        np.testing.assert_allclose(
            row[2::2], [s, 2 * s, 3 * s], atol=1e-4)


def test_warmup_covers_all_routes():
    """warmup() exercises every advertised route without raising (it
    charges the XLA cache at server start; failures must be contained
    but here every doc must actually succeed)."""
    import io
    from contextlib import redirect_stdout

    from pinn_fem_tpu.serve.server import _ROUTES, _warmup_docs, warmup

    covered = {p for p, _ in _warmup_docs()}
    expected = {p for p in _ROUTES
                if p not in ("/api/fem/solve-pinn", "/api/fem/solve-batch")}
    assert covered == expected
    buf = io.StringIO()
    with redirect_stdout(buf):
        warmup(quiet=False)
    out = buf.getvalue()
    assert "FAILED" not in out, out
    # One line per warmup DOC (a route may warm several program
    # families — identification charges all four).
    assert out.count("warmup ") == len(_warmup_docs())
