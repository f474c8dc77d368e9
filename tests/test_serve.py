"""Serving layer tests: micro-batching service + HTTP front end."""

import json
import threading
import time
import urllib.request

import pytest

from ezpz_tpu import serve

from .helpers import CASES_DIR


def _txt(name):
    import os

    return open(os.path.join(CASES_DIR, name, "problem.md")).read()


def test_hello():
    assert "ready" in serve.hello()


def test_service_single_solve():
    svc = serve.SolverService()
    try:
        out = svc.solve_text(_txt("tiny"))
        assert out["converged"]
        assert abs(out["points"]["q"][0]) < 1e-4
        assert abs(out["points"]["q"][1]) < 1e-4
        # The response declares which solve path ran (CPU default: f64,
        # whose iteration counts are reference-comparable).
        assert out["precision"] in ("f64", "mixed")
        assert out["iterations_comparable"] == (out["precision"] == "f64")
    finally:
        svc.shutdown()


def test_service_batches_concurrent_same_topology():
    svc = serve.SolverService(batch_window_ms=50.0)
    txt = _txt("two_rectangles")
    svc.solve_text(txt)  # warm compile so the batch window isn't starved
    results = [None] * 8
    errors = []

    def work(i):
        try:
            results[i] = svc.solve_text(txt)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    svc.shutdown()
    assert not errors
    assert all(r is not None and r["converged"] for r in results)
    # The 8 concurrent requests must have shared batches.
    assert svc.stats["batches"] < svc.stats["requests"]


def test_service_mixed_precision():
    """precision='mixed' (the TPU default via 'auto') serves the same
    solutions at the f64-verified tolerance."""
    from ezpz_tpu.serve import SolverService

    svc = SolverService(batch_window_ms=1.0, precision="mixed")
    try:
        out = svc.solve_text(_txt("tiny"))
        assert out["converged"]
        assert not out["unsatisfied"]
        assert "points" in out
        # Mixed-path responses are labeled: their iteration counts are NOT
        # comparable to reference-pinned pure-f64 counts.
        assert out["precision"] == "mixed"
        assert out["iterations_comparable"] is False
    finally:
        svc.shutdown()


def test_service_per_request_precision_override():
    """A request can force the pure-f64 path on a mixed-default service
    (e.g. large-coordinate sketches, or reference-comparable iteration
    counts)."""
    svc = serve.SolverService(batch_window_ms=1.0, precision="mixed")
    try:
        out = svc.solve_text(_txt("tiny"), precision="f64")
        assert out["converged"]
        assert out["precision"] == "f64"
        assert out["iterations_comparable"] is True
        with pytest.raises(ValueError):
            svc.solve_text(_txt("tiny"), precision="f128")
    finally:
        svc.shutdown()


def test_service_parse_error():
    svc = serve.SolverService()
    try:
        with pytest.raises(ValueError):
            svc.solve_text("# constraints\nbogus(p)\n\n# guesses\np roughly (0,0)\n")
    finally:
        svc.shutdown()


def test_http_server_roundtrip():
    from http.server import ThreadingHTTPServer

    # Start the server on an ephemeral port in a thread.
    import ezpz_tpu.serve as sv

    service = sv.SolverService()
    from http.server import BaseHTTPRequestHandler

    # Reuse run_server's handler logic via a tiny inline server.
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            text = self.rfile.read(length).decode()
            try:
                result = service.solve_text(text)
                body = json.dumps(result).encode()
                code = 200
            except Exception as e:
                body = json.dumps({"error": str(e)}).encode()
                code = 400
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/solve", data=_txt("tiny").encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["converged"]
    finally:
        server.shutdown()
        service.shutdown()
