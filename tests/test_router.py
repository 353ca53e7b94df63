"""Multi-host serving router: balancing, quarantine, streaming passthrough.

Backends are stdlib stub HTTP servers — no model load; this tests the DCN
fan-out layer itself (SURVEY §5.8 stance: cross-host scaling is request
routing, not collectives).
"""

import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from zonos_tpu.serving.router import BackendPool, make_handler


def _stub_backend(name: str, fail: bool = False, slow: float = 0.0):
    class Stub(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            if fail:
                self.send_error(500)
                return
            if self.path == "/metrics":
                # Minimal Prometheus page; values vary per backend so the
                # router aggregate is distinguishable from a single proxy.
                n = {"one": 1, "two": 2}.get(name, 5)
                page = (
                    "# TYPE zonos_requests_total counter\n"
                    f'zonos_requests_total{{endpoint="/generate",status="200"}} {n}\n'
                    "# TYPE zonos_rtf histogram\n"
                    f'zonos_rtf_bucket{{le="4"}} {n}\n'
                    f'zonos_rtf_bucket{{le="+Inf"}} {n}\n'
                    f"zonos_rtf_sum {n * 3.5:g}\n"
                    f"zonos_rtf_count {n}\n"
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)
                return
            payload = json.dumps({"backend": name, "path": self.path}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if slow:
                time.sleep(slow)
            if self.path == "/stream":
                # chunked PCM-style response
                self.send_response(200)
                self.send_header("Transfer-Encoding", "chunked")
                self.send_header("X-Sample-Rate", "44100")
                self.end_headers()
                for chunk in (b"AAAA", b"BBBBBB", b"CC"):
                    self.wfile.write(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                    self.wfile.flush()
                self.wfile.write(b"0\r\n\r\n")
                return
            payload = json.dumps({"backend": name, "echo": body.decode()}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture
def router_with_two_backends():
    b1, u1 = _stub_backend("one")
    b2, u2 = _stub_backend("two")
    pool = BackendPool([u1, u2], cooldown_s=2.0)
    rsrv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(pool, timeout_s=10))
    threading.Thread(target=rsrv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{rsrv.server_address[1]}"
    yield url, pool, (b1, b2), (u1, u2)
    for s in (rsrv, b1, b2):
        s.shutdown()


def test_round_robin_and_stats(router_with_two_backends):
    url, pool, _, _ = router_with_two_backends
    seen = set()
    for _ in range(6):
        with urllib.request.urlopen(url + "/health") as r:
            seen.add(json.loads(r.read())["backend"])
    assert seen == {"one", "two"}  # both backends serve traffic
    with urllib.request.urlopen(url + "/router_stats") as r:
        stats = json.loads(r.read())
    assert all(b["healthy"] for b in stats["backends"])


def test_post_proxies_body(router_with_two_backends):
    url, *_ = router_with_two_backends
    req = urllib.request.Request(
        url + "/generate", data=b'{"text":"hello"}', method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert out["echo"] == '{"text":"hello"}'


def test_stream_chunks_pass_through(router_with_two_backends):
    url, *_ = router_with_two_backends
    req = urllib.request.Request(url + "/stream", data=b"{}", method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.headers.get("X-Sample-Rate") == "44100"
        data = r.read()
    assert data == b"AAAABBBBBBCC"


def test_dead_backend_quarantined():
    bdead, udead = _stub_backend("dead")
    bdead.shutdown()  # refuse connections
    bok, uok = _stub_backend("ok")
    pool = BackendPool([udead, uok], cooldown_s=30.0)
    rsrv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(pool, timeout_s=3))
    threading.Thread(target=rsrv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{rsrv.server_address[1]}"
    try:
        ok_count = 0
        for _ in range(6):
            try:
                with urllib.request.urlopen(url + "/health") as r:
                    if json.loads(r.read()).get("backend") == "ok":
                        ok_count += 1
            except urllib.error.HTTPError:
                pass  # first hit may 502 while the dead backend gets flagged
        # After quarantine, traffic flows exclusively to the live backend.
        assert ok_count >= 4
        with urllib.request.urlopen(url + "/router_stats") as r:
            stats = json.loads(r.read())
        health = {b["url"]: b["healthy"] for b in stats["backends"]}
        assert health[uok] is True
        assert health[udead] is False
    finally:
        rsrv.shutdown()
        bok.shutdown()


def test_all_dead_returns_503():
    b, u = _stub_backend("x")
    b.shutdown()
    pool = BackendPool([u], cooldown_s=30.0)
    pool.release(pool.acquire(), ok=False)  # mark it down
    rsrv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(pool, timeout_s=2))
    threading.Thread(target=rsrv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{rsrv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(url + "/health")
        assert exc.value.code == 503
    finally:
        rsrv.shutdown()


def test_aggregate_metrics_sums_series():
    from zonos_tpu.serving.router import aggregate_metrics

    page_a = (
        "# HELP zonos_requests_total HTTP requests\n"
        "# TYPE zonos_requests_total counter\n"
        'zonos_requests_total{endpoint="/generate",status="200"} 3\n'
        "# TYPE zonos_rtf histogram\n"
        'zonos_rtf_bucket{le="4"} 2\n'
        'zonos_rtf_bucket{le="+Inf"} 3\n'
        "zonos_rtf_sum 10.5\n"
        "zonos_rtf_count 3\n"
    )
    page_b = (
        "# TYPE zonos_requests_total counter\n"
        'zonos_requests_total{endpoint="/generate",status="200"} 4\n'
        'zonos_requests_total{endpoint="/stream",status="200"} 1\n'
        "# TYPE zonos_rtf histogram\n"
        'zonos_rtf_bucket{le="4"} 1\n'
        'zonos_rtf_bucket{le="+Inf"} 1\n'
        "zonos_rtf_sum 2.5\n"
        "zonos_rtf_count 1\n"
    )
    text = aggregate_metrics([page_a, page_b])
    assert 'zonos_requests_total{endpoint="/generate",status="200"} 7' in text
    assert 'zonos_requests_total{endpoint="/stream",status="200"} 1' in text
    assert 'zonos_rtf_bucket{le="4"} 3' in text
    assert 'zonos_rtf_bucket{le="+Inf"} 4' in text
    assert "zonos_rtf_sum 13" in text
    assert "zonos_rtf_count 4" in text
    # Meta lines kept once, before any sample of that metric.
    assert text.count("# TYPE zonos_requests_total counter") == 1
    assert text.index("# TYPE zonos_rtf") < text.index("zonos_rtf_bucket")


def test_router_metrics_fans_out_to_all_backends(router_with_two_backends):
    url, pool, _, _ = router_with_two_backends
    with urllib.request.urlopen(url + "/metrics") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    # one + two = 3 across the fleet (each backend alone reports 1 or 2).
    assert 'zonos_requests_total{endpoint="/generate",status="200"} 3' in text
    assert "zonos_rtf_count 3" in text


def test_admin_posts_broadcast_to_all_backends(router_with_two_backends):
    """POST /lexicon and /speakers are idempotent admin ops: the router
    fans them out to every healthy backend instead of picking one."""
    url, pool, _, _ = router_with_two_backends
    req = urllib.request.Request(
        url + "/lexicon",
        data=json.dumps({"entries": {"x": "ks"}}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read())
    assert got["backends_ok"] == 2
    backends = {res.get("backend") for res in got["results"]}
    assert backends == {"one", "two"}
    # /generate still goes to exactly one backend.
    req = urllib.request.Request(
        url + "/generate", data=b'{"text":"hi"}', method="POST"
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read())
    assert got.get("backend") in ("one", "two")


def test_client_disconnect_does_not_quarantine_backend():
    """A client aborting a chunked /stream mid-flight breaks the ROUTER's
    client socket, not the backend. The router must not quarantine the
    (healthy) backend it was proxying from (advisor r3 finding #2)."""
    import socket
    import struct

    served_done = threading.Event()

    class Slow(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            self.send_response(200)
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                for _ in range(500):
                    chunk = b"x" * 8192
                    self.wfile.write(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                    self.wfile.flush()
                    time.sleep(0.005)
                self.wfile.write(b"0\r\n\r\n")
            except OSError:
                pass  # router hung up after ITS client left — expected
            finally:
                served_done.set()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Slow)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    u = f"http://127.0.0.1:{srv.server_address[1]}"
    pool = BackendPool([u], cooldown_s=60.0)
    rsrv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(pool, timeout_s=30))
    threading.Thread(target=rsrv.serve_forever, daemon=True).start()
    try:
        # Raw client: start the stream, read a little, then RST the socket.
        s = socket.create_connection(("127.0.0.1", rsrv.server_address[1]))
        s.sendall(
            b"POST /stream HTTP/1.1\r\nHost: x\r\nContent-Length: 2\r\n\r\n{}"
        )
        s.recv(4096)
        s.setsockopt(
            socket.SOL_SOCKET, socket.SO_LINGER, struct.pack("ii", 1, 0)
        )
        s.close()
        # Wait for the proxy handler to notice, then for its finally-release.
        assert served_done.wait(timeout=30), "backend never saw the hang-up"
        time.sleep(0.5)
        assert pool.healthy_urls() == [u], "healthy backend was quarantined"
    finally:
        rsrv.shutdown()
        srv.shutdown()


def test_backend_4xx_relays_without_quarantine():
    """A backend's 400 must pass through verbatim and NOT quarantine it —
    one malformed request must never take a healthy backend offline."""
    class Bad(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            payload = json.dumps({"error": "unknown speaker"}).encode()
            self.send_response(400)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Bad)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    u = f"http://127.0.0.1:{srv.server_address[1]}"
    pool = BackendPool([u], cooldown_s=60.0)
    rsrv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(pool, timeout_s=10))
    threading.Thread(target=rsrv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{rsrv.server_address[1]}"
    try:
        req = urllib.request.Request(url + "/generate", data=b"{}", method="POST")
        try:
            urllib.request.urlopen(req)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert json.loads(e.read())["error"] == "unknown speaker"
        assert pool.healthy_urls() == [u]  # NOT quarantined
        # Broadcast path: same rule — a 4xx answer is "reached", so the
        # router reports per-backend results with a 200 and no quarantine.
        req = urllib.request.Request(url + "/lexicon", data=b"{}", method="POST")
        with urllib.request.urlopen(req) as r:
            got = json.loads(r.read())
        assert got["backends_ok"] == 0
        assert got["results"][0]["error"] == "unknown speaker"
        assert pool.healthy_urls() == [u]
    finally:
        rsrv.shutdown()
        srv.shutdown()
