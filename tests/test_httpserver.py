"""Diagnostic HTTP stub: behavior parity with the reference
(reference server/httpserver.py — GET / echoes repr((requestline,
headers)), other paths 404, HEAD 200)."""

import threading
import urllib.error
import urllib.request
from http.server import HTTPServer

from fastdet_tpu.cli.httpserver import DiagHandler


def _serve():
    httpd = HTTPServer(("127.0.0.1", 0), DiagHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, t


def test_root_echoes_request():
    httpd, t = _serve()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/"
        req = urllib.request.Request(url, headers={"X-Probe": "hello"})
        body = urllib.request.urlopen(req, timeout=5).read().decode()
        assert body.startswith("('GET / HTTP/1.1'")
        assert "'X-Probe': 'hello'" in body
    finally:
        httpd.shutdown()
        t.join(timeout=5)


def test_other_paths_404_and_head_200():
    httpd, t = _serve()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            urllib.request.urlopen(base + "/nope", timeout=5)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert e.read() == b"not found"
        # HEAD: the reference's do_HEAD calls send_response without
        # end_headers (server/httpserver.py:13-14); BaseHTTPRequestHandler
        # only BUFFERS headers until end_headers, so the reference
        # actually answers HEAD with zero bytes and a clean close.
        # Reproduced bug-for-bug: the socket must close empty, and the
        # server must stay healthy for the next request.
        import socket

        s = socket.create_connection(httpd.server_address, timeout=5)
        s.sendall(b"HEAD / HTTP/1.1\r\nHost: x\r\n\r\n")
        assert s.recv(1024) == b""
        s.close()
        assert urllib.request.urlopen(base + "/", timeout=5).status == 200
    finally:
        httpd.shutdown()
        t.join(timeout=5)
