"""Diagnostic HTTP stub: behavior parity with the reference
(reference server/httpserver.py — GET / echoes repr((requestline,
headers)), other paths 404, HEAD zero bytes)."""

import asyncio
import socket
import threading
import urllib.error
import urllib.request

from fastdet_tpu.cli.httpserver import DiagServer


class _Stub:
    """Run a DiagServer on a background asyncio loop."""

    def __enter__(self):
        self.srv = DiagServer(host="127.0.0.1", port=0)
        self.loop = asyncio.new_event_loop()

        def runner():
            asyncio.set_event_loop(self.loop)
            try:
                self.loop.run_until_complete(self.srv.serve())
            except asyncio.CancelledError:
                pass

        self.thread = threading.Thread(target=runner, daemon=True)
        self.thread.start()
        for _ in range(200):
            if self.srv.bound_port is not None:
                return self
            import time

            time.sleep(0.01)
        raise RuntimeError("diag server did not start")

    def __exit__(self, *exc):
        self.loop.call_soon_threadsafe(
            lambda: [t.cancel() for t in asyncio.all_tasks(self.loop)])
        self.thread.join(timeout=5)
        if not self.thread.is_alive():
            self.loop.close()   # release the epoll/self-pipe fds

    @property
    def base(self):
        return f"http://127.0.0.1:{self.srv.bound_port}"


def test_root_echoes_request():
    with _Stub() as st:
        req = urllib.request.Request(
            st.base + "/", headers={"X-Probe": "hello"})
        body = urllib.request.urlopen(req, timeout=5).read().decode()
        assert body.startswith("('GET / HTTP/1.1'")
        assert "'X-Probe': 'hello'" in body


def test_other_paths_404_and_head_zero_bytes():
    with _Stub() as st:
        try:
            urllib.request.urlopen(st.base + "/nope", timeout=5)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert e.read() == b"not found"
        # HEAD: the reference's do_HEAD calls send_response without
        # end_headers (server/httpserver.py:13-14), which only BUFFERS
        # the status line — the reference answers HEAD with zero bytes
        # and a clean close. Reproduced bug-for-bug: the socket must
        # close empty, and the server must stay healthy afterwards.
        s = socket.create_connection(
            ("127.0.0.1", st.srv.bound_port), timeout=5)
        s.sendall(b"HEAD / HTTP/1.1\r\nHost: x\r\n\r\n")
        assert s.recv(1024) == b""
        s.close()
        assert urllib.request.urlopen(st.base + "/", timeout=5).status == 200
