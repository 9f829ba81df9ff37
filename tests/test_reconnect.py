"""Elastic recovery: RemoteDetector survives a server restart."""

import time

import numpy as np
import pytest

from tests.test_server import ServerThread
from fastdet_tpu import client_api
from fastdet_tpu.client_api import RemoteDetector
from fastdet_tpu.runtime.server import build_services


def test_reconnect_after_server_restart(monkeypatch):
    monkeypatch.setattr(client_api, "REQUEST_TIMEOUT", 0.3)
    frame = np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8)

    st1 = ServerThread(build_services([])).__enter__()
    det = None
    try:
        port = st1.port
        det = RemoteDetector(f"rtsp://127.0.0.1:{port}/detect")
        got = []
        det.on_result = got.append

        det.process_image(frame)
        deadline = time.time() + 5
        while not got and time.time() < deadline:
            det.update()
            time.sleep(0.02)
        assert len(got) == 1
    except BaseException:
        # an early failure must not leak st1's loop/port (a later bind
        # on the same port would fail with EADDRINUSE, masking it)
        if det is not None:
            det.close()
        st1.__exit__()
        raise

    # kill the server: requests now time out; after RECONNECT_AFTER
    # timeouts the client re-opens... against a new server on the SAME port
    st1.__exit__()
    time.sleep(0.1)
    for _ in range(RemoteDetector.RECONNECT_AFTER):
        det.process_image(frame)
        t0 = time.time()
        while det.num_pending_requests and time.time() - t0 < 2:
            det.update()
            time.sleep(0.02)
    # server comes back on the same port
    st2 = ServerThread(build_services([]))
    st2.server.port = port
    st2.__enter__()
    try:
        # trigger remaining timeouts until reconnect fires, then verify
        deadline = time.time() + 10
        recovered = False
        while time.time() < deadline:
            det.process_image(frame)
            t0 = time.time()
            while time.time() - t0 < 1.5:
                det.update()
                if got and got[-1].request_id >= 2 and det.reconnects > 0:
                    recovered = True
                    break
                time.sleep(0.02)
            if recovered:
                break
        assert recovered, f"reconnects={det.reconnects}, results={len(got)}"
        det.close()
    finally:
        st2.__exit__()
