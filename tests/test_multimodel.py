"""Multi-model registry + concurrent multi-client serving (BASELINE.md
configs 4 and 5): full:80 and rsu:9 endpoints served simultaneously,
sequential and concurrent clients, correct per-endpoint routing.

Uses tiny architectures for CPU-test speed; the registry/routing logic is
architecture-independent.
"""

import threading
import time

import numpy as np
import pytest

from tests.test_server import ServerThread
from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.client import DetectClient
from fastdet_tpu.runtime.engine import DetectionEngine
from fastdet_tpu.runtime.server import ModelService


@pytest.fixture(scope="module")
def two_model_server():
    spec_a, params_a = weights.load_model("synthetic:tiny", num_classes=80)
    spec_b, params_b = weights.load_model("synthetic:tiny", num_classes=9)
    eng_a = DetectionEngine(spec_a, params_a, mode="f32", buckets=(1, 2, 4))
    eng_b = DetectionEngine(spec_b, params_b, mode="f32", buckets=(1, 2, 4))
    services = {
        "full": ModelService(eng_a, name="full"),
        "rsu": ModelService(eng_b, name="rsu"),
    }
    with ServerThread(services) as st:
        yield st, eng_a, eng_b


def _jpeg(seed):
    rng = np.random.RandomState(seed)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    return jpeg.encode_rgb(img, 90)


def test_both_endpoints_route_to_their_model(two_model_server):
    st, eng_a, eng_b = two_model_server
    data = _jpeg(0)
    results = {}
    for path in ("full", "rsu"):
        c = DetectClient("127.0.0.1", st.port, path)
        c.open()
        c.request(1, 0.5, data)
        _, records = c.wait_response(1, timeout=30)
        results[path] = records
        c.close()
    # 80-class model can emit classes >9; 9-class model never does —
    # and both endpoints must actually DETECT (an empty rsu list would
    # satisfy the class-range check vacuously)
    assert results["full"] and results["rsu"]
    assert all(1 <= r[0] <= 9 for r in results["rsu"])
    assert results["full"] != results["rsu"]


def test_unknown_endpoint_rejected(two_model_server):
    st, *_ = two_model_server
    import socket

    s = socket.create_connection(("127.0.0.1", st.port), 5)
    s.send(b"FEED 12345 nosuch\r\n")
    assert s.recv(100) == b"!INVALID\r\n"
    s.close()


def test_concurrent_clients_both_models(two_model_server):
    """Config 5: concurrent streams across both endpoints; every client
    gets its own correct response; the batcher coalesces same-model
    frames."""
    st, eng_a, eng_b = two_model_server
    n_clients = 6
    errors = []
    counts = []
    # Barrier per request wave: all clients release their frame at the
    # same instant so same-model frames land inside one batching window.
    # Without it, full-suite load on a 1-CPU host can space the requests
    # out enough that every batch holds a single frame and the
    # frames > batches coalescing assertion below flakes.
    wave = threading.Barrier(n_clients, timeout=60)

    def client_task(i):
        try:
            path = "full" if i % 2 == 0 else "rsu"
            c = DetectClient("127.0.0.1", st.port, path)
            c.open()
            for reqid in range(1, 4):
                wave.wait()
                c.request(reqid, 0.5, _jpeg(100 + i * 10 + reqid))
                _, records = c.wait_response(reqid, timeout=30)
                if path == "rsu" and any(r[0] > 9 for r in records):
                    errors.append(f"client {i}: rsu class out of range")
                counts.append(len(records))
            c.close()
        except Exception as e:  # pragma: no cover
            errors.append(f"client {i}: {e!r}")

    threads = [threading.Thread(target=client_task, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert errors == []
    assert len(counts) == n_clients * 3
    # the continuous batcher actually batched: strictly fewer device
    # calls than frames (frames >= batches is TRUE BY CONSTRUCTION and
    # would pass with batching completely broken)
    svc_frames = sum(s.frames for s in st.server.services.values())
    svc_batches = sum(s.batches for s in st.server.services.values())
    assert svc_frames > svc_batches, (svc_frames, svc_batches)
