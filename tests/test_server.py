"""Serving runtime tests: protocol conformance, batching, fault handling.

The acceptance bar (SURVEY.md §7): the UNMODIFIED reference test client
must interoperate with our server — covered by test_reference_client_interop.
"""

import asyncio
import os
import socket
import struct
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from fastdet_tpu import wire
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.client import DetectClient
from fastdet_tpu.runtime.server import (
    DetectionServer,
    DetectorService,
    ModelService,
    build_services,
)

REFERENCE_CLIENT = "/root/reference/server/client.py"


class ServerThread:
    """Run a DetectionServer on a background asyncio loop."""

    def __init__(self, services):
        self.server = DetectionServer(services, port=0, host="127.0.0.1")
        self.loop = None
        self.thread = None

    def __enter__(self):
        self.loop = asyncio.new_event_loop()

        def runner():
            asyncio.set_event_loop(self.loop)
            try:
                self.loop.run_until_complete(self.server.serve())
            except asyncio.CancelledError:
                pass

        self.thread = threading.Thread(target=runner, daemon=True)
        self.thread.start()
        for _ in range(200):
            if self.server.bound_port is not None:
                return self
            time.sleep(0.01)
        raise RuntimeError("server did not start")

    def __exit__(self, *exc):
        def _stop():
            # abort connections first: serve_forever's cancellation path
            # awaits wait_closed(), which hangs while clients hold TCP open
            self.server.request_shutdown()
            for task in asyncio.all_tasks(self.loop):
                task.cancel()

        self.loop.call_soon_threadsafe(_stop)
        self.thread.join(timeout=5)
        alive = self.thread.is_alive()
        if not alive:
            self.loop.close()   # release the epoll/self-pipe fds
        assert not alive, "server loop failed to shut down"

    @property
    def port(self):
        return self.server.bound_port


@pytest.fixture
def dummy_server():
    with ServerThread(build_services([])) as st:
        yield st


def test_session_udp_buffers_sized_for_bursts(dummy_server):
    """Concurrent clients send whole in-flight windows at once; with
    Linux's default ~212 KB rcvbuf (~2 requests) the kernel silently
    drops datagrams and gap-cancel loses whole frames. The session
    socket must request multi-megabyte buffers (kernel may cap below
    the 4 MB ask, but must be well above the default)."""
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    try:
        sess = dummy_server.server.sessions[0]
        sock = sess.transport.get_extra_info("socket")
        rcv = sock.getsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF)
        assert rcv >= 1 << 20, f"rcvbuf={rcv}"
    finally:
        c.close()


def test_dummy_end_to_end(dummy_server):
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    c.request(1, 0.1, b"any bytes at all")
    msec, records = c.wait_response(1)
    # DummyDetector: cat (16), conf 1.0 -> 255, centered 166.4 box -> 166
    assert records == [(16, 255, 208, 208, 166, 166)]
    c.close()


def test_pipelined_feeds_serialized(dummy_server):
    """Two FEED lines arriving in ONE TCP segment must be handled
    sequentially: exactly one live session survives (the first is
    closed), and the two +OK replies arrive in line order (regression:
    each line spawned an unserialized task; both observed session=None,
    one endpoint leaked, and replies could interleave)."""
    srv = dummy_server.server
    s1 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s1.bind(("", 0))
    s2 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s2.bind(("", 0))
    tcp = socket.create_connection(("127.0.0.1", dummy_server.port), 5)
    try:
        tcp.sendall(wire.pack_feed(s1.getsockname()[1], "detect")
                    + wire.pack_feed(s2.getsockname()[1], "detect"))
        tcp.settimeout(5)
        buf = b""
        while buf.count(b"\n") < 2:
            part = tcp.recv(65536)
            assert part, "server closed mid-handshake"
            buf += part
        lines = buf.split(b"\r\n")[:2]
        port1, sid1 = wire.parse_ok(lines[0] + b"\r\n")
        port2, sid2 = wire.parse_ok(lines[1] + b"\r\n")
        assert sid1 != sid2 and port1 != port2
        deadline = time.time() + 5
        while time.time() < deadline:
            live = [s for s in srv.sessions if not s.closed]
            if len(live) == 1 and srv.sessions[-1].udp_port == port2:
                break
            time.sleep(0.01)
        live = [s for s in srv.sessions if not s.closed]
        assert len(live) == 1, "exactly one session must survive"
        assert live[0].udp_port == port2, "the SECOND feed's session wins"
    finally:
        tcp.close()
        s1.close()
        s2.close()


def test_feed_invalid_port_rejected(dummy_server):
    """FEED with an out-of-range port answers !INVALID up front
    (documented divergence: the reference accepts it and then crashes
    per-send with OverflowError while the client hangs)."""
    for bad in (0, 70000, -5):
        tcp = socket.create_connection(("127.0.0.1", dummy_server.port), 5)
        try:
            tcp.sendall(f"FEED {bad} detect\r\n".encode())
            tcp.settimeout(5)
            assert tcp.recv(65536).startswith(b"!INVALID")
        finally:
            tcp.close()


def test_client_handshake_survives_split_ok():
    """The +OK reply split across TCP segments must not break open()
    (regression: a single recv() parsed a partial line)."""
    lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]

    def fake_server():
        conn, _ = lsock.accept()
        conn.recv(65536)                   # the FEED line
        conn.sendall(b"+OK 51")            # partial
        time.sleep(0.1)
        conn.sendall(b"234 a1b2c3d4\r\n")  # rest of the line
        time.sleep(0.5)
        conn.close()

    th = threading.Thread(target=fake_server, daemon=True)
    th.start()
    c = DetectClient("127.0.0.1", port, "detect")
    try:
        c.open(timeout=5)
        assert c.rtp_port == 51234
        assert c.session_id == bytes.fromhex("a1b2c3d4")
    finally:
        c.close()
        lsock.close()
        th.join(timeout=2)


def test_refeed_closes_previous_session(dummy_server):
    """A second FEED on one control connection must CLOSE the first
    DetectSession (documented divergence: the reference overwrites its
    session reference and leaks the first UDP endpoint, server.py:311-314)
    — and the new session must serve requests normally."""
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    srv = dummy_server.server
    deadline = time.time() + 5
    while len(srv.sessions) != 1 and time.time() < deadline:
        time.sleep(0.01)
    assert len(srv.sessions) == 1
    old_session = srv.sessions[0]

    # re-FEED on the SAME control connection with a fresh UDP socket
    sock2 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock2.setblocking(False)
    sock2.bind(("", 0))
    c.sock_tcp.send(wire.pack_feed(sock2.getsockname()[1], "detect"))
    resp = c.sock_tcp.recv(65536)
    rtp_port2, session_id2 = wire.parse_ok(resp)
    assert session_id2 != c.session_id

    deadline = time.time() + 5
    while not old_session.closed and time.time() < deadline:
        time.sleep(0.01)
    assert old_session.closed, "first session must be torn down on re-FEED"
    assert len(srv.sessions) == 1 and srv.sessions[0] is not old_session

    # the replacement session is fully functional: swap the client's data
    # plane onto it and run a normal request
    c.sock_udp.close()
    c.sock_udp = sock2
    c.rtp_port = rtp_port2
    c.session_id = session_id2
    c.sender = wire.FrameSender(chunk_size=wire.CLIENT_CHUNK_SIZE)
    c.reasm = wire.Reassembler()
    sock2.sendto(wire.EMPTY_PACKET, ("127.0.0.1", rtp_port2))
    c.sender.seqno = 1
    c.reasm._expected = None
    c.request(9, 0.1, b"any bytes at all")
    msec, records = c.wait_response(9)
    assert records == [(16, 255, 208, 208, 166, 166)]
    c.close()


def test_multiple_sequential_requests(dummy_server):
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    for reqid in (5, 6, 7):
        c.request(reqid, 0.2, b"x" * 1000)
        msec, records = c.wait_response(reqid)
        assert len(records) == 1
    c.close()


def test_unknown_command(dummy_server):
    s = socket.create_connection(("127.0.0.1", dummy_server.port), 5)
    s.send(b"PLAY something\r\n")
    assert s.recv(100) == b"!UNKNOWN\r\n"
    s.close()


@pytest.mark.parametrize(
    "line", [b"FEED\r\n", b"FEED 1234\r\n", b"FEED notaport path\r\n",
             b"FEED 1234 nosuchpath\r\n"]
)
def test_invalid_feed(dummy_server, line):
    s = socket.create_connection(("127.0.0.1", dummy_server.port), 5)
    s.send(line)
    assert s.recv(100) == b"!INVALID\r\n"
    s.close()


def test_packet_gap_cancels_but_recovers(dummy_server):
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    # hand-build a 3-chunk request and drop the middle chunk
    payload = wire.DetectRequest(42, 0.1, b"z" * 70000).pack()
    frames = list(wire.chunk_payload(payload, c.sender.seqno, 32768))
    c.sender.seqno += len(frames)
    assert len(frames) == 3
    for f in (frames[0], frames[2]):
        c.sock_udp.sendto(f, ("127.0.0.1", c.rtp_port))
    with pytest.raises(TimeoutError):
        c.wait_response(42, timeout=0.6)
    # next intact request succeeds
    c.request(43, 0.1, b"ok")
    _, records = c.wait_response(43)
    assert records == [(16, 255, 208, 208, 166, 166)]
    c.close()


def test_short_payload_ignored(dummy_server):
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    frame = wire.pack_frame(c.sender.seqno, b"tiny", marker=True)
    c.sender.seqno += 1
    c.sock_udp.sendto(frame, ("127.0.0.1", c.rtp_port))
    with pytest.raises(TimeoutError):
        c.wait_response(0, timeout=0.5)
    c.request(1, 0.1, b"fine")
    c.wait_response(1)
    c.close()


def test_length_mismatch_ignored(dummy_server):
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    bad = struct.pack(">4sLLL", b"JPEG", 9, 10, 50) + b"onlyten!!!"
    for f in wire.chunk_payload(bad, c.sender.seqno, 32768):
        c.sender.seqno += 1
        c.sock_udp.sendto(f, ("127.0.0.1", c.rtp_port))
    with pytest.raises(TimeoutError):
        c.wait_response(9, timeout=0.5)
    c.close()


@pytest.mark.skipif(not os.path.exists(REFERENCE_CLIENT),
                    reason="reference checkout not present")
def test_reference_client_interop(dummy_server, tmp_path):
    """Drive our server with the UNMODIFIED reference client.py."""
    img = tmp_path / "frame.jpg"
    img.write_bytes(jpeg.encode_rgb(np.zeros((416, 416, 3), np.uint8)))
    proc = subprocess.Popen(
        [sys.executable, REFERENCE_CLIENT, "-t", "0.1",
         f"rtsp://127.0.0.1:{dummy_server.port}/detect", str(img)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(tmp_path),
    )
    # readline() has no timeout; a watchdog kill bounds a silent client
    import threading
    watchdog = threading.Timer(30, proc.kill)
    watchdog.start()
    try:
        deadline = time.time() + 15
        seen = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            seen += line
            if "result=" in line:
                break
        assert "result=[(16, 255, 208, 208, 166, 166)]" in seen, seen
    finally:
        watchdog.cancel()
        proc.kill()
        proc.wait()


# ---------------------------------------------------------------------------
# Real-engine serving (tiny model, CPU): batching + fault handling
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_service_server():
    from fastdet_tpu.models import weights
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    engine = DetectionEngine(spec, params, mode="f32", buckets=(1, 2, 4))
    engine.warmup()
    with ServerThread({"tiny": ModelService(engine, name="tiny")}) as st:
        yield st, engine


def test_model_serving_end_to_end(tiny_service_server):
    st, engine = tiny_service_server
    img = np.random.RandomState(0).randint(0, 255, (416, 416, 3), np.uint8)
    data = jpeg.encode_rgb(img, 95)
    c = DetectClient("127.0.0.1", st.port, "tiny")
    c.open()
    c.request(1, 0.5, data)
    msec, records = c.wait_response(1, timeout=30)
    # parity: server must report exactly what the engine computes directly
    # (via the same ingest path the batcher prefers: sparse, then planes,
    # then pixels)
    res = engine.detect_async_sparse([data], [0.5])
    if res is None:
        res = engine.detect_async_planes([data], [0.5])
    if res is not None:
        direct = engine.fetch(res, 1)[0]
    else:
        direct = engine.detect_one(jpeg.decode_rgb(data), 0.5)
    assert len(records) == len(direct)
    for rec, d in zip(records, direct):
        assert rec[0] == d[0]
        assert rec[1] == int(d[1] * 255)
        assert rec[2:] == tuple(
            max(-32768, min(32767, int(v))) if v == v else 0 for v in d[2:]
        )
    c.close()


def test_wrong_size_image_yields_empty_not_crash(tiny_service_server):
    st, _ = tiny_service_server
    bad = jpeg.encode_rgb(np.zeros((100, 100, 3), np.uint8))
    c = DetectClient("127.0.0.1", st.port, "tiny")
    c.open()
    c.request(2, 0.5, bad)
    msec, records = c.wait_response(2, timeout=30)
    assert records == []
    # server still alive for a valid request
    ok = jpeg.encode_rgb(np.zeros((416, 416, 3), np.uint8))
    c.request(3, 0.9, ok)
    c.wait_response(3, timeout=30)
    c.close()


def test_cross_client_batching(tiny_service_server):
    st, engine = tiny_service_server
    imgs = [
        jpeg.encode_rgb(
            np.random.RandomState(i).randint(0, 255, (416, 416, 3), np.uint8), 95
        )
        for i in range(4)
    ]
    clients = []
    for i, data in enumerate(imgs):
        c = DetectClient("127.0.0.1", st.port, "tiny")
        c.open()
        clients.append(c)
    for i, (c, data) in enumerate(zip(clients, imgs)):
        c.request(100 + i, 0.5, data)
    for i, (c, data) in enumerate(zip(clients, imgs)):
        msec, records = c.wait_response(100 + i, timeout=30)
        direct = engine.detect_one(jpeg.decode_rgb(data), 0.5)
        assert len(records) == len(direct)
        c.close()


@pytest.mark.skipif(not os.path.exists(REFERENCE_CLIENT),
                    reason="reference checkout not present")
def test_reference_client_against_model_service(tiny_service_server):
    """The complete switch-over scenario: the UNMODIFIED reference
    client streams the reference's own 4:2:2 photo to a real
    model-backed endpoint and parses the detections it gets back."""
    st, engine = tiny_service_server
    dog = "/root/reference/testdata/dog.jpg"
    if not os.path.exists(dog):
        pytest.skip("reference fixture not present")
    proc = subprocess.Popen(
        [sys.executable, REFERENCE_CLIENT, "-t", "0.1",
         f"rtsp://127.0.0.1:{st.port}/tiny", dog],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # readline() has no timeout; a watchdog kill bounds a silent client
    import threading
    watchdog = threading.Timer(90, proc.kill)
    watchdog.start()
    try:
        deadline = time.time() + 60
        seen = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            seen += line
            if "result=" in line:
                break
        assert "result=[" in seen, seen
        # the reference client parsed klass/conf/box records from our
        # model service; records are (klass 1..80, conf u8, int boxes)
        import re

        m = re.search(r"result=\[\((\d+), (\d+),", seen)
        assert m, seen
        assert 1 <= int(m.group(1)) <= 80
        assert 0 <= int(m.group(2)) <= 255
    finally:
        watchdog.cancel()
        proc.kill()
        proc.wait()
