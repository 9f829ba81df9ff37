"""Robustness fuzzing: hostile bytes at every protocol surface.

The server must survive arbitrary garbage on both planes (the reference
mostly does too — by silently dropping; we must never regress that into
a crash since one exception in a datagram handler would kill sessions).
"""

import socket
import time
import struct

import numpy as np
import pytest

from tests.test_server import ServerThread
from fastdet_tpu import wire
from fastdet_tpu.runtime.client import DetectClient
from fastdet_tpu.runtime.server import build_services


@pytest.fixture
def dummy_server():
    with ServerThread(build_services([])) as st:
        yield st


def test_udp_fuzz_then_valid_request(dummy_server):
    rng = np.random.RandomState(0)
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    dest = ("127.0.0.1", c.rtp_port)
    for i in range(300):
        n = rng.randint(0, 2000)
        c.sock_udp.sendto(rng.bytes(n), dest)
    # resync: reassembler may be mid-garbage; send a marker frame to flush,
    # then a clean request (payload cancel semantics guarantee recovery).
    # Retried because the garbage burst can overflow the server's UDP
    # receive buffer under load, and the kernel then drops OUR datagrams
    # too — resync-and-retry is exactly what a real client does on loss.
    records = None
    for attempt in range(3):
        time.sleep(0.2)  # let the event loop drain the garbage backlog
        c.sender.seqno = 50000 + 10 * attempt
        flush = wire.pack_frame(c.sender.seqno - 1, b"", marker=True)
        c.sock_udp.sendto(flush, dest)
        c.request(7 + attempt, 0.1, b"anything")
        try:
            msec, records = c.wait_response(7 + attempt, timeout=3)
            break
        except TimeoutError:
            continue
    assert records == [(16, 255, 208, 208, 166, 166)]
    c.close()


def test_tcp_fuzz_lines(dummy_server):
    rng = np.random.RandomState(1)
    for _ in range(20):
        s = socket.create_connection(("127.0.0.1", dummy_server.port), 5)
        s.send(rng.bytes(rng.randint(1, 300)).replace(b"\n", b"x") + b"\n")
        resp = s.recv(100)
        assert resp in (b"!UNKNOWN\r\n", b"!INVALID\r\n")
        s.close()
    # server still healthy
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    c.request(1, 0.1, b"ok")
    c.wait_response(1, timeout=5)
    c.close()


def test_oversized_feed_port(dummy_server):
    s = socket.create_connection(("127.0.0.1", dummy_server.port), 5)
    s.send(b"FEED 99999999999999999999 detect\r\n")
    # out-of-range ports are rejected UP FRONT (documented divergence;
    # pinned exactly — the loose '+OK or !INVALID' form would also pass
    # if validation regressed to the reference's accept-then-crash)
    resp = s.recv(100)
    assert resp.startswith(b"!INVALID")
    s.close()
    c = DetectClient("127.0.0.1", dummy_server.port, "detect")
    c.open()
    c.request(1, 0.1, b"x")
    c.wait_response(1, timeout=5)
    c.close()


def test_reassembler_never_raises_on_fuzz():
    rng = np.random.RandomState(2)
    r = wire.Reassembler()
    for _ in range(3000):
        r.feed(rng.bytes(rng.randint(0, 100)))
    # and still functional afterwards
    r2 = wire.Reassembler()
    out = []
    for f in wire.chunk_payload(b"payload", 0, 4):
        out += r2.feed(f)
    assert out == [b"payload"]


def test_parse_request_fuzz_never_raises():
    rng = np.random.RandomState(3)
    for _ in range(2000):
        wire.parse_request(rng.bytes(rng.randint(0, 64)))
        wire.parse_response(rng.bytes(rng.randint(0, 64)))
