"""Byte-level golden tests for the wire protocol.

Golden byte strings below were derived by hand from the protocol spec
(reference docs/DESIGN.md:47-111) and cross-checked against the struct
formats used by the reference peers (server/server.py:208,228,235-239,250;
server/client.py:68,79). They pin the exact on-wire encoding.
"""

import struct

import pytest

from fastdet_tpu import wire


# ---------------------------------------------------------------------------
# RTP framing
# ---------------------------------------------------------------------------

def test_empty_packet_golden():
    assert wire.EMPTY_PACKET == bytes.fromhex("80" + "00" * 11)
    assert len(wire.EMPTY_PACKET) == 12


def test_pack_frame_golden():
    # flags=0x80, pt=96 (no marker), seqno=0x0102, payload 'abc'
    assert wire.pack_frame(0x0102, b"abc", marker=False) == b"\x80\x60\x01\x02abc"
    # marker set: pt = 96 | 0x80 = 0xE0
    assert wire.pack_frame(1, b"", marker=True) == b"\x80\xe0\x00\x01"
    # seqno masked to 16 bits
    assert wire.pack_frame(0x1_0005, b"", marker=True)[2:4] == b"\x00\x05"


def test_chunking_matches_reference_layout():
    payload = bytes(range(256)) * 400  # 102400 bytes
    frames = list(wire.chunk_payload(payload, start_seqno=7, chunk_size=40000))
    assert len(frames) == 3
    # Sizes: 4-byte header + chunk
    assert [len(f) for f in frames] == [40004, 40004, 102400 - 80000 + 4]
    # Seqnos increment; only last frame has the marker
    for i, f in enumerate(frames):
        flags, pt, seqno = wire.unpack_header(f)
        assert flags == 0x80
        assert seqno == 7 + i
        assert (pt & 0x7F) == 96
        assert bool(pt & 0x80) == (i == len(frames) - 1)
    assert b"".join(f[4:] for f in frames) == payload


def test_frame_sender_initiation_bumps_seqno():
    s = wire.FrameSender()
    assert s.initiation_packet() == wire.EMPTY_PACKET
    assert s.seqno == 1
    frames = s.frames(b"x" * 10)
    assert len(frames) == 1
    _, _, seqno = wire.unpack_header(frames[0])
    assert seqno == 1
    assert s.seqno == 2


def test_reassembler_basic_roundtrip():
    payload = b"hello world" * 5000
    sender = wire.FrameSender(chunk_size=32768)
    sender.initiation_packet()
    r = wire.Reassembler()
    # Initiation packet: seqno 0, pt 0 -> no payload, resyncs expected to 1.
    assert r.feed(wire.EMPTY_PACKET) == []
    done = []
    for f in sender.frames(payload):
        done += r.feed(f)
    assert done == [payload]
    assert r.drops == 0


def test_reassembler_gap_cancels_payload():
    payload = b"A" * 100000
    frames = list(wire.chunk_payload(payload, 1, chunk_size=40000))
    assert len(frames) == 3
    r = wire.Reassembler()
    r.feed(wire.EMPTY_PACKET)  # seqno 0
    r.feed(frames[0])
    # frames[1] lost
    out = r.feed(frames[2])
    assert out == []          # cancelled payload NOT delivered
    assert r.drops == 1
    # Next complete payload goes through fine
    sender_frames = list(wire.chunk_payload(b"ok", 4, chunk_size=40000))
    out = r.feed(sender_frames[0])
    assert out == [b"ok"]


def test_reassembler_accepts_both_wrap_conventions():
    # python-client convention: 0xffff -> 0
    r = wire.Reassembler()
    r.feed(wire.pack_frame(0xFFFF, b"a", marker=False))
    out = r.feed(wire.pack_frame(0, b"b", marker=True))
    assert out == [b"ab"]
    assert r.drops == 0
    # C#-client convention: 0xffff -> 1
    r = wire.Reassembler()
    r.feed(wire.pack_frame(0xFFFF, b"a", marker=False))
    out = r.feed(wire.pack_frame(1, b"b", marker=True))
    assert out == [b"ab"]
    assert r.drops == 0


def test_reassembler_short_datagram_ignored():
    r = wire.Reassembler()
    assert r.feed(b"\x80") == []


# ---------------------------------------------------------------------------
# Control plane
# ---------------------------------------------------------------------------

def test_feed_line_golden():
    assert wire.pack_feed(5004, "detect") == b"FEED 5004 detect\r\n"
    cmd, args = wire.parse_command(b"FEED 5004 detect\r\n")
    assert cmd == b"FEED"
    assert wire.parse_feed_args(args) == (5004, "detect")
    # lower-case command upper-cased like the reference (server.py:269)
    cmd, _ = wire.parse_command(b"feed 1 2\n")
    assert cmd == b"FEED"


def test_feed_args_invalid():
    assert wire.parse_feed_args(b"justone") is None
    assert wire.parse_feed_args(b"notanint path") is None
    assert wire.parse_feed_args(b"") is None


def test_ok_line_golden():
    line = wire.pack_ok(54321, bytes.fromhex("deadbeef"))
    assert line == b"+OK 54321 deadbeef\r\n"
    port, sid = wire.parse_ok(line)
    assert port == 54321 and sid == bytes.fromhex("deadbeef")
    with pytest.raises(IOError):
        wire.parse_ok(b"!INVALID\r\n")


# ---------------------------------------------------------------------------
# Data plane payloads
# ---------------------------------------------------------------------------

def test_request_payload_golden():
    req = wire.DetectRequest(reqid=0x01020304, threshold=0.37, jpeg=b"\xff\xd8JJ")
    blob = req.pack()
    # 'JPEG' + reqid + int(0.37*100)=37 + len=4 + body
    assert blob == b"JPEG" + struct.pack(">LLL", 0x01020304, 37, 4) + b"\xff\xd8JJ"
    back = wire.parse_request(blob)
    assert back == wire.DetectRequest(0x01020304, 0.37, b"\xff\xd8JJ")


def test_request_payload_invalid():
    assert wire.parse_request(b"short") is None
    blob = wire.DetectRequest(1, 0.1, b"abc").pack()
    assert wire.parse_request(blob[:-1]) is None  # length mismatch dropped


def test_response_payload_golden():
    # The reference DummyDetector result: cat (klass 16), conf 1.0, centered
    # box at (208,208) size 166.4 -> int() truncation to 166 (server.py:235-238
    # packs int(conf*255)=255 and int(x) etc.).
    resp = wire.DetectResponse(
        reqid=7, msec=12, results=[(16, 1.0, 208.0, 208.0, 166.4, 166.4)]
    )
    blob = resp.pack()
    expect = (
        b"YOLO"
        + struct.pack(">LLL", 7, 12, 10)
        + struct.pack(">BBhhhh", 16, 255, 208, 208, 166, 166)
    )
    assert blob == expect
    reqid, msec, records = wire.parse_response(blob)
    assert (reqid, msec) == (7, 12)
    assert records == [(16, 255, 208, 208, 166, 166)]


def test_response_negative_coords_roundtrip():
    # Boxes may extend past the top-left edge -> negative int16 on the wire.
    resp = wire.DetectResponse(reqid=1, msec=0, results=[(3, 0.5, -12.7, -1.2, 430.9, 5.0)])
    _, _, records = wire.parse_response(resp.pack())
    # int() truncates toward zero: -12.7 -> -12
    assert records == [(3, 127, -12, -1, 430, 5)]


def test_roundtrip_over_frames_end_to_end():
    """Full request path: payload -> chunked frames -> reassembly -> parse."""
    jpeg = bytes(i % 251 for i in range(90000))
    req = wire.DetectRequest(reqid=42, threshold=0.1, jpeg=jpeg)
    sender = wire.FrameSender(chunk_size=wire.CLIENT_CHUNK_SIZE)
    sender.initiation_packet()
    r = wire.Reassembler()
    r.feed(wire.EMPTY_PACKET)
    payloads = []
    for f in sender.frames(req.pack()):
        payloads += r.feed(f)
    assert len(payloads) == 1
    parsed = wire.parse_request(payloads[0])
    assert parsed is not None and parsed.reqid == 42 and parsed.jpeg == jpeg
