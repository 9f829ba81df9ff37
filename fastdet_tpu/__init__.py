"""fastdet_tpu — TPU-native low-latency object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of euske/fastdet
(reference at /root/reference): a client/server object-detection system in
which mobile clients stream 416x416 JPEG frames over an RTSP-like TCP
handshake + RTP-like UDP data plane, and the server runs the YOLOv3 family
(tiny / full Darknet-53 / 9-class RSU) and streams compact binary box
results back.

Architecture (TPU-first, not a port):

- ``fastdet_tpu.wire``     — wire protocol (RTP framing, reassembly, handshake,
  request/response structs), byte-compatible with the reference protocol
  (reference spec: docs/DESIGN.md:32-111; impls server/server.py:180-315,
  server/client.py:18-130).
- ``fastdet_tpu.models``   — NHWC JAX implementations of YOLOv3-tiny,
  YOLOv3 (Darknet-53) and the N-class variant ("rsu"), built for XLA/MXU:
  static shapes, fused conv+BN+LeakyReLU blocks, bf16-capable.
- ``fastdet_tpu.ops``      — on-device postprocessing: vectorized YOLO head
  decode (replaces the reference's pure-Python triple loop,
  server/detector.py:148-166) and fixed-budget soft-NMS as a lax loop
  (server/detector.py:27-59 semantics, including the asymmetric
  intersection/area(self) "IoU" and Gaussian exp(-3*iou^2) decay).
- ``fastdet_tpu.runtime``  — asyncio serving runtime: TCP control plane,
  per-session UDP data plane, multi-model registry, cross-client frame
  batcher, AOT-compiled batch buckets.
- ``fastdet_tpu.parallel`` — jax.sharding Mesh utilities, data/tensor
  parallel shardings, and a pjit training step (YOLOv3 loss + optax).
- ``fastdet_tpu.cli``      — CLI entry points mirroring the reference's
  detector.py / server.py / client.py flag grammar.
"""

__version__ = "0.1.0"
