"""Full on-device postprocess: decode -> candidate budget -> soft-NMS.

One jit-compatible function per image, vmapped over the batch by the
engine. Output shapes are static (max_det slots + valid mask); the wire
layer trims to the valid count when packing results
(cf. reference server/server.py:235-238).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdet_tpu.models.yolov3 import ModelSpec
from fastdet_tpu.ops.decode import (
    decode_all, decode_all_components, select_candidates,
    select_candidates_components)
from fastdet_tpu.ops.nms import NMSResult, soft_nms

MAX_CANDIDATES = 512
MAX_DET = 100


def postprocess_image(
    heads: Sequence[jnp.ndarray],   # per-scale (H, W, 3*(5+C)) for ONE image
    spec: ModelSpec,
    threshold: jnp.ndarray,
    max_candidates: int = MAX_CANDIDATES,
    max_det: int = MAX_DET,
) -> NMSResult:
    comps, scores, klass = decode_all_components(heads, spec)
    b, s, k = select_candidates_components(
        comps, scores, klass, threshold, max_candidates)
    return soft_nms(b, s, k, threshold, max_det)


def postprocess_batch(
    heads: Sequence[jnp.ndarray],   # per-scale (B, H, W, 3*(5+C))
    spec: ModelSpec,
    threshold: jnp.ndarray,         # scalar, shared by the batch
    max_candidates: int = MAX_CANDIDATES,
    max_det: int = MAX_DET,
) -> NMSResult:
    fn = lambda *hs: postprocess_image(hs, spec, threshold, max_candidates, max_det)
    return jax.vmap(fn)(*heads)


def select_batch(
    heads: Sequence[jnp.ndarray],   # per-scale (B, H, W, 3*(5+C))
    spec: ModelSpec,
    thresholds: jnp.ndarray,        # (B,) per-image thresholds
    max_candidates: int = MAX_CANDIDATES,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched decode + candidate budget (the NMS-free front of the
    postprocess), for composing with :func:`ops.nms.soft_nms_batch` —
    the early-exiting batched NMS the engine uses on its hot path."""

    def fn(t, *hs):
        comps, scores, klass = decode_all_components(hs, spec)
        return select_candidates_components(
            comps, scores, klass, t, max_candidates)

    return jax.vmap(fn)(thresholds, *heads)


def pack_wire_records(res: NMSResult, image_size: int) -> jnp.ndarray:
    """Pack a BATCHED NMSResult into response-wire record bytes on device.

    Output (B, max_det*10 + 4) uint8: max_det big-endian >BBhhhh records
    [klass u8, conf*255 u8, x y w h i16 pixel coords — the reference's
    result layout, server/server.py:235-238] followed by the frame's
    valid-count as 4 LE bytes. The serving loop then slices
    ``rec[:10*count]`` and ships it (DetectionEngine.fetch_wire) — the
    d2h transfer is 10 B/slot instead of 28 B and the host does zero
    per-record math.

    Numeric contract: identical to the host path in fetch_wire — the
    coordinate scale happens in f32 (fetch() uses the same f32 product,
    so trunc decisions agree bit-for-bit), NaN -> 0, truncate toward
    zero, saturate to i16 / u8 ranges.
    """
    b, md = res.scores.shape
    coords = res.boxes * jnp.float32(image_size)           # (B, md, 4) f32
    coords = jnp.where(jnp.isnan(coords), jnp.float32(0), coords)
    coords = jnp.clip(jnp.trunc(coords), -32768.0, 32767.0).astype(jnp.int32)
    conf = jnp.where(jnp.isnan(res.scores), jnp.float32(0), res.scores)
    c_u8 = jnp.clip(jnp.trunc(conf * jnp.float32(255)), 0.0, 255.0)
    hi = jnp.right_shift(coords, 8).astype(jnp.uint8)      # two's complement
    lo = coords.astype(jnp.uint8)
    rec = jnp.stack(
        [
            res.klass.astype(jnp.uint8),
            c_u8.astype(jnp.uint8),
            hi[..., 0], lo[..., 0],
            hi[..., 1], lo[..., 1],
            hi[..., 2], lo[..., 2],
            hi[..., 3], lo[..., 3],
        ],
        axis=-1,
    ).reshape(b, md * 10)
    cnt = res.count.astype(jnp.uint32)                     # (B,)
    tail = jnp.stack(
        [cnt, cnt >> 8, cnt >> 16, cnt >> 24], axis=-1
    ).astype(jnp.uint8)
    return jnp.concatenate([rec, tail], axis=-1)


def to_reference_results(
    result: NMSResult, image_size: int = 416
) -> List[Tuple[int, float, float, float, float, float]]:
    """Convert ONE image's NMSResult to the reference's result tuples.

    [(klass, conf, x, y, w, h)] in pixel coordinates, pick order —
    the exact shape Detector.perform returns (detector.py:142-144).
    """
    boxes = np.asarray(result.boxes, dtype=np.float64) * image_size
    scores = np.asarray(result.scores, dtype=np.float64)
    klass = np.asarray(result.klass)
    n = int(result.count)
    return [
        (int(klass[i]), float(scores[i]),
         float(boxes[i, 0]), float(boxes[i, 1]), float(boxes[i, 2]), float(boxes[i, 3]))
        for i in range(n)
    ]
