"""Vectorized on-device YOLO head decode.

Replaces the reference's pure-Python triple loop over rows x cols x anchors
(server/detector.py:148-166) — the non-engine hot spot of its frame path —
with one fused elementwise pass over the whole grid on the TPU VPU.

Semantics (bit-matched against fastdet_tpu.ops.reference_oracle):

- box center  x = (x0 + sigmoid(tx)) / cols,  y = (y0 + sigmoid(ty)) / rows
- box size    w = anchor_w * exp(tw) / image,  h = anchor_h * exp(th) / image
- confidence  conf = sigmoid(obj) * sigmoid(max class logit)
- class id    argmax + 1 (1-indexed; 0 is UNDEFINED on the client side)
- bbox        normalized top-left (x - w/2, y - h/2, w, h)
- a candidate survives iff conf >= threshold (the reference's two-stage
  early-skip reduces to this single test because conf <= sigmoid(obj)).

Candidate order is scale-major, row-major, anchor-minor — the reference's
loop nesting — so downstream tie-breaking matches.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from fastdet_tpu.models.yolov3 import ModelSpec


def decode_head_components(
    head: jnp.ndarray,            # (H, W, 3*(5+C)) float32, one image
    anchors: jnp.ndarray,         # (3, 2) float32, pixel units
    num_classes: int,
    image_size: int,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, jnp.ndarray]:
    """Decode one scale. Returns ((bx, by, bw, bh) each (N,), scores
    (N,), klass (N,)). Box components stay as separate vectors: stacking
    them into (N, 4) before the candidate top-k puts a 4-wide minor dim
    on 128-lane tiles — the (B, 10647, 4) stack + its relayout copy
    profiled 0.2 ms/batch-24 of padded traffic. select_candidates
    gathers components by index and stacks at (K=512, 4) instead."""
    rows, cols = head.shape[0], head.shape[1]
    na = anchors.shape[0]
    stride = 5 + num_classes
    n = rows * cols * na
    # Flat (n, stride) layout for every per-anchor reduce/slice: on TPU
    # the 5-D (rows, cols, na, stride) spelling puts `stride` on a
    # 4x128-tiled minor axis and XLA lowers the class max/argmax as a
    # scalar kLoop fusion (~2.7 ms/batch-16 at 52x52 measured); the same
    # reduce over (n, stride) rows is a vectorized row reduce
    # (~0.21 ms incl. argmax) — 13x. Row-major reshape keeps candidate
    # order (row-major, anchor-minor) bit-identical.
    m = head.reshape(n, stride)

    txy = jax.nn.sigmoid(m[:, 0:2])
    gx = (jax.lax.broadcasted_iota(jnp.float32, (rows, cols, na), 1)
          .reshape(n) + txy[:, 0]) / cols
    gy = (jax.lax.broadcasted_iota(jnp.float32, (rows, cols, na), 0)
          .reshape(n) + txy[:, 1]) / rows
    # exp clamp: untrained/garbage logits would overflow f32 to inf and
    # poison NMS; trained YOLO tw/th magnitudes are < 5 so clamping at 15
    # never changes real-model outputs (documented divergence — the
    # reference's float64 exp simply overflows later).
    wh = (jnp.tile(anchors, (rows * cols, 1))
          * jnp.exp(jnp.minimum(m[:, 2:4], 15.0)) / image_size)

    obj = jax.nn.sigmoid(m[:, 4])
    cls_logits = m[:, 5:]
    klass = jnp.argmax(cls_logits, axis=-1)
    cls_conf = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))
    scores = obj * cls_conf

    comps = (gx - wh[:, 0] / 2, gy - wh[:, 1] / 2, wh[:, 0], wh[:, 1])
    return (comps, scores, (klass + 1).astype(jnp.int32))


def decode_head(
    head: jnp.ndarray,
    anchors: jnp.ndarray,
    num_classes: int,
    image_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode one scale. Returns (boxes (N,4), scores (N,), klass (N,))."""
    comps, scores, klass = decode_head_components(
        head, anchors, num_classes, image_size)
    return jnp.stack(comps, axis=-1), scores, klass


def decode_all_components(
    heads: Sequence[jnp.ndarray],
    spec: ModelSpec,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, jnp.ndarray]:
    """Decode and concatenate every scale of one image, reference order,
    box components as four (N,) vectors (see decode_head_components)."""
    cs, ss, ks = [], [], []
    for head, anchors in zip(heads, spec.anchors):
        c, s, k = decode_head_components(
            head,
            jnp.asarray(anchors, jnp.float32),
            spec.num_classes,
            spec.image_size,
        )
        cs.append(c)
        ss.append(s)
        ks.append(k)
    comps = tuple(jnp.concatenate([c[i] for c in cs]) for i in range(4))
    return comps, jnp.concatenate(ss), jnp.concatenate(ks)


def decode_all(
    heads: Sequence[jnp.ndarray],
    spec: ModelSpec,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode and concatenate every scale of one image, reference order."""
    comps, ss, ks = decode_all_components(heads, spec)
    return jnp.stack(comps, axis=-1), ss, ks


def select_candidates(
    boxes: jnp.ndarray,           # (N, 4)
    scores: jnp.ndarray,          # (N,)
    klass: jnp.ndarray,           # (N,)
    threshold: jnp.ndarray,       # scalar
    max_candidates: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Keep the top-K candidates with score >= threshold (static budget).

    Sub-threshold entries are masked to -1 so they never win the NMS
    argmax. top_k is stable, preserving the reference's insertion order
    among equal scores.
    """
    masked = jnp.where(scores >= threshold, scores, -1.0)
    top_scores, idx = jax.lax.top_k(masked, min(max_candidates, scores.shape[0]))
    sel_boxes = boxes[idx]
    sel_klass = klass[idx]
    valid = top_scores >= threshold
    return sel_boxes, jnp.where(valid, top_scores, -1.0), jnp.where(valid, sel_klass, 0)


def select_candidates_components(
    comps: Tuple[jnp.ndarray, ...],  # four (N,) box components
    scores: jnp.ndarray,          # (N,)
    klass: jnp.ndarray,           # (N,)
    threshold: jnp.ndarray,       # scalar
    max_candidates: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """select_candidates over component vectors: gather each component
    by the top-k index and stack at (K, 4) — identical outputs, no
    (N, 4) intermediate (see decode_head_components)."""
    masked = jnp.where(scores >= threshold, scores, -1.0)
    top_scores, idx = jax.lax.top_k(masked, min(max_candidates, scores.shape[0]))
    sel_boxes = jnp.stack([c[idx] for c in comps], axis=-1)
    sel_klass = klass[idx]
    valid = top_scores >= threshold
    return sel_boxes, jnp.where(valid, top_scores, -1.0), jnp.where(valid, sel_klass, 0)
