"""On-device Gaussian soft-NMS with a static detection budget.

The reference's soft-NMS (server/detector.py:27-59) is a data-dependent
Python loop: pick the max-score candidate, stop when it drops below the
threshold, decay survivors by exp(-3 * overlap^2) where overlap is the
*asymmetric* intersection / area(picked) (detector.py:38-42 — not true
IoU; reproduced here exactly for output parity).

TPU version: a fixed-trip-count lax.fori_loop over ``max_det`` slots.
Each iteration does one argmax + one vectorized decay over the candidate
budget — O(max_det * max_candidates) dense VPU work with fully static
shapes, which XLA fuses into a handful of kernels. Iterations past the
reference's stop condition write invalid slots (scores only ever decay,
so validity ``best >= threshold`` is monotone) and the ``valid`` mask
trims them, keeping jit shapes static while matching the dynamic loop's
output exactly, including pick order (= reference's output order after
its sort, since pick scores are non-increasing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NMSResult(NamedTuple):
    boxes: jnp.ndarray   # (max_det, 4) normalized top-left (x, y, w, h)
    scores: jnp.ndarray  # (max_det,) decayed confidence at pick time
    klass: jnp.ndarray   # (max_det,) int32, 1-indexed; 0 in invalid slots
    valid: jnp.ndarray   # (max_det,) bool
    count: jnp.ndarray   # () int32 — number of valid detections


def asymmetric_overlap(picked: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """intersection(picked, boxes) / area(picked); 0 when disjoint."""
    px, py, pw, ph = picked[0], picked[1], picked[2], picked[3]
    ix = jnp.maximum(px, boxes[:, 0])
    iy = jnp.maximum(py, boxes[:, 1])
    iw = jnp.minimum(px + pw, boxes[:, 0] + boxes[:, 2]) - ix
    ih = jnp.minimum(py + ph, boxes[:, 1] + boxes[:, 3]) - iy
    inter = iw * ih
    ov = inter / (pw * ph)
    return jnp.where((iw > 0) & (ih > 0), ov, 0.0)


def soft_nms(
    boxes: jnp.ndarray,       # (K, 4)
    scores: jnp.ndarray,      # (K,) — sub-threshold entries must be < 0
    klass: jnp.ndarray,       # (K,) int32
    threshold: jnp.ndarray,   # scalar float
    max_det: int,
) -> NMSResult:
    k = scores.shape[0]

    def body(i, state):
        cur_scores, out_boxes, out_scores, out_klass, out_valid = state
        m = jnp.argmax(cur_scores)
        best = cur_scores[m]
        is_valid = best >= threshold
        picked_box = boxes[m]

        out_boxes = out_boxes.at[i].set(jnp.where(is_valid, picked_box, 0.0))
        out_scores = out_scores.at[i].set(jnp.where(is_valid, best, 0.0))
        out_klass = out_klass.at[i].set(jnp.where(is_valid, klass[m], 0))
        out_valid = out_valid.at[i].set(is_valid)

        # Remove the pick, then decay everyone still alive. -inf stays -inf
        # under the (positive) decay, so removed entries never resurface.
        cur_scores = cur_scores.at[m].set(-jnp.inf)
        ov = asymmetric_overlap(picked_box, boxes)
        decay = jnp.exp(-3.0 * ov * ov)
        cur_scores = jnp.where(is_valid, cur_scores * decay, cur_scores)
        return cur_scores, out_boxes, out_scores, out_klass, out_valid

    init = (
        scores.astype(jnp.float32),
        jnp.zeros((max_det, 4), jnp.float32),
        jnp.zeros((max_det,), jnp.float32),
        jnp.zeros((max_det,), jnp.int32),
        jnp.zeros((max_det,), bool),
    )
    _, out_boxes, out_scores, out_klass, out_valid = jax.lax.fori_loop(
        0, max_det, body, init
    )
    return NMSResult(
        out_boxes, out_scores, out_klass, out_valid,
        jnp.sum(out_valid.astype(jnp.int32)),
    )


def soft_nms_batch(
    boxes: jnp.ndarray,        # (B, K, 4)
    scores: jnp.ndarray,       # (B, K) — sub-threshold entries must be < 0
    klass: jnp.ndarray,        # (B, K) int32
    thresholds: jnp.ndarray,   # (B,) per-image thresholds
    max_det: int,
) -> NMSResult:
    """Early-exiting batched soft-NMS, output-identical to vmap(soft_nms).

    ``max_det`` fixed-trip iterations past the last valid pick only ever
    write zeroed invalid slots (validity is monotone: scores decay, never
    grow), so a ``lax.while_loop`` that stops once **no** image in the
    batch can still produce a valid pick returns bit-identical results.
    Typical frames hold ~3-10 detections against a budget of 100, so the
    sequential-iteration count — which dominates postprocess device time,
    each trip being a tiny VPU kernel — drops by ~10x.

    Engineering notes:
    - all per-pick selection is one-hot select/sum, not gather/scatter
      (TPU has no fast random element addressing; a one-hot reduction
      over K=512 lanes is effectively free on the VPU),
    - the loop carries ``alive`` (computed from the *decayed* scores at
      the end of each body) so the condition needs no extra argmax,
    - under a dp mesh, wrap this in shard_map: each shard then exits on
      its own local batch; there are no collectives inside the loop so
      divergent trip counts across devices are safe.
    """
    bsz, k = scores.shape
    lane = jnp.arange(k)

    def cond(state):
        i, alive = state[0], state[1]
        return (i < max_det) & alive

    def body(state):
        i, _, cur_scores, out_boxes, out_scores, out_klass, out_valid = state
        best = jnp.max(cur_scores, axis=1)                       # (B,)
        m = jnp.argmax(cur_scores, axis=1)                       # (B,)
        sel = lane[None, :] == m[:, None]                        # (B, K)
        is_valid = best >= thresholds                            # (B,)
        picked = jnp.sum(
            jnp.where(sel[..., None], boxes, 0.0), axis=1)       # (B, 4)
        picked_klass = jnp.sum(jnp.where(sel, klass, 0), axis=1)  # (B,)

        out_boxes = jax.lax.dynamic_update_slice_in_dim(
            out_boxes,
            jnp.where(is_valid[:, None], picked, 0.0)[:, None, :], i, axis=1)
        out_scores = jax.lax.dynamic_update_slice_in_dim(
            out_scores, jnp.where(is_valid, best, 0.0)[:, None], i, axis=1)
        out_klass = jax.lax.dynamic_update_slice_in_dim(
            out_klass, jnp.where(is_valid, picked_klass, 0)[:, None], i, axis=1)
        out_valid = jax.lax.dynamic_update_slice_in_dim(
            out_valid, is_valid[:, None], i, axis=1)

        cur_scores = jnp.where(sel, -jnp.inf, cur_scores)
        ov = jax.vmap(asymmetric_overlap)(picked, boxes)          # (B, K)
        decay = jnp.exp(-3.0 * ov * ov)
        cur_scores = jnp.where(
            is_valid[:, None], cur_scores * decay, cur_scores)
        alive = jnp.any(jnp.max(cur_scores, axis=1) >= thresholds)
        return i + 1, alive, cur_scores, out_boxes, out_scores, out_klass, out_valid

    init = (
        jnp.int32(0),
        jnp.any(jnp.max(scores, axis=1) >= thresholds),
        scores.astype(jnp.float32),
        jnp.zeros((bsz, max_det, 4), jnp.float32),
        jnp.zeros((bsz, max_det), jnp.float32),
        jnp.zeros((bsz, max_det), jnp.int32),
        jnp.zeros((bsz, max_det), bool),
    )
    _, _, _, out_boxes, out_scores, out_klass, out_valid = jax.lax.while_loop(
        cond, body, init
    )
    return NMSResult(
        out_boxes, out_scores, out_klass, out_valid,
        jnp.sum(out_valid.astype(jnp.int32), axis=1),
    )
