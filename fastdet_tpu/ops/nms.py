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
