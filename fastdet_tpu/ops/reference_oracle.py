"""Float64 NumPy oracle for YOLO head decode + soft-NMS.

This module is the *numerical specification* our on-device kernels are
differentially tested against. It reproduces, in float64 like the
reference's scalar ``math.exp`` path, the exact semantics of:

- the head decode loop, reference server/detector.py:148-166
  (sigmoid box offsets, anchor exp scaling, objectness early-skip,
  class argmax with conf multiply, 1-indexed class ids, normalized
  top-left bbox),
- Gaussian soft-NMS, reference server/detector.py:27-59, including its
  *asymmetric* overlap measure intersection/area(picked) — NOT standard
  IoU (detector.py:38-42) — the exp(-3*iou^2) decay, the strict
  ``best < threshold`` stop, and first-max tie-breaking.

It is intentionally NOT fast — the production path is the JAX/TPU
implementation in fastdet_tpu.ops.{decode,nms}.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

ImageResults = List[Tuple[int, float, float, float, float, float]]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def decode_heads_oracle(
    heads: Sequence[np.ndarray],
    anchor_sets: Sequence[Sequence[Tuple[int, int]]],
    num_classes: int,
    threshold: float,
    image_size: int = 416,
) -> List[Tuple[int, float, Tuple[float, float, float, float]]]:
    """Decode raw head tensors into (klass, conf, bbox) candidates.

    ``heads[i]`` is (H, W, 3*(5+num_classes)) float; candidates are emitted
    in scale-major, row-major, anchor-minor order (the reference's loop
    nesting), with bbox = normalized top-left (x, y, w, h).
    """
    out = []
    stride = 5 + num_classes
    for anchors, m in zip(anchor_sets, heads):
        m = np.asarray(m, dtype=np.float64)
        rows, cols, _ = m.shape
        for k, (ax, ay) in enumerate(anchors):
            blk = m[:, :, stride * k : stride * (k + 1)]
            obj = _sigmoid(blk[:, :, 4])
            cls_logits = blk[:, :, 5 : 5 + num_classes]
            mi = np.argmax(cls_logits, axis=-1)
            cls_conf = _sigmoid(np.take_along_axis(cls_logits, mi[..., None], -1)[..., 0])
            conf = obj * cls_conf
            gx = (np.arange(cols)[None, :] + _sigmoid(blk[:, :, 0])) / cols
            gy = (np.arange(rows)[:, None] + _sigmoid(blk[:, :, 1])) / rows
            gw = ax * np.exp(blk[:, :, 2]) / image_size
            gh = ay * np.exp(blk[:, :, 3]) / image_size
            # keep test: objectness >= threshold AND combined >= threshold;
            # combined <= objectness so the single combined test suffices.
            keepmask = conf >= threshold
            # stash per-anchor grids; ordering fixed below
            out.append((k, keepmask, mi, conf, gx, gy, gw, gh))
    # Re-emit in the reference's nesting order: per scale, y, x, anchor.
    results = []
    per_scale = len(anchor_sets[0]) if anchor_sets else 0
    idx = 0
    for s, anchors in enumerate(anchor_sets):
        chunk = out[idx : idx + len(anchors)]
        idx += len(anchors)
        rows, cols = chunk[0][1].shape
        for y0 in range(rows):
            for x0 in range(cols):
                for (k, keep, mi, conf, gx, gy, gw, gh) in chunk:
                    if not keep[y0, x0]:
                        continue
                    w = gw[y0, x0]
                    h = gh[y0, x0]
                    bbox = (gx[y0, x0] - w / 2, gy[y0, x0] - h / 2, w, h)
                    results.append((int(mi[y0, x0]) + 1, float(conf[y0, x0]), bbox))
    return results


def _asymmetric_overlap(picked_bbox, bbox) -> float:
    """intersection(picked, b) / area(picked) — the reference's get_iou."""
    (x0, y0, w0, h0) = picked_bbox
    (x1, y1, w1, h1) = bbox
    ix = max(x0, x1)
    iy = max(y0, y1)
    iw = min(x0 + w0, x1 + w1) - ix
    ih = min(y0 + h0, y1 + h1) - iy
    if iw <= 0 or ih <= 0:
        return 0.0
    return (iw * ih) / (w0 * h0)


def soft_nms_oracle(
    candidates: List[Tuple[int, float, Tuple[float, float, float, float]]],
    threshold: float,
) -> List[Tuple[int, float, Tuple[float, float, float, float]]]:
    """Gaussian soft-NMS with the reference's semantics.

    Iteratively picks the highest-score candidate (first occurrence wins
    ties), stops when the best decayed score drops below ``threshold``,
    and decays every survivor by exp(-3 * overlap^2) where overlap is the
    asymmetric intersection/area(picked). Output order = pick order
    (non-increasing scores).
    """
    n = len(candidates)
    scores = np.array([c[1] for c in candidates], dtype=np.float64)
    alive = np.ones(n, dtype=bool)
    picked: List[int] = []
    pick_scores: List[float] = []
    while alive.any():
        masked = np.where(alive, scores, -np.inf)
        m = int(np.argmax(masked))
        best = masked[m]
        if best < threshold:
            break
        picked.append(m)
        pick_scores.append(float(best))
        alive[m] = False
        pb = candidates[m][2]
        for j in np.nonzero(alive)[0]:
            ov = _asymmetric_overlap(pb, candidates[j][2])
            scores[j] *= np.exp(-3.0 * ov * ov)
    return [
        (candidates[m][0], s, candidates[m][2]) for m, s in zip(picked, pick_scores)
    ]


def detect_oracle(
    heads: Sequence[np.ndarray],
    anchor_sets,
    num_classes: int,
    threshold: float,
    image_size: int = 416,
) -> ImageResults:
    """Full reference postprocess: decode + soft-NMS + scale to pixels.

    Returns [(klass, conf, x, y, w, h)] in 416-pixel top-left coords, the
    shape of Detector.perform's output (reference detector.py:142-144).
    """
    cands = decode_heads_oracle(heads, anchor_sets, num_classes, threshold, image_size)
    kept = soft_nms_oracle(cands, threshold)
    return [
        (k, conf, bx * image_size, by * image_size, bw * image_size, bh * image_size)
        for (k, conf, (bx, by, bw, bh)) in kept
    ]
