"""Training subsystem: YOLOv3 loss, target building, sharded train step.

The reference is inference-only (its "checkpoint" is the ONNX file loaded
at startup, SURVEY.md §5); this module adds the training capability a
standalone framework needs — fine-tuning the RSU-9 variant is the
concrete use case the reference implies (its custom 9-class model had to
be trained somewhere).

Loss follows the YOLOv3 formulation (Redmon & Farhadi 2018): per scale,
- coordinate loss on the positive cells: MSE on sigmoid(tx,ty) against the
  cell-relative offsets and on raw (tw,th) against log-space targets,
  weighted by (2 - w*h) to boost small boxes;
- objectness BCE everywhere (noobj term down-weighted);
- per-class BCE on the positive cells (multi-label, like the paper).

The train step is one jit'd SPMD program over a ('dp','tp') mesh: batch on
dp, wide conv channels on tp (fastdet_tpu.parallel.mesh); XLA inserts the
gradient psum over dp and the channel collectives over tp.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fastdet_tpu.models import yolov3
from fastdet_tpu.models.yolov3 import ModelSpec
from fastdet_tpu.parallel import mesh as mesh_lib

LAMBDA_COORD = 5.0
LAMBDA_NOOBJ = 0.5
BN_MOMENTUM = 0.97   # running-stat EMA factor per step


# ---------------------------------------------------------------------------
# Target building (host-side, numpy)
# ---------------------------------------------------------------------------

def build_targets(
    spec: ModelSpec,
    gt_boxes: Sequence[np.ndarray],    # per image: (N, 4) normalized cx cy w h
    gt_labels: Sequence[np.ndarray],   # per image: (N,) int, 0-indexed classes
    grids: Optional[Sequence[int]] = None,
    multi_anchor_thr: Optional[float] = 0.35,
) -> List[np.ndarray]:
    """Dense per-scale targets (B, H, W, 3, 5+C).

    Channel layout: [tx_off, ty_off, tw_log, th_log, obj, one-hot classes].
    Each ground-truth box claims the best-matching FREE anchor slot (max
    IoU of width/height against the anchor table, at its center cell for
    that anchor's scale) — and, when ``multi_anchor_thr`` is set, every
    other free anchor whose wh-IoU clears the threshold too (the
    standard recall trick: objects near an anchor-size boundary
    otherwise train only one of the two near-equally-responsible
    predictors, and the one that fires at test time may be the untrained
    one).

    Collision-aware (VERDICT r4 #4): when two similar-size objects share
    a cell at one scale, the naive rule assigns both to the SAME
    (cell, anchor) slot and the later write evicts the earlier — the
    trained model then structurally cannot detect both (the r4 failure
    mode: 3-object scenes missing exactly one object). Instead, a box
    whose best slot already holds another box's primary assignment
    overflows to its next-best anchor by wh-IoU — different anchors of
    the same cell, or another scale entirely, whose FINER/COARSER grid
    usually separates the two centers into different cells. Primaries
    may evict threshold-extras but never another primary; candidates are
    floored at wh-IoU ≥ max(0.15, iou_best/2) so overflow never lands
    on a wildly wrong-size anchor (log-ratio targets stay sane).
    """
    b = len(gt_boxes)
    c = spec.num_classes
    grids = list(grids) if grids is not None else yolov3.head_grid_sizes(spec)
    targets = [np.zeros((b, g, g, 3, 5 + c), np.float32) for g in grids]

    anchors = np.asarray(spec.anchors, np.float32)       # (S, 3, 2) pixels
    flat = anchors.reshape(-1, 2)                         # (S*3, 2)

    def slot_of(a, cx, cy):
        s, k = divmod(a, anchors.shape[1])
        g = grids[s]
        gx = min(int(cx * g), g - 1)
        gy = min(int(cy * g), g - 1)
        return s, k, gy, gx

    for i in range(b):
        boxes = np.asarray(gt_boxes[i], np.float32).reshape(-1, 4)
        labels = np.asarray(gt_labels[i]).reshape(-1)
        occ: Dict[Tuple[int, int, int, int], bool] = {}  # slot -> is_primary
        for (cx, cy, w, h), lab in zip(boxes, labels):
            if lab < 0:
                continue   # negative label = ignore marker (darknet -1)
            if lab >= spec.num_classes:
                # an out-of-range label would either IndexError deep in
                # numpy or (e.g. -1 via wraparound) silently overwrite
                # the objectness channel — fail with context instead
                raise ValueError(
                    f"label {int(lab)} out of range for "
                    f"{spec.num_classes}-class model (image {i})")
            wh = np.array([w, h], np.float32) * spec.image_size
            inter = np.minimum(flat, wh).prod(axis=1)
            union = flat.prod(axis=1) + wh.prod() - inter
            iou = inter / np.maximum(union, 1e-9)
            order = np.argsort(-iou)
            best = int(order[0])
            floor = max(0.15, float(iou[best]) * 0.5)
            primary = best            # fallback: overwrite-best (rare)
            for a in order:
                if iou[a] < floor and a != best:
                    break
                if occ.get(slot_of(int(a), cx, cy)) is not True:
                    primary = int(a)
                    break
            chosen = [primary]
            if multi_anchor_thr is not None:
                for a in np.nonzero(iou >= multi_anchor_thr)[0].tolist():
                    if a != primary and slot_of(a, cx, cy) not in occ:
                        chosen.append(a)
            for a in chosen:
                s, k, gy, gx = slot_of(a, cx, cy)
                occ[(s, k, gy, gx)] = occ.get((s, k, gy, gx), False) \
                    or (a == primary)
                g = grids[s]
                t = targets[s][i, gy, gx, k]
                t[:] = 0.0
                t[0] = cx * g - gx
                t[1] = cy * g - gy
                t[2] = np.log(max(wh[0], 1e-6) / anchors[s, k, 0])
                t[3] = np.log(max(wh[1], 1e-6) / anchors[s, k, 1])
                t[4] = 1.0
                t[5 + int(lab)] = 1.0
    return targets


# Sparse target row layout: [scale, gy, gx, k, tx, ty, tw, th, lab];
# invalid slots carry scale = -1.
MAX_SLOTS = 32


def build_sparse_targets(
    spec: ModelSpec,
    gt_boxes: Sequence[np.ndarray],
    gt_labels: Sequence[np.ndarray],
    grids: Optional[Sequence[int]] = None,
    multi_anchor_thr: Optional[float] = 0.35,
    max_slots: int = MAX_SLOTS,
) -> np.ndarray:
    """Sparse (B, max_slots, 9) float32 form of :func:`build_targets`.

    Dense per-scale planes cost (g²·3·(5+C)) floats per scale per image
    — at C=80 with flip variants that is tens of GB for a resident
    dataset, while the actual information is ≤ a few dozen slot rows.
    The sparse form stores exactly the assigned slots (same collision-
    aware selection as the dense builder: this delegates to it with
    tiny per-image planes and reads the nonzeros back, so the two can
    never drift) and the device loss (:func:`yolo_loss_sparse`)
    scatters/gathers on device. Geometric flips become an O(slots)
    index transform (:func:`flip_slots`) instead of 4 stored variants.
    """
    b = len(gt_boxes)
    grids = list(grids) if grids is not None else yolov3.head_grid_sizes(spec)
    out = np.full((b, max_slots, 9), -1.0, np.float32)
    for i in range(b):
        # per-image dense planes (tiny) — building the whole batch dense
        # at C=80 would transiently cost GBs of host RAM
        dense = build_targets(spec, [gt_boxes[i]], [gt_labels[i]], grids,
                              multi_anchor_thr)
        rows = []
        for s, g in enumerate(grids):
            pos = np.argwhere(dense[s][0, :, :, :, 4] > 0)
            for gy, gx, k in pos:
                t = dense[s][0, gy, gx, k]
                lab = int(np.argmax(t[5:]))
                rows.append([s, gy, gx, k, t[0], t[1], t[2], t[3], lab])
        if len(rows) > max_slots:
            raise ValueError(
                f"image {i}: {len(rows)} assigned slots exceed "
                f"max_slots={max_slots}")
        if rows:
            out[i, :len(rows)] = np.asarray(rows, np.float32)
    return out


def flip_slots(
    slots: jnp.ndarray,          # (B, M, 9) float32
    fh: jnp.ndarray,             # (B,) bool — horizontal flip
    fv: jnp.ndarray,             # (B,) bool — vertical flip
    grids: Sequence[int],
) -> jnp.ndarray:
    """Transform sparse targets for on-device image flips.

    A flipped center cx' = 1-cx maps to cell/offset
    (gx', tx') = split(g - gx - tx): for tx ∈ (0,1) that is exactly
    (g-1-gx, 1-tx). The measure-zero tx == 0 edge clamps into the last
    cell (training-tolerance only — targets are not a parity surface).
    Invalid slots (scale = -1) pass through unchanged.
    """
    garr = jnp.asarray(list(grids), jnp.float32)
    scale = slots[..., 0]
    valid = scale >= 0
    g = garr[jnp.clip(scale.astype(jnp.int32), 0, len(grids) - 1)]

    def _flip(gc, t):
        f = g - gc - t
        gc2 = jnp.clip(jnp.floor(f - 1e-6), 0.0, g - 1.0)
        return gc2, f - gc2

    gy, gx = slots[..., 1], slots[..., 2]
    ty, tx = slots[..., 5], slots[..., 4]
    gx_f, tx_f = _flip(gx, tx)
    gy_f, ty_f = _flip(gy, ty)
    fh_ = (fh[:, None] & valid)
    fv_ = (fv[:, None] & valid)
    out = slots
    out = out.at[..., 2].set(jnp.where(fh_, gx_f, gx))
    out = out.at[..., 4].set(jnp.where(fh_, tx_f, tx))
    out = out.at[..., 1].set(jnp.where(fv_, gy_f, gy))
    out = out.at[..., 5].set(jnp.where(fv_, ty_f, ty))
    return out


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def _bce_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid BCE."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def yolo_loss(
    spec: ModelSpec,
    params: Dict[str, Any],
    images: jnp.ndarray,                # (B, H, W, 3) float in [0,1]
    targets: Sequence[jnp.ndarray],     # per-scale (B, g, g, 3, 5+C)
    *,
    train: bool = True,
    compute_dtype=None,
    collect_bn_stats: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    bn_stats: Dict[str, Any] = {}
    heads = yolov3.apply(
        spec, params, images, train=train, compute_dtype=compute_dtype,
        bn_stats=bn_stats if (train and collect_bn_stats) else None,
    )
    b = images.shape[0]
    c = spec.num_classes
    coord_l = obj_l = cls_l = 0.0
    for head, tgt, anchors in zip(heads, targets, spec.anchors):
        g = head.shape[1]
        p = head.reshape(b, g, g, 3, 5 + c).astype(jnp.float32)
        pos = tgt[..., 4]
        # (2 - w*h) small-box boost, from the decoded target size
        aw = jnp.asarray(anchors, jnp.float32)[None, None, None, :, :]
        twh = jnp.exp(tgt[..., 2:4]) * aw / spec.image_size
        box_w = pos * (2.0 - twh[..., 0] * twh[..., 1])

        pxy = jax.nn.sigmoid(p[..., 0:2])
        coord_l += jnp.sum(
            box_w[..., None] * (pxy - tgt[..., 0:2]) ** 2
        ) + jnp.sum(box_w[..., None] * (p[..., 2:4] - tgt[..., 2:4]) ** 2)

        obj_bce = _bce_logits(p[..., 4], pos)
        obj_l += jnp.sum(jnp.where(pos > 0.5, obj_bce, LAMBDA_NOOBJ * obj_bce))

        cls_l += jnp.sum(pos[..., None] * _bce_logits(p[..., 5:], tgt[..., 5:]))

    total = (LAMBDA_COORD * coord_l + obj_l + cls_l) / b
    metrics: Dict[str, Any] = {
        "loss": total,
        "coord": coord_l / b,
        "obj": obj_l / b,
        "cls": cls_l / b,
    }
    if collect_bn_stats:
        metrics["bn_stats"] = bn_stats
    return total, metrics


def yolo_loss_sparse(
    spec: ModelSpec,
    params: Dict[str, Any],
    images: jnp.ndarray,                # (B, H, W, 3) float in [0,1]
    slots: jnp.ndarray,                 # (B, M, 9) sparse targets
    *,
    train: bool = True,
    compute_dtype=None,
    collect_bn_stats: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Same loss as :func:`yolo_loss`, computed from sparse slot rows.

    Coordinate/class terms gather head activations at the ≤M assigned
    slots; the objectness map is a scatter of ones into each scale's
    (g, g, 3) plane. Identical math to the dense spelling (the slot set
    IS the dense nonzero set), at O(M) instead of O(g²·C) target
    traffic — what makes an 80-class resident dataset fit."""
    bn_stats: Dict[str, Any] = {}
    heads = yolov3.apply(
        spec, params, images, train=train, compute_dtype=compute_dtype,
        bn_stats=bn_stats if (train and collect_bn_stats) else None,
    )
    b, m = images.shape[0], slots.shape[1]
    c = spec.num_classes
    scale_col = slots[..., 0]
    bidx = jax.lax.broadcasted_iota(jnp.int32, (b, m), 0)
    coord_l = obj_l = cls_l = 0.0
    for s, (head, anchors) in enumerate(zip(heads, spec.anchors)):
        g = head.shape[1]
        p = head.reshape(b, g, g, 3, 5 + c).astype(jnp.float32)
        sel = (scale_col == s)
        gy = jnp.clip(slots[..., 1].astype(jnp.int32), 0, g - 1)
        gx = jnp.clip(slots[..., 2].astype(jnp.int32), 0, g - 1)
        k = jnp.clip(slots[..., 3].astype(jnp.int32), 0, 2)
        pred = p[bidx, gy, gx, k]                      # (B, M, 5+C)
        txy = slots[..., 4:6]
        twh = slots[..., 6:8]
        lab = jnp.clip(slots[..., 8].astype(jnp.int32), 0, c - 1)
        aw = jnp.asarray(anchors, jnp.float32)[k]      # (B, M, 2)
        wh_dec = jnp.exp(twh) * aw / spec.image_size
        box_w = jnp.where(sel, 2.0 - wh_dec[..., 0] * wh_dec[..., 1], 0.0)
        pxy = jax.nn.sigmoid(pred[..., 0:2])
        coord_l += jnp.sum(box_w[..., None] * (pxy - txy) ** 2) \
            + jnp.sum(box_w[..., None] * (pred[..., 2:4] - twh) ** 2)
        onehot = jax.nn.one_hot(lab, c, dtype=jnp.float32)
        cls_l += jnp.sum(
            jnp.where(sel, jnp.sum(_bce_logits(pred[..., 5:], onehot), -1),
                      0.0))
        pos = jnp.zeros((b, g, g, 3), jnp.float32).at[
            bidx, gy, gx, k].max(jnp.where(sel, 1.0, 0.0))
        obj_bce = _bce_logits(p[..., 4], pos)
        obj_l += jnp.sum(jnp.where(pos > 0.5, obj_bce,
                                   LAMBDA_NOOBJ * obj_bce))
    total = (LAMBDA_COORD * coord_l + obj_l + cls_l) / b
    metrics: Dict[str, Any] = {
        "loss": total,
        "coord": coord_l / b,
        "obj": obj_l / b,
        "cls": cls_l / b,
    }
    if collect_bn_stats:
        metrics["bn_stats"] = bn_stats
    return total, metrics


# ---------------------------------------------------------------------------
# Train state / step
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def _decay_mask(params):
    """Weight decay applies to conv kernels only — decaying BN statistics
    or biases would corrupt them (their gradients are zero in train mode)."""

    def entry(p):
        out = {}
        for k, v in p.items():
            if k == "w":
                out[k] = True
            elif isinstance(v, dict):
                out[k] = {kk: False for kk in v}
            else:
                out[k] = False
        return out

    return {name: entry(p) for name, p in params.items()}


def make_optimizer(lr: float = 1e-3, weight_decay: float = 5e-4):
    return optax.adamw(lr, weight_decay=weight_decay, mask=_decay_mask)


def init_train_state(
    spec: ModelSpec, params: Dict[str, Any], optimizer
) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(spec: ModelSpec, optimizer, *, compute_dtype=None,
                    sparse: bool = False):
    """Build the jit-able train step fn(state, images, *targets).

    ``sparse=True`` builds the slot-row variant: fn(state, images,
    slots) with slots from :func:`build_sparse_targets`."""

    def step_fn(state: TrainState, images: jnp.ndarray, *targets: jnp.ndarray):
        loss_fn = (
            (lambda p: yolo_loss_sparse(
                spec, p, images, targets[0], train=True,
                compute_dtype=compute_dtype, collect_bn_stats=True))
            if sparse else
            (lambda p: yolo_loss(
                spec, p, images, targets, train=True,
                compute_dtype=compute_dtype, collect_bn_stats=True)))
        (_, metrics), grads = jax.value_and_grad(
            loss_fn,
            has_aux=True,
        )(state.params)
        bn_stats = metrics.pop("bn_stats", {})
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA the BN running statistics used by the folded inference path.
        new_params = dict(params)
        for name, s in bn_stats.items():
            p = dict(new_params[name])
            bn = dict(p["bn"])
            bn["mean"] = BN_MOMENTUM * bn["mean"] + (1 - BN_MOMENTUM) * s["mean"]
            bn["var"] = BN_MOMENTUM * bn["var"] + (1 - BN_MOMENTUM) * s["var"]
            p["bn"] = bn
            new_params[name] = p
        return TrainState(new_params, opt_state, state.step + 1), metrics

    return step_fn


def shard_batch(mesh, images: np.ndarray, targets: Sequence[np.ndarray]):
    """device_put a host batch with dp sharding (targets dp on axis 0)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    img = jax.device_put(images, mesh_lib.batch_sharding(mesh))
    tgt_sh = NamedSharding(mesh, P("dp"))
    return img, tuple(jax.device_put(t, tgt_sh) for t in targets)


def make_sharded_train_step(
    spec: ModelSpec,
    mesh,
    optimizer,
    params: Dict[str, Any],
    *,
    compute_dtype=None,
):
    """jit the train step over a ('dp','tp') mesh.

    Returns (jitted_step, sharded_state). Parameters are committed with
    their tp channel shardings; the optimizer state is initialized *inside*
    jit so GSPMD lays it out to match. Batches must be placed with
    :func:`shard_batch`. The dp gradient all-reduce and tp channel
    collectives are inserted by the compiler.
    """
    from fastdet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()   # fwd+bwd+optimizer is the repo's biggest graph
    sharded_params = mesh_lib.shard_params(spec, mesh, params)

    @jax.jit
    def init_fn(p):
        return TrainState(p, optimizer.init(p), jnp.zeros((), jnp.int32))

    state = init_fn(sharded_params)
    step_fn = make_train_step(spec, optimizer, compute_dtype=compute_dtype)
    return jax.jit(step_fn, donate_argnums=0), state
