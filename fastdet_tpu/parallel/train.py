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


def make_train_step(spec: ModelSpec, optimizer, *, compute_dtype=None):
    """Build the jit-able train step fn(state, images, *targets)."""

    def step_fn(state: TrainState, images: jnp.ndarray, *targets: jnp.ndarray):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: yolo_loss(
                spec, p, images, targets, train=True,
                compute_dtype=compute_dtype, collect_bn_stats=True,
            ),
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
