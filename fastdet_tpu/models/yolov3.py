"""YOLOv3 model family as declarative graph specs + a JAX interpreter.

The reference delegates all inference to ONNX Runtime sessions over opaque
.onnx graphs (server/detector.py:108-135) and selects the anchor table by
the number of model outputs (detector.py:96-106,136). Here the YOLOv3
architectures (Redmon & Farhadi 2018) are first-class: each model is a flat
list of layer specs (the same structure Darknet .cfg files describe), and
:func:`apply` interprets a spec over a parameter pytree. Because the spec
is static Python, tracing unrolls it into one static XLA graph — ideal for
jit/pjit.

Models:

- ``yolov3``       full Darknet-53 backbone, 3 detection scales (13/26/52)
- ``yolov3-tiny``  7-conv backbone, 2 detection scales (13/26)
- the 9-class "rsu" variant is ``yolov3`` with num_classes=9
  (reference runs it via the registry grammar ``rsu:9:<model>``,
  server/server.py:354-358).

Output order matches the reference anchor-table order: largest-stride grid
first (13x13, biggest anchors), per detector.py:96-106.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from fastdet_tpu.models import layers

IMAGE_SIZE = 416

# Anchor tables, pixel units at 416x416 — identical values to the
# reference's ONNXDetector.ANCHORS (server/detector.py:96-106).
ANCHORS_FULL = (
    ((116, 90), (156, 198), (373, 326)),  # 13x13
    ((30, 61), (62, 45), (59, 119)),      # 26x26
    ((10, 13), (16, 30), (33, 23)),       # 52x52
)
ANCHORS_TINY = (
    ((81, 82), (135, 169), (344, 319)),   # 13x13
    ((10, 14), (23, 27), (37, 58)),       # 26x26
)


# ---------------------------------------------------------------------------
# Layer specs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Conv:
    filters: int
    ksize: int = 3
    stride: int = 1
    bn: bool = True
    act: bool = True           # LeakyReLU(0.1) when True, linear when False
    name: str = ""             # filled in by _finalize
    # Explicit ((top, bottom), (left, right)) padding override; None =
    # Darknet SAME ((k-1)//2 each side). Used by the space-to-depth stem
    # rewrite (models/s2d.py), whose phase algebra needs asymmetric pads.
    pad: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None


@dataclass(frozen=True)
class MaxPool:
    size: int = 2
    stride: int = 2


@dataclass(frozen=True)
class SpaceToDepth:
    """NHWC (H, W, C) -> (H/f, W/f, f*f*C [+ pad_channels zeros]),
    phase-major channel order (row phase, col phase, source channel).
    Pure relayout — inserted by the inference-only stem rewrite in
    models/s2d.py to turn the MXU-starved first convolutions (3 input
    channels) into well-shaped GEMMs. Value-preserving, so int8 tensors
    pass through unchanged. ``pad_channels`` appends zero channels:
    int8 convolutions with fewer than 32 input channels fall off the
    MXU's packed-lane path (measured 11x slower at 12ch vs 32ch for
    the SAME kernel, docs/ROUND8.md); the consumer conv's kernel gets
    matching zero input rows, so sums are bit-identical."""
    factor: int = 2
    pad_channels: int = 0


@dataclass(frozen=True)
class Upsample:
    pass


@dataclass(frozen=True)
class Route:
    """Concatenate the outputs of earlier layers along channels."""
    sources: Tuple[int, ...]


@dataclass(frozen=True)
class Shortcut:
    """Residual add with the output of an earlier layer."""
    source: int


@dataclass(frozen=True)
class YoloHead:
    """Marks the previous layer's output as a detection output."""
    scale: int  # 0 = 13x13 (largest anchors), 1 = 26x26, 2 = 52x52


Spec = Any


@dataclass(frozen=True)
class ModelSpec:
    name: str
    num_classes: int
    layers: Tuple[Spec, ...]
    anchors: Tuple[Tuple[Tuple[int, int], ...], ...]
    image_size: int = IMAGE_SIZE

    @property
    def num_outputs(self) -> int:
        return len(self.anchors)

    @property
    def head_channels(self) -> int:
        return 3 * (5 + self.num_classes)

    def conv_specs(self) -> List[Conv]:
        return [l for l in self.layers if isinstance(l, Conv)]


def _finalize(name: str, num_classes: int, specs: List[Spec], anchors) -> ModelSpec:
    """Assign stable conv names (conv0..convN in graph order)."""
    out: List[Spec] = []
    ci = 0
    for s in specs:
        if isinstance(s, Conv):
            out.append(Conv(s.filters, s.ksize, s.stride, s.bn, s.act,
                            f"conv{ci}", s.pad))
            ci += 1
        else:
            out.append(s)
    return ModelSpec(name, num_classes, tuple(out), anchors)


# ---------------------------------------------------------------------------
# Architectures
# ---------------------------------------------------------------------------

def yolov3_tiny_spec(num_classes: int = 80) -> ModelSpec:
    """YOLOv3-tiny: 2 detection scales, anchors per ANCHORS_TINY."""
    head = 3 * (5 + num_classes)
    s: List[Spec] = [
        Conv(16), MaxPool(),                   # 0,1   416 -> 208
        Conv(32), MaxPool(),                   # 2,3   -> 104
        Conv(64), MaxPool(),                   # 4,5   -> 52
        Conv(128), MaxPool(),                  # 6,7   -> 26
        Conv(256),                             # 8     26x26x256 (routed below)
        MaxPool(),                             # 9     -> 13
        Conv(512),                             # 10
        MaxPool(size=2, stride=1),             # 11    stays 13
        Conv(1024),                            # 12
        Conv(256, ksize=1),                    # 13    (routed below)
        Conv(512),                             # 14
        Conv(head, ksize=1, bn=False, act=False),  # 15
        YoloHead(0),                           # 16    13x13 output
        Route((13,)),                          # 17
        Conv(128, ksize=1),                    # 18
        Upsample(),                            # 19    -> 26
        Route((19, 8)),                        # 20    128+256 ch
        Conv(256),                             # 21
        Conv(head, ksize=1, bn=False, act=False),  # 22
        YoloHead(1),                           # 23    26x26 output
    ]
    return _finalize("yolov3-tiny", num_classes, s, ANCHORS_TINY)


def yolov3_spec(num_classes: int = 80) -> ModelSpec:
    """Full YOLOv3: Darknet-53 backbone + FPN-style 3-scale head."""
    head = 3 * (5 + num_classes)
    s: List[Spec] = []

    def res_block(in_half: int):
        # 1x1 squeeze + 3x3 expand + residual add with the block input.
        base = len(s) - 1
        s.append(Conv(in_half, ksize=1))
        s.append(Conv(in_half * 2))
        s.append(Shortcut(base))

    s.append(Conv(32))                          # 0
    s.append(Conv(64, stride=2))                # 1   416 -> 208
    res_block(32)                               # 2,3,4
    s.append(Conv(128, stride=2))               # 5   -> 104
    for _ in range(2):
        res_block(64)                           # 6..11
    s.append(Conv(256, stride=2))               # 12  -> 52
    for _ in range(8):
        res_block(128)                          # 13..36 (layer 36 routed)
    s.append(Conv(512, stride=2))               # 37  -> 26
    for _ in range(8):
        res_block(256)                          # 38..61 (layer 61 routed)
    s.append(Conv(1024, stride=2))              # 62  -> 13
    for _ in range(4):
        res_block(512)                          # 63..74

    # Head, scale 0 (13x13)
    s += [Conv(512, ksize=1), Conv(1024), Conv(512, ksize=1),
          Conv(1024), Conv(512, ksize=1)]       # 75..79
    s += [Conv(1024),                           # 80
          Conv(head, ksize=1, bn=False, act=False),  # 81
          YoloHead(0)]                          # 82

    # Head, scale 1 (26x26)
    s += [Route((79,)), Conv(256, ksize=1), Upsample(), Route((85, 61))]  # 83..86
    s += [Conv(256, ksize=1), Conv(512), Conv(256, ksize=1),
          Conv(512), Conv(256, ksize=1)]        # 87..91
    s += [Conv(512),                            # 92
          Conv(head, ksize=1, bn=False, act=False),  # 93
          YoloHead(1)]                          # 94

    # Head, scale 2 (52x52)
    s += [Route((91,)), Conv(128, ksize=1), Upsample(), Route((97, 36))]  # 95..98
    s += [Conv(128, ksize=1), Conv(256), Conv(128, ksize=1),
          Conv(256), Conv(128, ksize=1)]        # 99..103
    s += [Conv(256),                            # 104
          Conv(head, ksize=1, bn=False, act=False),  # 105
          YoloHead(2)]                          # 106

    return _finalize("yolov3", num_classes, s, ANCHORS_FULL)


def get_spec(arch: str, num_classes: int = 80) -> ModelSpec:
    if arch in ("tiny", "yolov3-tiny"):
        return yolov3_tiny_spec(num_classes)
    if arch in ("full", "yolov3", "rsu"):
        return yolov3_spec(num_classes)
    raise ValueError(f"unknown architecture: {arch!r}")


# ---------------------------------------------------------------------------
# Parameter init and the spec interpreter
# ---------------------------------------------------------------------------

def conv_io_channels(spec: ModelSpec) -> List[Tuple[int, int, int]]:
    """(in_channels, filters, ksize) per conv in spec order, simulating
    channel flow through the layer graph (Route concatenates;
    MaxPool/Upsample/Shortcut/YoloHead preserve channels).

    The single channel-flow walker: init_params sizes weights from it
    and models/onnx_io verifies imported conv assignment against it, so
    a new layer type changes the flow in exactly one place.
    """
    out: List[Tuple[int, int, int]] = []
    channels: List[int] = []  # output channels per layer index
    in_ch = 3
    for l in spec.layers:
        if isinstance(l, Conv):
            out.append((in_ch, l.filters, l.ksize))
            in_ch = l.filters
        elif isinstance(l, Route):
            in_ch = sum(channels[i] for i in l.sources)
        elif isinstance(l, (MaxPool, Upsample, Shortcut, YoloHead)):
            pass
        channels.append(in_ch)
    return out


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init parameter pytree {conv_name: {'w', 'b'|'bn'}}."""
    params: Dict[str, Any] = {}
    convs = [l for l in spec.layers if isinstance(l, Conv)]
    for l, (in_ch, filters, ksize) in zip(convs, conv_io_channels(spec)):
        key, sub = jax.random.split(key)
        params[l.name] = layers.init_conv_params(
            sub, ksize, in_ch, filters, l.bn, dtype
        )
    return params


def fold_params(spec: ModelSpec, params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold all BN layers into conv weight+bias for inference."""
    return {name: layers.fold_conv_bn(p) for name, p in params.items()}


def apply(
    spec: ModelSpec,
    params: Dict[str, Any],
    x: jnp.ndarray,
    *,
    train: bool = False,
    compute_dtype=None,
    bn_stats: Optional[Dict[str, Any]] = None,
) -> List[jnp.ndarray]:
    """Run the model graph; returns the raw head outputs (NHWC).

    ``x`` is an NHWC float batch (B, 416, 416, 3), already normalized to
    [0,1]. In inference (``train=False``) ``params`` must be folded
    (fold_params); in training they carry BN leaves and batch statistics
    are used. Pass a dict as ``bn_stats`` in training to collect each BN
    layer's batch (mean, var) for running-stat EMA updates. Outputs are
    float32 regardless of compute dtype.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    outputs: List[jnp.ndarray] = []   # per-layer activations
    heads: List[jnp.ndarray] = []
    cur = x
    for l in spec.layers:
        if isinstance(l, Conv):
            p = params[l.name]
            if train and "bn" in p:
                y = layers.conv2d_train(cur, p["w"], l.stride, l.pad)
                y, bmean, bvar = layers.batch_norm_train_stats(p["bn"], y)
                if bn_stats is not None:
                    bn_stats[l.name] = {"mean": bmean, "var": bvar}
                cur = layers.leaky_relu(y) if l.act else y
            elif train:
                cur = layers.conv_bn_block_train(p, cur, l.stride, l.act)
            else:
                cur = layers.conv_block(p, cur, l.stride, l.act, l.pad)
        elif isinstance(l, SpaceToDepth):
            cur = layers.space_to_depth(cur, l.factor, l.pad_channels)
        elif isinstance(l, MaxPool):
            cur = layers.maxpool2d(cur, l.size, l.stride)
        elif isinstance(l, Upsample):
            cur = layers.upsample2x(cur)
        elif isinstance(l, Route):
            srcs = [outputs[i] for i in l.sources]
            cur = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        elif isinstance(l, Shortcut):
            cur = cur + outputs[l.source]
        elif isinstance(l, YoloHead):
            heads.append(cur.astype(jnp.float32))
        outputs.append(cur)
    assert len(heads) == spec.num_outputs
    return heads


def head_grid_sizes(spec: ModelSpec) -> List[int]:
    """Grid side length per head output, e.g. [13, 26, 52] for full."""
    return [spec.image_size // (32 >> i) for i in range(spec.num_outputs)]
