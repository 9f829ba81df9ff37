"""Post-training int8 quantization for the YOLOv3 family.

The v5e MXU runs int8 at ~1.5x the measured bf16 conv throughput in
isolation (chained 3x3x256x256 convs: 177 TOP/s vs 119 TFLOP/s).

**int8-through activations** (round-2): activations stay int8 ACROSS
consecutive conv/pool layers — each quantized conv requantizes its own
output into a statically calibrated per-tensor scale inside the int32
epilogue (one fused multiply+round), and the next conv consumes the
int8 tensor directly. Round 1 kept float activations between layers, so
every conv paid an f32 write + f32 read + int8 write + int8 read of
inter-layer traffic; through-mode pays int8 write + int8 read — 4x less
HBM traffic on the layer boundary — which is what cancelled the MXU
gain end-to-end (measured 0.95 vs 0.99 ms/img, round-1 note).

Float remains exactly where the graph shape demands it: routes
(concat of tensors with different scales), shortcuts (adds), and the
detection heads (bn=False convs feeding sigmoid/argmax, negligible
FLOPs). MaxPool/Upsample are order/value-preserving and run on int8
directly. A bn-conv emits int8 only when its chain successor can
consume it (Conv(bn) or MaxPool); otherwise it emits f32 and skips the
output requantization entirely.

- **weights**: symmetric per-output-channel int8
  (w_scale[o] = max|w[..,o]| / 127) — the standard scheme that keeps CNN
  detector accuracy within ~1% mAP of float when paired with
- **activations**: symmetric per-tensor int8 with *static* calibration:
  one instrumented forward pass over representative frames records each
  conv input's (and bn-conv output's) absolute maximum. Static scales
  keep the whole network a single AOT-compiled program.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from fastdet_tpu.models import layers, yolov3
from fastdet_tpu.models.yolov3 import (
    Conv, MaxPool, ModelSpec, Route, Shortcut, SpaceToDepth, Upsample,
    YoloHead)


def _walk(spec: ModelSpec, params, x, conv_fn):
    """Shared graph walk; conv_fn(layer, params[name], x) -> y."""
    outputs: List[jnp.ndarray] = []
    heads: List[jnp.ndarray] = []
    cur = x
    for l in spec.layers:
        if isinstance(l, Conv):
            cur = conv_fn(l, params[l.name], cur)
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
    return heads


def emits_int8(spec: ModelSpec) -> Dict[str, bool]:
    """Per bn-conv: does its output stay int8 (chain successor consumes
    int8 directly)? Routes/shortcuts/heads force a float boundary."""
    out: Dict[str, bool] = {}
    ls = spec.layers
    for i, l in enumerate(ls):
        if isinstance(l, Conv) and l.bn:
            nxt = ls[i + 1] if i + 1 < len(ls) else None
            out[l.name] = isinstance(nxt, (MaxPool, SpaceToDepth)) or (
                isinstance(nxt, Conv) and nxt.bn
            )
    return out


def collect_act_absmax(
    spec: ModelSpec, folded_params: Dict[str, Any], images: jnp.ndarray
):
    """One calibration forward: per-conv input absmax + bn-conv output
    absmax (post-activation), both f32 scalars."""
    stats_in: Dict[str, jnp.ndarray] = {}
    stats_out: Dict[str, jnp.ndarray] = {}

    def conv_fn(l: Conv, p, x):
        stats_in[l.name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        y = layers.conv_block(p, x, l.stride, l.act, l.pad)
        if l.bn:
            stats_out[l.name] = jnp.max(jnp.abs(y.astype(jnp.float32)))
        return y

    _walk(spec, folded_params, images.astype(jnp.float32), conv_fn)
    return stats_in, stats_out


def calibrate(
    spec: ModelSpec,
    folded_params: Dict[str, Any],
    calib_images: np.ndarray,        # (N, H, W, 3) uint8 or f32 [0,1]
) -> Dict[str, Dict[str, float]]:
    """Static per-layer activation scales from representative frames.

    Returns {conv_name: {"x": input_scale, "y": output_scale}} ("y" only
    for bn convs).
    """
    imgs = np.asarray(calib_images)
    if imgs.dtype == np.uint8:
        imgs = imgs.astype(np.float32) / 255.0

    # Two startup-cost rules learned on the tunneled backend
    # (docs/ROUND8.md): (1) params enter the jit as an ARGUMENT, not a
    # closure — closed-over arrays are embedded in the traced program;
    # (2) the per-layer absmax dict is STACKED device-side so the
    # result is two device_gets, not ~150 scalar round-trips (measured
    # at 60+ s of the old 87 s calibration wall).
    names_in = [l.name for l in spec.layers if isinstance(l, Conv)]
    names_out = [l.name for l in spec.layers
                 if isinstance(l, Conv) and l.bn]

    def stacked(p, ims):
        sin, sout = collect_act_absmax(spec, p, ims)
        return (jnp.stack([sin[n] for n in names_in]),
                jnp.stack([sout[n] for n in names_out]))

    # Calibration runs on the HOST CPU backend when one exists and the
    # default device is remote: it's a one-off forward over a handful
    # of frames, and running it on the accelerator costs a full f32
    # parameter upload through the tunnel first (248 MB for yolov3-full
    # — 10-60 s of pure link weather vs a stable ~9 s of host compute).
    args = (folded_params, imgs)
    offloaded = False
    try:
        if jax.default_backend() != "cpu":
            cpu = jax.local_devices(backend="cpu")[0]
            args = jax.device_put(args, cpu)
            offloaded = True
    except RuntimeError:
        pass  # no host CPU backend registered: use the default device
    if offloaded:
        # Don't persist this compile: CPU AOT artifacts produced inside
        # a remote-device-plugin process carry pseudo machine features
        # (prefer-no-gather/-scatter) that NO later process can load —
        # each would log a feature-mismatch error and recompile anyway,
        # while the dead artifact (~10 MB) accumulates in the cache.
        key = "jax_persistent_cache_min_compile_time_secs"
        old = getattr(jax.config, key)
        jax.config.update(key, 1e9)
        try:
            vin, vout = jax.device_get(jax.jit(stacked)(*args))
        finally:
            jax.config.update(key, old)
    else:
        vin, vout = jax.device_get(jax.jit(stacked)(*args))
    scales: Dict[str, Dict[str, float]] = {}
    for name, v in zip(names_in, vin):
        scales[name] = {"x": float(max(v, 1e-6)) / 127.0}
    for name, v in zip(names_out, vout):
        scales[name]["y"] = float(max(v, 1e-6)) / 127.0
    return scales


def quantize_params(
    spec: ModelSpec,
    folded_params: Dict[str, Any],
    act_scales: Dict[str, Dict[str, float]],
) -> Dict[str, Any]:
    """int8 weights + scales; head (bn=False) convs pass through float.

    ``y_scale`` is attached only where the conv's output stays int8
    (see emits_int8); elsewhere the epilogue emits f32 directly.
    """
    emit = emits_int8(spec)
    out: Dict[str, Any] = {}
    for l in spec.layers:
        if not isinstance(l, Conv):
            continue
        p = folded_params[l.name]
        if not l.bn:  # float head conv
            out[l.name] = {"w": p["w"], "b": p["b"]}
            continue
        w = np.asarray(p["w"], np.float32)
        w_scale = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
        w_q = np.clip(np.round(w / w_scale[None, None, None, :]), -127, 127)
        # host numpy out (like the loaders): the engine device_puts the
        # finished tree once; per-tensor jnp.asarray here was an eager
        # upload storm on remote backends
        entry = {
            "w_q": w_q.astype(np.int8),
            "w_scale": w_scale,
            "b": p["b"],
            "x_scale": np.float32(act_scales[l.name]["x"]),
        }
        if emit.get(l.name) and "y" in act_scales[l.name]:
            entry["y_scale"] = np.float32(act_scales[l.name]["y"])
        out[l.name] = entry
    return out


def apply_int8(
    spec: ModelSpec, qparams: Dict[str, Any], x: jnp.ndarray
) -> List[jnp.ndarray]:
    """int8-through quantized forward; same output contract as
    yolov3.apply (f32 heads).

    The walk carries (tensor, scale): scale None means the tensor is
    plain f32; otherwise the tensor is int8 and ``tensor * scale``
    recovers the float value.
    """
    dn = ("NHWC", "HWIO", "NHWC")

    def deq(t, s):
        return t if s is None else t.astype(jnp.float32) * s

    outputs: List[Any] = []   # (tensor, scale)
    heads: List[jnp.ndarray] = []
    cur, cs = x.astype(jnp.float32), None
    for li, l in enumerate(spec.layers):
        if isinstance(l, Conv):
            p = qparams[l.name]
            if "w_q" not in p:  # float head conv
                cur, cs = layers.conv_block(
                    p, deq(cur, cs), l.stride, l.act, l.pad), None
            else:
                if cs is None:
                    s_in = p["x_scale"]
                    xq = jnp.clip(
                        jnp.round(cur.astype(jnp.float32) * (1.0 / s_in)),
                        -127, 127,
                    ).astype(jnp.int8)
                else:
                    # int8-through: consume the producer's tensor directly
                    s_in, xq = cs, cur
                padding = (l.pad if l.pad is not None else
                           (((l.ksize - 1) // 2,) * 2,) * 2)
                if jax.default_backend() == "cpu":
                    # XLA:CPU has no vectorized int8 conv — the int32-
                    # accumulating form below lowers to scalar loops,
                    # measured ~100x slower than f32 (113 s/image for
                    # tiny@416). A single f32 conv is fast but NOT
                    # value-safe: a wide 3x3x1024 layer can accumulate
                    # past 2^24 where f32 drops integer precision, so
                    # CPU could diverge from the TPU int32 path by whole
                    # counts. Split both operands into 4-bit halves —
                    # every partial conv's accumulator stays below 2^22
                    # (exact in f32) — and recombine in int32: BIT-EXACT
                    # vs int32 accumulation at 4 f32 convs' cost. TPU
                    # keeps the true int8 MXU path.
                    xh = jnp.right_shift(xq.astype(jnp.int32), 4)
                    xl = xq.astype(jnp.int32) - (xh << 4)   # in [0, 15]
                    wh = jnp.right_shift(p["w_q"].astype(jnp.int32), 4)
                    wl = p["w_q"].astype(jnp.int32) - (wh << 4)

                    def _c(a, b):
                        return jnp.round(jax.lax.conv_general_dilated(
                            a.astype(jnp.float32), b.astype(jnp.float32),
                            (l.stride, l.stride), list(padding),
                            dimension_numbers=dn,
                        )).astype(jnp.int32)

                    y = ((_c(xh, wh) << 8) + ((_c(xh, wl) + _c(xl, wh)) << 4)
                         + _c(xl, wl))
                else:
                    y = jax.lax.conv_general_dilated(
                        xq, p["w_q"], (l.stride, l.stride),
                        list(padding),
                        dimension_numbers=dn,
                        preferred_element_type=jnp.int32,
                    )
                scale = (s_in * p["w_scale"]).astype(jnp.float32)
                yf = y.astype(jnp.float32) * scale[None, None, None, :] + p["b"]
                if l.act:
                    yf = layers.leaky_relu(yf)
                if "y_scale" in p:
                    # requant in the epilogue: the next layer reads int8
                    cur = jnp.clip(
                        jnp.round(yf * (1.0 / p["y_scale"])), -127, 127
                    ).astype(jnp.int8)
                    cs = p["y_scale"]
                else:
                    cur, cs = yf, None
        elif isinstance(l, SpaceToDepth):
            # Quantize BEFORE the relayout when the consumer conv is
            # int8: s2d is value-preserving and the input scale is
            # per-tensor, so quantize->s2d == s2d->quantize EXACTLY
            # (zero pad channels are 0 in s8 too) — but the relayout
            # copy + pad then move 1/4 the bytes. Profiled b24 int8:
            # the f32 s2d relayout copy alone was 0.81 ms of a 13.8 ms
            # batch (copy.603, docs/ROUND9.md).
            if cs is None:
                nxt = next((m for m in spec.layers[li + 1:]
                            if isinstance(m, Conv)), None)
                if nxt is not None and "w_q" in qparams.get(nxt.name, {}):
                    s_in = qparams[nxt.name]["x_scale"]
                    cur = jnp.clip(
                        jnp.round(cur.astype(jnp.float32) * (1.0 / s_in)),
                        -127, 127,
                    ).astype(jnp.int8)
                    cs = s_in
            # relayout (+zero channels): int8-safe
            cur = layers.space_to_depth(cur, l.factor, l.pad_channels)
        elif isinstance(l, MaxPool):
            cur = layers.maxpool2d(cur, l.size, l.stride)  # int8-capable
        elif isinstance(l, Upsample):
            cur = layers.upsample2x(cur)
        elif isinstance(l, Route):
            srcs = [outputs[i] for i in l.sources]
            if len(srcs) == 1:
                cur, cs = srcs[0]
            else:
                cur, cs = jnp.concatenate(
                    [deq(t, s) for t, s in srcs], axis=-1), None
        elif isinstance(l, Shortcut):
            t2, s2 = outputs[l.source]
            cur, cs = deq(cur, cs) + deq(t2, s2), None
        elif isinstance(l, YoloHead):
            heads.append(deq(cur, cs).astype(jnp.float32))
        outputs.append((cur, cs))
    return heads
