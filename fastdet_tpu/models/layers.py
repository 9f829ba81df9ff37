"""NHWC neural-net layers for the YOLOv3 family, built for TPU/XLA.

Design notes (TPU-first):

- Layout is NHWC end to end ('NHWC' activations, 'HWIO' weights) — the
  native layout for TPU convolutions; the reference's NCHW transposes
  (server/detector.py:133-139) do not exist here.
- Convolutions use *explicit* symmetric padding (k-1)//2 rather than
  'SAME': for stride-2 3x3 convs XLA's SAME pads (0,1) while the Darknet
  convention (which all YOLOv3 weights were trained under) pads (1,1) and
  reads windows [2i-1, 2i+1]. Explicit padding keeps imported weights
  numerically faithful.
- Batch norm is stored unfolded (gamma/beta/mean/var) and folded into the
  conv weight + bias for inference via :func:`fold_conv_bn`, so the whole
  inference conv block is a single XLA convolution + bias + LeakyReLU that
  the compiler fuses onto the MXU.
- All compute can run in bfloat16 (``compute_dtype``) with f32 parameters;
  XLA handles the mixed-precision convolution natively on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
LEAKY_SLOPE = 0.1

Params = Dict[str, Any]

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           pad=None) -> jnp.ndarray:
    """2-D convolution, NHWC/HWIO; Darknet-style symmetric padding
    unless an explicit ((top, bottom), (left, right)) ``pad`` is given
    (the s2d stem's 2x2 convs need asymmetric (1, 0) pads)."""
    if pad is None:
        k = w.shape[0]
        p = (k - 1) // 2
        pad = ((p, p), (p, p))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=list(pad),
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv2d_train(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                 pad=None) -> jnp.ndarray:
    """Training-path convolution: operands AND output in the compute
    dtype, no f32-accumulate-then-downcast.

    :func:`conv2d`'s ``preferred_element_type=f32`` + output cast is
    right for inference but untransposable under ``jax.grad`` with a
    bf16 compute dtype (the cotangent reaches the conv as f32 against
    bf16 operands and lax rejects the mix). Keeping the whole conv in
    one dtype is the standard mixed-precision recipe — the TPU MXU
    accumulates bf16 products in f32 internally either way, and the
    loss is computed on f32-cast heads (yolov3.apply)."""
    if pad is None:
        k = w.shape[0]
        p = (k - 1) // 2
        pad = ((p, p), (p, p))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=list(pad),
        dimension_numbers=_DIMENSION_NUMBERS,
    )


def space_to_depth(x: jnp.ndarray, factor: int = 2,
                   pad_channels: int = 0) -> jnp.ndarray:
    """NHWC (..., H, W, C) -> (..., H/f, W/f, f*f*C [+pad zeros]),
    phase-major channel order: out channel = p*(f*C) + q*C + c for row
    phase p, col phase q. Pure relayout (reshape/transpose) —
    dtype-preserving. ``pad_channels`` appends zero channels (int8 MXU
    lane packing wants >=32 input channels; see yolov3.SpaceToDepth)."""
    f = factor
    *lead, h, w, c = x.shape
    y = x.reshape(*lead, h // f, f, w // f, f, c)
    nd = len(lead)
    perm = tuple(range(nd)) + tuple(
        nd + i for i in (0, 2, 1, 3, 4))
    out = y.transpose(perm).reshape(*lead, h // f, w // f, f * f * c)
    if pad_channels:
        pad = [(0, 0)] * (nd + 2) + [(0, pad_channels)]
        out = jnp.pad(out, pad)
    return out


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def conv_block(
    params: Params,
    x: jnp.ndarray,
    stride: int = 1,
    act: bool = True,
    pad=None,
) -> jnp.ndarray:
    """Inference conv block: conv + bias (+ LeakyReLU).

    ``params`` must be folded ({'w','b'}); use :func:`fold_conv_bn` on
    BN-carrying params first. XLA fuses bias+activation into the conv.
    """
    y = conv2d(x, params["w"], stride, pad)
    y = y + params["b"].astype(y.dtype)
    return leaky_relu(y) if act else y


def batch_norm_inference(bn: Params, x: jnp.ndarray) -> jnp.ndarray:
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + BN_EPS)
    scale = (bn["gamma"] * inv).astype(x.dtype)
    bias = (bn["beta"] - bn["mean"] * bn["gamma"] * inv).astype(x.dtype)
    return x * scale + bias


def batch_norm_train(bn: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Batch statistics normalization (training forward)."""
    y, _, _ = batch_norm_train_stats(bn, x)
    return y


def batch_norm_train_stats(bn: Params, x: jnp.ndarray):
    """Training BN; returns (y, batch_mean, batch_var) so the train loop
    can EMA the running statistics used at inference."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.var(x32, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x32 - mean) * inv * bn["gamma"] + bn["beta"]
    return y.astype(x.dtype), mean, var


def conv_bn_block_train(
    params: Params, x: jnp.ndarray, stride: int = 1, act: bool = True
) -> jnp.ndarray:
    """Training conv block: conv + batch-stat BN (+ LeakyReLU)."""
    y = conv2d_train(x, params["w"], stride)
    if "bn" in params:
        y = batch_norm_train(params["bn"], y)
    else:
        y = y + params["b"].astype(y.dtype)
    return leaky_relu(y) if act else y


def fold_conv_bn(params: Params) -> Params:
    """Fold BN statistics into conv weight+bias for inference.

    w' = w * gamma / sqrt(var + eps)   (per output channel)
    b' = beta - mean * gamma / sqrt(var + eps)

    numpy inputs stay numpy (pure host math): engine startup folds the
    whole model host-side — on remote-device backends the jnp version
    was an eager per-layer RPC storm (~20 s for yolov3-full through the
    tunnel). jax arrays / tracers keep the jnp path so fold_params
    remains usable inside jit (the trainer's eval fn does this).
    """
    if "bn" not in params:
        return {"w": params["w"], "b": params["b"]}
    bn = params["bn"]
    xp = np if type(params["w"]) is np.ndarray else jnp
    inv = bn["gamma"] / xp.sqrt(bn["var"] + BN_EPS)
    w = params["w"] * inv[None, None, None, :]
    b = bn["beta"] - bn["mean"] * inv
    return {"w": w, "b": b}


def maxpool2d(x: jnp.ndarray, size: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pooling with Darknet padding semantics.

    size=2/stride=2 on even inputs needs no padding; size=2/stride=1 (the
    yolov3-tiny 13x13 pool) pads (0,1) on each spatial dim with the dtype's
    identity (-inf / int min), which matches Darknet's asymmetric maxpool
    padding. Integer inputs are supported for the int8-through quantized
    path (max is order-preserving, so pooled int8 keeps its scale).
    """
    if stride == size and x.shape[1] % size == 0:
        padding = [(0, 0), (0, 0), (0, 0), (0, 0)]
    else:
        total = size - 1
        lo = total // 2
        padding = [(0, 0), (lo, total - lo), (lo, total - lo), (0, 0)]
    # static python/numpy identity: a traced init_value would block the
    # reduce_window_max pattern match and break reverse-mode autodiff
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = np.asarray(np.iinfo(np.dtype(x.dtype)).min, dtype=x.dtype)[()]
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x spatial upsample (Darknet 'upsample' layer)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def init_conv_params(
    key: jax.Array,
    ksize: int,
    in_ch: int,
    out_ch: int,
    bn: bool,
    dtype=jnp.float32,
) -> Params:
    """Kaiming-style init matching LeakyReLU gain; BN initialized identity."""
    fan_in = ksize * ksize * in_ch
    gain = math.sqrt(2.0 / (1 + LEAKY_SLOPE**2))
    std = gain / math.sqrt(fan_in)
    w = jax.random.normal(key, (ksize, ksize, in_ch, out_ch), dtype) * std
    if bn:
        return {
            "w": w,
            "bn": {
                "gamma": jnp.ones((out_ch,), dtype),
                "beta": jnp.zeros((out_ch,), dtype),
                "mean": jnp.zeros((out_ch,), dtype),
                "var": jnp.ones((out_ch,), dtype),
            },
        }
    return {"w": w, "b": jnp.zeros((out_ch,), dtype)}
