"""Pallas kernel: fused 4:2:0 plane ingest (upsample + color + normalize).

The XLA version of this stage (ops/jpeg_device.upsample2x_triangle +
ycbcr_to_rgb01) lowers to several kernels with HBM-materialized int32
intermediates and interleave/stack reshapes — the pattern XLA's fuser
handles worst. This kernel runs the whole stage in one VMEM pass per
image:

- libjpeg's "fancy" triangle 2x upsample is recast as TWO banded-matrix
  multiplies: vertically ``t = A @ c`` where row 2i of A is
  3*e_i + e_{i-1} (edge-clamped) and row 2i+1 is 3*e_i + e_{i+1};
  horizontally ``u = t @ B`` with the transposed band plus the per-parity
  rounding bias, followed by a single /16 floor. Interleave, shifts and
  taps all become MXU work on constant matrices — exact integer
  arithmetic in f32 (values < 2^15, far inside the f32 integer range),
  bit-identical to the reference shift implementation.
- YCbCr->RGB, uint8 rounding, and /255 normalization happen in the same
  kernel on the VPU; output is channel-major (3, H, W) so the lane
  dimension stays wide, transposed to NHWC by the caller (fused by XLA
  into the consumer conv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache()
def _band_matrices(h: int, w: int):
    """(A, B, bias) for a (h, w) chroma plane -> (2h, 2w) upsample.

    A: (2h, h) vertical triangle taps; B: (w, 2w) horizontal taps;
    bias: (2w,) libjpeg rounding constants (8 even cols, 7 odd cols).
    The final sample is floor((A @ c @ B + bias) / 16).
    """
    a = np.zeros((2 * h, h), np.float32)
    for i in range(h):
        up = max(i - 1, 0)
        dn = min(i + 1, h - 1)
        a[2 * i, i] += 3.0
        a[2 * i, up] += 1.0
        a[2 * i + 1, i] += 3.0
        a[2 * i + 1, dn] += 1.0
    b = np.zeros((w, 2 * w), np.float32)
    for j in range(w):
        lt = max(j - 1, 0)
        rt = min(j + 1, w - 1)
        b[j, 2 * j] += 3.0
        b[lt, 2 * j] += 1.0
        b[j, 2 * j + 1] += 3.0
        b[rt, 2 * j + 1] += 1.0
    bias = np.where(np.arange(2 * w) % 2 == 0, 8.0, 7.0).astype(np.float32)
    return a, b, bias


def _kernel(y_ref, cb_ref, cr_ref, a_ref, b_ref, bias_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    bias = bias_ref[:]

    def up(c_ref):
        # Mosaic lacks a direct u8->f32 cast; hop through int32
        c = c_ref[:].astype(jnp.int32).astype(jnp.float32)
        # full f32 precision: the default bf16 MXU pass truncates the
        # integer tap sums (values up to ~16k) and flips rounding by +-1
        t = jnp.dot(a, c, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        u = jnp.dot(t, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + bias[None, :]
        return jnp.floor(u * (1.0 / 16.0))

    yf = y_ref[:].astype(jnp.int32).astype(jnp.float32)
    cb = up(cb_ref) - 128.0
    cr = up(cr_ref) - 128.0
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    bch = yf + 1.772 * cb
    scale = 1.0 / 255.0
    out_ref[0] = jnp.clip(jnp.round(r), 0.0, 255.0) * scale
    out_ref[1] = jnp.clip(jnp.round(g), 0.0, 255.0) * scale
    out_ref[2] = jnp.clip(jnp.round(bch), 0.0, 255.0) * scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def plane_ingest(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
                 *, interpret: bool = False) -> jnp.ndarray:
    """One image: Y (H,W) u8 + Cb/Cr (H/2,W/2) u8 -> (H, W, 3) f32 [0,1]."""
    h, w = y.shape
    a, b, bias = _band_matrices(h // 2, w // 2)
    chw = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, cb, cr, jnp.asarray(a), jnp.asarray(b), jnp.asarray(bias))
    return jnp.transpose(chw, (1, 2, 0))


def plane_ingest_batch(y, cb, cr, *, interpret: bool = False):
    fn = lambda aa, bb, cc: plane_ingest(aa, bb, cc, interpret=interpret)
    return jax.vmap(fn)(y, cb, cr)
