"""Pallas fused plane-ingest kernel: interpret-mode parity with the XLA
implementation (bit-exact on TPU, verified separately on hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdet_tpu.ops import jpeg_device
from fastdet_tpu.ops.pallas import plane_ingest as pi


def _xla_ref(y, cb, cr):
    return jpeg_device.ycbcr_to_rgb01(
        jnp.asarray(y, jnp.float32),
        jpeg_device.upsample2x_triangle(jnp.asarray(cb, jnp.float32)),
        jpeg_device.upsample2x_triangle(jnp.asarray(cr, jnp.float32)),
    )


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("size", [32, 64])
def test_kernel_matches_xla_bitexact(seed, size):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (size, size)).astype(np.uint8)
    cb = rng.randint(0, 256, (size // 2, size // 2)).astype(np.uint8)
    cr = rng.randint(0, 256, (size // 2, size // 2)).astype(np.uint8)
    got = pi.plane_ingest(jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
                          interpret=True)
    ref = _xla_ref(y, cb, cr)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_band_matrices_edges():
    """Edge rows/cols replicate (libjpeg 4a special case)."""
    a, b, bias = pi._band_matrices(4, 4)
    # first output row: 3*c[0] + c[0] (clamped up-neighbor)
    np.testing.assert_array_equal(a[0], [4, 0, 0, 0])
    np.testing.assert_array_equal(a[-1], [0, 0, 0, 4])
    # first output col taps: 3*t[0] + t[0]
    assert b[0, 0] == 4 and b[3, 7] == 4
    assert bias[0] == 8 and bias[1] == 7


def test_batch_kernel(seed=3):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (2, 32, 32)).astype(np.uint8)
    cb = rng.randint(0, 256, (2, 16, 16)).astype(np.uint8)
    cr = rng.randint(0, 256, (2, 16, 16)).astype(np.uint8)
    out = pi.plane_ingest_batch(jnp.asarray(y), jnp.asarray(cb),
                                jnp.asarray(cr), interpret=True)
    assert out.shape == (2, 32, 32, 3)
    single = pi.plane_ingest(jnp.asarray(y[1]), jnp.asarray(cb[1]),
                             jnp.asarray(cr[1]), interpret=True)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(single))
