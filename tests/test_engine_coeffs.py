"""Engine coefficient-path (on-device JPEG) end-to-end parity."""

import subprocess

import numpy as np
import pytest

from tests.conftest import REPO_ROOT
from fastdet_tpu.models import weights
from fastdet_tpu.runtime import jpeg
from fastdet_tpu.runtime.engine import DetectionEngine


@pytest.fixture(scope="module")
def engine(tiny_f32_engine):
    return tiny_f32_engine  # session-shared (see conftest)


def _jpeg(seed):
    rng = np.random.RandomState(seed)
    img = np.kron(rng.randint(0, 255, (52, 52, 3), np.uint8),
                  np.ones((8, 8, 1), np.uint8))
    return jpeg.encode_rgb(img, 90)  # cv2 default = 4:2:0


def test_device_decode_matches_host_decode_at_image_level(native_ready):
    """The real parity claim: device-decoded pixels == host libjpeg within
    a few levels. (Detection-level identity only holds for trained weights;
    synthetic weights amplify 1-level pixel deltas into argmax flips.)
    """
    import jax.numpy as jnp

    from fastdet_tpu.ops import jpeg_device
    from fastdet_tpu.runtime import native_jpeg

    data = _jpeg(0)
    ci = native_jpeg.decode_coefficients(data)
    dev = np.asarray(
        jpeg_device.decode420(
            jnp.asarray(ci.ycoef), jnp.asarray(ci.cbcoef), jnp.asarray(ci.crcoef),
            jnp.asarray(ci.qy), jnp.asarray(ci.qc), 416, 416,
        ) * 255.0
    ).round().astype(np.int32)
    host = jpeg.decode_rgb(data).astype(np.int32)
    d = np.abs(dev - host)
    assert d.max() <= 4 and d.mean() < 0.3


def test_coeff_path_end_to_end_structure(engine, native_ready):
    """Coeff path produces well-formed results that approximate the pixel
    path: every strong pixel-path detection has a coeff-path counterpart
    at nearly the same location/score."""
    datas = [_jpeg(0), _jpeg(1)]
    res = engine.detect_async_jpeg(datas, [0.4, 0.4])
    assert res is not None
    got = engine.fetch(res, 2)
    pixel = engine.detect([jpeg.decode_rgb(d) for d in datas], [0.4, 0.4])
    for g, p in zip(got, pixel):
        # Random (untrained) weights are chaotic: a 1-level input delta can
        # relocate detections entirely, so per-box matching is meaningless
        # here (trained-weight parity is carried by the image-level test
        # above). Check the population statistics and well-formedness.
        assert abs(len(g) - len(p)) <= max(3, int(0.3 * len(p)))
        scores = [c for _, c, *_ in g]
        assert all(1 <= k <= 80 for k, *_ in g)
        assert all(s >= 0.4 for s in scores)
        assert all(scores[i] >= scores[i + 1] - 1e-6 for i in range(len(scores) - 1))


def test_coeff_path_rejects_non420(engine, native_ready):
    import io

    from PIL import Image

    buf = io.BytesIO()
    img = np.zeros((416, 416, 3), np.uint8)
    Image.fromarray(img).save(buf, format="JPEG", quality=90, subsampling=0)
    assert engine.detect_async_jpeg([buf.getvalue()], [0.5]) is None


def test_coeff_path_rejects_wrong_size(engine, native_ready):
    img = np.zeros((224, 224, 3), np.uint8)
    assert engine.detect_async_jpeg([jpeg.encode_rgb(img)], [0.5]) is None
