"""First-party C++ JPEG decoder vs the PIL/libjpeg stack."""

import io
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT


@pytest.fixture(scope="module")
def native():
    from fastdet_tpu.runtime import native_jpeg

    if not native_jpeg.available():
        rc = subprocess.run(
            ["make", "-C", str(REPO_ROOT / "native" / "jpeg")],
            capture_output=True,
        ).returncode
        if rc != 0 or not native_jpeg.available():
            pytest.skip("native jpeg library not buildable here")
    return native_jpeg


def _image():
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:416, 0:416]
    img = np.stack(
        [(yy // 2) % 256, (xx // 2) % 256, ((xx + yy) // 3) % 256], -1
    ).astype(np.uint8)
    return (0.7 * img + 0.3 * rng.randint(0, 255, img.shape)).astype(np.uint8)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
@pytest.mark.parametrize("quality", [60, 90])
def test_matches_pil_within_tolerance(native, subsampling, quality):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_image()).save(
        buf, format="JPEG", quality=quality, subsampling=subsampling
    )
    data = buf.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native.decode_rgb(data)
    assert got.shape == ref.shape
    d = np.abs(ref.astype(int) - got.astype(int))
    # IDCT rounding + color-convert rounding differences only
    assert d.max() <= 4, d.max()
    assert d.mean() < 0.2


def test_grayscale(native):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_image()[:, :, 0]).save(buf, format="JPEG", quality=90)
    data = buf.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native.decode_rgb(data)
    assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1


def test_odd_dimensions(native):
    from PIL import Image

    img = _image()[:231, :173]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85)
    data = buf.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native.decode_rgb(data)
    assert got.shape == (231, 173, 3)
    assert np.abs(ref.astype(int) - got.astype(int)).max() <= 4


def test_restart_markers(native):
    """cv2 can emit DRI/RSTn; exercise that path."""
    cv2 = pytest.importorskip("cv2")
    img = _image()
    ok, buf = cv2.imencode(
        ".jpg", img[:, :, ::-1],
        [int(cv2.IMWRITE_JPEG_QUALITY), 90,
         int(cv2.IMWRITE_JPEG_RST_INTERVAL), 4],
    )
    assert ok
    data = bytes(buf)
    assert b"\xff\xdd" in data[:1000]  # DRI present
    ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)[:, :, ::-1]
    got = native.decode_rgb(data)
    assert np.abs(ref.astype(int) - got.astype(int)).max() <= 4


def test_invalid_inputs(native):
    with pytest.raises(ValueError):
        native.decode_rgb(b"not a jpeg")
    with pytest.raises(ValueError):
        native.decode_rgb(b"\xff\xd8\xff\xe0" + b"\x00" * 10)  # truncated


def test_progressive_rejected_cleanly(native):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_image()).save(buf, format="JPEG", quality=90, progressive=True)
    with pytest.raises(ValueError):
        native.decode_rgb(buf.getvalue())
    # and the jpeg module falls back transparently
    from fastdet_tpu.runtime import jpeg

    out = jpeg.decode_rgb(buf.getvalue())
    assert out.shape == (416, 416, 3)
