"""Host-side JPEG decode for the frame path.

The reference decodes with Pillow/libjpeg inside perform()
(server/detector.py:128-133). Here decode is a pluggable host stage in
front of the device pipeline, preferring OpenCV's libjpeg-turbo (SIMD,
~3-4x faster than PIL) and falling back to PIL. A first-party C++ decoder
(native/jpeg) can be slotted in via FASTDET_JPEG_BACKEND=native once
built; see fastdet_tpu.runtime.native_jpeg.
"""

from __future__ import annotations

import io
import os
import numpy as np

_BACKEND = os.environ.get("FASTDET_JPEG_BACKEND", "auto")

_cv2 = None
if _BACKEND in ("auto", "cv2"):
    try:
        import cv2 as _cv2  # type: ignore
    except Exception:  # pragma: no cover - cv2 is present in this image
        _cv2 = None


class JpegError(ValueError):
    pass


def decode_rgb(data: bytes) -> np.ndarray:
    """Decode JPEG bytes to an RGB uint8 (H, W, 3) array."""
    if _BACKEND == "native":
        from fastdet_tpu.runtime import native_jpeg

        try:
            return native_jpeg.decode_rgb(data)
        except native_jpeg.NativeJpegUnavailable:
            pass  # fall through to cv2/PIL
        except ValueError:
            pass  # progressive/exotic file: fall through
    if _cv2 is not None:
        buf = np.frombuffer(data, dtype=np.uint8)
        img = _cv2.imdecode(buf, _cv2.IMREAD_COLOR)
        if img is None:
            raise JpegError("invalid JPEG data")
        return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB
    from PIL import Image

    try:
        img = Image.open(io.BytesIO(data))
        return np.asarray(img.convert("RGB"))
    except Exception as e:
        raise JpegError(f"invalid JPEG data: {e}") from None


def encode_rgb(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode an RGB uint8 array to JPEG (test/client utility)."""
    if _cv2 is not None:
        ok, buf = _cv2.imencode(
            ".jpg", np.ascontiguousarray(img[:, :, ::-1]),
            [int(_cv2.IMWRITE_JPEG_QUALITY), quality],
        )
        if not ok:
            raise JpegError("JPEG encode failed")
        return bytes(buf)
    from PIL import Image

    out = io.BytesIO()
    Image.fromarray(img).save(out, format="JPEG", quality=quality)
    return out.getvalue()
