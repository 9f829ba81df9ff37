"""Weight import/export for the YOLOv3 family.

The reference loads opaque .onnx blobs (absent from its checkout —
.MISSING_LARGE_BLOBS lists them) via ONNX Runtime (server/detector.py:118).
Our canonical sources are:

- **Darknet ``.weights``** — the original published YOLOv3 weight format
  (header of 3 int32 + seen counter, then per-conv [beta, gamma, mean, var]
  (when BN) or [bias], then OIHW float32 weights). This is the ground-truth
  format for public yolov3 / yolov3-tiny weights.
- **``.npz``** — our native format: flat numpy archive with a tiny metadata
  header (arch, num_classes), fast to load, produced by :func:`save_npz`.
- **synthetic** — deterministic random weights for testing/benchmarks when
  no pretrained file is available (the reference repo itself ships none).

All loaders return *unfolded* parameter pytrees (BN separate); fold with
``yolov3.fold_params`` for inference.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from fastdet_tpu.models import yolov3
from fastdet_tpu.models.yolov3 import ModelSpec


# ---------------------------------------------------------------------------
# Darknet .weights
# ---------------------------------------------------------------------------

def load_darknet(path: str, spec: ModelSpec) -> Dict[str, Any]:
    """Parse a Darknet .weights file against ``spec``'s conv layer order."""
    with open(path, "rb") as fp:
        raw = fp.read()
    return parse_darknet_bytes(raw, spec)


def parse_darknet_bytes(raw: bytes, spec: ModelSpec) -> Dict[str, Any]:
    buf = memoryview(raw)
    major, minor, revision = np.frombuffer(buf[:12], dtype=np.int32)
    off = 12
    if major * 10 + minor >= 2:
        off += 8  # seen: int64
    else:
        off += 4  # seen: int32
    floats = np.frombuffer(buf[off:], dtype=np.float32)

    params: Dict[str, Any] = {}
    pos = 0

    def take(n: int) -> np.ndarray:
        nonlocal pos
        if pos + n > floats.size:
            raise ValueError(
                f"darknet weights truncated: need {n} floats at {pos}, "
                f"have {floats.size}"
            )
        out = floats[pos : pos + n]
        pos += n
        return out

    in_ch = 3
    channels = []
    for l in spec.layers:
        if isinstance(l, yolov3.Conv):
            o, k = l.filters, l.ksize
            if l.bn:
                beta = take(o).copy()
                gamma = take(o).copy()
                mean = take(o).copy()
                var = take(o).copy()
                entry: Dict[str, Any] = {
                    "bn": {
                        "gamma": gamma,
                        "beta": beta,
                        "mean": mean,
                        "var": var,
                    }
                }
            else:
                entry = {"b": take(o).copy()}
            w = take(o * in_ch * k * k).reshape(o, in_ch, k, k)
            # OIHW -> HWIO. Loaders return HOST numpy: on remote-device
            # backends jnp.asarray here was an eager per-tensor upload
            # (~30 s for yolov3-full); the engine/trainer device_put the
            # finished tree once instead.
            entry["w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
            params[l.name] = entry
            in_ch = o
        elif isinstance(l, yolov3.Route):
            in_ch = sum(channels[i] for i in l.sources)
        channels.append(in_ch)

    if pos != floats.size:
        raise ValueError(
            f"darknet weights size mismatch: consumed {pos} of {floats.size} "
            f"floats — wrong architecture or num_classes?"
        )
    return params


def save_darknet(path: str, spec: ModelSpec, params: Dict[str, Any]) -> None:
    """Write params as a Darknet .weights file (for round-trip tests)."""
    chunks = [np.array([0, 2, 0], dtype=np.int32).tobytes(),
              np.array([0], dtype=np.int64).tobytes()]
    for l in spec.layers:
        if not isinstance(l, yolov3.Conv):
            continue
        p = params[l.name]
        if l.bn:
            bn = p["bn"]
            for leaf in (bn["beta"], bn["gamma"], bn["mean"], bn["var"]):
                chunks.append(np.asarray(leaf, dtype=np.float32).tobytes())
        else:
            chunks.append(np.asarray(p["b"], dtype=np.float32).tobytes())
        w = np.asarray(p["w"], dtype=np.float32).transpose(3, 2, 0, 1)  # HWIO->OIHW
        chunks.append(np.ascontiguousarray(w).tobytes())
    with open(path, "wb") as fp:
        fp.write(b"".join(chunks))


# ---------------------------------------------------------------------------
# Native .npz format
# ---------------------------------------------------------------------------

def _flatten(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = {}
    for name, p in params.items():
        flat[f"{name}/w"] = np.asarray(p["w"])
        if "b" in p:
            flat[f"{name}/b"] = np.asarray(p["b"])
        if "bn" in p:
            for k, v in p["bn"].items():
                flat[f"{name}/bn/{k}"] = np.asarray(v)
    return flat


def save_npz(path: str, spec: ModelSpec, params: Dict[str, Any],
             dtype=None) -> None:
    """Write the native .npz archive.

    ``dtype=np.float16`` halves checkpoint size for git-committed
    weights; :func:`load_npz` upcasts back to float32 (a trained
    model's dynamic range fits f16 comfortably — conv weights are
    O(1) after BN folding and BN stats are O(1e2) at most)."""
    meta = json.dumps(
        {"arch": spec.name, "num_classes": spec.num_classes, "format": 1}
    )
    flat = _flatten(params)
    if dtype is not None:
        flat = {k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating)
                else v for k, v in flat.items()}
    flat["__meta__"] = np.frombuffer(meta.encode("utf-8"), dtype=np.uint8).copy()
    # write-then-rename: a process killed mid-save must never leave a
    # truncated .npz at the target path (conversion caches read it back
    # by mtime and a corrupt file would otherwise poison every restart).
    # The .npz suffix on the temp name keeps np.savez from appending one.
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_npz(path: str) -> Tuple[ModelSpec, Dict[str, Any]]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        spec = yolov3.get_spec(meta["arch"], meta["num_classes"])
        params: Dict[str, Any] = {}
        for key in z.files:
            if key == "__meta__":
                continue
            v = z[key]
            if v.dtype == np.float16:   # storage-compressed checkpoint
                v = v.astype(np.float32)
            parts = key.split("/")
            node = params.setdefault(parts[0], {})
            if parts[1] == "bn":
                node.setdefault("bn", {})[parts[2]] = v
            else:
                node[parts[1]] = v
    return spec, params


# ---------------------------------------------------------------------------
# Synthetic weights
# ---------------------------------------------------------------------------

def synthetic_params(spec: ModelSpec, seed: int = 0) -> Dict[str, Any]:
    """Deterministic random weights (for tests/benchmarks without blobs).

    Generated with numpy (not jax.random) so loading costs zero device
    compiles — on remote-compile backends each jax.random shape would
    otherwise trigger its own compilation.
    """
    import math

    rng = np.random.RandomState(seed)
    params: Dict[str, Any] = {}
    in_ch = 3
    channels = []
    gain = math.sqrt(2.0 / (1 + 0.1**2))
    for l in spec.layers:
        if isinstance(l, yolov3.Conv):
            o, k = l.filters, l.ksize
            std = gain / math.sqrt(k * k * in_ch)
            w = (rng.randn(k, k, in_ch, o) * std).astype(np.float32)
            if l.bn:
                entry = {
                    "w": w,
                    "bn": {
                        "gamma": np.ones((o,), np.float32),
                        "beta": np.zeros((o,), np.float32),
                        "mean": np.zeros((o,), np.float32),
                        "var": np.ones((o,), np.float32),
                    },
                }
            else:
                entry = {"w": w, "b": np.zeros((o,), np.float32)}
            params[l.name] = entry
            in_ch = o
        elif isinstance(l, yolov3.Route):
            in_ch = sum(channels[i] for i in l.sources)
        channels.append(in_ch)
    return params


# ---------------------------------------------------------------------------
# Unified loader used by CLIs / the server registry
# ---------------------------------------------------------------------------

def load_model(
    path: str, arch: Optional[str] = None, num_classes: int = 80
) -> Tuple[ModelSpec, Dict[str, Any]]:
    """Load weights from ``path``; returns (spec, unfolded params).

    Accepted forms:
      - ``*.npz``               our format (arch/classes self-described)
      - ``*.weights``           Darknet (arch inferred from file size when
                                not given: tries tiny then full)
      - ``synthetic[:arch]``    deterministic random weights
    """
    if path.startswith("synthetic"):
        _, _, a = path.partition(":")
        spec = yolov3.get_spec(a or arch or "full", num_classes)
        return spec, synthetic_params(spec)
    if path.endswith(".npz"):
        return load_npz(path)
    if path.endswith(".weights"):
        candidates = [arch] if arch else ["tiny", "full"]
        last_err: Optional[Exception] = None
        for a in candidates:
            spec = yolov3.get_spec(a, num_classes)
            try:
                return spec, load_darknet(path, spec)
            except ValueError as e:
                last_err = e
        raise ValueError(f"could not match {path} to an architecture: {last_err}")
    if path.endswith(".onnx"):
        # Hand-rolled protobuf walker — the onnx package is not required
        # (reference registry contract: name:num_classes:path.onnx,
        # server/server.py:354-358).
        from fastdet_tpu.models import onnx_io

        return onnx_io.load_onnx(path, arch=arch, num_classes=num_classes)
    raise ValueError(f"unrecognized weights path: {path!r}")
