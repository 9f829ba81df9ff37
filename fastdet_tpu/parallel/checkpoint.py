"""Checkpoint / resume for training state and model weights.

The reference has no checkpointing — its "checkpoint" is the ONNX file
loaded at startup (SURVEY.md §5). Here:

- :func:`save` / :func:`restore` persist a full TrainState (params +
  optimizer state + step) via orbax, so training is resumable;
- :func:`export_inference` writes the trained params as a fastdet .npz
  that the serving registry loads directly (weights.load_model);
- weight-import caching: loading a darknet .weights via
  :func:`cached_import` converts once and reuses the .npz next to it on
  subsequent startups (fast server boot).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax

from fastdet_tpu.models import weights as weights_io
from fastdet_tpu.models import yolov3
from fastdet_tpu.parallel.train import TrainState

logger = logging.getLogger(__name__)


def save(path: str, state: TrainState) -> None:
    """Persist a TrainState with orbax (atomic directory checkpoint)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, jax.device_get(state._asdict()), force=True)


def restore(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState; ``template`` supplies structure/dtypes (a
    freshly initialized state is the normal template)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(path, item=jax.device_get(template._asdict()))
    return TrainState(**restored)


def export_inference(path: str, spec: yolov3.ModelSpec, state: TrainState) -> None:
    """Write trained parameters as a servable fastdet .npz."""
    weights_io.save_npz(path, spec, jax.device_get(state.params))


def cached_import(
    path: str, arch: Optional[str] = None, num_classes: int = 80
) -> Tuple[yolov3.ModelSpec, Dict[str, Any]]:
    """load_model with a .npz conversion cache for darknet files.

    First load of ``model.weights`` writes ``model.weights.npz``; later
    loads take the fast path. Non-darknet paths pass straight through.
    """
    if not path.endswith(".weights"):
        return weights_io.load_model(path, arch=arch, num_classes=num_classes)
    cache = path + ".npz"
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(path):
        try:
            return weights_io.load_npz(cache)
        except Exception:  # noqa: BLE001 — corrupt/stale-format cache
            # a bad cache must never brick startup: fall through to a
            # fresh conversion, which rewrites it (atomically)
            logger.warning("conversion cache %s unreadable; reconverting",
                           cache)
    spec, params = weights_io.load_model(path, arch=arch, num_classes=num_classes)
    try:
        weights_io.save_npz(cache, spec, params)
    except OSError:
        pass  # read-only location: skip caching
    return spec, params
