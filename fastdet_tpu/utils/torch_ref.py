"""Torch-CPU mirror of the YOLOv3 spec interpreter.

Two purposes:

- an *independent* numerical cross-check of the JAX models (different
  framework, same spec, same weights), and
- the benchmark baseline: the reference runs its models through a CPU/CUDA
  native engine (ONNX Runtime, unavailable in this image); torch-CPU
  running the identical architecture is the closest measurable
  reference-equivalent on this host (see bench.py --baseline).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from fastdet_tpu.models.yolov3 import (
    Conv, MaxPool, ModelSpec, Route, Shortcut, Upsample, YoloHead,
)


def torch_forward(
    spec: ModelSpec, folded_params: Dict[str, Any], images: np.ndarray
) -> List[np.ndarray]:
    """Run the spec with torch on CPU. images: (B,H,W,3) float32 NHWC in
    [0,1]; params must be folded ({'w','b'}). Returns NHWC head outputs.
    """
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
    tp: Dict[str, Any] = {}
    for name, p in folded_params.items():
        w = np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)
        tp[name] = (
            torch.from_numpy(np.ascontiguousarray(w)),
            torch.from_numpy(np.asarray(p["b"], np.float32)),
        )

    outputs: List[Any] = []
    heads: List[np.ndarray] = []
    cur = x
    with torch.no_grad():
        for l in spec.layers:
            if isinstance(l, Conv):
                w, b = tp[l.name]
                pad = (l.ksize - 1) // 2
                cur = F.conv2d(cur, w, b, stride=l.stride, padding=pad)
                if l.act:
                    cur = F.leaky_relu(cur, 0.1)
            elif isinstance(l, MaxPool):
                if l.stride == l.size and cur.shape[-1] % l.size == 0:
                    cur = F.max_pool2d(cur, l.size, l.stride)
                else:
                    cur = F.max_pool2d(
                        F.pad(cur, (0, l.size - 1, 0, l.size - 1),
                              value=float("-inf")),
                        l.size, l.stride,
                    )
            elif isinstance(l, Upsample):
                cur = F.interpolate(cur, scale_factor=2, mode="nearest")
            elif isinstance(l, Route):
                srcs = [outputs[i] for i in l.sources]
                cur = srcs[0] if len(srcs) == 1 else __import__("torch").cat(srcs, dim=1)
            elif isinstance(l, Shortcut):
                cur = cur + outputs[l.source]
            elif isinstance(l, YoloHead):
                heads.append(
                    cur.numpy().transpose(0, 2, 3, 1).astype(np.float32)
                )
            outputs.append(cur)
    return heads
