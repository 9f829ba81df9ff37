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


def spec_torch_module(spec: ModelSpec, seed: int = 0, params=None):
    """A torch nn.Module twin of ``spec`` holding its own parameters.

    Unlike :func:`torch_forward` (a functional interpreter over OUR
    pytree), this is a real Conv2d/BatchNorm2d module — the fixture for
    the offline real-weights stand-in (VERDICT r3 #6): torch is the
    independent executor, torch.onnx.export the wild exporter, and our
    ONNX walker + engine must reproduce this module's own forward end-
    to-end. Traceable by the torchscript exporter (the spec loop
    unrolls under trace).

    ``params=None`` gives fixed-seed torch-native init with non-trivial
    BN running stats (export-dialect coverage). Passing an UNFOLDED
    repo pytree ({'w','bn'|'b'}) loads those values into the torch
    layers instead — with a trained checkpoint this makes the module an
    actually-detecting independent reference.
    """
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from fastdet_tpu.models.yolov3 import conv_io_channels

    convs = [l for l in spec.layers if isinstance(l, Conv)]
    io = conv_io_channels(spec)

    class SpecModule(nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = nn.ModuleDict()
            self.bns = nn.ModuleDict()
            for l, (cin, cout, k) in zip(convs, io):
                self.convs[l.name] = nn.Conv2d(
                    cin, cout, k, l.stride, (k - 1) // 2, bias=not l.bn)
                if l.bn:
                    self.bns[l.name] = nn.BatchNorm2d(cout)

        def forward(self, x):
            outputs = []
            heads = []
            cur = x
            for l in spec.layers:
                if isinstance(l, Conv):
                    cur = self.convs[l.name](cur)
                    if l.bn:
                        cur = self.bns[l.name](cur)
                    if l.act:
                        cur = F.leaky_relu(cur, 0.1)
                elif isinstance(l, MaxPool):
                    if l.stride == l.size and cur.shape[-1] % l.size == 0:
                        cur = F.max_pool2d(cur, l.size, l.stride)
                    else:
                        cur = F.max_pool2d(
                            F.pad(cur, (0, l.size - 1, 0, l.size - 1),
                                  value=float("-inf")), l.size, l.stride)
                elif isinstance(l, Upsample):
                    cur = F.interpolate(cur, scale_factor=2.0,
                                        mode="nearest")
                elif isinstance(l, Route):
                    srcs = [outputs[i] for i in l.sources]
                    cur = srcs[0] if len(srcs) == 1 else torch.cat(srcs, 1)
                elif isinstance(l, Shortcut):
                    cur = cur + outputs[l.source]
                elif isinstance(l, YoloHead):
                    heads.append(cur)
                outputs.append(cur)
            return tuple(heads)

    torch.manual_seed(seed)
    m = SpecModule().eval()
    with torch.no_grad():
        if params is None:
            for mod in m.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    # non-trivial stats so export-time BN folding is
                    # observable through the import chain
                    mod.running_mean.uniform_(-0.5, 0.5)
                    mod.running_var.uniform_(0.5, 2.0)
                    mod.weight.uniform_(0.8, 1.2)
                    mod.bias.uniform_(-0.2, 0.2)
        else:
            for l in convs:
                p = params[l.name]
                w = np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)
                m.convs[l.name].weight.copy_(
                    torch.from_numpy(np.ascontiguousarray(w)))
                if l.bn:
                    bn = m.bns[l.name]
                    s = p["bn"]
                    bn.weight.copy_(torch.from_numpy(
                        np.asarray(s["gamma"], np.float32)))
                    bn.bias.copy_(torch.from_numpy(
                        np.asarray(s["beta"], np.float32)))
                    bn.running_mean.copy_(torch.from_numpy(
                        np.asarray(s["mean"], np.float32)))
                    bn.running_var.copy_(torch.from_numpy(
                        np.asarray(s["var"], np.float32)))
                else:
                    m.convs[l.name].bias.copy_(torch.from_numpy(
                        np.asarray(p["b"], np.float32)))
    return m
