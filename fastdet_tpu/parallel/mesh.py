"""Device mesh and sharding layout for the YOLOv3 family.

The reference has no intra-model parallelism (SURVEY.md §2 checklist): one
ONNX session, batch=1, synchronous. On TPU the two axes that genuinely
apply to a CNN detector of this size are:

- **dp** — data parallel: the serving/training batch sharded across chips;
  gradient psum rides the ICI.
- **tp** — tensor (channel) parallel: output channels of the wide conv
  layers sharded across chips; XLA/GSPMD inserts the halo/all-reduce
  collectives. Only layers with >= ``TP_MIN_CHANNELS`` output channels are
  sharded — below that the collective cost outweighs the FLOP split.

Pipeline/sequence/expert parallelism are structurally N/A here: <62M
params fit on any single chip (no need for pp), there is no sequence
dimension (no sp/cp), and no MoE (no ep) — per the survey's required
checklist. The mesh is laid out so 'tp' maps to adjacent devices (inner
axis) and 'dp' to the outer axis, keeping the frequent tp collectives on
the shortest ICI hops.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastdet_tpu.models.yolov3 import Conv, ModelSpec

TP_MIN_CHANNELS = 256


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh over the given (or all) devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if tp is None:
        if dp is not None:
            tp = n // dp            # pin only the data-parallel degree
        else:
            # default: tp=2 whenever we have an even device count > 1
            tp = 2 if (n % 2 == 0 and n > 1) else 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def param_shardings(
    spec: ModelSpec, mesh: Mesh, params: Dict[str, Any]
) -> Dict[str, Any]:
    """NamedShardings for a parameter pytree: wide conv output channels on
    'tp', everything else replicated. Works for folded ({'w','b'}) and
    unfolded ({'w','bn':{...}}) trees alike (per-output-channel leaves
    shard with the channels).
    """

    def conv_tp(name: str) -> bool:
        c = _conv_by_name(spec, name)
        return c is not None and c.filters >= TP_MIN_CHANNELS and c.filters % mesh.shape["tp"] == 0

    out: Dict[str, Any] = {}
    for name, p in params.items():
        tp = conv_tp(name)
        w_spec = P(None, None, None, "tp") if tp else P()
        v_spec = P("tp") if tp else P()
        entry: Dict[str, Any] = {"w": NamedSharding(mesh, w_spec)}
        if "b" in p:
            entry["b"] = NamedSharding(mesh, v_spec)
        if "bn" in p:
            entry["bn"] = {k: NamedSharding(mesh, v_spec) for k in p["bn"]}
        out[name] = entry
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded over 'dp' (and channels over 'tp' left to XLA)."""
    return NamedSharding(mesh, P("dp", None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _conv_by_name(spec: ModelSpec, name: str) -> Optional[Conv]:
    for l in spec.layers:
        if isinstance(l, Conv) and l.name == name:
            return l
    return None


def shard_params(
    spec: ModelSpec, mesh: Mesh, params: Dict[str, Any]
) -> Dict[str, Any]:
    """device_put the parameter pytree with its mesh shardings."""
    shardings = param_shardings(spec, mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
