"""DetectionEngine: the TPU inference pipeline behind every detector.

Replaces the reference's ONNX Runtime session + Python postprocessing
(server/detector.py:94-166) with a single jitted device program:

    uint8 NHWC batch -> /255 normalize -> YOLOv3 forward (bf16 MXU)
    -> vectorized head decode -> top-K candidates -> soft-NMS
    -> (boxes, scores, classes, valid) with static shapes

Engine properties:

- **AOT batch buckets.** jit functions for batch sizes (1, 2, 4, 8, ...)
  are compiled at startup (`warmup`), replacing ORT session warmup; a
  request batch is padded up to the nearest bucket.
- **Per-image thresholds**: the wire protocol carries a threshold per
  request (docs/DESIGN.md:77); the pipeline vmaps over a (B,) threshold
  vector so mixed-threshold batches run in one program.
- **Async dispatch**: detect_async() returns as soon as XLA dispatch is
  queued; fetching results is a separate step, so an event loop can keep
  serving while the TPU runs (fixes the reference's head-of-line blocking,
  SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
import logging
import threading
import time
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdet_tpu.models import yolov3
from fastdet_tpu.models.yolov3 import ModelSpec
from fastdet_tpu.ops import postprocess
from fastdet_tpu.ops.nms import NMSResult

logger = logging.getLogger(__name__)

ResultTuple = Tuple[int, float, float, float, float, float]


class SparseCaps(NamedTuple):
    """Static stream capacities of one (layout, tier) sparse row.

    ``fmt`` is the wire format (5 = nibble AC + int8 DC deltas, 6 =
    3-bit AC + 4-bit DC deltas — fd_jpeg.cpp decode_sparse5/6).
    ``vals`` is the packed AC value stream capacity in BYTES (nibble or
    3-bit packed); ``e16``/``dce16`` are in int16 ENTRIES; ``dce8`` is 0
    for fmt 5 (its DC deltas are already int8, no escape stream)."""

    fmt: int
    nb: int
    mask: int
    vals: int
    e8: int
    e16: int
    dce8: int
    dce16: int


def device_result(x):
    """Unwrap a PlanesDispatch part to its packed (B, max_det, 7) array.

    Parts hold concurrent.futures.Futures while the engine's transfer
    worker is still streaming/enqueueing the batch (see _dispatch_async);
    fetch() unwraps internally — direct parts consumers (tests,
    diagnostics) go through this. Pipelines return (packed f32, wire
    records u8) pairs; this yields the f32 element (the wire records are
    fetch_wire's private fast path)."""
    x = x.result() if hasattr(x, "result") else x
    if isinstance(x, (tuple, list)):
        return x[0]
    return x

DEFAULT_BUCKETS = (1, 2, 4, 8, 16)

# f32 LE bytes of the padded-row threshold sentinel (2.0): above any
# real threshold, so batched postprocess early-exits on padding rows.
_THR_PAD_BYTES = np.frombuffer(np.float32(2.0).tobytes(), np.uint8)

_DECODE_POOL = None
_DECODE_POOL_LOCK = threading.Lock()


def _decode_pool():
    """Shared thread pool for parallel batch JPEG decode (the native
    decoder releases the GIL). None on single-core hosts."""
    global _DECODE_POOL
    if _DECODE_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        with _DECODE_POOL_LOCK:
            if _DECODE_POOL is None:
                workers = min(8, os.cpu_count() or 1)
                _DECODE_POOL = (
                    ThreadPoolExecutor(workers) if workers > 1 else False
                )
    return _DECODE_POOL or None

def _calibration_from_dir(size: int, n: int = 8) -> Optional[np.ndarray]:
    """Activation-calibration frames from FASTDET_CALIB_DIR, if set.

    Real frames from the target camera beat any synthetic default; the
    serving CLIs keep reference getopt parity (no new flag), so the knob
    rides an env var like the other deployment tunables. Images that
    fail to decode or aren't (size, size, 3) are skipped.
    """
    import glob
    import os

    d = os.environ.get("FASTDET_CALIB_DIR")
    if not d:
        return None
    from fastdet_tpu.runtime import jpeg as jpeg_mod

    imgs: List[np.ndarray] = []
    for p in sorted(glob.glob(os.path.join(d, "*"))):
        try:
            with open(p, "rb") as fp:
                img = jpeg_mod.decode_rgb(fp.read())
        except Exception:
            continue
        if img.shape == (size, size, 3):
            imgs.append(img)
        if len(imgs) >= n:
            break
    if not imgs:
        logger.warning(
            "FASTDET_CALIB_DIR=%s: no usable %dx%d images; falling back "
            "to synthetic calibration scenes", d, size, size)
        return None
    logger.info("int8 calibration: %d frames from %s", len(imgs), d)
    return np.stack(imgs)


def _default_calibration_images(size: int, n: int = 8) -> np.ndarray:
    """Smooth synthetic scenes for activation calibration when the caller
    provides none (prefer real frames from the target camera)."""
    rng = np.random.RandomState(0)
    out = np.zeros((n, size, size, 3), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        img = np.stack([100 + 100 * yy, 90 + 110 * xx, 80 + 90 * (1 - yy) * xx], -1)
        for _ in range(4):
            x0, y0 = rng.randint(0, size * 3 // 4, 2)
            w, h = rng.randint(size // 8, size // 3, 2)
            img[y0:y0 + h, x0:x0 + w] = rng.randint(0, 255, 3)
        img += rng.randn(size, size, 3) * 8
        out[i] = np.clip(img, 0, 255).astype(np.uint8)
    return out


_COMPUTE_DTYPES = {
    "bf16": jnp.bfloat16,
    "f32": jnp.float32,
    "int8": jnp.float32,   # inter-layer activations stay f32; convs are int8
    # Reference -m values map onto TPU execution modes (SURVEY.md §5 config
    # parity): the reference used them to pick ORT execution providers
    # (server/detector.py:110-118); we keep accepting them.
    None: jnp.bfloat16,
    "cpu": jnp.bfloat16,
    "cuda": jnp.bfloat16,
    "tensorrt": jnp.bfloat16,
    "tpu": jnp.bfloat16,
}


class PlanesDispatch:
    """In-flight grouped-batch dispatch: one device result per
    (ingest-path, subsampling-layout) group, with the original batch
    indices to reassemble order. Returned by detect_async_planes /
    detect_async_sparse and consumed by fetch()."""

    __slots__ = ("parts", "layouts", "tags", "counts", "unresolved")

    def __init__(self, parts, layouts=(), tags=(), counts=None,
                 unresolved=()):
        self.parts = parts      # [(device_result, [orig indices]), ...]
        self.layouts = layouts  # e.g. ((2, 1), (2, 2)) — for observability
        # Path observability: one tag per group, e.g. ("sparse:22",
        # "planes:21"), and frame counts per ingest kind.
        self.tags = tags
        self.counts = counts or {}
        # Frames NO native path could decode (malformed / unsupported
        # stream): no part covers them; the caller must route exactly
        # these through the host pixel path instead of abandoning the
        # parts already in flight (fetch()/fetch_wire() return empty for
        # them if fetched anyway).
        self.unresolved = tuple(unresolved)


class DetectionEngine:
    def __init__(
        self,
        spec: ModelSpec,
        params: Dict[str, Any],
        *,
        mode: Optional[str] = "bf16",
        max_candidates: int = postprocess.MAX_CANDIDATES,
        max_det: int = postprocess.MAX_DET,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        folded: bool = False,
        devices: Optional[Sequence[jax.Device]] = None,
        calibration_images: Optional[np.ndarray] = None,
    ):
        import os

        from fastdet_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.spec = spec
        # Sparse-ingest value budgets are captured ONCE here (not re-read
        # from the environment at pack/trace time): the packed row layout
        # and the traced device programs must agree for the engine's whole
        # lifetime, and compensating env edits could otherwise reuse a
        # cached program with a stale vals/esc split.
        # Two AOT capacity tiers, each with a wire FORMAT and six
        # per-block budgets: (mask bytes, AC values, esc8, esc16, dcesc8,
        # dcesc16). The "std" tier ships wire format v6 (3-bit AC symbols
        # + 4-bit DC deltas, fd_jpeg.cpp decode_sparse6): on camera-clean
        # q90 content 95.7% of nonzero AC values are |v| <= 3 and ~89% of
        # DC deltas fit 4 bits, so v6 rows measure ~14% smaller than the
        # v5 nibble rows — every padded byte is lost throughput on the
        # link-bound serving path. The "dense" tier keeps format v5
        # (4-bit AC nibbles + int8 DC deltas): photo-dense content (the
        # reference's testdata) is escape-heavy under 3-bit codes and
        # measures LARGER in v6 (tools/measure_sparse_stats.py), so
        # frames denser than "std" retry as v5 and still ride a sparse
        # wire instead of degrading to the 4-5x-bigger plane path; only
        # dense-tier overflow does that. Each format's esc8 budget counts
        # ITS level-1 escapes (v6: |v| > 3; v5: |v| > 7) — the emitters
        # return both predictors so the tier router can evaluate the
        # format-crossing retry from one decode. dcesc8 is v6-only (v5
        # DC deltas are already int8). Env names are format-specific;
        # stale v3 knobs with different units are ignored (defaults
        # apply) rather than reinterpreted, and FASTDET_SPARSE_STD_FORMAT
        # =5 reverts the std tier to the v5 wire (with that format's
        # escape-budget defaults).
        self._std_fmt = 6 if os.environ.get(
            "FASTDET_SPARSE_STD_FORMAT", "6") != "5" else 5
        # std-tier budgets sit a few % above the committed camera-clean
        # q90 scenes' measured per-block rates (scene max: mask 4.42,
        # ac 13.24, ac_gt3 0.583, e16 ~0, dcd_gt7 0.137, dce16 ~0.01 —
        # tools/measure_sparse_stats.py). Every spare byte is ~linear
        # host serialization CPU on the h2d path, and denser frames
        # already reroute per-frame to the dense tier (with tier memory
        # so sustained dense traffic stops paying the std attempt).
        std_esc8_default = "0.66" if self._std_fmt == 6 else "0.4"
        self._sparse_budgets = {
            "std": (
                float(os.environ.get("FASTDET_SPARSE_MASK_BUDGET", "4.6")),
                float(os.environ.get("FASTDET_SPARSE_AC_BUDGET", "13.6")),
                float(os.environ.get("FASTDET_SPARSE_ESC8_BUDGET",
                                     std_esc8_default)),
                float(os.environ.get("FASTDET_SPARSE_ESC16_BUDGET", "0.01")),
                float(os.environ.get("FASTDET_SPARSE_DCESC8_BUDGET", "0.16")),
                float(os.environ.get("FASTDET_SPARSE_DCESC_BUDGET", "0.02")),
            ),
            "dense": (
                float(os.environ.get(
                    "FASTDET_SPARSE_MASK_BUDGET_DENSE", "6.0")),
                float(os.environ.get("FASTDET_SPARSE_AC_BUDGET_DENSE", "15")),
                float(os.environ.get("FASTDET_SPARSE_ESC8_BUDGET_DENSE", "4.2")),
                float(os.environ.get("FASTDET_SPARSE_ESC16_BUDGET_DENSE", "0.3")),
                0.0,  # dense tier is v5: no dcesc8 stream
                float(os.environ.get("FASTDET_SPARSE_DCESC_BUDGET_DENSE", "0.25")),
            ),
        }
        self._sparse_fmt = {"std": self._std_fmt, "dense": 5}
        for stale in ("FASTDET_SPARSE_BUDGET", "FASTDET_SPARSE_ESC_BUDGET",
                      "FASTDET_SPARSE_BUDGET_DENSE",
                      "FASTDET_SPARSE_ESC_BUDGET_DENSE"):
            if stale in os.environ:
                logger.warning(
                    "%s is a v3 sparse-format knob and is IGNORED; the v5 "
                    "budgets use FASTDET_SPARSE_AC_BUDGET / _ESC8_BUDGET / "
                    "_ESC16_BUDGET / _DCESC_BUDGET (+_DENSE)", stale)
        self.mode = mode
        self.compute_dtype = _COMPUTE_DTYPES.get(mode, jnp.bfloat16)
        self.max_candidates = max_candidates
        self.max_det = max_det
        self.params = params if folded else yolov3.fold_params(spec, params)

        scales = None
        if mode == "int8":
            # Post-training quantization: per-channel int8 weights +
            # statically calibrated activation scales -> ~1.5x conv
            # throughput on the v5e int8 MXU (models/quantize.py).
            # Calibration runs on the CANONICAL graph, BEFORE the s2d
            # stem rewrite below: the float calibration forward's
            # accumulation order differs between the two graph forms, so
            # calibrating post-rewrite would shift y_scales by an ulp and
            # the ±1-count requant differences would avalanche — with
            # canonical scales the rewrite stays bit-exact in int8.
            from fastdet_tpu.models import quantize

            calib = calibration_images
            if calib is None:
                calib = _calibration_from_dir(spec.image_size)
            if calib is None:
                calib = _default_calibration_images(spec.image_size)
            scales = quantize.calibrate(spec, self.params, calib)

        # Space-to-depth stem rewrite (models/s2d.py): the 3-channel
        # first conv is MXU-starved (K=27 on a 128-wide array; 1.4 ms of
        # a 14.5 ms int8 batch-16 measured); on the 2x-decimated grid the
        # stem pair becomes well-shaped GEMMs with identical outputs
        # (bit-exact in int8 given the canonical scales above,
        # float-tolerance in bf16/f32). Engine-local: training,
        # checkpoints, and import keep the canonical spec.
        if os.environ.get("FASTDET_S2D_STEM", "1") != "0":
            from fastdet_tpu.models import s2d

            rewritten = s2d.stem_to_s2d(spec, self.params)
            if rewritten is not None:
                self.spec, self.params = rewritten
                spec = self.spec

        if mode == "int8":
            self.params = quantize.quantize_params(spec, self.params, scales)

        # Multi-chip serving: with >1 device, batches shard over a 'dp'
        # mesh (params replicated — the model is tiny next to HBM) and the
        # per-image pipeline runs SPMD; the cross-client batcher upstream
        # is what fills the slice (BASELINE.json north star). Buckets are
        # rounded up to multiples of the dp size so every chip gets equal
        # work with no padding surprises.
        devs = list(devices if devices is not None else jax.devices())
        self.devices = tuple(devs)
        self.n_devices = len(devs)
        if self.n_devices > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            self._mesh = Mesh(np.array(devs), axis_names=("dp",))
            self._batch_sharding = NamedSharding(self._mesh, P("dp"))
            rep = NamedSharding(self._mesh, P())
            self.params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), self.params
            )
            buckets = sorted(
                {max(b, self.n_devices) - (max(b, self.n_devices) % -self.n_devices)
                 for b in buckets}
            )
        else:
            self._mesh = None
            self._batch_sharding = None
            self.params = jax.device_put(self.params, devs[0])
        self.buckets = tuple(sorted(buckets))
        # Transfer workers: device_put of a packed batch blocks its
        # caller for the full h2d wall time on tunneled backends, so
        # put+execute dispatch through a worker pool. Pool size is CPU-
        # aware, and the reasoning is measured, not guessed
        # (tools/probe_hostcpu.py, tunneled v5e-1, b24 int8):
        #   full 72.6 ms/batch ≈ packonly 34.0 + prepack 35.8 — the
        # "transfer" wall is almost entirely host CPU (tunnel RPC
        # serialization), not idle wire wait, so on a 1-core host extra
        # workers have nothing to overlap and only add contention
        # (A/B: 4 workers 418 f/s vs 1 worker 437). On multi-core hosts
        # concurrent puts DO pipeline (4 concurrent 1.2 MB puts: 116 ms
        # vs 576 sequential, tools/probe_overlap.py), so default to 4
        # workers there. Batches are independent (each resolves its own
        # Future; results carry their own indices), so cross-batch
        # completion order is free to vary; the upstream inflight bound
        # (ModelService.MAX_INFLIGHT / bench --inflight) caps how many
        # are in the pool at once. FASTDET_XFER_WORKERS overrides.
        from concurrent.futures import ThreadPoolExecutor

        ncpu = os.cpu_count() or 1
        default_workers = 1 if ncpu < 4 else 4
        try:
            xfer_workers = int(
                os.environ.get("FASTDET_XFER_WORKERS", str(default_workers)))
        except ValueError:
            xfer_workers = default_workers
        self._xfer = ThreadPoolExecutor(max(1, xfer_workers),
                                        thread_name_prefix="fd-xfer")
        self._jit = jax.jit(self._pipeline)
        self._jit_coeffs = jax.jit(self._pipeline_coeffs)
        self._jit_planes_cache: Dict[Tuple[int, int], Any] = {}
        self._jit_sparse_cache: Dict[Tuple[int, int], Any] = {}
        # Tier memory: layout -> "dense" when recent traffic of that
        # layout mostly overflowed the std tier (see detect_async_sparse)
        self._tier_hint: Dict[Tuple[int, int], str] = {}
        # Programs still compiling on the background warm thread (lazy
        # warmup, VERDICT r2 #4): routing treats these paths as
        # unavailable instead of blocking a request on their compile.
        self._lazy_pending: set = set()
        self._lazy_thread = None
        self.background_warm_s: Optional[float] = None
        #: per-program warmup wall seconds, keyed by the warm-job tag
        #: (path, layout, tier, bucket) — see warmup()'s _warm_one
        self.warm_attribution: Dict[str, float] = {}
        self.max_batch = self.buckets[-1]

    def _place(self, arr: np.ndarray):
        """device_put a batch-major array with the dp sharding if any."""
        if self._batch_sharding is not None:
            return jax.device_put(arr, self._batch_sharding)
        return jnp.asarray(arr)

    def _dispatch_async(self, fn, packed: np.ndarray, thr: np.ndarray):
        """Queue (device_put inputs, enqueue jitted fn) on the transfer
        worker; returns a Future of the device result (fetch / the
        device_result helper unwrap it). Keeps the caller free to decode
        the next batch while this one streams to the device."""
        return self._xfer.submit(
            lambda: fn(self.params, self._place(packed), self._place(thr)))

    def _dispatch_async_packed(self, fn, packed: np.ndarray):
        """_dispatch_async for programs whose whole input is ONE packed
        array (sparse rows carry their thresholds in the row tail): one
        device_put RPC per batch instead of two."""
        return self._xfer.submit(
            lambda: fn(self.params, self._place(packed)))

    def _pallas_mode(self, env: str) -> str:
        """Resolve a Pallas-kernel env flag to 'off' | 'on' | 'interpret'.

        'auto' (default) enables the Mosaic kernels only on a real TPU
        backend — not merely non-CPU: the kernels use pltpu.roll / SMEM /
        VMEM specs that no other backend compiles. 'interpret' runs the
        kernels through the Pallas interpreter (works on CPU; used by the
        8-device-mesh tests to exercise the exact multi-chip code path).
        """
        import os

        flag = os.environ.get(env, "auto")
        if flag == "0":
            return "off"
        if flag == "1":
            return "on"
        if flag == "interpret":
            return "interpret"
        return "on" if jax.default_backend() == "tpu" else "off"

    def _shard_map_batch(self, fn, n_in: int):
        """Wrap a batch-major kernel in shard_map over the dp mesh.

        GSPMD cannot partition an opaque pallas_call, so under a dp mesh
        the kernels run per-shard: each device gets its local batch slice
        (buckets are rounded to dp multiples, so every shard is non-empty
        and equal). Identity outside a mesh.
        """
        if self._mesh is None:
            return fn
        from jax.sharding import PartitionSpec as P

        # check_vma=False: pallas_call's out_shape carries no varying-
        # mesh-axes annotation, and every input/output here is plainly
        # batch-sharded — nothing is replicated-then-diverged.
        return jax.shard_map(
            fn, mesh=self._mesh,
            in_specs=(P("dp"),) * n_in, out_specs=P("dp"),
            check_vma=False,
        )

    # The whole frame path as one XLA program. Returns ONE packed f32 array
    # (B, max_det, 7) = [x, y, w, h, score, klass, valid] so results reach
    # the host in a single device->host transfer (transfer latency, not
    # compute, dominates small-batch serving).
    def _pipeline(self, params, images_u8: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
        x = images_u8.astype(jnp.float32) * (1.0 / 255.0)
        return self._postprocess_tail(params, x, thresholds)

    def _postprocess_tail(self, params, x: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "int8":
            from fastdet_tpu.models import quantize

            heads = quantize.apply_int8(self.spec, params, x)
        else:
            heads = yolov3.apply(self.spec, params, x, compute_dtype=self.compute_dtype)
        # Decode + candidate budget stay under GSPMD (pure batch-parallel
        # elementwise/top_k). The soft-NMS runs through the early-exiting
        # batched while_loop (ops/nms.py): ~3-10 real detections against a
        # budget of 100 means ~10x fewer sequential VPU iterations than
        # the fixed-trip vmap. Under a dp mesh it runs per-shard via
        # shard_map — no collectives inside, so shards exiting at
        # different trip counts are safe, and each shard exits on its own
        # local batch rather than the global worst case.
        from fastdet_tpu.ops import nms as nms_ops

        sel_b, sel_s, sel_k = postprocess.select_batch(
            heads, self.spec, thresholds, self.max_candidates
        )
        nms_fn = lambda b, s, k, t: nms_ops.soft_nms_batch(
            b, s, k, t, self.max_det
        )
        res: NMSResult = self._shard_map_batch(nms_fn, 4)(
            sel_b, sel_s, sel_k, thresholds
        )
        packed = jnp.concatenate(
            [
                res.boxes,
                res.scores[..., None],
                res.klass.astype(jnp.float32)[..., None],
                res.valid.astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )
        # Second output: the response-wire >BBhhhh record bytes, packed ON
        # DEVICE (ops/postprocess.pack_wire_records). The serving loop's
        # fetch_wire pulls only this array — 10 B/slot d2h instead of
        # 28 B and zero per-record host math; fetch() pulls only `packed`.
        # Untouched outputs are never transferred, so each caller pays for
        # exactly one of the two.
        wire = postprocess.pack_wire_records(res, self.spec.image_size)
        return packed, wire

    # Stage-2 preprocessing (SURVEY.md §7.5): host entropy-decodes JPEG,
    # the device does dequant + IDCT (one MXU matmul) + fancy chroma
    # upsample + color convert, fused with the first conv by XLA.
    def _pipeline_coeffs(
        self, params, ycoef, cbcoef, crcoef, qy, qc, thresholds
    ) -> jnp.ndarray:
        from fastdet_tpu.ops import jpeg_device

        size = self.spec.image_size
        x = jpeg_device.decode420_batch(ycoef, cbcoef, crcoef, qy, qc, size, size)
        return self._postprocess_tail(params, x, thresholds)

    # Plane path: host Huffman+IDCT (native), device upsample+color+net.
    # Ships subsampled uint8 planes — 1.5 B/px for 4:2:0 (HALF the
    # transfer of RGB888), 2 B/px for 4:2:2/4:4:0. Second-fewest bytes
    # after the sparse path, and its per-frame fallback for over-budget
    # frames. The three planes travel as ONE packed
    # (B, y_bytes + 2*chroma_bytes) uint8 buffer: a single host->device
    # transfer per batch instead of three (per-transfer latency rivals
    # the data time on high-RTT links); the device slices it apart for
    # free. `layout` = luma sampling factors (hs, vs), static.
    def _pipeline_planes(self, params, packed,
                         layout=(2, 2)) -> jnp.ndarray:
        from jax import lax

        from fastdet_tpu.ops import jpeg_device

        hs, vs = layout
        size = self.spec.image_size
        yb = size * size
        cw = (size // vs) * (size // hs)
        b = packed.shape[0]
        y = packed[:, :yb].reshape(b, size, size)
        cb = packed[:, yb:yb + cw].reshape(b, size // vs, size // hs)
        cr = packed[:, yb + cw:yb + 2 * cw].reshape(
            b, size // vs, size // hs)
        # per-frame threshold rides the row tail as 4 f32 LE bytes (one
        # h2d put for the whole batch, matching the sparse rows)
        tb = packed[:, yb + 2 * cw:yb + 2 * cw + 4].astype(jnp.uint32)
        thresholds = lax.bitcast_convert_type(
            tb[:, 0] | (tb[:, 1] << 8) | (tb[:, 2] << 16) | (tb[:, 3] << 24),
            jnp.float32)

        # The fused Pallas ingest kernel (one VMEM pass, upsample as two
        # banded MXU matmuls) is bit-identical to the XLA path and
        # equal-or-faster on TPU; Mosaic doesn't target CPU, so CPU tests
        # take the XLA path (or 'interpret'). It implements the 4:2:0
        # layout; other layouts take the XLA path. Under a dp mesh the
        # kernel runs per-shard via shard_map (GSPMD can't partition an
        # opaque pallas_call). FASTDET_PALLAS_INGEST=0/1/interpret
        # overrides.
        mode = self._pallas_mode("FASTDET_PALLAS_INGEST")
        if layout == (2, 2) and mode != "off":
            from fastdet_tpu.ops.pallas import plane_ingest

            fn = functools.partial(
                plane_ingest.plane_ingest_batch,
                interpret=(mode == "interpret"))
            x = self._shard_map_batch(fn, 3)(y, cb, cr)
        else:
            def one(yp, cbp, crp):
                cbu = jpeg_device.upsample_chroma(cbp.astype(jnp.float32), hs, vs)
                cru = jpeg_device.upsample_chroma(crp.astype(jnp.float32), hs, vs)
                return jpeg_device.ycbcr_to_rgb01(yp.astype(jnp.float32), cbu, cru)

            x = jax.vmap(one)(y, cb, cr)
        return self._postprocess_tail(params, x, thresholds)

    def _planes_jit(self, layout: Tuple[int, int]):
        fn = self._jit_planes_cache.get(layout)
        if fn is None:
            fn = jax.jit(functools.partial(self._pipeline_planes, layout=layout))
            self._jit_planes_cache[layout] = fn
        return fn

    # ------------------------------------------------------------------
    # Packed sparse coefficient ingest (the fewest-bytes path)
    # ------------------------------------------------------------------
    #
    # Host does ONLY entropy decode (native fd_jpeg_sparse5); the wire
    # format is per-block variable-length ZIGZAG-order mask prefixes
    # (4-bit length stream + mask-byte stream) + a 4-bit AC value stream
    # with two escape levels (int8, then int16) + the DC column as int8
    # per-component raster deltas with int16 escapes (ops/jpeg_device.py
    # sparse5_to_coeffs). At camera quality that is ~0.13 B/px vs 1.5
    # B/px for 4:2:0 planes — ~9x fewer h2d bytes, which is the serving
    # bottleneck on bandwidth-limited links — and the host also skips
    # IDCT + upsample + color (the device does them; IDCT is one MXU
    # matmul).
    #
    # Stream capacities are static per layout (recompile-free), set by
    # the per-block budgets snapshotted in __init__ (measured content:
    # tools/measure_sparse_stats.py). Frames denser than any budget
    # raise on the host and retry the dense tier, then the plane path,
    # per frame — a tight budget costs a per-frame fallback, never
    # correctness.

    def _sparse_caps(
        self, layout: Tuple[int, int], tier: str = "std"
    ) -> "SparseCaps":
        """Static stream capacities for a (layout, tier) — see SparseCaps.

        Budgets are the engine-construction-time snapshots (see __init__):
        the packed row layout and the traced device programs must agree.
        """
        import math

        from fastdet_tpu.runtime import native_jpeg

        size = self.spec.image_size
        hs, vs = layout
        yb, cb = native_jpeg.sparse_geometry(size, size, hs, vs)
        nb = yb + 2 * cb
        fmt = self._sparse_fmt[tier]
        mk, ac, e8, e16, dce8, dce16 = self._sparse_budgets[tier]
        mcap = -128 * (math.ceil(nb * mk) // -128)
        if fmt == 6:
            # 3-bit value capacity in BYTES: 384-aligned (the only
            # multiple of both 128 — VMEM lane tiles — and 3 — whole
            # 8-symbol groups for the static-shift unpack)
            vcap = -384 * (math.ceil(nb * ac * 3 / 8) // -384)
            dce8cap = max(128, -128 * (math.ceil(nb * dce8) // -128))
        else:
            # nibble capacity in BYTES (2 values/byte), 128-byte aligned
            vcap = -128 * (math.ceil(nb * ac / 2) // -128)
            dce8cap = 0  # v5 DC deltas are already int8 — no escape stream
        e8cap = max(128, -128 * (math.ceil(nb * e8) // -128))
        e16cap = max(64, -64 * (math.ceil(nb * e16) // -64))
        dce16cap = max(64, -64 * (math.ceil(nb * dce16) // -64))
        return SparseCaps(fmt, nb, mcap, vcap, e8cap, e16cap, dce8cap,
                          dce16cap)

    @staticmethod
    def _sparse_offsets(caps: "SparseCaps") -> np.ndarray:
        """Field end-offsets of the packed row — the ONE definition of
        the row layout per wire format, shared by host staging
        (_stage_sparse) and device unpack (_pipeline_sparse):
          v5: [plen ceil(nb/2) | maskstream | dc8 nb | nib | esc8
               | esc16*2 | dcesc16*2 | qy,qcb,qcr 3*2*64]
          v6: [plen ceil(nb/2) | maskstream | dc4 ceil(nb/2) | tri
               | esc8 | esc16*2 | dcesc8 | dcesc16*2 | q...]
        (separate Cb/Cr tables: a legal JPEG may quantize Cr with its
        own table — reference-shape traffic shares one, but the row
        spends 128 bytes to stay correct for the general case)"""
        nb = caps.nb
        if caps.fmt == 6:
            fields = [(nb + 1) // 2, caps.mask, (nb + 1) // 2, caps.vals,
                      caps.e8, 2 * caps.e16, caps.dce8, 2 * caps.dce16]
        else:
            fields = [(nb + 1) // 2, caps.mask, nb, caps.vals,
                      caps.e8, 2 * caps.e16, 2 * caps.dce16]
        return np.cumsum(fields)

    def _sparse_row_bytes(self, caps: "SparseCaps") -> int:
        # + 384 B of quant tables (3 components x 64 x uint16) and + 4 B
        # for the per-frame threshold (f32 LE). Folding the threshold
        # into the row removes a whole device_put RPC per batch — on the
        # tunneled backend a put costs ~2 ms of host CPU regardless of
        # size (tools/probe_rpc_split.py: 96 B put = 2.08 ms pipelined),
        # and host CPU is the serving wall on small hosts (ROUND6).
        return int(self._sparse_offsets(caps)[-1]) + 384 + 4

    @staticmethod
    def _i16_from_pairs(rowslice: jnp.ndarray) -> jnp.ndarray:
        """(B, 2*N) uint8 little-endian byte pairs -> (B, N) int16.

        int16 fields travel as byte pairs inside the one uint8 row (one
        h2d transfer for the whole batch; the device re-widens)."""
        from jax import lax

        b = rowslice.shape[0]
        eb = rowslice.reshape(b, -1, 2).astype(jnp.uint16)
        return lax.bitcast_convert_type(
            (eb[..., 0] | (eb[..., 1] << 8)).astype(jnp.uint16), jnp.int16
        )

    def _pipeline_sparse(self, params, packed,
                         layout=(2, 2), tier="std") -> jnp.ndarray:
        from jax import lax

        from fastdet_tpu.ops import jpeg_device
        from fastdet_tpu.runtime import native_jpeg

        hs, vs = layout
        size = self.spec.image_size
        caps = self._sparse_caps(layout, tier)
        nb = caps.nb
        yb, cbn = native_jpeg.sparse_geometry(size, size, hs, vs)
        b = packed.shape[0]
        bounds = self._sparse_offsets(caps)
        plen = packed[:, :bounds[0]]
        maskstream = packed[:, bounds[0]:bounds[1]]
        if caps.fmt == 6:
            dc4 = packed[:, bounds[1]:bounds[2]]
            tri = packed[:, bounds[2]:bounds[3]]
            esc8 = lax.bitcast_convert_type(
                packed[:, bounds[3]:bounds[4]], jnp.int8)
            esc16 = self._i16_from_pairs(packed[:, bounds[4]:bounds[5]])
            dcesc8 = lax.bitcast_convert_type(
                packed[:, bounds[5]:bounds[6]], jnp.int8)
            dcesc16 = self._i16_from_pairs(packed[:, bounds[6]:bounds[7]])
            qstart = bounds[7]
        else:
            dc8 = lax.bitcast_convert_type(
                packed[:, bounds[1]:bounds[2]], jnp.int8)
            nib = packed[:, bounds[2]:bounds[3]]
            esc8 = lax.bitcast_convert_type(
                packed[:, bounds[3]:bounds[4]], jnp.int8)
            esc16 = self._i16_from_pairs(packed[:, bounds[4]:bounds[5]])
            dcesc = self._i16_from_pairs(packed[:, bounds[5]:bounds[6]])
            qstart = bounds[6]
        qb = packed[:, qstart:qstart + 384].reshape(b, 3, 64, 2)
        qb = qb.astype(jnp.float32)
        q = qb[..., 0] + qb[..., 1] * 256.0
        qy, qcb, qcr = q[:, 0], q[:, 1], q[:, 2]
        # per-frame threshold rides the row tail as 4 f32 LE bytes (one
        # h2d put for the whole batch; see _sparse_row_bytes)
        tb = packed[:, qstart + 384:qstart + 388].astype(jnp.uint32)
        thresholds = lax.bitcast_convert_type(
            tb[:, 0] | (tb[:, 1] << 8) | (tb[:, 2] << 16) | (tb[:, 3] << 24),
            jnp.float32)

        # Reconstruction: the Pallas kernel replaces XLA's per-value
        # NB*64 element gathers (~21 ms each per batch of 8 on the v5e)
        # with structured VMEM window loads — measured 43 ms -> 3.3 ms
        # per batch on the older int8 format, bit-identical. Mosaic
        # doesn't target CPU, so CPU tests take the XLA path (or
        # 'interpret'); dp-sharded engines run the kernel per-shard via
        # shard_map (GSPMD can't partition an opaque pallas_call, and
        # losing the kernel on exactly the multi-chip deployments it
        # matters for would be a 13x ingest regression).
        # FASTDET_PALLAS_SPARSE=0/1/interpret overrides.
        mode = self._pallas_mode("FASTDET_PALLAS_SPARSE")
        if nb % 8 == 0 and mode != "off":
            from fastdet_tpu.ops.pallas import sparse_ingest

            if caps.fmt == 6:
                fn = functools.partial(
                    sparse_ingest.sparse6_to_coeffs_batch,
                    yb=yb, cb=cbn, interpret=(mode == "interpret"))
                coeff = self._shard_map_batch(fn, 8)(
                    plen, maskstream, dc4, tri, esc8, esc16,
                    dcesc8, dcesc16)
            else:
                fn = functools.partial(
                    sparse_ingest.sparse5_to_coeffs_batch,
                    yb=yb, cb=cbn, interpret=(mode == "interpret"))
                coeff = self._shard_map_batch(fn, 7)(
                    plen, maskstream, dc8, nib, esc8, esc16, dcesc)
        elif caps.fmt == 6:
            coeff = jax.vmap(
                lambda p, m, d4, tv, e8, e16, de8, de16:
                jpeg_device.sparse6_to_coeffs(
                    p, m, d4, jpeg_device.unpack_3bit(tv), e8, e16,
                    de8, de16, yb, cbn)
            )(plen, maskstream, dc4, tri, esc8, esc16, dcesc8, dcesc16)
        else:
            coeff = jax.vmap(
                lambda p, m, d, nv, e8, e16, de: jpeg_device.sparse5_to_coeffs(
                    p, m, d, jpeg_device.unpack_nibbles(nv), e8, e16, de,
                    yb, cbn)
            )(plen, maskstream, dc8, nib, esc8, esc16, dcesc)
        x = jax.vmap(
            lambda c, q1, q2, q3: jpeg_device.coeffs_to_rgb01(
                c, q1, q2, q3, size, size, hs, vs)
        )(coeff, qy, qcb, qcr)
        return self._postprocess_tail(params, x, thresholds)

    def _sparse_jit(self, layout: Tuple[int, int], tier: str = "std"):
        key = (layout, tier)
        fn = self._jit_sparse_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                self._pipeline_sparse, layout=layout, tier=tier))
            self._jit_sparse_cache[key] = fn
        return fn

    def _stage_sparse(self, jpegs, thr_all, groups, tier):
        """Allocate packed rows + decode jobs for {layout: [indices]}."""
        staged = []
        jobs = []
        for layout, idxs in groups.items():
            caps = self._sparse_caps(layout, tier)
            row = self._sparse_row_bytes(caps)
            b = self.bucket_for(len(idxs))
            packed = np.zeros((b, row), np.uint8)  # zero rows = gray frames
            thr = np.full((b,), 2.0, np.float32)
            thr[: len(idxs)] = thr_all[idxs]
            # thresholds travel in the row tail (one put per batch);
            # padded rows keep the 2.0 sentinel so batched postprocess
            # early-exits on them instead of chewing a full NMS trip
            packed[:, -4:] = thr.view(np.uint8).reshape(b, 4)
            staged.append((layout, idxs, packed, thr))
            bo = self._sparse_offsets(caps)
            for j, i in enumerate(idxs):
                if caps.fmt == 6:
                    views = (
                        packed[j, :bo[0]],                      # plen
                        packed[j, bo[0]:bo[1]],                 # maskstream
                        packed[j, bo[1]:bo[2]],                 # dc4
                        packed[j, bo[2]:bo[3]],                 # tri
                        packed[j, bo[3]:bo[4]].view(np.int8),   # esc8
                        packed[j, bo[4]:bo[5]].view(np.int16),  # esc16
                        packed[j, bo[5]:bo[6]].view(np.int8),   # dcesc8
                        packed[j, bo[6]:bo[7]].view(np.int16),  # dcesc16
                        packed[j, bo[7]:bo[7] + 384].view(np.uint16),  # q
                    )
                else:
                    views = (
                        packed[j, :bo[0]],                      # plen
                        packed[j, bo[0]:bo[1]],                 # maskstream
                        packed[j, bo[1]:bo[2]].view(np.int8),   # dc8
                        packed[j, bo[2]:bo[3]],                 # nib
                        packed[j, bo[3]:bo[4]].view(np.int8),   # esc8
                        packed[j, bo[4]:bo[5]].view(np.int16),  # esc16
                        packed[j, bo[5]:bo[6]].view(np.int16),  # dcesc
                        packed[j, bo[6]:bo[6] + 384].view(np.uint16),  # q
                    )
                jobs.append((jpegs[i], i, caps.fmt, views))
        return staged, jobs

    def _run_sparse_jobs(
        self, jobs
    ) -> Tuple[List[int], Dict[int, Any]]:
        """Entropy-decode each job into its row; returns (overflow
        indices, {frame index: (emitter format, TRUE SparseCounts)}).
        The counts feed the tier-memory heuristic and the retry router
        (see detect_async_sparse): the emitters report BOTH formats'
        escape predictors and per-block-cap flags, so one decode tells
        whether an overflow frame has any chance on the other tier and
        whether a dense-staged frame would have fit std.

        A frame whose entropy decode RAISES (malformed / unsupported
        stream — not a capacity overflow) is reported as overflow with
        counts ``None``: it fails _fits_tier for every tier, so the
        retry router sends it down the planes/pixel ladder while its
        batch-mates keep their sparse dispatch. Raising here instead
        used to orphan std-tier parts already in flight on the device
        (wasted link + device work, then a duplicate full-batch
        fallback dispatch)."""
        from fastdet_tpu.runtime import native_jpeg

        def _decode(job):
            data, i, fmt, views = job
            qrow = views[-1]
            try:
                if fmt == 6:
                    cts, qy, qcb, qcr = native_jpeg.decode_sparse6_into(
                        data, *views[:-1])
                else:
                    cts, qy, qcb, qcr = native_jpeg.decode_sparse5_into(
                        data, *views[:-1])
            except native_jpeg.SparseCapacityExceeded as e:
                return i, False, (fmt, e.counts)
            except (ValueError, native_jpeg.NativeJpegUnavailable):
                return i, False, None
            qrow[:64] = qy
            qrow[64:128] = qcb
            qrow[128:] = qcr
            return i, True, (fmt, cts)

        pool = _decode_pool() if len(jobs) > 1 else None
        outcomes = (
            list(pool.map(_decode, jobs)) if pool is not None
            else [_decode(j) for j in jobs]
        )
        overflow = [i for i, ok, _ in outcomes if not ok]
        counts = {i: cts for i, ok, cts in outcomes}
        return overflow, counts

    def _fits_tier(self, layout: Tuple[int, int], tier: str,
                   fmt_cts) -> bool:
        """Would a frame with these emitter counts fit the tier's
        stream capacities AND the tier format's per-block escape caps?

        ``fmt_cts`` is the (source format, SparseCounts) pair from
        _run_sparse_jobs. The emitters report both formats' escape
        predictors (SparseCounts.ac_gt3/ac_gt7/dcd_gt7) and per-block
        flags, so this evaluates a format-CROSSING retry (std v6 <->
        dense v5) exactly, from one decode."""
        if fmt_cts is None:
            return False
        src_fmt, cts = fmt_cts
        caps = self._sparse_caps(layout, tier)
        block_viol = (cts.own_block_cap if caps.fmt == src_fmt
                      else cts.other_block_cap)
        if block_viol:
            return False
        if caps.fmt == 6:
            vals_need = -((cts.ac * 3) // -8)   # packed 3-bit bytes
            e8_need = cts.ac_gt3
            if cts.dcd_gt7 > caps.dce8:
                return False
        else:
            vals_need = (cts.ac + 1) // 2       # packed nibble bytes
            e8_need = cts.ac_gt7
        return (vals_need <= caps.vals and e8_need <= caps.e8
                and cts.e16 <= caps.e16 and cts.dce16 <= caps.dce16
                and cts.mask <= caps.mask)

    def detect_async_sparse(
        self, jpegs: Sequence[bytes], thresholds: Sequence[float]
    ) -> Optional["PlanesDispatch"]:
        """Dispatch via the packed-sparse-coefficient path; None if N/A.

        Grouping/fallback semantics mirror detect_async_planes, with one
        addition: a frame too dense for the "std" capacity tier retries
        on the "dense" tier (bigger packed rows, still the sparse wire
        format), and only dense-tier overflow falls back to the PLANE
        path, per frame — its group-mates still ride the sparse path.
        The returned dispatch's counts/tags record the split
        (counts keys: "sparse" = std tier, "sparse_dense", "planes").
        Returns None when the whole batch can't take a native fast path
        (caller decodes pixels on host).

        Tier memory: a std-tier attempt on photo-dense traffic costs a
        full wasted entropy decode per frame (~2 ms on a 1-core host —
        real photos overflow std's escape budgets every time), so when
        MOST of a layout group overflows std, the engine remembers and
        starts that layout at the dense tier. The emitter's true counts
        (returned with every successful decode) clear the hint the
        moment most of a dense-staged group would have fit std again —
        fully adaptive, no timers, no extra decodes in either steady
        state. Results are identical either way (the reconstruction is
        exact on both tiers); only wire bytes and host decode time move.
        """
        import os

        from fastdet_tpu.runtime import native_jpeg

        if os.environ.get("FASTDET_SPARSE_INGEST", "1") == "0":
            return None
        n = len(jpegs)
        assert 0 < n <= self.max_batch, n
        size = self.spec.image_size
        if size % 8 != 0 or not native_jpeg.available():
            return None
        groups: Dict[Tuple[int, int], List[int]] = {}
        probe_failed: List[int] = []
        for i, d in enumerate(jpegs):
            try:
                _, _, hs, vs = native_jpeg.scan_layout(
                    d, expected_size=(size, size)
                )
                native_jpeg.sparse_geometry(size, size, hs, vs)
            except (ValueError, native_jpeg.NativeJpegUnavailable):
                # Frame outside the native decoder's subset (progressive
                # scan, wrong size, malformed headers): route ONLY this
                # frame to the host pixel path instead of degrading its
                # whole batch — the probe is per-frame information.
                probe_failed.append(i)
                continue
            groups.setdefault((hs, vs), []).append(i)
        if not groups:
            return None

        thr_all = np.asarray(list(thresholds), np.float32)
        parts = []
        counts: Dict[str, int] = {}
        tags: List[str] = []
        pending = {lay: idxs for lay, idxs in groups.items()
                   if self._tier_hint.get(lay) != "dense"}
        dense_start = {lay: idxs for lay, idxs in groups.items()
                       if self._tier_hint.get(lay) == "dense"}
        to_planes: List[int] = []  # overflow frames with no viable tier
        for tier, count_key, tag_fmt in (
            ("std", "sparse", "sparse:%d%d"),
            ("dense", "sparse_dense", "sparse+:%d%d"),
        ):
            if tier == "dense":
                for lay, idxs in dense_start.items():
                    pending.setdefault(lay, []).extend(idxs)
                    pending[lay].sort()
                # Lazy warmup: while the dense-tier program is still
                # background-compiling, over-budget frames ride planes/
                # pixels instead of blocking on the compile.
                for lay in [l for l, idxs in pending.items()
                            if not self._path_ready(
                                ("sparse", l, "dense",
                                 self.bucket_for(len(idxs))))]:
                    to_planes.extend(pending.pop(lay))
            if not pending:
                continue
            staged, jobs = self._stage_sparse(jpegs, thr_all, pending, tier)
            overflow, frame_cts = self._run_sparse_jobs(jobs)
            ov = set(overflow)
            next_pending: Dict[Tuple[int, int], List[int]] = {}
            for layout, idxs, packed, thr in staged:
                ovl = [i for i in idxs if i in ov]
                if ovl and tier == "std":
                    # Retry routing from the TRUE emitter counts: frames
                    # with no chance on the dense tier skip straight to
                    # planes instead of paying a second wasted entropy
                    # decode (~2 ms/frame on a 1-core serving host).
                    # _fits_tier evaluates the format crossing (std v6
                    # -> dense v5) including the target format's
                    # per-block caps — a block too escape-dense for the
                    # 3-bit wire is usually fine as nibbles.
                    retry = [i for i in ovl
                             if self._fits_tier(layout, "dense",
                                                frame_cts[i])]
                    if retry:
                        next_pending[layout] = retry
                    hopeless = [i for i in ovl if i not in set(retry)]
                    if hopeless:
                        to_planes.extend(hopeless)
                elif ovl:
                    next_pending[layout] = ovl
                if tier == "std" and 2 * len(ovl) > len(idxs):
                    self._tier_hint[layout] = "dense"
                elif tier == "dense" and layout in dense_start:
                    fit = sum(
                        1 for i in idxs
                        if i not in ov
                        and self._fits_tier(layout, "std", frame_cts[i]))
                    if 2 * fit > len(idxs):
                        self._tier_hint.pop(layout, None)
                keep = [k for k, i in enumerate(idxs) if i not in ov]
                if not keep:
                    continue
                if len(keep) != len(idxs):
                    # fetch() maps result ROW j to the j-th kept index, so
                    # the kept frames' rows must be compacted to the front.
                    # The vacated tail rows must be ZEROED, not just given
                    # threshold 2.0: an overflow frame's row carries its
                    # plen/mask prefix with truncated streams, and on TPU the
                    # Pallas kernel's stream-window reads would chase
                    # those mask offsets far past the row's VMEM buffers
                    # (threshold only discards the OUTPUT). Zero rows are
                    # gray frames with in-bounds (all-zero) offsets.
                    packed[: len(keep)] = packed[keep]
                    packed[len(keep):len(idxs)] = 0
                    # re-stamp the vacated rows' in-row threshold bytes:
                    # zeroed tails decode as threshold 0.0, which would
                    # defeat the batched-NMS early exit on gray frames
                    packed[len(keep):len(idxs), -4:] = _THR_PAD_BYTES
                res = self._dispatch_async_packed(
                    self._sparse_jit(layout, tier), packed)
                parts.append((res, [idxs[k] for k in keep]))
                counts[count_key] = counts.get(count_key, 0) + len(keep)
                tags.append(tag_fmt % layout)
            pending = next_pending
        unresolved: List[int] = list(probe_failed)
        if pending or to_planes:
            # Too dense even for the dense tier: those frames re-decode
            # via the plane path (still a native fast path, 1.5-2 B/px).
            ovidx = sorted(set(to_planes).union(
                i for idxs in pending.values() for i in idxs))
            sub = self.detect_async_planes(
                [jpegs[i] for i in ovidx], [thr_all[i] for i in ovidx]
            )
            if sub is None:
                if not parts:
                    return None  # nothing in flight: pixel decode for all
                # Sparse parts are already on the device — keep them and
                # hand ONLY these frames back for host pixel decode.
                unresolved.extend(ovidx)
            else:
                for dev_res, sub_idxs in sub.parts:
                    parts.append((dev_res, [ovidx[k] for k in sub_idxs]))
                unresolved.extend(ovidx[k] for k in sub.unresolved)
                counts["planes"] = len(ovidx) - len(sub.unresolved)
                tags.extend(sub.tags)
        return PlanesDispatch(
            parts, layouts=tuple(sorted(groups)), tags=tuple(tags),
            counts=counts, unresolved=unresolved,
        )

    def detect_async_planes(
        self, jpegs: Sequence[bytes], thresholds: Sequence[float]
    ) -> Optional["PlanesDispatch"]:
        """Dispatch via the reduced-bandwidth plane path; None if N/A.

        Accepts any mix of 4:2:0 / 4:2:2 / 4:4:0 / 4:4:4 frames (the
        reference's own fixtures are 4:2:2 — /root/reference/testdata);
        the batch is grouped by subsampling layout and each group runs as
        one device program. Layouts are probed from the headers (~4us)
        before anything is allocated; frames then entropy-decode straight
        into the padded batch arrays, in parallel across decode threads
        on multi-core hosts (the native call releases the GIL).

        The header probe is all-or-nothing (it is ~4us/frame and runs
        before anything is staged): an unsupported layout returns None
        and the caller decodes everything on host. A frame whose FULL
        entropy decode then fails (malformed stream past the headers) is
        excluded from its group (rows compacted, tail re-neutralized)
        and reported in the dispatch's ``unresolved`` — its group-mates'
        device work is kept, matching the sparse path's per-frame
        failure routing. None is returned only when no frame decodes.
        """
        from fastdet_tpu.runtime import native_jpeg

        n = len(jpegs)
        assert 0 < n <= self.max_batch, n
        size = self.spec.image_size
        if size % 16 != 0 or not native_jpeg.available():
            return None
        groups: Dict[Tuple[int, int], List[int]] = {}
        probe_failed: List[int] = []
        for i, d in enumerate(jpegs):
            try:
                _, _, hs, vs = native_jpeg.scan_layout(
                    d, expected_size=(size, size)
                )
            except (ValueError, native_jpeg.NativeJpegUnavailable):
                probe_failed.append(i)   # per-frame: see detect_async_sparse
                continue
            groups.setdefault((hs, vs), []).append(i)
        # Lazy warmup: groups whose plane program is still background-
        # compiling fall through to the pixel path (unresolved) rather
        # than blocking a request on the compile.
        for lay in [l for l, idxs in groups.items()
                    if not self._path_ready(
                        ("planes", l, self.bucket_for(len(idxs))))]:
            probe_failed.extend(groups.pop(lay))
        if not groups:
            return None

        thr_all = np.asarray(list(thresholds), np.float32)
        staged = []
        jobs = []
        for layout, idxs in groups.items():
            hs, vs = layout
            b = self.bucket_for(len(idxs))
            yb = size * size
            cw = (size // vs) * (size // hs)
            # one contiguous buffer per group: [Y | Cb | Cr | thr] per
            # row, so the whole batch ships as a SINGLE host->device
            # transfer (the per-frame f32 threshold rides the tail like
            # the sparse rows — one device_put RPC per batch, not two);
            # frames decode straight into row views (no copies)
            packed = np.empty((b, yb + 2 * cw + 4), np.uint8)
            packed[len(idxs):, :yb] = 0               # padded: black...
            packed[len(idxs):, yb:yb + 2 * cw] = 128  # ...neutral chroma
            thr = np.full((b,), 2.0, np.float32)
            thr[: len(idxs)] = thr_all[idxs]
            packed[:, -4:] = thr.view(np.uint8).reshape(b, 4)
            staged.append((layout, idxs, packed, thr))
            for j, i in enumerate(idxs):
                jobs.append((
                    i,
                    jpegs[i],
                    packed[j, :yb].reshape(size, size),
                    packed[j, yb:yb + cw].reshape(size // vs, size // hs),
                    packed[j, yb + cw:yb + 2 * cw].reshape(
                        size // vs, size // hs),
                ))

        def _decode_one(a):
            try:
                native_jpeg.decode_planes_into(*a[1:])
                return None
            except (ValueError, native_jpeg.NativeJpegUnavailable):
                return a[0]

        if len(jobs) > 1 and _decode_pool() is not None:
            failed = {i for i in _decode_pool().map(_decode_one, jobs)
                      if i is not None}
        else:
            failed = {i for i in map(_decode_one, jobs) if i is not None}
        if len(failed) + len(probe_failed) == n:
            return None  # nothing decodable; caller pixel-decodes all

        parts = []
        tags = []
        for layout, idxs, packed, thr in staged:
            keep = [k for k, i in enumerate(idxs) if i not in failed]
            if not keep:
                continue
            if len(keep) != len(idxs):
                # Compact surviving rows to the front (fetch() maps result
                # row j -> j-th kept index) and re-neutralize the vacated
                # rows: black Y / neutral chroma / threshold-2.0 tail so
                # the batched postprocess early-exits on them.
                yb = size * size
                cw = (size // layout[1]) * (size // layout[0])
                packed[: len(keep)] = packed[keep]
                packed[len(keep):len(idxs), :yb] = 0
                packed[len(keep):len(idxs), yb:yb + 2 * cw] = 128
                packed[len(keep):len(idxs), -4:] = _THR_PAD_BYTES
            res = self._dispatch_async_packed(self._planes_jit(layout), packed)
            parts.append((res, [idxs[k] for k in keep]))
            tags.append("planes:%d%d" % layout)
        return PlanesDispatch(
            parts,
            layouts=tuple(sorted(groups)),
            tags=tuple(tags),
            counts={"planes": n - len(failed) - len(probe_failed)},
            unresolved=sorted(failed.union(probe_failed)),
        )

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def warmup(self, buckets: Optional[Sequence[int]] = None,
               fallbacks: bool = True) -> float:
        """AOT-compile every batch bucket; returns total compile seconds.

        ``fallbacks=False`` skips the overflow-fallback programs (dense
        tier, planes) entirely — no background thread, they compile on
        first use instead. One-shot CLIs use this: a background compile
        would otherwise hold the interpreter at exit (the executor's
        atexit join) for programs the process will likely never run."""
        from fastdet_tpu.runtime import native_jpeg

        t0 = time.time()
        size = self.spec.image_size
        warm_planes = size % 16 == 0 and native_jpeg.available()
        # Plane layouts to AOT-compile: 4:2:0 (mobile-client default) and
        # 4:2:2 (the reference fixtures' layout); others compile on first
        # use. Override with FASTDET_WARM_LAYOUTS="22,21,11".
        import os

        warm_layouts = []
        for tok in os.environ.get("FASTDET_WARM_LAYOUTS", "22,21").split(","):
            tok = tok.strip()
            if len(tok) != 2 or not tok.isdigit():
                continue
            layout = (int(tok[0]), int(tok[1]))
            if layout not in native_jpeg.PLANE_LAYOUTS:
                logger.warning("FASTDET_WARM_LAYOUTS: ignoring %r", tok)
                continue
            warm_layouts.append(layout)
        # Lazy split (VERDICT r2 #4 — cold start): only the FIRST-CHOICE
        # serving programs compile before warmup returns (pixel fallback
        # + sparse std tier per warm layout); the overflow fallbacks
        # (sparse dense tier, planes) compile on a background thread.
        # Until a lazy program is ready, the dispatch routers treat its
        # path as unavailable and route those frames down the
        # already-warm ladder (dense -> planes -> pixels), so the first
        # over-budget frame NEVER blocks on a compile — it just rides a
        # fatter wire until the background warm lands (pinned by
        # tests/test_lazy_warmup.py). FASTDET_LAZY_WARM=0 restores the
        # all-eager behavior.
        lazy = os.environ.get("FASTDET_LAZY_WARM", "1") != "0"
        jobs = []       # (jitted fn, args, batch, key) eager
        lazy_jobs = []  # same, background (dropped if fallbacks=False)
        warm_buckets = list(buckets or self.buckets)
        for b in warm_buckets:
            imgs = np.zeros((b, size, size, 3), np.uint8)
            thr = np.full((b,), 0.1, np.float32)
            # exercise the FULL path including the host fetch: on tunneled
            # device backends the first d2h transfer pays a large one-time
            # setup cost that must not land on the first real request.
            # Pixel programs beyond the smallest bucket ride the
            # background set when lazy: the pixel path serves rare
            # decode-failure frames (usually few at a time), and its
            # large-bucket warm ships the biggest zero-batch of the warm
            # set (b x 519 KB) for the least-likely program. There is no
            # readiness gate on detect_async — a big undecodable batch
            # arriving before the background warm lands just pays the
            # compile then (correct, merely slower, and only in the
            # first seconds of uptime).
            job = (self._jit,
                   (self.params, self._place(imgs), self._place(thr)),
                   b, ("pixels", b))
            (lazy_jobs if lazy and fallbacks and b != min(warm_buckets)
             else jobs).append(job)
            if warm_planes:
                for hs, vs in warm_layouts:
                    for tier in ("std", "dense"):
                        caps = self._sparse_caps((hs, vs), tier)
                        packed = np.zeros(
                            (b, self._sparse_row_bytes(caps)),
                            np.uint8)
                        packed[:, -4:] = thr.view(np.uint8).reshape(b, 4)
                        if tier == "dense" and not fallbacks:
                            continue
                        job = (self._sparse_jit((hs, vs), tier),
                               (self.params, self._place(packed)), b,
                               ("sparse", (hs, vs), tier, b))
                        (lazy_jobs if lazy and tier == "dense"
                         else jobs).append(job)
                    if not fallbacks:
                        continue
                    n = size * size + 2 * (size // vs) * (size // hs) + 4
                    pk = np.full((b, n), 128, np.uint8)
                    pk[:, -4:] = thr.view(np.uint8).reshape(b, 4)
                    job = (self._planes_jit((hs, vs)),
                           (self.params, self._place(pk)), b,
                           ("planes", (hs, vs), b))
                    (lazy_jobs if lazy else jobs).append(job)
        # Compile + first-run all programs CONCURRENTLY: compilation
        # parallelizes across calls (measured on the tunneled v5e: 5 cold
        # programs 449 s serially vs 26 s threaded — remote-compile RTT
        # and compiler time both overlap). jit dispatch/execute/fetch are
        # thread-safe; results are discarded.
        from concurrent.futures import ThreadPoolExecutor

        def _warm_one(j):
            t_job = time.time()
            res = j[0](*j[1])
            self.fetch(res, j[2])       # CLI path: f32 packed d2h
            self.fetch_wire(res, j[2])  # serving path: u8 records d2h
            # Per-program attribution (VERDICT r4 #7: compile_s grew
            # 15 -> 196 s over four rounds with nothing saying where).
            # Wall time of the FIRST call of each program = compile +
            # first-run + its share of queueing on the warm pool; the
            # table names which (path, layout, tier, bucket) combos pay.
            self.warm_attribution[str(j[3])] = round(time.time() - t_job, 2)

        with ThreadPoolExecutor(min(8, len(jobs))) as ex:
            list(ex.map(_warm_one, jobs))
        dt = time.time() - t0

        if lazy_jobs:
            self._lazy_pending.update(j[3] for j in lazy_jobs)

            def _background():
                t1 = time.time()
                with ThreadPoolExecutor(min(8, len(lazy_jobs))) as ex:
                    for j in lazy_jobs:
                        def _one(j=j):
                            try:
                                _warm_one(j)
                            finally:
                                self._lazy_pending.discard(j[3])
                        ex.submit(_one)
                self.background_warm_s = time.time() - t1
                logger.info("engine background warm: %s in %.1fs",
                            self.spec.name, self.background_warm_s)

            import threading

            self._lazy_thread = threading.Thread(
                target=_background, daemon=True,
                name="fastdet-bg-warm")
            self._lazy_thread.start()

        logger.info(
            "engine warmup: %s buckets=%s in %.1fs (background programs: %d)",
            self.spec.name, self.buckets, dt, len(lazy_jobs)
        )
        return dt

    def wait_warm(self, timeout: Optional[float] = None) -> None:
        """Block until the background warm (if any) finishes."""
        t = self._lazy_thread
        if t is not None:
            t.join(timeout)

    def _path_ready(self, key) -> bool:
        """False while ``key``'s program is still background-compiling.
        Engines that never ran warmup() have nothing pending — every
        path is 'ready' and compiles on first use (tests, CLIs)."""
        return key not in self._lazy_pending

    # ------------------------------------------------------------------
    # Synchronous API (detector CLI, tests)
    # ------------------------------------------------------------------

    def detect(
        self, images: Sequence[np.ndarray], thresholds: Sequence[float]
    ) -> List[List[ResultTuple]]:
        """Run a batch of RGB uint8 (416,416,3) images; trims padding."""
        res = self.detect_async(images, thresholds)
        return self.fetch(res, len(images))

    def detect_one(self, image: np.ndarray, threshold: float) -> List[ResultTuple]:
        return self.detect([image], [threshold])[0]

    # ------------------------------------------------------------------
    # Async-friendly two-phase API (serving runtime)
    # ------------------------------------------------------------------

    def detect_async(
        self, images: Sequence[np.ndarray], thresholds: Sequence[float]
    ) -> jnp.ndarray:
        """Pad to a bucket and dispatch; returns device arrays immediately."""
        n = len(images)
        assert 0 < n <= self.max_batch, n
        b = self.bucket_for(n)
        size = self.spec.image_size
        batch = np.zeros((b, size, size, 3), np.uint8)
        for i, img in enumerate(images):
            if img.shape != (size, size, 3):
                raise ValueError("invalid image size")
            batch[i] = img
        thr = np.zeros((b,), np.float32)
        thr[:n] = np.asarray(thresholds, np.float32)
        # Padded slots run with threshold 0 on a zero image; their outputs
        # are discarded in fetch().
        thr[n:] = 2.0  # above any possible score -> empty result, less NMS work
        return self._jit(self.params, self._place(batch), self._place(thr))

    def detect_async_jpeg(
        self, jpegs: Sequence[bytes], thresholds: Sequence[float]
    ) -> Optional[jnp.ndarray]:
        """Dispatch via the on-device (coefficient) decode path.

        Returns None when the path doesn't apply (native lib missing, or
        any frame isn't a 3-component 4:2:0 JPEG at the model size) —
        caller then decodes on host and uses detect_async.
        """
        from fastdet_tpu.runtime import native_jpeg

        n = len(jpegs)
        assert 0 < n <= self.max_batch, n
        size = self.spec.image_size
        if size % 16 != 0 or not native_jpeg.available():
            return None
        try:
            cis = [
                native_jpeg.decode_coefficients(d, expected_size=(size, size))
                for d in jpegs
            ]
        except (ValueError, native_jpeg.NativeJpegUnavailable):
            return None
        for ci in cis:
            if not ci.is_420 or (ci.width, ci.height) != (size, size):
                return None
        b = self.bucket_for(n)
        yb, cb = (size // 8) ** 2, (size // 16) ** 2
        ycoef = np.zeros((b, yb, 64), np.int16)
        cbcoef = np.zeros((b, cb, 64), np.int16)
        crcoef = np.zeros((b, cb, 64), np.int16)
        qy = np.ones((b, 64), np.float32)
        qc = np.ones((b, 64), np.float32)
        for i, ci in enumerate(cis):
            ycoef[i] = ci.ycoef
            cbcoef[i] = ci.cbcoef
            crcoef[i] = ci.crcoef
            qy[i] = ci.qy
            qc[i] = ci.qc
        thr = np.full((b,), 2.0, np.float32)
        thr[:n] = np.asarray(thresholds, np.float32)
        return self._jit_coeffs(
            self.params, self._place(ycoef), self._place(cbcoef),
            self._place(crcoef), self._place(qy), self._place(qc),
            self._place(thr),
        )

    def fetch(self, res, n: int) -> List[List[ResultTuple]]:
        """Block on device results and convert the first n images.

        One d2h transfer for the whole packed batch result (one per
        layout group for a PlanesDispatch).
        """
        if isinstance(res, PlanesDispatch):
            out: List[Optional[List[ResultTuple]]] = [None] * n
            for dev_res, idxs in res.parts:
                part = self.fetch(dev_res, len(idxs))
                for j, i in enumerate(idxs):
                    out[i] = part[j]
            return [r if r is not None else [] for r in out]
        res = device_result(res)
        packed = np.asarray(res, dtype=np.float32)[:n]  # (n, max_det, 7)
        size = self.spec.image_size
        # reorder/scale once in numpy and convert via tolist() (C speed);
        # per-element float(np_scalar) calls here were measurable on the
        # serving loop at ~100 dets/image under synthetic weights.
        # The pixel scale is an f32 product ON PURPOSE: the device wire
        # packer (ops/postprocess.pack_wire_records) scales in f32, and
        # keeping both products bit-identical means fetch() tuples and
        # fetch_wire() records always truncate to the same i16 coords.
        scaled = packed[:, :, [5, 4, 0, 1, 2, 3]]
        scaled[:, :, 2:] *= np.float32(size)
        counts_v = (packed[:, :, 6] > 0.5).sum(axis=1)
        scaled = scaled.astype(np.float64)
        out: List[List[ResultTuple]] = []
        for i in range(n):
            rows = scaled[i, : int(counts_v[i])].tolist()
            out.append([(int(r[0]), r[1], r[2], r[3], r[4], r[5])
                        for r in rows])
        return out

    # Wire record layout (>BBhhhh big-endian, docs/PROTOCOL.md): klass u8,
    # conf*255 u8, x y w h i16 pixel coords.
    _WIRE_RECORD = np.dtype([("k", "u1"), ("c", "u1"), ("x", ">i2"),
                             ("y", ">i2"), ("w", ">i2"), ("h", ">i2")])

    def fetch_wire(self, res, n: int) -> List[bytes]:
        """fetch(), but each frame's results come back ALREADY PACKED as
        the response wire's >BBhhhh record blob (wire.pack_response_raw
        prepends the header). Serving hot path: one vectorized numpy
        pass for the whole batch instead of tuple conversion + one
        struct.pack per record on the event loop — byte-identical to
        DetectResponse.pack(fetch(...)) (pinned by tests)."""
        if isinstance(res, PlanesDispatch):
            out_w: List[Optional[bytes]] = [None] * n
            for dev_res, idxs in res.parts:
                part = self.fetch_wire(dev_res, len(idxs))
                for j, i in enumerate(idxs):
                    out_w[i] = part[j]
            return [r if r is not None else b"" for r in out_w]
        res = res.result() if hasattr(res, "result") else res
        if isinstance(res, (tuple, list)):
            # Device-packed records (ops/postprocess.pack_wire_records):
            # one uint8 d2h pull of 10 B/slot + a 4-byte LE count tail,
            # already in wire byte order — slice and ship.
            rec = np.asarray(res[1])[:n]
            cnt = rec[:, -4:].astype(np.uint32)
            cnt = cnt[:, 0] | (cnt[:, 1] << 8) | (cnt[:, 2] << 16) | (
                cnt[:, 3] << 24)
            return [rec[i, : int(cnt[i]) * 10].tobytes() for i in range(n)]
        # Host fallback for bare packed arrays (tests, diagnostics). The
        # pixel scale is an f32 product to bit-agree with fetch() and the
        # device packer (see fetch()).
        packed = np.asarray(res, dtype=np.float32)[:n]  # (n, max_det, 7)
        counts_v = (packed[:, :, 6] > 0.5).sum(axis=1)
        coords = (packed[:, :, :4] * np.float32(self.spec.image_size)
                  ).astype(np.float64)
        packed = packed.astype(np.float64)
        # match _i16 exactly: NaN -> 0, truncate toward zero, saturate
        coords = np.nan_to_num(coords, nan=0.0, posinf=32767.0,
                               neginf=-32768.0)
        coords = np.clip(np.trunc(coords), -32768, 32767)
        conf = np.nan_to_num(packed[:, :, 4], nan=0.0)
        rec = np.empty(packed.shape[:2], self._WIRE_RECORD)
        rec["k"] = packed[:, :, 5].astype(np.uint8)
        rec["c"] = np.clip(np.trunc(conf * 255), 0, 255).astype(np.uint8)
        rec["x"] = coords[:, :, 0]
        rec["y"] = coords[:, :, 1]
        rec["w"] = coords[:, :, 2]
        rec["h"] = coords[:, :, 3]
        return [rec[i, : int(counts_v[i])].tobytes() for i in range(n)]
