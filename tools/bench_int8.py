#!/usr/bin/env python3
"""Measure int8-through vs bf16 vs f32 forward time on the real TPU.

Produces the per-mode table for docs/DESIGN.md (VERDICT round-1 #4 done
criterion): forward-only ms/img at several batch sizes, plus the e2e
engine pipeline time, for:

- bf16            : the default serving mode
- int8            : int8-through activations (models/quantize.py)
- f32             : reference precision

Run on the TPU host (first run pays remote compiles; the compile cache
makes reruns cheap):
    python tools/bench_int8.py [--arch full] [--batches 1,8] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="full")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--modes", default="bf16,int8,f32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdet_tpu.models import quantize, weights, yolov3
    from fastdet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    spec, params = weights.load_model(f"synthetic:{args.arch}", num_classes=80)
    folded = yolov3.fold_params(spec, params)
    batches = [int(b) for b in args.batches.split(",")]
    modes = args.modes.split(",")

    qparams = None
    if "int8" in modes:
        rng = np.random.RandomState(0)
        calib = rng.randint(0, 255, (4, spec.image_size, spec.image_size, 3),
                            np.uint8)
        scales = quantize.calibrate(spec, folded, calib)
        qparams = quantize.quantize_params(spec, folded, scales)

    def fwd(mode):
        if mode == "int8":
            return jax.jit(lambda p, x: quantize.apply_int8(spec, p, x)), qparams
        dt = {"bf16": jnp.bfloat16, "f32": jnp.float32}[mode]
        return (
            jax.jit(lambda p, x: yolov3.apply(spec, p, x, compute_dtype=dt)),
            folded,
        )

    table = {}
    for mode in modes:
        fn, p = fwd(mode)
        row = {}
        for b in batches:
            x = jnp.asarray(
                np.random.RandomState(1).rand(b, spec.image_size,
                                              spec.image_size, 3),
                jnp.float32)
            t0 = time.time()
            out = fn(p, x)
            # force materialization: on the tunneled backend
            # block_until_ready can acknowledge dispatch only, so fetch a
            # scalar slice to pin actual completion
            np.asarray(out[0][:1, :1, :1, :1])
            compile_s = time.time() - t0
            # timed loop: keep many dispatches in flight so dispatch RTT
            # doesn't serialize device work, then materialize the tail
            ts = []
            per_block = max(4, args.iters // 5)
            for _ in range(5):
                t0 = time.time()
                outs = [fn(p, x) for _ in range(per_block)]
                np.asarray(outs[-1][0][:1, :1, :1, :1])
                ts.append((time.time() - t0) / per_block)
            ms = 1e3 * min(ts) / b
            row[f"b{b}_ms_per_img"] = round(ms, 3)
            row[f"b{b}_compile_s"] = round(compile_s, 1)
        table[mode] = row
        print(f"{mode}: {row}", file=sys.stderr)

    if "bf16" in table and "int8" in table:
        for b in batches:
            k = f"b{b}_ms_per_img"
            table[f"int8_speedup_b{b}"] = round(
                table["bf16"][k] / table["int8"][k], 3)
    print(json.dumps({"arch": args.arch, "backend": jax.default_backend(),
                      **table}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
