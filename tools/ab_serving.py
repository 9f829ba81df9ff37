#!/usr/bin/env python
"""A/B the multi-client serving section across server-side shapes.

The question this answers (same-session, interleaved passes — the only
honest comparison on the tunneled link, docs/ROUND4.md): which engine
bucket set / client window should the serving bench run, now that the
v6 wire moved the *batched* optimum from 16 to 24?  A 24-bucket dispatch
ships a ~1.2 MB h2d burst; serving clients are latency-coupled (each
window refills only on responses), so bigger buckets may starve supply
where the batched bench's dedicated producer does not.

Usage: python tools/ab_serving.py [--passes 3] [--per-client 48]
"""

import argparse
import asyncio
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from fastdet_tpu.runtime.client import DetectClient  # noqa: E402
from fastdet_tpu.runtime.engine import DetectionEngine  # noqa: E402
from fastdet_tpu.runtime.server import DetectionServer, ModelService  # noqa: E402


def run_clients(port, fixtures, n_clients, per_client, window):
    """Drive the load from a SEPARATE PROCESS (tools/client_load.py):
    in-process client threads share the GIL with the asyncio server
    loop and pollute the server-side number (VERDICT r2 weak #2)."""
    import json
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "client_load.py"),
         "--port", str(port), "--path", "full",
         "--clients", str(n_clients), "--per-client", str(per_client),
         "--window", str(window), "--threshold", "0.1"],
        capture_output=True, text=True, timeout=600, env=env)
    if proc.returncode != 0 or not proc.stdout.strip():
        raise RuntimeError(
            f"client_load rc={proc.returncode} "
            f"stderr={proc.stderr.strip()[-400:]!r}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["wall_s"], out["errors"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--per-client", type=int, default=48)
    args = ap.parse_args()

    fixtures = bench.make_jpegs(3)
    spec, params, _ = bench.load_bench_model("full", 80)

    variants = [
        ("b16/w4", (1, 8, 16), 4),
        ("b24/w6", (1, 8, 16, 24), 6),
        ("b24/w4", (1, 8, 16, 24), 4),
    ]

    engines = {}
    for name, buckets, _w in variants:
        if buckets not in engines:
            e = DetectionEngine(spec, params, mode="int8", buckets=buckets,
                                calibration_images=bench.bench_calibration())
            e.warmup()
            engines[buckets] = e

    results = {name: [] for name, _, _ in variants}
    for p in range(args.passes):
        for name, buckets, window in variants:
            eng = engines[buckets]
            services = {"full": ModelService(eng, name="full")}
            server = DetectionServer(services, port=0, host="127.0.0.1")
            loop = asyncio.new_event_loop()
            th = threading.Thread(
                target=lambda: (asyncio.set_event_loop(loop),
                                loop.run_until_complete(server.serve())),
                daemon=True)
            th.start()
            while server.bound_port is None:
                time.sleep(0.01)
            # warmup pass (session setup + bucket first-hits)
            run_clients(server.bound_port, fixtures, args.clients, 12, window)
            svc = services["full"]
            b0, f0 = svc.batches, svc.frames
            wall, errs = run_clients(server.bound_port, fixtures,
                                     args.clients, args.per_client, window)
            fps = args.clients * args.per_client / wall
            ab = (svc.frames - f0) / max(1, svc.batches - b0)
            results[name].append(fps)
            print(f"pass {p} {name}: {fps:.1f} f/s avg_batch {ab:.2f} "
                  f"errors={errs}", flush=True)
            loop.call_soon_threadsafe(
                lambda: (server.request_shutdown(),
                         [t.cancel() for t in asyncio.all_tasks(loop)]))
            th.join(timeout=5)

    print("\nsummary (median over passes):")
    for name, vals in results.items():
        vals = sorted(vals)
        med = vals[len(vals) // 2]
        print(f"  {name}: {med:.1f} f/s  (all: {[round(v,1) for v in vals]})")


if __name__ == "__main__":
    main()
