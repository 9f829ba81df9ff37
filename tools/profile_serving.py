#!/usr/bin/env python
"""Decompose the serving-vs-batched throughput gap on the live device.

The bench records a batched engine-only number (threaded producer,
16-frame buckets) and a multiclient serving number (8 protocol clients
through the asyncio server). This tool measures the layers between the
two on the SAME warmed engine so the gap can be attributed:

  A. engine batched   — bench.batched_fps methodology (the ceiling)
  B. service direct   — ModelService.submit_nowait from inside the
                        event loop: batcher + executor hops, no sockets
  C. sockets          — full DetectionServer + N in-process DetectClient
                        threads (the bench multiclient methodology)

Each phase reports f/s and (B/C) the realized average batch, which
separates "the batcher can't fill buckets" (supply) from "the asyncio
layer burns CPU per frame" (overhead). --clients/--window vary the
phase-C load shape; --profile wraps the event-loop thread in cProfile
during phase C and prints the top loop-side costs.

Usage: python tools/profile_serving.py [--frames 384] [--clients 8]
       [--window 4] [--profile]
"""

import argparse
import asyncio
import cProfile
import os
import pstats
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_engine():
    sys.path.insert(0, REPO)
    import bench
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, params, kind = bench.load_bench_model("full", 80)
    eng = DetectionEngine(spec, params, mode="int8", buckets=(1, 8, 16),
                          calibration_images=bench.bench_calibration())
    t0 = time.time()
    eng.warmup()
    print(f"warmup: {time.time() - t0:.1f}s (weights={kind})")
    return eng


def phase_a(eng, frames):
    import bench

    jpegs = bench.make_jpegs(16)
    bsz = eng.max_batch

    def submit(i):
        bj = [jpegs[(i * bsz + j) % len(jpegs)] for j in range(bsz)]
        res = (eng.detect_async_sparse(bj, [0.3] * bsz)
               or eng.detect_async_planes(bj, [0.3] * bsz))
        assert res is not None
        return res

    bench._threaded_fps(eng, submit, max(1, 32 // bsz), bsz, 3)  # warm
    fps = bench._threaded_fps(eng, submit, frames // bsz, bsz, 3)
    print(f"A engine batched   : {fps:7.1f} f/s  (bucket={bsz}, inflight=3)")
    return fps


def _run_loop_thread(coro_factory, profile=False):
    """Run an asyncio loop on a fresh thread; return (loop, thread, profiler)."""
    loop = asyncio.new_event_loop()
    prof = cProfile.Profile() if profile else None

    def runner():
        asyncio.set_event_loop(loop)
        if prof is not None:
            prof.enable()
        loop.run_forever()
        if prof is not None:
            prof.disable()

    th = threading.Thread(target=runner, daemon=True)
    th.start()
    return loop, th, prof


def phase_b(eng, frames, outstanding):
    """ModelService fed directly via submit_nowait (no sockets)."""
    from fastdet_tpu.runtime.server import ModelService
    import bench

    jpegs = bench.make_jpegs(16)
    svc = ModelService(eng, name="direct")
    loop, th, _ = _run_loop_thread(None)

    async def drive():
        svc.start()
        thr = 0.3
        sem = asyncio.Semaphore(outstanding)
        done = 0

        async def one(i):
            nonlocal done
            await svc.submit(jpegs[i % len(jpegs)], thr)
            done += 1
            sem.release()

        # warm pass
        for i in range(outstanding):
            await svc.submit(jpegs[i % len(jpegs)], thr)
        b0, f0 = svc.batches, svc.frames
        t0 = time.time()
        tasks = []
        for i in range(frames):
            await sem.acquire()
            tasks.append(asyncio.ensure_future(one(i)))
        await asyncio.gather(*tasks)
        wall = time.time() - t0
        ab = (svc.frames - f0) / max(1, svc.batches - b0)
        svc.stop()
        return frames / wall, ab

    fut = asyncio.run_coroutine_threadsafe(drive(), loop)
    fps, ab = fut.result(timeout=600)
    loop.call_soon_threadsafe(loop.stop)
    th.join(timeout=5)
    print(f"B service direct   : {fps:7.1f} f/s  (outstanding={outstanding}, avg_batch={ab:.2f})")
    return fps


def phase_c(eng, frames, n_clients, window, profile=False):
    from fastdet_tpu.runtime.client import DetectClient
    from fastdet_tpu.runtime.server import DetectionServer, ModelService
    import bench

    jpegs = bench.make_jpegs(16)
    svc = ModelService(eng, name="full")
    server = DetectionServer({"full": svc}, port=0, host="127.0.0.1")
    loop, th, prof = _run_loop_thread(None, profile=profile)

    async def start_server():
        await server.serve()

    asyncio.run_coroutine_threadsafe(start_server(), loop)
    while server.bound_port is None:
        time.sleep(0.01)

    per_client = frames // n_clients
    errs = []

    def client_task(ci, n_frames):
        try:
            c = DetectClient("127.0.0.1", server.bound_port, "full")
            c.open()
            sent = done = 0
            last = time.time()
            while done < n_frames:
                while sent - done < window and sent < n_frames:
                    sent += 1
                    c.request(sent, 0.3, jpegs[(ci + sent) % len(jpegs)])
                c.poll(0.02)
                adv = False
                while (done + 1) in c.responses:
                    done += 1
                    c.responses.pop(done)
                    adv = True
                if adv:
                    last = time.time()
                elif time.time() - last > 30:
                    raise RuntimeError(f"client {ci} stalled at {done}")
            c.close()
        except Exception as e:
            errs.append(repr(e))

    for phase, n in (("warm", 12), ("timed", per_client)):
        b0, f0 = svc.batches, svc.frames
        t0 = time.time()
        ts = [threading.Thread(target=client_task, args=(i, n))
              for i in range(n_clients)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.time() - t0
    ab = (svc.frames - f0) / max(1, svc.batches - b0)
    fps = n_clients * per_client / wall
    print(f"C sockets          : {fps:7.1f} f/s  (clients={n_clients}, window={window}, "
          f"avg_batch={ab:.2f}, errors={errs})")

    loop.call_soon_threadsafe(
        lambda: (server.request_shutdown(),
                 [t.cancel() for t in asyncio.all_tasks(loop)]))
    time.sleep(0.3)
    loop.call_soon_threadsafe(loop.stop)
    th.join(timeout=5)
    if prof is not None:
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        print("\n--- event-loop thread profile (top 25 by cumulative) ---")
        st.print_stats(25)
    return fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--profile", action="store_true",
                    help="cProfile the event-loop thread during phase C")
    ap.add_argument("--phases", default="abc",
                    help="subset of phases to run, e.g. 'c'")
    args = ap.parse_args()

    eng = build_engine()
    if "a" in args.phases:
        phase_a(eng, args.frames)
    if "b" in args.phases:
        phase_b(eng, args.frames, outstanding=args.clients * args.window)
    if "c" in args.phases:
        phase_c(eng, args.frames, args.clients, args.window,
                profile=args.profile)


if __name__ == "__main__":
    main()
