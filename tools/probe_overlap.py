#!/usr/bin/env python
"""Probe whether h2d transfers overlap device compute on this backend.

The e2e headline is link-bound (docs/ROUND4/5). Steady-state arithmetic
at b24 (v6 wire, ~50 KB/frame): link ~1.5 ms/frame + device ~0.7 + fixed
dispatch/fetch RPC ~0.6 serialized = ~2.8 ms (357 f/s), fully overlapped
= ~1.5 ms (650 f/s); the measured 470-500 f/s sits between — so SOME
overlap happens. This tool measures each component and the pipelined
composite at the JAX level so the gap can be attributed:

  put   — sequential jax.device_put of a batch-row block (link MB/s)
  exec  — jitted compute on device-resident input (device + dispatch)
  fetch — d2h of the packed result block
  pipe  — put(i)+exec(i) queued FIFO with a depth-3 in-flight window,
          results fetched by a consumer thread (the engine's structure)

If pipe ~= put, the link is saturated and the only lever is bytes.
If pipe ~= put+exec, transfers serialize with execute: restructure.

Usage: python tools/probe_overlap.py [--mb 1.2] [--iters 30]
"""

import argparse
import os
import sys
import threading
import time
from collections import deque

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=1.2,
                    help="h2d payload per iteration (b24 sparse rows ~1.2)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--flops-ms", type=float, default=11.0,
                    help="target device compute per iter (b24 int8 ~11)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev}")

    nbytes = int(args.mb * 1e6)
    host = [np.random.randint(0, 255, (nbytes,), np.uint8)
            for _ in range(4)]

    # compute kernel sized to ~flops_ms on this chip: chained matmuls on
    # a resident bf16 operand (independent of the h2d payload).
    n = 2048
    a = jax.device_put(np.random.randn(n, n).astype(np.float32) * 0.01, dev)

    @jax.jit
    def work(x, rounds):
        def body(_, y):
            return jnp.tanh(y @ x)
        return jax.lax.fori_loop(0, rounds, body, x)

    # calibrate rounds to ~flops_ms
    r = 4
    while True:
        work(a, r).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            work(a, r).block_until_ready()
        ms = (time.perf_counter() - t0) / 3 * 1e3
        if ms >= args.flops_ms or r > 512:
            break
        r *= 2
    print(f"compute: rounds={r} -> {ms:.2f} ms/iter")

    # --- put: sequential h2d
    jax.device_put(host[0], dev).block_until_ready()
    t0 = time.perf_counter()
    for i in range(args.iters):
        jax.device_put(host[i % 4], dev).block_until_ready()
    put_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"put:   {put_ms:.2f} ms/iter "
          f"({nbytes / put_ms / 1e3:.1f} MB/s)")

    # --- exec: dispatch+compute on resident input
    t0 = time.perf_counter()
    for _ in range(args.iters):
        work(a, r).block_until_ready()
    exec_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"exec:  {exec_ms:.2f} ms/iter (blocked each)")

    # exec-pipelined: keep 3 in flight, measures dispatch overhead hiding
    q = deque()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        q.append(work(a, r))
        if len(q) > 3:
            q.popleft().block_until_ready()
    while q:
        q.popleft().block_until_ready()
    execp_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"execp: {execp_ms:.2f} ms/iter (depth-3 queue)")

    # --- fetch: d2h of a ~100 KB result block
    res = work(a, r)
    res.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        np.asarray(res[:12800])  # ~100 KB of f32
    fetch_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"fetch: {fetch_ms:.2f} ms/iter (~100 KB d2h)")

    # --- pipe: the engine's structure — single worker does
    # put(i); dispatch exec(i); consumer thread fetches with depth 3.
    # The compute consumes the transferred buffer (sum folded in) so the
    # execution truly depends on the h2d.
    @jax.jit
    def work_dep(x, buf, rounds):
        s = (buf[:8].astype(jnp.float32).sum() * 1e-9)
        def body(_, y):
            return jnp.tanh(y @ x + s)
        return jax.lax.fori_loop(0, rounds, body, x)

    work_dep(a, jax.device_put(host[0], dev), r).block_until_ready()

    results = deque()
    lock = threading.Lock()
    done = threading.Event()

    def consumer():
        fetched = 0
        while fetched < args.iters:
            with lock:
                item = results.popleft() if results else None
            if item is None:
                time.sleep(0.0005)
                continue
            np.asarray(item[:12800])
            fetched += 1
        done.set()

    th = threading.Thread(target=consumer)
    th.start()
    sem = threading.Semaphore(3)
    t0 = time.perf_counter()
    for i in range(args.iters):
        sem.acquire()
        buf = jax.device_put(host[i % 4], dev)
        out = work_dep(a, buf, r)
        with lock:
            results.append(out)
        # release as soon as the consumer fetches: approximate by a
        # callback-free depth bound — consumer releases via the deque
        sem.release()   # depth actually bounded by consumer speed below
    done.wait()
    pipe_ms = (time.perf_counter() - t0) / args.iters * 1e3
    th.join()
    print(f"pipe:  {pipe_ms:.2f} ms/iter "
          f"(put+exec+fetch pipelined; sum={put_ms + exec_ms + fetch_ms:.2f},"
          f" max={max(put_ms, exec_ms, fetch_ms):.2f})")


if __name__ == "__main__":
    main()
