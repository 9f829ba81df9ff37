#!/usr/bin/env python
"""Train the shape detectors that prove end-to-end detection.

VERDICT round 2, directive #1: the framework had never detected a real
object (no egress for public YOLOv3 weights — tools/fetch_weights.py
fails DNS). This closes the gap with first-party evidence: yolov3-tiny
(num_classes=3) trained from scratch with the project's own training
subsystem (fastdet_tpu.parallel.train) on procedurally generated scenes
with exact ground truth (fastdet_tpu.data.synth), until HELD-OUT frames
localize their planted objects.

Round 4 (VERDICT r3 #1) extends the same trainer to ``--arch full``:
the flagship Darknet-53 3-scale architecture — the one behind the
reference's primary registry entry ``full:80``
(/root/reference/server/server.py:353-358) and every headline bench —
trained on the 9-class shape world so the full arch demonstrably
*detects*, not just runs synthetic weights.

Seed plan (disjoint by construction, documented for the tests):
  train      seeds 1000 .. 1000+n_train-1
  validation seeds 20000 .. 20000+n_val-1
  test       seeds 30000+   (tests/test_trained_detector.py ONLY)

The dataset lives RESIDENT ON DEVICE (uint8 images + prebuilt dense
targets); each step ships only a batch-index vector, so the tunneled
host->device link (~15-25 MB/s, docs/ROUND7.md) costs one upload total
instead of one batch per step.

Output: weights/detect3_tiny.npz (float16 storage, ~17 MB) + a sidecar
.json with the final held-out metrics.

Usage: python tools/train_detect3.py [--steps 3000] [--batch 16]
           [--n-train 384] [--n-val 64] [--out weights/detect3_tiny.npz]
"""

import argparse
import functools
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EVAL_THR = 0.3


def load_or_make(split: str, seeds, cache_dir="/tmp/fastdet_shapes",
                 num_classes: int = 3, jpeg_q: int = 0,
                 max_objects: int = 3):
    """Generate (or load cached) scenes + targets for a seed range.

    ``jpeg_q`` > 0 round-trips each scene through JPEG at that quality:
    serving traffic is JPEG (the engine ingests q~90 re-encodes), and a
    model trained on raw pixels loses measurable recall to compression
    artifacts it never saw (r4: 13/16 vs 15/16 held-out frames). Ground
    truth is unchanged — the boxes describe the same objects."""
    from fastdet_tpu.data import synth

    os.makedirs(cache_dir, exist_ok=True)
    tag = "" if num_classes == 3 else f":c{num_classes}"
    if jpeg_q:
        tag += f":q{jpeg_q}"
    if max_objects != 3:
        tag += f":m{max_objects}"
    key = hashlib.sha1(
        ("v1" + tag + ":" + split + ":" + ",".join(map(str, seeds))).encode()
    ).hexdigest()[:16]
    path = os.path.join(cache_dir, f"{split}_{key}.npz")
    if os.path.exists(path):
        with np.load(path, allow_pickle=True) as z:
            return z["imgs"], list(z["boxes"]), list(z["labels"])
    t0 = time.time()
    imgs, boxes, labels = synth.make_dataset(
        seeds, num_classes=num_classes, max_objects=max_objects)
    if jpeg_q:
        from fastdet_tpu.runtime import jpeg as jpeg_mod

        imgs = np.stack([
            jpeg_mod.decode_rgb(jpeg_mod.encode_rgb(im, quality=jpeg_q))
            for im in imgs])
    np.savez(path, imgs=imgs,
             boxes=np.asarray(boxes, dtype=object),
             labels=np.asarray(labels, dtype=object))
    print(f"[data] {split}: {len(seeds)} scenes in {time.time()-t0:.1f}s")
    return imgs, boxes, labels


def evaluate(res_np, boxes, labels, size):
    """Frame-level scores from a device-fetched NMSResult batch."""
    from fastdet_tpu.data import synth
    from fastdet_tpu.ops.postprocess import to_reference_results

    loc_ok = strict_ok = 0
    total_fp = 0
    n = len(boxes)
    for i in range(n):
        one = type(res_np)(*[a[i] for a in res_np])
        dets = to_reference_results(one, size)
        m, t, fp = synth.match_detections(dets, boxes[i], labels[i], size)
        loc_ok += m == t
        strict_ok += (m == t) and fp == 0
        total_fp += fp
    return loc_ok / n, strict_ok / n, total_fp / n


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-train", type=int, default=384)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--target-strict", type=float, default=0.97,
                    help="early-stop when held-out strict success passes this")
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"),
                    help="train compute dtype (f32 dodges a remote-"
                         "compiler crash on the 9-class bf16 backward)")
    ap.add_argument("--classes", type=int, default=3, choices=(3, 9, 80),
                    help="shape classes: 3 (disc/box/tri), the 9-class "
                         "palette (the rsu:9 analog), or the 80-class "
                         "hue-x-shape palette (the full:80 analog)")
    ap.add_argument("--arch", default="tiny", choices=("tiny", "full"),
                    help="tiny (2-scale) or the flagship Darknet-53 "
                         "full (3-scale)")
    ap.add_argument("--eval-chunk", type=int, default=32,
                    help="eval forward batch size (full at b96 would "
                         "spike peak activation memory)")
    ap.add_argument("--init-from", default=None,
                    help="resume/fine-tune from an existing .npz "
                         "checkpoint instead of random init")
    ap.add_argument("--max-objects", type=int, default=3,
                    help="objects per scene cap; >3 trains crowded "
                         "scenes (multi-object recall was the held-out "
                         "failure mode, r4)")
    ap.add_argument("--sparse-targets", action="store_true",
                    help="slot-row targets + on-device flips (automatic "
                         "for --classes 80)")
    ap.add_argument("--jpeg-q", type=int, default=0,
                    help="round-trip train/val scenes through JPEG at "
                         "this quality (0 = raw pixels) to match the "
                         "serving traffic domain")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv[1:])
    if args.out is None:
        args.out = f"weights/detect{args.classes}_{args.arch}.npz"

    import jax
    import jax.numpy as jnp
    import optax

    from fastdet_tpu.models import weights as weights_io
    from fastdet_tpu.models import yolov3
    from fastdet_tpu.ops.postprocess import postprocess_batch
    from fastdet_tpu.parallel import train as train_lib

    print("[env] devices:", jax.devices())
    spec = yolov3.get_spec(args.arch, args.classes)
    n_scales = spec.num_outputs
    size = spec.image_size

    # Disjoint seed plans per class count (3-class documented in the
    # module docstring; 9-class: train 100000+, val 120000+, test
    # 130000+ reserved for tests; 80-class: train 200000+, val 220000+,
    # test 230000+ reserved for tests)
    tr_base, va_base = {3: (1000, 20000), 9: (100000, 120000),
                        80: (200000, 220000)}[args.classes]
    tr_imgs, tr_boxes, tr_labels = load_or_make(
        "train", range(tr_base, tr_base + args.n_train),
        num_classes=args.classes, jpeg_q=args.jpeg_q,
        max_objects=args.max_objects)
    va_imgs, va_boxes, va_labels = load_or_make(
        "val", range(va_base, va_base + args.n_val),
        num_classes=args.classes, jpeg_q=args.jpeg_q,
        max_objects=args.max_objects)

    # Targets. Two regimes:
    # - SPARSE (classes=80, or --sparse-targets): (N, M, 9) slot rows
    #   (train_lib.build_sparse_targets) with flips applied ON DEVICE as
    #   an O(slots) index transform (flip_slots). Dense 85-channel
    #   planes x 4 flip variants would be tens of GB resident; slots
    #   are ~2 MB. Equivalence to the dense loss is pinned by
    #   tests/test_train.py::test_sparse_loss_matches_dense.
    # - DENSE (3/9-class legacy): all four flip variants prebuilt.
    #   (Transposes would also be free for images but swap box w/h,
    #   which changes anchor assignment — not worth the asymmetry.)
    t0 = time.time()
    use_sparse = args.classes == 80 or args.sparse_targets
    grids = yolov3.head_grid_sizes(spec)
    if use_sparse:
        tr_slots = train_lib.build_sparse_targets(spec, tr_boxes, tr_labels)
        print(f"[data] sparse targets built in {time.time()-t0:.1f}s "
              f"shape={tr_slots.shape}")
    else:
        variants = []
        for f in range(4):
            boxes_f = []
            for b in tr_boxes:
                b = b.copy()
                if f & 1:
                    b[:, 0] = 1.0 - b[:, 0]
                if f & 2:
                    b[:, 1] = 1.0 - b[:, 1]
                boxes_f.append(b)
            variants.append(train_lib.build_targets(spec, boxes_f, tr_labels))
        # FLATTENED (4*N, g, g, 3, 5+C) with index flip*N+i — a double-
        # axis t[flip, idx] gather on the 14-channel 9-class targets
        # reliably crashes the remote XLA compiler helper (HTTP 500,
        # 3/3 attempts; single-axis take compiles fine and is the same
        # math). Full-arch targets (3 scales incl. 52x52) are ~4x
        # tiny's — stored float16 on device (offsets/log-ratios are
        # O(1); f16's 1e-3 rounding is far under the loss's useful
        # resolution) and cast back to f32 inside the step.
        tgt_store = np.float16 if args.arch == "full" else np.float32
        tgts = [np.concatenate([v[s] for v in variants]).astype(tgt_store)
                for s in range(n_scales)]
        print(f"[data] flip-variant targets built in {time.time()-t0:.1f}s "
              f"shapes={[t.shape for t in tgts]} store={tgt_store.__name__}")

    t0 = time.time()
    data = jax.device_put(tr_imgs)
    if use_sparse:
        dev_tgts = (jax.device_put(tr_slots),)
    else:
        dev_tgts = tuple(jax.device_put(t) for t in tgts)
    val = jax.device_put(va_imgs)
    jax.block_until_ready((data, dev_tgts, val))
    print(f"[h2d] dataset resident in {time.time()-t0:.1f}s")

    warmup = min(100, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.05)
    opt = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(sched, weight_decay=5e-4,
                    mask=train_lib._decay_mask),
    )
    if args.init_from:
        spec_ck, params = weights_io.load_npz(args.init_from)
        assert (spec_ck.name, spec_ck.num_classes) == \
            (spec.name, spec.num_classes), "checkpoint arch mismatch"
        print(f"[init] resumed from {args.init_from}")
    else:
        params = weights_io.synthetic_params(spec, seed=42)
    state = train_lib.init_train_state(spec, params, opt)
    base_step = train_lib.make_train_step(
        spec, opt,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
        sparse=use_sparse)

    # The resident dataset arrays are jit ARGUMENTS, not closure
    # captures (a closed-over ~200 MB array would be embedded in the
    # traced program), and the state is NOT donated: on this tunneled
    # backend a donated first execution wedged indefinitely (observed
    # twice, >25 min; identical program without donation runs in 15 s
    # and 0.03 s/step after). Three live copies of an 8.6M-param state
    # are noise next to 16 GB HBM.
    @jax.jit
    def step(st, data_, tgts_, idx, flip, cj_scale, cj_off, key):
        imgs = jnp.take(data_, idx, axis=0).astype(jnp.float32) / 255.0
        fh = (flip & 1).astype(bool)
        fv = ((flip >> 1) & 1).astype(bool)
        imgs = jnp.where(fh[:, None, None, None], imgs[:, :, ::-1, :], imgs)
        imgs = jnp.where(fv[:, None, None, None], imgs[:, ::-1, :, :], imgs)
        # photometric jitter + sensor noise: the held-out recall gap was
        # objectness failing on unseen color/background combinations
        imgs = imgs * cj_scale[:, None, None, :] + cj_off[:, None, None, :]
        imgs = imgs + jax.random.normal(key, imgs.shape) * 0.02
        imgs = jnp.clip(imgs, 0.0, 1.0)
        if use_sparse:
            slots = jnp.take(tgts_[0], idx, axis=0)
            picked = (train_lib.flip_slots(slots, fh, fv, grids),)
        else:
            fi = flip * data_.shape[0] + idx
            picked = tuple(jnp.take(t, fi, axis=0).astype(jnp.float32)
                           for t in tgts_)
        return base_step(st, imgs, *picked)

    @jax.jit
    def eval_fn(params, val_):
        x = val_.astype(jnp.float32) / 255.0
        heads = yolov3.apply(spec, yolov3.fold_params(spec, params), x,
                             train=False, compute_dtype=jnp.bfloat16)
        return postprocess_batch(heads, spec, jnp.float32(EVAL_THR))

    def eval_chunked(params, val_):
        """device_get'd NMSResult over the val set, in eval-chunk slices
        (one compile per distinct chunk shape; full at one b96 forward
        would spike peak activation memory on the training HBM)."""
        outs = []
        n = val_.shape[0]
        cs = args.eval_chunk
        for lo in range(0, n - n % cs, cs):
            outs.append(jax.device_get(eval_fn(params, val_[lo:lo + cs])))
        if n % cs:
            outs.append(jax.device_get(eval_fn(params, val_[n - n % cs:])))
        return type(outs[0])(*[np.concatenate(cols)
                               for cols in zip(*outs)])

    rng = np.random.RandomState(7)
    t_start = time.time()
    best = (-1.0, -1.0)
    history = []
    key0 = jax.random.PRNGKey(11)
    for s in range(1, args.steps + 1):
        idx = rng.randint(len(tr_imgs), size=args.batch).astype(np.int32)
        flip = rng.randint(4, size=args.batch).astype(np.int32)
        if args.classes == 80:
            # hue is HALF the class identity in the 80-class world —
            # channel-independent jitter would relabel objects. Jitter
            # brightness/contrast only (shared across channels).
            cj_s = np.repeat(rng.uniform(0.8, 1.2, (args.batch, 1)),
                             3, 1).astype(np.float32)
            cj_o = np.repeat(rng.uniform(-0.10, 0.10, (args.batch, 1)),
                             3, 1).astype(np.float32)
        else:
            cj_s = rng.uniform(0.75, 1.25, (args.batch, 3)).astype(np.float32)
            cj_o = rng.uniform(-0.12, 0.12, (args.batch, 3)).astype(np.float32)
        state, metrics = step(state, data, dev_tgts, idx, flip, cj_s, cj_o,
                              jax.random.fold_in(key0, s))
        if s % 50 == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"[step {s:5d}] loss={m['loss']:9.3f} "
                  f"coord={m['coord']:8.3f} obj={m['obj']:8.3f} "
                  f"cls={m['cls']:7.3f} "
                  f"({(time.time()-t_start)/s*1e3:.0f} ms/step)")
        if s % args.eval_every == 0 or s == args.steps:
            res = eval_chunked(state.params, val)
            loc, strict, fp = evaluate(res, va_boxes, va_labels, size)
            print(f"[eval {s:5d}] held-out: localize={loc:.3f} "
                  f"strict={strict:.3f} fp/frame={fp:.2f}")
            history.append({"step": s, "localize": loc,
                            "strict": strict, "fp_per_frame": fp})
            if (strict, loc) > best:
                best = (strict, loc)
                os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
                weights_io.save_npz(
                    args.out, spec, jax.device_get(state.params),
                    dtype=np.float16)
                print(f"[ckpt] saved {args.out} "
                      f"({os.path.getsize(args.out)/1e6:.1f} MB)")
            if strict >= args.target_strict:
                print(f"[done] target reached at step {s}")
                break

    from fastdet_tpu.data import synth as synth_mod

    meta = {
        "arch": args.arch, "num_classes": args.classes,
        "classes": list({3: synth_mod.SHAPE_CLASSES,
                         9: synth_mod.SHAPE_CLASSES_9,
                         80: synth_mod.SHAPE_CLASSES_80}[args.classes]),
        "max_objects": args.max_objects,
        "jpeg_q": args.jpeg_q,
        "train_seeds": [tr_base, tr_base + args.n_train],
        "val_seeds": [va_base, va_base + args.n_val],
        "steps_run": history[-1]["step"] if history else 0,
        "batch": args.batch,
        "final_eval": history[-1] if history else None,
        "best_strict": best[0], "best_localize": best[1],
        "history": history,
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(os.path.splitext(args.out)[0] + ".json", "w") as fp:
        json.dump(meta, fp, indent=1)
    print(f"[meta] {json.dumps(meta['final_eval'])}")
    print(f"[total] {time.time()-t_start:.0f}s")


if __name__ == "__main__":
    main(sys.argv)
