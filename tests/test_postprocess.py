"""Differential tests: on-device decode + soft-NMS vs the float64 oracle.

The oracle (fastdet_tpu.ops.reference_oracle) encodes the reference
algorithm's exact semantics; the JAX path must match it on candidate
sets, pick order, classes, and coordinates within f32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdet_tpu.models import yolov3
from fastdet_tpu.ops import decode, nms, postprocess, reference_oracle


def _random_heads(rng, spec, grids, scale=1.0):
    ch = spec.head_channels
    return [rng.randn(g, g, ch).astype(np.float32) * scale for g in grids]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_decode_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    spec = yolov3.get_spec("tiny", num_classes=8)
    heads = _random_heads(rng, spec, grids=[4, 8])
    threshold = 0.45

    boxes, scores, klass = decode.decode_all([jnp.asarray(h) for h in heads], spec)
    boxes, scores, klass = map(np.asarray, (boxes, scores, klass))

    oracle = reference_oracle.decode_heads_oracle(
        heads, spec.anchors, spec.num_classes, threshold, spec.image_size
    )
    keep = scores >= threshold
    assert keep.sum() == len(oracle), "candidate count mismatch"
    ours = boxes[keep], scores[keep], klass[keep]
    for i, (ok, oconf, obbox) in enumerate(oracle):
        assert ours[2][i] == ok
        np.testing.assert_allclose(ours[1][i], oconf, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(ours[0][i], obbox, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("seed", list(range(6)))
def test_full_postprocess_matches_oracle(seed):
    rng = np.random.RandomState(100 + seed)
    spec = yolov3.get_spec("tiny", num_classes=8)
    heads = _random_heads(rng, spec, grids=[4, 8])
    threshold = 0.5

    res = jax.jit(
        lambda hs, t: postprocess.postprocess_image(hs, spec, t, 256, 64)
    )([jnp.asarray(h) for h in heads], jnp.float32(threshold))
    got = postprocess.to_reference_results(res, spec.image_size)

    want = reference_oracle.detect_oracle(
        heads, spec.anchors, spec.num_classes, threshold, spec.image_size
    )
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g[0] == w[0], "class mismatch"
        np.testing.assert_allclose(g[1], w[1], rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(g[2:], w[2:], rtol=5e-4, atol=5e-3)


def test_pick_order_is_score_descending():
    rng = np.random.RandomState(7)
    spec = yolov3.get_spec("tiny", num_classes=8)
    heads = [jnp.asarray(h) for h in _random_heads(rng, spec, grids=[4, 8])]
    res = postprocess.postprocess_image(heads, spec, jnp.float32(0.4))
    n = int(res.count)
    s = np.asarray(res.scores)[:n]
    assert np.all(np.diff(s) <= 1e-7)
    # invalid slots zeroed
    assert np.all(np.asarray(res.scores)[n:] == 0)
    assert np.all(np.asarray(res.klass)[n:] == 0)


def test_nms_decay_semantics_two_boxes():
    """Hand-computed: two overlapping boxes, asymmetric overlap decay."""
    # picked box area 0.04 (0.2x0.2); second box overlaps 0.1x0.2 = 0.02
    boxes = jnp.asarray([[0.1, 0.1, 0.2, 0.2], [0.2, 0.1, 0.2, 0.2]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    klass = jnp.asarray([3, 3], jnp.int32)
    res = nms.soft_nms(boxes, scores, klass, jnp.float32(0.1), max_det=4)
    ov = 0.02 / 0.04  # = 0.5
    expect2 = 0.8 * np.exp(-3 * ov**2)
    assert int(res.count) == 2
    np.testing.assert_allclose(np.asarray(res.scores)[:2], [0.9, expect2], rtol=1e-6)


def test_nms_threshold_stop():
    """Second box decays below threshold -> dropped (reference break)."""
    boxes = jnp.asarray([[0.1, 0.1, 0.2, 0.2], [0.11, 0.1, 0.2, 0.2]], jnp.float32)
    scores = jnp.asarray([0.9, 0.5], jnp.float32)
    klass = jnp.asarray([1, 2], jnp.int32)
    # overlap = (0.19*0.2)/0.04 = 0.95 -> decay = exp(-3*0.9025) ~ 0.0667
    res = nms.soft_nms(boxes, scores, klass, jnp.float32(0.1), max_det=4)
    assert int(res.count) == 1
    assert np.asarray(res.klass)[0] == 1


def test_candidate_budget_truncates_lowest():
    rng = np.random.RandomState(3)
    n = 50
    boxes = jnp.asarray(rng.rand(n, 4).astype(np.float32) * 0.05)
    scores = jnp.asarray(np.linspace(0.2, 0.9, n).astype(np.float32))
    klass = jnp.ones((n,), jnp.int32)
    b, s, k = decode.select_candidates(boxes, scores, klass, jnp.float32(0.1), 8)
    assert s.shape == (8,)
    np.testing.assert_allclose(np.asarray(s), np.linspace(0.2, 0.9, n)[::-1][:8],
                               rtol=1e-6)


@pytest.mark.parametrize("seed,thresholds", [
    (0, [0.3, 0.5, 0.9]),     # mixed per-image thresholds
    (1, [0.99, 0.99, 0.99]),  # likely zero picks -> immediate exit
    (2, [0.01, 0.01, 0.01]),  # near-full budget -> max_det trips
])
def test_soft_nms_batch_matches_vmap(seed, thresholds):
    """The early-exiting batched NMS must be output-identical to
    vmap(soft_nms) — extra fixed-trip iterations only write invalid
    slots, so stopping early must not be observable."""
    rng = np.random.RandomState(40 + seed)
    bsz, k, max_det = 3, 64, 16
    boxes = jnp.asarray(rng.rand(bsz, k, 4).astype(np.float32) * 0.4)
    raw = rng.rand(bsz, k).astype(np.float32)
    thr = jnp.asarray(np.asarray(thresholds, np.float32))
    # mirror select_candidates' contract: sub-threshold entries masked < 0
    scores = jnp.asarray(
        np.where(raw >= np.asarray(thresholds, np.float32)[:, None], raw, -1.0)
    )
    klass = jnp.asarray(rng.randint(1, 9, size=(bsz, k)).astype(np.int32))

    got = nms.soft_nms_batch(boxes, scores, klass, thr, max_det)
    want = jax.vmap(lambda b, s, c, t: nms.soft_nms(b, s, c, t, max_det))(
        boxes, scores, klass, thr
    )
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.klass), np.asarray(want.klass))
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(want.count))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(want.boxes), rtol=0, atol=0)


@pytest.mark.slow
def test_batch_vmap_consistency():
    rng = np.random.RandomState(11)
    spec = yolov3.get_spec("tiny", num_classes=8)
    batch_heads = [
        jnp.asarray(rng.randn(3, g, g, spec.head_channels).astype(np.float32))
        for g in [4, 8]
    ]
    res = postprocess.postprocess_batch(batch_heads, spec, jnp.float32(0.5), 128, 32)
    for i in range(3):
        single = postprocess.postprocess_image(
            [h[i] for h in batch_heads], spec, jnp.float32(0.5), 128, 32
        )
        np.testing.assert_allclose(
            np.asarray(res.scores[i]), np.asarray(single.scores), rtol=1e-6
        )
        assert int(res.count[i]) == int(single.count)
