"""Checkpoint/resume + BN-EMA tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdet_tpu.models import weights, yolov3
from fastdet_tpu.parallel import checkpoint, train


def _small_spec(num_classes=4, image_size=64):
    s = yolov3.yolov3_tiny_spec(num_classes)
    return yolov3.ModelSpec(s.name, s.num_classes, s.layers, s.anchors,
                            image_size=image_size)


def _one_batch(spec, b=2, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(b, spec.image_size, spec.image_size, 3)
                         .astype(np.float32))
    boxes = [np.array([[0.5, 0.5, 0.4, 0.4]], np.float32)] * b
    labels = [np.array([0])] * b
    targets = [jnp.asarray(t) for t in train.build_targets(spec, boxes, labels)]
    return images, targets


@pytest.mark.slow
def test_bn_running_stats_updated_by_training():
    spec = _small_spec()
    params = weights.synthetic_params(spec, seed=1)
    optimizer = train.make_optimizer(1e-3)
    state = train.init_train_state(spec, params, optimizer)
    step = jax.jit(train.make_train_step(spec, optimizer))
    images, targets = _one_batch(spec)
    before = np.asarray(params["conv0"]["bn"]["mean"])
    state, _ = step(state, images, *targets)
    after = np.asarray(state.params["conv0"]["bn"]["mean"])
    assert not np.allclose(before, after)
    # the exact EMA contract, checked against an INDEPENDENTLY computed
    # batch statistic: new = m*old + (1-m)*batch_mean(conv0 output).
    # (A momentum bug jumping 100% of the way — or updating from the
    # wrong tensor — fails here; 'mean changed at all' would not.)
    from fastdet_tpu.models import layers as L

    conv0 = [l for l in spec.layers if isinstance(l, yolov3.Conv)][0]
    y = L.conv2d(images, params["conv0"]["w"], conv0.stride)
    batch_mean = np.asarray(y.mean(axis=(0, 1, 2)))
    expected = (train.BN_MOMENTUM * before
                + (1 - train.BN_MOMENTUM) * batch_mean)
    np.testing.assert_allclose(after, expected, rtol=1e-4, atol=1e-5)


def test_weight_decay_excludes_bn_and_bias():
    spec = _small_spec()
    params = weights.synthetic_params(spec, seed=2)
    mask = train._decay_mask(params)
    assert mask["conv0"]["w"] is True
    assert all(v is False for v in mask["conv0"]["bn"].values())
    # head conv bias excluded
    head = [l.name for l in spec.layers
            if isinstance(l, yolov3.Conv) and not l.bn][0]
    assert mask[head]["b"] is False


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    spec = _small_spec()
    params = weights.synthetic_params(spec, seed=3)
    optimizer = train.make_optimizer(1e-3)
    state = train.init_train_state(spec, params, optimizer)
    step = jax.jit(train.make_train_step(spec, optimizer))
    images, targets = _one_batch(spec)
    state, m1 = step(state, images, *targets)

    ckpt_path = str(tmp_path / "ckpt")
    checkpoint.save(ckpt_path, state)

    template = train.init_train_state(spec, weights.synthetic_params(spec, 99),
                                      optimizer)
    restored = checkpoint.restore(ckpt_path, template)
    assert int(np.asarray(restored.step)) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues deterministically vs uninterrupted run
    s_cont, m2a = step(restored, images, *targets)
    s_ref, m2b = step(state, images, *targets)
    np.testing.assert_allclose(float(m2a["loss"]), float(m2b["loss"]), rtol=1e-6)


def test_export_inference_servable(tmp_path):
    spec = _small_spec()
    params = weights.synthetic_params(spec, seed=4)
    optimizer = train.make_optimizer(1e-3)
    state = train.init_train_state(spec, params, optimizer)
    out = str(tmp_path / "trained.npz")
    checkpoint.export_inference(out, spec, state)
    spec2, params2 = weights.load_model(out)
    assert spec2.num_classes == spec.num_classes
    folded = yolov3.fold_params(spec2, params2)
    heads = yolov3.apply(spec2, folded, jnp.zeros((1, 64, 64, 3)))
    assert len(heads) == 2


def test_cached_import(tmp_path):
    spec = yolov3.yolov3_tiny_spec(4)
    p = str(tmp_path / "m.weights")
    weights.save_darknet(p, spec, weights.synthetic_params(spec))
    spec1, params1 = checkpoint.cached_import(p, arch="tiny", num_classes=4)
    import os
    assert os.path.exists(p + ".npz")
    spec2, params2 = checkpoint.cached_import(p, arch="tiny", num_classes=4)
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
