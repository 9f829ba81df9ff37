"""Model zoo tests: architecture fidelity, weight IO, numeric cross-checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdet_tpu.models import layers, weights, yolov3


def _num_floats(spec):
    """Total float32 count of a Darknet .weights body for this spec."""
    n = 0
    in_ch = 3
    channels = []
    for l in spec.layers:
        if isinstance(l, yolov3.Conv):
            n += l.filters * (4 if l.bn else 1)
            n += l.filters * in_ch * l.ksize * l.ksize
            in_ch = l.filters
        elif isinstance(l, yolov3.Route):
            in_ch = sum(channels[i] for i in l.sources)
        channels.append(in_ch)
    return n


def test_darknet_float_counts_match_published_files():
    """The public yolov3-tiny.weights is 35,434,956 bytes and yolov3.weights
    is 248,007,048 bytes — both are 20-byte header + float32 body. Matching
    these counts pins our layer specs to the exact published architecture.
    """
    assert 20 + 4 * _num_floats(yolov3.yolov3_tiny_spec(80)) == 35434956
    assert 20 + 4 * _num_floats(yolov3.yolov3_spec(80)) == 248007048


def test_head_channels_scale_with_classes():
    spec9 = yolov3.yolov3_spec(9)
    assert spec9.head_channels == 3 * (5 + 9) == 42
    assert yolov3.yolov3_tiny_spec(80).head_channels == 255


@pytest.mark.parametrize("arch,n_heads", [("tiny", 2), ("full", 3)])
def test_forward_shapes(arch, n_heads):
    # 96px keeps the CPU test fast; grids must still halve 32/16/8.
    spec = yolov3.get_spec(arch, num_classes=7)
    params = yolov3.fold_params(spec, weights.synthetic_params(spec))
    x = jnp.zeros((2, 96, 96, 3), jnp.float32)
    heads = yolov3.apply(spec, params, x)
    assert len(heads) == n_heads
    for i, h in enumerate(heads):
        g = 96 // (32 >> i)
        assert h.shape == (2, g, g, 3 * (5 + 7))
        assert h.dtype == jnp.float32


@pytest.mark.slow
def test_forward_bf16_close_to_f32():
    spec = yolov3.get_spec("tiny", 80)
    params = yolov3.fold_params(spec, weights.synthetic_params(spec))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))
    h32 = yolov3.apply(spec, params, x)[0]
    h16 = yolov3.apply(spec, params, x, compute_dtype=jnp.bfloat16)[0]
    # bf16 has ~3 decimal digits; activations are O(1) post-BN-fold
    assert float(jnp.max(jnp.abs(h32 - h16))) < 0.15 * float(jnp.max(jnp.abs(h32)) + 1)


def test_darknet_roundtrip(tmp_path):
    spec = yolov3.yolov3_tiny_spec(num_classes=4)
    params = weights.synthetic_params(spec, seed=3)
    path = str(tmp_path / "t.weights")
    weights.save_darknet(path, spec, params)
    back = weights.load_darknet(path, spec)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_darknet_wrong_arch_rejected(tmp_path):
    spec = yolov3.yolov3_tiny_spec(4)
    path = str(tmp_path / "t.weights")
    weights.save_darknet(path, spec, weights.synthetic_params(spec))
    with pytest.raises(ValueError):
        weights.load_darknet(path, yolov3.yolov3_tiny_spec(80))


def test_npz_roundtrip(tmp_path):
    spec = yolov3.yolov3_tiny_spec(num_classes=9)
    params = weights.synthetic_params(spec, seed=5)
    path = str(tmp_path / "m.npz")
    weights.save_npz(path, spec, params)
    spec2, back = weights.load_npz(path)
    assert spec2.name == spec.name and spec2.num_classes == 9
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_model_dispatch(tmp_path):
    spec, params = weights.load_model("synthetic:tiny", num_classes=9)
    assert spec.name == "yolov3-tiny" and spec.num_classes == 9
    # .onnx is now a supported format (tests/test_onnx_io.py); a missing
    # file surfaces as FileNotFoundError, not "unsupported"
    with pytest.raises(FileNotFoundError):
        weights.load_model("model.onnx")
    with pytest.raises(ValueError):
        weights.load_model("model.tflite")
    # auto-arch darknet load
    p = str(tmp_path / "auto.weights")
    weights.save_darknet(p, yolov3.yolov3_tiny_spec(80), weights.synthetic_params(yolov3.yolov3_tiny_spec(80)))
    spec2, _ = weights.load_model(p, num_classes=80)
    assert spec2.name == "yolov3-tiny"


# ---------------------------------------------------------------------------
# Numeric cross-checks against torch CPU (independent implementation)
# ---------------------------------------------------------------------------

def test_conv_block_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 17, 17, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1
    b = rng.randn(16).astype(np.float32)

    for stride in (1, 2):
        ours = layers.conv_block({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                 jnp.asarray(x), stride=stride)
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tw = torch.from_numpy(w.transpose(3, 2, 0, 1))
        ty = F.conv2d(tx, tw, torch.from_numpy(b), stride=stride, padding=1)
        ty = F.leaky_relu(ty, 0.1).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ty, rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(1, 26, 26, 4).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    ours = layers.maxpool2d(jnp.asarray(x), 2, 2)
    ty = F.max_pool2d(tx, 2, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(ours), ty)

    # Darknet size-2/stride-1 pool pads (0,1) right/bottom
    ours = layers.maxpool2d(jnp.asarray(x), 2, 1)
    tpad = F.pad(tx, (0, 1, 0, 1), value=float("-inf"))
    ty = F.max_pool2d(tpad, 2, 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(ours), ty)


def test_bn_fold_equals_unfolded():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1),
        "bn": {
            "gamma": jnp.asarray(rng.rand(6).astype(np.float32) + 0.5),
            "beta": jnp.asarray(rng.randn(6).astype(np.float32)),
            "mean": jnp.asarray(rng.randn(6).astype(np.float32)),
            "var": jnp.asarray(rng.rand(6).astype(np.float32) + 0.1),
        },
    }
    unfolded = layers.batch_norm_inference(p["bn"], layers.conv2d(x, p["w"]))
    folded = layers.conv_block(layers.fold_conv_bn(p), x, act=False)
    np.testing.assert_allclose(np.asarray(unfolded), np.asarray(folded),
                               rtol=2e-4, atol=2e-5)


def test_upsample2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = layers.upsample2x(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(y[0, :, :, 0]),
        np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32),
    )
