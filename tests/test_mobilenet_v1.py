"""MobileNetV1 backbone + TF-slim checkpoint import (VERDICT r4 missing #7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serl_tpu.vision.mobilenet_v1 import (
    _BLOCKS,
    MobileNetV1,
    load_tf_slim_params,
    make_mobilenet_encoder,
)


def synthetic_tf_slim_ckpt(rng, width=1.0):
    """Random weights in the exact TF-slim MobileNetV1 naming/shapes."""
    c = lambda ch: max(8, int(ch * width))
    w = {}
    def bn(prefix, ch):
        w[f"{prefix}/BatchNorm/gamma"] = rng.rand(ch).astype(np.float32) + 0.5
        w[f"{prefix}/BatchNorm/beta"] = rng.randn(ch).astype(np.float32)
        w[f"{prefix}/BatchNorm/moving_mean"] = rng.randn(ch).astype(np.float32)
        w[f"{prefix}/BatchNorm/moving_variance"] = (
            rng.rand(ch).astype(np.float32) + 0.1
        )

    w["MobilenetV1/Conv2d_0/weights"] = rng.randn(3, 3, 3, c(32)).astype(
        np.float32
    ) * 0.1
    bn("MobilenetV1/Conv2d_0", c(32))
    in_ch = c(32)
    for i, (ch, stride) in enumerate(_BLOCKS, start=1):
        w[f"MobilenetV1/Conv2d_{i}_depthwise/depthwise_weights"] = rng.randn(
            3, 3, in_ch, 1
        ).astype(np.float32) * 0.1
        bn(f"MobilenetV1/Conv2d_{i}_depthwise", in_ch)
        w[f"MobilenetV1/Conv2d_{i}_pointwise/weights"] = rng.randn(
            1, 1, in_ch, c(ch)
        ).astype(np.float32) * 0.1
        bn(f"MobilenetV1/Conv2d_{i}_pointwise", c(ch))
        in_ch = c(ch)
    return w


@pytest.mark.slow
def test_tf_slim_import_matches_init_structure_and_runs():
    rng = np.random.RandomState(0)
    ckpt = synthetic_tf_slim_ckpt(rng, width=0.25)
    params = load_tf_slim_params(ckpt, width=0.25)

    net = MobileNetV1(width=0.25)
    init_params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    # imported tree must match the module's own param structure exactly
    assert jax.tree.structure(params) == jax.tree.structure(dict(init_params))
    same_shapes = jax.tree.map(
        lambda a, b: a.shape == b.shape, params, dict(init_params)
    )
    assert all(jax.tree.leaves(same_shapes))

    out = net.apply({"params": params}, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 2, 2, max(8, int(1024 * 0.25)))
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_folded_bn_matches_reference_formula():
    """One conv + BN folded by the loader must equal conv -> BN-by-hand."""
    rng = np.random.RandomState(1)
    ckpt = synthetic_tf_slim_ckpt(rng, width=0.25)
    params = load_tf_slim_params(ckpt, width=0.25)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    k = jnp.asarray(ckpt["MobilenetV1/Conv2d_0/weights"])
    conv = jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    g = ckpt["MobilenetV1/Conv2d_0/BatchNorm/gamma"]
    b = ckpt["MobilenetV1/Conv2d_0/BatchNorm/beta"]
    m = ckpt["MobilenetV1/Conv2d_0/BatchNorm/moving_mean"]
    v = ckpt["MobilenetV1/Conv2d_0/BatchNorm/moving_variance"]
    expect = (conv - m) / np.sqrt(v + 1e-3) * g + b
    got = conv * params["conv0_bn"]["scale"] + params["conv0_bn"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.slow
def test_frozen_encoder_head_trains_backbone_frozen():
    rng = np.random.RandomState(2)
    params = load_tf_slim_params(synthetic_tf_slim_ckpt(rng, 0.25), 0.25)
    enc = make_mobilenet_encoder(params, width=0.25)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
    variables = enc.init(jax.random.PRNGKey(0), imgs, train=False)
    out = enc.apply(variables, imgs, train=False)
    assert out.shape[0] == 2 and out.ndim == 2

    def loss(p):
        return jnp.sum(enc.apply({"params": p}, imgs, train=False) ** 2)

    grads = jax.grad(loss)(variables["params"])
    # head gets gradient; the (stop-gradient) backbone params are not even
    # part of the trainable tree (they live inside the module closure)
    assert any(
        float(jnp.abs(g).sum()) > 0 for g in jax.tree.leaves(grads)
    )
