"""Vision stack tests: augmentation semantics vs the reference algorithm,
encoder shapes, DrQ agent update on synthetic pixels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serl_tpu.vision.augmentations import (
    batched_random_crop,
    color_transform,
    gaussian_blur,
    random_flip,
    solarize,
    to_grayscale,
)


def _reference_crop(img, offsets, padding):
    """Reference semantics: pad-edge then slice at offset (numpy)."""
    out = []
    for i, im in enumerate(img):
        p = np.pad(im, ((padding, padding), (padding, padding), (0, 0)), mode="edge")
        dy, dx = offsets[i]
        out.append(p[dy : dy + im.shape[0], dx : dx + im.shape[1]])
    return np.stack(out)


def test_batched_random_crop_matches_pad_and_slice():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (6, 16, 16, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(3)
    out = np.asarray(batched_random_crop(jnp.asarray(img), key, padding=4))
    # recover the offsets the jax fn drew, then compare against numpy
    offsets = np.asarray(jax.random.randint(key, (6, 2), 0, 9))
    expected = _reference_crop(img, offsets, 4)
    np.testing.assert_array_equal(out, expected)


def test_batched_random_crop_multi_batch_dims():
    img = jnp.zeros((4, 2, 16, 16, 3), jnp.uint8)
    out = batched_random_crop(img, jax.random.PRNGKey(0), padding=4, num_batch_dims=2)
    assert out.shape == img.shape


def test_photometric_transforms_shapes_and_ranges():
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
    for fn in [
        lambda: color_transform(img, jax.random.PRNGKey(1)),
        lambda: gaussian_blur(img, jax.random.PRNGKey(2)),
        lambda: random_flip(img, jax.random.PRNGKey(3)),
        lambda: solarize(img, jax.random.PRNGKey(4), threshold=0.5),
    ]:
        out = fn()
        assert out.shape == img.shape
        assert float(out.min()) >= -1e-6 and float(out.max()) <= 1.0 + 1e-6
    gray = to_grayscale(img)
    assert gray.shape == img.shape
    np.testing.assert_allclose(gray[..., 0], gray[..., 1])


def test_resnet10_encoder_shapes():
    from serl_tpu.vision.encoders import resnetv1_configs

    enc = resnetv1_configs["resnetv1-10"](
        pooling_method="spatial_learned_embeddings",
        num_spatial_blocks=8,
        bottleneck_dim=256,
    )
    x = jnp.zeros((2, 128, 128, 3), jnp.uint8)
    params = enc.init(jax.random.PRNGKey(0), x, train=False)["params"]
    out = enc.apply({"params": params}, x, train=False)
    assert out.shape == (2, 256)
    # frozen pre-pooling variant returns the 4x4x512 feature map
    frozen = resnetv1_configs["resnetv1-10-frozen"]()
    fparams = frozen.init(jax.random.PRNGKey(0), x, train=False)["params"]
    feats = frozen.apply({"params": fparams}, x, train=False)
    assert feats.shape == (2, 4, 4, 512)


def _pixel_obs(batch=4, size=64, stack=1):
    # reference convention: image obs carry a leading frame-stack axis
    # (B, T, H, W, C), folded into channels inside the encoder
    return {
        "images": {
            "front": jnp.zeros((batch, stack, size, size, 3), jnp.uint8),
            "wrist": jnp.zeros((batch, stack, size, size, 3), jnp.uint8),
        },
        "state": jnp.zeros((batch, 7)),
    }


def test_drq_agent_create_and_update():
    from serl_tpu.agents.drq import DrQAgent

    obs = _pixel_obs()
    actions = jnp.zeros((4, 4))
    agent = DrQAgent.create_drq(
        jax.random.PRNGKey(0),
        obs,
        actions,
        encoder_type="small",
        use_proprio=True,
        image_keys=("front", "wrist"),
        critic_ensemble_size=2,
        temperature_init=1e-2,
        actor_optimizer_kwargs={"learning_rate": 3e-4},
        critic_optimizer_kwargs={"learning_rate": 3e-4},
    )
    acts = agent.sample_actions(obs, seed=jax.random.PRNGKey(1))
    assert acts.shape == (4, 4)

    batch = {
        "observations": _pixel_obs(),
        "actions": jnp.clip(
            jax.random.normal(jax.random.PRNGKey(2), (4, 4)), -0.99, 0.99
        ),
        "next_observations": _pixel_obs(),
        "rewards": jnp.ones((4,)),
        "masks": jnp.ones((4,)),
        "dones": jnp.zeros((4,)),
    }
    new_agent, info = agent.update_high_utd(batch, utd_ratio=2)
    assert int(new_agent.state.step) == 3
    assert np.isfinite(float(info["critic"]["critic_loss"]))
    # encoder params (inside critic group) received gradient
    before = jax.tree.leaves(agent.state.params["critic"]["encoder"])[0]
    after = jax.tree.leaves(new_agent.state.params["critic"]["encoder"])[0]
    assert not np.allclose(before, after)

    new_agent2, info2 = agent.update_critics(batch)
    assert "critic" in info2 and "actor" not in info2
