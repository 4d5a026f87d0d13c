"""Classifier-reward-in-the-loop (reference BinaryRewardClassifierWrapper,
franka_env/envs/wrappers.py:13-102 + async_cable_route_drq usage): the env's
reward comes from a learned classifier on the front camera, with early
termination on classifier success, inside the jit program.
"""

import jax
import jax.numpy as jnp

from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.tasks import CABLE_ROUTE_CONFIG, PandaPoseTaskEnv
from serl_tpu.envs.wrappers import ClassifierRewardEnv
from serl_tpu.networks.classifier import (
    classifier_fn,
    classifier_train_step,
    create_classifier,
)

IMG = 32


def _env():
    return PandaPoseTaskEnv(
        config=CABLE_ROUTE_CONFIG, image_obs=True, render_size=IMG
    )


def test_classifier_reward_overrides_env_reward():
    env = _env()

    def apply_yes(variables, obs, train=False):
        return jnp.asarray(10.0)  # sigmoid -> 1: always "success"

    wrapped = ClassifierRewardEnv(env, apply_yes, params={})
    state, obs = wrapped.reset(jax.random.PRNGKey(0))
    state, obs, rew, done, info = jax.jit(wrapped.step)(state, jnp.zeros(7))
    assert float(rew) == 1.0
    assert float(done) == 1.0  # early termination on classifier success
    assert float(info["success"]) == 1.0
    # ground-truth pose success preserved (reset pose is far from target)
    assert float(info["pose_success"]) == 0.0


def test_classifier_reward_negative_runs_to_time_limit():
    env = _env()

    def apply_no(variables, obs, train=False):
        return jnp.asarray(-10.0)

    wrapped = ClassifierRewardEnv(env, apply_no, params={})
    assert wrapped.time_limit_steps == env.time_limit_steps
    state, obs = wrapped.reset(jax.random.PRNGKey(0))
    step = jax.jit(wrapped.step)
    for _ in range(3):
        state, obs, rew, done, info = step(state, jnp.zeros(7))
        assert float(rew) == 0.0 and float(done) == 0.0


def test_trained_classifier_in_fused_loop():
    """End-to-end: train a real BinaryClassifier on synthetic frames, wrap
    the env, and run the fused DrQ loop a few iterations."""
    from serl_tpu.training.launcher import make_drq_agent, make_pixel_replay_buffer
    from serl_tpu.training.loop import LoopConfig, make_fused_loop
    from serl_tpu.envs.wrappers import add_stack_axis, serl_obs

    env = _env()
    key = "front"
    # train on random frames vs zero frames (just to get real params)
    rng = jax.random.PRNGKey(0)
    pos = jax.random.randint(rng, (8, 1, IMG, IMG, 3), 128, 255, jnp.uint8)
    neg = jnp.zeros((8, 1, IMG, IMG, 3), jnp.uint8)
    state = create_classifier(
        rng, {key: pos[:1]}, (key,), encoder_type="small"
    )
    for i in range(3):
        batch = {
            "observations": {key: jnp.concatenate([pos, neg])},
            "labels": jnp.concatenate([jnp.ones(8), jnp.zeros(8)]),
        }
        state, info = classifier_train_step(state, batch, jax.random.fold_in(rng, i))

    wrapped = ClassifierRewardEnv(env, state.apply_fn, state.params, image_key=key)

    config = LoopConfig(
        num_envs=2, batch_size=4, utd_ratio=1, updates_per_iter=1,
        training_starts=0, random_steps=0, buffer_capacity=64,
    )
    rb = make_pixel_replay_buffer(
        # pose-task pixel obs: tcp_pose(6) + tcp_vel(3) + gripper(1)
        capacity=64, image_size=IMG, state_dim=10, action_dim=7
    )
    sample = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda k: jax.tree.map(
                lambda x: x[None],
                add_stack_axis(serl_obs(env.reset(k)[1]), rb.image_keys),
            ),
            jax.random.PRNGKey(0),
        ),
    )
    agent = make_drq_agent(
        0, sample, jnp.zeros((1, 7)), image_keys=rb.image_keys,
        encoder_type="small",
    )
    init_fn, run_chunk = make_fused_loop(wrapped, rb, config)
    carry = init_fn(agent, jax.random.PRNGKey(0))
    carry, m = run_chunk(carry, 2)
    assert int(carry.env_steps) == 4
    assert int(carry.agent.state.step) > 0


def test_classifier_fn_matches_wrapper_semantics():
    """classifier_fn(state) and the wrapper apply the same program."""
    key = "front"
    rng = jax.random.PRNGKey(0)
    sample = {key: jnp.zeros((1, 1, IMG, IMG, 3), jnp.uint8)}
    state = create_classifier(rng, sample, (key,), encoder_type="small")
    fn = classifier_fn(state)
    img = jax.random.randint(rng, (IMG, IMG, 3), 0, 255, jnp.uint8)
    direct = state.apply_fn(
        {"params": state.params}, {key: img[None]}, train=False
    )
    via_fn = fn({key: img[None]})
    assert jnp.allclose(direct, via_fn, atol=1e-4)  # jit-vs-eager float noise
