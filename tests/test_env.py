"""PandaPickCube env behavior tests: reference-parity semantics + a scripted
grasp-and-lift that must succeed (the core physics capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serl_tpu.envs.panda_pick import (
    SAMPLING_BOUNDS,
    TIME_LIMIT_STEPS,
    PandaPickCubeEnv,
    flatten_obs,
)
from serl_tpu.envs.physics import engine


@pytest.fixture(scope="module")
def env():
    return PandaPickCubeEnv()


@pytest.fixture(scope="module")
def jitted(env):
    return jax.jit(env.reset), jax.jit(env.step)


def test_reset_obs_and_bounds(env, jitted):
    reset, _ = jitted
    for seed in range(3):
        state, obs = reset(jax.random.PRNGKey(seed))
        bp = np.asarray(obs["state"]["block_pos"])
        assert SAMPLING_BOUNDS[0][0] <= bp[0] <= SAMPLING_BOUNDS[1][0]
        assert SAMPLING_BOUNDS[0][1] <= bp[1] <= SAMPLING_BOUNDS[1][1]
        assert abs(bp[2] - 0.02) < 1e-6
        tcp = np.asarray(obs["state"]["panda/tcp_pos"])
        np.testing.assert_allclose(tcp, [0.3078, 0.0, 0.4442], atol=1e-3)
        assert obs["state"]["panda/gripper_pos"].shape == (1,)
    flat = flatten_obs(obs)
    assert flat.shape == (10,)


def test_cube_rests_under_zero_action(env, jitted):
    reset, step = jitted
    state, obs0 = reset(jax.random.PRNGKey(0))
    bp0 = np.asarray(obs0["state"]["block_pos"])
    s = state
    for _ in range(25):
        s, obs, r, d, info = step(s, jnp.zeros(4))
    bp = np.asarray(obs["state"]["block_pos"])
    np.testing.assert_allclose(bp[:2], bp0[:2], atol=2e-3)
    assert abs(bp[2] - 0.02) < 2e-3
    # arm holds its pose
    tcp = np.asarray(obs["state"]["panda/tcp_pos"])
    np.testing.assert_allclose(tcp, [0.3078, 0.0, 0.4442], atol=2e-3)


def test_reward_matches_reference_formula(env, jitted):
    reset, step = jitted
    state, _ = reset(jax.random.PRNGKey(2))
    state, obs, r, d, info = step(state, jnp.asarray([0.5, -0.3, -0.5, 0.0]))
    tcp = np.asarray(obs["state"]["panda/tcp_pos"])
    bp = np.asarray(obs["state"]["block_pos"])
    dist = np.linalg.norm(bp - tcp)
    r_close = np.exp(-20 * dist)
    r_lift = np.clip((bp[2] - 0.02) / 0.2, 0, 1)
    np.testing.assert_allclose(float(r), 0.3 * r_close + 0.7 * r_lift, atol=1e-4)


def test_time_limit_and_auto_reset(env):
    step_ar = jax.jit(env.step_auto_reset)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(3))
    done_seen = False
    for t in range(TIME_LIMIT_STEPS + 2):
        state, obs, r, d, info = step_ar(state, jnp.zeros(4))
        if float(d) > 0.5:
            done_seen = True
            assert t == TIME_LIMIT_STEPS - 1
            # after auto-reset the new episode starts at t=0 with ep_id+1
            assert int(state.t) == 0
            assert int(state.ep_id) == 1
            break
    assert done_seen


def _mocap_goto(env, step, s, goal, grasp, n):
    for _ in range(n):
        mocap = np.asarray(s.physics.mocap_pos)
        a = np.clip((goal - mocap) / 0.1, -1, 1)
        s, obs, r, d, info = step(s, jnp.asarray(np.r_[a, grasp], jnp.float32))
    return s, obs, r


def test_scripted_grasp_and_lift_succeeds(env, jitted):
    """The make-or-break physics test: approach, grasp, lift to +0.25 m."""
    reset, step = jitted
    for seed in [1, 5]:
        s, obs = reset(jax.random.PRNGKey(seed))
        block = np.asarray(obs["state"]["block_pos"])
        s, obs, r = _mocap_goto(env, step, s, block + [0, 0, 0.15], -1, 20)
        s, obs, r = _mocap_goto(env, step, s, block + [0, 0, -0.005], -1, 25)
        s, obs, r = _mocap_goto(env, step, s, block + [0, 0, -0.005], 1, 15)
        s, obs, r = _mocap_goto(env, step, s, block + [0, 0, 0.25], 1, 30)
        bp = np.asarray(s.physics.cube_pos)
        assert bp[2] > 0.22, f"seed {seed}: lift failed, block z={bp[2]}"
        assert float(r) > 0.9, f"seed {seed}: reward {r}"


def test_batched_env_vmap(env):
    n = 8
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    states, obs = jax.vmap(env.reset)(keys)
    assert obs["state"]["block_pos"].shape == (n, 3)
    actions = jnp.zeros((n, 4))
    states, obs, r, d, info = jax.vmap(env.step)(states, actions)
    assert r.shape == (n,)
    assert d.shape == (n,)
    # block positions stay distinct per env
    assert len(np.unique(np.asarray(obs["state"]["block_pos"][:, 0]))) > 4
