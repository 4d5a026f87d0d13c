"""On-device replay buffer tests: ring semantics, gather sampling,
frame-stack reconstruction, RLPD mixing."""

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.data.replay_buffer import ReplayBuffer


def flat_example(obs_dim=3, act_dim=2):
    return {
        "observations": jnp.zeros((obs_dim,)),
        "actions": jnp.zeros((act_dim,)),
        "next_observations": jnp.zeros((obs_dim,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }


def test_insert_and_wraparound():
    rb = ReplayBuffer(flat_example(), capacity=10)
    state = rb.init_state()
    for i in range(4):  # insert 4 batches of 3 -> 12 rows into capacity 10
        batch = {
            "observations": jnp.full((3, 3), i, jnp.float32),
            "actions": jnp.zeros((3, 2)),
            "next_observations": jnp.full((3, 3), i + 0.5, jnp.float32),
            "rewards": jnp.full((3,), float(i)),
            "masks": jnp.ones((3,)),
            "dones": jnp.zeros((3,)),
        }
        state = rb.insert(state, batch, ep_ids=jnp.full((3,), i, jnp.int32))
    assert int(state.size) == 10
    assert int(state.insert_index) == 2
    # oldest rows (0,1) were overwritten by batch 3
    np.testing.assert_allclose(state.data["rewards"][0], 3.0)
    np.testing.assert_allclose(state.data["rewards"][2], 0.0)


def test_sample_shapes_and_validity():
    rb = ReplayBuffer(flat_example(), capacity=100)
    state = rb.init_state()
    batch = {
        "observations": jnp.arange(5 * 3, dtype=jnp.float32).reshape(5, 3),
        "actions": jnp.zeros((5, 2)),
        "next_observations": jnp.ones((5, 3)),
        "rewards": jnp.arange(5, dtype=jnp.float32),
        "masks": jnp.ones((5,)),
        "dones": jnp.zeros((5,)),
    }
    state = rb.insert(state, batch, ep_ids=jnp.arange(5, dtype=jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(0), 16)
    assert out["observations"].shape == (16, 3)
    assert out["rewards"].shape == (16,)
    # sampled rewards must come from the inserted set {0..4}
    assert set(np.asarray(out["rewards"]).tolist()) <= {0.0, 1.0, 2.0, 3.0, 4.0}


def test_memory_efficient_next_obs_reconstruction():
    """store_next_obs=False: next_obs must be the successor row within the
    same episode."""
    rb = ReplayBuffer(flat_example(), capacity=50, store_next_obs=False)
    state = rb.init_state()
    # one episode of 10 sequential steps from a single env
    for t in range(10):
        batch = {
            "observations": jnp.full((1, 3), float(t)),
            "actions": jnp.zeros((1, 2)),
            "rewards": jnp.zeros((1,)),
            "masks": jnp.ones((1,)),
            "dones": jnp.zeros((1,)),
        }
        state = rb.insert(state, batch, ep_ids=jnp.zeros((1,), jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(1), 64)
    obs_t = out["observations"][:, 0]
    next_t = out["next_observations"][:, 0]
    # successor is t+1, except the terminal row which falls back to itself
    ok = (next_t == obs_t + 1) | ((obs_t == 9) & (next_t == 9))
    assert bool(ok.all())


def test_framestack_does_not_cross_episodes():
    example = {
        "observations": {
            "pixels": jnp.zeros((4, 4, 3), jnp.uint8),
            "state": jnp.zeros((3,)),
        },
        "actions": jnp.zeros((2,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }
    rb = ReplayBuffer(
        example, capacity=32, store_next_obs=False, image_keys=("pixels",), num_stack=3
    )
    state = rb.init_state()
    # two episodes of 4 steps; pixel value = 10*ep + t
    for ep in range(2):
        for t in range(4):
            batch = {
                "observations": {
                    "pixels": jnp.full((1, 4, 4, 3), 10 * ep + t, jnp.uint8),
                    "state": jnp.zeros((1, 3)),
                },
                "actions": jnp.zeros((1, 2)),
                "rewards": jnp.zeros((1,)),
                "masks": jnp.ones((1,)),
                "dones": jnp.zeros((1,)),
            }
            state = rb.insert(state, batch, ep_ids=jnp.full((1,), ep, jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(2), 128)
    px = np.asarray(out["observations"]["pixels"][..., 0, 0, 0])  # (B, T)
    assert px.shape[1] == 3
    for row in px:
        eps = row // 10
        assert len(set(eps.tolist())) == 1, f"stack crossed episodes: {row}"
        # within an episode the stack is non-decreasing and ends at the anchor
        assert all(row[i] <= row[i + 1] for i in range(len(row) - 1))


def test_memory_efficient_next_obs_lockstep_envs():
    """REGRESSION (round-1 DrQ killer): N lockstep envs insert N interleaved
    rows per control step, so row i's successor is i+N. With stride=N the
    sampled next_obs must be the same env's next-step obs, never another
    env's frame and never a fallback to obs itself (except terminals)."""
    N, T = 4, 10
    rb = ReplayBuffer(flat_example(), capacity=80, store_next_obs=False)
    state = rb.init_state(stride=N)
    for t in range(T):
        batch = {
            # obs encodes (env_id, t): obs[e] = [e, t, 0]
            "observations": jnp.stack(
                [jnp.asarray([float(e), float(t), 0.0]) for e in range(N)]
            ),
            "actions": jnp.zeros((N, 2)),
            "rewards": jnp.zeros((N,)),
            "masks": jnp.ones((N,)),
            "dones": jnp.zeros((N,)),
        }
        state = rb.insert(state, batch, ep_ids=jnp.arange(N, dtype=jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(7), 256)
    obs = np.asarray(out["observations"])
    nxt = np.asarray(out["next_observations"])
    # same env, one step later — for every sample
    np.testing.assert_array_equal(obs[:, 0], nxt[:, 0])
    np.testing.assert_array_equal(obs[:, 1] + 1, nxt[:, 1])
    # newest rows (no successor yet) must not have been sampled
    assert obs[:, 1].max() <= T - 2


def test_framestack_lockstep_stride():
    """Frame stacks must step backward by the env-count stride too."""
    N, T = 3, 6
    example = {
        "observations": {
            "pixels": jnp.zeros((2, 2, 1), jnp.uint8),
            "state": jnp.zeros((1,)),
        },
        "actions": jnp.zeros((2,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }
    rb = ReplayBuffer(
        example, capacity=60, store_next_obs=False, image_keys=("pixels",),
        num_stack=2,
    )
    state = rb.init_state(stride=N)
    for t in range(T):
        batch = {
            "observations": {
                # pixel value encodes 10*env + t
                "pixels": jnp.stack(
                    [jnp.full((2, 2, 1), 10 * e + t, jnp.uint8) for e in range(N)]
                ),
                "state": jnp.zeros((N, 1)),
            },
            "actions": jnp.zeros((N, 2)),
            "rewards": jnp.zeros((N,)),
            "masks": jnp.ones((N,)),
            "dones": jnp.zeros((N,)),
        }
        state = rb.insert(state, batch, ep_ids=jnp.arange(N, dtype=jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(8), 128)
    px = np.asarray(out["observations"]["pixels"][..., 0, 0, 0])  # (B, T=2)
    env_of = px // 10
    t_of = px % 10
    # both stack frames from the same env; consecutive timesteps (or clamped
    # at the episode start)
    np.testing.assert_array_equal(env_of[:, 0], env_of[:, 1])
    assert (((t_of[:, 1] - t_of[:, 0]) == 1) | (t_of[:, 1] == 0)).all()


def test_sample_mixed_half_and_half():
    rb = ReplayBuffer(flat_example(), capacity=20)
    s1, s2 = rb.init_state(), rb.init_state()
    mk = lambda v: {
        "observations": jnp.zeros((5, 3)),
        "actions": jnp.zeros((5, 2)),
        "next_observations": jnp.zeros((5, 3)),
        "rewards": jnp.full((5,), v),
        "masks": jnp.ones((5,)),
        "dones": jnp.zeros((5,)),
    }
    s1 = rb.insert(s1, mk(1.0), jnp.zeros((5,), jnp.int32))
    s2 = rb.insert(s2, mk(2.0), jnp.zeros((5,), jnp.int32))
    out = rb.sample_mixed(s1, s2, jax.random.PRNGKey(3), 8)
    r = np.asarray(out["rewards"])
    # interleaved so every contiguous even-size minibatch block is 50/50
    assert (r[0::2] == 1.0).all() and (r[1::2] == 2.0).all()


def test_insert_is_jittable_and_scannable():
    rb = ReplayBuffer(flat_example(), capacity=64)
    state = rb.init_state()

    def body(state, i):
        batch = {
            "observations": jnp.zeros((4, 3)) + i,
            "actions": jnp.zeros((4, 2)),
            "next_observations": jnp.zeros((4, 3)),
            "rewards": jnp.zeros((4,)) + i,
            "masks": jnp.ones((4,)),
            "dones": jnp.zeros((4,)),
        }
        return rb.insert(state, batch, jnp.full((4,), i, jnp.int32)), None

    state, _ = jax.lax.scan(body, state, jnp.arange(10, dtype=jnp.float32))
    assert int(state.size) == 40
