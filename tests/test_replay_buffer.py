"""On-device replay buffer tests: (slots, streams) ring semantics, gather
sampling, successor/frame-stack reconstruction per stream, RLPD mixing."""

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


def _batch(n, obs=0.0, nxt=0.0, rew=0.0):
    return {
        "observations": jnp.full((n, 3), obs, jnp.float32),
        "actions": jnp.zeros((n, 2)),
        "next_observations": jnp.full((n, 3), nxt, jnp.float32),
        "rewards": jnp.full((n,), rew),
        "masks": jnp.ones((n,)),
        "dones": jnp.zeros((n,)),
    }


def test_insert_and_wraparound():
    rb = ReplayBuffer(flat_example(), capacity=9)  # 3 streams x 3 slots
    state = rb.init_state(streams=3)
    for i in range(4):  # 4 slots into a 3-slot ring
        state = rb.insert(state, _batch(3, rew=float(i)),
                          ep_ids=jnp.full((3,), i, jnp.int32))
    assert int(state.size) == 3
    assert int(state.insert_slot) == 1
    # slot 0 was overwritten by insert 3
    np.testing.assert_allclose(np.asarray(state.data["rewards"][0]), 3.0)
    np.testing.assert_allclose(np.asarray(state.data["rewards"][1]), 1.0)


def test_sample_shapes_and_validity():
    rb = ReplayBuffer(flat_example(), capacity=100)
    state = rb.init_state(streams=5)
    batch = _batch(5)
    batch["rewards"] = jnp.arange(5, dtype=jnp.float32)
    state = rb.insert(state, batch, ep_ids=jnp.arange(5, dtype=jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(0), 16)
    assert out["observations"].shape == (16, 3)
    assert out["rewards"].shape == (16,)
    # sampled rewards must come from the inserted set {0..4}
    assert set(np.asarray(out["rewards"]).tolist()) <= {0.0, 1.0, 2.0, 3.0, 4.0}


def test_memory_efficient_next_obs_single_stream():
    """store_next_obs=False: next_obs must be the successor slot of the same
    stream within the same episode."""
    rb = ReplayBuffer(flat_example(), capacity=50, store_next_obs=False)
    state = rb.init_state(streams=1)
    for t in range(10):
        batch = _batch(1, obs=float(t))
        state = rb.insert(state, batch, ep_ids=jnp.zeros((1,), jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(1), 64)
    obs_t = np.asarray(out["observations"][:, 0])
    next_t = np.asarray(out["next_observations"][:, 0])
    np.testing.assert_array_equal(next_t, obs_t + 1)
    # the newest slot has no successor and must never be sampled
    assert obs_t.max() <= 8


def test_memory_efficient_next_obs_lockstep_envs():
    """REGRESSION (round-1 DrQ killer): N lockstep envs write N rows per
    control step. The sampled next_obs must be the SAME env's next-step obs,
    never another env's frame and never a fallback to obs itself (except
    terminals)."""
    N, T = 4, 10
    rb = ReplayBuffer(flat_example(), capacity=80, store_next_obs=False)
    state = rb.init_state(streams=N)
    for t in range(T):
        batch = _batch(N)
        # obs encodes (env_id, t)
        batch["observations"] = jnp.stack(
            [jnp.asarray([float(e), float(t), 0.0]) for e in range(N)]
        )
        state = rb.insert(state, batch, ep_ids=jnp.arange(N, dtype=jnp.int32))
    out = rb.sample(state, jax.random.PRNGKey(7), 256)
    obs = np.asarray(out["observations"])
    nxt = np.asarray(out["next_observations"])
    np.testing.assert_array_equal(obs[:, 0], nxt[:, 0])  # same env
    np.testing.assert_array_equal(obs[:, 1] + 1, nxt[:, 1])  # next step
    assert obs[:, 1].max() <= T - 2  # newest slot excluded


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
        example, capacity=32, store_next_obs=False, image_keys=("pixels",),
        num_stack=3,
    )
    state = rb.init_state(streams=1)
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
        assert all(row[i] <= row[i + 1] for i in range(len(row) - 1))


def test_framestack_lockstep_streams():
    """Frame stacks must stay within one stream (env)."""
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
    state = rb.init_state(streams=N)
    for t in range(T):
        batch = {
            "observations": {
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
    px = np.asarray(out["observations"]["pixels"][..., 0, 0, 0])  # (B, 2)
    env_of = px // 10
    t_of = px % 10
    np.testing.assert_array_equal(env_of[:, 0], env_of[:, 1])
    assert (((t_of[:, 1] - t_of[:, 0]) == 1) | (t_of[:, 1] == 0)).all()


def test_init_from_episodes_demo_ingestion():
    """Demo episodes become streams of a full write-once ring; successor
    reconstruction works within each episode."""
    E, T = 3, 5
    rb = ReplayBuffer(flat_example(), capacity=E * T, store_next_obs=False)
    # episode-major flat transitions: obs = [ep, t, 0]
    obs = np.stack(
        [[float(ep), float(t), 0.0] for ep in range(E) for t in range(T)]
    )
    tr = {
        "observations": jnp.asarray(obs),
        "actions": jnp.zeros((E * T, 2)),
        "rewards": jnp.zeros((E * T,)),
        "masks": jnp.ones((E * T,)),
        "dones": jnp.zeros((E * T,)),
    }
    ep_ids = jnp.repeat(jnp.arange(E, dtype=jnp.int32), T)
    state = rb.init_from_episodes(tr, ep_ids, episode_len=T)
    assert state.data["observations"].shape == (T, E, 3)
    out = rb.sample(state, jax.random.PRNGKey(4), 128)
    o = np.asarray(out["observations"])
    n = np.asarray(out["next_observations"])
    np.testing.assert_array_equal(o[:, 0], n[:, 0])  # same episode
    np.testing.assert_array_equal(o[:, 1] + 1, n[:, 1])  # successor step


def test_sample_mixed_interleaves():
    rb = ReplayBuffer(flat_example(), capacity=20)
    s1, s2 = rb.init_state(streams=5), rb.init_state(streams=5)
    s1 = rb.insert(s1, _batch(5, rew=1.0), jnp.zeros((5,), jnp.int32))
    s2 = rb.insert(s2, _batch(5, rew=2.0), jnp.zeros((5,), jnp.int32))
    out = rb.sample_mixed(s1, s2, jax.random.PRNGKey(3), 8)
    r = np.asarray(out["rewards"])
    # interleaved so every contiguous even-size minibatch block is 50/50
    assert (r[0::2] == 1.0).all() and (r[1::2] == 2.0).all()


def test_insert_is_jittable_and_scannable():
    rb = ReplayBuffer(flat_example(), capacity=64)
    state = rb.init_state(streams=4)

    def body(state, i):
        batch = _batch(4, rew=0.0)
        batch["rewards"] = jnp.zeros((4,)) + i
        return rb.insert(state, batch, jnp.full((4,), jnp.int32(0))), None

    state, _ = jax.lax.scan(body, state, jnp.arange(10, dtype=jnp.float32))
    assert int(state.size) == 10


def test_load_transitions_bulk():
    rb = ReplayBuffer(flat_example(), capacity=40)
    state = rb.init_state(streams=4)
    tr = _batch(12, rew=7.0)
    tr["ep_ids"] = jnp.zeros((12,), jnp.int32)
    state = rb.load_transitions(state, tr)
    assert int(state.size) == 3  # 12 rows / 4 streams
    out = rb.sample(state, jax.random.PRNGKey(5), 8)
    assert (np.asarray(out["rewards"]) == 7.0).all()


def test_aligned_sampling_is_uniform_per_stream():
    """VERDICT r3 weak #7: stream-aligned sampling is stratified (exactly
    batch/streams rows per stream) but must remain UNIFORM over slots within
    each stream, and uniform marginally over the whole buffer."""
    import numpy as np

    N, T = 4, 32  # streams, filled slots
    rb = ReplayBuffer(
        {
            "observations": jnp.zeros((3,)),
            "actions": jnp.zeros((2,)),
            "next_observations": jnp.zeros((3,)),
            "rewards": jnp.zeros(()),
            "masks": jnp.zeros(()),
            "dones": jnp.zeros(()),
        },
        capacity=N * T,
    )
    state = rb.init_state(streams=N)
    for t in range(T):
        batch = {
            # obs[0] encodes (stream, slot) uniquely: 100*e + t
            "observations": jnp.stack(
                [jnp.asarray([100.0 * e + t, 0.0, 0.0]) for e in range(N)]
            ),
            "actions": jnp.zeros((N, 2)),
            "next_observations": jnp.zeros((N, 3)),
            "rewards": jnp.zeros((N,)),
            "masks": jnp.ones((N,)),
            "dones": jnp.zeros((N,)),
        }
        state = rb.insert(state, batch, ep_ids=jnp.arange(N, dtype=jnp.int32))

    draws = []
    for i in range(200):
        out = rb.sample(state, jax.random.PRNGKey(i), 64)  # 64 % 4 == 0 -> aligned
        draws.append(np.asarray(out["observations"][:, 0]))
    ids = np.concatenate(draws)  # 12800 draws
    streams = (ids // 100).astype(int)
    slots = (ids % 100).astype(int)
    # exact stratification: every sample batch has batch/streams rows per stream
    per_stream = np.bincount(streams, minlength=N)
    assert (per_stream == len(ids) // N).all(), per_stream
    # within-stream slot distribution is uniform: chi-square well under the
    # 99.9%-ile of chi2(T-1) ~ 62 for T=32
    for e in range(N):
        counts = np.bincount(slots[streams == e], minlength=T)
        expected = counts.sum() / T
        chi2 = float(((counts - expected) ** 2 / expected).sum())
        assert chi2 < 62.0, (e, chi2, counts)
