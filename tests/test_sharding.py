"""Multi-chip sharding layout assertions (8 virtual CPU devices).

These tests pin the dp layout contract of `serl_tpu/distributed/sharding.py`
by inspecting the ACTUAL compiled programs, not just running them:

  * env/physics/buffer leaves stay sharded over `dp` through a fused step
    (a regression to replicated env state would silently serialize the
    physics across chips),
  * the learner's gradient all-reduce exists in the compiled HLO (GSPMD
    inserts it because the batch is sharded and params are replicated),
  * a replay-buffer insert compiles to a fully shard-local program — zero
    collectives (the round-1 capacity-axis layout put every insert through
    a cross-device scatter).
"""

import jax
import jax.numpy as jnp
import pytest

from serl_tpu.distributed.sharding import (
    batch_sharded,
    buffer_sharded,
    carry_shardings,
    make_mesh,
    replicated,
    shard_carry,
)
from serl_tpu.training.launcher import make_state_sim_experiment

N_DEV = 8


def _experiment():
    return make_state_sim_experiment(
        seed=0,
        num_envs=2 * N_DEV,
        updates_per_iter=1,
        utd_ratio=2,
        batch_size=16,
        training_starts=0,
        random_steps=0,
        buffer_capacity=2 * N_DEV * 16,
    )


@pytest.fixture(scope="module")
def sharded_setup():
    assert len(jax.devices()) >= N_DEV
    mesh = make_mesh(N_DEV)
    env, agent, rb, config, init_fn, run_chunk = _experiment()
    carry = init_fn(agent, jax.random.PRNGKey(0))
    carry = shard_carry(carry, mesh)
    return mesh, rb, config, carry, run_chunk


def test_carry_placed_with_explicit_layout(sharded_setup):
    mesh, rb, config, carry, _ = sharded_setup
    env_sh = batch_sharded(mesh)
    rep_sh = replicated(mesh)
    buf_sh = buffer_sharded(mesh)

    # env/physics leaves sharded along the env axis
    for leaf in jax.tree.leaves(carry.env_states):
        assert leaf.sharding.is_equivalent_to(env_sh, leaf.ndim), leaf.shape
    # params replicated
    for leaf in jax.tree.leaves(carry.agent.state.params):
        assert leaf.sharding.is_equivalent_to(rep_sh, leaf.ndim)
    # buffer data sharded along streams (axis 1)
    for leaf in jax.tree.leaves(carry.rb_state.data):
        assert leaf.sharding.is_equivalent_to(buf_sh, leaf.ndim), leaf.shape


def test_step_preserves_shardings(sharded_setup):
    """After a fused chunk executes under the mesh, the output carry must
    still carry the intended layout — this fails if any change lets XLA
    decide to replicate the env/physics or gather the buffer."""
    mesh, rb, config, carry, run_chunk = sharded_setup
    with mesh:
        out, _ = run_chunk(carry, 2)
    jax.block_until_ready(out.env_steps)
    env_sh = batch_sharded(mesh)
    buf_sh = buffer_sharded(mesh)
    rep_sh = replicated(mesh)
    for leaf in jax.tree.leaves(out.env_states):
        assert leaf.sharding.is_equivalent_to(env_sh, leaf.ndim), leaf.shape
    for leaf in jax.tree.leaves(out.rb_state.data):
        assert leaf.sharding.is_equivalent_to(buf_sh, leaf.ndim), leaf.shape
    for leaf in jax.tree.leaves(out.agent.state.params):
        assert leaf.sharding.is_equivalent_to(rep_sh, leaf.ndim)


def test_update_compiles_with_gradient_allreduce():
    """Batch sharded over dp + params replicated -> GSPMD must insert an
    all-reduce for the gradients (the TPU-native replacement for the
    reference's unused lax.pmean pmap_axis hook, common/common.py:213-214)."""
    from serl_tpu.training.launcher import make_sac_agent

    mesh = make_mesh(N_DEV)
    agent = make_sac_agent(seed=0)
    B = 4 * N_DEV
    batch = {
        "observations": jnp.zeros((B, 10)),
        "actions": jnp.zeros((B, 4)),
        "next_observations": jnp.zeros((B, 10)),
        "rewards": jnp.zeros((B,)),
        "masks": jnp.ones((B,)),
        "dones": jnp.zeros((B,)),
    }
    batch_sh = batch_sharded(mesh)
    rep = replicated(mesh)
    agent_sh = jax.device_put(agent, rep)
    batch_dev = jax.device_put(batch, batch_sh)

    def upd(agent, batch):
        new_agent, info = agent.update(batch)
        return new_agent

    with mesh:
        compiled = jax.jit(upd).lower(agent_sh, batch_dev).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in compiled update"


def test_insert_is_fully_shard_local(sharded_setup):
    """Inserting a lockstep row into the (slots, streams) buffer must
    involve ZERO collectives — each device owns its envs' rings end to end."""
    mesh, rb, config, carry, _ = sharded_setup
    n = config.num_envs
    tr_sh = batch_sharded(mesh)
    transitions = jax.device_put(
        {
            "observations": jnp.zeros((n, 10)),
            "actions": jnp.zeros((n, 4)),
            "next_observations": jnp.zeros((n, 10)),
            "rewards": jnp.zeros((n,)),
            "masks": jnp.ones((n,)),
            "dones": jnp.zeros((n,)),
        },
        tr_sh,
    )
    ep_ids = jax.device_put(jnp.zeros((n,), jnp.int32), tr_sh)
    with mesh:
        compiled = (
            jax.jit(rb.insert).lower(carry.rb_state, transitions, ep_ids).compile()
        )
    hlo = compiled.as_text()
    for collective in ("all-reduce", "all-gather", "collective-permute",
                      "all-to-all", "reduce-scatter"):
        assert collective not in hlo, f"buffer insert contains {collective}"


def test_unknown_carry_field_rejected(sharded_setup):
    """A carry field without a declared sharding must be a hard error, not a
    silent pass-through (the round-2 `intervening` regression)."""
    import collections

    from serl_tpu.training.loop import LoopCarry

    mesh, rb, config, carry, _ = sharded_setup
    Grown = collections.namedtuple(
        "GrownLoopCarry", LoopCarry._fields + ("mystery_field",)
    )
    grown = Grown(*carry, jnp.zeros((4,)))
    with pytest.raises(ValueError, match="mystery_field"):
        carry_shardings(grown, mesh)


def test_fwbw_carry_sharded_runs():
    """Sharded fwbw: both task groups' envs/buffers dp-sharded, both agents
    replicated; one chunk executes and preserves the layout."""
    from serl_tpu.data.replay_buffer import ReplayBuffer
    from serl_tpu.distributed.sharding import shard_fwbw_carry
    from serl_tpu.envs.tasks import BinRelocationEnv
    from serl_tpu.training.fwbw import FwBwConfig, make_fwbw_loop
    from serl_tpu.training.launcher import make_sac_agent

    OBS_DIM, ACT_DIM = 13, 7
    example = {
        "observations": jnp.zeros((OBS_DIM,)),
        "actions": jnp.zeros((ACT_DIM,)),
        "next_observations": jnp.zeros((OBS_DIM,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }
    mesh = make_mesh(N_DEV)
    fw_env, bw_env = BinRelocationEnv(0), BinRelocationEnv(1)
    cfg = FwBwConfig(
        envs_per_task=N_DEV,
        batch_size=8,
        utd_ratio=2,
        training_starts=0,
        random_steps=0,
        buffer_capacity=N_DEV * 16,
        intervention_prob=0.2,
    )
    rb = ReplayBuffer(example, capacity=N_DEV * 16)
    fa = make_sac_agent(0, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    ba = make_sac_agent(1, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    init_fn, run_chunk = make_fwbw_loop(fw_env, bw_env, rb, cfg)
    carry = init_fn(fa, ba, jax.random.PRNGKey(0))
    carry = shard_fwbw_carry(carry, mesh)
    with mesh:
        out, _ = run_chunk(carry, 2)
    jax.block_until_ready(out.env_steps)
    env_sh = batch_sharded(mesh)
    buf_sh = buffer_sharded(mesh)
    rep_sh = replicated(mesh)
    for tc in (out.fw, out.bw):
        for leaf in jax.tree.leaves(tc.env_states):
            assert leaf.sharding.is_equivalent_to(env_sh, leaf.ndim), leaf.shape
        for leaf in jax.tree.leaves(tc.rb_state.data):
            assert leaf.sharding.is_equivalent_to(buf_sh, leaf.ndim), leaf.shape
        for leaf in jax.tree.leaves(tc.agent.state.params):
            assert leaf.sharding.is_equivalent_to(rep_sh, leaf.ndim)


def test_uneven_envs_rejected():
    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=0,
        num_envs=N_DEV + 1,  # not divisible
        updates_per_iter=1,
        utd_ratio=2,
        batch_size=16,
        training_starts=0,
        random_steps=0,
        buffer_capacity=(N_DEV + 1) * 16,
    )
    mesh = make_mesh(N_DEV)
    carry = init_fn(agent, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divide"):
        carry_shardings(carry, mesh)
