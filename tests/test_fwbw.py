"""Fused fwbw dual-policy loop + pose-task experts (reference E3/E6 shapes)."""

import jax
import jax.numpy as jnp

from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.scripted_expert import (
    pose_expert_action,
    relocation_expert_action,
)
from serl_tpu.envs.tasks import (
    PEG_INSERT_CONFIG,
    BinRelocationEnv,
    PandaPoseTaskEnv,
)
from serl_tpu.training.fwbw import FwBwConfig, evaluate_chained, make_fwbw_loop
from serl_tpu.training.launcher import make_sac_agent

OBS_DIM, ACT_DIM = 13, 7


def _example():
    return {
        "observations": jnp.zeros((OBS_DIM,)),
        "actions": jnp.zeros((ACT_DIM,)),
        "next_observations": jnp.zeros((OBS_DIM,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }


def test_fwbw_loop_trains_both_agents():
    fw_env, bw_env = BinRelocationEnv(0), BinRelocationEnv(1)
    cfg = FwBwConfig(
        envs_per_task=2,
        batch_size=8,
        utd_ratio=2,
        training_starts=8,
        random_steps=4,
        buffer_capacity=64,
        intervention_prob=0.2,
    )
    rb = ReplayBuffer(_example(), capacity=64)
    fa = make_sac_agent(0, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    ba = make_sac_agent(1, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    init_fn, run_chunk = make_fwbw_loop(fw_env, bw_env, rb, cfg)
    carry = init_fn(fa, ba, jax.random.PRNGKey(0))
    carry, m = run_chunk(carry, 12)
    assert int(carry.env_steps) == 12 * 2 * cfg.envs_per_task
    # both learners actually stepped (optimizer step counters advanced)
    assert int(carry.fw.agent.state.step) > 0
    assert int(carry.bw.agent.state.step) > 0
    # params diverged from init
    leaf0 = jax.tree.leaves(fa.state.params["critic"])[0]
    leaf1 = jax.tree.leaves(carry.fw.agent.state.params["critic"])[0]
    assert not jnp.allclose(leaf0, leaf1)


def test_evaluate_chained_shapes():
    fw_env, bw_env = BinRelocationEnv(0), BinRelocationEnv(1)
    fa = make_sac_agent(0, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    ba = make_sac_agent(1, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    ev = evaluate_chained(
        fw_env, bw_env, fa, ba, jax.random.PRNGKey(0),
        num_episodes=2, max_steps=5,
    )
    assert set(ev) == {
        "eval/fw_success",
        "eval/bw_success",
        "eval/bw_success_given_fw",
        "eval/round_trip_success",
    }


def test_pose_expert_solves_peg_insert():
    """The scripted pose expert must reach the sparse-success pose — it
    seeds the RLPD demo buffer for E3 (reference record_demo role)."""
    env = PandaPoseTaskEnv(config=PEG_INSERT_CONFIG)
    cfg = PEG_INSERT_CONFIG
    expert = lambda s: pose_expert_action(
        s, jnp.asarray(cfg.target_pose), jnp.asarray(cfg.action_scale)
    )

    @jax.jit
    def rollout(key):
        state, obs = env.reset(key)

        def body(carry, _):
            state, succ = carry
            a = expert(state)
            state, obs, r, d, info = env.step(state, a)
            return (state, jnp.maximum(succ, info["success"])), None

        (state, succ), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=cfg.time_limit_steps
        )
        return succ

    succ = [float(rollout(jax.random.PRNGKey(i))) for i in range(4)]
    assert sum(succ) >= 3, succ


def test_relocation_expert_moves_cube():
    """The relocation expert must move the cube toward the target bin."""
    env = BinRelocationEnv(0)

    @jax.jit
    def rollout(key):
        state, obs = env.reset(key)

        def body(carry, _):
            state, succ = carry
            a = relocation_expert_action(
                state, env.FW_BIN, jnp.asarray(env.config.action_scale)
            )
            state, obs, r, d, info = env.step(state, a)
            return (state, jnp.maximum(succ, info["success"])), None

        (state, succ), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), None, length=100
        )
        start = env.BW_BIN
        end_dist = jnp.linalg.norm(state.physics.cube_pos[:2] - env.FW_BIN)
        start_dist = jnp.linalg.norm(start - env.FW_BIN)
        return succ, start_dist, end_dist

    moved = 0
    for i in range(4):
        succ, start_dist, end_dist = rollout(jax.random.PRNGKey(i))
        if float(succ) > 0.5 or float(end_dist) < 0.6 * float(start_dist):
            moved += 1
    assert moved >= 2, "relocation expert failed to move the cube toward the bin"


def test_bin_walls_block_table_level_crossing():
    """The cube cannot slide from one bin to the other at table level: the
    physical walls (engine._obstacle_contact) stop it. Dragging is what the
    r2 BinRelocationEnv allowed (shape parity only, VERDICT r2 weak #3)."""
    env = BinRelocationEnv(0)  # cube starts in BW bin
    state, obs = env.reset(jax.random.PRNGKey(0))
    # shove the cube toward the FW bin (+y) from right next to the wall
    # (floor friction alone stops a table-level slide within a few cm, so
    # the shove must start adjacent to the wall to actually test it; much
    # faster than ~1 m/s and a real cube would hop the 4 cm wall too)
    phys = state.physics._replace(
        cube_pos=jnp.asarray([0.45, -0.115, 0.021]),
        cube_linvel=jnp.asarray([0.0, 0.8, 0.0]),
    )
    state = state._replace(physics=phys)

    from serl_tpu.envs.physics import engine

    @jax.jit
    def roll(p):
        def body(_, s):
            return engine.control_step(s, env.obstacles)
        return jax.lax.fori_loop(0, 25, body, p)  # 0.5 s

    p = roll(state.physics)
    # cube stayed inside its (walled) bin: it cannot cross the y gap at
    # table level, and it never left the table
    assert float(p.cube_pos[1]) < -0.15 + env.BIN_HALF + 0.02, p.cube_pos
    assert float(p.cube_pos[2]) < 0.08
    # control: the same shove with NO walls escapes the bin region
    @jax.jit
    def roll_free(p):
        def body(_, s):
            return engine.control_step(s)
        return jax.lax.fori_loop(0, 25, body, p)

    pf = roll_free(state.physics)
    # without walls the cube slides further toward the FW bin than the
    # walled cube ever got (floor friction alone does not pin it in place)
    assert float(pf.cube_pos[1]) > float(p.cube_pos[1]) + 0.01, (
        pf.cube_pos, p.cube_pos,
    )


def test_cube_dropped_into_walled_bin_stays():
    """A cube released above the target bin settles inside it."""
    env = BinRelocationEnv(0)
    state, obs = env.reset(jax.random.PRNGKey(0))
    phys = state.physics._replace(
        cube_pos=jnp.asarray([0.45, 0.15, 0.12]),
        cube_linvel=jnp.zeros(3),
    )

    from serl_tpu.envs.physics import engine

    @jax.jit
    def roll(p):
        def body(_, s):
            return engine.control_step(s, env.obstacles)
        return jax.lax.fori_loop(0, 50, body, p)  # 1 s settle

    p = roll(phys)
    assert abs(float(p.cube_pos[0]) - 0.45) < env.BIN_HALF + 0.01
    assert abs(float(p.cube_pos[1]) - 0.15) < env.BIN_HALF + 0.01
    assert float(p.cube_pos[2]) < 0.05  # on the bin floor -> success region


def test_auto_reset_replaces_cube_in_source_bin():
    """Regression (round-4 find): `step_auto_reset` calls `_reset_state`,
    which BinRelocationEnv did not override — so auto-reset episodes kept the
    cube wherever the previous episode left it. Any episode ending with the
    cube in the TARGET bin then started the next episode pre-solved (free
    success farming, train success >> eval success in every r3 fwbw log)."""
    env = BinRelocationEnv(task_id=0, dense_shaping=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # drop the cube in the TARGET bin and force episode end (time limit)
    tgt = env.FW_BIN
    phys = state.physics._replace(
        cube_pos=jnp.concatenate([tgt, jnp.asarray([0.02])])
    )
    state = state._replace(physics=phys, t=jnp.asarray(env.time_limit_steps))
    new_state, obs, r, done, info = env.step_auto_reset(
        state, jnp.zeros(env.ACTION_DIM)
    )
    assert float(done) == 1.0
    cube = new_state.physics.cube_pos
    src = env.BW_BIN
    assert float(jnp.linalg.norm(cube[:2] - src)) < 0.05, (
        f"auto-reset must re-place the cube in the SOURCE bin, got {cube}"
    )


def test_demo_reset_bank_resets_into_bank_states():
    """With demo_reset_prob=1 every reset must restore a bank state's physics
    (cube + arm) while keeping a fresh episode clock."""
    env = BinRelocationEnv(task_id=0, dense_shaping=False)
    # bank of one distinctive state: cube floating mid-carry
    state, _ = env.reset(jax.random.PRNGKey(1))
    marked = state._replace(
        physics=state.physics._replace(
            cube_pos=jnp.asarray([0.45, 0.0, 0.123])
        ),
        t=jnp.asarray(57),
    )
    bank = jax.tree.map(lambda x: x[None], marked)
    env.set_demo_reset_bank(bank, 1.0)
    new_state, _ = env.reset(jax.random.PRNGKey(2))
    assert float(jnp.abs(new_state.physics.cube_pos[2] - 0.123)) < 1e-6
    assert int(new_state.t) == 0, "episode clock must be fresh"
    env.set_demo_reset_bank(None, 0.0)
    clean, _ = env.reset(jax.random.PRNGKey(3))
    assert float(jnp.abs(clean.physics.cube_pos[2] - 0.123)) > 0.05
