"""Fused actor/learner loop tests: single-device correctness + 8-device
CPU-mesh SPMD dry run (SURVEY.md §4 multi-host test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_fused_loop_runs_and_updates():
    from serl_tpu.training.launcher import make_state_sim_experiment

    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=0,
        num_envs=8,
        batch_size=16,
        utd_ratio=2,
        updates_per_iter=1,
        training_starts=32,
        random_steps=16,
        buffer_capacity=512,
    )
    carry = init_fn(agent, jax.random.PRNGKey(0))
    carry, metrics = run_chunk(carry, 6)
    assert int(carry.env_steps) == 48
    assert int(carry.rb_state.size) == 6  # slots; 6 x 8 envs = 48 rows
    assert int(metrics["buffer_size"][-1]) == 48
    # updates became active once buffer >= batch*utd (32)
    assert int(carry.agent.state.step) > 0
    assert metrics["reward_mean"].shape == (6,)
    assert np.isfinite(np.asarray(metrics["critic_loss"])).all()


def test_fused_loop_multichip_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_evaluate_runs():
    from serl_tpu.training.launcher import make_sac_agent
    from serl_tpu.training.loop import evaluate
    from serl_tpu.envs.panda_pick import PandaPickCubeEnv

    env = PandaPickCubeEnv()
    agent = make_sac_agent(seed=0)
    out = evaluate(env, agent, jax.random.PRNGKey(0), num_episodes=4)
    assert 0.0 <= out["eval/success_rate"] <= 1.0
    assert np.isfinite(out["eval/return_mean"])


def test_pause_and_bitexact_resume(tmp_path):
    """PCB pause path (reference async_pcb_insert_drq:252-267,381-397): touch
    the pause file -> full carry checkpointed + runner exits; resume=True
    continues bit-identically vs an uninterrupted run."""
    import os

    from serl_tpu.training.launcher import make_state_sim_experiment
    from serl_tpu.training.runner import run_fused

    kwargs = dict(
        seed=0, num_envs=4, batch_size=8, utd_ratio=2, updates_per_iter=1,
        training_starts=16, random_steps=8, buffer_capacity=256,
    )

    # uninterrupted run: 4 chunks x 2 iters = 32 env steps. Chunked exactly
    # like the runner (scan length changes the compiled program, and float
    # non-associativity would then mask a real resume bug).
    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(**kwargs)
    carry_ref = init_fn(agent, jax.random.PRNGKey(0))
    for _ in range(4):
        carry_ref, _ = run_chunk(carry_ref, 2)

    # interrupted run: pause after 2 chunks, then resume for 2 more
    ckpt_dir = str(tmp_path / "ckpt")
    pause_file = str(tmp_path / "PAUSE")
    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(**kwargs)

    state = {"chunks": 0}

    def log_fn(log, carry):
        state["chunks"] += 1
        if state["chunks"] == 2 and not os.path.exists(pause_file):
            open(pause_file, "w").close()

    carry_a = run_fused(
        env, agent, rb, config, init_fn, run_chunk,
        total_env_steps=32, chunk_iters=2, seed=0,
        checkpoint_dir=ckpt_dir, pause_file=pause_file, log_fn=log_fn,
        eval_period_chunks=1000,
    )
    assert int(carry_a.env_steps) == 16  # paused halfway
    assert not os.path.exists(pause_file)  # consumed

    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(**kwargs)
    carry_b = run_fused(
        env, agent, rb, config, init_fn, run_chunk,
        total_env_steps=32, chunk_iters=2, seed=0,
        checkpoint_dir=ckpt_dir, pause_file=pause_file, resume=True,
        eval_period_chunks=1000,
    )
    assert int(carry_b.env_steps) == 32

    for name in ("env_steps", "rng", "obs", "ep_return"):
        np.testing.assert_array_equal(
            np.asarray(getattr(carry_ref, name)), np.asarray(getattr(carry_b, name)),
            err_msg=f"resume diverged on {name}",
        )
    ref_params = jax.tree.leaves(carry_ref.agent.state.params)
    res_params = jax.tree.leaves(carry_b.agent.state.params)
    for a, b in zip(ref_params, res_params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_without_pause_ckpt_raises(tmp_path):
    import pytest

    from serl_tpu.training.launcher import make_state_sim_experiment
    from serl_tpu.training.runner import run_fused

    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=0, num_envs=2, batch_size=4, utd_ratio=2, updates_per_iter=1,
        training_starts=64, random_steps=8, buffer_capacity=64,
    )
    with pytest.raises(FileNotFoundError):
        run_fused(
            env, agent, rb, config, init_fn, run_chunk,
            total_env_steps=4, chunk_iters=2, seed=0,
            checkpoint_dir=str(tmp_path / "c"), resume=True,
        )


def test_fused_loop_with_interventions():
    from serl_tpu.training.launcher import make_state_sim_experiment

    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=0,
        num_envs=4,
        batch_size=8,
        utd_ratio=2,
        updates_per_iter=1,
        training_starts=64,
        random_steps=0,
        buffer_capacity=256,
        intervention_prob=0.5,
    )
    carry = init_fn(agent, jax.random.PRNGKey(0))
    carry, metrics = run_chunk(carry, 4)
    assert int(carry.env_steps) == 16


def test_episode_scoped_interventions_store_expert_actions():
    """intervention_mode="episode": the expert owns whole episodes (the
    reference's human-takeover shape, SpacemouseIntervention wrappers.py
    :171-221). With prob=1.0 every stored action must be the expert's; the
    flag persists across steps within an episode."""
    import jax.numpy as jnp

    from serl_tpu.training.launcher import make_state_sim_experiment

    marker = jnp.asarray([0.123, -0.456, 0.789, 0.5])
    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=0,
        num_envs=4,
        batch_size=8,
        utd_ratio=2,
        updates_per_iter=1,
        training_starts=10**9,
        random_steps=0,
        buffer_capacity=256,
        intervention_prob=1.0,
        intervention_mode="episode",
    )
    from serl_tpu.training.loop import make_fused_loop

    init_fn, run_chunk = make_fused_loop(
        env, rb, config, expert_fn=lambda s: marker
    )
    carry = init_fn(agent, jax.random.PRNGKey(0))
    assert bool(carry.intervening.all())
    carry, _ = run_chunk(carry, 3)
    stored = np.asarray(carry.rb_state.data["actions"][:3])  # (slots, streams, 4)
    assert np.allclose(stored, np.asarray(marker), atol=1e-6)

    # prob=0: no interventions, flags all false
    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=0,
        num_envs=4,
        batch_size=8,
        utd_ratio=2,
        updates_per_iter=1,
        training_starts=10**9,
        random_steps=0,
        buffer_capacity=256,
        intervention_prob=0.0,
        intervention_mode="episode",
    )
    carry = init_fn(agent, jax.random.PRNGKey(0))
    assert not bool(carry.intervening.any())
    carry, _ = run_chunk(carry, 2)
    stored = np.asarray(carry.rb_state.data["actions"][:2])
    assert not np.allclose(stored, np.asarray(marker), atol=1e-3)


def test_fused_pixel_loop_with_frame_stack():
    """num_stack>1 end-to-end (VERDICT r3 #10): the live actor keeps a
    rolling obs history (reference ChunkingWrapper, chunking.py:34-77) via
    chunk_init/chunk_push, the buffer reconstructs T-stacks at sample time,
    and eval threads the same history."""
    from serl_tpu.envs.panda_pick import PandaPickCubeEnv
    from serl_tpu.training.launcher import (
        make_drq_agent,
        make_pixel_replay_buffer,
    )
    from serl_tpu.training.loop import LoopConfig, evaluate, make_fused_loop
    from serl_tpu.envs.wrappers import add_stack_axis, serl_obs

    env = PandaPickCubeEnv(image_obs=True, render_size=32)
    config = LoopConfig(
        num_envs=4, batch_size=8, utd_ratio=2, updates_per_iter=1,
        training_starts=16, random_steps=8, buffer_capacity=256,
    )
    rb = make_pixel_replay_buffer(
        capacity=config.buffer_capacity, image_size=32, num_stack=2,
    )
    shapes = jax.eval_shape(
        lambda k: jax.tree.map(
            lambda x: x[None],
            add_stack_axis(serl_obs(env.reset(k)[1]), rb.image_keys),
        ),
        jax.random.PRNGKey(0),
    )
    # the agent sees an explicit T=2 stack axis
    sample = jax.tree.map(
        lambda s: jnp.zeros(
            (s.shape[0], 2) + s.shape[2:] if len(s.shape) == 5 else s.shape,
            s.dtype,
        ),
        shapes,
    )
    agent = make_drq_agent(
        0, sample, jnp.zeros((1, 4)), image_keys=rb.image_keys,
        encoder_type="small",
    )
    init_fn, run_chunk = make_fused_loop(env, rb, config)
    carry = init_fn(agent, jax.random.PRNGKey(0))
    assert carry.chunk is not None
    for k in rb.image_keys:
        assert carry.chunk.frames[k].shape == (4, 2, 32, 32, 3)
    carry, metrics = run_chunk(carry, 8)
    assert int(carry.env_steps) == 32
    assert int(carry.agent.state.step) > 0  # updates ran on stacked batches
    assert np.isfinite(np.asarray(metrics["critic_loss"])).all()
    ev = evaluate(
        env, carry.agent, jax.random.PRNGKey(1), num_episodes=2,
        pixel_keys=rb.image_keys, num_stack=2,
    )
    assert 0.0 <= ev["eval/success_rate"] <= 1.0
