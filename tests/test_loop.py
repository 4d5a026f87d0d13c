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
    assert int(carry.rb_state.size) == 48
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
