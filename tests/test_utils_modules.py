"""Tests for Dataset, evaluation, logger, checkpointing, host buffer,
serialization, timer."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_dataset_sample_split_filter_normalize():
    from serl_tpu.data.dataset import Dataset

    n = 60  # 3 trajectories of 20
    rewards = np.concatenate([np.full(20, 0.1), np.full(20, 1.0), np.full(20, 0.5)])
    dones = np.zeros(n)
    dones[19] = dones[39] = dones[59] = 1
    ds = Dataset(
        {
            "observations": np.random.rand(n, 4).astype(np.float32),
            "actions": np.random.rand(n, 2).astype(np.float32),
            "rewards": rewards.astype(np.float32),
            "dones": dones.astype(np.float32),
        }
    )
    batch = ds.sample_jax(jax.random.PRNGKey(0), 16)
    assert batch["observations"].shape == (16, 4)
    a, b = ds.split(0.5)
    assert a.size + b.size == n
    best = ds.filter(threshold=15.0)  # only traj 2 (return 20)
    assert best.size == 20
    np.testing.assert_allclose(np.asarray(best.data["rewards"])[0], 1.0)
    ds.normalize_returns(scaling=100.0)
    assert float(ds.data["rewards"].max()) > 5.0


def test_host_buffer_roundtrip_and_datastore():
    from serl_tpu.data.host_buffer import ReplayBufferDataStore

    example = {
        "observations": np.zeros(3, np.float32),
        "rewards": np.float32(0),
    }
    store = ReplayBufferDataStore(example, capacity=10)
    for i in range(14):
        store.insert(
            {"observations": np.full(3, i, np.float32), "rewards": np.float32(i)}
        )
    assert len(store) == 10
    assert store.latest_data_id() == 14
    batch = store.sample(8)
    assert batch["rewards"].shape == (8,)
    assert batch["rewards"].min() >= 4  # oldest rows overwritten
    _, tail = store.get_latest_data(from_id=12)
    assert len(tail["rewards"]) == 2


def test_serialization_roundtrip():
    from serl_tpu.distributed.serialization import dumps, loads

    tree = {
        "a": np.random.rand(17, 5).astype(np.float32),
        "b": {"c": np.arange(8, dtype=np.int32), "d": "hello", "e": 3.5},
        "f": jnp.ones((2, 2), jnp.bfloat16),
    }
    out = loads(dumps(tree))
    np.testing.assert_allclose(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])
    assert out["b"]["d"] == "hello" and out["b"]["e"] == 3.5
    assert out["f"].dtype == jnp.bfloat16


def test_logger_writes_jsonl(tmp_path):
    from serl_tpu.common.logger import Logger

    lg = Logger(description="test", output_dir=str(tmp_path), variant={"lr": 1e-3})
    lg.log({"train": {"loss": jnp.asarray(0.5)}, "step_time": 0.1}, step=3)
    lg.close()
    import json

    lines = [json.loads(x) for x in open(lg._path)]
    assert lines[0]["_config"]["lr"] == 1e-3
    assert lines[1]["train/loss"] == 0.5
    assert lines[1]["_step"] == 3


def test_checkpoint_roundtrip(tmp_path):
    from serl_tpu.training.checkpointing import CheckpointManager

    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step": jnp.asarray(7),
    }
    m = CheckpointManager(str(tmp_path / "ckpt"), keep=3)
    m.save(7, tree, wait=True)
    target = jax.tree.map(jnp.zeros_like, tree)
    restored = m.restore(target=target)
    np.testing.assert_allclose(restored["params"]["w"], tree["params"]["w"])
    assert int(restored["step"]) == 7
    m.close()


def test_agent_checkpoint_roundtrip(tmp_path):
    from serl_tpu.training.checkpointing import (
        restore_agent_params,
        save_agent_checkpoint,
    )
    from serl_tpu.training.launcher import make_sac_agent

    agent = make_sac_agent(seed=0)
    save_agent_checkpoint(str(tmp_path / "agent"), agent, step=5)
    agent2 = make_sac_agent(seed=1)  # different init
    restored = restore_agent_params(str(tmp_path / "agent"), agent2)
    for a, b in zip(
        jax.tree.leaves(agent.state.params), jax.tree.leaves(restored.state.params)
    ):
        np.testing.assert_allclose(a, b)


def test_timer():
    import time

    from serl_tpu.utils.timer import Timer

    t = Timer()
    with t.context("phase"):
        time.sleep(0.01)
    avg = t.get_average_times()
    assert 0.005 < avg["phase"] < 0.5


def test_evaluation_helpers():
    from serl_tpu.common.evaluation import bootstrap_std, flatten_info, supply_rng

    assert flatten_info({"a": {"b": 1}, "c": 2}) == {"a.b": 1, "c": 2}
    s = bootstrap_std(np.random.rand(100))
    assert 0 <= s < 0.2

    calls = []

    def f(x, seed=None):
        calls.append(seed)
        return x

    g = supply_rng(f, jax.random.PRNGKey(0))
    g(1)
    g(2)
    assert not np.array_equal(calls[0], calls[1])


def test_eval_from_checkpoint(tmp_path):
    """Checkpoint-eval mode (reference --eval_checkpoint_step,
    async_peg_insert_drq/async_drq_randomized.py:96-133): restore a
    run_fused-format checkpoint and roll out the policy."""
    from serl_tpu.envs.panda_pick import PandaPickCubeEnv
    from serl_tpu.training.checkpointing import CheckpointManager
    from serl_tpu.training.launcher import (
        make_sac_agent,
        make_state_replay_buffer,
    )
    from serl_tpu.training.runner import eval_from_checkpoint

    env = PandaPickCubeEnv()
    rb = make_state_replay_buffer(capacity=128)
    agent = make_sac_agent(seed=0)
    # write a checkpoint in run_fused's format
    m = CheckpointManager(str(tmp_path / "ckpt"))
    m.save(42, {"agent_params": agent.state.params}, wait=True)
    m.close()

    fresh = make_sac_agent(seed=1)
    restored, succ = eval_from_checkpoint(
        env, fresh, rb, str(tmp_path / "ckpt"),
        num_episodes=2, num_rounds=1,
    )
    # params were grafted from the checkpointed agent, not the fresh init
    for a, b in zip(
        jax.tree.leaves(agent.state.params),
        jax.tree.leaves(restored.state.params),
    ):
        np.testing.assert_allclose(a, b)
    assert 0.0 <= succ <= 1.0

    # asking for a missing directory fails loudly
    import pytest

    with pytest.raises(FileNotFoundError):
        eval_from_checkpoint(env, fresh, rb, str(tmp_path / "nope"))
