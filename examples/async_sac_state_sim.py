"""Async actor/learner SAC on PandaPickCube (two-process mode).

Workload parity: reference `examples/async_sac_state_sim/async_sac_state_sim.py`
— an actor process stepping the sim and pushing transitions, a learner
process training SAC and broadcasting params, connected over the native C++
transport (replacing agentlace zmq). The TPU-primary alternative is the
fused single-program mode (`examples/fused_sac_state_sim.py`); this mode
exists for actor-on-another-host deployments (e.g. a real-robot workstation).

Usage:
    python examples/async_sac_state_sim.py --learner
    python examples/async_sac_state_sim.py --actor [--ip 127.0.0.1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.data.host_buffer import ReplayBufferDataStore
from serl_tpu.distributed.transport import (
    QueuedDataStore,
    TrainerClient,
    TrainerServer,
)
from serl_tpu.envs.panda_pick import PandaPickCubeEnv, flatten_obs
from serl_tpu.training.config import WorkloadConfig
from serl_tpu.training.launcher import make_sac_agent
from serl_tpu.utils.timer import Timer


def actor_loop(cfg: WorkloadConfig, args):
    env = PandaPickCubeEnv()
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)

    agent = make_sac_agent(seed=cfg.seed)
    agent_box = {"agent": agent}

    data_store = QueuedDataStore(2000)
    client = TrainerClient(
        "actor_env", cfg.ip, cfg.trainer_config(), data_store,
        wait_for_server=True,
    )

    def update_params(params):
        # hot-swap params on the callback thread (pytree is immutable so the
        # race is benign — same as the reference, async_sac_state_sim.py:88-92)
        agent_box["agent"] = agent_box["agent"].replace(
            state=agent_box["agent"].state.replace(params=params)
        )

    client.recv_network_callback(update_params)

    rng = jax.random.PRNGKey(cfg.seed)
    state, obs_d = reset(rng)
    obs = flatten_obs(obs_d)
    timer = Timer()
    ep_ret, ep_count = 0.0, 0
    for step_i in range(args.max_steps):
        with timer.context("sample_actions"):
            if step_i < cfg.random_steps:
                rng, k = jax.random.split(rng)
                action = jax.random.uniform(k, (4,), minval=-1, maxval=1)
            else:
                rng, k = jax.random.split(rng)
                action = agent_box["agent"].sample_actions(obs[None], seed=k)[0]
        with timer.context("step_env"):
            state, next_obs_d, reward, done, info = step(state, action)
            next_obs = flatten_obs(next_obs_d)
        data_store.insert(
            {
                "observations": np.asarray(obs),
                "actions": np.asarray(action),
                "next_observations": np.asarray(next_obs),
                "rewards": np.float32(reward),
                "masks": np.float32(1.0 - float(done)),
                "dones": np.float32(done),
            }
        )
        obs = next_obs
        ep_ret += float(reward)
        if float(done) > 0.5:
            ep_count += 1
            state, obs_d = reset(jax.random.fold_in(rng, ep_count))
            obs = flatten_obs(obs_d)
            if ep_count % 5 == 0:
                client.request(
                    "send-stats",
                    {"episode_return": ep_ret, "episodes": ep_count},
                )
            ep_ret = 0.0
        if step_i % cfg.steps_per_update == 0:
            client.update()
        if step_i % 1000 == 0:
            print(f"actor step {step_i}, episodes {ep_count}", flush=True)
    client.stop()


def learner_loop(cfg: WorkloadConfig, args):
    env = PandaPickCubeEnv()
    agent = make_sac_agent(seed=cfg.seed)

    example = {
        "observations": np.zeros(10, np.float32),
        "actions": np.zeros(4, np.float32),
        "next_observations": np.zeros(10, np.float32),
        "rewards": np.float32(0),
        "masks": np.float32(0),
        "dones": np.float32(0),
    }
    replay = ReplayBufferDataStore(example, capacity=cfg.buffer_capacity)

    def stats_cb(req_type, payload):
        print("actor stats:", payload, flush=True)
        return {"ok": True}

    server = TrainerServer(cfg.trainer_config(), request_callback=stats_cb)
    server.register_data_store("actor_env", replay)
    server.start(threaded=True)

    print("waiting for data...", flush=True)
    while len(replay) < cfg.training_starts:
        time.sleep(0.5)

    server.publish_network(agent.state.params)
    iterator = replay.get_iterator(
        batch_size=cfg.batch_size * cfg.utd_ratio
    )
    timer = Timer()
    for update_step in range(args.max_steps):
        with timer.context("sample_replay_buffer"):
            batch = next(iterator)
        with timer.context("train"):
            agent, info = agent.update_high_utd(
                batch, utd_ratio=cfg.utd_ratio
            )
            jax.block_until_ready(agent.state.step)
        if update_step % cfg.publish_period == 0:
            server.publish_network(jax.device_get(agent.state.params))
        if update_step % args.log_period == 0:
            print(
                f"update {update_step} closs "
                f"{float(info['critic']['critic_loss']):.4f} "
                f"buffer {len(replay)} times {timer.get_average_times()}",
                flush=True,
            )
    server.stop()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--learner", action="store_true")
    p.add_argument("--actor", action="store_true")
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5488)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=1_000_000)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--critic_actor_ratio", type=int, default=8)
    p.add_argument("--training_starts", type=int, default=1000)
    p.add_argument("--random_steps", type=int, default=1000)
    p.add_argument("--steps_per_update", type=int, default=30)
    p.add_argument("--publish_period", type=int, default=1)
    p.add_argument("--log_period", type=int, default=100)
    p.add_argument("--replay_capacity", type=int, default=1_000_000)
    args = p.parse_args()
    assert args.learner != args.actor, "pass exactly one of --learner/--actor"
    # one unified WorkloadConfig drives both processes (same object the
    # fused mode consumes; --critic_actor_ratio etc. are kept as the
    # reference's flag names and map onto it)
    cfg = WorkloadConfig.preset(
        "state_sim",
        ip=args.ip,
        port=args.port,
        seed=args.seed,
        batch_size=args.batch_size,
        utd_ratio=args.critic_actor_ratio,
        training_starts=args.training_starts,
        random_steps=args.random_steps,
        steps_per_update=args.steps_per_update,
        publish_period=args.publish_period,
        buffer_capacity=args.replay_capacity,
        total_env_steps=args.max_steps,
    )
    if args.learner:
        learner_loop(cfg, args)
    else:
        actor_loop(cfg, args)


if __name__ == "__main__":
    main()
