"""Async actor/learner DrQ on PandaPickCubeVision (two-process mode).

Workload parity: reference `examples/async_drq_sim/async_drq_sim.py` (E2) —
an actor stepping the pixel sim and pushing image transitions, a learner
training DrQ with in-update crop augmentation and broadcasting params every
`publish_period` updates (reference: every 30, :269-292), optionally mixing
a demo buffer 50/50 per minibatch (RLPD, :234-254). Transport is the native
C++ TrainerServer/Client (replacing agentlace zmq). The TPU-primary
alternative is the fused single-program mode (`examples/fused_drq_sim.py`);
this mode exists for actor-on-another-host deployments.

Usage:
    python examples/async_drq_sim.py --learner [--demo_path demos.pkl]
    python examples/async_drq_sim.py --actor [--ip 127.0.0.1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.data.host_buffer import ReplayBufferDataStore, populate_data_store
from serl_tpu.distributed.transport import (
    QueuedDataStore,
    TrainerClient,
    TrainerServer,
)
from serl_tpu.envs.panda_pick import PandaPickCubeEnv
from serl_tpu.envs.wrappers import add_stack_axis, serl_obs
from serl_tpu.training.config import WorkloadConfig
from serl_tpu.training.launcher import make_drq_agent
from serl_tpu.utils.timer import Timer

IMAGE_KEYS = ("front", "wrist")


def _pixel_obs(obs_d):
    """Env obs dict -> SERL flat dict with the T=1 frame-stack axis, as
    numpy (uint8 images stay uint8 over the wire)."""
    obs = add_stack_axis(serl_obs(obs_d), IMAGE_KEYS)
    return jax.tree.map(np.asarray, obs)


def _example_transition(image_size):
    img = np.zeros((1, image_size, image_size, 3), np.uint8)
    obs = {"state": np.zeros(7, np.float32), "front": img, "wrist": img}
    return {
        "observations": obs,
        "actions": np.zeros(4, np.float32),
        "next_observations": obs,
        "rewards": np.float32(0),
        "masks": np.float32(0),
        "dones": np.float32(0),
    }


def actor_loop(cfg: WorkloadConfig, args):
    env = PandaPickCubeEnv(image_obs=True, render_size=cfg.image_size)
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)

    sample = jax.tree.map(
        lambda x: jnp.asarray(x)[None], _example_transition(cfg.image_size)
    )
    agent = make_drq_agent(
        cfg.seed, sample["observations"], sample["actions"],
        image_keys=IMAGE_KEYS, encoder_type=cfg.encoder_type,
    )
    agent_box = {"agent": agent}

    data_store = QueuedDataStore(1000)
    client = TrainerClient(
        "actor_env", cfg.ip, cfg.trainer_config(), data_store,
        wait_for_server=True,
    )

    def update_params(params):
        agent_box["agent"] = agent_box["agent"].replace(
            state=agent_box["agent"].state.replace(params=params)
        )

    client.recv_network_callback(update_params)

    rng = jax.random.PRNGKey(cfg.seed)
    state, obs_d = reset(rng)
    obs = _pixel_obs(obs_d)
    timer = Timer()
    ep_ret, ep_count, succ_count = 0.0, 0, 0
    for step_i in range(args.max_steps):
        with timer.context("sample_actions"):
            rng, k = jax.random.split(rng)
            if step_i < cfg.random_steps:
                action = jax.random.uniform(k, (4,), minval=-1, maxval=1)
            else:
                batched = jax.tree.map(lambda x: x[None], obs)
                action = agent_box["agent"].sample_actions(batched, seed=k)[0]
        with timer.context("step_env"):
            state, next_obs_d, reward, done, info = step(state, action)
            next_obs = _pixel_obs(next_obs_d)
        data_store.insert(
            {
                "observations": obs,
                "actions": np.asarray(action),
                "next_observations": next_obs,
                "rewards": np.float32(reward),
                "masks": np.float32(1.0 - float(done)),
                "dones": np.float32(done),
            }
        )
        obs = next_obs
        ep_ret += float(reward)
        if float(done) > 0.5:
            ep_count += 1
            succ_count += int(float(info["success"]) > 0.5)
            state, obs_d = reset(jax.random.fold_in(rng, ep_count))
            obs = _pixel_obs(obs_d)
            if ep_count % 5 == 0:
                client.request(
                    "send-stats",
                    {
                        "episode_return": ep_ret,
                        "episodes": ep_count,
                        "success_rate": succ_count / max(ep_count, 1),
                        "timer": timer.get_average_times(),
                    },
                )
            ep_ret = 0.0
        if step_i % cfg.steps_per_update == 0:
            client.update()
        if step_i % 1000 == 0:
            print(f"actor step {step_i}, episodes {ep_count}", flush=True)
    client.stop()


def _sample_rlpd(replay, demo, batch_size, utd_ratio, rng):
    """One learner mega-batch with each UTD minibatch mixed 50/50
    online/demo (reference async_drq_sim.py:269-292 concat_batches).

    update_high_utd reshapes the leading axis to (utd, batch); interleaving
    per-minibatch here reproduces the reference's per-step concat."""
    half = batch_size // 2
    online = replay.sample(half * utd_ratio, rng)
    dem = demo.sample(half * utd_ratio, rng)

    def mix(a, b):
        a = a.reshape((utd_ratio, half) + a.shape[1:])
        b = b.reshape((utd_ratio, half) + b.shape[1:])
        out = np.concatenate([a, b], axis=1)
        return out.reshape((utd_ratio * 2 * half,) + out.shape[2:])

    return jax.tree.map(mix, online, dem)


def learner_loop(cfg: WorkloadConfig, args):
    agent = make_drq_agent(
        cfg.seed,
        jax.tree.map(
            lambda x: jnp.asarray(x)[None],
            _example_transition(cfg.image_size)["observations"],
        ),
        jnp.zeros((1, 4)),
        image_keys=IMAGE_KEYS,
        encoder_type=cfg.encoder_type,
    )

    example = _example_transition(cfg.image_size)
    replay = ReplayBufferDataStore(example, capacity=cfg.buffer_capacity)
    demo = None
    if args.demo_path:
        demo = ReplayBufferDataStore(example, capacity=cfg.buffer_capacity)
        n = populate_data_store(demo, args.demo_path)
        print(f"loaded {n} demo transitions", flush=True)

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
    rng = np.random.default_rng(cfg.seed)
    timer = Timer()
    for update_step in range(args.max_steps):
        with timer.context("sample_replay_buffer"):
            if demo is not None:
                batch = _sample_rlpd(
                    replay, demo, cfg.batch_size, cfg.utd_ratio, rng
                )
            else:
                batch = replay.sample(
                    cfg.batch_size * cfg.utd_ratio, rng
                )
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
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--encoder_type", default="small")
    p.add_argument("--max_steps", type=int, default=1_000_000)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--critic_actor_ratio", type=int, default=4)
    p.add_argument("--training_starts", type=int, default=1000)
    p.add_argument("--random_steps", type=int, default=1000)
    p.add_argument("--steps_per_update", type=int, default=30)
    p.add_argument("--publish_period", type=int, default=30)
    p.add_argument("--log_period", type=int, default=50)
    p.add_argument("--demo_path", default=None)
    p.add_argument("--replay_capacity", type=int, default=25_000)
    args = p.parse_args()
    assert args.learner != args.actor, "pass exactly one of --learner/--actor"
    # one unified WorkloadConfig drives both processes (same object the
    # fused mode consumes; the reference's flag names map onto it)
    cfg = WorkloadConfig.preset(
        "drq_rlpd" if args.demo_path else "drq_sim",
        ip=args.ip,
        port=args.port,
        seed=args.seed,
        image_size=args.image_size,
        encoder_type=args.encoder_type,
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
