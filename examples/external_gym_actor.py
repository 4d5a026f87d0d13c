"""External gym-API actor attached to the TrainerServer learner.

Demonstrates the "a real robot can attach at the workload layer" claim
(PARITY R7): the actor side of this script is written ONLY against
  (a) the reference FrankaEnv dict surface
      (`serl_robot_infra/franka_env/envs/franka_env.py:191-219` — obs
      {"state": {tcp_pose/tcp_vel/gripper_pose/tcp_force/tcp_torque},
      "images": {...}}, 7-dim delta-pose action) through the standard gym
      API, with the reference's wrapper semantics applied in-line
      (SERLObsWrapper flatten, serl_obs_wrappers.py:5-25), and
  (b) the agentlace-parity TrainerClient surface
      (serl_tpu/distributed/transport.py).
Swap `gym.make("FrankaPegInsert-v0")` for a real FrankaEnv pointed at a
robot server and the actor runs unchanged; here the stand-in robot is the
batched sim task env behind `FrankaTaskGymEnv` (envs/gym_adapter.py).

The learner side is the standard TrainerServer SAC learner
(reference async_sac_state_sim.py:171-248 shape).

Usage (two processes):
    python examples/external_gym_actor.py --learner
    python examples/external_gym_actor.py --actor [--ip 127.0.0.1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from serl_tpu.data.host_buffer import ReplayBufferDataStore
from serl_tpu.distributed.transport import (
    QueuedDataStore,
    TrainerClient,
    TrainerConfig,
    TrainerServer,
)
from serl_tpu.training.launcher import make_sac_agent

OBS_DIM = 16  # sorted state keys: gripper(1)+force(3)+pose(6)+torque(3)+vel(3)
ACT_DIM = 7


def serl_obs_flatten(obs):
    """Reference SERLObsWrapper: flatten the state dict to one vector
    (sorted keys), lift images to the top level
    (serl_launcher/wrappers/serl_obs_wrappers.py:5-25)."""
    state = obs["state"]
    flat = np.concatenate(
        [np.asarray(state[k], np.float32).ravel() for k in sorted(state)]
    )
    out = {"state": flat}
    for k, v in obs.get("images", {}).items():
        out[k] = v
    return out


def trainer_config(port):
    return TrainerConfig(
        port_number=port, broadcast_port=port + 1,
        request_types=["send-stats"],
    )


def actor_loop(args):
    """The reference actor loop (async_sac_state_sim.py:75-165 /
    async_drq_randomized.py:137-220) against a gym env — NO serl_tpu env
    internals are touched here; only the gym API + TrainerClient."""
    import gymnasium as gym

    import serl_tpu.envs.gym_adapter  # noqa: F401  (registers env ids)

    env = gym.make("FrankaPegInsert-v0")
    agent = make_sac_agent(seed=args.seed, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    agent_box = {"agent": agent}

    data_store = QueuedDataStore(2000)
    client = TrainerClient(
        "actor_env", args.ip, trainer_config(args.port), data_store,
        wait_for_server=True,
    )

    def update_params(params):
        agent_box["agent"] = agent_box["agent"].replace(
            state=agent_box["agent"].state.replace(params=params)
        )

    client.recv_network_callback(update_params)

    rng = jax.random.PRNGKey(args.seed)
    raw_obs, _ = env.reset(seed=args.seed)
    obs = serl_obs_flatten(raw_obs)
    ep_count = 0
    for step_i in range(args.max_steps):
        if step_i < args.random_steps:
            action = env.action_space.sample()
        else:
            rng, k = jax.random.split(rng)
            action = np.asarray(
                agent_box["agent"].sample_actions(
                    obs["state"][None], seed=k
                )[0]
            )
        raw_next, reward, terminated, truncated, info = env.step(action)
        next_obs = serl_obs_flatten(raw_next)
        done = terminated or truncated
        data_store.insert(
            {
                "observations": obs["state"],
                "actions": np.asarray(action, np.float32),
                "next_observations": next_obs["state"],
                "rewards": np.float32(reward),
                "masks": np.float32(1.0 - float(terminated)),
                "dones": np.float32(done),
            }
        )
        obs = next_obs
        if done:
            ep_count += 1
            raw_obs, _ = env.reset()
            obs = serl_obs_flatten(raw_obs)
            if ep_count % 5 == 0:
                client.request("send-stats", {"episodes": ep_count})
        if step_i % args.steps_per_update == 0:
            client.update()
        if step_i % 500 == 0:
            print(f"actor step {step_i}, episodes {ep_count}", flush=True)
    client.update()
    client.stop()
    print(f"actor done: {ep_count} episodes", flush=True)


def learner_loop(args):
    agent = make_sac_agent(seed=args.seed, obs_dim=OBS_DIM, action_dim=ACT_DIM)
    example = {
        "observations": np.zeros(OBS_DIM, np.float32),
        "actions": np.zeros(ACT_DIM, np.float32),
        "next_observations": np.zeros(OBS_DIM, np.float32),
        "rewards": np.float32(0),
        "masks": np.float32(0),
        "dones": np.float32(0),
    }
    replay = ReplayBufferDataStore(example, capacity=50_000)

    def stats_cb(req_type, payload):
        print("actor stats:", payload, flush=True)
        return {"ok": True}

    server = TrainerServer(trainer_config(args.port), request_callback=stats_cb)
    server.register_data_store("actor_env", replay)
    server.start(threaded=True)

    print("waiting for data...", flush=True)
    while len(replay) < args.training_starts:
        time.sleep(0.2)

    rng = np.random.default_rng(args.seed)
    for update_i in range(1, args.max_steps + 1):
        batch = replay.sample(
            args.batch_size * args.critic_actor_ratio, rng
        )
        agent, infos = agent.update_high_utd(
            batch, utd_ratio=args.critic_actor_ratio
        )
        if update_i % args.steps_per_publish == 0:
            server.publish_network(jax.device_get(agent.state.params))
        if update_i % 10 == 0:
            print(
                f"update {update_i} buffer {len(replay)} critic_loss "
                f"{float(infos['critic']['critic_loss']):.4f}",
                flush=True,
            )
    server.publish_network(jax.device_get(agent.state.params))
    server.stop()
    print("learner done", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--actor", action="store_true")
    p.add_argument("--learner", action="store_true")
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5488)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=20000)
    p.add_argument("--random_steps", type=int, default=300)
    p.add_argument("--steps_per_update", type=int, default=30)
    p.add_argument("--steps_per_publish", type=int, default=10)
    p.add_argument("--training_starts", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--critic_actor_ratio", type=int, default=4)
    args = p.parse_args()
    if args.actor == args.learner:
        raise SystemExit("pass exactly one of --actor / --learner")
    if args.actor:
        actor_loop(args)
    else:
        learner_loop(args)


if __name__ == "__main__":
    main()
