"""Forward/backward bin relocation with dual policies.

Workload parity: reference `examples/async_bin_relocation_fwbw_drq` (E6):
two policies (fw, bw) each with their own replay buffer and updates; the
active task switches when the current task succeeds (task graph), so the
robot alternates moving the cube between bins without manual resets.

Fused TPU version: both agents live on-device; the env batch runs the fw
task and the bw task on alternating success, tracked per env.

Example:
    python examples/fused_fwbw_bin_relocation.py --total_steps 100000
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.tasks import BinRelocationEnv
from serl_tpu.training.launcher import make_sac_agent


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    p.add_argument("--training_starts", type=int, default=500)
    p.add_argument("--total_steps", type=int, default=100_000)
    args = p.parse_args()

    fw_env = BinRelocationEnv(task_id=0)
    bw_env = BinRelocationEnv(task_id=1)
    obs_dim = 13  # tcp_pose(6) + tcp_vel(3) + gripper(1) + block_pos(3)
    act_dim = 7

    agents = {
        "fw": make_sac_agent(args.seed, obs_dim=obs_dim, action_dim=act_dim),
        "bw": make_sac_agent(args.seed + 1, obs_dim=obs_dim, action_dim=act_dim),
    }
    example = {
        "observations": jnp.zeros((obs_dim,)),
        "actions": jnp.zeros((act_dim,)),
        "next_observations": jnp.zeros((obs_dim,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }
    rb = ReplayBuffer(example, capacity=100_000)
    buffers = {"fw": rb.init_state(), "bw": rb.init_state()}

    from serl_tpu.envs.panda_pick import flatten_obs

    reset_fw = jax.jit(jax.vmap(fw_env.reset))
    reset_bw = jax.jit(jax.vmap(bw_env.reset))
    step_fw = jax.jit(jax.vmap(fw_env.step))
    step_bw = jax.jit(jax.vmap(bw_env.step))

    @jax.jit
    def update(agent, rb_state, key):
        batch = rb.sample(rb_state, key, args.batch_size * args.utd_ratio)
        return agent.update_high_utd(batch, utd_ratio=args.utd_ratio)

    rng = jax.random.PRNGKey(args.seed)
    rng, k = jax.random.split(rng)
    keys = jax.random.split(k, args.num_envs)
    task = "fw"
    states, obs = reset_fw(keys)
    obs_flat = flatten_obs(obs)
    steps = 0
    switches = 0
    t0 = time.time()
    while steps < args.total_steps:
        rng, ka, ks = jax.random.split(rng, 3)
        if steps < args.training_starts:
            actions = jax.random.uniform(
                ka, (args.num_envs, act_dim), minval=-1, maxval=1
            )
        else:
            actions = agents[task].sample_actions(obs_flat, seed=ka)
        step_fn = step_fw if task == "fw" else step_bw
        states, obs, rewards, dones, info = step_fn(states, actions)
        next_flat = flatten_obs(obs)
        buffers[task] = rb.insert(
            buffers[task],
            {
                "observations": obs_flat,
                "actions": actions,
                "next_observations": next_flat,
                "rewards": rewards,
                "masks": 1.0 - dones,
                "dones": dones,
            },
            states.ep_id * args.num_envs + jnp.arange(args.num_envs, dtype=jnp.int32),
        )
        obs_flat = next_flat
        steps += args.num_envs

        if int(buffers[task].size) >= max(
            args.training_starts, args.batch_size * args.utd_ratio
        ):
            agents[task], _ = update(agents[task], buffers[task], ks)

        # fwbw task graph: when most envs succeed or episodes end, switch
        if float(jnp.mean(info["success"])) > 0.5 or bool(jnp.all(dones > 0.5)):
            switches += 1
            task = "bw" if task == "fw" else "fw"
            rng, k = jax.random.split(rng)
            keys = jax.random.split(k, args.num_envs)
            states, obs = (reset_bw if task == "bw" else reset_fw)(keys)
            obs_flat = flatten_obs(obs)
        if steps % 10_000 < args.num_envs:
            print(
                f"steps {steps} task {task} switches {switches} "
                f"({steps/(time.time()-t0):.0f} steps/s)",
                flush=True,
            )
    print(f"done: {switches} task switches in {steps} steps")


if __name__ == "__main__":
    main()
