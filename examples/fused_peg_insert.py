"""Peg insertion (sparse reward) with RLPD demos + expert interventions.

Workload parity: reference `examples/async_peg_insert_drq` (E3) — the
real-robot recipe: sparse pose reward (within per-dim threshold of
TARGET_POSE), a required demo buffer with 50/50 RLPD sampling, and human
(spacemouse) interventions whose actions replace the policy's in the stored
transition (async_drq_randomized.py:177-179). Sim analogue: the scripted
pose expert plays the human; the task env is PEG_INSERT_CONFIG
(serl_tpu/envs/tasks.py, shapes from peg_env/config.py).

Two observation modes:
  * state (default): 13-dim flattened state — fast sanity recipe.
  * --pixels: DrQ from front+wrist cameras + 10-dim proprio — the
    reference's ACTUAL workload class (async_drq_randomized.py:322-334
    builds the env with image_keys and a frozen/learned encoder; the
    learner is DrQ with in-graph random crop).

Example:
    python examples/fused_peg_insert.py --total_steps 100000
    python examples/fused_peg_insert.py --pixels --total_steps 150000
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from serl_tpu.data import demos as demo_lib
from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.scripted_expert import pose_expert_action
from serl_tpu.envs.tasks import PEG_INSERT_CONFIG, PandaPoseTaskEnv
from serl_tpu.training.launcher import (
    make_drq_agent,
    make_pixel_replay_buffer,
    make_sac_agent,
)
from serl_tpu.training.loop import LoopConfig, evaluate, make_fused_loop

OBS_DIM = 13  # state mode: tcp_pose(6) + tcp_vel(3) + gripper(1) + block(3)
PIXEL_STATE_DIM = 10  # pixel mode proprio: tcp_pose(6) + tcp_vel(3) + gripper(1)
ACT_DIM = 7
IMAGE_KEYS = ("front", "wrist")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pixels", action="store_true",
                   help="DrQ from front+wrist cameras (the reference E3 class)")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--encoder_type", default="small")
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    p.add_argument("--training_starts", type=int, default=1000)
    p.add_argument("--random_steps", type=int, default=1000)
    p.add_argument("--num_demos", type=int, default=20)
    # proven recipe (results/peg_insert_rlpd_v5e.log): heavy expert
    # interventions early, annealed to zero — the reference's human-operator
    # shape — with discount 0.97
    p.add_argument("--intervention_prob", type=float, default=0.5)
    p.add_argument("--intervention_mode", default="episode",
                   choices=["step", "episode", "rescue"])
    p.add_argument("--intervention_decay_steps", type=int, default=100_000)
    p.add_argument("--discount", type=float, default=0.97)
    p.add_argument("--total_steps", type=int, default=200_000)
    p.add_argument("--eval_period", type=int, default=4000)
    p.add_argument("--log", type=str, default=None)
    args = p.parse_args()

    cfg = PEG_INSERT_CONFIG
    env = PandaPoseTaskEnv(
        config=cfg, image_obs=args.pixels, render_size=args.image_size
    )
    out = open(args.log, "a") if args.log else sys.stdout

    expert = lambda s: pose_expert_action(
        s, jnp.asarray(cfg.target_pose), jnp.asarray(cfg.action_scale)
    )

    # ---- demos: scripted-expert streams with auto-reset (every transition
    # is a real approach step; the env early-terminates on success, so
    # without auto-reset ~77% of demo rows would be degenerate sit-at-goal
    # terminals) ----
    demo_state = None
    demo_rb = None
    if args.num_demos > 0:
        trans = demo_lib.collect_episodes(
            env,
            lambda states, rng: jax.vmap(expert)(states),
            jax.random.PRNGKey(args.seed + 1000),
            num_episodes=args.num_demos,
            episode_len=cfg.time_limit_steps,
            pixel_obs=args.pixels,
            auto_reset=True,
        )
        succ_steps = float(jnp.mean(trans.pop("success")))
        episodes = float(jnp.sum(trans["dones"]))
        if args.pixels:
            trans.pop("next_observations", None)  # memory-efficient buffer
            demo_rb = make_pixel_replay_buffer(
                capacity=args.num_demos * cfg.time_limit_steps,
                image_keys=IMAGE_KEYS,
                image_size=args.image_size,
                state_dim=PIXEL_STATE_DIM,
                action_dim=ACT_DIM,
            )
        else:
            ex = {
                k: jax.tree.map(lambda x: x[0], v)
                for k, v in trans.items()
                if k != "ep_ids"
            }
            demo_rb = ReplayBuffer(
                ex, capacity=args.num_demos * cfg.time_limit_steps
            )
        demo_state = demo_lib.demos_to_buffer(
            demo_rb, trans, episode_len=cfg.time_limit_steps
        )
        print(
            f"loaded {args.num_demos * cfg.time_limit_steps} demo transitions "
            f"({episodes:.0f} episodes, success-step frac {succ_steps:.2f})",
            file=out,
            flush=True,
        )

    # pixel buffers hold single frames at 2x128x128x3 uint8 — 20k rows
    # (~2 GB) is plenty (cable route solves within 20k; state keeps 100k)
    capacity = 20_000 if args.pixels else 100_000
    config = LoopConfig(
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        updates_per_iter=1,
        training_starts=args.training_starts,
        random_steps=args.random_steps,
        buffer_capacity=(capacity // args.num_envs) * args.num_envs,
        demo_fraction=0.5 if demo_state is not None else 0.0,
        intervention_prob=args.intervention_prob,
        intervention_mode=args.intervention_mode,
        intervention_decay_steps=args.intervention_decay_steps,
    )
    if args.pixels:
        rb = make_pixel_replay_buffer(
            capacity=config.buffer_capacity,
            image_keys=IMAGE_KEYS,
            image_size=args.image_size,
            state_dim=PIXEL_STATE_DIM,
            action_dim=ACT_DIM,
        )
        from serl_tpu.envs.wrappers import add_stack_axis, serl_obs

        shapes = jax.eval_shape(
            lambda k: jax.tree.map(
                lambda x: x[None],
                add_stack_axis(serl_obs(env.reset(k)[1]), rb.image_keys),
            ),
            jax.random.PRNGKey(0),
        )
        sample = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        agent = make_drq_agent(
            args.seed, sample, jnp.zeros((1, ACT_DIM)),
            image_keys=rb.image_keys, encoder_type=args.encoder_type,
            discount=args.discount,
        )
    else:
        rb = ReplayBuffer(
            {
                "observations": jnp.zeros((OBS_DIM,)),
                "actions": jnp.zeros((ACT_DIM,)),
                "next_observations": jnp.zeros((OBS_DIM,)),
                "rewards": jnp.zeros(()),
                "masks": jnp.zeros(()),
                "dones": jnp.zeros(()),
            },
            capacity=config.buffer_capacity,
        )
        agent = make_sac_agent(args.seed, obs_dim=OBS_DIM, action_dim=ACT_DIM,
                               discount=args.discount)
    init_fn, run_chunk = make_fused_loop(env, rb, config, expert_fn=expert)
    carry = init_fn(agent, jax.random.PRNGKey(args.seed), demo_state=demo_state)

    # pixel mode: short chunks — long scans of render+update programs fault
    # the tunneled TPU worker (see fused_cable_route.py); state mode can scan
    # a whole eval period in one chunk
    chunk = 10 if args.pixels else max(args.eval_period // config.num_envs, 1)
    eval_every = max(args.eval_period // (config.num_envs * chunk), 1)
    t0 = time.time()
    prev_ep, prev_suc = 0, 0.0
    n_chunks = 0
    solve_streak = 0
    while int(carry.env_steps) < args.total_steps:
        carry, m = run_chunk(carry, chunk)
        n_chunks += 1
        if n_chunks % eval_every:
            continue
        steps = int(carry.env_steps)
        ep = int(m["ep_count"][-1])
        suc = float(m["succ_sum"][-1])
        train_succ = (suc - prev_suc) / max(ep - prev_ep, 1)
        prev_ep, prev_suc = ep, suc
        ev = evaluate(
            env, carry.agent, jax.random.PRNGKey(steps),
            pixel_keys=rb.image_keys if args.pixels else (),
        )
        print(
            f"steps {steps} ({steps/(time.time()-t0):.0f}/s) "
            f"train_succ {train_succ:.2f} "
            f"eval_succ {ev['eval/success_rate']:.2f} "
            f"eval_ret {ev['eval/return_mean']:.1f}",
            file=out,
            flush=True,
        )
        # hardened solve criterion (VERDICT r4 weak #5): 2 consecutive evals
        solve_streak = solve_streak + 1 if ev["eval/success_rate"] >= 0.9 else 0
        if solve_streak >= 2:
            print(
                f"SOLVED (eval >= 0.9 on 2 consecutive evals) at {steps} "
                f"env steps ({time.time()-t0:.0f}s)",
                file=out,
                flush=True,
            )
            break


if __name__ == "__main__":
    main()
