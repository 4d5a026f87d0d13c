"""PCB component insertion — tighter-tolerance sibling of peg insert, with
the interactive pause/save/resume path exercised for real.

Workload parity: reference `examples/async_pcb_insert_drq` (E4,
async_drq_randomized.py) — the peg recipe (sparse pose reward, RLPD demos,
interventions) at PCB tolerances (reward_threshold 5/5/3 mm vs peg's 10 mm,
tighter z box; PCB_INSERT_CONFIG mirrors pcb_env/config.py), plus the
pause-key loop that saves the replay buffer + training state and exits
(:252-267, :381-397). Here the pause is headless: touch <ckpt_dir>/PAUSE and
the runner checkpoints the FULL loop carry (agent + optimizers + env states
+ HBM buffer + counters) and exits; `--resume` continues bit-identically
(serl_tpu/training/runner.py, resume test in tests/test_adapters_and_logging.py).

Example:
    python examples/fused_pcb_insert.py --total_steps 200000 \
        --checkpoint_dir /tmp/pcb_ckpt
    touch /tmp/pcb_ckpt/PAUSE            # saves full state + exits
    python examples/fused_pcb_insert.py --total_steps 200000 \
        --checkpoint_dir /tmp/pcb_ckpt --resume
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from serl_tpu.common.logger import Logger
from serl_tpu.data import demos as demo_lib
from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.scripted_expert import pose_expert_action
from serl_tpu.envs.tasks import PCB_INSERT_CONFIG, PandaPoseTaskEnv
from serl_tpu.training.launcher import make_sac_agent
from serl_tpu.training.loop import LoopConfig, make_fused_loop
from serl_tpu.training.runner import run_fused

OBS_DIM = 13
ACT_DIM = 7


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    p.add_argument("--training_starts", type=int, default=1000)
    p.add_argument("--random_steps", type=int, default=1000)
    p.add_argument("--num_demos", type=int, default=20)
    # the proven sparse-reward recipe (peg, results/peg_insert_rlpd_v5e.log)
    p.add_argument("--intervention_prob", type=float, default=0.5)
    p.add_argument("--intervention_mode", default="episode",
                   choices=["step", "episode", "rescue"])
    p.add_argument("--intervention_decay_steps", type=int, default=100_000)
    p.add_argument("--intervention_min_prob", type=float, default=0.0)
    # reverse curriculum: episodes may start from expert-visited states
    # (mid-approach / at-insertion), making the sparse reward reachable from
    # late-phase states first — the lever that stabilized fwbw in r4
    p.add_argument("--demo_reset_prob", type=float, default=0.0)
    p.add_argument("--eval_episodes", type=int, default=32)
    p.add_argument("--bc_weight", type=float, default=0.0)
    p.add_argument("--lr_decay", action="store_true",
                   help="cosine lr decay over the run (freezes the policy "
                        "into its basin for the endgame; counters the "
                        "0.1<->0.8 eval oscillation of sparse tight-"
                        "tolerance SAC)")
    p.add_argument("--discount", type=float, default=0.97)
    p.add_argument("--total_steps", type=int, default=200_000)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug", action="store_true")
    args = p.parse_args()

    cfg = PCB_INSERT_CONFIG
    env = PandaPoseTaskEnv(config=cfg)
    expert = lambda s: pose_expert_action(
        s, jnp.asarray(cfg.target_pose), jnp.asarray(cfg.action_scale)
    )

    demo_state = None
    if args.num_demos > 0:
        trans = demo_lib.collect_episodes(
            env,
            lambda states, rng: jax.vmap(expert)(states),
            jax.random.PRNGKey(args.seed + 1000),
            num_episodes=args.num_demos,
            episode_len=cfg.time_limit_steps,
            auto_reset=True,
        )
        succ_steps = float(jnp.mean(trans.pop("success")))
        episodes = float(jnp.sum(trans["dones"]))
        ex = {
            k: jax.tree.map(lambda x: x[0], v)
            for k, v in trans.items()
            if k != "ep_ids"
        }
        demo_rb = ReplayBuffer(ex, capacity=args.num_demos * cfg.time_limit_steps)
        demo_state = demo_lib.demos_to_buffer(
            demo_rb, trans, episode_len=cfg.time_limit_steps
        )
        print(
            f"loaded {args.num_demos * cfg.time_limit_steps} demo transitions "
            f"({episodes:.0f} episodes, success-step frac {succ_steps:.2f})",
            flush=True,
        )

    config = LoopConfig(
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        updates_per_iter=1,
        training_starts=args.training_starts,
        random_steps=args.random_steps,
        buffer_capacity=(100_000 // args.num_envs) * args.num_envs,
        demo_fraction=0.5 if demo_state is not None else 0.0,
        intervention_prob=args.intervention_prob,
        intervention_mode=args.intervention_mode,
        intervention_decay_steps=args.intervention_decay_steps,
        intervention_min_prob=args.intervention_min_prob,
    )
    if args.demo_reset_prob > 0.0:
        bank = demo_lib.collect_state_bank(
            env,
            lambda states, rng: jax.vmap(expert)(states),
            jax.random.PRNGKey(args.seed + 5000),
            num_streams=8,
            steps=cfg.time_limit_steps,
        )
        env.set_demo_reset_bank(bank, args.demo_reset_prob)
        print(
            f"demo-reset bank: {jax.tree.leaves(bank)[0].shape[0]} states "
            f"(p={args.demo_reset_prob})",
            flush=True,
        )
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
    opt_kwargs = {}
    if args.lr_decay:
        iters = args.total_steps // args.num_envs
        opt_kwargs = dict(
            actor_optimizer_kwargs={
                "learning_rate": 3e-4, "warmup_steps": 2000,
                "cosine_decay_steps": iters,
            },
            critic_optimizer_kwargs={
                "learning_rate": 3e-4, "warmup_steps": 2000,
                "cosine_decay_steps": iters * args.utd_ratio,
            },
        )
    agent = make_sac_agent(args.seed, obs_dim=OBS_DIM, action_dim=ACT_DIM,
                           discount=args.discount,
                           bc_regularization=args.bc_weight,
                           **opt_kwargs)
    init_fn, run_chunk = make_fused_loop(env, rb, config, expert_fn=expert)

    logger = Logger(
        project="serl_tpu", description="fused_pcb_insert",
        variant=vars(args), debug=args.debug,
    )
    run_fused(
        env, agent, rb, config, init_fn, run_chunk,
        total_env_steps=args.total_steps,
        chunk_iters=50,
        eval_period_chunks=5,
        eval_episodes=args.eval_episodes,
        seed=args.seed,
        demo_state=demo_state,
        logger=logger,
        checkpoint_dir=args.checkpoint_dir,
        success_stop=0.9,
        resume=args.resume,
    )


if __name__ == "__main__":
    main()
