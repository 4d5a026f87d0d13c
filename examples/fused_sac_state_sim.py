"""Fused SAC-from-state on PandaPickCube — the TPU-native E1 workload.

Workload parity: `examples/async_sac_state_sim/async_sac_state_sim.py`
(reference), with the actor/learner fused into one device program. Optional
`--demo_path` switches on RLPD 50/50 demo mixing; `--record_demos N` uses
the scripted expert to generate and save demos first.

Examples:
    python examples/fused_sac_state_sim.py --total_env_steps 300000
    python examples/fused_sac_state_sim.py --rlpd --num_demos 20
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from serl_tpu.common.logger import Logger
from serl_tpu.training.launcher import make_state_sim_experiment
from serl_tpu.training.runner import eval_from_checkpoint, run_fused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=8)
    p.add_argument("--updates_per_iter", type=int, default=4)
    p.add_argument("--training_starts", type=int, default=1000)
    p.add_argument("--random_steps", type=int, default=1000)
    p.add_argument("--total_env_steps", type=int, default=500_000)
    p.add_argument("--rlpd", action="store_true", help="RLPD 50/50 demo mixing")
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--demo_path", type=str, default=None)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    # checkpoint-eval mode (reference --eval_checkpoint_step,
    # async_peg_insert_drq/async_drq_randomized.py:96-133)
    p.add_argument("--eval_checkpoint_step", type=int, default=None)
    p.add_argument("--eval_n_trajs", type=int, default=32)
    p.add_argument("--success_stop", type=float, default=None)
    p.add_argument("--debug", action="store_true")
    args = p.parse_args()

    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=args.seed,
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        updates_per_iter=args.updates_per_iter,
        training_starts=args.training_starts,
        random_steps=args.random_steps,
        demo_fraction=0.5 if (args.rlpd or args.demo_path) else 0.0,
    )

    # eval-only mode: restore a checkpoint and roll out the policy
    # (-1 = latest checkpoint)
    if args.eval_checkpoint_step is not None:
        assert args.checkpoint_dir, "--eval_checkpoint_step needs --checkpoint_dir"
        eval_from_checkpoint(
            env, agent, rb, args.checkpoint_dir,
            step=None if args.eval_checkpoint_step < 0
            else args.eval_checkpoint_step,
            num_episodes=args.eval_n_trajs,
            seed=args.seed,
        )
        return

    demo_state = None
    if args.rlpd or args.demo_path:
        from serl_tpu.data.demos import (
            collect_episodes,
            demos_to_buffer,
            filter_successful,
            load_demos,
        )

        if args.demo_path:
            trs = load_demos(args.demo_path)
        else:
            from serl_tpu.envs.scripted_expert import expert_action

            policy = jax.vmap(
                lambda s, k: expert_action(s, k, noise_scale=0.02),
                in_axes=(0, None),
            )
            trs = collect_episodes(
                env, policy, jax.random.PRNGKey(args.seed + 7),
                num_episodes=args.num_demos + 10,
            )
            trs = filter_successful(trs)
            from serl_tpu.data.demos import take_transitions

            trs = take_transitions(trs, args.num_demos * 100)
        demo_state = demos_to_buffer(rb, trs)
        print(f"loaded {len(trs['rewards'])} demo transitions")

    logger = Logger(
        project="serl_tpu",
        description="fused_sac_state_sim" + ("_rlpd" if demo_state is not None else ""),
        variant=vars(args),
        debug=args.debug,
    )
    run_fused(
        env, agent, rb, config, init_fn, run_chunk,
        total_env_steps=args.total_env_steps,
        seed=args.seed,
        demo_state=demo_state,
        logger=logger,
        checkpoint_dir=args.checkpoint_dir,
        success_stop=args.success_stop,
    )


if __name__ == "__main__":
    main()
