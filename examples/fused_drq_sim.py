"""Fused DrQ-from-pixels on PandaPickCubeVision — the TPU-native E2 workload.

Workload parity: `examples/async_drq_sim/async_drq_sim.py` (reference):
memory-efficient pixel buffer, DrQ random-crop updates, optional RLPD demo
buffer with 50/50 sampling, small/resnet/resnet-pretrained encoders.

Example:
    python examples/fused_drq_sim.py --encoder small --num_envs 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from serl_tpu.common.logger import Logger
from serl_tpu.training.launcher import make_drq_sim_experiment
from serl_tpu.training.runner import eval_from_checkpoint, run_fused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--encoder", default="small",
                   choices=["small", "resnet", "resnet-pretrained"])
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--utd_ratio", type=int, default=4)
    p.add_argument("--updates_per_iter", type=int, default=2)
    p.add_argument("--training_starts", type=int, default=1000)
    p.add_argument("--random_steps", type=int, default=1000)
    p.add_argument("--buffer_capacity", type=int, default=50_000)
    p.add_argument("--total_env_steps", type=int, default=300_000)
    p.add_argument("--rlpd", action="store_true")
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    # checkpoint-eval mode (reference --eval_checkpoint_step,
    # async_peg_insert_drq/async_drq_randomized.py:96-133)
    p.add_argument("--eval_checkpoint_step", type=int, default=None)
    p.add_argument("--eval_n_trajs", type=int, default=32)
    p.add_argument("--success_stop", type=float, default=None)
    p.add_argument("--debug", action="store_true")
    args = p.parse_args()

    env, agent, rb, config, init_fn, run_chunk = make_drq_sim_experiment(
        seed=args.seed,
        encoder_type=args.encoder,
        image_size=args.image_size,
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        utd_ratio=args.utd_ratio,
        updates_per_iter=args.updates_per_iter,
        training_starts=args.training_starts,
        random_steps=args.random_steps,
        buffer_capacity=args.buffer_capacity,
        demo_fraction=0.5 if args.rlpd else 0.0,
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
    if args.rlpd:
        from serl_tpu.data.demos import collect_episodes, demos_to_buffer
        from serl_tpu.envs.scripted_expert import expert_action

        policy = jax.vmap(
            lambda s, k: expert_action(s, k, noise_scale=0.02), in_axes=(0, None)
        )
        trs = collect_episodes(
            env, policy, jax.random.PRNGKey(args.seed + 7),
            num_episodes=args.num_demos + 10, pixel_obs=True,
        )
        # select successful episodes ON DEVICE (no host image round-trip)
        from serl_tpu.data.demos import select_demo_episodes

        trs.pop("next_observations", None)  # memory-efficient buffer
        trs = select_demo_episodes(trs, args.num_demos)
        demo_state = demos_to_buffer(rb, trs)
        print(f"loaded {len(trs['rewards'])} pixel demo transitions "
              f"(mean success {float(trs['success'].reshape(-1,100).max(1).mean()):.2f})")

    logger = Logger(
        project="serl_tpu",
        description=f"fused_drq_sim_{args.encoder}",
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
