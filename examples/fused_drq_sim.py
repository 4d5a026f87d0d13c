"""Fused DrQ-from-pixels on PandaPickCubeVision — the TPU-native E2 workload.

Workload parity: `examples/async_drq_sim/async_drq_sim.py` (reference):
memory-efficient pixel buffer, DrQ random-crop updates, optional RLPD demo
buffer with 50/50 sampling, small/resnet/resnet-pretrained encoders.

All knobs come from the unified `WorkloadConfig` ("drq_sim"/"drq_rlpd"
presets = the proven solving recipe); the same object drives the
two-process mode (examples/async_drq_sim.py).

Example:
    python examples/fused_drq_sim.py --encoder_type small --num_envs 16
    python examples/fused_drq_sim.py --preset drq_rlpd --encoder_type resnet
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from serl_tpu.common.logger import Logger
from serl_tpu.training.config import WorkloadConfig
from serl_tpu.training.launcher import make_drq_sim_experiment
from serl_tpu.training.runner import eval_from_checkpoint, run_fused


def main():
    p = argparse.ArgumentParser()
    WorkloadConfig.add_args(p, preset="drq_sim")
    p.add_argument("--rlpd", action="store_true", help="RLPD 50/50 demo mixing")
    # checkpoint-eval mode (reference --eval_checkpoint_step,
    # async_peg_insert_drq/async_drq_randomized.py:96-133)
    p.add_argument("--eval_checkpoint_step", type=int, default=None)
    p.add_argument("--eval_n_trajs", type=int, default=32)
    args = p.parse_args()
    cfg = WorkloadConfig.from_args(args)
    if args.rlpd:
        cfg = dataclasses.replace(cfg, demo_fraction=0.5)

    env, agent, rb, config, init_fn, run_chunk = make_drq_sim_experiment(
        seed=cfg.seed,
        encoder_type=cfg.encoder_type,
        image_size=cfg.image_size,
        **cfg.loop_overrides(),
    )

    # eval-only mode: restore a checkpoint and roll out the policy
    # (-1 = latest checkpoint)
    if args.eval_checkpoint_step is not None:
        assert cfg.checkpoint_dir, "--eval_checkpoint_step needs --checkpoint_dir"
        eval_from_checkpoint(
            env, agent, rb, cfg.checkpoint_dir,
            step=None if args.eval_checkpoint_step < 0
            else args.eval_checkpoint_step,
            num_episodes=args.eval_n_trajs,
            seed=cfg.seed,
        )
        return

    demo_state = None
    if cfg.demo_fraction > 0.0:
        from serl_tpu.data.demos import (
            collect_episodes,
            demos_to_buffer,
            select_demo_episodes,
        )
        from serl_tpu.envs.scripted_expert import expert_action

        policy = jax.vmap(
            lambda s, k: expert_action(s, k, noise_scale=0.02), in_axes=(0, None)
        )
        trs = collect_episodes(
            env, policy, jax.random.PRNGKey(cfg.seed + 7),
            num_episodes=cfg.num_demos + 10, pixel_obs=True,
        )
        # select successful episodes ON DEVICE (no host image round-trip)
        trs.pop("next_observations", None)  # memory-efficient buffer
        trs = select_demo_episodes(trs, cfg.num_demos)
        demo_state = demos_to_buffer(rb, trs)
        print(f"loaded {len(trs['rewards'])} pixel demo transitions "
              f"(mean success {float(trs['success'].reshape(-1,100).max(1).mean()):.2f})")

    logger = Logger(
        project="serl_tpu",
        description=f"fused_drq_sim_{cfg.encoder_type}",
        variant=dataclasses.asdict(cfg),
        debug=cfg.debug,
    )
    run_fused(
        env, agent, rb, config, init_fn, run_chunk,
        demo_state=demo_state,
        logger=logger,
        **cfg.runner_kwargs(),
    )


if __name__ == "__main__":
    main()
