"""Fused SAC-from-state on PandaPickCube — the TPU-native E1 workload.

Workload parity: `examples/async_sac_state_sim/async_sac_state_sim.py`
(reference), with the actor/learner fused into one device program. Optional
`--demo_path` switches on RLPD 50/50 demo mixing; without a path `--rlpd`
uses the scripted expert to generate demos first.

All knobs come from the unified `WorkloadConfig` ("state_sim" preset =
the proven solving recipe); the same object drives the two-process mode
(examples/async_sac_state_sim.py).

Examples:
    python examples/fused_sac_state_sim.py --total_env_steps 300000
    python examples/fused_sac_state_sim.py --rlpd --num_demos 20
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from serl_tpu.common.logger import Logger
from serl_tpu.training.config import WorkloadConfig
from serl_tpu.training.launcher import make_state_sim_experiment
from serl_tpu.training.runner import eval_from_checkpoint, run_fused


def main():
    p = argparse.ArgumentParser()
    WorkloadConfig.add_args(p, preset="state_sim")
    p.add_argument("--rlpd", action="store_true", help="RLPD 50/50 demo mixing")
    p.add_argument("--demo_path", type=str, default=None)
    # checkpoint-eval mode (reference --eval_checkpoint_step,
    # async_peg_insert_drq/async_drq_randomized.py:96-133)
    p.add_argument("--eval_checkpoint_step", type=int, default=None)
    p.add_argument("--eval_n_trajs", type=int, default=32)
    args = p.parse_args()
    cfg = WorkloadConfig.from_args(args)
    if args.rlpd or args.demo_path:
        cfg = dataclasses.replace(cfg, demo_fraction=0.5)

    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=cfg.seed, **cfg.loop_overrides()
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
            filter_successful,
            load_demos,
            take_transitions,
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
                env, policy, jax.random.PRNGKey(cfg.seed + 7),
                num_episodes=cfg.num_demos + 10,
            )
            trs = filter_successful(trs)
            trs = take_transitions(trs, cfg.num_demos * 100)
        demo_state = demos_to_buffer(rb, trs)
        print(f"loaded {len(trs['rewards'])} demo transitions")

    logger = Logger(
        project="serl_tpu",
        description="fused_sac_state_sim" + ("_rlpd" if demo_state is not None else ""),
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
