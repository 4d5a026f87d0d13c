"""Record demonstration trajectories to a pickle.

Workload parity: reference `examples/*/record_demo.py` (E8) — there a human
teleoperates via spacemouse; here the batched scripted expert plays that
role (optionally with noise). Output is compatible with
`--demo_path` of the fused workloads and `populate_data_store`.

Example:
    python examples/record_demo.py --num_demos 20 --out demos.pkl [--pixels]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from serl_tpu.data.demos import collect_episodes, filter_successful, save_demos
from serl_tpu.envs.panda_pick import PandaPickCubeEnv
from serl_tpu.envs.scripted_expert import expert_action


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--out", default="demos.pkl")
    p.add_argument("--pixels", action="store_true")
    p.add_argument("--noise", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = PandaPickCubeEnv(image_obs=args.pixels)
    policy = jax.vmap(
        lambda s, k: expert_action(s, k, noise_scale=args.noise), in_axes=(0, None)
    )
    trs = collect_episodes(
        env,
        policy,
        jax.random.PRNGKey(args.seed),
        num_episodes=args.num_demos + 10,
        pixel_obs=args.pixels,
    )
    trs = filter_successful(trs)
    n_ok = len(np.unique(trs["ep_ids"]))
    keep = min(n_ok, args.num_demos) * 100
    from serl_tpu.data.demos import take_transitions

    trs = take_transitions(trs, keep)
    save_demos(trs, args.out)
    print(f"saved {keep} transitions ({keep // 100} successful demos) to {args.out}")


if __name__ == "__main__":
    main()
