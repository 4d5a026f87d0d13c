"""Offline behavior cloning from demonstrations + evaluation.

Workload parity: reference `examples/bc_policy/bc_policy.py` (E7): BC
training from a demo pickle, then deterministic evaluation episodes.

Example:
    python examples/record_demo.py --num_demos 20 --out demos.pkl
    python examples/bc_policy.py --demo_path demos.pkl --steps 5000
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.agents.bc import BCAgent
from serl_tpu.common.evaluation import evaluate_batched
from serl_tpu.data.dataset import Dataset
from serl_tpu.data.demos import load_demos
from serl_tpu.envs.panda_pick import PandaPickCubeEnv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--demo_path", required=True)
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--eval_episodes", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    trs = load_demos(args.demo_path)
    trs = {k: v for k, v in trs.items() if k not in ("ep_ids", "success")}
    ds = Dataset(trs)
    print(f"dataset: {ds.size} transitions")

    agent = BCAgent.create(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(trs["observations"][:1]),
        jnp.asarray(trs["actions"][:1]),
        network_kwargs={
            "activations": jax.nn.tanh,
            "use_layer_norm": False,
            "hidden_dims": (256, 256),
        },
        policy_kwargs={
            "tanh_squash_distribution": False,
            "std_parameterization": "exp",
            "std_min": 1e-5,
            "std_max": 5.0,
        },
    )

    rng = jax.random.PRNGKey(args.seed + 1)
    for step in range(args.steps):
        rng, k = jax.random.split(rng)
        batch = ds.sample_jax(k, args.batch_size)
        agent, info = agent.update(batch)
        if step % 1000 == 0:
            print(
                f"step {step} nll {float(info['actor_loss']):.3f} "
                f"mse {float(info['mse']):.4f}",
                flush=True,
            )

    env = PandaPickCubeEnv()
    stats = evaluate_batched(
        env, agent, jax.random.PRNGKey(99), num_episodes=args.eval_episodes
    )
    print("eval:", stats)


if __name__ == "__main__":
    main()
