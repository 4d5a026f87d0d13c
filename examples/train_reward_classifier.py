"""Train a binary reward classifier from success/failure observations.

Workload parity: reference
`examples/async_bin_relocation_fwbw_drq/train_reward_classifier.py` (E5/E6
tooling): positive/negative demo buffers -> random-crop augmented BCE
training -> checkpoint consumed by `BinaryRewardClassifierWrapper` /
`load_classifier_func`.

Here positives/negatives come from scripted-expert rollouts on the sim
(success frames vs random-policy frames) or from --pos/--neg pickles.

Example:
    python examples/train_reward_classifier.py --out classifier.pkl
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.data.demos import collect_episodes, load_demos
from serl_tpu.envs.panda_pick import PandaPickCubeEnv
from serl_tpu.envs.scripted_expert import expert_action
from serl_tpu.networks.classifier import (
    classifier_train_step,
    create_classifier,
    save_classifier,
)
from serl_tpu.vision.augmentations import batched_random_crop


def gather_frames(args):
    if args.pos and args.neg:
        pos, neg = load_demos(args.pos), load_demos(args.neg)
        return pos["observations"], neg["observations"]
    env = PandaPickCubeEnv(image_obs=True)
    expert = jax.vmap(
        lambda s, k: expert_action(s, k, noise_scale=0.02), in_axes=(0, None)
    )
    pos_trs = collect_episodes(
        env, expert, jax.random.PRNGKey(args.seed), num_episodes=8, pixel_obs=True
    )
    rand = jax.vmap(
        lambda s, k: jax.random.uniform(k, (4,), minval=-1, maxval=1),
        in_axes=(0, None),
    )
    neg_trs = collect_episodes(
        env, rand, jax.random.PRNGKey(args.seed + 1), num_episodes=8, pixel_obs=True
    )
    # positives: frames where the task is succeeding (lifted cube)
    keep = np.asarray(pos_trs["success"]) > 0.5
    pos_obs = jax.tree.map(lambda x: x[keep], pos_trs["observations"])
    neg_obs = neg_trs["observations"]
    return pos_obs, neg_obs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pos", default=None, help="pickle of positive transitions")
    p.add_argument("--neg", default=None, help="pickle of negative transitions")
    p.add_argument("--image_key", default="front")
    p.add_argument("--encoder", default="small",
                   choices=["small", "resnet", "resnet-pretrained"])
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--out", default="classifier.pkl")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    pos_obs, neg_obs = gather_frames(args)
    key = args.image_key
    pos_px = jnp.asarray(pos_obs[key])[:, None]  # add stack axis
    neg_px = jnp.asarray(neg_obs[key])[:, None]
    print(f"positives {pos_px.shape[0]}, negatives {neg_px.shape[0]}")

    sample = {key: pos_px[:1]}
    state = create_classifier(
        jax.random.PRNGKey(args.seed), sample, (key,), encoder_type=args.encoder
    )

    rng = jax.random.PRNGKey(args.seed + 1)
    n_half = args.batch_size // 2
    for epoch in range(args.num_epochs):
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        pi = jax.random.randint(k1, (n_half,), 0, pos_px.shape[0])
        ni = jax.random.randint(k2, (n_half,), 0, neg_px.shape[0])
        px = jnp.concatenate([pos_px[pi], neg_px[ni]])
        px = batched_random_crop(px, k3, padding=4, num_batch_dims=2)
        batch = {
            "observations": {key: px},
            "labels": jnp.concatenate([jnp.ones(n_half), jnp.zeros(n_half)]),
        }
        state, info = classifier_train_step(state, batch, k4)
        if epoch % 10 == 0:
            print(
                f"epoch {epoch} loss {float(info['loss']):.4f} "
                f"acc {float(info['accuracy']):.3f}",
                flush=True,
            )
    save_classifier(state, args.out)
    print(f"saved classifier params to {args.out}")


if __name__ == "__main__":
    main()
