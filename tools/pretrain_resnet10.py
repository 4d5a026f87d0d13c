"""Produce `resnet10_params.pkl` — the pretrained backbone the reference
downloads from its GitHub release (`serl_launcher/utils/train_utils.py:69-130`).

This environment has no network egress, so the backbone is PRETRAINED HERE,
on-TPU, with a supervised proxy task on the simulator's own render path:
regress (cube_pos, tcp_pos) from rendered 128x128 front-camera frames across
randomized scene states. The saved pickle has the exact graft layout the
reference's pkl has (top-level flax module names of the ResNet-10 encoder:
conv_init / GroupNorm_0 / ResNetBlock_i / ...), stored float16 to halve the
artifact size (grafting checks shapes, not dtypes).

This makes `encoder_type=resnet-pretrained` green end-to-end: the frozen
backbone carries real visual features (where the cube and gripper are) —
task-relevant rather than ImageNet-generic, and documented as sim-pretrained.

Run: python tools/pretrain_resnet10.py --steps 2000 --out resnet10_params.pkl
"""

import argparse
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from serl_tpu.envs.panda_pick import PandaPickCubeEnv
from serl_tpu.envs.scripted_expert import expert_action
from serl_tpu.vision.encoders import resnetv1_configs


class _Regressor(nn.Module):
    """ResNet-10 backbone + small head; only the backbone is exported."""

    backbone: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.backbone(x, train=train)
        h = nn.relu(nn.Dense(128)(f))
        return nn.Dense(6)(h)


def collect_frames(env, rng, num_envs, steps):
    """(N*T, 128,128,3) frames + (N*T, 6) [cube_pos, tcp_pos] labels from
    noisy-expert rollouts (auto-reset) — covers approach/grasp/lift states."""
    from serl_tpu.envs.physics import engine
    from serl_tpu.envs.rendering import render_cameras

    keys = jax.random.split(rng, num_envs)

    @jax.jit
    def rollout(keys, rng):
        states, _ = jax.vmap(env.reset)(keys)

        def body(carry, t):
            states, rng = carry
            rng, ka, kn = jax.random.split(rng, 3)
            noisy = jax.vmap(
                lambda s, k: expert_action(s, k, noise_scale=0.3)
            )(states, jax.random.split(ka, num_envs))
            rand = jax.random.uniform(kn, (num_envs, 4), minval=-1, maxval=1)
            # half expert-ish, half random: diverse viewpoints of the scene
            actions = jnp.where((t % 2 == 0), noisy, rand)
            states, obs, r, d, info = jax.vmap(env.step_auto_reset)(
                states, actions
            )
            front = obs["images"]["front"]
            tcp, _, cube = jax.vmap(
                lambda p: engine.observe(p)
            )(states.physics)
            label = jnp.concatenate([cube, tcp], axis=-1)
            return (states, rng), (front, label)

        (_, _), (frames, labels) = jax.lax.scan(
            body, (states, rng), jnp.arange(steps)
        )
        return (
            frames.reshape((-1,) + frames.shape[2:]),
            labels.reshape((-1, 6)),
        )

    return rollout(keys, jax.random.fold_in(rng, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--rollout_steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--out", default="resnet10_params.pkl")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = PandaPickCubeEnv(image_obs=True, render_size=128)
    t0 = time.time()
    frames, labels = collect_frames(
        env, jax.random.PRNGKey(args.seed), args.num_envs, args.rollout_steps
    )
    n = frames.shape[0]
    print(f"collected {n} frames in {time.time()-t0:.0f}s", flush=True)

    # label normalization (workspace-scale targets)
    mu = labels.mean(axis=0)
    sd = labels.std(axis=0) + 1e-6

    backbone = resnetv1_configs["resnetv1-10"](
        pooling_method="avg", name="pretrained_encoder"
    )
    model = _Regressor(backbone=backbone)
    params = model.init(
        jax.random.PRNGKey(args.seed + 1), frames[:1], train=False
    )["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, rng):
        idx = jax.random.randint(rng, (args.batch_size,), 0, n)
        x = jnp.take(frames, idx, axis=0)
        y = (jnp.take(labels, idx, axis=0) - mu) / sd

        def loss_fn(p):
            pred = model.apply({"params": p}, x, train=True)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    rng = jax.random.PRNGKey(args.seed + 2)
    for step in range(args.steps):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, k)
        if step % 200 == 0:
            print(
                f"step {step} loss {float(loss):.4f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
    print(f"final loss {float(loss):.4f}", flush=True)

    # export the backbone subtree in the reference graft layout, f16
    # (flax names the submodule by its attribute name, "backbone")
    key = "backbone" if "backbone" in params else "pretrained_encoder"
    backbone_params = jax.device_get(params[key])
    backbone_params = jax.tree.map(
        lambda x: np.asarray(x, np.float16), backbone_params
    )
    with open(args.out, "wb") as f:
        pickle.dump(backbone_params, f)
    kb = Path(args.out).stat().st_size / 1e6
    print(f"saved {args.out} ({kb:.1f} MB, modules: "
          f"{sorted(backbone_params.keys())[:6]}...)", flush=True)


if __name__ == "__main__":
    main()
