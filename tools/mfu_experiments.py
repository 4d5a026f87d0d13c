"""Pixel-path MFU experiments (VERDICT r3 #4): measure the DrQ update step
under each proposed lever and keep what wins.

docs/perf_pixels.md rooflines the high-UTD DrQ update at ~25% of v5e bf16
peak and ARGUES the rest is structural (3-input-channel first conv, VALID
convs at modest widths, bandwidth-bound aug). This tool tests that argument
lever by lever on the real chip, timing `update_high_utd` alone on a fixed
pixel batch (the update is 92% of the loop, so updates/s is the number that
moves bench.py's drq_updates_per_s):

  baseline   — SmallEncoder as shipped (bf16 convs)
  pad8       — input channels zero-padded 3->8 before conv1 (same function:
               extra kernel taps see zeros; MXU lane packing 8/8 vs 3/8)
  s2d        — conv1 rewritten exactly as space-to-depth(2) + 2x2 stride-1
               conv over 12 channels (same function, K=48 contraction)
  f32        — convs in float32 (sanity: how much bf16 buys)
  half_aug   — crop augmentation disabled (isolates aug bandwidth cost)

Run: python tools/mfu_experiments.py [--iters 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

IMAGE_KEYS = ("front", "wrist")


def make_batch(rng, batch, utd, size=128):
    k1, k2 = jax.random.split(jax.random.PRNGKey(rng))
    n = batch * utd
    obs = {
        "state": jax.random.normal(k1, (n, 7)),
        **{
            k: jax.random.randint(
                jax.random.fold_in(k2, i), (n, 1, size, size, 3), 0, 255, jnp.uint8
            )
            for i, k in enumerate(IMAGE_KEYS)
        },
    }
    next_obs = jax.tree.map(lambda x: x, obs)
    return {
        "observations": obs,
        "next_observations": next_obs,
        "actions": jax.random.normal(k2, (n, 4)),
        "rewards": jnp.zeros((n,)),
        "masks": jnp.ones((n,)),
        "dones": jnp.zeros((n,)),
    }


def bench_update(agent, batch, utd, iters):
    upd = jax.jit(
        lambda a, b, k: a.update_high_utd(b, utd_ratio=utd),
        static_argnums=(),
    )

    def run(agent):
        for _ in range(iters):
            agent, info = agent.update_high_utd(batch, utd_ratio=utd)
        return agent, info

    # warmup (compile)
    agent2, info = agent.update_high_utd(batch, utd_ratio=utd)
    jax.block_until_ready(jax.tree.leaves(info)[0])
    best = float("inf")
    for _ in range(3):
        a = agent
        t0 = time.perf_counter()
        a, info = run(a)
        np.asarray(info["critic"]["critic_loss"])
        best = min(best, time.perf_counter() - t0)
    # gradient steps: utd critic + 1 actor per call
    return iters * utd / best


def make_agent(variant, batch_example, seed=0, shared=False, no_concat=False):
    import flax.linen as nn

    from serl_tpu.agents.drq import DrQAgent
    from serl_tpu.vision import encoders as enc_mod

    encoder_kwargs = {}
    if variant == "f32":
        encoder_kwargs["compute_dtype"] = jnp.float32
    if variant == "pad8":
        encoder_kwargs["pad_input_channels"] = 8
    if variant == "s2d":
        encoder_kwargs["space_to_depth_stem"] = True

    def build(key):
        return enc_mod.SmallEncoder(
            pool_method="spatial_learned_embeddings",
            compute_dtype=jnp.float32 if variant == "f32" else jnp.bfloat16,
            name=f"encoder_{key}",
            **{k: v for k, v in encoder_kwargs.items() if k != "compute_dtype"},
        )

    if shared:
        one = build("shared")
        encoders = {k: one for k in IMAGE_KEYS}
    else:
        encoders = {k: build(k) for k in IMAGE_KEYS}
    sample_obs = jax.tree.map(lambda x: x[:1], batch_example["observations"])
    agent = DrQAgent.create_drq(
        jax.random.PRNGKey(seed),
        sample_obs,
        batch_example["actions"][:1],
        encoder_type="small",
        custom_encoders=encoders,
        shared_batch_concat=not no_concat,
        use_proprio=True,
        image_keys=IMAGE_KEYS,
        policy_kwargs={
            "tanh_squash_distribution": True,
            "std_parameterization": "exp",
            "std_min": 1e-5,
            "std_max": 5.0,
        },
        critic_network_kwargs={
            "activations": nn.tanh,
            "use_layer_norm": True,
            "hidden_dims": (256, 256),
        },
        policy_network_kwargs={
            "activations": nn.tanh,
            "use_layer_norm": True,
            "hidden_dims": (256, 256),
        },
        temperature_init=1e-2,
        critic_ensemble_size=10,
        critic_subsample_size=2,
        augment=variant != "half_aug",
    )
    return agent


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--utd", type=int, default=4)
    p.add_argument("--variants", default="baseline,pad8,s2d,f32,half_aug")
    args = p.parse_args()

    batch = make_batch(0, args.batch, args.utd)
    results = {}
    for v in args.variants.split(","):
        agent = make_agent(v, batch)
        ups = bench_update(agent, batch, args.utd, args.iters)
        results[v] = ups
        print(f"{v}: {ups:.1f} critic-grad-steps/s", flush=True)
    base = results.get("baseline")
    if base:
        for v, r in results.items():
            print(f"{v}: {r:.1f} ({r/base:.2f}x baseline)")


if __name__ == "__main__":
    main()
