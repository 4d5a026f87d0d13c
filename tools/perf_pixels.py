"""Reproducible DrQ pixel-path performance measurement (VERDICT r2 #8).

Measures, on the real chip, for the named recipe shape (16 envs, 2 cameras,
batch 256, UTD 4 x updates_per_iter 2):
  * full fused loop env-steps/s (the number bench.py reports),
  * actor-only env-steps/s (updates disabled: training_starts=inf),
  * the same loop with the shared-camera encoder.

docs/perf_pixels.md is written FROM this script's output so the doc and
BENCH_r0N.json cannot diverge (the r2 doc claimed 413 env-steps/s from an
uncommitted measurement while bench.py reported 207 for the same named
shape).

Run: python tools/perf_pixels.py [--image_size 128]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np


def bench_loop(iters=25, updates=True, shared_encoder=False, image_size=128,
               num_envs=16, updates_per_iter=2):
    from serl_tpu.training.launcher import make_drq_sim_experiment

    env, agent, rb, config, init_fn, run_chunk = make_drq_sim_experiment(
        seed=0,
        encoder_type="small",
        image_size=image_size,
        shared_encoder=shared_encoder,
        num_envs=num_envs,
        batch_size=256,
        utd_ratio=4,
        updates_per_iter=updates_per_iter,
        training_starts=0 if updates else 10**9,
        random_steps=0,
        buffer_capacity=num_envs * 640,
    )
    carry = init_fn(agent, jax.random.PRNGKey(0))
    threshold = config.batch_size * config.utd_ratio if updates else 0
    while True:
        carry, m = run_chunk(carry, iters)
        if int(np.asarray(m["buffer_size"][-1])) >= threshold:
            break
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry, m = run_chunk(carry, iters)
        np.asarray(m["reward_mean"][-1])
        best = min(best, time.perf_counter() - t0)
    steps_s = iters * config.num_envs / best
    grads_s = (
        iters * config.updates_per_iter * config.utd_ratio / best
        if updates else 0.0
    )
    return steps_s, grads_s, 1000 * best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--num_envs", type=int, default=16)
    args = p.parse_args()

    rows = []
    for label, kw in (
        ("full loop, reference ratio (UTD4 x2 upd/iter)",
         dict(updates=True, shared_encoder=False)),
        ("full loop, UTD4 x1 upd/iter (the shape r2's doc measured)",
         dict(updates=True, shared_encoder=False, updates_per_iter=1)),
        ("full loop, SHARED camera encoder (UTD4 x2)",
         dict(updates=True, shared_encoder=True)),
        ("actor-only (act + render + insert)",
         dict(updates=False, shared_encoder=False)),
        ("full loop @64px, reference ratio",
         dict(updates=True, shared_encoder=False, image_size=64)),
    ):
        kw.setdefault("image_size", args.image_size)
        s, g, ms = bench_loop(num_envs=args.num_envs, **kw)
        rows.append((label, s, g, ms))
        print(f"| {label} | {s:,.0f} | {g:,.0f} | {ms:.1f} |", flush=True)
    return rows


if __name__ == "__main__":
    main()
