"""Speed-of-light analysis for the DrQ pixel update (VERDICT r4 item 3).

The high-UTD DrQ update is >90% of the pixel loop, and its FLOPs are ~all
encoder convs. This tool establishes the ACHIEVABLE ceiling for exactly
that conv work on this chip, then measures how close the full RL update
runs to it:

  sol        — standalone two-camera encoder tower: critic-shaped work
               (obs fwd+bwd via jax.grad + target next-obs fwd) on the
               update's exact shapes, nothing else. This is the
               architecture's speed of light on this hardware: if the full
               update matches it, the RL program adds no schedulable slack
               and further gains require a different architecture (not
               allowed — recipe parity) or more chips.
  update     — the real `update_high_utd` (UTD 4 + actor step, aug on)
  shared     — update with ONE encoder shared by both cameras (batch-axis
               concat path in ObsEncoder)
  shared2    — shared encoder applied per camera (no concat) — isolates
               whether the batch-concat or the weight sharing causes the
               r4 shared-camera slowdown (VERDICT r4 weak #2)

MFU is computed from XLA's own cost model (`compiled.cost_analysis()
['flops']`), not hand FLOP counts. Optional `--trace DIR` dumps a profiler
trace of one update for op-level inspection.

Run: python tools/perf_speed_of_light.py [--iters 20] [--trace /tmp/tr]
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

from tools.mfu_experiments import make_agent, make_batch, bench_update

IMAGE_KEYS = ("front", "wrist")
V5E_BF16_PEAK = 197e12  # TFLOP/s, one v5e chip


def time_fn(fn, args, iters):
    import numpy as np

    # fetch a scalar each round: through the remote-TPU tunnel
    # block_until_ready does NOT wait for completion (same workaround as
    # bench.py)
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def compiled_flops(fn, args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception as e:  # pragma: no cover - cost model availability
        print(f"  (cost_analysis unavailable: {e})")
        return 0.0


def sol_bench(batch_size, utd, iters, size=128):
    """Critic-shaped conv work alone: per UTD minibatch, obs fwd+bwd and
    next-obs fwd through both camera encoders; scanned utd times like the
    real update."""
    from serl_tpu.vision.encoders import SmallEncoder

    enc = {
        k: SmallEncoder(
            pool_method="spatial_learned_embeddings",
            compute_dtype=jnp.bfloat16,
            name=f"encoder_{k}",
        )
        for k in IMAGE_KEYS
    }
    sample = jnp.zeros((1, size, size, 3), jnp.uint8)
    params = {k: enc[k].init(jax.random.PRNGKey(i), sample)["params"]
              for i, k in enumerate(IMAGE_KEYS)}

    def tower(params, obs, next_obs):
        def loss(p):
            feats = [enc[k].apply({"params": p[k]}, obs[k]) for k in IMAGE_KEYS]
            return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats)

        l, grads = jax.value_and_grad(loss)(params)
        tgt = [
            jax.lax.stop_gradient(
                enc[k].apply({"params": params[k]}, next_obs[k])
            )
            for k in IMAGE_KEYS
        ]
        return l + sum(jnp.sum(t.astype(jnp.float32)) for t in tgt), grads

    def scan_fn(params, obs_all, next_all):
        def body(c, x):
            o, n = x
            l, g = tower(params, o, n)
            # consume the grads or XLA dead-code-eliminates the whole
            # backward pass
            gsum = sum(
                jnp.sum(leaf.astype(jnp.float32) ** 2)
                for leaf in jax.tree.leaves(g)
            )
            return c + l + gsum, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros(()), (obs_all, next_all)
        )
        return acc

    k = jax.random.PRNGKey(0)
    obs_all = {
        k2: jax.random.randint(
            jax.random.fold_in(k, i), (utd, batch_size, size, size, 3), 0, 255,
            jnp.uint8,
        )
        for i, k2 in enumerate(IMAGE_KEYS)
    }
    next_all = jax.tree.map(lambda x: x, obs_all)
    fn = jax.jit(scan_fn)
    flops = compiled_flops(scan_fn, (params, obs_all, next_all))
    dt = time_fn(fn, (params, obs_all, next_all), iters)
    return dt, flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--utd", type=int, default=4)
    p.add_argument("--trace", default=None)
    p.add_argument("--variants", default="sol,update,shared,shared2")
    args = p.parse_args()
    variants = args.variants.split(",")

    if "sol" in variants:
        dt, flops = sol_bench(args.batch, args.utd, args.iters)
        tf = flops / dt / 1e12 if flops else 0.0
        print(
            f"sol: {dt*1e3:.1f} ms / {args.utd}-minibatch critic conv tower "
            f"({flops/1e9:.0f} GFLOP by XLA cost model) -> {tf:.1f} TFLOP/s "
            f"= {100*tf*1e12/V5E_BF16_PEAK:.1f}% of v5e bf16 peak",
            flush=True,
        )

    batch = make_batch(0, args.batch, args.utd)

    def measure_update(variant_name, **agent_kwargs):
        agent = make_agent("baseline", batch, **agent_kwargs)
        ups = bench_update(agent, batch, args.utd, args.iters)
        fn = lambda a, b: a.update_high_utd(b, utd_ratio=args.utd)
        flops = compiled_flops(fn, (agent, batch))
        per_call = args.utd / ups  # seconds per update_high_utd call
        tf = flops / per_call / 1e12 if flops else 0.0
        print(
            f"{variant_name}: {ups:.1f} critic-grad-steps/s "
            f"({flops/1e9:.0f} GFLOP/call) -> {tf:.1f} TFLOP/s = "
            f"{100*tf*1e12/V5E_BF16_PEAK:.1f}% MFU",
            flush=True,
        )
        return agent

    agent = None
    if "update" in variants:
        agent = measure_update("update")
    if "shared" in variants:
        measure_update("shared", shared=True)
    if "shared2" in variants:
        measure_update("shared2", shared=True, no_concat=True)

    if args.trace and agent is not None:
        with jax.profiler.trace(args.trace):
            a, info = agent.update_high_utd(batch, utd_ratio=args.utd)
            jax.block_until_ready(jax.tree.leaves(info)[0])
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
