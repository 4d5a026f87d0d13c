"""Benchmark: fused actor/learner system throughput on PandaPickCube.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary value = env-steps/s of the full fused STATE workload (128 lockstep
envs + SAC updates at UTD 8, batch 256, reference hyperparameters) on one
chip. Extra keys report the DrQ PIXEL workload (16 envs, 2x128x128 cameras
rendered in-graph, UTD 4 x2 updates, batch 256) and updates/s for both —
BASELINE.json's stated metric is env-steps/s AND updates/s for state and
DrQ.

vs_baseline = ratio against the reference stack's equivalent: the MuJoCo C
engine stepping the same arena scene (10 substeps per 20 ms control step) on
this host's CPU — the physics loop that bounds the reference actor's
throughput (franka_sim/envs/panda_pick_gym_env.py:205-217). Measured live
when the `mujoco` package is available; falls back to a recorded value.
"""

import json
import time

import jax

# Persistent XLA compilation cache: first-ever compile of the fused system
# through the TPU tunnel can take minutes; cached recompiles are seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

MUJOCO_PROXY_FALLBACK = 900.0  # control-steps/s, measured on this host


def bench_reference_proxy(seconds: float = 3.0) -> float:
    """Reference physics throughput: mj_step x10 per control step, 1 env."""
    try:
        import mujoco

        m = mujoco.MjModel.from_xml_path(
            "/root/reference/franka_sim/franka_sim/envs/xmls/arena.xml"
        )
        d = mujoco.MjData(m)
        mujoco.mj_forward(m, d)
        # warmup
        for _ in range(50):
            for _ in range(10):
                mujoco.mj_step(m, d)
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            for _ in range(10):
                mujoco.mj_step(m, d)
            n += 1
        return n / (time.perf_counter() - t0)
    except Exception:
        return MUJOCO_PROXY_FALLBACK


def _bench_fused(make_experiment, iters: int, **kwargs):
    """Time `iters` fused iterations; returns (env_steps/s, updates/s).

    The timed quantity is wall-clock between completed host-visible metric
    fetches — through the remote-TPU tunnel `block_until_ready` does not
    actually wait for the computation, so each measurement fetches a metric
    scalar to force completion.
    """
    import numpy as np

    env, agent, rb, config, init_fn, run_chunk = make_experiment(**kwargs)
    carry = init_fn(agent, jax.random.PRNGKey(0))
    # warmup with the SAME static chunk length as the timed call (num_iters
    # is static: a different length would recompile), repeated until the
    # buffer is past the training threshold so updates are ACTIVE during
    # every timed chunk (timing an update-free chunk would overstate
    # throughput several-fold).
    threshold = max(
        config.training_starts, config.batch_size * config.utd_ratio
    )
    while True:
        carry, m = run_chunk(carry, iters)
        # forces completion (device->host); block_until_ready does not
        # actually wait through the remote-TPU tunnel
        if int(np.asarray(m["buffer_size"][-1])) >= threshold:
            break

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry, m = run_chunk(carry, iters)
        np.asarray(m["reward_mean"][-1])
        best = min(best, time.perf_counter() - t0)
    env_steps_s = iters * config.num_envs / best
    # gradient steps (critic) per second: updates_per_iter high-UTD calls
    updates_s = iters * config.updates_per_iter * config.utd_ratio / best
    return env_steps_s, updates_s


def bench_state():
    from serl_tpu.training.launcher import make_state_sim_experiment

    return _bench_fused(
        make_state_sim_experiment,
        iters=50,
        seed=0,
        num_envs=128,
        updates_per_iter=1,
        utd_ratio=8,
        training_starts=1000,
        random_steps=1000,
        buffer_capacity=100_000,
    )


def bench_pixels(encoder_type: str = "small"):
    from serl_tpu.training.launcher import make_drq_sim_experiment

    return _bench_fused(
        make_drq_sim_experiment,
        iters=25,
        seed=0,
        encoder_type=encoder_type,
        num_envs=16,
        batch_size=256,
        utd_ratio=4,
        updates_per_iter=2,
        training_starts=0,
        random_steps=0,
        buffer_capacity=10_000,
    )


def main():
    import os

    state_steps, state_updates = bench_state()
    pixel_steps, pixel_updates = bench_pixels()
    # the reference's DEFAULT DrQ encoder (frozen pretrained ResNet-10,
    # grafted from the committed sim-pretrained pkl)
    resnet_steps = resnet_updates = None
    if os.path.exists("resnet10_params.pkl"):
        resnet_steps, resnet_updates = bench_pixels("resnet-pretrained")
    ref = bench_reference_proxy()
    # Reference PIXEL actor proxy: mj_step x10 + TWO 128px offscreen renders
    # per control step (panda_pick_gym_env.py:205-231). No GL backend exists
    # in this image (glfw/egl/osmesa all fail headless), so the physics-only
    # rate stands in as an UPPER bound on the reference's pixel rate — the
    # renders only slow it down — making drq_vs_baseline a LOWER bound on
    # our advantage.
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(state_steps, 1),
                "unit": "env-steps/s (fused actor+learner, UTD8, 1 chip)",
                "vs_baseline": round(state_steps / ref, 2),
                "state_updates_per_s": round(state_updates, 1),
                "drq_env_steps_per_s": round(pixel_steps, 1),
                "drq_updates_per_s": round(pixel_updates, 1),
                # vs the render-free reference proxy: conservative lower bound
                "drq_vs_baseline": round(pixel_steps / ref, 3),
                **(
                    {
                        "drq_resnet_env_steps_per_s": round(resnet_steps, 1),
                        "drq_resnet_updates_per_s": round(resnet_updates, 1),
                    }
                    if resnet_steps is not None
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
