"""Benchmark: fused actor/learner system throughput on PandaPickCube.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = env-steps/s of the full fused system (128 lockstep envs + SAC
updates at UTD 8, batch 256, reference hyperparameters) on one chip.

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


def bench_fused_system() -> float:
    import jax

    from serl_tpu.training.launcher import make_state_sim_experiment

    env, agent, rb, config, init_fn, run_chunk = make_state_sim_experiment(
        seed=0,
        num_envs=128,
        updates_per_iter=1,
        utd_ratio=8,
        training_starts=1000,
        random_steps=1000,
        buffer_capacity=100_000,
    )
    carry = init_fn(agent, jax.random.PRNGKey(0))
    # warmup with the SAME static chunk length as the timed call (num_iters is
    # a static argument: a different length would recompile and the timing
    # would measure XLA compilation, not the system); the warmup call also
    # fills the buffer past training_starts so updates are active during
    # timing.
    iters = 50
    carry, _ = run_chunk(carry, iters)
    jax.block_until_ready(carry.env_steps)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry, _ = run_chunk(carry, iters)
        jax.block_until_ready(carry.env_steps)
        best = min(best, time.perf_counter() - t0)
    return iters * config.num_envs / best


def main():
    ours = bench_fused_system()
    ref = bench_reference_proxy()
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(ours, 1),
                "unit": "env-steps/s (fused actor+learner, UTD8, 1 chip)",
                "vs_baseline": round(ours / ref, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
