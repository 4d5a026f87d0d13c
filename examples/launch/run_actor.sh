#!/usr/bin/env bash
# Actor half of the two-process async mode (reference:
# examples/async_sac_state_sim/run_actor.sh). On TPU hosts exactly one
# process can own the chip, so the actor defaults to the CPU backend
# (policy forward is a 256x256 MLP — CPU inference easily sustains the
# reference's 10 Hz control rate); unset ACTOR_PLATFORM to share a GPU
# the way the reference's XLA_PYTHON_CLIENT_MEM_FRACTION split does.
set -euo pipefail
cd "$(dirname "$0")/../.."

export JAX_PLATFORMS="${ACTOR_PLATFORM:-cpu}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

exec python examples/async_sac_state_sim.py --actor \
    --ip "${LEARNER_IP:-127.0.0.1}" \
    --random_steps 1000 \
    --steps_per_update 30 \
    "$@"
