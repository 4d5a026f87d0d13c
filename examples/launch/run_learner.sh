#!/usr/bin/env bash
# Learner half of the two-process async mode (reference:
# examples/async_sac_state_sim/run_learner.sh). The learner owns the
# accelerator; persistent XLA compile cache makes restarts fast.
set -euo pipefail
cd "$(dirname "$0")/../.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

exec python examples/async_sac_state_sim.py --learner \
    --batch_size 256 \
    --critic_actor_ratio 8 \
    --training_starts 1000 \
    "$@"
