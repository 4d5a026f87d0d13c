"""serl_tpu — a TPU-native actor/learner RL framework.

A from-scratch rebuild of the capabilities of rail-berkeley/serl (sample-
efficient robotic RL: async actor/learner SAC/DrQ/BC/VICE on Franka
manipulation tasks), designed TPU-first:

  * the learner is a sharded, jit-compiled pure function over explicit param
    groups (no implicit module dicts) — gradients all-reduce through GSPMD,
  * the MuJoCo sim is replaced by a batched XLA physics engine stepping
    thousands of Panda+cube instances in lockstep under one jit,
  * the replay buffer lives in HBM as a donated circular pytree,
  * actor and learner run fused in a single device program (the TPU-native
    equivalent of the reference's zmq actor/learner split), with an optional
    multi-process mode over a native C++ transport.

Reference layer map: SURVEY.md; component parity: PARITY.md.

Public API (lazily importable submodules to keep import cheap):
    serl_tpu.agents       SACAgent, DrQAgent, BCAgent, VICEAgent
    serl_tpu.envs         PandaPickCubeEnv, tasks, wrappers, gym adapter
    serl_tpu.data         ReplayBuffer, Dataset, demos, host buffers
    serl_tpu.training     fused loop, launcher factories, runner, checkpoints
    serl_tpu.distributed  mesh/sharding, TrainerServer/Client transport
    serl_tpu.vision       encoders, augmentations, obs encoding
"""

__version__ = "0.1.0"

import os as _os

# Honor JAX_PLATFORMS=cpu even where an accelerator plugin ignores the env
# var (this environment's `axon` TPU plugin does): pin the platform via the
# config flag before any backend initializes. Without this, an "actor on
# CPU" process silently grabs the TPU and deadlocks the learner that owns it
# (same workaround as tests/conftest.py and __graft_entry__.py).
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
