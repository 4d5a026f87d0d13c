"""Agent/loop factories with the reference's canonical hyperparameters.

Capability parity: `serl_launcher/utils/launcher.py` — the single source of
truth for default hparams (make_sac_agent :50-76, make_drq_agent :79-116,
make_bc_agent :26-47). Values must match exactly for learning-curve parity:
ensemble 10 / subsample 2, temperature 1e-2, tanh activations + LayerNorm
256x256, discount 0.99 (state) / 0.96 (pixels), lr 3e-4.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from serl_tpu.agents.sac import SACAgent
from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.panda_pick import PandaPickCubeEnv, STATE_OBS_DIM, ACTION_DIM


def make_sac_agent(seed: int, obs_dim: int = STATE_OBS_DIM,
                   action_dim: int = ACTION_DIM, discount: float = 0.99) -> SACAgent:
    """State-based SAC with reference defaults (launcher.py:50-76)."""
    return SACAgent.create_states(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, obs_dim)),
        jnp.zeros((1, action_dim)),
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
        discount=discount,
        backup_entropy=False,
        critic_ensemble_size=10,
        critic_subsample_size=2,
    )


def make_state_replay_buffer(capacity: int = 200_000,
                             obs_dim: int = STATE_OBS_DIM,
                             action_dim: int = ACTION_DIM) -> ReplayBuffer:
    example = {
        "observations": jnp.zeros((obs_dim,)),
        "actions": jnp.zeros((action_dim,)),
        "next_observations": jnp.zeros((obs_dim,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }
    return ReplayBuffer(example, capacity=capacity)


def make_state_sim_experiment(seed: int = 0, **loop_overrides):
    """Everything needed for the async_sac_state_sim-equivalent workload."""
    from serl_tpu.training.loop import LoopConfig, make_fused_loop

    env = PandaPickCubeEnv()
    config = LoopConfig(**loop_overrides)
    rb = make_state_replay_buffer(capacity=config.buffer_capacity)
    agent = make_sac_agent(seed)
    init_fn, run_chunk = make_fused_loop(env, rb, config)
    return env, agent, rb, config, init_fn, run_chunk
