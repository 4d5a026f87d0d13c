"""Agent/loop factories with the reference's canonical hyperparameters.

Capability parity: `serl_launcher/utils/launcher.py` — the single source of
truth for default hparams (make_sac_agent :50-76, make_drq_agent :79-116,
make_bc_agent :26-47). Values must match exactly for learning-curve parity:
ensemble 10 / subsample 2, temperature 1e-2, tanh activations + LayerNorm
256x256, discount 0.99 (state) / 0.96 (pixels), lr 3e-4.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from serl_tpu.agents.sac import SACAgent
from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.panda_pick import PandaPickCubeEnv, STATE_OBS_DIM, ACTION_DIM


def _round_up(n: int, k: int) -> int:
    """Smallest multiple of k >= n (ring capacity must divide by env count)."""
    return ((n + k - 1) // k) * k


def make_sac_agent(seed: int, obs_dim: int = STATE_OBS_DIM,
                   action_dim: int = ACTION_DIM, discount: float = 0.99,
                   **kwargs) -> SACAgent:
    """State-based SAC with reference defaults (launcher.py:50-76).

    Extra kwargs (e.g. bc_regularization) pass through to create_states."""
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
        **kwargs,
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


def make_drq_agent(
    seed: int,
    sample_obs,
    sample_action,
    image_keys=("image",),
    encoder_type: str = "small",
    shared_encoder: bool = False,
    discount: float = 0.96,
    **kwargs,
):
    """Pixel DrQ with reference defaults (launcher.py:79-116). Extra kwargs
    (e.g. optimizer overrides) pass through to create_drq."""
    from serl_tpu.agents.drq import DrQAgent

    return DrQAgent.create_drq(
        jax.random.PRNGKey(seed),
        sample_obs,
        sample_action,
        encoder_type=encoder_type,
        shared_encoder=shared_encoder,
        use_proprio=True,
        image_keys=tuple(image_keys),
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
        **kwargs,
    )


def make_pixel_replay_buffer(
    capacity: int = 200_000,
    image_keys=("front", "wrist"),
    image_size: int = 128,
    state_dim: int = 7,
    action_dim: int = ACTION_DIM,
    num_stack: int = 1,
) -> ReplayBuffer:
    """Memory-efficient pixel buffer: frames stored once, stacks + next_obs
    reconstructed at sample time (reference MemoryEfficientReplayBuffer)."""
    example = {
        "observations": {
            "state": jnp.zeros((state_dim,)),
            **{
                k: jnp.zeros((image_size, image_size, 3), jnp.uint8)
                for k in image_keys
            },
        },
        "actions": jnp.zeros((action_dim,)),
        "rewards": jnp.zeros(()),
        "masks": jnp.zeros(()),
        "dones": jnp.zeros(()),
    }
    return ReplayBuffer(
        example,
        capacity=capacity,
        store_next_obs=False,
        image_keys=tuple(image_keys),
        num_stack=num_stack,
    )


def make_drq_sim_experiment(
    seed: int = 0,
    encoder_type: str = "small",
    image_size: int = 128,
    shared_encoder: bool = False,
    **loop_overrides,
):
    """The async_drq_sim-equivalent workload: pixel PandaPickCube + DrQ."""
    from serl_tpu.training.loop import LoopConfig, make_fused_loop
    from serl_tpu.envs.wrappers import add_stack_axis, serl_obs

    env = PandaPickCubeEnv(image_obs=True, render_size=image_size)
    defaults = dict(utd_ratio=4, buffer_capacity=50_000)
    defaults.update(loop_overrides)
    config = LoopConfig(**defaults)
    config = config._replace(
        buffer_capacity=_round_up(config.buffer_capacity, config.num_envs)
    )
    rb = make_pixel_replay_buffer(
        capacity=config.buffer_capacity,
        image_size=image_size,
    )
    # build a sample obs through the same pipeline the loop uses — via
    # eval_shape: the factory only needs shapes/dtypes, and running an
    # unjitted reset+render op-by-op is pathologically slow on a remote
    # accelerator (every primitive is a round-trip)
    def _sample_obs(key):
        _, obs0 = env.reset(key)
        return jax.tree.map(
            lambda x: x[None], add_stack_axis(serl_obs(obs0), rb.image_keys)
        )

    shapes = jax.eval_shape(_sample_obs, jax.random.PRNGKey(0))
    sample = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    agent = make_drq_agent(
        seed, sample, jnp.zeros((1, ACTION_DIM)), image_keys=rb.image_keys,
        encoder_type=encoder_type, shared_encoder=shared_encoder,
    )
    init_fn, run_chunk = make_fused_loop(env, rb, config)
    return env, agent, rb, config, init_fn, run_chunk


def make_state_sim_experiment(seed: int = 0, **loop_overrides):
    """Everything needed for the async_sac_state_sim-equivalent workload."""
    from serl_tpu.training.loop import LoopConfig, make_fused_loop

    env = PandaPickCubeEnv()
    config = LoopConfig(**loop_overrides)
    config = config._replace(
        buffer_capacity=_round_up(config.buffer_capacity, config.num_envs)
    )
    rb = make_state_replay_buffer(capacity=config.buffer_capacity)
    agent = make_sac_agent(seed)
    init_fn, run_chunk = make_fused_loop(env, rb, config)
    return env, agent, rb, config, init_fn, run_chunk
