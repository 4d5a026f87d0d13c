"""Scripted expert policy for PandaPickCube.

Role parity: the reference records human demonstrations via spacemouse
teleop (`examples/*/record_demo.py`, SpacemouseIntervention wrapper) to seed
RLPD's 50/50 demo buffer. On TPU we generate equivalent demonstrations with
a batched scripted pick policy — a stateless geometric state machine
(approach above the block, descend, close, lift) computed from the physics
state, jit/vmap-friendly, with optional exploration noise. The same function
doubles as the "expert intervention" source for intervention-style training
(wrappers.py SpacemouseIntervention analogue).
"""

import jax
import jax.numpy as jnp

from serl_tpu.envs.panda_pick import EnvState
from serl_tpu.envs.physics import engine


def expert_action(
    state: EnvState, rng: jnp.ndarray = None, noise_scale: float = 0.0
) -> jnp.ndarray:
    """(4,) action for one env. Phases inferred from geometry each step."""
    phys = state.physics
    tcp, _, block = engine.observe(phys)
    mocap = phys.mocap_pos
    theta = phys.theta

    xy_err = jnp.linalg.norm(tcp[:2] - block[:2])
    lifted = block[2] > 0.06
    closing = theta > 0.25

    # targets per phase
    above = jnp.concatenate([block[:2], jnp.asarray([0.18])])
    down = jnp.concatenate([block[:2], block[2:3] - 0.006])
    lift = jnp.concatenate([block[:2], jnp.asarray([0.35])])

    aligned = xy_err < 0.010
    near_grasp = aligned & (tcp[2] < block[2] + 0.012)

    target = jnp.where(
        closing | lifted,
        lift,
        jnp.where(aligned, down, above),
    )
    grasp = jnp.where(near_grasp | closing | lifted, 1.0, -1.0)

    delta = jnp.clip((target - mocap) / 0.1, -1.0, 1.0)
    action = jnp.concatenate([delta, grasp[None]])
    if rng is not None and noise_scale > 0.0:
        action = action + noise_scale * jax.random.normal(rng, (4,))
    return jnp.clip(action, -1.0, 1.0)
