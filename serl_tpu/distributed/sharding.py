"""Mesh + sharding layout for the fused actor/learner.

The reference's distributed story is one actor process + one learner process
over zmq, with a scaffolded-but-degenerate `pmap_axis` hook
(SURVEY.md §2.6). The TPU-native layout replaces both:

  * a 1-D `dp` mesh over chips (ICI within a host, DCN across hosts),
  * env batch axis sharded over `dp` — each shard owns num_envs/n lockstep
    envs (physics runs fully local, no collectives),
  * replay buffer sharded over `dp` along the batch axis of each insert
    (row blocks interleave per shard; sampling gathers locally then XLA
    all-gathers the minibatch if needed),
  * agent params/opt state replicated — GSPMD turns the batch-sharded loss
    gradients into an all-reduce over `dp` automatically (the explicit
    `lax.pmean` of the reference, `common/common.py:213-214`, is not needed).

`shard_carry` annotates a LoopCarry built on one device with NamedShardings;
under jit the whole fused step then compiles to an SPMD program.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_carry(carry, mesh: Mesh, axis: str = "dp"):
    """Place a LoopCarry on the mesh: env-batched leaves sharded over `axis`,
    agent + scalars replicated, replay buffer sharded along capacity."""
    rep = replicated(mesh)
    shard0 = batch_sharded(mesh, axis)

    def place_env_leaf(x):
        # env-state leaves have a leading num_envs axis
        if x.ndim >= 1 and x.shape[0] % mesh.shape[axis] == 0:
            return jax.device_put(x, shard0)
        return jax.device_put(x, rep)

    def place_buffer_leaf(x):
        if x.ndim >= 1 and x.shape[0] % mesh.shape[axis] == 0:
            return jax.device_put(x, shard0)
        return jax.device_put(x, rep)

    new_env_states = jax.tree.map(place_env_leaf, carry.env_states)
    new_obs = jax.device_put(carry.obs, shard0)
    new_rb = jax.tree.map(place_buffer_leaf, carry.rb_state)
    new_demo = (
        None
        if carry.demo_state is None
        else jax.tree.map(place_buffer_leaf, carry.demo_state)
    )
    new_agent = jax.device_put(carry.agent, rep)
    return carry._replace(
        agent=new_agent,
        env_states=new_env_states,
        obs=new_obs,
        rb_state=new_rb,
        demo_state=new_demo,
        rng=jax.device_put(carry.rng, rep),
        env_steps=jax.device_put(carry.env_steps, rep),
        ep_return=jax.device_put(carry.ep_return, shard0),
        ep_count=jax.device_put(carry.ep_count, rep),
        ret_sum=jax.device_put(carry.ret_sum, rep),
        succ_sum=jax.device_put(carry.succ_sum, rep),
    )
