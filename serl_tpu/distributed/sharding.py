"""Mesh + sharding layout for the fused actor/learner.

The reference's distributed story is one actor process + one learner process
over zmq, with a scaffolded-but-degenerate `pmap_axis` hook
(SURVEY.md §2.6). The TPU-native layout replaces both:

  * a 1-D `dp` mesh over chips (ICI within a host, DCN across hosts),
  * env batch axis sharded over `dp` — each shard owns num_envs/n lockstep
    envs (physics runs fully local, no collectives),
  * replay buffer sharded over `dp` along the STREAMS axis (axis 1 of the
    (slots, streams, ...) layout): every insert is a dynamic_update_slice
    local to the shard that owns those envs' rings — no cross-device
    scatter (round-1 sharded the 1-D capacity axis, putting every insert
    through a scatter and every sample through an all-gather),
  * demo buffer replicated (small, read-only, sampled by every shard),
  * agent params/opt state replicated — GSPMD turns the batch-sharded loss
    gradients into an all-reduce over `dp` automatically (the explicit
    `lax.pmean` of the reference, `common/common.py:213-214`, is not needed).

Shardings are EXPLICIT per LoopCarry field (`carry_shardings`), not inferred
from divisibility (round-1's heuristic silently sharded any leaf whose
leading dim happened to divide the mesh).
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


def buffer_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """(slots, streams, ...) buffers: shard the streams axis."""
    return NamedSharding(mesh, P(None, axis))


def carry_shardings(carry, mesh: Mesh, axis: str = "dp"):
    """A LoopCarry-shaped pytree of NamedShardings, field by field."""
    rep = replicated(mesh)
    env = batch_sharded(mesh, axis)
    buf = buffer_sharded(mesh, axis)

    n_shards = mesh.shape[axis]
    num_envs = jax.tree.leaves(carry.env_states)[0].shape[0]
    if num_envs % n_shards != 0:
        raise ValueError(
            f"num_envs {num_envs} must divide evenly over {n_shards} shards"
        )
    streams = carry.rb_state.ep_id.shape[1]
    if streams % n_shards != 0:
        raise ValueError(
            f"buffer streams {streams} must divide evenly over {n_shards} shards"
        )

    def fill(tree, sh):
        return jax.tree.map(lambda _: sh, tree)

    return carry._replace(
        agent=fill(carry.agent, rep),
        env_states=fill(carry.env_states, env),
        obs=fill(carry.obs, env),
        rb_state=carry.rb_state.replace(
            data=fill(carry.rb_state.data, buf),
            insert_slot=rep,
            size=rep,
            ep_id=buf,
        ),
        demo_state=(
            None if carry.demo_state is None else fill(carry.demo_state, rep)
        ),
        rng=rep,
        env_steps=rep,
        ep_return=fill(carry.ep_return, env),
        ep_count=rep,
        ret_sum=rep,
        succ_sum=rep,
    )


def shard_carry(carry, mesh: Mesh, axis: str = "dp"):
    """Place a LoopCarry on the mesh with the explicit layout above."""
    shardings = carry_shardings(carry, mesh, axis)
    return jax.tree.map(
        lambda x, s: None if x is None else jax.device_put(x, s),
        carry,
        shardings,
        is_leaf=lambda x: x is None,
    )
