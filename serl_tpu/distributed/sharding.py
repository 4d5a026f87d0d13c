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


# ---------------------------------------------------------------------------
# Declarative per-field layout specs.
#
# Every carry field MUST appear in its spec; `_spec_shardings` raises on any
# field the spec does not name (round 2 regressed exactly here: a new
# `LoopCarry.intervening` field was silently passed through `_replace` as a
# raw array and crashed `jax.device_put`). Adding a carry field without
# declaring its layout is now a hard error, covered by
# tests/test_sharding.py::test_unknown_carry_field_rejected.
#
# Spec values: "rep" (replicated), "env" (leading env axis sharded over dp),
# "buffer" (the nested ReplayBufferState layout), "task" (nested TaskCarry).
# ---------------------------------------------------------------------------

LOOP_CARRY_SPEC = {
    "agent": "rep",
    "env_states": "env",
    "obs": "env",
    "rb_state": "buffer",
    "demo_state": "rep",  # small, read-only, sampled by every shard
    "rng": "rep",
    "env_steps": "rep",
    "ep_return": "env",
    "ep_count": "rep",
    "ret_sum": "rep",
    "succ_sum": "rep",
    "intervening": "env",  # per-env expert-takeover flag
    "chunk": "env",  # per-env rolling obs history (num_stack>1), env-sharded
}

# ReplayBufferState fields (serl_tpu/data/replay_buffer.py): data rides the
# (slots, streams) layout with streams sharded; cursors are scalars.
BUFFER_STATE_SPEC = {
    "data": "buffer_data",
    "insert_slot": "rep",
    "size": "rep",
    "ep_id": "buffer_data",
}

TASK_CARRY_SPEC = {
    "agent": "rep",
    "env_states": "env",
    "obs": "env",
    "rb_state": "buffer",
    "demo_state": "rep",
    "ep_return": "env",
    "ep_count": "rep",
    "ret_sum": "rep",
    "succ_sum": "rep",
    "intervening": "env",
}

FWBW_CARRY_SPEC = {
    "fw": "task",
    "bw": "task",
    "rng": "rep",
    "env_steps": "rep",
}

# RoutedBufferState (serl_tpu/data/routed_buffer.py): per-stream cursor and
# size ride the streams axis, so they shard with it — each device owns its
# envs' cursors end to end and the masked insert stays fully shard-local.
ROUTED_BUFFER_STATE_SPEC = {
    "data": "buffer_data",
    "insert_slot": "env",
    "size": "env",
    "ep_id": "buffer_data",
}

# ChainedCarry (serl_tpu/training/fwbw.py::make_chained_loop): ONE chained
# env batch sharded over dp; both agents replicated; both routed buffers
# sharded along streams; routed demo states replicated (small, read-only).
CHAINED_CARRY_SPEC = {
    "fw_agent": "rep",
    "bw_agent": "rep",
    "env_states": "env",
    "obs": "env",
    "fw_rb": "routed_buffer",
    "bw_rb": "routed_buffer",
    "fw_demo": "rep",
    "bw_demo": "rep",
    "rng": "rep",
    "env_steps": "rep",
    "ep_return": "env",
    "ep_count": "rep",
    "ret_sum": "rep",
    "succ_sum": "rep",
    "succ_gt_sum": "rep",
    "switch_sum": "rep",
    "intervening": "env",
}


def _fill(tree, sh):
    return jax.tree.map(lambda _: sh, tree)


def _buffer_state_shardings(rb_state, rep, buf):
    fields = set(type(rb_state).__dataclass_fields__)
    unknown = fields - set(BUFFER_STATE_SPEC)
    if unknown:
        raise ValueError(
            f"ReplayBufferState field(s) {sorted(unknown)} have no declared "
            "sharding — add them to BUFFER_STATE_SPEC "
            "(serl_tpu/distributed/sharding.py)"
        )
    kinds = {"buffer_data": buf, "rep": rep}
    return rb_state.replace(
        **{
            name: _fill(getattr(rb_state, name), kinds[kind])
            for name, kind in BUFFER_STATE_SPEC.items()
            if name in fields
        }
    )


def _routed_buffer_state_shardings(rb_state, rep, env, buf):
    fields = set(type(rb_state).__dataclass_fields__)
    unknown = fields - set(ROUTED_BUFFER_STATE_SPEC)
    if unknown:
        raise ValueError(
            f"RoutedBufferState field(s) {sorted(unknown)} have no declared "
            "sharding — add them to ROUTED_BUFFER_STATE_SPEC "
            "(serl_tpu/distributed/sharding.py)"
        )
    kinds = {"buffer_data": buf, "rep": rep, "env": env}
    return rb_state.replace(
        **{
            name: _fill(getattr(rb_state, name), kinds[kind])
            for name, kind in ROUTED_BUFFER_STATE_SPEC.items()
            if name in fields
        }
    )


def _spec_shardings(carry, spec, rep, env, buf):
    """Build a carry-shaped tree of shardings from a per-field spec.

    Raises on any carry field the spec does not name, so a new field cannot
    silently leak raw arrays into the shardings tree."""
    unknown = set(carry._fields) - set(spec)
    if unknown:
        raise ValueError(
            f"{type(carry).__name__} field(s) {sorted(unknown)} have no "
            "declared sharding — add them to the spec in "
            "serl_tpu/distributed/sharding.py"
        )
    out = {}
    for name in carry._fields:
        kind = spec[name]
        value = getattr(carry, name)
        if value is None:
            out[name] = None
        elif kind == "rep":
            out[name] = _fill(value, rep)
        elif kind == "env":
            out[name] = _fill(value, env)
        elif kind == "buffer":
            out[name] = _buffer_state_shardings(value, rep, buf)
        elif kind == "routed_buffer":
            out[name] = _routed_buffer_state_shardings(value, rep, env, buf)
        elif kind == "task":
            out[name] = _spec_shardings(value, TASK_CARRY_SPEC, rep, env, buf)
        else:
            raise ValueError(f"unknown sharding kind {kind!r} for {name}")
    return type(carry)(**out)


def _check_divisible(carry, mesh: Mesh, axis: str):
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


def carry_shardings(carry, mesh: Mesh, axis: str = "dp"):
    """A LoopCarry-shaped pytree of NamedShardings, field by field."""
    rep = replicated(mesh)
    env = batch_sharded(mesh, axis)
    buf = buffer_sharded(mesh, axis)
    _check_divisible(carry, mesh, axis)
    return _spec_shardings(carry, LOOP_CARRY_SPEC, rep, env, buf)


def fwbw_carry_shardings(carry, mesh: Mesh, axis: str = "dp"):
    """FwBwCarry layout: each task group's envs/buffer sharded over dp,
    both agents replicated (serl_tpu/training/fwbw.py)."""
    rep = replicated(mesh)
    env = batch_sharded(mesh, axis)
    buf = buffer_sharded(mesh, axis)
    _check_divisible(carry.fw, mesh, axis)
    _check_divisible(carry.bw, mesh, axis)
    return _spec_shardings(carry, FWBW_CARRY_SPEC, rep, env, buf)


def _device_put_tree(carry, shardings):
    return jax.tree.map(
        lambda x, s: None if x is None else jax.device_put(x, s),
        carry,
        shardings,
        is_leaf=lambda x: x is None,
    )


def shard_carry(carry, mesh: Mesh, axis: str = "dp"):
    """Place a LoopCarry on the mesh with the explicit layout above."""
    return _device_put_tree(carry, carry_shardings(carry, mesh, axis))


def shard_fwbw_carry(carry, mesh: Mesh, axis: str = "dp"):
    """Place a FwBwCarry on the mesh with the explicit layout above."""
    return _device_put_tree(carry, fwbw_carry_shardings(carry, mesh, axis))


def chained_carry_shardings(carry, mesh: Mesh, axis: str = "dp"):
    """ChainedCarry layout: chained env batch + both routed buffers sharded
    over dp, both agents replicated."""
    rep = replicated(mesh)
    env = batch_sharded(mesh, axis)
    buf = buffer_sharded(mesh, axis)
    n_shards = mesh.shape[axis]
    num_envs = jax.tree.leaves(carry.env_states)[0].shape[0]
    if num_envs % n_shards != 0:
        raise ValueError(
            f"num_envs {num_envs} must divide evenly over {n_shards} shards"
        )
    for rb in (carry.fw_rb, carry.bw_rb):
        if rb.ep_id.shape[1] % n_shards != 0:
            raise ValueError(
                f"buffer streams {rb.ep_id.shape[1]} must divide evenly "
                f"over {n_shards} shards"
            )
    return _spec_shardings(carry, CHAINED_CARRY_SPEC, rep, env, buf)


def shard_chained_carry(carry, mesh: Mesh, axis: str = "dp"):
    """Place a ChainedCarry on the mesh with the explicit layout above."""
    return _device_put_tree(carry, chained_carry_shardings(carry, mesh, axis))
