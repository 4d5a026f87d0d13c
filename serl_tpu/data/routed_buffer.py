"""Task-routed replay buffer: per-stream rings with masked (conditional)
insert.

Why it exists: the reference's fwbw bin-relocation workload (E6) runs ONE
robot whose active task flips at classifier success
(`/root/reference/serl_robot_infra/franka_env/envs/wrappers.py:36-44`
task_graph), and each transition streams to the buffer of the policy that
owns the active task
(`/root/reference/examples/async_bin_relocation_fwbw_drq/
async_drq_randomized.py:106-109,176-185` — two TrainerClients on distinct
port pairs). In the TPU-native fused program the env batch lives in one jit
loop, so "send to the fw or bw learner" becomes a conditional write: every
lockstep step, each env writes its transition into the buffer of its CURRENT
task and leaves the other buffer untouched.

Design: same `(slots, streams)` layout as `ReplayBuffer`, but the ring
cursor and size are per-stream `(streams,)` vectors. `insert` takes a
`(streams,)` bool mask; masked-out streams re-write their cursor row with
its existing contents (a read-modify-write identity — never clobbering a
potentially-valid oldest row when the ring is full) and do not advance.
Because each env's consecutive writes into a given buffer are consecutive
env steps of one task episode (tasks only flip at episode boundaries), the
memory-efficient successor/frame-stack index arithmetic of the parent class
holds unchanged per stream; episode-id masking covers the switch points.

Sampling draws exactly batch/streams rows per stream uniform over that
stream's own valid window. Marginal uniformity across the whole buffer is
only approximate here (streams accumulate different row counts depending on
how their task assignments unfolded), matching the reference's situation of
two asynchronously-filling buffers. The gather stays shard-local along the
streams axis under the dp layout (see `ReplayBuffer._gather_aligned`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from serl_tpu.common.typing import Batch, PRNGKey
from serl_tpu.data.replay_buffer import ReplayBuffer, _zeros_like_spec


class RoutedBufferState(struct.PyTreeNode):
    """Like `ReplayBufferState` but with per-stream cursor and size."""

    data: Batch
    insert_slot: jax.Array  # (streams,) int32 per-stream ring cursor
    size: jax.Array  # (streams,) int32 per-stream valid row count
    ep_id: jax.Array  # (slots, streams)


class RoutedReplayBuffer(ReplayBuffer):
    """Masked per-stream ring buffer (see module docstring)."""

    def init_state(self, streams: int = 1) -> RoutedBufferState:
        if self.capacity % int(streams) != 0:
            raise ValueError(
                f"capacity {self.capacity} must be a multiple of the stream "
                f"count {streams}"
            )
        slots = self.capacity // int(streams)
        return RoutedBufferState(
            data=_zeros_like_spec(self._example, slots, int(streams)),
            insert_slot=jnp.zeros((int(streams),), jnp.int32),
            size=jnp.zeros((int(streams),), jnp.int32),
            ep_id=jnp.full((slots, int(streams)), -1, jnp.int32),
        )

    # ------------------------------------------------------------------ #

    def insert(
        self,
        state: RoutedBufferState,
        transitions: Batch,
        ep_ids: jax.Array,
        mask: jax.Array = None,
    ) -> RoutedBufferState:
        """Write one row per stream WHERE `mask` is set; other streams are
        untouched (cursor stays, existing data re-written identically).

        transitions leaves: (streams, ...); ep_ids: (streams,) int32;
        mask: (streams,) bool (None = all streams, degenerating to the
        lockstep parent semantics with per-stream bookkeeping)."""
        tr = dict(transitions)
        if not self.store_next_obs:
            tr.pop("next_observations", None)
        idx = state.insert_slot  # (streams,)
        slots = state.ep_id.shape[0]
        streams = idx.shape[0]
        if mask is None:
            mask = jnp.ones((streams,), bool)

        def upd(buf, x):
            # per-stream read-modify-write at each stream's own cursor:
            # vmap over the streams axis of a slots-axis dynamic update.
            x = x.astype(buf.dtype)
            m = mask.reshape((streams,) + (1,) * (x.ndim - 1))

            def one(col, xi, ii, mi):
                old = jax.lax.dynamic_index_in_dim(
                    col, ii, axis=0, keepdims=False
                )
                return jax.lax.dynamic_update_index_in_dim(
                    col, jnp.where(mi, xi, old), ii, axis=0
                )

            return jax.vmap(one, in_axes=(1, 0, 0, 0), out_axes=1)(
                buf, x, idx, m
            )

        new_data = jax.tree.map(upd, state.data, tr)
        new_ep = jax.vmap(
            lambda col, xi, ii, mi: jax.lax.dynamic_update_index_in_dim(
                col,
                jnp.where(
                    mi,
                    xi,
                    jax.lax.dynamic_index_in_dim(col, ii, 0, keepdims=False),
                ),
                ii,
                axis=0,
            ),
            in_axes=(1, 0, 0, 0),
            out_axes=1,
        )(state.ep_id, ep_ids.astype(jnp.int32), idx, mask)
        return state.replace(
            data=new_data,
            insert_slot=jnp.where(mask, (idx + 1) % slots, idx),
            size=jnp.where(
                mask, jnp.minimum(state.size + 1, slots), state.size
            ),
            ep_id=new_ep,
        )

    # ------------------------------------------------------------------ #

    def total_rows(self, state: RoutedBufferState) -> jax.Array:
        return state.size.sum()

    def _sample_aligned(
        self, state: RoutedBufferState, rng: PRNGKey, batch_size: int
    ) -> Batch:
        """Per-stream uniform draw over each stream's OWN valid window.
        Streams that have never been written (size 0) fall back to their
        cursor slot (zero rows, ep_id -1) — callers gate training on
        `state.size.min()` to keep those out of real batches."""
        slots, streams = state.ep_id.shape
        R = batch_size // streams
        sub = 0 if self.store_next_obs else 1
        n_valid = jnp.maximum(state.size - sub, 1)  # (streams,)
        u = jnp.floor(
            jax.random.uniform(rng, (R, streams)) * n_valid[None, :]
        ).astype(jnp.int32)
        s2 = (state.insert_slot[None, :] - state.size[None, :] + u) % slots
        return self._gather_batch_aligned(state, s2)

    def sample(
        self, state: RoutedBufferState, rng: PRNGKey, batch_size: int
    ) -> Batch:
        streams = state.ep_id.shape[1]
        if batch_size % streams != 0:
            raise ValueError(
                f"RoutedReplayBuffer requires batch_size ({batch_size}) "
                f"divisible by streams ({streams})"
            )
        return self._sample_aligned(state, rng, batch_size)
