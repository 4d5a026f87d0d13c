"""On-device (HBM-resident) circular replay buffer.

TPU-first replacement for the reference's host-side numpy buffers
(`serl_launcher/data/replay_buffer.py`, `memory_efficient_replay_buffer.py`,
`dataset.py:104-129` — whose jit `sample_jax` gather is the seed of this
design). The buffer is a pytree of preallocated `(capacity, ...)` arrays that
lives in device memory:

  * `insert` scatters a whole lockstep env batch at once
    (`buf.at[idx].set(x)`); callers should donate the state so XLA updates
    in place — zero host↔device traffic in the hot loop.
  * `sample` is a batched `jnp.take` gather.
  * Frame-stacking is index arithmetic at sample time (idx, idx-1, ...) with
    episode-boundary masking — replacing the reference's host
    `sliding_window_view` stride tricks and pack/unpack transfer hack
    (`memory_efficient_replay_buffer.py:91-164`, `train_utils.py:44-66`),
    which exist only to halve host->device copies the TPU design doesn't make.
  * RLPD-style 50/50 demo/online mixing (`train_utils.concat_batches`,
    `async_drq_sim.py:269-292`) is `sample_mixed` over two buffer states.

All functions are pure and jit/scan-safe; the state can be sharded over a mesh
along the capacity axis or replicated per data-parallel shard.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from serl_tpu.common.typing import Batch, Data, PRNGKey


class ReplayBufferState(struct.PyTreeNode):
    """Pytree state of a circular buffer.

    data: dict of (capacity, ...) arrays — keys: observations (possibly a
        nested dict), actions, rewards, masks, dones [, next_observations].
    insert_index: next write position.
    size: number of valid rows (<= capacity).
    ep_id: per-row episode id, used to mask frame stacks that would cross an
        episode boundary (replaces `_is_correct_index`,
        memory_efficient_replay_buffer.py:126-146).
    """

    data: Batch
    insert_index: jax.Array
    size: jax.Array
    ep_id: jax.Array
    # Temporal stride between a row and its successor. Lockstep env loops
    # insert N rows per control step (one per env), so row i's successor is
    # i+N, NOT i+1; bulk demo loads are episode-major with stride 1. Stored
    # per-state so one ReplayBuffer spec can serve both (sample_mixed).
    stride: jax.Array


def _zeros_like_spec(example: Data, capacity: int) -> Data:
    return jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), dtype=jnp.asarray(x).dtype),
        example,
    )


class ReplayBuffer:
    """Static spec + pure functions over `ReplayBufferState`.

    `store_next_obs=False` enables the memory-efficient layout: only
    `observations` are stored and `next_observations` are reconstructed at
    sample time as the row at `idx+1` (valid because transitions are inserted
    in episode order, like the reference's packed layout).
    """

    def __init__(
        self,
        example_transition: Batch,
        capacity: int,
        store_next_obs: bool = True,
        image_keys: Tuple[str, ...] = (),
        num_stack: int = 1,
    ):
        self.capacity = int(capacity)
        self.store_next_obs = bool(store_next_obs)
        self.image_keys = tuple(image_keys)
        self.num_stack = int(num_stack)
        example = dict(example_transition)
        if not store_next_obs:
            example.pop("next_observations", None)
        self._example = jax.tree.map(jnp.asarray, example)

    # ------------------------------------------------------------------ #

    def init_state(self, stride: int = 1) -> ReplayBufferState:
        """`stride` = rows inserted per control step (the lockstep env count).

        Successor/frame-stack index arithmetic steps by `stride`; the ring
        only stays temporally consistent if every insert writes exactly
        `stride` rows (lockstep loop) or the buffer is write-once (demo
        load, stride 1)."""
        if self.capacity % int(stride) != 0:
            raise ValueError(
                f"capacity {self.capacity} must be a multiple of stride {stride} "
                "so ring wraparound preserves the row<->successor offset"
            )
        return ReplayBufferState(
            data=_zeros_like_spec(self._example, self.capacity),
            insert_index=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            ep_id=jnp.full((self.capacity,), -1, jnp.int32),
            stride=jnp.asarray(int(stride), jnp.int32),
        )

    def insert(
        self, state: ReplayBufferState, transitions: Batch, ep_ids: jax.Array
    ) -> ReplayBufferState:
        """Scatter a batch of N transitions (one per env) into the ring.

        `ep_ids`: (N,) int32 episode identifiers (e.g. env_index * BIG +
        episode_count) so frame stacking can detect boundaries.
        """
        tr = dict(transitions)
        if not self.store_next_obs:
            tr.pop("next_observations", None)
        n = ep_ids.shape[0]
        idx = (state.insert_index + jnp.arange(n, dtype=jnp.int32)) % self.capacity
        new_data = jax.tree.map(
            lambda buf, x: buf.at[idx].set(x), state.data, tr
        )
        return state.replace(
            data=new_data,
            insert_index=(state.insert_index + n) % self.capacity,
            size=jnp.minimum(state.size + n, self.capacity),
            ep_id=state.ep_id.at[idx].set(ep_ids),
        )

    # ------------------------------------------------------------------ #

    def _gather_row(self, state: ReplayBufferState, idx: jax.Array) -> Batch:
        return jax.tree.map(lambda buf: jnp.take(buf, idx, axis=0), state.data)

    def _stack_obs(
        self, state: ReplayBufferState, obs_tree: Data, idx: jax.Array
    ) -> Data:
        """Attach a (B, T, H, W, C) frame-stack axis to image keys by gathering
        idx-(T-1)..idx, clamping frames from other episodes to the oldest valid
        frame (reference behavior: stacks never cross episode boundaries).

        The stack axis is ALWAYS present on sampled image keys (even T=1):
        serl_tpu's convention is an explicit frame-stack axis everywhere, which
        removes the reference's (T,H,W,C)-vs-(B,H,W,C) rank ambiguity
        (encoding.py:41-44)."""
        if not self.image_keys:
            return obs_tree
        T = self.num_stack
        # offsets: T-1 ... 0 so time axis is oldest->newest like the reference
        offs = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        raw = (idx[:, None] - offs[None, :] * state.stride) % self.capacity  # (B, T)
        anchor_ep = jnp.take(state.ep_id, idx)  # (B,)
        ep = jnp.take(state.ep_id, raw)  # (B, T)
        valid = ep == anchor_ep[:, None]
        # first valid offset per row: replace invalid frames with the oldest
        # valid one (clamp-to-edge padding of the episode start)
        # compute, per row, the most recent invalid->valid switch
        first_valid = jnp.argmax(valid.astype(jnp.int32), axis=1)  # (B,)
        safe = jnp.where(
            valid, raw, jnp.take_along_axis(raw, first_valid[:, None], axis=1)
        )  # (B, T)

        out = dict(obs_tree)
        for k in self.image_keys:
            frames = jnp.take(state.data["observations"][k], safe.reshape(-1), axis=0)
            out[k] = frames.reshape(safe.shape + frames.shape[1:])
        return out

    def sample(
        self, state: ReplayBufferState, rng: PRNGKey, batch_size: int
    ) -> Batch:
        """Uniform batched gather. With `store_next_obs=False`, next_obs is the
        successor row (idx + stride). The newest `stride` rows — whose
        successors are not written yet — are excluded from sampling; rows
        whose successor belongs to a different episode (exactly the terminal
        rows, where masks=0 kills the bootstrap term anyway) fall back to
        next=s, matching the reference memory-efficient buffer's boundary
        handling (memory_efficient_replay_buffer.py:126-146)."""
        if self.store_next_obs:
            max_idx = jnp.maximum(state.size, 1)
            idx = jax.random.randint(rng, (batch_size,), 0, max_idx)
        else:
            n_valid = jnp.maximum(state.size - state.stride, 1)
            u = jax.random.randint(rng, (batch_size,), 0, n_valid)
            # valid window is the `size` most recent rows ending at
            # insert_index-1; skip the newest `stride` of them
            idx = (state.insert_index - state.size + u) % self.capacity

        batch = self._gather_row(state, idx)
        obs = batch["observations"]
        obs = self._stack_obs(state, obs, idx) if isinstance(obs, dict) else obs

        if self.store_next_obs:
            next_obs = batch["next_observations"]
            if isinstance(next_obs, dict):
                next_obs = self._stack_obs(state, next_obs, idx)
        else:
            nxt = (idx + state.stride) % self.capacity
            same_ep = jnp.take(state.ep_id, nxt) == jnp.take(state.ep_id, idx)
            safe_nxt = jnp.where(same_ep, nxt, idx)
            next_obs = jax.tree.map(
                lambda buf: jnp.take(buf, safe_nxt, axis=0),
                state.data["observations"],
            )
            if isinstance(next_obs, dict):
                next_obs = self._stack_obs(state, next_obs, safe_nxt)

        out = dict(batch)
        out["observations"] = obs
        out["next_observations"] = next_obs
        return out

    def sample_mixed(
        self,
        state_a: ReplayBufferState,
        state_b: "ReplayBufferState",
        rng: PRNGKey,
        batch_size: int,
        buffer_b: Optional["ReplayBuffer"] = None,
    ) -> Batch:
        """50/50 RLPD sampling: half from each buffer (reference
        `concat_batches`, train_utils.py:16-31).

        Rows are INTERLEAVED (a0, b0, a1, b1, ...) rather than concatenated
        so that any contiguous minibatch block — `update_high_utd` reshapes
        the batch into utd_ratio contiguous minibatches — is itself 50/50,
        matching the reference learner where every individual gradient step
        samples a fresh half-demo batch (async_drq_sim.py:269-292)."""
        buffer_b = buffer_b or self
        ka, kb = jax.random.split(rng)
        half = batch_size // 2
        a = self.sample(state_a, ka, half)
        b = buffer_b.sample(state_b, kb, batch_size - half)
        if batch_size % 2 == 0:
            return jax.tree.map(
                lambda x, y: jnp.stack([x, y], axis=1).reshape(
                    (batch_size,) + x.shape[1:]
                ),
                a,
                b,
            )
        return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)

    # ------------------------------------------------------------------ #

    def load_transitions(
        self, state: ReplayBufferState, transitions: Batch
    ) -> ReplayBufferState:
        """Bulk host->device preload (demo trajectories). `transitions` is a
        pytree of (N, ...) host arrays with an `ep_ids` entry."""
        tr = dict(transitions)
        ep_ids = jnp.asarray(tr.pop("ep_ids"))
        return self.insert(state, jax.tree.map(jnp.asarray, tr), ep_ids)
