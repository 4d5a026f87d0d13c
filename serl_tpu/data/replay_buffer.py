"""On-device (HBM-resident) circular replay buffer.

TPU-first replacement for the reference's host-side numpy buffers
(`serl_launcher/data/replay_buffer.py`, `memory_efficient_replay_buffer.py`,
`dataset.py:104-129` — whose jit `sample_jax` gather is the seed of this
design).

Layout: every array is `(slots, streams, ...)` where `streams` is the number
of lockstep envs (or demo episodes) and `slots` is the per-stream ring length:

  * `insert` writes one full slot — a `dynamic_update_slice` at the ring
    cursor, NOT a scatter. Under a data-parallel mesh with the streams axis
    sharded, an insert is fully local to each shard (each device owns its
    envs' rings end to end); the round-1 1-D layout scattered every insert
    across devices.
  * temporal structure is explicit: stream `e`'s successor of slot `s` is
    `(s+1, e)`, and frame stacks gather `(s-k, e)` — the round-1 1-D layout
    had to encode this with a stride and silently broke when stride
    assumptions didn't hold (the DrQ-killing next_obs bug).
  * `sample` is a batched gather over (slot, stream) pairs; frame-stacking is
    index arithmetic with episode-boundary clamping (replacing the
    reference's host `sliding_window_view` stride tricks and pack/unpack
    transfer hack, `memory_efficient_replay_buffer.py:91-164`,
    `train_utils.py:44-66`).
  * RLPD 50/50 demo/online mixing (`train_utils.concat_batches`,
    `async_drq_sim.py:269-292`) is `sample_mixed`, row-interleaved so every
    contiguous UTD minibatch block is itself 50/50.

All functions are pure and jit/scan-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from serl_tpu.common.typing import Batch, Data, PRNGKey


class ReplayBufferState(struct.PyTreeNode):
    """Pytree state of a (slots, streams) ring buffer.

    data: dict of (slots, streams, ...) arrays — keys: observations (possibly
        a nested dict), actions, rewards, masks, dones [, next_observations].
    insert_slot: next slot (ring cursor, shared by all streams — inserts are
        lockstep full-width rows).
    size: number of valid slots (<= slots).
    ep_id: (slots, streams) per-row episode id, used to mask frame stacks /
        successors that would cross an episode boundary (replaces
        `_is_correct_index`, memory_efficient_replay_buffer.py:126-146).
    """

    data: Batch
    insert_slot: jax.Array
    size: jax.Array
    ep_id: jax.Array


def _zeros_like_spec(example: Data, slots: int, streams: int) -> Data:
    return jax.tree.map(
        lambda x: jnp.zeros(
            (slots, streams) + jnp.shape(x), dtype=jnp.asarray(x).dtype
        ),
        example,
    )


class ReplayBuffer:
    """Static spec + pure functions over `ReplayBufferState`.

    `store_next_obs=False` enables the memory-efficient layout: only
    `observations` are stored and `next_observations` are reconstructed at
    sample time as the next slot of the same stream.
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

    def init_state(self, streams: int = 1) -> ReplayBufferState:
        """`streams` = rows inserted per control step (the lockstep env
        count). Total row capacity is `capacity`, so the per-stream ring has
        `capacity // streams` slots."""
        if self.capacity % int(streams) != 0:
            raise ValueError(
                f"capacity {self.capacity} must be a multiple of the stream "
                f"count {streams}"
            )
        slots = self.capacity // int(streams)
        return ReplayBufferState(
            data=_zeros_like_spec(self._example, slots, int(streams)),
            insert_slot=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            ep_id=jnp.full((slots, int(streams)), -1, jnp.int32),
        )

    def init_from_episodes(
        self, transitions: Batch, ep_ids: jax.Array, episode_len: int
    ) -> ReplayBufferState:
        """Build a full, write-once buffer state from flat episode-major
        transitions (demo ingestion: each episode becomes a stream)."""
        tr = dict(transitions)
        if not self.store_next_obs:
            tr.pop("next_observations", None)
        n = jax.tree.leaves(tr)[0].shape[0]
        assert n % episode_len == 0, (n, episode_len)
        episodes = n // episode_len
        data = jax.tree.map(
            lambda x: jnp.swapaxes(
                jnp.asarray(x).reshape((episodes, episode_len) + x.shape[1:]), 0, 1
            ),
            tr,
        )
        return ReplayBufferState(
            data=data,
            insert_slot=jnp.zeros((), jnp.int32),
            size=jnp.asarray(episode_len, jnp.int32),
            ep_id=jnp.swapaxes(
                jnp.asarray(ep_ids, jnp.int32).reshape(episodes, episode_len), 0, 1
            ),
        )

    def insert(
        self, state: ReplayBufferState, transitions: Batch, ep_ids: jax.Array
    ) -> ReplayBufferState:
        """Write one lockstep slot: `transitions` leaves are (streams, ...).

        `ep_ids`: (streams,) int32 episode identifiers (e.g. env_index +
        episode_count * num_envs) so frame stacking / successor lookup can
        detect boundaries. A dynamic_update_slice at the ring cursor — local
        per stream shard, donation-friendly."""
        tr = dict(transitions)
        if not self.store_next_obs:
            tr.pop("next_observations", None)
        slot = state.insert_slot
        slots = state.ep_id.shape[0]
        new_data = jax.tree.map(
            lambda buf, x: jax.lax.dynamic_update_index_in_dim(
                buf, x.astype(buf.dtype), slot, axis=0
            ),
            state.data,
            tr,
        )
        return state.replace(
            data=new_data,
            insert_slot=(slot + 1) % slots,
            size=jnp.minimum(state.size + 1, slots),
            ep_id=jax.lax.dynamic_update_index_in_dim(
                state.ep_id, ep_ids.astype(jnp.int32), slot, axis=0
            ),
        )

    # ------------------------------------------------------------------ #

    def _gather(self, tree: Data, s: jax.Array, e: jax.Array) -> Data:
        """Rows (s_i, e_i) from (slots, streams, ...) arrays via one flat
        gather per leaf."""

        def g(buf):
            flat = buf.reshape((-1,) + buf.shape[2:])
            return jnp.take(flat, s * buf.shape[1] + e, axis=0)

        return jax.tree.map(g, tree)

    def _stack_obs(
        self,
        state: ReplayBufferState,
        obs_tree: Data,
        s: jax.Array,
        e: jax.Array,
    ) -> Data:
        """Attach a (B, T, H, W, C) frame-stack axis to image keys by
        gathering slots s-(T-1)..s of the same stream, clamping frames from
        other episodes to the oldest valid frame (reference behavior: stacks
        never cross episode boundaries).

        The stack axis is ALWAYS present on sampled image keys (even T=1):
        serl_tpu's convention is an explicit frame-stack axis everywhere,
        which removes the reference's (T,H,W,C)-vs-(B,H,W,C) rank ambiguity
        (encoding.py:41-44)."""
        if not self.image_keys:
            return obs_tree
        T = self.num_stack
        slots = state.ep_id.shape[0]
        # offsets T-1 ... 0 so the time axis is oldest->newest
        offs = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        raw_s = (s[:, None] - offs[None, :]) % slots  # (B, T)
        anchor_ep = state.ep_id[s, e]  # (B,)
        ep = state.ep_id[raw_s, e[:, None]]  # (B, T)
        valid = ep == anchor_ep[:, None]
        first_valid = jnp.argmax(valid.astype(jnp.int32), axis=1)  # (B,)
        safe_s = jnp.where(
            valid, raw_s, jnp.take_along_axis(raw_s, first_valid[:, None], axis=1)
        )  # (B, T)

        out = dict(obs_tree)
        B = s.shape[0]
        for k in self.image_keys:
            frames = self._gather(
                state.data["observations"][k],
                safe_s.reshape(-1),
                jnp.repeat(e, T),
            )
            out[k] = frames.reshape((B, T) + frames.shape[1:])
        return out

    # ---------------- stream-aligned (shard-local) sampling -------------- #

    def _gather_aligned(self, tree: Data, s2: jax.Array) -> Data:
        """Rows (s2[r,j], j) from (slots, streams, ...) arrays via
        take_along_axis on the SLOTS axis only — with the streams axis
        dp-sharded this compiles to a fully shard-local gather (each device
        samples its own envs' rings; the whole-buffer all-gather the
        global-index path provokes under GSPMD is the dominant cross-chip
        cost of a sharded learner). Output is stream-major flat:
        (streams * R, ...) with each stream's R rows contiguous, so the
        batch axis sharding P("dp") lines up with the buffer's shards."""
        R, streams = s2.shape

        def g(buf):
            # batched ROW gather: vmap a slots-axis take over the streams
            # axis — compiles to one gather op with a batch dim (shard-local
            # along streams). A take_along_axis formulation broadcasts the
            # index tensor to the FULL data shape (4x the data in int32) and
            # gathers per element — measured 200x slower on TPU for image
            # buffers.
            out = jax.vmap(
                lambda col, idx: jnp.take(col, idx, axis=0),
                in_axes=(1, 1),
                out_axes=0,
            )(buf, s2.astype(jnp.int32))  # (streams, R, ...)
            return out.reshape((streams * R,) + buf.shape[2:])

        return jax.tree.map(g, tree)

    def _epid_aligned(self, state: ReplayBufferState, s2: jax.Array):
        return jnp.take_along_axis(state.ep_id, s2, axis=0)  # (R, streams)

    def _stack_obs_aligned(
        self, state: ReplayBufferState, obs_tree: Data, s2: jax.Array
    ) -> Data:
        """Frame-stack reconstruction in (R, streams) index space (same
        semantics as `_stack_obs`, shard-local)."""
        if not self.image_keys:
            return obs_tree
        T = self.num_stack
        slots = state.ep_id.shape[0]
        R, streams = s2.shape
        offs = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        raw = (s2[:, :, None] - offs[None, None, :]) % slots  # (R, streams, T)
        anchor = self._epid_aligned(state, s2)  # (R, streams)
        ep = jnp.stack(
            [self._epid_aligned(state, raw[:, :, t]) for t in range(T)], axis=-1
        )  # (R, streams, T)
        valid = ep == anchor[:, :, None]
        first_valid = jnp.argmax(valid.astype(jnp.int32), axis=-1)
        safe = jnp.where(
            valid, raw,
            jnp.take_along_axis(raw, first_valid[:, :, None], axis=-1),
        )  # (R, streams, T)

        out = dict(obs_tree)
        B = R * streams
        for k in self.image_keys:
            frames = [
                self._gather_aligned(
                    state.data["observations"][k], safe[:, :, t]
                )
                for t in range(T)
            ]
            out[k] = jnp.stack(frames, axis=1)  # (B, T, H, W, C)
        return out

    def _sample_aligned(
        self, state: ReplayBufferState, rng: PRNGKey, batch_size: int
    ) -> Batch:
        """Stream-aligned sampling: draws EXACTLY batch/streams rows per
        stream, uniform over the valid slot window within each stream.

        Distribution note (vs the reference's iid-uniform buffer sampling):
        this is stratified by stream, not iid — the joint distribution fixes
        the per-stream count, but because lockstep inserts keep every
        stream's valid window identical, the MARGINAL distribution over
        buffer rows is exactly uniform (each (slot, stream) cell has equal
        inclusion probability; pinned by
        tests/test_replay_buffer.py::test_aligned_sampling_is_uniform_per_stream).
        The stratification is what keeps the gather shard-local under the dp
        layout (docs/scaling.md)."""
        slots, streams = state.ep_id.shape
        R = batch_size // streams
        if self.store_next_obs:
            n_valid = jnp.maximum(state.size, 1)
        else:
            n_valid = jnp.maximum(state.size - 1, 1)
        u = jax.random.randint(rng, (R, streams), 0, n_valid)
        s2 = (state.insert_slot - state.size + u) % slots  # (R, streams)
        return self._gather_batch_aligned(state, s2)

    def _gather_batch_aligned(
        self, state: ReplayBufferState, s2: jax.Array
    ) -> Batch:
        """Assemble a full transition batch from (R, streams) slot indices
        (shared by the uniform and the task-routed per-stream samplers)."""
        slots = state.ep_id.shape[0]
        batch = self._gather_aligned(state.data, s2)
        obs = batch["observations"]
        if isinstance(obs, dict):
            obs = self._stack_obs_aligned(state, obs, s2)

        if self.store_next_obs:
            next_obs = batch["next_observations"]
            if isinstance(next_obs, dict):
                next_obs = self._stack_obs_aligned(state, next_obs, s2)
        else:
            nxt = (s2 + 1) % slots
            same_ep = self._epid_aligned(state, nxt) == self._epid_aligned(
                state, s2
            )
            safe_nxt = jnp.where(same_ep, nxt, s2)
            next_obs = self._gather_aligned(
                state.data["observations"], safe_nxt
            )
            if isinstance(next_obs, dict):
                next_obs = self._stack_obs_aligned(state, next_obs, safe_nxt)

        out = dict(batch)
        out["observations"] = obs
        out["next_observations"] = next_obs
        return out

    def sample(
        self, state: ReplayBufferState, rng: PRNGKey, batch_size: int
    ) -> Batch:
        """Uniform batched gather over (slot, stream) pairs. With
        `store_next_obs=False`, next_obs is the same stream's next slot; the
        newest slot — whose successor is not written yet — is excluded from
        sampling, and rows whose successor belongs to a different episode
        (exactly the terminal rows, where masks=0 kills the bootstrap term)
        fall back to next=s, matching the reference memory-efficient buffer's
        boundary handling (memory_efficient_replay_buffer.py:126-146).

        When `batch_size` divides evenly over the streams, sampling is
        STREAM-ALIGNED: exactly batch_size/streams uniform rows per stream,
        gathered along the slots axis only — shard-local under the dp layout
        (see `_gather_aligned`) and identically uniform over the buffer."""
        slots, streams = state.ep_id.shape
        if batch_size % streams == 0:
            return self._sample_aligned(state, rng, batch_size)
        ks, ke = jax.random.split(rng)
        if self.store_next_obs:
            n_valid = jnp.maximum(state.size, 1)
            u = jax.random.randint(ks, (batch_size,), 0, n_valid)
        else:
            n_valid = jnp.maximum(state.size - 1, 1)
            u = jax.random.randint(ks, (batch_size,), 0, n_valid)
        # the valid window is the `size` most recent slots ending at
        # insert_slot-1 (ring); oldest-first
        s = (state.insert_slot - state.size + u) % slots
        e = jax.random.randint(ke, (batch_size,), 0, streams)

        batch = self._gather(state.data, s, e)
        obs = batch["observations"]
        obs = self._stack_obs(state, obs, s, e) if isinstance(obs, dict) else obs

        if self.store_next_obs:
            next_obs = batch["next_observations"]
            if isinstance(next_obs, dict):
                next_obs = self._stack_obs(state, next_obs, s, e)
        else:
            nxt = (s + 1) % slots
            same_ep = state.ep_id[nxt, e] == state.ep_id[s, e]
            safe_nxt = jnp.where(same_ep, nxt, s)
            next_obs = self._gather(state.data["observations"], safe_nxt, e)
            if isinstance(next_obs, dict):
                next_obs = self._stack_obs(state, next_obs, safe_nxt, e)

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
        """Bulk host->device preload into an existing state: transitions is a
        pytree of (N, ...) host arrays (+ `ep_ids`), written slot-by-slot in
        groups of `streams` rows (N must divide evenly)."""
        tr = dict(transitions)
        ep_ids = jnp.asarray(tr.pop("ep_ids"))
        streams = state.ep_id.shape[1]
        n = ep_ids.shape[0]
        assert n % streams == 0, (n, streams)
        rows = n // streams

        def body(st, x):
            batch, eps = x
            return self.insert(st, batch, eps), None

        batches = jax.tree.map(
            lambda x: jnp.asarray(x).reshape((rows, streams) + x.shape[1:]), tr
        )
        eps = ep_ids.reshape(rows, streams)
        state, _ = jax.lax.scan(body, state, (batches, eps))
        return state
