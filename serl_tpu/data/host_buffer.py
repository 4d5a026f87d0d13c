"""Host-side (numpy) replay buffer data stores for the multi-process mode.

Capability parity: reference `serl_launcher/data/replay_buffer.py` (circular
numpy buffer, prefetching device-put iterator :77-90, download iterator
:92-103) and `data/data_store.py` (thread-safe DataStore the TrainerServer
inserts into :26-80, `populate_data_store` pkl loaders :147-202).

Used only by the async two-process mode (actor on a CPU host / robot
workstation, learner on the TPU host); the fused single-program mode uses
the HBM buffer in serl_tpu/data/replay_buffer.py.
"""

import collections
import pickle
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def _init_storage(example, capacity: int):
    return jax.tree.map(
        lambda x: np.zeros((capacity,) + np.shape(x), dtype=np.asarray(x).dtype),
        example,
    )


class HostReplayBuffer:
    """Preallocated circular numpy buffer with uniform sampling."""

    def __init__(self, example_transition: Dict, capacity: int):
        self.capacity = capacity
        self._storage = _init_storage(example_transition, capacity)
        self._insert_index = 0
        self._size = 0

    def insert(self, transition: Dict):
        i = self._insert_index
        jax.tree.map(
            lambda buf, x: buf.__setitem__(i, x), self._storage, transition
        )
        self._insert_index = (i + 1) % self.capacity
        self._size = min(self._size + 1, self.capacity)

    def sample(self, batch_size: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        idx = rng.integers(0, max(self._size, 1), size=batch_size)
        return jax.tree.map(lambda buf: buf[idx], self._storage)

    def get_iterator(
        self, batch_size: int, device=None, prefetch: int = 2
    ) -> Iterator:
        """Prefetching device-put iterator (reference replay_buffer.py:77-90)."""
        rng = np.random.default_rng()
        queue = collections.deque()

        def enqueue(n):
            for _ in range(n):
                batch = self.sample(batch_size, rng)
                if device is not None:
                    batch = jax.device_put(batch, device)
                else:
                    batch = jax.tree.map(jax.numpy.asarray, batch)
                queue.append(batch)

        enqueue(prefetch)
        while True:
            if not queue:
                enqueue(1)
            yield queue.popleft()
            enqueue(1)

    def download(self, from_idx: int = 0):
        """Chunked export for replication (reference :92-103)."""
        end = self._size
        return from_idx, jax.tree.map(lambda buf: buf[from_idx:end], self._storage)

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "storage": jax.tree.map(lambda b: b[: self._size], self._storage),
                    "size": self._size,
                },
                f,
            )

    def __len__(self):
        return self._size


class ReplayBufferDataStore(HostReplayBuffer):
    """Thread-safe buffer implementing the server-side DataStore protocol
    (insert under lock + monotonically increasing id; reference
    data_store.py:26-80)."""

    def __init__(self, example_transition: Dict, capacity: int, rlds_logger=None):
        super().__init__(example_transition, capacity)
        self._lock = threading.Lock()
        self._seq = 0
        self._logger = rlds_logger

    def insert(self, transition: Dict):
        with self._lock:
            super().insert(transition)
            self._seq += 1
            if self._logger is not None:
                self._logger.log_transition(transition)

    def sample(self, batch_size: int, rng=None):
        with self._lock:
            return super().sample(batch_size, rng)

    def latest_data_id(self) -> int:
        return self._seq

    def get_latest_data(self, from_id: int):
        with self._lock:
            start = max(0, self._size - (self._seq - from_id))
            return self._seq, jax.tree.map(
                lambda buf: buf[start : self._size], self._storage
            )


def populate_data_store(store, pkl_path: str) -> int:
    """Load demo transitions from a pickle of either a list of transition
    dicts (reference format, data_store.py:147-163) or a dict of stacked
    arrays (serl_tpu demo format)."""
    with open(pkl_path, "rb") as f:
        data = pickle.load(f)
    n = 0
    if isinstance(data, list):
        for tr in data:
            store.insert(tr)
            n += 1
    else:
        data = dict(data)
        data.pop("ep_ids", None)
        data.pop("success", None)
        count = len(jax.tree.leaves(data)[0])
        for i in range(count):
            store.insert(jax.tree.map(lambda x: x[i], data))
            n += 1
    return n
