"""Static dataset with fully-jit sampling (offline RL / BC).

Capability parity: reference `serl_launcher/data/dataset.py` — dict-of-array
dataset, `sample` (:79-102) / jit `sample_jax` batched gather (:104-129),
`split` (:131-143), trajectory segmentation + return filtering (:145-177),
reward normalization (:179-194).

Device-native: the arrays live on device; sampling is a `jnp.take` gather
under jit (the reference's `sample_jax` is the seed of this design).
"""

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.common.typing import Batch, PRNGKey


class Dataset:
    def __init__(self, data: Dict):
        self.data = jax.tree.map(jnp.asarray, data)
        self.size = len(jax.tree.leaves(self.data)[0])

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def sample_jax(self, rng: PRNGKey, batch_size: int) -> Batch:
        idx = jax.random.randint(rng, (batch_size,), 0, self.size)
        return jax.tree.map(lambda arr: jnp.take(arr, idx, axis=0), self.data)

    def sample(self, batch_size: int, indx=None, rng=None) -> Batch:
        if indx is None:
            rng = rng if rng is not None else jax.random.PRNGKey(np.random.randint(2**31))
            return self.sample_jax(rng, batch_size)
        return jax.tree.map(lambda arr: arr[indx], self.data)

    def split(self, ratio: float) -> Tuple["Dataset", "Dataset"]:
        assert 0 < ratio < 1
        idx = np.random.permutation(self.size)
        n = int(self.size * ratio)
        first = jax.tree.map(lambda a: a[idx[:n]], self.data)
        second = jax.tree.map(lambda a: a[idx[n:]], self.data)
        return Dataset(first), Dataset(second)

    def _trajectory_boundaries_and_returns(self):
        dones = np.asarray(self.data["dones"])
        rewards = np.asarray(self.data["rewards"])
        starts, ends, returns = [], [], []
        start, ret = 0, 0.0
        for i in range(self.size):
            ret += rewards[i]
            if dones[i] > 0.5:
                starts.append(start)
                ends.append(i + 1)
                returns.append(ret)
                start, ret = i + 1, 0.0
        return starts, ends, returns

    def filter(self, take_top: float = None, threshold: float = None) -> "Dataset":
        """Keep trajectories by return threshold or top percentile
        (reference :164-177)."""
        assert (take_top is None) != (threshold is None)
        starts, ends, returns = self._trajectory_boundaries_and_returns()
        if take_top is not None:
            threshold = np.percentile(returns, 100 - take_top)
        keep = np.zeros(self.size, bool)
        for s, e, r in zip(starts, ends, returns):
            if r >= threshold:
                keep[s:e] = True
        return Dataset(jax.tree.map(lambda a: a[np.asarray(keep)], self.data))

    def normalize_returns(self, scaling: float = 1000.0):
        """Scale rewards by scaling/(max_ret - min_ret) (reference :179-194)."""
        _, _, returns = self._trajectory_boundaries_and_returns()
        spread = max(returns) - min(returns)
        self.data["rewards"] = self.data["rewards"] / spread * scaling
        return self
