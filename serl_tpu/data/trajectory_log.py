"""RLDS-style trajectory logging (tensorflow-free).

Capability parity: reference optional RLDS logging of every inserted
transition with RESTART/TRANSITION/TERMINATION/TRUNCATION step types
(`data/data_store.py:39-67` via oxe_envlogger) and RLDS preloading
(`utils/launcher.py:227-268`). Episodes are written as compressed npz
shards + a JSON manifest; `load_trajectory_dataset` reassembles transitions
for buffer preloading.
"""

import json
import os
import time
from enum import IntEnum
from typing import Dict, List, Optional

import numpy as np


class StepType(IntEnum):
    RESTART = 0
    TRANSITION = 1
    TERMINATION = 2
    TRUNCATION = 3


class TrajectoryLogger:
    """Append transitions; episodes are flushed to npz shards."""

    def __init__(self, directory: str, max_episodes_per_file: int = 5):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.max_eps = max_episodes_per_file
        self._episodes: List[Dict] = []
        self._current: List[Dict] = []
        self._shard = 0
        self._manifest_path = os.path.join(directory, "manifest.json")
        self._manifest = {"shards": [], "created": time.time()}

    def log_transition(self, transition: Dict, step_type: Optional[int] = None):
        tr = dict(transition)
        if step_type is None:
            if not self._current:
                step_type = StepType.RESTART
            elif tr.get("dones", 0) > 0.5:
                step_type = StepType.TERMINATION
            else:
                step_type = StepType.TRANSITION
        tr["step_type"] = int(step_type)
        self._current.append(tr)
        if step_type in (StepType.TERMINATION, StepType.TRUNCATION):
            self._episodes.append(self._stack(self._current))
            self._current = []
            if len(self._episodes) >= self.max_eps:
                self.flush()

    @staticmethod
    def _stack(steps: List[Dict]) -> Dict:
        import jax

        return jax.tree.map(lambda *xs: np.stack(xs), *steps)

    def flush(self):
        if not self._episodes:
            return
        path = os.path.join(self.directory, f"shard_{self._shard:05d}.npz")
        flat = {}
        for i, ep in enumerate(self._episodes):
            for k, v in _flatten(ep).items():
                flat[f"ep{i}/{k}"] = v
        np.savez_compressed(path, **flat)
        self._manifest["shards"].append(
            {"path": os.path.basename(path), "episodes": len(self._episodes)}
        )
        with open(self._manifest_path, "w") as f:
            json.dump(self._manifest, f)
        self._episodes = []
        self._shard += 1

    def close(self):
        if self._current:
            self._current[-1]["step_type"] = int(StepType.TRUNCATION)
            self._episodes.append(self._stack(self._current))
            self._current = []
        self.flush()


def _flatten(d, parent=""):
    out = {}
    for k, v in d.items():
        key = f"{parent}.{k}" if parent else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(d):
    out = {}
    for k, v in d.items():
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def load_trajectory_dataset(directory: str) -> List[Dict]:
    """Episodes (dicts of stacked arrays) from a logged directory."""
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    episodes = []
    for shard in manifest["shards"]:
        data = np.load(os.path.join(directory, shard["path"]), allow_pickle=False)
        by_ep: Dict[int, Dict] = {}
        for key in data.files:
            ep_str, rest = key.split("/", 1)
            by_ep.setdefault(int(ep_str[2:]), {})[rest] = data[key]
        for i in sorted(by_ep):
            episodes.append(_unflatten(by_ep[i]))
    return episodes


def populate_from_trajectory_log(store, directory: str) -> int:
    """Preload a data store from logged trajectories (reference
    `populate_datastore`, launcher.py:260-268)."""
    import jax

    n = 0
    for ep in load_trajectory_dataset(directory):
        ep = dict(ep)
        ep.pop("step_type", None)
        count = len(jax.tree.leaves(ep)[0])
        for i in range(count):
            store.insert(jax.tree.map(lambda x: x[i], ep))
            n += 1
    return n
