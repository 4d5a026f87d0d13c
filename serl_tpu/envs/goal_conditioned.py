"""Goal-conditioned environment layer + legacy-interface adapters.

TPU-native re-design of the reference's goal-conditioned sim stack
(`serl_launcher/wrappers/mujoco.py:29-100`, `wrappers/roboverse.py`,
`wrappers/dmcgym.py`, `utils/sim_utils.py:22-152`). The reference wraps
single CPU envs in `gym.Wrapper` chains and reads goals from TFRecord
datasets; here the GC layer is a functional transform over our jit-compiled
single-env API (`vmap` to batch, like every env in `serl_tpu/envs/`) — goals
are a pytree drawn on device at reset — and the trajectory loader is tf-free
(npz/pkl).

Consumed by the GC/LC encoding wrappers in `serl_tpu/vision/encoding.py`
(reference `common/encoding.py:75-189`).
"""

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple, Union

import glob
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


class GCState(NamedTuple):
    """Carry for a goal-conditioned env: inner env state + current goal."""

    inner: Any
    goal: Any
    goal_rng: jnp.ndarray


class GoalConditionedEnv:
    """Functional goal-conditioned layer. Single-env; `vmap` to batch.

    `goal_sampler` is either a goal bank (pytree of arrays with a leading
    bank dim; a random entry is drawn at every reset — the
    `np.random.randint` draw at reference mujoco.py:74-76, on device) or a
    callable `(rng, obs) -> goal` (the affordance-model path,
    mujoco.py:90-93).

    Observations come back as ``{"observation": obs, "goal": goal}`` so the
    GC encoding wrapper / contrastive critic can consume them directly;
    reward is optionally recomputed from goal distance via `reward_fn`.
    """

    def __init__(
        self,
        env,
        goal_sampler: Union[Any, Callable],
        reward_fn: Optional[Callable] = None,
    ):
        self.env = env
        self.goal_sampler = goal_sampler
        self.reward_fn = reward_fn

    def _sample_goal(self, rng: jnp.ndarray, obs):
        if callable(self.goal_sampler):
            return self.goal_sampler(rng, obs)
        bank = self.goal_sampler
        n = jax.tree.leaves(bank)[0].shape[0]
        idx = jax.random.randint(rng, (), 0, n)
        return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), bank)

    def reset(self, rng: jnp.ndarray) -> Tuple[GCState, Dict]:
        rng, goal_rng, next_rng = jax.random.split(rng, 3)
        inner, obs = self.env.reset(rng)
        goal = self._sample_goal(goal_rng, obs)
        return GCState(inner, goal, next_rng), {"observation": obs, "goal": goal}

    def step(self, state: GCState, action: jnp.ndarray):
        inner, obs, reward, done, info = self.env.step(state.inner, action)
        if self.reward_fn is not None:
            reward = self.reward_fn(obs, state.goal)
        return (
            GCState(inner, state.goal, state.goal_rng),
            {"observation": obs, "goal": state.goal},
            reward,
            done,
            info,
        )

    def step_auto_reset(self, state: GCState, action: jnp.ndarray):
        """Step with auto-reset; a reset draws a fresh goal (reference
        behavior: a new goal every `reset()`, mujoco.py:73)."""
        inner, obs, reward, done, info = self.env.step_auto_reset(
            state.inner, action
        )
        if self.reward_fn is not None:
            # on done the inner env returns the post-reset obs; the terminal
            # reward must come from the terminal observation vs the OLD goal
            is_done_r = done > 0.5
            terminal_r = self.reward_fn(info["final_obs"], state.goal)
            live_r = self.reward_fn(obs, state.goal)
            reward = jnp.where(is_done_r, terminal_r, live_r)
        goal_rng, sample_rng = jax.random.split(state.goal_rng)
        fresh = self._sample_goal(sample_rng, obs)
        is_done = done > 0.5
        goal = jax.tree.map(
            lambda new, old: jnp.where(is_done, new, old), fresh, state.goal
        )
        info = dict(info)
        # terminal next_observations must keep the GC pytree structure and
        # pair the terminal obs with the goal that was active that episode
        info["final_obs"] = {"observation": info["final_obs"], "goal": state.goal}
        # the returned obs is the new episode's first obs when done — pair it
        # with the goal the env now tracks (the freshly drawn one)
        return (
            GCState(inner, goal, goal_rng),
            {"observation": obs, "goal": goal},
            reward,
            done,
            info,
        )


def goal_distance_reward(
    key: str, threshold: float = 0.05, sparse: bool = True,
    goal_key: Optional[str] = None,
) -> Callable:
    """Sparse/dense goal-reaching reward on one observation key.

    `key` may be a `/`-joined path into a nested obs dict (e.g.
    "state/block_pos"); `goal_key` defaults to the path's last component."""

    def lookup(d, path):
        for part in path.split("/"):
            d = d[part]
        return d

    gkey = goal_key if goal_key is not None else key.split("/")[-1]

    def fn(obs: Dict, goal: Dict) -> jnp.ndarray:
        d = jnp.linalg.norm(
            (lookup(obs, key) - lookup(goal, gkey)).reshape(-1)
        )
        return (d < threshold).astype(jnp.float32) if sparse else -d

    return fn


def make_gc_env(
    env,
    goal_sampler,
    reward_fn: Optional[Callable] = None,
) -> GoalConditionedEnv:
    """Factory analogue of `sim_utils.make_mujoco_gc_env` (:22-50): the
    reference chains DMCGYM → GC → Unnormalize → Chunking → TimeLimit →
    VideoRecorder gym wrappers; in the fused design time limits live in the
    env (`panda_pick.py`), chunking/normalization are in-graph functions
    (`envs/wrappers.py`), and video capture is `utils/video.py` — so the
    factory reduces to the GC layer itself."""
    return GoalConditionedEnv(env, goal_sampler, reward_fn)


# ---------------------------------------------------------------------------
# Trajectory dataset loading (tf-free replacement of sim_utils.load_tf_dataset)
# ---------------------------------------------------------------------------


def load_trajectory_dataset(data_path: str):
    """Load trajectory files from a directory into dicts of numpy arrays.

    Replaces `sim_utils.load_tf_dataset` (:139-152, TFRecord+tf.data) with a
    host-side generator over `*.npz` / `*.pkl` trajectory files. Each yielded
    trajectory is a nested dict with at least `observations`, `actions`; npz
    files use `/`-joined flat keys (the format `data/trajectory_log.py`
    writes)."""
    paths = sorted(
        glob.glob(os.path.join(data_path, "*.npz"))
        + glob.glob(os.path.join(data_path, "*.pkl"))
    )
    for p in paths:
        if p.endswith(".npz"):
            flat = dict(np.load(p, allow_pickle=False))
            traj: Dict[str, Any] = {}
            for k, v in flat.items():
                parts = k.split("/")
                d = traj
                for part in parts[:-1]:
                    nxt = d.setdefault(part, {})
                    if not isinstance(nxt, dict):
                        raise ValueError(
                            f"{p}: key '{k}' nests under '{part}', which is "
                            "already a leaf array — flat npz keys must not be "
                            "both a leaf and a prefix"
                        )
                    d = nxt
                if isinstance(d.get(parts[-1]), dict):
                    raise ValueError(
                        f"{p}: key '{k}' is a leaf but also a prefix of other keys"
                    )
                d[parts[-1]] = v
            yield traj
        else:
            with open(p, "rb") as f:
                data = pickle.load(f)
            if isinstance(data, list):
                for traj in data:
                    yield traj
            else:
                yield data


# ---------------------------------------------------------------------------
# dm_env-style bridge (role of wrappers/dmcgym.py)
# ---------------------------------------------------------------------------


class DMEnvAdapter:
    """Bridge a dm_env-style environment to the gym API, duck-typed so no
    `dm_env` dependency is required (reference `wrappers/dmcgym.py` hard-
    depends on dm_env+dm_control). The wrapped object must expose
    `reset() -> timestep` and `step(action) -> timestep` where a timestep has
    `.observation`, `.reward`, `.discount` and `.last()`."""

    def __init__(self, dm_environment, action_low=-1.0, action_high=1.0):
        self._env = dm_environment
        self.action_low = action_low
        self.action_high = action_high

    def reset(self, *, seed: Optional[int] = None, options=None):
        ts = self._env.reset()
        return ts.observation, {}

    def step(self, action):
        action = np.clip(action, self.action_low, self.action_high)
        ts = self._env.step(action)
        terminated = bool(ts.last()) and (ts.discount == 0.0)
        truncated = bool(ts.last()) and not terminated
        reward = 0.0 if ts.reward is None else float(ts.reward)
        return ts.observation, reward, terminated, truncated, {}

    def render(self):
        if hasattr(self._env, "physics"):
            return self._env.physics.render()
        return None
