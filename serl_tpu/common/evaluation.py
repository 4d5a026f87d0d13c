"""Policy evaluation utilities.

Capability parity: reference `serl_launcher/common/evaluation.py` —
`evaluate` (:49-64), `evaluate_with_trajectories` (:67-98),
`parallel_evaluate` (:101-155 vector-env variant), `bootstrap_std`
(:163-189), flattened `final/` info prefixes.

TPU-native: rollouts run as one jit scan over N lockstep episodes; the
gym-loop variants are provided for adapter-based (host) envs.
"""

from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def supply_rng(f, rng=None):
    """Wrap a seed-kwarg function with an internally advancing rng
    (reference :14-23)."""
    rng = rng if rng is not None else jax.random.PRNGKey(np.random.randint(2**31))
    state = {"rng": rng}

    def wrapped(*args, **kwargs):
        state["rng"], key = jax.random.split(state["rng"])
        return f(*args, seed=key, **kwargs)

    return wrapped


def flatten_info(d, parent_key="", sep="."):
    items = []
    for k, v in d.items():
        key = parent_key + sep + k if parent_key else k
        if isinstance(v, dict):
            items.extend(flatten_info(v, key, sep).items())
        else:
            items.append((key, v))
    return dict(items)


def evaluate_batched(
    env,
    agent,
    rng: jnp.ndarray,
    num_episodes: int = 32,
    episode_len: int = 100,
    argmax: bool = True,
    obs_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """Lockstep on-device evaluation (the TPU-native `evaluate`)."""
    from serl_tpu.envs.panda_pick import flatten_obs

    obs_fn = obs_fn or flatten_obs
    keys = jax.random.split(rng, num_episodes + 1)

    @jax.jit
    def rollout(agent, keys):
        states, obs = jax.vmap(env.reset)(keys[1:])

        def body(carry, t):
            states, obs, ret, succ, rng = carry
            rng, k = jax.random.split(rng)
            a_obs = obs_fn(obs)
            if argmax:
                actions = agent.sample_actions(a_obs, argmax=True)
            else:
                actions = agent.sample_actions(a_obs, seed=k)
            states, obs, r, d, info = jax.vmap(env.step)(states, actions)
            return (states, obs, ret + r, jnp.maximum(succ, info["success"]), rng), None

        init = (
            states,
            obs,
            jnp.zeros(num_episodes),
            jnp.zeros(num_episodes),
            keys[0],
        )
        (states, obs, ret, succ, _), _ = jax.lax.scan(
            body, init, None, length=episode_len
        )
        return ret, succ

    ret, succ = rollout(agent, keys)
    return {
        "return_mean": float(ret.mean()),
        "return_std": float(ret.std()),
        "success_rate": float(succ.mean()),
    }


def evaluate(policy_fn, env, num_episodes: int) -> Dict[str, float]:
    """Gym-API loop evaluation (reference :49-64) for adapter envs."""
    stats = defaultdict(list)
    for _ in range(num_episodes):
        obs, info = env.reset()
        done = False
        while not done:
            action = policy_fn(obs)
            obs, r, terminated, truncated, info = env.step(np.asarray(action))
            done = bool(terminated or truncated)
        for k, v in flatten_info(info, parent_key="final").items():
            if np.isscalar(v) or np.ndim(v) == 0:
                stats[k].append(v)
    return {k: float(np.mean(v)) for k, v in stats.items()}


def evaluate_with_trajectories(policy_fn, env, num_episodes: int):
    """Reference :67-98: also returns the raw trajectories."""
    trajectories = []
    stats = defaultdict(list)
    for _ in range(num_episodes):
        trajectory = defaultdict(list)
        obs, info = env.reset()
        done = False
        while not done:
            action = policy_fn(obs)
            next_obs, r, terminated, truncated, info = env.step(np.asarray(action))
            done = bool(terminated or truncated)
            trajectory["observation"].append(obs)
            trajectory["action"].append(action)
            trajectory["reward"].append(r)
            trajectory["done"].append(done)
            trajectory["info"].append(info)
            obs = next_obs
        for k, v in flatten_info(info, parent_key="final").items():
            if np.isscalar(v) or np.ndim(v) == 0:
                stats[k].append(v)
        trajectories.append(dict(trajectory))
    return {k: float(np.mean(v)) for k, v in stats.items()}, trajectories


def bootstrap_std(arr, f=np.mean, n: int = 30) -> float:
    """Bootstrapped std of statistic f (reference :163-169)."""
    arr = np.asarray(arr)
    return float(
        np.std([f(arr[np.random.choice(len(arr), len(arr))]) for _ in range(n)])
    )
