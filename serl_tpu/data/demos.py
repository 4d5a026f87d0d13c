"""Demonstration collection and ingestion.

Capability parity: reference demo tooling — `record_demo.py` scripts
(spacemouse transitions -> pickle), `populate_data_store`
(`data/data_store.py:147-163`, pkl -> replay buffer), and the RLPD demo
buffer of `async_drq_sim.py:233-254`.

TPU-native: demos are collected by rolling out a (scripted or learned)
policy over N lockstep envs under jit, yielding a transitions pytree that
can be bulk-inserted into an HBM `ReplayBuffer` (`load_transitions`) or
saved/loaded as a pickle for parity with the reference's workflow.
"""

import pickle
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.envs.panda_pick import PandaPickCubeEnv, flatten_obs
from serl_tpu.envs.wrappers import serl_obs


def collect_episodes(
    env: PandaPickCubeEnv,
    policy_fn: Callable,  # (EnvState, rng) -> (N, 4) actions
    rng: jnp.ndarray,
    num_episodes: int,
    episode_len: int = 100,
    pixel_obs: bool = False,
    auto_reset: bool = False,
):
    """Roll out `num_episodes` lockstep episodes; returns a transitions dict
    of (num_episodes * episode_len, ...) arrays (+ ep_ids, successes).

    `auto_reset=False` (default): one fixed-length episode per stream — the
    shape `select_demo_episodes` expects. For envs that early-terminate on
    success this wastes most of the stream sitting at the goal; pass
    `auto_reset=True` to chain fresh episodes within each stream instead
    (per-row `ep_ids` mark the boundaries, exactly like the online buffer),
    which makes every demo transition a real approach step."""
    keys = jax.random.split(rng, num_episodes)

    to_obs = (lambda o: serl_obs(o)) if pixel_obs else (lambda o: flatten_obs(o))

    @jax.jit
    def rollout(keys):
        states, obs = jax.vmap(env.reset)(keys)

        def body(carry, t):
            states, obs = carry
            actions = policy_fn(states, jax.random.fold_in(keys[0], t))
            if auto_reset:
                new_states, next_obs, rew, done, info = jax.vmap(
                    env.step_auto_reset
                )(states, actions)
                stored_next = to_obs(info["final_obs"])
                row_ep = states.ep_id * num_episodes + jnp.arange(
                    num_episodes, dtype=jnp.int32
                )
            else:
                new_states, next_obs, rew, done, info = jax.vmap(env.step)(
                    states, actions
                )
                stored_next = to_obs(next_obs)
                row_ep = jnp.arange(num_episodes, dtype=jnp.int32)
            tr = {
                "observations": to_obs(obs),
                "actions": actions,
                "next_observations": stored_next,
                "rewards": rew,
                "masks": 1.0 - done,
                "dones": done,
                "success": info["success"],
                "ep_ids": row_ep,
            }
            return (new_states, next_obs), tr

        (states, obs), trs = jax.lax.scan(
            body, (states, obs), jnp.arange(episode_len)
        )
        return trs  # leaves: (T, N, ...)

    trs = rollout(keys)
    # (T, N, ...) -> (N*T, ...) with stream-major order
    def fold(x):
        x = jnp.swapaxes(x, 0, 1)  # (N, T, ...)
        return x.reshape((-1,) + x.shape[2:])

    out = jax.tree.map(fold, trs)
    if not auto_reset:
        out["ep_ids"] = jnp.repeat(
            jnp.arange(num_episodes, dtype=jnp.int32), episode_len
        )
    return out


def collect_state_bank(
    env,
    policy_fn: Callable,  # (EnvState batch, rng) -> (N, act_dim) actions
    rng: jnp.ndarray,
    num_streams: int = 8,
    steps: int = 100,
):
    """Roll the policy out and return every visited EnvState stacked along a
    leading bank axis (num_streams * steps, ...) — the input to
    `PandaPoseTaskEnv.set_demo_reset_bank` (reverse-curriculum resets: start
    episodes from expert-visited states so sparse reward is reachable from
    late-phase states first). Auto-resets inside, so the bank covers all
    phases of repeated episodes."""
    keys = jax.random.split(rng, num_streams)

    @jax.jit
    def rollout(keys):
        states, _ = jax.vmap(env.reset)(keys)

        def body(carry, t):
            states = carry
            actions = policy_fn(states, jax.random.fold_in(keys[0], t))
            new_states, _, _, _, _ = jax.vmap(env.step_auto_reset)(
                states, actions
            )
            return new_states, states  # record PRE-step states

        _, bank = jax.lax.scan(body, states, jnp.arange(steps))
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), bank
        )

    return rollout(keys)


def filter_successful(transitions: Dict, episode_len: int = 100) -> Dict:
    """Keep only episodes whose max success flag is 1 (host-side)."""
    t = jax.device_get(transitions)
    succ = t["success"].reshape(-1, episode_len)
    keep = succ.max(axis=1) > 0.5
    idx = np.repeat(keep, episode_len)
    out = jax.tree.map(lambda v: v[idx], t)
    # renumber episodes
    n_keep = int(keep.sum())
    out["ep_ids"] = np.repeat(np.arange(n_keep, dtype=np.int32), episode_len)
    return out


def take_transitions(transitions: Dict, n: int) -> Dict:
    """First n transitions of a (possibly nested) transitions pytree."""
    return jax.tree.map(lambda v: v[:n], transitions)


def select_demo_episodes(
    transitions: Dict, num_episodes: int, episode_len: int = 100
) -> Dict:
    """Device-side selection of the first `num_episodes` *successful*
    episodes (falls back to unsuccessful ones if there aren't enough).

    Never copies image data to the host — crucial for pixel demos, where a
    host round-trip of the frame stacks costs minutes over a TPU tunnel.
    """
    succ = transitions["success"].reshape(-1, episode_len).max(axis=1)  # (E,)
    # stable order: successful episodes first, original order preserved
    order = jnp.argsort(1.0 - succ, stable=True)[:num_episodes]  # (N,)
    idx = (order[:, None] * episode_len + jnp.arange(episode_len)[None, :]).reshape(-1)
    out = jax.tree.map(lambda v: jnp.take(jnp.asarray(v), idx, axis=0), transitions)
    out["ep_ids"] = jnp.repeat(
        jnp.arange(num_episodes, dtype=jnp.int32), episode_len
    )
    return out


def save_demos(transitions: Dict, path: str):
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(transitions), f)


def load_demos(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def demos_to_buffer(rb, transitions: Dict, episode_len: int = 100):
    """Bulk-load demo transitions into a fresh buffer state: each demo
    episode becomes one stream of a full, write-once ring."""
    tr = dict(transitions)
    tr.pop("success", None)
    ep_ids = tr.pop("ep_ids")
    return rb.init_from_episodes(tr, ep_ids, episode_len)
