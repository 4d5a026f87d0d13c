"""SAC agent unit tests: shapes, update mechanics, target EMA, learning sanity.

Models the reference's (missing) test pyramid per SURVEY.md §4: golden-value
checks of loss math plus a tiny learning problem.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serl_tpu.agents.sac import SACAgent

OBS_DIM = 10
ACT_DIM = 4


def make_agent(seed=0, **kwargs):
    rng = jax.random.PRNGKey(seed)
    obs = jnp.zeros((1, OBS_DIM))
    act = jnp.zeros((1, ACT_DIM))
    defaults = dict(
        policy_kwargs={
            "tanh_squash_distribution": True,
            "std_parameterization": "exp",
            "std_min": 1e-5,
            "std_max": 5.0,
        },
        critic_network_kwargs={
            "activations": nn.tanh,
            "use_layer_norm": True,
            "hidden_dims": (64, 64),
        },
        policy_network_kwargs={
            "activations": nn.tanh,
            "use_layer_norm": True,
            "hidden_dims": (64, 64),
        },
        temperature_init=1e-2,
        discount=0.99,
        backup_entropy=False,
        critic_ensemble_size=10,
        critic_subsample_size=2,
    )
    defaults.update(kwargs)
    return SACAgent.create_states(rng, obs, act, **defaults)


def make_batch(rng, batch_size=32):
    keys = jax.random.split(rng, 5)
    return {
        "observations": jax.random.normal(keys[0], (batch_size, OBS_DIM)),
        "actions": jnp.clip(
            jax.random.normal(keys[1], (batch_size, ACT_DIM)), -0.999, 0.999
        ),
        "next_observations": jax.random.normal(keys[2], (batch_size, OBS_DIM)),
        "rewards": jax.random.normal(keys[3], (batch_size,)),
        "masks": jnp.ones((batch_size,)),
        "dones": jnp.zeros((batch_size,)),
    }


def test_sample_actions_shapes_and_bounds():
    agent = make_agent()
    obs = jax.random.normal(jax.random.PRNGKey(1), (7, OBS_DIM))
    acts = agent.sample_actions(obs, seed=jax.random.PRNGKey(2))
    assert acts.shape == (7, ACT_DIM)
    assert jnp.all(jnp.abs(acts) <= 1.0)
    det = agent.sample_actions(obs, argmax=True)
    det2 = agent.sample_actions(obs, argmax=True)
    np.testing.assert_array_equal(det, det2)


def test_update_changes_params_and_returns_info():
    # warmup=0 so the very first step has a nonzero learning rate
    agent = make_agent(
        actor_optimizer_kwargs={"learning_rate": 3e-4},
        critic_optimizer_kwargs={"learning_rate": 3e-4},
    )
    batch = make_batch(jax.random.PRNGKey(3))
    new_agent, info = agent.update(batch)
    assert int(new_agent.state.step) == 1
    assert "critic" in info and "critic_loss" in info["critic"]
    assert "actor" in info and "actor_loss" in info["actor"]
    assert "temperature" in info
    # params actually moved
    before = jax.tree.leaves(agent.state.params["critic"])[0]
    after = jax.tree.leaves(new_agent.state.params["critic"])[0]
    assert not np.allclose(before, after)


def test_target_update_is_polyak():
    agent = make_agent()
    batch = make_batch(jax.random.PRNGKey(4))
    tau = agent.config.soft_target_update_rate
    new_agent, _ = agent.update(batch, networks_to_update=frozenset({"critic"}))
    # target' = tau * params' + (1-tau) * target ; initial target == initial params
    p_new = jax.tree.leaves(new_agent.state.params["critic"])[0]
    t_old = jax.tree.leaves(agent.state.target_params["critic"])[0]
    t_new = jax.tree.leaves(new_agent.state.target_params["critic"])[0]
    np.testing.assert_allclose(t_new, tau * p_new + (1 - tau) * t_old, rtol=1e-5)


def test_critic_only_update_keeps_actor_gradfree():
    """Actor gets no *gradient* during critic-only updates. (Adam momentum may
    still nudge it — reference-faithful — but from a fresh optimizer state the
    update is exactly zero.)"""
    agent = make_agent()
    batch = make_batch(jax.random.PRNGKey(5))
    new_agent, _ = agent.update(batch, networks_to_update=frozenset({"critic"}))
    for a, b in zip(
        jax.tree.leaves(agent.state.params["actor"]),
        jax.tree.leaves(new_agent.state.params["actor"]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_update_high_utd_steps():
    agent = make_agent()
    batch = make_batch(jax.random.PRNGKey(6), batch_size=64)
    new_agent, info = agent.update_high_utd(batch, utd_ratio=4)
    # 4 critic scan steps + 1 actor/temp step
    assert int(new_agent.state.step) == 5
    assert "critic" in info and "actor" in info


def test_critic_loss_golden_value():
    """Recompute the critic TD loss by hand and compare (sac.py:134-191)."""
    agent = make_agent(critic_subsample_size=None, critic_ensemble_size=3)
    batch = make_batch(jax.random.PRNGKey(7), batch_size=8)

    params = agent.state.params
    rng = jax.random.PRNGKey(42)
    loss, info = agent.critic_loss_fn(batch, params, rng)

    # by hand, replicating internal rng splits
    rng2, next_key = jax.random.split(jax.random.PRNGKey(42))
    dist = agent.forward_policy(batch["next_observations"], rng=next_key)
    next_actions, next_lp = dist.sample_and_log_prob(seed=next_key)
    tq = agent.forward_critic(
        batch["next_observations"], next_actions, rng=rng2, target=True
    )
    rng3, _ = jax.random.split(rng2)
    target_q = batch["rewards"] + 0.99 * batch["masks"] * tq.min(axis=0)
    pred = agent.forward_critic(
        batch["observations"], batch["actions"], rng=rng2, grad_params=params
    )
    expected = jnp.mean((pred - target_q[None]) ** 2)
    np.testing.assert_allclose(loss, expected, rtol=1e-5)


def test_sac_learns_simple_problem():
    """SAC should quickly learn a trivial 1-step bandit: reward = -|a - 0.5|."""
    rng = jax.random.PRNGKey(0)
    obs_dim, act_dim = 3, 2
    agent = SACAgent.create_states(
        rng,
        jnp.zeros((1, obs_dim)),
        jnp.zeros((1, act_dim)),
        policy_kwargs={"tanh_squash_distribution": True, "std_parameterization": "exp"},
        critic_network_kwargs={"hidden_dims": (64, 64)},
        policy_network_kwargs={"hidden_dims": (64, 64)},
        temperature_init=1e-2,
        discount=0.0,
        critic_ensemble_size=2,
        actor_optimizer_kwargs={"learning_rate": 3e-3},
        critic_optimizer_kwargs={"learning_rate": 3e-3},
    )
    data_rng = jax.random.PRNGKey(1)
    for i in range(500):
        data_rng, k1, k2 = jax.random.split(data_rng, 3)
        obs = jax.random.normal(k1, (128, obs_dim))
        acts = jax.random.uniform(k2, (128, act_dim), minval=-1, maxval=1)
        rewards = -jnp.abs(acts - 0.5).sum(-1)
        batch = {
            "observations": obs,
            "actions": acts,
            "next_observations": obs,
            "rewards": rewards,
            "masks": jnp.zeros((128,)),
            "dones": jnp.ones((128,)),
        }
        agent, info = agent.update(batch)

    final_actions = agent.sample_actions(
        jax.random.normal(jax.random.PRNGKey(9), (16, obs_dim)), argmax=True
    )
    err = jnp.abs(final_actions - 0.5).mean()
    assert err < 0.2, f"SAC failed to learn bandit, err={err}"
