"""BC and VICE agent tests + reward classifier training loop."""

import jax
import jax.numpy as jnp
import numpy as np


def _pixel_obs(batch=4, size=48):
    return {
        "state": jnp.zeros((batch, 7)),
        "front": jnp.zeros((batch, 1, size, size, 3), jnp.uint8),
    }


def test_bc_state_agent_learns_constant_action():
    from serl_tpu.agents.bc import BCAgent

    agent = BCAgent.create(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 5)),
        jnp.zeros((1, 3)),
        network_kwargs={"hidden_dims": (64, 64)},
        learning_rate=3e-3,
    )
    target = jnp.asarray([0.3, -0.2, 0.7])
    for i in range(200):
        obs = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i), (64, 5))
        batch = {"observations": obs, "actions": jnp.tile(target, (64, 1))}
        agent, info = agent.update(batch)
    acts = agent.sample_actions(jnp.zeros((4, 5)), argmax=True)
    np.testing.assert_allclose(acts, jnp.tile(target, (4, 1)), atol=0.05)
    dbg = agent.get_debug_metrics(batch)
    assert float(dbg["mse"].mean()) < 0.01


def test_bc_pixel_agent_updates():
    from serl_tpu.agents.bc import BCAgent

    obs = _pixel_obs()
    agent = BCAgent.create(
        jax.random.PRNGKey(0),
        obs,
        jnp.zeros((4, 4)),
        encoder_type="small",
        image_keys=("front",),
        use_proprio=True,
        network_kwargs={"hidden_dims": (64,)},
    )
    batch = {"observations": obs, "actions": jnp.zeros((4, 4))}
    new_agent, info = agent.update(batch)
    assert np.isfinite(float(info["actor_loss"]))
    # encoder group untouched (reference: Policy stop-grads its encoder)
    for a, b in zip(
        jax.tree.leaves(agent.state.params["encoder"]),
        jax.tree.leaves(new_agent.state.params["encoder"]),
    ):
        np.testing.assert_array_equal(a, b)


def test_classifier_trains_to_separate():
    from serl_tpu.networks.classifier import (
        classifier_fn,
        classifier_train_step,
        create_classifier,
    )

    sample = {"front": jnp.zeros((2, 1, 32, 32, 3), jnp.uint8)}
    state = create_classifier(
        jax.random.PRNGKey(0), sample, ("front",), encoder_type="small",
        learning_rate=1e-3,
    )
    rng = jax.random.PRNGKey(1)
    # positives bright, negatives dark
    pos = jnp.full((8, 1, 32, 32, 3), 220, jnp.uint8)
    neg = jnp.full((8, 1, 32, 32, 3), 30, jnp.uint8)
    batch = {
        "observations": {"front": jnp.concatenate([pos, neg])},
        "labels": jnp.concatenate([jnp.ones(8), jnp.zeros(8)]),
    }
    for i in range(60):
        rng, k = jax.random.split(rng)
        state, info = classifier_train_step(state, batch, k)
    assert float(info["accuracy"]) == 1.0
    fn = classifier_fn(state)
    assert float(fn({"front": pos}).mean()) > 0
    assert float(fn({"front": neg}).mean()) < 0


def test_vice_agent_update_and_reward():
    from serl_tpu.agents.vice import VICEAgent

    obs = _pixel_obs(batch=8)
    agent = VICEAgent.create_vice(
        jax.random.PRNGKey(0),
        obs,
        jnp.zeros((8, 4)),
        vice_observations={"front": obs["front"]},
        encoder_type="small",
        image_keys=("front",),
        vice_image_keys=("front",),
        critic_ensemble_size=2,
        temperature_init=1e-2,
    )
    # vice reward in [0, 1]
    r = agent.vice_reward({"front": obs["front"]})
    assert r.shape == (8,)
    assert float(r.min()) >= 0 and float(r.max()) <= 1

    batch = {
        "observations": obs,
        "actions": jnp.zeros((8, 4)),
        "next_observations": obs,
        "rewards": jnp.zeros((8,)),
        "masks": jnp.ones((8,)),
        "dones": jnp.zeros((8,)),
    }
    # classifier update moves only the vice group
    new_agent, info = agent.update_vice(batch)
    assert np.isfinite(float(info["vice"]["bce_loss"]))
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree.leaves(agent.state.params["vice"]),
            jax.tree.leaves(new_agent.state.params["vice"]),
        )
    )
    assert changed
    for a, b in zip(
        jax.tree.leaves(agent.state.params["actor"]),
        jax.tree.leaves(new_agent.state.params["actor"]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-7)

    # critic update consumes classifier rewards
    new_agent2, info2 = agent.update_high_utd(batch, utd_ratio=2)
    assert "vice_rewards" in info2
    assert np.isfinite(float(info2["critic"]["critic_loss"]))
