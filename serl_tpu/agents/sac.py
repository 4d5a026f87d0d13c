"""Soft Actor-Critic (+ TD3 / REDQ / high-UTD variants).

Capability parity: reference `serl_launcher/agents/continuous/sac.py` —
same losses (critic :134-191, policy :193-221, temperature :223-234), same
`update` / `update_high_utd` (:243-299, :544-596) / `sample_actions` (:301-320)
surface, same configuration space (TD3 via fixed std, REDQ via ensemble
subsample, SAC-ensemble).

TPU-first design notes:
  * Parameters live in explicit named groups ("actor", "critic", "temperature")
    with one optimizer each (see serl_tpu/common/train_state.py). The shared
    image encoder lives inside the "critic" group; the actor reads it through a
    `stop_gradient`, mirroring the reference where `Policy` always encodes with
    stop_gradient=True (`actor_critic_nets.py:185`) so only the critic loss
    trains the encoder.
  * There is no `pmap_axis`: the update is a pure jit function; when the batch
    is sharded over a mesh and params are replicated, XLA GSPMD inserts the
    gradient all-reduce. (`pmean_axis` exists for explicit shard_map use.)
  * `update_high_utd` runs the critic minibatch loop with `lax.scan` exactly
    like the reference, keeping one compiled program for UTD=8.

Faithfulness quirk kept on purpose: when a network is *not* in
`networks_to_update`, its optimizer still steps with zero gradients — Adam
momentum keeps decaying into the params, which is what the reference's
"sum of all optimizer updates" formulation does (`common.py:136-168`).
"""

from __future__ import annotations

from functools import partial
from typing import FrozenSet, NamedTuple, Optional, Tuple

import chex
import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from serl_tpu.common.optimizers import make_optimizer, optimizer_lr
from serl_tpu.common.train_state import TrainState, nonpytree_field
from serl_tpu.common.typing import Batch, Data, Params, PRNGKey
from serl_tpu.networks.actor_critic import CriticNet, PolicyNet, subsample_ensemble
from serl_tpu.networks.lagrange import (
    init_lagrange_params,
    lagrange_penalty,
    lagrange_value,
)


class SACConfig(NamedTuple):
    """Static agent configuration (hashable: lives in the jit treedef)."""

    discount: float = 0.95
    soft_target_update_rate: float = 0.005
    target_entropy: float = 0.0
    backup_entropy: bool = False
    critic_ensemble_size: int = 2
    critic_subsample_size: Optional[int] = None
    image_keys: Tuple[str, ...] = ()
    has_encoder: bool = False
    vice_image_keys: Tuple[str, ...] = ()  # used by VICEAgent only
    augment: bool = True  # DrQ random-crop on update batches (perf ablations)
    # weight of the Q-filtered BC auxiliary on the actor (0 = off); see
    # policy_loss_fn. Used by demo-heavy sparse recipes (fwbw).
    bc_regularization: float = 0.0


class SACAgent(struct.PyTreeNode):
    state: TrainState
    config: SACConfig = nonpytree_field()
    actor_def: PolicyNet = nonpytree_field()
    critic_def: CriticNet = nonpytree_field()
    encoder_def: Optional[nn.Module] = nonpytree_field(default=None)

    # ------------------------------------------------------------------ #
    # Forward passes
    # ------------------------------------------------------------------ #

    def _encode(self, critic_params: Params, obs: Data, train: bool, rng=None):
        """Observations -> flat features via the shared encoder (if any)."""
        if self.encoder_def is None:
            return obs
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        return self.encoder_def.apply(
            {"params": critic_params["encoder"]}, obs, train=train, rngs=rngs
        )

    def forward_policy(
        self,
        obs: Data,
        rng: Optional[PRNGKey] = None,
        *,
        grad_params: Optional[Params] = None,
        train: bool = True,
        temperature: float = 1.0,
    ):
        params = grad_params if grad_params is not None else self.state.params
        feats = self._encode(self.state.params["critic"], obs, train, rng)
        feats = jax.lax.stop_gradient(feats)  # actor never trains the encoder
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        return self.actor_def.apply(
            {"params": params["actor"]},
            feats,
            temperature=temperature,
            train=train,
            rngs=rngs,
        )

    def forward_critic(
        self,
        obs: Data,
        actions: jax.Array,
        rng: Optional[PRNGKey] = None,
        *,
        grad_params: Optional[Params] = None,
        target: bool = False,
        train: bool = True,
    ) -> jax.Array:
        if target:
            critic_params = self.state.target_params["critic"]
        elif grad_params is not None:
            critic_params = grad_params["critic"]
        else:
            critic_params = self.state.params["critic"]
        feats = self._encode(critic_params, obs, train, rng)
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        return self.critic_def.apply(
            {"params": critic_params["head"]}, feats, actions, train=train, rngs=rngs
        )

    def temperature(self, grad_params: Optional[Params] = None) -> jax.Array:
        params = grad_params if grad_params is not None else self.state.params
        return lagrange_value(params["temperature"])

    # ------------------------------------------------------------------ #
    # Losses (reference math, sac.py:118-234)
    # ------------------------------------------------------------------ #

    def _compute_next_actions(self, batch: Batch, rng: PRNGKey):
        dist = self.forward_policy(batch["next_observations"], rng=rng)
        next_actions, next_log_probs = dist.sample_and_log_prob(seed=rng)
        chex.assert_equal_shape([batch["actions"], next_actions])
        return next_actions, next_log_probs

    def critic_loss_fn(self, batch: Batch, params: Params, rng: PRNGKey):
        batch_size = batch["rewards"].shape[0]
        rng, next_action_key = jax.random.split(rng)
        next_actions, next_log_probs = self._compute_next_actions(
            batch, next_action_key
        )

        target_next_qs = self.forward_critic(
            batch["next_observations"], next_actions, rng=rng, target=True
        )  # (E, B)

        rng, subsample_key = jax.random.split(rng)
        target_next_qs = subsample_ensemble(
            subsample_key,
            target_next_qs,
            self.config.critic_subsample_size,
            self.config.critic_ensemble_size,
        )
        target_next_min_q = target_next_qs.min(axis=0)
        chex.assert_shape(target_next_min_q, (batch_size,))

        target_q = (
            batch["rewards"] + self.config.discount * batch["masks"] * target_next_min_q
        )
        if self.config.backup_entropy:
            target_q = target_q - self.temperature() * next_log_probs

        predicted_qs = self.forward_critic(
            batch["observations"], batch["actions"], rng=rng, grad_params=params
        )
        chex.assert_shape(
            predicted_qs, (self.config.critic_ensemble_size, batch_size)
        )
        critic_loss = jnp.mean((predicted_qs - target_q[None]) ** 2)
        return critic_loss, {
            "critic_loss": critic_loss,
            "predicted_qs": jnp.mean(predicted_qs),
            "target_qs": jnp.mean(target_q),
        }

    def policy_loss_fn(self, batch: Batch, params: Params, rng: PRNGKey):
        temperature = self.temperature()
        rng, policy_key, sample_key, critic_key = jax.random.split(rng, 4)
        dist = self.forward_policy(
            batch["observations"], rng=policy_key, grad_params=params
        )
        actions, log_probs = dist.sample_and_log_prob(seed=sample_key)
        predicted_qs = self.forward_critic(
            batch["observations"], actions, rng=critic_key
        )
        predicted_q = predicted_qs.mean(axis=0)
        actor_loss = -jnp.mean(predicted_q - temperature * log_probs)
        info = {
            "actor_loss": actor_loss,
            "temperature": temperature,
            "entropy": -log_probs.mean(),
        }
        if self.config.bc_regularization > 0.0:
            # Q-filtered behavior-cloning auxiliary (SACfD / Nair et al.
            # "Overcoming Exploration with Demonstrations"): pull the policy
            # toward batch actions ONLY where the critic thinks the batch
            # action beats the policy's own — so demonstrations guide early
            # and the term self-anneals once the policy surpasses them.
            batch_a = jnp.clip(batch["actions"], -0.999, 0.999)
            q_batch = self.forward_critic(
                batch["observations"], batch_a, rng=critic_key
            ).mean(axis=0)
            better = (q_batch > predicted_q).astype(jnp.float32)
            bc_nll = -dist.log_prob(batch_a)
            bc_loss = (better * bc_nll).sum() / jnp.maximum(better.sum(), 1.0)
            actor_loss = actor_loss + self.config.bc_regularization * bc_loss
            info["actor_loss"] = actor_loss
            info["bc_loss"] = bc_loss
            info["bc_active_frac"] = better.mean()
        return actor_loss, info

    def temperature_loss_fn(self, batch: Batch, params: Params, rng: PRNGKey):
        rng, next_action_key = jax.random.split(rng)
        _, next_log_probs = self._compute_next_actions(batch, next_action_key)
        entropy = -next_log_probs.mean()
        loss = lagrange_penalty(
            params["temperature"], lhs=entropy, rhs=self.config.target_entropy
        )
        return loss, {"temperature_loss": loss}

    def loss_fns(self, batch: Batch):
        return {
            "critic": partial(self.critic_loss_fn, batch),
            "actor": partial(self.policy_loss_fn, batch),
            "temperature": partial(self.temperature_loss_fn, batch),
        }

    # ------------------------------------------------------------------ #
    # Updates
    # ------------------------------------------------------------------ #

    @partial(jax.jit, static_argnames=("pmean_axis", "networks_to_update"))
    def update(
        self,
        batch: Batch,
        *,
        pmean_axis: Optional[str] = None,
        networks_to_update: FrozenSet[str] = frozenset(
            {"actor", "critic", "temperature"}
        ),
    ) -> Tuple["SACAgent", dict]:
        """One gradient step on all (or a subset) of the networks.

        Skipped networks still step their optimizer with zero gradients
        (reference parity; see module docstring).
        """
        batch_size = batch["rewards"].shape[0]
        chex.assert_tree_shape_prefix(batch, (batch_size,))

        loss_fns = self.loss_fns(batch)
        assert frozenset(networks_to_update) <= frozenset(loss_fns)
        for key in set(loss_fns) - set(networks_to_update):
            loss_fns[key] = lambda params, rng: (
                jnp.zeros((), jnp.float32),
                {},
            )

        new_state, info = self.state.apply_loss_fns(loss_fns, pmean_axis=pmean_axis)

        if "critic" in networks_to_update:
            new_state = new_state.target_update(self.config.soft_target_update_rate)

        # advance the internal rng chain exactly once per update (sac.py:288)
        rng, _ = jax.random.split(new_state.rng)
        new_state = new_state.replace(rng=rng)

        for name, opt_state in new_state.opt_states.items():
            lr = optimizer_lr(opt_state)
            if lr is not None:
                info[f"{name}_lr"] = lr

        return self.replace(state=new_state), info

    @partial(jax.jit, static_argnames=("utd_ratio", "pmean_axis"))
    def update_high_utd(
        self,
        batch: Batch,
        *,
        utd_ratio: int,
        pmean_axis: Optional[str] = None,
    ) -> Tuple["SACAgent", dict]:
        """`utd_ratio` critic minibatch updates via lax.scan, then one
        actor+temperature step on the full batch (sac.py:544-596)."""
        batch_size = batch["rewards"].shape[0]
        assert batch_size % utd_ratio == 0
        minibatch_size = batch_size // utd_ratio

        def scan_body(agent: SACAgent, minibatch: Batch):
            agent, info = agent.update(
                minibatch,
                pmean_axis=pmean_axis,
                networks_to_update=frozenset({"critic"}),
            )
            return agent, info

        minibatches = jax.tree.map(
            lambda x: x.reshape((utd_ratio, minibatch_size) + x.shape[1:]), batch
        )
        agent, critic_infos = jax.lax.scan(scan_body, self, minibatches)
        critic_infos = jax.tree.map(lambda x: jnp.mean(x, axis=0), critic_infos)
        critic_infos.pop("actor", None)
        critic_infos.pop("temperature", None)

        agent, actor_temp_infos = agent.update(
            batch,
            pmean_axis=pmean_axis,
            networks_to_update=frozenset({"actor", "temperature"}),
        )
        actor_temp_infos.pop("critic", None)
        return agent, {**critic_infos, **actor_temp_infos}

    @partial(jax.jit, static_argnames=("argmax",))
    def sample_actions(
        self,
        observations: Data,
        *,
        seed: Optional[PRNGKey] = None,
        argmax: bool = False,
        temperature: float = 1.0,
        **kwargs,
    ) -> jax.Array:
        dist = self.forward_policy(
            observations, rng=seed, train=False, temperature=temperature
        )
        if argmax:
            return dist.mode()
        return dist.sample(seed=seed)

    # ------------------------------------------------------------------ #
    # Constructors
    # ------------------------------------------------------------------ #

    @classmethod
    def create(
        cls,
        rng: PRNGKey,
        observations: Data,
        actions: jax.Array,
        *,
        actor_def: PolicyNet,
        critic_def: CriticNet,
        encoder_def: Optional[nn.Module] = None,
        actor_optimizer_kwargs={"learning_rate": 3e-4, "warmup_steps": 2000},
        critic_optimizer_kwargs={"learning_rate": 3e-4, "warmup_steps": 2000},
        temperature_optimizer_kwargs={"learning_rate": 3e-4},
        discount: float = 0.95,
        soft_target_update_rate: float = 0.005,
        target_entropy: Optional[float] = None,
        backup_entropy: bool = False,
        temperature_init: float = 1.0,
        critic_ensemble_size: int = 2,
        critic_subsample_size: Optional[int] = None,
        image_keys: Tuple[str, ...] = (),
        bc_regularization: float = 0.0,
    ) -> "SACAgent":
        if target_entropy is None:
            target_entropy = -actions.shape[-1] / 2

        rng, enc_key, actor_key, critic_key = jax.random.split(rng, 4)

        if encoder_def is not None:
            enc_params = encoder_def.init(enc_key, observations)["params"]
            feats = encoder_def.apply({"params": enc_params}, observations)
        else:
            enc_params = {}
            feats = observations

        actor_params = actor_def.init(actor_key, feats)["params"]
        critic_head_params = critic_def.init(critic_key, feats, actions)["params"]
        params = {
            "actor": actor_params,
            "critic": {"encoder": enc_params, "head": critic_head_params},
            "temperature": init_lagrange_params(temperature_init),
        }

        txs = {
            "actor": make_optimizer(**actor_optimizer_kwargs),
            "critic": make_optimizer(**critic_optimizer_kwargs),
            "temperature": make_optimizer(**temperature_optimizer_kwargs),
        }

        rng, state_key = jax.random.split(rng)
        state = TrainState.create(
            params=params, txs=txs, target_groups=("critic",), rng=state_key
        )

        return cls(
            state=state,
            config=SACConfig(
                discount=discount,
                soft_target_update_rate=soft_target_update_rate,
                target_entropy=float(target_entropy),
                backup_entropy=backup_entropy,
                critic_ensemble_size=critic_ensemble_size,
                critic_subsample_size=critic_subsample_size,
                image_keys=tuple(image_keys),
                has_encoder=encoder_def is not None,
                bc_regularization=bc_regularization,
            ),
            actor_def=actor_def,
            critic_def=critic_def,
            encoder_def=encoder_def,
        )

    @classmethod
    def create_states(
        cls,
        rng: PRNGKey,
        observations: jax.Array,
        actions: jax.Array,
        *,
        critic_network_kwargs: dict = {"hidden_dims": (256, 256)},
        policy_network_kwargs: dict = {"hidden_dims": (256, 256)},
        policy_kwargs: dict = {
            "tanh_squash_distribution": True,
            "std_parameterization": "uniform",
        },
        critic_ensemble_size: int = 2,
        critic_subsample_size: Optional[int] = None,
        temperature_init: float = 1.0,
        **kwargs,
    ) -> "SACAgent":
        """Flat-state agent (reference sac.py:486-542 + launcher defaults)."""
        pk = dict(policy_kwargs)
        actor_def = PolicyNet(
            action_dim=actions.shape[-1],
            hidden_dims=tuple(policy_network_kwargs.get("hidden_dims", (256, 256))),
            activations=policy_network_kwargs.get("activations", nn.swish),
            use_layer_norm=policy_network_kwargs.get("use_layer_norm", False),
            std_parameterization=pk.get("std_parameterization", "uniform"),
            std_min=pk.get("std_min", 1e-5),
            std_max=pk.get("std_max", 10.0),
            tanh_squash=pk.get("tanh_squash_distribution", True),
            fixed_std=pk.get("fixed_std"),
        )
        critic_def = CriticNet(
            ensemble_size=critic_ensemble_size,
            hidden_dims=tuple(critic_network_kwargs.get("hidden_dims", (256, 256))),
            activations=critic_network_kwargs.get("activations", nn.swish),
            use_layer_norm=critic_network_kwargs.get("use_layer_norm", False),
        )
        return cls.create(
            rng,
            observations,
            actions,
            actor_def=actor_def,
            critic_def=critic_def,
            encoder_def=None,
            critic_ensemble_size=critic_ensemble_size,
            critic_subsample_size=critic_subsample_size,
            temperature_init=temperature_init,
            **kwargs,
        )

    @classmethod
    def create_pixels(
        cls,
        rng: PRNGKey,
        observations: Data,
        actions: jax.Array,
        *,
        encoder_def: nn.Module,
        critic_network_kwargs: dict = {"hidden_dims": (256, 256)},
        policy_network_kwargs: dict = {"hidden_dims": (256, 256)},
        policy_kwargs: dict = {
            "tanh_squash_distribution": True,
            "std_parameterization": "uniform",
        },
        critic_ensemble_size: int = 2,
        critic_subsample_size: Optional[int] = None,
        temperature_init: float = 1.0,
        image_keys: Tuple[str, ...] = ("image",),
        **kwargs,
    ) -> "SACAgent":
        """Pixel agent with a shared obs encoder (reference sac.py:402-484)."""
        pk = dict(policy_kwargs)
        actor_def = PolicyNet(
            action_dim=actions.shape[-1],
            hidden_dims=tuple(policy_network_kwargs.get("hidden_dims", (256, 256))),
            activations=policy_network_kwargs.get("activations", nn.swish),
            use_layer_norm=policy_network_kwargs.get("use_layer_norm", False),
            std_parameterization=pk.get("std_parameterization", "uniform"),
            std_min=pk.get("std_min", 1e-5),
            std_max=pk.get("std_max", 10.0),
            tanh_squash=pk.get("tanh_squash_distribution", True),
            fixed_std=pk.get("fixed_std"),
        )
        critic_def = CriticNet(
            ensemble_size=critic_ensemble_size,
            hidden_dims=tuple(critic_network_kwargs.get("hidden_dims", (256, 256))),
            activations=critic_network_kwargs.get("activations", nn.swish),
            use_layer_norm=critic_network_kwargs.get("use_layer_norm", False),
        )
        return cls.create(
            rng,
            observations,
            actions,
            actor_def=actor_def,
            critic_def=critic_def,
            encoder_def=encoder_def,
            critic_ensemble_size=critic_ensemble_size,
            critic_subsample_size=critic_subsample_size,
            temperature_init=temperature_init,
            image_keys=tuple(image_keys),
            **kwargs,
        )
