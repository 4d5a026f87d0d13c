"""VICE: DrQ with a learned GAN-style reward classifier.

Capability parity: reference `serl_launcher/agents/continuous/vice.py` —
a "vice" binary classifier head over goal images whose sigmoid output
replaces the environment reward in critic updates (:519-529, :546, :594),
trained with BCE + mixup + label smoothing + gradient penalty in encoded
feature space to prevent discriminator collapse (:357-517).

Parameter-group design: the classifier is its own "vice" group with its own
optimizer; SAC updates step it with zero gradients (reference loss_fns
:349-355) and `update_vice` steps only it.
"""

from functools import partial
from typing import Dict, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from serl_tpu.agents.drq import DrQAgent, make_image_encoders
from serl_tpu.agents.sac import SACAgent
from serl_tpu.common.optimizers import make_optimizer
from serl_tpu.common.train_state import TrainState, nonpytree_field
from serl_tpu.common.typing import Batch, Data, Params, PRNGKey
from serl_tpu.vision.encoding import _fold_stack


class VICEClassifier(nn.Module):
    """Per-image-key encoders + MLP head -> logit, with encoded-feature
    pass-through for mixup/GP (reference networks/classifier.py variant)."""

    encoders: Dict[str, nn.Module]
    image_keys: Tuple[str, ...]
    hidden_dim: int = 256
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(
        self,
        obs,
        train: bool = False,
        return_encoded: bool = False,
        classify_encoded: bool = False,
    ):
        if classify_encoded:
            feats = {k: obs[k] for k in self.image_keys}
        else:
            imgs = obs.get("images", obs) if isinstance(obs, dict) else obs
            feats = {}
            for k in self.image_keys:
                img = imgs[k] if isinstance(imgs, dict) else imgs
                img = _fold_stack(img)
                feats[k] = self.encoders[k](img, train=train)
        if return_encoded:
            return feats
        x = jnp.concatenate([feats[k] for k in self.image_keys], axis=-1)
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = nn.Dense(1)(x)
        return jnp.squeeze(x, -1)


class VICEAgent(DrQAgent):
    vice_def: VICEClassifier = nonpytree_field(default=None)

    # ------------------------------------------------------------------ #

    def forward_vice(
        self,
        obs: Data,
        rng: Optional[PRNGKey] = None,
        *,
        grad_params: Optional[Params] = None,
        train: bool = True,
        **kwargs,
    ):
        params = grad_params if grad_params is not None else self.state.params
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        return self.vice_def.apply(
            {"params": params["vice"]}, obs, train=train, rngs=rngs, **kwargs
        )

    @jax.jit
    def vice_reward(self, observation: Data) -> jnp.ndarray:
        """sigmoid(classifier logit) (reference :519-529)."""
        return jax.nn.sigmoid(self.forward_vice(observation, train=False))

    def loss_fns(self, batch):
        fns = super().loss_fns(batch)
        fns["vice"] = lambda params, rng: (jnp.zeros(()), {})
        return fns

    # ------------------------------------------------------------------ #

    @jax.jit
    def update_vice(self, batch: Batch) -> Tuple["VICEAgent", dict]:
        """BCE + mixup + label smoothing + gradient penalty on the classifier
        (reference :357-517). Second half of the batch must be goal images
        (labels 1)."""
        rng = self.state.rng
        observations = batch["next_observations"]
        rng, aug_key = jax.random.split(rng)
        aug_obs = self.data_augmentation_fn(aug_key, observations)

        # encode (orig + augmented), goals first => labels [1]*B + [0]*B
        key_enc, rng = jax.random.split(rng)
        obs_all = {}
        for k in self.config.vice_image_keys:
            px = observations[k]
            apx = aug_obs[k]
            b = px.shape[0]
            obs_px = jnp.concatenate([px[: b // 2], apx[: b // 2]], axis=0)
            goal_px = jnp.concatenate([px[b // 2 :], apx[b // 2 :]], axis=0)
            obs_all[k] = jnp.concatenate([goal_px, obs_px], axis=0)
        bsz = 2 * (observations[self.config.vice_image_keys[0]].shape[0] // 2)
        labels = jnp.concatenate([jnp.ones(bsz), jnp.zeros(bsz)])
        labels = labels * 0.8 + 0.1  # label smoothing (reference :418)

        encoded = self.forward_vice(obs_all, key_enc, return_encoded=True)

        # mixup in encoded space (reference :375-388, 424-429)
        k0, k1, rng = jax.random.split(rng, 3)
        lam = jax.random.beta(k0, 1.0, 1.0)
        n = labels.shape[0]
        perm = jax.random.permutation(k1, n)
        mixed = {
            k: lam * v + (1 - lam) * v[perm] for k, v in encoded.items()
        }
        y_a, y_b = labels, labels[perm]

        # gradient-penalty interpolates (reference :431-448)
        k2, rng = jax.random.split(rng)
        gp = {}
        for k, v in mixed.items():
            eps = jax.random.uniform(k2, (n // 2,) + (1,) * (v.ndim - 1))
            gp[k] = eps * v[: n // 2] + (1 - eps) * v[n // 2 :]

        key_loss, key_gp, rng = jax.random.split(rng, 3)

        def vice_loss(params_full, _rng):
            def logits_fn(x):
                return self.forward_vice(
                    x, key_loss, grad_params=params_full, classify_encoded=True
                )

            y_hat = logits_fn(mixed)
            bce = lam * optax.sigmoid_binary_cross_entropy(y_hat, y_a).mean() + (
                1 - lam
            ) * optax.sigmoid_binary_cross_entropy(y_hat, y_b).mean()

            def scalar_logit(x):
                return logits_fn(x).sum()

            grads = jax.grad(
                lambda x: scalar_logit(x)
            )(gp)
            flat = jnp.concatenate(
                [g.reshape(g.shape[0], -1) for g in grads.values()], axis=-1
            )
            grad_norms = jnp.sqrt(jnp.sum(flat**2 + 1e-6, axis=-1))
            grad_penalty = jnp.mean((grad_norms - 1.0) ** 2)
            return bce + 10.0 * grad_penalty, {
                "bce_loss": bce,
                "grad_norm": grad_norms.mean(),
            }

        loss_fns = {g: (lambda p, r: (jnp.zeros(()), {})) for g in self.state.txs}
        loss_fns["vice"] = vice_loss
        new_state, info = self.state.apply_loss_fns(loss_fns)
        new_state = new_state.replace(rng=rng)
        return self.replace(state=new_state), info

    def _vice_rewards_for(self, next_obs: Data) -> jnp.ndarray:
        return (self.vice_reward(next_obs) >= 0.5).astype(jnp.float32)

    @partial(jax.jit, static_argnames=("utd_ratio", "pmean_axis"))
    def update_high_utd(
        self, batch: Batch, *, utd_ratio: int, pmean_axis: Optional[str] = None
    ) -> Tuple["VICEAgent", dict]:
        rng, aug_rng = jax.random.split(self.state.rng)
        batch = self._augment_batch(batch, aug_rng)
        batch = dict(batch)
        rewards = self._vice_rewards_for(batch["next_observations"])
        batch["rewards"] = rewards
        agent = self.replace(state=self.state.replace(rng=rng))
        agent, info = SACAgent.update_high_utd(
            agent, batch, utd_ratio=utd_ratio, pmean_axis=pmean_axis
        )
        info["vice_rewards"] = rewards.mean()
        return agent, info

    @partial(jax.jit, static_argnames=("pmean_axis",))
    def update_critics(
        self, batch: Batch, *, pmean_axis: Optional[str] = None
    ) -> Tuple["VICEAgent", dict]:
        rng, aug_rng = jax.random.split(self.state.rng)
        batch = self._augment_batch(batch, aug_rng)
        batch = dict(batch)
        batch["rewards"] = self._vice_rewards_for(batch["next_observations"])
        agent = self.replace(state=self.state.replace(rng=rng))
        agent, infos = SACAgent.update(
            agent,
            batch,
            pmean_axis=pmean_axis,
            networks_to_update=frozenset({"critic"}),
        )
        infos.pop("actor", None)
        infos.pop("temperature", None)
        return agent, infos

    # ------------------------------------------------------------------ #

    @classmethod
    def create_vice(
        cls,
        rng: PRNGKey,
        observations: Data,
        actions: jnp.ndarray,
        vice_observations: Data = None,
        *,
        encoder_type: str = "small",
        use_proprio: bool = True,
        image_keys: Iterable[str] = ("image",),
        vice_image_keys: Iterable[str] = ("image",),
        vice_network_kwargs: dict = None,
        vice_optimizer_kwargs: dict = {"learning_rate": 3e-4},
        **kwargs,
    ) -> "VICEAgent":
        vice_observations = (
            vice_observations if vice_observations is not None else observations
        )
        base = DrQAgent.create_drq(
            rng,
            observations,
            actions,
            encoder_type=encoder_type,
            use_proprio=use_proprio,
            image_keys=tuple(image_keys),
            **kwargs,
        )

        # build the vice classifier with its own encoders
        vice_encoders = make_image_encoders(encoder_type, tuple(vice_image_keys))
        vice_def = VICEClassifier(
            encoders=vice_encoders,
            image_keys=tuple(vice_image_keys),
        )
        rng_v = jax.random.fold_in(rng, 1)
        vice_params = vice_def.init(rng_v, vice_observations)["params"]

        params = dict(base.state.params)
        params["vice"] = vice_params
        txs = dict(base.state.txs)
        txs["vice"] = make_optimizer(**vice_optimizer_kwargs)
        state = TrainState.create(
            params=params,
            txs=txs,
            target_groups=("critic",),
            rng=base.state.rng,
        )
        config = base.config._replace(vice_image_keys=tuple(vice_image_keys))
        return cls(
            state=state,
            config=config,
            actor_def=base.actor_def,
            critic_def=base.critic_def,
            encoder_def=base.encoder_def,
            vice_def=vice_def,
        )
