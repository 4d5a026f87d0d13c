"""Behavior cloning agent.

Capability parity: reference `serl_launcher/agents/continuous/bc.py` —
NLL loss on a (non-squashed by default) Gaussian policy (:46-69), argmax or
sampled inference (:78-97), debug metrics (:99-115), same encoder registry
as DrQ (:136-192). Note the reference's Policy always stop-gradients its
encoder, so BC trains only the policy head — mirrored here by keeping the
encoder in its own untrained group.
"""

from functools import partial
from typing import Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from serl_tpu.common.optimizers import make_optimizer
from serl_tpu.common.train_state import TrainState, nonpytree_field
from serl_tpu.common.typing import Batch, Data, PRNGKey
from serl_tpu.networks.actor_critic import PolicyNet


class BCConfig(struct.PyTreeNode):
    image_keys: Tuple[str, ...] = nonpytree_field(default=())


class BCAgent(struct.PyTreeNode):
    state: TrainState
    actor_def: PolicyNet = nonpytree_field()
    encoder_def: Optional[nn.Module] = nonpytree_field(default=None)
    image_keys: Tuple[str, ...] = nonpytree_field(default=())

    def _features(self, obs: Data, train: bool, rng=None):
        if self.encoder_def is None:
            return obs
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        feats = self.encoder_def.apply(
            {"params": self.state.params["encoder"]}, obs, train=train, rngs=rngs
        )
        return jax.lax.stop_gradient(feats)

    def forward_policy(
        self,
        obs: Data,
        rng: Optional[PRNGKey] = None,
        *,
        grad_params=None,
        train: bool = True,
        temperature: float = 1.0,
    ):
        params = grad_params if grad_params is not None else self.state.params
        feats = self._features(obs, train, rng)
        rngs = {"dropout": rng} if (train and rng is not None) else {}
        return self.actor_def.apply(
            {"params": params["actor"]},
            feats,
            temperature=temperature,
            train=train,
            rngs=rngs,
        )

    @jax.jit
    def update(self, batch: Batch) -> Tuple["BCAgent", dict]:
        def loss_fn(params, rng):
            rng, key = jax.random.split(rng)
            dist = self.forward_policy(
                batch["observations"], rng=key, grad_params=params
            )
            log_probs = dist.log_prob(batch["actions"])
            mse = ((dist.mode() - batch["actions"]) ** 2).sum(-1)
            loss = -log_probs.mean()
            return loss, {"actor_loss": loss, "mse": mse.mean()}

        new_state, info = self.state.apply_loss_fns({"actor": loss_fn})
        return self.replace(state=new_state), info["actor"]

    @partial(jax.jit, static_argnames=("argmax",))
    def sample_actions(
        self,
        observations: Data,
        *,
        seed: Optional[PRNGKey] = None,
        temperature: float = 1.0,
        argmax: bool = False,
    ) -> jnp.ndarray:
        dist = self.forward_policy(
            observations, train=False, temperature=temperature
        )
        if argmax:
            return dist.mode()
        return dist.sample(seed=seed)

    @jax.jit
    def get_debug_metrics(self, batch) -> dict:
        dist = self.forward_policy(batch["observations"], train=False)
        pi_actions = dist.mode()
        log_probs = dist.log_prob(batch["actions"])
        mse = ((pi_actions - batch["actions"]) ** 2).sum(-1)
        return {"mse": mse, "log_probs": log_probs, "pi_actions": pi_actions}

    @classmethod
    def create(
        cls,
        rng: PRNGKey,
        observations: Data,
        actions: jnp.ndarray,
        *,
        encoder_type: str = "small",
        image_keys: Iterable[str] = (),
        use_proprio: bool = False,
        network_kwargs: dict = {"hidden_dims": (256, 256)},
        policy_kwargs: dict = {"tanh_squash_distribution": False},
        learning_rate: float = 3e-4,
    ) -> "BCAgent":
        image_keys = tuple(image_keys)
        encoder_def = None
        enc_params = {}
        feats = observations
        rng, enc_key, actor_key = jax.random.split(rng, 3)

        if image_keys:
            from serl_tpu.agents.drq import make_image_encoders
            from serl_tpu.vision.encoding import ObsEncoder

            encoders = make_image_encoders(encoder_type, image_keys)
            encoder_def = ObsEncoder(
                encoders=encoders,
                use_proprio=use_proprio,
                enable_stacking=True,
                image_keys=image_keys,
            )
            enc_params = encoder_def.init(enc_key, observations)["params"]
            feats = encoder_def.apply({"params": enc_params}, observations)

        pk = dict(policy_kwargs)
        actor_def = PolicyNet(
            action_dim=actions.shape[-1],
            hidden_dims=tuple(network_kwargs.get("hidden_dims", (256, 256))),
            activations=network_kwargs.get("activations", nn.swish),
            use_layer_norm=network_kwargs.get("use_layer_norm", False),
            std_parameterization=pk.get("std_parameterization", "exp"),
            std_min=pk.get("std_min", 1e-5),
            std_max=pk.get("std_max", 10.0),
            tanh_squash=pk.get("tanh_squash_distribution", False),
            fixed_std=pk.get("fixed_std"),
        )
        actor_params = actor_def.init(actor_key, feats)["params"]

        params = {"actor": actor_params}
        txs = {"actor": make_optimizer(learning_rate=learning_rate)}
        if image_keys:
            params["encoder"] = enc_params

        rng, state_key = jax.random.split(rng)
        state = TrainState.create(params=params, txs=txs, rng=state_key)

        agent = cls(
            state=state,
            actor_def=actor_def,
            encoder_def=encoder_def,
            image_keys=image_keys,
        )
        if encoder_type == "resnet-pretrained" and image_keys:
            agent = _load_bc_pretrained(agent, image_keys)
        return agent


def _load_bc_pretrained(agent: BCAgent, image_keys):
    """Graft pretrained ResNet-10 into the BC encoder group (layout differs
    from SAC's critic-group encoder)."""
    from serl_tpu.utils.pretrained import _find_params_file
    import pickle
    import logging

    path = _find_params_file()
    if path is None:
        logging.getLogger(__name__).warning(
            "resnet10_params.pkl not found; keeping random encoder init"
        )
        return agent
    with open(path, "rb") as f:
        encoder_params = pickle.load(f)
    params = jax.device_get(agent.state.params)
    for key in image_keys:
        subtree = params["encoder"][f"encoder_{key}"]["pretrained_encoder"]
        for k in list(subtree.keys()):
            if k in encoder_params:
                subtree[k] = jax.tree.map(jnp.asarray, encoder_params[k])
    return agent.replace(state=agent.state.replace(params=params))
