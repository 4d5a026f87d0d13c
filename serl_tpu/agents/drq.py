"""DrQ: SAC from pixels with in-graph random-crop augmentation.

Capability parity: reference `serl_launcher/agents/continuous/drq.py` —
per-image-key encoders shared between actor and critic (:137-198),
`data_augmentation_fn` random-crop pad 4 on obs and next_obs (:244-253),
`update_high_utd` with augmentation before the UTD loop (:255-294),
`update_critics` for critic-only steps (:296-328), encoder registry
small / resnet / resnet-pretrained (:137-186).

The shared encoder lives in the "critic" param group (see
serl_tpu/agents/sac.py); the frozen pretrained ResNet's params sit under
the encoder subtree and receive no gradient (pre_pooling stop-gradient).
"""

from functools import partial
from typing import Iterable, Optional, Tuple

import jax

from serl_tpu.agents.sac import SACAgent
from serl_tpu.common.typing import Batch, Data, PRNGKey
from serl_tpu.vision.augmentations import batched_random_crop
from serl_tpu.vision.encoding import ObsEncoder


def make_image_encoders(
    encoder_type: str, image_keys: Iterable[str], shared: bool = False
) -> dict:
    """Encoder registry (reference drq.py:137-186).

    `shared=True` maps ONE encoder module (one parameter set) to every
    camera; `ObsEncoder` then batches all cameras through a single conv
    pipeline (2x batch per matmul on the MXU instead of two sequential
    applies). The reference trains separate per-camera encoders — keep the
    default for parity, opt in for throughput."""
    if encoder_type == "small":
        import jax.numpy as jnp

        from serl_tpu.vision.encoders import SmallEncoder

        def small(name):
            return SmallEncoder(
                features=(32, 64, 128, 256),
                kernel_sizes=(3, 3, 3, 3),
                strides=(2, 2, 2, 2),
                padding="VALID",
                pool_method="avg",
                bottleneck_dim=256,
                spatial_block_size=8,
                compute_dtype=jnp.bfloat16,
                name=name,
            )

        if shared:
            enc = small("encoder_shared")
            return {key: enc for key in image_keys}
        return {key: small(f"encoder_{key}") for key in image_keys}
    if encoder_type == "resnet":
        import jax.numpy as jnp

        from serl_tpu.vision.encoders import resnetv1_configs

        def resnet(name):
            return resnetv1_configs["resnetv1-10"](
                pooling_method="spatial_learned_embeddings",
                num_spatial_blocks=8,
                bottleneck_dim=256,
                compute_dtype=jnp.bfloat16,
                name=name,
            )

        if shared:
            enc = resnet("encoder_shared")
            return {key: enc for key in image_keys}
        return {key: resnet(f"encoder_{key}") for key in image_keys}
    if encoder_type == "resnet-pretrained":
        from serl_tpu.vision.encoders import (
            PreTrainedResNetEncoder,
            resnetv1_configs,
        )

        # one backbone INSTANCE per key: flax binds a shared instance's
        # params under the first owner only (encoders_<first>), which left
        # the other keys' `pretrained_encoder` subtree missing at graft time.
        # Per-key instances match the reference layout (every encoder_{k}
        # carries its own pretrained_encoder subtree grafted from the same
        # pkl, train_utils.py:69-130).
        return {
            key: PreTrainedResNetEncoder(
                pooling_method="spatial_learned_embeddings",
                num_spatial_blocks=8,
                bottleneck_dim=256,
                pretrained_encoder=resnetv1_configs["resnetv1-10-frozen"](
                    pre_pooling=True, name=f"pretrained_encoder_{key}"
                ),
                name=f"encoder_{key}",
            )
            for key in image_keys
        }
    raise NotImplementedError(f"unknown encoder type {encoder_type}")


class DrQAgent(SACAgent):
    def data_augmentation_fn(self, rng: PRNGKey, observations: Data) -> Data:
        """Random-crop every image key, pad 4, independent per (batch, stack)
        element (reference drq.py:244-253). Observations follow the SERL flat
        convention: {"state": vec, "<image_key>": (B, T, H, W, C)}."""
        out = dict(observations)
        nested = "images" in out  # also accept {"images": {...}} layouts
        images = dict(out["images"]) if nested else out
        for key in self.config.image_keys:
            rng, k = jax.random.split(rng)
            img = images[key]
            num_batch_dims = 2 if img.ndim == 5 else 1
            images[key] = batched_random_crop(
                img, k, padding=4, num_batch_dims=num_batch_dims
            )
        if nested:
            out["images"] = images
        else:
            out = images
        return out

    def _augment_batch(self, batch: Batch, rng: PRNGKey) -> Batch:
        if not getattr(self.config, "augment", True):
            return batch
        rng, k_obs, k_next = jax.random.split(rng, 3)
        batch = dict(batch)
        batch["observations"] = self.data_augmentation_fn(
            k_obs, batch["observations"]
        )
        batch["next_observations"] = self.data_augmentation_fn(
            k_next, batch["next_observations"]
        )
        return batch

    @partial(jax.jit, static_argnames=("utd_ratio", "pmean_axis"))
    def update_high_utd(
        self,
        batch: Batch,
        *,
        utd_ratio: int,
        pmean_axis: Optional[str] = None,
    ) -> Tuple["DrQAgent", dict]:
        rng, aug_rng = jax.random.split(self.state.rng)
        batch = self._augment_batch(batch, aug_rng)
        agent = self.replace(state=self.state.replace(rng=rng))
        return SACAgent.update_high_utd(
            agent, batch, utd_ratio=utd_ratio, pmean_axis=pmean_axis
        )

    @partial(jax.jit, static_argnames=("pmean_axis",))
    def update_critics(
        self, batch: Batch, *, pmean_axis: Optional[str] = None
    ) -> Tuple["DrQAgent", dict]:
        """Critic-only augmented update (reference drq.py:296-328), used for
        the extra critic steps of critic_actor_ratio in the async examples."""
        rng, aug_rng = jax.random.split(self.state.rng)
        batch = self._augment_batch(batch, aug_rng)
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

    @classmethod
    def create_drq(
        cls,
        rng: PRNGKey,
        observations: Data,
        actions: jax.Array,
        *,
        encoder_type: str = "small",
        shared_encoder: bool = False,
        shared_batch_concat: bool = True,
        use_proprio: bool = True,
        custom_encoders: Optional[dict] = None,  # per-key modules (perf ablations)
        augment: bool = True,
        image_keys: Iterable[str] = ("image",),
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
    ) -> "DrQAgent":
        encoders = custom_encoders or make_image_encoders(
            encoder_type, image_keys, shared=shared_encoder
        )
        encoder_def = ObsEncoder(
            encoders=encoders,
            use_proprio=use_proprio,
            enable_stacking=True,
            image_keys=tuple(image_keys),
            shared_batch_concat=shared_batch_concat,
        )
        agent = cls.create_pixels(
            rng,
            observations,
            actions,
            encoder_def=encoder_def,
            critic_network_kwargs=critic_network_kwargs,
            policy_network_kwargs=policy_network_kwargs,
            policy_kwargs=policy_kwargs,
            critic_ensemble_size=critic_ensemble_size,
            critic_subsample_size=critic_subsample_size,
            temperature_init=temperature_init,
            image_keys=tuple(image_keys),
            **kwargs,
        )
        if not augment:
            agent = agent.replace(
                config=agent.config._replace(augment=False)
            )
        if encoder_type == "resnet-pretrained":
            from serl_tpu.utils.pretrained import load_resnet10_params

            # the user explicitly asked for pretrained weights: fail loudly
            # rather than silently training a random frozen encoder
            agent = load_resnet10_params(agent, tuple(image_keys), strict=True)
        return agent
