"""Frozen-backbone encoder (MobileNet-style).

Capability parity: reference `serl_launcher/vision/mobilenet.py:11-72` —
apply an externally-provided pretrained module + params with stop-gradient,
then the standard pooling menu + bottleneck. The backbone is injected (the
reference loads it from a jax MobileNet implementation + params file), so
this works for any flax image backbone.
"""

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from serl_tpu.vision.encoders import IMAGENET_MEAN, IMAGENET_STD, _bottleneck, _pool


class FrozenBackboneEncoder(nn.Module):
    """Applies `backbone_apply(backbone_params, x)` frozen, then a trainable
    pooling head."""

    backbone_apply: Callable = None  # (params, images_f32) -> feature map
    backbone_params: Any = None
    pooling_method: str = "spatial_learned_embeddings"
    num_spatial_blocks: int = 8
    bottleneck_dim: Optional[int] = 256
    normalize_imagenet: bool = True

    @nn.compact
    def __call__(self, observations, train: bool = True, encode: bool = True):
        x = observations
        if encode:
            x = x.astype(jnp.float32) / 255.0
            if self.normalize_imagenet:
                x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            x = self.backbone_apply(self.backbone_params, x)
            x = jax.lax.stop_gradient(x)
        x = _pool(x, self.pooling_method, self.num_spatial_blocks, train)
        if self.bottleneck_dim is not None:
            x = _bottleneck(x, self.bottleneck_dim)
        return x


MobileNetEncoder = FrozenBackboneEncoder  # reference-compatible alias
