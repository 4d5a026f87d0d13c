"""Vision encoders: ResNet-v1 (GroupNorm), SmallEncoder, pooling heads, FiLM.

Capability parity: reference `serl_launcher/vision/resnet_v1.py` (ResNet-10
= stage sizes (1,1,1,1), GroupNorm(4), in-graph ImageNet normalization,
pooling menu incl. spatial-learned-embeddings / spatial-softmax, frozen
`pre_pooling` mode + trainable pooling head, config registry),
`small_encoders.py` (4-conv SmallEncoder), `film_conditioning_layer.py`,
`spatial.py`.

TPU notes: convs run in NHWC (XLA's native TPU layout); an optional
`compute_dtype=bfloat16` casts conv inputs for MXU throughput while keeping
params + normalization in fp32.
"""

import functools as ft
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ModuleDef = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class FilmConditioning(nn.Module):
    """Per-channel affine conditioning, zeros-init (reference
    film_conditioning_layer.py:6-32)."""

    @nn.compact
    def __call__(self, conv_filters, conditioning):
        add = nn.Dense(conv_filters.shape[-1], kernel_init=nn.initializers.zeros)(
            conditioning
        )
        mult = nn.Dense(conv_filters.shape[-1], kernel_init=nn.initializers.zeros)(
            conditioning
        )
        add = add[..., None, None, :]
        mult = mult[..., None, None, :]
        return conv_filters * (1.0 + mult) + add


class SpatialLearnedEmbeddings(nn.Module):
    """Learned spatial pooling: per-feature spatial attention kernels
    (reference resnet_v1.py:81-116). The contraction is one einsum — a single
    MXU matmul over (H*W*C, F)."""

    num_features: int = 8

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        no_batch = features.ndim == 3
        if no_batch:
            features = features[None]
        h, w, c = features.shape[-3:]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (h, w, c, self.num_features),
        )
        out = jnp.einsum("bhwc,hwcf->bcf", features, kernel)
        out = out.reshape((features.shape[0], -1))
        return out[0] if no_batch else out


class SpatialSoftmax(nn.Module):
    """Soft-argmax keypoints (reference resnet_v1.py:34-78)."""

    temperature: float = 1.0
    learn_temperature: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        no_batch = features.ndim == 3
        if no_batch:
            features = features[None]
        b, h, w, c = features.shape
        if self.learn_temperature:
            temp = self.param("softmax_temperature", nn.initializers.ones, (1,))
        else:
            temp = self.temperature
        pos_x, pos_y = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, h), jnp.linspace(-1.0, 1.0, w)
        )
        pos_x = pos_x.reshape(-1)
        pos_y = pos_y.reshape(-1)
        flat = features.transpose(0, 3, 1, 2).reshape(b, c, h * w)
        attn = jax.nn.softmax(flat / temp, axis=-1)
        ex = (pos_x * attn).sum(-1)
        ey = (pos_y * attn).sum(-1)
        out = jnp.concatenate([ex, ey], axis=-1)
        return out[0] if no_batch else out


class AddSpatialCoordinates(nn.Module):
    """Append normalized (x, y) coordinate channels (resnet_v1.py:15-31)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[-3:-1]
        grid = np.stack(
            np.meshgrid(
                np.arange(h) / (h - 1) * 2 - 1,
                np.arange(w) / (w - 1) * 2 - 1,
                indexing="ij",
            ),
            axis=-1,
        ).astype(np.float32)
        grid = jnp.asarray(grid)
        grid = jnp.broadcast_to(grid, x.shape[:-1] + (2,))
        return jnp.concatenate([x, grid], axis=-1)


def _pool(x, method, num_spatial_blocks, train, dropout_rate=0.1):
    if method == "spatial_learned_embeddings":
        x = SpatialLearnedEmbeddings(num_features=num_spatial_blocks)(x)
        x = nn.Dropout(dropout_rate, deterministic=not train)(x)
    elif method == "spatial_softmax":
        x = SpatialSoftmax()(x)
    elif method == "avg":
        x = jnp.mean(x, axis=(-3, -2))
    elif method == "max":
        x = jnp.max(x, axis=(-3, -2))
    elif method == "none":
        pass
    else:
        raise ValueError(f"unknown pooling method {method}")
    return x


def _bottleneck(x, dim):
    x = nn.Dense(dim)(x)
    x = nn.LayerNorm()(x)
    return nn.tanh(x)


class ResNetBlock(nn.Module):
    """Basic ResNet-v1 block with GroupNorm (resnet_v1.py:129-157)."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    act: Callable
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides)(x)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters, (3, 3))(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides, name="conv_proj")(
                residual
            )
            residual = self.norm(name="norm_proj")(residual)
        return self.act(residual + y)


class BottleneckResNetBlock(nn.Module):
    """Bottleneck block (resnet_v1.py:159-186)."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    act: Callable
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters, (3, 3), self.strides)(y)
        y = self.norm()(y)
        y = self.act(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), self.strides, name="conv_proj"
            )(residual)
            residual = self.norm(name="norm_proj")(residual)
        return self.act(residual + y)


class ResNetEncoder(nn.Module):
    """ResNet-v1 with GroupNorm (resnet_v1.py:189-321)."""

    stage_sizes: Sequence[int]
    block_cls: ModuleDef = ResNetBlock
    num_filters: int = 64
    act: str = "relu"
    norm: str = "group"
    add_spatial_coordinates: bool = False
    pooling_method: str = "avg"
    num_spatial_blocks: int = 8
    use_film: bool = False
    use_multiplicative_cond: bool = False
    bottleneck_dim: Optional[int] = None
    pre_pooling: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, observations, train: bool = True, cond_var=None):
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        x = (observations.astype(jnp.float32) / 255.0 - mean) / std
        if self.add_spatial_coordinates:
            x = AddSpatialCoordinates()(x)
        x = x.astype(self.compute_dtype)

        conv = ft.partial(
            nn.Conv,
            use_bias=False,
            dtype=self.compute_dtype,
            kernel_init=nn.initializers.kaiming_normal(),
        )
        if self.norm == "group":
            norm = ft.partial(nn.GroupNorm, num_groups=4, epsilon=1e-5)
        elif self.norm == "layer":
            norm = ft.partial(nn.LayerNorm, epsilon=1e-5)
        else:
            raise ValueError(self.norm)
        act = getattr(nn, self.act)

        x = conv(
            self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
            name="conv_init",
        )(x)
        x = norm(name="norm_init")(x)
        x = act(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, block_size in enumerate(self.stage_sizes):
            for j in range(block_size):
                stride = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block_cls(
                    self.num_filters * 2**i,
                    strides=stride,
                    conv=conv,
                    norm=norm,
                    act=act,
                )(x)
                if self.use_film:
                    assert cond_var is not None
                    x = FilmConditioning()(x, cond_var)
                if self.use_multiplicative_cond:
                    assert cond_var is not None
                    cond_out = nn.Dense(
                        x.shape[-1], kernel_init=nn.initializers.xavier_normal()
                    )(cond_var)
                    x = x * cond_out[..., None, None, :]

        x = x.astype(jnp.float32)
        if self.pre_pooling:
            # frozen-feature mode: downstream pooling heads train on top
            return jax.lax.stop_gradient(x)

        x = _pool(x, self.pooling_method, self.num_spatial_blocks, train)
        if self.bottleneck_dim is not None:
            x = _bottleneck(x, self.bottleneck_dim)
        return x


class PreTrainedResNetEncoder(nn.Module):
    """Trainable pooling head over frozen pre-pooling features
    (resnet_v1.py:324-376)."""

    pretrained_encoder: nn.Module
    pooling_method: str = "avg"
    num_spatial_blocks: int = 8
    bottleneck_dim: Optional[int] = None

    @nn.compact
    def __call__(self, observations, encode: bool = True, train: bool = True):
        x = observations
        if encode:
            x = self.pretrained_encoder(x, train=train)
        x = _pool(x, self.pooling_method, self.num_spatial_blocks, train)
        if self.bottleneck_dim is not None:
            x = _bottleneck(x, self.bottleneck_dim)
        return x


class SmallEncoder(nn.Module):
    """4-conv encoder (reference small_encoders.py:9-55).

    `compute_dtype=bfloat16` (the DrQ default, set in the encoder registry)
    runs the convs on the MXU's bf16 path with fp32 params and fp32
    pooling/bottleneck — the standard TPU mixed-precision recipe."""

    features: Sequence[int] = (32, 64, 128, 256)
    kernel_sizes: Sequence[int] = (3, 3, 3, 3)
    strides: Sequence[int] = (2, 2, 2, 2)
    padding: Union[Sequence[int], str] = "VALID"
    pool_method: str = "avg"
    bottleneck_dim: Optional[int] = 256
    spatial_block_size: int = 8
    compute_dtype: Any = jnp.float32
    # MXU stem experiments (tools/mfu_experiments.py): the 3-channel first
    # conv wastes contraction lanes. `pad_input_channels` zero-pads the RGB
    # input to N channels (same function — the extra kernel taps multiply
    # zeros). `space_to_depth_stem` rewrites conv1 exactly as
    # space-to-depth(2) + a 2x2 stride-1 conv over 12 channels (K=48
    # contraction instead of 27; the function family is a superset of the
    # original stride-2 3x3 conv).
    pad_input_channels: Optional[int] = None
    space_to_depth_stem: bool = False

    @nn.compact
    def __call__(self, observations, train: bool = False, encode: bool = True):
        x = observations.astype(self.compute_dtype) / 255.0
        if self.pad_input_channels:
            extra = self.pad_input_channels - x.shape[-1]
            if extra > 0:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, extra)])
        for i, f in enumerate(self.features):
            pad = self.padding if isinstance(self.padding, str) else self.padding[i]
            if i == 0 and self.space_to_depth_stem and self.strides[0] == 2:
                # (..., H, W, C) -> (..., H/2, W/2, 4C)
                *lead, H, W, C = x.shape
                x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
                x = jnp.moveaxis(x, -4, -2)  # (..., H/2, W/2, 2, 2, C)
                x = x.reshape(*lead, H // 2, W // 2, 4 * C)
                x = nn.Conv(
                    f,
                    kernel_size=(2, 2),
                    strides=(1, 1),
                    padding="VALID",
                    dtype=self.compute_dtype,
                )(x)
            else:
                x = nn.Conv(
                    f,
                    kernel_size=(self.kernel_sizes[i],) * 2,
                    strides=(self.strides[i],) * 2,
                    padding=pad,
                    dtype=self.compute_dtype,
                )(x)
            x = nn.relu(x)
        x = x.astype(jnp.float32)
        x = _pool(
            x,
            "spatial_learned_embeddings"
            if self.pool_method == "spatial_learned_embeddings"
            else self.pool_method,
            self.spatial_block_size,
            train,
        )
        if self.bottleneck_dim is not None:
            x = _bottleneck(x, self.bottleneck_dim)
        return x


resnetv1_configs = {
    "resnetv1-10": ft.partial(
        ResNetEncoder, stage_sizes=(1, 1, 1, 1), block_cls=ResNetBlock
    ),
    "resnetv1-10-frozen": ft.partial(
        ResNetEncoder, stage_sizes=(1, 1, 1, 1), block_cls=ResNetBlock,
        pre_pooling=True,
    ),
    "resnetv1-18": ft.partial(
        ResNetEncoder, stage_sizes=(2, 2, 2, 2), block_cls=ResNetBlock
    ),
    "resnetv1-34": ft.partial(
        ResNetEncoder, stage_sizes=(3, 4, 6, 3), block_cls=ResNetBlock
    ),
    "resnetv1-50": ft.partial(
        ResNetEncoder, stage_sizes=(3, 4, 6, 3), block_cls=BottleneckResNetBlock
    ),
    "resnetv1-18-bridge": ft.partial(
        ResNetEncoder, stage_sizes=(2, 2, 2, 2), block_cls=ResNetBlock,
        num_spatial_blocks=8,
    ),
    "resnetv1-34-bridge": ft.partial(
        ResNetEncoder, stage_sizes=(3, 4, 6, 3), block_cls=ResNetBlock,
        num_spatial_blocks=8,
    ),
    "resnetv1-34-bridge-film": ft.partial(
        ResNetEncoder, stage_sizes=(3, 4, 6, 3), block_cls=ResNetBlock,
        num_spatial_blocks=8, use_film=True,
    ),
    "resnetv1-50-bridge": ft.partial(
        ResNetEncoder, stage_sizes=(3, 4, 6, 3), block_cls=BottleneckResNetBlock,
        num_spatial_blocks=8,
    ),
}

small_configs = {"small": SmallEncoder}
