"""MobileNetV1 backbone + pretrained-checkpoint import.

Closes the reference's "actual pretrained MobileNet" path
(`serl_launcher/vision/mobilenet.py:11-72` wraps an externally-provided
jax MobileNet + params file; the flag docs point at ImageNet-pretrained
MobileNetV1 weights). Here the backbone is implemented from scratch in
flax (standard MobileNetV1: 3x3 stride-2 stem + 13 depthwise-separable
blocks, width multiplier), and `load_tf_slim_params` converts the layout
every public MobileNetV1 checkpoint ships in — the TF-slim naming
(`MobilenetV1/Conv2d_0/weights`, `Conv2d_<k>_depthwise/depthwise_weights`,
`Conv2d_<k>_pointwise/weights`, BatchNorm gamma/beta/moving_mean/
moving_variance), saved as an .npz or pickle of name -> array — into this
module's param tree. Inference folds BatchNorm into a frozen affine
(the backbone is always applied frozen under stop-gradient, reference
behavior), so only (scale, bias) per conv are materialized.

Usage:
    backbone = MobileNetV1(width=1.0)
    variables = backbone.init(rng, jnp.zeros((1, 224, 224, 3)))
    params = load_tf_slim_params("mobilenet_v1_1.0_224.npz", width=1.0)
    enc = FrozenBackboneEncoder(
        backbone_apply=lambda p, x: backbone.apply({"params": p}, x),
        backbone_params=params, ...)
"""

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# (pointwise_channels, stride) per depthwise-separable block — standard V1
_BLOCKS: Sequence[Tuple[int, int]] = (
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
    (1024, 2), (1024, 1),
)


class _FoldedBN(nn.Module):
    """Frozen inference BatchNorm as per-channel affine y = x*scale + bias
    (scale = gamma/sqrt(var+eps), bias = beta - mean*scale, folded at load
    time or learned-identity at init)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class MobileNetV1(nn.Module):
    """Feature extractor (no classifier head): returns the final
    (H/32, W/32, 1024*width) feature map."""

    width: float = 1.0

    def _c(self, ch: int) -> int:
        return max(8, int(ch * self.width))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self._c(32), (3, 3), strides=2, padding="SAME",
                    use_bias=False, name="conv0")(x)
        x = _FoldedBN(self._c(32), name="conv0_bn")(x)
        x = nn.relu6(x)
        for i, (ch, stride) in enumerate(_BLOCKS, start=1):
            in_ch = x.shape[-1]
            # depthwise 3x3
            x = nn.Conv(
                in_ch, (3, 3), strides=stride, padding="SAME",
                feature_group_count=in_ch, use_bias=False,
                name=f"conv{i}_dw",
            )(x)
            x = _FoldedBN(in_ch, name=f"conv{i}_dw_bn")(x)
            x = nn.relu6(x)
            # pointwise 1x1
            x = nn.Conv(self._c(ch), (1, 1), use_bias=False,
                        name=f"conv{i}_pw")(x)
            x = _FoldedBN(self._c(ch), name=f"conv{i}_pw_bn")(x)
            x = nn.relu6(x)
        return x


def _fold_bn(weights: Dict[str, np.ndarray], prefix: str, eps=1e-3):
    gamma = np.asarray(weights[f"{prefix}/BatchNorm/gamma"])
    beta = np.asarray(weights[f"{prefix}/BatchNorm/beta"])
    mean = np.asarray(weights[f"{prefix}/BatchNorm/moving_mean"])
    var = np.asarray(weights[f"{prefix}/BatchNorm/moving_variance"])
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}


def load_tf_slim_params(path_or_dict: Any, width: float = 1.0) -> Dict:
    """TF-slim MobileNetV1 checkpoint (name -> array; .npz / pickle path or
    an already-loaded dict) -> params for `MobileNetV1(width=width)`.

    TF conv kernels are (H, W, Cin, Cout) like flax; depthwise kernels are
    (H, W, Cin, channel_multiplier=1), which flax's grouped Conv stores as
    (H, W, 1, Cin) — transposed here. BatchNorms are folded to affine."""
    if isinstance(path_or_dict, dict):
        w = path_or_dict
    elif str(path_or_dict).endswith(".npz"):
        w = dict(np.load(path_or_dict))
    else:
        import pickle

        with open(path_or_dict, "rb") as f:
            w = pickle.load(f)
    # tolerate both with and without the MobilenetV1/ root prefix
    if not any(k.startswith("MobilenetV1/") for k in w):
        w = {f"MobilenetV1/{k}": v for k, v in w.items()}

    params: Dict[str, Any] = {}
    params["conv0"] = {
        "kernel": jnp.asarray(w["MobilenetV1/Conv2d_0/weights"])
    }
    params["conv0_bn"] = _fold_bn(w, "MobilenetV1/Conv2d_0")
    for i in range(1, len(_BLOCKS) + 1):
        dw = np.asarray(
            w[f"MobilenetV1/Conv2d_{i}_depthwise/depthwise_weights"]
        )
        # (H, W, Cin, 1) -> (H, W, 1, Cin): flax grouped-conv kernel layout
        params[f"conv{i}_dw"] = {
            "kernel": jnp.asarray(np.transpose(dw, (0, 1, 3, 2)))
        }
        params[f"conv{i}_dw_bn"] = _fold_bn(
            w, f"MobilenetV1/Conv2d_{i}_depthwise"
        )
        params[f"conv{i}_pw"] = {
            "kernel": jnp.asarray(
                w[f"MobilenetV1/Conv2d_{i}_pointwise/weights"]
            )
        }
        params[f"conv{i}_pw_bn"] = _fold_bn(
            w, f"MobilenetV1/Conv2d_{i}_pointwise"
        )
    return params


def make_mobilenet_encoder(params, width: float = 1.0, **encoder_kwargs):
    """Pretrained frozen MobileNetV1 + trainable pooling head — the
    reference MobileNetEncoder assembled end to end."""
    from serl_tpu.vision.mobilenet import FrozenBackboneEncoder

    backbone = MobileNetV1(width=width)
    return FrozenBackboneEncoder(
        backbone_apply=lambda p, x: backbone.apply({"params": p}, x),
        backbone_params=params,
        **encoder_kwargs,
    )
