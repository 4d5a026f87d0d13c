"""Minimal, jit-friendly action distributions.

The reference uses distrax (`TanhMultivariateNormalDiag`,
`serl_launcher/networks/actor_critic_nets.py:230-272`). distrax is not part of
this image and pulls in unneeded machinery, so we implement the two
distributions SERL actually uses as tiny pytree dataclasses with closed-form
math. Everything is elementwise VPU work that XLA fuses into the surrounding
policy forward pass.

Numerical note: log|d tanh(x)/dx| = log(1 - tanh(x)^2) is computed via the
stable identity 2*(log 2 - x - softplus(-2x)) instead of log1p(-tanh(x)^2).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = math.log(2.0 * math.pi)
_LOG_2 = math.log(2.0)


@struct.dataclass
class Normal:
    """Diagonal Gaussian over the last axis (event dim)."""

    loc: jax.Array
    scale: jax.Array

    def sample(self, seed: jax.Array) -> jax.Array:
        eps = jax.random.normal(seed, self.loc.shape, self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, value: jax.Array) -> jax.Array:
        z = (value - self.loc) / self.scale
        per_dim = -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)
        return per_dim.sum(axis=-1)

    def sample_and_log_prob(self, seed: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = self.sample(seed)
        return x, self.log_prob(x)

    def mode(self) -> jax.Array:
        return self.loc

    def stddev(self) -> jax.Array:
        return jnp.broadcast_to(self.scale, self.loc.shape)

    def entropy(self) -> jax.Array:
        per_dim = 0.5 * (1.0 + _LOG_2PI) + jnp.log(self.scale)
        return jnp.broadcast_to(per_dim, self.loc.shape).sum(axis=-1)


def _tanh_log_det_jacobian(pre_tanh: jax.Array) -> jax.Array:
    # log(1 - tanh(x)^2) == 2 * (log 2 - x - softplus(-2x)), summed over event dim
    per_dim = 2.0 * (_LOG_2 - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
    return per_dim.sum(axis=-1)


@struct.dataclass
class TanhNormal:
    """tanh-squashed diagonal Gaussian, optionally rescaled to [low, high].

    Matches the behavior of the reference's TanhMultivariateNormalDiag
    (`actor_critic_nets.py:230-272`): samples are tanh(normal sample) mapped
    affinely into [low, high] when bounds are given; `mode()` pushes the
    Gaussian mean through the bijector.
    """

    loc: jax.Array
    scale: jax.Array
    low: Optional[jax.Array] = None
    high: Optional[jax.Array] = None

    def _forward(self, x: jax.Array) -> jax.Array:
        y = jnp.tanh(x)
        if self.low is not None and self.high is not None:
            y = (y + 1.0) * 0.5 * (self.high - self.low) + self.low
        return y

    def _scale_log_det(self, shape) -> jax.Array:
        if self.low is None or self.high is None:
            return jnp.zeros(shape[:-1])
        per_dim = jnp.log(0.5 * (self.high - self.low))
        return jnp.broadcast_to(per_dim, shape).sum(axis=-1)

    def sample(self, seed: jax.Array) -> jax.Array:
        eps = jax.random.normal(seed, self.loc.shape, self.loc.dtype)
        return self._forward(self.loc + self.scale * eps)

    def sample_and_log_prob(self, seed: jax.Array) -> Tuple[jax.Array, jax.Array]:
        eps = jax.random.normal(seed, self.loc.shape, self.loc.dtype)
        pre = self.loc + self.scale * eps
        base = Normal(self.loc, self.scale).log_prob(pre)
        log_det = _tanh_log_det_jacobian(pre) + self._scale_log_det(pre.shape)
        return self._forward(pre), base - log_det

    def log_prob(self, value: jax.Array) -> jax.Array:
        """Log-density of a squashed sample (inverts the bijector; clipped for
        numerical safety near the boundary)."""
        y = value
        if self.low is not None and self.high is not None:
            y = (y - self.low) / (0.5 * (self.high - self.low)) - 1.0
        y = jnp.clip(y, -1.0 + 1e-6, 1.0 - 1e-6)
        pre = jnp.arctanh(y)
        base = Normal(self.loc, self.scale).log_prob(pre)
        log_det = _tanh_log_det_jacobian(pre) + self._scale_log_det(pre.shape)
        return base - log_det

    def mode(self) -> jax.Array:
        return self._forward(self.loc)

    def stddev(self) -> jax.Array:
        # Matches reference semantics (bijector-forward of the base stddev).
        return self._forward(jnp.broadcast_to(self.scale, self.loc.shape))
