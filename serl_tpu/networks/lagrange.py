"""Lagrange multipliers (used as the SAC temperature).

Capability parity: reference `serl_launcher/networks/lagrange.py:9-83`.
Implemented as plain functions over a tiny param dict (no module machinery —
it is one scalar), which keeps the temperature its own optimizer group.
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def init_lagrange_params(
    init_value: float = 1.0,
    constraint_shape: Sequence[int] = (),
    parameterization: str = "softplus",
):
    assert init_value > 0
    if parameterization == "softplus":
        raw = math.log(math.exp(init_value) - 1.0)
    elif parameterization == "exp":
        raw = math.log(init_value)
    else:
        raise ValueError(parameterization)
    return {"raw": jnp.full(constraint_shape, raw, dtype=jnp.float32)}


def lagrange_value(params, parameterization: str = "softplus") -> jax.Array:
    raw = params["raw"]
    if parameterization == "softplus":
        return jax.nn.softplus(raw)
    return jnp.exp(raw)


def lagrange_penalty(
    params,
    lhs: jax.Array,
    rhs: jax.Array = None,
    constraint_type: str = "geq",
    parameterization: str = "softplus",
) -> jax.Array:
    """multiplier * (lhs - rhs) for geq constraints, negated for leq
    (reference lagrange.py:61-74)."""
    mult = lagrange_value(params, parameterization)
    if rhs is None:
        rhs = jnp.zeros_like(lhs)
    diff = lhs - rhs
    if constraint_type == "leq":
        return -mult * diff
    return mult * diff
