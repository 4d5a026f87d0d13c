"""MLP family, including an MXU-batched ensemble MLP.

Capability parity: reference `serl_launcher/networks/mlp.py` (MLP,
MLPResNetBlock, MLPResNet) and `ensemblize` (`actor_critic_nets.py:156-164`).

The reference builds critic ensembles with `nn.vmap` over module params. Here
the ensemble is a first-class leading axis on the kernels: `EnsembleDense`
holds an (E, in, out) kernel and contracts with a single
`einsum("...i,eio->e...o")`, which XLA lowers to one batched matmul on the
MXU — no per-member dispatch, and the ensemble axis is shardable.
"""

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

default_init = nn.initializers.xavier_uniform


def resolve_activation(act: Union[str, Callable]) -> Callable:
    if isinstance(act, str):
        return getattr(nn, act)
    return act


class MLP(nn.Module):
    """Dense stack with optional dropout/LayerNorm, matching reference ordering
    (Dense -> dropout -> LayerNorm -> activation; `mlp.py:17-32`)."""

    hidden_dims: Sequence[int]
    activations: Union[str, Callable] = nn.swish
    activate_final: bool = False
    use_layer_norm: bool = False
    dropout_rate: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = resolve_activation(self.activations)
        for i, size in enumerate(self.hidden_dims):
            x = nn.Dense(size, kernel_init=default_init())(x)
            if i + 1 < len(self.hidden_dims) or self.activate_final:
                if self.dropout_rate is not None and self.dropout_rate > 0:
                    x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
                if self.use_layer_norm:
                    x = nn.LayerNorm()(x)
                x = act(x)
        return x


class EnsembleDense(nn.Module):
    """Dense layer with a leading ensemble axis, contracted as one batched
    matmul. Input: (..., in) shared across members, or (E, ..., in) per-member.
    Output: (E, ..., out)."""

    ensemble_size: int
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None  # per-member init; xavier by default

    @nn.compact
    def __call__(self, x: jnp.ndarray, member_inputs: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        member_init = self.kernel_init if self.kernel_init is not None else default_init()
        kernel = self.param(
            "kernel",
            lambda key, shape: _stacked_init(member_init, key, shape),
            (self.ensemble_size, in_features, self.features),
        )
        if member_inputs:
            y = jnp.einsum("e...i,eio->e...o", x, kernel)
        else:
            y = jnp.einsum("...i,eio->e...o", x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.initializers.zeros,
                (self.ensemble_size, self.features),
            )
            y = y + bias.reshape(
                (self.ensemble_size,) + (1,) * (y.ndim - 2) + (self.features,)
            )
        return y


def _stacked_init(init, key, shape, dtype=jnp.float32):
    """Apply `init` independently per ensemble member (leading axis), so each
    member matches what a reference `nn.vmap`'d Dense would produce."""
    import jax

    keys = jax.random.split(key, shape[0])
    return jnp.stack([init(k, shape[1:], dtype) for k in keys])


class EnsembleMLP(nn.Module):
    """MLP with a leading ensemble axis on every kernel.

    Equivalent to the reference's `ensemblize(MLP, E)` (`nn.vmap` with
    per-member params, shared inputs) but expressed directly as batched
    einsums. Returns (E, ..., hidden[-1]) features.
    """

    ensemble_size: int
    hidden_dims: Sequence[int]
    activations: Union[str, Callable] = nn.swish
    activate_final: bool = False
    use_layer_norm: bool = False
    dropout_rate: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = resolve_activation(self.activations)
        member_inputs = False
        for i, size in enumerate(self.hidden_dims):
            x = EnsembleDense(self.ensemble_size, size)(x, member_inputs=member_inputs)
            member_inputs = True
            if i + 1 < len(self.hidden_dims) or self.activate_final:
                if self.dropout_rate is not None and self.dropout_rate > 0:
                    x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
                if self.use_layer_norm:
                    x = nn.LayerNorm()(x)
                x = act(x)
        return x


class MLPResNetBlock(nn.Module):
    """Pre-norm residual MLP block (reference `mlp.py:35-55`)."""

    features: int
    act: Callable = nn.swish
    dropout_rate: Optional[float] = None
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        if self.dropout_rate is not None and self.dropout_rate > 0:
            x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=not train)
        if self.use_layer_norm:
            x = nn.LayerNorm()(x)
        x = nn.Dense(self.features * 4)(x)
        x = self.act(x)
        x = nn.Dense(self.features)(x)
        if residual.shape != x.shape:
            residual = nn.Dense(self.features)(residual)
        return residual + x


class MLPResNet(nn.Module):
    """Residual MLP (reference `mlp.py:58-79`)."""

    num_blocks: int
    out_dim: int
    dropout_rate: Optional[float] = None
    use_layer_norm: bool = False
    hidden_dim: int = 256
    activations: Callable = nn.swish

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, kernel_init=default_init())(x)
        for _ in range(self.num_blocks):
            x = MLPResNetBlock(
                self.hidden_dim,
                act=self.activations,
                use_layer_norm=self.use_layer_norm,
                dropout_rate=self.dropout_rate,
            )(x, train=train)
        x = self.activations(x)
        return nn.Dense(self.out_dim, kernel_init=default_init())(x)
