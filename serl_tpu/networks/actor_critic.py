"""Policy and critic networks.

Capability parity: reference `serl_launcher/networks/actor_critic_nets.py`
(Policy :167-227, Critic :49-73, ValueCritic :15-30, DistributionalCritic
:76-106, ensemblize :156-164, multiple_action_q_function :33-46).

Design differences from the reference (TPU-first):
  * the critic ensemble is an `EnsembleMLP` with a leading ensemble axis on the
    kernels (one batched MXU matmul) instead of `nn.vmap` over module params;
  * encoders are *not* baked into these modules — the agent owns the encoder
    and passes flat features in, which makes parameter-group partitioning and
    stop-gradient policy explicit (see serl_tpu/agents/sac.py).
"""

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from serl_tpu.common.distributions import Normal, TanhNormal
from serl_tpu.networks.mlp import MLP, EnsembleDense, EnsembleMLP, default_init


class PolicyNet(nn.Module):
    """Gaussian policy head: MLP trunk -> mean (+ std parameterization).

    std_parameterization: "exp" | "softplus" | "uniform" (state-independent
    learned log-std) | "fixed" — matching reference Policy :190-214.
    """

    action_dim: int
    hidden_dims: Sequence[int] = (256, 256)
    activations: Union[str, Callable] = nn.swish
    use_layer_norm: bool = False
    dropout_rate: Optional[float] = None
    std_parameterization: str = "exp"
    std_min: float = 1e-5
    std_max: float = 10.0
    tanh_squash: bool = True
    fixed_std: Optional[Sequence[float]] = None
    init_final: Optional[float] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray, temperature: float = 1.0, train: bool = False):
        x = MLP(
            hidden_dims=self.hidden_dims,
            activations=self.activations,
            activate_final=True,
            use_layer_norm=self.use_layer_norm,
            dropout_rate=self.dropout_rate,
        )(features, train=train)

        if self.init_final is not None:
            mean_init = nn.initializers.uniform(-self.init_final, self.init_final)
        else:
            mean_init = default_init()
        means = nn.Dense(self.action_dim, kernel_init=mean_init)(x)

        if self.fixed_std is not None:
            assert self.std_parameterization == "fixed"
            stds = jnp.asarray(self.fixed_std, dtype=means.dtype)
        elif self.std_parameterization == "exp":
            log_stds = nn.Dense(self.action_dim, kernel_init=default_init())(x)
            stds = jnp.exp(log_stds)
        elif self.std_parameterization == "softplus":
            stds = nn.softplus(nn.Dense(self.action_dim, kernel_init=default_init())(x))
        elif self.std_parameterization == "uniform":
            log_stds = self.param("log_stds", nn.initializers.zeros, (self.action_dim,))
            stds = jnp.exp(log_stds)
        else:
            raise ValueError(self.std_parameterization)

        # Optimal MaxEnt std scales with sqrt(temperature) (reference :212-214).
        stds = jnp.clip(stds, self.std_min, self.std_max) * jnp.sqrt(temperature)
        stds = jnp.broadcast_to(stds, means.shape)

        if self.tanh_squash:
            return TanhNormal(loc=means, scale=stds)
        return Normal(loc=means, scale=stds)


class CriticNet(nn.Module):
    """Ensemble Q-network: concat(features, actions) -> EnsembleMLP -> (E, B).

    Also supports (B, A, action_dim) action batches, vmapping Q over the A axis
    and returning (E, B, A) — reference `multiple_action_q_function` :33-46.
    """

    ensemble_size: int
    hidden_dims: Sequence[int] = (256, 256)
    activations: Union[str, Callable] = nn.swish
    use_layer_norm: bool = False
    dropout_rate: Optional[float] = None
    init_final: Optional[float] = None

    @nn.compact
    def __call__(
        self, features: jnp.ndarray, actions: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        if actions.ndim == features.ndim + 1:
            # (B, A, action_dim): fold A into the batch, unfold at the end.
            num_a = actions.shape[-2]
            feat = jnp.repeat(features[..., None, :], num_a, axis=-2)
            feat = feat.reshape((-1, features.shape[-1]))
            act = actions.reshape((-1, actions.shape[-1]))
            q = self._q(feat, act, train)
            return q.reshape((self.ensemble_size, -1, num_a))
        return self._q(features, actions, train)

    def _q(self, features, actions, train):
        x = jnp.concatenate([features, actions], axis=-1)
        x = EnsembleMLP(
            ensemble_size=self.ensemble_size,
            hidden_dims=self.hidden_dims,
            activations=self.activations,
            activate_final=True,
            use_layer_norm=self.use_layer_norm,
            dropout_rate=self.dropout_rate,
        )(x, train=train)
        if self.init_final is not None:
            final_init = nn.initializers.uniform(-self.init_final, self.init_final)
        else:
            final_init = None  # EnsembleDense defaults to per-member xavier
        q = EnsembleDense(self.ensemble_size, 1, kernel_init=final_init)(
            x, member_inputs=True
        )
        return jnp.squeeze(q, -1)


class ValueCritic(nn.Module):
    """State-value network V(s) (reference :15-30)."""

    hidden_dims: Sequence[int] = (256, 256)
    activations: Union[str, Callable] = nn.swish
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = MLP(
            hidden_dims=self.hidden_dims,
            activations=self.activations,
            activate_final=True,
            use_layer_norm=self.use_layer_norm,
        )(features, train=train)
        v = nn.Dense(1, kernel_init=default_init())(x)
        return jnp.squeeze(v, -1)


class DistributionalCriticNet(nn.Module):
    """C51-style categorical critic returning (logits, atoms)
    (reference :76-106)."""

    ensemble_size: int
    q_low: float
    q_high: float
    num_atoms: int = 51
    hidden_dims: Sequence[int] = (256, 256)
    activations: Union[str, Callable] = nn.swish
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, actions: jnp.ndarray, train: bool = False):
        x = jnp.concatenate([features, actions], axis=-1)
        x = EnsembleMLP(
            ensemble_size=self.ensemble_size,
            hidden_dims=self.hidden_dims,
            activations=self.activations,
            activate_final=True,
            use_layer_norm=self.use_layer_norm,
        )(x, train=train)
        logits = EnsembleDense(self.ensemble_size, self.num_atoms)(x, member_inputs=True)
        atoms = jnp.linspace(self.q_low, self.q_high, self.num_atoms)
        atoms = jnp.broadcast_to(atoms, logits.shape)
        return logits, atoms


class ContrastiveCritic(nn.Module):
    """CRL-style contrastive critic (reference :109-153): separate state-
    action and goal towers, outer-product logits, optional twin Q."""

    sa_hidden_dims: Sequence[int] = (256, 256)
    g_hidden_dims: Sequence[int] = (256, 256)
    repr_dim: int = 16
    twin_q: bool = True
    activations: Union[str, Callable] = nn.swish

    @nn.compact
    def __call__(self, features: jnp.ndarray, actions: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        enc_dim = features.shape[-1] // 2
        obs_enc, goal_enc = features[..., :enc_dim], features[..., enc_dim:]
        sa_in = jnp.concatenate([obs_enc, actions], axis=-1)

        def tower(x, dims, name):
            h = MLP(hidden_dims=dims, activations=self.activations,
                    activate_final=True, name=f"{name}_mlp")(x, train=train)
            return nn.Dense(self.repr_dim, kernel_init=default_init(),
                            name=f"{name}_proj")(h)

        sa = tower(sa_in, self.sa_hidden_dims, "sa")
        g = tower(goal_enc, self.g_hidden_dims, "g")
        outer = jnp.einsum("ik,jk->ij", sa, g)
        if self.twin_q:
            sa2 = tower(sa_in, self.sa_hidden_dims, "sa2")
            g2 = tower(goal_enc, self.g_hidden_dims, "g2")
            outer = jnp.stack([outer, jnp.einsum("ik,jk->ij", sa2, g2)], axis=-1)
        return outer


def subsample_ensemble(
    key: jax.Array, qs: jnp.ndarray, subsample_size: Optional[int], ensemble_size: int
) -> jnp.ndarray:
    """REDQ ensemble subsampling (reference sac.py:150-158): random-with-
    replacement member indices."""
    if subsample_size is None:
        return qs
    idx = jax.random.randint(key, (subsample_size,), 0, ensemble_size)
    return qs[idx]
