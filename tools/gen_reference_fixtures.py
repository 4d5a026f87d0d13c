"""Generate numerical fixtures from the REFERENCE implementation (VERDICT r3
weak #4 / next-step #6): run `/root/reference/serl_launcher`'s actual
`SACAgent` (sac.py:134-234 losses and the modules under them) on a fixed
seed/batch and pin every deterministic quantity, so our tests compare against
the reference's numbers instead of recomputing with our own code (which only
catches wiring bugs, not semantic drift).

The reference imports `distrax`, which is not in this image. A minimal stub
(textbook MVN-diag + tanh-bijector math only) is installed in sys.modules so
the reference's OWN Python — std parameterization, clipping, temperature
scaling, ensemble wiring, Lagrange penalty — runs verbatim. The stub math
(gaussian logpdf, tanh log-det 2(log2 - x - softplus(-2x))) is the standard
formulation distrax itself implements.

Pinned quantities (all deterministic — no MC sampling; sampling = mode+std*eps
is covered by pinning mean/std and log_prob):
  * policy distribution mean/std at a fixed obs batch (std parameterization)
  * tanh-squashed log_prob of fixed actions
  * policy mode
  * critic Q(obs, actions) per ensemble member
  * temperature value + Lagrange penalty at a fixed entropy lhs
  * TD target with GIVEN next actions (full-ensemble min) + critic MSE loss

Run (CPU): JAX_PLATFORMS=cpu python tools/gen_reference_fixtures.py
Writes tests/fixtures/sac_reference_fixture.pkl (reference params + batch +
pinned outputs) consumed by tests/test_reference_fixtures.py.
"""

import pickle
import sys
import types
from pathlib import Path

import jax

# force CPU (the axon TPU plugin ignores JAX_PLATFORMS): the fixture must be
# generated with CPU float32 matmuls — the consuming tests run on the CPU
# backend (tests/conftest.py), and TPU default-precision matmuls (bf16
# passes) differ at ~1e-2
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent


# --------------------------------------------------------------------------- #
# distrax stub: exactly the surface actor_critic_nets.py + sac.py use
# --------------------------------------------------------------------------- #
def _install_distrax_stub():
    m = types.ModuleType("distrax")

    class Distribution:
        pass

    class MultivariateNormalDiag(Distribution):
        def __init__(self, loc, scale_diag):
            self.loc = loc
            self.scale_diag = scale_diag

        def log_prob(self, x):
            z = (x - self.loc) / self.scale_diag
            return jnp.sum(
                -0.5 * z**2 - jnp.log(self.scale_diag) - 0.5 * jnp.log(2 * jnp.pi),
                axis=-1,
            )

        def mode(self):
            return self.loc

        def stddev(self):
            return self.scale_diag

        def sample(self, *, seed, sample_shape=()):
            shape = tuple(sample_shape) + self.loc.shape
            eps = jax.random.normal(seed, shape)
            return self.loc + self.scale_diag * eps

        def sample_and_log_prob(self, *, seed, sample_shape=()):
            x = self.sample(seed=seed, sample_shape=sample_shape)
            return x, self.log_prob(x)

        def entropy(self):
            return jnp.sum(
                0.5 * jnp.log(2 * jnp.pi * jnp.e) + jnp.log(self.scale_diag),
                axis=-1,
            )

    class Tanh:
        def forward(self, x):
            return jnp.tanh(x)

        def inverse(self, y):
            return jnp.arctanh(y)

        def forward_log_det_jacobian(self, x):
            # log|d tanh/dx| = log(1 - tanh(x)^2), numerically stable form
            return 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))

    class Block:
        def __init__(self, bijector, ndims):
            self.bijector = bijector
            self.ndims = ndims

        def forward(self, x):
            return self.bijector.forward(x)

        def inverse(self, y):
            return self.bijector.inverse(y)

        def forward_log_det_jacobian(self, x):
            ldj = self.bijector.forward_log_det_jacobian(x)
            for _ in range(self.ndims):
                ldj = jnp.sum(ldj, axis=-1)
            return ldj

    class Lambda:
        def __init__(self, forward, forward_log_det_jacobian=None,
                     event_ndims_in=0, event_ndims_out=0):
            self._forward = forward
            self._fldj = forward_log_det_jacobian

        def forward(self, x):
            return self._forward(x)

        def forward_log_det_jacobian(self, x):
            return self._fldj(x)

    class Chain:
        """distrax semantics: bijectors[-1] is applied FIRST."""

        def __init__(self, bijectors):
            self.bijectors = list(bijectors)

        def forward(self, x):
            for b in reversed(self.bijectors):
                x = b.forward(x)
            return x

        def inverse(self, y):
            for b in self.bijectors:
                y = b.inverse(y)
            return y

        def forward_log_det_jacobian(self, x):
            total = None
            for b in reversed(self.bijectors):
                ldj = b.forward_log_det_jacobian(x)
                total = ldj if total is None else total + ldj
                x = b.forward(x)
            return total

    class Transformed(Distribution):
        def __init__(self, distribution, bijector):
            self.distribution = distribution
            self.bijector = bijector

        def sample(self, *, seed, sample_shape=()):
            x = self.distribution.sample(seed=seed, sample_shape=sample_shape)
            return self.bijector.forward(x)

        def sample_and_log_prob(self, *, seed, sample_shape=()):
            x, lp = self.distribution.sample_and_log_prob(
                seed=seed, sample_shape=sample_shape
            )
            return (
                self.bijector.forward(x),
                lp - self.bijector.forward_log_det_jacobian(x),
            )

        def log_prob(self, y):
            x = self.bijector.inverse(y)
            return self.distribution.log_prob(
                x
            ) - self.bijector.forward_log_det_jacobian(x)

    m.Distribution = Distribution
    m.MultivariateNormalDiag = MultivariateNormalDiag
    m.Tanh = Tanh
    m.Block = Block
    m.Lambda = Lambda
    m.Chain = Chain
    m.Transformed = Transformed
    sys.modules["distrax"] = m


def main():
    _install_distrax_stub()
    # inert stubs for modules the reference imports at module scope but the
    # loss path never calls (wandb logging, tf/rlds plumbing)
    for name in ("wandb", "tensorflow", "absl", "absl.flags", "ml_collections"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    # the reference targets an older jax; restore the moved aliases it calls
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    if not hasattr(jax, "tree_leaves"):
        jax.tree_leaves = jax.tree.leaves
    sys.path.insert(0, "/root/reference/serl_launcher")
    import flax.linen as nn
    from serl_launcher.agents.continuous.sac import SACAgent

    OBS_DIM, ACT_DIM, B = 13, 7, 32
    rng = np.random.default_rng(1234)
    batch = {
        "observations": rng.normal(size=(B, OBS_DIM)).astype(np.float32),
        "actions": np.clip(
            rng.normal(size=(B, ACT_DIM)).astype(np.float32), -0.97, 0.97
        ),
        "next_observations": rng.normal(size=(B, OBS_DIM)).astype(np.float32),
        # deterministic stand-in for sampled next actions (see docstring)
        "given_next_actions": np.clip(
            rng.normal(size=(B, ACT_DIM)).astype(np.float32), -0.97, 0.97
        ),
        "rewards": rng.normal(size=(B,)).astype(np.float32),
        "masks": (rng.random(size=(B,)) > 0.3).astype(np.float32),
    }

    # reference launcher's canonical hyperparameters (utils/launcher.py:50-76)
    agent = SACAgent.create_states(
        jax.random.PRNGKey(0),
        jnp.zeros((1, OBS_DIM)),
        jnp.zeros((1, ACT_DIM)),
        policy_kwargs={
            "tanh_squash_distribution": True,
            "std_parameterization": "exp",
            "std_min": 1e-5,
            "std_max": 5,
        },
        critic_network_kwargs={
            "activations": nn.tanh,
            "use_layer_norm": True,
            "hidden_dims": [256, 256],
        },
        policy_network_kwargs={
            "activations": nn.tanh,
            "use_layer_norm": True,
            "hidden_dims": [256, 256],
        },
        temperature_init=1e-2,
        discount=0.99,
        backup_entropy=False,
        critic_ensemble_size=10,
        critic_subsample_size=2,
    )

    obs = jnp.asarray(batch["observations"])
    acts = jnp.asarray(batch["actions"])
    next_obs = jnp.asarray(batch["next_observations"])
    next_acts = jnp.asarray(batch["given_next_actions"])

    dist = agent.forward_policy(obs, rng=None, train=False)
    means = dist.distribution.loc
    stds = dist.distribution.scale_diag
    log_probs = dist.log_prob(acts)
    mode = dist.mode()

    dummy = jax.random.PRNGKey(0)  # train=False: rng unused (no dropout)
    qs = agent.forward_critic(obs, acts, rng=dummy, train=False)
    target_next_qs = agent.forward_target_critic(next_obs, next_acts, rng=dummy)
    target_q = (
        batch["rewards"]
        + agent.config["discount"] * batch["masks"] * target_next_qs.min(axis=0)
    )
    critic_mse = jnp.mean(
        (qs - jnp.broadcast_to(target_q[None], qs.shape)) ** 2
    )

    temperature = agent.forward_temperature()
    entropy_lhs = jnp.asarray(1.234, jnp.float32)
    lagrange_penalty = agent.temperature_lagrange_penalty(entropy_lhs)

    fixture = {
        "batch": batch,
        "params": jax.device_get(agent.state.params),
        "config": {
            "discount": float(agent.config["discount"]),
            "target_entropy": float(agent.config["target_entropy"]),
        },
        "policy_means": np.asarray(means),
        "policy_stds": np.asarray(stds),
        "policy_log_probs": np.asarray(log_probs),
        "policy_mode": np.asarray(mode),
        "qs": np.asarray(qs),
        "target_next_qs": np.asarray(target_next_qs),
        "target_q": np.asarray(target_q),
        "critic_mse": float(critic_mse),
        "temperature": float(temperature),
        "entropy_lhs": float(entropy_lhs),
        "lagrange_penalty": float(lagrange_penalty),
    }
    out = REPO / "tests" / "fixtures"
    out.mkdir(exist_ok=True)
    with open(out / "sac_reference_fixture.pkl", "wb") as f:
        pickle.dump(fixture, f)
    print("param tree top-level:", sorted(fixture["params"].keys()))
    for k in sorted(fixture["params"].keys()):
        sub = fixture["params"][k]
        print(f"  {k}:", jax.tree.map(lambda x: x.shape, sub))
    print(f"saved {out/'sac_reference_fixture.pkl'}")
    print(f"critic_mse={fixture['critic_mse']:.6f} temp={fixture['temperature']:.6f}")


if __name__ == "__main__":
    main()
