"""Golden tests for the action distributions against closed-form math."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serl_tpu.common.distributions import Normal, TanhNormal


def test_normal_log_prob_matches_scipy():
    from scipy.stats import norm

    loc = jnp.array([[0.5, -1.0, 2.0]])
    scale = jnp.array([[1.0, 0.3, 2.5]])
    x = jnp.array([[0.1, -0.5, 1.0]])
    dist = Normal(loc, scale)
    expected = norm.logpdf(np.asarray(x), np.asarray(loc), np.asarray(scale)).sum(-1)
    np.testing.assert_allclose(dist.log_prob(x), expected, rtol=1e-4)


def test_tanh_normal_log_prob_change_of_variables():
    """log p(y) must equal log p_base(x) - sum log|tanh'(x)| at y = tanh(x)."""
    loc = jnp.array([0.3, -0.2])
    scale = jnp.array([0.5, 1.2])
    dist = TanhNormal(loc=loc, scale=scale)
    x = jnp.array([0.7, -1.1])  # pre-tanh value
    y = jnp.tanh(x)

    base = Normal(loc, scale).log_prob(x)
    jac = np.sum(np.log(1.0 - np.tanh(np.asarray(x)) ** 2))
    np.testing.assert_allclose(dist.log_prob(y), base - jac, rtol=1e-4)


def test_tanh_normal_sample_and_log_prob_consistent():
    dist = TanhNormal(loc=jnp.zeros((4, 3)), scale=jnp.full((4, 3), 0.7))
    y, lp = dist.sample_and_log_prob(seed=jax.random.PRNGKey(0))
    assert y.shape == (4, 3)
    assert lp.shape == (4,)
    assert jnp.all(jnp.abs(y) < 1.0)
    np.testing.assert_allclose(lp, dist.log_prob(y), rtol=1e-3, atol=1e-4)


def test_tanh_normal_mode_and_bounds():
    low = jnp.array([-2.0, 0.0])
    high = jnp.array([2.0, 4.0])
    dist = TanhNormal(
        loc=jnp.array([0.0, 100.0]), scale=jnp.array([1.0, 1.0]), low=low, high=high
    )
    mode = dist.mode()
    np.testing.assert_allclose(mode[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(mode[1], 4.0, atol=1e-3)
    samples = dist.sample(seed=jax.random.PRNGKey(1))
    assert jnp.all(samples >= low) and jnp.all(samples <= high)


def test_tanh_normal_integrates_to_one():
    """Numerically integrate the 1-D density over (-1, 1)."""
    dist = TanhNormal(loc=jnp.array([0.4]), scale=jnp.array([0.8]))
    ys = jnp.linspace(-0.999, 0.999, 20001).reshape(-1, 1)
    dens = jnp.exp(dist.log_prob(ys))
    integral = jnp.trapezoid(dens, ys[:, 0])
    assert abs(float(integral) - 1.0) < 1e-3


def test_normal_entropy():
    scale = jnp.array([0.5, 2.0])
    dist = Normal(jnp.zeros(2), scale)
    expected = sum(0.5 * math.log(2 * math.pi * math.e * s**2) for s in [0.5, 2.0])
    np.testing.assert_allclose(dist.entropy(), expected, rtol=1e-5)
