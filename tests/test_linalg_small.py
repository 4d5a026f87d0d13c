"""Unrolled small-matrix linalg vs jnp.linalg (the physics hot-loop kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serl_tpu.envs.physics.linalg_small import (
    det_spd,
    inv_spd,
    solve3,
    solve_spd,
    solve_spd_mat,
)


def _spd(key, batch, n):
    a = jax.random.normal(key, (batch, n, n))
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n)


@pytest.mark.parametrize("n", [3, 6, 7])
def test_solve_spd_matches_linalg(n):
    key = jax.random.PRNGKey(0)
    m = _spd(key, 16, n)
    b = jax.random.normal(jax.random.fold_in(key, 1), (16, n))
    got = solve_spd(m, b)
    want = jnp.linalg.solve(m, b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_solve_spd_mat_and_inv():
    key = jax.random.PRNGKey(2)
    m = _spd(key, 8, 7)
    rhs = jax.random.normal(jax.random.fold_in(key, 3), (8, 7, 6))
    got = solve_spd_mat(m, rhs)
    want = jnp.linalg.solve(m, rhs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    inv = inv_spd(m)
    np.testing.assert_allclose(
        inv @ m, jnp.broadcast_to(jnp.eye(7), (8, 7, 7)), atol=1e-4
    )


def test_det_spd_matches_linalg_and_saturates():
    key = jax.random.PRNGKey(4)
    m = _spd(key, 8, 6)
    np.testing.assert_allclose(
        det_spd(m), jnp.linalg.det(m), rtol=1e-3
    )
    # singular PSD input: no NaNs, det ~ 0 (the damping-threshold test relies
    # on this saturating instead of going negative)
    v = jax.random.normal(key, (8, 6, 2))
    sing = v @ jnp.swapaxes(v, -1, -2)  # rank 2
    d = det_spd(sing)
    assert jnp.all(jnp.isfinite(d))
    assert jnp.all(jnp.abs(d) < 1e-6)


def test_solve3_general_matrix():
    key = jax.random.PRNGKey(5)
    a = jax.random.normal(key, (32, 3, 3)) + 2 * jnp.eye(3)
    b = jax.random.normal(jax.random.fold_in(key, 1), (32, 3))
    got = solve3(a, b)
    want = jnp.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_vmap_transparent():
    key = jax.random.PRNGKey(6)
    m = _spd(key, 4, 7)
    b = jax.random.normal(jax.random.fold_in(key, 1), (4, 7))
    got = jax.vmap(solve_spd)(m, b)
    np.testing.assert_allclose(got, solve_spd(m, b), rtol=1e-5)
