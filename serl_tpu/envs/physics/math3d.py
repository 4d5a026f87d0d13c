"""Quaternion / rotation / spatial-algebra helpers (batched, jit-safe).

Conventions: quaternions are (w, x, y, z) like MuJoCo. Spatial (6D) vectors
are [angular; linear] expressed at the world origin (Plücker coordinates),
which lets the whole-arm dynamics run in one common frame with no per-link
coordinate transforms — convenient for XLA since everything is dense 3x3/6x6
math with static shapes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def quat_to_mat_np(q) -> np.ndarray:
    """Host-side (numpy) quat->rotation for module-level constants: keeps
    imports free of device ops (a remote-TPU round-trip per op) and safe to
    trigger inside a trace (lazy imports under jit would otherwise leak
    tracers into module globals)."""
    w, x, y, z = np.asarray(q, np.float32)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return np.asarray(
        [
            [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
        ],
        np.float32,
    )


def f32_precision(fn):
    """Run a function's matmuls at full fp32 precision.

    TPU matmuls default to bf16 inputs — great for NN layers, fatal for
    chained rotation/inertia algebra (millimeter-level FK error). Physics
    entry points are wrapped so their (tiny) matmuls use the fp32 path.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


def quat_mul(a, b):
    w1, x1, y1, z1 = jnp.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_mat(q):
    """(…,4) -> (…,3,3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """(…,3,3) -> (…,4); branchless Shepperd via the 4-candidate trick."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) / 2.0  # |w|, |x|, |y|, |z|
    w, x, y, z = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    x = jnp.copysign(x, m21 - m12)
    y = jnp.copysign(y, m02 - m20)
    z = jnp.copysign(z, m10 - m01)
    return quat_normalize(jnp.stack([w, x, y, z], -1))


def quat_rotate(q, v):
    """Rotate vectors v (…,3) by quaternions q (…,4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis, angle):
    half = angle * 0.5
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_to_axis_angle(q):
    """Log map: (…,4) -> (…,3) axis*angle, with the small-angle limit."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # shortest arc
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half < 1e-8, 2.0, angle / jnp.maximum(sin_half, 1e-12))
    return v * scale[..., None]


def quat_integrate(q, omega, dt):
    """Integrate world-frame angular velocity: q' = exp(dt/2 * omega) * q."""
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    axis = omega / jnp.maximum(angle, 1e-12)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_normalize(quat_mul(dq, q))


def skew(v):
    """(…,3) -> (…,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------- spatial (6D) algebra at the world origin ---------------- #


def crm(v):
    """Motion cross-product matrix of spatial velocity v=[w; vo]: (…,6,6)."""
    w, vo = v[..., :3], v[..., 3:]
    Sw, Sv = skew(w), skew(vo)
    zero = jnp.zeros_like(Sw)
    top = jnp.concatenate([Sw, zero], axis=-1)
    bot = jnp.concatenate([Sv, Sw], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v):
    """Force cross-product: crf(v) = -crm(v)^T."""
    return -jnp.swapaxes(crm(v), -1, -2)


def spatial_inertia(mass, com, inertia_com):
    """Spatial inertia about the world origin, [w; vo] convention.

    mass: (…,), com: (…,3) world, inertia_com: (…,3,3) world-frame about com.
    I_O = [[I_c + m S S^T, m S], [m S^T, m E]] with S = skew(com).
    """
    S = skew(com)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3), S.shape)
    top = jnp.concatenate(
        [inertia_com + m * (S @ jnp.swapaxes(S, -1, -2)), m * S], axis=-1
    )
    bot = jnp.concatenate([m * jnp.swapaxes(S, -1, -2), m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
