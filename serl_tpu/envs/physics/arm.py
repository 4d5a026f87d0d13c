"""Batched Panda arm kinematics and dynamics (single-env functions; vmap over
envs at the engine level).

Replaces the roles MuJoCo's C core plays in the reference sim
(`mj_forward`/`mj_jacSite`/`mj_fullM`/`mj_step` in
franka_sim/envs/panda_pick_gym_env.py:205-217 and controllers/opspace.py):

  * forward kinematics of the 7-R chain (quaternion chain, unrolled),
  * site Jacobians (analytic, revolute axes),
  * mass matrix via the Composite Rigid Body Algorithm,
  * bias forces (Coriolis + gravity) via the Recursive Newton-Euler Algorithm,

all in *world-origin spatial coordinates* so the per-link math is shared-frame
dense 3x3/6x6 ops that XLA fuses well. Loops over the 7 links are unrolled
Python loops (static shapes, no scan overhead at this size).

Validated against MuJoCo's mj_fullM / mj_jacSite / qfrc_bias in
tests/test_physics_arm.py.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from serl_tpu.envs.physics import panda_model as pm
from serl_tpu.envs.physics.math3d import (
    crf,
    crm,
    f32_precision,
    quat_to_mat_np,
    spatial_inertia,
)

NL = pm.NUM_LINKS  # 7

# static model constants as jnp arrays (float32)
_BODY_POS = np.asarray(pm.BODY_POS, np.float32)
_BODY_RMAT = np.stack([quat_to_mat_np(q) for q in pm.BODY_QUAT])
_BODY_MASS = np.asarray(pm.BODY_MASS, np.float32)
_BODY_IPOS = np.asarray(pm.BODY_IPOS, np.float32)
_BODY_INERTIA = np.asarray(pm.BODY_INERTIA, np.float32)
_ARMATURE = np.asarray(pm.JOINT_ARMATURE, np.float32)
_PINCH_POS_L7 = np.asarray(pm.PINCH_POS_L7, np.float32)
_PINCH_RMAT_L7 = quat_to_mat_np(pm.PINCH_QUAT_L7)
_GRAVITY = np.asarray(pm.GRAVITY, np.float32)


class ArmKin(NamedTuple):
    """World-frame kinematics of the chain."""

    p: jnp.ndarray  # (8, 3) link frame origins (link0..link7)
    R: jnp.ndarray  # (8, 3, 3) link orientations
    axes: jnp.ndarray  # (7, 3) world joint axes (local +z of links 1..7)
    pinch_pos: jnp.ndarray  # (3,)
    pinch_rmat: jnp.ndarray  # (3, 3)


@f32_precision
def fk(qpos: jnp.ndarray) -> ArmKin:
    """Forward kinematics for one env. qpos: (7,)."""
    ps = [_BODY_POS[0]]
    Rs = [_BODY_RMAT[0]]
    axes = []
    for i in range(1, NL + 1):
        p_par, R_par = ps[-1], Rs[-1]
        p = p_par + R_par @ _BODY_POS[i]
        R_fixed = R_par @ _BODY_RMAT[i]
        c, s = jnp.cos(qpos[i - 1]), jnp.sin(qpos[i - 1])
        Rz = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rz = jnp.stack(
            [
                jnp.stack([c, -s, jnp.zeros_like(c)]),
                jnp.stack([s, c, jnp.zeros_like(c)]),
                jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c), jnp.ones_like(c)]),
            ]
        )
        R = R_fixed @ Rz
        ps.append(p)
        Rs.append(R)
        axes.append(R[:, 2])
    p = jnp.stack(ps)
    R = jnp.stack(Rs)
    pinch_pos = p[NL] + R[NL] @ _PINCH_POS_L7
    pinch_rmat = R[NL] @ _PINCH_RMAT_L7
    return ArmKin(p=p, R=R, axes=jnp.stack(axes), pinch_pos=pinch_pos,
                  pinch_rmat=pinch_rmat)


def point_jacobian(kin: ArmKin, point: jnp.ndarray) -> jnp.ndarray:
    """6x7 spatial Jacobian [J_w; J_v] of a world point rigidly attached to
    link7: column i = [a_i; a_i x (point - o_i)]."""
    o = kin.p[1:]  # (7,3) joint origins
    a = kin.axes  # (7,3)
    jv = jnp.cross(a, point[None, :] - o)  # (7,3)
    return jnp.concatenate([a.T, jv.T], axis=0)  # (6,7)


def _link_spatial_inertias(kin: ArmKin) -> jnp.ndarray:
    """(7, 6, 6) spatial inertia of moving links 1..7 about the world origin."""
    R = kin.R[1:]  # (7,3,3)
    coms = kin.p[1:] + jnp.einsum("lij,lj->li", R, _BODY_IPOS[1:])
    I_world = R @ _BODY_INERTIA[1:] @ jnp.swapaxes(R, -1, -2)
    return spatial_inertia(_BODY_MASS[1:], coms, I_world)


def _motion_subspaces(kin: ArmKin) -> jnp.ndarray:
    """(7, 6) Plücker motion subspace per joint: [a; o x a]."""
    o = kin.p[1:]
    a = kin.axes
    return jnp.concatenate([a, jnp.cross(o, a)], axis=-1)


@f32_precision
def mass_matrix(kin: ArmKin) -> jnp.ndarray:
    """7x7 joint-space inertia via CRBA in world coordinates (+ armature).

    Matches MuJoCo's mj_fullM arm block (armature included in the diagonal).
    """
    I_links = _link_spatial_inertias(kin)  # (7,6,6)
    S = _motion_subspaces(kin)  # (7,6)
    # composite inertia of subtree rooted at link i: sum_{j>=i} I_j
    # (serial chain: subtree of i is links i..7)
    I_comp = jnp.cumsum(I_links[::-1], axis=0)[::-1]  # (7,6,6)
    # F_i = I_comp_i @ S_i ; M[i, j] = S_min(i,j) . F_max(i,j)
    F = jnp.einsum("lij,lj->li", I_comp, S)  # (7,6)
    M_full = S @ F.T  # (7,7): S_i . F_j  — valid where j >= i
    upper = jnp.triu(M_full)
    M = upper + jnp.triu(M_full, 1).T
    return M + jnp.diag(_ARMATURE)


@f32_precision
def bias_forces(kin: ArmKin, qvel: jnp.ndarray) -> jnp.ndarray:
    """C(q, qd) qd + g(q) via RNEA (qacc = 0) in world spatial coordinates.

    Matches MuJoCo qfrc_bias for the arm DOFs (finger joints at rest).
    """
    I_links = _link_spatial_inertias(kin)
    S = _motion_subspaces(kin)

    # gravity as fictitious base acceleration: a0 = [0; -g]
    a0 = jnp.concatenate([jnp.zeros(3), -_GRAVITY])
    v = jnp.zeros(6)
    vs, accs = [], []
    a = a0
    for i in range(NL):
        vJ = S[i] * qvel[i]
        v = v + vJ
        a = a + crm(v) @ vJ  # Φ̇ qd term (qacc = 0)
        vs.append(v)
        accs.append(a)
    # link forces: f_i = I_i a_i + crf(v_i) I_i v_i
    f = [
        I_links[i] @ accs[i] + crf(vs[i]) @ (I_links[i] @ vs[i])
        for i in range(NL)
    ]
    # backward: subtree sums, project on S
    tau = []
    fC = jnp.zeros(6)
    for i in reversed(range(NL)):
        fC = fC + f[i]
        tau.append(S[i] @ fC)
    return jnp.stack(tau[::-1])


def pinch_velocity(kin: ArmKin, qvel: jnp.ndarray):
    """Linear and angular world velocity of the pinch site."""
    J = point_jacobian(kin, kin.pinch_pos)  # (6,7) [w; v]
    sv = J @ qvel
    return sv[3:], sv[:3]
