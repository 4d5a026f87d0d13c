"""Batched XLA physics engine for the Panda + gripper + cube scene.

The TPU-native replacement for MuJoCo's `mj_step` in the reference sim
(franka_sim): a pure jit-compiled `substep`/`control_step` over a
`PhysicsState` pytree, vmapped over thousands of env instances in lockstep.

Pipeline per 2 ms substep (10 substeps per 20 ms control step, matching
`panda_pick_gym_env.py:33-35`):
  1. arm FK -> mass matrix (CRBA) -> bias forces (RNEA)
  2. contact forces: cube-floor (8 corners) and pad-cube (4 pad points),
     compliant normal + regularized Coulomb friction; reaction wrenches are
     mapped onto the arm through the pinch-site Jacobian and onto the reduced
     finger DOF through the pad jacobian
  3. operational-space controller torques (opspace.py)
  4. semi-implicit Euler: arm with implicit joint damping
     ((M + dt*D) solve), cube as a free rigid body with quaternion exp-map

Contact stiffness/damping are derived from the MJCF solref time constants
(pads solref 0.004 -> k ~ m*(1/tc)^2; floor default 0.02).
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.envs.physics import gripper as gr
from serl_tpu.envs.physics import panda_model as pm
from serl_tpu.envs.physics.arm import (
    bias_forces,
    fk,
    mass_matrix,
    pinch_velocity,
    point_jacobian,
)
from serl_tpu.envs.physics.math3d import (
    f32_precision,
    quat_integrate,
    quat_to_mat,
)
from serl_tpu.envs.physics.linalg_small import solve3, solve_spd
from serl_tpu.envs.physics.opspace import opspace_torques

# ---- constants ----
DT = 0.002
N_SUBSTEPS = 10
CONTROL_DT = DT * N_SUBSTEPS

_DAMPING = np.asarray(pm.JOINT_DAMPING, np.float32)
_JNT_LO = np.asarray(pm.JOINT_RANGE, np.float32)[:, 0]
_JNT_HI = np.asarray(pm.JOINT_RANGE, np.float32)[:, 1]
_Q_HOME = np.asarray(pm.PANDA_HOME, np.float32)
_GRAVITY = np.asarray(pm.GRAVITY, np.float32)

CUBE_MASS = float(pm.BLOCK_MASS)
CUBE_HALF = np.asarray(pm.BLOCK_HALF, np.float32)
# solid box inertia: I = m/12 * (b^2 + c^2) per axis
_CUBE_I_DIAG = (
    CUBE_MASS
    / 12.0
    * jnp.asarray(
        [
            (2 * pm.BLOCK_HALF[1]) ** 2 + (2 * pm.BLOCK_HALF[2]) ** 2,
            (2 * pm.BLOCK_HALF[0]) ** 2 + (2 * pm.BLOCK_HALF[2]) ** 2,
            (2 * pm.BLOCK_HALF[0]) ** 2 + (2 * pm.BLOCK_HALF[1]) ** 2,
        ]
    )
)

# contact parameters (see module docstring). Per-point constants are chosen
# for semi-implicit-Euler stability with several simultaneous points sharing
# load: need (sum kd)*dt/m < ~2 and dt*sqrt(sum kn/m) < ~1.
KN_FLOOR = 1500.0  # x4 corners -> effective 6000 N/m, 0.17 mm static sag
KD_FLOOR = 8.0  # x4 -> 32 N s/m (c*dt/m = 0.64)
MU_FLOOR = 1.0
KN_PAD = 8000.0  # grip at full 5 Nm tendon torque (~45 N/finger) -> ~3 mm
KD_PAD = 10.0
MU_PAD = 0.7
V_EPS = 0.003  # friction regularization velocity (m/s)

# cube corners in cube frame: (8, 3)
_CORNERS = np.asarray(
    [
        [sx * pm.BLOCK_HALF[0], sy * pm.BLOCK_HALF[1], sz * pm.BLOCK_HALF[2]]
        for sx in (-1, 1)
        for sy in (-1, 1)
        for sz in (-1, 1)
    ],
    np.float32,
)


class PhysicsState(NamedTuple):
    """Single-env physics state (engine vmaps over a leading env axis)."""

    qpos: jnp.ndarray  # (7,)
    qvel: jnp.ndarray  # (7,)
    theta: jnp.ndarray  # () gripper driver angle
    dtheta: jnp.ndarray  # ()
    grip_ctrl: jnp.ndarray  # () commanded 0..255
    mocap_pos: jnp.ndarray  # (3,) controller target position
    mocap_quat: jnp.ndarray  # (4,) controller target orientation
    cube_pos: jnp.ndarray  # (3,)
    cube_quat: jnp.ndarray  # (4,)
    cube_linvel: jnp.ndarray  # (3,)
    cube_angvel: jnp.ndarray  # (3,) world frame


def init_state(cube_xy: jnp.ndarray) -> PhysicsState:
    """Home configuration with the cube at (x, y, half_height)."""
    kin = fk(_Q_HOME)
    return PhysicsState(
        qpos=_Q_HOME,
        qvel=jnp.zeros(7),
        theta=jnp.zeros(()),
        dtheta=jnp.zeros(()),
        grip_ctrl=jnp.zeros(()),
        mocap_pos=kin.pinch_pos,
        mocap_quat=jnp.asarray(pm.MOCAP_HOME_QUAT, jnp.float32),
        cube_pos=jnp.concatenate([cube_xy, CUBE_HALF[2:3]]),
        cube_quat=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
        cube_linvel=jnp.zeros(3),
        cube_angvel=jnp.zeros(3),
    )


# ------------------------------------------------------------------ #
# Contacts
# ------------------------------------------------------------------ #


def _floor_contact(state: PhysicsState):
    """Cube-floor: 8 corner penalty contacts. Returns (force, torque) on the
    cube about its COM."""
    Rc = quat_to_mat(state.cube_quat)
    corners_w = state.cube_pos[None, :] + _CORNERS @ Rc.T  # (8,3)
    r = corners_w - state.cube_pos[None, :]
    v = state.cube_linvel[None, :] + jnp.cross(state.cube_angvel[None, :], r)

    depth = -corners_w[:, 2]  # > 0 when below floor
    active = depth > 0.0
    fn_mag = jnp.where(active, KN_FLOOR * depth - KD_FLOOR * v[:, 2], 0.0)
    fn_mag = jnp.maximum(fn_mag, 0.0)
    fn = jnp.stack([jnp.zeros_like(fn_mag), jnp.zeros_like(fn_mag), fn_mag], -1)

    vt = v.at[:, 2].set(0.0)
    vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
    # Coulomb cap AND impulse cap: one step of friction must not overshoot the
    # velocity-matching impulse (explicit-integration stability)
    ft_mag = jnp.minimum(
        MU_FLOOR * fn_mag[:, None] * jnp.tanh(vt_norm / V_EPS),
        0.5 * CUBE_MASS * vt_norm / DT,
    )
    ft = -ft_mag * vt / jnp.maximum(vt_norm, 1e-9)
    f = fn + ft
    torque = jnp.cross(r, f).sum(0)
    return f.sum(0), torque


def _pad_contacts(state: PhysicsState, kin, pinch_v, pinch_w):
    """Pad-cube contacts: per-pad *plane vs box* along the closing axis.

    Contact normals are pinned to the pad's closing axis (a nearest-face model
    misclassifies normals at cube edges and ejects the cube). For each of the
    4 pad sample points (2 stacked pad boxes per finger) penetration is the
    support-slab overlap of the point along the pad's inward axis, gated by
    the point lying inside the (slightly expanded) cube — the standard
    contact-lite grasp model.

    Returns (f_cube, tau_cube) on the cube, the reaction wrench
    (f_arm, tau_arm_about_pinch) on the hand, and the generalized reaction on
    the finger DOF.
    """
    pk = gr.pad_kinematics(state.theta)
    Rp = kin.pinch_rmat
    pts_w = kin.pinch_pos[None, :] + pk.points @ Rp.T  # (4,3)
    inward_w = pk.normals @ Rp.T  # (4,3) unit, toward the grip axis
    dpt_w = pk.dpoint_dtheta @ Rp.T  # (4,3) ∂p/∂θ in world

    Rc = quat_to_mat(state.cube_quat)
    u = pts_w - state.cube_pos[None, :]  # (4,3) cube-center -> pad point
    xi = u @ Rc  # cube-frame coords
    lateral_ok = jnp.all(jnp.abs(xi) < CUBE_HALF[None, :] + 2e-3, axis=-1)

    # outward direction (cube -> pad side) and support-slab penetration
    out_w = -inward_w
    axis_c = jnp.abs(out_w @ Rc)  # (4,3) |axis| in cube frame
    support = axis_c @ CUBE_HALF  # (4,) cube extent along the axis
    d_axis = jnp.sum(u * out_w, axis=-1)  # signed coord of point along axis
    depth = support - d_axis
    active = lateral_ok & (depth > 0.0) & (d_axis > 0.0)

    # velocities
    r_c = pts_w - state.cube_pos[None, :]
    v_cube_pt = state.cube_linvel[None, :] + jnp.cross(
        state.cube_angvel[None, :], r_c
    )
    r_p = pts_w - kin.pinch_pos[None, :]
    v_pad_pt = (
        pinch_v[None, :]
        + jnp.cross(pinch_w[None, :], r_p)
        + dpt_w * state.dtheta
    )
    v_rel = v_pad_pt - v_cube_pt  # pad relative to cube

    # normal force on the PAD along +out_w (pushes the pad away from the cube)
    vn = jnp.sum(v_rel * out_w, axis=-1)
    fn_mag = jnp.where(active, KN_PAD * depth - KD_PAD * vn, 0.0)
    fn_mag = jnp.maximum(fn_mag, 0.0)
    f_pad_n = fn_mag[:, None] * out_w

    # friction on the PAD opposing tangential pad-vs-cube motion, with the
    # same per-step velocity-matching impulse cap as the floor contact
    vt = v_rel - vn[:, None] * out_w
    vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
    ft_mag = jnp.minimum(
        MU_PAD * fn_mag[:, None] * jnp.tanh(vt_norm / V_EPS),
        0.5 * CUBE_MASS * vt_norm / DT,
    )
    f_pad_t = -ft_mag * vt / jnp.maximum(vt_norm, 1e-9)
    f_pad = f_pad_n + f_pad_t  # force ON the pad
    f_cube_pts = -f_pad  # reaction on the cube

    f_cube = f_cube_pts.sum(0)
    tau_cube = jnp.cross(r_c, f_cube_pts).sum(0)
    f_arm = f_pad.sum(0)
    tau_arm = jnp.cross(r_p, f_pad).sum(0)
    tau_theta = jnp.sum(f_pad * dpt_w)
    return f_cube, tau_cube, f_arm, tau_arm, tau_theta


def _obstacle_contact(state: PhysicsState, boxes: jnp.ndarray):
    """Cube vs static axis-aligned boxes (bin walls etc.): corner penalty
    contacts, same constants/caps as the floor model.

    `boxes`: (M, 2, 3) world-frame (lo, hi) corners. For each cube corner
    inside a box, the contact normal is the minimum-penetration face axis
    and the corner is pushed out through that face (the standard AABB
    shallow-penetration resolution). Returns (force, torque) on the cube.
    """
    Rc = quat_to_mat(state.cube_quat)
    corners_w = state.cube_pos[None, :] + _CORNERS @ Rc.T  # (8,3)
    r = corners_w - state.cube_pos[None, :]
    v = state.cube_linvel[None, :] + jnp.cross(state.cube_angvel[None, :], r)

    lo, hi = boxes[:, 0], boxes[:, 1]  # (M,3)
    p = corners_w[:, None, :]  # (8,1,3)
    d_lo = p - lo[None]  # (8,M,3) distance inside from each lo face
    d_hi = hi[None] - p  # (8,M,3)
    inside = jnp.all((d_lo > 0.0) & (d_hi > 0.0), axis=-1)  # (8,M)

    depth_axis = jnp.minimum(d_lo, d_hi)  # (8,M,3)
    # push toward the NEARER face: -e_ax if the lo face is closer, else +e_ax
    sign = jnp.where(d_lo < d_hi, -1.0, 1.0)  # (8,M,3)
    ax = jnp.argmin(depth_axis, axis=-1)  # (8,M)
    depth = jnp.take_along_axis(depth_axis, ax[..., None], -1)[..., 0]
    n_sign = jnp.take_along_axis(sign, ax[..., None], -1)[..., 0]
    normal = jax.nn.one_hot(ax, 3) * n_sign[..., None]  # (8,M,3)
    depth = jnp.where(inside, depth, 0.0)

    vn = jnp.sum(v[:, None, :] * normal, axis=-1)  # (8,M)
    fn_mag = jnp.maximum(KN_FLOOR * depth - KD_FLOOR * vn, 0.0) * inside
    fn = fn_mag[..., None] * normal

    vt = v[:, None, :] - vn[..., None] * normal
    vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
    ft_mag = jnp.minimum(
        MU_FLOOR * fn_mag[..., None] * jnp.tanh(vt_norm / V_EPS),
        0.5 * CUBE_MASS * vt_norm / DT,
    )
    ft = -ft_mag * vt / jnp.maximum(vt_norm, 1e-9)
    f = fn + ft  # (8,M,3)
    torque = jnp.cross(r[:, None, :], f).sum((0, 1))
    return f.sum((0, 1)), torque


# ------------------------------------------------------------------ #
# Stepping
# ------------------------------------------------------------------ #


@f32_precision
def substep(state: PhysicsState, obstacles=None) -> PhysicsState:
    kin = fk(state.qpos)
    M = mass_matrix(kin)
    bias = bias_forces(kin, state.qvel)
    pinch_v, pinch_w = pinch_velocity(kin, state.qvel)

    # contacts
    f_floor, tau_floor = _floor_contact(state)
    f_cube_p, tau_cube_p, f_arm, tau_arm, tau_theta = _pad_contacts(
        state, kin, pinch_v, pinch_w
    )
    if obstacles is not None:
        f_obs, tau_obs = _obstacle_contact(state, jnp.asarray(obstacles))
        f_floor = f_floor + f_obs
        tau_floor = tau_floor + tau_obs

    # controller torque
    tau_ctrl = opspace_torques(
        kin, M, bias, state.qpos, state.qvel, state.mocap_pos, state.mocap_quat
    )

    # arm contact reaction through the pinch-site spatial Jacobian
    J = point_jacobian(kin, kin.pinch_pos)  # (6,7) [w; v]
    wrench = jnp.concatenate([tau_arm, f_arm])
    tau_ext = J.T @ wrench

    # arm integration with implicit joint damping
    rhs = tau_ctrl + tau_ext - bias - _DAMPING * state.qvel
    qacc = solve_spd(M + DT * jnp.diag(_DAMPING), rhs)
    qvel = state.qvel + DT * qacc
    qpos = state.qpos + DT * qvel
    clamped = jnp.clip(qpos, _JNT_LO, _JNT_HI)
    qvel = jnp.where(clamped == qpos, qvel, 0.0)
    qpos = clamped

    # gripper DOF
    theta, dtheta = gr.step_theta(
        state.theta, state.dtheta, state.grip_ctrl, tau_theta, DT
    )

    # cube free-body integration
    f_cube = f_floor + f_cube_p + CUBE_MASS * _GRAVITY
    tau_cube = tau_floor + tau_cube_p
    linvel = state.cube_linvel + DT * f_cube / CUBE_MASS
    # world-frame rotational dynamics with body-diagonal inertia
    Rc = quat_to_mat(state.cube_quat)
    I_w = Rc @ jnp.diag(_CUBE_I_DIAG) @ Rc.T
    gyro = jnp.cross(state.cube_angvel, I_w @ state.cube_angvel)
    angvel = state.cube_angvel + DT * solve3(I_w, tau_cube - gyro)
    cube_pos = state.cube_pos + DT * linvel
    cube_quat = quat_integrate(state.cube_quat, angvel, DT)

    return state._replace(
        qpos=qpos,
        qvel=qvel,
        theta=theta,
        dtheta=dtheta,
        cube_pos=cube_pos,
        cube_quat=cube_quat,
        cube_linvel=linvel,
        cube_angvel=angvel,
    )


def control_step(state: PhysicsState, obstacles=None) -> PhysicsState:
    """10 physics substeps = one 20 ms control period.

    `obstacles`: optional (M, 2, 3) static AABBs (bin walls) the cube
    collides with — see `_obstacle_contact`."""

    def body(_, s):
        return substep(s, obstacles)

    return jax.lax.fori_loop(0, N_SUBSTEPS, body, state)


def observe(state: PhysicsState) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(tcp_pos, tcp_vel, cube_pos) like the reference sensors
    (2f85/pinch_pos, 2f85/pinch_vel, block_pos)."""
    kin = fk(state.qpos)
    v, _ = pinch_velocity(kin, state.qvel)
    return kin.pinch_pos, v, state.cube_pos
