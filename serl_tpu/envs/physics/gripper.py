"""Reduced 1-DoF Robotiq 2F-85 gripper model.

The reference simulates the full 8-joint 2F-85 linkage with tendon coupling
and equality constraints (franka_sim/envs/xmls/panda.xml). For the pick task
only two things matter: (a) where the pad faces are as a function of closure,
and (b) the squeeze force the actuator can exert. We therefore reduce the
gripper to one driver DOF `theta` in [0, 0.8]:

  * pad pose in the pinch frame comes from a cubic fit of the *actual* linkage
    kinematics, extracted by sweeping the MJCF model (tools/extract_model.py);
  * the MuJoCo `fingers_actuator` (general actuator, gain 0.3137, bias
    -100*L - 10*dL, force in [-5, 5]) is applied verbatim on theta
    (tendon length L == theta for the coupled symmetric fingers);
  * contact normal forces on the pads feed back on theta through the pad
    velocity jacobian d(pad pos)/d(theta), so grip force balances actuator
    force instead of exploding the penalty springs.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from serl_tpu.envs.physics import panda_model as pm

_Y_POLY = np.asarray(pm.PAD_Y_POLY, np.float32)
_Z_POLY = np.asarray(pm.PAD_Z_POLY, np.float32)
_DY_POLY = np.asarray(
    [3 * pm.PAD_Y_POLY[0], 2 * pm.PAD_Y_POLY[1], pm.PAD_Y_POLY[2]], np.float32
)
_DZ_POLY = np.asarray(
    [3 * pm.PAD_Z_POLY[0], 2 * pm.PAD_Z_POLY[1], pm.PAD_Z_POLY[2]], np.float32
)

# two stacked pad boxes per finger (pad1 above pad2); their centers relative
# to the pad body frame are baked into the y/z polynomials which track the
# *mean* of both boxes; the individual boxes sit ~ +-0.0094 apart along z.
_PAD_BOX_DZ = (+0.009375, -0.009375)

# effective reduced-coordinate dynamics parameters (driver pair + linkage)
INERTIA = 0.012  # 2x driver armature 0.005 + finger link inertia
DAMPING = 0.2  # 2x driver joint damping 0.1
SPRING_K = 0.1  # 2x spring_link stiffness 0.05
SPRING_REF = 2.62  # springref (rad) — biases toward closing

GAIN = float(pm.GRIPPER_GAIN)
BIAS_KP = float(pm.GRIPPER_BIAS_KP)
BIAS_KV = float(pm.GRIPPER_BIAS_KV)
F_LO = float(pm.GRIPPER_FORCERANGE[0])
F_HI = float(pm.GRIPPER_FORCERANGE[1])
THETA_LO = float(pm.DRIVER_RANGE[0])
THETA_HI = float(pm.DRIVER_RANGE[1])


class PadKin(NamedTuple):
    """Pad contact-point kinematics in the *pinch frame*."""

    points: jnp.ndarray  # (4, 3): [right_pad1, right_pad2, left_pad1, left_pad2]
    normals: jnp.ndarray  # (4, 3): inward normals (toward the grip axis)
    dpoint_dtheta: jnp.ndarray  # (4, 3): closing velocity direction * |dy/dθ|


def pad_kinematics(theta: jnp.ndarray) -> PadKin:
    """Pad contact points/normals/jacobians in the pinch frame. theta: ()."""
    y = jnp.polyval(_Y_POLY, theta)
    z = jnp.polyval(_Z_POLY, theta)
    dy = jnp.polyval(_DY_POLY, theta)
    dz = jnp.polyval(_DZ_POLY, theta)
    # inner face of the pad box (half-thickness along y)
    y_face = y - pm.PAD_HALF[1]
    pts = []
    norms = []
    jacs = []
    for side in (+1.0, -1.0):  # right (+y), left (-y)
        for dzb in _PAD_BOX_DZ:
            pts.append(jnp.stack([jnp.zeros_like(y), side * y_face, z + dzb]))
            norms.append(jnp.asarray([0.0, -side, 0.0], jnp.float32))
            jacs.append(jnp.stack([jnp.zeros_like(dy), side * dy, dz]))
    return PadKin(
        points=jnp.stack(pts), normals=jnp.stack(norms), dpoint_dtheta=jnp.stack(jacs)
    )


def actuator_force(ctrl: jnp.ndarray, theta: jnp.ndarray, dtheta: jnp.ndarray):
    """MuJoCo general-actuator force on the driver tendon. ctrl in [0, 255]."""
    f = GAIN * ctrl - BIAS_KP * theta - BIAS_KV * dtheta
    return jnp.clip(f, F_LO, F_HI)


def step_theta(
    theta: jnp.ndarray,
    dtheta: jnp.ndarray,
    ctrl: jnp.ndarray,
    contact_torque: jnp.ndarray,
    dt: float,
):
    """Semi-implicit Euler on the reduced finger DOF."""
    f_act = actuator_force(ctrl, theta, dtheta)
    f_spring = SPRING_K * (SPRING_REF - theta)
    acc = (f_act + f_spring - DAMPING * dtheta + contact_torque) / INERTIA
    new_dtheta = dtheta + dt * acc
    new_theta = theta + dt * new_dtheta
    # joint-range clamp with velocity kill at the stops
    clamped = jnp.clip(new_theta, THETA_LO, THETA_HI)
    new_dtheta = jnp.where(clamped == new_theta, new_dtheta, 0.0)
    return clamped, new_dtheta
