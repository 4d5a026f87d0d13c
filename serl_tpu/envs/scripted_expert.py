"""Scripted expert policy for PandaPickCube.

Role parity: the reference records human demonstrations via spacemouse
teleop (`examples/*/record_demo.py`, SpacemouseIntervention wrapper) to seed
RLPD's 50/50 demo buffer. On TPU we generate equivalent demonstrations with
a batched scripted pick policy — a stateless geometric state machine
(approach above the block, descend, close, lift) computed from the physics
state, jit/vmap-friendly, with optional exploration noise. The same function
doubles as the "expert intervention" source for intervention-style training
(wrappers.py SpacemouseIntervention analogue).
"""

import jax
import jax.numpy as jnp

from serl_tpu.envs.panda_pick import EnvState
from serl_tpu.envs.physics import engine


def expert_action(
    state: EnvState, rng: jnp.ndarray = None, noise_scale: float = 0.0
) -> jnp.ndarray:
    """(4,) action for one env. Phases inferred from geometry each step."""
    phys = state.physics
    tcp, _, block = engine.observe(phys)
    mocap = phys.mocap_pos
    theta = phys.theta

    xy_err = jnp.linalg.norm(tcp[:2] - block[:2])
    lifted = block[2] > 0.06
    closing = theta > 0.25

    # targets per phase
    above = jnp.concatenate([block[:2], jnp.asarray([0.18])])
    down = jnp.concatenate([block[:2], block[2:3] - 0.006])
    lift = jnp.concatenate([block[:2], jnp.asarray([0.35])])

    aligned = xy_err < 0.010
    near_grasp = aligned & (tcp[2] < block[2] + 0.012)

    target = jnp.where(
        closing | lifted,
        lift,
        jnp.where(aligned, down, above),
    )
    grasp = jnp.where(near_grasp | closing | lifted, 1.0, -1.0)

    delta = jnp.clip((target - mocap) / 0.1, -1.0, 1.0)
    action = jnp.concatenate([delta, grasp[None]])
    if rng is not None and noise_scale > 0.0:
        action = action + noise_scale * jax.random.normal(rng, (4,))
    return jnp.clip(action, -1.0, 1.0)


def pose_expert_action(
    state: EnvState,
    target_pose,
    action_scale,
    rng: jnp.ndarray = None,
    noise_scale: float = 0.0,
    approach_z: float = 0.15,
) -> jnp.ndarray:
    """(7,) expert for PandaPoseTaskEnv workloads (peg/PCB/cable shapes):
    align xy above the target, then descend to the target pose. The same
    role the spacemouse operator plays when recording demos / intervening in
    the reference's real-robot examples (record_demo.py,
    SpacemouseIntervention).

    Acts on OBSERVABLE quantities (measured tcp pose from FK, tcp_vel) —
    not the hidden mocap controller target — so BC / the RLPD policy can
    actually clone the stored intervention actions (see
    relocation_expert_action's round-4 note; an expert steering
    `target - mocap` is not a function of the observation). PD with
    tcp_vel damping keeps it stable under the tcp->mocap tracking lag."""
    from serl_tpu.envs.physics.arm import fk
    from serl_tpu.envs.physics.math3d import (
        mat_to_quat,
        quat_conj,
        quat_mul,
        quat_to_axis_angle,
    )
    from serl_tpu.envs.wrappers import euler_to_quat

    phys = state.physics
    kin = fk(phys.qpos)
    tcp = kin.pinch_pos
    _, tcp_vel, _ = engine.observe(phys)
    target = jnp.asarray(target_pose[:3], jnp.float32)

    xy_err = jnp.linalg.norm(tcp[:2] - target[:2])
    aligned = xy_err < 0.005
    goal_z = jnp.where(aligned, target[2], jnp.maximum(tcp[2], approach_z))
    goal = jnp.concatenate([target[:2], goal_z[None]])

    dpos = jnp.clip(
        (goal - tcp) / (action_scale[0] * 2.0) - 1.0 * tcp_vel, -1.0, 1.0
    )
    # steer orientation to the target euler (resets may randomize yaw —
    # reference RANDOM_RZ_RANGE), keep gripper. The env composes action[3:6]
    # as a world-frame axis-angle rotation (tasks.py step), so the exact
    # error is the axis-angle log of the relative rotation
    # target * conj(current) of the MEASURED orientation.
    tgt_eul = jnp.asarray(target_pose[3:6], jnp.float32)
    cur_quat = mat_to_quat(kin.pinch_rmat)
    q_rel = quat_mul(euler_to_quat(tgt_eul), quat_conj(cur_quat))
    err = quat_to_axis_angle(q_rel)
    drot = jnp.clip(err / jnp.maximum(action_scale[1], 1e-6), -1.0, 1.0)
    action = jnp.concatenate([dpos, drot, jnp.zeros(1)])
    if rng is not None and noise_scale > 0.0:
        action = action + noise_scale * jax.random.normal(rng, (7,))
    return jnp.clip(action, -1.0, 1.0)


def relocation_expert_action(
    state: EnvState,
    target_bin,
    action_scale,
    rng: jnp.ndarray = None,
    noise_scale: float = 0.0,
) -> jnp.ndarray:
    """(7,) expert for BinRelocationEnv: pick the cube, carry it over the
    target bin, release. Geometric state machine like `expert_action`.

    IMPORTANT (round-4 find): the action must be computed from OBSERVABLE
    quantities only (tcp pose, cube pos, gripper drive) — never from the
    hidden mocap controller target. An expert steering `target - mocap` is
    NOT a function of the observation (tcp lags mocap by ~1-2 cm; at
    action_scale 0.02 that is ~0.5 action error), so neither BC nor the
    RLPD policy could ever clone its stored intervention actions — the
    round-3 fwbw runs trained on unlearnable expert labels."""
    phys = state.physics
    tcp, _, cube = engine.observe(phys)
    theta = phys.theta
    tgt = jnp.asarray(target_bin, jnp.float32)

    # phase inference must distinguish "closed AROUND the cube" from
    # "closed on air" (round-5 fix): a missed grasp — common when the cube
    # sits against a bin wall and the closing pads squeeze it out — used to
    # leave theta > 0.25 with no cube, and the old `closing = theta > 0.25`
    # sent the expert into an empty carry it could never leave (the release
    # condition requires the cube lifted). That deadlock, repeated across
    # chained episodes, capped the chained expert at ~0.67. Now: closed-but-
    # empty opens the gripper and restarts the approach.
    near_hand = jnp.linalg.norm(tcp - cube) < 0.045
    closing = (theta > 0.25) & near_hand
    empty_closed = (theta > 0.25) & ~near_hand
    holding = closing & (cube[2] > 0.05)

    xy_err = jnp.linalg.norm(tcp[:2] - cube[:2])
    aligned = xy_err < 0.010
    near_grasp = aligned & (tcp[2] < cube[2] + 0.012)

    above_cube = jnp.concatenate([cube[:2], jnp.asarray([0.18])])
    grasp_pos = jnp.concatenate([cube[:2], cube[2:3] - 0.006])
    carry = jnp.concatenate([tgt, jnp.asarray([0.15])])
    # GENTLE delivery (round-5 fix): descend over the bin before releasing.
    # The old expert released at z~0.15 — a 13 cm drop that bounced the cube
    # off the 4 cm walls into corners, capping the CHAINED expert at ~0.67
    # episode success (vs 0.88 from centered resets) because the next grasp
    # had to dig a wedged cube out; policies cloned the same bounce. Lowering
    # to ~4 cm above the floor before opening keeps deliveries centered.
    lower = jnp.concatenate([tgt, jnp.asarray([0.085])])
    over_tgt = jnp.linalg.norm(tcp[:2] - tgt) < 0.02

    target = jnp.where(
        holding,
        jnp.where(over_tgt, lower, carry),
        jnp.where(closing, carry, jnp.where(aligned, grasp_pos, above_cube)),
    )
    # release once the held cube is over the bin AND lowered; also open on
    # a closed-empty gripper so the approach can restart
    release = holding & over_tgt & (tcp[2] < 0.10)
    grasp = jnp.where(
        release | empty_closed,
        -1.0,
        jnp.where(near_grasp | closing | holding, 1.0, -1.0),
    )

    # PD control on OBSERVED quantities: proportional on the tcp error,
    # derivative on tcp_vel to damp the tcp->mocap tracking lag (gain sweep
    # at the bin task's action_scale 0.05: kp_div=2*scale, kd=1.0 gives
    # 0.88 success; pure P at any gain oscillates to ~0)
    _, tcp_vel, _ = engine.observe(phys)
    dpos = jnp.clip(
        (target - tcp) / (action_scale[0] * 2.0) - 1.0 * tcp_vel, -1.0, 1.0
    )
    action = jnp.concatenate([dpos, jnp.zeros(3), grasp[None]])
    if rng is not None and noise_scale > 0.0:
        action = action + noise_scale * jax.random.normal(rng, (7,))
    return jnp.clip(action, -1.0, 1.0)
