"""Extract Panda+2F85+cube model constants from the reference MJCF.

Run once at build time (requires the `mujoco` package and the reference
assets mounted at /root/reference). Emits
`serl_tpu/envs/physics/panda_model.py` — pure data (geometry, masses,
inertias, joint parameters, gripper linkage fit, camera poses), which the
batched XLA physics engine consumes. The numbers are the standard
MuJoCo-menagerie Franka Panda / Robotiq 2F-85 spec.

Strategy notes:
  * The 7 arm links are modeled exactly (pos/quat/inertia per MJCF).
  * The whole gripper assembly (base_mount..pads, ~1.05 kg) is rigid except
    the finger linkage; its moving parts are ~0.08 kg, so for arm dynamics we
    rigidly compose every gripper body (at home finger pose) into link7's
    inertia. Finger opening enters only through pad *kinematics*: we sweep the
    driver joint and fit pad pose in the pinch-site frame as a function of
    drive angle.
"""

import sys
from pathlib import Path

import mujoco
import numpy as np

XML = "/root/reference/franka_sim/franka_sim/envs/xmls/arena.xml"
OUT = Path(__file__).resolve().parent.parent / "serl_tpu/envs/physics/panda_model.py"

PANDA_HOME = np.array([0, -0.785, 0, -2.35, 0, 1.57, np.pi / 4])


def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_inv(q):
    return np.array([q[0], -q[1], -q[2], -q[3]]) / np.dot(q, q)


def quat_rot(q, v):
    m = np.zeros(9)
    mujoco.mju_quat2Mat(m, q)
    return m.reshape(3, 3) @ v


def main():
    m = mujoco.MjModel.from_xml_path(XML)
    d = mujoco.MjData(m)

    name2body = {
        mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, i): i for i in range(m.nbody)
    }
    link_ids = [name2body[f"link{i}"] for i in range(8)]

    # --- arm kinematics / inertia (links 1..7 are the moving bodies) ---
    body_pos = m.body_pos[link_ids]         # local offset from parent
    body_quat = m.body_quat[link_ids]       # local orientation
    body_mass = m.body_mass[link_ids].copy()
    body_ipos = m.body_ipos[link_ids].copy()
    body_iquat = m.body_iquat[link_ids].copy()
    body_inertia = m.body_inertia[link_ids].copy()  # principal diag

    # --- compose the rigid gripper assembly into link7 ---
    # Set arm home + fingers open, read world poses, express each gripper
    # body's inertia in the link7 frame and merge.
    d.qpos[:7] = PANDA_HOME
    mujoco.mj_forward(m, d)
    link7 = name2body["link7"]
    R7 = d.xmat[link7].reshape(3, 3)
    p7 = d.xpos[link7]

    gripper_bodies = [
        i
        for i in range(m.nbody)
        if _is_descendant(m, i, name2body["attachment"]) or i == name2body["attachment"]
    ]

    M_tot = body_mass[7]
    # current link7 inertia about its own com, as 3x3 in link7 frame
    I7 = _principal_to_frame(body_inertia[7], body_iquat[7])
    com7 = body_ipos[7].copy()
    # accumulate: first compute combined COM
    coms = [com7]
    masses = [M_tot]
    inertias = [I7]
    for b in gripper_bodies:
        mass = m.body_mass[b]
        if mass == 0:
            continue
        Rb = d.xmat[b].reshape(3, 3)
        pb = d.xpos[b]
        # COM of body b in link7 frame
        com_w = pb + Rb @ m.body_ipos[b]
        com_l7 = R7.T @ (com_w - p7)
        # inertia in link7 frame
        Ib_b = _principal_to_frame(m.body_inertia[b], m.body_iquat[b])
        R_l7_b = R7.T @ Rb
        Ib_l7 = R_l7_b @ Ib_b @ R_l7_b.T
        coms.append(com_l7)
        masses.append(mass)
        inertias.append(Ib_l7)

    masses = np.array(masses)
    coms = np.array(coms)
    total_mass = masses.sum()
    com_combined = (masses[:, None] * coms).sum(0) / total_mass
    I_combined = np.zeros((3, 3))
    for mass, c, I in zip(masses, coms, inertias):
        r = c - com_combined
        I_combined += I + mass * ((r @ r) * np.eye(3) - np.outer(r, r))

    body_mass[7] = total_mass
    body_ipos[7] = com_combined
    # store full 3x3 inertia for link7 (not principal) — engine uses 3x3
    inertia_full = [
        _principal_to_frame(body_inertia[i], body_iquat[i]) for i in range(7)
    ]
    inertia_full.append(I_combined)
    inertia_full = np.stack(inertia_full)

    # --- joint params ---
    jnt_armature = m.dof_armature[:7].copy()
    jnt_damping = m.dof_damping[:7].copy()
    jnt_range = m.jnt_range[:7].copy()
    actuator_ctrlrange = m.actuator_ctrlrange[:7].copy()

    # --- pinch site transform relative to link7 ---
    pinch_sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "pinch")
    p_pinch = d.site_xpos[pinch_sid]
    R_pinch = d.site_xmat[pinch_sid].reshape(3, 3)
    pinch_pos_l7 = R7.T @ (p_pinch - p7)
    R_pinch_l7 = R7.T @ R_pinch
    q_pinch_l7 = np.zeros(4)
    mujoco.mju_mat2Quat(q_pinch_l7, R_pinch_l7.flatten())

    # --- attachment site (wrist force/cam reference) relative to link7 ---
    att_sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "attachment_site")
    p_att = d.site_xpos[att_sid]
    R_att = d.site_xmat[att_sid].reshape(3, 3)
    att_pos_l7 = R7.T @ (p_att - p7)
    q_att_l7 = np.zeros(4)
    mujoco.mju_mat2Quat(q_att_l7, (R7.T @ R_att).flatten())

    # --- gripper pad kinematics vs driver angle ---
    # sweep driver qpos (with equality-coupled left driver), record pad-box
    # centers/halfsizes in the pinch frame
    rd = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "right_driver_joint")
    ld = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "left_driver_joint")
    rc = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "right_coupler_joint")
    lc = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "left_coupler_joint")
    rf = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "right_follower_joint")
    lf = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "left_follower_joint")
    rs = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "right_spring_link_joint")
    ls = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "left_spring_link_joint")
    pad_geoms = {
        "right": [
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "right_pad1"),
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "right_pad2"),
        ],
        "left": [
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "left_pad1"),
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "left_pad2"),
        ],
    }
    thetas = np.linspace(0.0, 0.8, 33)
    pad_centers = {"right": [], "left": []}
    for th in thetas:
        d.qpos[:] = 0
        d.qpos[:7] = PANDA_HOME
        # linkage closure: spring_link tracks driver (same 4-bar); follower
        # compensates; coupler via connect equality. Approximate closure by
        # setting driver+spring to th and solving follower so pad stays
        # parallel: in the real 2F85, follower = -driver (pad stays vertical).
        for j, v in [(rd, th), (ld, th), (rs, th), (ls, th), (rf, -th), (lf, -th)]:
            d.qpos[m.jnt_qposadr[j]] = v
        mujoco.mj_forward(m, d)
        Rp = d.site_xmat[pinch_sid].reshape(3, 3)
        pp = d.site_xpos[pinch_sid]
        for side in ("right", "left"):
            centers = []
            for g in pad_geoms[side]:
                c_w = d.geom_xpos[g]
                centers.append(Rp.T @ (c_w - pp))
            pad_centers[side].append(np.mean(centers, 0))
    pad_centers = {k: np.array(v) for k, v in pad_centers.items()}
    pad_half = m.geom_size[pad_geoms["right"][0]].copy()  # box half-size
    pad_friction = m.geom_friction[pad_geoms["right"][0]].copy()

    # fit: pad lateral offset (pinch-frame y for right pad) vs theta
    # (other coords nearly constant)
    y_r = pad_centers["right"][:, 1]
    z_r = pad_centers["right"][:, 2]
    x_r = pad_centers["right"][:, 0]
    poly_y = np.polyfit(thetas, y_r, 3)
    poly_z = np.polyfit(thetas, z_r, 3)

    # --- block / arena ---
    blk_g = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "block")
    block_half = m.geom_size[blk_g].copy()
    block_mass = m.body_mass[name2body["block"]]
    block_friction = m.geom_friction[blk_g].copy()
    floor_g = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "floor")
    floor_friction = m.geom_friction[floor_g].copy()

    # --- home TCP pose ---
    d.qpos[:] = 0
    d.qpos[:7] = PANDA_HOME
    mujoco.mj_forward(m, d)
    tcp_home = d.site_xpos[pinch_sid].copy()
    tcp_home_quat = np.zeros(4)
    mujoco.mju_mat2Quat(tcp_home_quat, d.site_xmat[pinch_sid])
    mocap_home_quat = m.body_quat[name2body["target"]].copy()

    # --- cameras ---
    cam_front = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_CAMERA, "front")
    front_pos = m.cam_pos0[cam_front].copy() if hasattr(m, "cam_pos0") else m.cam_pos[cam_front].copy()
    front_pos = m.cam_pos[cam_front].copy()
    front_quat = m.cam_quat[cam_front].copy()
    front_fovy = float(m.cam_fovy[cam_front])
    cam_wrist = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_CAMERA, "handcam_rgb")
    wrist_pos = m.cam_pos[cam_wrist].copy()  # relative to attachment body
    wrist_quat = m.cam_quat[cam_wrist].copy()
    wrist_fovy = float(m.cam_fovy[cam_wrist])
    att_body = name2body["attachment"]
    att_bpos_l7 = m.body_pos[att_body].copy()
    att_bquat_l7 = m.body_quat[att_body].copy()

    # gripper actuator params (general actuator on the driver tendon)
    act_id = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_ACTUATOR, "fingers_actuator")
    gainprm = m.actuator_gainprm[act_id, :3].copy()
    biasprm = m.actuator_biasprm[act_id, :3].copy()
    forcerange = m.actuator_forcerange[act_id].copy()

    def fmt(a):
        return np.array2string(
            np.asarray(a, dtype=np.float64),
            separator=", ",
            precision=10,
            suppress_small=False,
            threshold=10**6,
            max_line_width=88,
        )

    src = f'''"""Panda + Robotiq 2F-85 + cube model constants (GENERATED — do not edit).

Generated by tools/extract_model.py from the reference MJCF
(/root/reference/franka_sim/franka_sim/envs/xmls/ — standard MuJoCo-menagerie
Franka Panda / Robotiq 2F-85 spec). Pure data consumed by the batched XLA
physics engine in serl_tpu/envs/physics/.

Conventions: 7 moving arm links (link1..link7); per-link local transform
(BODY_POS/BODY_QUAT, parent frame), COM (BODY_IPOS, link frame), 3x3 inertia
about COM (BODY_INERTIA, link frame). The rigid gripper assembly is composed
into link7. All joints are revolute about local +z.
"""

import numpy as np

NUM_LINKS = 7
PANDA_HOME = np.array({fmt(PANDA_HOME)})

# link0 is the fixed base; BODY_* below are for link0..link7 (8 rows), where
# row i is the local transform of link_i in its parent frame.
BODY_POS = np.array({fmt(body_pos)})
BODY_QUAT = np.array({fmt(body_quat)})
BODY_MASS = np.array({fmt(body_mass)})
BODY_IPOS = np.array({fmt(body_ipos)})
BODY_INERTIA = np.array({fmt(inertia_full)})  # (8, 3, 3)

JOINT_ARMATURE = np.array({fmt(jnt_armature)})
JOINT_DAMPING = np.array({fmt(jnt_damping)})
JOINT_RANGE = np.array({fmt(jnt_range)})
TORQUE_LIMIT = np.array({fmt(actuator_ctrlrange)})

PINCH_POS_L7 = np.array({fmt(pinch_pos_l7)})
PINCH_QUAT_L7 = np.array({fmt(q_pinch_l7)})
ATTACH_SITE_POS_L7 = np.array({fmt(att_pos_l7)})
ATTACH_SITE_QUAT_L7 = np.array({fmt(q_att_l7)})
ATTACH_BODY_POS_L7 = np.array({fmt(att_bpos_l7)})
ATTACH_BODY_QUAT_L7 = np.array({fmt(att_bquat_l7)})

TCP_HOME = np.array({fmt(tcp_home)})
TCP_HOME_QUAT = np.array({fmt(tcp_home_quat)})
MOCAP_HOME_QUAT = np.array({fmt(mocap_home_quat)})

GRAVITY = np.array([0.0, 0.0, -9.81])

# --- gripper (reduced 1-DoF model) ---
# driver angle theta in [0, 0.8]; right pad center in pinch frame:
#   y(theta) = polyval(PAD_Y_POLY, theta)   (left pad mirrored, y -> -y)
#   z(theta) = polyval(PAD_Z_POLY, theta)
#   x ~ {float(np.mean(x_r)):.10f} (constant)
PAD_Y_POLY = np.array({fmt(poly_y)})
PAD_Z_POLY = np.array({fmt(poly_z)})
PAD_X = {float(np.mean(x_r)):.10f}
PAD_HALF = np.array({fmt(pad_half)})   # pad box half-size (x, y, z) in pad frame
PAD_FRICTION = np.array({fmt(pad_friction)})
DRIVER_RANGE = np.array([0.0, 0.8])
# fingers_actuator (general, tendon "split"): force = gain*ctrl + bias
#   gainprm={fmt(gainprm)}, biasprm={fmt(biasprm)}, forcerange={fmt(forcerange)}
GRIPPER_GAIN = {float(gainprm[0]):.10f}
GRIPPER_BIAS_KP = {float(-biasprm[1]):.10f}
GRIPPER_BIAS_KV = {float(-biasprm[2]):.10f}
GRIPPER_FORCERANGE = np.array({fmt(forcerange)})

# --- block / arena ---
BLOCK_HALF = np.array({fmt(block_half)})
BLOCK_MASS = {float(block_mass):.10f}
BLOCK_FRICTION = np.array({fmt(block_friction)})
FLOOR_FRICTION = np.array({fmt(floor_friction)})

# --- cameras ---
FRONT_CAM_POS = np.array({fmt(front_pos)})
FRONT_CAM_QUAT = np.array({fmt(front_quat)})
FRONT_CAM_FOVY = {front_fovy}
WRIST_CAM_POS_ATT = np.array({fmt(wrist_pos)})
WRIST_CAM_QUAT_ATT = np.array({fmt(wrist_quat)})
WRIST_CAM_FOVY = {wrist_fovy}
'''
    OUT.write_text(src)
    print(f"wrote {{}} ({len(src)} chars)".format(OUT))
    # quick report
    print("total arm+gripper mass:", body_mass.sum())
    print("tcp_home:", tcp_home)
    print("pad y(theta=0):", y_r[0], "y(0.8):", y_r[-1])


def _is_descendant(m, body, ancestor):
    b = body
    while b != 0:
        b = m.body_parentid[b]
        if b == ancestor:
            return True
    return False


def _principal_to_frame(diag, iquat):
    """3x3 inertia in body frame from principal diag + orientation quat."""
    R = np.zeros(9)
    mujoco.mju_quat2Mat(R, iquat)
    R = R.reshape(3, 3)
    return R @ np.diag(diag) @ R.T


if __name__ == "__main__":
    sys.exit(main())
