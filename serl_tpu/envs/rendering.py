"""On-device camera rendering for image observations.

The reference gets 128x128 RGB from MuJoCo's OpenGL offscreen renderer
(franka_sim/envs/panda_pick_gym_env.py:225-231, cameras defined in
arena.xml / panda.xml). A TPU-native training loop cannot call GL per step,
so images are rendered *in-graph* by a batched analytic raycaster:

  * scene = plane (checker floor) + spheres/capsules (arm links) + boxes
    (cube, gripper pads, hand) built from the same FK the physics uses,
  * per camera: 128x128 rays, closest-hit over ~12 primitives, Lambertian
    shading with the MJCF light setup, sky gradient background,
  * everything is dense ray x primitive math (VPU-friendly), vmapped over
    envs; a full batch of 2-camera renders is one fused XLA computation.

Camera poses/fovs and object colors come from the extracted model constants
(panda_model.py) so views match the reference's `front` and `handcam_rgb`.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from serl_tpu.envs.physics import engine
from serl_tpu.envs.physics import gripper as gr
from serl_tpu.envs.physics import panda_model as pm
from serl_tpu.envs.physics.arm import fk
from serl_tpu.envs.physics.math3d import quat_to_mat

BIG = 1e9


class Scene(NamedTuple):
    sph_c: jnp.ndarray  # (S,3) sphere centers
    sph_r: jnp.ndarray  # (S,)
    sph_col: jnp.ndarray  # (S,3)
    cap_a: jnp.ndarray  # (K,3) capsule endpoints
    cap_b: jnp.ndarray  # (K,3)
    cap_r: jnp.ndarray  # (K,)
    cap_col: jnp.ndarray  # (K,3)
    box_c: jnp.ndarray  # (B,3) box centers
    box_R: jnp.ndarray  # (B,3,3) box orientation (world<-box)
    box_h: jnp.ndarray  # (B,3) half extents
    box_col: jnp.ndarray  # (B,3)


_LINK_COL = jnp.asarray([0.85, 0.85, 0.87])
_DARK_COL = jnp.asarray([0.25, 0.25, 0.25])
_CUBE_COL = jnp.asarray([0.6, 0.3, 0.6])
_PAD_COL = jnp.asarray([0.2, 0.2, 0.2])


def build_scene(state: engine.PhysicsState) -> Scene:
    kin = fk(state.qpos)
    p = kin.p  # (8,3)
    pinch = kin.pinch_pos
    Rp = kin.pinch_rmat

    # arm as capsules between joint origins (visually approximate skeleton)
    segs = [
        (jnp.zeros(3), p[1], 0.07),   # base column
        (p[1], p[3], 0.07),           # shoulder-elbow
        (p[3], p[4], 0.06),
        (p[4], p[5], 0.06),           # forearm
        (p[5], p[7], 0.055),
        (p[7], pinch - Rp @ jnp.asarray([0.0, 0.0, 0.11]), 0.05),  # wrist->hand
    ]
    cap_a = jnp.stack([s[0] for s in segs])
    cap_b = jnp.stack([s[1] for s in segs])
    cap_r = jnp.asarray([s[2] for s in segs])
    cap_col = jnp.stack([_LINK_COL] * 5 + [_DARK_COL])

    # joints as spheres for silhouette
    sph_c = jnp.stack([p[3], p[5]])
    sph_r = jnp.asarray([0.08, 0.07])
    sph_col = jnp.stack([_LINK_COL, _LINK_COL])

    # gripper: hand box + two finger boxes from pad kinematics
    pk = gr.pad_kinematics(state.theta)
    pad_pts = pinch[None] + pk.points @ Rp.T  # (4,3)
    right_c = 0.5 * (pad_pts[0] + pad_pts[1])
    left_c = 0.5 * (pad_pts[2] + pad_pts[3])
    # keep the hand box clear of the wrist camera (at x=-0.05 on attachment)
    hand_c = pinch - Rp @ jnp.asarray([0.01, 0.0, 0.11])
    finger_h = jnp.asarray([0.012, 0.008, 0.030])
    boxes_c = [
        state.cube_pos,
        hand_c,
        right_c,
        left_c,
    ]
    boxes_R = [
        quat_to_mat(state.cube_quat),
        Rp,
        Rp,
        Rp,
    ]
    boxes_h = [
        jnp.asarray(pm.BLOCK_HALF, jnp.float32),
        jnp.asarray([0.03, 0.045, 0.035]),
        finger_h,
        finger_h,
    ]
    boxes_col = [_CUBE_COL, _DARK_COL, _PAD_COL, _PAD_COL]

    return Scene(
        sph_c=sph_c,
        sph_r=sph_r,
        sph_col=sph_col,
        cap_a=cap_a,
        cap_b=cap_b,
        cap_r=cap_r,
        cap_col=cap_col,
        box_c=jnp.stack(boxes_c),
        box_R=jnp.stack(boxes_R),
        box_h=jnp.stack(boxes_h),
        box_col=jnp.stack(boxes_col),
    )


# ----------------------- ray-primitive intersections ----------------------- #


def _ray_sphere(o, d, c, r):
    """o,d: (P,3); c: (S,3), r: (S,). Returns t (P,S), normal (P,S,3)."""
    oc = o[:, None, :] - c[None, :, :]
    b = jnp.sum(oc * d[:, None, :], -1)
    cc = jnp.sum(oc * oc, -1) - r[None, :] ** 2
    disc = b * b - cc
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where((disc > 0) & (t > 1e-4), t, BIG)
    hit = o[:, None, :] + t[..., None] * d[:, None, :]
    n = (hit - c[None, :, :]) / jnp.maximum(r[None, :, None], 1e-9)
    return t, n


def _ray_capsule(o, d, a, b, r):
    """Capsule via closest-approach of the ray to the segment, treated as a
    swept sphere (approximate but silhouette-correct for thin capsules)."""
    ab = b - a  # (K,3)
    ab2 = jnp.sum(ab * ab, -1)  # (K,)

    # iterate: project ray point at current t onto segment, sphere test there
    def sphere_at(s):
        c = a[None, :, :] + s[..., None] * ab[None, :, :]  # (P,K,3)
        oc = o[:, None, :] - c
        bq = jnp.sum(oc * d[:, None, :], -1)
        cc = jnp.sum(oc * oc, -1) - r[None, :] ** 2
        disc = bq * bq - cc
        t = -bq - jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where((disc > 0) & (t > 1e-4), t, BIG)
        return t, c

    # initial guess: closest point of segment to ray origin-line
    # two fixed-point refinements are enough visually
    s = jnp.clip(
        jnp.sum((o[:, None, :] - a[None, :, :]) * ab[None, :, :], -1)
        / jnp.maximum(ab2[None, :], 1e-9),
        0.0,
        1.0,
    )
    for _ in range(2):
        t, c = sphere_at(s)
        t_safe = jnp.where(t >= BIG, 0.0, t)
        hitp = o[:, None, :] + t_safe[..., None] * d[:, None, :]
        s = jnp.clip(
            jnp.sum((hitp - a[None, :, :]) * ab[None, :, :], -1)
            / jnp.maximum(ab2[None, :], 1e-9),
            0.0,
            1.0,
        )
    t, c = sphere_at(s)
    hit = o[:, None, :] + jnp.where(t >= BIG, 0.0, t)[..., None] * d[:, None, :]
    n = hit - c
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return t, n


def _ray_box(o, d, c, R, h):
    """Oriented box slab test. o,d: (P,3); c: (B,3); R: (B,3,3); h: (B,3)."""
    # to box frame
    ol = jnp.einsum("bij,pbi->pbj", R, o[:, None, :] - c[None, :, :])
    dl = jnp.einsum("bij,pbi->pbj", R, jnp.broadcast_to(d[:, None, :], (d.shape[0], c.shape[0], 3)))
    inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-9, jnp.where(dl >= 0, 1e-9, -1e-9), dl)
    t1 = (-h[None] - ol) * inv
    t2 = (h[None] - ol) * inv
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    hit_ok = (tmax > jnp.maximum(tmin, 1e-4))
    t = jnp.where(hit_ok & (tmin > 1e-4), tmin, BIG)
    # normal: axis of entry face
    entry = jnp.minimum(t1, t2)
    axis = jnp.argmax(entry, axis=-1)  # (P,B)
    sign = -jnp.sign(jnp.take_along_axis(dl, axis[..., None], -1))[..., 0]
    n_local = jax.nn.one_hot(axis, 3) * sign[..., None]
    n = jnp.einsum("bij,pbj->pbi", R, n_local)  # box->world
    return t, n


def _checker(p):
    """Floor checker like the MJCF grid texture (~0.75 m squares over 6 m)."""
    k = jnp.floor(p[..., 0] / 0.75) + jnp.floor(p[..., 1] / 0.75)
    dark = jnp.asarray([0.1, 0.2, 0.3])
    light = jnp.asarray([0.2, 0.3, 0.4])
    sel = (jnp.mod(k, 2.0) == 0)[..., None]
    return jnp.where(sel, dark, light)


def _sky(d):
    t = jnp.clip(d[..., 2] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    top = jnp.asarray([0.3, 0.5, 0.7])
    bot = jnp.asarray([0.05, 0.05, 0.08])
    return bot + t * (top - bot)


_LIGHT_DIR = jnp.asarray([0.3, 0.2, 1.0]) / jnp.linalg.norm(
    jnp.asarray([0.3, 0.2, 1.0])
)


def render_scene(scene: Scene, cam_pos, cam_R, fovy_deg: float, size: int):
    """Render one camera. cam_R columns: x=right, y=up, -z=view (MuJoCo)."""
    half = jnp.tan(jnp.deg2rad(fovy_deg) / 2.0)
    ys = jnp.linspace(half, -half, size)
    xs = jnp.linspace(-half, half, size)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dirs_cam = jnp.stack([gx, gy, -jnp.ones_like(gx)], axis=-1).reshape(-1, 3)
    d = dirs_cam @ cam_R.T
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam_pos, d.shape)

    P = d.shape[0]
    # plane z=0
    t_plane = jnp.where(d[:, 2] < -1e-6, -o[:, 2] / d[:, 2], BIG)

    t_s, n_s = _ray_sphere(o, d, scene.sph_c, scene.sph_r)
    t_c, n_c = _ray_capsule(o, d, scene.cap_a, scene.cap_b, scene.cap_r)
    t_b, n_b = _ray_box(o, d, scene.box_c, scene.box_R, scene.box_h)

    ts = jnp.concatenate([t_plane[:, None], t_s, t_c, t_b], axis=1)  # (P,M)
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (P, 1, 3))
    ns = jnp.concatenate([up, n_s, n_c, n_b], axis=1)
    plane_col = _checker(o + t_plane[:, None] * d)  # (P,3)
    cols = jnp.concatenate(
        [
            plane_col[:, None, :],
            jnp.broadcast_to(scene.sph_col, (P,) + scene.sph_col.shape),
            jnp.broadcast_to(scene.cap_col, (P,) + scene.cap_col.shape),
            jnp.broadcast_to(scene.box_col, (P,) + scene.box_col.shape),
        ],
        axis=1,
    )

    idx = jnp.argmin(ts, axis=1)  # (P,)
    t_hit = jnp.take_along_axis(ts, idx[:, None], 1)[:, 0]
    n_hit = jnp.take_along_axis(ns, idx[:, None, None], 1)[:, 0]
    c_hit = jnp.take_along_axis(cols, idx[:, None, None], 1)[:, 0]

    # Lambert with headlight ambient (MJCF: ambient .5, diffuse .4 + lights)
    diff = jnp.clip(jnp.sum(n_hit * _LIGHT_DIR, -1), 0.0, 1.0)[:, None]
    lit = c_hit * (0.55 + 0.55 * diff)
    sky = _sky(d)
    rgb = jnp.where((t_hit < BIG)[:, None], lit, sky)
    img = jnp.clip(rgb.reshape(size, size, 3), 0.0, 1.0)
    return (img * 255.0).astype(jnp.uint8)


_FRONT_R = quat_to_mat(jnp.asarray(pm.FRONT_CAM_QUAT, jnp.float32))
_FRONT_POS = jnp.asarray(pm.FRONT_CAM_POS, jnp.float32)
_WRIST_R_ATT = quat_to_mat(jnp.asarray(pm.WRIST_CAM_QUAT_ATT, jnp.float32))
_WRIST_POS_ATT = jnp.asarray(pm.WRIST_CAM_POS_ATT, jnp.float32)
_ATT_POS_L7 = jnp.asarray(pm.ATTACH_BODY_POS_L7, jnp.float32)
_ATT_R_L7 = quat_to_mat(jnp.asarray(pm.ATTACH_BODY_QUAT_L7, jnp.float32))


def render_cameras(state: engine.PhysicsState, size: int = 128):
    """(front, wrist) uint8 (size, size, 3) images for one env."""
    scene = build_scene(state)
    kin = fk(state.qpos)
    # wrist camera rides the attachment body on link7
    R7 = kin.R[7]
    p7 = kin.p[7]
    att_R = R7 @ _ATT_R_L7
    att_p = p7 + R7 @ _ATT_POS_L7
    wrist_R = att_R @ _WRIST_R_ATT
    wrist_p = att_p + att_R @ _WRIST_POS_ATT

    front = render_scene(scene, _FRONT_POS, _FRONT_R, pm.FRONT_CAM_FOVY, size)
    wrist = render_scene(scene, wrist_p, wrist_R, pm.WRIST_CAM_FOVY, size)
    return front, wrist
