"""Functional observation/action wrappers for batched envs.

Capability parity: reference `serl_launcher/wrappers/` —
`SERLObsWrapper` (flatten the state dict, lift images to the top level,
serl_obs_wrappers.py:5-25), `ChunkingWrapper` (obs-history stacking,
chunking.py:34-77), `FrontCameraWrapper` (front_camera_wrapper.py:6-26),
plus relative-frame and quat<->euler transforms used by the robot envs
(franka_env/envs/relative_env.py, utils/rotations.py).

These are pure functions over obs pytrees (batched or not) rather than gym
class wrappers — the TPU loop composes them in-graph.
"""

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from serl_tpu.envs.physics.math3d import (
    quat_conj,
    quat_mul,
    quat_to_mat,
)


def serl_obs(obs: Dict) -> Dict:
    """Env obs {"state": {...}, "images": {...}} -> SERL flat convention
    {"state": concat(sorted state values), "<image_key>": img}
    (reference SERLObsWrapper :5-25)."""
    out = {}
    state = obs["state"]
    out["state"] = jnp.concatenate(
        [state[k] for k in sorted(state.keys())], axis=-1
    )
    for k, v in obs.get("images", {}).items():
        out[k] = v
    return out


def add_stack_axis(obs: Dict, image_keys: Tuple[str, ...]) -> Dict:
    """Give live (unstacked) images the explicit T=1 frame-stack axis the
    agents expect."""
    out = dict(obs)
    for k in image_keys:
        img = out[k]
        axis = img.ndim - 3  # before H W C
        out[k] = jnp.expand_dims(img, axis)
    return out


class ChunkState(NamedTuple):
    """Rolling obs-history state (reference ChunkingWrapper deque)."""

    frames: Dict  # pytree with (…, T, ...) history axis per leaf


def chunk_init(obs: Dict, horizon: int) -> ChunkState:
    return ChunkState(
        frames=jax.tree.map(
            lambda x: jnp.repeat(
                jnp.expand_dims(x, x.ndim - (3 if x.ndim >= 3 else 1)),
                horizon,
                axis=x.ndim - (3 if x.ndim >= 3 else 1),
            ),
            obs,
        )
    )


def chunk_push(state: ChunkState, obs: Dict) -> ChunkState:
    def push(hist, x):
        axis = hist.ndim - (4 if hist.ndim >= 4 else 2)
        x = jnp.expand_dims(x, axis)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(hist, 1, hist.shape[axis], axis=axis), x],
            axis=axis,
        )

    return ChunkState(frames=jax.tree.map(push, state.frames, obs))


def act_exec_step(env, state, action_chunk: jnp.ndarray):
    """Receding-horizon action execution (reference ChunkingWrapper
    `act_exec_horizon`, serl_launcher/wrappers/chunking.py:62-73): the
    policy emits a (T, act_dim) chunk and the env executes the T
    sub-actions sequentially; the post-chunk observation and the FINAL
    sub-step's reward are returned (reference semantics — intermediate
    rewards are dropped).

    TPU-native: a `lax.scan` over the chunk on a functional env (single-env
    `env.step`; vmap to batch). One deliberate divergence for the
    functional setting: `done` is the OR over the chunk (the reference's
    python loop would simply keep stepping a finished episode; in-graph we
    must not lose the episode boundary). `info["success"]` is the max over
    the chunk for the same reason.
    """

    def body(carry, action):
        s, _, _, d_acc, succ_acc = carry
        s, obs, r, d, info = env.step(s, action)
        return (
            s, obs, r, jnp.maximum(d_acc, d),
            jnp.maximum(succ_acc, info["success"]),
        ), None

    s0, obs0 = state, None
    # prime the carry with one step so obs/reward have concrete shapes
    s0, obs, r, d, info = env.step(state, action_chunk[0])
    carry = (s0, obs, r, d, info["success"])
    if action_chunk.shape[0] > 1:
        carry, _ = jax.lax.scan(body, carry, action_chunk[1:])
    s, obs, r, d, succ = carry
    return s, obs, r, d, {"success": succ}


def front_camera_obs(obs: Dict, front_key: str = "front") -> Dict:
    """Front-camera-only view for reward classifiers (reference
    FrontCameraWrapper :6-26)."""
    return {"state": obs["state"], front_key: obs[front_key]}


def gripper_close_action(action6: jnp.ndarray) -> jnp.ndarray:
    """6-DoF action with the gripper pinned closed (reference GripperCloseEnv,
    franka_env wrappers.py:147-168)."""
    return jnp.concatenate([action6, jnp.ones(action6.shape[:-1] + (1,))], axis=-1)


def z_only_action(action_z_grip: jnp.ndarray) -> jnp.ndarray:
    """(dz, grasp) -> full action with xy/rot zeroed (reference ZOnlyWrapper,
    wrappers.py:105-123)."""
    dz = action_z_grip[..., :1]
    grasp = action_z_grip[..., 1:2]
    zeros = jnp.zeros(action_z_grip.shape[:-1] + (1,))
    return jnp.concatenate([zeros, zeros, dz, grasp], axis=-1)


def unnormalize_action(action, low, high):
    """[-1, 1] -> [low, high] (reference UnnormalizeActionProprio,
    norm.py:4-37)."""
    return 0.5 * (action + 1.0) * (high - low) + low


def normalize_proprio(proprio, low, high):
    return 2.0 * (proprio - low) / (high - low) - 1.0


def remap_obs(obs: dict, mapping: dict) -> dict:
    """Rename/move observation keys (reference RemapWrapper, remap.py:8-35).
    mapping: new_key -> old_key or (old_key, index)."""
    out = {}
    for new_key, src in mapping.items():
        if isinstance(src, tuple):
            out[new_key] = obs[src[0]][..., src[1]]
        else:
            out[new_key] = obs[src]
    return out


# ------------------- geometric wrappers (robot parity) ------------------- #


def quat_to_euler(quat: jnp.ndarray) -> jnp.ndarray:
    """(w,x,y,z) -> roll/pitch/yaw, matching reference Quat2EulerWrapper
    (utils/rotations.py:6-17 uses scipy xyz convention)."""
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_quat(euler: jnp.ndarray) -> jnp.ndarray:
    roll, pitch, yaw = jnp.moveaxis(euler, -1, 0)
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def adjoint_matrix(pos: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """6x6 adjoint of the (pos, quat) transform (reference
    utils/transformations.py:5-22) for expressing twists in the EE frame."""
    from serl_tpu.envs.physics.math3d import skew

    R = quat_to_mat(quat)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([skew(pos) @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def pose_relative_to(pose_pos, pose_quat, ref_pos, ref_quat):
    """Express a world pose in a reference frame (reference RelativeFrame,
    relative_env.py:11-109)."""
    inv_q = quat_conj(ref_quat)
    R_inv = quat_to_mat(inv_q)
    rel_pos = (pose_pos - ref_pos) @ R_inv.T if pose_pos.ndim > 1 else R_inv @ (
        pose_pos - ref_pos
    )
    rel_quat = quat_mul(inv_q, pose_quat)
    return rel_pos, rel_quat


class ClassifierRewardEnv:
    """In-graph learned-reward wrapper: the env's reward comes from a trained
    binary classifier on one camera, with early termination on classifier
    success — the reference `BinaryRewardClassifierWrapper`
    (serl_robot_infra/franka_env/envs/wrappers.py:13-102, used by the
    cable-route workload at
    examples/async_cable_route_drq/async_drq_randomized.py:345-360).

    TPU-native: the classifier forward runs inside the same jit program as
    the env step (the reference crosses host->GPU per actor step); the
    classifier params are closure constants (fixed during RL).

    The inner env's own success is preserved in `info["pose_success"]` so a
    run can report ground-truth task success alongside the learned reward.
    """

    def __init__(self, env, apply_fn, params, image_key: str = "front",
                 threshold: float = 0.5):
        self.env = env
        self.apply_fn = apply_fn
        self.params = params
        self.image_key = image_key
        self.threshold = threshold
        self.ACTION_DIM = getattr(env, "ACTION_DIM", 4)

    @property
    def time_limit_steps(self) -> int:
        return self.env.time_limit_steps

    def reset(self, rng):
        return self.env.reset(rng)

    def _classify(self, obs) -> jnp.ndarray:
        img = obs["images"][self.image_key]
        logit = self.apply_fn(
            {"params": self.params}, {self.image_key: img[None]}, train=False
        )
        return (jax.nn.sigmoid(logit) >= self.threshold).astype(jnp.float32)

    def step(self, state, action):
        new_state, obs, _r, _d, info = self.env.step(state, action)
        succ = self._classify(obs)
        done = jnp.maximum(
            (new_state.t >= self.time_limit_steps).astype(jnp.float32), succ
        )
        info = dict(info)
        info["pose_success"] = info.get("success", jnp.zeros(()))
        info["success"] = succ
        return new_state, obs, succ, done, info

    def step_auto_reset(self, state, action):
        # the classifier must see the PRE-reset frame (it decides `done`),
        # so this wrapper pays two renders per step: the stepped frame and
        # the post-autoreset obs. The reset state itself is built without
        # rendering (env._reset_state).
        stepped, obs, reward, done, info = self.step(state, action)
        fresh = self.env._reset_state(
            jax.random.fold_in(state.rng, state.ep_id)
        )
        fresh = fresh._replace(ep_id=state.ep_id + 1)
        is_done = done > 0.5
        new_state = jax.tree.map(
            lambda a, b: jnp.where(is_done, b, a), stepped, fresh
        )
        reset_obs = self.env._obs(new_state)
        out_obs = jax.tree.map(
            lambda t, r: jnp.where(is_done, r, t), obs, reset_obs
        )
        info = dict(info)
        info["final_obs"] = obs
        return new_state, out_obs, reward, done, info
