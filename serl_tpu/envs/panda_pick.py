"""Batched PandaPickCube environment (the reference benchmark task).

Capability parity: `franka_sim/envs/panda_pick_gym_env.py` — same action
semantics (dx,dy,dz,grasp scaled by (0.1, 1), mocap target clipped to
cartesian bounds :21-23,:191-203), same 20 ms control / 2 ms physics split,
same observation dict (:74-132), same reward 0.3*exp(-20*dist) +
0.7*lift-progress (:280-288), same 10 s (100-step) episodes, block xy
uniformly sampled in SAMPLING_BOUNDS at reset (:150-174).

TPU-first design: `reset`/`step` are pure single-env functions over an
`EnvState` pytree; batching is `vmap`, the whole loop lives under one jit.
`step_auto_reset` folds episode termination into the device program so fused
actor/learner loops never leave the chip.
"""

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serl_tpu.envs.physics import engine

# reference constants (panda_pick_gym_env.py:21-23)
CARTESIAN_BOUNDS = np.asarray([[0.2, -0.3, 0.0], [0.6, 0.3, 0.5]], np.float32)
SAMPLING_BOUNDS = np.asarray([[0.25, -0.25], [0.55, 0.25]], np.float32)
ACTION_SCALE = np.asarray([0.1, 1.0], np.float32)
TIME_LIMIT_STEPS = 100  # 10 s / 0.02 s  (franka_sim/__init__.py:10-20)
ACTION_DIM = 4
STATE_OBS_DIM = 10  # tcp_pos(3) + tcp_vel(3) + gripper(1) + block_pos(3)


class EnvState(NamedTuple):
    physics: engine.PhysicsState
    t: jnp.ndarray  # () int32 control steps taken
    z_init: jnp.ndarray  # () initial block height
    rng: jnp.ndarray  # per-env key (used by auto-reset)
    ep_id: jnp.ndarray  # () int32 monotonically increasing episode counter


class PandaPickCubeEnv:
    """Functional batched env. All methods are single-env; `vmap` to batch."""

    def __init__(self, image_obs: bool = False, render_size: int = 128):
        self.image_obs = image_obs
        self.render_size = render_size

    @property
    def time_limit_steps(self) -> int:
        """Episode length (reference max_episode_steps=100,
        franka_sim/__init__.py:10-20). Read by `training.loop.evaluate`."""
        return TIME_LIMIT_STEPS

    # ------------------------------------------------------------------ #

    def reset(self, rng: jnp.ndarray) -> Tuple[EnvState, Dict]:
        rng, k_block, k_next = jax.random.split(rng, 3)
        xy = jax.random.uniform(
            k_block, (2,), minval=SAMPLING_BOUNDS[0], maxval=SAMPLING_BOUNDS[1]
        )
        phys = engine.init_state(xy)
        state = EnvState(
            physics=phys,
            t=jnp.zeros((), jnp.int32),
            z_init=phys.cube_pos[2],
            rng=k_next,
            ep_id=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def _step_state(
        self, state: EnvState, action: jnp.ndarray
    ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, Dict]:
        """Physics + reward only (no observation): (state, reward, done, info).
        Splitting obs out lets callers render each frame exactly once — the
        render is the pixel path's hot op."""
        action = jnp.clip(action, -1.0, 1.0)
        dpos = action[:3] * ACTION_SCALE[0]
        npos = jnp.clip(
            state.physics.mocap_pos + dpos, CARTESIAN_BOUNDS[0], CARTESIAN_BOUNDS[1]
        )
        g = state.physics.grip_ctrl / 255.0
        ng = jnp.clip(g + action[3] * ACTION_SCALE[1], 0.0, 1.0)
        phys = state.physics._replace(mocap_pos=npos, grip_ctrl=ng * 255.0)

        phys = engine.control_step(phys)
        new_state = state._replace(physics=phys, t=state.t + 1)

        reward = self._reward(new_state)
        done = new_state.t >= TIME_LIMIT_STEPS
        info = {"success": self._success(new_state)}
        return new_state, reward, done.astype(jnp.float32), info

    def step(
        self, state: EnvState, action: jnp.ndarray
    ) -> Tuple[EnvState, Dict, jnp.ndarray, jnp.ndarray, Dict]:
        """Returns (state, obs, reward, done, info). `done` mirrors the
        reference's `terminated = time_limit_exceeded()` (step:221)."""
        new_state, reward, done, info = self._step_state(state, action)
        return new_state, self._obs(new_state), reward, done, info

    def step_auto_reset(self, state: EnvState, action: jnp.ndarray):
        """Step; on episode end, swap in a freshly reset env (same program).

        Returns (state, obs, reward, done, info) where `obs` is the *reset*
        observation when done (gym autoreset semantics for vector envs); the
        pre-reset terminal observation is returned in info["final_obs"].

        Exactly ONE observation (render) is computed from the post-autoreset
        state; info["final_obs"] is a second render that XLA dead-code
        eliminates when the caller doesn't consume it (the memory-efficient
        pixel buffer never stores next_observations).
        """
        stepped, reward, done, info = self._step_state(state, action)
        rng, k_block, k_next = jax.random.split(state.rng, 3)
        xy = jax.random.uniform(
            k_block, (2,), minval=SAMPLING_BOUNDS[0], maxval=SAMPLING_BOUNDS[1]
        )
        fresh_phys = engine.init_state(xy)
        fresh = EnvState(
            physics=fresh_phys,
            t=jnp.zeros((), jnp.int32),
            z_init=fresh_phys.cube_pos[2],
            rng=k_next,
            ep_id=state.ep_id + 1,
        )
        is_done = done > 0.5
        new_state = jax.tree.map(lambda a, b: jnp.where(is_done, b, a), stepped, fresh)
        out_obs = self._obs(new_state)
        info = dict(info)
        info["final_obs"] = self._obs(stepped)
        return new_state, out_obs, reward, done, info

    # ------------------------------------------------------------------ #

    def _obs(self, state: EnvState) -> Dict:
        tcp_pos, tcp_vel, block_pos = engine.observe(state.physics)
        obs_state = {
            "panda/tcp_pos": tcp_pos,
            "panda/tcp_vel": tcp_vel,
            "panda/gripper_pos": (state.physics.grip_ctrl / 255.0)[None],
        }
        if self.image_obs:
            from serl_tpu.envs.rendering import render_cameras

            front, wrist = render_cameras(state.physics, self.render_size)
            return {"state": obs_state, "images": {"front": front, "wrist": wrist}}
        obs_state["block_pos"] = block_pos
        return {"state": obs_state}

    def _reward(self, state: EnvState) -> jnp.ndarray:
        """0.3 * exp(-20 dist(tcp, block)) + 0.7 * lift progress
        (panda_pick_gym_env.py:280-288)."""
        tcp_pos, _, block_pos = engine.observe(state.physics)
        dist = jnp.linalg.norm(block_pos - tcp_pos)
        r_close = jnp.exp(-20.0 * dist)
        z_success = state.z_init + 0.2
        r_lift = (block_pos[2] - state.z_init) / (z_success - state.z_init)
        r_lift = jnp.clip(r_lift, 0.0, 1.0)
        return 0.3 * r_close + 0.7 * r_lift

    def _success(self, state: EnvState) -> jnp.ndarray:
        return (state.physics.cube_pos[2] >= state.z_init + 0.2).astype(jnp.float32)


def flatten_obs(obs: Dict) -> jnp.ndarray:
    """Dict state obs -> flat vector (sorted keys), like gym FlattenObservation
    over the reference's Dict space (async_sac_state_sim.py:265-270)."""
    parts = [obs["state"][k] for k in sorted(obs["state"].keys())]
    return jnp.concatenate(parts, axis=-1)
