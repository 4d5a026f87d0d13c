"""Gymnasium adapter + registration for the batched envs.

Capability parity: the reference exposes its sim through the gym API
(`franka_sim/__init__.py:10-20` registers PandaPickCube-v0 /
PandaPickCubeVision-v0 with max_episode_steps=100). Users coming from the
reference can keep their gym-loop code; the adapter runs the jit env
single-instance and converts to numpy at the boundary. (TPU-native code
should use the batched functional API directly.)
"""

from typing import Optional

import jax
import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces

    _HAS_GYM = True
except ImportError:  # pragma: no cover
    _HAS_GYM = False


if _HAS_GYM:

    class PandaPickCubeGymEnv(gym.Env):
        """Single-env gym view of the batched PandaPickCubeEnv."""

        metadata = {"render_modes": ["rgb_array"], "render_fps": 50}

        def __init__(self, image_obs: bool = False, render_size: int = 128,
                     seed: int = 0):
            from serl_tpu.envs.panda_pick import PandaPickCubeEnv

            self._env = PandaPickCubeEnv(
                image_obs=image_obs, render_size=render_size
            )
            self._reset = jax.jit(self._env.reset)
            self._step = jax.jit(self._env.step)
            self._state = None
            self._rng = jax.random.PRNGKey(seed)
            self.image_obs = image_obs
            self.render_size = render_size

            state_space = {
                "panda/tcp_pos": spaces.Box(-np.inf, np.inf, (3,), np.float32),
                "panda/tcp_vel": spaces.Box(-np.inf, np.inf, (3,), np.float32),
                "panda/gripper_pos": spaces.Box(-np.inf, np.inf, (1,), np.float32),
            }
            if image_obs:
                self.observation_space = spaces.Dict(
                    {
                        "state": spaces.Dict(state_space),
                        "images": spaces.Dict(
                            {
                                k: spaces.Box(
                                    0, 255, (render_size, render_size, 3), np.uint8
                                )
                                for k in ("front", "wrist")
                            }
                        ),
                    }
                )
            else:
                state_space["block_pos"] = spaces.Box(
                    -np.inf, np.inf, (3,), np.float32
                )
                self.observation_space = spaces.Dict(
                    {"state": spaces.Dict(state_space)}
                )
            self.action_space = spaces.Box(-1.0, 1.0, (4,), np.float32)

        def reset(self, *, seed: Optional[int] = None, options=None):
            if seed is not None:
                self._rng = jax.random.PRNGKey(seed)
            self._rng, key = jax.random.split(self._rng)
            self._state, obs = self._reset(key)
            return jax.tree.map(np.asarray, obs), {}

        def step(self, action):
            self._state, obs, reward, done, info = self._step(
                self._state, np.asarray(action, np.float32)
            )
            obs = jax.tree.map(np.asarray, obs)
            info = {k: np.asarray(v) for k, v in info.items()}
            # reference: terminated at the time limit, never truncated
            return obs, float(reward), bool(done > 0.5), False, info

        def render(self):
            from serl_tpu.envs.rendering import render_cameras

            front, wrist = jax.jit(render_cameras, static_argnums=1)(
                self._state.physics, self.render_size
            )
            return [np.asarray(front), np.asarray(wrist)]

    class FrankaTaskGymEnv(gym.Env):
        """Gym env exposing the reference real-robot `FrankaEnv` interface
        (`serl_robot_infra/franka_env/envs/franka_env.py:191-219` step /
        `_get_obs`) with the batched sim task env as the stand-in robot.

        Surface parity (post-Quat2EulerWrapper, the shape every reference
        example actually trains on):
          observation = {"state": {"tcp_pose" (6, xyz+euler), "tcp_vel" (3),
                         "gripper_pose" (1), "tcp_force" (3), "tcp_torque"
                         (3)}, "images": {...}}  (force/torque are zeros in
                         sim — the keys exist so actor code written against
                         the robot runs unchanged)
          action = Box(-1, 1, (7,)) delta-pose + gripper, scaled/clipped by
                   the task config exactly like FrankaEnv.step.

        An actor written against this class can drive a real FrankaEnv
        instead (same dict surface) while the learner side stays untouched —
        the "real robot can attach at the workload layer" path
        (examples/external_gym_actor.py demonstrates the full loop over the
        native transport)."""

        metadata = {"render_modes": ["rgb_array"], "render_fps": 10}

        def __init__(self, config=None, image_obs: bool = False,
                     render_size: int = 128, seed: int = 0):
            from serl_tpu.envs.tasks import (
                PEG_INSERT_CONFIG,
                PandaPoseTaskEnv,
            )

            self._env = PandaPoseTaskEnv(
                config=config or PEG_INSERT_CONFIG,
                image_obs=image_obs,
                render_size=render_size,
            )
            self._reset = jax.jit(self._env.reset)
            self._step = jax.jit(self._env.step)
            self._state = None
            self._rng = jax.random.PRNGKey(seed)
            self.image_obs = image_obs

            state_space = {
                "tcp_pose": spaces.Box(-np.inf, np.inf, (6,), np.float32),
                "tcp_vel": spaces.Box(-np.inf, np.inf, (3,), np.float32),
                "gripper_pose": spaces.Box(-np.inf, np.inf, (1,), np.float32),
                "tcp_force": spaces.Box(-np.inf, np.inf, (3,), np.float32),
                "tcp_torque": spaces.Box(-np.inf, np.inf, (3,), np.float32),
            }
            d = {"state": spaces.Dict(state_space)}
            if image_obs:
                d["images"] = spaces.Dict(
                    {
                        k: spaces.Box(
                            0, 255, (render_size, render_size, 3), np.uint8
                        )
                        for k in ("front", "wrist")
                    }
                )
            self.observation_space = spaces.Dict(d)
            self.action_space = spaces.Box(-1.0, 1.0, (7,), np.float32)

        def _franka_obs(self, obs):
            state = {
                "tcp_pose": np.asarray(obs["state"]["tcp_pose"], np.float32),
                "tcp_vel": np.asarray(obs["state"]["tcp_vel"], np.float32),
                "gripper_pose": np.asarray(
                    obs["state"]["gripper_pose"], np.float32
                ),
                "tcp_force": np.zeros(3, np.float32),
                "tcp_torque": np.zeros(3, np.float32),
            }
            out = {"state": state}
            if self.image_obs:
                out["images"] = {
                    k: np.asarray(v) for k, v in obs["images"].items()
                }
            return out

        def reset(self, *, seed: Optional[int] = None, options=None):
            if seed is not None:
                self._rng = jax.random.PRNGKey(seed)
            self._rng, key = jax.random.split(self._rng)
            self._state, obs = self._reset(key)
            return self._franka_obs(obs), {}

        def step(self, action):
            self._state, obs, reward, done, info = self._step(
                self._state, np.asarray(action, np.float32)
            )
            info = {k: np.asarray(v) for k, v in info.items()}
            return (
                self._franka_obs(obs),
                float(reward),
                bool(done > 0.5),
                False,
                info,
            )

    def register_envs():
        """Register PandaPickCube-v0 / PandaPickCubeVision-v0 like the
        reference franka_sim/__init__.py."""
        for name, kwargs in [
            ("PandaPickCube-v0", {"image_obs": False}),
            ("PandaPickCubeVision-v0", {"image_obs": True}),
        ]:
            try:
                gym.register(
                    id=name,
                    entry_point="serl_tpu.envs.gym_adapter:PandaPickCubeGymEnv",
                    max_episode_steps=100,
                    kwargs=kwargs,
                )
            except Exception:
                pass  # already registered
        # FrankaEnv-surface ids mirroring the reference registration
        # (serl_robot_infra/franka_env/__init__.py:4-31)
        for name, kwargs in [
            ("FrankaPegInsert-v0", {"image_obs": False}),
            ("FrankaPegInsert-Vision-v0", {"image_obs": True}),
        ]:
            try:
                gym.register(
                    id=name,
                    entry_point="serl_tpu.envs.gym_adapter:FrankaTaskGymEnv",
                    max_episode_steps=100,
                    kwargs=kwargs,
                )
            except Exception:
                pass

    register_envs()
