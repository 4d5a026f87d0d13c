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

    register_envs()
