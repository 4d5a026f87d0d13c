"""Chained forward/backward bin-relocation env: ONE env whose active task
flips at success, exactly the reference's reset-free fwbw structure.

Reference semantics being reproduced (the E6 workload's defining design):
  * `FWBWFrontCameraBinaryRewardClassifierWrapper.task_graph`
    (`/root/reference/serl_robot_infra/franka_env/envs/wrappers.py:36-44`):
    at episode end, if the active task's (classifier) success fired, the
    next task is the OTHER one; otherwise the same task retries.
  * `async_bin_relocation_fwbw_drq/async_drq_randomized.py:265-272`: on
    done the actor calls `env.set_task_id(env.task_graph(...))` then
    `env.reset()` — the ARM returns to the new task's reset pose but the
    CUBE is physical and stays wherever it was delivered/dropped. Both
    policies therefore train on the chained state distribution natively.
  * reward (and the switch) can be driven by learned per-task success
    classifiers on the front camera (`compute_reward`, wrappers.py:46-49),
    with ground truth kept only for evaluation.

TPU-native design: `task` is a traced int32 in the state pytree; success /
reward / task-graph / arm-only chained reset are all `jnp.where` selections
inside one jit step, so a batch of chained envs runs in lockstep with both
policies. Physics is task-independent (both tasks share the action scale,
safety box and bin walls), so each step runs ONE `engine.control_step`; the
two candidate reset states (chained arm-return vs full fresh reset) share
one settle scan.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from serl_tpu.envs.panda_pick import EnvState
from serl_tpu.envs.physics import engine
from serl_tpu.envs.tasks import BinRelocationEnv
from serl_tpu.envs.wrappers import euler_to_quat


class ChainedState(NamedTuple):
    env: EnvState
    task: jnp.ndarray  # () int32: 0 = forward, 1 = backward


class ChainedBinEnv:
    """Reset-free dual-task bin relocation (see module docstring).

    `classifier_fns`: optional (fw_fn, bw_fn), each mapping a front-camera
    image (H, W, C) uint8 -> logit. When set, sigmoid(logit) >= 0.5 drives
    reward, termination and the task switch (the reference's E6 training
    reward); ground-truth bin membership is still reported in
    info["success_gt"] so evaluation and diagnostics stay honest.
    """

    ACTION_DIM = 7

    def __init__(
        self,
        dense_shaping: bool = False,
        image_obs: bool = False,
        render_size: int = 128,
        fresh_reset_prob: float = 0.05,
        classifier_fns: Optional[Tuple] = None,
        classifier_threshold: float = 0.5,
    ):
        kw = dict(
            dense_shaping=dense_shaping,
            image_obs=image_obs,
            render_size=render_size,
        )
        self.fw = BinRelocationEnv(task_id=0, **kw)
        self.bw = BinRelocationEnv(task_id=1, **kw)
        self.image_obs = image_obs
        self.render_size = render_size
        self.dense_shaping = dense_shaping
        self.fresh_reset_prob = float(fresh_reset_prob)
        self.classifier_fns = classifier_fns
        # reference compute_reward uses sigmoid >= 0.5 (wrappers.py:46-49);
        # a RAISED threshold is the lever against per-step false positives:
        # a 100-step episode terminates (and flips the task graph) on the
        # FIRST positive, so the per-step FP rate must be << 1% — pick the
        # threshold from the classifier's measured FP curve, not by default
        self.classifier_threshold = float(classifier_threshold)

    @property
    def time_limit_steps(self) -> int:
        return self.fw.config.time_limit_steps

    # ------------------------------------------------------------------ #

    def reset(self, rng: jnp.ndarray, task: Optional[int] = None):
        """Full fresh reset. `task=None` draws the starting task uniformly
        (balances the two buffers from the first episodes)."""
        k_task, k_env = jax.random.split(rng)
        if task is None:
            t = jax.random.randint(k_task, (), 0, 2)
        else:
            t = jnp.asarray(task, jnp.int32)
        fw_state = self.fw._reset_state(k_env)
        bw_state = self.bw._reset_state(k_env)
        es = jax.tree.map(lambda a, b: jnp.where(t == 0, a, b), fw_state, bw_state)
        state = ChainedState(env=es, task=t)
        return state, self._obs(state)

    def _obs(self, state: ChainedState):
        # observation is task-independent (the policies are separate; the
        # reference's fw/bw policies each see the standard obs dict)
        return self.fw._obs(state.env)

    # ------------------------------------------------------------------ #

    def _success_pair(self, es: EnvState):
        """(driving_fw, driving_bw, gt_fw, gt_bw): the 'driving' pair is
        what reward / termination / the task graph run on — learned
        classifiers when provided, ground truth otherwise."""
        gt_fw = self.fw._success(es)
        gt_bw = self.bw._success(es)
        if self.classifier_fns is None:
            return gt_fw, gt_bw, gt_fw, gt_bw
        from serl_tpu.envs.rendering import render_cameras

        front, _ = render_cameras(es.physics, self.render_size)
        fw_fn, bw_fn = self.classifier_fns
        thr = self.classifier_threshold
        d_fw = (jax.nn.sigmoid(fw_fn(front)) >= thr).astype(jnp.float32)
        d_bw = (jax.nn.sigmoid(bw_fn(front)) >= thr).astype(jnp.float32)
        return jnp.squeeze(d_fw), jnp.squeeze(d_bw), gt_fw, gt_bw

    def _chain_or_fresh_reset(
        self, es: EnvState, next_task: jnp.ndarray, rng: jnp.ndarray
    ) -> EnvState:
        """Candidate post-episode state: the reference's reset — arm to the
        NEXT task's reset pose, gripper opened, cube untouched (chained) —
        or, when the cube got knocked out of the reachable region or with
        prob `fresh_reset_prob`, a full fresh reset (cube re-placed in the
        next task's source bin; the stand-in for the human who un-sticks the
        real rig). Both candidates share one 5-step settle scan."""
        fwc, bwc = self.fw.config, self.bw.config
        k_xy, k_cube, k_fresh, k_next = jax.random.split(rng, 4)

        reset_pose = jnp.where(
            next_task == 0,
            jnp.asarray(fwc.reset_pose, jnp.float32),
            jnp.asarray(bwc.reset_pose, jnp.float32),
        )
        dxy = jax.random.uniform(
            k_xy, (2,), minval=-fwc.random_xy_range, maxval=fwc.random_xy_range
        )
        mocap_pos = reset_pose[:3].at[:2].add(dxy)
        mocap_quat = euler_to_quat(reset_pose[3:])

        # chained candidate: current physics, arm retargeted, gripper open
        chained = es.physics._replace(
            mocap_pos=mocap_pos, mocap_quat=mocap_quat, grip_ctrl=jnp.zeros(())
        )

        # fresh candidate: re-initialized arm, cube placed below once the
        # (possibly re-drawn) fresh task is known
        jitter = jax.random.uniform(
            k_cube, (2,), minval=-0.038, maxval=0.038
        )
        fresh = engine.init_state(jnp.zeros(2))

        # "lost" = outside the zone the ARM can actually grasp in: the
        # safety box clips the mocap to x [0.38, 0.52], y [-0.23, 0.23]
        # (BinRelocationEnv config), so a cube ejected past that (grasps
        # near walls can squeeze it out at speed) is unrecoverable by any
        # policy and the chain would nudge it forever
        cube = es.physics.cube_pos
        lost = (
            (cube[0] < 0.383)
            | (cube[0] > 0.517)
            | (jnp.abs(cube[1]) > 0.226)
            | (cube[2] > 0.30)
            | (cube[2] < -0.05)
        )
        k_fresh, k_task = jax.random.split(k_fresh)
        use_fresh = lost | (
            jax.random.uniform(k_fresh) < self.fresh_reset_prob
        )
        # a fresh reset re-draws the task uniformly: without this a stream
        # that never succeeds would stay on one task forever and the other
        # buffer's ring for that stream would never fill
        out_task = jnp.where(
            use_fresh, jax.random.randint(k_task, (), 0, 2), next_task
        ).astype(jnp.int32)
        # re-aim the fresh candidate at the (possibly re-drawn) task: cube
        # in ITS source bin, arm at ITS reset pose
        fresh_pose = jnp.where(
            out_task == 0,
            jnp.asarray(fwc.reset_pose, jnp.float32),
            jnp.asarray(bwc.reset_pose, jnp.float32),
        )
        fresh_src = jnp.where(out_task == 0, self.fw.BW_BIN, self.fw.FW_BIN)
        fresh = fresh._replace(
            mocap_pos=fresh_pose[:3].at[:2].add(dxy),
            mocap_quat=euler_to_quat(fresh_pose[3:]),
            cube_pos=jnp.concatenate([fresh_src + jitter, jnp.asarray([0.02])]),
            cube_linvel=jnp.zeros(3),
            cube_angvel=jnp.zeros(3),
        )
        phys = jax.tree.map(
            lambda f, c: jnp.where(use_fresh, f, c), fresh, chained
        )

        def settle(p, _):
            return engine.control_step(p, self.fw.obstacles), None

        phys, _ = jax.lax.scan(settle, phys, None, length=5)
        reset_es = es._replace(
            physics=phys,
            t=jnp.zeros((), jnp.int32),
            rng=k_next,
            ep_id=es.ep_id + 1,
            z_init=jnp.asarray(0.02),
        )
        return reset_es, out_task

    # ------------------------------------------------------------------ #

    def step_auto_reset(self, state: ChainedState, action: jnp.ndarray):
        """One chained control step with in-graph task graph + auto reset.

        Returns (state, obs, reward, done, info); info carries:
          success      — DRIVING success of the active task (what reward /
                         the switch ran on; classifier when configured)
          success_gt   — ground-truth success of the active task
          task         — the task that owned this step (routes the
                         transition to the fw or bw buffer)
          switched     — episode ended with a task flip
          final_obs    — pre-reset terminal observation
        """
        es, task = state.env, state.task
        new_es, gripper_moved = self.fw._apply_action(es, action)

        d_fw, d_bw, gt_fw, gt_bw = self._success_pair(new_es)
        success = jnp.where(task == 0, d_fw, d_bw)
        success_gt = jnp.where(task == 0, gt_fw, gt_bw)

        rew_fw = self.fw._reward(new_es, d_fw, gripper_moved)
        rew_bw = self.bw._reward(new_es, d_bw, gripper_moved)
        reward = jnp.where(task == 0, rew_fw, rew_bw)

        done = (new_es.t >= self.time_limit_steps).astype(jnp.float32)
        if not self.dense_shaping:
            done = jnp.maximum(done, success)

        # task graph (wrappers.py:36-44): flip on success, else retry
        next_task = jnp.where(success > 0.5, 1 - task, task).astype(jnp.int32)

        reset_es, reset_task = self._chain_or_fresh_reset(
            new_es, next_task, jax.random.fold_in(es.rng, es.ep_id)
        )
        is_done = done > 0.5
        out_es = jax.tree.map(
            lambda a, b: jnp.where(is_done, b, a), new_es, reset_es
        )
        out_state = ChainedState(
            env=out_es, task=jnp.where(is_done, reset_task, task)
        )
        info = {
            "success": success,
            "success_gt": success_gt,
            "task": task,
            "switched": is_done & (next_task != task),
            "final_obs": self.fw._obs(new_es),
        }
        return out_state, self._obs(out_state), reward, done, info
