"""External gym-API actor attachment (VERDICT r4 item 7).

Proves the "real robot can attach at the workload layer" claim end to end:
an actor process written only against the reference FrankaEnv dict surface
(via `FrankaTaskGymEnv`) + the TrainerClient API pushes transitions to our
TrainerServer learner over the native transport, and params flow back.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests._ports import next_port_pair as _free_port

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def test_franka_gym_surface():
    """The stand-in robot env exposes the reference FrankaEnv dict surface."""
    gym = pytest.importorskip("gymnasium")
    import serl_tpu.envs.gym_adapter  # noqa: F401

    env = gym.make("FrankaPegInsert-v0")
    obs, info = env.reset(seed=0)
    assert set(obs["state"].keys()) == {
        "tcp_pose", "tcp_vel", "gripper_pose", "tcp_force", "tcp_torque"
    }
    assert obs["state"]["tcp_pose"].shape == (6,)
    assert env.action_space.shape == (7,)
    obs2, r, term, trunc, info = env.step(np.zeros(7, np.float32))
    assert isinstance(r, float)
    assert obs2["state"]["tcp_vel"].shape == (3,)


def test_external_actor_learner_end_to_end():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    common = [
        sys.executable,
        str(REPO / "examples" / "external_gym_actor.py"),
        "--port", str(port),
        "--batch_size", "32",
        "--critic_actor_ratio", "2",
        "--training_starts", "64",
    ]
    learner = subprocess.Popen(
        common + ["--learner", "--max_steps", "15"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO,
    )
    actor = subprocess.Popen(
        common + [
            "--actor", "--max_steps", "700", "--random_steps", "100",
            "--steps_per_update", "10",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO,
    )
    try:
        learner_out, _ = learner.communicate(timeout=420)
        actor_out, _ = actor.communicate(timeout=420)
    finally:
        for p in (learner, actor):
            if p.poll() is None:
                p.kill()
                p.communicate()

    assert learner.returncode == 0, f"learner failed:\n{learner_out[-4000:]}"
    assert actor.returncode == 0, f"actor failed:\n{actor_out[-4000:]}"
    assert "update 10" in learner_out, learner_out[-4000:]
    assert "actor done" in actor_out, actor_out[-4000:]
