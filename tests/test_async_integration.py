"""Two-process async actor/learner integration test.

Runs `examples/async_sac_state_sim.py --learner` and `--actor` as real
subprocesses talking over the native C++ transport on localhost (the
deployment shape of the reference's `examples/async_sac_state_sim/
async_sac_state_sim.py:79-235` + tmux_launch.sh), on the CPU backend, and
asserts the full data path works end to end: actor transitions reach the
learner's replay store, the learner trains and broadcasts params, and both
processes exit cleanly.
"""

import os
import subprocess
import sys
from pathlib import Path

from tests._ports import next_port_pair as _free_port

REPO = Path(__file__).resolve().parent.parent


def test_async_actor_learner_end_to_end(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single-device CPU is fine (and faster)

    common = [
        sys.executable,
        str(REPO / "examples" / "async_sac_state_sim.py"),
        "--port",
        str(port),
        "--batch_size",
        "32",
        "--critic_actor_ratio",
        "2",
        "--training_starts",
        "64",
    ]
    learner = subprocess.Popen(
        common + ["--learner", "--max_steps", "15", "--log_period", "5"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=REPO,
    )
    actor = subprocess.Popen(
        common
        + [
            "--actor",
            "--max_steps",
            "900",
            "--random_steps",
            "100",
            "--steps_per_update",
            "10",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=REPO,
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
    # learner actually trained on actor-pushed data
    assert "update 10" in learner_out, learner_out[-4000:]
    assert "buffer" in learner_out
    # actor made env progress
    assert "actor step" in actor_out, actor_out[-4000:]


def test_async_drq_pixels_end_to_end(tmp_path):
    """Pixel (DrQ) two-process variant: image transitions cross the wire,
    the learner runs augmented high-UTD updates on them (reference E2,
    examples/async_drq_sim/async_drq_sim.py). Small images + tiny cadence
    keep it CPU-fast."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    common = [
        sys.executable,
        str(REPO / "examples" / "async_drq_sim.py"),
        "--port",
        str(port),
        "--image_size",
        "32",
        "--batch_size",
        "16",
        "--critic_actor_ratio",
        "2",
        "--training_starts",
        "48",
    ]
    learner = subprocess.Popen(
        common + ["--learner", "--max_steps", "6", "--log_period", "2",
                  "--publish_period", "2"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=REPO,
    )
    actor = subprocess.Popen(
        common
        + [
            "--actor",
            "--max_steps",
            "400",
            "--random_steps",
            "150",
            "--steps_per_update",
            "10",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=REPO,
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
    assert "update 4" in learner_out, learner_out[-4000:]
    assert "actor step" in actor_out, actor_out[-4000:]
