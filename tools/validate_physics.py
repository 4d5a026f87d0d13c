"""Trajectory-level physics validation vs MuJoCo (VERDICT r3 #7 / SURVEY
§7.2): replay identical action traces through the REFERENCE stack (MuJoCo C
engine + reference opspace, driven by the reference's own
`PandaPickCubeGymEnv.step`, panda_pick_gym_env.py:176-223) and through our
batched XLA engine from matched initial states, and report tcp/cube
trajectory divergence plus outcome (grasp-and-lift success) agreement.

The contact model only has to be *behaviorally* equivalent — SURVEY §7.2
asks for qualitative parity (grasp transfers, learning curves match), not
bit-identical trajectories; the two integrators/contact solvers differ by
construction. This tool quantifies exactly how far apart they are, phase by
phase.

Traces:
  * scripted pick expert (approach -> descend -> close -> lift), recorded
    from OUR env and replayed open-loop in both engines;
  * smooth random-walk actions (no grasp), exercising free-space tracking.

Run (CPU): JAX_PLATFORMS=cpu python tools/validate_physics.py
Writes docs/physics_validation.md.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def _install_gym_alias():
    """The reference imports legacy `gym`; alias gymnasium (API-compatible
    surface for env definition: gym.Env, gym.spaces)."""
    import gymnasium

    # the reference ctor unconditionally builds a MujocoRenderer and renders
    # once (panda_pick_gym_env.py:142-148); no GL exists headless and only
    # the physics is under test — replace it with a no-op. Import BEFORE the
    # gym alias so submodule resolution is unpolluted.
    import gymnasium.envs.mujoco.mujoco_rendering as mr

    sys.modules.setdefault("gym", gymnasium)
    sys.modules.setdefault("gym.spaces", gymnasium.spaces)

    class _NoopRenderer:
        def __init__(self, *a, **k):
            pass

        def render(self, *a, **k):
            return None

        def close(self):
            pass

    mr.MujocoRenderer = _NoopRenderer


def _install_dm_robotics_stub():
    """Textbook quaternion helpers for the three symbols the reference
    opspace uses (dm_robotics.transformations: mat_to_quat wxyz,
    quat_diff_active = target * conj(source), quat_to_axisangle)."""
    import types

    from scipy.spatial.transform import Rotation

    def mat_to_quat(mat):
        q = Rotation.from_matrix(np.asarray(mat).reshape(3, 3)).as_quat()
        return np.asarray([q[3], q[0], q[1], q[2]])  # xyzw -> wxyz

    def _conj(q):
        return np.asarray([q[0], -q[1], -q[2], -q[3]])

    def _mul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.asarray(
            [
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ]
        )

    def quat_diff_active(source_quat, target_quat):
        return _mul(np.asarray(target_quat), _conj(np.asarray(source_quat)))

    def quat_to_axisangle(q):
        q = np.asarray(q) / np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        angle = 2.0 * np.arccos(np.clip(q[0], -1.0, 1.0))
        s = np.sqrt(max(1.0 - q[0] * q[0], 1e-16))
        if s < 1e-8:
            return np.zeros(3)
        return (q[1:] / s) * angle

    tr = types.ModuleType("dm_robotics.transformations.transformations")
    tr.mat_to_quat = mat_to_quat
    tr.quat_diff_active = quat_diff_active
    tr.quat_to_axisangle = quat_to_axisangle
    pkg = types.ModuleType("dm_robotics")
    tf = types.ModuleType("dm_robotics.transformations")
    tf.transformations = tr
    pkg.transformations = tf
    sys.modules.setdefault("dm_robotics", pkg)
    sys.modules.setdefault("dm_robotics.transformations", tf)
    sys.modules.setdefault("dm_robotics.transformations.transformations", tr)


_CURRENT_DATA = [None]  # MjData of the env being stepped (single-threaded)


def _install_mj_fullM_shim():
    """The reference pins mujoco 2.3.7 whose mj_fullM took (model, dst, qM);
    the installed mujoco wants (model, data, dst). Shim the old convention
    using the MjData of the env currently being stepped."""
    import mujoco

    real = mujoco.mj_fullM

    def shim(model, a, b=None):
        try:
            return real(model, a, b)
        except TypeError:
            # old convention: a == dst (nv, nv), b == data.qM
            return real(model, _CURRENT_DATA[0], a)

    mujoco.mj_fullM = shim


_REF_ENV_CLS = [None]


def make_reference_env(block_xy):
    # one-time setup: the alias/stub installs and the franka_sim import must
    # run exactly once (re-running the aliased import machinery on a second
    # call trips submodule resolution under the gym alias)
    if _REF_ENV_CLS[0] is None:
        _install_gym_alias()
        _install_dm_robotics_stub()
        _install_mj_fullM_shim()
        sys.path.insert(0, "/root/reference/franka_sim")
        from franka_sim.envs.panda_pick_gym_env import PandaPickCubeGymEnv

        _REF_ENV_CLS[0] = PandaPickCubeGymEnv

    env = _REF_ENV_CLS[0](action_scale=(0.1, 1))
    env.reset()
    # pin the block to the requested xy (reset samples it from global RNG)
    import mujoco

    env._data.jnt("block").qpos[:3] = (*block_xy, env._block_z)
    mujoco.mj_forward(env._model, env._data)
    env._z_init = env._data.sensor("block_pos").data[2]
    env._z_success = env._z_init + 0.2
    return env


def run_reference(env, actions):
    _CURRENT_DATA[0] = env._data
    tcp, cube = [], []
    for a in actions:
        env.step(np.asarray(a, np.float64))
        tcp.append(env._data.sensor("2f85/pinch_pos").data.copy())
        cube.append(env._data.sensor("block_pos").data.copy())
    return np.asarray(tcp), np.asarray(cube)


def run_ours(block_xy, actions):
    import jax
    import jax.numpy as jnp

    from serl_tpu.envs.panda_pick import PandaPickCubeEnv
    from serl_tpu.envs.physics import engine

    env = PandaPickCubeEnv()
    state, _ = env.reset(jax.random.PRNGKey(0))
    phys = engine.init_state(jnp.asarray(block_xy, jnp.float32))
    state = state._replace(physics=phys, z_init=phys.cube_pos[2])

    step = jax.jit(env.step)
    tcp, cube = [], []
    for a in actions:
        state, obs, r, d, info = step(state, jnp.asarray(a, jnp.float32))
        t, _, c = engine.observe(state.physics)
        tcp.append(np.asarray(t))
        cube.append(np.asarray(c))
    return np.asarray(tcp), np.asarray(cube)


def expert_trace(block_xy, steps=80):
    """Record the scripted pick expert's actions on OUR env (open-loop
    replay candidates for both engines)."""
    import jax
    import jax.numpy as jnp

    from serl_tpu.envs.panda_pick import PandaPickCubeEnv
    from serl_tpu.envs.physics import engine
    from serl_tpu.envs.scripted_expert import expert_action

    env = PandaPickCubeEnv()
    state, _ = env.reset(jax.random.PRNGKey(0))
    phys = engine.init_state(jnp.asarray(block_xy, jnp.float32))
    state = state._replace(physics=phys, z_init=phys.cube_pos[2])
    step = jax.jit(env.step)
    acts = []
    for _ in range(steps):
        a = np.asarray(expert_action(state))
        acts.append(a)
        state, *_ = step(state, jnp.asarray(a))
    return np.asarray(acts)


def random_trace(seed, steps=60):
    rng = np.random.default_rng(seed)
    a = np.zeros(4)
    out = []
    for _ in range(steps):
        a = 0.8 * a + 0.4 * rng.normal(size=4)
        a = np.clip(a, -1, 1)
        a[3] = -1.0  # keep the gripper open: free-space tracking trace
        out.append(a.copy())
    return np.asarray(out)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    rows = []
    traces = [
        ("expert_pick_xy(0.5,0.0)", (0.5, 0.0), expert_trace((0.5, 0.0))),
        ("expert_pick_xy(0.35,0.15)", (0.35, 0.15), expert_trace((0.35, 0.15))),
        ("expert_pick_xy(0.45,-0.2)", (0.45, -0.2), expert_trace((0.45, -0.2))),
        ("random_freespace_s1", (0.5, 0.0), random_trace(1)),
        ("random_freespace_s2", (0.4, 0.1), random_trace(2)),
    ]
    for name, bxy, acts in traces:
        ref_env = make_reference_env(bxy)
        tcp_r, cube_r = run_reference(ref_env, acts)
        tcp_o, cube_o = run_ours(bxy, acts)
        d_tcp = np.linalg.norm(tcp_r - tcp_o, axis=-1)
        d_cube = np.linalg.norm(cube_r - cube_o, axis=-1)
        lift_r = cube_r[-1, 2] - cube_r[0, 2]
        lift_o = cube_o[-1, 2] - cube_o[0, 2]
        succ_r = lift_r > 0.2
        succ_o = lift_o > 0.2
        rows.append(
            dict(
                name=name,
                tcp_rmse=float(np.sqrt((d_tcp**2).mean())),
                tcp_max=float(d_tcp.max()),
                cube_rmse=float(np.sqrt((d_cube**2).mean())),
                cube_max=float(d_cube.max()),
                lift_ref=float(lift_r),
                lift_ours=float(lift_o),
                agree=bool(succ_r == succ_o),
            )
        )
        print(
            f"{name}: tcp_rmse {rows[-1]['tcp_rmse']*100:.1f} cm "
            f"cube_rmse {rows[-1]['cube_rmse']*100:.1f} cm "
            f"lift ref/ours {lift_r:.3f}/{lift_o:.3f} agree={rows[-1]['agree']}",
            flush=True,
        )

    agree = sum(r["agree"] for r in rows)
    doc = [
        "# Physics validation: XLA engine vs MuJoCo (trajectory replay)",
        "",
        "Generated by `tools/validate_physics.py`: identical open-loop action",
        "traces replayed through the reference stack (MuJoCo C engine +",
        "reference opspace, driven by the reference's own `PandaPickCubeGymEnv"
        ".step`) and our batched XLA engine from matched initial states.",
        "",
        "The engines integrate contacts differently by construction (MuJoCo's",
        "convex solver vs our compliant point-contact model), so open-loop",
        "traces DIVERGE after contact — the validation criterion (SURVEY §7.2)",
        "is qualitative: free-space tracking stays close, and the grasp-and-",
        "lift OUTCOME agrees, which is what transfers to learning curves",
        "(both recipes train to success; see results/RESULTS.md).",
        "",
        "| trace | tcp RMSE (cm) | tcp max | cube RMSE (cm) | cube max |"
        " lift ref (m) | lift ours (m) | outcome agree |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        doc.append(
            f"| {r['name']} | {r['tcp_rmse']*100:.1f} | {r['tcp_max']*100:.1f} "
            f"| {r['cube_rmse']*100:.1f} | {r['cube_max']*100:.1f} "
            f"| {r['lift_ref']:.3f} | {r['lift_ours']:.3f} | {r['agree']} |"
        )
    doc += [
        "",
        f"Outcome agreement: {agree}/{len(rows)} traces.",
        "",
        "Complementary quantitative anchors (tests/test_physics_arm.py):",
        "FK / Jacobian / mass matrix / bias forces are oracle-checked against",
        "MuJoCo to ~1e-3 tolerances; this file covers the *closed-loop",
        "contact* behavior those unit oracles cannot.",
    ]
    out = REPO / "docs" / "physics_validation.md"
    out.write_text("\n".join(doc) + "\n")
    print(f"wrote {out} (outcome agreement {agree}/{len(rows)})")


if __name__ == "__main__":
    main()
