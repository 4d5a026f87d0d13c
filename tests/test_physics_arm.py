"""Oracle tests: batched arm kinematics/dynamics vs MuJoCo on the reference
scene. MuJoCo here is the *test oracle only* — the engine never calls it.

Covers FK (pinch site), Jacobians, CRBA mass matrix, RNEA bias forces.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from serl_tpu.envs.physics import arm
from serl_tpu.envs.physics import panda_model as pm

XML = "/root/reference/franka_sim/franka_sim/envs/xmls/arena.xml"


@pytest.fixture(scope="module")
def mj():
    m = mujoco.MjModel.from_xml_path(XML)
    d = mujoco.MjData(m)
    return m, d


def rand_q(rng):
    lo, hi = pm.JOINT_RANGE[:, 0], pm.JOINT_RANGE[:, 1]
    # stay away from extremes to avoid weird configs
    return lo + (hi - lo) * (0.2 + 0.6 * rng.random(7))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fk_matches_mujoco(mj, seed):
    m, d = mj
    rng = np.random.default_rng(seed)
    q = rand_q(rng)
    d.qpos[:] = 0
    d.qpos[:7] = q
    mujoco.mj_forward(m, d)
    sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "pinch")

    kin = arm.fk(jnp.asarray(q, jnp.float32))
    np.testing.assert_allclose(kin.pinch_pos, d.site_xpos[sid], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(kin.pinch_rmat), d.site_xmat[sid].reshape(3, 3), atol=2e-5
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_jacobian_matches_mujoco(mj, seed):
    m, d = mj
    rng = np.random.default_rng(seed)
    q = rand_q(rng)
    d.qpos[:] = 0
    d.qpos[:7] = q
    mujoco.mj_forward(m, d)
    sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "pinch")
    jacp = np.zeros((3, m.nv))
    jacr = np.zeros((3, m.nv))
    mujoco.mj_jacSite(m, d, jacp, jacr, sid)

    kin = arm.fk(jnp.asarray(q, jnp.float32))
    J = np.asarray(arm.point_jacobian(kin, kin.pinch_pos))  # (6,7) [w; v]
    np.testing.assert_allclose(J[:3], jacr[:, :7], atol=2e-5)
    np.testing.assert_allclose(J[3:], jacp[:, :7], atol=2e-5)


@pytest.mark.parametrize("seed", [0, 4])
def test_mass_matrix_matches_mujoco(mj, seed):
    m, d = mj
    rng = np.random.default_rng(seed)
    q = rand_q(rng)
    d.qpos[:] = 0
    d.qpos[:7] = q
    mujoco.mj_forward(m, d)
    M_full = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M_full)
    M_ref = M_full[:7, :7]

    kin = arm.fk(jnp.asarray(q, jnp.float32))
    M = np.asarray(arm.mass_matrix(kin))
    # composed-gripper approximation (fingers rigid at open pose) => small
    # discrepancy allowed
    np.testing.assert_allclose(M, M_ref, atol=2e-3)


@pytest.mark.parametrize("seed", [0, 5])
def test_bias_forces_match_mujoco(mj, seed):
    m, d = mj
    rng = np.random.default_rng(seed)
    q = rand_q(rng)
    qd = rng.standard_normal(7) * 0.5
    d.qpos[:] = 0
    d.qpos[:7] = q
    d.qvel[:] = 0
    d.qvel[:7] = qd
    mujoco.mj_forward(m, d)
    bias_ref = d.qfrc_bias[:7].copy()

    kin = arm.fk(jnp.asarray(q, jnp.float32))
    bias = np.asarray(arm.bias_forces(kin, jnp.asarray(qd, jnp.float32)))
    np.testing.assert_allclose(bias, bias_ref, atol=5e-2, rtol=1e-3)


def test_batched_fk_vmaps():
    qs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (16, 7)), jnp.float32
    )
    kin = jax.vmap(arm.fk)(qs)
    assert kin.pinch_pos.shape == (16, 3)
    assert kin.R.shape == (16, 8, 3, 3)
