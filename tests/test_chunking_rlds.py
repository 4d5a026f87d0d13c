"""Action-chunk execution (reference ChunkingWrapper act_exec_horizon) and
the TF-free RLDS interop bridge."""

import numpy as np
import jax
import jax.numpy as jnp

from serl_tpu.data import rlds
from serl_tpu.data.replay_buffer import ReplayBuffer
from serl_tpu.envs.panda_pick import PandaPickCubeEnv
from serl_tpu.envs.wrappers import act_exec_step


class TestActExecHorizon:
    def test_chunk_executes_sequentially(self):
        env = PandaPickCubeEnv()
        state, obs = env.reset(jax.random.PRNGKey(0))
        # a 4-step chunk of identical small motions must advance the clock
        # by 4 and move the mocap ~4x one step's worth
        chunk = jnp.tile(jnp.asarray([[0.1, 0.0, 0.0, 0.0]]), (4, 1))
        s1, obs1, r1, d1, info1 = jax.jit(
            lambda s, a: act_exec_step(env, s, a)
        )(state, chunk)
        assert int(s1.t) == 4
        # compare against 4 manual steps
        s2 = state
        for i in range(4):
            s2, o2, r2, d2, i2 = env.step(s2, chunk[i])
        np.testing.assert_allclose(
            np.asarray(s1.physics.mocap_pos),
            np.asarray(s2.physics.mocap_pos), atol=1e-6,
        )
        # final reward matches the last sub-step's (reference semantics)
        np.testing.assert_allclose(float(r1), float(r2), atol=1e-6)

    def test_done_is_or_over_chunk(self):
        env = PandaPickCubeEnv()
        state, _ = env.reset(jax.random.PRNGKey(1))
        state = state._replace(t=jnp.asarray(98, jnp.int32))
        chunk = jnp.zeros((4, 4))
        _, _, _, done, _ = act_exec_step(env, state, chunk)
        assert float(done) == 1.0  # time limit hit mid-chunk is not lost


class TestRLDSBridge:
    def _transitions(self, n=12, obs_dim=3):
        rng = np.random.RandomState(0)
        return {
            "observations": rng.randn(n, obs_dim).astype(np.float32),
            "actions": rng.randn(n, 2).astype(np.float32),
            "rewards": rng.rand(n).astype(np.float32),
            "masks": np.asarray([1.0] * (n - 1) + [0.0], np.float32),
            "dones": np.asarray([0.0] * 5 + [1.0] + [0.0] * 5 + [1.0],
                                np.float32),
        }

    def test_example_codec_roundtrip(self):
        feats = {
            "f": np.asarray([1.5, -2.25], np.float32),
            "i": np.asarray([3, -7, 1 << 40], np.int64),
            "b": b"\x00\x01\xffhello",
        }
        dec = rlds.decode_example(rlds.encode_example(feats))
        np.testing.assert_allclose(dec["f"], feats["f"])
        np.testing.assert_array_equal(dec["i"], feats["i"])
        assert dec["b"][0] == feats["b"]

    def test_tfrecord_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.tfrecord")
        recs = [b"abc", b"", bytes(range(256))]
        rlds.write_tfrecord(path, recs)
        assert list(rlds.read_tfrecord(path, verify_crc=True)) == recs

    def test_flat_transitions_roundtrip(self, tmp_path):
        path = str(tmp_path / "d.tfrecord")
        tr = self._transitions()
        ep_ids = np.asarray([0] * 6 + [1] * 6, np.int32)
        n = rlds.export_rlds(path, tr, ep_ids)
        assert n == 12
        back = rlds.import_rlds(path)
        np.testing.assert_allclose(back["observations"], tr["observations"],
                                   rtol=1e-6)
        np.testing.assert_allclose(back["actions"], tr["actions"], rtol=1e-6)
        np.testing.assert_allclose(back["rewards"], tr["rewards"], rtol=1e-6)
        np.testing.assert_array_equal(back["masks"], tr["masks"])
        np.testing.assert_array_equal(back["ep_ids"], ep_ids)

    def test_pixel_obs_roundtrip_and_buffer_load(self, tmp_path):
        path = str(tmp_path / "px.tfrecord")
        rng = np.random.RandomState(1)
        n = 8
        tr = {
            "observations": {
                "state": rng.randn(n, 4).astype(np.float32),
                "front": rng.randint(0, 255, (n, 16, 16, 3), np.uint8),
            },
            "actions": rng.randn(n, 2).astype(np.float32),
            "rewards": np.zeros(n, np.float32),
            "masks": np.ones(n, np.float32),
            "dones": np.zeros(n, np.float32),
        }
        ep_ids = np.zeros(n, np.int32)
        rlds.export_rlds(path, tr, ep_ids)
        back = rlds.import_rlds(path)
        np.testing.assert_array_equal(
            back["observations"]["front"], tr["observations"]["front"]
        )
        np.testing.assert_allclose(
            back["observations"]["state"], tr["observations"]["state"],
            rtol=1e-6,
        )
        # straight into the HBM buffer (the reference's preload_rlds_path)
        ex = {
            "observations": {
                "state": jnp.zeros(4), "front": jnp.zeros((16, 16, 3),
                                                          jnp.uint8),
            },
            "actions": jnp.zeros(2),
            "rewards": jnp.zeros(()),
            "masks": jnp.zeros(()),
            "dones": jnp.zeros(()),
        }
        rb = ReplayBuffer(ex, capacity=8, store_next_obs=False,
                          image_keys=("front",))
        st = rb.init_state(streams=4)
        st = rb.load_transitions(st, back)
        assert int(st.size) == 2  # 8 rows / 4 streams
        batch = rb.sample(st, jax.random.PRNGKey(0), 8)
        assert batch["observations"]["front"].shape == (8, 1, 16, 16, 3)

    def test_external_file_needs_image_spec(self, tmp_path):
        """A file without _shape sidecars (external writer) decodes via
        image_spec."""
        path = str(tmp_path / "ext.tfrecord")
        img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
        recs = [rlds.encode_example({
            "observation/cam": img.tobytes(),
            "action": np.zeros(2, np.float32),
            "reward": np.zeros(1, np.float32),
            "is_first": np.asarray([1]),
            "is_last": np.asarray([1]),
            "is_terminal": np.asarray([0]),
        })]
        rlds.write_tfrecord(path, recs)
        back = rlds.import_rlds(path, image_spec={"cam": (3, 3, 3)})
        np.testing.assert_array_equal(back["observations"]["cam"][0], img)
