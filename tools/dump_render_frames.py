"""Visual sanity check of the in-graph raycaster (VERDICT round-1 item 1a).

Rolls the scripted expert through one PandaPickCube episode (one scanned,
jit-compiled rollout — a single device dispatch) and saves front/wrist frames
at approach / grasp / lift moments as PNGs, so a human can confirm the cube,
gripper, and lift progress are visually distinguishable in the rendered
observations the DrQ agent trains on.

Usage: python tools/dump_render_frames.py [outdir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from serl_tpu.envs.panda_pick import PandaPickCubeEnv
from serl_tpu.envs.scripted_expert import expert_action

SNAP_TS = (0, 10, 25, 40, 60, 80, 99)


def main():
    outdir = Path(sys.argv[1] if len(sys.argv) > 1 else "results/render_frames")
    outdir.mkdir(parents=True, exist_ok=True)

    env = PandaPickCubeEnv(image_obs=True)

    @jax.jit
    def rollout(key):
        state, obs = env.reset(key)

        def body(carry, t):
            state = carry
            a = expert_action(state, None, 0.0)
            state, obs, r, d, info = env.step(state, a)
            out = {
                "front": obs["images"]["front"],
                "wrist": obs["images"]["wrist"],
                "reward": r,
                "cube_z": state.physics.cube_pos[2],
                "success": info["success"],
            }
            return state, out

        state, outs = jax.lax.scan(body, state, jnp.arange(100))
        return outs

    outs = jax.tree.map(np.asarray, rollout(jax.random.PRNGKey(3)))
    print(
        f"episode final reward={outs['reward'][-1]:.3f} "
        f"success={outs['success'].max():.0f} max_cube_z={outs['cube_z'].max():.3f}"
    )

    try:
        from PIL import Image

        for t in SNAP_TS:
            combo = np.concatenate([outs["front"][t], outs["wrist"][t]], axis=1)
            Image.fromarray(combo).save(
                outdir / f"t{t:03d}_r{outs['reward'][t]:.2f}_z{outs['cube_z'][t]:.3f}.png"
            )
        print(f"wrote {len(SNAP_TS)} frames to {outdir}")
    except ImportError:
        np.savez(
            outdir / "frames.npz",
            **{f"t{t}": np.stack([outs["front"][t], outs["wrist"][t]]) for t in SNAP_TS},
        )
        print(f"PIL unavailable; wrote frames.npz to {outdir}")


if __name__ == "__main__":
    main()
