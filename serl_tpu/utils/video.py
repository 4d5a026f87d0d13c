"""Episode video recording.

Capability parity: reference `serl_launcher/wrappers/video_recorder.py`
(VideoRecorder wrapper + `compose_frames` grid :13-177) and FrankaEnv's
recording path. Without ffmpeg/cv2 in this image, episodes are saved as
animated GIFs (PIL) and/or raw .npz frame stacks — both consumable by the
logger.
"""

from typing import List, Optional

import numpy as np


def compose_frames(frame_lists: List[List[np.ndarray]], cols: int = 2):
    """Tile multiple camera streams into one frame sequence (reference
    compose_frames)."""
    n_streams = len(frame_lists)
    length = min(len(f) for f in frame_lists)
    rows = (n_streams + cols - 1) // cols
    out = []
    for t in range(length):
        frames = [np.asarray(f[t]) for f in frame_lists]
        h, w = frames[0].shape[:2]
        canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
        for i, fr in enumerate(frames):
            r, c = divmod(i, cols)
            canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = fr
        out.append(canvas)
    return out


class VideoRecorder:
    """Collect frames and flush to GIF/NPZ."""

    def __init__(self, save_dir: str, fps: int = 20):
        import os

        self.save_dir = save_dir
        self.fps = fps
        os.makedirs(save_dir, exist_ok=True)
        self.frames: List[np.ndarray] = []

    def record(self, frame: np.ndarray):
        self.frames.append(np.asarray(frame))

    def save(self, name: str, as_gif: bool = True) -> Optional[str]:
        import os

        if not self.frames:
            return None
        path = os.path.join(self.save_dir, name)
        if as_gif:
            from PIL import Image

            imgs = [Image.fromarray(f) for f in self.frames]
            path += ".gif"
            imgs[0].save(
                path,
                save_all=True,
                append_images=imgs[1:],
                duration=int(1000 / self.fps),
                loop=0,
            )
        else:
            path += ".npz"
            np.savez_compressed(path, frames=np.stack(self.frames))
        self.frames = []
        return path


def record_eval_episode(env, agent, rng, render_size: int = 128):
    """Roll one deterministic episode and return composed frames
    (front|wrist)."""
    import jax

    from serl_tpu.envs.panda_pick import flatten_obs
    from serl_tpu.envs.rendering import render_cameras

    render = jax.jit(lambda p: render_cameras(p, render_size))
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    state, obs = reset(rng)
    fronts, wrists = [], []
    for _ in range(100):
        f, w = render(state.physics)
        fronts.append(np.asarray(f))
        wrists.append(np.asarray(w))
        action = agent.sample_actions(flatten_obs(obs)[None], argmax=True)[0]
        state, obs, r, d, info = step(state, action)
        if float(d) > 0.5:
            break
    return compose_frames([fronts, wrists])
