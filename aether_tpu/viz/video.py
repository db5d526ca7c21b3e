"""Video export with graceful backend fallback.

The reference writes mp4 via imageio+ffmpeg (``scripts/demo.py:484-520``). This
image ships imageio but no ffmpeg/pyav backend, so ``save_video`` tries mp4,
then GIF (pillow backend, always available), then a directory of PNG frames —
and reports which one it used.
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np


def _to_uint8(frames: np.ndarray) -> np.ndarray:
    frames = np.asarray(frames)
    if frames.dtype == np.uint8:
        return frames
    if frames.max() <= 1.0 + 1e-6:
        frames = frames * 255.0
    return np.clip(frames, 0, 255).astype(np.uint8)


def save_video(
    path: Union[str, os.PathLike],
    frames: np.ndarray,
    fps: int = 12,
) -> str:
    """Write (T, H, W, 3) frames to ``path``. Returns the path actually written
    (extension may change if the mp4 backend is unavailable)."""
    import imageio

    frames = _to_uint8(frames)
    path = str(path)

    if path.endswith(".mp4"):
        try:
            writer = imageio.get_writer(path, fps=fps)
            for frame in frames:
                writer.append_data(frame)
            writer.close()
            return path
        except Exception:
            path = path[: -len(".mp4")] + ".gif"

    if path.endswith(".gif"):
        try:
            imageio.mimsave(path, list(frames), duration=1000.0 / fps, loop=0)
            return path
        except Exception:
            path = path[: -len(".gif")]

    os.makedirs(path, exist_ok=True)
    for i, frame in enumerate(frames):
        imageio.imwrite(os.path.join(path, f"frame_{i:04d}.png"), frame)
    return path
