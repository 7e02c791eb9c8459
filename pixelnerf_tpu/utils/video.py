"""Video writing with graceful backend fallback.

imageio's mp4 path requires an ffmpeg plugin that may be absent offline;
fall back to GIF (always available via Pillow) keeping the caller's basename.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

__all__ = ["write_video"]


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 30,
                quality: int = 8) -> str:
    """Write frames (T, H, W, 3) uint8; returns the actual path written."""
    import imageio.v2 as imageio

    frames = np.asarray(frames)
    if path.endswith(".gif"):
        imageio.mimwrite(path, frames, fps=fps)
        return path
    try:
        imageio.mimwrite(path, frames, fps=fps, quality=quality)
        return path
    except Exception:
        gif_path = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif_path, frames, fps=fps)
        print(f"WARN: mp4 writer unavailable; wrote {gif_path} instead")
        return gif_path
