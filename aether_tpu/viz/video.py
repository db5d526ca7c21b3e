"""Video export with graceful backend fallback.

The reference writes mp4 via imageio+ffmpeg (``scripts/demo.py:484-520``). This
image ships imageio but no ffmpeg/pyav backend, so ``save_video`` tries mp4,
then MJPEG-in-AVI (a dependency-free RIFF muxer below + PIL's native JPEG
encoder — true-color video every mainstream player opens), then GIF, then a
directory of PNG frames — and reports which one it used.
"""

from __future__ import annotations

import os
import struct
from typing import Union

import numpy as np


def write_mjpeg_avi(
    path: Union[str, os.PathLike],
    frames: np.ndarray,
    fps: int = 12,
    quality: int = 90,
) -> str:
    """Write (T, H, W, 3) uint8 frames as an MJPEG AVI (RIFF) file.

    Pure-stdlib container muxing; per-frame JPEG encoding via PIL (native C).
    Replaces the reference's ffmpeg mp4 path on ffmpeg-less machines with a
    real video artifact instead of a 256-color GIF.
    """
    import io

    from PIL import Image

    frames = _to_uint8(frames)
    t, h, w = frames.shape[:3]
    jpegs = []
    for frame in frames:
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        jpegs.append(data)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        t, 0, 1,  # totalframes, initialframes, streams
        max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, t,
                      max_size, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    idx, offset = [], 4  # offsets relative to the start of 'movi' fourcc
    for j in jpegs:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(j)))
        offset += 8 + len(j)
    idx1 = chunk(b"idx1", b"".join(idx))

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return str(path)


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
            path = path[: -len(".mp4")] + ".avi"

    if path.endswith(".avi"):
        try:
            return write_mjpeg_avi(path, frames, fps=fps)
        except Exception:
            path = path[: -len(".avi")] + ".gif"

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
