"""Pinhole camera ray casting and (un)projection, vectorized in jax.numpy.

Semantics match reference ``aether/utils/postprocess_utils.py``:
- ``get_rays``        (:104-144)  pixel-center rays in world space from c2w poses
- ``get_intrinsics``  (:147-161)  shared-focal pinhole K
- ``fov_to_focal``    (:97-101)
- ``get_pixel`` / ``project`` (:381-403) unprojection of a depth map to world points
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = Union[jnp.ndarray, np.ndarray]


def fov_to_focal(fovx: Array, fovy: Array, h: int, w: int) -> jnp.ndarray:
    """Average focal from half-angle FoVs (note: fov args are half-angles in radians)."""
    focal_x = w * 0.5 / jnp.tan(jnp.asarray(fovx))
    focal_y = h * 0.5 / jnp.tan(jnp.asarray(fovy))
    return (focal_x + focal_y) / 2.0


def get_intrinsics(
    batch_size: int,
    h: int,
    w: int,
    fovx: Optional[Array] = None,
    fovy: Optional[Array] = None,
    focal: Optional[Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (B, 3, 3) shared-focal intrinsics; returns (K, focal)."""
    if focal is None:
        focal = fov_to_focal(fovx, fovy, h, w)
    focal = jnp.broadcast_to(jnp.asarray(focal, dtype=jnp.float32), (batch_size,))
    K = jnp.zeros((batch_size, 3, 3), dtype=jnp.float32)
    K = K.at[:, 0, 0].set(focal)
    K = K.at[:, 1, 1].set(focal)
    K = K.at[:, 0, 2].set(w * 0.5)
    K = K.at[:, 1, 2].set(h * 0.5)
    K = K.at[:, 2, 2].set(1.0)
    return K, focal


def get_rays(
    pose: Array,
    h: int,
    w: int,
    focal: Optional[Array] = None,
    fovx: Optional[Array] = None,
    fovy: Optional[Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cast pixel-center rays for a batch of c2w poses.

    Camera dirs use (x - cx + 0.5)/f, (y - cy + 0.5)/f, 1 then rotate by R (c2w).
    Returns (rays_o [T,h,w,3], rays_d [T,h,w,3], intrinsics [T,3,3]).
    """
    pose = jnp.asarray(pose, dtype=jnp.float32)
    t = pose.shape[0]
    intrinsics, focal = get_intrinsics(t, h, w, fovx, fovy, focal)

    x = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, w)
    y = jnp.arange(h, dtype=jnp.float32)[:, None]  # (h, 1)
    cx, cy = w * 0.5, h * 0.5
    f = focal[:, None, None]  # (t, 1, 1)
    dirs_x = (x - cx + 0.5)[None] / f  # (t, 1, w)
    dirs_y = (y - cy + 0.5)[None] / f  # (t, h, 1)
    dirs_z = jnp.ones((t, h, w), dtype=jnp.float32)
    dirs_x, dirs_y = (jnp.broadcast_to(d, (t, h, w)) for d in (dirs_x, dirs_y))
    camera_dirs = jnp.stack([dirs_x, dirs_y, dirs_z], axis=-1)  # (t, h, w, 3)

    # world dirs: d_world = R @ d_cam  (einsum over camera axis)
    rays_d = jnp.einsum("tij,thwj->thwi", pose[:, :3, :3], camera_dirs)
    rays_o = jnp.broadcast_to(pose[:, None, None, :3, 3], rays_d.shape)
    return rays_o, rays_d, intrinsics


def get_pixel(h: int, w: int) -> jnp.ndarray:
    """(3, h*w) homogeneous pixel centers (u+0.5, v+0.5, 1), row-major over v then u."""
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32))
    ones = jnp.ones_like(u)
    return jnp.stack([u.reshape(-1) + 0.5, v.reshape(-1) + 0.5, ones.reshape(-1)], axis=0)


def project(depth: Array, intrinsic: Array, pose: Array) -> jnp.ndarray:
    """Unproject a (h, w) depth map to world points using K^-1 and a c2w pose.

    Returns (h, w, 3) world points. Mirrors reference ``project`` (:393-403).
    """
    depth = jnp.asarray(depth, dtype=jnp.float32)
    intrinsic = jnp.asarray(intrinsic, dtype=jnp.float32)
    pose = jnp.asarray(pose, dtype=jnp.float32)
    h, w = depth.shape
    pixel = get_pixel(h, w)  # (3, hw)
    cam_pts = jnp.linalg.inv(intrinsic) @ pixel * depth.reshape(-1)[None]
    cam_h = jnp.concatenate([cam_pts, jnp.ones((1, cam_pts.shape[1]))], axis=0)
    world = pose[:3, :4] @ cam_h  # (3, hw)
    return world.T.reshape(h, w, 3)
