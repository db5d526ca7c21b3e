"""Raymap codec: camera poses <-> 6-channel raymaps, and pointmap lifting.

The raymap is the model's camera representation: a (T, 6, H/8, W/8) tensor whose
channels are [ray_d (3), ray_o (3)], with ray origins compressed by
``signed_log1p(t * 10 / dmax)`` (the 10.0 is checkpoint-locked, reference
``postprocess_utils.py:919-961``). Decoding recovers per-frame c2w poses + FoVs from
ray statistics (reference ``postprocess_utils.py:219-280``), and pointmaps are lifted
as ``depth * ray_d + ray_o`` (``:283-351``).

Unlike the reference (which builds a full-resolution raymap and bilinearly
downsamples it), ``camera_pose_to_raymap`` here evaluates the ray field analytically
at the downsampled pixel positions: the camera-space ray field is linear in (u, v),
so bilinear interpolation at interior sample points is exact — same numbers, no
interpolation pass, and it stays jit-friendly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from aether_tpu.geometry.rays import fov_to_focal, get_intrinsics, get_rays
from aether_tpu.geometry.transforms import (
    disparity_to_depth,
    signed_log1p,
    signed_log1p_inverse,
)

Array = Union[jnp.ndarray, np.ndarray]


def raymap_to_poses(
    raymap: Array,
    camera_pose: Optional[Array] = None,
    ray_o_scale_inv: float = 1.0,
    return_intrinsics: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Recover per-frame c2w poses (T, 4, 4) + half-angle FoVs from a (T, 6, h, w) raymap.

    Pure-functional port of reference ``raymap_to_poses`` (``postprocess_utils.py:219``):
    origin = mean ray_o; focal direction from mean(ray_o + ray_d) - origin; FoVs from
    left/right and top/bottom ray bundle cross products; R re-orthonormalized from the
    X/Y/Z direction estimates.
    """
    raymap = jnp.asarray(raymap, dtype=jnp.float32)
    ts, _, h, w = raymap.shape
    if (not return_intrinsics) and (camera_pose is not None):
        return jnp.asarray(camera_pose, dtype=jnp.float32), None, None

    ray_o = (
        jnp.transpose(signed_log1p_inverse(raymap[:, 3:]), (0, 2, 3, 1))
        * ray_o_scale_inv
    )  # (T, h, w, 3)
    ray_d = jnp.transpose(raymap[:, :3], (0, 2, 3, 1))  # (T, h, w, 3)

    orient = ray_o.reshape(ts, -1, 3).mean(axis=1)  # (T, 3)
    image_orient = (ray_o + ray_d).reshape(ts, -1, 3).mean(axis=1)
    focal = jnp.linalg.norm(image_orient - orient, axis=-1)  # (T,)
    z_dir = image_orient - orient  # (T, 3)

    w_left = ray_d[:, :, :1, :].reshape(ts, -1, 3).mean(axis=1)
    w_right = ray_d[:, :, -1:, :].reshape(ts, -1, 3).mean(axis=1)
    w_span = w_right - w_left
    w_real = jnp.linalg.norm(jnp.cross(w_span, z_dir), axis=-1) / (w - 1) * w
    fov_x = jnp.arctan(w_real / (2.0 * focal))

    h_up = ray_d[:, :1, :, :].reshape(ts, -1, 3).mean(axis=1)
    h_down = ray_d[:, -1:, :, :].reshape(ts, -1, 3).mean(axis=1)
    h_span = h_up - h_down
    h_real = jnp.linalg.norm(jnp.cross(h_span, z_dir), axis=-1) / (h - 1) * h
    fov_y = jnp.arctan(h_real / (2.0 * focal))

    if camera_pose is None:
        x_dir = w_right - w_left
        y_dir = jnp.cross(z_dir, x_dir)
        x_dir = jnp.cross(y_dir, z_dir)
        x_dir = x_dir / jnp.linalg.norm(x_dir, axis=-1, keepdims=True)
        y_dir = y_dir / jnp.linalg.norm(y_dir, axis=-1, keepdims=True)
        z_dir = z_dir / jnp.linalg.norm(z_dir, axis=-1, keepdims=True)

        camera_pose = jnp.zeros((ts, 4, 4), dtype=jnp.float32)
        camera_pose = camera_pose.at[:, :3, 0].set(x_dir)
        camera_pose = camera_pose.at[:, :3, 1].set(y_dir)
        camera_pose = camera_pose.at[:, :3, 2].set(z_dir)
        camera_pose = camera_pose.at[:, :3, 3].set(orient)
        camera_pose = camera_pose.at[:, 3, 3].set(1.0)
    else:
        camera_pose = jnp.asarray(camera_pose, dtype=jnp.float32)

    return camera_pose, fov_x, fov_y


def _downsample_coords(n_out: int, scale: int, align_corners: bool) -> jnp.ndarray:
    """Source-pixel coordinates sampled by F.interpolate(scale_factor=1/scale)."""
    j = jnp.arange(n_out, dtype=jnp.float32)
    if align_corners:
        n_in = n_out * scale
        if n_out == 1:
            return jnp.zeros((1,), dtype=jnp.float32)
        return j * (n_in - 1) / (n_out - 1)
    return (j + 0.5) * scale - 0.5


def camera_pose_to_raymap(
    camera_pose: Array,
    intrinsic: Array,
    ray_o_scale_factor: float = 10.0,
    dmax: float = 1.0,
    height: int = 480,
    width: int = 720,
    vae_downsample: int = 8,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Encode (N, 4, 4) c2w poses + (N, 3, 3) intrinsics as an (N, 6, H/8, W/8) raymap.

    Equivalent to reference ``camera_pose_to_raymap`` + ``get_raymap_from_camera_
    parameters`` (``postprocess_utils.py:867-961``): camera-space dirs on the pixel
    grid (u - cu)/fu, (v - cv)/fv, 1 (no half-pixel offset — matches the reference's
    ``arange`` grid), rotated to world, sampled at the bilinear-downsample positions;
    ray_o channel = signed_log1p(translation * ray_o_scale_factor / (1/dmax))
    broadcast to the grid. Channel order: [ray_d(3), ray_o(3)].
    """
    camera_pose = jnp.asarray(camera_pose, dtype=jnp.float32)
    intrinsic = jnp.asarray(intrinsic, dtype=jnp.float32)
    n = camera_pose.shape[0]
    h_lat = height // vae_downsample if vae_downsample != 1 else height
    w_lat = width // vae_downsample if vae_downsample != 1 else width

    u = _downsample_coords(w_lat, vae_downsample, align_corners)  # (w_lat,)
    v = _downsample_coords(h_lat, vae_downsample, align_corners)  # (h_lat,)

    fu = intrinsic[:, 0, 0][:, None, None]
    fv = intrinsic[:, 1, 1][:, None, None]
    cu = intrinsic[:, 0, 2][:, None, None]
    cv = intrinsic[:, 1, 2][:, None, None]

    x_cam = (u[None, None, :] - cu) / fu  # (n, 1->h, w)
    y_cam = (v[None, :, None] - cv) / fv
    x_cam, y_cam = jnp.broadcast_arrays(x_cam, y_cam)
    z_cam = jnp.ones_like(x_cam)
    dirs_cam = jnp.stack([x_cam, y_cam, z_cam], axis=-1)  # (n, h, w, 3)

    rot = camera_pose[:, :3, :3]
    ray_d = jnp.einsum("nij,nhwj->nihw", rot, dirs_cam)  # (n, 3, h, w)

    trans = camera_pose[:, :3, 3] * (dmax * ray_o_scale_factor)
    ray_o = signed_log1p(trans)[:, :, None, None]
    ray_o = jnp.broadcast_to(ray_o, ray_d.shape)

    return jnp.concatenate([ray_d, ray_o], axis=1)


def postprocess_pointmap(
    disparity: Array,
    raymap: Array,
    vae_downsample_scale: int = 8,
    camera_pose: Optional[Array] = None,
    focal: Optional[Array] = None,
    ray_o_scale_inv: float = 1.0,
    smooth_camera: bool = False,
    smooth_method: str = "simple",
    **kwargs,
) -> Dict[str, np.ndarray]:
    """Lift (T, h, w) disparity + (T, 6, h/8, w/8) raymap to world-space pointmaps.

    Reference ``postprocess_pointmap`` (``postprocess_utils.py:283-351``). Smoothing
    (gaussian / kalman) runs on host numpy like the reference; everything else is jnp.
    Returns numpy arrays for downstream host-side stitching/export.
    """
    from aether_tpu.geometry import smoothing as smoothing_lib

    disparity = jnp.asarray(disparity, dtype=jnp.float32)
    raymap = jnp.asarray(raymap, dtype=jnp.float32)
    depth = disparity_to_depth(disparity)

    camera_pose, fov_x, fov_y = raymap_to_poses(
        raymap,
        camera_pose=camera_pose,
        ray_o_scale_inv=ray_o_scale_inv,
        return_intrinsics=(focal is not None),
    )
    h = int(raymap.shape[2] * vae_downsample_scale)
    w = int(raymap.shape[3] * vae_downsample_scale)
    if focal is None:
        focal = fov_to_focal(fov_x, fov_y, h, w)

    camera_pose = np.asarray(camera_pose)
    if smooth_camera:
        is_static, trans_diff, rot_diff = smoothing_lib.detect_static_sequence(
            camera_pose
        )
        if is_static:
            camera_pose = smoothing_lib.adaptive_pose_smoothing(
                camera_pose, trans_diff, rot_diff
            )
        elif smooth_method == "simple":
            camera_pose = smoothing_lib.smooth_poses(
                camera_pose, window_size=5, method="gaussian"
            )
        elif smooth_method == "kalman":
            camera_pose = smoothing_lib.smooth_trajectory(camera_pose, window_size=5)

    ray_o, ray_d, intrinsics = get_rays(camera_pose, h, w, focal)
    pointmap = depth[..., None] * ray_d + ray_o

    return {
        "pointmap": np.asarray(pointmap),
        "camera_pose": np.asarray(camera_pose),
        "intrinsics": np.asarray(intrinsics),
        "ray_o": np.asarray(ray_o),
        "ray_d": np.asarray(ray_d),
        "depth": np.asarray(depth),
    }
