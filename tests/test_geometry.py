"""Geometry unit tests: round trips and golden behaviors.

These anchor the correctness of everything downstream (SURVEY.md section 7 step 1):
pose -> raymap -> pose must round-trip, signed_log1p must invert, pointmap lifting
must agree with direct unprojection, and alignment must recover known transforms.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from aether_tpu.geometry import (
    align_camera_extrinsics,
    align_rigid,
    apply_transformation,
    camera_pose_to_raymap,
    compute_scale,
    depth_edge,
    depth_to_disparity,
    detect_static_sequence,
    disparity_to_depth,
    fov_to_focal,
    get_intrinsics,
    get_rays,
    interpolate_poses,
    postprocess_pointmap,
    project,
    raymap_to_poses,
    signed_log1p,
    signed_log1p_inverse,
    slerp,
    smooth_poses,
    smooth_trajectory,
)


def random_poses(rng, n=5, max_angle=0.3, max_trans=2.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        rotvec = rng.normal(size=3) * max_angle
        poses[i, :3, :3] = R.from_rotvec(rotvec).as_matrix()
        poses[i, :3, 3] = rng.normal(size=3) * max_trans
    return poses


def test_signed_log1p_roundtrip(rng):
    x = rng.normal(size=(4, 7)) * 100
    y = np.asarray(signed_log1p(x))
    x2 = np.asarray(signed_log1p_inverse(y))
    np.testing.assert_allclose(x, x2, rtol=1e-4, atol=1e-4)


def test_depth_disparity_roundtrip(rng):
    depth = rng.uniform(0.5, 50.0, size=(3, 16, 16)).astype(np.float32)
    disparity, dmax = depth_to_disparity(depth, sqrt_disparity=True)
    disparity = np.asarray(disparity)
    assert disparity.min() >= 0.0 and disparity.max() <= 1.0
    # decode path: square then 1/(d * dmax)
    recon = np.asarray(disparity_to_depth(disparity**2)) / float(dmax)
    np.testing.assert_allclose(recon, depth, rtol=1e-3)


def test_compute_scale_recovers_known_scalar(rng):
    target = rng.uniform(0.1, 1.0, size=(1, 32, 32)).astype(np.float32)
    pred = target / 2.5
    mask = np.ones_like(pred, dtype=bool)
    s = compute_scale(pred, target, mask)
    assert abs(s - 2.5) < 1e-4


def test_pose_raymap_roundtrip(rng):
    """pose -> raymap -> pose is the correctness anchor for the camera codec."""
    n, h, w = 6, 480, 720
    poses = random_poses(rng, n)
    K, focal = get_intrinsics(n, h, w, focal=400.0)
    raymap = np.asarray(
        camera_pose_to_raymap(poses, np.asarray(K), ray_o_scale_factor=10.0,
                              height=h, width=w)
    )
    assert raymap.shape == (n, 6, h // 8, w // 8)

    # decode uses ray_o_scale_inv = 1/10
    rec_poses, fov_x, fov_y = raymap_to_poses(raymap, ray_o_scale_inv=0.1)
    rec_poses = np.asarray(rec_poses)

    np.testing.assert_allclose(rec_poses[:, :3, 3], poses[:, :3, 3], atol=2e-3)
    # rotation columns must match the encoded camera axes
    np.testing.assert_allclose(rec_poses[:, :3, :3], poses[:, :3, :3], atol=5e-3)
    # focal recovered from FoVs should be close to the encoded focal
    rec_focal = np.asarray(fov_to_focal(fov_x, fov_y, h // 8, w // 8)) * 8
    np.testing.assert_allclose(rec_focal, 400.0, rtol=0.02)


def test_raymap_to_poses_rotations_are_orthonormal(rng):
    poses = random_poses(rng, 4)
    K, _ = get_intrinsics(4, 480, 720, focal=500.0)
    raymap = np.asarray(camera_pose_to_raymap(poses, np.asarray(K)))
    rec, _, _ = raymap_to_poses(raymap, ray_o_scale_inv=0.1)
    rec = np.asarray(rec)
    rtr = np.einsum("tij,tik->tjk", rec[:, :3, :3], rec[:, :3, :3])
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)


def test_get_rays_matches_project(rng):
    """pointmap = depth*ray_d + ray_o must equal K^-1-based unprojection."""
    h, w = 48, 64
    poses = random_poses(rng, 2)
    focal = 80.0
    rays_o, rays_d, intrinsics = get_rays(poses, h, w, focal=focal)
    rays_o, rays_d = np.asarray(rays_o), np.asarray(rays_d)
    depth = rng.uniform(1.0, 10.0, size=(2, h, w)).astype(np.float32)

    pointmap = depth[..., None] * rays_d + rays_o
    for i in range(2):
        direct = np.asarray(project(depth[i], np.asarray(intrinsics)[i], poses[i]))
        np.testing.assert_allclose(pointmap[i], direct, atol=5e-2)


def test_postprocess_pointmap_shapes(rng):
    n, h_lat, w_lat = 3, 30, 45
    poses = random_poses(rng, n)
    K, _ = get_intrinsics(n, h_lat * 8, w_lat * 8, focal=400.0)
    raymap = np.asarray(
        camera_pose_to_raymap(poses, np.asarray(K), height=h_lat * 8, width=w_lat * 8)
    )
    disparity = rng.uniform(0.05, 1.0, size=(n, h_lat * 8, w_lat * 8)).astype(np.float32)
    out = postprocess_pointmap(disparity, raymap, ray_o_scale_inv=0.1)
    assert out["pointmap"].shape == (n, h_lat * 8, w_lat * 8, 3)
    assert out["camera_pose"].shape == (n, 4, 4)
    assert out["depth"].min() >= 1.0  # disparity <= 1 -> depth >= 1


def test_align_rigid_recovers_similarity(rng):
    p = rng.normal(size=(1, 50, 3))
    true_r = R.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
    true_s, true_t = 1.7, np.array([0.5, -1.0, 2.0])
    q = true_s * p @ true_r.T + true_t
    rot, trans, scale = align_rigid(p, q, np.ones((1, 50)))
    np.testing.assert_allclose(rot[0], true_r, atol=1e-6)
    np.testing.assert_allclose(scale[0], true_s, atol=1e-6)
    np.testing.assert_allclose(trans[0], true_t, atol=1e-6)


def test_align_camera_extrinsics_identity(rng):
    poses = random_poses(rng, 8)[:, :3, :4]
    r, t, s = align_camera_extrinsics(poses, poses)
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(t[0], 0.0, atol=1e-8)
    assert abs(s - 1.0) < 1e-8
    aligned = apply_transformation(poses, r, t, s)
    np.testing.assert_allclose(aligned, poses, atol=1e-8)


def test_align_camera_extrinsics_recovers_scale(rng):
    poses = random_poses(rng, 10)[:, :3, :4]
    scaled = poses.copy()
    scaled[:, :, 3] = poses[:, :, 3] * 3.0
    r, t, s = align_camera_extrinsics(poses, scaled)
    aligned = apply_transformation(poses, r, t, s)
    np.testing.assert_allclose(aligned, scaled, atol=1e-6)


def test_slerp_endpoints():
    q1 = R.from_rotvec([0, 0, 0.0]).as_quat()
    q2 = R.from_rotvec([0, 0, 1.0]).as_quat()
    np.testing.assert_allclose(slerp(q1, q2, 0.0), q1, atol=1e-7)
    np.testing.assert_allclose(slerp(q1, q2, 1.0), q2, atol=1e-7)
    mid = slerp(q1, q2, 0.5)
    ang = R.from_quat(mid).as_rotvec()
    np.testing.assert_allclose(ang, [0, 0, 0.5], atol=1e-6)


def test_interpolate_poses_weighting(rng):
    poses = random_poses(rng, 2)
    np.testing.assert_allclose(interpolate_poses(poses[0], poses[1], 1.0), poses[0],
                               atol=1e-6)
    np.testing.assert_allclose(interpolate_poses(poses[0], poses[1], 0.0), poses[1],
                               atol=1e-6)


@pytest.mark.parametrize("method", ["gaussian", "savgol", "ma"])
def test_smooth_poses_preserves_rotations(rng, method):
    poses = random_poses(rng, 9, max_angle=0.05, max_trans=0.1)
    out = smooth_poses(poses, window_size=5, method=method)
    assert out.shape == poses.shape
    rtr = np.einsum("tij,tik->tjk", out[:, :3, :3], out[:, :3, :3])
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (9, 1, 1)), atol=1e-6)


def test_smooth_trajectory_reduces_jitter(rng):
    n = 31
    t = np.linspace(0, 1, n)
    clean = np.stack([t, t * 2, np.zeros_like(t)], axis=1)
    noisy = clean + rng.normal(size=(n, 3)) * 0.05
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = noisy
    out = smooth_trajectory(poses, window_size=5)
    err_noisy = np.linalg.norm(noisy - clean, axis=1).mean()
    err_smooth = np.linalg.norm(out[:, :3, 3] - clean, axis=1).mean()
    assert err_smooth < err_noisy


def test_detect_static_sequence():
    static = np.tile(np.eye(4), (5, 1, 1))
    is_static, _, _ = detect_static_sequence(static)
    assert is_static
    moving = static.copy()
    moving[:, 0, 3] = np.arange(5) * 1.0
    is_static, _, _ = detect_static_sequence(moving)
    assert not is_static


def test_depth_edge_detects_discontinuity():
    depth = np.ones((16, 16), dtype=np.float32)
    depth[:, 8:] = 10.0
    edge = np.asarray(depth_edge(depth, atol=1.0, kernel_size=3))
    assert edge[:, 7].all() and edge[:, 8].all()
    assert not edge[:, :6].any() and not edge[:, 10:].any()


def test_depth_edge_rtol_and_mask():
    depth = np.ones((1, 8, 8), dtype=np.float32)
    depth[0, :, 4:] = 1.5
    edge = np.asarray(depth_edge(depth, rtol=0.2))
    assert edge[0, :, 3:5].any()
    mask = np.zeros((1, 8, 8), dtype=bool)
    mask[0, :, :4] = True  # only look at the flat region
    edge_masked = np.asarray(depth_edge(depth, atol=0.2, mask=mask))
    assert not edge_masked[0, :, :3].any()


def test_named_action_raymaps_roundtrip():
    """Generated camera-action raymaps must decode back to their source poses."""
    from aether_tpu.apps.actions import NAMED_ACTIONS, action_raymap, trajectory
    from aether_tpu.geometry.raymap import raymap_to_poses

    for name in ("forward", "backward", "forward_right", "turn_left"):
        rm = action_raymap(name, num_frames=9, height=64, width=96)
        assert rm.shape == (9, 6, 8, 12)
        poses, _, _ = raymap_to_poses(rm, ray_o_scale_inv=0.1)
        gt = trajectory(9, **NAMED_ACTIONS[name])
        poses = np.asarray(poses)
        np.testing.assert_allclose(poses[:, :3, 3], gt[:, :3, 3], atol=1e-5)
        np.testing.assert_allclose(poses[:, :3, :3], gt[:, :3, :3], atol=0.02)


def test_align_extrinsics_never_returns_reflection():
    """Degenerate pose sets must still yield a proper rotation (det +1)."""
    from aether_tpu.geometry.alignment import align_camera_extrinsics

    rng = np.random.default_rng(0)
    # pathological: tgt rotations are reflections of src (mean covariance
    # has negative determinant)
    src = np.tile(np.eye(4), (4, 1, 1))
    tgt = np.tile(np.eye(4), (4, 1, 1))
    tgt[:, :3, :3] = np.diag([1.0, 1.0, -1.0])
    tgt[:, :3, 3] = rng.normal(size=(4, 3))
    r, t, s = align_camera_extrinsics(src, tgt)
    assert abs(np.linalg.det(np.asarray(r)) - 1.0) < 1e-6


def test_interpolate_poses_handles_degenerate_rotation():
    from aether_tpu.geometry.smoothing import interpolate_poses

    good = np.eye(4)
    bad = np.eye(4)
    bad[:3, :3] = np.diag([1.0, 1.0, -1.0])  # left-handed
    out = interpolate_poses(good, bad, 0.5)
    assert np.all(np.isfinite(out))
    assert abs(np.linalg.det(out[:3, :3]) - 1.0) < 1e-6
