"""Tests for the evaluation harness: depth metrics, pose metrics, datasets,
sharding, and the sliding-window drivers (with a fake pipeline)."""

import json
import os

import numpy as np
import pytest

from aether_tpu.eval.depth_metrics import (
    depth_evaluation,
    group_by_directory,
    weighted_average_metrics,
)
from aether_tpu.eval.pose_metrics import (
    ate_rmse,
    eval_metrics,
    extract_metrics,
    load_tum_file,
    poses_to_traj,
    rpe,
    save_tum_poses,
    umeyama,
)
from aether_tpu.eval.sharding import shard_sequences


# ---------------------------------------------------------------------------
# depth metrics
# ---------------------------------------------------------------------------


def _synthetic_depth(rng, t=3, h=12, w=16):
    gt = rng.uniform(1.0, 10.0, size=(t, h, w))
    return gt


@pytest.mark.parametrize("align", ["median", "lstsq", "lad", "lad2", "scale"])
def test_depth_alignment_recovers_affine(rng, align):
    gt = _synthetic_depth(rng)
    shift = 0.5 if align in ("lstsq", "lad", "lad2") else 0.0
    pred = 2.0 * gt + shift  # pred differs from gt by known scale (+shift)
    # invert: evaluation must align pred back onto gt nearly perfectly
    metrics, parity, aligned, gt_masked = depth_evaluation(
        (pred - shift) / 2.0 * 2.0 * 0.25 + shift * 0.25,  # 0.25x scaled pred
        gt, max_depth=100.0, align=align,
    )
    assert metrics["Abs Rel"] < 0.02, metrics
    assert metrics["δ < 1.25"] > 0.99
    assert metrics["valid_pixels"] == gt.size
    assert parity.shape == (gt.shape[0] * gt.shape[1], gt.shape[2])


def test_depth_metric_mode_no_alignment(rng):
    gt = _synthetic_depth(rng)
    metrics, *_ = depth_evaluation(2.0 * gt, gt, align="metric")
    assert metrics["Abs Rel"] == pytest.approx(1.0, rel=1e-6)  # 2x off


def test_depth_masking_and_custom_mask(rng):
    gt = _synthetic_depth(rng)
    gt[0, :, :] = 0.0  # invalid frame
    pred = gt.copy()
    custom = np.ones_like(gt, bool)
    custom[1] = False  # additionally drop frame 1
    metrics, *_ = depth_evaluation(pred, gt, align="median",
                                   custom_mask=custom)
    assert metrics["valid_pixels"] == gt[2].size


def test_depth_empty_mask_returns_zeros():
    gt = np.zeros((2, 4, 4))
    metrics, *_ = depth_evaluation(np.ones_like(gt), gt)
    assert metrics["valid_pixels"] == 0 and metrics["Abs Rel"] == 0.0


def test_weighted_average():
    out = weighted_average_metrics(
        [
            {"Abs Rel": 1.0, "valid_pixels": 100},
            {"Abs Rel": 0.0, "valid_pixels": 300},
        ]
    )
    assert out["Abs Rel"] == pytest.approx(0.25)


def test_group_by_directory():
    grouped = group_by_directory(
        ["out/seq_a/f0.npy", "out/seq_a/f1.npy", "out/seq_b/f0.npy"]
    )
    assert sorted(grouped) == ["seq_a", "seq_b"]
    assert len(grouped["seq_a"]) == 2


# ---------------------------------------------------------------------------
# pose metrics
# ---------------------------------------------------------------------------


def _random_traj(rng, n=20):
    from scipy.spatial.transform import Rotation

    poses = []
    pos = np.zeros(3)
    rot = np.eye(3)
    for _ in range(n):
        pose = np.eye(4)
        pose[:3, :3] = rot
        pose[:3, 3] = pos
        poses.append(pose)
        pos = pos + rng.normal(0, 0.3, 3) + np.array([0.5, 0.0, 0.0])
        rot = rot @ Rotation.from_euler("xyz", rng.normal(0, 5, 3),
                                        degrees=True).as_matrix()
    return np.stack(poses)


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(30, 3))
    from scipy.spatial.transform import Rotation

    r_true = Rotation.from_euler("xyz", [20, -10, 45], degrees=True).as_matrix()
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ r_true.T + t_true
    r, t, s = umeyama(src, dst, with_scale=True)
    np.testing.assert_allclose(r, r_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    assert s == pytest.approx(s_true)


def test_ate_zero_after_similarity_transform(rng):
    poses = _random_traj(rng)
    traj = poses_to_traj(poses)
    # apply a global similarity transform: ATE must be ~0 after alignment
    from scipy.spatial.transform import Rotation

    r = Rotation.from_euler("z", 90, degrees=True).as_matrix()
    transformed = poses.copy()
    transformed[:, :3, 3] = 3.0 * poses[:, :3, 3] @ r.T + np.array([5, 5, 5])
    transformed[:, :3, :3] = r @ poses[:, :3, :3]
    traj2 = poses_to_traj(transformed)
    assert ate_rmse(traj2, traj) < 1e-9
    assert rpe(traj2, traj, rotation=True) < 1e-6
    assert rpe(traj2, traj, rotation=False) < 1e-9


def test_rpe_detects_perturbation(rng):
    poses = _random_traj(rng)
    traj = poses_to_traj(poses)
    noisy = poses.copy()
    noisy[10, :3, 3] += 1.0
    traj2 = poses_to_traj(noisy)
    assert rpe(traj2, traj, rotation=False) > 0.05
    assert ate_rmse(traj2, traj) > 0.01


def test_tum_roundtrip_and_eval_metrics(tmp_path, rng):
    poses = _random_traj(rng, n=12)
    path = str(tmp_path / "pred_traj.txt")
    traj, stamps = save_tum_poses(poses, path)
    loaded, loaded_stamps = load_tum_file(path)
    np.testing.assert_allclose(loaded, traj, atol=1e-7)
    np.testing.assert_allclose(loaded_stamps, stamps)

    metric_file = str(tmp_path / "eval_metric.txt")
    ate, rpe_t, rpe_r = eval_metrics((traj, stamps), (traj.copy(), stamps),
                                     seq="test", filename=metric_file)
    assert ate < 1e-9 and rpe_t < 1e-9 and rpe_r < 1e-6
    scraped = extract_metrics(metric_file)
    assert scraped["ATE"] == pytest.approx(ate, abs=1e-8)


# ---------------------------------------------------------------------------
# dataset readers
# ---------------------------------------------------------------------------


def test_sintel_dpt_and_cam_roundtrip(tmp_path, rng):
    from aether_tpu.eval.datasets import (
        TAG_FLOAT,
        load_sintel_traj,
        read_sintel_depth,
    )

    depth = rng.uniform(0.1, 50, size=(8, 10)).astype(np.float32)
    dpt = tmp_path / "frame_0001.dpt"
    with open(dpt, "wb") as f:
        np.array([TAG_FLOAT], np.float32).tofile(f)
        np.array([10, 8], np.int32).tofile(f)
        depth.tofile(f)
    np.testing.assert_array_equal(read_sintel_depth(str(dpt)), depth)

    cam_dir = tmp_path / "cams"
    cam_dir.mkdir()
    w2c = np.eye(4)[:3]
    w2c[:3, 3] = [1.0, 2.0, 3.0]
    for i in range(3):
        with open(cam_dir / f"frame_{i:04d}.cam", "wb") as f:
            np.array([TAG_FLOAT], np.float32).tofile(f)
            np.eye(3).astype(np.float64).tofile(f)
            w2c.astype(np.float64).tofile(f)
    traj, stamps = load_sintel_traj(str(cam_dir))
    assert traj.shape == (3, 7) and stamps.shape == (3,)
    # positions are mean-centered -> all-equal poses give zero positions
    np.testing.assert_allclose(traj[:, :3], 0.0, atol=1e-12)


def test_png_depth_readers(tmp_path):
    import cv2

    from aether_tpu.eval.datasets import read_bonn_depth, read_kitti_depth

    raw = (np.arange(48).reshape(6, 8) * 100).astype(np.uint16)
    path = str(tmp_path / "d.png")
    cv2.imwrite(path, raw)
    np.testing.assert_allclose(read_bonn_depth(path), raw / 5000.0)
    np.testing.assert_allclose(read_kitti_depth(path), raw / 256.0)


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------


def test_shard_sequences_partition():
    items = list(range(10))
    shards = [shard_sequences(items, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == items  # exact cover
    assert all(len(s) in (3, 4) for s in shards)  # balanced
    assert shard_sequences(items, 0, 1) == items


# ---------------------------------------------------------------------------
# sliding-window drivers with a fake pipeline
# ---------------------------------------------------------------------------


class _FakePipeline:
    """Deterministic pipeline stub: rgb = input, disparity = 0.5, raymap from
    an identity camera — lets the window/blend logic be tested without a model."""

    def __init__(self, latent_scale=8):
        self.latent_scale = latent_scale
        self.calls = 0

    def __call__(self, task, video, height, width, num_frames, **kwargs):
        from aether_tpu.pipeline.aether import AetherPipelineOutput
        from aether_tpu.geometry.raymap import camera_pose_to_raymap

        self.calls += 1
        video = np.asarray(video)
        t = video.shape[0]
        poses = np.broadcast_to(np.eye(4), (t, 4, 4)).copy()
        poses[:, 0, 3] = np.arange(t) * 0.1  # slight translation
        focal = 0.8 * width
        intrinsic = np.broadcast_to(
            np.array(
                [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]]
            ),
            (t, 3, 3),
        ).copy()
        raymap = np.asarray(
            camera_pose_to_raymap(poses, intrinsic, height=height, width=width)
        )
        return AetherPipelineOutput(
            rgb=video.astype(np.float32),
            disparity=np.full((t, height, width), 0.5, np.float32),
            raymap=raymap.astype(np.float32),
        )


def test_video_depth_sliding_window_consistency(rng):
    from aether_tpu.eval.video_depth import process_with_sliding_window

    video = rng.uniform(0, 1, size=(30, 32, 48, 3))
    pipe = _FakePipeline()
    rgb, disp = process_with_sliding_window(
        pipe, video, num_inference_steps=1, window_frames=17,
        temporal_stride=8, tile=(32, 32), spatial_overlap=(8, 8),
    )
    assert rgb.shape == video.shape
    assert disp.shape == video.shape[:3]
    # fake pipeline echoes rgb and constant disparity: blending must preserve both
    np.testing.assert_allclose(rgb, video, atol=1e-5)
    np.testing.assert_allclose(disp, 0.5, atol=1e-5)
    assert pipe.calls > 2  # multiple windows x tiles actually ran


def test_spatial_tiles_cover():
    from aether_tpu.eval.video_depth import _spatial_tiles

    spans, horizontal = _spatial_tiles(480, 1000, (480, 720), (60, 90))
    assert horizontal
    assert spans[0][0] == 0 and spans[-1][1] == 1000
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert s1 < e0  # overlapping
    spans_v, horizontal_v = _spatial_tiles(800, 720, (480, 720), (60, 90))
    assert not horizontal_v and spans_v[-1][1] == 800


def test_rel_pose_blend_and_tum_export(tmp_path, rng):
    from aether_tpu.eval.rel_pose import process_video_with_sliding_window

    video = rng.uniform(0, 1, size=(33, 32, 48, 3))
    pipe = _FakePipeline()
    results = process_video_with_sliding_window(
        pipe, video, num_inference_steps=1, window_frames=17,
        temporal_stride=8,
    )
    assert results["rgb"].shape == video.shape
    assert results["poses"].shape == (33, 4, 4)
    assert results["focals"].shape == (33,)
    assert np.all(np.isfinite(results["poses"]))
    save_tum_poses(results["poses"], str(tmp_path / "pred_traj.txt"))
    loaded, _ = load_tum_file(str(tmp_path / "pred_traj.txt"))
    assert loaded.shape == (33, 7)


def test_evaluate_depth_predictions_end_to_end(tmp_path, rng):
    """Synthetic sintel-style layout: pred == gt must score ~perfect."""
    from aether_tpu.eval.datasets import TAG_FLOAT
    from aether_tpu.eval.video_depth import evaluate_depth_predictions

    data_root = tmp_path / "data"
    pred_dir = tmp_path / "preds"
    for seq in ("alley_2", "cave_2"):
        gt_dir = data_root / "sintel/training/depth" / seq
        gt_dir.mkdir(parents=True)
        (pred_dir / seq).mkdir(parents=True)
        for i in range(3):
            depth = rng.uniform(1, 10, size=(8, 12)).astype(np.float32)
            with open(gt_dir / f"frame_{i:04d}.dpt", "wb") as f:
                np.array([TAG_FLOAT], np.float32).tofile(f)
                np.array([12, 8], np.int32).tofile(f)
                depth.tofile(f)
            np.save(pred_dir / seq / f"frame_{i:04d}.npy", depth)

    result = evaluate_depth_predictions(
        str(pred_dir), "sintel", str(data_root), align="scale"
    )
    assert result["summary"]["Abs Rel"] < 1e-6
    assert set(result["per_sequence"]) == {"alley_2", "cave_2"}
    assert os.path.exists(pred_dir / "result_scale.json")
    with open(pred_dir / "result_scale.json") as f:
        assert json.load(f)["dataset"] == "sintel"


def test_video_depth_batched_grid_matches_serial(rng):
    """The batched (window x tile) grid path must produce the same blended
    output as the serial path."""
    from aether_tpu.eval.video_depth import process_with_sliding_window
    from aether_tpu.pipeline.aether import AetherPipelineOutput

    class _FakeBatched(_FakePipeline):
        def batch_reconstruct(self, windows, height, width, num_frames,
                              defer_host=False, **kw):
            outs = [
                self(task="reconstruction", video=w, height=height,
                     width=width, num_frames=num_frames)
                for w in np.asarray(windows)
            ]
            if defer_host:
                class _D:
                    def resolve(self_inner):
                        return outs
                return _D()
            return outs

    video = rng.uniform(0, 1, size=(30, 32, 48, 3))
    serial_rgb, serial_disp = process_with_sliding_window(
        _FakePipeline(), video, num_inference_steps=1, window_frames=17,
        temporal_stride=8, tile=(32, 32), spatial_overlap=(8, 8),
        batch_calls=1,
    )
    pipe = _FakeBatched()
    batch_rgb, batch_disp = process_with_sliding_window(
        pipe, video, num_inference_steps=1, window_frames=17,
        temporal_stride=8, tile=(32, 32), spatial_overlap=(8, 8),
        batch_calls=3,
    )
    np.testing.assert_allclose(batch_rgb, serial_rgb, atol=1e-6)
    np.testing.assert_allclose(batch_disp, serial_disp, atol=1e-6)


def test_run_sequences_log_and_skip_and_resume(tmp_path):
    """Reference error policy (SURVEY section 4 / launch_aether.py:367-384):
    a failing sequence is appended to the per-rank error log and skipped, the
    rest of the shard completes; a resume pass skips finished sequences
    without re-running the pipeline."""
    from PIL import Image

    from aether_tpu.eval.video_depth import run_sequences

    rng = np.random.default_rng(0)
    frame_lists = {}
    for seq in ("seq_a", "seq_c"):
        d = tmp_path / "frames" / seq
        d.mkdir(parents=True)
        paths = []
        for i in range(4):
            p = str(d / f"{i:02d}.png")
            Image.fromarray(
                rng.uniform(0, 255, (16, 24, 3)).astype(np.uint8)
            ).save(p)
            paths.append(p)
        frame_lists[seq] = paths
    # seq_b's frames do not exist -> prepare_input raises inside the try
    frame_lists["seq_b"] = [str(tmp_path / "frames" / "seq_b" / "missing.png")]

    out = str(tmp_path / "out")
    pipe = _FakePipeline()
    kwargs = dict(num_inference_steps=1, window_frames=3, temporal_stride=2,
                  tile=(16, 24), spatial_overlap=(4, 6))
    done = run_sequences(pipe, ["seq_a", "seq_b", "seq_c"], frame_lists, out,
                         **kwargs)
    assert done == ["seq_a", "seq_c"]
    log = tmp_path / "out" / "_error_log_0.txt"
    assert log.exists() and "seq_b" in log.read_text()
    for seq in done:
        frames = [f for f in os.listdir(os.path.join(out, seq))
                  if f.startswith("frame_")]
        assert len(frames) == 4

    # resume: completed sequences are not re-run (pipeline not called again)
    calls_before = pipe.calls
    done2 = run_sequences(pipe, ["seq_a", "seq_b", "seq_c"], frame_lists, out,
                          resume=True, **kwargs)
    assert done2 == ["seq_a", "seq_c"]
    assert pipe.calls == calls_before


def test_rel_pose_dp_batched_matches_serial(rng):
    """With a dp mesh on the pipeline, rel-pose windows chunk through
    batch_reconstruct; results must equal the serial per-window loop."""
    from types import SimpleNamespace

    from aether_tpu.eval.rel_pose import process_video_with_sliding_window

    video = rng.uniform(0, 1, size=(30, 32, 48, 3))
    kw = dict(num_inference_steps=1, window_frames=17, temporal_stride=8)
    serial = process_video_with_sliding_window(_FakePipeline(), video, **kw)

    class _FakeBatchedPipe(_FakePipeline):
        mesh = SimpleNamespace(shape={"dp": 2})

        def batch_reconstruct(self, windows, height, width, num_frames,
                              num_inference_steps, fps, seed,
                              defer_host=False):
            outs = [
                _FakePipeline.__call__(self, task="reconstruction", video=w,
                                       height=height, width=width,
                                       num_frames=num_frames)
                for w in windows
            ]
            return SimpleNamespace(resolve=lambda: outs) if defer_host else outs

    pipe = _FakeBatchedPipe()
    batched = process_video_with_sliding_window(pipe, video, **kw)
    for key in ("rgb", "disparity", "poses", "focals"):
        np.testing.assert_allclose(batched[key], serial[key], atol=1e-6,
                                   err_msg=key)


def test_rel_pose_registry_mirrors_reference(tmp_path):
    """Registry keys and path conventions mirror reference
    ``evaluation/rel_pose/metadata.py:8-121``: five scannet strided copies
    (replica-format pose_90.txt), tum rgb_90/groundtruth_90.txt, sintel."""
    from scipy.spatial.transform import Rotation

    from aether_tpu.eval.datasets import (
        REL_POSE_DATASETS,
        list_sequences,
        load_traj,
    )

    assert set(REL_POSE_DATASETS) == {
        "sintel", "tum", "scannet", "scannet-257", "scannet-129",
        "scannet-65", "scannet-33",
    }
    for key in ("scannet", "scannet-257", "scannet-129", "scannet-65",
                "scannet-33"):
        assert REL_POSE_DATASETS[key]["traj_format"] == "replica"
        assert REL_POSE_DATASETS[key]["full_seq"] is True

    # synthetic scannet tree: 2 sequences, replica 16-col pose_90.txt
    meta = REL_POSE_DATASETS["scannet"]
    root = tmp_path / meta["img_path"]
    rng = np.random.default_rng(0)
    for seq in ("scene0000_00", "scene0001_00"):
        (root / seq / "color_90").mkdir(parents=True)
        rows = []
        for _ in range(5):
            pose = np.eye(4)
            pose[:3, :3] = Rotation.random(random_state=rng.integers(1 << 30)
                                           ).as_matrix()
            pose[:3, 3] = rng.normal(size=3)
            rows.append(pose.reshape(-1))
        np.savetxt(root / seq / "pose_90.txt", np.stack(rows))

    seqs = list_sequences(meta, str(root))
    assert seqs == ["scene0000_00", "scene0001_00"]

    gt_file = meta["gt_traj"](str(root), "", "scene0000_00")
    traj, stamps = load_traj(gt_file, meta["traj_format"])
    assert traj.shape == (5, 7) and stamps.shape == (5,)
    # unit quaternions out of the replica reader
    np.testing.assert_allclose(np.linalg.norm(traj[:, 3:], axis=1), 1.0,
                               atol=1e-9)

    tum = REL_POSE_DATASETS["tum"]
    assert tum["gt_traj"]("tum", "", "seq").endswith("groundtruth_90.txt")
    assert tum["dir_path"]("tum", "seq").endswith("rgb_90")
