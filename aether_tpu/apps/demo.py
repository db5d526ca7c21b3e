"""CLI inference demo: reconstruction / prediction / planning on TPU.

Capability parity with reference ``scripts/demo.py`` (650 LoC): same three
tasks, same flag surface, the temporal sliding window + blending for long
reconstructions, the post-reconstruction refinement trick for prediction and
planning (``demo.py:588-606``), and the same output artifacts (RGB + colorized
disparity videos, per-frame GLB point-cloud scenes, camera poses) — driven by
the jit-compiled :class:`~aether_tpu.pipeline.AetherPipeline` instead of a
torch/diffusers stack.

Model weights come from a converted orbax/npz checkpoint (``--checkpoint``,
see :mod:`aether_tpu.io.weights`); ``--random-init tiny`` gives a CPU-runnable
smoke configuration (no checkpoint download is possible in this environment).

Usage:
    python -m aether_tpu.apps.demo --task reconstruction --video clip.mp4
    python -m aether_tpu.apps.demo --task prediction --image obs.png \
        --raymap_action raymap.npy
    python -m aether_tpu.apps.demo --task planning --image obs.png --goal goal.png
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from aether_tpu.geometry.raymap import raymap_to_poses
from aether_tpu.pipeline.windowing import blend_and_merge_window_results
from aether_tpu.utils.profiling import stage_timer


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="AetherV1-TPU inference demo")
    p.add_argument("--task", type=str, required=True,
                   choices=["reconstruction", "prediction", "planning"])
    p.add_argument("--video", type=str, default=None,
                   help="Video path ('reconstruction' only).")
    p.add_argument("--image", type=str, default=None,
                   help="Image path ('prediction'/'planning').")
    p.add_argument("--goal", type=str, default=None,
                   help="Goal image path ('planning' only).")
    p.add_argument("--raymap_action", type=str, default=None,
                   help=".npy raymap of shape (F, 6, H/8, W/8).")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=12, choices=[8, 10, 12, 15, 24])
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--use_dynamic_cfg", dest="use_dynamic_cfg",
                   action="store_true", default=None,
                   help="Force dynamic CFG on (default: task-dependent).")
    p.add_argument("--no_dynamic_cfg", dest="use_dynamic_cfg",
                   action="store_false",
                   help="Force dynamic CFG off.")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--num_frames", type=int, default=41)
    p.add_argument("--max_depth", type=float, default=100.0)
    p.add_argument("--rtol", type=float, default=0.2,
                   help="Relative tolerance for depth-edge masking in GLB export.")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Converted orbax/npz checkpoint directory "
                        "(dit.npz / vae.npz / text_embeds.npy).")
    p.add_argument("--random-init", dest="random_init", type=str, default=None,
                   choices=["tiny", "aetherv1", "aetherv1-fp8",
                            "aetherv1-int8"],
                   help="Skip checkpoint loading; random weights (smoke runs; "
                        "-fp8/-int8 use the quantized layout for 16 GB chips; "
                        "-int8 adds dynamic activation quant = the bench "
                        "deployment config).")
    p.add_argument("--config", type=str, default="aetherv1",
                   choices=["aetherv1", "tiny"],
                   help="Model topology of --checkpoint.")
    p.add_argument("--smooth_camera", action="store_true", default=True)
    p.add_argument("--smooth_method", type=str, default="kalman",
                   choices=["kalman", "simple"])
    p.add_argument("--sliding_window_stride", type=int, default=24)
    p.add_argument("--batch_windows", type=int, default=None,
                   help="Reconstruct N sliding windows per batched denoise "
                        "(data-parallel across the device mesh). Default: "
                        "the mesh's dp size when a dp>1 mesh is set, else 1.")
    p.add_argument("--post_reconstruction", action="store_true", default=True)
    p.add_argument("--no_post_reconstruction", dest="post_reconstruction",
                   action="store_false")
    p.add_argument("--pointcloud_save_frame_interval", type=int, default=10)
    p.add_argument("--align_pointmaps", action="store_true", default=False)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="If set, write a jax.profiler trace here.")
    p.add_argument("--wire_rgb", type=str, default=None,
                   choices=["u8", "yuv420"],
                   help="compact D2H rgb wire format (default: auto)")
    p.add_argument("--wire_input", type=str, default="u8",
                   choices=["u8", "yuv420"],
                   help="H2D pixel wire; yuv420 is 2x smaller and lossless "
                        "up to a resample roundtrip for mp4-decoded input")
    p.add_argument("--wire_disparity", type=str, default="fp16",
                   choices=["fp16", "u8"],
                   help="compact D2H disparity wire (u8 = sqrt-domain 8-bit)")
    p.add_argument("--dp", type=int, default=None,
                   help="Data-parallel mesh axis (requires multiple devices).")
    p.add_argument("--tp", type=int, default=None,
                   help="Tensor-parallel mesh axis.")
    return p.parse_args(argv)


def build_pipeline(args: argparse.Namespace):
    """Construct an AetherPipeline from a checkpoint or random init."""
    import jax
    import jax.numpy as jnp

    from aether_tpu.config import PipelineConfig
    from aether_tpu.pipeline import AetherPipeline

    cache_dir = os.environ.get(
        "AETHER_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "aether_tpu",
                     "jax_cache"),
    )
    if cache_dir and cache_dir.lower() not in ("0", "off", "false"):
        # persistent XLA compile cache, ON by default: a restarted
        # server/eval skips the multi-minute per-(task, steps, shape)
        # compiles (bench.py uses the same mechanism with .jax_cache).
        # AETHER_JAX_CACHE overrides the location; =0 disables.
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_accel = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    if on_accel:
        from aether_tpu.utils.profiling import warm_transfer_channel

        warm_transfer_channel()  # must precede param allocation (see docstring)

    mesh = None
    if (getattr(args, "dp", None) or getattr(args, "tp", None)) and \
            len(jax.devices()) > 1:
        from aether_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=getattr(args, "dp", None),
                         tp=getattr(args, "tp", None))

    if args.random_init is not None:
        from aether_tpu.models import init_dit_params, init_vae_params

        cfg = (PipelineConfig.tiny() if args.random_init == "tiny"
               else PipelineConfig.aetherv1())
        key = jax.random.PRNGKey(0)
        act_quant = False
        if args.random_init in ("aetherv1-fp8", "aetherv1-int8"):
            from aether_tpu.models.dit import init_quantized_dit_params

            # -int8 is the bench/deployment configuration (int8 weights +
            # dynamic int8 activations — 2x MXU peak, 9x lower output error
            # than fp8; BASELINE.md quant gate), graph-identical to bench.py
            # so its persistent compile-cache entries are reused
            dit_params = init_quantized_dit_params(
                key, cfg.dit,
                dtype=jnp.int8 if args.random_init == "aetherv1-int8"
                else None)
            act_quant = args.random_init == "aetherv1-int8"
        else:
            dit_params = init_dit_params(key, cfg.dit, dtype=dtype)
        vae_params = init_vae_params(jax.random.fold_in(key, 1), cfg.vae,
                                     dtype=dtype)
        text = np.zeros(
            (1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim), np.float32
        )
        return AetherPipeline(cfg, dit_params, vae_params, text,
                              compute_dtype=dtype, mesh=mesh,
                              act_quant=act_quant,
                              wire_rgb=getattr(args, "wire_rgb", None),
                              wire_input=getattr(args, "wire_input", "u8"),
                              wire_disparity=getattr(args, "wire_disparity",
                                                     "fp16")), cfg

    if args.checkpoint is None:
        raise SystemExit(
            "one of --checkpoint or --random-init is required (no network "
            "access to fetch the upstream HF checkpoint)"
        )
    from aether_tpu.io.weights import load_checkpoint

    cfg = getattr(PipelineConfig, getattr(args, "config", "aetherv1"))()
    dit_params = load_checkpoint(os.path.join(args.checkpoint, "dit"))
    vae_params = load_checkpoint(os.path.join(args.checkpoint, "vae"))
    text = np.load(os.path.join(args.checkpoint, "text_embeds.npy"))
    return AetherPipeline(cfg, dit_params, vae_params, text,
                          compute_dtype=dtype, mesh=mesh,
                          wire_rgb=getattr(args, "wire_rgb", None),
                          wire_input=getattr(args, "wire_input", "u8"),
                          wire_disparity=getattr(args, "wire_disparity",
                                                 "fp16")), cfg


def _load_video(path: str) -> np.ndarray:
    import imageio.v3 as iio

    return np.asarray(iio.imread(path)).astype(np.float32) / 255.0


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def _flip_xy_pointmap(pointmap: np.ndarray) -> np.ndarray:
    """Viewer-convention fix: negate world X and Y (reference demo.py:455-460)."""
    out = pointmap.copy()
    out[..., 0] = -out[..., 0]
    out[..., 1] = -out[..., 1]
    return out


def _flip_xy_poses(poses: np.ndarray) -> np.ndarray:
    """Matching pose flip: negate X/Y rows and columns of R, X/Y of t
    (reference demo.py:462-478)."""
    out = poses.copy()
    out[..., 0, :3] = -out[..., 0, :3]
    out[..., 1, :3] = -out[..., 1, :3]
    out[..., :3, 0] = -out[..., :3, 0]
    out[..., :3, 1] = -out[..., :3, 1]
    out[..., 0, 3] = -out[..., 0, 3]
    out[..., 1, 3] = -out[..., 1, 3]
    return out


def save_output(
    rgb: np.ndarray,
    disparity: np.ndarray,
    args: argparse.Namespace,
    poses: Optional[np.ndarray] = None,
    raymap: Optional[np.ndarray] = None,
    pointmap: Optional[np.ndarray] = None,
) -> dict:
    """Write rgb/disparity videos, per-frame GLB scenes, PLY cloud, poses.

    Returns a dict of written paths. Mirrors reference ``demo.py:425-521``
    (axis-flip fixups included) with our fallback-aware writers.
    """
    from aether_tpu.pipeline.aether import AetherPipelineOutput
    from aether_tpu.viz import (
        colorize_depth,
        predictions_to_glb,
        save_ply,
        save_video,
    )

    os.makedirs(args.output_dir, exist_ok=True)

    if pointmap is None:
        assert raymap is not None, "raymap is required to derive the pointmap"
        window = AetherPipelineOutput(rgb=rgb, disparity=disparity, raymap=raymap)
        _, _, poses_from_blend, pointmap = blend_and_merge_window_results(
            [window], [0], args.height, args.width,
            smooth_camera=args.smooth_camera, smooth_method=args.smooth_method,
            align_pointmaps=args.align_pointmaps,
        )
        if poses is None:
            poses = poses_from_blend
    if poses is None:
        assert raymap is not None, "raymap is required to derive poses"
        poses, _, _ = raymap_to_poses(raymap, ray_o_scale_inv=0.1)
        poses = np.asarray(poses)

    pointmap = _flip_xy_pointmap(np.asarray(pointmap))
    poses = _flip_xy_poses(np.asarray(poses))

    if args.task == "reconstruction":
        stem = f"reconstruction_{os.path.splitext(os.path.basename(args.video))[0]}"
    elif args.task == "prediction":
        stem = f"prediction_{os.path.splitext(os.path.basename(args.image))[0]}"
    else:
        stem = (
            f"planning_{os.path.splitext(os.path.basename(args.image))[0]}"
            f"_{os.path.splitext(os.path.basename(args.goal))[0]}"
        )
    stem = os.path.join(args.output_dir, stem)

    written = {}
    written["rgb_video"] = save_video(
        f"{stem}_rgb.mp4", np.clip(rgb, 0, 1), fps=12
    )
    written["disparity_video"] = save_video(
        f"{stem}_disparity.mp4", colorize_depth(disparity), fps=12
    )
    np.savetxt(f"{stem}_poses.txt", poses.reshape(len(poses), -1), fmt="%.9g")
    written["poses"] = f"{stem}_poses.txt"

    depth = 1.0 / np.clip(disparity, 1e-8, 1e8)
    save_ply(
        pointmap, np.clip(rgb, 0, 1) * 255, f"{stem}_pointcloud.ply",
        mask=depth < args.max_depth,
    )
    written["ply"] = f"{stem}_pointcloud.ply"

    glbs = []
    for frame_idx in range(pointmap.shape[0])[:: args.pointcloud_save_frame_interval]:
        predictions = {
            "world_points": pointmap[frame_idx : frame_idx + 1],
            "images": rgb[frame_idx : frame_idx + 1],
            "depths": depth[frame_idx : frame_idx + 1],
            "camera_poses": poses[frame_idx : frame_idx + 1],
        }
        path = f"{stem}_pointcloud_frame_{frame_idx}.glb"
        predictions_to_glb(
            predictions, filter_by_frames="all", show_cam=True,
            max_depth=args.max_depth, rtol=args.rtol,
            frame_rel_idx=float(frame_idx) / pointmap.shape[0],
        ).write(path)
        glbs.append(path)
    written["glb"] = glbs
    return written


def main(argv=None) -> None:
    args = parse_args(argv)
    pipeline, _cfg = build_pipeline(args)

    if args.batch_windows is None:
        # default to one window per dp-mesh slice: 8 chips at dp=8 reconstruct
        # 8 sliding windows in the wall-clock of one (serial on 1 chip)
        mesh = pipeline.mesh
        args.batch_windows = (
            int(mesh.shape.get("dp", 1)) if mesh is not None else 1
        )

    raymap = np.load(args.raymap_action) if args.raymap_action else None

    profile_ctx = None
    if args.profile_dir:
        import jax

        profile_ctx = jax.profiler.trace(args.profile_dir)
        profile_ctx.__enter__()

    try:
        if args.task == "reconstruction":
            assert args.video is not None, "--video is required for reconstruction"
            video = _load_video(args.video)
            from aether_tpu.pipeline.windowing import run_windowed_reconstruction

            window_results, window_indices, args.num_frames = (
                run_windowed_reconstruction(
                    pipeline, video, raymap=raymap,
                    height=args.height, width=args.width,
                    num_frames=args.num_frames, fps=args.fps,
                    num_inference_steps=args.num_inference_steps,
                    stride=args.sliding_window_stride, seed=args.seed,
                    batch_windows=args.batch_windows,
                )
            )
            rgb, disparity, poses, pointmaps = blend_and_merge_window_results(
                window_results, window_indices, args.height, args.width,
                smooth_camera=args.smooth_camera,
                smooth_method=args.smooth_method,
                align_pointmaps=args.align_pointmaps,
            )
            written = save_output(rgb, disparity, args, poses=poses,
                                  pointmap=pointmaps)
        else:
            assert args.image is not None, f"--image is required for {args.task}"
            if args.task == "planning":
                assert args.goal is not None, "--goal is required for planning"
            image = _load_image(args.image)
            goal = _load_image(args.goal) if args.goal else None
            with stage_timer(args.task):
                out = pipeline(
                    task=args.task, image=image, goal=goal, raymap=raymap,
                    height=args.height, width=args.width,
                    num_frames=args.num_frames, fps=args.fps,
                    num_inference_steps=args.num_inference_steps,
                    guidance_scale=args.guidance_scale,
                    use_dynamic_cfg=args.use_dynamic_cfg, seed=args.seed,
                )
            if args.post_reconstruction:
                # re-run 4-step reconstruction on the generated RGB for cleaner
                # depth/pose (reference demo.py:588-606)
                with stage_timer("post_reconstruction"):
                    recon = pipeline(
                        task="reconstruction", video=out.rgb,
                        height=args.height, width=args.width,
                        num_frames=args.num_frames, fps=args.fps,
                        num_inference_steps=4, guidance_scale=1.0,
                        use_dynamic_cfg=False, seed=args.seed,
                    )
                written = save_output(out.rgb, recon.disparity, args,
                                      raymap=recon.raymap)
            else:
                written = save_output(out.rgb, out.disparity, args,
                                      raymap=out.raymap)
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)

    for kind, path in written.items():
        print(f"{kind}: {path}")


if __name__ == "__main__":
    main()
