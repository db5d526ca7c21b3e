"""Evaluation harness: video-depth and relative-pose benchmarks (reference L5).

Capability parity with reference ``evaluation/video_depth/`` and
``evaluation/rel_pose/``: the same 2-D sliding-window inference drivers, GT
readers, depth alignment modes (median / lstsq / LAD / LAD2 / Weiszfeld scale),
ATE / RPE pose metrics, and multi-process sequence sharding — with the metric
cores on jax.numpy (device-executable) and the process fan-out expressed as
host sharding over ``jax.process_index()`` instead of HF Accelerate.
"""

from aether_tpu.eval.depth_metrics import depth_evaluation, group_by_directory
from aether_tpu.eval.pose_metrics import (
    ate_rmse,
    eval_metrics,
    load_tum_file,
    rpe,
    save_tum_poses,
)
from aether_tpu.eval.sharding import shard_sequences

__all__ = [
    "depth_evaluation",
    "group_by_directory",
    "ate_rmse",
    "rpe",
    "eval_metrics",
    "load_tum_file",
    "save_tum_poses",
    "shard_sequences",
]
