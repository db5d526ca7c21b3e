"""aether-tpu: a TPU-native geometric world-modeling framework in JAX.

Re-implements the full capability surface of InternRobotics/Aether (a CogVideoX-based
video diffusion world model that jointly denoises RGB / sqrt-disparity / camera
raymaps for 4D reconstruction, action-conditioned prediction and goal-conditioned
planning) as an idiomatic JAX/XLA/Pallas stack:

- ``aether_tpu.geometry``   raymap <-> pose conversion, pointmap lifting, alignment,
                            smoothing (ref: aether/utils/postprocess_utils.py)
- ``aether_tpu.schedule``   CogVideoX zero-terminal-SNR v-prediction schedule and the
                            SDE-DPM-Solver++(2M) sampler step as pure functions
- ``aether_tpu.models``     the CogVideoX DiT denoiser and causal 3D VAE
- ``aether_tpu.ops``        Pallas TPU kernels (flash attention)
- ``aether_tpu.pipeline``   task dispatch, CFG, jit-compiled sampling loop, sliding
                            window stitching (ref: aether/pipelines/..., scripts/demo.py)
- ``aether_tpu.parallel``   device-mesh construction and sharding rules
- ``aether_tpu.train``      v-prediction fine-tuning: Trainer, EMA, remat, data
- ``aether_tpu.eval``       video-depth and relative-pose benchmark harnesses
- ``aether_tpu.viz``        PLY/GLB/colormap/video export (dependency-free)
- ``aether_tpu.apps``       CLI demo, web serving, camera-action generation
- ``aether_tpu.io``         checkpoint conversion + orbax persistence
- ``aether_tpu.utils``      preprocessing, profiling/tracing
"""

__version__ = "0.1.0"

from aether_tpu.config import (  # noqa: F401
    DiTConfig,
    PipelineConfig,
    SchedulerConfig,
    VAEConfig,
)
