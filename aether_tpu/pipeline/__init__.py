from aether_tpu.pipeline.aether import (  # noqa: F401
    AetherPipeline,
    AetherPipelineOutput,
    DeferredOutput,
)
from aether_tpu.pipeline.windowing import (  # noqa: F401
    blend_and_merge_window_results,
    get_window_starts,
)
