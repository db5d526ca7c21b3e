from aether_tpu.parallel.distributed import (  # noqa: F401
    barrier,
    initialize,
    is_distributed,
    is_main,
)
from aether_tpu.parallel.mesh import (  # noqa: F401
    dit_param_sharding,
    make_mesh,
    shard_params,
)
from aether_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_block_scan,
    make_pp_mesh,
    pp_block_sharding,
    shard_blocks_pp,
)
