from aether_tpu.parallel.mesh import (  # noqa: F401
    dit_param_sharding,
    make_mesh,
    shard_params,
)
