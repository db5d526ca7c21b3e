from aether_tpu.models.dit import dit_forward, init_dit_params  # noqa: F401
from aether_tpu.models.rope import (  # noqa: F401
    get_1d_rotary_pos_embed,
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
    prepare_rotary_positional_embeddings,
)
from aether_tpu.models.vae import (  # noqa: F401
    init_vae_params,
    vae_decode,
    vae_decode_chunked,
    vae_encode,
    vae_encode_chunked,
)
