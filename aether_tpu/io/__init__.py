from aether_tpu.io.weights import (  # noqa: F401
    convert_dit_state_dict,
    convert_vae_state_dict,
    load_checkpoint,
    save_checkpoint,
)
