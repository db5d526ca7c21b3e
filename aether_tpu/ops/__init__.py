from aether_tpu.ops.flash_attention import (  # noqa: F401
    attention_reference,
    flash_attention,
)
