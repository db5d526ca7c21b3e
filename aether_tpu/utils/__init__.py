from aether_tpu.utils.preprocess import (  # noqa: F401
    crop_pad,
    imcrop_center,
    preprocess_image,
    preprocess_video,
)
