from aether_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    diffusion_loss,
    make_train_step,
)
