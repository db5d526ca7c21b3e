from aether_tpu.schedule.dpm import (  # noqa: F401
    SamplingPlan,
    compute_alphas_cumprod,
    dpm_step,
    make_sampling_plan,
    set_timesteps,
)
