from instantir_tpu.pipeline.instantir import (
    InstantIRPipeline,
    RestoreConfig,
    build_step_phases,
    rescale_noise_cfg,
)

__all__ = ["InstantIRPipeline", "RestoreConfig", "build_step_phases", "rescale_noise_cfg"]
