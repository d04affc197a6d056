from instantir_tpu.pipeline.instantir import (
    InstantIRPipeline,
    RestoreConfig,
    build_step_phases,
    rescale_noise_cfg,
)
from instantir_tpu.pipeline.slots import SlotSampler, SlotState, build_step_tables

__all__ = [
    "InstantIRPipeline",
    "RestoreConfig",
    "build_step_phases",
    "rescale_noise_cfg",
    "SlotSampler",
    "SlotState",
    "build_step_tables",
]
