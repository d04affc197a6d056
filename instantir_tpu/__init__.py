"""instantir_tpu — a TPU-native blind-image-restoration framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of InstantIR
(arXiv 2410.06551; reference implementation surveyed in SURVEY.md): SDXL-based
diffusion restoration with a one-step LCM previewer, a ControlNet-style
Aggregator, and a DINOv2 + Perceiver-Resampler image-prompt adapter with
time-aware decoupled cross-attention.

Design stance (TPU-first, not a port):
  * the whole 30-step denoise loop is one jitted ``lax.scan`` — previewer UNet,
    LCM step, Aggregator, main UNet, and DDPM step all live in a single XLA
    program with weights resident in HBM and zero host round-trips;
  * LoRA on/off (the reference mutates module state per step) is a functional
    scalar ``lora_scale`` — both UNet modes share one compiled graph;
  * schedulers are pure functions over ``alphas_cumprod`` tables with batched,
    per-sample timesteps;
  * attention runs through a Pallas flash-attention kernel on TPU (XLA
    reference path on CPU), with the decoupled IP branch fused in the same
    call;
  * multi-device scaling is a ``jax.sharding.Mesh`` with pjit-placed
    collectives over ICI (data parallel, optional tensor-parallel axis).
"""

__version__ = "0.1.0"
