"""Diffusion numerics as pure functions over precomputed schedule tables.

TPU-native design: every routine here is a stateless function of a
``DiffusionSchedule`` (a pytree of fp32 tables) and *batched per-sample
timesteps* (shape ``[B]`` int32), so the whole sampler fits inside a single
``jax.jit``/``lax.scan`` with no Python-level scheduler state, no
``set_timesteps`` mutation, and no host sync. Timestep *sequences* (which are
static metadata) are built host-side in numpy.

Semantics match the reference implementation:
  * DDPM/beta tables and add_noise — reference
    ``schedulers/lcm_single_step_scheduler.py:214-247,492-513``
  * LCM single-step boundary scalings and step — reference
    ``schedulers/lcm_single_step_scheduler.py:401-489``
  * LCM timestep spacing — reference
    ``schedulers/lcm_single_step_scheduler.py:388-395``
  * DDPM inference spacing ("leading"/"trailing"/"linspace") and the
    stochastic DDPM step — diffusers ``DDPMScheduler`` semantics used by
    ``infer.py:137`` (variance_type fixed_small, epsilon prediction).
  * DDIM solver step used by previewer distillation — reference
    ``train_previewer_lora.py:194-219``.
  * zero-terminal-SNR rescale — reference
    ``schedulers/lcm_single_step_scheduler.py:94-127``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _expand(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Append singleton dims so a [B] vector broadcasts against a [B, ...] array."""
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed fp32 diffusion tables (a pytree; safe to close over in jit).

    ``alphas_cumprod`` has shape [num_train_timesteps]. ``final_alpha_cumprod``
    is the alpha-bar used for "previous step" lookups that fall off the start
    of the table (DDIM's ``set_alpha_to_one``).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True), default=1000)
    prediction_type: str = dataclasses.field(metadata=dict(static=True), default="epsilon")
    timestep_scaling: float = dataclasses.field(metadata=dict(static=True), default=10.0)
    sigma_data: float = dataclasses.field(metadata=dict(static=True), default=0.5)


def betas_for_alpha_bar(num_diffusion_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Glide squaredcos_cap_v2 beta schedule (cosine alpha-bar)."""

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal step has zero SNR (arXiv 2305.08891 §3)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].copy()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].copy()

    # Shift so the last timestep is zero, then scale so the first is unchanged.
    alphas_bar_sqrt = alphas_bar_sqrt - alphas_bar_sqrt_T
    alphas_bar_sqrt = alphas_bar_sqrt * alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    trained_betas: Optional[np.ndarray] = None,
    rescale_betas_zero_snr: bool = False,
    set_alpha_to_one: bool = True,
    prediction_type: str = "epsilon",
    timestep_scaling: float = 10.0,
) -> DiffusionSchedule:
    """Build the fp32 schedule tables (host-side numpy, then device constants)."""
    if trained_betas is not None:
        betas = np.asarray(trained_betas, dtype=np.float64)
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "squaredcos_cap_v2":
        betas = betas_for_alpha_bar(num_train_timesteps)
    else:
        raise NotImplementedError(f"unknown beta_schedule: {beta_schedule}")

    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)

    alphas_cumprod = np.cumprod(1.0 - betas)
    final_alpha = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    # HOST numpy tables: a jit that closes over them embeds the constants
    # straight from host memory. Device (jnp) tables would force a
    # device→host fetch at every trace of every closing-over program — a
    # relay round-trip here, and one that can fail outright when HBM is
    # near-full (observed with the merged-previewer sampler resident).
    return DiffusionSchedule(
        betas=np.asarray(betas, dtype=np.float32),
        alphas_cumprod=np.asarray(alphas_cumprod, dtype=np.float32),
        final_alpha_cumprod=np.float32(final_alpha),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        timestep_scaling=timestep_scaling,
    )


def sdxl_schedule(**overrides) -> DiffusionSchedule:
    """The SDXL-base DDPM schedule (scaled_linear 0.00085→0.012, T=1000)."""
    kwargs = dict(
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
    )
    kwargs.update(overrides)
    return make_schedule(**kwargs)


# ---------------------------------------------------------------------------
# Forward process and parameterization conversions (all take batched t [B]).
# ---------------------------------------------------------------------------


def _gather_bar(schedule: DiffusionSchedule, t: jnp.ndarray, ndim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sqrt(alpha_bar_t), sqrt(1-alpha_bar_t) broadcast to ndim dims, fp32."""
    t = jnp.asarray(t, dtype=jnp.int32)
    abar = jnp.asarray(schedule.alphas_cumprod)[t]  # host table → traced gather
    return _expand(jnp.sqrt(abar), ndim), _expand(jnp.sqrt(1.0 - abar), ndim)


def add_noise(schedule: DiffusionSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps  (batched t [B] or scalar)."""
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    sa, sb = _gather_bar(schedule, t, x0.ndim)
    return (sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)).astype(x0.dtype)


def get_velocity(schedule: DiffusionSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """v = sqrt(abar_t) eps - sqrt(1-abar_t) x0."""
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    sa, sb = _gather_bar(schedule, t, x0.ndim)
    return (sa * noise.astype(jnp.float32) - sb * x0.astype(jnp.float32)).astype(x0.dtype)


def pred_x0_from_eps(schedule: DiffusionSchedule, sample: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    sa, sb = _gather_bar(schedule, t, sample.ndim)
    return ((sample.astype(jnp.float32) - sb * eps.astype(jnp.float32)) / sa).astype(sample.dtype)


def pred_eps_from_x0(schedule: DiffusionSchedule, sample: jnp.ndarray, x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    sa, sb = _gather_bar(schedule, t, sample.ndim)
    return ((sample.astype(jnp.float32) - sa * x0.astype(jnp.float32)) / sb).astype(sample.dtype)


def pred_x0_from_v(schedule: DiffusionSchedule, sample: jnp.ndarray, v: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    sa, sb = _gather_bar(schedule, t, sample.ndim)
    return (sa * sample.astype(jnp.float32) - sb * v.astype(jnp.float32)).astype(sample.dtype)


def _predicted_x0(
    schedule: DiffusionSchedule, model_output: jnp.ndarray, sample: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    if schedule.prediction_type == "epsilon":
        return pred_x0_from_eps(schedule, sample, model_output, t)
    elif schedule.prediction_type == "sample":
        return model_output
    elif schedule.prediction_type == "v_prediction":
        return pred_x0_from_v(schedule, sample, model_output, t)
    raise ValueError(f"unknown prediction_type: {schedule.prediction_type}")


# ---------------------------------------------------------------------------
# Reverse steps.
# ---------------------------------------------------------------------------


def ddpm_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    variance_type: str = "fixed_small",
    clip_sample: bool = False,
    clip_sample_range: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One ancestral DDPM step x_t → x_{prev_t}; returns (prev_sample, pred_x0).

    ``t``/``prev_t`` are batched [B] (or scalar) int32; ``prev_t < 0`` selects
    ``final_alpha_cumprod`` — this replaces diffusers' ``previous_timestep``
    host logic so the step is scan-able. ``noise`` must be provided for t > 0
    (it is masked off at the final step).
    """
    x = sample.astype(jnp.float32)
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    prev_t = jnp.atleast_1d(jnp.asarray(prev_t, dtype=jnp.int32))

    abar_table = jnp.asarray(schedule.alphas_cumprod)  # host table → traced gather
    alpha_prod_t = _expand(abar_table[t], x.ndim)
    alpha_prod_prev = _expand(
        jnp.where(prev_t >= 0, abar_table[jnp.maximum(prev_t, 0)], schedule.final_alpha_cumprod),
        x.ndim,
    )
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha_t = alpha_prod_t / alpha_prod_prev
    current_beta_t = 1.0 - current_alpha_t

    pred_x0 = _predicted_x0(schedule, model_output.astype(jnp.float32), x, t)
    if clip_sample:
        pred_x0 = jnp.clip(pred_x0, -clip_sample_range, clip_sample_range)

    # mu_t coefficients (DDPM eq. 7)
    pred_original_coeff = jnp.sqrt(alpha_prod_prev) * current_beta_t / beta_prod_t
    current_sample_coeff = jnp.sqrt(current_alpha_t) * beta_prod_prev / beta_prod_t
    prev_sample = pred_original_coeff * pred_x0 + current_sample_coeff * x

    # variance (fixed_small: beta_tilde = (1-abar_prev)/(1-abar_t) * beta_t)
    if variance_type == "fixed_small":
        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta_t, 1e-20, None)
        sigma = jnp.sqrt(variance)
    elif variance_type == "fixed_large":
        sigma = jnp.sqrt(jnp.clip(current_beta_t, 1e-20, None))
    else:
        raise ValueError(f"unsupported variance_type: {variance_type}")

    if noise is not None:
        is_last = _expand((t <= 0).astype(jnp.float32), x.ndim)
        prev_sample = prev_sample + (1.0 - is_last) * sigma * noise.astype(jnp.float32)

    return prev_sample.astype(sample.dtype), pred_x0.astype(sample.dtype)


def ddim_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic DDIM step (eta=0); returns (prev_sample, pred_x0).

    Matches the distillation solver of ``train_previewer_lora.py:194-219``
    (ddim_alphas/ddim_sigmas with sigma=0).
    """
    del eta  # stochastic DDIM not needed by the framework; eta=0 always.
    x = sample.astype(jnp.float32)
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    prev_t = jnp.atleast_1d(jnp.asarray(prev_t, dtype=jnp.int32))

    abar_table = jnp.asarray(schedule.alphas_cumprod)  # host table → traced gather
    alpha_prod_prev = _expand(
        jnp.where(prev_t >= 0, abar_table[jnp.maximum(prev_t, 0)], schedule.final_alpha_cumprod),
        x.ndim,
    )
    pred_x0 = _predicted_x0(schedule, model_output.astype(jnp.float32), x, t)
    eps = pred_eps_from_x0(schedule, x, pred_x0, t).astype(jnp.float32)
    prev_sample = jnp.sqrt(alpha_prod_prev) * pred_x0 + jnp.sqrt(1.0 - alpha_prod_prev) * eps
    return prev_sample.astype(sample.dtype), pred_x0.astype(sample.dtype)


def lcm_boundary_scalings(
    t: jnp.ndarray, timestep_scaling: float = 10.0, sigma_data: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """c_skip, c_out for consistency-model boundary conditions.

    Reference ``schedulers/lcm_single_step_scheduler.py:401-407``.
    """
    scaled_t = jnp.asarray(t, dtype=jnp.float32) * timestep_scaling
    c_skip = sigma_data**2 / (scaled_t**2 + sigma_data**2)
    c_out = scaled_t / jnp.sqrt(scaled_t**2 + sigma_data**2)
    return c_skip, c_out


def lcm_single_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    clip_sample: bool = False,
    clip_sample_range: float = 1.0,
) -> jnp.ndarray:
    """One-step LCM denoise: c_out * pred_x0 + c_skip * x_t, batched t [B].

    Reference ``schedulers/lcm_single_step_scheduler.py:421-489``.
    """
    x = sample.astype(jnp.float32)
    t = jnp.atleast_1d(jnp.asarray(t, dtype=jnp.int32))
    pred_x0 = _predicted_x0(schedule, model_output.astype(jnp.float32), x, t)
    if clip_sample:
        pred_x0 = jnp.clip(pred_x0, -clip_sample_range, clip_sample_range)
    c_skip, c_out = lcm_boundary_scalings(t, schedule.timestep_scaling, schedule.sigma_data)
    denoised = _expand(c_out, x.ndim) * pred_x0 + _expand(c_skip, x.ndim) * x
    return denoised.astype(sample.dtype)


# ---------------------------------------------------------------------------
# Host-side timestep sequence builders (static metadata; plain numpy).
# ---------------------------------------------------------------------------


def ddpm_inference_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    timestep_spacing: str = "leading",
    steps_offset: int = 1,
) -> np.ndarray:
    """Descending int timesteps for DDPM sampling (diffusers spacing rules)."""
    if timestep_spacing == "linspace":
        ts = np.linspace(0, num_train_timesteps - 1, num_inference_steps).round()[::-1].astype(np.int64)
    elif timestep_spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts += steps_offset
    elif timestep_spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing: {timestep_spacing}")
    return ts


def ddpm_prev_timesteps(timesteps: np.ndarray, num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Per-entry previous timestep: t - T//n (may go negative at the end)."""
    stride = num_train_timesteps // num_inference_steps
    return np.asarray(timesteps, dtype=np.int64) - stride


def lcm_inference_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    original_inference_steps: int = 50,
    strength: float = 1.0,
) -> np.ndarray:
    """LCM spacing: subsample the k*c-1 training schedule, descending."""
    c = num_train_timesteps // original_inference_steps
    lcm_origin = np.asarray(list(range(1, int(original_inference_steps * strength) + 1))) * c - 1
    skipping_step = len(lcm_origin) // num_inference_steps
    if skipping_step < 1:
        raise ValueError(
            f"num_inference_steps={num_inference_steps} exceeds the {len(lcm_origin)}-entry "
            f"LCM origin schedule (original_inference_steps={original_inference_steps}, "
            f"strength={strength}); reduce num_inference_steps"
        )
    return lcm_origin[::-skipping_step][:num_inference_steps].astype(np.int64)


def ddim_solver_timesteps(num_train_timesteps: int = 1000, ddim_steps: int = 50) -> np.ndarray:
    """Ascending DDIM solver grid used for LCM distillation: (i+1)*c - 1."""
    step_ratio = num_train_timesteps // ddim_steps
    return (np.arange(1, ddim_steps + 1) * step_ratio - 1).astype(np.int64)


def importance_sampling_weights(num_train_timesteps: int, alpha: float = 0.5) -> np.ndarray:
    """Timestep-importance pmf: p(t) ∝ 1/T · (1 − alpha·cos(πt/T)).

    Reference ``utils/train_utils.py:239-241``.
    """
    t = np.arange(num_train_timesteps, dtype=np.float64)
    w = 1.0 / num_train_timesteps * (1.0 - alpha * np.cos(np.pi * t / num_train_timesteps))
    return (w / w.sum()).astype(np.float32)
