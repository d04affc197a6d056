"""Loss library — config-instantiated, pure-JAX, registry-dispatched.

Rebuild of the reference loss zoo (``losses/losses.py``). Live losses in the
reference training recipes (``config_files/losses.yaml``): L2 with
importance-sampling weights (stage 1/2 diffusion objective) and Huber with
``huber_c=0.001`` (previewer LCM distillation). Also provided: L1,
WeightedNoise, and DINOLoss (teacher-centered softmax CE over DINOv2 tokens,
``losses/losses.py:375-465``) implemented against this framework's own
DINOv2 tower.

Losses that require external pretrained weights unavailable offline (LPIPS'
VGG, DreamSim, CLIP-vision, ArcFace — the reference's import of
``pretrained_models.arcface`` is itself broken in-tree, SURVEY.md §2.5) are
registered as stubs that raise with a clear message at *construction*, so
configs referencing them fail fast instead of mid-training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from instantir_tpu.losses.loss_config import LossesConfig, SingleLossConfig


@dataclasses.dataclass
class DiffusionLossInputs:
    """Everything a diffusion-space loss may consume (pytree of arrays)."""

    predicted: jnp.ndarray  # model output (ε̂ or consistency pred)
    target: jnp.ndarray  # ε or distillation target
    timesteps: Optional[jnp.ndarray] = None  # [B]
    weights: Optional[jnp.ndarray] = None  # [B] importance weights
    pred_image: Optional[jnp.ndarray] = None  # decoded prediction (image-space losses)
    target_image: Optional[jnp.ndarray] = None


class Loss:
    """Base: __call__(inputs) → scalar."""

    def __init__(self, visualize_every_k: int = -1, **kwargs):
        self.visualize_every_k = visualize_every_k

    def __call__(self, inputs: DiffusionLossInputs) -> jnp.ndarray:
        raise NotImplementedError


def _weighted_mean(per_sample: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weights is None:
        return jnp.mean(per_sample)
    return jnp.mean(per_sample * weights.astype(per_sample.dtype))


class L2Loss(Loss):
    """MSE with optional per-sample importance weights (reference ``:125-143``)."""

    def __call__(self, inputs: DiffusionLossInputs) -> jnp.ndarray:
        per = jnp.mean(
            (inputs.predicted.astype(jnp.float32) - inputs.target.astype(jnp.float32)) ** 2,
            axis=tuple(range(1, inputs.predicted.ndim)),
        )
        return _weighted_mean(per, inputs.weights)


class L1Loss(Loss):
    def __call__(self, inputs: DiffusionLossInputs) -> jnp.ndarray:
        per = jnp.mean(
            jnp.abs(inputs.predicted.astype(jnp.float32) - inputs.target.astype(jnp.float32)),
            axis=tuple(range(1, inputs.predicted.ndim)),
        )
        return _weighted_mean(per, inputs.weights)


class HuberLoss(Loss):
    """Pseudo-Huber: sqrt(d² + c²) − c (reference ``:146-166``, c=0.001)."""

    def __init__(self, huber_c: float = 0.001, **kwargs):
        super().__init__(**kwargs)
        self.huber_c = huber_c

    def __call__(self, inputs: DiffusionLossInputs) -> jnp.ndarray:
        d2 = (inputs.predicted.astype(jnp.float32) - inputs.target.astype(jnp.float32)) ** 2
        per = jnp.mean(
            jnp.sqrt(d2 + self.huber_c**2) - self.huber_c, axis=tuple(range(1, inputs.predicted.ndim))
        )
        return _weighted_mean(per, inputs.weights)


class WeightedNoiseLoss(Loss):
    """L2 with externally supplied per-sample weights (reference ``:169-185``)."""

    def __call__(self, inputs: DiffusionLossInputs) -> jnp.ndarray:
        return L2Loss.__call__(self, inputs)


class DINOLoss(Loss):
    """Teacher-centered softmax cross-entropy over DINOv2 tokens
    (reference ``:375-465``): student tokens at temperature ``s_t``, teacher
    tokens centered by a running mean at temperature ``t_t``.

    Needs a feature_fn (images → tokens) supplied by the trainer — typically
    the framework's DINOv2 apply with loaded weights.
    """

    def __init__(
        self,
        feature_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        student_temp: float = 0.1,
        teacher_temp: float = 0.04,
        center_momentum: float = 0.9,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.feature_fn = feature_fn
        self.student_temp = student_temp
        self.teacher_temp = teacher_temp
        self.center_momentum = center_momentum
        self.center = None  # running center, updated by the trainer

    def __call__(self, inputs: DiffusionLossInputs) -> jnp.ndarray:
        if self.feature_fn is None:
            raise ValueError("DINOLoss requires feature_fn (DINOv2 apply with params)")
        student = self.feature_fn(inputs.pred_image)
        teacher = jax.lax.stop_gradient(self.feature_fn(inputs.target_image))
        center = 0.0 if self.center is None else self.center
        t = jax.nn.softmax((teacher - center) / self.teacher_temp, axis=-1)
        log_s = jax.nn.log_softmax(student / self.student_temp, axis=-1)
        loss = -jnp.mean(jnp.sum(t * log_s, axis=-1))
        # expose the new center for the trainer to fold in (momentum update)
        self.latest_teacher_mean = jnp.mean(teacher, axis=(0, 1))
        return loss

    def update_center(self):
        if not hasattr(self, "latest_teacher_mean"):
            return
        m = self.center_momentum
        self.center = (
            self.latest_teacher_mean if self.center is None else self.center * m + self.latest_teacher_mean * (1 - m)
        )


def _unavailable(name: str, why: str):
    class _Stub(Loss):
        def __init__(self, **kwargs):
            raise NotImplementedError(
                f"{name} requires pretrained weights unavailable in this environment ({why}). "
                f"Provide a custom implementation via LOSS_REGISTRY['{name}'] before building losses."
            )

    _Stub.__name__ = name
    return _Stub


LOSS_REGISTRY: Dict[str, Any] = {
    "L2Loss": L2Loss,
    "L1Loss": L1Loss,
    "HuberLoss": HuberLoss,
    "WeightedNoiseLoss": WeightedNoiseLoss,
    "DINOLoss": DINOLoss,
    "LPIPSLoss": _unavailable("LPIPSLoss", "VGG/LPIPS weights"),
    "DreamSIMLoss": _unavailable("DreamSIMLoss", "DreamSim weights"),
    "CLIPLoss": _unavailable("CLIPLoss", "CLIP vision weights"),
    "IDLoss": _unavailable("IDLoss", "ArcFace weights; broken in the reference too"),
}


def build_losses(configs: List[SingleLossConfig], **shared_kwargs) -> List:
    """Instantiate (loss, weight) pairs from config (reference ``Loss`` dispatch)."""
    out = []
    for c in configs:
        cls = LOSS_REGISTRY[c.name]
        kwargs = dict(c.init_params)
        if c.name == "DINOLoss" and "feature_fn" in shared_kwargs:
            kwargs.setdefault("feature_fn", shared_kwargs["feature_fn"])
        out.append((cls(visualize_every_k=c.visualize_every_k, **kwargs), c.weight))
    return out
