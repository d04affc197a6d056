from instantir_tpu.losses.losses import (
    LOSS_REGISTRY,
    DiffusionLossInputs,
    HuberLoss,
    L1Loss,
    L2Loss,
    Loss,
    WeightedNoiseLoss,
    DINOLoss,
    build_losses,
)
from instantir_tpu.losses.loss_config import LossesConfig, SingleLossConfig, load_losses_config

__all__ = [
    "LOSS_REGISTRY",
    "DiffusionLossInputs",
    "HuberLoss",
    "L1Loss",
    "L2Loss",
    "Loss",
    "WeightedNoiseLoss",
    "DINOLoss",
    "build_losses",
    "LossesConfig",
    "SingleLossConfig",
    "load_losses_config",
]
