"""YAML → dataclass loss configuration.

Replaces the reference's pyrallis config (``losses/loss_config.py:4-15``,
``config_files/losses.yaml``): two loss groups, ``diffusion_losses`` applied
to the ε/latent objective and ``lcm_losses`` applied to the consistency
(previewer distillation) objective.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import yaml


@dataclasses.dataclass
class SingleLossConfig:
    name: str
    weight: float = 1.0
    init_params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    visualize_every_k: int = -1


@dataclasses.dataclass
class LossesConfig:
    diffusion_losses: List[SingleLossConfig] = dataclasses.field(default_factory=list)
    lcm_losses: List[SingleLossConfig] = dataclasses.field(default_factory=list)


def load_losses_config(path: str) -> LossesConfig:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    def parse(items):
        return [SingleLossConfig(**i) for i in (items or [])]
    return LossesConfig(
        diffusion_losses=parse(raw.get("diffusion_losses")),
        lcm_losses=parse(raw.get("lcm_losses")),
    )
