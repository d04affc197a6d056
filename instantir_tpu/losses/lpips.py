"""LPIPS perceptual loss — VGG16 trunk + learned linear heads, in Flax.

Re-implements what the reference gets from the ``lpips`` package
(``losses/losses.py:83-97``: ``lpips.LPIPS(net='vgg')``): images are shifted
into VGG's input statistics, VGG16 features are taken at the five relu
checkpoints (relu1_2/2_2/3_3/4_3/5_3), unit-normalized over channels, squared
differences are mapped through per-layer 1×1 "lin" heads, spatially averaged
and summed.

Weights are the published LPIPS checkpoint (torchvision VGG16 features + the
``lin{k}.model.1.weight`` heads); ``convert_lpips`` maps a torch state dict
exported via ``lpips.LPIPS(net='vgg').state_dict()`` into this module's tree.
The architecture runs NHWC with XLA fused convs — fp32 by default (the loss
is a training-objective term; bf16 halves its gradient precision for no
meaningful speedup at 512²).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# torchvision vgg16.features conv indices per LPIPS slice (lpips
# pretrained_networks.vgg16: slice1=[0:4), slice2=[4:9), slice3=[9:16),
# slice4=[16:23), slice5=[23:30))
VGG16_SLICES: Tuple[Tuple[int, ...], ...] = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
VGG16_CHANNELS: Tuple[int, ...] = (64, 128, 256, 512, 512)

# lpips.ScalingLayer constants (shift/scale from [-1,1] inputs to VGG stats)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


@dataclasses.dataclass(frozen=True)
class LPIPSConfig:
    slices: Tuple[Tuple[int, ...], ...] = VGG16_SLICES
    channels: Tuple[int, ...] = VGG16_CHANNELS
    eps: float = 1e-10


def tiny_lpips_config() -> LPIPSConfig:
    """Two slices of one tiny conv each — for unit tests."""
    return LPIPSConfig(slices=((0,), (2,)), channels=(4, 8))


class LPIPS(nn.Module):
    """inputs: two [B, H, W, 3] images in [-1, 1] → per-sample distance [B]."""

    config: LPIPSConfig = LPIPSConfig()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def scale_in(img):
            return (img - _SHIFT) / _SCALE

        # run both images through the trunk in one batch
        b = x.shape[0]
        h = jnp.concatenate([scale_in(x), scale_in(y)], axis=0).astype(self.dtype)

        total = jnp.zeros((b,), jnp.float32)
        for si, (conv_ids, ch) in enumerate(zip(cfg.slices, cfg.channels)):
            if si > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for ci in conv_ids:
                h = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{ci}", **common)(h)
                h = nn.relu(h)
            # unit-normalize over channels (lpips normalize_tensor)
            f = h.astype(jnp.float32)
            f = f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + cfg.eps)
            fx, fy = f[:b], f[b:]
            d = (fx - fy) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{si}", dtype=jnp.float32, param_dtype=jnp.float32)
            total = total + jnp.mean(w(d), axis=(1, 2, 3))
        return total


def convert_lpips(sd: Dict[str, np.ndarray], config: LPIPSConfig = LPIPSConfig()) -> Dict[str, Any]:
    """torch ``lpips.LPIPS(net='vgg').state_dict()`` → flax param tree.

    Expected keys: ``net.slice{k}.{i}.weight/bias`` (torchvision conv indices)
    and ``lin{k}.model.1.weight`` ([1, C, 1, 1] heads). The scaling constants
    are architecture constants here, not parameters.
    """
    params: Dict[str, Any] = {}
    for si, conv_ids in enumerate(config.slices):
        for ci in conv_ids:
            wkey = f"net.slice{si + 1}.{ci}.weight"
            if wkey not in sd:
                raise KeyError(f"LPIPS checkpoint is missing {wkey}")
            w = np.asarray(sd[wkey], np.float32)  # [out, in, kh, kw]
            params[f"conv_{ci}"] = {
                "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": np.asarray(sd[f"net.slice{si + 1}.{ci}.bias"], np.float32),
            }
        lkey = f"lin{si}.model.1.weight"
        if lkey not in sd:
            raise KeyError(f"LPIPS checkpoint is missing {lkey}")
        lw = np.asarray(sd[lkey], np.float32)  # [1, C, 1, 1]
        params[f"lin_{si}"] = {"kernel": np.ascontiguousarray(np.transpose(lw, (2, 3, 1, 0)))}
    return {"params": params}
