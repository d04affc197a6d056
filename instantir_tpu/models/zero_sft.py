"""ZeroSFT residual fusion (the reference's alternative ControlNet connector).

TPU-native counterpart of the dormant ``module/unet/unet_2d_ZeroSFT.py:81-136``
(SUPIR-style): instead of *adding* the aggregator's residual to each skip
connection, the residual modulates the (up-path ∥ skip) concatenation through
a GroupNorm-SFT with zero-initialized convolutions:

  h_raw = [h_ori ∥ h]                           (the plain concat path)
  h     = h + zero_conv(c)                      (1×1, zero-init)
  h     = [h_ori ∥ h]
  γ, β  = zero_mul(a), zero_add(a),  a = SiLU(conv3×3(c))   (3×3, zero-init)
  out   = GN(h)·(γ+1) + β
  return out·s + h_raw·(1−s)                    (s = control_scale)

``UNet2DConditionModel`` exposes it via ``UNetConfig.residual_fusion =
"zero_sft"``: down/mid residuals are then *paired* with the skips and every
up-block resnet fuses through its own ZeroSFT (reference blocks
``unet_2d_ZeroSFT_blocks.py:2541,2717``), the mid residual through
``mid_zero_sft`` (``unet_2d_ZeroSFT.py:486,1351``). The ``mask`` branch of
the torch module is dead code behind ``assert mask is False`` and is not
carried over.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import GroupNorm32

Dtype = Any


class ZeroSFT(nn.Module):
    """norm_nc/label_nc/concat_channels are inferred from the call shapes."""

    nhidden: int = 128
    norm_num_groups: int = 32
    use_norm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        control: jnp.ndarray,  # [B, H, W, label_nc] residual ("c")
        h: jnp.ndarray,  # [B, H, W, norm_nc] skip (or mid) hidden
        h_ori: Optional[jnp.ndarray] = None,  # [B, H, W, concat_ch] up-path hidden
        control_scale: float = 1.0,
    ) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        zero = nn.initializers.zeros_init()
        pad = [(1, 1), (1, 1)]

        h_raw = jnp.concatenate([h_ori, h], axis=-1) if h_ori is not None else h
        h = h + nn.Conv(h.shape[-1], (1, 1), kernel_init=zero, name="zero_conv", **common)(control)
        if h_ori is not None:
            # pre_concat (concat_channels != 0 in every reference up-block use)
            h = jnp.concatenate([h_ori, h], axis=-1)

        actv = nn.silu(nn.Conv(self.nhidden, (3, 3), padding=pad, name="mlp_shared", **common)(control))
        gamma = nn.Conv(h.shape[-1], (3, 3), padding=pad, kernel_init=zero, name="zero_mul", **common)(actv)
        beta = nn.Conv(h.shape[-1], (3, 3), padding=pad, kernel_init=zero, name="zero_add", **common)(actv)

        if self.use_norm:
            hn = GroupNorm32(num_groups=self.norm_num_groups, dtype=self.dtype, name="param_free_norm")(h)
        else:
            hn = h
        h = hn * (gamma + 1.0) + beta
        if control_scale == 1.0:
            return h
        return h * control_scale + h_raw * (1.0 - control_scale)
