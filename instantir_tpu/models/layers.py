"""Core layers: LoRA-capable Dense/Conv, fp32 GroupNorm, time embeddings.

LoRA is *functional* here — every LoRA-capable layer always computes
``y = base(x) + lora_scale · (alpha/r) · B(A(x))`` with zero-init B, and the
caller passes ``lora_scale`` per forward. The reference instead mutates
module state per step (``unet.enable_adapters()``/``disable_adapters()``,
``pipelines/sdxl_instantir.py:1545,1562``); a traced-or-static scalar keeps
both previewer-on and previewer-off UNet modes inside one compiled XLA
program, which is what lets the whole denoise loop live in a single
``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

default_kernel_init = nn.initializers.lecun_normal()


def merge_lora_tree(params, lora_scale: float, lora_alpha: float = 1.0):
    """Analytically fold every LoRA branch into its base kernel:
    ``W' = W + lora_scale·(alpha/r)·A·B`` (Dense) /
    ``K' = K + lora_scale·(alpha/r)·(A ∗ B₁ₓ₁)`` (Conv).

    Applying the returned tree with static ``lora_scale=0.0`` then skips the
    adapter matmuls entirely while producing the same output as the dynamic
    branch (to accumulation-order error) — the inference sampler merges the
    previewer LoRA once per restore instead of paying the rank-r matmul pair
    at every linear/conv of every preview step. Non-LoRA leaves are returned
    by reference (no copy); only lora-bearing base kernels get new buffers.
    """

    def walk(node):
        if not isinstance(node, dict):
            return node
        if (
            "base" in node and "lora_a" in node and "lora_b" in node
            and "kernel" in node["base"]  # quantized bases (int8 side tree) can't merge
        ):
            a = node["lora_a"]["kernel"]
            b = node["lora_b"]["kernel"]
            k = node["base"]["kernel"]
            rank = a.shape[-1]
            # native-dtype arithmetic (fp32 MXU accumulation either way):
            # matches the dynamic branch's bf16 rounding and keeps the
            # transient delta buffers at parameter width, not fp32
            if k.ndim == 2:  # Dense: a [in, r] @ b [r, out]
                delta = a @ b
            else:  # Conv: a [kh, kw, in, r], b [1, 1, r, out]
                delta = jnp.einsum("hwir,ro->hwio", a, b[0, 0])
            merged = k + jnp.asarray(lora_scale * lora_alpha / rank, k.dtype) * delta
            return {**node, "base": {**node["base"], "kernel": merged}}
        return {key: walk(v) for key, v in node.items()}

    return walk(params)


def _static_zero(lora_scale) -> bool:
    """True when lora_scale is a Python/static 0 — the LoRA branch can then
    be skipped entirely at trace time (the previewer-off UNet pass would
    otherwise pay ~10% extra FLOPs multiplying by zero)."""
    return isinstance(lora_scale, (int, float)) and lora_scale == 0.0


class QuantizableDense(nn.Module):
    """``nn.Dense``-compatible base linear (identical param names, init, and
    dtype promotion) that computes in int8 when its ``quant`` collection
    entry is present (``ops/quant.py::quantize_tree`` moves the kernel there
    as ``{kernel_q, kernel_scale}`` and prunes the fp leaf). W8A8: dynamic
    per-token activation quant + per-channel weights → the v5e MXU's 2×
    int8 rate (probe: tools/bench_int8_probe.py)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.has_variable("quant", "kernel_q"):
            from instantir_tpu.ops.quant import w8a8_dense

            kq = self.get_variable("quant", "kernel_q")
            ks = self.get_variable("quant", "kernel_scale")
            y = w8a8_dense(x.astype(self.dtype), kq, ks)
        elif self.has_variable("quant", "kernel_qw"):
            # weight-only W8 (QLoRA storage mode, ops/quant.py): int8 kernel
            # dequantized to the compute dtype, ordinary matmul — exactly
            # differentiable w.r.t. x (training through a frozen net)
            from instantir_tpu.ops.quant import dequantize_weight

            kernel = dequantize_weight(
                self.get_variable("quant", "kernel_qw"),
                self.get_variable("quant", "kernel_scale"),
                self.dtype,
            )
            xp = x.astype(self.dtype)
            y = jax.lax.dot_general(xp, kernel, (((xp.ndim - 1,), (0,)), ((), ())))
        else:
            kernel = self.param(
                "kernel", self.kernel_init, (jnp.shape(x)[-1], self.features), self.param_dtype
            )
            xp, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
            y = jax.lax.dot_general(xp, kernel, (((xp.ndim - 1,), (0,)), ((), ())))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + jnp.asarray(bias, self.dtype)
        return y


class QuantizableConv(nn.Module):
    """``nn.Conv``-compatible base NHWC conv (same param names/init), int8
    when the ``quant`` collection entry is present — see QuantizableDense.
    ``padding`` must already be normalized (list of pairs or a string)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.has_variable("quant", "kernel_q"):
            from instantir_tpu.ops.quant import w8a8_conv

            kq = self.get_variable("quant", "kernel_q")
            ks = self.get_variable("quant", "kernel_scale")
            y = w8a8_conv(x.astype(self.dtype), kq, ks, self.strides, self.padding)
        elif self.has_variable("quant", "kernel_qw"):
            from instantir_tpu.ops.quant import dequantize_weight

            kernel = dequantize_weight(
                self.get_variable("quant", "kernel_qw"),
                self.get_variable("quant", "kernel_scale"),
                self.dtype,
            )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel, self.strides, self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            kernel = self.param(
                "kernel",
                self.kernel_init,
                tuple(self.kernel_size) + (jnp.shape(x)[-1], self.features),
                self.param_dtype,
            )
            xp, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
            y = jax.lax.conv_general_dilated(
                xp, kernel, self.strides, self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + jnp.asarray(bias, self.dtype)
        return y


class LoRADense(nn.Module):
    """Dense with an optional low-rank adapter branch (PEFT semantics)."""

    features: int
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        y = QuantizableDense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=self.kernel_init,
            name="base",
        )(x)
        if self.lora_rank > 0:
            a = nn.Dense(
                self.lora_rank,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.he_uniform(),
                name="lora_a",
            )
            b = nn.Dense(
                self.features,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.zeros_init(),
                name="lora_b",
            )
            if not _static_zero(lora_scale):
                y = y + jnp.asarray(lora_scale, y.dtype) * (self.lora_alpha / self.lora_rank) * b(a(x))
            elif self.is_initializing():
                b(a(x))  # materialize params during init
        return y


class LoRAConv(nn.Module):
    """NHWC Conv with an optional low-rank adapter (A: k×k→r, B: 1×1→out)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 1
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = QuantizableConv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=self.kernel_init,
            name="base",
        )(x)
        if self.lora_rank > 0:
            a = nn.Conv(
                self.lora_rank,
                self.kernel_size,
                strides=self.strides,
                padding=pad,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.he_uniform(),
                name="lora_a",
            )
            b = nn.Conv(
                self.features,
                (1, 1),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.zeros_init(),
                name="lora_b",
            )
            if not _static_zero(lora_scale):
                y = y + jnp.asarray(lora_scale, y.dtype) * (self.lora_alpha / self.lora_rank) * b(a(x))
            elif self.is_initializing():
                b(a(x))  # materialize params during init
        return y


class _GNParams(nn.Module):
    """Scale/bias holder matching nn.GroupNorm's parameter layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics (+ optionally fused SiLU).

    On TPU this runs the Pallas fused kernel (one HBM read/write in the
    compute dtype, fp32 stats in VMEM — ``ops/group_norm.py``); elsewhere a
    jnp reference with identical semantics. Parameter layout matches
    nn.GroupNorm (``norm/scale``, ``norm/bias``) so converted checkpoints are
    unaffected."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from instantir_tpu.ops.group_norm import group_norm_silu

        scale, bias = _GNParams(features=x.shape[-1], name="norm")()
        y = group_norm_silu(
            x, scale, bias, num_groups=self.num_groups, eps=self.epsilon, apply_silu=self.fuse_silu
        )
        return y.astype(self.dtype)


class LayerNorm32(nn.Module):
    """LayerNorm in fp32, optional affine params."""

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``get_timestep_embedding``).

    fp32 always — bf16 sinusoids at t≈1000 lose the low-order bits that the
    time MLP amplifies.
    """
    half_dim = embedding_dim // 2
    exponent = -jnp.log(float(max_period)) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * jnp.asarray(timesteps, jnp.float32)[:, None]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP on the sinusoidal embedding (diffusers TimestepEmbedding),
    with optional ``cond_proj`` (LCM guidance-scale embedding input)."""

    time_embed_dim: int
    cond_proj_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray, condition: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if condition is not None:
            if self.cond_proj_dim is None:
                raise ValueError("condition passed but cond_proj_dim is None")
            sample = sample + nn.Dense(
                sample.shape[-1],
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="cond_proj",
            )(condition)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_2")(h)


class AdaLayerNorm(nn.Module):
    """Time-conditioned LayerNorm: ``LN(x)·(1+scale) + shift`` with
    ``(shift, scale) = Linear(SiLU(temb))`` zero-init.

    Reference ``module/ip_adapter/attention_processor.py:6-26``. The linear is
    LoRA-capable because the previewer LoRA targets ``ln_k_ip.linear`` /
    ``ln_v_ip.linear`` (``pipelines/sdxl_instantir.py:149-150``).
    """

    embedding_dim: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        emb = LoRADense(
            2 * self.embedding_dim,
            use_bias=True,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros_init(),
            name="linear",
        )(nn.silu(temb), lora_scale=lora_scale)
        shift, scale = jnp.split(emb[:, None, :], 2, axis=-1)
        normed = nn.LayerNorm(
            epsilon=1e-6,
            use_scale=False,
            use_bias=False,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32)).astype(x.dtype)
        return normed * (1.0 + scale) + shift
