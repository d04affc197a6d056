"""SDXL AutoencoderKL in Flax (NHWC).

Mirrors diffusers' ``AutoencoderKL`` as used by the reference pipeline
(``pipelines/sdxl_instantir.py:1371-1379`` encode, ``:1668-1691`` fp32-upcast
decode). SDXL VAE config: blocks [128, 256, 512, 512], 2 layers/block,
latent 4ch, scaling_factor 0.13025, mid-block single-head attention with
biased QKV and residual connection.

TPU notes: the decoder is the memory peak of the whole pipeline (1024² ×
128ch fp32); it runs in fp32 (``force_upcast`` — SDXL's fp16 VAE overflows)
while the encoder may run bf16. Encoder downsampling uses the asymmetric
(0,1)×(0,1) padding diffusers uses, so converted weights are bit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from instantir_tpu.models.layers import GroupNorm32
from instantir_tpu.ops.attention import attention_xla

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None
    force_upcast: bool = True


def sdxl_vae_config(**overrides) -> VAEConfig:
    return dataclasses.replace(VAEConfig(), **overrides)


def tiny_vae_config(**overrides) -> VAEConfig:
    base = VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8)
    return dataclasses.replace(base, **overrides)


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = GroupNorm32(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, fuse_silu=True, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1", **common)(h)
        h = GroupNorm32(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, fuse_silu=True, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2", **common)(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", **common)(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head full-channel attention with biased QKV + residual."""

    channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        y = GroupNorm32(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q", **common)(y)
        k = nn.Dense(c, name="to_k", **common)(y)
        v = nn.Dense(c, name="to_v", **common)(y)
        out = attention_xla(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        out = out.reshape(b, h * w, c)
        out = nn.Dense(c, name="to_out", **common)(out)
        return out.reshape(b, h, w, c) + residual


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(norm_num_groups=self.norm_num_groups, dtype=self.dtype, param_dtype=self.param_dtype)
        x = VAEResnetBlock(self.channels, name="resnets_0", **common)(x)
        x = VAEAttentionBlock(self.channels, name="attentions_0", **common)(x)
        x = VAEResnetBlock(self.channels, name="resnets_1", **common)(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rn = dict(norm_num_groups=cfg.norm_num_groups, **common)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **common)(x)
        for i, ch in enumerate(cfg.block_out_channels):
            is_final = i == len(cfg.block_out_channels) - 1
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, name=f"down_blocks_{i}_resnets_{j}", **rn)(x)
            if not is_final:
                # diffusers VAE downsample: pad (0,1)(0,1), stride-2, no pad in conv
                x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID", name=f"down_blocks_{i}_downsample", **common
                )(x)
        x = VAEMidBlock(cfg.block_out_channels[-1], norm_num_groups=cfg.norm_num_groups, name="mid_block", **common)(x)
        x = GroupNorm32(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, fuse_silu=True, name="conv_norm_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out", **common)(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rn = dict(norm_num_groups=cfg.norm_num_groups, **common)
        reversed_ch = tuple(reversed(cfg.block_out_channels))

        x = nn.Conv(reversed_ch[0], (3, 3), padding=1, name="conv_in", **common)(z)
        x = VAEMidBlock(reversed_ch[0], norm_num_groups=cfg.norm_num_groups, name="mid_block", **common)(x)
        for i, ch in enumerate(reversed_ch):
            is_final = i == len(reversed_ch) - 1
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch, name=f"up_blocks_{i}_resnets_{j}", **rn)(x)
            if not is_final:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                x = nn.Conv(ch, (3, 3), padding=1, name=f"up_blocks_{i}_upsample", **common)(x)
        x = GroupNorm32(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, fuse_silu=True, name="conv_norm_out")(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **common)(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(self.config, name="encoder", **common)
        self.decoder = Decoder(self.config, name="decoder", **common)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), name="quant_conv", **common)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), name="post_quant_conv", **common)

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mean, logvar) of the diagonal Gaussian posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None, sample: bool = True) -> jnp.ndarray:
        """Posterior sample (or mode) — NOT yet scaled by scaling_factor."""
        mean, logvar = self.encode_moments(x)
        if sample:
            if rng is None:
                raise ValueError("encode(sample=True) requires an rng key")
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return mean

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None, sample: bool = False) -> jnp.ndarray:
        return self.decode(self.encode(x, rng=rng, sample=sample))


# ---------------------------------------------------------------------------
# Tiled encode/decode — constant-memory VAE at large resolutions.
#
# Capability parity with the reference's vendored diffusers VAE
# (``module/diffusers_vae/autoencoder_kl.py:323-402`` tiled_encode/
# tiled_decode); needed here for the ≥2K² sequence-parallel restore mode,
# where a monolithic fp32 decode (2048² × 128ch activations) would dominate
# the memory peak the ring attention just removed.
#
# TPU-first design, not a translation:
#   * every tile has the SAME static shape — the trailing row/column tile is
#     shifted inward instead of shrunk — so XLA compiles ONE decoder program
#     for the tile shape and a ``lax.scan`` reuses it (the reference's ragged
#     edge tiles would each be a fresh compile here);
#   * blending is a separable tent-weight accumulation normalized by the
#     summed weights. In interior overlaps covered by exactly two tiles this
#     reduces to the reference's linear cross-fade (``blend_v``/``blend_h``
#     raster loops, ``:311-321``); at canvas borders and the shifted last
#     tile the normalization makes it artifact-free for any overlap pattern;
#   * the whole thing is a single jittable function of the input — tiles are
#     never all resident (sequential scan, one canvas read-modify-write per
#     tile).
# ---------------------------------------------------------------------------


def _tile_starts(size: int, tile: int, stride: int) -> Tuple[int, ...]:
    """Static tile origins covering [0, size) with a final inward-shifted tile."""
    if size <= tile:
        return (0,)
    starts = []
    pos = 0
    while pos + tile < size:
        starts.append(pos)
        pos += stride
    starts.append(size - tile)
    return tuple(starts)


def _tent_weights(length: int, blend: int) -> jnp.ndarray:
    """1D weight profile: linear ramp over ``blend`` samples at both ends."""
    i = jnp.arange(length, dtype=jnp.float32)
    up = (i + 1.0) / (blend + 1.0)
    down = (length - i) / (blend + 1.0)
    return jnp.minimum(jnp.minimum(up, down), 1.0)


def vae_scale_factor(cfg: VAEConfig) -> int:
    return 2 ** (len(cfg.block_out_channels) - 1)


def _tiled_accumulate(tile_fn, x: jnp.ndarray, tile_in: int, stride_in: int,
                      out_scale_num: int, out_scale_den: int, out_channels: int,
                      overlap: float) -> jnp.ndarray:
    """Shared scan driver: run ``tile_fn`` on uniform tiles of ``x`` and
    blend the outputs on a weight-normalized canvas.

    ``out_scale_num/out_scale_den`` maps input coordinates to output
    coordinates (8/1 for decode, 1/8 for encode at SDXL scale)."""
    b, h, w, _ = x.shape
    ys = _tile_starts(h, tile_in, stride_in)
    xs = _tile_starts(w, tile_in, stride_in)
    starts = jnp.asarray([(y, x0) for y in ys for x0 in xs], jnp.int32)

    def to_out(v: int) -> int:
        return v * out_scale_num // out_scale_den

    t_out = to_out(tile_in)
    blend = max(1, to_out(max(out_scale_den, int(round(tile_in * overlap)))))
    w1d = _tent_weights(t_out, blend)
    mask = (w1d[:, None] * w1d[None, :])[None, :, :, None]

    canvas = jnp.zeros((b, to_out(h), to_out(w), out_channels), jnp.float32)
    wsum = jnp.zeros((1, to_out(h), to_out(w), 1), jnp.float32)

    def body(carry, yx):
        canvas, wsum = carry
        xt = jax.lax.dynamic_slice(x, (0, yx[0], yx[1], 0), (b, tile_in, tile_in, x.shape[-1]))
        out = tile_fn(xt).astype(jnp.float32)
        oy = yx[0] * out_scale_num // out_scale_den
        ox = yx[1] * out_scale_num // out_scale_den
        cur = jax.lax.dynamic_slice(canvas, (0, oy, ox, 0), (b, t_out, t_out, out_channels))
        canvas = jax.lax.dynamic_update_slice(canvas, cur + out * mask, (0, oy, ox, 0))
        curw = jax.lax.dynamic_slice(wsum, (0, oy, ox, 0), (1, t_out, t_out, 1))
        wsum = jax.lax.dynamic_update_slice(wsum, curw + mask, (0, oy, ox, 0))
        return (canvas, wsum), None

    (canvas, wsum), _ = jax.lax.scan(body, (canvas, wsum), starts)
    return canvas / wsum


def tiled_decode(vae: AutoencoderKL, variables, z: jnp.ndarray, *,
                 tile_latent: int = 96, overlap: float = 0.25) -> jnp.ndarray:
    """Decode latents tile-by-tile with blended overlaps (constant memory).

    Falls back to the monolithic decode when the latent fits one tile — the
    check is on static shapes, so inside jit it is a trace-time decision."""
    b, h, w, _ = z.shape
    if h <= tile_latent and w <= tile_latent:
        return vae.apply(variables, z, method=vae.decode)
    tile = min(tile_latent, h, w)
    stride = max(1, int(tile * (1.0 - overlap)))
    scale = vae_scale_factor(vae.config)
    out = _tiled_accumulate(
        lambda zt: vae.apply(variables, zt, method=vae.decode),
        z, tile, stride, scale, 1, vae.config.out_channels, overlap,
    )
    return out.astype(vae.dtype)


def tiled_encode_moments(vae: AutoencoderKL, variables, x: jnp.ndarray, *,
                         tile_sample: int = 768, overlap: float = 0.25) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled posterior moments: per-tile ``encode_moments`` blended in latent
    space (the reference blends the encoder+quant_conv output the same way,
    ``autoencoder_kl.py:323-355``). Tile origins/strides stay multiples of
    the downsample factor so latent offsets are integral."""
    scale = vae_scale_factor(vae.config)
    b, h, w, _ = x.shape
    if h <= tile_sample and w <= tile_sample:
        return vae.apply(variables, x, method=vae.encode_moments)
    tile = min(tile_sample, h, w)
    tile -= tile % scale
    stride = max(scale, int(tile * (1.0 - overlap)))
    stride -= stride % scale
    if h % scale or w % scale:
        raise ValueError(f"tiled encode needs /{scale}-aligned input, got {h}x{w}")

    def tile_fn(xt):
        mean, logvar = vae.apply(variables, xt, method=vae.encode_moments)
        return jnp.concatenate([mean, logvar], axis=-1)

    moments = _tiled_accumulate(tile_fn, x, tile, stride, 1, scale,
                                2 * vae.config.latent_channels, overlap)
    mean, logvar = jnp.split(moments.astype(vae.dtype), 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def tiled_encode(vae: AutoencoderKL, variables, x: jnp.ndarray,
                 rng: Optional[jax.Array] = None, sample: bool = True, *,
                 tile_sample: int = 768, overlap: float = 0.25) -> jnp.ndarray:
    """Tiled counterpart of ``AutoencoderKL.encode`` (posterior sample/mode)."""
    mean, logvar = tiled_encode_moments(vae, variables, x, tile_sample=tile_sample, overlap=overlap)
    if sample:
        if rng is None:
            raise ValueError("tiled_encode(sample=True) requires an rng key")
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    return mean


def scale_latents(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Raw posterior latents → model space (× scaling_factor, mean/std norm)."""
    if cfg.latents_mean is not None and cfg.latents_std is not None:
        mean = jnp.asarray(cfg.latents_mean, z.dtype)
        std = jnp.asarray(cfg.latents_std, z.dtype)
        return (z - mean) * cfg.scaling_factor / std
    return z * cfg.scaling_factor


def unscale_latents(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Model-space latents → decoder input (reference ``sdxl_instantir.py:1676-1689``)."""
    if cfg.latents_mean is not None and cfg.latents_std is not None:
        mean = jnp.asarray(cfg.latents_mean, z.dtype)
        std = jnp.asarray(cfg.latents_std, z.dtype)
        return z * std / cfg.scaling_factor + mean
    return z / cfg.scaling_factor
