"""ArcFace IR-SE50 face-recognition backbone (Flax) for IDLoss.

The reference's IDLoss loads ``pretrained_models.arcface.Backbone(input_size=
112, num_layers=50, mode='ir_se')`` (``losses/losses.py:202-204``) — a module
that is *missing from the reference repo* (the import is broken in-tree,
SURVEY §2.5). The de-facto implementation those weights
(``model_ir_se50.pth``) target is the InsightFace IR-SE-50: a 3×3 stem,
four stages of bottleneck-IR-SE residual units ([3, 4, 14, 3] at depths
[64, 128, 256, 512], stride 2 at each stage entry), and a
BN→Flatten→Linear(512·7·7→512)→BN head whose output is L2-normalized.

Inference-only (the reference freezes it): BatchNorm running statistics are
folded into per-channel affines at conversion time, so the module holds no
batch statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ArcFaceConfig:
    input_size: int = 112
    stem_channels: int = 64
    # (depth, num_units) per stage — IR-50
    stages: Tuple[Tuple[int, int], ...] = ((64, 3), (128, 4), (256, 14), (512, 3))
    embedding_dim: int = 512
    se_reduction: int = 16


def ir_se_50_config() -> ArcFaceConfig:
    return ArcFaceConfig()


def tiny_arcface_config() -> ArcFaceConfig:
    return ArcFaceConfig(input_size=16, stem_channels=4, stages=((4, 1), (8, 2)), embedding_dim=8,
                         se_reduction=2)


def _prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    a = a.astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class _Affine(nn.Module):
    """Folded inference BatchNorm: per-channel scale·x + bias."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class BottleneckIRSE(nn.Module):
    in_channels: int
    depth: int
    stride: int
    se_reduction: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.in_channels == self.depth:
            # torch MaxPool2d(kernel=1, stride) == strided subsample
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=self.stride, use_bias=False,
                               padding=0, name="shortcut_conv", **common)(x)
            shortcut = _Affine(self.depth, self.param_dtype, name="shortcut_bn")(shortcut)

        h = _Affine(self.in_channels, self.param_dtype, name="bn0")(x)
        h = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False, name="conv1", **common)(h)
        h = _prelu(h, self.param("prelu", nn.initializers.constant(0.25), (self.depth,), self.param_dtype))
        h = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv2", **common)(h)
        h = _Affine(self.depth, self.param_dtype, name="bn2")(h)

        # SE: global average → reduce → ReLU → expand → sigmoid gate
        se = jnp.mean(h, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.depth // self.se_reduction, (1, 1), use_bias=False, padding=0,
                     name="se_fc1", **common)(se)
        se = nn.relu(se)
        se = nn.Conv(self.depth, (1, 1), use_bias=False, padding=0, name="se_fc2", **common)(se)
        h = h * nn.sigmoid(se)
        return h + shortcut


class ArcFaceBackbone(nn.Module):
    """[B, S, S, 3] in [-1, 1] → L2-normalized embeddings [B, 512]."""

    config: ArcFaceConfig = ArcFaceConfig()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(cfg.stem_channels, (3, 3), padding=1, use_bias=False, name="stem_conv", **common)(
            x.astype(self.dtype)
        )
        h = _Affine(cfg.stem_channels, self.param_dtype, name="stem_bn")(h)
        h = _prelu(h, self.param("stem_prelu", nn.initializers.constant(0.25), (cfg.stem_channels,),
                                 self.param_dtype))

        in_ch = cfg.stem_channels
        bi = 0
        for depth, n_units in cfg.stages:
            for u in range(n_units):
                h = BottleneckIRSE(
                    in_ch, depth, 2 if u == 0 else 1, cfg.se_reduction, name=f"block_{bi}", **common
                )(h)
                in_ch = depth
                bi += 1

        h = _Affine(in_ch, self.param_dtype, name="head_bn")(h)
        b = h.shape[0]
        h = h.reshape(b, -1)  # NHWC flatten; converter permutes the Linear accordingly
        h = nn.Dense(cfg.embedding_dim, name="head_fc", **common)(h)
        h = _Affine(cfg.embedding_dim, self.param_dtype, name="head_bn1d")(h)
        h = h.astype(jnp.float32)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-5) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _conv(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"kernel": np.ascontiguousarray(np.transpose(np.asarray(sd[key], np.float32), (2, 3, 1, 0)))}


def convert_arcface(sd: Dict[str, np.ndarray], config: ArcFaceConfig = ArcFaceConfig()) -> Dict[str, Any]:
    """InsightFace ``model_ir_se50.pth`` naming → flax tree.

    Expected keys: ``input_layer.{0,1,2}``, ``body.{i}.res_layer.{0..5}`` /
    ``body.{i}.shortcut_layer.{0,1}``, ``output_layer.{0,3,4}``.
    """
    params: Dict[str, Any] = {
        "stem_conv": _conv(sd, "input_layer.0.weight"),
        "stem_bn": _fold_bn(sd, "input_layer.1"),
        "stem_prelu": np.asarray(sd["input_layer.2.weight"], np.float32),
    }
    bi = 0
    in_ch = config.stem_channels
    for depth, n_units in config.stages:
        for u in range(n_units):
            q = f"body.{bi}"
            blk: Dict[str, Any] = {
                "bn0": _fold_bn(sd, f"{q}.res_layer.0"),
                "conv1": _conv(sd, f"{q}.res_layer.1.weight"),
                "prelu": np.asarray(sd[f"{q}.res_layer.2.weight"], np.float32),
                "conv2": _conv(sd, f"{q}.res_layer.3.weight"),
                "bn2": _fold_bn(sd, f"{q}.res_layer.4"),
                "se_fc1": _conv(sd, f"{q}.res_layer.5.fc1.weight"),
                "se_fc2": _conv(sd, f"{q}.res_layer.5.fc2.weight"),
            }
            if in_ch != depth:
                blk["shortcut_conv"] = _conv(sd, f"{q}.shortcut_layer.0.weight")
                blk["shortcut_bn"] = _fold_bn(sd, f"{q}.shortcut_layer.1")
            params[f"block_{bi}"] = blk
            in_ch = depth
            bi += 1

    params["head_bn"] = _fold_bn(sd, "output_layer.0")
    # torch flattens NCHW (c·H·W ordering); this module flattens NHWC —
    # permute the Linear's input columns to match
    w = np.asarray(sd["output_layer.3.weight"], np.float32)  # [emb, C*H*W]
    spatial = config.input_size // (2 ** len(config.stages))
    c = config.stages[-1][0]
    w = w.reshape(-1, c, spatial, spatial).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    params["head_fc"] = {
        "kernel": np.ascontiguousarray(w.T),
        "bias": np.asarray(sd["output_layer.3.bias"], np.float32),
    }
    params["head_bn1d"] = _fold_bn(sd, "output_layer.4")
    return {"params": params}
