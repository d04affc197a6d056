"""Torch/HF state-dict → Flax parameter-tree converters.

Covers the five checkpoint families the reference consumes:
  * SDXL UNet + VAE (diffusers safetensors, ``infer.py:117``)
  * ``adapter.pt``   — {image_proj: Resampler, ip_adapter: per-processor
    to_k_ip/to_v_ip/ln_k_ip/ln_v_ip} (``module/ip_adapter/utils.py:98-133``)
  * ``aggregator.pt`` — Aggregator incl. SFT heads (``infer.py:142-143``)
  * ``previewer_lora_weights.bin`` — diffusers-format LoRA
    (``pipelines/sdxl_instantir.py:350-397``)
  * DINOv2 / CLIP text towers (HF transformers naming)

Layout transforms: torch Linear ``[out,in]`` → Flax kernel ``[in,out]``;
torch Conv ``[O,I,kh,kw]`` → Flax NHWC kernel ``[kh,kw,I,O]``.

All converters take ``dict[str, np.ndarray]`` and return nested dicts shaped
exactly like the corresponding module's ``init`` output (``{"params": ...}``).
A coverage check (``assert_tree_compatible``) verifies every leaf was filled
with the right shape.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def t_linear(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def t_conv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def t_norm(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def t_groupnorm32(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """My GroupNorm32 wraps nn.GroupNorm under a 'norm' scope."""
    return {"norm": t_norm(sd, prefix)}


def t_lora_dense(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    """Base weights for a LoRADense (LoRA branch filled separately if present)."""
    out = {"base": t_linear(sd, prefix, bias)}
    if f"{prefix}.lora_A.weight" in sd:
        out["lora_a"] = {"kernel": np.ascontiguousarray(sd[f"{prefix}.lora_A.weight"].T)}
        out["lora_b"] = {"kernel": np.ascontiguousarray(sd[f"{prefix}.lora_B.weight"].T)}
    return out


def t_lora_conv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"base": t_conv(sd, prefix, bias)}
    if f"{prefix}.lora_A.weight" in sd:
        out["lora_a"] = {"kernel": np.ascontiguousarray(np.transpose(sd[f"{prefix}.lora_A.weight"], (2, 3, 1, 0)))}
        out["lora_b"] = {"kernel": np.ascontiguousarray(np.transpose(sd[f"{prefix}.lora_B.weight"], (2, 3, 1, 0)))}
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load .safetensors / .bin / .pt into a FLAT numpy dict. Nested payloads
    (e.g. ``adapter.pt`` = {"image_proj": {...}, "ip_adapter": {...}},
    ``train_stage1_adapter.py:753-785``) flatten with dotted prefixes."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    def flatten(d: Dict, prefix: str, out: Dict[str, np.ndarray]):
        for k, v in d.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                flatten(v, key + ".", out)
            else:
                out[key] = v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
        return out

    return flatten(sd, "", {})


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _convert_attention(sd, p, is_cross: bool) -> Dict[str, Any]:
    out = {
        "to_q": t_lora_dense(sd, f"{p}.to_q", bias=False),
        "to_k": t_lora_dense(sd, f"{p}.to_k", bias=False),
        "to_v": t_lora_dense(sd, f"{p}.to_v", bias=False),
        "to_out": t_lora_dense(sd, f"{p}.to_out.0"),
    }
    return out


def _convert_ip_branch(sd, p) -> Dict[str, Any]:
    """TA-IP processor params: {p}.to_k_ip/to_v_ip/ln_k_ip/ln_v_ip."""
    out = {}
    if f"{p}.to_k_ip.weight" in sd:
        out["to_k_ip"] = t_lora_dense(sd, f"{p}.to_k_ip", bias=False)
        out["to_v_ip"] = t_lora_dense(sd, f"{p}.to_v_ip", bias=False)
    if f"{p}.ln_k_ip.linear.weight" in sd:
        out["ln_k_ip"] = {"linear": t_lora_dense(sd, f"{p}.ln_k_ip.linear")}
        out["ln_v_ip"] = {"linear": t_lora_dense(sd, f"{p}.ln_v_ip.linear")}
    return out


def _convert_basic_transformer_block(sd, p, has_cross: bool) -> Dict[str, Any]:
    out = {
        "norm1": t_norm(sd, f"{p}.norm1"),
        "attn1": _convert_attention(sd, f"{p}.attn1", is_cross=False),
        "norm3": t_norm(sd, f"{p}.norm3"),
        "ff": {
            "proj": t_lora_dense(sd, f"{p}.ff.net.0.proj"),
            "out": t_lora_dense(sd, f"{p}.ff.net.2"),
        },
    }
    if has_cross:
        out["norm2"] = t_norm(sd, f"{p}.norm2")
        attn2 = _convert_attention(sd, f"{p}.attn2", is_cross=True)
        attn2.update(_convert_ip_branch(sd, f"{p}.attn2.processor"))
        out["attn2"] = attn2
    return out


def _convert_transformer2d(sd, p, num_layers: int, has_cross: bool) -> Dict[str, Any]:
    out = {
        "norm": t_groupnorm32(sd, f"{p}.norm"),
        "proj_in": t_lora_dense(sd, f"{p}.proj_in"),
        "proj_out": t_lora_dense(sd, f"{p}.proj_out"),
    }
    for k in range(num_layers):
        out[f"blocks_{k}"] = _convert_basic_transformer_block(sd, f"{p}.transformer_blocks.{k}", has_cross)
    return out


def _convert_resnet(sd, p, has_shortcut: bool, has_temb: bool = True) -> Dict[str, Any]:
    out = {
        "norm1": t_groupnorm32(sd, f"{p}.norm1"),
        "conv1": t_lora_conv(sd, f"{p}.conv1"),
        "norm2": t_groupnorm32(sd, f"{p}.norm2"),
        "conv2": t_lora_conv(sd, f"{p}.conv2"),
    }
    if has_temb:
        out["time_emb_proj"] = t_lora_dense(sd, f"{p}.time_emb_proj")
    if has_shortcut:
        out["conv_shortcut"] = t_lora_conv(sd, f"{p}.conv_shortcut")
    return out


def _convert_time_embedding(sd, p) -> Dict[str, Any]:
    out = {"linear_1": t_linear(sd, f"{p}.linear_1"), "linear_2": t_linear(sd, f"{p}.linear_2")}
    if f"{p}.cond_proj.weight" in sd:
        out["cond_proj"] = t_linear(sd, f"{p}.cond_proj", bias=False)
    return out


def convert_unet(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """diffusers SDXL UNet state dict (+ merged adapter/LoRA keys) → Flax tree.

    ``config`` is an ``instantir_tpu.models.unet.UNetConfig``.
    """
    params: Dict[str, Any] = {
        "conv_in": {"base": t_conv(sd, "conv_in")},
        "time_embedding": _convert_time_embedding(sd, "time_embedding"),
        "add_embedding": _convert_time_embedding(sd, "add_embedding"),
        "conv_norm_out": t_groupnorm32(sd, "conv_norm_out"),
        "conv_out": {"base": t_conv(sd, "conv_out")},
    }

    down_channel_in = config.block_out_channels[0]
    for i, btype in enumerate(config.down_block_types):
        p = f"down_blocks.{i}"
        is_final = i == len(config.down_block_types) - 1
        out_ch = config.block_out_channels[i]
        block: Dict[str, Any] = {}
        for j in range(config.layers_per_block):
            in_ch = down_channel_in if j == 0 else out_ch
            block[f"resnets_{j}"] = _convert_resnet(sd, f"{p}.resnets.{j}", has_shortcut=in_ch != out_ch)
        if btype == "CrossAttnDownBlock2D":
            for j in range(config.layers_per_block):
                block[f"attentions_{j}"] = _convert_transformer2d(
                    sd, f"{p}.attentions.{j}", config.transformer_layers_per_block[i], has_cross=True
                )
        if not is_final:
            block["downsamplers_0"] = {"conv": t_lora_conv(sd, f"{p}.downsamplers.0.conv")}
        params[f"down_blocks_{i}"] = block
        down_channel_in = out_ch

    mid: Dict[str, Any] = {
        "resnets_0": _convert_resnet(sd, "mid_block.resnets.0", has_shortcut=False),
        "resnets_1": _convert_resnet(sd, "mid_block.resnets.1", has_shortcut=False),
        "attentions_0": _convert_transformer2d(
            sd, "mid_block.attentions.0", config.transformer_layers_per_block[-1], has_cross=True
        ),
    }
    params["mid_block"] = mid

    rev_ch = tuple(reversed(config.block_out_channels))
    for i, btype in enumerate(config.up_block_types):
        p = f"up_blocks.{i}"
        is_final = i == len(config.up_block_types) - 1
        out_ch = rev_ch[i]
        prev_ch = rev_ch[max(i - 1, 0)]
        num_res = config.layers_per_block + 1
        block = {}
        for j in range(num_res):
            # skip-connection channels: the skips come off the down path
            skip_ch = rev_ch[min(i + 1, len(rev_ch) - 1)] if j == num_res - 1 else out_ch
            in_ch = (prev_ch if j == 0 else out_ch) + skip_ch
            block[f"resnets_{j}"] = _convert_resnet(sd, f"{p}.resnets.{j}", has_shortcut=in_ch != out_ch)
        if btype == "CrossAttnUpBlock2D":
            for j in range(num_res):
                block[f"attentions_{j}"] = _convert_transformer2d(
                    sd, f"{p}.attentions.{j}", tuple(reversed(config.transformer_layers_per_block))[i], has_cross=True
                )
        if not is_final:
            block["upsamplers_0"] = {"conv": t_lora_conv(sd, f"{p}.upsamplers.0.conv")}
        params[f"up_blocks_{i}"] = block

    return {"params": params}


# ---------------------------------------------------------------------------
# Aggregator
# ---------------------------------------------------------------------------


def convert_aggregator(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """``aggregator.pt`` → Flax tree (SDXL down+mid topology, no attn2)."""
    params: Dict[str, Any] = {
        "conv_in": {"base": t_conv(sd, "conv_in")},
        "ref_conv_in": {"base": t_conv(sd, "ref_conv_in")},
        "time_embedding": _convert_time_embedding(sd, "time_embedding"),
        "add_embedding": _convert_time_embedding(sd, "add_embedding"),
    }
    down_channel_in = config.block_out_channels[0]
    for i, btype in enumerate(config.down_block_types):
        p = f"down_blocks.{i}"
        is_final = i == len(config.down_block_types) - 1
        out_ch = config.block_out_channels[i]
        block: Dict[str, Any] = {}
        for j in range(config.layers_per_block):
            in_ch = down_channel_in if j == 0 else out_ch
            block[f"resnets_{j}"] = _convert_resnet(sd, f"{p}.resnets.{j}", has_shortcut=in_ch != out_ch)
        if btype == "CrossAttnDownBlock2D":
            for j in range(config.layers_per_block):
                block[f"attentions_{j}"] = _convert_transformer2d(
                    sd, f"{p}.attentions.{j}", config.transformer_layers_per_block[i], has_cross=False
                )
        if not is_final:
            block["downsamplers_0"] = {"conv": t_lora_conv(sd, f"{p}.downsamplers.0.conv")}
        params[f"down_blocks_{i}"] = block
        down_channel_in = out_ch

    params["mid_block"] = {
        "resnets_0": _convert_resnet(sd, "mid_block.resnets.0", has_shortcut=False),
        "resnets_1": _convert_resnet(sd, "mid_block.resnets.1", has_shortcut=False),
        "attentions_0": _convert_transformer2d(
            sd, "mid_block.attentions.0", config.transformer_layers_per_block[-1], has_cross=False
        ),
    }

    def sft_head(p):
        return {
            "mlp_shared": t_conv(sd, f"{p}.0.mlp_shared.0"),
            "mul": t_conv(sd, f"{p}.0.mul"),
            "add": t_conv(sd, f"{p}.0.add"),
            "zero_conv": t_conv(sd, f"{p}.1"),
        }

    n_heads = 1 + sum(
        config.layers_per_block + (0 if i == len(config.down_block_types) - 1 else 1)
        for i in range(len(config.down_block_types))
    )
    for idx in range(n_heads):
        params[f"controlnet_down_blocks_{idx}"] = sft_head(f"controlnet_down_blocks.{idx}")
    params["controlnet_mid_block"] = sft_head("controlnet_mid_block")
    return {"params": params}


# ---------------------------------------------------------------------------
# Resampler (adapter.pt "image_proj" sub-dict)
# ---------------------------------------------------------------------------


def convert_resampler(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "latents": sd["latents"],
        "proj_in": t_linear(sd, "proj_in"),
        "proj_out": t_linear(sd, "proj_out"),
        "norm_out": t_norm(sd, "norm_out"),
    }
    for i in range(config.depth):
        p = f"layers.{i}"
        params[f"layers_{i}_attn"] = {
            "norm1": t_norm(sd, f"{p}.0.norm1"),
            "norm2": t_norm(sd, f"{p}.0.norm2"),
            "to_q": t_lora_dense(sd, f"{p}.0.to_q", bias=False),
            "to_kv": t_lora_dense(sd, f"{p}.0.to_kv", bias=False),
            "to_out": t_lora_dense(sd, f"{p}.0.to_out", bias=False),
        }
        params[f"layers_{i}_ff_norm"] = t_norm(sd, f"{p}.1.0")
        params[f"layers_{i}_ff_in"] = t_linear(sd, f"{p}.1.1", bias=False)
        params[f"layers_{i}_ff_out"] = t_linear(sd, f"{p}.1.3", bias=False)
    return {"params": params}


# ---------------------------------------------------------------------------
# adapter.pt "ip_adapter" sub-dict → merged into the UNet tree
# ---------------------------------------------------------------------------


def attn2_paths(config) -> List[Tuple[str, ...]]:
    """Ordered flax paths of every cross-attention (attn2) module, in
    diffusers ``attn_processors`` enumeration order (down → up → mid — the
    registration order of ``UNet2DConditionModel``), counting both attn1 and
    attn2 for the processor index."""
    paths: List[Tuple[str, ...]] = []
    for i, btype in enumerate(config.down_block_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(config.layers_per_block):
            for k in range(config.transformer_layers_per_block[i]):
                paths.append((f"down_blocks_{i}", f"attentions_{j}", f"blocks_{k}", "attn2"))
    for i, btype in enumerate(config.up_block_types):
        if btype != "CrossAttnUpBlock2D":
            continue
        for j in range(config.layers_per_block + 1):
            for k in range(tuple(reversed(config.transformer_layers_per_block))[i]):
                paths.append((f"up_blocks_{i}", f"attentions_{j}", f"blocks_{k}", "attn2"))
    for k in range(config.transformer_layers_per_block[-1]):
        paths.append(("mid_block", "attentions_0", f"blocks_{k}", "attn2"))
    return paths


def merge_ip_adapter(
    unet_tree: Dict[str, Any], ip_sd: Dict[str, np.ndarray], config, strict: bool = True
) -> Dict[str, Any]:
    """Merge ``adapter.pt["ip_adapter"]`` (keys ``{2i+1}.to_k_ip.weight`` …,
    numbered over all processors where attn1 precedes attn2) into the UNet
    tree's attn2 modules.

    Strict by default (like the reference's ``strict=True`` state-dict loads,
    ``module/ip_adapter/utils.py:56-59``): a missing expected key raises
    (KeyError below), and leftover checkpoint keys that map to no module
    raise too — a renamed/mis-indexed processor must abort, not silently
    drop weights."""
    consumed = set()

    def take(key: str) -> np.ndarray:
        consumed.add(key)
        return ip_sd[key]

    paths = attn2_paths(config)
    params = unet_tree["params"]
    for n, path in enumerate(paths):
        idx = 2 * n + 1  # attn1 processors occupy the even indices
        node = params
        for key in path:
            node = node[key]
        prefix = str(idx)

        def set_base(dst: Dict[str, Any], kernel: np.ndarray, bias: Optional[np.ndarray] = None):
            # update in place so existing lora_a/lora_b leaves survive
            base = dst.setdefault("base", {})
            base["kernel"] = np.ascontiguousarray(kernel.T)
            if bias is not None:
                base["bias"] = bias

        set_base(node.setdefault("to_k_ip", {}), take(f"{prefix}.to_k_ip.weight"))
        set_base(node.setdefault("to_v_ip", {}), take(f"{prefix}.to_v_ip.weight"))
        if f"{prefix}.ln_k_ip.linear.weight" in ip_sd:
            for ln in ("ln_k_ip", "ln_v_ip"):
                dst = node.setdefault(ln, {}).setdefault("linear", {})
                set_base(dst, take(f"{prefix}.{ln}.linear.weight"), take(f"{prefix}.{ln}.linear.bias"))
    leftover = sorted(set(ip_sd) - consumed)
    if leftover and strict:
        raise ValueError(
            f"{len(leftover)} ip-adapter tensors map to no attention module "
            f"(first: {leftover[:5]}) — pass strict=False to allow a partial load"
        )
    return unet_tree


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def convert_vae(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    def vae_resnet(p, has_shortcut):
        out = {
            "norm1": t_groupnorm32(sd, f"{p}.norm1"),
            "conv1": t_conv(sd, f"{p}.conv1"),
            "norm2": t_groupnorm32(sd, f"{p}.norm2"),
            "conv2": t_conv(sd, f"{p}.conv2"),
        }
        if has_shortcut:
            out["conv_shortcut"] = t_conv(sd, f"{p}.conv_shortcut")
        return out

    def vae_attention(p):
        return {
            "group_norm": t_groupnorm32(sd, f"{p}.group_norm"),
            "to_q": t_linear(sd, f"{p}.to_q"),
            "to_k": t_linear(sd, f"{p}.to_k"),
            "to_v": t_linear(sd, f"{p}.to_v"),
            "to_out": t_linear(sd, f"{p}.to_out.0"),
        }

    enc: Dict[str, Any] = {"conv_in": t_conv(sd, "encoder.conv_in")}
    ch = config.block_out_channels[0]
    for i, out_ch in enumerate(config.block_out_channels):
        is_final = i == len(config.block_out_channels) - 1
        for j in range(config.layers_per_block):
            in_ch = ch if j == 0 else out_ch
            enc[f"down_blocks_{i}_resnets_{j}"] = vae_resnet(
                f"encoder.down_blocks.{i}.resnets.{j}", in_ch != out_ch
            )
        if not is_final:
            enc[f"down_blocks_{i}_downsample"] = t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        ch = out_ch
    enc["mid_block"] = {
        "resnets_0": vae_resnet("encoder.mid_block.resnets.0", False),
        "attentions_0": vae_attention("encoder.mid_block.attentions.0"),
        "resnets_1": vae_resnet("encoder.mid_block.resnets.1", False),
    }
    enc["conv_norm_out"] = t_groupnorm32(sd, "encoder.conv_norm_out")
    enc["conv_out"] = t_conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": t_conv(sd, "decoder.conv_in")}
    rev = tuple(reversed(config.block_out_channels))
    dec["mid_block"] = {
        "resnets_0": vae_resnet("decoder.mid_block.resnets.0", False),
        "attentions_0": vae_attention("decoder.mid_block.attentions.0"),
        "resnets_1": vae_resnet("decoder.mid_block.resnets.1", False),
    }
    ch = rev[0]
    for i, out_ch in enumerate(rev):
        is_final = i == len(rev) - 1
        for j in range(config.layers_per_block + 1):
            in_ch = ch if j == 0 else out_ch
            dec[f"up_blocks_{i}_resnets_{j}"] = vae_resnet(f"decoder.up_blocks.{i}.resnets.{j}", in_ch != out_ch)
        if not is_final:
            dec[f"up_blocks_{i}_upsample"] = t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        ch = out_ch
    dec["conv_norm_out"] = t_groupnorm32(sd, "decoder.conv_norm_out")
    dec["conv_out"] = t_conv(sd, "decoder.conv_out")

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": t_conv(sd, "quant_conv"),
            "post_quant_conv": t_conv(sd, "post_quant_conv"),
        }
    }


# ---------------------------------------------------------------------------
# DINOv2 / CLIP text
# ---------------------------------------------------------------------------


def convert_dinov2(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed": t_conv(sd, "embeddings.patch_embeddings.projection"),
        "norm": t_norm(sd, "layernorm"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        params[f"blocks_{i}"] = {
            "norm1": t_norm(sd, f"{p}.norm1"),
            "q": t_linear(sd, f"{p}.attention.attention.query"),
            "k": t_linear(sd, f"{p}.attention.attention.key"),
            "v": t_linear(sd, f"{p}.attention.attention.value"),
            "proj": t_linear(sd, f"{p}.attention.output.dense"),
            "layerscale1": sd[f"{p}.layer_scale1.lambda1"],
            "norm2": t_norm(sd, f"{p}.norm2"),
            "fc1": t_linear(sd, f"{p}.mlp.fc1"),
            "fc2": t_linear(sd, f"{p}.mlp.fc2"),
            "layerscale2": sd[f"{p}.layer_scale2.lambda1"],
        }
    return {"params": params}


def convert_clip_text(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    p0 = "text_model."
    params: Dict[str, Any] = {
        "token_embedding": {"embedding": sd[f"{p0}embeddings.token_embedding.weight"]},
        "position_embedding": sd[f"{p0}embeddings.position_embedding.weight"],
        "final_norm": t_norm(sd, f"{p0}final_layer_norm"),
    }
    for i in range(config.num_layers):
        p = f"{p0}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "norm1": t_norm(sd, f"{p}.layer_norm1"),
            "q": t_linear(sd, f"{p}.self_attn.q_proj"),
            "k": t_linear(sd, f"{p}.self_attn.k_proj"),
            "v": t_linear(sd, f"{p}.self_attn.v_proj"),
            "proj": t_linear(sd, f"{p}.self_attn.out_proj"),
            "norm2": t_norm(sd, f"{p}.layer_norm2"),
            "fc1": t_linear(sd, f"{p}.mlp.fc1"),
            "fc2": t_linear(sd, f"{p}.mlp.fc2"),
        }
    if config.projection_dim is not None and "text_projection.weight" in sd:
        params["text_projection"] = {"kernel": np.ascontiguousarray(sd["text_projection.weight"].T)}
    return {"params": params}


# ---------------------------------------------------------------------------
# previewer LoRA (diffusers format)
# ---------------------------------------------------------------------------

_LORA_KEY_RE = re.compile(r"^(unet\.)?(.+)\.lora_([AB])\.weight$")
_RESAMPLER_LORA_RE = re.compile(
    r"^unet\.encoder_hid_proj\.image_projection_layers\.0\.layers\.(\d+)\.0\.(to_q|to_kv|to_out)\.lora_([AB])\.weight$"
)


def merge_resampler_lora(
    resampler_tree: Dict[str, Any], lora_sd: Dict[str, np.ndarray]
) -> Tuple[Dict[str, Any], int, set]:
    """Merge the resampler's share of a previewer LoRA file — in the torch
    module tree the resampler lives at ``unet.encoder_hid_proj.image_projection_layers.0``
    (``PREVIEWER_LORA_MODULES`` entries "to_q"/"to_kv"/"0.to_out",
    ``pipelines/sdxl_instantir.py:141-144``).

    Returns (tree, merged_count, merged_key_set) so the caller can account
    for every LoRA tensor in the file."""
    merged: set = set()
    params = resampler_tree["params"]
    for key, val in lora_sd.items():
        m = _RESAMPLER_LORA_RE.match(key)
        if not m:
            continue
        layer, target, which = int(m.group(1)), m.group(2), "lora_a" if m.group(3) == "A" else "lora_b"
        node = params.get(f"layers_{layer}_attn", {}).get(target)
        if node is None:
            continue
        node.setdefault(which, {})["kernel"] = np.ascontiguousarray(val.T)
        merged.add(key)
    return resampler_tree, len(merged), merged


def merge_previewer_lora(
    unet_tree: Dict[str, Any], lora_sd: Dict[str, np.ndarray], config
) -> Tuple[Dict[str, Any], int, List[str]]:
    """Merge diffusers-format LoRA weights into the UNet tree's lora_a/lora_b
    leaves. Torch module paths map to flax paths by the same renaming used in
    ``convert_unet``. Returns (tree, merged_count, unmatched_lora_keys) —
    the caller must reconcile unmatched keys (some legitimately belong to the
    resampler, see ``merge_resampler_lora``) and abort on a real shortfall
    like the reference's strict loads (``sdxl_instantir.py:386-394``)."""
    merged = 0
    unmatched: List[str] = []
    params = unet_tree["params"]

    def to_flax_path(torch_path: str) -> Optional[List[str]]:
        t = torch_path
        t = re.sub(r"down_blocks\.(\d+)", r"down_blocks_\1", t)
        t = re.sub(r"up_blocks\.(\d+)", r"up_blocks_\1", t)
        t = re.sub(r"\.resnets\.(\d+)", r".resnets_\1", t)
        t = re.sub(r"\.attentions\.(\d+)", r".attentions_\1", t)
        t = re.sub(r"\.transformer_blocks\.(\d+)", r".blocks_\1", t)
        t = re.sub(r"\.downsamplers\.0\.conv", r".downsamplers_0.conv", t)
        t = re.sub(r"\.upsamplers\.0\.conv", r".upsamplers_0.conv", t)
        t = t.replace(".attn2.processor.", ".attn2.")  # ip lora keys
        t = t.replace(".to_out.0", ".to_out")
        t = t.replace(".ff.net.0.proj", ".ff.proj")
        t = t.replace(".ff.net.2", ".ff.out")
        return t.split(".")

    for key, val in lora_sd.items():
        m = _LORA_KEY_RE.match(key)
        if not m:
            continue
        path = to_flax_path(m.group(2))
        which = "lora_a" if m.group(3) == "A" else "lora_b"
        node = params
        ok = True
        for part in path:
            if part not in node:
                ok = False
                break
            node = node[part]
        if not ok or which not in node:
            unmatched.append(key)
            continue
        if val.ndim == 4:
            node[which]["kernel"] = np.ascontiguousarray(np.transpose(val, (2, 3, 1, 0)))
        else:
            node[which]["kernel"] = np.ascontiguousarray(val.T)
        merged += 1
    return unet_tree, merged, unmatched


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def tree_paths(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Tuple[int, ...]]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_paths(v, prefix + (str(k),)))
    else:
        out[prefix] = tuple(np.shape(tree))
    return out


def assert_tree_compatible(converted: Dict[str, Any], reference: Dict[str, Any], allow_missing=("lora_a", "lora_b")):
    """Every reference leaf must exist in the converted tree with the same
    shape (LoRA leaves may be absent when the checkpoint has no LoRA)."""
    ref = tree_paths(reference)
    got = tree_paths(converted)
    missing = [p for p in ref if p not in got and not any(a in p for a in allow_missing)]
    extra = [p for p in got if p not in ref]
    mismatched = [(p, got[p], ref[p]) for p in ref if p in got and got[p] != ref[p]]
    if missing or extra or mismatched:
        raise ValueError(
            f"tree mismatch:\n missing={missing[:10]} (+{max(0, len(missing)-10)})\n"
            f" extra={extra[:10]} (+{max(0, len(extra)-10)})\n mismatched={mismatched[:10]}"
        )
