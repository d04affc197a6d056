"""Flax parameter-tree → torch/diffusers state-dict exporters.

The inverse of ``torch_to_flax``: lets this framework emit checkpoints in the
reference's formats (``adapter.pt`` image_proj/ip_adapter split,
``aggregator.pt``, diffusers UNet/VAE state dicts, previewer LoRA), so models
trained here round-trip into the torch ecosystem — the weight-space
compatibility requirement from SURVEY.md §7 "hard parts (a)".

Also the backbone of converter round-trip tests: ``convert_x(export_x(tree))``
must reproduce ``tree`` exactly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _inv_linear(out: Dict[str, np.ndarray], prefix: str, node: Dict[str, Any]):
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
    if "bias" in node:
        out[f"{prefix}.bias"] = np.asarray(node["bias"])


def _inv_conv(out: Dict[str, np.ndarray], prefix: str, node: Dict[str, Any]):
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1)))
    if "bias" in node:
        out[f"{prefix}.bias"] = np.asarray(node["bias"])


def _inv_norm(out: Dict[str, np.ndarray], prefix: str, node: Dict[str, Any]):
    out[f"{prefix}.weight"] = np.asarray(node["scale"])
    out[f"{prefix}.bias"] = np.asarray(node["bias"])


def _inv_gn32(out, prefix, node):
    _inv_norm(out, prefix, node["norm"])


def _inv_lora_dense(out, prefix, node):
    _inv_linear(out, prefix, node["base"])
    if "lora_a" in node:
        out[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(np.asarray(node["lora_a"]["kernel"]).T)
        out[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(np.asarray(node["lora_b"]["kernel"]).T)


def _inv_lora_conv(out, prefix, node):
    _inv_conv(out, prefix, node["base"])
    if "lora_a" in node:
        out[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(node["lora_a"]["kernel"]), (3, 2, 0, 1))
        )
        out[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(node["lora_b"]["kernel"]), (3, 2, 0, 1))
        )


def _inv_time_embedding(out, prefix, node):
    _inv_linear(out, f"{prefix}.linear_1", node["linear_1"])
    _inv_linear(out, f"{prefix}.linear_2", node["linear_2"])
    if "cond_proj" in node:
        _inv_linear(out, f"{prefix}.cond_proj", node["cond_proj"])


def _inv_attention(out, prefix, node, include_ip: bool = True):
    _inv_lora_dense(out, f"{prefix}.to_q", node["to_q"])
    _inv_lora_dense(out, f"{prefix}.to_k", node["to_k"])
    _inv_lora_dense(out, f"{prefix}.to_v", node["to_v"])
    _inv_lora_dense(out, f"{prefix}.to_out.0", node["to_out"])
    if include_ip and "to_k_ip" in node:
        p = f"{prefix}.processor"
        _inv_lora_dense(out, f"{p}.to_k_ip", node["to_k_ip"])
        _inv_lora_dense(out, f"{p}.to_v_ip", node["to_v_ip"])
        if "ln_k_ip" in node:
            _inv_lora_dense(out, f"{p}.ln_k_ip.linear", node["ln_k_ip"]["linear"])
            _inv_lora_dense(out, f"{p}.ln_v_ip.linear", node["ln_v_ip"]["linear"])


def _inv_transformer_block(out, prefix, node):
    _inv_norm(out, f"{prefix}.norm1", node["norm1"])
    _inv_attention(out, f"{prefix}.attn1", node["attn1"])
    if "attn2" in node:
        _inv_norm(out, f"{prefix}.norm2", node["norm2"])
        _inv_attention(out, f"{prefix}.attn2", node["attn2"])
    _inv_norm(out, f"{prefix}.norm3", node["norm3"])
    _inv_lora_dense(out, f"{prefix}.ff.net.0.proj", node["ff"]["proj"])
    _inv_lora_dense(out, f"{prefix}.ff.net.2", node["ff"]["out"])


def _inv_transformer2d(out, prefix, node):
    _inv_gn32(out, f"{prefix}.norm", node["norm"])
    _inv_lora_dense(out, f"{prefix}.proj_in", node["proj_in"])
    _inv_lora_dense(out, f"{prefix}.proj_out", node["proj_out"])
    for name, sub in node.items():
        if name.startswith("blocks_"):
            k = name.split("_")[-1]
            _inv_transformer_block(out, f"{prefix}.transformer_blocks.{k}", sub)


def _inv_resnet(out, prefix, node):
    _inv_gn32(out, f"{prefix}.norm1", node["norm1"])
    _inv_lora_conv(out, f"{prefix}.conv1", node["conv1"])
    _inv_gn32(out, f"{prefix}.norm2", node["norm2"])
    _inv_lora_conv(out, f"{prefix}.conv2", node["conv2"])
    if "time_emb_proj" in node:
        _inv_lora_dense(out, f"{prefix}.time_emb_proj", node["time_emb_proj"])
    if "conv_shortcut" in node:
        _inv_lora_conv(out, f"{prefix}.conv_shortcut", node["conv_shortcut"])


def _inv_block(out, prefix, node):
    for name, sub in sorted(node.items()):
        if name.startswith("resnets_"):
            _inv_resnet(out, f"{prefix}.resnets.{name.split('_')[-1]}", sub)
        elif name.startswith("attentions_"):
            _inv_transformer2d(out, f"{prefix}.attentions.{name.split('_')[-1]}", sub)
        elif name == "downsamplers_0":
            _inv_lora_conv(out, f"{prefix}.downsamplers.0.conv", sub["conv"])
        elif name == "upsamplers_0":
            _inv_lora_conv(out, f"{prefix}.upsamplers.0.conv", sub["conv"])


def export_unet(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    p = tree["params"]
    out: Dict[str, np.ndarray] = {}
    _inv_conv(out, "conv_in", p["conv_in"]["base"])
    _inv_time_embedding(out, "time_embedding", p["time_embedding"])
    _inv_time_embedding(out, "add_embedding", p["add_embedding"])
    for name, node in p.items():
        if name.startswith("down_blocks_"):
            _inv_block(out, f"down_blocks.{name.split('_')[-1]}", node)
        elif name.startswith("up_blocks_"):
            _inv_block(out, f"up_blocks.{name.split('_')[-1]}", node)
    _inv_block(out, "mid_block", p["mid_block"])
    _inv_gn32(out, "conv_norm_out", p["conv_norm_out"])
    _inv_conv(out, "conv_out", p["conv_out"]["base"])
    return out


def export_aggregator(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    p = tree["params"]
    out: Dict[str, np.ndarray] = {}
    _inv_conv(out, "conv_in", p["conv_in"]["base"])
    _inv_conv(out, "ref_conv_in", p["ref_conv_in"]["base"])
    _inv_time_embedding(out, "time_embedding", p["time_embedding"])
    _inv_time_embedding(out, "add_embedding", p["add_embedding"])
    for name, node in p.items():
        if name.startswith("down_blocks_"):
            _inv_block(out, f"down_blocks.{name.split('_')[-1]}", node)
        elif name.startswith("controlnet_down_blocks_"):
            idx = name.split("_")[-1]
            _inv_sft(out, f"controlnet_down_blocks.{idx}", node)
    _inv_block(out, "mid_block", p["mid_block"])
    _inv_sft(out, "controlnet_mid_block", p["controlnet_mid_block"])
    return out


def _inv_sft(out, prefix, node):
    _inv_conv(out, f"{prefix}.0.mlp_shared.0", node["mlp_shared"])
    _inv_conv(out, f"{prefix}.0.mul", node["mul"])
    _inv_conv(out, f"{prefix}.0.add", node["add"])
    _inv_conv(out, f"{prefix}.1", node["zero_conv"])


def export_resampler(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    p = tree["params"]
    out: Dict[str, np.ndarray] = {"latents": np.asarray(p["latents"])}
    _inv_linear(out, "proj_in", p["proj_in"])
    _inv_linear(out, "proj_out", p["proj_out"])
    _inv_norm(out, "norm_out", p["norm_out"])
    depth = len([k for k in p if k.endswith("_attn")])
    for i in range(depth):
        a = p[f"layers_{i}_attn"]
        _inv_norm(out, f"layers.{i}.0.norm1", a["norm1"])
        _inv_norm(out, f"layers.{i}.0.norm2", a["norm2"])
        _inv_lora_dense(out, f"layers.{i}.0.to_q", a["to_q"])
        _inv_lora_dense(out, f"layers.{i}.0.to_kv", a["to_kv"])
        _inv_lora_dense(out, f"layers.{i}.0.to_out", a["to_out"])
        _inv_norm(out, f"layers.{i}.1.0", p[f"layers_{i}_ff_norm"])
        _inv_linear(out, f"layers.{i}.1.1", p[f"layers_{i}_ff_in"])
        _inv_linear(out, f"layers.{i}.1.3", p[f"layers_{i}_ff_out"])
    return out


def export_vae(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    p = tree["params"]
    out: Dict[str, np.ndarray] = {}

    def vae_resnet(prefix, node):
        _inv_gn32(out, f"{prefix}.norm1", node["norm1"])
        _inv_conv(out, f"{prefix}.conv1", node["conv1"])
        _inv_gn32(out, f"{prefix}.norm2", node["norm2"])
        _inv_conv(out, f"{prefix}.conv2", node["conv2"])
        if "conv_shortcut" in node:
            _inv_conv(out, f"{prefix}.conv_shortcut", node["conv_shortcut"])

    def vae_attention(prefix, node):
        _inv_gn32(out, f"{prefix}.group_norm", node["group_norm"])
        _inv_linear(out, f"{prefix}.to_q", node["to_q"])
        _inv_linear(out, f"{prefix}.to_k", node["to_k"])
        _inv_linear(out, f"{prefix}.to_v", node["to_v"])
        _inv_linear(out, f"{prefix}.to_out.0", node["to_out"])

    def side(side_name, tp):
        sp = p[side_name]
        _inv_conv(out, f"{side_name}.conv_in", sp["conv_in"])
        for name, node in sp.items():
            if "_resnets_" in name:
                parts = name.split("_")  # e.g. down_blocks_0_resnets_1
                i, j = parts[2], parts[4]
                _inv_conv  # noqa: B018
                vae_resnet(f"{side_name}.{tp}_blocks.{i}.resnets.{j}", node)
            elif name.endswith("_downsample"):
                i = name.split("_")[2]
                _inv_conv(out, f"{side_name}.down_blocks.{i}.downsamplers.0.conv", node)
            elif name.endswith("_upsample"):
                i = name.split("_")[2]
                _inv_conv(out, f"{side_name}.up_blocks.{i}.upsamplers.0.conv", node)
        vae_resnet(f"{side_name}.mid_block.resnets.0", sp["mid_block"]["resnets_0"])
        vae_attention(f"{side_name}.mid_block.attentions.0", sp["mid_block"]["attentions_0"])
        vae_resnet(f"{side_name}.mid_block.resnets.1", sp["mid_block"]["resnets_1"])
        _inv_gn32(out, f"{side_name}.conv_norm_out", sp["conv_norm_out"])
        _inv_conv(out, f"{side_name}.conv_out", sp["conv_out"])

    side("encoder", "down")
    side("decoder", "up")
    _inv_conv(out, "quant_conv", p["quant_conv"])
    _inv_conv(out, "post_quant_conv", p["post_quant_conv"])
    return out


def export_ip_adapter(tree: Dict[str, Any], config) -> Dict[str, np.ndarray]:
    """UNet tree → ``adapter.pt["ip_adapter"]`` numbering (attn1 even/attn2 odd)."""
    from instantir_tpu.convert.torch_to_flax import attn2_paths

    out: Dict[str, np.ndarray] = {}
    params = tree["params"]
    for n, path in enumerate(attn2_paths(config)):
        node = params
        for key in path:
            node = node[key]
        if "to_k_ip" not in node:
            continue
        idx = 2 * n + 1
        out[f"{idx}.to_k_ip.weight"] = np.ascontiguousarray(np.asarray(node["to_k_ip"]["base"]["kernel"]).T)
        out[f"{idx}.to_v_ip.weight"] = np.ascontiguousarray(np.asarray(node["to_v_ip"]["base"]["kernel"]).T)
        if "ln_k_ip" in node:
            for ln in ("ln_k_ip", "ln_v_ip"):
                base = node[ln]["linear"]["base"]
                out[f"{idx}.{ln}.linear.weight"] = np.ascontiguousarray(np.asarray(base["kernel"]).T)
                out[f"{idx}.{ln}.linear.bias"] = np.asarray(base["bias"])
    return out


def export_clip_text(tree: Dict[str, Any], config) -> Dict[str, np.ndarray]:
    """CLIP text tower → HF transformers naming (inverse of
    ``torch_to_flax.convert_clip_text``)."""
    out: Dict[str, np.ndarray] = {}
    p = tree["params"]
    p0 = "text_model."
    out[f"{p0}embeddings.token_embedding.weight"] = np.asarray(p["token_embedding"]["embedding"])
    out[f"{p0}embeddings.position_embedding.weight"] = np.asarray(p["position_embedding"])
    _inv_norm(out, f"{p0}final_layer_norm", p["final_norm"])
    for i in range(config.num_layers):
        n = p[f"layers_{i}"]
        q = f"{p0}encoder.layers.{i}"
        _inv_norm(out, f"{q}.layer_norm1", n["norm1"])
        _inv_linear(out, f"{q}.self_attn.q_proj", n["q"])
        _inv_linear(out, f"{q}.self_attn.k_proj", n["k"])
        _inv_linear(out, f"{q}.self_attn.v_proj", n["v"])
        _inv_linear(out, f"{q}.self_attn.out_proj", n["proj"])
        _inv_norm(out, f"{q}.layer_norm2", n["norm2"])
        _inv_linear(out, f"{q}.mlp.fc1", n["fc1"])
        _inv_linear(out, f"{q}.mlp.fc2", n["fc2"])
    if "text_projection" in p:
        out["text_projection.weight"] = np.ascontiguousarray(np.asarray(p["text_projection"]["kernel"]).T)
    return out


def export_dinov2(tree: Dict[str, Any], config) -> Dict[str, np.ndarray]:
    """DINOv2 tower → HF transformers naming (inverse of
    ``torch_to_flax.convert_dinov2``)."""
    out: Dict[str, np.ndarray] = {}
    p = tree["params"]
    out["embeddings.cls_token"] = np.asarray(p["cls_token"])
    out["embeddings.position_embeddings"] = np.asarray(p["pos_embed"])
    _inv_conv(out, "embeddings.patch_embeddings.projection", p["patch_embed"])
    _inv_norm(out, "layernorm", p["norm"])
    for i in range(config.num_layers):
        n = p[f"blocks_{i}"]
        q = f"encoder.layer.{i}"
        _inv_norm(out, f"{q}.norm1", n["norm1"])
        _inv_linear(out, f"{q}.attention.attention.query", n["q"])
        _inv_linear(out, f"{q}.attention.attention.key", n["k"])
        _inv_linear(out, f"{q}.attention.attention.value", n["v"])
        _inv_linear(out, f"{q}.attention.output.dense", n["proj"])
        out[f"{q}.layer_scale1.lambda1"] = np.asarray(n["layerscale1"])
        _inv_norm(out, f"{q}.norm2", n["norm2"])
        _inv_linear(out, f"{q}.mlp.fc1", n["fc1"])
        _inv_linear(out, f"{q}.mlp.fc2", n["fc2"])
        out[f"{q}.layer_scale2.lambda1"] = np.asarray(n["layerscale2"])
    return out
