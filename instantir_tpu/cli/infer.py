"""CLI restoration driver — the framework's equivalent of ``infer.py``.

Batch driver: list images → resize to /64-aligned runtime size (min side
768, max 1024 — ``infer.py:31-66``) → default quality prompts
(``infer.py:192-210``) → InstantIR restore → resize back + save.

Usage:
  python -m instantir_tpu.cli.infer \
      --sdxl_path /path/sdxl --instantir_path /path/instantir \
      --vision_encoder_path /path/dinov2 --test_path lq_dir --out_path out
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Tuple

import numpy as np

DEFAULT_PROMPT = (
    "Photorealistic, highly detailed, hyper detailed photo - realistic maximum detail, 32k, "
    "ultra HD, extreme meticulous detailing, skin pore detailing, "
    "hyper sharpness, perfect without deformations, "
    "taken using a Canon EOS R camera, Cinematic, High Contrast, Color Grading. "
)
DEFAULT_NEG_PROMPT = (
    "blurry, out of focus, unclear, depth of field, over-smooth, "
    "sketch, oil painting, cartoon, CG Style, 3D render, unreal engine, "
    "dirty, messy, worst quality, low quality, frames, painting, illustration, drawing, art, "
    "watermark, signature, jpeg artifacts, deformed, lowres"
)


def resize_img(
    pil_image,
    max_side: int = 1024,
    min_side: int = 768,
    width: Optional[int] = None,
    height: Optional[int] = None,
    base_pixel_number: int = 64,
):
    """Reference ``resize_img`` (``infer.py:31-66``): fit to [min,max] side
    then floor to /64 multiples; returns (resized, original out size)."""
    from PIL import Image

    w, h = pil_image.size
    if width is not None and height is not None:
        out_w, out_h = width, height
    elif width is not None:
        out_w, out_h = width, round(h * width / w)
    elif height is not None:
        out_w, out_h = round(w * height / h), height
    else:
        out_w, out_h = w, h
    w, h = out_w, out_h
    if min(w, h) < min_side:
        ratio = min_side / min(w, h)
        w, h = round(ratio * w), round(ratio * h)
    if max(w, h) > max_side:
        ratio = max_side / max(w, h)
        w, h = round(ratio * w), round(ratio * h)
    w_new = (w // base_pixel_number) * base_pixel_number
    h_new = (h // base_pixel_number) * base_pixel_number
    return pil_image.resize([w_new, h_new], Image.BILINEAR), (out_w, out_h)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="InstantIR-TPU restoration")
    p.add_argument("--sdxl_path", type=str, required=True)
    p.add_argument("--instantir_path", type=str, required=True)
    p.add_argument("--vision_encoder_path", type=str, required=True)
    p.add_argument("--adapter_model_path", type=str, default=None)
    p.add_argument("--previewer_lora_path", type=str, default=None)
    p.add_argument("--test_path", type=str, required=True)
    p.add_argument("--out_path", type=str, default="./output")
    p.add_argument("--post_fix", type=str, default=None)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--cfg", type=float, default=7.0)
    p.add_argument("--preview_start", type=float, default=0.0)
    p.add_argument("--creative_start", type=float, default=1.0, help="maps to control_guidance_end")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--min_side", type=int, default=768, help="resize_img min side (infer.py:31-66)")
    p.add_argument("--max_side", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--neg_prompt", type=str, default=None)
    p.add_argument("--save_preview_row", action="store_true")
    p.add_argument(
        "--watermark", action="store_true",
        help="embed the standard 48-bit SD invisible watermark in outputs "
        "(the reference applies this automatically when the optional "
        "invisible_watermark package is installed; rebuilt DCT-QIM codec, "
        "utils/watermark.py)",
    )
    p.add_argument(
        "--use_clip_encoder", action="store_true",
        help="read --vision_encoder_path as an HF CLIP vision tower instead "
        "of DINOv2 and condition on its penultimate-layer tokens "
        "(infer.py:275-279; the released InstantIR adapters are DINOv2-based)",
    )
    p.add_argument(
        "--denoising_start", type=int, default=1000,
        help="truncate the denoise schedule: <1000 spaces the steps evenly "
        "over [steps_offset, denoising_start) instead of the full range — "
        "the LQ-latent init is already partially clean. Implements the "
        "INTENDED semantics of the reference flag (its own computed list is "
        "dead code, overwritten at infer.py:189-190 — SURVEY §2.5).",
    )
    p.add_argument(
        "--multistep_restore", action="store_true",
        help="Heun lookahead on previewing steps: evaluate aggregator+UNet at "
        "the first-order-predicted next latent (working rebuild of the "
        "reference's broken multistep_restore path, sdxl_instantir.py:1569).",
    )
    p.add_argument(
        "--shared_cfg", action="store_true",
        help="CFG single-pass control branch: previewer+aggregator run on the "
        "text-cond half only (~25%% faster at 1024²; slight approximation — "
        "docs/perf.md). Default follows the reference's doubled-batch exact path.",
    )
    p.add_argument(
        "--fused", action="store_true",
        help="compile the whole restore (encoders + denoise scans + decode) "
        "into ONE XLA program — same math/RNG, no per-stage dispatch "
        "(~0.2 s/image through a dispatch relay); bigger first compile.",
    )
    p.add_argument(
        "--quantized", nargs="?", const="w8a8", default=None, choices=("w8a8", "w8"),
        help="int8 inference on the UNet+Aggregator: 'w8a8' (dynamic "
        "activation quant — measured SLOWER end-to-end at 1024² than exact, "
        "kept as the recorded negative) or 'w8' (weight-only: kernels "
        "dequantized at use — exact-quality-class, half the weight HBM, the "
        "batch-2 enabler). Tables in docs/perf.md. VAE/encoders/LoRA stay fp.",
    )
    p.add_argument(
        "--deepcache_interval", type=int, default=1,
        help="DeepCache block caching (arXiv 2312.03209): refresh the deep "
        "UNet trunk + previewer + aggregator every N steps, run only the "
        "shallow UNet levels in between. 1 = exact (off); 2-3 trade slight "
        "quality for large speedups (docs/perf.md).",
    )
    p.add_argument(
        "--deepcache_depth", type=int, default=1,
        help="number of shallow UNet levels recomputed on cached steps "
        "(higher = closer to exact, less speedup)",
    )
    p.add_argument(
        "--sequence_parallel", action="store_true",
        help="long-context mode for ≥2K² inputs: replicate the batch over all "
        "local devices and ring-attend long self-attention sequences over the "
        "mesh (exact math, O(S/n) attention memory per chip — docs/perf.md)",
    )
    p.add_argument(
        "--sp_min_seq", type=int, default=8192,
        help="with --sequence_parallel: minimum self-attention sequence "
        "length that takes the ring path",
    )
    p.add_argument(
        "--vae_tiling", action="store_true",
        help="constant-memory tiled VAE encode/decode with blended overlaps "
        "(the reference's diffusers-VAE enable_tiling); recommended with "
        "--sequence_parallel at ≥2K² where a monolithic fp32 decode would "
        "dominate the memory peak. No-op when the image fits one tile.",
    )
    p.add_argument(
        "--vae_tile_latent", type=int, default=96,
        help="with --vae_tiling: latent-space tile edge (×8 pixels)",
    )
    p.add_argument(
        "--vae_slicing", action="store_true",
        help="VAE encode/decode one sample at a time (exact; batch-"
        "independent activation memory — the reference's enable_slicing)",
    )
    return p


def main(argv: Optional[List[str]] = None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from instantir_tpu.models.clip_text import encode_sdxl_prompt
    from instantir_tpu.parallel import initialize_distributed
    from instantir_tpu.pipeline.instantir import RestoreConfig
    from instantir_tpu.pipeline.load import load_instantir_pipeline, load_text_encoders

    args = build_parser().parse_args(argv)
    initialize_distributed()  # multi-host no-op unless a coordinator is configured
    pipe = load_instantir_pipeline(
        args.sdxl_path,
        args.instantir_path,
        vision_encoder_path=args.vision_encoder_path,
        adapter_path=args.adapter_model_path,
        previewer_lora_path=args.previewer_lora_path,
        use_clip_encoder=args.use_clip_encoder,
    )
    if args.quantized:
        pipe.quantize(weight_only=args.quantized == "w8")
    (enc1, p1, tok1), (enc2, p2, tok2) = load_text_encoders(args.sdxl_path)

    def encode(prompts: List[str]):
        ids1 = jnp.asarray([tok1(p, padding="max_length", max_length=77, truncation=True)["input_ids"] for p in prompts])
        ids2 = jnp.asarray([tok2(p, padding="max_length", max_length=77, truncation=True)["input_ids"] for p in prompts])
        return encode_sdxl_prompt(enc1, p1, enc2, p2, ids1, ids2)

    post_fix = f"_{args.post_fix}" if args.post_fix else ""
    out_dir = os.path.join(args.out_path, post_fix)
    os.makedirs(out_dir, exist_ok=True)
    processed = set(os.listdir(out_dir))

    if os.path.isfile(args.test_path):
        all_inputs = [os.path.basename(args.test_path)]
        base_dir = os.path.dirname(args.test_path)
    else:
        all_inputs = sorted(os.listdir(args.test_path))
        base_dir = args.test_path
    files = [f for f in all_inputs if f not in processed]

    prompt = args.prompt or DEFAULT_PROMPT
    neg = args.neg_prompt or DEFAULT_NEG_PROMPT
    custom_timesteps = None
    num_steps = args.num_inference_steps
    if args.denoising_start < 1000:
        # evenly spaced over [steps_offset, denoising_start), descending — the
        # reference's intended truncated schedule (infer.py:184-188). Fewer
        # usable levels than requested steps clamps the step count so every
        # timestep stays strictly below denoising_start.
        offset = RestoreConfig().steps_offset
        num_steps = min(num_steps, max(args.denoising_start - offset, 1))
        stride = max((args.denoising_start - offset) // num_steps, 1)
        custom_timesteps = tuple(i * stride + offset for i in range(num_steps))[::-1]
    cfg = RestoreConfig(
        timesteps=custom_timesteps,
        num_inference_steps=num_steps,
        guidance_scale=args.cfg,
        preview_start=args.preview_start,
        control_guidance_end=args.creative_start,
        save_preview_row=args.save_preview_row,
        multistep_restore=args.multistep_restore,
        lora_alpha=1.0,
        preview_cfg=not args.shared_cfg,
        controlnet_cfg=not args.shared_cfg,
        fused=args.fused,
        deepcache_interval=args.deepcache_interval,
        deepcache_depth=args.deepcache_depth,
        sequence_parallel=args.sequence_parallel,
        sp_min_seq=args.sp_min_seq,
        vae_tiling=args.vae_tiling,
        vae_tile_latent=args.vae_tile_latent,
        vae_slicing=args.vae_slicing,
    )
    if args.sequence_parallel:
        from instantir_tpu.parallel.mesh import make_mesh

        pipe.shard(make_mesh())

    for i in range(0, len(files), args.batch_size):
        batch_files = files[i : i + args.batch_size]
        imgs, out_sizes = [], []
        for f in batch_files:
            im, out_size = resize_img(Image.open(os.path.join(base_dir, f)).convert("RGB"),
                                      width=args.width, height=args.height,
                                      min_side=args.min_side, max_side=args.max_side)
            imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
            out_sizes.append(out_size)
        lq = jnp.asarray(np.stack(imgs))
        pe, pooled = encode([prompt] * len(batch_files))
        npe, npooled = encode([neg] * len(batch_files))
        image, previews = pipe.restore(
            lq, pe, pooled, negative_prompt_embeds=npe, negative_pooled_embeds=npooled,
            cfg=cfg, key=jax.random.PRNGKey(args.seed),
        )
        image01 = (np.clip(np.asarray(image, np.float32), -1, 1) + 1) / 2.0
        if args.watermark:
            from instantir_tpu.utils.watermark import embed_watermark

            image01 = embed_watermark(image01)
        image = np.asarray(image01 * 255.0).astype(np.uint8)
        for f, im, size in zip(batch_files, image, out_sizes):
            Image.fromarray(im).resize(size, Image.BILINEAR).save(os.path.join(out_dir, f))
        print(f"[infer] wrote {len(batch_files)} images → {out_dir}")


if __name__ == "__main__":
    main()
