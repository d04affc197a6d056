"""Interactive demo — the framework's equivalent of ``gradio_demo/app.py``.

Loads the pipeline with both the previewer LoRA and (optionally) an LCM LoRA,
exposes ``instantir_restore`` with the "Creative Restoration" switch
(``gradio_demo/app.py:112-156``): creative mode raises ``creative_start``
(→ ``control_guidance_end``) and can switch the previewer adapter; integer
"steps" sliders convert to schedule fractions; per-step previews returned as
a gallery when requested.

The UI needs ``gradio`` (not bundled in this environment); the restoration
callable itself is importable and tested without it.
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np

from instantir_tpu.cli.infer import DEFAULT_NEG_PROMPT, DEFAULT_PROMPT, resize_img


def extract_unet_lora(unet_tree) -> dict:
    """Flat {path: array} of every UNet LoRA leaf (an 'adapter' snapshot)."""
    from instantir_tpu.train.common import LORA_PARAM_PRED, partition_params

    lora, _ = partition_params(unet_tree["params"], LORA_PARAM_PRED)
    return lora


def load_lcm_lora_variant(unet_tree, lcm_lora_path: str, config) -> dict:
    """Build the 'lcm' adapter variant: the UNet's LoRA leaves zeroed, then a
    diffusers-format LCM-LoRA file merged in — the functional analogue of the
    reference demo's second named adapter (``gradio_demo/app.py:67-70``)."""
    import copy

    import jax

    from instantir_tpu.convert import torch_to_flax as t2f

    tree = {"params": copy.deepcopy(jax.tree_util.tree_map(np.asarray, unet_tree["params"]))}

    def zero_lora(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        return np.zeros_like(leaf) if any(n in ("lora_a", "lora_b") for n in names) else leaf

    tree["params"] = jax.tree_util.tree_map_with_path(zero_lora, tree["params"])
    lora_sd = t2f.load_torch_state_dict(lcm_lora_path)
    tree, n, unmatched = t2f.merge_previewer_lora(tree, lora_sd, config)
    if n == 0:
        raise ValueError(f"no LoRA tensors from {lcm_lora_path} merged into the UNet")
    if unmatched:
        print(f"[app] WARNING: {len(unmatched)} LCM-LoRA tensors unmatched (first: {unmatched[:3]})")
    return extract_unet_lora(tree)


class InstantIRApp:
    def __init__(self, pipe, encode_fn, lora_variants: Optional[dict] = None):
        """pipe: InstantIRPipeline; encode_fn: list[str] → (embeds, pooled);
        lora_variants: {name: flat UNet-LoRA leaf dict} — the functional
        analogue of the reference demo's named adapters ("previewer"/"lcm",
        ``gradio_demo/app.py:67-70``). The previewer's own LoRA leaves are
        snapshotted as the "previewer" variant automatically."""
        self.pipe = pipe
        self.encode = encode_fn
        self.lora_variants = dict(lora_variants or {})
        self.lora_variants.setdefault("previewer", extract_unet_lora(pipe.params["unet"]))
        self.active_adapter = "previewer"

    def set_adapter(self, name: str):
        """Swap the UNet's LoRA leaves to the named variant — a pure pytree
        update, so no jitted program recompiles (the reference mutates module
        state via set_adapters, ``gradio_demo/app.py:115-120``)."""
        if name == self.active_adapter:
            return
        if name not in self.lora_variants:
            raise KeyError(f"unknown adapter {name!r}; have {sorted(self.lora_variants)}")
        from instantir_tpu.train.common import LORA_PARAM_PRED, merge_params, partition_params

        _, base = partition_params(self.pipe.params["unet"]["params"], LORA_PARAM_PRED)
        self.pipe.params["unet"]["params"] = merge_params(base, self.lora_variants[name])
        self.active_adapter = name

    def instantir_restore(
        self,
        lq_image,
        prompt: str = "",
        steps: int = 30,
        cfg_scale: float = 7.0,
        guidance_end: float = 1.0,
        creative_restoration: bool = False,
        seed: int = 3407,
        height: int = 1024,
        width: int = 1024,
        preview_start: float = 0.0,
        save_preview_row: bool = False,
        fused: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from instantir_tpu.pipeline.instantir import RestoreConfig

        if creative_restoration:
            # creative mode (gradio_demo/app.py:115-129): switch to the LCM
            # adapter when one is loaded, and stop ControlNet guidance earlier
            # so the text prompt drives the late steps
            if "lcm" in self.lora_variants:
                self.set_adapter("lcm")
            guidance_end = min(guidance_end, 0.75)
        else:
            self.set_adapter("previewer")
        lq_resized, out_size = resize_img(lq_image, width=width if width else None, height=height if height else None)
        lq = jnp.asarray(np.asarray(lq_resized, np.float32)[None] / 127.5 - 1.0)
        prompt = prompt if prompt else DEFAULT_PROMPT
        pe, pooled = self.encode([prompt])
        npe, npooled = self.encode([DEFAULT_NEG_PROMPT])
        cfg = RestoreConfig(
            num_inference_steps=int(steps),
            guidance_scale=float(cfg_scale),
            preview_start=float(preview_start),
            control_guidance_end=float(guidance_end),
            save_preview_row=bool(save_preview_row),
            fused=bool(fused),
        )
        image, previews = self.pipe.restore(
            lq, pe, pooled, negative_prompt_embeds=npe, negative_pooled_embeds=npooled,
            cfg=cfg, key=jax.random.PRNGKey(int(seed)),
        )
        from PIL import Image

        def to_pil(x):
            return Image.fromarray(((np.clip(np.asarray(x), -1, 1) + 1) * 127.5).astype(np.uint8))

        out = to_pil(image[0]).resize(out_size, Image.BILINEAR)
        gallery = [to_pil(p[0]) for p in previews] if previews else []
        return out, gallery


def launch(argv: Optional[List[str]] = None):
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "gradio is not installed in this environment; use `python -m instantir_tpu.cli.infer` "
            "for batch restoration, or install gradio to launch the demo UI."
        ) from e

    import jax.numpy as jnp

    from instantir_tpu.models.clip_text import encode_sdxl_prompt
    from instantir_tpu.parallel import initialize_distributed
    from instantir_tpu.pipeline.load import load_instantir_pipeline, load_text_encoders

    initialize_distributed()  # multi-host no-op unless a coordinator is configured
    p = argparse.ArgumentParser()
    p.add_argument("--sdxl_path", required=True)
    p.add_argument("--instantir_path", required=True)
    p.add_argument("--vision_encoder_path", required=True)
    p.add_argument("--lcm_lora_path", default=None, help="LCM-LoRA for creative mode (gradio_demo/app.py:69)")
    args = p.parse_args(argv)

    pipe = load_instantir_pipeline(args.sdxl_path, args.instantir_path, args.vision_encoder_path)
    variants = None
    if args.lcm_lora_path:
        variants = {"lcm": load_lcm_lora_variant(pipe.params["unet"], args.lcm_lora_path, pipe.unet.config)}
    (enc1, p1, tok1), (enc2, p2, tok2) = load_text_encoders(args.sdxl_path)

    def encode(prompts):
        ids1 = jnp.asarray([tok1(x, padding="max_length", max_length=77, truncation=True)["input_ids"] for x in prompts])
        ids2 = jnp.asarray([tok2(x, padding="max_length", max_length=77, truncation=True)["input_ids"] for x in prompts])
        return encode_sdxl_prompt(enc1, p1, enc2, p2, ids1, ids2)

    app = InstantIRApp(pipe, encode, lora_variants=variants)

    with gr.Blocks() as demo:
        gr.Markdown("# InstantIR-TPU: Blind Image Restoration")
        with gr.Row():
            with gr.Column():
                lq = gr.Image(type="pil", label="Low-quality image")
                prompt = gr.Textbox(label="Prompt (creative restoration)")
                creative = gr.Checkbox(label="Creative Restoration")
                steps = gr.Slider(1, 50, value=30, step=1, label="Steps")
                cfg = gr.Slider(1.0, 10.0, value=7.0, label="CFG scale")
                guidance_end = gr.Slider(0.0, 1.0, value=1.0, label="Guidance end")
                preview_start = gr.Slider(0.0, 1.0, value=0.0, label="Preview start")
                seed = gr.Number(value=3407, label="Seed")
                previews = gr.Checkbox(label="Show per-step previews")
                run = gr.Button("Restore")
            with gr.Column():
                out = gr.Image(label="Restored")
                gallery = gr.Gallery(label="Previewer row")
        def _run(lq_im, prompt_s, steps_v, cfg_v, guidance_end_v, creative_v, seed_v, previews_v, preview_start_v):
            return app.instantir_restore(
                lq_im, prompt=prompt_s, steps=steps_v, cfg_scale=cfg_v, guidance_end=guidance_end_v,
                creative_restoration=creative_v, seed=seed_v,
                preview_start=preview_start_v, save_preview_row=previews_v,
            )

        run.click(
            _run,
            [lq, prompt, steps, cfg, guidance_end, creative, seed, previews, preview_start],
            [out, gallery],
        )
    demo.launch()


if __name__ == "__main__":
    launch()
