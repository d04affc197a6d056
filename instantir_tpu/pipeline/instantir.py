"""InstantIR restoration pipeline — the full denoise loop as jitted scans.

Functional rebuild of the reference hot loop
(``pipelines/sdxl_instantir.py:1497-1666``): per step, a one-step LCM
previewer (UNet with previewer-LoRA *on*) produces a clean reference latent,
the Aggregator fuses (LQ latent, preview) into per-resolution residuals, and
the main UNet (LoRA *off*, time-aware IP attention) predicts the noise which
a stochastic DDPM step consumes.

TPU-first structure — instead of a Python loop with per-step host syncs
(the reference's ``(cond_scale>0.1).sum().item()`` at ``:1542`` and
module-state LoRA toggling at ``:1545/:1562``), the step schedule is
partitioned **statically** into at most three phases from the
``preview_start/preview_end/control_guidance_*`` fractions (``:1414-1421``):

  A. controlnet on, previewer off  → preview_latent := LQ latent (``:1582``)
  B. controlnet on, previewer on   → previewer UNet + LCM step (``:1545-1561``)
  C. controlnet off                → plain SDXL UNet step

Each phase is one ``lax.scan`` body (so XLA compiles each distinct step
graph exactly once and no step computes work its schedule masks away), and
the previewer-on/off distinction is a traced-constant ``lora_scale`` — both
UNet modes share one parameter tree resident in HBM.

Everything inside ``sample()`` is device-side: CFG batch doubling, guidance
rescale, adaptive restoration factors (``adastep``, ``:1636-1644``), and the
preview row capture (stacked scan outputs, decoded after the loop — the
reference ships every preview to CPU per step, ``:1565-1567``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.aggregator import Aggregator
from instantir_tpu.models.dinov2 import DINOv2Model, preprocess_dinov2
from instantir_tpu.models.resampler import Resampler
from instantir_tpu.models.unet import UNet2DConditionModel
from instantir_tpu.models.vae import (
    AutoencoderKL,
    scale_latents,
    tiled_decode,
    tiled_encode,
    unscale_latents,
    vae_scale_factor,
)
from instantir_tpu.schedulers.diffusion import (
    DiffusionSchedule,
    add_noise,
    ddpm_inference_timesteps,
    ddpm_prev_timesteps,
    ddpm_step,
    lcm_single_step,
)


def rescale_noise_cfg(noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray, guidance_rescale: float) -> jnp.ndarray:
    """CFG std rescale (arXiv 2305.08891 §3.4; reference ``:181-192``)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


@dataclasses.dataclass(frozen=True)
class RestoreConfig:
    """Static sampling configuration (hashable; part of the jit key)."""

    num_inference_steps: int = 30
    guidance_scale: float = 7.0
    guidance_rescale: float = 0.0
    preview_start: float = 0.0
    preview_end: float = 1.0
    control_guidance_start: float = 0.0
    control_guidance_end: float = 1.0
    controlnet_conditioning_scale: float = 1.0
    lora_alpha: float = 1.0  # previewer LoRA strength when enabled
    # fold the previewer LoRA into a merged weight set inside the sampler
    # program (W + scale·(α/r)·AB) instead of paying the rank-r matmul pair
    # at every linear/conv of every preview step (measured 6.9 ms/step ≈ 4%
    # of the previewer forward after the round-2 flash-kernel rework —
    # docs/perf.md). Off by default: it holds base + merged + LoRA pairs
    # simultaneously, which exceeds one v5e's HBM at SDXL scale — and the
    # once-merged ``InstantIRPipeline.freeze_previewer`` alternative is
    # itself HBM-gated at 1024² (works ≤768²), so the dynamic branch is the
    # production default.
    fuse_previewer_lora: bool = False
    # CFG single-pass control branch (opt-in approximations; defaults are
    # parity-exact with the reference, which runs previewer and aggregator on
    # the doubled CFG batch, sdxl_instantir.py:1545-1616):
    #  * preview_cfg=False — run the one-step LCM previewer only on the
    #    text-cond half and reuse that preview for the uncond aggregator
    #    branch (LCM students have guidance distilled in; the uncond preview
    #    differs only through uncond ip tokens). Halves previewer cost.
    #  * controlnet_cfg=False — run the aggregator only on the text-cond half
    #    and reuse its residuals for the uncond branch (the halves differ
    #    only via pooled-embed conditioning; cf. diffusers' guess_mode-style
    #    cond-only ControlNet). Halves aggregator cost.
    # Exact when uncond conditioning equals cond conditioning; measured
    # divergence + speedup in docs/perf.md.
    preview_cfg: bool = True
    controlnet_cfg: bool = True
    # DeepCache block caching (arXiv 2312.03209, "Cache Me if You Can"-family
    # step caching; opt-in approximation like the shared-CFG branch above):
    # every `deepcache_interval`-th step is a REFRESH step that runs the full
    # previewer → aggregator → main-UNet stack and caches (a) the main UNet's
    # deep trunk output and (b) the aggregator's shallow-skip residuals; the
    # steps in between run ONLY the shallowest `deepcache_depth` UNet levels
    # against the cached trunk (fresh conv_in/down/up at the outer levels keep
    # tracking x_t) and skip the previewer and aggregator entirely, reusing
    # the cached residuals. Phase boundaries always refresh. interval=1 is
    # exact (off, the default). The UNet split itself is bit-exact at equal
    # timestep (tests/test_unet.py::test_deepcache_split_is_exact_same_step);
    # cross-step reuse is the approximation — measured divergence and speedup
    # in docs/perf.md. Incompatible with multistep_restore (the lookahead
    # needs a fresh preview every step).
    deepcache_interval: int = 1
    deepcache_depth: int = 1
    # Second-order "Heun lookahead" restore (reference ``multistep_restore``,
    # ``sdxl_instantir.py:1094,1569-1577``): on previewing steps, take a
    # deterministic first-order DDPM step with the previewer's text-cond noise
    # to predict x at the next timestep, then evaluate the aggregator and the
    # main UNet AT that lookahead point (timestep ``timesteps[i+1]``) while
    # the stochastic DDPM update still steps from (x_t, t) with the lookahead
    # noise estimate. NOTE the reference implementation is broken in-tree —
    # it passes ``step_forward``/``heun_step`` kwargs that stock diffusers
    # schedulers reject (SURVEY §2.5) and only ran against a privately patched
    # scheduler; this is a *working* rebuild of the intended semantics,
    # oracle-tested against a hand-assembled torch loop
    # (tests/test_restore_trajectory_oracle.py).
    multistep_restore: bool = False
    adastep_restore: bool = False
    # Sequence-parallel (ring attention) restore for ≥2K² long-context inputs
    # — SURVEY §5's stretch goal; the reference has no counterpart (its max
    # attention sequence is 8192 tokens, done densely on one GPU). Requires
    # an attached mesh. The batch is REPLICATED over the mesh instead of
    # data-sharded (the mode exists precisely because ONE image's attention
    # is too big for one chip), and every self-attention whose sequence is
    # ≥ sp_min_seq and divides the 'data' axis runs as ring attention
    # (parallel/ring_attention.py): K/V shards rotate over the ICI ring via
    # ppermute with an exact online-softmax merge — O(S/n) attention memory
    # per chip, bit-identical math. Latent parity with the dense path is
    # tested end-to-end on the virtual 8-device mesh
    # (tests/test_ring_attention.py). sp_min_seq=8192 rings the 16K/32K
    # sequences a 2048² restore produces while leaving ≤1024² restores on
    # the single-chip flash path.
    sequence_parallel: bool = False
    sp_min_seq: int = 8192
    save_preview_row: bool = False
    # Tiled VAE (constant-memory encode/decode at large resolutions; the
    # reference's vendored diffusers VAE carries the same capability,
    # ``module/diffusers_vae/autoencoder_kl.py:323-402``). The natural
    # companion of sequence_parallel: at 2048² a monolithic fp32 decode
    # (2048² × 128ch activations) would re-create the memory peak the ring
    # attention removed. Uniform static tile shapes → one compiled decoder
    # program reused across tiles; weight-normalized tent blending
    # (models/vae.py::tiled_decode). No-op when the image fits one tile.
    vae_tiling: bool = False
    vae_tile_latent: int = 96  # latent-space tile edge (×8 = 768² pixels)
    vae_tile_overlap: float = 0.25
    # Sliced VAE (the reference's diffusers-VAE enable_slicing,
    # ``autoencoder_kl.py:145-157``): encode/decode one sample at a time via
    # ``lax.scan`` so the VAE activation peak is independent of batch size —
    # exact (unlike tiling), just serialized. Useful for batched restores at
    # 1024² where a batch-N fp32 decode would multiply the ~0.5 GB/layer
    # decoder activations by N. No-op at batch 1.
    vae_slicing: bool = False
    # VAE decode dtype: "float32" (reference force_upcast — its fp16 VAE
    # overflows) or "bfloat16" (range-safe on TPU: bf16 carries fp32's
    # exponent; only mantissa precision drops, below 8-bit output rounding)
    decode_dtype: str = "float32"
    num_train_timesteps: int = 1000
    timestep_spacing: str = "leading"
    steps_offset: int = 1
    timesteps: Optional[Tuple[int, ...]] = None  # custom descending sequence (static)
    # Compile the WHOLE restore call (VAE encode → DINOv2 → Resampler →
    # init-noise → denoise scans → VAE decode) into one XLA program instead
    # of ~7 separately-jitted stages. Same math, same RNG stream — only the
    # per-stage dispatch boundaries disappear (~35 ms each through this
    # environment's TPU relay ≈ 0.2 s/image). Costs one bigger first-call
    # compile; staged/fused latent agreement is tested.
    fused: bool = False

    @property
    def do_cfg(self) -> bool:
        return self.guidance_scale > 1.0


def build_step_phases(cfg: RestoreConfig, timesteps: Optional[np.ndarray] = None) -> List[Dict[str, Any]]:
    """Split the step sequence into contiguous runs of (previewing, cnet_on).

    Reproduces the reference's per-step schedule flags (``:1414-1421``) and
    groups equal-flag runs so each run becomes one scan.
    """
    if timesteps is None:
        timesteps = cfg.timesteps
    if timesteps is not None:
        timesteps = np.asarray(timesteps, np.int64)
        n = len(timesteps)
    else:
        n = cfg.num_inference_steps
        timesteps = ddpm_inference_timesteps(
            n, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset
        )
    prev_ts = ddpm_prev_timesteps(timesteps, cfg.num_train_timesteps, n)

    phases: List[Dict[str, Any]] = []
    for i in range(n):
        keep = not (i / n < cfg.control_guidance_start or (i + 1) / n > cfg.control_guidance_end)
        previewing = not (i / n < cfg.preview_start or (i + 1) / n > cfg.preview_end)
        previewing = previewing and keep  # preview output unused when cnet off
        mode = ("B" if previewing else "A") if keep else "C"
        # multistep lookahead target = the NEXT entry of the timestep list
        # (reference ``prev_t = timesteps[i + 1]`` at :1575); no lookahead on
        # the final step (``i+1 < len(timesteps)`` guard at :1569)
        next_t = int(timesteps[i + 1]) if i + 1 < n else int(timesteps[i])
        has_next = 1.0 if i + 1 < n else 0.0
        # deepcache refresh schedule: every interval-th step, forced at phase
        # starts so a cache never crosses a mode boundary stale
        refresh = 1.0 if (i % max(cfg.deepcache_interval, 1) == 0) else 0.0
        if phases and phases[-1]["mode"] == mode:
            phases[-1]["t"].append(int(timesteps[i]))
            phases[-1]["prev_t"].append(int(prev_ts[i]))
            phases[-1]["next_t"].append(next_t)
            phases[-1]["has_next"].append(has_next)
            phases[-1]["refresh"].append(refresh)
        else:
            phases.append({"mode": mode, "t": [int(timesteps[i])], "prev_t": [int(prev_ts[i])],
                           "next_t": [next_t], "has_next": [has_next], "refresh": [1.0]})
    return phases


class InstantIRPipeline:
    """Bundles the models + parameters and exposes ``restore``.

    Text encoding/tokenization happens outside (host side or via the CLIP
    modules in ``models.clip_text``); this class takes prompt embeddings, so
    the whole object stays functional and jit-friendly.
    """

    def __init__(
        self,
        unet: UNet2DConditionModel,
        aggregator: Aggregator,
        vae: AutoencoderKL,
        resampler: Resampler,
        image_encoder: Optional[DINOv2Model],
        schedule: DiffusionSchedule,
        params: Dict[str, Any],
    ):
        self.unet = unet
        self.aggregator = aggregator
        self.vae = vae
        self.resampler = resampler
        self.image_encoder = image_encoder
        self.schedule = schedule
        self.params = params
        self.mesh = None
        self._prev_unet = None  # merged previewer weights (freeze_previewer)
        self._frozen_alpha = None
        self._sample_fn_cache: Dict[Any, Any] = {}
        # Every device-side stage is jitted: an eager encoder pass costs
        # hundreds of per-op dispatches (~4-6 s through this environment's
        # TPU relay vs ~30 ms compiled).
        self._jit_vae_encode = jax.jit(
            lambda p, img, rng: scale_latents(
                self.vae.config, self.vae.apply(p["vae"], img, rng=rng, sample=True, method=self.vae.encode)
            )
        )
        self._jit_dino = jax.jit(lambda p, px: self.image_encoder.apply(p["image_encoder"], px))
        self._jit_resampler = jax.jit(
            lambda p, tokens, lora_scale: self.resampler.apply(p["resampler"], tokens, lora_scale=lora_scale),
            static_argnums=2,
        )
        self._jit_decode_cache: Dict[Any, Any] = {}
        self._jit_vae_encode_tiled: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # Multi-chip inference (BASELINE config #5): parameters replicated over
    # the mesh, the image batch sharded on its ``data`` axis — every stage
    # (encoders, denoise scans, decode) then runs data-parallel with XLA
    # propagating the shardings. The reference has no multi-device inference
    # at all (SURVEY §1: "inference is strictly single-device").
    # ------------------------------------------------------------------

    def shard(self, mesh):
        """Attach a mesh: place params now, shard batches per call.

        With a pure ``data`` mesh the parameters replicate (DP throughput
        scaling, BASELINE config #5). If the mesh also has a ``model`` axis
        of size > 1, parameters take the tensor-parallel layout instead
        (``parallel.tp``: attention/MLP kernels split over heads/features
        AND resnet/sampler conv channels in column→row pairs, each pair
        closed by one XLA-inserted all-reduce) — cutting *per-image latency*
        and the per-chip weight footprint: 86% of UNet+Aggregator bytes
        shard (tests/test_tensor_parallel.py), so the ~9.5 GB single-chip
        parameter set drops to ~5.8 GB/chip at model=2 (7.4 GB sharded ÷ 2
        + ~2.1 GB replicated encoders/norms). The reference has no
        multi-device inference at all (SURVEY §1)."""
        from instantir_tpu.parallel.mesh import replicate_params
        from instantir_tpu.parallel.tp import tp_shard_params

        self.mesh = mesh
        if mesh is not None:
            tp = dict(mesh.shape).get("model", 1) > 1
            place = (lambda p: tp_shard_params(p, mesh)) if tp else (
                lambda p: replicate_params(p, mesh))
            self.params = place(self.params)
            if self._prev_unet is not None:
                self._prev_unet = place(self._prev_unet)
            # drop cached uncond tokens computed under the old placement
            self._uncond_cache_params = None
        return self

    def freeze_previewer(self, alpha: float = 1.0):
        """Inference-only: fold the previewer LoRA into a dedicated merged
        weight set ONCE (``W + α_run·(α_mod/r)·AB``) and drop the LoRA A/B
        pairs from memory. Mode-B preview steps then apply the merged weights
        with the adapter branch statically skipped — saving the rank-r matmul
        pair at every linear/conv of every preview step (6.9 ms/step at SDXL
        scale post flash-rework, ≈4% of the preview UNet — see docs/perf.md)
        — and base+merged fits one v5e chip only because the ~0.4 GiB
        of A/B pairs is freed. After freezing, ``restore`` requires
        ``cfg.lora_alpha == alpha`` (or 0), and dynamic adapter switching
        (the demo's set_adapter) is unavailable."""
        import jax

        if "quant" in self.params["unet"]:
            raise ValueError("freeze_previewer() on a quantized pipeline is unsupported — "
                             "the int8 base kernels can't absorb a LoRA merge")
        params = self.params["unet"]["params"]
        lora_paths: list = []

        def find(node, path):
            if isinstance(node, dict):
                if "base" in node and "lora_a" in node:
                    lora_paths.append(path)
                else:
                    for k, v in node.items():
                        find(v, path + (k,))

        find(params, ())
        module_alpha = self.unet.config.lora_alpha

        @jax.jit
        def merged_kernels(p):
            out = {}
            for path in lora_paths:
                node = p
                for k in path:
                    node = node[k]
                a, bk, base_k = node["lora_a"]["kernel"], node["lora_b"]["kernel"], node["base"]["kernel"]
                r = a.shape[-1]
                delta = a @ bk if base_k.ndim == 2 else jnp.einsum("hwir,ro->hwio", a, bk[0, 0])
                out["/".join(path)] = base_k + jnp.asarray(alpha * module_alpha / r, base_k.dtype) * delta
            return out

        merged_flat = merged_kernels(params) if lora_paths else {}

        def strip(node):
            if not isinstance(node, dict):
                return node
            if "base" in node and "lora_a" in node:
                return {k: v for k, v in node.items() if k not in ("lora_a", "lora_b")}
            return {k: strip(v) for k, v in node.items()}

        # self._prev_unet holds ONLY the merged kernels, keyed by module path;
        # the sampler weaves them over the base tree at trace time. Passing a
        # full merged tree instead would double-count the shared non-LoRA
        # leaves in XLA's program-input accounting and blow the HBM budget.
        self.params = {**self.params, "unet": {**self.params["unet"], "params": strip(params)}}
        self._prev_unet = merged_flat
        self._frozen_alpha = float(alpha)
        self._sample_fn_cache.clear()
        if self.mesh is not None:
            from instantir_tpu.parallel.mesh import replicate_params

            self._prev_unet = replicate_params(self._prev_unet, self.mesh)
        return self

    def quantize(self, min_size: Optional[int] = None, weight_only: bool = False):
        """Inference-only int8 quantization of the UNet + Aggregator (opt-in,
        CLI ``--quantized``): every LoRADense/LoRAConv base kernel ≥
        ``min_size`` elements moves to an int8 side collection with
        per-output-channel scales. Two modes (ops/quant.py):

        * ``weight_only=False`` (W8A8, CLI ``--quantized w8a8``): the layers
          compute int8×int8→int32 on the MXU with dynamic per-token (matmul)
          / per-sample (conv) activation quantization. The isolated-matmul
          probe shows ~2× the bf16 MXU rate (tools/bench_int8_probe.py), but
          measured END-TO-END at the 1024² headline the full recipe is
          SLOWER than exact (16.0 vs 9.2 s/img, PSNR 31.6 dB — the dynamic
          activation-quant reductions are VPU/HBM-bound and break XLA's
          fusions; docs/perf.md round 4). Kept as the measured negative.
        * ``weight_only=True`` (W8, CLI ``--quantized w8``): kernels stored
          int8 and dequantized to the compute dtype at use — the ordinary fp
          op runs on the MXU, quality stays at weight-rounding level, and
          the weight HBM halves, which is what buys batch 2 per chip at
          1024² (throughput mode, docs/perf.md round 4).

        The VAE (fp32, quality-critical), encoders, LoRA branches, norms,
        and the 4-channel conv_in/conv_out stay in fp in both modes; the
        previewer-LoRA dynamic branch still works (it adds fp deltas to the
        base output). Approximation is gated like DeepCache: quality
        measured vs the exact path (tools/bench_quant_quality.py →
        docs/perf.md). Call BEFORE ``shard`` (the int8 side tree placement
        follows params placement); incompatible with ``freeze_previewer``
        (nothing to merge into)."""
        from instantir_tpu.ops.quant import quantize_tree

        if self._prev_unet is not None:
            raise ValueError("quantize() after freeze_previewer() is unsupported — quantize first")
        if "quant" in self.params["unet"]:
            return self
        kw = {"weight_only": weight_only}
        if min_size is not None:
            kw["min_size"] = min_size
        self.params = {
            **self.params,
            "unet": quantize_tree(self.params["unet"], **kw),
            "aggregator": quantize_tree(self.params["aggregator"], **kw),
        }
        self._sample_fn_cache.clear()
        if self.mesh is not None:
            from instantir_tpu.parallel.mesh import replicate_params

            self.params = replicate_params(self.params, self.mesh)
        return self

    def _trace_scopes(self, cfg):
        """Trace-time parallelism scopes for this (mesh, cfg) pair: the ring
        scope when sequence_parallel, the TP-flash shard_map scope when the
        mesh has a model axis (see ops/attention.py)."""
        import contextlib

        from instantir_tpu.ops.attention import sequence_parallel_scope, tensor_parallel_scope

        stack = contextlib.ExitStack()
        if self.mesh is not None:
            if cfg.sequence_parallel:
                stack.enter_context(sequence_parallel_scope(self.mesh, min_seq=cfg.sp_min_seq))
            if dict(self.mesh.shape).get("model", 1) > 1:
                stack.enter_context(tensor_parallel_scope(self.mesh))
        return stack

    def _shard_inputs(self, *arrays, replicate: bool = False):
        if self.mesh is None:
            return arrays
        from instantir_tpu.parallel.mesh import replicate_params, shard_batch

        place = replicate_params if replicate else shard_batch
        return tuple(None if a is None else place(a, self.mesh) for a in arrays)

    # ------------------------------------------------------------------
    # Encoders (run once per call, outside the denoise loop)
    # ------------------------------------------------------------------

    def encode_image_embeds(self, params, lq_images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """DINOv2 tokens for (cond, uncond=zero image) — reference ``:635-669``.

        The uncond tokens depend only on the parameters (the zero image is a
        constant), so they are computed once and cached across calls."""
        pixels = preprocess_dinov2(lq_images, size=self.image_encoder.config.image_size)
        cond = self._jit_dino(params, pixels)
        uncond_tokens = self._ensure_uncond_tokens(params, pixels.shape[1:], pixels.dtype)
        uncond = jnp.broadcast_to(uncond_tokens, cond.shape)
        return cond, uncond

    def _ensure_uncond_tokens(self, params, pixel_shape, pixel_dtype):
        """DINOv2 tokens of the zero image — parameter-only, cached across
        calls. The identity check is against a STRONG reference — id() alone
        can be reused after GC and silently serve stale embeddings."""
        cache_key = (tuple(pixel_shape), str(pixel_dtype))
        if (
            getattr(self, "_uncond_cache_params", None) is not params["image_encoder"]
            or getattr(self, "_uncond_cache_key", None) != cache_key
        ):
            self._uncond_tokens = self._jit_dino(params, jnp.zeros((1,) + tuple(pixel_shape), pixel_dtype))
            self._uncond_cache_params = params["image_encoder"]
            self._uncond_cache_key = cache_key
        return self._uncond_tokens

    def project_ip_tokens(self, params, dino_tokens: jnp.ndarray, lora_scale=0.0) -> jnp.ndarray:
        """Resampler projection. The previewer LoRA also lives in the
        resampler, so previewer and main UNet see different ip tokens."""
        return self._jit_resampler(params, dino_tokens, float(lora_scale))

    def encode_vae_image(self, params, images: jnp.ndarray, rng: jax.Array,
                         tiling: Optional[Tuple[int, float]] = None,
                         slicing: bool = False) -> jnp.ndarray:
        """[-1,1] images → scaled latents (sampled posterior).

        ``tiling=(tile_latent, overlap)`` switches to the constant-memory
        tiled encoder (no-op when the image fits one tile); ``slicing``
        encodes one sample at a time (exact, batch-independent memory)."""
        slicing = slicing and images.shape[0] > 1
        if tiling is None and not slicing:
            return self._jit_vae_encode(params, images, rng)
        key = (tiling, slicing)
        if key not in self._jit_vae_encode_tiled:
            vae = self.vae

            def _enc_one(p, img, rng):
                if tiling is not None:
                    z = tiled_encode(vae, p["vae"], img, rng=rng, sample=True,
                                     tile_sample=tiling[0] * vae_scale_factor(vae.config),
                                     overlap=tiling[1])
                else:
                    z = vae.apply(p["vae"], img, rng=rng, sample=True, method=vae.encode)
                return scale_latents(vae.config, z)

            if slicing:
                def _enc(p, img, rng):
                    keys = jax.random.split(rng, img.shape[0])
                    return jax.lax.map(lambda ik: _enc_one(p, ik[0][None], ik[1])[0], (img, keys))
            else:
                _enc = _enc_one
            self._jit_vae_encode_tiled[key] = jax.jit(_enc)
        return self._jit_vae_encode_tiled[key](params, images, rng)

    def decode_latents(self, params, latents: jnp.ndarray, dtype=None,
                       tiling: Optional[Tuple[int, float]] = None,
                       slicing: bool = False) -> jnp.ndarray:
        """Model-space latents → images in [-1,1].

        Default fp32 decode (the reference's force_upcast — its fp16 VAE
        overflows). ``dtype=jnp.bfloat16`` is a fast path that is range-safe
        (bf16 has fp32's exponent) at somewhat lower mantissa precision.
        ``tiling=(tile_latent, overlap)`` uses the constant-memory tiled
        decoder (models/vae.py::tiled_decode); ``slicing`` decodes one sample
        at a time (exact, batch-independent activation memory)."""
        key = (str(dtype), tiling, slicing)
        if key not in self._jit_decode_cache:
            self._jit_decode_cache[key] = jax.jit(self._build_decode(dtype, tiling, slicing))
        return self._jit_decode_cache[key](params, latents)

    def _build_decode(self, dtype=None, tiling: Optional[Tuple[int, float]] = None,
                      slicing: bool = False):
        vae = self.vae
        if dtype is not None and dtype != vae.dtype:
            vae = AutoencoderKL(self.vae.config, dtype=dtype)

        def _decode_one(p, z):
            z = unscale_latents(vae.config, z.astype(dtype or jnp.float32))
            if tiling is not None:
                return tiled_decode(vae, p["vae"], z, tile_latent=tiling[0], overlap=tiling[1])
            return vae.apply(p["vae"], z, method=vae.decode)

        def _decode(p, z):
            if slicing and z.shape[0] > 1:
                return jax.lax.map(lambda zb: _decode_one(p, zb[None])[0], z)
            return _decode_one(p, z)

        return _decode

    # ------------------------------------------------------------------
    # Framework-native checkpointing (orbax). Torch-format interop lives in
    # instantir_tpu.convert / the trainers' export_* methods.
    # ------------------------------------------------------------------

    def save_params(self, path: str):
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(os.path.join(path, "params")), self.params)
        ckptr.wait_until_finished()

    def load_params(self, path: str):
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        self.params = ckptr.restore(os.path.abspath(os.path.join(path, "params")), self.params)
        return self.params

    # ------------------------------------------------------------------
    # The denoise loop
    # ------------------------------------------------------------------

    def _build_sample(self, cfg: RestoreConfig):
        """Build the pure multi-phase sampler for a static RestoreConfig."""
        schedule = self.schedule
        unet = self.unet
        aggregator = self.aggregator
        phases = build_step_phases(cfg)
        do_cfg = cfg.do_cfg
        gs = cfg.guidance_scale
        deepcache = cfg.deepcache_interval > 1
        dc_depth = cfg.deepcache_depth
        if deepcache and cfg.multistep_restore:
            raise ValueError(
                "deepcache_interval > 1 is incompatible with multistep_restore "
                "(the Heun lookahead needs a fresh preview every step)"
            )

        def double(x):
            return jnp.concatenate([x, x], axis=0) if do_cfg else x

        def unet_apply(params, latents, t, cond, lora_scale, ip_tokens, residuals=None,
                       mid_residual=None, **deepcache_kw):
            return unet.apply(
                params["unet"],
                latents,
                t,
                encoder_hidden_states=cond["prompt_embeds"],
                added_text_embeds=cond["pooled_embeds"],
                added_time_ids=cond["time_ids"],
                ip_hidden_states=ip_tokens,
                down_block_additional_residuals=residuals,
                mid_block_additional_residual=mid_residual,
                lora_scale=lora_scale,
                **deepcache_kw,
            )

        def cfg_combine(noise_pred):
            if not do_cfg:
                return noise_pred
            uncond, text = jnp.split(noise_pred, 2, axis=0)
            pred = uncond + gs * (text - uncond)
            if cfg.guidance_rescale > 0.0:
                pred = rescale_noise_cfg(pred, text, cfg.guidance_rescale)
            return pred

        def make_body(mode: str, params, cond, image_latent, ip_base, ip_lora,
                      reference_latents=None, prev_params=None):
            def body(carry, step_in):
                if deepcache:
                    latents, key, preview_factor, prev_preview, cache = carry
                else:
                    latents, key, preview_factor, prev_preview = carry
                    cache = None
                t, prev_t = step_in["t"], step_in["prev_t"]
                bsz = latents.shape[0]
                tb = jnp.full((latents.shape[0] * (2 if do_cfg else 1),), t, jnp.int32)
                latent_in = double(latents)

                def carry_out(new_latents):
                    base = (new_latents, key, preview_factor, prev_preview)
                    return base + ((cache,) if deepcache else ())

                if mode == "C":
                    if deepcache:
                        def fresh_c(lat_in):
                            out, deep = unet_apply(params, lat_in, tb, cond, 0.0, ip_base,
                                                   return_deep=True, cache_depth=dc_depth)
                            return out, deep.astype(cache["deep"].dtype)

                        def stale_c(lat_in):
                            out = unet_apply(params, lat_in, tb, cond, 0.0, ip_base,
                                             cached_deep=cache["deep"], cache_depth=dc_depth)
                            return out, cache["deep"]

                        noise_raw, deep = jax.lax.cond(step_in["refresh"] > 0, fresh_c, stale_c, latent_in)
                        cache = {**cache, "deep": deep}
                    else:
                        noise_raw = unet_apply(params, latent_in, tb, cond, 0.0, ip_base)
                    noise_pred = cfg_combine(noise_raw)
                    key, sub = jax.random.split(key)
                    latents, pred_x0 = ddpm_step(
                        schedule,
                        noise_pred,
                        jnp.full((bsz,), t, jnp.int32),
                        jnp.full((bsz,), prev_t, jnp.int32),
                        latents,
                        jax.random.normal(sub, latents.shape, jnp.float32),
                    )
                    return carry_out(latents), ()

                # A/B: controlnet active. The CFG batch layout is
                # [uncond, text]; the share_* flags compute the control branch
                # on the text half only and broadcast it (RestoreConfig note).
                share_preview = do_cfg and not cfg.preview_cfg
                share_cnet = do_cfg and not cfg.controlnet_cfg

                def compute_preview(latent_in_, tb_, latents_):
                    """(preview_latent [CFG batch], previewer noise or None)."""
                    if mode == "B":
                        p_lat = latents_ if share_preview else latent_in_
                        p_tb = tb_[:bsz] if share_preview else tb_
                        p_cond = {k: v[-bsz:] for k, v in cond.items()} if share_preview else cond
                        p_ip = ip_lora[-bsz:] if share_preview else ip_lora
                        if prev_params is not None:  # merged-LoRA weights, static skip
                            preview_noise = unet_apply(prev_params, p_lat, p_tb, p_cond, 0.0, p_ip)
                        else:
                            preview_noise = unet_apply(params, p_lat, p_tb, p_cond, cfg.lora_alpha, p_ip)
                        preview_latent = lcm_single_step(schedule, preview_noise, p_tb, p_lat)
                        if share_preview:
                            preview_latent = double(preview_latent)
                        return preview_latent, preview_noise
                    if reference_latents is not None:
                        return reference_latents, None  # caller-supplied (reference :1579-1580)
                    return image_latent, None  # LQ latent (reference :1582)

                def run_aggregator(preview_latent, tb_):
                    down_res, mid_res = aggregator.apply(
                        params["aggregator"],
                        image_latent[-bsz:] if share_cnet else image_latent,
                        tb_[:bsz] if share_cnet else tb_,
                        controlnet_cond=(preview_latent[-bsz:] if share_cnet else preview_latent).astype(latents.dtype),
                        added_text_embeds=cond["pooled_embeds"][-bsz:] if share_cnet else cond["pooled_embeds"],
                        added_time_ids=cond["time_ids"][-bsz:] if share_cnet else cond["time_ids"],
                    )
                    if share_cnet:
                        down_res = tuple(double(r) for r in down_res)
                        mid_res = double(mid_res)
                    return down_res, mid_res

                # adaptive restoration scaling (reference :1538-1540)
                ada = jnp.clip(preview_factor, 0.0, cfg.controlnet_conditioning_scale)
                cond_scale = double(ada)

                if deepcache:
                    # refresh: full previewer → aggregator → main UNet, caching
                    # the deep trunk + the shallow-skip residual slice; stale:
                    # shallow UNet over the cached trunk, previewer/aggregator
                    # skipped (their outputs are the cached values)
                    def fresh_ab(op):
                        latents_, latent_in_ = op
                        preview_latent, _ = compute_preview(latent_in_, tb, latents_)
                        down_res, mid_res = run_aggregator(preview_latent, tb)
                        res_cache = tuple(
                            r.astype(c.dtype) for r, c in zip(down_res, cache["res"])
                        )
                        down_s = tuple(r * cond_scale.astype(r.dtype) for r in down_res)
                        mid_s = mid_res * cond_scale.astype(mid_res.dtype)
                        noise_raw, deep = unet_apply(
                            params, latent_in_, tb, cond, 0.0, ip_base, down_s, mid_s,
                            return_deep=True, cache_depth=dc_depth,
                        )
                        new_cache = {
                            "deep": deep.astype(cache["deep"].dtype),
                            "res": res_cache,
                            "preview": preview_latent[-bsz:].astype(cache["preview"].dtype),
                        }
                        return noise_raw, new_cache

                    def stale_ab(op):
                        latents_, latent_in_ = op
                        res_s = tuple(r * cond_scale.astype(r.dtype) for r in cache["res"])
                        noise_raw = unet_apply(
                            params, latent_in_, tb, cond, 0.0, ip_base, res_s, None,
                            cached_deep=cache["deep"], cache_depth=dc_depth,
                        )
                        return noise_raw, cache

                    noise_raw, cache = jax.lax.cond(
                        step_in["refresh"] > 0, fresh_ab, stale_ab, (latents, latent_in)
                    )
                    noise_pred = cfg_combine(noise_raw)
                    preview_text = cache["preview"]
                else:
                    preview_latent, preview_noise = compute_preview(latent_in, tb, latents)

                    # Heun lookahead (multistep_restore, reference :1569-1577):
                    # deterministic first-order DDPM step with the previewer's
                    # text-cond noise predicts x at timesteps[i+1]; aggregator and
                    # main UNet then evaluate at (x̂_next, next_t). Skipped on the
                    # final step of the sequence (has_next mask).
                    latent_eval, tb_eval = latent_in, tb
                    if cfg.multistep_restore and mode == "B":
                        has_next = step_in["has_next"]
                        noise_preview = preview_noise[-bsz:]  # text-cond half (:1570)
                        first_prev, _ = ddpm_step(
                            schedule, noise_preview,
                            jnp.full((bsz,), t, jnp.int32),
                            jnp.full((bsz,), prev_t, jnp.int32),
                            latents, noise=None,
                        )
                        eval_lat = jnp.where(has_next > 0, first_prev.astype(latents.dtype), latents)
                        latent_eval = double(eval_lat)
                        tb_eval = jnp.where(has_next > 0, jnp.full_like(tb, step_in["next_t"]), tb)

                    down_res, mid_res = run_aggregator(preview_latent, tb_eval)
                    down_res = tuple(r * cond_scale.astype(r.dtype) for r in down_res)
                    mid_res = mid_res * cond_scale.astype(mid_res.dtype)

                    noise_pred = cfg_combine(
                        unet_apply(params, latent_eval, tb_eval, cond, 0.0, ip_base, down_res, mid_res)
                    )
                    preview_text = preview_latent[-bsz:]  # text-cond half under CFG

                key, sub = jax.random.split(key)
                new_latents, pred_x0 = ddpm_step(
                    schedule,
                    noise_pred,
                    jnp.full((bsz,), t, jnp.int32),
                    jnp.full((bsz,), prev_t, jnp.int32),
                    latents,
                    jax.random.normal(sub, latents.shape, jnp.float32),
                )

                # the reference updates the factors on every controlnet-active
                # step (mode A uses the LQ latent as "preview", :1636-1644);
                # in phase C cond_scale multiplies zero residuals so freezing
                # the factor there is behavior-identical. Under deepcache the
                # update only happens on refresh steps (stale steps carry no
                # fresh preview).
                if cfg.adastep_restore and mode in ("A", "B"):
                    # preview_factor ← ‖preview−x̂0‖² / ‖preview−prev_preview‖²  (:1636-1644)
                    d_pred = jnp.sum((preview_text.astype(jnp.float32) - pred_x0.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
                    d_prev = jnp.sum((preview_text.astype(jnp.float32) - prev_preview) ** 2, axis=(1, 2, 3))
                    new_factor = (d_pred / jnp.maximum(d_prev, 1e-12)).reshape(-1, 1, 1, 1)
                    new_prev = preview_text.astype(jnp.float32)
                    if deepcache:
                        is_refresh = step_in["refresh"] > 0
                        preview_factor = jnp.where(is_refresh, new_factor, preview_factor)
                        prev_preview = jnp.where(is_refresh, new_prev, prev_preview)
                    else:
                        preview_factor, prev_preview = new_factor, new_prev

                # only real previews enter the row (the reference appends only
                # on previewing steps, :1564-1567; under deepcache stale steps
                # emit the cached preview)
                preview_out = preview_text if (cfg.save_preview_row and mode == "B") else ()
                return carry_out(new_latents), preview_out

            return body

        def sample(params, latents, cond, image_latent, ip_base, ip_lora, key,
                   reference_latents=None, prev_unet=None):
            bsz = latents.shape[0]
            preview_factor = jnp.ones((bsz, 1, 1, 1), jnp.float32)
            prev_preview = jnp.zeros(latents.shape, jnp.float32)
            carry = (latents, key, preview_factor, prev_preview)
            if deepcache:
                # zero-initialized caches; build_step_phases guarantees the
                # first step of every phase is a refresh, so zeros never feed
                # a UNet
                bsz2 = bsz * (2 if do_cfg else 1)
                h, w = latents.shape[1], latents.shape[2]
                ucfg = unet.config
                res_shapes = [(bsz2, h, w, ucfg.block_out_channels[0])]
                for lvl in range(dc_depth):
                    c = ucfg.block_out_channels[lvl]
                    lh, lw = h >> lvl, w >> lvl
                    res_shapes += [(bsz2, lh, lw, c)] * ucfg.layers_per_block
                    if lvl < dc_depth - 1:
                        res_shapes.append((bsz2, lh >> 1, lw >> 1, c))
                cache = {
                    "deep": jnp.zeros(
                        (bsz2, h >> (dc_depth - 1), w >> (dc_depth - 1),
                         ucfg.block_out_channels[dc_depth]),
                        latents.dtype,
                    ),
                    "res": tuple(jnp.zeros(s, latents.dtype) for s in res_shapes),
                    "preview": jnp.zeros(latents.shape, latents.dtype),
                }
                carry = carry + (cache,)
            previews = []
            prev_params = None
            if prev_unet is not None:
                # freeze_previewer's flat merged kernels ({module/path: W'}),
                # woven over the base tree (shared leaves stay by reference)
                def weave(node, path):
                    if not isinstance(node, dict):
                        return node
                    key = "/".join(path)
                    if "base" in node and key in prev_unet:
                        return {**node, "base": {**node["base"], "kernel": prev_unet[key]}}
                    return {k: weave(v, path + (k,)) for k, v in node.items()}

                prev_params = {
                    **params,
                    "unet": {**params["unet"], "params": weave(params["unet"]["params"], ())},
                }
            elif cfg.fuse_previewer_lora and cfg.lora_alpha and any(p["mode"] == "B" for p in phases):
                from instantir_tpu.models.layers import merge_lora_tree

                prev_params = {
                    **params,
                    "unet": {
                        **params["unet"],
                        "params": merge_lora_tree(
                            params["unet"]["params"], cfg.lora_alpha, unet.config.lora_alpha
                        ),
                    },
                }
            for phase in phases:
                body = make_body(phase["mode"], params, cond, image_latent, ip_base, ip_lora,
                                 reference_latents, prev_params=prev_params)
                steps = {
                    "t": jnp.asarray(phase["t"], jnp.int32),
                    "prev_t": jnp.asarray(phase["prev_t"], jnp.int32),
                }
                if cfg.multistep_restore and phase["mode"] == "B":
                    steps["next_t"] = jnp.asarray(phase["next_t"], jnp.int32)
                    steps["has_next"] = jnp.asarray(phase["has_next"], jnp.float32)
                if deepcache:
                    steps["refresh"] = jnp.asarray(phase["refresh"], jnp.float32)
                carry, phase_previews = jax.lax.scan(body, carry, steps)
                if cfg.save_preview_row and phase["mode"] == "B":
                    previews.append(phase_previews)
            latents = carry[0]
            preview_row = jnp.concatenate(previews, axis=0) if previews else None
            return latents, preview_row

        return sample

    def _make_sample_fn(self, cfg: RestoreConfig):
        return jax.jit(self._build_sample(cfg))

    def sample_fn(self, cfg: RestoreConfig):
        if cfg not in self._sample_fn_cache:
            self._sample_fn_cache[cfg] = self._make_sample_fn(cfg)
        return self._sample_fn_cache[cfg]

    def _fused_restore_fn(self, cfg: RestoreConfig):
        """One XLA program for the whole restore (``cfg.fused``): stage math
        identical to the staged path below, including the RNG split order, so
        staged and fused agree latent-for-latent (tested). ``None`` optional
        args trace as empty pytrees — jit retraces per presence pattern."""
        cache = getattr(self, "_restore_fn_cache", None)
        if cache is None:
            cache = self._restore_fn_cache = {}
        if cfg in cache:
            return cache[cfg]

        sample = self._build_sample(cfg)
        tiling = (cfg.vae_tile_latent, cfg.vae_tile_overlap) if cfg.vae_tiling else None
        decode = self._build_decode(jnp.bfloat16 if cfg.decode_dtype == "bfloat16" else None, tiling, cfg.vae_slicing)
        vae, dino, resampler = self.vae, self.image_encoder, self.resampler
        schedule = self.schedule
        if cfg.timesteps is not None:
            timesteps = np.asarray(cfg.timesteps, np.int64)
        else:
            timesteps = ddpm_inference_timesteps(
                cfg.num_inference_steps, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset
            )
        t_first = int(timesteps[0])

        def fused(params, lq_images, prompt_embeds, pooled_embeds, neg_pe, neg_pooled,
                  uncond_tokens, key, reference_latents, prev_unet):
            b, h, w, _ = lq_images.shape
            key, k_vae, k_init = jax.random.split(key, 3)

            def _enc(img, k):
                if tiling is not None:
                    return tiled_encode(
                        vae, params["vae"], img, rng=k, sample=True,
                        tile_sample=tiling[0] * vae_scale_factor(vae.config), overlap=tiling[1],
                    )
                return vae.apply(params["vae"], img, rng=k, sample=True, method=vae.encode)

            imgs32 = lq_images.astype(jnp.float32)
            if cfg.vae_slicing and b > 1:
                # per-sample serialized encode (mirrors encode_vae_image's
                # slicing path) — batch-independent activation peak
                enc_keys = jax.random.split(k_vae, b)
                raw_latent = jax.lax.map(lambda ik: _enc(ik[0][None], ik[1])[0], (imgs32, enc_keys))
            else:
                raw_latent = _enc(imgs32, k_vae)
            image_latent = scale_latents(vae.config, raw_latent).astype(prompt_embeds.dtype)

            pixels = preprocess_dinov2((lq_images + 1.0) / 2.0, size=dino.config.image_size)
            dino_cond = dino.apply(params["image_encoder"], pixels)
            if cfg.do_cfg:
                dino_uncond = jnp.broadcast_to(uncond_tokens, dino_cond.shape)
                dino_tokens = jnp.concatenate([dino_uncond, dino_cond], axis=0)
            else:
                dino_tokens = dino_cond
            ip_base = resampler.apply(params["resampler"], dino_tokens, lora_scale=0.0)
            ip_lora = resampler.apply(params["resampler"], dino_tokens, lora_scale=float(cfg.lora_alpha))

            if cfg.do_cfg:
                npe = jnp.zeros_like(prompt_embeds) if neg_pe is None else neg_pe
                npl = jnp.zeros_like(pooled_embeds) if neg_pooled is None else neg_pooled
                prompt_embeds = jnp.concatenate([npe, prompt_embeds], axis=0)
                pooled_embeds = jnp.concatenate([npl, pooled_embeds], axis=0)
            time_ids = jnp.tile(
                jnp.asarray([[h, w, 0, 0, h, w]], prompt_embeds.dtype), (prompt_embeds.shape[0], 1)
            )
            cond = {"prompt_embeds": prompt_embeds, "pooled_embeds": pooled_embeds, "time_ids": time_ids}

            t0 = jnp.full((b,), t_first, jnp.int32)
            latents = add_noise(
                schedule, image_latent, jax.random.normal(k_init, image_latent.shape, jnp.float32), t0
            )

            cond_image_latent = jnp.concatenate([image_latent] * 2, axis=0) if cfg.do_cfg else image_latent
            ref = reference_latents
            if ref is not None and cfg.do_cfg:
                ref = jnp.concatenate([ref] * 2, axis=0)
            latents, preview_row = sample(
                params, latents, cond, cond_image_latent, ip_base, ip_lora, key,
                reference_latents=ref, prev_unet=prev_unet,
            )
            image = decode(params, latents)
            return image, preview_row

        cache[cfg] = jax.jit(fused)
        return cache[cfg]

    def restore(
        self,
        lq_images: jnp.ndarray,  # [B, H, W, 3] in [-1, 1]
        prompt_embeds: jnp.ndarray,  # [B, 77, 2048] text-cond
        pooled_embeds: jnp.ndarray,  # [B, 1280]
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_pooled_embeds: Optional[jnp.ndarray] = None,
        cfg: RestoreConfig = RestoreConfig(),
        key: Optional[jax.Array] = None,
        reference_latents: Optional[jnp.ndarray] = None,
        output_type: str = "np",
    ):
        """End-to-end restoration. Mirrors ``InstantIRPipeline.__call__``
        (reference ``:1067-1739``) minus host-side image IO."""
        params = self.params
        if key is None:
            key = jax.random.PRNGKey(0)
        b, h, w, _ = lq_images.shape
        tiling = (cfg.vae_tile_latent, cfg.vae_tile_overlap) if cfg.vae_tiling else None
        seq_par = cfg.sequence_parallel and self.mesh is not None
        if self.mesh is not None and not seq_par and b % self.mesh.shape["data"]:
            raise ValueError(f"batch {b} not divisible by mesh data axis {self.mesh.shape['data']}")
        if cfg.sequence_parallel and self.mesh is None:
            raise ValueError("sequence_parallel=True requires an attached mesh (pipe.shard(mesh))")
        if seq_par and cfg.fused:
            raise ValueError("sequence_parallel does not compose with cfg.fused")
        if cfg.fuse_previewer_lora and "quant" in self.params["unet"]:
            raise ValueError("fuse_previewer_lora can't merge into int8 base kernels — "
                             "quantized pipelines use the dynamic LoRA branch (the default)")
        lq_images, prompt_embeds, pooled_embeds, negative_prompt_embeds, negative_pooled_embeds, reference_latents = (
            self._shard_inputs(
                lq_images, prompt_embeds, pooled_embeds, negative_prompt_embeds, negative_pooled_embeds,
                reference_latents,
                replicate=seq_par,  # one image's attention spans the mesh, not the batch
            )
        )
        prev_unet = None
        if self._prev_unet is not None and cfg.lora_alpha:
            if cfg.lora_alpha != self._frozen_alpha:
                raise ValueError(
                    f"previewer frozen at lora_alpha={self._frozen_alpha} (the LoRA pairs were "
                    f"freed); restore with lora_alpha={cfg.lora_alpha} is impossible — rebuild "
                    f"the pipeline or freeze at the desired strength"
                )
            prev_unet = self._prev_unet

        if cfg.fused and output_type != "latent":
            # whole-call single program; the staged stages below stay the
            # reference implementation (and serve output_type="latent")
            enc_size = self.image_encoder.config.image_size
            uncond_tokens = self._ensure_uncond_tokens(params, (enc_size, enc_size, 3), lq_images.dtype)
            with self._trace_scopes(cfg):
                image, preview_row = self._fused_restore_fn(cfg)(
                    params, lq_images, prompt_embeds, pooled_embeds,
                    negative_prompt_embeds, negative_pooled_embeds,
                    uncond_tokens, key, reference_latents, prev_unet,
                )
            decode_dtype = jnp.bfloat16 if cfg.decode_dtype == "bfloat16" else None
            previews = None
            if cfg.save_preview_row and preview_row is not None:
                previews = [self.decode_latents(params, p, dtype=decode_dtype, tiling=tiling, slicing=cfg.vae_slicing) for p in preview_row]
            if output_type == "np":
                image = np.asarray(image.astype(jnp.float32))
                if previews is not None:
                    previews = [np.asarray(p.astype(jnp.float32)) for p in previews]
            return image, previews

        key, k_vae, k_init = jax.random.split(key, 3)

        # 1. LQ → latent (fp32 VAE encode), used as both init and condition
        image_latent = self.encode_vae_image(params, lq_images.astype(jnp.float32), k_vae, tiling=tiling, slicing=cfg.vae_slicing)
        image_latent = image_latent.astype(prompt_embeds.dtype)

        # 2. image-prompt tokens (cond + uncond), both LoRA modes
        dino_cond, dino_uncond = self.encode_image_embeds(params, (lq_images + 1.0) / 2.0)
        if cfg.do_cfg:
            dino_tokens = jnp.concatenate([dino_uncond, dino_cond], axis=0)
        else:
            dino_tokens = dino_cond
        ip_base = self.project_ip_tokens(params, dino_tokens, lora_scale=0.0)
        ip_lora = self.project_ip_tokens(params, dino_tokens, lora_scale=cfg.lora_alpha)

        # 3. prompt conditioning (+ CFG doubling; negative defaults to zeros
        #    per SDXL's force_zeros_for_empty_prompt)
        if cfg.do_cfg:
            # zero negatives per SDXL's force_zeros_for_empty_prompt; guard
            # each independently (a caller may pass only one of them)
            if negative_prompt_embeds is None:
                negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
            if negative_pooled_embeds is None:
                negative_pooled_embeds = jnp.zeros_like(pooled_embeds)
            prompt_embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            pooled_embeds = jnp.concatenate([negative_pooled_embeds, pooled_embeds], axis=0)
        time_ids = jnp.tile(jnp.asarray([[h, w, 0, 0, h, w]], prompt_embeds.dtype), (prompt_embeds.shape[0], 1))
        cond = {"prompt_embeds": prompt_embeds, "pooled_embeds": pooled_embeds, "time_ids": time_ids}

        # 4. init latents from the noised LQ latent (reference init_latents :932-939)
        if cfg.timesteps is not None:
            timesteps = np.asarray(cfg.timesteps, np.int64)
        else:
            timesteps = ddpm_inference_timesteps(
                cfg.num_inference_steps, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset
            )
        t0 = jnp.full((b,), int(timesteps[0]), jnp.int32)
        if not hasattr(self, "_jit_init_latents"):
            self._jit_init_latents = jax.jit(
                lambda lat, key, t: add_noise(
                    self.schedule, lat, jax.random.normal(key, lat.shape, jnp.float32), t
                )
            )
        latents = self._jit_init_latents(image_latent, k_init, t0)

        # 5. the loop
        cond_image_latent = jnp.concatenate([image_latent] * 2, axis=0) if cfg.do_cfg else image_latent
        if reference_latents is not None and cfg.do_cfg:
            reference_latents = jnp.concatenate([reference_latents] * 2, axis=0)
        # parallelism scopes matter at TRACE time: the ring / shard_map
        # collectives bake into this cfg's cached jit (sample_fn caches
        # per-RestoreConfig, and sequence_parallel is part of the config;
        # the TP scope is tied to the attached mesh, fixed per pipeline)
        with self._trace_scopes(cfg):
            latents, preview_row = self.sample_fn(cfg)(
                params, latents, cond, cond_image_latent, ip_base, ip_lora, key,
                reference_latents=reference_latents, prev_unet=prev_unet,
            )

        if output_type == "latent":
            return latents, preview_row

        decode_dtype = jnp.bfloat16 if cfg.decode_dtype == "bfloat16" else None
        image = self.decode_latents(params, latents, dtype=decode_dtype, tiling=tiling, slicing=cfg.vae_slicing)
        previews = None
        if cfg.save_preview_row and preview_row is not None:
            previews = [self.decode_latents(params, p, dtype=decode_dtype, tiling=tiling, slicing=cfg.vae_slicing) for p in preview_row]
        if output_type == "np":
            image = np.asarray(image.astype(jnp.float32))
            if previews is not None:
                previews = [np.asarray(p.astype(jnp.float32)) for p in previews]
        return image, previews
