"""Benchmark: full InstantIR restoration throughput on one TPU chip.

Config #4 of BASELINE.md: 1024², 30-step, CFG 7.0, preview_start 0.1,
control_guidance_end (creative_start) 0.7 — the reference's canonical
operating point (``infer.py:286-332``). Models are SDXL-sized (UNet 2.57B +
previewer LoRA r=64, Aggregator down+mid trunk, SDXL VAE, DINOv2-large,
Resampler) with synthetic weights — throughput on TPU is weight-independent.

Prints ONE json line:
  {"metric": ..., "value": imgs/sec/chip, "unit": "images/sec", "vs_baseline": ...}

``vs_baseline`` is measured against an A100 reference BAND (round 5 — the
earlier single-point 0.04 img/s estimate now carries its real uncertainty;
derivation in BASELINE.md "A100 baseline band"): published diffusers SDXL
A100 fp16 rates put one CFG UNet step at ~0.13-0.20 s; the torch InstantIR
step is ≈2.8 UNet-equivalents (previewer + ~0.8× aggregator + main UNet,
``pipelines/sdxl_instantir.py:1545-1616``) plus fp32 VAE and per-step host
syncs → ≈15-30 s/image → **0.03-0.06 img/s**. ``vs_baseline`` divides by
the geometric midpoint 0.042; ``vs_baseline_band`` reports both ends. The
north-star target (≥2× A100) is vs_baseline ≥ 2.0 against the midpoint.
The detail line also reports analytic matmul/conv TFLOP per image (jaxpr
walk, ``utils/flops.py``) and the implied MFU vs v5e's 197 TF/s bf16 peak
and vs the 171 TF/s measured roofline (docs/perf.md).

Timing notes (see .claude/skills/verify/SKILL.md): this environment's TPU is
reached through a relay where ``block_until_ready`` does not synchronize —
all timings force a device→host fetch; per-dispatch overhead is ~25-90 ms so
the whole 30-step loop runs as 3 scan dispatches. A persistent compilation
cache (.jax_cache) makes repeat runs skip the slow remote compile.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# A100 torch/diffusers InstantIR estimate band (img/s) — see module docstring
# and BASELINE.md "A100 baseline band" for the derivation
A100_BAND = (0.03, 0.06)
A100_REF_IMG_PER_SEC = 0.042  # geometric midpoint of the band
V5E_PEAK_TFLOPS = 197.0       # bf16 MXU peak, one v5e chip
MEASURED_ROOFLINE_TFLOPS = 171.0  # fused-matmul probe (docs/perf.md round 2)


def build_models(dtype=jnp.bfloat16, lite: bool = False):
    from instantir_tpu.models.aggregator import Aggregator
    from instantir_tpu.models.dinov2 import DINOv2Model, dinov2_large_config
    from instantir_tpu.models.resampler import Resampler, instantir_resampler_config
    from instantir_tpu.models.unet import UNet2DConditionModel, sdxl_base_config, tiny_unet_config
    from instantir_tpu.models.vae import AutoencoderKL, sdxl_vae_config
    from instantir_tpu.pipeline.instantir import InstantIRPipeline
    from instantir_tpu.schedulers.diffusion import sdxl_schedule

    ucfg = sdxl_base_config(with_ip=True, lora_rank=64)
    vcfg = sdxl_vae_config()
    rcfg = instantir_resampler_config(lora_rank=64)
    dcfg = dinov2_large_config()

    unet = UNet2DConditionModel(ucfg, use_flash=True, dtype=dtype, param_dtype=dtype)
    aggregator = Aggregator(ucfg, use_flash=True, dtype=dtype, param_dtype=dtype)
    # fp32 compute (force_upcast semantics), bf16 parameter storage: weight
    # quantization is below 8-bit output rounding (>40 dB, tested) and frees
    # 160 MB of HBM headroom
    vae = AutoencoderKL(vcfg, dtype=jnp.float32, param_dtype=dtype)
    resampler = Resampler(rcfg, dtype=dtype, param_dtype=dtype)
    dino = DINOv2Model(dcfg, dtype=dtype, param_dtype=dtype)
    return unet, aggregator, vae, resampler, dino, sdxl_schedule()


def synth_params(module, init_fn):
    """Build a parameter tree of the right shapes directly on device in ONE
    dispatch (host init + transfer of 7 GB through the relay costs minutes).

    Weights must be *varied*, not constant: all-equal kernels make layer
    outputs channel-constant, GroupNorm then amplifies bf16 rounding noise by
    1/√eps (≈316×) per layer and the loop blows up to NaN. A cheap
    deterministic sin-of-iota pattern (zero mean, lecun-scaled variance) is
    generated per leaf on device — no per-leaf RNG program (which is huge to
    compile) and no host transfer."""
    shapes = jax.eval_shape(init_fn)
    phase_counter = [0]

    def leaf_value(path, s):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if not jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, s.dtype)
        if name == "scale":
            return jnp.ones(s.shape, s.dtype)
        if name == "bias":
            return jnp.zeros(s.shape, s.dtype)
        phase_counter[0] += 1
        phase = float(phase_counter[0])
        size = int(np.prod(s.shape))
        if len(s.shape) >= 2:
            scale = 1.0 / np.sqrt(np.prod(s.shape[:-1]))
        else:
            scale = 0.01
        flat = jnp.sin(
            jax.lax.broadcasted_iota(jnp.float32, (size, 1), 0).squeeze(-1) * 0.7001 + phase
        )
        return (scale * flat).reshape(s.shape).astype(s.dtype)

    @jax.jit
    def build():
        return jax.tree_util.tree_map_with_path(leaf_value, shapes)

    return build()


def bench_degradation_vae(res=512):
    """BASELINE config #1: degradation + VAE encode/decode roundtrip.

    The whole chain is jitted as ONE program: the degradation's host-RNG
    decisions (resize mode/scale, noise family, JPEG-vs-sinc order) are drawn
    once at trace time from a fixed host seed — exactly how the trainers run
    it (one compiled recipe instance per shape, device noise varying by key).
    Eagerly, the chain is ~10² separate ops whose shapes change with every
    host draw, i.e. hundreds of fresh remote-tunnel compiles per call — the
    round-2 timeout mode the driver gate must never hit again."""
    from instantir_tpu.data.degradation import RealESRGANDegradation
    from instantir_tpu.models.vae import AutoencoderKL, sdxl_vae_config, scale_latents, unscale_latents

    vcfg = sdxl_vae_config()
    vae = AutoencoderKL(vcfg, dtype=jnp.float32)
    vparams = synth_params(vae, lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)))
    deg = RealESRGANDegradation(resolution=res)
    rng = np.random.default_rng(0)
    # GT enters at the training resolution (reference feeds gt_size images)
    gt = jnp.asarray(rng.uniform(size=(1, res, res, 3)), jnp.float32)
    kernels = deg.sample_kernels(rng, 1)

    @jax.jit
    def roundtrip(params, gt, key):
        k_deg, k_vae = jax.random.split(key)
        lq, _ = deg(k_deg, gt, kernels=kernels, host_rng=np.random.default_rng(0))
        z = scale_latents(vcfg, vae.apply(params, lq, rng=k_vae, sample=True, method=vae.encode))
        img = vae.apply(params, unscale_latents(vcfg, z), method=vae.decode)
        return img

    def run(seed):
        return float(np.asarray(roundtrip(vparams, gt, jax.random.PRNGKey(seed))[0, 0, 0, 0]))

    run(0)
    times = []
    for i in range(3):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    dt = min(times)
    return {"metric": f"degradation+VAE roundtrip {res}²", "value": round(1 / dt, 3), "unit": "iters/sec",
            "vs_baseline": 0.0}


def bench_encoder(res=512):
    """BASELINE config #2: DINOv2-large + Resampler projection, batch 1."""
    from instantir_tpu.models.dinov2 import DINOv2Model, dinov2_large_config, preprocess_dinov2
    from instantir_tpu.models.resampler import Resampler, instantir_resampler_config

    dino = DINOv2Model(dinov2_large_config(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    res_m = Resampler(instantir_resampler_config(lora_rank=64), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    dparams = synth_params(dino, lambda: dino.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16)))
    rparams = synth_params(res_m, lambda: res_m.init(jax.random.PRNGKey(0), jnp.zeros((1, 257, 1024), jnp.bfloat16)))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, res, res, 3)), jnp.float32)

    @jax.jit
    def encode(dp, rp, img):
        tokens = dino.apply(dp, preprocess_dinov2(img).astype(jnp.bfloat16))
        return res_m.apply(rp, tokens)

    def run():
        return float(np.asarray(encode(dparams, rparams, img)[0, 0, 0], np.float32))

    run()
    t0 = time.time()
    run()
    dt = time.time() - t0
    return {"metric": f"DINOv2+Resampler batch-1 {res}²", "value": round(1 / dt, 2), "unit": "iters/sec",
            "vs_baseline": 0.0}


def bench_previewer(res=512):
    """BASELINE config #3: stage-1 previewer LCM one-step preview at 512² —
    LQ image → VAE encode → noise @ t=999 → UNet(+LoRA) + LCM step → decode
    (the previewer-validation path, ``train_previewer_lora.py:98-191``)."""
    from instantir_tpu.models.vae import scale_latents, unscale_latents
    from instantir_tpu.pipeline.stage1_sdxl import Stage1SDXLPipeline
    from instantir_tpu.schedulers.diffusion import add_noise

    unet, _, vae, resampler, dino, schedule = build_models()
    key = jax.random.PRNGKey(0)
    lat = res // 8
    params = {
        "unet": synth_params(unet, lambda: unet.init(
            key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 1280), jnp.bfloat16),
            jnp.zeros((1, 6), jnp.bfloat16), ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16))),
        "vae": synth_params(vae, lambda: vae.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))),
        "resampler": synth_params(resampler, lambda: resampler.init(key, jnp.zeros((1, 257, 1024), jnp.bfloat16))),
        "image_encoder": synth_params(dino, lambda: dino.init(key, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))),
    }
    jax.block_until_ready(params)
    pipe = Stage1SDXLPipeline(unet, vae, resampler, dino, schedule, params)
    # previewer LoRA folded into the base kernels (no second UNet pass here,
    # so the merge is free in HBM); apply then statically skips the adapter
    pipe.merge_previewer_lora_inplace(1.0)

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, res, res, 3)), jnp.float32)
    cond = {
        "prompt_embeds": jnp.asarray(rng.normal(size=(1, 77, 2048)) * 0.1, jnp.bfloat16),
        "pooled_embeds": jnp.asarray(rng.normal(size=(1, 1280)) * 0.1, jnp.bfloat16),
        "time_ids": jnp.asarray([[res, res, 0, 0, res, res]], jnp.bfloat16),
    }

    from instantir_tpu.models.dinov2 import preprocess_dinov2

    @jax.jit
    def encode(params, lq, key):
        tokens = dino.apply(params["image_encoder"], preprocess_dinov2((lq + 1) / 2).astype(jnp.bfloat16))
        ip = resampler.apply(params["resampler"], tokens, lora_scale=1.0)
        z = scale_latents(vae.config, vae.apply(params["vae"], lq, rng=key, sample=True, method=vae.encode))
        noisy = add_noise(schedule, z.astype(jnp.bfloat16), jax.random.normal(key, z.shape, jnp.float32), jnp.full((1,), 999, jnp.int32))
        return ip, noisy

    @jax.jit
    def decode(params, z):
        return vae.apply(params["vae"], unscale_latents(vae.config, z.astype(jnp.float32)), method=vae.decode)

    def run(seed):
        ip, noisy = encode(params, lq, jax.random.PRNGKey(seed))
        preview = pipe.one_step_preview(noisy, 999, cond, ip, lora_scale=0.0)
        img = decode(params, preview)
        return float(np.asarray(img[0, 0, 0, 0], dtype=np.float32))

    run(0)
    times = []
    for i in range(3):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    dt = min(times)
    return {"metric": f"previewer LCM one-step preview {res}² (encode+UNet+LCM+decode)",
            "value": round(1 / dt, 2), "unit": "images/sec", "vs_baseline": 0.0}


def bench_sharded(res=1024, steps=30):
    """BASELINE config #5: batch-N creative restoration sharded over all
    available devices (params replicated, batch on the ``data`` mesh axis).
    On this environment's single-chip TPU it degenerates to a 1-device mesh
    with batch 1; multi-device execution is validated on the virtual CPU mesh
    (tests/test_sharded_inference.py) and via dryrun_multichip."""
    from instantir_tpu.parallel.mesh import make_mesh
    from instantir_tpu.pipeline.instantir import InstantIRPipeline, RestoreConfig

    n = len(jax.devices())
    batch = n
    unet, aggregator, vae, resampler, dino, schedule = build_models()
    key = jax.random.PRNGKey(0)
    lat = res // 8
    params = {
        "unet": synth_params(unet, lambda: unet.init(
            key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 1280), jnp.bfloat16),
            jnp.zeros((1, 6), jnp.bfloat16), ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16))),
        "aggregator": synth_params(aggregator, lambda: aggregator.init(
            key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
            added_text_embeds=jnp.zeros((1, 1280), jnp.bfloat16),
            added_time_ids=jnp.zeros((1, 6), jnp.bfloat16))),
        "vae": synth_params(vae, lambda: vae.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))),
        "resampler": synth_params(resampler, lambda: resampler.init(key, jnp.zeros((1, 257, 1024), jnp.bfloat16))),
        "image_encoder": synth_params(dino, lambda: dino.init(key, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))),
    }
    jax.block_until_ready(params)
    pipe = InstantIRPipeline(unet, aggregator, vae, resampler, dino, schedule, params)
    pipe.shard(make_mesh())
    cfg = RestoreConfig(num_inference_steps=steps, guidance_scale=7.0, preview_start=0.1, control_guidance_end=0.7)

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(batch, res, res, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(batch, 77, 2048)) * 0.1, jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(batch, 1280)) * 0.1, jnp.bfloat16)

    def run(seed):
        image, _ = pipe.restore(lq, pe, pooled, cfg=cfg, key=jax.random.PRNGKey(seed))
        return float(np.asarray(image[0, 0, 0, 0], dtype=np.float32))

    run(0)
    times = []
    for i in range(2):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    ips = batch / min(times)
    return {"metric": f"sharded restore, batch {batch} over {n} device(s), {res}² {steps}-step",
            "value": round(ips, 4), "unit": "images/sec",
            "vs_baseline": round(ips / n / A100_REF_IMG_PER_SEC, 2),
            "vs_baseline_band": [round(ips / n / A100_BAND[1], 2), round(ips / n / A100_BAND[0], 2)]}


def main():
    config = os.environ.get("BENCH_CONFIG", "full")
    if config == "degradation_vae":
        print(json.dumps(bench_degradation_vae()))
        return
    if config == "encoder":
        print(json.dumps(bench_encoder()))
        return
    if config == "previewer":
        print(json.dumps(bench_previewer()))
        return
    if config == "sharded":
        print(json.dumps(bench_sharded()))
        return
    if config == "serve":
        # end-to-end serving: microbatched RestoreServer over resolution
        # buckets, p50/p95 from the server's own /metrics quantile window
        # (tools/bench_serve.py; serve table in docs/perf.md round 4)
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import bench_serve

        bench_serve.main()
        return

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    res = int(os.environ.get("BENCH_RES", "1024"))
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))

    from instantir_tpu.pipeline.instantir import InstantIRPipeline, RestoreConfig

    unet, aggregator, vae, resampler, dino, schedule = build_models()
    key = jax.random.PRNGKey(0)
    lat = res // 8

    params = {
        "unet": synth_params(unet, lambda: unet.init(
            key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 1280), jnp.bfloat16),
            jnp.zeros((1, 6), jnp.bfloat16), ip_hidden_states=jnp.zeros((1, 64, 2048), jnp.bfloat16))),
        "aggregator": synth_params(aggregator, lambda: aggregator.init(
            key, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
            added_text_embeds=jnp.zeros((1, 1280), jnp.bfloat16),
            added_time_ids=jnp.zeros((1, 6), jnp.bfloat16))),
        "vae": synth_params(vae, lambda: vae.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))),
        "resampler": synth_params(resampler, lambda: resampler.init(key, jnp.zeros((1, 257, 1024), jnp.bfloat16))),
        "image_encoder": synth_params(dino, lambda: dino.init(key, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))),
    }
    jax.block_until_ready(params)

    pipe = InstantIRPipeline(unet, aggregator, vae, resampler, dino, schedule, params)
    # Drop this frame's tree reference: pipe owns it, and quantize() below
    # REPLACES pipe.params — a caller-held binding keeps the full fp tree
    # alive next to the quantized copy for the whole run (the
    # caller-held-duplicate OOM, docs/perf.md round 4; batch-2 W8 hit it).
    del params
    # NOTE: freeze_previewer (merged-LoRA preview, ~20 ms/step) does NOT fit
    # at 1024² on one 16 GB v5e: base+merged arguments are 13.7 GB and the
    # sampler needs ~2.3 GB of temps (incl. ~0.65 GB XLA fragmentation).
    # It fits at <=768²; the 1024² headline runs the dynamic LoRA branch.
    # BENCH_SHARED_CFG=1 → CFG single-pass control branch (preview/aggregator
    # on the text half only; opt-in approximation, docs/perf.md). The default
    # headline stays parity-exact with the reference.
    # Opt-in EXTRA measurements (each a fresh 10-20 min remote compile on a
    # cold cache — keep them off in driver runs): BENCH_SHARED_DETAIL=1 also
    # times the shared-CFG branch; BENCH_DEEPCACHE=N>1 also times DeepCache.
    # BENCH_FUSED=1 → whole-restore single program (cfg.fused). Measured
    # NEUTRAL-to-slightly-slower here (9.18-9.24 vs 9.0 s staged): JAX's
    # async dispatch already overlaps the staged stages' relay latency, and
    # the mega-program schedules slightly worse (docs/perf.md). Default off.
    # BENCH_QUANTIZED=1 → W8A8 int8 UNet+Aggregator (opt-in approximation,
    # ~2× MXU rate on v5e + half the weight HBM; quality table in
    # docs/perf.md). The default headline stays parity-exact.
    # BENCH_QUANTIZED=1|w8a8 → W8A8 (measured SLOWER end-to-end at 1024²:
    # 16.0 vs 9.2 s/img — the negative result, docs/perf.md round 4);
    # BENCH_QUANTIZED=w8 → weight-only int8 (kernels dequantized at use):
    # exact-quality-class, half the weight HBM — the batch-2 enabler.
    qmode = os.environ.get("BENCH_QUANTIZED", "")
    quantized = qmode in ("1", "w8a8", "w8")
    if quantized:
        pipe.quantize(weight_only=qmode == "w8")
    shared = os.environ.get("BENCH_SHARED_CFG") == "1"
    fused = os.environ.get("BENCH_FUSED", "0") == "1"
    cfg = RestoreConfig(
        num_inference_steps=steps,
        guidance_scale=7.0,
        preview_start=0.1,
        control_guidance_end=0.7,
        decode_dtype=os.environ.get("BENCH_DECODE", "float32"),
        preview_cfg=not shared,
        controlnet_cfg=not shared,
        fused=fused,
        # BENCH_VAE_TILING=1 → constant-memory tiled VAE (the ≥2K² mode;
        # required for the single-chip 2048² probe, docs/perf.md)
        vae_tiling=os.environ.get("BENCH_VAE_TILING") == "1",
    )

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(batch, res, res, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(batch, 77, 2048)) * 0.1, jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(batch, 1280)) * 0.1, jnp.bfloat16)

    def run(seed):
        image, _ = pipe.restore(lq, pe, pooled, cfg=cfg, key=jax.random.PRNGKey(seed))
        return float(np.asarray(image[0, 0, 0, 0], dtype=np.float32))  # forced fetch

    t0 = time.time()
    run(0)
    compile_s = time.time() - t0

    times = []
    for i in range(repeats):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    dt = min(times)
    ips = batch / dt

    # Print the headline IMMEDIATELY — round 2 lost its official number
    # (BENCH_r02.json rc=124) because opt-in variants compiled for 10-20 min
    # each AFTER the headline was measured but BEFORE anything was printed.
    # Everything below this line is optional detail on stderr.
    variant = ""
    if quantized:
        variant = ", int8-W8 weight-only (opt-in)" if qmode == "w8" else ", int8-W8A8 (opt-in)"
    result = {
        "metric": f"images/sec/chip ({res}², {steps}-step InstantIR, CFG 7, preview 0.1, creative 0.7, batch {batch}{variant})",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / A100_REF_IMG_PER_SEC, 2),
        # honest uncertainty on the A100 estimate (BASELINE.md): the band's
        # fast end (0.06 img/s) gives the conservative multiple
        "vs_baseline_band": [round(ips / A100_BAND[1], 2), round(ips / A100_BAND[0], 2)],
    }
    print(json.dumps(result), flush=True)

    detail = {
        "sec_per_image": round(dt / batch, 2),
        "first_call_s": round(compile_s, 1),
        "times": [round(t, 2) for t in times],
        "fused": fused,
    }
    # analytic matmul/conv FLOPs of the whole restore (jaxpr walk — exact for
    # the MXU terms, trace-only) → MFU. Never allowed to sink the headline.
    if os.environ.get("BENCH_MFU", "1") == "1":
        try:
            from instantir_tpu.utils.flops import jaxpr_flops

            uncond = pipe._ensure_uncond_tokens(pipe.params, (224, 224, 3), lq.dtype)
            fused_fn = pipe._fused_restore_fn(cfg)
            flops = jaxpr_flops(
                fused_fn, pipe.params, lq, pe, pooled, None, None,
                uncond, jax.random.PRNGKey(0), None, None,
            )
            tflop_per_img = flops / batch / 1e12
            detail["analytic_tflop_per_img"] = round(tflop_per_img, 1)
            detail["mfu"] = round(tflop_per_img / (dt / batch) / V5E_PEAK_TFLOPS, 3)
            detail["mfu_vs_measured_roofline"] = round(
                tflop_per_img / (dt / batch) / MEASURED_ROOFLINE_TFLOPS, 3)
        except Exception as e:
            detail["mfu_error"] = str(e)[:200]
    print(json.dumps({"detail": detail}), file=sys.stderr, flush=True)

    if not shared and os.environ.get("BENCH_SHARED_DETAIL") == "1":
        # also measure the opt-in CFG single-pass control branch
        # (docs/perf.md) — reported in the detail line; the headline metric
        # stays the parity-exact configuration
        import dataclasses as _dc

        fast_cfg = _dc.replace(cfg, preview_cfg=False, controlnet_cfg=False)

        def run_fast(seed):
            image, _ = pipe.restore(lq, pe, pooled, cfg=fast_cfg, key=jax.random.PRNGKey(seed))
            return float(np.asarray(image[0, 0, 0, 0], dtype=np.float32))

        run_fast(0)  # compile (persistent-cached)
        fast_times = []
        for i in range(repeats):
            t0 = time.time()
            run_fast(i + 1)
            fast_times.append(time.time() - t0)
        print(json.dumps({"shared_cfg": {
            "sec_per_image": round(min(fast_times) / batch, 2),
            "images_per_sec": round(batch / min(fast_times), 4),
            "note": "opt-in preview_cfg/controlnet_cfg=False (non-parity)",
        }}), file=sys.stderr, flush=True)

    dc_interval = int(os.environ.get("BENCH_DEEPCACHE", "1"))
    if dc_interval > 1:
        # opt-in DeepCache block caching (arXiv 2312.03209; docs/perf.md):
        # shallow-UNet steps between full refreshes, previewer+aggregator
        # reused. Reported as detail; headline stays parity-exact. The fastest
        # serving mode composes deepcache with the shared-CFG branch.
        import dataclasses as _dc

        try:
            for label, extra in (("deepcache", {}),
                                 ("deepcache_shared", {"preview_cfg": False, "controlnet_cfg": False})):
                dc_cfg = _dc.replace(cfg, deepcache_interval=dc_interval, **extra)

                def run_dc(seed):
                    image, _ = pipe.restore(lq, pe, pooled, cfg=dc_cfg, key=jax.random.PRNGKey(seed))
                    return float(np.asarray(image[0, 0, 0, 0], dtype=np.float32))

                run_dc(0)  # compile (persistent-cached)
                dc_times = []
                for i in range(repeats):
                    t0 = time.time()
                    run_dc(i + 1)
                    dc_times.append(time.time() - t0)
                print(json.dumps({label: {
                    "sec_per_image": round(min(dc_times) / batch, 2),
                    "images_per_sec": round(batch / min(dc_times), 4),
                    "interval": dc_interval,
                    "note": "opt-in block caching (non-parity)",
                }}), file=sys.stderr, flush=True)
        except Exception as e:  # never let the opt-in detail sink the headline
            print(json.dumps({"deepcache_error": str(e)[:200]}), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
