"""Adaptive restoration (adastep), guidance rescale, and sharded batch inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.parallel import data_parallel_sharding, make_mesh, replicate_params
from instantir_tpu.pipeline import RestoreConfig
from instantir_tpu.pipeline.factory import build_pipeline


@pytest.fixture(scope="module")
def pipe():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=32
    )


def _inputs(pipe, rng, b=1):
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    return (
        jnp.asarray(rng.uniform(-1, 1, size=(b, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32),
    )


def test_adastep_restore_runs(pipe, rng):
    # zero-conv heads output exact zeros at init, which would make the
    # aggregator path (and thus adastep) a no-op — bump them first.
    def bump(path, x):
        if any("zero_conv" in str(p) for p in path):
            return x + 0.05
        return x

    pipe.params = dict(pipe.params)
    pipe.params["aggregator"] = jax.tree_util.tree_map_with_path(bump, pipe.params["aggregator"])
    lq, pe, pp = _inputs(pipe, rng)
    cfg = RestoreConfig(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25, adastep_restore=True)
    lat, _ = pipe.restore(lq, pe, pp, cfg=cfg, output_type="latent")
    assert np.isfinite(np.asarray(lat)).all()
    # adaptive factors change the trajectory vs non-adaptive
    cfg2 = RestoreConfig(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25, adastep_restore=False)
    lat2, _ = pipe.restore(lq, pe, pp, cfg=cfg2, output_type="latent", key=jax.random.PRNGKey(0))
    lat1, _ = pipe.restore(lq, pe, pp, cfg=cfg, output_type="latent", key=jax.random.PRNGKey(0))
    assert np.abs(np.asarray(lat1) - np.asarray(lat2)).max() > 1e-7


def test_guidance_rescale(pipe, rng):
    lq, pe, pp = _inputs(pipe, rng)
    cfg = RestoreConfig(num_inference_steps=2, guidance_scale=7.0, guidance_rescale=0.7)
    lat, _ = pipe.restore(lq, pe, pp, cfg=cfg, output_type="latent", key=jax.random.PRNGKey(0))
    cfg0 = RestoreConfig(num_inference_steps=2, guidance_scale=7.0, guidance_rescale=0.0)
    lat0, _ = pipe.restore(lq, pe, pp, cfg=cfg0, output_type="latent", key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(lat)).all()
    assert np.abs(np.asarray(lat) - np.asarray(lat0)).max() > 1e-7


def test_sharded_batch_restore(pipe, rng):
    """BASELINE config #5 shape: batched restoration sharded over the mesh."""
    mesh = make_mesh()
    b = 8
    lq, pe, pp = _inputs(pipe, rng, b=b)
    sharding = data_parallel_sharding(mesh)
    pipe.params = replicate_params(pipe.params, mesh)
    lq = jax.device_put(lq, sharding)
    pe = jax.device_put(pe, sharding)
    pp = jax.device_put(pp, sharding)
    cfg = RestoreConfig(num_inference_steps=2, guidance_scale=7.0, preview_start=0.0)
    lat, _ = pipe.restore(lq, pe, pp, cfg=cfg, output_type="latent", key=jax.random.PRNGKey(0))
    assert lat.shape == (b, 16, 16, 4)
    assert np.isfinite(np.asarray(lat)).all()
    # result still spans all 8 devices (no gather to one chip mid-loop)
    assert len(lat.sharding.device_set) == 8


def test_fused_previewer_lora_matches_dynamic(pipe, rng):
    """The merged-LoRA preview path (W + scale·(α/r)·AB folded once per
    restore, adapter matmuls statically skipped) must reproduce the dynamic
    LoRA-branch restore to accumulation-order error."""
    from instantir_tpu.pipeline.instantir import InstantIRPipeline

    p = InstantIRPipeline(
        pipe.unet, pipe.aggregator, pipe.vae, pipe.resampler, pipe.image_encoder,
        pipe.schedule, pipe.params,
    )
    lq, pe, pooled = _inputs(pipe, rng, b=2)
    base = dict(num_inference_steps=4, guidance_scale=5.0, preview_start=0.0, control_guidance_end=0.8,
                lora_alpha=0.7)
    lat_dyn, _ = p.restore(lq, pe, pooled, cfg=RestoreConfig(**base, fuse_previewer_lora=False),
                           key=jax.random.PRNGKey(5), output_type="latent")
    lat_fused, _ = p.restore(lq, pe, pooled, cfg=RestoreConfig(**base, fuse_previewer_lora=True),
                             key=jax.random.PRNGKey(5), output_type="latent")
    a, b = np.asarray(lat_dyn), np.asarray(lat_fused)
    assert not np.allclose(a, 0)
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-3)


def test_freeze_previewer_matches_dynamic(pipe, rng):
    """freeze_previewer: one-time analytic merge + LoRA-pair removal must
    reproduce the dynamic restore; a mismatched lora_alpha afterwards must
    fail loudly (the pairs are gone)."""
    from instantir_tpu.pipeline.instantir import InstantIRPipeline

    def fresh():
        return InstantIRPipeline(
            pipe.unet, pipe.aggregator, pipe.vae, pipe.resampler, pipe.image_encoder,
            pipe.schedule, pipe.params,
        )

    lq, pe, pooled = _inputs(pipe, rng, b=2)
    base = dict(num_inference_steps=4, guidance_scale=5.0, preview_start=0.0,
                control_guidance_end=0.8, lora_alpha=0.7)
    lat_dyn, _ = fresh().restore(lq, pe, pooled, cfg=RestoreConfig(**base),
                                 key=jax.random.PRNGKey(5), output_type="latent")
    frozen = fresh().freeze_previewer(0.7)

    def count_lora(t):
        n = [0]

        def walk(node):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == "lora_a":
                        n[0] += 1
                    walk(v)

        walk(t)
        return n[0]

    assert count_lora(frozen.params["unet"]) == 0
    assert count_lora(frozen._prev_unet) == 0
    lat_frozen, _ = frozen.restore(lq, pe, pooled, cfg=RestoreConfig(**base),
                                   key=jax.random.PRNGKey(5), output_type="latent")
    np.testing.assert_allclose(np.asarray(lat_dyn), np.asarray(lat_frozen), atol=5e-4, rtol=5e-3)
    with pytest.raises(ValueError, match="frozen"):
        frozen.restore(lq, pe, pooled, cfg=RestoreConfig(**{**base, "lora_alpha": 1.0}),
                       key=jax.random.PRNGKey(5), output_type="latent")


def test_stage1_inplace_lora_merge_matches_dynamic(pipe, rng):
    """Stage1SDXLPipeline.merge_previewer_lora_inplace: folded weights with
    static LoRA skip must equal the dynamic branch, and the A/B pairs are gone."""
    from instantir_tpu.pipeline.stage1_sdxl import Stage1SDXLPipeline

    def fresh():
        return Stage1SDXLPipeline(
            pipe.unet, pipe.vae, pipe.resampler, pipe.image_encoder, pipe.schedule, pipe.params
        )

    lat = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    cond = {
        "prompt_embeds": jnp.asarray(rng.normal(size=(2, 7, cross)), jnp.float32),
        "pooled_embeds": jnp.asarray(rng.normal(size=(2, pooled_dim)), jnp.float32),
        "time_ids": jnp.zeros((2, 6), jnp.float32),
    }
    ip = jnp.asarray(rng.normal(size=(2, 4, cross)), jnp.float32)
    want = fresh().one_step_preview(lat, 999, cond, ip, lora_scale=0.7)
    merged = fresh().merge_previewer_lora_inplace(0.7)
    got = merged.one_step_preview(lat, 999, cond, ip, lora_scale=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4)

    def count_lora(t):
        n = [0]

        def walk(node):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == "lora_a":
                        n[0] += 1
                    walk(v)

        walk(t)
        return n[0]

    assert count_lora(merged.params["unet"]) == 0


def test_cfg_shared_control_branch_exact_when_branches_identical(pipe, rng):
    """preview_cfg/controlnet_cfg=False share the text-half control branch
    across CFG. With identical cond/uncond conditioning (zero LQ → identical
    ip tokens; negatives = positives) the CFG halves are the same, so the
    shared path must reproduce the full path exactly."""
    b = 1
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = (
        pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    )
    # the uncond branch zeros the POST-preprocessing pixels (reference
    # encode_image, sdxl_instantir.py:662-664: torch.zeros_like(image) AFTER
    # the feature extractor) — so the lq whose cond tokens equal the uncond
    # tokens is the one that preprocesses to zero: (lq+1)/2 == ImageNet mean.
    # (An earlier version used lq = 0, which only "passed" while the
    # module-scoped pipe still had pristine zero-conv heads making the whole
    # control branch a no-op; test_adastep_restore_runs bumps them.)
    from instantir_tpu.models.dinov2 import DINOV2_MEAN

    mean = jnp.asarray(DINOV2_MEAN, jnp.float32)
    lq = jnp.broadcast_to(mean * 2.0 - 1.0, (b, 32, 32, 3))
    # make sure the control branch is LIVE (zero-conv heads output exact
    # zeros at init, which would make full-vs-shared trivially equal no
    # matter what) — idempotent wrt test_adastep_restore_runs' own bump
    def bump(path, x):
        if any("zero_conv" in str(p) for p in path):
            return jnp.where(x == 0.0, 0.05, x)
        return x

    pipe.params = dict(pipe.params)
    pipe.params["aggregator"] = jax.tree_util.tree_map_with_path(bump, pipe.params["aggregator"])
    pe = jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32)
    pp = jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32)
    kw = dict(negative_prompt_embeds=pe, negative_pooled_embeds=pp,
              output_type="latent", key=jax.random.PRNGKey(3))

    full = RestoreConfig(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25)
    shared = RestoreConfig(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25,
                           preview_cfg=False, controlnet_cfg=False)
    lat_f, _ = pipe.restore(lq, pe, pp, cfg=full, **kw)
    lat_s, _ = pipe.restore(lq, pe, pp, cfg=shared, **kw)
    # atol covers the fp residue of bilinear-resizing the constant image in
    # preprocess (weights sum to 1 ± ulp → ~1e-7 token noise, amplified by 4
    # steps at CFG 7 to ~3e-5); genuine branch divergence measures 0.08
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_f), rtol=1e-4, atol=2e-4)


def test_cfg_shared_control_branch_diverges_bounded(pipe, rng):
    """With real (different) uncond conditioning the shared path is an
    approximation: finite, same shape, and not wildly off the full path."""
    lq, pe, pp = _inputs(pipe, rng)
    kw = dict(output_type="latent", key=jax.random.PRNGKey(4))
    full = RestoreConfig(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25)
    shared = RestoreConfig(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25,
                           preview_cfg=False, controlnet_cfg=False)
    lat_f, _ = pipe.restore(lq, pe, pp, cfg=full, **kw)
    lat_s, _ = pipe.restore(lq, pe, pp, cfg=shared, **kw)
    assert lat_s.shape == lat_f.shape
    assert np.isfinite(np.asarray(lat_s)).all()
    rel = float(np.linalg.norm(np.asarray(lat_s - lat_f)) / np.linalg.norm(np.asarray(lat_f)))
    assert rel < 0.5, rel


def test_deepcache_refresh_schedule():
    """Every interval-th step refreshes; phase starts always refresh."""
    from instantir_tpu.pipeline.instantir import build_step_phases

    cfg = RestoreConfig(num_inference_steps=6, guidance_scale=7.0,
                        preview_start=0.25, deepcache_interval=3)
    phases = build_step_phases(cfg)
    # steps 0-1 (A: 1/6 < 0.25), 2-5 (B): global refreshes at 0 and 3
    # (i % 3 == 0); forced refresh at the B phase start (step 2)
    flags = [(p["mode"], f) for p in phases for f in p["refresh"]]
    assert flags == [("A", 1.0), ("A", 0.0), ("B", 1.0), ("B", 1.0), ("B", 0.0), ("B", 0.0)]


def test_deepcache_exact_when_every_step_refreshes(pipe, rng):
    """interval=2 on a schedule where phase starts + even steps cover every
    step: the deepcache path must reproduce the exact path (the refresh branch
    is the plain computation; the split itself is bit-exact at equal step)."""
    lq, pe, pp = _inputs(pipe, rng)
    kw = dict(output_type="latent", key=jax.random.PRNGKey(6))
    # 3 steps, preview from step 1 (1/3 ≥ 0.3): phases A(0), B(1,2);
    # refreshes: 0 (global), 1 (phase start), 2 (global) — no stale step
    base = dict(num_inference_steps=3, guidance_scale=7.0, preview_start=0.3)
    lat_exact, _ = pipe.restore(lq, pe, pp, cfg=RestoreConfig(**base), **kw)
    lat_dc, _ = pipe.restore(lq, pe, pp, cfg=RestoreConfig(**base, deepcache_interval=2), **kw)
    np.testing.assert_allclose(np.asarray(lat_dc), np.asarray(lat_exact), rtol=1e-4, atol=1e-4)


def test_deepcache_diverges_bounded(pipe, rng):
    """With genuinely stale steps the trajectory is an approximation: finite,
    same shape, different from exact, not wildly off."""
    lq, pe, pp = _inputs(pipe, rng)
    kw = dict(output_type="latent", key=jax.random.PRNGKey(7))
    base = dict(num_inference_steps=6, guidance_scale=7.0, preview_start=0.25)
    lat_exact, _ = pipe.restore(lq, pe, pp, cfg=RestoreConfig(**base), **kw)
    lat_dc, _ = pipe.restore(lq, pe, pp, cfg=RestoreConfig(**base, deepcache_interval=3), **kw)
    assert lat_dc.shape == lat_exact.shape
    assert np.isfinite(np.asarray(lat_dc)).all()
    diff = np.abs(np.asarray(lat_dc) - np.asarray(lat_exact)).max()
    assert diff > 1e-7  # stale steps actually took the cached branch
    rel = float(np.linalg.norm(np.asarray(lat_dc - lat_exact)) / np.linalg.norm(np.asarray(lat_exact)))
    assert rel < 0.5, rel


def test_deepcache_depth2_preview_row_and_shared_cfg(pipe, rng):
    """Composes: cache_depth=2, preview row (one entry per mode-B step, stale
    steps emit the cached preview), and the shared-CFG control branch."""
    lq, pe, pp = _inputs(pipe, rng)
    cfg = RestoreConfig(num_inference_steps=6, guidance_scale=7.0, preview_start=0.25,
                        deepcache_interval=2, deepcache_depth=2,
                        preview_cfg=False, controlnet_cfg=False, save_preview_row=True)
    img, previews = pipe.restore(lq, pe, pp, cfg=cfg, key=jax.random.PRNGKey(8))
    assert np.isfinite(np.asarray(img)).all()
    assert len(previews) == 4  # steps 2..5 are mode B at preview_start=0.25
    for p in previews:
        assert p.shape[0] == 1 and np.isfinite(np.asarray(p)).all()


def test_deepcache_rejects_multistep(pipe, rng):
    lq, pe, pp = _inputs(pipe, rng)
    cfg = RestoreConfig(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25,
                        deepcache_interval=2, multistep_restore=True)
    with pytest.raises(ValueError, match="incompatible"):
        pipe.restore(lq, pe, pp, cfg=cfg, output_type="latent")


def test_fused_restore_matches_staged(pipe, rng):
    """cfg.fused compiles the whole restore into one program; math and RNG
    stream are identical to the staged path, so images must agree (tolerance
    covers XLA re-fusing fp reductions across the larger program)."""
    lq, pe, pp = _inputs(pipe, rng)
    base = dict(num_inference_steps=4, guidance_scale=7.0, preview_start=0.25,
                save_preview_row=True)
    kw = dict(key=jax.random.PRNGKey(5))
    img_s, prev_s = pipe.restore(lq, pe, pp, cfg=RestoreConfig(**base), **kw)
    img_f, prev_f = pipe.restore(lq, pe, pp, cfg=RestoreConfig(**base, fused=True), **kw)
    np.testing.assert_allclose(img_f, img_s, rtol=1e-4, atol=1e-4)
    assert len(prev_f) == len(prev_s)
    for a, b in zip(prev_f, prev_s):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    # with explicit negatives (exercises the None-vs-array retrace paths)
    npe = jnp.asarray(rng.normal(size=pe.shape), jnp.float32)
    npp = jnp.asarray(rng.normal(size=pp.shape), jnp.float32)
    base2 = dict(num_inference_steps=3, guidance_scale=7.0)
    img_s2, _ = pipe.restore(lq, pe, pp, negative_prompt_embeds=npe,
                             negative_pooled_embeds=npp, cfg=RestoreConfig(**base2), **kw)
    img_f2, _ = pipe.restore(lq, pe, pp, negative_prompt_embeds=npe,
                             negative_pooled_embeds=npp,
                             cfg=RestoreConfig(**base2, fused=True), **kw)
    np.testing.assert_allclose(img_f2, img_s2, rtol=1e-4, atol=1e-4)
