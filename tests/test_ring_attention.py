"""Ring attention (sequence parallelism over the mesh data axis) must equal
dense single-device attention exactly (same math, different partitioning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.ops.attention import attention_xla
from instantir_tpu.parallel import make_mesh
from instantir_tpu.parallel.ring_attention import ring_attention, shard_sequence

B, S, HEADS, D = 2, 64, 4, 16
NDEV = 8


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, S, HEADS, D)), jnp.float32)
    return mk(), mk(), mk()


def test_ring_matches_dense(qkv):
    q, k, v = qkv
    mesh = make_mesh(num_devices=NDEV)
    want = attention_xla(q, k, v)
    got = ring_attention(
        shard_sequence(q, mesh), shard_sequence(k, mesh), shard_sequence(v, mesh), mesh
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_ring_respects_scale_and_grad(qkv):
    q, k, v = qkv
    mesh = make_mesh(num_devices=NDEV)
    want = attention_xla(q, k, v, scale=0.5)
    got = ring_attention(q, k, v, mesh, scale=0.5)  # unsharded inputs also legal
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # differentiable end-to-end (ppermute has a transpose rule)
    g = jax.grad(lambda q: ring_attention(q, k, v, mesh).sum())(q)
    g_ref = jax.grad(lambda q: attention_xla(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5, rtol=1e-3)


def test_ring_rejects_indivisible(qkv):
    q, k, v = qkv
    mesh = make_mesh(num_devices=NDEV)
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(q[:, : S - 4], k[:, : S - 4], v[:, : S - 4], mesh)


def test_sequence_parallel_restore_matches_dense():
    """End-to-end: a full InstantIR restore with
    ``RestoreConfig(sequence_parallel=True)`` on the 8-device mesh must
    latent-match the dense single-device path — the ≥2K²-long-context product
    path (SURVEY §5 stretch goal), not just the bare op. The tiny-channel
    config at 64² input stands in for 2048² at SDXL scale: the UNet's largest
    self-attention (256 tokens) and the aggregator's H-concat (512) both
    exceed the ring threshold and shard over the 'data' axis."""
    import importlib

    ra_mod = importlib.import_module("instantir_tpu.parallel.ring_attention")
    from instantir_tpu.models.dinov2 import tiny_dinov2_config
    from instantir_tpu.models.resampler import tiny_resampler_config
    from instantir_tpu.models.unet import tiny_unet_config
    from instantir_tpu.models.vae import tiny_vae_config
    from instantir_tpu.pipeline.factory import build_pipeline
    from instantir_tpu.pipeline.instantir import InstantIRPipeline, RestoreConfig

    res = 64  # latent 32² → attn seqs 256/64 (UNet), 512/128 (aggregator)
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    pipe = build_pipeline(ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(),
                          jax.random.PRNGKey(0), image_size=res)

    rng = np.random.default_rng(2)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, res, res, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(1, 7, ucfg.cross_attention_dim)), jnp.float32)
    pooled_dim = ucfg.projection_class_embeddings_input_dim - ucfg.addition_time_embed_dim * 6
    pooled = jnp.asarray(rng.normal(size=(1, pooled_dim)), jnp.float32)
    base = dict(num_inference_steps=2, preview_start=0.0, control_guidance_end=1.0)
    key = jax.random.PRNGKey(3)

    dense = InstantIRPipeline(pipe.unet, pipe.aggregator, pipe.vae, pipe.resampler,
                              pipe.image_encoder, pipe.schedule, pipe.params)
    want, _ = dense.restore(lq, pe, pooled, cfg=RestoreConfig(**base), key=key,
                            output_type="latent")

    # count ring invocations to prove the sequence-parallel path actually ran
    calls = []
    orig = ra_mod.ring_attention

    def counting(q, k, v, mesh, axis="data", scale=None):
        calls.append(q.shape[1])
        return orig(q, k, v, mesh, axis=axis, scale=scale)

    ra_mod.ring_attention = counting
    try:
        sp = InstantIRPipeline(pipe.unet, pipe.aggregator, pipe.vae, pipe.resampler,
                               pipe.image_encoder, pipe.schedule, pipe.params
                               ).shard(make_mesh(num_devices=NDEV))
        got, _ = sp.restore(
            lq, pe, pooled,
            cfg=RestoreConfig(sequence_parallel=True, sp_min_seq=64, **base),
            key=key, output_type="latent",
        )
    finally:
        ra_mod.ring_attention = orig

    assert calls, "no attention took the ring path"
    assert max(calls) >= 256, f"the long sequences did not ring: {sorted(set(calls))}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_sequence_parallel_composes_with_vae_tiling():
    """The intended 2K² deployment combines sequence_parallel (ring the long
    attention sequences) with vae_tiling/vae_slicing (constant-memory VAE at
    the decode end) — prove the composition traces and executes under the
    mesh and the tiled decode tracks the monolithic one."""
    from instantir_tpu.models.dinov2 import tiny_dinov2_config
    from instantir_tpu.models.resampler import tiny_resampler_config
    from instantir_tpu.models.unet import tiny_unet_config
    from instantir_tpu.models.vae import tiny_vae_config
    from instantir_tpu.pipeline.factory import build_pipeline
    from instantir_tpu.pipeline.instantir import RestoreConfig

    res = 64
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    pipe = build_pipeline(ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(),
                          jax.random.PRNGKey(0), image_size=res).shard(make_mesh(num_devices=NDEV))

    rng = np.random.default_rng(4)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(1, res, res, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(1, 7, ucfg.cross_attention_dim)), jnp.float32)
    pooled_dim = ucfg.projection_class_embeddings_input_dim - ucfg.addition_time_embed_dim * 6
    pooled = jnp.asarray(rng.normal(size=(1, pooled_dim)), jnp.float32)
    base = dict(num_inference_steps=2, sequence_parallel=True, sp_min_seq=64)
    key = jax.random.PRNGKey(3)

    plain, _ = pipe.restore(lq, pe, pooled, cfg=RestoreConfig(**base), key=key)
    tiled, _ = pipe.restore(
        lq, pe, pooled,
        cfg=RestoreConfig(vae_tiling=True, vae_tile_latent=24, vae_tile_overlap=0.5,
                          vae_slicing=True, **base),
        key=key,
    )
    assert tiled.shape == plain.shape == (1, res, res, 3)
    assert np.isfinite(tiled).all()
    # same trajectory (identical latents), only the decode tiles — the
    # difference is the tiling approximation alone
    err = np.abs(tiled - plain).mean() / (np.abs(plain).mean() + 1e-8)
    assert err < 0.4, err
