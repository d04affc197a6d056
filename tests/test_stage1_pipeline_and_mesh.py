"""Stage-1 pipeline sampling + multi-device data-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.parallel import make_mesh, replicate_params, shard_batch
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.pipeline.stage1_sdxl import Stage1Config, Stage1SDXLPipeline


@pytest.fixture(scope="module")
def bundle():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=32
    )


def _cond_inputs(pipe, rng, b):
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = pipe.unet.config.projection_class_embeddings_input_dim - pipe.unet.config.addition_time_embed_dim * 6
    pe = jnp.asarray(rng.normal(size=(b, 7, cross)), jnp.float32)
    pooled = jnp.asarray(rng.normal(size=(b, pooled_dim)), jnp.float32)
    ip = jnp.asarray(rng.normal(size=(b, 8, cross)), jnp.float32)
    return pe, pooled, ip


def test_stage1_txt2img(bundle, rng):
    pipe = Stage1SDXLPipeline(
        bundle.unet, bundle.vae, bundle.resampler, bundle.image_encoder, bundle.schedule, bundle.params
    )
    pe, pooled, ip = _cond_inputs(bundle, rng, 2)
    cfg = Stage1Config(num_inference_steps=3, guidance_scale=5.0)
    latents = pipe(pe, pooled, ip, height=32, width=32, cfg=cfg, key=jax.random.PRNGKey(0))
    assert latents.shape == (2, 16, 16, 4)  # tiny VAE downscales ×2
    assert np.isfinite(np.asarray(latents)).all()
    img = pipe(pe, pooled, ip, height=32, width=32, cfg=cfg, key=jax.random.PRNGKey(0), output_type="np")
    assert img.shape == (2, 32, 32, 3)


def test_stage1_one_step_preview(bundle, rng):
    pipe = Stage1SDXLPipeline(
        bundle.unet, bundle.vae, bundle.resampler, bundle.image_encoder, bundle.schedule, bundle.params
    )
    pe, pooled, ip = _cond_inputs(bundle, rng, 2)
    cond = {
        "prompt_embeds": pe,
        "pooled_embeds": pooled,
        "time_ids": jnp.tile(jnp.asarray([[32, 32, 0, 0, 32, 32]], jnp.float32), (2, 1)),
    }
    lat = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    out = pipe.one_step_preview(lat, 999, cond, ip, lora_scale=1.0)
    assert out.shape == lat.shape and np.isfinite(np.asarray(out)).all()


def test_stage1_custom_timesteps(bundle, rng):
    pipe = Stage1SDXLPipeline(
        bundle.unet, bundle.vae, bundle.resampler, bundle.image_encoder, bundle.schedule, bundle.params
    )
    pe, pooled, ip = _cond_inputs(bundle, rng, 1)
    cfg = Stage1Config(num_inference_steps=2, guidance_scale=1.0, timesteps=(999, 499))
    latents = pipe(pe, pooled, ip, height=32, width=32, cfg=cfg)
    assert np.isfinite(np.asarray(latents)).all()


def test_mesh_sharded_unet_forward(bundle, rng):
    # 8 virtual CPU devices: replicate params, shard batch over 'data'
    mesh = make_mesh()
    assert mesh.devices.size == 8
    params = replicate_params(bundle.params["unet"], mesh)
    b = 8
    batch = shard_batch(
        {
            "sample": jnp.asarray(rng.normal(size=(b, 16, 16, 4)), jnp.float32),
            "t": jnp.zeros((b,), jnp.int32),
            "text": jnp.asarray(rng.normal(size=(b, 7, 32)), jnp.float32),
            "pooled": jnp.asarray(rng.normal(size=(b, 16)), jnp.float32),
            "tids": jnp.zeros((b, 6), jnp.float32),
            "ip": jnp.asarray(rng.normal(size=(b, 8, 32)), jnp.float32),
        },
        mesh,
    )

    @jax.jit
    def fwd(p, batch):
        return bundle.unet.apply(
            p,
            batch["sample"],
            batch["t"],
            encoder_hidden_states=batch["text"],
            added_text_embeds=batch["pooled"],
            added_time_ids=batch["tids"],
            ip_hidden_states=batch["ip"],
        )

    out = fwd(params, batch)
    assert out.shape == (b, 16, 16, 4)
    # output stays sharded along data
    assert len(out.sharding.device_set) == 8
    # parity with single-device execution
    host_batch = jax.tree_util.tree_map(lambda x: np.asarray(x), batch)
    ref = bundle.unet.apply(
        bundle.params["unet"],
        jnp.asarray(host_batch["sample"]),
        jnp.asarray(host_batch["t"]),
        encoder_hidden_states=jnp.asarray(host_batch["text"]),
        added_text_embeds=jnp.asarray(host_batch["pooled"]),
        added_time_ids=jnp.asarray(host_batch["tids"]),
        ip_hidden_states=jnp.asarray(host_batch["ip"]),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_mesh_dp_gradient_allreduce(bundle, rng):
    # Gradients of a sharded-batch loss must equal the full-batch gradient —
    # i.e. XLA inserted the data-axis psum.
    mesh = make_mesh()
    unet = bundle.unet
    params = bundle.params["unet"]

    def loss(p, sample, t, text, pooled, tids, ip):
        out = unet.apply(
            p, sample, t, encoder_hidden_states=text, added_text_embeds=pooled,
            added_time_ids=tids, ip_hidden_states=ip,
        )
        return jnp.mean(out**2)

    b = 8
    args = (
        jnp.asarray(rng.normal(size=(b, 16, 16, 4)), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        jnp.asarray(rng.normal(size=(b, 7, 32)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 16)), jnp.float32),
        jnp.zeros((b, 6), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 8, 32)), jnp.float32),
    )
    g_ref = jax.grad(loss)(params, *args)
    sharded_args = shard_batch(args, mesh)
    g_dp = jax.jit(jax.grad(loss))(replicate_params(params, mesh), *sharded_args)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_dp = jax.tree_util.tree_leaves(g_dp)
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(flat_ref, flat_dp))
    assert worst < 1e-5
