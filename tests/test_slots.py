"""Slot-based continuous batching (pipeline/slots.py + ContinuousRestoreServer).

The contract these tests pin (VERDICT r4 #1): per-slot timesteps over one
resident device batch are a SCHEDULING change, not an approximation —

  * a single slot stepped to completion matches the staged phase sampler's
    trajectory for the same PRNG key (same RNG split structure, same
    per-step math across the A/B/C schedule);
  * a slot's result is bitwise-independent of what else occupies the batch:
    admitting a second request mid-flight does not change the first one
    (per-slot RNG streams + exact zero-residual masking);
  * the continuous server admits/refills mid-flight, completes every
    request under concurrency, drains gracefully, and refuses over-budget
    configs at warmup with a clear error (VERDICT r4 #7).

Reference: the torch implementation cannot express any of this — its
scheduler objects carry Python per-batch step state
(``schedulers/lcm_single_step_scheduler.py``) and its serving surface is a
single-user demo (``gradio_demo/app.py:112``).
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantir_tpu.cli.serve import ContinuousRestoreServer, ServeConfig, estimate_hbm_budget
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.pipeline.instantir import RestoreConfig
from instantir_tpu.pipeline.slots import SlotSampler, build_step_tables

RES = 32


@pytest.fixture(scope="module")
def pipe():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    return build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=RES
    )


def _inputs(pipe, seed=0, b=1):
    rng = np.random.default_rng(seed)
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = (pipe.unet.config.projection_class_embeddings_input_dim
                  - 6 * pipe.unet.config.addition_time_embed_dim)
    lq = jnp.asarray(rng.uniform(-1, 1, size=(b, RES, RES, 3)), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(b, 7, cross)) * 0.1, jnp.float32)
    pooled = jnp.asarray(rng.normal(size=(b, pooled_dim)) * 0.1, jnp.float32)
    return lq, pe, pooled


# the full A/B/C schedule: steps 0-1 → A, 2-3 → B, 4-5 → C
CFG = RestoreConfig(num_inference_steps=6, guidance_scale=7.0,
                    preview_start=0.2, control_guidance_end=0.7)


def test_step_tables_match_phases():
    tabs = build_step_tables(CFG)
    assert list(tabs["previewing"]) == [0, 0, 1, 1, 0, 0]
    assert list(tabs["keep"]) == [1, 1, 1, 1, 0, 0]
    assert len(tabs["t"]) == 6
    assert (tabs["t"] > tabs["prev_t"]).all()


def _run_slot(sampler, payload, state=None, slot=0, steps=None):
    if state is None:
        state = sampler.empty_state(payload)
    state = sampler.insert(state, payload, slot)
    for _ in range(steps if steps is not None else sampler.n_steps):
        state = sampler.step(state)
    return state


def test_single_slot_matches_phase_sampler(pipe):
    """One slot alone == the staged phase sampler, same key (latent space)."""
    lq, pe, pooled = _inputs(pipe)
    key = jax.random.PRNGKey(7)
    ref, _ = pipe.restore(lq, pe, pooled, cfg=CFG, key=key, output_type="latent")

    sampler = SlotSampler(pipe, CFG, RES, n_slots=1)
    payload = sampler.prelude(lq, pe, pooled, None, None, key)
    state = _run_slot(sampler, payload)
    got = np.asarray(state.latents)[0]
    ref = np.asarray(ref)[0]
    # same RNG bits and same per-step math; tolerance covers XLA fusing the
    # prelude stages differently than the staged pipeline's separate jits
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=0)
    assert np.isfinite(got).all()


def test_slot_invariant_to_batch_composition(pipe):
    """Mid-flight admission of a second request leaves the first one's
    trajectory untouched (per-slot RNG + exact masking)."""
    lq_a, pe_a, pooled_a = _inputs(pipe, seed=1)
    lq_b, pe_b, pooled_b = _inputs(pipe, seed=2)
    key_a, key_b = jax.random.PRNGKey(11), jax.random.PRNGKey(22)

    sampler = SlotSampler(pipe, CFG, RES, n_slots=2)
    pay_a = sampler.prelude(lq_a, pe_a, pooled_a, None, None, key_a)
    pay_b = sampler.prelude(lq_b, pe_b, pooled_b, None, None, key_b)

    # run A alone to completion
    solo = _run_slot(sampler, pay_a, slot=0)
    ref_a = np.asarray(solo.latents)[0]

    # run A, admit B three steps in (B is mid-B-phase while A reaches C)
    state = sampler.empty_state(pay_a)
    state = sampler.insert(state, pay_a, 0)
    for _ in range(3):
        state = sampler.step(state)
    state = sampler.insert(state, pay_b, 1)
    for _ in range(sampler.n_steps - 3):
        state = sampler.step(state)
    idx = np.asarray(state.step_idx)
    assert idx[0] == sampler.n_steps  # A finished
    assert idx[1] == sampler.n_steps - 3  # B still in flight
    np.testing.assert_array_equal(np.asarray(state.latents)[0], ref_a)

    # finish B; its result must equal a solo B run too
    for _ in range(3):
        state = sampler.step(state)
    solo_b = _run_slot(sampler, pay_b, slot=0)
    np.testing.assert_array_equal(np.asarray(state.latents)[1], np.asarray(solo_b.latents)[0])


def test_idle_slots_are_inert(pipe):
    """Stepping a state with an idle slot leaves its rows untouched."""
    lq, pe, pooled = _inputs(pipe)
    sampler = SlotSampler(pipe, CFG, RES, n_slots=2)
    payload = sampler.prelude(lq, pe, pooled, None, None, jax.random.PRNGKey(0))
    state = sampler.empty_state(payload)
    state = sampler.insert(state, payload, 1)
    before = np.asarray(state.latents)[0].copy()
    state = sampler.step(state)
    np.testing.assert_array_equal(np.asarray(state.latents)[0], before)
    assert np.asarray(state.step_idx)[0] == sampler.n_steps
    assert np.asarray(state.step_idx)[1] == 1


def test_slot_sampler_guards(pipe):
    with pytest.raises(ValueError, match="deepcache"):
        SlotSampler(pipe, RestoreConfig(deepcache_interval=2), RES, 1)
    with pytest.raises(ValueError, match="multistep_restore"):
        SlotSampler(pipe, RestoreConfig(multistep_restore=True), RES, 1)
    with pytest.raises(ValueError, match="save_preview_row"):
        SlotSampler(pipe, RestoreConfig(save_preview_row=True), RES, 1)


@pytest.fixture(scope="module")
def cont_server(pipe):
    cross = pipe.unet.config.cross_attention_dim
    pooled_dim = (pipe.unet.config.projection_class_embeddings_input_dim
                  - 6 * pipe.unet.config.addition_time_embed_dim)

    def encode(prompts):
        rngs = [np.random.default_rng(abs(hash(p)) % 2**31) for p in prompts]
        pe = np.stack([r.normal(size=(7, cross)).astype(np.float32) * 0.1 for r in rngs])
        pooled = np.stack([r.normal(size=(pooled_dim,)).astype(np.float32) * 0.1 for r in rngs])
        return pe, pooled

    cfg = ServeConfig(resolutions=(RES,), batch_sizes=(2,), tick_steps=2,
                      num_inference_steps=4, guidance_scale=7.0, continuous=True,
                      preview_start=0.0, creative_start=0.75)
    srv = ContinuousRestoreServer(pipe, encode, cfg).start(warmup=True)
    yield srv
    srv.stop()


def test_continuous_server_completes_concurrent_requests(cont_server):
    rng = np.random.default_rng(3)
    results, errors = {}, []

    def client(i):
        img = (rng.uniform(0, 255, size=(RES, RES, 3))).astype(np.uint8)
        try:
            results[i] = cont_server.submit(img, prompt=f"p{i % 2}", timeout=300)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 5
    for out in results.values():
        assert out.shape == (RES, RES, 3) and out.dtype == np.uint8
    stats = cont_server.stats()
    assert stats["mode"] == "continuous"
    assert stats["requests_served"] >= 5
    assert stats["ticks_run"] >= 2  # 4 steps at tick 2 → ≥2 ticks per wave
    assert stats["request_latency_seconds"]


def test_continuous_server_metrics_and_occupancy(cont_server):
    text = cont_server.metrics_text()
    assert "instantir_requests_served_total" in text
    stats = cont_server.stats()
    assert set(stats["slot_occupancy"]) == {str(RES)}


def test_continuous_server_drain_refuses_new(pipe):
    def encode(prompts):
        cross = pipe.unet.config.cross_attention_dim
        pooled_dim = (pipe.unet.config.projection_class_embeddings_input_dim
                      - 6 * pipe.unet.config.addition_time_embed_dim)
        b = len(prompts)
        return (np.zeros((b, 7, cross), np.float32), np.zeros((b, pooled_dim), np.float32))

    cfg = ServeConfig(resolutions=(RES,), batch_sizes=(1,), tick_steps=3,
                      num_inference_steps=3, guidance_scale=1.0, continuous=True)
    srv = ContinuousRestoreServer(pipe, encode, cfg).start(warmup=False)
    img = np.zeros((RES, RES, 3), np.uint8)
    out = srv.submit(img, timeout=300)
    assert out.shape == (RES, RES, 3)
    srv.drain(timeout=60)
    with pytest.raises(RuntimeError, match="draining"):
        srv.submit(img, timeout=10)


def test_hbm_budget_refuses_overbudget(pipe):
    # tiny params, but 8 × 4096² images of activations cannot fit one chip
    with pytest.raises(ValueError, match="HBM budget"):
        estimate_hbm_budget(pipe, (4096,), {4096: 8})
    report = estimate_hbm_budget(pipe, (4096,), {4096: 8}, allow_overbudget=True)
    assert report["rows"][0]["fits"] is False
    ok = estimate_hbm_budget(pipe, (RES,), {RES: 2})
    assert ok["rows"][0]["fits"] is True
