"""Demo dual-adapter switching (reference ``gradio_demo/app.py:67-70,115-120``):
the app holds the previewer LoRA and an LCM LoRA side by side and swaps the
UNet's LoRA leaves functionally on the Creative checkbox. Plus the stdlib
demo UI (no gradio in this environment): page + JSON restore API driven over
real HTTP, including the per-step preview gallery and creative-mode adapter
switch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instantir_tpu.cli.app import InstantIRApp, extract_unet_lora, load_lcm_lora_variant
from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline
from instantir_tpu.pipeline.instantir import InstantIRPipeline


@pytest.fixture(scope="module")
def pipe():
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    b = build_pipeline(ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=32)
    return InstantIRPipeline(b.unet, b.aggregator, b.vae, b.resampler, b.image_encoder, b.schedule, b.params)


def test_set_adapter_swaps_only_lora_leaves(pipe):
    previewer = extract_unet_lora(pipe.params["unet"])
    # a distinct "lcm" variant: every LoRA leaf shifted
    lcm = {k: np.asarray(v) + 0.05 for k, v in previewer.items()}
    app = InstantIRApp(pipe, encode_fn=None, lora_variants={"lcm": lcm})
    assert app.active_adapter == "previewer"

    base_kernel_before = np.asarray(pipe.params["unet"]["params"]["conv_in"]["base"]["kernel"])
    app.set_adapter("lcm")
    assert app.active_adapter == "lcm"
    now = extract_unet_lora(pipe.params["unet"])
    some_key = next(iter(previewer))
    np.testing.assert_allclose(np.asarray(now[some_key]), np.asarray(lcm[some_key]))
    # non-LoRA weights untouched
    np.testing.assert_array_equal(
        base_kernel_before, np.asarray(pipe.params["unet"]["params"]["conv_in"]["base"]["kernel"])
    )
    # and switching back restores the previewer exactly
    app.set_adapter("previewer")
    back = extract_unet_lora(pipe.params["unet"])
    np.testing.assert_allclose(np.asarray(back[some_key]), np.asarray(previewer[some_key]))

    with pytest.raises(KeyError):
        app.set_adapter("nope")


def test_load_lcm_lora_variant_from_file(pipe, tmp_path):
    torch = pytest.importorskip("torch")
    from instantir_tpu.convert import flax_to_torch as f2t

    np_unet = jax.tree_util.tree_map(np.asarray, pipe.params["unet"])
    lora_sd = {f"unet.{k}": v + 0.25 for k, v in f2t.export_unet(np_unet).items() if "lora_" in k}
    path = tmp_path / "lcm_lora.bin"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in lora_sd.items()}, path)

    variant = load_lcm_lora_variant(pipe.params["unet"], str(path), pipe.unet.config)
    previewer = extract_unet_lora(pipe.params["unet"])
    assert set(variant) == set(previewer)
    some = next(k for k in variant if "lora_a" in [str(p) for p in k])
    assert np.abs(np.asarray(variant[some]) - np.asarray(previewer[some])).max() > 0.1


def test_stdlib_demo_ui_http(pipe):
    """GET / serves the page; POST /api/restore runs the tiny pipeline and
    returns base64-PNG result + previews; creative=1 switches the adapter."""
    import base64
    import io
    import json
    import threading
    from http.client import HTTPConnection

    from PIL import Image

    from instantir_tpu.cli.app import InstantIRApp, make_demo_http_server

    ucfg = pipe.unet.config
    cross = ucfg.cross_attention_dim
    pooled_dim = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim

    def encode(prompts):
        rngs = [np.random.default_rng(abs(hash(p)) % 2**31) for p in prompts]
        pe = jnp.asarray(np.stack([r.normal(size=(7, cross)) for r in rngs]), jnp.float32) * 0.1
        pooled = jnp.asarray(np.stack([r.normal(size=(pooled_dim,)) for r in rngs]), jnp.float32) * 0.1
        return pe, pooled

    previewer = extract_unet_lora(pipe.params["unet"])
    lcm = {k: np.asarray(v) + 0.03 for k, v in previewer.items()}
    app = InstantIRApp(pipe, encode, lora_variants={"lcm": lcm})

    httpd = make_demo_http_server(app, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("GET", "/")
        page = conn.getresponse()
        assert page.status == 200
        html = page.read().decode()
        assert "Creative Restoration" in html and "/api/restore" in html

        buf = io.BytesIO()
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(buf, format="PNG")
        png = buf.getvalue()
        # tiny-model sizing: width/height 32, no min-side rail, /16 snapping
        tiny = "width=32&height=32&min_side=16&max_side=64&base_pixel_number=16"

        conn.request("POST", f"/api/restore?steps=2&previews=1&{tiny}", body=png,
                     headers={"Content-Length": str(len(png))})
        resp = conn.getresponse()
        data = json.loads(resp.read())
        assert resp.status == 200, data
        out = Image.open(io.BytesIO(base64.b64decode(data["image"])))
        assert out.size == (32, 32)
        assert data["adapter"] == "previewer"
        assert len(data["previews"]) >= 1
        Image.open(io.BytesIO(base64.b64decode(data["previews"][0])))

        conn.request("POST", f"/api/restore?steps=2&creative=1&{tiny}", body=png,
                     headers={"Content-Length": str(len(png))})
        resp = conn.getresponse()
        data = json.loads(resp.read())
        assert resp.status == 200, data
        assert data["adapter"] == "lcm"  # Creative checkbox switched the LoRA set

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        httpd.shutdown()
        app.set_adapter("previewer")  # leave the module-scoped pipe untouched
