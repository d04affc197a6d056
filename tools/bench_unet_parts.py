"""Intra-UNet attribution: marginal cost + TF/s of each block family at 1024².

The headline gap is known to be inside the three per-step network forwards
(~50% of the chip's demonstrated 171 TF/s matmul roofline, docs/perf.md).
This tool isolates the block families that make up the SDXL UNet/Aggregator
at 1024² shapes (CFG batch 2) and times each with the marginal-trip-count
method (lax.scan of N applications inside ONE executable; cost = (t(2N) -
t(N)) / N) so relay dispatch overhead cancels. Against analytic FLOPs this
says which family underuses the MXU.

Run: python tools/bench_unet_parts.py   (ambient TPU env)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import synth_params

B = 2  # CFG batch
TEXT = 77
IP = 64
CROSS = 2048
TEMB = 1280


def fetch(x):
    return float(np.asarray(x.ravel()[0], np.float32))


def marginal_ms(apply_fn, params, x0, n_small=4, n_big=12, reps=3):
    """(t(n_big) - t(n_small)) / (n_big - n_small), milliseconds.

    ``params`` must be a runtime argument (NOT a closure): closed-over trees
    bake into the HLO as constants and blow the remote-compile body limit."""

    def loop(n):
        @jax.jit
        def run(p, x):
            def body(_, x):
                return apply_fn(p, x)

            return jax.lax.fori_loop(0, n, body, x)

        return run

    run_s, run_b = loop(n_small), loop(n_big)
    fetch(run_s(params, x0))  # compile
    fetch(run_b(params, x0))
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.time()
        fetch(run_s(params, x0))
        ts.append(time.time() - t0)
        t0 = time.time()
        fetch(run_b(params, x0))
        tb.append(time.time() - t0)
    return (min(tb) - min(ts)) / (n_big - n_small) * 1000


def resnet_case(hw, ch):
    from instantir_tpu.models.resnet import ResnetBlock2D

    mod = ResnetBlock2D(ch, TEMB, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    x = jnp.zeros((B, hw, hw, ch), jnp.bfloat16)
    temb = jnp.zeros((B, TEMB), jnp.bfloat16)
    params = synth_params(mod, lambda: mod.init(jax.random.PRNGKey(0), x, temb))
    ms = marginal_ms(lambda p, h: mod.apply(p, h, temb), params, x)
    # 2 convs 3x3 ch->ch + temb proj (+GN etc.)
    flops = 2 * (2 * B * hw * hw * 9 * ch * ch) + 2 * B * TEMB * ch
    return ms, flops


def transformer_case(hw, ch, layers, heads):
    from instantir_tpu.models.transformer import Transformer2DModel

    mod = Transformer2DModel(
        in_channels=ch,
        heads=heads,
        head_dim=ch // heads,
        num_layers=layers,
        cross_attention_dim=CROSS,
        with_ip=True,
        use_flash=True,
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
    )
    x = jnp.zeros((B, hw, hw, ch), jnp.bfloat16)
    ctx = jnp.zeros((B, TEXT, CROSS), jnp.bfloat16)
    ip = jnp.zeros((B, IP, CROSS), jnp.bfloat16)
    temb = jnp.zeros((B, TEMB), jnp.bfloat16)
    params = synth_params(
        mod,
        lambda: mod.init(
            jax.random.PRNGKey(0), x, encoder_hidden_states=ctx, ip_hidden_states=ip, temb=temb
        ),
    )
    ms = marginal_ms(
        lambda p, h: mod.apply(
            p, h, encoder_hidden_states=ctx, ip_hidden_states=ip, temb=temb
        ),
        params,
        x,
    )
    s = hw * hw
    per_layer = (
        4 * 2 * B * s * ch * ch  # attn1 qkv+out
        + 2 * 2 * B * s * s * ch  # attn1 scores+values
        + 2 * B * s * ch * ch  # attn2 q + out
        + 2 * 2 * B * TEXT * CROSS * ch  # attn2 k,v
        + 2 * B * s * TEXT * ch * 2  # attn2 scores+values
        + 2 * 2 * B * IP * CROSS * ch  # ip k,v
        + 2 * B * s * IP * ch * 2  # ip scores+values
        + 2 * B * s * ch * 8 * ch  # GEGLU in (2*4x)
        + 2 * B * s * 4 * ch * ch  # GEGLU out
    )
    flops = layers * per_layer + 2 * (2 * B * s * ch * ch)  # proj_in/out
    return ms, flops


def conv_sample_case(hw, ch, up):
    from instantir_tpu.models.resnet import Downsample2D, Upsample2D

    mod = (Upsample2D if up else Downsample2D)(ch, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    x = jnp.zeros((B, hw, hw, ch), jnp.bfloat16)
    params = synth_params(mod, lambda: mod.init(jax.random.PRNGKey(0), x))

    # output shape differs from input: time standalone pairs instead of a loop
    @jax.jit
    def one(p, x):
        return mod.apply(p, x)

    fetch(one(params, x))
    ts = []
    for _ in range(6):
        t0 = time.time()
        fetch(one(params, x))
        ts.append(time.time() - t0)
    out_hw = hw * 2 if up else hw // 2
    flops = 2 * B * out_hw * out_hw * 9 * ch * ch
    return min(ts) * 1000, flops  # includes one dispatch (~35 ms) — report raw


def main():
    print(f"{'case':46s} {'ms':>9s} {'GFLOP':>9s} {'TF/s':>7s}")

    def report(name, ms, flops):
        print(f"{name:46s} {ms:9.2f} {flops/1e9:9.1f} {flops/ms/1e9:7.1f}")

    # SDXL UNet level geometry at 1024² (latent 128)
    for hw, ch in ((128, 320), (64, 640), (32, 1280)):
        ms, fl = resnet_case(hw, ch)
        report(f"resnet {hw}x{hw} c{ch}", ms, fl)
    for hw, ch, layers, heads in ((64, 640, 2, 10), (32, 1280, 10, 20)):
        ms, fl = transformer_case(hw, ch, layers, heads)
        report(f"transformer {hw}x{hw} c{ch} L{layers}", ms, fl)
    for hw, ch in ((128, 320), (64, 640)):
        ms, fl = conv_sample_case(hw, ch, up=False)
        report(f"downsample {hw}->{hw//2} c{ch} (incl dispatch)", ms, fl)
    for hw, ch in ((32, 1280), (64, 640)):
        ms, fl = conv_sample_case(hw, ch, up=True)
        report(f"upsample {hw}->{hw*2} c{ch} (incl dispatch)", ms, fl)


if __name__ == "__main__":
    main()
