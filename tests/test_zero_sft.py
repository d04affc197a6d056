"""ZeroSFT residual fusion vs a torch oracle, and the UNet zero_sft variant
(dormant reference component ``module/unet/unet_2d_ZeroSFT.py``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from instantir_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from instantir_tpu.models.zero_sft import ZeroSFT

B, H, W = 2, 8, 8


class TorchZeroSFT(torch.nn.Module):
    """The reference module re-written from its published semantics
    (unet_2d_ZeroSFT.py:81-136), NCHW."""

    def __init__(self, label_nc, norm_nc, concat_channels=0, groups=4, nhidden=16):
        super().__init__()
        nn = torch.nn
        self.pre_concat = concat_channels != 0
        self.param_free_norm = nn.GroupNorm(groups, norm_nc + concat_channels)
        self.mlp_shared = nn.Sequential(nn.Conv2d(label_nc, nhidden, 3, padding=1), nn.SiLU())
        self.zero_mul = nn.Conv2d(nhidden, norm_nc + concat_channels, 3, padding=1)
        self.zero_add = nn.Conv2d(nhidden, norm_nc + concat_channels, 3, padding=1)
        self.zero_conv = nn.Conv2d(label_nc, norm_nc, 1)

    def forward(self, c, h, h_ori=None, control_scale=1.0):
        h_raw = torch.cat([h_ori, h], dim=1) if h_ori is not None else h
        h = h + self.zero_conv(c)
        if h_ori is not None and self.pre_concat:
            h = torch.cat([h_ori, h], dim=1)
        actv = self.mlp_shared(c)
        h = self.param_free_norm(h) * (self.zero_mul(actv) + 1) + self.zero_add(actv)
        return h * control_scale + h_raw * (1 - control_scale)


def _convert(sd):
    """torch ZeroSFT state dict → flax params (the converter under test)."""

    def conv(prefix):
        return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0)),
                "bias": sd[f"{prefix}.bias"].numpy()}

    return {"params": {
        "zero_conv": conv("zero_conv"),
        "mlp_shared": conv("mlp_shared.0"),
        "zero_mul": conv("zero_mul"),
        "zero_add": conv("zero_add"),
        "param_free_norm": {"norm": {"scale": sd["param_free_norm.weight"].numpy(),
                                     "bias": sd["param_free_norm.bias"].numpy()}},
    }}


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


@pytest.mark.parametrize("with_h_ori,scale", [(True, 1.0), (False, 1.0), (True, 0.3)])
def test_zero_sft_matches_torch(rng, with_h_ori, scale):
    label_nc, norm_nc, concat = 8, 8, 12 if with_h_ori else 0
    oracle = TorchZeroSFT(label_nc, norm_nc, concat).eval()
    with torch.no_grad():  # randomize (incl. the zero-init convs — test real math)
        for p in oracle.parameters():
            p.copy_(torch.from_numpy(rng.normal(size=tuple(p.shape)).astype(np.float32) * 0.3))

    c = rng.normal(size=(B, label_nc, H, W)).astype(np.float32)
    h = rng.normal(size=(B, norm_nc, H, W)).astype(np.float32)
    h_ori = rng.normal(size=(B, concat, H, W)).astype(np.float32) if with_h_ori else None
    with torch.no_grad():
        want = oracle(torch.from_numpy(c), torch.from_numpy(h),
                      None if h_ori is None else torch.from_numpy(h_ori), control_scale=scale)

    mod = ZeroSFT(nhidden=16, norm_num_groups=4)
    got = mod.apply(_convert(oracle.state_dict()), _nhwc(c), _nhwc(h),
                    None if h_ori is None else _nhwc(h_ori), control_scale=scale)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), atol=2e-5, rtol=1e-4
    )


def test_unet_zero_sft_variant(rng):
    """The zero_sft UNet consumes paired residuals end-to-end; at init the
    zero convs make γ=β=0 so fusion reduces to GroupNorm of the concat."""
    cfg = tiny_unet_config(residual_fusion="zero_sft")
    unet = UNet2DConditionModel(cfg)
    lat = 8
    x = jnp.asarray(rng.normal(size=(B, lat, lat, 4)), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    text = jnp.asarray(rng.normal(size=(B, 7, cfg.cross_attention_dim)), jnp.float32)
    pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
    pooled = jnp.asarray(rng.normal(size=(B, pooled_dim)), jnp.float32)
    tids = jnp.zeros((B, 6), jnp.float32)

    # residual shapes = the down stack's skip shapes: probe via the add variant
    base = UNet2DConditionModel(dataclasses.replace(cfg, residual_fusion="add"))
    probe = jax.eval_shape(lambda k: base.init(k, x, t, text, pooled, tids), jax.random.PRNGKey(0))
    del probe  # shapes known from topology below
    downs = []
    ch, size = cfg.block_out_channels, lat
    downs.append(jnp.zeros((B, size, size, ch[0])))
    for i in range(len(ch)):
        for _ in range(cfg.layers_per_block):
            downs.append(jnp.zeros((B, size, size, ch[i])))
        if i < len(ch) - 1:
            size //= 2
            downs.append(jnp.zeros((B, size, size, ch[i])))
    mid = jnp.zeros((B, size, size, ch[-1]))
    downs = [jnp.asarray(rng.normal(size=d.shape) * 0.1, jnp.float32) for d in downs]
    mid = jnp.asarray(rng.normal(size=mid.shape) * 0.1, jnp.float32)

    params = unet.init(jax.random.PRNGKey(0), x, t, text, pooled, tids,
                       down_block_additional_residuals=tuple(downs),
                       mid_block_additional_residual=mid)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("mid_zero_sft" in jax.tree_util.keystr(p) for p, _ in flat)
    assert any("zero_sfts_0" in jax.tree_util.keystr(p) for p, _ in flat)

    out = unet.apply(params, x, t, text, pooled, tids,
                     down_block_additional_residuals=tuple(downs),
                     mid_block_additional_residual=mid)
    assert out.shape == (B, lat, lat, 4) and np.isfinite(np.asarray(out)).all()

    with pytest.raises(ValueError, match="zero_sft"):
        unet.apply(params, x, t, text, pooled, tids)
