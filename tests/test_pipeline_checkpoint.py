"""Framework-native pipeline checkpoint save/load round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from instantir_tpu.models.dinov2 import tiny_dinov2_config
from instantir_tpu.models.resampler import tiny_resampler_config
from instantir_tpu.models.unet import tiny_unet_config
from instantir_tpu.models.vae import tiny_vae_config
from instantir_tpu.pipeline.factory import build_pipeline


def test_save_load_roundtrip(tmp_path):
    ucfg = tiny_unet_config(with_ip=True, lora_rank=4)
    rcfg = tiny_resampler_config(output_dim=ucfg.cross_attention_dim, lora_rank=2)
    pipe = build_pipeline(
        ucfg, tiny_vae_config(), rcfg, tiny_dinov2_config(), jax.random.PRNGKey(0), image_size=32
    )
    pipe.save_params(str(tmp_path / "ckpt"))
    original = jax.tree_util.tree_map(np.asarray, pipe.params)
    # wipe and reload
    pipe.params = jax.tree_util.tree_map(jnp.zeros_like, pipe.params)
    pipe.load_params(str(tmp_path / "ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(original), jax.tree_util.tree_leaves(pipe.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
