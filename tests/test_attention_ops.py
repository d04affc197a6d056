"""Flash-attention kernel parity vs XLA reference and a torch SDPA oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.ops import attention_xla, flash_attention


def _rand_qkv(rng, b=2, sq=256, skv=256, h=3, d=64, dtype=np.float32):
    q = rng.normal(size=(b, sq, h, d)).astype(dtype)
    k = rng.normal(size=(b, skv, h, d)).astype(dtype)
    v = rng.normal(size=(b, skv, h, d)).astype(dtype)
    return q, k, v


def test_xla_attention_vs_torch_sdpa(rng):
    torch = pytest.importorskip("torch")
    q, k, v = _rand_qkv(rng)
    out = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    tq, tk, tv = [torch.from_numpy(x.transpose(0, 2, 1, 3)) for x in (q, k, v)]  # BHSD
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
    ref = ref.numpy().transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sq,skv", [(256, 256), (128, 1024), (512, 384)])
def test_flash_matches_xla(rng, sq, skv):
    q, k, v = _rand_qkv(rng, sq=sq, skv=skv)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_bf16(rng):
    q, k, v = _rand_qkv(rng, sq=256, skv=512)
    qb, kb, vb = [jnp.asarray(x, dtype=jnp.bfloat16) for x in (q, k, v)]
    ref = attention_xla(qb, kb, vb)
    out = flash_attention(qb, kb, vb, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), rtol=2e-2, atol=2e-2
    )
