"""Flash-attention kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.ops.attention import (
    causal_mask,
    dot_product_attention,
    padding_mask,
)
from robustsq_whisper_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


@pytest.mark.parametrize(
    "q_len,kv_len", [(256, 256), (300, 300), (128, 512), (75, 130)]
)
def test_matches_oracle_unmasked(q_len, kv_len):
    b, h, d = 2, 4, 64
    q = _rand((b, q_len, h, d), 0)
    k = _rand((b, kv_len, h, d), 1)
    v = _rand((b, kv_len, h, d), 2)
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_matches_oracle_causal():
    b, h, d, n = 1, 2, 32, 192
    q = _rand((b, n, h, d), 3)
    k = _rand((b, n, h, d), 4)
    v = _rand((b, n, h, d), 5)
    mask = causal_mask(n)[None, None]
    # flash kernel uses a finite -1e30; replace -inf for comparison parity
    mask_f = jnp.maximum(mask, -1e30)
    ref = dot_product_attention(q, k, v, mask=mask_f)
    out = flash_attention(
        q, k, v, mask=mask_f, block_q=64, block_k=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_matches_oracle_padding_mask():
    b, h, d, n = 2, 2, 32, 160
    q = _rand((b, n, h, d), 6)
    k = _rand((b, n, h, d), 7)
    v = _rand((b, n, h, d), 8)
    lens = jnp.asarray([100, 160])
    mask = padding_mask(lens, n)
    ref = dot_product_attention(q, k, v, mask=mask)
    out = flash_attention(
        q, k, v, mask=mask, block_q=64, block_k=64, interpret=True
    )
    # only valid query rows need to match (padded queries are don't-care)
    for i, L in enumerate([100, 160]):
        np.testing.assert_allclose(
            np.asarray(out[i, :L]), np.asarray(ref[i, :L]),
            rtol=2e-4, atol=2e-4,
        )


def test_bf16_path():
    b, h, d, n = 1, 2, 64, 256
    q = _rand((b, n, h, d), 9).astype(jnp.bfloat16)
    k = _rand((b, n, h, d), 10).astype(jnp.bfloat16)
    v = _rand((b, n, h, d), 11).astype(jnp.bfloat16)
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
