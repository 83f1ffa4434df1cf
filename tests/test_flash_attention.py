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


@pytest.mark.parametrize(
    "q_len,kv_len", [(256, 256), (75, 130), (128, 512)]
)
def test_grad_matches_oracle_unmasked(q_len, kv_len):
    """Custom-VJP flash backward vs jax.grad through the XLA oracle."""
    b, h, d = 2, 2, 32
    q = _rand((b, q_len, h, d), 20)
    k = _rand((b, kv_len, h, d), 21)
    v = _rand((b, kv_len, h, d), 22)
    w = _rand((b, q_len, h, d), 23)  # fixed cotangent direction

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_grad_matches_oracle_masked():
    b, h, d, n = 2, 2, 32, 160
    q = _rand((b, n, h, d), 24)
    k = _rand((b, n, h, d), 25)
    v = _rand((b, n, h, d), 26)
    lens = jnp.asarray([100, 160])
    mask = padding_mask(lens, n)
    w = _rand((b, n, h, d), 27)
    # padded query rows are don't-care: zero their cotangent so both paths
    # see the same objective
    w = w * (jnp.arange(n)[None, :, None, None] < lens[:, None, None, None])

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, mask=mask, block_q=64, block_k=64, interpret=True
        )
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, mask=mask) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_grad_bf16_finite():
    b, h, d, n = 1, 2, 64, 256
    q = _rand((b, n, h, d), 28).astype(jnp.bfloat16)
    k = _rand((b, n, h, d), 29).astype(jnp.bfloat16)
    v = _rand((b, n, h, d), 30).astype(jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, interpret=True).astype(jnp.float32) ** 2
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a in g:
        assert a.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_encoder_training_grads_flash_vs_xla():
    """Flash VJP wired through AudioEncoder: parameter grads match the XLA
    attention path (same params, q_len >= 256 so the flash gate fires)."""
    from robustsq_whisper_tpu.models.whisper import AudioEncoder, WhisperDims

    dims = WhisperDims(
        n_mels=80, n_vocab=10, n_audio_ctx=256, n_audio_state=64,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=8, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    mel = _rand((1, 80, 2 * dims.n_audio_ctx), 31)
    enc_x = AudioEncoder(dims, use_flash=False)
    enc_f = AudioEncoder(dims, use_flash=True)
    variables = enc_x.init(jax.random.PRNGKey(0), mel)
    params, buffers = variables["params"], variables["buffers"]

    def loss(enc):
        def f(p):
            out = enc.apply({"params": p, "buffers": buffers}, mel)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_x = jax.grad(loss(enc_x))(params)
    g_f = jax.grad(loss(enc_f))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
        ),
        g_x, g_f,
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


@pytest.mark.parametrize("t", [256, 300])
def test_tmaj_matches_oracle(t):
    """Transposed-layout forward kernel == XLA oracle (incl. ragged tail)."""
    from robustsq_whisper_tpu.ops.flash_attention import flash_attention_tmaj

    b, h, d = 2, 2, 32
    q = _rand((b, t, h, d), 20)
    k = _rand((b, t, h, d), 21)
    v = _rand((b, t, h, d), 22)
    ref = dot_product_attention(q, k, v)
    tm = lambda z: z.transpose(0, 2, 3, 1).reshape(b * h, d, t)
    out = flash_attention_tmaj(
        tm(q), tm(k), tm(v), block_q=128, block_k=128, interpret=True
    )
    out = out.reshape(b, h, d, t).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_tmaj_grads_match_rowmajor():
    """The tmaj fallback VJP == differentiating the row-major flash route.

    A decode-tuned config with flash_tmaj=True must still TRAIN correctly:
    the backward transposes to row-major and rides the flash VJP kernels."""
    from robustsq_whisper_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_tmaj,
    )

    b, h, t, d = 2, 2, 256, 32
    q = _rand((b, t, h, d), 30)
    k = _rand((b, t, h, d), 31)
    v = _rand((b, t, h, d), 32)
    tm = lambda z: z.transpose(0, 2, 3, 1).reshape(b * h, d, t)

    def loss_tm(q, k, v):
        o = flash_attention_tmaj(tm(q), tm(k), tm(v), interpret=True)
        return jnp.sum(o * o)

    def loss_rm(q, k, v):
        o = flash_attention(q, k, v, interpret=True)
        return jnp.sum(o * o)

    g_tm = jax.grad(loss_tm, argnums=(0, 1, 2))(q, k, v)
    g_rm = jax.grad(loss_rm, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_tm, g_rm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_encoder_block_tmaj_route_matches_rowmajor():
    """ResidualAttentionBlock(flash_tmaj=True) == the row-major flash route.

    Same params, same input; only the attention-internals layout differs
    (projection dots emit transposed outputs, (kv, q) score matrix)."""
    from robustsq_whisper_tpu.models.whisper.modules import (
        ResidualAttentionBlock,
    )

    b, t, c, h = 2, 288, 64, 4
    x = _rand((b, t, c), 23) * 0.1
    base = ResidualAttentionBlock(c, h, use_flash=True)
    variables = base.init(jax.random.PRNGKey(0), x)
    y_rm = base.apply(variables, x)
    y_tm = ResidualAttentionBlock(c, h, use_flash=True, flash_tmaj=True).apply(
        variables, x
    )
    np.testing.assert_allclose(
        np.asarray(y_tm), np.asarray(y_rm), rtol=2e-4, atol=2e-4
    )
