"""Golden-numerics tests: flax Whisper vs a random-init HF WhisperModel.

The HF implementation is an independent oracle for the same architecture the
reference loads from OpenAI (reference model/whisper_encoder.py:131-171,
model/whisper_decoder.py:110-153). Also checks KV-cache decode consistency
against the full-sequence forward (the reference has no cache at all,
whisper_decoder.py:174-176 — correctness here is what the RTF win rests on).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.models.whisper import (
    AudioEncoder,
    TextDecoder,
    WhisperDims,
    sinusoids,
    load,
)

DIMS = WhisperDims(
    n_mels=80,
    n_vocab=100,
    n_audio_ctx=50,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_ctx=24,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=DIMS.n_vocab,
        num_mel_bins=80,
        d_model=DIMS.n_audio_state,
        encoder_layers=DIMS.n_audio_layer,
        encoder_attention_heads=DIMS.n_audio_head,
        decoder_layers=DIMS.n_text_layer,
        decoder_attention_heads=DIMS.n_text_head,
        encoder_ffn_dim=4 * DIMS.n_audio_state,
        decoder_ffn_dim=4 * DIMS.n_text_state,
        max_source_positions=DIMS.n_audio_ctx,
        max_target_positions=DIMS.n_text_ctx,
        activation_function="gelu",
        scale_embedding=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
    )
    model = WhisperModel(cfg).eval()
    # Force our fixed-sinusoid table into HF's (possibly random) encoder
    # positional embedding so both sides use identical positions.
    with torch.no_grad():
        model.encoder.embed_positions.weight.copy_(
            torch.from_numpy(sinusoids(DIMS.n_audio_ctx, DIMS.n_audio_state))
        )
    return model


def test_encoder_matches_hf(hf_model):
    import torch

    sd = hf_model.state_dict()
    params = load.encoder_params_from_hf(sd, DIMS.n_audio_layer)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 2 * DIMS.n_audio_ctx)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

    enc = AudioEncoder(DIMS)
    variables = {"params": params, "buffers": AudioEncoder.make_buffers(DIMS)}
    ours = np.asarray(enc.apply(variables, jnp.asarray(mel)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_decoder_matches_hf(hf_model):
    import torch

    sd = hf_model.state_dict()
    params = load.decoder_params_from_hf(sd, DIMS.n_text_layer)

    rng = np.random.default_rng(1)
    memory = rng.standard_normal((2, DIMS.n_audio_ctx, DIMS.n_audio_state)).astype(
        np.float32
    )
    tokens = rng.integers(0, DIMS.n_vocab, size=(2, 7))

    with torch.no_grad():
        ref = hf_model.decoder(
            input_ids=torch.from_numpy(tokens),
            encoder_hidden_states=torch.from_numpy(memory),
        ).last_hidden_state.numpy()

    dec = TextDecoder(DIMS)
    variables = {"params": params}
    hidden = dec.apply(
        variables,
        dec.apply(variables, jnp.asarray(tokens), method=TextDecoder.embed),
        jnp.asarray(memory),
        method=TextDecoder.forward_embedded,
    )
    np.testing.assert_allclose(np.asarray(hidden), ref, rtol=1e-4, atol=1e-4)

    # tied-embedding logits agree with the manual product
    logits = dec.apply(variables, jnp.asarray(tokens), jnp.asarray(memory))
    manual = ref @ sd["decoder.embed_tokens.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(logits), manual, rtol=1e-3, atol=1e-3)


def test_kv_cache_decode_matches_full_forward():
    """prefill + per-token steps must reproduce the full-sequence logits."""
    rng = jax.random.PRNGKey(0)
    dec = TextDecoder(DIMS)
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, DIMS.n_vocab, (2, 9)))
    memory = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 20, DIMS.n_audio_state)),
        dtype=jnp.float32,
    )
    variables = dec.init(rng, tokens, memory)

    full_logits = dec.apply(variables, tokens, memory)  # (2, 9, V)

    def m(method, *args):
        return dec.apply(variables, *args, method=method)

    cross = m(TextDecoder.cross_kv, memory)
    cache = m(TextDecoder.init_cache, 2, 16)

    prefix_len = 4
    emb = m(TextDecoder.embed, tokens)
    logits_prefill, cache = m(TextDecoder.prefill, emb[:, :prefix_len], cache, cross)
    np.testing.assert_allclose(
        np.asarray(logits_prefill),
        np.asarray(full_logits[:, prefix_len - 1]),
        rtol=1e-4,
        atol=1e-4,
    )

    for pos in range(prefix_len, 9):
        step_logits, cache = m(
            TextDecoder.step, emb[:, pos : pos + 1], jnp.int32(pos), cache, cross
        )
        np.testing.assert_allclose(
            np.asarray(step_logits),
            np.asarray(full_logits[:, pos]),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"pos={pos}",
        )


def test_vocab_expansion_preserves_original_rows():
    emb = np.random.default_rng(0).standard_normal((10, 4)).astype(np.float32)
    params = {"token_embedding": {"embedding": emb}}
    out = load.adapt_vocab(params, 14, load_origin_token_embedding=True)
    new = out["token_embedding"]["embedding"]
    assert new.shape == (14, 4)
    np.testing.assert_array_equal(new[:10], emb)

    out2 = load.adapt_vocab(params, 14, load_origin_token_embedding=False)
    assert out2["token_embedding"]["embedding"].shape == (14, 4)
    with pytest.raises(ValueError):
        load.adapt_vocab(params, 5, load_origin_token_embedding=True)


def test_large_v3_presets():
    """large-v3 family: 128 mel bins, 51866-token vocab (<|yue|> added),
    v3-turbo keeps the v3 encoder with a 4-layer decoder; the frontend and
    TS model thread n_mels from dims (a large-v3 model must see 128-bin
    features, not the default 80)."""
    from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram
    from robustsq_whisper_tpu.models.whisper.config import whisper_dims

    v3 = whisper_dims("large-v3")
    assert (v3.n_mels, v3.n_vocab, v3.n_text_layer) == (128, 51866, 32)
    turbo = whisper_dims("large-v3-turbo")
    assert (turbo.n_mels, turbo.n_text_layer) == (128, 4)
    assert whisper_dims("large-v2").n_mels == 80

    audio = jnp.zeros((1, 16000), jnp.float32)
    mel, _ = log_mel_spectrogram(audio, n_mels=v3.n_mels)
    assert mel.shape[1] == 128

    # the TS model's frontend follows dims.n_mels (tiny dims stand-in)
    from robustsq_whisper_tpu.models import TSASRModel, TSModelConfig, TSEncoderConfig

    dims = whisper_dims("dev").replace(n_mels=128)
    ts = TSEncoderConfig(num_query_tokens=2, num_hidden_layers=1,
                         qformer_hidden_size=64, qformer_heads=2,
                         qformer_intermediate_size=128)
    cfg = TSModelConfig(vocab_size=100, sos=1, eos=2, startofprev=3,
                        num_speakers=4, num_negatives=1)
    model = TSASRModel(dims, ts, cfg)
    samples = dims.n_audio_ctx * 2 * 160
    batch = {
        "speech": jnp.zeros((1, samples), jnp.float32),
        "speech_lens": jnp.full((1,), samples),
        "enroll": jnp.zeros((1, samples // 2), jnp.float32),
        "enroll_lens": jnp.full((1,), samples // 2),
        "text": jnp.asarray([[5, 6, -1, -1]]),
        "text_lens": jnp.asarray([2]),
        "neg_logits": jnp.zeros((1, 1), jnp.float32),
        "spk_labels": jnp.asarray([0]),
    }
    key = jax.random.PRNGKey(0)
    params = model.init(key, batch, key, 0, train=False)
    out, _, _, _ = model.apply(
        params, batch["speech"], batch["speech_lens"],
        batch["enroll"], batch["enroll_lens"], method=TSASRModel.encode,
    )
    assert out.shape[-1] == dims.n_audio_state
