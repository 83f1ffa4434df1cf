"""End-to-end transcript parity: flax encode->greedy-decode vs HF generate.

The module-level golden tests (test_whisper_modules.py) check per-module
closeness; this harness checks the FULL pipeline — encoder, KV-cache greedy
loop, stop handling — produces token-for-token identical transcripts to
HuggingFace ``WhisperForConditionalGeneration.generate`` on shared random
weights. This is the strongest weights-less proxy for the "WER within 0.1 of
the reference" north star (BASELINE.json): identical tokens on shared weights
implies identical WER on any dataset. The protocol for running the real-data
WER comparison once weights/data are present is documented in
docs/WER_PROTOCOL.md.

Reference parity target: /root/reference/model/whisper_decoder.py:134-226
(forward + scoring used by ESPnet beam search at inference).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from robustsq_whisper_tpu.decode.search import (
    DecodeConfig,
    build_greedy_decoder,
    strip_eot,
)
from robustsq_whisper_tpu.models.ts_decoder import TSDecoder
from robustsq_whisper_tpu.models.whisper import (
    AudioEncoder,
    WhisperDims,
    load,
    sinusoids,
)

DIMS = WhisperDims(
    n_mels=80, n_vocab=100, n_audio_ctx=50, n_audio_state=64,
    n_audio_head=2, n_audio_layer=2, n_text_ctx=40, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)
SOT, EOT = 1, 2
MAX_NEW = 24


@pytest.fixture(scope="module")
def hf_gen_model():
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(7)
    cfg = WhisperConfig(
        vocab_size=DIMS.n_vocab,
        num_mel_bins=DIMS.n_mels,
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
        bos_token_id=SOT,
        eos_token_id=EOT,
        decoder_start_token_id=SOT,
        # kill Whisper-vocab-specific logits processors: the ids they
        # suppress don't exist in this 100-token vocab
        suppress_tokens=None,
        begin_suppress_tokens=None,
        forced_decoder_ids=None,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    for attr in ("suppress_tokens", "begin_suppress_tokens", "forced_decoder_ids"):
        setattr(model.generation_config, attr, None)
    with torch.no_grad():
        model.model.encoder.embed_positions.weight.copy_(
            torch.from_numpy(sinusoids(DIMS.n_audio_ctx, DIMS.n_audio_state))
        )
    return model


def _flax_stack(hf_gen_model):
    sd = hf_gen_model.model.state_dict()
    enc_params = load.encoder_params_from_hf(sd, DIMS.n_audio_layer)
    dec_params = load.decoder_params_from_hf(sd, DIMS.n_text_layer)
    enc = AudioEncoder(DIMS)
    enc_vars = {"params": enc_params, "buffers": AudioEncoder.make_buffers(DIMS)}
    dec = TSDecoder(DIMS, use_spk_prompt=False)
    dec_vars = {"params": {"decoder": dec_params}}
    return enc, enc_vars, dec, dec_vars


def test_greedy_transcripts_match_hf_generate(hf_gen_model):
    """Token-for-token equality of full encode->greedy-decode vs HF
    ``generate`` (greedy, shared weights), over a batch of random mels."""
    import torch

    enc, enc_vars, dec, dec_vars = _flax_stack(hf_gen_model)

    rng = np.random.default_rng(11)
    mel = rng.standard_normal((3, DIMS.n_mels, 2 * DIMS.n_audio_ctx)).astype(
        np.float32
    )

    with torch.no_grad():
        hf_tokens = hf_gen_model.generate(
            input_features=torch.from_numpy(mel),
            do_sample=False,
            num_beams=1,
            max_new_tokens=MAX_NEW,
        ).numpy()

    memory = enc.apply(enc_vars, jnp.asarray(mel))
    dcfg = DecodeConfig(
        max_new_tokens=MAX_NEW, eot=EOT, init_tokens=(SOT,), beam_size=1
    )
    run = build_greedy_decoder(dec, dec_vars, dcfg)
    prompt = jnp.zeros((mel.shape[0], 0, DIMS.n_text_state), jnp.float32)
    tokens, _ = run(memory, prompt)
    ours = strip_eot(np.asarray(tokens), EOT)

    for i in range(mel.shape[0]):
        hf_row = [int(t) for t in hf_tokens[i]]
        # transformers >= 4.46 strips the decoder_start token from Whisper
        # generate() output; older versions include it. Handle both.
        if hf_row and hf_row[0] == SOT:
            hf_row = hf_row[1:]
        if EOT in hf_row:
            hf_row = hf_row[: hf_row.index(EOT)]
        assert ours[i] == hf_row, (
            f"utt {i}: flax={ours[i]} hf={hf_row}"
        )
    # sanity: at least one row decodes a non-trivial sequence so the test
    # can't silently pass on all-empty transcripts
    assert any(len(r) >= 3 for r in ours)


def test_greedy_scores_match_hf(hf_gen_model):
    """Summed greedy log-probs agree with HF's per-step scores."""
    import torch

    enc, enc_vars, dec, dec_vars = _flax_stack(hf_gen_model)
    rng = np.random.default_rng(12)
    mel = rng.standard_normal((2, DIMS.n_mels, 2 * DIMS.n_audio_ctx)).astype(
        np.float32
    )
    with torch.no_grad():
        out = hf_gen_model.generate(
            input_features=torch.from_numpy(mel),
            do_sample=False,
            num_beams=1,
            max_new_tokens=MAX_NEW,
            output_scores=True,
            return_dict_in_generate=True,
        )
    hf_tokens = out.sequences.numpy()
    # offset of the first GENERATED token in sequences (see note above about
    # transformers stripping the decoder_start token for Whisper)
    off = 1 if int(hf_tokens[0, 0]) == SOT else 0

    memory = enc.apply(enc_vars, jnp.asarray(mel))
    dcfg = DecodeConfig(
        max_new_tokens=MAX_NEW, eot=EOT, init_tokens=(SOT,), beam_size=1
    )
    run = build_greedy_decoder(dec, dec_vars, dcfg)
    prompt = jnp.zeros((mel.shape[0], 0, DIMS.n_text_state), jnp.float32)
    _, scores = run(memory, prompt)

    for i in range(mel.shape[0]):
        want = 0.0
        for t, step_scores in enumerate(out.scores):
            tok = int(hf_tokens[i, t + off])
            logp = torch.log_softmax(step_scores[i], dim=-1)[tok].item()
            want += logp
            if tok == EOT:
                break
        np.testing.assert_allclose(float(scores[i]), want, rtol=1e-3, atol=1e-3)


def test_greedy_transcripts_match_hf_generate_v3_layout():
    """Same token-for-token parity with the large-v3 FAMILY layout: 128 mel
    bins through the conv stem (the v3 frontend change,
    models/whisper/config.py large-v3 preset). Guards the 128-mel weight
    mapping end-to-end, not just per-module."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    dims = WhisperDims(
        n_mels=128, n_vocab=100, n_audio_ctx=50, n_audio_state=64,
        n_audio_head=2, n_audio_layer=2, n_text_ctx=40, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    torch.manual_seed(9)
    cfg = WhisperConfig(
        vocab_size=dims.n_vocab, num_mel_bins=dims.n_mels,
        d_model=dims.n_audio_state, encoder_layers=dims.n_audio_layer,
        encoder_attention_heads=dims.n_audio_head,
        decoder_layers=dims.n_text_layer,
        decoder_attention_heads=dims.n_text_head,
        encoder_ffn_dim=4 * dims.n_audio_state,
        decoder_ffn_dim=4 * dims.n_text_state,
        max_source_positions=dims.n_audio_ctx,
        max_target_positions=dims.n_text_ctx,
        activation_function="gelu", scale_embedding=False,
        pad_token_id=0, bos_token_id=SOT, eos_token_id=EOT,
        decoder_start_token_id=SOT, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    for attr in ("suppress_tokens", "begin_suppress_tokens", "forced_decoder_ids"):
        setattr(model.generation_config, attr, None)
    with torch.no_grad():
        model.model.encoder.embed_positions.weight.copy_(
            torch.from_numpy(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
        )

    sd = model.model.state_dict()
    enc = AudioEncoder(dims)
    enc_vars = {
        "params": load.encoder_params_from_hf(sd, dims.n_audio_layer),
        "buffers": AudioEncoder.make_buffers(dims),
    }
    dec = TSDecoder(dims, use_spk_prompt=False)
    dec_vars = {"params": {"decoder": load.decoder_params_from_hf(sd, dims.n_text_layer)}}

    rng = np.random.default_rng(13)
    mel = rng.standard_normal((2, dims.n_mels, 2 * dims.n_audio_ctx)).astype(
        np.float32
    )
    with torch.no_grad():
        hf_tokens = model.generate(
            input_features=torch.from_numpy(mel),
            do_sample=False, num_beams=1, max_new_tokens=MAX_NEW,
        ).numpy()

    memory = enc.apply(enc_vars, jnp.asarray(mel))
    run = build_greedy_decoder(
        dec, dec_vars,
        DecodeConfig(max_new_tokens=MAX_NEW, eot=EOT, init_tokens=(SOT,)),
    )
    prompt = jnp.zeros((mel.shape[0], 0, dims.n_text_state), jnp.float32)
    tokens, _ = run(memory, prompt)
    ours = strip_eot(np.asarray(tokens), EOT)
    for i in range(mel.shape[0]):
        hf_row = [int(t) for t in hf_tokens[i]]
        if hf_row and hf_row[0] == SOT:
            hf_row = hf_row[1:]
        if EOT in hf_row:
            hf_row = hf_row[: hf_row.index(EOT)]
        assert ours[i] == hf_row, f"utt {i}: flax={ours[i]} hf={hf_row}"
    assert any(len(r) >= 3 for r in ours)
