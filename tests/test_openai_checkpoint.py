"""OpenAI-format checkpoint conversion end-to-end: synthesize a tiny .pt in
the exact layout ``whisper.load_model`` files use (the format the reference
loads, /root/reference/model/whisper_encoder.py:58), convert, and run both
stacks — plus the --pretrained warm-start path of the training CLI builder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.models import AudioEncoder, TSDecoder
from robustsq_whisper_tpu.models.whisper import WhisperDims, load

DIMS = WhisperDims(
    n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=2, n_text_ctx=24, n_text_state=32,
    n_text_head=2, n_text_layer=2,
)


def _make_openai_pt(path, dims: WhisperDims, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    sd = {}

    def w(name, *shape):
        sd[name] = torch.from_numpy(
            rng.standard_normal(shape).astype(np.float32) * 0.05
        )

    d = dims.n_audio_state
    w("encoder.conv1.weight", d, dims.n_mels, 3)
    w("encoder.conv1.bias", d)
    w("encoder.conv2.weight", d, d, 3)
    w("encoder.conv2.bias", d)
    w("encoder.positional_embedding", dims.n_audio_ctx, d)  # ignored (sinusoid)
    for i in range(dims.n_audio_layer):
        p = f"encoder.blocks.{i}"
        for mod in ("attn.query", "attn.value", "attn.out"):
            w(f"{p}.{mod}.weight", d, d)
            w(f"{p}.{mod}.bias", d)
        w(f"{p}.attn.key.weight", d, d)  # no bias, whisper convention
        w(f"{p}.attn_ln.weight", d)
        w(f"{p}.attn_ln.bias", d)
        w(f"{p}.mlp.0.weight", 4 * d, d)
        w(f"{p}.mlp.0.bias", 4 * d)
        w(f"{p}.mlp.2.weight", d, 4 * d)
        w(f"{p}.mlp.2.bias", d)
        w(f"{p}.mlp_ln.weight", d)
        w(f"{p}.mlp_ln.bias", d)
    w("encoder.ln_post.weight", d)
    w("encoder.ln_post.bias", d)

    td = dims.n_text_state
    w("decoder.token_embedding.weight", dims.n_vocab, td)
    w("decoder.positional_embedding", dims.n_text_ctx, td)
    for i in range(dims.n_text_layer):
        p = f"decoder.blocks.{i}"
        for attn in ("attn", "cross_attn"):
            for mod in ("query", "value", "out"):
                w(f"{p}.{attn}.{mod}.weight", td, td)
                w(f"{p}.{attn}.{mod}.bias", td)
            w(f"{p}.{attn}.key.weight", td, td)
            w(f"{p}.{attn}_ln.weight", td)
            w(f"{p}.{attn}_ln.bias", td)
        w(f"{p}.mlp.0.weight", 4 * td, td)
        w(f"{p}.mlp.0.bias", 4 * td)
        w(f"{p}.mlp.2.weight", td, 4 * td)
        w(f"{p}.mlp.2.bias", td)
        w(f"{p}.mlp_ln.weight", td)
        w(f"{p}.mlp_ln.bias", td)
    w("decoder.ln.weight", td)
    w("decoder.ln.bias", td)

    ckpt = {
        "dims": {
            "n_mels": dims.n_mels, "n_vocab": dims.n_vocab,
            "n_audio_ctx": dims.n_audio_ctx,
            "n_audio_state": dims.n_audio_state,
            "n_audio_head": dims.n_audio_head,
            "n_audio_layer": dims.n_audio_layer,
            "n_text_ctx": dims.n_text_ctx,
            "n_text_state": dims.n_text_state,
            "n_text_head": dims.n_text_head,
            "n_text_layer": dims.n_text_layer,
        },
        "model_state_dict": sd,
    }
    torch.save(ckpt, path)
    return sd


@pytest.mark.slow
def test_openai_pt_roundtrip(tmp_path):
    path = str(tmp_path / "dev.pt")
    sd = _make_openai_pt(path, DIMS)

    dims, enc_p, dec_p = load.load_openai_checkpoint(path)
    assert dims == DIMS

    # converted params drive the flax modules without re-init
    enc = AudioEncoder(dims)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 80, 2 * dims.n_audio_ctx)),
        jnp.float32,
    )
    out = enc.apply(
        {"params": enc_p, "buffers": AudioEncoder.make_buffers(dims)}, mel
    )
    assert out.shape == (2, dims.n_audio_ctx, dims.n_audio_state)
    assert np.all(np.isfinite(np.asarray(out)))

    # spot-check one converted kernel: flax kernel == torch weight^T
    k_flax = enc_p["block"]["attn"]["query"]["kernel"]  # (L, in, out)
    import torch

    np.testing.assert_allclose(
        np.asarray(k_flax[1]),
        sd["encoder.blocks.1.attn.query.weight"].numpy().T,
    )

    # decoder with vocab expansion (reference whisper_decoder.py:85-105)
    dec_p2 = load.adapt_vocab(dec_p, DIMS.n_vocab + 16)
    dec = TSDecoder(DIMS.replace(n_vocab=DIMS.n_vocab + 16), startofprev_token=9)
    memory = out
    ys = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    prompt = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 2, DIMS.n_text_state)),
        jnp.float32,
    )
    logits = dec.apply({"params": {"decoder": dec_p2}}, memory, ys, prompt)
    assert logits.shape == (2, 3, DIMS.n_vocab + 16)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_cli_pretrained_warm_start(tmp_path):
    """cli.train's --pretrained merge: backbone weights land in the TS model
    tree (encoder/encoder, decoder/decoder) with the heads fresh."""
    path = str(tmp_path / "dev.pt")
    _make_openai_pt(path, DIMS)

    from robustsq_whisper_tpu.cli.train import build_model_and_variables
    from robustsq_whisper_tpu.utils.config import experiment_from_dict

    exp = experiment_from_dict({
        "whisper_model": "dev",
        "encoder_conf": {
            "num_query_tokens": 2, "num_hidden_layers": 1,
            "qformer_hidden_size": 32, "qformer_heads": 2,
            "qformer_intermediate_size": 64,
        },
        "model_conf": {
            "vocab_size": 80, "sos": 1, "eos": 2, "startofprev": 3,
            "num_speakers": 8, "num_negatives": 2,
        },
        "compute_dtype": "float32",
    })
    # shrink dev dims to the synthetic checkpoint's dims
    exp.dims = DIMS
    from tests.test_train_step import _batch

    batch = {k: v for k, v in _batch(2).items()}
    # rebuild batch at this model's window size
    import jax.numpy as jnp2
    import numpy as np2

    samples = DIMS.n_audio_ctx * 2 * 160
    g = np2.random.default_rng(0)
    batch["speech"] = jnp2.asarray(g.standard_normal((2, samples)), jnp2.float32)
    batch["speech_lens"] = jnp2.full((2,), samples, jnp2.int32)
    batch["enroll"] = jnp2.asarray(
        g.standard_normal((2, samples // 2)), jnp2.float32
    )
    batch["enroll_lens"] = jnp2.full((2,), samples // 2, jnp2.int32)

    rng = jax.random.PRNGKey(0)
    model, variables = build_model_and_variables(
        exp, rng, pretrained=path, dev_batch=batch
    )
    # pretrained conv kernel made it into the tree
    import torch

    ckpt = torch.load(path, weights_only=False)
    np.testing.assert_allclose(
        np.asarray(
            variables["params"]["encoder"]["encoder"]["conv1"]["kernel"]
        ),
        ckpt["model_state_dict"]["encoder.conv1.weight"].numpy().transpose(2, 1, 0),
    )
    # model still runs end-to-end with the merged tree
    loss, stats = model.apply(variables, batch, rng, 0, train=False)
    assert np.isfinite(float(loss))
