"""Embedding-enrollment path end-to-end (asr_my.sh --enroll_type embedding).

The reference's TgtSpkWhisperEncoder consumes a PRECOMPUTED speaker embedding
(stage-103 resnet.scp rows, /root/reference/datapre/
extract_reset_embedding_onnx.py:90-146) injected at encoder block 0 via
cat/additive/film/cln adapters (/root/reference/model/whisper_encoder.py:
195-389). These tests drive that capability end-to-end in this framework:
config-selected SpkAdapterTSEncoder inside TSASRModel, resnet.scp consumption
through KaldiTSDataset/collate, CLN initialization from the pretrained
block-0 layernorms, training descent for every adapter variant, and a full
stage-103 -> train -> decode loop.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.data import kaldi_io, simulate
from robustsq_whisper_tpu.data.dataset import KaldiTSDataset
from robustsq_whisper_tpu.decode.pipeline import decode_dataset
from robustsq_whisper_tpu.decode.search import DecodeConfig
from robustsq_whisper_tpu.models import (
    TSASRModel,
    TSDecoder,
    TSEncoderConfig,
    TSModelConfig,
    WhisperDims,
)
from robustsq_whisper_tpu.models.ts_encoder import SpkAdapterTSEncoder
from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import ByteTokenizer
from robustsq_whisper_tpu.train.optim import OptimConfig
from robustsq_whisper_tpu.train.step import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

from tests.test_pipeline import _make_clean_dir

SR = 16000
EMB = 16

DIMS = WhisperDims(
    n_mels=80, n_vocab=300, n_audio_ctx=32, n_audio_state=32,
    n_audio_head=2, n_audio_layer=2, n_text_ctx=64, n_text_state=32,
    n_text_head=2, n_text_layer=1,
)
CFG = TSModelConfig(
    vocab_size=300, sos=257, eos=258, startofprev=259, num_speakers=8,
    num_negatives=2, ctc_weight=0.3,
)


def _ts(method: str) -> TSEncoderConfig:
    return TSEncoderConfig(
        enroll_type="embedding", enroll_size=EMB, adapter_method=method
    )


def _batch(rng, b=2, text_len=8):
    n_samples = DIMS.n_audio_ctx * 2 * 160  # mel frames -> conv2 halves
    return {
        "speech": jnp.asarray(
            rng.standard_normal((b, n_samples)), jnp.float32
        ) * 0.1,
        "speech_lens": jnp.full((b,), n_samples, jnp.int32),
        "enroll_embed": jnp.asarray(
            rng.standard_normal((b, EMB)), jnp.float32
        ),
        "text": jnp.asarray(
            rng.integers(1, 250, (b, text_len)), jnp.int32
        ),
        "text_lens": jnp.full((b,), text_len, jnp.int32),
        "neg_logits": jnp.ones((b, b), jnp.float32),
        "spk_labels": jnp.zeros((b,), jnp.int32),
    }


# ---------------- model-level ----------------


@pytest.mark.parametrize("method", ["cat", "additive", "film", "cln"])
def test_model_forward_embedding(method):
    rng = np.random.default_rng(0)
    model = TSASRModel(DIMS, _ts(method), CFG)
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, batch, key, 0, train=False)
    loss, stats = model.apply(variables, batch, key, 0, train=True)
    assert np.isfinite(float(loss)), method
    # speaker losses do not exist on this path (no spk_prompt to contrast)
    assert "loss_con" not in stats and "loss_aam" not in stats
    assert {"loss", "loss_att", "loss_ctc", "acc"} <= set(stats)
    # the embedding must influence the loss through the adapter
    batch2 = dict(batch)
    batch2["enroll_embed"] = batch["enroll_embed"] + 1.0
    if method == "cln":  # zero-init delta heads: perturb to activate
        p = jax.device_get(variables)
        p["params"]["encoder"]["attn_cln"]["delta_scale"]["kernel"] = (
            p["params"]["encoder"]["attn_cln"]["delta_scale"]["kernel"] + 0.05
        )
        variables = p
        loss, _ = model.apply(variables, batch, key, 0, train=True)
    loss2, _ = model.apply(variables, batch2, key, 0, train=True)
    assert not np.isclose(float(loss), float(loss2)), method


@pytest.mark.parametrize("method", ["cat", "cln"])
def test_loss_descends_embedding(method):
    rng = np.random.default_rng(1)
    model = TSASRModel(DIMS, _ts(method), CFG)
    batch = _batch(rng, b=2)
    key = jax.random.PRNGKey(1)
    variables = model.init(key, batch, key, 0, train=False)
    tcfg = TrainConfig(optim=OptimConfig(lr=3e-3, schedule="constant"))
    state, tx = create_train_state(key, variables, tcfg)
    step = make_train_step(model, tx, tcfg, donate=False)
    losses = []
    for i in range(8):
        state, stats = step(state, batch, jax.random.fold_in(key, i), 0)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0], (method, losses)


def test_embedding_mode_rejects_bad_type():
    with pytest.raises(ValueError, match="enroll_type"):
        model = TSASRModel(
            DIMS, dataclasses.replace(_ts("cat"), enroll_type="nope"), CFG
        )
        rng = jax.random.PRNGKey(0)
        model.init(rng, _batch(np.random.default_rng(0)), rng, 0, train=False)


# ---------------- dataset / collate ----------------


def _write_embeddings(data_dir, out_dir, keys, rng, dim=EMB):
    os.makedirs(out_dir, exist_ok=True)
    scp = {}
    for k in keys:
        p = os.path.join(out_dir, f"{k}.npy")
        np.save(p, rng.standard_normal(dim).astype(np.float32))
        scp[k] = p
    kaldi_io.write_scp(os.path.join(data_dir, "resnet.scp"), scp)
    return scp


def test_dataset_embedding_lazy_rows(tmp_path):
    """Train mode: lazy enroll rows resolve to a same-speaker enrollment utt
    whose id keys resnet.scp (reference is_train extraction over the
    spk2enroll pool)."""
    src = _make_clean_dir(tmp_path, n_speakers=4, utts_per_spk=2)
    data_dir = str(tmp_path / "mix")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=4, seed=0)
    )
    s2e = kaldi_io.read_spk2enroll(os.path.join(data_dir, "spk2enroll.json"))
    pool_utts = [u for pairs in s2e.values() for u, _ in pairs]
    rng = np.random.default_rng(0)
    _write_embeddings(data_dir, str(tmp_path / "emb"), pool_utts, rng)

    ds = KaldiTSDataset(
        data_dir, ByteTokenizer(), speech_seconds=1.0, enroll_seconds=0.5,
        text_len=16, enroll_type="embedding",
    )
    batch = next(ds.batches(4, shuffle=False))
    assert batch["enroll_embed"].shape == (4, EMB)
    assert batch["enroll_embed"].dtype == np.float32
    assert "enroll" not in batch and "enroll_lens" not in batch
    # embeddings come from the written pool (row-identical to some npy)
    scp = kaldi_io.read_scp(os.path.join(data_dir, "resnet.scp"))
    all_embs = np.stack([np.load(p) for p in scp.values()])
    for row in batch["enroll_embed"]:
        assert np.isclose(all_embs, row[None], atol=0).all(axis=1).any()


def test_dataset_embedding_direct_keys(tmp_path):
    """Eval mode: resnet.scp keyed by the mixture utt (concrete enroll.scp
    rows) is looked up directly."""
    src = _make_clean_dir(tmp_path, n_speakers=2, utts_per_spk=2)
    data_dir = str(tmp_path / "mix")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=2, seed=1)
    )
    # overwrite enroll.scp with concrete rows + key resnet.scp by mixture utt
    wav = kaldi_io.read_scp(os.path.join(data_dir, "wav.scp"))
    utts = sorted(wav)
    kaldi_io.write_scp(
        os.path.join(data_dir, "enroll.scp"),
        {u: wav[u].split()[0] for u in utts},
    )
    rng = np.random.default_rng(1)
    scp = _write_embeddings(data_dir, str(tmp_path / "emb"), utts, rng)
    ds = KaldiTSDataset(
        data_dir, ByteTokenizer(), speech_seconds=1.0, enroll_seconds=0.5,
        text_len=16, enroll_type="embedding",
    )
    batch = next(ds.batches(len(utts), shuffle=False))
    for i, u in enumerate(batch["utt_ids"]):
        np.testing.assert_array_equal(
            batch["enroll_embed"][i], np.load(scp[u])
        )


def test_dataset_embedding_requires_scp(tmp_path):
    src = _make_clean_dir(tmp_path, n_speakers=2, utts_per_spk=1)
    with pytest.raises(FileNotFoundError, match="resnet.scp"):
        KaldiTSDataset(src, ByteTokenizer(), enroll_type="embedding")


# ---------------- CLN init from pretrained ----------------


def test_cln_init_from_pretrained(tmp_path):
    """The conditional layernorm starts as the pretrained block-0 layernorm
    (reference whisper_encoder.py:234-253: init_weight/init_bias from
    attn_ln/mlp_ln)."""
    torch = pytest.importorskip("torch")
    from robustsq_whisper_tpu.cli.train import build_model_and_variables
    from robustsq_whisper_tpu.utils.config import ExperimentConfig

    # synthesize a tiny OpenAI-format checkpoint
    d = DIMS
    sd = {}
    sd["encoder.conv1.weight"] = torch.randn(d.n_audio_state, d.n_mels, 3)
    sd["encoder.conv1.bias"] = torch.randn(d.n_audio_state)
    sd["encoder.conv2.weight"] = torch.randn(
        d.n_audio_state, d.n_audio_state, 3
    )
    sd["encoder.conv2.bias"] = torch.randn(d.n_audio_state)
    sd["encoder.ln_post.weight"] = torch.randn(d.n_audio_state)
    sd["encoder.ln_post.bias"] = torch.randn(d.n_audio_state)
    for i in range(d.n_audio_layer):
        p = f"encoder.blocks.{i}"
        for ln in ("attn_ln", "mlp_ln"):
            sd[f"{p}.{ln}.weight"] = torch.randn(d.n_audio_state)
            sd[f"{p}.{ln}.bias"] = torch.randn(d.n_audio_state)
        for nm, bias in (
            ("query", True), ("key", False), ("value", True), ("out", True)
        ):
            sd[f"{p}.attn.{nm}.weight"] = torch.randn(
                d.n_audio_state, d.n_audio_state
            )
            if bias:
                sd[f"{p}.attn.{nm}.bias"] = torch.randn(d.n_audio_state)
        sd[f"{p}.mlp.0.weight"] = torch.randn(
            4 * d.n_audio_state, d.n_audio_state
        )
        sd[f"{p}.mlp.0.bias"] = torch.randn(4 * d.n_audio_state)
        sd[f"{p}.mlp.2.weight"] = torch.randn(
            d.n_audio_state, 4 * d.n_audio_state
        )
        sd[f"{p}.mlp.2.bias"] = torch.randn(d.n_audio_state)
    sd["decoder.token_embedding.weight"] = torch.randn(
        d.n_vocab, d.n_text_state
    )
    sd["decoder.positional_embedding"] = torch.randn(
        d.n_text_ctx, d.n_text_state
    )
    sd["decoder.ln.weight"] = torch.randn(d.n_text_state)
    sd["decoder.ln.bias"] = torch.randn(d.n_text_state)
    for i in range(d.n_text_layer):
        p = f"decoder.blocks.{i}"
        for ln in ("attn_ln", "cross_attn_ln", "mlp_ln"):
            sd[f"{p}.{ln}.weight"] = torch.randn(d.n_text_state)
            sd[f"{p}.{ln}.bias"] = torch.randn(d.n_text_state)
        for att in ("attn", "cross_attn"):
            for nm, bias in (
                ("query", True), ("key", False), ("value", True),
                ("out", True),
            ):
                sd[f"{p}.{att}.{nm}.weight"] = torch.randn(
                    d.n_text_state, d.n_text_state
                )
                if bias:
                    sd[f"{p}.{att}.{nm}.bias"] = torch.randn(d.n_text_state)
        sd[f"{p}.mlp.0.weight"] = torch.randn(
            4 * d.n_text_state, d.n_text_state
        )
        sd[f"{p}.mlp.0.bias"] = torch.randn(4 * d.n_text_state)
        sd[f"{p}.mlp.2.weight"] = torch.randn(
            d.n_text_state, 4 * d.n_text_state
        )
        sd[f"{p}.mlp.2.bias"] = torch.randn(d.n_text_state)
    ckpt = str(tmp_path / "tiny.pt")
    torch.save({"dims": dataclasses.asdict(d), "model_state_dict": sd}, ckpt)

    exp = ExperimentConfig(
        dims=d, ts=_ts("cln"), model=CFG, compute_dtype="float32"
    )
    rng = jax.random.PRNGKey(0)
    batch = _batch(np.random.default_rng(2))
    model, variables = build_model_and_variables(
        exp, rng, pretrained=ckpt, dev_batch=batch
    )
    enc = variables["params"]["encoder"]
    np.testing.assert_allclose(
        np.asarray(enc["attn_cln"]["scale"]),
        sd["encoder.blocks.0.attn_ln.weight"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(enc["mlp_cln"]["bias"]),
        sd["encoder.blocks.0.mlp_ln.bias"].numpy(),
        rtol=1e-6,
    )
    # delta heads start at zero -> CLN == pretrained LN at init
    assert np.all(
        np.asarray(enc["attn_cln"]["delta_scale"]["kernel"]) == 0.0
    )
    # pretrained backbone is installed unrolled (blocks_{i}, no scan stack)
    assert "blocks_0" in enc["encoder"] and "block" not in enc["encoder"]
    # and the whole model still runs
    loss, _ = model.apply(variables, batch, rng, 0, train=True)
    assert np.isfinite(float(loss))


# ---------------- end-to-end: stage 103 -> train -> decode ----------------


@pytest.mark.slow
def test_e2e_embedding_enrollment(tmp_path):
    """stage 101 (simulate) -> stage 103 (embedding extraction via the JAX
    ResNet34, random init) -> resnet.scp -> train smoke -> greedy decode."""
    from robustsq_whisper_tpu.models.speaker_resnet import (
        extract_embeddings_for_dir,
    )
    from robustsq_whisper_tpu.train.loop import LoopConfig, run_training

    src = _make_clean_dir(tmp_path, n_speakers=4, utts_per_spk=2)
    data_dir = str(tmp_path / "mix")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=4, seed=0)
    )
    # stage 103: spk2enroll.json present -> train-mode extraction over the
    # enrollment pool (reference --is_train True)
    stats = extract_embeddings_for_dir(
        data_dir, str(tmp_path / "emb"), onnx_model=None, batch_size=4,
        max_seconds=1.0, embed_dim=EMB,
    )
    assert os.path.isfile(os.path.join(data_dir, "resnet.scp"))
    s2e = kaldi_io.read_spk2enroll(os.path.join(data_dir, "spk2enroll.json"))
    assert stats["num_utts"] == sum(len(v) for v in s2e.values())

    tok = ByteTokenizer()
    speech_sec = (DIMS.n_audio_ctx * 2 * 160) / SR
    ds = KaldiTSDataset(
        data_dir, tok, speech_seconds=speech_sec, enroll_seconds=0.5,
        text_len=32, enroll_type="embedding",
    )
    ts = _ts("additive")
    model = TSASRModel(DIMS, ts, CFG)
    rng = jax.random.PRNGKey(0)
    first = next(ds.batches(4, shuffle=False))
    first.pop("utt_ids")
    variables = model.init(rng, first, rng, 0, train=False)
    tcfg = TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant"))
    lcfg = LoopConfig(
        num_epochs=2, batch_size=4, log_every=2, ckpt_every_steps=0,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    state = run_training(model, ds, variables, tcfg, lcfg, rng=rng)
    assert int(state.step) == 2 * (8 // 4)

    # decode through the shared pipeline (prompt-free decoder)
    encoder = SpkAdapterTSEncoder.from_config(DIMS, ts)
    decoder = TSDecoder(
        DIMS.replace(n_vocab=300), startofprev_token=259,
        use_spk_prompt=False,
    )
    enc_vars = {
        "params": state.params["encoder"],
        "buffers": state.buffers["buffers"]["encoder"]
        if "buffers" in state.buffers
        else state.buffers["encoder"],
    }
    dec_vars = {"params": state.params["decoder"]}
    dcfg = DecodeConfig(max_new_tokens=6, eot=258, init_tokens=(257,))
    result = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, ds, tok, dcfg, batch_size=4,
        output_dir=str(tmp_path / "decode"),
    )
    assert len(result.hyps) == len(ds)
    assert os.path.isfile(str(tmp_path / "decode" / "text"))
    assert "wer" in result.metrics
