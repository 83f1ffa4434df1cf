"""Regression tests for the round-1 code-review findings: frozen-backbone
raw-grad leak, LoRA skipping scan-stacked kernels, LoRA-unmerged decode,
enrollment self-leak, noisy_-prefix speaker parsing, checkpoint step
collision, beam length-penalty lineage lengths."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.data import collate, kaldi_io, simulate
from robustsq_whisper_tpu.train.lora import LoraConfig, init_lora, merge_lora
from robustsq_whisper_tpu.train.optim import OptimConfig
from robustsq_whisper_tpu.train.step import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

from tests.test_pipeline import _make_clean_dir
from tests.test_train_step import CFG, DIMS, TS, _batch, _model


@pytest.fixture(scope="module")
def model_and_vars():
    model = _model()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, batch, rng, 0, train=False)
    return model, variables, batch


def test_frozen_backbone_freezes_backbone(model_and_vars):
    """One frozen_backbone step must leave every backbone param bit-identical
    (the optax.masked pass-through bug applied RAW gradients to them)."""
    model, variables, batch = model_and_vars
    rng = jax.random.PRNGKey(1)
    tcfg = TrainConfig(
        mode="frozen_backbone", optim=OptimConfig(lr=1e-2, schedule="constant")
    )
    state, tx = create_train_state(rng, variables, tcfg)
    step = make_train_step(model, tx, tcfg, donate=False)
    before = jax.device_get(state.params)
    state, stats = step(state, batch, rng, 0)
    after = jax.device_get(state.params)
    assert np.isfinite(float(stats["loss"]))

    flat_b, _ = jax.tree_util.tree_flatten_with_path(before)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(after)
    changed_backbone, changed_head = [], []
    for (kp, vb), (_, va) in zip(flat_b, flat_a):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        moved = not np.array_equal(np.asarray(vb), np.asarray(va))
        if "encoder/encoder/block" in path or "decoder/decoder/block" in path:
            if moved:
                changed_backbone.append(path)
        elif moved:
            changed_head.append(path)
    assert not changed_backbone, changed_backbone[:5]
    assert changed_head, "trainable heads must update"


def test_lora_covers_scan_stacked_kernels(model_and_vars):
    """init_lora must adapt the scan-stacked (layers, in, out) Whisper q/k/v/o
    kernels, not just the Qformer's 2-D ones."""
    _, variables, _ = model_and_vars
    lora = init_lora(jax.random.PRNGKey(0), variables["params"], LoraConfig(rank=2))
    whisper_targets = [p for p in lora if "/block/" in p]
    assert whisper_targets, sorted(lora)[:10]
    # encoder attn + decoder self/cross attn q/k/v/out
    assert any("encoder/encoder/block/attn/query" in p for p in lora)
    assert any("decoder/decoder/block/cross_attn/out" in p for p in lora)
    for p in whisper_targets:
        assert lora[p]["a"].ndim == 3  # (layers, in, rank)

    # merge at init is identity, including the stacked leaves
    merged = merge_lora(variables["params"], lora, LoraConfig(rank=2))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], merged,
    )
    # and a perturbed B produces a change exactly at the adapted kernels
    key = whisper_targets[0]
    lora[key]["b"] = lora[key]["b"] + 0.1
    merged2 = merge_lora(variables["params"], lora, LoraConfig(rank=2))
    flat0, _ = jax.tree_util.tree_flatten_with_path(variables["params"])
    flat2, _ = jax.tree_util.tree_flatten_with_path(merged2)
    diffs = [
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for (kp, v0), (_, v2) in zip(flat0, flat2)
        if not np.allclose(np.asarray(v0), np.asarray(v2))
    ]
    assert diffs == [key]


def test_enrollment_never_leaks_source_utterance(tmp_path):
    """Lazy rows must reference the SOURCE utt and resolution must exclude
    it — enrollment == target source audio is a train-time leak."""
    src = _make_clean_dir(tmp_path)
    out = str(tmp_path / "mix")
    simulate.generate_overlap_enrollment(
        src, out, simulate.OverlapConfig(num_mixtures=6, seed=3)
    )
    enroll = kaldi_io.read_scp(os.path.join(out, "enroll.scp"))
    pool = kaldi_io.read_spk2enroll(os.path.join(out, "spk2enroll.json"))
    rng = np.random.default_rng(0)
    for row_id, value in enroll.items():
        src_utt, spk = kaldi_io.parse_lazy_enrollment(value)
        assert "_spk" not in src_utt  # source utt id, not the mixture row id
        assert src_utt in dict(pool[spk])
        for _ in range(8):
            path = kaldi_io.resolve_enrollment(
                value, pool, rng, exclude_utt=row_id
            )
            assert os.path.basename(path) != f"{src_utt}.wav"


def test_noisy_prefix_speaker_parse():
    assert collate.parse_speaker("noisy_100-1-0_200-2-0_spk1") == "100"
    assert collate.parse_speaker("noisy_100-1-0_200-2-0_spk2") == "200"
    labels = collate.speaker_labels(
        ["noisy_100-1_200-2_spk1", "noisy_200-2_100-1_spk2"]
    )
    np.testing.assert_array_equal(labels, [0, 0])  # both target spk 100


def test_checkpoint_step_collision(tmp_path, model_and_vars):
    """Epoch-end save landing on a mid-loop-saved step must overwrite, not
    crash (orbax rejects duplicate steps)."""
    from robustsq_whisper_tpu.train.loop import LoopConfig, run_training

    model, variables, batch = model_and_vars

    class OneBatchDataset:
        def batches(self, batch_size, shuffle=True, drop_last=True):
            yield dict(batch)

    lcfg = LoopConfig(
        num_epochs=1, batch_size=4, log_every=100,
        ckpt_every_steps=1,  # fires at step 1 == the epoch's last step
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    tcfg = TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant"))
    state = run_training(
        model, OneBatchDataset(), variables, tcfg, lcfg,
        rng=jax.random.PRNGKey(0),
    )
    assert int(state.step) == 1
    from robustsq_whisper_tpu.train.checkpoint import restore_checkpoint

    _, epoch, _ = restore_checkpoint(str(tmp_path / "ckpt"), state)
    assert epoch == 1  # epoch-end metadata won


def test_beam_length_penalty_smoke():
    """Length-penalized beam search runs and normalizes by lineage lengths."""
    from robustsq_whisper_tpu.decode.search import (
        DecodeConfig,
        build_beam_decoder,
    )
    from robustsq_whisper_tpu.models import TSDecoder, WhisperDims

    dims = WhisperDims(
        n_mels=80, n_vocab=20, n_audio_ctx=8, n_audio_state=16,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=32, n_text_state=16,
        n_text_head=2, n_text_layer=1,
    )
    dec = TSDecoder(dims, startofprev_token=3)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 16)), jnp.float32)
    variables = dec.init(
        jax.random.PRNGKey(0), memory, jnp.zeros((2, 2), jnp.int32), prompt
    )
    cfg = DecodeConfig(
        max_new_tokens=6, eot=2, init_tokens=(1,), beam_size=3,
        length_penalty=0.6,
    )
    toks, scores = build_beam_decoder(dec, variables, cfg)(memory, prompt)
    assert toks.shape == (2, 6)
    assert np.all(np.isfinite(np.asarray(scores)))
