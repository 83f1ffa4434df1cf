"""Validation / n-best / checkpoint-averaging tests (the trainer half the
reference delegates to ESPnet: --valid_set, valid.acc n-best, valid.acc.ave).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.train.checkpoint import (
    latest_step,
    prune_checkpoints,
    save_checkpoint,
)
from robustsq_whisper_tpu.train.eval import (
    NBestTracker,
    average_checkpoints,
    evaluate,
    make_eval_step,
    write_averaged_checkpoint,
)
from robustsq_whisper_tpu.train.optim import OptimConfig
from robustsq_whisper_tpu.train.step import TrainConfig, create_train_state

from tests.test_train_step import _batch, _model


@pytest.fixture(scope="module")
def tiny_state():
    model = _model()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, batch, rng, 0, train=False)
    tcfg = TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant"))
    state, _ = create_train_state(rng, params, tcfg)
    return model, state, tcfg, batch


def test_nbest_tracker_orders_and_persists(tmp_path):
    t = NBestTracker(str(tmp_path), nbest=2, metric="acc", mode="max")
    assert t.update(10, 0, 0.5) is True
    assert t.update(20, 1, 0.7) is True  # new best
    assert t.update(30, 2, 0.6) is False
    assert t.steps() == [20, 30]  # best-first, n=2 kept
    assert t.best().step == 20
    assert t.epochs_since_best(4) == 3
    # persisted and reloadable
    t2 = NBestTracker(str(tmp_path), nbest=2)
    assert t2.steps() == [20, 30]
    d = json.load(open(os.path.join(str(tmp_path), "nbest.json")))
    assert d["mode"] == "max"


def test_nbest_tracker_min_mode(tmp_path):
    t = NBestTracker(str(tmp_path), nbest=3, metric="loss", mode="min")
    t.update(1, 0, 5.0)
    t.update(2, 1, 3.0)
    t.update(3, 2, 4.0)
    assert t.steps() == [2, 3, 1]
    assert t.best().metric == 3.0


def test_evaluate_is_deterministic_and_weighted(tiny_state):
    """train=False eval: same stats on repeat calls (dropout/specaug off)."""
    model, state, tcfg, batch = tiny_state

    class TwoBatches:
        def batches(self, batch_size, shuffle=True, drop_last=True):
            yield dict(batch)
            yield dict(batch)

    es = make_eval_step(model)
    rng = jax.random.PRNGKey(1)
    s1 = evaluate(es, state, tcfg, TwoBatches(), 4, 0, rng)
    # same key -> bitwise-identical stats (dropout/specaug off at eval)
    s2 = evaluate(es, state, tcfg, TwoBatches(), 4, 0, rng)
    assert "acc" in s1 and "loss" in s1
    for k in s1:
        np.testing.assert_allclose(s1[k], s2[k], rtol=1e-6, err_msg=k)
    # the model-selection metric (attention acc) is rng-independent; only
    # the contrastive negatives are sampled at eval (reference-faithful)
    s3 = evaluate(es, state, tcfg, TwoBatches(), 4, 0, jax.random.PRNGKey(2))
    np.testing.assert_allclose(s1["acc"], s3["acc"], rtol=1e-6)
    np.testing.assert_allclose(s1["loss_att"], s3["loss_att"], rtol=1e-6)


def test_average_checkpoints_is_param_mean(tmp_path, tiny_state):
    model, state, tcfg, _ = tiny_state
    rng = jax.random.PRNGKey(0)
    ckpt = str(tmp_path / "ck")
    # three checkpoints with params scaled by 1x, 2x, 4x
    for i, scale in enumerate([1.0, 2.0, 4.0]):
        s = state.replace(
            step=jnp.asarray(i + 1, jnp.int32),
            params=jax.tree_util.tree_map(lambda x: x * scale, state.params),
        )
        save_checkpoint(ckpt, i + 1, s, epoch=i, rng=rng, keep=None)
    avg, epoch, _ = average_checkpoints(ckpt, [1, 2, 3], state)
    expect = (1.0 + 2.0 + 4.0) / 3.0
    jax.tree_util.tree_map(
        lambda a, p: np.testing.assert_allclose(
            np.asarray(a), np.asarray(p) * expect, rtol=1e-6, atol=1e-7
        ),
        avg.params, state.params,
    )
    assert epoch == 2  # metadata of the last averaged step


def test_write_averaged_checkpoint_and_prune(tmp_path, tiny_state):
    _, state, _, _ = tiny_state
    rng = jax.random.PRNGKey(0)
    ckpt = str(tmp_path / "ck")
    for i in range(1, 6):
        save_checkpoint(
            ckpt, i, state.replace(step=jnp.asarray(i, jnp.int32)),
            epoch=i - 1, rng=rng, keep=None,
        )
    tracker = NBestTracker(ckpt, nbest=2, metric="acc", mode="max")
    tracker.update(2, 1, 0.9)
    tracker.update(4, 3, 0.8)
    # prune with 1 rolling slot: n-best (2,4) + latest (5) protected, and
    # the newest non-protected (3) fills the rolling slot; only 1 deleted
    prune_checkpoints(ckpt, keep=1, protected=tracker.steps())
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt)) as mgr:
        remaining = sorted(mgr.all_steps())
    assert remaining == [2, 3, 4, 5]

    path = write_averaged_checkpoint(ckpt, tracker, state)
    assert path is not None
    assert latest_step(os.path.join(ckpt, "ave")) == 2


def test_restore_falls_back_to_weights_only_on_opt_state_mismatch(tmp_path):
    """A checkpoint whose opt_state tree doesn't match the template (e.g.
    written before the trainable-subtree split changed the lora layout) must
    still restore its weights; optimizer moments reset from the template."""
    import dataclasses

    import optax

    from robustsq_whisper_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from robustsq_whisper_tpu.train.step import TrainState

    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros((3,))}}
    old_tx = optax.adam(1e-3)
    old_state = TrainState(
        step=jnp.asarray(7), params=params, buffers={}, lora={},
        opt_state=old_tx.init(params),
    )
    save_checkpoint(
        str(tmp_path), 7, old_state, epoch=2, rng=jax.random.PRNGKey(0)
    )

    # new-layout template: optimizer over a flat SUBSET of the params
    sub = {("dense", "kernel"): jnp.zeros((3, 3))}
    new_tx = optax.adam(1e-3)
    template = TrainState(
        step=jnp.asarray(0),
        params=jax.tree_util.tree_map(jnp.zeros_like, params),
        buffers={}, lora={}, opt_state=new_tx.init(sub),
    )
    state, epoch, rng = restore_checkpoint(str(tmp_path), template)
    assert epoch == 2 and int(state.step) == 7
    np.testing.assert_array_equal(
        np.asarray(state.params["dense"]["kernel"]), np.ones((3, 3))
    )


# ---------------- per-epoch valid WER (ValidWer) ----------------


class _DummyTok:
    def encode(self, s):
        return [5, 6]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


class _TinyDS:
    """KaldiTSDataset-shaped wrapper over a fixed in-memory batch."""

    sample_rate = 16000

    def __init__(self, arrays, n):
        self.arrays = arrays
        self.utt_ids = [f"u{i}" for i in range(n)]
        self.text = {u: "ref text" for u in self.utt_ids}
        self.tokenizer = _DummyTok()

    def batches(self, bs, shuffle=False, drop_last=True):
        idx = list(range(len(self.utt_ids)))
        for s in range(0, len(idx), bs):
            sel = idx[s : s + bs]
            if len(sel) < bs:
                if drop_last:
                    return
                sel = sel + idx[: bs - len(sel)]
            b = {
                k: np.asarray(v)[np.asarray(sel)]
                for k, v in self.arrays.items()
            }
            b["utt_ids"] = [self.utt_ids[i] for i in sel]
            yield b


def test_valid_wer_pass_runs_and_reuses_program(tiny_state):
    """ValidWer decodes a valid subset each epoch and keeps ONE compiled
    decode program across calls (no per-epoch rebuild)."""
    from robustsq_whisper_tpu.decode.search import DecodeConfig
    from robustsq_whisper_tpu.train.eval import ValidWer

    model, state, tcfg, batch = tiny_state
    arrays = {k: np.asarray(v) for k, v in batch.items()}
    ds = _TinyDS(arrays, n=4)
    dcfg = DecodeConfig(max_new_tokens=4, eot=2, init_tokens=(1,))
    wp = ValidWer(model, dcfg, n_utts=2)
    out = wp(state, tcfg, ds, batch_size=2)
    assert "wer" in out and np.isfinite(out["wer"])
    core = wp._core
    out2 = wp(state, tcfg, ds, batch_size=2)
    assert wp._core is core  # same compiled program, weights as arguments
    assert out2["wer"] == out["wer"]


def test_loop_reports_valid_wer(tmp_path, tiny_state):
    """run_training with wer_utts>0 surfaces valid.wer in the metrics hook."""
    from robustsq_whisper_tpu.decode.search import DecodeConfig
    from robustsq_whisper_tpu.train.loop import LoopConfig, run_training

    model, state, tcfg, batch = tiny_state
    arrays = {k: np.asarray(v) for k, v in batch.items()}
    ds = _TinyDS(arrays, n=4)
    seen = []
    lcfg = LoopConfig(
        num_epochs=1, batch_size=2, log_every=1, ckpt_every_steps=0,
        ckpt_dir=None, wer_utts=2,
        wer_decode=DecodeConfig(max_new_tokens=4, eot=2, init_tokens=(1,)),
    )
    variables = {"params": state.params, **state.buffers}
    run_training(
        model, ds, variables, tcfg, lcfg, rng=jax.random.PRNGKey(0),
        metrics_hook=lambda step, m: seen.append(m),
        valid_dataset=ds,
    )
    wer_rows = [m for m in seen if "valid.wer" in m]
    assert wer_rows and np.isfinite(wer_rows[-1]["valid.wer"])
