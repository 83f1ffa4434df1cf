"""Validation pass, n-best tracking, and checkpoint averaging.

The reference trains through ESPnet's external trainer, which validates
every epoch, keeps the n best checkpoints by ``valid.acc``, and decodes from
an **averaged** model (``valid.acc.ave``) — the recipe passes ``--valid_set``
at /root/reference/run_tswhisper.sh:60-61 and stage 12 decodes the averaged
checkpoint. This module is the TPU-native equivalent: a jit-compiled
``train=False`` eval step (dropout/SpecAug off), batch-weighted metric
aggregation, an n-best registry persisted next to the checkpoints, and
host-side float64 parameter averaging of the kept n-best.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from .checkpoint import restore_checkpoint, save_checkpoint
from .lora import merge_lora
from .step import TrainConfig, TrainState

AVE_SUBDIR = "ave"
NBEST_FILE = "nbest.json"


def make_eval_step(model: Any) -> Callable:
    """Jitted eval step: (params, buffers, batch, rng, epoch) -> stats.

    ``train=False`` so dropout and SpecAug are off — matching ESPnet's
    validation forward (model.eval() + no_grad)."""

    def eval_fn(params, buffers, batch, rng, epoch):
        _, stats = model.apply(
            {"params": params, **buffers}, batch, rng, epoch, train=False
        )
        return stats

    return jax.jit(eval_fn)


def eval_params(state: TrainState, tcfg: TrainConfig) -> Any:
    """The serving/eval view of the state's params (lora baked in)."""
    if tcfg.mode == "lora" and state.lora:
        return merge_lora(state.params, state.lora, tcfg.lora)
    return state.params


def evaluate(
    eval_step: Callable,
    state: TrainState,
    tcfg: TrainConfig,
    dataset: Any,  # KaldiTSDataset-like
    batch_size: int,
    epoch: int,
    rng: jax.Array,
    place_batch_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """Run one validation pass; returns batch-size-weighted mean stats.

    Stats stay DEVICE scalars until the end of the pass (the same deferred
    materialization as the training loop, train/loop.py:109-117): syncing
    ``float(v)`` per batch would serialize host batch collation with device
    compute — async dispatch lets the host build batch N+1 while the chip
    evaluates batch N."""
    params = eval_params(state, tcfg)
    pending: List[Tuple[int, Dict[str, jax.Array]]] = []
    for batch in dataset.batches(batch_size, shuffle=False):
        batch = dict(batch)
        batch.pop("utt_ids", None)
        if place_batch_fn is not None:
            batch = place_batch_fn(batch)
        b = int(batch["speech"].shape[0])
        pending.append((b, eval_step(params, state.buffers, batch, rng, epoch)))
    if not pending:
        return {}
    totals: Dict[str, float] = {}
    n_total = 0
    for b, stats in pending:  # single host sync, after the full pass
        for k, v in stats.items():
            totals[k] = totals.get(k, 0.0) + float(v) * b
        n_total += b
    return {k: v / n_total for k, v in totals.items()}


class ValidWer:
    """Per-epoch greedy-decode WER on a validation subset.

    The reference's stage-12 model selection ultimately cares about WER on
    dev_sglspk (/root/reference/run_tswhisper.sh:60-61, 80-87) — ``valid.acc``
    is only its proxy. This runs the real metric every epoch: KV-cache greedy
    decode of the first ``n_utts`` validation utterances through the shared
    serving modules, scored with the decode scorer.

    The decode program is BUILT ONCE and its jitted core reused across
    epochs with the epoch's weights passed as arguments (rebuilding
    ``build_beam_decoder`` each epoch would recompile the whole decode
    program per epoch)."""

    def __init__(self, model: Any, dcfg: Any = None, n_utts: int = 64):
        from ..decode.search import DecodeConfig
        from ..models.ts_decoder import TSDecoder
        from ..models.ts_encoder import QFormerTSEncoder, SpkAdapterTSEncoder

        self.model = model
        self.n_utts = n_utts
        emb = model.ts.enroll_type == "embedding"
        if emb:
            self.encoder = SpkAdapterTSEncoder.from_config(
                model.dims, model.ts, dtype=model.dtype
            )
        else:
            self.encoder = QFormerTSEncoder(
                model.dims, model.ts, dtype=model.dtype
            )
        self.decoder = TSDecoder(
            model.dims.replace(n_vocab=model.cfg.vocab_size),
            startofprev_token=model.cfg.startofprev,
            use_spk_prompt=not emb,
            dtype=model.dtype,
        )
        if dcfg is None:
            dcfg = DecodeConfig(
                max_new_tokens=64, eot=model.cfg.eos,
                init_tokens=(model.cfg.sos,),
            )
        assert not dcfg.quantize_weights, (
            "eval-time WER decodes dense weights (the per-epoch int8 requant "
            "would dominate; quantized serving is benched separately)"
        )
        assert dcfg.speculative_gamma == 0, "eval-time WER is plain greedy/beam"
        assert dcfg.ctc_decode_weight == 0, (
            "eval-time WER is attention-only (the prebuilt fns pair has no "
            "joint-CTC program and takes no mem_lens); strip "
            "ctc_decode_weight from wer_decode"
        )
        assert max(dcfg.init_tokens) < model.cfg.vocab_size, (
            f"init_tokens {dcfg.init_tokens} exceed the model vocab "
            f"({model.cfg.vocab_size}); use the model's sos"
        )
        self.dcfg = dcfg
        self._core = None  # (jitted run, qw) after the first build

    def __call__(
        self,
        state: TrainState,
        tcfg: TrainConfig,
        dataset: Any,  # KaldiTSDataset-like (has .tokenizer)
        batch_size: int,
    ) -> Dict[str, float]:
        import copy

        from ..decode import pipeline as dpipe
        from ..decode.search import build_beam_decoder

        params = eval_params(state, tcfg)
        bufs = state.buffers.get("buffers", state.buffers)
        enc_vars = {
            "params": params["encoder"], "buffers": bufs["encoder"],
        }
        dec_vars = {"params": params["decoder"]}
        if self._core is None:
            bound = build_beam_decoder(self.decoder, dec_vars, self.dcfg)
            # partial(run, variables, qw): keep the jitted core and swap the
            # epoch's weights in as arguments — no retrace across epochs
            emb = self.model.ts.enroll_type == "embedding"
            if emb:
                enc_apply = dpipe.embedding_encode_fn(self.encoder)
            else:
                def enc_apply(v, mel, fl, emel, el):
                    return self.encoder.apply(v, mel, fl, emel, el)
            self._core = (jax.jit(enc_apply), bound.func, bound.args[1])
        enc_core, run_core, qw = self._core

        sub = copy.copy(dataset)
        if self.n_utts > 0:
            sub.utt_ids = dataset.utt_ids[: self.n_utts]
        res = dpipe.decode_dataset(
            self.encoder, enc_vars, self.decoder, dec_vars, sub,
            dataset.tokenizer, self.dcfg, batch_size=batch_size,
            fns=(
                enc_core,
                lambda memory, prompt: run_core(dec_vars, qw, memory, prompt),
            ),
        )
        return {
            k: float(res.metrics[k])
            for k in ("wer", "cer")
            if k in res.metrics
        }


@dataclasses.dataclass
class NBestEntry:
    step: int
    epoch: int
    metric: float


class NBestTracker:
    """Keeps the n best (step, metric) checkpoints, persisted as JSON next to
    the checkpoint dir (the ESPnet ``valid.acc.best`` bookkeeping)."""

    def __init__(
        self,
        ckpt_dir: str,
        nbest: int = 5,
        metric: str = "acc",
        mode: str = "max",
    ):
        self.ckpt_dir = ckpt_dir
        self.nbest = nbest
        self.metric = metric
        self.mode = mode
        self.entries: List[NBestEntry] = []
        self._load()

    @property
    def path(self) -> str:
        return os.path.join(self.ckpt_dir, NBEST_FILE)

    def _load(self) -> None:
        if os.path.isfile(self.path):
            with open(self.path) as f:
                d = json.load(f)
            self.metric = d.get("metric", self.metric)
            self.mode = d.get("mode", self.mode)
            self.entries = [NBestEntry(**e) for e in d.get("entries", [])]

    def _save(self) -> None:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(
                {
                    "metric": self.metric,
                    "mode": self.mode,
                    "entries": [dataclasses.asdict(e) for e in self.entries],
                },
                f,
                indent=1,
            )

    def _sort_key(self, e: NBestEntry) -> float:
        return -e.metric if self.mode == "max" else e.metric

    def update(self, step: int, epoch: int, value: float) -> bool:
        """Record an epoch result; returns True if it is a new best."""
        self.entries = [e for e in self.entries if e.step != step]
        self.entries.append(NBestEntry(step=step, epoch=epoch, metric=value))
        self.entries.sort(key=self._sort_key)
        is_best = self.entries[0].step == step
        self.entries = self.entries[: self.nbest]
        self._save()
        return is_best

    def best(self) -> Optional[NBestEntry]:
        return self.entries[0] if self.entries else None

    def steps(self) -> List[int]:
        return [e.step for e in self.entries]

    def epochs_since_best(self, current_epoch: int) -> int:
        b = self.best()
        return current_epoch - b.epoch if b else 0


def average_checkpoints(
    ckpt_dir: str,
    steps: List[int],
    state_template: TrainState,
) -> Tuple[TrainState, int, jax.Array]:
    """Running float64 mean of params (and lora factors) over checkpoints —
    ESPnet's ``valid.acc.ave`` model. buffers/opt_state come from the last
    restored state (buffers are identical across steps; opt_state is not
    meaningful for an averaged model)."""
    assert steps, "no checkpoints to average"
    acc_params = acc_lora = None
    state = epoch = rng = None
    for i, s in enumerate(sorted(steps)):
        state, epoch, rng = restore_checkpoint(ckpt_dir, state_template, step=s)
        p64 = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), jax.device_get(state.params)
        )
        l64 = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), jax.device_get(state.lora)
        )
        if acc_params is None:
            acc_params, acc_lora = p64, l64
        else:
            acc_params = jax.tree_util.tree_map(
                lambda a, b: a + (b - a) / (i + 1), acc_params, p64
            )
            acc_lora = jax.tree_util.tree_map(
                lambda a, b: a + (b - a) / (i + 1), acc_lora, l64
            )
    avg_params = jax.tree_util.tree_map(
        lambda a, t: np.asarray(a, np.asarray(t).dtype), acc_params,
        jax.device_get(state.params),
    )
    avg_lora = jax.tree_util.tree_map(
        lambda a, t: np.asarray(a, np.asarray(t).dtype), acc_lora,
        jax.device_get(state.lora),
    )
    return state.replace(params=avg_params, lora=avg_lora), epoch, rng


def write_averaged_checkpoint(
    ckpt_dir: str,
    tracker: NBestTracker,
    state_template: TrainState,
) -> Optional[str]:
    """Average the tracked n-best and save under ``{ckpt_dir}/ave`` (step =
    number of averaged checkpoints, mirroring ESPnet's ``ave_5best``)."""
    steps = tracker.steps()
    if not steps:
        return None
    avg_state, epoch, rng = average_checkpoints(ckpt_dir, steps, state_template)
    ave_dir = os.path.join(ckpt_dir, AVE_SUBDIR)
    return save_checkpoint(
        ave_dir, len(steps), avg_state, epoch, rng, keep=1, overwrite=True
    )
