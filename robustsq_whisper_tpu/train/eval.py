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
    """Run one validation pass; returns batch-size-weighted mean stats."""
    params = eval_params(state, tcfg)
    totals: Dict[str, float] = {}
    n_total = 0
    for batch in dataset.batches(batch_size, shuffle=False):
        batch = dict(batch)
        batch.pop("utt_ids", None)
        if place_batch_fn is not None:
            batch = place_batch_fn(batch)
        b = int(batch["speech"].shape[0])
        stats = eval_step(params, state.buffers, batch, rng, epoch)
        for k, v in stats.items():
            totals[k] = totals.get(k, 0.0) + float(v) * b
        n_total += b
    if n_total == 0:
        return {}
    return {k: v / n_total for k, v in totals.items()}


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
