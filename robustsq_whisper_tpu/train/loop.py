"""Epoch training loop: the ESPnet-trainer equivalent, TPU-native.

Drives make_train_step over a KaldiTSDataset: per-epoch shuffling, the
epoch scalar threaded into the compiled step for the margin/γ warm-ups
(reference set_epoch, /root/reference/model/ts_qformer_espnet_model.py:
738-750), metrics aggregation mirroring the reference stats keys
(:581-653), Orbax checkpoint/resume carrying (state, epoch, rng)
(SURVEY.md §5 checkpoint note), and — like the external ESPnet trainer the
reference recipe relies on (--valid_set at run_tswhisper.sh:60-61) — a
per-epoch validation pass with n-best tracking by ``valid.acc``, optional
early stop, and an averaged ``ave`` checkpoint for decoding.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Optional

import jax

from ..parallel.mesh import Mesh
from .checkpoint import (
    latest_step,
    prune_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from .eval import NBestTracker, evaluate, make_eval_step, write_averaged_checkpoint
from .step import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    place_batch,
    train_state_shardings,
)

logger = logging.getLogger("robustsq_whisper_tpu.train")


@dataclasses.dataclass
class LoopConfig:
    num_epochs: int = 10
    batch_size: int = 8
    log_every: int = 50
    ckpt_every_steps: int = 1000
    ckpt_dir: Optional[str] = None
    keep_ckpts: int = 3
    # epoch-end checkpoint cadence (ESPnet saves every epoch = default 1).
    # Raise for many-short-epoch runs: each save device_gets the full
    # params+moments state (~10 GB for full-FT medium) over the tunnel, so
    # per-epoch saves can dominate a 70-epoch overfit run's wall time. The
    # LAST epoch always saves regardless.
    ckpt_every_epochs: int = 1
    # validation / model selection (ESPnet semantics)
    nbest: int = 5  # checkpoints kept + averaged, ranked by best_metric
    best_metric: str = "acc"  # key of the valid stats dict
    best_mode: str = "max"  # max for acc, min for loss
    patience: int = 0  # epochs without a new best before early stop; 0 = off
    eval_batch_size: Optional[int] = None  # defaults to batch_size
    # per-epoch greedy-decode WER on the first N valid utterances — the
    # metric stage-12 model selection actually cares about (reference
    # run_tswhisper.sh:60-61, 80-87); 0 = off. Appears as ``valid.wer`` in
    # the metrics hook; select on it with best_metric="wer", best_mode="min".
    wer_utts: int = 0
    wer_decode: Optional[Any] = None  # DecodeConfig override for the pass


def run_training(
    model: Any,
    dataset: Any,  # KaldiTSDataset-like: .batches(batch_size, shuffle)
    init_params: Any,
    tcfg: TrainConfig = TrainConfig(),
    lcfg: LoopConfig = LoopConfig(),
    mesh: Optional[Mesh] = None,
    rng: Optional[jax.Array] = None,
    metrics_hook: Optional[Callable[[int, Dict[str, float]], None]] = None,
    valid_dataset: Optional[Any] = None,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    state, tx = create_train_state(rng, init_params, tcfg)
    st_sh = (
        train_state_shardings(mesh, state, fsdp=tcfg.fsdp)
        if mesh is not None else None
    )
    # pin the output state's shardings: with FSDP, param/moment storage must
    # STAY sharded across steps (make_train_step docstring)
    step_fn = make_train_step(model, tx, tcfg, state_shardings=st_sh)
    start_epoch = 0

    if lcfg.ckpt_dir and latest_step(lcfg.ckpt_dir) is not None:
        state, start_epoch, rng = restore_checkpoint(lcfg.ckpt_dir, state)
        logger.info(
            "resumed from %s at step %d epoch %d",
            lcfg.ckpt_dir, int(state.step), start_epoch,
        )

    if mesh is not None:
        state = jax.device_put(state, st_sh)

    eval_step = tracker = wer_pass = None
    if valid_dataset is not None:
        eval_step = make_eval_step(model)
        if lcfg.wer_utts > 0:
            from .eval import ValidWer

            wer_pass = ValidWer(model, lcfg.wer_decode, n_utts=lcfg.wer_utts)
        if lcfg.ckpt_dir:
            tracker = NBestTracker(
                lcfg.ckpt_dir, lcfg.nbest, lcfg.best_metric, lcfg.best_mode
            )
    # rolling retention is manual when n-best steps must be protected
    save_keep = None if tracker is not None else lcfg.keep_ckpts

    def _prune():
        if tracker is not None:
            prune_checkpoints(
                lcfg.ckpt_dir, lcfg.keep_ckpts, protected=tracker.steps()
            )

    # stats stay DEVICE scalars until the log boundary and the step index is
    # a host counter: materializing (int(state.step) / float(v)) every
    # iteration would block the host on each step's completion, serializing
    # data loading with device compute. Deferred, async dispatch lets the
    # host collate batch N+1 while the chip runs step N — the input pipeline
    # rides for free under the step time.
    pending: list = []
    step = int(state.step)
    t_last = time.time()

    for epoch in range(start_epoch, lcfg.num_epochs):
        for batch in dataset.batches(lcfg.batch_size, shuffle=True):
            batch = dict(batch)
            batch.pop("utt_ids", None)
            if mesh is not None:
                batch = place_batch(mesh, batch)
            rng, step_rng = jax.random.split(rng)
            state, stats = step_fn(state, batch, step_rng, epoch)

            step += 1
            pending.append(stats)
            if step % lcfg.log_every == 0:
                running: Dict[str, float] = {}
                for st in pending:
                    for k, v in st.items():
                        running[k] = running.get(k, 0.0) + float(v)
                n_running = len(pending)
                avg = {k: v / n_running for k, v in running.items()}
                dt = time.time() - t_last
                sps = n_running / max(dt, 1e-9)
                logger.info(
                    "epoch %d step %d %s steps/s %.2f",
                    epoch, step,
                    " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items())),
                    sps,
                )
                if metrics_hook:
                    metrics_hook(step, {**avg, "steps_per_sec": sps, "epoch": epoch})
                pending, t_last = [], time.time()

            if (
                lcfg.ckpt_dir
                and lcfg.ckpt_every_steps
                and step % lcfg.ckpt_every_steps == 0
            ):
                save_checkpoint(
                    lcfg.ckpt_dir, step, state, epoch, rng, save_keep
                )
                _prune()

        if lcfg.ckpt_dir and (
            tracker is not None  # n-best averaging needs every epoch's step
            or (epoch + 1) % max(1, lcfg.ckpt_every_epochs) == 0
            or epoch + 1 == lcfg.num_epochs
        ):
            # a mid-loop save (this run or a previous one) may have landed on
            # this exact step; always replace it with the epoch-end metadata
            # (epoch+1 => resume starts the next epoch)
            save_checkpoint(
                lcfg.ckpt_dir, int(state.step), state, epoch + 1, rng,
                save_keep, overwrite=True,
            )

        if eval_step is not None:
            # fixed key: the contrastive negatives are sampled even at eval
            # (the reference's multinomial runs in the valid forward too);
            # a constant key makes valid metrics comparable across epochs
            eval_rng = jax.random.PRNGKey(0)
            vstats = evaluate(
                eval_step, state, tcfg, valid_dataset,
                lcfg.eval_batch_size or lcfg.batch_size, epoch, eval_rng,
                place_batch_fn=(
                    (lambda b: place_batch(mesh, b)) if mesh is not None else None
                ),
            )
            if wer_pass is not None:
                vstats.update(wer_pass(
                    state, tcfg, valid_dataset,
                    lcfg.eval_batch_size or lcfg.batch_size,
                ))
            logger.info(
                "epoch %d valid %s", epoch,
                " ".join(f"{k}={v:.4f}" for k, v in sorted(vstats.items())),
            )
            if metrics_hook:
                metrics_hook(
                    int(state.step),
                    {**{f"valid.{k}": v for k, v in vstats.items()},
                     "epoch": epoch},
                )
            if tracker is not None and lcfg.best_metric in vstats:
                is_best = tracker.update(
                    int(state.step), epoch, vstats[lcfg.best_metric]
                )
                if is_best:
                    logger.info(
                        "epoch %d new best valid.%s=%.4f",
                        epoch, lcfg.best_metric, vstats[lcfg.best_metric],
                    )
                _prune()
                since = tracker.epochs_since_best(epoch)
                if lcfg.patience and since >= lcfg.patience:
                    logger.info(
                        "early stop: no valid.%s improvement for %d epochs",
                        lcfg.best_metric, since,
                    )
                    break

    if tracker is not None and tracker.steps():
        path = write_averaged_checkpoint(lcfg.ckpt_dir, tracker, state)
        logger.info(
            "averaged %d-best checkpoint (valid.%s) written to %s",
            len(tracker.steps()), lcfg.best_metric, path,
        )
    return state
