"""Epoch training loop: the ESPnet-trainer equivalent, TPU-native.

Drives make_train_step over a KaldiTSDataset: per-epoch shuffling, the
epoch scalar threaded into the compiled step for the margin/γ warm-ups
(reference set_epoch, /root/reference/model/ts_qformer_espnet_model.py:
738-750), metrics aggregation mirroring the reference stats keys
(:581-653), and Orbax checkpoint/resume carrying (state, epoch, rng)
(SURVEY.md §5 checkpoint note).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Optional

import jax

from ..parallel.mesh import Mesh
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .step import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    place_batch,
    place_train_state,
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


def run_training(
    model: Any,
    dataset: Any,  # KaldiTSDataset-like: .batches(batch_size, shuffle)
    init_params: Any,
    tcfg: TrainConfig = TrainConfig(),
    lcfg: LoopConfig = LoopConfig(),
    mesh: Optional[Mesh] = None,
    rng: Optional[jax.Array] = None,
    metrics_hook: Optional[Callable[[int, Dict[str, float]], None]] = None,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    state, tx = create_train_state(rng, init_params, tcfg)
    step_fn = make_train_step(model, tx, tcfg)
    start_epoch = 0

    if lcfg.ckpt_dir and latest_step(lcfg.ckpt_dir) is not None:
        state, start_epoch, rng = restore_checkpoint(lcfg.ckpt_dir, state)
        logger.info(
            "resumed from %s at step %d epoch %d",
            lcfg.ckpt_dir, int(state.step), start_epoch,
        )

    if mesh is not None:
        state = place_train_state(mesh, state)

    running: Dict[str, float] = {}
    n_running = 0
    t_last = time.time()

    for epoch in range(start_epoch, lcfg.num_epochs):
        for batch in dataset.batches(lcfg.batch_size, shuffle=True):
            batch = dict(batch)
            batch.pop("utt_ids", None)
            if mesh is not None:
                batch = place_batch(mesh, batch)
            rng, step_rng = jax.random.split(rng)
            state, stats = step_fn(state, batch, step_rng, epoch)

            n_running += 1
            step = int(state.step)
            for k, v in stats.items():
                running[k] = running.get(k, 0.0) + float(v)
            if step % lcfg.log_every == 0:
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
                running, n_running, t_last = {}, 0, time.time()

            if (
                lcfg.ckpt_dir
                and lcfg.ckpt_every_steps
                and step % lcfg.ckpt_every_steps == 0
            ):
                save_checkpoint(
                    lcfg.ckpt_dir, step, state, epoch, rng, lcfg.keep_ckpts
                )

        if lcfg.ckpt_dir:
            # a mid-loop save (this run or a previous one) may have landed on
            # this exact step; always replace it with the epoch-end metadata
            # (epoch+1 => resume starts the next epoch)
            save_checkpoint(
                lcfg.ckpt_dir, int(state.step), state, epoch + 1, rng,
                lcfg.keep_ckpts, overwrite=True,
            )
    return state
