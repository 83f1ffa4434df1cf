"""Orbax checkpoint/resume.

The reference delegates checkpointing entirely to the external ESPnet trainer
(SURVEY.md §5): checkpoints under ``exp/``, and the one state-dependent
schedule — ``set_epoch`` driving margin/γ warm-ups
(/root/reference/model/ts_qformer_espnet_model.py:738-750) — means resume
must restore the epoch. Here a checkpoint carries (train_state, epoch, rng)
and restores onto an arbitrary mesh (orbax handles resharding).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state: Any,
    epoch: int,
    rng: jax.Array,
    keep: Optional[int] = 3,
    overwrite: bool = False,
) -> str:
    """``keep=None`` disables orbax's rolling retention — the caller manages
    deletion (e.g. prune_checkpoints protecting the n-best steps)."""
    ocp = _ocp()
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        if step in mgr.all_steps():
            if not overwrite:
                # depending on orbax version a duplicate-step save either
                # raises StepAlreadyExists or is SILENTLY dropped (stale
                # metadata) — surface it instead
                raise ValueError(
                    f"checkpoint step {step} already exists in {ckpt_dir}; "
                    "pass overwrite=True to replace it"
                )
            mgr.delete(step)
        mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(
                    {"epoch": int(epoch), "rng": np.asarray(rng).tolist()}
                ),
            ),
        )
        mgr.wait_until_finished()
    return os.path.join(ckpt_dir, str(step))


def prune_checkpoints(
    ckpt_dir: str, keep: int, protected: Any = ()
) -> None:
    """Delete oldest non-protected checkpoints beyond ``keep`` (n-best steps
    and the latest step should be passed as ``protected``)."""
    ocp = _ocp()
    if not os.path.isdir(ckpt_dir):
        return
    protected = set(protected)
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        steps = sorted(mgr.all_steps())
        if steps:
            protected.add(steps[-1])
        deletable = [s for s in steps if s not in protected]
        for s in deletable[: max(0, len(deletable) - keep)]:
            mgr.delete(s)
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    ocp = _ocp()
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        return mgr.latest_step()


def restore_weights(
    ckpt_dir: str,
    step: Optional[int] = None,
) -> Tuple[Any, Any, Any, int, int]:
    """Serving-path restore: ``(params, buffers, lora, step, epoch)`` as
    HOST numpy trees — no optimizer state, no device template.

    ``restore_checkpoint`` needs a concrete state template, which for a
    full-FT medium checkpoint means materializing params + Adam moments
    (~8.5 GB) on device BEFORE the restored copy lands — two train states
    never fit one 16 GB chip. Serving only needs the weight collections;
    this reads the stored tree to host and returns them, leaving device
    placement (and compute-dtype casting) to the caller."""
    ocp = _ocp()
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        restored = mgr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
        )
        # StandardRestore with no template: stored tree as host arrays
        raw = mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
        )["state"]
    return (
        raw["params"],
        raw.get("buffers", {}),
        raw.get("lora", {}),
        int(np.asarray(raw["step"])),
        int(restored["meta"]["epoch"]),
    )


def restore_serving_variables(
    ckpt_dir: str,
    compute_dtype: Any,
    train_cfg: Any,
    step: Optional[int] = None,
) -> Tuple[Any, int, int]:
    """Serving restore shared by ``cli.decode`` and ``cli.serve``: a
    weights-only host read (``restore_weights`` — the full-state
    ``restore_checkpoint`` needs a concrete device template, and two
    full-FT medium train states never fit one 16 GB chip), an f32 →
    compute-dtype cast ON HOST before the device put (the tunneled
    transfer is the restore wall; bf16 halves the bytes), and the LoRA
    merge when the checkpoint trained adapters (without it a lora run
    serves the unadapted base model).

    Returns ``(variables, step, epoch)`` with ``variables = {"params": ...,
    **buffer_collections}`` on device in the compute dtype.
    """
    import jax.numpy as jnp
    import ml_dtypes

    raw_params, raw_buffers, raw_lora, step_i, epoch = restore_weights(
        ckpt_dir, step
    )

    def host_cast(x):
        x = np.asarray(x)
        if compute_dtype == jnp.bfloat16 and x.dtype == np.float32:
            return x.astype(ml_dtypes.bfloat16)
        return x

    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(host_cast(x)), raw_params
    )
    if train_cfg.mode == "lora" and raw_lora:
        from .lora import merge_lora

        params = merge_lora(
            params,
            jax.tree_util.tree_map(
                lambda x: jnp.asarray(host_cast(x)), raw_lora
            ),
            train_cfg.lora,
        )
    return {"params": params, **raw_buffers}, step_i, epoch


def restore_checkpoint(
    ckpt_dir: str,
    state_template: Any,
    step: Optional[int] = None,
) -> Tuple[Any, int, jax.Array]:
    """Restore (state, epoch, rng). ``state_template`` provides the tree
    structure/shardings (abstract or concrete).

    Falls back to a WEIGHTS-ONLY restore (params/buffers/lora/step; fresh
    optimizer state from the template) when the stored opt_state's tree
    doesn't match the template — e.g. checkpoints written before the
    trainable-subtree split changed the lora/frozen opt_state layout.
    Serving (cli/decode.py) only needs the weights; a training resume from
    such a checkpoint restarts the optimizer moments and logs it here."""
    ocp = _ocp()
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        step = step if step is not None else mgr.latest_step()
        try:
            restored = mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(state_template),
                    meta=ocp.args.JsonRestore(),
                ),
            )
            state = restored["state"]
        except Exception:
            # tree-structure mismatch: re-read leniently and keep the
            # weight collections, template's optimizer state
            restored = mgr.restore(
                step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
            )
            # StandardRestore with no template returns the stored tree as-is
            raw = mgr.restore(
                step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
            )["state"]
            logging.warning(
                "opt_state layout mismatch in %s step %s; restoring weights "
                "only (optimizer moments reset)", ckpt_dir, step,
            )
            to_jnp = lambda tree: jax.tree_util.tree_map(
                jax.numpy.asarray, tree
            )
            state = state_template.replace(
                params=to_jnp(raw["params"]),
                buffers=to_jnp(raw.get("buffers", state_template.buffers)),
                lora=to_jnp(raw.get("lora", state_template.lora)),
                step=jax.numpy.asarray(raw["step"]),
            )
    rng = jax.numpy.asarray(
        np.asarray(restored["meta"]["rng"], dtype=np.uint32)
    )
    return state, int(restored["meta"]["epoch"]), rng
