"""Draft-head distillation for speculative decode.

The speculative decoder's speedup rides entirely on DRAFT ACCEPTANCE
(decode/speculative.py cost model): self-drafting — the target's own first
``d`` layers — was measured at 1.1% acceptance on a trained checkpoint
(BENCH_r04 ``trained.speculative``), far below the ~93% break-even the
on-chip primitive table implies (docs/SERVING.md). This module closes that
gap by DISTILLING a ``d``-layer draft against the full decoder (the
teacher): the draft keeps the teacher's token/positional embeddings and
tied-embedding head (frozen — the verify/accept comparison is over teacher
argmax ids, so a shared output space is what acceptance is measured in)
and trains its block stack + final LayerNorm to reproduce the teacher's
greedy (argmax) choices under teacher forcing.

The loss is plain CE against the teacher's argmax token — not a soft KL —
because acceptance IS argmax agreement: the verify step accepts draft
token d_j iff it equals the teacher's argmax (decode/speculative.py
accept rule), so optimizing argmax agreement optimizes the acceptance
rate directly.

No reference counterpart: the reference decodes cachelessly token by
token (/root/reference/model/whisper_decoder.py:174-176); speculative
serving is a capacity feature of the TPU build. The distilled draft plugs
into ``build_speculative_decoder(..., draft_vars=...)``, which computes
the draft's own cross K/V and cache from its weights — the output remains
token-for-token the teacher's greedy transcript regardless of draft
quality (tests/test_speculative.py pins this for arbitrary draft_vars).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..decode.speculative import draft_variables
from ..models.ts_decoder import TSDecoder


def save_draft(out_dir: str, draft_vars: Any, meta: Dict[str, Any]) -> str:
    """Persist a distilled draft head (an orbax composite: the variables
    pytree + a json meta dict carrying at least ``draft_layers`` and the
    teacher checkpoint's step). Loaded back by ``load_draft`` for
    ``cli.decode --draft_path``."""
    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with ocp.CheckpointManager(out_dir) as mgr:
        if 0 in mgr.all_steps():
            mgr.delete(0)
        mgr.save(
            0,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(draft_vars),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        mgr.wait_until_finished()
    return out_dir


def load_draft(draft_dir: str) -> Tuple[Any, Dict[str, Any]]:
    """Returns ``(draft_vars, meta)`` as host numpy trees; the caller casts
    to the compute dtype (cli.decode reuses its ``to_compute``)."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(draft_dir)) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no draft checkpoint in {draft_dir}")
        meta = mgr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
        )["meta"]
        state = mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
        )["state"]
    return state, meta


def teacher_forcing_inputs(
    text: np.ndarray, text_lens: np.ndarray, sot: int, eot: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Build ``(ys_in, mask)`` for distillation from corpus token rows.

    ``text`` is (n, L) int32 with -1 padding, rows already carrying the
    decode conditioning prefix minus the leading sot (the train-step
    convention: add_sos_eos prepends sot, so serving's init_tokens ==
    [sot] + row prefix). Returns ``ys_in`` (n, L+1) = [sot] + row with
    padding replaced by eot, and ``mask`` (n, L+1) over LOGIT positions:
    position t predicts ys_in[t+1]; t == text_lens predicts the row's
    eot — included so the draft learns to stop where the teacher stops.
    """
    n, L = text.shape
    ys = np.full((n, L + 1), eot, np.int32)
    ys[:, 0] = sot
    ys[:, 1:] = np.where(text >= 0, text, eot)
    mask = (
        np.arange(L + 1)[None, :] <= np.asarray(text_lens)[:, None]
    ).astype(np.float32)
    return ys, mask


def distill_draft(
    dec: TSDecoder,
    variables: Any,
    draft_layers: int,
    memory: jax.Array,  # (n, src, n_state) encoder output
    spk_prompt: jax.Array,  # (n, n_q, n_state)
    ys_in: np.ndarray,  # (n, L) teacher-forcing inputs (sot-prefixed)
    mask: np.ndarray,  # (n, L) float mask over logit positions
    *,
    steps: int = 600,
    lr: float = 3e-4,
    batch_size: int = 8,
    seed: int = 0,
    log=None,
) -> Tuple[Any, Dict[str, float]]:
    """Distill a ``draft_layers``-layer draft from the full decoder.

    Returns ``(draft_vars, stats)``: a TSDecoder variables dict at
    ``n_text_layer=draft_layers`` (embeddings/head shared with the
    teacher, frozen; blocks + final LayerNorm trained, initialized from
    the teacher's first ``draft_layers`` blocks) ready for
    ``build_speculative_decoder(..., draft_vars=draft_vars)``, and stats
    ``{final_loss, final_agreement, steps}`` where ``final_agreement`` is
    masked argmax agreement with the teacher over the whole corpus —
    the direct estimate of teacher-forced draft acceptance.
    """
    d = int(draft_layers)
    draft = TSDecoder(
        dec.dims.replace(n_text_layer=d),
        startofprev_token=dec.startofprev_token,
        use_spk_prompt=dec.use_spk_prompt,
        dtype=dec.dtype,
        cross_kv_bits=dec.cross_kv_bits,
        self_kv_bits=dec.self_kv_bits,
        flat_self_cache=False,
    )
    dvars = draft_variables(variables, d)
    n = memory.shape[0]
    ys_in = np.asarray(ys_in, np.int32)
    mask_np = np.asarray(mask, np.float32)

    # ---- teacher argmax targets, one teacher-forced pass ----
    @jax.jit
    def teacher_argmax(v, mem, y, prm):
        lg = dec.apply(v, mem, y, prm)
        return jnp.argmax(lg, -1).astype(jnp.int32)

    tb = min(batch_size, n)
    tgt_chunks = []
    for i in range(0, n, tb):
        idx = np.arange(i, i + tb) % n  # tile-pad the ragged tail: one shape
        tgt_chunks.append(np.asarray(teacher_argmax(
            variables, memory[idx], jnp.asarray(ys_in[idx]),
            spk_prompt[idx],
        ))[: min(tb, n - i)])
    targets = np.concatenate(tgt_chunks)

    # ---- trainable partition: blocks + final ln; embeddings frozen ----
    dec_p = dict(dvars["params"]["decoder"])
    train_keys = tuple(
        k for k in dec_p
        if k == "block" or k.startswith("blocks_") or k == "ln"
    )
    frozen = {k: v for k, v in dec_p.items() if k not in train_keys}
    orig_dtypes = {
        k: jax.tree_util.tree_map(lambda x: x.dtype, dec_p[k])
        for k in train_keys
    }
    train_p = {
        k: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), dec_p[k]
        )
        for k in train_keys
    }  # f32 master copy (serving weights may be bf16)
    other_cols = {k: v for k, v in dvars.items() if k != "params"}
    other_params = {
        k: v for k, v in dvars["params"].items() if k != "decoder"
    }

    def assemble(tp):
        cast = {
            k: jax.tree_util.tree_map(
                lambda x, dt: x.astype(dt), tp[k], orig_dtypes[k]
            )
            for k in train_keys
        }
        p = dict(frozen)
        p.update(cast)
        return {"params": {**other_params, "decoder": p}, **other_cols}

    def loss_fn(tp, mem, prm, y, tgt, msk):
        lg = draft.apply(assemble(tp), mem, y, prm)  # fp32 (b, L, V)
        lp = jax.nn.log_softmax(lg)
        ce = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        denom = jnp.maximum(jnp.sum(msk), 1.0)
        agree = jnp.sum((jnp.argmax(lg, -1) == tgt) * msk) / denom
        return jnp.sum(ce * msk) / denom, agree

    tx = optax.adam(
        optax.warmup_cosine_decay_schedule(0.0, lr, min(50, steps // 4),
                                           steps)
    )
    opt_state = tx.init(train_p)

    @jax.jit
    def train_step(tp, opt_state, mem, prm, y, tgt, msk):
        (loss, agree), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(tp, mem, prm, y, tgt, msk)
        updates, opt_state = tx.update(grads, opt_state, tp)
        return optax.apply_updates(tp, updates), opt_state, loss, agree

    rng = np.random.default_rng(seed)
    b = min(batch_size, n)
    loss = agree = 0.0
    for s in range(steps):
        idx = rng.choice(n, size=b, replace=n < b)
        train_p, opt_state, loss, agree = train_step(
            train_p, opt_state, memory[idx], spk_prompt[idx],
            jnp.asarray(ys_in[idx]), jnp.asarray(targets[idx]),
            jnp.asarray(mask_np[idx]),
        )
        if log is not None and (s % 100 == 0 or s == steps - 1):
            log(
                f"[distill] step {s}: loss={float(loss):.4f} "
                f"agree={float(agree):.4f}"
            )

    final = jax.jit(assemble)(train_p)

    # ---- whole-corpus teacher-forced agreement with the final weights ----
    @jax.jit
    def eval_agree(v, mem, prm, y, tgt, msk):
        lg = draft.apply(v, mem, y, prm)
        denom = jnp.maximum(jnp.sum(msk), 1.0)
        return jnp.sum((jnp.argmax(lg, -1) == tgt) * msk) / denom

    num = den = 0.0
    for i in range(0, n, tb):
        idx = np.arange(i, i + tb) % n
        msk = mask_np[idx].copy()
        msk[min(tb, n - i):] = 0.0  # tile-padded tail rows don't count
        a = float(eval_agree(
            final, memory[idx], spk_prompt[idx], jnp.asarray(ys_in[idx]),
            jnp.asarray(targets[idx]), jnp.asarray(msk),
        ))
        num += a * max(float(np.sum(msk)), 1.0)
        den += max(float(np.sum(msk)), 1.0)
    stats = {
        "final_loss": round(float(loss), 5),
        "final_agreement": round(num / max(den, 1.0), 5),
        "steps": steps,
    }
    return final, stats
