"""Distill a speculative-decode draft head from a trained checkpoint.

Usage::

    python -m robustsq_whisper_tpu.cli.distill \
        --config conf/tswhisper/train_...yaml --expdir exp/... \
        --data_dir dump/train_sglspk --out exp/.../draft \
        --draft_layers 4 --steps 400

Pipeline: restore the teacher (weights-only serving restore), encode up to
``--max_items`` utterances from the data dir, GREEDY-DECODE them with the
teacher (the distillation targets are the teacher's own argmax choices
over its own greedy context — exactly the distribution the verify/accept
rule samples at serve time; no transcripts needed), then train the
``--draft_layers``-layer draft (``train/distill.py``: shared frozen
embeddings/tied head, CE vs teacher argmax) and save it with
``save_draft``. Decode with it via ``cli.decode --speculative_gamma G
--draft_path <out>`` — output stays token-for-token the teacher's greedy
transcript at ANY draft quality; the draft only buys speed (measured at
medium dims: 95.8% acceptance, 1.14x end-to-end vs plain greedy —
docs/SERVING.md).

No reference counterpart: the reference decodes cachelessly per token
(/root/reference/model/whisper_decoder.py:174-176); speculative serving
is a capacity feature of the TPU build.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--expdir", required=True,
                        help="teacher experiment dir (checkpoints/ inside)")
    parser.add_argument("--data_dir", required=True,
                        help="Kaldi dir providing the distillation audio")
    parser.add_argument("--out", required=True,
                        help="output draft checkpoint dir (--draft_path)")
    parser.add_argument("--tokenizer_assets", default=None)
    parser.add_argument("--draft_layers", type=int, default=4)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_items", type=int, default=64,
                        help="utterances drawn from the data dir for the "
                        "distillation corpus")
    parser.add_argument("--max_new_tokens", type=int, default=128)
    parser.add_argument("--language", default="en")
    parser.add_argument("--use_ave", default=True,
                        type=lambda s: str(s).lower() in ("1", "true", "yes"))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.dataset import KaldiTSDataset
    from ..decode.search import build_beam_decoder, strip_eot
    from ..models import QFormerTSEncoder, TSDecoder
    from ..tokenizer.whisper_tokenizer import (
        load_tokenizer,
        special_tokens_for_vocab,
    )
    from ..train.checkpoint import latest_step, restore_serving_variables
    from ..train.distill import (
        distill_draft,
        save_draft,
        teacher_forcing_inputs,
    )
    from ..train.eval import AVE_SUBDIR
    from ..utils.config import load_experiment
    from .train import build_model_and_variables

    exp = load_experiment(args.config)
    if exp.ts.enroll_type == "embedding":
        parser.error(
            "draft distillation is wired for the audio-enrollment "
            "(Qformer) encoder; enroll_type=embedding is not supported"
        )
    dims = exp.resolved_dims()
    dtype = jnp.bfloat16 if exp.compute_dtype == "bfloat16" else jnp.float32
    tokenizer = load_tokenizer(args.tokenizer_assets)
    st = special_tokens_for_vocab(exp.model.vocab_size)

    dataset = KaldiTSDataset(
        args.data_dir,
        tokenizer,
        speech_seconds=exp.speech_seconds,
        enroll_seconds=exp.enroll_seconds,
        utt_style=exp.utt_style,
        seed=args.seed,
    )
    rng = jax.random.PRNGKey(args.seed)
    first = next(
        dataset.batches(args.batch_size, shuffle=False, drop_last=False)
    )
    first.pop("utt_ids", None)
    model, variables = build_model_and_variables(exp, rng, dev_batch=first)

    ckpt_dir = f"{args.expdir}/checkpoints"
    ave_dir = f"{ckpt_dir}/{AVE_SUBDIR}"
    if args.use_ave and latest_step(ave_dir) is not None:
        ckpt_dir = ave_dir
    if latest_step(ckpt_dir) is None:
        parser.error(f"no teacher checkpoint found in {ckpt_dir}")
    variables = None
    variables, step_i, epoch = restore_serving_variables(
        ckpt_dir, dtype, exp.train
    )
    logging.info(
        "teacher: step %d (epoch %d, mode %s) from %s",
        step_i, epoch, exp.train.mode, ckpt_dir,
    )

    def to_compute(tree):
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype)
            if np.dtype(getattr(x, "dtype", np.float32)) == np.float32
            else jnp.asarray(x),
            tree,
        )

    enc_vars = jax.jit(to_compute)({
        "params": variables["params"]["encoder"],
        "buffers": variables["buffers"]["encoder"],
    })
    dec_vars = jax.jit(to_compute)({"params": variables["params"]["decoder"]})
    jax.block_until_ready((enc_vars, dec_vars))
    encoder = QFormerTSEncoder(dims, exp.ts, dtype=dtype)
    decoder = TSDecoder(
        dims.replace(n_vocab=exp.model.vocab_size),
        startofprev_token=exp.model.startofprev,
        dtype=dtype,
        flat_self_cache=False,  # the distilled draft serves the spec path
    )

    from ..decode.search import DecodeConfig

    init_tokens = (
        exp.decode.init_tokens
        if exp.decode_init_tokens_explicit
        else (
            st.sot_sequence(args.language, "transcribe", True)
            if exp.model.vocab_size >= st.n_vocab
            else (exp.model.sos,)
        )
    )
    dcfg = DecodeConfig(
        max_new_tokens=args.max_new_tokens,
        eot=exp.model.eos,
        init_tokens=init_tokens,
        beam_size=1,
    )
    greedy = build_beam_decoder(decoder, dec_vars, dcfg)
    encode = jax.jit(
        lambda v, mel, fl, emel, el: encoder.apply(v, mel, fl, emel, el)
    )

    from ..audio.frontend import log_mel_spectrogram_jit

    # ---- teacher corpus: encoder memory + greedy transcripts ----
    mems, prompts, rows = [], [], []
    n = 0
    for batch in dataset.batches(
        args.batch_size, shuffle=False, drop_last=False
    ):
        utts = batch.pop("utt_ids", None)
        mel, fl = log_mel_spectrogram_jit(
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lens"]),
            n_mels=dims.n_mels,
        )
        emel, el = log_mel_spectrogram_jit(
            jnp.asarray(batch["enroll"]), jnp.asarray(batch["enroll_lens"]),
            n_mels=dims.n_mels,
        )
        memory, _, spk_prompt, _ = encode(enc_vars, mel, fl, emel, el)
        tokens, _ = greedy(memory, spk_prompt)
        b_utts = len(utts) if utts else args.batch_size
        take = min(b_utts, args.max_items - n)
        mems.append(np.asarray(memory[:take]))
        prompts.append(np.asarray(spk_prompt[:take]))
        rows.extend(strip_eot(np.asarray(tokens[:take]), dcfg.eot))
        n += take
        if n >= args.max_items:
            break
    memory = jnp.asarray(np.concatenate(mems))
    spk_prompt = jnp.asarray(np.concatenate(prompts))
    lmax = max(1, max(len(r) for r in rows))
    logging.info(
        "distillation corpus: %d utts, teacher output len %.1f mean",
        len(rows), float(np.mean([len(r) for r in rows])),
    )
    # greedy rows CONTINUE the init_tokens conditioning: the teacher-forced
    # context is [sot] + init_tokens[1:] + row (TSDecoder training-forward
    # convention == serving prefill [sop; prompt; init_tokens] + steps)
    prefix = np.asarray(init_tokens[1:], np.int32)
    full = np.full((len(rows), len(prefix) + lmax), -1, np.int32)
    full_lens = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        full[i, : len(prefix)] = prefix
        full[i, len(prefix) : len(prefix) + len(r)] = r
        full_lens[i] = len(prefix) + len(r)
    ys_in, mask = teacher_forcing_inputs(
        full, full_lens, sot=init_tokens[0], eot=dcfg.eot
    )

    draft_v, stats = distill_draft(
        decoder, dec_vars, args.draft_layers, memory, spk_prompt,
        ys_in, mask, steps=args.steps, lr=args.lr,
        batch_size=min(args.batch_size, len(rows)), seed=args.seed,
        log=lambda m: logging.info("%s", m),
    )
    logging.info("distill stats: %s", stats)

    meta = {
        "draft_layers": int(args.draft_layers),
        "teacher_step": int(step_i),
        "teacher_ckpt": ckpt_dir,
        "final_agreement": stats["final_agreement"],
        "final_loss": stats["final_loss"],
        "steps": int(args.steps),
        "corpus_items": int(len(rows)),
    }
    out = save_draft(args.out, draft_v, meta)
    logging.info("draft saved to %s (%s)", out, meta)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
