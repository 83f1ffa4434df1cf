"""Decode/eval CLI — the stage-12 equivalent of the reference recipe
(/root/reference/run_tswhisper.sh:67-90, ``--tgtspk_infer True`` + beam
config ``decode_asr_whisper_beam1.yaml`` -> espnet2.bin.asr_inference).

Usage::

    python -m robustsq_whisper_tpu.cli.decode \
        --config conf/tswhisper/train_..._.yaml \
        --inference_config conf/tswhisper/decode_asr_whisper_beam1.yaml \
        --data_dir dump/raw/test_sglspk \
        --expdir exp/tswhisper --output_dir exp/tswhisper/decode_test
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys


def _str2bool(v: str) -> bool:
    """Strict boolean flag values: true/false/1/0/yes/no/on/off."""
    lv = v.lower()
    if lv in ("true", "1", "yes", "on"):
        return True
    if lv in ("false", "0", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--inference_config", default=None)
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--expdir", default=None)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--tokenizer_assets", default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--language", default="en")
    parser.add_argument(
        "--use_flash", type=_str2bool, default=True,
        help="Pallas flash kernel for encoder self-attn (forward-only; "
        "pass false to decode on the XLA path, e.g. for numerics debugging)",
    )
    parser.add_argument(
        "--flash_tmaj", type=_str2bool, default=True,
        help="transposed-layout flash self-attention (inference): q/k/v "
        "projections emit (b, n_state, T) straight into the (bh, d, T) "
        "kernel, eliminating the per-layer head-split layout copies "
        "(~12%% off a medium encoder layer, KERNELS.md §8). Only active "
        "when --use_flash is true; same online-softmax math",
    )
    parser.add_argument(
        "--use_ave", type=_str2bool, default=True,
        help="decode from the averaged n-best checkpoint when present "
        "(the reference stage 12 decodes valid.acc.ave); pass false for "
        "the latest raw checkpoint",
    )
    parser.add_argument(
        "--cross_kv_bits", type=int, default=8, choices=(4, 8),
        help="quantized decode cross-KV width when the experiment config "
        "enables quantize_cross_kv: 8 (int8, default) or 4 (packed int4 — "
        "half the decode loop's dominant HBM read again; asymmetric "
        "per-channel quantization, see ops/decode_attention.py)",
    )
    parser.add_argument(
        "--self_kv_bits", type=int, default=16, choices=(8, 16),
        help="decode self-attention cache width: 16 (dense bf16, default) "
        "or 8 (int8 with per-position scales and native integer dots — "
        "halves the second-largest per-token HBM read at long outputs; "
        "see TextDecoder.step)",
    )
    parser.add_argument(
        "--gelu_approx", type=_str2bool, default=False,
        help="tanh-approximate GELU in the encoder (~1e-3 abs deviation "
        "from the reference's exact erf GELU; measurably faster — the "
        "exact form's erfc polynomial is the most expensive encoder "
        "fusion on TPU). Default off for strict reference parity",
    )
    parser.add_argument(
        "--int8_weights", type=_str2bool, default=False,
        help="W8A8 int8 matmuls in the decode token loop (per-output-channel "
        "int8 kernels quantized once at startup, dynamic activation scales, "
        "native int8 MXU dots — halves the per-token weight read; prefill "
        "stays dense fp, see ops/quant.py)",
    )
    parser.add_argument(
        "--data_parallel", type=_str2bool, default=True,
        help="shard the decode batch over all visible devices (shard_map on "
        "the mesh data axis — the TPU-native equivalent of the reference's "
        "inference_nj process sharding). No-op on a single chip",
    )
    parser.add_argument(
        "--long_audio", type=_str2bool, default=False,
        help="decode every utterance at FULL length via batched 30 s "
        "windows sharing one speaker prompt (decode/long_audio.py) instead "
        "of the fixed-window path that crops to the config window like the "
        "reference's --max_wav_duration 30",
    )
    parser.add_argument(
        "--chunk_seconds", type=float, default=30.0,
        help="window length for --long_audio",
    )
    parser.add_argument(
        "--prefill_quantized", type=_str2bool, default=False,
        help="quantize the cross K/V inside the projection scan and prefill "
        "on the quantized form — caps the decode session's HBM peak (the "
        "dense stacked cross-KV, 15.9 GB for large-v3 at batch 64); "
        "requires a quantized cross-KV config (decode/search.py)",
    )
    parser.add_argument(
        "--enc_chunk", type=int, default=0,
        help="run the encoder in sub-batches of this size (0 = full batch): "
        "bounds the encoder's transient activation peak separately from the "
        "decode batch for large models",
    )
    parser.add_argument(
        "--speculative_gamma", type=int, default=0,
        help="speculative greedy decode: propose this many tokens per round "
        "with an early-exit draft (--draft_layers decoder layers + the "
        "shared head) and verify them in one causal multi-token chunk — the "
        "per-token HBM reads amortize over the accepted run "
        "(decode/speculative.py). Output is the exact greedy transcript; "
        "speed depends on the draft's acceptance rate, a property of the "
        "TRAINED weights — measure before enabling in production. 0 = off; "
        "greedy only (beam_size 1)",
    )
    parser.add_argument(
        "--draft_layers", type=int, default=4,
        help="early-exit draft depth for --speculative_gamma",
    )
    parser.add_argument(
        "--draft_path", default=None,
        help="distilled draft head for --speculative_gamma (a dir written "
        "by cli.distill / train.distill.save_draft). Replaces the "
        "self-drafting early exit with trained draft weights — measured "
        "95.8%% acceptance / 1.14x vs plain greedy at medium dims "
        "(docs/SERVING.md); output is still the exact greedy transcript. "
        "Single-device only",
    )
    parser.add_argument(
        "--ctc_weight", type=float, default=0.0,
        help="decode-time joint CTC/attention scoring weight (ESPnet "
        "beam-search ctc_weight): combined score = (1-w)*attention + "
        "w*CTC-prefix over the attention-preselected candidate set "
        "(decode/joint.py). 0 = attention-only (default; the named "
        "reference decode config). Single-device path",
    )
    parser.add_argument(
        "--pre_beam", type=int, default=8,
        help="candidates per hypothesis the CTC partial scorer evaluates "
        "(ESPnet pre-beam) when --ctc_weight > 0",
    )
    parser.add_argument(
        "--maxlenratio", type=float, default=0.0,
        help="output length cap relative to encoder frames (ESPnet "
        "maxlenratio); 0 keeps the absolute max_new_tokens semantics",
    )
    parser.add_argument(
        "--minlenratio", type=float, default=0.0,
        help="eot suppressed below this fraction of encoder frames (ESPnet "
        "minlenratio); 0 keeps absolute min_new_tokens",
    )
    parser.add_argument(
        "--min_new_tokens", type=int, default=0,
        help="suppress <|endoftext|> until this many tokens were emitted per "
        "utterance (the ESPnet minlenratio analog, absolute count; 0 = off)",
    )
    parser.add_argument(
        "--model_parallel", type=int, default=1,
        help="shard the model WEIGHTS (and KV caches) over this many devices "
        "(tensor parallelism via GSPMD, parallel/mesh.py rules) — the "
        "capacity mode for checkpoints that exceed one chip's HBM. Forces "
        "the dense XLA decode path (Pallas serving kernels need local "
        "shapes); composes with --data_parallel over the remaining devices",
    )
    parser.add_argument(
        "--timestamps", type=_str2bool, default=False,
        help="Whisper timestamp-token decoding: drop <|notimestamps|> from "
        "the init sequence and constrain sampling with the timestamp rules "
        "(pairs, monotonic, first-token window); writes a `segments` file "
        "of (start_s, end_s, text) next to the text output. Greedy only",
    )
    parser.add_argument("--enroll_type", default=None,
                        choices=["audio", "embedding"],
                        help="enrollment modality (asr_my.sh --enroll_type): "
                        "audio = Qformer on enrollment waveform; embedding = "
                        "precomputed stage-103 speaker embeddings via the "
                        "block-0 SpkAdapter/CLN encoder. Overrides "
                        "encoder_conf.enroll_type")
    parser.add_argument("--enroll_prefix", default="resnet",
                        help="embedding scp basename in the data dir "
                        "(asr_my.sh --enroll_prefix)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )

    import jax
    import jax.numpy as jnp

    from ..data.dataset import KaldiTSDataset
    from ..decode.pipeline import decode_dataset
    from ..models import TSDecoder, QFormerTSEncoder
    from ..tokenizer.whisper_tokenizer import load_tokenizer, special_tokens_for_vocab
    import numpy as np

    from ..train.checkpoint import latest_step
    from ..utils.config import load_experiment, load_yaml

    exp = load_experiment(args.config)
    if args.inference_config:
        inf = load_yaml(args.inference_config)
        if "decode_conf" in inf:
            exp = dataclasses.replace(
                exp,
                decode=dataclasses.replace(
                    exp.decode, **{
                        k: (tuple(v) if k == "init_tokens" else v)
                        for k, v in inf["decode_conf"].items()
                    }
                ),
                decode_init_tokens_explicit=(
                    exp.decode_init_tokens_explicit
                    or "init_tokens" in inf["decode_conf"]
                ),
            )

    dims = exp.resolved_dims()
    tp = max(1, args.model_parallel)
    if tp > 1:
        assert jax.device_count() % tp == 0, (
            f"--model_parallel {tp} must divide {jax.device_count()} devices"
        )
        # TP serving runs the dense XLA program under GSPMD; the Pallas
        # serving kernels need local shapes (decode/sharded.py)
        if args.use_flash or args.int8_weights or args.cross_kv_bits == 4:
            logging.info(
                "--model_parallel: forcing the dense XLA path "
                "(flash/quantized-serving knobs are single-chip/DP only)"
            )
        args.use_flash = False
        args.int8_weights = False
    # inference is forward-only: the Pallas flash kernel is safe and ~1.5x
    # faster on the long encoder self-attention (disable via --use_flash
    # false). The flag is authoritative either way — a config-enabled
    # use_flash_attention must also be CLEARED under --model_parallel
    # (build_tp_encoder needs the Pallas-free encoder) or --use_flash false.
    # (--gelu_approx gets the same authoritative-flag semantics)
    exp = dataclasses.replace(
        exp, ts=dataclasses.replace(
            exp.ts,
            use_flash_attention=bool(args.use_flash),
            flash_tmaj=bool(args.use_flash) and bool(args.flash_tmaj),
            gelu_approx=bool(args.gelu_approx),
        )
    )
    if args.enroll_type is not None:
        exp = dataclasses.replace(
            exp, ts=dataclasses.replace(exp.ts, enroll_type=args.enroll_type)
        )
    emb_mode = exp.ts.enroll_type == "embedding"
    if emb_mode and tp > 1:
        parser.error(
            "--model_parallel serving of the embedding-enrollment encoder is "
            "not wired up; decode with --model_parallel 1"
        )
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
        enroll_type=exp.ts.enroll_type,
        enroll_prefix=args.enroll_prefix,
    )
    logging.info("decoding %d utterances", len(dataset))

    from .train import build_model_and_variables

    rng = jax.random.PRNGKey(args.seed)
    # drop_last=False: a data dir smaller than the batch size must still
    # yield the init batch (batches() wraps to a full batch)
    first = next(
        dataset.batches(args.batch_size, shuffle=False, drop_last=False)
    )
    first.pop("utt_ids", None)
    model, variables = build_model_and_variables(exp, rng, dev_batch=first)

    if args.expdir:
        from ..train.eval import AVE_SUBDIR

        ckpt_dir = f"{args.expdir}/checkpoints"
        ave_dir = f"{ckpt_dir}/{AVE_SUBDIR}"
        if args.use_ave and latest_step(ave_dir) is not None:
            ckpt_dir = ave_dir
            logging.info("using averaged n-best checkpoint %s", ave_dir)
        if latest_step(ckpt_dir) is not None:
            from ..train.checkpoint import restore_serving_variables

            variables = None  # free the random-init template
            variables, step_i, epoch = restore_serving_variables(
                ckpt_dir, dtype, exp.train
            )
            logging.info(
                "restored step %d (epoch %d, mode %s) from %s",
                step_i, epoch, exp.train.mode, ckpt_dir,
            )

    # split the combined variables into encoder/decoder scopes; serving
    # keeps weights in the COMPUTE dtype (decode is weight-bandwidth-bound:
    # f32 params would double every per-token weight read for no accuracy
    # benefit at inference — same rationale as bench.py)
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
    if emb_mode:
        from ..models.ts_encoder import SpkAdapterTSEncoder

        encoder = SpkAdapterTSEncoder.from_config(dims, exp.ts, dtype=dtype)
    else:
        encoder = QFormerTSEncoder(dims, exp.ts, dtype=dtype)
    spec = max(0, args.speculative_gamma)
    if spec and tp > 1:
        parser.error(
            "--speculative_gamma is incompatible with --model_parallel: "
            "the ragged verify path is single-chip/DP only"
        )
    decoder = TSDecoder(
        dims.replace(n_vocab=exp.model.vocab_size),
        startofprev_token=exp.model.startofprev,
        use_spk_prompt=not emb_mode,
        dtype=dtype,
        cross_kv_bits=args.cross_kv_bits,
        self_kv_bits=args.self_kv_bits if tp == 1 else 16,
        # speculative decode needs the 5-D cache's per-row scatter writes
        flat_self_cache=tp == 1 and not spec,
    )

    draft_vars = None
    if args.draft_path:
        if not spec:
            parser.error("--draft_path requires --speculative_gamma > 0")
        if args.long_audio:
            parser.error("--draft_path is incompatible with --long_audio")
        from ..train.distill import load_draft

        raw_draft, draft_meta = load_draft(args.draft_path)
        meta_d = int(draft_meta.get("draft_layers", args.draft_layers))
        if meta_d != args.draft_layers:
            logging.info(
                "--draft_layers %d -> %d (from the draft checkpoint meta)",
                args.draft_layers, meta_d,
            )
            args.draft_layers = meta_d
        draft_vars = jax.jit(to_compute)(raw_draft)
        jax.block_until_ready(draft_vars)
        if args.data_parallel and jax.device_count() > 1:
            logging.warning(
                "--draft_path decoding is single-device; dropping "
                "--data_parallel"
            )
            args.data_parallel = False
        logging.info(
            "distilled draft: %s (teacher step %s, agreement %s)",
            args.draft_path, draft_meta.get("teacher_step"),
            draft_meta.get("final_agreement"),
        )

    dcfg = dataclasses.replace(
        exp.decode,
        quantize_weights=args.int8_weights,
        speculative_gamma=spec,
        draft_layers=args.draft_layers,
        min_new_tokens=max(0, args.min_new_tokens),
        with_timestamps=bool(args.timestamps),
        timestamp_begin=st.timestamp_begin,
        ctc_decode_weight=max(0.0, args.ctc_weight),
        pre_beam=max(2, args.pre_beam),
        maxlenratio=max(0.0, args.maxlenratio),
        minlenratio=max(0.0, args.minlenratio),
        eot=exp.model.eos,
        # An EXPLICIT decode_conf.init_tokens in the experiment/inference
        # yaml is authoritative: checkpoints trained by cli.train condition
        # on [sos; text] (ESPnet semantics — its whisper beam search starts
        # from bare sot), so decoding them with the full OpenAI sot sequence
        # would condition on lang/task tokens the model never saw (measured:
        # that mismatch free-decodes an acc-0.996 overfit checkpoint to WER
        # 1.34 garbage). Explicitness is a config-load flag, NOT a
        # value-vs-default comparison — the case that matters is precisely
        # an explicit bare [sos], which equals the default. The sot-sequence
        # fallback serves converted pretrained checkpoints, which know the
        # full sequence. --timestamps always rebuilds the sequence (it must
        # drop <|notimestamps|>).
        init_tokens=exp.decode.init_tokens
        if exp.decode_init_tokens_explicit and not args.timestamps
        else (
            st.sot_sequence(args.language, "transcribe", not args.timestamps)
            if exp.model.vocab_size >= st.n_vocab
            else (exp.model.sos,)
        ),
    )
    if dcfg.with_timestamps and exp.model.vocab_size < st.n_vocab:
        parser.error(
            "--timestamps needs the full Whisper vocabulary (the timestamp "
            f"tokens start at id {st.timestamp_begin}); this checkpoint has "
            f"vocab_size {exp.model.vocab_size}"
        )
    if dcfg.with_timestamps and (
        exp.decode.beam_size > 1 or spec or args.long_audio
        or dcfg.ctc_decode_weight > 0
    ):
        parser.error(
            "--timestamps is plain-greedy only: incompatible with beam "
            "sizes > 1, --speculative_gamma, --long_audio and --ctc_weight "
            "(the joint decoder applies no timestamp rules)"
        )
    ctc_vars = None
    if dcfg.ctc_decode_weight > 0:
        if spec or args.long_audio or tp > 1:
            parser.error(
                "--ctc_weight joint decoding is the single-device plain "
                "path: incompatible with --speculative_gamma, --long_audio "
                "and --model_parallel"
            )
        # single-device joint path: no DP mesh
        if args.data_parallel:
            logging.warning(
                "--ctc_weight joint decoding is single-device; dropping "
                "--data_parallel"
            )
        args.data_parallel = False
        ctc_vars = variables["params"]["ctc"]["ctc_lo"]
    if args.prefill_quantized:
        # prefill on the quantized cross-KV (implies a quantized token loop)
        dcfg = dataclasses.replace(
            dcfg, quantize_cross_kv=True, prefill_quantized=True
        )
    if tp > 1:
        dcfg = dataclasses.replace(
            dcfg, quantize_cross_kv=False, quantize_weights=False,
            prefill_quantized=False,
        )
    if dcfg.ctc_decode_weight > 0:
        # the joint scorer is the dense parity path (decode/joint.py): it
        # reads neither the quantized cross-KV nor the W8A8 step weights, so
        # surface the reset instead of letting the flags look honored
        if (dcfg.quantize_cross_kv or dcfg.quantize_weights
                or dcfg.prefill_quantized):
            logging.warning(
                "--ctc_weight joint decoding runs fully dense; ignoring "
                "--int8_weights/--prefill_quantized/quantized cross-KV"
            )
        dcfg = dataclasses.replace(
            dcfg, quantize_cross_kv=False, quantize_weights=False,
            prefill_quantized=False,
        )
    mesh = None
    batch_size = args.batch_size
    if args.long_audio and emb_mode:
        parser.error(
            "--long_audio windows share one Qformer speaker prompt and is "
            "audio-enrollment only; the embedding path decodes fixed windows"
        )
    if args.long_audio and tp > 1:
        parser.error(
            "--long_audio decodes per-utterance window batches on one device "
            "and cannot shard the weights; it is incompatible with "
            "--model_parallel (use the fixed-window path for TP serving)"
        )
    if not args.long_audio and (
        tp > 1 or (args.data_parallel and jax.device_count() > 1)
    ):
        from ..parallel.mesh import make_mesh

        n = jax.device_count() // tp if args.data_parallel else 1
        mesh = make_mesh(n, tp)
        if batch_size % n:
            batch_size = ((batch_size + n - 1) // n) * n
            logging.info(
                "rounded batch_size %d -> %d (multiple of %d data shards)",
                args.batch_size, batch_size, n,
            )
        logging.info(
            "sharded decode over %d devices (data=%d, model=%d)",
            n * tp, n, tp,
        )

    if args.long_audio:
        from ..decode.long_audio import decode_dataset_long

        result = decode_dataset_long(
            encoder, enc_vars, decoder, dec_vars, dataset, tokenizer, dcfg,
            chunk_seconds=args.chunk_seconds, output_dir=args.output_dir,
            window_batch=batch_size,
        )
    else:
        result = decode_dataset(
            encoder, enc_vars, decoder, dec_vars, dataset, tokenizer, dcfg,
            batch_size=batch_size, output_dir=args.output_dir, mesh=mesh,
            enc_chunk=args.enc_chunk, ctc_vars=ctc_vars,
            draft_vars=draft_vars,
        )
    logging.info(
        "decoded %d utts in %.1fs (RTF %.1fx): %s",
        len(result.hyps), result.wall_seconds, result.rtf,
        " ".join(f"{k}={v:.4f}" for k, v in sorted(result.metrics.items())),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
