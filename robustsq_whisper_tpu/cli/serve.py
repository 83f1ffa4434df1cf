"""Online serving CLI: micro-batching HTTP transcription daemon.

The reference decodes offline only (stage 12, run_tswhisper.sh:67-90);
this daemon is the production-serving surface of the TPU build: one
compiled decode program (the same serving paths as cli.decode — Pallas
flash encoder, quantized cross-KV, DP shard_map / TP GSPMD), requests
coalesced into full device batches by serve/server.py.

Usage::

    python -m robustsq_whisper_tpu.cli.serve \
        --config conf/tswhisper/train_..._.yaml \
        --expdir exp/tswhisper --port 8080

    curl -s localhost:8080/v1/transcribe -d '{
      "speech_wav": "<base64 wav>", "enroll_wav": "<base64 wav>"}'
"""

from __future__ import annotations

import argparse
import dataclasses
import logging


def _str2bool(v: str) -> bool:
    lv = v.lower()
    if lv in ("true", "1", "yes", "on"):
        return True
    if lv in ("false", "0", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def _dev_batch(exp, batch: int = 2):
    """Synthetic init batch (model.init only reads shapes)."""
    import numpy as np

    sr = 16000
    s = int(exp.speech_seconds * sr)
    e = int(exp.enroll_seconds * sr)
    return {
        "speech": np.zeros((batch, s), np.float32),
        "speech_lens": np.full((batch,), s, np.int32),
        "enroll": np.zeros((batch, e), np.float32),
        "enroll_lens": np.full((batch,), e, np.int32),
        "text": np.ones((batch, 8), np.int32),
        "text_lens": np.full((batch,), 8, np.int32),
        "neg_logits": np.ones((batch, batch), np.float32),
        "spk_labels": np.zeros((batch,), np.int32),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--inference_config", default=None)
    parser.add_argument("--expdir", default=None)
    parser.add_argument("--tokenizer_assets", default=None)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="static device batch; the micro-batcher "
                        "coalesces concurrent requests up to this size")
    parser.add_argument("--max_wait_ms", type=float, default=15.0,
                        help="micro-batching window after the first queued "
                        "request")
    parser.add_argument("--language", default="en")
    parser.add_argument("--use_ave", type=_str2bool, default=True)
    parser.add_argument("--use_flash", type=_str2bool, default=True)
    parser.add_argument("--flash_tmaj", type=_str2bool, default=True)
    parser.add_argument("--gelu_approx", type=_str2bool, default=False)
    parser.add_argument("--int8_weights", type=_str2bool, default=False)
    parser.add_argument("--quantize_cross_kv", type=_str2bool, default=True,
                        help="fused quantized cross-attention decode kernel "
                        "(the decode loop's dominant HBM term; width from "
                        "--cross_kv_bits)")
    parser.add_argument("--cross_kv_bits", type=int, default=8, choices=(4, 8))
    parser.add_argument("--self_kv_bits", type=int, default=16, choices=(8, 16))
    parser.add_argument("--prefill_quantized", type=_str2bool, default=False)
    parser.add_argument(
        "--speculative_gamma", type=int, default=0,
        help="speculative greedy serving: propose this many tokens per "
        "round with a draft and verify them in one causal chunk "
        "(decode/speculative.py) — transcripts are the exact greedy "
        "output; throughput depends on the draft's acceptance rate on the "
        "served checkpoint (measure with cli.decode first). 0 = off; "
        "greedy only (beam_size 1)",
    )
    parser.add_argument(
        "--draft_layers", type=int, default=4,
        help="early-exit draft depth for --speculative_gamma",
    )
    parser.add_argument(
        "--draft_path", default=None,
        help="distilled draft head for --speculative_gamma (a dir written "
        "by cli.distill) — measured 1.25x over the greedy serving default "
        "at gamma 6 (docs/SERVING.md). Single-device only",
    )
    parser.add_argument("--enc_chunk", type=int, default=0)
    parser.add_argument("--data_parallel", type=_str2bool, default=True)
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--warmup", type=_str2bool, default=True,
                        help="compile the pipeline before accepting traffic")
    parser.add_argument("--compile_cache", default=None,
                        help="persistent XLA compilation cache dir; daemon "
                        "restarts at the same operating point skip the "
                        "multi-minute warmup compile")
    parser.add_argument("--max_queue", type=int, default=0,
                        help="admission-queue bound; beyond it requests shed "
                        "with 503 (0 = 4 device batches)")
    parser.add_argument("--max_body_mb", type=int, default=64,
                        help="reject request bodies over this size with 413")
    parser.add_argument("--result_timeout_s", type=float, default=120.0,
                        help="504 when a request has no result in this time")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )

    import jax
    import jax.numpy as jnp

    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..decode.search import DecodeConfig  # noqa: F401 (docs)
    from ..models import QFormerTSEncoder, TSDecoder
    from ..serve.engine import EngineConfig, TranscriptionEngine
    from ..serve.server import make_server
    from ..tokenizer.whisper_tokenizer import (
        load_tokenizer,
        special_tokens_for_vocab,
    )
    from ..train.checkpoint import latest_step
    from ..utils.config import load_experiment, load_yaml
    from .train import build_model_and_variables

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
    spec = max(0, args.speculative_gamma)
    if args.draft_path and not spec:
        parser.error("--draft_path requires --speculative_gamma > 0")
    if spec and tp > 1:
        parser.error(
            "--speculative_gamma is incompatible with --model_parallel: "
            "the ragged verify path is single-chip/DP only"
        )
    if spec and exp.decode.beam_size > 1:
        parser.error(
            "--speculative_gamma serves greedy only: the config's "
            f"decode beam_size is {exp.decode.beam_size}"
        )
    if args.draft_path and args.data_parallel and jax.device_count() > 1:
        logging.warning(
            "--draft_path serving is single-device; dropping --data_parallel"
        )
        args.data_parallel = False
    if tp > 1:
        assert jax.device_count() % tp == 0
        args.use_flash = False
        args.int8_weights = False
    exp = dataclasses.replace(
        exp, ts=dataclasses.replace(
            exp.ts,
            use_flash_attention=bool(args.use_flash),
            flash_tmaj=bool(args.use_flash) and bool(args.flash_tmaj),
            gelu_approx=bool(args.gelu_approx),
        )
    )
    dtype = jnp.bfloat16 if exp.compute_dtype == "bfloat16" else jnp.float32
    tokenizer = load_tokenizer(args.tokenizer_assets)
    st = special_tokens_for_vocab(exp.model.vocab_size)

    rng = jax.random.PRNGKey(args.seed)
    model, variables = build_model_and_variables(
        exp, rng, dev_batch=_dev_batch(exp)
    )

    if args.expdir:
        from ..train.eval import AVE_SUBDIR

        ckpt_dir = f"{args.expdir}/checkpoints"
        ave_dir = f"{ckpt_dir}/{AVE_SUBDIR}"
        if args.use_ave and latest_step(ave_dir) is not None:
            ckpt_dir = ave_dir
            logging.info("serving averaged n-best checkpoint %s", ave_dir)
        if latest_step(ckpt_dir) is not None:
            # weights-only restore shared with cli.decode: a full-state
            # restore template (params + Adam moments) next to the restored
            # copy OOMs the chip for a full-FT medium checkpoint
            from ..train.checkpoint import restore_serving_variables

            variables = None  # free the random-init template
            variables, step_i, epoch = restore_serving_variables(
                ckpt_dir, dtype, exp.train
            )
            logging.info(
                "restored step %d (epoch %d, mode %s) from %s",
                step_i, epoch, exp.train.mode, ckpt_dir,
            )

    enc_vars = {
        "params": variables["params"]["encoder"],
        "buffers": variables["buffers"]["encoder"],
    }
    dec_vars = {"params": variables["params"]["decoder"]}
    encoder = QFormerTSEncoder(dims, exp.ts, dtype=dtype)
    decoder = TSDecoder(
        dims.replace(n_vocab=exp.model.vocab_size),
        startofprev_token=exp.model.startofprev,
        dtype=dtype,
        cross_kv_bits=args.cross_kv_bits,
        self_kv_bits=args.self_kv_bits if tp == 1 else 16,
        # speculative decode needs the 5-D cache's per-row scatter writes
        flat_self_cache=tp == 1 and not spec,
    )

    draft_vars = None
    if args.draft_path:
        import numpy as np

        from ..train.distill import load_draft

        raw_draft, draft_meta = load_draft(args.draft_path)
        meta_d = int(draft_meta.get("draft_layers", args.draft_layers))
        if meta_d != args.draft_layers:
            logging.info(
                "--draft_layers %d -> %d (from the draft checkpoint meta)",
                args.draft_layers, meta_d,
            )
            args.draft_layers = meta_d
        # serving keeps weights in the compute dtype (same rationale as
        # cli.decode: decode is weight-bandwidth-bound)
        draft_vars = jax.jit(
            lambda tree: jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype)
                if np.dtype(getattr(x, "dtype", np.float32)) == np.float32
                else jnp.asarray(x),
                tree,
            )
        )(raw_draft)
        jax.block_until_ready(draft_vars)
        logging.info(
            "distilled draft: %s (teacher step %s, agreement %s)",
            args.draft_path, draft_meta.get("teacher_step"),
            draft_meta.get("final_agreement"),
        )

    dcfg = dataclasses.replace(
        exp.decode,
        quantize_weights=args.int8_weights,
        quantize_cross_kv=args.quantize_cross_kv,
        speculative_gamma=spec,
        draft_layers=args.draft_layers,
        eot=exp.model.eos,
        # same authority rule as cli.decode: an explicit decode_conf
        # init_tokens (e.g. the bare [sos] cli.train checkpoints are
        # conditioned on) wins over the pretrained-style sot sequence
        init_tokens=exp.decode.init_tokens
        if exp.decode_init_tokens_explicit
        else (
            st.sot_sequence(args.language, "transcribe", True)
            if exp.model.vocab_size >= st.n_vocab
            else (exp.model.sos,)
        ),
    )
    if args.prefill_quantized:
        dcfg = dataclasses.replace(
            dcfg, quantize_cross_kv=True, prefill_quantized=True
        )
    if tp > 1:
        dcfg = dataclasses.replace(
            dcfg, quantize_cross_kv=False, quantize_weights=False,
            prefill_quantized=False,
        )

    mesh = None
    batch_size = args.batch_size
    if tp > 1 or (args.data_parallel and jax.device_count() > 1):
        from ..parallel.mesh import make_mesh

        n = jax.device_count() // tp if args.data_parallel else 1
        mesh = make_mesh(n, tp)
        if batch_size % n:
            batch_size = ((batch_size + n - 1) // n) * n
            logging.info("rounded batch_size to %d (data axis %d)", batch_size, n)

    engine = TranscriptionEngine(
        encoder, enc_vars, decoder, dec_vars, tokenizer, dcfg,
        EngineConfig(
            batch_size=batch_size,
            speech_seconds=exp.speech_seconds,
            enroll_seconds=exp.enroll_seconds,
            enc_chunk=args.enc_chunk,
        ),
        mesh=mesh,
        draft_vars=draft_vars,
    )
    if args.warmup:
        logging.info("warmup compile ...")
        logging.info("warmup done in %.1fs", engine.warmup())

    server, batcher = make_server(
        engine, args.host, args.port, args.max_wait_ms,
        info={"config": args.config, "beam_size": exp.decode.beam_size},
        max_queue=args.max_queue,
        max_body_bytes=args.max_body_mb * 1024 * 1024,
        result_timeout_s=args.result_timeout_s,
    )
    host, port = server.server_address[:2]
    logging.info("serving on http://%s:%d (batch %d, wait %.0f ms)",
                 host, port, batch_size, args.max_wait_ms)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()
        server.server_close()


if __name__ == "__main__":
    main()
