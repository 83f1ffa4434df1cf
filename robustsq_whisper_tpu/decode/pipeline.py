"""End-to-end TS-ASR inference over a Kaldi data dir: the stage-12 decode
equivalent (reference run_tswhisper.sh:67-90 -> espnet2.bin.asr_inference).

Batched: frontend + TS encoder in one jit, KV-cache greedy/beam decode in a
second (weights ride as jit arguments), token stripping/detokenization and
WER/CER scoring on host. Writes ESPnet-style ``text`` (hyp) and ``score.txt``.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import (
    log_mel_spectrogram_jit,
    pcm16_to_float,
    to_pcm16,
)
from ..data import kaldi_io
from ..models.ts_decoder import TSDecoder
from ..models.ts_encoder import QFormerTSEncoder, SpkAdapterTSEncoder
from ..models.whisper.modules import AudioEncoder
from .scorer import cer, wer
from .search import DecodeConfig, build_beam_decoder, strip_eot

logger = logging.getLogger("robustsq_whisper_tpu.decode")


@dataclasses.dataclass
class DecodeResult:
    hyps: Dict[str, str]
    refs: Dict[str, str]
    metrics: Dict[str, float]
    audio_seconds: float
    wall_seconds: float

    @property
    def rtf(self) -> float:
        return self.audio_seconds / max(self.wall_seconds, 1e-9)


def chunked_encode(enc_fn, feats, feats_lens, efeats, efeats_lens, chunk):
    """Encode in sub-batches of ``chunk`` rows and concatenate — bounds the
    encoder's transient activation peak (flash + 4x-wide MLP intermediates)
    separately from the decode batch. ``chunk`` <= 0 or >= batch encodes in
    one call. Returns ``(memory, spk_prompt)``."""
    def pair(f, fl, ef, el):
        memory, _, spk_prompt, _ = enc_fn(f, fl, ef, el)
        return memory, spk_prompt

    return chunked_encode_args(
        pair, (feats, feats_lens, efeats, efeats_lens), chunk
    )


def embedding_encode_fn(encoder):
    """``enc_apply(vars, mel, flens, enroll_embed) -> (memory, prompt0)``
    for the embedding-enrollment decode contract: the prompt-free decoder
    expects an EMPTY (b, 0, n_state) speaker prompt. One definition shared
    by build_decode_fns, _build_embedding_decode_fns and train/eval.py's
    ValidWer so the eval path can never drift from the serving one."""
    def enc_apply(v, mel, fl, emb):
        memory, _ = encoder.apply(v, mel, fl, emb)
        prompt0 = jnp.zeros(
            (memory.shape[0], 0, memory.shape[-1]), memory.dtype
        )
        return memory, prompt0

    return enc_apply


def chunked_encode_args(enc_fn, args, chunk):
    """Generic sub-batched encode: ``enc_fn(*args) -> (memory, spk_prompt)``
    with every arg batch-leading. Shared by the Qformer (4-tuple) and
    embedding-enrollment (2-tuple) encode paths."""
    b = args[0].shape[0]
    if chunk <= 0 or chunk >= b:
        return enc_fn(*args)
    mems, prompts = [], []
    for s in range(0, b, chunk):
        m_c, p_c = enc_fn(*(a[s : s + chunk] for a in args))
        mems.append(m_c)
        prompts.append(p_c)
    return jnp.concatenate(mems, axis=0), jnp.concatenate(prompts, axis=0)


def build_decode_fns(
    encoder: QFormerTSEncoder,
    enc_vars: Any,
    decoder: TSDecoder,
    dec_vars: Any,
    dcfg: DecodeConfig,
    mesh: Optional[Any] = None,
    batch_size: Optional[int] = None,
    ctc_vars: Optional[Any] = None,
    draft_vars: Optional[Any] = None,
):
    """The serving program pair ``(encode, run)`` for every decode mode:
    single-device (greedy/beam/speculative), data-parallel shard_map, or
    tensor-parallel GSPMD. ``encode(enc_vars, mel, flens, emel, elens)``
    returns the encoder 4-tuple; ``run(memory, spk_prompt)`` returns
    ``(tokens, scores[, stats])``. Shared by the batch pipeline
    (decode_dataset) and the online server (serve/engine.py).

    Embedding-enrollment encoders (SpkAdapterTSEncoder) get
    ``encode(enc_vars, mel, flens, enroll_embed) -> (memory, empty_prompt)``
    instead — single-device or data-parallel; the decoder side is identical
    (prompt-free ``run``)."""
    if draft_vars is not None and not (
        dcfg.speculative_gamma > 0
        and mesh is None
        and dcfg.ctc_decode_weight == 0
    ):
        raise ValueError(
            "draft_vars (a distilled draft head) requires the single-device "
            "speculative path: speculative_gamma > 0, no mesh, no joint CTC"
        )
    if dcfg.ctc_decode_weight > 0:
        # joint CTC/attention decode (ESPnet beam-search parity options):
        # plain-jit program, single device (decode/joint.py)
        if mesh is not None:
            raise NotImplementedError(
                "ctc_decode_weight > 0 decodes on a single device (the "
                "joint scorer is the parity path, not the serving one); "
                "drop --data_parallel/--model_parallel"
            )
        if ctc_vars is None:
            raise ValueError(
                "ctc_decode_weight > 0 needs the CTC head weights: pass "
                "ctc_vars={'kernel': ..., 'bias': ...} (params.ctc.ctc_lo)"
            )
        from .joint import build_joint_beam_decoder

        emb = isinstance(encoder, SpkAdapterTSEncoder)
        prompt_frames = 0 if emb else encoder.prompt_len
        ctc_apply = lambda v, mem: mem @ v["kernel"] + v["bias"]
        run = build_joint_beam_decoder(
            decoder, dec_vars, ctc_apply, ctc_vars, dcfg,
            prompt_frames=prompt_frames,
        )
        if emb:
            return jax.jit(embedding_encode_fn(encoder)), run
        encode = jax.jit(
            lambda v, mel, fl, emel, el: encoder.apply(v, mel, fl, emel, el)
        )
        return encode, run
    if isinstance(encoder, SpkAdapterTSEncoder):
        return _build_embedding_decode_fns(
            encoder, enc_vars, decoder, dec_vars, dcfg, mesh, batch_size,
            draft_vars=draft_vars,
        )
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        # tensor-parallel serving (capacity mode): weights sharded over the
        # model axis under GSPMD, dense XLA path (decode/sharded.py)
        from .sharded import build_tp_decoder, build_tp_encoder

        assert batch_size is None or batch_size % mesh.shape.get("data", 1) == 0, (
            f"batch_size {batch_size} must be a multiple of the data-axis size "
            f"({mesh.shape.get('data', 1)})"
        )
        run = build_tp_decoder(decoder, dec_vars, dcfg, mesh)
        enc = build_tp_encoder(encoder, enc_vars, mesh)
        encode = lambda v, mel, fl, emel, el: enc(mel, fl, emel, el)
    elif mesh is not None and mesh.shape.get("data", 1) > 1:
        # data-parallel serving over the mesh: the TPU-native equivalent of
        # the reference's inference_nj process sharding (run_tswhisper.sh:42-44)
        from .sharded import build_sharded_decoder, build_sharded_encoder

        assert batch_size is None or batch_size % mesh.shape["data"] == 0, (
            f"batch_size {batch_size} must be a multiple of the data-axis size "
            f"({mesh.shape['data']})"
        )
        run = build_sharded_decoder(
            decoder, dec_vars, dcfg, mesh,
            return_stats=dcfg.speculative_gamma > 0,
        )
        enc = build_sharded_encoder(encoder, enc_vars, mesh)
        encode = lambda v, mel, fl, emel, el: enc(mel, fl, emel, el)
    elif dcfg.speculative_gamma > 0:
        # single-device speculative decode reports draft-acceptance stats —
        # the measurement that decides whether speculation pays off on this
        # checkpoint (decode/speculative.py cost model; docs/SERVING.md)
        from .speculative import build_speculative_decoder

        run = build_speculative_decoder(
            decoder, dec_vars, dcfg, return_stats=True,
            draft_vars=draft_vars,
        )
        encode = jax.jit(
            lambda v, mel, fl, emel, el: encoder.apply(v, mel, fl, emel, el)
        )
    else:
        run = build_beam_decoder(decoder, dec_vars, dcfg)
        encode = jax.jit(
            lambda v, mel, fl, emel, el: encoder.apply(v, mel, fl, emel, el)
        )
    return encode, run


def _build_embedding_decode_fns(
    encoder: SpkAdapterTSEncoder,
    enc_vars: Any,
    decoder: TSDecoder,
    dec_vars: Any,
    dcfg: DecodeConfig,
    mesh: Optional[Any] = None,
    batch_size: Optional[int] = None,
    draft_vars: Optional[Any] = None,
):
    """(encode, run) for the embedding-enrollment path (asr_my.sh
    --enroll_type embedding): ``encode(enc_vars, mel, flens, enroll_embed)``
    returns ``(memory, prompt0)`` where ``prompt0`` is the (b, 0, n_state)
    empty speaker prompt the prompt-free decoder expects."""
    assert not decoder.use_spk_prompt, (
        "embedding enrollment decodes prompt-free: build the TSDecoder with "
        "use_spk_prompt=False"
    )

    enc_apply = embedding_encode_fn(encoder)

    if mesh is not None and mesh.shape.get("model", 1) > 1:
        raise NotImplementedError(
            "tensor-parallel serving of the embedding-enrollment encoder is "
            "not wired up (the TS flagship path is the Qformer encoder); use "
            "--model_parallel 1"
        )
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from ..parallel.mesh import DATA_AXIS
        from .sharded import build_sharded_decoder

        P = jax.sharding.PartitionSpec
        repl, data = P(), P(DATA_AXIS)
        body = jax.shard_map(
            enc_apply, mesh=mesh,
            in_specs=(repl, data, data, data), out_specs=(data, data),
            check_vma=False,
        )
        jitted = jax.jit(body)
        enc_vars_repl = jax.device_put(
            enc_vars, jax.sharding.NamedSharding(mesh, repl)
        )
        sh = jax.sharding.NamedSharding(mesh, data)

        def encode(v, mel, fl, emb):
            del v  # weights placed once at build time
            return jitted(
                enc_vars_repl,
                *(jax.device_put(t, sh) for t in (mel, fl, emb)),
            )

        run = build_sharded_decoder(
            decoder, dec_vars, dcfg, mesh,
            return_stats=dcfg.speculative_gamma > 0,
        )
        return encode, run
    if dcfg.speculative_gamma > 0:
        from .speculative import build_speculative_decoder

        run = build_speculative_decoder(
            decoder, dec_vars, dcfg, return_stats=True,
            draft_vars=draft_vars,
        )
    else:
        run = build_beam_decoder(decoder, dec_vars, dcfg)
    return jax.jit(enc_apply), run


def decode_dataset(
    encoder: QFormerTSEncoder,
    enc_vars: Any,
    decoder: TSDecoder,
    dec_vars: Any,
    dataset: Any,  # KaldiTSDataset
    tokenizer: Any,
    dcfg: DecodeConfig,
    batch_size: int = 8,
    output_dir: Optional[str] = None,
    mesh: Optional[Any] = None,
    enc_chunk: int = 0,
    fns: Optional[Any] = None,
    ctc_vars: Optional[Any] = None,
    draft_vars: Optional[Any] = None,
) -> DecodeResult:
    # ``fns`` = a prebuilt (encode, run) pair (build_decode_fns contract) —
    # lets a caller that decodes repeatedly with changing weights (e.g. the
    # per-epoch valid-WER pass, train/eval.py) reuse one compiled program
    # instead of rebuilding/recompiling here every call.
    encode, run = fns if fns is not None else build_decode_fns(
        encoder, enc_vars, decoder, dec_vars, dcfg, mesh, batch_size,
        ctc_vars=ctc_vars, draft_vars=draft_vars,
    )

    hyps: Dict[str, str] = {}
    refs: Dict[str, str] = {}
    segments: Dict[str, list] = {}
    spec_totals = np.zeros(3, np.int64)  # chunks, accepted, emitted
    audio_sec = 0.0
    t0 = time.time()

    def consume(pending) -> None:
        """Host half of one batch: fetch tokens, detokenize, score refs."""
        nonlocal audio_sec
        utts, speech_lens, tokens, stats = pending
        tokens = np.asarray(tokens)  # blocks until the chip finishes this batch
        if stats is not None:
            stats = {k: np.asarray(v) for k, v in stats.items()}
        for i, utt in enumerate(utts):
            if utt in hyps:  # drop_last=False wraps; skip duplicates
                continue
            ids = strip_eot(tokens[i : i + 1], dcfg.eot)[0]
            if dcfg.with_timestamps:
                from .timestamps import segments_from_tokens

                segments[utt] = segments_from_tokens(
                    ids, tokenizer, dcfg.timestamp_begin
                )
                ids = [t for t in ids if t < dcfg.timestamp_begin]
            hyps[utt] = tokenizer.decode(ids).strip()
            refs[utt] = dataset.text.get(utt, "")
            audio_sec += float(speech_lens[i]) / dataset.sample_rate
            if stats is not None:
                spec_totals[:] += [
                    stats["chunks"][i], stats["accepted"][i],
                    stats["emitted"][i],
                ]

    # Double-buffered loop: jax dispatch is async, so the chip runs batch i
    # while the host loads/decodes the audio of batch i+1 and detokenizes
    # batch i-1 — the host-side FLAC/WAV decode and BPE detokenization never
    # sit on the device's critical path (the reference serializes these in
    # espnet2.bin.asr_inference's per-utterance loop).
    pending = None
    n_mels = encoder.dims.n_mels
    if enc_chunk < 0:
        raise ValueError(f"enc_chunk must be >= 0, got {enc_chunk}")
    if enc_chunk and mesh is not None:
        # each encode sub-batch must still divide the mesh data axis
        n_data = mesh.shape.get("data", 1)
        rounded = -(-enc_chunk // n_data) * n_data
        if rounded != enc_chunk:
            logger.info(
                "rounded enc_chunk %d -> %d (multiple of the %d-way data axis)",
                enc_chunk, rounded, n_data,
            )
            enc_chunk = rounded
    emb_mode = isinstance(encoder, SpkAdapterTSEncoder)
    for batch in dataset.batches(batch_size, shuffle=False, drop_last=False):
        # int16 wire transport: half the host->device bytes per batch
        # (bit-faithful for WAV/FLAC-sourced rows; audio/frontend.py)
        feats, feats_lens = log_mel_spectrogram_jit(
            pcm16_to_float(jnp.asarray(to_pcm16(batch["speech"]))),
            jnp.asarray(batch["speech_lens"]),
            n_mels=n_mels,
        )
        if emb_mode:
            memory, spk_prompt = chunked_encode_args(
                lambda *a: encode(enc_vars, *a),
                (feats, feats_lens, jnp.asarray(batch["enroll_embed"])),
                enc_chunk,
            )
        else:
            efeats, efeats_lens = log_mel_spectrogram_jit(
                pcm16_to_float(jnp.asarray(to_pcm16(batch["enroll"]))),
                jnp.asarray(batch["enroll_lens"]),
                n_mels=n_mels,
            )
            memory, spk_prompt = chunked_encode(
                lambda *a: encode(enc_vars, *a),
                feats, feats_lens, efeats, efeats_lens, enc_chunk,
            )
        if dcfg.ctc_decode_weight > 0:
            # the joint CTC scorer needs per-utterance encoder lengths so pad
            # frames beyond each utterance stay out of the prefix scores and
            # the ratio length bounds (joint.py masks frames >= mem_lens -
            # prompt_frames); lens INCLUDE the leading prompt frames, exactly
            # like the encoder's own x_lens output (ts_encoder.py:281-282)
            prompt_frames = 0 if emb_mode else encoder.prompt_len
            mem_lens = (
                AudioEncoder.output_lengths(
                    feats_lens, memory.shape[1] - prompt_frames
                )
                + prompt_frames
            )
            res = run(memory, spk_prompt, mem_lens)
        else:
            res = run(memory, spk_prompt)
        tokens, stats = res[0], (res[2] if len(res) == 3 else None)
        if pending is not None:
            consume(pending)
        pending = (batch["utt_ids"], batch["speech_lens"], tokens, stats)
    if pending is not None:
        consume(pending)
    wall = time.time() - t0

    extra: Dict[str, float] = {}
    if dcfg.speculative_gamma > 0:
        # always report the counters when the speculative path ran — a row
        # that emits eot at the prefill step runs zero draft/verify chunks
        # (chunks can legitimately total 0 on e.g. silence-heavy data)
        chunks, accepted, emitted = (int(x) for x in spec_totals)
        extra = {
            # E[n_acc]/gamma — the cost-model acceptance (module docstring)
            "spec_acceptance_rate": round(
                accepted / max(chunks * dcfg.speculative_gamma, 1), 4
            ),
            "spec_tokens_per_chunk": round(emitted / max(chunks, 1), 3),
            "spec_chunks": float(chunks),
        }
        logger.info(
            "speculative decode: %.1f%% draft acceptance, %.2f tokens/chunk "
            "(gamma=%d draft_layers=%d)",
            100 * extra["spec_acceptance_rate"],
            extra["spec_tokens_per_chunk"],
            dcfg.speculative_gamma, dcfg.draft_layers,
        )

    if segments and output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "segments"), "w") as f:
            for utt in sorted(segments):
                for s0, s1, text in segments[utt]:
                    f.write(f"{utt} {s0:.2f} {s1:.2f} {text}\n")
    return score_and_write(hyps, refs, audio_sec, wall, output_dir, extra)


def score_and_write(
    hyps: Dict[str, str],
    refs: Dict[str, str],
    audio_sec: float,
    wall: float,
    output_dir: Optional[str] = None,
    extra_metrics: Optional[Dict[str, float]] = None,
) -> DecodeResult:
    """Shared tail of every dataset decode: WER/CER/RTF metrics + the
    ESPnet-style ``text``/``score.txt`` outputs."""
    pairs = [(refs[u], hyps[u]) for u in hyps if refs.get(u)]
    metrics: Dict[str, float] = dict(extra_metrics or {})
    if pairs:
        r, h = zip(*pairs)
        metrics.update(wer(list(r), list(h)))
        metrics.update(cer(list(r), list(h)))
    metrics["rtf"] = audio_sec / max(wall, 1e-9)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        kaldi_io.write_scp(os.path.join(output_dir, "text"), hyps)
        with open(os.path.join(output_dir, "score.txt"), "w") as f:
            for k, v in sorted(metrics.items()):
                f.write(f"{k} {v}\n")
    return DecodeResult(hyps, refs, metrics, audio_sec, wall)
