"""Batched online transcription engine.

One compiled (encode, run) program pair — the exact serving paths of the
offline pipeline (decode/pipeline.py::build_decode_fns: Pallas flash
encoder, quantized cross-KV decode, DP shard_map / TP GSPMD modes) —
driven at a FIXED batch size so every request rides the same XLA
executable. Short requests are zero-padded into the 30 s window exactly
like the offline KaldiTSDataset rows; unused batch rows repeat row 0 and
are dropped on the host.

The reference has no online path (its decode is the stage-12 batch job);
this is the serving half the TPU build adds on top of parity.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from ..audio.frontend import (
    log_mel_spectrogram_jit,
    pcm16_to_float,
    to_pcm16,
)
from ..decode.pipeline import build_decode_fns, chunked_encode
from ..decode.search import DecodeConfig, strip_eot


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    batch_size: int = 8
    speech_seconds: float = 30.0
    enroll_seconds: float = 10.0
    sample_rate: int = 16000
    # encoder sub-batching (decode/pipeline.py::chunked_encode); 0 = off
    enc_chunk: int = 0
    # stage audio host->device as int16 (halved wire bytes; bit-faithful
    # for WAV/FLAC-sourced audio — see audio/frontend.py PCM16 helpers and
    # docs/KERNELS.md §10). "float32" keeps the exact float path.
    transport: str = "int16"


class TranscriptionEngine:
    """Thread-safe transcription of (speech, enrollment) pairs.

    ``transcribe`` accepts 1..batch_size items; the device always runs the
    full static batch (padding rows repeat row 0), so there is exactly one
    compilation per process and tail batches cost the same as full ones —
    the micro-batcher's job is to keep them full.
    """

    def __init__(
        self,
        encoder: Any,
        enc_vars: Any,
        decoder: Any,
        dec_vars: Any,
        tokenizer: Any,
        dcfg: DecodeConfig,
        cfg: EngineConfig = EngineConfig(),
        mesh: Optional[Any] = None,
        draft_vars: Optional[Any] = None,
    ) -> None:
        import jax.numpy as jnp  # deferred: engine is importable without jax init

        self._jnp = jnp
        self.cfg = cfg
        self.dcfg = dcfg
        self.tokenizer = tokenizer
        self.n_mels = encoder.dims.n_mels
        self.enc_vars = enc_vars
        # draft_vars: a distilled draft head (train/distill.py) switches the
        # run program to greedy-exact speculative decode — same transcripts,
        # fewer per-token HBM reads (docs/SERVING.md "Speculative decode")
        self.encode, self.run = build_decode_fns(
            encoder, enc_vars, decoder, dec_vars, dcfg, mesh, cfg.batch_size,
            draft_vars=draft_vars,
        )
        # one compiled program, one device queue: serialize compute callers;
        # staging (host pack + transfer + mel dispatch) has its own lock so
        # the NEXT batch can stage while the device runs the current one
        # (serve/server.py pipelines the two through separate threads)
        self._lock = threading.Lock()
        self._stage_lock = threading.Lock()
        self.compiled = False

    # ---- audio shaping ----

    def _fit(self, audio: np.ndarray, seconds: float) -> Tuple[np.ndarray, int]:
        """Zero-pad/crop to the static window; returns (row, true_len).
        Rows are int16 under the default int16 transport (wire dtype —
        dequantized on device by ``transcribe``)."""
        n = int(round(seconds * self.cfg.sample_rate))
        i16 = self.cfg.transport == "int16"
        row = np.zeros((n,), np.int16 if i16 else np.float32)
        ln = min(len(audio), n)
        clip = np.asarray(audio[:ln], np.float32)
        row[:ln] = to_pcm16(clip) if i16 else clip
        return row, ln

    def _pack(
        self, items: Sequence[Tuple[np.ndarray, np.ndarray]]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        b = self.cfg.batch_size
        if not 1 <= len(items) <= b:
            raise ValueError(f"1..{b} items required, got {len(items)}")
        s_len = int(round(self.cfg.speech_seconds * self.cfg.sample_rate))
        e_len = int(round(self.cfg.enroll_seconds * self.cfg.sample_rate))
        wire = np.int16 if self.cfg.transport == "int16" else np.float32
        speech = np.zeros((b, s_len), wire)
        enroll = np.zeros((b, e_len), wire)
        slens = np.zeros((b,), np.int32)
        elens = np.zeros((b,), np.int32)
        for i, (sp, en) in enumerate(items):
            speech[i], slens[i] = self._fit(sp, self.cfg.speech_seconds)
            enroll[i], elens[i] = self._fit(en, self.cfg.enroll_seconds)
        for i in range(len(items), b):  # pad rows repeat row 0
            speech[i], slens[i] = speech[0], slens[0]
            enroll[i], elens[i] = enroll[0], elens[0]
        return speech, slens, enroll, elens

    # ---- inference ----

    def stage(
        self, items: Sequence[Tuple[np.ndarray, np.ndarray]]
    ) -> Tuple[Any, Any, Any, Any]:
        """Host pack + device transfer + mel dispatch (everything before the
        compiled encode). Returns device-resident (feats, flens, efeats,
        eflens). Async: nothing here blocks on device completion, so a
        pipelined caller can stage batch N+1 while N computes."""
        jnp = self._jnp
        speech, slens, enroll, elens = self._pack(items)
        with self._stage_lock:
            s_dev, e_dev = jnp.asarray(speech), jnp.asarray(enroll)
            if self.cfg.transport == "int16":
                s_dev, e_dev = pcm16_to_float(s_dev), pcm16_to_float(e_dev)
            feats, flens = log_mel_spectrogram_jit(
                s_dev, jnp.asarray(slens), n_mels=self.n_mels
            )
            efeats, eflens = log_mel_spectrogram_jit(
                e_dev, jnp.asarray(elens), n_mels=self.n_mels
            )
        return feats, flens, efeats, eflens

    def infer_staged(self, staged: Tuple, n_items: int) -> List[str]:
        """Run the compiled encode+decode on a ``stage()`` result and
        detokenize the first ``n_items`` rows."""
        feats, flens, efeats, eflens = staged
        with self._lock:
            memory, spk_prompt = chunked_encode(
                lambda *a: self.encode(self.enc_vars, *a),
                feats, flens, efeats, eflens, self.cfg.enc_chunk,
            )
            tokens = np.asarray(self.run(memory, spk_prompt)[0])
            self.compiled = True
        return [
            self.tokenizer.decode(strip_eot(tokens[i : i + 1], self.dcfg.eot)[0])
            .strip()
            for i in range(n_items)
        ]

    def transcribe(
        self, items: Sequence[Tuple[np.ndarray, np.ndarray]]
    ) -> List[str]:
        """items: (speech float32 [-1,1] @16 kHz, enrollment likewise) pairs.
        Returns one transcript per item."""
        return self.infer_staged(self.stage(items), len(items))

    def warmup(self) -> float:
        """Compile the full pipeline on silence; returns wall seconds."""
        n = int(self.cfg.sample_rate)  # 1 s of silence, padded like any request
        t0 = time.time()
        self.transcribe([(np.zeros(n, np.float32), np.zeros(n, np.float32))])
        return time.time() - t0
