"""Plain (non-target-speaker) Whisper ASR: the zero-shot decode path.

Capability parity with the reference's base ``OpenAIWhisperEncoder`` /
``OpenAIWhisperDecoder`` pair used without speaker conditioning
(/root/reference/model/whisper_encoder.py:17-192,
whisper_decoder.py:41-226), including ``pad_or_trim`` zero-shot input
handling (:77-97). Used for BASELINE config #1 (whisper-tiny greedy decode)
and for decoding with ``use_spk_prompt=False``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..audio.frontend import N_SAMPLES, log_mel_spectrogram, pad_or_trim
from ..decode.search import DecodeConfig, build_beam_decoder
from ..tokenizer.whisper_tokenizer import special_tokens_for_vocab
from .ts_decoder import TSDecoder
from .whisper.config import WhisperDims, whisper_dims
from .whisper.modules import AudioEncoder


@dataclasses.dataclass
class WhisperASR:
    """Bundles encoder/decoder modules + variables into a decode-ready pair."""

    dims: WhisperDims
    enc_vars: Any
    dec_vars: Any
    dtype: Any = jnp.float32

    @classmethod
    def from_random(
        cls, name: str = "tiny", seed: int = 0, dtype=jnp.float32, **overrides
    ):
        """Random-init model (smoke tests / benchmarks)."""
        dims = whisper_dims(name, **overrides)
        enc = AudioEncoder(dims, dtype=dtype)
        dec = TSDecoder(dims, use_spk_prompt=False, dtype=dtype)
        rng = jax.random.PRNGKey(seed)
        mel = jnp.zeros((1, dims.n_mels, 2 * dims.n_audio_ctx), jnp.float32)
        enc_vars = enc.init(rng, mel)
        mem = jnp.zeros((1, dims.n_audio_ctx, dims.n_audio_state), dtype)
        dec_vars = dec.init(rng, mem, jnp.zeros((1, 2), jnp.int32), None)
        return cls(dims, enc_vars, dec_vars, dtype)

    @classmethod
    def from_openai_checkpoint(cls, path: str, dtype=jnp.float32):
        from .whisper import load as wload

        dims, enc_p, dec_p = wload.load_openai_checkpoint(path)
        enc_vars = {"params": enc_p, "buffers": AudioEncoder.make_buffers(dims)}
        dec_vars = {"params": {"decoder": dec_p}}
        return cls(dims, enc_vars, dec_vars, dtype)

    def modules(self) -> Tuple[AudioEncoder, TSDecoder]:
        return (
            AudioEncoder(self.dims, dtype=self.dtype),
            TSDecoder(self.dims, use_spk_prompt=False, dtype=self.dtype),
        )

    def transcribe_batch(
        self,
        audio: jax.Array,  # (batch, samples) float32
        language: Optional[str] = "en",
        max_new_tokens: int = 128,
        beam_size: int = 1,
    ) -> Tuple[jax.Array, jax.Array]:
        """Zero-shot transcription: pad_or_trim to 30 s, mel, encode, greedy/
        beam decode. Returns (tokens, scores)."""
        enc, dec = self.modules()
        st = special_tokens_for_vocab(self.dims.n_vocab)
        multilingual = self.dims.n_vocab >= 51865
        audio = pad_or_trim(audio, N_SAMPLES)
        mel, _ = log_mel_spectrogram(audio, n_mels=self.dims.n_mels)
        memory = enc.apply(self.enc_vars, mel)
        if self.dims.n_vocab > st.sot:  # real Whisper vocab layout
            eot = st.eot
            init = st.sot_sequence(
                language, "transcribe", True, multilingual=multilingual
            )
        else:  # reduced-vocab smoke models
            eot = self.dims.n_vocab - 1
            init = (0,)
        dcfg = DecodeConfig(
            max_new_tokens=max_new_tokens,
            eot=eot,
            init_tokens=init,
            beam_size=beam_size,
        )
        run = build_beam_decoder(dec, self.dec_vars, dcfg)
        dummy_prompt = jnp.zeros(
            (audio.shape[0], 0, self.dims.n_text_state), self.dtype
        )
        return run(memory, dummy_prompt)
