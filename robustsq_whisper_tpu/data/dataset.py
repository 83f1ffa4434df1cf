"""Kaldi-dir-backed training/eval dataset with fixed-shape batching.

Replaces the external ESPnet dataloader stack the reference trains through
(imports at /root/reference/model/ts_qformer_espnet_model.py:9-20; manifests
described at README.md:64-69). Reads a data dir containing::

    wav.scp  utt2spk  text  enroll.scp  [utt2num_samples]  [spk2enroll.json]

- ``text`` is tokenized with the provided tokenizer (ids, not words);
- lazy ``*utt spk`` enrollment rows resolve to a random same-speaker
  enrollment utterance per epoch (reference create_enrollment_scp.py:76-78);
- batches are fixed-shape (pad/truncate to ``speech_seconds`` / crop
  enrollment to ``enroll_seconds`` — the reference's ``crop10``) so one XLA
  compilation serves the whole run;
- host-side utt-id parsing fills ``neg_logits`` / ``spk_labels``
  (data/collate.py).

TPU-first notes: batches are assembled on host CPU in numpy (cheap), shipped
whole; length-bucketing is unnecessary because Whisper pads to 30 s anyway
(SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from . import collate, kaldi_io


class KaldiTSDataset:
    """Target-speaker triplet dataset: (speech, enroll, text) per utt."""

    def __init__(
        self,
        data_dir: str,
        tokenizer,
        speech_seconds: float = 30.0,
        enroll_seconds: float = 10.0,
        sample_rate: int = 16000,
        text_len: int = 128,
        utt_style: str = "libri2mix",
        num_speakers: Optional[int] = None,
        spk2enroll_path: Optional[str] = None,
        seed: int = 0,
        enroll_type: str = "audio",
        enroll_prefix: str = "resnet",
    ):
        self.data_dir = data_dir
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.speech_samples = int(speech_seconds * sample_rate)
        self.enroll_samples = int(enroll_seconds * sample_rate)
        self.text_len = text_len
        self.utt_style = utt_style
        self.num_speakers = num_speakers
        self.rng = np.random.default_rng(seed)
        self.speaker_to_id: Dict[str, int] = {}
        self.enroll_type = enroll_type
        self.enroll_prefix = enroll_prefix

        self.wav = kaldi_io.read_scp(os.path.join(data_dir, "wav.scp"))
        self.text = kaldi_io.read_scp(os.path.join(data_dir, "text"))
        enroll_path = os.path.join(data_dir, "enroll.scp")
        self.enroll = (
            kaldi_io.read_scp(enroll_path) if os.path.exists(enroll_path) else {}
        )
        s2e = spk2enroll_path or os.path.join(data_dir, "spk2enroll.json")
        self.spk2enroll = (
            kaldi_io.read_spk2enroll(s2e) if os.path.exists(s2e) else None
        )
        self.utt_ids: List[str] = sorted(set(self.wav) & set(self.text))

        # embedding enrollment (asr_my.sh --enroll_type embedding): stage-103
        # resnet.scp maps either the mixture utt (eval mode, concrete
        # enroll.scp rows) or the enrollment utt (train mode, extracted for
        # every spk2enroll utterance — reference
        # extract_reset_embedding_onnx.py:119-130) to a .npy embedding.
        self.embed_scp: Dict[str, str] = {}
        if enroll_type == "embedding":
            scp_path = os.path.join(data_dir, f"{enroll_prefix}.scp")
            if not os.path.exists(scp_path):
                raise FileNotFoundError(
                    f"{scp_path}: enroll_type=embedding needs the stage-103 "
                    f"embedding scp (cli.datapre extract_embeddings)"
                )
            self.embed_scp = kaldi_io.read_scp(scp_path)
        elif enroll_type != "audio":
            raise ValueError(
                f"enroll_type must be audio|embedding, got {enroll_type}"
            )

        # native batched WAV decode for the fixed-window speech path
        # (native/wavio.cpp); per-file scipy fallback otherwise
        from . import native_loader

        self._native = native_loader if native_loader.available() else None

    def __len__(self) -> int:
        return len(self.utt_ids)

    def _load_audio(self, path: str) -> np.ndarray:
        audio, sr = kaldi_io.read_wav(path)
        if sr != self.sample_rate:
            raise ValueError(f"{path}: sample rate {sr} != {self.sample_rate}")
        return audio

    def _enroll_audio(self, utt_id: str) -> np.ndarray:
        row = self.enroll.get(utt_id)
        if row is None:
            # fall back to the mixture itself (zero-shot / no-enroll eval)
            return self._load_audio(self.wav[utt_id].split()[0])
        path = kaldi_io.resolve_enrollment(
            row, self.spk2enroll, self.rng, exclude_utt=utt_id
        )
        audio = self._load_audio(path)
        if len(audio) > self.enroll_samples:  # random crop (crop10)
            start = int(self.rng.integers(len(audio) - self.enroll_samples + 1))
            audio = audio[start : start + self.enroll_samples]
        return audio

    def _enroll_embedding(self, utt_id: str) -> np.ndarray:
        """Precomputed speaker embedding for ``utt_id`` (enroll_type
        "embedding"): lazy enroll rows resolve to a random same-speaker
        enrollment utterance whose id keys resnet.scp; concrete/absent rows
        key it by the mixture utt directly."""
        row = self.enroll.get(utt_id)
        key = utt_id
        if row is not None and kaldi_io.is_lazy_enrollment(row):
            enroll_utt, _ = kaldi_io.resolve_enrollment_entry(
                row, self.spk2enroll, self.rng, exclude_utt=utt_id
            )
            key = enroll_utt if enroll_utt is not None else utt_id
        npy = self.embed_scp.get(key)
        if npy is None:
            raise KeyError(
                f"{self.enroll_prefix}.scp has no embedding for {key!r} "
                f"(mixture {utt_id!r})"
            )
        return np.load(npy).astype(np.float32).reshape(-1)

    def batches(
        self, batch_size: int, shuffle: bool = True, drop_last: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.utt_ids))
        if shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    break
                idx = np.concatenate(
                    [idx, order[: batch_size - len(idx)]]
                )
            utts = [self.utt_ids[j] for j in idx]
            if self._native is not None:
                batch_speech, speech_lens = self._native.load_batch(
                    [self.wav[u].split()[0] for u in utts],
                    self.speech_samples,
                    expect_rate=self.sample_rate,
                )
                speech = [
                    batch_speech[i, : speech_lens[i]] for i in range(len(utts))
                ]
            else:
                speech = [
                    self._load_audio(self.wav[u].split()[0]) for u in utts
                ]
            if self.enroll_type == "embedding":
                enroll = None
                enroll_embeds = np.stack(
                    [self._enroll_embedding(u) for u in utts]
                )
            else:
                enroll = [self._enroll_audio(u) for u in utts]
                enroll_embeds = None
            texts = [
                np.asarray(self.tokenizer.encode(self.text[u]), np.int32)
                for u in utts
            ]
            batch = collate.collate_batch(
                utts,
                speech,
                enroll,
                texts,
                speech_samples=self.speech_samples,
                enroll_samples=self.enroll_samples,
                text_len=self.text_len,
                style=self.utt_style,
                speaker_to_id=self.speaker_to_id,
                num_speakers=self.num_speakers,
                enroll_embeds=enroll_embeds,
            )
            batch["utt_ids"] = utts  # host-only metadata (popped before jit)
            yield batch
