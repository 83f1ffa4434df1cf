"""Whisper tokenizer: special-token map + pluggable BPE backends.

The reference gets its tokenizer implicitly from the ``whisper`` package /
ESPnet HF-tokenizer plumbing (external deps; special ids hard-coded e.g.
``<|startofprev|>`` = 50361 at /root/reference/model/whisper_decoder.py:240).
This module provides:

- the full Whisper special-token layout for both the multilingual (51865) and
  English-only (51864) vocabularies, derived from the GPT-2 base vocab size
  (50257) + language list — so sot/eot/task/notimestamps/startofprev ids are
  available without any network assets;
- a BPE backend loaded from local files when available: a tiktoken ``.tiktoken``
  ranks file or a HF ``vocab.json``+``merges.txt`` pair (zero-egress friendly);
- a hermetic ``ByteTokenizer`` fallback (raw UTF-8 bytes + the same special
  ids) so tests and offline smoke decodes run without any assets.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

# 99 languages of multilingual Whisper, in official order.
LANGUAGES = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln ha "
    "ba jw su yue"  # yue is the 100th language (large-v3 family only)
).split()

GPT2_VOCAB = 50257  # byte-pair vocab incl. <|endoftext|>


@dataclasses.dataclass(frozen=True)
class SpecialTokens:
    eot: int
    sot: int
    translate: int
    transcribe: int
    lang_offset: int  # id of <|en|>
    startoflm: int
    startofprev: int
    nospeech: int
    notimestamps: int
    timestamp_begin: int
    n_vocab: int

    def lang(self, code: str) -> int:
        idx = LANGUAGES.index(code)
        n_langs = self.translate - self.lang_offset
        if idx >= n_langs:
            raise ValueError(
                f"language {code!r} needs a {idx + 1}-language layout "
                f"(this one has {n_langs}; large-v3 layouts have 100)"
            )
        return self.lang_offset + idx

    def sot_sequence(
        self, language: Optional[str] = "en", task: str = "transcribe",
        notimestamps: bool = True, multilingual: bool = True,
    ) -> Tuple[int, ...]:
        seq = [self.sot]
        if multilingual and language is not None:
            seq.append(self.lang(language))
            seq.append(self.transcribe if task == "transcribe" else self.translate)
        if notimestamps:
            seq.append(self.notimestamps)
        return tuple(seq)


def special_tokens(
    multilingual: bool = True, num_languages: int = 99
) -> SpecialTokens:
    """Token layout of openai/whisper: specials appended after the base vocab.

    multilingual (n_vocab 51865): base 50257 + <|endoftext|>=50257,
    <|startoftranscript|>=50258, 99 languages 50259..50357, translate=50358,
    transcribe=50359, startoflm=50360, startofprev=50361, nospeech=50362,
    notimestamps=50363, timestamps from 50364.
    English-only (51864): one fewer language slot shifts everything by -1.
    large-v3 family: ``num_languages=100`` (adds <|yue|>), which shifts
    every special after the language block by +1 and gives n_vocab 51866.
    """
    if multilingual:
        eot = 50257
        n_langs = num_languages
    else:
        eot = 50256  # gpt2 <|endoftext|>
        n_langs = num_languages  # layout keeps slots; ids shift by -1
    sot = eot + 1
    lang_offset = sot + 1
    translate = lang_offset + n_langs
    transcribe = translate + 1
    startoflm = transcribe + 1
    startofprev = startoflm + 1
    nospeech = startofprev + 1
    notimestamps = nospeech + 1
    timestamp_begin = notimestamps + 1
    n_vocab = timestamp_begin + 1501
    return SpecialTokens(
        eot=eot, sot=sot, translate=translate, transcribe=transcribe,
        lang_offset=lang_offset, startoflm=startoflm, startofprev=startofprev,
        nospeech=nospeech, notimestamps=notimestamps,
        timestamp_begin=timestamp_begin, n_vocab=n_vocab,
    )


def special_tokens_for_vocab(n_vocab: int) -> SpecialTokens:
    """The token layout a model's vocab size implies: 51864 = English-only,
    51865 = multilingual (99 languages), 51866 = large-v3 multilingual
    (100 languages, <|yue|>). Expanded vocabs (> 51866) keep the v2 layout
    the expansion started from."""
    if n_vocab == 51864:
        return special_tokens(multilingual=False)
    if n_vocab == 51866:
        return special_tokens(multilingual=True, num_languages=100)
    return special_tokens(multilingual=True)


class ByteTokenizer:
    """Hermetic fallback: UTF-8 bytes 0..255 as the text vocab, Whisper
    special-token ids preserved. Round-trips any text; useful for tests and
    pipeline smoke runs without BPE assets."""

    def __init__(self, multilingual: bool = True):
        self.special = special_tokens(multilingual)
        self.n_vocab = self.special.n_vocab

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")


class BPETokenizer:
    """GPT-2-style byte-level BPE from local assets (tiktoken ranks file or
    HF vocab.json + merges.txt)."""

    def __init__(self, ranks: Dict[bytes, int], multilingual: bool = True):
        self.special = special_tokens(multilingual)
        self.n_vocab = self.special.n_vocab
        # text ids are 0..len(ranks)-1; ids past the ranks table (possible
        # when decoding a reduced-vocab smoke model with a mini ranks file)
        # are dropped in decode rather than crashing tiktoken
        self._n_text = len(ranks)
        self._enc = None
        try:
            import tiktoken

            specials = {"<|endoftext|>": self.special.eot}
            self._enc = tiktoken.Encoding(
                name="whisper",
                pat_str=r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
                mergeable_ranks=ranks,
                special_tokens=specials,
            )
        except Exception as e:  # pragma: no cover
            raise RuntimeError(f"tiktoken unavailable: {e}")

    @classmethod
    def from_tiktoken_file(cls, path: str, multilingual: bool = True) -> "BPETokenizer":
        ranks = {}
        with open(path, "rb") as f:
            for line in f:
                if not line.strip():
                    continue
                token, rank = line.split()
                ranks[base64.b64decode(token)] = int(rank)
        return cls(ranks, multilingual)

    @classmethod
    def from_hf_files(
        cls, vocab_json: str, merges_txt: str, multilingual: bool = True
    ) -> "BPETokenizer":
        # Convert HF byte-level BPE (unicode-remapped) back to byte ranks.
        with open(vocab_json) as f:
            vocab = json.load(f)
        byte_decoder = _hf_byte_decoder()
        ranks = {}
        for tok, idx in vocab.items():
            if tok == "<|endoftext|>":
                continue
            ranks[bytes(byte_decoder[c] for c in tok)] = idx
        return cls(ranks, multilingual)

    def encode(self, text: str) -> List[int]:
        return self._enc.encode(text)

    def decode(self, ids: Sequence[int]) -> str:
        eot = self.special.eot
        return self._enc.decode([i for i in ids if i < min(eot, self._n_text)])


def _hf_byte_decoder() -> Dict[str, int]:
    """Inverse of the GPT-2 bytes->unicode table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def load_tokenizer(
    asset_path: Optional[str] = None, multilingual: bool = True
):
    """Best tokenizer available: BPE from local assets, else byte fallback.

    ``asset_path`` may be a ``.tiktoken`` file, a ``vocab.json`` (with
    ``merges.txt`` next to it), or a directory containing either.
    """
    if asset_path:
        p = asset_path
        if os.path.isdir(p):
            for name in ("multilingual.tiktoken", "gpt2.tiktoken", "vocab.json"):
                cand = os.path.join(p, name)
                if os.path.exists(cand):
                    p = cand
                    break
        if p.endswith(".tiktoken") and os.path.exists(p):
            return BPETokenizer.from_tiktoken_file(p, multilingual)
        if p.endswith("vocab.json") and os.path.exists(p):
            merges = os.path.join(os.path.dirname(p), "merges.txt")
            return BPETokenizer.from_hf_files(p, merges, multilingual)
    return ByteTokenizer(multilingual)
