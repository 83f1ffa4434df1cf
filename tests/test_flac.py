"""Native FLAC decoder tests.

The image ships no FLAC-capable decoder (no soundfile/ffmpeg/sox) while
LibriSpeech is FLAC — native/flac.cpp fills that gap. These tests synthesize
spec-compliant FLAC files in Python (verbatim and constant subframes, mono
and stereo with left/side decorrelation) and round-trip them through the
native loader. CRC fields are written as zeros (the decoder does not verify
integrity).
"""

import os

import numpy as np
import pytest

from robustsq_whisper_tpu.data import native_loader


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def encode_flac(
    samples: np.ndarray,  # (channels, n) int16
    sample_rate: int = 16000,
    block_size: int = 4096,
    mode: str = "verbatim",  # verbatim | constant | left_side
) -> bytes:
    channels, n = samples.shape
    bw = BitWriter()
    # STREAMINFO
    bw.write(0x664C6143, 32)  # fLaC
    bw.write(1, 1)  # last metadata block
    bw.write(0, 7)  # STREAMINFO
    bw.write(34, 24)
    bw.write(block_size, 16)
    bw.write(block_size, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(16 - 1, 5)
    bw.write(n, 36)
    for _ in range(16):
        bw.write(0, 8)

    for frame_idx in range(0, (n + block_size - 1) // block_size):
        start = frame_idx * block_size
        bs = min(block_size, n - start)
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit at end
        bw.write(0, 4)  # sample rate: streaminfo
        if mode == "left_side":
            assert channels == 2
            bw.write(8, 4)  # left/side
        else:
            bw.write(channels - 1, 4)
        bw.write(4, 3)  # 16 bps
        bw.write(0, 1)
        assert frame_idx < 128
        bw.write(frame_idx, 8)  # UTF-8 frame number (single byte)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 (unverified)

        def subframe(data, bps):
            bw.write(0, 1)
            if mode == "constant" and np.all(data == data[0]):
                bw.write(0, 6)
                bw.write(0, 1)
                bw.write_signed(int(data[0]), bps)
            elif mode == "fixed1_rice":
                # fixed order-1 predictor + rice residual (partition order 0)
                order = 1
                bw.write(0b001000 | order, 6)
                bw.write(0, 1)
                bw.write_signed(int(data[0]), bps)  # warmup
                bw.write(0, 2)  # residual method 0 (4-bit rice)
                bw.write(0, 4)  # partition order 0
                param = 12
                bw.write(param, 4)
                res = np.diff(data.astype(np.int64))
                for e in res:
                    u = (int(e) << 1) ^ (int(e) >> 63)  # zigzag
                    q, r = u >> param, u & ((1 << param) - 1)
                    for _ in range(q):
                        bw.write(0, 1)
                    bw.write(1, 1)
                    bw.write(r, param)
            else:
                bw.write(1, 6)  # verbatim
                bw.write(0, 1)
                for v in data:
                    bw.write_signed(int(v), bps)

        if mode == "left_side":
            left = samples[0, start : start + bs].astype(np.int64)
            side = left - samples[1, start : start + bs].astype(np.int64)
            subframe(left, 16)
            subframe(side, 17)  # side channel carries one extra bit
        else:
            for c in range(channels):
                subframe(samples[c, start : start + bs], 16)
        bw.align()
        bw.write(0, 16)  # CRC-16 (unverified)
    return bw.bytes()


needs_native = pytest.mark.skipif(
    not native_loader.available(), reason="no native toolchain"
)


@needs_native
class TestFlacDecode:
    def _roundtrip(self, tmp_path, samples, mode, name):
        path = str(tmp_path / f"{name}.flac")
        with open(path, "wb") as f:
            f.write(encode_flac(samples, mode=mode))
        n = samples.shape[1]
        batch, lens = native_loader.load_batch([path], n + 10)
        assert lens[0] == n
        ref = samples.astype(np.float32).mean(axis=0) / 32768.0
        np.testing.assert_allclose(batch[0, :n], ref, atol=1e-6)
        assert np.all(batch[0, n:] == 0)

    def test_mono_verbatim(self, tmp_path):
        rng = np.random.default_rng(0)
        samples = rng.integers(-30000, 30000, (1, 9000), dtype=np.int16)
        self._roundtrip(tmp_path, samples, "verbatim", "mono")

    def test_constant_subframe(self, tmp_path):
        samples = np.full((1, 5000), -1234, dtype=np.int16)
        self._roundtrip(tmp_path, samples, "constant", "const")

    def test_stereo_independent(self, tmp_path):
        rng = np.random.default_rng(1)
        samples = rng.integers(-20000, 20000, (2, 4500), dtype=np.int16)
        self._roundtrip(tmp_path, samples, "verbatim", "stereo")

    def test_left_side_decorrelation(self, tmp_path):
        rng = np.random.default_rng(2)
        samples = rng.integers(-20000, 20000, (2, 4096), dtype=np.int16)
        self._roundtrip(tmp_path, samples, "left_side", "ls")

    def test_fixed_predictor_rice_residual(self, tmp_path):
        """Covers decode_residual (rice method 0) + fixed order-1 path."""
        rng = np.random.default_rng(4)
        walk = np.cumsum(rng.integers(-500, 500, 6000)).astype(np.int64)
        samples = np.clip(walk, -32000, 32000).astype(np.int16)[None]
        self._roundtrip(tmp_path, samples, "fixed1_rice", "rice")

    def test_num_samples_header_only(self, tmp_path):
        samples = np.zeros((1, 7777), dtype=np.int16)
        path = str(tmp_path / "h.flac")
        with open(path, "wb") as f:
            f.write(encode_flac(samples, mode="constant"))
        n, rate = native_loader.num_samples(path)
        assert (n, rate) == (7777, 16000)

    def test_kaldi_read_wav_flac_fallback(self, tmp_path):
        """kaldi_io.read_wav routes .flac files through the native decoder."""
        from robustsq_whisper_tpu.data import kaldi_io

        rng = np.random.default_rng(3)
        samples = rng.integers(-30000, 30000, (1, 3000), dtype=np.int16)
        path = str(tmp_path / "x.flac")
        with open(path, "wb") as f:
            f.write(encode_flac(samples))
        audio, sr = kaldi_io.read_wav(path)
        assert sr == 16000
        np.testing.assert_allclose(
            audio, samples[0].astype(np.float32) / 32768.0, atol=1e-6
        )
