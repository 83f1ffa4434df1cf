"""Data-layer tests, mirroring the reference's hermetic numeric test suite
(datapre/test_overlap_enrollment.py, test_wham_noise.py — SURVEY.md §4):
measured SIR/SNR within 0.1 dB of target, peak-clip prevention, Kaldi-dir
validation/fix round-trips, lazy-enrollment resolution."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.data import augment, kaldi_io


def _measured_db(p_num: float, p_den: float) -> float:
    return 10.0 * np.log10(p_num / p_den)


def _sine(freq, n=16000, sr=16000, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestAugment:
    def test_sir_mixing_accuracy(self):
        """Measured SIR within 0.1 dB across the reference's test targets
        (test_overlap_enrollment.py:175-203)."""
        a1 = jnp.asarray(_sine(440)[None, :])
        a2 = jnp.asarray(_sine(880, amp=0.3)[None, :])
        for sir in [-5.0, 0.0, 5.0]:
            mixed = augment.mix_with_sir(a1, a2, jnp.asarray([sir]))
            interf = np.asarray(mixed - a1)[0]
            measured = _measured_db(
                float(np.mean(np.asarray(a1) ** 2)),
                float(np.mean(interf**2)),
            )
            assert abs(measured - sir) < 0.1, (sir, measured)
            assert np.all(np.isfinite(np.asarray(mixed)))

    def test_snr_noise_accuracy(self):
        """Measured SNR within 0.1 dB for targets 5..20 dB
        (test_wham_noise.py:55-68)."""
        speech = jnp.asarray(_sine(440)[None, :])
        noise = jnp.asarray(
            np.random.default_rng(0).standard_normal(16000)[None, :].astype(
                np.float32
            )
        )
        for snr in [5.0, 10.0, 15.0, 20.0]:
            noisy = augment.add_noise_with_snr(speech, noise, jnp.asarray([snr]))
            added = np.asarray(noisy - speech)[0]
            measured = _measured_db(
                float(np.mean(np.asarray(speech) ** 2)),
                float(np.mean(added**2)),
            )
            assert abs(measured - snr) < 0.1, (snr, measured)

    def test_zero_power_interferer_passthrough(self):
        a1 = jnp.asarray(_sine(440)[None, :])
        silent = jnp.zeros_like(a1)
        mixed = augment.mix_with_sir(a1, silent, jnp.asarray([0.0]))
        np.testing.assert_allclose(np.asarray(mixed), np.asarray(a1))

    def test_masked_power_ignores_padding(self):
        """Padded samples must not bias the SIR scaling."""
        a = _sine(440, n=8000)
        a_pad = np.concatenate([a, np.zeros(8000, np.float32)])
        b = _sine(700, n=8000)
        b_pad = np.concatenate([b, np.zeros(8000, np.float32)])
        m_exact = augment.mix_with_sir(
            jnp.asarray(a[None]), jnp.asarray(b[None]), jnp.asarray([3.0])
        )
        m_masked = augment.mix_with_sir(
            jnp.asarray(a_pad[None]),
            jnp.asarray(b_pad[None]),
            jnp.asarray([3.0]),
            target_lens=jnp.asarray([8000]),
            interferer_lens=jnp.asarray([8000]),
        )
        np.testing.assert_allclose(
            np.asarray(m_masked)[0, :8000], np.asarray(m_exact)[0], rtol=1e-5
        )

    def test_peak_normalize(self):
        loud = jnp.asarray(np.full((1, 100), 2.0, np.float32))
        out = augment.peak_normalize(loud, 0.9)
        assert float(jnp.max(jnp.abs(out))) <= 0.9 + 1e-6
        quiet = jnp.asarray(np.full((1, 100), 0.5, np.float32))
        np.testing.assert_allclose(
            np.asarray(augment.peak_normalize(quiet, 0.9)), np.asarray(quiet)
        )

    def test_lufs_silence_is_neg_inf(self):
        """test_wham_noise.py:96-99 parity."""
        assert float(augment.lufs(jnp.zeros((1, 100)))[0]) == -np.inf

    def test_lufs_noise_injection(self):
        speech = jnp.asarray(_sine(440)[None, :])
        noise = jnp.asarray(
            np.random.default_rng(1).standard_normal(16000)[None, :].astype(
                np.float32
            )
        )
        noisy = augment.add_noise_with_lufs(speech, noise, jnp.asarray([-30.0]))
        added = noisy - speech
        measured = float(augment.lufs(added)[0])
        assert abs(measured - (-30.0)) < 0.1

    def test_random_crop_static_shape(self):
        rng = jax.random.PRNGKey(0)
        audio = jnp.asarray(
            np.random.default_rng(2).standard_normal((3, 1000)).astype(np.float32)
        )
        lens = jnp.asarray([1000, 500, 100])
        crop, valid = augment.random_crop(rng, audio, lens, 300)
        assert crop.shape == (3, 300)
        np.testing.assert_array_equal(np.asarray(valid), [300, 300, 100])
        # row with only 100 valid samples: tail must be zero
        assert np.all(np.asarray(crop)[2, 100:] == 0)

    def test_tile_to_length(self):
        noise = jnp.asarray(np.arange(5, dtype=np.float32))
        out = augment.tile_to_length(noise, 12)
        np.testing.assert_array_equal(
            np.asarray(out), [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1]
        )

    def test_batch_augment_pipeline(self):
        rng = jax.random.PRNGKey(3)
        g = np.random.default_rng(3)
        speech = jnp.asarray(g.standard_normal((2, 8000)).astype(np.float32) * 0.2)
        interf = jnp.asarray(g.standard_normal((2, 8000)).astype(np.float32) * 0.2)
        noise = jnp.asarray(g.standard_normal((2, 8000)).astype(np.float32) * 0.2)
        lens = jnp.asarray([8000, 8000])
        out = augment.batch_augment(
            rng, speech, lens, interf, lens, noise, lens
        )
        assert out.shape == (2, 8000)
        assert np.all(np.isfinite(np.asarray(out)))
        assert float(jnp.max(jnp.abs(out))) <= 0.9 + 1e-6


class TestKaldiIO:
    def _make_dir(self, tmp_path):
        d = str(tmp_path / "data")
        os.makedirs(d, exist_ok=True)
        kaldi_io.write_scp(
            os.path.join(d, "wav.scp"),
            {"u1": "/a/u1.wav", "u2": "/a/u2.wav", "u3": "/a/u3.wav"},
        )
        kaldi_io.write_scp(
            os.path.join(d, "utt2spk"), {"u1": "s1", "u2": "s1", "u3": "s2"}
        )
        kaldi_io.write_scp(
            os.path.join(d, "text"),
            {"u1": "hello there", "u2": "general", "u3": "kenobi"},
        )
        kaldi_io.write_spk2utt(
            os.path.join(d, "spk2utt"),
            kaldi_io.utt2spk_to_spk2utt(
                kaldi_io.read_scp(os.path.join(d, "utt2spk"))
            ),
        )
        return d

    def test_scp_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.scp")
        kaldi_io.write_scp(p, {"b": "2 3", "a": "1"})
        m = kaldi_io.read_scp(p)
        assert list(m) == ["a", "b"]  # sorted
        assert m["b"] == "2 3"

    def test_validate_ok(self, tmp_path):
        d = self._make_dir(tmp_path)
        assert kaldi_io.validate_data_dir(d) == []

    def test_validate_catches_mismatch(self, tmp_path):
        d = self._make_dir(tmp_path)
        kaldi_io.write_scp(
            os.path.join(d, "text"), {"u1": "hello", "u4": "ghost"}
        )
        problems = kaldi_io.validate_data_dir(d)
        assert any("text" in p and "mismatch" in p for p in problems)

    def test_fix_data_dir(self, tmp_path):
        d = self._make_dir(tmp_path)
        kaldi_io.write_scp(
            os.path.join(d, "text"), {"u1": "hello", "u2": "there"}
        )  # drop u3
        kept = kaldi_io.fix_data_dir(d)
        assert kept == 2
        assert kaldi_io.validate_data_dir(d) == []
        assert "u3" not in kaldi_io.read_scp(os.path.join(d, "wav.scp"))
        assert kaldi_io.read_spk2utt(os.path.join(d, "spk2utt")) == {
            "s1": ["u1", "u2"]
        }

    def test_spk2utt_roundtrip(self):
        u2s = {"u1": "s1", "u2": "s1", "u3": "s2"}
        s2u = kaldi_io.utt2spk_to_spk2utt(u2s)
        assert s2u == {"s1": ["u1", "u2"], "s2": ["u3"]}
        assert kaldi_io.spk2utt_to_utt2spk(s2u) == u2s

    def test_filter_subset(self):
        m = {"a": "1", "b": "2", "c": "3"}
        assert kaldi_io.filter_scp(["a", "c"], m) == {"a": "1", "c": "3"}
        assert kaldi_io.subset_scp(m, 2) == {"a": "1", "b": "2"}
        assert kaldi_io.subset_scp(m, 1, first=False) == {"c": "3"}

    def test_lazy_enrollment(self, tmp_path):
        assert kaldi_io.is_lazy_enrollment("*u1_u2_spk1 100")
        utt, spk = kaldi_io.parse_lazy_enrollment("*u1_u2_spk1 100")
        assert utt == "u1_u2_spk1" and spk == "100"
        spk2enroll = {"100": [("e1", "/p/e1.wav"), ("e2", "/p/e2.wav")]}
        rng = np.random.default_rng(0)
        path = kaldi_io.resolve_enrollment("*m1 100", spk2enroll, rng)
        assert path in ("/p/e1.wav", "/p/e2.wav")
        # concrete rows pass through
        assert (
            kaldi_io.resolve_enrollment("/x/y.wav", spk2enroll, rng) == "/x/y.wav"
        )

    def test_spk2enroll_json_roundtrip(self, tmp_path):
        p = str(tmp_path / "spk2enroll.json")
        data = {"s1": [("u1", "/p/u1.wav")], "s2": [("u2", "/p/u2.wav")]}
        kaldi_io.write_spk2enroll(p, data)
        assert kaldi_io.read_spk2enroll(p) == data

    def test_wav_roundtrip(self, tmp_path):
        p = str(tmp_path / "a.wav")
        audio = (np.sin(np.linspace(0, 100, 1600)) * 0.5).astype(np.float32)
        kaldi_io.write_wav(p, audio, 16000)
        back, sr = kaldi_io.read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(back, audio, atol=1e-4)
        assert kaldi_io.get_num_samples(p) == 1600


class TestDataDirOps:
    def _dir(self, tmp_path, name, utts):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        kaldi_io.write_scp(
            os.path.join(d, "wav.scp"), {u: f"/w/{u}.wav" for u in utts}
        )
        kaldi_io.write_scp(
            os.path.join(d, "utt2spk"), {u: u.split("-")[0] for u in utts}
        )
        kaldi_io.write_scp(
            os.path.join(d, "text"), {u: f"text {u}" for u in utts}
        )
        kaldi_io.write_spk2utt(
            os.path.join(d, "spk2utt"),
            kaldi_io.utt2spk_to_spk2utt(
                kaldi_io.read_scp(os.path.join(d, "utt2spk"))
            ),
        )
        return d

    def test_copy_with_prefix(self, tmp_path):
        src = self._dir(tmp_path, "src", ["s1-1", "s1-2", "s2-1"])
        dst = str(tmp_path / "dst")
        kaldi_io.copy_data_dir(src, dst, utt_prefix="aug_")
        wav = kaldi_io.read_scp(os.path.join(dst, "wav.scp"))
        assert set(wav) == {"aug_s1-1", "aug_s1-2", "aug_s2-1"}

    def test_combine_and_duplicate_detection(self, tmp_path):
        a = self._dir(tmp_path, "a", ["s1-1", "s1-2"])
        b = self._dir(tmp_path, "b", ["s2-1"])
        dst = str(tmp_path / "comb")
        n = kaldi_io.combine_data_dirs([a, b], dst)
        assert n == 3
        assert kaldi_io.validate_data_dir(dst) == []
        import pytest as _pytest

        with _pytest.raises(ValueError, match="duplicate"):
            kaldi_io.combine_data_dirs([a, a], str(tmp_path / "dup"))

    def test_subset(self, tmp_path):
        src = self._dir(tmp_path, "s", ["s1-1", "s1-2", "s2-1", "s3-1"])
        dst = str(tmp_path / "sub")
        n = kaldi_io.subset_data_dir(src, dst, 2)
        assert n == 2
        assert kaldi_io.validate_data_dir(dst) == []

    def test_tr_cv_split_speaker_disjoint(self, tmp_path):
        utts = [f"s{i}-{j}" for i in range(5) for j in range(2)]
        src = self._dir(tmp_path, "full", utts)
        tr, cv = str(tmp_path / "tr"), str(tmp_path / "cv")
        n_tr, n_cv = kaldi_io.split_data_dir_tr_cv(src, tr, cv, 0.2)
        assert n_tr + n_cv == 10 and n_cv >= 1
        tr_spk = set(kaldi_io.read_scp(os.path.join(tr, "utt2spk")).values())
        cv_spk = set(kaldi_io.read_scp(os.path.join(cv, "utt2spk")).values())
        assert not (tr_spk & cv_spk)

    def test_librimix_csv(self, tmp_path):
        csv_p = str(tmp_path / "meta.csv")
        with open(csv_p, "w") as f:
            f.write(
                "mixture_ID,mixture_path,source_1_path,source_2_path,noise_path\n"
                "100-1-0_200-2-0,/m/a.wav,/s1/a.wav,/s2/a.wav,/n/a.wav\n"
            )
        out = str(tmp_path / "lm")
        n = kaldi_io.librimix_to_kaldi(csv_p, out)
        assert n == 1
        u2s = kaldi_io.read_scp(os.path.join(out, "utt2spk"))
        assert u2s["100-1-0_200-2-0"] == "100_200"
        assert os.path.exists(os.path.join(out, "spk1.scp"))
        assert os.path.exists(os.path.join(out, "noise1.scp"))


class TestNativeLoader:
    def test_matches_scipy_path(self, tmp_path):
        from robustsq_whisper_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(0)
        paths, refs = [], []
        for i in range(4):
            a = (rng.standard_normal(1000 + 300 * i) * 0.4).astype(np.float32)
            p = str(tmp_path / f"{i}.wav")
            kaldi_io.write_wav(p, a, 16000)
            paths.append(p)
            refs.append(a)
        batch, lens = native_loader.load_batch(paths, 1500)
        for i, a in enumerate(refs):
            n = min(len(a), 1500)
            ref, _ = kaldi_io.read_wav(paths[i])
            np.testing.assert_allclose(batch[i, :n], ref[:n], atol=1e-6)
            assert lens[i] == n
            assert np.all(batch[i, n:] == 0)
        ns, rate = native_loader.num_samples(paths[0])
        assert (ns, rate) == (1000, 16000)

    def test_bad_file_raises(self, tmp_path):
        from robustsq_whisper_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("no native toolchain")
        bad = str(tmp_path / "bad.wav")
        with open(bad, "wb") as f:
            f.write(b"not a wav at all")
        with pytest.raises(IOError):
            native_loader.load_batch([bad], 100)


class TestSmallUtils:
    def test_shuffle_list_deterministic(self):
        a = kaldi_io.shuffle_list(["a", "b", "c", "d"], seed=1)
        b = kaldi_io.shuffle_list(["a", "b", "c", "d"], seed=1)
        assert a == b and sorted(a) == ["a", "b", "c", "d"]
        assert kaldi_io.shuffle_list(list("abcdefgh") * 2, seed=2) != kaldi_io.shuffle_list(list("abcdefgh") * 2, seed=3)

    def test_apply_map(self):
        out = kaldi_io.apply_map(
            {"u1": "hello world", "u2": "foo"},
            {"hello": "HI", "foo": "BAR"},
        )
        assert out == {"u1": "HI world", "u2": "BAR"}

    def test_write_utt2dur(self, tmp_path):
        d = str(tmp_path / "dd")
        os.makedirs(d)
        p = os.path.join(d, "a.wav")
        kaldi_io.write_wav(p, np.zeros(8000, np.float32), 16000)
        kaldi_io.write_scp(os.path.join(d, "wav.scp"), {"a": p})
        n = kaldi_io.write_utt2dur(d)
        assert n == 1
        assert kaldi_io.read_scp(os.path.join(d, "utt2dur"))["a"] == "0.500"


class TestRemainingKaldiTools:
    def test_remove_dup_utts(self, tmp_path):
        d = str(tmp_path / "dup")
        os.makedirs(d)
        kaldi_io.write_scp(
            os.path.join(d, "wav.scp"), {f"u{i}": f"/w/u{i}.wav" for i in range(6)}
        )
        kaldi_io.write_scp(
            os.path.join(d, "utt2spk"), {f"u{i}": "s" for i in range(6)}
        )
        kaldi_io.write_scp(
            os.path.join(d, "text"),
            {f"u{i}": ("same line" if i < 5 else "unique") for i in range(6)},
        )
        kept = kaldi_io.remove_dup_utts(d, max_count=2)
        assert kept == 3  # 2 copies of "same line" + 1 "unique"
        assert kaldi_io.validate_data_dir(d) == []

    def test_resample_data_dir(self, tmp_path):
        d = str(tmp_path / "src8k")
        os.makedirs(d)
        t = np.arange(8000) / 8000.0
        audio = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = os.path.join(d, "a.wav")
        kaldi_io.write_wav(p, audio, 8000)
        kaldi_io.write_scp(os.path.join(d, "wav.scp"), {"a": p})
        kaldi_io.write_scp(os.path.join(d, "utt2spk"), {"a": "s"})
        out = str(tmp_path / "out16k")
        n = kaldi_io.resample_data_dir(d, out, 16000)
        assert n == 1
        res, sr = kaldi_io.read_wav(
            kaldi_io.read_scp(os.path.join(out, "wav.scp"))["a"]
        )
        assert sr == 16000 and len(res) == 16000
        # the 440 Hz tone survives resampling (compare mid-section)
        t2 = np.arange(16000) / 16000.0
        ref = (0.4 * np.sin(2 * np.pi * 440 * t2)).astype(np.float32)
        np.testing.assert_allclose(res[2000:14000], ref[2000:14000], atol=0.02)

    def test_get_segments_for_data(self, tmp_path):
        d = str(tmp_path / "seg")
        os.makedirs(d)
        p = os.path.join(d, "a.wav")
        kaldi_io.write_wav(p, np.zeros(4000, np.float32), 16000)
        kaldi_io.write_scp(os.path.join(d, "wav.scp"), {"a": p})
        n = kaldi_io.get_segments_for_data(d)
        assert n == 1
        assert kaldi_io.read_scp(os.path.join(d, "segments"))["a"] == "a 0.000 0.250"

    def test_extend_segment_times(self, tmp_path):
        """Reference's own doc example (extend_segment_times.py test
        comment): default paddings extend both rows and split the resulting
        overlap at the midpoint."""
        lines = ["utt1 reco1 0.2 6.2", "utt2 reco1 6.3 9.8"]
        out, n_fixed = kaldi_io.extend_segment_times(lines)
        assert n_fixed == 1
        assert out == ["utt1 reco1 0.1 6.25", "utt2 reco1 6.25 9.9"]

        # no overlap fixing: padded rows are allowed to overlap
        out2, n2 = kaldi_io.extend_segment_times(
            lines, fix_overlapping_segments=False,
            last_segment_end_padding=0.0,
        )
        assert n2 == 0
        assert out2 == ["utt1 reco1 0.1 6.3", "utt2 reco1 6.2 9.8"]

        # start clamp at 0; degenerate rows dropped after processing
        out3, _ = kaldi_io.extend_segment_times(
            ["u reco 0.05 0.2", "z reco 0.5 0.500001"],
            start_padding=0.1, end_padding=0.0,
            last_segment_end_padding=0.0,
        )
        assert out3[0].startswith("u reco 0 ")
        assert len(out3) == 2  # both still valid here

        # file wrapper rewrites in place
        d = tmp_path / "dir"
        d.mkdir()
        (d / "segments").write_text("\n".join(lines) + "\n")
        n = kaldi_io.extend_segment_times_file(str(d))
        assert n == 1
        got = (d / "segments").read_text().strip().splitlines()
        assert got == ["utt1 reco1 0.1 6.25", "utt2 reco1 6.25 9.9"]

    def test_create_data_links(self, tmp_path):
        store1 = str(tmp_path / "disk1")
        store2 = str(tmp_path / "disk2")
        targets = [str(tmp_path / "exp" / f"f{i}.ark") for i in range(3)]
        real = kaldi_io.create_data_links(targets, [store1, store2])
        for t, r in zip(targets, real):
            assert os.path.islink(t)
            assert os.path.realpath(t) == os.path.realpath(r)
        assert real[0].startswith(store1) and real[1].startswith(store2)
