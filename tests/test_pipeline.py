"""End-to-end pipeline tests on synthetic fixtures (reference test
philosophy, SURVEY.md §4): simulate -> dataset -> decode -> score; plus
config loading, job runner, fbank, and speaker ResNet."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.data import kaldi_io, simulate
from robustsq_whisper_tpu.utils import jobs
from robustsq_whisper_tpu.utils.config import (
    experiment_from_dict,
    load_experiment,
)

SR = 16000


def _make_clean_dir(tmp_path, n_speakers=4, utts_per_spk=2):
    """Synthetic LibriSpeech-style dir: sine+noise per speaker
    (reference test_quick_overlap_enrollment.py:36-113 pattern)."""
    d = str(tmp_path / "clean")
    os.makedirs(os.path.join(d, "wavs"), exist_ok=True)
    rng = np.random.default_rng(0)
    wav, u2s, text = {}, {}, {}
    for s in range(n_speakers):
        spk = f"{100+s}"
        freq = 200.0 + 120.0 * s
        for u in range(utts_per_spk):
            utt = f"{spk}-0-{u:04d}"
            t = np.arange(SR) / SR
            audio = (
                0.3 * np.sin(2 * np.pi * freq * t)
                + 0.02 * rng.standard_normal(SR)
            ).astype(np.float32)
            p = os.path.join(d, "wavs", f"{utt}.wav")
            kaldi_io.write_wav(p, audio, SR)
            wav[utt] = p
            u2s[utt] = spk
            text[utt] = f"hello from speaker {spk} utt {u}"
    kaldi_io.write_scp(os.path.join(d, "wav.scp"), wav)
    kaldi_io.write_scp(os.path.join(d, "utt2spk"), u2s)
    kaldi_io.write_scp(os.path.join(d, "text"), text)
    kaldi_io.write_spk2utt(
        os.path.join(d, "spk2utt"), kaldi_io.utt2spk_to_spk2utt(u2s)
    )
    return d


class TestSimulate:
    def test_overlap_generation(self, tmp_path):
        src = _make_clean_dir(tmp_path)
        out = str(tmp_path / "mix")
        stats = simulate.generate_overlap_enrollment(
            src, out, simulate.OverlapConfig(num_mixtures=6, seed=1)
        )
        assert stats["num_mixtures"] == 6
        assert stats["num_rows"] == 12  # two target rows per mixture
        assert kaldi_io.validate_data_dir(out) == []
        wav = kaldi_io.read_scp(os.path.join(out, "wav.scp"))
        for utt in wav:
            assert utt.endswith(("_spk1", "_spk2"))
        enroll = kaldi_io.read_scp(os.path.join(out, "enroll.scp"))
        assert all(kaldi_io.is_lazy_enrollment(v) for v in enroll.values())
        # audio is readable and 16 kHz
        a, sr = kaldi_io.read_wav(next(iter(wav.values())))
        assert sr == SR and len(a) > 0
        # measured SIR of a mixture equals target within 0.1 dB is covered by
        # test_data.py::TestAugment; here check outputs are clip-free
        assert float(np.abs(a).max()) <= 0.91

    def test_wham_noise_generation(self, tmp_path):
        src = _make_clean_dir(tmp_path)
        out_mix = str(tmp_path / "mix")
        simulate.generate_overlap_enrollment(
            src, out_mix, simulate.OverlapConfig(num_mixtures=3, seed=2)
        )
        noise_dir = str(tmp_path / "noise")
        os.makedirs(noise_dir)
        rng = np.random.default_rng(3)
        for i in range(2):
            kaldi_io.write_wav(
                os.path.join(noise_dir, f"n{i}.wav"),
                (0.1 * rng.standard_normal(SR // 2)).astype(np.float32),
                SR,
            )
        out = str(tmp_path / "noisy")
        stats = simulate.add_wham_noise(
            out_mix, noise_dir, out, simulate.NoiseConfig(seed=4)
        )
        assert stats["num_rows"] == 6
        wav = kaldi_io.read_scp(os.path.join(out, "wav.scp"))
        assert all(u.startswith("noisy_") for u in wav)
        a, _ = kaldi_io.read_wav(next(iter(wav.values())))
        assert float(np.abs(a).max()) <= 0.91

    def test_snr_formula_matches_jit_path(self):
        """numpy offline vs jnp on-device implementations agree."""
        from robustsq_whisper_tpu.data import augment

        rng = np.random.default_rng(5)
        s = rng.standard_normal(4000).astype(np.float32) * 0.3
        n = rng.standard_normal(4000).astype(np.float32) * 0.1
        a = simulate.add_noise_with_snr(s, n, 12.0)
        b = np.asarray(
            augment.add_noise_with_snr(
                jnp.asarray(s[None]), jnp.asarray(n[None]), jnp.asarray([12.0])
            )
        )[0]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_enrollment_builders(self, tmp_path):
        src = _make_clean_dir(tmp_path)
        out_json = str(tmp_path / "spk2enroll.json")
        n = simulate.build_spk2enroll_json(
            os.path.join(src, "wavs"), out_json
        )
        assert n == 4
        pool = kaldi_io.read_spk2enroll(out_json)
        assert all(len(v) == 2 for v in pool.values())

        scp_path = str(tmp_path / "enroll.scp")
        n = simulate.build_enrollment_scp(src, scp_path, train=True)
        assert n == 8
        rows = kaldi_io.read_scp(scp_path)
        assert all(kaldi_io.is_lazy_enrollment(v) for v in rows.values())

        n = simulate.build_enrollment_scp(
            src, scp_path, train=False, spk2enroll_path=out_json
        )
        rows = kaldi_io.read_scp(scp_path)
        assert all(v.endswith(".wav") for v in rows.values())
        # eval rows exclude the utterance itself
        for utt, path in rows.items():
            assert os.path.basename(path) != f"{utt}.wav"

    def test_format_sglspk(self, tmp_path):
        d = str(tmp_path / "2mix")
        os.makedirs(d)
        kaldi_io.write_scp(
            os.path.join(d, "wav.scp"), {"100-0-1_200-0-2": "/a.wav"}
        )
        kaldi_io.write_scp(
            os.path.join(d, "text_spk1"), {"100-0-1_200-0-2": "alpha"}
        )
        kaldi_io.write_scp(
            os.path.join(d, "text_spk2"), {"100-0-1_200-0-2": "beta"}
        )
        out = str(tmp_path / "sgl")
        stats = simulate.format_sglspk_dataset(d, out)
        assert stats["num_rows"] == 2
        text = kaldi_io.read_scp(os.path.join(out, "text"))
        assert text["100-0-1_200-0-2_spk1"] == "alpha"
        assert text["100-0-1_200-0-2_spk2"] == "beta"
        u2s = kaldi_io.read_scp(os.path.join(out, "utt2spk"))
        assert u2s["100-0-1_200-0-2_spk1"] == "100-0-1".split("-")[0]


class TestJobs:
    def test_array_jobs(self, tmp_path):
        log = str(tmp_path / "log.JOB.txt")
        out = str(tmp_path / "out.JOB")
        results = jobs.run_jobs(
            f"echo job JOB > {out}", log, jobs=(1, 4), max_jobs_run=2
        )
        assert len(results) == 4
        for j in range(1, 5):
            assert open(f"{tmp_path}/out.{j}").read().strip() == f"job {j}"
            assert "# Ended (code 0)" in open(f"{tmp_path}/log.{j}.txt").read()

    def test_failure_and_pick_failed(self, tmp_path):
        log = str(tmp_path / "log.JOB.txt")
        flag = str(tmp_path / "made_it")
        with pytest.raises(RuntimeError, match="1/2 jobs failed"):
            jobs.run_jobs(
                f'[ JOB -eq 1 ] && exit 1; touch {flag}', log, jobs=(1, 2)
            )
        # rerun only failed
        results = jobs.run_jobs("true", log, jobs=(1, 2), pick="failed")
        assert [r.job_id for r in results] == [1]

    def test_split_scp_speaker_boundaries(self):
        scp = {f"u{i}": str(i) for i in range(10)}
        u2s = {f"u{i}": f"s{i % 3}" for i in range(10)}
        chunks = jobs.split_scp(scp, 3, u2s)
        assert sum(len(c) for c in chunks) == 10
        for c in chunks:
            spks = {u2s[k] for k in c}
            for other in chunks:
                if other is not c:
                    assert not (spks & {u2s[k] for k in other})


class TestConfig:
    def test_named_configs_load(self):
        for name in [
            "train_tsasr_whisper_medium_full_con20_q16_l2_crop10_lr5e-5",
            "train_tsasr_whisper_medium_lora_qkvo_r16_",
            "train_tsasr_whisper_medium_masking_",
        ]:
            exp = load_experiment(f"conf/tswhisper/{name}.yaml")
            assert exp.whisper_model == "medium"
            assert exp.resolved_dims().n_audio_state == 1024
        exp = load_experiment(
            "conf/tswhisper/train_tsasr_whisper_medium_full_con20_q16_l2_crop10_lr5e-5.yaml"
        )
        assert exp.ts.num_query_tokens == 16
        assert exp.ts.num_hidden_layers == 2
        assert exp.model.contrastive_weight == 2.0
        assert exp.train.optim.lr == 5e-5
        assert exp.enroll_seconds == 10.0

        lora = load_experiment(
            "conf/tswhisper/train_tsasr_whisper_medium_lora_qkvo_r16_.yaml"
        )
        assert lora.train.mode == "lora"
        assert lora.train.lora.rank == 16

        dec = load_experiment("conf/tswhisper/decode_asr_whisper_beam1.yaml")
        assert dec.decode.beam_size == 1

    def test_unknown_keys_rejected(self):
        with pytest.raises(KeyError, match="model_conf.bogus"):
            experiment_from_dict({"model_conf": {"bogus": 1}})
        with pytest.raises(KeyError, match="top-level"):
            experiment_from_dict({"nonsense": {}})

    def test_init_tokens_explicitness_is_tracked(self):
        """cli.decode must honor an EXPLICIT decode_conf.init_tokens even
        when it equals the dataclass default — the bare [sos] a cli.train
        checkpoint is conditioned on IS the default, so a value-vs-default
        comparison misreads it as unset and silently decodes with the full
        OpenAI sot sequence (measured: WER 1.34 on an acc-0.996 overfit
        checkpoint)."""
        exp = experiment_from_dict({})
        assert not exp.decode_init_tokens_explicit
        exp = experiment_from_dict({"decode_conf": {"beam_size": 2}})
        assert not exp.decode_init_tokens_explicit
        exp = experiment_from_dict({"decode_conf": {"init_tokens": [50258]}})
        assert exp.decode_init_tokens_explicit
        assert exp.decode.init_tokens == (50258,)


class TestFbankAndResnet:
    def test_fbank_shapes_and_cmn(self):
        from robustsq_whisper_tpu.audio.fbank import kaldi_fbank

        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, SR)).astype(np.float32) * 0.1)
        feats, flens = kaldi_fbank(audio, jnp.asarray([SR, SR // 2]))
        assert feats.shape == (2, 1 + (SR - 400) // 160, 80)
        np.testing.assert_array_equal(
            np.asarray(flens), [1 + (SR - 400) // 160, 1 + (SR // 2 - 400) // 160]
        )
        # CMN: mean over valid frames ~ 0
        valid = np.asarray(feats[1, : int(flens[1])])
        np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)

    def test_fbank_scale_invariance_of_cmn(self):
        """log + CMN makes features invariant to input gain."""
        from robustsq_whisper_tpu.audio.fbank import kaldi_fbank

        rng = np.random.default_rng(1)
        a = rng.standard_normal((1, SR)).astype(np.float32) * 0.1
        f1, _ = kaldi_fbank(jnp.asarray(a))
        f2, _ = kaldi_fbank(jnp.asarray(a * 4.0))
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-3)

    def test_speaker_resnet_discriminates(self):
        from robustsq_whisper_tpu.models.speaker_resnet import SpeakerResNet34

        model = SpeakerResNet34(embed_dim=32, base_channels=8)
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.standard_normal((2, 64, 80)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), feats)
        e = model.apply(variables, feats)
        assert e.shape == (2, 32)
        assert np.all(np.isfinite(np.asarray(e)))
        # different inputs -> different embeddings
        assert not np.allclose(np.asarray(e[0]), np.asarray(e[1]))

    def test_extract_embeddings_for_dir(self, tmp_path):
        from robustsq_whisper_tpu.models.speaker_resnet import (
            extract_embeddings_for_dir,
        )

        src = _make_clean_dir(tmp_path, n_speakers=2, utts_per_spk=1)
        out = str(tmp_path / "emb")
        stats = extract_embeddings_for_dir(src, out, embed_dim=16)
        assert stats["num_utts"] == 2
        scp = kaldi_io.read_scp(os.path.join(src, "resnet.scp"))
        for utt, path in scp.items():
            v = np.load(path)
            assert v.shape == (16,)
            np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)


class TestLibriSpeechPrep:
    def test_tree_to_kaldi(self, tmp_path):
        root = str(tmp_path / "LibriSpeech" / "train-clean-100")
        rng = np.random.default_rng(0)
        for spk in ["19", "26"]:
            ch_dir = os.path.join(root, spk, "7")
            os.makedirs(ch_dir, exist_ok=True)
            with open(os.path.join(ch_dir, f"{spk}-7.trans.txt"), "w") as f:
                for u in range(2):
                    utt = f"{spk}-7-{u:04d}"
                    kaldi_io.write_wav(
                        os.path.join(ch_dir, f"{utt}.wav"),
                        (0.1 * rng.standard_normal(800)).astype(np.float32),
                        16000,
                    )
                    f.write(f"{utt} HELLO WORLD {u}\n")
        out = str(tmp_path / "data")
        stats = simulate.librispeech_to_kaldi(root, out)
        assert stats == {"num_utts": 4, "num_speakers": 2}
        assert kaldi_io.validate_data_dir(out) == []
        text = kaldi_io.read_scp(os.path.join(out, "text"))
        assert text["19-7-0001"] == "HELLO WORLD 1"
