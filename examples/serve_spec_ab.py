"""A/B the online serving daemon: greedy vs speculative (distilled draft).

Measures what `--speculative_gamma`/`--draft_path` (cli.serve) buy at the
daemon's real operating point — the offline gamma sweep
(spec_gamma_probe.py: 1.25x over flat-cache greedy at b64/gamma 6) times
the decode program alone, while the daemon's throughput also rides batch
fill and host->device staging (docs/SERVING.md "Measured online serving").

Three invocations sharing one weights dir (the chip-manufactured trained
checkpoint + distilled draft — the same recipe as bench.py's trained lane):

    python examples/serve_spec_ab.py --mode manufacture --dir /tmp/spec_ab
    python examples/serve_spec_ab.py --mode greedy --dir /tmp/spec_ab
    python examples/serve_spec_ab.py --mode spec   --dir /tmp/spec_ab

Each serving invocation starts the real HTTP daemon (serve/server.py) on
a fresh chip, drives it with closed-loop clients posting 30 s utterances
(corpus-family audio, so the trained weights emit real early eot and the
draft operates at its distilled acceptance), and prints one JSON line:
{"mode": ..., "online_rtf": ..., "req_s": ..., "p50_s": ..., "p95_s": ...,
 "fill": ...}.

No reference counterpart: the reference has no online serving
(/root/reference/run_tswhisper.sh:67-90 decodes offline only).
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import os
import pickle
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def manufacture(out_dir: str, steps: int, distill_steps: int) -> None:
    """Overfit medium on the synthetic corpus (bench.py trained-lane
    recipe: LoRA, 500 steps), distill the 4-layer draft, persist both."""
    import jax
    import jax.numpy as jnp

    from bench import synth_trained_corpus
    from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram_jit
    from robustsq_whisper_tpu.decode.search import DecodeConfig
    from robustsq_whisper_tpu.models import (
        QFormerTSEncoder,
        TSASRModel,
        TSDecoder,
        TSEncoderConfig,
        TSModelConfig,
        whisper_dims,
    )
    from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import special_tokens
    from robustsq_whisper_tpu.train.distill import (
        distill_draft,
        save_draft,
        teacher_forcing_inputs,
    )
    from robustsq_whisper_tpu.train.eval import eval_params
    from robustsq_whisper_tpu.train.optim import OptimConfig
    from robustsq_whisper_tpu.train.step import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    dims = whisper_dims("medium")
    st = special_tokens(multilingual=True)
    ts = TSEncoderConfig(
        num_query_tokens=16, num_hidden_layers=2, remat=True,
        use_flash_attention=True, flash_tmaj=False, gelu_approx=False,
    )
    n_items, tb = 32, 8
    corpus = synth_trained_corpus(dims, st, n_items)
    model = TSASRModel(
        dims, ts, TSModelConfig(use_specaug=False), dtype=jnp.bfloat16
    )

    def make_batch(idx):
        return {
            "speech": jnp.asarray(corpus["speech"][idx]),
            "speech_lens": jnp.full((len(idx),), corpus["seconds"] * SR, jnp.int32),
            "enroll": jnp.asarray(corpus["enroll"][idx]),
            "enroll_lens": jnp.full(
                (len(idx),), corpus["enroll_seconds"] * SR, jnp.int32
            ),
            "text": jnp.asarray(corpus["text"][idx]),
            "text_lens": jnp.asarray(corpus["text_lens"][idx]),
            "neg_logits": jnp.ones((len(idx), len(idx)), jnp.float32),
            "spk_labels": jnp.asarray(idx, jnp.int32),
        }

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    log(f"[manufacture] init medium (lora, {steps} steps) ...")
    tiny = make_batch(np.arange(2))
    variables = jax.jit(lambda r: model.init(r, tiny, r, 0, train=False))(rng)
    tcfg = TrainConfig(
        mode="lora",
        optim=OptimConfig(lr=2.5e-4, schedule="linear", warmup_steps=50),
    )
    state, tx = create_train_state(rng, variables, tcfg)
    step = make_train_step(model, tx, tcfg)
    batches = [
        make_batch(np.arange(s, s + tb) % n_items)
        for s in range(0, n_items, tb)
    ]
    log(f"[manufacture] init {time.time()-t0:.1f}s; training ...")
    state, stats = step(state, batches[0], rng, 0)
    float(stats["loss"])
    for i in range(1, steps):
        state, stats = step(
            state, batches[i % len(batches)], jax.random.fold_in(rng, i),
            i * tb // n_items,
        )
        if i % 100 == 0:
            log(f"[manufacture] step {i}: loss={float(stats['loss']):.2f} "
                f"acc={float(stats['acc']):.4f}")
    log(f"[manufacture] final acc={float(stats['acc']):.4f}")

    params = eval_params(state, tcfg)
    bufs = state.buffers.get("buffers", state.buffers)
    to_bf16 = lambda tree: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )
    enc_vars = jax.jit(to_bf16)(
        {"params": params["encoder"], "buffers": bufs["encoder"]}
    )
    dec_vars = jax.jit(to_bf16)({"params": params["decoder"]})
    jax.block_until_ready((enc_vars, dec_vars))
    del state, params, variables, batches, tiny, stats

    # ---- distill the draft against the serving encoder's context ----
    dcfg = DecodeConfig(
        max_new_tokens=128, eot=st.eot, beam_size=1,
        init_tokens=st.sot_sequence("en", "transcribe", True),
        quantize_cross_kv=True,
    )
    # distillation context = the SERVING encoder's output on the corpus
    # (what the draft will actually cross-attend at decode time)
    serve_ts = dataclasses.replace(
        ts, remat=False, flash_tmaj=True, gelu_approx=True
    )
    enc = QFormerTSEncoder(dims, serve_ts, dtype=jnp.bfloat16)
    spec_dec = TSDecoder(
        dims, dtype=jnp.bfloat16, cross_kv_bits=8, flat_self_cache=False
    )
    mel, fl = log_mel_spectrogram_jit(
        jnp.asarray(corpus["speech"]),
        jnp.full((n_items,), corpus["seconds"] * SR, jnp.int32),
        n_mels=dims.n_mels,
    )
    emel, el = log_mel_spectrogram_jit(
        jnp.asarray(corpus["enroll"]),
        jnp.full((n_items,), corpus["enroll_seconds"] * SR, jnp.int32),
        n_mels=dims.n_mels,
    )
    c_mem, _, c_prompt, _ = jax.jit(
        lambda v, *a: enc.apply(v, *a)
    )(enc_vars, mel, fl, emel, el)
    ys_in, d_mask = teacher_forcing_inputs(
        corpus["text"], corpus["text_lens"],
        sot=dcfg.init_tokens[0], eot=st.eot,
    )
    t0 = time.time()
    draft_v, dstats = distill_draft(
        spec_dec, dec_vars, 4, c_mem, c_prompt, ys_in, d_mask,
        steps=distill_steps, lr=3e-4, batch_size=8, seed=0, log=log,
    )
    log(f"[manufacture] distilled in {time.time()-t0:.1f}s: {dstats}")

    os.makedirs(out_dir, exist_ok=True)
    to_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
    with open(os.path.join(out_dir, "serving_weights.pkl"), "wb") as f:
        pickle.dump(
            {"enc_vars": to_np(enc_vars), "dec_vars": to_np(dec_vars)}, f
        )
    save_draft(
        os.path.join(out_dir, "draft"), draft_v,
        {"draft_layers": 4, "teacher_step": steps, **dstats},
    )
    np.savez(
        os.path.join(out_dir, "corpus_audio.npz"),
        speech=corpus["speech"][:4], enroll=corpus["enroll"][:4],
    )
    log(f"[manufacture] saved to {out_dir}")


def serve_and_measure(
    weights_dir: str, mode: str, gamma: int, batch: int,
    concurrency: int, wait_ms: float, duration: float,
    draft_subdir: str = "draft",
) -> dict:
    """Start the daemon (engine + MicroBatcher + HTTP) on the manufactured
    weights, drive it closed-loop, report the sustained operating point."""
    import jax
    import jax.numpy as jnp

    from robustsq_whisper_tpu.decode.search import DecodeConfig
    from robustsq_whisper_tpu.models import (
        QFormerTSEncoder,
        TSDecoder,
        TSEncoderConfig,
        whisper_dims,
    )
    from robustsq_whisper_tpu.serve import (
        EngineConfig,
        TranscriptionEngine,
        make_server,
    )
    from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import (
        load_tokenizer,
        special_tokens,
    )
    from robustsq_whisper_tpu.train.distill import load_draft

    dims = whisper_dims("medium")
    st = special_tokens(multilingual=True)
    ts = TSEncoderConfig(
        num_query_tokens=16, num_hidden_layers=2,
        use_flash_attention=True, flash_tmaj=True, gelu_approx=True,
    )
    with open(os.path.join(weights_dir, "serving_weights.pkl"), "rb") as f:
        w = pickle.load(f)
    enc_vars = jax.device_put(w["enc_vars"])
    dec_vars = jax.device_put(w["dec_vars"])
    jax.block_until_ready((enc_vars, dec_vars))

    spec = mode == "spec"
    dcfg = DecodeConfig(
        max_new_tokens=128, eot=st.eot, beam_size=1,
        init_tokens=st.sot_sequence("en", "transcribe", True),
        quantize_cross_kv=True,
        speculative_gamma=gamma if spec else 0,
        draft_layers=4,
    )
    encoder = QFormerTSEncoder(dims, ts, dtype=jnp.bfloat16)
    decoder = TSDecoder(
        dims, dtype=jnp.bfloat16, cross_kv_bits=8,
        flat_self_cache=not spec,
    )
    draft_vars = None
    draft_layers = 4
    if spec:
        raw, meta = load_draft(os.path.join(weights_dir, draft_subdir))
        draft_layers = int(meta.get("draft_layers", 4))
        draft_vars = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if np.dtype(getattr(x, "dtype", np.float32)) == np.float32
                else jnp.asarray(x), t,
            )
        )(raw)
        jax.block_until_ready(draft_vars)
        dcfg = dataclasses.replace(dcfg, draft_layers=draft_layers)
        log(f"[serve] draft({draft_layers}L): "
            f"{meta.get('final_agreement')} agreement")

    engine = TranscriptionEngine(
        encoder, enc_vars, decoder, dec_vars, load_tokenizer(None), dcfg,
        EngineConfig(batch_size=batch, speech_seconds=30.0,
                     enroll_seconds=10.0),
        draft_vars=draft_vars,
    )
    t0 = time.time()
    log("[serve] warmup compile ...")
    engine.warmup()
    log(f"[serve] warmup {time.time()-t0:.1f}s")

    server, batcher = make_server(
        engine, "127.0.0.1", 0, max_wait_ms=wait_ms, info={"mode": mode}
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # closed-loop clients posting corpus-family audio as base64 WAV (the
    # trained weights emit real early eot on these; serve_loadgen.py wire
    # format)
    import base64
    import urllib.request

    from scipy.io import wavfile

    audio = np.load(os.path.join(weights_dir, "corpus_audio.npz"))

    def wav_b64(x):
        buf = io.BytesIO()
        wavfile.write(buf, SR, (np.clip(x, -1, 1) * 32767).astype(np.int16))
        return base64.b64encode(buf.getvalue()).decode()

    bodies = [
        json.dumps({
            "speech_wav": wav_b64(audio["speech"][i]),
            "enroll_wav": wav_b64(audio["enroll"][i]),
        }).encode()
        for i in range(audio["speech"].shape[0])
    ]
    url = f"http://127.0.0.1:{port}/v1/transcribe"
    lat, lock = [], threading.Lock()
    stop_at = [0.0]

    def client(i):
        k = 0
        while time.monotonic() < stop_at[0]:
            t0 = time.monotonic()
            req = urllib.request.Request(
                url, data=bodies[(i + k) % len(bodies)],
                headers={"Content-Type": "application/json"},
            )
            k += 1
            try:
                with urllib.request.urlopen(req, timeout=300) as resp:
                    json.loads(resp.read())
            except OSError:
                time.sleep(0.05)
                continue
            with lock:
                lat.append(time.monotonic() - t0)

    warmup_s = 12.0
    stop_at[0] = time.monotonic() + warmup_s + duration + 600
    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(concurrency)
    ]
    for t in threads:
        t.start()
    time.sleep(warmup_s)
    with lock:
        lat.clear()
        b0, r0 = batcher.batches, batcher.requests
    t_meas = time.time()
    time.sleep(duration)
    with lock:
        window = sorted(lat)
        b1, r1 = batcher.batches, batcher.requests
    wall = time.time() - t_meas
    stop_at[0] = 0.0
    for t in threads:
        t.join(timeout=310)
    server.shutdown()
    batcher.close()
    server.server_close()

    n = len(window)
    fill = (r1 - r0) / max(b1 - b0, 1)
    rec = {
        "mode": mode,
        "gamma": gamma if spec else 0,
        "draft_layers": draft_layers if spec else 0,
        "batch": batch,
        "concurrency": concurrency,
        "wait_ms": wait_ms,
        "window_s": round(wall, 1),
        "requests": n,
        "req_s": round(n / wall, 2),
        "online_rtf": round(n * 30.0 / wall, 1),
        "p50_s": round(window[n // 2], 2) if n else None,
        "p95_s": round(window[int(n * 0.95)], 2) if n else None,
        "max_s": round(window[-1], 2) if n else None,
        "fill": round(fill, 1),
        "shed": batcher.shed,
        "errors": batcher.errors,
    }
    return rec


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", required=True,
                   choices=("manufacture", "greedy", "spec"))
    p.add_argument("--dir", default="/tmp/spec_ab")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--distill_steps", type=int, default=400)
    p.add_argument("--gamma", type=int, default=6)
    p.add_argument("--draft_subdir", default="draft",
                   help="draft checkpoint subdir under --dir (e.g. a "
                   "smaller distilled draft saved as draft2)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--concurrency", type=int, default=64)
    p.add_argument("--wait_ms", type=float, default=60.0)
    p.add_argument("--duration", type=float, default=60.0)
    args = p.parse_args()

    if args.mode == "manufacture":
        manufacture(args.dir, args.steps, args.distill_steps)
        return
    rec = serve_and_measure(
        args.dir, args.mode, args.gamma, args.batch,
        args.concurrency, args.wait_ms, args.duration,
        draft_subdir=args.draft_subdir,
    )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
