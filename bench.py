"""Benchmark: Whisper-medium TS-ASR batched decode RTF on one TPU chip.

Measures the north-star metric (BASELINE.json): audio-seconds of 30 s
utterances transcribed per chip-second, end to end — log-mel frontend +
Qformer TS encoder + speaker-prompted KV-cache greedy decode (the reference's
decode re-runs the whole prefix per token, whisper_decoder.py:174-176; this
is the gap the TPU build closes). Baseline for ``vs_baseline`` is the
driver-set 50x real-time target.

Prints ONE JSON line to stdout; all logging goes to stderr.

Env knobs: BENCH_MODEL (tiny|base|small|medium, default medium),
BENCH_BATCH (default 32), BENCH_NEW_TOKENS (default 128), BENCH_ITERS
(default 3), BENCH_FLASH (Pallas encoder attention, default 1),
BENCH_INT8_KV (fused int8 cross-attention decode kernel, default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from robustsq_whisper_tpu.decode.search import DecodeConfig, build_greedy_decoder
    from robustsq_whisper_tpu.models import (
        QFormerTSEncoder,
        TSDecoder,
        TSEncoderConfig,
        whisper_dims,
    )
    from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import special_tokens

    model_name = os.environ.get("BENCH_MODEL", "medium")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    new_tokens = int(os.environ.get("BENCH_NEW_TOKENS", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    compute_dtype = jnp.bfloat16

    dims = whisper_dims(model_name)
    st = special_tokens(multilingual=True)
    ts = TSEncoderConfig(
        num_query_tokens=16,
        num_hidden_layers=2,
        use_flash_attention=os.environ.get("BENCH_FLASH", "1") == "1",
    )
    log(f"devices: {jax.devices()}")
    dev = jax.devices()[0]

    enc = QFormerTSEncoder(dims, ts, dtype=compute_dtype)
    dec = TSDecoder(dims, dtype=compute_dtype)

    rng = jax.random.PRNGKey(0)
    seconds = 30
    samples = seconds * 16000
    frames = samples // 160
    mel = jax.random.normal(rng, (batch, dims.n_mels, frames), jnp.float32)
    emel = jax.random.normal(rng, (batch, dims.n_mels, 1000), jnp.float32)
    feats_lens = jnp.full((batch,), frames, jnp.int32)
    emel_lens = jnp.full((batch,), 1000, jnp.int32)

    t0 = time.time()
    log(f"initializing {model_name} params ...")
    enc_vars = jax.jit(
        lambda r: enc.init(r, mel, feats_lens, emel, emel_lens)
    )(rng)
    audio_out_len = ts.num_query_tokens + dims.n_audio_ctx
    mem_shape = (batch, audio_out_len, dims.n_audio_state)
    dummy_mem = jnp.zeros(mem_shape, compute_dtype)
    dummy_prompt = jnp.zeros((batch, ts.num_query_tokens), jnp.int32)
    dec_vars = jax.jit(
        lambda r: dec.init(
            r,
            dummy_mem,
            jnp.zeros((batch, 4), jnp.int32),
            jnp.zeros((batch, ts.num_query_tokens, dims.n_audio_state), compute_dtype),
        )
    )(rng)
    # Serving keeps weights in bf16: decode is weight-bandwidth-bound
    # (per-step HBM traffic ~= parameter bytes), so fp32 params would halve
    # the step rate for no accuracy benefit at inference.
    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32
            else x,
            tree,
        )

    enc_vars, dec_vars = to_bf16(enc_vars), to_bf16(dec_vars)
    jax.block_until_ready((enc_vars, dec_vars))
    log(f"init done in {time.time()-t0:.1f}s")

    # full pipeline: mel -> encoder -> greedy decode. Weights are jit
    # ARGUMENTS (closed-over device arrays lower as per-leaf constants,
    # fetched device->host — minutes over a tunneled TPU).
    dcfg = DecodeConfig(
        max_new_tokens=new_tokens,
        eot=st.eot,
        init_tokens=st.sot_sequence("en", "transcribe", True),
        beam_size=1,
        quantize_cross_kv=os.environ.get("BENCH_INT8_KV", "1") == "1",
    )
    greedy = build_greedy_decoder(dec, dec_vars, dcfg)
    encode = jax.jit(
        lambda v, m, fl, em, el: enc.apply(v, m, fl, em, el)
    )

    def pipeline():
        memory, out_lens, spk_prompt, _ = encode(
            enc_vars, mel, feats_lens, emel, emel_lens
        )
        return greedy(memory, spk_prompt)

    t0 = time.time()
    log("compiling pipeline ...")
    tokens, scores = pipeline()
    np.asarray(tokens)  # device->host fetch: the only reliable completion
    log(f"compile+first run {time.time()-t0:.1f}s")  # barrier on a tunneled TPU

    times = []
    for i in range(iters):
        t0 = time.time()
        tokens, scores = pipeline()
        np.asarray(tokens)
        times.append(time.time() - t0)
        log(f"iter {i}: {times[-1]*1000:.1f} ms")

    wall = min(times)
    audio_sec = batch * seconds
    rtf = audio_sec / wall
    log(
        f"model={model_name} batch={batch} new_tokens={new_tokens} "
        f"wall={wall*1000:.1f}ms audio={audio_sec}s RTF={rtf:.1f}x"
    )
    print(
        json.dumps(
            {
                "metric": f"ts_asr_decode_rtf_{model_name}_b{batch}",
                "value": round(rtf, 2),
                "unit": "audio-sec/chip-sec",
                "vs_baseline": round(rtf / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
