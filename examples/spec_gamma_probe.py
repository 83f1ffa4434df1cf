"""Speculative-decode gamma sweep with a distilled draft, CLI operating
point: restore the RECIPE_E2E teacher once, encode the 64-row overfit set,
then time flat-cache greedy vs the distilled-draft speculative decoder at
gamma 4/6/8 (steady state, min of 3). Produces the gamma-tuning row set in
docs/SERVING.md. Run from the repo after `examples/recipe_e2e.sh` +
`cli.distill` have produced `exp/recipe_e2e/exp/{checkpoints,draft}`."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from robustsq_whisper_tpu.utils.config import load_experiment
from robustsq_whisper_tpu.train.checkpoint import restore_serving_variables
from robustsq_whisper_tpu.models import QFormerTSEncoder, TSDecoder
from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import load_tokenizer, special_tokens_for_vocab
from robustsq_whisper_tpu.data.dataset import KaldiTSDataset
from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram_jit
from robustsq_whisper_tpu.decode.search import DecodeConfig, build_beam_decoder, strip_eot
from robustsq_whisper_tpu.decode.speculative import build_speculative_decoder
from robustsq_whisper_tpu.train.distill import load_draft

jax.config.update("jax_compilation_cache_dir", "/tmp/bench_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

exp = load_experiment("conf/tswhisper/train_tsasr_whisper_medium_full_e2e_overfit.yaml")
dims = exp.resolved_dims()
dtype = jnp.bfloat16
tok = load_tokenizer(None)
variables, step_i, _ = restore_serving_variables("exp/recipe_e2e/exp/checkpoints", dtype, exp.train)
print("restored", step_i, flush=True)

def to_compute(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype) if np.dtype(getattr(x, "dtype", np.float32)) == np.float32 else jnp.asarray(x), tree)

enc_vars = jax.jit(to_compute)({"params": variables["params"]["encoder"], "buffers": variables["buffers"]["encoder"]})
dec_vars = jax.jit(to_compute)({"params": variables["params"]["decoder"]})
jax.block_until_ready((enc_vars, dec_vars))
variables = None

encoder = QFormerTSEncoder(dims, exp.ts, dtype=dtype)
dec_flat = TSDecoder(dims.replace(n_vocab=exp.model.vocab_size), startofprev_token=exp.model.startofprev, dtype=dtype, cross_kv_bits=8)
dec_5d = TSDecoder(dims.replace(n_vocab=exp.model.vocab_size), startofprev_token=exp.model.startofprev, dtype=dtype, cross_kv_bits=8, flat_self_cache=False)

ds = KaldiTSDataset("exp/recipe_e2e/dump/train_synth_noisy", tok, speech_seconds=exp.speech_seconds, enroll_seconds=exp.enroll_seconds, utt_style=exp.utt_style, seed=0)
b = next(ds.batches(64, shuffle=False, drop_last=False)); b.pop("utt_ids", None)
mel, fl = log_mel_spectrogram_jit(jnp.asarray(b["speech"]), jnp.asarray(b["speech_lens"]), n_mels=dims.n_mels)
emel, el = log_mel_spectrogram_jit(jnp.asarray(b["enroll"]), jnp.asarray(b["enroll_lens"]), n_mels=dims.n_mels)
encode = jax.jit(lambda v, m, f, em, e: encoder.apply(v, m, f, em, e))
memory, _, prompt, _ = encode(enc_vars, mel, fl, emel, el)
jax.block_until_ready(memory)
print("encoded 64 rows", flush=True)

draft_raw, meta = load_draft("exp/recipe_e2e/exp/draft")
draft_v = jax.jit(to_compute)(draft_raw)
base_cfg = DecodeConfig(max_new_tokens=128, eot=exp.model.eos, init_tokens=exp.decode.init_tokens, beam_size=1, quantize_cross_kv=True)

def timeit(run, label):
    t, _ = run(memory, prompt) if label == "greedy" else (None, None)
    out = None
    times = []
    for i in range(3):
        t0 = time.time()
        r = run(memory, prompt)
        toks = np.asarray(r[0])
        times.append(time.time() - t0)
        out = r
    return min(times), out

greedy = build_beam_decoder(dec_flat, dec_vars, base_cfg)
g_ms, g_out = timeit(greedy, "g")
g_rows = strip_eot(np.asarray(g_out[0]), exp.model.eos)
print(f"greedy(flat,b64): {g_ms*1000:.1f} ms  mean_tokens={np.mean([len(r) for r in g_rows]):.1f}", flush=True)

for gamma in (4, 6, 8):
    cfg = dataclasses.replace(base_cfg, speculative_gamma=gamma, draft_layers=4)
    spec = build_speculative_decoder(dec_5d, dec_vars, cfg, return_stats=True, draft_vars=draft_v)
    s_ms, s_out = timeit(spec, "s")
    stok, _, st = s_out
    ch = int(np.sum(np.asarray(st["chunks"]))); acc = int(np.sum(np.asarray(st["accepted"])))
    match = strip_eot(np.asarray(stok), exp.model.eos) == g_rows
    print(f"spec gamma={gamma}: {s_ms*1000:.1f} ms  acceptance={acc/max(ch*gamma,1):.4f}  "
          f"speedup_vs_flat_greedy={g_ms/s_ms:.3f}  tokens_match={match}", flush=True)
    del spec, s_out, stok
print("PROBE DONE", flush=True)
