"""Bisection driver for the KERNELS §11 deferred-reorder whole-program
fault.

Round 3 found that the full medium/b64/beam5 beam program with
``DecodeConfig.defer_reorder=R`` crashes the TPU worker on first
execution, while every isolated composition (the settled kernel alone,
a while_loop with window mini-reorder + flush + the kernel, that loop
plus the grouped int4 cross kernel) runs clean at the same shapes.  The
remaining delta is the all-XLA rest of the program (prefill,
projections, top_k, history buffers).  This driver rebuilds EXACTLY the
shipping program — ``decode.search.build_beam_decoder`` on a real
``TSDecoder`` with random weights and synthetic encoder memory (no
encoder, no audio, no tokenizer) — with every axis of the bisection as
a flag, so the failing configuration can be shrunk one axis at a time:

    python examples/defer_fault_probe.py --model medium --batch 64 \
        --beam 5 --defer 16 --new_tokens 128          # the faulting point
    python examples/defer_fault_probe.py --layers 2 ...   # fewer layers
    python examples/defer_fault_probe.py --no_quant ...   # dense cross-KV
    python examples/defer_fault_probe.py --defer 0 ...    # control: eager

Exit code 0 = ran + token parity with the eager control (when
``--check`` is set); a worker crash kills the process, which is the
signal being bisected.  Reference: the reference has no beam kernels at
all (ESPnet BeamSearch on GPU); this is tpu-repo-internal debugging.
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="medium")
    p.add_argument("--layers", type=int, default=0,
                   help="override decoder layer count (0 = model default)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--defer", type=int, default=16,
                   help="flush period R (0 = eager reorder control)")
    p.add_argument("--new_tokens", type=int, default=128)
    p.add_argument("--audio_ctx", type=int, default=0,
                   help="encoder memory length (0 = model n_audio_ctx)")
    p.add_argument("--prompt", type=int, default=16,
                   help="spk prompt length (qformer query tokens)")
    p.add_argument("--no_quant", action="store_true",
                   help="dense cross-KV instead of int4 + prefill_quantized")
    p.add_argument("--min_new", type=int, default=0)
    p.add_argument("--check", action="store_true",
                   help="also run the eager control and compare tokens")
    p.add_argument("--trace_dir", default="",
                   help="capture one profiled run (parse with "
                   "utils.profiling.op_stats)")
    p.add_argument("--iters", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from robustsq_whisper_tpu.decode.search import (
        DecodeConfig,
        build_beam_decoder,
    )
    from robustsq_whisper_tpu.models import TSDecoder
    from robustsq_whisper_tpu.models.whisper.config import whisper_dims

    over = {}
    if args.layers:
        over["n_text_layer"] = args.layers
    dims = whisper_dims(args.model, **over)
    T = args.audio_ctx or dims.n_audio_ctx
    print(f"dims: layers={dims.n_text_layer} state={dims.n_text_state} "
          f"T={T} batch={args.batch} beam={args.beam} defer={args.defer}")

    dec = TSDecoder(dims, dtype=jnp.bfloat16, cross_kv_bits=4)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    mem1 = jax.random.normal(k1, (1, T, dims.n_text_state), jnp.bfloat16)
    sp1 = jax.random.normal(
        k2, (1, args.prompt, dims.n_text_state), jnp.bfloat16
    )

    def init(r):
        toks = jnp.zeros((1, 4), jnp.int32)
        return dec.init(r, mem1, toks, sp1)

    variables = jax.jit(init)(k3)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)

    memory = jnp.tile(mem1, (args.batch, 1, 1))
    # distinct rows matter for beam divergence: perturb per row
    memory = memory + 0.01 * jax.random.normal(
        jax.random.PRNGKey(7), memory.shape, jnp.bfloat16
    )
    spk_prompt = jnp.tile(sp1, (args.batch, 1, 1))

    cfg = DecodeConfig(
        max_new_tokens=args.new_tokens,
        min_new_tokens=args.min_new,
        eot=dims.n_vocab - 1,  # random weights never emit it; fixed length
        init_tokens=(dims.n_vocab - 2,),
        beam_size=args.beam,
        quantize_cross_kv=not args.no_quant,
        prefill_quantized=not args.no_quant,
        defer_reorder=args.defer,
        stop_early=False,
    )
    run = build_beam_decoder(dec, variables, cfg)

    t0 = time.time()
    toks, scores = run(memory, spk_prompt)
    toks = np.asarray(toks)
    print(f"first run ok in {time.time()-t0:.1f}s; tokens {toks.shape}")
    for i in range(args.iters - 1):
        t0 = time.time()
        toks, scores = run(memory, spk_prompt)
        toks = np.asarray(toks)
        print(f"iter {i}: {(time.time()-t0)*1000:.1f} ms")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        toks, _ = run(memory, spk_prompt)
        np.asarray(toks)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")

    if args.check and args.defer > 0:
        ctl = build_beam_decoder(
            dec, variables, dataclasses.replace(cfg, defer_reorder=0)
        )
        ctoks, _ = ctl(memory, spk_prompt)
        ctoks = np.asarray(ctoks)
        match = bool((ctoks == toks).all())
        print(f"token parity vs eager: {match}")
        if not match:
            return 1
    print("PROBE_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
