"""Data-parallel serving: batched decode sharded over a device mesh.

The reference parallelizes decode by PROCESS sharding — ``inference_nj``
splits the scp into N jobs and ``run.pl`` runs N single-GPU python
processes (/root/reference/run_tswhisper.sh:42-44; SURVEY.md §2.4). The
TPU-native equivalent keeps ONE process and shards the utterance batch
over the chips of a ``jax.sharding.Mesh``: ``jax.shard_map`` over the
``data`` axis runs the identical single-chip decode program — prefill,
token loop, Pallas kernels and all — on each chip's batch shard. Decode
is embarrassingly parallel across utterances, so the body contains no
collectives; XLA only shards the inputs and concatenates the outputs.

Why shard_map and not bare pjit sharding propagation: the decode loop
calls Pallas kernels (quantized cross-attention, flat-cache
self-attention, the beam DMA reorder), and a ``pallas_call`` cannot be
auto-partitioned by SPMD propagation — it must see LOCAL shapes.
shard_map gives every device the per-shard program with local shapes,
which is exactly the single-chip code path already measured and tested.

Weights are replicated (P()); memory/spk_prompt/outputs are sharded on
the leading batch axis (P("data")). The per-chip batch is
``batch // mesh.shape["data"]``, so serving throughput scales linearly
with chips at the single-chip RTF — the multi-chip dryrun test pins
output equality against the unsharded decoder on a CPU mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import dataclasses

from ..models.ts_decoder import TSDecoder
from ..models.ts_encoder import QFormerTSEncoder
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, params_shardings
from .search import DecodeConfig, build_beam_decoder, build_greedy_decoder


def build_sharded_decoder(
    dec: TSDecoder,
    variables: Any,
    cfg: DecodeConfig,
    mesh: Mesh,
    return_stats: bool = False,
) -> Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Returns ``run(memory, spk_prompt) -> (tokens, scores)`` decoding
    the batch data-parallel over ``mesh``'s ``data`` axis.

    Semantics match ``build_greedy_decoder``/``build_beam_decoder``
    exactly (the same inner program runs per shard); the batch must
    divide the data-axis size. Weights ride as replicated jit arguments
    — same no-closure rule as the single-chip builders.

    ``return_stats=True`` (speculative greedy only) shards the per-row
    acceptance counters like the other outputs, so measuring draft
    acceptance works identically under DP serving.
    """
    if return_stats:
        if not (cfg.speculative_gamma > 0 and cfg.beam_size == 1):
            raise ValueError(
                "return_stats is a speculative-greedy feature: needs "
                "speculative_gamma > 0 and beam_size == 1"
            )
        from .speculative import build_speculative_decoder

        inner = build_speculative_decoder(
            dec, variables, cfg, return_stats=True
        )
    else:
        builder = (
            build_beam_decoder if cfg.beam_size > 1 else build_greedy_decoder
        )
        inner = builder(dec, variables, cfg)
    # the builders return functools.partial(jitted_run, *weights): 2 bound
    # args for greedy/beam (variables, qw), 4 for speculative (variables,
    # draft variables, qw, draft qw) — all replicated either way
    run, bound = inner.func, inner.args

    n_data = mesh.shape[DATA_AXIS]
    repl = P()
    data = P(DATA_AXIS)
    stats_spec = {"chunks": data, "accepted": data, "emitted": data}
    body = jax.shard_map(
        lambda *a: run(*a),
        mesh=mesh,
        in_specs=(repl,) * len(bound) + (data, data),
        out_specs=(data, data, stats_spec) if return_stats else (data, data),
        check_vma=False,
    )
    jitted = jax.jit(body)
    # place the replicated weights once, not per call
    put = lambda t: jax.device_put(t, NamedSharding(mesh, repl))
    bound = tuple(jax.tree_util.tree_map(put, b) for b in bound)

    def run_sharded(memory: jax.Array, spk_prompt: jax.Array):
        assert memory.shape[0] % n_data == 0, (
            f"batch {memory.shape[0]} must be a multiple of the data-axis size ({n_data})"
        )
        sh = NamedSharding(mesh, data)
        return jitted(
            *bound, jax.device_put(memory, sh), jax.device_put(spk_prompt, sh)
        )

    return run_sharded


def build_tp_decoder(
    dec: TSDecoder,
    variables: Any,
    cfg: DecodeConfig,
    mesh: Mesh,
) -> Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Tensor-parallel serving: ``run(memory, spk_prompt)`` with the decoder
    WEIGHTS (and KV caches) sharded over ``mesh``'s ``model`` axis, batch
    over ``data``.

    This is the CAPACITY mode — for checkpoints or beam KV footprints that
    exceed one chip's HBM — and it uses the dense XLA decode path under
    GSPMD: parameters are placed with the Megatron-style partition rules of
    ``parallel/mesh.py`` (q/k/v and fc1 column-sharded over heads / FFN
    hidden, out and fc2 row-sharded, tied token embedding vocab-sharded) and
    XLA's SPMD partitioner inserts the two all-reduces per layer plus the
    logits all-gather on ICI. The Pallas serving kernels (quantized
    cross-KV, flat self-cache, W8A8 step weights) cannot be auto-partitioned
    — a ``pallas_call`` needs local shapes — so this builder requires the
    dense configuration and the single-chip-speed kernels stay on the
    data-parallel path (``build_sharded_decoder``). Throughput-per-chip is
    therefore lower than DP serving; use TP only when the model does not fit.

    Equality with the single-device dense decoder is pinned by
    tests on a virtual CPU mesh (dp x tp).
    """
    assert mesh.shape[MODEL_AXIS] > 1, dict(mesh.shape)
    assert not cfg.quantize_cross_kv and not cfg.quantize_weights, (
        "TP serving runs the dense XLA decode path: build the DecodeConfig "
        "with quantize_cross_kv=False, quantize_weights=False"
    )
    assert not dec.flat_self_cache, (
        "TP serving requires TSDecoder(flat_self_cache=False) — the flat "
        "cache's Pallas self-attention cannot be auto-partitioned"
    )
    if cfg.beam_size > 1 and cfg.beam_reorder != "take":
        # the "dma"/"auto" cache reorder is a Pallas HBM->HBM kernel
        # (ops/beam_gather.py) — not partitionable either; beam TP uses the
        # XLA gather
        cfg = dataclasses.replace(cfg, beam_reorder="take")
    builder = build_beam_decoder if cfg.beam_size > 1 else build_greedy_decoder
    inner = builder(dec, variables, cfg)
    run, bound = inner.func, inner.args

    # jit respects committed input shardings: placing the params with the
    # TP rules and the activations on the data axis is all GSPMD needs.
    bound = tuple(
        jax.device_put(b, params_shardings(mesh, b)) if b is not None else b
        for b in bound
    )
    n_data = mesh.shape[DATA_AXIS]

    def run_tp(memory: jax.Array, spk_prompt: jax.Array):
        assert memory.shape[0] % n_data == 0, (
            f"batch {memory.shape[0]} must be a multiple of the data-axis size ({n_data})"
        )
        sh = NamedSharding(mesh, P(DATA_AXIS))
        return run(
            *bound, jax.device_put(memory, sh), jax.device_put(spk_prompt, sh)
        )

    return run_tp


def build_tp_encoder(
    encoder: QFormerTSEncoder,
    enc_vars: Any,
    mesh: Mesh,
) -> Callable[..., Tuple[jax.Array, ...]]:
    """Tensor-parallel encoder companion to :func:`build_tp_decoder`: weights
    sharded over the ``model`` axis under GSPMD (same partition rules), batch
    over ``data``. Requires ``TSEncoderConfig(use_flash_attention=False)`` —
    the Pallas flash kernel needs local shapes."""
    assert mesh.shape[MODEL_AXIS] > 1, dict(mesh.shape)
    assert not encoder.ts.use_flash_attention, (
        "TP serving requires TSEncoderConfig(use_flash_attention=False)"
    )
    n_data = mesh.shape[DATA_AXIS]
    jitted = jax.jit(
        lambda v, mel, fl, emel, el: encoder.apply(v, mel, fl, emel, el)
    )
    enc_vars = jax.device_put(enc_vars, params_shardings(mesh, enc_vars))

    def encode(mel, mel_lens, enroll_mel, enroll_lens):
        assert mel.shape[0] % n_data == 0, (
            f"batch {mel.shape[0]} must be a multiple of the data-axis size ({n_data})"
        )
        sh = NamedSharding(mesh, P(DATA_AXIS))
        return jitted(
            enc_vars,
            *(jax.device_put(t, sh) for t in (mel, mel_lens, enroll_mel, enroll_lens)),
        )

    return encode


def build_sharded_encoder(
    encoder: QFormerTSEncoder,
    enc_vars: Any,
    mesh: Mesh,
) -> Callable[..., Tuple[jax.Array, ...]]:
    """Returns ``encode(mel, mel_lens, enroll_mel, enroll_lens)`` running the
    TS encoder data-parallel over ``mesh``'s ``data`` axis.

    Same shard_map rationale as :func:`build_sharded_decoder` — the encoder's
    Pallas flash-attention kernel needs LOCAL shapes, so each chip runs the
    single-chip encoder program on its batch shard. Weights are replicated and
    placed once; the 4-tuple outputs stay batch-sharded, feeding straight into
    the sharded decoder without a resharding collective.
    """
    n_data = mesh.shape[DATA_AXIS]
    repl = P()
    data = P(DATA_AXIS)
    body = jax.shard_map(
        lambda v, mel, fl, emel, el: encoder.apply(v, mel, fl, emel, el),
        mesh=mesh,
        in_specs=(repl, data, data, data, data),
        out_specs=(data, data, data, data),
        check_vma=False,
    )
    jitted = jax.jit(body)
    enc_vars = jax.device_put(enc_vars, NamedSharding(mesh, repl))

    def encode(mel, mel_lens, enroll_mel, enroll_lens):
        assert mel.shape[0] % n_data == 0, (
            f"batch {mel.shape[0]} must be a multiple of the data-axis size ({n_data})"
        )
        sh = NamedSharding(mesh, data)
        return jitted(
            enc_vars,
            *(jax.device_put(t, sh) for t in (mel, mel_lens, enroll_mel, enroll_lens)),
        )

    return encode
