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

from ..models.ts_decoder import TSDecoder
from ..models.ts_encoder import QFormerTSEncoder
from ..parallel.mesh import DATA_AXIS
from .search import DecodeConfig, build_beam_decoder, build_greedy_decoder


def build_sharded_decoder(
    dec: TSDecoder,
    variables: Any,
    cfg: DecodeConfig,
    mesh: Mesh,
) -> Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Returns ``run(memory, spk_prompt) -> (tokens, scores)`` decoding
    the batch data-parallel over ``mesh``'s ``data`` axis.

    Semantics match ``build_greedy_decoder``/``build_beam_decoder``
    exactly (the same inner program runs per shard); the batch must
    divide the data-axis size. Weights ride as replicated jit arguments
    — same no-closure rule as the single-chip builders.
    """
    builder = build_beam_decoder if cfg.beam_size > 1 else build_greedy_decoder
    inner = builder(dec, variables, cfg)
    # the builders return functools.partial(jitted_run, variables, qw)
    run, bound = inner.func, inner.args

    n_data = mesh.shape[DATA_AXIS]
    repl = P()
    data = P(DATA_AXIS)
    body = jax.shard_map(
        lambda v, qw, memory, spk: run(v, qw, memory, spk),
        mesh=mesh,
        in_specs=(repl, repl, data, data),
        out_specs=(data, data),
        check_vma=False,
    )
    jitted = jax.jit(body)
    # place the replicated weights once, not per call
    put = lambda t: jax.device_put(t, NamedSharding(mesh, repl))
    bound = tuple(jax.tree_util.tree_map(put, b) for b in bound)

    def run_sharded(memory: jax.Array, spk_prompt: jax.Array):
        assert memory.shape[0] % n_data == 0, (
            f"batch {memory.shape[0]} must divide the data axis ({n_data})"
        )
        sh = NamedSharding(mesh, data)
        return jitted(
            *bound, jax.device_put(memory, sh), jax.device_put(spk_prompt, sh)
        )

    return run_sharded


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
            f"batch {mel.shape[0]} must divide the data axis ({n_data})"
        )
        sh = NamedSharding(mesh, data)
        return jitted(
            enc_vars,
            *(jax.device_put(t, sh) for t in (mel, mel_lens, enroll_mel, enroll_lens)),
        )

    return encode
