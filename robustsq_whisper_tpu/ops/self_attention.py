"""Pallas decode self-attention over the PACKED flat KV cache.

Why this exists: the natural (layers, batch, time, heads, head_dim) cache
has head_dim = 64 as its minor dim, and XLA tiles bf16 as T(8,128) — the
64-wide lanes are PADDED to 128, so the cache physically occupies 2x its
logical bytes in HBM and every attention read pays 2x bandwidth. Worse,
beam search's per-step cache reorder kernel wants a packed flat view, and
the padded-5D <-> packed reshapes between the two layouts are real
repacks that profiled at ~4 x 4.4 ms per beam step (docs/KERNELS.md §5).
This kernel reads the cache AS STORED in the packed flat layout
(layers, batch, time, n_state) — minor dim n_state is a multiple of 128,
exactly tiled, zero padding — so the decode path keeps one layout end to
end (TextDecoder ``init_cache``/``prefill``/``step`` flat branches),
repacks disappear, and the cache read halves.

Head structure is recovered WITHOUT lane-splitting reshapes (Mosaic
rejects ``(..., 128) -> (..., k, 128/k)`` shape casts on hardware —
caught on the first real-chip run; the CPU interpreter accepts them).
Instead, per-head reductions and head->lane broadcasts run as matmuls
against a constant 0/1 head-map ``E[lane, g] = (lane // head_dim == g)``:

- scores:  S[b, p, g] = sum_lane (K * q)[b, p, lane] * E[lane, g]
- expand:  w[b, p, lane] = (P @ E^T)[b, p, lane] replicates each head's
  softmax weight across its head_dim lanes for the V accumulation.

Both are tiny MXU ops with a shared constant operand, run at
``precision=HIGHEST`` so the f32 operands are not silently truncated to
one bf16 pass (the same default-precision trap that bit the beam-reorder
one-hot matmul, docs/KERNELS.md §5).

The new token's K/V are NOT in the cache yet when the kernel runs (the
caller writes them after the layer scan, whisper modules.py step
docstring); they enter as separate (batch, n_state) operands and merge
into the online-softmax state at the last grid step, exactly mirroring
the score-concatenation of the 5-D XLA path.

Like the quantized cross-attention kernel, the layer's K/V slab is
selected INSIDE the kernel from the scan-broadcast stacked tensor via a
scalar-prefetch ``layer_idx`` (peeling stacked xs makes XLA slice-copy a
layer's K/V every token — profiled round 2). Chunks past ``pos`` are
skipped via a when-guard with their input index clamped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_POS = 8  # cache positions per grid step

_HI = jax.lax.Precision.HIGHEST


def _head_map(n_state: int, heads: int) -> jax.Array:
    """E[lane, g] = 1.0 iff lane belongs to head g."""
    hd = n_state // heads
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n_state, heads), 0) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (n_state, heads), 1)
    ).astype(jnp.float32)


def _kernel(
    meta_ref,  # (3,) int32: [layer_idx, pos, valid_chunks]
    q_ref,  # (b, n_state) — query, head-concatenated, UNSCALED
    kn_ref,  # (b, n_state) — new token K
    vn_ref,  # (b, n_state) — new token V
    k_ref,  # (b, block_pos, n_state) cache K block (layer via index map)
    v_ref,  # (b, block_pos, n_state)
    o_ref,  # (b, n_state)
    m_sc,  # (b, heads) f32 scratch — online-softmax row max
    l_sc,  # (b, heads) f32 — row normalizer
    acc_sc,  # (b, n_state) f32 — weighted V accumulator
    *,
    heads: int,
    n_state: int,
    block_pos: int,
):
    c = pl.program_id(1)
    b = q_ref.shape[0]
    hd = n_state // heads
    NEG = jnp.float32(-1e30)
    E = _head_map(n_state, heads)

    def reduce_heads(x):  # (b, p, n_state) -> (b, p, heads): per-head sums
        p = x.shape[1]
        return jax.lax.dot_general(
            x.reshape(b * p, n_state), E, (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        ).reshape(b, p, heads)

    def expand_heads(x):  # (b[, p], heads) -> (b[, p], n_state)
        lead = x.shape[:-1]
        flat = x.reshape(-1, heads)
        return jax.lax.dot_general(
            flat, E, (((1,), (1,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        ).reshape(*lead, n_state)

    q = q_ref[:].astype(jnp.float32) * (hd**-0.5)  # (b, n_state)

    @pl.when(c == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    # every grid step is live: the chunk grid dim is the TRACED
    # live-chunk count (dead chunks never execute; the position mask
    # below covers the partial last chunk)
    k = k_ref[:].astype(jnp.float32)  # (b, p, n_state)
    s = reduce_heads(k * q[:, None, :])  # (b, p, heads)
    pglob = c * block_pos + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1
    )
    s = jnp.where(pglob < meta_ref[1], s, NEG)
    m_prev = m_sc[:]  # (b, heads)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    p = jnp.exp(s - m_new[:, None, :])  # (b, p, heads)
    alpha = jnp.exp(m_prev - m_new)  # (b, heads)
    w = expand_heads(p)  # (b, p, n_state)
    pv = jnp.sum(w * v_ref[:].astype(jnp.float32), axis=1)
    m_sc[:] = m_new
    l_sc[:] = l_sc[:] * alpha + jnp.sum(p, axis=1)
    acc_sc[:] = acc_sc[:] * expand_heads(alpha) + pv

    @pl.when(c == meta_ref[2] - 1)
    def _():
        # merge the current token's K/V (score-concat equivalent), write out
        kn = kn_ref[:].astype(jnp.float32)
        s_new = reduce_heads((kn * q)[:, None, :])[:, 0]  # (b, heads)
        m_fin = jnp.maximum(m_sc[:], s_new)
        alpha = jnp.exp(m_sc[:] - m_fin)
        p_new = jnp.exp(s_new - m_fin)  # (b, heads)
        l_fin = l_sc[:] * alpha + p_new
        num = acc_sc[:] * expand_heads(alpha) + expand_heads(
            p_new
        ) * vn_ref[:].astype(jnp.float32)
        den = expand_heads(jnp.maximum(l_fin, 1e-30))
        o_ref[:] = (num / den).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def decode_self_attention(
    q: jax.Array,  # (batch, n_state) current query, head-concatenated
    k_new: jax.Array,  # (batch, n_state) current-token K (not in cache)
    v_new: jax.Array,  # (batch, n_state)
    k_flat: jax.Array,  # (layers, batch, T_pad, n_state) packed cache K
    v_flat: jax.Array,  # (layers, batch, T_pad, n_state)
    pos: jax.Array,  # scalar int32: positions [0, pos) are live
    layer_idx: jax.Array,  # scalar int32 layer slab to read
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """softmax([q·K_cache[:pos]; q·k_new] / sqrt(hd)) @ [V_cache; v_new].

    Returns (batch, n_state) in q.dtype — the head-concatenated layout,
    ready for the output projection without any head reshape. Numerics
    mirror the 5-D score-concat path: f32 scores and softmax, one online
    pass over the cache, the new token merged last.
    """
    L, b, T, n_state = k_flat.shape
    assert n_state % 128 == 0 and n_state % heads == 0, (heads, n_state)
    assert T % BLOCK_POS == 0, (T, BLOCK_POS)  # init_cache pads max_len
    n_chunks = T // BLOCK_POS

    # The position-chunk sublane dim must stay divisible by 8 (Mosaic
    # block constraint), so VMEM pressure is relieved by tiling the BATCH
    # dim instead — rows attend independently, and the batch axis is
    # unconstrained. Largest divisor of b whose k/v blocks (+ their f32
    # working copies, ~8x the bf16 block) fit scoped VMEM: 160 beam rows
    # -> 40, greedy 32 -> untiled.
    b_tile = b
    while b_tile * BLOCK_POS * n_state * 16 > 6 * 1024 * 1024 and (
        b_tile % 2 == 0
    ):
        b_tile //= 2
    n_btiles = b // b_tile

    # positions [0, pos): chunks to actually read/compute
    valid = jnp.clip(
        (pos + BLOCK_POS - 1) // BLOCK_POS, 1, n_chunks
    ).astype(jnp.int32)
    meta = jnp.stack(
        [layer_idx.astype(jnp.int32), pos.astype(jnp.int32), valid]
    )

    small = pl.BlockSpec((b_tile, n_state), lambda bt, c, m: (bt, 0))
    kv_spec = pl.BlockSpec(
        (None, b_tile, BLOCK_POS, n_state),
        lambda bt, c, m: (m[0], bt, c, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # chunk dim is the TRACED live-chunk count: dead chunks never run
        grid=(n_btiles, valid),
        in_specs=[small, small, small, kv_spec, kv_spec],
        out_specs=pl.BlockSpec((b_tile, n_state), lambda bt, c, m: (bt, 0)),
        scratch_shapes=[
            pltpu.VMEM((b_tile, heads), jnp.float32),
            pltpu.VMEM((b_tile, heads), jnp.float32),
            pltpu.VMEM((b_tile, n_state), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, n_state=n_state, block_pos=BLOCK_POS
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_state), q.dtype),
        interpret=interpret,
    )(meta, q, k_new, v_new, k_flat, v_flat)
