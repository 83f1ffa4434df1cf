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

Both are tiny MXU ops with a shared constant operand, run at DEFAULT
precision: one bf16 MXU pass. E's 0/1 entries are bf16-exact, so only
the A-operand values (k·q products, softmax weights) lose mantissa below
2^-8 — the same documented deviation class as the greedy cross-attention
MXU route (decode_attention.py), and measured bit-identical at the
kernel's bf16 output across a 50-step chain. This is NOT the
beam-reorder one-hot trap (docs/KERNELS.md §5): there the payload rides
the matmul at full mantissa and HIGHEST is required. Precision is the
kernel's dominant cost, not bandwidth: HIGHEST ran the f32 A-operands
through 6 MXU passes and measured 4.84 ms per medium/b64 24-layer token
vs **1.80 ms** at DEFAULT + a 12 MB VMEM budget (the kernel is
compute-bound, ~320 GB/s effective — profiled round 2).

The new token's K/V are NOT in the cache yet when the kernel runs (the
caller writes them after the layer scan, whisper modules.py step
docstring); they enter as separate (batch, n_state) operands and merge
into the online-softmax state at the last grid step, exactly mirroring
the score-concatenation of the 5-D XLA path.

INT8 form (``self_kv_bits=8`` + flat): the K/V data leaves are int8
(layers, batch, time, n_state) with ONE shared bf16 scale leaf
(layers, batch, time, 128) — per-(position, head) scales, K's in lanes
[0, heads), V's in lanes [heads, 2*heads), the rest zero lane padding so
the leaf is natively tiled and rides the beam reorder kernel unchanged.
Per-position cache traffic drops from 2 * n_state * 2 B to
2 * n_state + 256 B (0.56x at medium). Dequantization is EXACT folding,
never a dequantized copy: the K scale multiplies the per-head scores
AFTER the score reduction (s * ks == (k8 * ks) . q by linearity), the V
scale multiplies the per-head softmax weights BEFORE the head->lane
expansion (w * vs rides the same expand matmul). The int8 dots
themselves stay f32 VPU math — the earlier 5-D experiment showed native
s8 dots are VPU-bound at M=1 matvec shapes; the win here is pure HBM
bandwidth. Scales are extracted from the 128-lane row by one-hot
selector matmuls (lane slicing to non-native widths is not a Mosaic
pattern; the selector shares the E-matmul machinery).

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
VMEM_BUDGET = 12 * 1024 * 1024  # per-block working-set cap for batch tiling

_HI = jax.lax.Precision.HIGHEST  # beam-reorder-style payload matmuls only
_DEFAULT = jax.lax.Precision.DEFAULT  # 0/1-operand head-map dots (module docstring)


def _head_map(n_state: int, heads: int) -> jax.Array:
    """E[lane, g] = 1.0 iff lane belongs to head g."""
    hd = n_state // heads
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n_state, heads), 0) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (n_state, heads), 1)
    ).astype(jnp.float32)


def _scale_map(heads: int, offset: int) -> jax.Array:
    """S[lane, g] = 1.0 iff lane == offset + g: extracts ``heads`` scale
    lanes from a 128-lane row as a matmul (module docstring)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (128, heads), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (128, heads), 1) + offset
    ).astype(jnp.float32)


def _kernel(
    meta_ref,  # (3,) int32: [layer_idx, pos, valid_chunks]
    q_ref,  # (b, n_state) — query, head-concatenated, UNSCALED
    kn_ref,  # (b, n_state) — new token K (always exact fp)
    vn_ref,  # (b, n_state) — new token V
    *refs,  # k, v (+ k_s, v_s when quantized), o, then scratch
    heads: int,
    n_state: int,
    block_pos: int,
    quantized: bool = False,
):
    if quantized:
        # int8 cache blocks + the shared per-(position, head) bf16 scale
        # row: K scales in lanes [0, heads), V in [heads, 2*heads)
        # (module docstring)
        k_ref, v_ref, s_ref, o_ref, m_sc, l_sc, acc_sc = refs
    else:
        k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc = refs
    c = pl.program_id(1)
    b = q_ref.shape[0]
    hd = n_state // heads
    NEG = jnp.float32(-1e30)
    E = _head_map(n_state, heads)

    def pick_scales(sc, offset):  # (b, p, 128) -> (b, p, heads)
        p = sc.shape[1]
        return jax.lax.dot_general(
            sc.reshape(b * p, 128), _scale_map(heads, offset),
            (((1,), (0,)), ((), ())),
            precision=_DEFAULT, preferred_element_type=jnp.float32,
        ).reshape(b, p, heads)

    def reduce_heads(x):  # (b, p, n_state) -> (b, p, heads): per-head sums
        p = x.shape[1]
        return jax.lax.dot_general(
            x.reshape(b * p, n_state), E, (((1,), (0,)), ((), ())),
            precision=_DEFAULT, preferred_element_type=jnp.float32,
        ).reshape(b, p, heads)

    def expand_heads(x):  # (b[, p], heads) -> (b[, p], n_state)
        lead = x.shape[:-1]
        flat = x.reshape(-1, heads)
        return jax.lax.dot_general(
            flat, E, (((1,), (1,)), ((), ())),
            precision=_DEFAULT, preferred_element_type=jnp.float32,
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
    if quantized:
        sc = s_ref[:].astype(jnp.float32)  # (b, p, 128)
        # K scale folds into the per-head scores AFTER the reduction
        # (exact by linearity: (k8 * ks) . q == (k8 . q) * ks per head)
        s = s * pick_scales(sc, 0)
    pglob = c * block_pos + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1
    )
    s = jnp.where(pglob < meta_ref[1], s, NEG)
    m_prev = m_sc[:]  # (b, heads)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    p = jnp.exp(s - m_new[:, None, :])  # (b, p, heads)
    alpha = jnp.exp(m_prev - m_new)  # (b, heads)
    # V scale folds into the per-head softmax weights BEFORE the
    # head->lane expansion; `l` keeps the raw weights (the normalizer is
    # scale-free)
    w = expand_heads(p * pick_scales(sc, heads) if quantized else p)
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


def decode_self_attention_tmin(
    q3: jax.Array,  # (batch, heads, head_dim) current query, UNSCALED
    k_new: jax.Array,  # (batch, heads, head_dim) current-token K (not cached)
    v_new: jax.Array,
    cache: tuple,  # (k, v): (layers, batch, heads, head_dim, T_pad) fp
    pos: jax.Array,  # scalar int32: cache positions [0, pos) are live
    layer_idx: jax.Array,  # scalar int32 layer slab
    block_t: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Decode self-attention over the TIME-MINOR (layers, b, h, d, T) cache.

    This layout makes the self-KV read stream the same way the quantized
    cross-KV does — time in the lane (minor) dim, ~0.6-0.7 of the
    single-stream HBM roofline — instead of the packed flat layout's
    2 KB sublane-major rows (measured 3.15 vs 4.8 ms per medium/b64
    24-layer token at pos=130 even while reading the full padded length;
    docs/KERNELS.md §6). The read itself IS ``decode_cross_attention``
    (grouped-MXU route, traced live-chunk grid via ``dynamic_grid``, the
    online-softmax state returned via ``return_state``); the new token —
    not yet in the cache, which is written by the caller outside the layer
    scan — merges here in exact f32, mirroring the flat kernel's
    last-chunk merge semantics.
    """
    from .decode_attention import decode_cross_attention

    kc, vc = cache
    o, m, l = decode_cross_attention(
        q3, kc, vc, kv_len=pos, layer_idx=layer_idx, block_t=block_t,
        interpret=interpret, dynamic_grid=True, return_state=True,
    )  # o (b, h, d) f32 normalized; m/l (b, h) f32
    d = q3.shape[-1]
    qf = q3.astype(jnp.float32) * (d ** -0.5)
    s_new = jnp.sum(qf * k_new.astype(jnp.float32), axis=-1)  # (b, h)
    m_fin = jnp.maximum(m, s_new)
    lw = jnp.exp(m - m_fin) * l  # cache side's reweighted normalizer
    p_new = jnp.exp(s_new - m_fin)
    den = jnp.maximum(lw + p_new, 1e-30)[..., None]
    out = (
        o * lw[..., None] + p_new[..., None] * v_new.astype(jnp.float32)
    ) / den
    return out.astype(q3.dtype)


def quantize_flat_kv(
    k: jax.Array, v: jax.Array, heads: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize flat K/V rows (..., n_state) to the int8 cache form.

    Returns (k8, v8, scales): int8 data in the input shape plus ONE
    (...,128) bf16 scale leaf — per-(row, head) symmetric scales, K's in
    lanes [0, heads), V's in [heads, 2*heads), zero padding after (the
    kernel extracts them by one-hot selector matmuls; the padded leaf is
    natively tiled so it rides the beam reorder unchanged). The scale is
    rounded to bf16 BEFORE the divide, so kernel-side ``q8 * scale``
    reconstructs with only the int8 rounding error."""
    assert 2 * heads <= 128, heads

    def one(x):
        g = x.astype(jnp.float32).reshape(*x.shape[:-1], heads, -1)
        s = (jnp.max(jnp.abs(g), axis=-1) / 127.0).astype(jnp.bfloat16)
        s = jnp.maximum(s, jnp.bfloat16(1e-6))
        # bf16 rounding can shrink s below max/127: clip before the cast
        # or 127.5-ish ratios wrap to -128
        q8 = jnp.clip(
            jnp.round(g / s[..., None].astype(jnp.float32)), -127, 127
        ).astype(jnp.int8)
        return q8.reshape(x.shape), s

    k8, ks = one(k)
    v8, vs = one(v)
    pad = jnp.zeros(ks.shape[:-1] + (128 - 2 * heads,), jnp.bfloat16)
    return k8, v8, jnp.concatenate([ks, vs, pad], axis=-1)


def _settled_kernel(
    meta_ref,  # (2,) int32: [layer_idx, settled]
    rmap_ref,  # (rows,) int32: physical row per logical row
    q_ref,  # (1, 1, n_state) — this row's query (operands ride 3-D so the
    #         per-row blocks' LAST-TWO dims equal the array dims — Mosaic's
    #         block rule; a 2-D (1, n_state) row block crashes the compiler)
    k_ref,  # (1, G, n_state) — indirected cache K block
    v_ref,
    m_ref,  # out (1, 1, heads) f32 running max (revisited across g)
    l_ref,  # out (1, 1, heads) f32 running normalizer
    acc_ref,  # out (1, 1, n_state) f32 unnormalized numerator
    *,
    heads: int,
    n_state: int,
    group: int,
):
    del rmap_ref  # consumed by the K/V index maps only
    g = pl.program_id(1)
    hd = n_state // heads
    NEG = jnp.float32(-1e30)
    E = _head_map(n_state, heads)

    def reduce_heads(x):  # (1, p, n_state) -> (1, p, heads)
        p = x.shape[1]
        return jax.lax.dot_general(
            x.reshape(p, n_state), E, (((1,), (0,)), ((), ())),
            precision=_DEFAULT, preferred_element_type=jnp.float32,
        ).reshape(1, p, heads)

    def expand_heads(x):  # (1[, p], heads) -> (1[, p], n_state)
        lead = x.shape[:-1]
        return jax.lax.dot_general(
            x.reshape(-1, heads), E, (((1,), (1,)), ((), ())),
            precision=_DEFAULT, preferred_element_type=jnp.float32,
        ).reshape(*lead, n_state)

    q = q_ref[0].astype(jnp.float32) * (hd**-0.5)  # (1, n_state)

    @pl.when(g == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[:].astype(jnp.float32)  # (1, G, n_state)
    s = reduce_heads(k * q[:, None, :])  # (1, G, heads)
    pglob = g * group + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(pglob < meta_ref[1], s, NEG)
    m_prev = m_ref[0]  # (1, heads)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    p = jnp.exp(s - m_new[:, None, :])
    alpha = jnp.exp(m_prev - m_new)
    w = expand_heads(p)
    pv = jnp.sum(w * v_ref[:].astype(jnp.float32), axis=1)
    m_ref[0] = m_new
    l_ref[0] = l_ref[0] * alpha + jnp.sum(p, axis=1)
    acc_ref[0] = acc_ref[0] * expand_heads(alpha) + pv


def settled_self_attention(
    q: jax.Array,  # (rows, n_state) current query, head-concatenated
    cache: tuple,  # (k_flat, v_flat) — dense bf16 flat cache
    settled: jax.Array,  # scalar int32: positions [0, settled) are settled
    layer_idx: jax.Array,  # scalar int32 layer slab
    row_map: jax.Array,  # (rows,) int32: physical cache row per logical row
    heads: int,
    group: int = 512,  # positions per grid step (measured: 512 -> 1.44
    # ms/layer vs 1.57 at 128 at rows=160/settled=288; the eager b-tiled
    # kernel reads the same bytes in 1.22 — the per-row indirection costs
    # ~18% on the kernel itself)
    interpret: bool = False,
) -> tuple:
    """Online-softmax STATE of each logical row's attention over the settled
    cache prefix [0, settled), reading PHYSICAL row ``row_map[i]``.

    The deferred-beam-reorder read path (docs/KERNELS.md §11): between
    flushes the settled prefix stays in last-flush row order and logical
    beams read it through this per-row indirection instead of the cache
    being physically permuted every step. Per-row blocks (the indirection
    is a block index map over a scalar-prefetched row table) of ``group``
    positions; the grid's position dim is the traced live-group count.
    Returns unnormalized ``(m, l, acc)`` — (rows, heads) f32 ×2 and
    (rows, n_state) f32 — for the caller to merge with the window and
    new-token contributions (``merge_attention_states``)."""
    k_flat, v_flat = cache
    L, b_phys, T, n_state = k_flat.shape
    rows = q.shape[0]
    assert n_state % 128 == 0 and n_state % heads == 0, (heads, n_state)
    # group must divide the padded cache length (the beam builder rounds
    # the deferred-mode cache length to a 128 multiple; shrink gracefully
    # for odd test lengths — T is always a multiple of BLOCK_POS)
    group = min(group, T)
    while T % group:
        group -= BLOCK_POS
    n_groups = T // group
    valid = jnp.clip(
        (settled + group - 1) // group, 1, n_groups
    ).astype(jnp.int32)
    meta = jnp.stack([layer_idx.astype(jnp.int32), settled.astype(jnp.int32)])

    # q and the three state outputs ride 3-D with per-row blocks whose
    # LAST-TWO dims equal the array dims — the only per-row block shape
    # Mosaic's divisibility rule admits (a 2-D (1, n_state) row block
    # crashed the compiler on the first chip run). Outputs are revisited
    # across the g dim (constant index in g) so they accumulate in VMEM.
    q3 = q.reshape(rows, 1, n_state)
    row3 = lambda d: pl.BlockSpec((1, 1, d), lambda i, g, m, r: (i, 0, 0))
    kv_spec = pl.BlockSpec(
        (None, 1, group, n_state), lambda i, g, m, r: (m[0], r[i], g, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # meta, row_map
        grid=(rows, valid),
        in_specs=[row3(n_state), kv_spec, kv_spec],
        out_specs=[row3(heads), row3(heads), row3(n_state)],
        scratch_shapes=[],
    )
    m_out, l_out, acc = pl.pallas_call(
        functools.partial(
            _settled_kernel, heads=heads, n_state=n_state, group=group
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1, heads), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1, heads), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1, n_state), jnp.float32),
        ],
        interpret=interpret,
    )(meta, row_map.astype(jnp.int32), q3, k_flat, v_flat)
    return m_out[:, 0], l_out[:, 0], acc[:, 0]


def merge_attention_states(
    states: list,  # [(m, l, acc), ...] each (rows, heads)/(rows, n_state)
    heads: int,
) -> jax.Array:
    """Combine online-softmax partial states; returns the normalized
    (rows, n_state) output in f32 (exactly the score-concatenation
    semantics, merged pairwise)."""
    m, l, acc = states[0]
    n_state = acc.shape[-1]
    hd = n_state // heads

    def expand(x):  # (rows, heads) -> (rows, n_state)
        return jnp.repeat(x, hd, axis=-1)

    for m2, l2, acc2 in states[1:]:
        m_new = jnp.maximum(m, m2)
        a1 = jnp.exp(m - m_new)
        a2 = jnp.exp(m2 - m_new)
        l = l * a1 + l2 * a2
        acc = acc * expand(a1) + acc2 * expand(a2)
        m = m_new
    return acc / expand(jnp.maximum(l, 1e-30))


def window_attention_state(
    q: jax.Array,  # (rows, n_state) UNSCALED
    k_win: jax.Array,  # (rows, W, n_state) logical window K
    v_win: jax.Array,
    count: jax.Array,  # scalar int32: window positions [0, count) are live
    heads: int,
) -> tuple:
    """Online-softmax state over the (small, logically-ordered) reorder
    window — plain XLA; the window is <= the flush period, so this is a
    few positions per row."""
    rows, w, n_state = k_win.shape
    hd = n_state // heads
    qf = q.astype(jnp.float32).reshape(rows, heads, hd) * (hd**-0.5)
    kf = k_win.astype(jnp.float32).reshape(rows, w, heads, hd)
    s = jnp.einsum("rhd,rwhd->rwh", qf, kf, precision=_HI)  # (rows, W, heads)
    live = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < count
    s = jnp.where(live, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=1)  # (rows, heads)
    p = jnp.exp(s - m[:, None, :])
    l = jnp.sum(p, axis=1)
    vf = v_win.astype(jnp.float32).reshape(rows, w, heads, hd)
    acc = jnp.einsum("rwh,rwhd->rhd", p, vf, precision=_HI).reshape(
        rows, n_state
    )
    return m, l, acc


def new_token_state(
    q: jax.Array, k_new: jax.Array, v_new: jax.Array, heads: int
) -> tuple:
    """Online-softmax state of the single current token (not yet cached)."""
    rows, n_state = q.shape
    hd = n_state // heads
    qf = q.astype(jnp.float32).reshape(rows, heads, hd) * (hd**-0.5)
    kf = k_new.astype(jnp.float32).reshape(rows, heads, hd)
    s = jnp.sum(qf * kf, axis=-1)  # (rows, heads)
    l = jnp.ones_like(s)
    acc = v_new.astype(jnp.float32).reshape(rows, n_state)
    return s, l, acc


def deferred_self_attention(
    q: jax.Array,  # (rows, n_state)
    k_new: jax.Array,  # (rows, n_state)
    v_new: jax.Array,
    cache: tuple,  # (k_flat, v_flat) dense flat cache
    pos: jax.Array,  # scalar: positions [0, pos) are filled
    settled: jax.Array,  # scalar: [0, settled) in flush order; rest window
    row_map: jax.Array,  # (rows,) physical row of each logical row's prefix
    layer_idx: jax.Array,
    heads: int,
    window: int,  # static flush period R (window capacity)
    interpret: bool = False,
) -> jax.Array:
    """Decode self-attention for the deferred-beam-reorder cache protocol:
    settled prefix via the row-indirected kernel, the <=``window`` most
    recent positions (kept logically ordered by the per-step mini-reorder)
    via XLA, the current token merged exactly — numerics mirror the eager
    flat path's score concatenation."""
    assert len(tuple(cache)) == 2, (
        "deferred beam reorder supports the dense flat cache (int8 flat "
        "was measured net-negative for beam; KERNELS.md §6)"
    )
    k_flat, v_flat = cache
    rows, n_state = q.shape
    st = settled_self_attention(
        q, cache, settled, layer_idx, row_map, heads=heads,
        interpret=interpret,
    )
    # window slab [settled, settled+window): logical rows, static size
    start = jnp.clip(settled, 0, k_flat.shape[2] - window)
    kw = jax.lax.dynamic_slice(
        k_flat, (layer_idx.astype(jnp.int32), 0, start, 0),
        (1, rows, window, n_state),
    )[0]
    vw = jax.lax.dynamic_slice(
        v_flat, (layer_idx.astype(jnp.int32), 0, start, 0),
        (1, rows, window, n_state),
    )[0]
    win = window_attention_state(q, kw, vw, pos - settled, heads)
    new = new_token_state(q, k_new, v_new, heads)
    out = merge_attention_states([st, win, new], heads)
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def decode_self_attention(
    q: jax.Array,  # (batch, n_state) current query, head-concatenated
    k_new: jax.Array,  # (batch, n_state) current-token K (not in cache)
    v_new: jax.Array,  # (batch, n_state)
    cache: tuple,  # (k_flat, v_flat[, scales]) — see module docstring
    pos: jax.Array,  # scalar int32: positions [0, pos) are live
    layer_idx: jax.Array,  # scalar int32 layer slab to read
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """softmax([q·K_cache[:pos]; q·k_new] / sqrt(hd)) @ [V_cache; v_new].

    ``cache`` leaves are (layers, batch, T_pad, n_state) packed K/V —
    bf16 (len 2) or int8 + the shared (layers, batch, T_pad, 128) bf16
    scale leaf (len 3, from ``quantize_flat_kv``). Returns
    (batch, n_state) in q.dtype — the head-concatenated layout, ready
    for the output projection without any head reshape. Numerics mirror
    the 5-D score-concat path: f32 scores and softmax, one online pass
    over the cache, the new token merged last.
    """
    cache = tuple(cache)
    quantized = len(cache) == 3
    k_flat, v_flat = cache[:2]
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
    while b_tile * BLOCK_POS * n_state * 16 > VMEM_BUDGET and (
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
    sc_spec = pl.BlockSpec(
        (None, b_tile, BLOCK_POS, 128),
        lambda bt, c, m: (m[0], bt, c, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # chunk dim is the TRACED live-chunk count: dead chunks never run
        grid=(n_btiles, valid),
        in_specs=[small, small, small, kv_spec, kv_spec]
        + ([sc_spec] if quantized else []),
        out_specs=pl.BlockSpec((b_tile, n_state), lambda bt, c, m: (bt, 0)),
        scratch_shapes=[
            pltpu.VMEM((b_tile, heads), jnp.float32),
            pltpu.VMEM((b_tile, heads), jnp.float32),
            pltpu.VMEM((b_tile, n_state), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, n_state=n_state, block_pos=BLOCK_POS,
            quantized=quantized,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_state), q.dtype),
        interpret=interpret,
    )(meta, q, k_new, v_new, *cache)
