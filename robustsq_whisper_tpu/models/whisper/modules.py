"""Whisper encoder/decoder as flax.linen modules, TPU-first.

Re-designed from the behavior of the reference wrappers
(/root/reference/model/whisper_encoder.py:17-192,
/root/reference/model/whisper_decoder.py:41-226) and the OpenAI Whisper block
structure they load: pre-LN residual attention blocks, GELU MLPs, sinusoidal
audio positions (fixed), learned text positions, tied-embedding logits.

TPU choices:
- static shapes everywhere; lengths travel as separate int arrays,
- params live in fp32, matmuls run in a configurable compute dtype (bf16 on
  TPU), layernorms and softmax in fp32,
- the layer stack is ``nn.scan``-ed over stacked per-layer params
  (``scan_layers=True``): XLA compiles ONE block body instead of 24/32
  unrolled copies — an order of magnitude faster compile at identical
  runtime, and the layer axis is a natural pipeline-parallel axis later,
- decoding uses a preallocated per-layer KV cache, shape
  (layers, batch, max_len, heads, head_dim), updated with
  ``lax.dynamic_update_slice`` (the reference deliberately re-runs the whole
  prefix each step, whisper_decoder.py:174-176 — the main perf gap the TPU
  build closes).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import causal_mask, dot_product_attention
from ...ops.quant import qmatmul, quantize_weight
from ...parallel.mesh import shard_seq
from .config import WhisperDims, sinusoids

Dtype = Any

# Self-attention KV cache of one stack, stacked per layer. Dense 5-D form:
# (k, v), each (layers, batch, len, heads, hd); 5-D int8 form
# (self_kv_bits=8, flat_self_cache=False): (k8, k_scales, v8, v_scales)
# with scales of (layers, batch, len, heads). Packed flat forms
# (ops/self_attention.py): bf16 (k, v) of (layers, batch, len, n_state),
# or int8 (k8, v8, scales) with one (layers, batch, len, 128) scale leaf.
Cache = Tuple[jax.Array, ...]
# Cross-attention K/V: dense (k, v) from ``cross_kv``, or the 6-tuple
# quantized form (k_q, k_s, v_q, v_s, v_zp, kv_len) from ``quantize_cross``.
CrossKV = Tuple[jax.Array, ...]


def _quant_dense(p: dict, with_bias: bool = True):
    """Per-output-channel int8 (kernel, scale, bias) of one flax Dense."""
    w_q, s = quantize_weight(p["kernel"], contract_axis=-2)
    b = p["bias"].astype(jnp.float32) if with_bias else None
    return (w_q, s, b)


def _stacked_blocks(params: dict) -> dict:
    """The block param subtree with a leading layer axis: the nn.scan form
    as-is, or unrolled ``blocks_{i}`` subtrees stacked to the same layout."""
    if "block" in params:  # nn.scan stacked: kernels (L, in, out)
        return params["block"]
    names = sorted(
        (k for k in params if k.startswith("blocks_")),
        key=lambda k: int(k.split("_")[-1]),
    )
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *(params[n] for n in names)
    )


def quantize_step_weights(decoder_params: dict) -> dict:
    """Int8-quantize every dense kernel the decode ``step`` touches.

    Takes a TextDecoder param subtree (the ``"decoder"`` entry of TSDecoder
    variables) and returns a pytree of per-output-channel int8 kernels +
    fp32 scales (+ the fp32 biases the quantized path needs, since it
    bypasses the flax Dense modules):

    - per layer (scan-stacked, leading layer axis): self-attn q/k/v/out,
      cross-attn q/out (cross k/v are the encoder-memory projections,
      already handled by ``kv_quant``), mlp fc1/fc2;
    - the tied output embedding, per-ROW quantized for the logits matmul.

    Computed once at decode-session setup (ops/quant.py rationale: the
    weight read is the second-largest per-token HBM term after the
    quantized cross-KV). Prefill and training always use the dense fp path.
    """
    dense = _quant_dense
    blk = _stacked_blocks(decoder_params)
    layers = {
        "attn": {
            "query": dense(blk["attn"]["query"]),
            "key": dense(blk["attn"]["key"], with_bias=False),
            "value": dense(blk["attn"]["value"]),
            "out": dense(blk["attn"]["out"]),
        },
        "cross": {
            "query": dense(blk["cross_attn"]["query"]),
            "out": dense(blk["cross_attn"]["out"]),
        },
        "fc1": dense(blk["mlp_fc1"]),
        "fc2": dense(blk["mlp_fc2"]),
    }
    emb_q, emb_s = quantize_weight(
        decoder_params["token_embedding"]["embedding"], contract_axis=-1
    )
    return {"layers": layers, "emb": (emb_q, emb_s)}


def quantize_encoder_weights(encoder_params: dict) -> dict:
    """Int8-quantize the encoder block matmuls (self q/k/v/out, mlp fc1/fc2)
    for W8A8 inference — the encoder is ~35% of the decode pipeline's wall
    time and its block loop is MXU-bound, so native int8 dots double the
    matmul rate. Same stacked layout/convention as ``quantize_step_weights``;
    conv stem, positions, layernorms and the Qformer stay in bf16/fp32.
    Inference-only: training always runs the dense fp weights."""
    dense = _quant_dense
    blk = _stacked_blocks(encoder_params)
    return {
        "layers": {
            "attn": {
                "query": dense(blk["attn"]["query"]),
                "key": dense(blk["attn"]["key"], with_bias=False),
                "value": dense(blk["attn"]["value"]),
                "out": dense(blk["attn"]["out"]),
            },
            "fc1": dense(blk["mlp_fc1"]),
            "fc2": dense(blk["mlp_fc2"]),
        }
    }


def _scan(body, length: int, in_axes=0):
    """nn.scan over stacked per-layer params; broadcast closure constants.

    ``in_axes`` may mark extra body args as ``nn.broadcast`` — used by the
    decode step to keep the big stacked cross-K/V OUT of the scanned xs
    (peeling it as xs makes XLA copy each layer's slab per token; the Pallas
    kernel indexes the layer instead, see ops/decode_attention.py)."""
    return nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=in_axes,
        length=length,
        metadata_params={nn.meta.PARTITION_NAME: None},
    )


def quantize_kv_tensors(
    k: jax.Array,  # (..., T, heads, head_dim) — leading axes preserved
    v: jax.Array,
    bits: int = 8,
    pad_to: int = 512,
):
    """Quantize already-projected K/V to the transposed int8/int4 decode
    layout: (k_q, k_s, v_q, v_s, v_zp, kv_len) with k_q/v_q of shape
    (..., heads, head_dim, T_padded[, // 2 packed]).

    Parameter-free — usable on a whole stacked layer axis at once (the
    decode session quantizes AFTER the dense prefill so the prefill never
    pays an unpack pass; see TextDecoder.quantize_cross). Asymmetric per
    channel: K's zero-point is softmax-invariant and dropped, V's folds
    outside the attention (weights sum to 1): ``out = attn * v_s + v_zp``.
    """
    kv_len = k.shape[-3]
    pad = (-kv_len) % pad_to
    qmax = 127.0 if bits == 8 else 7.0

    def quant(t):
        tt = jnp.moveaxis(t, -3, -1).astype(jnp.float32)  # (..., h, d, T)
        hi = jnp.max(tt, axis=-1)
        lo = jnp.min(tt, axis=-1)
        zp = (hi + lo) * 0.5
        scale = jnp.maximum((hi - lo) * (0.5 / qmax), 1e-8)
        q8 = jnp.round((tt - zp[..., None]) / scale[..., None]).astype(
            jnp.int8
        )
        if bits == 4:
            # head_dim-axis nibble packing: fuses into this quantize pass
            # (the old time-tile packing cost ~74 ms of lane-retiling
            # reshapes per medium/batch-32 session — profiled round 2)
            from ...ops.decode_attention import pack_int4

            q8 = pack_int4(q8)
        if pad:
            q8 = jnp.pad(q8, [(0, 0)] * (q8.ndim - 1) + [(0, pad)])
        return q8, scale, zp

    k_q, k_s, _ = quant(k)  # k_zp dropped: softmax-invariant
    v_q, v_s, v_zp = quant(v)
    return k_q, k_s, v_q, v_s, v_zp, jnp.full((), kv_len, jnp.int32)


class MultiHeadAttention(nn.Module):
    """Whisper-style MHA: q/v/out with bias, k without bias.

    ``use_flash`` routes mask-free self/cross attention through the Pallas
    flash kernel (ops/flash_attention.py) — the long-sequence encoder path;
    masked decode attention stays on the XLA path (tiny shapes).
    """

    n_state: int
    n_head: int
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    # quantized-KV width for ``kv_quant``/``attend_quant`` (decode cross
    # attention): 8 = int8, 4 = packed int4 (two values/byte — half the HBM
    # read of the decode loop's dominant term, see ops/decode_attention.py)
    kv_bits: int = 8
    # transposed-layout flash self-attention (inference operating point):
    # the q/k/v projections emit (b, n_state, T) directly into the
    # (bh, d, T) kernel, eliminating the four head-split layout copies per
    # layer the row-major kernel forces (~4.9 ms/layer at medium b64 —
    # KERNELS.md §8). Differentiable via a fallback VJP (row-major flash
    # backward); training configs keep this False for speed.
    flash_tmaj: bool = False

    def setup(self):
        self.query = nn.Dense(self.n_state, dtype=self.dtype, name="query")
        self.key = nn.Dense(self.n_state, use_bias=False, dtype=self.dtype, name="key")
        self.value = nn.Dense(self.n_state, dtype=self.dtype, name="value")
        self.out = nn.Dense(self.n_state, dtype=self.dtype, name="out")

    def _split(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.n_state // self.n_head)

    def _merge(self, x: jax.Array) -> jax.Array:
        b, t, _, _ = x.shape
        return x.reshape(b, t, self.n_state)

    def kv(self, src: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Project keys/values of ``src``: 2x (batch, len, heads, head_dim)."""
        return self._split(self.key(src)), self._split(self.value(src))

    def kv_quant(self, src: jax.Array, pad_to: int = 512):
        """Quantized TRANSPOSED K/V with per-(batch, head, channel) scales:
        (k_q, k_s, v_q, v_s, v_zp, kv_len) with k_q/v_q of shape
        (batch, heads, head_dim, T_padded) int8 (``kv_bits=4`` packs two
        4-bit values per byte, see ops/decode_attention.py::pack_int4).

        Decode is bound by re-reading the full cross-attention K/V from HBM
        every step (SURVEY §3.2 perf note); int8 halves that traffic (int4
        quarters it) and the fused Pallas decode kernel dequantizes in
        registers. Quantization is ASYMMETRIC per channel — the zero-points
        cost nothing at attention time:

        - K's zero-point adds ``q . k_zp`` to every score of a row — a
          per-(batch, head) constant, softmax-invariant, so it is simply
          DROPPED; K effectively gets a centered range for free.
        - V's zero-point folds exactly outside the kernel: since attention
          weights sum to 1, ``out = (p @ v_q^T) * v_s + v_zp``.

        Scales fold exactly as before: ``scores = (q*k_s) @ k_q``. The time
        axis is padded ONCE here (pad-per-step would copy the whole tensor
        every token); ``kv_len`` carries the true length for in-kernel
        masking.
        """
        return quantize_kv_tensors(
            *self.kv(src), bits=self.kv_bits, pad_to=pad_to
        )

    def attend_quant(
        self,
        x: jax.Array,  # (batch, q_len, n_state)
        k_q: jax.Array,  # (batch, heads, head_dim, T) int8, transposed
        k_s: jax.Array,  # (batch, heads, head_dim)
        v_q: jax.Array,
        v_s: jax.Array,
        v_zp: jax.Array,  # (batch, heads, head_dim) V zero-point
        kv_len: jax.Array,  # scalar int32 true length
        qw: Optional[dict] = None,  # int8 step weights for q/out projections
        layer_idx: Optional[jax.Array] = None,  # stacked k_q/v_q (see below)
        beam_group: int = 1,  # beams per utterance sharing this K/V
    ) -> jax.Array:
        """Quantized cross attention (tuple layout from ``kv_quant``).

        q_len == 1 (the decode loop) takes the fused Pallas kernel; longer
        queries (prefill, runs once) use a plain XLA einsum with the padded
        tail masked. The V zero-point folds outside the attention in both
        paths (weights sum to 1): ``out = attn * v_s + v_zp``.

        In the decode loop ``k_q``/``v_q`` may carry a leading stacked LAYER
        axis with ``layer_idx`` selecting this block's slab *inside* the
        kernel — avoiding the per-step XLA slice-copy of the whole tensor
        (decode_cross_attention docstring).

        ``beam_group=k``: x has batch*``k`` rows (beam-flattened) while the
        K/V tensors have plain batch rows — each utterance's ``k`` beams
        attend ONE shared K/V read (grouped kernel mode), so beam search
        does not multiply the decode loop's dominant HBM term (and the
        cross tensors are never beam-expanded in memory).
        """
        q = self._split(
            self.query(x) if qw is None
            else qmatmul(x, *qw["query"], out_dtype=self.dtype)
        )  # (b, q, h, hd)
        if x.shape[1] == 1:
            from ...ops.decode_attention import decode_cross_attention

            g = beam_group
            q1 = q[:, 0]  # (b*g, h, hd)
            if g > 1:
                bk, h, hd = q1.shape
                q1 = q1.reshape(bk // g, g, h, hd).transpose(0, 2, 1, 3)
            o = decode_cross_attention(
                q1,
                k_q,
                v_q,
                k_s,
                kv_len=kv_len,
                layer_idx=layer_idx,
                interpret=jax.default_backend() == "cpu",
                packed_int4=self.kv_bits == 4,
                group=g,
            )  # (b, h, hd) or (b, h, g, hd); v_s/v_zp not yet applied
            if g > 1:
                o = o.transpose(0, 2, 1, 3)  # (b, g, h, hd)
                o = o.astype(jnp.float32) * v_s[:, None] + v_zp[:, None]
                o = o.reshape((-1, 1) + o.shape[2:])  # (b*g, 1, h, hd)
                o = self._merge(o.astype(self.dtype))
            else:
                o = o.astype(jnp.float32) * v_s + v_zp
                o = self._merge(o[:, None].astype(self.dtype))
            if qw is not None:
                return qmatmul(o, *qw["out"], out_dtype=self.dtype)
            return self.out(o)
        assert beam_group == 1, "beam grouping is decode-loop only"
        if layer_idx is not None:
            # stacked-layer K/V at a multi-token query (the speculative
            # VERIFY chunk): slice this block's slab out of the broadcast
            # stack. The slice-copy is paid once per verify — amortized
            # over the M tokens it confirms, unlike the per-token copy the
            # M=1 kernel path exists to avoid (decode_cross_attention).
            k_q = jax.lax.dynamic_index_in_dim(k_q, layer_idx, 0, False)
            v_q = jax.lax.dynamic_index_in_dim(v_q, layer_idx, 0, False)
        if self.kv_bits == 4:  # prefill runs once; XLA unpack is fine here
            from ...ops.decode_attention import unpack_int4

            k_q = unpack_int4(k_q).astype(jnp.int8)
            v_q = unpack_int4(v_q).astype(jnp.int8)
        qf = q.astype(jnp.float32) * (
            k_s[:, None] * (q.shape[-1] ** -0.5)
        )
        scores = jnp.einsum(
            "bqhd,bhdk->bhqk", qf.astype(self.dtype), k_q.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
        t_pad = k_q.shape[-1]
        valid = jnp.arange(t_pad) < kv_len
        scores = jnp.where(valid[None, None, None, :], scores, -1e30)
        weights = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum(
            "bhqk,bhdk->bqhd", weights.astype(self.dtype),
            v_q.astype(self.dtype), preferred_element_type=jnp.float32,
        )
        o = o * v_s[:, None].astype(o.dtype) + v_zp[:, None].astype(o.dtype)
        o = self._merge(o.astype(self.dtype))
        if qw is not None:
            return qmatmul(o, *qw["out"], out_dtype=self.dtype)
        return self.out(o)

    def attend(
        self,
        x: jax.Array,
        k: jax.Array,
        v: jax.Array,
        mask: Optional[jax.Array] = None,
        qw: Optional[dict] = None,  # int8 step weights for q/out projections
    ) -> jax.Array:
        q = self._split(
            self.query(x) if qw is None
            else qmatmul(x, *qw["query"], out_dtype=self.dtype)
        )
        if self.use_flash and mask is None and q.shape[1] >= 256:
            from ...ops.flash_attention import flash_attention

            o = flash_attention(
                q, k, v, interpret=jax.default_backend() == "cpu"
            )
        else:
            o = dot_product_attention(q, k, v, mask=mask)
        o = self._merge(o)
        if qw is not None:
            return qmatmul(o, *qw["out"], out_dtype=self.dtype)
        return self.out(o)

    def self_attend_tmaj(self, x: jax.Array) -> jax.Array:
        """Self-attention via the transposed-layout flash kernel.

        The projections run as ``btc,cf->bft`` einsums whose TRANSPOSED
        output layout fuses into the dot itself, the head split/merge
        around the kernel is a free major-axis reshape, and only the out
        projection restores (b, T, C) — so the four per-layer
        (b, T, h, d) <-> (b*h, T, d) copies of the row-major wrapper never
        materialize while the residual stream (LN/MLP fusions) stays
        row-major. Measured: 28.5 -> 25.0 ms per medium encoder layer at
        batch 64 (KERNELS.md §8)."""
        b, t, _ = x.shape
        h, d = self.n_head, self.n_state // self.n_head
        dt = self.dtype
        pq = self.query.variables["params"]
        pv = self.value.variables["params"]
        wk = self.key.variables["params"]["kernel"].astype(dt)
        proj = lambda w: jnp.einsum("btc,cf->bft", x, w.astype(dt))
        q = proj(pq["kernel"]) + pq["bias"].astype(dt)[None, :, None]
        k = proj(wk)
        v = proj(pv["kernel"]) + pv["bias"].astype(dt)[None, :, None]

        from ...ops.flash_attention import flash_attention_tmaj

        th = lambda z: z.reshape(b * h, d, t)
        o = flash_attention_tmaj(
            th(q), th(k), th(v), interpret=jax.default_backend() == "cpu"
        ).reshape(b, self.n_state, t)
        po = self.out.variables["params"]
        return (
            jnp.einsum("bft,fc->btc", o, po["kernel"].astype(dt))
            + po["bias"].astype(dt)
        )

    def __call__(
        self,
        x: jax.Array,
        xa: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        if (
            self.flash_tmaj
            and self.use_flash
            and xa is None
            and mask is None
            and x.shape[1] >= 256
            and not self.is_initializing()
        ):
            return self.self_attend_tmaj(x)
        k, v = self.kv(x if xa is None else xa)
        return self.attend(x, k, v, mask=mask)


class ResidualAttentionBlock(nn.Module):
    n_state: int
    n_head: int
    cross_attention: bool = False
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    flash_tmaj: bool = False  # transposed-layout flash (inference; see MHA)
    cross_kv_bits: int = 8  # quantized decode cross-KV width (8 or 4)
    # tanh-approximate GELU (~1e-3 abs deviation): the exact erf lowers to a
    # double-evaluated f32 erfc polynomial + sign-bit pack fused into the fc2
    # matmul — measured as the single most expensive encoder fusion. Inference
    # knob; training keeps the exact reference GELU.
    gelu_approx: bool = False

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        self.attn_ln = ln("attn_ln")
        self.attn = MultiHeadAttention(
            self.n_state, self.n_head, self.dtype, self.use_flash,
            flash_tmaj=self.flash_tmaj, name="attn",
        )
        if self.cross_attention:
            self.cross_attn_ln = ln("cross_attn_ln")
            self.cross_attn = MultiHeadAttention(
                self.n_state, self.n_head, self.dtype,
                kv_bits=self.cross_kv_bits, name="cross_attn",
            )
        self.mlp_ln = ln("mlp_ln")
        self.mlp_fc1 = nn.Dense(4 * self.n_state, dtype=self.dtype, name="mlp_fc1")
        self.mlp_fc2 = nn.Dense(self.n_state, dtype=self.dtype, name="mlp_fc2")

    def _gelu(self, x: jax.Array) -> jax.Array:
        return jax.nn.gelu(x, approximate=self.gelu_approx)

    def _mlp(self, x: jax.Array) -> jax.Array:
        return self.mlp_fc2(self._gelu(self.mlp_fc1(x)))

    def _cast(self, x: jax.Array) -> jax.Array:
        return x.astype(self.dtype)

    def __call__(
        self,
        x: jax.Array,
        xa: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        qw: Optional[dict] = None,
    ) -> jax.Array:
        """Full-sequence block. ``qw`` (quantize_encoder_weights per-layer
        entry) runs the self-attn projections and the MLP as W8A8 int8 —
        the encoder inference path; cross-attention (decoder training
        forward) always stays dense."""
        h = self._cast(self.attn_ln(x))
        if qw is None:
            x = x + self.attn(h, mask=mask)
        else:
            a = qw["attn"]
            k = self.attn._split(qmatmul(h, *a["key"], out_dtype=self.dtype))
            v = self.attn._split(qmatmul(h, *a["value"], out_dtype=self.dtype))
            x = x + self.attn.attend(h, k, v, mask=mask, qw=a)
        if self.cross_attention:
            x = x + self.cross_attn(self._cast(self.cross_attn_ln(x)), xa=xa)
        h2 = self._cast(self.mlp_ln(x))
        if qw is None:
            x = x + self._mlp(h2)
        else:
            hid = self._gelu(qmatmul(h2, *qw["fc1"], out_dtype=self.dtype))
            x = x + qmatmul(hid, *qw["fc2"], out_dtype=self.dtype)
        return x

    def _cross(
        self,
        x: jax.Array,
        cross: Tuple[jax.Array, ...],
        qw: Optional[dict] = None,
        layer_idx: Optional[jax.Array] = None,
        beam_group: int = 1,
    ) -> jax.Array:
        h = self._cast(self.cross_attn_ln(x))
        if len(cross) == 6:  # quantized transposed cross K/V (kv_quant)
            return x + self.cross_attn.attend_quant(
                h, *cross, qw=qw, layer_idx=layer_idx, beam_group=beam_group
            )
        assert beam_group == 1, "dense cross K/V must be beam-expanded"
        return x + self.cross_attn.attend(h, *cross, qw=qw)

    @staticmethod
    def _new_v(w_new: jax.Array, v_new: jax.Array) -> jax.Array:
        """New-token V contribution of ``step``: (b, h, q, m) weights x
        (b, m, h, d) values. q = m = 1 keeps the decode loop's elementwise
        form (the benched hot path, bit-identical to round 2); q > 1 is the
        causal verify chunk (speculative decode) and runs a real einsum."""
        if w_new.shape[-1] == 1:
            return w_new.transpose(0, 2, 1, 3) * v_new.astype(jnp.float32)
        return jnp.einsum(
            "bhqm,bmhd->bqhd", w_new, v_new.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @staticmethod
    def _quantize_cache_entry(t: jax.Array):
        """(b, L, h, d) fp -> (int8 values, per-(b, pos, h) f32 scales)."""
        from ...ops.quant import quantize_activation

        t8, sc = quantize_activation(t)
        return t8, sc[..., 0]

    def prefill(
        self,
        x: jax.Array,
        cache: Tuple[jax.Array, ...],
        mask: jax.Array,
        cross: Tuple[jax.Array, ...],
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        """Multi-token prefix through one block, writing cache[:, :L].

        ``cache`` is (k, v) bf16 buffers, or the int8 form
        (k8, k_scales, v8, v_scales) — per-position scales, see ``step``.
        Attention over the prefix itself always runs on the exact fp K/V.
        """
        x, news = self.prefill_news(x, mask, cross, quant=len(cache) == 4)
        cache = tuple(
            jax.lax.dynamic_update_slice(buf, n, (0,) * buf.ndim)
            for buf, n in zip(cache, news)
        )
        return x, cache

    def prefill_news(
        self,
        x: jax.Array,
        mask: jax.Array,
        cross: Tuple[jax.Array, ...],
        quant: bool = False,
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        """Prefill body without the cache write: returns the new K/V
        entries for the caller to store (the flat-cache path writes them
        once, packed, outside the layer scan)."""
        h = self._cast(self.attn_ln(x))
        k_new, v_new = self.attn.kv(h)
        if quant:
            news = self._quantize_cache_entry(k_new) + \
                self._quantize_cache_entry(v_new)
        else:
            news = (k_new, v_new)
        x = x + self.attn.attend(h, k_new, v_new, mask=mask)
        x = self._cross(x, cross)
        x = x + self._mlp(self._cast(self.mlp_ln(x)))
        return x, news

    def step(
        self,
        x: jax.Array,
        cache: Tuple[jax.Array, ...],
        pos: jax.Array,
        cross: Tuple[jax.Array, ...],
        qw: Optional[dict] = None,
        layer_idx: Optional[jax.Array] = None,
        beam_group: int = 1,
        self_flat: Optional[Tuple[jax.Array, ...]] = None,
        self_tmin: Optional[Tuple[jax.Array, ...]] = None,
        row_map: Optional[jax.Array] = None,
        settled: Optional[jax.Array] = None,
        defer_window: int = 8,
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        """Decode step against a READ-ONLY KV-cache prefix.

        Generalized over the query length M = ``x.shape[1]`` and the
        position form: ``pos`` may be a scalar (the uniform decode loop,
        M = 1) or a per-row ``(batch,)`` vector (ragged positions — the
        speculative-decode draft/verify steps, decode/speculative.py). For
        M > 1 the new tokens attend each other causally on top of the
        cache prefix; the K/V read from HBM — the decode loop's dominant
        term — is paid ONCE for all M queries, which is the entire point
        of multi-token verification.

        The new tokens' cache entries are returned for the caller to write
        into the cache buffers *outside* the layer scan — routing the full
        cache through scan outputs would rewrite hundreds of MB per decoded
        token (the stacked-ys copies dominated early decode profiles).
        Attention runs over [cache[:pos]; k_new] via score concatenation, so
        the cache is only ever read here.

        ``cache`` is (k, v) — (batch, max_len, heads, head_dim) fp buffers —
        or the INT8 form (k8, k_scales, v8, v_scales) with per-(b, pos, h)
        scales. The int8 path halves the cache read (the second-largest
        per-token HBM term at long outputs) with native integer dots — no
        dequantized copy: K scales fold into the scores AFTER the s8xs8->s32
        dot; V scales fold into the softmax weights BEFORE they are
        themselves int8-quantized (exact folding — only the weight
        quantization error remains, bounded by 1/254 of the max weight).
        The new token's score/value always use the exact fp K/V.

        Args:
            x: (batch, M, n_state) current-position hidden states.
            pos: scalar int32 position (uniform) or (batch,) int32 vector
                (per-row) of the FIRST query's absolute position (also the
                caller's write slot).
            qw: optional per-layer int8 step weights (quantize_step_weights
                ``"layers"`` entry) — every dense matmul below runs W8A8.
        Returns:
            (new_x, new_entries) — new_entries matches the cache structure
            with a length-M time axis.
        """
        q_len = x.shape[1]
        h = self._cast(self.attn_ln(x))
        if self_flat is not None or self_tmin is not None:
            assert q_len == 1 and jnp.ndim(pos) == 0, (
                "the packed-cache Pallas paths are single-token/uniform-"
                "position only; speculative decode uses the 5-D cache"
            )
            # packed cache paths (ops/self_attention.py): q/k/v stay in the
            # flat (b, n_state) head-concatenated layout — no 64-lane-padded
            # 5-D tensors anywhere. ``self_tmin`` is the TIME-MINOR
            # (L, b, heads, hd, T) cache: it streams like the cross-KV
            # (time in lanes; measured 3.15 vs 4.8 ms per medium/b64
            # 24-layer token against the flat kernel) and is read by
            # decode_cross_attention itself with the new token merged in
            # f32 outside the kernel.
            from ...ops.self_attention import (
                decode_self_attention, decode_self_attention_tmin,
                deferred_self_attention,
            )

            if qw is None:
                kf = self.attn.key(h)[:, 0]
                vf = self.attn.value(h)[:, 0]
                qf = self.attn.query(h)[:, 0]
            else:
                a, dt = qw["attn"], self.dtype
                kf = qmatmul(h, *a["key"], out_dtype=dt)[:, 0]
                vf = qmatmul(h, *a["value"], out_dtype=dt)[:, 0]
                qf = qmatmul(h, *a["query"], out_dtype=dt)[:, 0]
            b = qf.shape[0]
            interp = jax.default_backend() == "cpu"
            if row_map is not None:
                # deferred-beam-reorder read protocol: settled prefix via
                # the row-indirected kernel, the logically-ordered window
                # + new token merged exactly (ops/self_attention.py)
                assert self_flat is not None and len(self_flat) == 2, (
                    "deferred reorder needs the dense flat cache"
                )
                o = deferred_self_attention(
                    qf, kf, vf, tuple(self_flat), pos, settled, row_map,
                    layer_idx, heads=self.n_head, window=defer_window,
                    interpret=interp,
                )
            elif self_tmin is not None:
                hd = self.n_state // self.n_head
                as3 = lambda t: t.reshape(b, self.n_head, hd)
                o = decode_self_attention_tmin(
                    as3(qf), as3(kf), as3(vf), tuple(self_tmin), pos,
                    layer_idx, interpret=interp,
                )
            else:
                o = decode_self_attention(
                    qf, kf, vf, tuple(self_flat), pos, layer_idx,
                    heads=self.n_head, interpret=interp,
                )
            o = o.reshape(b, 1, -1)
            o = (
                self.attn.out(o.astype(self.dtype)) if qw is None
                else qmatmul(
                    o.astype(self.dtype), *qw["attn"]["out"],
                    out_dtype=self.dtype,
                )
            )
            x = x + o
            x = self._cross(
                x, cross, qw=None if qw is None else qw["cross"],
                layer_idx=layer_idx, beam_group=beam_group,
            )
            h2 = self._cast(self.mlp_ln(x))
            if qw is None:
                x = x + self._mlp(h2)
            else:
                hid = self._gelu(
                    qmatmul(h2, *qw["fc1"], out_dtype=self.dtype)
                )
                x = x + qmatmul(hid, *qw["fc2"], out_dtype=self.dtype)
            return x, (kf, vf)
        if qw is None:
            k_new, v_new = self.attn.kv(h)  # (b, 1, heads, hd)
            q = self.attn._split(self.attn.query(h))
        else:
            a = qw["attn"]
            split, dt = self.attn._split, self.dtype
            k_new = split(qmatmul(h, *a["key"], out_dtype=dt))
            v_new = split(qmatmul(h, *a["value"], out_dtype=dt))
            q = split(qmatmul(h, *a["query"], out_dtype=dt))
        scale = q.shape[-1] ** -0.5
        quant_cache = len(cache) == 4

        if quant_cache:
            from ...ops.quant import quantize_activation

            ck8, cks, cv8, cvs = cache
            max_len = ck8.shape[1]
            q8, q_sc = quantize_activation(q)  # q_sc (b, 1, h, 1)
            s32 = jnp.einsum(
                "bqhd,bkhd->bhqk", q8, ck8,
                preferred_element_type=jnp.int32,
            )
            k_sc = cks.transpose(0, 2, 1)[:, :, None, :]  # (b, h, 1, k)
            s_pref = (
                s32.astype(jnp.float32)
                * q_sc.transpose(0, 2, 1, 3)
                * k_sc
                * scale
            )
        else:
            cache_k, cache_v = cache
            max_len = cache_k.shape[1]
            s_pref = jnp.einsum(
                "bqhd,bkhd->bhqk", q, cache_k,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32) * scale
        # cache-prefix mask: positions < pos are live. Scalar pos gives the
        # uniform (1, 1, 1, k) mask of the decode loop; vector pos gives the
        # per-row (b, 1, 1, k) mask of ragged speculative steps.
        live = jnp.arange(max_len) < (
            pos[:, None] if jnp.ndim(pos) else pos
        )
        s_pref = jnp.where(
            live.reshape((-1, 1, 1, max_len)), s_pref, -1e30
        )
        s_new = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_new, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * scale  # (b, h, q, q)
        if q_len > 1:
            # the M new tokens attend each other causally (verify chunk)
            tri = jnp.tril(jnp.ones((q_len, q_len), bool))
            s_new = jnp.where(tri[None, None], s_new, -1e30)
        s = jnp.concatenate([s_pref, s_new], axis=-1)
        w = jax.nn.softmax(s, axis=-1)
        if quant_cache:
            # fold per-position V scales into the weights (exact), then
            # quantize the folded weights so the V read is a pure int8 dot
            wp = w[..., :max_len] * cvs.transpose(0, 2, 1)[:, :, None, :]
            w8, w_sc = quantize_activation(wp)  # w_sc (b, h, q, 1)
            o32 = jnp.einsum(
                "bhqk,bkhd->bqhd", w8, cv8,
                preferred_element_type=jnp.int32,
            )
            o = o32.astype(jnp.float32) * w_sc.transpose(0, 2, 1, 3)
            o = o + self._new_v(w[..., max_len:], v_new)
        else:
            o = jnp.einsum(
                "bhqk,bkhd->bqhd",
                w[..., :max_len].astype(cache_v.dtype),
                cache_v,
                preferred_element_type=jnp.float32,
            ) + self._new_v(w[..., max_len:], v_new)
        o = self.attn._merge(o.astype(self.dtype))
        o = (
            self.attn.out(o) if qw is None
            else qmatmul(o, *qw["attn"]["out"], out_dtype=self.dtype)
        )
        x = x + o
        x = self._cross(
            x, cross, qw=None if qw is None else qw["cross"],
            layer_idx=layer_idx, beam_group=beam_group,
        )
        h2 = self._cast(self.mlp_ln(x))
        if qw is None:
            x = x + self._mlp(h2)
        else:
            hid = self._gelu(qmatmul(h2, *qw["fc1"], out_dtype=self.dtype))
            x = x + qmatmul(hid, *qw["fc2"], out_dtype=self.dtype)
        if quant_cache:
            news = self._quantize_cache_entry(k_new) + \
                self._quantize_cache_entry(v_new)
        else:
            news = (k_new, v_new)
        return x, news


class AudioEncoder(nn.Module):
    """Whisper audio encoder; exposes the conv stem and the block stack
    separately so target-speaker variants can inject speaker prompts between
    them (reference whisper_encoder.py:437-504)."""

    dims: WhisperDims
    dtype: Dtype = jnp.float32
    scan_layers: bool = True
    use_flash: bool = False
    flash_tmaj: bool = False  # transposed-layout flash (inference; see MHA)
    remat: bool = False  # rematerialize blocks in backward (training memory)
    gelu_approx: bool = False  # tanh GELU (inference; see block docstring)
    # Megatron-style sequence parallelism: constrain the inter-block
    # residual stream to (data, model)-sharded (B, T/model, C) when the
    # ambient mesh has a model axis. Composes with remat: the stored block
    # boundaries ARE the sharded tensors. See parallel/mesh.py::shard_seq.
    sequence_parallel: bool = False

    def setup(self):
        d = self.dims
        self.conv1 = nn.Conv(
            d.n_audio_state, (3,), padding=((1, 1),), dtype=self.dtype, name="conv1"
        )
        self.conv2 = nn.Conv(
            d.n_audio_state, (3,), strides=(2,), padding=((1, 1),),
            dtype=self.dtype, name="conv2",
        )
        # Fixed sinusoid positions as a non-trainable buffer (reference keeps
        # them as a torch buffer). As a flax variable they enter the jit as an
        # argument instead of a multi-MB inlined HLO constant — inlining them
        # made medium-size traces take minutes.
        self.pos_table = self.variable(
            "buffers",
            "positional_embedding",
            lambda: jnp.asarray(
                sinusoids(self.dims.n_audio_ctx, self.dims.n_audio_state)
            ),
        )
        if self.scan_layers:
            block_cls = (
                nn.remat(ResidualAttentionBlock) if self.remat
                else ResidualAttentionBlock
            )
            self.block = block_cls(
                d.n_audio_state, d.n_audio_head, dtype=self.dtype,
                use_flash=self.use_flash, flash_tmaj=self.flash_tmaj,
                gelu_approx=self.gelu_approx, name="block",
            )
        else:
            self.blocks = [
                ResidualAttentionBlock(
                    d.n_audio_state, d.n_audio_head, dtype=self.dtype,
                    use_flash=self.use_flash, flash_tmaj=self.flash_tmaj,
                    gelu_approx=self.gelu_approx, name=f"blocks_{i}",
                )
                for i in range(d.n_audio_layer)
            ]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")

    def conv_stem(self, mel: jax.Array, add_positions: bool = True) -> jax.Array:
        """(batch, n_mels, frames) -> (batch, frames//2, n_state).

        ``add_positions=False`` reproduces the enrollment path, which skips
        positional embeddings (reference whisper_encoder.py:464-472).
        """
        x = mel.astype(self.dtype).transpose(0, 2, 1)  # NLC for flax conv
        gelu = lambda t: jax.nn.gelu(t, approximate=self.gelu_approx)
        x = gelu(self.conv1(x))
        x = gelu(self.conv2(x))
        if add_positions:
            x = x + self.pos_table.value[: x.shape[1]].astype(x.dtype)
        return x

    def run_blocks(self, x: jax.Array, qw: Optional[dict] = None) -> jax.Array:
        """``qw`` = quantize_encoder_weights output: W8A8 inference blocks."""
        x = x.astype(self.dtype)
        sp = (lambda t: shard_seq(t)) if self.sequence_parallel else (lambda t: t)
        x = sp(x)
        layers_qw = None if qw is None else qw["layers"]
        if self.scan_layers:
            def body(block, carry, qw_l):
                return sp(block(carry, qw=qw_l)), None

            x, _ = _scan(body, self.dims.n_audio_layer)(
                self.block, x, layers_qw
            )
        else:
            for i, block in enumerate(self.blocks):
                qw_i = (
                    None if layers_qw is None
                    else jax.tree_util.tree_map(lambda a: a[i], layers_qw)
                )
                x = sp(block(x, qw=qw_i))
        return self.ln_post(x).astype(self.dtype)

    def __call__(self, mel: jax.Array) -> jax.Array:
        return self.run_blocks(self.conv_stem(mel))

    @staticmethod
    def output_lengths(ilens: jax.Array, max_ctx: int) -> jax.Array:
        """Conv2 length formula (reference whisper_encoder.py:158-167):
        1 + (ilens - kernel + 2*padding) // stride, clamped to the pos budget."""
        return jnp.minimum(1 + (ilens - 3 + 2) // 2, max_ctx)

    @staticmethod
    def make_buffers(dims: WhisperDims) -> dict:
        """The 'buffers' collection matching setup() — for apply() with
        converted checkpoints (no init call needed)."""
        return {
            "positional_embedding": jnp.asarray(
                sinusoids(dims.n_audio_ctx, dims.n_audio_state)
            )
        }


class TextDecoder(nn.Module):
    """Whisper text decoder with tied-embedding logits and KV-cache decoding."""

    dims: WhisperDims
    dtype: Dtype = jnp.float32
    scan_layers: bool = True
    remat: bool = False
    cross_kv_bits: int = 8  # quantized decode cross-KV width (8 or 4)
    # decode self-attention cache width: 16 = dense, 8 = int8. With the
    # flat cache (below) 8 selects the packed int8 form — int8 K/V plus
    # one shared bf16 scale leaf (ops/self_attention.py module docstring);
    # with flat_self_cache=False it selects the 5-D int8 form.
    self_kv_bits: int = 16
    # packed flat self-KV cache (layers, b, T*n_state/128, 128): the 5-D
    # cache's 64-wide head_dim minor dim is lane-PADDED to 128 by XLA's
    # T(8,128) tiling — physically 2x the bytes on every read, and real
    # repack copies at the beam reorder boundary (ops/self_attention.py).
    # Auto-disabled when the dims/cache form don't support it.
    flat_self_cache: bool = True
    # TIME-MINOR self-KV cache (layers, b, heads, hd, T): self-attention
    # READS stream like the cross-KV (time in the lane dim; measured
    # 1.5 vs 2.8 ms per medium/b64 24-layer token e2e) — but the per-token
    # cache WRITE is a lane-column DUS whose (..., 1)-lane update tensor
    # tiles to 128 lanes: ~128x write amplification, profiled at
    # ~10 ms/token (839x -> 498x e2e). OPT-IN, measured-negative at the
    # <=128-new-token serving shape; a flush-batched variant only pays
    # beyond ~2x128-token outputs. The production fix was making the flat
    # kernel's head-map dots DEFAULT-precision instead (self_attention.py
    # module docstring). Dense bf16 only; beam search always uses flat.
    tmin_self_cache: bool = False
    # Sequence parallelism for the TRAINING full forward (see AudioEncoder):
    # no-op when the prompt+text length doesn't divide the model axis.
    sequence_parallel: bool = False

    @property
    def _tmin_self(self) -> bool:
        d = self.dims
        return (
            self.tmin_self_cache
            and self.flat_self_cache  # packed serving caches allowed at all
            and self.scan_layers
            and self.self_kv_bits == 16
            and (d.n_text_state // d.n_text_head) % 8 == 0
        )

    def _cache_layout(self, cache) -> str:
        """Classify a self-KV cache tuple: ``flat`` (L, b, T, n_state — 2
        dense leaves or 3 int8+scale), ``tmin`` (L, b, heads, hd, T), or
        ``5d`` (L, b, T, heads, hd)."""
        leaf = cache[0]
        if len(cache) == 3 or leaf.ndim == 4:
            return "flat"
        d = self.dims
        hd = d.n_text_state // d.n_text_head
        if leaf.ndim == 5 and leaf.shape[2] == d.n_text_head and (
            leaf.shape[3] == hd
        ):
            return "tmin"
        return "5d"

    @property
    def _flat_self(self) -> bool:
        d = self.dims
        hd = d.n_text_state // d.n_text_head
        return (
            self.flat_self_cache
            and self.scan_layers
            and self.self_kv_bits in (8, 16)
            and d.n_text_state % 128 == 0
            and 128 % hd == 0
            # int8 flat packs K+V scales into one 128-lane row
            and (self.self_kv_bits == 16 or 2 * d.n_text_head <= 128)
        )

    @property
    def _flat_quant(self) -> bool:
        """int8 flat cache: int8 K/V data + one packed bf16 scale leaf
        (ops/self_attention.py quantize_flat_kv)."""
        return self._flat_self and self.self_kv_bits == 8

    def setup(self):
        d = self.dims
        self.token_embedding = nn.Embed(d.n_vocab, d.n_text_state, name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (d.n_text_ctx, d.n_text_state),
        )
        if self.scan_layers:
            block_cls = (
                nn.remat(ResidualAttentionBlock) if self.remat
                else ResidualAttentionBlock
            )
            self.block = block_cls(
                d.n_text_state, d.n_text_head, cross_attention=True,
                dtype=self.dtype, cross_kv_bits=self.cross_kv_bits,
                name="block",
            )
        else:
            self.blocks = [
                ResidualAttentionBlock(
                    d.n_text_state, d.n_text_head, cross_attention=True,
                    dtype=self.dtype, cross_kv_bits=self.cross_kv_bits,
                    name=f"blocks_{i}",
                )
                for i in range(d.n_text_layer)
            ]
        self.ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")

    # ---- embedding / logits ----

    def embed(self, tokens: jax.Array) -> jax.Array:
        return self.token_embedding(tokens)

    def logits(self, x: jax.Array) -> jax.Array:
        """Tied-embedding output projection, fp32 (whisper_decoder.py:149-151)."""
        emb = self.token_embedding.embedding
        return jnp.einsum(
            "btd,vd->btv",
            x.astype(self.dtype),
            emb.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)

    @staticmethod
    def logits_quant(
        x: jax.Array, emb_q: jax.Array, emb_s: jax.Array
    ) -> jax.Array:
        """W8A8 tied-embedding logits for the decode step: per-row int8
        embedding (quantize_step_weights) x dynamically-quantized hidden —
        the (n_vocab, n_state) read is ~106 MB/token at medium in bf16,
        halved here and run as a native int8 MXU dot (ops/quant.py)."""
        from ...ops.quant import quantize_activation

        x_q, a_s = quantize_activation(x)
        y = jax.lax.dot_general(
            x_q,
            emb_q,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (b, t, vocab)
        return y.astype(jnp.float32) * (a_s * emb_s)

    # ---- full-sequence forward ----

    def forward_embedded(
        self, x_emb: jax.Array, memory: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """Run blocks on already-embedded input (positions added here)."""
        length = x_emb.shape[1]
        x = x_emb + self.positional_embedding[:length]
        x = x.astype(self.dtype)
        if mask is None:
            mask = causal_mask(length)
        memory = memory.astype(self.dtype)
        sp = (lambda t: shard_seq(t)) if self.sequence_parallel else (lambda t: t)
        x = sp(x)
        if self.scan_layers:
            def body(block, carry, _):
                return sp(block(carry, xa=memory, mask=mask)), None

            x, _ = _scan(body, self.dims.n_text_layer)(self.block, x, None)
        else:
            for block in self.blocks:
                x = sp(block(x, xa=memory, mask=mask))
        return self.ln(x).astype(self.dtype)

    def __call__(self, tokens: jax.Array, memory: jax.Array) -> jax.Array:
        """(batch, len) int tokens + (batch, src, n_state) memory -> fp32 logits."""
        x = self.forward_embedded(self.embed(tokens), memory)
        return self.logits(x)

    # ---- KV-cache decode path ----

    def cross_kv(self, memory: jax.Array, quantize: bool = False):
        """Per-layer K/V of the encoder memory, stacked with a leading layer
        axis. ``quantize=True`` returns int8 tensors + scales (kv_quant) —
        half the per-step HBM traffic of the decode's dominant term."""
        memory = memory.astype(self.dtype)
        if self.scan_layers:
            def body(block, carry, _):
                out = (
                    block.cross_attn.kv_quant(memory)
                    if quantize
                    else block.cross_attn.kv(memory)
                )
                return carry, out

            _, out = _scan(body, self.dims.n_text_layer)(self.block, 0, None)
            return out
        per_layer = [
            b.cross_attn.kv_quant(memory) if quantize else b.cross_attn.kv(memory)
            for b in self.blocks
        ]
        return tuple(jnp.stack(parts) for parts in zip(*per_layer))

    def quantize_cross(self, cross: CrossKV):
        """Quantize dense stacked cross K/V ((layers, b, T, h, hd) each, from
        ``cross_kv(..., quantize=False)``) to the packed decode layout.

        The decode session runs the PREFILL on the dense tensors (exact
        numerics, no unpack pass) and quantizes once for the token loop —
        quantize-before-prefill measured ~130 ms of setup on medium/batch 32
        at 4 bits (pack + per-position unpack in the prefill einsum)."""
        k, v = cross
        out = quantize_kv_tensors(k, v, bits=self.cross_kv_bits)
        # kv_len rides stacked per layer so scan/indexing peels it like the
        # tensor leaves
        return out[:-1] + (
            jnp.full((k.shape[0],), out[-1], jnp.int32),
        )

    def init_cache(
        self, batch: int, max_len: int, layout: Optional[str] = None
    ) -> Cache:
        """Preallocated self-attention cache, stacked per layer.

        ``self_kv_bits=8`` returns the int8 form (k8, k_scales, v8,
        v_scales) — per-(batch, position, head) scales; halves the cache
        read, the second-largest per-token HBM term at long outputs.

        ``layout``: ``None`` picks the best eligible layout — TIME-MINOR
        (L, b, heads, hd, T) when ``_tmin_self`` holds (the greedy serving
        default), else the packed flat form, else 5-D. ``"flat"`` forces
        the flat layout (the beam decoder: its reorder kernel's live-prefix
        read optimization needs time sublane-major)."""
        d = self.dims
        if layout is None:
            layout = "tmin" if self._tmin_self else "auto"
        if layout == "tmin":
            assert self._tmin_self, (self.self_kv_bits, self.scan_layers)
            hd = d.n_text_state // d.n_text_head
            t_pad = -(-max_len // 128) * 128
            shape = (d.n_text_layer, batch, d.n_text_head, hd, t_pad)
            return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)
        if self._flat_self:
            from ...ops.self_attention import BLOCK_POS

            # packed flat layout (ops/self_attention.py): minor dim
            # n_state tiles exactly (no 64-lane padding); pad max_len so
            # the kernel's position chunks divide evenly (masking covers
            # the tail)
            pad_len = -(-max_len // BLOCK_POS) * BLOCK_POS
            shape = (d.n_text_layer, batch, pad_len, d.n_text_state)
            if self._flat_quant:
                return (
                    jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape[:3] + (128,), jnp.bfloat16),
                )
            return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)
        shape = (
            d.n_text_layer, batch, max_len, d.n_text_head,
            d.n_text_state // d.n_text_head,
        )
        if self.self_kv_bits == 8:
            sc_shape = shape[:-1]
            return (
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(sc_shape, jnp.float32),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(sc_shape, jnp.float32),
            )
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)

    def prefill(
        self, x_emb: jax.Array, cache: Cache, cross: CrossKV
    ) -> Tuple[jax.Array, Cache]:
        """Run a multi-token prefix through the decoder, filling cache[:, :, :L].

        Returns fp32 logits of the last position and the updated cache.
        """
        length = x_emb.shape[1]
        x = (x_emb + self.positional_embedding[:length]).astype(self.dtype)
        mask = causal_mask(length)
        n_cache = len(cache)
        layout = self._cache_layout(tuple(cache))
        if layout in ("flat", "tmin") and self.scan_layers:
            # collect news as scan ys, pack ONCE (the (b, L, n_state)
            # row-major order IS the flat lane order), write outside
            def body(block, carry, layer_in):
                y, news = block.prefill_news(carry, mask, layer_in)
                return y, news

            x, news = _scan(body, self.dims.n_text_layer)(
                self.block, x, tuple(cross)
            )
            L_, b_, t_ = news[0].shape[:3]
            if layout == "tmin":
                # (L, b, t, heads, hd) -> time-minor (L, b, heads, hd, t)
                news = tuple(n.transpose(0, 1, 3, 4, 2) for n in news)
                offs = (0,) * 5
            else:
                news = tuple(n.reshape(L_, b_, t_, -1) for n in news)
                if self._flat_quant:
                    from ...ops.self_attention import quantize_flat_kv

                    news = quantize_flat_kv(*news, self.dims.n_text_head)
                offs = (0, 0, 0, 0)
            cache = tuple(
                jax.lax.dynamic_update_slice(buf, n.astype(buf.dtype), offs)
                for buf, n in zip(cache, news)
            )
        elif self.scan_layers:
            def body(block, carry, layer_in):
                lcache = layer_in[:n_cache]
                y, lcache = block.prefill(carry, lcache, mask, layer_in[n_cache:])
                return y, lcache

            x, cache = _scan(body, self.dims.n_text_layer)(
                self.block, x, tuple(cache) + tuple(cross)
            )
        else:
            per_layer = []
            for i, block in enumerate(self.blocks):
                x, cache_i = block.prefill(
                    x, tuple(c[i] for c in cache), mask,
                    tuple(c[i] for c in cross),
                )
                per_layer.append(cache_i)
            cache = tuple(jnp.stack(parts) for parts in zip(*per_layer))
        x = self.ln(x[:, -1:]).astype(self.dtype)
        return self.logits(x)[:, 0], tuple(cache)

    def step(
        self,
        token_emb: jax.Array,
        pos: jax.Array,
        cache: Cache,
        cross: CrossKV,
        qw: Optional[dict] = None,
        beam_group: int = 1,
        row_map: Optional[jax.Array] = None,
        settled: Optional[jax.Array] = None,
        defer_window: int = 8,
    ) -> Tuple[jax.Array, Cache]:
        """One decode step. token_emb: (batch, M, n_state); pos: scalar int
        (uniform positions, the decode loop, M = 1) or a (batch,) int vector
        (per-row ragged positions — speculative draft/verify chunks,
        decode/speculative.py). M > 1 runs the causal multi-token VERIFY:
        the cache and cross K/V reads are paid once for all M queries.

        ``qw`` (from ``quantize_step_weights``) routes every dense matmul of
        the step — including the tied-embedding logits — through W8A8 int8
        (ops/quant.py); the per-layer entries ride the scan like the cross
        K/V do. Returns fp32 logits — (batch, n_vocab) at M = 1, else
        (batch, M, n_vocab) — and the updated cache.

        ``beam_group=k``: token_emb/cache carry batch*k beam-flattened rows
        while the quantized ``cross`` stays at plain batch rows — the
        grouped Pallas kernel reads each utterance's cross K/V ONCE for all
        of its beams (attend_quant docstring). Requires quantized cross.
        """
        q_len = token_emb.shape[1]
        ragged = jnp.ndim(pos) > 0
        if ragged:
            # per-row positions: gather M consecutive pos-emb rows per row
            idx = pos[:, None] + jnp.arange(q_len)
            pos_emb = jnp.take(
                self.positional_embedding, idx, axis=0
            )  # (b, M, d)
        else:
            pos_emb = jax.lax.dynamic_slice_in_dim(
                self.positional_embedding, pos, q_len, axis=0
            )[None]
        x = (token_emb + pos_emb).astype(self.dtype)
        cache = tuple(cache)
        layout = self._cache_layout(cache)
        assert not ((ragged or q_len > 1) and layout != "5d"), (
            "speculative (ragged/multi-token) steps need the 5-D cache: "
            "build the decoder with flat_self_cache=False"
        )
        assert row_map is None or (
            layout == "flat" and self.scan_layers and not self._flat_quant
        ), "deferred beam reorder: dense flat cache + scan layers only"
        layers_qw = None if qw is None else qw["layers"]
        quantized_cross = len(cross) == 6
        assert beam_group == 1 or quantized_cross, (
            "beam grouping needs the quantized cross-KV layout; expand the "
            "dense cross K/V across beams instead"
        )
        if self.scan_layers:
            # The big stacked tensors (quantized cross K/V; the packed self
            # caches) are scan-BROADCAST; peeling them as xs makes XLA
            # slice-copy a layer's whole K/V every token (~1.7 ms/step at
            # medium/batch 32/int4 — profiled). The Pallas kernels index
            # the layer themselves via layer_idx.
            packed_self = layout in ("flat", "tmin")
            kw_self = "self_tmin" if layout == "tmin" else "self_flat"
            idxs = jnp.arange(self.dims.n_text_layer, dtype=jnp.int32)
            self_big = tuple(cache) if packed_self else ()
            cache_xs = () if packed_self else cache
            if quantized_cross:
                k_q, k_s, v_q, v_s, v_zp, kv_len = cross

                def body(block, carry, layer_in, big):
                    lcache, (ks_l, vs_l, vzp_l, len_l), idx, qw_l = layer_in
                    kq_full, vq_full = big[:2]
                    y, news = block.step(
                        carry, lcache, pos,
                        (kq_full, ks_l, vq_full, vs_l, vzp_l, len_l),
                        qw=qw_l, layer_idx=idx, beam_group=beam_group,
                        row_map=row_map, settled=settled,
                        defer_window=defer_window,
                        **{kw_self: big[2:] or None},
                    )
                    return y, news

                x, news = _scan(
                    body, self.dims.n_text_layer, in_axes=(0, nn.broadcast)
                )(
                    self.block,
                    x,
                    (cache_xs, (k_s, v_s, v_zp, kv_len), idxs, layers_qw),
                    (k_q, v_q) + self_big,
                )
            else:
                def body(block, carry, layer_in, big):
                    lcache, cross_l, idx, qw_l = layer_in
                    y, news = block.step(
                        carry, lcache, pos, cross_l, qw=qw_l,
                        layer_idx=idx if packed_self else None,
                        row_map=row_map, settled=settled,
                        defer_window=defer_window,
                        **{kw_self: big or None},
                    )
                    return y, news

                x, news = _scan(
                    body, self.dims.n_text_layer, in_axes=(0, nn.broadcast)
                )(
                    self.block, x,
                    (cache_xs, tuple(cross), idxs, layers_qw),
                    self_big,
                )
        else:
            per_layer = []
            for i, block in enumerate(self.blocks):
                qw_i = (
                    None if layers_qw is None
                    else jax.tree_util.tree_map(lambda a: a[i], layers_qw)
                )
                x, news_i = block.step(
                    x, tuple(c[i] for c in cache), pos,
                    tuple(c[i] for c in cross), qw=qw_i,
                    beam_group=beam_group,
                )
                per_layer.append(news_i)
            news = tuple(jnp.stack(parts) for parts in zip(*per_layer))
        # single cache write OUTSIDE the layer scan: only the (L, B, 1, ...)
        # new slices move, not the whole cache (see block.step docstring)
        if layout == "tmin":
            # news: (L, b, n_state) per leaf -> one time-minor lane column
            # at pos (measured free: XLA's in-place DUS writes only the
            # touched sub-tiles)
            L_, b_ = news[0].shape[:2]
            hd = self.dims.n_text_state // self.dims.n_text_head
            cache = tuple(
                jax.lax.dynamic_update_slice(
                    buf,
                    n.reshape(L_, b_, self.dims.n_text_head, hd, 1).astype(
                        buf.dtype
                    ),
                    (0, 0, 0, 0, pos),
                )
                for buf, n in zip(cache, news)
            )
        elif layout == "flat":
            # news: (L, b, n_state) per leaf -> one packed row at pos;
            # int8 form quantizes ONCE here, outside the layer scan
            if self._flat_quant:
                from ...ops.self_attention import quantize_flat_kv

                news = quantize_flat_kv(*news, self.dims.n_text_head)
            cache = tuple(
                jax.lax.dynamic_update_slice(
                    buf, n[:, :, None].astype(buf.dtype), (0, 0, pos, 0)
                )
                for buf, n in zip(cache, news)
            )
        elif ragged:
            # per-row write offsets (speculative steps): vmap over the batch
            # axis lowers to one scatter of just the (L, b, M, ...) news
            def row_write(buf_r, n_r, p):
                return jax.lax.dynamic_update_slice(
                    buf_r, n_r, (0, p) + (0,) * (buf_r.ndim - 2)
                )

            cache = tuple(
                jax.vmap(row_write, in_axes=(1, 1, 0), out_axes=1)(
                    buf, n, pos
                )
                for buf, n in zip(cache, news)
            )
        else:
            cache = tuple(
                jax.lax.dynamic_update_slice(
                    buf, n, (0, 0, pos) + (0,) * (buf.ndim - 3)
                )
                for buf, n in zip(cache, news)
            )
        x = self.ln(x).astype(self.dtype)
        lg = (
            self.logits_quant(x, *qw["emb"]) if qw is not None
            else self.logits(x)
        )
        return (lg[:, 0] if q_len == 1 else lg), cache
