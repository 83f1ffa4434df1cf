"""Target-speaker Whisper encoders (flax), TPU-first.

Capabilities match the reference encoder family in
/root/reference/model/whisper_encoder.py:

- ``QFormerTSEncoder`` — the main path (QFormerTgtSpkWhisperEncoder_V2,
  whisper_encoder.py:392-530): conv stem on speech (with sinusoid positions)
  AND enrollment (without positions, :464-472), Qformer producing a speaker
  prompt + enrollment embeddings, optional ``prompt_proj`` when Qformer hidden
  differs from the encoder width (:430-433), prompt concatenated ahead of the
  speech frames (:489-494), then the full Whisper block stack + ln_post.
- ``SpkAdapterTSEncoder`` — embedding-enrollment variant (TgtSpkWhisperEncoder,
  whisper_encoder.py:195-334): a fixed speaker embedding injected into the
  FIRST block via ``cat`` / ``additive`` / ``film`` adapters (SpkAdapter,
  :337-389) or conditional layernorm patching of block 0 (:234-253, 283-287).

TPU design: everything is static-shape; frame lengths ride along as int32
arrays and turn into masks only where needed. The prompt length is a static
config value so the concat is a compile-time shape. Mel extraction is done by
the caller (see robustsq_whisper_tpu.audio.frontend) so the encoder stays a
pure feats->feats function, cleanly jit- and shard-able.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .qformer import QFormerAdapter, QformerConfig
from .whisper.config import WhisperDims
from .whisper.modules import AudioEncoder

Dtype = Any


class FiLM(nn.Module):
    """Feature-wise linear modulation conditioned on a speaker embedding.

    Equivalent of the external ``espnet2.asr.adapter.film_adapter`` the
    reference imports (whisper_encoder.py:363-364): per-channel scale and
    shift predicted from the enrollment embedding, ``adapter_layer`` stacked
    Linear+GELU trunk layers before the two heads.
    """

    hidden_size: int
    n_layers: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, enroll: jax.Array) -> jax.Array:
        h = enroll.astype(self.dtype)
        for i in range(self.n_layers - 1):
            h = jax.nn.gelu(
                nn.Dense(self.hidden_size, dtype=self.dtype, name=f"trunk_{i}")(h),
                approximate=False,
            )
        gamma = nn.Dense(self.hidden_size, dtype=self.dtype, name="gamma")(h)
        beta = nn.Dense(self.hidden_size, dtype=self.dtype, name="beta")(h)
        return x * (1.0 + gamma) + beta


class ConditionalLayerNorm(nn.Module):
    """LayerNorm whose scale/bias are modulated by the speaker embedding.

    Equivalent of ``espnet2.asr.adapter.cln_adapter`` as used at
    whisper_encoder.py:234-253: normalized activations scaled by
    ``(w + dw(enroll))`` and shifted by ``(b + db(enroll))`` where (w, b) are
    initialised from the pretrained block-0 layernorm (weight converter maps
    them in) and dw/db are zero-init linear heads on the enrollment embedding.
    """

    hidden_size: int
    modulate_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, enroll: jax.Array) -> jax.Array:
        w = self.param("scale", nn.initializers.ones, (self.hidden_size,))
        b = self.param("bias", nn.initializers.zeros, (self.hidden_size,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        dw = nn.Dense(
            self.hidden_size,
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="delta_scale",
        )(enroll.astype(jnp.float32))[:, None, :]
        scale = w + dw
        shift = b
        if self.modulate_bias:
            db = nn.Dense(
                self.hidden_size,
                kernel_init=nn.initializers.zeros,
                dtype=jnp.float32,
                name="delta_bias",
            )(enroll.astype(jnp.float32))[:, None, :]
            shift = b + db
        return (normed * scale + shift).astype(x.dtype)


class SpkAdapter(nn.Module):
    """Speaker-embedding fusion adapter (reference SpkAdapter,
    whisper_encoder.py:337-389): ``cat`` = Linear on [x; enroll] added
    residually, ``additive`` = MLP(enroll) added residually, ``film`` = FiLM;
    optional output LayerNorm."""

    enroll_size: int
    hidden_size: int
    adapter_method: str = "cat"
    adapter_normalize: bool = True
    adapter_layer: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, enroll: jax.Array) -> jax.Array:
        enroll = jnp.broadcast_to(
            enroll[:, None, :].astype(self.dtype),
            (x.shape[0], x.shape[1], enroll.shape[-1]),
        )
        if self.adapter_method == "cat":
            fused = jnp.concatenate([x, enroll], axis=-1)
            x = x + nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(fused)
        elif self.adapter_method == "additive":
            h = nn.Dense(2 * self.enroll_size, dtype=self.dtype, name="fc1")(enroll)
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)
        elif self.adapter_method == "film":
            x = FiLM(
                self.hidden_size, self.adapter_layer, dtype=self.dtype, name="film"
            )(x, enroll)
        else:
            raise ValueError(f"Not supported adapter: {self.adapter_method}")
        if self.adapter_normalize:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="adapter_norm")(
                x
            ).astype(self.dtype)
        return x


@dataclasses.dataclass(frozen=True)
class TSEncoderConfig:
    """Knobs of QFormerTgtSpkWhisperEncoder_V2 (whisper_encoder.py:395-435)
    plus the embedding-enrollment axis of the absent ``asr_my.sh``
    ``--enroll_type`` flag (README.md:41-77; TgtSpkWhisperEncoder,
    whisper_encoder.py:195-334)."""

    # enrollment modality: "audio" = enrollment waveform through the Qformer
    # path (QFormerTSEncoder, the main path), "embedding" = a precomputed
    # speaker embedding (stage-103 resnet.scp rows) injected at block 0
    # (SpkAdapterTSEncoder). Selects the encoder class in TSASRModel.
    enroll_type: str = "audio"
    # --- embedding-enrollment knobs (enroll_type == "embedding";
    #     reference TgtSpkWhisperEncoder.__init__, whisper_encoder.py:199-255)
    enroll_size: int = 256  # voxceleb_resnet34_LM emits 256-d embeddings
    adapter_method: str = "cat"  # cat | additive | film | cln
    adapter_normalize: bool = True
    adapter_layer: int = 1
    modulate_bias: bool = False
    # --- Qformer knobs (enroll_type == "audio")
    num_query_tokens: int = 16
    num_hidden_layers: int = 2
    use_spk_prompt: bool = True
    qformer_hidden_size: int = 768
    qformer_heads: int = 12
    qformer_intermediate_size: int = 3072
    # BertConfig() dropout defaults — the reference Qformer trains with 0.1
    # (qformer_adapter.py:35); the Whisper blocks stay dropout-free.
    qformer_hidden_dropout: float = 0.1
    qformer_attention_dropout: float = 0.1
    # Pallas flash-attention kernel for the encoder's long self-attention.
    # Differentiable (custom VJP with flash backward kernels): measured
    # 2.3x fwd / 2.6x fwd+bwd vs the XLA path at medium encoder shapes on
    # one v5e chip — safe and profitable for BOTH training and decode.
    # Default False so tiny CPU test configs skip the interpret-mode kernel.
    use_flash_attention: bool = False
    # transposed-layout flash self-attention (the inference operating
    # point): projections emit (b, n_state, T) straight into the (bh, d, T)
    # kernel, killing the four per-layer head-split copies of the row-major
    # wrapper (measured 28.5 -> 25.0 ms/layer, medium b64; KERNELS.md §8).
    # Requires ``use_flash_attention``. Differentiable via a fallback VJP
    # (row-major flash backward + a forward recompute) — correct under
    # grad, but training configs should leave this False for speed.
    flash_tmaj: bool = False
    remat: bool = False  # rematerialize encoder blocks in backward
    # tanh-approximate GELU in the encoder blocks + conv stem (~1e-3 abs
    # deviation from the reference's exact erf GELU): the exact form lowers
    # to a double-evaluated f32 erfc polynomial fused into the fc2 matmul —
    # the single most expensive encoder fusion on-profile. Inference knob;
    # training configs keep the exact GELU.
    gelu_approx: bool = False
    # Megatron-style sequence parallelism under tensor parallelism: the
    # inter-block residual stream (the remat-stored activations) is
    # constrained (data, model)-sharded along time. Training knob for
    # meshes with a model axis; identity elsewhere (parallel/mesh.py).
    sequence_parallel: bool = False


class QFormerTSEncoder(nn.Module):
    """Qformer-conditioned target-speaker Whisper encoder (main path).

    ``__call__`` consumes log-mel features (speech + enrollment) and returns
    ``(encoder_out, out_lens, spk_prompt, enroll_embedding)`` exactly like the
    reference's 4-tuple (whisper_encoder.py:504). ``encoder_out`` has static
    length ``num_query_tokens + n_frames//2``; the prompt frames occupy the
    first ``num_query_tokens`` positions (strip them for CTC, see
    losses/ts_model.py).
    """

    dims: WhisperDims
    ts: TSEncoderConfig = TSEncoderConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = AudioEncoder(
            self.dims, dtype=self.dtype,
            use_flash=self.ts.use_flash_attention, remat=self.ts.remat,
            flash_tmaj=self.ts.flash_tmaj,
            gelu_approx=self.ts.gelu_approx,
            sequence_parallel=self.ts.sequence_parallel,
            name="encoder",
        )
        qcfg = QformerConfig(
            encoder_width=self.dims.n_audio_state,
            hidden_size=self.ts.qformer_hidden_size,
            num_attention_heads=self.ts.qformer_heads,
            intermediate_size=self.ts.qformer_intermediate_size,
            num_hidden_layers=self.ts.num_hidden_layers,
            num_query_tokens=self.ts.num_query_tokens,
            hidden_dropout_prob=self.ts.qformer_hidden_dropout,
            attention_probs_dropout_prob=self.ts.qformer_attention_dropout,
        )
        self.qformer = QFormerAdapter(qcfg, dtype=self.dtype, name="qformer")
        if qcfg.hidden_size != self.dims.n_audio_state:
            self.prompt_proj = nn.Dense(
                self.dims.n_audio_state, dtype=self.dtype, name="prompt_proj"
            )
        else:
            self.prompt_proj = None

    def __call__(
        self,
        feats: jax.Array,  # (batch, n_mels, frames) speech log-mel
        feats_lens: Optional[jax.Array],  # (batch,) valid mel frames
        enroll_feats: jax.Array,  # (batch, n_mels, enr_frames) enrollment mel
        enroll_feats_lens: Optional[jax.Array],
        deterministic: bool = True,
        dropout_rng: Optional[jax.Array] = None,
        qw: Optional[dict] = None,  # W8A8 int8 block weights (inference)
    ) -> Tuple[jax.Array, Optional[jax.Array], jax.Array, jax.Array]:
        max_ctx = self.dims.n_audio_ctx

        # 1-2. conv stems: speech with positions, enrollment without
        # (whisper_encode steps 1-2, whisper_encoder.py:445-480).
        x = self.encoder.conv_stem(feats, add_positions=True)
        enroll = self.encoder.conv_stem(enroll_feats, add_positions=False)

        x_lens = None
        if feats_lens is not None:
            x_lens = AudioEncoder.output_lengths(feats_lens, max_ctx)
        enroll_lens = None
        if enroll_feats_lens is not None:
            enroll_lens = AudioEncoder.output_lengths(enroll_feats_lens, max_ctx)

        # 3. speaker prompt via Qformer (+ optional projection, :483-486).
        spk_prompt, enroll_embedding = self.qformer(
            x, x_lens, enroll, enroll_lens, deterministic, dropout_rng
        )
        if self.prompt_proj is not None:
            spk_prompt = self.prompt_proj(spk_prompt)
            enroll_embedding = self.prompt_proj(enroll_embedding)

        # 4. concat prompt ahead of speech frames (:489-494).
        if self.ts.use_spk_prompt:
            x = jnp.concatenate([spk_prompt.astype(x.dtype), x], axis=1)
            if x_lens is not None:
                x_lens = x_lens + self.ts.num_query_tokens

        # 5. whisper blocks + ln_post (:497-502).
        x = self.encoder.run_blocks(x, qw=qw)
        return x, x_lens, spk_prompt, enroll_embedding

    @property
    def prompt_len(self) -> int:
        return self.ts.num_query_tokens if self.ts.use_spk_prompt else 0

    @staticmethod
    def make_buffers(dims: WhisperDims, ts: TSEncoderConfig) -> dict:
        from .qformer import QformerConfig as _QC

        qcfg = _QC(
            encoder_width=dims.n_audio_state,
            hidden_size=ts.qformer_hidden_size,
            num_query_tokens=ts.num_query_tokens,
        )
        return {
            "encoder": AudioEncoder.make_buffers(dims),
            "qformer": QFormerAdapter.make_buffers(qcfg),
        }


class SpkAdapterTSEncoder(nn.Module):
    """Embedding-enrollment TS encoder (TgtSpkWhisperEncoder,
    whisper_encoder.py:195-334): fixed speaker embedding injected at block 0
    via SpkAdapter or conditional layernorm."""

    dims: WhisperDims
    enroll_size: int = 256
    adapter_method: str = "cat"  # cat | additive | film | cln
    adapter_normalize: bool = True
    adapter_layer: int = 1
    modulate_bias: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(
        cls, dims: WhisperDims, ts: "TSEncoderConfig", dtype: Dtype = jnp.float32,
        name: Optional[str] = None,
    ) -> "SpkAdapterTSEncoder":
        return cls(
            dims,
            enroll_size=ts.enroll_size,
            adapter_method=ts.adapter_method,
            adapter_normalize=ts.adapter_normalize,
            adapter_layer=ts.adapter_layer,
            modulate_bias=ts.modulate_bias,
            dtype=dtype,
            name=name,
        )

    def setup(self):
        # unrolled blocks: this variant patches block 0 individually
        # (reference whisper_encoder.py:277-291), which needs per-layer
        # addressing rather than the scan-stacked fast path.
        self.encoder = AudioEncoder(
            self.dims, dtype=self.dtype, scan_layers=False, name="encoder"
        )
        if self.adapter_method in ("cat", "additive", "film"):
            self.adapter = SpkAdapter(
                self.enroll_size,
                self.dims.n_audio_state,
                adapter_method=self.adapter_method,
                adapter_normalize=self.adapter_normalize,
                adapter_layer=self.adapter_layer,
                dtype=self.dtype,
                name="adapter",
            )
        elif self.adapter_method == "cln":
            self.attn_cln = ConditionalLayerNorm(
                self.dims.n_audio_state, self.modulate_bias, name="attn_cln"
            )
            self.mlp_cln = ConditionalLayerNorm(
                self.dims.n_audio_state, self.modulate_bias, name="mlp_cln"
            )
        else:
            raise ValueError(f"Not supported adapter: {self.adapter_method}")

    def __call__(
        self,
        feats: jax.Array,  # (batch, n_mels, frames)
        feats_lens: Optional[jax.Array],
        enroll_emb: jax.Array,  # (batch, enroll_size) speaker embedding
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        x = self.encoder.conv_stem(feats, add_positions=True)

        block0 = self.encoder.blocks[0]
        if self.adapter_method == "cln":
            # block 0 with its layernorms swapped for conditional ones
            # (whisper_encoder.py:283-287).
            h = self.attn_cln(x, enroll_emb).astype(self.dtype)
            x = x + block0.attn(h)
            x = x + block0._mlp(self.mlp_cln(x, enroll_emb).astype(self.dtype))
        else:
            x = self.adapter(x, enroll_emb)
            x = block0(x)

        for block in self.encoder.blocks[1:]:
            x = block(x)
        x = self.encoder.ln_post(x).astype(self.dtype)

        olens = None
        if feats_lens is not None:
            olens = AudioEncoder.output_lengths(feats_lens, self.dims.n_audio_ctx)
        return x, olens

    @staticmethod
    def make_buffers(dims: WhisperDims) -> dict:
        return {"encoder": AudioEncoder.make_buffers(dims)}


def quantize_encoder_weights(variables) -> dict:
    """Int8 W8A8 weights for a QFormerTSEncoder variables dict (see
    whisper.modules.quantize_encoder_weights): quantizes the 24 whisper
    blocks, which dominate encoder wall time; the conv stem, Qformer, and
    prompt projection stay dense. Inference-only."""
    from .whisper.modules import quantize_encoder_weights as _q

    return _q(variables["params"]["encoder"])
