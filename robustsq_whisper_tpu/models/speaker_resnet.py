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

import logging
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
    """fbank (batch, frames, 80) -> L2-normalizable speaker embedding.

    ``stages`` defaults to ResNet34's (3,4,6,3); overridable so tests can
    build tiny-but-structurally-identical instances.
    """

    embed_dim: int = 256
    base_channels: int = 32
    stages: tuple = (3, 4, 6, 3)
    dtype: Dtype = jnp.float32

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
        for si, blocks in enumerate(self.stages):
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
    """Raw initializer map from an ONNX file ({name: array}).

    Uses the in-house minimal protobuf reader (utils/onnx_pb.py) — the image
    ships neither ``onnx`` nor ``onnxruntime``, but the file format is plain
    protobuf. Returns None when no file is given / present."""
    if not onnx_path or not os.path.exists(onnx_path):
        return None
    from ..utils.onnx_pb import read_onnx_initializers

    return read_onnx_initializers(onnx_path)


# Common wrapper prefixes seen in torch->ONNX speaker-model exports.
_NAME_PREFIXES = ("", "module.", "front.", "speaker_encoder.", "model.")


def map_onnx_to_flax(
    inits: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    stages: tuple = (3, 4, 6, 3),
    strict: bool = True,
) -> Dict[str, Any]:
    """Map wespeaker-style ResNet34 ONNX initializers onto the flax tree.

    The ONNX graph keeps torch state-dict names (``conv1.weight``,
    ``layer3.2.bn1.running_mean``, ``seg_1.weight`` ...). Layout conversions:

    - conv: torch ``(O, I, kF, kT)`` over a (freq, time) map -> flax
      ``(kT, kF, I, O)`` over this model's (time, freq) map — spatial
      transpose is exact because every stride/pad is symmetric per-dim;
    - batchnorm: weight/bias -> scale/bias params; running_mean/var ->
      batch_stats mean/var;
    - ``seg_1`` (embedding Linear): wespeaker pools ``(B, C, F, T)`` as
      channel-major ``c*F + f`` feature order; this model pools
      ``(b, t, f, c)`` as freq-major ``f*C + c`` — the kernel's input axis is
      permuted accordingly for both the mean and std halves, then transposed
      to flax ``(in, out)``.

    Raises KeyError (strict) listing any expected-but-missing or
    unmapped-extra initializers so a mismatched export fails loudly.
    """
    import jax.tree_util as jtu

    # strip a common wrapper prefix if every name carries it
    names = list(inits)
    for pref in _NAME_PREFIXES[1:]:
        if names and all(n.startswith(pref) for n in names):
            inits = {n[len(pref):]: v for n, v in inits.items()}
            break

    params = jtu.tree_map(lambda x: x, variables["params"])
    bstats = jtu.tree_map(lambda x: x, variables.get("batch_stats", {}))

    def conv_t(w: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(np.transpose(w, (3, 2, 1, 0)))

    used = set()

    def take(name: str) -> Optional[np.ndarray]:
        if name in inits:
            used.add(name)
            return np.asarray(inits[name])
        return None

    missing = []

    def put_conv(tree_mod: Dict, tname: str) -> None:
        w = take(tname)
        if w is None:
            missing.append(tname)
            return
        tree_mod["kernel"] = jnp.asarray(conv_t(w), jnp.float32)

    def put_bn(pmod: Dict, smod: Dict, tbase: str) -> None:
        for tsuf, dst, tree in (
            ("weight", "scale", pmod),
            ("bias", "bias", pmod),
            ("running_mean", "mean", smod),
            ("running_var", "var", smod),
        ):
            v = take(f"{tbase}.{tsuf}")
            if v is None:
                if tsuf != "num_batches_tracked":
                    missing.append(f"{tbase}.{tsuf}")
                continue
            tree[dst] = jnp.asarray(v, jnp.float32)
        take(f"{tbase}.num_batches_tracked")  # consume if present

    put_conv(params["stem_conv"], "conv1.weight")
    put_bn(params["stem_bn"], bstats.setdefault("stem_bn", {}), "bn1")
    for si, nb in enumerate(stages):
        for bi in range(nb):
            t = f"layer{si + 1}.{bi}"
            fl = f"layer{si + 1}_{bi}"
            put_conv(params[fl]["conv1"], f"{t}.conv1.weight")
            put_bn(params[fl]["bn1"], bstats.setdefault(fl, {}).setdefault("bn1", {}), f"{t}.bn1")
            put_conv(params[fl]["conv2"], f"{t}.conv2.weight")
            put_bn(params[fl]["bn2"], bstats[fl].setdefault("bn2", {}), f"{t}.bn2")
            if "downsample_conv" in params[fl]:
                put_conv(params[fl]["downsample_conv"], f"{t}.downsample.0.weight")
                put_bn(
                    params[fl]["downsample_bn"],
                    bstats[fl].setdefault("downsample_bn", {}),
                    f"{t}.downsample.1",
                )

    # embedding head: permute channel-major (c*F+f) -> freq-major (f*C+c)
    w = take("seg_1.weight")
    if w is None:
        missing.append("seg_1.weight")
    else:
        flax_kernel = np.asarray(params["embed"]["kernel"])
        half = w.shape[1] // 2
        c_dim = np.asarray(params[f"layer{len(stages)}_0"]["conv2"]["kernel"]).shape[-1]
        f_dim = half // c_dim
        if f_dim * c_dim != half:
            raise ValueError(
                f"seg_1.weight in-dim {w.shape[1]} does not factor into "
                f"2 * F * C with C={c_dim}"
            )
        # perm[f*C + c] = c*F + f (wespeaker column index for our row index)
        f_idx, c_idx = np.divmod(np.arange(half), c_dim)
        perm = c_idx * f_dim + f_idx
        perm_full = np.concatenate([perm, perm + half])
        kernel = np.ascontiguousarray(w[:, perm_full].T)
        if kernel.shape != flax_kernel.shape:
            raise ValueError(
                f"seg_1.weight maps to kernel {kernel.shape}, flax expects "
                f"{flax_kernel.shape}"
            )
        params["embed"]["kernel"] = jnp.asarray(kernel, jnp.float32)
    b = take("seg_1.bias")
    if b is not None:
        params["embed"]["bias"] = jnp.asarray(b, jnp.float32)
    else:
        missing.append("seg_1.bias")

    extra = sorted(set(inits) - used)
    if strict and (missing or extra):
        raise KeyError(
            f"ONNX->flax mapping mismatch: missing={missing[:8]} "
            f"extra={extra[:8]} (of {len(missing)}/{len(extra)})"
        )
    out = dict(variables)
    out["params"] = params
    if bstats:
        out["batch_stats"] = bstats
    return out


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
    91-146).

    Source selection mirrors the reference's ``--is_train`` switch
    (extract_reset_embedding_onnx.py:115-130): a ``spk2enroll.json`` in the
    dir means train mode — extract one embedding per ENROLLMENT utterance in
    the pool (lazy ``*utt spk`` rows resolve against these ids at load time);
    otherwise concrete ``enroll.scp`` rows (eval mode, keyed by mixture utt);
    otherwise every ``wav.scp`` row."""
    from ..audio.fbank import kaldi_fbank
    from ..data import kaldi_io

    s2e_path = os.path.join(data_dir, "spk2enroll.json")
    enroll_path = os.path.join(data_dir, "enroll.scp")
    if os.path.exists(s2e_path):
        s2e = kaldi_io.read_spk2enroll(s2e_path)
        wav = {u: p for pairs in s2e.values() for u, p in pairs}
    elif os.path.exists(enroll_path):
        rows = kaldi_io.read_scp(enroll_path)
        wav = {
            u: p for u, p in rows.items()
            if not kaldi_io.is_lazy_enrollment(p)
        }
        if not wav:
            raise ValueError(
                f"{enroll_path}: only lazy rows but no spk2enroll.json to "
                "resolve them — run the stage-102 enrollment json builder"
            )
    else:
        wav = kaldi_io.read_scp(os.path.join(data_dir, "wav.scp"))
    os.makedirs(out_dir, exist_ok=True)
    model = SpeakerResNet34(embed_dim=embed_dim)
    rng = jax.random.PRNGKey(seed)
    max_samples = int(max_seconds * 16000)

    # jitted init: eager flax init dispatches one ~30 ms tunneled round trip
    # per parameter leaf (~80 s for ResNet34 — measured; the dominant cost
    # of RECIPE_E2E s103 before this)
    dummy = jnp.zeros((1, 398, 80), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, dummy, jnp.asarray([398]))
    )(rng)
    inits = load_onnx_weights(onnx_model)
    if inits is not None:
        variables = map_onnx_to_flax(inits, variables)
    elif onnx_model:
        raise FileNotFoundError(onnx_model)

    @jax.jit
    def embed(variables, audio, lens):
        feats, flens = kaldi_fbank(audio, lens)
        e = model.apply(variables, feats, flens)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    scp: Dict[str, str] = {}
    utts = sorted(wav)
    # fixed (batch_size, max_samples) shape: ONE jit compilation serves every
    # chunk, including the ragged last one (padded rows are discarded).
    # Phase timing: on a tunneled TPU the first call's compile dominates
    # small dirs (RECIPE_E2E s103 measured 647.7 s for 64 utts = compile +
    # relay dispatch, not compute) — log the split so the wall is explained.
    import time as _time

    t_io = t_dev = 0.0
    n_calls = 0
    t_first = None
    for i in range(0, len(utts), batch_size):
        chunk = utts[i : i + batch_size]
        batch = np.zeros((batch_size, max_samples), np.float32)
        lens = np.full((batch_size,), 400, np.int32)
        t0 = _time.time()
        for j, u in enumerate(chunk):
            a, _ = kaldi_io.read_wav(wav[u].split()[0])
            a = a[:max_samples]
            batch[j, : len(a)] = a
            lens[j] = max(len(a), 400)
        t_io += _time.time() - t0
        t0 = _time.time()
        embs = np.asarray(
            embed(variables, jnp.asarray(batch), jnp.asarray(lens))
        )
        dt = _time.time() - t0
        if t_first is None:
            t_first = dt
        else:
            t_dev += dt
        n_calls += 1
        t0 = _time.time()
        for j, u in enumerate(chunk):
            p = os.path.join(out_dir, f"{u}.npy")
            np.save(p, embs[j])
            scp[u] = p
        t_io += _time.time() - t0
    kaldi_io.write_scp(os.path.join(data_dir, "resnet.scp"), scp)
    if t_first is not None:
        steady = t_dev / max(n_calls - 1, 1)
        logging.info(
            "extract_embeddings: %d utts in %d batches of %d — "
            "compile+first batch %.1fs, steady %.2fs/batch, io %.1fs",
            len(scp), n_calls, batch_size, t_first, steady, t_io,
        )
    return {"num_utts": len(scp), "embed_dim": embed_dim}
