"""Golden tests for the minimal ONNX reader + ResNet34 weight import.

The reference runs speaker-embedding extraction through an onnxruntime
session over ``voxceleb_resnet34_LM.onnx``
(/root/reference/datapre/extract_reset_embedding_onnx.py:9,104-146). This
image has neither ``onnx`` nor ``onnxruntime``, so the import path is a
from-scratch protobuf initializer reader (utils/onnx_pb.py) plus a
torch-state-dict -> flax name/layout mapping (models/speaker_resnet.py).

Oracle strategy: build a wespeaker-layout torch ResNet (conv over a
(freq, time) map, channel-major statistics pooling, seg_1 linear head) with
random weights AND random batchnorm running stats, hand-encode its state
dict into ONNX ModelProto bytes with a tiny protobuf writer, decode + map
into the flax model, and require the two stacks to agree on embeddings.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as torch_nn

from robustsq_whisper_tpu.models.speaker_resnet import (
    SpeakerResNet34,
    map_onnx_to_flax,
)
from robustsq_whisper_tpu.utils.onnx_pb import read_onnx_initializers


# ---------------- tiny protobuf writer (test-only) ----------------


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vint(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


_DT = {np.dtype(np.float32): 1, np.dtype(np.int64): 7}


def _tensor_proto(name: str, arr: np.ndarray, packed_dims: bool = False) -> bytes:
    msg = b""
    if packed_dims and arr.ndim:
        msg += _ld(1, b"".join(_varint(d) for d in arr.shape))
    else:
        for d in arr.shape:
            msg += _vint(1, d)
    msg += _vint(2, _DT[arr.dtype])
    msg += _ld(8, name.encode())
    msg += _ld(9, np.ascontiguousarray(arr).tobytes())
    return msg


def encode_onnx(state: dict, packed_dims: bool = False) -> bytes:
    graph = b"".join(
        _ld(5, _tensor_proto(n, a, packed_dims)) for n, a in state.items()
    )
    # ir_version (field 1) + graph (field 7)
    return _vint(1, 8) + _ld(7, graph)


# ---------------- torch oracle (wespeaker layout) ----------------


class _TorchBlock(torch_nn.Module):
    def __init__(self, inp, ch, stride):
        super().__init__()
        self.conv1 = torch_nn.Conv2d(inp, ch, 3, stride, 1, bias=False)
        self.bn1 = torch_nn.BatchNorm2d(ch)
        self.conv2 = torch_nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = torch_nn.BatchNorm2d(ch)
        self.downsample = None
        if stride != 1 or inp != ch:
            self.downsample = torch_nn.Sequential(
                torch_nn.Conv2d(inp, ch, 1, stride, bias=False),
                torch_nn.BatchNorm2d(ch),
            )

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        sc = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + sc)


class _TorchResNet(torch_nn.Module):
    """conv over (B, 1, F, T), channel-major (c*F + f) stats pooling,
    biased std with 1e-7 floor — the wespeaker TSTP layout the flax model's
    ONNX mapping targets."""

    def __init__(self, stages, base, embed_dim, n_mels):
        super().__init__()
        self.conv1 = torch_nn.Conv2d(1, base, 3, 1, 1, bias=False)
        self.bn1 = torch_nn.BatchNorm2d(base)
        self.stages = stages
        inp, ch = base, base
        for si, nb in enumerate(stages):
            blocks = []
            for bi in range(nb):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(_TorchBlock(inp, ch, stride))
                inp = ch
            setattr(self, f"layer{si + 1}", torch_nn.Sequential(*blocks))
            ch *= 2
        f = n_mels
        for _ in range(len(stages) - 1):
            f = (f - 1) // 2 + 1
        self.seg_1 = torch_nn.Linear(inp * f * 2, embed_dim)

    def forward(self, x):  # (B, T, F) fbank
        x = x.permute(0, 2, 1).unsqueeze(1)  # (B, 1, F, T)
        out = torch.relu(self.bn1(self.conv1(x)))
        for si in range(len(self.stages)):
            out = getattr(self, f"layer{si + 1}")(out)
        b, c, f, t = out.shape
        out = out.reshape(b, c * f, t)
        mean = out.mean(-1)
        std = torch.sqrt(
            torch.clamp(out.pow(2).mean(-1) - mean * mean, min=1e-7)
        )
        return self.seg_1(torch.cat([mean, std], dim=1))


def _randomized_oracle(stages, base, embed_dim, n_mels, seed=0):
    torch.manual_seed(seed)
    net = _TorchResNet(stages, base, embed_dim, n_mels).eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch_nn.Conv2d):
                # He-scaled so the full 16-block net stays finite in fp32
                m.weight.normal_(0, (2.0 / m.weight[0].numel()) ** 0.5)
            elif isinstance(m, torch_nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
            elif isinstance(m, torch_nn.Linear):
                m.weight.normal_(0, 0.05)
                m.bias.normal_(0, 0.05)
    return net


STAGES = (1, 1, 1, 1)
BASE = 4
EMBED = 8
N_MELS = 16


def test_reader_roundtrip_raw_and_packed():
    rng = np.random.default_rng(0)
    state = {
        "a.weight": rng.standard_normal((3, 2, 3, 3)).astype(np.float32),
        "b.running_mean": rng.standard_normal(7).astype(np.float32),
        "c.num_batches_tracked": np.asarray([42], np.int64),
    }
    for packed in (False, True):
        got = read_onnx_initializers(encode_onnx(state, packed_dims=packed))
        assert set(got) == set(state)
        for k in state:
            np.testing.assert_array_equal(got[k], state[k])
            assert got[k].dtype == state[k].dtype


def test_reader_rejects_non_onnx(tmp_path):
    p = tmp_path / "not_onnx.bin"
    p.write_bytes(b"\x08\x01")  # varint field only, no graph
    with pytest.raises(ValueError):
        read_onnx_initializers(str(p))


def test_onnx_import_matches_torch_oracle(tmp_path):
    """ONNX bytes -> reader -> flax mapping reproduces the torch network's
    embeddings (eval mode, randomized weights AND running stats)."""
    net = _randomized_oracle(STAGES, BASE, EMBED, N_MELS, seed=3)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    onnx_path = tmp_path / "resnet.onnx"
    onnx_path.write_bytes(
        encode_onnx({k: np.asarray(v) for k, v in state.items()})
    )

    model = SpeakerResNet34(embed_dim=EMBED, base_channels=BASE, stages=STAGES)
    feats = np.random.default_rng(5).standard_normal((2, 20, N_MELS)).astype(
        np.float32
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    inits = read_onnx_initializers(str(onnx_path))
    mapped = map_onnx_to_flax(inits, variables, stages=STAGES)

    got = np.asarray(model.apply(mapped, jnp.asarray(feats)))
    with torch.no_grad():
        want = net(torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_onnx_import_strips_wrapper_prefix():
    net = _randomized_oracle(STAGES, BASE, EMBED, N_MELS, seed=4)
    state = {
        f"module.{k}": np.asarray(v.detach().numpy())
        for k, v in net.state_dict().items()
    }
    model = SpeakerResNet34(embed_dim=EMBED, base_channels=BASE, stages=STAGES)
    feats = jnp.zeros((1, 12, N_MELS), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats)
    inits = read_onnx_initializers(encode_onnx(state))
    mapped = map_onnx_to_flax(inits, variables, stages=STAGES)
    # stem conv actually mapped (transposed torch weight)
    want = np.transpose(state["module.conv1.weight"], (3, 2, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(mapped["params"]["stem_conv"]["kernel"]), want
    )


def test_onnx_import_strict_mismatch_raises():
    net = _randomized_oracle(STAGES, BASE, EMBED, N_MELS, seed=5)
    state = {k: np.asarray(v.detach().numpy()) for k, v in net.state_dict().items()}
    state.pop("seg_1.bias")
    state["unexpected.weight"] = np.zeros(3, np.float32)
    model = SpeakerResNet34(embed_dim=EMBED, base_channels=BASE, stages=STAGES)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 12, N_MELS), jnp.float32)
    )
    inits = read_onnx_initializers(encode_onnx(state))
    with pytest.raises(KeyError):
        map_onnx_to_flax(inits, variables, stages=STAGES)


def test_extraction_uses_onnx_weights(tmp_path):
    """stage-103 equivalent: with an ONNX file present the extractor's
    resnet.scp embeddings are a deterministic function of the file's weights
    (two runs bit-identical; differ from random-init run)."""
    from robustsq_whisper_tpu.data import kaldi_io
    from robustsq_whisper_tpu.models.speaker_resnet import (
        extract_embeddings_for_dir,
    )

    # NOTE: extractor builds the full-size ResNet34 (stages 3,4,6,3) — keep
    # the audio tiny so CPU compile+run stays fast.
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    wavs = {}
    for u in ("utt1", "utt2"):
        p = tmp_path / f"{u}.wav"
        kaldi_io.write_wav(
            str(p), rng.standard_normal(1600).astype(np.float32) * 0.1, 16000
        )
        wavs[u] = str(p)
    kaldi_io.write_scp(str(data / "wav.scp"), wavs)

    net = _randomized_oracle((3, 4, 6, 3), 32, 16, 80, seed=7)
    onnx_path = tmp_path / "voxceleb_resnet34_LM.onnx"
    onnx_path.write_bytes(
        encode_onnx(
            {k: np.asarray(v.detach().numpy()) for k, v in net.state_dict().items()}
        )
    )

    def run(out_name, onnx=None):
        out = tmp_path / out_name
        extract_embeddings_for_dir(
            str(data), str(out), onnx_model=onnx, batch_size=2,
            max_seconds=0.2, embed_dim=16,
        )
        return {
            u: np.load(p)
            for u, p in kaldi_io.read_scp(str(data / "resnet.scp")).items()
        }

    a = run("out_a", str(onnx_path))
    b = run("out_b", str(onnx_path))
    c = run("out_c", None)
    for u in a:
        np.testing.assert_array_equal(a[u], b[u])
        assert not np.allclose(a[u], c[u])
