"""Device mesh + sharding helpers.

The reference's only model parallelism is torch DataParallel over 4 GPUs
(/root/reference/run_tswhisper.sh:14-15, ts_qformer_espnet_model.py:250-251)
with NCCL arriving implicitly through ESPnet. The TPU-native replacement is a
``jax.sharding.Mesh`` with a ``data`` axis (DP, grads all-reduced over ICI by
XLA) and an optional ``model`` axis (tensor parallelism over attention heads
and FFN hidden — beyond-parity, free on TPU via pjit). Parameter STORAGE can
additionally be sharded over the data axis (``fsdp=True`` — ZeRO-3
semantics, params/Adam moments of full-FT medium exceed one chip's HBM).

No hand-written collectives: shardings are declared, XLA inserts
psum/all-gather/reduce-scatter over ICI (SURVEY.md §2.4).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# ---- tensor-parallel parameter partitioning rules ----
#
# Path-regex -> PartitionSpec for the kernel's sharded dimension. Everything
# not matched is replicated. Designed for the flax param trees of
# models/whisper/modules.py, models/qformer.py, models/ts_encoder.py:
#  - attention q/k/v kernels (in, out): shard out (heads) over MODEL
#  - attention out kernel (in, out): shard in over MODEL
#  - mlp fc1 kernel: shard out; fc2 kernel: shard in
#  - token embedding (vocab, d): shard vocab over MODEL (logits become a
#    MODEL-sharded matmul followed by an all-gather XLA schedules on ICI)

_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(attn|attention|crossattention|cross_attn)/(query|key|value)/kernel$", P(None, MODEL_AXIS)),
    (r".*(attn|attention|crossattention|cross_attn)/(query|key|value)/bias$", P(MODEL_AXIS)),
    (r".*(attn|attention|crossattention|cross_attn)/out/kernel$", P(MODEL_AXIS, None)),
    (r".*(mlp_fc1|fc1)/kernel$", P(None, MODEL_AXIS)),
    (r".*(mlp_fc1|fc1)/bias$", P(MODEL_AXIS)),
    (r".*(mlp_fc2|fc2)/kernel$", P(MODEL_AXIS, None)),
    (r".*token_embedding/embedding$", P(MODEL_AXIS, None)),
    (r".*aam/classifier$", P(MODEL_AXIS, None)),
)


def param_pspec(path: str, value: Any, tp: bool = True) -> P:
    """PartitionSpec for one parameter, by its '/'-joined tree path.

    Rules are written for unstacked 2-D kernels; scan-stacked params carry a
    leading layer axis, so specs are left-padded with None to the leaf rank
    (the layer axis is never sharded — it is the scan/pipeline axis).
    """
    ndim = getattr(value, "ndim", 0)
    if tp:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, path) and len(spec) <= ndim:
                pad = ndim - len(spec)
                return P(*([None] * pad), *spec)
    return P()


def tree_paths(tree: Any):
    """Yield ('/'-joined path, leaf) pairs."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for kp, leaf in flat:
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        yield path, leaf


def _fsdp_spec(spec: P, leaf: Any, n_data: int) -> P:
    """Add a DATA-axis shard to one eligible dim of ``spec`` (ZeRO-3 /
    fully-sharded storage). Picks the LARGEST dim that is not already
    TP-sharded and divides the data-axis size; the leading axis of
    scan-stacked leaves (ndim >= 3) is never taken — it is the lax.scan
    layer axis, and sharding it would gather a different shard per scan
    step instead of one balanced all-gather per layer."""
    ndim = getattr(leaf, "ndim", 0)
    dims = list(spec) + [None] * (ndim - len(spec))
    best, best_size = None, 0
    for i in range(ndim):
        if dims[i] is not None or (ndim >= 3 and i == 0):
            continue
        if leaf.shape[i] % n_data == 0 and leaf.shape[i] > best_size:
            best, best_size = i, leaf.shape[i]
    if best is None:
        return spec
    dims[best] = DATA_AXIS
    return P(*dims)


def params_shardings(
    mesh: Mesh,
    params: Any,
    tp: bool = True,
    fsdp: bool = False,
    fsdp_min_elems: int = 2**15,
) -> Any:
    """NamedShardings for a param tree.

    ``tp``: Megatron-style tensor partitioning per the path rules above.
    ``fsdp``: additionally shard each large leaf's storage over the DATA
    axis (the ZeRO / "fully sharded" pattern — weights and their optimizer
    moments live sharded, XLA all-gathers each layer's weights on use and
    reduce-scatters its grads; parameters+Adam state of whisper-medium
    full-FT exceed one v5e chip's HBM, this is the capacity mode that fits
    them). Leaves under ``fsdp_min_elems`` stay replicated — tiny leaves
    cost more collective latency than they save in HBM."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    n_data = mesh.shape[DATA_AXIS]
    for kp, leaf in flat:
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        spec = param_pspec(path, leaf, tp=tp and mesh.shape[MODEL_AXIS] > 1)
        # Guard: only keep the spec if the dims divide evenly.
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if leaf.shape[dim] % mesh.shape[axis] != 0:
                ok = False
        spec = spec if ok else P()
        if (
            fsdp
            and n_data > 1
            and getattr(leaf, "size", 0) >= fsdp_min_elems
        ):
            spec = _fsdp_spec(spec, leaf, n_data)
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_seq(x: Any, seq_axis: int = 1) -> Any:
    """Megatron-style sequence-parallel (SP) sharding constraint on a
    residual stream: the sequence axis sharded over MODEL (and the leading
    batch dim over DATA) whenever the ambient mesh has a >1 model axis and
    the length divides; identity otherwise (no mesh / model=1 / ragged).

    Applied at transformer block boundaries under tensor parallelism, GSPMD
    rewrites the blocks' post-attention/post-MLP all-reduces into
    reduce-scatter + all-gather pairs and stores the inter-block activations
    — exactly the tensors a rematerialized backward keeps live — sharded
    T/model per chip. The reference has no equivalent (its only parallelism
    is torch DataParallel); this is the TPU-native activation-capacity axis
    for long-sequence training.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return x
    shape = dict(mesh.shape)
    n_model = shape.get(MODEL_AXIS, 1)
    if n_model < 2 or x.shape[seq_axis] % n_model != 0:
        return x
    spec = [None] * x.ndim
    if x.shape[0] % shape.get(DATA_AXIS, 1) == 0:
        spec[0] = DATA_AXIS
    spec[seq_axis] = MODEL_AXIS
    return jax.lax.with_sharding_constraint(x, P(*spec))


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    """Shard every batch leaf along its leading (batch) dim over DATA."""

    def spec(leaf: Any) -> NamedSharding:
        ndim = getattr(leaf, "ndim", 0)
        if ndim >= 1 and leaf.shape[0] % mesh.shape[DATA_AXIS] == 0:
            return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host setup: ``jax.distributed.initialize`` — the TPU-native
    replacement for the reference's implicit NCCL/torchrun environment
    (SURVEY.md §2.4). On TPU pods, arguments auto-resolve from the
    environment; the mesh built afterwards spans all hosts' devices, with
    intra-slice collectives on ICI and cross-slice on DCN. Returns the
    global device count. No-op (returns local count) for single-process."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is None and (
        "TPU_WORKER_HOSTNAMES" in __import__("os").environ
        and len(
            __import__("os").environ["TPU_WORKER_HOSTNAMES"].split(",")
        )
        > 1
    ):
        jax.distributed.initialize()
    return len(jax.devices())
