"""The pjit-compiled training step.

Replaces the external ESPnet trainer the reference delegates to
(SURVEY.md §3.1): one pure function (state, batch, rng, epoch) -> (state,
stats), jit-compiled once over a ``Mesh`` with the batch sharded on the
``data`` axis and params replicated or tensor-sharded (parallel/mesh.py).
Gradient all-reduce is emitted by XLA from the shardings — the TPU-native
equivalent of DataParallel + NCCL (reference run_tswhisper.sh:14-15,
force_gatherable at ts_qformer_espnet_model.py:656).

Supports three fine-tuning modes (the reference's three absent yaml configs,
README.md:53-56): ``full``, ``lora`` (rank-16 q/k/v/o adapters on the Whisper
backbone **plus** full training of the newly-initialized TS modules — qformer,
query_tokens, prompt_proj, CTC, ASP, AAM, adapters — which have no pretrained
weights and would otherwise stay frozen at random init), ``frozen_backbone``
(only the TS modules train).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.mesh import (
    Mesh,
    batch_shardings,
    params_shardings,
    replicated,
)
from .lora import LoraConfig, init_lora, merge_lora
from .optim import OptimConfig, make_optimizer

FROZEN_BACKBONE_TRAINABLE = (
    r".*(qformer|prompt_proj|ctc|asp|aam|adapter|cln|query_tokens).*"
)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    buffers: Any  # non-trainable collections (e.g. sinusoid tables)
    lora: Any  # {} when mode != lora
    opt_state: Any


def split_by_mask(params: Any, mask: Any) -> Tuple[dict, dict]:
    """Partition a nested param dict into (trainable, frozen) FLAT dicts
    (path-tuple keys). Differentiating only the trainable subtree lets XLA
    dead-code-eliminate every frozen weight's gradient matmul and its f32
    grad buffer — the backward of a frozen Dense costs the same as its
    forward if the grads are computed and merely masked at update time
    (profiled: ~90 ms/step of dead fc1/fc2/embedding dW at medium LoRA
    batch 8). The dX chain through frozen layers is kept automatically."""
    from flax import traverse_util

    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(mask)
    train = {k: v for k, v in flat_p.items() if flat_m[k]}
    frozen = {k: v for k, v in flat_p.items() if not flat_m[k]}
    return train, frozen


def join_split(train: dict, frozen: dict) -> Any:
    """Inverse of ``split_by_mask``: rebuild the nested param dict."""
    from flax import traverse_util

    return traverse_util.unflatten_dict({**train, **frozen})


def split_trainables(params: Any, mode: str) -> Tuple[Any, Any]:
    """(trainable, frozen) partition for ``mode``; frozen is None when the
    whole tree trains."""
    if mode in ("lora", "frozen_backbone"):
        mask = trainable_mask(params, FROZEN_BACKBONE_TRAINABLE)
        return split_by_mask(params, mask)
    return params, None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    mode: str = "full"  # full | lora | frozen_backbone
    optim: OptimConfig = OptimConfig()
    lora: LoraConfig = LoraConfig()
    # ESPnet ``accum_grad``: average grads over k micro-batches before one
    # optimizer update — how the reference's 4-GPU effective batch is
    # reproduced on fewer chips (SURVEY.md §3.1). state.step counts
    # micro-steps; the optimizer applies every k-th.
    accum_grad: int = 1
    # shard parameter/optimizer STORAGE over the mesh data axis (ZeRO-3 /
    # fully-sharded data parallel; parallel/mesh.py params_shardings). XLA
    # all-gathers each layer's weights at use and reduce-scatters grads —
    # the capacity mode for full-FT whisper-medium, whose params + f32 Adam
    # moments exceed one v5e chip's HBM. Numerics are identical to DP.
    fsdp: bool = False


def trainable_mask(params: Any, pattern: str) -> Any:
    regex = re.compile(pattern)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, _ in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out.append(bool(regex.match(path)))
    return jax.tree_util.tree_unflatten(treedef, out)


def create_train_state(
    rng: jax.Array,
    variables: Any,
    cfg: TrainConfig = TrainConfig(),
) -> Tuple[TrainState, optax.GradientTransformation]:
    """``variables`` is the model.init output ({"params": ..., "buffers":
    ...}) or a bare param tree (no non-trainable collections)."""
    variables = dict(variables)
    if "params" in variables:
        params = variables.pop("params")
        buffers = variables
    else:  # bare param tree
        params, buffers = variables, {}
    # lora / frozen_backbone optimize a SPLIT trainable subtree (LoRA
    # factors and/or the newly-initialized TS modules — qformer, heads,
    # adapters, which must train or the speaker-prompt path stays frozen at
    # random init; reference lora_qkvo_r16 semantics, README.md:55). The
    # frozen leaves never enter the optimizer or the grad computation
    # (split_by_mask docstring), so no update mask is needed.
    if cfg.mode == "lora":
        lora = init_lora(rng, params, cfg.lora)
        train_p, _ = split_trainables(params, cfg.mode)
        tx = make_optimizer(cfg.optim)
        trainables_init = {"lora": lora, "params": train_p}
    elif cfg.mode == "frozen_backbone":
        lora = {}
        train_p, _ = split_trainables(params, cfg.mode)
        tx = make_optimizer(cfg.optim)
        trainables_init = train_p
    else:
        lora = {}
        tx = make_optimizer(cfg.optim)
        trainables_init = params
    if cfg.accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_grad)
    opt_state = tx.init(trainables_init)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, buffers=buffers,
        lora=lora, opt_state=opt_state,
    )
    return state, tx


def make_train_step(
    model: Any,  # TSASRModel (flax module)
    tx: optax.GradientTransformation,
    cfg: TrainConfig = TrainConfig(),
    donate: bool = True,
    state_shardings: Optional[TrainState] = None,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted step. Sharding is input-driven: place state/batch
    with place_train_step/place_batch on a mesh and jit propagates — XLA lays
    the batch over DATA and (optionally) tensors over MODEL.

    ``state_shardings`` (a TrainState of NamedShardings, from
    ``train_state_shardings``) pins the OUTPUT state's placement. Without it
    XLA may un-shard individual leaves during propagation — harmless for
    plain DP/TP (storage is replicated anyway) but fatal for FSDP, whose
    whole point is that full param/moment storage never materializes on one
    chip."""

    def loss_fn(trainables, frozen, state, batch, rng, epoch):
        # ``frozen`` rides as a NON-differentiated argument: XLA drops the
        # dW work of every frozen kernel (split_by_mask docstring)
        if cfg.mode == "lora":
            params = join_split(trainables["params"], frozen)
            params = merge_lora(params, trainables["lora"], cfg.lora)
        elif cfg.mode == "frozen_backbone":
            params = join_split(trainables, frozen)
        else:
            params = trainables
        loss, stats = model.apply(
            {"params": params, **state.buffers}, batch, rng, epoch, train=True
        )
        return loss, stats

    def step_fn(state: TrainState, batch, rng, epoch):
        train_p, frozen = split_trainables(state.params, cfg.mode)
        if cfg.mode == "lora":
            trainables = {"lora": state.lora, "params": train_p}
        else:
            trainables = train_p
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainables, frozen, state, batch, rng, epoch
        )
        updates, new_opt = tx.update(grads, state.opt_state, trainables)
        new_trainables = optax.apply_updates(trainables, updates)
        stats = dict(stats)
        stats["grad_norm"] = optax.global_norm(grads)
        if cfg.mode == "lora":
            state = state.replace(
                step=state.step + 1,
                lora=new_trainables["lora"],
                params=join_split(new_trainables["params"], frozen),
                opt_state=new_opt,
            )
        elif cfg.mode == "frozen_backbone":
            state = state.replace(
                step=state.step + 1,
                params=join_split(new_trainables, frozen),
                opt_state=new_opt,
            )
        else:
            state = state.replace(
                step=state.step + 1, params=new_trainables, opt_state=new_opt
            )
        if state_shardings is not None:
            state = jax.lax.with_sharding_constraint(state, state_shardings)
        return state, stats

    # Sharding is input-driven: place state/batch with place_train_state /
    # place_batch and jit propagates. No per-mesh recompile logic needed here.
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def train_state_shardings(
    mesh: Mesh,
    state: TrainState,
    tp: bool = True,
    fsdp: bool = False,
    fsdp_min_elems: int = 2**15,
) -> TrainState:
    """A TrainState of NamedShardings mirroring ``state``: params (and their
    optimizer moments, which mirror the param tree) per the TP/FSDP rules,
    everything else replicated. Feed to ``jax.device_put`` (placement) and
    ``make_train_step(state_shardings=...)`` (output pinning)."""
    p_sh = params_shardings(
        mesh, state.params, tp=tp, fsdp=fsdp, fsdp_min_elems=fsdp_min_elems
    )
    rep = replicated(mesh)

    def rep_tree(subtree: Any) -> Any:
        return jax.tree_util.tree_map(lambda x: rep, subtree)

    # optax chain state: param-structured subtrees (adam moments mirror the
    # param tree and must share its sharding), the rest replicated
    def opt_sh(subtree: Any) -> Any:
        try:
            same = jax.tree_util.tree_structure(
                subtree
            ) == jax.tree_util.tree_structure(state.params)
        except Exception:
            same = False
        if same:
            return p_sh
        if hasattr(subtree, "_fields"):  # NamedTuple optax states
            return type(subtree)(
                **{f: opt_sh(getattr(subtree, f)) for f in subtree._fields}
            )
        if isinstance(subtree, (tuple, list)):
            return type(subtree)(opt_sh(s) for s in subtree)
        return rep_tree(subtree)

    return TrainState(
        step=rep,
        params=p_sh,
        buffers=rep_tree(state.buffers),
        lora=rep_tree(state.lora),
        opt_state=opt_sh(state.opt_state),
    )


def place_train_state(
    mesh: Mesh,
    state: TrainState,
    tp: bool = True,
    fsdp: bool = False,
    fsdp_min_elems: int = 2**15,
) -> TrainState:
    """device_put the state onto the mesh per ``train_state_shardings``."""
    return jax.device_put(
        state,
        train_state_shardings(
            mesh, state, tp=tp, fsdp=fsdp, fsdp_min_elems=fsdp_min_elems
        ),
    )


def place_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put a host batch sharded along DATA."""
    return jax.device_put(batch, batch_shardings(mesh, batch))
