"""LoRA as a functional weight-space transform.

The reference names a LoRA config the framework must support —
``train_tsasr_whisper_medium_lora_qkvo_r16_.yaml``: rank-16 adapters on the
attention q/k/v/o projections (/root/reference/README.md:55, SURVEY.md §2.5).

TPU-first design: instead of swapping module classes, LoRA lives as a second
param tree of (A, B) factors keyed by the target kernels' tree paths. The
effective weights ``W + scale * (A @ B)`` are materialized *inside* the
compiled step (two small MXU matmuls per target, fused by XLA into the
surrounding graph), so the base model code is untouched and the same
checkpoint format serves full-FT and LoRA runs.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = r".*(attn|cross_attn|attention|crossattention)/(query|key|value|out)/kernel$"


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 16
    alpha: float = 32.0
    targets: str = DEFAULT_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for kp, leaf in flat:
        yield "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp), leaf


def init_lora(
    rng: jax.Array, params: Any, cfg: LoraConfig = LoraConfig()
) -> Dict[str, Dict[str, jax.Array]]:
    """Create {path: {"a": (..., in, r) normal-init, "b": (..., r, out) zeros}}.

    Handles both plain (in, out) kernels and scan-stacked (layers, in, out)
    kernels — the default model stacks per-layer params (modules.py
    scan_layers), so a 2-D-only filter would silently skip every Whisper
    attention projection and adapt only the Qformer.
    """
    pattern = re.compile(cfg.targets)
    out: Dict[str, Dict[str, jax.Array]] = {}
    for path, leaf in _paths(params):
        ndim = getattr(leaf, "ndim", 0)
        if pattern.match(path) and ndim in (2, 3):
            rng, sub = jax.random.split(rng)
            *lead, fan_in, fan_out = leaf.shape
            out[path] = {
                "a": jax.random.normal(
                    sub, (*lead, fan_in, cfg.rank), jnp.float32
                )
                * (1.0 / fan_in**0.5),
                "b": jnp.zeros((*lead, cfg.rank, fan_out), jnp.float32),
            }
    return out


def merge_lora(
    params: Any, lora: Dict[str, Dict[str, jax.Array]], cfg: LoraConfig = LoraConfig()
) -> Any:
    """Return params with ``W + scale * A@B`` at each adapted path (pure)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    merged = []
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        if path in lora:
            ab = lora[path]
            # @ batches over leading (layer) dims for scan-stacked kernels
            delta = jnp.matmul(ab["a"], ab["b"]) * cfg.scale
            merged.append(leaf + delta.astype(leaf.dtype))
        else:
            merged.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, merged)


def fold_lora(
    params: Any, lora: Dict[str, Dict[str, jax.Array]], cfg: LoraConfig = LoraConfig()
) -> Any:
    """Permanently bake adapters into the weights (for export/serving)."""
    return merge_lora(params, lora, cfg)
