"""Optimizer and LR schedule factory.

The reference trains with ESPnet's Adam + warmuplr at lr 5e-5 (config name
``..._lr5e-5`` at /root/reference/README.md:53; trainer external to the repo).
Here: optax AdamW with Noam-style warmup (ESPnet ``WarmupLR``) and
global-norm clipping. Parameter freezing is NOT done here — lora /
frozen_backbone modes split the params and differentiate only the
trainable subtree (train/step.py), so the optimizer sees trainables only.
"""

from __future__ import annotations

import dataclasses

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 5e-5
    warmup_steps: int = 1500
    schedule: str = "warmuplr"  # warmuplr | linear | constant
    total_steps: int = 100_000
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.98)
    eps: float = 1e-8
    clip_norm: float = 1.0
    # Storage dtype of Adam's FIRST moment (optax ``mu_dtype``). "bfloat16"
    # halves mu's HBM footprint — the cheap capacity lever for full-FT
    # whisper-medium on one chip (the second moment stays f32: its values
    # span too many orders of magnitude for bf16's 8 mantissa bits, and
    # optax exposes no nu dtype for that reason). The update math still
    # runs in f32; only the carried state is rounded.
    moment_dtype: str = "float32"  # float32 | bfloat16


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.schedule == "warmuplr":
        # ESPnet WarmupLR: lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)
        def sched(step):
            step = jax.numpy.maximum(step, 1).astype(jax.numpy.float32)
            w = float(cfg.warmup_steps)
            return cfg.lr * (w**0.5) * jax.numpy.minimum(
                step**-0.5, step * w**-1.5
            )

        return sched
    if cfg.schedule == "linear":
        return optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return optax.constant_schedule(cfg.lr)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip over the TRAINABLE tree.

    Freezing is not an optimizer concern here: lora/frozen_backbone modes
    partition the params and differentiate only the trainable subtree
    (train/step.py::split_by_mask), so the optimizer never sees frozen
    leaves — the earlier masked-update chain computed (and clipped against)
    full-tree gradients that were then thrown away, ~90 ms/step of dead
    backward work at medium LoRA batch 8."""
    import jax.numpy as jnp

    mu_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.moment_dtype
    ]
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(
            make_schedule(cfg),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mu_dtype=mu_dtype,
        ),
    )
