"""Checkpoint conversion into the flax param trees of modules.py.

Two sources are supported, both offline:

- OpenAI ``whisper`` ``.pt`` checkpoints (the format the reference loads via
  ``whisper.load_model``, /root/reference/model/whisper_encoder.py:58), read
  with torch on CPU.
- HuggingFace ``transformers.WhisperModel`` instances/state dicts (also used
  as the golden-numerics oracle in tests).

Also implements the reference's vocab-size adaptation semantics
(/root/reference/model/whisper_decoder.py:85-105): on mismatch either expand
the tied token embedding with rows drawn from N(mean, std) of the original
table, or reinitialize the whole table the same way.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .config import WhisperDims


def _np(x: Any) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _dense(weight: Any, bias: Any = None) -> Dict[str, np.ndarray]:
    p = {"kernel": _np(weight).T}
    if bias is not None:
        p["bias"] = _np(bias)
    return p


def _ln(weight: Any, bias: Any) -> Dict[str, np.ndarray]:
    return {"scale": _np(weight), "bias": _np(bias)}


def _conv(weight: Any, bias: Any) -> Dict[str, np.ndarray]:
    # torch Conv1d weight (out, in, k) -> flax (k, in, out)
    return {"kernel": _np(weight).transpose(2, 1, 0), "bias": _np(bias)}


def _attn_from(sd: Mapping[str, Any], p: str, names: Tuple[str, str, str, str]) -> Dict:
    q, k, v, o = names
    return {
        "query": _dense(sd[f"{p}.{q}.weight"], sd[f"{p}.{q}.bias"]),
        "key": _dense(sd[f"{p}.{k}.weight"]),
        "value": _dense(sd[f"{p}.{v}.weight"], sd[f"{p}.{v}.bias"]),
        "out": _dense(sd[f"{p}.{o}.weight"], sd[f"{p}.{o}.bias"]),
    }


# ---------------- layer stacking ----------------


def stack_blocks(params: Dict, n_layers: int) -> Dict:
    """Convert per-layer ``blocks_{i}`` subtrees into one ``block`` subtree
    with a leading layer axis on every leaf — the layout of the
    ``nn.scan``-ed stacks in modules.py (scan_layers=True)."""
    import jax

    layers = [params.pop(f"blocks_{i}") for i in range(n_layers)]
    params["block"] = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *layers
    )
    return params


def unstack_blocks(params: Dict, n_layers: int) -> Dict:
    """Inverse of stack_blocks (for scan_layers=False debugging)."""
    import jax

    stacked = params.pop("block")
    for i in range(n_layers):
        params[f"blocks_{i}"] = jax.tree_util.tree_map(
            lambda x: x[i], stacked
        )
    return params


# ---------------- OpenAI whisper checkpoints ----------------


def encoder_params_from_openai(
    sd: Mapping[str, Any], n_layers: int, stack: bool = True
) -> Dict:
    params: Dict[str, Any] = {
        "conv1": _conv(sd["encoder.conv1.weight"], sd["encoder.conv1.bias"]),
        "conv2": _conv(sd["encoder.conv2.weight"], sd["encoder.conv2.bias"]),
        "ln_post": _ln(sd["encoder.ln_post.weight"], sd["encoder.ln_post.bias"]),
    }
    for i in range(n_layers):
        p = f"encoder.blocks.{i}"
        params[f"blocks_{i}"] = {
            "attn_ln": _ln(sd[f"{p}.attn_ln.weight"], sd[f"{p}.attn_ln.bias"]),
            "attn": _attn_from(sd, f"{p}.attn", ("query", "key", "value", "out")),
            "mlp_ln": _ln(sd[f"{p}.mlp_ln.weight"], sd[f"{p}.mlp_ln.bias"]),
            "mlp_fc1": _dense(sd[f"{p}.mlp.0.weight"], sd[f"{p}.mlp.0.bias"]),
            "mlp_fc2": _dense(sd[f"{p}.mlp.2.weight"], sd[f"{p}.mlp.2.bias"]),
        }
    return stack_blocks(params, n_layers) if stack else params


def decoder_params_from_openai(
    sd: Mapping[str, Any], n_layers: int, stack: bool = True
) -> Dict:
    params: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(sd["decoder.token_embedding.weight"])},
        "positional_embedding": _np(sd["decoder.positional_embedding"]),
        "ln": _ln(sd["decoder.ln.weight"], sd["decoder.ln.bias"]),
    }
    for i in range(n_layers):
        p = f"decoder.blocks.{i}"
        params[f"blocks_{i}"] = {
            "attn_ln": _ln(sd[f"{p}.attn_ln.weight"], sd[f"{p}.attn_ln.bias"]),
            "attn": _attn_from(sd, f"{p}.attn", ("query", "key", "value", "out")),
            "cross_attn_ln": _ln(
                sd[f"{p}.cross_attn_ln.weight"], sd[f"{p}.cross_attn_ln.bias"]
            ),
            "cross_attn": _attn_from(
                sd, f"{p}.cross_attn", ("query", "key", "value", "out")
            ),
            "mlp_ln": _ln(sd[f"{p}.mlp_ln.weight"], sd[f"{p}.mlp_ln.bias"]),
            "mlp_fc1": _dense(sd[f"{p}.mlp.0.weight"], sd[f"{p}.mlp.0.bias"]),
            "mlp_fc2": _dense(sd[f"{p}.mlp.2.weight"], sd[f"{p}.mlp.2.bias"]),
        }
    return stack_blocks(params, n_layers) if stack else params


def load_openai_checkpoint(path: str, stack: bool = True) -> Tuple[WhisperDims, Dict, Dict]:
    """Read an OpenAI whisper .pt file -> (dims, encoder_params, decoder_params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims_d = ckpt["dims"] if "dims" in ckpt else {}
    sd = ckpt.get("model_state_dict", ckpt)
    dims = WhisperDims(**{k: v for k, v in dims_d.items() if k in WhisperDims.__dataclass_fields__})
    return (
        dims,
        encoder_params_from_openai(sd, dims.n_audio_layer, stack),
        decoder_params_from_openai(sd, dims.n_text_layer, stack),
    )


# ---------------- HuggingFace transformers ----------------


def encoder_params_from_hf(
    sd: Mapping[str, Any], n_layers: int, stack: bool = True
) -> Dict:
    pre = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    params: Dict[str, Any] = {
        "conv1": _conv(sd[f"{pre}conv1.weight"], sd[f"{pre}conv1.bias"]),
        "conv2": _conv(sd[f"{pre}conv2.weight"], sd[f"{pre}conv2.bias"]),
        "ln_post": _ln(sd[f"{pre}layer_norm.weight"], sd[f"{pre}layer_norm.bias"]),
    }
    for i in range(n_layers):
        p = f"{pre}layers.{i}"
        params[f"blocks_{i}"] = {
            "attn_ln": _ln(
                sd[f"{p}.self_attn_layer_norm.weight"],
                sd[f"{p}.self_attn_layer_norm.bias"],
            ),
            "attn": _attn_from(
                sd, f"{p}.self_attn", ("q_proj", "k_proj", "v_proj", "out_proj")
            ),
            "mlp_ln": _ln(
                sd[f"{p}.final_layer_norm.weight"], sd[f"{p}.final_layer_norm.bias"]
            ),
            "mlp_fc1": _dense(sd[f"{p}.fc1.weight"], sd[f"{p}.fc1.bias"]),
            "mlp_fc2": _dense(sd[f"{p}.fc2.weight"], sd[f"{p}.fc2.bias"]),
        }
    return stack_blocks(params, n_layers) if stack else params


def decoder_params_from_hf(
    sd: Mapping[str, Any], n_layers: int, stack: bool = True
) -> Dict:
    pre = "decoder." if any(k.startswith("decoder.") for k in sd) else ""
    params: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(sd[f"{pre}embed_tokens.weight"])},
        "positional_embedding": _np(sd[f"{pre}embed_positions.weight"]),
        "ln": _ln(sd[f"{pre}layer_norm.weight"], sd[f"{pre}layer_norm.bias"]),
    }
    for i in range(n_layers):
        p = f"{pre}layers.{i}"
        params[f"blocks_{i}"] = {
            "attn_ln": _ln(
                sd[f"{p}.self_attn_layer_norm.weight"],
                sd[f"{p}.self_attn_layer_norm.bias"],
            ),
            "attn": _attn_from(
                sd, f"{p}.self_attn", ("q_proj", "k_proj", "v_proj", "out_proj")
            ),
            "cross_attn_ln": _ln(
                sd[f"{p}.encoder_attn_layer_norm.weight"],
                sd[f"{p}.encoder_attn_layer_norm.bias"],
            ),
            "cross_attn": _attn_from(
                sd, f"{p}.encoder_attn", ("q_proj", "k_proj", "v_proj", "out_proj")
            ),
            "mlp_ln": _ln(
                sd[f"{p}.final_layer_norm.weight"], sd[f"{p}.final_layer_norm.bias"]
            ),
            "mlp_fc1": _dense(sd[f"{p}.fc1.weight"], sd[f"{p}.fc1.bias"]),
            "mlp_fc2": _dense(sd[f"{p}.fc2.weight"], sd[f"{p}.fc2.bias"]),
        }
    return stack_blocks(params, n_layers) if stack else params


# ---------------- vocab adaptation ----------------


def adapt_vocab(
    decoder_params: Dict,
    vocab_size: int,
    load_origin_token_embedding: bool = True,
    seed: int = 0,
) -> Dict:
    """Match the reference's vocab-mismatch handling.

    expand (load_origin_token_embedding=True): keep original rows, append new
    rows drawn from N(mean, std) of the original table
    (ExpandedTokenEmbedding, whisper_decoder.py:11-38). Otherwise reinit the
    whole table from the same distribution (whisper_decoder.py:94-105).
    """
    emb = decoder_params["token_embedding"]["embedding"]
    orig = emb.shape[0]
    if vocab_size == orig:
        return decoder_params
    rng = np.random.default_rng(seed)
    mean, std = float(emb.mean()), float(emb.std())
    if load_origin_token_embedding:
        if vocab_size < orig:
            raise ValueError("expanded vocab_size must exceed the original")
        extra = rng.normal(mean, std, (vocab_size - orig, emb.shape[1])).astype(np.float32)
        new = np.concatenate([emb, extra], axis=0)
    else:
        new = rng.normal(mean, std, (vocab_size, emb.shape[1])).astype(np.float32)
    out = dict(decoder_params)
    out["token_embedding"] = {"embedding": new}
    return out
