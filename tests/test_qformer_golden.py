"""Golden-numerics test: flax Qformer vs an independent torch oracle.

The oracle re-implements the BLIP-2/LAVIS Qformer math the reference uses
(/root/reference/model/Qformer.py semantics: post-LN residual attention,
Linear word-embedding over continuous features + sinusoid positions, query
tokens prepended, cross-attention on the query slice only, separate
query/text FFNs, (1-m)*-10000 extended masks) in a compact functional style,
weights copied from the flax param tree. Agreement to fp32 tolerance pins the
flax implementation to the reference equations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.models import QFormerAdapter, QformerConfig
from robustsq_whisper_tpu.models.whisper.config import sinusoids

CFG = QformerConfig(
    encoder_width=48,
    hidden_size=32,
    num_attention_heads=4,
    intermediate_size=64,
    num_hidden_layers=2,
    num_query_tokens=3,
    max_position_embeddings=64,
)


def torch_oracle(params, cfg, memory, memory_lens, enroll, enroll_lens):
    import torch
    import torch.nn.functional as F

    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))

    def dense(p, x):
        return x @ t(p["kernel"]) + t(p["bias"])

    def ln(p, x, eps=1e-12):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])

    b, n_enroll, _ = enroll.shape
    nq, h = cfg.num_query_tokens, cfg.num_attention_heads
    hd = cfg.hidden_size // h

    def mha(p, x_q, x_kv, add_mask):
        q = dense(p["query"], x_q)
        k = dense(p["key"], x_kv)
        v = dense(p["value"], x_kv)

        def split(z):
            return z.view(z.shape[0], z.shape[1], h, hd).permute(0, 2, 1, 3)

        s = split(q) @ split(k).transpose(-1, -2) / (hd**0.5)
        if add_mask is not None:
            s = s + add_mask  # (b, 1, 1, kv)
        w = F.softmax(s, dim=-1)
        o = (w @ split(v)).permute(0, 2, 1, 3).reshape(x_q.shape[0], -1, cfg.hidden_size)
        o = dense(p["out"], o)
        return ln(p["ln"], o + x_q)

    def ffn(p, x):
        hdn = F.gelu(dense(p["fc1"], x), approximate="none")
        return ln(p["ln"], dense(p["fc2"], hdn) + x)

    mem_t, enr_t = t(memory), t(enroll)
    pos = t(sinusoids(cfg.max_position_embeddings, cfg.hidden_size))[:n_enroll]
    e = dense(params["word_embeddings"], enr_t) + pos
    q = t(params["query_tokens"]).expand(b, nq, cfg.hidden_size)
    x = ln(params["emb_ln"], torch.cat([q, e], dim=1))

    def key_mask(lens, n, lead_valid=0):
        idx = torch.arange(n)
        m = torch.zeros(b, n)
        for i in range(b):
            # queries (first lead_valid slots) always valid; tail masked
            m[i] = torch.where(
                (idx < lead_valid) | (idx - lead_valid < int(lens[i])),
                torch.zeros(n), torch.full((n,), -10000.0),
            )
        return m[:, None, None, :]

    self_mask = key_mask(enroll_lens, nq + n_enroll, lead_valid=nq)
    mem_mask = key_mask(memory_lens, memory.shape[1], lead_valid=0)

    for i in range(cfg.num_hidden_layers):
        lp = params[f"layers_{i}"]
        x = mha(lp["attention"], x, x, self_mask)
        qp, ep = x[:, :nq], x[:, nq:]
        qp = mha(lp["crossattention"], qp, mem_t, mem_mask)
        qp = ffn(lp["ffn_query"], qp)
        ep = ffn(lp["ffn"], ep)
        x = torch.cat([qp, ep], dim=1)
    return x[:, :nq].numpy(), x[:, nq:].numpy()


@pytest.mark.slow
def test_qformer_matches_torch_oracle():
    rng = np.random.default_rng(0)
    memory = rng.standard_normal((2, 9, 48)).astype(np.float32)
    enroll = rng.standard_normal((2, 7, 48)).astype(np.float32)
    memory_lens = np.asarray([9, 6])
    enroll_lens = np.asarray([7, 4])

    adapter = QFormerAdapter(CFG)
    variables = adapter.init(
        jax.random.PRNGKey(0),
        jnp.asarray(memory), jnp.asarray(memory_lens),
        jnp.asarray(enroll), jnp.asarray(enroll_lens),
    )
    q_flax, e_flax = adapter.apply(
        variables,
        jnp.asarray(memory), jnp.asarray(memory_lens),
        jnp.asarray(enroll), jnp.asarray(enroll_lens),
    )

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    q_ref, e_ref = torch_oracle(
        params, CFG, memory, memory_lens, enroll, enroll_lens
    )
    np.testing.assert_allclose(np.asarray(q_flax), q_ref, rtol=2e-4, atol=2e-4)
    # enroll outputs: only valid positions are required to match
    for i, L in enumerate(enroll_lens):
        np.testing.assert_allclose(
            np.asarray(e_flax)[i, :L], e_ref[i, :L], rtol=2e-4, atol=2e-4
        )
