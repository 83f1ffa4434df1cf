"""Training-step tests: full/LoRA/frozen modes + 8-virtual-device DP/TP mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.models import (
    TSASRModel,
    TSEncoderConfig,
    TSModelConfig,
    WhisperDims,
)
from robustsq_whisper_tpu.parallel.mesh import make_mesh
from robustsq_whisper_tpu.train.lora import LoraConfig, init_lora, merge_lora
from robustsq_whisper_tpu.train.optim import OptimConfig
from robustsq_whisper_tpu.train.step import (
    TrainConfig,
    create_train_state,
    make_train_step,
    place_batch,
    place_train_state,
    trainable_mask,
    FROZEN_BACKBONE_TRAINABLE,
)

DIMS = WhisperDims(
    n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_text_ctx=32, n_text_state=32,
    n_text_head=2, n_text_layer=1,
)
TS = TSEncoderConfig(
    num_query_tokens=2, num_hidden_layers=1, qformer_hidden_size=32,
    qformer_heads=2, qformer_intermediate_size=64,
)
CFG = TSModelConfig(
    vocab_size=64, sos=1, eos=2, startofprev=3, num_speakers=8,
    num_negatives=2,
)


def _model():
    return TSASRModel(DIMS, TS, CFG)


def _batch(b=4):
    rng = np.random.default_rng(0)
    samples = DIMS.n_audio_ctx * 2 * 160
    neg = np.where(np.eye(b) > 0, -10000.0, 1.0).astype(np.float32)
    return {
        "speech": jnp.asarray(rng.standard_normal((b, samples)) * 0.05, jnp.float32),
        "speech_lens": jnp.full((b,), samples, jnp.int32),
        "enroll": jnp.asarray(
            rng.standard_normal((b, samples // 2)) * 0.05, jnp.float32
        ),
        "enroll_lens": jnp.full((b,), samples // 2, jnp.int32),
        "text": jnp.asarray(rng.integers(4, 60, (b, 6)), jnp.int32),
        "text_lens": jnp.full((b,), 6, jnp.int32),
        "neg_logits": jnp.asarray(neg),
        "spk_labels": jnp.asarray(rng.integers(0, 8, (b,)), jnp.int32),
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = _model()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, batch, rng, 0, train=False)
    return model, params, batch


def test_full_train_step_descends(model_and_params):
    model, params, batch = model_and_params
    rng = jax.random.PRNGKey(1)
    tcfg = TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant"))
    state, tx = create_train_state(rng, params, tcfg)
    step = make_train_step(model, tx, tcfg, donate=False)
    losses = []
    for i in range(4):
        state, stats = step(state, batch, jax.random.fold_in(rng, i), 0)
        losses.append(float(stats["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 4
    assert losses[-1] < losses[0], losses


def test_lora_mode_trains_only_adapters(model_and_params):
    model, params, batch = model_and_params
    rng = jax.random.PRNGKey(2)
    tcfg = TrainConfig(
        mode="lora",
        optim=OptimConfig(lr=1e-3, schedule="constant"),
        lora=LoraConfig(rank=2),
    )
    state, tx = create_train_state(rng, params, tcfg)
    assert len(state.lora) > 0
    # every target is q/k/v/out kernel
    for path in state.lora:
        assert path.endswith("/kernel")
    step = make_train_step(model, tx, tcfg, donate=False)
    old_params = jax.device_get(state.params)
    state, stats = step(state, batch, rng, 0)
    assert np.isfinite(float(stats["loss"]))
    # base params untouched
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        old_params,
        jax.device_get(state.params),
    )
    # lora B updated away from zero somewhere
    moved = any(
        float(jnp.abs(ab["b"]).max()) > 0 for ab in jax.tree_util.tree_leaves(
            {k: v for k, v in state.lora.items()}
        ) if False
    ) or any(float(jnp.abs(v["b"]).max()) > 0 for v in state.lora.values())
    assert moved


def test_lora_merge_is_identity_at_init(model_and_params):
    model, params, _ = model_and_params
    lora = init_lora(jax.random.PRNGKey(0), params, LoraConfig(rank=2))
    merged = merge_lora(params, lora, LoraConfig(rank=2))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        merged,
    )


def test_frozen_backbone_mask(model_and_params):
    _, params, _ = model_and_params
    mask = trainable_mask(params["params"], FROZEN_BACKBONE_TRAINABLE)
    flat, _ = jax.tree_util.tree_flatten_with_path(mask)
    paths = {
        "/".join(str(getattr(k, "key", k)) for k in kp): v for kp, v in flat
    }
    assert any(v for p, v in paths.items() if "qformer" in p)
    assert any(v for p, v in paths.items() if p.startswith("ctc"))
    assert not any(
        v for p, v in paths.items() if "encoder/encoder/blocks_0" in p
    )


@pytest.mark.slow
def test_multichip_dp_tp_step():
    """DP x TP on the 8-virtual-CPU mesh: one full train step, finite loss,
    and numerics matching the single-device step."""
    assert len(jax.devices()) >= 8
    model = _model()
    batch = _batch(8)
    rng = jax.random.PRNGKey(3)
    params = model.init(rng, batch, rng, 0, train=False)
    tcfg = TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant"))

    # single-device reference
    state1, tx1 = create_train_state(rng, params, tcfg)
    step1 = make_train_step(model, tx1, tcfg, donate=False)
    _, stats1 = step1(state1, batch, rng, 0)

    mesh = make_mesh(4, 2)
    state2, tx2 = create_train_state(rng, params, tcfg)
    step2 = make_train_step(model, tx2, tcfg, donate=False)
    with jax.sharding.set_mesh(mesh):
        state2 = place_train_state(mesh, state2)
        sbatch = place_batch(mesh, batch)
        state2, stats2 = step2(state2, sbatch, rng, 0)
    assert np.isfinite(float(stats2["loss"]))
    np.testing.assert_allclose(
        float(stats1["loss"]), float(stats2["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(stats1["grad_norm"]), float(stats2["grad_norm"]), rtol=1e-3
    )


def test_remat_matches_no_remat(model_and_params):
    """remat must change memory behavior only, not numerics."""
    from robustsq_whisper_tpu.models import TSASRModel, TSEncoderConfig
    import dataclasses as dc

    model, variables, batch = model_and_params
    ts_r = dc.replace(TS, remat=True)
    model_r = TSASRModel(DIMS, ts_r, CFG)
    rng = jax.random.PRNGKey(7)

    def loss(m, v):
        l, _ = m.apply(v, batch, rng, 0, train=True)
        return l

    l0 = float(loss(model, variables))
    l1 = float(loss(model_r, variables))
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    g0 = jax.grad(lambda v: loss(model, v))(variables)["params"]
    g1 = jax.grad(lambda v: loss(model_r, v))(variables)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g0, g1,
    )


@pytest.mark.slow
def test_run_training_on_mesh(tmp_path):
    """The epoch loop drives the jitted step over a DP x TP mesh (the
    multi-host-shaped path of cli.train --n_model)."""
    from robustsq_whisper_tpu.train.loop import LoopConfig, run_training

    model = _model()
    batch = _batch(8)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, batch, rng, 0, train=False)

    class OneBatch:
        def batches(self, batch_size, shuffle=True, drop_last=True):
            yield dict(batch)

    mesh = make_mesh(4, 2)
    state = run_training(
        model, OneBatch(), variables,
        TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant")),
        LoopConfig(num_epochs=2, batch_size=8, log_every=1,
                   ckpt_dir=str(tmp_path / "ck")),
        mesh=mesh, rng=rng,
    )
    assert int(state.step) == 2
