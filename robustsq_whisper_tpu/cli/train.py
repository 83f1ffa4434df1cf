"""Training CLI — the stage-11 equivalent of the reference recipe
(/root/reference/run_tswhisper.sh:37-61 -> asr_my.sh --stage 11 ->
espnet2.bin.asr_train).

Usage::

    python -m robustsq_whisper_tpu.cli.train \
        --config conf/tswhisper/train_tsasr_whisper_medium_full_con20_q16_l2_crop10_lr5e-5.yaml \
        --train_dir dump/raw/train_100_sglspk \
        --expdir exp/tswhisper [--n_model 1] [--pretrained whisper.pt]
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_model_and_variables(exp, rng, pretrained=None, dev_batch=None):
    import jax
    import jax.numpy as jnp

    from ..models import TSASRModel
    from ..models.whisper import load as wload

    dims = exp.resolved_dims()
    dtype = jnp.bfloat16 if exp.compute_dtype == "bfloat16" else jnp.float32
    model = TSASRModel(dims, exp.ts, exp.model, dtype=dtype)
    # jit the init: eager flax init dispatches every param's op individually
    # — thousands of ~30 ms round trips on a tunneled TPU (minutes for
    # medium); one compiled program brings it to ~1 min
    dev_batch = {
        k: jnp.asarray(v) for k, v in dev_batch.items()
    }
    variables = jax.jit(
        lambda r: model.init(r, dev_batch, r, 0, train=False)
    )(rng)
    if pretrained:
        _, enc_p, dec_p = wload.load_openai_checkpoint(pretrained)
        if exp.ts.enroll_type == "embedding":
            # the embedding-enrollment encoder patches block 0 individually
            # and therefore runs unrolled (scan_layers=False) — its params
            # live under blocks_{i}, not the scan-stacked "block" subtree.
            # The decoder stays scan-stacked either way.
            enc_p = wload.unstack_blocks(enc_p, dims.n_audio_layer)
        dec_p = wload.adapt_vocab(dec_p, exp.model.vocab_size)
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        p = dict(variables["params"])
        enc_tree = dict(p["encoder"])
        enc_tree["encoder"] = enc_p
        if exp.ts.enroll_type == "embedding" and exp.ts.adapter_method == "cln":
            # conditional layernorm starts as the PRETRAINED block-0
            # layernorm (+ zero-init delta heads): init_weight/init_bias from
            # attn_ln/mlp_ln, reference whisper_encoder.py:234-253
            b0 = enc_p["blocks_0"]
            for cln_name, ln_name in (
                ("attn_cln", "attn_ln"), ("mlp_cln", "mlp_ln"),
            ):
                cln = dict(enc_tree[cln_name])
                cln["scale"] = b0[ln_name]["scale"].copy()
                cln["bias"] = b0[ln_name]["bias"].copy()
                enc_tree[cln_name] = cln
        p["encoder"] = enc_tree
        dec_tree = dict(p["decoder"])
        dec_tree["decoder"] = dec_p
        p["decoder"] = dec_tree
        variables = {**variables, "params": p}
    return model, variables


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--valid_dir", default=None,
                        help="validation data dir; enables the per-epoch "
                        "eval pass, n-best tracking and the averaged 'ave' "
                        "checkpoint (ESPnet --valid_set semantics)")
    parser.add_argument("--nbest", type=int, default=5,
                        help="checkpoints kept+averaged by valid acc")
    parser.add_argument("--patience", type=int, default=0,
                        help="early-stop epochs without a new best (0=off)")
    parser.add_argument("--valid_wer_utts", type=int, default=0,
                        help="per-epoch greedy-decode WER on this many valid "
                        "utterances (the stage-12 metric; reported as "
                        "valid.wer). 0 = off")
    parser.add_argument("--expdir", required=True)
    parser.add_argument("--pretrained", default=None,
                        help="OpenAI whisper .pt checkpoint to warm-start from")
    parser.add_argument("--tokenizer_assets", default=None)
    parser.add_argument("--n_data", type=int, default=None,
                        help="data-parallel mesh size (default: all devices)")
    parser.add_argument("--n_model", type=int, default=1,
                        help="tensor-parallel mesh size")
    parser.add_argument("--fsdp", default=None,
                        help="true/false: shard param+optimizer storage over "
                        "the data axis (ZeRO-3; capacity mode for full-FT "
                        "medium). Overrides the config's train_conf.fsdp")
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--enroll_type", default=None,
                        choices=["audio", "embedding"],
                        help="enrollment modality (asr_my.sh --enroll_type): "
                        "audio = Qformer on enrollment waveform; embedding = "
                        "precomputed stage-103 speaker embeddings via the "
                        "block-0 SpkAdapter/CLN encoder. Overrides the "
                        "config's encoder_conf.enroll_type")
    parser.add_argument("--enroll_prefix", default=None,
                        help="embedding scp basename in the data dir "
                        "(default resnet -> resnet.scp; asr_my.sh "
                        "--enroll_prefix)")
    parser.add_argument("--ckpt_every_steps", type=int, default=1000,
                        help="mid-epoch checkpoint cadence in optimizer "
                        "steps (0 disables mid-epoch saves; epoch-end "
                        "saves are governed by --ckpt_every_epochs)")
    parser.add_argument("--ckpt_every_epochs", type=int, default=1,
                        help="epoch-end checkpoint cadence (default 1 = "
                        "every epoch, the ESPnet behavior; raise for "
                        "many-short-epoch runs where the ~10 GB full-FT "
                        "state fetch per save dominates). The last epoch "
                        "always saves; per-epoch saves are forced back on "
                        "when --valid_dir drives n-best selection")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )

    import jax

    from ..data.dataset import KaldiTSDataset
    from ..parallel.mesh import make_mesh
    from ..tokenizer.whisper_tokenizer import load_tokenizer
    from ..train.loop import LoopConfig, run_training
    from ..utils.config import load_experiment

    import dataclasses

    exp = load_experiment(args.config)
    if args.num_epochs is not None:
        exp.num_epochs = args.num_epochs
    if args.batch_size is not None:
        exp.batch_size = args.batch_size
    if args.enroll_type is not None:
        exp.ts = dataclasses.replace(exp.ts, enroll_type=args.enroll_type)
    if args.fsdp is not None:
        from .decode import _str2bool

        exp.train = dataclasses.replace(exp.train, fsdp=_str2bool(args.fsdp))

    tokenizer = load_tokenizer(args.tokenizer_assets)
    ds_kwargs = dict(
        speech_seconds=exp.speech_seconds,
        enroll_seconds=exp.enroll_seconds,
        utt_style=exp.utt_style,
        num_speakers=exp.model.num_speakers,
        seed=args.seed,
        enroll_type=exp.ts.enroll_type,
        enroll_prefix=args.enroll_prefix or "resnet",
    )
    dataset = KaldiTSDataset(args.train_dir, tokenizer, **ds_kwargs)
    logging.info("dataset: %d utterances", len(dataset))

    valid_dataset = None
    if args.valid_dir:
        valid_dataset = KaldiTSDataset(args.valid_dir, tokenizer, **ds_kwargs)
        logging.info("valid dataset: %d utterances", len(valid_dataset))

    rng = jax.random.PRNGKey(args.seed)
    first = next(dataset.batches(exp.batch_size, shuffle=False))
    first.pop("utt_ids", None)
    model, variables = build_model_and_variables(
        exp, rng, args.pretrained, dev_batch=first
    )

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(args.n_data, args.n_model)
        logging.info("mesh: %s", dict(mesh.shape))

    lcfg = LoopConfig(
        num_epochs=exp.num_epochs,
        batch_size=exp.batch_size,
        ckpt_dir=f"{args.expdir}/checkpoints",
        nbest=args.nbest,
        patience=args.patience,
        ckpt_every_epochs=max(1, args.ckpt_every_epochs),
        ckpt_every_steps=max(0, args.ckpt_every_steps),
        wer_utts=max(0, args.valid_wer_utts),
        # eval-time WER decodes dense weights, no speculation, attention-only
        # (ValidWer is the greedy parity path; the joint CTC scorer is a
        # stage-12 option, not an eval-loop one)
        wer_decode=dataclasses.replace(
            exp.decode, eot=exp.model.eos, quantize_weights=False,
            speculative_gamma=0, ctc_decode_weight=0.0,
            # reduced-vocab configs cannot start from the full-vocab default
            # sot id (it would clamp-gather an arbitrary embedding row);
            # fall back to the model's own sos like cli/decode does
            init_tokens=exp.decode.init_tokens
            if max(exp.decode.init_tokens) < exp.model.vocab_size
            else (exp.model.sos,),
        ) if args.valid_wer_utts > 0 else None,
    )
    state = run_training(
        model, dataset, variables, exp.train, lcfg, mesh=mesh, rng=rng,
        valid_dataset=valid_dataset,
    )
    logging.info("training done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    sys.exit(main())
