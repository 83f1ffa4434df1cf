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
    variables = model.init(rng, dev_batch, rng, 0, train=False)
    if pretrained:
        _, enc_p, dec_p = wload.load_openai_checkpoint(pretrained)
        dec_p = wload.adapt_vocab(dec_p, exp.model.vocab_size)
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        p = dict(variables["params"])
        enc_tree = dict(p["encoder"])
        enc_tree["encoder"] = enc_p
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

    exp = load_experiment(args.config)
    if args.num_epochs is not None:
        exp.num_epochs = args.num_epochs
    if args.batch_size is not None:
        exp.batch_size = args.batch_size
    if args.fsdp is not None:
        import dataclasses

        from .decode import _str2bool

        exp.train = dataclasses.replace(exp.train, fsdp=_str2bool(args.fsdp))

    tokenizer = load_tokenizer(args.tokenizer_assets)
    dataset = KaldiTSDataset(
        args.train_dir,
        tokenizer,
        speech_seconds=exp.speech_seconds,
        enroll_seconds=exp.enroll_seconds,
        utt_style=exp.utt_style,
        num_speakers=exp.model.num_speakers,
        seed=args.seed,
    )
    logging.info("dataset: %d utterances", len(dataset))

    valid_dataset = None
    if args.valid_dir:
        valid_dataset = KaldiTSDataset(
            args.valid_dir,
            tokenizer,
            speech_seconds=exp.speech_seconds,
            enroll_seconds=exp.enroll_seconds,
            utt_style=exp.utt_style,
            num_speakers=exp.model.num_speakers,
            seed=args.seed,
        )
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
    )
    state = run_training(
        model, dataset, variables, exp.train, lcfg, mesh=mesh, rng=rng,
        valid_dataset=valid_dataset,
    )
    logging.info("training done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    sys.exit(main())
