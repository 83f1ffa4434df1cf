#!/usr/bin/env bash
# Staged TS-Whisper recipe driver — flag- and stage-compatible with the
# reference recipe (/root/reference/run_tswhisper.sh): stage 11 = train,
# stage 12 = decode, plus the data-prep stages the reference delegates to
# datapre/data.sh (1..103). The CUDA/cuDNN environment surgery of the
# reference (run_tswhisper.sh:25-34) has no TPU equivalent — XLA needs no
# library-path hacks.
set -e
set -u
set -o pipefail

stage=11
stop_stage=12
train_set="train_100_sglspk"
valid_set="dev_sglspk"
test_sets="dev_sglspk test_sglspk"
dumpdir=dump/raw
expdir=exp/tswhisper
asr_config=conf/tswhisper/train_tsasr_whisper_medium_full_con20_q16_l2_crop10_lr5e-5.yaml
inference_config=conf/tswhisper/decode_asr_whisper_beam1.yaml
pretrained=""            # OpenAI whisper .pt to warm-start from
tokenizer_assets=""      # local tiktoken/vocab files
n_model=1                # tensor-parallel axis size
fsdp=""                  # true: ZeRO-3 param/optimizer storage sharding
batch_size=""
num_epochs=""
lang=en
enroll_type=""           # audio | embedding (asr_my.sh --enroll_type)
enroll_prefix=""         # embedding scp basename, default resnet
train_args=""            # extra cli.train flags (reference asr_args pattern)
inference_args=""        # extra cli.decode flags (reference inference_args,
                         # run_tswhisper.sh:20)

# data-prep knobs
src_dir=""               # clean single-speaker dir for stage 101
noise_dir=""             # WHAM!-style noise wavs for stage 102
num_mixtures=1000

log() { echo -e "$(date '+%Y-%m-%dT%H:%M:%S') ($(basename "$0"):${BASH_LINENO[0]}) $*"; }

# --name value flag parsing (utils/parse_options.sh equivalent)
while [ $# -gt 0 ]; do
  case "$1" in
    --*) name="${1#--}"; name="${name//-/_}"
         eval "${name}=\"\$2\""; shift 2 ;;
    *) echo "unknown argument: $1" >&2; exit 1 ;;
  esac
done

PY=${PYTHON:-python}

if [ "${stage}" -le 101 ] && [ "${stop_stage}" -ge 101 ]; then
  [ -n "${src_dir}" ] || { echo "--src_dir required for stage 101"; exit 1; }
  log "stage 101: overlap-enrollment simulation (SIR mix)"
  ${PY} -m robustsq_whisper_tpu.cli.datapre overlap \
    --src_dir "${src_dir}" --out_dir "${dumpdir}/${train_set}" \
    --num_mixtures "${num_mixtures}"
  ${PY} -m robustsq_whisper_tpu.cli.datapre num-samples "${dumpdir}/${train_set}"
  ${PY} -m robustsq_whisper_tpu.cli.datapre fix "${dumpdir}/${train_set}"
  ${PY} -m robustsq_whisper_tpu.cli.datapre validate "${dumpdir}/${train_set}"
fi

if [ "${stage}" -le 102 ] && [ "${stop_stage}" -ge 102 ] && [ -n "${noise_dir}" ]; then
  log "stage 102: WHAM! noise injection (SNR)"
  ${PY} -m robustsq_whisper_tpu.cli.datapre wham \
    --clean_dir "${dumpdir}/${train_set}" --noise_dir "${noise_dir}" \
    --out_dir "${dumpdir}/${train_set}_noisy"
fi

if [ "${stage}" -le 103 ] && [ "${stop_stage}" -ge 103 ] && [ "${stage}" -ge 103 ]; then
  # one resnet.scp per set, like the reference's three extraction calls
  # (reference datapre/data.sh:302-326: dev/test eval-mode, train train-mode)
  for eset in ${train_set} ${test_sets}; do
    [ -d "${dumpdir}/${eset}" ] || continue
    log "stage 103: speaker-embedding extraction (${eset})"
    ${PY} -m robustsq_whisper_tpu.cli.datapre spk-embed \
      --data_dir "${dumpdir}/${eset}" \
      --out_dir "${expdir}/spk_embeddings/${eset}"
  done
fi

if [ "${stage}" -le 11 ] && [ "${stop_stage}" -ge 11 ]; then
  log "stage 11: TS-ASR training (${asr_config})"
  # shellcheck disable=SC2086
  # per-epoch validation + n-best averaging when the valid dir exists
  # (reference asr_my.sh --valid_set, run_tswhisper.sh:60-61)
  valid_flag=""
  if [ -n "${valid_set}" ] && [ -d "${dumpdir}/${valid_set}" ]; then
    valid_flag="--valid_dir ${dumpdir}/${valid_set}"
  fi
  ${PY} -m robustsq_whisper_tpu.cli.train \
    --config "${asr_config}" \
    --train_dir "${dumpdir}/${train_set}" \
    ${valid_flag} \
    --expdir "${expdir}" \
    --n_model "${n_model}" \
    ${pretrained:+--pretrained "${pretrained}"} \
    ${tokenizer_assets:+--tokenizer_assets "${tokenizer_assets}"} \
    ${batch_size:+--batch_size "${batch_size}"} \
    ${num_epochs:+--num_epochs "${num_epochs}"} \
    ${enroll_type:+--enroll_type "${enroll_type}"} \
    ${enroll_prefix:+--enroll_prefix "${enroll_prefix}"} \
    ${fsdp:+--fsdp "${fsdp}"} \
    ${train_args}
fi

if [ "${stage}" -le 12 ] && [ "${stop_stage}" -ge 12 ]; then
  for tset in ${test_sets}; do
    log "stage 12: decoding ${tset} (${inference_config})"
    # shellcheck disable=SC2086
    ${PY} -m robustsq_whisper_tpu.cli.decode \
      --config "${asr_config}" \
      --inference_config "${inference_config}" \
      --data_dir "${dumpdir}/${tset}" \
      --expdir "${expdir}" \
      --output_dir "${expdir}/decode_${tset}" \
      --language "${lang}" \
      ${enroll_type:+--enroll_type "${enroll_type}"} \
      ${enroll_prefix:+--enroll_prefix "${enroll_prefix}"} \
      ${tokenizer_assets:+--tokenizer_assets "${tokenizer_assets}"} \
      ${inference_args}
  done
fi

log "done."
