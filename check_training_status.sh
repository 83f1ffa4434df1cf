#!/usr/bin/env bash
# Training monitor — the reference advertises an equivalent script
# (check_training_status.sh, /root/reference/README.md:43, absent from the
# repo). Summarizes an experiment dir: latest checkpoint step, last logged
# metrics, and decode scores if present.
set -e
expdir=${1:-exp/tswhisper}

echo "== experiment: ${expdir}"
if [ -d "${expdir}/checkpoints" ]; then
  latest=$(ls "${expdir}/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  echo "latest checkpoint step: ${latest:-none}"
else
  echo "no checkpoints yet"
fi

for log in "${expdir}"/train.log "${expdir}"/*.log; do
  [ -f "$log" ] || continue
  echo "-- tail of $(basename "$log"):"
  grep -E "epoch [0-9]+ step" "$log" | tail -3 || true
done

for d in "${expdir}"/decode_*; do
  [ -d "$d" ] || continue
  if [ -f "$d/score.txt" ]; then
    echo "-- $(basename "$d"):"
    cat "$d/score.txt"
  fi
done
