#!/bin/bash
set -u
cd /root/repo
REC=experiments/bench_r4_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r4_queue2_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r4_queue2_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run genius_batched_auc  python -u bench.py --scenario epoch_genius
python -u tools/residual_profile.py --scenario epoch        > /tmp/r4_profile_epoch2.log 2>&1
echo "profile epoch rc=$?"
python -u tools/residual_profile.py --scenario epoch_genius > /tmp/r4_profile_genius2.log 2>&1
echo "profile genius rc=$?"
python -u tools/residual_profile.py --scenario epoch_penn94_pp > /tmp/r4_profile_penn94pp.log 2>&1
echo "profile penn94_pp rc=$?"
echo "=== done $(date +%T) ==="
