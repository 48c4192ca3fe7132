#!/bin/bash
# Round-4 TPU measurement queue — STRICTLY sequential (shared chip).
# Each line appends its JSON record to experiments/bench_r4_records.jsonl.
# Run from /root/repo:  nohup bash tools/r4_tpu_queue.sh > /tmp/r4_queue.log 2>&1 &
set -u
cd /root/repo
REC=experiments/bench_r4_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r4_queue_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r4_queue_err.log
    echo "{\"label\": \"$label\", \"error\": $rc}" >> "$REC"
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}

run headline              python -u bench.py --scenario epoch
run arxiv_year            python -u bench.py --scenario epoch_arxiv_year
run genius                python -u bench.py --scenario epoch_genius
run penn94_f32gemm        python -u bench.py --scenario epoch_penn94
run penn94_bf16gemm       env ACMGNN_BENCH_GEMM=bfloat16 python -u bench.py --scenario epoch_penn94
run penn94_pp_f32gemm     python -u bench.py --scenario epoch_penn94_pp
run penn94_pp_bf16gemm    env ACMGNN_BENCH_GEMM=bfloat16 python -u bench.py --scenario epoch_penn94_pp
run powerlaw              python -u bench.py --scenario epoch_powerlaw
run banded                python -u bench.py --scenario epoch_banded

echo "=== residual profiles  $(date +%T) ==="
python -u tools/residual_profile.py --scenario epoch        > /tmp/r4_profile_epoch.log 2>&1
echo "profile epoch rc=$?"
python -u tools/residual_profile.py --scenario epoch_genius > /tmp/r4_profile_genius.log 2>&1
echo "profile genius rc=$?"
echo "=== queue done $(date +%T) ==="
