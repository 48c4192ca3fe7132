#!/bin/bash
set -u
cd /root/repo
REC=experiments/bench_r4_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r4_queue3_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r4_queue3_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run headline_unroll       python -u bench.py --scenario epoch
run headline_unroll_rep2  python -u bench.py --scenario epoch
run arxiv_year_v2         python -u bench.py --scenario epoch_arxiv_year
run genius_v2             python -u bench.py --scenario epoch_genius
run penn94_bf16gemm_v2    env ACMGNN_BENCH_GEMM=bfloat16 python -u bench.py --scenario epoch_penn94
run penn94_pp_bf16gemm_v2 env ACMGNN_BENCH_GEMM=bfloat16 python -u bench.py --scenario epoch_penn94_pp
run powerlaw_v2           python -u bench.py --scenario epoch_powerlaw
run banded_v2             python -u bench.py --scenario epoch_banded
echo "=== gemm parity probe  $(date +%T) ==="
python -u tools/bf16_parity_probe.py --hoist --gemm > /tmp/r4_gemm_parity.log 2>&1
echo "parity rc=$?"
echo "=== done $(date +%T) ==="
