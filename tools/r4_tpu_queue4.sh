#!/bin/bash
set -u
cd /root/repo
REC=experiments/bench_r4_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r4_queue4_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r4_queue4_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run final_headline     python -u bench.py --scenario epoch
run final_arxiv_year   python -u bench.py --scenario epoch_arxiv_year
run final_genius       python -u bench.py --scenario epoch_genius
run final_penn94       python -u bench.py --scenario epoch_penn94
run final_penn94_pp    python -u bench.py --scenario epoch_penn94_pp
run final_powerlaw     python -u bench.py --scenario epoch_powerlaw
run final_banded       python -u bench.py --scenario epoch_banded
python -u tools/residual_profile.py --scenario epoch > /tmp/r4_profile_epoch_final.log 2>&1
echo "profile rc=$?"
echo "=== extended gemm parity  $(date +%T) ==="
python -u tools/bf16_parity_probe.py --extended --hoist --gemm > /tmp/r4_gemm_parity_ext.log 2>&1
echo "parity ext rc=$?"
echo "=== done $(date +%T) ==="
