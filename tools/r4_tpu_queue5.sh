#!/bin/bash
set -u
cd /root/repo
REC=experiments/bench_r4_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r4_queue5_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r4_queue5_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run vf_headline     python -u bench.py --scenario epoch
run vf_penn94       python -u bench.py --scenario epoch_penn94
run vf_penn94_pp    python -u bench.py --scenario epoch_penn94_pp
run vf_arxiv_year   python -u bench.py --scenario epoch_arxiv_year
run vf_genius       python -u bench.py --scenario epoch_genius
run vf_powerlaw     python -u bench.py --scenario epoch_powerlaw
run vf_banded       python -u bench.py --scenario epoch_banded
echo "=== 3-config gemm parity (final code)  $(date +%T) ==="
python -u tools/bf16_parity_probe.py --hoist --gemm > /tmp/r4_parity_final.log 2>&1
echo "parity rc=$?"
run vf_wiki         python -u bench.py --scenario epoch_wiki
echo "=== done $(date +%T) ==="
