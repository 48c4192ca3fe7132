#!/bin/bash
# Round-5 TPU measurement queue 1: re-record the bench suite on the
# final r5 code (fused batched attention LayerNorm, floor model v2 with
# measured eval terms).  Strictly solo on the shared chip (CLAUDE.md).
# Each line appends its JSON record to experiments/bench_r5_records.jsonl.
set -u
cd /root/repo
REC=experiments/bench_r5_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r5_queue_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r5_queue_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run r5_penn94_pp       python -u bench.py --scenario epoch_penn94_pp
run r5_penn94_pp_lnmod env ACMGNN_LN_FUSED=0 python -u bench.py --scenario epoch_penn94_pp
run r5_headline        python -u bench.py --scenario epoch
run r5_penn94          python -u bench.py --scenario epoch_penn94
run r5_arxiv_year      python -u bench.py --scenario epoch_arxiv_year
run r5_genius          python -u bench.py --scenario epoch_genius
run r5_powerlaw        python -u bench.py --scenario epoch_powerlaw
run r5_banded          python -u bench.py --scenario epoch_banded
echo "=== done $(date +%T) ==="
