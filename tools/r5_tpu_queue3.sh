#!/bin/bash
# Round-5 TPU queue 3: FINAL shipping-config records — projected LN +
# transpose plane sharing + tightened value-free bucket ratio — plus
# the fresh penn94_pp residual trace at exactly this config and the
# wiki locality A/B.  Strictly solo (CLAUDE.md).
set -u
cd /root/repo
REC=experiments/bench_r5_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r5_queue3_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r5_queue3_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run r5_final_headline   python -u bench.py --scenario epoch
run r5_final_penn94     python -u bench.py --scenario epoch_penn94
run r5_final_penn94_pp  python -u bench.py --scenario epoch_penn94_pp
run r5_final_arxiv_year python -u bench.py --scenario epoch_arxiv_year
run r5_final_genius     python -u bench.py --scenario epoch_genius
run r5_final_powerlaw   python -u bench.py --scenario epoch_powerlaw
run r5_final_banded     python -u bench.py --scenario epoch_banded
echo "=== residual profile penn94_pp (shipping config)  $(date +%T) ==="
python -u tools/residual_profile.py --scenario epoch_penn94_pp \
  > /tmp/r5_profile_pp2.log 2>&1
echo "penn94_pp profile rc=$?"
run r5_final_wiki       python -u bench.py --scenario epoch_wiki
run r5_wiki_rcm         env ACMGNN_BENCH_REORDER_WIKI=rcm python -u bench.py --scenario epoch_wiki
echo "=== done $(date +%T) ==="
