#!/bin/bash
# Round-5 TPU queue 3: projected-LN shipping records for the LN-live
# scenarios (clean A/B vs r5_*_v2 = modules form, and the baseline the
# vf090 runs in queue 2 compare against), plus the wiki RCM locality
# A/B.  Strictly solo (CLAUDE.md).
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
echo "=== residual profile penn94_pp (bf16 gemm + proj LN)  $(date +%T) ==="
python -u tools/residual_profile.py --scenario epoch_penn94_pp \
  > /tmp/r5_profile_pp2.log 2>&1
echo "penn94_pp profile rc=$?"
run r5_penn94_pp_proj  python -u bench.py --scenario epoch_penn94_pp
run r5_headline_proj   python -u bench.py --scenario epoch
run r5_wiki            python -u bench.py --scenario epoch_wiki
run r5_wiki_rcm        env ACMGNN_BENCH_REORDER_WIKI=rcm python -u bench.py --scenario epoch_wiki
echo "=== done $(date +%T) ==="
