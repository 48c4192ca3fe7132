#!/bin/bash
# Round-5 TPU queue 2: fresh residual traces at the final config
# (VERDICT r4 items #2 wiki and #4 penn94_pp), the wiki re-record on the
# r5 code (fused LN + shared transpose planes), and the value-free
# re-bucketing A/B (item #6).  Strictly solo (CLAUDE.md).
set -u
cd /root/repo
REC=experiments/bench_r5_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$("$@" 2>/tmp/r5_queue2_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r5_queue2_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run r5_headline_v2      python -u bench.py --scenario epoch
run r5_headline_noshare env ACMGNN_ELL_SHARE_T=0 python -u bench.py --scenario epoch
# re-record with the dispatch-amortized eval floor term (the first cut
# read 110% of floor: solo-call tunnel dispatch inflated the term)
run r5_genius_v2        python -u bench.py --scenario epoch_genius
echo "=== residual profile penn94_pp  $(date +%T) ==="
python -u tools/residual_profile.py --scenario epoch_penn94_pp \
  > /tmp/r5_profile_pp.log 2>&1
echo "penn94_pp profile rc=$?"
echo "=== residual profile wiki  $(date +%T) ==="
python -u tools/residual_profile.py --scenario epoch_wiki \
  > /tmp/r5_profile_wiki.log 2>&1
echo "wiki profile rc=$?"
run r5_wiki            python -u bench.py --scenario epoch_wiki
run r5_penn94_vf090    env ACMGNN_ELL_VF_RATIO=0.90 python -u bench.py --scenario epoch_penn94
run r5_arxiv_vf090     env ACMGNN_ELL_VF_RATIO=0.90 python -u bench.py --scenario epoch_arxiv_year
run r5_headline_vf090  env ACMGNN_ELL_VF_RATIO=0.90 python -u bench.py --scenario epoch
echo "=== done $(date +%T) ==="
