#!/bin/bash
# Pass 2: re-record scenarios whose floor measurement predated the
# chained-gather fix, plus epoch_wiki with the hoist memory fix.
cd /root/repo
out=experiments/bench_r3_records2.jsonl
: > "$out"
for sc in epoch epoch_powerlaw epoch_banded epoch_penn94 epoch_arxiv_year epoch_wiki; do
  echo "=== $sc ===" >&2
  python -u bench.py --scenario "$sc" >> "$out" 2>>logs/bench_r3b.err
done
echo DONE >&2
