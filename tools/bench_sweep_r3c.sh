#!/bin/bash
# Pass 3 (final round-3 records): all epoch scenarios with the
# DCE-proof chained floor measurement.
cd /root/repo
out=experiments/bench_r3_records_final.jsonl
: > "$out"
for sc in epoch epoch_powerlaw epoch_banded epoch_penn94 epoch_arxiv_year epoch_genius epoch_penn94_pp epoch_wiki; do
  echo "=== $sc ===" >&2
  python -u bench.py --scenario "$sc" >> "$out" 2>>logs/bench_r3c.err
done
echo DONE >&2
