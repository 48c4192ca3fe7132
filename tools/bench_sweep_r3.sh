#!/bin/bash
# Round-3 TPU bench re-record: sequential, solo on the chip.
cd /root/repo
out=experiments/bench_r3_records.jsonl
: > "$out"
for sc in epoch epoch_powerlaw epoch_banded epoch_penn94 epoch_arxiv_year epoch_genius epoch_penn94_pp; do
  echo "=== $sc ===" >&2
  python -u bench.py --scenario "$sc" >> "$out" 2>>logs/bench_r3.err
done
echo "=== epoch_wiki ===" >&2
python -u bench.py --scenario epoch_wiki >> "$out" 2>>logs/bench_r3.err
echo DONE >&2
