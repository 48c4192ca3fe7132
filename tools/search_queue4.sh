#!/bin/bash
# Remainder of queue3 (paused for the packed-gather probe + LINKX-scale
# benches): random-split ACM-GCN+ searches for the TPU datasets.
set -u
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) table2_search $* ==="
  python -u tools/table2_search.py "$@" >> logs/search_queue3.log 2>&1
}
run --dataset citeseer --model acmgcnp
run --dataset cora --model acmgcnp
run --dataset film --model acmgcnp
echo "=== queue4 done $(date +%H:%M:%S) ==="
