#!/bin/bash
# CPU search queue (runs alongside the solo-TPU queue): Table-2
# random-split grid searches for the tiny datasets, one process at a
# time (2-core host).
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS
run() {
  echo "=== $(date +%H:%M:%S) table2_search $* ==="
  python -u tools/table2_search.py "$@" >> logs/search_cpu2.log 2>&1
}
for model in acmgcnp acmgcnpp; do
  for ds in cornell wisconsin texas; do
    run --dataset "$ds" --model "$model"
  done
done
echo "=== cpu queue2 done $(date +%H:%M:%S) ==="
