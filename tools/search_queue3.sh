#!/bin/bash
# Third solo-TPU queue: after the given pid exits, grid-search the
# weakest remaining parity cells (one TPU process at a time).
set -u
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() {
  echo "=== $(date +%H:%M:%S) table2_search $* ==="
  python -u tools/table2_search.py "$@" >> logs/search_queue3.log 2>&1
}
# 1. the one fixed-split cell >1.5 sigma below paper (Table 3 acmgcn/squirrel)
run --dataset squirrel --model acmgcn --fixed_splits 1
# 2-4. random-split ACM-GCN+ cells where the paper-tuned transfer ran 1σ+ low
run --dataset citeseer --model acmgcnp
run --dataset cora --model acmgcnp
run --dataset film --model acmgcnp
echo "=== queue3 done $(date +%H:%M:%S) ==="
