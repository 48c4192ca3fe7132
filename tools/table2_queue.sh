#!/bin/bash
# Sequential TPU queue for Table-2 searches: waits for any existing
# table2 TPU process (pid in $1) to exit, then runs each search solo
# (the chip is shared — two concurrent TPU processes corrupt timings
# and serialize; see CLAUDE.md).
set -u
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() {
  local dataset="$1" model="$2" extra="${3:-}"
  echo "=== $(date +%H:%M:%S) table2 $model $dataset $extra ==="
  # shellcheck disable=SC2086
  python -u tools/table2_search.py --dataset "$dataset" --model "$model" \
    $extra >> "logs/table2_${model}_${dataset}_tpu.log" 2>&1
}
run cora acmgcn
run citeseer acmgcn
run squirrel acmgcnpp
run cora acmgcnp
run citeseer acmgcnp
echo "=== queue done $(date +%H:%M:%S) ==="
