#!/bin/bash
# Solo-TPU queue: wait for the given pid, then run the tuned-parity
# batches sequentially (one TPU process at a time — shared chip).
set -u
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== $(date +%H:%M:%S) tuned random (TPU datasets) ==="
python -u tools/tuned_run.py --protocol random \
  --datasets film,squirrel,cora,citeseer \
  >> logs/tuned_random_tpu.log 2>&1
echo "=== $(date +%H:%M:%S) tuned fixed (TPU datasets) ==="
python -u tools/tuned_run.py --protocol fixed \
  --datasets film,squirrel,cora,citeseer \
  >> logs/tuned_fixed_tpu.log 2>&1
echo "=== queue done $(date +%H:%M:%S) ==="
