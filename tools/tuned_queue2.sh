#!/bin/bash
# Second solo-TPU queue: after the given pid exits, run the fixed-split
# ACM-GCN+/++ tuned cells for the TPU datasets.
set -u
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== $(date +%H:%M:%S) tuned fixed GCN+/++ (TPU datasets) ==="
python -u tools/tuned_run.py --protocol fixed \
  --models acmgcnp,acmgcnp_v1,acmgcnpp,acmgcnpp_v1 \
  --datasets film,squirrel,cora,citeseer \
  >> logs/tuned_fixed_gcnp_tpu.log 2>&1
echo "=== queue2 done $(date +%H:%M:%S) ==="
