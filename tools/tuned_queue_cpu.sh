#!/bin/bash
# CPU follow-up queue: wait for the running random-protocol CPU batch,
# then run the cells it missed (gcnII was added after it started) and
# the fixed-protocol batch for the CPU-fast datasets.
set -u
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS
echo "=== $(date +%H:%M:%S) gcnII tiny cells ==="
python -u tools/tuned_run.py --protocol random --models gcnII \
  --datasets cornell,wisconsin,texas >> logs/tuned_random_cpu.log 2>&1
echo "=== $(date +%H:%M:%S) tuned fixed (CPU datasets) ==="
python -u tools/tuned_run.py --protocol fixed \
  --datasets cornell,wisconsin,texas >> logs/tuned_fixed_cpu.log 2>&1
echo "=== cpu queue done $(date +%H:%M:%S) ==="
