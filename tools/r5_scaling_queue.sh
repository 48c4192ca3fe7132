#!/bin/bash
# Round-5 scaling adjudication (VERDICT r4 item #3): per-device work
# accounting + partition A/B on the 8-virtual-CPU-device mesh.
# Adjudicates the powerlaw collapse between hub/class-padding SPMD
# imbalance (balanced partition fixes it -> real hardware would inherit
# the contiguous penalty) and CPU-emulation artifact (accounting
# balanced but rate still collapses).  CPU-only; run while no TPU
# process needs the host (2-core box).
set -u
cd /root/repo
REC=experiments/bench_r5_records.jsonl
run() {
  local label="$1"; shift
  echo "=== $label  $(date +%T) ==="
  local out
  out=$(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS="--xla_force_host_platform_device_count=8" \
        "$@" 2>/tmp/r5_scaling_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "FAILED ($rc): $label"; tail -5 /tmp/r5_scaling_err.log
  else
    echo "$out"
    echo "{\"label\": \"$label\", \"record\": $out}" >> "$REC"
  fi
}
run r5_scale_pl_ag_contig   python -u bench.py --scenario scaling --graph powerlaw --fmt ell --exchange allgather --spmm_dtype bfloat16 --partition contiguous
run r5_scale_pl_ag_balanced python -u bench.py --scenario scaling --graph powerlaw --fmt ell --exchange allgather --spmm_dtype bfloat16 --partition balanced
run r5_scale_pl_halo_contig   python -u bench.py --scenario scaling --graph powerlaw --fmt ell --exchange halo --spmm_dtype bfloat16 --partition contiguous
run r5_scale_pl_halo_balanced python -u bench.py --scenario scaling --graph powerlaw --fmt ell --exchange halo --spmm_dtype bfloat16 --partition balanced
run r5_scale_tw_ag_contig   python -u bench.py --scenario scaling --graph twitch --fmt ell --exchange allgather --spmm_dtype bfloat16 --partition contiguous
run r5_scale_tw_ag_balanced python -u bench.py --scenario scaling --graph twitch --fmt ell --exchange allgather --spmm_dtype bfloat16 --partition balanced
echo "=== done $(date +%T) ==="
