#!/bin/bash
# Reproduce experiments/synthetic_homophily.md (CPU, ~15 min).
# Mirrors the reference's 3-stage synthetic pipeline
# (/root/reference/synthetic-experiments/{feature_generation,
# graph_generation,train}.py) through this framework's CLI.
set -e
cd "$(dirname "$0")/.."
RUN="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m acmgnn_tpu.cli"
DIR=${1:-/tmp/synth_homophily}
mkdir -p "$DIR"

$RUN gen-graphs --base_dir "$DIR/sg" --graph_type random \
    --edge_homos 0.1 0.5 0.9 --num_graph 3 --degree_intra 2
$RUN gen-feats --base_dataset cora --out_dir "$DIR/sg/features" \
    --num_realizations 3

for h in 0.1 0.5 0.9; do
  for m in gcn acmgcn; do
    $RUN synthetic-train --base_dir "$DIR/sg" \
        --features_dir "$DIR/sg/features" --graph_type random \
        --edge_homo "$h" --num_graph 3 --model "$m" \
        --epochs 300 --early_stopping 100
  done
done
