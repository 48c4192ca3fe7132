#!/usr/bin/env bash
# Large-scale grid sweep, mirroring ACM-Geometric/sh/run_all_settings.sh:
# 6 datasets x dropout x lr x wd x variant x structure_info x
# {acmgcnp, acmgcnpp} x {AdamW, Adam}.  Requires the LINKX raw files
# locally (see acmgnn_tpu/data/linkx.py docstring).
set -e
cd "$(dirname "$0")/.."

for dataset in Penn94 twitch-gamer genius arxiv-year pokec snap-patents; do
  for method in acmgcnp acmgcnpp; do
    for optimizer in adamw adam; do
      for structure_info in 0 1; do
        for variant in 0 1; do
          for dropout in 0 0.1 0.2 0.3 0.5; do
            for lr in 0.01 0.05 0.1; do
              for wd in 0 1e-5 5e-5 1e-4 5e-4 1e-3 5e-3 1e-2 0.1; do
                python -m acmgnn_tpu.cli train \
                  --dataset "$dataset" --model "$method" \
                  --optimizer "$optimizer" --structure_info "$structure_info" \
                  --variant "$variant" --dropout "$dropout" --lr "$lr" \
                  --weight_decay "$wd" --epochs 500 --early_stopping 0 \
                  --fixed_splits 1 --num_splits 5 \
                  --results_csv "results/${dataset}.csv"
              done
            done
          done
        done
      done
    done
  done
done
