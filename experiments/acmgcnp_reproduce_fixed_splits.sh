#!/usr/bin/env bash
# Reproduces paper Table 3 (ACM-GCN+ on fixed Geom-GCN splits) with the
# reference's tuned hyperparameters, via this framework's CLI.
# Reference original: ACM-Pytorch/experiment/acmgcnp_reproduce_fixed_splits.sh
set -e
cd "$(dirname "$0")/.."

run() { python -m acmgnn_tpu.cli train --fixed_splits 1 --model acmgcnp "$@"; }

# variant 0
run --dataset cornell   --variant 0 --lr 0.05  --structure_info 0 --weight_decay 1e-3 --dropout 0.1
run --dataset wisconsin --variant 0 --lr 0.01  --structure_info 1 --weight_decay 1e-3 --dropout 0.1
run --dataset texas     --variant 0 --lr 0.01  --structure_info 1 --weight_decay 5e-4 --dropout 0.2
run --dataset film      --variant 0 --lr 0.05  --structure_info 0 --weight_decay 5e-3 --dropout 0
run --dataset chameleon --variant 0 --lr 0.05  --structure_info 1 --weight_decay 1e-4 --dropout 0.7
run --dataset squirrel  --variant 0 --lr 0.002 --structure_info 1 --weight_decay 1e-4 --dropout 0.6
run --dataset cora      --variant 0 --lr 0.002 --structure_info 0 --weight_decay 0    --dropout 0.6
run --dataset citeseer  --variant 0 --lr 0.01  --structure_info 0 --weight_decay 5e-5 --dropout 0.3
run --dataset pubmed    --variant 0 --lr 0.05  --structure_info 0 --weight_decay 5e-5 --dropout 0.3

# variant 1 (ACMII)
run --dataset cornell   --variant 1 --lr 0.05  --structure_info 1 --weight_decay 5e-3 --dropout 0
run --dataset wisconsin --variant 1 --lr 0.01  --structure_info 1 --weight_decay 5e-3 --dropout 0.3
run --dataset texas     --variant 1 --lr 0.05  --structure_info 1 --weight_decay 1e-2 --dropout 0.4
run --dataset film      --variant 1 --lr 0.05  --structure_info 0 --weight_decay 5e-3 --dropout 0
run --dataset chameleon --variant 1 --lr 0.05  --structure_info 1 --weight_decay 1e-4 --dropout 0.7
run --dataset squirrel  --variant 1 --lr 0.01  --structure_info 1 --weight_decay 5e-4 --dropout 0.8
run --dataset cora      --variant 1 --lr 0.002 --structure_info 1 --weight_decay 5e-5 --dropout 0.7
run --dataset citeseer  --variant 1 --lr 0.01  --structure_info 1 --weight_decay 5e-3 --dropout 0.2
run --dataset pubmed    --variant 1 --lr 0.01  --structure_info 0 --weight_decay 1e-4 --dropout 0.3
