#!/bin/bash
# Round-3 Table-2 outlier adjudication (VERDICT r2 item #6): run the
# reference's own code at the paper's Table-13 tuned configs.
cd /root/repo
log=experiments/oracle/tiny_cells_adjudication.log
run() { env -u PALLAS_AXON_POOL_IPS python -u tools/reference_oracle.py "$@" >> "$log" 2>&1; }
echo "=== round 3 adjudication $(date -u +%F) ===" >> "$log"
# acmgcnpp wisconsin (T2 -1.80σ): Table13 lr .05 wd 1e-2 do .1 withA=1
run --dataset wisconsin --model acmgcnpp --structure_info 1 --lr 0.05 --weight_decay 1e-2 --dropout 0.1
# acmgcnp_v1 texas (T2 -2.05σ): Table13 lr .05 wd 1e-2 do .1 withA=1
run --dataset texas --model acmgcnp --variant 1 --structure_info 1 --lr 0.05 --weight_decay 1e-2 --dropout 0.1
# acmgcnp_v1 cornell (T2 -2.50σ): Table13 lr .05 wd 1e-2 do .3 withA=1
run --dataset cornell --model acmgcnp --variant 1 --structure_info 1 --lr 0.05 --weight_decay 1e-2 --dropout 0.3
echo "=== round 3 adjudication done ===" >> "$log"
