#! /bin/bash
# Smoke test mirroring reference tests/run_molecule_3d.sh: one train + one val
# batch (--debug == Lightning fast_dev_run).
set -euxo pipefail
TASK=${1:-0}
python -u -m equihgnn_tpu.main \
    --method egnn_equihnns \
    --data_dir datasets/molecule3d \
    --data molecule_hg_3d \
    --runs 1 \
    --target $TASK \
    --MLP_hidden 256 --output_hidden 128 --output_num_layers 3 \
    --aggregate mean --lr 0.0001 --wd 0 \
    --batch_size 8 \
    --epochs 400 \
    --debug 
