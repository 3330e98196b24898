#! /bin/bash
# Launch config mirroring reference scripts/run_pcqm_3d.sh (hidden 256,
# 3 conv layers, output hidden 128, Adam 1e-4, batch 768, <=400 epochs).
set -euxo pipefail
TASK=$1
python -u -m equihgnn_tpu.main \
    --method egnn_equihnns \
    --data_dir datasets/pcqm \
    --data pcqm_hg_3d \
    --runs 1 \
    --target $TASK \
    --All_num_layers 3 \
    --MLP1_num_layers 2 --MLP2_num_layers 2 --MLP3_num_layers 2 --MLP4_num_layers 2 \
    --output_num_layers 3 \
    --MLP_hidden 256 \
    --output_hidden 128 \
    --aggregate mean \
    --lr 0.0001 \
    --wd 0 \
    --dropout 0.0 \
    --batch_size 768 \
    --epochs 400 
