#!/usr/bin/env bash
# kNN evaluation launcher (ref: scripts/eval_knn.sh).
set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/ucf101}
CKPT=${CKPT:-checkpoints/kinetics400_vitb_ssl.pth}

python eval_knn.py \
  --arch vit_base --dataset ucf101 --num_labels 101 \
  --data_path "$DATA_DIR" \
  --pretrained_weights "$CKPT" \
  --batch_size_per_gpu 8 \
  --cfg configs/kinetics/timesformer_divst_8x32_224.yaml
