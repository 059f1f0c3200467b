#!/usr/bin/env bash
# DINO SSL pretraining launcher (ref: scripts/train.sh). Single-host TPU:
# all local chips join the data-parallel mesh automatically; multi-host
# pods initialize via jax.distributed.
set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/kinetics/annotations}
PRETRAINED=${PRETRAINED:-checkpoints/kinetics400_vitb_ssl.pth}
OUT=${OUT:-runs/svt_k400}

python train_ssl.py \
  --arch timesformer \
  --cfg configs/kinetics/timesformer_divst_8x32_224.yaml \
  --data_path "$DATA_DIR" \
  --pretrained_rgb "$PRETRAINED" \
  --batch_size_per_gpu 8 \
  --epochs 20 --warmup_epochs 2 \
  --output_dir "$OUT"
