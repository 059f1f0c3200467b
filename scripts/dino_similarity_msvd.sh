#!/usr/bin/env bash
# Per-frame scoring over MSVD (ref: scripts/dino_similarity_msvd.sh).
set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/msvd}
DATA_PREFIX=${DATA_PREFIX:-/data/msvd/YouTubeClips}
CKPT=${CKPT:-checkpoints/kinetics400_vitb_ssl.pth}
OUT=${OUT:-loss_values/loss_msvd_4_3_30.json}

# LOCAL_DEVICES=0 uses every local TPU chip (videos dealt round-robin to
# per-chip scorer replicas — the TPU-native replacement for the
# reference's torch.distributed.launch); shard across HOSTS with
# --shard_id/--num_shards as before.
LOCAL_DEVICES=${LOCAL_DEVICES:-1}

python dino_similarity.py \
  --cfg configs/kinetics/timesformer_divst_8x32_224.yaml \
  --pretrained_weights "$CKPT" \
  --local_devices "$LOCAL_DEVICES" \
  --batch_size_per_gpu 16 \
  --file_path "$OUT" \
  --num_workers 4 \
  --opts DATA.PATH_TO_DATA_DIR "$DATA_DIR" DATA.PATH_PREFIX "$DATA_PREFIX" \
         TEST.NUM_ENSEMBLE_VIEWS 1
