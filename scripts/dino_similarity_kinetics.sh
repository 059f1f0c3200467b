#!/usr/bin/env bash
# Per-frame scoring over Kinetics (ref: scripts/dino_similarity_kinetics.sh).
# The reference launched one process per GPU via torch.distributed.launch;
# here a single process drives the chip, and video-level sharding across
# hosts/chips uses --shard_id/--num_shards.
set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/kinetics/annotations}
DATA_PREFIX=${DATA_PREFIX:-/data/kinetics/videos}
CKPT=${CKPT:-checkpoints/kinetics400_vitb_ssl.pth}
OUT=${OUT:-loss_values/loss_kinetics_test_4_3_30.json}

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
  --shard_id "${SHARD_ID:-0}" --num_shards "${NUM_SHARDS:-1}" \
  --opts DATA.PATH_TO_DATA_DIR "$DATA_DIR" DATA.PATH_PREFIX "$DATA_PREFIX" \
         TEST.NUM_ENSEMBLE_VIEWS 1
