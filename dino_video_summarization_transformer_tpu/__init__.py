"""TPU-native video summarization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Luke-537/Dino-Video-Summarization-Transformer (reference mounted at
/root/reference): self-supervised video-transformer (SVT/TimeSformer)
pretraining with DINO, per-frame importance scoring via teacher/student
DINO loss over temporal windows, adaptive CDF-quantile frame selection,
and the downstream evaluation protocols (kNN, linear probe, TimeSformer
classification, captioning metrics).

Layout (mirrors SURVEY.md section 2 component inventory):
  config/    typed config tree + YAML/opts merge (ref: utils/defaults.py, utils/parser.py)
  models/    TimeSformer, 2D ViT, DINO heads, checkpoint conversion (ref: models/*)
  ops/       device kernels: attention, fused preprocess, interpolation (ref: native deps)
  parallel/  mesh / sharding / collectives (ref: torch.distributed+NCCL usage)
  data/      video decode + datasets + transforms (ref: datasets_custom/*)
  train/     DINO loss, schedules, optimizers, train step (ref: train_ssl.py)
  engine/    scoring, kNN, linear probe, meters/metrics (ref: dino_similarity.py, eval_*.py)
  utils/     logging, checkpointing, misc
"""

__version__ = "0.1.0"
