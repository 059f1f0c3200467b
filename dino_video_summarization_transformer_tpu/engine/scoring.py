"""Per-frame DINO importance scoring — the batched TPU pipeline.

Re-designs the reference's scoring loop (ref: dino_similarity.py:16-93) for
TPU execution:

reference (GPU):  per video, materialize a (2T, 3, 30, 224, 224) view tensor
                  on the host (ref: dino_loss_loader.py:95-107), ship it,
                  then per batch run two forwards and a *per-frame Python
                  loop with .item() syncs* (ref: dino_similarity.py:87-88).

here (TPU):       the video's frames cross PCIe once as a (T, 224, 224, 3)
                  buffer; local/global windows are *gathered on device* by
                  index; frames are scored in fixed-size chunks under one
                  jit (lax.map over chunks), producing the whole video's
                  loss vector in a single device call. Frame counts are
                  padded to a small set of buckets so XLA compiles a handful
                  of programs total.

Numerics: reference-compat mode runs float32 with HIGHEST matmul precision
(bit-matching the GPU reference to ~1e-5); production mode runs bfloat16.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import timesformer as tsf
from ..train.dino import scoring_dino_loss

# frame-count buckets: one XLA program per (bucket, eff_global) pair
DEFAULT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


def pick_bucket(t: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if t <= b:
            return b
    return ((t + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


class FrameScorer:
    """Compiled batched scorer for one model + window geometry."""

    def __init__(
        self,
        params,
        model_cfg: tsf.TimeSformerConfig,
        local_size: int = 3,
        global_size: int = 30,
        chunk: int = 8,
        teacher_temp: float = 0.02,
        student_temp: float = 0.3,
        compute_dtype=jnp.float32,
        precision: Optional[str] = "highest",
    ):
        self.model_cfg = model_cfg
        self.local_size = local_size
        self.global_size = global_size
        self.chunk = chunk
        self.teacher_temp = teacher_temp
        self.student_temp = student_temp
        self.compute_dtype = compute_dtype
        self.precision = precision
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, compute_dtype if compute_dtype == jnp.bfloat16 else None),
            params,
        )
        self._jitted: Dict[tuple, callable] = {}
        self._dummy_loss: Dict[int, float] = {}

    # -- compiled kernels ---------------------------------------------------

    def _build(self, eff_global: int):
        cfg = self.model_cfg
        chunk = self.chunk
        dtype = self.compute_dtype

        def fwd(x):
            return tsf.forward(self.params, x, cfg, compute_dtype=dtype)

        def score_chunk(frames, loc_idx, glob_idx):
            # frames (Tp, H, W, C); loc_idx (chunk, L); glob_idx (chunk, G)
            local = jnp.take(frames, loc_idx.reshape(-1), axis=0)
            local = local.reshape(chunk, self.local_size, *frames.shape[1:])
            glob = jnp.take(frames, glob_idx.reshape(-1), axis=0)
            glob = glob.reshape(chunk, eff_global, *frames.shape[1:])
            # (B, T, H, W, C) -> (B, C, T, H, W)
            local = local.transpose(0, 4, 1, 2, 3)
            glob = glob.transpose(0, 4, 1, 2, 3)
            s = fwd(local)
            t = fwd(glob)
            return scoring_dino_loss(
                s, t, teacher_temp=self.teacher_temp,
                student_temp=self.student_temp)

        def score_video(frames, loc_idx_all, glob_idx_all):
            Tp = loc_idx_all.shape[0]
            n_chunks = Tp // chunk
            loc = loc_idx_all.reshape(n_chunks, chunk, self.local_size)
            glob = glob_idx_all.reshape(n_chunks, chunk, eff_global)
            losses = jax.lax.map(
                lambda ab: score_chunk(frames, ab[0], ab[1]), (loc, glob))
            return losses.reshape(Tp)

        if self.precision:
            score_video = partial(
                _with_matmul_precision, self.precision, score_video)
        return jax.jit(score_video)

    def _get(self, bucket: int, eff_global: int):
        key = (bucket, eff_global)
        if key not in self._jitted:
            self._jitted[key] = self._build(eff_global)
        return self._jitted[key]

    # -- public API ----------------------------------------------------------

    def score_video(self, frames: np.ndarray, local_idx: np.ndarray,
                    global_idx: np.ndarray, eff_global: int) -> np.ndarray:
        """frames (T, H, W, C) float32 normalized; returns (T,) losses."""
        T = frames.shape[0]
        Tp = pick_bucket(T)
        pad_t = Tp - T
        frames_p = np.pad(frames, ((0, pad_t), (0, 0), (0, 0), (0, 0)))
        loc_p = np.pad(local_idx, ((0, pad_t), (0, 0)))
        glob_p = np.pad(global_idx, ((0, pad_t), (0, 0)))
        fn = self._get(Tp, eff_global)
        losses = fn(
            jnp.asarray(frames_p, self.compute_dtype),
            jnp.asarray(loc_p), jnp.asarray(glob_p))
        return np.asarray(losses[:T], np.float64)

    def dummy_losses(self) -> np.ndarray:
        """Constant-loss protocol for corrupt / size-mismatched videos:
        the reference scores global_size pairs of all-zero (3, 60, 224, 224)
        views (ref: dino_loss_loader.py:34-38, dino_similarity.py:66-93),
        yielding global_size identical values."""
        key = 60
        if key not in self._dummy_loss:
            zeros_local = jnp.zeros(
                (1, 3, self.local_size, 224, 224), self.compute_dtype)
            zeros_glob = jnp.zeros((1, 3, 60, 224, 224), self.compute_dtype)
            with (jax.default_matmul_precision(self.precision)
                  if self.precision else _nullcontext()):
                s = tsf.forward(self.params, zeros_local, self.model_cfg,
                                compute_dtype=self.compute_dtype)
                t = tsf.forward(self.params, zeros_glob, self.model_cfg,
                                compute_dtype=self.compute_dtype)
                val = float(scoring_dino_loss(
                    s[0], t[0], teacher_temp=self.teacher_temp,
                    student_temp=self.student_temp))
            self._dummy_loss[key] = val
        return np.full(self.global_size, self._dummy_loss[key])

    def score_item(self, item: dict) -> np.ndarray:
        """Score one DinoLossDataset item (dict contract in datasets.py)."""
        if item["dummy"]:
            return self.dummy_losses()
        return self.score_video(
            item["frames"], item["local_idx"], item["global_idx"],
            item["eff_global"])


def _with_matmul_precision(precision, fn, *args):
    with jax.default_matmul_precision(precision):
        return fn(*args)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def export_loss(loss_list, video_path: str, file_path: str) -> None:
    """Incremental read-merge-write JSON export
    (ref: dino_similarity.py:97-117). Keyed by basename without extension."""
    video_name = os.path.basename(video_path)
    key, _ = os.path.splitext(video_name)
    video_dict = {key: [float(x) for x in loss_list]}
    if os.path.exists(file_path):
        with open(file_path, "r") as f:
            data = json.load(f)
        data.update(video_dict)
        with open(file_path, "w") as f:
            json.dump(data, f)
    else:
        os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
        with open(file_path, "w") as f:
            json.dump(video_dict, f)


def run_scoring(
    dataset,
    scorer: FrameScorer,
    file_path: str,
    num_workers: int = 4,
    shard_id: int = 0,
    num_shards: int = 1,
    log_every: int = 1,
) -> None:
    """Iterate the scoring dataset with host prefetch, exporting per video.

    Sharding over videos replaces the reference's torch.distributed.launch
    multi-process split (ref: scripts/dino_similarity_*.sh): the scoring
    workload is embarrassingly parallel over videos.
    """
    from ..data.loader import PrefetchLoader, shard_indices

    idx = shard_indices(len(dataset), shard_id, num_shards)
    loader = PrefetchLoader(dataset, indices=idx, num_workers=num_workers)
    for i, item in enumerate(loader):
        if log_every and i % log_every == 0:
            print(f"{i + 1} / {len(idx)}", flush=True)
        losses = scorer.score_item(item)
        export_loss(losses, item["path"], file_path)
