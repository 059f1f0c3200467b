"""Per-frame DINO importance scoring — the batched TPU pipeline.

Re-designs the reference's scoring loop (ref: dino_similarity.py:16-93) for
TPU execution:

reference (GPU):  per video, materialize a (2T, 3, 30, 224, 224) view tensor
                  on the host (ref: dino_loss_loader.py:95-107), ship it,
                  then per batch run two forwards and a *per-frame Python
                  loop with .item() syncs* (ref: dino_similarity.py:87-88).

here (TPU):       the video's frames live in a fixed-size device buffer
                  (FRAME_BUFFER frames); local/global windows are *gathered
                  on device* by index; a chunk of frames is scored per
                  device call (two batched forwards + a vectorized loss).
                  Long videos are split into overlapping segments whose
                  halos cover the +/-15-frame window reach, so EVERY video
                  runs through the same compiled program — no per-length
                  recompilation, and chunk dispatches are pipelined
                  (device arrays are only synced once per video).

Numerics: reference-compat mode runs float32 with HIGHEST matmul precision
(bit-matching the GPU reference to ~1e-5); production mode runs bfloat16.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import timesformer as tsf
from ..train.dino import scoring_dino_loss

FRAME_BUFFER = 512  # device-resident frames per segment


class FrameScorer:
    """Compiled batched scorer for one model + window geometry."""

    def __init__(
        self,
        params,
        model_cfg: tsf.TimeSformerConfig,
        local_size: int = 3,
        global_size: int = 30,
        chunk: int = 16,
        teacher_temp: float = 0.02,
        student_temp: float = 0.3,
        compute_dtype=jnp.float32,
        precision: Optional[str] = "highest",
        frame_buffer: int = FRAME_BUFFER,
        global_subsample: int = 1,
        use_pallas: str | bool = "auto",
    ):
        # global_subsample > 1 = "fast mode": the teacher window keeps its
        # +/-15-frame span but samples every k-th frame, e.g. k=4 turns the
        # 30-frame teacher clip into 8 frames — the model's NATIVE temporal
        # extent (no time-embed extrapolation) at ~4x the throughput.
        # Scores differ from the reference; not for bit-parity runs.
        self.model_cfg = model_cfg
        self.local_size = local_size
        self.global_size = global_size
        self.chunk = chunk
        self.teacher_temp = teacher_temp
        self.student_temp = student_temp
        self.compute_dtype = compute_dtype
        self.precision = precision
        self.frame_buffer = frame_buffer
        self.global_subsample = max(1, int(global_subsample))
        self.mean = jnp.asarray([0.45, 0.45, 0.45], jnp.float32)
        self.std = jnp.asarray([0.225, 0.225, 0.225], jnp.float32)
        self._prep = None
        # fused Pallas attention is available but measured ~10% SLOWER than
        # the XLA path on a quiet chip once the bf16-softmax optimization
        # landed (hd=64 lane padding eats the fusion win) — opt-in only.
        if use_pallas is True:
            from ..ops.attention import use_pallas_attention

            use_pallas_attention(True)
        if compute_dtype == jnp.bfloat16:
            params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        else:
            params = jax.tree.map(jnp.asarray, params)
        self.params = params
        self._jitted: Dict[int, callable] = {}
        self._dummy_loss: Optional[float] = None

    # -- compiled kernel ------------------------------------------------------

    def _build(self, eff_global: int):
        cfg = self.model_cfg
        chunk = self.chunk
        dtype = self.compute_dtype

        def score_chunk(params, frames, loc_idx, glob_idx):
            # frames (Fb, H, W, C); loc_idx (chunk, L); glob_idx (chunk, G)
            local = jnp.take(frames, loc_idx.reshape(-1), axis=0)
            local = local.reshape(chunk, self.local_size, *frames.shape[1:])
            glob = jnp.take(frames, glob_idx.reshape(-1), axis=0)
            glob = glob.reshape(chunk, eff_global, *frames.shape[1:])
            # (B, T, H, W, C) -> (B, C, T, H, W)
            local = local.transpose(0, 4, 1, 2, 3)
            glob = glob.transpose(0, 4, 1, 2, 3)
            s = tsf.forward(params, local, cfg, compute_dtype=dtype)
            t = tsf.forward(params, glob, cfg, compute_dtype=dtype)
            return scoring_dino_loss(
                s, t, teacher_temp=self.teacher_temp,
                student_temp=self.student_temp)

        if self.precision:
            score_chunk = partial(
                _with_matmul_precision, self.precision, score_chunk)
        return jax.jit(score_chunk)

    def _get(self, eff_global: int):
        if eff_global not in self._jitted:
            self._jitted[eff_global] = self._build(eff_global)
        return self._jitted[eff_global]

    # -- public API ------------------------------------------------------------

    def score_video(self, frames: np.ndarray, local_idx: np.ndarray,
                    global_idx: np.ndarray, eff_global: int) -> np.ndarray:
        """frames (T, H, W, C) float32 normalized; returns (T,) losses.

        Splits into segments of ``frame_buffer`` frames with window-reach
        halos; within a segment, chunks of frames are dispatched without
        host syncs (one sync at the end of the video).
        """
        T = frames.shape[0]
        Fb = self.frame_buffer
        if self.global_subsample > 1:
            global_idx = global_idx[:, ::self.global_subsample]
            eff_global = global_idx.shape[1]
        fn = self._get(eff_global)
        chunk = self.chunk
        halo = self.global_size  # window reach upper bound

        # segment plan: segment covers source frames [src0, src0+Fb) and
        # scores target frames [a, b) whose (possibly end-clamped) windows
        # fit inside. Worst-case backward reach is halo-1 frames (an
        # end-clamped global window starts at T-global_size), so src0 lags
        # the first target by halo; progress per segment is Fb - 2*halo.
        assert Fb >= 2 * halo + self.chunk, (
            f"frame_buffer {Fb} too small for halo {halo}")
        segments: List[tuple] = []
        a = 0
        while a < T:
            src0 = max(0, a - halo)
            end = src0 + Fb
            b = T if end >= T else end - halo
            segments.append((src0, a, b))
            a = b

        is_u8 = frames.dtype == np.uint8
        if is_u8 and self._prep is None:
            # fused on-device preprocessing: uint8 crosses PCIe (4x fewer
            # bytes than f32), normalize happens in one device pass
            # (ref: dino_loss_loader.py:86 does this on the host per video)
            mean, std, dt = self.mean, self.std, self.compute_dtype

            @jax.jit
            def prep(u8):
                x = u8.astype(jnp.float32) / 255.0
                return ((x - mean) / std).astype(dt)

            self._prep = prep

        out_parts = []
        for (src0, a, b) in segments:
            seg = frames[src0:src0 + Fb]
            if seg.shape[0] < Fb:
                seg = np.pad(seg, ((0, Fb - seg.shape[0]),) + ((0, 0),) * 3)
            if is_u8:
                seg_dev = self._prep(jnp.asarray(seg))
            else:
                seg_dev = jnp.asarray(seg, self.compute_dtype)
            n = b - a
            loc = local_idx[a:b] - src0
            glob = global_idx[a:b] - src0
            pad_n = (-n) % chunk
            if pad_n:
                loc = np.pad(loc, ((0, pad_n), (0, 0)))
                glob = np.pad(glob, ((0, pad_n), (0, 0)))
            losses = []
            for c0 in range(0, n + pad_n, chunk):
                losses.append(fn(
                    self.params, seg_dev,
                    jnp.asarray(loc[c0:c0 + chunk]),
                    jnp.asarray(glob[c0:c0 + chunk])))
            seg_losses = np.concatenate([np.asarray(x) for x in losses])[:n]
            out_parts.append(seg_losses)
        return np.concatenate(out_parts).astype(np.float64)

    def dummy_losses(self) -> np.ndarray:
        """Constant-loss protocol for corrupt / size-mismatched videos:
        the reference scores global_size pairs of all-zero (3, 60, 224, 224)
        views (ref: dino_loss_loader.py:34-38, dino_similarity.py:66-93),
        yielding global_size identical values."""
        if self._dummy_loss is None:
            zeros_local = jnp.zeros(
                (1, 3, self.local_size, 224, 224), self.compute_dtype)
            zeros_glob = jnp.zeros((1, 3, 60, 224, 224), self.compute_dtype)

            def run():
                s = tsf.forward(self.params, zeros_local, self.model_cfg,
                                compute_dtype=self.compute_dtype)
                t = tsf.forward(self.params, zeros_glob, self.model_cfg,
                                compute_dtype=self.compute_dtype)
                return scoring_dino_loss(
                    s[0], t[0], teacher_temp=self.teacher_temp,
                    student_temp=self.student_temp)

            if self.precision:
                val = _with_matmul_precision(self.precision, run)
            else:
                val = run()
            self._dummy_loss = float(val)
        return np.full(self.global_size, self._dummy_loss)

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
