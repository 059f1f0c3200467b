"""Analytic FLOP accounting for the scoring pipeline.

Published so benchmark numbers are auditable: frames/s alone hides the
algorithmic knobs (teacher stride / subsample), and MFU = achieved FLOP/s
over peak is the honest utilization number. Counts multiply-adds as
2 FLOPs (the TPU datasheet convention; v5e peak 197 TFLOP/s bf16).
"""

from __future__ import annotations

from ..models.timesformer import TimeSformerConfig

V5E_PEAK_BF16 = 197e12  # FLOP/s per chip


def timesformer_forward_flops(cfg: TimeSformerConfig, num_frames: int) -> float:
    """FLOPs of one divided space-time forward, batch 1, T=num_frames.

    Counts the matmuls (patch embed, qkv/proj/temporal_fc, attention
    score/value products, MLP); norms/softmax/elementwise are <1% and
    ignored.
    """
    D = cfg.embed_dim
    N = cfg.num_patches  # spatial tokens per frame
    L = cfg.depth
    T = num_frames
    mlp_hidden = int(D * cfg.mlp_ratio)
    patch_in = cfg.patch_size * cfg.patch_size * cfg.in_chans

    flops = 2.0 * T * N * patch_in * D  # patch embed matmul

    per_block = 0.0
    if cfg.attention_type == "divided_space_time":
        # temporal attention over T per spatial location (T*N tokens)
        per_block += T * N * (2 * 3 * D * D + 2 * D * D)     # qkv + proj
        per_block += T * N * (4 * T * D)                     # QK^T + PV
        per_block += T * N * (2 * D * D)                     # temporal_fc
        # spatial attention over (1+N) per frame (T*(1+N) tokens)
        per_block += T * (N + 1) * (2 * 3 * D * D + 2 * D * D)
        per_block += T * (N + 1) * (4 * (N + 1) * D)
        # MLP over the (1 + N*T) sequence
        per_block += (1 + N * T) * (2 * 2 * D * mlp_hidden)
    else:
        seq = 1 + N * T if cfg.attention_type == "joint_space_time" else N + 1
        reps = 1 if cfg.attention_type == "joint_space_time" else T
        per_block += reps * seq * (2 * 4 * D * D + 4 * seq * D)
        per_block += reps * seq * (2 * 2 * D * mlp_hidden)

    return flops + L * per_block


def train_step_flops(
    cfg: TimeSformerConfig,
    batch_per_step: int,
    n_local_crops: int = 8,
    local_size_px: int = 96,
) -> float:
    """Analytic FLOPs of one DINO train step (global batch).

    Teacher: forward-only on the 2 global crops. Student: forward+backward
    (~3x forward) on 2 global + ``n_local_crops`` local crops. DINO heads
    are <1% of the backbone and ignored, as are the optimizer/EMA updates
    (elementwise). Local crops keep the global frame count but run at
    ``local_size_px`` resolution (ref: transform.py:661-749 semantics).
    """
    import dataclasses

    B = batch_per_step
    T = cfg.num_frames
    g = timesformer_forward_flops(cfg, T)
    local_cfg = dataclasses.replace(cfg, img_size=local_size_px)
    l = timesformer_forward_flops(local_cfg, T)
    teacher = 2 * B * g
    student = 3 * B * (2 * g + n_local_crops * l)
    return teacher + student


def scoring_flops_per_frame(
    cfg: TimeSformerConfig,
    local_size: int = 3,
    eff_global: int = 30,
    global_subsample: int = 1,
    teacher_stride: int = 1,
    score_stride: int = 1,
    teacher_img: int = 0,
) -> float:
    """Average FLOPs spent per video frame by FrameScorer with the given
    approximation knobs (student forward per scored frame + teacher forward
    per teacher position; ``teacher_img`` shrinks the teacher's spatial
    grid quadratically)."""
    import dataclasses

    t_frames = len(range(0, eff_global, max(1, global_subsample)))
    student = timesformer_forward_flops(cfg, local_size)
    t_cfg = cfg
    if teacher_img and teacher_img != cfg.img_size:
        t_cfg = dataclasses.replace(cfg, img_size=teacher_img)
    teacher = timesformer_forward_flops(t_cfg, t_frames)
    m = max(1, score_stride)
    k = max(1, teacher_stride)
    return (student + teacher / k) / m


def banded_pass_flops(
    cfg: TimeSformerConfig,
    n_frames: int,
    eff: int,
    block: int = 32,
    fused: bool = False,
) -> float:
    """FLOPs of ONE banded pass (models/banded.py) over an ``n_frames``
    chunk with window/band length ``eff``.

    Each frame is processed once: patch embed + per block a slab-blocked
    banded temporal attention (keys per query S = min(C, P + 2*(eff-1)),
    the out-of-band slab keys are masked but still paid for), a per-frame
    spatial attention with per-frame CLS, the CLS window aggregation over
    the same slab, and the MLP."""
    C = n_frames
    D = cfg.embed_dim
    N = cfg.num_patches
    mlp_hidden = int(D * cfg.mlp_ratio)
    patch_in = cfg.patch_size * cfg.patch_size * cfg.in_chans

    P = min(block, C)
    while C % P:
        P -= 1
    # XLA path slab: P + 2*(eff-1) keys; the Pallas kernels load a fixed
    # prev/cur/next 3-block slab (ops/banded_block.py) — count what runs
    S = min(C, 3 * P if fused else P + 2 * (eff - 1))

    per_frame = 2.0 * N * patch_in * D  # patch embed
    per_block = 0.0
    # temporal half: qkv + proj + temporal_fc on N patch tokens; banded
    # scores/values against S slab keys
    per_block += N * (2 * 3 * D * D + 2 * D * D + 2 * D * D)
    per_block += N * (4 * S * D)
    # spatial half: qkv + proj on (1 + N) tokens; patches attend (1 + N)
    # own-frame keys; CLS attends N patches of S slab frames (+ self)
    per_block += (N + 1) * (2 * 3 * D * D + 2 * D * D)
    per_block += N * (4 * (N + 1) * D)
    per_block += 4 * S * N * D
    # MLP on (1 + N) tokens
    per_block += (N + 1) * (2 * 2 * D * mlp_hidden)
    return C * (per_frame + cfg.depth * per_block)
