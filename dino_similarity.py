#!/usr/bin/env python
"""Per-frame DINO importance scoring CLI (ref: dino_similarity.py:138-191).

Keeps the reference's CLI contract — same flags, same default window
geometry (local=3, global=30, pre-sampling 4), same incremental JSON output
format — on the TPU-native batched scoring engine.

Example:
    python dino_similarity.py --cfg configs/kinetics/timesformer_divst_8x32_224.yaml \
        --pretrained_weights checkpoints/kinetics400_vitb_ssl.pth \
        --batch_size_per_gpu 8 \
        --opts DATA.PATH_TO_DATA_DIR /data/msvd DATA.PATH_PREFIX /data/msvd/videos
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dino_video_summarization_transformer_tpu.config import load_config
from dino_video_summarization_transformer_tpu.utils.misc import bool_flag


def get_args_parser():
    # flag set mirrors the reference CLI (ref: dino_similarity.py:140-183)
    p = argparse.ArgumentParser("Per-frame DINO similarity scoring")
    p.add_argument("--n_last_blocks", default=4, type=int)
    p.add_argument("--avgpool_patchtokens", default=False, type=bool_flag)
    p.add_argument("--arch", default="vit_base", type=str,
                   choices=["vit_tiny", "vit_small", "vit_base", "swin", "timesformer"])
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default=None, type=str)
    p.add_argument("--batch_size_per_gpu", default=8, type=int,
                   help="frames scored per device step (chunk size)")
    p.add_argument("--local_rank", default=0, type=int)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="configs/kinetics/timesformer_divst_8x32_224.yaml")
    p.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    p.add_argument("--out_dim", default=768, type=int)
    # scoring geometry (hardcoded in the reference __main__,
    # ref: dino_similarity.py:186-189)
    p.add_argument("--local_clip_size", default=3, type=int)
    p.add_argument("--global_clip_size", default=30, type=int)
    p.add_argument("--sampling_rate", default=4, type=int)
    p.add_argument("--file_path", default="loss_values/loss_kinetics_test_4_3_30.json")
    # TPU-specific
    p.add_argument("--shard_id", default=0, type=int)
    p.add_argument("--num_shards", default=1, type=int)
    p.add_argument("--precision", default="float32",
                   choices=["float32", "bfloat16"],
                   help="float32 = reference-compat numerics; bfloat16 = fast")
    p.add_argument("--global_subsample", default=1, type=int,
                   help=">1 = fast mode: sample every k-th frame of the "
                        "teacher window (k=4 -> native T=8, ~3x faster; "
                        "scores differ from the reference)")
    p.add_argument("--teacher_stride", default=1, type=int,
                   help=">1 = turbo mode: teacher forward every k-th frame, "
                        "CLS features linearly interpolated between "
                        "(validated: error below the bf16 noise floor at "
                        "k=4, see BENCH.md)")
    p.add_argument("--teacher_interp", default="linear",
                   choices=["linear", "catmullrom"],
                   help="teacher CLS reconstruction between strided "
                        "teacher forwards; catmullrom (cubic) sustains "
                        "deeper strides (turbo2 = k=8 + catmullrom, "
                        "quality table in BENCH.md)")
    p.add_argument("--teacher_precision", default="same",
                   choices=["same", "float32"],
                   help="float32 runs the TEACHER forward with f32 "
                        "activations while students keep --precision "
                        "(mixed-teacher tier: the teacher softmax is the "
                        "score's sharpest noise amplifier, and strided "
                        "modes run the teacher on 1/k of frames — quality "
                        "table in BENCH.md)")
    p.add_argument("--teacher_adaptive", default=0.0, type=float,
                   help="alpha > 0 = motion-adaptive teacher refinement: "
                        "start on the --teacher_stride grid and bisect "
                        "every interval whose summed luma frame-difference "
                        "exceeds alpha x the video's mean interval motion "
                        "(stride k -> k/2 where the content moves fast; "
                        "quality table in BENCH.md)")
    p.add_argument("--teacher_refine", default=0.0, type=float,
                   help="alpha > 0 = error-adaptive teacher refinement: "
                        "after the --teacher_stride pass, bisect the "
                        "intervals around every knot whose measured "
                        "feature-space leave-one-out interpolation error "
                        "exceeds alpha (stride k -> k/2 exactly where "
                        "interpolation is failing; alpha 0.04 calibrated "
                        "in BENCH.md — smooth content pays nothing)")
    p.add_argument("--score_stride", default=1, type=int,
                   help=">1 = score every m-th frame only, interpolate the "
                        "loss curve between (fastest; selection quality "
                        "documented in BENCH.md — opt-in)")
    p.add_argument("--score_refine", default=0.0, type=float,
                   help="alpha > 0 = error-adaptive GUARD for "
                        "--score_stride: bisect (with a second student "
                        "pass) both intervals around every scored knot "
                        "whose loss-curve leave-one-out interpolation "
                        "error exceeds alpha x the video's mean loss. "
                        "alpha 0.2 calibrated on the committed reference "
                        "MSVD curves (recovers the bf16-floor selection "
                        "agreement unguarded m=2 loses — BENCH.md)")
    p.add_argument("--band", default="none",
                   choices=["none", "both", "teacher"],
                   help="banded one-pass scoring (models/banded.py): each "
                        "frame is processed ONCE per pass instead of once "
                        "per overlapping window. 'both' bands the student "
                        "and teacher (~2 frame-units/frame, the 1000 f/s "
                        "route); 'teacher' keeps the exact windowed "
                        "students and bands only the teacher. Does not "
                        "compose with the stride/subsample knobs; quality "
                        "rows in BENCH.md")
    p.add_argument("--student_quant", default="none",
                   choices=["none", "int8"],
                   help="int8 = W8A8 dynamic PTQ for the STUDENT forwards "
                        "(per-channel weights, per-token activations) — "
                        "the v5e MXU's 2x s8 tier on the scoring FLOP "
                        "majority; quality rows in BENCH.md")
    p.add_argument("--teacher_quant", default="none",
                   choices=["none", "int8"],
                   help="int8 = W8A8 dynamic PTQ for the TEACHER forwards "
                        "(the economy tier; quality rows in BENCH.md)")
    p.add_argument("--wire_format", default="rgb8",
                   choices=["rgb8", "yuv420", "yuv420q"],
                   help="host->device frame transport: yuv420 ships the "
                        "codec's own planar 4:2:0 (half the bytes) and "
                        "color-converts on device; yuv420q further "
                        "box-averages chroma to 1/8 resolution per axis "
                        "(~1.03 B/px) — EXPERIMENTAL, measured far above "
                        "the quality floor on the synthetic validators "
                        "(BENCH.md: The wire); revalidate before use")
    p.add_argument("--local_devices", default=1, type=int,
                   help="score with N local TPU chips from this one "
                        "process (0 = all): videos are dealt round-robin "
                        "to per-chip scorer replicas — no collectives, "
                        "near-linear videos/min. Replaces the reference's "
                        "per-GPU torch.distributed.launch; use "
                        "--shard_id/--num_shards to additionally split "
                        "across hosts")
    return p


def dino_similarity(cli, local_clip_size, global_clip_size, sampling_rate, file_path):
    """(ref: dino_similarity.py:16-93)."""
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.data.datasets import DinoLossDataset
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        make_scorers, run_scoring)
    from dino_video_summarization_transformer_tpu.models import (
        convert, init_timesformer)
    from dino_video_summarization_transformer_tpu.models.timesformer import (
        config_from_cfg)

    config = load_config(cli)
    mcfg = config_from_cfg(config, no_head=True, arch=cli.arch)

    if cli.pretrained_weights:
        params = convert.convert_svt_checkpoint(
            cli.pretrained_weights, mcfg, checkpoint_key=cli.checkpoint_key)
    else:
        import jax
        print("WARNING: no --pretrained_weights; scoring with random init")
        params = init_timesformer(jax.random.key(config.RNG_SEED), mcfg)

    dataset = DinoLossDataset(
        cfg=config, mode="test", local_clip_size=local_clip_size,
        global_clip_size=global_clip_size, sampling_rate=sampling_rate,
        wire_format=cli.wire_format)

    compute_dtype = jnp.bfloat16 if cli.precision == "bfloat16" else jnp.float32
    scorer = make_scorers(
        params, mcfg, n_devices=cli.local_devices,
        local_size=local_clip_size, global_size=global_clip_size,
        chunk=cli.batch_size_per_gpu, compute_dtype=compute_dtype,
        precision="highest" if cli.precision == "float32" else None,
        global_subsample=cli.global_subsample,
        teacher_stride=cli.teacher_stride, score_stride=cli.score_stride,
        teacher_interp=cli.teacher_interp,
        teacher_adaptive=cli.teacher_adaptive,
        teacher_refine=cli.teacher_refine,
        score_refine=cli.score_refine,
        band_mode=(None if cli.band == "none" else cli.band),
        student_quant=(None if cli.student_quant == "none"
                       else cli.student_quant),
        teacher_quant=(None if cli.teacher_quant == "none"
                       else cli.teacher_quant),
        teacher_dtype=(jnp.float32 if cli.teacher_precision == "float32"
                       else None),
        wire_format=cli.wire_format if cli.wire_format != "rgb8"
        else "yuv420",
        # converted real checkpoints must pass the softmax-clamp guard
        # before the fused Pallas path is enabled (auto-fallback to XLA)
        clamp_check=bool(cli.pretrained_weights))
    approx = cli.global_subsample > 1 or cli.teacher_stride > 1 \
        or cli.score_stride > 1 or cli.teacher_adaptive > 0 \
        or cli.teacher_refine > 0 or cli.wire_format != "rgb8" \
        or cli.band != "none"
    if approx and cli.precision == "float32":
        print("NOTE: approximation/wire flags change scores; "
              "f32 bit-parity does not apply")

    run_scoring(dataset, scorer, file_path, num_workers=cli.num_workers,
                shard_id=cli.shard_id, num_shards=cli.num_shards)


if __name__ == "__main__":
    cli = get_args_parser().parse_args()
    dino_similarity(cli, cli.local_clip_size, cli.global_clip_size,
                    cli.sampling_rate, cli.file_path)
