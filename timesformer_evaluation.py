#!/usr/bin/env python
"""Kinetics-400 selection-quality evaluation CLI
(ref: timesformer_evaluation.py:33-109).

Selects N frames per video (uniform or adaptive CDF-quantile from a
pre-computed loss JSON), re-decodes ONLY the selected frames via the native
decoder, classifies with the framework's TimeSformer (HF-layout checkpoint
supported), and logs running top-1 accuracy — the methodology behind the
reference's eval_logs/k400_*.log baselines (72.41% uniform / 73.14%
adaptive, BASELINE.md).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args_parser():
    p = argparse.ArgumentParser("Selection-quality K400 evaluation")
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="configs/kinetics/timesformer_divst_8x32_224.yaml")
    p.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    p.add_argument("--model_path", required=True, type=str,
                   help="HF Timesformer checkpoint dir/file, or SVT .pth")
    p.add_argument("--model_format", default="hf", choices=["hf", "svt"])
    p.add_argument("--loss_file", default="", type=str,
                   help="per-frame loss JSON (required for adaptive)")
    p.add_argument("--selection_method", default="adaptive",
                   choices=["adaptive", "uniform"])
    p.add_argument("--sharpen", default=False, action="store_true",
                   help="square the loss scores (adaptive_sharp variant)")
    p.add_argument("--pre_sampling_rate", default=4, type=int)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--num_labels", default=400, type=int)
    p.add_argument("--dataset", default="Kinetics", type=str)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--log_path", default="eval_logs/k400_eval.log", type=str)
    p.add_argument("--limit", default=0, type=int)
    p.add_argument("--probe_indices", default=False, action="store_true",
                   help="derive selection indices from container metadata "
                        "instead of decoding the whole video (the pixels "
                        "are re-decoded selectively anyway); skips one "
                        "full decode per video — opt-in because lying "
                        "nb_frames metadata would shift indices")
    p.add_argument("--precision", default="float32",
                   choices=["float32", "bfloat16"])
    return p


def evaluation(args):
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.config import load_config
    from dino_video_summarization_transformer_tpu.data.datasets import (
        FrameSelectionDataset)
    from dino_video_summarization_transformer_tpu.engine.classification import (
        evaluate_selection)
    from dino_video_summarization_transformer_tpu.models import convert
    from dino_video_summarization_transformer_tpu.models.timesformer import (
        TimeSformerConfig)
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    config = load_config(args)
    config.DATASET = args.dataset
    if args.data_path:
        config.DATA.PATH_TO_DATA_DIR = args.data_path
        if not config.DATA.PATH_PREFIX:
            config.DATA.PATH_PREFIX = args.data_path
    config.LOSS_FILE = args.loss_file or os.path.join(
        "loss_values", "loss_kinetics_test_4_3_30.json")

    # classification geometry: N selected frames; model dims come from the
    # HF config.json when present (depth/heads/width must match the ckpt)
    mcfg = TimeSformerConfig(
        img_size=224, num_frames=args.num_frames,
        num_classes=args.num_labels,
        attention_type=config.TIMESFORMER.ATTENTION_TYPE)
    if args.model_format == "hf":
        hf_cfg_path = os.path.join(args.model_path, "config.json")
        if os.path.isdir(args.model_path) and os.path.exists(hf_cfg_path):
            import json

            with open(hf_cfg_path) as f:
                hc = json.load(f)
            import dataclasses

            mcfg = dataclasses.replace(
                mcfg,
                img_size=hc.get("image_size", 224),
                patch_size=hc.get("patch_size", 16),
                embed_dim=hc.get("hidden_size", 768),
                depth=hc.get("num_hidden_layers", 12),
                num_heads=hc.get("num_attention_heads", 12),
                num_classes=len(hc.get("id2label", {})) or args.num_labels,
            )
        params = convert.convert_hf_timesformer(args.model_path, mcfg)
    else:
        params = convert.convert_svt_checkpoint(args.model_path, mcfg)

    dataset = FrameSelectionDataset(
        config, pre_sampling_rate=args.pre_sampling_rate,
        selection_method=args.selection_method, num_frames=args.num_frames,
        augmentations=False, return_type="Indices", mode="test",
        sharpen=args.sharpen, probe_only=args.probe_indices)

    compute_dtype = (jnp.bfloat16 if args.precision == "bfloat16"
                     else jnp.float32)
    import dataclasses

    from dino_video_summarization_transformer_tpu.ops.fused_block import (
        ensure_fused_safe, should_fuse)

    # eval-only forwards: fused is safe (whole-block kernels: one carry
    # rounding per block instead of 3); converted checkpoints additionally
    # pass the softmax-clamp guard
    fuse = ensure_fused_safe(params, mcfg, should_fuse(compute_dtype),
                             where="timesformer_evaluation")
    mcfg = dataclasses.replace(mcfg, use_fused=fuse, fused_wb=True)

    return evaluate_selection(
        dataset, params, mcfg, num_frames=args.num_frames,
        log_path=args.log_path, compute_dtype=compute_dtype,
        limit=args.limit or None)


if __name__ == "__main__":
    evaluation(get_args_parser().parse_args())
