#!/usr/bin/env python
"""TimeSformer classification finetuning on adaptively selected frames
(ref: timesformer_finetuning.py:13-104).

Replaces the reference's HF Trainer with the framework's jitted train step
(AdamW, linear warmup/decay, per-epoch eval) while keeping the experiment
contract: 16 adaptively selected frames per clip, 5 epochs, batch 4, loss
history JSON + loss plot.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args_parser():
    p = argparse.ArgumentParser("TimeSformer finetuning on selected frames")
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="configs/kinetics/timesformer_divst_8x32_224.yaml")
    p.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    p.add_argument("--model_path", required=True, type=str)
    p.add_argument("--model_format", default="hf", choices=["hf", "svt"])
    p.add_argument("--train_loss_file", required=True, type=str)
    p.add_argument("--val_loss_file", required=True, type=str)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--output_dir", default="timesformer_finetuning_out", type=str)
    p.add_argument("--num_train_epochs", default=5, type=int)
    p.add_argument("--per_device_train_batch_size", default=4, type=int)
    p.add_argument("--warmup_steps", default=500, type=int)
    p.add_argument("--weight_decay", default=0.01, type=float)
    p.add_argument("--learning_rate", default=5e-5, type=float)
    p.add_argument("--pre_sampling_rate", default=4, type=int)
    p.add_argument("--num_frames", default=16, type=int)
    p.add_argument("--num_labels", default=400, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--precision", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--max_steps_per_epoch", default=0, type=int)
    return p


def finetuning(args):
    import json

    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.config import load_config
    from dino_video_summarization_transformer_tpu.data.datasets import (
        FrameSelectionDataset)
    from dino_video_summarization_transformer_tpu.engine.classification import (
        finetune)
    from dino_video_summarization_transformer_tpu.models import convert
    from dino_video_summarization_transformer_tpu.models.timesformer import (
        TimeSformerConfig)
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    config = load_config(args)
    config.DATASET = "Kinetics"
    if args.data_path:
        config.DATA.PATH_TO_DATA_DIR = args.data_path
        if not config.DATA.PATH_PREFIX:
            config.DATA.PATH_PREFIX = args.data_path

    mcfg = TimeSformerConfig(
        img_size=224, num_frames=args.num_frames, num_classes=args.num_labels,
        attention_type=config.TIMESFORMER.ATTENTION_TYPE)
    if args.model_format == "hf":
        params = convert.convert_hf_timesformer(args.model_path, mcfg)
    else:
        params = convert.convert_svt_checkpoint(args.model_path, mcfg)

    config.LOSS_FILE = args.train_loss_file
    dataset_train = FrameSelectionDataset(
        config, pre_sampling_rate=args.pre_sampling_rate,
        selection_method="adaptive", num_frames=args.num_frames,
        augmentations=True, return_type="Dict", mode="train")
    print(f"Loaded dataset of length: {len(dataset_train)}")

    config.LOSS_FILE = args.val_loss_file
    dataset_val = FrameSelectionDataset(
        config, pre_sampling_rate=args.pre_sampling_rate,
        selection_method="adaptive", num_frames=args.num_frames,
        augmentations=False, return_type="Dict", mode="val")
    print(f"Loaded dataset of length: {len(dataset_val)}")

    params, log_history = finetune(
        dataset_train, dataset_val, params, mcfg,
        output_dir=args.output_dir,
        num_epochs=args.num_train_epochs,
        batch_size=args.per_device_train_batch_size,
        lr=args.learning_rate, warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay, num_workers=args.num_workers,
        compute_dtype=jnp.bfloat16 if args.precision == "bfloat16" else jnp.float32,
        max_steps_per_epoch=args.max_steps_per_epoch)

    # save finetuned params + loss plot (ref: timesformer_finetuning.py:85-104)
    np.savez(os.path.join(args.output_dir, "finetuned_params.npz"),
             **{"/".join(map(str, path)): np.asarray(leaf) for path, leaf in
                _flatten(params)})
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        train_loss = [e["loss"] for e in log_history if "loss" in e]
        val_loss = [e["eval_loss"] for e in log_history if "eval_loss" in e]
        plt.plot(train_loss, label="Training Loss")
        plt.plot(val_loss, label="Validation Loss")
        plt.xlabel("Epochs")
        plt.ylabel("Loss")
        plt.title("Training vs Validation Loss")
        plt.legend()
        os.makedirs("eval_logs", exist_ok=True)
        plt.savefig(os.path.join(args.output_dir, "finetuning_loss.png"))
    except Exception as e:
        print(f"plotting skipped: {e}")
    return params


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


if __name__ == "__main__":
    finetuning(get_args_parser().parse_args())
