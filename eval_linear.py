#!/usr/bin/env python
"""Linear probe CLI (ref: eval_linear.py:30-359).

Frozen TimeSformer backbone + SGD linear classifier with per-epoch cosine
annealing, periodic single-view validation and a final multi-view
(NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS) TestMeter evaluation.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dino_video_summarization_transformer_tpu.utils.misc import bool_flag


def get_args_parser():
    # flags mirror the reference CLI (ref: eval_linear.py:323-359)
    p = argparse.ArgumentParser("Linear evaluation")
    p.add_argument("--n_last_blocks", default=1, type=int)
    p.add_argument("--avgpool_patchtokens", default=False, type=bool_flag)
    p.add_argument("--arch", default="vit_base", type=str,
                   choices=["vit_tiny", "vit_small", "vit_base", "swin"])
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--lc_pretrained_weights", default="", type=str,
                   help="eval-only: load a trained linear classifier")
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--batch_size_per_gpu", default=8, type=int)
    p.add_argument("--dist_url", default="env://", type=str)
    p.add_argument("--local_rank", default=0, type=int)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--val_freq", default=1, type=int)
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--num_labels", default=101, type=int)
    p.add_argument("--dataset", default="ucf101",
                   choices=["ucf101", "hmdb51", "kinetics400"])
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="configs/kinetics/timesformer_divst_8x32_224.yaml")
    p.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    p.add_argument("--precision", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--max_steps_per_epoch", default=0, type=int)
    return p


def eval_linear(args):
    """(ref: eval_linear.py:30-176)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.config import load_config
    from dino_video_summarization_transformer_tpu.data.datasets import build_dataset
    from dino_video_summarization_transformer_tpu.data.loader import PrefetchLoader
    from dino_video_summarization_transformer_tpu.engine.linear import (
        make_linear_probe)
    from dino_video_summarization_transformer_tpu.engine.meters import (
        MetricLogger, TestMeter)
    from dino_video_summarization_transformer_tpu.engine.metrics import accuracy
    from dino_video_summarization_transformer_tpu.models import convert, init_timesformer
    from dino_video_summarization_transformer_tpu.models.timesformer import (
        config_from_cfg)
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)
    from dino_video_summarization_transformer_tpu.utils.misc import get_sha

    enable_compilation_cache()
    print(f"git:\n  {get_sha()}\n")
    print("\n".join(f"{k}: {v}" for k, v in sorted(dict(vars(args)).items())))
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)

    config = load_config(args)
    config.TEST.NUM_SPATIAL_CROPS = 1
    if args.data_path:
        config.DATA.PATH_TO_DATA_DIR = args.data_path
        if not config.DATA.PATH_PREFIX:
            config.DATA.PATH_PREFIX = args.data_path

    ds_name = "kinetics" if args.dataset == "kinetics400" else args.dataset
    dataset_train = build_dataset(ds_name, config, "train", num_retries=10)
    dataset_val = build_dataset(ds_name, config, "val", num_retries=10)
    print(f"Data loaded: {len(dataset_train)} train / {len(dataset_val)} val videos.")

    mcfg = config_from_cfg(config, no_head=True, arch=args.arch)
    if args.pretrained_weights:
        params = convert.convert_svt_checkpoint(
            args.pretrained_weights, mcfg, checkpoint_key=args.checkpoint_key)
    else:
        print("WARNING: random init (no --pretrained_weights)")
        params = init_timesformer(jax.random.key(0), mcfg)

    dtype = jnp.bfloat16 if args.precision == "bfloat16" else jnp.float32
    import dataclasses

    from dino_video_summarization_transformer_tpu.ops.fused_block import (
        ensure_fused_safe, should_fuse)

    # frozen-backbone forwards only -> fused Pallas phases are safe
    # (whole-block kernels: one carry rounding per block instead of 3);
    # converted checkpoints additionally pass the softmax-clamp guard
    fuse = should_fuse(dtype)
    if fuse and args.pretrained_weights:
        fuse = ensure_fused_safe(params, mcfg, fuse, where="eval_linear")
    mcfg = dataclasses.replace(mcfg, use_fused=fuse, fused_wb=True)
    scaled_lr = args.lr * args.batch_size_per_gpu * jax.device_count() / 256.0
    state, train_step, eval_step, epoch_lr = make_linear_probe(
        params, mcfg, num_labels=args.num_labels, lr=scaled_lr,
        epochs=args.epochs, compute_dtype=dtype)

    if args.lc_pretrained_weights:
        z = np.load(args.lc_pretrained_weights)
        state = state._replace(head={"kernel": jnp.asarray(z["kernel"]),
                                     "bias": jnp.asarray(z["bias"])})
        acc = validate_network(args, state, eval_step, dataset_val)
        print(f"Eval-only accuracy: {acc:.2f}%")
        return state

    def collate(items):
        x = np.stack([it[0] for it in items])
        y = np.asarray([it[1] for it in items])
        return x, y

    B = args.batch_size_per_gpu
    best_acc = 0.0
    for epoch in range(args.epochs):
        lr_t = epoch_lr(epoch)
        logger = MetricLogger(delimiter="  ")
        loader = PrefetchLoader(dataset_train, num_workers=args.num_workers,
                                batch_size=B, collate=collate)
        for it, (x, y) in enumerate(
                logger.log_every(loader, 20, f"Epoch: [{epoch}]")):
            if args.max_steps_per_epoch and it >= args.max_steps_per_epoch:
                break
            if x.shape[0] < B:
                continue  # drop tail for static shapes
            state, loss = train_step(state, jnp.asarray(x), jnp.asarray(y),
                                     jnp.asarray(lr_t))
            logger.update(loss=float(loss), lr=lr_t)

        log_stats = {"epoch": epoch, "lr": lr_t,
                     "train_loss": logger.loss.global_avg if "loss" in logger.meters else None}
        if epoch % args.val_freq == 0 or epoch == args.epochs - 1:
            acc = validate_network(args, state, eval_step, dataset_val)
            best_acc = max(best_acc, acc)
            print(f"Accuracy at epoch {epoch}: {acc:.2f}% (best {best_acc:.2f}%)")
            log_stats["val_acc1"] = acc
        with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(log_stats) + "\n")
        np.savez(os.path.join(args.output_dir, "checkpoint_linear.npz"),
                 kernel=np.asarray(state.head["kernel"]),
                 bias=np.asarray(state.head["bias"]), epoch=epoch)

    # final multi-view evaluation (ref: eval_linear.py:264-303)
    config.TEST.NUM_SPATIAL_CROPS = 3
    dataset_test = build_dataset(ds_name, config, "test", num_retries=10)
    stats = validate_network_multi_view(args, state, eval_step, dataset_test,
                                        config)
    print(f"Multi-view test: {stats}")
    return state


def validate_network(args, state, eval_step, dataset):
    """Single-view top-1 (ref: eval_linear.py:224-261)."""
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.data.loader import PrefetchLoader

    B = args.batch_size_per_gpu
    correct = total = 0

    def collate(items):
        return (np.stack([it[0] for it in items]),
                np.asarray([it[1] for it in items]))

    for x, y in PrefetchLoader(dataset, num_workers=args.num_workers,
                               batch_size=B, collate=collate):
        b = x.shape[0]
        if b < B:
            x = np.pad(x, ((0, B - b),) + ((0, 0),) * (x.ndim - 1))
        logits = np.asarray(eval_step(state, jnp.asarray(x)))[:b]
        correct += int((logits.argmax(1) == y).sum())
        total += b
    return 100.0 * correct / max(total, 1)


def validate_network_multi_view(args, state, eval_step, dataset, config):
    """Ensemble eval with TestMeter (ref: eval_linear.py:264-303)."""
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.data.loader import PrefetchLoader
    from dino_video_summarization_transformer_tpu.engine.meters import TestMeter

    num_clips = config.TEST.NUM_ENSEMBLE_VIEWS * config.TEST.NUM_SPATIAL_CROPS
    num_videos = len(dataset) // num_clips
    meter = TestMeter(num_videos, num_clips, args.num_labels)
    B = args.batch_size_per_gpu

    def collate(items):
        return (np.stack([it[0] for it in items]),
                np.asarray([it[1] for it in items]),
                np.asarray([it[2] for it in items]))

    class WithIndex:
        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            x, y, _, _ = dataset[i]
            return x, y, i

    for x, y, idx in PrefetchLoader(WithIndex(), num_workers=args.num_workers,
                                    batch_size=B, collate=collate):
        b = x.shape[0]
        if b < B:
            x = np.pad(x, ((0, B - b),) + ((0, 0),) * (x.ndim - 1))
        logits = np.asarray(eval_step(state, jnp.asarray(x)))[:b]
        meter.update_stats(logits, y, idx)
    return meter.finalize_metrics(ks=(1, 5))


if __name__ == "__main__":
    eval_linear(get_args_parser().parse_args())
