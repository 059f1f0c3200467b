#!/usr/bin/env python
"""kNN evaluation CLI (ref: eval_knn.py:30-250).

Extract backbone features for UCF101/HMDB51 train+val splits with the
compiled TimeSformer forward (batch sharded over the data mesh axis), then
run the temperature-weighted kNN classifier for each k. Feature dump/load
uses .npz instead of .pth.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dino_video_summarization_transformer_tpu.utils.misc import bool_flag


def get_args_parser():
    # flag set mirrors the reference CLI (ref: eval_knn.py:193-222)
    p = argparse.ArgumentParser("Evaluation with weighted k-NN")
    p.add_argument("--batch_size_per_gpu", default=8, type=int)
    p.add_argument("--nb_knn", default=[10, 20, 100, 200], nargs="+", type=int)
    p.add_argument("--temperature", default=0.07, type=float)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default=None, type=str)
    p.add_argument("--use_cuda", default=True, type=bool_flag,
                   help="kept for CLI parity; device residency is automatic")
    p.add_argument("--arch", default="vit_base", type=str)
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--dump_features", default=None, type=str)
    p.add_argument("--load_features", default=None, type=str)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--dist_url", default="env://", type=str)
    p.add_argument("--local_rank", default=0, type=int)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--dataset", default="ucf101", choices=["ucf101", "hmdb51"])
    p.add_argument("--num_labels", default=101, type=int)
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="configs/kinetics/timesformer_divst_8x32_224.yaml")
    p.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    p.add_argument("--precision", default="bfloat16",
                   choices=["float32", "bfloat16"])
    return p


class ReturnIndexDataset:
    """Wrap a clip dataset to yield (clip, index)
    (ref: eval_knn.py:181-190)."""

    def __init__(self, inner):
        self.inner = inner

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, idx):
        clip, _, _, _ = self.inner[idx]
        return clip, idx


def extract_feature_pipeline(args):
    """(ref: eval_knn.py:30-91)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.config import load_config
    from dino_video_summarization_transformer_tpu.data.datasets import build_dataset
    from dino_video_summarization_transformer_tpu.engine.knn import (
        extract_features, l2_normalize)
    from dino_video_summarization_transformer_tpu.models import convert, init_timesformer
    from dino_video_summarization_transformer_tpu.models.timesformer import (
        config_from_cfg)
    from dino_video_summarization_transformer_tpu.parallel import build_mesh

    config = load_config(args)
    config.TEST.NUM_SPATIAL_CROPS = 1
    if args.data_path:
        config.DATA.PATH_TO_DATA_DIR = args.data_path
        if not config.DATA.PATH_PREFIX:
            config.DATA.PATH_PREFIX = args.data_path

    dataset_train = ReturnIndexDataset(
        build_dataset(args.dataset, config, "train", num_retries=10))
    dataset_val = ReturnIndexDataset(
        build_dataset(args.dataset, config, "val", num_retries=10))
    print(f"Data loaded with {len(dataset_train)} train and "
          f"{len(dataset_val)} val videos.")

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
        fuse = ensure_fused_safe(params, mcfg, fuse, where="eval_knn")
    mcfg = dataclasses.replace(mcfg, use_fused=fuse, fused_wb=True)
    mesh = build_mesh() if jax.device_count() > 1 else None

    print("Extracting features for train set...")
    train_features = extract_features(
        params, mcfg, dataset_train, batch_size=args.batch_size_per_gpu,
        num_workers=args.num_workers, compute_dtype=dtype, mesh=mesh)
    print("Extracting features for val set...")
    test_features = extract_features(
        params, mcfg, dataset_val, batch_size=args.batch_size_per_gpu,
        num_workers=args.num_workers, compute_dtype=dtype, mesh=mesh)

    train_features = l2_normalize(train_features)
    test_features = l2_normalize(test_features)
    train_labels = np.asarray(dataset_train.inner.labels, np.int64)
    test_labels = np.asarray(dataset_val.inner.labels, np.int64)

    if args.dump_features:
        os.makedirs(args.dump_features, exist_ok=True)
        np.savez(os.path.join(args.dump_features, "features.npz"),
                 trainfeat=train_features, testfeat=test_features,
                 trainlabels=train_labels, testlabels=test_labels)
    return train_features, test_features, train_labels, test_labels


def main(args):
    import numpy as np

    from dino_video_summarization_transformer_tpu.engine.knn import knn_classifier
    from dino_video_summarization_transformer_tpu.parallel import (
        init_distributed_mode)
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)
    from dino_video_summarization_transformer_tpu.utils.misc import get_sha

    enable_compilation_cache()
    init_distributed_mode()
    print(f"git:\n  {get_sha()}\n")
    print("\n".join(f"{k}: {v}" for k, v in sorted(dict(vars(args)).items())))

    if args.load_features:
        z = np.load(os.path.join(args.load_features, "features.npz"))
        train_features, test_features = z["trainfeat"], z["testfeat"]
        train_labels, test_labels = z["trainlabels"], z["testlabels"]
    else:
        (train_features, test_features,
         train_labels, test_labels) = extract_feature_pipeline(args)

    print("Features are ready!\nStart the k-NN classification.")
    results = {}
    for k in args.nb_knn:
        top1, top5 = knn_classifier(
            train_features, train_labels, test_features, test_labels,
            k, args.temperature, num_classes=args.num_labels)
        print(f"{k}-NN classifier result: Top1: {top1}, Top5: {top5}")
        results[k] = (top1, top5)
    return results


if __name__ == "__main__":
    main(get_args_parser().parse_args())
