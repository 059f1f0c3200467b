#!/usr/bin/env python
"""DINO self-supervised video-transformer pretraining CLI
(ref: train_ssl.py:50-463).

Same flag set and training semantics as the reference's ``train_svt``, on
the TPU-native sharded train step: multi-crop DINO (2 global + N local
clips), AdamW/SGD/LARS, cosine lr/wd/teacher-momentum schedules, teacher
temperature warmup, gradient clipping + last-layer freeze, EMA teacher,
Orbax checkpoint/auto-resume, JSON-line logs. ``--use_fp16`` maps to
bfloat16 compute (no GradScaler needed on TPU).
"""

import argparse
import datetime
import json
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dino_video_summarization_transformer_tpu.utils.misc import bool_flag


def get_args_parser():
    p = argparse.ArgumentParser("DINO-SVT", add_help=False)
    p.add_argument("--arch", default="vit_base", type=str,
                   choices=["vit_tiny", "vit_small", "vit_base", "timesformer", "swin"])
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--out_dim", default=65536, type=int)
    p.add_argument("--norm_last_layer", default=True, type=bool_flag)
    p.add_argument("--momentum_teacher", default=0.996, type=float)
    p.add_argument("--use_bn_in_head", default=False, type=bool_flag)
    p.add_argument("--warmup_teacher_temp", default=0.04, type=float)
    p.add_argument("--teacher_temp", default=0.04, type=float)
    p.add_argument("--warmup_teacher_temp_epochs", default=0, type=int)
    p.add_argument("--use_fp16", default=True, type=bool_flag,
                   help="bfloat16 compute on TPU (no loss scaling needed)")
    p.add_argument("--weight_decay", type=float, default=0.04)
    p.add_argument("--weight_decay_end", type=float, default=0.4)
    p.add_argument("--clip_grad", type=float, default=3.0)
    p.add_argument("--batch_size_per_gpu", default=8, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--freeze_last_layer", default=1, type=int)
    p.add_argument("--lr", default=0.0005, type=float)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--optimizer", default="adamw", type=str,
                   choices=["adamw", "sgd", "lars"])
    p.add_argument("--global_crops_scale", type=float, nargs="+", default=(0.4, 1.0))
    p.add_argument("--local_crops_number", type=int, default=8)
    p.add_argument("--local_crops_scale", type=float, nargs="+", default=(0.05, 0.4))
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--pretrained_rgb", default=None, type=str)
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--saveckp_freq", default=20, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--dist_url", default="env://", type=str)
    p.add_argument("--local_rank", default=0, type=int)
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="configs/kinetics/timesformer_divst_8x32_224.yaml")
    p.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    p.add_argument("--max_steps_per_epoch", default=0, type=int,
                   help="debug: cap iterations per epoch (0 = full epoch)")
    p.add_argument("--two_token", default=False, type=bool_flag,
                   help="aux-token model + dual DINO head (MODEL.TWO_TOKEN)")
    p.add_argument("--pretrained_motion", default=None, type=str,
                   help="DINO ViT-S .pth for the TWO_STREAM motion nets "
                        "(ref: train_ssl.py:222-231)")
    p.add_argument("--pretrained_cnn", default=None, type=str,
                   help="CoCLR S3D .pth.tar for MODEL.CNN_DISTILL "
                        "(ref: train_ssl.py:263-271)")
    p.add_argument("--cnn_distill_weight", default=0.0, type=float,
                   help="S3D feature-distillation loss weight; 0 matches "
                        "the reference (teacher built, no loss term)")
    p.add_argument("--use_remat", default=False, type=bool_flag,
                   help="rematerialize student forwards (larger batches)")
    p.add_argument("--profile_dir", default="", type=str,
                   help="directory for a jax.profiler trace of a window of "
                        "train steps (SURVEY §5 tracing)")
    p.add_argument("--profile_start_step", default=10, type=int,
                   help="global step at which the profiler trace starts "
                        "(after compile/warmup)")
    p.add_argument("--profile_steps", default=5, type=int,
                   help="number of steps to trace")
    # online kNN evaluation hook (ref: train_ssl.py:576-599 eval_knn)
    p.add_argument("--knn_eval_freq", default=0, type=int,
                   help="epochs between online kNN evals (0 = off)")
    p.add_argument("--knn_data_path", default="", type=str)
    p.add_argument("--knn_dataset", default="ucf101", type=str)
    p.add_argument("--nb_knn", default=5, type=int)
    p.add_argument("--temperature", default=0.07, type=float)
    p.add_argument("--eval_batch_size_per_gpu", default=8, type=int)
    p.add_argument("--model_parallel", default=1, type=int,
                   help="Tensor-parallel degree: shards qkv/mlp/DINO-head "
                        "params over the mesh model axis (parallel/tp.py, "
                        "Megatron pairing); the data axis gets the "
                        "remaining devices. Plain trainer variant only.")
    p.add_argument("--tp_fused", default=False, type=bool_flag,
                   help="With --model_parallel: run the fused Pallas "
                        "kernels on head shards (parallel/tp_fused.py — "
                        "per-shard forward 3.7x the XLA TP path). OPT-IN: "
                        "the combined partial backward intermittently "
                        "crashed the bench tunnel's TPU worker (BENCH.md "
                        "r5 TP section); equivalence is pinned on the "
                        "virtual mesh (tests/test_tp_fused.py).")
    p.add_argument("--zero1", default=False, type=bool_flag,
                   help="ZeRO-1: shard the Adam moments over the data axis "
                        "(parallel/zero.py); params stay replicated. "
                        "Plain trainer variant, exclusive of "
                        "--model_parallel.")
    p.add_argument("--num_shards", default=1, type=int,
                   help="Expected number of host processes (ref: "
                        "utils/parser.py:30-46). >1 makes a failed/absent "
                        "jax.distributed launch a hard error instead of "
                        "silently training on one host's data slice.")
    p.add_argument("--pipeline", default=1, type=int,
                   help="Pipeline-parallel stages (parallel/pp.py, GPipe "
                        "fill/drain over the block stack via ppermute): "
                        "the mesh becomes data x pipe and both backbone "
                        "forwards in the train step run pipelined. Plain "
                        "trainer variant; exclusive of --model_parallel/"
                        "--seq_parallel.")
    p.add_argument("--pipe_micro", default=2, type=int,
                   help="Microbatches per pipeline tick group (bubble "
                        "fraction = (pipe-1)/(micro+pipe-1)); must divide "
                        "every crop batch (2B global, n_local*B local).")
    p.add_argument("--seq_parallel", default=1, type=int,
                   help="Sequence-parallel degree (parallel/sp.py, "
                        "Ulysses-style all_to_all specialized to divided "
                        "attention): the token grid is sharded over "
                        "spatial positions / frames inside each block. "
                        "Plain trainer variant; exclusive of the other "
                        "parallelism flags.")
    return p


def online_knn_eval(args, cfg, mcfg, backbone_params, epoch):
    """Online kNN probe on the teacher backbone
    (ref: train_ssl.py:576-599)."""
    import numpy as np

    from dino_video_summarization_transformer_tpu.data.datasets import build_dataset
    from dino_video_summarization_transformer_tpu.engine.knn import (
        extract_features, knn_classifier, l2_normalize)

    knn_cfg = cfg.clone()
    knn_cfg.TEST.NUM_SPATIAL_CROPS = 1
    knn_cfg.DATA.PATH_TO_DATA_DIR = args.knn_data_path
    if not knn_cfg.DATA.PATH_PREFIX:
        knn_cfg.DATA.PATH_PREFIX = args.knn_data_path
    ds_train = build_dataset(args.knn_dataset, knn_cfg, "train", num_retries=10)
    ds_val = build_dataset(args.knn_dataset, knn_cfg, "val", num_retries=10)
    f_train = l2_normalize(extract_features(
        backbone_params, mcfg, _index_wrap(ds_train),
        batch_size=args.eval_batch_size_per_gpu, num_workers=args.num_workers))
    f_val = l2_normalize(extract_features(
        backbone_params, mcfg, _index_wrap(ds_val),
        batch_size=args.eval_batch_size_per_gpu, num_workers=args.num_workers))
    top1, top5 = knn_classifier(
        f_train, np.asarray(ds_train.labels, np.int64),
        f_val, np.asarray(ds_val.labels, np.int64),
        args.nb_knn, args.temperature, num_classes=max(ds_train.labels) + 1)
    print(f"[epoch {epoch}] online kNN: top1 {top1:.2f} top5 {top5:.2f}",
          flush=True)
    return {"knn_top1": top1, "knn_top5": top5}


def _index_wrap(ds):
    class W:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            clip, _, _, _ = ds[i]
            return clip, i

    return W()


def train_svt(args):
    """(ref: train_ssl.py:154-463)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.config import load_config
    from dino_video_summarization_transformer_tpu.data.datasets import ClipDataset
    from dino_video_summarization_transformer_tpu.data.loader import (
        PrefetchLoader, shard_indices)
    from dino_video_summarization_transformer_tpu.engine.meters import MetricLogger
    from dino_video_summarization_transformer_tpu.models import convert
    from dino_video_summarization_transformer_tpu.models.timesformer import (
        config_from_cfg)
    from dino_video_summarization_transformer_tpu.parallel import (
        build_mesh, data_sharding, init_distributed_mode, is_main_process,
        replicated, shard_state, tp_sharding_tree, zero_sharding_tree)
    from dino_video_summarization_transformer_tpu.train.dino import (
        teacher_temp_schedule)
    from dino_video_summarization_transformer_tpu.train.ssl import (
        build_schedules, init_train_state, make_train_step)
    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)
    from dino_video_summarization_transformer_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from dino_video_summarization_transformer_tpu.utils.misc import (
        fix_random_seeds, get_sha)

    enable_compilation_cache()
    dist = init_distributed_mode(num_shards=args.num_shards)
    fix_random_seeds(args.seed)
    print(f"git:\n  {get_sha()}\n")
    print("\n".join(f"{k}: {v}" for k, v in sorted(dict(vars(args)).items())))
    os.makedirs(args.output_dir, exist_ok=True)
    if is_main_process():
        with open(os.path.join(args.output_dir, "config.json"), "w") as f:
            json.dump(vars(args), f, indent=2, default=str)

    cfg = load_config(args)
    if args.data_path:
        cfg.DATA.PATH_TO_DATA_DIR = args.data_path
        if not cfg.DATA.PATH_PREFIX:
            cfg.DATA.PATH_PREFIX = args.data_path

    # ---------------- data -------------------------------------------------
    two_token = args.two_token or cfg.MODEL.TWO_TOKEN
    two_stream = cfg.MODEL.TWO_STREAM
    rand_fr = cfg.DATA.RAND_FR
    dataset = ClipDataset(cfg, "train", temporal_aug=not two_token,
                          two_token=two_token, rand_fr=rand_fr,
                          get_flow=two_stream, seed=args.seed)
    world = jax.process_count()
    # per data-parallel replica: a tensor-/pipeline-/sequence-parallel
    # group of chips shares each sample
    assert min(args.model_parallel, args.pipeline, args.seq_parallel) >= 1
    assert sum(x > 1 for x in (args.model_parallel, args.pipeline,
                               args.seq_parallel)) <= 1, (
        "--model_parallel / --pipeline / --seq_parallel are exclusive "
        "(compose dp with ONE of them; dp x tp x pp is dryrun-only for "
        "now — __graft_entry__.dryrun_multichip)")
    group = max(args.model_parallel, args.pipeline, args.seq_parallel)
    assert jax.local_device_count() % group == 0, (
        f"the parallelism group size ({group}) must divide the local "
        f"device count ({jax.local_device_count()}); otherwise the "
        f"per-host batch would silently floor")
    per_host = (args.batch_size_per_gpu
                * (jax.local_device_count() // group))
    idx = shard_indices(len(dataset), jax.process_index(), world,
                        shuffle=True, seed=args.seed, drop_last=True)

    flow_rng = np.random.RandomState(args.seed + 1)

    def _stack_views(items, sel):
        return np.concatenate(
            [np.stack([it[0][c] for it in items]) for c in sel], axis=0)

    def collate(items):
        if two_token:
            # 6 views (ref: transform.py:738-743): teacher = [v0, v1],
            # student = ([v2, v3] @96px, [v4, v5] @224)
            return (_stack_views(items, (0, 1)),
                    (_stack_views(items, (2, 3)), _stack_views(items, (4, 5))))
        if rand_fr:
            # vary_fr groups [1,2,4,6,8,10] (ref: utils/utils.py:583-588)
            return tuple(
                _stack_views(items, sel)
                for sel in ((0,), (1,), (2, 3), (4, 5), (6, 7), (8, 9)))
        g = _stack_views(items, range(2))
        l = _stack_views(items, range(2, 2 + args.local_crops_number))
        if two_stream:
            # 2 random flow frames, shared across the batch
            # (ref: train_ssl.py:500-502)
            n_flow = min(len(it[3]["flow"]) for it in items)
            fi = flow_rng.choice(range(min(cfg.DATA.NUM_FRAMES, n_flow)), 2,
                                 replace=False)
            flow = np.concatenate(
                [np.stack([np.asarray(it[3]["flow"][i]) for it in items])
                 for i in fi], axis=0)
            return g, l, flow
        return g, l

    niter_per_ep = max(len(idx) // per_host, 1)
    print(f"Data loaded: {len(dataset)} videos, {niter_per_ep} it/epoch.")

    # ---------------- model ------------------------------------------------
    mcfg = config_from_cfg(cfg, no_head=True, arch=args.arch)
    pretrained_backbone = None
    if args.pretrained_rgb:
        pretrained_backbone = convert.convert_svt_checkpoint(
            args.pretrained_rgb, mcfg, checkpoint_key="teacher")
        print(f"Loaded pretrained RGB backbone from {args.pretrained_rgb}")

    # optional S3D teacher (MODEL.CNN_DISTILL). The reference constructs it
    # (ref: train_ssl.py:263-277) but ships no loss term; the term here is
    # gated on --cnn_distill_weight > 0 (see train/ssl.py).
    cnn_params = None
    if cfg.MODEL.CNN_DISTILL:
        from dino_video_summarization_transformer_tpu.models import s3d

        if args.pretrained_cnn:
            cnn_params = convert.convert_coclr_s3d(args.pretrained_cnn)
            print(f"Loaded CoCLR S3D teacher from {args.pretrained_cnn}")
        else:
            cnn_params = s3d.init_s3d(jax.random.key(args.seed + 7))
        cnn_params = jax.tree.map(jnp.asarray, cnn_params)

    compute_dtype = jnp.bfloat16 if args.use_fp16 else jnp.float32
    from dino_video_summarization_transformer_tpu.ops.fused_block import (
        ensure_fused_safe, should_fuse)
    # fused kernels run per-device full-width — tensor/pipeline/sequence
    # parallelism are XLA-path features (parallel/*.py docstrings)
    fuse = should_fuse(compute_dtype) and group == 1
    # r5: --model_parallel can run the fused kernels on HEAD SHARDS
    # (parallel/tp_fused.py — per-shard forward measured 3.7x the XLA TP
    # path's). OPT-IN via --tp_fused: the combined three-phase partial
    # BACKWARD crashed the bench tunnel's TPU worker intermittently
    # (every phase and 2-/3-phase grad combination passes in dedicated
    # runs — recorded in BENCH.md), so the hardened default stays XLA.
    fuse_tp = (args.tp_fused and should_fuse(compute_dtype)
               and args.model_parallel > 1
               and mcfg.num_heads % args.model_parallel == 0
               and not two_token and not (two_stream or rand_fr))
    if should_fuse(compute_dtype) and group > 1 and not fuse_tp:
        print("NOTE: --model_parallel/--pipeline/--seq_parallel run the "
              "XLA block path by default; --model_parallel with "
              "--tp_fused opts into the head-sharded fused kernels "
              "(parallel/tp_fused.py, caveat in BENCH.md).", flush=True)
    if fuse and pretrained_backbone is not None:
        # converted real checkpoints must clear the fused kernels'
        # softmax-clamp guard (auto-fallback to XLA with a logged reason)
        fuse = ensure_fused_safe(pretrained_backbone, mcfg, True,
                                 where="train_ssl")
    if fuse:
        # bf16 on a real TPU: run the glue-free fused block phases — the
        # custom-VJP Pallas kernels cover the backward too, so the whole
        # student gradient path stays fused (ops/fused_block.py). Dtype/
        # shape gates keep non-fusable geometries on XLA automatically.
        import dataclasses as _dc

        mcfg = _dc.replace(mcfg, use_fused=True)
    assert (group == 1 and not args.zero1) or not (
        two_stream or rand_fr), (
        "--model_parallel/--pipeline/--seq_parallel/--zero1 support the "
        "plain/two_token trainer variants")
    assert group == 1 or not two_token, (
        "--pipeline/--seq_parallel/--model_parallel support the plain "
        "trainer variant")
    backbone_forward = None
    if args.pipeline > 1:
        from dino_video_summarization_transformer_tpu.parallel.pp import (
            build_pipe_mesh, pp_forward_features)

        mesh = build_pipe_mesh(args.pipeline,
                               data=jax.device_count() // args.pipeline)
        backbone_forward = partial(
            pp_forward_features, cfg=mcfg, mesh=mesh,
            n_micro=args.pipe_micro, compute_dtype=compute_dtype)
    elif args.seq_parallel > 1:
        from dino_video_summarization_transformer_tpu.parallel.sp import (
            build_seq_mesh, sp_forward_features)

        mesh = build_seq_mesh(args.seq_parallel,
                              data=jax.device_count() // args.seq_parallel)
        backbone_forward = partial(
            sp_forward_features, cfg=mcfg, mesh=mesh,
            compute_dtype=compute_dtype)
    else:
        mesh = build_mesh(model=args.model_parallel)
    d_shard = data_sharding(mesh)
    state_sharding = None  # set by the TP / ZeRO-1 branches below

    if two_stream:
        assert cfg.DATA.NO_FLOW_AUG, (
            "TWO_STREAM requires DATA.NO_FLOW_AUG: the reference's aug'd "
            "flow path never defines flow_images (ref: train_ssl.py:498-502)")
        from dino_video_summarization_transformer_tpu.models.vit2d import (
            vit2d_small)
        from dino_video_summarization_transformer_tpu.train.ssl import (
            init_two_stream_state, make_two_stream_train_step)

        motion_cfg = vit2d_small(img_size=cfg.DATA.CROP_SIZE)
        pretrained_motion = None
        if args.pretrained_motion:
            pretrained_motion = convert.convert_dino_vit2d_checkpoint(
                args.pretrained_motion, motion_cfg)
            print(f"Loaded motion ViT from {args.pretrained_motion}")
        state, core, mask = init_two_stream_state(
            jax.random.key(args.seed), mcfg, motion_cfg,
            out_dim=args.out_dim, optimizer=args.optimizer,
            pretrained_backbone=pretrained_backbone,
            pretrained_motion=pretrained_motion)
        state = jax.device_put(state, replicated(mesh))
        step_fn = make_two_stream_train_step(
            mcfg, motion_cfg, core, mask,
            n_local_crops=args.local_crops_number, clip_grad=args.clip_grad,
            compute_dtype=compute_dtype, mesh=mesh, remat=args.use_remat)
    elif rand_fr:
        from dino_video_summarization_transformer_tpu.train.ssl import (
            make_rand_fr_train_step)

        state, core, mask = init_train_state(
            jax.random.key(args.seed), mcfg, out_dim=args.out_dim,
            optimizer=args.optimizer,
            pretrained_backbone=pretrained_backbone)
        state = jax.device_put(state, replicated(mesh))
        step_fn = make_rand_fr_train_step(
            mcfg, core, mask, clip_grad=args.clip_grad,
            compute_dtype=compute_dtype, mesh=mesh)
    else:
        state, core, mask = init_train_state(
            jax.random.key(args.seed), mcfg, out_dim=args.out_dim,
            optimizer=args.optimizer,
            pretrained_backbone=pretrained_backbone, two_token=two_token,
            cnn_distill_dim=1024 if (
                cnn_params is not None and args.cnn_distill_weight > 0) else 0)
        assert not (args.zero1 and args.model_parallel > 1), (
            "--zero1 and --model_parallel are exclusive (the TP tree "
            "already shards the moments over the model axis)")
        if args.model_parallel > 1:
            if fuse_tp:
                # head-sharded fused kernels: the qkv columns move to the
                # shard-major layout once (optimizer moments are zeros at
                # init — permutation-invariant; Orbax checkpoints carry
                # the permuted layout, unpermute_qkv_tree for export)
                from dino_video_summarization_transformer_tpu.parallel.\
                    tp_fused import (permute_qkv_tree,
                                     tp_fused_forward_features)

                state = state._replace(
                    student=permute_qkv_tree(
                        state.student, mcfg.num_heads, args.model_parallel),
                    teacher=permute_qkv_tree(
                        state.teacher, mcfg.num_heads, args.model_parallel))
                backbone_forward = partial(
                    tp_fused_forward_features, cfg=mcfg, mesh=mesh,
                    compute_dtype=compute_dtype)
                print(f"TP x{args.model_parallel}: head-sharded fused "
                      "kernels (parallel/tp_fused.py)", flush=True)
            state_sharding = tp_sharding_tree(state, mesh)
            state = shard_state(state, mesh)
        elif args.zero1:
            state_sharding = zero_sharding_tree(state, mesh)
            state = jax.device_put(state, state_sharding)
        else:
            state_sharding = None
            state = jax.device_put(state, replicated(mesh))
        step_fn = make_train_step(
            mcfg, core, mask,
            n_local_crops=2 if two_token else args.local_crops_number,
            clip_grad=args.clip_grad,
            compute_dtype=compute_dtype,
            mesh=mesh, remat=args.use_remat, two_token=two_token,
            cnn_params=cnn_params,
            cnn_distill_weight=args.cnn_distill_weight,
            state_sharding=state_sharding,
            backbone_forward=backbone_forward)

    # ---------------- schedules --------------------------------------------
    lr_sched, wd_sched, mom_sched = build_schedules(args, niter_per_ep)
    tt_sched = teacher_temp_schedule(
        args.warmup_teacher_temp, args.teacher_temp,
        args.warmup_teacher_temp_epochs, args.epochs)

    # ---------------- resume ------------------------------------------------
    ckpt_path = os.path.join(args.output_dir, "checkpoint")
    restored, run_vars = restore_checkpoint(ckpt_path, state)
    start_epoch = 0
    if restored is not None:
        if args.model_parallel > 1:
            state = shard_state(restored, mesh)
        elif args.zero1:
            state = jax.device_put(restored, zero_sharding_tree(restored, mesh))
        else:
            state = jax.device_put(restored, replicated(mesh))
        start_epoch = int(run_vars.get("epoch", 0))
        print(f"Resumed from {ckpt_path} at epoch {start_epoch}")

    # ---------------- observability ------------------------------------------
    # analytic FLOPs per step for achieved-TFLOP/s / MFU reporting (the
    # reference logs only iter time + GPU memory, ref: utils/utils.py:318-370)
    from dino_video_summarization_transformer_tpu.utils.flops import (
        V5E_PEAK_BF16, train_step_flops)

    if two_stream or rand_fr or two_token:
        step_flops = 0.0  # mixed-geometry steps: skip the analytic model
    else:
        step_flops = train_step_flops(
            mcfg, per_host * world,
            n_local_crops=args.local_crops_number, local_size_px=96)

    # ---------------- train loop -------------------------------------------
    start_time = time.time()
    tracing = False

    def stop_trace():
        nonlocal tracing
        jax.block_until_ready(state.student)
        jax.profiler.stop_trace()
        tracing = False
        print(f"profiler trace written to {args.profile_dir}", flush=True)

    for epoch in range(start_epoch, args.epochs):
        epoch_idx = shard_indices(len(dataset), jax.process_index(), world,
                                  shuffle=True, seed=args.seed + epoch,
                                  drop_last=True)
        loader = PrefetchLoader(dataset, indices=epoch_idx,
                                num_workers=args.num_workers,
                                batch_size=per_host, collate=collate)
        metric_logger = MetricLogger(delimiter="  ")
        header = f"Epoch: [{epoch}/{args.epochs}]"
        # NaN guard & meter updates are drained every SYNC_EVERY steps
        # instead of per step: a per-step float() would stall the dispatch
        # pipeline on TPU (the reference's loss.item() has the same cost on
        # GPU, ref: train_ssl.py:530; abort semantics are preserved within
        # a SYNC_EVERY-step window)
        SYNC_EVERY = 10
        pending = []  # (it, global_it, device metrics dict)

        def drain():
            for p_it, p_gi, p_metrics in pending:
                vals = {k: float(v) for k, v in p_metrics.items()}
                if not math.isfinite(vals["loss"]):
                    print(f"Loss is {vals['loss']}, stopping training",
                          flush=True)
                    if tracing:
                        stop_trace()  # flush the profile of the dying run
                    sys.exit(1)
                metric_logger.update(lr=lr_sched[p_gi], wd=wd_sched[p_gi],
                                     **vals)
            pending.clear()

        epoch_t0 = time.time()
        steps_done = 0
        for it, batch in enumerate(metric_logger.log_every(loader, 10, header)):
            if args.max_steps_per_epoch and it >= args.max_steps_per_epoch:
                break
            gi = min(epoch * niter_per_ep + it, len(lr_sched) - 1)
            if (args.profile_dir and not tracing
                    and gi == args.profile_start_step):
                jax.profiler.start_trace(args.profile_dir)
                tracing = True
            if tracing and gi >= args.profile_start_step + args.profile_steps:
                stop_trace()
            batch_dev = jax.device_put(
                jax.tree.map(jnp.asarray, batch), d_shard)
            step_args = (batch_dev,) if rand_fr else tuple(batch_dev)
            state, metrics = step_fn(
                state, *step_args,
                float(lr_sched[gi]), float(wd_sched[gi]), float(mom_sched[gi]),
                float(tt_sched[min(epoch, len(tt_sched) - 1)]),
                epoch < args.freeze_last_layer)
            pending.append((it, gi, metrics))
            steps_done += 1
            if len(pending) >= SYNC_EVERY:
                drain()
        drain()
        epoch_dt = time.time() - epoch_t0
        if step_flops and steps_done:
            achieved = step_flops * steps_done / epoch_dt
            n_chips = jax.device_count()
            mfu = achieved / (V5E_PEAK_BF16 * n_chips)
            print(f"epoch {epoch}: {achieved / 1e12:.1f} TFLOP/s over "
                  f"{n_chips} device(s), MFU {mfu:.1%} vs v5e bf16 peak",
                  flush=True)

        # checkpointing (ref: train_ssl.py:441-455). TP/ZeRO-1 shard the
        # state over mesh axes that can span hosts; save_checkpoint's
        # rank-0 jax.device_get cannot read non-fully-addressable arrays,
        # so EVERY process enters a jitted identity that re-replicates the
        # state (the collective gather) before rank 0 writes it.
        if state_sharding is not None and jax.process_count() > 1:
            ckpt_state = jax.jit(
                lambda s: s, out_shardings=replicated(mesh))(state)
        else:
            ckpt_state = state
        save_checkpoint(ckpt_path, ckpt_state, {"epoch": epoch + 1})
        if args.saveckp_freq and (epoch % args.saveckp_freq == 0):
            save_checkpoint(
                os.path.join(args.output_dir, f"checkpoint{epoch:04d}"),
                ckpt_state, {"epoch": epoch + 1})
        del ckpt_state

        metric_logger.synchronize_between_processes()
        train_stats = {k: m.global_avg for k, m in metric_logger.meters.items()}
        log_stats = {**{f"train_{k}": v for k, v in train_stats.items()},
                     "epoch": epoch}
        if step_flops and steps_done:
            log_stats["achieved_tflops"] = round(
                step_flops * steps_done / epoch_dt / 1e12, 2)
            log_stats["mfu_vs_v5e_bf16_peak"] = round(
                step_flops * steps_done / epoch_dt
                / (V5E_PEAK_BF16 * jax.device_count()), 4)
        if (args.knn_eval_freq and args.knn_data_path
                and (epoch % args.knn_eval_freq == 0 or epoch == args.epochs - 1)):
            log_stats.update(online_knn_eval(
                args, cfg, mcfg, jax.device_get(state.teacher)["backbone"],
                epoch))
        if is_main_process():
            with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(log_stats) + "\n")

    if tracing:
        # the run ended inside the trace window (few steps or
        # max_steps_per_epoch) — flush the trace instead of dropping it
        stop_trace()
    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training time {total}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser("DINO-SVT", parents=[get_args_parser()])
    args = parser.parse_args()
    train_svt(args)
