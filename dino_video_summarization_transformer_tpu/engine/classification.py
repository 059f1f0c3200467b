"""TimeSformer video classification: preprocessing, evaluation, finetuning.

Covers the reference's selection-quality evaluation and finetuning stacks
(ref: timesformer_evaluation.py:13-109, timesformer_finetuning.py:13-104),
which drive a HuggingFace TimesformerForVideoClassification. Here the same
classification runs on the framework's own compiled TimeSformer with an
HF-layout checkpoint converter (models/convert.py) — no torch runtime on
the hot path.
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import timesformer as tsf


def hf_video_preprocess(
    frames: np.ndarray,
    size: int = 224,
    mean=(0.45, 0.45, 0.45),
    std=(0.225, 0.225, 0.225),
) -> np.ndarray:
    """HF VideoMAE/Timesformer processor semantics
    (ref: timesformer_evaluation.py:60, 89: AutoImageProcessor(video)):
    PIL-bilinear resize of the shortest edge to ``size``, center crop,
    rescale 1/255, normalize. frames (T, H, W, C) uint8 ->
    (T, C, size, size) float32."""
    from PIL import Image

    out = np.empty((frames.shape[0], size, size, 3), np.float32)
    for i, fr in enumerate(frames):
        img = Image.fromarray(fr)
        w, h = img.size
        # HF get_resize_output_image_size truncates the long edge
        if w < h:
            nw, nh = size, int(h * size / w)
        else:
            nw, nh = int(w * size / h), size
        img = img.resize((nw, nh), Image.BILINEAR)
        left = (nw - size) // 2
        top = (nh - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out[i] = np.asarray(img, np.float32) / 255.0
    out = (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return np.moveaxis(out, -1, 1)  # (T, C, H, W)


def make_classifier_fn(params, model_cfg: tsf.TimeSformerConfig,
                       compute_dtype=jnp.float32):
    """Jitted logits fn over (B, T, C, H, W) HF-style pixel_values."""

    @jax.jit
    def fn(pixel_values):
        x = pixel_values.transpose(0, 2, 1, 3, 4)  # -> (B, C, T, H, W)
        return tsf.forward(params, x.astype(compute_dtype), model_cfg,
                           use_head=True)

    return fn


def evaluate_selection(
    dataset,
    params,
    model_cfg: tsf.TimeSformerConfig,
    num_frames: int = 16,
    log_path: Optional[str] = None,
    log_every: int = 250,
    compute_dtype=jnp.float32,
    batch_size: int = 1,
    limit: Optional[int] = None,
) -> float:
    """Selection-quality evaluation (ref: timesformer_evaluation.py:33-109):
    for each video, re-decode ONLY the selected frame indices, preprocess,
    classify, accumulate top-1 accuracy; running log every ``log_every``.
    """
    from ..data import video as vio

    logger = logging.getLogger("selection_eval")
    if log_path:
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        handler = logging.FileHandler(log_path)
        handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)

    clf = make_classifier_fn(params, model_cfg, compute_dtype)
    correct = total = 0
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        indices, label, file_name = dataset[i]
        path = dataset._path_to_videos[i]
        try:
            frames = vio.read_video_indices(path, indices)
        except vio.DecodeError:
            total += 1
            continue
        clips = hf_video_preprocess(frames)
        # zero-pad short videos to num_frames (ref: timesformer_evaluation.py:83-86)
        if clips.shape[0] < num_frames:
            pad = num_frames - clips.shape[0]
            clips = np.concatenate(
                [clips, np.zeros((pad,) + clips.shape[1:], np.float32)])
        logits = np.asarray(clf(jnp.asarray(clips[None])))
        pred = int(logits[0].argmax())
        correct += int(pred == int(label))
        total += 1
        if log_every and total % log_every == 0:
            logger.info(
                f"processed {total}/{n}, running top-1: "
                f"{100.0 * correct / total:.2f}% ({correct}/{total})")
    acc = 100.0 * correct / max(total, 1)
    msg = f"final top-1 accuracy: {acc:.2f}% ({correct}/{total})"
    print(msg, flush=True)
    if log_path:
        logger.info(msg)
    return acc


def finetune(
    train_dataset,
    val_dataset,
    params,
    model_cfg: tsf.TimeSformerConfig,
    output_dir: str,
    num_epochs: int = 5,
    batch_size: int = 4,
    lr: float = 5e-5,
    warmup_steps: int = 500,
    weight_decay: float = 0.01,
    num_workers: int = 4,
    compute_dtype=jnp.float32,
    max_steps_per_epoch: int = 0,
    log_every: int = 500,
):
    """Supervised finetune of the classification model on selected frames
    (ref: timesformer_finetuning.py:61-104). Mirrors HF Trainer defaults:
    AdamW, linear warmup->linear decay, per-epoch eval, log history JSON
    whose entries carry the HF Trainer key sets (loss/learning_rate/epoch/
    step and eval_loss/eval_runtime/eval_samples_per_second/
    eval_steps_per_second/epoch/step — the schema of the reference's
    committed eval_logs/training_log_history.json). Returns
    (params, log_history).
    """
    import optax

    from ..data.loader import PrefetchLoader

    os.makedirs(output_dir, exist_ok=True)
    steps_per_epoch = max(len(train_dataset) // batch_size, 1)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    total_steps = steps_per_epoch * num_epochs
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
        [warmup_steps])
    opt = optax.adamw(sched, weight_decay=weight_decay)
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        xt = x.transpose(0, 2, 1, 3, 4).astype(compute_dtype)
        logits = tsf.forward(p, xt, model_cfg, use_head=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y).mean()

    @jax.jit
    def train_step(p, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    eval_loss_fn = jax.jit(loss_fn)

    def collate(items):
        return (np.stack([it["pixel_values"] for it in items]),
                np.asarray([it["label"] for it in items]))

    log_history = []
    step = 0
    t_train = time.time()
    loss_sum = 0.0
    for epoch in range(num_epochs):
        loader = PrefetchLoader(train_dataset, num_workers=num_workers,
                                batch_size=batch_size, collate=collate)
        for it, (x, y) in enumerate(loader):
            if it >= steps_per_epoch or x.shape[0] < batch_size:
                break
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(x), jnp.asarray(y))
            step += 1
            loss_sum += float(loss)
            if log_every and step % log_every == 0:
                log_history.append({
                    "loss": float(loss),
                    "learning_rate": float(sched(step)),
                    "epoch": epoch + it / steps_per_epoch, "step": step})
        # per-epoch eval (evaluation_strategy="epoch")
        eval_losses = []
        t_eval = time.time()
        vloader = PrefetchLoader(val_dataset, num_workers=num_workers,
                                 batch_size=batch_size, collate=collate)
        for x, y in vloader:
            if x.shape[0] < batch_size:
                continue
            eval_losses.append(float(eval_loss_fn(
                params, jnp.asarray(x), jnp.asarray(y))))
        eval_runtime = max(time.time() - t_eval, 1e-9)
        log_history.append({
            "eval_loss": float(np.mean(eval_losses)) if eval_losses else math.nan,
            "eval_runtime": eval_runtime,
            "eval_samples_per_second": len(eval_losses) * batch_size
            / eval_runtime,
            "eval_steps_per_second": len(eval_losses) / eval_runtime,
            "epoch": epoch + 1.0, "step": step})
        print(f"epoch {epoch + 1}: eval_loss="
              f"{log_history[-1]['eval_loss']:.4f}", flush=True)

    # HF Trainer's end-of-train summary entry (the third key set in the
    # reference's committed log); total_flos uses the standard fwd+bwd ~=
    # 3x forward accounting
    from ..utils.flops import timesformer_forward_flops

    train_runtime = max(time.time() - t_train, 1e-9)
    log_history.append({
        "train_loss": loss_sum / max(step, 1),
        "train_runtime": train_runtime,
        "train_samples_per_second": step * batch_size / train_runtime,
        "train_steps_per_second": step / train_runtime,
        "total_flos": 3.0 * timesformer_forward_flops(
            model_cfg, model_cfg.num_frames) * batch_size * step,
        "epoch": float(num_epochs), "step": step})

    with open(os.path.join(output_dir, "training_log_history.json"), "w") as f:
        json.dump(log_history, f)
    return params, log_history
