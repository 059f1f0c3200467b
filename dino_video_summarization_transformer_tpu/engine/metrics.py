"""Accuracy metrics (ref: utils/metrics.py:8-94, utils/utils.py:472-479)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def topks_correct(preds: np.ndarray, labels: np.ndarray, ks: Sequence[int]) -> List[float]:
    """Number of top-k correct predictions per k (ref: utils/metrics.py:8-34)."""
    assert preds.shape[0] == labels.shape[0]
    max_k = max(ks)
    order = np.argsort(-preds, axis=1)[:, :max_k]  # (N, max_k)
    correct = order == labels[:, None]
    return [float(correct[:, :k].sum()) for k in ks]


def topk_errors(preds, labels, ks):
    """(ref: utils/metrics.py:37-47)."""
    num_correct = topks_correct(preds, labels, ks)
    return [(1.0 - x / preds.shape[0]) * 100.0 for x in num_correct]


def topk_accuracies(preds, labels, ks):
    """(ref: utils/metrics.py:50-60)."""
    num_correct = topks_correct(preds, labels, ks)
    return [(x / preds.shape[0]) * 100.0 for x in num_correct]


def accuracy(output: np.ndarray, target: np.ndarray, topk=(1,)):
    """(ref: utils/utils.py:472-479) — percentage top-k accuracy."""
    return topk_accuracies(output, target, topk)


def get_map(preds: np.ndarray, labels: np.ndarray) -> float:
    """Multi-label mAP (ref: utils/meters.py:195-216)."""
    from sklearn.metrics import average_precision_score

    preds = preds[:, ~(np.all(labels == 0, axis=0))]
    labels = labels[:, ~(np.all(labels == 0, axis=0))]
    aps = [0.0]
    try:
        aps = average_precision_score(labels, preds, average=None)
    except ValueError:
        print("Average precision requires a sufficient number of samples")
    return float(np.mean(aps))
