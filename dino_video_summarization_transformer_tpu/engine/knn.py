"""Feature extraction + weighted kNN evaluation (ref: eval_knn.py:30-190).

TPU design: feature extraction shares the compiled TimeSformer forward and
shards the batch over the data mesh axis; the reference's async all_gather +
index_copy (ref: eval_knn.py:111-132) becomes a jit-sharded forward whose
output is simply device-gathered — under SPMD the gather is XLA's problem.
The kNN vote is one jitted chunked matmul + top-k, replacing the torch
scatter/one-hot loop (ref: eval_knn.py:138-178) with a segment-sum.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import timesformer as tsf


def extract_features(
    params,
    model_cfg: tsf.TimeSformerConfig,
    dataset,
    batch_size: int = 8,
    num_workers: int = 4,
    compute_dtype=jnp.float32,
    mesh: Optional["jax.sharding.Mesh"] = None,
    log_every: int = 10,
) -> np.ndarray:
    """Run the backbone over a dataset, returning (N, D) float32 features.

    With a mesh, inputs are sharded along the batch dim (data axis) so the
    forward runs SPMD across chips (ref: eval_knn.py:94-135's DDP+all_gather
    protocol collapses into sharded jit).
    """
    from ..data.loader import PrefetchLoader

    n = len(dataset)
    feats_out = np.zeros((n, model_cfg.embed_dim), np.float32)

    fwd = jax.jit(partial(tsf.forward, cfg=model_cfg, compute_dtype=compute_dtype))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        fwd = jax.jit(
            partial(tsf.forward, cfg=model_cfg, compute_dtype=compute_dtype),
            in_shardings=(replicated, data_sharding),
            out_shardings=data_sharding,
        )

    def collate(items):
        clips = np.stack([it[0] for it in items])
        idxs = np.asarray([it[1] for it in items])
        return clips, idxs

    loader = PrefetchLoader(dataset, num_workers=num_workers,
                            batch_size=batch_size, collate=collate)
    pad_to = batch_size
    for i, (clips, idxs) in enumerate(loader):
        b = clips.shape[0]
        if b < pad_to:  # static shapes: pad the tail batch
            clips = np.pad(clips, ((0, pad_to - b),) + ((0, 0),) * (clips.ndim - 1))
        out = fwd(params, jnp.asarray(clips, compute_dtype))
        feats_out[idxs] = np.asarray(out[:b], np.float32)
        if log_every and i % log_every == 0:
            print(f"extract {i + 1}/{len(loader)}", flush=True)
    return feats_out


def knn_classifier(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
    k: int,
    T: float,
    num_classes: int = 1000,
    num_chunks: int = 100,
) -> Tuple[float, float]:
    """Temperature-weighted kNN vote (ref: eval_knn.py:138-178).

    Same math: cosine similarity (features assumed L2-normalized), top-k,
    exp(sim/T)-weighted one-hot vote, top-1/top-5 accuracy. Chunked over the
    test set; one jitted program handles all equally-sized chunks.
    """
    train_features = jnp.asarray(train_features)
    train_labels_j = jnp.asarray(train_labels)
    n_test = test_labels.shape[0]
    imgs_per_chunk = max(n_test // num_chunks, 1)

    k = min(k, train_features.shape[0])
    top_n = min(5, num_classes)

    @jax.jit
    def vote(feats):
        sim = feats @ train_features.T  # (B, Ntrain)
        dist, idx = jax.lax.top_k(sim, k)
        neigh = train_labels_j[idx]  # (B, k)
        w = jnp.exp(dist / T)
        one_hot = jax.nn.one_hot(neigh, num_classes, dtype=w.dtype)
        probs = jnp.sum(one_hot * w[..., None], axis=1)  # (B, C)
        return jax.lax.top_k(probs, top_n)[1]

    top1 = top5 = total = 0
    for start in range(0, n_test, imgs_per_chunk):
        stop = min(start + imgs_per_chunk, n_test)
        feats = jnp.asarray(test_features[start:stop])
        b = stop - start
        if b < imgs_per_chunk:
            feats = jnp.pad(feats, ((0, imgs_per_chunk - b), (0, 0)))
        preds = np.asarray(vote(feats))[:b]
        targets = test_labels[start:stop]
        correct = preds == targets[:, None]
        top1 += int(correct[:, 0].sum())
        top5 += int(correct[:, :top_n].sum())
        total += b
    return top1 * 100.0 / total, top5 * 100.0 / total


def l2_normalize(x: np.ndarray) -> np.ndarray:
    """(ref: eval_knn.py:79) F.normalize(dim=1, p=2)."""
    return x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
