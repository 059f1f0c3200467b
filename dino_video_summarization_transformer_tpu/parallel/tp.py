"""Tensor-parallel (Megatron-style) sharding specs for the ViT train path.

The reference implements only data parallelism (SURVEY.md section 2.4); the
mesh here has always carried an extra ``model`` axis so tensor parallelism
could be layered on without re-plumbing callers (parallel/mesh.py). This
module populates that axis: path-based PartitionSpecs over the parameter
pytree following the Megatron pairing —

* column-parallel: ``qkv`` and ``mlp.fc1`` kernels/biases shard their
  OUTPUT features (last axis) — each chip computes a head/hidden slice;
* row-parallel: ``attn.proj`` and ``mlp.fc2`` kernels shard their INPUT
  features (contract axis) — XLA inserts the all-reduce that completes the
  partial matmul products (biases replicated, applied once);
* the DINO head's 65k-dim weight-normed last layer (the single largest
  tensor in the model) sharded over its output dim;
* everything else (LayerNorms, embeddings, cls token, patch embed,
  temporal_fc) replicated — they are small and feed both phases.

These are ANNOTATIONS, not a manual comm schedule: under jit/GSPMD the math
is unchanged and XLA places psum/all-gather over the mesh's model axis
(ICI). The specs are applied by PATH SUFFIX, so the same rules cover the
student, the teacher EMA copy, and the optimizer moments (optax mu/nu
mirror the parameter subtree names).

Shapes are block-stacked (L, ..., D) for the lax.scan over depth
(models/timesformer.py); the rules index axes from the END so stacking is
transparent. The fused Pallas kernels run per-device full-width and are
not TP-aware — tensor parallelism is an XLA-path feature (use_fused off),
which is also the training default for sharded runs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path_parts, leaf, axis: str, axis_size: int) -> P:
    """PartitionSpec for one parameter leaf, by its pytree path suffix."""
    name = path_parts[-1] if path_parts else ""
    module = path_parts[-2] if len(path_parts) >= 2 else ""

    def shard(dim_from_end: int) -> P:
        ndim = getattr(leaf, "ndim", 0)
        if ndim < dim_from_end:
            return P()
        dim = ndim - dim_from_end
        # uneven shards are legal under GSPMD but pad silently; keep the
        # even-divisibility contract explicit so a bad mesh size falls
        # back to replication instead of padded shards
        if leaf.shape[dim] % axis_size != 0:
            return P()
        spec = [None] * ndim
        spec[dim] = axis
        return P(*spec)

    # column-parallel (output-feature sharded): qkv + first MLP linear —
    # covers the backbone blocks AND the DINO head's hidden layers
    if module in ("qkv", "fc1") and name in ("kernel", "bias"):
        return shard(1)
    # row-parallel (input-feature sharded): attention output projection +
    # second MLP linear; bias replicated (added once, post-reduce).
    # patch_embed.proj is a different module (replicated); cnn_proj too.
    if module == "proj" and name == "kernel" and "patch_embed" not in path_parts:
        return shard(2)
    if module == "fc2" and name == "kernel":
        return shard(2)
    # DINO head weight-normed last layer: (bottleneck, out_dim) + (out_dim,)
    if module == "last_layer" and name in ("weight_v", "weight_g"):
        return shard(1)
    return P()


def tp_spec_tree(tree: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Pytree of PartitionSpecs for ``tree`` (params, or anything that
    embeds param-shaped subtrees, e.g. a whole TrainState including the
    optimizer moments). Leaves whose path suffix matches no rule — or whose
    sharded dim is not divisible by the axis size — are replicated."""
    axis_size = mesh.shape[axis]

    def spec(path, leaf):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return _spec_for_path(parts, leaf, axis, axis_size)

    return jax.tree_util.tree_map_with_path(spec, tree)


def tp_sharding_tree(tree: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Like tp_spec_tree but returns NamedShardings (for jit in/out
    shardings and jax.device_put)."""
    specs = tp_spec_tree(tree, mesh, axis)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_state(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put a TrainState (or params pytree) with TP shardings."""
    return jax.device_put(state, tp_sharding_tree(state, mesh, axis))
