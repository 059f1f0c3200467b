"""PyTorch checkpoint -> JAX pytree conversion, with the reference's
weight-surgery rules (ref: models/helpers.py:17-201, utils/utils.py:71-99).

Handles:
  * prefix stripping (``module.``, ``backbone.``, ``model.``) and checkpoint
    sub-dict selection (``teacher`` / ``student`` / ``model``)
  * Conv2d patch-embed weight (D, C, ps, ps) -> matmul kernel (ps*ps*C, D)
  * nn.Linear weight (out, in) -> kernel (in, out)
  * pos_embed 1-D nearest resize and time_embed nearest resize on geometry
    mismatch (ref: models/helpers.py:166-179)
  * temporal-attention bootstrap: copy ``attn.*`` -> ``temporal_attn.*`` and
    ``norm1.*`` -> ``temporal_norm1.*`` when the checkpoint lacks them
    (ref: models/helpers.py:182-197)
  * stacking per-block weights along the leading depth axis for lax.scan
  * DINOHead weight-norm reparameterization (weight_g/weight_v)

Works on any mapping of name -> array-like (torch tensors, numpy arrays, or
a torch ``state_dict``); torch is only imported lazily to load ``.pth`` files.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, Mapping

import numpy as np

from .timesformer import TimeSformerConfig


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_torch_state_dict(path: str, checkpoint_key: str | None = None) -> Dict[str, np.ndarray]:
    """Load a .pth file into a flat name->ndarray dict.

    checkpoint_key selects a sub-dict (e.g. "teacher", ref: eval_knn.py:64-69);
    falls back to "model" / "state_dict" / the root mapping.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ([checkpoint_key] if checkpoint_key else []) + ["model", "state_dict"]:
            if key and key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return {k: _to_np(v) for k, v in ckpt.items() if hasattr(v, "shape") or hasattr(v, "detach")}


def strip_prefixes(sd: Mapping[str, np.ndarray], prefixes=("module.", "backbone.", "model.")) -> Dict[str, np.ndarray]:
    """Iteratively strip known wrapper prefixes (ref: models/helpers.py:17-48)."""
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            while k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def select_backbone(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Keep only 'backbone.'-prefixed entries, stripped — the SVT checkpoint
    layout (ref: dino_similarity.py:33, scripts/train.sh)."""
    return {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}


def _interp_nearest_np(src: np.ndarray, out_len: int, axis: int) -> np.ndarray:
    in_len = src.shape[axis]
    idx = np.floor(np.arange(out_len) * (in_len / out_len)).astype(np.int64)
    return np.take(src, idx, axis=axis)


def apply_surgery(
    sd: Dict[str, np.ndarray],
    cfg: TimeSformerConfig,
) -> Dict[str, np.ndarray]:
    """Reference load_pretrained surgery (ref: models/helpers.py:166-197)."""
    sd = dict(sd)

    # classifier resize/drop (ref: models/helpers.py:149-163)
    if "head.weight" in sd and (
        cfg.num_classes == 0 or sd["head.weight"].shape[0] != cfg.num_classes
    ):
        sd.pop("head.weight", None)
        sd.pop("head.bias", None)

    # pos_embed 1-D nearest resize over the token axis
    if "pos_embed" in sd and sd["pos_embed"].shape[1] != cfg.num_patches + 1:
        pe = sd["pos_embed"]
        cls_pe, other = pe[:, :1, :], pe[:, 1:, :]
        other = _interp_nearest_np(other, cfg.num_patches, axis=1)
        sd["pos_embed"] = np.concatenate([cls_pe, other], axis=1)

    # time_embed nearest resize
    if "time_embed" in sd and sd["time_embed"].shape[1] != cfg.num_frames:
        sd["time_embed"] = _interp_nearest_np(sd["time_embed"], cfg.num_frames, axis=1)

    # temporal attention bootstrap from spatial weights
    if cfg.attention_type == "divided_space_time":
        for key in list(sd.keys()):
            if "blocks" in key and "attn" in key and "temporal" not in key:
                nk = key.replace("attn", "temporal_attn")
                if nk not in sd:
                    sd[nk] = sd[key]
            if "blocks" in key and "norm1" in key and "temporal" not in key:
                nk = key.replace("norm1", "temporal_norm1")
                if nk not in sd:
                    sd[nk] = sd[key]
    return sd


_BLOCK_RE = re.compile(r"^blocks\.(\d+)\.(.+)$")


def _linear_to_jax(sd, prefix):
    p = {"kernel": sd[prefix + ".weight"].T}
    if prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"]
    return p


def _ln_to_jax(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def timesformer_to_pytree(
    sd: Mapping[str, np.ndarray], cfg: TimeSformerConfig, dtype=np.float32
) -> Dict[str, Any]:
    """Map a (surgered) TimeSformer state_dict to the stacked-block pytree."""
    sd = {k: np.asarray(v, dtype=dtype) for k, v in sd.items()}

    # group block weights by index
    block_sd: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = _BLOCK_RE.match(k)
        if m:
            block_sd.setdefault(int(m.group(1)), {})[m.group(2)] = v
    depth = cfg.depth
    assert len(block_sd) == depth, f"expected {depth} blocks, got {len(block_sd)}"

    def stacked(fn):
        per = [fn(block_sd[i]) for i in range(depth)]
        import jax
        return jax.tree.map(lambda *xs: np.stack(xs), *per)

    blocks = {
        "norm1": stacked(lambda b: _ln_to_jax(b, "norm1")),
        "attn": stacked(
            lambda b: {
                "qkv": _linear_to_jax(b, "attn.qkv"),
                "proj": _linear_to_jax(b, "attn.proj"),
            }
        ),
        "norm2": stacked(lambda b: _ln_to_jax(b, "norm2")),
        "mlp": stacked(
            lambda b: {
                "fc1": _linear_to_jax(b, "mlp.fc1"),
                "fc2": _linear_to_jax(b, "mlp.fc2"),
            }
        ),
    }
    if cfg.attention_type == "divided_space_time":
        blocks["temporal_norm1"] = stacked(lambda b: _ln_to_jax(b, "temporal_norm1"))
        blocks["temporal_attn"] = stacked(
            lambda b: {
                "qkv": _linear_to_jax(b, "temporal_attn.qkv"),
                "proj": _linear_to_jax(b, "temporal_attn.proj"),
            }
        )
        blocks["temporal_fc"] = stacked(lambda b: _linear_to_jax(b, "temporal_fc"))

    # patch embed: Conv2d (D, C, ps, ps) -> (ps*ps*C -> wait: patch vector is
    # (ph, pw, c) flattened; conv sums w[d, c, kh, kw] * x[c, kh, kw], so
    # kernel[(kh*ps + kw)*C + c, d] = w[d, c, kh, kw] == transpose(2, 3, 1, 0)
    w = sd["patch_embed.proj.weight"]
    Dp, C, ps, _ = w.shape
    pe_kernel = w.transpose(2, 3, 1, 0).reshape(ps * ps * C, Dp)

    params: Dict[str, Any] = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {"proj": {"kernel": pe_kernel, "bias": sd["patch_embed.proj.bias"]}},
        "blocks": blocks,
        "norm": _ln_to_jax(sd, "norm"),
    }
    if "time_embed" in sd:
        params["time_embed"] = sd["time_embed"]
    if "head.weight" in sd and cfg.num_classes > 0:
        params["head"] = _linear_to_jax(sd, "head")
    return params


def dino_head_to_pytree(sd: Mapping[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """DINOHead state_dict -> pytree (ref: vision_transformer.py:248-282).

    torch weight_norm stores weight_g (out,1) and weight_v (out,in); the
    effective weight is g * v / ||v||_row.
    """
    sd = {k[len(prefix):]: np.asarray(v, np.float32) for k, v in sd.items() if k.startswith(prefix)}
    layers = {}
    i = 0
    while f"mlp.{i}.weight" in sd or (i == 0 and "mlp.weight" in sd):
        if "mlp.weight" in sd:  # nlayers == 1: plain Linear
            layers["fc0"] = _linear_to_jax(sd, "mlp")
            break
        layers[f"fc{len(layers)}"] = _linear_to_jax(sd, f"mlp.{i}")
        i += 2  # skip GELU modules in nn.Sequential numbering
    g = sd["last_layer.weight_g"]  # (out, 1)
    v = sd["last_layer.weight_v"]  # (out, in)
    return {
        "mlp": layers,
        "last_layer": {"weight_g": g[:, 0], "weight_v": v.T},  # store v as (in, out)
    }


_HF_BLOCK_MAP = [
    # order matters: most specific first
    ("attention.attention.qkv.", "attn.qkv."),
    ("attention.output.dense.", "attn.proj."),
    ("temporal_attention.attention.qkv.", "temporal_attn.qkv."),
    ("temporal_attention.output.dense.", "temporal_attn.proj."),
    ("temporal_dense.", "temporal_fc."),
    ("temporal_layernorm.", "temporal_norm1."),
    ("layernorm_before.", "norm1."),
    ("layernorm_after.", "norm2."),
    ("intermediate.dense.", "mlp.fc1."),
    ("output.dense.", "mlp.fc2."),
]


def hf_timesformer_state_dict_to_reference(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename a HuggingFace Timesformer state_dict into the reference naming
    scheme so the standard surgery/pytree path applies
    (HF `transformers` TimesformerModel layout; consumed by the evaluation
    CLIs the reference drives with TimesformerForVideoClassification,
    ref: timesformer_evaluation.py:60-62)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("timesformer.embeddings."):
            tail = k[len("timesformer.embeddings."):]
            tail = {
                "cls_token": "cls_token",
                "position_embeddings": "pos_embed",
                "time_embeddings": "time_embed",
                "patch_embeddings.projection.weight": "patch_embed.proj.weight",
                "patch_embeddings.projection.bias": "patch_embed.proj.bias",
            }[tail]
            out[tail] = v
        elif k.startswith("timesformer.encoder.layer."):
            rest = k[len("timesformer.encoder.layer."):]
            idx, sub = rest.split(".", 1)
            for src, dst in _HF_BLOCK_MAP:
                if sub.startswith(src):
                    sub = dst + sub[len(src):]
                    break
            out[f"blocks.{idx}.{sub}"] = v
        elif k.startswith("timesformer.layernorm."):
            out["norm." + k[len("timesformer.layernorm."):]] = v
        elif k.startswith("classifier."):
            out["head." + k[len("classifier."):]] = v
    return out


def convert_hf_timesformer(path_or_sd, cfg: TimeSformerConfig):
    """HF Timesformer checkpoint (directory with safetensors/bin, or a
    state_dict mapping) -> stacked-block pytree."""
    if isinstance(path_or_sd, str):
        import os

        if os.path.isdir(path_or_sd):
            sd = _load_hf_dir(path_or_sd)
        else:
            sd = load_torch_state_dict(path_or_sd)
    else:
        sd = {k: _to_np(v) for k, v in path_or_sd.items()}
    sd = hf_timesformer_state_dict_to_reference(sd)
    sd = apply_surgery(sd, cfg)
    return timesformer_to_pytree(sd, cfg)


def _load_hf_dir(path: str) -> Dict[str, np.ndarray]:
    import os

    st = os.path.join(path, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return load_file(st)
    bin_path = os.path.join(path, "pytorch_model.bin")
    return load_torch_state_dict(bin_path)


def convert_svt_checkpoint(path: str, cfg: TimeSformerConfig, checkpoint_key: str | None = "teacher"):
    """End-to-end: .pth -> backbone pytree with full surgery."""
    sd = load_torch_state_dict(path, checkpoint_key)
    if any(k.startswith("backbone.") for k in sd):
        sd = select_backbone(sd)
    else:
        sd = strip_prefixes(sd)
    sd = apply_surgery(sd, cfg)
    return timesformer_to_pytree(sd, cfg)


def convert_coclr_s3d(path: str):
    """CoCLR S3D checkpoint -> pytree: keep only the encoder_q.0. subtree
    like the reference (ref: train_ssl.py:263-271)."""
    from .s3d import s3d_to_pytree

    sd = load_torch_state_dict(path, checkpoint_key="state_dict")
    new = {k[len("encoder_q.0."):]: v for k, v in sd.items()
           if k.startswith("encoder_q.0.")}
    return s3d_to_pytree(new)


def convert_dino_vit2d_checkpoint(path: str, cfg):
    """Published DINO 2D-ViT .pth (e.g. dino_deitsmall16_pretrain) ->
    vit2d pytree (ref: train_ssl.py:222-231 motion nets)."""
    from .vit2d import vit2d_to_pytree

    sd = strip_prefixes(load_torch_state_dict(path))
    return vit2d_to_pytree(sd, cfg)


def pytree_to_reference_state_dict(
    params: Mapping[str, Any], cfg: TimeSformerConfig
) -> Dict[str, np.ndarray]:
    """Inverse of ``timesformer_to_pytree``: export a JAX backbone pytree
    as a reference-layout TimeSformer state_dict (torch naming, (out, in)
    linear weights, (D, C, ps, ps) conv patch embed).

    Two uses: (a) checkpoints trained HERE can be consumed by the PyTorch
    reference / its published tooling (the interop direction SURVEY §5
    checkpointing doesn't cover); (b) the real-asset validation harness
    synthesizes reference-layout .pth stand-ins for its dry-run
    (tools/validate_real_assets.py). Roundtrip is pinned by
    tests/test_real_asset_harness.py.
    """
    out: Dict[str, np.ndarray] = {}

    def np32(x):
        return np.asarray(x, np.float32)

    def put_linear(prefix, p):
        out[prefix + ".weight"] = np32(p["kernel"]).T
        if "bias" in p:
            out[prefix + ".bias"] = np32(p["bias"])

    def put_ln(prefix, p):
        out[prefix + ".weight"] = np32(p["scale"])
        out[prefix + ".bias"] = np32(p["bias"])

    out["cls_token"] = np32(params["cls_token"])
    out["pos_embed"] = np32(params["pos_embed"])
    if "time_embed" in params:
        out["time_embed"] = np32(params["time_embed"])

    k = np32(params["patch_embed"]["proj"]["kernel"])
    ps = cfg.patch_size
    C = cfg.in_chans
    D = k.shape[-1]
    # kernel[(kh*ps + kw)*C + c, d] -> w[d, c, kh, kw] (see
    # timesformer_to_pytree's derivation)
    out["patch_embed.proj.weight"] = (
        k.reshape(ps, ps, C, D).transpose(3, 2, 0, 1))
    out["patch_embed.proj.bias"] = np32(params["patch_embed"]["proj"]["bias"])

    blocks = params["blocks"]
    for i in range(cfg.depth):
        b = jax_tree_index(blocks, i)
        pre = f"blocks.{i}."
        put_ln(pre + "norm1", b["norm1"])
        put_linear(pre + "attn.qkv", b["attn"]["qkv"])
        put_linear(pre + "attn.proj", b["attn"]["proj"])
        put_ln(pre + "norm2", b["norm2"])
        put_linear(pre + "mlp.fc1", b["mlp"]["fc1"])
        put_linear(pre + "mlp.fc2", b["mlp"]["fc2"])
        if "temporal_attn" in b:
            put_ln(pre + "temporal_norm1", b["temporal_norm1"])
            put_linear(pre + "temporal_attn.qkv", b["temporal_attn"]["qkv"])
            put_linear(pre + "temporal_attn.proj", b["temporal_attn"]["proj"])
            put_linear(pre + "temporal_fc", b["temporal_fc"])
    put_ln("norm", params["norm"])
    if "head" in params:
        put_linear("head", params["head"])
    return out


def jax_tree_index(tree: Any, i: int) -> Any:
    """Index every leaf's leading (stacked-depth) axis."""
    import jax

    return jax.tree.map(lambda a: np.asarray(a)[i], tree)


def save_reference_checkpoint(path: str, params, cfg: TimeSformerConfig,
                              checkpoint_key: str = "teacher",
                              prefix: str = "backbone.") -> None:
    """Write ``params`` as a reference-consumable .pth: the published SVT
    layout ({checkpoint_key: {prefix + name: tensor}}) that
    convert_svt_checkpoint (and the PyTorch reference's own loaders,
    ref: utils/utils.py:71-99) read back."""
    import torch

    sd = pytree_to_reference_state_dict(params, cfg)
    payload = {checkpoint_key: {prefix + k: torch.from_numpy(v.copy())
                                for k, v in sd.items()}}
    torch.save(payload, path)
