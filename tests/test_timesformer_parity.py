"""Numerical parity of the JAX TimeSformer vs the PyTorch reference.

The reference implementation at /root/reference is imported (read-only) as
the oracle: we randomly initialize the torch model, convert its state_dict
through models/convert.py, and compare forward activations.
"""

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

torch = pytest.importorskip("torch")

from models.timesformer import VisionTransformer as TorchVisionTransformer  # noqa: E402  (reference oracle)
from functools import partial  # noqa: E402
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.models import timesformer as tsf  # noqa: E402
from dino_video_summarization_transformer_tpu.models import convert  # noqa: E402


def build_pair(img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
               num_frames=4, num_classes=10, attention_type="divided_space_time",
               seed=0):
    torch.manual_seed(seed)
    tmodel = TorchVisionTransformer(
        img_size=img_size, patch_size=patch_size, num_classes=num_classes,
        embed_dim=embed_dim, depth=depth, num_heads=num_heads, mlp_ratio=4,
        qkv_bias=True, norm_layer=partial(nn.LayerNorm, eps=1e-6),
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.1,
        num_frames=num_frames, attention_type=attention_type,
    ).eval()
    # randomize embeddings that the reference zero-initializes, to make the
    # parity check meaningful
    with torch.no_grad():
        tmodel.pos_embed.normal_(std=0.02)
        tmodel.cls_token.normal_(std=0.02)
        if hasattr(tmodel, "time_embed"):
            tmodel.time_embed.normal_(std=0.02)

    jcfg = tsf.TimeSformerConfig(
        img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
        depth=depth, num_heads=num_heads, num_frames=num_frames,
        num_classes=num_classes, attention_type=attention_type,
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jparams = convert.timesformer_to_pytree(sd, jcfg)
    return tmodel, jparams, jcfg


def compare(tmodel, jparams, jcfg, x_np, atol=2e-5, use_head=False):
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_np), use_head=use_head).numpy()
    j_out = np.asarray(
        tsf.forward(jparams, jnp.asarray(x_np), jcfg, use_head=use_head)
    )
    np.testing.assert_allclose(j_out, t_out, atol=atol, rtol=1e-4)


def test_divided_space_time_forward():
    tmodel, jparams, jcfg = build_pair()
    x = np.random.RandomState(1).randn(2, 3, 4, 32, 32).astype(np.float32)
    compare(tmodel, jparams, jcfg, x)


def test_forward_with_head():
    tmodel, jparams, jcfg = build_pair()
    x = np.random.RandomState(2).randn(2, 3, 4, 32, 32).astype(np.float32)
    compare(tmodel, jparams, jcfg, x, use_head=True)


def test_time_embed_interpolation():
    """T != num_frames exercises the nearest time-embed resize
    (ref: models/timesformer.py:313-318) used by the scoring pipeline's
    local(3)/global(30) windows."""
    tmodel, jparams, jcfg = build_pair(num_frames=4)
    for T in (3, 7):
        x = np.random.RandomState(T).randn(1, 3, T, 32, 32).astype(np.float32)
        compare(tmodel, jparams, jcfg, x)


def test_pos_embed_resize_other_crop():
    """Different crop size exercises the quirky 2-D nearest pos-embed resize
    (ref: models/timesformer.py:292-303)."""
    tmodel, jparams, jcfg = build_pair(img_size=32)
    x = np.random.RandomState(5).randn(1, 3, 4, 48, 48).astype(np.float32)
    compare(tmodel, jparams, jcfg, x, atol=5e-5)


def test_joint_space_time():
    tmodel, jparams, jcfg = build_pair(attention_type="joint_space_time")
    x = np.random.RandomState(3).randn(2, 3, 4, 32, 32).astype(np.float32)
    compare(tmodel, jparams, jcfg, x)


def test_space_only():
    tmodel, jparams, jcfg = build_pair(attention_type="space_only")
    x = np.random.RandomState(4).randn(2, 3, 4, 32, 32).astype(np.float32)
    compare(tmodel, jparams, jcfg, x)


def test_temporal_bootstrap_surgery():
    """Checkpoints without temporal weights get them copied from spatial
    attention (ref: models/helpers.py:182-197)."""
    tmodel, _, jcfg = build_pair()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    sd_wo = {k: v for k, v in sd.items() if "temporal" not in k}
    out = convert.apply_surgery(sd_wo, jcfg)
    for i in range(jcfg.depth):
        np.testing.assert_array_equal(
            out[f"blocks.{i}.temporal_attn.qkv.weight"],
            sd[f"blocks.{i}.attn.qkv.weight"],
        )
        np.testing.assert_array_equal(
            out[f"blocks.{i}.temporal_norm1.weight"],
            sd[f"blocks.{i}.norm1.weight"],
        )


def test_nearest_interp_matches_torch():
    import torch.nn.functional as F

    src = np.random.RandomState(0).randn(1, 8, 16).astype(np.float32)
    for out_len in (3, 5, 16, 30):
        t = F.interpolate(torch.from_numpy(src).transpose(1, 2), size=out_len,
                          mode="nearest").transpose(1, 2).numpy()
        j = np.asarray(tsf.interp_nearest_1d(jnp.asarray(src), out_len, axis=1))
        np.testing.assert_array_equal(j, t)


def test_aux_token_forward_parity():
    """Two-token variant vs the reference AuxTokenVisionTransformer
    (ref: models/timesformer.py:515-589)."""
    from models.timesformer import AuxTokenVisionTransformer

    torch.manual_seed(7)
    tmodel = AuxTokenVisionTransformer(
        img_size=32, patch_size=16, num_classes=0, embed_dim=48, depth=2,
        num_heads=4, mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), num_frames=4,
        attention_type="divided_space_time").eval()
    tmodel.head = nn.Identity()
    with torch.no_grad():
        tmodel.pos_embed.normal_(std=0.02)
        tmodel.cls_token.normal_(std=0.02)
        tmodel.aux_cls_token.normal_(std=0.02)
        tmodel.time_embed.normal_(std=0.02)

    jcfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
        num_frames=4, num_classes=0)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jparams = convert.timesformer_to_pytree(sd, jcfg)
    jparams["aux_cls_token"] = sd["aux_cls_token"]
    jparams["pos_embed"] = sd["pos_embed"]

    x = np.random.RandomState(9).randn(2, 3, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = tmodel(torch.from_numpy(x)).numpy()  # eval: concat(cls,aux)
    got = np.asarray(tsf.aux_token_forward_features(
        jparams, jnp.asarray(x), jcfg, training=False))
    np.testing.assert_allclose(got, expected, atol=3e-5, rtol=1e-4)


def test_flow_token_forward_parity():
    """Flow-token variant vs the reference FlowTokenVisionTransformer
    (ref: models/timesformer.py:429-512)."""
    from models.timesformer import FlowTokenVisionTransformer

    torch.manual_seed(11)
    tmodel = FlowTokenVisionTransformer(
        img_size=32, patch_size=16, num_classes=0, embed_dim=48, depth=2,
        num_heads=4, mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), num_frames=4,
        attention_type="divided_space_time").eval()
    tmodel.head = nn.Identity()
    with torch.no_grad():
        tmodel.pos_embed.normal_(std=0.02)
        tmodel.cls_token.normal_(std=0.02)
        tmodel.aux_cls_token.normal_(std=0.02)
        tmodel.time_embed.normal_(std=0.02)

    jcfg = tsf.TimeSformerConfig(
        img_size=32, patch_size=16, embed_dim=48, depth=2, num_heads=4,
        num_frames=4, num_classes=0)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jparams = convert.timesformer_to_pytree(
        {k: v for k, v in sd.items() if not k.startswith("flow_patch_embed")},
        jcfg)
    jparams["aux_cls_token"] = sd["aux_cls_token"]
    jparams["pos_embed"] = sd["pos_embed"]
    w = sd["flow_patch_embed.proj.weight"]
    D, C, ps, _ = w.shape
    jparams["flow_patch_embed"] = {"proj": {
        "kernel": w.transpose(2, 3, 1, 0).reshape(ps * ps * C, D),
        "bias": sd["flow_patch_embed.proj.bias"]}}

    x = np.random.RandomState(12).randn(2, 3, 4, 32, 32).astype(np.float32)
    # eval mode: concat(cls, aux) for both streams
    with torch.no_grad():
        exp_rgb = tmodel(torch.from_numpy(x)).numpy()
        exp_flow = tmodel(torch.from_numpy(x), is_flow=True).numpy()
    got_rgb = np.asarray(tsf.flow_token_forward_features(
        jparams, jnp.asarray(x), jcfg, is_flow=False, training=False))
    got_flow = np.asarray(tsf.flow_token_forward_features(
        jparams, jnp.asarray(x), jcfg, is_flow=True, training=False))
    np.testing.assert_allclose(got_rgb, exp_rgb, atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(got_flow, exp_flow, atol=3e-5, rtol=1e-4)
