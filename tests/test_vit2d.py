"""2D ViT parity vs the reference vision_transformer.py."""

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.models import vit2d  # noqa: E402


def build_pair(img_size=32, patch_size=16, embed_dim=48, depth=2, heads=4,
               num_classes=0, seed=0):
    import vision_transformer as ref_vit  # reference module

    torch.manual_seed(seed)
    t = ref_vit.VisionTransformer(
        img_size=[img_size], patch_size=patch_size, embed_dim=embed_dim,
        depth=depth, num_heads=heads, mlp_ratio=4, qkv_bias=True,
        num_classes=num_classes,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6)).eval()
    with torch.no_grad():
        t.pos_embed.normal_(std=0.02)
        t.cls_token.normal_(std=0.02)
    cfg = vit2d.ViT2DConfig(
        img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
        depth=depth, num_heads=heads, num_classes=num_classes)
    params = vit2d.vit2d_to_pytree(
        {k: v.numpy() for k, v in t.state_dict().items()}, cfg)
    return t, params, cfg


def test_vit2d_forward_parity():
    t, params, cfg = build_pair()
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = t(torch.from_numpy(x)).numpy()
    got = np.asarray(vit2d.forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_vit2d_pos_interp_parity():
    """Different input resolution exercises the DINO bicubic pos-embed
    interpolation (ref: vision_transformer.py:174-198)."""
    t, params, cfg = build_pair()
    x = np.random.RandomState(1).randn(1, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        expected = t(torch.from_numpy(x)).numpy()
    got = np.asarray(vit2d.forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-3)


def test_vit2d_dino_head_pipeline():
    """2D ViT + DINOHead compose (the image-domain DINO training path)."""
    from dino_video_summarization_transformer_tpu.models import (
        dino_head_forward, init_dino_head)

    _, params, cfg = build_pair()
    head = init_dino_head(jax.random.key(0), cfg.embed_dim, 256)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 3, 32, 32), jnp.float32)
    out = dino_head_forward(head, vit2d.forward(params, x, cfg))
    assert out.shape == (2, 256)
    assert bool(jnp.isfinite(out).all())
