"""Video Swin 3D parity vs the reference torch implementation."""

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.models import swin3d  # noqa: E402


def build_pair(depths=(2, 2), num_heads=(2, 4), embed_dim=32,
               patch_size=(2, 4, 4), window_size=(2, 4, 4), seed=0):
    from models.swin_transformer import SwinTransformer3D

    torch.manual_seed(seed)
    t = SwinTransformer3D(
        pretrained=None, pretrained2d=False, patch_size=patch_size,
        embed_dim=embed_dim, depths=list(depths), num_heads=list(num_heads),
        window_size=window_size, drop_path_rate=0.0, patch_norm=True)
    t.eval()  # reference's train() override returns None, can't chain
    cfg = swin3d.Swin3DConfig(
        patch_size=patch_size, embed_dim=embed_dim, depths=depths,
        num_heads=num_heads, window_size=window_size, patch_norm=True)
    params = swin3d.swin3d_to_pytree(
        {k: v.numpy() for k, v in t.state_dict().items()}, cfg)
    return t, params, cfg


def torch_forward(t, x):
    with torch.no_grad():
        return t(torch.from_numpy(x)).numpy()


def test_swin3d_forward_parity():
    t, params, cfg = build_pair()
    x = np.random.RandomState(0).randn(2, 3, 8, 32, 32).astype(np.float32)
    expected = torch_forward(t, x)
    got = np.asarray(swin3d.forward(params, jnp.asarray(x), cfg))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-3)


def test_swin3d_non_divisible_input():
    """Input not divisible by windows/patches exercises padding + adaptive
    window shrink (ref: swin_transformer.py:236-244, 71-84)."""
    t, params, cfg = build_pair()
    x = np.random.RandomState(1).randn(1, 3, 6, 36, 28).astype(np.float32)
    expected = torch_forward(t, x)
    got = np.asarray(swin3d.forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-3)


def test_swin3d_init_runs():
    cfg = swin3d.Swin3DConfig(depths=(1, 1), num_heads=(2, 2), embed_dim=16,
                              patch_size=(2, 4, 4), window_size=(2, 2, 2))
    params = swin3d.init_swin3d(jax.random.key(0), cfg)
    out = swin3d.forward(params, jnp.zeros((1, 3, 4, 16, 16)), cfg)
    assert out.shape == (1, cfg.num_features)
