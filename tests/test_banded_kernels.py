"""Pallas banded kernels (ops/banded_block.py) vs the XLA banded phase.

Interpret mode on CPU; the real-chip smoke lives in tools/band_bench.py
(Mosaic-only failures like unsupported shape casts do NOT reproduce in
interpreter mode — memory note — so every kernel edit must also smoke on
the chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.models import banded
from dino_video_summarization_transformer_tpu.models import timesformer as tsf
from dino_video_summarization_transformer_tpu.ops import banded_block

pytestmark = pytest.mark.kernels


def _phase_params(D, seed=0):
    ks = jax.random.split(jax.random.key(seed), 6)
    p_norm = {"scale": jnp.ones((D,)) + 0.1 * jax.random.normal(ks[0], (D,)),
              "bias": 0.1 * jax.random.normal(ks[1], (D,))}
    p_attn = {
        "qkv": {"kernel": 0.05 * jax.random.normal(ks[2], (D, 3 * D)),
                "bias": 0.05 * jax.random.normal(ks[3], (3 * D,))},
        "proj": {"kernel": 0.05 * jax.random.normal(ks[4], (D, D)),
                 "bias": jnp.zeros((D,))},
    }
    p_fc = {"kernel": 0.05 * jax.random.normal(ks[5], (D, D)),
            "bias": jnp.zeros((D,))}
    return p_norm, p_attn, p_fc


@pytest.mark.parametrize("C,t_real,eff,H", [
    (64, 64, 30, 12),   # teacher band, full bucket
    (64, 50, 30, 12),   # padded rows + end clamp
    (64, 64, 3, 12),    # student band
    (64, 40, 3, 4),     # student band, padded, fewer heads
])
def test_banded_temporal_kernel_matches_xla(C, t_real, eff, H):
    D = 128 * max(1, H // 2)  # D % 128 == 0, hd < 128
    if D // H >= 128:
        D = 128 * H // 2
    N = 8
    p_norm, p_attn, p_fc = _phase_params(D)
    x = 0.5 * jax.random.normal(jax.random.key(7), (C, N, D), jnp.float32)
    lo = banded.band_starts(jnp.arange(C), eff, t_real)
    ref = banded._banded_temporal(p_norm, p_attn, p_fc, x, lo, eff, H,
                                  block=32)
    got = banded_block.banded_temporal_phase(p_norm, p_attn, p_fc, x,
                                             t_real, eff, H, block_p=32)
    r = np.asarray(ref[:t_real], np.float64)
    g = np.asarray(got[:t_real], np.float64)
    err = np.abs(r - g).max() / (np.abs(r).max() + 1e-9)
    assert err < 3e-2, err  # bf16 matmul operands vs f32 reference


def test_banded_temporal_kernel_band_locality():
    """Perturbing a frame outside every window leaves in-band outputs of
    far frames unchanged (mask correctness, not just value closeness)."""
    C, t_real, eff, H = 64, 64, 3, 4
    D = 256
    N = 8
    p_norm, p_attn, p_fc = _phase_params(D, seed=1)
    x = 0.5 * jax.random.normal(jax.random.key(8), (C, N, D), jnp.float32)
    a = np.asarray(banded_block.banded_temporal_phase(
        p_norm, p_attn, p_fc, x, t_real, eff, H, block_p=32))
    x2 = x.at[-1].add(5.0)
    b = np.asarray(banded_block.banded_temporal_phase(
        p_norm, p_attn, p_fc, x2, t_real, eff, H, block_p=32))
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.allclose(a[-1], b[-1])


def test_banded_scorer_fused_matches_xla_path():
    """FrameScorer band_mode with the fused kernels (interpret mode) ==
    the XLA banded path at bf16 tolerance, end to end through the loss."""
    import dataclasses

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    cfg = tsf.TimeSformerConfig(embed_dim=256, depth=2, num_heads=4,
                                img_size=32, num_frames=8, num_classes=0,
                                drop_path_rate=0.0)
    params = tsf.init_timesformer(jax.random.key(0), cfg)
    T = 50
    vid = make_video(3, T, 32)
    loc, glob, eff = window_indices(T, 3, 30)

    xla = FrameScorer(params, cfg, chunk=8, precision=None,
                      compute_dtype=jnp.float32, band_mode="both",
                      use_pallas=False).score_video(vid, loc, glob, eff)
    fused = FrameScorer(params, cfg, chunk=8, precision=None,
                        compute_dtype=jnp.float32, band_mode="both",
                        use_pallas=True).score_video(vid, loc, glob, eff)
    err = np.abs(xla - fused).mean() / xla.mean()
    assert err < 0.05, err
    rho = np.corrcoef(np.argsort(np.argsort(xla)),
                      np.argsort(np.argsort(fused)))[0, 1]
    assert rho > 0.97, rho
