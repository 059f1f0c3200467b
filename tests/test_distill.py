"""Distillation trainers (CNN_DISTILL / TWO_STREAM) + rand_fr multi-crop
and the flow/two_token/rand_fr dataset modes (ref: train_ssl.py:263-346,
507-552; decoder.py:401-427; kinetics.py:314-348)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.models import s3d, vit_tiny_config
from dino_video_summarization_transformer_tpu.models.vit2d import vit2d_tiny
from dino_video_summarization_transformer_tpu.parallel import (
    build_mesh, data_sharding, replicated)
from dino_video_summarization_transformer_tpu.train.ssl import (
    init_train_state, init_two_stream_state, make_rand_fr_train_step,
    make_train_step, make_two_stream_train_step)


@pytest.fixture(scope="module")
def tiny_cfg():
    # depth 4: trainer-equivalence semantics don't depend on block count,
    # and the 12-block scan dominated this file's compile wall time
    import dataclasses
    return dataclasses.replace(
        vit_tiny_config(num_frames=2, num_classes=0, img_size=32), depth=4)


def _tree_allclose(a, b, atol=1e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


# ---------------------------------------------------------------------------
# rand_fr
# ---------------------------------------------------------------------------

def _rand_fr_crops(rng, B, img=32, local=32):
    return (jnp.asarray(rng.randn(B, 3, 4, img, img), jnp.float32),
            jnp.asarray(rng.randn(B, 3, 8, img, img), jnp.float32),
            jnp.asarray(rng.randn(2 * B, 3, 2, local, local), jnp.float32),
            jnp.asarray(rng.randn(2 * B, 3, 4, local, local), jnp.float32),
            jnp.asarray(rng.randn(2 * B, 3, 8, local, local), jnp.float32),
            jnp.asarray(rng.randn(2 * B, 3, 16, local, local), jnp.float32))


def test_rand_fr_step_runs(tiny_cfg):
    state, core, mask = init_train_state(jax.random.key(0), tiny_cfg, out_dim=64)
    step = make_rand_fr_train_step(tiny_cfg, core, mask, donate=False)
    crops = _rand_fr_crops(np.random.RandomState(0), B=2)
    state2, m = step(state, crops, 1e-3, 1e-4, 0.99, 0.04, False)
    assert np.isfinite(float(m["loss"]))
    # student actually updated
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.student, state2.student)
    assert max(jax.tree.leaves(d)) > 0


def test_rand_fr_sharded_matches_single(tiny_cfg):
    # SGD keeps the update linear in the gradient, so cross-device
    # reduction-order noise is not Adam-amplified at step 1
    state, core, mask = init_train_state(jax.random.key(0), tiny_cfg,
                                         out_dim=64, optimizer="sgd")
    crops = _rand_fr_crops(np.random.RandomState(0), B=8)
    args = (1e-3, 1e-4, 0.99, 0.04, False)

    s_single, m_single = make_rand_fr_train_step(
        tiny_cfg, core, mask, donate=False)(state, crops, *args)

    mesh = build_mesh(data=8, model=1)
    state_r = jax.device_put(state, replicated(mesh))
    crops_s = jax.device_put(crops, data_sharding(mesh))
    s_shard, m_shard = make_rand_fr_train_step(
        tiny_cfg, core, mask, mesh=mesh, donate=False)(state_r, crops_s, *args)

    assert float(m_single["loss"]) == pytest.approx(
        float(m_shard["loss"]), abs=1e-5)
    _tree_allclose(s_single.student, s_shard.student)
    _tree_allclose(s_single.center, s_shard.center)


# ---------------------------------------------------------------------------
# TWO_STREAM
# ---------------------------------------------------------------------------

def _two_stream_inputs(rng, B, img=32):
    g = jnp.asarray(rng.randn(2 * B, 3, 2, img, img), jnp.float32)
    l = jnp.asarray(rng.randn(2 * B, 3, 2, img, img), jnp.float32)
    flow = jnp.asarray(rng.randn(2 * B, 3, img, img), jnp.float32)
    return g, l, flow


def test_two_stream_step(tiny_cfg):
    mot = vit2d_tiny(img_size=32)
    state, core, mask = init_two_stream_state(
        jax.random.key(0), tiny_cfg, mot, out_dim=64)
    step = make_two_stream_train_step(
        tiny_cfg, mot, core, mask, n_local_crops=2, donate=False)
    g, l, flow = _two_stream_inputs(np.random.RandomState(0), B=2)
    state2, m = step(state, g, l, flow, 1e-3, 1e-4, 0.99, 0.04, False)
    # three loss terms, all finite, sum reported (ref: train_ssl.py:512-514)
    for k in ("loss", "loss_rgb", "loss_flow", "loss_cross"):
        assert np.isfinite(float(m[k])), k
    assert float(m["loss"]) == pytest.approx(
        float(m["loss_rgb"]) + float(m["loss_flow"]) + float(m["loss_cross"]),
        rel=1e-6)
    # EMA moved BOTH teachers (ref: train_ssl.py:554-563)
    for old_t, new_t in ((state.teacher, state2.teacher),
                         (state.motion_teacher, state2.motion_teacher)):
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), old_t, new_t)
        assert max(jax.tree.leaves(d)) > 0
    # all three centers updated
    for c in (state2.center_rgb, state2.center_flow, state2.center_cross):
        assert float(jnp.abs(c).max()) > 0


def test_two_stream_sharded_matches_single(tiny_cfg):
    mot = vit2d_tiny(img_size=32)
    state, core, mask = init_two_stream_state(
        jax.random.key(0), tiny_cfg, mot, out_dim=64, optimizer="sgd")
    g, l, flow = _two_stream_inputs(np.random.RandomState(1), B=8)
    args = (1e-3, 1e-4, 0.99, 0.04, False)

    s_single, m_single = make_two_stream_train_step(
        tiny_cfg, mot, core, mask, n_local_crops=2, donate=False)(
        state, g, l, flow, *args)

    mesh = build_mesh(data=8, model=1)
    state_r = jax.device_put(state, replicated(mesh))
    ds = data_sharding(mesh)
    s_shard, m_shard = make_two_stream_train_step(
        tiny_cfg, mot, core, mask, n_local_crops=2, mesh=mesh, donate=False)(
        state_r, jax.device_put(g, ds), jax.device_put(l, ds),
        jax.device_put(flow, ds), *args)

    assert float(m_single["loss"]) == pytest.approx(
        float(m_shard["loss"]), abs=1e-5)
    _tree_allclose(s_single.student, s_shard.student)
    _tree_allclose(s_single.motion_student, s_shard.motion_student)
    _tree_allclose(s_single.center_cross, s_shard.center_cross)


# ---------------------------------------------------------------------------
# CNN_DISTILL
# ---------------------------------------------------------------------------

def test_cnn_distill_term(tiny_cfg):
    import dataclasses
    cfg = dataclasses.replace(
        vit_tiny_config(num_frames=8, num_classes=0, img_size=64), depth=4)
    cnn = s3d.init_s3d(jax.random.key(5))
    rng = np.random.RandomState(0)
    B = 1
    g = jnp.asarray(rng.randn(2 * B, 3, 8, 64, 64), jnp.float32)
    l = jnp.asarray(rng.randn(2 * B, 3, 8, 32, 32), jnp.float32)
    args = (1e-3, 1e-4, 0.99, 0.04, False)

    state, core, mask = init_train_state(
        jax.random.key(0), cfg, out_dim=64, cnn_distill_dim=1024)
    assert "cnn_proj" in state.student
    # weight 0 == reference behavior (teacher built, no loss term)
    _, m0 = make_train_step(cfg, core, mask, n_local_crops=2, donate=False,
                            cnn_params=cnn, cnn_distill_weight=0.0)(
        state, g, l, *args)
    s1, m1 = make_train_step(cfg, core, mask, n_local_crops=2, donate=False,
                             cnn_params=cnn, cnn_distill_weight=0.5)(
        state, g, l, *args)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["loss"]) != pytest.approx(float(m0["loss"]), abs=1e-6)
    # gradient flows into the projection head
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.student["cnn_proj"], s1.student["cnn_proj"])
    assert max(jax.tree.leaves(d)) > 0


# ---------------------------------------------------------------------------
# dataset modes
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clip_data(tmp_path_factory):
    from dino_video_summarization_transformer_tpu.data import video as vio

    if not vio.native_available():
        pytest.skip("native decoder not built")
    d = tmp_path_factory.mktemp("clips")
    rng = np.random.RandomState(0)
    vdir = d / "train_d256"
    vdir.mkdir()
    for name in ("a", "b"):
        fr = rng.randint(0, 256, (40, 128, 160, 3), dtype=np.uint8)
        vio.write_video(str(vdir / f"{name}.avi"), fr, fps=30)
        # flow companion folder (ref: kinetics.py:317 path rule)
        fdir = d / "train_flow" / name
        fdir.mkdir(parents=True)
        from PIL import Image

        for i in range(10):
            Image.fromarray(
                rng.randint(0, 256, (64, 80, 3), dtype=np.uint8)).save(
                str(fdir / f"{i:03d}.jpg"))
    (d / "train.csv").write_text("train_d256/a.avi 0\ntrain_d256/b.avi 1\n")
    return d


def _cfg_for(d):
    from dino_video_summarization_transformer_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(d)
    cfg.DATA.PATH_PREFIX = str(d)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.CROP_SIZE = 64
    return cfg


def test_dataset_two_token_views(clip_data):
    from dino_video_summarization_transformer_tpu.data.datasets import ClipDataset

    ds = ClipDataset(_cfg_for(clip_data), "train", two_token=True, seed=0)
    crops, label, idx, meta = ds[0]
    # 6 views (ref: transform.py:738-743): 2 teacher 224, 2 local 96 crops,
    # 2 plain 224 of temporally-local clips; all with T=NUM_FRAMES
    assert len(crops) == 6
    shapes = [c.shape for c in crops]
    assert shapes[0] == shapes[1] == (3, 4, 224, 224)
    assert shapes[2] == shapes[3] == (3, 4, 96, 96)
    assert shapes[4] == shapes[5] == (3, 4, 224, 224)


def test_dataset_rand_fr_clips(clip_data):
    from dino_video_summarization_transformer_tpu.data.datasets import ClipDataset

    ds = ClipDataset(_cfg_for(clip_data), "train", temporal_aug=True,
                     rand_fr=True, seed=0)
    crops, label, idx, meta = ds[0]
    assert len(crops) == 10
    # frame counts per crop (ref: decoder.py:418-427)
    assert [c.shape[1] for c in crops] == [4, 8, 2, 2, 4, 4, 8, 8, 16, 16]
    assert crops[0].shape[2:] == (224, 224)
    assert crops[2].shape[2:] == (96, 96)


def test_dataset_get_flow(clip_data):
    from dino_video_summarization_transformer_tpu.data.datasets import ClipDataset

    cfg = _cfg_for(clip_data)
    cfg.DATA.NO_FLOW_AUG = True
    ds = ClipDataset(cfg, "train", temporal_aug=True, get_flow=True, seed=0)
    crops, label, idx, meta = ds[0]
    assert "flow" in meta
    assert len(meta["flow"]) == 10  # one per flow jpg
    assert meta["flow"][0].shape == (3, 64, 64)  # resized to CROP_SIZE
    assert np.isfinite(meta["flow"][0]).all()
    # sobel magnitude is non-negative pre-resize; bicubic ringing may dip
    # slightly below zero, so allow a small margin
    assert meta["flow"][0].min() > -0.2


def test_spatial_tile_local_crops_matches_reference():
    """Tile geometry vs the reference decode_custom loop
    (ref: decoder.py:576-601), driven by the real reference uniform_crop."""
    import torch

    import conftest as _c

    _c.add_reference_path()
    from datasets_custom.transform import uniform_crop as ref_uniform_crop

    from dino_video_summarization_transformer_tpu.data.transform import (
        spatial_tile_local_crops)

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (260, 300, 3), dtype=np.uint8)

    # reference transliteration (decoder.py:576-601)
    lf = torch.from_numpy(frame[None].astype(np.float32))
    lf = lf.permute(0, 3, 1, 2)
    lf, _ = ref_uniform_crop(lf, 240, spatial_idx=1)
    lf = lf.permute(0, 2, 3, 1).squeeze(0)
    ref_tiles = []
    x_start, y_start = 0, 24
    for i in range(8):
        ref_tiles.append(lf[y_start:y_start + 96, x_start:x_start + 96, :]
                         .unsqueeze(0).numpy())
        x_start += 48
        if i == 3:
            y_start += 96
            x_start = 0

    got = spatial_tile_local_crops(frame.astype(np.float32))
    assert len(got) == 8
    for g, r in zip(got, ref_tiles):
        assert g.shape == (1, 96, 96, 3)
        np.testing.assert_array_equal(g, r)


def test_dataset_tiled_local(tmp_path):
    from dino_video_summarization_transformer_tpu.data import video as vio
    from dino_video_summarization_transformer_tpu.data.datasets import ClipDataset

    if not vio.native_available():
        pytest.skip("native decoder not built")
    # frames must exceed the 240px tiling crop (the reference's
    # decode_custom assumes >=240px inputs)
    rng = np.random.RandomState(0)
    vio.write_video(str(tmp_path / "v.avi"),
                    rng.randint(0, 256, (30, 260, 300, 3), dtype=np.uint8),
                    fps=30)
    (tmp_path / "train.csv").write_text("v.avi 0\n")
    ds = ClipDataset(_cfg_for(tmp_path), "train", temporal_aug=True,
                     tiled_local=True, seed=0)
    crops, label, idx, meta = ds[0]
    assert len(crops) == 10
    # globals T=4 @224; locals single-frame 96x96 tiles
    assert crops[0].shape == (3, 4, 224, 224)
    assert crops[2].shape == (3, 1, 96, 96)


def test_sobel_np_matches_jnp():
    from dino_video_summarization_transformer_tpu.data.datasets import _sobel_np
    from dino_video_summarization_transformer_tpu.ops.image import sobel

    x = np.random.RandomState(0).rand(2, 3, 16, 20).astype(np.float32)
    np.testing.assert_allclose(
        _sobel_np(x), np.asarray(sobel(jnp.asarray(x))), rtol=1e-5, atol=1e-6)
