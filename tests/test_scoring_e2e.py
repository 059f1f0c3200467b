"""End-to-end scoring parity: batched TPU pipeline vs the reference flow.

Oracle: the reference's DinoLossLoader view construction + dino_similarity
batching loop, run with the actual reference TimeSformer (torch, CPU). Ours:
DinoLossDataset window maps + FrameScorer. Same pixels in, loss values out
must match.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

conftest.add_reference_path()

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from functools import partial  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dino_video_summarization_transformer_tpu.data import transform as tfm  # noqa: E402
from dino_video_summarization_transformer_tpu.data.windows import window_indices  # noqa: E402
from dino_video_summarization_transformer_tpu.engine.scoring import (  # noqa: E402
    FrameScorer, export_loss)
from dino_video_summarization_transformer_tpu.models import convert  # noqa: E402
from dino_video_summarization_transformer_tpu.models import timesformer as tsf  # noqa: E402


def small_pair(num_frames=4, embed_dim=48, depth=2, heads=4, seed=0):
    from models.timesformer import VisionTransformer as TorchVT  # reference

    torch.manual_seed(seed)
    tmodel = TorchVT(
        img_size=224, patch_size=16, num_classes=0, embed_dim=embed_dim,
        depth=depth, num_heads=heads, mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), num_frames=num_frames,
        attention_type="divided_space_time").eval()
    tmodel.head = nn.Identity()
    with torch.no_grad():
        tmodel.pos_embed.normal_(std=0.02)
        tmodel.cls_token.normal_(std=0.02)
        tmodel.time_embed.normal_(std=0.02)
    jcfg = tsf.TimeSformerConfig(
        img_size=224, patch_size=16, embed_dim=embed_dim, depth=depth,
        num_heads=heads, num_frames=num_frames, num_classes=0)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jparams = convert.timesformer_to_pytree(sd, jcfg)
    return tmodel, jparams, jcfg


def reference_scoring_oracle(tmodel, frames_thwc_u8, local_size, global_size,
                             sampling_rate, batch_size, mean, std):
    """Transliteration of the reference scoring flow:
    dino_loss_loader.py:80-107 (view construction) +
    dino_similarity.py:66-93 (batching + per-frame DINOLoss)."""
    from datasets_custom.transform import uniform_crop as ref_uc
    from datasets_custom.data_utils import tensor_normalize as ref_tn

    video = torch.from_numpy(frames_thwc_u8)
    frames_sampled = video.float()[::sampling_rate].to(torch.uint8)
    frames = ref_tn(frames_sampled, mean, std)
    frames = frames.permute(0, 3, 1, 2)
    frames, _ = ref_uc(frames, size=224, spatial_idx=1)

    # get_views_of_video_same_size (ref: dino_loss_loader.py:126-171)
    loc = int(local_size / 2)
    g = global_size
    if len(frames) < g:
        g = len(frames)
    glob = int(g / 2)
    views = []
    for i in range(len(frames)):
        j, k = i - loc, i + loc + 1
        l, m = i - glob, i + glob
        if j < 0:
            j, k = 0, local_size
        if k >= len(frames):
            k, j = len(frames), len(frames) - local_size
        if l < 0:
            l, m = 0, g
        if m >= len(frames):
            m, l = len(frames), len(frames) - g
        t_local = frames[j:k].permute(1, 0, 2, 3)
        t_global = frames[l:m].permute(1, 0, 2, 3)
        padded = torch.zeros(3, g, t_local.size(2), t_local.size(3))
        padded[:, :local_size, :] = t_local
        views.append(padded)
        views.append(t_global)
    views = torch.stack(views)

    # scoring loop (ref: dino_similarity.py:66-93)
    def dino_loss(s, t, teacher_temp=0.02, student_temp=0.3):
        p_t = F.softmax((t - torch.zeros(1, s.shape[-1])) / teacher_temp, dim=-1)
        return torch.sum(-p_t * F.log_softmax(s / student_temp, dim=-1),
                         dim=-1).mean()

    losses = []
    batch = 0
    import math
    for _ in range(math.ceil(len(views) / batch_size)):
        bn = batch + batch_size
        local_views = views[batch:bn][::2, :, :local_size, :, :]
        global_views = views[batch:bn][1::2]
        with torch.no_grad():
            s_out = tmodel(local_views)
            t_out = tmodel(global_views)
        for kk in range(len(s_out)):
            losses.append(dino_loss(s_out[kk], t_out[kk]).item())
        batch = bn
    return np.asarray(losses)


@pytest.mark.slow
def test_scoring_matches_reference_pipeline():
    tmodel, jparams, jcfg = small_pair()
    rng = np.random.RandomState(0)
    # 34 raw frames, rate 4 -> 9 presampled? 34/4 -> ceil -> 9 (odd) would be
    # ragged for eff_global... 9 < 30 and odd -> dummy. Use 32 -> 8 frames.
    raw = rng.randint(0, 256, (32, 240, 320, 3), dtype=np.uint8)
    mean = [0.45, 0.45, 0.45]
    std = [0.225, 0.225, 0.225]

    expected = reference_scoring_oracle(
        tmodel, raw, local_size=3, global_size=30, sampling_rate=4,
        batch_size=4, mean=mean, std=std)

    # our path
    frames_sampled = raw[::4]
    frames = tfm.tensor_normalize(frames_sampled, mean, std)
    tchw = np.moveaxis(frames, -1, 1)
    tchw, _ = tfm.uniform_crop(tchw, 224, spatial_idx=1)
    frames = np.ascontiguousarray(np.moveaxis(tchw, 1, -1))
    T = frames.shape[0]
    loc_idx, glob_idx, eff_g = window_indices(T, 3, 30)

    scorer = FrameScorer(jparams, jcfg, local_size=3, global_size=30, chunk=4)
    got = scorer.score_video(frames, loc_idx, glob_idx, eff_g)

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)


def test_scoring_chunk_padding_invariance():
    """T not divisible by chunk: the tail chunk is index-padded; the real
    frames' losses must be unaffected."""
    _, jparams, jcfg = small_pair(embed_dim=32, depth=1, heads=2)
    rng = np.random.RandomState(1)
    frames = rng.randn(14, 224, 224, 3).astype(np.float32)
    loc, glob, eff = window_indices(14, 3, 30)
    a = FrameScorer(jparams, jcfg, chunk=4).score_video(frames, loc, glob, eff)
    b = FrameScorer(jparams, jcfg, chunk=7).score_video(frames, loc, glob, eff)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_segmented_long_video_matches_unsegmented():
    """A video longer than one upload piece streams through the piece
    buffer in slices; losses must be independent of the piece size (one
    big piece vs many small ones exercising eviction/re-fire)."""
    _, jparams, jcfg = small_pair(embed_dim=32, depth=1, heads=2)
    rng = np.random.RandomState(7)
    T = 150
    frames = rng.randn(T, 224, 224, 3).astype(np.float32)
    loc, glob, eff = window_indices(T, 3, 30)
    big = FrameScorer(jparams, jcfg, chunk=4, piece=256)
    small = FrameScorer(jparams, jcfg, chunk=4, piece=32)
    a = big.score_video(frames, loc, glob, eff)
    b = small.score_video(frames, loc, glob, eff)
    assert a.shape == (T,)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_scorer_config_dataclass_equivalence():
    """ScorerConfig and plain kwargs are the same constructor surface:
    a config object, kwargs, and config-plus-overrides must produce
    identical scorers (and identical scores)."""
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        ScorerConfig)

    _, jparams, jcfg = small_pair(embed_dim=32, depth=1, heads=2)
    rng = np.random.RandomState(3)
    frames = rng.randn(40, 224, 224, 3).astype(np.float32)
    loc, glob, eff = window_indices(40, 3, 30)
    kw = dict(chunk=4, teacher_stride=2, precision=None)
    by_kwargs = FrameScorer(jparams, jcfg, **kw)
    by_config = FrameScorer(jparams, jcfg, ScorerConfig(**kw))
    by_override = FrameScorer(jparams, jcfg,
                              ScorerConfig(chunk=4, precision=None),
                              teacher_stride=2)
    assert by_kwargs.config == by_config.config == by_override.config
    a = by_kwargs.score_video(frames, loc, glob, eff)
    b = by_config.score_video(frames, loc, glob, eff)
    np.testing.assert_allclose(a, b, atol=0)


def test_export_loss_merge(tmp_path):
    path = str(tmp_path / "loss.json")
    export_loss([1.0, 2.0], "/x/videoA.mp4", path)
    export_loss([3.0], "/x/videoB.avi", path)
    export_loss([9.0], "/x/videoA.mp4", path)  # overwrite merge
    with open(path) as f:
        data = json.load(f)
    assert data == {"videoA": [9.0], "videoB": [3.0]}


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """Drive the dino_similarity.py CLI on a synthetic dataset (CPU)."""
    from dino_video_summarization_transformer_tpu.data import video as vio

    if not vio.native_available():
        pytest.skip("native decoder not built")

    d = tmp_path
    rng = np.random.RandomState(0)
    fr = rng.randint(0, 256, (48, 256, 320, 3), dtype=np.uint8)
    vio.write_video(str(d / "vidA.avi"), fr[:32], fps=30)  # 8 presampled
    vio.write_video(str(d / "vidB.avi"), fr, fps=30)       # 12 presampled
    (d / "test.csv").write_text("vidA.avi 0\nvidB.avi 0\n")

    # ViT-tiny random torch checkpoint with the SVT layout (backbone. prefix)
    tmodel, _, _ = small_pair(num_frames=8, embed_dim=192, depth=12, heads=3)
    sd = {"backbone." + k: v for k, v in tmodel.state_dict().items()}
    ckpt_path = str(d / "ckpt.pth")
    torch.save(sd, ckpt_path)

    out_json = str(d / "loss.json")
    repo = conftest.REPO_ROOT
    env = conftest.cpu_subprocess_env()
    cmd = [
        sys.executable, os.path.join(repo, "dino_similarity.py"),
        "--cfg", os.path.join(repo, "configs/kinetics/timesformer_divst_8x32_224.yaml"),
        "--pretrained_weights", ckpt_path,
        "--arch", "vit_tiny",
        "--batch_size_per_gpu", "4",
        "--file_path", out_json,
        "--num_workers", "2",
        "--opts",
        "DATA.PATH_TO_DATA_DIR", str(d),
        "DATA.PATH_PREFIX", str(d),
        "TEST.NUM_ENSEMBLE_VIEWS", "1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out_json) as f:
        data = json.load(f)
    assert set(data.keys()) == {"vidA", "vidB"}
    assert len(data["vidA"]) == 8   # 32/4 presampled frames
    assert len(data["vidB"]) == 12  # 48/4
    assert all(np.isfinite(v) for v in data["vidA"] + data["vidB"])


def test_uint8_wire_matches_host_normalization():
    """uint8 upload + on-device normalize == host-normalized f32 path."""
    _, jparams, jcfg = small_pair(embed_dim=32, depth=1, heads=2)
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (12, 224, 224, 3), dtype=np.uint8)
    f32 = ((u8 / 255.0 - 0.45) / 0.225).astype(np.float32)
    loc, glob, eff = window_indices(12, 3, 30)
    a = FrameScorer(jparams, jcfg, chunk=4).score_video(u8, loc, glob, eff)
    b = FrameScorer(jparams, jcfg, chunk=4).score_video(f32, loc, glob, eff)
    np.testing.assert_allclose(a, b, atol=1e-5)
