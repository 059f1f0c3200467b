"""Data layer tests: native decode, selection math, windows, transforms."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from dino_video_summarization_transformer_tpu.data import (
    interp,
    selection as sel,
    transform as tfm,
    video as vio,
    windows,
)


# ---------------------------------------------------------------------------
# native decoder
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_video(tmp_path_factory):
    """Encode a 60-frame gradient video via the native shim."""
    if not vio.native_available():
        pytest.skip("native decoder not built")
    path = str(tmp_path_factory.mktemp("vid") / "synth.mp4")
    T, H, W = 60, 240, 320
    t = np.arange(T, dtype=np.float32)[:, None, None]
    y = np.linspace(0, 255, H, dtype=np.float32)[None, :, None]
    x = np.linspace(0, 255, W, dtype=np.float32)[None, None, :]
    frames = np.stack([
        np.broadcast_to((t * 4) % 256, (T, H, W)),
        np.broadcast_to(y, (T, H, W)),
        np.broadcast_to(x, (T, H, W)),
    ], axis=-1).astype(np.uint8)
    vio.write_video(path, frames, fps=30.0)
    return path, frames


def test_decode_roundtrip(synth_video):
    path, frames = synth_video
    decoded, fps = vio.read_video(path)
    assert decoded.shape == frames.shape
    assert abs(fps - 30.0) < 1.0  # mpeg4 container timebase rounding
    # lossy codec: mean error should still be small on smooth gradients
    err = np.abs(decoded.astype(np.float32) - frames.astype(np.float32)).mean()
    assert err < 8.0, err


def test_decode_strided(synth_video):
    path, frames = synth_video
    full, _ = vio.read_video(path)
    strided, _ = vio.read_video(path, stride=4)
    np.testing.assert_array_equal(strided, full[::4])


def test_decode_indices(synth_video):
    path, _ = synth_video
    full, _ = vio.read_video(path)
    idx = [3, 0, 17, 17, 59]
    picked = vio.read_video_indices(path, idx)
    np.testing.assert_array_equal(picked, full[idx])


def test_decode_range_roundtrip(synth_video):
    """Seek-based PTS-range decode == whole-decode slice
    (ref: decoder.py:217-304)."""
    path, _ = synth_video
    full, _ = vio.read_video(path)
    for (s, e, st) in [(20, 45, 1), (50, 59, 2), (0, 5, 1), (55, 80, 1)]:
        r, fps = vio.read_video_range(path, s, e, st)
        np.testing.assert_array_equal(r, full[s:min(e + 1, 60):st])


def test_decode_range_long_video_clip(tmp_path):
    """Clip-at-the-end selective decode matches the whole-decode slice on a
    longer GOP-structured video (exercises the keyframe seek)."""
    if not vio.native_available():
        pytest.skip("native decoder not built")
    path = str(tmp_path / "long.avi")
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (400, 64, 80, 3), dtype=np.uint8)
    vio.write_video(path, frames, fps=30.0)
    full, _ = vio.read_video(path)
    r, _ = vio.read_video_range(path, 350, 390)
    np.testing.assert_array_equal(r, full[350:391])
    picked = vio.read_video_indices(path, [355, 360, 399])
    np.testing.assert_array_equal(picked, full[[355, 360, 399]])


def test_clip_dataset_selective_decode_matches_whole(tmp_path):
    """ClipDataset's plain path (selective index decode) must produce the
    same clip as whole-decode + temporal_sampling."""
    from dino_video_summarization_transformer_tpu.config import get_cfg
    from dino_video_summarization_transformer_tpu.data.datasets import (
        ClipDataset)

    if not vio.native_available():
        pytest.skip("native decoder not built")
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (90, 128, 160, 3), dtype=np.uint8)
    vio.write_video(str(tmp_path / "v.avi"), frames, fps=30.0)
    (tmp_path / "test.csv").write_text("v.avi 0\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = str(tmp_path)
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 4
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1

    ds = ClipDataset(cfg, "test", seed=0)
    clip0 = ds._decode_clip(0)  # deterministic test clips
    # manual whole-decode path
    whole, fps = vio.read_video(str(tmp_path / "v.avi"))
    clip_sz = 4 * 8 / cfg.DATA.TARGET_FPS * fps
    start, end = tfm.get_start_end_idx(90, clip_sz, 0, 2)
    manual = tfm.temporal_sampling(whole, start, end, 8)
    np.testing.assert_array_equal(clip0, manual)


def test_video_info(synth_video):
    path, frames = synth_video
    info = vio.video_info(path)
    assert info["width"] == 320 and info["height"] == 240
    assert info["num_frames"] in (0, 60)  # container may omit nb_frames


# ---------------------------------------------------------------------------
# selection math vs a transliterated reference oracle
# ---------------------------------------------------------------------------

def reference_adaptive_oracle(loss_list, N, rate, num_presampled, num_unsampled):
    """Direct transliteration of frame_selection_loader.py:115-190 (numpy)."""
    loss_list = np.asarray(loss_list, dtype=np.float64)
    if len(loss_list) > num_presampled:
        loss_list = loss_list[:num_presampled]
    pdf = (loss_list - loss_list.min()) / (loss_list.max() - loss_list.min())
    pdf = loss_list / np.sum(loss_list)  # overwrites (reference dead code)
    cdf = np.cumsum(pdf)
    indices, rows = [], []
    for i in range(N):
        j = i / N
        idx = int(np.abs(np.asarray(cdf) - j).argmin())
        idx_scaled = idx * rate
        if idx_scaled not in indices:
            indices.append(idx_scaled)
            rows.append(idx)
        else:
            temp = idx_scaled + rate
            search = True
            while search:
                if temp not in indices and temp < num_unsampled:
                    indices.append(temp)
                    rows.append(idx)
                    search = False
                elif temp >= num_unsampled:
                    indices.append(temp - rate)
                    rows.append(-1)
                    search = False
                else:
                    temp = temp + rate
    return indices, rows


@pytest.mark.parametrize("seed", range(8))
def test_adaptive_selection_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    n_pre = rng.randint(17, 200)
    rate = rng.choice([2, 4, 8])
    num_unsampled = n_pre * rate - rng.randint(0, rate)
    losses = rng.rand(n_pre + rng.randint(-5, 6)).astype(np.float64) + 1e-3
    N = 16
    exp_idx, exp_rows = reference_adaptive_oracle(
        losses, N, rate, n_pre, num_unsampled)
    got_idx, got_rows = sel.adaptive_indices(
        losses, N, rate, num_presampled=n_pre, num_unsampled=num_unsampled)
    assert got_idx == exp_idx
    assert got_rows == exp_rows


def test_adaptive_selection_peaked_distribution():
    """Duplicate-resolution path: a single loss spike drives all quantiles
    to the same frame, exercising the forward-scan."""
    losses = np.full(50, 1e-9)
    losses[0] = 1.0  # cdf ~= 1 everywhere -> every quantile argmins to 0
    idx, rows = sel.adaptive_indices(losses, 8, 4, 50, 200)
    assert idx == [0, 4, 8, 12, 16, 20, 24, 28]  # forward scan at stride=rate
    assert rows == [0] * 8  # reference quirk: frame row stays the argmin row


def test_uniform_selection():
    idx, rows = sel.uniform_indices(16, 100)
    assert idx == [i * 6 for i in range(16)]
    assert rows == idx


# ---------------------------------------------------------------------------
# windows vs a transliterated reference oracle
# ---------------------------------------------------------------------------

def reference_windows_oracle(T, local_size, global_size):
    """Transliteration of get_views_of_video_same_size's index arithmetic
    (ref: dino_loss_loader.py:126-171) applied to an arange 'video'."""
    frames = np.arange(T)
    loc = int(local_size / 2)
    if len(frames) < global_size:
        global_size = len(frames)
    glob = int(global_size / 2)
    locs, globs = [], []
    for i in range(len(frames)):
        j, k = i - loc, i + loc + 1
        l, m = i - glob, i + glob
        if j < 0:
            j, k = 0, local_size
        if k >= len(frames):
            k, j = len(frames), len(frames) - local_size
        if l < 0:
            l, m = 0, global_size
        if m >= len(frames):
            m, l = len(frames), len(frames) - global_size
        locs.append(frames[j:k])
        globs.append(frames[l:m])
    try:
        return np.stack(locs), np.stack(globs), global_size
    except ValueError:
        # ragged sizes: the reference's torch.stack would also fail here
        # only if sizes differ -> size_match dummy path
        return None


@pytest.mark.parametrize("T", [4, 6, 28, 30, 31, 100, 317])
def test_window_indices_match_oracle(T):
    exp_loc, exp_glob, exp_g = reference_windows_oracle(T, 3, 30)
    loc, glob, g = windows.window_indices(T, 3, 30)
    np.testing.assert_array_equal(loc, exp_loc)
    np.testing.assert_array_equal(glob, exp_glob)
    assert g == exp_g


@pytest.mark.parametrize("T", [3, 5, 29])
def test_window_indices_ragged_matches_reference_dummy(T):
    """Odd T < global size: interior global windows are T-1 long, the
    reference's stack is ragged -> dummy protocol. We must flag it."""
    assert reference_windows_oracle(T, 3, 30) is None
    with pytest.raises(windows.WindowMismatch):
        windows.window_indices(T, 3, 30)


# ---------------------------------------------------------------------------
# transforms vs torch
# ---------------------------------------------------------------------------

def test_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.RandomState(0).randn(2, 3, 31, 45).astype(np.float32)
    for mode in ("bilinear", "bicubic"):
        t = F.interpolate(torch.from_numpy(x), size=(224, 96), mode=mode,
                          align_corners=False).numpy()
        j = interp.resize(x, (224, 96), mode)
        np.testing.assert_allclose(j, t, atol=2e-5)


def test_tensor_normalize_matches_reference():
    conftest.add_reference_path()
    torch = pytest.importorskip("torch")
    from datasets_custom.data_utils import tensor_normalize as ref_tn

    x = np.random.RandomState(1).randint(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    ref = ref_tn(torch.from_numpy(x), [0.45, 0.45, 0.45], [0.225, 0.225, 0.225]).numpy()
    got = tfm.tensor_normalize(x, [0.45, 0.45, 0.45], [0.225, 0.225, 0.225])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_uniform_crop_matches_reference():
    conftest.add_reference_path()
    torch = pytest.importorskip("torch")
    from datasets_custom.transform import uniform_crop as ref_uc

    x = np.random.RandomState(2).randn(4, 3, 250, 300).astype(np.float32)
    for idx in (0, 1, 2):
        ref, _ = ref_uc(torch.from_numpy(x), 224, idx)
        got, _ = tfm.uniform_crop(x, 224, idx)
        np.testing.assert_array_equal(got, ref.numpy())


def test_temporal_sampling_matches_reference():
    conftest.add_reference_path()
    torch = pytest.importorskip("torch")
    from datasets_custom.decoder import temporal_sampling as ref_ts

    x = np.random.RandomState(3).randn(57, 4, 5).astype(np.float32)
    for (s, e, n) in [(0, 52, 8), (5, 56, 8), (0.0, 31.5, 16), (10, 12, 8)]:
        ref = ref_ts(torch.from_numpy(x), s, e, n).numpy()
        got = tfm.temporal_sampling(x, s, e, n)
        np.testing.assert_array_equal(got, ref)


def test_color_ops_match_reference():
    conftest.add_reference_path()
    torch = pytest.importorskip("torch")
    from datasets_custom import transform as ref_t

    x = np.random.RandomState(4).rand(2, 3, 8, 8).astype(np.float32)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(
        tfm.grayscale(x), ref_t.grayscale(xt).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        tfm.color_normalization(x, [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
        ref_t.color_normalization(xt, [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]).numpy(),
        atol=1e-6)
    np.testing.assert_allclose(
        tfm.blend(x, 1 - x, 0.3), ref_t.blend(xt, 1 - xt, 0.3).numpy(), atol=1e-6)


def test_dino_aug_shapes():
    rng = np.random.RandomState(0)
    aug = tfm.VideoDataAugmentationDINO(rng=rng)
    clip = rng.randint(0, 256, (8, 3, 128, 160), dtype=np.uint8).astype(np.float32)
    crops = aug([clip] * 10, from_list=True)
    assert len(crops) == 10
    assert crops[0].shape == (8, 3, 224, 224)
    assert crops[1].shape == (8, 3, 224, 224)
    for c in crops[2:]:
        assert c.shape == (8, 3, 96, 96)


def test_prefetch_loader_order_and_errors():
    from dino_video_summarization_transformer_tpu.data import PrefetchLoader

    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            if i == 13:
                raise ValueError("boom")
            return i * i

    out = list(PrefetchLoader(DS(), indices=range(12), num_workers=4))
    assert out == [i * i for i in range(12)]
    with pytest.raises(ValueError):
        list(PrefetchLoader(DS(), indices=range(20), num_workers=4))


def test_selection_probe_only_matches_decode_path(tmp_path):
    """probe_only derives Indices from container metadata (no decode);
    must match the decode path index-for-index across ragged lengths,
    rates, methods and sharpening (the reference decodes the whole video
    but never uses the pixels in Indices mode)."""
    import json

    from dino_video_summarization_transformer_tpu.config import get_cfg
    from dino_video_summarization_transformer_tpu.data import video as vio
    from dino_video_summarization_transformer_tpu.data.datasets import (
        FrameSelectionDataset)

    if not vio.native_available():
        pytest.skip("native decoder not built")

    rng = np.random.RandomState(0)
    lengths = [29, 32, 37, 40, 61]
    names = []
    for i, T in enumerate(lengths):
        name = f"v{i}.avi"
        vio.write_video(str(tmp_path / name),
                        rng.randint(0, 256, (T, 64, 96, 3), dtype=np.uint8),
                        fps=30)
        names.append(name)
    (tmp_path / "test.csv").write_text("".join(f"{n} 0\n" for n in names))

    for rate in (3, 4):
        loss = {f"v{i}": list(rng.rand(-(-T // rate)))
                for i, T in enumerate(lengths)}
        loss_file = str(tmp_path / f"loss_{rate}.json")
        with open(loss_file, "w") as f:
            json.dump(loss, f)
        cfg = get_cfg()
        cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
        cfg.DATA.PATH_PREFIX = str(tmp_path)
        cfg.LOSS_FILE = loss_file
        for method, sharpen in (("adaptive", False), ("adaptive", True),
                                ("uniform", False)):
            slow = FrameSelectionDataset(cfg, rate, method, 8,
                                         return_type="Indices",
                                         sharpen=sharpen)
            fast = FrameSelectionDataset(cfg, rate, method, 8,
                                         return_type="Indices",
                                         sharpen=sharpen, probe_only=True)
            for i in range(len(slow)):
                si, sl, sn = slow[i]
                fi, fl, fn = fast[i]
                assert (si, sl, sn) == (fi, fl, fn), (
                    rate, method, sharpen, names[i])
