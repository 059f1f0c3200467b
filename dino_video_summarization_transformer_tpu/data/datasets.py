"""CSV-driven video datasets (Kinetics / UCF101 / HMDB51 / MSVD layouts).

Re-designs of the reference's dataset classes
(ref: datasets_custom/kinetics.py:22-353, ucf101.py:15-268, hmdb51.py:15-270,
dino_loss_loader.py:10-123, frame_selection_loader.py:12-218) on top of the
native libav decode shim. Datasets return numpy; batching/prefetching and
device upload happen in loader.py / the engine.

Key TPU-driven departure: the scoring dataset returns the decoded frame
buffer + window *index maps* instead of materialized (2T, 3, 30, 224, 224)
view stacks — windows are gathered on device (see data/windows.py).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import selection as sel
from . import video as vio
from . import yuv
from .transform import (
    VideoDataAugmentationDINO,
    get_start_end_idx,
    spatial_sampling,
    temporal_sampling,
    tensor_normalize,
    uniform_crop,
)
from .windows import WindowMismatch, window_indices


def read_csv_entries(
    path_to_file: str, path_prefix: str, separator: str = " ",
    num_clips: int = 1, mode_subdir: Optional[str] = None,
) -> Tuple[List[str], List[int]]:
    """Parse `path label` rows, replicating each ``num_clips`` times
    (ref: kinetics.py:80-118, dino_loss_loader.py:41-77)."""
    assert os.path.exists(path_to_file), f"{path_to_file} not found"
    paths, labels = [], []
    with open(path_to_file, "r") as f:
        for path_label in f.read().splitlines():
            if not path_label:
                continue
            assert len(path_label.split(separator)) == 2, path_label
            path, label = path_label.split(separator)
            for _ in range(num_clips):
                if mode_subdir is not None:
                    paths.append(os.path.join(path_prefix, mode_subdir, path))
                else:
                    paths.append(os.path.join(path_prefix, path))
                labels.append(int(label))
    assert paths, f"no entries in {path_to_file}"
    return paths, labels


class DinoLossDataset:
    """Scoring dataset: whole-video decode + per-frame window index maps
    (ref: datasets_custom/dino_loss_loader.py:10-123).

    __getitem__ returns a dict:
      frames      (T, 224, 224, 3) float32, normalized+center-cropped,
                  channels-last (device-upload-friendly); or None on dummy
      local_idx   (T, local_size) int64
      global_idx  (T, eff_global) int64
      eff_global  int
      path        str
      dummy       bool — size-mismatch -> constant-loss dummy protocol
                  (ref: dino_loss_loader.py:34-38, 104-107)
    """

    def __init__(self, cfg, mode: str, local_clip_size: int,
                 global_clip_size: int, sampling_rate: int,
                 device_preprocess: bool = False,
                 wire_format: str = "rgb8"):
        self.cfg = cfg
        self.mode = mode
        self.local_clip_size = local_clip_size
        self.global_clip_size = global_clip_size
        self.sampling_rate = sampling_rate
        self.crop_size = 224
        # device_preprocess: return center-cropped uint8 (4x fewer PCIe
        # bytes); the scoring engine fuses /255 + mean/std on device
        self.device_preprocess = device_preprocess
        # wire_format "yuv420": decode straight to packed I420 (the codec's
        # own planar 4:2:0 — HALF the bytes of RGB) and let the scoring
        # kernels color-convert on device (data/yuv.py). Implies
        # device-side preprocessing. "yuv420q" additionally box-averages
        # chroma to 1/8 resolution per axis (~1.03 B/px) for wire-bound
        # links; the scorer must be built with wire_format="yuv420q".
        assert wire_format in ("rgb8", "yuv420", "yuv420q"), wire_format
        self.wire_format = wire_format
        num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS
        csv = os.path.join(cfg.DATA.PATH_TO_DATA_DIR, f"{mode}.csv")
        self._path_to_videos, self._labels = read_csv_entries(
            csv, cfg.DATA.PATH_PREFIX, cfg.DATA.PATH_LABEL_SEPARATOR, num_clips)
        print(f"Constructing dataloader (size: {len(self._path_to_videos)}) from {csv}")

    def __len__(self):
        return len(self._path_to_videos)

    def __getitem__(self, index: int) -> dict:
        path = self._path_to_videos[index]
        out = {
            "path": path,
            "local_size": self.local_clip_size,
            "dummy": False,
        }
        try:
            return self._load_item(path, out)
        except Exception as e:
            # Any unexpected per-video failure (truncated container, odd
            # geometry, ...) degrades to the reference's constant-loss
            # dummy protocol (ref: dino_loss_loader.py:34-38) instead of
            # killing the whole scoring run.
            print(f"scoring: substituting dummy views for {path}: {e!r}",
                  flush=True)
            out["dummy"] = True
            out["frames"] = None
            out["eff_global"] = 1
            out["num_frames"] = self.global_clip_size
            return out

    def _load_item(self, path: str, out: dict) -> dict:
        packed = self.wire_format in ("yuv420", "yuv420q")
        try:
            # decode with the pre-sampling stride applied in the decoder
            # (the reference decodes everything then slices [::rate],
            # ref: dino_loss_loader.py:81-85)
            if packed:
                frames_u8, _fps = vio.read_video_yuv420(
                    path, stride=self.sampling_rate)
            else:
                frames_u8, _fps = vio.read_video(path, stride=self.sampling_rate)
        except vio.DecodeError:
            frames_u8 = np.zeros(
                (0, 0, 0) if packed else (0, 0, 0, 3), np.uint8)

        fh = yuv.frame_height(frames_u8.shape[1]) if packed \
            else frames_u8.shape[1]
        if frames_u8.shape[0] == 0 or fh < self.crop_size \
                or frames_u8.shape[2] < self.crop_size:
            # size-mismatch protocol: constant-loss dummy views
            out["dummy"] = True
            out["frames"] = None
            out["eff_global"] = min(self.global_clip_size,
                                    max(frames_u8.shape[0], 1))
            out["num_frames"] = self.global_clip_size  # 30 constant entries
            return out

        if packed:
            # center crop the packed I420 buffer directly (same
            # ceil-centered offsets as uniform_crop, rounded down to even
            # for chroma alignment); normalization AND color conversion
            # happen on device
            import math as _math

            y0 = int(_math.ceil((fh - self.crop_size) / 2))
            x0 = int(_math.ceil((frames_u8.shape[2] - self.crop_size) / 2))
            frames = yuv.crop(frames_u8, y0, x0,
                              self.crop_size, self.crop_size)
            if self.wire_format == "yuv420q":
                # crop first (full-res chroma grid), then quarter: the
                # 8x8-aligned crop the q layout would need never rounds
                frames = yuv.quarter_chroma(frames)
        elif self.device_preprocess:
            # center crop on uint8 without normalizing (engine normalizes)
            tchw = np.moveaxis(frames_u8, -1, 1)
            tchw, _ = uniform_crop(tchw, self.crop_size, spatial_idx=1)
            frames = np.ascontiguousarray(np.moveaxis(tchw, 1, -1))
        else:
            frames = tensor_normalize(frames_u8, self.cfg.DATA.MEAN, self.cfg.DATA.STD)
            tchw = np.moveaxis(frames, -1, 1)
            tchw, _ = uniform_crop(tchw, self.crop_size, spatial_idx=1)
            frames = np.ascontiguousarray(np.moveaxis(tchw, 1, -1))

        T = frames.shape[0]
        try:
            local_idx, global_idx, eff_global = window_indices(
                T, self.local_clip_size, self.global_clip_size)
        except WindowMismatch:
            # ragged windows (odd T < global size): reference dummy protocol
            out["dummy"] = True
            out["frames"] = None
            out["eff_global"] = min(self.global_clip_size, max(T, 1))
            out["num_frames"] = self.global_clip_size
            return out
        out.update(frames=frames, local_idx=local_idx, global_idx=global_idx,
                   eff_global=eff_global, num_frames=T)
        return out


class FrameSelectionDataset:
    """Uniform / adaptive frame selection
    (ref: datasets_custom/frame_selection_loader.py:12-218)."""

    def __init__(self, cfg, pre_sampling_rate: int,
                 selection_method: str = "uniform", num_frames: int = 8,
                 augmentations: bool = False, return_type: str = "Tensor",
                 mode: str = "test", sharpen: bool = False,
                 probe_only: bool = False):
        self.cfg = cfg
        self.mode = mode
        self.pre_sampling_rate = pre_sampling_rate
        self.selection_method = selection_method
        self.num_frames = num_frames
        self.crop_size = 224
        self.augmentations = augmentations
        self.return_type = return_type
        self.sharpen = sharpen
        # Indices-mode fast path: selection math needs only FRAME COUNTS
        # (the reference decodes the whole video anyway —
        # frame_selection_loader.py:93 — but never touches the pixels when
        # only indices are consumed). probe_only derives the presampled
        # count from container metadata (ceil(nb_frames / rate), matching
        # the strided decode) and skips the decode entirely; falls back to
        # decoding when the container reports no frame count. Opt-in: a
        # container whose nb_frames metadata lies would shift indices vs
        # the reference's decode-derived count.
        self.probe_only = probe_only

        with open(cfg.LOSS_FILE, "r") as f:
            self.loss_dict = json.load(f)

        num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS
        csv = os.path.join(cfg.DATA.PATH_TO_DATA_DIR, f"{mode}.csv")
        mode_subdir = mode if cfg.get("DATASET", "") == "Kinetics" else None
        self._path_to_videos, self._labels = read_csv_entries(
            csv, cfg.DATA.PATH_PREFIX, cfg.DATA.PATH_LABEL_SEPARATOR,
            num_clips, mode_subdir)
        print(f"Constructing dataloader (size: {len(self._path_to_videos)}) from {csv}")

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def labels(self):
        return list(self._labels)

    def _indices_from_probe(self, path, file_name, index, N):
        """Decode-free Indices path: counts from container metadata."""
        info = vio.video_info(path)
        num_unsampled = info["num_frames"]
        if num_unsampled <= 0:
            return None  # metadata absent; caller decodes
        num_presampled = -(-num_unsampled // self.pre_sampling_rate)
        if self.selection_method == "adaptive":
            key = os.path.splitext(file_name)[0]
            indices, frame_rows = sel.adaptive_indices(
                self.loss_dict[key], N, self.pre_sampling_rate,
                num_presampled=num_presampled, num_unsampled=num_unsampled,
                sharpen=self.sharpen)
        else:
            indices, frame_rows = sel.uniform_indices(N, num_presampled)
        indices = sel.pad_indices(indices, N, len(frame_rows))
        return indices, self._labels[index], file_name

    def __getitem__(self, index: int):
        path = self._path_to_videos[index]
        file_name = os.path.basename(path)
        N = self.num_frames

        if (self.probe_only and self.return_type == "Indices"
                and not self.augmentations):
            out = self._indices_from_probe(path, file_name, index, N)
            if out is not None:
                return out

        # total unsampled frame count, needed for the duplicate-resolution
        # bound (ref: frame_selection_loader.py:159-164)
        info = vio.video_info(path)
        num_unsampled = info["num_frames"]
        frames_u8, _ = vio.read_video(path, stride=self.pre_sampling_rate)
        if num_unsampled <= 0:
            # container didn't report nb_frames: derive from the decode
            num_unsampled = frames_u8.shape[0] * self.pre_sampling_rate

        if self.augmentations:
            frames = tensor_normalize(frames_u8, self.cfg.DATA.MEAN, self.cfg.DATA.STD)
            frames = np.moveaxis(frames, -1, 1)  # T C H W
            frames, _ = uniform_crop(frames, self.crop_size, spatial_idx=1)
        else:
            frames = np.moveaxis(frames_u8, -1, 1)  # T C H W, uint8

        if self.selection_method == "adaptive":
            key = os.path.splitext(file_name)[0]
            loss_list = self.loss_dict[key]
            indices, frame_rows = sel.adaptive_indices(
                loss_list, N, self.pre_sampling_rate,
                num_presampled=frames.shape[0], num_unsampled=num_unsampled,
                sharpen=self.sharpen)
        else:
            indices, frame_rows = sel.uniform_indices(N, frames.shape[0])

        selected = np.stack([frames[r] for r in frame_rows]) if frame_rows else frames[:0]
        indices = sel.pad_indices(indices, N, selected.shape[0])

        frames_cthw = np.ascontiguousarray(np.moveaxis(selected, 0, 1))  # C T H W

        if self.return_type == "Indices":
            return indices, self._labels[index], file_name
        if self.return_type == "Dict":
            want = (3, N, 224, 224)
            if frames_cthw.shape != want:
                frames_cthw = np.zeros(want, np.float32)  # ref zero-pad quirk
            return {
                "pixel_values": np.moveaxis(frames_cthw, 0, 1),  # (N, C, H, W)
                "label": self._labels[index],
            }
        return frames_cthw, self._labels[index], file_name, {}


class ClipDataset:
    """Train/val/test clip dataset for Kinetics / UCF101 / HMDB51
    (ref: datasets_custom/kinetics.py:121-332, ucf101.py:96-268).

    Train mode: one random temporal clip; optional DINO multi-crop
    (``temporal_aug``) producing 2 global + ``local_crops_number`` local
    clips. Val/test: deterministic NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS
    grid with normalize + spatial_sampling.
    """

    def __init__(self, cfg, mode: str, num_retries: int = 10,
                 get_flow: bool = False, temporal_aug: bool = False,
                 two_token: bool = False, rand_fr: bool = False,
                 tiled_local: bool = False,
                 csv_name: Optional[str] = None, seed: Optional[int] = None):
        assert mode in ("train", "val", "test")
        self.cfg = cfg
        self.mode = mode
        self._num_retries = num_retries
        self.temporal_aug = temporal_aug
        # two_token: 3 global + 2 local clips -> 6 aug views
        # (ref: decoder.py:401-414, transform.py:738-743)
        self.two_token = two_token
        # rand_fr: variable-frame-count multi-crop — globals of 4 and 8
        # frames, locals of [2,2,4,4,8,8,16,16] (ref: decoder.py:418-427)
        self.rand_fr = rand_fr
        # tiled_local: decode_custom's variant — locals are 8 overlapping
        # 96x96 SPATIAL tiles of one random frame (ref: decoder.py:447-623)
        self.tiled_local = tiled_local
        # optical-flow folder companion to each video, fed to the motion
        # stream of TWO_STREAM training (ref: kinetics.py:314-348)
        self.get_flow = get_flow
        if get_flow:
            assert mode == "train", "flow only for train"
        self.rng = np.random.RandomState(seed)

        if mode in ("train", "val"):
            self._num_clips = 1
        else:
            self._num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS

        csv = os.path.join(cfg.DATA.PATH_TO_DATA_DIR, csv_name or f"{mode}.csv")
        self._path_to_videos, self._labels = read_csv_entries(
            csv, cfg.DATA.PATH_PREFIX, cfg.DATA.PATH_LABEL_SEPARATOR,
            self._num_clips)
        self._spatial_temporal_idx = [
            i % self._num_clips for i in range(len(self._path_to_videos))
        ]
        print(f"Constructing dataloader (size: {len(self._path_to_videos)}) from {csv}")

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def labels(self):
        return list(self._labels)

    def _decode_clip(self, index: int):
        """Decode + temporal sampling; returns (T,H,W,C) uint8 or list of
        clips under temporal_aug (ref: decoder.py:307-446).

        The plain (non-multi-crop) path uses selective PTS-range decode:
        probe the container, compute the clip's sample indices, then
        keyframe-seek and decode ONLY those frames (ref: decoder.py:217-304
        pyav_decode) — the multi-crop paths span the whole video and decode
        it all, as the reference's decode_all_video branch does."""
        cfg = self.cfg
        path = self._path_to_videos[index]
        multi_crop = (self.two_token or self.temporal_aug) and self.mode == "train"

        if self.mode in ("train", "val"):
            clip_idx = -1
            num_clips_total = 1
        else:
            clip_idx = self._spatial_temporal_idx[index] // cfg.TEST.NUM_SPATIAL_CROPS
            num_clips_total = cfg.TEST.NUM_ENSEMBLE_VIEWS

        sampling_rate = cfg.DATA.SAMPLING_RATE
        num_frames = cfg.DATA.NUM_FRAMES
        target_fps = cfg.DATA.TARGET_FPS

        if not multi_crop:
            try:
                info = vio.video_info(path)
            except vio.DecodeError:
                return None
            size = info["num_frames"]
            if size > 0:
                fps = info["fps"] or target_fps
                clip_sz = sampling_rate * num_frames / target_fps * fps
                start_idx, end_idx = get_start_end_idx(
                    size, clip_sz, clip_idx, num_clips_total, rng=self.rng)
                # temporal_sampling's exact index rule over the full video
                idx = np.linspace(start_idx, end_idx, num_frames,
                                  dtype=np.float32)
                idx = np.clip(idx, 0, size - 1).astype(np.int64)
                try:
                    clip = vio.read_video_indices(path, idx)
                except vio.DecodeError:
                    return None
                return clip if clip.shape[0] else None
            # container doesn't report nb_frames: fall through to whole decode

        frames, fps = vio.read_video(path)
        if frames.shape[0] == 0:
            return None

        fps = fps or target_fps
        clip_sz = sampling_rate * num_frames / target_fps * fps
        start_idx, end_idx = get_start_end_idx(
            frames.shape[0], clip_sz, clip_idx, num_clips_total, rng=self.rng)

        if self.two_token and self.mode == "train":
            # 3 global + 2 local clips (ref: decoder.py:401-414)
            max_len = frames.shape[0]
            globals_ = []
            for _ in range(3):
                ri = int(self.rng.randint(0, 7))
                globals_.append(
                    temporal_sampling(frames, ri, max_len - ri, num_frames))
            locals_ = []
            local_width = max_len // 8
            for _ in range(2):
                ri = int(self.rng.randint(0, max(max_len - local_width, 1)))
                locals_.append(
                    temporal_sampling(frames, ri, ri + local_width, num_frames))
            return [*globals_, *locals_]

        if self.temporal_aug and self.mode == "train":
            max_len = frames.shape[0]
            local_width = max_len // 8
            if self.rand_fr:
                # variable-frame-count clips (ref: decoder.py:418-427):
                # globals of 4 and 8 frames, locals of [2,2,4,4,8,8,16,16]
                g1 = temporal_sampling(frames, 0, max_len - 5, 4)
                g2 = temporal_sampling(frames, 5, max_len, 8)
                locals_ = []
                for n_local in (2, 2, 4, 4, 8, 8, 16, 16):
                    ri = int(self.rng.randint(0, max(max_len - local_width, 1)))
                    locals_.append(
                        temporal_sampling(frames, ri, ri + local_width, n_local))
                return [g1, g2, *locals_]
            # 2 global + 8 local clips (ref: decoder.py:428-440)
            g1 = temporal_sampling(frames, 0, max_len - 5, num_frames)
            g2 = temporal_sampling(frames, 5, max_len, num_frames)
            if self.tiled_local:
                # decode_custom: locals = 8 overlapping 96x96 spatial tiles
                # of one random frame (ref: decoder.py:576-601)
                from .transform import spatial_tile_local_crops

                ri = int(self.rng.randint(0, max(max_len - local_width, 1)))
                one = temporal_sampling(frames, ri, ri, 1)[0]
                return [g1, g2, *spatial_tile_local_crops(one)]
            locals_ = []
            for _ in range(8):
                ri = int(self.rng.randint(0, max(max_len - local_width, 1)))
                locals_.append(temporal_sampling(frames, ri, ri + local_width, num_frames))
            return [g1, g2, *locals_]
        return temporal_sampling(frames, start_idx, end_idx, num_frames)

    def _load_flow(self, index: int):
        """Optical-flow companion frames: `<video minus ext>` under the
        train_flow sibling dir, sobel-filtered (ref: kinetics.py:314-348).
        Returns (T, C, H, W) float32 or raises FileNotFoundError."""
        from ..ops.image import load_flow_folder

        flow_path = self._path_to_videos[index].replace(
            "train_d256", "train_flow")[:-4]
        flow = load_flow_folder(flow_path)  # (T, C, H, W) float32 or None
        if flow is None:
            raise FileNotFoundError(flow_path)
        return _sobel_np(flow)

    def __getitem__(self, index: int):
        cfg = self.cfg
        for retry in range(self._num_retries):
            clips = self._decode_clip(index)
            if clips is None:
                index = int(self.rng.randint(0, len(self)))
                continue
            meta = {}
            if self.get_flow:
                # flow failures retry with substitution like decode failures
                # (ref: kinetics.py:329-332 `continue`s the retry loop)
                try:
                    flow = self._load_flow(index)
                except Exception:
                    index = int(self.rng.randint(0, len(self)))
                    continue
                if cfg.DATA.NO_FLOW_AUG:
                    from .transform import resize as _resize

                    flow = _resize(flow, cfg.DATA.CROP_SIZE, mode="bicubic")
                    meta["flow"] = [np.asarray(x) for x in flow]  # per-frame CHW
                else:
                    # DINO multi-crop over the flow video, each crop
                    # rearranged t c h w -> c t h w (ref: kinetics.py:324-326)
                    aug = VideoDataAugmentationDINO(rng=self.rng)
                    flow_crops = aug(flow)
                    meta["flow"] = [
                        np.ascontiguousarray(np.moveaxis(c, 0, 1))
                        for c in flow_crops]
            break
        else:
            raise RuntimeError(f"failed to decode after {self._num_retries} retries")

        label = self._labels[index]

        if self.two_token and self.mode == "train":
            aug = VideoDataAugmentationDINO(rng=self.rng)
            as_tchw = [np.moveaxis(c, -1, 1).astype(np.float32) for c in clips]
            # 6 views: [aug global 224, plain global 224, 2x local-96 crops
            # of global clips, 2x plain 224 of temporally-local clips]
            # (ref: transform.py:738-743)
            crops = aug(as_tchw, two_token=True)
            crops = [np.ascontiguousarray(np.moveaxis(c, 0, 1)) for c in crops]
            return crops, label, index, meta

        if self.temporal_aug and self.mode == "train":
            aug = VideoDataAugmentationDINO(rng=self.rng)
            # clips are (T,H,W,C) uint8 -> (T,C,H,W) float for the aug chain
            as_tchw = [np.moveaxis(c, -1, 1).astype(np.float32) for c in clips]
            crops = aug(as_tchw, from_list=True)
            # T C H W -> C T H W (ref: kinetics.py:306-311)
            crops = [np.ascontiguousarray(np.moveaxis(c, 0, 1)) for c in crops]
            return crops, label, index, meta

        # plain path: normalize + spatial sampling (ref: kinetics.py:257-289)
        frames = tensor_normalize(clips, cfg.DATA.MEAN, cfg.DATA.STD)
        frames = np.moveaxis(frames, -1, 1)  # T C H W
        if self.mode in ("train", "val"):
            spatial_idx = -1
            min_s, max_s = cfg.DATA.TRAIN_JITTER_SCALES
            crop = cfg.DATA.TRAIN_CROP_SIZE
        else:
            spatial_idx = self._spatial_temporal_idx[index] % cfg.TEST.NUM_SPATIAL_CROPS
            min_s = max_s = crop = cfg.DATA.TEST_CROP_SIZE
        frames = spatial_sampling(
            frames, self.rng, spatial_idx=spatial_idx, min_scale=min_s,
            max_scale=max_s, crop_size=crop,
            random_horizontal_flip=cfg.DATA.RANDOM_FLIP)
        frames = np.ascontiguousarray(np.moveaxis(frames, 0, 1))  # C T H W
        return frames, label, index, meta


def _sobel_np(images: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Host-side Sobel gradient magnitude matching kornia.filters.sobel
    (ref: kinetics.py:319): per-channel normalized 3x3 kernels, reflect
    padding, sqrt(gx^2+gy^2+eps). images (T, C, H, W) float32.

    Pure numpy (separable correlation) so dataloader workers never touch
    the jax device — the jnp twin lives in ops/image.py for on-device use.
    """
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
    ky = kx.T
    x = np.pad(images, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")

    def corr(inp, k):
        out = np.zeros_like(images)
        for dy in range(3):
            for dx in range(3):
                if k[dy, dx]:
                    out += k[dy, dx] * inp[
                        :, :, dy:dy + images.shape[2], dx:dx + images.shape[3]]
        return out

    gx = corr(x, kx)
    gy = corr(x, ky)
    return np.sqrt(gx * gx + gy * gy + eps)


def load_image_lists(frame_list_file: str, prefix: str = "",
                     return_list: bool = False):
    """Frame-list CSV parser (ref: datasets_custom/data_utils.py:263-305):
    header then `original_vido_id video_id frame_id path labels` rows."""
    from collections import defaultdict

    image_paths = defaultdict(list)
    labels = defaultdict(list)
    with open(frame_list_file, "r") as f:
        assert f.readline().startswith("original_vido_id")
        for line in f:
            row = line.split()
            if not row:
                continue
            assert len(row) == 5, row
            video_name = row[0]
            path = row[3] if prefix == "" else os.path.join(prefix, row[3])
            image_paths[video_name].append(path)
            frame_labels = row[-1].replace('"', "")
            labels[video_name].append(
                [int(x) for x in frame_labels.split(",")] if frame_labels
                else [])
    if return_list:
        keys = image_paths.keys()
        return ([image_paths[k] for k in keys], [labels[k] for k in keys])
    return dict(image_paths), dict(labels)


def retry_load_images(image_paths: List[str], retry: int = 10,
                      rng=None) -> np.ndarray:
    """Load a list of frame images with retries
    (ref: datasets_custom/data_utils.py:19-47). Returns (T, H, W, C) uint8
    in BGR channel order — the reference reads with cv2.imread and never
    converts, so BGR is the (quirky) contract its SSv2 models trained on."""
    import time

    from PIL import Image

    for i in range(retry):
        try:
            imgs = [np.asarray(Image.open(p).convert("RGB"))[..., ::-1]
                    for p in image_paths]
            return np.stack(imgs)
        except Exception:
            if i == retry - 1:
                raise
            time.sleep(1.0)


class Ssv2Dataset:
    """Something-Something v2 frame-list loader
    (ref: datasets_custom/ssv2.py:21-278).

    The reference ships this as dead code — it imports the nonexistent
    `timesformer.utils.logging` (ref: ssv2.py:12) and is commented out of
    its package (ref: datasets_custom/__init__.py:8) — rebuilt here as a
    working loader with the same label/frame-list format and sampling math.

    Train/val: one clip, frames drawn per temporal segment (train: uniform
    in the segment, val/test: segment midpoint). Test: NUM_ENSEMBLE_VIEWS x
    NUM_SPATIAL_CROPS deterministic grid. Returns (frames CTHW float32,
    label, index, {}).
    """

    def __init__(self, cfg, mode: str, num_retries: int = 10,
                 seed: Optional[int] = None):
        assert mode in ("train", "val", "test"), mode
        self.cfg = cfg
        self.mode = mode
        self._num_retries = num_retries
        self.rng = np.random.RandomState(seed)
        if mode in ("train", "val"):
            self._num_clips = 1
        else:
            self._num_clips = (cfg.TEST.NUM_ENSEMBLE_VIEWS
                               * cfg.TEST.NUM_SPATIAL_CROPS)

        data_dir = cfg.DATA.PATH_TO_DATA_DIR
        with open(os.path.join(
                data_dir, "something-something-v2-labels.json")) as f:
            label_dict = json.load(f)
        split = "train" if mode == "train" else "validation"
        with open(os.path.join(
                data_dir, f"something-something-v2-{split}.json")) as f:
            label_json = json.load(f)

        video_names, labels = [], []
        for video in label_json:
            template = video["template"].replace("[", "").replace("]", "")
            video_names.append(video["id"])
            labels.append(int(label_dict[template]))

        csv = os.path.join(
            data_dir, "{}.csv".format("train" if mode == "train" else "val"))
        path_dict, _ = load_image_lists(csv, cfg.DATA.PATH_PREFIX)

        # dict -> aligned lists, dropping videos without frame rows
        # (ref: ssv2.py:125-133)
        paths, new_labels = [], []
        for name, label in zip(video_names, labels):
            if name in path_dict:
                paths.append(path_dict[name])
                new_labels.append(label)

        self._path_to_videos = [p for p in paths for _ in range(self._num_clips)]
        self._labels = [l for l in new_labels for _ in range(self._num_clips)]
        self._spatial_temporal_idx = [
            i % self._num_clips for i in range(len(self._path_to_videos))]
        print(f"Constructing ssv2 dataloader "
              f"(size: {len(self._path_to_videos)}) from {csv}")

    def __len__(self):
        return len(self._path_to_videos)

    @property
    def labels(self):
        return list(self._labels)

    def seq_indices(self, video_length: int) -> List[int]:
        """Per-segment frame sampling (ref: ssv2.py:225-236): segment i
        spans [round(seg*i), round(seg*(i+1))]; train draws uniformly in the
        segment (inclusive), val/test takes the midpoint."""
        num_frames = self.cfg.DATA.NUM_FRAMES
        seg_size = float(video_length - 1) / num_frames
        seq = []
        for i in range(num_frames):
            start = int(np.round(seg_size * i))
            end = int(np.round(seg_size * (i + 1)))
            if self.mode == "train":
                seq.append(int(self.rng.randint(start, end + 1)))
            else:
                seq.append((start + end) // 2)
        return seq

    def __getitem__(self, index):
        cfg = self.cfg
        short_cycle_idx = None
        if isinstance(index, tuple):  # ShortCycleBatcher protocol
            index, short_cycle_idx = index

        if self.mode in ("train", "val"):
            spatial_sample_index = -1
            min_scale, max_scale = cfg.DATA.TRAIN_JITTER_SCALES
            crop_size = cfg.DATA.TRAIN_CROP_SIZE
            if short_cycle_idx in (0, 1):
                crop_size = int(round(
                    cfg.MULTIGRID.SHORT_CYCLE_FACTORS[short_cycle_idx]
                    * cfg.MULTIGRID.DEFAULT_S))
            if cfg.MULTIGRID.DEFAULT_S > 0:
                min_scale = int(round(
                    float(min_scale) * crop_size / cfg.MULTIGRID.DEFAULT_S))
        else:
            spatial_sample_index = (
                self._spatial_temporal_idx[index] % cfg.TEST.NUM_SPATIAL_CROPS)
            if cfg.TEST.NUM_SPATIAL_CROPS == 1:
                spatial_sample_index = 1
            min_scale = max_scale = crop_size = cfg.DATA.TEST_CROP_SIZE

        label = self._labels[index]
        frame_paths = self._path_to_videos[index]
        seq = self.seq_indices(len(frame_paths))
        frames = retry_load_images(
            [frame_paths[i] for i in seq], self._num_retries)

        frames = tensor_normalize(frames, cfg.DATA.MEAN, cfg.DATA.STD)
        frames = np.moveaxis(frames, -1, 1)  # T H W C -> T C H W
        frames = spatial_sampling(
            frames, self.rng, spatial_idx=spatial_sample_index,
            min_scale=min_scale, max_scale=max_scale, crop_size=crop_size,
            random_horizontal_flip=cfg.DATA.RANDOM_FLIP,
            inverse_uniform_sampling=cfg.DATA.INV_UNIFORM_SAMPLE)
        # ViT path: temporal re-sample to NUM_FRAMES (ref: ssv2.py:263-271);
        # the reference's SlowFast pack_pathway branch is dead here (ARCH
        # is always 'vit' in this pipeline)
        frames = np.ascontiguousarray(np.moveaxis(frames, 0, 1))  # C T H W
        idx = np.linspace(0, frames.shape[1] - 1, cfg.DATA.NUM_FRAMES,
                          dtype=np.float32).astype(np.int64)
        frames = frames[:, idx]
        return frames, label, index, {}


# dataset registry (ref: datasets_custom/build.py:5-30)
DATASET_REGISTRY = {}


def register_dataset(name):
    def deco(cls):
        DATASET_REGISTRY[name.lower()] = cls
        return cls
    return deco


def build_dataset(name: str, cfg, split: str, **kw):
    key = name.lower()
    if key in DATASET_REGISTRY:
        return DATASET_REGISTRY[key](cfg, split, **kw)
    # kinetics / ucf101 / hmdb51 share the ClipDataset implementation;
    # their differences are CSV naming conventions handled by csv_name
    if key in ("kinetics", "kinetics400"):
        return ClipDataset(cfg, split, **kw)
    if key == "ssv2":
        return Ssv2Dataset(cfg, split, **kw)
    if key == "ucf101":
        return ClipDataset(cfg, split, csv_name=f"ucf101_{split}_split_1_videos.txt", **kw)
    if key == "hmdb51":
        return ClipDataset(cfg, split, csv_name=f"hmdb51_{split}_split_1_videos.txt", **kw)
    raise ValueError(f"unknown dataset {name}")
