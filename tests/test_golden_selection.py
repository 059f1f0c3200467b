"""Golden-parity harness against the committed reference artifacts.

Runs the REAL reference ``FrameSelectionLoader`` (imported read-only from
/root/reference, with only ``torchvision.io.read_video`` stubbed to
synthetic frames) over the COMMITTED per-frame score corpus
``loss_values/loss_msvd_4_3_30.json`` — every video of the published MSVD
run — and asserts index-for-index equality of the adaptive and uniform
selections against this repo's ``data/selection.py``. This is the
BASELINE.md bit-match requirement for the selection stage, runnable with
no videos and no checkpoint.

Tolerance policy (documented for the score JSONs themselves): loss values
are float64 lists printed by Python; the selection stage is pure integer
math given the scores, so THIS stage must match exactly. Score-production
parity is covered by tests/test_scoring_e2e.py (<=5e-4 vs the reference
flow in f32-HIGHEST) — bit-matching published score files additionally
requires the published SVT checkpoint and MSVD videos, absent here.
"""

import json
import os

import numpy as np
import pytest

import conftest

from dino_video_summarization_transformer_tpu.data.selection import (
    adaptive_indices, pad_indices, uniform_indices)

REF_LOSS_JSON = "/root/reference/loss_values/loss_msvd_4_3_30.json"
RATE = 4

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_LOSS_JSON), reason="reference artifacts absent")


@pytest.fixture(scope="module")
def loss_dict():
    return json.load(open(REF_LOSS_JSON))


@pytest.fixture(scope="module")
def reference_loader_cls():
    conftest.add_reference_path()
    import torch

    from datasets_custom import frame_selection_loader as fsl

    def fake_read_video(path, pts_unit="sec"):
        # video length synthesized from the score list: the scorer emits one
        # loss per presampled frame, so T_unsampled = T_loss * RATE
        key = os.path.splitext(os.path.basename(path))[0]
        T = len(fake_read_video.loss_dict[key]) * RATE
        return torch.zeros((T, 8, 8, 3), dtype=torch.uint8), None, None

    fsl.io.read_video = fake_read_video
    return fsl.FrameSelectionLoader, fake_read_video


def _make_cfg(tmpdir, keys, loss_file):
    from dino_video_summarization_transformer_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1  # one entry per video in the path list
    cfg.DATA.PATH_TO_DATA_DIR = str(tmpdir)
    cfg.DATA.PATH_PREFIX = ""
    cfg.DATASET = "MSVD"
    cfg.LOSS_FILE = loss_file
    with open(os.path.join(str(tmpdir), "test.csv"), "w") as f:
        for k in keys:
            f.write(f"{k}.avi 0\n")
    return cfg


def _ours(losses, N, sharpen=False):
    T = len(losses)
    idx, rows = adaptive_indices(
        losses, N, RATE, num_presampled=T, num_unsampled=T * RATE,
        sharpen=sharpen)
    return pad_indices(idx, N, len(rows))


@pytest.mark.parametrize("N,sharpen,stride", [
    (16, False, 1),    # full corpus, the published evaluation geometry
    (8, False, 7),     # every 7th video
    (16, True, 7),
    (8, True, 13),
])
def test_adaptive_selection_matches_reference_on_committed_scores(
        tmp_path, loss_dict, reference_loader_cls, N, sharpen, stride):
    cls, fake_read_video = reference_loader_cls
    keys = sorted(loss_dict)[::stride]
    use_losses = ({k: (np.asarray(v) ** 2).tolist() for k, v in
                   loss_dict.items()} if sharpen else loss_dict)
    loss_file = str(tmp_path / "loss.json")
    json.dump(use_losses, open(loss_file, "w"))
    fake_read_video.loss_dict = use_losses

    cfg = _make_cfg(tmp_path, keys, loss_file)
    ref = cls(cfg, RATE, selection_method="adaptive", num_frames=N,
              return_type="Indices")

    mismatches = []
    for i, key in enumerate(keys):
        ref_idx, _, fname = ref[i]
        got = _ours(np.asarray(use_losses[key], float), N, sharpen=False)
        if list(ref_idx) != list(got):
            mismatches.append((key, list(ref_idx), list(got)))
    assert not mismatches, mismatches[:3]


def test_uniform_selection_matches_reference(tmp_path, loss_dict,
                                             reference_loader_cls):
    cls, fake_read_video = reference_loader_cls
    keys = sorted(loss_dict)[::17]
    loss_file = str(tmp_path / "loss.json")
    json.dump(loss_dict, open(loss_file, "w"))
    fake_read_video.loss_dict = loss_dict

    cfg = _make_cfg(tmp_path, keys, loss_file)
    for N in (8, 16):
        ref = cls(cfg, RATE, selection_method="uniform", num_frames=N,
                  return_type="Indices")
        for i, key in enumerate(keys):
            ref_idx, _, _ = ref[i]
            T = len(loss_dict[key])
            idx, rows = uniform_indices(N, T)
            got = pad_indices(idx, N, len(rows))
            assert list(ref_idx) == list(got), (key, N)
