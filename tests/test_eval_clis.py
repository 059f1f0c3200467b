"""Smoke tests for eval_knn.py / eval_linear.py / timesformer_evaluation.py
CLIs on synthetic datasets (CPU, slow-marked)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

from dino_video_summarization_transformer_tpu.data import video as vio


@pytest.fixture(scope="module")
def ucf_like(tmp_path_factory):
    if not vio.native_available():
        pytest.skip("native decoder not built")
    d = tmp_path_factory.mktemp("ucf")
    rng = np.random.RandomState(0)
    lines = {"train": [], "val": [], "test": []}
    for i in range(4):
        fr = rng.randint(0, 256, (40, 256, 320, 3), dtype=np.uint8)
        name = f"v{i}.avi"
        vio.write_video(str(d / name), fr, fps=30)
        for split in lines:
            lines[split].append(f"{name} {i % 2}")
    for split, rows in lines.items():
        (d / f"ucf101_{split}_split_1_videos.txt").write_text("\n".join(rows) + "\n")
    return str(d)


def run_cli(script, extra, timeout=900):
    env = conftest.cpu_subprocess_env()
    cmd = [sys.executable, os.path.join(conftest.REPO_ROOT, script)] + extra
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                          env=env, cwd=conftest.REPO_ROOT)


COMMON_OPTS = ["DATA.NUM_FRAMES", "2", "DATA.SAMPLING_RATE", "8",
               "TEST.NUM_ENSEMBLE_VIEWS", "1"]


@pytest.mark.slow
def test_eval_knn_cli(ucf_like):
    proc = run_cli("eval_knn.py", [
        "--arch", "vit_tiny", "--dataset", "ucf101",
        "--data_path", ucf_like, "--batch_size_per_gpu", "2",
        "--nb_knn", "1", "2", "--num_workers", "2", "--num_labels", "2",
        "--cfg", "configs/kinetics/timesformer_divst_8x32_224.yaml",
        "--opts", *COMMON_OPTS,
    ])
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "-NN classifier result" in proc.stdout


@pytest.mark.slow
def test_eval_linear_cli(ucf_like, tmp_path):
    out = str(tmp_path / "lin")
    proc = run_cli("eval_linear.py", [
        "--arch", "vit_tiny", "--dataset", "ucf101",
        "--data_path", ucf_like, "--batch_size_per_gpu", "2",
        "--epochs", "1", "--num_workers", "2", "--num_labels", "2",
        "--output_dir", out, "--max_steps_per_epoch", "2",
        "--cfg", "configs/kinetics/timesformer_divst_8x32_224.yaml",
        "--opts", *COMMON_OPTS,
    ])
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "checkpoint_linear.npz"))
    assert "Multi-view test" in proc.stdout


@pytest.mark.slow
def test_timesformer_evaluation_cli(tmp_path):
    if not vio.native_available():
        pytest.skip("native decoder not built")
    import torch
    from transformers import TimesformerConfig, TimesformerForVideoClassification

    d = tmp_path
    rng = np.random.RandomState(0)
    losses = {}
    rows = []
    for i in range(2):
        fr = rng.randint(0, 256, (64, 256, 320, 3), dtype=np.uint8)
        name = f"clip{i}.avi"
        vio.write_video(str(d / name), fr, fps=30)
        losses[f"clip{i}"] = list(rng.rand(16))
        rows.append(f"{name} {i}")
    (d / "test.csv").write_text("\n".join(rows) + "\n")
    (d / "loss.json").write_text(json.dumps(losses))

    # tiny HF checkpoint saved locally
    hf_cfg = TimesformerConfig(
        image_size=224, patch_size=16, num_frames=4, hidden_size=48,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=192,
        num_labels=3)
    model = TimesformerForVideoClassification(hf_cfg)
    model.save_pretrained(str(d / "hf_model"))

    proc = run_cli("timesformer_evaluation.py", [
        "--model_path", str(d / "hf_model"),
        "--loss_file", str(d / "loss.json"),
        "--data_path", str(d), "--dataset", "MSVD",
        "--num_frames", "4", "--num_labels", "3",
        "--log_path", str(d / "eval.log"),
        "--cfg", "configs/kinetics/timesformer_divst_8x32_224.yaml",
        "--opts", "TEST.NUM_ENSEMBLE_VIEWS", "1",
    ])
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "final top-1 accuracy" in proc.stdout
