"""train_ssl.py CLI smoke: one tiny step end-to-end incl. checkpoint/resume."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

from dino_video_summarization_transformer_tpu.data import video as vio


@pytest.mark.slow
def test_train_ssl_cli_one_step(tmp_path):
    if not vio.native_available():
        pytest.skip("native decoder not built")
    d = tmp_path
    rng = np.random.RandomState(0)
    for name in ("a", "b"):
        fr = rng.randint(0, 256, (40, 256, 320, 3), dtype=np.uint8)
        vio.write_video(str(d / f"{name}.avi"), fr, fps=30)
    (d / "train.csv").write_text("a.avi 0\nb.avi 1\n")

    out_dir = str(d / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(conftest.REPO_ROOT, "train_ssl.py"),
        "--arch", "vit_tiny",
        "--cfg", os.path.join(conftest.REPO_ROOT,
                              "configs/kinetics/timesformer_divst_8x32_224.yaml"),
        "--data_path", str(d),
        "--output_dir", out_dir,
        "--batch_size_per_gpu", "2",
        "--epochs", "1",
        "--warmup_epochs", "0",
        "--local_crops_number", "2",
        "--out_dim", "1024",
        "--num_workers", "2",
        "--use_fp16", "false",
        "--max_steps_per_epoch", "1",
        "--saveckp_freq", "0",
        "--opts", "DATA.NUM_FRAMES", "2", "DATA.SAMPLING_RATE", "4",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                          env=env, cwd=conftest.REPO_ROOT)
    assert proc.returncode == 0, proc.stderr[-4000:]

    log = os.path.join(out_dir, "log.txt")
    assert os.path.exists(log)
    rec = json.loads(open(log).read().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])
    assert os.path.exists(os.path.join(out_dir, "checkpoint"))

    # resume path: running again starts at epoch 1 == epochs -> no new epochs
    proc2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                           env=env, cwd=conftest.REPO_ROOT)
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    assert "Resumed from" in proc2.stdout
