"""Real-asset validation harness (tools/validate_real_assets.py).

The harness is the one-command bridge from asset availability to a
verdict (VERDICT r3 next-#5); CI runs its FULL chain on synthesized
stand-ins in the real formats, so the only untested line on real assets
is the assets themselves.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

import conftest


def test_reference_checkpoint_roundtrip():
    """pytree -> reference-layout .pth -> pytree is exact (the exporter
    that both the dry-run stand-ins and reference-interop rely on)."""
    torch = pytest.importorskip("torch")
    import jax

    from dino_video_summarization_transformer_tpu.models import (
        convert, init_timesformer)
    from dino_video_summarization_transformer_tpu.models.timesformer import (
        TimeSformerConfig)

    cfg = TimeSformerConfig(img_size=32, patch_size=16, embed_dim=64,
                            depth=2, num_heads=2, num_frames=4,
                            num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rt.pth")
        convert.save_reference_checkpoint(path, params, cfg)
        back = convert.convert_svt_checkpoint(path, cfg,
                                              checkpoint_key="teacher")
    la = jax.tree.leaves(params)
    lb = jax.tree.leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-6)


def test_comparator_tolerance_policy(tmp_path):
    """compare_loss_json: the documented tolerance policy — pass within
    tol, fail beyond it, truncate on length mismatch (the reference's own
    truncate-to-video-length quirk)."""
    from tools.validate_real_assets import compare_loss_json

    ref = {"a": [1.0, 2.0, 3.0], "b": [0.5, 0.25]}
    got_ok = {"a": [1.0 + 5e-5, 2.0, 3.0], "b": [0.5, 0.25, 99.0]}
    got_bad = {"a": [1.1, 2.0, 3.0], "b": [0.5, 0.25]}
    rp = tmp_path / "ref.json"
    json.dump(ref, open(rp, "w"))
    gp = tmp_path / "got.json"
    json.dump(got_ok, open(gp, "w"))
    r = compare_loss_json(str(gp), str(rp), tol=1e-4)
    assert r["status"] == "ok" and r["videos_pass"] == 2
    assert r["length_mismatches"] == 1  # 'b' truncated, extra tail ignored
    json.dump(got_bad, open(gp, "w"))
    r = compare_loss_json(str(gp), str(rp), tol=1e-4)
    assert r["status"] == "failed" and r["videos_fail"] == 1


@pytest.mark.slow
def test_harness_dry_run_end_to_end(tmp_path):
    """The full chain (convert -> score -> bitmatch -> select -> k400) on
    synthesized stand-ins, as a CLI subprocess on the CPU backend."""
    out = subprocess.run(
        [sys.executable, "tools/validate_real_assets.py", "--dry_run",
         "--out", str(tmp_path / "dry"), "--num_frames", "4",
         "--chunk", "8", "--log_every", "0"],
        env=conftest.cpu_subprocess_env(), cwd=conftest.REPO_ROOT,
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    report = json.load(open(tmp_path / "dry" / "validation_report.json"))
    for stage in ("convert", "score_msvd", "bitmatch", "select",
                  "score_k400", "k400"):
        assert report[stage]["status"] == "ok", (stage, report[stage])
    assert report["bitmatch_comparator_negative_check"] == "ok"
    assert report["bitmatch"]["videos_pass"] == report["bitmatch"][
        "videos_compared"]
