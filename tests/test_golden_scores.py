"""Committed golden score regression (VERDICT r2 missing #3).

The reference pins its scoring numerics with a committed artifact
(/root/reference/loss_values/loss_msvd_4_3_30.json); bit-matching it needs
the published SVT checkpoint + MSVD videos, absent from this image. This is
the repo-generated equivalent: f32-HIGHEST FrameScorer losses over fully
deterministic inputs (numpy-seeded params + synthetic video), committed at
tests/golden/scores_f32.json. A numerics change that shifts scores now
fails CI without needing the torch oracle; regenerate deliberately with
``python tools/gen_golden_scores.py --write`` and let the diff document
the drift.
"""

import json
import os
import sys

import numpy as np

import conftest  # noqa: F401

sys.path.insert(0, os.path.join(conftest.REPO_ROOT, "tools"))

from gen_golden_scores import GOLDEN_PATH, compute_golden  # noqa: E402


def test_scores_match_committed_golden():
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    got = compute_golden()
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5, rtol=1e-5,
                                   err_msg=f"geometry {k} drifted")
