"""Validation of the fast scoring modes (teacher stride / subsample /
score stride) against exact scoring.

The full-size (ViT-B @224) run lives in tools/validate_fast_scoring.py and
is executed on the TPU; these tests pin the same properties at test scale
(vit_tiny @32) plus the model-free interpolation check on the committed
reference loss curves (ref: loss_values/loss_msvd_4_3_30.json).
"""

import json
import os

import numpy as np
import pytest

from dino_video_summarization_transformer_tpu.data.selection import (
    adaptive_indices)
from dino_video_summarization_transformer_tpu.data.windows import (
    window_indices)
from dino_video_summarization_transformer_tpu.engine.scoring import (
    FrameScorer, _catmull_rom_rows, _interp_rows, _lerp_rows)

REF_LOSS_JSON = "/root/reference/loss_values/loss_msvd_4_3_30.json"


def _spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


@pytest.fixture(scope="module")
def tiny_setup():
    import jax

    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_tiny_config)
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    cfg = vit_tiny_config(num_frames=8, num_classes=0, img_size=32)
    params = init_timesformer(jax.random.key(0), cfg)
    T = 100
    vid = make_video(0, T, 32)
    loc, glob, eff = window_indices(T, 3, 30)

    def scorer(**kw):
        kw.setdefault("compute_dtype", np.float32)
        return FrameScorer(params, cfg, chunk=8, precision=None, **kw)

    exact = scorer().score_video(vid, loc, glob, eff)
    return scorer, vid, loc, glob, eff, exact


def test_strided_path_is_exact_at_stride_one(tiny_setup):
    scorer, vid, loc, glob, eff, exact = tiny_setup
    sc = scorer()
    strided = sc._score_video_strided_async(vid, loc, glob, eff).fetch()
    np.testing.assert_array_equal(exact, strided)


def test_uint8_wire_matches_prenormalized_float(tiny_setup):
    """The in-kernel uint8 normalize must equal host normalization."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    mean = np.array([0.45, 0.45, 0.45], np.float32)
    std = np.array([0.225, 0.225, 0.225], np.float32)
    vf = ((vid.astype(np.float32) / 255.0) - mean) / std
    out = scorer().score_video(vf, loc, glob, eff)
    np.testing.assert_allclose(exact, out, rtol=2e-5, atol=2e-6)


def test_turbo_mode_quality(tiny_setup):
    """turbo (teacher stride 4 with feature interpolation, exact teacher
    geometry): Spearman >= 0.99 vs exact, and score error at or below the
    bf16 quantization noise floor the production 'exact' mode carries
    (the validation bar; see tools/validate_fast_scoring.py docstring and
    BENCH.md)."""
    import jax.numpy as jnp

    scorer, vid, loc, glob, eff, exact = tiny_setup
    fast = scorer(teacher_stride=4).score_video(vid, loc, glob, eff)
    assert _spearman(exact, fast) >= 0.99
    turbo_relerr = np.abs(fast - exact).mean() / exact.mean()
    bf16 = scorer(compute_dtype=jnp.bfloat16).score_video(vid, loc, glob, eff)
    bf16_relerr = np.abs(bf16 - exact).mean() / exact.mean()
    assert turbo_relerr <= bf16_relerr, (turbo_relerr, bf16_relerr)


def test_teacher_stride_monotonic_degradation(tiny_setup):
    """Larger teacher strides should not IMPROVE fidelity (sanity check
    that the knob actually approximates)."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    errs = []
    for k in (2, 8):
        fast = scorer(teacher_stride=k).score_video(vid, loc, glob, eff)
        errs.append(np.abs(fast - exact).mean())
    assert errs[0] <= errs[1] + 1e-9


def test_long_video_eviction_path(tiny_setup):
    """Videos beyond the resident-piece budget stream with eviction and
    must score identically to the resident path."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    import dino_video_summarization_transformer_tpu.engine.scoring as S

    sc = scorer(global_subsample=4, teacher_stride=4, piece=16)
    res = sc.score_video(vid, loc, glob, eff)
    old = S.MAX_RESIDENT_PIECES
    S.MAX_RESIDENT_PIECES = 2  # force the streaming/eviction path
    try:
        sc2 = scorer(global_subsample=4, teacher_stride=4, piece=16)
        streamed = sc2.score_video(vid, loc, glob, eff)
    finally:
        S.MAX_RESIDENT_PIECES = old
    np.testing.assert_allclose(res, streamed, rtol=1e-5, atol=1e-7)


def test_lerp_rows():
    xp = np.array([0, 4, 10])
    rows = np.array([[0.0, 10.0], [4.0, 6.0], [10.0, 0.0]], np.float32)
    out = _lerp_rows(xp, rows, np.array([0, 2, 4, 7, 10]))
    np.testing.assert_allclose(out[:, 0], [0, 2, 4, 7, 10])
    np.testing.assert_allclose(out[0], rows[0])
    np.testing.assert_allclose(out[-1], rows[-1])
    single = _lerp_rows(np.array([5]), rows[:1], np.array([0, 9]))
    np.testing.assert_allclose(single, np.repeat(rows[:1], 2, 0))


def test_catmull_rom_rows():
    rng = np.random.RandomState(0)
    xp = np.array([0, 4, 8, 12, 15])
    rows = rng.randn(5, 7).astype(np.float32)
    # passes through every knot
    np.testing.assert_allclose(_catmull_rom_rows(xp, rows, xp), rows,
                               atol=1e-5)
    # beats linear on smooth (curved) feature trajectories — the regime
    # teacher CLS features live in (BENCH.md: 29/30-frame window overlap)
    x_dense = np.arange(16)
    f = lambda x: np.stack([np.sin(x / 5.0), (x / 15.0) ** 2,
                            np.cos(x / 7.0)], 1)
    truth = f(x_dense.astype(np.float64))
    e_cr = np.abs(_catmull_rom_rows(xp, f(xp.astype(np.float64)), x_dense)
                  - truth).max()
    e_li = np.abs(_lerp_rows(xp, f(xp.astype(np.float64)), x_dense)
                  - truth).max()
    assert e_cr < 0.35 * e_li, (e_cr, e_li)
    # <3 knots falls back to linear; device path matches host path
    two = _interp_rows(np.array([0, 9]), rows[:2], np.array([0, 3, 9]),
                       "catmullrom")
    np.testing.assert_allclose(
        two, _lerp_rows(np.array([0, 9]), rows[:2], np.array([0, 3, 9])))
    import jax.numpy as jnp

    dev = _catmull_rom_rows(xp, jnp.asarray(rows), x_dense)
    np.testing.assert_allclose(np.asarray(dev),
                               _catmull_rom_rows(xp, rows, x_dense),
                               atol=1e-5)


def test_teacher_interp_catmullrom_close_to_dense_teacher(tiny_setup):
    """k=4+catmullrom must track exact scores at least as well as
    k=4+linear on the synthetic validator video (the full-size claim is
    measured by tools/validate_fast_scoring.py on the TPU)."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    li = scorer(teacher_stride=4).score_video(vid, loc, glob, eff)
    cr = scorer(teacher_stride=4,
                teacher_interp="catmullrom").score_video(vid, loc, glob, eff)
    err_li = np.abs(li - exact).mean() / np.abs(exact).mean()
    err_cr = np.abs(cr - exact).mean() / np.abs(exact).mean()
    assert err_cr <= err_li * 1.25, (err_cr, err_li)
    assert _spearman(cr, exact) > 0.9


@pytest.mark.skipif(not os.path.exists(REF_LOSS_JSON),
                    reason="reference loss JSON not present")
def test_score_stride_interpolation_on_reference_losses():
    """score_stride quality, measured on REAL loss curves (the committed
    MSVD scores): documents why m > 1 is NOT the default — exact-index
    selection agreement drops to ~0.73 (m=2) / ~0.56 (m=4); within a
    +/-2-presampled-frame tolerance it stays >= 0.94. These bounds are the
    ones published in BENCH.md."""
    data = json.load(open(REF_LOSS_JSON))
    rate, N = 4, 16
    stats = {}
    for m in (2, 4):
        agree = agree2 = tot = 0
        for losses in list(data.values()):
            losses = np.asarray(losses, float)
            T = len(losses)
            if T < 2 * m or not np.isfinite(losses).all() or losses.sum() <= 0:
                continue
            pos = np.arange(0, T, m)
            if pos[-1] != T - 1:
                pos = np.append(pos, T - 1)
            fast = np.interp(np.arange(T), pos, losses[pos])
            ie, _ = adaptive_indices(losses, N, rate, T, T * rate)
            ifa, _ = adaptive_indices(fast, N, rate, T, T * rate)
            agree += len(set(ie) & set(ifa))
            agree2 += sum(any(abs(i - j) <= 2 * rate for j in ifa) for i in ie)
            tot += len(ie)
        stats[m] = (agree / tot, agree2 / tot)
    assert stats[2][0] >= 0.65, stats
    assert stats[4][0] >= 0.50, stats
    assert stats[2][1] >= 0.97, stats
    assert stats[4][1] >= 0.94, stats


def test_teacher_positions_motion_adaptive(tiny_setup):
    """teacher_adaptive: the coarse stride grid is bisected exactly in the
    high-motion intervals (and nowhere else); alpha=0 reproduces the
    uniform grid."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    T = vid.shape[0]
    pos = np.arange(T)

    # crafted video: static everywhere except frames 40..56 (bright moving
    # block) -> only the intervals covering 40..56 should refine
    v = np.full((T, 32, 32, 3), 30, np.uint8)
    for t in range(40, 56):
        x = (t - 40) * 2
        v[t, 8:24, x:x + 6] = 220

    sc_uniform = scorer(teacher_stride=8)
    sc_adapt = scorer(teacher_stride=8, teacher_adaptive=1.0)
    tp_u = sc_uniform._teacher_positions(pos, v)
    tp_a = sc_adapt._teacher_positions(pos, v)

    np.testing.assert_array_equal(
        tp_u, np.append(np.arange(0, T, 8), T - 1))
    assert np.array_equal(np.unique(tp_a), tp_a)  # sorted unique
    assert tp_a[0] == 0 and tp_a[-1] == T - 1
    added = sorted(set(tp_a) - set(tp_u))
    assert added, "high-motion intervals must refine"
    # every added midpoint sits inside (or adjacent to) the motion burst;
    # the burst spans frames 40..56 -> intervals [40,48) [48,56) refine,
    # and [32,40)/[56,64) may catch the burst edges
    assert all(32 <= a <= 64 for a in added), added
    # static intervals never refine
    assert not any(a < 32 or a > 64 for a in added)


def test_adaptive_refine_beats_pure_stride(tiny_setup):
    """On an event-structured video, adaptive k=8 must be at least as
    faithful as uniform k=8 (it only ADDS teacher knots), at a teacher
    cost between k=8 and k=4."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    T = vid.shape[0]
    pos = np.arange(T)

    sc8 = scorer(teacher_stride=8, teacher_interp="catmullrom")
    sca = scorer(teacher_stride=8, teacher_interp="catmullrom",
                 teacher_adaptive=1.0)
    out8 = sc8.score_video(vid, loc, glob, eff)
    outa = sca.score_video(vid, loc, glob, eff)
    err8 = np.abs(out8 - exact).mean() / exact.mean()
    erra = np.abs(outa - exact).mean() / exact.mean()
    assert erra <= err8 * 1.02, (erra, err8)

    n8 = len(sc8._teacher_positions(pos, vid))
    na = len(sca._teacher_positions(pos, vid))
    n4 = len(scorer(teacher_stride=4)._teacher_positions(pos, vid))
    assert n8 < na <= n4 + 1, (n8, na, n4)


def test_adaptive_group_matches_per_video(tiny_setup):
    """Cross-video group scoring with adaptive teacher positions must be
    loss-identical to the per-video strided path."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    scorer, vid, loc, glob, eff, exact = tiny_setup
    sc = scorer(teacher_stride=8, teacher_adaptive=1.0)
    vids = [vid, make_video(3, vid.shape[0], 32)]
    items = [dict(frames=v, local_idx=loc, global_idx=glob,
                  eff_global=eff, dummy=False, path=f"v{i}",
                  local_size=3, num_frames=v.shape[0])
             for i, v in enumerate(vids)]
    grouped = [h.fetch() for h in sc.score_group_async(items)]
    solo = [sc.score_video(v, loc, glob, eff) for v in vids]
    for g, s in zip(grouped, solo):
        np.testing.assert_allclose(g, s, rtol=1e-6, atol=1e-7)


def test_teacher_target_probs_exact_at_knots(tiny_setup):
    """teacher_target="probs" softmaxes at the knots and interpolates the
    probability vectors; AT the knot positions the loss must match exact
    scoring (the softmax-then-CE path is identical there)."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    sc = scorer(teacher_stride=4, teacher_target="probs")
    out = sc.score_video(vid, loc, glob, eff)
    knots = sc._teacher_positions(
        np.arange(vid.shape[0]), vid).astype(int)
    np.testing.assert_allclose(out[knots], exact[knots], rtol=1e-5,
                               atol=1e-7)
    assert _spearman(exact, out) >= 0.95


def test_teacher_target_probs_is_loss_interpolation(tiny_setup):
    """The scoring loss is LINEAR in the teacher probabilities, so
    prob-target linear interpolation must equal interpolating the losses
    the student would incur against each knot teacher — checked by hand
    from the knot teacher distributions."""
    import jax
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.models import (
        timesformer as tsf, vit_tiny_config)

    scorer, vid, loc, glob, eff, exact = tiny_setup
    k = 4
    sc = scorer(teacher_stride=k, teacher_target="probs")
    out = sc.score_video(vid, loc, glob, eff)

    cfg = sc.model_cfg
    mean = np.array([0.45] * 3, np.float32)
    std = np.array([0.225] * 3, np.float32)
    vf = ((vid.astype(np.float32) / 255.0) - mean) / std

    def cls(frame_idx_rows):
        wins = np.stack([vf[r] for r in frame_idx_rows]).transpose(
            0, 4, 1, 2, 3)
        return np.asarray(tsf.forward(sc.params, jnp.asarray(wins), cfg,
                                      compute_dtype=jnp.float32))

    # mid position between the first two knots
    i = k // 2
    t_a = cls([glob[0]])[0]
    t_b = cls([glob[k]])[0]
    s_i = cls([loc[i][: sc.local_size]])[0]
    logp = jax.nn.log_softmax(jnp.asarray(s_i) / sc.student_temp)
    losses = [-float(jnp.sum(
        jax.nn.softmax(jnp.asarray(t) / sc.teacher_temp) * logp))
        for t in (t_a, t_b)]
    w = i / k
    expect = (1 - w) * losses[0] + w * losses[1]
    np.testing.assert_allclose(out[i], expect, rtol=1e-4)


def test_teacher_target_probs_group_matches_per_video(tiny_setup):
    """Cross-video group scoring must be loss-identical to per-video with
    the probs teacher target (the extra rows carry probabilities)."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    scorer, vid, loc, glob, eff, exact = tiny_setup
    sc = scorer(teacher_stride=8, teacher_interp="catmullrom",
                teacher_target="probs")
    vids = [vid, make_video(5, vid.shape[0], 32)]
    items = [dict(frames=v, local_idx=loc, global_idx=glob,
                  eff_global=eff, dummy=False, path=f"v{i}",
                  local_size=3, num_frames=v.shape[0])
             for i, v in enumerate(vids)]
    grouped = [h.fetch() for h in sc.score_group_async(items)]
    solo = [sc.score_video(v, loc, glob, eff) for v in vids]
    for g, s in zip(grouped, solo):
        np.testing.assert_allclose(g, s, rtol=1e-6, atol=1e-7)


def test_teacher_refine_inf_is_plain_stride(tiny_setup):
    """An unreachable LOO threshold must leave the stride path bit-equal
    to plain strided scoring (refinement adds no knots)."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    plain = scorer(teacher_stride=8, teacher_interp="catmullrom")
    ref = scorer(teacher_stride=8, teacher_interp="catmullrom",
                 teacher_refine=1e9)
    np.testing.assert_array_equal(
        plain.score_video(vid, loc, glob, eff),
        ref.score_video(vid, loc, glob, eff))
    # no refinement rows were paid
    assert ref.stats["teacher_rows"] == plain.stats["teacher_rows"]


def test_teacher_refine_improves_stride8(tiny_setup):
    """A reachable threshold must add teacher knots and not degrade
    fidelity vs the unrefined stride (it only ADDS exact knots)."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    plain_sc = scorer(teacher_stride=8, teacher_interp="catmullrom")
    plain = plain_sc.score_video(vid, loc, glob, eff)
    ref_sc = scorer(teacher_stride=8, teacher_interp="catmullrom",
                    teacher_refine=1e-9)
    ref = ref_sc.score_video(vid, loc, glob, eff)
    assert ref_sc.stats["teacher_rows"] > plain_sc.stats["teacher_rows"]
    e_plain = np.abs(plain - exact).mean()
    e_ref = np.abs(ref - exact).mean()
    assert e_ref <= e_plain * 1.05, (e_ref, e_plain)


def test_teacher_refine_group_matches_per_video(tiny_setup):
    """Group refinement (shared LOO readback + shared refinement chunks)
    must be loss-identical to the per-video refinement path."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    scorer, vid, loc, glob, eff, exact = tiny_setup
    sc = scorer(teacher_stride=8, teacher_interp="catmullrom",
                teacher_refine=0.02)
    vids = [vid, make_video(9, vid.shape[0], 32)]
    items = [dict(frames=v, local_idx=loc, global_idx=glob,
                  eff_global=eff, dummy=False, path=f"v{i}")
             for i, v in enumerate(vids)]
    grouped = [h.fetch() for h in sc.score_group_async(items)]
    solo = [sc.score_video(v, loc, glob, eff) for v in vids]
    for g, s in zip(grouped, solo):
        np.testing.assert_allclose(g, s, rtol=1e-6, atol=1e-7)


def test_student_dispatch_batching_bit_equal(tiny_setup):
    """student_dispatch > 1 fuses several chunks into one device dispatch
    via lax.scan — the scan body is the single-chunk computation on the
    same rows, so both per-video and group scoring must be bit-equal to
    the unbatched path (incl. the ragged tail: the clamp keeps short
    inputs at sub=1, longer ones pad the final super-chunk with discarded
    rows)."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    kw = dict(teacher_stride=8, teacher_interp="catmullrom")
    a = scorer(student_dispatch=1, **kw).score_video(vid, loc, glob, eff)
    sc4 = scorer(student_dispatch=4, **kw)
    b = sc4.score_video(vid, loc, glob, eff)
    np.testing.assert_array_equal(a, b)
    # clamp: 100 rows at chunk 8 -> ceil = 13 chunks >= 4, so sub really 4
    assert sc4._student_sub(100) == 4
    assert sc4._student_sub(9) == 2  # short input degrades, no padding

    items = [dict(frames=vid, local_idx=loc, global_idx=glob,
                  eff_global=eff, dummy=False, path=f"v{i}")
             for i in range(2)]
    g1 = [h.fetch()
          for h in scorer(student_dispatch=1, **kw).score_group_async(items)]
    g4 = [h.fetch() for h in sc4.score_group_async(items)]
    for x, y in zip(g1, g4):
        np.testing.assert_array_equal(x, y)


def test_guarded_score_stride_on_reference_losses():
    """Error-adaptive SCORE stride (the score-side analogue of
    teacher_refine: LOO error at scored knots, bisect failing intervals)
    measured on the committed REAL loss curves — the negative result that
    keeps per-frame students the default. The loss curve carries
    frame-rate noise that IS signal for CDF selection, so the guard
    refines nearly everything at tight alphas (m=2 alpha=0.05 scores ~96%
    of frames) and only reaches meaningful savings (~18% at alpha=0.2)
    right at the bf16-noise-floor agreement boundary (~0.87 vs the ~0.90
    proxy). No mode ships from this lever; the bound is pinned here so a
    future smoother scoring loss can revisit it."""
    data = json.load(open(REF_LOSS_JSON))
    rate, N, m, alpha = 4, 16, 2, 0.2

    agree = tot = 0
    scored = total = 0
    floor_agree = floor_tot = 0
    rng = np.random.RandomState(0)
    for losses in data.values():
        losses = np.asarray(losses, float)
        T = len(losses)
        if T < 8 or not np.isfinite(losses).all() or losses.sum() <= 0:
            continue
        pos = np.arange(0, T, m)
        if pos[-1] != T - 1:
            pos = np.append(pos, T - 1)
        lv = losses[pos]
        scale = np.abs(lv).mean() + 1e-12
        if len(pos) >= 3:
            w = (pos[1:-1] - pos[:-2]) / np.maximum(pos[2:] - pos[:-2], 1)
            lhat = lv[:-2] * (1 - w) + lv[2:] * w
            err = np.abs(lv[1:-1] - lhat) / scale
            mids = set()
            for i in np.nonzero(err > alpha)[0]:
                for a, b in ((i, i + 1), (i + 1, i + 2)):
                    if pos[b] - pos[a] >= 2:
                        mids.add((pos[a] + pos[b]) // 2)
            mids -= set(pos.tolist())
            if mids:
                pos = np.unique(np.concatenate(
                    [pos, np.asarray(sorted(mids), pos.dtype)]))
        fast = np.interp(np.arange(T), pos, losses[pos])
        ie, _ = adaptive_indices(losses, N, rate, T, T * rate)
        ifa, _ = adaptive_indices(fast, N, rate, T, T * rate)
        agree += len(set(ie) & set(ifa))
        tot += len(ie)
        scored += len(pos)
        total += T
        # bf16-floor proxy: exact losses + 4% relative noise
        noisy = np.maximum(losses * (1 + 0.04 * rng.randn(T)), 1e-9)
        ino, _ = adaptive_indices(noisy, N, rate, T, T * rate)
        floor_agree += len(set(ie) & set(ino))
        floor_tot += len(ie)

    agree_frac = agree / tot
    scored_frac = scored / total
    floor = floor_agree / floor_tot
    # the pinned bounds (measured: agree 0.869, scored 0.816, floor 0.896)
    assert 0.83 <= agree_frac <= 0.91, agree_frac
    assert 0.78 <= scored_frac <= 0.86, scored_frac
    assert agree_frac < floor, (agree_frac, floor)


def test_score_refine_inf_is_plain_stride(tiny_setup):
    """score_refine with an unreachable alpha == unguarded score_stride
    (same knots, same interpolation, zero extra rows)."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    plain = scorer(teacher_stride=4, score_stride=2)
    got_plain = plain.score_video(vid, loc, glob, eff)
    guarded = scorer(teacher_stride=4, score_stride=2, score_refine=1e9)
    got = guarded.score_video(vid, loc, glob, eff)
    np.testing.assert_allclose(got, got_plain, rtol=1e-6)
    assert guarded.stats["student_rows"] == plain.stats["student_rows"]


def test_score_refine_adds_rows_and_improves(tiny_setup):
    """A tight alpha refines measurably non-interpolable intervals: more
    student rows than unguarded m=4, and at least as close to exact."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    plain = scorer(teacher_stride=4, score_stride=4)
    got_plain = plain.score_video(vid, loc, glob, eff)
    guarded = scorer(teacher_stride=4, score_stride=4, score_refine=0.05)
    got = guarded.score_video(vid, loc, glob, eff)
    assert np.isfinite(got).all()
    assert guarded.stats["student_rows"] > plain.stats["student_rows"]
    err_plain = np.abs(got_plain - exact).mean()
    err_guard = np.abs(got - exact).mean()
    assert err_guard <= err_plain + 1e-9, (err_guard, err_plain)
    # scored knots keep their measured values: the refinement only adds
    # positions, never perturbs existing ones
    pos = np.arange(0, len(exact), 4)
    np.testing.assert_allclose(got[pos][:3], got_plain[pos][:3], rtol=1e-6)


def test_score_refine_group_matches_per_video(tiny_setup):
    """The cross-video group path of the guarded score stride == the
    per-video path (shared refinement chunks, same math)."""
    from dino_video_summarization_transformer_tpu.utils.synthetic import (
        make_video)

    scorer, vid, loc, glob, eff, exact = tiny_setup
    sc = scorer(teacher_stride=4, score_stride=2, score_refine=0.05)
    vids = [vid, make_video(7, 100, 32)]
    singles = [sc.score_video(v, loc, glob, eff) for v in vids]
    items = [dict(frames=v, local_idx=loc, global_idx=glob,
                  eff_global=eff, dummy=False, path=f"v{i}.avi")
             for i, v in enumerate(vids)]
    handles = sc.score_group_async(items)
    for h, want in zip(handles, singles):
        np.testing.assert_allclose(h.fetch(), want, rtol=2e-5, atol=1e-6)


def test_score_refine_bailout_scores_dense(tiny_setup):
    """Rows-fraction bailout (ScorerConfig.score_bail, VERDICT r4 weak-#3):
    when the guard flags nearly every interval (noise-like loss curves),
    the scorer abandons the stride and scores every unscored frame — same
    values at shared rows as the scattered no-bail path, full coverage,
    contiguous chunk geometry."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    T = len(exact)
    # alpha ~0 flags every interior knot -> both variants score all frames
    bail = scorer(teacher_stride=4, score_stride=2, score_refine=1e-9,
                  score_bail=0.9)
    got_bail = bail.score_video(vid, loc, glob, eff)
    assert bail.stats["student_rows"] == T  # dense: every frame scored
    no_bail = scorer(teacher_stride=4, score_stride=2, score_refine=1e-9,
                     score_bail=0.0)
    got_scatter = no_bail.score_video(vid, loc, glob, eff)
    np.testing.assert_allclose(got_bail, got_scatter, rtol=2e-5, atol=1e-7)


def test_score_refine_bailout_off_below_threshold(tiny_setup):
    """A loose alpha that refines only a few intervals stays on the
    stride path: rows well under the bail fraction, knots untouched."""
    scorer, vid, loc, glob, eff, exact = tiny_setup
    T = len(exact)
    sc = scorer(teacher_stride=4, score_stride=2, score_refine=1e9,
                score_bail=0.9)
    sc.score_video(vid, loc, glob, eff)
    assert sc.stats["student_rows"] < 0.9 * T
