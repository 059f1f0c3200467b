#!/usr/bin/env python
"""Quality validation for the fast scoring modes (teacher subsample /
teacher stride / score stride) against exact scoring.

Two complementary checks:

1. Model-based (runs the real scorer, default ViT-B @224 on the TPU):
   a synthetic corpus spanning two signal regimes — event-structured videos
   (sparse bright moving blocks on smooth drift: loss dominated by real
   "surprise" events, like cuts/action in natural video) and smooth-drift
   videos (no events: loss is low-amplitude and noise-like, the worst case
   for any approximation). For every mode in the grid: Spearman rank
   correlation of the per-frame scores and adaptive-selection index
   agreement (N=16, pre-sampling rate 4 — the reference's evaluation
   geometry, ref: timesformer_evaluation.py:48-56) vs exact mode.

2. Data-based (no model, uses the committed reference scores
   /root/reference/loss_values/loss_msvd_4_3_30.json): the score_stride
   interpolation applied to REAL loss curves from the published MSVD run,
   measuring selection agreement across ~2k videos. This isolates the
   loss-interpolation approximation with production loss statistics.

Output: a JSON report + a printed table. BENCH.md's quality table is
generated from this tool.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_LOSS_JSON = "/root/reference/loss_values/loss_msvd_4_3_30.json"

# LOO-error threshold for the error-adaptive refinement rows; calibrated
# against the measured LOO distributions (tools/loo_probe output in
# BENCH.md): production-arch smooth curves sit well below, feature-noisy
# validators well above, so refinement concentrates where it pays
EREF_ALPHA = 0.035

# LOO-error threshold for the GUARDED score-stride (ScorerConfig.
# score_refine) — calibrated on the committed reference MSVD loss curves
# (run_reference_json_validation "guarded" rows): at m=2, alpha=0.2 lands
# selection agreement 0.858 == the 6%-relative bf16 noise floor (0.846)
# at 0.82 student rows/frame; unguarded m=2 sits at 0.706. Real loss
# curves are noise-dominated at frame granularity, so deeper savings at
# floor quality do not exist on this data — the guard's value is turning
# an invalid mode into a floor-quality one, not a large speedup.
SREF_ALPHA = 0.2

MODE_GRID = {
    "k2": dict(teacher_stride=2),
    "turbo(k4)": dict(teacher_stride=4),
    "k8": dict(teacher_stride=8),
    "k8+cr": dict(teacher_stride=8, teacher_interp="catmullrom"),
    # motion-adaptive refinement: bisect high-motion stride intervals
    # (ScorerConfig.teacher_adaptive; alpha=1.0 = intervals above the
    # video's mean interval motion)
    "k8+cr+adapt": dict(teacher_stride=8, teacher_interp="catmullrom",
                        teacher_adaptive=1.0),
    # error-adaptive refinement: bisect stride intervals around knots
    # whose measured feature-space LOO interpolation error exceeds alpha
    # (ScorerConfig.teacher_refine) — the direct measurement the motion
    # proxy approximates
    "k8+cr+eref": dict(teacher_stride=8, teacher_interp="catmullrom",
                       teacher_refine=EREF_ALPHA),
    # prob-target interpolation: softmax at the teacher knots, interpolate
    # the probability vectors (the loss is linear in them — exactly
    # interpolating the per-knot losses; ScorerConfig.teacher_target)
    "k4+pt": dict(teacher_stride=4, teacher_target="probs"),
    "k8+pt": dict(teacher_stride=8, teacher_target="probs"),
    "k8+cr+pt": dict(teacher_stride=8, teacher_interp="catmullrom",
                     teacher_target="probs"),
    "s4 (round-1 'fast')": dict(global_subsample=4),
    # dilation-2 window subsample (teacher sees 15 frames spanning the
    # same 30-frame horizon): halves the remaining teacher FLOPs of the
    # guarded stride-8 default if it validates where s4 failed
    "s2": dict(global_subsample=2),
    "s2+k8+cr+eref": dict(global_subsample=2, teacher_stride=8,
                          teacher_interp="catmullrom",
                          teacher_refine=EREF_ALPHA),
    # banded one-pass scoring (r5, models/banded.py): "band-t" replaces
    # only the teacher with the banded per-frame pass (exact windowed
    # students); "band" runs both passes banded (~2 frame-units/frame)
    "band-t": dict(band_mode="teacher"),
    "band": dict(band_mode="both"),
    "turbo-max(k4m4)": dict(teacher_stride=4, score_stride=4),
    # guarded score-stride (r4): LOO-bisect the loss curve where measured
    # interpolation error exceeds SREF_ALPHA (ScorerConfig.score_refine)
    "m2": dict(teacher_stride=4, score_stride=2),
    "m2+sref": dict(teacher_stride=4, score_stride=2,
                    score_refine=SREF_ALPHA),
    "m4+sref": dict(teacher_stride=4, score_stride=4,
                    score_refine=SREF_ALPHA),
    # low-resolution teacher: global windows bilinearly resized on device;
    # scaled below the validator's own image size by the 224-ratio
    "t-lowres": "teacher_lowres",
    "t-lowres+k4": "teacher_lowres_k4",
}


from dino_video_summarization_transformer_tpu.utils.synthetic import (  # noqa: E402
    make_video)


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom) if denom else 1.0


def selection_agreement(exact, approx, N: int, rate: int, T: int,
                        tol_presampled: int = 0) -> float:
    from dino_video_summarization_transformer_tpu.data.selection import (
        adaptive_indices)

    ei, _ = adaptive_indices(exact, N, rate, T, T * rate)
    ai, _ = adaptive_indices(approx, N, rate, T, T * rate)
    if tol_presampled == 0:
        return len(set(ei) & set(ai)) / len(ei)
    hits = sum(any(abs(i - j) <= tol_presampled * rate for j in ai) for i in ei)
    return hits / len(ei)


# a validator teacher is LIVE when its softmax distribution varies across
# window positions by at least this much (max per-dim std, probability
# units) — a constant distribution scores every frame identically and
# teacher-side approximations measure exactly 0 error (vacuous validation)
LIVE_POS_STD = 1e-3


def teacher_saturation(params, cfg, video, glob, sample_positions,
                       temp: float = 0.02):
    """Diagnostic: does the teacher softmax CARRY A SIGNAL across window
    positions? A random-init ViT-B@224 saturates to a CONSTANT one-hot
    (max prob 1.0) at teacher_temp=0.02 — teacher-side approximations then
    measure exactly 0 error and the validation is vacuous. The liveness
    metric is ``pos_std``: the largest per-dim std of the softmax probs
    across sampled positions (argmax-based metrics are useless here —
    temperature rescaling can soften a one-hot but can NEVER change the
    argmax, so a distinct-argmax criterion can't be rescued by the temp
    escalation below)."""
    import jax
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.models import timesformer as tsf

    mean = np.array([0.45] * 3, np.float32)
    std = np.array([0.225] * 3, np.float32)
    vf = ((video.astype(np.float32) / 255) - mean) / std
    wins = np.stack([vf[glob[i]] for i in sample_positions]).transpose(0, 4, 1, 2, 3)
    f = jax.jit(lambda p, x: tsf.forward(p, x, cfg, compute_dtype=jnp.float32))
    t = np.asarray(f(params, jnp.asarray(wins)))
    p = np.asarray(jax.nn.softmax(jnp.asarray(t) / temp, axis=-1))
    return {"max_prob": float(p.max(-1).mean()),
            "distinct_argmax": int(len(np.unique(p.argmax(-1)))),
            "pos_std": float(p.std(axis=0).max()),
            "live": bool(p.std(axis=0).max() >= LIVE_POS_STD)}


def run_model_validation(arch: str, n_videos: int, T: int, img: int,
                         chunk: int, modes=None):
    """Model-based grid, with the bf16-quantization baseline.

    The decisive context row is ``bf16-exact vs f32-exact``: the production
    "exact" mode runs bfloat16, whose rounding already perturbs per-frame
    scores by ~3-6% relative — the CDF-argmin selection is chaotic at that
    level, so an approximation is acceptable when its score error is at or
    below the bf16 noise floor everyone already accepts. turbo (teacher
    stride 4 with feature interpolation, exact 30-frame teacher geometry)
    measures BELOW that floor on every live validator config.
    """
    import jax
    import jax.numpy as jnp

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_base_config, vit_small_config, vit_tiny_config)

    cfg_fn = {"vit_base": vit_base_config, "vit_small": vit_small_config,
              "vit_tiny": vit_tiny_config}[arch]
    cfg = cfg_fn(num_frames=8, num_classes=0, img_size=img)
    params = init_timesformer(jax.random.key(0), cfg)
    loc, glob, eff = window_indices(T, 3, 30)

    videos = [make_video(s, T, img) for s in range(n_videos)]

    # De-saturate rather than exclude (r2 weak #2): a random-init teacher
    # can collapse to a constant one-hot at the production temp (0.02),
    # making every teacher-side approximation measure exactly zero error.
    # Raise THIS VALIDATOR's teacher temp until the softmax varies across
    # positions (pos_std >= LIVE_POS_STD) and record the temp used —
    # approximation error is measured at a live operating point instead of
    # the config being dropped from the worst-case aggregation.
    sample_pos = list(range(0, T, max(1, T // 8)))
    t_temp = 0.02
    sat = teacher_saturation(params, cfg, videos[0], glob, sample_pos,
                             temp=t_temp)
    while not sat["live"] and t_temp < 0.3:
        t_temp *= 2.0
        sat = teacher_saturation(params, cfg, videos[0], glob, sample_pos,
                                 temp=t_temp)
    report = {"saturation": sat, "teacher_temp": t_temp}
    print(f"[{arch}@{img}] saturation: {sat} (teacher_temp {t_temp})",
          flush=True)

    exact_scorer = FrameScorer(params, cfg, chunk=chunk, teacher_temp=t_temp,
                               compute_dtype=np.float32, precision=None)
    exact = []
    for i, v in enumerate(videos):
        exact.append(exact_scorer.score_video(v, loc, glob, eff))
        print(f"exact {i + 1}/{len(videos)}", flush=True)

    def measure(name, sc):
        sp, ag, ag1, re = [], [], [], []
        sc.stats["teacher_rows"] = 0
        sc.stats["student_rows"] = 0
        for ex, v in zip(exact, videos):
            fs = sc.score_video(v, loc, glob, eff)
            sp.append(spearman(ex, fs))
            re.append(float(np.abs(fs - ex).mean() / ex.mean()))
            ag.append(selection_agreement(ex, fs, 16, 4, T))
            ag1.append(selection_agreement(ex, fs, 16, 4, T, 1))
        # teacher/student cost actually paid (the adaptive modes are
        # data-dependent): fraction of the exact mode's one-row-per-frame
        t_cost = sc.stats["teacher_rows"] / float(T * len(videos))
        s_cost = sc.stats["student_rows"] / float(T * len(videos))
        report[name] = {
            "spearman_mean": float(np.mean(sp)),
            "spearman_min": float(np.min(sp)),
            "rel_err_mean": float(np.mean(re)),
            "rel_err_max": float(np.max(re)),
            "selection_agree_exact": float(np.mean(ag)),
            "selection_agree_tol1": float(np.mean(ag1)),
            "teacher_rows_frac": round(t_cost, 4),
            "student_rows_frac": round(s_cost, 4),
        }
        print(f"{name}: spearman {np.mean(sp):.4f} (min {np.min(sp):.4f}), "
              f"relerr {np.mean(re):.4f}, sel-agree {np.mean(ag):.3f} "
              f"(tol1 {np.mean(ag1):.3f}), t-rows {t_cost:.3f}, "
              f"s-rows {s_cost:.3f}", flush=True)

    # quantization noise floor: the accepted production numerics (on TPU
    # this row takes the fused Pallas path via use_pallas="auto", so it
    # also covers the fused kernels' max-free softmax / tanh-GELU deltas)
    measure("bf16-exact (noise floor)",
            FrameScorer(params, cfg, chunk=chunk, teacher_temp=t_temp,
                        compute_dtype=jnp.bfloat16, precision=None))
    # teacher_img scales with the validator resolution (160/224 of img,
    # rounded to a multiple of the patch size)
    t_img = max(2 * cfg.patch_size,
                round(img * 160 / 224 / cfg.patch_size) * cfg.patch_size)
    t_img = min(t_img, img)  # degenerate validators: lowres becomes a no-op
    for name, kw in MODE_GRID.items():
        if modes and name not in modes:
            continue
        if kw == "teacher_lowres":
            kw = dict(teacher_img=t_img)
        elif kw == "teacher_lowres_k4":
            kw = dict(teacher_img=t_img, teacher_stride=4)
        measure(name, FrameScorer(params, cfg, chunk=chunk,
                                  teacher_temp=t_temp,
                                  compute_dtype=np.float32, precision=None,
                                  **kw))
    # composite PRODUCTION rows: approximation x bf16 x fused kernels,
    # exactly what bench.py ships — the stride error must not compound
    # with the quantization floor
    for name, kw in (# banded composites (r5): what a banded bench default
                     # would ship — banded passes in production numerics
                     ("band-mt-prod (bf16 banded s, f32 banded t)",
                      dict(band_mode="both", teacher_dtype=np.float32)),
                     ("band-t-mt-prod (bf16 windowed s, f32 banded t)",
                      dict(band_mode="teacher", teacher_dtype=np.float32)),
                     ("band-prod (bf16 banded s+t)",
                      dict(band_mode="both")),
                     ("turbo-prod (bf16,k4)", dict(teacher_stride=4)),
                     ("k8-prod (bf16)", dict(teacher_stride=8)),
                     ("turbo2-prod (bf16,k8,cr)",
                      dict(teacher_stride=8, teacher_interp="catmullrom")),
                     # mixed-teacher composites: f32 teacher carries with
                     # bf16 students — the teacher softmax (temp 0.02) is
                     # the composite's dominant noise amplifier and in
                     # strided modes the teacher is only 1/k of the FLOPs
                     ("turbo-mt-prod (bf16 s, f32 t, k4)",
                      dict(teacher_stride=4, teacher_dtype=np.float32)),
                     ("turbo2-mt-prod (bf16 s, f32 t, k8, cr)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32)),
                     ("turbo2a-mt-prod (bf16 s, f32 t, k8, cr, adapt)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_adaptive=1.0)),
                     ("turbo2e-mt-prod (bf16 s, f32 t, k8, cr, eref)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_refine=EREF_ALPHA)),
                     ("turbo2e-mt-s2-prod (bf16 s, f32 t, k8, cr, eref, s2)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_refine=EREF_ALPHA,
                           global_subsample=2)),
                     ("turbo3e-mt-prod (bf16 s, f32 t, k16, cr, eref)",
                      dict(teacher_stride=16, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_refine=EREF_ALPHA)),
                     ("turbo-mt-pt-prod (bf16 s, f32 t, k4, probs)",
                      dict(teacher_stride=4, teacher_dtype=np.float32,
                           teacher_target="probs")),
                     ("turbo2-mt-pt-prod (bf16 s, f32 t, k8, cr, probs)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_target="probs")),
                     ("t-lowres-prod",
                      dict(teacher_stride=4, teacher_img=t_img)),
                     # int8 W8A8 teacher rows (ops/quant.py): the exact-
                     # geometry row isolates the quantization error, the
                     # strided rows are what bench's -q8 modes ship
                     ("q8-exact (bf16 s, int8 t)",
                      dict(teacher_quant="int8")),
                     ("turbo-q8-prod (bf16 s, int8 t, k4)",
                      dict(teacher_stride=4, teacher_quant="int8")),
                     ("turbo2-q8-prod (bf16 s, int8 t, k8, cr)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_quant="int8")),
                     # int8 W8A8 STUDENT rows (r4): students are the FLOP
                     # majority under the guarded stride-8 teacher, so
                     # this is the roofline lever. The exact-geometry row
                     # isolates student-quantization error; the composite
                     # row is bench's turbo2e-mt-q8s candidate default;
                     # the all-int8 row is the economy tier.
                     ("q8s-exact (int8 s, f32 t)",
                      dict(student_quant="int8",
                           teacher_dtype=np.float32)),
                     ("turbo2e-mt-q8s-prod (int8 s, f32 t, k8, cr, eref)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_refine=EREF_ALPHA,
                           student_quant="int8")),
                     ("turbo2-q8sq8t-prod (int8 s+t, k8, cr)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_quant="int8",
                           student_quant="int8")),
                     # guarded score-stride composites (r4)
                     ("turbo2e-mt-m2e-prod (bf16 s, f32 t, k8, cr, eref, "
                      "m2+sref)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_refine=EREF_ALPHA,
                           score_stride=2, score_refine=SREF_ALPHA)),
                     ("turbo2e-mt-q8s-m2e-prod (int8 s, f32 t, k8, cr, "
                      "eref, m2+sref)",
                      dict(teacher_stride=8, teacher_interp="catmullrom",
                           teacher_dtype=np.float32,
                           teacher_refine=EREF_ALPHA,
                           student_quant="int8",
                           score_stride=2, score_refine=SREF_ALPHA))):
        if modes and name not in modes:
            continue
        measure(name, FrameScorer(params, cfg, chunk=chunk,
                                  teacher_temp=t_temp,
                                  compute_dtype=jnp.bfloat16, precision=None,
                                  **kw))
    return report


def run_reference_json_validation(rate: int = 4):
    """score_stride interpolation on the committed reference loss curves.

    Measures, for each stride m and summary length N, how much of the
    exact adaptive selection survives when only every m-th loss is
    computed and the rest are interpolated — with both piecewise-linear
    (np.interp, what score_stride ships) and Catmull-Rom (the turbo2
    teacher-side interpolant) reconstruction. Real data: the committed
    reference `loss_msvd_4_3_30.json` (~2k MSVD curves)."""
    if not os.path.exists(REF_LOSS_JSON):
        return {"skipped": f"{REF_LOSS_JSON} not present"}
    data = json.load(open(REF_LOSS_JSON))
    from dino_video_summarization_transformer_tpu.data.selection import (
        adaptive_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        _catmull_rom_rows)
    report = {}
    for m in (2, 4):
        for N in (8, 16):
            stats = {"linear": [0, 0], "catmullrom": [0, 0]}
            tot = 0
            for losses in data.values():
                losses = np.asarray(losses, float)
                T = len(losses)
                if T < 2 * m or not np.isfinite(losses).all() or losses.sum() <= 0:
                    continue
                pos = np.arange(0, T, m)
                if pos[-1] != T - 1:
                    pos = np.append(pos, T - 1)
                ie, _ = adaptive_indices(losses, N, rate, T, T * rate)
                tot += len(ie)
                fasts = {
                    "linear": np.interp(np.arange(T), pos, losses[pos]),
                    "catmullrom": _catmull_rom_rows(
                        pos, losses[pos, None], np.arange(T))[:, 0],
                }
                for kind, fast in fasts.items():
                    ifa, _ = adaptive_indices(fast, N, rate, T, T * rate)
                    stats[kind][0] += len(set(ie) & set(ifa))
                    stats[kind][1] += sum(
                        any(abs(i - j) <= rate for j in ifa) for i in ie)
            for kind, (agree, agree1) in stats.items():
                suffix = "" if kind == "linear" else "_cr"
                report.setdefault(f"m{m}_N{N}", {}).update({
                    f"selection_agree_exact{suffix}": round(agree / tot, 4),
                    f"selection_agree_tol1{suffix}": round(agree1 / tot, 4),
                })

    # GUARDED score-stride calibration (ScorerConfig.score_refine): the
    # alpha grid that picked SREF_ALPHA, kept in the artifact so the
    # choice is reproducible. Context rows: the bf16-noise selection floor
    # on the SAME curves (4-6% relative score noise — what the accepted
    # production numerics already cost).
    rng = np.random.RandomState(0)
    floor = {}
    for noise in (0.04, 0.06):
        agr = []
        for losses in data.values():
            l = np.asarray(losses, float)
            T = len(l)
            if T < 32 or not np.isfinite(l).all() or l.sum() <= 0:
                continue
            ie, _ = adaptive_indices(l, 16, rate, T, T * rate)
            ia, _ = adaptive_indices(l * (1 + noise * rng.randn(T)),
                                     16, rate, T, T * rate)
            agr.append(len(set(ie) & set(ia)) / len(ie))
        floor[f"bf16_noise_{noise}"] = round(float(np.mean(agr)), 4)
    report["selection_floor_N16"] = floor

    def _loo_mids(pos, l, alpha):
        if len(pos) < 3:
            return np.empty(0, pos.dtype)
        w = ((pos[1:-1] - pos[:-2]).astype(np.float64)
             / np.maximum(pos[2:] - pos[:-2], 1))
        l_hat = l[:-2] * (1.0 - w) + l[2:] * w
        errs = np.abs(l[1:-1] - l_hat) / max(float(np.abs(l).mean()), 1e-12)
        mids = set()
        for i in np.nonzero(errs > alpha)[0]:
            for a, b in ((i, i + 1), (i + 1, i + 2)):
                if pos[b] - pos[a] >= 2:
                    mids.add((int(pos[a]) + int(pos[b])) // 2)
        mids -= set(int(p) for p in pos)
        return np.asarray(sorted(mids), dtype=pos.dtype)

    for m in (2, 4):
        for alpha in (0.05, 0.1, 0.2, 0.4):
            agr, cost = [], []
            for losses in data.values():
                l = np.asarray(losses, float)
                T = len(l)
                if T < 32 or not np.isfinite(l).all() or l.sum() <= 0:
                    continue
                pos = np.arange(0, T, m)
                if pos[-1] != T - 1:
                    pos = np.append(pos, T - 1)
                mids = _loo_mids(pos, l[pos], alpha)
                allp = np.concatenate([pos, mids])
                order = np.argsort(allp)
                approx = np.interp(np.arange(T), allp[order],
                                   l[allp[order]])
                ie, _ = adaptive_indices(l, 16, rate, T, T * rate)
                ia, _ = adaptive_indices(approx, 16, rate, T, T * rate)
                agr.append(len(set(ie) & set(ia)) / len(ie))
                cost.append((len(pos) + len(mids)) / T)
            report[f"guarded_m{m}_alpha{alpha}_N16"] = {
                "selection_agree_exact": round(float(np.mean(agr)), 4),
                "student_rows_frac": round(float(np.mean(cost)), 4),
            }
    return report


# default validator sweep: different widths/resolutions give different
# feature regimes (a single random-init config can saturate — see
# teacher_saturation); turbo must hold on the WORST of them
# (arch, img, n_videos, n_frames); None = the CLI values. The ViT-B spot
# config runs a reduced corpus — it is the production arch, so one live
# spot check matters more than corpus breadth (cost: exact f32 scoring).
DEFAULT_VALIDATORS = [("vit_tiny", 32, None, None),
                      ("vit_small", 96, None, None),
                      ("vit_small", 224, None, None),
                      ("vit_base", 224, 3, 120)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default=None,
                   choices=["vit_base", "vit_small", "vit_tiny"],
                   help="single validator arch (default: the sweep)")
    p.add_argument("--videos", type=int, default=8)
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--out", default="eval_logs/fast_scoring_validation.json")
    p.add_argument("--skip-model", action="store_true")
    p.add_argument("--modes", default="",
                   help="';'-separated list restricting the mode grid (the "
                        "floor row always runs; ';' because composite row "
                        "names contain commas); e.g. "
                        "'turbo-prod (bf16,k4);k8+cr'")
    args = p.parse_args()

    report = {"reference_json_interpolation": run_reference_json_validation()}
    if not args.skip_model:
        validators = ([(args.arch, args.img, None, None)] if args.arch
                      else DEFAULT_VALIDATORS)
        grids = {}
        mode_filter = ([m.strip() for m in args.modes.split(";") if m.strip()]
                       or None)
        for arch, img, n_vid, n_frames in validators:
            grids[f"{arch}@{img}"] = run_model_validation(
                arch, n_vid or args.videos, n_frames or args.frames, img,
                args.chunk, modes=mode_filter)
        report["model_grids"] = grids
        # worst-case aggregation over LIVE validators only: a validator
        # whose random-init teacher saturates to a constant one-hot
        # (distinct_argmax < 2) produces near-constant losses whose
        # relative errors measure numerical noise, not approximation
        # quality (see teacher_saturation) — it is excluded and recorded
        live = {k: g for k, g in grids.items()
                if g["saturation"]["live"]}
        report["excluded_saturated"] = sorted(set(grids) - set(live))
        if not live:
            live = grids  # never aggregate over nothing
        worst = {}
        for key in list(live.values())[0]:
            if key in ("saturation", "teacher_temp"):
                continue
            worst[key] = {
                "spearman_min": min(g[key]["spearman_min"] for g in live.values()),
                "rel_err_max": max(g[key]["rel_err_max"] for g in live.values()),
                "selection_agree_exact_min": min(
                    g[key]["selection_agree_exact"] for g in live.values()),
            }
        report["worst_case"] = worst
        report["config"] = {"validators": [v[:2] for v in validators],
                            "videos": args.videos, "frames": args.frames}

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report.get("worst_case", report), indent=2))


if __name__ == "__main__":
    main()
