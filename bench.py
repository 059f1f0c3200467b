#!/usr/bin/env python
"""Benchmark: frames scored per second per chip (TimeSformer ViT-B).

Measures the core scoring workload (BASELINE.json metric): per-frame DINO
importance scoring with local(3)/global(30) windows on ViT-B/16 divided
space-time attention. Prints ONE JSON line.

Modes (quality table in BENCH.md, measured by tools/validate_fast_scoring.py):
  exact:     bfloat16, reference window geometry (teacher T=30) — same
             scores as the reference up to bf16 noise (~3-6% relative).
  exact-f32: float32 + HIGHEST matmuls — bit-parity numerics (~1e-5).
  band-mt (default headline, r5): BANDED one-pass scoring — each frame
             is processed ONCE per pass instead of once per overlapping
             window (models/banded.py; temporal attention masked to the
             frame's clamp-shifted window, per-frame CLS aggregating over
             its window), bf16 banded students + f32 (mixed) banded
             teacher through the banded Pallas kernels
             (ops/banded_block.py). ~0.10 TFLOP/frame vs turbo2e-mt's
             0.33 — the only roofline-consistent route to 1000 f/s.
             Validator (eval_logs/band_validation.json): worst-over-
             configs composite 3.11% — better than the r4 default's
             worst case (3.31%) measured same-run — below the bf16 floor
             on tiny@32 AND the production arch.
  band-t-mt: the conservative banded opt-in — EXACT windowed per-frame
             students, banded teacher only (~0.19 TFLOP/frame); below
             the bf16 floor on ALL FOUR validator configs.
  turbo2e-mt (r4 default): teacher stride 8 + Catmull-Rom CLS
             interpolation, f32 teacher, PLUS error-adaptive refinement —
             knots whose measured feature-space LOO interpolation error
             exceeds alpha=0.035 get their intervals bisected (stride
             8 -> 4 exactly where interpolation is failing). Content-
             adaptive cost with a built-in quality guard: the production
             arch's smooth teacher curves pay zero refinement (validator:
             1.27% composite vs the 3.91% bf16 floor, selection agreement
             0.979 vs exact — better than turbo-mt's 0.938), while
             feature-noisy content self-degrades to turbo-mt cost AND
             quality (tiny@32: 3.31% == turbo-mt's 3.33%). Full table in
             BENCH.md / eval_logs/fast_scoring_validation.json.
  turbo-mt:  the earlier r3 default — teacher stride 4 in f32 with linear
             CLS interpolation, bf16 students; strictly better than the
             r2 turbo on every validator config.
  turbo:     the r2 default — stride 4, bf16 teacher.
  turbo2-mt: turbo2e-mt without the refinement guard — validated opt-in.
  turbo-max: turbo + score_stride 4 (losses of 3 of 4 frames linearly
             interpolated). Fastest; documented as below the quality bar
             (loss curves carry frame-rate noise that interpolation
             removes — selection shifts; see BENCH.md).

FLOP accounting: every mode reports analytic TFLOP/frame (utils/flops.py),
achieved TFLOP/s and MFU vs the v5e 197 TFLOP/s bf16 peak. Roofline note:
exact scoring costs 1.56 TFLOP/frame (student T=3 0.136 + teacher T=30
1.42), so even 100% MFU caps exact mode at ~126 f/s/chip — the 1000 f/s
north star is reachable only through the validated approximations.

vs_baseline is value / 1000 (the BASELINE.json north-star of 1000
frames/s/chip on v5e).
"""

import argparse
import json
import os
import time


MODES = {
    # mode -> (dtype, precision, global_subsample, teacher_stride,
    #          score_stride, teacher_img, teacher_interp, use_pallas
    #          [, teacher_dtype [, teacher_refine [, teacher_quant]]])
    "exact": ("bf16", None, 1, 1, 1, 0, "linear", "auto"),
    # exact-mixed: f32 activations/carry with DEFAULT-precision matmuls —
    # on TPU that is bf16-multiply/f32-accumulate, i.e. a far lower noise
    # floor than full bf16 at some HBM cost. The quality validator's
    # oracle runs this tier (XLA path). -fused variants run the same
    # numerics through the fused Pallas kernels (f32 carries, bf16 matmul
    # operands — opt-in via use_pallas=True).
    "exact-mixed": ("f32", None, 1, 1, 1, 0, "linear", "auto"),
    "exact-mixed-fused": ("f32", None, 1, 1, 1, 0, "linear", True),
    "exact-f32": ("f32", "highest", 1, 1, 1, 0, "linear", "auto"),
    "turbo": ("bf16", None, 1, 4, 1, 0, "linear", "auto"),
    # turbo-mixed: turbo's teacher stride at the mixed tier — near-f32
    # quality at fused-kernel speed (f32 carries)
    "turbo-mixed": ("f32", None, 1, 4, 1, 0, "linear", True),
    # turbo-mt: turbo with the teacher forward in f32 (mixed tier). The
    # teacher softmax at temp 0.02 is the composite's dominant noise
    # amplifier; f32 carries remove it at bf16-multiply/f32-accumulate
    # matmul speed. Validator: strictly better than turbo-prod on ALL 4
    # configs, and BELOW the bf16 noise floor on the production arch
    # (ViT-B@224: 1.0% vs 6.1% — eval_logs/fast_scoring_validation.json).
    "turbo-mt": ("bf16", None, 1, 4, 1, 0, "linear", "auto", "f32"),
    # turbo2: teacher stride 8 with Catmull-Rom (cubic) CLS interpolation —
    # the curvature term is what k=8+linear was missing (quality table in
    # BENCH.md / eval_logs/fast_scoring_validation.json)
    "turbo2": ("bf16", None, 1, 8, 1, 0, "catmullrom", "auto"),
    # turbo2-mt: turbo2 with the teacher forward in f32 (mixed tier) —
    # teacher-side quantization out of the composite at 1/8-of-frames cost
    "turbo2-mt": ("bf16", None, 1, 8, 1, 0, "catmullrom", "auto", "f32"),
    # turbo2e-mt: turbo2-mt + error-adaptive teacher refinement — after
    # the stride-8 pass, knots whose measured feature-space LOO
    # interpolation error exceeds alpha get their surrounding intervals
    # bisected (stride 8 -> 4 locally). Content-adaptive cost: smooth
    # teacher curves keep stride-8 speed, feature-noisy ones self-degrade
    # toward turbo-mt quality AND cost (quality table in BENCH.md).
    "turbo2e-mt": ("bf16", None, 1, 8, 1, 0, "catmullrom", "auto", "f32",
                   0.035),
    # turbo2e-mt-s2: turbo2e-mt with the teacher WINDOW dilated 2x
    # (global_subsample=2 — the teacher sees 15 frames spanning the same
    # +/-15-frame horizon), halving the remaining teacher FLOPs. Validated
    # 224px OPT-IN, not the default: on the production geometry it sits
    # BELOW the bf16 floor (base@224 composite 2.45% vs floor 3.91%,
    # small@224 0.56% vs 2.12%) but it fails the low-resolution
    # validators outright (tiny@32 / small@96 worst-case 21% — a 2x2/6x6
    # patch grid starves the dilated window of temporal signal);
    # eval_logs/s2_validation.json.
    "turbo2e-mt-s2": ("bf16", None, 2, 8, 1, 0, "catmullrom", "auto",
                      "f32", 0.035),
    # -q8 variants: W8A8 int8 teacher (ops/quant.py) — the v5e MXU's 2x
    # tier. EXPERIMENTAL until the composite-vs-floor validation passes;
    # measured teacher-forward speedup 1.18x over the bf16 wb kernels.
    "turbo-q8": ("bf16", None, 1, 4, 1, 0, "linear", "auto", None, 0.0,
                 "int8"),
    "turbo2-q8": ("bf16", None, 1, 8, 1, 0, "catmullrom", "auto", None,
                  0.0, "int8"),
    # -q8s variants: W8A8 int8 STUDENT (r4) — measured and VALIDATED AS
    # OPT-IN, not the default. Kernel-level: the wb kernels are not
    # MXU-peak-bound at the scoring shapes, so int8 buys 1.16x on the
    # student forward (not the 2x s8 tier); e2e device-only +6%. Quality
    # (eval_logs/q8s_m2e_validation.json): TIES the bf16 default on the
    # production arch (base@224 relerr 0.0132 vs 0.0127, agree 0.979
    # both; q8s-exact even sits below that config's floor) but the
    # worst-case over live validators is above the default's
    # (0.0698 vs 0.0528, floor 0.0408) — so the default stays bf16.
    "turbo2e-mt-q8s": ("bf16", None, 1, 8, 1, 0, "catmullrom", "auto",
                       "f32", 0.035, None, "int8"),
    # full-int8 economy tier: both sides quantized, unguarded stride 8 —
    # worst-case relerr 0.1148 (validator artifact), well above floor
    "turbo2-q8sq8t": ("bf16", None, 1, 8, 1, 0, "catmullrom", "auto",
                      None, 0.0, "int8", "int8"),
    # -m2e: GUARDED score-stride 2 (r4) — the sibling of the teacher
    # refinement applied to the loss curve itself: score every 2nd frame,
    # bisect intervals whose measured LOO interpolation error exceeds
    # alpha=0.2 of the video's mean loss. Calibrated on the committed
    # reference MSVD curves: unguarded m=2 selection agreement 0.706 (far
    # below the bf16 floor 0.85-0.89); guarded at alpha=0.2 recovers
    # 0.858 == the 6%-noise floor at 0.82 student rows/frame. VALIDATED
    # OPT-IN: on the smooth production-arch validator the guard pays
    # nothing and m2 quality equals the default at half the student rows
    # (base@224: agree 0.979 both, s-rows 0.51), but real loss curves are
    # noise-dominated at frame granularity, bounding the savings at floor
    # quality (eval_logs/q8s_m2e_validation.json).
    "turbo2e-mt-m2e": ("bf16", None, 1, 8, 2, 0, "catmullrom", "auto",
                       "f32", 0.035, None, None, 0.2),
    # the compound opt-in: int8 students + guarded m=2
    "turbo2e-mt-q8s-m2e": ("bf16", None, 1, 8, 2, 0, "catmullrom", "auto",
                           "f32", 0.035, None, "int8", 0.2),
    # teacher_img 160 (FrameScorer knob) measured SLOWER than turbo here
    # despite 0.33 vs 0.52 TFLOP/frame: the 101-token teacher forward runs
    # at ~20% MFU on this chip, eating the FLOP savings — not a mode.
    "turbo-max": ("bf16", None, 1, 4, 4, 0, "linear", "auto"),
    # banded one-pass scoring (r5, models/banded.py): each frame is
    # processed ONCE per pass instead of once per overlapping window —
    # ~2 frame-units/frame (~0.10 TFLOP) vs the guarded default's ~6.8,
    # the only roofline-consistent route to 1000 f/s. band-mt = banded
    # bf16 students + banded f32 (mixed) teacher; band-t-mt keeps the
    # exact windowed per-frame students and bands only the teacher
    # (~4 units/frame). Slot 13 = band_mode.
    "band-mt": ("bf16", None, 1, 1, 1, 0, "linear", "auto", "f32",
                0.0, None, None, 0.0, "both"),
    "band": ("bf16", None, 1, 1, 1, 0, "linear", "auto", None,
             0.0, None, None, 0.0, "both"),
    "band-t-mt": ("bf16", None, 1, 1, 1, 0, "linear", "auto", "f32",
                  0.0, None, None, 0.0, "teacher"),
}


def mode_scorer_kwargs(mode: str, wire: str = "yuv420") -> dict:
    """FrameScorer keyword args for a named bench mode — the single
    source of truth for what each mode ships (also consumed by
    tools/validate_real_assets.py's fast-mode agreement stage)."""
    import jax.numpy as jnp

    spec = MODES[mode]
    (dtype_name, precision, subsample, t_stride, s_stride,
     t_img, t_interp, use_pallas) = spec[:8]
    return dict(
        compute_dtype=jnp.float32 if dtype_name == "f32" else jnp.bfloat16,
        precision=precision,
        global_subsample=subsample,
        teacher_stride=t_stride,
        score_stride=s_stride,
        teacher_img=t_img,
        teacher_interp=t_interp,
        use_pallas=use_pallas,
        teacher_dtype=(jnp.float32 if len(spec) > 8 and spec[8] else None),
        teacher_refine=spec[9] if len(spec) > 9 else 0.0,
        teacher_quant=spec[10] if len(spec) > 10 else None,
        student_quant=spec[11] if len(spec) > 11 else None,
        score_refine=spec[12] if len(spec) > 12 else 0.0,
        band_mode=spec[13] if len(spec) > 13 else None,
        wire_format=("yuv420q" if wire == "yuv420q" else "yuv420"),
    )


def _e2e_videos_per_min(scorer, n_videos: int = 6, raw_frames: int = 240,
                        rate: int = 4, num_frames: int = 16):
    """Full summarization pipeline on a synthetic corpus: encode N clips
    with the native shim, then time [decode (packed I420) -> per-frame DINO
    scoring -> loss JSON -> adaptive CDF selection of ``num_frames``]
    end to end. Returns videos/min, or None if the native decoder is
    unavailable."""
    import shutil
    import tempfile

    import numpy as np

    from dino_video_summarization_transformer_tpu.config import get_cfg
    from dino_video_summarization_transformer_tpu.data import video as vio
    from dino_video_summarization_transformer_tpu.data.datasets import (
        DinoLossDataset, FrameSelectionDataset)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        run_scoring)

    if not vio.native_available():
        return None
    import contextlib
    import io

    d = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            return _e2e_inner(scorer, d, n_videos, raw_frames, rate,
                              num_frames)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _e2e_inner(scorer, d, n_videos, raw_frames, rate, num_frames):
    import numpy as np

    from dino_video_summarization_transformer_tpu.config import get_cfg
    from dino_video_summarization_transformer_tpu.data import video as vio
    from dino_video_summarization_transformer_tpu.data.datasets import (
        DinoLossDataset, FrameSelectionDataset)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        run_scoring)

    rng = np.random.RandomState(0)
    names = []
    for i in range(n_videos):
        name = f"clip{i}.avi"
        vio.write_video(os.path.join(d, name),
                        rng.randint(0, 256, (raw_frames, 256, 320, 3),
                                    dtype=np.uint8), fps=30)
        names.append(name)
    with open(os.path.join(d, "test.csv"), "w") as f:
        f.write("".join(f"{n} 0\n" for n in names))

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = d
    cfg.DATA.PATH_PREFIX = d
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    ds = DinoLossDataset(cfg, "test", scorer.local_size,
                         scorer.global_size, rate,
                         wire_format=scorer.config.wire_format)
    loss_file = os.path.join(d, "loss.json")

    # untimed warmup pass: compiles every dispatch shape of THIS mode
    # (stride/group geometries differ between modes, so a mode measured
    # with a cold persistent cache would otherwise pay one-time compiles
    # inside the e2e window that a warm mode does not)
    run_scoring(ds, scorer, os.path.join(d, "warmup.json"),
                num_workers=2, log_every=0)

    t0 = time.time()
    run_scoring(ds, scorer, loss_file, num_workers=2, log_every=0)
    t_score = time.time() - t0
    cfg.LOSS_FILE = loss_file
    # probe_only: indices from container metadata — no second full decode
    # (tested equal to the decode path; the synthetic fixtures' metadata
    # is exact)
    sel = FrameSelectionDataset(cfg, rate, "adaptive", num_frames,
                                return_type="Indices", probe_only=True)
    for i in range(len(sel)):
        sel[i]
    dt = time.time() - t0
    # stage split: selection re-decodes each video host-side (~1 s / 6
    # videos on this host); anything beyond compute+wire inside t_score is
    # dispatch/pipeline overhead — the split tells the rounds apart
    return {"videos_per_min": n_videos / dt * 60.0,
            "scoring_s": round(t_score, 2),
            "selection_s": round(dt - t_score, 2)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="band-mt", choices=sorted(MODES))
    p.add_argument("--frames", type=int, default=480)
    p.add_argument("--chunk", type=int, default=0, help="0 = auto")
    p.add_argument("--wire", default="yuv420",
                   choices=["yuv420", "yuv420q", "u8", "f32"],
                   help="frame transport: yuv420 = packed planar 4:2:0 as "
                        "decoded (1.5 B/px, color conversion fused on "
                        "device — the production path); yuv420q = chroma "
                        "box-averaged to 1/8 per axis (~1.03 B/px — "
                        "EXPERIMENTAL, quality-invalidated, BENCH.md); "
                        "u8 = RGB24 "
                        "(3 B/px); f32 = pre-normalized floats")
    p.add_argument("--repeats", type=int, default=5,
                   help="best-of; the shared TPU tunnel has high variance")
    p.add_argument("--profile", default="",
                   help="directory for a jax.profiler trace of one repeat")
    p.add_argument("--all-metrics", action="store_true",
                   help="print the full accounting dict instead of one line")
    p.add_argument("--no-e2e", action="store_true",
                   help="skip the end-to-end videos/min section (synthetic "
                        "corpus: encode -> native decode -> score -> "
                        "adaptive selection)")
    args = p.parse_args()

    scorer_kw = mode_scorer_kwargs(args.mode, args.wire)
    subsample = scorer_kw["global_subsample"]
    t_stride = scorer_kw["teacher_stride"]
    s_stride = scorer_kw["score_stride"]
    t_img = scorer_kw["teacher_img"]
    band_mode = scorer_kw["band_mode"]
    if not args.chunk:
        args.chunk = 32 if (t_stride > 1 or band_mode) else 16

    from dino_video_summarization_transformer_tpu.utils.cache import (
        enable_compilation_cache)

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dino_video_summarization_transformer_tpu.data.windows import (
        window_indices)
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        FrameScorer)
    from dino_video_summarization_transformer_tpu.models import (
        init_timesformer, vit_base_config)
    from dino_video_summarization_transformer_tpu.utils.flops import (
        V5E_PEAK_BF16, scoring_flops_per_frame)

    cfg = vit_base_config(num_frames=8, num_classes=0)
    params = init_timesformer(jax.random.key(0), cfg)

    scorer = FrameScorer(params, cfg, chunk=args.chunk, **scorer_kw)

    T = args.frames
    if args.wire in ("yuv420", "yuv420q"):
        # what the native decoder hands the dataset: packed I420 planes
        # (data/video.py read_video_yuv420) — RGB never exists on the host
        from dino_video_summarization_transformer_tpu.data.yuv import (
            pack_rgb, quarter_chroma)

        rgb = np.random.RandomState(0).randint(
            0, 256, (T, 224, 224, 3), dtype=np.uint8)
        frames = pack_rgb(rgb)
        if args.wire == "yuv420q":
            frames = quarter_chroma(frames)
    elif args.wire == "u8":
        frames = np.random.RandomState(0).randint(
            0, 256, (T, 224, 224, 3), dtype=np.uint8)
    else:
        frames = np.random.RandomState(0).randn(T, 224, 224, 3).astype(np.float32)
    loc, glob, eff = window_indices(T, 3, 30)

    # warmup / compile (banded modes: also compile the full-length bucket)
    scorer.score_video(frames[:64], loc[:64], glob[:64], eff)
    if band_mode:
        scorer.score_video(frames, loc, glob, eff)
    for k in scorer.stats:
        scorer.stats[k] = type(scorer.stats[k])(0)
    frames_scored = 0

    rates = []
    for r in range(args.repeats):
        if args.profile and r == args.repeats - 1:
            jax.profiler.start_trace(args.profile)
        t0 = time.time()
        out = scorer.score_video(frames, loc, glob, eff)
        dt = time.time() - t0
        if args.profile and r == args.repeats - 1:
            jax.profiler.stop_trace()
        assert np.isfinite(out).all()
        rates.append(T / dt)
        frames_scored += T
    best = max(rates)
    median = float(np.median(rates))

    # SUSTAINED rate: several videos in flight through the async API —
    # exactly how the production pipeline (run_scoring / score_group_async)
    # drives the scorer over a corpus. The single-video number above pays a
    # non-overlapped initial wire stall (the first chunk's pieces must
    # land before any compute) plus the final readback latency once per
    # video; in corpus scoring both hide behind the neighboring videos'
    # compute. The HEADLINE is the median over >= 3 sustained passes
    # (BENCH.md "Methodology") — best/median single-video rates are
    # companions, never the headline.
    sustained = []
    for _ in range(3):
        t0 = time.time()
        handles = [scorer.score_video_async(frames, loc, glob, eff)
                   for _ in range(3)]
        outs = [h.fetch() for h in handles]
        sustained.append(3 * T / (time.time() - t0))
        frames_scored += 3 * T
        assert all(np.isfinite(o).all() for o in outs)
    sustained_best = max(sustained)
    sustained_median = float(np.median(sustained))

    # DEVICE-ONLY companion: the same sustained pass with the video's
    # pieces pre-resident in HBM (no host->device traffic in the timed
    # window). The tunnel's wire swings 2x run to run; this number is the
    # wire-independent compute+dispatch rate a real v5e host (GB/s wire)
    # would see, so driver telemetry decouples from tunnel luck.
    from dino_video_summarization_transformer_tpu.engine.scoring import (
        _PieceBuffer)

    wire_frames = frames
    if frames.dtype != np.uint8:
        wire_frames = frames.astype(np.dtype(scorer.compute_dtype))
    dbuf = _PieceBuffer(wire_frames, scorer.piece, device=scorer.device)
    dbuf.fire_until(dbuf.n_pieces)
    for piece in dbuf._pieces.values():
        piece.block_until_ready()
    device_only = []
    for _ in range(3):
        t0 = time.time()
        handles = [scorer.score_video_async(frames, loc, glob, eff, buf=dbuf)
                   for _ in range(3)]
        outs = [h.fetch() for h in handles]
        device_only.append(3 * T / (time.time() - t0))
        frames_scored += 3 * T
        assert all(np.isfinite(o).all() for o in outs)
    device_only_median = float(np.median(device_only))
    # banded FLOP accounting: the scorer accumulates the analytic cost of
    # every banded pass it dispatched (padding/halo included); the hybrid
    # mode adds its exact windowed students. Snapshot BEFORE the e2e /
    # companion sections below touch the stats.
    band_flops_per_frame = None
    if band_mode:
        from dino_video_summarization_transformer_tpu.utils.flops import (
            timesformer_forward_flops)

        total = scorer.stats["band_flops"]
        if band_mode == "teacher":
            total += scorer.stats["student_rows"] * timesformer_forward_flops(
                cfg, 3)
        band_flops_per_frame = total / max(1, frames_scored)
    # the adaptive modes' teacher cost is data-dependent; report what was
    # actually paid (fraction of one teacher row per scored frame)
    teacher_rows_frac = round(
        scorer.stats["teacher_rows"] / max(1, frames_scored), 4)
    student_rows_frac = round(
        scorer.stats["student_rows"] / max(1, frames_scored), 4)

    # wire diagnostic: host->device bandwidth bounds end-to-end throughput
    # at wire_mb_s / frame_mb regardless of compute (the bench tunnel runs
    # ~20-36 MB/s; a real v5e host does GB/s and never hits this ceiling)
    probe = np.random.randint(0, 256, (16 * 1024 * 1024,), dtype=np.uint8)
    x = jax.device_put(probe)
    np.asarray(x[:1])
    t0 = time.time()
    x = jax.device_put(probe)
    np.asarray(x[:1])
    wire_mb_s = 16.0 / (time.time() - t0)
    frame_mb = frames[0].nbytes / 1e6

    # end-to-end summarization rate (BASELINE.md: "videos/min summarized"):
    # synthetic corpus -> native codec decode (yuv420 wire) -> per-frame
    # scoring -> adaptive CDF selection, timed as one pipeline
    videos_per_min = None
    if not args.no_e2e:
        videos_per_min = _e2e_videos_per_min(scorer)

    # companion measurements (one flagged run each) so the driver
    # telemetry carries the exact AND fast-opt-in trajectories alongside
    # the headline (VERDICT r2 weak #4)
    exact_fps = None
    companion_fps = None
    companion_mode = None
    if (args.mode in ("turbo", "turbo-mt", "turbo2e-mt", "band-mt")
            and not args.no_e2e):
        ex_scorer = FrameScorer(params, cfg, chunk=16,
                                compute_dtype=jnp.bfloat16, precision=None)
        ex_scorer.score_video(frames[:64], loc[:64], glob[:64], eff)
        ex_rates = []
        for _ in range(2):
            t0 = time.time()
            out = ex_scorer.score_video(frames, loc, glob, eff)
            ex_rates.append(T / (time.time() - t0))
        exact_fps = max(ex_rates)

        # second companion: the PREVIOUS default (turbo-mt) when running
        # the turbo2e-mt headline, else the fast opt-in (turbo2-mt) — so
        # driver telemetry always carries both sides of the promotion
        if args.mode == "band-mt":
            # banded headline: carry the PREVIOUS default (turbo2e-mt) so
            # the promotion delta is measured same-run, same-tunnel
            companion_mode = "turbo2e_mt_fps"
            c_kw = dict(teacher_stride=8, teacher_interp="catmullrom",
                        teacher_refine=0.035)
        elif args.mode == "turbo2e-mt":
            companion_mode = "turbo_mt_fps"
            c_kw = dict(teacher_stride=4, teacher_interp="linear")
        else:
            companion_mode = "turbo2_mt_fps"
            c_kw = dict(teacher_stride=8, teacher_interp="catmullrom")
        c_scorer = FrameScorer(params, cfg, chunk=args.chunk,
                               compute_dtype=jnp.bfloat16, precision=None,
                               teacher_dtype=jnp.float32,
                               wire_format=scorer.config.wire_format, **c_kw)
        c_scorer.score_video(frames[:64], loc[:64], glob[:64], eff)
        c_rates = []
        for _ in range(2):
            t0 = time.time()
            out = c_scorer.score_video(frames, loc, glob, eff)
            c_rates.append(T / (time.time() - t0))
        companion_fps = max(c_rates)

    flops_per_frame = (band_flops_per_frame if band_flops_per_frame
                       else scoring_flops_per_frame(
                           cfg, local_size=3, eff_global=eff,
                           global_subsample=subsample,
                           teacher_stride=t_stride, score_stride=s_stride,
                           teacher_img=t_img))
    # the headline IS the sustained rate (median of 3 passes — BENCH.md
    # "Methodology"); best single-video and device-only rates are
    # companions. VERDICT r3 weak-#1: no max() headline selection.
    headline = sustained_median
    achieved = headline * flops_per_frame
    wire_ceiling = wire_mb_s / frame_mb
    result = {
        "metric": f"frames scored/sec/chip (TimeSformer ViT-B, {args.mode})",
        "value": round(headline, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(headline / 1000.0, 4),
        "value_sustained": round(sustained_median, 2),
        "value_sustained_best": round(sustained_best, 2),
        "value_device_only": round(device_only_median, 2),
        "value_single_video": round(best, 2),
        "value_median": round(median, 2),
        "tflop_per_frame": round(flops_per_frame / 1e12, 4),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(achieved / V5E_PEAK_BF16, 4),
        "wire_mb_per_s": round(wire_mb_s, 1),
        "wire_ceiling_fps": round(wire_ceiling, 1),
        # the tunnel's host->device wire swings ~7-37 MB/s run to run; when
        # its ceiling comes within 1.5x of the measured rate, the number is
        # (partly) a wire measurement, not a compute one
        "wire_bound": bool(wire_ceiling < 1.5 * headline),
        "teacher_rows_frac": teacher_rows_frac,
        "student_rows_frac": student_rows_frac,
    }
    if exact_fps is not None:
        result["exact_fps"] = round(exact_fps, 2)
    if companion_fps is not None:
        result[companion_mode] = round(companion_fps, 2)
    if videos_per_min is not None:
        result["videos_per_min_e2e"] = round(videos_per_min["videos_per_min"], 1)
        result["e2e_scoring_s"] = videos_per_min["scoring_s"]
        result["e2e_selection_s"] = videos_per_min["selection_s"]
    if not args.all_metrics:
        print(json.dumps(result))
    else:
        print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
