"""Per-frame DINO importance scoring — the batched, pipelined TPU pipeline.

Re-designs the reference's scoring loop (ref: dino_similarity.py:16-93) for
TPU execution:

reference (GPU):  per video, materialize a (2T, 3, 30, 224, 224) view tensor
                  on the host (ref: dino_loss_loader.py:95-107), ship it,
                  then per batch run two forwards and a *per-frame Python
                  loop with .item() syncs* (ref: dino_similarity.py:87-88).

here (TPU):       each frame crosses the wire ONCE, as uint8, in PIECE-frame
                  slices fired asynchronously ahead of compute so the
                  host->device transfer overlaps the forwards; local/global
                  windows are *gathered on device* by index from a window of
                  resident pieces; a chunk of frames is scored per device
                  call (two batched forwards + a vectorized loss). Every
                  video of any length runs through the same compiled
                  programs, dispatches are queued without host syncs, and
                  results are fetched once per pass.

Approximation knobs (validated by tools/validate_fast_scoring.py, table in
BENCH.md): ``global_subsample`` samples the teacher window, ``teacher_stride``
interpolates teacher CLS features between strided teacher forwards,
``score_stride`` interpolates the loss itself between scored frames.

Numerics: reference-compat mode runs float32 with HIGHEST matmul precision
(bit-matching the GPU reference to ~1e-5); production mode runs bfloat16.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import yuv
from ..models import banded
from ..models import timesformer as tsf
from ..train.dino import scoring_dino_loss

PIECE = 64           # frames per async upload piece
MAX_INFLIGHT = 16    # outstanding chunk dispatches before draining
MAX_RESIDENT_PIECES = 48  # ~3072 uint8 224px frames (~460 MB) held on device


class _PieceBuffer:
    """The video's frames on device as PIECE-frame slices.

    ``jax.device_put`` is asynchronous and rides the transfer stream, so
    firing piece uploads ahead of the compute dispatches makes the wire
    transfer overlap the forwards (on the bench tunnel the wire runs
    ~36 MB/s, which would otherwise serialize ~2 s per 480-frame video in
    front of the compute). Pieces stay in their wire dtype (uint8 — 1 B/px
    of HBM); normalization happens inside the chunk kernels after the
    gather, so no computation is enqueued per piece — an on-device prep
    pass would execute in launch order on the compute stream and couple
    every later chunk to every earlier transfer. Pieces are evicted once
    the monotonically advancing chunk cursor passes them.
    """

    def __init__(self, frames: np.ndarray, piece: int = PIECE, device=None):
        self.frames = frames
        self.piece = piece
        self.device = device  # None = default device (uncommitted puts)
        self.n_pieces = -(-frames.shape[0] // piece)
        self._pieces: Dict[int, jnp.ndarray] = {}
        self._zero: Optional[jnp.ndarray] = None
        self._spans: Dict[tuple, jnp.ndarray] = {}
        self._fired = 0  # pieces uploaded so far (always in order)

    def _put(self, x: np.ndarray) -> jnp.ndarray:
        if self.device is None:
            return jax.device_put(x)
        return jax.device_put(x, self.device)

    def fire_until(self, i: int) -> None:
        """Asynchronously upload pieces [fired, i)."""
        P = self.piece
        nd = self.frames.ndim - 1
        while self._fired < min(i, self.n_pieces):
            j = self._fired
            sl = self.frames[j * P:(j + 1) * P]
            if sl.shape[0] < P:
                sl = np.pad(sl, ((0, P - sl.shape[0]),) + ((0, 0),) * nd)
            self._pieces[j] = self._put(sl)
            self._fired += 1

    def _piece(self, i: int) -> jnp.ndarray:
        if i >= self.n_pieces:
            if self._zero is None:
                shape = (self.piece,) + self.frames.shape[1:]
                self._zero = self._put(np.zeros(shape, self.frames.dtype))
            return self._zero
        self.fire_until(i + 1)
        if i not in self._pieces:  # evicted earlier; re-fire transparently
            P = self.piece
            sl = self.frames[i * P:(i + 1) * P]
            if sl.shape[0] < P:
                sl = np.pad(sl, ((0, P - sl.shape[0]),) +
                            ((0, 0),) * (self.frames.ndim - 1))
            self._pieces[i] = self._put(sl)
        return self._pieces[i]

    def span(self, i0: int, K: int) -> jnp.ndarray:
        """(K*piece, H, W, C) buffer of pieces [i0, i0+K)."""
        key = (i0, K)
        if key not in self._spans:
            self._spans = {k: v for k, v in self._spans.items()
                           if k[0] + k[1] > i0}  # retire stale concats
            self._spans[key] = jnp.concatenate(
                [self._piece(i) for i in range(i0, i0 + K)], axis=0)
        return self._spans[key]

    def evict_below(self, i0: int) -> None:
        for j in list(self._pieces):
            if j < i0:
                del self._pieces[j]


@dataclasses.dataclass(frozen=True)
class ScorerConfig:
    """Every FrameScorer knob, grouped (window geometry, loss temperatures,
    numerics, approximation levers, kernel dispatch). ``FrameScorer`` also
    accepts these as plain keyword arguments and builds/overrides a config
    from them, so call sites pick whichever shape reads better:
    ``FrameScorer(params, mcfg, teacher_stride=4)`` ==
    ``FrameScorer(params, mcfg, ScorerConfig(teacher_stride=4))``.

    The three approximation knobs are orthogonal and composable (all = 1
    -> reference-exact scores). Quality is quantified by
    tools/validate_fast_scoring.py; see BENCH.md for the measured
    Spearman / selection-agreement table.

    global_subsample s > 1: the teacher window keeps its +/-15-frame
      span but samples every s-th frame, e.g. s=4 turns the 30-frame
      teacher clip into 8 frames — the model's NATIVE temporal extent
      (no time-embed extrapolation) at ~3.7x less teacher compute.

    teacher_stride k > 1: the teacher forward runs only at every k-th
      scored frame; intermediate frames get interpolated teacher CLS
      features (``teacher_interp``: piecewise-linear, or Catmull-Rom —
      cubic buys deeper strides the curvature linear misses). Valid
      because consecutive global windows overlap 29/30 frames — the
      teacher feature curve is smooth in the window position (unlike the
      per-frame loss itself).

    score_stride m > 1: only every m-th frame is scored at all;
      intermediate per-frame losses are linearly interpolated (cubic
      measured WORSE here: the loss curve carries frame-rate noise that
      cubic overshoot amplifies — tools/validate_fast_scoring.py on the
      committed reference loss_msvd_4_3_30.json). Trades selection
      fidelity for throughput much faster than teacher_stride does.
    """

    local_size: int = 3
    global_size: int = 30
    chunk: int = 16
    teacher_temp: float = 0.02
    student_temp: float = 0.3
    compute_dtype: object = jnp.float32
    precision: Optional[str] = "highest"
    # Run the TEACHER forward in a different dtype than the students.
    # teacher_dtype=jnp.float32 with compute_dtype=bfloat16 gives the
    # mixed-teacher tier: teacher activations/carry in f32 (bf16 matmul
    # operands via the mixed fused path), students in production bf16.
    # Rationale: at teacher_temp 0.02 the softmaxed teacher distribution
    # is the score's sharpest noise amplifier, and in the strided modes
    # the teacher is a shrinking share of the FLOPs (1/k per frame), so
    # buying teacher precision is cheap there. None = same as
    # compute_dtype. Weights for the teacher are cast from the ORIGINAL
    # (usually f32) params, not the bf16 student copy.
    teacher_dtype: Optional[object] = None
    # Quantize the TEACHER's dense weights to int8 ("int8" enables):
    # W8A8 dynamic PTQ (ops/quant.py — per-channel weights from the
    # ORIGINAL params, per-token activations; attention einsums, norms
    # and softmax stay float). The teacher is ~80% of the strided modes'
    # FLOPs and the v5e MXU runs s8 at 2x bf16 peak, so this is the
    # economy tier's speed lever; quality is validated by the same
    # composite-vs-floor methodology as every other mode before any
    # default promotion. Quantized teachers run the XLA path (the fused
    # kernels are float-only; the phase gates fall back automatically).
    teacher_quant: Optional[str] = None
    # Quantize the STUDENT's dense weights to int8 ("int8" enables): the
    # same W8A8 dynamic PTQ as teacher_quant (ops/quant.py), applied to the
    # params the per-frame local-window forwards run. Rationale (r4): with
    # the guarded stride-8 teacher the STUDENTS are now the FLOP majority
    # (teacher_rows_frac ~0.13 — BENCH_r03), so the v5e MXU's 2x s8 tier
    # must apply to the student side to move the roofline. Quantization
    # noise enters the scored signal through log_softmax(s/0.3) — the
    # student temp (0.3) is 15x softer than the teacher's (0.02), so the
    # amplification is far milder than on the teacher side; validated by
    # the same composite-vs-bf16-floor methodology before any default
    # promotion (tools/validate_fast_scoring.py q8s rows).
    student_quant: Optional[str] = None
    global_subsample: int = 1
    teacher_stride: int = 1
    score_stride: int = 1
    teacher_img: int = 0
    teacher_interp: str = "linear"
    # WHAT the strided modes interpolate between teacher knots:
    # "cls" (default) interpolates the teacher's raw CLS features and
    # softmaxes the result inside the loss; "probs" softmaxes AT THE KNOTS
    # (inside the teacher kernel, at teacher_temp) and interpolates the
    # probability vectors. The scoring loss -sum(p_t * log_softmax(s)) is
    # LINEAR in p_t, so prob interpolation is exactly interpolation of the
    # loss the student would incur against each knot teacher. Quantified
    # and INVALIDATED as a default candidate (tools/validate_fast_scoring
    # "+pt" rows, tiny@32: k4 2.3% vs cls 1.9%, k8+cr 4.7% vs 3.1% mean
    # rel err): at temp 0.02 adjacent knot distributions are near-disjoint
    # one-hots, so their mixture is bimodal while the true intermediate
    # teacher is a single sharp mode — CLS-space interpolation tracks that
    # mode, prob-space cannot. Kept as an experimental knob.
    teacher_target: str = "cls"
    # Motion-adaptive teacher refinement (alpha > 0 enables): teacher
    # positions start on the coarse ``teacher_stride`` grid, then every
    # interval whose summed luma frame-difference exceeds alpha x the
    # video's mean interval motion gets its midpoint added (stride k -> k/2
    # locally). The teacher-CLS interpolation error concentrates exactly
    # where the window content changes fast (cuts/action), so the coarse
    # stride's FLOP savings are kept on smooth segments and spent where
    # they matter. Host-side: a strided-pixel |diff| over the wire luma
    # plane (~ms per video); positions stay deterministic per video.
    teacher_adaptive: float = 0.0
    # Error-adaptive teacher refinement (alpha > 0 enables): after the
    # stride-k teacher pass, compute each interior knot's leave-one-out
    # interpolation error IN FEATURE SPACE on device —
    # ||t_j - lerp(t_{j-1}, t_{j+1})|| / ||t_j|| — fetch the tiny error
    # vector (one readback per video/group), and bisect both intervals
    # around every knot whose error exceeds alpha. Unlike
    # ``teacher_adaptive`` (a pixel-motion proxy), this measures the
    # quantity the strided modes actually approximate — the teacher CLS
    # curve's local curvature — so it refines exactly where interpolation
    # is failing: smooth content keeps the full stride-k FLOP savings,
    # feature-noisy content self-degrades toward stride k/2. One
    # refinement round (stride k -> k/2 locally).
    teacher_refine: float = 0.0
    # Error-adaptive SCORE-STRIDE refinement (alpha > 0 enables, needs
    # score_stride m > 1): the sibling of ``teacher_refine`` applied to
    # the per-frame loss curve itself. After the stride-m student pass,
    # each interior scored knot's leave-one-out interpolation error —
    # |l_j - lerp(l_{j-1}, l_{j+1})| / mean(l) — is computed on the host
    # (the losses are scalars; the fetch this costs is the per-video sync
    # the caller pays anyway), and both intervals around every knot whose
    # error exceeds alpha are bisected with a second student pass (teacher
    # rows for the midpoints come from the already-computed teacher-knot
    # interpolation). Unguarded score_stride is the one validated-below-
    # quality-bar lever (BENCH.md turbo-max); the guard spends extra rows
    # exactly where the loss curve is measurably non-interpolable, so
    # smooth content keeps the stride-m savings and event-dense content
    # self-degrades toward full scoring. Normalization by the video's mean
    # knot loss matches what selection consumes (the CDF of loss/sum).
    score_refine: float = 0.0
    # Rows-fraction BAILOUT for the guarded score-stride (r5, VERDICT r4
    # weak-#3): when the guard's refinement would push a video's student
    # rows above this fraction, the stride saved nothing — and scoring the
    # flagged midpoints scattered pays WORSE chunk geometry than dense
    # scoring (measured: 288.7 vs 297.7-305.5 device-only on the noise
    # corpus at 0.89 rows). Bail to scoring every unscored frame instead:
    # contiguous positions pack full chunks and the reconstructed curve
    # carries zero interpolation error. 0 disables.
    score_bail: float = 0.9
    # Banded one-pass scoring (models/banded.py): process each frame ONCE
    # per pass instead of once per overlapping window. "both" runs a
    # banded student pass (band = local window) AND a banded teacher pass
    # (band = global window) — ~2 frame-units/frame instead of ~6.8, the
    # only roofline-consistent route to 1000 f/s (BENCH.md). "teacher"
    # keeps the exact windowed per-frame students and replaces only the
    # teacher with the banded pass (every frame gets a real banded teacher
    # row instead of a strided/interpolated one) — ~4 units/frame with the
    # exact student signal intact. Approximation quantified by
    # tools/validate_fast_scoring.py before any promotion; does not
    # compose with the strided/subsample knobs (asserted).
    band_mode: Optional[str] = None  # None | "both" | "teacher"
    # Frames per banded dispatch (videos longer than this are processed in
    # overlapping segments) and the overlap halo: emitted frames near a
    # segment seam keep their full CLS window (halo >= global_size/2
    # enforced) and lose only receptive field beyond +-halo.
    band_chunk: int = 512
    band_halo: int = 32
    # Query-block size of the slab-blocked banded attention (keys per
    # query = block + 2*(window-1), so smaller blocks waste fewer FLOPs
    # on out-of-band keys at more dispatch steps).
    band_block: int = 32
    # Student dispatch batching: fuse this many model-batch chunks into
    # ONE device dispatch (lax.scan inside the jit — numerics identical,
    # the scan body is the single-chunk computation on the same rows).
    # The strided modes' student pass is the dispatch-count hot spot
    # (~15 dispatches per 480-frame video at chunk 32); each dispatch
    # pays enqueue latency + a stream bubble, measured as most of the
    # kernel-sum -> e2e residual (BENCH.md headroom #1). Short videos
    # clamp it to ceil(rows/chunk), so tiny inputs don't pay padding.
    student_dispatch: int = 4
    use_pallas: str | bool = "auto"
    piece: int = PIECE
    # How 2D-packed frames are interpreted by the device gather kernel:
    # "yuv420" = the codec's I420 planes (default); "yuv420q" = I420 with
    # chroma box-averaged to 1/8 resolution per axis (~1.03 B/px).
    # yuv420q is an INVALIDATED experiment kept as a knob: 16-27% rel
    # score error on the synthetic validators vs the ~3-5% bf16 floor
    # (tests/test_yuv_wire.py quantification; BENCH.md "The wire") —
    # chroma carries real DINO-feature signal. 3D RGB frames are
    # unaffected by this knob.
    wire_format: str = "yuv420"
    # Enforced clamp guard (VERDICT r3 weak-#7): before enabling the fused
    # Pallas path, measure the model's attention-logit margin on a probe
    # forward and auto-fall back to XLA (with a logged reason) if it comes
    # within the safety factor of the kernels' ±80 max-free-softmax clamp.
    # CLIs scoring CONVERTED real checkpoints set this; random-init /
    # library builds skip the probe cost.
    clamp_check: bool = False
    # Pin this scorer to one local device (jax.Device). Scoring is
    # embarrassingly parallel over videos (SURVEY §5): N scorers pinned to
    # N local chips, fed round-robin by run_scoring, scale videos/min
    # near-linearly WITHOUT multi-process launch (the TPU-native answer to
    # the reference's torch.distributed.launch sharding — which remains
    # available as --shard_id/--num_shards for multi-host). None = the
    # process default device.
    device: Optional[object] = None


class FrameScorer:
    """Compiled batched scorer for one model + window geometry."""

    def __init__(
        self,
        params,
        model_cfg: tsf.TimeSformerConfig,
        config: Optional[ScorerConfig] = None,
        **overrides,
    ):
        if config is None:
            config = ScorerConfig(**overrides)
        elif overrides:
            config = dataclasses.replace(config, **overrides)
        self.config = config
        self.model_cfg = model_cfg
        self.local_size = config.local_size
        self.global_size = config.global_size
        self.chunk = config.chunk
        self.teacher_temp = config.teacher_temp
        self.student_temp = config.student_temp
        self.compute_dtype = compute_dtype = config.compute_dtype
        self.precision = config.precision
        self.piece = config.piece
        self.global_subsample = max(1, int(config.global_subsample))
        self.teacher_stride = max(1, int(config.teacher_stride))
        self.score_stride = max(1, int(config.score_stride))
        if config.teacher_interp not in ("linear", "catmullrom"):
            raise ValueError(f"teacher_interp={config.teacher_interp!r}")
        self.teacher_interp = config.teacher_interp
        if config.teacher_target not in ("cls", "probs"):
            raise ValueError(f"teacher_target={config.teacher_target!r}")
        self.teacher_target = config.teacher_target
        self.teacher_adaptive = max(0.0, float(config.teacher_adaptive))
        self.teacher_refine = max(0.0, float(config.teacher_refine))
        self.score_refine = max(0.0, float(config.score_refine))
        self.student_dispatch = max(1, int(config.student_dispatch))
        self.band_mode = config.band_mode
        if self.band_mode is not None:
            if self.band_mode not in ("both", "teacher"):
                raise ValueError(f"band_mode={self.band_mode!r}")
            incompatible = {
                "teacher_stride": self.teacher_stride > 1,
                "score_stride": self.score_stride > 1,
                "global_subsample": self.global_subsample > 1,
                "teacher_img": bool(config.teacher_img),
                "teacher_target": config.teacher_target != "cls",
                "teacher_adaptive": self.teacher_adaptive > 0,
                "teacher_refine": self.teacher_refine > 0,
                "score_refine": self.score_refine > 0,
            }
            bad = [k for k, v in incompatible.items() if v]
            if bad:
                raise ValueError(
                    f"band_mode does not compose with {bad}: the banded "
                    "pass already computes every frame once")
            if config.band_halo < self.global_size // 2:
                raise ValueError(
                    f"band_halo={config.band_halo} must cover half the "
                    f"global window ({self.global_size // 2}) so seam "
                    "frames keep their full CLS window")
            if config.band_chunk < self.global_size:
                raise ValueError("band_chunk must be >= global_size")
        teacher_img = config.teacher_img
        use_pallas = config.use_pallas
        # teacher_img r > 0: the teacher's global windows are bilinearly
        # resized to r x r ON DEVICE before the teacher forward (the model
        # interpolates its positional grid to the new geometry).
        # INVALIDATED on this chip, twice over: measured SLOWER than turbo
        # (118 vs 139 f/s — a 101-token teacher runs at ~20% MFU, eating
        # the quadratic FLOP savings) and far above the quality floor
        # (Spearman ~0.54 worst-case, rel err ~19% on the live validator;
        # eval_logs/lowres_validation_96.json). Kept as an experimental
        # knob for hardware where small-sequence kernels are cheaper.
        self.teacher_img = int(teacher_img)
        if self.teacher_img:
            # the reference's pos-embed resize quirk (H_new = n_tokens//W
            # counting CLS) breaks on a 1x1 patch grid; require >= 2x2
            assert self.teacher_img >= 2 * model_cfg.patch_size, (
                self.teacher_img, model_cfg.patch_size)
        self.mean = jnp.asarray([0.45, 0.45, 0.45], jnp.float32)
        self.std = jnp.asarray([0.225, 0.225, 0.225], jnp.float32)
        self._prep = None
        # Fused block-phase Pallas kernels (ops/fused_block.py): LN+QKV+
        # attention+proj and LN+MLP each collapse to one VMEM-resident
        # kernel — measured 918->544 ms on the chunk-32 teacher forward
        # (the phases are HBM-bound in XLA; see BENCH.md). Dispatch is
        # PER-MODEL via TimeSformerConfig.use_fused (two scorers with
        # different settings coexist in one process) and dtype-gated (bf16
        # only), so exact-f32 scorers keep the XLA path. "auto" enables it
        # on real TPUs; True forces it (interpret mode off-TPU, for
        # tests); False leaves XLA.
        from ..ops.fused_block import ensure_fused_safe, should_fuse

        fuse = use_pallas is True or (use_pallas == "auto"
                                      and should_fuse(compute_dtype))
        if fuse and config.clamp_check:
            # enforced guard for converted real checkpoints: measured
            # logit margin near the kernels' softmax clamp -> XLA path
            fuse = ensure_fused_safe(params, model_cfg, True,
                                     where="FrameScorer")
        if fuse:
            # fused_wb: the block stack runs the whole-block kernel pair
            # (f32 intra-block carries; boundaries in the compute dtype):
            # mixed-tier forwards keep their numerics at 1/3 less carry
            # HBM, bf16 forwards drop to one carry rounding per block
            # (floor 6.1% -> 4.2%). Oversized windows fall back to the
            # per-phase kernels inside the forward's gate.
            self.model_cfg = model_cfg = dataclasses.replace(
                model_cfg, use_fused=True, fused_wb=True)
        src_params = params
        if compute_dtype == jnp.bfloat16:
            params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        else:
            params = jax.tree.map(jnp.asarray, params)
        t_dtype = config.teacher_dtype
        if t_dtype is None or jnp.dtype(t_dtype) == jnp.dtype(compute_dtype):
            self.teacher_dtype = compute_dtype
            t_params = params
        else:
            self.teacher_dtype = t_dtype
            # from the ORIGINAL precision, not the student's bf16 copy
            t_params = jax.tree.map(
                lambda x: jnp.asarray(x, t_dtype), src_params)
        # int8 teacher (the economy tier): quantize the block dense
        # weights from the ORIGINAL params (ops/quant.py). Routing is
        # per-params-tree: the whole-block kernel pair consumes qkernel
        # weights directly (s8 x s8 -> s32 on the MXU at 2x bf16 peak);
        # non-wb fused paths fall back to XLA, whose linear() also
        # consumes qkernel. Students are untouched.
        self.teacher_quant = config.teacher_quant
        self.t_model_cfg = model_cfg
        if self.teacher_quant is not None:
            if self.teacher_quant != "int8":
                raise ValueError(f"teacher_quant={self.teacher_quant!r}")
            from ..ops.quant import quantize_tree_int8

            t_params = quantize_tree_int8(src_params)
        # int8 STUDENT (the r4 roofline lever — students are the FLOP
        # majority under the guarded stride-8 teacher): same W8A8 scheme
        # from the ORIGINAL params; the student forwards then ride the
        # whole-block kernels' s8 x s8 -> s32 MXU tier (or XLA's
        # qkernel-consuming linear() off the wb path).
        self.student_quant = config.student_quant
        if self.student_quant is not None:
            if self.student_quant != "int8":
                raise ValueError(f"student_quant={self.student_quant!r}")
            from ..ops.quant import quantize_tree_int8

            params = quantize_tree_int8(src_params)
        self.device = config.device
        if self.device is not None:
            # Commit the replica to the pinned device: every jit that
            # consumes these params (and the committed piece uploads)
            # then executes there, so N scorers drive N chips from one
            # process with no collective traffic (videos are independent).
            params = jax.device_put(params, self.device)
            if t_params is not params:
                t_params = jax.device_put(t_params, self.device)
            else:
                t_params = params
        self.params = params
        self.t_params = t_params
        self._jitted: Dict[object, object] = {}
        self._dummy_loss: Optional[float] = None
        # dispatch accounting (observability for the adaptive modes): how
        # many teacher / student window rows this scorer has computed —
        # the adaptive refinement's actual FLOP cost is data-dependent, so
        # tools (validate_fast_scoring) and users read it here
        self.stats = {"teacher_rows": 0, "student_rows": 0,
                      # banded-mode accounting: chunk rows actually
                      # processed per pass (padding + seam halo included)
                      # and the analytic FLOPs they cost — the honest MFU
                      # denominators for bench.py
                      "band_teacher_frames": 0, "band_student_frames": 0,
                      "band_flops": 0.0}

    # -- compiled kernels ------------------------------------------------------

    def _wrap(self, fn):
        if self.precision:
            fn = partial(_with_matmul_precision, self.precision, fn)
        return jax.jit(fn)

    def _gather_views(self, frames, idx, n_view, dtype=None):
        """Gather (chunk, n_view, H, W, C) windows from the piece span and
        normalize: wire data is converted to normalized compute dtype here,
        INSIDE the chunk kernel — doing it per uploaded piece would enqueue
        a computation per piece and serialize the compute stream behind
        every transfer (in-order launch semantics).

        Wire layouts: (N, H, W, 3) RGB (uint8 or pre-normalized float), or
        packed I420 (N, H*3//2, W) uint8 — the codec's planar 4:2:0 at half
        the wire bytes, color-converted here on device (data/yuv.py)."""
        dtype = self.compute_dtype if dtype is None else dtype
        v = jnp.take(frames, idx.reshape(-1), axis=0)
        v = v.reshape(self.chunk, n_view, *frames.shape[1:])
        if v.ndim == 4:  # packed planes: upsample chroma + color matrix + norm
            unpack = (yuv.unpack_normalize_q
                      if self.config.wire_format == "yuv420q"
                      else yuv.unpack_normalize)
            v = unpack(v, self.mean, self.std, dtype)
        elif v.dtype == jnp.uint8:
            vf = v.astype(jnp.float32) / 255.0
            v = ((vf - self.mean) / self.std)
        v = v.astype(dtype)
        return v.transpose(0, 4, 1, 2, 3)  # (B, T, H, W, C) -> (B, C, T, H, W)

    def _resize_teacher(self, v):
        """(B, C, T, H, W) -> teacher_img spatial size, bilinear, on device."""
        if not self.teacher_img or v.shape[-1] == self.teacher_img:
            return v
        B, C, T, _, _ = v.shape
        return jax.image.resize(
            v, (B, C, T, self.teacher_img, self.teacher_img), method="bilinear")

    def _build(self, eff_global: int):
        """Fused exact kernel: both forwards + loss for a chunk of frames.
        ``params`` is the (student_params, teacher_params) pair — the same
        tree twice unless teacher_dtype differs."""
        cfg = self.model_cfg
        dtype = self.compute_dtype
        t_dtype = self.teacher_dtype

        t_cfg = self.t_model_cfg

        def score_chunk(params, frames, loc_idx, glob_idx):
            local = self._gather_views(frames, loc_idx, self.local_size)
            glob = self._resize_teacher(
                self._gather_views(frames, glob_idx, eff_global,
                                   dtype=t_dtype))
            s = tsf.forward(params[0], local, cfg, compute_dtype=dtype)
            t = tsf.forward(params[1], glob, t_cfg, compute_dtype=t_dtype)
            return scoring_dino_loss(
                s, t, teacher_temp=self.teacher_temp,
                student_temp=self.student_temp)

        return self._wrap(score_chunk)

    def _build_teacher(self, eff_global: int):
        """(params_pair, frames, glob_idx (chunk, G)) -> (chunk, D) f32
        teacher rows: raw CLS features (teacher_target="cls"), or their
        teacher_temp softmax ("probs" — the knot distributions the strided
        modes then interpolate directly)."""
        cfg = self.t_model_cfg
        t_dtype = self.teacher_dtype
        probs = self.teacher_target == "probs"

        def teacher_chunk(params, frames, glob_idx):
            glob = self._resize_teacher(
                self._gather_views(frames, glob_idx, eff_global,
                                   dtype=t_dtype))
            t = tsf.forward(params[1], glob, cfg,
                            compute_dtype=t_dtype).astype(jnp.float32)
            if probs:
                t = jax.nn.softmax(t / self.teacher_temp, axis=-1)
            return t

        return self._wrap(teacher_chunk)

    def _build_student(self, sub: int = 1):
        """(params_pair, frames, loc_idx (sub*chunk, L), t_rows
        (sub*chunk, D)) -> (sub*chunk,) per-frame losses against the
        provided teacher rows (CLS features, or ready probabilities when
        teacher_target="probs" — the loss is linear in the probs, so
        interpolated rows are valid as-is).

        ``sub`` > 1 fuses that many model-batch chunks into ONE device
        dispatch via lax.scan (identical numerics — the scan body is the
        sub=1 computation on the same chunk rows). The student pass is
        ~15 dispatches per 480-frame video at chunk 32; on the bench
        tunnel each dispatch costs enqueue latency + a stream bubble, so
        batching them 4-up removes most of the residual between the
        kernel-sum ceiling and the measured rate (BENCH.md headroom #1)."""
        cfg = self.model_cfg
        dtype = self.compute_dtype
        probs = self.teacher_target == "probs"

        def one_chunk(params, frames, loc_idx, t_rows):
            local = self._gather_views(frames, loc_idx, self.local_size)
            s = tsf.forward(params[0], local, cfg, compute_dtype=dtype)
            if probs:
                logp = jax.nn.log_softmax(
                    s.astype(jnp.float32) / self.student_temp, axis=-1)
                return -jnp.sum(t_rows.astype(jnp.float32) * logp, axis=-1)
            return scoring_dino_loss(
                s, t_rows, teacher_temp=self.teacher_temp,
                student_temp=self.student_temp)

        if sub == 1:
            return self._wrap(one_chunk)

        def student_chunks(params, frames, loc_idx, t_rows):
            li = loc_idx.reshape(sub, self.chunk, loc_idx.shape[-1])
            tr = t_rows.reshape(sub, self.chunk, t_rows.shape[-1])

            def body(_, xs):
                idx, rows = xs
                return None, one_chunk(params, frames, idx, rows)

            _, losses = jax.lax.scan(body, None, (li, tr))
            return losses.reshape(-1)

        return self._wrap(student_chunks)

    # -- banded one-pass kernels ------------------------------------------------

    def _gather_frames(self, frames, idx, dtype):
        """Flat (Cb,) gather + normalize from a piece span: (Cb, H, W, 3)
        channels-last — the banded passes' input (each frame appears once;
        no window duplication ever materializes)."""
        v = jnp.take(frames, idx, axis=0)
        if v.ndim == 3:  # packed I420 planes (Cb, rows, W)
            unpack = (yuv.unpack_normalize_q
                      if self.config.wire_format == "yuv420q"
                      else yuv.unpack_normalize)
            return unpack(v[:, None], self.mean, self.std, dtype)[:, 0]
        if v.dtype == jnp.uint8:
            vf = v.astype(jnp.float32) / 255.0
            v = (vf - self.mean) / self.std
        return v.astype(dtype)

    def _build_band_pass(self, kind: str, Cb: int, eff: int):
        """jit: (params_pair, span, idx (Cb,), t_real) -> (Cb, D) f32 CLS
        rows of one banded pass (models/banded.py)."""
        if kind == "student":
            cfg, dtype, pidx = self.model_cfg, self.compute_dtype, 0
        else:
            cfg, dtype, pidx = self.t_model_cfg, self.teacher_dtype, 1
        block = self.config.band_block

        def run(params, span, idx, t_real):
            fr = self._gather_frames(span, idx, dtype)
            return banded.banded_cls_features(
                params[pidx], fr, t_real, cfg, eff=eff,
                compute_dtype=dtype, block=block)

        return self._wrap(run)

    def _get_band(self, kind: str, Cb: int, eff: int):
        key = ("band", kind, Cb, eff)
        if key not in self._jitted:
            self._jitted[key] = self._build_band_pass(kind, Cb, eff)
        return self._jitted[key]

    def _band_loss_fn(self):
        if "band_loss" not in self._jitted:
            def f(s_rows, t_rows):
                return scoring_dino_loss(
                    s_rows, t_rows, teacher_temp=self.teacher_temp,
                    student_temp=self.student_temp)
            self._jitted["band_loss"] = jax.jit(f)
        return self._jitted["band_loss"]

    def _band_segments(self, T: int):
        """[(w0, w1, e0, e1)]: compute windows [w0, w1) tiling the video
        with ``band_halo`` overlap; rows [e0, e1) are emitted."""
        cap = self.config.band_chunk
        if T <= cap:
            return [(0, T, 0, T)]
        halo = self.config.band_halo
        step = cap - 2 * halo
        segs, e0 = [], 0
        while e0 < T:
            e1 = min(e0 + step, T)
            segs.append((max(0, e0 - halo), min(T, e1 + halo), e0, e1))
            e0 = e1
        return segs

    _BAND_BUCKETS = (64, 128, 256, 384, 512)

    def _band_bucket(self, n: int) -> int:
        """Pad segment lengths to a few static shapes so the jit cache
        stays small and short videos don't pay full-cap padding."""
        cap = self.config.band_chunk
        for b in self._BAND_BUCKETS:
            if b >= cap:
                break
            if n <= b:
                return b
        return cap if n <= cap else n

    def _get(self, eff_global: int):
        if eff_global not in self._jitted:
            self._jitted[eff_global] = self._build(eff_global)
        return self._jitted[eff_global]

    def _get_split(self, eff_global: int, sub: int = 1):
        # cached separately: the teacher kernel depends only on the window
        # geometry, the student kernel only on the dispatch-batch factor
        tkey = ("teacher", eff_global)
        if tkey not in self._jitted:
            self._jitted[tkey] = self._build_teacher(eff_global)
        skey = ("student", sub)
        if skey not in self._jitted:
            self._jitted[skey] = self._build_student(sub)
        return self._jitted[tkey], self._jitted[skey]

    def _student_sub(self, n_rows: int) -> int:
        """Dispatch-batching factor for a student pass of ``n_rows``:
        config.student_dispatch clamped so short inputs don't pad a
        super-chunk (at most ceil(rows/chunk) chunks exist)."""
        return max(1, min(self.student_dispatch,
                          -(-n_rows // self.chunk)))

    def _make_buffer(self, frames: np.ndarray) -> _PieceBuffer:
        if frames.dtype != np.uint8:
            # normalized-float input: ship in compute dtype (bf16 halves
            # the wire bytes vs f32); uint8 ships as-is (1 B/px)
            frames = frames.astype(np.dtype(self.compute_dtype))
        return _PieceBuffer(frames, self.piece, device=self.device)

    # -- chunk runner ------------------------------------------------------------

    def _run_chunks_async(self, fn, buf: _PieceBuffer, positions: np.ndarray,
                          idx_mats: List[np.ndarray], extra_rows=None,
                          evict: bool = True,
                          chunk: Optional[int] = None) -> List[tuple]:
        """Run a chunked kernel over a subset of frame positions, WITHOUT
        fetching: returns [(device_out, n_valid)] with all dispatches queued.

        fn(params, span, *idx_chunks[, extra_chunk]) -> (chunk, ...).
        ``idx_mats`` are (T, W_i) window-index maps in the video timeline;
        rows are taken at ``positions``. ``extra_rows`` may be a host array
        or a device array (device arrays keep the whole chain sync-free).
        Pieces are uploaded ahead of the compute dispatches (LOOKAHEAD
        pieces) and evicted behind them. ``chunk`` overrides the rows per
        dispatch (the dispatch-batched student kernels take
        student_dispatch * self.chunk rows at once).
        """
        chunk = self.chunk if chunk is None else chunk
        P = buf.piece
        n_pos = len(positions)
        lookahead = 8

        # per-chunk piece spans; K = max span so all chunks share one shape
        chunk_rows = [positions[c0:c0 + chunk]
                      for c0 in range(0, n_pos, chunk)]
        spans = []
        K = 1
        for rows in chunk_rows:
            mats = [m[rows] for m in idx_mats]
            lo = min(int(m.min()) for m in mats)
            hi = max(int(m.max()) for m in mats)
            i0 = lo // P
            k = hi // P - i0 + 1
            K = max(K, k)
            spans.append((i0, mats))

        if extra_rows is not None:
            # one padded (n_chunks, chunk, D) view so the per-chunk slice is
            # a single cheap device (or host) op
            n_chunks = len(chunk_rows)
            pad = n_chunks * chunk - extra_rows.shape[0]
            xp = jnp if isinstance(extra_rows, jnp.ndarray) else np
            extra_mat = xp.pad(extra_rows, ((0, pad), (0, 0))).reshape(
                n_chunks, chunk, extra_rows.shape[1])

        outs = []
        inflight: List[jnp.ndarray] = []
        for ci, ((i0, mats), rows) in enumerate(zip(spans, chunk_rows)):
            if evict:
                buf.evict_below(i0)
            buf.fire_until(i0 + K + lookahead)
            span = buf.span(i0, K)
            n = len(rows)
            args = [(self.params, self.t_params), span]
            for m in mats:
                rel = m - i0 * P
                if n < chunk:
                    rel = np.pad(rel, ((0, chunk - n), (0, 0)))
                args.append(jnp.asarray(rel))
            if extra_rows is not None:
                args.append(jnp.asarray(extra_mat[ci]))
            out = fn(*args)
            inflight.append(out)
            outs.append((out, n))
            if len(inflight) > MAX_INFLIGHT:
                # drain the oldest dispatch so the device queue (and piece
                # memory for very long videos) stays bounded
                inflight.pop(0).block_until_ready()
        return outs

    def _run_chunks(self, fn, buf: _PieceBuffer, positions: np.ndarray,
                    idx_mats: List[np.ndarray], extra_rows=None,
                    evict: bool = True) -> np.ndarray:
        """Synchronous wrapper: queue all chunks, fetch once."""
        outs = self._run_chunks_async(fn, buf, positions, idx_mats,
                                      extra_rows=extra_rows, evict=evict)
        return _fetch_outs(outs)

    # -- public API ------------------------------------------------------------

    def score_video_async(self, frames: np.ndarray, local_idx: np.ndarray,
                          global_idx: np.ndarray, eff_global: int,
                          buf: Optional[_PieceBuffer] = None) -> "PendingScore":
        """Queue all of one video's scoring work; NO host sync.

        Returns a PendingScore whose .fetch() yields the (T,) losses.
        The whole chain — including the strided modes' teacher->student
        feature hand-off, which is linearly interpolated ON DEVICE — stays
        on the dispatch stream, so a caller can pipeline video i+1's
        uploads/compute behind video i's pending fetch (run_scoring does).

        ``buf`` (optional): a pre-built _PieceBuffer for ``frames`` —
        callers that keep a video device-resident across calls (bench.py's
        wire-independent companion) pass it so no re-upload happens.
        """
        if self.band_mode is not None:
            return self._score_video_banded_async(
                frames, local_idx, eff_global, buf=buf)
        if self.global_subsample > 1:
            global_idx = global_idx[:, ::self.global_subsample]
            eff_global = global_idx.shape[1]
        if self.teacher_stride > 1 or self.score_stride > 1:
            return self._score_video_strided_async(
                frames, local_idx, global_idx, eff_global, buf=buf)
        T = frames.shape[0]
        fn = self._get(eff_global)
        if buf is None:
            buf = self._make_buffer(frames)
        self.stats["teacher_rows"] += T
        self.stats["student_rows"] += T
        outs = self._run_chunks_async(
            fn, buf, np.arange(T), [local_idx, global_idx],
            evict=buf.n_pieces > MAX_RESIDENT_PIECES)
        return PendingScore(outs)

    def score_video(self, frames: np.ndarray, local_idx: np.ndarray,
                    global_idx: np.ndarray, eff_global: int) -> np.ndarray:
        """frames (T, H, W, C) float32 normalized or uint8; returns (T,)
        losses. Uploads are pipelined with compute; one host sync per video.
        """
        return self.score_video_async(
            frames, local_idx, global_idx, eff_global).fetch()

    def _score_video_banded_async(self, frames: np.ndarray,
                                  local_idx: np.ndarray, eff_global: int,
                                  buf: Optional[_PieceBuffer] = None
                                  ) -> "PendingScore":
        """Banded one-pass scoring (ScorerConfig.band_mode): per segment,
        one banded teacher pass (+ one banded student pass in "both" mode,
        or the exact windowed student chunks in "teacher" mode). All
        dispatches are queued sync-free like the other paths."""
        from ..utils import flops as flops_mod

        T = frames.shape[0]
        mode = self.band_mode
        if buf is None:
            buf = self._make_buffer(frames)
        evict = buf.n_pieces > MAX_RESIDENT_PIECES
        P = buf.piece
        loss_fn = self._band_loss_fn()
        cfg = self.model_cfg
        outs: List[tuple] = []
        t_parts = []
        for (w0, w1, e0, e1) in self._band_segments(T):
            Lw = w1 - w0
            Cb = self._band_bucket(Lw)
            i0 = w0 // P
            K = (w1 - 1) // P - i0 + 1
            if evict:
                buf.evict_below(i0)
            buf.fire_until(i0 + K + 8)
            span = buf.span(i0, K)
            idx = jnp.asarray(
                np.minimum(w0 + np.arange(Cb), w1 - 1) - i0 * P)
            t_real = jnp.asarray(Lw, jnp.int32)
            pair = (self.params, self.t_params)
            from ..ops.banded_block import banded_ok

            fused = bool(cfg.use_fused) and banded_ok(cfg.embed_dim,
                                                      cfg.num_heads)
            t_fn = self._get_band("teacher", Cb, eff_global)
            t_rows = t_fn(pair, span, idx, t_real)
            self.stats["band_teacher_frames"] += Cb
            self.stats["band_flops"] += flops_mod.banded_pass_flops(
                cfg, Cb, eff_global, self.config.band_block, fused=fused)
            if mode == "both":
                s_fn = self._get_band("student", Cb, self.local_size)
                s_rows = s_fn(pair, span, idx, t_real)
                self.stats["band_student_frames"] += Cb
                self.stats["band_flops"] += flops_mod.banded_pass_flops(
                    cfg, Cb, self.local_size, self.config.band_block,
                    fused=fused)
                losses = loss_fn(s_rows, t_rows)
                outs.append((losses[e0 - w0:e1 - w0], e1 - e0))
            else:
                t_parts.append(t_rows[e0 - w0:e1 - w0])
        self.stats["teacher_rows"] += T
        self.stats["student_rows"] += T
        if mode == "both":
            return PendingScore(outs)
        # "teacher" hybrid: exact windowed students against the banded
        # per-frame teacher rows (device-resident hand-off, no sync)
        t_all = (t_parts[0] if len(t_parts) == 1
                 else jnp.concatenate(t_parts, axis=0))
        sub = self._student_sub(T)
        skey = ("student", sub)
        if skey not in self._jitted:
            self._jitted[skey] = self._build_student(sub)
        outs = self._run_chunks_async(
            self._jitted[skey], buf, np.arange(T), [local_idx],
            extra_rows=t_all, evict=evict, chunk=self.chunk * sub)
        return PendingScore(outs)

    def _teacher_positions(self, pos: np.ndarray,
                           frames: np.ndarray) -> np.ndarray:
        """Teacher knot positions (frame timeline) for the strided modes.

        Uniform: every ``teacher_stride``-th scored position plus the last.
        With ``teacher_adaptive`` alpha > 0, intervals whose summed luma
        motion exceeds alpha x the mean interval motion are bisected
        (ScorerConfig docstring; quality rows in BENCH.md)."""
        k = self.teacher_stride
        tsel = np.arange(0, len(pos), k)
        if tsel[-1] != len(pos) - 1:
            tsel = np.append(tsel, len(pos) - 1)
        tpos = pos[tsel]
        if self.teacher_adaptive <= 0.0 or k < 2 or len(tpos) < 2:
            return tpos
        motion = _motion_energy(frames, self.config.wire_format)
        csum = np.concatenate([[0.0], np.cumsum(motion)])
        intervals = csum[tpos[1:]] - csum[tpos[:-1]]  # motion per interval
        mean = float(intervals.mean())
        if mean <= 0.0:
            return tpos
        mids = []
        for i in np.nonzero(intervals > self.teacher_adaptive * mean)[0]:
            lo, hi = tsel[i], tsel[i + 1]
            if hi - lo >= 2:
                mids.append(pos[(lo + hi) // 2])
        if not mids:
            return tpos
        return np.unique(np.concatenate(
            [tpos, np.asarray(mids, dtype=tpos.dtype)]))

    # -- error-adaptive teacher refinement ---------------------------------

    def _loo_errs_fn(self):
        """Jitted leave-one-out knot error: feats (n, D), w (n-2,) lerp
        weights -> (n-2,) relative L2 error of each interior knot vs the
        linear interpolation of its neighbors. The direct measurement of
        how interpolable the teacher CLS curve is at this stride."""
        if "loo" not in self._jitted:
            def loo(feats, w):
                f = feats.astype(jnp.float32)
                t_hat = f[:-2] * (1.0 - w)[:, None] + f[2:] * w[:, None]
                num = jnp.linalg.norm(f[1:-1] - t_hat, axis=-1)
                den = jnp.linalg.norm(f[1:-1], axis=-1) + 1e-6
                return num / den
            self._jitted["loo"] = jax.jit(loo)
        return self._jitted["loo"]

    def _loo_weights(self, tpos: np.ndarray) -> np.ndarray:
        return ((tpos[1:-1] - tpos[:-2]).astype(np.float32)
                / np.maximum(tpos[2:] - tpos[:-2], 1))

    def _refine_mids(self, tpos: np.ndarray, errs: np.ndarray) -> np.ndarray:
        """Midpoints of both intervals around every interior knot whose LOO
        error exceeds ``teacher_refine`` (one bisection round: stride k ->
        k/2 locally)."""
        mids = set()
        for i in np.nonzero(errs > self.teacher_refine)[0]:
            for a, b in ((i, i + 1), (i + 1, i + 2)):
                if tpos[b] - tpos[a] >= 2:
                    mids.add((int(tpos[a]) + int(tpos[b])) // 2)
        mids -= set(int(p) for p in tpos)
        return np.asarray(sorted(mids), dtype=tpos.dtype)

    # -- error-adaptive score-stride refinement ----------------------------

    def _loss_refine_mids(self, pos: np.ndarray,
                          losses: np.ndarray) -> np.ndarray:
        """Midpoints of both intervals around every scored knot whose
        loss-curve leave-one-out interpolation error exceeds
        ``score_refine`` (relative to the video's mean knot loss — the
        scale the CDF selection normalizes by)."""
        if len(pos) < 3:
            return np.empty(0, pos.dtype)
        l = np.asarray(losses, np.float64)
        w = ((pos[1:-1] - pos[:-2]).astype(np.float64)
             / np.maximum(pos[2:] - pos[:-2], 1))
        l_hat = l[:-2] * (1.0 - w) + l[2:] * w
        scale = max(float(np.abs(l).mean()), 1e-12)
        errs = np.abs(l[1:-1] - l_hat) / scale
        mids = set()
        for i in np.nonzero(errs > self.score_refine)[0]:
            for a, b in ((i, i + 1), (i + 1, i + 2)):
                if pos[b] - pos[a] >= 2:
                    mids.add((int(pos[a]) + int(pos[b])) // 2)
        mids -= set(int(p) for p in pos)
        return np.asarray(sorted(mids), dtype=pos.dtype)

    def _score_refine_rows(self, pos: np.ndarray, losses: np.ndarray,
                           T: int) -> np.ndarray:
        """Refinement rows for the guarded score-stride, with the
        rows-fraction bailout (ScorerConfig.score_bail): if the flagged
        midpoints would push this video's scored rows above the bail
        fraction, score EVERY unscored frame instead — same order of row
        count, contiguous chunk geometry, and the final curve needs no
        interpolation at all."""
        mids = self._loss_refine_mids(pos, losses)
        bail = self.config.score_bail
        if bail > 0 and len(mids) and len(pos) + len(mids) >= bail * T:
            mids = np.setdiff1d(np.arange(T, dtype=pos.dtype), pos)
        return mids

    def _score_refine_fetch(self, outs, buf, pos, local_idx, tpos, t_feats,
                            eff_global: int, T: int):
        """Deferred-fetch closure for the guarded score-stride: fetch the
        stride-m losses (the per-video sync the caller pays anyway),
        bisect the measurably non-interpolable intervals with a second
        student pass (teacher rows interpolated from the existing knots),
        and return the full (T,) curve. Runs at PendingScore.fetch() time
        so the base pass stays fully async."""

        def fetch():
            losses = _fetch_outs(outs)
            mids = self._score_refine_rows(pos, losses, T)
            if not len(mids):
                return np.interp(np.arange(T), pos, losses)
            self.stats["student_rows"] += len(mids)
            t_mids = _interp_rows(tpos, t_feats, mids, self.teacher_interp)
            sub = self._student_sub(len(mids))
            _, student_fn = self._get_split(eff_global, sub)
            m_outs = self._run_chunks_async(
                student_fn, buf, mids, [local_idx], extra_rows=t_mids,
                evict=False, chunk=self.chunk * sub)
            m_losses = _fetch_outs(m_outs)
            all_pos = np.concatenate([pos, mids])
            order = np.argsort(all_pos)
            return np.interp(np.arange(T), all_pos[order],
                             np.concatenate([losses, m_losses])[order])

        return fetch

    @staticmethod
    def _merge_knots(tpos: np.ndarray, feats, mids: np.ndarray, m_feats):
        """Sorted union of (tpos, feats) and (mids, m_feats); feats stay on
        device (the gather rides the dispatch stream)."""
        order = np.argsort(np.concatenate([tpos, mids]))
        merged = np.concatenate([tpos, mids])[order]
        f = jnp.concatenate([feats, m_feats], axis=0)[jnp.asarray(order)]
        return merged, f

    def _score_video_strided_async(self, frames, local_idx, global_idx,
                                   eff_global: int,
                                   buf: Optional[_PieceBuffer] = None
                                   ) -> "PendingScore":
        """Teacher-stride / score-stride scoring.

        Scored positions: every ``score_stride``-th frame (+ the last
        frame). Teacher positions: every ``teacher_stride``-th scored
        position (+ the last scored position). Teacher CLS features are
        computed at teacher positions only and linearly interpolated (in
        feature space, on device) for the scored positions between them;
        per-frame losses at unscored positions are linearly interpolated.
        All approximations are quantified in BENCH.md /
        tests/test_fast_scoring.py.
        """
        T = frames.shape[0]
        m = self.score_stride

        pos = np.arange(0, T, m)
        if pos[-1] != T - 1:
            pos = np.append(pos, T - 1)
        sub = self._student_sub(len(pos))
        teacher_fn, student_fn = self._get_split(eff_global, sub)
        tpos = self._teacher_positions(pos, frames)  # frame timeline

        # pass A: teacher features at tpos. When the whole video fits in
        # the resident-piece budget, both passes share one buffer so each
        # frame crosses the wire ONCE; longer videos stream per pass with
        # eviction (wire cost overlapped with compute either way).
        if buf is None:
            buf = self._make_buffer(frames)
        resident = buf.n_pieces <= MAX_RESIDENT_PIECES
        self.stats["teacher_rows"] += len(tpos)
        self.stats["student_rows"] += len(pos)
        t_outs = self._run_chunks_async(teacher_fn, buf, tpos, [global_idx],
                                        evict=not resident)
        t_feats = jnp.concatenate(
            [o[:n] for o, n in t_outs], axis=0)  # device (len(tpos), D)

        # error-adaptive refinement: ONE small readback (the LOO error
        # vector), then a second teacher pass at the bisected midpoints of
        # the intervals interpolation is measurably failing in
        if self.teacher_refine > 0.0 and len(tpos) >= 3:
            errs = np.asarray(self._loo_errs_fn()(
                t_feats, jnp.asarray(self._loo_weights(tpos))))  # host sync
            mids = self._refine_mids(tpos, errs)
            if len(mids):
                self.stats["teacher_rows"] += len(mids)
                m_outs = self._run_chunks_async(
                    teacher_fn, buf, mids, [global_idx], evict=False)
                m_feats = jnp.concatenate(
                    [o[:n] for o, n in m_outs], axis=0)
                tpos, t_feats = self._merge_knots(tpos, t_feats, mids,
                                                  m_feats)

        # interpolate teacher features to every scored position — on
        # device, from host-precomputed gather indices/weights, so pass B
        # can be queued without waiting for pass A's results
        t_at_pos = _interp_rows(tpos, t_feats, pos, self.teacher_interp)

        # pass B: student forwards + loss at every scored position
        # (dispatch-batched: ``sub`` chunks per device call)
        buf_b = buf if resident else self._make_buffer(frames)
        outs = self._run_chunks_async(
            student_fn, buf_b, pos, [local_idx], extra_rows=t_at_pos,
            chunk=self.chunk * sub)

        if m == 1:
            return PendingScore(outs)
        if self.score_refine > 0.0:
            return PendingScore([], lazy=self._score_refine_fetch(
                outs, buf_b, pos, local_idx, tpos, t_feats, eff_global, T))
        return PendingScore(
            outs, post=lambda losses: np.interp(np.arange(T), pos, losses))

    # -- cross-video group scoring ---------------------------------------------

    def _run_group_chunks(self, fn, specs, extra=None,
                          chunk: Optional[int] = None) -> List[tuple]:
        """Chunk a row stream spanning SEVERAL videos into full dispatches.

        Per-video chunking leaves boundary chunks underfilled (a 60-frame
        MSVD clip has 16 turbo teacher rows against chunk 32: half of every
        teacher dispatch — the expensive forward — is padding). Here rows
        from ``specs = [(buf, positions, idx_mats), ...]`` are concatenated
        in order and chunks may straddle videos: the device span for a
        chunk is the concatenation of each contributing video's piece
        range, padded with zero pieces to the group-wide maximum so every
        chunk shares one compiled shape (VERDICT r2 next-#2).

        ``extra`` (optional): per-video device/host row arrays aligned with
        positions (the strided modes' teacher features); chunks slice them
        as contiguous runs, on device, sync-free.

        Returns [(device_out, n_valid)]; row order is the concatenation of
        the per-video position lists. ``chunk`` overrides rows/dispatch
        (see _run_chunks_async).
        """
        chunk = self.chunk if chunk is None else chunk
        P = specs[0][0].piece if specs else PIECE

        rows: List[tuple] = []  # (vid, position-index-within-vid)
        for vi, (_, positions, _) in enumerate(specs):
            rows.extend((vi, j) for j in range(len(positions)))
        if not rows:
            return []
        n_mats = len(specs[0][2])

        # per-chunk piece segments and the group-wide span size
        chunk_plans = []
        K_max = 1
        for c0 in range(0, len(rows), chunk):
            crows = rows[c0:c0 + chunk]
            vids = []
            for v, _ in crows:
                if not vids or vids[-1] != v:
                    vids.append(v)
            segs = []
            k_total = 0
            for v in vids:
                buf, positions, mats = specs[v]
                sel = np.asarray([j for (vv, j) in crows if vv == v])
                lo = min(int(m[positions[sel]].min()) for m in mats)
                hi = max(int(m[positions[sel]].max()) for m in mats)
                lo_p, hi_p = lo // P, hi // P
                segs.append((v, lo_p, hi_p))
                k_total += hi_p - lo_p + 1
            K_max = max(K_max, k_total)
            chunk_plans.append((crows, segs))

        zero_piece = None
        outs = []
        inflight: List[jnp.ndarray] = []
        for crows, segs in chunk_plans:
            pieces = []
            offsets = {}
            off = 0
            for v, lo_p, hi_p in segs:
                buf = specs[v][0]
                offsets[v] = off - lo_p * P
                buf.fire_until(hi_p + 1)
                pieces.append(buf.span(lo_p, hi_p - lo_p + 1))
                off += (hi_p - lo_p + 1) * P
            while off < K_max * P:  # zero-pad to the shared span shape
                if zero_piece is None:
                    shape = (P,) + specs[0][0].frames.shape[1:]
                    zero_piece = jnp.zeros(shape, specs[0][0].frames.dtype)
                pieces.append(zero_piece)
                off += P
            span = (pieces[0] if len(pieces) == 1
                    else jnp.concatenate(pieces, axis=0))

            n = len(crows)
            args = [(self.params, self.t_params), span]
            for mi in range(n_mats):
                mat = np.stack([specs[v][2][mi][specs[v][1][j]] + offsets[v]
                                for (v, j) in crows])
                if n < chunk:
                    mat = np.pad(mat, ((0, chunk - n), (0, 0)))
                args.append(jnp.asarray(mat))
            if extra is not None:
                runs = []
                r0 = 0
                for i in range(1, n + 1):
                    if i == n or crows[i][0] != crows[r0][0]:
                        v = crows[r0][0]
                        j0, j1 = crows[r0][1], crows[i - 1][1] + 1
                        runs.append(extra[v][j0:j1])
                        r0 = i
                ex = (runs[0] if len(runs) == 1
                      else jnp.concatenate(runs, axis=0))
                if n < chunk:
                    ex = jnp.pad(ex, ((0, chunk - n), (0, 0)))
                args.append(ex)
            out = fn(*args)
            inflight.append(out)
            outs.append((out, n))
            if len(inflight) > MAX_INFLIGHT:
                inflight.pop(0).block_until_ready()
        return outs

    def score_group_async(self, items: List[dict]) -> List["PendingScore"]:
        """Score several videos' items with cross-video chunk batching.

        Returns one PendingScore per item (order preserved). Items whose
        window geometry differs (short-video eff_global clamp) or that are
        dummies fall back to the per-video paths; the rest share full
        chunks. The caller bounds group size (run_scoring keeps the total
        piece count under the resident budget)."""
        if self.band_mode is not None:
            # banded passes batch WITHIN a video (chunk buckets); videos
            # are queued back-to-back — the per-video path is already
            # sync-free, so grouping adds nothing to hide
            return [self.score_item_async(it) for it in items]
        results: List[Optional[PendingScore]] = [None] * len(items)
        groups: Dict[int, List[int]] = {}
        for i, item in enumerate(items):
            if item["dummy"]:
                results[i] = PendingScore([], ready=self.dummy_losses())
                continue
            eff = item["eff_global"]
            if self.global_subsample > 1:
                eff = len(range(0, eff, self.global_subsample))
            groups.setdefault(eff, []).append(i)

        for eff, idxs in groups.items():
            if len(idxs) == 1:
                i = idxs[0]
                results[i] = self.score_item_async(items[i])
                continue
            sub = [items[i] for i in idxs]
            if self.teacher_stride > 1 or self.score_stride > 1:
                handles = self._score_group_strided(sub)
            else:
                handles = self._score_group_exact(sub)
            for i, h in zip(idxs, handles):
                results[i] = h
        return results

    def _group_inputs(self, items):
        bufs, locs, globs = [], [], []
        for item in items:
            bufs.append(self._make_buffer(item["frames"]))
            loc, glob = item["local_idx"], item["global_idx"]
            if self.global_subsample > 1:
                glob = glob[:, ::self.global_subsample]
            locs.append(loc)
            globs.append(glob)
        eff = globs[0].shape[1]
        return bufs, locs, globs, eff

    def _score_group_exact(self, items) -> List["PendingScore"]:
        bufs, locs, globs, eff = self._group_inputs(items)
        fn = self._get(eff)
        n_rows = sum(it["frames"].shape[0] for it in items)
        self.stats["teacher_rows"] += n_rows
        self.stats["student_rows"] += n_rows
        specs = [(buf, np.arange(it["frames"].shape[0]), [loc, glob])
                 for buf, it, loc, glob in zip(bufs, items, locs, globs)]
        outs = self._run_group_chunks(fn, specs)
        gf = _GroupFetch(outs)
        handles, s = [], 0
        for it in items:
            T = it["frames"].shape[0]
            handles.append(PendingScore([], group=(gf, s, s + T)))
            s += T
        return handles

    def _score_group_strided(self, items) -> List["PendingScore"]:
        m = self.score_stride
        bufs, locs, globs, eff = self._group_inputs(items)

        poss, tposs = [], []
        for it in items:
            T = it["frames"].shape[0]
            pos = np.arange(0, T, m)
            if pos[-1] != T - 1:
                pos = np.append(pos, T - 1)
            poss.append(pos)
            tposs.append(self._teacher_positions(pos, it["frames"]))
        sub = self._student_sub(sum(len(p) for p in poss))
        teacher_fn, student_fn = self._get_split(eff, sub)

        # pass A: teacher features, chunks shared across videos
        self.stats["teacher_rows"] += sum(len(t) for t in tposs)
        self.stats["student_rows"] += sum(len(p) for p in poss)
        t_specs = [(buf, tpos, [glob])
                   for buf, tpos, glob in zip(bufs, tposs, globs)]
        t_outs = self._run_group_chunks(teacher_fn, t_specs)
        t_all = jnp.concatenate([o[:n] for o, n in t_outs], axis=0)

        feats_list = []
        s = 0
        for tpos in tposs:
            feats_list.append(t_all[s:s + len(tpos)])
            s += len(tpos)

        if self.teacher_refine > 0.0:
            tposs, feats_list = self._refine_group(
                teacher_fn, bufs, globs, tposs, feats_list)

        extras = [_interp_rows(tpos, t_v, pos, self.teacher_interp)
                  for tpos, t_v, pos in zip(tposs, feats_list, poss)]

        # pass B: student + loss, chunks shared across videos and
        # dispatch-batched (``sub`` chunks per device call)
        s_specs = [(buf, pos, [loc])
                   for buf, pos, loc in zip(bufs, poss, locs)]
        outs = self._run_group_chunks(student_fn, s_specs, extra=extras,
                                      chunk=self.chunk * sub)
        if m > 1 and self.score_refine > 0.0:
            return self._group_score_refine_handles(
                items, bufs, locs, poss, tposs, feats_list, outs, eff)
        gf = _GroupFetch(outs)
        handles, s = [], 0
        for it, pos in zip(items, poss):
            T = it["frames"].shape[0]
            post = (None if m == 1 else
                    (lambda T_, pos_: lambda losses: np.interp(
                        np.arange(T_), pos_, losses))(T, pos))
            handles.append(PendingScore([], group=(gf, s, s + len(pos)),
                                        post=post))
            s += len(pos)
        return handles

    def _group_score_refine_handles(self, items, bufs, locs, poss, tposs,
                                    feats_list, outs, eff):
        """Guarded score-stride across a video group: ONE fetch of the
        stride-m losses, one shared-chunk refinement student pass for every
        video's bisection midpoints, then per-video merge + interpolation.
        The closure runs at the first handle's fetch; results are cached
        for the rest of the group."""
        Ts = [it["frames"].shape[0] for it in items]

        def compute():
            flat = _fetch_outs(outs)
            losses_list, s = [], 0
            for pos in poss:
                losses_list.append(flat[s:s + len(pos)])
                s += len(pos)
            mids_list = [self._score_refine_rows(pos, l, T)
                         for pos, l, T in zip(poss, losses_list, Ts)]
            n_mids = sum(len(mm) for mm in mids_list)
            m_losses_list = [np.empty(0)] * len(items)
            if n_mids:
                self.stats["student_rows"] += n_mids
                sub = self._student_sub(n_mids)
                _, student_fn = self._get_split(eff, sub)
                sel = [i for i, mm in enumerate(mids_list) if len(mm)]
                m_specs = [(bufs[i], mids_list[i], [locs[i]]) for i in sel]
                m_extras = [
                    _interp_rows(tposs[i], feats_list[i], mids_list[i],
                                 self.teacher_interp) for i in sel]
                m_outs = self._run_group_chunks(
                    student_fn, m_specs, extra=m_extras,
                    chunk=self.chunk * sub)
                m_flat = _fetch_outs(m_outs)
                s = 0
                for i in sel:
                    n = len(mids_list[i])
                    m_losses_list[i] = m_flat[s:s + n]
                    s += n
            results = []
            for T, pos, l, mids, ml in zip(Ts, poss, losses_list,
                                           mids_list, m_losses_list):
                all_pos = np.concatenate([pos, mids])
                order = np.argsort(all_pos)
                all_l = np.concatenate([l, ml])[order]
                results.append(np.interp(np.arange(T), all_pos[order],
                                         all_l))
            return results

        cache: dict = {}

        def get(i):
            if "res" not in cache:
                cache["res"] = compute()
            return cache["res"][i]

        return [PendingScore([], lazy=partial(get, i))
                for i in range(len(items))]

    def _refine_group(self, teacher_fn, bufs, globs, tposs, feats_list):
        """Error-adaptive refinement across a video group: every video's
        LOO errors are fetched in ONE readback, the refinement midpoints
        run as ONE shared-chunk teacher pass, and each video's knots are
        merged. Returns the (possibly) refined (tposs, feats_list)."""
        errs_dev = []
        for tpos, f in zip(tposs, feats_list):
            if len(tpos) >= 3:
                errs_dev.append(self._loo_errs_fn()(
                    f, jnp.asarray(self._loo_weights(tpos))))
            else:
                errs_dev.append(None)
        flat = [e for e in errs_dev if e is not None]
        if not flat:
            return tposs, feats_list
        cat = np.asarray(flat[0] if len(flat) == 1
                         else jnp.concatenate(flat))  # ONE host sync
        mids_list = []
        off = 0
        for tpos, e in zip(tposs, errs_dev):
            if e is None:
                mids_list.append(np.empty(0, tpos.dtype))
                continue
            n = e.shape[0]
            mids_list.append(self._refine_mids(tpos, cat[off:off + n]))
            off += n
        if not any(len(m) for m in mids_list):
            return tposs, feats_list

        self.stats["teacher_rows"] += sum(len(m) for m in mids_list)
        m_specs = [(buf, m, [glob])
                   for buf, m, glob in zip(bufs, mids_list, globs)
                   if len(m)]
        m_outs = self._run_group_chunks(teacher_fn, m_specs)
        m_all = jnp.concatenate([o[:n] for o, n in m_outs], axis=0)

        new_tposs, new_feats = [], []
        sm = 0
        for tpos, f, mids in zip(tposs, feats_list, mids_list):
            if len(mids):
                fm = m_all[sm:sm + len(mids)]
                sm += len(mids)
                tpos, f = self._merge_knots(tpos, f, mids, fm)
            new_tposs.append(tpos)
            new_feats.append(f)
        return new_tposs, new_feats

    def dummy_losses(self) -> np.ndarray:
        """Constant-loss protocol for corrupt / size-mismatched videos:
        the reference scores global_size pairs of all-zero (3, 60, 224, 224)
        views (ref: dino_loss_loader.py:34-38, dino_similarity.py:66-93),
        yielding global_size identical values."""
        if self._dummy_loss is None:
            zeros_local = jnp.zeros(
                (1, 3, self.local_size, 224, 224), self.compute_dtype)
            zeros_glob = jnp.zeros((1, 3, 60, 224, 224), self.teacher_dtype)

            def run():
                s = tsf.forward(self.params, zeros_local, self.model_cfg,
                                compute_dtype=self.compute_dtype)
                t = tsf.forward(self.t_params, zeros_glob, self.model_cfg,
                                compute_dtype=self.teacher_dtype)
                return scoring_dino_loss(
                    s[0], t[0], teacher_temp=self.teacher_temp,
                    student_temp=self.student_temp)

            if self.precision:
                val = _with_matmul_precision(self.precision, run)
            else:
                val = run()
            self._dummy_loss = float(val)
        return np.full(self.global_size, self._dummy_loss)

    def score_item_async(self, item: dict) -> "PendingScore":
        """Queue one DinoLossDataset item's scoring (dict contract in
        datasets.py); .fetch() the returned handle for the losses."""
        if item["dummy"]:
            return PendingScore([], ready=self.dummy_losses())
        return self.score_video_async(
            item["frames"], item["local_idx"], item["global_idx"],
            item["eff_global"])

    def score_item(self, item: dict) -> np.ndarray:
        """Score one DinoLossDataset item (dict contract in datasets.py)."""
        return self.score_item_async(item).fetch()


class _GroupFetch:
    """One-shot fetch of a video group's shared chunk outputs: the first
    PendingScore.fetch() pulls every chunk (one sync for the whole group),
    later videos slice the cached host array."""

    def __init__(self, outs: List[tuple]):
        self._outs = outs
        self._arr: Optional[np.ndarray] = None

    def get(self) -> np.ndarray:
        if self._arr is None:
            self._arr = _fetch_outs(self._outs)
            self._outs = []  # release device references
        return self._arr


class PendingScore:
    """Handle to a video's queued scoring dispatches.

    ``outs`` is the [(device_array, n_valid)] chunk list; ``fetch()`` blocks
    on the device stream, concatenates the valid rows, applies the optional
    host post-processing (score-stride interpolation) and returns float64
    losses. ``ready`` short-circuits for host-computed results (dummies);
    ``group`` = (_GroupFetch, start, end) slices a cross-video batch's
    shared output rows instead; ``lazy`` defers to a closure that may
    queue MORE device work at fetch time (the guarded score-stride's
    refinement pass) — its result is cached so fetch() stays idempotent.
    """

    def __init__(self, outs: List[tuple], post=None,
                 ready: Optional[np.ndarray] = None,
                 group: Optional[tuple] = None, lazy=None):
        self._outs = outs
        self._post = post
        self._ready = ready
        self._group = group
        self._lazy = lazy

    def fetch(self) -> np.ndarray:
        if self._lazy is not None:
            self._ready = self._lazy()
            self._lazy = None
        if self._ready is not None:
            return np.asarray(self._ready, np.float64)
        if self._group is not None:
            gf, s, e = self._group
            losses = gf.get()[s:e]
        else:
            losses = _fetch_outs(self._outs)
        if self._post is not None:
            losses = self._post(losses)
        return losses.astype(np.float64)


def _fetch_outs(outs: List[tuple]) -> np.ndarray:
    """Materialize [(device_out, n_valid)] chunk results on the host.

    ONE readback, not one per chunk: every np.asarray is a full host
    round trip (~40 ms on the bench tunnel), so fetching a 480-frame
    video's 15 student chunks individually costs ~0.6 s of pure latency
    — measured as ~15% of turbo's end-to-end time
    (tools/dispatch_gap_bench.py). A single device-side concat collapses
    it to one round trip; valid rows are sliced on the host."""
    if len(outs) == 1:
        o, n = outs[0]
        return np.asarray(o)[:n]
    full = np.asarray(jnp.concatenate([o for o, _ in outs], axis=0))
    pieces = []
    off = 0
    for o, n in outs:
        pieces.append(full[off:off + n])
        off += o.shape[0]
    return np.concatenate(pieces)


def _with_matmul_precision(precision, fn, *args):
    with jax.default_matmul_precision(precision):
        return fn(*args)


def _motion_energy(frames: np.ndarray, wire_format: str) -> np.ndarray:
    """(T,) per-frame luma motion: mean |Y_t - Y_{t-1}| over a 2x-strided
    pixel grid (motion[0] = 0). Drives the motion-adaptive teacher
    refinement (ScorerConfig.teacher_adaptive). Host-side numpy on the
    wire representation — packed I420 frames use their Y plane directly,
    RGB frames a green-weighted proxy; a few ms per video."""
    T = frames.shape[0]
    if frames.ndim == 3:  # packed planar (T, rows, W)
        rows = frames.shape[1]
        H = (yuv.frame_height_q(rows, frames.shape[2])
             if wire_format == "yuv420q" else yuv.frame_height(rows))
        y = frames[:, :H:2, ::2].astype(np.float32)
    else:  # (T, H, W, 3) RGB uint8 or normalized float
        y = frames[:, ::2, ::2, 1].astype(np.float32)
    motion = np.zeros(T, np.float64)
    if T > 1:
        motion[1:] = np.abs(np.diff(y, axis=0)).mean(axis=(1, 2))
    return motion


def _interp_rows(xp: np.ndarray, rows, x: np.ndarray,
                 kind: str = "linear"):
    """Row-wise interpolation dispatcher for the teacher-feature hand-off:
    ``linear`` (default, the validated turbo mode) or ``catmullrom``
    (cubic Catmull-Rom, for deeper teacher strides where the piecewise-
    linear error dominates — BENCH.md quality table)."""
    if kind == "linear":
        return _lerp_rows(xp, rows, x)
    if kind == "catmullrom":
        return _catmull_rom_rows(xp, rows, x)
    raise ValueError(f"unknown teacher_interp {kind!r}")


def _catmull_rom_rows(xp: np.ndarray, rows, x: np.ndarray):
    """Row-wise cubic Catmull-Rom interpolation on (possibly non-uniform)
    knots: rows (len(xp), D) sampled at xp, evaluated at x within
    [xp[0], xp[-1]]. Returns (len(x), D).

    Tangents are the standard finite-difference Catmull-Rom choice
    m_j = (y[j+1]-y[j-1])/(x[j+1]-x[j-1]) (one-sided at the ends), so the
    curve passes through every knot and is C1. The evaluation is expressed
    as 4 host-precomputed gathers + weights over the knot rows — with a
    device ``rows`` the whole thing rides the dispatch stream, exactly
    like _lerp_rows."""
    on_device = isinstance(rows, jnp.ndarray)
    xp = np.asarray(xp, np.float64)
    n = len(xp)
    if n < 3:
        return _lerp_rows(xp, rows, x)
    j = np.searchsorted(xp, x, side="right") - 1
    j = np.clip(j, 0, n - 2)
    h = xp[j + 1] - xp[j]
    t = np.clip((np.asarray(x, np.float64) - xp[j]) / np.maximum(h, 1e-12),
                0.0, 1.0)
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    # m_j over rows[j-1], rows[j+1]; one-sided at the first knot
    jm1 = np.maximum(j - 1, 0)
    span_l = xp[j + 1] - xp[jm1]
    # m_{j+1} over rows[j], rows[j+2]; one-sided at the last knot
    jp2 = np.minimum(j + 2, n - 1)
    span_r = xp[jp2] - xp[j]
    cl = h10 * h / np.maximum(span_l, 1e-12)
    cr = h11 * h / np.maximum(span_r, 1e-12)
    w = np.stack([-cl, h00 - cr, h01 + cl, cr], axis=1)  # (len(x), 4)
    idx = np.stack([jm1, j, j + 1, jp2], axis=1)  # (len(x), 4)
    w = w.astype(np.float32)
    if on_device:
        wj = jnp.asarray(w).astype(rows.dtype)
        g = rows[jnp.asarray(idx)]  # (len(x), 4, D)
        return jnp.einsum("pk,pkd->pd", wj, g)
    g = np.asarray(rows)[idx]
    return np.einsum("pk,pkd->pd", w.astype(rows.dtype), g)


def _lerp_rows(xp: np.ndarray, rows, x: np.ndarray):
    """Row-wise linear interpolation: rows (len(xp), D) sampled at xp,
    evaluated at x (within [xp[0], xp[-1]]). Returns (len(x), D).

    ``rows`` may be a host numpy array or a device jnp array — the gather
    indices/weights are host-precomputed either way, so with a device input
    the lerp rides the dispatch stream without any host sync."""
    on_device = isinstance(rows, jnp.ndarray)
    lib = jnp if on_device else np
    xp = np.asarray(xp)
    if len(xp) == 1:
        return lib.repeat(rows, len(x), axis=0)
    j = np.searchsorted(xp, x, side="right") - 1
    j = np.clip(j, 0, len(xp) - 2)
    x0 = xp[j]
    x1 = xp[j + 1]
    w = ((x - x0) / np.maximum(x1 - x0, 1)).astype(np.float32)[:, None]
    if on_device:
        w = jnp.asarray(w)
    w = w.astype(rows.dtype)
    return rows[j] * (1.0 - w) + rows[j + 1] * w


def export_loss(loss_list, video_path: str, file_path: str) -> None:
    """Incremental read-merge-write JSON export
    (ref: dino_similarity.py:97-117). Keyed by basename without extension."""
    video_name = os.path.basename(video_path)
    key, _ = os.path.splitext(video_name)
    video_dict = {key: [float(x) for x in loss_list]}
    if os.path.exists(file_path):
        with open(file_path, "r") as f:
            data = json.load(f)
        data.update(video_dict)
        with open(file_path, "w") as f:
            json.dump(data, f)
    else:
        os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
        with open(file_path, "w") as f:
            json.dump(video_dict, f)


def make_scorers(params, model_cfg, config: Optional[ScorerConfig] = None,
                 n_devices: int = 1, **overrides) -> List[FrameScorer]:
    """Build one FrameScorer per local device (params replicated).

    Scoring is embarrassingly parallel over videos, so intra-host scaling
    needs no collectives and no sharded arrays: each scorer is pinned to
    one ``jax.local_devices()`` entry and ``run_scoring`` feeds them
    round-robin. ``n_devices`` <= 0 means all local devices. This is the
    TPU-native replacement for the reference's per-GPU process launch
    (ref: scripts/dino_similarity_*.sh, utils/utils.py:437-469);
    --shard_id/--num_shards still split across HOSTS.
    """
    if config is None:
        config = ScorerConfig()
    if overrides:
        config = dataclasses.replace(config, **overrides)
    if config.clamp_check:
        # run the clamp-guard probe ONCE here, not once per device scorer
        from ..ops.fused_block import ensure_fused_safe, should_fuse

        want = config.use_pallas is True or (
            config.use_pallas == "auto"
            and should_fuse(config.compute_dtype))
        if want and not ensure_fused_safe(params, model_cfg, True,
                                          where="make_scorers"):
            config = dataclasses.replace(config, use_pallas=False)
        config = dataclasses.replace(config, clamp_check=False)
    devs = jax.local_devices()
    if n_devices <= 0:
        n_devices = len(devs)
    n_devices = min(n_devices, len(devs))
    if n_devices == 1:
        return [FrameScorer(params, model_cfg, config)]
    return [FrameScorer(params, model_cfg, config, device=d)
            for d in devs[:n_devices]]


def run_scoring(
    dataset,
    scorer,
    file_path: str,
    num_workers: int = 4,
    shard_id: int = 0,
    num_shards: int = 1,
    log_every: int = 1,
    pipeline_depth: int = 2,
    group_videos: int = 8,
) -> None:
    """Iterate the scoring dataset with host prefetch, exporting per video.

    ``scorer`` is a FrameScorer or a list of them (one per local device,
    see make_scorers): video groups are dealt round-robin across scorers,
    scaling videos/min over local chips from a single process. Sharding
    over videos (--num_shards) replaces the reference's
    torch.distributed.launch multi-process split across hosts: the scoring
    workload is embarrassingly parallel over videos.

    Videos are pipelined ``pipeline_depth`` deep PER SCORER: video i+1's
    uploads and compute dispatches are queued before video i's losses are
    fetched, so the per-video host sync and JSON export hide behind the
    next video's work — this matters for many-short-videos corpora (MSVD
    clips are ~10 s), where per-video latency otherwise dominates.
    """
    from ..data.loader import PrefetchLoader, shard_indices

    scorers = scorer if isinstance(scorer, (list, tuple)) else [scorer]
    idx = shard_indices(len(dataset), shard_id, num_shards)
    loader = PrefetchLoader(dataset, indices=idx, num_workers=num_workers)

    # Videos are batched into GROUPS whose chunks are shared across video
    # boundaries (score_group_async): short-clip corpora otherwise waste up
    # to half of every teacher dispatch on padding. Group size is bounded
    # by the resident-piece budget (two groups are in flight at once on a
    # device, so each gets half); ``pipeline_depth`` groups PER SCORER stay
    # queued while older groups fetch/export, keeping every device busy
    # across the host syncs.
    budget = MAX_RESIDENT_PIECES // 2
    pending_groups: List[List[tuple]] = []
    group: List[dict] = []
    group_pieces = 0
    next_scorer = 0

    def drain_to(depth: int):
        while len(pending_groups) > depth:
            for path, handle in pending_groups.pop(0):
                export_loss(handle.fetch(), path, file_path)

    def flush_group():
        nonlocal group, group_pieces, next_scorer
        if not group:
            return
        handles = scorers[next_scorer].score_group_async(group)
        next_scorer = (next_scorer + 1) % len(scorers)
        pending_groups.append(
            [(it["path"], h) for it, h in zip(group, handles)])
        group, group_pieces = [], 0
        drain_to(max(1, pipeline_depth) * len(scorers))

    for i, item in enumerate(loader):
        if log_every and i % log_every == 0:
            print(f"{i + 1} / {len(idx)}", flush=True)
        n_p = (0 if item["dummy"]
               else -(-item["frames"].shape[0] // scorers[0].piece))
        if group and (len(group) >= group_videos
                      or group_pieces + n_p > budget):
            flush_group()
        group.append(item)
        group_pieces += n_p
    flush_group()
    drain_to(0)
