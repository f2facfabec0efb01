"""Pallas TPU kernel for the tracking state machine.

The ``lax.scan`` tracker (:mod:`hsip_tpu.track.device_scan`) pays a
per-step loop overhead (~21 µs/step on v5e after an 8x unroll) that
dominates single-video on-device time: the fused map kernel processes 2048
frames in ~0.08 ms while the scan needs ~42 ms. This module runs the SAME
state machine as one ``pallas_call`` with a sequential grid — tracker
state lives in SMEM scratch (persistent across grid steps on TPU), each
step's profile rows stream through VMEM blocks with the usual
double-buffered DMA, and the whole scan is a single kernel launch.

The grid is ``(V, ceil(M/K))`` — videos major, frame groups minor, with K
frames unrolled per sequential grid step (``frames_per_step``) — so a
whole library batch runs as ONE kernel too (state resets when the frame
index wraps to 0); the single-video entry is simply the V=1 case.
Per-video calibration, frame rate and displacement caps ride in
scalar-prefetch arrays.

Scope: all four detectors — 'combined' (the reference tracker —
min-gradient + rightmost-Sobel) plus the three named profile methods
('threshold' | 'half_maximum' | 'gradient', incl. the latter's TwoSum
double-float tie-exactness) — at any width (profile rows pad to a lane
multiple; the pad lanes sit outside every search window so the masked
reductions never see them). The mesh-sharded library path runs this same
kernel per device via ``shard_map``.

Bit-parity contract: every float32 compare and reduction mirrors
``device_tracking_scan``'s step function operation for operation (min/max
reductions are exact; first-occurrence argmin is reproduced with an
index-encoded second reduction), so outputs are REQUIRED to be
bit-identical to the lax.scan backend — tested in interpret mode on CPU
and on the real chip in the ``HSIP_TPU_CHIP=1`` tier.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device_scan import DeviceScanResult

__all__ = [
    "MAX_FRAMES_PER_STEP",
    "default_frames_per_step",
    "pallas_tracking_scan",
    "pallas_tracking_scan_batched",
    "supports_pallas_scan",
]

# Largest K the env knob honors; sweeps (tools/chip_autotune.py) must not
# recommend beyond it — the pipeline would silently clamp the replay.
MAX_FRAMES_PER_STEP = 128


def default_frames_per_step() -> int:
    """Frames unrolled per grid step (K) used by the pipeline call sites.

    Tunable via ``HSIP_PALLAS_SCAN_K`` so ``tools/chip_autotune.py`` sweeps
    can be replayed against the full pipeline without code edits. The
    v5e chip sweep (2026-08-18, M=2048 W=1024, pipelined timing) put the
    kernel within ~10% of its best across K∈[4,16] — 2.30 µs/step at K=4
    vs 2.56 at the K=8 default for V=1, 7.87 vs 7.76 (K=16) at V=8 — so
    the default stays at the flat region's center; the env knob replays a
    sharper pick when one machine's sweep finds one. Any K is
    bit-identical by contract (padding rows are inert).
    """
    import os

    try:
        k = int(os.environ.get("HSIP_PALLAS_SCAN_K", "8"))
    except ValueError:
        return 8
    # Upper clamp: K statically unrolls the kernel body K times at trace
    # time, so a typo'd huge value would stall every pipeline batch for
    # minutes of tracing before the lax.scan fallback could even fire.
    return min(max(1, k), MAX_FRAMES_PER_STEP)


def batched_kernel_max_videos() -> int:
    """Largest per-device video batch routed to the batched Pallas kernel.

    The kernel's grid serializes videos (its cost grows ~linearly in V on
    one TensorCore) while the vmapped ``lax.scan`` vectorizes the video
    axis inside each step (its per-step fixed cost amortizes with V) — the
    v5e sweep (``tools/chip_autotune.py --videos 1 2 4 8``, pipelined)
    crossed over at V=3: Pallas 4.7/7.3/10.1/16.4 ms vs lax.scan
    22.7/9.7/8.5/7.4 at V=1/2/4/8. ``HSIP_PALLAS_BATCH_MAX_V`` replays a
    different machine's crossover without code edits; both backends are
    bit-identical by contract so routing is purely a throughput choice.
    """
    import os

    try:
        return int(os.environ.get("HSIP_PALLAS_BATCH_MAX_V", "2"))
    except ValueError:
        return 2


# numpy scalars (not jnp): jnp constants would be captured as traced
# closure consts, which pallas_call rejects.
_NEG = np.float32(-3.0e38)
_POS = np.float32(3.0e38)
_BIG_I = np.int32(2**30)

# SMEM int32 state slots. (No "stopped" slot: the kernel never freezes —
# tracking runs past the advisory f32 stop, and the write-once event
# latches key off out_scal's stop_step staying -1 instead.)
_LV_POS, _LV_FRAME, _P1_FRAME, _P1_POS = 0, 1, 2, 3
_VL_OK, _VP_OK, _N_ENTRIES, _DDT = 4, 5, 6, 7
_N_I32 = 8
# SMEM f32 state slots.
_V_LATEST, _V_PREV = 0, 1
_N_F32 = 2


def supports_pallas_scan(width: int, method: str) -> bool:
    """The kernel covers all four detectors at any width (profile rows
    pad to a lane multiple; the padded lanes sit outside every search
    window, so the masked reductions never see them). ``width`` no longer
    affects the answer — the parameter stays so call sites keep stating
    the geometry they're gating, should a layout constraint ever return.
    """
    del width
    return method in ("combined", "threshold", "half_maximum", "gradient")


def _lane_width(width: int) -> int:
    """Profile row width padded up to the TPU lane count (128)."""
    return -(-width // 128) * 128


def _first_col(mask, cols):
    """Smallest column index where ``mask`` holds (``_BIG_I`` when none)."""
    return jnp.min(jnp.where(mask, cols, _BIG_I)).astype(jnp.int32)


def _pl_threshold(prof, in_window, cols, fraction, min_intensity):
    """Kernel twin of ``device_scan._detect_window_threshold`` (first-
    occurrence argmax done as an index-encoded reduction)."""
    masked = jnp.where(in_window, prof, _NEG)
    peak = jnp.max(masked)
    peak_idx = _first_col(masked == peak, cols)
    below = jnp.logical_not(in_window & (prof >= fraction * peak))
    first_below = _first_col((cols >= peak_idx) & below, cols)
    window_end = jnp.max(jnp.where(in_window, cols, -1)).astype(jnp.int32)
    edge = jnp.where(first_below > window_end, window_end, first_below - 1)
    ok = (peak > min_intensity) & (edge >= peak_idx)
    return jnp.where(ok, edge, jnp.int32(-1))


def _pl_half_maximum(prof, in_window, cols, fraction, min_intensity):
    """Kernel twin of ``device_scan._detect_window_half_maximum``."""
    masked = jnp.where(in_window, prof, _NEG)
    peak = jnp.max(masked)
    peak_idx = _first_col(masked == peak, cols)
    below = in_window & (cols >= peak_idx) & (prof < fraction * peak)
    first_below = _first_col(below, cols)
    window_end = jnp.max(jnp.where(in_window, cols, -1)).astype(jnp.int32)
    edge = jnp.where(first_below > window_end, window_end, first_below - 1)
    ok = (peak > min_intensity) & (edge >= peak_idx)
    return jnp.where(ok, edge, jnp.int32(-1))


def _pl_gradient(prof, in_window, cols, s0, s1, min_strength, width):
    """Kernel twin of ``device_scan._detect_window_gradient``.

    Same TwoSum double-float carry and lexicographic (hi, lo) argmin —
    bit-equivalent to the host's float64 differences of f32 values. The
    neighbor shifts use ``pltpu.roll`` (lane rotation): the wrapped lanes
    land only at columns that are either outside every window or replaced
    by the one-sided boundary differences, so the wraparound is inert.
    Scalar profile reads at the window edges are one-hot masked sums
    (exact: a single lane contributes).
    """
    from .device_scan import _two_sum

    wl = prof.shape[1]
    left = pltpu.roll(prof, 1, 1)        # lane i <- prof[i-1]
    right = pltpu.roll(prof, wl - 1, 1)  # lane i <- prof[i+1]
    c_hi, c_lo = _two_sum(right, -left)
    c_hi, c_lo = c_hi * 0.5, c_lo * 0.5  # *0.5 is exact

    def at(idx):
        idx = jnp.clip(idx, 0, width - 1)
        return jnp.sum(jnp.where(cols == idx, prof, 0.0))

    l_hi, l_lo = _two_sum(at(s0 + 1), -at(s0))
    r_hi, r_lo = _two_sum(at(s1 - 1), -at(s1 - 2))
    g_hi = jnp.where(cols == s0, l_hi, c_hi)
    g_lo = jnp.where(cols == s0, l_lo, c_lo)
    g_hi = jnp.where(cols == s1 - 1, r_hi, g_hi)
    g_lo = jnp.where(cols == s1 - 1, r_lo, g_lo)
    g_hi = jnp.where(in_window, g_hi, _POS)
    g_lo = jnp.where(in_window, g_lo, _POS)

    m_hi = jnp.min(g_hi)
    tie = g_hi == m_hi
    m_lo = jnp.min(jnp.where(tie, g_lo, _POS))
    pos = _first_col(tie & (g_lo == m_lo), cols)

    def _lt(threshold):
        return (m_hi < threshold) | ((m_hi == threshold) & (m_lo < 0))

    ok = _lt(-min_strength) & _lt(jnp.float32(0.0)) & (s1 - s0 >= 2)
    return jnp.where(ok, pos, jnp.int32(-1))


def _make_kernel(width, edge_margin_px, search_window_px, exit_margin_px,
                 frames_per_step=1, lane_width=None, method="combined"):
    # `w` (the LOGICAL width) drives every search/exit bound; the rows in
    # VMEM are `wl` lanes wide, with pad lanes masked out by `in_window`
    # (s1 <= w - edge_margin < w <= wl, so cols >= w never enter a
    # window and never win a reduction).
    w = width
    wl = lane_width if lane_width is not None else width
    K = frames_per_step

    # 'combined' consumes two profile rows (sobel, gradient); the named
    # methods consume one (intensity) — the kernel arity follows.
    n_prof = 2 if method == "combined" else 1

    def kernel(pf, cal_ref, fr_ref, md_ref,
               fidx_ref, empty_ref, prior_ref, *rest):
        prof_refs = rest[:n_prof]
        (out_final, out_rec, out_post, out_s0, out_s1, out_scal,
         st_i, st_f) = rest[n_prof:]
        v = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            st_i[_LV_POS] = -1
            st_i[_LV_FRAME] = 0
            st_i[_P1_FRAME] = 0
            st_i[_P1_POS] = -1
            st_i[_VL_OK] = 0
            st_i[_VP_OK] = 0
            st_i[_N_ENTRIES] = 0
            st_i[_DDT] = -1
            st_f[_V_LATEST] = 0.0
            st_f[_V_PREV] = 0.0
            out_scal[0, 0, 0] = -1  # stop_step
            out_scal[0, 0, 1] = 0   # stop_reason
            out_scal[0, 0, 2] = -1  # ddt_frame
            out_scal[0, 0, 3] = -1  # clear_vc_entry

        min_grad = pf[0]
        sobel_frac = pf[1]
        ddt_jump = pf[2]
        method_frac = pf[3]
        calibration = cal_ref[v]
        frame_rate = fr_ref[v]
        max_disp = md_ref[v]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, wl), 1)

        # K frames per grid step (statically unrolled): amortizes the
        # per-step grid + DMA overhead; K=1 is the plain per-frame scan.
        for j in range(K):
            step_idx = i * K + j
            frame = fidx_ref[0, j, 0, 0]
            is_empty = empty_ref[0, j, 0, 0]
            prior_ok = prior_ref[0, j, 0, 0]

            # Tracking continues past the f32 stop decision (advisory only):
            # the authoritative exit/velocity-drop truncation is recomputed
            # on host in float64 from the integer positions — the f32 and
            # f64 gates can disagree at exact compare boundaries, and a
            # frozen scan would lose the rows the f64 decision still needs.
            active = is_empty == 0

            # ---- search bounds (velocity-constrained, monotone right) ----
            lv_pos = st_i[_LV_POS]
            lv_frame = st_i[_LV_FRAME]
            no_hist = lv_pos < 0
            frames_elapsed = jnp.maximum(1, frame - lv_frame)
            s0 = jnp.where(no_hist, edge_margin_px, lv_pos)
            s1 = jnp.where(
                no_hist,
                w - edge_margin_px,
                jnp.minimum(
                    w - edge_margin_px,
                    lv_pos + max_disp * frames_elapsed + search_window_px,
                ),
            )
            window_nonempty = s1 > s0

            # ---- candidates (method chosen statically at build time) ----
            in_window = (cols >= s0) & (cols < s1)
            if method == "combined":
                sob = prof_refs[0][0, j]    # (1, W)
                grad = prof_refs[1][0, j]

                grad_m = jnp.where(in_window, grad, _POS)
                gmin = jnp.min(grad_m)
                # First-occurrence argmin as an index reduction (exact).
                pos_g = jnp.min(
                    jnp.where(grad_m == gmin, cols, _BIG_I)
                ).astype(jnp.int32)
                g_ok = window_nonempty & (gmin < -min_grad)

                abs_sob = jnp.where(in_window, jnp.abs(sob), _NEG)
                smax = jnp.max(abs_sob)
                above = in_window & (abs_sob > smax * sobel_frac)
                pos_s = jnp.max(jnp.where(above, cols, -1)).astype(jnp.int32)
                s_ok = window_nonempty & (smax > min_grad) & (pos_s >= 0)

                final = jnp.maximum(
                    jnp.where(g_ok, pos_g, -1), jnp.where(s_ok, pos_s, -1)
                )
            elif method == "threshold":
                final = _pl_threshold(
                    prof_refs[0][0, j], in_window, cols, method_frac, min_grad
                )
            elif method == "half_maximum":
                final = _pl_half_maximum(
                    prof_refs[0][0, j], in_window, cols, method_frac, min_grad
                )
            elif method == "gradient":
                final = _pl_gradient(
                    prof_refs[0][0, j], in_window, cols, s0, s1, min_grad, w
                )
            else:
                raise ValueError(f"Unknown detection method: {method!r}")
            final = jnp.where(window_nonempty, final, -1)
            final = jnp.where(active & (prior_ok != 0), final, -1)
            detected = active & (final >= 0)

            # ---- history append (every active step) ----
            p1_frame = st_i[_P1_FRAME]
            p1_pos = st_i[_P1_POS]
            new_p1_frame = jnp.where(active, frame, p1_frame)
            new_p1_pos = jnp.where(active, final, p1_pos)
            new_lv_pos = jnp.where(detected, final, lv_pos)
            new_lv_frame = jnp.where(detected, frame, lv_frame)

            # ---- velocities (mirrors FlameTracker._update_velocities) ----
            v_latest = st_f[_V_LATEST]
            v_prev = st_f[_V_PREV]
            vl_ok = st_i[_VL_OK]
            vp_ok = st_i[_VP_OK]
            n_entries = st_i[_N_ENTRIES]
            have_prev_entry = active & (p1_pos >= 0) & detected
            dt = (frame - p1_frame).astype(jnp.float32) / frame_rate
            vel_ok = have_prev_entry & (dt > 0) & (frame_rate > 0)
            v1 = jnp.where(
                vel_ok,
                (final - p1_pos).astype(jnp.float32) * calibration / dt,
                jnp.float32(0.0),
            )
            new_v_prev = jnp.where(vel_ok, v_latest, v_prev)
            new_vp_ok = jnp.where(vel_ok, vl_ok, vp_ok)
            new_v_latest = jnp.where(vel_ok, v1, v_latest)
            new_vl_ok = jnp.where(vel_ok, 1, vl_ok)
            new_n_entries = n_entries + jnp.where(vel_ok, 1, 0)

            # ---- DDT latch ----
            ddt = st_i[_DDT]
            ddt_hit = (
                vel_ok & (ddt < 0) & (vl_ok != 0) & (v1 - v_latest > ddt_jump)
            )
            new_ddt = jnp.where(ddt_hit, frame, ddt)

            # ---- exit / velocity-drop truncation ----
            exit_hit = detected & (final >= w - exit_margin_px)
            vel_now_ok = (new_vl_ok != 0) & (new_n_entries >= 1)
            prev_ok = (new_vp_ok != 0) & (new_n_entries >= 2)
            vdrop_hit = (
                active
                & jnp.logical_not(exit_hit)
                & vel_now_ok
                & prev_ok
                & (new_v_prev > 100.0)
                & ((new_v_prev - new_v_latest) / new_v_prev > 0.5)
            )
            stopped_now = exit_hit | vdrop_hit

            recorded = detected & jnp.logical_not(stopped_now)
            is_post = (new_ddt >= 0) & (frame >= new_ddt)

            # ---- per-step outputs (SMEM blocks: scalars) ----
            out_final[0, j, 0, 0] = final
            out_rec[0, j, 0, 0] = recorded.astype(jnp.int32)
            out_post[0, j, 0, 0] = is_post.astype(jnp.int32)
            out_s0[0, j, 0, 0] = s0
            out_s1[0, j, 0, 0] = s1

            # ---- event latches (resident block, write-once) ----
            first_stop = stopped_now & (out_scal[0, 0, 0] < 0)
            out_scal[0, 0, 0] = jnp.where(
                first_stop, step_idx, out_scal[0, 0, 0]
            )
            out_scal[0, 0, 1] = jnp.where(
                first_stop, jnp.where(exit_hit, 1, 2), out_scal[0, 0, 1]
            )
            out_scal[0, 0, 2] = new_ddt
            out_scal[0, 0, 3] = jnp.where(
                first_stop & (new_n_entries >= 2),
                new_n_entries - 2,
                out_scal[0, 0, 3],
            )

            # ---- state update ----
            st_i[_LV_POS] = new_lv_pos
            st_i[_LV_FRAME] = new_lv_frame
            st_i[_P1_FRAME] = new_p1_frame
            st_i[_P1_POS] = new_p1_pos
            st_i[_VL_OK] = new_vl_ok
            st_i[_VP_OK] = new_vp_ok
            st_i[_N_ENTRIES] = new_n_entries
            st_i[_DDT] = new_ddt
            st_f[_V_LATEST] = new_v_latest
            st_f[_V_PREV] = new_v_prev

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "edge_margin_px",
        "search_window_px",
        "exit_margin_px",
        "interpret",
        "frames_per_step",
        "method",
    ),
)
def pallas_tracking_scan_batched(
    frame_indices: jnp.ndarray,     # (V, M) int32
    sobel_lines: jnp.ndarray,       # (V, M, W) f32
    gradient_lines: jnp.ndarray,    # (V, M, W) f32
    empty: jnp.ndarray,             # (V, M) bool
    has_prior: jnp.ndarray,         # (V, M) bool
    width: int,
    min_gradient_strength: jnp.ndarray,
    sobel_threshold_fraction: jnp.ndarray,
    ddt_velocity_jump: jnp.ndarray,
    calibration: jnp.ndarray,       # (V,) f32 — per video
    frame_rate: jnp.ndarray,        # (V,) f32
    max_displacement_px: jnp.ndarray,   # (V,) i32
    edge_margin_px: int = 10,
    search_window_px: int = 100,
    exit_margin_px: int = 15,
    interpret: bool = False,
    frames_per_step: int = 1,
    method: str = "combined",
    intensity_lines: jnp.ndarray = None,   # (V, M, W) f32 — named methods
    method_fraction: jnp.ndarray = 0.5,    # threshold/half_maximum fraction
) -> DeviceScanResult:
    """Whole-batch tracking scan: one kernel, grid (V, ceil(M/K)), state
    resets per video. Result fields are (V, M) / (V,) — the same structure
    as ``vmap(device_tracking_scan)``, to which it is bit-identical.

    ``method`` (static) selects the detector, mirroring
    :func:`hsip_tpu.track.device_scan.device_tracking_scan`: 'combined'
    consumes the sobel/gradient rows; the named profile methods
    ('threshold' | 'half_maximum' | 'gradient') consume
    ``intensity_lines`` and ignore the sobel/gradient arguments.

    ``frames_per_step`` (K) statically unrolls K frames per grid step to
    amortize grid/DMA overhead; the frame axis pads to a K multiple with
    inert (empty) rows, which never touch state.
    """
    n_videos, m, w = sobel_lines.shape
    if w != width:
        raise ValueError(f"width {width} != profile width {w}")
    if m == 0 or n_videos == 0:
        raise ValueError("empty scan (caller handles zero-size batches)")
    if method == "combined":
        profiles = [sobel_lines, gradient_lines]
    else:
        if intensity_lines is None:
            raise ValueError(f"method {method!r} requires intensity_lines")
        profiles = [intensity_lines]
    K = int(frames_per_step)
    m_pad = -(-m // K) * K
    if m_pad != m:
        pad = m_pad - m
        frame_indices = jnp.pad(frame_indices, ((0, 0), (0, pad)))
        profiles = [jnp.pad(p, ((0, 0), (0, pad), (0, 0))) for p in profiles]
        # Inert padding: empty rows advance nothing in the state machine.
        empty = jnp.pad(empty, ((0, 0), (0, pad)), constant_values=True)
        has_prior = jnp.pad(has_prior, ((0, 0), (0, pad)),
                            constant_values=True)
    # Lane padding: rows widen to a 128 multiple so any width lowers; the
    # pad lanes are outside every search window (masked by column index
    # against the LOGICAL width's bounds), so reductions never see them.
    wl = _lane_width(w)
    if wl != w:
        profiles = [
            jnp.pad(p, ((0, 0), (0, 0), (0, wl - w))) for p in profiles
        ]

    params_f = jnp.stack([
        jnp.asarray(min_gradient_strength, jnp.float32),
        jnp.asarray(sobel_threshold_fraction, jnp.float32),
        jnp.asarray(ddt_velocity_jump, jnp.float32),
        jnp.asarray(method_fraction, jnp.float32),
    ])
    cal = jnp.asarray(calibration, jnp.float32).reshape(n_videos)
    fr = jnp.asarray(frame_rate, jnp.float32).reshape(n_videos)
    md = jnp.asarray(max_displacement_px, jnp.int32).reshape(n_videos)

    # Layouts: per-step scalars (frame index, flags, outputs, latches) live
    # in SMEM blocks — Mosaic rejects scalar stores to VMEM — while the
    # (1, W) profile rows stream through VMEM with their blocks fully
    # covering the trailing two dims (the fused band kernel's pattern).
    # Validated by the cross-platform Mosaic lowering test (no chip needed).
    fidx = frame_indices.astype(jnp.int32).reshape(n_videos, m_pad, 1, 1)
    empty_i = empty.astype(jnp.int32).reshape(n_videos, m_pad, 1, 1)
    prior_i = has_prior.astype(jnp.int32).reshape(n_videos, m_pad, 1, 1)
    prof4 = [p.reshape(n_videos, m_pad, 1, wl) for p in profiles]

    kernel = _make_kernel(width, edge_margin_px, search_window_px,
                          exit_margin_px, frames_per_step=K,
                          lane_width=wl, method=method)

    # Lowering rules (enforced by Mosaic): blocks' last two dims must equal
    # the array's (or be 8/128-divisible), and scalar loads/stores must use
    # SMEM — hence (V, M, 1, 1) scalar arrays with (1, K, 1, 1) SMEM blocks.
    smem_step = pl.BlockSpec((1, K, 1, 1), lambda v, i, *pf: (v, i, 0, 0),
                             memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # thresholds, calibration, frame_rate, max_disp
        grid=(n_videos, m_pad // K),
        in_specs=[
            smem_step,  # frame_indices
            smem_step,  # empty
            smem_step,  # has_prior
        ] + [
            # sobel+gradient ('combined') or intensity (named methods)
            pl.BlockSpec((1, K, 1, wl), lambda v, i, *pf: (v, i, 0, 0))
            for _ in prof4
        ],
        out_specs=[
            smem_step,  # final
            smem_step,  # recorded
            smem_step,  # is_post
            smem_step,  # s0
            smem_step,  # s1
            # Per-video event latches: resident for a video's whole pass.
            pl.BlockSpec((1, 1, 4), lambda v, i, *pf: (v, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((_N_I32,), jnp.int32),
            pltpu.SMEM((_N_F32,), jnp.float32),
        ],
    )
    # Videos are independent (state resets at frame 0), so the V axis may
    # split across Megacore TensorCores; the frame axis must stay
    # sequential ('arbitrary') — it carries the tracker state.
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
    )
    i32 = jnp.int32
    finals, recs, posts, s0s, s1s, scal = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_videos, m_pad, 1, 1), i32),
            jax.ShapeDtypeStruct((n_videos, m_pad, 1, 1), i32),
            jax.ShapeDtypeStruct((n_videos, m_pad, 1, 1), i32),
            jax.ShapeDtypeStruct((n_videos, m_pad, 1, 1), i32),
            jax.ShapeDtypeStruct((n_videos, m_pad, 1, 1), i32),
            jax.ShapeDtypeStruct((n_videos, 1, 4), i32),
        ],
        interpret=interpret,
        compiler_params=compiler_params,
    )(params_f, cal, fr, md, fidx, empty_i, prior_i, *prof4)

    finals = finals[:, :m, 0, 0]
    recs = recs[:, :m, 0, 0]
    posts = posts[:, :m, 0, 0]
    s0s = s0s[:, :m, 0, 0]
    s1s = s1s[:, :m, 0, 0]
    scal = scal[:, 0, :]
    return DeviceScanResult(
        final_position=finals,
        recorded=recs.astype(bool),
        is_post_ddt=posts.astype(bool),
        search_start=s0s,
        search_end=s1s,
        stop_step=scal[:, 0],
        stop_reason=scal[:, 1],
        ddt_frame=scal[:, 2],
        clear_vc_entry=scal[:, 3],
    )


def pallas_tracking_scan(
    frame_indices: jnp.ndarray,     # (M,) int32
    sobel_lines: jnp.ndarray,       # (M, W) f32
    gradient_lines: jnp.ndarray,    # (M, W) f32
    empty: jnp.ndarray,             # (M,) bool
    has_prior: jnp.ndarray,         # (M,) bool
    width: int,
    min_gradient_strength: jnp.ndarray,
    sobel_threshold_fraction: jnp.ndarray,
    ddt_velocity_jump: jnp.ndarray,
    calibration: jnp.ndarray,
    frame_rate: jnp.ndarray,
    max_displacement_px: jnp.ndarray = 3,
    edge_margin_px: int = 10,
    search_window_px: int = 100,
    exit_margin_px: int = 15,
    interpret: bool = False,
    frames_per_step: int = 1,
    method: str = "combined",
    intensity_lines: jnp.ndarray = None,   # (M, W) f32 — named methods
    method_fraction: jnp.ndarray = 0.5,
) -> DeviceScanResult:
    """Single-video kernel scan, lax.scan-bit-identical.

    Same argument contract as :func:`hsip_tpu.track.device_scan.
    device_tracking_scan` (all four detectors) — the V=1 case of
    :func:`pallas_tracking_scan_batched`. ``interpret`` runs the kernel in
    Pallas interpret mode (CPU parity tests).
    """
    m = frame_indices.shape[0]
    res = pallas_tracking_scan_batched(
        frame_indices.reshape(1, m),
        sobel_lines[None],
        gradient_lines[None],
        empty.reshape(1, m),
        has_prior.reshape(1, m),
        width=width,
        min_gradient_strength=min_gradient_strength,
        sobel_threshold_fraction=sobel_threshold_fraction,
        ddt_velocity_jump=ddt_velocity_jump,
        calibration=jnp.asarray(calibration, jnp.float32).reshape(1),
        frame_rate=jnp.asarray(frame_rate, jnp.float32).reshape(1),
        max_displacement_px=jnp.asarray(
            max_displacement_px, jnp.int32
        ).reshape(1),
        edge_margin_px=edge_margin_px,
        search_window_px=search_window_px,
        exit_margin_px=exit_margin_px,
        interpret=interpret,
        frames_per_step=frames_per_step,
        method=method,
        intensity_lines=(
            None if intensity_lines is None else intensity_lines[None]
        ),
        method_fraction=method_fraction,
    )
    return DeviceScanResult(
        final_position=res.final_position[0],
        recorded=res.recorded[0],
        is_post_ddt=res.is_post_ddt[0],
        search_start=res.search_start[0],
        search_end=res.search_end[0],
        stop_step=res.stop_step[0],
        stop_reason=res.stop_reason[0],
        ddt_frame=res.ddt_frame[0],
        clear_vc_entry=res.clear_vc_entry[0],
    )
