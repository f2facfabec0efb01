"""Randomized differential sweep against the ACTUAL reference implementation.

Opt-in tier (``HSIP_REFERENCE=1``, same gate as
``test_reference_differential.py``): every trial draws random video geometry,
flame trajectory, detector tunables, and source options, runs the reference's
own ``process_video_source`` (with its hard-coded detector construction at
``scripts/process_videos.py:1417-1421`` redirected to the drawn config) and
this framework's pipeline on the same recording, then byte-compares every
output table.

Covers branches the fixed-scenario differential can't: even morphology
kernels (the band-fold host fallback), non-default sigma/thresholds, short
frames where the centerline band folds over the image edge, trigger-relative
time (``use_absolute_time=False``), explicit trigger frames, random
skip_frames, videos that never ignite (no tables on either side), 8/10/12/
16-bit containers, non-lane-multiple widths, CIHX start/skip-frame timing,
sudden-slowdown trajectories (the velocity-drop break), and per-file
calibration routing (substring + "A:B" last-integer range patterns,
first-match-wins, over two recordings per trial).

``HSIP_REFERENCE_TRIALS`` overrides the trial count (default 6, ~2s each).
``HSIP_REFERENCE_SEED`` re-seeds the sweep so long soaks can run as many
independent batches: the sandbox VM's XLA:CPU compiler segfaults rarely but
fatally (observed twice across two 500-trial soaks, once mid-execution and
once inside ``backend_compile_and_load``), and a monolithic soak loses every
completed trial to one crash. Each trial also logs its ordinal and drawn
geometry to stderr (visible under ``pytest -s``) so a crash is attributable
to a specific draw.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

from hsip_tpu.io import CihxSpec, FlameSpec, synthesize_flame_video, write_recording
from hsip_tpu.testing import reference_script
from tests.test_reference_differential import (
    _tables,
    ref,  # noqa: F401  (module-scoped fixture, reused)
)

pytestmark = pytest.mark.skipif(
    os.environ.get("HSIP_REFERENCE") != "1" or not reference_script().exists(),
    reason="opt-in differential tier: set HSIP_REFERENCE=1 (needs the "
    "reference checkout and scipy/matplotlib)",
)

_TRIALS = int(os.environ.get("HSIP_REFERENCE_TRIALS", "6"))
_SEED = int(os.environ.get("HSIP_REFERENCE_SEED", "20260816"))


def _draw(rng: np.random.Generator):
    # 12/16/24 fold the centerline band over the image edge for every
    # drawn sigma/kernel combo (band_margin 5-15), driving the reflect
    # row-gather — and, with even kernels, the float64 host fallback —
    # through the actual-reference anchor.
    height = int(rng.choice([12, 16, 24, 32, 48, 64, 96]))
    # 250/255 are deliberately not lane multiples: the Pallas scan pads
    # profile rows to 128 lanes, and this anchors that layout on the
    # actual reference (not just the internal backend-parity suites).
    width = int(rng.choice([250, 255, 256, 384, 512]))
    n_frames = int(rng.integers(28, 56))
    ignition = int(rng.integers(1, 6))
    bit_depth = int(rng.choice([8, 10, 12, 16]))
    record_rate = int(rng.choice([20_000, 50_000, 100_000]))
    # PFV4 absolute time is (start_frame + i*skip_frame)/fps — both fields
    # come from the CIHX XML on both sides, and skip_frame scales every dt
    # (so all velocity columns, the DDT latch, and the velocity-drop break
    # shift with it). Negative start_frame = pre-trigger recording start.
    start_frame = int(rng.choice([-12, 0, 0, 7]))
    skip_frame = int(rng.choice([1, 1, 2, 4]))
    full_scale = 2**bit_depth - 1
    # Jump mode: none / DDT speed-up / sudden slowdown / full stall. The
    # slowdown case fuzzes the >50% velocity-drop break (+ its retroactive
    # central-diff invalidation); whether the break actually fires depends
    # on the drawn calibration and record rate — both sides must agree
    # either way. The post-jump speed stays positive (slowdown) or exactly
    # zero (stall: v1 == 0.0 for every later step, the falsy-velocity
    # regime that crashes the reference's own figure renderer and drives
    # the drop ratio to exactly 1.0) — both are rightward-monotone so the
    # search bounds stay valid; the sharp edge keeps the drop in one step.
    mode = rng.choice(["none", "ddt", "slowdown", "stall"],
                      p=[0.3, 0.35, 0.2, 0.15])
    v0 = float(rng.uniform(5.0, 9.0)) if mode in ("slowdown", "stall") \
        else float(rng.uniform(2.5, 9.0))
    flame = FlameSpec(
        x0=float(rng.uniform(10, 40)),
        v0_px=v0,
        accel_px=(0.0 if mode in ("slowdown", "stall")
                  else float(rng.uniform(0.0, 0.12))),
        ddt_frame=int(rng.integers(12, 24)) if mode != "none" else None,
        v_jump_px=(
            float(rng.uniform(16, 28)) if mode == "ddt"
            else -(v0 - float(rng.uniform(0.5, 1.5))) if mode == "slowdown"
            else -v0 if mode == "stall"
            else 0.0
        ),
        ignition_frame=ignition,
        # ~1 in 8 recordings is fully dark (bg exactly 0): the background
        # scalar then hits the noise-threshold floor on both sides.
        background_level=(0 if rng.random() < 0.125
                          else int(rng.integers(20, 70))),
        background_noise=int(rng.integers(2, 10)),
        # ~1 in 8 flames saturates at exactly full scale: wide clipped
        # plateaus make the profiles tie-heavy, stressing first-occurrence
        # argmax/argmin ordering through the reference anchor.
        flame_level=(full_scale if rng.random() < 0.125
                     else int(float(rng.uniform(0.55, 0.95)) * full_scale)),
        edge_width_px=(
            float(rng.uniform(0.8, 1.5)) if mode in ("slowdown", "stall")
            else float(rng.uniform(1.2, 3.5))
        ),
        seed=int(rng.integers(0, 2**31)),
    )
    detector = dict(
        frame_diff_threshold=float(rng.choice([2.0, 5.0, 8.0])),
        morphology_kernel_size=int(rng.choice([2, 3, 4, 5])),
        gaussian_sigma=float(rng.choice([0.8, 1.5, 2.5])),
        min_gradient_strength=float(rng.choice([5.0, 10.0, 20.0])),
        sobel_threshold_fraction=float(rng.choice([0.05, 0.1, 0.2])),
        max_velocity_change_m_s=float(rng.choice([120.0, 200.0, 400.0])),
        ddt_velocity_jump_m_s=float(rng.choice([900.0, 1250.0])),
        search_window_px=int(rng.choice([60, 100, 160])),
        exit_margin_px=int(rng.choice([10, 15, 25])),
        edge_margin_px=int(rng.choice([0, 4, 10, 20])),
        # Plot-only by contract — drawn to prove tables stay identical
        # whichever way the spline knobs fall.
        use_spline_estimator=bool(rng.random() < 0.7),
        spline_smoothing=float(rng.choice([0.2, 0.5, 1.0])),
        min_points_for_spline=int(rng.choice([4, 5, 8])),
    )
    # Per-file calibration rules: substring and "A:B" range patterns
    # (ranges compare the LAST integer in the filename — the trailing
    # 001/002 here), first match wins, default calibration as fallback.
    # Entries may match one file, both, or neither.
    pattern_pool = ["-001", "-002", "1:1", "2:2", "1:2", "no-such-run"]
    file_cals = [
        dict(
            calibration=float(rng.choice([0.0004, 0.00075, 0.0009])),
            position_offset=float(rng.uniform(0.0, 2.0)),
            files=[str(rng.choice(pattern_pool))],
        )
        for _ in range(int(rng.integers(0, 3)))
    ]
    source = dict(
        calibration=float(rng.choice([0.0005, 0.000833333, 0.000869565])),
        position_offset=float(rng.uniform(0.0, 1.5)),
        use_absolute_time=bool(rng.random() < 0.7),
        trigger_frame=(
            None if rng.random() < 0.6 else int(rng.integers(0, n_frames // 2))
        ),
        skip_frames=sorted(
            int(i)
            for i in rng.choice(n_frames, size=rng.integers(0, 3), replace=False)
        ),
    )
    return (height, width, n_frames, bit_depth, record_rate,
            start_frame, skip_frame, flame, detector, source, file_cals)


def _run_reference(ref, video_dir, out_dir, detector_kwargs, source_kwargs,
                   file_cals=()):
    config = ref.VideoSourceConfig(
        name="fuzz", enabled=True,
        file_calibrations=[ref.FileCalibration(**fc) for fc in file_cals],
        **source_kwargs,
    )
    config.video_path = str(video_dir)
    config.output_dir = str(out_dir)
    real_cls = ref.FlameDetectorConfig

    def _factory(**_hardcoded):
        # process_videos.py:1417 constructs its detector config inline with
        # fixed kwargs; redirect it to this trial's drawn tunables.
        return real_cls(**detector_kwargs)

    ref.FlameDetectorConfig = _factory
    try:
        ref.process_video_source(config, processor=None)
    finally:
        ref.FlameDetectorConfig = real_cls


def _run_ours(video_dir, out_dir, detector_kwargs, source_kwargs, backend,
              file_cals=()):
    import hsip_tpu.track.config as cfg
    from hsip_tpu.pipeline import process_video_source

    config = cfg.VideoSourceConfig(
        name="fuzz",
        enabled=True,
        save_frame_images=False,
        save_stacked_sequences=False,
        file_calibrations=[cfg.FileCalibration(**fc) for fc in file_cals],
        **source_kwargs,
    )
    config.video_path = str(video_dir)
    config.output_dir = str(out_dir)
    process_video_source(
        config,
        detector_config=cfg.FlameDetectorConfig(**detector_kwargs),
        backend=backend,
        verbose=False,
    )


def test_randomized_differential_sweep(ref, tmp_path):  # noqa: F811
    import sys

    rng = np.random.default_rng(_SEED)
    for trial in range(_TRIALS):
        (height, width, n_frames, bit_depth, record_rate, start_frame,
         skip_frame, flame, detector_kwargs, source_kwargs,
         file_cals) = _draw(rng)
        print(
            f"fuzz seed={_SEED} trial={trial}/{_TRIALS} "
            f"{height}x{width}x{n_frames} {bit_depth}-bit @{record_rate} "
            f"start={start_frame} skip={skip_frame}",
            file=sys.stderr, flush=True,
        )
        vdir = tmp_path / f"t{trial}" / "videos"
        frames, _ = synthesize_flame_video(
            n_frames, height=height, width=width, flame=flame
        )
        spec = CihxSpec(
            width=width, height=height, total_frames=n_frames,
            record_rate=record_rate, bit_depth=bit_depth,
            start_frame=start_frame, skip_frame=skip_frame,
        )
        clipped = np.clip(frames, 0, 2**bit_depth - 1)
        # Two recordings whose trailing integers (1, 2) the drawn
        # calibration patterns key on; same pixels, so any table
        # difference between them is purely calibration routing.
        write_recording(vdir, f"fuzz-run-{trial}-001", clipped, spec=spec)
        write_recording(vdir, f"fuzz-run-{trial}-002", clipped, spec=spec)
        ref_out = tmp_path / f"t{trial}" / "ref"
        _run_reference(ref, vdir, ref_out, detector_kwargs, source_kwargs,
                       file_cals)
        expected = _tables(ref_out)
        for backend in ("tpu", "device"):
            ours_out = tmp_path / f"t{trial}" / f"ours-{backend}"
            _run_ours(vdir, ours_out, detector_kwargs, source_kwargs, backend,
                      file_cals)
            ours = _tables(ours_out)
            ctx = (
                f"trial {trial} backend={backend} {height}x{width}x{n_frames} "
                f"{bit_depth}-bit @{record_rate}fps "
                f"start={start_frame} skip={skip_frame} "
                f"detector={detector_kwargs} source={source_kwargs} "
                f"file_cals={file_cals}"
            )
            assert set(ours) == set(expected), ctx
            for name in sorted(expected):
                assert ours[name] == expected[name], f"{name} differs: {ctx}"
