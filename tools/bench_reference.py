#!/usr/bin/env python
"""Measure the ACTUAL reference pipeline's serial throughput on this host.

BASELINE.md's serial row was previously estimated from a "reference-
equivalent scipy chain"; this tool times the reference code itself
(``/root/reference/scripts/process_videos.py:1277`` ``process_video_source``)
on the same synthetic recording ``bench.py`` uses, so the
frames/s comparison is measured on both sides.

Like the differential tier (tests/test_reference_differential.py), the
reference module is loaded at runtime from its own checkout — no code is
copied — and its one missing dependency is satisfied by a tiny ``pyMRAW``
shim backed by this framework's MRAW reader. Two deliberate biases, both
in the REFERENCE'S favor (the number printed is an upper bound on what
the real reference achieves):

1. the shim decodes with our native C++ codec and materializes every
   frame up front, replacing pyMRAW's per-frame lazy memmap unpacking;
2. figure rendering is neutralized by default (the reference renders a
   12-panel matplotlib figure per frame unconditionally,
   ``process_videos.py:1474``, which empirically dominates its runtime) —
   pass ``--with-figures`` for the as-shipped behavior.

Prints one JSON line: {"metric": "reference_serial_frames_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
# hsip_tpu runs from the source tree (not installed); `python tools/...`
# puts tools/ on sys.path, so the root must be added explicitly.
sys.path.insert(0, str(REPO_ROOT))


def _load_reference(with_figures: bool):
    from hsip_tpu.testing import load_reference_module

    try:
        return load_reference_module(neutralize_figures=not with_figures)
    except FileNotFoundError as exc:
        print(json.dumps({
            "metric": "reference_serial_frames_per_sec",
            "error": str(exc),
        }))
        raise SystemExit(1) from exc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--with-figures", action="store_true",
                    help="keep the reference's per-frame 12-panel figures "
                         "(its as-shipped behavior; dominates runtime)")
    ap.add_argument("--verbose", action="store_true",
                    help="pass through the reference's per-file prints")
    args = ap.parse_args(argv)

    sys.path.insert(0, str(REPO_ROOT))
    from bench import build_recording  # bench.py defines THE workload

    ref = _load_reference(with_figures=args.with_figures)
    tmpdir = Path(tempfile.mkdtemp(prefix="hsip-ref-bench-"))
    try:
        build_recording(tmpdir, args.frames, args.height, args.width)
        config = ref.VideoSourceConfig(
            name="bench", enabled=True, calibration=0.000833333,
            position_offset=0.0,
        )
        config.video_path = str(tmpdir)
        best = float("inf")
        for r in range(args.repeats):
            out = tmpdir / f"out-{r}"
            config.output_dir = str(out)
            sink = sys.stdout if args.verbose else io.StringIO()
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(sink):
                ref.process_video_source(config, processor=None)
            best = min(best, time.perf_counter() - t0)
            tables = list(out.glob("*-flame-position.txt"))
            if not tables:
                print(json.dumps({
                    "metric": "reference_serial_frames_per_sec",
                    "error": "reference produced no result table",
                }))
                return 1
        fps = args.frames / best
        print(json.dumps({
            "metric": "reference_serial_frames_per_sec",
            "value": round(fps, 1),
            "unit": "frames/s",
            "detail": (
                f"ACTUAL reference process_video_source, figures "
                f"{'ON' if args.with_figures else 'OFF'}, decode via our "
                f"native codec (favors the reference); frames="
                f"{args.frames} {args.height}x{args.width} 12-bit, best of "
                f"{args.repeats}, wall={best:.2f}s"
            ),
        }))
        return 0
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
