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
import importlib.util
import io
import json
import os
import shutil
import sys
import tempfile
import time
import types
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE_ROOT = Path(os.environ.get("HSIP_REFERENCE_ROOT", "/root/reference"))


def _install_pymraw_shim() -> None:
    """``pyMRAW.load_video`` from this framework's reader (contract at
    reference ``src/photron/video.py:20-26,332``)."""
    if "pyMRAW" in sys.modules:
        return
    shim = types.ModuleType("pyMRAW")

    def load_video(path):
        from hsip_tpu.io.cihx import read_header
        from hsip_tpu.io.mraw import MRAWReader, find_mraw_payload

        info = read_header(path)
        storage_bits = int(
            info.get("Color Bit") or info.get("EffectiveBit Depth", 16)
        )
        reader = MRAWReader(
            find_mraw_payload(path),
            int(info["Image Width"]),
            int(info["Image Height"]),
            storage_bits,
            total_frames=(
                int(info["Total Frame"]) if "Total Frame" in info else None
            ),
        )
        try:
            images = reader.read_frames(slice(0, len(reader)))
        finally:
            reader.close()
        return images, info

    shim.load_video = load_video
    sys.modules["pyMRAW"] = shim


def _load_reference(with_figures: bool):
    script = REFERENCE_ROOT / "scripts" / "process_videos.py"
    if not script.exists():
        print(json.dumps({
            "metric": "reference_serial_frames_per_sec",
            "error": f"reference checkout not found at {REFERENCE_ROOT}",
        }))
        raise SystemExit(1)
    import matplotlib

    matplotlib.use("Agg")
    _install_pymraw_shim()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    spec = importlib.util.spec_from_file_location("ref_process_videos", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not with_figures:
        mod.save_frame_image = lambda *a, **k: None
        mod.generate_stacked_sequence = lambda *a, **k: None
        mod.generate_stacked_sequence_single_column = lambda *a, **k: None
    return mod


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
