"""Driver-contract tests for bench.py.

The driver runs ``python bench.py`` at the end of every round and needs ONE
parseable JSON line on stdout in every outcome: a measured number on a live
backend, a labeled number on the CPU fallback, or an error object when every
backend fails. These tests pin that contract so the round's headline
artifact can't bitrot between captured runs.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run_bench(*argv: str, timeout: float = 240.0):
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), *argv],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert lines, f"no stdout; stderr tail: {proc.stderr[-800:]}"
    return proc.returncode, json.loads(lines[-1])


def test_force_cpu_run_emits_labeled_json():
    rc, result = _run_bench(
        "--no-preflight", "--force-cpu",
        "--frames", "16", "--videos", "2",
        "--baseline-sample", "4", "--repeat", "1",
    )
    assert rc == 0
    assert result["metric"] == "mraw_frames_per_sec_per_chip_decode_track"
    assert result["unit"] == "frames/s"
    assert result["value"] > 0
    assert result["vs_baseline"] > 0
    assert result["backend"] == "cpu-fallback"
    assert result["single_video_fps"] > 0
    assert result["library_fps"] > 0
    assert "error" not in result
    # --mode both compares the batched library against the PER-FILE loop
    # over the same recordings (identical bytes per repeat); the artifact
    # must say so and carry the per-repeat samples it claims variance from.
    assert result["single_mode"].startswith("per-file loop")
    assert result["samples"]["per_file_s"], result["samples"]
    assert result["samples"]["library_s"], result["samples"]
    assert result["single_end_to_end_s"] > 0
    assert result["library_end_to_end_s"] > 0


def test_child_timeout_on_cpu_emits_error_json():
    # A timeout shorter than interpreter start-up kills the measurement
    # child; on the (already-fallback) CPU backend there is no further
    # retry, so the contract is rc=1 plus a parseable error object.
    rc, result = _run_bench(
        "--no-preflight", "--force-cpu", "--child-timeout", "0.5",
        "--frames", "16", "--videos", "2",
        "--baseline-sample", "4", "--repeat", "1",
    )
    assert rc == 1
    assert result["metric"] == "mraw_frames_per_sec_per_chip_decode_track"
    assert result["value"] is None
    assert "error" in result


def test_repeats_deadline_guard_decision():
    """The main-repeat guard truncates between pairs under a blown
    budget (keeping the artifact a TPU capture with fewer pairs instead
    of a killed child + CPU retry), and never below the 4 pairs the
    pairwise-ratio IQR needs."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", REPO / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    guard = bench._repeats_deadline_note

    # Healthy weather: 6 pairs done in 200s of a 1500s budget -> keep going.
    assert guard(6, 12, 200.0, 40.0, 1500.0) is None
    # Blown budget: 1000s elapsed, next pair ~120s > 72% of 1500 -> stop.
    note = guard(6, 12, 1000.0, 120.0, 1500.0)
    assert note is not None and "6 of 12" in note
    # Floor: below 4 pairs the guard never fires, whatever the clock says.
    assert guard(3, 12, 1400.0, 200.0, 1500.0) is None
