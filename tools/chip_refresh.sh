#!/usr/bin/env bash
# One-command real-chip validation + benchmark refresh. Run when the TPU
# tunnel is reachable (first backend init can take ~40 s):
#
#   bash tools/chip_refresh.sh
#
# 1. Real-chip tier: Pallas band-kernel bit-identity, three-backend row
#    parity, library byte-identity, band-kernel roofline, lax.scan latency
#    guard, and the Pallas tracking-scan identity + >=2x latency gate.
# 2. Driver benchmark (both modes, one JSON line on stdout).
#
# After a green run, refresh BASELINE.md's "Measured" table from the
# bench output and the SCAN/PALLAS_US_PER_STEP lines in the tier log.
set -euo pipefail
cd "$(dirname "$0")/.."

# Each step is time-bounded so an unattended run can't wedge on a tunnel
# that drops mid-way (init hangs rather than fails when it's down).
echo "== HSIP_TPU_CHIP tier =="
# -s: the tier's [chip] measurement echoes (KERNEL_MS, *_US_PER_STEP)
# must reach this log on PASSING tests, not just failures.
# 2700 s outer bound: two heavy subprocess checks can each run to their
# 900 s weather-tolerant cap before the quick ones.
timeout 2700 env HSIP_TPU_CHIP=1 python -m pytest tests/test_tpu_chip.py -v -rs -s

echo "== Pallas scan sweep (pick HSIP_PALLAS_SCAN_K + batch crossover) =="
SWEEP_LOG=$(mktemp)
trap 'rm -f "$SWEEP_LOG"' EXIT
timeout 1800 python tools/chip_autotune.py --videos 1 2 4 8 | tee "$SWEEP_LOG"
# `|| true`: under set -e a no-match grep (recommendation line reworded)
# must fall through to the code default, not abort before the bench.
K=$(grep -oE 'HSIP_PALLAS_SCAN_K=[0-9]+' "$SWEEP_LOG" | tail -1 | cut -d= -f2 || true)
K=${K:-8}  # matches default_frames_per_step()'s unset prior
V=$(grep -oE 'HSIP_PALLAS_BATCH_MAX_V=[0-9]+' "$SWEEP_LOG" | tail -1 | cut -d= -f2 || true)
V=${V:-8}  # matches batched_kernel_max_videos()'s unset default

echo "== bench.py (both modes, tuned K=$K, kernel batch max V=$V) =="
# The outer bound must cover bench's worst case: preflight (~150 s) plus
# one TPU child AND one labeled CPU retry, each capped at --child-timeout
# (a tunnel that answers the preflight and dies mid-run burns the full
# child budget before the retry starts). 150 + 2*900 < 3600, and 900 s
# still fits a healthy chip run with tunnel-slowed first compiles.
timeout 3600 env HSIP_PALLAS_SCAN_K="$K" HSIP_PALLAS_BATCH_MAX_V="$V" \
    python bench.py --child-timeout 900
