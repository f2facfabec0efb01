#!/usr/bin/env bash
# One-command real-chip validation + benchmark refresh. Run when the TPU
# tunnel is reachable (first backend init can take ~40 s):
#
#   bash tools/chip_refresh.sh [round-tag]      # default tag: r5
#
# 1. Real-chip tier: Pallas band-kernel bit-identity, three-backend row
#    parity, library byte-identity, band-kernel roofline, lax.scan latency
#    guard, and the Pallas tracking-scan identity + >=2x latency gate.
# 2. Pallas scan K sweep + batch crossover (tools/chip_autotune.py).
# 3. Driver benchmark (both modes, one JSON line on stdout).
#
# EVERY step's log is archived under docs/evidence/ (chip_tier_TAG.log,
# autotune_TAG.log, bench_TAG.log) — round-4 lesson: the tier ran green
# but its log lived in /tmp and the round shipped with nothing citable.
# A failed step no longer aborts the ladder (round-4 lesson #2: the K
# sweep crashed and the bench never ran); the script runs everything,
# reports per-step status at the end, and exits non-zero if any failed.
set -uo pipefail
cd "$(dirname "$0")/.."

TAG=${1:-r5}
EV=docs/evidence
mkdir -p "$EV"
declare -A STATUS

run_step() {
  local name=$1 log=$2; shift 2
  echo "== $name (log: $log) =="
  if timeout "$@" 2>&1 | tee "$log"; then
    STATUS[$name]=ok
  else
    STATUS[$name]="FAILED (rc=$?)"
  fi
}

# Each step is time-bounded so an unattended run can't wedge on a tunnel
# that drops mid-way (init hangs rather than fails when it's down).
# Tier bound 3900 s: two heavy subprocess checks can each run to their
# 900 s weather-tolerant cap, and the fused grouping sweep to its
# 1200 s cold-compile cap, before the quick ones. -s: the tier's [chip]
# measurement echoes (KERNEL_MS, *_US_PER_STEP) must reach the log on
# PASSING tests, not just failures.
run_step tier "$EV/chip_tier_${TAG}.log" \
  3900 env HSIP_TPU_CHIP=1 python -m pytest tests/test_tpu_chip.py -v -rs -s

run_step sweep "$EV/autotune_${TAG}.log" \
  1800 python tools/chip_autotune.py --videos 1 2 4 8

# `|| true`: a no-match grep (recommendation line reworded, or a failed
# sweep) must fall through to the code defaults, not abort the bench.
K=$(grep -oE 'HSIP_PALLAS_SCAN_K=[0-9]+' "$EV/autotune_${TAG}.log" | tail -1 | cut -d= -f2 || true)
K=${K:-8}  # matches default_frames_per_step()'s unset prior
V=$(grep -oE 'HSIP_PALLAS_BATCH_MAX_V=[0-9]+' "$EV/autotune_${TAG}.log" | tail -1 | cut -d= -f2 || true)
V=${V:-8}  # matches batched_kernel_max_videos()'s unset default

# The outer bound must cover bench's worst case: preflight (~150 s) plus
# one TPU child AND one labeled CPU retry, each capped at --child-timeout
# (a tunnel that answers the preflight and dies mid-run burns the full
# child budget before the retry starts). 150 + 2*1400 < 3600. 1400 s
# fits the 12 interleaved pairs + the V=16 amortization point at healthy
# weather (~1000 s measured shape); the bench's own deadline guard drops
# the V=16 point first when weather eats the budget.
run_step bench "$EV/bench_${TAG}.log" \
  3600 env HSIP_PALLAS_SCAN_K="$K" HSIP_PALLAS_BATCH_MAX_V="$V" \
  python bench.py --child-timeout 1400

echo "== ladder summary (tuned K=$K, kernel batch max V=$V) =="
rc=0
for name in tier sweep bench; do
  echo "  $name: ${STATUS[$name]}"
  [ "${STATUS[$name]}" = ok ] || rc=1
done
echo "logs: $EV/chip_tier_${TAG}.log $EV/autotune_${TAG}.log $EV/bench_${TAG}.log"
exit $rc
