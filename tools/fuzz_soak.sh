#!/usr/bin/env bash
# Long reference-fuzz soak, run as independent seeded batches so the sandbox
# VM's rare-but-fatal XLA:CPU compiler segfault (seen twice across two
# monolithic 500-trial soaks) costs one batch, not the whole run.
#
# Usage: tools/fuzz_soak.sh [BATCHES] [TRIALS_PER_BATCH] [BASE_SEED]
# Logs per batch to /tmp/fuzz_soak/batch-<seed>.log; prints a summary line
# per batch and a final tally. Exit 1 if any batch found a real mismatch
# (pytest failure); crashed batches (signal deaths) are reported but do not
# fail the soak by themselves — rerun the printed seed to investigate.
set -u
BATCHES=${1:-10}
TRIALS=${2:-50}
BASE_SEED=${3:-101}
OUT=/tmp/fuzz_soak
mkdir -p "$OUT"
pass=0; crash=0; fail=0
for ((b = 0; b < BATCHES; b++)); do
    seed=$((BASE_SEED + b))
    log="$OUT/batch-$seed.log"
    HSIP_REFERENCE=1 HSIP_REFERENCE_TRIALS=$TRIALS HSIP_REFERENCE_SEED=$seed \
        timeout 2400 python -m pytest tests/test_reference_fuzz.py -q -s \
        >"$log" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then
        pass=$((pass + 1)); status=ok
    elif [ $rc -eq 124 ] || [ $rc -ge 128 ] \
            || grep -q "Segmentation fault" "$log"; then
        # 124 = the timeout(1) cap fired (slow batch, not a mismatch).
        crash=$((crash + 1)); status="CRASH(rc=$rc)"
    else
        fail=$((fail + 1)); status="FAIL(rc=$rc)"
    fi
    last=$(grep "^fuzz seed=" "$log" | tail -1)
    echo "batch seed=$seed: $status  [$last]"
done
echo "soak done: $pass ok, $crash crashed, $fail failed" \
     "($((BATCHES * TRIALS)) trials attempted)"
[ $fail -eq 0 ] || exit 1
