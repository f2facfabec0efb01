#!/usr/bin/env bash
# Poll the axon TPU tunnel and run the full chip refresh the moment it
# answers. Intended for unattended use while the tunnel is down:
#
#   nohup bash tools/tunnel_watch.sh > /tmp/tunnel_watch.log 2>&1 &
#
# Every POLL_S seconds a killable subprocess tries a real backend init
# (devices + one compiled matmul — the same probe bench.py trusts). On
# success it runs tools/chip_refresh.sh once and exits; the refresh log
# lands next to this watcher's log.
set -uo pipefail
cd "$(dirname "$0")/.."

POLL_S=${POLL_S:-600}
PROBE_TIMEOUT_S=${PROBE_TIMEOUT_S:-150}
MAX_S=${MAX_S:-36000}
REFRESH_LOG=${REFRESH_LOG:-/tmp/chip_refresh.log}

start=$(date +%s)
while (( $(date +%s) - start < MAX_S )); do
    if timeout "$PROBE_TIMEOUT_S" python -c "
import sys
import jax
d = jax.devices()
x = jax.numpy.ones((128, 128))
(x @ x).block_until_ready()
print('probe backend:', d[0].platform, len(d), 'device(s)')
# A dead tunnel can fail FAST (connection refused) instead of hanging,
# in which case jax silently initializes the cpu fallback platform —
# exit 0 must mean the accelerator itself answered.
sys.exit(0 if d[0].platform == 'axon' else 4)
"; then
        echo "== tunnel answered; running chip_refresh (log: $REFRESH_LOG) =="
        bash tools/chip_refresh.sh 2>&1 | tee "$REFRESH_LOG"
        exit $?
    fi
    echo "tunnel still down at $(date -u +%H:%M:%S)Z; next probe in ${POLL_S}s"
    sleep "$POLL_S"
done
echo "gave up after ${MAX_S}s without a reachable tunnel"
exit 3
