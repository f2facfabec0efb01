"""Focused probe: per-execute handshake cost for fresh-put consumers.

Hypothesis (from tools/tunnel_probe.py runs): each EXECUTE that consumes
freshly-put buffers pays a ~0.25 s handshake on the axon tunnel on top of
bytes/rate, so the pipeline's win is minimizing the number of such
executes — one executable consuming ALL payloads, not one per video.

Patterns (all repeat best-of-N, one block at the end):
  per-put     8 puts, 8 executes (one per buffer)   — today's library shape
  fused-8in1  8 puts, ONE execute taking all 8      — the planned redesign
  big-1in1    ONE 480 MB put, one execute           — the maximal fusion

Usage: python tools/tunnel_probe2.py [--mb 60] [--n 8] [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=60.0)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    nbytes = int(args.mb * (1 << 20))
    payloads = [
        np.random.randint(0, 255, nbytes, dtype=np.uint8)
        for _ in range(args.n)
    ]
    total_mb = args.mb * args.n

    @jax.jit
    def reduce1(x):
        return jnp.sum(x.astype(jnp.uint32))

    @jax.jit
    def reduce_all(*xs):
        return sum(jnp.sum(x.astype(jnp.uint32)) for x in xs)

    def timed(fn):
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def report(pattern, seconds):
        print(json.dumps({"pattern": pattern, "seconds": round(seconds, 3),
                          "mb_s": round(total_mb / seconds, 1)}))

    # warm-ups compile both executables and open the transfer path
    jax.block_until_ready(reduce1(jax.device_put(payloads[0])))
    jax.block_until_ready(
        reduce_all(*[jax.device_put(p) for p in payloads])
    )

    def per_put():
        outs = [reduce1(jax.device_put(p)) for p in payloads]
        jax.block_until_ready(outs)

    def fused():
        bufs = [jax.device_put(p) for p in payloads]
        jax.block_until_ready(reduce_all(*bufs))

    big = np.concatenate(payloads)
    jax.block_until_ready(reduce1(jax.device_put(big)))

    def big_fused():
        jax.block_until_ready(reduce1(jax.device_put(big)))

    # Interleave the patterns to decorrelate tunnel weather drift.
    t_per, t_fused, t_big = [], [], []
    for _ in range(args.repeat):
        for name, fn, acc in (("per-put", per_put, t_per),
                              ("fused-8in1", fused, t_fused),
                              ("big-1in1", big_fused, t_big)):
            t0 = time.perf_counter()
            fn()
            acc.append(time.perf_counter() - t0)
    report("per-put", min(t_per))
    report("fused-8in1", min(t_fused))
    report("big-1in1", min(t_big))
    print(json.dumps({"all_trials_s": {
        "per-put": [round(t, 2) for t in t_per],
        "fused-8in1": [round(t, 2) for t in t_fused],
        "big-1in1": [round(t, 2) for t in t_big],
    }}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
