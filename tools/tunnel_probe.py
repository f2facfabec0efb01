"""Microbenchmark H2D put patterns over the dev tunnel (or real HBM).

The library pipeline's throughput is set by how fast per-video band
payloads reach the device. The tunnel's effective rate depends on the put
PATTERN (CLAUDE.md: ~150-450 MB/s free-running, ~6x collapse when device
buffers are held while new puts are issued), so this probe times the
patterns the staging design chooses between:

  seq          N sequential puts, block at the end (free-run baseline)
  seq-held     same, but N device output buffers from a prior dispatch are
               held alive across the puts (the library 'keep_device' shape)
  threads-T    N puts from T concurrent threads (the round-2 map pool shape)
  seq-compute  sequential puts, each followed by a band-kernel dispatch on
               the put buffer, outputs held (full library staging shape)

Usage: python tools/tunnel_probe.py [--mb 60] [--n 8] [--repeat 2]
Prints one JSON line per pattern: {"pattern", "mb_s", "seconds"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=60.0,
                    help="payload size per put (MiB)")
    ap.add_argument("--n", type=int, default=8, help="puts per pattern")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    nbytes = int(args.mb * (1 << 20))
    # Distinct host payloads (uint8, like packed MRAW bands).
    payloads = [
        np.random.randint(0, 255, nbytes, dtype=np.uint8)
        for _ in range(args.n)
    ]
    total_mb = args.mb * args.n

    @jax.jit
    def small_reduce(x):
        # Touches every byte, returns a scalar — a stand-in for the band
        # kernel's read-all-write-little shape without its compile cost.
        return jnp.sum(x.astype(jnp.uint32))

    def timed(fn):
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def report(pattern, seconds):
        print(json.dumps({
            "pattern": pattern,
            "seconds": round(seconds, 3),
            "mb_s": round(total_mb / seconds, 1),
        }))

    # warm-up: one put + reduce compiles and opens the transfer path
    jax.block_until_ready(small_reduce(jax.device_put(payloads[0])))

    def seq():
        bufs = [jax.device_put(p) for p in payloads]
        jax.block_until_ready(bufs)
        return bufs

    report("seq", timed(seq))

    held = [small_reduce(jax.device_put(p)) for p in payloads]
    jax.block_until_ready(held)

    def seq_held():
        bufs = [jax.device_put(p) for p in payloads]
        jax.block_until_ready(bufs)
        return bufs

    report("seq-held", timed(seq_held))
    del held

    def threads():
        with ThreadPoolExecutor(max_workers=args.threads) as pool:
            bufs = list(pool.map(jax.device_put, payloads))
        jax.block_until_ready(bufs)
        return bufs

    report(f"threads-{args.threads}", timed(threads))

    def seq_compute():
        outs = []
        for p in payloads:
            outs.append(small_reduce(jax.device_put(p)))
        jax.block_until_ready(outs)
        return outs

    report("seq-compute", timed(seq_compute))

    def threads_compute():
        def one(p):
            return small_reduce(jax.device_put(p))

        with ThreadPoolExecutor(max_workers=args.threads) as pool:
            outs = list(pool.map(one, payloads))
        jax.block_until_ready(outs)
        return outs

    report(f"threads-{args.threads}-compute", timed(threads_compute))

    # --- payload SHAPE effects (consume-time transfer is what matters) ---
    # The pipeline stages (N, 19, row_bytes) uint8 bands; uint8 tiling pads
    # sublanes to 32 (19 -> 32 = 1.68x wire inflation) and a shaped put may
    # relayout host-side at put time. Compare against flat and 2-D layouts.
    n_rows = nbytes // 1536
    shapes = {
        "flat-u8": lambda p: p,
        "r2d-u8": lambda p: p[: n_rows * 1536].reshape(n_rows, 1536),
        "r3d-u8": lambda p: p[: (n_rows // 19) * 19 * 1536].reshape(
            n_rows // 19, 19, 1536
        ),
        "flat-u32": lambda p: p[: nbytes // 4 * 4].view(np.uint32),
    }
    for label, fn in shapes.items():
        shaped = [fn(p) for p in payloads]
        jax.block_until_ready(small_reduce(jax.device_put(shaped[0])))

        def consume():
            outs = [small_reduce(jax.device_put(s)) for s in shaped]
            jax.block_until_ready(outs)
            return outs

        report(f"consume-{label}", timed(consume))

    def two_phase():
        # The staging discipline under test for the pipeline: a pure put
        # train (nothing else alive), ONE block to land every transfer at
        # the fast rate, then all compute dispatched on RESIDENT buffers.
        bufs = [jax.device_put(p) for p in payloads]
        jax.block_until_ready(bufs)
        outs = [small_reduce(b) for b in bufs]
        jax.block_until_ready(outs)
        return outs

    report("two-phase", timed(two_phase))

    # One big put (the collated-batch staging alternative; host concat cost
    # reported separately — the dev host memcpy is itself ~0.1-0.3 GB/s).
    t0 = time.perf_counter()
    big = np.concatenate(payloads)
    concat_s = time.perf_counter() - t0

    def one_put():
        jax.block_until_ready(jax.device_put(big))

    report("one-big-put", timed(one_put))
    print(json.dumps({"pattern": "host-concat-cost", "seconds":
                      round(concat_s, 3),
                      "mb_s": round(total_mb / concat_s, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
