"""Interleaved A/B of host->device staging shapes on the live link.

Measures, order-alternating so every pair shares tunnel weather:

- ``one``        — ONE blocked put of the whole (V, MB<<20) batch.
- ``train_blk``  — V per-video puts, each blocked before the next.
- ``freerun``    — V per-video puts, each consumed by its own tiny
                   program, input ref dropped, ONE block at the end
                   (the per-file loop's proven map-phase shape).
- ``lazy_tuple`` — V per-video UNBLOCKED puts consumed by ONE program
                   (the fused library's put_train shape).

This is the measurement behind ``_staging_mode``'s routing
(hsip_tpu/track/fused.py): on the dev tunnel (lazily staged puts),
``lazy_tuple``/``freerun`` sustain ~2x the rate of ``one``/``train_blk``
— concurrency of in-flight transfers, not put size, sets the rate.
Run: python tools/wire_shape_ab.py [V] [MB] [reps]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    MB = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    per = [np.random.randint(0, 255, size=(MB << 20,), dtype=np.uint8)
           for _ in range(V)]
    big = np.stack(per)

    consume1 = jax.jit(lambda x: jnp.sum(x, dtype=jnp.uint32))
    consume_n = jax.jit(
        lambda xs: sum(jnp.sum(x, dtype=jnp.uint32) for x in xs))
    # Warm with the TIMED shapes (jit caches on shape): warming on
    # stand-in sizes left a recompile inside rep 0 of the freerun/
    # lazy_tuple sections, biasing against the modes that won (ADVICE
    # r4) — the wire cost of a real-shape warm-up is what it costs.
    w = jax.device_put(per[0])
    jax.block_until_ready(consume1(w))
    del w
    bufs = tuple(jax.device_put(p) for p in per)
    jax.block_until_ready(consume_n(bufs))
    del bufs

    def one():
        t0 = time.perf_counter()
        b = jax.device_put(big)
        jax.block_until_ready(b)
        del b
        return time.perf_counter() - t0

    def train_blk():
        t0 = time.perf_counter()
        for i in range(V):
            jax.block_until_ready(jax.device_put(per[i]))
        return time.perf_counter() - t0

    def freerun():
        t0 = time.perf_counter()
        outs = []
        for i in range(V):
            b = jax.device_put(per[i])
            outs.append(consume1(b))
            del b
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    def lazy_tuple():
        t0 = time.perf_counter()
        bufs = tuple(jax.device_put(per[i]) for i in range(V))
        r = consume_n(bufs)
        del bufs
        jax.block_until_ready(r)
        return time.perf_counter() - t0

    modes = [("one", one), ("train_blk", train_blk),
             ("freerun", freerun), ("lazy_tuple", lazy_tuple)]
    res = {k: [] for k, _ in modes}
    for rep in range(reps):
        order = modes if rep % 2 == 0 else modes[::-1]
        for name, fn in order:
            res[name].append(round(fn(), 3))
    tot = V * MB
    for k, v in res.items():
        med = sorted(v)[len(v) // 2]
        print(f"{k} {v} median {med}s = {tot / med:.0f} MB/s")


if __name__ == "__main__":
    main()
