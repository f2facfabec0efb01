#!/usr/bin/env python
"""Sweep the Pallas tracking-scan unroll factor (K) on the real chip.

The kernel in ``hsip_tpu/track/pallas_scan.py`` processes K frames per
sequential grid step; larger K amortizes per-step grid/DMA overhead at the
cost of a longer unrolled body. The best K is hardware-dependent, so it is
an env knob (``HSIP_PALLAS_SCAN_K``) rather than a constant. This tool

1. verifies bit-identity against the ``lax.scan`` backend for every swept K
   (any divergence disqualifies that K and fails the run), and
2. times each (V, K) point and prints a table plus the recommended setting.

Run on a reachable TPU backend (the tunnel, or real hardware):

    python tools/chip_autotune.py [--frames 2048] [--width 1024]

and export the recommendation it prints, e.g. ``export HSIP_PALLAS_SCAN_K=8``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

# `python tools/chip_autotune.py` puts tools/ (not the repo root) on
# sys.path, and hsip_tpu is used from the source tree, not installed —
# without this line the round-4 unattended ladder died right here with
# ModuleNotFoundError.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _make_profiles(v, m, w, rng):
    """Synthetic profile batch with a moving peak per video (exit-free)."""
    pos = (10 + 0.35 * np.arange(m)).astype(int) % (w - 40)
    sob = np.zeros((v, m, w), np.float32)
    grad = np.zeros((v, m, w), np.float32)
    for i in range(v):
        jitter = rng.integers(0, 5, size=m)
        p = np.clip(pos + jitter, 0, w - 41)
        sob[i, np.arange(m), p] = 120.0
        grad[i, np.arange(m), p] = -60.0
    fi = np.broadcast_to(np.arange(m, dtype=np.int32), (v, m)).copy()
    empty = np.zeros((v, m), bool)
    hp = np.ones((v, m), bool)
    hp[:, 0] = False
    return fi, sob, grad, empty, hp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--videos", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--ks", type=int, nargs="*", default=[1, 2, 4, 8, 16, 32])
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--allow-cpu", action="store_true",
                    help="plumbing smoke test only; timings are meaningless")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (identity check off-chip)")
    args = ap.parse_args(argv)

    import jax

    if args.allow_cpu:
        # The shell presets JAX_PLATFORMS=axon (and an import hook rewrites
        # env overrides), so off-chip smoke runs must force CPU via config
        # before backend init — see tests/conftest.py for the same dance.
        # Mosaic kernels cannot compile on CPU, so off-chip smoke runs must
        # also go through the Pallas interpreter or every K point fails.
        jax.config.update("jax_platforms", "cpu")
        args.interpret = True
        # Interpret mode runs the kernel in Python: chip-scale defaults
        # would take tens of minutes on the one-CPU dev VM. Shrink any
        # value the user left at its default to true smoke-test size.
        if args.frames == ap.get_default("frames"):
            args.frames = 64
        if args.ks == ap.get_default("ks"):
            args.ks = [1, 2]
        if args.videos == ap.get_default("videos"):
            args.videos = [1]
        if args.repeats == ap.get_default("repeats"):
            args.repeats = 1

    import jax.numpy as jnp

    # (Imported after the platform forcing: pulling in the kernel module
    # initializes the jax backend.)
    from hsip_tpu.track.pallas_scan import MAX_FRAMES_PER_STEP
    from hsip_tpu.utils.backend import is_tpu_backend

    too_big = [k for k in args.ks if k > MAX_FRAMES_PER_STEP]
    if too_big:
        # The HSIP_PALLAS_SCAN_K replay clamps at MAX_FRAMES_PER_STEP, so
        # a recommendation beyond it could never reach the pipeline —
        # refuse rather than sweep (and possibly pick) an unusable point.
        print(f"ERROR: --ks {too_big} exceed the pipeline's replay clamp "
              f"(HSIP_PALLAS_SCAN_K caps at {MAX_FRAMES_PER_STEP})",
              file=sys.stderr)
        return 2

    if not args.allow_cpu and not is_tpu_backend():
        print(f"ERROR: need a TPU backend, got {jax.default_backend()!r}",
              file=sys.stderr)
        return 2

    from hsip_tpu.track.device_scan import device_tracking_scan
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched
    from hsip_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    m, w = args.frames, args.width
    kw = dict(
        width=w,
        min_gradient_strength=np.float32(10.0),
        sobel_threshold_fraction=np.float32(0.1),
        ddt_velocity_jump=np.float32(1250.0),
        edge_margin_px=10,
        search_window_px=100,
        exit_margin_px=15,
    )
    rng = np.random.default_rng(0)
    best = {}
    ref_times = {}
    rows = []
    for v in args.videos:
        fi, sob, grad, empty, hp = _make_profiles(v, m, w, rng)
        # EVERY argument pre-staged on device: a jnp.asarray inside the
        # timed call would add host->device transfers whose tunnel round
        # trips (~25 ms each on bad days) dwarf the kernel itself.
        dev = [jnp.asarray(a) for a in (fi, sob, grad, empty, hp)]
        dev += [jnp.asarray(np.full(v, 8.3e-4, np.float32)),
                jnp.asarray(np.full(v, 1e5, np.float32)),
                jnp.asarray(np.full(v, 3, np.int32))]
        jax.block_until_ready(dev)

        # lax.scan reference: identity anchor + timing floor.
        ref_fn = jax.jit(jax.vmap(
            lambda a, b, c, d, e, f, g, h: device_tracking_scan(
                a, b, c, d, e,
                calibration=f, frame_rate=g, max_displacement_px=h, **kw),
        ))
        ref = ref_fn(*dev)
        jax.block_until_ready(ref)
        t_ref = _time(lambda: ref_fn(*dev), args.repeats)
        ref_times[v] = t_ref
        rows.append((v, "lax.scan", t_ref / m * 1e6, t_ref * 1e3))

        for k in args.ks:
            fn = jax.jit(lambda a, b, c, d, e, f, g, h, _k=k:
                         pallas_tracking_scan_batched(
                             a, b, c, d, e, calibration=f, frame_rate=g,
                             max_displacement_px=h, frames_per_step=_k,
                             interpret=args.interpret, **kw))
            try:
                out = fn(*dev)
                jax.block_until_ready(out)
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                rows.append((v, f"K={k} FAILED ({type(exc).__name__})",
                             float("nan"), float("nan")))
                continue
            for name in ref._fields:
                va = np.asarray(getattr(ref, name))
                vb = np.asarray(getattr(out, name)).astype(va.dtype)
                if not np.array_equal(va, vb):
                    print(f"IDENTITY FAIL V={v} K={k} field={name}",
                          file=sys.stderr)
                    return 1
            t = _time(lambda f=fn: f(*dev), args.repeats)
            rows.append((v, f"K={k}", t / m * 1e6, t * 1e3))
            if v not in best or t < best[v][1]:
                best[v] = (k, t)

    print(f"\nPallas scan sweep — M={m}, W={w} "
          f"(per-step time is per frame per video batch)")
    print(f"{'V':>3}  {'variant':<24} {'us/step':>9} {'total ms':>9}")
    for v, label, us, ms in rows:
        print(f"{v:>3}  {label:<24} {us:>9.2f} {ms:>9.2f}")
    for v, (k, t) in sorted(best.items()):
        print(f"\nbest for V={v}: K={k} ({t / m * 1e6:.2f} us/step)")
    if not best:
        # Every swept point failed to compile/run — the sweep measured
        # nothing, so don't let wrappers (tools/chip_refresh.sh) go green.
        print("ERROR: no K point succeeded; nothing to recommend",
              file=sys.stderr)
        return 1
    k_single = best.get(1, next(iter(best.values())))[0]
    print(f"\nrecommend: export HSIP_PALLAS_SCAN_K={k_single}")

    # Batched-kernel routing crossover: the kernel's grid serializes videos
    # while the vmapped lax.scan vectorizes them, so the kernel wins only up
    # to some per-device batch size. Recommend the largest swept V below
    # which the kernel won at EVERY smaller swept point (routing assumes the
    # win region is a prefix); needs >=2 V points to say anything.
    if len(ref_times) >= 2:
        max_v = 0
        for v in sorted(ref_times):
            if v in best and best[v][1] < ref_times[v]:
                max_v = v
            else:
                break
        if max_v:
            print(f"recommend: export HSIP_PALLAS_BATCH_MAX_V={max_v}")
        else:
            print("note: lax.scan won at every swept V; "
                  "recommend: export HSIP_PALLAS_BATCH_MAX_V=0")
    return 0


def _time(fn, repeats, pipeline=8):
    """Pipelined best-of timing: issue ``pipeline`` dispatches, block once.

    A synchronous block_until_ready through the dev tunnel costs anywhere
    from ~0.1 to ~25 ms in round-trip latency alone — more than the
    kernels being swept. Amortizing the sync over a batch of dispatches
    measures device throughput, which is what the K sweep ranks.
    """
    import jax

    jax.block_until_ready([fn() for _ in range(2)])  # fill the pipeline
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready([fn() for _ in range(pipeline)])
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return best


if __name__ == "__main__":
    sys.exit(main())
