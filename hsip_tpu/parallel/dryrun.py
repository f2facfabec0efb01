"""Multi-chip dry-run: the full sharded processing step on tiny shapes.

Validates that the production sharding compiles and executes at a given
device count without real hardware: a 2-D (video × frame) mesh, the
halo-exchange map phase per video, cross-axis collectives, and on-device
candidate extraction (the device half of the scan).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["build_multichip_step", "run_multichip_dryrun"]


def build_multichip_step(mesh, height: int, width: int, axis_frame: str = "frame",
                         axis_video: str = "video"):
    """Jitted full step over a ('video', 'frame') mesh.

    Input: (V, N, H, W) frames, sharded (video, frame, -, -). Per shard:
    background-subtract, band-extract, halo-exchange differencing priors over
    the frame axis, opening→blur→Sobel/gradient centerline profiles, then
    on-device candidate extraction (argmin gradient + rightmost-|Sobel|) and
    a cross-video psum of signal counts (exercises the second mesh axis).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..kernels.preprocess import (
        band_margin,
        diff_profiles_from_band,
        gaussian_taps,
        reflect_indices,
        signal_count,
        subtract_background,
    )

    margin = band_margin(3, 1.5)
    rows = reflect_indices(height // 2, margin, height)
    taps = gaussian_taps(1.5)
    n_frame_shards = mesh.shape[axis_frame]

    def per_shard(frames, background, diff_threshold, noise_threshold):
        # frames: (v_local, n_local, H, W)
        sub = subtract_background(frames, background)
        counts = signal_count(sub, noise_threshold)          # (v_local, n_local)
        band = sub[:, :, jnp.asarray(rows), :]               # (v, n, B, W)

        # Frame-axis halo: previous shard's last band (per video row).
        last = band[:, -1:]
        halo = jax.lax.ppermute(
            last, axis_frame,
            perm=[(i, (i + 1) % n_frame_shards) for i in range(n_frame_shards)],
        )
        prior = jnp.concatenate([halo, band[:, :-1]], axis=1)
        diff = jnp.where(band - prior < diff_threshold, 0.0, band - prior)

        sob, grad, _intens = diff_profiles_from_band(diff, 3, jnp.asarray(taps))

        # Zero the global first frame of each video (no prior).
        fid = jax.lax.axis_index(axis_frame)
        first = (fid == 0) & (
            jax.lax.broadcasted_iota(jnp.int32, sob.shape, 1) == 0
        )
        sob = jnp.where(first, 0.0, sob)
        grad = jnp.where(first, 0.0, grad)

        # On-device candidate extraction (device half of the scan).
        pos_min_grad = jnp.argmin(grad, axis=-1)             # (v, n)
        abs_sob = jnp.abs(sob)
        smax = jnp.max(abs_sob, axis=-1, keepdims=True)
        above = abs_sob > 0.1 * smax
        col = jax.lax.broadcasted_iota(jnp.int32, abs_sob.shape, abs_sob.ndim - 1)
        pos_rightmost = jnp.max(jnp.where(above, col, -1), axis=-1)

        # Cross-video collective: total above-noise pixels across ALL videos
        # and frames (a global run statistic) — psum over both axes.
        total_signal = jax.lax.psum(
            jax.lax.psum(jnp.sum(counts), axis_frame), axis_video
        )
        return pos_min_grad, pos_rightmost, total_signal

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_video, axis_frame, None, None), P(), P(), P()),
        out_specs=(
            P(axis_video, axis_frame),
            P(axis_video, axis_frame),
            P(),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def run_multichip_dryrun(n_devices: int, height: int = 24, width: int = 128,
                         frames_per_shard: int = 2) -> Tuple:
    """Build an ``n_devices`` mesh, jit the full step, run once on tiny shapes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices]
    if len(devices) < n_devices:
        raise RuntimeError(
            f"dryrun_multichip({n_devices}) needs {n_devices} devices, "
            f"found {len(devices)}"
        )
    # Factor the device count into (video, frame) axes — 2 video groups when
    # even (real dp over videos), else a single group.
    v = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    f = n_devices // v
    mesh = Mesh(np.array(devices).reshape(v, f), ("video", "frame"))

    n_frames = f * frames_per_shard
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 4096, size=(v, n_frames, height, width), dtype=np.uint16)

    step = build_multichip_step(mesh, height, width)
    sharding = NamedSharding(mesh, P("video", "frame", None, None))
    frames_dev = jax.device_put(frames, sharding)
    pos_g, pos_s, total = step(
        frames_dev, jnp.float32(100.0), jnp.float32(5.0), jnp.float32(50.0)
    )
    jax.block_until_ready((pos_g, pos_s, total))
    assert pos_g.shape == (v, n_frames)
    assert pos_s.shape == (v, n_frames)
    return np.asarray(pos_g), np.asarray(pos_s), float(np.asarray(total))
