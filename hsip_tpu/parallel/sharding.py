"""Sharded map phase: per-device profile computation with halo exchange.

Replaces the reference's MPI frame scatter (``parallel.py:76-115`` +
per-rank scipy loops) with a ``shard_map`` over a device mesh:

* the (N, H, W) frame batch is sharded along the frame axis;
* each device band-extracts and background-subtracts its shard locally;
* the frame-differencing prior of each shard's FIRST frame lives on the
  neighbor device, so one band row is exchanged with
  ``jax.lax.ppermute`` (a single (1, B, W) message over ICI — the halo);
* profiles come back fully sharded; the host scan consumes them in order.

Contrast with the reference's quirk (SURVEY.md §2.6): MPI ranks computed
frame diffs across stride-``size`` gaps, so parallel results differed from
serial. Here the halo exchange reproduces the serial differencing chain
exactly at any device count.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.preprocess import (
    band_margin,
    diff_profiles_from_band,
    gaussian_taps,
    reflect_indices,
    signal_count,
    subtract_background,
)

__all__ = [
    "sharded_centerline_profiles",
    "make_sharded_profile_fn",
    "shard_band_profiles",
]


def shard_band_profiles(
    frames_local: jnp.ndarray,
    background,
    diff_threshold,
    noise_threshold,
    *,
    rows: np.ndarray,
    margin: int,
    morphology_kernel_size: int,
    taps: np.ndarray,
    axis_name: str,
    n_shards: int,
):
    """Per-device band→profiles body with frame-axis halo exchange.

    ``frames_local`` is this device's (n_local, H, W) contiguous frames;
    frame i's differencing prior is frame i-1 globally — the first local
    frame's prior band arrives from the left neighbor via one ``ppermute``
    message; global frame 0 gets zero profiles (no prior). The SINGLE body
    shared by the production shard fn and the driver dry-run, so the
    dry-run always validates exactly the math production ships.
    Returns (sobel, gradient, intensity, raw_center, counts), all local.
    """
    sub = subtract_background(frames_local, background)
    counts = signal_count(sub, noise_threshold)
    band = sub[:, jnp.asarray(rows), :]  # (n_local, B, W)

    # Halo: ppermute shifts shard s -> s+1 (rightward along the ring).
    last_row = band[-1:]  # (1, B, W)
    halo = jax.lax.ppermute(
        last_row,
        axis_name,
        perm=[(i, (i + 1) % n_shards) for i in range(n_shards)],
    )
    prior_band = jnp.concatenate([halo, band[:-1]], axis=0)

    diff = band - prior_band
    diff = jnp.where(diff < diff_threshold, 0.0, diff)
    sob, grad, intens = diff_profiles_from_band(
        diff, morphology_kernel_size, jnp.asarray(taps)
    )
    raw_center = band[:, margin, :]

    # Global frame 0 (shard 0, local row 0) has no prior: zero it.
    shard_id = jax.lax.axis_index(axis_name)
    is_first = (shard_id == 0) & (
        jax.lax.broadcasted_iota(jnp.int32, sob.shape, 0) == 0
    )
    sob = jnp.where(is_first, 0.0, sob)
    grad = jnp.where(is_first, 0.0, grad)
    intens = jnp.where(is_first, 0.0, intens)
    return sob, grad, intens, raw_center, counts


def make_sharded_profile_fn(
    mesh: Mesh,
    height: int,
    width: int,
    morphology_kernel_size: int = 3,
    gaussian_sigma: float = 1.5,
    center_row: Optional[int] = None,
    axis_name: str = "frame",
):
    """Build a jitted sharded profile function for fixed geometry.

    Returns ``fn(frames, background, frame_diff_threshold, noise_threshold)
    -> (sobel (N, W), gradient (N, W), intensity (N, W), raw_center (N, W),
    counts (N,))`` where ``frames`` is
    (N, H, W) with N divisible by the mesh's frame-axis size. Frame i's
    differencing prior is frame i-1 globally (the serial chain); the global
    frame 0 gets zero profiles (no prior), matching the serial first frame.
    """
    if center_row is None:
        center_row = height // 2
    margin = band_margin(morphology_kernel_size, gaussian_sigma)
    if morphology_kernel_size % 2 == 0 and (
        center_row - margin < 0 or center_row + margin > height - 1
    ):
        raise ValueError(
            "Even morphology kernels with a folding centerline band are not "
            "exact under reflect row-gathering; use the host pipeline for "
            f"this geometry (H={height}, k={morphology_kernel_size})"
        )
    rows = reflect_indices(center_row, margin, height)
    taps_np = gaussian_taps(gaussian_sigma)
    n_shards = mesh.shape[axis_name]

    def per_shard(frames_local, background, diff_threshold, noise_threshold):
        # frames_local: (n_local, H, W) — this device's contiguous frames.
        return shard_band_profiles(
            frames_local, background, diff_threshold, noise_threshold,
            rows=rows, margin=margin,
            morphology_kernel_size=morphology_kernel_size,
            taps=taps_np, axis_name=axis_name, n_shards=n_shards,
        )

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P(), P(), P()),
        out_specs=(
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_centerline_profiles(
    frames: np.ndarray,
    background_scalar: float,
    frame_diff_threshold: float,
    noise_threshold: float,
    mesh: Mesh,
    morphology_kernel_size: int = 3,
    gaussian_sigma: float = 1.5,
    axis_name: str = "frame",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One-shot sharded profile computation (pads N to the shard count).

    Convenience wrapper over :func:`make_sharded_profile_fn`; production
    pipelines build the fn once per geometry and stream chunks through it.
    """
    n, h, w = frames.shape
    n_shards = mesh.shape[axis_name]
    pad = (-n) % n_shards
    if pad:
        frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)], axis=0)

    fn = make_sharded_profile_fn(
        mesh, h, w, morphology_kernel_size, gaussian_sigma, axis_name=axis_name
    )
    sharding = NamedSharding(mesh, P(axis_name, None, None))
    frames_dev = jax.device_put(frames.astype(np.float32), sharding)
    sob, grad, intens, raw_center, counts = fn(
        frames_dev,
        jnp.float32(background_scalar),
        jnp.float32(frame_diff_threshold),
        jnp.float32(noise_threshold),
    )
    return (
        np.asarray(sob)[:n],
        np.asarray(grad)[:n],
        np.asarray(intens)[:n],
        np.asarray(raw_center)[:n],
        np.asarray(counts)[:n],
    )
