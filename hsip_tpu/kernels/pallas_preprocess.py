"""Pallas fused band-preprocess kernel (TPU Mosaic).

One `pallas_call` fuses the whole per-frame chain — frame differencing,
threshold, grey opening, separable Gaussian blur, Sobel + centerline
gradient — over a (B, W) band held in VMEM, with the differencing PRIOR
band gathered by a scalar-prefetch index map (each grid step pulls its own
frame's band and its prior's band straight from HBM into VMEM; the prior
index is data, not control flow).

Contract-identical to the jnp reference
(:func:`hsip_tpu.kernels.preprocess.diff_profiles_from_band` composed with
the diff/threshold step); validated against it in tests (interpret mode on
CPU, compiled on TPU). Grid: one program per frame; block shape
(1, B, W) with the raw width passed through — Mosaic handles trailing-dim
lane tiling for non-128-multiple widths (verified on chip at W=136/520/
1000).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import band_margin, gaussian_taps

__all__ = ["pallas_band_profiles"]


def _reflect_pad_w(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Symmetric (scipy 'reflect') pad along the last axis.

    Built from static single-column slices — neither jnp.pad(mode=
    'symmetric') nor negative-stride flips (lax.rev) lower inside Pallas
    TPU kernels; left/right are small static radii so the concat unrolls.
    """
    w = x.shape[-1]
    parts = []
    for j in range(left - 1, -1, -1):  # columns left-1 .. 0 (mirrored)
        parts.append(x[..., j : j + 1])
    parts.append(x)
    for j in range(w - 1, w - 1 - right, -1):  # columns w-1 .. w-right
        parts.append(x[..., j : j + 1])
    return jnp.concatenate(parts, axis=-1)


def _open_rows(x, k, op):
    """Sliding min/max along rows (axis 0), VALID — window placement
    (erosion vs dilation origin) is absorbed by the VALID crop accounting
    in band_margin, so rows need no origin flag."""
    nrows = x.shape[0]
    out = x[0 : nrows - k + 1]
    for off in range(1, k):
        out = op(out, x[off : off + nrows - k + 1])
    return out


def _open_w(x, k, op, dilation, w):
    """Sliding min/max along width with reflect boundary."""
    left = k // 2 if not dilation else k - 1 - k // 2
    right = k - 1 - left
    padded = _reflect_pad_w(x, left, right)
    out = padded[..., 0:w]
    for off in range(1, k):
        out = op(out, padded[..., off : off + w])
    return out


def _make_kernel(k: int, taps: np.ndarray, width: int):
    ntaps = taps.shape[0]
    radius = (ntaps - 1) // 2
    taps_f = [float(t) for t in taps]

    def kernel(pidx_ref, thresh_ref, band_ref, prior_ref, sobel_ref, grad_ref,
               intens_ref):
        cur = band_ref[0]          # (B, W)
        pri = prior_ref[0]
        thresh = thresh_ref[0]

        # Frame differencing + threshold.
        diff = cur - pri
        diff = jnp.where(diff < thresh, 0.0, diff)

        # Grey opening: erosion (min) then dilation (max), k x k flat,
        # reflect along W, VALID along rows (band margins absorb it).
        ero = _open_w(diff, k, jnp.minimum, False, width)
        ero = _open_rows(ero, k, jnp.minimum)
        opened = _open_w(ero, k, jnp.maximum, True, width)
        opened = _open_rows(opened, k, jnp.maximum)

        # Separable Gaussian: horizontal reflect, vertical VALID.
        padded = _reflect_pad_w(opened, radius, radius)
        out_h = taps_f[0] * padded[..., 0:width]
        for j in range(1, ntaps):
            out_h = out_h + taps_f[j] * padded[..., j : j + width]
        nrows = out_h.shape[0]
        blur = taps_f[0] * out_h[0 : nrows - ntaps + 1]
        for j in range(1, ntaps):
            blur = blur + taps_f[j] * out_h[j : j + nrows - ntaps + 1]
        # blur is (3, W): rows center-1, center, center+1.

        # Sobel(axis=1): [1,2,1] vertical onto center row, [-1,0,1] horizontal.
        # All intermediates stay 2-D (1, W) — 1-D vectors break Mosaic's
        # layout inference on TPU.
        smoothed = blur[0:1] + 2.0 * blur[1:2] + blur[2:3]
        spad = _reflect_pad_w(smoothed, 1, 1)
        sobel_ref[0] = spad[:, 2 : width + 2] - spad[:, 0:width]

        # np.gradient on the center row.
        center = blur[1:2]
        left_edge = center[:, 1:2] - center[:, 0:1]
        interior = (center[:, 2:width] - center[:, 0 : width - 2]) * 0.5
        right_edge = center[:, width - 1 : width] - center[:, width - 2 : width - 1]
        grad_ref[0] = jnp.concatenate([left_edge, interior, right_edge], axis=1)

        # Blurred diff centerline intensity (profile-detector input).
        intens_ref[0] = center

    return kernel


@partial(
    jax.jit,
    static_argnames=("morphology_kernel_size", "gaussian_sigma", "interpret"),
)
def pallas_band_profiles(
    band: jnp.ndarray,
    prior_index: jnp.ndarray,
    frame_diff_threshold: jnp.ndarray,
    morphology_kernel_size: int = 3,
    gaussian_sigma: float = 1.5,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused Pallas chain: bands (N, B, W) → centerline
    (sobel (N, W), gradient (N, W), intensity (N, W)).

    ``band`` holds each frame's background-subtracted centerline band
    (B = 2*band_margin+1 rows); ``prior_index`` (N,) int32 selects each
    frame's differencing prior within the batch (clamped ≥ 0; rows with no
    prior are zeroed by the caller, matching the jnp kernel's contract).
    """
    n, b, w = band.shape
    k = morphology_kernel_size
    taps = gaussian_taps(gaussian_sigma)
    expected_b = 2 * band_margin(k, gaussian_sigma) + 1
    if b != expected_b:
        raise ValueError(f"band height {b} != expected {expected_b}")

    kernel = _make_kernel(k, taps, w)
    prior_clamped = jnp.maximum(prior_index, 0).astype(jnp.int32)
    thresh_arr = jnp.full((1,), frame_diff_threshold, dtype=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # prior_index, threshold
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, b, w), lambda i, pidx, th: (i, 0, 0)),
            pl.BlockSpec((1, b, w), lambda i, pidx, th: (pidx[i], 0, 0)),
        ],
        out_specs=[
            # (N, 1, W) so each program's block has its trailing two dims
            # equal to the array dims (Mosaic tiling constraint).
            pl.BlockSpec((1, 1, w), lambda i, pidx, th: (i, 0, 0)),
            pl.BlockSpec((1, 1, w), lambda i, pidx, th: (i, 0, 0)),
            pl.BlockSpec((1, 1, w), lambda i, pidx, th: (i, 0, 0)),
        ],
    )
    sobel, grad, intensity = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, w), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, w), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, w), jnp.float32),
        ],
        interpret=interpret,
    )(prior_clamped, thresh_arr, band, band)
    return sobel[:, 0], grad[:, 0], intensity[:, 0]
