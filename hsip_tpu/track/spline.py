"""Cubic smoothing spline (Reinsch / Green–Silverman), scipy-free.

Drop-in analogue of the reference's ``scipy.interpolate.UnivariateSpline``
position predictor (``scripts/process_videos.py:287-315``). The reference
feeds FITPACK a smoothing factor ``s``; here the same ``s`` is used as the
target residual sum of squares and the roughness weight ``alpha`` is solved
by bisection so that ``sum((g(x_i) - y_i)^2) == s``.

Deviation from FITPACK (documented, plot-only impact): FITPACK places a
reduced knot set adaptively; this implementation keeps a knot at every data
point and smooths via the roughness penalty. ``pos_spline_predicted`` and the
plotted spline curve may differ by a few pixels from scipy; the tracker's
``final_position`` never consumes the spline (reference behavior), so output
tables are unaffected.

The linear algebra is an O(n) symmetric pentadiagonal LDLᵀ solve, so refitting
per frame over a growing history stays cheap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["SmoothingSpline", "fit_smoothing_spline"]


def _solve_penta_sym(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Solve A x = b for symmetric positive-definite pentadiagonal A.

    ``d0`` is the main diagonal (n,), ``d1`` the first sub/super-diagonal
    (n-1,), ``d2`` the second (n-2,). LDLᵀ factorization, O(n).
    """
    n = d0.size
    if n == 0:
        return b.copy()
    d = np.empty(n)
    l1 = np.zeros(max(n - 1, 0))
    l2 = np.zeros(max(n - 2, 0))

    d[0] = d0[0]
    if n > 1:
        l1[0] = d1[0] / d[0]
        d[1] = d0[1] - l1[0] ** 2 * d[0]
    for i in range(2, n):
        l2[i - 2] = d2[i - 2] / d[i - 2]
        l1[i - 1] = (d1[i - 1] - l1[i - 2] * l2[i - 2] * d[i - 2]) / d[i - 1]
        d[i] = (
            d0[i]
            - l1[i - 1] ** 2 * d[i - 1]
            - l2[i - 2] ** 2 * d[i - 2]
        )

    # Forward: L z = b
    z = b.astype(np.float64).copy()
    for i in range(1, n):
        z[i] -= l1[i - 1] * z[i - 1]
        if i >= 2:
            z[i] -= l2[i - 2] * z[i - 2]
    # Diagonal
    z /= d
    # Backward: Lᵀ x = z
    for i in range(n - 2, -1, -1):
        z[i] -= l1[i] * z[i + 1]
        if i + 2 < n:
            z[i] -= l2[i] * z[i + 2]
    return z


class SmoothingSpline:
    """Natural cubic smoothing spline g(x) fitted to (x, y).

    Attributes:
        x: knot abscissae (strictly increasing).
        g: fitted values at the knots.
        m: second derivatives at the knots (natural: m[0] == m[-1] == 0).
    """

    def __init__(self, x: np.ndarray, g: np.ndarray, m: np.ndarray):
        self.x = x
        self.g = g
        self.m = m

    def __call__(self, xq) -> np.ndarray:
        """Evaluate at query points; end segments extend beyond the data
        (polynomial extrapolation, matching FITPACK's ext=0 behavior)."""
        xq_arr = np.atleast_1d(np.asarray(xq, dtype=np.float64))
        x, g, m = self.x, self.g, self.m
        idx = np.clip(np.searchsorted(x, xq_arr) - 1, 0, x.size - 2)
        x0, x1 = x[idx], x[idx + 1]
        h = x1 - x0
        t0 = x1 - xq_arr
        t1 = xq_arr - x0
        val = (
            (t0 * g[idx] + t1 * g[idx + 1]) / h
            + (t0**3 / h - h * t0) * m[idx] / 6.0
            + (t1**3 / h - h * t1) * m[idx + 1] / 6.0
        )
        if np.isscalar(xq) or np.ndim(xq) == 0:
            return float(val[0])
        return val

    @property
    def residual(self) -> float:
        """Sum of squared residuals at the knots (set at fit time)."""
        return self._residual

    _residual: float = 0.0


def fit_smoothing_spline(
    x: np.ndarray,
    y: np.ndarray,
    s: float,
    max_iter: int = 60,
) -> Optional[SmoothingSpline]:
    """Fit a natural cubic smoothing spline with target residual ``s``.

    Finds the smoothest natural cubic spline whose sum of squared residuals
    equals ``s`` (interpolating when s <= 0; the least-squares line when even
    maximal smoothing can't reach residual ``s``). Returns None for
    degenerate inputs (fewer than 4 points or duplicate abscissae) — callers
    treat that as "no spline", mirroring the reference's silent-fail contract.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    if n < 4 or np.any(np.diff(x) <= 0):
        return None

    h = np.diff(x)  # (n-1,)
    # R: (n-2)x(n-2) tridiagonal; Q: n x (n-2). Banded representations.
    r0 = (h[:-1] + h[1:]) / 3.0          # R main diagonal
    r1 = h[1:-1] / 6.0                   # R off diagonal
    # Qᵀ rows: [1/h_{j-1}, -1/h_{j-1}-1/h_j, 1/h_j] at columns j-1, j, j+1.
    qa = 1.0 / h[:-1]
    qb = -1.0 / h[:-1] - 1.0 / h[1:]
    qc = 1.0 / h[1:]

    def qty(vec: np.ndarray) -> np.ndarray:
        return qa * vec[:-2] + qb * vec[1:-1] + qc * vec[2:]

    def q_gamma(gam: np.ndarray) -> np.ndarray:
        out = np.zeros(n)
        out[:-2] += qa * gam
        out[1:-1] += qb * gam
        out[2:] += qc * gam
        return out

    # QᵀQ bands (pentadiagonal symmetric).
    qtq0 = qa**2 + qb**2 + qc**2
    qtq1 = qb[:-1] * qa[1:] + qc[:-1] * qb[1:]
    qtq2 = qc[:-2] * qa[2:]

    qy = qty(y)

    def solve_for(alpha: float):
        d0 = r0 + alpha * qtq0
        d1 = r1 + alpha * qtq1  # size n-3 (system is (n-2) x (n-2))
        d2 = alpha * qtq2       # size n-4
        gamma = _solve_penta_sym(d0, d1, d2, qy)
        g = y - alpha * q_gamma(gamma)
        resid = float(np.sum((y - g) ** 2))
        return gamma, g, resid

    s = max(float(s), 0.0)
    if s <= 0.0:
        gamma, g, resid = solve_for(0.0)
    else:
        # residual(alpha) increases monotonically; bracket then bisect.
        lo, hi = 0.0, 1.0
        for _ in range(200):
            _, _, resid_hi = solve_for(hi)
            if resid_hi >= s:
                break
            hi *= 8.0
        else:  # even huge alpha can't reach s: return the smoothest (≈ line)
            gamma, g, resid = solve_for(hi)
            spline = SmoothingSpline(x, g, np.concatenate([[0.0], gamma, [0.0]]))
            spline._residual = resid
            return spline
        for _ in range(max_iter):
            mid = 0.5 * (lo + hi)
            _, _, resid_mid = solve_for(mid)
            if resid_mid < s:
                lo = mid
            else:
                hi = mid
        gamma, g, resid = solve_for(0.5 * (lo + hi))

    spline = SmoothingSpline(x, g, np.concatenate([[0.0], gamma, [0.0]]))
    spline._residual = resid
    return spline
