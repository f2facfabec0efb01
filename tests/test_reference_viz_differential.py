"""Differential FIGURE test: structural parity with the reference's plots.

Opt-in tier (``HSIP_REFERENCE=1``): renders the reference's 12-panel
``save_frame_image`` (``scripts/process_videos.py:783-1107``) and this
framework's on the SAME synthetic frame with the SAME detector state, then
compares the figure objects structurally — panel count, per-panel titles,
image-artist counts, and the x-positions of every candidate/search marker
(axvline) — instead of trusting file sizes.

The table-parity tier (test_reference_differential) neutralizes figure
rendering entirely; this module is its visual counterpart.
"""

from __future__ import annotations

import numpy as np
import pytest

from test_reference_differential import (  # noqa: F401 — shared tier gate
    pytestmark,
)

from hsip_tpu.io import CihxSpec, FlameSpec, synthesize_flame_video, write_recording
from hsip_tpu.testing import load_reference_module


@pytest.fixture(scope="module")
def ref_viz():
    """The reference module WITH its figure functions intact."""
    return load_reference_module(
        "ref_process_videos_viz", neutralize_figures=False
    )


@pytest.fixture(scope="module")
def recording(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refviz")
    frames, _ = synthesize_flame_video(
        16, height=48, width=256,
        flame=FlameSpec(x0=25.0, v0_px=9.0, ignition_frame=1, seed=21),
    )
    meta = write_recording(
        tmp, "viz-run-1-001", frames,
        spec=CihxSpec(width=256, height=48, total_frames=16,
                      record_rate=100_000, bit_depth=12),
    )
    return meta


def _vline_positions(ax):
    """x positions of axvline markers (2-point constant-x lines)."""
    out = []
    for line in ax.lines:
        xd = np.asarray(line.get_xdata(), dtype=float)
        if xd.size == 2 and xd[0] == xd[1]:
            out.append(round(float(xd[0]), 6))
    return sorted(out)


def _structure(fig):
    """Comparable structural digest of a diagnostic figure."""
    return [
        {
            "title": ax.get_title(),
            "n_images": len(ax.images),
            "vlines": _vline_positions(ax),
        }
        for ax in fig.axes
    ]


def _render_captured(monkeypatch, render):
    """Run ``render()`` with savefig/close intercepted; returns the figure.

    The captured figure is deregistered from pyplot (its artists remain
    readable) so repeated renders — the randomized sweep opens four per
    trial — don't accumulate open figures for the whole soak.
    """
    import matplotlib.pyplot as plt

    real_close = getattr(plt.close, "_hsip_real", plt.close)
    captured = []

    def _capture(fig=None):
        captured.append(fig)

    _capture._hsip_real = real_close
    monkeypatch.setattr(plt, "savefig", lambda *a, **k: None)
    monkeypatch.setattr(plt, "close", _capture)
    render()
    assert captured, "figure function did not close a figure"
    fig = captured[-1]
    real_close(fig)
    return fig


def test_frame_figure_structural_parity(ref_viz, recording, tmp_path,
                                        monkeypatch):
    """Same frame + same detector history => panel-for-panel identical
    titles and marker positions between the reference's figure and ours."""
    import matplotlib.pyplot as plt  # noqa: F401 — backend already Agg

    from hsip_tpu import open_video, viz
    from hsip_tpu.track import FlameDetector, FlameDetectorConfig

    with open_video(str(recording)) as video:
        frames = [np.asarray(video[i]) for i in range(10)]
    bg = float(np.max(frames[0]))

    # Reference detector + result for frame 9.
    ref_cfg = ref_viz.FlameDetectorConfig()
    ref_det = ref_viz.FlameDetector(ref_cfg, frame_rate=100_000.0,
                                    calibration_m_per_px=0.001)
    for i, fr in enumerate(frames):
        ref_result = ref_det.detect(fr, i, bg)

    # Our detector + result for frame 9.
    our_det = FlameDetector(FlameDetectorConfig(), 100_000.0, 0.001)
    for i, fr in enumerate(frames):
        our_result = our_det.detect(fr, i, bg)

    # The detectors themselves must agree before comparing their plots.
    assert our_result.final_position == ref_result.final_position
    assert our_result.pos_min_gradient == ref_result.pos_min_gradient
    assert our_result.pos_rightmost_sobel == ref_result.pos_rightmost_sobel
    assert our_result.search_bounds == ref_result.search_bounds

    fig_ref = _render_captured(
        monkeypatch,
        lambda: ref_viz.save_frame_image(
            frames[9], ref_result, tmp_path, "Src", ref_det
        ),
    )
    fig_ours = _render_captured(
        monkeypatch,
        lambda: viz.save_frame_image(
            frames[9], our_result, tmp_path, "Src", our_det
        ),
    )

    s_ref = _structure(fig_ref)
    s_ours = _structure(fig_ours)
    assert len(s_ref) == len(s_ours) == 12
    for i, (pr, po) in enumerate(zip(s_ref, s_ours)):
        assert po["title"] == pr["title"], f"panel {i + 1} title"
        assert po["n_images"] == pr["n_images"], f"panel {i + 1} images"
        assert po["vlines"] == pr["vlines"], f"panel {i + 1} markers"
    # Data-level parity: every panel's pixel array, normalization (clim,
    # colormap) and full Line2D xy data — catches colormap/vmax drift the
    # structural digest can't see.
    for i, (ar, ao) in enumerate(zip(fig_ref.axes, fig_ours.axes)):
        _assert_images_equal(ar, ao, f"panel {i + 1}")
        _assert_lines_equal(ar, ao, f"panel {i + 1}")


def test_stacked_sequence_structural_parity(ref_viz, recording, tmp_path,
                                            monkeypatch):
    """Two-column stacked sequence: same panel grid and titles."""
    from hsip_tpu import open_video, viz

    with open_video(str(recording)) as video:
        bg = float(np.max(video[0]))
        display = list(range(0, 16, 2))

        fig_ref = _render_captured(
            monkeypatch,
            lambda: ref_viz.generate_stacked_sequence(
                video, display, bg, tmp_path / "r.png",
                title="viz-run-1-001", show_frame_diff=True,
                figsize_width=12.0,
            ),
        )
        fig_ours = _render_captured(
            monkeypatch,
            lambda: viz.generate_stacked_sequence(
                video, display, bg, tmp_path / "o.png",
                title="viz-run-1-001", show_frame_diff=True,
                figsize_width=12.0,
            ),
        )

    assert len(fig_ref.axes) == len(fig_ours.axes)
    for i, (ar, ao) in enumerate(zip(fig_ref.axes, fig_ours.axes)):
        assert ao.get_title() == ar.get_title(), f"axes {i} title"
        assert len(ao.images) == len(ar.images), f"axes {i} images"
        _assert_images_equal(ar, ao, f"axes {i}")
    assert fig_ours.get_suptitle() == fig_ref.get_suptitle()


def test_stacked_single_column_structural_parity(ref_viz, recording,
                                                 tmp_path, monkeypatch):
    """Single-column composited sequence: same axes count and titles."""
    from hsip_tpu import open_video, viz

    with open_video(str(recording)) as video:
        bg = float(np.max(video[0]))
        display = list(range(0, 16, 2))

        fig_ref = _render_captured(
            monkeypatch,
            lambda: ref_viz.generate_stacked_sequence_single_column(
                video, display, bg, tmp_path / "r1.png",
                use_frame_diff=False, title="viz-run-1-001",
                figsize_width=8.0,
            ),
        )
        fig_ours = _render_captured(
            monkeypatch,
            lambda: viz.generate_stacked_sequence_single_column(
                video, display, bg, tmp_path / "o1.png",
                use_frame_diff=False, title="viz-run-1-001",
                figsize_width=8.0,
            ),
        )

    assert len(fig_ref.axes) == len(fig_ours.axes)
    for i, (ar, ao) in enumerate(zip(fig_ref.axes, fig_ours.axes)):
        assert ao.get_title() == ar.get_title(), f"axes {i} title"
        assert len(ao.images) == len(ar.images), f"axes {i} images"
        _assert_images_equal(ar, ao, f"axes {i}")
    assert fig_ours.get_suptitle() == fig_ref.get_suptitle()


def _image_content(ax):
    """Per-axes image CONTENT: pixel array, color limits, colormap name.

    This is the data-level gate the structural digest can't provide — a
    normalization regression (the 99th-percentile vmax at
    ``process_videos.py:843`` or the symmetric RdBu range at ``:884``)
    changes exactly these and nothing structural.
    """
    out = []
    for im in ax.images:
        arr = np.asarray(np.ma.filled(im.get_array(), np.nan), dtype=float)
        out.append((arr, tuple(float(c) for c in im.get_clim()),
                    im.get_cmap().name))
    return out


def _assert_images_equal(ax_ref, ax_ours, ctx):
    ref_imgs = _image_content(ax_ref)
    our_imgs = _image_content(ax_ours)
    assert len(our_imgs) == len(ref_imgs), f"image count: {ctx}"
    for k, ((ra, rc, rm), (oa, oc, om)) in enumerate(
        zip(ref_imgs, our_imgs)
    ):
        assert oa.shape == ra.shape, f"image {k} shape: {ctx}"
        # 1e-12 tolerance: the two sides build the displayed arrays with
        # equivalent-but-differently-ordered float64 ops (~1e-15 relative
        # noise); a real normalization/content regression is orders of
        # magnitude larger.
        np.testing.assert_allclose(
            oa, ra, rtol=1e-12, atol=1e-9, equal_nan=True,
            err_msg=f"image {k}: {ctx}",
        )
        np.testing.assert_allclose(
            oc, rc, rtol=1e-12, atol=1e-9,
            err_msg=f"image {k} clim: {ctx}",
        )
        assert om == rm, f"image {k} cmap: {ctx}"


def _line_xy(ax):
    """Order-independent full xy data of every Line2D on the axes."""
    lines = []
    for line in ax.lines:
        xd = np.asarray(line.get_xdata(), dtype=float)
        yd = np.asarray(line.get_ydata(), dtype=float)
        lines.append((xd, yd))
    # Deterministic order: by size, then first point.
    def key(t):
        xd, yd = t
        return (xd.size, float(xd[0]) if xd.size else 0.0,
                float(yd[0]) if yd.size and np.isfinite(yd[0]) else 0.0)
    return sorted(lines, key=key)


def _assert_lines_equal(ax_ref, ax_ours, ctx):
    ref_lines = _line_xy(ax_ref)
    our_lines = _line_xy(ax_ours)
    assert len(our_lines) == len(ref_lines), f"line count: {ctx}"
    for k, ((rx, ry), (ox, oy)) in enumerate(zip(ref_lines, our_lines)):
        np.testing.assert_allclose(
            ox, rx, rtol=0, atol=0, err_msg=f"line {k} x: {ctx}"
        )
        # Both sides compute velocities/splines in float64 from identical
        # integer positions, but profile lines inherit ~1e-12 op-order
        # noise from the equivalent-but-reordered float64 filter chains;
        # 1e-9 still fails loudly on any real data regression.
        np.testing.assert_allclose(
            oy, ry, rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"line {k} y: {ctx}",
        )


def _line_digest(ax):
    """Per-axes multiset of line data, order-independent: each Line2D as a
    (n_points, x0, y0, xsum, ysum) tuple rounded for float64-stable compare
    (both sides compute in float64; the spline port is knot/coeff-exact)."""
    digest = []
    for line in ax.lines:
        xd = np.asarray(line.get_xdata(), dtype=float)
        yd = np.asarray(line.get_ydata(), dtype=float)
        y_fin = yd[np.isfinite(yd)]
        digest.append((
            xd.size,
            round(float(xd[0]), 6) if xd.size else 0.0,
            round(float(yd[0]), 6) if yd.size and np.isfinite(yd[0]) else 0.0,
            round(float(np.nansum(xd)), 4),
            round(float(y_fin.sum()), 4) if y_fin.size else 0.0,
        ))
    return sorted(digest)


def test_frame_figure_randomized_parity(ref_viz, monkeypatch, tmp_path):
    """Randomized figure-content sweep: drawn geometry, detector tunables
    and trajectories (incl. DDT jumps, so the velocity panel's DDT marker
    and the spline panels render) must produce panel-for-panel identical
    titles, image counts, marker positions, AND line data (position
    history, spline curve, velocity traces) between the reference's
    12-panel figure and ours. Extends the fixed-scenario test above the
    way the table fuzz extends the fixed differential."""
    from hsip_tpu import open_video, viz
    from hsip_tpu.track import FlameDetector, FlameDetectorConfig

    import os

    # Soakable with the same knobs as the table fuzz; figures cost ~6x a
    # table trial, so scale the count down accordingly — but never below
    # the 4 trials an unset environment runs (pinning the table fuzz's
    # documented default of 6 must not shrink figure coverage).
    n_trials = max(4, int(os.environ.get("HSIP_REFERENCE_TRIALS", "24")) // 6)
    seed = int(os.environ.get("HSIP_REFERENCE_SEED", "20260818"))
    rng = np.random.default_rng(seed)
    for trial in range(n_trials):
        height = int(rng.choice([24, 48, 64]))
        width = int(rng.choice([192, 256, 320]))
        n_frames = int(rng.integers(12, 20))
        ddt = rng.random() < 0.5
        flame = FlameSpec(
            x0=float(rng.uniform(15, 35)),
            v0_px=float(rng.uniform(4.0, 9.0)),
            accel_px=float(rng.uniform(0.0, 0.1)),
            ddt_frame=int(rng.integers(5, 9)) if ddt else None,
            v_jump_px=float(rng.uniform(14, 22)) if ddt else 0.0,
            ignition_frame=1,
            seed=int(rng.integers(0, 2**31)),
        )
        frames, _ = synthesize_flame_video(
            n_frames, height=height, width=width, flame=flame
        )
        vdir = tmp_path / f"t{trial}"
        meta = write_recording(
            vdir, f"vizfuzz-run-{trial}-001", frames,
            spec=CihxSpec(width=width, height=height,
                          total_frames=n_frames, record_rate=50_000,
                          bit_depth=12),
        )
        det_kwargs = dict(
            gaussian_sigma=float(rng.choice([0.8, 1.5])),
            morphology_kernel_size=int(rng.choice([3, 5])),
            min_gradient_strength=float(rng.choice([5.0, 10.0])),
            search_window_px=int(rng.choice([60, 100])),
            ddt_velocity_jump_m_s=float(rng.choice([900.0, 1250.0])),
            use_spline_estimator=bool(rng.random() < 0.8),
        )
        with open_video(str(meta)) as video:
            decoded = [np.asarray(video[i]) for i in range(n_frames)]
        bg = float(np.max(decoded[0]))
        cal = float(rng.choice([0.0005, 0.000833333]))

        ref_det = ref_viz.FlameDetector(
            ref_viz.FlameDetectorConfig(**det_kwargs), 50_000.0, cal
        )
        our_det = FlameDetector(FlameDetectorConfig(**det_kwargs),
                                50_000.0, cal)

        def _compare_figures(idx, ref_result, our_result):
            """Render both 12-panel figures for the CURRENT detector state
            and compare panel-for-panel. The figure reads history from the
            detector object, so this must run at the moment of interest —
            rendering an early frame after the full loop would show full
            history, not the thin-history branches."""
            try:
                fig_ref = _render_captured(
                    monkeypatch,
                    lambda: ref_viz.save_frame_image(
                        decoded[idx], ref_result, vdir, "Src", ref_det
                    ),
                )
            except ValueError as exc:
                # Latent reference bug (process_videos.py:1092): with
                # velocity history present but the last v1 falsy (e.g. a
                # front stationary between frames -> v1 == 0.0), its
                # velocity-marker scatter passes x of size 1 with y of
                # size 0 and matplotlib raises. Our renderer guards the
                # marker; assert we still produce the full figure where
                # the reference crashes, then move on (nothing to
                # compare against).
                assert "same size" in str(exc)
                fig_ours = _render_captured(
                    monkeypatch,
                    lambda: viz.save_frame_image(
                        decoded[idx], our_result, vdir, "Src", our_det
                    ),
                )
                assert len(fig_ours.axes) == 12
                return
            fig_ours = _render_captured(
                monkeypatch,
                lambda: viz.save_frame_image(
                    decoded[idx], our_result, vdir, "Src", our_det
                ),
            )
            s_ref = _structure(fig_ref)
            s_ours = _structure(fig_ours)
            ctx = f"trial {trial} frame {idx} {height}x{width} {det_kwargs}"
            assert len(s_ref) == len(s_ours) == 12, ctx
            for p, (pr, po) in enumerate(zip(s_ref, s_ours)):
                assert po["title"] == pr["title"], f"panel {p+1} title: {ctx}"
                assert po["n_images"] == pr["n_images"], \
                    f"panel {p+1} images: {ctx}"
                assert po["vlines"] == pr["vlines"], \
                    f"panel {p+1} markers: {ctx}"
            for p, (ar, ao) in enumerate(zip(fig_ref.axes, fig_ours.axes)):
                assert _line_digest(ao) == _line_digest(ar), \
                    f"panel {p+1} line data: {ctx}"
                _assert_images_equal(ar, ao, f"panel {p+1}: {ctx}")
                _assert_lines_equal(ar, ao, f"panel {p+1}: {ctx}")

        # Compare at frame 2 IN the loop (genuinely thin history — the
        # 'No velocity data yet' / unfitted-spline branches) and at the
        # final frame (full history, DDT marker if latched).
        for i, fr in enumerate(decoded):
            rr = ref_det.detect(fr, i, bg)
            ro = our_det.detect(fr, i, bg)
            # Figures only make sense if the detectors agree on content.
            assert ro.final_position == rr.final_position, (trial, i)
            if i == 2 or i == n_frames - 1:
                _compare_figures(i, rr, ro)
