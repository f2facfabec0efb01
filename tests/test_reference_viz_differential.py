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
    """Run ``render()`` with savefig/close intercepted; returns the figure."""
    import matplotlib.pyplot as plt

    captured = []
    monkeypatch.setattr(plt, "savefig", lambda *a, **k: None)
    monkeypatch.setattr(
        plt, "close", lambda fig=None: captured.append(fig)
    )
    render()
    assert captured, "figure function did not close a figure"
    return captured[-1]


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
    assert fig_ours.get_suptitle() == fig_ref.get_suptitle()
