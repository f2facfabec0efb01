"""Tracker tests: state machine semantics, detectors, spline, and a full
scipy-backed oracle comparison of the detection pipeline."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from hsip_tpu.io import FlameSpec, synthesize_flame_video
from hsip_tpu.track import (
    FlameDetector,
    FlameDetectorConfig,
    FlameTracker,
    detect_gradient,
    detect_half_maximum,
    detect_profile,
    detect_threshold,
    fit_smoothing_spline,
)


# ---------------------------------------------------------------------------
# Oracle: an independent implementation of the reference detection pipeline
# built directly on scipy (the reference's actual backend). Used to prove the
# framework's scipy-free pipeline is position-identical.
# ---------------------------------------------------------------------------


class ScipyOracle:
    def __init__(self, config, frame_rate, calibration):
        self.cfg = config
        self.fps = frame_rate
        self.cal = calibration
        self.prior = None
        self.history = []  # (frame, pos or None)
        self.vel = []  # [frame, v1, v2, vc]
        self.ddt = None
        dt = 1.0 / frame_rate
        self.max_disp = int(np.ceil(config.max_velocity_change_m_s * dt / calibration)) + 1

    def bounds(self, frame_idx, width):
        margin = self.cfg.edge_margin_px
        last = next(((p, f) for f, p in reversed(self.history) if p is not None), None)
        if last is None:
            return margin, width - margin
        pos, fidx = last
        disp = self.max_disp * max(1, frame_idx - fidx)
        return pos, min(width - margin, pos + disp + self.cfg.search_window_px)

    def detect(self, frame, frame_idx, bg):
        h, w = frame.shape
        center = h // 2
        sub = frame.astype(np.float64) - bg
        sub[sub < 0] = 0
        s0, s1 = self.bounds(frame_idx, w)
        pos_g = pos_s = None
        if self.prior is not None:
            diff = sub - self.prior
            diff[diff < self.cfg.frame_diff_threshold] = 0
            k = self.cfg.morphology_kernel_size
            opened = ndi.grey_opening(diff, size=(k, k))
            blurred = ndi.gaussian_filter(opened, sigma=self.cfg.gaussian_sigma)
            sob = ndi.sobel(blurred, axis=1)[center, :]
            grad = np.gradient(blurred, axis=1)[center, :]
            ws, wg = sob[s0:s1], grad[s0:s1]
            if len(ws) and len(wg):
                if np.min(wg) < -self.cfg.min_gradient_strength:
                    pos_g = s0 + int(np.argmin(wg))
                smax = np.max(np.abs(ws))
                if smax > self.cfg.min_gradient_strength:
                    above = np.abs(ws) > smax * self.cfg.sobel_threshold_fraction
                    if np.any(above):
                        pos_s = s0 + int(np.max(np.nonzero(above)[0]))
        final = max([p for p in (pos_g, pos_s) if p is not None], default=None)
        self.history.append((frame_idx, final))
        self.prior = sub.copy()
        # velocities
        if final is not None and len(self.history) >= 2:
            cf, cp = self.history[-1]
            pf, pp = self.history[-2]
            if pp is not None:
                dt = (cf - pf) / self.fps
                if dt > 0:
                    v1 = (cp - pp) * self.cal / dt
                    v2 = vc = None
                    if len(self.history) >= 3:
                        _, p2 = self.history[-3]
                        if p2 is not None:
                            v2 = (3 * cp - 4 * pp + p2) * self.cal / (2 * dt)
                            vc = (cp - p2) * self.cal / (2 * dt)
                            if self.vel:
                                self.vel[-1][3] = vc
                    self.vel.append([frame_idx, v1, v2, None])
                    if self.ddt is None and len(self.vel) >= 2:
                        if v1 - self.vel[-2][1] > self.cfg.ddt_velocity_jump_m_s:
                            self.ddt = frame_idx
        return final, (pos_g, pos_s), (s0, s1)


@pytest.fixture(scope="module")
def flame_video():
    flame = FlameSpec(
        x0=35.0, v0_px=6.0, accel_px=0.35, ignition_frame=2,
        ddt_frame=25, v_jump_px=30.0, seed=7,
    )
    frames, positions = synthesize_flame_video(
        n_frames=35, height=48, width=640, flame=flame
    )
    return frames, positions


def test_detector_matches_scipy_oracle(flame_video):
    """The framework's scipy-free full-frame detector must be
    position-identical and velocity-identical to the scipy oracle."""
    frames, _ = flame_video
    cfg = FlameDetectorConfig()
    fps, cal = 80_000, 0.0008
    bg = float(np.max(frames[0]))

    det = FlameDetector(cfg, fps, cal)
    oracle = ScipyOracle(cfg, fps, cal)

    for i in range(len(frames)):
        r = det.detect(frames[i], i, bg)
        o_final, (o_g, o_s), o_bounds = oracle.detect(frames[i], i, bg)
        assert r.search_bounds == o_bounds, f"bounds diverged at frame {i}"
        assert r.pos_min_gradient == o_g, f"min-gradient diverged at frame {i}"
        assert r.pos_rightmost_sobel == o_s, f"sobel diverged at frame {i}"
        assert r.final_position == o_final, f"final diverged at frame {i}"

    assert det.ddt_frame == oracle.ddt
    ours = det.get_velocity_history()
    theirs = [tuple(e) for e in oracle.vel]
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert a[0] == b[0]
        for x, y in zip(a[1:], b[1:]):
            if y is None:
                assert x is None
            else:
                assert x == pytest.approx(y, rel=1e-12)


def test_detector_tracks_synthetic_trajectory(flame_video):
    """Detected positions track the analytic front within a small error."""
    frames, positions = flame_video
    det = FlameDetector(FlameDetectorConfig(), 80_000, 0.0008)
    bg = float(np.max(frames[0]))
    errs = []
    for i in range(len(frames)):
        r = det.detect(frames[i], i, bg)
        if r.final_position is not None and np.isfinite(positions[i]):
            errs.append(abs(r.final_position - positions[i]))
    assert len(errs) > 20
    assert np.median(errs) < 12  # Sobel edge sits a few px around the sigmoid


def test_ddt_latch_on_velocity_jump(flame_video):
    frames, _ = flame_video
    det = FlameDetector(FlameDetectorConfig(), 80_000, 0.0008)
    bg = float(np.max(frames[0]))
    for i in range(len(frames)):
        det.detect(frames[i], i, bg)
    # DDT was injected at frame 25 (v jumps by 30 px/frame = 1920 m/s > 1250).
    assert det.ddt_detected
    assert det.ddt_frame is not None and 25 <= det.ddt_frame <= 28
    pre = det.get_pre_ddt_velocities()
    post = det.get_post_ddt_velocities()
    assert all(e[0] < det.ddt_frame for e in pre)
    assert all(e[0] >= det.ddt_frame for e in post)


# ---------------------------------------------------------------------------
# FlameTracker unit semantics
# ---------------------------------------------------------------------------


def _profiles(width, edge_at, strength=100.0):
    """Synthetic sobel/gradient lines with one sharp negative edge."""
    sobel = np.zeros(width)
    grad = np.zeros(width)
    sobel[edge_at] = -strength
    grad[edge_at] = -strength
    return sobel, grad


def test_tracker_search_bounds_and_step():
    cfg = FlameDetectorConfig()
    tr = FlameTracker(cfg, frame_rate=100_000, calibration_m_per_px=0.001)
    # max displacement: 200 m/s / 100k fps = 2mm -> 2px, +1 = 3
    assert tr.max_displacement_px == 3
    width = 400
    assert tr.get_search_bounds(0, width) == (10, 390)

    r0 = tr.step(0, width, None, None)  # first frame: no profiles
    assert r0.final_position is None
    assert r0.search_bounds == (10, 390)

    s, g = _profiles(width, 50)
    r1 = tr.step(1, width, s, g)
    assert r1.final_position == 50
    # After a detection at 50: bounds start at 50.
    assert tr.get_search_bounds(2, width) == (50, 50 + 3 + 100)

    # Gap of 3 frames multiplies displacement allowance.
    assert tr.get_search_bounds(4, width) == (50, 50 + 9 + 100)


def test_tracker_candidates_rightmost_wins():
    cfg = FlameDetectorConfig()
    tr = FlameTracker(cfg, 100_000, 0.001)
    width = 300
    sobel = np.zeros(width)
    grad = np.zeros(width)
    grad[80] = -50.0          # min gradient at 80
    sobel[120] = 40.0         # rightmost sobel above 0.1*40 at 120
    r = tr.step(0, width, sobel, grad)
    assert r.pos_min_gradient == 80
    assert r.pos_rightmost_sobel == 120
    assert r.final_position == 120  # rightmost candidate


def test_tracker_weak_signals_rejected():
    cfg = FlameDetectorConfig()  # min_gradient_strength = 10
    tr = FlameTracker(cfg, 100_000, 0.001)
    sobel, grad = _profiles(200, 50, strength=5.0)  # below threshold
    r = tr.step(0, 200, sobel, grad)
    assert r.final_position is None


def test_tracker_velocities_hand_computed():
    cfg = FlameDetectorConfig()
    fps, cal = 10_000, 0.001
    tr = FlameTracker(cfg, fps, cal)
    width = 1000
    for i, pos in enumerate([100, 120, 150]):
        s, g = _profiles(width, pos)
        tr.step(i, width, s, g)
    hist = tr.get_velocity_history()
    dt = 1.0 / fps
    # v1 @ frame1: (120-100)*0.001/dt = 200
    assert hist[0][1] == pytest.approx(200.0)
    # v1 @ frame2: (150-120)*0.001/dt = 300
    assert hist[1][1] == pytest.approx(300.0)
    # v2 @ frame2: (3*150-4*120+100)*0.001/(2dt) = (450-480+100)/2 * 10 = 350
    assert hist[1][2] == pytest.approx(350.0)
    # vc retro-filled into frame1 entry: (150-100)*0.001/(2dt) = 250
    assert hist[0][3] == pytest.approx(250.0)
    assert hist[1][3] is None  # newest entry has no central diff yet
    # clear_last_central_difference wipes entry[-2]'s vc
    tr.clear_last_central_difference()
    assert tr.get_velocity_history()[0][3] is None


def test_tracker_gap_in_detection_resets_dt():
    cfg = FlameDetectorConfig()
    fps, cal = 10_000, 0.001
    tr = FlameTracker(cfg, fps, cal)
    width = 1000
    s, g = _profiles(width, 100)
    tr.step(0, width, s, g)
    tr.step(1, width, np.zeros(width), np.zeros(width))  # no detection
    s, g = _profiles(width, 160)
    tr.step(2, width, s, g)
    # prev entry has pos None -> no velocity computed at frame 2
    assert tr.get_velocity_history() == []
    s, g = _profiles(width, 190)
    tr.step(3, width, s, g)
    hist = tr.get_velocity_history()
    assert len(hist) == 1
    assert hist[0][1] == pytest.approx((190 - 160) * cal * fps)


def test_tracker_reset():
    tr = FlameTracker(FlameDetectorConfig(), 10_000, 0.001)
    s, g = _profiles(100, 50)
    tr.step(0, 100, s, g)
    tr.reset()
    assert tr.position_history == []
    assert tr.last_position is None
    assert not tr.ddt_detected


# ---------------------------------------------------------------------------
# Standalone profile detectors (README methods)
# ---------------------------------------------------------------------------


def _step_profile(width=200, front=120, level=1000.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    p = np.zeros(width)
    p[:front] = level
    if noise:
        p += rng.uniform(0, noise, width)
    return p


def test_detect_threshold_contiguous_edge():
    p = _step_profile(front=120)
    p[180] = 900.0  # detached noise blob right of the front — must be ignored
    assert detect_threshold(p, fraction=0.5) == 119


def test_detect_half_maximum():
    xs = np.arange(300, dtype=np.float64)
    p = 1000.0 / (1.0 + np.exp((xs - 150.0) / 3.0))  # sigmoid falling at 150
    pos = detect_half_maximum(p)
    assert pos == pytest.approx(150, abs=2)
    # Never-falling profile: edge = window end.
    assert detect_half_maximum(np.full(50, 10.0), min_intensity=0.0) == 49


def test_detect_gradient():
    p = _step_profile(front=80)
    assert detect_gradient(p, min_strength=10.0) == pytest.approx(80, abs=1)
    assert detect_gradient(np.zeros(100), min_strength=10.0) is None


def test_detectors_empty_and_bounds():
    p = _step_profile(front=120)
    assert detect_threshold(np.zeros(100), min_intensity=5.0) is None
    assert detect_half_maximum(np.zeros(100), min_intensity=5.0) is None
    assert detect_threshold(p, bounds=(0, 60)) == 59
    # Exact: the windowed gradient of the sliced profile decides the index.
    expected = 100 + int(np.argmin(np.gradient(p[100:140])))
    assert detect_gradient(p, min_strength=1.0, bounds=(100, 140)) == expected


def test_detect_profile_dispatch():
    p = _step_profile(front=100)
    cfg = FlameDetectorConfig()
    assert detect_profile(p, "threshold", cfg) == 99
    assert detect_profile(p, "gradient", cfg) is not None
    assert detect_profile(p, "half_maximum", cfg) is not None
    with pytest.raises(ValueError):
        detect_profile(p, "bogus", cfg)


# ---------------------------------------------------------------------------
# Smoothing spline
# ---------------------------------------------------------------------------


def test_spline_interpolates_at_s0():
    x = np.arange(10, dtype=float)
    y = x**2
    sp = fit_smoothing_spline(x, y, s=0.0)
    np.testing.assert_allclose(sp(x), y, atol=1e-8)


def test_spline_hits_target_residual():
    rng = np.random.default_rng(1)
    x = np.arange(50, dtype=float)
    y = 0.05 * x**2 + rng.normal(0, 2.0, 50)
    s = 25.0
    sp = fit_smoothing_spline(x, y, s=s)
    resid = float(np.sum((sp(x) - y) ** 2))
    assert resid == pytest.approx(s, rel=1e-3)


def test_spline_degenerate_inputs():
    # One point cannot fit any degree; duplicate abscissae are rejected
    # (silent-fail contract). Two points DO fit: UnivariateSpline picks
    # k = min(3, m-1) = 1 there, and so do we.
    assert fit_smoothing_spline(np.array([0.0]), np.array([1.0]), 1.0) is None
    x = np.array([0.0, 1.0, 1.0, 2.0])
    assert fit_smoothing_spline(x, x, 1.0) is None
    two = fit_smoothing_spline(np.array([0.0, 1.0]), np.array([1.0, 3.0]), 1.0)
    assert two is not None and two(0.5) == pytest.approx(2.0)


def test_spline_extrapolation_is_finite_and_sane():
    x = np.arange(20, dtype=float)
    y = 3.0 * x + 1.0
    sp = fit_smoothing_spline(x, y, s=0.5 * len(x))
    # Linear data -> near-linear spline; extrapolate one step ahead.
    assert sp(20.0) == pytest.approx(61.0, rel=0.05)


def test_spline_close_to_scipy_univariate():
    """FITPACK parity: identical knots/coefficients and evaluations that
    agree to float accuracy with scipy's UnivariateSpline."""
    from scipy.interpolate import UnivariateSpline

    rng = np.random.default_rng(3)
    x = np.arange(30, dtype=float)
    y = 50 + 6 * x + 0.3 * x**2 + rng.normal(0, 1.5, 30)
    s = 0.5 * len(x)
    ours = fit_smoothing_spline(x, y, s=s)
    theirs = UnivariateSpline(x, y, s=s, k=3)
    np.testing.assert_array_equal(ours.t, theirs._eval_args[0])
    nk1 = ours.t.size - 4
    np.testing.assert_allclose(ours.c[:nk1], theirs._eval_args[1][:nk1],
                               rtol=1e-9, atol=1e-9)
    xq = np.linspace(-3, 33, 97)  # includes ext=0 extrapolation
    np.testing.assert_allclose(ours(xq), theirs(xq), rtol=1e-9, atol=1e-9)


def test_spline_fitpack_parity_randomized():
    """The curfit port reproduces UnivariateSpline's adaptive knot vectors,
    coefficients and residual on tracker-shaped corpora — including the
    nest-capped fpcurf0 -> fpcurf1 continuation scipy performs."""
    from scipy.interpolate import UnivariateSpline

    rng = np.random.default_rng(42)
    checked = 0
    for _ in range(40):
        m = int(rng.integers(5, 70))
        x = np.sort(rng.choice(np.arange(250), size=m, replace=False)).astype(float)
        # monotone-ish flame trajectories with pixel-integer noise
        y = np.cumsum(rng.integers(0, 6, size=m)).astype(float)
        y += rng.normal(0, 1.5, m).round()
        k = min(3, m - 1)
        s = 0.5 * m
        try:
            theirs = UnivariateSpline(x, y, s=s, k=k)
        except Exception:
            continue
        ours = fit_smoothing_spline(x, y, s=s)
        np.testing.assert_array_equal(ours.t, theirs._eval_args[0])
        nk1 = ours.t.size - k - 1
        np.testing.assert_allclose(
            ours.c[:nk1], theirs._eval_args[1][:nk1], rtol=1e-7, atol=1e-7
        )
        assert ours.residual == pytest.approx(theirs.get_residual(), abs=1e-9)
        checked += 1
    assert checked >= 35


def test_validate_position_constraints():
    tr = FlameTracker(FlameDetectorConfig(), 100_000, 0.001)  # max_disp = 3
    # No history: passthrough.
    assert tr.validate_position(50, 0) == 50
    s, g = _profiles(400, 100)
    tr.step(0, 400, s, g)
    # Backward motion rejected.
    assert tr.validate_position(90, 1) is None
    # Over-cap displacement clamped: 100 + 3*2 = 106 at frame 2.
    assert tr.validate_position(200, 2) == 106
    # In-range passthrough.
    assert tr.validate_position(102, 1) == 102


def test_use_frame_diff_false_reads_raw_centerline():
    """Named methods with use_frame_diff=False detect on the raw BG-subtracted
    centerline — available from the very first frame."""
    from hsip_tpu.track.tracker import FlameDetector as FD

    frames, positions = synthesize_flame_video(
        8, height=32, width=256,
        flame=FlameSpec(x0=60, v0_px=6, ignition_frame=0, seed=1),
    )
    det = FD(FlameDetectorConfig(), 10_000, 0.001,
             detection_method="threshold", use_frame_diff=False)
    bg = 50.0  # below flame level so the plateau survives subtraction
    r0 = det.detect(frames[0], 0, bg)
    # First frame HAS a detection (no prior needed for raw-profile methods).
    assert r0.final_position is not None
    assert abs(r0.final_position - positions[0]) < 12


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_detector_matches_scipy_oracle_random_configs(seed):
    """Oracle parity must hold across the config space, not just defaults:
    randomized kernel size, sigma, thresholds, velocity caps."""
    rng = np.random.default_rng(seed)
    cfg = FlameDetectorConfig(
        frame_diff_threshold=float(rng.uniform(1.0, 12.0)),
        morphology_kernel_size=int(rng.choice([2, 3, 5])),
        gaussian_sigma=float(rng.uniform(0.8, 2.5)),
        min_gradient_strength=float(rng.uniform(4.0, 20.0)),
        sobel_threshold_fraction=float(rng.uniform(0.05, 0.3)),
        max_velocity_change_m_s=float(rng.uniform(100.0, 400.0)),
        search_window_px=int(rng.integers(40, 150)),
        edge_margin_px=int(rng.integers(4, 20)),
    )
    fps = float(rng.choice([50_000, 80_000, 100_000]))
    cal = float(rng.uniform(4e-4, 1.2e-3))
    flame = FlameSpec(
        x0=float(rng.uniform(20, 50)),
        v0_px=float(rng.uniform(3, 10)),
        accel_px=float(rng.uniform(0, 0.4)),
        ignition_frame=int(rng.integers(1, 5)),
        seed=seed + 100,
    )
    frames, _ = synthesize_flame_video(30, height=48, width=448, flame=flame)
    bg = float(np.max(frames[0]))

    det = FlameDetector(cfg, fps, cal)
    oracle = ScipyOracle(cfg, fps, cal)
    for i in range(len(frames)):
        r = det.detect(frames[i], i, bg)
        o_final, (o_g, o_s), o_bounds = oracle.detect(frames[i], i, bg)
        assert r.search_bounds == o_bounds, f"bounds diverged at {i} cfg={cfg}"
        assert r.final_position == o_final, f"final diverged at {i} cfg={cfg}"
    assert det.ddt_frame == oracle.ddt


def test_half_maximum_no_crossing_returns_none():
    """fraction > 1 puts the level above the peak: no crossing exists, so
    the detector must return None instead of peak_idx-1 (a position left
    of — possibly outside — the search window)."""
    from hsip_tpu.track.detectors import detect_half_maximum

    profile = np.zeros(64)
    profile[10] = 100.0
    assert detect_half_maximum(profile, fraction=0.5, min_intensity=1.0) is not None
    assert detect_half_maximum(profile, fraction=2.0, min_intensity=1.0) is None
    # Peak at the window start: the buggy return would have been start-1.
    assert detect_half_maximum(
        profile, fraction=2.0, min_intensity=1.0, bounds=(10, 30)
    ) is None


def test_detector_config_rejects_percent_style_fractions():
    from hsip_tpu.track import FlameDetectorConfig

    with pytest.raises(ValueError, match="threshold_fraction"):
        FlameDetectorConfig(threshold_fraction=50)
    with pytest.raises(ValueError, match="half_maximum_fraction"):
        FlameDetectorConfig(half_maximum_fraction=0.0)
    FlameDetectorConfig(threshold_fraction=1.0)  # boundary OK


def test_source_config_base_path_order_independent(tmp_path):
    """Setting base_path AFTER video_path must still resolve against it
    (paths resolve lazily; eager resolution froze them against the CWD)."""
    from hsip_tpu.track import VideoSourceConfig

    cfg = VideoSourceConfig(name="X")
    cfg.video_path = "Nova-Video-Files"
    cfg.base_path = str(tmp_path)
    assert cfg.video_path == str(tmp_path / "Nova-Video-Files")
    cfg.output_dir = "out"
    assert cfg.output_dir == str(tmp_path / "out")


def test_named_method_skips_edge_passes_but_keeps_viz_intermediates():
    """FlameDetector with a named method must not pay the full-frame Sobel/
    gradient passes when intermediates aren't kept — and must still produce
    them when they are (viz)."""
    from hsip_tpu.track import FlameDetector, FlameDetectorConfig

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 1000, size=(3, 24, 96)).astype(np.float64)
    lean = FlameDetector(FlameDetectorConfig(), 1000.0, 0.001,
                         keep_results=False, detection_method="threshold")
    full = FlameDetector(FlameDetectorConfig(), 1000.0, 0.001,
                         keep_results=True, detection_method="threshold")
    for i, f in enumerate(frames):
        r_lean = lean.detect(f, i, 10.0)
        r_full = full.detect(f, i, 10.0)
    assert r_lean.sobel_output is None  # skipped
    assert r_full.sobel_output is not None  # kept for the 12-panel figure
    assert r_lean.final_position == r_full.final_position


def test_spline_close_to_scipy_univariate_spline():
    """SURVEY hard-part 6: our Reinsch spline approximates FITPACK. On the
    smooth trajectories the tracker actually fits (monotone flame positions
    with pixel-quantization noise), predictions must stay within ~2 px of
    scipy's UnivariateSpline at the same smoothing factor. Plot-only
    contract — final_position never consumes the spline."""
    scipy_interp = pytest.importorskip("scipy.interpolate")
    rng = np.random.default_rng(11)
    frames = np.arange(40, dtype=np.float64)
    true = 25.0 + 6.0 * frames + 0.15 * frames**2
    positions = np.round(true + rng.normal(0, 0.6, frames.size))

    s = 0.5 * frames.size  # the reference's s = spline_smoothing * len
    ours = fit_smoothing_spline(frames, positions, s=s)
    theirs = scipy_interp.UnivariateSpline(frames, positions, s=s, k=3)
    assert ours is not None

    query = np.linspace(0.0, 39.0, 200)
    diff = np.abs(ours(query) - theirs(query))
    assert diff.max() < 2.0, f"max deviation from FITPACK: {diff.max():.3f} px"
    # The tracker's prediction point is one frame past the last fit
    # (predict_with_spline(frame_idx)); extrapolations use different end
    # polynomials (natural spline vs FITPACK's reduced knots), so the band
    # is wider there. Measured ~3.2 px on this trajectory; the spline is
    # plot-only, so this documents rather than constrains tightly.
    assert abs(ours(40.0) - theirs(40.0)) < 5.0


def _synthetic_profiles(n, width=1024):
    """Minimal FrameProfiles with a clean rightward-moving front."""
    from hsip_tpu.track.scan import FrameProfiles

    pos = (10 + 0.045 * np.arange(n)).astype(int)
    sob = np.zeros((n, width), np.float32)
    grad = np.zeros((n, width), np.float32)
    rows = np.arange(n)
    sob[rows, pos] = 120.0
    grad[rows, pos] = -60.0
    has_prior = np.ones(n, bool)
    has_prior[0] = False
    return FrameProfiles(
        frame_indices=np.arange(n, dtype=np.int64),
        sobel_lines=sob, gradient_lines=grad,
        intensity_lines=np.zeros((n, width), np.float32),
        raw_center_lines=np.zeros((n, width), np.float32),
        signal_counts=np.full(n, 5000, np.int64), has_prior=has_prior,
        width=width, total_pixels=width * 64,
    )


def test_host_scan_scales_linearly():
    """Guard the O(N^2) scan trap class (eager spline refits, per-step
    history copies): 4x the frames must cost well under quadratic 16x.
    Historic regressions here ran at 8 fps; the bound (10x, vs ~3x
    measured) only trips on complexity bugs, not machine noise."""
    import time

    from hsip_tpu.track import FlameDetectorConfig
    from hsip_tpu.track.scan import run_tracking_scan

    cfg = FlameDetectorConfig()

    def run(n):
        p = _synthetic_profiles(n)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run_tracking_scan(
                p, cfg, frame_rate=100000.0, calibration_m_per_px=1e-6,
                time_fn=lambda i: i / 100000.0,
            )
            best = min(best, time.perf_counter() - t0)
        assert len(out.rows) == n - 1 and out.break_reason is None
        return best

    # One retry: a genuine complexity bug trips every measurement, while a
    # busy shared host (parallel test jobs, background benches) can push a
    # single best-of-2 pair past the bound.
    for attempt in range(2):
        t4, t16 = run(4000), run(16000)
        if t16 / t4 < 10.0:
            break
    assert t16 / t4 < 10.0, f"scan scaling regressed: {t16 / t4:.1f}x for 4x frames"


def test_native_and_python_curfit_agree():
    """The C++ curfit translation and the pure-Python port choose identical
    knots (part 1 is bit-exact by construction); part-2 coefficients agree
    to ~1e-12 (iteration rounding), and both match scipy."""
    import hsip_tpu.track.fitpack as F

    try:
        from hsip_tpu._native import native_decoder

        dec = native_decoder()
    except Exception:
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(11)
    for _ in range(12):
        m = int(rng.integers(6, 60))
        x = np.sort(rng.choice(np.arange(200), size=m, replace=False)).astype(float)
        y = np.cumsum(rng.integers(0, 5, size=m)).astype(float)
        y += rng.normal(0, 1.2, m).round()
        k = min(3, m - 1)
        s = 0.5 * m
        w = np.ones(m)
        tn, cn, fpn, iern = dec.curfit(x, y, w, k, s)
        nest0 = max(m // 2, 2 * (k + 1))
        tp, cp, fpp, ierp, st = F._fpcurf(x, y, w, k, s, nest0)
        if ierp == 1:
            tp, cp, fpp, ierp, st = F._fpcurf(
                x, y, w, k, s, m + k + 1, state=st, ier_in=1
            )
        np.testing.assert_array_equal(tn, tp)
        nk1 = tn.size - k - 1
        np.testing.assert_allclose(cn[:nk1], cp[:nk1], rtol=1e-9, atol=1e-9)
        assert iern == ierp


# ---------------------------------------------------------------------------
# iter_velocity_entries lockstep contract
# ---------------------------------------------------------------------------


def test_iter_velocity_entries_prefix_property():
    """After consuming any prefix of the history, the generator's list
    equals the full reconstruction of that prefix — the lockstep contract
    ``build_device_scan_output`` relies on to stop replaying at the
    truncation step without computing the discarded tail. Also pins that
    every yield hands back the SAME list object (the central-difference
    retro-fill mutates in place), and that the tracker agrees."""
    import numpy as np

    from hsip_tpu.track.velocity import (
        iter_velocity_entries,
        velocity_entries_from_positions,
    )

    rng = np.random.default_rng(20260818)
    for trial in range(40):
        n = int(rng.integers(0, 24))
        frame = 0
        entries = []
        for _ in range(n):
            frame += int(rng.integers(1, 4))  # gaps (skip frames)
            pos = None if rng.random() < 0.3 else int(rng.integers(0, 500))
            entries.append((frame, pos))
        frame_rate = float(rng.choice([0.0, 20_000.0, 100_000.0]))
        calibration = float(rng.choice([0.0005, 0.000833333]))

        gen = iter_velocity_entries(entries, frame_rate, calibration)
        seen = None
        for i, vel in enumerate(gen, start=1):
            assert seen is None or vel is seen, "yields must alias one list"
            seen = vel
            expect = velocity_entries_from_positions(
                entries[:i], frame_rate, calibration
            )
            assert vel == expect, (
                f"trial {trial} prefix {i}/{n}: {vel} != {expect} "
                f"(entries={entries[:i]}, fps={frame_rate})"
            )
