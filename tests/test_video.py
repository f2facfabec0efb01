"""Video core tests: PhotonVideo, TimingInfo, SpatialCalibration, MetadataConfig."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from hsip_tpu import (
    MetadataConfig,
    PhotonVideo,
    SpatialCalibration,
    TimingInfo,
    open_video,
)
from hsip_tpu.io import CihxSpec, write_recording


# ---------------------------------------------------------------------------
# SpatialCalibration
# ---------------------------------------------------------------------------


def test_spatial_calibration_conversions():
    cal = SpatialCalibration(scale=0.001, units="m", origin_x=10.0, origin_y=5.0)
    assert cal.pixels_to_physical(500) == pytest.approx(0.5)
    assert cal.physical_to_pixels(0.5) == pytest.approx(500)
    assert cal.x_to_physical(510) == pytest.approx(0.5)
    assert cal.y_to_physical(5) == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# TimingInfo — trigger/start/skip frame algebra vs hand-computed values
# ---------------------------------------------------------------------------


def test_timing_trigger_relative():
    t = TimingInfo(frame_rate=100_000, trigger_frame=50)
    assert t.frame_to_time(50) == 0.0
    assert t.frame_to_time(0) == pytest.approx(-50 / 100_000)
    assert t.frame_to_time(150) == pytest.approx(100 / 100_000)
    assert t.time_to_frame(0.0) == 50
    assert t.time_to_frame(1e-3) == 150


def test_timing_absolute_pfv4_formula():
    # absolute_time(i) = (start_frame + i*skip_frame) / fps
    t = TimingInfo(frame_rate=80_000, start_frame=-8, skip_frame=2)
    assert t.frame_to_absolute_time(0) == pytest.approx(-8 / 80_000)
    assert t.frame_to_absolute_time(39) == pytest.approx((-8 + 78) / 80_000)


def test_timing_datetime_and_flags():
    dt = datetime(2023, 10, 4, 14, 29, 21)
    t = TimingInfo(frame_rate=1000, start_frame=500, recording_datetime=dt)
    assert t.has_absolute_timing
    assert t.frame_to_datetime(0) == dt + timedelta(seconds=0.5)
    t2 = TimingInfo(frame_rate=0)
    assert not t2.has_absolute_timing
    assert t2.frame_to_time(10) == 0.0
    assert t2.frame_to_absolute_time(10) == 0.0
    assert t2.time_to_frame(1.0) == 0
    assert t2.frame_to_datetime(0) is None


# ---------------------------------------------------------------------------
# MetadataConfig
# ---------------------------------------------------------------------------


def test_metadata_presets_and_filter():
    raw = {
        "Total Frame": 100,
        "Image Width": 512,
        "Image Height": 64,
        "EffectiveBit Depth": 12,
        "File Format": "MRaw",
        "Record Rate(fps)": 100000,
        "Shutter Speed(s)": 1e-6,
        "Camera Type": "Nova",
        "Date": "2023/10/4",
        "Comment Text": "hello",
        "Unknown Key": 1,
    }
    minimal = MetadataConfig.minimal().filter_metadata(raw)
    assert set(minimal) == MetadataConfig.ESSENTIAL
    proc = MetadataConfig.for_processing().filter_metadata(raw)
    assert "Record Rate(fps)" in proc and "Camera Type" not in proc
    full = MetadataConfig.full().filter_metadata(raw)
    assert "Comment Text" in full and "Unknown Key" not in full
    custom = MetadataConfig(fields={"Camera Type"})
    assert custom.should_include("Camera Type")
    assert custom.should_include("Total Frame")  # essentials always included


# ---------------------------------------------------------------------------
# PhotonVideo end-to-end on a synthetic recording
# ---------------------------------------------------------------------------


def test_photon_video_basic(flame_recording):
    video = PhotonVideo(str(flame_recording["path"]))
    frames = flame_recording["frames"]
    assert len(video) == 40
    assert video.frame_shape == (64, 384)
    assert video.height == 64 and video.width == 384
    assert video.frame_rate == 80_000 and video.fps == 80_000
    assert video.bit_depth == 12
    assert video.duration == pytest.approx(40 / 80_000)
    np.testing.assert_array_equal(video[0], frames[0])
    np.testing.assert_array_equal(video[-1], frames[-1])
    np.testing.assert_array_equal(video[5:10], frames[5:10])
    assert "PhotonVideo" in repr(video)
    video.close()


def test_photon_video_absolute_timing_prefers_cihx(flame_recording):
    video = PhotonVideo(str(flame_recording["path"]))
    # start_frame=-8 in the fixture's CIHX
    assert video.get_absolute_time(0) == pytest.approx(-8 / 80_000)
    assert video.get_absolute_time(10) == pytest.approx(2 / 80_000)
    assert video.timing.start_frame == -8
    video.close()


def test_photon_video_indexing_errors(flame_recording):
    with PhotonVideo(str(flame_recording["path"])) as video:
        with pytest.raises(IndexError):
            video[40]
        with pytest.raises(IndexError):
            video[-41]
        with pytest.raises(TypeError):
            video["bad"]  # type: ignore[index]


def test_photon_video_chaining_setters(flame_recording):
    video = open_video(str(flame_recording["path"]))
    out = video.set_calibration(0.001, units="m").set_trigger_frame(5)
    assert out is video
    assert video.trigger_frame == 5
    assert video.get_time(5) == 0.0
    assert video.pixels_to_physical(100) == pytest.approx(0.1)
    assert video.physical_to_pixels(0.1) == pytest.approx(100)
    video.close()


def test_photon_video_calibration_required(flame_recording):
    with PhotonVideo(str(flame_recording["path"])) as video:
        with pytest.raises(ValueError):
            video.pixels_to_physical(10)
        with pytest.raises(ValueError):
            video.physical_to_pixels(1.0)


def test_photon_video_time_queries(flame_recording):
    with open_video(str(flame_recording["path"]), trigger_frame=10) as video:
        assert video.get_time(10) == 0.0
        frame = video.get_frame_at_time(0.0)
        np.testing.assert_array_equal(frame, flame_recording["frames"][10])
        rng = video.get_time_range(0.0, 5 / 80_000)
        assert rng.shape[0] == 6
        # Clamping beyond the end.
        f = video.get_frame_at_time(10.0)
        np.testing.assert_array_equal(f, flame_recording["frames"][-1])


def test_photon_video_float64_view(flame_recording):
    with open_video(str(flame_recording["path"])) as video:
        view = video.to_float64(normalize=True)
        assert len(view) == len(video)
        f = view[3]
        assert f.dtype == np.float64
        assert f.max() <= 1.0
        np.testing.assert_allclose(f, flame_recording["frames"][3] / 4095.0)
        raw = video.to_float64(normalize=False)[3]
        np.testing.assert_allclose(raw, flame_recording["frames"][3].astype(np.float64))
        assert view.frame_rate == video.frame_rate
        assert view.frame_shape == video.frame_shape


def test_photon_video_missing_file():
    with pytest.raises(FileNotFoundError):
        PhotonVideo("/nonexistent/path.cihx")


def test_photon_video_cih_text_header(tmp_path):
    from hsip_tpu.io import synthesize_flame_video

    frames, _ = synthesize_flame_video(6, height=32, width=128)
    spec = CihxSpec(
        width=128, height=32, total_frames=6, record_rate=10_000,
        bit_depth=12, trigger_frame=2,
    )
    meta = write_recording(tmp_path, "cihrec", frames, spec=spec, metadata_format="cih")
    with PhotonVideo(str(meta)) as video:
        assert len(video) == 6
        assert video.frame_rate == 10_000
        assert video.trigger_frame == 2  # from 'Trigger Frame' header key
        np.testing.assert_array_equal(video[1], frames[1])
        # .cih has no XML → no absolute timing metadata
        assert not video.has_absolute_timing


def test_photon_video_iter(flame_recording):
    with open_video(str(flame_recording["path"])) as video:
        count = 0
        for i, frame in enumerate(video):
            if i == 2:
                np.testing.assert_array_equal(frame, flame_recording["frames"][2])
            count += 1
        assert count == 40


def test_frame_bytes_accessor(flame_recording):
    with open_video(str(flame_recording["path"])) as video:
        raw = video.frame_bytes(0, 2)
        assert raw.dtype == np.uint8
        assert raw.shape == (2, 384 * 64 * 3 // 2)


def test_mixed_storage_and_effective_bit_depth(tmp_path):
    """'Color Bit' (stored word size) selects the decoder; 'EffectiveBit
    Depth' only describes sensor precision. 12 effective bits stored in
    16-bit words must decode as uint16 (a common Photron export)."""
    from hsip_tpu.io import CihxSpec, synthesize_flame_video, write_recording

    frames, _ = synthesize_flame_video(6, height=32, width=128)
    spec = CihxSpec(width=128, height=32, total_frames=6, record_rate=10_000,
                    bit_depth=12, color_bit=16)
    # Payload written at the STORAGE depth (16-bit words).
    (tmp_path / "mx.mraw").write_bytes(frames.astype("<u2").tobytes())
    from hsip_tpu.io import write_cihx

    meta = write_cihx(tmp_path / "mx.cihx", spec)
    with PhotonVideo(str(meta)) as video:
        np.testing.assert_array_equal(video[0], frames[0])
        assert len(video) == 6
        assert video.bit_depth == 12  # effective precision still reported
        # float64 view normalizes by the EFFECTIVE depth.
        assert video.to_float64()[0].max() <= 1.0


def test_effective_bit_side_contract(tmp_path):
    """'Higher' alignment (values left-shifted into MSBs) warns but decodes
    as stored; unknown side values raise; the default 'Lower' is silent."""
    import warnings as _warnings

    from hsip_tpu.io import CihxSpec, synthesize_flame_video, write_cihx

    frames, _ = synthesize_flame_video(4, height=32, width=128)
    (tmp_path / "hb.mraw").write_bytes(frames.astype("<u2").tobytes())

    # 12 effective bits on the Higher side of 16-bit words → warn, no rescale.
    meta = write_cihx(
        tmp_path / "hb.cihx",
        CihxSpec(width=128, height=32, total_frames=4, record_rate=10_000,
                 bit_depth=12, color_bit=16, effective_bit_side="Higher"),
    )
    with pytest.warns(UserWarning, match="x16"):
        video = PhotonVideo(str(meta))
    with video:
        np.testing.assert_array_equal(video[0], frames[0])  # decoded as stored

    # Unknown side → hard error (mirrors the reference loader's validation).
    bad = write_cihx(
        tmp_path / "bad.cihx",
        CihxSpec(width=128, height=32, total_frames=4, record_rate=10_000,
                 bit_depth=12, color_bit=16, effective_bit_side="Sideways"),
    )
    (tmp_path / "bad.mraw").write_bytes(frames.astype("<u2").tobytes())
    with pytest.raises(ValueError, match="EffectiveBit Side"):
        PhotonVideo(str(bad))

    # Standard Lower alignment stays silent even with effective < storage.
    low = write_cihx(
        tmp_path / "low.cihx",
        CihxSpec(width=128, height=32, total_frames=4, record_rate=10_000,
                 bit_depth=12, color_bit=16, effective_bit_side="Lower"),
    )
    (tmp_path / "low.mraw").write_bytes(frames.astype("<u2").tobytes())
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        with PhotonVideo(str(low)) as video:
            assert len(video) == 4


def test_metadata_fields_integration(flame_recording):
    """metadata_fields wires through PhotonVideo: default is for_processing,
    custom sets filter the exposed dict, raw_metadata stays complete."""
    with PhotonVideo(str(flame_recording["path"])) as video:
        # Default preset: essential + recording.
        assert "Record Rate(fps)" in video.metadata
        assert "Total Frame" in video.metadata
        assert "Image Width" in video.raw_metadata
    with PhotonVideo(
        str(flame_recording["path"]), metadata_fields={"Camera Type"}
    ) as video:
        assert "Camera Type" in video.metadata  # custom field
        assert "Total Frame" in video.metadata  # essentials always included
        assert "Record Rate(fps)" not in video.metadata  # recording excluded


def test_metadata_categories_builder():
    cfg = MetadataConfig.categories("recording", "device")
    assert "Record Rate(fps)" in cfg.fields and "Camera Type" in cfg.fields
    assert "Total Frame" in cfg.fields  # essential always included
    with pytest.raises(ValueError, match="bogus"):
        MetadataConfig.categories("bogus")
    bare = MetadataConfig(fields={"Camera Type"}, include_essential=False)
    assert bare.fields == {"Camera Type"}
