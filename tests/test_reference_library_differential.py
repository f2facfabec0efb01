"""Library-layer differential: our core classes vs the reference's own.

Opt-in tier (``HSIP_REFERENCE=1``): imports the reference's ``src.photron``
package (through the same pyMRAW shim as ``test_reference_differential.py``)
and compares behaviors side by side — timing algebra, video indexing and
metadata, collection global addressing, calibration matching, and the
serial processor contract. Unlike the hand-computed unit tests, the oracle
here is the reference code itself.

Reference parity targets: ``src/photron/video.py`` (TimingInfo :186-272,
PhotonVideo :275-750), ``collection.py``, ``metadata.py``,
``parallel.py:76-115``, ``scripts/process_videos.py:49-101``.
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np
import pytest

from hsip_tpu.io import CihxSpec, FlameSpec, synthesize_flame_video, write_recording
from hsip_tpu.testing import REFERENCE_ROOT, install_pymraw_shim, reference_script
from tests.test_reference_differential import (
    ref,  # noqa: F401  (module-scoped fixture, reused for the script symbols)
)

pytestmark = pytest.mark.skipif(
    os.environ.get("HSIP_REFERENCE") != "1" or not reference_script().exists(),
    reason="opt-in differential tier: set HSIP_REFERENCE=1 (needs the "
    "reference checkout)",
)


@pytest.fixture(scope="module")
def refpkg():
    """The reference's ``src.photron`` package, loaded from its checkout."""
    install_pymraw_shim()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import src.photron as refphotron

    return refphotron


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    """Three recordings with distinct lengths/rates for collection tests."""
    d = tmp_path_factory.mktemp("refdiff-lib")
    for seed, (stem, n, rate) in enumerate((
        ("lib-run-1-001", 12, 100_000),
        ("lib-run-2-007", 20, 50_000),
        ("lib-run-3-019", 7, 100_000),
    )):
        frames, _ = synthesize_flame_video(
            n, height=48, width=256, flame=FlameSpec(seed=seed)
        )
        write_recording(
            d, stem, frames,
            spec=CihxSpec(width=256, height=48, total_frames=n,
                          record_rate=rate, bit_depth=12),
        )
    return d


@pytest.fixture(scope="module")
def first_video(video_dir):
    return sorted(video_dir.glob("*.cihx"))[0]


def test_timing_info_algebra_matches(refpkg):
    from hsip_tpu.video import TimingInfo

    dt = datetime.datetime(2026, 3, 14, 15, 9, 26)
    grid = [
        dict(frame_rate=100_000),
        dict(frame_rate=100_000, trigger_frame=37),
        dict(frame_rate=50_000, start_frame=-1200, skip_frame=4),
        dict(frame_rate=50_000, start_frame=250, skip_frame=2,
             recording_datetime=dt, recorded_frame=99),
        dict(frame_rate=0, trigger_frame=5),  # degenerate rate
        dict(frame_rate=20_000, trigger_frame=0, start_frame=0, skip_frame=1,
             recording_datetime=dt),
    ]
    for kwargs in grid:
        theirs = refpkg.TimingInfo(**kwargs)
        ours = TimingInfo(**kwargs)
        assert ours.has_absolute_timing == theirs.has_absolute_timing, kwargs
        for i in (-40, -1, 0, 1, 2, 63, 1000):
            assert ours.frame_to_time(i) == theirs.frame_to_time(i), (kwargs, i)
            assert ours.frame_to_absolute_time(i) == theirs.frame_to_absolute_time(i)
            assert ours.frame_to_datetime(i) == theirs.frame_to_datetime(i)
        for t in (-1e-3, 0.0, 1.7e-4, 0.5):
            assert ours.time_to_frame(t) == theirs.time_to_frame(t), (kwargs, t)


def test_video_surface_matches(refpkg, first_video):
    from hsip_tpu import open_video

    theirs = refpkg.open_video(str(first_video))
    ours = open_video(str(first_video))
    assert len(ours) == len(theirs)
    assert ours.frame_shape == theirs.frame_shape
    assert ours.dtype == theirs.dtype
    assert ours.frame_rate == theirs.frame_rate
    assert ours.bit_depth == theirs.bit_depth
    assert ours.duration == theirs.duration
    assert ours.trigger_frame == theirs.trigger_frame
    assert ours.metadata == theirs.metadata
    assert ours.cihx_metadata == theirs.cihx_metadata

    np.testing.assert_array_equal(ours[0], theirs[0])
    np.testing.assert_array_equal(ours[-1], theirs[-1])
    np.testing.assert_array_equal(ours[2:9:3], theirs[2:9:3])
    np.testing.assert_array_equal(
        np.stack(list(iter(ours))), np.stack(list(iter(theirs)))
    )
    with pytest.raises(IndexError):
        theirs[len(theirs)]
    with pytest.raises(IndexError):
        ours[len(ours)]

    for i in (0, 1, len(theirs) - 1):
        assert ours.get_time(i) == theirs.get_time(i)
        assert ours.get_absolute_time(i) == theirs.get_absolute_time(i)
        assert ours.get_datetime(i) == theirs.get_datetime(i)
    for t in (-1.0, 0.0, 3e-5, 10.0):  # clamped inverse; returns the frame
        np.testing.assert_array_equal(
            ours.get_frame_at_time(t), theirs.get_frame_at_time(t)
        )
    np.testing.assert_array_equal(
        ours.get_time_range(0.0, 5e-5), theirs.get_time_range(0.0, 5e-5)
    )

    # Calibration API: same unset error, same conversions after chaining set.
    with pytest.raises(ValueError):
        theirs.pixels_to_physical(10)
    with pytest.raises(ValueError):
        ours.pixels_to_physical(10)
    t2 = theirs.set_calibration(8.3e-4, units="m", origin_x=5.0)
    o2 = ours.set_calibration(8.3e-4, units="m", origin_x=5.0)
    assert t2 is theirs and o2 is ours  # chaining contract
    for px in (0, 3, 117.5):
        assert ours.pixels_to_physical(px) == theirs.pixels_to_physical(px)
        assert ours.calibration.x_to_physical(px) == theirs.calibration.x_to_physical(px)

    # set_trigger_frame rebuilds timing identically.
    theirs.set_trigger_frame(4)
    ours.set_trigger_frame(4)
    assert ours.get_time(0) == theirs.get_time(0)

    # Float64 normalized view.
    tv = theirs.to_float64(normalize=True)
    ov = ours.to_float64(normalize=True)
    np.testing.assert_array_equal(ov[1], tv[1])

    theirs.close()
    ours.close()


def test_metadata_config_matches(refpkg):
    from hsip_tpu.metadata import MetadataConfig

    theirs_mod = refpkg.MetadataConfig
    for preset in ("minimal", "full", "for_processing"):
        assert getattr(MetadataConfig, preset)().fields == getattr(
            theirs_mod, preset
        )().fields, preset
    for cat in ("ESSENTIAL", "RECORDING", "DEVICE", "EXTENDED"):
        assert getattr(MetadataConfig, cat) == getattr(theirs_mod, cat), cat
    sample = {
        "Total Frame": 10, "Image Width": 64, "Image Height": 48,
        "Record Rate(fps)": 1000, "Unknown Field": "x", "Device Name": "Nova",
    }
    assert MetadataConfig.for_processing().filter_metadata(sample) == (
        theirs_mod.for_processing().filter_metadata(sample)
    )


def test_collection_global_addressing_matches(refpkg, video_dir):
    from hsip_tpu.collection import VideoCollection

    theirs = refpkg.VideoCollection.from_directory(str(video_dir))
    ours = VideoCollection.from_directory(str(video_dir))
    assert len(ours) == len(theirs) == 3
    assert ours.total_frames == theirs.total_frames

    n = theirs.total_frames
    for g in list(range(n)) + [-1, -n]:
        assert ours.global_to_local(g) == theirs.global_to_local(g), g
        np.testing.assert_array_equal(
            ours.get_global_frame(g), theirs.get_global_frame(g)
        )
        assert ours.get_global_time(g) == theirs.get_global_time(g), g
    for v in range(3):
        for i in (0, 1):
            assert ours.local_to_global(v, i) == theirs.local_to_global(v, i)
    with pytest.raises(IndexError):
        theirs.get_global_frame(n)
    with pytest.raises(IndexError):
        ours.get_global_frame(n)

    fn = lambda frame, vid, idx: (vid, idx, int(frame.sum()))  # noqa: E731
    assert ours.map_frames(fn, frame_indices=[0, 5, n - 1]) == (
        theirs.map_frames(fn, frame_indices=[0, 5, n - 1])
    )
    got_o = [(v, i, t, int(f.sum())) for f, v, i, t in ours.iter_frames()]
    got_t = [(v, i, t, int(f.sum())) for f, v, i, t in theirs.iter_frames()]
    assert got_o == got_t

    theirs.close_all()
    ours.close_all()


def test_file_calibration_matching_matches(ref):
    mod = ref
    from hsip_tpu.track.config import FileCalibration

    patterns = [
        ["Run-005.cihx"], ["run-1"], ["Run-001:Run-010"], ["010:030"],
        ["3:7"], ["no-integers-here"], ["Run-0:Run-2", "exact-match.cihx"],
        [],
    ]
    names = [
        "Run-005.cihx", "nova-run-1-017.cihx", "Run-011.cihx", "mini-020.cihx",
        "plain.cihx", "no-integers-here.cihx", "exact-match.cihx", "run-3.cihx",
    ]
    for files in patterns:
        theirs = mod.FileCalibration(calibration=1.0, files=list(files))
        ours = FileCalibration(calibration=1.0, files=list(files))
        for name in names:
            assert ours.matches(name) == theirs.matches(name), (files, name)


def test_serial_processor_contract_matches(refpkg, video_dir):
    from hsip_tpu.parallel import TPUVideoProcessor

    theirs = refpkg.MPIVideoProcessor(None)
    ours = TPUVideoProcessor(use_distributed=False)
    assert (ours.rank, ours.size, ours.is_root, ours.is_parallel) == (
        theirs.rank, theirs.size, theirs.is_root, theirs.is_parallel
    )
    for total in (0, 1, 7, 8, 100):
        for strategy in ("round_robin", "contiguous"):
            assert list(ours.distribute_indices(total, strategy)) == list(
                theirs.distribute_indices(total, strategy)
            ), (total, strategy)
    with pytest.raises(ValueError):
        theirs.distribute_indices(5, "bogus")
    with pytest.raises(ValueError):
        ours.distribute_indices(5, "bogus")

    # Serial collective degenerations.
    assert ours.broadcast({"k": 1}) == theirs.broadcast({"k": 1})
    assert ours.gather([1, 2]) == theirs.gather([1, 2])
    assert ours.scatter([[1], [2]]) == theirs.scatter([[1], [2]])
    buf = np.arange(4.0)
    np.testing.assert_array_equal(ours.reduce_sum(buf), theirs.reduce_sum(buf))
    np.testing.assert_array_equal(ours.allreduce_sum(buf), theirs.allreduce_sum(buf))

    # process_collection: identical results through both serial runtimes.
    theirs_c = refpkg.VideoCollection.from_directory(str(video_dir))
    from hsip_tpu.collection import VideoCollection

    ours_c = VideoCollection.from_directory(str(video_dir))
    fn = lambda frame, global_idx: (global_idx, int(frame.max()))  # noqa: E731
    assert ours.process_collection(ours_c, fn) == theirs.process_collection(
        theirs_c, fn
    )
    fn_v = lambda video, vid: (vid, len(video))  # noqa: E731
    assert ours.process_videos(ours_c, fn_v) == theirs.process_videos(
        theirs_c, fn_v
    )
    theirs_c.close_all()
    ours_c.close_all()
