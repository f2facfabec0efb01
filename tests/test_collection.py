"""VideoCollection tests: global indexing, constructors, batch ops."""

import numpy as np
import pytest

from hsip_tpu import VideoCollection, open_collection
from hsip_tpu.io import CihxSpec, synthesize_flame_video, write_recording


@pytest.fixture(scope="module")
def collection_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("collection")
    all_frames = []
    for i, n in enumerate([5, 8, 3]):
        frames, _ = synthesize_flame_video(n, height=32, width=128, bit_depth=12)
        # Tag frame payload so identity is checkable across videos.
        frames = frames.copy()
        frames[:, 0, 0] = i * 100 + np.arange(n)
        spec = CihxSpec(width=128, height=32, total_frames=n, record_rate=10_000)
        write_recording(tmp, f"run-{i + 1}-video", frames, spec=spec)
        all_frames.append(frames)
    # A decoy non-matching file.
    (tmp / "notes.txt").write_text("not a video")
    return tmp, all_frames


def test_from_directory_and_lengths(collection_dir):
    tmp, all_frames = collection_dir
    coll = VideoCollection.from_directory(tmp, pattern="*.cihx")
    assert len(coll) == 3
    assert coll.total_frames == 16
    assert [len(v) for v in coll] == [5, 8, 3]
    assert len(coll.filepaths) == 3
    coll.close_all()


def test_global_index_resolution(collection_dir):
    tmp, all_frames = collection_dir
    with VideoCollection.from_directory(tmp) as coll:
        assert coll.global_to_local(0) == (0, 0)
        assert coll.global_to_local(4) == (0, 4)
        assert coll.global_to_local(5) == (1, 0)
        assert coll.global_to_local(12) == (1, 7)
        assert coll.global_to_local(13) == (2, 0)
        assert coll.global_to_local(-1) == (2, 2)
        assert coll.local_to_global(1, 0) == 5
        assert coll.local_to_global(2, 2) == 15
        with pytest.raises(IndexError):
            coll.global_to_local(16)
        with pytest.raises(IndexError):
            coll.local_to_global(5, 0)

        np.testing.assert_array_equal(coll.get_global_frame(5), all_frames[1][0])
        np.testing.assert_array_equal(coll.get_global_frame(15), all_frames[2][2])
        assert coll.get_global_time(5) == 0.0


def test_map_frames_and_iter(collection_dir):
    tmp, all_frames = collection_dir
    with open_collection(str(tmp)) as coll:
        tags = coll.map_frames(lambda fr, vi, fi: (vi, fi, int(fr[0, 0])))
        assert len(tags) == 16
        assert tags[0] == (0, 0, 0)
        assert tags[5] == (1, 0, 100)
        # Subset by global indices.
        sub = coll.map_frames(lambda fr, vi, fi: int(fr[0, 0]), frame_indices=[5, 13])
        assert sub == [100, 200]
        # Subset by video index.
        sub_v = coll.map_frames(lambda fr, vi, fi: vi, video_indices=[2])
        assert sub_v == [2, 2, 2]
        rows = list(coll.iter_frames())
        assert len(rows) == 16
        frame, vi, fi, t = rows[5]
        assert (vi, fi) == (1, 0) and t == 0.0


def test_from_files_and_setters(collection_dir):
    tmp, _ = collection_dir
    files = sorted(tmp.glob("*.cihx"))
    coll = VideoCollection.from_files(files)
    out = coll.set_calibration_all(0.002).set_trigger_frame_all(1)
    assert out is coll
    for v in coll:
        assert v.calibration.scale == 0.002
        assert v.trigger_frame == 1
    assert "VideoCollection" in repr(coll)
    assert "3 videos" in coll.summary()
    coll.close_all()


def test_from_directory_skips_bad_files(tmp_path, capsys):
    frames, _ = synthesize_flame_video(3, height=32, width=128)
    write_recording(tmp_path, "good", frames)
    (tmp_path / "bad.cihx").write_bytes(b"corrupt")
    coll = VideoCollection.from_directory(tmp_path)
    assert len(coll) == 1
    assert "Warning" in capsys.readouterr().out
    coll.close_all()


def test_from_directory_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        VideoCollection.from_directory(tmp_path / "nope")


def test_open_collection_dispatch(collection_dir):
    tmp, _ = collection_dir
    files = [str(p) for p in sorted(tmp.glob("*.cihx"))]
    c1 = open_collection(str(tmp))
    c2 = open_collection(files)
    assert len(c1) == len(c2) == 3
    with pytest.raises(ValueError):
        open_collection(42)  # type: ignore[arg-type]
    c1.close_all()
    c2.close_all()


def test_batch_plan(collection_dir):
    tmp, _ = collection_dir
    with open_collection(str(tmp)) as coll:
        plan = coll.batch_plan()
        assert plan["max_frames"] == 8
        assert plan["max_height"] == 32 and plan["max_width"] == 128
        np.testing.assert_array_equal(plan["lengths"], [5, 8, 3])
        assert plan["pad_mask"].shape == (3, 8)
        assert plan["pad_mask"][0, 4] and not plan["pad_mask"][0, 5]


def test_from_directory_recursive(collection_dir):
    """recursive=True discovers session-style nested layouts (sorted path
    order); the default stays non-recursive so sibling sessions are not
    silently merged."""
    tmp, all_frames = collection_dir
    frames, _ = synthesize_flame_video(4, height=32, width=128, bit_depth=12)
    spec = CihxSpec(width=128, height=32, total_frames=4, record_rate=10_000)
    write_recording(tmp / "session-B", "run-9-video", frames, spec=spec)
    try:
        from hsip_tpu import VideoCollection

        with VideoCollection.from_directory(str(tmp)) as flat:
            assert len(flat) == 3  # nested recording NOT picked up
        with VideoCollection.from_directory(str(tmp), recursive=True) as rec:
            assert len(rec) == 4
            names = [v.filepath.name for v in rec]
            assert "run-9-video.cihx" in names
            assert rec.total_frames == sum(len(f) for f in all_frames) + 4
    finally:
        # Leave the shared module-scoped fixture directory as found.
        import shutil

        shutil.rmtree(tmp / "session-B")
