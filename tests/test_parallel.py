"""Parallel layer tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from hsip_tpu import open_collection
from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording
from hsip_tpu.kernels.preprocess import batch_centerline_profiles
from hsip_tpu.parallel import (
    TPUVideoProcessor,
    make_mesh,
    sharded_centerline_profiles,
    video_frame_mesh,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


# ---------------------------------------------------------------------------
# Mesh construction
# ---------------------------------------------------------------------------


def test_make_mesh():
    mesh = make_mesh("frame")
    assert mesh.shape["frame"] == 8
    mesh4 = make_mesh("frame", n_devices=4)
    assert mesh4.shape["frame"] == 4


def test_video_frame_mesh():
    mesh = video_frame_mesh(2)
    assert mesh.shape["video"] == 2
    assert mesh.shape["frame"] == 4
    with pytest.raises(ValueError):
        video_frame_mesh(3)


# ---------------------------------------------------------------------------
# Sharded map phase: halo exchange must reproduce the serial chain exactly
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_profiles_match_single_device(n_dev):
    flame = FlameSpec(x0=25.0, v0_px=6.0, ignition_frame=2, seed=9)
    frames, _ = synthesize_flame_video(24, height=32, width=256, flame=flame)
    bg = float(np.max(frames[0]))
    noise = max(10.0, bg * 0.5)

    mesh = make_mesh("frame", n_devices=n_dev)
    s_sob, s_grad, s_int, s_raw, s_cnt = sharded_centerline_profiles(
        frames, bg, 5.0, noise, mesh
    )

    prior_index = np.arange(-1, 23, dtype=np.int32)
    r_sob, r_grad, r_int, r_raw, r_cnt = batch_centerline_profiles(
        frames.astype(np.float32), np.float32(bg), prior_index,
        np.float32(5.0), np.float32(noise),
    )
    # Same math, different partitioning — float32-exact equality expected
    # except where reduction order could differ (none here: pointwise chain).
    np.testing.assert_allclose(s_sob, np.asarray(r_sob), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(s_grad, np.asarray(r_grad), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(s_int, np.asarray(r_int), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(s_raw, np.asarray(r_raw), atol=1e-4, rtol=1e-5)
    np.testing.assert_array_equal(s_cnt, np.asarray(r_cnt))


def test_sharded_profiles_pad_to_shards():
    # 10 frames over 8 devices: pads to 16, returns 10.
    frames, _ = synthesize_flame_video(10, height=32, width=128)
    bg = float(np.max(frames[0]))
    mesh = make_mesh("frame")
    sob, grad, intens, raw, cnt = sharded_centerline_profiles(
        frames, bg, 5.0, 10.0, mesh
    )
    assert sob.shape == (10, 128) and grad.shape == (10, 128)
    assert intens.shape == (10, 128) and raw.shape == (10, 128)
    assert cnt.shape == (10,)


# ---------------------------------------------------------------------------
# TPUVideoProcessor (serial-fallback contract; multi-process needs real hosts)
# ---------------------------------------------------------------------------


def test_processor_serial_identity():
    p = TPUVideoProcessor(use_distributed=False)
    assert p.rank == 0 and p.size == 1 and p.is_root and not p.is_parallel
    assert p.broadcast({"a": 1}) == {"a": 1}
    assert p.gather([1, 2]) == [[1, 2]]
    assert p.allgather("x") == ["x"]
    assert p.scatter([42]) == 42
    assert p.scatter(None) is None
    arr = np.arange(4.0)
    np.testing.assert_array_equal(p.allreduce_sum(arr), arr)
    np.testing.assert_array_equal(p.reduce_sum(arr), arr)
    p.barrier()  # no-op
    assert "serial" in repr(p)


def test_processor_distribute_indices():
    p = TPUVideoProcessor(use_distributed=False)
    assert p.distribute_indices(5) == [0, 1, 2, 3, 4]
    assert p.distribute_indices(5, "contiguous") == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        p.distribute_indices(5, "bogus")

    # Simulate multi-rank index math directly.
    class Fake(TPUVideoProcessor):
        def __init__(self, rank, size):
            self._distributed = True
            self._rank, self._size = rank, size

    rr = [Fake(r, 4).distribute_indices(10) for r in range(4)]
    assert rr[0] == [0, 4, 8]
    assert rr[1] == [1, 5, 9]
    assert sorted(i for sub in rr for i in sub) == list(range(10))
    ct = [Fake(r, 4).distribute_indices(10, "contiguous") for r in range(4)]
    assert ct[0] == [0, 1, 2] and ct[1] == [3, 4, 5] and ct[3] == [8, 9]
    assert sorted(i for sub in ct for i in sub) == list(range(10))


def test_processor_process_collection(tmp_path):
    frames, _ = synthesize_flame_video(6, height=32, width=128)
    write_recording(tmp_path, "v1", frames)
    write_recording(tmp_path, "v2", frames[:4])
    coll = open_collection(str(tmp_path))
    p = TPUVideoProcessor(use_distributed=False)
    res = p.process_collection(coll, lambda fr, g: float(fr.mean()))
    assert len(res) == 10
    assert [g for g, _ in res] == list(range(10))
    res_v = p.process_videos(coll, lambda v, i: len(v))
    assert res_v == [(0, 6), (1, 4)]
    coll.close_all()


def test_track_video_over_mesh_matches_single_device(tmp_path):
    """track_video(mesh=...) — the shard_map frame scatter — must produce
    rows identical to the single-device path."""
    from hsip_tpu import open_video
    from hsip_tpu.track import FlameDetectorConfig
    from hsip_tpu.track.scan import track_video

    frames, _ = synthesize_flame_video(
        40, height=48, width=384,
        flame=FlameSpec(x0=30, v0_px=7, accel_px=0.2, ignition_frame=2, seed=12),
    )
    meta = write_recording(tmp_path, "mesh-tv-run-1", frames)
    mesh = make_mesh("frame")
    with open_video(str(meta)) as video:
        single = track_video(video, FlameDetectorConfig(), 0.0008, 1.0)
        sharded = track_video(video, FlameDetectorConfig(), 0.0008, 1.0,
                              mesh=mesh)
    assert [r[:4] for r in sharded.rows] == [r[:4] for r in single.rows]
    assert sharded.break_reason == single.break_reason
    assert sharded.tracker.ddt_frame == single.tracker.ddt_frame


def test_track_video_over_mesh_streams_chunks(tmp_path):
    """The sharded map phase streams chunks with one-frame prior overlap;
    tiny chunk size forces multiple chunks and must still match serial.
    Also composes with the device scan."""
    from hsip_tpu import open_video
    from hsip_tpu.track import FlameDetectorConfig
    from hsip_tpu.track.scan import _compute_profiles_sharded, track_video

    frames, _ = synthesize_flame_video(
        37, height=32, width=256,
        flame=FlameSpec(x0=25, v0_px=6, ignition_frame=2, seed=14),
    )
    meta = write_recording(tmp_path, "stream-tv-run-1", frames)
    mesh = make_mesh("frame", n_devices=4)
    with open_video(str(meta)) as video:
        single = track_video(video, FlameDetectorConfig(), 0.001, 0.0)
        # frames_per_shard=2 -> chunks of 8 frames -> 5 chunks with overlap.
        profiles = _compute_profiles_sharded(
            video, float(np.max(video[0])), FlameDetectorConfig(), (), mesh,
            frames_per_shard=2,
        )
        from hsip_tpu.track.scan import run_tracking_scan

        streamed = run_tracking_scan(
            profiles, FlameDetectorConfig(), video.frame_rate, 0.001,
            time_fn=video.get_absolute_time,
        )
        # mesh + device scan composition.
        dev = track_video(video, FlameDetectorConfig(), 0.001, 0.0,
                          mesh=mesh, scan="device")
    assert [r[:3] for r in streamed.rows] == [r[:3] for r in single.rows]
    assert [r[:4] for r in dev.rows] == [r[:4] for r in single.rows]
    assert dev.total_frames == 37


def test_track_video_over_mesh_with_skip_frames(tmp_path):
    """skip_frames on the sharded map phase: compacting processed frames
    preserves prior adjacency, so rows must match the single-device path
    with the same skip list (including across chunk boundaries)."""
    from hsip_tpu import open_video
    from hsip_tpu.track import FlameDetectorConfig
    from hsip_tpu.track.scan import track_video

    frames, _ = synthesize_flame_video(
        41, height=32, width=256,
        flame=FlameSpec(x0=25, v0_px=6, accel_px=0.1, ignition_frame=2,
                        seed=17),
    )
    meta = write_recording(tmp_path, "skip-mesh-run-1", frames)
    mesh = make_mesh("frame", n_devices=4)
    skip = [0, 7, 8, 20, 33]
    with open_video(str(meta)) as video:
        single = track_video(video, FlameDetectorConfig(), 0.0008, 0.0,
                             skip_frames=skip)
        sharded = track_video(video, FlameDetectorConfig(), 0.0008, 0.0,
                              skip_frames=skip, mesh=mesh, chunk_size=32)
    assert single.rows and len(single.rows) > 20
    assert [r[:4] for r in sharded.rows] == [r[:4] for r in single.rows]
    assert not {r[0] for r in sharded.rows} & set(skip)
    assert sharded.break_reason == single.break_reason


def test_track_video_over_mesh_even_kernel_folding_fallback(tmp_path):
    """Even morphology kernel + folding band: the mesh path must route to
    the float64 host fallback (like the batched path) instead of raising."""
    from hsip_tpu import open_video
    from hsip_tpu.track import FlameDetectorConfig
    from hsip_tpu.track.scan import track_video

    frames, _ = synthesize_flame_video(
        24, height=12, width=256,  # short frame: the 19-row band folds
        flame=FlameSpec(x0=25, v0_px=6, ignition_frame=2, seed=19),
    )
    meta = write_recording(tmp_path, "fold-mesh-run-1", frames)
    cfg = FlameDetectorConfig(morphology_kernel_size=4)
    mesh = make_mesh("frame", n_devices=4)
    with open_video(str(meta)) as video:
        single = track_video(video, cfg, 0.001)
        sharded = track_video(video, cfg, 0.001, mesh=mesh)
    assert [r[:4] for r in sharded.rows] == [r[:4] for r in single.rows]


def test_multichip_dryrun_kernel_step():
    """The driver's dryrun kernel step runs on the 8-virtual-device mesh."""
    from hsip_tpu.parallel.dryrun import run_multichip_dryrun

    pos_g, pos_s, total = run_multichip_dryrun(8)
    assert pos_g.shape == pos_s.shape == (2, 8)
    assert total > 0


def test_multichip_dryrun_pipeline():
    """Orchestration dry-run: process_video_source_library over a video
    mesh writes tables byte-identical to the unsharded run."""
    from hsip_tpu.parallel.dryrun import run_pipeline_dryrun

    assert run_pipeline_dryrun(8) == (3, "fused")
