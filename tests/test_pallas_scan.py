"""Pallas scan kernel: bit-identity with the lax.scan tracker.

The single-kernel Pallas scan (track/pallas_scan.py) must agree with
device_tracking_scan on EVERY output field, bit for bit — it is the TPU
fast path for the default tracker, and the host scan's quantization
contract is anchored on the lax.scan semantics. These tests run the kernel
in interpret mode on the CPU suite; the real-chip identity + latency
checks live in the HSIP_TPU_CHIP=1 tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording
from hsip_tpu.track import FlameDetectorConfig
from hsip_tpu.track.device_scan import device_tracking_scan
from hsip_tpu.track.pallas_scan import pallas_tracking_scan, supports_pallas_scan


def _assert_identical(a, b):
    for name in a._fields:
        va = np.asarray(getattr(a, name))
        vb = np.asarray(getattr(b, name)).astype(va.dtype)
        np.testing.assert_array_equal(va, vb, err_msg=name)


def _run_both(fidx, sob, grad, empty, prior, **kw):
    a = device_tracking_scan(
        fidx, sob, grad, jnp.asarray(empty), jnp.asarray(prior), **kw
    )
    b = pallas_tracking_scan(
        fidx, sob, grad, jnp.asarray(empty), jnp.asarray(prior),
        interpret=True, **kw,
    )
    _assert_identical(a, b)
    return a


_KW = dict(
    min_gradient_strength=np.float32(10.0),
    sobel_threshold_fraction=np.float32(0.1),
    ddt_velocity_jump=np.float32(1250.0),
    calibration=np.float32(0.001),
    frame_rate=np.float32(100_000.0),
    max_displacement_px=np.int32(3),
)


def test_pallas_scan_random_profiles():
    rng = np.random.default_rng(3)
    # Aligned and non-aligned widths: the kernel pads rows to a lane
    # multiple, so any W must match the lax.scan backend bit for bit.
    for trial, W in enumerate((256, 250, 255, 100)):
        M = int(rng.integers(8, 80))
        sob = rng.normal(0, 30, (M, W)).astype(np.float32)
        grad = rng.normal(0, 15, (M, W)).astype(np.float32)
        empty = rng.random(M) < 0.15
        prior = np.ones(M, bool)
        prior[0] = False
        fidx = np.arange(M, dtype=np.int32)
        _run_both(fidx, sob, grad, empty, prior, width=W, **_KW)


def test_folded_matches_unfolded_v1():
    """The V=1 FOLDED layout (profile row split across the 8 sublanes)
    must be bit-identical to the sublane-video layout with 7 inert pads —
    across widths that fold exactly (1024), pad within one tile (250,
    640), and span two folded tiles (1500)."""
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    rng = np.random.default_rng(17)
    for W in (1024, 250, 640, 1500):
        M = int(rng.integers(16, 60))
        sob = rng.normal(0, 30, (1, M, W)).astype(np.float32)
        grad = rng.normal(0, 15, (1, M, W)).astype(np.float32)
        empty = jnp.asarray(rng.random((1, M)) < 0.15)
        prior = np.ones((1, M), bool)
        prior[0, 0] = False
        fidx = np.arange(M, dtype=np.int32).reshape(1, M)
        kw = dict(
            width=W,
            min_gradient_strength=np.float32(10.0),
            sobel_threshold_fraction=np.float32(0.1),
            ddt_velocity_jump=np.float32(1250.0),
            calibration=np.ones(1, np.float32) * 0.001,
            frame_rate=np.ones(1, np.float32) * 100_000.0,
            max_displacement_px=np.ones(1, np.int32) * 3,
            interpret=True,
        )
        a = pallas_tracking_scan_batched(
            fidx, sob, grad, empty, jnp.asarray(prior), fold=False, **kw
        )
        b = pallas_tracking_scan_batched(
            fidx, sob, grad, empty, jnp.asarray(prior), fold=True, **kw
        )
        _assert_identical(a, b)


@pytest.mark.parametrize("method", ["threshold", "half_maximum", "gradient"])
def test_folded_named_methods_match(method):
    """Folded layout parity for the named detectors — 'gradient' covers
    the fold-boundary neighbor fix (_fold_neighbors)."""
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    rng = np.random.default_rng(23)
    for W in (250, 1024):
        M = 40
        intens = np.abs(rng.normal(40, 30, (1, M, W))).astype(np.float32)
        zeros = np.zeros((1, M, W), np.float32)
        empty = jnp.asarray(rng.random((1, M)) < 0.1)
        prior = np.ones((1, M), bool)
        fidx = np.arange(M, dtype=np.int32).reshape(1, M)
        kw = dict(
            width=W,
            min_gradient_strength=np.float32(5.0),
            sobel_threshold_fraction=np.float32(0.1),
            ddt_velocity_jump=np.float32(1250.0),
            calibration=np.ones(1, np.float32) * 0.001,
            frame_rate=np.ones(1, np.float32) * 100_000.0,
            max_displacement_px=np.ones(1, np.int32) * 3,
            interpret=True,
            method=method,
            intensity_lines=intens,
            method_fraction=np.float32(0.5),
        )
        a = pallas_tracking_scan_batched(
            fidx, zeros, zeros, empty, jnp.asarray(prior), fold=False, **kw
        )
        b = pallas_tracking_scan_batched(
            fidx, zeros, zeros, empty, jnp.asarray(prior), fold=True, **kw
        )
        _assert_identical(a, b)


def test_fold_env_knob(monkeypatch):
    """HSIP_PALLAS_FOLD=0 disables auto-folding; fold=True at V>1 is an
    error (the folded tile holds exactly one video's column groups)."""
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    rng = np.random.default_rng(5)
    M, W = 16, 256
    sob = rng.normal(0, 30, (2, M, W)).astype(np.float32)
    kw = dict(
        width=W,
        min_gradient_strength=np.float32(10.0),
        sobel_threshold_fraction=np.float32(0.1),
        ddt_velocity_jump=np.float32(1250.0),
        calibration=np.ones(2, np.float32),
        frame_rate=np.ones(2, np.float32) * 1e5,
        max_displacement_px=np.ones(2, np.int32) * 3,
        interpret=True,
    )
    fidx = np.tile(np.arange(M, dtype=np.int32), (2, 1))
    empty = jnp.zeros((2, M), bool)
    prior = jnp.ones((2, M), bool)
    with pytest.raises(ValueError, match="fold"):
        pallas_tracking_scan_batched(
            fidx, sob, sob, empty, prior, fold=True, **kw
        )
    # env off: V=1 auto-routing must pick the unfolded layout (proved by
    # parity anyway; this pins the knob actually being read).
    monkeypatch.setenv("HSIP_PALLAS_FOLD", "0")
    kw1 = dict(kw, calibration=kw["calibration"][:1],
               frame_rate=kw["frame_rate"][:1],
               max_displacement_px=kw["max_displacement_px"][:1])
    res = pallas_tracking_scan_batched(
        fidx[:1], sob[:1], sob[:1], empty[:1], prior[:1], **kw1
    )
    assert np.asarray(res.final_position).shape == (1, M)


def _video_profiles(flame, n=40, width=256, height=32):
    from hsip_tpu.track.scan import compute_profiles_batched

    frames, _ = synthesize_flame_video(n, height=height, width=width,
                                       flame=flame)
    config = FlameDetectorConfig()
    bg = float(frames[0].max())

    def read_batch(a, b):
        return frames[a:b]

    p = compute_profiles_batched(
        read_batch, n, (height, width), bg, config, chunk_size=16
    )
    from hsip_tpu.track.scan import MIN_SIGNAL_FRACTION

    empty = p.signal_counts / p.total_pixels < MIN_SIGNAL_FRACTION
    return p, empty


@pytest.mark.parametrize("flame", [
    FlameSpec(x0=25.0, v0_px=9.0, accel_px=0.05, ignition_frame=2, seed=7),
    FlameSpec(x0=20.0, v0_px=4.0, ddt_frame=18, v_jump_px=22.0,
              ignition_frame=3, seed=11),
    FlameSpec(x0=30.0, v0_px=6.0, ignition_frame=12, seed=13),
], ids=["exit", "ddt", "late-ignition"])
def test_pallas_scan_flame_scenarios(flame):
    """Exit truncation, DDT latch and empty-frame skipping all agree."""
    p, empty = _video_profiles(flame)
    res = _run_both(
        np.asarray(p.frame_indices, np.int32),
        np.asarray(p.sobel_lines), np.asarray(p.gradient_lines),
        empty, p.has_prior, width=p.width, **_KW,
    )
    # The scenario must actually exercise the machinery.
    assert int(np.sum(np.asarray(res.recorded))) > 3


def test_pallas_scan_nonaligned_width_flame():
    """A real flame trajectory at a width with no lane alignment (W=250):
    map-phase profiles plus both scan backends, still bit-identical."""
    p, empty = _video_profiles(
        FlameSpec(x0=20.0, v0_px=7.0, ignition_frame=2, seed=17),
        n=32, width=250,
    )
    res = _run_both(
        np.asarray(p.frame_indices, np.int32),
        np.asarray(p.sobel_lines), np.asarray(p.gradient_lines),
        empty, p.has_prior, width=p.width, **_KW,
    )
    assert int(np.sum(np.asarray(res.recorded))) > 3


def test_pallas_scan_zero_frame_rate():
    """frame_rate <= 0 records no velocity entries in either backend."""
    p, empty = _video_profiles(
        FlameSpec(x0=25.0, v0_px=8.0, ignition_frame=2, seed=5), n=24
    )
    kw = dict(_KW, frame_rate=np.float32(0.0))
    _run_both(
        np.asarray(p.frame_indices, np.int32),
        np.asarray(p.sobel_lines), np.asarray(p.gradient_lines),
        empty, p.has_prior, width=p.width, **kw,
    )


def test_pallas_scan_gate():
    assert supports_pallas_scan(1024, "combined")
    assert supports_pallas_scan(1000, "combined")     # pads to lanes
    assert supports_pallas_scan(1024, "gradient")     # named methods covered
    assert not supports_pallas_scan(1024, "nonsense")


def test_track_video_pallas_gate_off_on_cpu(tmp_path):
    """On CPU backends run_tracking_scan_device stays on lax.scan (the
    Pallas kernel would need interpret mode); forcing it via the override
    + interpret is what the tests above do."""
    from hsip_tpu import open_video
    from hsip_tpu.track.scan import track_video

    frames, _ = synthesize_flame_video(
        20, height=32, width=256,
        flame=FlameSpec(x0=25, v0_px=8, ignition_frame=2, seed=9),
    )
    meta = write_recording(tmp_path, "ps-run-1", frames)
    with open_video(str(meta)) as video:
        out = track_video(
            video, FlameDetectorConfig(), calibration_m_per_px=0.001,
            scan="device",
        )
    assert len(out.rows) > 3


def test_pallas_scan_rejects_bad_width():
    with pytest.raises(ValueError, match="width"):
        pallas_tracking_scan(
            np.arange(4, dtype=np.int32),
            np.zeros((4, 256), np.float32), np.zeros((4, 256), np.float32),
            jnp.zeros(4, bool), jnp.ones(4, bool),
            width=512, interpret=True, **_KW,
        )


def test_pallas_scan_batched_matches_vmapped_lax_scan():
    """Whole-batch kernel (grid (V, M), per-video state reset and params)
    is bit-identical to vmap(device_tracking_scan) — including an inert
    all-empty pad video like the mesh-alignment padding."""
    specs = [
        FlameSpec(x0=25.0, v0_px=9.0, accel_px=0.05, ignition_frame=2, seed=7),
        FlameSpec(x0=20.0, v0_px=4.0, ddt_frame=18, v_jump_px=22.0,
                  ignition_frame=3, seed=11),
        FlameSpec(x0=30.0, v0_px=6.0, ignition_frame=12, seed=13),
    ]
    profs = [_video_profiles(f) for f in specs]
    n_max = max(p.frame_indices.size for p, _ in profs)
    V = len(profs) + 1  # + one inert pad video
    W = profs[0][0].width
    fi = np.zeros((V, n_max), np.int32)
    sob = np.zeros((V, n_max, W), np.float32)
    grad = np.zeros((V, n_max, W), np.float32)
    empty = np.ones((V, n_max), bool)
    prior = np.ones((V, n_max), bool)
    cals = np.array([0.001, 0.0008, 0.0012, 1.0], np.float32)
    fps = np.array([1e5, 9e4, 1.1e5, 1.0], np.float32)
    mds = np.array([3, 4, 2, 1], np.int32)
    for i, (p, e) in enumerate(profs):
        m = p.frame_indices.size
        fi[i, :m] = p.frame_indices
        sob[i, :m] = p.sobel_lines
        grad[i, :m] = p.gradient_lines
        empty[i, :m] = e
        prior[i, :m] = p.has_prior

    kw = dict(
        width=W,
        min_gradient_strength=np.float32(10.0),
        sobel_threshold_fraction=np.float32(0.1),
        ddt_velocity_jump=np.float32(1250.0),
    )
    scan_v = jax.vmap(
        lambda f, s, g, e, hp, c, r, md: device_tracking_scan(
            f, s, g, e, hp, calibration=c, frame_rate=r,
            max_displacement_px=md, **kw,
        )
    )
    a = scan_v(jnp.asarray(fi), jnp.asarray(sob), jnp.asarray(grad),
               jnp.asarray(empty), jnp.asarray(prior),
               jnp.asarray(cals), jnp.asarray(fps), jnp.asarray(mds))
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    b = pallas_tracking_scan_batched(
        jnp.asarray(fi), jnp.asarray(sob), jnp.asarray(grad),
        jnp.asarray(empty), jnp.asarray(prior),
        calibration=jnp.asarray(cals), frame_rate=jnp.asarray(fps),
        max_displacement_px=jnp.asarray(mds), interpret=True, **kw,
    )
    _assert_identical(a, b)
    # The batch genuinely tracked something in each real video.
    assert all(np.asarray(a.recorded)[i].sum() > 3 for i in range(3))


def test_pallas_failure_falls_back_to_lax_scan(tmp_path):
    """Forcing the Pallas path on a backend that cannot lower it must
    degrade to the (bit-identical) lax.scan, not abort the run."""
    from hsip_tpu import open_video
    from hsip_tpu.track.scan import (
        compute_profiles_batched,
        run_tracking_scan_device,
    )

    frames, _ = synthesize_flame_video(
        20, height=32, width=256,
        flame=FlameSpec(x0=25, v0_px=8, ignition_frame=2, seed=9),
    )
    meta = write_recording(tmp_path, "fb-run-1", frames)
    with open_video(str(meta)) as video:
        bg = float(np.max(video[0]))
        p = compute_profiles_batched(
            video.read_batch, len(video), video.frame_shape, bg,
            FlameDetectorConfig(), chunk_size=16,
        )
        out = run_tracking_scan_device(
            p, FlameDetectorConfig(), frame_rate=video.frame_rate,
            calibration_m_per_px=0.001,
            use_pallas_scan=True,  # CPU backend: lowering fails -> fallback
        )
        ref = run_tracking_scan_device(
            p, FlameDetectorConfig(), frame_rate=video.frame_rate,
            calibration_m_per_px=0.001, use_pallas_scan=False,
        )
    assert out.rows == ref.rows and len(out.rows) > 3


@pytest.mark.parametrize("W", [1024, 250])
def test_pallas_scan_lowers_for_tpu(W):
    """Cross-platform Mosaic lowering: the kernel must pass the Pallas->TPU
    lowering rules (scalar I/O in SMEM, block layout constraints) WITHOUT a
    chip — this is what stands between interpret-mode parity and the real
    hardware, and it caught scalar-store-to-VMEM and block-shape bugs.
    W=250 exercises the lane-padded (non-aligned-width) layout."""
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    V, M = 2, 16
    args = (
        jnp.zeros((V, M), jnp.int32),
        jnp.zeros((V, M, W), jnp.float32),
        jnp.zeros((V, M, W), jnp.float32),
        jnp.zeros((V, M), bool),
        jnp.ones((V, M), bool),
    )
    kw = dict(
        width=W,
        min_gradient_strength=jnp.float32(10.0),
        sobel_threshold_fraction=jnp.float32(0.1),
        ddt_velocity_jump=jnp.float32(1250.0),
        calibration=jnp.ones(V, jnp.float32),
        frame_rate=jnp.full(V, 1e5, jnp.float32),
        max_displacement_px=jnp.full(V, 3, jnp.int32),
    )
    f = jax.jit(lambda *a: pallas_tracking_scan_batched(*a, **kw))
    low = f.trace(*args).lower(lowering_platforms=("tpu",))
    assert "tpu_custom_call" in low.as_text()


def test_band_preprocess_lowers_for_tpu():
    """Same cross-platform lowering gate for the fused band kernel."""
    import numpy as np

    from hsip_tpu.kernels.pallas_preprocess import pallas_band_profiles

    band = jnp.zeros((4, 19, 1024), jnp.float32)
    pidx = np.arange(-1, 3, dtype=np.int32)
    f = jax.jit(
        lambda b: pallas_band_profiles(b, np.maximum(pidx, 0), jnp.float32(5.0))
    )
    low = f.trace(band).lower(lowering_platforms=("tpu",))
    assert "tpu_custom_call" in low.as_text()


def test_pallas_scan_under_mesh_shard_map(tmp_path, monkeypatch):
    """The kernel path also serves the mesh-sharded library mode: shard_map
    over the video axis (interpret mode on the virtual CPU mesh) produces
    tables identical to the lax.scan mesh path."""
    import hsip_tpu.track.batch as batch_mod
    from hsip_tpu import open_collection
    from hsip_tpu.parallel import make_mesh
    from hsip_tpu.track.batch import track_collection_device

    for i in range(3):
        frames, _ = synthesize_flame_video(
            18 + 4 * i, height=32, width=256,
            flame=FlameSpec(x0=22.0 + i, v0_px=7.0 + i, ignition_frame=2,
                            seed=70 + i),
        )
        write_recording(tmp_path, f"mesh-run-{i + 1}-001", frames)

    mesh = make_mesh("video", n_devices=4)

    def run():
        with open_collection(str(tmp_path)) as coll:
            return track_collection_device(
                coll, FlameDetectorConfig(), mesh=mesh
            )

    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "interpret")
    outs_pallas = run()
    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "off")
    outs_lax = run()
    assert len(outs_pallas) == len(outs_lax) == 3
    for a, b in zip(outs_pallas, outs_lax):
        assert a.rows == b.rows and len(a.rows) > 3
        assert a.break_reason == b.break_reason
        assert a.tracker.get_velocity_history() == b.tracker.get_velocity_history()


def test_mesh_pallas_scan_lowers_for_tpu():
    """Cross-platform Mosaic lowering of the shard_map'd kernel (the mesh
    library path) — per-device pallas_call must survive partitioning."""
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from hsip_tpu.parallel import make_mesh
    from hsip_tpu.track.device_scan import DeviceScanResult
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    mesh = make_mesh("video", n_devices=4)
    V, M, W = 4, 16, 1024
    kw = dict(
        width=W,
        min_gradient_strength=np.float32(10.0),
        sobel_threshold_fraction=np.float32(0.1),
        ddt_velocity_jump=np.float32(1250.0),
    )

    def kernel_scan(fi, sob, grad, empty, hp, cal, fps, md):
        return pallas_tracking_scan_batched(
            fi, sob, grad, empty, hp,
            calibration=cal, frame_rate=fps, max_displacement_px=md, **kw,
        )

    vm, vmw, vs = P("video", None), P("video", None, None), P("video")
    f = jax.jit(shard_map(
        kernel_scan, mesh=mesh,
        in_specs=(vm, vmw, vmw, vm, vm, vs, vs, vs),
        out_specs=DeviceScanResult(
            final_position=vm, recorded=vm, is_post_ddt=vm,
            search_start=vm, search_end=vm,
            stop_step=vs, stop_reason=vs, ddt_frame=vs, clear_vc_entry=vs,
        ),
        check_vma=False,
    ))
    args = (
        jnp.zeros((V, M), jnp.int32), jnp.zeros((V, M, W), jnp.float32),
        jnp.zeros((V, M, W), jnp.float32), jnp.zeros((V, M), bool),
        jnp.ones((V, M), bool), jnp.ones(V, jnp.float32),
        jnp.full(V, 1e5, jnp.float32), jnp.full(V, 3, jnp.int32),
    )
    low = f.trace(*args).lower(lowering_platforms=("tpu",))
    assert "tpu_custom_call" in low.as_text()


@pytest.mark.parametrize("k_frames", [4, 8])
def test_pallas_scan_frames_per_step_parity(k_frames):
    """The K-frames-per-grid-step unroll (incl. inert tail padding when
    K doesn't divide M) is bit-identical to the K=1 scan."""
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    p, empty = _video_profiles(
        FlameSpec(x0=22.0, v0_px=7.0, accel_px=0.05, ignition_frame=2,
                  seed=31),
        n=38,  # not a multiple of 4 or 8 -> exercises the pad path
    )
    m = p.frame_indices.size
    args = (
        jnp.asarray(np.asarray(p.frame_indices, np.int32)[None]),
        jnp.asarray(np.asarray(p.sobel_lines)[None]),
        jnp.asarray(np.asarray(p.gradient_lines)[None]),
        jnp.asarray(np.asarray(empty)[None]),
        jnp.asarray(np.asarray(p.has_prior)[None]),
    )
    kw = dict(
        width=p.width,
        min_gradient_strength=np.float32(10.0),
        sobel_threshold_fraction=np.float32(0.1),
        ddt_velocity_jump=np.float32(1250.0),
        calibration=jnp.full(1, 0.001, jnp.float32),
        frame_rate=jnp.full(1, 1e5, jnp.float32),
        max_displacement_px=jnp.full(1, 3, jnp.int32),
        interpret=True,
    )
    base = pallas_tracking_scan_batched(*args, **kw)
    unrolled = pallas_tracking_scan_batched(
        *args, frames_per_step=k_frames, **kw
    )
    _assert_identical(base, unrolled)
    assert base.final_position.shape == (1, m)


def test_pallas_scan_frames_per_step_lowers_for_tpu():
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    V, M, W = 2, 40, 1024  # M not a multiple of 8
    args = (
        jnp.zeros((V, M), jnp.int32), jnp.zeros((V, M, W), jnp.float32),
        jnp.zeros((V, M, W), jnp.float32), jnp.zeros((V, M), bool),
        jnp.ones((V, M), bool),
    )
    kw = dict(
        width=W, min_gradient_strength=jnp.float32(10.0),
        sobel_threshold_fraction=jnp.float32(0.1),
        ddt_velocity_jump=jnp.float32(1250.0),
        calibration=jnp.ones(V, jnp.float32),
        frame_rate=jnp.full(V, 1e5, jnp.float32),
        max_displacement_px=jnp.full(V, 3, jnp.int32),
        frames_per_step=8,
    )
    f = jax.jit(lambda *a: pallas_tracking_scan_batched(*a, **kw))
    low = f.trace(*args).lower(lowering_platforms=("tpu",))
    assert "tpu_custom_call" in low.as_text()

def test_default_frames_per_step_env_knob(monkeypatch):
    """HSIP_PALLAS_SCAN_K drives the pipeline's unroll choice (clamped,
    garbage-tolerant) — the replay contract for tools/chip_autotune.py."""
    from hsip_tpu.track.pallas_scan import default_frames_per_step

    monkeypatch.delenv("HSIP_PALLAS_SCAN_K", raising=False)
    assert default_frames_per_step() == 8  # the unset prior
    monkeypatch.setenv("HSIP_PALLAS_SCAN_K", "4")
    assert default_frames_per_step() == 4
    monkeypatch.setenv("HSIP_PALLAS_SCAN_K", "0")
    assert default_frames_per_step() == 1  # lower clamp
    monkeypatch.setenv("HSIP_PALLAS_SCAN_K", "100000")
    assert default_frames_per_step() == 128  # upper clamp
    monkeypatch.setenv("HSIP_PALLAS_SCAN_K", "banana")
    assert default_frames_per_step() == 8  # garbage -> prior


def test_env_knob_reaches_single_video_scan(tmp_path, monkeypatch):
    """run_tracking_scan_device honors HSIP_PALLAS_SCAN_K: with the Pallas
    path forced on (interpret-mode capable CPU) and K=3, the rows still
    byte-match the lax.scan backend."""
    from unittest import mock

    from hsip_tpu.track.scan import run_tracking_scan_device

    p, _ = _video_profiles(
        FlameSpec(x0=25, v0_px=8, ignition_frame=2, seed=21), n=30
    )
    monkeypatch.setenv("HSIP_PALLAS_SCAN_K", "3")
    seen = {}
    orig = pallas_tracking_scan

    def spy(*args, **kw):
        seen["k"] = kw.get("frames_per_step")
        kw["interpret"] = True
        return orig(*args, **kw)

    common = dict(
        config=FlameDetectorConfig(), frame_rate=1e5,
        calibration_m_per_px=0.001,
    )
    with mock.patch("hsip_tpu.track.pallas_scan.pallas_tracking_scan", spy):
        out_pallas = run_tracking_scan_device(
            p, use_pallas_scan=True, **common
        )
    assert seen["k"] == 3
    out_lax = run_tracking_scan_device(p, use_pallas_scan=False, **common)
    assert out_pallas.rows == out_lax.rows
    assert len(out_pallas.rows) > 3


# ---- named profile methods (threshold / half_maximum / gradient) ----

_NAMED = ["threshold", "half_maximum", "gradient"]


def _run_both_named(fidx, sob, grad, intens, empty, prior, method, **kw):
    kw = dict(kw, method=method, intensity_lines=jnp.asarray(intens),
              method_fraction=np.float32(0.5))
    a = device_tracking_scan(
        fidx, sob, grad, jnp.asarray(empty), jnp.asarray(prior), **kw
    )
    b = pallas_tracking_scan(
        fidx, sob, grad, jnp.asarray(empty), jnp.asarray(prior),
        interpret=True, **kw,
    )
    _assert_identical(a, b)
    return a


@pytest.mark.parametrize("method", _NAMED)
def test_pallas_scan_named_methods_random(method):
    """Each named detector's kernel twin is bit-identical to the lax.scan
    device twin — including the gradient method's TwoSum double-float tie
    ordering — on noisy profiles at aligned and non-aligned widths."""
    rng = np.random.default_rng(29)
    for W in (256, 250):
        M = 48
        intens = np.abs(rng.normal(60, 40, (M, W))).astype(np.float32)
        pos = (20 + 3 * np.arange(M)) % (W - 30)
        for i in range(M):
            intens[i, pos[i]:pos[i] + 8] += 400.0
        zeros = np.zeros((M, W), np.float32)
        empty = rng.random(M) < 0.1
        prior = np.ones(M, bool)
        fidx = np.arange(M, dtype=np.int32)
        res = _run_both_named(
            fidx, zeros, zeros, intens, empty, prior, method, width=W, **_KW
        )
        assert int((np.asarray(res.final_position) >= 0).sum()) > 5


@pytest.mark.parametrize("method", _NAMED)
def test_pallas_scan_named_methods_flame(method):
    """Named methods over REAL pipeline profiles (select_intensity feed)."""
    p, empty = _video_profiles(
        FlameSpec(x0=25.0, v0_px=8.0, ignition_frame=2, seed=33), n=36
    )
    intens, has_prior = p.select_intensity(method, True)
    res = _run_both_named(
        np.asarray(p.frame_indices, np.int32),
        np.asarray(p.sobel_lines), np.asarray(p.gradient_lines),
        np.asarray(intens), empty, has_prior, method, width=p.width, **_KW,
    )
    assert int(np.sum(np.asarray(res.recorded))) > 3


@pytest.mark.parametrize("method", _NAMED)
def test_pallas_scan_named_lowers_for_tpu(method):
    """Mosaic TPU lowering of the named-method kernels (the gradient
    detector's pltpu.roll shifts included), aligned + padded widths."""
    from hsip_tpu.track.pallas_scan import pallas_tracking_scan_batched

    V, M = 2, 8
    for W in (512, 250):
        args = (
            jnp.zeros((V, M), jnp.int32),
            jnp.zeros((V, M, W), jnp.float32),
            jnp.zeros((V, M, W), jnp.float32),
            jnp.zeros((V, M), bool),
            jnp.ones((V, M), bool),
        )
        kw = dict(
            width=W, min_gradient_strength=jnp.float32(10.0),
            sobel_threshold_fraction=jnp.float32(0.1),
            ddt_velocity_jump=jnp.float32(1250.0),
            calibration=jnp.ones(V, jnp.float32),
            frame_rate=jnp.full(V, 1e5, jnp.float32),
            max_displacement_px=jnp.full(V, 3, jnp.int32),
            method=method,
            intensity_lines=jnp.zeros((V, M, W), jnp.float32),
            method_fraction=jnp.float32(0.5),
        )
        f = jax.jit(lambda *a: pallas_tracking_scan_batched(*a, **kw))
        low = f.trace(*args).lower(lowering_platforms=("tpu",))
        assert "tpu_custom_call" in low.as_text(), (method, W)


@pytest.mark.parametrize("method", _NAMED)
def test_pallas_library_named_methods(tmp_path, monkeypatch, method):
    """Library mode with a named detector takes the kernel path and matches
    the lax.scan library path row for row."""
    import hsip_tpu.track.batch as batch_mod
    from hsip_tpu import open_collection
    from hsip_tpu.track.batch import track_collection_device
    from hsip_tpu.track.config import VideoSourceConfig

    for i in range(2):
        frames, _ = synthesize_flame_video(
            24, height=32, width=256,
            flame=FlameSpec(x0=24.0 + i, v0_px=7.0, ignition_frame=2,
                            seed=80 + i),
        )
        write_recording(tmp_path, f"nmk-run-{i + 1}-001", frames)

    src = VideoSourceConfig(name="NMK", detection_method=method,
                            calibration=0.0008,
                            save_frame_images=False,
                            save_stacked_sequences=False)
    src.video_path = str(tmp_path)

    def run():
        with open_collection(str(tmp_path)) as coll:
            return track_collection_device(
                coll, FlameDetectorConfig(), source_config=src
            )

    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "interpret")
    outs_pallas = run()
    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "off")
    outs_lax = run()
    assert len(outs_pallas) == len(outs_lax) == 2
    for a, b in zip(outs_pallas, outs_lax):
        assert a.rows == b.rows and len(a.rows) > 3
        assert a.break_reason == b.break_reason


def test_pallas_named_method_under_mesh(tmp_path, monkeypatch):
    """Named detector + mesh: the 9-arg shard_map'd kernel (intensity rows
    ride along) matches the lax.scan mesh path row for row."""
    import hsip_tpu.track.batch as batch_mod
    from hsip_tpu import open_collection
    from hsip_tpu.parallel import make_mesh
    from hsip_tpu.track.batch import track_collection_device
    from hsip_tpu.track.config import VideoSourceConfig

    for i in range(2):
        frames, _ = synthesize_flame_video(
            20, height=32, width=256,
            flame=FlameSpec(x0=23.0 + i, v0_px=7.0, ignition_frame=2,
                            seed=90 + i),
        )
        write_recording(tmp_path, f"nmm-run-{i + 1}-001", frames)

    src = VideoSourceConfig(name="NMM", detection_method="gradient",
                            calibration=0.0008,
                            save_frame_images=False,
                            save_stacked_sequences=False)
    src.video_path = str(tmp_path)
    mesh = make_mesh("video", n_devices=2)

    def run():
        with open_collection(str(tmp_path)) as coll:
            return track_collection_device(
                coll, FlameDetectorConfig(), source_config=src, mesh=mesh
            )

    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "interpret")
    outs_pallas = run()
    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "off")
    outs_lax = run()
    assert len(outs_pallas) == len(outs_lax) == 2
    for a, b in zip(outs_pallas, outs_lax):
        assert a.rows == b.rows and len(a.rows) > 3
        assert a.break_reason == b.break_reason


def test_batched_kernel_max_videos_env_knob(monkeypatch):
    from hsip_tpu.track.pallas_scan import batched_kernel_max_videos

    monkeypatch.delenv("HSIP_PALLAS_BATCH_MAX_V", raising=False)
    assert batched_kernel_max_videos() == 8
    monkeypatch.setenv("HSIP_PALLAS_BATCH_MAX_V", "5")
    assert batched_kernel_max_videos() == 5
    monkeypatch.setenv("HSIP_PALLAS_BATCH_MAX_V", "garbage")
    assert batched_kernel_max_videos() == 8


def test_scan_routing_by_batch_size(monkeypatch):
    """The batched kernel engages up to the largest per-device batch the
    chip sweep measured (the sublane kernel's per-step cost is ~constant
    in V up to 8) — larger batches route to the vmapped backend until a
    sweep covers them. Unit-tests the routing helper directly: patching
    ``is_tpu_backend`` globally would leak into the map phase and try
    Mosaic on CPU."""
    import hsip_tpu.track.batch as batch_mod
    import hsip_tpu.utils.backend as backend_mod
    from hsip_tpu.track.batch import _use_batched_kernel

    monkeypatch.setattr(backend_mod, "is_tpu_backend", lambda: True)
    monkeypatch.delenv("HSIP_PALLAS_BATCH_MAX_V", raising=False)

    # Up to / beyond the sweep's largest measured batch (default max V=8).
    assert _use_batched_kernel(1, 1024, "threshold") is True
    assert _use_batched_kernel(8, 1024, "threshold") is True
    assert _use_batched_kernel(9, 1024, "threshold") is False
    # The env knob replays a different machine's crossover.
    monkeypatch.setenv("HSIP_PALLAS_BATCH_MAX_V", "16")
    assert _use_batched_kernel(16, 1024, "threshold") is True
    monkeypatch.setenv("HSIP_PALLAS_BATCH_MAX_V", "2")
    assert _use_batched_kernel(3, 1024, "threshold") is False
    monkeypatch.delenv("HSIP_PALLAS_BATCH_MAX_V", raising=False)

    # Platform gate: no TPU -> vmapped backend regardless of batch size.
    monkeypatch.setattr(backend_mod, "is_tpu_backend", lambda: False)
    assert _use_batched_kernel(1, 1024, "threshold") is False
    # Interpret mode forces the kernel so CPU tests exercise it at any V.
    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "interpret")
    assert _use_batched_kernel(8, 1024, "threshold") is True
    # Off mode and unsupported shapes/methods always fall back.
    monkeypatch.setattr(batch_mod, "_PALLAS_MODE", "off")
    assert _use_batched_kernel(1, 1024, "threshold") is False
