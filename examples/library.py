"""Library-API demo: whole-collection tracking with the vmapped device scan.

Where `examples/demo.py` drives the CLI (the reference-style batch run),
this shows the pure Python API a pipeline embeds:

* synthesize a small mixed-geometry library (two camera shapes),
* track EVERY recording in one vmapped on-device scan per shape group
  (`track_collection_device` — profiles never leave the chip),
* print per-video results and the velocity history of one run,
* optionally shard the video axis over a device mesh (pass --mesh with
  more than one visible device, e.g. JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8).

    python examples/library.py [workdir] [--mesh] [--platform NAME]

``--platform cpu`` forces a JAX platform before backend initialization —
the escape hatch when the environment pins an unreachable accelerator.
"""

import sys
from pathlib import Path


def _parse_argv(argv):
    """Split argv into (platform, use_mesh, positionals).

    Accepts both ``--platform NAME`` and ``--platform=NAME``; a missing
    value is a usage error (exit 2), not a silent fall-through onto the
    very backend the flag exists to escape.
    """
    platform, use_mesh, positionals = None, False, []
    it = iter(argv)
    for arg in it:
        if arg == "--platform":
            platform = next(it, None)
            if platform is None or platform.startswith("-"):
                print("--platform requires a value (e.g. --platform cpu)",
                      file=sys.stderr)
                raise SystemExit(2)
        elif arg.startswith("--platform="):
            platform = arg.split("=", 1)[1]
        elif arg == "--mesh":
            use_mesh = True
        else:
            positionals.append(arg)
    return platform, use_mesh, positionals


_PLATFORM, _USE_MESH, _POSITIONALS = _parse_argv(sys.argv[1:])

if _PLATFORM:
    import jax

    # Must land before anything imports a Pallas-using module (backend
    # init freezes the platform list).
    jax.config.update("jax_platforms", _PLATFORM)

try:
    from hsip_tpu import open_collection
except ModuleNotFoundError:  # running from a checkout without pip install
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from hsip_tpu import open_collection

from hsip_tpu.io import CihxSpec, FlameSpec, synthesize_flame_video, write_recording
from hsip_tpu.track import FileCalibration, FlameDetectorConfig, VideoSourceConfig


def build_library(root: Path) -> None:
    geometries = [(64, 768), (64, 768), (48, 384)]  # Nova, Nova, Mini-style
    for i, (h, w) in enumerate(geometries):
        flame = FlameSpec(x0=25, v0_px=6 + 3 * i, accel_px=0.2,
                          ignition_frame=2, seed=60 + i)
        frames, _ = synthesize_flame_video(60, height=h, width=w, flame=flame)
        write_recording(
            root / "videos", f"lib-run-{i + 1}-001", frames,
            spec=CihxSpec(width=w, height=h, total_frames=60,
                          record_rate=100_000, bit_depth=12),
        )


def main() -> int:
    from hsip_tpu.track.batch import track_collection_device

    root = (Path(_POSITIONALS[0]) if _POSITIONALS
            else Path("./hsip-library-demo"))
    use_mesh = _USE_MESH
    build_library(root)

    src = VideoSourceConfig(name="Library", save_frame_images=False,
                            save_stacked_sequences=False)
    src.video_path = str(root / "videos")
    src.file_calibrations = [
        FileCalibration(calibration=0.000833333, position_offset=1.0159,
                        files=["run-1-", "run-2-"]),
        FileCalibration(calibration=0.000869565, position_offset=0.050237,
                        files=["run-3-"]),
    ]

    mesh = None
    if use_mesh:
        import jax

        from hsip_tpu.parallel import make_mesh

        # Local devices: in a multi-process run each process tracks its own
        # videos, so the mesh must span only its own chips (same rule the
        # CLI's --mesh follows).
        devices = jax.local_devices()
        mesh = make_mesh("video", devices=devices)
        print(f"Sharding the video axis over {len(devices)} devices")

    with open_collection(src.video_path) as coll:
        print(coll.summary())
        outputs = track_collection_device(
            coll, FlameDetectorConfig(), source_config=src, mesh=mesh
        )

        # Report inside the with-block: the videos are still open here, so
        # adding frame access (e.g. video[0] thumbnails) stays valid.
        for video, out in zip(coll, outputs):
            last = out.rows[-1] if out.rows else None
            print(
                f"{video.filepath.name}: {len(out.rows)} rows, "
                f"break={out.break_reason}, ddt={out.tracker.ddt_frame}, "
                f"last={last[:4] if last else None}"
            )

    # Velocity history (exact float64 columns) of the first recording.
    print("\nfirst recording velocity history (frame, v1, v2, vc):")
    for entry in outputs[0].tracker.get_velocity_history()[:5]:
        print("  ", entry)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
