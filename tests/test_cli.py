"""CLI tests: arg parsing, TOML/JSON config loading, end-to-end run."""

import json
from pathlib import Path

import pytest

from hsip_tpu.cli import build_parser, load_config, main
from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording


TOML = """
[[source]]
name = "Nova"
enabled = true
video_path = "{video_path}"
output_dir = "{output_dir}"
calibration = 0.001
use_absolute_time = true
skip_frames = [3]

[[source.file_calibration]]
calibration = 0.000833333
position_offset = 1.0159
files = ["run-1-"]

[detector]
gaussian_sigma = 1.5
frame_diff_threshold = 5.0
"""


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_videos")
    frames, _ = synthesize_flame_video(
        25, height=48, width=256,
        flame=FlameSpec(x0=25.0, v0_px=6.0, ignition_frame=2, seed=13),
    )
    write_recording(tmp, "cli-run-1-a", frames)
    return tmp


def test_load_toml_config(tmp_path, videos):
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(
        TOML.format(video_path=str(videos), output_dir=str(tmp_path / "out"))
    )
    sources, det = load_config(cfg_path)
    assert len(sources) == 1
    src = sources[0]
    assert src.name == "Nova"
    assert src.skip_frames == [3]
    assert src.file_calibrations[0].position_offset == 1.0159
    assert src.get_calibration_for_file("cli-run-1-a.cihx") == (0.000833333, 1.0159)
    assert det.gaussian_sigma == 1.5


def test_load_json_config(tmp_path, videos):
    cfg = {
        "source": [{"name": "J", "video_path": str(videos), "output_dir": str(tmp_path / "o")}],
        "detector": {"exit_margin_px": 20},
    }
    p = tmp_path / "run.json"
    p.write_text(json.dumps(cfg))
    sources, det = load_config(p)
    assert sources[0].name == "J"
    assert det.exit_margin_px == 20


def test_config_rejects_unknown_detector_keys(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"detector": {"bogus_knob": 1}}))
    with pytest.raises(ValueError, match="bogus_knob"):
        load_config(p)


def test_cli_end_to_end(videos, tmp_path, capsys):
    out_dir = tmp_path / "cli_out"
    rc = main([
        "--video-path", str(videos),
        "--output-dir", str(out_dir),
        "--name", "CLI",
        "--calibration", "0.001",
        "--no-images", "--no-sequences", "--quiet",
    ])
    assert rc == 0
    table = out_dir / "cli-run-1-a-flame-position.txt"
    assert table.exists()
    rows = [l for l in table.read_text().splitlines() if l and not l.startswith("#")]
    assert len(rows) > 10


def test_cli_no_sources_errors(capsys):
    assert main([]) == 2
    assert "No sources" in capsys.readouterr().err


def test_cli_parser_defaults():
    args = build_parser().parse_args(["--video-path", "x"])
    # None = "not explicitly given": resolves to 'tpu' for per-file runs and
    # lets --library reject an explicit conflicting backend.
    assert args.backend is None
    assert not args.no_images
    assert args.detection_method is None


def test_cli_detection_method_flag(videos, tmp_path, capsys):
    rc = main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "o"),
        "--calibration", "0.001", "--no-images", "--no-sequences",
        "--detection-method", "threshold", "--quiet",
    ])
    assert rc == 0
    tables = list((tmp_path / "o").glob("*-flame-position.txt"))
    assert tables and any(
        l for l in tables[0].read_text().splitlines()
        if l and not l.startswith("#")
    )


def test_cli_version(capsys):
    import hsip_tpu

    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert hsip_tpu.__version__ in capsys.readouterr().out


def test_config_rejects_unknown_source_keys(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"source": [{"name": "X", "skip_frame": [3]}]}))
    with pytest.raises(ValueError, match="skip_frame"):
        load_config(p)


def test_cli_flags_override_config_sources(videos, tmp_path, monkeypatch):
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(
        TOML.format(video_path=str(videos), output_dir=str(tmp_path / "o"))
    )
    captured = []

    def fake_process(cfg, *a, **k):
        captured.append(cfg)
        return []

    import hsip_tpu.pipeline as pipeline_mod

    monkeypatch.setattr(pipeline_mod, "process_video_source", fake_process)
    rc = main(["--config", str(cfg_path), "--relative-time",
               "--trigger-frame", "7", "--calibration", "0.002",
               "--position-offset", "0.5", "--no-images", "--quiet"])
    assert rc == 0
    assert len(captured) == 1
    cfg = captured[0]
    # Explicit flags must override the config-file source.
    assert cfg.trigger_frame == 7
    assert cfg.use_absolute_time is False
    assert cfg.calibration == 0.002
    assert cfg.position_offset == 0.5
    assert cfg.save_frame_images is False


def test_cli_library_mode(videos, tmp_path, capsys):
    from hsip_tpu.cli import main

    out = tmp_path / "lib-out"
    rc = main([
        "--video-path", str(videos), "--output-dir", str(out),
        "--calibration", "0.000833333", "--library", "--quiet",
    ])
    assert rc == 0
    tables = sorted(out.glob("*-flame-position*.txt"))
    assert tables, "library mode wrote no tables"
    # Identical to the default per-file run.
    out2 = tmp_path / "file-out"
    assert main([
        "--video-path", str(videos), "--output-dir", str(out2),
        "--calibration", "0.000833333", "--backend", "device", "--quiet",
        "--no-images", "--no-sequences",
    ]) == 0
    for t in tables:
        assert t.read_bytes() == (out2 / t.name).read_bytes()
    capsys.readouterr()


def test_cli_mesh_requires_library(videos, tmp_path, capsys):
    from hsip_tpu.cli import main

    rc = main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "o"),
        "--mesh", "--quiet",
    ])
    assert rc == 2
    assert "--mesh requires --library" in capsys.readouterr().err


def test_cli_library_mesh_matches_unsharded(videos, tmp_path, capsys):
    """--library --mesh N on the 8-virtual-device CPU mesh == plain --library."""
    from hsip_tpu.cli import main

    out_m = tmp_path / "mesh-out"
    rc = main([
        "--video-path", str(videos), "--output-dir", str(out_m),
        "--calibration", "0.000833333", "--library", "--mesh", "4",
    ])
    assert rc == 0
    assert "Sharding video axis over 4 devices" in capsys.readouterr().out
    out_p = tmp_path / "plain-out"
    assert main([
        "--video-path", str(videos), "--output-dir", str(out_p),
        "--calibration", "0.000833333", "--library", "--quiet",
    ]) == 0
    tables = sorted(out_m.glob("*-flame-position*.txt"))
    assert tables
    for t in tables:
        assert t.read_bytes() == (out_p / t.name).read_bytes()


def test_cli_mesh_rejects_negative(videos, tmp_path, capsys):
    from hsip_tpu.cli import main

    rc = main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "o"),
        "--library", "--mesh", "-1", "--quiet",
    ])
    assert rc == 2
    assert "must be positive" in capsys.readouterr().err


def test_cli_library_rejects_backend(videos, tmp_path, capsys):
    from hsip_tpu.cli import main

    rc = main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "o"),
        "--library", "--backend", "exact", "--quiet",
    ])
    assert rc == 2
    assert "incompatible with --library" in capsys.readouterr().err


def test_cli_info_dumps_metadata(videos, tmp_path, capsys):
    import shutil

    from hsip_tpu.cli import main

    # Isolated copy: the corrupt file must not leak into the shared fixture.
    vdir = tmp_path / "videos"
    shutil.copytree(videos, vdir)
    (vdir / "garbage.cihx").write_bytes(b"\x01nope" * 40)
    out_dir = tmp_path / "explicit-out"
    rc = main(["--video-path", str(vdir), "--output-dir", str(out_dir),
               "--info"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "cli-run-1-a.cihx: 25 frames 48x256" in out
    assert "100000 fps" in out
    assert "irig=" in out and "irig=None" not in out  # real CIHX irig state
    assert "UNREADABLE" in out  # the corrupt file is reported, not fatal
    # No processing side effects: --info never writes outputs.
    assert not out_dir.exists()


def test_cli_manual_launch_flags_require_distributed(videos, tmp_path, capsys):
    from hsip_tpu.cli import main

    rc = main(["--video-path", str(videos), "--output-dir",
               str(tmp_path / "o"), "--coordinator", "localhost:1",
               "--quiet"])
    assert rc == 2
    assert "require --distributed" in capsys.readouterr().err


def test_cli_info_empty_dir(tmp_path, capsys):
    from hsip_tpu.cli import main

    rc = main(["--video-path", str(tmp_path), "--info"])
    assert rc == 1
    assert "No recordings found" in capsys.readouterr().err


def test_config_rejects_base_path_key(tmp_path):
    """base_path is derived from the config file's location; a user-supplied
    value would be silently ignored, so it must be rejected."""
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"source": [{"name": "X", "base_path": "/data"}]}))
    with pytest.raises(ValueError, match="base_path"):
        load_config(p)


def test_cli_watch_picks_up_new_recordings(videos, tmp_path, monkeypatch,
                                           capsys):
    """Serve mode: the first pass processes existing recordings, a later
    poll picks up a recording that arrives afterwards, and completed work
    is never reprocessed."""
    import shutil

    from hsip_tpu.cli import main

    vdir = tmp_path / "vids"
    shutil.copytree(videos, vdir)
    out = tmp_path / "out"

    # Deterministic harness: instead of sleeping, drop a new recording after
    # pass 2 and stop after pass 3 via the sleep hook.
    passes = {"n": 0}

    def fake_sleep(_secs):
        passes["n"] += 1
        if passes["n"] == 2:
            frames, _ = synthesize_flame_video(
                20, height=48, width=256,
                flame=FlameSpec(x0=25.0, v0_px=6.0, ignition_frame=2, seed=77),
            )
            write_recording(vdir, "cli-run-1-late", frames)
        if passes["n"] >= 4:
            raise KeyboardInterrupt

    import time as time_mod

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    rc = main([
        "--video-path", str(vdir), "--output-dir", str(out),
        "--calibration", "0.001", "--no-images", "--no-sequences",
        "--watch", "0.2",
    ])
    assert rc == 0
    outtext = capsys.readouterr().out
    assert "Watching for new recordings" in outtext
    assert "Watch stopped" in outtext
    assert (out / "cli-run-1-a-flame-position.txt").exists()
    assert (out / "cli-run-1-late-flame-position.txt").exists()
    # The original recording was processed exactly once (one load banner).
    assert outtext.count("Loading: cli-run-1-a.cihx") == 1


def test_cli_watch_requires_output_dir(tmp_path, capsys):
    from hsip_tpu.cli import main

    cfg = tmp_path / "w.json"
    cfg.write_text(json.dumps(
        {"source": [{"name": "W", "video_path": str(tmp_path)}]}
    ))
    rc = main(["--config", str(cfg), "--watch"])
    assert rc == 2
    assert "requires an output dir" in capsys.readouterr().err


def test_cli_watch_library_mode(videos, tmp_path, monkeypatch, capsys):
    """--watch composes with --library (vmapped passes over the ledger)."""
    import shutil

    from hsip_tpu.cli import main

    vdir = tmp_path / "vids"
    shutil.copytree(videos, vdir)
    out = tmp_path / "out"
    passes = {"n": 0}

    def fake_sleep(_secs):
        passes["n"] += 1
        if passes["n"] >= 2:
            raise KeyboardInterrupt

    import time as time_mod

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    rc = main([
        "--video-path", str(vdir), "--output-dir", str(out),
        "--calibration", "0.001", "--library", "--watch", "1",
    ])
    assert rc == 0
    assert (out / "cli-run-1-a-flame-position.txt").exists()
    capsys.readouterr()


def test_cli_watch_corrupt_file_failure_backoff(videos, tmp_path, monkeypatch,
                                                capsys):
    """Serve mode must not re-fail a corrupt recording every poll: an
    unchanged failed file warns once, and is retried when it changes."""
    import shutil

    from hsip_tpu.cli import main

    vdir = tmp_path / "vids"
    shutil.copytree(videos, vdir)
    bad = vdir / "zz-corrupt.cihx"
    bad.write_bytes(b"\x00" * 64)
    out = tmp_path / "out"
    passes = {"n": 0}

    def fake_sleep(_secs):
        passes["n"] += 1
        if passes["n"] == 3:
            # A changed file is a new candidate: mtime/size move.
            bad.write_bytes(b"\x00" * 128)
        if passes["n"] >= 5:
            raise KeyboardInterrupt

    import time as time_mod

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    rc = main([
        "--video-path", str(vdir), "--output-dir", str(out),
        "--calibration", "0.001", "--no-images", "--no-sequences",
        "--watch", "0.2",
    ])
    assert rc == 0
    outtext = capsys.readouterr().out
    # One warning for the original corrupt bytes, one for the rewrite --
    # NOT one per poll pass.
    assert outtext.count("Could not process") == 2


def test_cli_watch_stop_sentinel(videos, tmp_path, monkeypatch, capsys):
    """Creating .hsip-watch-stop in the output dir stops the watch loop
    cleanly at the next poll (the cross-rank shutdown mechanism)."""
    import shutil

    from hsip_tpu.cli import main

    vdir = tmp_path / "vids"
    shutil.copytree(videos, vdir)
    out = tmp_path / "out"
    passes = {"n": 0}

    def fake_sleep(_secs):
        passes["n"] += 1
        (out / ".hsip-watch-stop").touch()
        if passes["n"] >= 3:  # safety: the sentinel should stop us first
            raise KeyboardInterrupt

    import time as time_mod

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    rc = main([
        "--video-path", str(vdir), "--output-dir", str(out),
        "--calibration", "0.001", "--no-images", "--no-sequences",
        "--watch", "0.2",
    ])
    assert rc == 0
    outtext = capsys.readouterr().out
    assert "Watch stopped (shutdown requested)" in outtext
    assert passes["n"] == 1  # stopped at the first post-sentinel poll


def test_cli_mesh_too_many_devices(videos, tmp_path, capsys):
    """--mesh N beyond the local device count exits 2 with a message, not a
    traceback (devices are 8 virtual CPUs under the test config)."""
    from hsip_tpu.cli import main

    rc = main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "o"),
        "--library", "--mesh", "64",
    ])
    assert rc == 2
    assert "local device(s) available" in capsys.readouterr().err


def test_cli_profile_dir_writes_trace(videos, tmp_path):
    """--profile-dir captures a jax.profiler trace around the run."""
    from hsip_tpu.cli import main

    prof = tmp_path / "trace"
    rc = main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "out"),
        "--calibration", "0.001", "--no-images", "--no-sequences",
        "--quiet", "--profile-dir", str(prof),
    ])
    assert rc == 0
    assert prof.exists() and any(prof.rglob("*"))


def test_cli_watch_library_corrupt_backoff(videos, tmp_path, monkeypatch,
                                           capsys):
    """The library driver's failure cache also backs off unchanged corrupt
    recordings across watch passes."""
    import shutil

    from hsip_tpu.cli import main

    vdir = tmp_path / "vids"
    shutil.copytree(videos, vdir)
    (vdir / "zz-bad.cihx").write_bytes(b"\x01" * 50)
    out = tmp_path / "out"
    passes = {"n": 0}

    def fake_sleep(_secs):
        passes["n"] += 1
        if passes["n"] >= 4:
            raise KeyboardInterrupt

    import time as time_mod

    monkeypatch.setattr(time_mod, "sleep", fake_sleep)
    rc = main([
        "--video-path", str(vdir), "--output-dir", str(out),
        "--calibration", "0.001", "--library", "--watch", "0.2",
    ])
    assert rc == 0
    outtext = capsys.readouterr().out
    assert outtext.count("Could not load") == 1  # once, not per poll
    assert (out / "cli-run-1-a-flame-position.txt").exists()


def test_cli_auto_backend_prefers_device_without_figures(videos, tmp_path,
                                                         monkeypatch):
    """With figures off and no explicit --backend, the CLI takes the fully
    on-device scan; with figures on it keeps the host scan (viz hooks)."""
    import hsip_tpu.cli as cli_mod
    import hsip_tpu.pipeline as pipeline_mod

    seen = []
    real = pipeline_mod.process_video_source

    def spy(cfg, det, backend="tpu", **kw):
        seen.append(backend)
        return real(cfg, det, backend=backend, **kw)

    monkeypatch.setattr(pipeline_mod, "process_video_source", spy)
    rc = cli_mod.main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "a"),
        "--calibration", "0.001", "--no-images", "--no-sequences", "--quiet",
    ])
    assert rc == 0 and seen == ["device"]
    seen.clear()
    rc = cli_mod.main([
        "--video-path", str(videos), "--output-dir", str(tmp_path / "b"),
        "--calibration", "0.001", "--no-sequences", "--quiet",
    ])
    assert rc == 0 and seen == ["tpu"]


def test_cli_platform_flag_overrides_environment(videos):
    """--platform must beat a platform pinned in the environment: with
    JAX_PLATFORMS pointing at a backend that cannot initialize, the forced
    'cpu' run still comes up (the rescue path for an unreachable chip)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="nonexistent_backend")
    proc = subprocess.run(
        [sys.executable, "-m", "hsip_tpu.cli", "--video-path", str(videos),
         "--info", "--platform", "cpu"],
        capture_output=True, text=True, timeout=240, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert "cli-run-1-a.cihx" in proc.stdout


def test_cli_platform_unknown_name_exits_cleanly(videos, tmp_path):
    """A bad platform name is one clean exit-2 diagnostic, not a swallowed
    per-recording failure warning on every file."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "hsip_tpu.cli", "--video-path", str(videos),
         "--output-dir", str(tmp_path / "o"), "--no-images", "--quiet",
         "--platform", "definitely_not_a_backend"],
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 2
    assert "definitely_not_a_backend" in proc.stderr
    assert "Could not process" not in proc.stdout
