"""Real multi-process TPUVideoProcessor collectives (2 JAX CPU processes).

Spawns two coordinated `jax.distributed` processes and exercises the
process-level collectives (broadcast / gather / scatter / allreduce /
barrier / distribute_indices) across a genuine process boundary — the
moral equivalent of the reference's `mpiexec -n 2` path.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)

_WORKER = textwrap.dedent(
    """
    import os, sys, json
    import numpy as np
    import jax

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    from hsip_tpu.parallel import TPUVideoProcessor

    p = TPUVideoProcessor()
    assert p.is_parallel and p.size == 2 and p.rank == pid, (p.rank, p.size)

    # distribute_indices covers all items disjointly.
    mine = p.distribute_indices(7)
    allidx = p.allgather(mine)
    flat = sorted(i for sub in allidx for i in sub)
    assert flat == list(range(7)), flat

    # broadcast: root's object everywhere.
    obj = {"token": "root-data", "rank": p.rank} if p.is_root else None
    got = p.broadcast(obj)
    assert got["token"] == "root-data" and got["rank"] == 0, got

    # gather: root sees both payloads in rank order.
    g = p.gather(f"payload-{p.rank}")
    if p.is_root:
        assert g == ["payload-0", "payload-1"], g
    else:
        assert g is None

    # scatter: each process gets its element.
    s = p.scatter(["a", "b"] if p.is_root else None)
    assert s == ["a", "b"][p.rank], s

    # allreduce_sum over arrays.
    arr = np.full(3, float(p.rank + 1))
    total = p.allreduce_sum(arr)
    np.testing.assert_array_equal(total, np.full(3, 3.0))

    p.barrier()

    # End-to-end: two recordings distributed one-per-process through the
    # real pipeline; each process writes its own video's tables.
    from pathlib import Path
    from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording
    from hsip_tpu.pipeline import process_video_source
    from hsip_tpu.track import VideoSourceConfig

    work = Path(sys.argv[3])
    if p.is_root:
        for i in range(2):
            fr, _ = synthesize_flame_video(
                20, height=32, width=256,
                flame=FlameSpec(x0=30, v0_px=7, ignition_frame=2, seed=i),
            )
            write_recording(work / "v", f"dist-run-{i + 1}-a", fr)
    p.barrier()
    cfg = VideoSourceConfig(name="D", save_frame_images=False,
                            save_stacked_sequences=False)
    cfg.video_path = str(work / "v")
    cfg.output_dir = str(work / "out")
    outs = process_video_source(cfg, processor=p, verbose=False)
    assert len(outs) == 1, len(outs)  # one video per process
    counts = p.allgather(len(outs))
    assert counts == [1, 1], counts
    p.barrier()
    if p.is_root:
        tables = sorted((work / "out").glob("*-flame-position.txt"))
        assert len(tables) == 2, tables

    print(f"RANK{pid}_OK")
    """
)


_HIER_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import numpy as np
    import jax

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert len(jax.local_devices()) == 4, jax.local_devices()

    from pathlib import Path
    from hsip_tpu import open_video
    from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording
    from hsip_tpu.parallel import TPUVideoProcessor, make_mesh
    from hsip_tpu.track import FlameDetectorConfig
    from hsip_tpu.track.scan import track_video

    work = Path(sys.argv[3])
    p = TPUVideoProcessor()

    # The production pod layout: whole videos distribute across PROCESSES,
    # each process shards its video's frames over its LOCAL device mesh.
    if p.is_root:
        for i in range(2):
            fr, _ = synthesize_flame_video(
                24, height=32, width=256,
                flame=FlameSpec(x0=25, v0_px=6 + 2 * i, ignition_frame=2,
                                seed=40 + i),
            )
            write_recording(work / "v", f"hier-run-{i + 1}-a", fr)
    p.barrier()

    files = sorted((work / "v").glob("*.cihx"))
    mine = [files[i] for i in p.distribute_indices(len(files))]
    assert len(mine) == 1, mine

    mesh = make_mesh("frame", devices=jax.local_devices())
    cfg = FlameDetectorConfig()
    rows_sharded = []
    for f in mine:
        with open_video(str(f)) as video:
            out = track_video(video, cfg, calibration_m_per_px=0.001,
                              mesh=mesh)
            single = track_video(video, cfg, calibration_m_per_px=0.001)
        assert [r[:4] for r in out.rows] == [r[:4] for r in single.rows]
        rows_sharded.append((f.name, len(out.rows)))

    gathered = p.gather(rows_sharded)
    if p.is_root:
        flat = sorted(r for sub in gathered for r in sub)
        assert len(flat) == 2 and all(n > 5 for _, n in flat), flat
    p.barrier()
    print(f"RANK{pid}_OK")
    """
)


def test_two_process_collectives(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    # The workers must import hsip_tpu even when the package isn't
    # pip-installed (fresh sandbox): put the repo root on PYTHONPATH.
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO_ROOT, env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=150)
            outs.append((proc.returncode, out, err))
    finally:
        for proc in procs:  # never leak hung coordinator/worker processes
            if proc.poll() is None:
                proc.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {i} failed:\n{out}\n{err[-2000:]}"
        assert f"RANK{i}_OK" in out


def test_video_per_process_frames_per_device(tmp_path):
    """Hierarchical layout: videos across 2 processes, each video's frames
    sharded over that process's 4 local (virtual) devices; sharded rows
    must equal the single-device rows."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "hier_worker.py"
    script.write_text(_HIER_WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO_ROOT, env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=150)
            outs.append((proc.returncode, out, err))
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {i} failed:\n{out}\n{err[-2000:]}"
        assert f"RANK{i}_OK" in out


_CLI_LIB_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")

    from pathlib import Path
    from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording

    work = Path(sys.argv[3])
    if pid == 0:
        # Rank 0 writes the recordings BEFORE distributed init (no barrier
        # available yet); rank 1 spins on the marker file.
        for i in range(2):
            fr, _ = synthesize_flame_video(
                20, height=32, width=256,
                flame=FlameSpec(x0=28, v0_px=7, ignition_frame=2, seed=60 + i),
            )
            write_recording(work / "v", f"cli-dist-run-{i + 1}-a", fr)
        (work / "v" / ".ready").touch()
    else:
        import time
        while not (work / "v" / ".ready").exists():
            time.sleep(0.05)

    # The production combo through the REAL CLI: multi-process distribution
    # of recordings + per-process video-axis mesh over 4 local devices.
    # Distributed init happens inside main() (this ordering — distributed
    # BEFORE mesh construction — is what the test locks in).
    from hsip_tpu.cli import main

    rc = main([
        "--video-path", str(work / "v"), "--output-dir", str(work / "out"),
        "--calibration", "0.001", "--library", "--mesh",
        "--distributed", "--coordinator", coord,
        "--num-processes", "2", "--process-id", str(pid),
        "--quiet",
    ])
    assert rc == 0, rc
    if pid == 0:
        tables = sorted((work / "out").glob("*-flame-position.txt"))
        assert len(tables) == 2, tables
    print(f"RANK{pid}_OK")
    """
)


def test_cli_distributed_library_mesh(tmp_path):
    """hsip --distributed --library --mesh across 2 processes x 4 devices:
    the combo must initialize jax.distributed before building the mesh."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "cli_lib_worker.py"
    script.write_text(_CLI_LIB_WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO_ROOT, env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=150)
            outs.append((proc.returncode, out, err))
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {i} failed:\n{out}\n{err[-2000:]}"
        assert f"RANK{i}_OK" in out


_WATCH_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")

    from pathlib import Path
    from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording

    work = Path(sys.argv[3])
    out_dir = work / "out"
    if pid == 0:
        fr, _ = synthesize_flame_video(
            20, height=32, width=256,
            flame=FlameSpec(x0=28, v0_px=7, ignition_frame=2, seed=90),
        )
        write_recording(work / "v", "watch-run-1-a", fr)
        (work / "v" / ".ready").touch()
    else:
        import time
        while not (work / "v" / ".ready").exists():
            time.sleep(0.05)

    # Lockstep harness: the per-pass ledger barriers keep both ranks on the
    # same pass, so the fake sleep can advance a deterministic scenario --
    # drop a late recording after pass 2, then request shutdown (via the
    # watch sentinel) once its table lands.
    import time as time_mod
    passes = {"n": 0}

    def fake_sleep(_secs):
        passes["n"] += 1
        if passes["n"] > 12:
            raise KeyboardInterrupt  # safety net: scenario should stop us
        if pid == 0:
            if passes["n"] == 2:
                fr, _ = synthesize_flame_video(
                    20, height=32, width=256,
                    flame=FlameSpec(x0=28, v0_px=7, ignition_frame=2,
                                    seed=91),
                )
                write_recording(work / "v", "watch-run-2-late", fr)
            if (out_dir / "watch-run-2-late-flame-position.txt").exists():
                (out_dir / ".hsip-watch-stop").touch()

    time_mod.sleep = fake_sleep

    from hsip_tpu.cli import main

    rc = main([
        "--video-path", str(work / "v"), "--output-dir", str(out_dir),
        "--calibration", "0.001", "--no-images", "--no-sequences",
        "--watch", "0.2",
        "--distributed", "--coordinator", coord,
        "--num-processes", "2", "--process-id", str(pid),
    ])
    assert rc == 0, rc
    print(f"RANK{pid}_OK")
    """
)


def test_cli_watch_distributed(tmp_path):
    """--watch under --distributed: a late-arriving recording is processed
    by exactly one rank (cross-rank ledger dedup), initial work never
    reprocesses despite index redistribution, and the shutdown sentinel
    stops BOTH ranks cleanly."""
    import json

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "watch_worker.py"
    script.write_text(_WATCH_WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO_ROOT, env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=150)
            outs.append((proc.returncode, out, err))
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {i} failed:\n{out}\n{err[-2000:]}"
        assert f"RANK{i}_OK" in out

    out_dir = tmp_path / "out"
    assert (out_dir / "watch-run-1-a-flame-position.txt").exists()
    assert (out_dir / "watch-run-2-late-flame-position.txt").exists()
    # Each recording completed in exactly ONE rank's ledger.
    owners = {}
    for ledger in out_dir.glob("hsip-checkpoint*.json"):
        for name in json.loads(ledger.read_text()).get("done", {}):
            owners.setdefault(name, []).append(ledger.name)
    assert sorted(owners) == [
        "watch-run-1-a.cihx", "watch-run-2-late.cihx"
    ], owners
    assert all(len(v) == 1 for v in owners.values()), owners
    # The initial recording was verbosely processed exactly once (pass 1);
    # later passes are quiet by design, so the late file's single
    # processing is evidenced by the ledger ownership above.
    all_out = outs[0][1] + outs[1][1]
    assert all_out.count("Loading: watch-run-1-a.cihx") == 1, all_out


_FOUR_RANK_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import numpy as np
    import jax

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=4, process_id=pid
    )

    from pathlib import Path
    from hsip_tpu import open_video
    from hsip_tpu.io import FlameSpec, synthesize_flame_video, write_recording
    from hsip_tpu.parallel import TPUVideoProcessor, make_mesh
    from hsip_tpu.track import FlameDetectorConfig
    from hsip_tpu.track.scan import track_video

    work = Path(sys.argv[3])
    p = TPUVideoProcessor()
    assert p.size == 4 and p.rank == pid, (p.rank, p.size)

    # Contiguous distribution with an odd remainder (6 = 4*1 + 2): the
    # first two ranks take 2 videos, the last two take 1 — block
    # arithmetic only shows its corners at >= 3 ranks.
    mine_c = p.distribute_indices(6, distribution="contiguous")
    expected_blocks = {0: [0, 1], 1: [2, 3], 2: [4], 3: [5]}
    assert mine_c == expected_blocks[pid], mine_c
    allc = p.allgather(mine_c)
    flat = [i for sub in allc for i in sub]
    assert flat == list(range(6)), flat  # disjoint AND ordered blocks

    # Round-robin coverage stays disjoint/complete at 4 ranks too.
    allr = p.allgather(p.distribute_indices(6))
    assert sorted(i for sub in allr for i in sub) == list(range(6))

    # Hierarchical layout: videos across the 4 PROCESSES (contiguous),
    # frames of each video sharded over the process's 2 local devices.
    if p.is_root:
        for i in range(6):
            fr, _ = synthesize_flame_video(
                20, height=32, width=256,
                flame=FlameSpec(x0=24, v0_px=5 + i, ignition_frame=2,
                                seed=70 + i),
            )
            write_recording(work / "v", f"quad-run-{i + 1}-a", fr)
    p.barrier()

    files = sorted((work / "v").glob("*.cihx"))
    assert len(files) == 6, files
    mesh = make_mesh("frame", devices=jax.local_devices())
    cfg = FlameDetectorConfig()
    results = []
    for i in mine_c:
        with open_video(str(files[i])) as video:
            out = track_video(video, cfg, calibration_m_per_px=0.001,
                              mesh=mesh)
            single = track_video(video, cfg, calibration_m_per_px=0.001)
        assert [r[:4] for r in out.rows] == [r[:4] for r in single.rows]
        results.append((files[i].name, len(out.rows)))

    gathered = p.gather(results)
    if p.is_root:
        names = sorted(n for sub in gathered for n, _ in sub)
        assert names == sorted(f.name for f in files), names
        assert all(c > 3 for sub in gathered for _, c in sub), gathered
    p.barrier()
    print(f"RANK{pid}_OK")
    """
)


def test_four_process_hierarchical_layout(tmp_path):
    """4 ranks x 2 local devices: contiguous remainder arithmetic, disjoint
    coverage, and the video-per-process x frame-per-device layout matching
    serial rows — the corners a 2-rank test cannot reach."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "quad_worker.py"
    script.write_text(_FOUR_RANK_WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO_ROOT, env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(4)
    ]
    outs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=240)
            outs.append((proc.returncode, out, err))
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {i} failed:\n{out}\n{err[-2000:]}"
        assert f"RANK{i}_OK" in out
