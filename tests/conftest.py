"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual XLA devices so sharding/shard_map paths
execute without TPU hardware — the idiomatic replacement for the reference's
"serial fallback as test harness" (src/photron/parallel.py:47-54).
Must be set before jax is imported anywhere.
"""

import os

# Hard override: the environment wires JAX to the TPU plugin (and an import
# hook rewrites JAX_PLATFORMS), so env vars alone don't stick. Update the jax
# config AFTER import but before any backend initialization — tests must run
# on virtual CPU devices (fast, deterministic, no chip contention).
os.environ["JAX_PLATFORMS"] = "cpu"
import re as _re

flags = os.environ.get("XLA_FLAGS", "")
# Force EXACTLY 8 virtual devices, replacing any preset count.
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
flags += " --xla_force_host_platform_device_count=8"
# Cap XLA:CPU codegen at AVX2: the sandbox VM masks CPUID features that
# LLVM's native detection still reports (amx/avx512fp16 & co), and the
# resulting executables can hit SIGILL/segfaults — one killed a 500-trial
# reference soak mid-run. The cap also silences the per-compile
# cpu_aot_loader machine-feature-mismatch errors.
if "--xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hsip_tpu.io import (  # noqa: E402
    CihxSpec,
    FlameSpec,
    synthesize_flame_video,
    write_recording,
)


@pytest.fixture(scope="session")
def flame_recording(tmp_path_factory):
    """A small synthetic flame recording on disk (cihx + mraw) with its
    analytic trajectory."""
    tmp = tmp_path_factory.mktemp("videos")
    flame = FlameSpec(x0=40.0, v0_px=7.0, ignition_frame=2, seed=123)
    frames, positions = synthesize_flame_video(
        n_frames=40, height=64, width=384, flame=flame
    )
    spec = CihxSpec(
        width=384,
        height=64,
        total_frames=40,
        record_rate=80_000,
        bit_depth=12,
        start_frame=-8,
        skip_frame=1,
    )
    meta_path = write_recording(tmp, "synthetic-run-1-a", frames, spec=spec)
    return {
        "path": meta_path,
        "frames": frames,
        "positions": positions,
        "spec": spec,
        "flame": flame,
        "dir": tmp,
    }
