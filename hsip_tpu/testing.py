"""Harness for running the REFERENCE implementation side by side.

The differential tiers (``HSIP_REFERENCE=1`` tests) and the reference
benchmark (``tools/bench_reference.py``) all need the same dance: load the
read-only reference checkout's ``scripts/process_videos.py`` at runtime —
no code copied — after satisfying its one missing dependency with a tiny
``pyMRAW`` shim backed by this framework's MRAW reader. That shim carries
exactness-critical logic (the 'Color Bit' vs 'EffectiveBit Depth' decoder
selection), so it must live in ONE place; this module is that place.

Dev-only: requires the reference checkout (``HSIP_REFERENCE_ROOT``,
default ``/root/reference``) plus scipy/matplotlib, none of which the
runtime pipeline needs.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from pathlib import Path

__all__ = [
    "REFERENCE_ROOT",
    "install_pymraw_shim",
    "load_reference_module",
    "reference_script",
]

REFERENCE_ROOT = Path(os.environ.get("HSIP_REFERENCE_ROOT", "/root/reference"))


def reference_script() -> Path:
    """Path to the reference's orchestration script (its whole pipeline)."""
    return REFERENCE_ROOT / "scripts" / "process_videos.py"


def install_pymraw_shim() -> None:
    """Provide ``pyMRAW.load_video`` from this framework's MRAW reader.

    The reference's only hard dependency we don't ship is pyMRAW
    (reference ``src/photron/video.py:20-26``); its contract there is
    ``load_video(path) -> (indexable frames, info dict)``. Frames are
    decoded eagerly with our native codec — a deliberate bias in the
    reference's favor when benchmarking (replaces pyMRAW's lazy per-frame
    memmap unpacking with a faster decode).
    """
    if "pyMRAW" in sys.modules:
        return
    shim = types.ModuleType("pyMRAW")

    def load_video(path):
        from hsip_tpu.io.cihx import read_header
        from hsip_tpu.io.mraw import MRAWReader, find_mraw_payload

        info = read_header(path)
        # Exactness trap (see CLAUDE.md): 'Color Bit' — not
        # 'EffectiveBit Depth' — selects the container decoder.
        storage_bits = int(
            info.get("Color Bit") or info.get("EffectiveBit Depth", 16)
        )
        reader = MRAWReader(
            find_mraw_payload(path),
            int(info["Image Width"]),
            int(info["Image Height"]),
            storage_bits,
            total_frames=(
                int(info["Total Frame"]) if "Total Frame" in info else None
            ),
        )
        try:
            images = reader.read_frames(slice(0, len(reader)))
        finally:
            reader.close()
        return images, info

    shim.load_video = load_video
    sys.modules["pyMRAW"] = shim


def load_reference_module(
    module_name: str = "ref_process_videos", *, neutralize_figures: bool = True
):
    """Import the reference pipeline from its own checkout and return it.

    Forces the Agg matplotlib backend, installs the pyMRAW shim, and puts
    the checkout on ``sys.path`` (the script imports its ``src/photron``
    package relatively). With ``neutralize_figures`` (the default) the
    reference's per-frame 12-panel figure and stacked-sequence renderers
    are replaced by no-ops: they dominate its runtime
    (``process_videos.py:1474`` renders unconditionally) and never feed
    back into positions/velocities/DDT, so tables-only comparisons and
    fair benchmarks turn them off. Pass ``neutralize_figures=False`` for
    figure-parity work (use a distinct ``module_name`` if both variants
    must coexist in one process).

    Raises ``FileNotFoundError`` when the checkout is absent.
    """
    script = reference_script()
    if not script.exists():
        raise FileNotFoundError(f"reference checkout not found: {script}")
    import matplotlib

    matplotlib.use("Agg")
    install_pymraw_shim()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    spec = importlib.util.spec_from_file_location(module_name, script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if neutralize_figures:
        mod.save_frame_image = lambda *a, **k: None
        mod.generate_stacked_sequence = lambda *a, **k: None
        mod.generate_stacked_sequence_single_column = lambda *a, **k: None
    return mod
