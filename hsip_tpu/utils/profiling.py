"""Profiling: jax.profiler traces and server (the reference had none)."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

__all__ = ["profile_trace", "start_profiler_server"]


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard-viewable) for the scope.

    No-op when ``log_dir`` is None, so call sites can thread a CLI flag
    straight through.
    """
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def start_profiler_server(port: int = 9999) -> None:
    """Start the on-demand profiling server (connect with TensorBoard)."""
    import jax

    jax.profiler.start_server(port)
