"""Backend identification shared by every TPU-gated fast path.

The dev environment's TPU reaches jax through a tunnel platform named
'axon' — ``jax.default_backend()`` returns "axon" there, not "tpu". Every
gate that picks a Mosaic/Pallas kernel must treat both as TPU, or the
fast paths silently never engage in production (found the hard way: the
``== "tpu"`` comparison disabled the fused band kernel on axon).
"""

from __future__ import annotations

__all__ = ["is_tpu_backend"]

TPU_PLATFORMS = ("tpu", "axon")


def is_tpu_backend() -> bool:
    """True when the default jax backend is a real TPU (incl. tunneled)."""
    import jax

    return jax.default_backend() in TPU_PLATFORMS
