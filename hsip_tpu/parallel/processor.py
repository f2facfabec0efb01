"""TPUVideoProcessor: process-level distribution with the MPI-era API.

Drop-in replacement for the reference's ``MPIVideoProcessor``
(``src/photron/parallel.py:16-298``): same surface — rank/size/is_root/
is_parallel, ``distribute_indices`` (round_robin / contiguous),
``process_collection`` / ``process_videos``, broadcast / gather / scatter /
barrier / reduce_sum / allreduce_sum — but built on ``jax.distributed``
multi-process runtime instead of mpi4py:

* ranks        → JAX processes (``jax.process_index`` / ``process_count``)
* bcast/gather → device all-gathers of length-prefixed pickled buffers
                 (over ICI/DCN), via ``jax.experimental.multihost_utils``
* Reduce/Allreduce(SUM) → ``psum`` across processes
* serial fallback when there is a single process — every collective
  degenerates to identity, so the whole pipeline runs unchanged in one
  process (the reference's ``comm=None`` contract).

Call :func:`initialize_distributed` (or ``jax.distributed.initialize``)
before constructing in multi-process runs.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, List, Optional, Tuple, TypeVar

import numpy as np

import jax

T = TypeVar("T")

__all__ = ["TPUVideoProcessor", "initialize_distributed"]


def initialize_distributed(**kwargs) -> None:
    """Initialize the JAX multi-process runtime (idempotent convenience).

    Re-raises real initialization failures — silently degrading to serial
    rank-0 would make every host process all videos and overwrite shared
    outputs."""
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Older/newer jax word the double-init error differently
        # ("already initialized" vs "should only be called once").
        msg = str(e).lower()
        if "already initialized" not in msg and "only be called once" not in msg:
            raise


class TPUVideoProcessor:
    """Distribute video/frame work across JAX processes.

    Example:
        >>> processor = TPUVideoProcessor()
        >>> indices = processor.distribute_indices(len(video))
        >>> results = processor.process_collection(collection, analyze_frame)
        >>> if processor.is_root:
        ...     save_results(results)
    """

    def __init__(self, use_distributed: Optional[bool] = None):
        """``use_distributed=None`` auto-detects multi-process JAX;
        False forces serial mode (testing)."""
        if use_distributed is None:
            use_distributed = jax.process_count() > 1
        self._distributed = bool(use_distributed) and jax.process_count() > 1
        self._rank = jax.process_index() if self._distributed else 0
        self._size = jax.process_count() if self._distributed else 1

    # -- identity ------------------------------------------------------------

    @property
    def rank(self) -> int:
        """This process's index (0 in serial mode)."""
        return self._rank

    @property
    def size(self) -> int:
        """Total processes (1 in serial mode)."""
        return self._size

    @property
    def is_root(self) -> bool:
        return self._rank == 0

    @property
    def is_parallel(self) -> bool:
        return self._distributed and self._size > 1

    # -- index distribution ----------------------------------------------------

    def distribute_indices(
        self, total_count: int, distribution: str = "round_robin"
    ) -> List[int]:
        """Indices assigned to this process.

        round_robin: interleaved (i % size == rank). contiguous: equal blocks
        with the remainder spread over the first ranks.
        """
        if distribution == "round_robin":
            return [i for i in range(total_count) if i % self._size == self._rank]
        if distribution == "contiguous":
            chunk, rem = divmod(total_count, self._size)
            if self._rank < rem:
                start = self._rank * (chunk + 1)
                end = start + chunk + 1
            else:
                start = rem * (chunk + 1) + (self._rank - rem) * chunk
                end = start + chunk
            return list(range(start, end))
        raise ValueError(f"Unknown distribution strategy: {distribution}")

    # -- high-level maps ------------------------------------------------------------

    def process_collection(
        self,
        collection,
        process_func: Callable[[np.ndarray, int], T],
        gather_results: bool = True,
        distribution: str = "round_robin",
    ) -> Optional[List[Tuple[int, T]]]:
        """Map ``process_func(frame, global_idx)`` over a collection's frames,
        distributed across processes; optionally gather sorted to root."""
        my_indices = self.distribute_indices(collection.total_frames, distribution)
        local = [
            (g, process_func(collection.get_global_frame(g), g)) for g in my_indices
        ]
        if gather_results and self.is_parallel:
            gathered = self.gather(local)
            if self.is_root:
                flat = [item for sub in gathered for item in sub]
                flat.sort(key=lambda x: x[0])
                return flat
            return None
        return local

    def process_videos(
        self,
        collection,
        process_video_func: Callable[[Any, int], T],
        gather_results: bool = True,
    ) -> Optional[List[Tuple[int, T]]]:
        """Map over whole videos (one video per task)."""
        my_indices = self.distribute_indices(len(collection))
        local = [(v, process_video_func(collection[v], v)) for v in my_indices]
        if gather_results and self.is_parallel:
            gathered = self.gather(local)
            if self.is_root:
                flat = [item for sub in gathered for item in sub]
                flat.sort(key=lambda x: x[0])
                return flat
            return None
        return local

    # -- collectives -------------------------------------------------------------------

    def _allgather_bytes(self, payload: bytes) -> List[bytes]:
        """All-gather variable-length byte strings across processes."""
        from jax.experimental import multihost_utils

        data = np.frombuffer(payload, dtype=np.uint8)
        lengths = multihost_utils.process_allgather(
            np.array([data.size], dtype=np.int64)
        ).reshape(-1)
        max_len = int(lengths.max())
        padded = np.zeros(max_len, dtype=np.uint8)
        padded[: data.size] = data
        stacked = multihost_utils.process_allgather(padded)
        return [
            stacked[i, : int(lengths[i])].tobytes() for i in range(self._size)
        ]

    def broadcast(self, data: Any, root: int = 0) -> Any:
        """Broadcast a picklable object from ``root`` to all processes."""
        if not self.is_parallel:
            return data
        payload = pickle.dumps(data if self._rank == root else None)
        buffers = self._allgather_bytes(payload)
        return pickle.loads(buffers[root])

    def gather(self, data: Any, root: int = 0) -> Optional[List[Any]]:
        """Gather picklable objects to ``root`` (None elsewhere)."""
        if not self.is_parallel:
            return [data]
        buffers = self._allgather_bytes(pickle.dumps(data))
        if self._rank == root:
            return [pickle.loads(b) for b in buffers]
        return None

    def allgather(self, data: Any) -> List[Any]:
        """Gather picklable objects to ALL processes."""
        if not self.is_parallel:
            return [data]
        return [pickle.loads(b) for b in self._allgather_bytes(pickle.dumps(data))]

    def scatter(self, data: Optional[List[Any]], root: int = 0) -> Any:
        """Scatter a root-held list, one element per process."""
        if not self.is_parallel:
            return data[0] if data else None
        full = self.broadcast(data, root=root)
        return full[self._rank]

    def barrier(self) -> None:
        """Synchronize all processes."""
        if self.is_parallel:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("hsip_tpu_barrier")

    def reduce_sum(self, data: np.ndarray, root: int = 0) -> Optional[np.ndarray]:
        """Element-wise sum across processes, result on ``root`` only."""
        result = self.allreduce_sum(data)
        if not self.is_parallel or self._rank == root:
            return result
        return None

    def allreduce_sum(self, data: np.ndarray) -> np.ndarray:
        """Element-wise sum across processes, result everywhere."""
        if not self.is_parallel:
            return data
        from jax.experimental import multihost_utils

        stacked = multihost_utils.process_allgather(np.asarray(data))
        return np.asarray(stacked).sum(axis=0)

    def __repr__(self) -> str:
        mode = "parallel" if self.is_parallel else "serial"
        return f"<TPUVideoProcessor rank={self._rank}/{self._size} mode={mode}>"
