"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY §5 — tqdm bars only). This
provides the TPU-native equivalents: jax.profiler trace capture around
training windows, and a step timer that respects this image's quirk that
`block_until_ready` does not block through the axon relay (host fetch is the
only true barrier — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def true_sync(x) -> None:
    """A barrier that actually waits for device work on this image.

    jax.block_until_ready returns immediately through the axon tunnel; a
    host fetch of one scalar is the only reliable sync.
    """
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


class StepTimer:
    """Rolling steps/sec with true device syncs every `sync_every` steps
    (syncing every step would serialize the dispatch pipeline)."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.count = 0
        self.t0: Optional[float] = None
        self.rate = 0.0

    def step(self, device_output) -> float:
        if self.t0 is None:
            true_sync(device_output)
            self.t0 = time.perf_counter()
            self.count = 0
            return self.rate
        self.count += 1
        if self.count % self.sync_every == 0:
            true_sync(device_output)
            dt = time.perf_counter() - self.t0
            self.rate = self.count / dt
        return self.rate
