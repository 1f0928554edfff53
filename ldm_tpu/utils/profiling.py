"""Profiling / tracing hooks — the TPU-native equivalent of the reference's
wall-clock instrumentation (``timeit`` decorator src/utils.py:107-118, the
prepare-vs-process "compute efficiency" readout src/AutoencoderTrainer.py:55-103,
and ``cudnn.benchmark`` autotuning, train_diffusion_model.py:19 — XLA autotunes
implicitly).

* :func:`trace` — context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace (op-level timeline on TPU) to a directory;
* :class:`Throughput` — cheap steps/sec and samples/sec/chip counters for epoch
  logs, without any per-step host sync (call ``update`` with host-side batch sizes;
  read rates at epoch end).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace under ``logdir`` (no-op if None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/sec and samples/sec/chip over a window (e.g. one epoch)."""

    def __init__(self, n_chips: Optional[int] = None):
        self.n_chips = n_chips or jax.device_count()
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self.steps = 0
        self.samples = 0

    def update(self, batch_size: int) -> None:
        self.steps += 1
        self.samples += batch_size

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def rates(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        return {
            "steps_per_sec": self.steps / dt,
            "samples_per_sec_per_chip": self.samples / dt / self.n_chips,
        }
