"""Profiling / tracing utilities (SURVEY.md §5: the reference's only tracing
is manual ``time.time()`` wall-clock prints with TensorBoard profiling
explicitly disabled, ref train.py:159 ``profile_batch=0``).

TPU-native replacements:
- ``trace(logdir)``: a ``jax.profiler`` trace context producing TensorBoard /
  Perfetto-compatible traces of device execution,
- ``StepTimer``: steady-state step timing with proper device synchronization
  (value readback — see bench.py for why plain ``block_until_ready`` is not
  trusted on every platform),
- ``device_memory_stats()``: live HBM usage.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the context."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter for a training loop.

    >>> timer = StepTimer(batch_size=64)
    >>> for batch in ds: state, m = step(state, *batch); timer.tick(m["total"])
    >>> timer.summary()  # {'steps': ..., 'images_per_s': ..., 'p50_ms': ...}
    """

    def __init__(self, batch_size: int, sync_every: int = 10):
        self.batch_size = batch_size
        self.sync_every = sync_every
        self._times: list = []
        self._last = None
        self._steps = 0

    def tick(self, sync_value=None) -> None:
        """Call once per step; pass a device scalar to force a sync point
        every ``sync_every`` steps."""
        self._steps += 1
        if sync_value is not None and self._steps % self.sync_every == 0:
            float(sync_value)  # device round-trip = true step boundary
            now = time.perf_counter()
            if self._last is not None:
                self._times.append((now - self._last) / self.sync_every)
            self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": self._steps, "images_per_s": 0.0, "p50_ms": 0.0}
        ts = sorted(self._times)
        p50 = ts[len(ts) // 2]
        return {
            "steps": self._steps,
            "images_per_s": self.batch_size / p50,
            "p50_ms": p50 * 1000.0,
        }


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Per-device HBM stats when the backend exposes them."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return {k: int(v) for k, v in stats.items()} if stats else None
    except Exception:
        return None
