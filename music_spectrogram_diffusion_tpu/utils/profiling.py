"""Profiling/observability helpers.

The reference has no in-repo tracing (SURVEY §5); observability is
metric-based. Here the realtime-factor metrics remain the north star
(infer/synthesize.py, train/metrics.py) and this module adds the missing
jax.profiler hooks for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
  """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate(name: str):
  """Named region that shows up in profiler traces."""
  return jax.profiler.TraceAnnotation(name)


def device_sync(x) -> float:
  """Reliable device sync: fetch a scalar reduction.

  On the tunneled 'axon' TPU platform block_until_ready() returns
  immediately; a device->host transfer is the only dependable barrier.
  """
  import jax.numpy as jnp
  return float(np.asarray(jnp.sum(x)))


class StepTimer:
  """Rolling wall-clock stats for step loops (median/p90)."""

  def __init__(self, window: int = 100):
    self._times = []
    self._window = window
    self._t0: Optional[float] = None

  def start(self) -> None:
    self._t0 = time.time()

  def stop(self) -> float:
    assert self._t0 is not None
    dt = time.time() - self._t0
    self._times.append(dt)
    if len(self._times) > self._window:
      self._times.pop(0)
    self._t0 = None
    return dt

  def stats(self) -> Dict[str, float]:
    if not self._times:
      return {}
    arr = np.asarray(self._times)
    return {
        "step_seconds_median": float(np.median(arr)),
        "step_seconds_p90": float(np.percentile(arr, 90)),
        "step_seconds_mean": float(arr.mean()),
    }
