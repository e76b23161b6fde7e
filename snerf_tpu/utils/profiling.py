"""Profiling / tracing hooks (the reference has wall-clock timers only;
SURVEY.md §5.1 calls for jax.profiler traces + rays/sec as the metric of
record)."""

from __future__ import annotations

import contextlib
import time

class Timing:
  """Wall-clock context timer (parity: zipnerf internal/utils.py:11-31)."""

  def __init__(self, name: str = "", verbose: bool = True):
    self.name = name
    self.verbose = verbose
    self.elapsed = 0.0

  def __enter__(self):
    self.start = time.perf_counter()
    return self

  def __exit__(self, *a):
    self.elapsed = time.perf_counter() - self.start
    if self.verbose:
      print(f"[timing] {self.name}: {self.elapsed:.3f}s")
    return False


@contextlib.contextmanager
def trace(log_dir: str):
  """jax.profiler trace around a block; view with TensorBoard/xprof."""
  import jax
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate(name: str):
  """Named TraceAnnotation for inner regions."""
  import jax
  return jax.profiler.TraceAnnotation(name)


class RaysPerSec:
  """Streaming rays/sec meter — the reference's train_rays_per_sec TB
  scalar (zipnerf/train.py:356-358,400)."""

  def __init__(self):
    self.reset()

  def reset(self):
    self.t0 = time.perf_counter()
    self.rays = 0

  def update(self, n_rays: int):
    self.rays += n_rays

  def rate(self) -> float:
    dt = time.perf_counter() - self.t0
    return self.rays / dt if dt > 0 else 0.0
