"""Timers (ref: sarathi-lean/sarathi/metrics/cuda_timer.py:10-67 + CpuTimer).

The reference wraps CUDA events around every linear/collective/attention
sub-phase.  Under XLA the compiled program cannot be timed from Python at
op granularity; the TPU-native equivalents are:

  - CpuTimer: wall-clock context manager for host phases (scheduling,
    prepare_inputs, allocator step) feeding the MetricsStore.
  - DeviceTimer: jax.named_scope annotation so ops appear as named
    ranges in jax.profiler traces (the chrome-trace/xplane analog of
    per-op CUDA events); optionally synchronizing for coarse wall timing
    when `sync=True` (debug only -- breaks dispatch pipelining).
  - profile_session: wrapper over jax.profiler.trace, the torch.profiler
    analog (ref worker/base_worker.py:222-247).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

from vattention_tpu.metrics.metrics_store import CDFSketch


class CpuTimer:
    def __init__(self, sketch: Optional[CDFSketch] = None,
                 name: str = ""):
        self.sketch = sketch
        self.name = name
        self.last = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last = time.perf_counter() - self._t0
        if self.sketch is not None:
            self.sketch.add(self.last)
        return False


@contextlib.contextmanager
def DeviceTimer(name: str, sync: bool = False):
    """Named range for profiler traces (CudaTimer analog)."""
    with jax.named_scope(name):
        yield
    if sync:
        # coarse wall timing; only for debugging (serializes dispatch)
        jax.effects_barrier()


@contextlib.contextmanager
def profile_session(log_dir: str):
    """Full-trace profiling session (torch.profiler analog).

    View with tensorboard or xprof; produces xplane protos under
    ``log_dir``.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
