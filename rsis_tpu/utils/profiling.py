"""Profiling helpers: jax.profiler traces and step timing.

The reference's only instrumentation is wall-clock deltas around
``torch.cuda.synchronize`` (reference: src/train.py:284-285,397-401); here
proper XLA traces are one context manager away.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(sink=None):
    """Wall-clock a device-synchronized region; appends seconds to sink."""
    start = time.perf_counter()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()
    dt = time.perf_counter() - start
    if sink is not None:
        sink.append(dt)
