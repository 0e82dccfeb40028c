"""Profiling and tracing harness (SURVEY.md §5 "Tracing / profiling").

The reference's only observability was TensorBoard scalars; the TPU-native
kit is:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    XProf/Perfetto traces viewable in TensorBoard or ui.perfetto.dev;
  * ``Timer`` / ``benchmark_fn`` — block_until_ready-correct wall timing of
    jitted callables (compile excluded), the harness behind bench.py-style
    numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with profiling.trace("/tmp/trace"): fn()``.

    View with TensorBoard (profile plugin) or Perfetto.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Plain wall-clock timer (context manager).

    NOTE: does NOT synchronize the device — under JAX's async dispatch the
    caller must ``jax.block_until_ready`` inside the block to time device
    work (``benchmark_fn`` below does this for you).
    """

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def benchmark_fn(
    fn: Callable,
    *args,
    repeats: int = 10,
    warmup: int = 1,
) -> dict:
    """Time a jitted callable correctly (device-synchronized, post-compile).

    Returns {"mean_s", "best_s", "runs"}; outputs are blocked on each run so
    the timings measure device execution, not dispatch.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        runs.append(time.perf_counter() - t0)
    return {
        "mean_s": sum(runs) / len(runs),
        "best_s": min(runs),
        "runs": runs,
    }
