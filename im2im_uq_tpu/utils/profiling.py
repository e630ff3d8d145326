"""Profiling/tracing harness — jax.profiler traces + wall-clock timing.

The reference has no tracing or profiling at all (SURVEY.md §5: tqdm bars
and prints only). TPU-native equivalent: ``trace()`` captures a TensorBoard-
loadable device trace; ``time_fn`` measures steady-state step time with
proper ``block_until_ready`` fencing and warmup.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

__all__ = ["trace", "time_fn"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 1,
    iters: int = 10,
    windows: int = 3,
) -> dict:
    """Steady-state timing: compile/warmup first, then best/mean of windows.

    Returns {'best_sec_per_call', 'mean_sec_per_call', 'compile_sec'}.
    """
    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    compile_sec = time.perf_counter() - t0

    samples = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / iters)
    return {
        "best_sec_per_call": min(samples),
        "mean_sec_per_call": sum(samples) / len(samples),
        "compile_sec": compile_sec,
    }
