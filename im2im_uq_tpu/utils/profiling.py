"""Profiling/tracing harness — jax.profiler traces + wall-clock timing.

The reference has no tracing or profiling at all (SURVEY.md §5: tqdm bars
and prints only). TPU-native equivalent: ``trace()`` captures a TensorBoard-
loadable device trace; ``time_fn`` measures steady-state step time with
proper ``block_until_ready`` fencing and warmup; ``device_busy_breakdown``
turns a captured trace into per-op-category on-chip busy time — the
load-independent metric this repo's perf work is measured with (the
tunneled chip's wall clock swings ~50x with host load, see STATUS.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

__all__ = [
    "trace",
    "time_fn",
    "device_busy_breakdown",
    "device_busy_ops",
    "measure_device_busy",
]


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


def _tpu_op_durations(trace_dir: str, per_chip: bool = False):
    """Summed per-op TPU-lane SELF durations (µs) from a jax.profiler trace.

    With ``per_chip=True``, divides every value by the number of distinct
    TPU device lanes (pids) that contributed events — the per-chip MEAN.
    A multi-chip trace has one lane per device, so the raw sum is
    aggregate chip-time across the mesh; throughput math that divides by
    n_chips needs the per-chip figure or it undercounts n-fold.

    Skips the jit_* container rows (XLA Modules lane) and bare step-number
    rows (Steps lane). Within each remaining lane, Chrome-format X events
    nest (a ``while`` op's event SPANS its body ops' events — summing raw
    durations double-counts: measured 251.7 "ms/step" vs 125.9 true on the
    K-step lax.scan train loop), so each op is charged its self time:
    duration minus its direct children. For flat traces (no control-flow
    containers) self time == duration, so every existing flat-program
    benchmark is unchanged. Returns a Counter {op_name: µs} or None if no
    trace file was produced.
    """
    import collections
    import glob
    import gzip
    import json
    import re

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        return None
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    ev = tr.get("traceEvents", [])
    lanes = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    by_thread = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in lanes.get(e.get("pid"), ""):
            continue
        n = e["name"]
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue
        by_thread[(e["pid"], e.get("tid"))].append(
            (float(e["ts"]), float(e["dur"]), n)
        )
    ops = collections.Counter()
    for evs in by_thread.values():
        # start ascending; at equal starts the longer event is the parent
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # [end_ts, name, self_dur] of still-open ancestors
        for ts, dur, name in evs:
            while stack and ts >= stack[-1][0] - 1e-6:
                _, n2, self_dur = stack.pop()
                ops[n2] += max(self_dur, 0.0)
            if stack:
                stack[-1][2] -= dur  # child time leaves the parent's self
            stack.append([ts + dur, name, dur])
        for _, n2, self_dur in stack:
            ops[n2] += max(self_dur, 0.0)
    if per_chip:
        n_pids = len({pid for (pid, _tid) in by_thread})
        if n_pids > 1:
            for k in ops:
                ops[k] /= n_pids
    return ops


def device_busy_breakdown(trace_dir: str, steps: int = 1) -> Optional[dict]:
    """Per-category on-chip busy ms/step from a jax.profiler trace directory.

    Buckets op durations: convolution, reduction, while/dynamic-slice (the
    serialized-scatter signature), maxpool-bwd, gather, copy, fusion, other.
    Returns {'total_ms', 'categories': {...}} or None if no trace found.
    ``total_ms`` is the PER-CHIP mean — a multi-chip trace has one lane per
    device, and bench.py's imgs/sec/chip math divides by n_chips, which
    needs the per-chip figure (the raw cross-mesh sum would undercount
    throughput n-fold).
    """
    import collections
    import re

    ops = _tpu_op_durations(trace_dir, per_chip=True)
    if ops is None:
        return None
    cat = collections.Counter()
    for n, dur in ops.items():
        base = re.sub(r"[.\d]+$", "", n)
        if "conv" in base:
            k = "convolution"
        elif "while" in base or "dynamic-update-slice" in base or "dynamic-slice" in base:
            k = "while/dynamic-slice"
        elif "select_and_scatter" in base:
            k = "maxpool-bwd"
        elif "reduce" in base:
            k = "reduction"
        elif "gather" in base:
            k = "gather"
        elif "copy" in base:
            k = "copy"
        elif "fusion" in base or "bitcast" in base:
            k = "fusion"
        else:
            k = "other"
        cat[k] += dur
    total = sum(cat.values())
    return {
        "total_ms": round(total / steps / 1e3, 2),
        "categories": {k: round(v / steps / 1e3, 2) for k, v in cat.most_common()},
    }


def device_busy_ops(trace_dir: str, steps: int = 1, top: int = 25) -> Optional[dict]:
    """Top individual ops by on-chip busy ms/step from a trace directory.

    The fine-grained companion of device_busy_breakdown — use it to decide
    where kernel/fusion work goes. Returns {'total_ms', 'ops': [(name, ms)]}
    or None if no trace found. Per-chip mean, like device_busy_breakdown —
    the two functions' total_ms agree on the same trace dir (a multi-chip
    trace has one lane per device; the raw cross-mesh sum would disagree
    n-fold with the breakdown).
    """
    ops = _tpu_op_durations(trace_dir, per_chip=True)
    if ops is None:
        return None
    total = sum(ops.values())
    return {
        "total_ms": round(total / steps / 1e3, 2),
        "ops": [(n, round(d / steps / 1e3, 2)) for n, d in ops.most_common(top)],
    }


def measure_device_busy(fn: Callable, *args, steps: int = 3) -> Optional[dict]:
    """Run ``fn(*args)`` ``steps`` times under a profiler trace and return
    its device-busy breakdown (see device_busy_breakdown)."""
    import tempfile

    import jax

    try:
        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                out = None
                for _ in range(steps):
                    out = fn(*args)
                jax.block_until_ready(out)
            return device_busy_breakdown(td, steps=steps)
    except Exception:
        return None  # profiling is best-effort (not supported on all backends)
