"""Profiling / tracing utilities (SURVEY §5 tracing subsystem).

The reference has no profiling beyond prints (model/train.py:145-148) and a
timing comment (train.py:53-57). Here: jax.profiler trace annotations with an
optional perfetto-compatible dump dir, step timers, and throughput counters
(the BASELINE mel-frames/sec/chip metric).
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region visible in the TPU profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a full device trace (view with tensorboard/perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing + derived throughput.

    ``frames_per_item`` defaults to the 860 spectrogram frames per chunk so
    rates are directly the BASELINE metric (mel-frames/sec/chip).
    """

    def __init__(self, frames_per_item: int = 860):
        self.frames_per_item = frames_per_item
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def mean_step_time(self, skip_first: int = 1) -> float:
        ts = self.times[skip_first:] or self.times
        return sum(ts) / len(ts)

    def frames_per_sec(self, batch_size: int, skip_first: int = 1) -> float:
        return batch_size * self.frames_per_item / self.mean_step_time(skip_first)


def enable_nan_debugging() -> None:
    """Numeric-sanitizer analogue of race detection (SURVEY §5): fail fast on NaNs."""
    jax.config.update("jax_debug_nans", True)


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Persistent XLA compile cache for the CLI entry points.

    A flagship-width serving/train process pays multi-minute XLA compiles on
    every cold start (measured ~8 min for the serve program, ~3 min for the
    train step on the v5e). The persistent cache eliminates that on
    platforms where jax compiles LOCALLY (CPU tests: warm /tmp cache takes
    recompiles to ~0). CAVEAT, measured round 3: under the tunneled axon
    PJRT plugin the big programs compile on the REMOTE server and bypass
    this cache entirely (three identical cold serves each paid the same
    ~60 s first-call cost with a fully-populated cache dir; only small
    host-side jits appear in it) — keep serving processes long-lived there
    (scripts/serve.py daemon) instead of relying on restarts being cheap.
    Default location ~/.cache/mmst_jax; override with the
    MMST_COMPILE_CACHE env var, disable with MMST_COMPILE_CACHE=0. Returns
    the directory used (None if disabled).
    """
    import os

    if path is None:
        path = os.environ.get("MMST_COMPILE_CACHE",
                              os.path.expanduser("~/.cache/mmst_jax"))
    if not path or path == "0":
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
