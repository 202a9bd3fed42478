"""Timing / progress / profiling utilities.

Counterpart of the reference's homegrown tracing (helpers.Timer
gated by showTiming, helpers.Progress gated on verbose, printMemUsage;
reference identification/helpers.py:201-219, identifier.py:1424-1438),
plus first-class JAX profiler integration (the reference has none)."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterable


class Timer:
    """`with Timer() as t: ...; t.interval` (reference helpers.py:212-219)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.interval = time.perf_counter() - self.start
        return False


@contextlib.contextmanager
def stage_timer(name: str, opt: dict | None = None):
    """Print '<name> took X s' when showTiming is enabled."""
    t0 = time.perf_counter()
    yield
    if opt is None or opt.get("showTiming"):
        print(f"({name} took {time.perf_counter() - t0:.3f} sec.)")


class Progress:
    """tqdm progress bars gated on verbose (reference helpers.py:201-209)."""

    def __init__(self, config: dict):
        self.config = config

    def progress(self, it: Iterable) -> Iterable:
        if self.config.get("verbose"):
            try:
                from tqdm import tqdm

                return tqdm(it)
            except ImportError:
                return it
        return it


@contextlib.contextmanager
def jax_profile(logdir: str | None):
    """Capture a JAX/XLA device profile into `logdir` (view with
    TensorBoard or xprof). No-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"JAX profile written to {logdir}")


def print_mem_usage(variables: dict[str, Any]) -> None:
    """Rough per-array memory report (reference identifier.py:1424-1438)."""
    import numpy as np

    rows = []
    for name, v in variables.items():
        if hasattr(v, "nbytes"):
            rows.append((name, v.nbytes))
    rows.sort(key=lambda r: -r[1])
    total = 0
    for name, nb in rows[:20]:
        print(f"  {name:<30} {nb / 1e6:10.2f} MB")
        total += nb
    print(f"  {'total (top 20)':<30} {total / 1e6:10.2f} MB")
