"""Host-side tic/toc profiling + device trace helpers.

Mirrors common/timing.{h,cpp}: a global name -> accumulated wall-clock
map, enabled at runtime (the reference gates on --enable_timing). For
device work, `trace()` wraps jax.profiler so kernel time lands in a
TensorBoard-loadable trace (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict

_enabled = False
_lock = threading.Lock()
_starts: Dict[str, float] = {}
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


def enable(on: bool = True):
    global _enabled
    _enabled = on


def tic(name: str):
    if not _enabled:
        return
    with _lock:
        _starts[name] = time.perf_counter()


def toc(name: str):
    if not _enabled:
        return
    now = time.perf_counter()
    with _lock:
        start = _starts.pop(name, None)
        if start is not None:
            _totals[name] += now - start
            _counts[name] += 1


@contextlib.contextmanager
def timed(name: str):
    tic(name)
    try:
        yield
    finally:
        toc(name)


def report() -> str:
    with _lock:
        lines = []
        for name in sorted(_totals):
            total = _totals[name]
            n = _counts[name]
            lines.append(
                f"{name}: total {total*1e3:.1f} ms, calls {n}, "
                f"avg {total/max(n,1)*1e3:.2f} ms"
            )
    return "\n".join(lines)


def reset():
    with _lock:
        _starts.clear()
        _totals.clear()
        _counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
