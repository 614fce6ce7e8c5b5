"""Phase timers and device tracing.

The reference's only observability is coarse wall-clock log lines
(merizo.py:96-97, dbsearch.py:243-246). Here timing is a first-class
subsystem:

- `phase(name)`: context manager accumulating wall time (and call count)
  per pipeline phase into a process-wide registry; `report()` renders a
  summary table and is logged by the CLI at the end of every run.
- `trace(dir)`: wraps `jax.profiler.trace`, capturing a TensorBoard/XProf
  device trace of everything inside (enable with --trace <dir> on the CLI).

Timers deliberately do NOT force device synchronisation: a phase measures
dispatch + any blocking the pipeline actually does, so overlap between
host work and device work shows up as time saved, not hidden.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_acc: dict[str, list] = defaultdict(lambda: [0.0, 0])   # name -> [seconds, calls]


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall time for a named pipeline phase."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _acc[name][0] += dt
            _acc[name][1] += 1


def timings() -> dict[str, tuple[float, int]]:
    with _lock:
        return {k: (v[0], v[1]) for k, v in _acc.items()}


def reset() -> None:
    with _lock:
        _acc.clear()


def report(log=None) -> str:
    """Render (and optionally log) the accumulated phase table."""
    rows = sorted(timings().items(), key=lambda kv: -kv[1][0])
    if not rows:
        return ""
    width = max(len(k) for k, _ in rows)
    lines = ["phase timings:"]
    for name, (sec, calls) in rows:
        lines.append(f"  {name:<{width}}  {sec:9.3f} s  ({calls} calls)")
    text = "\n".join(lines)
    if log is not None:
        log.info("%s", text)
    return text


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Capture a JAX device trace into trace_dir (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    logger.info("device trace written to %s", trace_dir)
