"""Shared TPU micro-benchmark harness.

Timing over a remote (axon-tunnelled) TPU has ~30 ms round-trip latency
with multi-ms jitter, so the subtract-one-RTT pattern is unreliable at
sub-ms resolution. Instead: dispatch `rep` jitted calls asynchronously
(each takes the iteration index so nothing is loop-invariant), block once
on the last result, and divide. Dispatch overhead per call is ~100 us and
is measured separately via an empty-kernel calibration and subtracted.

Results are medians over `outer` rounds.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def _round(f, rep, args):
    """One timed round: rep async dispatches, then one SMALL VALUE FETCH of
    the last result. On the axon-tunnelled TPU, block_until_ready returns
    immediately (broken async semantics on the experimental platform), so
    blocking must go through an actual device-to-host read; fn's outputs
    must therefore be tiny scalars."""
    t0 = time.perf_counter()
    out = None
    for i in range(rep):
        out = f(jnp.int32(i), *args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
    return time.perf_counter() - t0


_cal_cache: list[tuple[float, float]] = []


def _calibrate() -> tuple[float, float]:
    """(per-dispatch overhead, blocking round-trip) of a trivial jitted op.

    A round of rep dispatches costs rep*dispatch + rtt + rep*work: the
    blocking round-trip is paid once per round. Calibrating at two repeat
    counts separates the two, so callers can subtract each at the right
    multiplicity (folding rtt into a per-call 'overhead' at small rep wipes
    out the entire measurement)."""
    if _cal_cache:
        return _cal_cache[0]
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda i, x: x + i)
    _round(f, 4, (x,))
    r1 = min(_round(f, 1, (x,)) for _ in range(7))     # dispatch + rtt
    r64 = min(_round(f, 64, (x,)) for _ in range(5))   # 64*dispatch + rtt
    disp = max((r64 - r1) / 63.0, 0.0)
    rtt = max(r1 - disp, 0.0)
    _cal_cache.append((disp, rtt))
    return _cal_cache[0]


def dispatch_overhead(rep: int = 64) -> float:
    """Per-call host dispatch cost (back-compat accessor)."""
    return _calibrate()[0]


def bench(fn, *args, rep: int = 32, outer: int = 5, inner: int = 1,
          tag: str | None = None):
    """Median per-iteration seconds of `fn(i, *args)` (i = jnp.int32 index).

    fn must make its work depend on i (e.g. roll an index array by i) so
    XLA cannot hoist it out of the measurement, and must return a scalar
    (accumulated across inner repeats — sums survive, DCE doesn't).

    inner > 1 wraps fn in an in-graph fori_loop of `inner` iterations per
    dispatch: tunnel-latency jitter on the per-dispatch overhead then
    divides by `inner` (fn's scalar result is accumulated, so XLA cannot
    elide iterations; only use when fn(i) at distinct i does identical
    work)."""
    if inner > 1:
        base = fn

        def fn(i, *a):  # noqa: F811 - deliberate wrapper
            def body(j, acc):
                return acc + jnp.float32(base(i * inner + j, *a))
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    f = jax.jit(fn)
    try:
        _round(f, 2, args)  # compile + warm
    except jax.errors.JaxRuntimeError as e:
        # the tunnel's compile relay occasionally drops a connection
        # (UNAVAILABLE / broken pipe); one backoff + retry saves the whole
        # artifact. Anything else (or a second failure) propagates.
        if not any(s in str(e) for s in ("UNAVAILABLE", "Broken pipe",
                                         "DEADLINE", "transport")):
            raise
        print(f"# bench compile retry after transient relay error: "
              f"{str(e)[:120]}")
        time.sleep(30)
        _round(f, 2, args)
    disp, rtt = _calibrate()
    times = sorted(_round(f, rep, args) for _ in range(outer))
    t = ((times[len(times) // 2] - rtt) / rep - disp) / inner
    t = max(t, 0.0)
    if tag is not None:
        print(f"{tag:46s} {t*1e3:8.3f} ms")
    return t
