"""One-off: phase-A time vs nslab (slab-interleave depth), bf16 + int8.

REP=32 inside one jit to amortise tunnel jitter (the ~30 ms RTT has
multi-ms variance, so REP=8 runs can under/over-state by ~10%).
Usage: python tools/perf_nslab.py [nslab ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N, D, Q, REP = 1 << 24, 128, 256, 32


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    nslabs = [int(x) for x in sys.argv[1:]] or [2, 4, 8]
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    q0 = jax.random.normal(kq, (Q, D), jnp.bfloat16)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    q8 = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8), (Q, 1)))
    scales = jnp.full((N,), np.float32(1 / 40.0))
    tl = jnp.zeros((N,), jnp.float32)
    qcap = jnp.full((Q,), jnp.float32(np.inf))

    triv = jax.jit(lambda x: x + 1)
    np.asarray(triv(q0))
    rtt = min(timed(lambda: np.asarray(triv(q0))) for _ in range(5))
    print(f"# rtt {rtt*1e3:.1f} ms")

    for ns in nslabs:
        os.environ["MERIZO_NSLAB"] = str(ns)
        from merizo_search_tpu.ops import pallas_scan as ps

        for tag, dd, qq, sc in [("bf16", db, q0, None),
                                ("int8", db8, q8, scales)]:
            @jax.jit
            def rep(q, d, s=sc):
                def body(i, acc):
                    # perturb per-iteration so XLA cannot hoist the scan
                    qi = (q * (1 + i.astype(q.dtype) * q.dtype.type(1e-3))
                          if q.dtype == jnp.bfloat16
                          else q + (i % 3).astype(q.dtype))
                    bm, _ = ps.blockmax_scan(qi, d, N, tl, qcap, scales=s)
                    return acc + jnp.sum(bm[:, :1, :8])
                return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

            # blockmax_scan caches jits keyed on args, but nslab is read at
            # trace time from the env -> clear to force a fresh lowering
            ps.blockmax_scan._clear_cache()
            np.asarray(rep(qq, dd))
            t = (min(timed(lambda: np.asarray(rep(qq, dd)))
                     for _ in range(5)) - rtt) / REP
            print(f"nslab={ns} {tag}: {t*1e3:7.3f} ms "
                  f"({N*D*dd.dtype.itemsize/t/1e9:5.0f} GB/s-equiv)")


if __name__ == "__main__":
    main()
