"""Why is the int8 scan SLOWER than bf16 at Q=512 (0.92x) when the int8
MXU runs at 2x the bf16 rate?

Measures, at Q in {256, 512} on the 16M x 128 DB:
  - dot-only int8 (raw jnp dot_general per tile, fori over tiles)
  - phase A (blockmax_scan) int8 vs bf16
  - full fused_topk int8 vs bf16
Each timed with the in-jit repeat harness (tunnel RTT amortised).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops.pallas_scan import (
    blockmax_scan, fused_topk, DEFAULT_TILE)

DB_N = 1 << 24
DIM = 128
K = 100
REPEATS = 16


def timed(f, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (DB_N, DIM), jnp.bfloat16))(kd)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    rs8 = jnp.full((DB_N,), np.float32(1 / 40.0))
    db8.block_until_ready()

    triv = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8,), jnp.float32)
    np.asarray(triv(x0))
    rtt = min(timed(lambda: np.asarray(triv(x0)), 5) for _ in range(2))
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    for qn in (256, 512):
        q = jax.random.normal(kq, (qn, DIM), jnp.bfloat16)
        q8 = jnp.asarray(
            np.tile(np.arange(-64, 64, dtype=np.int8), (qn, 1)))
        tl = jnp.zeros((DB_N,), jnp.float32)
        qcap = jnp.full((qn,), np.float32(np.inf))

        @jax.jit
        def dot_only8(q8, db8):
            db3 = db8.reshape(DB_N // DEFAULT_TILE, DEFAULT_TILE, DIM)

            def body(i, acc):
                qq = q8 + (i % 3).astype(jnp.int8)

                def tbody(t, a):
                    s = jax.lax.dot_general(
                        db3[t], qq,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return a + jnp.sum(jnp.max(s, axis=0))

                return acc + jax.lax.fori_loop(
                    0, DB_N // DEFAULT_TILE, tbody, jnp.int32(0))

            return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))

        def repA(q, db, scales):
            def body(i, acc):
                qq = (q + (i % 3).astype(jnp.int8)) if q.dtype == jnp.int8 \
                    else q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                bm, _ = blockmax_scan(qq, db, DB_N, tl, qcap,
                                      scales=scales, allow_split=True)
                return acc + jnp.sum(bm[:1, :, :8])
            return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

        def repF(q, db, scales):
            def body(i, acc):
                qq = (q + (i % 3).astype(jnp.int8)) if q.dtype == jnp.int8 \
                    else q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                v, idx = fused_topk(qq, db, DB_N, K, scales=scales)
                return acc + jnp.sum(v) + idx[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

        jA = jax.jit(repA, static_argnums=())
        jF = jax.jit(repF)

        def run(tag, fn, *args):
            np.asarray(fn(*args))
            t = (min(timed(lambda: np.asarray(fn(*args))) for _ in range(2))
                 - rtt) / REPEATS
            print(f"Q={qn:4d} {tag:18s} {t*1e3:7.2f} ms "
                  f"({qn/t:8.0f} q/s)", flush=True)
            return t

        run("dot_only int8", dot_only8, q8, db8)
        run("phaseA   int8", jA, q8, db8, rs8)
        run("phaseA   bf16", jA, q, db, None)
        run("full     int8", jF, q8, db8, rs8)
        run("full     bf16", jF, q, db, None)


if __name__ == "__main__":
    main()
