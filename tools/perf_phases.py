"""Profile the fused scan's phases on the live TPU at several batch sizes.

Phase A (blockmax_scan) should run at HBM speed-of-light; phases B+C are
selection overhead. This tool reports ms and GB/s per phase so tuning work
targets the real bottleneck. Tunnel sync (~30ms/call) is amortised by
repeating inside one jit as bench.py does.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops.pallas_scan import (
    blockmax_scan, fused_topk, _topk_entries, gather_block_scores,
    DEFAULT_TILE, BLOCK, GATHER_G)

DB_N = 1 << 24
DIM = 128
K = 100
REPEATS = 32


def timed(f, n=3):
    f()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (DB_N, DIM), jnp.bfloat16))(kd)
    db.block_until_ready()
    db_bytes = DB_N * DIM * 2

    triv = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8,), jnp.float32)
    np.asarray(triv(x0))
    rtt = min(timed(lambda: np.asarray(triv(x0)), 5) for _ in range(2))
    print(f"rtt floor: {rtt*1e3:.1f} ms")

    for tile in ([DEFAULT_TILE] if len(sys.argv) < 2 else [int(t) for t in sys.argv[1].split(",")]):
        for qn in [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else "64,128,256,512".split(","))]:
            q = jax.random.normal(kq, (qn, DIM), jnp.bfloat16)
            tl = jnp.zeros((DB_N,), jnp.float32)
            qcap = jnp.full((qn,), jnp.float32(np.inf))

            @jax.jit
            def repA(q, db):
                def body(i, acc):
                    qq = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                    bm, _sbm = blockmax_scan(qq, db, DB_N, tl, qcap, tile=tile)
                    return acc + jnp.sum(bm[:, :1, :8], axis=(-2, -1))
                return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((qn,), jnp.float32))

            @jax.jit
            def repFull(q, db):
                def body(i, acc):
                    qq = q * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                    v, idx = fused_topk(qq, db, DB_N, K, tile=tile)
                    return acc + jnp.sum(v, axis=-1) + idx[:, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((qn,), jnp.float32))

            np.asarray(repA(q, db))
            tA = (min(timed(lambda: np.asarray(repA(q, db))) for _ in range(2)) - rtt) / REPEATS
            np.asarray(repFull(q, db))
            tF = (min(timed(lambda: np.asarray(repFull(q, db))) for _ in range(2)) - rtt) / REPEATS
            print(f"tile={tile:6d} Q={qn:4d}: phaseA {tA*1e3:7.2f} ms ({db_bytes/tA/1e9:5.0f} GB/s)"
                  f"  full {tF*1e3:7.2f} ms ({db_bytes/tF/1e9:5.0f} GB/s, {qn/tF:7.0f} q/s)"
                  f"  BC overhead {(tF-tA)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
