"""Phase-level microbenchmark for the fused scan on the real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_scan.py [n_log2]

Times (tunnel-RTT-corrected, work repeated inside one jit):
  A   blockmax_scan alone
  AB  blockmax + block select
  ABC full fused_topk
  G   gather_block_scores alone with uniform-random block ids
for bf16 and int8.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops import pallas_scan as ps

N = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
D = 128
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = 100
REP = 8


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench(fn, *args, rep=REP, tag=""):
    @jax.jit
    def repeated(*a):
        def body(i, acc):
            out = fn(i, *a)
            return acc + out
        return jax.lax.fori_loop(0, rep, body, jnp.float32(0))

    _ = np.asarray(repeated(*args))
    total = min(timed(lambda: np.asarray(repeated(*args))) for _ in range(3))
    t = (total - RTT) / rep
    gbps = N * D * BYTES / t / 1e9
    print(f"{tag:28s} {t*1e3:7.3f} ms  ({gbps:6.1f} GB/s-equiv)")
    return t


kq, kd = jax.random.split(jax.random.PRNGKey(0))
db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
q0 = jax.random.normal(kq, (Q, D), jnp.float32)
q0 = (q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)).astype(jnp.bfloat16)
tl = jnp.zeros((N,), jnp.float32)
qcap = jnp.full((Q,), jnp.float32(np.inf))

triv = jax.jit(lambda x: x + 1)
_ = np.asarray(triv(q0))
RTT = min(timed(lambda: np.asarray(triv(q0))) for _ in range(5))
print(f"# rtt {RTT*1e3:.1f} ms, N={N}, Q={Q}, K={K}")

BYTES = 2

NB = N // ps.BLOCK


def perturb(i, q):
    return q * (1.0 + i.astype(q.dtype) * q.dtype.type(1e-3))


def run_suite(db, q0, scales, bytes_):
    global BYTES
    BYTES = bytes_

    def phase_a(i, q, db, *s):
        bm, _sbm = ps.blockmax_scan(perturb(i, q) if q.dtype == jnp.bfloat16 else q + (i % 3).astype(q.dtype),
                                    db, N, tl, qcap,
                                    scales=(s[0] if s else None))
        return jnp.sum(bm[:, :8])

    def phase_ab(i, q, db, *s):
        bm, sbm = ps.blockmax_scan(perturb(i, q) if q.dtype == jnp.bfloat16 else q + (i % 3).astype(q.dtype),
                                   db, N, tl, qcap,
                                   scales=(s[0] if s else None))
        bidx, _scale = ps._select_blocks(bm, sbm, N, K, True)
        return jnp.sum(bidx.astype(jnp.float32))

    def full(i, q, db, *s):
        v, idx = ps.fused_topk(perturb(i, q) if q.dtype == jnp.bfloat16 else q + (i % 3).astype(q.dtype),
                               db, N, K, scales=(s[0] if s else None))
        return jnp.sum(v) + idx[:, 0].sum().astype(jnp.float32)

    args = (q0, db) + ((scales,) if scales is not None else ())
    ta = bench(phase_a, *args, tag=f"A  blockmax ({db.dtype})")
    tab = bench(phase_ab, *args, tag=f"AB +select  ({db.dtype})")
    tabc = bench(full, *args, tag=f"ABC fused   ({db.dtype})")
    print(f"   tail: select {1e3*(tab-ta):.3f} ms, gather+final {1e3*(tabc-tab):.3f} ms")

    # gather alone, uniform random block ids
    rng = np.random.default_rng(0)
    kbp = ((K + ps.GATHER_G - 1) // ps.GATHER_G) * ps.GATHER_G
    bidx = jnp.asarray(rng.integers(0, NB, (Q, kbp)).astype(np.int32))
    tl2d = tl.reshape(NB, ps.BLOCK)
    qg = q0.astype(jnp.bfloat16) if scales is not None else q0

    def gath(i, qg, db, bidx, *s):
        sc = ps.gather_block_scores(qg, db, tl2d, qcap,
                                    (bidx + i) % NB, N,
                                    scales=(s[0] if s else None))
        return jnp.sum(sc[:, :8])

    gargs = (qg, db, bidx) + ((scales,) if scales is not None else ())
    tg = bench(gath, *gargs, tag=f"G  gather   ({db.dtype})")
    gb = Q * kbp * ps.BLOCK * D * bytes_ / 1e9
    print(f"   gather traffic {gb*1e3:.0f} MB -> {gb/tg:.0f} GB/s")


run_suite(db, q0, None, 2)

db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127).astype(jnp.int8))(db)
rs8 = jnp.full((N,), jnp.float32(1 / 40.0))
q8 = jnp.asarray(np.clip(np.asarray(q0, np.float32) * 124, -124, 124).astype(np.int8))
run_suite(db8, q8, rs8, 1)
