"""Microbench: where does _topk_entries time go, and do index-arithmetic
variants beat take_along_axis? Runs on the real TPU."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops import pallas_scan as ps

Q, K = 64, 100


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench(fn, *args, rep=32, tag=""):
    @jax.jit
    def repeated(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, rep, body, jnp.float32(0))
    _ = np.asarray(repeated(*args))
    total = min(timed(lambda: np.asarray(repeated(*args))) for _ in range(3))
    t = (total - RTT) / rep
    print(f"{tag:44s} {t*1e3:7.3f} ms")
    return t


triv = jax.jit(lambda x: x + 1)
_ = np.asarray(triv(jnp.zeros(8)))
RTT = min(timed(lambda: np.asarray(triv(jnp.zeros(8)))) for _ in range(5))
print(f"# rtt {RTT*1e3:.1f} ms")

rng = np.random.default_rng(0)

for W in (12800, 131072):
    x0 = jnp.asarray(rng.normal(size=(Q, W)).astype(np.float32))

    def cur(i, x):
        v, idx = ps._topk_entries(x + i.astype(jnp.float32) * 1e-6, K)
        return jnp.sum(v) + jnp.sum(idx[:, 0]).astype(jnp.float32)

    bench(cur, x0, tag=f"_topk_entries cur W={W}")

    def direct(i, x):
        v, idx = jax.lax.top_k(x + i.astype(jnp.float32) * 1e-6, K)
        return jnp.sum(v) + jnp.sum(idx[:, 0]).astype(jnp.float32)

    bench(direct, x0, tag=f"lax.top_k      W={W}")

    # pieces at this width
    def maxred(i, x):
        sb = (x + i.astype(jnp.float32) * 1e-6).reshape(Q, W // 32, 32)
        return jnp.sum(jnp.max(sb, axis=-1))

    bench(maxred, x0, tag=f"  max-reduce 32-wide")

    def taa(i, x):
        xx = x + i.astype(jnp.float32) * 1e-6
        sel = jnp.argsort(xx[:, :K], axis=1)  # [Q,K] plausible indices
        return jnp.sum(jnp.take_along_axis(xx, sel * (W // K), axis=1))

    bench(taa, x0, tag=f"  take_along_axis [Q,{W}] <- [Q,K]")

    def onehot_gather(i, x):
        xx = x + i.astype(jnp.float32) * 1e-6
        nsb = W // 32
        sb = xx.reshape(Q, nsb, 32)
        sm = jnp.max(sb, axis=-1)
        _, sbi = jax.lax.top_k(sm, K)
        oh = (sbi[:, :, None] == jnp.arange(nsb)[None, None, :]).astype(jnp.float32)
        cand = jnp.einsum("qkb,qbc->qkc", oh, sb,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(cand)

    bench(onehot_gather, x0, tag=f"  submax+topk+onehot-einsum")

    def isfin(i, x):
        xx = x + i.astype(jnp.float32) * 1e-6
        return jnp.sum(jnp.where(jnp.isfinite(xx), xx, -3.4e38))

    bench(isfin, x0, tag=f"  isfinite-where pass")
