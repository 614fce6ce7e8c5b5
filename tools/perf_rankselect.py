"""Experiment: unordered exact top-k ID selection by pairwise rank vs
lax.top_k at the selection shapes the fused scan actually uses.

Most selections in fused_topk only need the SET of top-k ids (superblock
ids, block ids, candidate subblocks) — ordering is thrown away — yet
lax.top_k pays for a full sort. Rank selection: id s is in the top-k iff
rank(s) = #{j : (v_j, j) >lex (v_s, s)} < k — an O(W^2) pairwise
comparison that is pure VPU work, plus a cumsum compaction into [Q, k]
slots via one small one-hot contraction.

Usage: perf_rankselect.py [Q]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops import pallas_scan as ps

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REP = 32


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


@partial(jax.jit, static_argnames=("k",))
def rank_select_ids(x, k):
    """Unordered exact top-k ids of finite f32 x [Q, W], ties to lower id.
    Returns ids [Q, k] i32 (ascending by id, NOT by value)."""
    qn, w = x.shape
    idx = np.arange(w, dtype=np.int32)
    beats = jnp.logical_or(
        x[:, None, :] > x[:, :, None],
        jnp.logical_and(x[:, None, :] == x[:, :, None],
                        idx[None, None, :] < idx[None, :, None]))
    rank = jnp.sum(beats.astype(jnp.int32), axis=2)        # [Q, W]
    sel = rank < k
    pos = jnp.cumsum(sel.astype(jnp.int32), axis=1) - sel.astype(jnp.int32)
    oh = jnp.logical_and(sel[:, :, None],
                         pos[:, :, None] == np.arange(k)[None, None, :])
    ids = jnp.sum(oh.astype(jnp.float32) * idx[None, :, None].astype(jnp.float32),
                  axis=1)
    return ids.astype(jnp.int32)


def bench(fn, *args, rep=REP, tag=""):
    @jax.jit
    def repeated(*a):
        def body(i, acc):
            x = a[0] * (1.0 + i.astype(jnp.float32) * 1e-4)
            out = fn(x, *a[1:])
            return acc + jnp.sum(out[0][:1, :4].astype(jnp.float32)) \
                if isinstance(out, tuple) else \
                acc + jnp.sum(out[:1, :4].astype(jnp.float32))
        return jax.lax.fori_loop(0, rep, body, jnp.float32(0))

    np.asarray(repeated(*args))
    t = (min(timed(lambda: np.asarray(repeated(*args))) for _ in range(3))
         - RTT) / rep
    print(f"{tag:44s} {t*1e3:7.3f} ms")
    return t


rng = np.random.default_rng(0)
triv = jax.jit(lambda x: x + 1)
x0 = jnp.zeros((8,), jnp.float32)
np.asarray(triv(x0))
RTT = min(timed(lambda: np.asarray(triv(x0))) for _ in range(5))
print(f"# rtt {RTT*1e3:.1f} ms, Q={Q}")

for w, k in ((512, 101), (408, 101), (1632, 101), (3264, 101), (256, 100)):
    x = jnp.asarray(rng.standard_normal((Q, w)).astype(np.float32))
    bench(lambda v, k=k: jax.lax.top_k(v, k)[1], x, tag=f"lax.top_k      W={w} k={k}")
    bench(lambda v, k=k: ps._topk_finite(v, k)[1], x, tag=f"_topk_finite   W={w} k={k}")
    if w <= 2048:
        bench(lambda v, k=k: rank_select_ids(v, k), x,
              tag=f"rank_select    W={w} k={k}")

# correctness: same ID set as top_k
for w, k in ((512, 101), (408, 101), (1632, 101)):
    x = jnp.asarray(rng.standard_normal((Q, w)).astype(np.float32))
    a = np.asarray(rank_select_ids(x, k))
    b = np.asarray(jax.lax.top_k(x, k)[1])
    same = all(set(a[r]) == set(b[r]) for r in range(Q))
    print(f"set-equality W={w} k={k}: {same}")
