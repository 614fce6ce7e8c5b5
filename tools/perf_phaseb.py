"""Phase-B breakdown at production shapes: where do the ~2 ms of block
selection go at Q=256, N=16M?

Stages (mirrors fused_topk's phase B exactly):
  S1  _topk_finite(SBM [Q,512], 101)            superblock select
  S2  one-hot einsum BM-slab gather             cand_bm [Q,102,256]
  S3  _topk_finite(cand [Q,26112], 101)         block select
  S4  _gather_int id arithmetic                 bidx reconstruction
  ALL composed phase B (S1..S4 fused in one jit)

Usage: PYTHONPATH=/root/repo python tools/perf_phaseb.py [q]
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
N = 1 << 24
TILE = ps.DEFAULT_TILE
NB = N // ps.BLOCK            # 131072
NBT = TILE // ps.BLOCK        # 256
NSB = N // TILE               # 512
K = 100
REP = 16


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench(fn, *args, rep=REP, tag=""):
    @jax.jit
    def repeated(*a):
        def body(i, acc):
            x = a[0] * (1.0 + i.astype(jnp.float32) * 1e-6)
            out = fn(x, *a[1:])
            while isinstance(out, tuple):
                out = out[0]
            return acc + jnp.sum(out[:1, :2].astype(jnp.float32))
        return jax.lax.fori_loop(0, rep, body, jnp.float32(0))

    np.asarray(repeated(*args))
    t = (min(timed(lambda: np.asarray(repeated(*args))) for _ in range(3))
         - RTT) / rep
    print(f"{tag:52s} {t*1e3:7.3f} ms")
    return t


rng = np.random.default_rng(0)
triv = jax.jit(lambda x: x + 1)
x0 = jnp.zeros((8,), jnp.float32)
np.asarray(triv(x0))
RTT = min(timed(lambda: np.asarray(triv(x0))) for _ in range(5))
print(f"# rtt {RTT*1e3:.1f} ms, Q={Q}, NB={NB}, NSB={NSB}, NBT={NBT}")

bm = jnp.asarray(rng.standard_normal((Q, NB)).astype(np.float32))
sbm = jnp.max(bm.reshape(Q, NSB, NBT), axis=2)
sbi = np.asarray(jax.lax.top_k(sbm, K + 1)[1], np.int32)
sbi = jnp.asarray(np.concatenate(
    [sbi, np.zeros((Q, 1), np.int32)], axis=1))          # + straddle col
cand = jnp.asarray(rng.standard_normal((Q, (K + 2) * NBT)).astype(np.float32))

ksb = K + 1

bench(lambda s: ps._topk_finite(s, ksb), sbm, tag=f"S1 topk SBM [{Q},{NSB}]")


def s2(bm_, sbi_):
    onehot = (sbi_[:, :, None] == np.arange(NSB)[None, None, :]
              ).astype(jnp.float32)
    return jnp.einsum("qks,qsb->qkb", onehot, bm_.reshape(Q, NSB, NBT),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


bench(s2, bm, sbi, tag=f"S2 einsum BM slab gather [{Q},{ksb+1},{NBT}]")
bench(lambda c: ps._topk_finite(c, K + 1), cand,
      tag=f"S3 topk cand [{Q},{(K+2)*NBT}]")
bsel = jnp.asarray(rng.integers(0, (K + 2) * NBT, (Q, K + 1), dtype=np.int32))
bench(lambda s, b: ps._gather_int(s, b // NBT) * NBT + b % NBT,
      sbi.astype(jnp.float32), bsel, tag="S4 gather_int id arithmetic")


def phase_b(bm_, sbm_, nv):
    qp = bm_.shape[0]
    straddle = jnp.minimum(nv // ps.BLOCK, NB - 1)
    _, sbi_ = ps._topk_finite(sbm_, ksb)
    ssb = straddle // NBT
    sbi_ = jnp.where(sbi_ == ssb, -1, sbi_)
    sbi_ = jnp.concatenate([sbi_, jnp.broadcast_to(ssb, (qp, 1))], axis=1)
    onehot = (sbi_[:, :, None] == np.arange(NSB)[None, None, :]
              ).astype(jnp.float32)
    cand_bm = jnp.einsum("qks,qsb->qkb", onehot, bm_.reshape(qp, NSB, NBT),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    cand_bm = jnp.where(sbi_[:, :, None] < 0, ps.NEG_CAP, cand_bm)
    _, bsel_ = ps._topk_finite(cand_bm.reshape(qp, (ksb + 1) * NBT), K + 1)
    bidx = ps._gather_int(sbi_, bsel_ // NBT) * NBT + bsel_ % NBT
    return jnp.where(bidx < 0, -1, bidx).astype(jnp.float32)


nv = jnp.asarray(N - 7, jnp.int32)
bench(phase_b, bm, sbm, nv, tag="ALL phase B composed")
