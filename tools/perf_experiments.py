"""One-off experiments on the real TPU: tile size and a cumulative
breakdown of the fused_topk pipeline (each stage timed as A+...+stage with
real data flowing through, so diffs are true stage costs).

Usage: python tools/perf_experiments.py [Q] [tile]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from merizo_search_tpu.ops import pallas_scan as ps

N = 1 << 24
D = 128
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else ps.DEFAULT_TILE
K = 100
REP = 8


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench(fn, *args, rep=REP, tag="", prev=(None,)):
    @jax.jit
    def repeated(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, rep, body, jnp.float32(0))

    _ = np.asarray(repeated(*args))
    total = min(timed(lambda: np.asarray(repeated(*args))) for _ in range(3))
    t = (total - RTT) / rep
    d = f"  (+{(t-prev[0])*1e3:6.3f})" if prev[0] is not None else ""
    print(f"{tag:34s} {t*1e3:7.3f} ms{d}")
    prev[0] = t
    return t


kq, kd = jax.random.split(jax.random.PRNGKey(0))
db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
q0 = jax.random.normal(kq, (Q, D), jnp.float32)
q0 = (q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)).astype(jnp.bfloat16)
tl = jnp.zeros((N,), jnp.float32)

triv = jax.jit(lambda x: x + 1)
_ = np.asarray(triv(q0))
RTT = min(timed(lambda: np.asarray(triv(q0))) for _ in range(5))
print(f"# rtt {RTT*1e3:.1f} ms, N={N}, Q={Q}, K={K}, tile={TILE}")

db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127).astype(jnp.int8))(db)
rs8 = jnp.full((N,), jnp.float32(1 / 40.0))
q8 = jnp.asarray(np.clip(np.asarray(q0, np.float32) * 124, -124, 124).astype(np.int8))


def perturb(i, q):
    if q.dtype == jnp.int8:
        return q + (i % 3).astype(jnp.int8)
    return q * (1.0 + i.astype(q.dtype) * q.dtype.type(1e-3))


def stages(q, dbv, scales, tag):
    """Cumulative pipeline stages mirroring fused_topk's body."""
    npad = dbv.shape[0]
    nb = npad // ps.BLOCK
    nbt = TILE // ps.BLOCK
    nsb = npad // TILE
    k = K
    qn = q.shape[0]
    sub = 16 if q.dtype == jnp.bfloat16 else 32
    qp = ((qn + sub - 1) // sub) * sub
    qcap = jnp.full((qp,), jnp.float32(np.inf))

    def upto(stage):
        def fn(i, q, dbv, *s):
            qq = perturb(i, q)
            if qp != qn:
                qq = jnp.pad(qq, ((0, qp - qn), (0, 0)))
            bm, sbm = ps.blockmax_scan(qq, dbv, N, tl, qcap, tile=TILE,
                                       scales=(s[0] if s else None))
            if stage == 0:
                return jnp.sum(bm[..., :1, :8].astype(jnp.float32))
            straddle = jnp.minimum(jnp.asarray(N, jnp.int32) // ps.BLOCK, nb - 1)
            ksb = min(k + 1, nsb)
            _, sbi = ps._topk_finite(sbm, ksb)
            if stage == 1:
                return (jnp.sum(sbi).astype(jnp.float32)
                        + jnp.sum(bm[..., :1, :8].astype(jnp.float32)))
            ssb = straddle // nbt
            sbi = jnp.where(sbi == ssb, -1, sbi)
            sbi = jnp.concatenate([sbi, jnp.broadcast_to(ssb, (qp, 1))], axis=1)
            onehot = (sbi[:, :, None] == jnp.arange(nsb)[None, None, :]
                      ).astype(jnp.float32)
            cand_bm = jnp.einsum("qks,qsb->qkb", onehot,
                                 bm.reshape(qp, nsb, nbt),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
            cand_bm = jnp.where(sbi[:, :, None] < 0, ps.NEG_CAP, cand_bm)
            if stage == 2:
                return jnp.sum(jnp.maximum(cand_bm[:, :, :], -1.0))
            kb = min(k + 1, nb)
            _, bsel = ps._topk_finite(cand_bm.reshape(qp, (ksb + 1) * nbt), kb)
            bidx = ps._gather_int(sbi, bsel // nbt) * nbt + bsel % nbt
            bidx = jnp.where(bidx < 0, -1, bidx)
            bidx = jnp.where(bidx == straddle, -1, bidx)
            bidx = jnp.concatenate(
                [bidx, jnp.broadcast_to(straddle, (qp, 1))], axis=1)
            if stage == 3:
                return jnp.sum(bidx).astype(jnp.float32)
            scores = ps.gather_block_scores_dma(
                qq, dbv, tl.reshape(nb, ps.BLOCK), qcap, bidx, N,
                quantized=bool(s),
                scale_sel=(ps._gather_blockvec_f32(
                    s[0].reshape(nb, ps.BLOCK)[:, 0], jnp.maximum(bidx, 0))
                    if s else None))
            if stage == 4:
                return jnp.sum(scores[:, :8])
            kbp = scores.shape[1] // ps.BLOCK
            if kbp != bidx.shape[1]:
                bidx = jnp.pad(bidx, ((0, 0), (0, kbp - bidx.shape[1])),
                               constant_values=-1)
            v, sel = ps._topk_entries(scores, k)
            idx = ps._gather_int(bidx, sel // ps.BLOCK) * ps.BLOCK + sel % ps.BLOCK
            return jnp.sum(v) + jnp.sum(idx[:, 0]).astype(jnp.float32)
        return fn

    names = ["A blockmax", "+sbm select", "+slab gather", "+cand select",
             "+phaseC gather", "+final topk"]
    prev = [None]
    args = (q, dbv) + (() if scales is None else (scales,))
    for st, nm in enumerate(names):
        bench(upto(st), *args, tag=f"{tag} {nm}", prev=prev)


stages(q0, db, None, "bf16")
stages(q8, db8, rs8, "int8")
