"""Experiment: phase-A kernel with the per-tile work split into row
sub-slabs (dot / max-reduce interleaved at sub-slab granularity) so the
MXU matmul of slab r+1 can overlap the VPU block-max reduce of slab r.

Measures the phase-A scan time for bf16 and int8 at several slab counts
against the production kernel. Usage: perf_slab_interleave.py [Q] [tile]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merizo_search_tpu.ops import pallas_scan as ps

N = 1 << 24
D = 128
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else ps.DEFAULT_TILE
BLOCK = ps.BLOCK
REP = 16


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _kernel(nv_ref, q_ref, db_ref, *rest, tile, quantized, qt, sbw, nslab):
    if quantized:
        rs_ref, bm_ref, sbm_ref = rest
    else:
        bm_ref, sbm_ref = rest
    nbt = tile // BLOCK
    step = pl.program_id(0)
    gb = step * nbt + jax.lax.broadcasted_iota(jnp.int32, (1, nbt), 1)
    blk_valid = gb * BLOCK < nv_ref[0]
    nqt = q_ref.shape[0] // qt
    slab = tile // nslab
    nbt_s = slab // BLOCK
    for j in range(nqt):
        qtile = q_ref[j * qt:(j + 1) * qt, :]
        parts = []
        for r in range(nslab):
            sub = db_ref[r * slab:(r + 1) * slab, :]
            if quantized:
                s = jax.lax.dot_general(
                    sub, qtile, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                m = jnp.max(s.reshape(nbt_s, BLOCK, qt), axis=1)
                parts.append(m.astype(jnp.float32)
                             * rs_ref[r * nbt_s:(r + 1) * nbt_s, 0:1])
            else:
                s = jax.lax.dot_general(
                    sub, qtile, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                parts.append(jnp.max(s.reshape(nbt_s, BLOCK, qt), axis=1))
        bmt = jnp.concatenate(parts, axis=0).T            # [qt, nbt]
        bmt = jnp.where(blk_valid, jnp.maximum(bmt, np.float32(-3.4e38)),
                        np.float32(-3.4e38))
        bm_ref[j * qt:(j + 1) * qt, :] = bmt
        sb_lane = jax.lax.broadcasted_iota(jnp.int32, (1, sbw), 1)
        col = step % sbw
        contrib = jnp.where(sb_lane == col,
                            jnp.max(bmt, axis=1, keepdims=True),
                            float("-inf"))
        cur = sbm_ref[j * qt:(j + 1) * qt, :]
        sbm_ref[j * qt:(j + 1) * qt, :] = jnp.where(
            col == 0, contrib, jnp.maximum(cur, contrib))


@partial(jax.jit, static_argnames=("tile", "nslab"))
def scan_v2(q, db, tile=TILE, nslab=2, scales=None):
    qn, d = q.shape
    npad = db.shape[0]
    quantized = scales is not None
    qt = min(-(-qn // 8) * 8, ps.QTILE)
    qp = -(-qn // qt) * qt
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
    nsteps = npad // tile
    sbw = 128 if nsteps % 128 == 0 else nsteps
    kernel = partial(_kernel, tile=tile, quantized=quantized, qt=qt,
                     sbw=sbw, nslab=nslab)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray([N], jnp.int32), q, db]
    if quantized:
        in_specs.append(pl.BlockSpec((tile // BLOCK, BLOCK), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales.reshape(npad // BLOCK, BLOCK))
    nbt = tile // BLOCK
    bm, sbm = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((qp, nbt), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((qp, sbw), lambda i: (0, i // sbw),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((qp, npad // BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((qp, nsteps), jnp.float32)),
        compiler_params=ps._compiler_params(100 * 1024 * 1024),
    )(*args)
    return bm[:qn], sbm[:qn]


def main():
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    q0 = jax.random.normal(kq, (Q, D), jnp.bfloat16)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    rs8 = jnp.full((N,), jnp.float32(1 / 40.0))
    q8 = jnp.asarray(np.random.default_rng(0).integers(
        -124, 124, (Q, D), dtype=np.int8))
    tl = jnp.zeros((N,), jnp.float32)
    qcap = jnp.full((Q,), jnp.float32(np.inf))

    triv = jax.jit(lambda x: x + 1)
    np.asarray(triv(q0))
    rtt = min(timed(lambda: np.asarray(triv(q0))) for _ in range(5))
    print(f"# rtt {rtt*1e3:.1f} ms, Q={Q}, tile={TILE}")
    db_bytes = {False: N * D * 2, True: N * D}

    def bench(fn, *args, tag=""):
        @jax.jit
        def rep(*a):
            def body(i, acc):
                aa = list(a)
                aa[0] = (a[0] + (i % 3).astype(jnp.int8)
                         if a[0].dtype == jnp.int8 else
                         a[0] * (1.0 + i.astype(a[0].dtype) * a[0].dtype.type(1e-3)))
                bm, sbm = fn(*aa)
                return acc + jnp.sum(bm[:1, :8]) + jnp.sum(sbm[:1, :8])
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        np.asarray(rep(*args))
        t = (min(timed(lambda: np.asarray(rep(*args))) for _ in range(3))
             - rtt) / REP
        qz = args[0].dtype == jnp.int8
        print(f"{tag:34s} {t*1e3:7.3f} ms ({db_bytes[qz]/t/1e9:5.0f} GB/s)")
        return t

    # production baseline
    bench(lambda qq, dbv: ps.blockmax_scan(qq, dbv, N, tl, qcap, tile=TILE),
          q0, db, tag="bf16 baseline blockmax")
    for ns in (2, 4, 8):
        bench(partial(scan_v2, tile=TILE, nslab=ns), q0, db,
              tag=f"bf16 slab x{ns}")
    bench(lambda qq, dbv: ps.blockmax_scan(qq, dbv, N, tl, qcap, tile=TILE,
                                           scales=rs8),
          q8, db8, tag="int8 baseline blockmax")
    for ns in (2, 4, 8):
        bench(partial(scan_v2, tile=TILE, nslab=ns, scales=rs8), q8, db8,
              tag=f"int8 slab x{ns}")

    # correctness spot check vs production
    bm0, sb0 = ps.blockmax_scan(q0, db, N, tl, qcap, tile=TILE)
    bm1, sb1 = scan_v2(q0, db, tile=TILE, nslab=4)
    print("bf16 max|dBM| =", float(jnp.max(jnp.abs(bm0 - bm1))),
          " max|dSBM| =", float(jnp.max(jnp.abs(sb0 - sb1))))


if __name__ == "__main__":
    main()
