"""One-off: locate the int8 fused-scan bottleneck (VERDICT r3 item 1).

Times, on the live TPU at Q=256 over a 16M x 128 int8 DB:
  dot_only   minimal Pallas kernel: the int8 MXU matmul per tile, block
             maxima NOT computed (writes one 8-sublane score slice per
             step so Mosaic keeps the dot) -> the MXU+HBM floor actually
             achievable with this grid/BlockSpec structure.
  dot_reduce dot + sublane block-max reduce, flat per-step BM write,
             no SBM / no grouped one-hot RMW -> isolates the reduce cost.
  phaseA     production blockmax_scan (grouped BM + SBM one-hot RMW).
  full       production fused_topk (adds phases B+C).

Usage: python tools/perf_int8_floor.py [nslab ...]
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _bench_util import bench
from merizo_search_tpu.ops import pallas_scan as ps

N, D, Q = 1 << 24, 128, 256
TILE = ps.DEFAULT_TILE
BLOCK = ps.BLOCK


def _mini_kernel(q_ref, db_ref, out_ref, *, tile, qt, nslab, reduce_mode):
    nbt = tile // BLOCK
    slab = tile // nslab
    nbt_s = slab // BLOCK
    nqt = q_ref.shape[0] // qt
    for j in range(nqt):
        qtile = q_ref[j * qt:(j + 1) * qt, :]
        parts = []
        for r in range(nslab):
            sub = db_ref[r * slab:(r + 1) * slab, :]
            s = jax.lax.dot_general(
                sub, qtile, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)       # [slab, qt]
            if reduce_mode == "none":
                # keep only an 8-sublane slice (cheap); forces the dot
                parts.append(s[0:8, :].astype(jnp.float32))
            else:
                s = s.reshape(nbt_s, BLOCK, qt)
                parts.append(jnp.max(s, axis=1).astype(jnp.float32))
        if reduce_mode == "none":
            acc = parts[0]
            for p in parts[1:]:
                acc = jnp.maximum(acc, p)
            out_ref[0, j * qt:(j + 1) * qt, 0:8] = acc.T
        else:
            bmt = jnp.concatenate(parts, axis=0).T      # [qt, nbt]
            out_ref[0, j * qt:(j + 1) * qt, :] = bmt


def mini_scan(q, db, nslab, reduce_mode):
    qp, d = q.shape
    qt = min(qp, 128)
    nsteps = db.shape[0] // TILE
    nbt = TILE // BLOCK
    width = 8 if reduce_mode == "none" else nbt
    kernel = partial(_mini_kernel, tile=TILE, qt=qt, nslab=nslab,
                     reduce_mode=reduce_mode)
    out = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qp, width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, qp, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, db)
    return out


def main():
    nslabs = [int(x) for x in sys.argv[1:]] or [4]
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    del db
    q8 = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8), (Q, 1)))
    scales = jnp.full((N,), np.float32(1 / 40.0))
    tl = jnp.zeros((N,), jnp.float32)
    qcap = jnp.full((Q,), jnp.float32(np.inf))

    sol_hbm = N * D / 819e9
    sol_mxu = 2.0 * N * Q * D / 394e12
    print(f"# SoL: hbm {sol_hbm*1e3:.2f} ms, int8 mxu {sol_mxu*1e3:.2f} ms")

    for ns in nslabs:
        for mode in ("none", "reduce"):
            def fn(i, q, d, mode=mode, ns=ns):
                qi = q + (i % 3).astype(jnp.int8)
                o = mini_scan(qi, d, ns, mode)
                return jnp.sum(o[:, :1, :8])
            t = bench(fn, q8, db8, rep=5, inner=8,
                      tag=f"nslab={ns} dot{'+reduce' if mode != 'none' else '_only'}")

    import os
    for ns in nslabs:
        os.environ["MERIZO_NSLAB"] = str(ns)
        ps.blockmax_scan._clear_cache()

        def fa(i, q, d):
            qi = q + (i % 3).astype(jnp.int8)
            bm, _ = ps.blockmax_scan(qi, d, N, tl, qcap, scales=scales)
            return jnp.sum(bm[:, :1, :8])
        bench(fa, q8, db8, rep=5, inner=8, tag=f"nslab={ns} phaseA(prod)")

    def ff(i, q, d):
        qi = q + (i % 3).astype(jnp.int8)
        v, idx = ps.fused_topk(qi, d, N, 100, scales=scales)
        return jnp.sum(v) + jnp.sum(idx[:, 0].astype(jnp.float32))
    bench(ff, q8, db8, rep=5, inner=8, tag="full fused_topk(prod)")


if __name__ == "__main__":
    main()
