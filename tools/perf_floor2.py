"""One-off: parametric floor sweep for the fused scan (VERDICT r4 item 1).

Sweeps tile size / nslab / Q / dtype over the minimal dot and dot+reduce
kernels from perf_int8_floor plus the production phase A, to find the best
(tile, nslab) operating point before restructuring pallas_scan.

Usage: python tools/perf_floor2.py [q=256] [dtypes=int8,bf16]
       [tiles=32768,65536] [nslabs=2,4,8]
"""

import os
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

N, D = 1 << 24, 128
BLOCK = ps.BLOCK


def _mini_kernel(q_ref, db_ref, out_ref, *, tile, qt, nslab, reduce_mode):
    nbt = tile // BLOCK
    slab = tile // nslab
    nbt_s = slab // BLOCK
    nqt = q_ref.shape[0] // qt
    acc_t = jnp.int32 if db_ref.dtype == jnp.int8 else jnp.float32
    for j in range(nqt):
        qtile = q_ref[j * qt:(j + 1) * qt, :]
        parts = []
        for r in range(nslab):
            sub = db_ref[r * slab:(r + 1) * slab, :]
            s = jax.lax.dot_general(
                sub, qtile, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_t)            # [slab, qt]
            if reduce_mode == "none":
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


def mini_scan(q, db, tile, nslab, reduce_mode):
    qp, d = q.shape
    qt = min(qp, 128)
    nsteps = db.shape[0] // tile
    nbt = tile // BLOCK
    width = 8 if reduce_mode == "none" else nbt
    kernel = partial(_mini_kernel, tile=tile, qt=qt, nslab=nslab,
                     reduce_mode=reduce_mode)
    out = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qp, width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, qp, width), jnp.float32),
        compiler_params=ps._compiler_params(100 * 1024 * 1024),
    )(q, db)
    return out


def main():
    kw = dict(a.split("=") for a in sys.argv[1:])
    q_list = [int(x) for x in kw.get("q", "256").split(",")]
    dtypes = kw.get("dtypes", "int8").split(",")
    tiles = [int(x) for x in kw.get("tiles", "32768,65536").split(",")]
    nslabs = [int(x) for x in kw.get("nslabs", "2,4,8").split(",")]

    kd = jax.random.PRNGKey(0)
    dbf = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(dbf)

    for qn in q_list:
        for dt in dtypes:
            db = db8 if dt == "int8" else dbf
            if dt == "int8":
                q = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8),
                                        (qn, 1)))
                ops, rate = 1, 394e12
            else:
                q = dbf[:qn]
                ops, rate = 2, 197e12
            sol = max(N * D * ops / 819e9, 2.0 * N * qn * D / rate)
            print(f"# Q={qn} {dt}: SoL {sol*1e3:.2f} ms")
            for tile in tiles:
                for ns in nslabs:
                    if tile // ns < BLOCK or (tile // ns) % BLOCK:
                        continue
                    for mode in ("none", "reduce"):
                        def fn(i, q, d, mode=mode, ns=ns, tile=tile):
                            if dt == "int8":
                                qi = q + (i % 3).astype(jnp.int8)
                            else:
                                qi = q + (i % 3).astype(jnp.bfloat16)
                            o = mini_scan(qi, d, tile, ns, mode)
                            return jnp.sum(o[:, :1, :8])
                        t = bench(fn, q, db, rep=5, inner=8,
                                  tag=f"Q={qn} {dt} tile={tile} nslab={ns} "
                                      f"{'dot+reduce' if mode != 'none' else 'dot_only '}")
                        print(f"#   -> {sol/t:.3f} of SoL")


if __name__ == "__main__":
    main()
