"""Sweep fused-scan tile size (and nslab) for bf16 and int8 on the real TPU.

The per-grid-step fixed costs (DMA issue, Mosaic step dispatch, revisit
bookkeeping for the SBM/BM one-hot writes) are amortised over the tile, so
bigger tiles cut step count — bounded by the double-buffered VMEM budget
(2 tiles + the [slab, qt] score block). This sweeps tile x nslab for
phase A alone and the full fused_topk at a given query batch.

Usage: python tools/perf_tile.py [n_log2=24] [Q=256]
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

from _bench_util import bench
from merizo_search_tpu.ops import pallas_scan as ps

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 24)
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
D, K = 128, 100

kq, kd = jax.random.split(jax.random.PRNGKey(0))
db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
q0 = jax.random.normal(kq, (Q, D), jnp.float32)
q0 = (q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)).astype(jnp.bfloat16)
db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
              .astype(jnp.int8))(db)
rs8 = jnp.full((N,), jnp.float32(1 / 40.0))
q8 = jnp.asarray(np.clip(np.asarray(q0, np.float32) * 124,
                         -124, 124).astype(np.int8))
tl = jnp.zeros((N,), jnp.float32)
qcap = jnp.full((Q,), jnp.float32(np.inf))


def a_only(tile, quant):
    def fn(i, q, d, *s):
        qq = q + (i % 3).astype(q.dtype) if quant else \
            q * (1.0 + i.astype(q.dtype) * q.dtype.type(1e-3))
        bm, sbm = ps.blockmax_scan(qq, d, N, tl, qcap, tile=tile,
                                   scales=(s[0] if s else None))
        return jnp.sum(sbm[:, :8])
    return fn


def full(tile, quant):
    def fn(i, q, d, *s):
        qq = q + (i % 3).astype(q.dtype) if quant else \
            q * (1.0 + i.astype(q.dtype) * q.dtype.type(1e-3))
        v, idx = ps.fused_topk(qq, d, N, K, tile=tile,
                               scales=(s[0] if s else None))
        return jnp.sum(v) + jnp.sum(idx[:, 0].astype(jnp.float32))
    return fn


for quant, tag, args, bytes_ in ((False, "bf16", (q0, db), 2),
                                 (True, "int8", (q8, db8, rs8), 1)):
    for tile in (32768, 65536, 131072):
        if N % tile:
            continue
        for nslab in ((2, 4) if not quant else (4, 8)):
            os.environ["MERIZO_NSLAB"] = str(nslab)
            try:
                t = bench(a_only(tile, quant), *args, rep=5, inner=8)
            except Exception as e:  # VMEM overflow etc.
                print(f"{tag} A    tile={tile:6d} nslab={nslab}: "
                      f"{type(e).__name__}")
                continue
            print(f"{tag} A    tile={tile:6d} nslab={nslab}: {t*1e3:7.3f} ms "
                  f"({N*D*bytes_/t/1e9:6.1f} GB/s)")
        os.environ["MERIZO_NSLAB"] = "0"
        try:
            t = bench(full(tile, quant), *args, rep=5, inner=8)
        except Exception as e:
            print(f"{tag} full tile={tile:6d}: {type(e).__name__}")
            continue
        print(f"{tag} full tile={tile:6d}: {t*1e3:7.3f} ms "
              f"({Q/t:8.0f} q/s)")
