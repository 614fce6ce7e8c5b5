"""One-off: phase A grouped-RMW vs split clean-write BM layouts on the TPU,
plus the full fused_topk with the split layout end-to-end.

Usage: python tools/perf_split_bm.py [q=256] [dtype=int8]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

from _bench_util import bench
from merizo_search_tpu.ops import pallas_scan as ps

N, D, K = 1 << 24, 128, 100


def main():
    kw = dict(a.split("=") for a in sys.argv[1:])
    q_list = [int(x) for x in kw.get("q", "256").split(",")]
    dtype = kw.get("dtype", "int8")

    kd = jax.random.PRNGKey(0)
    dbf = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    if dtype == "int8":
        db = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                     .astype(jnp.int8))(dbf)
        scales = jnp.full((N,), np.float32(1 / 40.0))
        del dbf
    else:
        db, scales = dbf, None
    tl = jnp.zeros((N,), jnp.float32)

    for qn in q_list:
        if dtype == "int8":
            q = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8),
                                    (qn, 1)))
            sol = max(N * D / 819e9, 2.0 * N * qn * D / 394e12)
        else:
            q = db[:qn].astype(jnp.bfloat16) if dtype != "int8" else None
            sol = max(2 * N * D / 819e9, 2.0 * N * qn * D / 197e12)
        qcap = jnp.full((qn,), jnp.float32(np.inf))
        print(f"# Q={qn} {dtype}: SoL {sol*1e3:.2f} ms")

        for split in () if kw.get("full_only") else (False, True):
            def fa(i, q, d, split=split):
                qi = q + (i % 3).astype(q.dtype)
                bm, _ = ps.blockmax_scan(qi, d, N, tl, qcap, scales=scales,
                                         allow_split=split)
                sl = bm[:1, :, 0] if split else bm[:, :1, 0]
                return jnp.sum(sl)
            t = bench(fa, q, db, rep=5, inner=8,
                      tag=f"Q={qn} phaseA {'split' if split else 'grouped'}")
            print(f"#   -> {sol/t:.3f} of SoL")

        def ff(i, q, d):
            qi = q + (i % 3).astype(q.dtype)
            v, idx = ps.fused_topk(qi, d, N, K, scales=scales)
            return jnp.sum(v) + jnp.sum(idx[:, 0].astype(jnp.float32))
        t = bench(ff, q, db, rep=5, inner=8, tag=f"Q={qn} full fused_topk")
        print(f"#   -> {sol/t:.3f} of SoL")


if __name__ == "__main__":
    main()
