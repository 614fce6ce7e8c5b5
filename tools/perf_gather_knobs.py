"""One-off: sweep phase-C gather DMA knobs (NSLOTS x UNROLL) on the TPU.

perf_phases_bc.py puts the phase-C gather at 0.774 ms for Q=256, kb=102
int8 blocks (DMA floor 428 MB / 736 GB/s = 0.58 ms). NSLOTS controls how
many queries ahead DMAs are issued; UNROLL how many copies per dynamic
loop iteration.

Usage: python tools/perf_gather_knobs.py [slots=2,3,4] [unroll=4,6,8]
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

N, D, Q, K = 1 << 24, 128, 256, 100
BLOCK = ps.BLOCK


def main():
    kw = dict(a.split("=") for a in sys.argv[1:])
    slots = [int(x) for x in kw.get("slots", "2,3,4").split(",")]
    unrolls = [int(x) for x in kw.get("unroll", "4,6,8").split(",")]

    kd = jax.random.PRNGKey(0)
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    del db
    q8 = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8), (Q, 1)))
    scales = jnp.full((N,), np.float32(1 / 40.0))
    tl = jnp.zeros((N,), jnp.float32)
    qcap = jnp.full((Q,), jnp.float32(np.inf))
    nb = N // BLOCK
    tl2d = tl.reshape(nb, BLOCK)

    bm, sbm = ps.blockmax_scan(q8, db8, N, tl, qcap, scales=scales)
    sb_scale = scales.reshape(nb, BLOCK)[:, 0].reshape(bm.shape[1:])
    bidx, scale_sel = jax.jit(
        lambda bm, sbm: ps._select_blocks(bm, sbm, N, K, True,
                                          sb_scale=sb_scale))(bm, sbm)
    bidx = jax.block_until_ready(bidx)
    kb = bidx.shape[1]
    mb = Q * kb * BLOCK * D / 1e6
    print(f"# kb={kb}, gather bytes {mb:.0f} MB, floor @736GB/s "
          f"{mb/736e3*1e3:.3f} ms")

    for sl in slots:
        for un in unrolls:
            os.environ["MERIZO_GATHER_SLOTS"] = str(sl)
            os.environ["MERIZO_GATHER_UNROLL"] = str(un)
            ps.gather_block_scores_dma._clear_cache()

            def fn(i, q, db, bidx, scale_sel):
                qi = q + (i % 3).astype(jnp.int8)
                s = ps.gather_block_scores_dma(qi, db, tl2d, qcap, bidx, N,
                                               use_len=False, quantized=True,
                                               scale_sel=scale_sel)
                return jnp.sum(s[:, :8])
            bench(fn, q8, db8, bidx, scale_sel, rep=5, inner=16,
                  tag=f"slots={sl} unroll={un}")


if __name__ == "__main__":
    main()
