"""One-off: split the fused-scan's post-kernel cost (phases B + C).

perf_int8_floor.py showed (Q=256, 16M x 128 int8):
    dot_only 3.11 ms | dot+reduce 3.22 | phaseA(prod) 3.64 | full 5.35
so ~1.7 ms — the whole gap to the 0.75-SoL target — is in phase B
(_select_blocks) and phase C (gather_block_scores_dma + final select).
This times each piece standalone on precomputed inputs.

Usage: python tools/perf_phases_bc.py
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp

from _bench_util import bench
from merizo_search_tpu.ops import pallas_scan as ps

N, D, Q, K = 1 << 24, 128, 256, 100
TILE = ps.DEFAULT_TILE
BLOCK = ps.BLOCK


def main():
    kq, kd = jax.random.split(jax.random.PRNGKey(0))
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    del db
    q8 = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8), (Q, 1)))
    scales = jnp.full((N,), np.float32(1 / 40.0))
    tl = jnp.zeros((N,), jnp.float32)
    qcap = jnp.full((Q,), jnp.float32(np.inf))

    nsteps = N // TILE
    nbt = TILE // BLOCK
    nb = N // BLOCK

    # precompute phase A outputs once (production split/step-major layout)
    bm, sbm = ps.blockmax_scan(q8, db8, N, tl, qcap, scales=scales,
                               allow_split=True)
    bm = jax.block_until_ready(bm)
    sb_scale = scales.reshape(nb, BLOCK)[:, 0].reshape(nsteps, nbt)

    use_sb = True

    @jax.jit
    def phase_b(i, bm, sbm):
        bidx, scale_sel = ps._select_blocks(
            bm + i.astype(jnp.float32) * 0.0, sbm, N, K, use_sb,
            sb_scale=sb_scale, step_major=True)
        return jnp.sum(bidx[:, :4].astype(jnp.float32)) + jnp.sum(
            scale_sel[:, :4])
    bench(phase_b, bm, sbm, rep=5, inner=16, tag="phase B (_select_blocks)")

    bidx, scale_sel = jax.jit(
        lambda bm, sbm: ps._select_blocks(bm, sbm, N, K, use_sb,
                                          sb_scale=sb_scale,
                                          step_major=True))(bm, sbm)
    bidx = jax.block_until_ready(bidx)
    tl2d = tl.reshape(nb, BLOCK)

    @jax.jit
    def phase_c_gather(i, q, db, bidx, scale_sel):
        qi = q + (i % 3).astype(jnp.int8)
        s = ps.gather_block_scores_dma(qi, db, tl2d, qcap, bidx, N,
                                       use_len=False, quantized=True,
                                       scale_sel=scale_sel)
        return jnp.sum(s[:, :8])
    bench(phase_c_gather, q8, db8, bidx, scale_sel, rep=5, inner=16,
          tag="phase C gather (dma)")

    scores = jax.jit(
        lambda q, db, b, sc: ps.gather_block_scores_dma(
            q, db, tl2d, qcap, b, N, use_len=False, quantized=True,
            scale_sel=sc))(q8, db8, bidx, scale_sel)
    scores = jax.block_until_ready(scores)

    @jax.jit
    def final_select(i, scores, bidx):
        v, sel = ps._topk_entries_capped(scores + i.astype(jnp.float32) * 0.0,
                                         K)
        idx = ps._gather_int(bidx, sel // BLOCK) * BLOCK + sel % BLOCK
        return jnp.sum(v[:, :4]) + jnp.sum(idx[:, :4].astype(jnp.float32))
    kbp = scores.shape[1] // BLOCK
    bidx_p = jnp.pad(bidx, ((0, 0), (0, kbp - bidx.shape[1])),
                     constant_values=-1) if kbp != bidx.shape[1] else bidx
    bench(final_select, scores, bidx_p, rep=5, inner=16,
          tag="final select (_topk_entries_capped + idx)")


if __name__ == "__main__":
    main()
