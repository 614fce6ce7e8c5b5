"""One-off: does ascending-address DMA order help the phase-C gather?

Sorts each query's selected block ids before gather_block_scores_dma and
compares against score-ordered (as produced by phase B) ids. Also probes
the DMA floor with FULLY CONTIGUOUS ids (best case) to bound what order
can buy.

Usage: python tools/perf_gather_sorted.py [q=256]
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
BLOCK = ps.BLOCK


def main():
    kw = dict(a.split("=") for a in sys.argv[1:])
    Q = int(kw.get("q", "256"))

    kd = jax.random.PRNGKey(0)
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(kd)
    db8 = jax.jit(lambda d: jnp.clip(d * jnp.bfloat16(40), -127, 127)
                  .astype(jnp.int8))(db)
    del db
    q8 = jnp.asarray(np.tile(np.arange(-64, 64, dtype=np.int8), (Q, 1)))
    nb = N // BLOCK
    tl2d = jnp.zeros((nb, BLOCK), jnp.float32)
    qcap = jnp.full((Q,), jnp.float32(np.inf))

    rng = np.random.default_rng(0)
    kb = K + 2
    # random ids mimic phase-B output order (score-ordered = random addr)
    bidx_np = np.stack([rng.choice(nb, size=kb, replace=False)
                        for _ in range(Q)]).astype(np.int32)
    scale_np = rng.uniform(0.01, 0.05, size=(Q, kb)).astype(np.float32)

    cases = {
        "random order (phase-B like)": bidx_np,
        "ascending per query": np.sort(bidx_np, axis=1),
        "contiguous (best case)": (np.arange(kb)[None, :]
                                   + (np.arange(Q)[:, None] * kb)
                                   ).astype(np.int32) % nb,
    }
    for tag, bnp in cases.items():
        bidx = jnp.asarray(bnp)
        ss = jnp.asarray(scale_np)

        def f(i, q, d, b, sc):
            qi = q + (i % 3).astype(jnp.int8)
            s = ps.gather_block_scores_dma(qi, d, tl2d, qcap, b, N,
                                           use_len=False, quantized=True,
                                           scale_sel=sc)
            return jnp.sum(s[:, :8])
        bench(f, q8, db8, bidx, ss, rep=5, inner=8, tag=tag)

    # in-graph sort cost (what the production path would add)
    bidx = jnp.asarray(bidx_np)
    ss = jnp.asarray(scale_np)

    def g(i, b, sc):
        bs, scs = jax.lax.sort_key_val(b + i * 0, sc, dimension=1)
        return jnp.sum(bs[:, :4].astype(jnp.float32)) + jnp.sum(scs[:, :4])
    bench(g, bidx, ss, rep=5, inner=8, tag="sort_key_val [Q,102] cost")


if __name__ == "__main__":
    main()
