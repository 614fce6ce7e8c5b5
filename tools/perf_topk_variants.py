"""One-off: tune the recursive cover select's level schedule on the TPU.

Benches _topk_finite against parametrized variants (first-level subblock
width, direct-sort threshold) at the two production shapes:
  B4: [Q, 26112] k=101   (block select from gathered superblock maxima)
  F1: [Q, 13056] k=100   (final select over phase-C rescored candidates)

Usage: python tools/perf_topk_variants.py [q=256]
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


def topk_var(x, k, sub0, direct_w):
    """Cover select with a fixed first-level subblock width `sub0` and a
    direct-sort cutoff `direct_w` (recursion falls back to _topk_finite)."""
    qn, w = x.shape
    if w <= direct_w or w % sub0:
        v, i = jax.lax.top_k(x, min(k, w))
        return v, i.astype(jnp.int32)
    nsb = w // sub0
    sb = x.reshape(qn, nsb, sub0)
    sm = jnp.max(sb, axis=-1)
    kk = min(k, nsb)
    _, sbi = ps._topk_finite(sm, kk)
    cand = ps._gather_subblocks(sb, sbi)
    v, sel = ps._topk_finite(cand.reshape(qn, kk * sub0), k)
    slot = sel // sub0
    src_sb = ps._gather_int(sbi, slot)
    idx = src_sb * sub0 + sel % sub0
    return v, idx.astype(jnp.int32)


def main():
    kw = dict(a.split("=") for a in sys.argv[1:])
    Q = int(kw.get("q", "256"))
    rng = np.random.default_rng(0)

    for w, k, tag in [(26112, 101, "B4"), (13056, 100, "F1")]:
        x = jnp.asarray(rng.normal(size=(Q, w)).astype(np.float32))

        def base(i, x, k=k):
            v, idx = ps._topk_finite(x + i.astype(jnp.float32) * 0.0, k)
            return jnp.sum(v[:, :4]) + jnp.sum(idx[:, :4].astype(jnp.float32))
        bench(base, x, rep=5, inner=16, tag=f"{tag} baseline _topk_finite")

        for sub0, dw in [(16, 256), (32, 256), (16, 2048), (32, 2048),
                         (64, 2048), (8, 2048)]:
            def f(i, x, k=k, sub0=sub0, dw=dw):
                v, idx = topk_var(x + i.astype(jnp.float32) * 0.0, k, sub0, dw)
                return jnp.sum(v[:, :4]) + jnp.sum(
                    idx[:, :4].astype(jnp.float32))
            bench(f, x, rep=5, inner=16,
                  tag=f"{tag} sub0={sub0} direct_w={dw}")

        # sanity: exact agreement with baseline on values
        vb, ib = jax.jit(partial(ps._topk_finite, k=k))(x)
        for sub0, dw in [(16, 2048), (32, 2048)]:
            vv, iv = jax.jit(partial(topk_var, k=k, sub0=sub0, direct_w=dw))(x)
            assert np.allclose(np.asarray(vb), np.asarray(vv)), (sub0, dw)


if __name__ == "__main__":
    main()
