"""One-off: decompose phase B (_select_blocks, use_sb path) into its six
sub-steps and time each standalone on the TPU, plus the final select's
internals. Identifies which of the ~0.7 ms (Q=256) is sorts, one-hot
builds, einsums, or the scale path.

Usage: python tools/perf_phaseb_detail.py [q=256]
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
TILE = ps.DEFAULT_TILE
BLOCK = ps.BLOCK


def main():
    kw = dict(a.split("=") for a in sys.argv[1:])
    Q = int(kw.get("q", "256"))

    nsteps = N // TILE      # 512
    nbt = TILE // BLOCK     # 256
    nb = N // BLOCK
    ksb = min(K + 1, nsteps)
    kb = min(K + 1, nb)

    rng = np.random.default_rng(0)
    # synthetic phase-A outputs (values only matter for ordering)
    bm = jnp.asarray(rng.normal(size=(nsteps, Q, nbt)).astype(np.float32))
    sbm = jnp.asarray(np.max(np.asarray(bm), axis=2).T.copy())  # [Q, nsteps]
    sb_scale = jnp.asarray(
        rng.uniform(0.01, 0.05, size=(nsteps, nbt)).astype(np.float32))

    # -- step 1: superblock top-k (sort of [Q, 512] -> 101)
    def s1(i, sbm):
        _, sbi = ps._topk_finite(sbm + i.astype(jnp.float32) * 0.0, ksb)
        return jnp.sum(sbi[:, :4].astype(jnp.float32))
    bench(s1, sbm, rep=5, inner=16, tag="B1 topk(sbm [Q,512] -> 101)")

    _, sbi0 = jax.jit(lambda s: ps._topk_finite(s, ksb))(sbm)
    sbi0 = jnp.concatenate(
        [sbi0, jnp.zeros((Q, 1), jnp.int32)], axis=1)  # [Q, ksb+1]
    sbi0 = jax.block_until_ready(sbi0)

    # -- step 2: one-hot build [Q, ksb+1, 512]
    def s2(i, sbi):
        oh = ((sbi + i * 0)[:, :, None] ==
              np.arange(nsteps)[None, None, :]).astype(jnp.float32)
        return jnp.sum(oh[:, :2, :2])
    bench(s2, sbi0, rep=5, inner=16, tag="B2 one-hot build [Q,102,512]")

    oh0 = jax.block_until_ready(jax.jit(
        lambda s: (s[:, :, None] == np.arange(nsteps)[None, None, :]
                   ).astype(jnp.float32))(sbi0))

    # -- step 3: cand_bm einsum (step-major rhs)
    def s3(i, oh, bm):
        c = jnp.einsum("qks,sqb->qkb", oh + i.astype(jnp.float32) * 0.0, bm,
                       preferred_element_type=jnp.float32,
                       precision=ps.ONEHOT_PRECISION)
        return jnp.sum(c[:, :2, :2])
    bench(s3, oh0, bm, rep=5, inner=16, tag="B3 cand_bm einsum qks,sqb")

    cand0 = jax.block_until_ready(jax.jit(
        lambda oh, bm: jnp.einsum("qks,sqb->qkb", oh, bm,
                                  preferred_element_type=jnp.float32,
                                  precision=ps.ONEHOT_PRECISION))(oh0, bm))

    # -- step 4: block top-k over the [Q, 102*256] candidates
    def s4(i, cand):
        _, bsel = ps._topk_finite(
            (cand + i.astype(jnp.float32) * 0.0).reshape(Q, (ksb + 1) * nbt),
            kb)
        return jnp.sum(bsel[:, :4].astype(jnp.float32))
    bench(s4, cand0, rep=5, inner=16, tag="B4 topk(cand [Q,26112] -> 101)")

    _, bsel0 = jax.jit(lambda c: ps._topk_finite(
        c.reshape(Q, (ksb + 1) * nbt), kb))(cand0)
    bsel0 = jax.block_until_ready(bsel0)

    # -- step 5: slot -> global id arithmetic (gather_int over sbi)
    def s5(i, sbi, bsel):
        slot = (bsel + i * 0) // nbt
        bidx = ps._gather_int(sbi, slot) * nbt + bsel % nbt
        return jnp.sum(bidx[:, :4].astype(jnp.float32))
    bench(s5, sbi0, bsel0, rep=5, inner=16, tag="B5 gather_int slot->bidx")

    # -- step 6: the scale path (cand_sc einsum + subblock gather + lo_oh)
    def s6(i, oh, bsel):
        cand_sc = jnp.einsum("qks,sb->qkb", oh + i.astype(jnp.float32) * 0.0,
                             sb_scale,
                             preferred_element_type=jnp.float32,
                             precision=ps.ONEHOT_PRECISION)
        slot = bsel // nbt
        picked = ps._gather_subblocks(cand_sc, slot)
        lo_oh = (bsel[:, :, None] % nbt ==
                 np.arange(nbt)[None, None, :]).astype(jnp.float32)
        scale_sel = jnp.sum(picked * lo_oh, axis=2)
        return jnp.sum(scale_sel[:, :4])
    bench(s6, oh0, bsel0, rep=5, inner=16, tag="B6 scale path (full)")

    # ---- final select internals on [Q, 13056]
    W = (kb + 1) * BLOCK
    sc = jnp.asarray(rng.normal(size=(Q, W)).astype(np.float32))

    def f1(i, sc):
        v, sel = ps._topk_finite(sc + i.astype(jnp.float32) * 0.0, K)
        return jnp.sum(v[:, :4]) + jnp.sum(sel[:, :4].astype(jnp.float32))
    bench(f1, sc, rep=5, inner=16, tag=f"F1 topk_finite [Q,{W}] -> {K}")

    # the two direct lax.top_k sorts inside it, isolated
    x512 = jnp.asarray(rng.normal(size=(Q, 512)).astype(np.float32))
    def f2(i, x):
        v, idx = jax.lax.top_k(x + i.astype(jnp.float32) * 0.0, 101)
        return jnp.sum(v[:, :4])
    bench(f2, x512, rep=5, inner=16, tag="F2 raw lax.top_k [Q,512] k=101")

    x816 = jnp.asarray(rng.normal(size=(Q, 816)).astype(np.float32))
    def f3(i, x):
        v, idx = jax.lax.top_k(x + i.astype(jnp.float32) * 0.0, 100)
        return jnp.sum(v[:, :4])
    bench(f3, x816, rep=5, inner=16, tag="F3 raw lax.top_k [Q,816] k=100")

    xg = jnp.asarray(
        rng.integers(0, 1632, size=(Q, K)).astype(np.int32))
    src = jnp.asarray(rng.integers(0, 1632, size=(Q, 1632)).astype(np.int32))
    def f4(i, src, sel):
        return jnp.sum(ps._gather_int(src, (sel + i * 0) % 1632)[:, :4]
                       .astype(jnp.float32))
    bench(f4, src, xg, rep=5, inner=16, tag="F4 _gather_int [Q,1632] flat oh")


if __name__ == "__main__":
    main()
