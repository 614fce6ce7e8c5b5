"""IVF (inverted-file) index: sublinear approximate search on TPU.

The flat scan reads every DB byte per query batch — exact, bandwidth-bound.
This IVF trades a little recall for touching only `nprobe/nlist` of the DB:

- **Build** (host + device): k-means centroids over a training sample
  (Lloyd iterations as jitted matmuls), then a *balanced* assignment that
  forces every cluster to exactly C = Npad/nlist rows (rows go to their
  best cluster in affinity order; full clusters spill to the next choice).
  The DB is permuted so each cluster is a contiguous block-aligned slab.
- **Query** (device): one tiny matmul scores the centroids, top-nprobe
  clusters per query become 128-row block ids, and the *existing* fused
  machinery finishes the job — the scalar-prefetch gather kernel fetches
  exactly those slabs and the recursive cover select takes the exact top-k
  of everything probed. IVF search is literally "phase B swapped for a
  centroid probe" on top of ops/pallas_scan.

Equal-size clusters are what make this TPU-native: no ragged lists, no
per-cluster control flow — a probe is a fixed-shape gather. (faiss-style
IVF with ragged lists would serialise on TPU.)

Exactness: results are the exact top-k of the probed clusters; recall vs
the full scan depends on nprobe/nlist and the data's cluster structure
(measured in tests; nprobe = nlist recovers the flat scan exactly).
"""

from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import pallas_scan as ps

logger = logging.getLogger(__name__)

BLOCK = ps.BLOCK

# preference depth for multi-assignment duplicates (build_ivf expand > 0):
# a row lives in its primary cluster plus at most DUP_PREF duplicate slots,
# so a deduplicating search pulls (DUP_PREF + 1) * k candidates to guarantee
# k unique ids even if every copy of every winner was probed
DUP_PREF = 4


def _seg_chunk_rows(nlist: int) -> int:
    """Sub-chunk row count keeping a [cs, nlist] f32 block at ~64 MB."""
    return max(256, min(8192, ((1 << 24) // max(nlist, 1)) // 256 * 256))


@partial(jax.jit, static_argnames=("iters",))
def _lloyd(x, cent, iters):
    """Lloyd iterations on unit vectors (cosine k-means).

    Row-chunked: the scoring and one-hot reduction run per [cs, nlist]
    sub-chunk under a scan, so HBM holds one bounded score/one-hot block
    instead of full [n, nlist] matrices (tens of GB at production nlist)."""
    n, d = x.shape
    nlist = cent.shape[0]
    cs = _seg_chunk_rows(nlist)
    npad = -(-n // cs) * cs
    xc = jnp.pad(x, ((0, npad - n), (0, 0))).reshape(-1, cs, d)
    vc = (jnp.arange(npad) < n).astype(x.dtype).reshape(-1, cs)

    def step(cent, _):
        def chunk(carry, xs):
            sums, counts = carry
            xb, vb = xs
            s = xb @ cent.T                              # [cs, nlist]
            a = jnp.argmax(s, axis=1)
            oh = jax.nn.one_hot(a, nlist, dtype=x.dtype) * vb[:, None]
            return (sums + oh.T @ xb, counts + jnp.sum(oh, axis=0)), None

        init = (jnp.zeros((nlist, d), x.dtype), jnp.zeros((nlist,), x.dtype))
        (sums, counts), _ = jax.lax.scan(chunk, init, (xc, vc))
        counts = counts[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), cent)
        new = new / jnp.maximum(jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9)
        return new, None
    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@partial(jax.jit, static_argnames=("npref",))
def _pref_scores(rows, cent, npref):
    """Top-npref cluster (score, id) per row — on device; this host's CPU is
    far too slow for the [n, nlist] scoring matmuls."""
    s = jnp.dot(rows, cent.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, npref)


def _score_prefs(emb, cent, npref):
    """Chunked top-npref (ids, scores) of every row vs `cent` (device)."""
    n, d = emb.shape
    pref = np.empty((n, npref), np.int32)
    pscore = np.empty((n, npref), np.float32)
    dcent = jnp.asarray(cent)
    chunk = 1 << 18
    for c0 in range(0, n, chunk):
        sl = slice(c0, min(n, c0 + chunk))
        rows = emb[sl]
        pad = chunk - rows.shape[0]
        if pad:
            rows = np.concatenate([rows, np.zeros((pad, d), rows.dtype)])
        ts, top = _pref_scores(jnp.asarray(rows), dcent, npref)
        pref[sl] = np.asarray(top)[:sl.stop - sl.start]
        pscore[sl] = np.asarray(ts)[:sl.stop - sl.start]
    return pref, pscore


def refine_centroids(emb, assign: np.ndarray, nlist: int) -> np.ndarray:
    """Centroids recomputed from the rows each cluster ACTUALLY holds.

    The balanced assignment moves boundary rows away from their argmax
    cluster, so the Lloyd centroids no longer describe cluster contents;
    probing with them systematically under-ranks the clusters that received
    spilled rows. Re-estimating each centroid as the normalised mean of its
    assigned members re-aligns the probe ranking with the layout (recall
    measured +2-4 points at equal nprobe on clustered data).

    Host-side sort + prefix-sum segment reduction: per-cluster sums are
    O(N*D) adds, whereas a dense [chunk, nlist] one-hot matmul would be
    O(N*nlist*D) flops and tens of GB transient at production nlist."""
    n, d = emb.shape
    sums = np.zeros((nlist, d), np.float64)
    counts = np.zeros((nlist,), np.int64)
    chunk = 1 << 18
    for c0 in range(0, n, chunk):
        sl = slice(c0, min(n, c0 + chunk))
        rows = np.ascontiguousarray(emb[sl], np.float32)
        a = np.asarray(assign[sl])
        cnt = np.bincount(a, minlength=nlist).astype(np.int64)
        order = np.argsort(a, kind="stable")
        cum = np.zeros((len(order) + 1, d), np.float64)
        np.cumsum(rows[order], axis=0, dtype=np.float64, out=cum[1:])
        ends = np.cumsum(cnt)
        sums += cum[ends] - cum[ends - cnt]
        counts += cnt
    out = (sums / np.maximum(counts, 1)[:, None]).astype(np.float32)
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)
    return out.astype(np.float32)


def build_ivf(emb: np.ndarray, nlist: int, iters: int = 10,
              train_sample: int = 1 << 18, seed: int = 0,
              multiple_of: int = 1, expand: float = 0.25,
              refine: bool = True) -> dict:
    """Build a balanced IVF over normalised embeddings [N, D].

    multiple_of: force nlist to a multiple (mesh sharding needs nlist % ndev
    == 0 so shard boundaries fall on cluster boundaries).

    expand: fractional slack capacity per cluster used for MULTI-ASSIGNMENT.
    Equal-size clusters are what make this IVF TPU-native, but forcing
    boundary rows into their 2nd/3rd-choice cluster puts them where queries
    probing their first choice never look — a structural recall ceiling
    (~0.935 at 25% of the DB probed, IVF_CURVE r3). With expand > 0 each
    cluster gets ceil(n*(1+expand)/nlist) slots; after the balanced primary
    assignment the spare slots are filled with DUPLICATES of the
    highest-affinity rows held elsewhere, so a probe of cluster c also sees
    the boundary rows that spilled out of c. Search must then dedup by
    original row id (ivf_search(dedup=True); the dict's "dup" flag says so).
    Storage cost: (1+expand)x DB bytes. expand=0 recovers the exact
    single-assignment layout.

    refine: re-estimate centroids from actual cluster members after
    balancing (see refine_centroids) — changes probe ranking only, layout
    is unaffected.

    Returns {"centroids" [nlist,D] f32, "perm" [Npad] i64 (permuted row ->
    original row, -1 for padding), "cluster_rows" C, "nlist", "expand",
    "dup" bool (duplicates present; search with dedup=True)}.
    """
    n, d = emb.shape
    rng = np.random.default_rng(seed)
    # clamp nlist: need >= nlist training rows to seed centroids, and more
    # clusters than ~N/BLOCK just pads every cluster to one near-empty block
    cap = max(1, min(min(train_sample, n), -(-n // BLOCK)))
    if nlist > cap:
        logger.warning("IVF nlist %d too large for %d rows; using %d",
                       nlist, n, cap)
        nlist = cap
    if multiple_of > 1:
        nlist = max(multiple_of, (nlist // multiple_of) * multiple_of)
    # cluster size: equal, block-aligned, with `expand` slack for duplicates
    c_rows = -(-int(n * (1.0 + max(expand, 0.0))) // nlist)
    c_rows = -(-c_rows // BLOCK) * BLOCK
    npad = c_rows * nlist

    sample = emb[rng.choice(n, size=min(train_sample, n), replace=False)]
    cent0 = sample[rng.choice(len(sample), size=nlist, replace=False)]
    cent0 = cent0 / np.maximum(np.linalg.norm(cent0, axis=1, keepdims=True), 1e-9)
    cent = np.asarray(_lloyd(jnp.asarray(sample), jnp.asarray(cent0), iters),
                      np.float32)

    # balanced assignment: fill clusters to exactly c_rows. Scoring is
    # chunked (a full [n, nlist] matrix would be 260 GB at TED scale); only
    # the top NPREF choices per row are kept. Balancing runs as vectorised
    # overflow-spill passes: everyone takes their current preference, each
    # over-full cluster keeps its c_rows highest-affinity rows and spills
    # the rest to their next preference. Rows exhausting all preferences
    # (rare) back-fill whatever clusters have room.
    NPREF = min(8, nlist)
    pref, pscore = _score_prefs(emb, cent, NPREF)

    rows = np.arange(n)
    rank = np.zeros(n, np.int32)
    for _ in range(NPREF):
        active = rank < NPREF
        assign = np.where(active, pref[rows, np.minimum(rank, NPREF - 1)], -1)
        sc = np.where(active, pscore[rows, np.minimum(rank, NPREF - 1)], 0.0)
        key = np.lexsort((-sc, assign))
        sa = assign[key]
        first = np.searchsorted(sa, np.arange(nlist), side="left")
        ordinal = np.arange(n) - first[np.clip(sa, 0, nlist - 1)]
        over = key[(sa >= 0) & (ordinal >= c_rows)]
        if len(over) == 0:
            break
        rank[over] += 1
    assign = np.where(rank < NPREF, pref[rows, np.minimum(rank, NPREF - 1)],
                      -1).astype(np.int64)
    # final capacity enforcement: residual overflow from the last pass is
    # demoted to -1 (keeping each cluster's highest-affinity rows)...
    sc = np.where(rank < NPREF, pscore[rows, np.minimum(rank, NPREF - 1)], 0.0)
    key = np.lexsort((-sc, assign))
    sa = assign[key]
    first = np.searchsorted(sa, np.arange(nlist), side="left")
    ordinal = np.arange(n) - first[np.clip(sa, 0, nlist - 1)]
    assign[key[(sa >= 0) & (ordinal >= c_rows)]] = -1
    # ...and back-fills clusters with spare capacity
    left = np.nonzero(assign < 0)[0]
    if len(left):
        fill = np.bincount(assign[assign >= 0], minlength=nlist)
        room = np.repeat(np.arange(nlist), np.maximum(c_rows - fill, 0))
        assign[left] = room[:len(left)]
        logger.info("IVF: %d rows overflowed their %d preferred clusters",
                    len(left), NPREF)

    if refine and nlist > 1:
        cent = refine_centroids(emb, assign, nlist)

    # multi-assignment: fill each cluster's spare slots with DUPLICATES of
    # the highest-affinity rows assigned elsewhere (see docstring). Affinity
    # is re-scored against the refined centroids so the duplicates patch the
    # layout queries will actually probe.
    dup_rows = np.zeros((0,), np.int64)
    dup_cluster = np.zeros((0,), np.int64)
    fill = np.bincount(assign, minlength=nlist)
    spare = c_rows - fill
    if expand > 0 and nlist > 1 and spare.sum() > 0:
        ndup_pref = min(DUP_PREF, nlist)
        pref2, ps2 = _score_prefs(emb, cent, ndup_pref)
        cand = pref2 != assign[:, None].astype(np.int32)  # [n, ndup_pref]
        cc = pref2[cand].astype(np.int64)
        cs = ps2[cand]
        cr = np.broadcast_to(rows[:, None], pref2.shape)[cand].astype(np.int64)
        order = np.lexsort((-cs, cc))
        scc = cc[order]
        first = np.searchsorted(scc, np.arange(nlist), side="left")
        ordinal = np.arange(len(scc)) - first[scc]
        keep = ordinal < spare[scc]
        dup_rows = cr[order][keep]
        dup_cluster = scc[keep]
        logger.info("IVF: %d duplicate rows fill the %.0f%% expansion slack",
                    len(dup_rows), 100 * expand)

    # permuted layout: rows of cluster c at [c*c_rows, (c+1)*c_rows)
    perm = np.full(npad, -1, np.int64)
    mem_cluster = np.concatenate([assign, dup_cluster])
    mem_row = np.concatenate([rows.astype(np.int64), dup_rows])
    order2 = np.argsort(mem_cluster, kind="stable")
    sa = mem_cluster[order2]
    first = np.searchsorted(sa, np.arange(nlist), side="left")
    ordinal = np.arange(len(sa)) - first[sa]
    perm[sa * c_rows + ordinal] = mem_row[order2]
    logger.info("IVF built: %d clusters x %d rows (%d duplicates, "
                "%d padding rows)", nlist, c_rows, len(dup_rows),
                npad - n - len(dup_rows))
    return {"centroids": cent, "perm": perm, "cluster_rows": c_rows,
            "nlist": nlist, "expand": float(max(expand, 0.0)),
            "dup": bool(len(dup_rows))}


def permute_rows(emb, perm_slice: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Materialise one cluster-contiguous slab (padding rows are zero).

    emb may be a memmap: rows are fancy-indexed, so host RAM holds only the
    requested slab — the residency loader builds each device shard with one
    call instead of permuting the whole DB in host RAM first."""
    out = np.zeros((len(perm_slice), emb.shape[1]), dtype)
    valid = perm_slice >= 0
    out[valid] = emb[perm_slice[valid]].astype(dtype)
    return out


def permute_db(emb: np.ndarray, ivf: dict, dtype=np.float32) -> np.ndarray:
    """Materialise the full cluster-contiguous DB (tests/small DBs)."""
    return permute_rows(emb, ivf["perm"], dtype)


def _probe_blocks(q, centroids, nprobe, bpc, nlist_local=None, me=None):
    """Top-nprobe clusters per query -> gather block ids ([-1] = skip).

    With nlist_local/me set, cluster ids are remapped to a mesh shard's local
    cluster range and non-local probes become -1 (the gather kernel's padding
    sentinel) — every device sees the same global probe set and fetches only
    the probed clusters it owns.
    """
    qn = q.shape[0]
    cs = jnp.dot(q.astype(jnp.float32), centroids.T,
                 preferred_element_type=jnp.float32)     # [Q, nlist]
    _, probe = jax.lax.top_k(cs, nprobe)                 # [Q, nprobe] global
    if nlist_local is not None:
        lp = probe - me * nlist_local
        probe = jnp.where((lp >= 0) & (lp < nlist_local), lp, -1)
    bidx = jnp.where(
        probe[:, :, None] >= 0,
        probe[:, :, None] * bpc + np.arange(bpc)[None, None, :],
        -1).reshape(qn, probe.shape[1] * bpc)
    kbp = -(-bidx.shape[1] // ps.GATHER_G) * ps.GATHER_G
    return jnp.pad(bidx, ((0, 0), (0, kbp - bidx.shape[1])),
                   constant_values=-1)


def _dedup_topk(v, idx, k):
    """Exact top-k by score among UNIQUE original row ids.

    v [Q, M] f32 (any order), idx [Q, M] i32 original ids (-1 invalid).
    Multi-assigned rows (build_ivf expand > 0) can be probed through both
    their primary cluster and a duplicate slot with identical scores; this
    keeps one copy per id. Duplicates are grouped by an id-major sort (score
    descending within a group, so each group's FIRST element is its best
    copy), killed with one adjacent compare, and re-sorted by score —
    O(M log M), no [Q, M, M] all-pairs mask, so large -k / mesh-wide merges
    (M = ndev*k or 5k) stay linear in memory. Always returns exactly k
    columns (padded with -inf / -1 when fewer than k unique finite
    candidates exist), matching the non-dedup path's [Q, k] contract."""
    qn, m = v.shape
    idx = idx.astype(jnp.int32)
    # (id asc, score desc) joint sort: copies of an id are adjacent, best
    # copy first (-1 invalid entries carry -inf scores by construction)
    sidx, neg = jax.lax.sort((idx, -v), num_keys=2)
    sv = -neg
    first = jnp.concatenate(
        [jnp.ones((qn, 1), bool), sidx[:, 1:] != sidx[:, :-1]], axis=1)
    sv = jnp.where(first, sv, -jnp.inf)
    if m < k:  # pad so the final slice is exactly k wide
        sv = jnp.pad(sv, ((0, 0), (0, k - m)), constant_values=-jnp.inf)
        sidx = jnp.pad(sidx, ((0, 0), (0, k - m)), constant_values=-1)
    neg2, sidx2 = jax.lax.sort((-sv, sidx), num_keys=1)
    out_v = -neg2[:, :k]
    out_i = jnp.where(jnp.isfinite(out_v), sidx2[:, :k], -1)
    return out_v, out_i


def _rerank_blocks(qf, db_hi, scores, bidx, tl2d, qcap, k, interpret):
    """Exact re-rank: rescore the top-(k+1) scanned blocks in full precision.

    The scan ranks candidates in the storage dtype (bf16/int8), whose
    rounding noise — not probe misses — is what caps IVF recall (measured:
    exact-rescore ceiling 0.990-0.998 where bf16 ranking plateaus at ~0.98
    and int8 at ~0.95). This takes the scan's scores [Qp, KB*BLOCK] over
    probed blocks `bidx` [Qp, KB], selects the top-(k+1) blocks per query by
    block max (the scan-score analogue of the flat scan's phase-B cover),
    re-gathers ONLY those blocks from the f32 sidecar `db_hi` [Npad, D] and
    rescores them against the f32 query under the scan's own tl2d/qcap
    masks — so the final ranking is exact f32 over every block that could
    hold a storage-dtype top-k candidate, excluding exactly the rows the
    scan excluded (padding and, under use_len, mincov-filtered rows).

    Cost: ~(k+1) extra f32 block gathers per query (4 bytes/elem vs the
    scan's 1-2), roughly doubling gather traffic at nprobe=16; the IVF curve
    artifact states the measured qps cost. Returns rescored
    (scores2 [Qp, (k+1+pad)*BLOCK], bidx2 [Qp, k+1+pad]) aligned like the
    scan's outputs (NEG_CAP sentinel in masked slots)."""
    qp = scores.shape[0]
    kb = bidx.shape[1]
    blkmax = jnp.max(scores.reshape(qp, kb, BLOCK), axis=-1)   # [Qp, KB]
    ksel = min(k + 1, kb)
    _, cols = ps._topk_finite(blkmax, ksel)                    # probed cols
    bidx2 = ps._gather_int(bidx, cols)                         # global blocks
    # tl2d/qcap are the scan's own masks (padding rows' +inf and, under
    # use_len, the mincov length filter): the rescore must exclude exactly
    # the rows the scan excluded, or filtered rows would resurface here
    if interpret:
        s2 = ps.gather_block_scores(qf, db_hi, tl2d, qcap, bidx2,
                                    db_hi.shape[0], use_len=True,
                                    interpret=True)
    else:
        s2 = ps.gather_block_scores_dma(qf, db_hi, tl2d, qcap, bidx2,
                                        db_hi.shape[0], use_len=True)
    kbp = s2.shape[1] // BLOCK
    if kbp != bidx2.shape[1]:
        bidx2 = jnp.pad(bidx2, ((0, 0), (0, kbp - bidx2.shape[1])),
                        constant_values=-1)
    return s2, bidx2


def _probe_and_select(q, db_perm, perm, bidx, k, tlen, qlen, mincov, use_len,
                      interpret, scales=None, dedup=False, rerank_hi=None,
                      q_hi=None):
    """Gather the probed blocks, exact top-k of the probed candidates.

    scales: [Npad] f32 block-uniform dequant scales when db_perm is int8
    (quantize_blocks over the PERMUTED layout); queries must then be int8
    too, and the caller applies the per-query scale to the returned values.
    rerank_hi: optional f32 [Npad, D] sidecar in the SAME permuted layout;
    when set, the top-(k+1) blocks by scan score are rescored in f32
    against q_hi (defaults to q) and the returned values/ranking are the
    exact f32 scores (see _rerank_blocks) — no caller-side dequant rescale
    is then needed even for int8 scans.
    Returns (scores [Q,k] f32, ORIGINAL row indices [Q,k] i32, -1 misses).
    """
    qn = q.shape[0]
    sub = 16 if q.dtype == jnp.bfloat16 else (32 if q.dtype == jnp.int8 else 8)
    qp = -(-qn // sub) * sub
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
        bidx = jnp.pad(bidx, ((0, qp - qn), (0, 0)), constant_values=-1)
    if rerank_hi is not None:
        q_hi = jnp.asarray(q if q_hi is None else q_hi, jnp.float32)
        if q_hi.shape[0] != qp:
            q_hi = jnp.pad(q_hi, ((0, qp - q_hi.shape[0]), (0, 0)))

    # padding rows (perm == -1) are excluded through the gather kernel's
    # length filter: their tlen is +inf, which no finite qcap admits — a
    # per-candidate perm lookup here would be a multi-million-element
    # dynamic gather (measured ~10 ms); only the final [Q,k] winners are
    # mapped back through perm.
    nb = db_perm.shape[0] // BLOCK
    kbp = bidx.shape[1]
    pad_inf = jnp.where(perm >= 0, 0.0, np.float32(np.inf))
    if use_len:
        tl2d = (tlen * jnp.asarray(mincov, jnp.float32)
                + pad_inf).reshape(nb, BLOCK)
        qcap = jnp.pad(qlen, (0, qp - qn)) if qp != qn else qlen
    else:
        tl2d = pad_inf.reshape(nb, BLOCK)
        qcap = jnp.full_like(q, np.float32(3e38), shape=(qp,),
                             dtype=jnp.float32)
    if interpret:
        scores = ps.gather_block_scores(
            q, db_perm, tl2d, qcap, bidx.astype(jnp.int32),
            db_perm.shape[0], use_len=True, interpret=True, scales=scales)
    else:  # TPU: kernel-managed DMA gather (deep copy pipeline)
        # per-selected-block dequant scales (block-uniform): factorised
        # one-hot gather from the [NB] block-scale vector. The flat-scan
        # path gets these for free from phase B's superblock one-hot
        # (_select_blocks); IVF probes carry no such one-hot, so the
        # standalone gather stays.
        scale_sel = None
        if scales is not None:
            scale_sel = ps._gather_blockvec_f32(
                scales.reshape(-1, BLOCK)[:, 0],
                jnp.maximum(bidx.astype(jnp.int32), 0))
        scores = ps.gather_block_scores_dma(
            q, db_perm, tl2d, qcap, bidx.astype(jnp.int32),
            db_perm.shape[0], use_len=True, quantized=scales is not None,
            scale_sel=scale_sel)
    if rerank_hi is not None:
        # exact f32 re-rank of the top-(k+1) scanned blocks: selection and
        # values below use the rescored matrix instead of the scan's
        if scores.shape[1] // BLOCK != bidx.shape[1]:
            bidx = jnp.pad(
                bidx, ((0, 0), (0, scores.shape[1] // BLOCK - bidx.shape[1])),
                constant_values=-1)
        scores, bidx = _rerank_blocks(q_hi, rerank_hi, scores,
                                      bidx.astype(jnp.int32), tl2d, qcap, k,
                                      interpret)
    kbp = bidx.shape[1]
    ridx = (bidx[:, :, None] * BLOCK
            + np.arange(BLOCK)[None, None, :]).reshape(qp, kbp * BLOCK)
    if scores.shape[1] != ridx.shape[1]:
        # the gather pads its column range (UNROLL / SMEM-chunk multiples);
        # padded columns carry sentinel scores, so map them to row -1
        ridx = jnp.pad(ridx, ((0, 0), (0, scores.shape[1] - ridx.shape[1])),
                       constant_values=-1)
    # with duplicates in the layout, pull (DUP_PREF + 1) * k candidates so
    # the post-dedup top-k is still k deep even when every copy of every
    # winner was probed (copies score identically)
    ksel = min((DUP_PREF + 1) * k, scores.shape[1]) if dedup else k
    v, sel = ps._topk_entries_capped(scores, ksel)
    pidx = jnp.take_along_axis(ridx, sel, axis=1)          # permuted rows
    idx = perm[jnp.clip(pidx, 0, len(perm) - 1)].astype(jnp.int32)
    idx = jnp.where(jnp.isfinite(v) & (pidx >= 0), idx, -1)
    if dedup:
        v, idx = _dedup_topk(v, idx, k)
    return v[:qn], idx[:qn]


def build_mesh_ivf_search(mesh, k: int, nprobe: int, use_len: bool,
                          mincov: float, interpret: bool = False,
                          quantized: bool = False, dedup: bool = False,
                          rerank: bool = False):
    """Mesh-sharded IVF: clusters sharded over the mesh axis.

    Each device holds nlist/ndev contiguous clusters of the permuted DB.
    Every device computes the same global top-nprobe probe set from the
    replicated centroids, gathers only the probed clusters it owns (others
    are -1-masked), takes its local exact top-k, and the per-shard partials
    are all-gather-merged over ICI — identical results to single-device
    ivf_search with the same centroids/perm.

    quantized=True takes int8 shards + block-uniform scale shards plus
    pre-quantised int8 queries q8 (quantize_rows; the f32 q still drives the
    centroid probe). The caller applies the per-query scale to the merged
    values — per-shard ranking is scale-invariant per query.

    rerank=True additionally takes an f32 sidecar shard (same permuted
    layout as db_shard): each device rescores its top-(k+1) probed blocks
    in exact f32 against the f32 queries before the merge (see
    _rerank_blocks) — merged values are then exact f32 inner products and
    need NO caller-side dequant rescale even when quantized.
    """
    from .engine import _shard_map_unchecked
    from jax.sharding import PartitionSpec as P
    from ..ops import topk as topk_ops

    axis = mesh.axis_names[0]

    def local_fn(q, q8, db_shard, centroids, tl_shard, perm_shard, qlen,
                 scale_shard, hi_shard):
        nd = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        nlist = centroids.shape[0]
        nlist_local = nlist // nd
        c_rows = db_shard.shape[0] // nlist_local
        bpc = c_rows // BLOCK
        bidx = _probe_blocks(q, centroids, nprobe, bpc,
                             nlist_local=nlist_local, me=me)
        # scan query in the storage dtype; with rerank the engine keeps q
        # f32 so q_hi is the caller's unrounded query
        scan_q = q8 if quantized else q.astype(db_shard.dtype)
        v, idx = _probe_and_select(scan_q, db_shard,
                                   perm_shard, bidx, k,
                                   tl_shard, qlen, mincov, use_len, interpret,
                                   scales=scale_shard if quantized else None,
                                   dedup=dedup,
                                   rerank_hi=hi_shard if rerank else None,
                                   q_hi=q.astype(jnp.float32)
                                   if rerank else None)
        av = jax.lax.all_gather(v, axis)
        ai = jax.lax.all_gather(idx, axis)
        if dedup:
            # duplicates can span shards (primary slab on one device, the
            # expansion copy on another): dedup across the gathered partials
            # rather than heap-merging them
            vv = jnp.moveaxis(av, 0, 1).reshape(v.shape[0], -1)
            ii = jnp.moveaxis(ai, 0, 1).reshape(v.shape[0], -1)
            return _dedup_topk(vv, ii, k)
        return topk_ops.merge_partials(av, ai, k)

    fn = _shard_map_unchecked(
        local_fn, mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(axis, None), P(None, None),
                  P(axis), P(axis), P(None), P(axis), P(axis, None)),
        out_specs=(P(None, None), P(None, None)),
    )
    return jax.jit(fn)


@partial(jax.jit, static_argnames=("k", "nprobe", "use_len", "interpret",
                                   "dedup"))
def ivf_search(q, db_perm, centroids, perm, k, nprobe, tlen=None, qlen=None,
               mincov=0.0, use_len=False, interpret=False, scales=None,
               q8=None, dedup=False, rerank_hi=None, q_hi=None):
    """Approximate top-k: probe nprobe clusters, exact top-k of the probed.

    q [Q,D] f32/bf16 (drives the centroid probe), db_perm [Npad,D]
    cluster-contiguous, centroids [nlist,D] f32, perm [Npad] i64,
    tlen [Npad] f32 target lengths in PERMUTED order (mincov filter, same
    semantics as the flat scan).
    int8 DBs: pass scales (block-uniform over the permuted layout) AND q8
    (quantize_rows int8 queries) — the full-precision q still ranks the
    centroids, identically to the mesh path; values then need the caller's
    per-query rescale (not with rerank_hi: rescored values are already f32).
    dedup=True is REQUIRED for layouts built with expand > 0 (the dict's
    "dup" flag): multi-assigned rows are reported once.
    rerank_hi: optional f32 [Npad, D] sidecar in the SAME permuted layout —
    the top-(k+1) blocks by scan score are rescored in exact f32 against
    q_hi (the caller's UNROUNDED f32 queries; defaults to upcasting q,
    which removes only db-side noise), eliminating the storage-dtype
    ranking noise that otherwise caps recall (~0.98 bf16 / ~0.95 int8; see
    _rerank_blocks). Costs ~one extra f32 (k+1)-block gather per query.
    Returns (scores [Q,k] f32, ORIGINAL indices [Q,k] i32, -1 for misses).
    """
    nlist = centroids.shape[0]
    c_rows = db_perm.shape[0] // nlist
    bidx = _probe_blocks(q, centroids, nprobe, c_rows // BLOCK)
    if rerank_hi is not None and q_hi is None:
        q_hi = q.astype(jnp.float32)
    return _probe_and_select(q8 if q8 is not None else q, db_perm, perm,
                             bidx, k, tlen, qlen, mincov,
                             use_len, interpret, scales=scales, dedup=dedup,
                             rerank_hi=rerank_hi, q_hi=q_hi)


# -- disk-streaming IVF -------------------------------------------------------
# For DBs larger than the mesh's HBM the resident IVF cannot serve, but the
# probe structure still makes search sublinear in HOST IO: persist the
# cluster-contiguous permuted layout on disk once, then per query batch
# stage only the union of probed clusters host->device and run the ordinary
# flat scan over the staged rows (exact within the probed set). Host reads
# per batch are ~ nprobe/nlist of the DB instead of all of it — the moral
# equivalent of faiss's on-disk inverted lists, reshaped for the TPU: fixed
# cluster slots, contiguous ranges, no ragged lists. (reference context:
# faiss IVF is merizo_search's scalability story, README.md:13-18.)

_DISK_DTYPES = {"int8": np.int8, "f32": np.float32}


def _disk_dtype(precision: str):
    if precision == "bf16":
        return np.dtype("bfloat16")  # ml_dtypes-registered
    return _DISK_DTYPES[precision]


def write_disk_ivf(emb, lengths: np.ndarray, nlist: int, path_prefix: str,
                   precision: str = "int8", iters: int = 10,
                   train_sample: int = 1 << 18, seed: int = 0,
                   fingerprint=None, expand: float = 0.25) -> dict:
    """Build an IVF and persist the cluster-contiguous layout as sidecars.

    emb: [N, D] NORMALISED embeddings (array or memmap — rows are read in
    bounded slabs). Writes next to `path_prefix`:
      .npz     centroids [nlist,D] f32, cluster_rows, precision
      .perm    int64 memmap [Npad] (permuted row -> original, -1 padding)
      .emb     memmap [Npad, D] in `precision` (int8 block-quantised)
      .scales  f32 memmap [Npad] (int8 only; block-uniform per 128 rows)
      .len     f32 memmap [Npad] permuted lengths, +inf on padding rows
               (so the scan's length mask excludes them)
    Returns the loaded dict (see load_disk_ivf)."""
    ivf = build_ivf(emb, nlist, iters=iters, train_sample=train_sample,
                    seed=seed, expand=expand)
    perm, c_rows = ivf["perm"], ivf["cluster_rows"]
    npad, dim = len(perm), emb.shape[1]
    dt = _disk_dtype(precision)
    # sidecars are written under tmp names and renamed into place before the
    # .npz descriptor lands (itself renamed last): a killed or concurrent
    # build can never leave a readable-but-torn sidecar set, since readers
    # gate on the .npz existing
    tmp = f".tmp{os.getpid()}"
    mm = np.memmap(path_prefix + ".emb" + tmp, dtype=dt, mode="w+",
                   shape=(npad, dim))
    sc = (np.memmap(path_prefix + ".scales" + tmp, np.float32, "w+",
                    shape=(npad,))
          if precision == "int8" else None)
    CH = (1 << 18) // BLOCK * BLOCK  # slab rows; BLOCK-aligned so int8
    #                                  scale blocks never straddle a slab
    for lo in range(0, npad, CH):
        hi = min(lo + CH, npad)
        slab = permute_rows(emb, perm[lo:hi], np.float32)
        if precision == "int8":
            qv, s = ps.quantize_blocks(slab)
            mm[lo:hi] = qv
            sc[lo:hi] = s
        else:
            mm[lo:hi] = slab.astype(dt)
    mm.flush()
    if sc is not None:
        sc.flush()
    pm = np.memmap(path_prefix + ".perm" + tmp, np.int64, "w+", shape=(npad,))
    pm[:] = perm
    pm.flush()
    lp = np.memmap(path_prefix + ".len" + tmp, np.float32, "w+",
                   shape=(npad,))
    lp[:] = np.inf
    valid = perm >= 0
    lp[valid] = np.asarray(lengths, np.float32)[perm[valid]]
    lp.flush()
    del mm, sc, pm, lp  # close the maps before renaming their files
    names = [".emb", ".perm", ".len"] + ([".scales"]
                                         if precision == "int8" else [])
    for n in names:
        os.replace(path_prefix + n + tmp, path_prefix + n)
    np.savez(path_prefix + ".npz" + tmp, centroids=ivf["centroids"],
             cluster_rows=c_rows, precision=precision, npad=npad, dim=dim,
             dup=ivf["dup"],
             fingerprint=np.asarray(fingerprint if fingerprint is not None
                                    else [], np.int64))
    # np.savez appends .npz to unknown suffixes: normalise the tmp name
    tmp_npz = (path_prefix + ".npz" + tmp
               if os.path.exists(path_prefix + ".npz" + tmp)
               else path_prefix + ".npz" + tmp + ".npz")
    os.replace(tmp_npz, path_prefix + ".npz")
    logger.info("disk IVF written: %d clusters x %d rows (%s) at %s",
                ivf["nlist"], c_rows, precision, path_prefix)
    return load_disk_ivf(path_prefix)


def load_disk_ivf(path_prefix: str) -> dict:
    """Open a write_disk_ivf sidecar set; arrays are read-only memmaps."""
    z = np.load(path_prefix + ".npz")
    precision = str(z["precision"])
    npad, dim = int(z["npad"]), int(z["dim"])
    return {
        "fingerprint": z["fingerprint"] if "fingerprint" in z else None,
        "dup": bool(z["dup"]) if "dup" in z else False,
        "centroids": z["centroids"],
        "cluster_rows": int(z["cluster_rows"]),
        "nlist": int(z["centroids"].shape[0]),
        "precision": precision,
        "emb": np.memmap(path_prefix + ".emb", _disk_dtype(precision), "r",
                         shape=(npad, dim)),
        "scales": (np.memmap(path_prefix + ".scales", np.float32, "r",
                             shape=(npad,)) if precision == "int8" else None),
        "perm": np.memmap(path_prefix + ".perm", np.int64, "r",
                          shape=(npad,)),
        "lengths": np.memmap(path_prefix + ".len", np.float32, "r",
                             shape=(npad,)),
    }


def cluster_runs(cluster_ids: np.ndarray) -> list[tuple[int, int]]:
    """Coalesce sorted unique cluster ids into [start, stop) runs so staging
    reads the fewest contiguous disk ranges."""
    if len(cluster_ids) == 0:
        return []
    breaks = np.nonzero(np.diff(cluster_ids) != 1)[0]
    starts = np.concatenate([[0], breaks + 1])
    stops = np.concatenate([breaks, [len(cluster_ids) - 1]])
    return [(int(cluster_ids[a]), int(cluster_ids[b]) + 1)
            for a, b in zip(starts, stops)]
