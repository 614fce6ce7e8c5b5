"""TM-align-style structural alignment, batched on TPU.

Replaces the reference's bundled TM-align C++ binary, which is invoked as a
subprocess once per query-hit pair (programs/Foldclass/utils.py:75-109,
dbsearch.py:162) and dominates end-to-end wall clock. Here the whole top-k
rescoring batch aligns at once on device:

- initial alignments by exhaustive gapless threading (all offsets, vmapped
  Kabsch + TM-score) AND by NW over the CA-geometry secondary-structure
  match matrix (TM-align's get_initial_ss);
- iterative refinement alternating (a) TM-score-optimal superposition search
  over the current alignment and (b) Needleman-Wunsch DP (free end gaps)
  on the 1/(1+d^2/d0^2) similarity matrix — the TM-align algorithm
  (Zhang & Skolnick 2005), re-derived for SIMD execution; refinement runs
  as a vmapped bank of chains (each init x gap penalty in {-0.6, 0}) and
  keeps the best-scoring basin;
- DP runs as an anti-diagonal wavefront lax.scan (2L steps of length-L vector
  ops), batched over pairs with vmap, so batch B costs the same wall-clock
  as one pair;
- superposition search seeds multiple aligned sub-fragments (full/halves/
  quarters) in parallel, mirroring TM-score's L_init schedule.

Scores follow TM-score conventions: d0(L) = 1.24 (L-15)^(1/3) - 1.8 clamped
to >= 0.5; qtm normalises by query length, ttm by target length (parity with
the reference's parsed outputs {len_ali, rmsd, seq_id, qtm, ttm},
Foldclass/utils.py:112-158).

This is a reimplementation of the published algorithm, not a translation of
the (stripped) binary; scores agree with TM-align to within the tolerance of
its own heuristic initialisation on homologous pairs (see tests).
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .kabsch import kabsch, transform
from .seqid import seq_identity_count

logger = logging.getLogger(__name__)

GAP = -0.6
NEG = -1e4


def tm_d0(ln):
    """TM-score normalisation distance."""
    ln = jnp.asarray(ln, jnp.float32)
    d0 = 1.24 * jnp.cbrt(jnp.maximum(ln - 15.0, 1e-3)) - 1.8
    return jnp.where(ln <= 21, 0.5, jnp.maximum(d0, 0.5))


def _d0_search(d0):
    return jnp.clip(d0, 4.5, 8.0)


# ---------------------------------------------------------------------------
# Needleman-Wunsch on anti-diagonals

def _dp_align(S, nx, ny, gap=GAP):
    """Semi-global NW (free end gaps) over S [L,L]; cells outside
    [0,nx)x[0,ny) carry NEG. Returns ali [L] int32 (y index per x position,
    -1 for unaligned)."""
    L = S.shape[0]
    Lp = L + 1
    # Hs[k, i] = H[i, k-i]; Ptr in {0 diag, 1 up, 2 left, 3 none}
    def diag_step(carry, k):
        h_km1, h_km2 = carry  # [Lp] each
        i_idx = jnp.arange(Lp)
        j_idx = k - i_idx
        valid = (i_idx >= 1) & (j_idx >= 1) & (i_idx <= L) & (j_idx <= L)
        s_ij = S[jnp.clip(i_idx - 1, 0, L - 1), jnp.clip(j_idx - 1, 0, L - 1)]
        diag = jnp.where(valid, jnp.roll(h_km2, 1) + s_ij, NEG * 2)
        up = jnp.where(valid, jnp.roll(h_km1, 1) + gap, NEG * 2)
        left = jnp.where(valid, h_km1 + gap, NEG * 2)
        best = jnp.maximum(diag, jnp.maximum(up, left))
        ptr = jnp.where(best == diag, 0, jnp.where(best == up, 1, 2)).astype(jnp.int8)
        # boundary cells: first row/col are 0 (free end gaps)
        on_boundary = ((i_idx == 0) & (j_idx >= 0) & (j_idx <= L)) | \
                      ((j_idx == 0) & (i_idx <= L))
        h_k = jnp.where(on_boundary, 0.0, jnp.where(valid, best, NEG * 2))
        ptr = jnp.where(on_boundary, jnp.int8(3), jnp.where(valid, ptr, jnp.int8(3)))
        return (h_k, h_km1), (h_k, ptr)

    h0 = jnp.where(jnp.arange(Lp) == 0, 0.0, NEG * 2)  # diag k=0: only (0,0)
    hm1 = jnp.full((Lp,), NEG * 2)
    (_, _), (Hs, Ptr) = jax.lax.scan(diag_step, (h0, hm1), jnp.arange(1, 2 * L + 1))
    Hs = jnp.concatenate([h0[None], Hs], axis=0)    # [2L+1, Lp]
    Ptr = jnp.concatenate([jnp.full((1, Lp), jnp.int8(3)), Ptr], axis=0)

    # best end on row i=nx (any j<=ny) or column j=ny (any i<=nx)
    j_range = jnp.arange(Lp)
    row_vals = jnp.where(j_range <= ny, Hs[nx + j_range, nx], NEG * 2)
    i_range = jnp.arange(Lp)
    col_vals = jnp.where(i_range <= nx, Hs[i_range + ny, i_range], NEG * 2)
    jr = jnp.argmax(row_vals)
    ic = jnp.argmax(col_vals)
    use_row = row_vals[jr] >= col_vals[ic]
    i0 = jnp.where(use_row, nx, ic)
    j0 = jnp.where(use_row, jr, ny)

    # traceback
    def tb_step(carry, _):
        i, j, ali = carry
        done = (i <= 0) | (j <= 0)
        p = Ptr[i + j, i]
        take = (~done) & (p == 0)
        ali = jnp.where(take, ali.at[jnp.clip(i - 1, 0, L - 1)].set(j - 1), ali)
        di = jnp.where(done, 0, jnp.where(p == 0, 1, jnp.where(p == 1, 1, 0)))
        dj = jnp.where(done, 0, jnp.where(p == 0, 1, jnp.where(p == 2, 1, 0)))
        return (i - di, j - dj, ali), None

    ali0 = jnp.full((L,), -1, jnp.int32)
    (_, _, ali), _ = jax.lax.scan(tb_step, (i0, j0, ali0), None, length=2 * L)
    return ali


# ---------------------------------------------------------------------------
# TM-score superposition search

def _seed_masks(w, n_seeds: int = 4):
    """Sub-fragments of the aligned set by aligned rank: full, first half,
    second half, middle half (static-shape stand-in for TM-score's L_init
    schedule)."""
    rank = jnp.cumsum(w) - 1          # rank among aligned, valid where w>0
    n = jnp.sum(w)
    half = n / 2.0
    quarter = n / 4.0
    seeds = jnp.stack([
        w,
        w * (rank < half),
        w * (rank >= half),
        w * ((rank >= quarter) & (rank < 3 * quarter)),
    ])
    # guard: a seed with <3 points falls back to the full set
    ok = jnp.sum(seeds, axis=1, keepdims=True) >= 3
    return jnp.where(ok, seeds, w[None, :])


def _tm_iterate(x, yj, w, seed, d0, d0s, lnorm, n_iter):
    """Iterative superposition refinement from one seed mask.

    Returns (best_score, best_R, best_t)."""
    d0 = jnp.asarray(d0, jnp.float32)

    def body(carry, _):
        sel, best_score, best_r, best_t = carry
        r, t = kabsch(x, yj, sel)
        xt = transform(r, t, x)
        d2 = jnp.sum((xt - yj) ** 2, axis=-1)
        score = jnp.sum(w / (1.0 + d2 / (d0 * d0))) / lnorm
        better = score > best_score
        best_score = jnp.where(better, score, best_score)
        best_r = jnp.where(better, r, best_r)
        best_t = jnp.where(better, t, best_t)
        # next selection: aligned pairs within d0_search; widen until >=4
        def sel_at(cut):
            return w * (d2 < cut * cut)
        s1 = sel_at(d0s)
        s2 = sel_at(d0s + 1.0)
        s3 = sel_at(d0s + 2.5)
        sel_new = jnp.where(jnp.sum(s1) >= 4, s1, jnp.where(jnp.sum(s2) >= 4, s2,
                            jnp.where(jnp.sum(s3) >= 4, s3, w)))
        return (sel_new, best_score, best_r, best_t), None

    init = (seed, np.float32(-1.0), np.eye(3, dtype=np.float32),
            np.zeros(3, np.float32))
    (sel, sc, r, t), _ = jax.lax.scan(body, init, None, length=n_iter)
    return sc, r, t


def tm_score_search(x, y, ali, d0, lnorm, n_iter: int = 8):
    """Best TM-score superposition for alignment `ali` ([L] y-index or -1).

    Returns (score, R, t)."""
    L = x.shape[0]
    w = (ali >= 0).astype(jnp.float32)
    yj = y[jnp.clip(ali, 0, L - 1)]
    d0s = _d0_search(d0)
    seeds = _seed_masks(w)
    scores, rs, ts = jax.vmap(
        lambda seed: _tm_iterate(x, yj, w, seed, d0, d0s, lnorm, n_iter))(seeds)
    b = jnp.argmax(scores)
    return scores[b], rs[b], ts[b]


# ---------------------------------------------------------------------------
# initial alignment: secondary structure

def _assign_ss(c, nres):
    """CA-geometry secondary structure (TM-align's make_sec; same rules as
    the C++ backend's assign_ss): window distances around residue i decide
    helix (1), strand (2), turn (3), else coil (0). Positions outside
    [2, nres-3) are coil."""
    L = c.shape[0]
    i = jnp.arange(L)

    def d(a, b):
        return jnp.linalg.norm(c[jnp.clip(i + a, 0, L - 1)]
                               - c[jnp.clip(i + b, 0, L - 1)], axis=-1)

    d13, d14, d15 = d(-2, 0), d(-2, 1), d(-2, 2)
    d24, d25, d35 = d(-1, 1), d(-1, 2), d(0, 2)
    helix = ((jnp.abs(d15 - 6.37) < 2.1) & (jnp.abs(d14 - 5.18) < 2.1) &
             (jnp.abs(d25 - 5.18) < 2.1) & (jnp.abs(d13 - 5.45) < 2.1) &
             (jnp.abs(d24 - 5.45) < 2.1) & (jnp.abs(d35 - 5.45) < 2.1))
    strand = ((jnp.abs(d15 - 13.0) < 1.42) & (jnp.abs(d14 - 10.4) < 1.42) &
              (jnp.abs(d25 - 10.4) < 1.42) & (jnp.abs(d13 - 6.1) < 1.42) &
              (jnp.abs(d24 - 6.1) < 1.42) & (jnp.abs(d35 - 6.1) < 1.42))
    code = jnp.where(helix, 1, jnp.where(strand, 2,
                     jnp.where(d15 < 8.0, 3, 0))).astype(jnp.int8)
    valid = (i >= 2) & (i + 2 < nres)
    return jnp.where(valid, code, jnp.int8(0))


def _ss_init(x, y, xm, ym, nx, ny):
    """Initial alignment by NW over the secondary-structure match matrix
    (match 1.0, mismatch 0.0, gap -1.0) — the init that rescues pairs whose
    best superposition shares no long gapless diagonal (TM-align's
    get_initial_ss)."""
    ssx = _assign_ss(x, nx)
    ssy = _assign_ss(y, ny)
    S = (ssx[:, None] == ssy[None, :]).astype(jnp.float32)
    S = jnp.where((xm[:, None] > 0) & (ym[None, :] > 0), S, NEG)
    return _dp_align(S, nx, ny, gap=-1.0)


# ---------------------------------------------------------------------------
# initial alignment: local fragment superposition

def _fragment_init(x, y, xm, ym, nx, ny, d0):
    """Superpose the best gapless fragment pair (16x16 start grid, window
    min(lmin/2, 20)) scored against half-sampled targets, then NW on the
    distance matrix under that frame — TM-align's get_initial_local
    analogue (same shape as the native backend's init_fragment). Rescues
    pairs whose only common core is one compact motif."""
    L = x.shape[0]
    FL = 20
    fl = jnp.clip(jnp.minimum(nx, ny) // 2, 5, FL)
    k = jnp.arange(FL)
    wk = (k < fl).astype(jnp.float32)
    sx = (jnp.linspace(0, 1, 16) * jnp.maximum(nx - fl, 0)).astype(jnp.int32)
    sy = (jnp.linspace(0, 1, 16) * jnp.maximum(ny - fl, 0)).astype(jnp.int32)
    yh = y[::2]                       # half-sampled coarse score targets
    yh_valid = jnp.arange(yh.shape[0]) * 2 < ny
    xrow = jnp.arange(L) < nx

    def combo(p):
        ix, jy = p
        xi = x[jnp.clip(ix + k, 0, L - 1)]
        yj = y[jnp.clip(jy + k, 0, L - 1)]
        w = wk * (ix + k < nx) * (jy + k < ny)
        r, t = kabsch(xi, yj, jnp.maximum(w, 1e-6))
        xt = transform(r, t, x)
        d2 = jnp.sum((xt[:, None, :] - yh[None, :, :]) ** 2, axis=-1)
        bd = jnp.min(jnp.where(yh_valid[None, :], d2, 1e18), axis=1)
        sc = jnp.sum(jnp.where(xrow, 1.0 / (1.0 + bd / (d0 * d0)), 0.0))
        return sc, r, t

    IX, JY = jnp.meshgrid(sx, sy, indexing="ij")
    # lax.map bounds the [L, L/2] distance matrices to batch_size at a time
    scs, rs, ts = jax.lax.map(combo, (IX.reshape(-1), JY.reshape(-1)),
                              batch_size=16)
    bi = jnp.argmax(scs)
    xt = transform(rs[bi], ts[bi], x)
    d2 = jnp.sum((xt[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    S = 1.0 / (1.0 + d2 / (d0 * d0))
    S = jnp.where((xm[:, None] > 0) & (ym[None, :] > 0), S, NEG)
    return _dp_align(S, nx, ny)


# ---------------------------------------------------------------------------
# initial alignment: gapless threading

def _threading_init(x, y, nx, ny, d0, lnorm, stride: int = 1):
    """Best gapless offset alignment (TM-align get_initial analogue)."""
    L = x.shape[0]
    offsets = jnp.arange(-(L - 5), L - 4, stride)

    idx = jnp.arange(L)

    def eval_offset(o):
        j = idx + o
        ali = jnp.where((j >= 0) & (j < ny) & (idx < nx), j, -1)
        w = (ali >= 0).astype(jnp.float32)
        yj = y[jnp.clip(ali, 0, L - 1)]
        enough = jnp.sum(w) >= 5
        r, t = kabsch(x, yj, jnp.maximum(w, 1e-6))
        xt = transform(r, t, x)
        d2 = jnp.sum((xt - yj) ** 2, axis=-1)
        score = jnp.sum(w / (1.0 + d2 / (d0 * d0))) / lnorm
        return jnp.where(enough, score, -1.0), ali

    scores, alis = jax.lax.map(eval_offset, offsets, batch_size=64)
    b = jnp.argmax(scores)
    return alis[b]


# ---------------------------------------------------------------------------
# full pairwise alignment

@partial(jax.jit, static_argnames=("n_refine", "n_tm_iter"))
def _tmalign_batch(x, xm, y, ym, n_refine, n_tm_iter):
    """Batched TM-align. x/y [B,L,3], xm/ym [B,L] masks.

    Returns dict of [B] arrays: qtm, ttm, rmsd, len_ali, ali [B,L]."""

    def one(x1, xm1, y1, ym1):
        nx = jnp.sum(xm1).astype(jnp.int32)
        ny = jnp.sum(ym1).astype(jnp.int32)
        lmin = jnp.minimum(nx, ny).astype(jnp.float32)
        d0_min = tm_d0(lmin)
        L = x1.shape[0]

        def refine_chain(ali0, gap):
            def refine(carry, _):
                ali, best_score, best_ali = carry
                score, r, t = tm_score_search(x1, y1, ali, d0_min, lmin,
                                              n_tm_iter)
                better = score > best_score
                best_score = jnp.where(better, score, best_score)
                best_ali = jnp.where(better, ali, best_ali)
                xt = transform(r, t, x1)
                d2 = jnp.sum((xt[:, None, :] - y1[None, :, :]) ** 2, axis=-1)
                S = 1.0 / (1.0 + d2 / (d0_min * d0_min))
                S = jnp.where((xm1[:, None] > 0) & (ym1[None, :] > 0), S, NEG)
                ali_new = _dp_align(S, nx, ny, gap=gap)
                return (ali_new, best_score, best_ali), None

            init = (ali0, np.float32(-1.0), ali0)
            (ali_last, best_score, best_ali), _ = jax.lax.scan(
                refine, init, None, length=n_refine)
            # evaluate the last alignment too
            score_last, _, _ = tm_score_search(x1, y1, ali_last, d0_min,
                                               lmin, n_tm_iter)
            best_ali = jnp.where(score_last > best_score, ali_last, best_ali)
            return jnp.maximum(score_last, best_score), best_ali

        # independent refine basins, like the native backend's init list x
        # gap schedule: gapless threading finds the best shared diagonal;
        # the SS-match NW rescues pairs whose superposition has no long
        # gapless diagonal; fragment superposition rescues single-motif
        # cores; the zero-gap DP chains grow alignments that the
        # open-penalty chains fragment (measured +0.11/+0.12 qtm on a real
        # low-homology pair). All chains run under one vmap.
        thr = _threading_init(x1, y1, nx, ny, d0_min, lmin)
        ssa = _ss_init(x1, y1, xm1, ym1, nx, ny)
        frg = _fragment_init(x1, y1, xm1, ym1, nx, ny, d0_min)
        inits = jnp.stack([thr, ssa, frg, thr, ssa, frg])
        gaps = jnp.asarray([GAP, GAP, GAP, 0.0, 0.0, 0.0], jnp.float32)
        scores2, alis2 = jax.vmap(refine_chain)(inits, gaps)
        best_ali = alis2[jnp.argmax(scores2)]

        qtm, _, _ = tm_score_search(x1, y1, best_ali, tm_d0(nx), nx.astype(jnp.float32), n_tm_iter)
        ttm, r_b, t_b = tm_score_search(x1, y1, best_ali, tm_d0(ny), ny.astype(jnp.float32), n_tm_iter)

        w = (best_ali >= 0).astype(jnp.float32)
        yj = y1[jnp.clip(best_ali, 0, L - 1)]
        r2, t2 = kabsch(x1, yj, w)
        d2 = jnp.sum((transform(r2, t2, x1) - yj) ** 2, axis=-1)
        rmsd = jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0))
        return qtm, ttm, rmsd, jnp.sum(w).astype(jnp.int32), best_ali

    qtm, ttm, rmsd, len_ali, ali = jax.vmap(one)(x, xm, y, ym)
    return {"qtm": qtm, "ttm": ttm, "rmsd": rmsd, "len_ali": len_ali, "ali": ali}


# ---------------------------------------------------------------------------
# host-facing API

_BUCKETS = (64, 128, 256, 384, 512, 768, 1024, 1536, 2048)

# chains longer than the largest bucket are truncated by this backend;
# the dispatcher (align/__init__.py rescore_pairs) routes such pairs to
# the full-length native backend when it is available
MAX_BUCKET = _BUCKETS[-1]


def _bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


def tmalign_pairs(pairs: list[tuple], fast: bool = False) -> list[dict]:
    """Align a list of (query, target) pairs, where each element is a dict
    with 'coords' [N,3] float and 'seq' str.

    Returns one dict per pair with keys matching the reference's parsed
    TM-align output: len_ali, rmsd, seq_id, qtm, ttm.
    """
    n_refine, n_tm_iter = (4, 4) if fast else (10, 8)
    results = [None] * len(pairs)
    # group by common bucket so each shape jits once
    groups: dict[int, list[int]] = {}
    for i, (q, t) in enumerate(pairs):
        b = _bucket(max(len(q["coords"]), len(t["coords"])))
        groups.setdefault(b, []).append(i)

    for b, all_idxs in sorted(groups.items()):
        # bound per-dispatch device memory: the refine bank materialises
        # ~6 chains x [b, b] f32 similarity matrices per pair, so cap the
        # batch at ~2 GB of S-matrices and loop (a 2048-residue bucket
        # still dispatches 21 pairs at once; small buckets are unaffected)
        cap = max(1, (1 << 31) // (24 * b * b))
        for c0 in range(0, len(all_idxs), cap):
            idxs = all_idxs[c0:c0 + cap]
            _align_bucket(pairs, idxs, b, n_refine, n_tm_iter, results)
    return results


def _align_bucket(pairs, idxs, b, n_refine, n_tm_iter, results):
    """Align one bucket-shaped chunk of pairs; writes into results[i]."""
    B = len(idxs)
    x = np.zeros((B, b, 3), np.float32)
    y = np.zeros((B, b, 3), np.float32)
    xm = np.zeros((B, b), np.float32)
    ym = np.zeros((B, b), np.float32)
    for k, i in enumerate(idxs):
        q, t = pairs[i]
        nq, nt = min(len(q["coords"]), b), min(len(t["coords"]), b)
        x[k, :nq] = q["coords"][:nq]
        y[k, :nt] = t["coords"][:nt]
        xm[k, :nq] = 1
        ym[k, :nt] = 1
    out = _tmalign_batch(jnp.asarray(x), jnp.asarray(xm),
                         jnp.asarray(y), jnp.asarray(ym),
                         n_refine, n_tm_iter)
    qtm = np.asarray(out["qtm"])
    ttm = np.asarray(out["ttm"])
    rmsd = np.asarray(out["rmsd"])
    len_ali = np.asarray(out["len_ali"])
    ali = np.asarray(out["ali"])
    for k, i in enumerate(idxs):
        q, t = pairs[i]
        n_id = seq_identity_count(q["seq"][:b], t["seq"], ali[k])
        la = int(len_ali[k])
        # structures longer than the largest bucket are aligned over
        # their first `b` residues; renormalise the TM-scores by the
        # TRUE chain lengths so truncation can only underestimate
        # (the in-kernel score normalises by the truncated length,
        # which would inflate qtm/ttm up to len/b times — the native
        # backend aligns full-length and would reject such hits)
        qv, tv = float(qtm[k]), float(ttm[k])
        if len(q["coords"]) > b:
            qv *= b / len(q["coords"])
            logger.warning(
                "TM-align TPU backend truncated a %d-residue query to "
                "%d; qtm renormalised by the full length (conservative)",
                len(q["coords"]), b)
        if len(t["coords"]) > b:
            tv *= b / len(t["coords"])
        results[i] = {
            "len_ali": la,
            "rmsd": float(rmsd[k]),
            "seq_id": (n_id / la) if la else 0.0,
            "qtm": qv,
            "ttm": tv,
        }


def run_tmalign_pair(query: dict, target: dict, fast: bool = False) -> dict:
    """Single-pair convenience wrapper (drop-in for the reference's
    run_tmalign subprocess call)."""
    return tmalign_pairs([(query, target)], fast=fast)[0]
