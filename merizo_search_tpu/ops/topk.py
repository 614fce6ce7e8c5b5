"""Exact cosine/IP top-k over embedding databases.

This is the TPU replacement for the reference's two scan paths:
- torch dense scan: F.cosine_similarity + torch.topk over the whole DB
  (dbsearch.py:75-81)
- faiss block scan: IndexFlat.add/search per memmap block merged in a
  ResultHeap (dbsearch.py:213-248)

The scan is a lax.scan over DB chunks: each step is one MXU matmul
Q[nq,128] @ chunk^T plus a top-k selection. The DB is read from HBM exactly
once, so at scale throughput is HBM-bandwidth bound — the speed-of-light for
exact flat search.

Selection is the hard part on TPU: lax.top_k over a [Q, chunk] score block is
a full sort and measured ~50x slower than the matmul itself. Two fast paths:

- "exact" (default): hierarchical block-max selection. Scores are reshaped
  into width-`bs` lanes blocks; every true top-k element lives in a block
  whose max is >= the k-th best value, and at most k such blocks exist, so
  gathering the top-k blocks by their maxima and selecting within them is
  EXACT. The gather is done as a one-hot MXU matmul (dynamic gathers are
  slow on TPU). Measured ~8x faster than lax.top_k per chunk.
- "approx": jax.lax.approx_max_k (the TPU PartialReduce op, cf. TPU-KNN,
  arXiv:2206.14286) with a recall target; runs at essentially matmul speed
  (~95% of HBM bandwidth) for recall ~0.95-0.99.

Length/coverage masking (reference dbsearch.py:76: keep target iff
len(query) >= len(target) * mincov) is applied inside the scan with -inf
scores (the reference multiplies scores by 0 instead; entries differ only
below the mincos significance threshold, where hits are discarded anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-np.inf)
BLOCK = 128  # lanes-aligned block width for hierarchical selection


def l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _merge_topk(vals, idxs, new_vals, new_idxs, k):
    """Merge running top-k [Q,k] with fresh candidates [Q,C]."""
    av = jnp.concatenate([vals, new_vals], axis=1)
    ai = jnp.concatenate([idxs, new_idxs], axis=1)
    v, sel = jax.lax.top_k(av, k)
    i = jnp.take_along_axis(ai, sel, axis=1)
    return v, i


def _select_chunk(s, gstart, k, selection, recall_target):
    """Top-k candidates of one score chunk s [Q,C]. Returns (vals [Q,m],
    global idxs [Q,m]) with m >= k covering all true chunk top-k ("exact")
    or an approximation ("approx")."""
    qn, c = s.shape
    if selection == "approx" and c >= 4 * k:
        v, i = jax.lax.approx_max_k(s, k, recall_target=recall_target)
        return v, gstart + i.astype(jnp.int32)
    if selection == "exact" and c >= 4 * k * BLOCK and c % BLOCK == 0:
        nb = c // BLOCK
        sb = s.reshape(qn, nb, BLOCK)
        bm = jnp.max(sb, axis=-1)                      # [Q, nb]
        _, bidx = jax.lax.top_k(bm, k)                 # top-k blocks: exact cover
        # gather the selected blocks with a one-hot MXU matmul (dynamic
        # gathers are slow on TPU). A single bf16 pass would round the
        # scores, so gather a double-bf16 decomposition (hi + residual):
        # onehot entries are exactly 0/1, accumulation is fp32, giving
        # ~16-bit-mantissa accurate candidate values.
        onehot = (bidx[:, :, None] == np.arange(nb)[None, None, :]).astype(jnp.bfloat16)
        hi = sb.astype(jnp.bfloat16)
        # -inf (masked) rows: -inf - -inf = nan; zero the residual there
        lo = jnp.where(jnp.isfinite(sb), sb - hi.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        cand = (jnp.einsum("qkb,qbc->qkc", onehot, hi, preferred_element_type=jnp.float32)
                + jnp.einsum("qkb,qbc->qkc", onehot, lo, preferred_element_type=jnp.float32))
        cidx = (bidx[:, :, None] * BLOCK + np.arange(BLOCK)[None, None, :])
        return (cand.reshape(qn, k * BLOCK),
                gstart + cidx.reshape(qn, k * BLOCK).astype(jnp.int32))
    # small chunk: plain top_k is fine
    kk = min(k, c)
    v, i = jax.lax.top_k(s, kk)
    return v, gstart + i.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "chunk", "precision", "selection",
                                   "recall_target"))
def topk_scan(q, db, n_valid, k, chunk, tlen=None, qlen=None, mincov=0.0,
              precision=jax.lax.Precision.HIGHEST, selection="exact",
              recall_target=0.95):
    """Exact (or opt-in approximate) top-k inner-product search.

    q       [Q, D]  query embeddings (pre-normalised for cosine)
    db      [Npad, D] database block (rows >= n_valid are padding; Npad % chunk == 0)
    n_valid scalar  number of valid rows
    tlen    [Npad]  optional target lengths for the mincov filter
    qlen    [Q]     query lengths (required with tlen)
    selection  "exact" | "approx"

    Returns (scores [Q,k], indices [Q,k]) sorted descending; masked/padded
    entries carry -inf.
    """
    qn, d = q.shape
    npad = db.shape[0]
    nchunks = npad // chunk
    dbr = db.reshape(nchunks, chunk, d)
    tl = (tlen.reshape(nchunks, chunk) if tlen is not None
          else jnp.zeros_like(db, shape=(nchunks, chunk), dtype=jnp.float32))
    starts = np.arange(nchunks, dtype=np.int32) * chunk

    init = (jnp.full_like(q, NEG_INF, shape=(qn, k), dtype=jnp.float32),
            jnp.full_like(q, -1, shape=(qn, k), dtype=jnp.int32))

    def body(carry, x):
        blk, tlens, start = x
        # HIGHEST precision by default: on TPU, fp32 matmuls otherwise round
        # operands to bf16, perturbing cosine scores by ~1e-2 and reordering
        # close hits. bf16-stored DBs pass precision=DEFAULT for the native
        # single-pass MXU path.
        s = jnp.dot(q, blk.T, preferred_element_type=jnp.float32,
                    precision=precision)
        gi = start + np.arange(chunk, dtype=np.int32)
        s = jnp.where(gi[None, :] < n_valid, s, NEG_INF)
        if qlen is not None:
            s = jnp.where(qlen[:, None] >= tlens[None, :] * mincov, s, NEG_INF)
        cv, ci = _select_chunk(s, start, k, selection, recall_target)
        vals, idxs = _merge_topk(carry[0], carry[1], cv, ci, k)
        return (vals, idxs), None

    (vals, idxs), _ = jax.lax.scan(body, init, (dbr, tl, starts))
    idxs = jnp.where(jnp.isfinite(vals), idxs, -1)
    return vals, idxs


def pad_db(db: np.ndarray, multiple: int):
    """Pad a [N,D] array to a row multiple; returns (padded, n_valid)."""
    n = db.shape[0]
    npad = ((n + multiple - 1) // multiple) * multiple
    if npad == n:
        return db, n
    out = np.zeros((npad, db.shape[1]), dtype=db.dtype)
    out[:n] = db
    return out, n


@partial(jax.jit, static_argnames=("k",))
def merge_partials(vals, idxs, k):
    """Merge per-shard/block partial top-k results.

    vals/idxs [P, Q, k] -> (scores [Q,k], indices [Q,k]).
    """
    p, qn, kk = vals.shape
    av = jnp.moveaxis(vals, 0, 1).reshape(qn, p * kk)
    ai = jnp.moveaxis(idxs, 0, 1).reshape(qn, p * kk)
    v, sel = jax.lax.top_k(av, k)
    return v, jnp.take_along_axis(ai, sel, axis=1)
