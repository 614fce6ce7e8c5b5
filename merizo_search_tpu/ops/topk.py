"""Exact cosine/IP top-k over embedding databases.

This is the TPU replacement for the reference's two scan paths:
- torch dense scan: F.cosine_similarity + torch.topk over the whole DB
  (dbsearch.py:75-81)
- faiss block scan: IndexFlat.add/search per memmap block merged in a
  ResultHeap (dbsearch.py:213-248)

Here the scan is a lax.scan over DB chunks: each step is one MXU matmul
Q[nq,128] @ chunk^T plus a top-k merge of the running candidates. The DB is
read from HBM exactly once; at large DB sizes throughput is HBM-bandwidth
bound, which is the speed-of-light for exact flat search.

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

NEG_INF = jnp.float32(-jnp.inf)


def l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _merge_topk(vals, idxs, new_vals, new_idxs, k):
    """Merge running top-k [Q,k] with a fresh score block [Q,C]."""
    av = jnp.concatenate([vals, new_vals], axis=1)
    ai = jnp.concatenate([idxs, new_idxs], axis=1)
    v, sel = jax.lax.top_k(av, k)
    i = jnp.take_along_axis(ai, sel, axis=1)
    return v, i


@partial(jax.jit, static_argnames=("k", "chunk"))
def topk_scan(q, db, n_valid, k, chunk, tlen=None, qlen=None, mincov=0.0):
    """Exact top-k inner-product search.

    q       [Q, D]  query embeddings (pre-normalised for cosine)
    db      [Npad, D] database block (rows >= n_valid are padding; Npad % chunk == 0)
    n_valid scalar  number of valid rows
    tlen    [Npad]  optional target lengths for the mincov filter
    qlen    [Q]     query lengths (required with tlen)

    Returns (scores [Q,k], indices [Q,k]) sorted descending; masked/padded
    entries carry -inf.
    """
    qn, d = q.shape
    npad = db.shape[0]
    nchunks = npad // chunk
    dbr = db.reshape(nchunks, chunk, d)
    tl = (tlen.reshape(nchunks, chunk) if tlen is not None
          else jnp.zeros((nchunks, chunk), jnp.float32))
    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk

    init = (jnp.full((qn, k), NEG_INF), jnp.full((qn, k), -1, jnp.int32))

    def body(carry, x):
        blk, tlens, start = x
        # HIGHEST precision: on TPU, fp32 matmuls otherwise round operands to
        # bf16, which perturbs cosine scores by ~1e-2 and reorders close hits.
        # (bf16-stored DBs still take the fast path: dot of bf16 inputs.)
        s = jnp.dot(q, blk.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        gi = start + jnp.arange(chunk, dtype=jnp.int32)
        s = jnp.where(gi[None, :] < n_valid, s, NEG_INF)
        if qlen is not None:
            s = jnp.where(qlen[:, None] >= tlens[None, :] * mincov, s, NEG_INF)
        vals, idxs = _merge_topk(carry[0], carry[1], s,
                                 jnp.broadcast_to(gi[None, :], s.shape), k)
        return (vals, idxs), None

    (vals, idxs), _ = jax.lax.scan(body, init, (dbr, tl, starts))
    return vals, idxs


def pad_db(db: np.ndarray, multiple: int, extra_cols: dict | None = None):
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
