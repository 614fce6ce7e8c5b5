"""Structural alignment backends.

Two interchangeable TM-align implementations replace the reference's
per-pair TM-align subprocess (programs/Foldclass/utils.py:75-109):

- "native": in-process C++ library (merizo_search_tpu/align/_native/tmalign.cpp) with a std::thread
  batch API — the drop-in for the reference's bundled C++ binary, built on
  first use. Fast, sequential algorithm, best alignment quality.
- "tpu": batched JAX reimplementation (align/tmalign.py) — every pair in a
  length bucket aligns in one vmapped device call; useful when rescoring
  batches are huge and the TPU is otherwise idle.

"auto" prefers native and falls back to the JAX path if the toolchain is
unavailable.
"""

from __future__ import annotations


#: half-width of the decision band around a TM threshold inside which the
#: batched TPU aligner's result is re-checked with the native aligner.
#: tests/test_tmalign_quality.py bounds the TPU aligner's drift vs native at
#: ~0.01 in the decision region (|tm - 0.5| small) and ~0.03 on unrelated
#: pairs, so a 0.02 band covers every observed near-threshold disagreement.
NEAR_THRESHOLD_BAND = 0.02


def rescore_pairs(pairs: list[tuple], fast: bool = False,
                  backend: str = "auto", nthreads: int = 0,
                  decision_tm: float | None = None) -> list[dict]:
    """TM-align (query, target) coord/seq dict pairs.

    Returns one {len_ali, rmsd, seq_id, qtm, ttm} dict per pair (the schema
    of the reference's parsed TM-align output, Foldclass/utils.py:112-158).

    decision_tm: the TM threshold the caller will gate hits on (mintm).
    When the batched TPU backend produced a pair's score and
    max(qtm, ttm) lands within NEAR_THRESHOLD_BAND of this threshold, the
    pair is re-aligned with the native backend (when buildable) before the
    result is returned — the TPU aligner's worst-case drift vs native
    (~0.01 in the decision region) could otherwise flip hits exactly at
    the significance gate. Pairs far from the threshold keep the batched
    result; callers that do not gate (decision_tm=None) pay nothing.
    """
    if backend in ("auto", "native"):
        from . import native
        if native.available():
            return native.tmalign_pairs_native(pairs, fast=fast,
                                               nthreads=nthreads)
        if backend == "native":
            raise RuntimeError("native tmalign backend unavailable "
                               "(g++ build failed?)")
    from .tmalign import MAX_BUCKET, tmalign_pairs

    # The batched TPU aligner pads pairs into static length buckets; chains
    # past the largest bucket would be truncated (with a conservative
    # renormalisation). Those pairs are routed to the full-length native
    # backend instead when it is available — an explicit `backend="tpu"`
    # only degrades to truncation when the C++ library cannot be built.
    long_idx = [i for i, (q, t) in enumerate(pairs)
                if len(q["coords"]) > MAX_BUCKET
                or len(t["coords"]) > MAX_BUCKET]
    if long_idx:
        from . import native
        if native.available():
            long_set = set(long_idx)
            short_idx = [i for i in range(len(pairs)) if i not in long_set]
            results: list[dict | None] = [None] * len(pairs)
            long_res = native.tmalign_pairs_native(
                [pairs[i] for i in long_idx], fast=fast, nthreads=nthreads)
            for i, r in zip(long_idx, long_res):
                results[i] = r
            if short_idx:
                short_res = tmalign_pairs([pairs[i] for i in short_idx],
                                          fast=fast)
                short_res = _recheck_near_threshold(
                    [pairs[i] for i in short_idx], short_res, decision_tm,
                    fast, nthreads)
                for i, r in zip(short_idx, short_res):
                    results[i] = r
            return results
    results = tmalign_pairs(pairs, fast=fast)
    return _recheck_near_threshold(pairs, results, decision_tm, fast,
                                   nthreads)


def _recheck_near_threshold(pairs, results, decision_tm, fast, nthreads):
    """Re-align TPU-scored pairs whose max TM sits in the decision band
    with the native backend (no-op when decision_tm is None or the native
    library cannot be built)."""
    if decision_tm is None or not pairs:
        return results
    near = [i for i, r in enumerate(results)
            if abs(max(r["qtm"], r["ttm"]) - decision_tm)
            <= NEAR_THRESHOLD_BAND]
    if not near:
        return results
    from . import native
    if not native.available():
        return results
    redo = native.tmalign_pairs_native([pairs[i] for i in near], fast=fast,
                                       nthreads=nthreads)
    out = list(results)
    for i, r in zip(near, redo):
        out[i] = r
    return out
