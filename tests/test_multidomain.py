"""Unit tests for multi-domain (full-length chain) search.

Covers the pure logic (chain-id mapping, neighbour expansion over a
chain-ordered DB, assignment-path enumeration and match categories 0-3,
reference dbsearch_fulllength.py:36-180) plus an end-to-end run against a
synthetic chain-ordered database where the expected MDA match is known by
construction.
"""

import numpy as np
import pytest

from merizo_search_tpu.db import codecs
from merizo_search_tpu.pipeline import multidomain as md


def test_domid2chainid():
    assert md.domid2chainid("cath-dompdb/2pi4A04.pdb") == "2pi4A"
    assert md.domid2chainid("AF-Q12345-F1_TED02.pdb") == "AF-Q12345-F1"
    assert md.domid2chainid("plainname.pdb") == "plainname"


def _cat(mtx, nhd=None):
    nqd = mtx.shape[0]
    nhd = nhd if nhd is not None else mtx.shape[1]
    hds = [{"hd": f"h{j:02d}", "hm": "{ }"} for j in range(mtx.shape[1])]
    return md._submatrix_to_hits(mtx, "qc", "hc", [f"q{i}" for i in range(nqd)], hds)


def test_match_category_exact_mda():
    # 2 query domains onto a 2-domain chain, in order: category 3
    res = _cat(np.array([[0.9, 0.0], [0.0, 0.8]]))
    assert len(res) == 1
    assert res[0][4] == 3


def test_match_category_contiguous_subrange():
    # ordered, consecutive columns of a larger chain: category 2
    res = _cat(np.array([[0.0, 0.9, 0.0, 0.0], [0.0, 0.0, 0.8, 0.0]]))
    assert [r[4] for r in res] == [2]


def test_match_category_ordered_with_gaps():
    res = _cat(np.array([[0.9, 0.0, 0.0], [0.0, 0.0, 0.8]]))
    assert [r[4] for r in res] == [1]


def test_match_category_unordered():
    # query domain order reversed on the hit chain: category 0
    res = _cat(np.array([[0.0, 0.9], [0.8, 0.0]]))
    assert [r[4] for r in res] == [0]


def test_no_result_when_a_query_domain_unmatched():
    assert _cat(np.array([[0.9, 0.0], [0.0, 0.0]])) == []


def test_paths_cannot_reuse_a_hit_domain():
    # both query domains only match hit domain 0: no valid assignment
    assert _cat(np.array([[0.9, 0.0], [0.8, 0.0]])) == []


def test_dense_matrix_enumeration_is_bounded(monkeypatch):
    """A dense hit matrix whose raw cartesian product would explode
    (12^8 ~ 4.3e8 paths) must fall back to the score-ranked beam: bounded
    output that still contains the best-scoring (here: diagonal, exact-MDA)
    assignment."""
    nqd, nhd = 8, 12
    rng = np.random.default_rng(7)
    mtx = rng.uniform(0.5, 0.7, size=(nqd, nhd))
    for i in range(nqd):
        mtx[i, i] = 0.95  # the diagonal assignment dominates
    monkeypatch.setattr(md, "MAX_ASSIGNMENT_PATHS", 2000)
    res = _cat(mtx)
    assert 0 < len(res) <= 2000
    for r in res:
        cols = [f.split(":")[1] for f in r[5].split(",")]
        assert len(set(cols)) == nqd  # injective assignments only
    # the dominant diagonal path survives the beam, scored best-first
    top_cols = [f.split(":")[1] for f in res[0][5].split(",")]
    assert top_cols == [f"h{j:02d}" for j in range(nqd)]
    # diagonal of a wider chain = ordered consecutive prefix: category 2
    assert res[0][4] == 2


def test_beam_paths_injective_and_ranked():
    mtx = np.array([[0.9, 0.2, 0.1],
                    [0.8, 0.7, 0.1],
                    [0.1, 0.2, 0.6]])
    hd = [[0, 1, 2]] * 3
    paths = md._beam_paths(hd, mtx, beam=4)
    assert all(len(set(p)) == 3 for p in paths)
    scores = [sum(mtx[i, j] for i, j in enumerate(p)) for p in paths]
    assert scores == sorted(scores, reverse=True)
    assert paths[0] == [0, 1, 2]


def test_beam_keeps_exhaustive_ranking():
    """On dense matrices small enough to enumerate exhaustively, the beam
    must keep exactly the assignments the exhaustive cartesian enumeration
    (reference dbsearch_fulllength.py:95-180) would have ranked first by
    total pair score — i.e. the beam fallback changes *when* enumeration
    stops, never *which* top assignments are reported."""
    from itertools import product, permutations

    rng = np.random.default_rng(11)
    for trial in range(8):
        nqd, nhd = rng.integers(3, 6), rng.integers(4, 7)
        mtx = rng.uniform(0.05, 1.0, size=(nqd, nhd))
        hd = [list(range(nhd))] * nqd
        # exhaustive: every injective path, ranked by total score
        exhaustive = sorted(
            (p for p in product(*hd) if len(set(p)) == nqd),
            key=lambda p: -sum(mtx[i, j] for i, j in enumerate(p)))
        for beam in (1, 5, 25):
            got = md._beam_paths(hd, mtx, beam=beam)
            want = [list(p) for p in exhaustive[:beam]]
            # scores must match rank-for-rank (ties may permute paths)
            gs = [sum(mtx[i, j] for i, j in enumerate(p)) for p in got]
            ws = [sum(mtx[i, j] for i, j in enumerate(p)) for p in want]
            np.testing.assert_allclose(gs, ws, rtol=1e-12)
        # full-width beam reproduces the entire exhaustive ranking
        full = md._beam_paths(hd, mtx, beam=len(exhaustive) + 10)
        assert [tuple(p) for p in full] == [tuple(p) for p in exhaustive]


@pytest.fixture()
def chain_db(tmp_path, rng):
    """9-entry DB ordered by chain: chainX (3 domains), chainY (2), single Z."""
    names = ["chainX_01", "chainX_02", "chainX_03",
             "chainY_01", "chainY_02", "zsolo_01"]
    # shapes: reuse a few random folds so TM relationships are controlled
    folds = [np.cumsum(rng.normal(size=(70, 3)) * 1.8, axis=0).astype(np.float32)
             for _ in range(4)]
    # chainY's two domains are copies of chainX's first two
    coords = [folds[0], folds[1], folds[2], folds[0], folds[1], folds[3]]
    embs = rng.normal(size=(6, 128)).astype(np.float32)
    entries = [(n, c, "A" * len(c)) for n, c in zip(names, coords)]
    prefix = str(tmp_path / "chains")
    codecs.write_pt_db(prefix, embs, entries)
    return prefix, names, coords


def test_multidomain_end_to_end(chain_db):
    prefix, names, coords = chain_db
    # easy-search-style inputs: two query domains of one chain, identical to
    # chainX_01/chainX_02 (and hence chainY too)
    queries = [
        {"name": "myq_merizo_01", "coords": coords[0], "seq": "A" * 70},
        {"name": "myq_merizo_02", "coords": coords[1], "seq": "A" * 70},
    ]
    search_results = [
        {0: {"query": "myq_merizo_01", "target": "chainX_01", "dbindex": 0},
         1: {"query": "myq_merizo_01", "target": "chainY_01", "dbindex": 3}},
        {0: {"query": "myq_merizo_02", "target": "chainX_02", "dbindex": 1}},
    ]
    res = md.multi_domain_search(queries, search_results, prefix,
                                 inputs_from_easy_search=True, mintm=0.5)
    assert res, "expected multi-domain hits"
    by_chain = {}
    for qc, nqd, hc, nhd, cat, info, meta in res:
        assert qc == "myq"
        assert nqd == 2
        by_chain.setdefault(hc, []).append(cat)
    # chainX (3 domains) holds the queries in order as a prefix: category 2;
    # chainY (2 domains) matches exactly: category 3
    assert 2 in by_chain.get("chainX", [])
    assert 3 in by_chain.get("chainY", [])


def test_multidomain_embscore_mode(chain_db):
    """embscore mode: pair scores come from embedding cosine, no aligner.
    The DB embeddings are produced by the same (deterministic random-init)
    Foldclass params used for query embedding, so identical coordinates give
    cosine ~1.0 and the known MDA structure must be recovered."""
    from merizo_search_tpu.pipeline.embed import (embed_structures,
                                                  load_foldclass_params)

    prefix, names, coords = chain_db
    params = load_foldclass_params(None)
    embs = embed_structures(params, [np.asarray(c, np.float32) for c in coords])
    entries = [(n, c, "A" * len(c)) for n, c in zip(names, coords)]
    codecs.write_pt_db(prefix, embs.astype(np.float32), entries)

    queries = [
        {"name": "myq_merizo_01", "coords": coords[0], "seq": "A" * 70},
        {"name": "myq_merizo_02", "coords": coords[1], "seq": "A" * 70},
    ]
    search_results = [
        {0: {"query": "myq_merizo_01", "target": "chainX_01", "dbindex": 0},
         1: {"query": "myq_merizo_01", "target": "chainY_01", "dbindex": 3}},
        {0: {"query": "myq_merizo_02", "target": "chainX_02", "dbindex": 1}},
    ]
    res = md.multi_domain_search(queries, search_results, prefix,
                                 inputs_from_easy_search=True, mintm=0.999,
                                 mode="embscore")
    assert res, "expected multi-domain hits from embscore mode"
    by_chain = {}
    for qc, nqd, hc, nhd, cat, info, meta in res:
        assert qc == "myq" and nqd == 2
        by_chain.setdefault(hc, []).append(cat)
    assert 2 in by_chain.get("chainX", [])
    assert 3 in by_chain.get("chainY", [])
    # scores recorded in match_info are cosines ~1.0 for identical folds
    top = [r for r in res if r[2] == "chainY"][0]
    for field in top[5].split(","):
        assert float(field.split(":")[2]) > 0.999
