import os

import numpy as np
import pytest

from merizo_search_tpu.align.kabsch import kabsch, transform
from merizo_search_tpu.align import tmalign
from merizo_search_tpu.io import pdb as pdbio


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _chain(rng, n):
    """Protein-like CA chain: random walk with ~3.8 A steps."""
    steps = rng.normal(size=(n, 3))
    steps = steps / np.linalg.norm(steps, axis=1, keepdims=True) * 3.8
    return np.cumsum(steps, axis=0).astype(np.float32)


def test_kabsch_recovers_rotation(rng):
    p = _chain(rng, 50)
    R = _random_rotation(rng)
    t = rng.normal(size=3) * 10
    q = p @ R.T + t
    w = np.ones(50, np.float32)
    Rj, tj = kabsch(p, q, w)
    np.testing.assert_allclose(np.asarray(Rj), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tj), t, atol=1e-3)
    pt = np.asarray(transform(Rj, tj, p))
    np.testing.assert_allclose(pt, q, atol=1e-3)


def test_selfalignment_is_perfect(rng):
    c = _chain(rng, 80)
    d = {"coords": c, "seq": "A" * 80}
    out = tmalign.run_tmalign_pair(d, d)
    assert out["qtm"] > 0.999
    assert out["ttm"] > 0.999
    assert out["len_ali"] == 80
    assert out["rmsd"] < 1e-2
    assert out["seq_id"] == 1.0


def test_rotated_copy_aligns(rng):
    c = _chain(rng, 100)
    R = _random_rotation(rng)
    c2 = (c @ R.T + rng.normal(size=3) * 20).astype(np.float32)
    out = tmalign.run_tmalign_pair({"coords": c, "seq": "A" * 100},
                                   {"coords": c2, "seq": "A" * 100})
    assert out["qtm"] > 0.999
    assert out["rmsd"] < 1e-2


def test_substructure_alignment(rng):
    """A fragment must align into the full structure with high TM (target-
    normalised) and correct aligned length."""
    full = _chain(rng, 120)
    frag = full[30:90]  # 60 residues
    R = _random_rotation(rng)
    frag = (frag @ R.T + 5.0).astype(np.float32)
    out = tmalign.run_tmalign_pair({"coords": frag, "seq": "A" * 60},
                                   {"coords": full, "seq": "A" * 120})
    assert out["len_ali"] >= 55
    assert out["rmsd"] < 0.5
    # qtm normalises by the fragment length -> near perfect
    assert out["qtm"] > 0.9


def test_unrelated_chains_score_low(rng):
    a = _chain(rng, 90)
    b = _chain(np.random.default_rng(123), 90)
    out = tmalign.run_tmalign_pair({"coords": a, "seq": "A" * 90},
                                   {"coords": b, "seq": "A" * 90})
    assert out["qtm"] < 0.45  # random chains: TM < ~0.3-0.4
    assert out["ttm"] < 0.45


def test_noisy_homolog_scores_high(rng):
    c = _chain(rng, 150)
    noisy = (c + rng.normal(size=c.shape) * 1.0).astype(np.float32)
    R = _random_rotation(rng)
    noisy = (noisy @ R.T - 3.0).astype(np.float32)
    out = tmalign.run_tmalign_pair({"coords": c, "seq": "A" * 150},
                                   {"coords": noisy, "seq": "A" * 150})
    assert out["qtm"] > 0.8
    assert out["len_ali"] >= 140


def test_real_structure_self_and_cross(examples_dir):
    q1 = pdbio.read_ca(os.path.join(examples_dir, "AF-Q96HM7-F1-model_v4.pdb"))
    out = tmalign.run_tmalign_pair(q1, q1, fast=True)
    assert out["qtm"] > 0.999 and out["seq_id"] == 1.0

    q2 = pdbio.read_ca(os.path.join(examples_dir, "M0.pdb"))
    cross = tmalign.run_tmalign_pair(q2, q1, fast=True)
    assert 0.0 <= cross["qtm"] <= 1.0
    assert cross["len_ali"] <= len(q2["seq"])


def test_batched_matches_single(rng):
    a = _chain(rng, 70)
    b = _chain(rng, 85)
    c = _chain(rng, 60)
    da = {"coords": a, "seq": "A" * 70}
    db = {"coords": b, "seq": "C" * 85}
    dc = {"coords": c, "seq": "D" * 60}
    batch = tmalign.tmalign_pairs([(da, db), (da, dc), (db, dc)])
    singles = [tmalign.run_tmalign_pair(*p) for p in [(da, db), (da, dc), (db, dc)]]
    for got, want in zip(batch, singles):
        assert abs(got["qtm"] - want["qtm"]) < 1e-5
        assert got["len_ali"] == want["len_ali"]


def test_seq_identity_count_matches_loop():
    from merizo_search_tpu.align.seqid import seq_identity_count
    rng = np.random.default_rng(7)
    for _ in range(20):
        nq, nt = rng.integers(0, 40, 2)
        qs = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), nq))
        ts = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), nt))
        ali = rng.integers(-1, max(nt, 1) + 5, nq + 3).astype(np.int32)
        ref = 0
        for xi in range(min(len(qs), len(ali))):
            j = ali[xi]
            if 0 <= j < len(ts) and qs[xi] == ts[j]:
                ref += 1
        assert seq_identity_count(qs, ts, ali) == ref


def _fold(rng, n=60):
    return np.cumsum(rng.normal(size=(n, 3)) * 1.5, axis=0).astype(np.float32)


def test_near_threshold_recheck_routes_to_native(rng, monkeypatch):
    """With backend='tpu' and decision_tm set, pairs whose batched TM lands
    within NEAR_THRESHOLD_BAND of the threshold must be re-aligned with the
    native backend; pairs far from the threshold keep the batched result."""
    from merizo_search_tpu import align
    from merizo_search_tpu.align import native

    a, b = _fold(rng), _fold(rng)
    pairs = [({"coords": a, "seq": "A" * len(a)},
              {"coords": b, "seq": "A" * len(b)})] * 3

    tpu_scores = [0.51, 0.90, 0.495]  # near, far, near (mintm=0.5)
    calls = {"native": []}

    def fake_tpu(pairs, fast=False):
        return [{"len_ali": 10, "rmsd": 1.0, "seq_id": 0.5,
                 "qtm": s, "ttm": s - 0.01} for s in tpu_scores[:len(pairs)]]

    def fake_native(pairs, fast=False, nthreads=0):
        calls["native"].append(len(pairs))
        return [{"len_ali": 11, "rmsd": 0.9, "seq_id": 0.5,
                 "qtm": 0.42, "ttm": 0.40}] * len(pairs)

    monkeypatch.setattr(align.tmalign, "tmalign_pairs", fake_tpu)
    monkeypatch.setattr(native, "available", lambda: True)
    monkeypatch.setattr(native, "tmalign_pairs_native", fake_native)

    res = align.rescore_pairs(pairs, backend="tpu", decision_tm=0.5)
    assert calls["native"] == [2]          # only the two near-threshold pairs
    assert res[0]["qtm"] == 0.42           # re-checked
    assert res[1]["qtm"] == 0.90           # batched result kept
    assert res[2]["qtm"] == 0.42           # re-checked

    # no decision threshold -> no recheck at all
    calls["native"].clear()
    res = align.rescore_pairs(pairs, backend="tpu")
    assert calls["native"] == []
    assert [r["qtm"] for r in res] == tpu_scores
