"""Tests for the native C++ TM-align library (merizo_search_tpu/align/_native/tmalign.cpp).

Built on first use via g++; validates TM-score conventions (self-alignment,
fragment normalisation asymmetry), robustness on real structures, agreement
with the batched JAX aligner, and the threaded batch API.
"""

import numpy as np
import pytest

from merizo_search_tpu.align import native, rescore_pairs


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ build unavailable")


def _walk(rng, n, step=1.8):
    return np.cumsum(rng.normal(size=(n, 3)) * step, axis=0).astype(np.float32)


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_self_alignment(rng):
    c = _walk(rng, 100)
    s = {"coords": c, "seq": "A" * 100}
    r = native.tmalign_pairs_native([(s, s)])[0]
    assert r["qtm"] == pytest.approx(1.0, abs=1e-6)
    assert r["ttm"] == pytest.approx(1.0, abs=1e-6)
    assert r["len_ali"] == 100
    assert r["rmsd"] == pytest.approx(0.0, abs=1e-6)
    assert r["seq_id"] == 1.0


def test_rigid_transform_with_noise(rng):
    c = _walk(rng, 150)
    s = {"coords": c, "seq": "A" * 150}
    t = {"coords": c @ _rot(0.7).T + np.float32([4, -2, 9])
         + rng.normal(size=(150, 3)).astype(np.float32) * 0.3,
         "seq": "A" * 150}
    r = native.tmalign_pairs_native([(s, t)])[0]
    assert r["qtm"] > 0.95
    assert r["len_ali"] >= 145


def test_fragment_normalisation(rng):
    """Target = 60-residue fragment of the 120-residue query: ttm ~ 1
    (normalised by target), qtm ~ 0.5 (normalised by query)."""
    c = _walk(rng, 120)
    s = {"coords": c, "seq": "A" * 120}
    frag = {"coords": (c[30:90] @ _rot(1.1).T + 5.0).astype(np.float32),
            "seq": "A" * 60}
    r = native.tmalign_pairs_native([(s, frag)])[0]
    assert r["ttm"] > 0.98
    assert r["qtm"] == pytest.approx(r["ttm"] * 60 / 120, rel=0.05)
    assert r["len_ali"] == pytest.approx(60, abs=2)


def test_real_structures_self(examples_dir):
    from merizo_search_tpu.io.pdb import read_ca

    s = read_ca(f"{examples_dir}/3w5h.pdb", chain="A")
    q = {"coords": s["coords"], "seq": s["seq"]}
    r = native.tmalign_pairs_native([(q, q)])[0]
    assert r["qtm"] == pytest.approx(1.0, abs=1e-6)
    assert r["len_ali"] == len(s["seq"])


def test_agreement_with_jax_aligner(rng):
    """On a homologous pair, native and JAX TM-aligns must agree closely
    (both optimise the same score; tolerances cover heuristic differences)."""
    from merizo_search_tpu.align.tmalign import tmalign_pairs

    c = _walk(rng, 90)
    noisy = c @ _rot(0.4).T + rng.normal(size=(90, 3)).astype(np.float32) * 0.5
    a = {"coords": c, "seq": "A" * 90}
    b = {"coords": noisy.astype(np.float32), "seq": "A" * 90}
    rn = native.tmalign_pairs_native([(a, b)])[0]
    rj = tmalign_pairs([(a, b)])[0]
    assert rn["qtm"] == pytest.approx(rj["qtm"], abs=0.03)
    assert rn["ttm"] == pytest.approx(rj["ttm"], abs=0.03)


def test_batch_threads_match_single(rng):
    pairs = []
    for i in range(6):
        n = 60 + 10 * i
        c = _walk(rng, n)
        d = c @ _rot(0.2 * i).T + rng.normal(size=(n, 3)).astype(np.float32) * 0.2
        pairs.append(({"coords": c, "seq": "A" * n},
                      {"coords": d.astype(np.float32), "seq": "A" * n}))
    seq = native.tmalign_pairs_native(pairs, nthreads=1)
    par = native.tmalign_pairs_native(pairs, nthreads=4)
    for a, b in zip(seq, par):
        assert a == b


def test_rescore_dispatcher(rng):
    c = _walk(rng, 80)
    s = {"coords": c, "seq": "A" * 80}
    r = rescore_pairs([(s, s)], backend="native")[0]
    assert r["qtm"] == pytest.approx(1.0, abs=1e-6)


def test_long_chain_routed_to_native(rng, monkeypatch):
    """Pairs past the TPU aligner's largest bucket (2048) must reach the
    full-length native backend even under backend="tpu" — the TPU path
    would truncate and renormalise (align/tmalign.py _align_bucket), which
    underestimates the true score (VERDICT r3 item 6)."""
    from merizo_search_tpu.align import tmalign as tpu_align

    n = tpu_align.MAX_BUCKET + 200
    c = _walk(rng, n)
    s = {"coords": c, "seq": "A" * n}

    called = {"tpu": 0}
    real = tpu_align.tmalign_pairs

    def spy(pairs, fast=False):
        called["tpu"] += 1
        return real(pairs, fast=fast)

    monkeypatch.setattr(tpu_align, "tmalign_pairs", spy)
    r = rescore_pairs([(s, s)], backend="tpu")[0]
    # native full-length self-alignment is exactly 1.0; the truncated TPU
    # path would renormalise to ~2048/2248 ~= 0.91
    assert r["qtm"] == pytest.approx(1.0, abs=1e-4)
    assert called["tpu"] == 0


def test_long_chain_mixed_batch_order_preserved(rng):
    """A batch mixing long (native-routed) and short (TPU-bucketed) pairs
    returns results in input order."""
    from merizo_search_tpu.align.tmalign import MAX_BUCKET

    nl = MAX_BUCKET + 100
    long_s = {"coords": _walk(rng, nl), "seq": "A" * nl}
    short_c = _walk(rng, 90)
    short_s = {"coords": short_c, "seq": "A" * 90}
    res = rescore_pairs([(long_s, long_s), (short_s, short_s)],
                        backend="tpu")
    assert res[0]["qtm"] == pytest.approx(1.0, abs=1e-4)
    assert res[1]["qtm"] == pytest.approx(1.0, abs=1e-4)
    assert res[0]["len_ali"] == nl
    assert res[1]["len_ali"] == 90
