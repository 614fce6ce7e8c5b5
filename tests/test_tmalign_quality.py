"""TM-align quality quantification (VERDICT r2 item 5).

The reference invokes the published TM-align binary per hit pair
(Foldclass/utils.py:75-109); our two clean-room backends (in-process C++,
batched JAX) must be quantifiably trustworthy. The binary is stripped from
/root/reference and this environment has no network, so instead of
published pair scores these tests pin, with explicit tolerances:

1. frozen cross-backend scores on all pairs of the bundled REAL example
   structures (drift detection for both backends at once);
2. cross-backend agreement in the DECISION region (TM >= ~0.5, where the
   mintm=0.5 significance gate operates) on homolog constructions from a
   real structure — measured max |native - jax| = 0.0021;
3. the native fast-mode accuracy delta — measured max 0.0234 on real
   unrelated pairs, 0.0 in the decision region pairs tested;
4. an INDEPENDENT numpy rescore of the JAX aligner's returned alignment:
   the reported qtm must match the TM-score formula evaluated on its own
   alignment after Kabsch superposition.

Known divergence, documented: on UNRELATED real pairs (true TM ~ 0.03-0.3)
the JAX aligner can land up to ~0.03 qtm below the C++ backend (it was
~0.15 before the SS/fragment inits and zero-gap DP chains were added; on
two real pairs it now scores ABOVE the native backend). This region is
far below the mintm gate, so rescoring decisions are unaffected; the
dispatcher prefers the native backend when built (align/__init__.py).
"""

import itertools

import numpy as np
import pytest

from merizo_search_tpu.align.native import available, tmalign_pairs_native
from merizo_search_tpu.align.tmalign import tmalign_pairs
from merizo_search_tpu.io.pdb import read_ca

EXAMPLES = "/root/reference/examples"
NAMES = ["3w5h.pdb", "AF-Q96HM7-F1-model_v4.pdb",
         "AF-Q96PD2-F1-model_v4.pdb", "M0.pdb"]

# frozen from the current backends (regenerate by running the backends and
# updating — any silent numerics change in either backend trips this)
PINNED_NATIVE_QTM = {
    ("3w5h.pdb", "AF-Q96HM7-F1-model_v4.pdb"): 0.2761,
    ("3w5h.pdb", "AF-Q96PD2-F1-model_v4.pdb"): 0.2910,
    ("3w5h.pdb", "M0.pdb"): 0.0732,
    ("AF-Q96HM7-F1-model_v4.pdb", "AF-Q96PD2-F1-model_v4.pdb"): 0.3017,
    ("AF-Q96HM7-F1-model_v4.pdb", "M0.pdb"): 0.0508,
    ("AF-Q96PD2-F1-model_v4.pdb", "M0.pdb"): 0.0322,
}
PINNED_JAX_QTM = {
    ("3w5h.pdb", "AF-Q96HM7-F1-model_v4.pdb"): 0.3000,
    ("3w5h.pdb", "AF-Q96PD2-F1-model_v4.pdb"): 0.2903,
    ("3w5h.pdb", "M0.pdb"): 0.0700,
    ("AF-Q96HM7-F1-model_v4.pdb", "AF-Q96PD2-F1-model_v4.pdb"): 0.2717,
    ("AF-Q96HM7-F1-model_v4.pdb", "M0.pdb"): 0.0520,
    ("AF-Q96PD2-F1-model_v4.pdb", "M0.pdb"): 0.0305,
}


@pytest.fixture(scope="module")
def structs():
    out = {}
    for n in NAMES:
        d = read_ca(f"{EXAMPLES}/{n}")
        out[n] = {"coords": d["coords"], "seq": d["seq"]}
    return out


def _rigid(rng, c, noise):
    a = rng.normal(size=3)
    a /= np.linalg.norm(a)
    th = 1.1
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    return (c @ R.T + 5.0 + rng.normal(size=c.shape) * noise).astype(np.float32)


@pytest.mark.skipif(not available(), reason="native aligner not built")
def test_real_pairs_pinned_both_backends(structs):
    pairs = list(itertools.combinations(NAMES, 2))
    plist = [(structs[a], structs[b]) for a, b in pairs]
    nat = tmalign_pairs_native(plist)
    jx = tmalign_pairs(plist)
    for (a, b), rn, rj in zip(pairs, nat, jx):
        assert abs(rn["qtm"] - PINNED_NATIVE_QTM[(a, b)]) <= 0.02, (a, b, rn)
        assert abs(rj["qtm"] - PINNED_JAX_QTM[(a, b)]) <= 0.02, (a, b, rj)
    # self pairs are exactly 1.0 on both backends
    selfp = [(structs[n], structs[n]) for n in NAMES]
    for r in tmalign_pairs_native(selfp) + tmalign_pairs(selfp):
        assert abs(r["qtm"] - 1.0) <= 1e-4 and abs(r["ttm"] - 1.0) <= 1e-4


@pytest.mark.skipif(not available(), reason="native aligner not built")
def test_decision_region_cross_backend_agreement(structs):
    """Where the mintm=0.5 gate operates, the two backends agree to 0.01."""
    rng = np.random.default_rng(0)
    c = structs["3w5h.pdb"]["coords"]
    s = structs["3w5h.pdb"]["seq"]
    m = int(len(c) * 0.6)
    pairs = [({"coords": c, "seq": s},
              {"coords": _rigid(rng, c, noise), "seq": s})
             for noise in (0.5, 1.5, 3.0)]
    pairs.append(({"coords": c[:m], "seq": s[:m]},
                  {"coords": _rigid(rng, c, 1.0), "seq": s}))
    nat = tmalign_pairs_native(pairs)
    jx = tmalign_pairs(pairs)
    assert min(r["qtm"] for r in nat) > 0.55  # all in the decision region
    for rn, rj in zip(nat, jx):
        assert abs(rn["qtm"] - rj["qtm"]) <= 0.01, (rn["qtm"], rj["qtm"])


@pytest.mark.skipif(not available(), reason="native aligner not built")
def test_fast_mode_delta_bounded(structs):
    """-fast (reference dbsearch.py:162 flag) trades accuracy for speed;
    the measured delta stays within 0.03 qtm on real pairs and ~0 for
    self/homolog pairs."""
    pairs = [(structs[a], structs[b])
             for a, b in itertools.combinations(NAMES, 2)]
    pairs += [(structs[n], structs[n]) for n in NAMES]
    full = tmalign_pairs_native(pairs)
    fast = tmalign_pairs_native(pairs, fast=True)
    deltas = [abs(a["qtm"] - b["qtm"]) for a, b in zip(full, fast)]
    assert max(deltas) <= 0.03, deltas
    # self pairs are exact in fast mode too
    for r in fast[-len(NAMES):]:
        assert abs(r["qtm"] - 1.0) <= 1e-4


def _kabsch(p, q):
    pc, qc = p - p.mean(0), q - q.mean(0)
    u, _, vt = np.linalg.svd(pc.T @ qc)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    R = vt.T @ np.diag([1, 1, d]) @ u.T
    return R, q.mean(0) - p.mean(0) @ R.T


def test_jax_reported_score_matches_independent_rescore(structs):
    """The reported qtm must equal the TM-score formula evaluated on the
    aligner's OWN returned alignment under an independently-computed
    superposition — validates the score semantics end to end."""
    import jax.numpy as jnp

    from merizo_search_tpu.align.tmalign import _tmalign_batch, _bucket

    rng = np.random.default_rng(3)
    c = structs["3w5h.pdb"]["coords"]
    y = _rigid(rng, c, 1.0)
    b = _bucket(max(len(c), len(y)))
    x = np.zeros((1, b, 3), np.float32)
    yy = np.zeros((1, b, 3), np.float32)
    xm = np.zeros((1, b), np.float32)
    ym = np.zeros((1, b), np.float32)
    x[0, :len(c)] = c
    yy[0, :len(y)] = y
    xm[0, :len(c)] = 1
    ym[0, :len(y)] = 1
    out = _tmalign_batch(jnp.asarray(x), jnp.asarray(xm), jnp.asarray(yy),
                         jnp.asarray(ym), 5, 20)
    qtm = float(np.asarray(out["qtm"])[0])
    ali = np.asarray(out["ali"])[0]  # query pos -> target idx, -1 unaligned

    qi = np.nonzero((ali >= 0) & (np.arange(b) < len(c)))[0]
    ti = ali[qi]
    p, q = c[qi], y[ti]
    lq = len(c)
    d0 = 1.24 * (lq - 15) ** (1 / 3) - 1.8
    # TM-score refinement on the fixed alignment: Kabsch on an inlier subset,
    # iterate the subset by distance cutoff (the published protocol's core)
    best = 0.0
    sel = np.ones(len(p), bool)
    for _ in range(8):
        R, t = _kabsch(p[sel], q[sel])
        d = np.linalg.norm(p @ R.T + t - q, axis=1)
        best = max(best, float(np.sum(1.0 / (1.0 + (d / d0) ** 2)) / lq))
        new = d < max(d0, 4.5)
        if new.sum() >= 4 and not np.array_equal(new, sel):
            sel = new
        else:
            break
    assert abs(qtm - best) <= 0.02, (qtm, best)
