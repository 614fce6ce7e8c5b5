"""IVF index tests (search/ivf.py + engine integration).

Verify the balanced build invariants, recall on clustered data, exactness
at full probe, mincov filtering, and the SearchEngine ivf mode.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from merizo_search_tpu.search.ivf import build_ivf, permute_db, ivf_search


@pytest.fixture(scope="module")
def mixture():
    # local deterministic rng: the shared session rng's state depends on
    # test order, which moved recall across the assertion threshold
    rng = np.random.default_rng(1234)
    N, D = 1 << 13, 128
    centers = rng.normal(size=(32, D)).astype(np.float32) * 3
    emb = centers[rng.integers(0, 32, N)] + rng.normal(size=(N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.choice(N, 8, replace=False)].copy()
    q += rng.normal(size=q.shape).astype(np.float32) * 0.02
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return emb, q


def test_build_is_balanced(mixture, rng):
    emb, _ = mixture
    ivf = build_ivf(emb, nlist=64, seed=1, expand=0.0)
    perm = ivf["perm"]
    c = ivf["cluster_rows"]
    assert len(perm) == 64 * c
    assert c % 128 == 0
    valid = perm[perm >= 0]
    assert len(valid) == len(emb)
    assert len(np.unique(valid)) == len(emb)  # a permutation: no dup/loss
    assert not ivf["dup"]


def test_build_multi_assignment(mixture):
    emb, _ = mixture
    ivf = build_ivf(emb, nlist=64, seed=1, expand=0.25)
    perm = ivf["perm"]
    c = ivf["cluster_rows"]
    assert len(perm) == 64 * c
    valid = perm[perm >= 0]
    # every row present at least once; slack filled with duplicates
    assert len(np.unique(valid)) == len(emb)
    assert ivf["dup"] and len(valid) > len(emb)
    assert len(valid) <= 64 * c
    # a duplicate never lands in its own primary cluster (same row twice in
    # one cluster would waste a slot): per cluster, members are unique
    for cl in range(64):
        rows = perm[cl * c:(cl + 1) * c]
        rows = rows[rows >= 0]
        assert len(np.unique(rows)) == len(rows)


def test_recall_and_exactness(mixture):
    emb, q = mixture
    K = 10
    ivf = build_ivf(emb, nlist=64, seed=1, expand=0.0)
    dbp = permute_db(emb, ivf)
    ref = np.argsort(-(q @ emb.T), axis=1)[:, :K]
    args = (jnp.asarray(q), jnp.asarray(dbp), jnp.asarray(ivf["centroids"]),
            jnp.asarray(ivf["perm"]))
    _, i8 = ivf_search(*args, K, 8, interpret=True)
    rec8 = np.mean([len(set(np.asarray(i8)[r]) & set(ref[r])) / K
                    for r in range(len(q))])
    assert rec8 > 0.9, f"recall@10 at nprobe=8/64 was {rec8}"
    # full probe == exact flat search
    v, i = ivf_search(*args, K, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), ref)


def test_dedup_full_probe_exact(mixture):
    """Multi-assigned layout at full probe: dedup'd results equal the flat
    scan as a SET with no id repeated (tie order may differ)."""
    emb, q = mixture
    K = 10
    ivf = build_ivf(emb, nlist=64, seed=1, expand=0.25)
    assert ivf["dup"]
    dbp = permute_db(emb, ivf)
    s = q @ emb.T
    ref_i = np.argsort(-s, axis=1)[:, :K]
    ref_v = np.take_along_axis(s, ref_i, axis=1)
    v, i = ivf_search(jnp.asarray(q), jnp.asarray(dbp),
                      jnp.asarray(ivf["centroids"]), jnp.asarray(ivf["perm"]),
                      K, 64, interpret=True, dedup=True)
    v, i = np.asarray(v), np.asarray(i)
    for r in range(len(q)):
        assert len(set(i[r])) == K  # no duplicate ids survive
        assert set(i[r]) == set(ref_i[r])
        np.testing.assert_allclose(np.sort(v[r]), np.sort(ref_v[r]),
                                   rtol=1e-5)


def test_rerank_exact_f32_values_and_recall(mixture):
    """f32 re-rank sidecar: with a bf16 storage scan, rerank_hi + the
    caller's f32 queries must (a) return values equal to the exact f32
    inner products of the returned ids and (b) never lose recall vs the
    storage-dtype ranking — the scan dtype's rounding noise, not probe
    misses, is what caps IVF recall (measured ceiling 0.99+ where bf16
    ranking plateaus ~0.98)."""
    emb, q = mixture
    K = 10
    ivf = build_ivf(emb, nlist=64, seed=1, expand=0.25)
    dbp_bf = permute_db(emb, ivf, np.dtype("bfloat16"))
    dbp_f32 = permute_db(emb, ivf, np.float32)
    s = q @ emb.T
    ref = np.argsort(-s, axis=1)[:, :K]
    args = (jnp.asarray(q).astype(jnp.bfloat16), jnp.asarray(dbp_bf),
            jnp.asarray(ivf["centroids"]), jnp.asarray(ivf["perm"]))
    _, i0 = ivf_search(*args, K, 16, interpret=True, dedup=True)
    v1, i1 = ivf_search(*args, K, 16, interpret=True, dedup=True,
                        rerank_hi=jnp.asarray(dbp_f32), q_hi=jnp.asarray(q))

    def rec(i):
        i = np.asarray(i)
        return np.mean([len(set(i[r].tolist()) & set(ref[r].tolist())) / K
                        for r in range(len(q))])

    assert rec(i1) >= rec(i0)
    assert rec(i1) >= 0.95
    v1, i1 = np.asarray(v1), np.asarray(i1)
    exact = np.take_along_axis(s, i1, axis=1)
    np.testing.assert_allclose(v1, exact, atol=2e-5)
    for r in range(len(q)):
        assert len(set(i1[r].tolist())) == K  # dedup still holds post-rerank


def test_multi_assignment_improves_recall(mixture):
    """The point of expand>0: strictly better (or equal) recall at equal
    nprobe on clustered data."""
    emb, q = mixture
    K = 10
    ref = np.argsort(-(q @ emb.T), axis=1)[:, :K]

    def recall(ivf, dedup, nprobe=4):
        dbp = permute_db(emb, ivf)
        _, i = ivf_search(jnp.asarray(q), jnp.asarray(dbp),
                          jnp.asarray(ivf["centroids"]),
                          jnp.asarray(ivf["perm"]), K, nprobe,
                          interpret=True, dedup=dedup)
        return np.mean([len(set(np.asarray(i)[r]) & set(ref[r])) / K
                        for r in range(len(q))])

    r0 = recall(build_ivf(emb, nlist=64, seed=1, expand=0.0, refine=False),
                dedup=False)
    r1 = recall(build_ivf(emb, nlist=64, seed=1, expand=0.25), dedup=True)
    assert r1 >= r0, f"expand+refine recall {r1} < baseline {r0}"


def test_mincov_filter(mixture, rng):
    emb, q = mixture
    ivf = build_ivf(emb, nlist=32, seed=1)
    dbp = permute_db(emb, ivf)
    lengths = rng.uniform(50, 300, len(emb)).astype(np.float32)
    perm = ivf["perm"]
    lp = np.full(len(perm), 1e9, np.float32)
    lp[perm >= 0] = lengths[perm[perm >= 0]]
    qlen = np.full(len(q), 120.0, np.float32)
    v, i = ivf_search(jnp.asarray(q), jnp.asarray(dbp),
                      jnp.asarray(ivf["centroids"]), jnp.asarray(perm),
                      15, 32, tlen=jnp.asarray(lp), qlen=jnp.asarray(qlen),
                      mincov=0.7, use_len=True, interpret=True)
    v, i = np.asarray(v), np.asarray(i)
    for r in range(len(q)):
        for val, idx in zip(v[r], i[r]):
            if idx >= 0 and np.isfinite(val):
                assert 120.0 >= lengths[idx] * 0.7


def test_engine_ivf_mode(tmp_path, rng, mixture):
    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    emb, q = mixture
    entries = [(f"d{i}", rng.normal(size=(50, 3)).astype(np.float32), "A" * 50)
               for i in range(len(emb))]
    prefix = str(tmp_path / "db")
    codecs.write_pt_db(prefix, emb, entries)
    eng = SearchEngine(codecs.FlatDB.open(prefix), index="ivf",
                       ivf_nlist=64, ivf_nprobe=16)
    vals, idxs = eng.search(q, k=5)
    ref = np.argsort(-(q @ emb.T), axis=1)[:, :5]
    rec = np.mean([len(set(idxs[r]) & set(ref[r])) / 5 for r in range(len(q))])
    assert rec > 0.9


def test_engine_ivf_rerank(tmp_path, rng, mixture):
    """Engine-level rerank: recall must not drop vs the plain IVF engine
    and the returned values must be the exact f32 scores of the ids."""
    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    emb, q = mixture
    entries = [(f"d{i}", rng.normal(size=(50, 3)).astype(np.float32), "A" * 50)
               for i in range(len(emb))]
    prefix = str(tmp_path / "db")
    codecs.write_pt_db(prefix, emb, entries)
    eng = SearchEngine(codecs.FlatDB.open(prefix), index="ivf",
                       ivf_nlist=64, ivf_nprobe=16, ivf_rerank=True)
    vals, idxs = eng.search(q, k=5)
    s = q @ emb.T
    ref = np.argsort(-s, axis=1)[:, :5]
    rec = np.mean([len(set(idxs[r]) & set(ref[r])) / 5 for r in range(len(q))])
    assert rec > 0.9
    exact = np.take_along_axis(s, np.asarray(idxs), axis=1)
    np.testing.assert_allclose(np.asarray(vals), exact, atol=2e-5)


def test_engine_mesh_ivf_rerank(tmp_path, mixture):
    """Mesh-sharded rerank on the virtual 8-device CPU mesh: same recall
    and exact-f32-value contract as the single-device path."""
    import jax
    from jax.sharding import Mesh

    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.default_rng(5)
    emb, q = mixture
    entries = [(f"d{i}", rng.normal(size=(50, 3)).astype(np.float32), "A" * 50)
               for i in range(len(emb))]
    prefix = str(tmp_path / "db")
    codecs.write_pt_db(prefix, emb, entries)
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    eng = SearchEngine(codecs.FlatDB.open(prefix), mesh=mesh, index="ivf",
                       ivf_nlist=64, ivf_nprobe=16, ivf_rerank=True)
    vals, idxs = eng.search(q, k=5)
    s = q @ emb.T
    ref = np.argsort(-s, axis=1)[:, :5]
    rec = np.mean([len(set(idxs[r]) & set(ref[r])) / 5 for r in range(len(q))])
    assert rec > 0.9
    exact = np.take_along_axis(s, np.asarray(idxs), axis=1)
    np.testing.assert_allclose(np.asarray(vals), exact, atol=2e-5)


def test_mesh_ivf_matches_single_device(mixture):
    """Mesh-sharded IVF must return identical results to single-device
    ivf_search with the same build (same probe set, exact top-k of probed)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from merizo_search_tpu.search.ivf import build_mesh_ivf_search

    emb, q = mixture
    K, NPROBE = 10, 8
    ivf = build_ivf(emb, nlist=64, seed=1, multiple_of=4)
    assert ivf["nlist"] % 4 == 0
    dbp = permute_db(emb, ivf)
    perm = ivf["perm"]
    v1, i1 = ivf_search(jnp.asarray(q), jnp.asarray(dbp),
                        jnp.asarray(ivf["centroids"]), jnp.asarray(perm),
                        K, NPROBE, interpret=True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    fn = build_mesh_ivf_search(mesh, K, NPROBE, use_len=False, mincov=0.0,
                               interpret=True)
    tl = jnp.zeros(len(perm), jnp.float32)
    dbp_sh = jax.device_put(dbp, NamedSharding(mesh, P("d", None)))
    vm, im = fn(jnp.asarray(q), jnp.asarray(q),  # q8 slot unused when flat
                dbp_sh,
                jnp.asarray(ivf["centroids"]),
                jax.device_put(tl, NamedSharding(mesh, P("d"))),
                jax.device_put(perm, NamedSharding(mesh, P("d"))),
                jnp.zeros(len(q), jnp.float32),
                jax.device_put(tl, NamedSharding(mesh, P("d"))),  # dummy scales
                dbp_sh)                                  # dummy rerank shard
    np.testing.assert_allclose(np.asarray(vm), np.asarray(v1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(im), np.asarray(i1))


def test_engine_mesh_ivf(tmp_path, mixture):
    """SearchEngine with index='ivf' and a mesh: same hits as single-device
    IVF engine."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    emb, q = mixture
    entries = [(f"d{i:05d}", np.zeros((10, 3), np.float32), "A" * 10)
               for i in range(len(emb))]
    prefix = str(tmp_path / "ivfdb")
    codecs.write_pt_db(prefix, emb, entries)
    db = codecs.FlatDB.open(prefix)

    e1 = SearchEngine(db, index="ivf", ivf_nlist=64, ivf_nprobe=8)
    v1, i1 = e1.search(q, k=10)
    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    em = SearchEngine(db, mesh=mesh, index="ivf", ivf_nlist=64, ivf_nprobe=8)
    vm, im = em.search(q, k=10)
    np.testing.assert_allclose(vm, v1, atol=1e-5)
    np.testing.assert_array_equal(im, i1)


def test_engine_ivf_int8(tmp_path, rng, mixture):
    """int8 IVF (single device): probed candidates rescored through the int8
    gather with block-uniform scales; planted near-self queries must hit."""
    import jax.numpy as jnp

    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    emb, q = mixture
    entries = [(f"d{i}", np.zeros((3, 3), np.float32), "AAA")
               for i in range(len(emb))]
    prefix = str(tmp_path / "ivf8")
    codecs.write_pt_db(prefix, emb, entries)
    eng = SearchEngine(codecs.FlatDB.open(prefix), index="ivf",
                       ivf_nlist=32, ivf_nprobe=8, dtype=jnp.int8)
    vals, idxs = eng.search(q, k=10)
    s = q @ emb.T
    ref = np.argsort(-s, axis=1)[:, :10]
    recall = np.mean([len(set(idxs[r]) & set(ref[r])) / 10
                      for r in range(len(q))])
    assert recall >= 0.8, recall
    # planted queries: top hit is the (near-)source row with high score
    assert np.all(vals[:, 0] > 0.95)


def test_engine_mesh_ivf_int8(tmp_path, mixture):
    """int8 IVF sharded over a mesh must match the single-device int8 IVF."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    emb, q = mixture
    entries = [(f"d{i}", np.zeros((3, 3), np.float32), "AAA")
               for i in range(len(emb))]
    prefix = str(tmp_path / "ivf8m")
    codecs.write_pt_db(prefix, emb, entries)
    db = codecs.FlatDB.open(prefix)
    e1 = SearchEngine(db, index="ivf", ivf_nlist=64, ivf_nprobe=8,
                      dtype=jnp.int8)
    v1, i1 = e1.search(q, k=5)
    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    em = SearchEngine(codecs.FlatDB.open(prefix), mesh=mesh, index="ivf",
                      ivf_nlist=64, ivf_nprobe=8, dtype=jnp.int8)
    vm, im = em.search(q, k=5)
    np.testing.assert_array_equal(i1, im)
    np.testing.assert_allclose(v1, vm, atol=1e-5)


def test_engine_ivf_cache_invalidated_on_db_change(tmp_path, rng, mixture):
    """The persisted IVF build ({prefix}.ivf{nlist}.npz) must be invalidated
    when the DB under the same prefix changes — a stale permutation would
    silently skip appended rows or return wrong row ids."""
    import os
    from merizo_search_tpu.db import codecs
    from merizo_search_tpu.search.engine import SearchEngine

    emb, q = mixture
    entries = [(f"d{i}", np.zeros((3, 3), np.float32), "AAA")
               for i in range(len(emb))]
    prefix = str(tmp_path / "stale")
    codecs.write_pt_db(prefix, emb, entries)
    eng = SearchEngine(codecs.FlatDB.open(prefix), index="ivf",
                       ivf_nlist=64, ivf_nprobe=64)
    v0, i0 = eng.search(q[:2], k=5)
    assert os.path.exists(prefix + ".ivf64.npz")

    # rewrite the DB in place with permuted content (same size); bump mtime
    # past the fingerprint's 1-second granularity
    perm = np.random.default_rng(9).permutation(len(emb))
    codecs.write_pt_db(prefix, emb[perm], [entries[j] for j in perm])
    st = os.stat(prefix + ".pt")
    os.utime(prefix + ".pt", (st.st_atime, st.st_mtime + 10))

    eng2 = SearchEngine(codecs.FlatDB.open(prefix), index="ivf",
                        ivf_nlist=64, ivf_nprobe=64)
    v2, i2 = eng2.search(q[:2], k=5)
    # at nprobe=nlist IVF is exact: hits must rank the NEW row order
    ref = np.argsort(-(q[:2] @ emb[perm].T), axis=1)[:, :5]
    for r in range(2):
        assert set(i2[r].tolist()) == set(ref[r].tolist())


def test_dedup_topk_pads_to_k():
    """_dedup_topk returns exactly k columns even when the candidate pool
    is narrower than k (or has fewer unique finite ids), matching the
    non-dedup path's [Q, k] contract; big ids survive the joint sorts."""
    from merizo_search_tpu.search.ivf import _dedup_topk
    v = jnp.asarray(np.array([[3.0, 1.0, 3.0, 2.0],
                              [5.0, -np.inf, 5.0, -np.inf]], np.float32))
    idx = jnp.asarray(np.array([[7, 9, 7, 400000],
                                [123456, -1, 123456, -1]], np.int32))
    out_v, out_i = _dedup_topk(v, idx, 6)
    assert out_v.shape == (2, 6) and out_i.shape == (2, 6)
    np.testing.assert_array_equal(
        np.asarray(out_i)[0], [7, 400000, 9, -1, -1, -1])
    np.testing.assert_allclose(np.asarray(out_v)[0, :3], [3.0, 2.0, 1.0])
    assert np.all(np.isneginf(np.asarray(out_v)[0, 3:]))
    np.testing.assert_array_equal(np.asarray(out_i)[1, :1], [123456])
    assert np.all(np.asarray(out_i)[1, 1:] == -1)
