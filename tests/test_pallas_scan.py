"""Exactness tests for the fused Pallas scan (interpret mode on CPU).

The fused path must reproduce brute-force numpy top-k exactly: the block-max
cover (pallas_scan module docstring) is an exactness argument, not an
approximation, so every index must match.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from merizo_search_tpu.ops.pallas_scan import fused_topk, _topk_entries


def _brute(q, db, n_valid, k, tlen=None, qlen=None, mincov=0.0):
    s = q @ db.T
    s[:, n_valid:] = -np.inf
    if tlen is not None:
        s = np.where(qlen[:, None] >= tlen[None, :] * mincov, s, -np.inf)
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, 1), idx


@pytest.fixture(scope="module")
def problem(rng):
    N, D, Q = 1 << 13, 128, 5
    db = rng.normal(size=(N, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.normal(size=(Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    tlen = rng.uniform(50, 200, N).astype(np.float32)
    qlen = rng.uniform(50, 200, Q).astype(np.float32)
    return q, db, tlen, qlen


def test_topk_entries_exact(rng):
    x = rng.normal(size=(7, 1 << 13)).astype(np.float32)
    v, i = _topk_entries(jnp.asarray(x), 100)
    ref_i = np.argsort(-x, axis=1)[:, :100]
    ref_v = np.take_along_axis(x, ref_i, 1)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_array_equal(np.asarray(v), ref_v)


def test_topk_entries_narrow(rng):
    x = rng.normal(size=(3, 50)).astype(np.float32)
    v, i = _topk_entries(jnp.asarray(x), 100)   # k > width: padded
    assert v.shape == (3, 100)
    assert np.all(np.asarray(v)[:, 50:] == -np.inf)
    ref_i = np.argsort(-x, axis=1)
    np.testing.assert_array_equal(np.asarray(i)[:, :50], ref_i)


def test_fused_topk_no_lengths(problem):
    q, db, _, _ = problem
    n_valid, k = db.shape[0] - 77, 37
    rv, ri = _brute(q.copy(), db, n_valid, k)
    v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k,
                      tile=2048, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(v), rv, atol=2e-6)


def test_fused_topk_mincov(problem):
    q, db, tlen, qlen = problem
    n_valid, k = db.shape[0], 25
    rv, ri = _brute(q.copy(), db, n_valid, k, tlen, qlen, 0.7)
    v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k,
                      tlen=jnp.asarray(tlen), qlen=jnp.asarray(qlen),
                      mincov=0.7, tile=2048, use_len=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(v), rv, atol=2e-6)


def test_fused_mincov_boundary_matches_xla(rng):
    """f32 coverage boundaries: qlen=9, tlen=30, mincov=0.3 — 9 >= 30*0.3f
    keeps the hit in f32 (30*0.3f = 8.9999997), and the fused path must
    agree with the XLA scan exactly (it once divided qlen/mincov instead,
    masking such hits)."""
    from merizo_search_tpu.ops.topk import topk_scan

    n, k = 512, 8
    db = rng.normal(size=(n, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.normal(size=(3, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    tlen = np.full(n, 30.0, np.float32)
    qlen = np.full(3, 9.0, np.float32)
    vf, iff = fused_topk(jnp.asarray(q), jnp.asarray(db), n, k,
                         tlen=jnp.asarray(tlen), qlen=jnp.asarray(qlen),
                         mincov=0.3, tile=256, use_len=True, interpret=True)
    vx, ix = topk_scan(jnp.asarray(q), jnp.asarray(db), n, k, 256,
                       tlen=jnp.asarray(tlen), qlen=jnp.asarray(qlen),
                       mincov=0.3)
    np.testing.assert_array_equal(np.asarray(iff), np.asarray(ix))
    assert np.isfinite(np.asarray(vf)).all()  # the boundary hits are kept


def test_fused_topk_few_valid_rows(problem):
    """k larger than the number of unmasked rows: tail must be -inf/-1."""
    q, db, _, _ = problem
    n_valid, k = 60, 100
    v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k,
                      tile=2048, interpret=True)
    v, i = np.asarray(v), np.asarray(i)
    rv, ri = _brute(q.copy(), db, n_valid, k)
    np.testing.assert_array_equal(i[:, :n_valid], ri[:, :n_valid])
    assert np.all(i[:, n_valid:] == -1)
    assert np.all(v[:, n_valid:] == -np.inf)


def test_fused_mesh_search_exact(problem):
    """fused scan under shard_map on an 8-device CPU mesh: per-shard Pallas
    scan + ICI all-gather merge must reproduce brute force exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from merizo_search_tpu.search.engine import build_mesh_search

    q, db, tlen, qlen = problem
    n, k = db.shape[0], 17
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    fn = build_mesh_search(mesh, k=k, chunk=256, mincov=0.7, use_lengths=True,
                           fused=True, fused_tile=512, interpret=True)
    demb = jax.device_put(jnp.asarray(db), NamedSharding(mesh, P("d", None)))
    dlen = jax.device_put(jnp.asarray(tlen), NamedSharding(mesh, P("d")))
    v, i = fn(jnp.asarray(q), demb, dlen, jnp.asarray([n], jnp.int32),
              jnp.asarray(qlen), dlen)
    rv, ri = _brute(q.copy(), db, n, k, tlen, qlen, 0.7)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(v), rv, atol=2e-6)


def test_fused_mesh_int8(problem):
    """int8 shards + sharded row scales under shard_map: exact top-k of the
    quantised scores across the mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from merizo_search_tpu.search.engine import build_mesh_search
    from merizo_search_tpu.ops.pallas_scan import quantize_rows, quantize_blocks

    q, db, _, _ = problem
    n, k = db.shape[0], 9
    db8, rs = quantize_blocks(db)
    q8, qs = quantize_rows(q)
    sq = (q8.astype(np.int64) @ db8.astype(np.int64).T) * rs[None, :].astype(np.float64)
    ref_i = np.argsort(-sq, axis=1, kind="stable")[:, :k]

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    fn = build_mesh_search(mesh, k=k, chunk=256, mincov=0.0, use_lengths=False,
                           fused=True, fused_tile=512, interpret=True,
                           quantized=True)
    demb = jax.device_put(jnp.asarray(db8), NamedSharding(mesh, P("d", None)))
    dlen = jax.device_put(jnp.zeros(n, jnp.float32), NamedSharding(mesh, P("d")))
    dscale = jax.device_put(jnp.asarray(rs), NamedSharding(mesh, P("d")))
    v, i = fn(jnp.asarray(q8), demb, dlen, jnp.asarray([n], jnp.int32),
              jnp.zeros(q.shape[0], jnp.float32), dscale)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_fused_topk_bf16_matches_bf16_xla(problem):
    """bf16 storage: fused result == the XLA scan on identical bf16 inputs."""
    from merizo_search_tpu.ops.topk import topk_scan

    q, db, _, _ = problem
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    dbb = jnp.asarray(db).astype(jnp.bfloat16)
    n_valid, k = db.shape[0], 20
    v1, i1 = fused_topk(qb, dbb, n_valid, k, tile=2048, interpret=True)
    v2, i2 = topk_scan(qb, dbb, n_valid, k, 2048,
                       precision=jax.lax.Precision.DEFAULT)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_fused_topk_superblock_branch(problem):
    """Small tile vs large nsb forces the two-level superblock cover path
    (nsb >= 2k): SBM select -> one-hot BM slab gather -> block select. Must
    stay exact vs brute force, with and without the coverage filter."""
    q, db, tlen, qlen = problem
    n_valid, k = db.shape[0] - 100, 3  # nsb = 16 >= 2k
    ref_v, ref_i = _brute(q, db, n_valid, k)
    v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k,
                      tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(v), ref_v, rtol=0, atol=1e-5)
    assert np.array_equal(np.asarray(i), ref_i)

    ref_v, ref_i = _brute(q, db, n_valid, k, tlen=tlen, qlen=qlen, mincov=0.7)
    v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k,
                      tlen=jnp.asarray(tlen), qlen=jnp.asarray(qlen),
                      mincov=0.7, tile=512, use_len=True, interpret=True)
    np.testing.assert_allclose(np.asarray(v), ref_v, rtol=0, atol=1e-5)
    assert np.array_equal(np.asarray(i), ref_i)


def test_fused_topk_production_tile(rng):
    """Production-aligned tile ((tile/128) % 128 == 0) + nsb >= 2(k+1) takes
    the aligned-BM superblock path; it must reproduce brute force
    index-exactly, including with a ragged n_valid (straddling-block
    compensation)."""
    N, D, k = 8 * 16384, 128, 3
    db = rng.normal(size=(N, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.normal(size=(4, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    for nv in (N, N - 777):
        rv, ri = _brute(q.copy(), db, nv, k)
        v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), nv, k,
                          tile=16384, interpret=True)
        np.testing.assert_array_equal(np.asarray(i), ri)
        np.testing.assert_allclose(np.asarray(v), rv, atol=2e-6)


def test_int8_block_scale_recall(rng):
    """Quantify the int8 block-scale accuracy trade-off: recall@10 of the
    int8 fused path against the exact f32 scan on unit-norm embeddings.
    quantize_blocks shares one scale per 128 rows, so the quantisation step
    is set by the largest |entry| in the block — this pins the measured
    recall so the docstring's accuracy claim stays honest."""
    from merizo_search_tpu.ops.pallas_scan import quantize_blocks, quantize_rows

    N, D, Q, k = 4096, 128, 16, 10
    db = rng.normal(size=(N, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.normal(size=(Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ref_i = np.argsort(-(q @ db.T), axis=1)[:, :k]
    db8, rs = quantize_blocks(db)
    q8, _ = quantize_rows(q)
    v, i = fused_topk(jnp.asarray(q8), jnp.asarray(db8), N, k,
                      tile=512, interpret=True, scales=jnp.asarray(rs))
    i = np.asarray(i)
    recall = np.mean([len(set(i[r]) & set(ref_i[r])) / k for r in range(Q)])
    assert recall >= 0.9, f"int8 block-scale recall@10 degraded: {recall}"


def test_quantize_blocks_uniform_scales(rng):
    from merizo_search_tpu.ops.pallas_scan import quantize_blocks

    x = rng.normal(size=(384, 16)).astype(np.float32)
    q8, s = quantize_blocks(x)
    assert s.shape == (384,)
    # one scale per 128-row block
    for b in range(3):
        assert np.all(s[b * 128:(b + 1) * 128] == s[b * 128])
    np.testing.assert_allclose(q8 * s[:, None], x, atol=np.abs(x).max() / 100)
    # ragged tail shares the last block's scale
    q8t, st = quantize_blocks(x[:200])
    assert np.all(st[128:200] == st[128])


def test_gather_int_matches_take_along(rng):
    from merizo_search_tpu.ops.pallas_scan import _gather_int

    src = rng.integers(0, 2 ** 23, size=(7, 300)).astype(np.int32)
    sel = rng.integers(0, 300, size=(7, 40)).astype(np.int32)
    out = np.asarray(_gather_int(jnp.asarray(src), jnp.asarray(sel)))
    assert np.array_equal(out, np.take_along_axis(src, sel, axis=1))


def test_gather_chunking():
    from merizo_search_tpu.ops.pallas_scan import _gather_chunking

    # flat-scan widths fit one call (kb ~ k+2 = 102 at Q=256 bf16)
    n, c = _gather_chunking(102, 256, 128, 2, 6)
    assert n == 1 and c == 102
    for kb in (7, 103, 510, 516, 1024, 4097, 8200):
        for qp, itemsize in ((256, 2), (256, 1), (512, 2), (32, 4)):
            n, c = _gather_chunking(kb, qp, 128, itemsize, 6)
            assert c % 6 == 0 or n == 1          # unroll-aligned chunks
            assert n * c >= kb                   # covers all columns
            assert n * c - kb < c                # < one whole chunk of pad
            smem_cap = (512 * 1024 // (4 * qp))
            if n > 1:
                assert c <= smem_cap             # SMEM bidx budget holds
    # balanced split: kb just over the cap splits in two near-halves,
    # not cap + remainder
    qp = 256
    cap = (512 * 1024 // (4 * qp)) // 6 * 6      # 510 at qp=256
    n, c = _gather_chunking(cap + 6, qp, 128, 2, 6)
    assert n == 2 and c <= cap // 2 + 6


@pytest.mark.parametrize("n,q_n,k,nv_off", [
    (256, 1, 5, 0),      # single query, tiny db (one tile, one block row)
    (512, 3, 200, 1),    # k > BLOCK, n_valid straddling a block
    (1024, 17, 100, 100),  # k near n_valid remainder
    (2048, 9, 1, 513),   # k=1, deep padding
    (4096, 33, 64, 4095),  # only one valid row
])
def test_fused_topk_shape_edges(rng, n, q_n, k, nv_off):
    """Property sweep: odd shapes / straddles vs numpy brute force."""
    d = 128
    db = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(q_n, d)).astype(np.float32)
    n_valid = n - nv_off
    rv, ri = _brute(q.copy(), db, n_valid, k)
    v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k,
                      tile=256, interpret=True)
    assert v.shape == (q_n, k) and i.shape == (q_n, k)
    vn, iN = np.asarray(v), np.asarray(i)
    np.testing.assert_allclose(vn, rv, atol=3e-5, rtol=1e-5)
    finite = np.isfinite(rv)
    # ties may legally order differently: check the returned indices'
    # true scores match the brute-force values instead of index identity
    s = q @ db.T
    got = np.take_along_axis(s, np.maximum(iN, 0), axis=1)
    np.testing.assert_allclose(got[finite], rv[finite], atol=3e-5, rtol=1e-5)
    assert np.all(iN[finite] < n_valid)
    # no duplicate rows reported per query
    for r in range(q_n):
        ids = iN[r][finite[r]]
        assert len(set(ids.tolist())) == len(ids)
    assert np.all(iN[~finite] == -1)


def test_fused_topk_split_bm_layout(rng):
    """Exercise the step-major split BM layout (production mode:
    superblock select on, multi-step grid): results must
    match brute force exactly, including the n_valid straddle block."""
    N, D, Q, k = 1 << 17, 8, 3, 3  # nsteps=8, nbt=128 at tile=16384
    db = rng.normal(size=(N, D)).astype(np.float32)
    q = rng.normal(size=(Q, D)).astype(np.float32)
    n_valid = N - 777
    rv, ri = _brute(q.copy(), db, n_valid, k)
    v, i = fused_topk(jnp.asarray(q), jnp.asarray(db), n_valid, k,
                      tile=16384, interpret=True)
    np.testing.assert_allclose(np.asarray(v), rv, rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(i), ri)
