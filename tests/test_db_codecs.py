import os

import numpy as np
import pytest

from merizo_search_tpu.db import codecs


def _fake_entries(rng, n=20, dim=128):
    embs = rng.normal(size=(n, dim)).astype(np.float32)
    entries = []
    for i in range(n):
        ln = int(rng.integers(30, 200))
        ca = rng.normal(size=(ln, 3)).astype(np.float32)
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=ln))
        entries.append((f"dom{i:04d}", ca, seq))
    return embs, entries


def test_pt_roundtrip(tmp_path, rng):
    embs, entries = _fake_entries(rng)
    prefix = str(tmp_path / "toy")
    codecs.write_pt_db(prefix, embs, entries)
    db = codecs.FlatDB.open(prefix)
    assert db.size == 20 and db.dim == 128
    np.testing.assert_allclose(db.embeddings(), embs, atol=1e-6)
    name, ca, seq = db.entry(7)
    assert name == "dom0007"
    assert seq == entries[7][2]
    np.testing.assert_allclose(ca, entries[7][1])
    assert list(db.lengths()) == [len(e[2]) for e in entries]
    assert db.metadata(3) == "{ }"


def test_mmap_roundtrip(tmp_path, rng):
    embs, entries = _fake_entries(rng, n=15)
    prefix = str(tmp_path / "toymm")
    w = codecs.MmapDBWriter(prefix, dim=128, with_metadata=True)
    for (name, ca, seq), e in zip(entries, embs):
        w.add(name, e, ca, seq, metadata='{"cath": "1.10.10"}')
    json_path = w.finalize()
    assert os.path.exists(json_path)

    db = codecs.FlatDB.open(prefix)
    assert db.kind == "mmap"
    assert db.size == 15 and db.dim == 128
    # embeddings stored L2-normalised
    norm_ref = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(db.embeddings()), norm_ref, atol=1e-6)
    name, ca, seq = db.entry(4)
    assert name == "dom0004"
    assert seq == entries[4][2]
    np.testing.assert_allclose(ca, entries[4][1])
    assert db.metadata(0) == '{"cath": "1.10.10"}'
    assert list(db.lengths()) == [len(e[2]) for e in entries]


def test_mmap_append_resume(tmp_path, rng):
    embs, entries = _fake_entries(rng, n=10)
    prefix = str(tmp_path / "resume")
    w = codecs.MmapDBWriter(prefix, dim=128)
    for (name, ca, seq), e in zip(entries[:6], embs[:6]):
        w.add(name, e, ca, seq)
    w.finalize()
    # resume: append remaining entries
    w2 = codecs.MmapDBWriter(prefix, dim=128, append=True)
    assert w2.count == 6
    for (name, ca, seq), e in zip(entries[6:], embs[6:]):
        w2.add(name, e, ca, seq)
    w2.finalize()
    db = codecs.FlatDB.open(prefix)
    assert db.size == 10
    assert db.names(range(10)) == [e[0] for e in entries]
    assert db.seq(9) == entries[9][2]


def test_iter_blocks(tmp_path, rng):
    embs, entries = _fake_entries(rng, n=25)
    prefix = str(tmp_path / "blocks")
    codecs.write_pt_db(prefix, embs, entries)
    db = codecs.FlatDB.open(prefix)
    seen = []
    for off, block in db.iter_blocks(8):
        assert block.shape[1] == 128
        seen.append((off, block.shape[0]))
    assert seen == [(0, 8), (8, 8), (16, 8), (24, 1)]


def test_reference_index_files_parse(examples_dir):
    """The stripped example DBs still ship their (start,end) index files and the
    names file — check our codec agrees with the published layout."""
    d = os.path.join(examples_dir, "database", "ted100_9606_small")
    info = codecs.read_dbinfo(os.path.join(d, "ted100_9606_small.json"))
    assert info["DB_SIZE"] == 66943 and info["DB_DIM"] == 128
    se = codecs.read_startend(os.path.join(d, info["sif"]), info["DB_SIZE"])
    assert se.shape == (66943, 2)
    # ranges must be contiguous ascending
    assert np.all(se[1:, 0] == se[:-1, 1])
    assert np.all(se[:, 1] > se[:, 0])
    names = np.memmap(os.path.join(d, info["db_names_f"]), dtype=f"S{codecs.NAME_RECORD}", mode="r")
    assert len(names) == 66943
    first = names[0].decode().rstrip()
    assert len(first) > 0 and len(first) <= 32


def test_flatdb_from_arrays(rng):
    from merizo_search_tpu.db.codecs import FlatDB
    from merizo_search_tpu.search.engine import SearchEngine

    embs = rng.normal(size=(20, 128)).astype(np.float32)
    entries = [(f"e{i}", rng.normal(size=(40, 3)).astype(np.float32), "A" * 40)
               for i in range(20)]
    db = FlatDB.from_arrays(embs, entries)
    assert db.size == 20 and db.kind == "pt"
    assert db.name(3) == "e3"
    assert db.entry(5)[2] == "A" * 40
    eng = SearchEngine(db)
    q = embs[:2]
    vals, idxs = eng.search(q, k=1)
    np.testing.assert_array_equal(idxs[:, 0], [0, 1])


def test_quantized_sidecar_roundtrip(tmp_path, rng):
    """write_quantized_sidecar must produce exactly the quantize_blocks
    layout of the fp32 file (int8) and an exact bf16 cast (bf16), readable
    through FlatDB.read_rows_quant."""
    from merizo_search_tpu.ops.pallas_scan import quantize_blocks

    embs, entries = _fake_entries(rng, n=300)
    prefix = str(tmp_path / "quantdb")
    w = codecs.MmapDBWriter(prefix, dim=128)
    for (name, ca, seq), e in zip(entries, embs):
        w.add(name, e, ca, seq)
    w.finalize()

    codecs.write_quantized_sidecar(prefix, "int8", chunk_rows=128)
    codecs.write_quantized_sidecar(prefix, "bf16", chunk_rows=200)
    db = codecs.FlatDB.open(prefix)
    assert db.has_quant("int8") and db.has_quant("bf16")

    norm = np.asarray(db.embeddings(), np.float32)  # stored fp32 rows
    ref_q, ref_s = quantize_blocks(norm)
    qv, s = db.read_rows_quant(0, 300, "int8")
    np.testing.assert_array_equal(qv, ref_q)
    np.testing.assert_array_equal(s, ref_s)
    # chunked reads see the same bytes (128-aligned lo)
    qv2, s2 = db.read_rows_quant(128, 300, "int8")
    np.testing.assert_array_equal(qv2, ref_q[128:])
    with pytest.raises(ValueError):
        db.read_rows_quant(64, 128, "int8")

    bf = db.read_rows_quant(0, 300, "bf16")
    import ml_dtypes

    np.testing.assert_array_equal(np.asarray(bf), norm.astype(ml_dtypes.bfloat16))


def test_read_rows_normalises_pt(tmp_path, rng):
    embs, entries = _fake_entries(rng, n=10)
    prefix = str(tmp_path / "ptn")
    codecs.write_pt_db(prefix, embs, entries)
    db = codecs.FlatDB.open(prefix)
    rows = db.read_rows(2, 7)
    ref = embs[2:7] / np.linalg.norm(embs[2:7], axis=1, keepdims=True)
    np.testing.assert_allclose(rows, ref, atol=1e-6)
    assert db.max_block_read == 5


def test_read_rows_normalise_does_not_mutate_db(tmp_path):
    """read_rows(normalised=True) on an unnormalised pt DB must not rewrite
    the backing embeddings through an aliased view."""
    from merizo_search_tpu.db import codecs
    import numpy as np

    rng = np.random.default_rng(0)
    embs = rng.normal(size=(16, 8)).astype(np.float32) * 3.0
    entries = [(f"d{i}", rng.normal(size=(4, 3)).astype(np.float32), "AAAA")
               for i in range(16)]
    db = codecs.FlatDB.from_arrays(embs.copy(), entries)
    before = np.array(db.embeddings(), copy=True)
    blk = db.read_rows(0, 16, normalised=True)
    np.testing.assert_allclose(np.linalg.norm(blk, axis=1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(db.embeddings()), before)
