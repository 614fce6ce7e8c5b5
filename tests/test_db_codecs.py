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
