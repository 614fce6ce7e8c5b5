import os

import numpy as np
import jax
import pytest

from merizo_search_tpu.io import pdb as pdbio
from merizo_search_tpu.db import codecs
from merizo_search_tpu.models import foldclass as fc
from merizo_search_tpu.pipeline.createdb import run_createdb
from merizo_search_tpu.pipeline.embed import embed_structures


@pytest.fixture(scope="module")
def pdb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdbs")
    rng = np.random.default_rng(3)
    for i in range(7):
        n = int(rng.integers(40, 120))
        coords = (rng.normal(size=(n, 3)) * 8).astype(np.float32)
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=n))
        pdbio.write_ca_pdb(str(d), coords, seq, name=f"s{i:02d}")
    # one empty/broken file that should be skipped
    (d / "broken.pdb").write_text("REMARK nothing here\n")
    return str(d)


@pytest.fixture(scope="module")
def params():
    return fc.init_params(jax.random.PRNGKey(0))


def test_createdb_pt(pdb_dir, tmp_path, params):
    out = str(tmp_path / "mydb")
    n = run_createdb(pdb_dir, out, fmt="pt", params=params)
    assert n == 7  # broken.pdb skipped
    db = codecs.FlatDB.open(out)
    assert db.size == 7
    # embeddings must match individually-computed ones
    name, ca, seq = db.entry(0)
    e = embed_structures(params, [ca])[0]
    np.testing.assert_allclose(db.embeddings()[0], e, atol=1e-4)


def test_createdb_mmap_and_resume(pdb_dir, tmp_path, params):
    out = str(tmp_path / "mmdb")
    n = run_createdb(pdb_dir, out, fmt="mmap", params=params)
    assert n == 7
    db = codecs.FlatDB.open(out)
    assert db.size == 7
    names = db.names(range(7))
    assert names == sorted(names)
    # embeddings stored normalised; direction must match fresh embedding
    _, ca, _ = db.entry(3)
    e = embed_structures(params, [ca])[0]
    e = e / np.linalg.norm(e)
    np.testing.assert_allclose(np.asarray(db.embeddings()[3]), e, atol=1e-4)

    # resume on a complete db adds nothing
    n2 = run_createdb(pdb_dir, out, fmt="mmap", resume=True, params=params)
    assert n2 == 7


def test_embed_batched_equals_single(params, rng):
    sizes = [33, 57, 64, 120]
    cl = [(rng.normal(size=(s, 3)) * 8).astype(np.float32) for s in sizes]
    batched = embed_structures(params, cl)
    singles = np.stack([embed_structures(params, [c])[0] for c in cl])
    np.testing.assert_allclose(batched, singles, atol=1e-4)


def test_embed_mesh_data_parallel(params, rng):
    """Mesh-sharded batch embedding must equal single-device results."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    sizes = [40, 40, 40, 64, 64, 100, 100]   # uneven count vs 4 devices
    cl = [(rng.normal(size=(s, 3)) * 8).astype(np.float32) for s in sizes]
    meshed = embed_structures(params, cl, mesh=mesh)
    single = embed_structures(params, cl)
    np.testing.assert_allclose(meshed, single, atol=1e-4)
