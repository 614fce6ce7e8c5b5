import os

import numpy as np
import pytest

from merizo_search_tpu.io import pdb as pdbio
from merizo_search_tpu.utils.residues import encode_seq, AA_ORDER


def test_read_ca_3w5h(examples_dir):
    d = pdbio.read_ca(os.path.join(examples_dir, "3w5h.pdb"), chain="A")
    assert d["coords"].dtype == np.float32
    assert d["coords"].shape[1] == 3
    assert len(d["seq"]) == len(d["coords"])
    assert len(d["seq"]) > 100
    # sequence should be mostly canonical residues
    frac_x = d["seq"].count("X") / len(d["seq"])
    assert frac_x < 0.05


def test_read_ca_af_model(examples_dir):
    d = pdbio.read_ca(os.path.join(examples_dir, "AF-Q96HM7-F1-model_v4.pdb"))
    assert len(d["seq"]) == len(d["coords"])
    assert "X" not in d["seq"]  # AF models are all-canonical


def test_read_ca_missing_chain(examples_dir):
    with pytest.raises(ValueError):
        pdbio.read_ca(os.path.join(examples_dir, "3w5h.pdb"), chain="Z")


def test_parse_backbone_complete(examples_dir):
    mol = pdbio.parse_backbone(os.path.join(examples_dir, "AF-Q96HM7-F1-model_v4.pdb"))
    ca = pdbio.backbone_to_ca(mol)
    n = pdbio.select_atoms(mol, "n", ["N"])
    c = pdbio.select_atoms(mol, "n", ["C"])
    o = pdbio.select_atoms(mol, "n", ["O"])
    # complete backbone: equal counts of each atom type
    assert len(ca) == len(n) == len(c) == len(o)
    assert len(mol) == 4 * len(ca)
    # sorted by residue index
    assert np.all(np.diff(ca["resi"]) >= 0)


def test_parse_backbone_matches_read_ca_on_clean_model(examples_dir):
    path = os.path.join(examples_dir, "AF-Q96PD2-F1-model_v4.pdb")
    mol = pdbio.parse_backbone(path)
    ca_bb = pdbio.backbone_to_ca(mol)
    ca_fast = pdbio.read_ca(path)
    assert len(ca_bb) == len(ca_fast["coords"])
    np.testing.assert_allclose(pdbio.get_xyz(ca_bb), ca_fast["coords"], atol=1e-3)


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(50, 3)).astype(np.float32) * 10
    seq = "ACDEFGHIKLMNPQRSTVWY" * 2 + "ACDEFGHIKL"
    fn = pdbio.write_ca_pdb(str(tmp_path), coords, seq, name="test")
    d = pdbio.read_ca(fn)
    assert d["seq"] == seq
    np.testing.assert_allclose(d["coords"], coords, atol=2e-3)


def test_encode_seq():
    ids = encode_seq(AA_ORDER)
    assert list(ids) == list(range(20))
    assert encode_seq("X")[0] == 19  # unknown clamps


def test_mol_to_fasta(examples_dir):
    mol = pdbio.parse_backbone(os.path.join(examples_dir, "AF-Q96HM7-F1-model_v4.pdb"))
    fasta = pdbio.mol_to_fasta(mol)
    ca = pdbio.read_ca(os.path.join(examples_dir, "AF-Q96HM7-F1-model_v4.pdb"))
    assert fasta == ca["seq"]


def test_native_parser_matches_numpy(examples_dir):
    """The C++ CA parser must agree byte-for-byte with the numpy reference
    implementation on every bundled real structure (coords, sequence,
    missing-chain behaviour)."""
    from merizo_search_tpu.io import native_parse
    from merizo_search_tpu.io.pdb import _col_float, _col_str, _line_matrix

    if not native_parse.available():
        import pytest

        pytest.skip("native parser toolchain unavailable")

    for fname in sorted(os.listdir(examples_dir)):
        if not fname.endswith(".pdb"):
            continue
        path = os.path.join(examples_dir, fname)
        with open(path, "rb") as fh:
            raw = fh.read()
        got = native_parse.parse_ca_bytes(raw, "A")
        assert got is not None
        coords, seq = got
        # numpy specification path, inlined (read_ca now prefers native)
        mat = _line_matrix(path)
        rec = _col_str(mat, 0, 4)
        name4 = np.ascontiguousarray(mat[:, 12:16]).view("S4").ravel().astype("U4")
        keep = (rec == "ATOM") & (name4 == " CA ") & (mat[:, 21] == ord("A"))
        sub = mat[keep]
        ref = np.stack([_col_float(_col_str(sub, 30, 38)),
                        _col_float(_col_str(sub, 38, 46)),
                        _col_float(_col_str(sub, 46, 54))], axis=-1)
        from merizo_search_tpu.utils.residues import THREE_TO_ONE

        ref_seq = "".join(THREE_TO_ONE.get(r, "X")
                          for r in _col_str(sub, 17, 20))
        np.testing.assert_array_equal(coords, ref.astype(np.float32), fname)
        assert seq == ref_seq, fname
        # absent chain -> zero records (read_ca raises the same error)
        c2, s2 = native_parse.parse_ca_bytes(raw, "9")
        assert len(c2) == 0 and s2 == ""


def test_native_parser_truncated_records(tmp_path):
    """Truncated ATOM CA records (shorter than the coord fields) must parse
    identically in both paths: the numpy specification pads lines to 80
    columns, so missing fields read as 0.0 / 'X' — not as a dropped row."""
    from merizo_search_tpu.io import native_parse
    from merizo_search_tpu.io.pdb import read_ca

    if not native_parse.available():
        import pytest

        pytest.skip("native parser toolchain unavailable")

    pdb = (
        "ATOM      1  CA  ALA A   1      11.000  12.000  13.000\n"
        "ATOM      2  CA  GLY A   2      21.000  22.000\n"   # z missing
        "ATOM      3  CA  SER A   3\n"                        # no coords
        "ATOM      4  CA\n"                                   # no chain: drop
        "ATOM      5  CA  CYS A   5      51.000  52.000  53.000\n"
    )
    p = tmp_path / "trunc.pdb"
    p.write_text(pdb)
    with open(p, "rb") as fh:
        raw = fh.read()
    coords, seq = native_parse.parse_ca_bytes(raw, "A")
    out = read_ca(str(p), "A")  # native path (when available)
    assert seq == "AGSC"
    np.testing.assert_array_equal(
        coords,
        np.asarray([[11, 12, 13], [21, 22, 0], [0, 0, 0], [51, 52, 53]],
                   np.float32))
    np.testing.assert_array_equal(out["coords"], coords)
    # numpy specification path must agree
    native_parse._lib = None
    native_parse._build_failed = True  # force the numpy fallback
    try:
        ref = read_ca(str(p), "A")
    finally:
        native_parse._build_failed = False
    np.testing.assert_array_equal(ref["coords"], coords)
    assert ref["seq"] == seq


def test_gzipped_and_ent_pdb_inputs(tmp_path):
    """PDB-archive file forms: .pdb.gz and pdb<id>.ent(.gz) parse identically
    to the plain .pdb (TED-scale corpora ship compressed; the PDB archive
    uses .ent.gz naming)."""
    import gzip
    import shutil

    from merizo_search_tpu.io.pdb import parse_backbone, read_ca
    from merizo_search_tpu.utils.names import strip_struct_ext

    src = "/root/reference/examples/3w5h.pdb"
    plain = read_ca(src, "A")
    gz = str(tmp_path / "3w5h.pdb.gz")
    with open(src, "rb") as f, gzip.open(gz, "wb") as g:
        shutil.copyfileobj(f, g)
    ent = str(tmp_path / "pdb3w5h.ent")
    shutil.copyfile(src, ent)

    for p in (gz, ent):
        r = read_ca(p, "A")
        assert r["seq"] == plain["seq"]
        np.testing.assert_array_equal(r["coords"], plain["coords"])
    assert parse_backbone(gz, "A").shape == parse_backbone(src, "A").shape
    assert strip_struct_ext("pdb3w5h.ent.gz") == "pdb3w5h"
    assert strip_struct_ext("x.pdb.gz") == "x"
