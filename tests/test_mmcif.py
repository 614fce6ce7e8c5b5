"""mmCIF CA reader tests (io/mmcif.py): round-trip vs the PDB reader and
robustness to column order / quoting / gz."""

import gzip
import os

import numpy as np
import pytest

from merizo_search_tpu.io.pdb import read_ca


def _as_mmcif(d: dict, chain: str = "A", shuffle_cols: bool = False) -> str:
    from merizo_search_tpu.utils.residues import THREE_TO_ONE

    one_to_three = {v: k for k, v in THREE_TO_ONE.items()}
    fields = ["group_PDB", "id", "label_atom_id", "label_alt_id",
              "label_comp_id", "auth_asym_id", "auth_seq_id",
              "Cartn_x", "Cartn_y", "Cartn_z", "occupancy"]
    if shuffle_cols:
        fields = fields[::-1]
    lines = ["data_test", "#", "loop_"]
    lines += [f"_atom_site.{f}" for f in fields]
    for i, (xyz, aa) in enumerate(zip(d["coords"], d["seq"])):
        row = {
            "group_PDB": "ATOM", "id": str(i + 1), "label_atom_id": "CA",
            "label_alt_id": ".", "label_comp_id": one_to_three.get(aa, "UNK"),
            "auth_asym_id": chain, "auth_seq_id": str(i + 1),
            "Cartn_x": f"{xyz[0]:.3f}", "Cartn_y": f"{xyz[1]:.3f}",
            "Cartn_z": f"{xyz[2]:.3f}", "occupancy": "1.00",
        }
        lines.append(" ".join(row[f] for f in fields))
    lines.append("#")
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def ref_struct(examples_dir):
    return read_ca(os.path.join(examples_dir, "3w5h.pdb"), chain="A")


def test_roundtrip_matches_pdb_reader(ref_struct, tmp_path):
    p = str(tmp_path / "s.cif")
    open(p, "w").write(_as_mmcif(ref_struct))
    d = read_ca(p, chain="A")
    assert d["seq"] == ref_struct["seq"]
    np.testing.assert_allclose(d["coords"], ref_struct["coords"], atol=1e-3)


def test_column_order_independent(ref_struct, tmp_path):
    p = str(tmp_path / "s.cif")
    open(p, "w").write(_as_mmcif(ref_struct, shuffle_cols=True))
    d = read_ca(p, chain="A")
    assert d["seq"] == ref_struct["seq"]


def test_gzipped(ref_struct, tmp_path):
    p = str(tmp_path / "s.cif.gz")
    with gzip.open(p, "wt") as fh:
        fh.write(_as_mmcif(ref_struct))
    d = read_ca(p, chain="A")
    assert len(d["seq"]) == len(ref_struct["seq"])


def test_missing_chain_raises(ref_struct, tmp_path):
    p = str(tmp_path / "s.cif")
    open(p, "w").write(_as_mmcif(ref_struct, chain="B"))
    with pytest.raises(ValueError):
        read_ca(p, chain="A")


def test_createdb_accepts_mmcif(ref_struct, tmp_path):
    from merizo_search_tpu.pipeline.createdb import run_createdb
    from merizo_search_tpu.pipeline.embed import load_foldclass_params
    from merizo_search_tpu.db.codecs import FlatDB

    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "one.cif").write_text(_as_mmcif(
        {"coords": ref_struct["coords"][:60], "seq": ref_struct["seq"][:60]}))
    params = load_foldclass_params(None)
    out = str(tmp_path / "db")
    n = run_createdb(str(ind), out, fmt="mmap", params=params)
    assert n == 1
    db = FlatDB.open(out)
    assert db.name(0) == "one"
    assert db.seq(0) == ref_struct["seq"][:60]


def test_struct_basename_strips_all_extensions():
    from merizo_search_tpu.utils.names import struct_basename
    from merizo_search_tpu.pipeline.multidomain import domid2chainid

    assert struct_basename("/x/2pi4A04.cif") == "2pi4A04"
    assert struct_basename("/x/2pi4A04.mmcif.gz") == "2pi4A04"
    assert struct_basename("/x/2pi4A04.pdb") == "2pi4A04"
    # chain grouping must work for cif-built databases too
    assert domid2chainid("2pi4A04.cif") == "2pi4A"


def test_multimodel_mmcif_first_model_only(tmp_path):
    txt = """data_m
#
loop_
_atom_site.group_PDB
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM CA . ALA A 0.0 0.0 0.0 1
ATOM CA . GLY A 3.8 0.0 0.0 1
ATOM CA . ALA A 0.1 0.1 0.0 2
ATOM CA . GLY A 3.9 0.1 0.0 2
#
"""
    p = str(tmp_path / "m.cif")
    open(p, "w").write(txt)
    d = read_ca(p, chain="A")
    assert d["seq"] == "AG"  # model 1 only, not 'AGAG'


def _backbone_as_mmcif(mol, chain="A") -> str:
    fields = ["group_PDB", "id", "label_atom_id", "label_alt_id",
              "label_comp_id", "auth_asym_id", "auth_seq_id",
              "Cartn_x", "Cartn_y", "Cartn_z", "occupancy",
              "B_iso_or_equiv", "pdbx_PDB_model_num"]
    lines = ["data_bb", "#", "loop_"] + [f"_atom_site.{f}" for f in fields]
    for a in mol:
        lines.append(" ".join([
            "ATOM", str(a["i"]), a["n"], ".", a["resn"], chain,
            str(a["resi"]), f"{a['x']:.3f}", f"{a['y']:.3f}", f"{a['z']:.3f}",
            f"{a['occ']:.2f}", f"{a['b']:.2f}", "1"]))
    return "\n".join(lines) + "\n#\n"


def test_backbone_mmcif_matches_pdb(examples_dir, tmp_path):
    from merizo_search_tpu.io.pdb import parse_backbone

    ref = parse_backbone(f"{examples_dir}/3w5h.pdb", chain="A")
    p = str(tmp_path / "bb.cif")
    open(p, "w").write(_backbone_as_mmcif(ref))
    got = parse_backbone(p, chain="A")
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got["resi"], ref["resi"])
    np.testing.assert_array_equal(got["n"], ref["n"])
    np.testing.assert_array_equal(got["resn"], ref["resn"])
    np.testing.assert_allclose(got["x"], ref["x"], atol=1e-3)


def test_segment_accepts_mmcif(examples_dir, tmp_path):
    import jax
    from merizo_search_tpu.io.pdb import parse_backbone
    from merizo_search_tpu.models.merizo import network as mznet
    from merizo_search_tpu.segment.pipeline import segment_structure

    ref = parse_backbone(f"{examples_dir}/3w5h.pdb", chain="A")
    p = str(tmp_path / "bb.cif")
    open(p, "w").write(_backbone_as_mmcif(ref))
    params = mznet.init_params(jax.random.PRNGKey(0))
    f_cif = segment_structure(params, p)
    f_pdb = segment_structure(params, f"{examples_dir}/3w5h.pdb")
    assert f_cif["nres"] == f_pdb["nres"] == 272
    np.testing.assert_array_equal(f_cif["domain_ids"], f_pdb["domain_ids"])


def test_null_tokens_and_truncated_rows(tmp_path):
    """mmCIF '.'/'?' null tokens and truncated rows must be skipped, not
    crash the parsers (e.g. label_seq_id '.' on non-polymer positions)."""
    txt = """data_n
#
loop_
_atom_site.group_PDB
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.label_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
ATOM N . ALA A 1 0.0 0.0 0.0
ATOM CA . ALA A 1 1.5 0.0 0.0
ATOM C . ALA A 1 2.5 1.0 0.0
ATOM O . ALA A 1 3.5 1.0 0.0
ATOM CA . GLY A . 9.9 9.9 9.9
ATOM CA . GLY A 2
#
"""
    p = str(tmp_path / "n.cif")
    open(p, "w").write(txt)
    from merizo_search_tpu.io.pdb import parse_backbone

    bb = parse_backbone(p, chain="A")
    assert sorted(bb["n"]) == ["C", "CA", "N", "O"]  # only the complete residue
    assert set(bb["resi"]) == {1}
    d = read_ca(p, chain="A")
    # the CA reader ignores resi, so the null-resi row is kept; only the
    # truncated row (missing coords) drops
    assert d["seq"] == "AG"
